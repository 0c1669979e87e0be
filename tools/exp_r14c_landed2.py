"""Post-landing x10 walls for the r14 FIRST-session optimizations
(streaming encoders, cross-corpus trio) — same methodology as
exp_r14c_landed.py. Run under tools/opt_r14_probe.py exec."""
import json
import time

from trendmachine_spark.registry import QUERIES

NAMES = [
    "sq8_encode_streaming",
    "pq_encode_streaming",
    "dedup_cross_corpus",
    "corpus_merge_report",
    "cross_corpus_bucket_health",
]
PASSES = 5

import duckdb
_cal = duckdb.connect(); _cal.execute("SET threads=1")
CALIB = "SELECT sum(i*i) FROM range(25000000) t(i)"
def calib():
    t0 = time.perf_counter(); _cal.execute(CALIB).fetchall()
    return round(time.perf_counter() - t0, 3)

samples = {n: [] for n in NAMES}
cals = {n: [] for n in NAMES}
for p in range(PASSES):
    for n in NAMES:
        spark.sparkContext.setJobDescription(f"r14c landed2 {n} p{p}")
        cals[n].append(calib())
        t0 = time.perf_counter()
        noop(QUERIES[n].builder(spark, sf_dir))
        samples[n].append(round(time.perf_counter() - t0, 3))
    spark.sparkContext._jvm.System.gc()

print(json.dumps({
    "sf_dir": sf_dir,
    "results": {n: {"best": min(s), "all": s, "calib": cals[n]}
                for n, s in samples.items()},
}, separators=(",", ":")))
