"""Post-landing x10 walls for the three registered cross-corpus
queries (r15 carried-sets shape), interleaved best-of-N with per-pass
calibration. Build inside the timed window (construction-time
checkpoints).

  OPT_SF_MULTIPLE=10 python tools/opt_r14_probe.py exec tools/exp_cross_landed.py
"""
import json
import time

import duckdb

from trendmachine_spark.registry import QUERIES

_cal = duckdb.connect(); _cal.execute("SET threads=1")
CALIB = "SELECT sum(i*i) FROM range(25000000) t(i)"
NAMES = ["dedup_cross_corpus", "corpus_merge_report",
         "cross_corpus_bucket_health"]

res = {"passes": []}
for p in range(5):
    t0 = time.perf_counter(); _cal.execute(CALIB).fetchall()
    row = {"calib": round(time.perf_counter() - t0, 3)}
    for n in NAMES:
        spark.sparkContext.setJobDescription(f"crossLanded {n} p{p}")
        t0 = time.perf_counter()
        noop(QUERIES[n].builder(spark, sf_dir))
        row[n] = round(time.perf_counter() - t0, 3)
    row["load"] = open("/proc/loadavg").read().split()[0]
    res["passes"].append(row)
    spark.sparkContext._jvm.System.gc()
for n in NAMES:
    res[n + "_best"] = min(r[n] for r in res["passes"])
print(json.dumps(res))
