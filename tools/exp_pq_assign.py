"""Interleaved before/after walls for the PQ-family encode paths at
the probe SF — run once BEFORE and once AFTER landing the expanded-form
_pq_assign (the registry builders are the measured unit either way, so
the same script serves both legs; label which leg in the log name).

Run under tools/opt_r14_probe.py exec (sees: spark, sf_dir, noop).
Builder inside the timer (these ops train/encode at construction).
"""
import json
import time

from trendmachine_spark.registry import QUERIES

NAMES = [
    "similarity_pq_topk",
    "similarity_pq256_topk",
    "similarity_pq_rerank",
    "similarity_ivfpq_topk",
    "similarity_ivfpq_residual_topk",
    "pq_distortion",
    "pq_encode_streaming",
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
        spark.sparkContext.setJobDescription(f"pqAssign {n} p{p}")
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
