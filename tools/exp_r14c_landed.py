"""Post-landing walls for the r14 second-session optimizations at the
probe SF: registered builders INSIDE the timer (corpus_ops_scaled
methodology — these ops materialize state at construction). Compare
against the _cur rows of exp_substr_hash / exp_suffix_hash and the
CORPUS_OPS_SCALED x10 video rows.

Run under tools/opt_r14_probe.py exec (sees: spark, sf_dir, noop).
"""
import json
import time

from trendmachine_spark.registry import QUERIES

NAMES = [
    "substring_dup_report",
    "substring_dup_report_fine",
    "substring_dedup",
    "dedup_segments",
    "dup_span_profile",
    "dup_span_histogram",
    "dedup_video_near",
    "dedup_video_frames",
    "multimodal_frame_sample",
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
        spark.sparkContext.setJobDescription(f"r14c landed {n} p{p}")
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
