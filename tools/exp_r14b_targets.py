"""Probe the remaining r14 optimization targets at the current tree.

Run under tools/opt_r14_probe.py exec (sees: spark, sf_dir, noop).
Builder INSIDE the timer (corpus_ops_scaled methodology: these ops
materialize state at construction).
"""
import json
import time

from trendmachine_spark.registry import QUERIES

NAMES = [
    "dedup_cross_corpus",
    "corpus_merge_report",
    "substring_dedup",
    "substring_dup_report",
    "dedup_segments",
    "dedup_video_near",
    "sq8_encode_streaming",
    "pq_encode_streaming",
]
PASSES = 4

samples = {n: [] for n in NAMES}
for p in range(PASSES):
    for n in NAMES:
        spark.sparkContext.setJobDescription(f"r14b probe {n} pass{p}")
        t0 = time.perf_counter()
        noop(QUERIES[n].builder(spark, sf_dir))
        samples[n].append(round(time.perf_counter() - t0, 3))
    spark.sparkContext._jvm.System.gc()

print(json.dumps({
    "sf_dir": sf_dir,
    "results": {n: {"best": min(s), "all": s} for n, s in samples.items()},
}, separators=(",", ":")))
