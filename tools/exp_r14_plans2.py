"""Capture before/after formatted plans for the r14 second-session
optimizations (hashed gram/segment keys). 'Before' forms are the same
builders with the hashed_* params forced False (the pre-change shape,
still reachable for tests); 'after' is the registered query.

Run under tools/opt_r14_probe.py exec (sees: spark, sf_dir).
"""
import os

from trendmachine_spark.extensions.dedup import (
    dup_span_histogram, dup_span_profile, duplicated_spans, segment_dedup,
)
from trendmachine_spark.registry import QUERIES, _docs

OUT = "/root/repo/plans/r14"


def explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


docs = _docs(spark, sf_dir)
pairs = {
    "substring_dup_report_before": lambda: duplicated_spans(
        docs, win=10, hashed_grams=False),
    "substring_dup_report_after": lambda: QUERIES[
        "substring_dup_report"].builder(spark, sf_dir),
    "dedup_segments_before": lambda: segment_dedup(
        docs, seg_words=10, max_doc_freq=2, hashed_hot_key=False),
    "dedup_segments_after": lambda: QUERIES[
        "dedup_segments"].builder(spark, sf_dir),
    "dup_span_profile_before": lambda: dup_span_profile(
        docs, min_span=5, bound=32, max_group=100, hashed_tokens=False),
    "dup_span_profile_after": lambda: QUERIES[
        "dup_span_profile"].builder(spark, sf_dir),
    "dup_span_histogram_before": lambda: dup_span_histogram(
        docs, min_span=5, bound=32, max_group=100, hashed_tokens=False),
    "dup_span_histogram_after": lambda: QUERIES[
        "dup_span_histogram"].builder(spark, sf_dir),
}
for name, build in pairs.items():
    txt = explain(build())
    path = os.path.join(OUT, f"{name}.txt")
    with open(path, "w") as fh:
        fh.write(txt)
    print("wrote", path)
