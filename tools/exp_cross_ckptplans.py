"""Append the construction-time (checkpoint-job) plans for the
cross-corpus rewrite to the r14 plan files: the per-side r13 band
pipeline vs the r14 sided single pipeline."""
import os

from pyspark.sql import functions as F

from trendmachine_spark.extensions.dedup import (
    _sided_band_buckets, lsh_band_buckets, minhash_signatures,
)
from trendmachine_spark.registry import _docs

docs = _docs(spark, sf_dir)
A = docs.filter(F.col("doc_id") % 2 == 0)
B = docs.filter(F.col("doc_id") % 2 == 1)


def fmt(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


plans_dir = "/root/repo/plans/r14"

old_leg = lsh_band_buckets(minhash_signatures(A, "text", "doc_id"), "doc_id")
new_leg = _sided_band_buckets(A, B, "text", "doc_id")

with open(os.path.join(plans_dir, "dedup_cross_corpus_before.txt"), "a") as fh:
    fh.write("\n\n===== construction-time checkpoint job (r13 shape): "
             "ONE of the TWO per-side band pipelines (side a shown; "
             "side b is the identical pipeline over the odd half)\n")
    fh.write(fmt(old_leg))
with open(os.path.join(plans_dir, "dedup_cross_corpus_after.txt"), "a") as fh:
    fh.write("\n\n===== construction-time checkpoint job (r14 sided "
             "shape): the ONLY band pipeline — both corpora through one "
             "union + one shingle explode + one signature aggregation\n")
    fh.write(fmt(new_leg))
print("appended construction plans")
