"""Value identity of the r14 sided cross-corpus rewrite vs the DuckDB
oracle at the probe SF, plus the md5-60bit injectivity check that
makes hashed verify provably identical to string verify."""
import json

from pyspark.sql import functions as F

from tests.oracle_harness import compare
from trendmachine_spark.extensions.dedup import shingles
from trendmachine_spark.registry import QUERIES, _docs

out = {}
for name in ("dedup_cross_corpus", "corpus_merge_report",
             "cross_corpus_bucket_health"):
    df = QUERIES[name].builder(spark, sf_dir)
    probs = compare(df, QUERIES[name].oracle, sf_dir, name)
    out[name] = probs if probs else "OK"

# injectivity: global distinct shingles vs distinct 60-bit hashes
sh = shingles(_docs(spark, sf_dir), "text", "doc_id", distinct=False)
h = F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("long")
row = sh.agg(
    F.countDistinct("shingle").alias("n_str"),
    F.countDistinct(h).alias("n_hash"),
).collect()[0]
out["injectivity"] = {"distinct_shingles": row["n_str"],
                      "distinct_hashes": row["n_hash"],
                      "injective": row["n_str"] == row["n_hash"]}
print(json.dumps(out, separators=(",", ":")))
