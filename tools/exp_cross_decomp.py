"""Decompose dedup_cross_corpus at the current tree: signature builds
(per side), candidate generation, verify leg. Run under opt_r14_probe
exec with OPT_SF_MULTIPLE=10."""
import json
import time

from pyspark.sql import functions as F

from trendmachine_spark.extensions.dedup import (
    _materialize, cross_corpus_near_dup, lsh_band_buckets,
    minhash_signatures, shingles,
)
from trendmachine_spark.registry import _docs

docs = _docs(spark, sf_dir)
a = docs.filter(F.col("doc_id") % 2 == 0)
b = docs.filter(F.col("doc_id") % 2 == 1)

res = {}
PASSES = 3
for p in range(PASSES):
    # (a) per-side signature+bands materialization
    t0 = time.perf_counter()
    sa = _materialize(lsh_band_buckets(minhash_signatures(a)))
    t1 = time.perf_counter()
    sb = _materialize(lsh_band_buckets(minhash_signatures(b)))
    t2 = time.perf_counter()
    # (b) candidate generation + materialize
    ca = sa.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("_na"))
    cb = sb.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("_nb"))
    ok = (ca.join(cb, ["band", "bucket"])
          .filter((F.col("_na") <= 100) & (F.col("_nb") <= 100))
          .select("band", "bucket"))
    cand = (
        sa.join(ok, ["band", "bucket"])
        .select(F.col("doc_id").alias("a_id"), "band", "bucket")
        .join(sb.join(ok, ["band", "bucket"])
              .select(F.col("doc_id").alias("b_id"), "band", "bucket"),
              ["band", "bucket"])
        .select("a_id", "b_id").distinct())
    cand = _materialize(cand)
    t3 = time.perf_counter()
    # (c) verify leg (rest of the query)
    def _sets(src_docs, keep):
        src = src_docs.join(keep, "doc_id", "leftsemi")
        return (shingles(src, "text", "doc_id", distinct=False)
                .groupBy("doc_id").agg(F.collect_set("shingle").alias("_sh")))
    a_sets = _sets(a, cand.select(F.col("a_id").alias("doc_id")).distinct())
    b_sets = _sets(b, cand.select(F.col("b_id").alias("doc_id")).distinct())
    out = (
        cand.join(a_sets.select(F.col("doc_id").alias("a_id"),
                                F.col("_sh").alias("_sha")), "a_id")
        .join(b_sets.select(F.col("doc_id").alias("b_id"),
                            F.col("_sh").alias("_shb")), "b_id")
        .withColumn("_inter", F.size(F.array_intersect("_sha", "_shb")))
        .withColumn("jaccard",
                    F.col("_inter").cast("double")
                    / (F.size("_sha") + F.size("_shb") - F.col("_inter")))
        .filter(F.col("jaccard") >= 0.8)
        .select("a_id", "b_id", "jaccard"))
    noop(out)
    t4 = time.perf_counter()
    row = {"sig_a": round(t1 - t0, 3), "sig_b": round(t2 - t1, 3),
           "cand": round(t3 - t2, 3), "verify": round(t4 - t3, 3),
           "total": round(t4 - t0, 3)}
    res.setdefault("passes", []).append(row)
    sa.unpersist() if hasattr(sa, "unpersist") else None
print(json.dumps(res, separators=(",", ":")))
