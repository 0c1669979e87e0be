"""Decompose the SIDED dedup_cross_corpus (post-§6 shape): sided
band-table materialization, candidate generation + materialize, verify
leg. Run under opt_r14_probe exec with OPT_SF_MULTIPLE=10."""
import json
import time

from pyspark.sql import functions as F

from trendmachine_spark.extensions.dedup import (
    MAX_LSH_BUCKET, _materialize, _sided_band_buckets, shingles,
)
from trendmachine_spark.registry import _docs

docs = _docs(spark, sf_dir)
a = docs.filter(F.col("doc_id") % 2 == 0)
b = docs.filter(F.col("doc_id") % 2 == 1)

import duckdb
_cal = duckdb.connect(); _cal.execute("SET threads=1")
CALIB = "SELECT sum(i*i) FROM range(25000000) t(i)"
def calib():
    t0 = time.perf_counter(); _cal.execute(CALIB).fetchall()
    return round(time.perf_counter() - t0, 3)

from trendmachine_spark.registry import QUERIES
res = {"passes": []}
PASSES = 3
for p in range(PASSES):
    spark.sparkContext.setJobDescription(f"crossDecomp2 anchor p{p}")
    c0 = calib()
    ta = time.perf_counter()
    noop(QUERIES["dedup_cross_corpus"].builder(spark, sf_dir))
    anchor = round(time.perf_counter() - ta, 3)
    spark.sparkContext.setJobDescription(f"crossDecomp2 sided p{p}")
    t0 = time.perf_counter()
    sided = _materialize(_sided_band_buckets(a, b, "text", "doc_id"))
    t1 = time.perf_counter()
    side = F.col("_sid").getField("_side")
    ok = (
        sided.groupBy("band", "bucket")
        .agg(F.sum(F.when(side == 0, 1).otherwise(0)).alias("_na"),
             F.sum(F.when(side == 1, 1).otherwise(0)).alias("_nb"))
        .filter((F.col("_na") > 0) & (F.col("_nb") > 0)
                & (F.col("_na") <= MAX_LSH_BUCKET)
                & (F.col("_nb") <= MAX_LSH_BUCKET))
        .select("band", "bucket"))
    cand = (
        sided.filter(side == 0)
        .select(F.col("_sid").getField("_id").alias("a_id"), "band", "bucket")
        .join(ok, ["band", "bucket"])
        .join(sided.filter(side == 1)
              .select(F.col("_sid").getField("_id").alias("b_id"),
                      "band", "bucket"),
              ["band", "bucket"])
        .select("a_id", "b_id").distinct())
    cand = _materialize(cand)
    t2 = time.perf_counter()
    h = F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("long")

    def _sets(src_docs, keep):
        src = src_docs.join(keep, "doc_id", "leftsemi")
        return (shingles(src, "text", "doc_id", distinct=False)
                .select("doc_id", h.alias("_h"))
                .groupBy("doc_id").agg(F.collect_set("_h").alias("_sh")))

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
    t3 = time.perf_counter()
    n_cand = cand.count()
    res["passes"].append({
        "sided_sig": round(t1 - t0, 3),
        "cand": round(t2 - t1, 3),
        "verify": round(t3 - t2, 3),
        "total": round(t3 - t0, 3),
        "n_cand": n_cand,
        "anchor_full_query": anchor,
        "calib": [c0, calib()],
    })
print(json.dumps(res, separators=(",", ":")))
