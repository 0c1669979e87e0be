"""Decompose the carried-sets cross-corpus variant: (a) fused
sig+sets agg materialization, (b) band table + cand, (c) verify joins.
Also stage-isolate the fused agg WITHOUT checkpoint (noop) to separate
agg cost from checkpoint write cost.

  OPT_SF_MULTIPLE=10 python tools/opt_r14_probe.py exec tools/exp_cross_sets2.py
"""
import json
import time

from pyspark.sql import functions as F

from trendmachine_spark.extensions.dedup import (
    HASH_MASKS, MAX_LSH_BUCKET, NUM_HASHES, SHINGLE_K, _materialize,
    _sided_tag, lsh_band_buckets, shingles,
)
from trendmachine_spark.registry import _docs

import duckdb
_cal = duckdb.connect(); _cal.execute("SET threads=1")
CALIB = "SELECT sum(i*i) FROM range(25000000) t(i)"
def calib():
    t0 = time.perf_counter(); _cal.execute(CALIB).fetchall()
    return round(time.perf_counter() - t0, 3)

docs = _docs(spark, sf_dir)
a = docs.filter(F.col("doc_id") % 2 == 0)
b = docs.filter(F.col("doc_id") % 2 == 1)
text_col, id_col = "text", "doc_id"

def fused_doc_tbl():
    tagged = _sided_tag(a, b, text_col, id_col)
    sh = shingles(tagged, text_col, "_sid", SHINGLE_K, distinct=False)
    h = F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("long")
    with_h = sh.select("_sid", h.alias("_h"))
    aggs = [F.min(F.expr(f"_h ^ {HASH_MASKS[j]}L")).alias(f"mh{j}")
            for j in range(NUM_HASHES)]
    aggs.append(F.collect_set("_h").alias("_sh"))
    return with_h.groupBy("_sid").agg(*aggs)

def sig_only():
    tagged = _sided_tag(a, b, text_col, id_col)
    sh = shingles(tagged, text_col, "_sid", SHINGLE_K, distinct=False)
    h = F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("long")
    with_h = sh.select("_sid", h.alias("_h"))
    aggs = [F.min(F.expr(f"_h ^ {HASH_MASKS[j]}L")).alias(f"mh{j}")
            for j in range(NUM_HASHES)]
    return with_h.groupBy("_sid").agg(*aggs)

def sets_only():
    tagged = _sided_tag(a, b, text_col, id_col)
    sh = shingles(tagged, text_col, "_sid", SHINGLE_K, distinct=False)
    h = F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("long")
    return (sh.select("_sid", h.alias("_h"))
            .groupBy("_sid").agg(F.collect_set("_h").alias("_sh")))

res = {"passes": []}
for p in range(4):
    row = {"calib": calib()}
    spark.sparkContext.setJobDescription(f"cs2 fused-noop p{p}")
    t0 = time.perf_counter(); noop(fused_doc_tbl())
    row["fused_agg_noop"] = round(time.perf_counter() - t0, 3)
    spark.sparkContext.setJobDescription(f"cs2 sig-noop p{p}")
    t0 = time.perf_counter(); noop(sig_only())
    row["sig_agg_noop"] = round(time.perf_counter() - t0, 3)
    spark.sparkContext.setJobDescription(f"cs2 sets-noop p{p}")
    t0 = time.perf_counter(); noop(sets_only())
    row["sets_agg_noop"] = round(time.perf_counter() - t0, 3)
    spark.sparkContext.setJobDescription(f"cs2 fused-ckpt p{p}")
    t0 = time.perf_counter(); dt = _materialize(fused_doc_tbl())
    row["fused_ckpt"] = round(time.perf_counter() - t0, 3)
    spark.sparkContext.setJobDescription(f"cs2 band+cand p{p}")
    t0 = time.perf_counter()
    sided = _materialize(lsh_band_buckets(
        dt.select("_sid", *[f"mh{j}" for j in range(NUM_HASHES)]), "_sid"))
    side = F.col("_sid").getField("_side")
    ok = (sided.groupBy("band", "bucket")
          .agg(F.sum(F.when(side == 0, 1).otherwise(0)).alias("_na"),
               F.sum(F.when(side == 1, 1).otherwise(0)).alias("_nb"))
          .filter((F.col("_na") > 0) & (F.col("_nb") > 0)
                  & (F.col("_na") <= MAX_LSH_BUCKET)
                  & (F.col("_nb") <= MAX_LSH_BUCKET))
          .select("band", "bucket"))
    cand = (sided.filter(side == 0)
            .select(F.col("_sid").getField("_id").alias("a_id"), "band", "bucket")
            .join(ok, ["band", "bucket"])
            .join(sided.filter(side == 1)
                  .select(F.col("_sid").getField("_id").alias("b_id"),
                          "band", "bucket"),
                  ["band", "bucket"])
            .select("a_id", "b_id").distinct())
    cand = _materialize(cand)
    row["band_cand_ckpt"] = round(time.perf_counter() - t0, 3)
    spark.sparkContext.setJobDescription(f"cs2 verify p{p}")
    t0 = time.perf_counter()
    a_sets = (dt.filter(side == 0)
              .select(F.col("_sid").getField("_id").alias("a_id"),
                      F.col("_sh").alias("_sha")))
    b_sets = (dt.filter(side == 1)
              .select(F.col("_sid").getField("_id").alias("b_id"),
                      F.col("_sh").alias("_shb")))
    out = (cand.join(a_sets, "a_id").join(b_sets, "b_id")
           .withColumn("_inter", F.size(F.array_intersect("_sha", "_shb")))
           .withColumn("jaccard",
                       F.col("_inter").cast("double")
                       / (F.size("_sha") + F.size("_shb") - F.col("_inter")))
           .filter(F.col("jaccard") >= 0.8)
           .select("a_id", "b_id", "jaccard"))
    noop(out)
    row["verify"] = round(time.perf_counter() - t0, 3)
    dt.unpersist() if hasattr(dt, "unpersist") else None
    res["passes"].append(row)
    spark.sparkContext._jvm.System.gc()
print(json.dumps(res))
