"""Interleaved A/B: r13-shape (two per-side pipelines, string verify)
vs r14 sided rewrite for dedup_cross_corpus + corpus_merge_report +
cross_corpus_bucket_health. Builder inside the timer (eager
materialization). Best-of-N decides."""
import json
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from trendmachine_spark.extensions.dedup import (
    MAX_LSH_BUCKET, _materialize, lsh_band_buckets, minhash_signatures,
    shingles,
)
from trendmachine_spark.registry import QUERIES, _docs


def old_cross(a, b, text_col="text", id_col="doc_id", min_jaccard=0.8,
              max_side_bucket=MAX_LSH_BUCKET):
    sa = _materialize(lsh_band_buckets(minhash_signatures(a, text_col, id_col), id_col))
    sb = _materialize(lsh_band_buckets(minhash_signatures(b, text_col, id_col), id_col))
    ca = sa.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("_na"))
    cb = sb.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("_nb"))
    ok = (ca.join(cb, ["band", "bucket"])
          .filter((F.col("_na") <= max_side_bucket)
                  & (F.col("_nb") <= max_side_bucket))
          .select("band", "bucket"))
    cand = (
        sa.join(ok, ["band", "bucket"])
        .select(F.col(id_col).alias("a_id"), "band", "bucket")
        .join(sb.join(ok, ["band", "bucket"])
              .select(F.col(id_col).alias("b_id"), "band", "bucket"),
              ["band", "bucket"])
        .select("a_id", "b_id").distinct())
    cand = _materialize(cand)

    def _sets(docs, keep):
        src = docs.join(keep, id_col, "leftsemi")
        return (shingles(src, text_col, id_col, distinct=False)
                .groupBy(id_col).agg(F.collect_set("shingle").alias("_sh")))

    a_sets = _sets(a, cand.select(F.col("a_id").alias(id_col)).distinct())
    b_sets = _sets(b, cand.select(F.col("b_id").alias(id_col)).distinct())
    return (
        cand.join(a_sets.select(F.col(id_col).alias("a_id"),
                                F.col("_sh").alias("_sha")), "a_id")
        .join(b_sets.select(F.col(id_col).alias("b_id"),
                            F.col("_sh").alias("_shb")), "b_id")
        .withColumn("_inter", F.size(F.array_intersect("_sha", "_shb")))
        .withColumn("jaccard",
                    F.col("_inter").cast("double")
                    / (F.size("_sha") + F.size("_shb") - F.col("_inter")))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("a_id", "b_id", "jaccard"))


def old_merge(a, b, text_col="text", id_col="doc_id"):
    b_h = b.select(F.col(id_col), F.md5(F.col(text_col)).alias("_h"))
    a_h = (a.select(F.md5(F.col(text_col)).alias("_h")).distinct()
           .withColumn("_ea", F.lit(1)))
    near = (old_cross(a, b, text_col, id_col)
            .select(F.col("b_id").alias(id_col)).distinct()
            .withColumn("_na", F.lit(1)))
    keeper = Window.partitionBy("_h")
    out = (b_h.withColumn("_kmin", F.min(id_col).over(keeper))
           .join(a_h, "_h", "left").join(near, id_col, "left"))
    ea = F.when(F.col("_ea").isNotNull(), 1).otherwise(0)
    eb = F.when(F.col("_kmin") < F.col(id_col), 1).otherwise(0)
    na = F.when(F.col("_na").isNotNull(), 1).otherwise(0)
    return out.select(
        id_col,
        ea.cast("long").alias("exact_dup_a"),
        eb.cast("long").alias("exact_dup_b"),
        na.cast("long").alias("near_dup_a"),
        ((ea + eb + na) == 0).cast("long").alias("admit"))


def old_health(a, b, text_col="text", id_col="doc_id",
               max_side_bucket=MAX_LSH_BUCKET):
    ca = (lsh_band_buckets(minhash_signatures(a, text_col, id_col), id_col)
          .groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("_na")))
    cb = (lsh_band_buckets(minhash_signatures(b, text_col, id_col), id_col)
          .groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("_nb")))
    shared = ca.join(cb, ["band", "bucket"]).withColumn(
        "_drop", ((F.col("_na") > max_side_bucket)
                  | (F.col("_nb") > max_side_bucket)).cast("long"))
    pairs = F.col("_na") * F.col("_nb")
    return shared.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_shared_buckets"),
        F.sum("_drop").alias("n_dropped"),
        F.max("_na").alias("max_side_a"),
        F.max("_nb").alias("max_side_b"),
        F.sum(F.when(F.col("_drop") == 0, pairs).otherwise(F.lit(0)))
        .alias("pairs_kept"),
        F.sum(F.when(F.col("_drop") == 1, pairs).otherwise(F.lit(0)))
        .alias("pairs_dropped"))


docs = _docs(spark, sf_dir)
A = docs.filter(F.col("doc_id") % 2 == 0)
B = docs.filter(F.col("doc_id") % 2 == 1)

import duckdb
_cal = duckdb.connect(); _cal.execute("SET threads=1")
CALIB = "SELECT sum(i*i) FROM range(25000000) t(i)"
def calib():
    t0 = time.perf_counter(); _cal.execute(CALIB).fetchall()
    return round(time.perf_counter() - t0, 3)

variants = {
    "cross_old": lambda: old_cross(A, B),
    "cross_new": lambda: QUERIES["dedup_cross_corpus"].builder(spark, sf_dir),
    "merge_old": lambda: old_merge(A, B),
    "merge_new": lambda: QUERIES["corpus_merge_report"].builder(spark, sf_dir),
}
PASSES = 6
samples = {n: [] for n in variants}
cals = {n: [] for n in variants}
for p in range(PASSES):
    for n, build in variants.items():
        spark.sparkContext.setJobDescription(f"crossAB {n} p{p}")
        cals[n].append(calib())
        t0 = time.perf_counter()
        noop(build())
        samples[n].append(round(time.perf_counter() - t0, 3))
    spark.sparkContext._jvm.System.gc()
print(json.dumps({"sf_dir": sf_dir,
                  "results": {n: {"best": min(s), "all": s, "calib": cals[n]}
                              for n, s in samples.items()}},
                 separators=(",", ":")))
