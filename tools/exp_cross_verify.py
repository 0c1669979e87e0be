"""Verify-leg internals for the sided cross-corpus dedup at x10:
(a) split sets-build vs pair-join+intersect, (b) selectivity of the
exact size-ratio prefilter (jaccard(A,B) <= min(|A|,|B|)/max(|A|,|B|),
so ratio < threshold can NEVER pass — a lossless pair filter), and
(c) interleaved A/B of the current verify vs the size-prefiltered one.
Run under opt_r14_probe exec with OPT_SF_MULTIPLE=10."""
import json
import time

from pyspark.sql import functions as F

from trendmachine_spark.extensions.dedup import (
    MAX_LSH_BUCKET, _materialize, _sided_band_buckets, shingles,
)
from trendmachine_spark.registry import QUERIES, _docs

MIN_J = 0.8
docs = _docs(spark, sf_dir)
a = docs.filter(F.col("doc_id") % 2 == 0)
b = docs.filter(F.col("doc_id") % 2 == 1)
h = F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("long")


def build_cand():
    sided = _materialize(_sided_band_buckets(a, b, "text", "doc_id"))
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
    return _materialize(cand)


def _sets(src_docs, keep):
    src = src_docs.join(keep, "doc_id", "leftsemi")
    return (shingles(src, "text", "doc_id", distinct=False)
            .select("doc_id", h.alias("_h"))
            .groupBy("doc_id").agg(F.collect_set("_h").alias("_sh")))


def verify_current(cand):
    a_sets = _sets(a, cand.select(F.col("a_id").alias("doc_id")).distinct())
    b_sets = _sets(b, cand.select(F.col("b_id").alias("doc_id")).distinct())
    return (
        cand.join(a_sets.select(F.col("doc_id").alias("a_id"),
                                F.col("_sh").alias("_sha")), "a_id")
        .join(b_sets.select(F.col("doc_id").alias("b_id"),
                            F.col("_sh").alias("_shb")), "b_id")
        .withColumn("_inter", F.size(F.array_intersect("_sha", "_shb")))
        .withColumn("jaccard",
                    F.col("_inter").cast("double")
                    / (F.size("_sha") + F.size("_shb") - F.col("_inter")))
        .filter(F.col("jaccard") >= MIN_J)
        .select("a_id", "b_id", "jaccard"))


def _sizes(src_docs, keep):
    src = src_docs.join(keep, "doc_id", "leftsemi")
    return (shingles(src, "text", "doc_id", distinct=False)
            .select("doc_id", h.alias("_h"))
            .groupBy("doc_id")
            .agg(F.count_distinct("_h").alias("_n")))


def verify_prefiltered(cand):
    na = _sizes(a, cand.select(F.col("a_id").alias("doc_id")).distinct())
    nb = _sizes(b, cand.select(F.col("b_id").alias("doc_id")).distinct())
    surv = (
        cand.join(na.select(F.col("doc_id").alias("a_id"),
                            F.col("_n").alias("_na")), "a_id")
        .join(nb.select(F.col("doc_id").alias("b_id"),
                        F.col("_n").alias("_nb")), "b_id")
        .filter(F.least("_na", "_nb").cast("double")
                / F.greatest("_na", "_nb") >= MIN_J)
        .select("a_id", "b_id"))
    surv = _materialize(surv)
    return verify_current(surv)


cand = build_cand()
n_cand = cand.count()

# selectivity of the size filter
na = _sizes(a, cand.select(F.col("a_id").alias("doc_id")).distinct())
nb = _sizes(b, cand.select(F.col("b_id").alias("doc_id")).distinct())
n_surv = (cand.join(na.select(F.col("doc_id").alias("a_id"),
                              F.col("_n").alias("_na")), "a_id")
          .join(nb.select(F.col("doc_id").alias("b_id"),
                          F.col("_n").alias("_nb")), "b_id")
          .filter(F.least("_na", "_nb").cast("double")
                  / F.greatest("_na", "_nb") >= MIN_J).count())
print(json.dumps({"n_cand": n_cand, "n_surviving_size_filter": n_surv}))

# identity
cur = sorted(map(tuple, verify_current(cand).collect()))
new = sorted(map(tuple, verify_prefiltered(cand).collect()))
assert cur == new, f"VALUE MISMATCH {len(cur)} vs {len(new)}"
print("IDENTITY OK rows:", len(cur))

import duckdb
_cal = duckdb.connect(); _cal.execute("SET threads=1")
CALIB = "SELECT sum(i*i) FROM range(25000000) t(i)"
def calib():
    t0 = time.perf_counter(); _cal.execute(CALIB).fetchall()
    return round(time.perf_counter() - t0, 3)

variants = {
    "verify_cur": lambda: verify_current(cand),
    "verify_pref": lambda: verify_prefiltered(cand),
}
PASSES = 5
samples = {n: [] for n in variants}
cals = {n: [] for n in variants}
for p in range(PASSES):
    for n, build in variants.items():
        spark.sparkContext.setJobDescription(f"crossVerify {n} p{p}")
        cals[n].append(calib())
        t0 = time.perf_counter()
        noop(build())
        samples[n].append(round(time.perf_counter() - t0, 3))
    spark.sparkContext._jvm.System.gc()
print(json.dumps({n: {"best": min(s), "all": s, "calib": cals[n]}
                  for n, s in samples.items()}, separators=(",", ":")))
