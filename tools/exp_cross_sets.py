"""r15 item 1: carry the per-doc hashed-shingle SET through the sided
pipeline's materialization so the cross-corpus verify leg reads the
checkpoint instead of rebuilding sets via two corpus scans.

Variant: ONE groupBy(_sid) computes mh0..15 AND collect_set(_h); the
per-doc table is checkpointed; the band table derives narrowly from it
(and is checkpointed as today, so the 3 band consumers read the small
table); verify joins cand against the per-doc sets.

Run under the probe exec at x10:
  OPT_SF_MULTIPLE=10 python tools/opt_r14_probe.py exec tools/exp_cross_sets.py
"""
import json
import time

from pyspark.sql import functions as F

from trendmachine_spark.extensions.dedup import (
    HASH_MASKS, MAX_LSH_BUCKET, NUM_HASHES, SHINGLE_K, _materialize,
    _sided_tag, lsh_band_buckets, shingles,
)
from trendmachine_spark.registry import QUERIES, _docs

import duckdb
_cal = duckdb.connect(); _cal.execute("SET threads=1")
CALIB = "SELECT sum(i*i) FROM range(25000000) t(i)"
def calib():
    t0 = time.perf_counter(); _cal.execute(CALIB).fetchall()
    return round(time.perf_counter() - t0, 3)


def variant_cross(a, b, text_col="text", id_col="doc_id",
                  min_jaccard=0.8, max_side_bucket=MAX_LSH_BUCKET):
    tagged = _sided_tag(a, b, text_col, id_col)
    sh = shingles(tagged, text_col, "_sid", SHINGLE_K, distinct=False)
    h = F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("long")
    with_h = sh.select("_sid", h.alias("_h"))
    aggs = [F.min(F.expr(f"_h ^ {HASH_MASKS[j]}L")).alias(f"mh{j}")
            for j in range(NUM_HASHES)]
    aggs.append(F.collect_set("_h").alias("_sh"))
    doc_tbl = _materialize(with_h.groupBy("_sid").agg(*aggs))
    sided = _materialize(lsh_band_buckets(
        doc_tbl.select("_sid", *[f"mh{j}" for j in range(NUM_HASHES)]),
        "_sid"))
    side = F.col("_sid").getField("_side")
    ok = (
        sided.groupBy("band", "bucket")
        .agg(F.sum(F.when(side == 0, 1).otherwise(0)).alias("_na"),
             F.sum(F.when(side == 1, 1).otherwise(0)).alias("_nb"))
        .filter((F.col("_na") > 0) & (F.col("_nb") > 0)
                & (F.col("_na") <= max_side_bucket)
                & (F.col("_nb") <= max_side_bucket))
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
    a_sets = (doc_tbl.filter(side == 0)
              .select(F.col("_sid").getField("_id").alias("a_id"),
                      F.col("_sh").alias("_sha")))
    b_sets = (doc_tbl.filter(side == 1)
              .select(F.col("_sid").getField("_id").alias("b_id"),
                      F.col("_sh").alias("_shb")))
    return (
        cand.join(a_sets, "a_id")
        .join(b_sets, "b_id")
        .withColumn("_inter", F.size(F.array_intersect("_sha", "_shb")))
        .withColumn("jaccard",
                    F.col("_inter").cast("double")
                    / (F.size("_sha") + F.size("_shb") - F.col("_inter")))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("a_id", "b_id", "jaccard"))


docs = _docs(spark, sf_dir)
a = docs.filter(F.col("doc_id") % 2 == 0)
b = docs.filter(F.col("doc_id") % 2 == 1)

# ---- value identity FIRST
cur = QUERIES["dedup_cross_corpus"].builder(spark, sf_dir)
new = variant_cross(a, b)
import os
if os.environ.get("SKIP_IDENT"):
    cur_rows = new_rows = []
else:
    cur_rows = sorted([tuple(r) for r in cur.collect()])
    new_rows = sorted([tuple(r) for r in new.collect()])
    assert cur_rows == new_rows, f"VALUE MISMATCH: {len(cur_rows)} vs {len(new_rows)} rows"
print(json.dumps({"identity": "ok", "rows": len(cur_rows)}))

# candidate-doc fraction (context for the trade)
na = a.count(); nb = b.count()
print(json.dumps({"n_a": na, "n_b": nb}))

# ---- interleaved timing, build inside the window (checkpoints are
# construction-time jobs for both shapes)
res = {"passes": []}
for p in range(8):
    row = {"calib": calib()}
    spark.sparkContext.setJobDescription(f"crossSets cur p{p}")
    t0 = time.perf_counter()
    noop(QUERIES["dedup_cross_corpus"].builder(spark, sf_dir))
    row["cur"] = round(time.perf_counter() - t0, 3)
    row["load_cur"] = open("/proc/loadavg").read().split()[0]
    spark.sparkContext.setJobDescription(f"crossSets new p{p}")
    t0 = time.perf_counter()
    noop(variant_cross(a, b))
    row["new"] = round(time.perf_counter() - t0, 3)
    row["load_new"] = open("/proc/loadavg").read().split()[0]
    res["passes"].append(row)
    spark.sparkContext._jvm.System.gc()
res["cur_best"] = min(r["cur"] for r in res["passes"])
res["new_best"] = min(r["new"] for r in res["passes"])
print(json.dumps(res))
