"""Candidate volumes for dedup_cross_corpus at the probe SF."""
import json

from pyspark.sql import functions as F

from trendmachine_spark.extensions.dedup import (
    _materialize, lsh_band_buckets, minhash_signatures, shingles,
)
from trendmachine_spark.registry import _docs

docs = _docs(spark, sf_dir)
a = docs.filter(F.col("doc_id") % 2 == 0)
b = docs.filter(F.col("doc_id") % 2 == 1)
sa = _materialize(lsh_band_buckets(minhash_signatures(a)))
sb = _materialize(lsh_band_buckets(minhash_signatures(b)))
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
n_pairs = cand.count()
n_a = cand.select("a_id").distinct().count()
n_b = cand.select("b_id").distinct().count()
n_docs = docs.count()
keep_a = cand.select(F.col("a_id").alias("doc_id")).distinct()
sh_a = shingles(a.join(keep_a, "doc_id", "leftsemi"),
                "text", "doc_id", distinct=False)
n_sh_a = sh_a.count()
avg_sh = sh_a.groupBy("doc_id").count().agg(F.avg("count")).collect()[0][0]
print(json.dumps({"n_docs": n_docs, "pairs": n_pairs, "a_ids": n_a,
                  "b_ids": n_b, "sh_a_rows": n_sh_a,
                  "avg_shingles_per_a_doc": round(avg_sh, 1)},
                 separators=(",", ":")))
