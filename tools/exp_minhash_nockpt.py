"""Probe: dedup_minhash_lsh with the SECOND materialization removed.

The bk table (buckets + broadcast-joined over-cap sizes) currently gets
its own localCheckpoint before feeding 4 consumers. Variant L leaves bk
LAZY: each consumer rescans the (already checkpointed) buckets table and
probes the one shared broadcast of the sizes agg — saving a checkpoint
job/write at the cost of 3 extra cheap checkpoint scans.
Run via: python tools/opt_r14_probe.py exec tools/exp_minhash_nockpt.py
Env: MH_MODE=identity|time
"""

import json
import os
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from trendmachine_spark.extensions import dedup as D
from trendmachine_spark.registry_core import QUERIES, _docs


def variant_pairs(docs, id_col="doc_id", max_bucket_size=D.MAX_LSH_BUCKET):
    buckets = D.lsh_band_buckets(
        D.minhash_signatures(docs, "text", id_col), id_col)
    buckets = D._materialize(buckets)
    sizes = (
        buckets.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .filter(F.col("_bn") > max_bucket_size)
        .select("band", "bucket", "_bn")
    )
    bk = buckets.join(F.broadcast(sizes), ["band", "bucket"], "left")
    # NO second materialize: bk stays lazy
    small = bk.filter(F.col("_bn").isNull())
    a = small.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = small.select(F.col(id_col).alias("id_b"), "band", "bucket")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    n_shards = F.expr(f"(_bn - 1) DIV {max_bucket_size} + 1")
    over = bk.filter(F.col("_bn").isNotNull()).withColumn(
        "_shard",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("shard:"),
                                   F.col(id_col).cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long"),
            n_shards,
        ),
    )
    wsh = Window.partitionBy("band", "bucket", "_shard").orderBy(id_col)
    intra = (
        over.withColumn("_prev", F.lag(id_col).over(wsh))
        .filter(F.col("_prev").isNotNull())
        .select(F.col("_prev").alias("id_a"), F.col(id_col).alias("id_b"))
    )
    bounds = over.groupBy("band", "bucket", "_shard").agg(
        F.min(id_col).alias("_mn"), F.max(id_col).alias("_mx")
    )
    wb = Window.partitionBy("band", "bucket").orderBy("_shard")
    cross = (
        bounds.withColumn("_pmx", F.lag("_mx").over(wb))
        .filter(F.col("_pmx").isNotNull())
        .select(
            F.least("_pmx", "_mn").alias("id_a"),
            F.greatest("_pmx", "_mn").alias("id_b"),
        )
    )
    return pairs.unionByName(intra).unionByName(cross).distinct()


docs = _docs(spark, sf_dir)  # noqa: F821
mode = os.environ.get("MH_MODE", "identity")

if mode == "identity":
    cur = QUERIES["dedup_minhash_lsh"].builder(spark, sf_dir)  # noqa: F821
    new = variant_pairs(docs)
    rows_cur = sorted(map(tuple, cur.collect()))
    rows_new = sorted(map(tuple, new.collect()))
    print(json.dumps({
        "n_cur": len(rows_cur), "n_new": len(rows_new),
        "identical": rows_cur == rows_new,
    }))
else:
    passes = int(os.environ.get("MH_PASSES", "6"))
    samples = {"current": [], "nockpt": []}
    for _ in range(passes):
        t0 = time.perf_counter()
        noop(QUERIES["dedup_minhash_lsh"].builder(spark, sf_dir))  # noqa: F821
        samples["current"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        noop(variant_pairs(docs))  # noqa: F821
        samples["nockpt"].append(time.perf_counter() - t0)
    print(json.dumps({
        k: {"best": round(min(v), 3), "all": [round(x, 3) for x in v]}
        for k, v in samples.items()
    }))
