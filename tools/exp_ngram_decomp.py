"""Probe: decompose dedup_ngram_jaccard's wall at the current SF and
time two structural variants (both value-identical by construction;
verified before timing):

  stage_ckpt   — just the guarded posting list build + localCheckpoint
  current      — full query (checkpoint + self-join + pair agg)
  collect_set  — distinct+sizes via ONE ObjectHashAggregate
                 (groupBy(id).collect_set) instead of
                 repartition(id)+dropDuplicates+count-window: same
                 single id exchange, no sort, no window
  lazy         — no localCheckpoint: self-join duplicates the posting
                 subtree per side (the round-5 rejected shape, retimed
                 at sf0.1 where the checkpoint action floor matters)

Run: NG_MODE=identity|time python tools/opt_r14_probe.py exec tools/exp_ngram_decomp.py
"""

import json
import os
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from trendmachine_spark.extensions import dedup as D
from trendmachine_spark.registry_core import QUERIES, _docs


def _postings_collect_set(docs, text_col="text", id_col="doc_id",
                          max_shingle_freq=D.MAX_SHINGLE_FREQ):
    sh = D.shingles(docs, text_col, id_col, D.SHINGLE_K, distinct=False)
    agg = sh.groupBy(id_col).agg(F.collect_set("shingle").alias("_set"))
    sh = agg.select(
        F.col(id_col),
        F.size("_set").cast("long").alias("n_shingles"),
        F.explode("_set").alias("shingle"),
    )
    if max_shingle_freq is not None:
        hot = (
            D._candidate_rows(sh.select("shingle"), "shingle",
                              max_shingle_freq + 1, broadcast_cand=True)
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_shingle_freq)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
        sh = sh.repartition("shingle")
    return D._materialize(sh)


def _postings_current_lazy(docs, text_col="text", id_col="doc_id",
                           max_shingle_freq=D.MAX_SHINGLE_FREQ):
    sh = D.shingles(docs, text_col, id_col, D.SHINGLE_K, distinct=False)
    sh = sh.repartition(id_col).dropDuplicates([id_col, "shingle"])
    sh = sh.withColumn(
        "n_shingles", F.count(F.lit(1)).over(Window.partitionBy(id_col))
    )
    if max_shingle_freq is not None:
        hot = (
            D._candidate_rows(sh.select("shingle"), "shingle",
                              max_shingle_freq + 1, broadcast_cand=True)
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_shingle_freq)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
        sh = sh.repartition("shingle")
    return sh  # NO materialize


def _pairs_from(sh, id_col="doc_id", join_hint=None):
    a = sh.select(F.col(id_col).alias("id_a"),
                  F.col("n_shingles").alias("n_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"),
                  F.col("n_shingles").alias("n_b"), "shingle")
    if join_hint:
        b = b.hint(join_hint)
    return (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.min("n_a").alias("_na"),
            F.min("n_b").alias("_nb"),
        )
    )


def _jaccard(pairs):
    return (
        pairs.withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("n_common")),
        ).select("id_a", "id_b", "n_common", "jaccard")
    )


docs = _docs(spark, sf_dir)  # noqa: F821
mode = os.environ.get("NG_MODE", "identity")

builders = {
    "collect_set": lambda: _jaccard(_pairs_from(_postings_collect_set(docs))),
    "lazy": lambda: _jaccard(_pairs_from(_postings_current_lazy(docs))),
    "shj_hint": lambda: _jaccard(_pairs_from(
        D._materialize(_postings_current_lazy(docs)), join_hint="shuffle_hash")),
    "smj_hint": lambda: _jaccard(_pairs_from(
        D._materialize(_postings_current_lazy(docs)), join_hint="merge")),
}

if mode == "identity":
    cur = sorted(map(tuple, QUERIES["dedup_ngram_jaccard"].builder(spark, sf_dir).collect()))  # noqa: F821
    out = {}
    for name, b in builders.items():
        rows = sorted(map(tuple, b().collect()))
        out[name] = (len(rows), rows == cur)
    print(json.dumps({"n_cur": len(cur), "variants": out}))
else:
    passes = int(os.environ.get("NG_PASSES", "6"))
    samples = {"stage_ckpt": [], "current": [],
               **{name: [] for name in builders}}
    for _ in range(passes):
        t0 = time.perf_counter()
        D._shingle_pair_counts(docs, "text", "doc_id", D.MAX_SHINGLE_FREQ)
        # _shingle_pair_counts runs the checkpoint during construction;
        # time ONLY that (the returned df is not executed)
        samples["stage_ckpt"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        noop(QUERIES["dedup_ngram_jaccard"].builder(spark, sf_dir))  # noqa: F821
        samples["current"].append(time.perf_counter() - t0)
        for name, b in builders.items():
            t0 = time.perf_counter()
            noop(b())  # noqa: F821
            samples[name].append(time.perf_counter() - t0)
    print(json.dumps({
        k: {"best": round(min(v), 3), "all": [round(x, 3) for x in v]}
        for k, v in samples.items()
    }))
