"""Probe: restructure dedup_ngram_jaccard's posting construction so the
heavy explode+repartition(id)+dedup+window subtree executes ONCE.

Current shape: the hot-shingle guard's phase-A and phase-B branches each
re-instantiate that subtree (3 Generates / 5 Exchanges pre-AQE in the
checkpoint job — see exp_ngram_ckptplan.py output).

  r2_twockpt — checkpoint the deduped+windowed table (A), build the
               guard from A, anti-join + repartition(shingle),
               checkpoint (B), join+agg as today (3 actions).
  r1_lazy    — checkpoint A only; guard + repartition(shingle) stay
               lazy into the self-join (2 actions; relies on AQE
               shuffle-stage reuse across the two join sides).
  r1_smj     — r1_lazy with a merge-join hint (no broadcast build of
               the lazy side).

Run: NG_MODE=identity|time python tools/opt_r14_probe.py exec tools/exp_ngram_restructure.py
"""

import json
import os
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from trendmachine_spark.extensions import dedup as D
from trendmachine_spark.registry_core import QUERIES, _docs


def _deduped_windowed(docs, text_col="text", id_col="doc_id"):
    sh = D.shingles(docs, text_col, id_col, D.SHINGLE_K, distinct=False)
    sh = sh.repartition(id_col).dropDuplicates([id_col, "shingle"])
    return sh.withColumn(
        "n_shingles", F.count(F.lit(1)).over(Window.partitionBy(id_col))
    )


def _guarded(sh0, max_shingle_freq=D.MAX_SHINGLE_FREQ):
    hot = (
        D._candidate_rows(sh0.select("shingle"), "shingle",
                          max_shingle_freq + 1, broadcast_cand=True)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > max_shingle_freq)
        .select("shingle")
    )
    return sh0.join(hot, "shingle", "left_anti").repartition("shingle")


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


def build_r2():
    sh0 = D._materialize(_deduped_windowed(docs))
    sh = D._materialize(_guarded(sh0))
    return _jaccard(_pairs_from(sh))


def build_r1(hint=None):
    sh0 = D._materialize(_deduped_windowed(docs))
    sh = _guarded(sh0)
    return _jaccard(_pairs_from(sh, join_hint=hint))


docs = _docs(spark, sf_dir)  # noqa: F821
mode = os.environ.get("NG_MODE", "identity")

def build_old():
    """Pre-r14 shape: guard over the LAZY dedup+window subtree (3x
    re-instantiation), materialize AFTER the guard, planner-chosen
    (broadcast at small SF) self-join."""
    sh0 = _deduped_windowed(docs)
    sh = D._materialize(_guarded(sh0))
    return _jaccard(_pairs_from(sh))


builders = {
    "old": build_old,
    "r2_twockpt": build_r2,
    "r1_lazy": lambda: build_r1(None),
    "r1_smj": lambda: build_r1("merge"),
    "r1_shj": lambda: build_r1("shuffle_hash"),
}
only = os.environ.get("NG_ONLY")
if only:
    keep = set(only.split(","))
    builders = {k: v for k, v in builders.items() if k in keep}

if mode == "identity":
    cur = sorted(map(tuple, QUERIES["dedup_ngram_jaccard"].builder(spark, sf_dir).collect()))  # noqa: F821
    out = {}
    for name, b in builders.items():
        rows = sorted(map(tuple, b().collect()))
        out[name] = (len(rows), rows == cur)
    print(json.dumps({"n_cur": len(cur), "variants": out}))
else:
    passes = int(os.environ.get("NG_PASSES", "6"))
    samples = {"current": [], **{n: [] for n in builders}}
    for _ in range(passes):
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

# focused head-to-head via NG_ONLY="current,r1_smj,r1_shj"
