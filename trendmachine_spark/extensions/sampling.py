"""Deterministic corpus sampling for training-data pipelines.

Driver-mandated extension territory (SURVEY.md §2.6): every real
training-data run downsamples — per-language/per-source rate schedules
("keep 50% of en, 20% of everything else"), or a flat rate for eval
splits. Random sampling (``df.sample``) is the wrong tool at corpus
scale: results change across retries/partitions, and a resumed job
re-samples differently. The standard fix is HASH sampling: a
deterministic uniform in [0, 1) derived from the stable document id,
so membership is a pure function of (salt, id) — reproducible across
runs, engines, partitionings, and cluster sizes, and disjoint salts
give independent samples (train/eval splits that never overlap).

Scale: the uniform is a narrow md5-on-id projection — zero shuffles,
fully whole-stage-codegen; the filter pushes down like any predicate.
Engine-portable: DuckDB computes the identical uniform via
``('0x' || substr(md5(...), 1, 15))::BIGINT / 2^60`` — same IEEE
double ops, bit-identical outcomes (see registry oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 16^15 == 2^60 — the hash domain size for the 15-hex-digit prefix
HASH_DOMAIN = float(1 << 60)


def hash_uniform(id_col: Column, salt: str = "tm") -> Column:
    """Deterministic uniform in [0, 1) from (salt, id) — md5-derived.

    Same construction as the minhash hash family (one md5, 60-bit
    prefix): u = int(md5(salt ':' id)[:15], 16) / 2^60. Different salts
    give independent uniforms, so disjoint splits use disjoint salts.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    return h / F.lit(HASH_DOMAIN)


def corpus_sample(docs: DataFrame, rate: float, salt: str = "tm",
                  id_col: str = "doc_id") -> DataFrame:
    """Flat deterministic Bernoulli(rate) sample: keep iff u < rate."""
    return docs.filter(hash_uniform(F.col(id_col), salt) < rate)


def stratified_sample(docs: DataFrame, strata_col: str = "lang",
                      rates: dict[str, float] | None = None,
                      default_rate: float = 0.2, salt: str = "tm",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-stratum deterministic sampling: keep iff u < rate(stratum).

    ``rates`` maps stratum value -> keep probability; strata not listed
    use ``default_rate``. The membership decision depends only on
    (salt, id), NOT on the stratum — so re-binning documents into
    different strata with the same rates never flips membership of a
    document whose rate is unchanged (stable under taxonomy edits).
    """
    rate = F.lit(default_rate)
    for value, r in (rates or {}).items():
        rate = F.when(F.col(strata_col) == value, F.lit(r)).otherwise(rate)
    return docs.filter(hash_uniform(F.col(id_col), salt) < rate)


def train_eval_split(docs: DataFrame, eval_rate: float = 0.05,
                     salt: str = "split", id_col: str = "doc_id"
                     ) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive (train, eval) split off ONE uniform: a doc
    is eval iff u < eval_rate, train otherwise. One narrow projection,
    both frames share the scan; no doc is in both, none is dropped."""
    u = hash_uniform(F.col(id_col), salt)
    return docs.filter(u >= eval_rate), docs.filter(u < eval_rate)


def temperature_mix(docs: DataFrame, strata_col: str = "source",
                    salt: str = "mix", id_col: str = "doc_id") -> DataFrame:
    """Temperature-balanced source mixing (alpha = 0.5), downsampling-only.

    Every LLM corpus recipe reweights sources so huge crawls don't
    drown curated sets: effective counts ∝ n_s^alpha (GPT-3/Pile-style
    mixing). A filter can only DOWNsample, so the maximal such mix
    keeps k_s = min_n^(1-alpha) * n_s^alpha docs of source s — i.e.
    per-doc keep rate (min_n / n_s)^(1-alpha): 1.0 for the smallest
    source, shrinking toward balance for the rest. Membership is the
    same deterministic (salt, id) hash uniform as corpus_sample, so
    the mix is reproducible and composes with disjoint-salt splits.

    alpha is fixed at 0.5 because rate = sqrt(min_n / n_s) and IEEE
    754 REQUIRES sqrt (unlike pow) to be correctly rounded — the rate
    doubles are bit-identical across engines, which a general
    pow(x, 1-alpha) could not guarantee at the keep/drop boundary.

    Scale: the per-source count table is tiny (one map-combined
    groupBy) and broadcast back; the corpus itself never shuffles —
    one scan, a broadcast hash join, a pushable filter.
    """
    counts = docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    mn = counts.agg(F.min("_n").alias("_mn"))
    rates = counts.crossJoin(mn).select(
        strata_col,
        F.sqrt(F.col("_mn").cast("double") / F.col("_n").cast("double")).alias("_rate"),
    )
    return (
        docs.join(F.broadcast(rates), strata_col)
        .filter(hash_uniform(F.col(id_col), salt) < F.col("_rate"))
        .drop("_rate")
    )


def split_assign(docs: DataFrame, valid_frac: float = 0.05,
                 test_frac: float = 0.05, salt: str = "split3",
                 id_col: str = "doc_id", by_content: bool = False,
                 text_col: str = "text") -> DataFrame:
    """Add a ``split`` column: deterministic train/valid/test assignment.

    One hash uniform, two thresholds: u < valid_frac -> 'valid',
    u < valid_frac+test_frac -> 'test', else 'train' — disjoint and
    exhaustive by construction, reproducible across runs, engines, and
    partitionings (the corpus_sample membership discipline, one more
    way). With ``by_content=True`` the uniform is keyed on
    ``md5(text)`` instead of the id, so EXACT-DUPLICATE documents land
    in the same split by construction — the standard guard against
    train/eval leakage through duplicated content (see
    ``split_leakage`` for the measurement of why that matters).

    Thresholds are compared as IEEE doubles; the cumulative boundary
    ``valid_frac + test_frac`` is computed once driver-side so both
    engines compare against the identical literal.

    Scale: a narrow md5 projection + CASE — zero shuffles, codegen'd,
    predicate-pushable; composes with disjoint-salt sampling.
    """
    key = F.md5(F.col(text_col)) if by_content else F.col(id_col)
    u = hash_uniform(key, salt)
    cut1, cut2 = float(valid_frac), float(valid_frac) + float(test_frac)
    return docs.withColumn(
        "split",
        F.when(u < cut1, F.lit("valid"))
         .when(u < cut2, F.lit("test"))
         .otherwise(F.lit("train")),
    )


def split_leakage(docs: DataFrame, valid_frac: float = 0.05,
                  test_frac: float = 0.05, salt: str = "split3",
                  id_col: str = "doc_id", text_col: str = "text",
                  prefix_k: int = 8) -> DataFrame:
    """Per-split leakage report for a NAIVE id-hash split: how many
    documents share near-identical content with a document in ANOTHER
    split, where "family" is the md5 of the opening ``prefix_k``
    whitespace tokens (boilerplate-opening fingerprint — exact-md5
    families are a subset, and the prefix family is nonempty at every
    test SF, so the report is exercised everywhere).

    An id-keyed split scatters duplicate families across
    train/valid/test, so eval examples overlap the training set — the
    contamination mechanism content-keyed splitting
    (``split_assign(by_content=True)``) eliminates. Output one row per
    split: n_docs, n_dup_docs (member of any >1-copy family),
    n_leaked_docs (member of a family that straddles splits).

    Scale: one fingerprint exchange for the family window (counts +
    collect_set of splits per fingerprint — bounded by the split
    count, max 3 elements), then a 3-row aggregate. No joins, no doc
    text shuffled (only split/digest columns move).
    """
    from pyspark.sql import Window

    fp = F.md5(F.concat_ws(
        " ", F.slice(F.split(F.col(text_col), " "), 1, prefix_k)))
    base = split_assign(
        docs, valid_frac, test_frac, salt, id_col,
        by_content=False, text_col=text_col,
    ).select("split", fp.alias("_md5"))
    w = Window.partitionBy("_md5")
    fam = (
        base.withColumn("_fam_n", F.count(F.lit(1)).over(w))
        .withColumn("_fam_splits", F.size(F.collect_set("split").over(w)))
    )
    return fam.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("_fam_n") > 1, 1).otherwise(0))
         .cast("long").alias("n_dup_docs"),
        F.sum(F.when(F.col("_fam_splits") > 1, 1).otherwise(0))
         .cast("long").alias("n_leaked_docs"),
    )
