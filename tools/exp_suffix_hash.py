"""Interleaved A/B for the bounded suffix-array family: current shape
(32-token STRING suffix arrays on the gram exchange + string-array sort)
vs hashed-token variant — each token mapped once per document through
xxhash64 (injective on the corpus vocab, checked below), suffixes become
fixed-width array<long>. The SA-adjacency property (longest corpus match
= max LCP vs sorted neighbors) is invariant under any injective alphabet
remap: strings sharing a prefix still form contiguous sorted blocks and
every LCP value is unchanged, so match lengths are bit-identical. The
win is guide §2.3: ~2.5x narrower shuffle payload + long-array
comparisons in the sort instead of per-token string compares.

Run under tools/opt_r14_probe.py exec (sees: spark, sf_dir, noop).
"""
import json
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from trendmachine_spark.extensions.dedup import (
    MAX_SHINGLE_FREQ, SUFFIX_BOUND, _candidate_rows, _lcp,
    rebalance_for_fanout,
)
from trendmachine_spark.registry import QUERIES, _docs


def suffix_match_hashed(docs, min_span=5, bound=SUFFIX_BOUND,
                        max_group=MAX_SHINGLE_FREQ, text_col="text",
                        id_col="doc_id"):
    words = F.split(F.col(text_col), " ")
    base = rebalance_for_fanout(
        docs.select(F.col(id_col), F.col(text_col))
    ).select(
        F.col(id_col),
        F.transform(words, lambda x: F.xxhash64(x)).alias("_w"),
    ).filter(F.size("_w") >= min_span)
    occ = base.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(1), F.size("_w") - (min_span - 1))
        ).alias("pos"),
        "_w",
    ).select(
        F.col(id_col),
        "pos",
        F.xxhash64(*[F.element_at(F.col("_w"), F.col("pos") + j)
                     for j in range(min_span)]).alias("_g"),
        F.slice("_w", F.col("pos"), F.lit(bound)).alias("_sfx"),
    )
    if max_group is not None:
        hot = (
            _candidate_rows(occ.select("_g"), "_g", max_group + 1,
                            broadcast_cand=True)
            .groupBy("_g")
            .agg(F.count(F.lit(1)).alias("_f"))
            .filter(F.col("_f") > max_group)
            .select("_g")
        )
        occ = occ.join(hot, "_g", "left_anti")
    w = Window.partitionBy("_g").orderBy("_sfx")
    match = F.greatest(
        _lcp(F.col("_sfx"), F.lag("_sfx").over(w)),
        _lcp(F.col("_sfx"), F.lead("_sfx").over(w)),
    )
    return (
        occ.select(F.col(id_col), "pos", match.alias("match_len"))
        .filter(F.col("match_len") >= min_span)
    )


def profile_hashed(docs, min_span=5, bound=SUFFIX_BOUND,
                   max_group=MAX_SHINGLE_FREQ, text_col="text",
                   id_col="doc_id"):
    m = suffix_match_hashed(docs, min_span, bound, max_group)
    per_doc = m.groupBy(id_col).agg(
        F.max("match_len").alias("_mx"),
        F.count(F.lit(1)).alias("_np"))
    n_tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    return (
        docs.select(F.col(id_col), n_tokens.alias("n_tokens"))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col), "n_tokens",
            F.coalesce(F.col("_mx"), F.lit(0)).cast("int")
            .alias("max_dup_len"),
            F.coalesce(F.col("_np"), F.lit(0)).cast("long")
            .alias("n_dup_positions")))


def histogram_hashed(docs, min_span=5, bound=SUFFIX_BOUND,
                     max_group=MAX_SHINGLE_FREQ):
    return (suffix_match_hashed(docs, min_span, bound, max_group)
            .groupBy("match_len")
            .agg(F.count(F.lit(1)).alias("n_positions")))


docs = _docs(spark, sf_dir)

# ---- injectivity: token vocab AND the min_span-gram key ----
toks = docs.select(F.explode(F.split("text", " ")).alias("t"))
inj = {
    "distinct_tok": toks.select("t").distinct().count(),
    "distinct_tok_hash": toks.select(F.xxhash64("t")).distinct().count(),
}
print("INJECTIVITY", json.dumps(inj))
assert inj["distinct_tok"] == inj["distinct_tok_hash"], inj

# ---- value identity vs registry builders ----
def rows(df):
    return sorted(map(tuple, df.collect()))

checks = [
    ("profile", QUERIES["dup_span_profile"].builder(spark, sf_dir),
     profile_hashed(docs)),
    ("histogram", QUERIES["dup_span_histogram"].builder(spark, sf_dir),
     histogram_hashed(docs)),
]
for name, cur, new in checks:
    rc, rn = rows(cur), rows(new)
    assert rc == rn, f"{name}: VALUE MISMATCH cur={len(rc)} new={len(rn)}"
    print(f"IDENTITY OK {name} rows={len(rc)}")

# ---- interleaved timing ----
import duckdb
_cal = duckdb.connect(); _cal.execute("SET threads=1")
CALIB = "SELECT sum(i*i) FROM range(25000000) t(i)"
def calib():
    t0 = time.perf_counter(); _cal.execute(CALIB).fetchall()
    return round(time.perf_counter() - t0, 3)

variants = {
    "profile_cur": lambda: QUERIES["dup_span_profile"].builder(spark, sf_dir),
    "profile_hash": lambda: profile_hashed(docs),
    "histogram_cur": lambda: QUERIES["dup_span_histogram"].builder(spark, sf_dir),
    "histogram_hash": lambda: histogram_hashed(docs),
}
PASSES = 6
samples = {n: [] for n in variants}
cals = {n: [] for n in variants}
for p in range(PASSES):
    for n, build in variants.items():
        spark.sparkContext.setJobDescription(f"suffixAB {n} p{p}")
        cals[n].append(calib())
        t0 = time.perf_counter()
        noop(build())
        samples[n].append(round(time.perf_counter() - t0, 3))
    spark.sparkContext._jvm.System.gc()
print(json.dumps({"sf_dir": sf_dir,
                  "results": {n: {"best": min(s), "all": s, "calib": cals[n]}
                              for n, s in samples.items()}},
                 separators=(",", ":")))
