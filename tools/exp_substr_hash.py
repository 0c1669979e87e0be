"""Interleaved A/B for the substring-dedup family + segment dedup:
current registry shape (gram/segment STRINGS on every exchange and on
the auto-salt checkpoint) vs guide §2.3 variants that shuffle 8-byte
xxhash64 keys instead of the 10-token strings, and (for the substring
pair) checkpoint the hashed OCCURRENCE table once instead of the
dup-gram set — so the corpus-wide window explode runs once, not twice.

Run under tools/opt_r14_probe.py exec (sees: spark, sf_dir, noop).
Value identity is asserted (collect-compare vs the registry builders)
BEFORE any timing. Builder inside the timer (these ops materialize
state at construction — corpus_ops_scaled methodology).
"""
import json
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from trendmachine_spark.extensions.dedup import (
    AUTO_MARK_SALT_GRAMS, MARK_SALT_DEFAULT, _mark_join, _materialize,
    rebalance_for_fanout,
)
from trendmachine_spark.registry import QUERIES, _docs


def occ_hashed(docs, win, text_col="text", id_col="doc_id"):
    """window_occurrences with gram = xxhash64 over the win token
    columns (no concat string ever built; 8-byte join/group key)."""
    words = F.split(F.col(text_col), " ")
    base = rebalance_for_fanout(
        docs.select(F.col(id_col), F.col(text_col))
    ).select(F.col(id_col), words.alias("_w")).filter(F.size("_w") >= win)
    idx = base.select(
        F.col(id_col), "_w",
        F.explode(F.sequence(F.lit(1), F.size("_w") - (win - 1))).alias("pos"),
    )
    gh = F.xxhash64(*[F.element_at(F.col("_w"), F.col("pos") + j)
                      for j in range(win)])
    return idx.select(F.col(id_col), "pos", gh.alias("gram"))


def report_variant(docs, win=10, ckpt_occ=True, id_col="doc_id",
                   text_col="text"):
    occ = occ_hashed(docs, win)
    if ckpt_occ:
        occ = _materialize(occ)
    dup_grams = (
        occ.groupBy("gram").agg(F.count(F.lit(1)).alias("_f"))
        .filter(F.col("_f") >= 2).select("gram")
    )
    if not ckpt_occ:
        dup_grams = _materialize(dup_grams)
    n = dup_grams.count()
    salt = MARK_SALT_DEFAULT if n > AUTO_MARK_SALT_GRAMS else None
    marked = _mark_join(occ, dup_grams, id_col, salt).select(id_col, "pos")
    wd = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + (win - 1)).over(
        wd.rowsBetween(Window.unboundedPreceding, -1))
    islands = (
        marked.withColumn("_new", F.when(F.col("pos") <= prev_end + 1, 0)
                          .otherwise(1))
        .withColumn("_iid", F.sum("_new").over(wd))
        .groupBy(id_col, "_iid")
        .agg((F.max("pos") + (win - 1) - F.min("pos") + 1).alias("_len"))
        .groupBy(id_col)
        .agg(F.sum("_len").cast("long").alias("dup_tokens"),
             F.count(F.lit(1)).cast("long").alias("n_islands")))
    n_tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    return (
        docs.select(F.col(id_col), n_tokens.alias("n_tokens"))
        .join(islands, id_col, "left")
        .select(
            id_col, "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            (F.coalesce("dup_tokens", F.lit(0)).cast("double")
             / F.col("n_tokens")).alias("dup_fraction"),
            F.coalesce("n_islands", F.lit(0)).alias("n_islands")))


def strip_variant(docs, win=10, ckpt_occ=True, id_col="doc_id",
                  text_col="text"):
    occ = occ_hashed(docs, win)
    if ckpt_occ:
        occ = _materialize(occ)
    keepers = (
        occ.groupBy("gram")
        .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_keep"),
             F.count(F.lit(1)).alias("_f"))
        .filter(F.col("_f") >= 2).select("gram", "_keep"))
    if not ckpt_occ:
        keepers = _materialize(keepers)
    n = keepers.count()
    salt = MARK_SALT_DEFAULT if n > AUTO_MARK_SALT_GRAMS else None
    if salt is None:
        joined = occ.join(keepers, "gram")
    else:
        joined = occ.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(id_col), F.col("pos")),
                            F.lit(salt))
        ).join(
            keepers.withColumn(
                "_salt", F.explode(F.sequence(
                    F.lit(0).cast("long"), F.lit(salt - 1).cast("long")))),
            ["gram", "_salt"])
    removable = (
        joined.filter((F.col(id_col) != F.col("_keep")[id_col])
                      | (F.col("pos") != F.col("_keep")["pos"]))
        .select(id_col, "pos"))
    covered = removable.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (win - 1)))
        .alias("pos")).distinct()
    words = F.split(F.col(text_col), " ")
    toks = rebalance_for_fanout(
        docs.select(F.col(id_col), F.col(text_col))
    ).select(F.col(id_col), F.posexplode(words).alias("_p0", "tok"))
    toks = toks.select(F.col(id_col), (F.col("_p0") + 1).alias("pos"), "tok")
    kept = toks.join(covered, [id_col, "pos"], "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"),
                                                     F.col("tok")))),
                lambda s: s["tok"]), " ").alias("clean_text"))
    n_tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    return (
        docs.select(F.col(id_col), n_tokens.alias("n_tokens"))
        .join(reassembled, id_col, "left")
        .select(
            id_col, "n_tokens",
            (F.col("n_tokens") - F.coalesce("_n_kept", F.lit(0)))
            .cast("long").alias("n_removed_tokens"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text")))


def segments_variant(docs, seg_words=10, max_doc_freq=2, id_col="doc_id",
                     text_col="text"):
    """segment_dedup with the hot-set aggregation + join keyed by
    xxhash64(seg) — the (seg, id) count-distinct exchange carries 8-byte
    keys instead of ~60-byte segment strings."""
    words = F.split(F.col(text_col), " ")
    base = rebalance_for_fanout(
        docs.select(F.col(id_col), F.col(text_col))
    ).select(F.col(id_col), words.alias("_w"))
    nseg = F.floor((F.size("_w") + (seg_words - 1)) / seg_words).cast("int")
    seg = F.concat_ws(
        " ", *[F.try_element_at(F.col("_w"),
                                F.col("seg_id") * seg_words + j + 1)
               for j in range(seg_words)])
    segs = (
        base.select(F.col(id_col), nseg.alias("n_segments"), "_w",
                    F.explode(F.sequence(F.lit(0), nseg - 1)).alias("seg_id"))
        .select(id_col, "n_segments", "seg_id", seg.alias("seg"),
                F.xxhash64(seg).alias("_sh")))
    hot = (
        segs.groupBy("_sh")
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .filter(F.col("_df") > max_doc_freq)
        .select("_sh", F.lit(True).alias("_hot")))
    flagged = segs.join(hot, "_sh", "left")
    kept_struct = F.when(
        F.col("_hot").isNull(), F.struct(F.col("seg_id"), F.col("seg")))
    return (
        flagged.groupBy(id_col)
        .agg(F.first("n_segments").alias("n_segments"),
             F.count(F.col("_hot")).alias("n_removed"),
             F.array_join(
                 F.transform(F.array_sort(F.collect_list(kept_struct)),
                             lambda s: s["seg"]), " ").alias("clean_text")))


docs = _docs(spark, sf_dir)

# ---- injectivity probes: hash collisions would silently merge keys ----
inj = {}
for win in (5, 10):
    from trendmachine_spark.extensions.dedup import window_occurrences
    o_str = window_occurrences(docs, win=win)
    o_h = occ_hashed(docs, win)
    inj[f"win{win}"] = {
        "distinct_gram": o_str.select("gram").distinct().count(),
        "distinct_hash": o_h.select("gram").distinct().count(),
    }
from trendmachine_spark.extensions.dedup import segment_dedup  # noqa: E402
_seg_all = (
    docs.select(F.split("text", " ").alias("_w"), F.col("doc_id"))
    .select("doc_id", F.explode(F.sequence(
        F.lit(0),
        F.floor((F.size("_w") + 9) / 10).cast("int") - 1)).alias("i"), "_w")
    .select(F.concat_ws(" ", *[
        F.try_element_at(F.col("_w"), F.col("i") * 10 + j + 1)
        for j in range(10)]).alias("seg")))
inj["seg10"] = {
    "distinct_gram": _seg_all.select("seg").distinct().count(),
    "distinct_hash": _seg_all.select(F.xxhash64("seg")).distinct().count(),
}
print("INJECTIVITY", json.dumps(inj))
for k, v in inj.items():
    assert v["distinct_gram"] == v["distinct_hash"], (k, v)

# ---- value identity (collect-compare, sorted) ----
def rows(df):
    return sorted(map(tuple, df.collect()))

checks = [
    ("report", QUERIES["substring_dup_report"].builder(spark, sf_dir),
     report_variant(docs, 10, True)),
    ("report_fine", QUERIES["substring_dup_report_fine"].builder(spark, sf_dir),
     report_variant(docs, 5, True)),
    ("strip", QUERIES["substring_dedup"].builder(spark, sf_dir),
     strip_variant(docs, 10, True)),
    ("segments", QUERIES["dedup_segments"].builder(spark, sf_dir),
     segments_variant(docs)),
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
    "report_cur": lambda: QUERIES["substring_dup_report"].builder(spark, sf_dir),
    "report_hash": lambda: report_variant(docs, 10, ckpt_occ=False),
    "report_hashocc": lambda: report_variant(docs, 10, ckpt_occ=True),
    "strip_cur": lambda: QUERIES["substring_dedup"].builder(spark, sf_dir),
    "strip_hash": lambda: strip_variant(docs, 10, ckpt_occ=False),
    "strip_hashocc": lambda: strip_variant(docs, 10, ckpt_occ=True),
    "segments_cur": lambda: QUERIES["dedup_segments"].builder(spark, sf_dir),
    "segments_hash": lambda: segments_variant(docs),
}
PASSES = 6
samples = {n: [] for n in variants}
cals = {n: [] for n in variants}
for p in range(PASSES):
    for n, build in variants.items():
        spark.sparkContext.setJobDescription(f"substrAB {n} p{p}")
        cals[n].append(calib())
        t0 = time.perf_counter()
        noop(build())
        samples[n].append(round(time.perf_counter() - t0, 3))
    spark.sparkContext._jvm.System.gc()
print(json.dumps({"sf_dir": sf_dir,
                  "results": {n: {"best": min(s), "all": s, "calib": cals[n]}
                              for n, s in samples.items()}},
                 separators=(",", ":")))
