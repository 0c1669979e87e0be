"""Prototype: strip_duplicated_spans with a mapInPandas REASSEMBLY —
instead of exploding every token, anti-joining the exploded covered
set, and re-aggregating with an interpreted array_sort/transform, ship
each doc's (text, removable window starts) once through Arrow and do
the tokenize/mask/join in per-task Python (numpy mask + C-impl
split/join). Removes the covered explode+distinct exchange, the
posexplode of the whole token stream, the (id,pos) anti-join and the
collect_list reassembly exchange; adds one small groupBy(id) over
removable rows and one Arrow pass over (id, text, starts).

Value identity asserted vs the registered query before timing.
Run under tools/opt_r14_probe.py exec (sees: spark, sf_dir, noop).
"""
import json
import time

import pandas as pd
from pyspark.sql import functions as F

from trendmachine_spark.extensions.dedup import (
    AUTO_MARK_SALT_GRAMS, MARK_SALT_DEFAULT, _materialize,
    window_occurrences,
)
from trendmachine_spark.registry import QUERIES, _docs

WIN = 10
ID = "doc_id"
OUT_SCHEMA = ("doc_id long, n_tokens long, n_removed_tokens long, "
              "clean_text string")


def strip_arrow(docs, win=WIN, hashed_grams=False):
    occ = window_occurrences(docs, win=win, hashed=hashed_grams)
    keepers = (
        occ.groupBy("gram")
        .agg(F.min(F.struct(F.col(ID), F.col("pos"))).alias("_keep"),
             F.count(F.lit(1)).alias("_f"))
        .filter(F.col("_f") >= 2).select("gram", "_keep"))
    keepers = _materialize(keepers)
    n = keepers.count()
    salt = MARK_SALT_DEFAULT if n > AUTO_MARK_SALT_GRAMS else None
    if salt is None:
        joined = occ.join(keepers, "gram")
    else:
        joined = occ.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(ID), F.col("pos")),
                            F.lit(salt))
        ).join(
            keepers.withColumn(
                "_salt", F.explode(F.sequence(
                    F.lit(0).cast("long"), F.lit(salt - 1).cast("long")))),
            ["gram", "_salt"])
    removable = (
        joined.filter((F.col(ID) != F.col("_keep")[ID])
                      | (F.col("pos") != F.col("_keep")["pos"]))
        .select(ID, "pos"))
    starts = removable.groupBy(ID).agg(
        F.collect_list("pos").alias("_starts"))
    src = docs.select(F.col(ID), F.col("text")).join(starts, ID, "left")

    def run(batches):
        import numpy as np

        for pdf in batches:
            ids, ntoks, nrem, clean = [], [], [], []
            for did, text, st in zip(pdf[ID], pdf["text"], pdf["_starts"]):
                toks = text.split(" ")
                n = len(toks)
                if st is None or len(st) == 0:
                    ids.append(did); ntoks.append(n); nrem.append(0)
                    clean.append(text)
                    continue
                mask = np.zeros(n + win, dtype=bool)
                s = np.asarray(st, dtype=np.int64) - 1  # 1-based -> 0-based
                for j in range(win):
                    mask[s + j] = True
                mask = mask[:n]
                kept = [t for t, m in zip(toks, mask) if not m]
                ids.append(did); ntoks.append(n)
                nrem.append(int(mask.sum()))
                clean.append(" ".join(kept))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_tokens": pd.Series(ntoks, dtype="int64"),
                "n_removed_tokens": pd.Series(nrem, dtype="int64"),
                "clean_text": pd.Series(clean, dtype="object"),
            })

    return src.mapInPandas(run, schema=OUT_SCHEMA)


docs = _docs(spark, sf_dir)

def rows(df):
    return sorted(map(tuple, df.collect()))

cur = rows(QUERIES["substring_dedup"].builder(spark, sf_dir))
for label, new_df in (
    ("arrow_str", strip_arrow(docs, hashed_grams=False)),
    ("arrow_hash", strip_arrow(docs, hashed_grams=True)),
):
    rn = rows(new_df)
    assert cur == rn, f"{label}: VALUE MISMATCH {len(cur)} vs {len(rn)}"
    print(f"IDENTITY OK {label} rows={len(cur)}")

import duckdb
_cal = duckdb.connect(); _cal.execute("SET threads=1")
CALIB = "SELECT sum(i*i) FROM range(25000000) t(i)"
def calib():
    t0 = time.perf_counter(); _cal.execute(CALIB).fetchall()
    return round(time.perf_counter() - t0, 3)

variants = {
    "strip_cur": lambda: QUERIES["substring_dedup"].builder(spark, sf_dir),
    "strip_arrow_str": lambda: strip_arrow(docs, hashed_grams=False),
    "strip_arrow_hash": lambda: strip_arrow(docs, hashed_grams=True),
}
PASSES = 6
samples = {n: [] for n in variants}
cals = {n: [] for n in variants}
for p in range(PASSES):
    for n, build in variants.items():
        spark.sparkContext.setJobDescription(f"stripArrow {n} p{p}")
        cals[n].append(calib())
        t0 = time.perf_counter()
        noop(build())
        samples[n].append(round(time.perf_counter() - t0, 3))
    spark.sparkContext._jvm.System.gc()
print(json.dumps({"sf_dir": sf_dir,
                  "results": {n: {"best": min(s), "all": s, "calib": cals[n]}
                              for n, s in samples.items()}},
                 separators=(",", ":")))
