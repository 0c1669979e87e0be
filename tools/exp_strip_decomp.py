"""Stage decomposition of substring_dedup (strip_duplicated_spans) —
where does the x10 wall actually go? Stages timed with the noop sink,
interleaved across passes:

  occ        window explode alone (the corpus scan + gram build)
  keepers    keeper aggregation (lazy, no checkpoint) over occ
  construct  builder construction only (the eager checkpoint + count)
  markphase  checkpointed keepers -> join -> removable -> covered
  full       the registered query

Run under tools/opt_r14_probe.py exec (sees: spark, sf_dir, noop).
"""
import json
import time

from pyspark.sql import functions as F

from trendmachine_spark.extensions.dedup import (
    _materialize, rebalance_for_fanout, window_occurrences,
)
from trendmachine_spark.registry import QUERIES, _docs

docs = _docs(spark, sf_dir)
WIN = 10
ID = "doc_id"


def occ_df():
    return window_occurrences(docs, win=WIN)


def keepers_df():
    return (occ_df().groupBy("gram")
            .agg(F.min(F.struct(F.col(ID), F.col("pos"))).alias("_keep"),
                 F.count(F.lit(1)).alias("_f"))
            .filter(F.col("_f") >= 2).select("gram", "_keep"))


def covered_df(keepers):
    occ = occ_df()
    joined = occ.join(keepers, "gram")
    removable = (
        joined.filter((F.col(ID) != F.col("_keep")[ID])
                      | (F.col("pos") != F.col("_keep")["pos"]))
        .select(ID, "pos"))
    return removable.select(
        F.col(ID),
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (WIN - 1)))
        .alias("pos")).distinct()


def toks_df():
    words = F.split(F.col("text"), " ")
    t = rebalance_for_fanout(docs.select(F.col(ID), F.col("text"))).select(
        F.col(ID), F.posexplode(words).alias("_p0", "tok"))
    return t.select(F.col(ID), (F.col("_p0") + 1).alias("pos"), "tok")


def reassemble(kept):
    return kept.groupBy(ID).agg(
        F.count(F.lit(1)).cast("long").alias("_n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"),
                                                     F.col("tok")))),
                lambda s: s["tok"]), " ").alias("clean_text"))


stages = {
    "occ": lambda: noop(occ_df()),
    "keepers_lazy": lambda: noop(keepers_df()),
    "toks": lambda: noop(toks_df()),
}


def t_construct():
    k = _materialize(keepers_df())
    k.count()
    return k


def stage_construct():
    t_construct()


def stage_mark_covered():
    k = t_construct()
    noop(covered_df(k))


def stage_anti_reassemble():
    k = t_construct()
    cov = covered_df(k)
    kept = toks_df().join(cov, [ID, "pos"], "left_anti")
    noop(reassemble(kept))


def stage_full():
    noop(QUERIES["substring_dedup"].builder(spark, sf_dir))


stages["construct"] = stage_construct
stages["mark_covered"] = stage_mark_covered
stages["anti_reassemble"] = stage_anti_reassemble
stages["full"] = stage_full

PASSES = 4
samples = {n: [] for n in stages}
for p in range(PASSES):
    for n, fn in stages.items():
        spark.sparkContext.setJobDescription(f"stripDecomp {n} p{p}")
        t0 = time.perf_counter()
        fn()
        samples[n].append(round(time.perf_counter() - t0, 3))
    spark.sparkContext._jvm.System.gc()
print(json.dumps({"sf_dir": sf_dir,
                  "results": {n: {"best": min(s), "all": s}
                              for n, s in samples.items()}},
                 separators=(",", ":")))
