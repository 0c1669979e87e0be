"""Stage decomposition + A/B for corpus_stats (r10 mandate: 3.4x
same-run DuckDB at x20 with no attribution artifact).

Hypothesis from the plan: the r9 shape ranked EVERY document with
row_number over Window.partitionBy(source) — parallelism bounded by
the number of sources (a handful), so the sort of the dominant group
runs on one core; and size(split(text)) materializes a token array per
document just to count it. The r10 shape aggregates to a (source,
chars) histogram first (map-combined, docs cross the wire once as
counts) and picks nearest-ranks from a running count over distinct
lengths; token counts are arithmetic (spaces+1 via translate).

Stages measured (best-of-N, noop sink, warmed):
  scan_floor_s        length+tokens projection + global agg — the
                      irreducible read-and-tokenize cost
  scan_floor_split_s  same but tokens via size(split()) — the array tax
  old_shape_s         r9 row_number-over-group-sort formulation
  new_shape_s         shipped histogram formulation
  duckdb_oracle_s     same-run oracle (row_number formulation in SQL)

Writes CORPUS_STATS_DECOMP.json and asserts old/new value equality.

Usage: python tools/corpus_stats_decomp.py [sf_dir] (default x20)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = 4


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trendmachine_scaled_x20"
    out: dict = {"sf_dir": sf_dir, "runs": RUNS}

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout
    from trendmachine_spark.extensions.text import corpus_stats
    from trendmachine_spark.registry import QUERIES, _docs

    docs = _docs(spark, sf_dir)
    docs.count()

    def best(build) -> float:
        t = 1e9
        for _ in range(RUNS):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            t = min(t, time.perf_counter() - t0)
        return round(t, 3)

    src = lambda: rebalance_for_fanout(  # noqa: E731
        docs.select("source", "doc_id", "text"))
    toks_arith = (F.length("text")
                  - F.length(F.translate(F.col("text"), " ", "")) + 1)
    toks_split = F.size(F.split(F.col("text"), " "))

    out["scan_floor_s"] = best(lambda: src().select(
        F.length("text").alias("c"), toks_arith.alias("t"))
        .agg(F.sum("c"), F.sum("t")))
    out["scan_floor_split_s"] = best(lambda: src().select(
        F.length("text").alias("c"), toks_split.alias("t"))
        .agg(F.sum("c"), F.sum("t")))

    def old_shape():
        base = src().select(
            F.col("source").alias("grp"), F.col("doc_id"),
            F.length("text").alias("_chars"), toks_split.alias("_toks"))
        wg = Window.partitionBy("grp")
        w = wg.orderBy("_chars", "doc_id")
        ranked = (base.withColumn("_rn", F.row_number().over(w))
                  .withColumn("_n", F.count(F.lit(1)).over(wg)))
        p50 = F.expr("(_n - 1) div 2 + 1")
        p90 = F.expr("((_n - 1) * 9) div 10 + 1")
        return (ranked.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_toks").alias("total_tokens"),
            (F.sum("_chars").cast("double") / F.count(F.lit(1))).alias("mean_chars"),
            F.max(F.when(F.col("_rn") == p50, F.col("_chars"))).cast("long").alias("p50_chars"),
            F.max(F.when(F.col("_rn") == p90, F.col("_chars"))).cast("long").alias("p90_chars"),
        ).withColumnRenamed("grp", "source"))

    out["old_shape_s"] = best(old_shape)
    out["new_shape_s"] = best(lambda: corpus_stats(docs))

    old_rows = sorted(map(tuple, old_shape().collect()))
    new_rows = sorted(map(tuple, corpus_stats(docs).collect()))
    assert old_rows == new_rows, "histogram rewrite changed values!"
    out["values_identical"] = True
    spark.stop()

    import duckdb

    from trendmachine_spark.sources.tables import TABLES

    con = duckdb.connect()
    con.execute(f"SET threads={cpus}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = QUERIES["corpus_stats"].oracle
    td = 1e9
    for _ in range(RUNS):
        t0 = time.perf_counter()
        con.execute(oracle).fetchall()
        td = min(td, time.perf_counter() - t0)
    out["duckdb_oracle_s"] = round(td, 3)
    with open("CORPUS_STATS_DECOMP.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
