"""Stage decomposition of dedup_minhash_lsh at scale (r9 mandate #1).

dedup_minhash_lsh is the only data-dominated query above the 2x
same-run-DuckDB bar at every measured scale (sf0.1 9.4x, x10 2.31x,
x20 2.16x — BENCH_DETAIL_sf0.1x*.json). Its plan is already the right
SHAPE (checkpointed band table, sharded chains, one signature pass),
so before touching it the residual must be attributed by STAGE — the
FLOOR_DECOMP discipline applied to the dedup flagship.

Stages timed (each an isolated action over the x-multiple corpus,
best-of-N, builders inside the timer exactly like bench.py's
rebuilt_per_pass methodology):

  signatures   shingle explode + md5 + 16-way min HashAggregate
               (one map-combined shuffle) — the engine-portable-hash
               pass whose md5+conv tax is already quantified (~3.3 s
               of ~7 s at x10, SCALE.md round 6)
  bands_ckpt   + stack to (id, band, bucket) + localCheckpoint
               (the first _materialize: full band-table write)
  sizes_bk     + bucket-size agg + broadcast join + SECOND
               localCheckpoint (bk: the full band table written AGAIN)
  pairs_join   + the <=cap self-join (two exchanges off the bk
               checkpoint) + filter id_a < id_b
  full_query   the complete minhash_near_dup (adds chain windows,
               union, distinct) — equals the bench number

Deltas between consecutive rows attribute the wall to each stage.
DuckDB side: the oracle's own CTE chain cut at the same seams, so the
comparison is stage-vs-stage, not wall-vs-wall.

Usage (solo — never alongside another JVM/bench):
  python tools/minhash_decomp.py [multiple] [--passes N]
writes MINHASH_DECOMP.json and prints a one-line summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = 3


def spark_stages(sf_dir: str, passes: int) -> dict[str, float]:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from tools.scale_testdata import split_confs

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    _builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # scaled corpora are multi-row-group since r11 (scale_testdata)
    for _k, _v in split_confs(int(cpus)).items():
        _builder = _builder.config(_k, _v)
    spark = _builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from trendmachine_spark.extensions import dedup
    from trendmachine_spark.registry import _docs

    docs = _docs(spark, sf_dir)
    docs.count()  # warm page cache / scan

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def stage_signatures():
        noop(dedup.minhash_signatures(docs))

    def stage_bands_ckpt():
        b = dedup.lsh_band_buckets(dedup.minhash_signatures(docs))
        dedup._materialize(b)  # eager localCheckpoint IS the action

    def _bk():
        b = dedup._materialize(dedup.lsh_band_buckets(dedup.minhash_signatures(docs)))
        sizes = (
            b.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") > dedup.MAX_LSH_BUCKET)
        )
        return dedup._materialize(b.join(F.broadcast(sizes), ["band", "bucket"], "left"))

    def stage_sizes_bk():
        _bk()

    def stage_pairs_join():
        bk = _bk()
        small = bk.filter(F.col("_bn").isNull())
        a = small.select(F.col("doc_id").alias("id_a"), "band", "bucket")
        b2 = small.select(F.col("doc_id").alias("id_b"), "band", "bucket")
        noop(
            a.join(b2, ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )

    def stage_full_query():
        noop(dedup.minhash_near_dup(docs))

    stages = {
        "signatures": stage_signatures,
        "bands_ckpt": stage_bands_ckpt,
        "sizes_bk": stage_sizes_bk,
        "pairs_join": stage_pairs_join,
        "full_query": stage_full_query,
    }
    best: dict[str, float] = {}
    for _ in range(passes):
        for name, fn in stages.items():
            t0 = time.perf_counter()
            fn()
            best[name] = round(min(best.get(name, 1e9), time.perf_counter() - t0), 3)
    spark.stop()
    return best


def duckdb_stages(sf_dir: str, passes: int) -> dict[str, float]:
    import duckdb

    from trendmachine_spark.registry import _minhash_ctes
    from trendmachine_spark.sources.tables import TABLES

    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    ctes = _minhash_ctes()
    cuts = {
        # same seams: signature pass, band materialization, bucket-size
        # + shard table, <=cap self-join, full candidate set
        "signatures": "SELECT count(*) FROM sig",
        "bands_ckpt": "SELECT count(*) FROM bands",
        "sizes_bk": "SELECT count(*) FROM bshard",
        "pairs_join": (
            "SELECT count(*) FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b "
            "FROM bshard a JOIN bshard b ON a.band = b.band AND a.bucket = b.bucket "
            "AND a.doc_id < b.doc_id WHERE a.bn <= 100)"
        ),
        "full_query": "SELECT count(*) FROM cand",
    }
    best: dict[str, float] = {}
    for _ in range(passes):
        for name, tail in cuts.items():
            q = f"WITH {ctes} {tail}"
            t0 = time.perf_counter()
            con.execute(q).fetchall()
            best[name] = round(min(best.get(name, 1e9), time.perf_counter() - t0), 3)
    con.close()
    return best


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10
    passes = PASSES
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tools.scale_testdata import scale_dir, split_confs

    sf_dir = scale_dir(src, f"/tmp/trendmachine_scaled_x{mult}", mult)
    spark = spark_stages(sf_dir, passes)
    duck = duckdb_stages(sf_dir, passes)

    def deltas(d: dict[str, float]) -> dict[str, float]:
        order = ["signatures", "bands_ckpt", "sizes_bk", "pairs_join", "full_query"]
        out, prev = {}, 0.0
        for k in order:
            out[k] = round(max(d[k] - prev, 0.0), 3)
            prev = max(d[k], prev)
        return out

    report = {
        "sf": f"0.1x{mult}",
        "passes": passes,
        "spark_cumulative_best": spark,
        "duckdb_cumulative_best": duck,
        "spark_stage_deltas": deltas(spark),
        "duckdb_stage_deltas": deltas(duck),
        "note": (
            "Cumulative prefixes of the same plan (each row re-runs the "
            "prior stages — builders inside the timer, nothing cached "
            "across rows); stage_deltas attribute the wall to each stage. "
            "Spark rows after bands_ckpt pay the localCheckpoint write(s); "
            "DuckDB rows read the MATERIALIZED CTEs at the same seams."
        ),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "MINHASH_DECOMP.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"spark": spark, "duckdb": duck}))


if __name__ == "__main__":
    main()
