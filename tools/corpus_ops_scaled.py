"""Scaled measurement of the round-3 corpus operators: Spark vs DuckDB.

Same discipline as bench.py / tools/duckdb_suite.py (noop-sink full
materialization, best-of-4 interleaved, warmed caches), over the
derived K-multiple dataset from tools/scale_testdata.py — the regime
where data costs, not fixed per-action overhead, dominate.

Run the two engines SEQUENTIALLY (never concurrently on this shared
32-core box):
  python tools/corpus_ops_scaled.py spark  [sf_dir]
  python tools/corpus_ops_scaled.py duckdb [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _telemetry_probe():
    """Same load telemetry as bench.py (r11): single-threaded DuckDB
    calibration probe + loadavg, so co-tenant pressure is visible
    inside the artifact it pollutes. Returns (calib() -> float,
    loadavg() -> list)."""
    import duckdb

    from bench import CALIB_SQL, _loadavg

    con = duckdb.connect()
    con.execute("SET threads=1")

    def calib() -> float:
        t0 = time.perf_counter()
        con.execute(CALIB_SQL).fetchall()
        return round(time.perf_counter() - t0, 4)

    return calib, _loadavg


OPS = [
    "dedup_segments",
    "dedup_semantic",
    "dedup_semantic_keepers",
    "chunk_documents",
    "corpus_stats",
    # round 4
    "substring_dup_report",
    "substring_dedup",
    "multimodal_decode_real",
]


def run_spark(sf_dir: str) -> None:
    from pyspark.sql import SparkSession

    from tools.scale_testdata import split_confs

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # scaled corpora are multi-row-group since r11; these confs let the
    # session cut the MB-scale files into ~2x-cores splits
    for key, val in split_confs(int(cpus)).items():
        builder = builder.config(key, val)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from trendmachine_spark.registry import QUERIES, _docs, _embeddings

    _docs(spark, sf_dir).count()
    _embeddings(spark, sf_dir).count()
    calib, loadavg = _telemetry_probe()
    load_pre = loadavg()
    pass_calib: list[float] = []
    timings: dict[str, float] = {}
    # r13 (verdict #6): the four extension floor queries are pure
    # submission-floor rows at scale (sub-second aggregates measured
    # one action each) — count them ALSO through one run_suite action,
    # the same batched form the sf0.1 headline suite has used since
    # r8, so the scaled weak list reflects operator cost rather than
    # the local-mode per-action constant. Individual walls stay in
    # `queries` for round-over-round comparability; the batched wall
    # lands in `floor_suite_batched` with its member list.
    from trendmachine_spark.suite import suite_frame

    SCALED_FLOOR = ("training_splits", "event_attribution",
                    "split_leakage_report", "corpus_stats")
    floor_members = [n for n in SCALED_FLOOR if n in OPS]
    suite_df = (suite_frame(spark, sf_dir, floor_members)
                if len(floor_members) > 1 else None)
    batched = 1e9
    for _ in range(4):
        pass_calib.append(calib())
        for n in OPS:
            # builder INSIDE the timer: dedup_semantic_keepers'
            # connected-components iteration materializes during build
            # (persist + per-round count), not during the noop write
            t0 = time.perf_counter()
            QUERIES[n].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[n] = round(min(timings.get(n, 1e9), time.perf_counter() - t0), 3)
        if suite_df is not None:
            t0 = time.perf_counter()
            suite_df.write.format("noop").mode("overwrite").save()
            batched = round(min(batched, time.perf_counter() - t0), 3)
    out = {"engine": "spark", "sf_dir": sf_dir, "queries": timings,
           "total": round(sum(timings.values()), 3),
           "load": {"pre": load_pre, "post": loadavg(),
                    "pass_calib": pass_calib}}
    if suite_df is not None:
        out["floor_suite_batched"] = {"members": floor_members,
                                      "best": batched}
    print(json.dumps(out))
    spark.stop()


def _scaled_oracles(sf_dir: str) -> dict:
    """Engine-twin SQL keyed by op name. The semantic ops follow the
    r12 sqrt cell rule on the SPARK side, so their DuckDB twins must
    be re-generated at the SAME n_cells — comparing a 256-cell Spark
    run against a 16-cell SQL twin would time two different
    computations (and flatter Spark: the fixed-cell one is the
    superlinear one). All other ops use their registered oracle."""
    from trendmachine_spark.registry import (
        QUERIES,
        _semantic_cells,
        _semantic_dedup_oracle,
        _semantic_keepers_oracle,
        _split_semantic_leakage_oracle,
    )

    cells = _semantic_cells(sf_dir)
    out = {n: QUERIES[n].oracle for n in OPS}
    if "dedup_semantic" in out:
        out["dedup_semantic"] = _semantic_dedup_oracle(cells)
    if "dedup_semantic_keepers" in out:
        out["dedup_semantic_keepers"] = _semantic_keepers_oracle(cells)
    if "split_semantic_leakage" in out:
        out["split_semantic_leakage"] = _split_semantic_leakage_oracle(cells)
    return out


def run_duckdb(sf_dir: str) -> None:
    import duckdb

    from trendmachine_spark.sources.tables import TABLES

    oracles = _scaled_oracles(sf_dir)
    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    calib, loadavg = _telemetry_probe()
    load_pre = loadavg()
    pass_calib: list[float] = []
    timings: dict[str, float] = {}
    for _ in range(4):
        pass_calib.append(calib())
        for n in OPS:
            t0 = time.perf_counter()
            con.execute(oracles[n]).fetchall()
            timings[n] = round(min(timings.get(n, 1e9), time.perf_counter() - t0), 3)
    print(json.dumps({"engine": "duckdb", "sf_dir": sf_dir, "queries": timings,
                      "total": round(sum(timings.values()), 3),
                      "load": {"pre": load_pre, "post": loadavg(),
                               "pass_calib": pass_calib}}))


if __name__ == "__main__":
    args = sys.argv[1:]
    if "--ops" in args:  # subset (e.g. skip the >280 s DuckDB oracles)
        i = args.index("--ops")
        OPS = args[i + 1].split(",")  # noqa: F811
        args = args[:i] + args[i + 2:]
    engine = args[0]
    sf_dir = args[1] if len(args) > 1 else "/tmp/trendmachine_scaled_x10"
    (run_spark if engine == "spark" else run_duckdb)(sf_dir)
