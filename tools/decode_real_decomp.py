"""Stage decomposition of multimodal_decode_real (r10 mandate: the
last >2x corpus op without an attribution artifact — 5.09x same-run
DuckDB at x20, 2.28 s absolute).

The query is apples-to-oranges BY CONSTRUCTION: Spark synthesizes real
BMP/WAV files from doc_id, pushes the bytes through Arrow into a second
mapInPandas, and byte-level DECODES them; the DuckDB oracle evaluates
the closed-form generator sums without touching a byte. This tool
splits the Spark wall into its parts so the ratio has a measured cause:

  synth_only    encode-only mapInPandas (payload bytes -> noop sink)
  two_step      the shipped shape: synth stage -> Arrow -> decode stage
  fused         ONE mapInPandas doing synth+decode (bytes never cross
                Arrow). Result (x20): SLOWER than two_step — chained
                mapInPandas stages run as two pipelined Python workers
                per task, so the saved Arrow hop loses to the lost
                encode/decode overlap (fused_minus_two_step_s > 0)
  python_cpu    single-threaded encode+decode loop over a sample,
                extrapolated: the pure codec CPU floor (divide by
                cores for the ideal parallel wall)
  duckdb_oracle the closed-form no-decode twin

Writes DECODE_REAL_DECOMP.json. Run engines sequentially, never while
another Spark JVM is benching.

Usage: python tools/decode_real_decomp.py [sf_dir] (default x20 corpus)
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

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from trendmachine_spark.extensions.multimodal import (
        _media_decode_one,
        _media_synth_one,
        decode_assets_real,
        synth_decode_media_fused,
        synthetic_media_assets,
    )
    from trendmachine_spark.registry import QUERIES, _docs

    docs = _docs(spark, sf_dir)
    n_docs = docs.count()
    out["n_docs"] = n_docs

    def best(build) -> float:
        t = 1e9
        for _ in range(RUNS):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            t = min(t, time.perf_counter() - t0)
        return round(t, 3)

    out["synth_only_s"] = best(lambda: synthetic_media_assets(docs))
    out["two_step_s"] = best(
        lambda: decode_assets_real(synthetic_media_assets(docs)))
    out["fused_s"] = best(lambda: synth_decode_media_fused(docs))
    out["fused_minus_two_step_s"] = round(
        out["fused_s"] - out["two_step_s"], 3)

    # pure-Python codec CPU: encode+decode SAMPLE ids single-threaded
    synth_one, decode_one = _media_synth_one(), _media_decode_one()
    sample = 20_000
    t0 = time.perf_counter()
    enc = [synth_one(d)[0] for d in range(sample)]
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for d, b in enumerate(enc):
        decode_one(d, b)
    t_dec = time.perf_counter() - t0
    scale = n_docs / sample
    out["python_cpu"] = {
        "sample_ids": sample,
        "encode_s_extrapolated": round(t_enc * scale, 3),
        "decode_s_extrapolated": round(t_dec * scale, 3),
        "ideal_parallel_wall_s": round(
            (t_enc + t_dec) * scale / int(cpus), 3),
        "cores": int(cpus),
    }
    spark.stop()

    import duckdb

    from trendmachine_spark.sources.tables import TABLES

    con = duckdb.connect()
    con.execute(f"SET threads={cpus}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = QUERIES["multimodal_decode_real"].oracle
    td = 1e9
    for _ in range(RUNS):
        t0 = time.perf_counter()
        con.execute(oracle).fetchall()
        td = min(td, time.perf_counter() - t0)
    out["duckdb_oracle_s"] = round(td, 3)
    out["note"] = (
        "the oracle computes generator sums in closed form and never "
        "decodes a byte; Spark's wall is real per-asset codec CPU "
        "(python_cpu) plus the mapInPandas harness — the ratio "
        "measures decode-vs-no-decode, not engine efficiency"
    )
    with open("DECODE_REAL_DECOMP.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
