"""dedup_exact stage decomposition (round-11 mandate: the r10 ×20
artifact read 3.70× same-run DuckDB on an UNTOUCHED one-exchange plan
while the DuckDB twin held flat — attribute it or clear it).

Stages, each a noop-sink wall (best-of-4, one JVM):
  scan_id_text   — documents scan projecting (doc_id, text)
  md5_project    — + the md5(text) projection (the CPU of the query)
  full_query     — + the single hash agg (the only exchange)
plus the DuckDB twin in the same process afterwards (engines
sequential), and the r11 load telemetry (per-pass single-threaded
calibration probe + loadavg) so co-tenant pressure is visible in the
artifact rather than relitigated from memory.

Usage: python tools/dedup_exact_decomp.py [x_multiple] (default 20)
Writes DEDUP_EXACT_DECOMP.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = 4


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from tools.corpus_ops_scaled import _telemetry_probe
    from tools.scale_testdata import scale_dir, split_confs

    sf_dir = scale_dir(
        "/root/testdata/sf0.1", f"/tmp/trendmachine_scaled_x{mult}", mult)

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
    for _k, _v in split_confs(int(cpus)).items():
        _builder = _builder.config(_k, _v)
    spark = _builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from trendmachine_spark.extensions.dedup import exact_dedup
    from trendmachine_spark.registry import _docs

    docs = _docs(spark, sf_dir)
    docs.count()  # warm page cache / scan

    calib, loadavg = _telemetry_probe()
    load_pre = loadavg()
    pass_calib: list[float] = []

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    stages = {
        "scan_id_text": lambda: docs.select("doc_id", "text"),
        "md5_project": lambda: docs.select(
            "doc_id", F.md5(F.col("text")).alias("content_md5")),
        "full_query": lambda: exact_dedup(docs),
    }
    walls: dict[str, float] = {}
    scan_parts = docs.select("doc_id", "text").rdd.getNumPartitions()
    for _ in range(PASSES):
        pass_calib.append(calib())
        for name, build in stages.items():
            t0 = time.perf_counter()
            noop(build())
            walls[name] = round(
                min(walls.get(name, 1e9), time.perf_counter() - t0), 3)
    spark.stop()

    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads={cpus}")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')")
    duck_sql = ("SELECT md5(text) AS content_md5, "
                "CAST(min(doc_id) AS BIGINT) AS keeper_id, "
                "CAST(count(*) AS BIGINT) AS n_copies "
                "FROM documents GROUP BY md5(text)")
    duck = 1e9
    duck_calib: list[float] = []
    for _ in range(PASSES):
        duck_calib.append(calib())
        t0 = time.perf_counter()
        con.execute(duck_sql).fetchall()
        duck = min(duck, time.perf_counter() - t0)
    con.close()

    out = {
        "sf_dir": sf_dir,
        "method": f"noop-sink best-of-{PASSES}, one JVM (local[{cpus}]); "
                  "DuckDB twin same-process afterwards",
        "scan_partitions": scan_parts,
        "spark_stages_s": walls,
        "duckdb_s": round(duck, 3),
        "ratio_full": round(walls["full_query"] / duck, 2) if duck else None,
        "load": {"pre": load_pre, "post": loadavg(),
                 "spark_pass_calib": pass_calib,
                 "duckdb_pass_calib": duck_calib},
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DEDUP_EXACT_DECOMP.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
