"""Scaled wall measurement for the bounded suffix-array pass
(round-7 verdict mandate #4: the one operator with built-in ~``bound``
tokens-per-position payload amplification through its single gram
exchange had plan audits but no measured wall beyond sf0.01).

Measures, on the key-shifted ×K corpus (tools/scale_testdata.py — the
same derivation bench.py --sf-multiple uses):

* ``dup_span_profile`` wall at bound ∈ {8, 16, 32} (best-of-3, noop
  sink) — the payload-amplification cost curve the default-bound
  decision rests on. min_span/max_group stay at the registry defaults
  (5/100) so the numbers attach to the shipped query.
* ``dup_span_histogram`` wall at bound=32, plus the histogram VALUES:
  the mass in [16, 32) and the >= 32 cap row say what a smaller bound
  would stop resolving exactly.
* ``suffix_group_stats`` values — how much the max_group skew guard
  actually fired on the scaled corpus (positions_excluded fraction),
  the "no silent caps" number the verdict asked to see at scale.
* The DuckDB twin of the shipped dup_span_profile oracle (bound=32),
  best-of-2 with the same execute+fetchall method as bench.py's
  same-run baseline, so the wall has the usual comparison column.

Results -> SUFFIX_SCALE_x{K}.json + the SCALE.md narrative.

Run solo (never alongside another Spark JVM):
  python tools/suffix_scale_bench.py [multiple]   # default 10
  python tools/suffix_scale_bench.py 10 --skip-duckdb
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOUNDS = (8, 16, 32)
PASSES = 3


def main() -> None:
    multiple = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10
    skip_duckdb = "--skip-duckdb" in sys.argv
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from tools.scale_testdata import scale_dir, split_confs

    sf_dir = scale_dir(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        f"/tmp/trendmachine_scaled_x{multiple}",
        multiple,
    )

    from pyspark.sql import SparkSession

    _builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("trendmachine_spark-suffix-scale")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
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

    from trendmachine_spark.extensions.dedup import (
        dup_span_histogram,
        dup_span_profile,
        suffix_group_stats,
    )
    from trendmachine_spark.registry import _docs

    docs = _docs(spark, sf_dir)
    docs.count()  # warm the shared corpus cache, as bench.py does

    def walls(df_builder) -> dict:
        samples = []
        for _ in range(PASSES):
            t0 = time.perf_counter()
            df_builder().write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        return {
            "best": round(min(samples), 3),
            "median": round(statistics.median(samples), 3),
            "passes": [round(s, 3) for s in samples],
        }

    result: dict = {"multiple": multiple, "sf_dir": sf_dir, "spark": {}}

    for bound in BOUNDS:
        result["spark"][f"profile_b{bound}"] = walls(
            lambda b=bound: dup_span_profile(docs, min_span=5, bound=b,
                                             max_group=100)
        )
    result["spark"]["histogram_b32"] = walls(
        lambda: dup_span_histogram(docs, min_span=5, bound=32, max_group=100)
    )

    hist = {
        int(r["match_len"]): int(r["n_positions"])
        for r in dup_span_histogram(docs, min_span=5, bound=32,
                                    max_group=100).collect()
    }
    total = sum(hist.values())
    result["histogram"] = {
        "n_dup_positions": total,
        "mass_5_15": sum(v for k, v in hist.items() if k < 16),
        "mass_16_31": sum(v for k, v in hist.items() if 16 <= k < 32),
        "mass_ge_32": hist.get(32, 0),
    }

    guard = suffix_group_stats(docs, min_span=5, max_group=100).collect()[0]
    result["guard"] = {
        "n_grams": int(guard["n_grams"]),
        "n_hot_grams": int(guard["n_hot_grams"]),
        "positions_total": int(guard["positions_total"]),
        "positions_excluded": int(guard["positions_excluded"]),
        "excluded_frac": round(
            guard["positions_excluded"] / max(guard["positions_total"], 1), 4
        ),
    }
    spark.stop()

    if not skip_duckdb:
        import duckdb

        from trendmachine_spark.registry import QUERIES

        con = duckdb.connect()
        con.execute(f"SET threads={cpus}")
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(QUERIES["dup_span_profile"].oracle).fetchall()
            samples.append(time.perf_counter() - t0)
        con.close()
        result["duckdb"] = {
            "profile_b32_best": round(min(samples), 3),
            "passes": [round(s, 3) for s in samples],
        }

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"SUFFIX_SCALE_x{multiple}.json",
    )
    with open(out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
