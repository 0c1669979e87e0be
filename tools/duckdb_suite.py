"""DuckDB twin of bench.py: run the comparable queries' oracle SQL.

Same discipline as BASELINE.md's measurement: DuckDB executes the
engine's own oracle SQL (identical semantics) on the same parquet dir,
32 threads, best-of-4 per query with passes interleaved across the
suite. Queries with no oracle (resilience_daily_series) are skipped —
the same exclusion BASELINE.md's "comparable subset" applies.

Usage: python tools/duckdb_suite.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import duckdb

    from bench import BENCH_QUERIES
    from trendmachine_spark.registry import QUERIES
    from trendmachine_spark.sources.tables import TABLES

    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    comparable = [n for n in BENCH_QUERIES if QUERIES[n].oracle is not None]
    skipped = [n for n in BENCH_QUERIES if QUERIES[n].oracle is None]
    timings: dict[str, float] = {}
    for _ in range(4):
        for name in comparable:
            t0 = time.perf_counter()
            con.execute(QUERIES[name].oracle).fetchall()
            el = time.perf_counter() - t0
            timings[name] = round(min(timings.get(name, float("inf")), el), 3)

    print(json.dumps({
        "metric": "duckdb oracle-SQL suite wall-clock (best-of-4 interleaved)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "skipped_no_oracle": skipped,
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
