"""Relational-floor decomposition (round-5 stretch mandate #8).

At ×20 scale four sub-second queries (pricing_summary,
top_revenue_customers, event_sessionization, similarity_topk) sit >2×
above same-run DuckDB despite audited minimal plans. The hypothesis on
record: that gap is Spark's FIXED per-action cost (job scheduling,
stage wiring, Python round-trips) — constant while DuckDB's side grows
linearly — not a plan defect. This tool measures the floor directly
and decomposes each query's wall into floor + data work:

* action_floor      — noop write of a 1-row cached DataFrame (pure
                      scheduling, zero data);
* exchange_floor    — groupBy on 1k cached rows -> one exchange, one
                      extra stage, negligible data;
* per-query         — best-of-4 wall, number of stages (from the
                      executed plan's exchanges), and the implied
                      data-work residual wall - action_floor -
                      n_exchanges * (exchange_floor - action_floor).

If the residuals land near DuckDB's own absolute times, the floor
explains the ratios and no plan work can close them — the crossover is
a data-volume question (already demonstrated: every capture-pipeline
query inverted to a Spark lead by ×20).

Run solo: python tools/floor_decomposition.py [x_multiple]  # default 20
Writes FLOOR_DECOMP.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES_UNDER_TEST = [
    "pricing_summary",
    "top_revenue_customers",
    "event_sessionization",
    "similarity_topk",
]


def _best(fn, n=4):
    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return round(min(walls), 4)


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from tools.scale_testdata import scale_dir, split_confs

    _builder = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # scaled corpora are multi-row-group since r11 (scale_testdata)
    for _k, _v in split_confs(32).items():
        _builder = _builder.config(_k, _v)
    spark = _builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from trendmachine_spark.registry import QUERIES

    sf_dir = scale_dir("/root/testdata/sf0.1", f"/tmp/trendmachine_scaled_x{mult}", mult)

    one = spark.range(1).persist()
    one.count()
    thousand = spark.range(1000).persist()
    thousand.count()

    action_floor = _best(
        lambda: one.write.format("noop").mode("overwrite").save(), 6)
    exchange_floor = _best(
        lambda: thousand.groupBy((F.col("id") % 7).alias("k")).count()
        .write.format("noop").mode("overwrite").save(), 6)

    per_query = {}
    for name in QUERIES_UNDER_TEST:
        df = QUERIES[name].builder(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # shuffle-stage boundaries only: ReusedExchange re-reads an
        # already-materialized stage and BroadcastExchange is not a
        # shuffle barrier — counting them overstated the floor
        # deduction (round-5 ADVICE)
        n_ex = (plan.count("Exchange hashpartitioning")
                + plan.count("Exchange rangepartitioning")
                + plan.count("Exchange SinglePartition"))
        wall = _best(lambda d=df: d.write.format("noop").mode("overwrite").save())
        implied = wall - action_floor - n_ex * max(
            exchange_floor - action_floor, 0.0)
        per_query[name] = {
            "wall_best_s": wall,
            "n_exchanges": n_ex,
            "implied_data_work_s": round(max(implied, 0.0), 4),
            "floor_share": round(min(1.0, (wall - max(implied, 0.0)) / wall), 3),
        }

    out = {
        "sf": f"0.1x{mult}",
        "action_floor_s": action_floor,
        "exchange_floor_s": exchange_floor,
        "queries": per_query,
        "note": (
            "floor_share is the fraction of the wall attributable to "
            "Spark's fixed per-action/per-stage cost at this scale — "
            "constant in data volume, so floor-dominated queries "
            "(pricing_summary, event_sessionization) close their ratios "
            "with scale without plan changes. Data-work-dominated entries "
            "(top_revenue_customers) are single-node per-row engine "
            "efficiency vs DuckDB's vectorized aggregation at "
            "one-machine scale; their plans are minimal (audited) and "
            "the gap closes with executors, not with more data per node. "
            "See SCALE.md 'Relational floor decomposition'."
        ),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "FLOOR_DECOMP.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
