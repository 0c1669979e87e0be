"""Floor amortization: the four floor-bound queries through ONE action.

Round-5 VERDICT #8 (stretch): FLOOR_DECOMP.json attributes 18-39% of
the sub-second ×20 walls (pricing_summary, event_sessionization,
top_revenue_customers, dedup_exact, similarity_topk) to a fixed
per-action + per-stage floor, and claims the DuckDB gap closes when
that floor is amortized (the cluster target: more executors, same
driver floor). This tool demonstrates the amortization IN-SANDBOX
without pretending one box is a cluster: it runs the queries

  (a) individually — N actions, N floors — and
  (b) as ONE action: each result projected to ``to_json(struct(*))``
      rows and unioned, a single noop save whose job pays ONE
      action-submission floor while every query's data work runs in
      the same scheduler window.

If the floor attribution is right, wall(batched) is measurably below
sum(wall(individual)) by roughly (N-1) x the per-action floor plus the
inter-action scheduling gaps; the per-query data work is unchanged
(same plans, same shuffles — union adds no exchange above each
branch's own). The to_json projection adds work, so the measured
saving is a LOWER bound on the floor share.

Writes FLOOR_BATCH.json at the repo root.

Run solo (never alongside another Spark JVM):
  python tools/floor_batch.py [x_multiple]    # default 20
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES_UNDER_TEST = (
    "pricing_summary",
    "event_sessionization",
    "top_revenue_customers",
    "dedup_exact",
    "similarity_topk",
)
PASSES = 5


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from tools.scale_testdata import scale_dir, split_confs
    from trendmachine_spark.registry import QUERIES

    _builder = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "64g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # scaled corpora are multi-row-group since r11 (scale_testdata)
    for _k, _v in split_confs(32).items():
        _builder = _builder.config(_k, _v)
    spark = _builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = scale_dir(
        "/root/testdata/sf0.1", f"/tmp/trendmachine_scaled_x{mult}", mult)

    def jsonified(name: str):
        df = QUERIES[name].builder(spark, sf_dir)
        return df.select(
            F.to_json(F.struct(*df.columns)).alias("row"))

    # warm: one full pass of everything outside the measurement
    for name in QUERIES_UNDER_TEST:
        QUERIES[name].builder(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()

    indiv: dict[str, list[float]] = {n: [] for n in QUERIES_UNDER_TEST}
    batched: list[float] = []
    jsonified_walls: dict[str, list[float]] = {n: [] for n in QUERIES_UNDER_TEST}
    for _ in range(PASSES):
        for name in QUERIES_UNDER_TEST:
            t0 = time.perf_counter()
            QUERIES[name].builder(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            indiv[name].append(time.perf_counter() - t0)
        # jsonified singles: isolate the to_json projection cost so the
        # batched comparison is apples-to-apples
        for name in QUERIES_UNDER_TEST:
            t0 = time.perf_counter()
            jsonified(name).write.format("noop").mode("overwrite").save()
            jsonified_walls[name].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        u = jsonified(QUERIES_UNDER_TEST[0])
        for name in QUERIES_UNDER_TEST[1:]:
            u = u.unionByName(jsonified(name))
        u.write.format("noop").mode("overwrite").save()
        batched.append(time.perf_counter() - t0)
        spark.sparkContext._jvm.System.gc()

    def best(xs):
        return round(min(xs), 3)

    sum_indiv = round(sum(min(s) for s in indiv.values()), 3)
    sum_json = round(sum(min(s) for s in jsonified_walls.values()), 3)
    out = {
        "sf": f"0.1x{mult}",
        "queries": list(QUERIES_UNDER_TEST),
        "individual_best_s": {n: best(s) for n, s in indiv.items()},
        "individual_sum_best_s": sum_indiv,
        "jsonified_individual_sum_best_s": sum_json,
        "batched_one_action_best_s": best(batched),
        "batched_median_s": round(statistics.median(batched), 3),
        "floor_amortized_s": round(sum_json - min(batched), 3),
        "floor_amortized_vs_plain_s": round(sum_indiv - min(batched), 3),
        "note": (
            "batched runs the same five plans under ONE action; "
            "jsonified_individual_sum isolates the to_json projection "
            "so floor_amortized_s = (N actions - 1 action) at equal "
            "work = the shared submission/scheduling floor. A negative "
            "value would refute the floor attribution."
        ),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "FLOOR_BATCH.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()


