"""Per-action floor tuning probe (round-8; the r7 verdict noted
AQE/shuffle-partition tuning for sub-second inputs as the one
unexplored lever behind the unbatched sf0.1 margin).

Hypothesis: AQE turns every exchange into a materialized query stage
with its own job submission, so a sub-second query with 1-2 exchanges
pays 1-2 extra scheduling round-trips that a 10-second query amortizes
— and 32 shuffle partitions of a few KB each cost more task-launch
overhead than 8 would. Both are runtime session confs, so the probe
toggles them in ONE session (plans recompile per action; the warmed
input caches are config-independent) and times:

* the five floor-bound queries (run_suite members), individually and
  as the ONE batched action;
* two data-dominated controls (dedup_ngram_jaccard, transition_matrix)
  that any candidate setting must NOT regress.

best-of-3 per (config, query), interleaved. Results -> FLOOR_AQE.json.

Run solo (never alongside another Spark JVM):
  python tools/floor_aqe_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    ("baseline_aqe_sp32", {"spark.sql.adaptive.enabled": "true",
                           "spark.sql.shuffle.partitions": "32"}),
    ("aqe_off_sp32", {"spark.sql.adaptive.enabled": "false",
                      "spark.sql.shuffle.partitions": "32"}),
    ("aqe_sp8", {"spark.sql.adaptive.enabled": "true",
                 "spark.sql.shuffle.partitions": "8"}),
    ("aqe_off_sp8", {"spark.sql.adaptive.enabled": "false",
                     "spark.sql.shuffle.partitions": "8"}),
    # the principled form of "fewer tiny tasks": keep sp=cpus for the
    # data-dominated majority and let AQE coalesce reduce stages to the
    # 64MB advisory size instead of preserving parallelism — the
    # setting Spark's own tuning guide recommends when small-task
    # scheduling overhead dominates (self-adjusting: at x20 the stages
    # are big enough that it changes nothing)
    ("aqe_size_first_sp32", {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    }),
]
CONTROLS = ["dedup_ngram_jaccard", "transition_matrix"]
PASSES = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("trendmachine_spark-floor-aqe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from trendmachine_spark.registry import QUERIES, _daily, _dense, _docs
    from trendmachine_spark.suite import FLOOR_BOUND_QUERIES, suite_frame

    _daily(spark, sf_dir).count()
    _dense(spark, sf_dir).count()
    _docs(spark, sf_dir).count()

    names = list(FLOOR_BOUND_QUERIES) + CONTROLS
    result: dict = {"sf_dir": sf_dir, "configs": {}}
    for label, confs in CONFIGS:
        # reset the probed knobs to their defaults so configs that
        # omit a key are not polluted by the previous config's value
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        for k, v in confs.items():
            spark.conf.set(k, v)
        samples: dict[str, list[float]] = {n: [] for n in names}
        batched: list[float] = []
        dfs = {n: QUERIES[n].builder(spark, sf_dir) for n in names}
        suite_df = suite_frame(spark, sf_dir, list(FLOOR_BOUND_QUERIES))
        for _ in range(PASSES):
            for n in names:
                t0 = time.perf_counter()
                dfs[n].write.format("noop").mode("overwrite").save()
                samples[n].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            suite_df.write.format("noop").mode("overwrite").save()
            batched.append(time.perf_counter() - t0)
        result["configs"][label] = {
            "queries_best": {n: round(min(s), 3) for n, s in samples.items()},
            "floor_five_sum_best": round(
                sum(min(samples[n]) for n in FLOOR_BOUND_QUERIES), 3),
            "batched_best": round(min(batched), 3),
        }
    # restore the bench defaults before anyone reuses the session
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", cpus)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "FLOOR_AQE.json",
    )
    with open(out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
