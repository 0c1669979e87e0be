"""Hot-url skew stress for the capture pipeline (round-4 stretch).

Web-archive capture logs are power-law: a few urls (home pages, news
fronts) hold a huge share of captures. The per-url windows (chaos,
specimen carry) and the sigmoid recurrence are SEQUENTIAL per url by
the problem's own semantics, so one hot url = one long task — the
capture pipeline's intrinsic tail bound, unlike shuffles (AQE splits
those) or the shingle index (guarded separately).

This tool measures that bound directly: remap ``--hot-frac`` of the
sf0.1 capture stream onto ONE url and push both the uniform and the
skewed stream through the FULL scored pipeline (rollup -> spine -> gap
fill -> recurrence). Reported:

* wall-clock uniform vs skewed (best-of-3, noop sink);
* the hot url's capture share and row count;
* the measured tail bound: per-url work is ~linear in captures, so the
  hot task costs ~hot_captures/avg_captures times the typical task —
  wall should move toward (but not past) hot-task-dominates.

Usage: python tools/url_skew_stress.py [--hot-frac 0.2]
Writes URL_SKEW.json at the repo root and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot-frac", type=float, default=0.2)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("url-skew-stress")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from trendmachine_spark.pipeline import daily_series
    from trendmachine_spark.sources.captures import events_as_captures

    caps = events_as_captures(spark, args.src)
    mod = int(round(1 / args.hot_frac))
    skewed = caps.withColumn(
        "url",
        F.when(F.pmod(F.xxhash64("seq"), mod) == 0, F.lit("user-HOT"))
        .otherwise(F.col("url")),
    )
    caps.persist().count()
    skewed.persist().count()

    stats = skewed.groupBy("url").count()
    hot_n = stats.filter(F.col("url") == "user-HOT").collect()[0]["count"]
    rest = stats.filter(F.col("url") != "user-HOT").agg(
        F.avg("count"), F.max("count"), F.count(F.lit(1))
    ).collect()[0]
    total = skewed.count()

    as_of = "2024-12-31"
    out: dict = {
        "hot_frac": args.hot_frac,
        "hot_captures": hot_n,
        "hot_share": round(hot_n / total, 4),
        "avg_captures_per_url": round(rest[0], 1),
        "n_urls": rest[2] + 1,
        "hot_over_avg": round(hot_n / rest[0], 1),
    }
    for label, df in (("uniform", caps), ("skewed", skewed)):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            daily_series(df, fill=2, policy="closest", as_of=as_of).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[f"wall_{label}_s"] = round(best, 3)
    out["slowdown"] = round(out["wall_skewed_s"] / out["wall_uniform_s"], 2)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "URL_SKEW.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
