"""Adversarial skew stress for the n-gram inverted index.

Real corpora carry boilerplate (cookie banners, license headers,
navigation chrome) that lands the SAME shingles in a large fraction
of documents. In a shingle self-join each hot shingle contributes
|docs|^2 candidate pairs — the quadratic blow-up that kills inverted-
index dedup at scale. ``ngram_jaccard``'s ``max_shingle_freq`` guard
(ON by default, mirrored in the DuckDB oracle CTE) drops such
shingles from CANDIDATE GENERATION only; set sizes stay exact, so
every reported pair's jaccard is still exact.

This tool measures the guard on an adversarial derivative of the
sf0.1 documents table: a fixed 50-word boilerplate paragraph appended
to ``--hot-frac`` of docs (default 20%, ~1000 docs -> 48 shingles
shared by all of them). It reports candidate-pair volume and
wall-clock with the guard ON vs OFF.

Usage: python tools/skew_stress.py [--hot-frac 0.2]
Prints one JSON line; guard-on numbers should stay within ~10% of the
clean-corpus run, guard-off grows by ~hot_docs^2 pairs.
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
        .appName("skew-stress")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from trendmachine_spark.extensions.dedup import ngram_jaccard
    from trendmachine_spark.sources.tables import load_table

    boiler = " ".join(f"boiler{i}" for i in range(50))
    docs = load_table(spark, args.src, "documents")
    hot = docs.withColumn(
        "text",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(int(round(1 / args.hot_frac)))) == 0,
            F.concat(F.col("text"), F.lit(" " + boiler)),
        ).otherwise(F.col("text")),
    )
    hot.persist().count()

    out: dict = {"hot_frac": args.hot_frac}
    for label, guard in (("guard_on", 100), ("guard_off", None)):
        t0 = time.perf_counter()
        n_pairs = ngram_jaccard(hot, max_shingle_freq=guard).count()
        out[label] = {
            "pairs": n_pairs,
            "sec": round(time.perf_counter() - t0, 3),
        }
    out["pair_blowup"] = round(out["guard_off"]["pairs"] / max(1, out["guard_on"]["pairs"]), 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
