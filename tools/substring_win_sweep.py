"""Substring-dedup window sensitivity sweep (round-5 mandate #5).

``duplicated_spans``/``strip_duplicated_spans`` detect only spans >=
``win`` tokens (the bounded-window form of Lee et al.'s suffix-array
exact-substring dedup): a duplicated span of win-1 tokens is invisible.
This sweep quantifies the recall/cost curve at win ∈ {5, 10, 20} on the
×10 corpus — duplicated-token fraction found, affected docs, strip
removal volume, and wall time — so the default is a recorded trade, not
a guess. Results land in SUBSTRING_WIN_SWEEP.json and the SCALE.md
round-5 table.

Run solo (never alongside another Spark JVM):
  python tools/substring_win_sweep.py [x_multiple]   # default 10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINS = (5, 10, 20)


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from tools.scale_testdata import scale_dir
    from trendmachine_spark.extensions.dedup import (
        duplicated_spans,
        strip_duplicated_spans,
    )
    from trendmachine_spark.sources.tables import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = scale_dir("/root/testdata/sf0.1", f"/tmp/trendmachine_scaled_x{mult}", mult)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.persist().count()

    out = {"sf": f"0.1x{mult}", "n_docs": docs.count(), "wins": {}}
    for win in WINS:
        walls_r, walls_s = [], []
        for _ in range(2):
            t0 = time.perf_counter()
            rep = duplicated_spans(docs, win=win).agg(
                F.sum("dup_tokens").alias("dup"),
                F.sum("n_tokens").alias("tot"),
                F.sum((F.col("dup_tokens") > 0).cast("long")).alias("docs_hit"),
                F.sum("n_islands").alias("islands"),
            ).first()
            walls_r.append(round(time.perf_counter() - t0, 3))
        for _ in range(2):
            t0 = time.perf_counter()
            stripped = strip_duplicated_spans(docs, win=win).agg(
                F.sum("n_removed_tokens").alias("removed"),
                F.sum("n_tokens").alias("tot"),
            ).first()
            walls_s.append(round(time.perf_counter() - t0, 3))
        out["wins"][win] = {
            "dup_token_fraction": round(rep["dup"] / rep["tot"], 5),
            "docs_with_dups": rep["docs_hit"],
            "n_islands": rep["islands"],
            "strip_removed_fraction": round(stripped["removed"] / stripped["tot"], 5),
            "report_wall_best_s": min(walls_r),
            "strip_wall_best_s": min(walls_s),
        }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SUBSTRING_WIN_SWEEP.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
