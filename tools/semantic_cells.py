"""SemDeDup cell-count operating-rule measurement (round 12 — the r11
verdict's mandate #3/#5): sweep ``n_cells`` over {16, 32, 64, sqrt-rule}
on the scaled corpora and record, per config:

* ``pairs_wall_s`` — semantic_dedup (cell assign + within-cell exact
  gram pair stage), builder inside the timer, best-of-3 noop-sink
* ``keepers_wall_s`` — semantic_keepers end-to-end (pairs + hash-min
  connected components + keeper window); the CC iteration materializes
  during BUILD (per-round persist + count), so the builder sits inside
  the timer here too
* ``cc_share_s`` — keepers_wall − pairs_wall: the connected-components
  + keeper-window attribution the r11 verdict asked for
  (KEEPERS_DECOMP.json carries the named summary)
* ``candidate_pairs`` — Σ C(cell_size, 2) over the assignment: the
  within-cell work the pair stage actually performs
* ``result_pairs`` / ``n_dup_vectors`` / ``n_families`` /
  ``max_family`` — RESULT deltas: cells change ⇒ the candidate set
  changes (documented, not hidden — a pair split across cells is not
  scored; the paper's own recall/cost knob)

Writes SEMANTIC_CELLS.json (per-scale blocks merged across runs, the
ANN_RECALL "scales" convention) and KEEPERS_DECOMP.json (the decomp
summary for the default configs at the largest measured scale).

Usage: python tools/semantic_cells.py [x_multiple] (default 10)
Run engines on a quiet box; one Spark session per invocation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "SEMANTIC_CELLS.json")
DECOMP_OUT = os.path.join(ROOT, "KEEPERS_DECOMP.json")
PASSES = 3


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from tools.scale_testdata import scale_dir, split_confs
    from trendmachine_spark.extensions.clusters import semantic_keepers
    from trendmachine_spark.extensions.similarity import (
        ivf_assign,
        quantize_embeddings,
        semantic_cells_for,
        semantic_dedup,
    )
    from trendmachine_spark.sources.tables import load_table

    builder = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for key, val in split_confs(32).items():
        builder = builder.config(key, val)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = scale_dir("/root/testdata/sf0.1",
                       f"/tmp/trendmachine_scaled_x{mult}", mult)
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    rule = semantic_cells_for(n)
    configs = sorted({16, 32, 64, rule})

    # load telemetry (the bench.py r11 discipline)
    from tools.corpus_ops_scaled import _telemetry_probe

    calib, loadavg = _telemetry_probe()
    load_pre = loadavg()

    results: dict[str, dict] = {}
    for c in configs:
        qv = quantize_embeddings(emb)
        sizes = [
            r["m"] for r in ivf_assign(qv, c)
            .groupBy("cell").agg(F.count(F.lit(1)).alias("m")).collect()
        ]
        cand = sum(m * (m - 1) // 2 for m in sizes)

        pw, kw = [], []
        for _ in range(PASSES):
            t0 = time.perf_counter()
            semantic_dedup(emb, n_cells=c).write.format("noop").mode(
                "overwrite").save()
            pw.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            semantic_keepers(emb, n_cells=c).write.format("noop").mode(
                "overwrite").save()
            kw.append(time.perf_counter() - t0)

        pairs = semantic_dedup(emb, n_cells=c)
        n_pairs = pairs.count()
        fams = semantic_keepers(emb, n_cells=c)
        fam_stats = fams.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("m")).agg(
            F.count(F.lit(1)).alias("n_families"),
            F.max("m").alias("max_family")).first()
        results[f"n_cells={c}" + (",rule" if c == rule else "")] = {
            "pairs_wall_s": round(min(pw), 3),
            "keepers_wall_s": round(min(kw), 3),
            "cc_share_s": round(min(kw) - min(pw), 3),
            "candidate_pairs": int(cand),
            "max_cell": max(sizes, default=0),
            "result_pairs": int(n_pairs),
            "n_dup_vectors": int(fams.count()),
            "n_families": int(fam_stats["n_families"] or 0),
            "max_family": int(fam_stats["max_family"] or 0),
        }

    block = {
        "sf": f"0.1x{mult}",
        "n_corpus_vectors": n,
        "rule_n_cells": rule,
        "passes": PASSES,
        "configs": results,
        "load": {"pre": load_pre, "post": loadavg(),
                 "calib_end": calib()},
    }

    prior = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            prior = json.load(fh).get("scales", {})
    prior[f"x{mult}"] = block
    out = {
        "metric": ("SemDeDup n_cells sweep: within-cell candidate volume, "
                   "pair/keeper walls, CC share, and result deltas per "
                   "cell count — the operating-rule evidence "
                   "(semantic_cells_for docstring; fixed cells bend the "
                   "pair stage quadratic, the sqrt rule keeps marginals "
                   "near-linear)"),
        "scales": prior,
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")

    # KEEPERS_DECOMP: the r11 verdict's named deliverable — attribute
    # keepers' superlinear term between the pair stage and the CC
    # iterations, at the fixed-16 default vs the rule
    decomp = {}
    if os.path.exists(DECOMP_OUT):
        with open(DECOMP_OUT) as fh:
            decomp = json.load(fh).get("scales", {})
    fixed = results.get("n_cells=16", {})
    ruled = results.get(f"n_cells={rule},rule") or results.get(
        f"n_cells={rule}") or {}
    decomp[f"x{mult}"] = {
        "fixed_16": fixed,
        "rule": {**ruled, "n_cells": rule},
        "attribution": (
            "pair stage share = pairs_wall_s; CC+keeper share = "
            "cc_share_s. Both scale with candidate_pairs / result_pairs "
            "respectively — compare fixed_16 vs rule to see which term "
            "the cell count actually bends."),
    }
    with open(DECOMP_OUT, "w") as fh:
        json.dump({
            "metric": ("dedup_semantic_keepers superlinear-term "
                       "attribution (r11 verdict #5): wall split between "
                       "the within-cell pair stage and the connected-"
                       "components/keeper stage, fixed 16 cells vs the "
                       "sqrt rule"),
            "scales": decomp,
        }, fh, indent=1)
        fh.write("\n")

    print(json.dumps({"sf": f"0.1x{mult}", "rule": rule,
                      "configs": {k: {kk: v[kk] for kk in
                                      ("pairs_wall_s", "keepers_wall_s",
                                       "candidate_pairs", "result_pairs")}
                                  for k, v in results.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
