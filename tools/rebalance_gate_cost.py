"""Attribute the r9 sf0.1 bench drift: build-time cost of the
rebalance_for_fanout gate probes, per-call (r9 shape: optimizer-stats +
physical-planning probes on EVERY call) vs memoized (r10 shape: probes
once per canonicalized input plan, ~7 ms semanticHash per hit).

Measures plan CONSTRUCTION only — ``builder(spark, sf_dir)`` for every
registry query, no actions — which is exactly the overhead the bench
pays on top of execution. Writes REBALANCE_GATE_COST.json.

Usage: python tools/rebalance_gate_cost.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from trendmachine_spark import registry
    from trendmachine_spark.extensions import dedup

    names = list(registry.QUERIES)
    # warm the session + FS metadata once so mode order doesn't bias
    for n in names:
        registry.QUERIES[n].builder(spark, sf_dir)

    real_gate = dedup._rebalance_gate
    probes = {"n": 0}

    def counting_gate(df, target, min_fraction):
        probes["n"] += 1
        return real_gate(df, target, min_fraction)

    dedup._rebalance_gate = counting_gate

    def build_all() -> float:
        t0 = time.perf_counter()
        for n in names:
            registry.QUERIES[n].builder(spark, sf_dir)
        return time.perf_counter() - t0

    out: dict = {"sf_dir": sf_dir, "queries": len(names), "runs": 5}

    def run_mode(mode: str, uncached: bool) -> None:
        walls, counts = [], []
        for _ in range(out["runs"]):
            dedup._GATE_CACHE.clear()
            if uncached:
                # r9 behavior: a probe per call — defeat the memo by
                # clearing the cache on every lookup
                class AlwaysMiss(dict):
                    def get(self, key, default=None):
                        return default

                dedup._GATE_CACHE = AlwaysMiss()
            probes["n"] = 0
            walls.append(build_all())
            counts.append(probes["n"])
            dedup._GATE_CACHE = {}
        walls.sort()
        out[mode] = {
            "build_wall_median_s": round(walls[len(walls) // 2], 3),
            "gate_probe_calls": counts[0],
        }

    run_mode("r9_probe_every_call", uncached=True)
    run_mode("r10_memoized", uncached=False)
    dedup._rebalance_gate = real_gate

    saved = (out["r9_probe_every_call"]["build_wall_median_s"]
             - out["r10_memoized"]["build_wall_median_s"])
    out["build_wall_saved_s"] = round(saved, 3)
    with open("REBALANCE_GATE_COST.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
