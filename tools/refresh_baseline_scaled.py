"""Regenerate BASELINE_SCALED_x*.json from the bench detail artifacts.

bench.py (r5) writes the same-run DuckDB baseline into
BENCH_DETAIL_sf0.1x{K}.json; this extracts it into the standalone
BASELINE_SCALED_x{K}.json files the judge reads next to
BENCH_SCALED_x{K}.json. Run after the scaled bench runs.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

for mult in (10, 20, 40):
    detail_path = os.path.join(ROOT, f"BENCH_DETAIL_sf0.1x{mult}.json")
    if not os.path.exists(detail_path):
        print(f"skip x{mult}: {detail_path} missing", file=sys.stderr)
        continue
    d = json.load(open(detail_path))
    base = d["baseline"]
    out = {
        "metric": ("duckdb oracle-SQL suite wall-clock (best-of-4 interleaved; "
                   "SAME-RUN column extracted from BENCH_DETAIL via bench.py r5)"),
        "value": round(sum(base.values()), 3),
        "unit": "sec",
        "queries": base,
        "queries_median": d["baseline_median"],
        "sf": d["sf"],
        "comparable": d["comparable"],
    }
    path = os.path.join(ROOT, f"BASELINE_SCALED_x{mult}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"wrote {path}: duckdb best sum {out['value']}")
