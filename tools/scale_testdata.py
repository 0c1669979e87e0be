"""Materialize a K-multiple of the driver testdata for scale benching.

The sf0.1 bench is dominated by Spark's fixed per-action overhead
(~0.5-2 s scheduling/codegen/gateway per query), so ratios measured
there say little about behavior when DATA costs dominate — the regime
the engine is designed for. This tool derives a K× dataset from sf0.1
by unioning key-shifted copies of each fact table, preserving the
workload's *shape* so per-copy cost stays constant:

* ``events``: user_id (the url axis) and event_id shift per copy —
  distinct urls and total captures scale together, per-url history
  constant (the engine's claimed scale-out axis, SCALE.md).
* ``documents``: doc_id shifts AND the text of copy i>0 is salted by
  interleaving a copy token between words. Within a copy the dup/
  near-dup structure is byte-identical to the original; across copies
  no shingle ever matches, so pair-output queries (MinHash LSH, n-gram
  Jaccard) scale linearly instead of exploding quadratically on
  cross-copy duplicates. (The salt ~doubles tokens per doc vs sf0.1,
  so scaled timings are comparable Spark-vs-DuckDB on the SAME data,
  not divisible by K against the unsalted original.)
* ``embeddings``: vec_id shifts; vectors copy as-is (only linear-cost
  consumers in the bench suite).
* ``lineitem``/``orders``/``customer``: join keys shift consistently
  (l_orderkey <-> o_orderkey, o_custkey <-> c_custkey) so join fanout
  per copy is unchanged.
* dims (``region``/``nation``/``supplier``/``part``) copy once.

Single parquet FILES (pyarrow), not Spark part-directories, because
bench.py's page-cache warmup and the streaming source open
``{dir}/{table}.parquet`` as a plain file.

Usage:
  python tools/scale_testdata.py --multiple 10 \
      [--src /root/testdata/sf0.1] [--out /tmp/trendmachine_scaled_x10]
"""

from __future__ import annotations

import argparse
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DIMS = ("region", "nation", "supplier", "part")

#: per-copy shift for each shifted int64 key column (big enough that
#: copies never collide; keys at sf0.1 stay well under these)
KEY_SHIFTS = {
    "events": {"user_id": 10_000_000, "event_id": 10_000_000_000},
    "documents": {"doc_id": 100_000_000},
    "embeddings": {"vec_id": 100_000_000},
    "lineitem": {"l_orderkey": 1_000_000_000},
    "orders": {"o_orderkey": 1_000_000_000, "o_custkey": 10_000_000},
    "customer": {"c_custkey": 10_000_000},
}


def _shift_copy(table: pa.Table, name: str, i: int) -> pa.Table:
    if i == 0:
        return table
    out = table
    for col, step in KEY_SHIFTS.get(name, {}).items():
        if col in out.column_names:
            idx = out.column_names.index(col)
            shifted = pc.add(out.column(col), pa.scalar(i * step, pa.int64()))
            out = out.set_column(idx, col, shifted)
    if name == "documents":
        # interleave a copy-specific token between words: within-copy
        # duplicate structure preserved exactly, zero cross-copy
        # shingle matches (see module docstring)
        idx = out.column_names.index("text")
        salted = pc.replace_substring(out.column("text"), " ", f" q{i}x ")
        out = out.set_column(idx, "text", salted)
        if "n_chars" in out.column_names:
            cidx = out.column_names.index("n_chars")
            out = out.set_column(
                cidx, "n_chars", pc.cast(pc.utf8_length(salted), pa.int64())
            )
    return out


def scale_dir(src: str, out: str, multiple: int) -> str:
    os.makedirs(out, exist_ok=True)
    marker = os.path.join(out, f".scaled_x{multiple}.ok")
    if os.path.exists(marker):
        return out
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        name = fname[: -len(".parquet")]
        table = pq.read_table(os.path.join(src, fname))
        if name in DIMS:
            scaled = table
        else:
            scaled = pa.concat_tables(
                [_shift_copy(table, name, i) for i in range(multiple)]
            )
        pq.write_table(scaled, os.path.join(out, fname))
        # stderr: bench.py's stdout must stay one pure JSON line
        print(f"{name}: {table.num_rows} -> {scaled.num_rows} rows",
              file=sys.stderr)
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multiple", type=int, required=True)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"/tmp/trendmachine_scaled_x{args.multiple}"
    scale_dir(args.src, out, args.multiple)
    print(out)


if __name__ == "__main__":
    main()
