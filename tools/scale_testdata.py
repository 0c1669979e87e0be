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

Row-group layout (round 11): fact tables are written with explicit
``row_group_size`` so each file carries at least :data:`TARGET_ROW_GROUPS`
row groups. Through round 10 they were written with pyarrow's default
(one giant row group for documents/events), and Spark's byte-range
splitting cannot cut inside a row group — the scans ran on 2 of 32
cores and that single layout artifact was the root cause of the entire
scan-floor weak class (training_splits 5.07x, split_leakage 3.11x,
corpus_stats 3.4x at x20 — NEWOPS_FLOOR_DECOMP.json) plus two rounds
of rebalance patches. A 100 TB corpus is never one row group; the
scaled corpora now model the production layout. Values are unchanged
(layout only); the ``.scaled_xK.v2.ok`` marker versions the layout so
stale /tmp dirs regenerate. ``rebalance_for_fanout`` stays in the
engine for genuinely under-split inputs.

Splittable files are necessary but not sufficient: Spark sizes splits
as ``min(maxPartitionBytes, max(openCostInBytes, totalBytes/
minPartitionNum))`` and the 4 MiB ``openCostInBytes`` default yields 2
splits of a 6 MB file no matter how many row groups it has. Scaled
measurement sessions should apply :func:`split_confs` — openCost small
and minPartitionNum = 2x cores — which a production session reading
100+ GB files gets for free from the defaults.

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

#: minimum row groups per scaled fact file = 2x the 32-core session —
#: enough byte-range split points that every narrow map runs at full
#: parallelism (see module docstring)
TARGET_ROW_GROUPS = 64

#: floor on rows per row group: dims and tiny tables keep sane groups
#: instead of degenerating to one row each
MIN_ROWS_PER_GROUP = 256

#: layout version, part of the idempotency marker name: bump when the
#: written layout changes so stale /tmp dirs regenerate
LAYOUT_VERSION = 2


def split_confs(cpus: int) -> dict:
    """Session confs that let Spark actually cut the scaled files into
    ~cores splits (see module docstring). Production-default-equivalent
    for multi-GB files; needed here only because the scaled corpora are
    MB-scale stand-ins.

    minPartitionNum is 1x cores, not 2x: local-mode task scheduling
    costs ~4-5 ms/task (measured r11 partition sweep, SCALE.md), so on
    a sub-second MB-scale query every extra stage-task is pure floor —
    64-split scans cost ~+0.2 s/query over 32 with zero parallelism
    gain on 32 cores. CPU-heavy codec/fan-out paths get exactly one
    task per core natively. The FILES still carry 64 row groups
    (TARGET_ROW_GROUPS) so any engine or session can split finer when
    its task economics differ."""
    return {
        "spark.sql.files.openCostInBytes": str(64 * 1024),
        "spark.sql.files.minPartitionNum": str(cpus),
    }

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
    marker = os.path.join(
        out, f".scaled_x{multiple}.v{LAYOUT_VERSION}.ok"
    )
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
        rows_per_group = max(
            MIN_ROWS_PER_GROUP,
            -(-scaled.num_rows // TARGET_ROW_GROUPS),
        )
        pq.write_table(
            scaled, os.path.join(out, fname), row_group_size=rows_per_group
        )
        # stderr: bench.py's stdout must stay one pure JSON line
        print(f"{name}: {table.num_rows} -> {scaled.num_rows} rows "
              f"({rows_per_group} rows/group)", file=sys.stderr)
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
