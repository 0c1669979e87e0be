"""As-of join and bucketed range join — general temporal-join operators.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do); the driver mandate
names it as a canonical "operator Spark lacks".  The reference itself
contains the degenerate single-table case: gap-fill 'closest'/'forward'/
'backward' (/root/reference/main.py:192-199) picks the nearest observed
day for a missing day — an as-of match of the date spine against the
observed series.  This module generalizes that to two arbitrary tables.

Scale design (the whole point):

* :func:`asof_join` — the UNION + WINDOW formulation: tag both sides,
  union, one window over (key) ordered by (ts, side, tiebreak), take
  ``last(right_payload, ignorenulls=True)``.  ONE shuffle on the key,
  no range predicate anywhere, so no BroadcastNestedLoopJoin and no
  per-left-row scan of the right side.  This is how every streaming
  system implements temporal joins; a naive ``l JOIN r ON r.ts <= l.ts``
  + argmax is O(|l|·|r|) per key and a nested-loop plan in Spark.
* :func:`range_count_join` — pure range predicates (no equi-key) force
  BroadcastNestedLoopJoin in Spark.  Bucketing time into fixed-width
  bins turns the interval predicate into an EQUI-join on the bin id
  (each left row probes the ≤2 bins its window can span), after which
  the exact predicate filters within matched bins.  Shuffle volume is
  2·|l| + |r| rows instead of an |l|·|r| nested loop.

Determinism contract (needed for cross-engine value-hash parity): ties
on the timestamp are broken by ``side`` (inclusive direction sorts the
right row first, so an exactly-simultaneous right row matches) and then
by ``right_order`` — backward matches take the LARGEST right_order among
timestamp ties, forward matches the smallest.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    ts: str = "ts",
    right_order: str | None = None,
    payload: Sequence[str] | None = None,
    direction: str = "backward",
    strict: bool = False,
    tolerance: int | float | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """For every left row, attach the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) its timestamp, per key.

    ``ts`` must be a NUMERIC column present in both frames (epoch
    seconds/micros via ``unix_timestamp`` — keeps tolerance arithmetic
    and cross-engine comparison exact; convert timestamps first).
    ``strict=True`` excludes exactly-simultaneous right rows.
    ``tolerance`` (same unit as ``ts``) nulls out matches farther than
    the bound.  ``right_order`` is the deterministic tie-break among
    right rows sharing a timestamp — pass a unique column for
    reproducible output.  Output: all left columns + ``{prefix}{ts}`` +
    ``{prefix}{c}`` for each payload column (nulls when unmatched —
    left-outer semantics; every left row survives).

    Scale: one hash-shuffle of |l|+|r| rows on ``on``; the window sort
    is per-key; no range join, no broadcast, no driver state.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if payload is None:
        payload = [c for c in right.columns if c not in set(keys) | {ts}]
    backward = direction == "backward"
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    # side ordering puts the right row first at timestamp ties iff the
    # match is inclusive, so last() sees it from the left row's frame.
    r_side, l_side = (0, 1) if not strict else (1, 0)
    rstruct = F.struct(
        F.col(ts).alias("_rt"), *[F.col(c).alias(c) for c in payload]
    )
    rord = F.col(right_order) if right_order else F.lit(0)
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(ts).alias("_t"),
        F.lit(r_side).alias("_side"),
        rord.cast("long").alias("_ord"),
        rstruct.alias("_r"),
        F.lit(None).cast(left.select(F.struct(*left.columns)).schema[0].dataType).alias("_l"),
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(ts).alias("_t"),
        F.lit(l_side).alias("_side"),
        F.lit(0).cast("long").alias("_ord"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        F.struct(*left.columns).alias("_l"),
    )
    u = r.unionByName(l)

    order = (
        [F.col("_t").asc(), F.col("_side").asc(), F.col("_ord").asc()]
        if backward
        else [F.col("_t").desc(), F.col("_side").asc(), F.col("_ord").desc()]
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_r", ignorenulls=True).over(w)
    if tolerance is not None:
        gap = (
            (F.col("_t") - matched["_rt"])
            if backward
            else (matched["_rt"] - F.col("_t"))
        )
        matched = F.when(gap <= F.lit(tolerance), matched)

    out = (
        u.withColumn("_m", matched)
        .filter(F.col("_side") == l_side)
        .filter(F.col("_l").isNotNull())
    )
    cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    cols.append(F.col("_m._rt").alias(f"{prefix}{ts}"))
    cols.extend(F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload)
    return out.select(*cols)


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    ts: str = "ts",
    lo: int = 60,
    hi: int = 0,
    count_col: str = "n_in_range",
) -> DataFrame:
    """For every left row, count right rows with
    ``l.ts - lo <= r.ts < l.ts - hi`` — with NO join key at all.

    ``ts`` must be numeric (epoch).  Requires ``lo > hi >= 0`` and the
    window width ``lo - hi`` <= ``lo`` so each left window spans at most
    2 fixed-width bins of width ``lo``: the naive formulation is a pure
    theta-join (BroadcastNestedLoopJoin in Spark — O(|l|·|r|) and a
    single-task disaster at scale); binning converts it to an equi-join
    on the bin id.  Every (left, right-in-range) pair meets in exactly
    one bin — the right row's own — so no dedup is needed.
    """
    if not lo > hi >= 0:
        raise ValueError("need lo > hi >= 0")
    width = lo
    lx = left.withColumn(
        "_bk",
        F.explode(
            F.array(
                (F.col(ts).cast("long") / width).cast("long") - 1,
                (F.col(ts).cast("long") / width).cast("long"),
            )
        ),
    )
    rx = right.select(
        F.col(ts).alias("_rts"),
        (F.col(ts).cast("long") / width).cast("long").alias("_bk"),
    )
    hit = (F.col("_rts") >= F.col(ts) - lo) & (F.col("_rts") < F.col(ts) - hi)
    return (
        lx.join(rx, "_bk", "left")
        .groupBy(*left.columns)
        .agg(F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias(count_col))
    )
