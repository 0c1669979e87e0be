"""Generic distributed per-group top-k selection.

The "best k documents per source / top k products per region" pattern.
Expressed as a rank-window + filter so Catalyst's WindowGroupLimit
rewrite applies: Spark inserts a per-partition group-limit BEFORE the
group shuffle (map-side heaps, like TakeOrderedAndProject but per
group), so the exchange carries at most k rows per (group, input
partition) instead of the whole table, and the post-shuffle sort sees
only ~k·n_partitions rows per group. The plan guard asserts the
WindowGroupLimit node is present — without it this shape would full-sort
every group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["top_per_group"]


def top_per_group(df: DataFrame, group_cols: list[str],
                  order_by: list[Column], k: int,
                  rank_col: str = "rank") -> DataFrame:
    """Top ``k`` rows per group under a deterministic total order.

    ``order_by`` must be a deterministic total order (include a
    tie-break key) or the selected set is ambiguous. The rank is
    emitted as ``rank_col``.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
        .withColumn(rank_col, F.col(rank_col).cast("long"))
    )
