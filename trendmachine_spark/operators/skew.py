"""Skew-resistant aggregation: salted two-stage combine.

At 100 TB a handful of hot keys (stopword terms, a viral url) can pin
one reducer. The standard fix is salting: shard each key across
``n_salts`` partial groups, aggregate, then merge the partials. For
algebraic aggregates (count/sum/min/max) the result is EXACTLY the
unsalted answer, so the oracle checks it like any other query.

(The capture pipeline's windows cannot be salted — a per-url window is
inherently sequential — but every groupBy in the engine can be.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key_cols: list[str], n_salts: int = 16,
                 count_alias: str = "cnt") -> DataFrame:
    """groupBy(key).count() with a two-stage salted shuffle.

    Stage 1 groups on (key, salt) — hot keys fan out over n_salts
    reducers; stage 2 merges the (at most n_salts) partials per key.
    The salt is derived from a hash of the full row's position via
    monotonically_increasing_id, so it needs no extra column upstream.
    """
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(*key_cols, "_salt").agg(F.count(F.lit(1)).alias("_partial"))
    return (
        partial.groupBy(*key_cols)
        .agg(F.sum("_partial").cast("long").alias(count_alias))
    )
