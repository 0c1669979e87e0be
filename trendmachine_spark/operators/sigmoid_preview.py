"""Sigmoid curve preview (O36, reference main.py:251-257).

Tabulates ``initial + sigmoid(x)`` for x in 0..100 for a parameter
triple — the tiny generated table behind the reference's parameter-
tuning UI. ``initial = 1`` when spread < 0 (decay curves start at 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trendmachine_spark.params import DEFAULT_SIGPARAMS, SigmoidParam


def sigmoid_shape(spark: SparkSession, param: SigmoidParam | tuple, points: int = 101) -> DataFrame:
    shift, slope, spread = (
        param.as_tuple() if isinstance(param, SigmoidParam) else tuple(param)
    )
    initial = 1.0 if spread < 0 else 0.0
    x = F.col("id").cast("double")
    value = F.lit(initial) + F.lit(spread) / (
        F.lit(1.0) + F.exp(F.lit(float(shift)) - x / F.lit(float(slope)))
    )
    return spark.range(points).select(
        F.col("id").alias("Time"), value.alias("Resilience")
    )


def sigmoid_shapes_all(spark: SparkSession, sigparams=None, points: int = 101) -> DataFrame:
    """All parameter curves in one table (key, Time, Resilience)."""
    out = None
    for key, p in (sigparams or DEFAULT_SIGPARAMS).items():
        df = sigmoid_shape(spark, p, points).withColumn("key", F.lit(key))
        out = df if out is None else out.unionByName(df)
    return out.select("key", "Time", "Resilience")
