"""Loaders for the driver's parquet tables (TESTDATA.md).

The driver's parquet files carry INT64 TIMESTAMP(NANOS) columns, which
Spark's vectorized parquet reader rejects unless
``spark.sql.legacy.parquet.nanosAsLong`` is set — a *runtime-settable*
conf, so we set it here (the driver hands us a session we didn't
build). Nanos columns are converted to proper timestamps via exact
integer division (``DIV 1000`` -> microseconds), matching DuckDB's
native nanosecond truncation. Session timezone is pinned to UTC so
``date_format`` agrees with DuckDB's TZ-naive ``strftime``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: columns stored as TIMESTAMP(NANOS) in the driver parquet
NANOS_TS_COLUMNS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def configure(spark: SparkSession) -> SparkSession:
    """Session confs required to read the driver testdata + oracle parity."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in NANOS_TS_COLUMNS.get(name, ()):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df
