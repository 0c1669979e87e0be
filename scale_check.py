"""Scaling experiment: capture pipeline throughput at 1x/4x/8x rows.

Derived input: union of url-shifted copies of the sf0.1 events stream
(urls stay distinct per copy => per-url work constant, total rows and
distinct urls scale together — the scale-out axis the engine claims).
"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions","64")
    .config("spark.sql.adaptive.enabled","true")
    .config("spark.sql.session.timeZone","UTC")
    .config("spark.driver.memory","80g")
    .config("spark.ui.enabled","false")
    .config("spark.ui.showConsoleProgress","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from trendmachine_spark.sources.captures import events_as_captures
from trendmachine_spark.operators.normalize import normalize_captures
from trendmachine_spark.operators.rollup import daily_rollup
from trendmachine_spark.operators.spine import densify, resolve_as_of
from trendmachine_spark.operators.recurrence import score_daily_series

base = events_as_captures(spark, "/root/testdata/sf0.1")

def multiply(df, k):
    parts = [df.withColumn("url", F.concat(F.col("url"), F.lit(f"#c{i}"))) for i in range(k)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

for k in (1, 4, 8):
    caps = multiply(base, k)
    n = caps.count()
    t0 = time.perf_counter()
    daily = daily_rollup(normalize_captures(caps))
    dense = densify(daily, None, resolve_as_of(daily, None))
    scored = score_daily_series(dense)
    rows = scored.count()
    dt = time.perf_counter() - t0
    print(f"k={k}: captures={n} scored_rows={rows} wall={dt:.2f}s throughput={n/dt:,.0f} captures/s", flush=True)
