"""Isolate the cost inside top_revenue's per-order aggregation:
expression cost (decimal casts) vs exchange vs group count.
Run: python tools/opt_r14_probe.py exec tools/exp_toprev_perorder.py
"""

import json
import time

from pyspark.sql import functions as F

from trendmachine_spark.registry_queries.relational_events import _table


def variants():
    li = _table(spark, sf_dir, "lineitem")  # noqa: F821
    pc = (F.col("l_extendedprice").cast("decimal(14,2)") * 100).cast("long")
    dc = (F.col("l_discount").cast("decimal(4,2)") * 100).cast("long")
    expr = pc * (100 - dc)
    # cheap long-only expression (NOT value-identical; cost probe only)
    cheap = (F.col("l_extendedprice") * 100).cast("long")
    return {
        "agg_current": li.groupBy("l_orderkey").agg(F.sum(expr).alias("s")),
        "agg_cheap_expr": li.groupBy("l_orderkey").agg(F.sum(cheap).alias("s")),
        "agg_count_only": li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("s")),
        "project_expr_only": li.select("l_orderkey", expr.alias("v")),
        "agg_nogroup": li.agg(F.sum(expr).alias("s")),
    }


samples = {}
for _ in range(6):
    for name, df in variants().items():
        t0 = time.perf_counter()
        noop(df)  # noqa: F821
        samples.setdefault(name, []).append(time.perf_counter() - t0)
print(json.dumps({k: {"best": round(min(v), 3), "all": [round(x, 3) for x in v]}
                  for k, v in samples.items()}))
