"""Decompose top_revenue_customers' wall at the current SF: time each
prefix of the pipeline to the noop sink, interleaved best-of-N.
Run: python tools/opt_r14_probe.py exec tools/exp_toprev_decomp.py
"""

import json
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from trendmachine_spark.registry import QUERIES
from trendmachine_spark.registry_queries.relational_events import _table


def _stages():
    li = _table(spark, sf_dir, "lineitem")  # noqa: F821
    orders = _table(spark, sf_dir, "orders")  # noqa: F821
    customer = _table(spark, sf_dir, "customer")  # noqa: F821
    nation = _table(spark, sf_dir, "nation")  # noqa: F821
    pc = (F.col("l_extendedprice").cast("decimal(14,2)") * 100).cast("long")
    dc = (F.col("l_discount").cast("decimal(4,2)") * 100).cast("long")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(pc * (100 - dc)).alias("order_rev_bp"))
    rev = (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg((F.sum("order_rev_bp").cast("decimal(38,4)") / 10000)
             .cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_orders"))
    )
    top = rev.orderBy(F.col("revenue").desc(), F.col("o_custkey")).limit(20)
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_custkey"))
    top = top.withColumn("rank", F.row_number().over(w))
    full = (
        top.join(F.broadcast(customer), top.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "revenue", "n_orders", "rank")
    )
    return {
        "li_scan": li.select("l_orderkey", "l_extendedprice", "l_discount"),
        "per_order": per_order,
        "rev": rev,
        "top20": top,
        "full": full,
        "registry": QUERIES["top_revenue_customers"].builder(spark, sf_dir),  # noqa: F821
    }


passes = 6
samples = {}
for _ in range(passes):
    for name, df in _stages().items():
        t0 = time.perf_counter()
        noop(df)  # noqa: F821
        samples.setdefault(name, []).append(time.perf_counter() - t0)
print(json.dumps({k: {"best": round(min(v), 3), "all": [round(x, 3) for x in v]}
                  for k, v in samples.items()}))
