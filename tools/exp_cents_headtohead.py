"""Interleaved head-to-head: decimal-cast cents (pre-r14) vs primitive
_cents (current registry) for the four relational queries.
Run: python tools/opt_r14_probe.py exec tools/exp_cents_headtohead.py
"""

import json
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from trendmachine_spark.registry import QUERIES
from trendmachine_spark.registry_queries.relational_events import _table

NAMES = ("pricing_summary", "shipping_priority",
         "top_revenue_customers", "region_revenue")


def old_builders():
    li = _table(spark, sf_dir, "lineitem")  # noqa: F821
    orders = _table(spark, sf_dir, "orders")  # noqa: F821
    customer = _table(spark, sf_dir, "customer")  # noqa: F821
    nation = _table(spark, sf_dir, "nation")  # noqa: F821
    region = _table(spark, sf_dir, "region")  # noqa: F821
    qc = (F.col("l_quantity").cast("decimal(12,2)") * 100).cast("long")
    pc = (F.col("l_extendedprice").cast("decimal(14,2)") * 100).cast("long")
    dc = (F.col("l_discount").cast("decimal(4,2)") * 100).cast("long")
    as_d = lambda c, scale: (c / scale).cast("double")  # noqa: E731

    partials = (
        li.filter(F.col("l_shipdate") < F.lit("1998-09-03").cast(
            li.schema["l_shipdate"].dataType))
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_part"))
        .agg(F.sum(qc).alias("_q"), F.sum(pc).alias("_p"),
             F.sum(pc * (100 - dc)).alias("_dp"), F.sum(dc).alias("_d"),
             F.count(F.lit(1)).alias("_n"))
    )
    pricing = (
        partials.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(F.col("_q").cast("decimal(38,0)")).alias("_q"),
             F.sum(F.col("_p").cast("decimal(38,0)")).alias("_p"),
             F.sum(F.col("_dp").cast("decimal(38,0)")).alias("_dp"),
             F.sum(F.col("_d").cast("decimal(38,0)")).alias("_d"),
             F.sum("_n").alias("count_order"))
        .select("l_returnflag", "l_linestatus",
                as_d(F.col("_q"), 100).alias("sum_qty"),
                as_d(F.col("_p"), 100).alias("sum_base_price"),
                as_d(F.col("_dp"), 10000).alias("sum_disc_price"),
                (as_d(F.col("_q"), 100) / F.col("count_order")).alias("avg_qty"),
                (as_d(F.col("_d"), 100) / F.col("count_order")).alias("avg_disc"),
                "count_order")
        .orderBy("l_returnflag", "l_linestatus")
    )

    c3 = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o3 = orders.filter(F.col("o_orderdate") < F.lit("1995-03-15").cast(
        orders.schema["o_orderdate"].dataType)).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li3 = li.filter(F.col("l_shipdate") > F.lit("1995-03-15").cast(
        li.schema["l_shipdate"].dataType)).select(
        "l_orderkey", "l_extendedprice", "l_discount")
    shipping = (
        li3.join(F.broadcast(o3.join(F.broadcast(c3), o3["o_custkey"] == c3["c_custkey"])),
                 li3["l_orderkey"] == o3["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(pc * (100 - dc)) / F.lit(10000)).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey").limit(10)
    )

    per_order = li.groupBy("l_orderkey").agg(F.sum(pc * (100 - dc)).alias("order_rev_bp"))
    rev = (per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
           .groupBy("o_custkey")
           .agg((F.sum("order_rev_bp").cast("decimal(38,4)") / 10000)
                .cast("double").alias("revenue"),
                F.count(F.lit(1)).alias("n_orders")))
    top = rev.orderBy(F.col("revenue").desc(), F.col("o_custkey")).limit(20)
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_custkey"))
    top = top.withColumn("rank", F.row_number().over(w))
    toprev = (top.join(F.broadcast(customer), top.o_custkey == customer.c_custkey)
              .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
              .select("c_custkey", "c_name", "n_name", "revenue", "n_orders", "rank"))

    regionrev = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_orders"))
    )
    return {"pricing_summary": pricing, "shipping_priority": shipping,
            "top_revenue_customers": toprev, "region_revenue": regionrev}


# value identity first (sorted collect)
olds = old_builders()
ident = {}
for n in NAMES:
    cur = sorted(map(tuple, QUERIES[n].builder(spark, sf_dir).collect()))  # noqa: F821
    old = sorted(map(tuple, olds[n].collect()))
    ident[n] = (len(cur), cur == old)
print(json.dumps({"identity": ident}))

samples = {}
for _ in range(6):
    olds = old_builders()
    for n in NAMES:
        t0 = time.perf_counter()
        noop(QUERIES[n].builder(spark, sf_dir))  # noqa: F821
        samples.setdefault(f"{n}.new", []).append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        noop(olds[n])  # noqa: F821
        samples.setdefault(f"{n}.old", []).append(time.perf_counter() - t0)
print(json.dumps({k: {"best": round(min(v), 3), "all": [round(x, 3) for x in v]}
                  for k, v in samples.items()}))
