"""Probe: replace the decimal(_,2)-cast cents/basis-point derivation
with the primitive (x*100 + 0.5)::long (floor-after-offset == decimal
HALF_UP for nonnegative 2-decimal data).

Checks: (a) mismatch count + min-value guard over the FULL lineitem at
this SF for all three columns, (b) timing of the per-order grouped sum
with each formulation.
Run: python tools/opt_r14_probe.py exec tools/exp_cents_primitive.py
"""

import json
import time

from pyspark.sql import functions as F

from trendmachine_spark.registry_queries.relational_events import _table

li = _table(spark, sf_dir, "lineitem")  # noqa: F821

pairs = {
    "q": ("l_quantity", "decimal(12,2)"),
    "p": ("l_extendedprice", "decimal(14,2)"),
    "d": ("l_discount", "decimal(4,2)"),
}
checks = li.select(
    *[F.sum(((F.col(c).cast(t) * 100).cast("long")
             != (F.col(c) * 100 + 0.5).cast("long")).cast("int")).alias(f"mism_{k}")
      for k, (c, t) in pairs.items()],
    *[F.min(F.col(c)).alias(f"min_{k}") for k, (c, _) in pairs.items()],
    F.count(F.lit(1)).alias("rows"),
).collect()[0].asDict()
print(json.dumps({"checks": checks}))

pc_dec = (F.col("l_extendedprice").cast("decimal(14,2)") * 100).cast("long")
dc_dec = (F.col("l_discount").cast("decimal(4,2)") * 100).cast("long")
pc_pr = (F.col("l_extendedprice") * 100 + 0.5).cast("long")
dc_pr = (F.col("l_discount") * 100 + 0.5).cast("long")

variants = {
    "agg_decimal": lambda: li.groupBy("l_orderkey").agg(
        F.sum(pc_dec * (100 - dc_dec)).alias("s")),
    "agg_primitive": lambda: li.groupBy("l_orderkey").agg(
        F.sum(pc_pr * (100 - dc_pr)).alias("s")),
}
samples = {}
for _ in range(6):
    for name, b in variants.items():
        t0 = time.perf_counter()
        noop(b())  # noqa: F821
        samples.setdefault(name, []).append(time.perf_counter() - t0)
print(json.dumps({k: {"best": round(min(v), 3), "all": [round(x, 3) for x in v]}
                  for k, v in samples.items()}))
