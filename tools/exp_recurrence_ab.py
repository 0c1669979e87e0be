"""A/B the resilience_daily_series shapes at the current SF:
  full_bucketed — r14 current default (whole row through Arrow, no join)
  slim_bucketed — bucketed map, slim columns + (url, day) join-back
  r13_perurl    — the r13 implementation verbatim (per-url groups, slim)
Identity first, then order-alternated interleaved timing.
Run: python tools/opt_r14_probe.py exec tools/exp_recurrence_ab.py
"""

import importlib.util
import json
import os
import statistics
import time

from trendmachine_spark.operators.recurrence import score_daily_series
from trendmachine_spark.pipeline import report_projection
from trendmachine_spark.registry import QUERIES
from trendmachine_spark.registry_queries.captures import _dense

spec = importlib.util.spec_from_file_location("recurrence_r13", "/tmp/recurrence_r13.py")
r13 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(r13)


def builders():
    dense = _dense(spark, sf_dir, fill=2, policy="closest")  # noqa: F821
    return {
        "full_bucketed": report_projection(score_daily_series(dense)),
        "slim_bucketed": report_projection(score_daily_series(dense, slim_arrow=True)),
        "r13_perurl": report_projection(r13.score_daily_series(dense)),
    }


b = builders()
cur = sorted(map(tuple, QUERIES["resilience_daily_series"].builder(spark, sf_dir).collect()))  # noqa: F821
ident = {n: (sorted(map(tuple, df.collect())) == cur) for n, df in b.items()}
print(json.dumps({"rows": len(cur), "identity": ident}))

passes = int(os.environ.get("RC_PASSES", "8"))
samples = {}
names = list(b)
for i in range(passes):
    b = builders()
    order = names if i % 2 == 0 else names[::-1]
    for n in order:
        t0 = time.perf_counter()
        noop(b[n])  # noqa: F821
        samples.setdefault(n, []).append(time.perf_counter() - t0)
print(json.dumps({k: {"best": round(min(v), 3),
                      "median": round(statistics.median(v), 3),
                      "all": [round(x, 3) for x in v]} for k, v in samples.items()}))
