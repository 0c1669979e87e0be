"""Prototype: streaming mapInPandas recurrence (state carried across
Arrow batches) vs current bucketed applyInPandas vs r13 per-url.
Identity-checked against the registry query, then order-alternated
interleaved timing.
Run: python tools/opt_r14_probe.py exec tools/exp_recurrence_stream.py
"""

import importlib.util
import json
import os
import statistics
import time

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from trendmachine_spark.operators.recurrence import _param_table, score_daily_series
from trendmachine_spark.pipeline import report_projection
from trendmachine_spark.registry import QUERIES
from trendmachine_spark.registry_queries.captures import _dense

spec = importlib.util.spec_from_file_location("recurrence_r13", "/tmp/recurrence_r13.py")
r13 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(r13)


def score_streaming(dense, sigparams=None, parts=None):
    params = _param_table(sigparams)
    known = list(params)
    P = parts or int(dense.sparkSession.conf.get("spark.sql.shuffle.partitions"))

    src = dense
    in_cols = [f.name for f in src.schema.fields]
    out_schema = T.StructType(
        list(src.schema.fields)
        + [T.StructField("resilience", T.DoubleType()),
           T.StructField("fixity", T.DoubleType())]
    )
    out_cols = [f.name for f in out_schema.fields]

    def stream(batches):
        # one state per recurrence: [url, key, base, scale, sp, x_next]
        st = {"res": None, "fix": None}

        def run(keys, urls, default_key, state):
            # state = [url, key, base, scale, sp, x_next, h_last]
            n = len(keys)
            out = np.empty(n, dtype=np.float64)
            change = np.ones(n, dtype=bool)
            change[1:] = (keys[1:] != keys[:-1]) | (urls[1:] != urls[:-1])
            if state is not None and state[0] == urls[0] and state[1] == keys[0]:
                change[0] = False  # continue the carried run
            starts = np.flatnonzero(change)
            # leading continuation segment (before the first change)
            lead_end = starts[0] if len(starts) else n
            if lead_end > 0:
                url0, key0, base, scale, sp, x_next, _ = state
                shift, slope, spread = sp
                x = np.arange(x_next, x_next + lead_end, dtype=np.float64)
                seg = base + scale * (spread / (1.0 + np.exp(shift - x / slope)))
                out[:lead_end] = seg
                state = [url0, key0, base, scale, sp, x_next + lead_end, seg[-1]]
            h = 0.5 if state is None else state[6]
            ends = np.append(starts[1:], n)
            for s0, e0 in zip(starts, ends):
                if s0 == 0:
                    # run boundary at batch start: fresh url -> 0.5,
                    # same url (key change) -> carry the last h
                    h = 0.5 if (state is None or state[0] != urls[0]) else state[6]
                elif urls[s0] != urls[s0 - 1]:
                    h = 0.5
                # else: h from the previous segment in this batch
                p = params.get(keys[s0])
                if p is None:
                    p = params[default_key]
                shift, slope, spread = p
                base = h
                scale = base if spread < 0 else 1.0 - base
                x = np.arange(1, e0 - s0 + 1, dtype=np.float64)
                seg = base + scale * (spread / (1.0 + np.exp(shift - x / slope)))
                out[s0:e0] = seg
                h = seg[-1]
                state = [urls[s0], keys[s0], base, scale, p,
                         float(e0 - s0 + 1), seg[-1]]
            return out, state

        for pdf in batches:
            pdf = pdf[in_cols]
            if len(pdf) == 0:
                continue
            urls = pdf["url"].to_numpy(dtype=object)
            spec_ = pdf["specimen"].to_numpy(dtype=object)
            spec_ = np.where(np.isin(spec_, known), spec_, "~")
            res, st["res"] = run(spec_, urls, "~", st["res"])
            content = pdf["content"].to_numpy(dtype=object)
            fix, st["fix"] = run(content, urls, "Unknown", st["fix"])
            pdf = pdf.copy()
            pdf["resilience"] = res
            pdf["fixity"] = fix
            yield pdf[out_cols]

    return (
        src.repartition(P, "url")
        .sortWithinPartitions("url", "day")
        .mapInPandas(stream, schema=out_schema)
    )


def builders():
    dense = _dense(spark, sf_dir, fill=2, policy="closest")  # noqa: F821
    return {
        "current": report_projection(score_daily_series(dense)),
        "stream": report_projection(score_streaming(dense)),
        "r13_perurl": report_projection(r13.score_daily_series(dense)),
    }


b = builders()
cur = sorted(map(tuple, QUERIES["resilience_daily_series"].builder(spark, sf_dir).collect()))  # noqa: F821
ident = {n: (sorted(map(tuple, df.collect())) == cur) for n, df in b.items()}
ntasks = b["stream"].select(F.spark_partition_id().alias("p")).distinct().count()
print(json.dumps({"rows": len(cur), "identity": ident, "stream_tasks": ntasks}))

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
