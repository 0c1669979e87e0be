"""Decompose sq8_encode_streaming / pq_encode_streaming (guide §1.3):
where do the x10 seconds go, and do two result-identical restructures
help — (a) prune the unused interpreted-HOF ``norm2`` column out of the
encode mapInPandas input, (b) sink COMPACT (vid, codes) rows into the
memory sink and posexplode AFTER the sink read (the sink driver-collects
every row; exploded SQ8 output is dim x n_vecs rows).

Run under the bench session/confs:
  OPT_SF_MULTIPLE=10 python tools/opt_r14_probe.py exec tools/exp_sq8_stream_decomp.py
"""

import hashlib
import time

from pyspark.sql import functions as F

from trendmachine_spark.registry import QUERIES, _embeddings
from trendmachine_spark.extensions.similarity import (
    quantize_embeddings, sq8_encode, sq8_scales)

emb = _embeddings(spark, sf_dir)  # noqa: F821


def timed(label, fn, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:40s} {best:7.3f} s best-of-{n}", flush=True)
    return best


# -- phase A: the trained scales (batch leg) -------------------------------
timed("A  sq8_scales (qv full: vid,qvec,norm2)",
      lambda: sq8_scales(quantize_embeddings(emb)))
timed("A' sq8_scales (qvec-only input)",
      lambda: sq8_scales(quantize_embeddings(emb).select("vid", "qvec")))

S = sq8_scales(quantize_embeddings(emb))


# -- phase B: the streaming leg, current vs restructured -------------------
def stream_run(compact: bool, prune: bool, tag: str):
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")  # noqa: F821
        .option("pathGlobFilter", "embeddings*.parquet")
        .parquet(sf_dir)  # noqa: F821
    )
    qv = quantize_embeddings(stream)
    if prune:
        qv = qv.select("vid", "qvec")
    enc = sq8_encode(qv, S)
    if compact:
        out = enc.select(F.col("vid").alias("vec_id"), "codes")
    else:
        out = enc.select(
            F.col("vid").alias("vec_id"),
            F.posexplode("codes").alias("pos", "code"),
        ).select("vec_id", F.col("pos").cast("int"), F.col("code").cast("int"))
    qname = "_exp_sq8_" + tag + hashlib.md5(sf_dir.encode()).hexdigest()[:6]  # noqa: F821
    q = (out.writeStream.format("memory").queryName(qname)
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    tbl = spark.sql(f"SELECT * FROM {qname}")  # noqa: F821
    if compact:
        tbl = tbl.select(
            "vec_id", F.posexplode("codes").alias("pos", "code")
        ).select("vec_id", F.col("pos").cast("int"), F.col("code").cast("int"))
    return tbl


def run_and_noop(compact, prune, tag):
    tbl = stream_run(compact, prune, tag)
    noop(tbl)  # noqa: F821
    return tbl


i = [0]


def var(compact, prune):
    i[0] += 1
    return run_and_noop(compact, prune, f"v{i[0]}_")


timed("B  stream exploded, full qv (current)", lambda: var(False, False))
timed("B' stream exploded, pruned qv", lambda: var(False, True))
timed("C  stream compact sink + explode after", lambda: var(True, False))
timed("C' compact sink + pruned qv", lambda: var(True, True))

# -- value identity: current builder vs the C' restructure ----------------
cur = QUERIES["sq8_encode_streaming"].builder(spark, sf_dir)  # noqa: F821
new = stream_run(True, True, "vid_")
a = sorted(map(tuple, cur.collect()))
b = sorted(map(tuple, new.collect()))
print("value-identical:", a == b, f"({len(a)} rows)", flush=True)

# -- whole-query walls: current registry builder ---------------------------
timed("D  registry builder (current, end2end)",
      lambda: noop(QUERIES["sq8_encode_streaming"].builder(spark, sf_dir)))  # noqa: F821
timed("E  pq_encode_streaming (current)",
      lambda: noop(QUERIES["pq_encode_streaming"].builder(spark, sf_dir)))  # noqa: F821
