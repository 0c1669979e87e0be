"""x20 interleaved A/B: duplicated_spans hashed vs string grams —
the probe that exposed the premature-salt broadcast regression and
verified its fix (r14 §7 addendum). Run under opt_r14_probe exec
with OPT_SF_MULTIPLE=20."""
from pyspark.sql import functions as F
from trendmachine_spark.extensions.dedup import duplicated_spans
from trendmachine_spark.registry import QUERIES, _docs
import duckdb
_cal = duckdb.connect(); _cal.execute("SET threads=1")
CALIB = "SELECT sum(i*i) FROM range(25000000) t(i)"
def calib():
    t0 = time.perf_counter(); _cal.execute(CALIB).fetchall()
    return round(time.perf_counter() - t0, 3)
docs = _docs(spark, sf_dir)
variants = {
    "report_hashed": lambda: duplicated_spans(docs, win=10, hashed_grams=True),
    "report_string": lambda: duplicated_spans(docs, win=10, hashed_grams=False),
}
samples = {n: [] for n in variants}; cals = {n: [] for n in variants}
for p in range(6):
    for n, build in variants.items():
        spark.sparkContext.setJobDescription(f"reportABx20 {n} p{p}")
        cals[n].append(calib())
        t0 = time.perf_counter()
        noop(build())
        samples[n].append(round(time.perf_counter() - t0, 3))
    spark.sparkContext._jvm.System.gc()
print(json.dumps({n: {"best": min(s), "all": s, "calib": cals[n]} for n, s in samples.items()}, separators=(",", ":")))
