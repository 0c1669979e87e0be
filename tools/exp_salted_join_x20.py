"""Salted mark-join strategy probe at x20 (r14 §7 addendum): the
replicated hashed build side was being BROADCAST (driver collect +
single-threaded build); measures current vs shuffle_hash-hinted vs
unsalted-broadcast forms and prints the executed join nodes. Run
under opt_r14_probe exec with OPT_SF_MULTIPLE=20."""
from pyspark.sql import functions as F
from trendmachine_spark.extensions.dedup import (
    _materialize, window_occurrences)
from trendmachine_spark.registry import _docs
import duckdb
_cal = duckdb.connect(); _cal.execute("SET threads=1")
CALIB = "SELECT sum(i*i) FROM range(25000000) t(i)"
def calib():
    t0 = time.perf_counter(); _cal.execute(CALIB).fetchall()
    return round(time.perf_counter() - t0, 3)
docs = _docs(spark, sf_dir)
occ = window_occurrences(docs, win=10, hashed=True)
dg = _materialize(
    occ.groupBy("gram").agg(F.count(F.lit(1)).alias("_f"))
    .filter(F.col("_f") >= 2).select("gram"))
dg.count()
SALT = 16

def salted(build_hint=None):
    salted_occ = occ.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("doc_id"), F.col("pos")), F.lit(SALT)))
    rep = dg.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0).cast("long"),
                                      F.lit(SALT - 1).cast("long"))))
    if build_hint:
        rep = rep.hint(build_hint)
    return salted_occ.join(rep, ["gram", "_salt"], "left_semi").select("doc_id", "pos")

def unsalted():
    return occ.join(dg, "gram", "left_semi").select("doc_id", "pos")

# capture executed join strategy of the current salted form
df = salted()
noop(df)
plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
joins = [l.strip() for l in plan.splitlines() if "Join" in l]
print(json.dumps({"salted_current_joins": joins[:4]}))

variants = {
    "salted_current": lambda: salted(),
    "salted_shj": lambda: salted("shuffle_hash"),
    "unsalted_bcast": lambda: unsalted(),
}
samples = {n: [] for n in variants}; cals = {n: [] for n in variants}
for p in range(5):
    for n, build in variants.items():
        cals[n].append(calib())
        t0 = time.perf_counter()
        noop(build())
        samples[n].append(round(time.perf_counter() - t0, 3))
    spark.sparkContext._jvm.System.gc()
print(json.dumps({n: {"best": min(s), "all": s, "calib": cals[n]} for n, s in samples.items()}, separators=(",", ":")))
