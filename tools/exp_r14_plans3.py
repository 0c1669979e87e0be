"""Before/after plans for the strip Arrow reassembly (r14 optimization
round): 'before' = reassembly='join' (the historical pure-SQL form,
kept reachable), 'after' = the registered query (reassembly='arrow').
Run under tools/opt_r14_probe.py exec."""
from trendmachine_spark.extensions.dedup import strip_duplicated_spans
from trendmachine_spark.registry import QUERIES, _docs

OUT = "/root/repo/plans/r14"


def explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


docs = _docs(spark, sf_dir)
pairs = {
    "substring_dedup_before": lambda: strip_duplicated_spans(
        docs, win=10, reassembly="join"),
    "substring_dedup_after": lambda: QUERIES[
        "substring_dedup"].builder(spark, sf_dir),
}
import os
for name, build in pairs.items():
    txt = explain(build())
    path = os.path.join(OUT, f"{name}.txt")
    with open(path, "w") as fh:
        fh.write(txt)
    print("wrote", path)
