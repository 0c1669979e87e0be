"""Print the physical plan of the ngram posting list as fed to
localCheckpoint (the part whose wall stage_ckpt measures)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from trendmachine_spark.extensions import dedup as D
from trendmachine_spark.registry_core import _docs

docs = _docs(spark, sf_dir)  # noqa: F821
sh = D.shingles(docs, "text", "doc_id", D.SHINGLE_K, distinct=False)
sh = sh.repartition("doc_id").dropDuplicates(["doc_id", "shingle"])
sh = sh.withColumn(
    "n_shingles", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
)
hot = (
    D._candidate_rows(sh.select("shingle"), "shingle",
                      D.MAX_SHINGLE_FREQ + 1, broadcast_cand=True)
    .groupBy("shingle")
    .agg(F.count(F.lit(1)).alias("_df"))
    .filter(F.col("_df") > D.MAX_SHINGLE_FREQ)
    .select("shingle")
)
sh = sh.join(hot, "shingle", "left_anti")
sh = sh.repartition("shingle")
txt = sh._sc._jvm.PythonSQLUtils.explainString(
    sh._jdf.queryExecution(), "formatted")
print(txt)
