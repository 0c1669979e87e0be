"""corpus_merge_report isolated: 4 passes, current implementation only."""
import json
import time

from trendmachine_spark.registry import QUERIES

s = []
for p in range(4):
    spark.sparkContext.setJobDescription(f"merge iso p{p}")
    t0 = time.perf_counter()
    noop(QUERIES["corpus_merge_report"].builder(spark, sf_dir))
    s.append(round(time.perf_counter() - t0, 3))
    spark.sparkContext._jvm.System.gc()
print(json.dumps({"sf_dir": sf_dir, "passes": s, "best": min(s)}))
