"""Count static hash exchanges + runtime ReusedExchange for the two
_shingle_pair_counts consumers after the r14 checkpoint-before-guard
restructure (run via opt_r14_probe exec, sf0.001)."""

import json

from trendmachine_spark.registry import QUERIES

out = {}
for name in ("dedup_ngram_jaccard", "dedup_containment"):
    df = QUERIES[name].builder(spark, sf_dir)  # noqa: F821
    qe = df._jdf.queryExecution()
    static = qe.executedPlan().toString()
    n = df.count() if False else len(df.collect())
    final = qe.executedPlan().toString()
    out[name] = {
        "rows": n,
        "static_hash_exchanges": static.count("Exchange hashpartitioning"),
        "final_hash_exchanges": final.count("Exchange hashpartitioning"),
        "final_reused": final.count("ReusedExchange"),
        "shj": final.count("ShuffledHashJoin"),
    }
print(json.dumps(out))
