"""Batched suite execution — many registry queries under ONE action.

Spark's per-action floor (job submission + stage scheduling + py4j
round-trips) measured ~0.46 s/action on local[32] at ×20
(FLOOR_BATCH.json / FLOOR_DECOMP.json): for a dashboard refresh of N
sub-second aggregates, N separate actions pay that floor N times while
the actual data work would fit in one scheduler window. A single-node
engine like DuckDB has no comparable floor, which is exactly why the
five floor-bound bench queries read 4-13× DuckDB at small SF while the
data-dominated queries beat it outright.

:func:`suite_frame` composes any set of registry queries into ONE
DataFrame — each query's rows tagged with its name and serialized with
``to_json`` — so one ``save``/``collect`` materializes every result in
a single action: one submission floor, all independent stages
scheduled concurrently. :func:`run_suite` is the user-facing form (the
reference app refreshes its whole dashboard per URL interaction —
main.py renders every pane per run — so "give me all panes in one job"
is the native usage pattern, not a benchmark trick).

Semantics: each query's plan is EXACTLY its standalone plan (union
adds no exchange above the branches); results are returned as
per-query lists of dicts, row order within a query undefined (as with
any unordered collect — order-sensitive consumers should sort, the
same contract as the per-query DataFrames).
"""

from __future__ import annotations

import json
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: The bench's floor-bound tail (FLOOR_BATCH.json): sub-second
#: aggregates whose wall is dominated by the per-action floor, i.e.
#: the queries a dashboard gains most from batching.
FLOOR_BOUND_QUERIES = (
    "pricing_summary",
    "event_sessionization",
    "top_revenue_customers",
    "dedup_exact",
    "similarity_topk",
)


def suite_frame(spark: SparkSession, sf_dir: str,
                names: Iterable[str]) -> DataFrame:
    """One DataFrame = union of the named registry queries, each row
    ``(query, row)`` with ``row`` the JSON of the query's output row.

    One action on this frame (save/collect) executes every query under
    a single job-submission floor; branches keep their standalone
    plans. Builders that materialize state eagerly (the LSH band
    table, the guarded jaccard posting list) still run their
    construction-time jobs when THIS function is called — batching
    amortizes the action floor, not construction.
    """
    names = list(names)
    if not names:
        raise ValueError("suite_frame needs at least one query name")
    from trendmachine_spark.registry import QUERIES

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise ValueError(f"unknown queries: {unknown}")
    branches = []
    for n in names:
        df = QUERIES[n].builder(spark, sf_dir)
        branches.append(df.select(
            F.lit(n).alias("query"),
            # ignoreNullFields defaults to true and would silently DROP
            # null-valued columns from the row dicts, breaking the
            # rows-equal-standalone contract for queries that emit NULLs
            F.to_json(F.struct(*df.columns),
                      {"ignoreNullFields": "false"}).alias("row"),
        ))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def run_suite(spark: SparkSession, sf_dir: str,
              names: Iterable[str] = FLOOR_BOUND_QUERIES,
              ) -> dict[str, list[dict]]:
    """Execute the named registry queries as ONE Spark action and
    return ``{name: [row-dict, ...]}``.

    Row dicts hold the query's own column names; within-query row
    order is undefined (sort downstream if it matters). Intended for
    dashboard-style refreshes of many small aggregates — for a single
    huge result, call its builder directly and keep the DataFrame.
    """
    names = list(names)
    out: dict[str, list[dict]] = {n: [] for n in names}
    for rec in suite_frame(spark, sf_dir, names).collect():
        out[rec["query"]].append(json.loads(rec["row"]))
    return out
