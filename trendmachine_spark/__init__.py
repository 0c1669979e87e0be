"""trendmachine_spark — PySpark-native web-archive resilience analytics.

A from-scratch engine with the query surface of internetarchive/
trendmachine (see SURVEY.md), generalized from one-URL-per-session to
url-partitioned DataFrames, plus LLM-data-pipeline extension operators
(dedup, similarity search, text analysis) over documents/embeddings.
"""

from trendmachine_spark.params import DEFAULT_SIGPARAMS, SigmoidParam
from trendmachine_spark.pipeline import daily_series, dense_daily
from trendmachine_spark.suite import run_suite, suite_frame

__all__ = ["DEFAULT_SIGPARAMS", "SigmoidParam", "daily_series", "dense_daily",
           "run_suite", "suite_frame"]
