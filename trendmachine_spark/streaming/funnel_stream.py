"""Streaming ordered funnel: per-user first-completion times in keyed
state, the streaming twin of :func:`operators.funnel.event_funnel`.

Semantics / equivalence contract: with per-user events delivered in
nondecreasing event-time order (the standard key-partitioned Kafka
guarantee; micro-batches are sorted internally, so only CROSS-batch
order matters), the final state per user is EXACTLY the batch funnel.
Why: processing prefix-ordered events, the running t_view is already
final for any later event's strictly-after comparison, so a step event
qualifies in the stream iff it qualifies in the batch formula
``t_i = min(step_i events after t_{i-1})`` — proven against the batch
operator by tests/test_streaming.py across a two-batch time split.
Out-of-order *cross-batch* arrivals can under-chain (a late early view
cannot resurrect clicks already discarded) — inherent to bounded state,
same trade the resilience stream documents for late captures.

Each update emits the user's current funnel row plus a per-key ``ver``
counter; downstream consumers (and the tests) keep the max-``ver`` row
per user as the latest snapshot (update-mode sinks see every revision).

State is O(len(steps)) per user — three bigints for the default funnel;
no digest maps, no TTL needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["events_raw_stream", "funnel_stream"]


def events_raw_stream(spark, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of raw events (user_id, event_type,
    event_time) — schema borrowed from a footer-only batch read, same
    normalization rule as ``events_capture_stream``."""
    from trendmachine_spark.sources.tables import configure

    configure(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    reader = spark.readStream.schema(raw_schema).option(
        "pathGlobFilter", "events*.parquet"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    e = reader.parquet(sf_dir)
    ts_type = dict((f.name, f.dataType.simpleString()) for f in raw_schema)["ts"]
    if ts_type == "bigint":  # legacy nanos layout
        event_time = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        event_time = F.col("ts").cast("timestamp")
    return e.select("user_id", "event_type", event_time.alias("event_time"))


def funnel_stream(stream: DataFrame,
                  steps: tuple[str, ...] = ("view", "click", "purchase")) -> DataFrame:
    """Stateful streaming funnel over (user_id, event_type, event_time).

    Output (update-mode): one row per (user, micro-batch touching that
    user): ``user_id, t_<step>... (epoch micros, NULL = not reached in
    order), steps_reached, ver``.
    """
    import pandas as pd  # local: workers import lazily

    n = len(steps)
    step_list = list(steps)
    state_schema = ", ".join(f"t{i} bigint" for i in range(n)) + ", ver bigint"
    out_cols = ["user_id", *[f"t_{s}" for s in steps], "steps_reached", "ver"]
    out_schema = "user_id bigint, " + ", ".join(
        f"t_{s} bigint" for s in steps
    ) + ", steps_reached bigint, ver bigint"

    # nested closure: cloudpickle ships it by value, so workers don't
    # need the package importable
    def state_fn(key, pdfs, state: GroupState):
        if state.exists:
            *t, ver = state.get
            t = list(t)
        else:
            t, ver = [None] * n, 0
        rows = []
        for pdf in pdfs:
            rows.extend(
                zip(pdf["_us"].tolist(), pdf["event_type"].tolist())
            )
        rows.sort()
        for us, typ in rows:
            for i, s in enumerate(step_list):
                if typ != s:
                    continue
                if i == 0:
                    if t[0] is None or us < t[0]:
                        t[0] = us
                elif (
                    t[i - 1] is not None
                    and us > t[i - 1]
                    and (t[i] is None or us < t[i])
                ):
                    t[i] = us
                break
        ver += 1
        state.update((*t, ver))
        reached = sum(1 for v in t if v is not None)
        yield pd.DataFrame([[key[0], *t, reached, ver]], columns=out_cols)

    return (
        stream.withColumn(
            "_us", F.unix_micros(F.col("event_time").cast("timestamp"))
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            state_fn,
            out_schema,
            state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
