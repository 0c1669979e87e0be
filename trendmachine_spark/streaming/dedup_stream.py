"""Streaming ingest deduplication — the unbounded twin of exact dedup.

A training-data ingest pipeline dedupes *as documents arrive*: the
first observation of each content digest passes through, later copies
are dropped. Batch exact dedup (extensions/dedup.exact_dedup) answers
the same question over a closed corpus; this operator answers it over
an open stream with bounded state.

Spark-first mapping: ``dropDuplicatesWithinWatermark`` keyed on the
digest — state holds one entry per distinct key seen within the
watermark horizon and is evicted beyond it, so memory is bounded by
(arrival rate x horizon), not by stream lifetime. The trade is
explicit and standard: a duplicate arriving *after* its original has
aged out of the watermark window is re-admitted. For exact-forever
dedup, ``horizon=None`` uses unwatermarked ``dropDuplicates`` —
unbounded state, the reference-faithful dict-forever semantics
(same unbounded-state caveat the capture streams solve with their LRU
``digest_cap``).

Which row survives per key: the first to be *processed*, which for a
file source follows micro-batch order; within one micro-batch the
winner among same-key rows is partition-arbitrary (same as batch
``dropDuplicates``). Downstreams that need a deterministic keeper
should key on the digest only and join attributes back from a store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_HORIZON = "2 days"


def dedup_stream(stream: DataFrame, key_cols=("digest",),
                 time_col: str = "event_time",
                 horizon: str | None = DEFAULT_HORIZON) -> DataFrame:
    """stream -> stream with duplicate ``key_cols`` rows dropped.

    ``horizon``: watermark delay bounding the dedup state (late
    duplicates beyond it are re-admitted); ``None`` = unbounded exact
    dedup via plain ``dropDuplicates``.
    """
    keys = list(key_cols)
    if horizon is None:
        return stream.dropDuplicates(keys)
    return stream.withWatermark(time_col, horizon).dropDuplicatesWithinWatermark(keys)
