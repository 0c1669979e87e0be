"""Partition invariance: identical results at 1 vs 32 shuffle partitions.

BASELINE.md declares this self-check as a measurable target: every
operator's semantics must be a pure function of the DATA, never of the
physical partitioning. Window frames, groupBy partial aggregation,
applyInPandas group formation, and join strategies all change shape
between 1 and 32 partitions — the results must not.

Queries whose arithmetic is order-sensitive in floating point under
reassociation (double mean/sum partials) are excluded by design: the
registry keeps those exact (counts, decimals, per-group sequential
recurrences), and the oracle-parity suite already pins their values.
"""

from __future__ import annotations

import pytest

from trendmachine_spark.registry import QUERIES, clear_cache

SF = "/root/testdata/sf0.001"

INVARIANT_QUERIES = [
    "capture_normalize",
    "daily_rollup",
    "daily_chaos",
    "transition_matrix",
    "gap_fill_closest",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_clusters_ensemble",
    "dedup_simhash_near_dup",
    "dedup_containment",
    "dedup_incremental",
    "top_quality_docs",
    "embedding_outliers",
    "session_stats",
    "event_props_stats",
    "status_month_cube",
    "event_funnel",
    "event_retention",
    "corpus_sample_stratified",
    "multimodal_frame_sample",
    "resilience_daily_series",
    "corpus_mix_temperature",
    "pack_sequences",
    # round-3 corpus ops: segment reassembly must not depend on
    # collect_list arrival order (array_sort guard); cell assignment
    # and quantile ranks are pure functions of the data
    "dedup_segments",
    "dedup_semantic",
    "chunk_documents",
    "corpus_stats",
    "corpus_card",
    # compositions: pack concat + funnel must be pure functions of the
    # data (array_sort reassembly, anti-join membership)
    "packed_text",
    "training_corpus_segmented",
    # round-4: the real byte-level decode runs per-row inside
    # mapInPandas (batch boundaries move with partitioning); the
    # chained LSH guard's lag window must order only on ids
    "multimodal_decode_real",
    "multimodal_resize_real",
    # round-4 exact-substring dedup: island merge + reassembly must be
    # pure functions of (pos, token), never of arrival order
    "substring_dup_report",
    "substring_dedup",
]


def _rows(spark, name, partitions):
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    clear_cache()  # force rebuild: cached frames remember their shuffle
    try:
        df = QUERIES[name].builder(spark, SF)
        return sorted(map(tuple, df.collect()))
    finally:
        clear_cache()


@pytest.mark.parametrize("name", INVARIANT_QUERIES)
def test_partition_invariance(spark, name):
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        one = _rows(spark, name, 1)
        many = _rows(spark, name, 32)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert len(one) == len(many)
    assert one == many


# ---------------------------------------------------------------------------
# The registry queries above run at sf0.001, where the round-6 DEFAULT
# scale guards never engage (max LSH bucket 3; dup grams << the auto-salt
# threshold). These two exercise the ENGAGED branches — the sharded
# over-cap chain and the salted mark-back join — under 1 vs 32 shuffle
# partitions, since both build on windows/joins whose physical grouping
# moves with partitioning and must not leak into the results.
# ---------------------------------------------------------------------------


def _branch_rows(spark, build, partitions):
    base = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        return sorted(map(tuple, build().collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)


def test_sharded_chain_partition_invariance(spark):
    from trendmachine_spark.extensions.dedup import minhash_near_dup

    docs = spark.createDataFrame(
        [(i, "the same boilerplate sentence repeated for every page")
         for i in range(120)],  # one family > MAX_LSH_BUCKET = 100
        "doc_id long, text string",
    ).repartition(8)
    build = lambda: minhash_near_dup(docs)  # noqa: E731
    one = _branch_rows(spark, build, 1)
    many = _branch_rows(spark, build, 32)
    assert len(one) == 119  # chain volume: n - 1 per over-cap bucket
    assert one == many


def test_salted_mark_join_partition_invariance(spark):
    from trendmachine_spark.extensions.dedup import (
        duplicated_spans, strip_duplicated_spans)

    words = lambda tag, n: " ".join(f"{tag}{j % n}" for j in range(40))  # noqa: E731
    rows = [(i, ("shared dup block one two three four five six seven "
                 + words(f"u{i}_", 17))) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    for build in (
        lambda: duplicated_spans(docs, mark_salt=16),
        lambda: strip_duplicated_spans(docs, mark_salt=16),
    ):
        one = _branch_rows(spark, build, 1)
        many = _branch_rows(spark, build, 32)
        assert one, "planted shared block must produce output"
        assert one == many
