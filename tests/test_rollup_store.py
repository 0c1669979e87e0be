"""Incrementally-refreshable materialized rollup store (sinks.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from trendmachine_spark.sinks import (
    init_rollup_store,
    read_rollup_store,
    refresh_rollup_store,
)

SF = "/root/testdata/sf0.001"


def _caps(spark):
    from trendmachine_spark.sources.captures import events_as_captures

    return events_as_captures(spark, SF)


def test_incremental_refresh_equals_full_rebuild(spark, tmp_path):
    from trendmachine_spark.operators.normalize import normalize_captures
    from trendmachine_spark.operators.rollup import daily_rollup

    caps = _caps(spark)
    # time-split: the first ~80% is the initial load, the tail the
    # daily ingest (no cross-slice timestamp interleaving per url is
    # not required for correctness — the rebuild re-reads full history)
    cut = "20240125000000"
    store = str(tmp_path / "store")
    init_rollup_store(caps.filter(F.col("ts") < cut), store)
    touched = refresh_rollup_store(spark, store, caps.filter(F.col("ts") >= cut))
    assert touched  # the ingest touched at least one bucket

    got = sorted(map(tuple, read_rollup_store(spark, store).collect()))
    want = sorted(map(tuple, daily_rollup(normalize_captures(caps)).collect()))
    assert got == want


def test_refresh_leaves_untouched_buckets_alone(spark, tmp_path):
    """A single-url ingest must rewrite only that url's bucket: every
    other rollup partition's files stay byte-identical (mtime+size)."""
    caps = _caps(spark)
    store = str(tmp_path / "store")
    init_rollup_store(caps, store)

    def snapshot():
        out = {}
        root = store + "/output"
        for d in os.listdir(root):
            if not d.startswith("url_bucket="):
                continue
            files = {
                f: os.stat(os.path.join(root, d, f)).st_mtime_ns
                for f in os.listdir(os.path.join(root, d))
                if f.endswith(".parquet")
            }
            out[d] = files
        return out

    before = snapshot()
    one_url = caps.orderBy("url", "ts").limit(1)
    touched = refresh_rollup_store(spark, store, one_url)
    after = snapshot()
    assert len(touched) == 1
    untouched = [d for d in before if d != f"url_bucket={touched[0]}"]
    assert untouched
    for d in untouched:
        assert after[d] == before[d], d
    assert after[f"url_bucket={touched[0]}"] != before[f"url_bucket={touched[0]}"]


def test_report_store_refresh_equals_full_rebuild(spark, tmp_path):
    """The same incremental pattern carries the FULL scored report
    (spine + gap fill + resilience/fixity/chaos) — with as_of pinned,
    daily_series is url-closed and per-bucket recompute is exact."""
    from trendmachine_spark.pipeline import daily_series
    from trendmachine_spark.sinks import (
        init_report_store,
        read_store,
        refresh_report_store,
    )

    caps = _caps(spark)
    as_of = "2024-01-30"
    cut = "20240125000000"
    store = str(tmp_path / "rstore")
    init_report_store(caps.filter(F.col("ts") < cut), store, as_of)
    touched = refresh_report_store(
        spark, store, caps.filter(F.col("ts") >= cut), as_of
    )
    assert touched

    got = sorted(map(tuple, read_store(spark, store).collect()))
    want = sorted(
        map(tuple, daily_series(caps, fill=2, policy="closest", as_of=as_of).collect())
    )
    assert got == want


def test_report_store_advancing_as_of_recomputes_all_buckets(spark, tmp_path):
    """Daily usage advances the horizon each refresh: the persisted
    as_of must force a full-bucket recompute so untouched buckets'
    spines are extended too (refresh ≡ rebuild at the NEW horizon)."""
    from trendmachine_spark.pipeline import daily_series
    from trendmachine_spark.sinks import (
        ROLLUP_BUCKETS,
        init_report_store,
        read_store,
        refresh_report_store,
    )

    caps = _caps(spark)
    cut = "20240125000000"
    store = str(tmp_path / "rstore")
    init_report_store(caps.filter(F.col("ts") < cut), store, "2024-01-25")
    touched = refresh_report_store(
        spark, store, caps.filter(F.col("ts") >= cut), "2024-02-05"
    )
    assert touched == list(range(ROLLUP_BUCKETS))  # horizon moved => all

    got = sorted(map(tuple, read_store(spark, store).collect()))
    want = sorted(map(tuple, daily_series(
        caps, fill=2, policy="closest", as_of="2024-02-05").collect()))
    assert got == want


def test_refresh_retry_is_idempotent(spark, tmp_path):
    """A retried refresh (same batch_id, same delta) must not
    double-append capture history or change the output."""
    from trendmachine_spark.operators.normalize import normalize_captures
    from trendmachine_spark.operators.rollup import daily_rollup

    caps = _caps(spark)
    cut = "20240125000000"
    store = str(tmp_path / "store")
    init_rollup_store(caps.filter(F.col("ts") < cut), store)
    delta = caps.filter(F.col("ts") >= cut)
    refresh_rollup_store(spark, store, delta, batch_id="2024-01-25-ingest")
    n_caps = spark.read.parquet(store + "/captures").count()
    refresh_rollup_store(spark, store, delta, batch_id="2024-01-25-ingest")
    assert spark.read.parquet(store + "/captures").count() == n_caps

    got = sorted(map(tuple, read_rollup_store(spark, store).collect()))
    want = sorted(map(tuple, daily_rollup(normalize_captures(caps)).collect()))
    assert got == want


def test_keyless_retry_still_yields_correct_output(spark, tmp_path):
    """Without a batch_id the append duplicates rows on disk, but the
    (url, seq, ts) dedupe at re-read keeps the OUTPUT exact."""
    from trendmachine_spark.operators.normalize import normalize_captures
    from trendmachine_spark.operators.rollup import daily_rollup

    caps = _caps(spark)
    cut = "20240125000000"
    store = str(tmp_path / "store")
    init_rollup_store(caps.filter(F.col("ts") < cut), store)
    delta = caps.filter(F.col("ts") >= cut)
    refresh_rollup_store(spark, store, delta)
    refresh_rollup_store(spark, store, delta)  # keyless retry

    got = sorted(map(tuple, read_rollup_store(spark, store).collect()))
    want = sorted(map(tuple, daily_rollup(normalize_captures(caps)).collect()))
    assert got == want


def test_legacy_store_without_metadata_upgrades_on_refresh(spark, tmp_path):
    """A store created before metadata existed (no _meta sidecar) must
    NOT silently skip the as_of staleness protection: the first
    refresh with parameters recomputes every bucket and persists the
    meta, so later refreshes are protected."""
    from pyspark.sql import functions as F

    from trendmachine_spark.pipeline import daily_series
    from trendmachine_spark.sinks import (
        ROLLUP_BUCKETS,
        _read_meta,
        init_store,
        read_store,
        refresh_report_store,
        report_transform,
    )

    caps = _caps(spark)
    cut = "20240125000000"
    store = str(tmp_path / "legacy")
    # simulate a pre-metadata store: init WITHOUT meta, then delete the sidecar
    init_store(caps.filter(F.col("ts") < cut), store,
               report_transform("2024-01-25"), meta={"as_of": "2024-01-25"})
    import shutil

    shutil.rmtree(store + "/_meta")
    assert _read_meta(spark, store) is None

    touched = refresh_report_store(
        spark, store, caps.filter(F.col("ts") >= cut), "2024-02-05"
    )
    assert touched == list(range(ROLLUP_BUCKETS))  # conservative full recompute
    assert _read_meta(spark, store) == {"as_of": "2024-02-05"}  # upgraded

    got = sorted(map(tuple, read_store(spark, store).collect()))
    want = sorted(map(tuple, daily_series(
        caps, fill=2, policy="closest", as_of="2024-02-05").collect()))
    assert got == want
