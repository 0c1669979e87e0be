"""Streaming variant smoke + semantics (SURVEY.md M5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trendmachine_spark.streaming.capture_stream import (
    chaos_scores_stream,
    daily_capture_counts,
    events_capture_stream,
)

SF = "/root/testdata/sf0.001"


def _run_to_memory(df, name, mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_streaming_daily_counts_matches_batch(spark):
    stream = events_capture_stream(spark, SF)
    assert stream.isStreaming
    # complete mode: append would withhold the final (still-open) day's
    # window, since the watermark never passes the stream's max event time
    _run_to_memory(daily_capture_counts(stream), "daily_counts", "complete")
    got = spark.sql(
        "SELECT sum(_2xx) a, sum(_3xx) b, sum(_4xx) c, sum(_5xx) d, sum(n_captures) n FROM daily_counts"
    ).collect()[0]

    # batch reference with the SAME semantics: the windowed agg counts
    # raw classes per capture (revisit '-' rows are outside 2xx..5xx —
    # cross-row resolution lives in the stateful operator instead)
    from trendmachine_spark.functions.scalars import status_class
    from trendmachine_spark.sources.captures import events_as_captures

    caps = events_as_captures(spark, SF)
    cls = status_class(F.col("status"))
    want = caps.agg(
        F.sum((cls == "2xx").cast("long")).alias("a"),
        F.sum((cls == "3xx").cast("long")).alias("b"),
        F.sum((cls == "4xx").cast("long")).alias("c"),
        F.sum((cls == "5xx").cast("long")).alias("d"),
    ).collect()[0]
    for k in "abcd":
        assert got[k] == want[k], k
    assert got["n"] == 1000


def test_streaming_chaos_state_matches_batch_final(spark):
    stream = events_capture_stream(spark, SF)
    _run_to_memory(chaos_scores_stream(stream), "chaos_stream", "append")
    got = {
        r["url"]: r for r in spark.sql(
            "SELECT * FROM chaos_stream"
        ).collect()
    }
    # batch final chaos per url = last day's closing value
    from trendmachine_spark.operators.normalize import normalize_captures
    from trendmachine_spark.operators.rollup import daily_rollup
    from trendmachine_spark.sources.captures import events_as_captures

    batch = daily_rollup(normalize_captures(events_as_captures(spark, SF)))
    final = batch.groupBy("url").agg(
        F.max_by("chaos", "day").alias("chaos"),
        F.max_by("chaosn", "day").alias("chaosn"),
        F.sum("all").alias("n_classified"),
    )
    for r in final.collect():
        assert r["url"] in got
        assert got[r["url"]]["chaos"] == pytest.approx(r["chaos"], abs=1e-12), r["url"]
        assert got[r["url"]]["chaosn"] == pytest.approx(r["chaosn"], abs=1e-12), r["url"]


def test_streaming_resilience_matches_batch_closed_days(spark):
    from trendmachine_spark.streaming.capture_stream import resilience_scores_stream

    stream = events_capture_stream(spark, SF)
    _run_to_memory(resilience_scores_stream(stream), "res_stream", "append")
    got = {
        (r["url"], r["day"]): (r["specimen"], r["resilience"])
        for r in spark.sql("SELECT * FROM res_stream").collect()
    }

    from trendmachine_spark.pipeline import daily_series
    from trendmachine_spark.sources.captures import events_as_captures

    caps = events_as_captures(spark, SF)
    batch = daily_series(caps, fill=0)
    last_observed = {
        r["url"]: r["mx"]
        for r in batch.filter(F.col("All") != 0)
        .groupBy("url").agg(F.max("Day").alias("mx")).collect()
    }
    checked = 0
    for r in batch.collect():
        if r["Day"] >= last_observed[r["url"]]:
            continue  # the open day + trailing spine are not yet closed in streaming
        key = (r["url"], r["Day"])
        assert key in got, key
        spec = r["Specimen"] if r["Specimen"] in ("2xx", "3xx", "4xx", "5xx", "~") else "~"
        assert got[key][0] == spec, key
        assert got[key][1] == pytest.approx(r["Resilience"], abs=1e-12), key
        checked += 1
    assert checked > 300


def test_streaming_scored_matches_batch_closed_days(spark):
    from trendmachine_spark.streaming.scored_stream import scored_daily_stream

    stream = events_capture_stream(spark, SF)
    _run_to_memory(scored_daily_stream(stream), "scored_stream", "append")
    got = {
        (r["url"], r["day"]): r
        for r in spark.sql("SELECT * FROM scored_stream").collect()
    }

    from trendmachine_spark.pipeline import daily_series
    from trendmachine_spark.sources.captures import events_as_captures

    caps = events_as_captures(spark, SF)
    batch = daily_series(caps, fill=0)
    last_observed = {
        r["url"]: r["mx"]
        for r in batch.filter(F.col("All") != 0)
        .groupBy("url").agg(F.max("Day").alias("mx")).collect()
    }
    checked = 0
    for r in batch.collect():
        if r["Day"] >= last_observed[r["url"]]:
            continue
        g = got[(r["url"], r["Day"])]
        assert g["content"] == r["Content"], (r["url"], r["Day"])
        assert g["resilience"] == pytest.approx(r["Resilience"], abs=1e-12)
        assert g["fixity"] == pytest.approx(r["Fixity"], abs=1e-12)
        checked += 1
    assert checked > 300


def test_streaming_digest_cap_lru(spark, tmp_path):
    """Bounded digest state: with an LRU cap the stream still closes the
    same days; a revisit whose digest was evicted resolves to '~'."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from trendmachine_spark.streaming.scored_stream import scored_daily_stream

    def nanos(day):
        return int(pd.Timestamp(f"2024-01-0{day} 01:00:00").value)

    rows = pd.DataFrame(
        {
            "event_id": pd.array([1, 2, 3, 4], dtype="int64"),
            "ts": pd.array([nanos(1), nanos(2), nanos(3), nanos(4)], dtype="int64"),
            "user_id": pd.array([7, 7, 7, 7], dtype="int64"),
            # click->200 (DG1), purchase->404 (DG2), signup->'-' revisit
            # of DG1, click closes day 3
            "event_type": ["click", "purchase", "signup", "click"],
            "value": [0.0, 0.0, 0.0, 0.0],
            "props": ["n1x", "n2x", "n1x", "n3x"],
        }
    )
    pq.write_table(pa.Table.from_pandas(rows), str(tmp_path / "events.parquet"))

    out = {}
    for name, cap in (("lru_big", 8), ("lru_one", 1)):
        stream = events_capture_stream(spark, str(tmp_path))
        _run_to_memory(scored_daily_stream(stream, digest_cap=cap), name, "append")
        out[name] = {
            r["day"]: r["specimen"]
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }

    closed = {"2024-01-01", "2024-01-02", "2024-01-03"}
    assert set(out["lru_big"]) == set(out["lru_one"]) == closed
    # retained digest: the day-3 revisit resolves to its original class
    assert out["lru_big"]["2024-01-03"] == "2xx"
    # cap=1: inserting DG2 evicted DG1 -> the revisit is unresolved
    assert out["lru_one"]["2024-01-03"] == "~"


def test_streaming_dedup_matches_batch_distinct(spark):
    """Ingest dedup: one survivor per digest, same digest set as batch
    DISTINCT; unbounded variant identical on a closed stream."""
    from trendmachine_spark.streaming.dedup_stream import dedup_stream
    from trendmachine_spark.sources.captures import events_as_captures

    for name, horizon in (("dedup_wm", "2 days"), ("dedup_exactly", None)):
        stream = events_capture_stream(spark, SF)
        _run_to_memory(dedup_stream(stream, horizon=horizon), name, "append")
        got = spark.sql(f"SELECT digest, count(*) c FROM {name} GROUP BY digest").collect()
        assert all(r["c"] == 1 for r in got)
        want = {
            r["digest"]
            for r in events_as_captures(spark, SF).select("digest").distinct().collect()
        }
        assert {r["digest"] for r in got} == want


def test_streaming_final_day_flushes_on_watermark(spark, tmp_path):
    """Event-time timeout: a url that goes quiet still emits its final
    open day once the watermark (driven by other traffic) passes the
    day's end — values batch-equivalent at 1e-12. A url whose open day
    the watermark has NOT passed stays open (no premature emission)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from trendmachine_spark.streaming.capture_stream import resilience_scores_stream
    from trendmachine_spark.streaming.scored_stream import scored_daily_stream

    def us(day_ts):
        return pd.Timestamp(day_ts)

    rows = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            # user-7 active Jan 1-3 then quiet; user-9's Jan 20 event
            # advances the watermark past user-7's open day
            "ts": pa.array(
                [us("2024-01-01 01:00:00"), us("2024-01-02 01:00:00"),
                 us("2024-01-03 01:00:00"), us("2024-01-20 01:00:00")],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([7, 7, 7, 9], type=pa.int64()),
            "event_type": ["click", "purchase", "click", "click"],
            "value": [0.0, 0.0, 0.0, 0.0],
            "props": ["n1x", "n2x", "n3x", "n4x"],
        }
    )
    pq.write_table(rows, str(tmp_path / "events.parquet"))

    from trendmachine_spark.pipeline import daily_series
    from trendmachine_spark.sources.captures import events_as_captures

    batch = {
        (r["url"], r["Day"]): r
        for r in daily_series(
            events_as_captures(spark, str(tmp_path)), fill=0
        ).collect()
    }

    for name, build in (
        ("flush_res", resilience_scores_stream),
        ("flush_scored", scored_daily_stream),
    ):
        stream = events_capture_stream(spark, str(tmp_path))
        _run_to_memory(build(stream), name, "append")
        got = {
            (r["url"], r["day"]): r
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        # final day 2024-01-03 closed by TIMEOUT (no later user-7 event)
        assert set(got) == {
            ("user-7", "2024-01-01"), ("user-7", "2024-01-02"),
            ("user-7", "2024-01-03"),
        }, name
        for k, g in got.items():
            assert g["resilience"] == pytest.approx(
                batch[k]["Resilience"], abs=1e-12), (name, k)
        if name == "flush_scored":
            for k, g in got.items():
                assert g["fixity"] == pytest.approx(
                    batch[k]["Fixity"], abs=1e-12), k
                assert g["content"] == batch[k]["Content"], k
