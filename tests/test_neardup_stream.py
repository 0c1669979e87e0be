"""Watermarked stateful streaming near-dup (streaming/neardup_stream.py):
band/bucket parity with the batch LSH operators, flag equivalence with
iterated incremental_dedup across a trigger split (late data included),
TTL re-admission, and the per-bucket state cap."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from trendmachine_spark.extensions.dedup import (
    incremental_dedup,
    lsh_band_buckets,
    minhash_signatures_narrow,
    shingles,
)
from trendmachine_spark.streaming.neardup_stream import (
    band_bucket_rows,
    flags_from_rows,
    near_dup_flags_stream,
)

W = [f"w{i}" for i in range(12)]


def _text(tag: str) -> str:
    # 12 distinct words -> 10 3-gram shingles
    return " ".join(f"{tag}{w}" for w in W)


def _near(tag: str) -> str:
    # change the LAST word: 9 of 10 shingles shared, jaccard 9/11 = 0.818
    return " ".join([f"{tag}{w}" for w in W[:-1]] + ["CHANGED"])


# trigger 0 seeds the corpus; triggers 1-2 mirror test_streaming_ingest's
# batches. Every batch-1 doc that later docs match is ACCEPTED (the
# clean-corpus precondition under which flags == iterated
# incremental_dedup exactly — see the module doc's divergence note).
SEED = [(i, _text(f"base{i}"), "2020-01-05T00:00:00") for i in range(4)]
BATCH1 = [
    (100, _text("fresh100"), "2020-01-06T00:00:00"),  # new
    (101, _text("base0"), "2020-01-06T01:00:00"),     # exact dup of seed 0
    (102, _near("base1"), "2020-01-06T02:00:00"),     # near dup of seed 1
    (103, _text("fresh103"), "2020-01-06T03:00:00"),  # new
    (104, _text("fresh103"), "2020-01-06T04:00:00"),  # exact dup IN trigger
]
BATCH2 = [
    (200, _text("fresh100"), "2020-01-07T00:00:00"),  # exact dup of 100
    (201, _text("fresh201"), "2020-01-07T01:00:00"),  # new
    # LATE: event time before most of batch 1, arrives a trigger later —
    # still inside the 30-day watermark, flags follow ARRIVAL order
    (202, _near("fresh100"), "2020-01-05T12:00:00"),  # near dup of 100
]


def _write_batches(src, batches):
    src.mkdir(exist_ok=True)
    for i, rows in enumerate(batches):
        p = src / f"batch{i}.json"
        p.write_text("\n".join(
            json.dumps({"doc_id": d, "text": t, "event_time": ts})
            for d, t, ts in rows))
        os.utime(p, (1_700_000_000 + i * 1000, 1_700_000_000 + i * 1000))


def _run_stream(spark, src, ckpt, sink_name, **kwargs):
    stream = (
        spark.readStream.schema("doc_id long, text string, event_time timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        near_dup_flags_stream(stream, **kwargs)
        .writeStream.format("memory").queryName(sink_name)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink_name)


def _flags_dict(df):
    return {
        r["doc_id"]: (r["exact_dup_base"], r["exact_dup_delta"],
                      r["near_dup_base"], r["is_new"])
        for r in df.collect()
    }


def test_band_bucket_rows_match_batch(spark):
    """The narrow streaming projection must produce exactly the batch
    operators' (band, bucket) pairs and shingle sets."""
    docs = spark.createDataFrame(
        [(d, t) for d, t, _ in SEED + BATCH1]
        + [(300, "one two")],  # short doc: no 3-gram
        "doc_id long, text string",
    ).withColumn("event_time", F.lit("2020-01-05 00:00:00").cast("timestamp"))

    got = band_bucket_rows(docs).collect()
    want_bb = {
        (r["doc_id"], r["band"], r["bucket"])
        for r in lsh_band_buckets(
            minhash_signatures_narrow(docs.drop("event_time"))).collect()
    }
    got_bb = {(r["doc_id"], r["band"], r["bucket"]) for r in got if r["band"] >= 0}
    assert got_bb == want_bb

    # short doc: single (band=-1, bucket=md5) row, empty shingles
    short = [r for r in got if r["doc_id"] == 300]
    assert len(short) == 1 and short[0]["band"] == -1 and short[0]["sh"] == []

    want_sh = {
        r["doc_id"]: set(r["s"])
        for r in shingles(docs, distinct=True)
        .groupBy("doc_id").agg(F.collect_set("shingle").alias("s")).collect()
    }
    for r in got:
        if r["band"] == 0:
            assert set(r["sh"]) == want_sh[r["doc_id"]], r["doc_id"]


def test_stream_flags_match_iterated_incremental_dedup(spark, tmp_path):
    _write_batches(tmp_path / "src1", (SEED, BATCH1, BATCH2))
    rows = _run_stream(
        spark, tmp_path / "src1", tmp_path / "ckpt1", "neardup_rows_eq",
        watermark="30 days",
    )
    got = _flags_dict(flags_from_rows(rows))

    base = spark.createDataFrame(
        [(d, t) for d, t, _ in SEED], "doc_id long, text string")
    b1 = spark.createDataFrame(
        [(d, t) for d, t, _ in BATCH1], "doc_id long, text string")
    b2 = spark.createDataFrame(
        [(d, t) for d, t, _ in BATCH2], "doc_id long, text string")
    want = {d: (0, 0, 0, 1) for d, _, _ in SEED}
    want.update(_flags_dict(incremental_dedup(base, b1)))
    accepted1 = b1.join(
        spark.createDataFrame([(100,), (103,)], "doc_id long"), "doc_id")
    want.update(_flags_dict(incremental_dedup(base.unionByName(accepted1), b2)))

    assert got == want
    # spot-pin the semantics the scenario exercises
    assert got[101] == (1, 0, 1, 0)   # exact (and near) dup of seed
    assert got[102][2] == 1 and got[102][3] == 0
    assert got[104] == (0, 1, 0, 0)   # same-trigger exact dup, near NOT set
    assert got[200][0] == 1 and got[200][3] == 0  # cross-trigger exact
    assert got[202][2] == 1 and got[202][3] == 0  # LATE near-dup still flagged
    assert got[201] == (0, 0, 0, 1)


def test_ttl_readmission_after_watermark(spark, tmp_path):
    """A duplicate arriving after its original aged out of the horizon
    is re-admitted — the dedup_stream bounded-state trade, inherited."""
    batches = (
        [(1, _text("ttlA"), "2020-01-01T00:00:00")],
        [(2, _text("unrelated"), "2020-01-01T06:00:00")],  # advances watermark
        [(3, _text("ttlA"), "2020-01-01T06:01:00")],       # copy of evicted 1
    )
    _write_batches(tmp_path / "src2", batches)
    rows = _run_stream(
        spark, tmp_path / "src2", tmp_path / "ckpt2", "neardup_rows_ttl",
        watermark="1 hour",
    )
    got = _flags_dict(flags_from_rows(rows))
    # watermark when trigger 3 runs = 06:00 - 1h = 05:00 > doc 1's 00:00
    assert got[1] == (0, 0, 0, 1)
    assert got[3] == (0, 0, 0, 1), "evicted original must not flag the copy"

    # same layout with a horizon that KEEPS doc 1 -> copy is flagged
    _write_batches(tmp_path / "src3", batches)
    rows = _run_stream(
        spark, tmp_path / "src3", tmp_path / "ckpt3", "neardup_rows_ttl2",
        watermark="30 days",
    )
    got = _flags_dict(flags_from_rows(rows))
    assert got[3][0] == 1 and got[3][2] == 1 and got[3][3] == 0


def test_checkpoint_restart_state_carries(spark, tmp_path):
    """Stopping after two triggers and restarting on the same
    checkpoint must (a) not re-emit earlier flag rows and (b) restore
    bucket state, so a post-restart duplicate is still flagged against
    a pre-restart original — end-state identical to the uninterrupted
    run."""
    src = tmp_path / "src5"
    out_dir = str(tmp_path / "out5")

    def run_to_parquet():
        stream = (
            spark.readStream
            .schema("doc_id long, text string, event_time timestamp")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = (
            near_dup_flags_stream(stream, watermark="30 days")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt5"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    _write_batches(src, (SEED, BATCH1))
    run_to_parquet()
    first = spark.read.parquet(out_dir)
    n_first = first.count()
    assert n_first > 0
    first_rows = sorted(map(tuple, first.collect()))

    # new file arrives AFTER the first query fully stopped
    p = src / "batch2.json"
    p.write_text("\n".join(
        json.dumps({"doc_id": d, "text": t, "event_time": ts})
        for d, t, ts in BATCH2))
    os.utime(p, (1_700_000_900, 1_700_000_900))

    run_to_parquet()
    all_rows = spark.read.parquet(out_dir)
    # no re-emission: earlier rows appear exactly once, additions are
    # the new trigger's docs only
    new_rows = sorted(map(tuple, all_rows.collect()))
    for r in first_rows:
        assert new_rows.count(r) == first_rows.count(r)
    assert {r[0] for r in new_rows} - {r[0] for r in first_rows} \
        == {d for d, _, _ in BATCH2}

    got = _flags_dict(flags_from_rows(all_rows))
    # one-shot uninterrupted run over the same three triggers
    _write_batches(tmp_path / "src6", (SEED, BATCH1, BATCH2))
    rows_ref = _run_stream(
        spark, tmp_path / "src6", tmp_path / "ckpt6", "neardup_rows_rs3",
        watermark="30 days",
    )
    want = _flags_dict(flags_from_rows(rows_ref))
    assert got == want
    # the decisive recovery checks: post-restart docs matched against
    # PRE-restart state (200/202 dup of trigger-1's doc 100)
    assert got[200][0] == 1 and got[202][2] == 1


def test_state_capped_per_bucket(spark, tmp_path):
    """State never holds more than max_members per (band, bucket) —
    read back from the state store itself."""
    batches = (
        [(i, _text("capfam"), f"2020-01-01T00:{i:02d}:00") for i in range(1, 9)],
    )
    _write_batches(tmp_path / "src4", batches)
    rows = _run_stream(
        spark, tmp_path / "src4", tmp_path / "ckpt4", "neardup_rows_cap",
        watermark="30 days", max_members=3,
    )
    got = _flags_dict(flags_from_rows(rows))
    assert got[1] == (0, 0, 0, 1)
    assert all(got[i][1] == 1 for i in range(2, 9))  # same-trigger exact dups

    # applyInPandasWithState wraps the user state struct as
    # value.groupState (alongside value.timeoutTimestamp)
    state = (
        spark.read.format("statestore")
        .load(str(tmp_path / "ckpt4"))
        .select("key.band", "key.bucket",
                F.size("value.groupState.ids").alias("n"))
        .collect()
    )
    assert state, "state store read returned nothing"
    assert all(r["n"] <= 3 for r in state), state
    # the identical family shares all 4 bands -> 4 capped buckets
    assert sum(1 for r in state if r["n"] == 3) >= 4
