"""Units for the round-10 perceptual-hash + audio-feature operators.

The registry oracles (multimodal_image_hash / dedup_image_phash /
dedup_image_phash_near / multimodal_audio_features) already verify the
full chain hash-exact against closed-form SQL on the synthetic corpus;
these units pin the pieces on CRAFTED inputs where each property is
obvious by construction — known-value hashes, the 4-band pigeonhole
guarantee at its boundary, and feature goldens for degenerate clips
(silence, alternating full-swing, DC-only) that the corpus generator
never produces.
"""

from __future__ import annotations

import numpy as np
import pytest

from trendmachine_spark.extensions.codecs import encode_bmp, encode_wav
from trendmachine_spark.extensions.multimodal import (
    _pack_bits64,
    audio_features,
    image_perceptual_hash,
    phash_families,
    phash_near_pairs,
)


def _asset_df(spark, payloads: dict[int, bytes]):
    return spark.createDataFrame(
        [(i, b) for i, b in payloads.items()], "doc_id bigint, payload binary"
    )


def test_pack_bits64_boundaries():
    """Bit p lands in half p//32 at position p%32 — in particular bit 63
    must use bit 31 of the HI half, never the int64 sign bit."""
    assert _pack_bits64([0] * 64) == (0, 0)
    one_at = lambda p: [int(i == p) for i in range(64)]
    assert _pack_bits64(one_at(0)) == (0, 1)
    assert _pack_bits64(one_at(31)) == (0, 1 << 31)
    assert _pack_bits64(one_at(32)) == (1, 0)
    assert _pack_bits64(one_at(63)) == (1 << 31, 0)
    hi, lo = _pack_bits64([1] * 64)
    assert (hi, lo) == (0xFFFFFFFF, 0xFFFFFFFF)  # fits BIGINT, positive


def test_phash_known_values(spark):
    """Constant image -> all-zero aHash and dHash (no pixel exceeds the
    mean, no horizontal step). Pure x-gradient with equal channels ->
    luma is the channel value exactly ((299+587+114)v // 1000 = v),
    dHash all ones EXCEPT bit 0 of each row (the 9-wide nearest grid of
    an 8-wide image duplicates column 0: xs = [0,0,1..7], so the first
    step is 10 < 10 = false -> 0xFE per row), aHash = columns right of
    the mean (gx >= 4 -> 0xF0 per 8-bit row)."""
    const = np.full((8, 8, 3), 100, dtype=np.uint8)
    grad = np.zeros((8, 8, 3), dtype=np.uint8)
    for x in range(8):
        grad[:, x, :] = 10 + 20 * x
    rows = {
        r["doc_id"]: r
        for r in image_perceptual_hash(
            _asset_df(spark, {0: encode_bmp(const), 1: encode_bmp(grad)})
        ).collect()
    }
    assert (rows[0]["ahash_hi"], rows[0]["ahash_lo"]) == (0, 0)
    assert (rows[0]["dhash_hi"], rows[0]["dhash_lo"]) == (0, 0)
    assert (rows[1]["dhash_hi"], rows[1]["dhash_lo"]) == (0xFEFEFEFE, 0xFEFEFEFE)
    assert (rows[1]["ahash_hi"], rows[1]["ahash_lo"]) == (0xF0F0F0F0, 0xF0F0F0F0)
    assert (rows[1]["width"], rows[1]["height"]) == (8, 8)


def test_phash_families_collapse_reencodes(spark):
    """Byte-different encodings of the SAME pixels (and a brightness
    nudge too small to flip any bit) share an aHash family; a different
    image does not."""
    base = np.zeros((8, 8, 3), dtype=np.uint8)
    for x in range(8):
        base[:, x, :] = 10 + 20 * x
    nudged = base + 1  # +1 luma everywhere: bits vs mean unchanged
    other = base[:, ::-1, :].copy()  # mirrored: different structure
    fams = {
        r["doc_id"]: r
        for r in phash_families(
            image_perceptual_hash(
                _asset_df(
                    spark,
                    {1: encode_bmp(base), 2: encode_bmp(nudged), 3: encode_bmp(other)},
                )
            )
        ).collect()
    }
    assert fams[1]["family_key"] == fams[2]["family_key"] == 1
    assert fams[1]["family_size"] == fams[2]["family_size"] == 2
    assert (fams[1]["is_keeper"], fams[2]["is_keeper"]) == (1, 0)
    assert fams[3]["family_size"] == 1 and fams[3]["is_keeper"] == 1


def test_phash_near_pairs_pigeonhole_boundary(spark):
    """Planted hash table: variants of one base hash at hamming 1, 2,
    and 3. The banded join must return exactly the <=2 pairs — the
    hamming-3 variant shares a band with the base (pigeonhole) yet is
    excluded by the verify filter, and hamming BETWEEN variants also
    counts (1-flip vs 2-flip at disjoint positions = 3 -> excluded)."""
    base_hi, base_lo = 0x12345678, 0x0BCDEF01
    table = spark.createDataFrame(
        [
            (0, base_hi, base_lo),
            (1, base_hi, base_lo ^ 0b1),            # ham 1 vs base
            (2, base_hi ^ (1 << 20), base_lo ^ 0b10),  # ham 2 vs base
            (3, base_hi ^ (0b111 << 8), base_lo),   # ham 3 vs base
        ],
        "doc_id bigint, ahash_hi bigint, ahash_lo bigint",
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_pairs(table, 2).collect()
    }
    assert got == {(0, 1): 1, (0, 2): 2}
    with pytest.raises(ValueError):
        phash_near_pairs(table, 4)


def test_audio_features_degenerate_clips(spark):
    """Silence (zeros), alternating full-swing, and DC-only clips have
    features obvious by construction; zero is counted as positive so a
    0->negative edge crosses and 0->positive does not."""
    silence = np.zeros(100, dtype="<i2")
    swing = np.tile(np.array([20000, -20000], dtype="<i2"), 50)
    dc = np.full(80, 1234, dtype="<i2")
    edge = np.array([0, -5, 0, 5], dtype="<i2")  # crossings: 0->-5, -5->0
    rows = {
        r["doc_id"]: r
        for r in audio_features(
            _asset_df(
                spark,
                {
                    0: encode_wav(silence, sample_rate=8000),
                    1: encode_wav(swing, sample_rate=16000),
                    2: encode_wav(dc, sample_rate=8000),
                    3: encode_wav(edge, sample_rate=8000),
                },
            )
        ).collect()
    }
    s = rows[0]
    assert (s["peak_abs"], s["zero_crossings"], s["energy"], s["dc_sum"]) == (0, 0, 0, 0)
    assert (s["n_samples"], s["duration_ms"]) == (100, 12)  # 100000 // 8000
    w = rows[1]
    assert w["zero_crossings"] == 99 and w["peak_abs"] == 20000
    assert w["energy"] == 100 * 20000**2 and w["dc_sum"] == 0
    assert w["sample_rate"] == 16000 and w["duration_ms"] == 6
    d = rows[2]
    assert (d["zero_crossings"], d["dc_sum"]) == (0, 80 * 1234)
    assert rows[3]["zero_crossings"] == 2


def test_audio_fingerprint_monotone_profiles(spark):
    """Crafted energy profiles: amplitude ramping UP -> every
    energy[k] > energy[k+1] is false -> fingerprint 0; ramping DOWN ->
    all 15 delta bits set; and two byte-identical clips + one different
    clip family correctly."""
    import numpy as np

    from trendmachine_spark.extensions.multimodal import (
        audio_fingerprint, family_report)

    up = (np.arange(160, dtype="<i2") * 100)           # quiet -> loud
    down = up[::-1].copy()                             # loud -> quiet
    rows = {
        r["doc_id"]: r
        for r in audio_fingerprint(
            _asset_df(spark, {0: encode_wav(up), 1: encode_wav(down),
                              2: encode_wav(up)})
        ).collect()
    }
    assert rows[0]["fingerprint"] == 0
    assert rows[1]["fingerprint"] == (1 << 15) - 1
    assert rows[2]["fingerprint"] == rows[0]["fingerprint"]
    fams = {
        r["doc_id"]: r
        for r in family_report(
            audio_fingerprint(
                _asset_df(spark, {0: encode_wav(up), 1: encode_wav(down),
                                  2: encode_wav(up)})
            ),
            "fingerprint",
        ).collect()
    }
    assert fams[0]["family_size"] == 2 and fams[2]["family_key"] == 0
    assert fams[1]["family_size"] == 1 and fams[1]["is_keeper"] == 1


def test_video_frame_signature_families(spark):
    """Planted video corpus through the registered builder's shape:
    identical text -> identical ordered frame chain -> one family;
    text shorter than one 32-char frame -> no signature row."""
    import pyspark.sql.functions as F

    from trendmachine_spark.extensions.multimodal import (
        family_report, frame_sample, to_binary_assets)

    long_a = "w" * 40 + "x" * 40 + "y" * 40 + "z" * 40
    docs = spark.createDataFrame(
        [(2, long_a), (5, long_a), (8, "different " * 20), (11, "short")],
        "doc_id bigint, text string",
    )
    frames = frame_sample(
        to_binary_assets(docs).filter(F.col("media_type") == "video/mp4"))
    sig = frames.groupBy("doc_id").agg(
        F.md5(F.concat_ws("|", F.transform(
            F.array_sort(F.collect_list(F.struct("sample_ord", "frame_md5"))),
            lambda x: x.frame_md5))).alias("video_sig"),
        F.count(F.lit(1)).cast("long").alias("n_sampled"))
    fams = {r["doc_id"]: r for r in family_report(sig, "video_sig").collect()}
    assert set(fams) == {2, 5, 8}  # doc 11: no full frame, no row
    assert fams[2]["video_sig"] == fams[5]["video_sig"]
    assert fams[2]["family_size"] == 2 and fams[5]["family_key"] == 2
    assert fams[8]["family_size"] == 1


def test_phash_unknown_magic_loud_gate(spark):
    """r10 advice: a payload whose magic is not PNG/JPEG/BMP must raise
    the clear NotImplementedError codec gate, not fail deep inside the
    BMP parser with a misleading struct error."""
    wav = encode_wav(np.zeros(8, dtype=np.int16), sample_rate=8000)
    df = _asset_df(spark, {1: wav})
    with pytest.raises(Exception) as ei:
        image_perceptual_hash(df).collect()
    assert "no image codec for magic" in str(ei.value)


def test_mjpeg_container_roundtrip_and_gates():
    """r11 MJPEG container: byte-exact frame walk in order; bit-exact
    pixel roundtrip for the exact-roundtrip JPEG construction; loud
    ValueError gates on bad magic, truncated frames, and trailing
    garbage (a mis-framed length must never decode silently)."""
    from trendmachine_spark.extensions.codecs import (
        decode_mjpeg,
        decode_mjpeg_frames,
        encode_jpeg,
        encode_mjpeg,
    )

    frames = []
    for f in range(3):
        blocks = (2 * ((np.arange(2)[None, :] * 5
                        + np.arange(3)[:, None] * 11 + 7 + 17 * f) % 128)
                  ).astype(np.uint8)
        frames.append(encode_jpeg(np.repeat(np.repeat(blocks, 8, 0), 8, 1)))
    clip = encode_mjpeg(frames)
    assert decode_mjpeg_frames(clip) == frames  # byte-exact, in order
    for f, px in enumerate(decode_mjpeg(clip)):
        blocks = (2 * ((np.arange(2)[None, :] * 5
                        + np.arange(3)[:, None] * 11 + 7 + 17 * f) % 128)
                  ).astype(np.uint8)
        assert np.array_equal(px[:, :, 0], np.repeat(np.repeat(blocks, 8, 0), 8, 1))
    with pytest.raises(ValueError, match="bad magic"):
        decode_mjpeg_frames(b"RIFF" + clip[4:])
    with pytest.raises(ValueError, match="truncated MJPEG frame"):
        decode_mjpeg_frames(clip[:-3])
    with pytest.raises(ValueError, match="trailing bytes"):
        decode_mjpeg_frames(clip + b"\x00")
    with pytest.raises(ValueError, match="no SOI"):
        encode_mjpeg([b"not a jpeg"])


def test_video_frame_signature_skips_unsampled_decodes(spark):
    """The scale contract of frame sampling: UNSAMPLED frames are never
    entropy-decoded. Planted clip where frame 1 is valid container
    framing around a corrupt JPEG body — every_n=2 samples frames 0 and
    2 only, so the signature row must come back cleanly; decoding all
    frames must raise."""
    import struct

    from trendmachine_spark.extensions.codecs import encode_jpeg, encode_mjpeg
    from trendmachine_spark.extensions.multimodal import (
        video_decode_real,
        video_frame_signature,
    )

    good = encode_jpeg(np.full((8, 8), 128, dtype=np.uint8))
    corrupt = b"\xff\xd8" + b"\x00" * 20  # SOI magic, garbage body
    clip = encode_mjpeg([good, corrupt, good])
    df = _asset_df(spark, {1: clip})
    rows = video_frame_signature(df, every_n=2, max_frames=8).collect()
    assert [(r["frame_idx"], r["sample_ord"]) for r in rows] == [(0, 0), (2, 1)]
    assert rows[0]["frame_md5"] == rows[1]["frame_md5"]  # same pixels
    with pytest.raises(Exception):  # decode-all path hits the corrupt frame
        video_decode_real(df).collect()


def test_video_decode_real_known_values(spark):
    """Hand-computed decode metadata for one synthesized clip: content
    key c=2 -> 5 frames; per-frame dims/pixel sums from the generator
    formulas; wsum applies the (1 + f%7) frame weights in order."""
    from trendmachine_spark.extensions.multimodal import (
        _video_frame_params,
        _video_synth_one,
        video_decode_real,
    )

    clip = _video_synth_one()(2)
    [row] = video_decode_real(_asset_df(spark, {2: clip})).collect()
    exp_tot, exp_wsum = 0, 0
    for f in range(5):
        bw, bh, k = _video_frame_params(2, f)
        bx = np.arange(bw)[None, :]
        by = np.arange(bh)[:, None]
        blocks = 2 * ((bx * 5 + by * 11 + k) % 128)
        exp_tot += 64 * bw * bh
        exp_wsum += (1 + f % 7) * 64 * int(blocks.sum())
    assert (row["n_frames"], row["total_pixels"], row["wsum"]) == (5, exp_tot, exp_wsum)


def test_video_dedup_families_from_content_keys(spark):
    """doc_ids congruent mod VIDEO_CONTENT_MOD synthesize byte-identical
    clips -> one signature family with a min-id keeper; a different
    content key lands in a different family."""
    from trendmachine_spark.extensions.multimodal import (
        VIDEO_CONTENT_MOD,
        family_report,
        synthetic_video_assets,
        video_frame_signature,
    )
    from pyspark.sql import functions as F

    m = VIDEO_CONTENT_MOD
    docs = spark.createDataFrame(
        [(2, "x"), (2 + 3 * m, "x"), (5, "x")], "doc_id bigint, text string")
    frames = video_frame_signature(synthetic_video_assets(docs))
    sig = frames.groupBy("doc_id").agg(
        F.md5(F.concat_ws("|", F.transform(
            F.array_sort(F.collect_list(F.struct("sample_ord", "frame_md5"))),
            lambda x: x.frame_md5))).alias("video_sig"),
        F.count(F.lit(1)).cast("long").alias("n_sampled"))
    fams = {r["doc_id"]: r for r in family_report(sig, "video_sig").collect()}
    assert set(fams) == {2, 2 + 3 * m, 5}
    assert fams[2]["video_sig"] == fams[2 + 3 * m]["video_sig"]
    assert fams[2]["family_size"] == 2 and fams[2 + 3 * m]["family_key"] == 2
    assert fams[5]["family_size"] == 1 and fams[5]["is_keeper"] == 1


def test_video_near_pairs_shared_frame_semantics(spark):
    """Hand-planted frame tables: pairs require >= min_shared common
    fingerprints; counts ride along; ordering id_a < id_b."""
    from trendmachine_spark.extensions.multimodal import video_near_pairs

    frames = spark.createDataFrame(
        [(1, 0, 0, "A"), (1, 2, 1, "B"), (1, 4, 2, "C"),
         (2, 0, 0, "A"), (2, 2, 1, "B"),              # shares A,B with 1
         (3, 0, 0, "A"),                              # shares only A
         (4, 0, 0, "X"), (4, 2, 1, "Y")],             # disjoint
        "doc_id bigint, frame_idx int, sample_ord int, frame_md5 string",
    )
    rows = {(r["id_a"], r["id_b"]): r
            for r in video_near_pairs(frames, min_shared=2).collect()}
    assert set(rows) == {(1, 2)}
    r = rows[(1, 2)]
    assert (r["n_shared"], r["n_a"], r["n_b"]) == (2, 3, 2)
    # min_shared=1 admits the single-frame overlap pairs
    rows1 = {(r["id_a"], r["id_b"])
             for r in video_near_pairs(frames, min_shared=1).collect()}
    assert rows1 == {(1, 2), (1, 3), (2, 3)}


def test_video_near_pairs_frame_freq_guard(spark):
    """Planted-skew row budget (round 12, the r11 verdict's mandate):
    one boilerplate fingerprint in 30% of clips must not square the
    self-join's hot key — the guard drops it from candidate postings
    and from n_shared, while n_a/n_b stay full sample counts."""
    from pyspark.sql import functions as F

    from trendmachine_spark.extensions.multimodal import (
        _guarded_frame_postings,
        video_near_pairs,
    )

    n_clips, hot_share = 40, 12  # 30% of clips carry the HOT frame
    rows = []
    for i in range(n_clips):
        ord_ = 0
        if i < hot_share:
            rows.append((i, 0, ord_, "HOT"))
            ord_ += 1
        # discriminative content: clips (2j, 2j+1) are true near-dups
        j = i // 2
        if i < 4:
            # first two hot pairs: (0,1) shares P0a+P0b (+HOT);
            # (2,3) shares ONLY P1a (+HOT) -> qualifies only via HOT
            tags = [f"P{j}a", f"P{j}b"] if i < 2 else [f"P{j}a", f"Q{i}"]
        else:
            tags = [f"P{j}a", f"P{j}b"]
        for t in tags:
            rows.append((i, 2 * ord_, ord_, t))
            ord_ += 1
    frames = spark.createDataFrame(
        rows, "doc_id bigint, frame_idx int, sample_ord int, frame_md5 string")

    cap = 5
    # --- row budget: the guarded posting table loses exactly the HOT
    # postings, and the candidate self-join's row count is bounded by
    # sum C(freq,2) over surviving fingerprints — strictly below the
    # C(12,2)=66 rows the unguarded hot key alone would emit
    guarded = _guarded_frame_postings(frames, cap)
    assert guarded.count() == len(rows) - hot_share
    a = guarded.select(F.col("doc_id").alias("id_a"), "frame_md5")
    b = guarded.select(F.col("doc_id").alias("id_b"), "frame_md5")
    join_rows = a.join(b, "frame_md5").filter(F.col("id_a") < F.col("id_b")).count()
    freqs = [r["n"] for r in guarded.groupBy("frame_md5")
             .agg(F.countDistinct("doc_id").alias("n")).collect()]
    assert max(freqs) <= cap
    budget = sum(n * (n - 1) // 2 for n in freqs)
    assert join_rows == budget
    assert join_rows < hot_share * (hot_share - 1) // 2

    # --- semantics: guarded result keeps true near-dup pairs with
    # HOT excluded from n_shared; the boilerplate-only pair (2,3) is
    # out; full sample counts are untouched
    got = {(r["id_a"], r["id_b"]): r
           for r in video_near_pairs(frames, min_shared=2,
                                     max_frame_freq=cap).collect()}
    expect = {(2 * j, 2 * j + 1) for j in range(n_clips // 2)} - {(2, 3)}
    assert set(got) == expect
    assert got[(0, 1)]["n_shared"] == 2          # HOT not counted
    assert got[(0, 1)]["n_a"] == 3               # full sample count
    # unguarded (max_frame_freq=None) restores the historical form:
    # HOT counts, so (0,1) has 3 shared and (2,3) qualifies via HOT
    legacy = {(r["id_a"], r["id_b"]): r["n_shared"]
              for r in video_near_pairs(frames, min_shared=2,
                                        max_frame_freq=None).collect()}
    assert legacy[(0, 1)] == 3 and legacy[(2, 3)] == 2


def test_frame_md5_serialization_matches_reference_form():
    """_frame_md5's table-lookup bytes join (r14 optimization round)
    must stay byte-identical to the reference serialization the DuckDB
    oracle reconstructs: md5 of the comma-joined decimal pixel values.
    Exercises the full uint8 range including multi-digit boundaries."""
    import hashlib

    from trendmachine_spark.extensions.multimodal import _frame_md5

    rng = np.random.RandomState(7)
    cases = [
        rng.randint(0, 256, size=(24, 32)).astype(np.uint8),
        np.array([[0, 9, 10, 99, 100, 255]], dtype=np.uint8),
        np.zeros((1, 1), dtype=np.uint8),
        np.full((8, 8), 255, dtype=np.uint8),
    ]
    for gray in cases:
        ref = hashlib.md5(
            ",".join(str(int(v)) for v in gray.ravel()).encode()
        ).hexdigest()
        assert _frame_md5(gray) == ref
