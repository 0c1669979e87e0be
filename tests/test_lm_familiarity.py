"""Units for the held-out bigram-LM familiarity score."""

from pyspark.sql import functions as F

from trendmachine_spark.extensions.sampling import hash_uniform
from trendmachine_spark.extensions.text import lm_familiarity


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in rows], "doc_id long, text string")


def test_bits_are_exact_floor_log2(spark):
    # find ids landing on each side of the default split
    ids = spark.range(0, 50).select(
        "id", hash_uniform(F.col("id"), "lmfam").alias("u")).collect()
    train_ids = [r["id"] for r in ids if r["u"] >= 0.25]
    held_ids = [r["id"] for r in ids if r["u"] < 0.25]
    assert train_ids and held_ids
    # train: "x y" appears 5 times -> floor(log2(5)) = 2 bits;
    # "y z" appears once -> 1 -> 0 bits
    rows = [(train_ids[0], "x y x y x y x y x y z")]
    # held doc: bigrams (x y)=2bits, (y q)=unseen 0, (q x)=unseen 0
    rows.append((held_ids[0], "x y q x"))
    out = lm_familiarity(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["doc_id"] == held_ids[0]
    assert r["n_bigrams"] == 3
    assert r["familiarity_bits"] == 2
    assert abs(r["avg_bits"] - 2 / 3) < 1e-15


def test_unseen_equals_count_one(spark):
    # a bigram seen once in train contributes exactly 0 bits — same as
    # unseen (the documented +0-bit smoothing floor)
    ids = spark.range(0, 50).select(
        "id", hash_uniform(F.col("id"), "lmfam").alias("u")).collect()
    t = [r["id"] for r in ids if r["u"] >= 0.25][0]
    h = [r["id"] for r in ids if r["u"] < 0.25][0]
    out = lm_familiarity(
        _docs(spark, [(t, "a b"), (h, "a b zz qq")])).collect()[0]
    assert out["familiarity_bits"] == 0
    assert out["avg_bits"] == 0.0


def test_short_held_docs_emit_no_row(spark):
    ids = spark.range(0, 50).select(
        "id", hash_uniform(F.col("id"), "lmfam").alias("u")).collect()
    h = [r["id"] for r in ids if r["u"] < 0.25][0]
    assert lm_familiarity(_docs(spark, [(h, "single")])).count() == 0
