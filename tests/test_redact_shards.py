"""Units for redact_pii (crafted docs — the driver corpus contains no
PII spans, so oracle parity alone would only prove the identity path)
and the training_shards manifest invariants."""

from pyspark.sql import functions as F

from trendmachine_spark.extensions.packing import training_shards
from trendmachine_spark.extensions.text import redact_pii


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


def test_redacts_every_pattern_type(spark):
    text = ("mail bob@example.com or b.o-b_1@sub.domain.org, "
            "host 10.0.255.3, call 555-123-4567, ssn 123-45-6789 end")
    out = redact_pii(_docs(spark, [text])).collect()[0]
    assert out["text_redacted"] == (
        "mail <EMAIL> or <EMAIL>, host <IP>, call <PHONE>, ssn <SSN> end")
    assert out["n_redactions"] == 5


def test_counts_are_pre_replacement(spark):
    # an SSN-like span must not be double-counted by the phone pattern,
    # and placeholders must never feed a later pattern
    out = redact_pii(_docs(spark, ["123-45-6789 and 123-456-7890"]))\
        .collect()[0]
    assert out["text_redacted"] == "<SSN> and <PHONE>"
    assert out["n_redactions"] == 2


def test_overlapping_patterns_count_on_original_text(spark):
    # 'a@1.2.3.4.com' matches BOTH the email and the IPv4 pattern on
    # the original text; only the email placeholder lands (fixed
    # order), so n_redactions (2) exceeds the placeholders inserted
    # (1) — the documented contract, mirrored by the oracle
    out = redact_pii(_docs(spark, ["ping a@1.2.3.4.com now"])).collect()[0]
    assert out["text_redacted"] == "ping <EMAIL> now"
    assert out["n_redactions"] == 2


def test_clean_text_passes_through(spark):
    out = redact_pii(_docs(spark, ["no pii here 1.2 v3"])).collect()[0]
    assert out["text_redacted"] == "no pii here 1.2 v3"
    assert out["n_redactions"] == 0


def test_planted_counts_match_closed_form(spark):
    # plant_pii guarantees n_redactions = 3 + (id%3==0) + 2*(id%5==0):
    # email + IP + phone always; SSN every 3rd; the email/IP overlap
    # span every 5th (counts 2, inserts 1 placeholder)
    from trendmachine_spark.extensions.text import plant_pii

    docs = _docs(spark, [f"clean body {i}" for i in range(30)])
    out = {r["doc_id"]: r for r in
           redact_pii(plant_pii(docs)).collect()}
    for i in range(30):
        expect = 3 + (i % 3 == 0) + 2 * (i % 5 == 0)
        assert out[i]["n_redactions"] == expect, i
    # every placeholder type lands in the redacted text of doc 0
    t = out[0]["text_redacted"]
    for ph in ("<EMAIL>", "<IP>", "<PHONE>", "<SSN>"):
        assert ph in t, (ph, t)
    # the overlap span yields ONE placeholder (email wins the text)
    assert t.count("<EMAIL>") == 2 and "1.2.3.4" not in t


def test_shards_partition_the_corpus(spark):
    docs = _docs(spark, [f"w{i} x y" for i in range(200)])
    m = training_shards(docs, n_shards=8).collect()
    assert sum(r["n_docs"] for r in m) == 200
    assert {r["shard"] for r in m} <= set(range(8))
    assert all(r["min_doc_id"] <= r["max_doc_id"] for r in m)
    # token/char totals are consistent with the corpus
    assert sum(r["total_tokens"] for r in m) == 200 * 3


def test_shard_assignment_is_partitioning_invariant(spark):
    docs = _docs(spark, [f"t{i}" for i in range(100)])
    a = sorted(map(tuple, training_shards(docs, n_shards=4).collect()))
    b = sorted(map(tuple,
                   training_shards(docs.repartition(13), n_shards=4).collect()))
    assert a == b
