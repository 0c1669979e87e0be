"""BPE merge-training semantics (text._bpe_loop and friends).

The oracle-parity CI already proves Spark == DuckDB for the registered
queries; these units pin the TRUE-BPE semantics both engines must
share — in particular the greedy left-to-right merge of back-to-back
pair occurrences, which is exactly the case the double-space separator
trick exists for (a naive single-space replace drops every second
occurrence because the match consumes the shared delimiter).
"""

import pytest

from trendmachine_spark.extensions.text import (
    bpe_encode_docs,
    bpe_segmented_vocab,
    bpe_train_merges,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_merges_are_greedy_left_to_right(spark):
    # "banana banana banana aaaa": merge 1 is (a, n) with count 6 —
    # BOTH overlapping-adjacent occurrences inside each banana merge
    docs = _docs(spark, ["banana banana banana aaaa"])
    got = [tuple(r) for r in bpe_train_merges(docs, merges=3)
           .orderBy("step").collect()]
    assert got == [
        (1, "a", "n", 6, "an"),
        # (a,</w>) = 3 bananas + 1 aaaa beats the 3-count pairs
        (2, "a", "</w>", 4, "a</w>"),
        # tie at 3 between (an,a</w>), (an,an), (b,an): left then right
        (3, "an", "a</w>", 3, "ana</w>"),
    ]
    seg = {r["word"]: (r["segments"], r["n_tokens"])
           for r in bpe_segmented_vocab(docs, merges=3).collect()}
    assert seg["banana"] == ("b an ana</w>", 3)
    # merge (a, a) never fired, so aaaa stays fully fragmented
    assert seg["aaaa"] == ("a a a a</w>", 4)


def test_repeated_pair_merges_pairwise(spark):
    # [a a a a] under merge (a, a) must become [aa aa], not [aa a a]:
    # the greedy scan pairs elements 0-1 then 2-3 (Sennrich learn_bpe)
    docs = _docs(spark, ["aaaa aaaa b"])
    merges = bpe_train_merges(docs, merges=2).orderBy("step").collect()
    assert (merges[0]["left_sym"], merges[0]["right_sym"]) == ("a", "a")
    assert merges[0]["pair_count"] == 6  # 3 overlapping per word x 2
    seg = {r["word"]: r["segments"]
           for r in bpe_segmented_vocab(docs, merges=1).collect()}
    assert seg["aaaa"] == "aa aa </w>"


def test_merged_symbols_chain_across_steps(spark):
    # second merge may consume the first's minted symbol
    docs = _docs(spark, ["low low low lower"])
    merges = bpe_train_merges(docs, merges=3).orderBy("step").collect()
    minted = [r["merged"] for r in merges]
    assert minted[0] in ("lo", "ow")  # tie-break decides
    # some later merge must chain on an earlier minted symbol
    assert any(
        len(r["left_sym"]) > 1 or len(r["right_sym"]) > 1 for r in merges[1:]
    )
    # pair counts never increase with step (greedy argmax property)
    counts = [r["pair_count"] for r in merges]
    assert counts == sorted(counts, reverse=True)


def test_fully_merged_word_contributes_no_pairs(spark):
    # After merge 1 (a, </w>) the word 'a' collapses to ONE symbol;
    # step 2 must skip it (unguarded sequence(1, size-1) would count
    # DOWN to [1, 0] and crash element_at — advisor repro, round 8)
    docs = _docs(spark, ["a a a a b"])
    got = [tuple(r) for r in bpe_train_merges(docs, merges=2)
           .orderBy("step").collect()]
    assert got == [
        (1, "a", "</w>", 4, "a</w>"),
        (2, "b", "</w>", 1, "b</w>"),
    ]
    seg = {r["word"]: (r["segments"], r["n_tokens"])
           for r in bpe_segmented_vocab(docs, merges=2).collect()}
    assert seg["a"] == ("a</w>", 1)
    assert seg["b"] == ("b</w>", 1)


def test_encode_docs_hand_counts(spark):
    # Same word multiset as test_merges_are_greedy_left_to_right
    # (banana x3, aaaa x1) so the trained segmentation is known:
    # banana -> [b, an, ana</w>] (3 tokens), aaaa -> [a,a,a,a</w>] (4)
    docs = _docs(spark, ["banana aaaa", "banana banana"])
    got = {r["doc_id"]: (r["n_words"], r["n_tokens"])
           for r in bpe_encode_docs(docs, merges=3).collect()}
    assert got == {0: (2, 7), 1: (2, 6)}


def test_encode_token_additivity(spark):
    # Corpus-total encoded tokens == sum over the FULL vocab of
    # wc * per-word token count: the encode is exactly the trained
    # segmentation applied word-by-word, nothing dropped or re-split
    docs = _docs(spark, ["low low lower aaaa", "banana low b aaaa low"])
    total = sum(r["n_tokens"]
                for r in bpe_encode_docs(docs, merges=4).collect())
    vocab = bpe_segmented_vocab(docs, merges=4, top_k=10_000).collect()
    assert total == sum(r["wc"] * r["n_tokens"] for r in vocab)
    n_words = sum(r["n_words"]
                  for r in bpe_encode_docs(docs, merges=4).collect())
    assert n_words == sum(r["wc"] for r in vocab)


def test_empty_corpus_yields_no_merges(spark):
    docs = _docs(spark, []).filter("doc_id IS NOT NULL")
    assert bpe_train_merges(docs, merges=2).count() == 0
    assert bpe_segmented_vocab(docs, merges=2).count() == 0


def test_invalid_merges_raises(spark):
    docs = _docs(spark, ["a b"])
    with pytest.raises(ValueError, match="merges"):
        bpe_train_merges(docs, merges=0)


def test_merge_exhaustion_stops_and_keeps_vocab(spark):
    # One word 'ab': step 1 merges (a, b), step 2 merges (ab, </w>),
    # step 3+ has NO pairs left — the loop must STOP with the vocab
    # intact (learn_bpe's natural termination), not cross-join it
    # against an empty top1 and silently empty every consumer
    # (round-8 ADVICE: the size>=2 guard alone turned exhaustion from
    # a crash into zero-row data loss)
    docs = _docs(spark, ["ab ab"])
    got = [tuple(r) for r in bpe_train_merges(docs, merges=8)
           .orderBy("step").collect()]
    assert got == [
        (1, "a", "b", 2, "ab"),
        (2, "ab", "</w>", 2, "ab</w>"),
    ]
    seg = {r["word"]: (r["segments"], r["n_tokens"])
           for r in bpe_segmented_vocab(docs, merges=8).collect()}
    assert seg == {"ab": ("ab</w>", 1)}
    enc = {r["doc_id"]: (r["n_words"], r["n_tokens"])
           for r in bpe_encode_docs(docs, merges=8).collect()}
    assert enc == {0: (2, 2)}
