"""MLlib-backed variant operators (approximate production paths)."""

from __future__ import annotations

import pytest

from trendmachine_spark.extensions.ml import ann_topk_ml, minhash_near_dup_ml, tfidf_ml


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog today again"),
        (1, "the quick brown fox jumps over the lazy dog today again"),
        (2, "the quick brown fox jumps over the lazy cat today again"),
        (3, "totally unrelated words about distributed query engines here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_ml_finds_duplicates(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard_dist"]
             for r in minhash_near_dup_ml(docs, threshold=0.8).collect()}
    assert (0, 1) in pairs
    assert pairs[(0, 1)] == pytest.approx(0.0)
    assert (0, 3) not in pairs


def test_ann_ml_runs(spark):
    rows = [(i, [float(i % 5), float(i % 3), 1.0]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ann_topk_ml(emb, n_queries=2, k=3).collect()
    assert len(out) > 0
    for r in out:
        assert r["query_id"] != r["neighbor_id"]
        assert r["euclidean_dist"] >= 0.0


def test_tfidf_ml_shapes(spark, docs):
    out = tfidf_ml(docs).collect()
    assert len(out) == 4
    # identical docs -> identical tfidf vectors; different docs differ
    v = {r["doc_id"]: r["tfidf"] for r in out}
    assert v[0] == v[1]
    assert v[0] != v[3]
