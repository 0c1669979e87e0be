"""MLlib-backed variants of the dedup / similarity / TF-IDF operators.

The hand-rolled operators in dedup.py / similarity.py are the
oracle-checkable exact paths; these are their MLlib twins — the
production path when you want Spark's own LSH estimators and TF-IDF
pipeline (approxSimilarityJoin / approxNearestNeighbors scale the
candidate search without hand-tuned banding). Results are approximate
and seed-dependent, so they are covered by unit tests + rows-only
checks rather than the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trendmachine_spark.extensions.dedup import SHINGLE_K


def _shingle_vectors(docs: DataFrame, text_col: str, id_col: str,
                     num_features: int = 1 << 18):
    """Documents -> sparse shingle-count vectors for MLlib LSH."""
    from pyspark.ml.feature import HashingTF

    words = F.split(F.col(text_col), " ")
    idx = F.when(
        F.size(words) >= SHINGLE_K,
        F.sequence(F.lit(1), F.size(words) - (SHINGLE_K - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, SHINGLE_K)))
    with_grams = docs.select(F.col(id_col), grams.alias("shingles")).filter(
        F.size("shingles") > 0
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=num_features)
    return tf.transform(with_grams)


def minhash_near_dup_ml(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", threshold: float = 0.6,
                        num_hash_tables: int = 8) -> DataFrame:
    """MLlib MinHashLSH approx-similarity self-join.

    Output (id_a < id_b, jaccard_distance <= threshold). The estimator's
    hash functions are seeded, so results are deterministic per seed.
    """
    from pyspark.ml.feature import MinHashLSH

    vecs = _shingle_vectors(docs, text_col, id_col)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, threshold, distCol="jaccard_dist")
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.col("jaccard_dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


def ann_topk_ml(emb: DataFrame, n_queries: int = 10, k: int = 5,
                vec_col: str = "embedding", id_col: str = "vec_id",
                bucket_length: float = 2.0, num_hash_tables: int = 3,
                radius: float = float("inf")) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH top-k as ONE distributed job.

    ``approxSimilarityJoin`` of the query subframe against the corpus
    (candidates = LSH bucket collisions, pruned JVM-side), then a
    per-query window keeps the k nearest. This replaces the round-1
    driver-side loop (collect vectors + one ``approxNearestNeighbors``
    job per query + a unionByName chain): no vectors are collected, the
    plan size is constant in the number of queries, and all queries
    share one shuffle. ``radius`` can pre-prune candidates when a
    meaningful distance bound is known; the default keeps every bucket
    collision, mirroring approxNearestNeighbors' recall.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    vecs = emb.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=42,
    )
    model = lsh.fit(vecs)
    queries = vecs.filter(F.col(id_col) < n_queries)
    joined = (
        model.approxSimilarityJoin(queries, vecs, radius, distCol="euclidean_dist")
        .select(
            F.col(f"datasetA.{id_col}").alias("query_id"),
            F.col(f"datasetB.{id_col}").alias("neighbor_id"),
            "euclidean_dist",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy("euclidean_dist", "neighbor_id")
    return (
        joined.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def tfidf_ml(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             num_features: int = 1 << 16) -> DataFrame:
    """HashingTF + IDF pipeline: (id, tfidf vector) — the MLlib twin of
    text.term_stats (which carries the exact, oracle-checkable parts)."""
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    tok = Tokenizer(inputCol=text_col, outputCol="_words")
    tf = HashingTF(inputCol="_words", outputCol="_tf", numFeatures=num_features)
    words = tok.transform(docs)
    tfed = tf.transform(words)
    idf = IDF(inputCol="_tf", outputCol="tfidf").fit(tfed)
    return idf.transform(tfed).select(id_col, "tfidf")
