"""Deduplication operators over the ``documents`` table.

Driver-mandated extension operators (SURVEY.md §2.6), designed for
100 TB: every path is a pure shuffle-on-key DataFrame plan — no
driver-side state, no UDFs.

* exact_dedup      — content-hash group-by (one shuffle on the hash).
* minhash_near_dup — shingle -> MinHash signature -> banded LSH
  bucket join. The minhash uses *string-min over md5(shingle + seed)*,
  which is engine-portable (same values in DuckDB), unlike murmur3.
* ngram_jaccard    — exact Jaccard over word-shingle sets for pairs
  sharing at least one shingle (inverted-index join; the standard
  exact near-dup verifier downstream of LSH candidates).

At 100 TB: the shingle explode multiplies rows by ~doc_len; the
inverted-index join must be salted on hot shingles (stopword shingles)
— ngram_jaccard exposes ``max_shingle_freq`` to drop ubiquitous
shingles, which is both the skew guard and standard practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: signature layout: NUM_HASHES minhashes split into BANDS bands
NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS
SHINGLE_K = 3


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content hash: keeper id + duplicate count.

    Scale: single hash-shuffle on the digest; the md5 projection is
    codegen'd JVM-side.
    """
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             k: int = SHINGLE_K) -> DataFrame:
    """Distinct word k-gram shingles per document (id, shingle)."""
    words = F.split(F.col(text_col), " ")
    # NB: sequence(1, n) with n < 1 counts DOWN ([1, 0]) — guard short docs
    idx = F.when(
        F.size(words) >= k,
        F.sequence(F.lit(1), F.size(words) - (k - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, k)))
    return (
        docs.select(F.col(id_col), F.explode(grams).alias("shingle"))
        .distinct()
    )


def _hash_mask(j: int) -> int:
    import hashlib

    return int(hashlib.md5(f"seed:{j}".encode()).hexdigest()[:15], 16)


#: deterministic 60-bit xor masks, one per hash function — engine-portable
HASH_MASKS = tuple(_hash_mask(j) for j in range(NUM_HASHES))


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id",
                       num_hashes: int = NUM_HASHES) -> DataFrame:
    """(id, mh0..mh{n-1}) — minhash over the xor-mask hash family.

    Each shingle is hashed ONCE (md5 hex -> 60-bit int); the j-th hash
    is ``h XOR mask_j`` with deterministic md5-derived masks, so the
    family costs one md5 + n xors per shingle instead of n md5s, and
    ``min(bigint)`` is HashAggregate-able (map-side partial combine).
    Engine-portable: DuckDB computes the identical ints (hex cast + xor).
    All seeds are parallel aggregates in ONE groupBy — a single shuffle
    on the doc id.
    """
    h = F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("long")
    with_h = sh.withColumn("_h", h)
    aggs = [
        F.min(F.expr(f"_h ^ {HASH_MASKS[j]}L")).alias(f"mh{j}")
        for j in range(num_hashes)
    ]
    return with_h.groupBy(id_col).agg(*aggs)


def lsh_band_buckets(signatures: DataFrame, id_col: str = "doc_id",
                     bands: int = BANDS, rows_per_band: int = ROWS_PER_BAND) -> DataFrame:
    """(id, band, bucket) — bucket = md5 of the band's minhash run.

    Narrow reshape of the wide signature table (stack, no shuffle)."""
    stack_expr = "stack({}, {}) as (band, bucket)".format(
        bands,
        ", ".join(
            "{b}L, md5(concat_ws('|', {cols}))".format(
                b=b,
                cols=", ".join(
                    f"mh{b * rows_per_band + r}" for r in range(rows_per_band)
                ),
            )
            for b in range(bands)
        ),
    )
    return signatures.selectExpr(id_col, stack_expr)


def minhash_near_dup(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) sharing an LSH band.

    Scale: the self-join is on (band, bucket) — co-partitioned by the
    join key, bucket cardinality ~n_docs so no broadcast needed; hot
    buckets are bounded by band width.
    """
    buckets = lsh_band_buckets(minhash_signatures(shingles(docs, text_col, id_col), id_col), id_col)
    a = buckets.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = buckets.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  min_jaccard: float = 0.0,
                  max_shingle_freq: int | None = None) -> DataFrame:
    """Exact Jaccard similarity for pairs sharing >= 1 shingle.

    jaccard = |A ∩ B| / |A ∪ B| — a ratio of exact integers, so the
    value is bit-identical across engines. ``max_shingle_freq`` drops
    shingles appearing in more than that many docs (skew guard: a
    stopword shingle would otherwise produce a quadratic hot key).
    """
    sh = shingles(docs, text_col, id_col)
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_f"))
        sh = sh.join(freq.filter(F.col("_f") <= max_shingle_freq).select("shingle"), "shingle")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    out = (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .select("id_a", "id_b", "n_common", "jaccard")
    )
    if min_jaccard > 0.0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              bits: int = 32) -> DataFrame:
    """SimHash fingerprint from md5-derived word-hash bits.

    For each of ``bits`` positions p, the word's bit is extracted from
    its md5 hex digit; the fingerprint bit is the sign of the
    vote sum over all word occurrences. Uses only md5 + string ops +
    integer arithmetic, so it is engine-portable.
    """
    words = docs.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w"))
    hashed = words.withColumn("h", F.md5(F.col("w")))
    pos = hashed.select(
        id_col, "h",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("p"),
    )
    # hex digit at p//4 (1-based substr), bit (3 - p%4) of its value
    bit = pos.selectExpr(
        id_col,
        "p",
        f"(CAST(conv(substring(h, CAST(p / 4 AS INT) + 1, 1), 16, 10) AS INT)"
        f" DIV CAST(pow(2, 3 - p % 4) AS INT)) % 2 AS bit",
    )
    votes = bit.withColumn("v", F.col("bit") * 2 - 1).groupBy(id_col, "p").agg(
        F.sum("v").alias("vote")
    )
    fp = votes.withColumn(
        "fpbit", F.when(F.col("vote") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
    ).groupBy(id_col).agg(
        F.sum(F.expr("fpbit * CAST(pow(2, p) AS BIGINT)")).alias("simhash")
    )
    return fp
