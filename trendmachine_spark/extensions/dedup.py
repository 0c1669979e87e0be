"""Deduplication operators over the ``documents`` table.

Driver-mandated extension operators (SURVEY.md §2.6), designed for
100 TB: every path is a pure shuffle-on-key DataFrame plan — no
driver-side state, no UDFs.

* exact_dedup      — content-hash group-by (one shuffle on the hash).
* minhash_near_dup — MinHash signature -> banded LSH bucket join. The
  signature is computed entirely with array expressions (one md5 per
  gram + a single fold) so signature computation is a ZERO-SHUFFLE
  narrow map; only the bucket self-join shuffles. The hash family is
  *md5(shingle) xor mask_j*, which is engine-portable (same values in
  DuckDB), unlike murmur3.
* ngram_jaccard    — exact Jaccard over word-shingle sets for pairs
  sharing at least one non-ubiquitous shingle (inverted-index join; the
  standard exact near-dup verifier downstream of LSH candidates).
* simhash          — SimHash fingerprint, also a zero-shuffle narrow map.

At 100 TB: the inverted-index join must drop ubiquitous shingles
(stopword shingles) or a single hot key produces a quadratic join —
``ngram_jaccard`` guards with ``max_shingle_freq`` (ON by default;
see MAX_SHINGLE_FREQ). The guard prunes candidate *pairs* only: the
jaccard value itself is always computed against the full shingle sets,
so reported similarities stay exact — recall is what's traded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: signature layout: NUM_HASHES minhashes split into BANDS bands
NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS
SHINGLE_K = 3
#: default doc-frequency cap for the inverted-index join (skew guard).
#: A shingle present in more than this many docs is dropped from
#: candidate generation — at local test SFs nothing exceeds it (max
#: observed doc-freq is 25 at sf0.1), so results equal the unguarded
#: run; at corpus scale it is what keeps the self-join from going
#: quadratic on stopword shingles.
MAX_SHINGLE_FREQ = 100


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


def gram_array(text_col: str = "text", k: int = SHINGLE_K):
    """Column: array of word k-grams in document order (may repeat)."""
    words = F.split(F.col(text_col), " ")
    # NB: sequence(1, n) with n < 1 counts DOWN ([1, 0]) — guard short docs
    idx = F.when(
        F.size(words) >= k,
        F.sequence(F.lit(1), F.size(words) - (k - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, k)))


def shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             k: int = SHINGLE_K, distinct: bool = True) -> DataFrame:
    """Word k-gram shingles per document (id, shingle).

    ``distinct=True`` dedupes *within* the gram array (array_distinct —
    still a narrow map, NOT a shuffle) which is exactly set semantics
    since grams can only repeat within one document.
    """
    grams = gram_array(text_col, k)
    if distinct:
        grams = F.array_distinct(grams)
    return docs.select(F.col(id_col), F.explode(grams).alias("shingle"))


def _hash_mask(j: int) -> int:
    import hashlib

    return int(hashlib.md5(f"seed:{j}".encode()).hexdigest()[:15], 16)


#: deterministic 60-bit xor masks, one per hash function — engine-portable
HASH_MASKS = tuple(_hash_mask(j) for j in range(NUM_HASHES))

#: fold initializer — above any 60-bit hash value, below Long.MAX
_MIN_INIT = 1 << 62


def minhash_signature_array(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", num_hashes: int = NUM_HASHES,
                            k: int = SHINGLE_K) -> DataFrame:
    """(id, sig: array<long>) — minhash signatures as a zero-shuffle map.

    Each gram is hashed ONCE (md5 hex -> 60-bit int); the j-th hash is
    ``h XOR mask_j`` with deterministic md5-derived masks, so the family
    costs one md5 + n xors per gram. All n minima are folded in a
    SINGLE ``aggregate`` pass over the gram-hash array (zip_with against
    the mask array), so the whole signature is one narrow projection —
    no explode, no shuffle, no duplicate-elimination needed (min is
    duplicate-insensitive, the round-1 ``.distinct()`` here was a wasted
    full shuffle of the exploded shingle table).

    The signature STAYS one array column: extracting n scalar columns by
    rebuilding the fold expression per column would evaluate the fold n
    times (higher-order functions are interpreted and not CSE'd — this
    exact mistake cost 4x in an early round-2 cut).

    Engine-portable: DuckDB computes the identical ints (hex cast + xor).
    Docs with no k-gram (fewer than k words) produce no row, matching
    the exploded formulation.
    """
    masks = F.array(*[F.lit(m).cast("long") for m in HASH_MASKS[:num_hashes]])
    harr = F.transform(
        gram_array(text_col, k),
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
    )
    sig = F.aggregate(
        F.col("_harr"),
        F.array_repeat(F.lit(_MIN_INIT).cast("long"), num_hashes),
        lambda acc, v: F.zip_with(acc, masks, lambda a, m: F.least(a, v.bitwiseXOR(m))),
    )
    return (
        docs.select(F.col(id_col), harr.alias("_harr"))
        .filter(F.size("_harr") > 0)
        .select(F.col(id_col), sig.alias("sig"))
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = NUM_HASHES,
                       k: int = SHINGLE_K) -> DataFrame:
    """Wide (id, mh0..mh{n-1}) view of minhash_signature_array.

    The getItem projections reference the materialized ``sig`` column —
    cheap extraction, the fold itself runs once."""
    arr = minhash_signature_array(docs, text_col, id_col, num_hashes, k)
    return arr.select(
        F.col(id_col), *[F.col("sig")[j].alias(f"mh{j}") for j in range(num_hashes)]
    )


def lsh_band_buckets(signatures: DataFrame, id_col: str = "doc_id",
                     bands: int = BANDS, rows_per_band: int = ROWS_PER_BAND) -> DataFrame:
    """(id, band, bucket) from the ARRAY signature table.

    bucket = md5 of the band's '|'-joined minhash run — computed as one
    array expression over ``sig`` then posexploded, so the reshape is a
    narrow generator (no shuffle) and ``sig`` is read, not recomputed.
    """
    buckets = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(
            F.concat_ws(
                "|",
                F.transform(
                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                    lambda v: v.cast("string"),
                ),
            )
        ),
    )
    return signatures.select(
        F.col(id_col), F.posexplode(buckets).alias("band", "bucket")
    )


def minhash_near_dup(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) sharing an LSH band.

    Scale: signatures are a narrow map (see minhash_signature_array);
    the self-join is on (band, bucket) — co-partitioned by the join key,
    bucket cardinality ~n_docs so no broadcast needed; hot buckets are
    bounded by band width.
    """
    buckets = lsh_band_buckets(minhash_signature_array(docs, text_col, id_col), id_col)
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
                  max_shingle_freq: int | None = MAX_SHINGLE_FREQ) -> DataFrame:
    """Exact Jaccard similarity for pairs sharing >= 1 surviving shingle.

    jaccard = |A ∩ B| / |A ∪ B| — a ratio of exact integers, so the
    value is bit-identical across engines. ``max_shingle_freq`` (ON by
    default) drops shingles appearing in more than that many docs from
    candidate generation — the skew guard that stops a stopword shingle
    from producing a quadratic hot join key at corpus scale. Set sizes
    |A| and |B| are always the FULL distinct-shingle counts (computed
    as array sizes — narrow, no extra shuffle/join), so the jaccard of
    every reported pair is exact; only pairs sharing *solely* hot
    shingles are missed.

    Shuffle budget: shingle-frequency agg + freq semi-join + self-join
    (all hash-partitioned on ``shingle`` — exchange-reusable) and the
    final pair groupBy. Set sizes ride along through the join instead
    of a separate sizes aggregation + two joins.
    """
    sharr = F.array_distinct(gram_array(text_col, k=SHINGLE_K))
    # size() is computed in a projection BEFORE the explode: evaluating
    # it alongside the generator would force every exploded row to carry
    # the whole shingle array through the downstream shuffles.
    sh = (
        docs.select(F.col(id_col), sharr.alias("_sharr"))
        .select(F.col(id_col), F.size("_sharr").alias("n_shingles"), "_sharr")
        .select(F.col(id_col), "n_shingles", F.explode("_sharr").alias("shingle"))
    )
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_f"))
        sh = sh.join(
            freq.filter(F.col("_f") <= max_shingle_freq).select("shingle"), "shingle"
        )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"), "shingle")
    out = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.min("n_a").alias("_na"),
            F.min("n_b").alias("_nb"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("n_common")),
        )
        .select("id_a", "id_b", "n_common", "jaccard")
    )
    if min_jaccard > 0.0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out


def _hex_bit(h, p):
    """Bit ``3 - p%4`` of hex digit ``p//4`` of md5-hex string ``h``."""
    v = F.conv(F.substring(h, (p / 4).cast("int") + 1, 1), 16, 10).cast("int")
    return (v / F.pow(F.lit(2.0), (F.lit(3) - p % 4).cast("double"))).cast("int") % 2


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32) -> DataFrame:
    """SimHash fingerprint from md5-derived word-hash bits (bits <= 62).

    For each bit position p, the word's bit is extracted from its md5
    hex digit; the fingerprint bit is the sign of the vote sum over all
    word occurrences. Computed entirely with array folds — one md5 per
    word, zero shuffles (the round-1 formulation exploded bits×words
    rows through two shuffles). Uses only md5 + string ops + integer
    arithmetic, so it is engine-portable.
    """
    words = F.split(F.col(text_col), " ")
    hashed = docs.select(
        F.col(id_col), F.transform(words, F.md5).alias("_h")
    )

    def vote(p):
        return F.aggregate(
            F.col("_h"), F.lit(0), lambda acc, h: acc + _hex_bit(h, p) * 2 - 1
        )

    fp = F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + F.when(vote(p) > 0, F.pow(F.lit(2.0), p).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    return hashed.select(F.col(id_col), fp.alias("simhash"))


#: round-1 name — kept as an alias; the fingerprint width is the
#: ``bits`` argument (default 32), not 64.
simhash64 = simhash
