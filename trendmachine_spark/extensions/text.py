"""Text-analysis operators over the ``documents`` table.

Driver-mandated extension operators (SURVEY.md §2.6): token counting,
quality scoring, language-ID heuristic, document fingerprinting. All
pure Catalyst expressions (codegen'd, pushdown-friendly); ratios are
int/int divisions so values are engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: BPE-ish token pattern: letter runs, digit runs, single non-alnum
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

#: tiny per-language stopword marker sets for the n-gram-free heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "los"),
    "de": ("der", "und", "das"),
    "fr": ("le", "les", "des"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def text_profile(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token/quality metrics.

    n_words (whitespace), n_tokens (TOKEN_RE matches), n_chars,
    n_distinct_words, avg_word_len, stopword_ratio, distinct_ratio —
    the standard cheap quality signals for corpus filtering.
    """
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    # sum(len(word)) == len(text) - (n_words - 1), exactly: splitting on a
    # single character PARTITIONS the string, so word lengths plus the
    # n_words-1 separators recompose it (holds for empty tokens too).
    # Replaces an F.aggregate(transform(...)) fold — higher-order
    # functions are interpreted per element, never code-generated.
    total_word_len = (F.length(text_col) - n_words + F.lit(1)).cast("long")
    # stopword occurrences as full space-delimited tokens: lookaround
    # regex over the space-padded text == filter(words, isin(STOPWORDS))
    # (lookarounds consume nothing, so adjacent stopwords sharing one
    # separator both match; Java regex backtracks the alternation, so a
    # prefix alternative can't shadow a longer token). Same reason: the
    # per-word interpreted isin() scan was the query's hot spot.
    stop_re = "(?<= )(?:" + "|".join(STOPWORDS) + ")(?= )"
    stop = F.regexp_count(
        F.concat(F.lit(" "), F.col(text_col), F.lit(" ")), F.lit(stop_re)
    )
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout

    docs = rebalance_for_fanout(docs.select(F.col(id_col), F.col(text_col)))
    return docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.regexp_count(F.col(text_col), F.lit(TOKEN_RE)).cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        n_distinct.cast("long").alias("n_distinct_words"),
        (total_word_len.cast("double") / n_words).alias("avg_word_len"),
        (stop.cast("double") / n_words).alias("stopword_ratio"),
        (n_distinct.cast("double") / n_words).alias("distinct_ratio"),
    )


def quality_flags(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  min_words: int = 20, min_distinct_ratio: float = 0.2) -> DataFrame:
    """Boolean keep/drop gates in the style of corpus quality filters."""
    p = text_profile(docs, text_col, id_col)
    return p.select(
        id_col,
        (F.col("n_words") >= min_words).cast("long").alias("passes_length"),
        (F.col("distinct_ratio") >= min_distinct_ratio).cast("long").alias("passes_diversity"),
        ((F.col("n_words") >= min_words) & (F.col("distinct_ratio") >= min_distinct_ratio))
        .cast("long").alias("keep"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language heuristic: argmax of per-language marker hits
    (ties and zero scores -> 'und'). Deterministic CASE logic."""
    words = F.split(F.col(text_col), " ")

    def member_of(markers):
        # NB: no extra lambda params — Spark binds a Column to every one
        return lambda w: w.isin(*markers)

    scores = {
        lang: F.size(F.filter(words, member_of(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout

    docs = rebalance_for_fanout(docs.select(F.col(id_col), F.col(text_col)))
    d = docs.select(F.col(id_col), *[v.alias(f"s_{k}") for k, v in scores.items()])
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{k}") for k in langs])
    n_best = sum(
        [(F.col(f"s_{k}") == best).cast("int") for k in langs], F.lit(0)
    )
    pred = F.when((best == 0) | (n_best > 1), F.lit("und"))
    for k in langs:  # first language in declaration order wins exact ties? no — ties -> und
        pred = pred.when(F.col(f"s_{k}") == best, F.lit(k))
    return d.select(
        id_col, *[f"s_{k}" for k in langs], pred.alias("lang_pred")
    )


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: full-content md5, normalized md5 (lowercase,
    squeezed spaces), and min/max shingle hash (rolling-window style)."""
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout

    norm = F.regexp_replace(F.lower(F.col(text_col)), " +", " ")
    words = F.split(F.col(text_col), " ")
    # NB: sequence(1, n) with n < 1 counts DOWN — guard short docs
    idx = F.when(
        F.size(words) >= 5, F.sequence(F.lit(1), F.size(words) - 4)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice(words, i, 5))))
    docs = rebalance_for_fanout(docs.select(F.col(id_col), F.col(text_col)))
    return docs.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("content_md5"),
        F.md5(norm).alias("normalized_md5"),
        F.array_min(grams).alias("min_shingle_md5"),
        F.array_max(grams).alias("max_shingle_md5"),
    )


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition metrics for corpus quality filtering.

    Per doc: the most frequent word bigram (ties broken lexicographically),
    its occurrence count, the fraction of characters it covers
    (``count * len(bigram) / n_chars``), and the fraction of 5-gram
    occurrences whose gram repeats within the doc. High values flag
    boilerplate/spam (navigation bars, keyword stuffing) that
    length/diversity gates miss. All ratios are exact-integer divisions,
    so values are bit-identical across engines.

    Docs with fewer than 5 words (no 5-gram) produce no row — the
    length gate in :func:`quality_flags` already rejects those.

    Scale: two explode+groupBy passes (bigrams, 5-grams), both
    map-side combined on (id, gram); the per-doc argmax is a window
    over the (small) per-doc gram-count table. No UDFs.
    """
    from trendmachine_spark.extensions.dedup import shingles

    # codegen explode form (shingles distinct=False), NOT
    # explode(gram_array(...)): the HOF transform gram builder is
    # evaluated interpreted; swapping it for this form took
    # lm_familiarity 52.7 -> 4.4 s end-to-end on the x10 corpus
    # (SCALE.md round 8) — identical rows either way
    bg = (shingles(docs, text_col, id_col, k=2, distinct=False)
          .withColumnRenamed("shingle", "g"))
    bc = bg.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(id_col).orderBy(F.col("c").desc(), "g")
    topb = (
        bc.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, F.col("g").alias("top_bigram"), F.col("c").alias("top_bigram_count"))
    )
    g5 = (shingles(docs, text_col, id_col, k=5, distinct=False)
          .withColumnRenamed("shingle", "g"))
    c5 = g5.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    d5 = c5.groupBy(id_col).agg(
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias("_dup"),
        F.sum("c").alias("_tot"),
    )
    chars = docs.select(F.col(id_col), F.length(text_col).alias("_nc"))
    return (
        chars.join(topb, id_col).join(d5, id_col)
        .select(
            id_col, "top_bigram",
            F.col("top_bigram_count").cast("long").alias("top_bigram_count"),
            (
                (F.col("top_bigram_count") * F.length("top_bigram")).cast("double")
                / F.col("_nc")
            ).alias("top_bigram_char_frac"),
            (F.col("_dup").cast("double") / F.col("_tot")).alias("dup_5gram_frac"),
        )
    )


#: PII detection patterns — simple enough to behave identically under
#: Java regex (Spark) and RE2 (DuckDB): literal classes, bounded reps,
#: no backrefs/lookaround.
PII_PATTERNS = {
    "n_emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "n_ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "n_phones": r"[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "n_ssn_like": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def pii_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII pattern counts — the redaction/filter axis every
    public-web training corpus applies before shipping.

    Non-overlapping match counts per pattern plus a ``has_pii`` flag.
    Patterns are deliberately RE2-safe (no lookaround/backrefs) so
    Spark and DuckDB count identically. Counts, not spans: the filter
    decision needs magnitudes; actual redaction would be a follow-up
    ``regexp_replace`` with the same patterns.

    Scale: one narrow codegen'd projection — no shuffle, no UDF; the
    regex runs JVM-side per row.
    """
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout

    counts = [
        F.regexp_count(F.col(text_col), F.lit(p)).cast("long").alias(name)
        for name, p in PII_PATTERNS.items()
    ]
    out = rebalance_for_fanout(
        docs.select(F.col(id_col), F.col(text_col))
    ).select(F.col(id_col), *counts)
    flag = None
    for name in PII_PATTERNS:
        c = F.col(name) > 0
        flag = c if flag is None else (flag | c)
    return out.withColumn("has_pii", flag.cast("long"))


#: redaction placeholder per PII pattern, applied in this fixed order.
#: The patterns CAN overlap on pathological spans (e.g. 'a@1.2.3.4.com'
#: matches both the email and the IPv4 pattern); the fixed order keeps
#: both engines byte-identical, with earlier patterns winning the text.
PII_REDACTIONS = (
    ("n_emails", "<EMAIL>"),
    ("n_ipv4", "<IP>"),
    ("n_phones", "<PHONE>"),
    ("n_ssn_like", "<SSN>"),
)


def redact_pii(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Destructive PII redaction — the transform whose decision inputs
    :func:`pii_stats` reports. Each pattern's non-overlapping matches
    are replaced with a typed placeholder, in a fixed pattern order.
    ``n_redactions`` is the PER-PATTERN MATCH TOTAL on the ORIGINAL
    text (computed before any replacement, so a placeholder can never
    feed a later pattern). When two patterns overlap on the same span
    (e.g. an IPv4-shaped e-mail domain), only the earlier pattern's
    placeholder lands in ``text_redacted``, so ``n_redactions`` can
    EXCEED the number of placeholders inserted — the oracle mirrors
    the same original-text counting, so parity holds by construction.

    Patterns are the RE2-safe set shared with :func:`pii_stats`; both
    engines' regexp_replace share leftmost non-overlapping scan
    semantics (the oracle passes the explicit 'g' flag — DuckDB
    replaces only the first match without it).

    Scale: one narrow codegen projection, no shuffle, no UDF.
    """
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout

    # 8 regex passes per row is fan-out-heavy map work: spread it over
    # the session's cores when the scan under-splits (monolithic
    # compressed text parquet — see rebalance_for_fanout)
    docs = rebalance_for_fanout(docs.select(F.col(id_col), F.col(text_col)))
    redacted = F.col(text_col)
    total = F.lit(0)
    for name, placeholder in PII_REDACTIONS:
        pat = PII_PATTERNS[name]
        total = total + F.regexp_count(F.col(text_col), F.lit(pat))
        redacted = F.regexp_replace(redacted, pat, placeholder)
    return docs.select(
        F.col(id_col),
        redacted.alias("text_redacted"),
        total.cast("long").alias("n_redactions"),
    )


def plant_pii(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Deterministic PII-planting fixture for end-to-end redaction
    evidence (round-8 verdict stretch: the synthetic corpus holds no
    PII spans, so :func:`redact_pii`'s oracle exercised ZERO
    replacements — crafted-doc units carried the semantics alone).
    Derives a PII-bearing twin of the corpus IN BOTH ENGINES from
    nothing but ``doc_id`` + ``text``, so an oracled query can drive
    every pattern's replace path on driver-checked data:

    * every doc: one e-mail, one IPv4, one phone (digits varied by
      doc_id so placeholders land at distinct spans);
    * every 3rd doc: an SSN-shaped span;
    * every 5th doc: the documented email/IP overlap pathology
      ``a@1.2.3.4.com`` (counts 2, yields 1 placeholder — the fixed
      pattern-order semantics, now exercised end-to-end, not only in
      units).

    Expected counts are closed-form in doc_id:
    ``3 + (doc_id % 3 == 0) + 2 * (doc_id % 5 == 0)`` — pinned by
    unit test and implied by the oracle parity.

    Scale: a zero-exchange codegen projection, exactly like the
    redaction itself.
    """
    i = F.col(id_col)

    def s(expr):
        return expr.cast("string")

    planted = F.concat(
        F.lit("contact user"), s(i),
        F.lit("@mail"), s(i % 7), F.lit(".example.com "),
        F.col(text_col),
        F.lit(" ip 10."), s(i % 256), F.lit(".0."), s(i % 100),
        F.lit(" tel 555-"), F.lpad(s(i % 1000), 3, "0"),
        F.lit("-"), F.lpad(s(i % 10000), 4, "0"),
        F.when((i % 3) == 0,
               F.concat(F.lit(" ssn 123-45-"),
                        F.lpad(s(i % 10000), 4, "0"))).otherwise(F.lit("")),
        F.when((i % 5) == 0,
               F.lit(" fwd a@1.2.3.4.com")).otherwise(F.lit("")),
    )
    return docs.select(F.col(id_col), planted.alias(text_col))


def term_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-(doc, term) frequency + corpus document frequency (TF-IDF
    inputs). tf is a ratio of exact integers; idf itself (ln(N/df)) is
    left to the caller because libm log() is not bit-identical across
    engines — the oracle checks the exact parts."""
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout

    docs = rebalance_for_fanout(docs.select(F.col(id_col), F.col(text_col)))
    words = docs.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term"))
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("n_term"))
    doc_len = words.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_doc"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    return (
        tf.join(doc_len, id_col)
        .join(df_, "term")
        .select(
            id_col, "term", "n_term", "doc_freq",
            (F.col("n_term").cast("double") / F.col("n_doc")).alias("tf"),
        )
    )


#: deterministic linear quality model: (feature expression name, weight).
#: Stands in for the fasttext/DSIR-style learned scorer every corpus
#: pipeline plugs in here — the Spark plumbing (zero-exchange scoring,
#: threshold gate, per-source selection downstream) is the real part;
#: swap the weights for a trained model's without touching the plan.
QUALITY_WEIGHTS = {
    "bias": -1.0,
    "length_sat": 2.0,        # saturating length credit, n_words/(n_words+100)
    "distinct_ratio": 1.5,    # vocabulary diversity
    "stopword_ratio": 1.0,    # English-like function-word density
    "avg_word_len_pen": -0.1, # penalty per char of mean word length above 4
}


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", threshold: float = 0.5,
                  keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Linear quality score over the :func:`text_profile` features.

    score = bias + w·features, all exact double arithmetic (ratios of
    exact integers, one fixed evaluation order) — engine-portable, no
    libm. ``keep_quality`` thresholds it. Zero-key-exchange projection
    (under-split scans get the conditional fan-out rebalance):
    composes with the corpus funnel on the same scan; ``keep_cols``
    carries extra columns through so downstream per-group selection
    needs no self-join back to the corpus.
    """
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout

    score = quality_score_col(text_col)
    # full-row rebalance (keep_cols ride along); conditional no-op at
    # real multi-split scale — see rebalance_for_fanout
    return rebalance_for_fanout(docs).select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        score.alias("quality"),
        (score >= threshold).cast("long").alias("keep_quality"),
    )


def quality_score_col(text_col: str = "text"):
    """The linear quality score as a reusable Column expression, so
    compositions (e.g. :func:`corpus_card`) can evaluate it inline on
    their own scan instead of joining :func:`quality_score`'s output.

    Feature expressions are shared with :func:`text_profile` (same
    exact-integer constructions; see its comments for the length
    identity and the lookaround stopword regex).
    """
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words)
    avg_word_len = (F.length(text_col) - n_words + F.lit(1)).cast("double") / n_words
    stop_re = "(?<= )(?:" + "|".join(STOPWORDS) + ")(?= )"
    stopword_ratio = (
        F.regexp_count(
            F.concat(F.lit(" "), F.col(text_col), F.lit(" ")), F.lit(stop_re)
        ).cast("double") / n_words
    )
    distinct_ratio = F.size(F.array_distinct(words)).cast("double") / n_words
    w = QUALITY_WEIGHTS
    length_sat = n_words.cast("double") / (n_words + F.lit(100))
    return (
        F.lit(w["bias"])
        + F.lit(w["length_sat"]) * length_sat
        + F.lit(w["distinct_ratio"]) * distinct_ratio
        + F.lit(w["stopword_ratio"]) * stopword_ratio
        + F.lit(w["avg_word_len_pen"]) * F.greatest(avg_word_len - 4.0, F.lit(0.0))
    )


#: feature quantization for the trained quality score: ratios are
#: scaled by this and floor-divided (exact integer arithmetic in both
#: engines). 1000 keeps every training aggregate and 3x3 Cramer
#: product inside int64/hugeint at the bench scale factors (the
#: solve-magnitude analysis is in fit_quality_logit's docstring).
QUALITY_FEAT_SCALE = 1000


def _quality_logit_features(docs: DataFrame, text_col: str, id_col: str):
    """(id, f1, f2, y) — integer features + label for the trained
    quality score. f1 = floor(S*n_distinct/n_words) (lexical
    diversity), f2 = floor(S*n_words/(n_words+100)) (length
    saturation); y is quality_flags' keep gate evaluated in EXACT
    integer form (5*n_distinct >= n_words ⟺ distinct_ratio >= 0.2 —
    no float boundary), so label and features are engine-portable
    integers."""
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout

    words = F.split(F.col(text_col), " ")
    nw = F.size(words).cast("long")
    nd = F.size(F.array_distinct(words)).cast("long")
    docs = rebalance_for_fanout(docs.select(F.col(id_col), F.col(text_col)))
    return docs.select(
        F.col(id_col),
        F.expr(f"({QUALITY_FEAT_SCALE} * size(array_distinct(split({text_col}, ' ')))) "
               f"DIV size(split({text_col}, ' '))").cast("long").alias("f1"),
        F.expr(f"({QUALITY_FEAT_SCALE} * size(split({text_col}, ' '))) "
               f"DIV (size(split({text_col}, ' ')) + 100)").cast("long").alias("f2"),
        ((nw >= 20) & (nd * 5 >= nw)).cast("long").alias("y"),
    )


def fit_quality_logit(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> dict:
    """FIT the trained quality score: one Fisher-scoring (IRLS) step
    for logistic regression from w = 0, distilling the rule-based
    quality_flags gate into a smooth margin over (bias, diversity,
    length) — the train half of the fasttext/DSIR-style classifier
    slot, trained on the corpus's own labels (round-6 VERDICT #8).

    Why exactly ONE step: at w = 0 every p_i = 1/2 EXACTLY, so the
    IRLS update w1 = 2·(XᵀX)⁻¹ Xᵀ(2y−1) involves no sigmoid — every
    aggregate is an exact int64 sum (map-combined, one scalar row
    collected: 9 numbers, the clusters.py bounded-collect precedent)
    and the 3x3 Cramer solve runs in exact Python big-ints. Further
    IRLS steps need exp(), whose libm ulp differences already make
    sigmoid_preview rows-only — so the hash-exact oracle mirrors
    iteration 1 verbatim (hugeint sums + the same cofactor formulas),
    and iteration 1 is the shipped default. Magnitudes: f <= S = 1e3,
    so Σf² <= n·1e6 and det ~ O((n·1e6)³) — inside DuckDB's 128-bit
    hugeint for n up to ~3e6 (×20 bench = 1e6 ✓); Python's side is
    arbitrary-precision either way, and at true cluster scale the
    oracle comparison is moot (use the collected exact sums with a
    float solve).

    The final weights are doubles computed as
    2.0 * double(numerator) / double(denominator) — cast-then-divide,
    textually mirrored in the oracle so the IEEE ops match. Returns
    {"w0","w1","w2","det","n"} (weights all 0.0 when det == 0 — a
    degenerate corpus, e.g. identical docs).
    """
    feats = _quality_logit_features(docs, text_col, id_col)
    z = (F.lit(2) * F.col("y") - F.lit(1))
    row = feats.agg(
        F.count(F.lit(1)).alias("m00"),
        F.sum("f1").alias("m01"),
        F.sum("f2").alias("m02"),
        F.sum(F.col("f1") * F.col("f1")).alias("m11"),
        F.sum(F.col("f1") * F.col("f2")).alias("m12"),
        F.sum(F.col("f2") * F.col("f2")).alias("m22"),
        F.sum(z).alias("v0"),
        F.sum(F.col("f1") * z).alias("v1"),
        F.sum(F.col("f2") * z).alias("v2"),
    ).collect()[0]
    m00, m01, m02 = int(row["m00"]), int(row["m01"]), int(row["m02"])
    m11, m12, m22 = int(row["m11"]), int(row["m12"]), int(row["m22"])
    v0, v1, v2 = int(row["v0"]), int(row["v1"]), int(row["v2"])
    # symmetric 3x3 cofactors (exact big-int; same formulas in the SQL)
    a00 = m11 * m22 - m12 * m12
    a01 = m12 * m02 - m01 * m22
    a02 = m01 * m12 - m11 * m02
    a11 = m00 * m22 - m02 * m02
    a12 = m01 * m02 - m00 * m12
    a22 = m00 * m11 - m01 * m01
    det = m00 * a00 + m01 * a01 + m02 * a02
    if det == 0:
        return {"w0": 0.0, "w1": 0.0, "w2": 0.0, "det": 0, "n": m00}
    n0 = a00 * v0 + a01 * v1 + a02 * v2
    n1 = a01 * v0 + a11 * v1 + a12 * v2
    n2 = a02 * v0 + a12 * v1 + a22 * v2
    # cast-then-divide, exactly as the oracle writes it
    return {
        "w0": 2.0 * float(n0) / float(det),
        "w1": 2.0 * float(n1) / float(det),
        "w2": 2.0 * float(n2) / float(det),
        "det": det,
        "n": m00,
    }


def quality_score_trained(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          weights: dict | None = None) -> DataFrame:
    """APPLY the trained quality score: (doc_id, f1, f2, label_keep,
    score_trained, predicted_keep) — score = w0 + w1·f1 + w2·f2 (the
    logistic margin; >0 ⟺ predicted p > 1/2), predicted_keep its sign.

    ``weights=None`` fits on ``docs`` itself (train==apply, the
    registry/oracle form — EAGER: fitting collects one scalar row at
    construction). Pass a :func:`fit_quality_logit` result to apply a
    model trained on one corpus to another — the train/apply split
    (fit on a held-out labeled slice, score the full corpus). The
    apply side is a zero-exchange codegen projection either way.
    """
    w = weights or fit_quality_logit(docs, text_col, id_col)
    feats = _quality_logit_features(docs, text_col, id_col)
    score = (F.lit(float(w["w0"]))
             + F.lit(float(w["w1"])) * F.col("f1")
             + F.lit(float(w["w2"])) * F.col("f2"))
    return feats.select(
        F.col(id_col),
        "f1",
        "f2",
        F.col("y").alias("label_keep"),
        score.alias("score_trained"),
        (score > 0).cast("long").alias("predicted_keep"),
    )


def bpe_pair_stats(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", eow: str = "</w>") -> DataFrame:
    """Adjacent-symbol pair counts over the word-frequency table — the
    inner statistic of BPE tokenizer training (Sennrich et al. 2016,
    the counting step each merge iteration repeats; this is iteration 0
    where every symbol is a single character plus an end-of-word mark).

    For each distinct word with corpus frequency ``wc``, every adjacent
    character pair contributes ``wc``, and the final character pairs
    with ``eow`` (so merges can learn word-final units). The argmax row
    of the output is the first BPE merge; re-running after applying a
    merge table is the full training loop.

    Output: (left_sym, right_sym, pair_count), exact integers.

    Shape: two map-combined hash aggregations — corpus -> word counts
    (the explode's agg absorbs Zipf skew map-side: "the" partials
    combine per partition before the shuffle), then distinct-words ->
    pair counts. The per-character explode runs over the DISTINCT word
    table, which is vocabulary-sized, not corpus-sized — at 100 TB the
    second stage's input is a few hundred million short rows regardless
    of corpus size. All codegen; no joins, no windows.
    """
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout

    words = rebalance_for_fanout(docs.select(F.col(text_col))).select(
        F.explode(F.split(F.col(text_col), " ")).alias("word"))
    wc = (
        words.filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    n = F.length("word")
    exploded = wc.select(
        "word", "wc", F.explode(F.sequence(F.lit(1), n)).alias("_i")
    )
    left = F.col("word").substr(F.col("_i"), F.lit(1))
    right = F.when(
        F.col("_i") < F.length("word"),
        F.col("word").substr(F.col("_i") + 1, F.lit(1)),
    ).otherwise(F.lit(eow))
    return (
        exploded.select(
            left.alias("left_sym"), right.alias("right_sym"), "wc"
        )
        .groupBy("left_sym", "right_sym")
        .agg(F.sum("wc").alias("pair_count"))
    )


def _bpe_loop(docs: DataFrame, merges: int, text_col: str, eow: str):
    """The BPE training loop (Sennrich et al. 2016, learn_bpe): word
    frequency table -> ``merges`` greedy merge iterations. Returns
    ``(vocab, steps)``: the final vocab DataFrame ``(word, wc, syms)``
    and the list of one-row DataFrames ``(step, left_sym, right_sym,
    pair_count)`` — the merge each iteration chose, already
    materialized (they are the broadcast build sides of the loop's own
    joins, so reading them back costs nothing).

    Symbol strings use a TWO-space separator with the merge executed as
    a plain ``replace`` over the single-space-wrapped string. The
    double separator is what makes plain find/replace reproduce the
    reference implementation's zero-width-boundary regex exactly: each
    match consumes one space of each boundary, the replacement restores
    it, so back-to-back occurrences ("b a n a n a" under merge (a, n))
    all merge in one left-to-right pass. A lookbehind regex is not an
    option because the oracle engine's regex dialect (RE2) has none —
    and both engines' ``replace`` share left-to-right non-overlapping
    scan semantics, which is precisely the reference's greedy order.

    SCALE: the corpus is touched ONCE (the word-count shuffle, Zipf
    skew absorbed by map-side combine). Every iteration after that
    runs over the DISTINCT-word table — vocabulary-sized, not
    corpus-sized — as one map-combined pair count, a
    TakeOrderedAndProject top-1, and a codegen replace map. Each
    iteration is materialized (``dedup._materialize`` — eager
    localCheckpoint by default, ``set_materialization("persist")`` for
    the lineage-retaining mode) so plans stay flat instead of doubling
    per iteration (the round-5 self-join probe: Spark re-executes
    shared subtrees once per consumer, and each iteration consumes its
    predecessor twice — once under the pair count, once under the
    merge map).
    """
    from trendmachine_spark.extensions.dedup import _materialize

    if merges < 1:
        raise ValueError(f"merges must be >= 1, got {merges}")
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout

    words = rebalance_for_fanout(docs.select(F.col(text_col))).select(
        F.explode(F.split(F.col(text_col), " ")).alias("word"))
    wc = (
        words.filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    vocab = _materialize(wc.select(
        "word", "wc",
        F.concat(F.array_join(chars, "  "), F.lit("  " + eow)).alias("syms"),
    ))
    steps = []
    for step in range(1, merges + 1):
        arr = F.split(F.col("syms"), "  ")
        # A fully-merged word has one symbol and contributes no pairs;
        # unguarded sequence(1, 0) would count DOWN to [1, 0] and crash
        # element_at (the oracle's generate_series(1, 0) is empty).
        pairs = vocab.filter(F.size(arr) >= 2).select(
            F.col("wc"),
            F.explode(F.sequence(F.lit(1), F.size(arr) - 1)).alias("_j"),
            arr.alias("_l"),
        ).select(
            F.element_at("_l", F.col("_j")).alias("left_sym"),
            F.element_at("_l", F.col("_j") + 1).alias("right_sym"),
            "wc",
        )
        top1 = _materialize(
            pairs.groupBy("left_sym", "right_sym")
            .agg(F.sum("wc").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
            .limit(1)
            .select(F.lit(step).cast("long").alias("step"),
                    "left_sym", "right_sym", "pair_count")
        )
        # Merge exhaustion (every word fully merged -> empty pairs
        # table): STOP, keeping the current vocab — learn_bpe's natural
        # termination. Without this, vocab.crossJoin(empty top1) would
        # silently EMPTY the vocab and every downstream consumer
        # (encode, segmented_vocab) would return zero rows for a
        # nonempty corpus (round-8 ADVICE). The isEmpty probe reads the
        # just-materialized one-row frame — negligible. The oracle's
        # unrolled CTEs share the collapse for the MERGE TABLE (an
        # exhausted step contributes no row in both engines) but not
        # for the final vocab — segmented-vocab/encode parity therefore
        # presumes merges within capacity, which every realistic corpus
        # satisfies (documented precondition, exercised by unit test).
        if top1.isEmpty():
            if not steps:  # degenerate empty corpus: keep consumers'
                steps.append(top1)  # schema via one zero-row frame
            break
        steps.append(top1)
        merged = F.trim(F.replace(
            F.concat(F.lit(" "), F.col("syms"), F.lit(" ")),
            F.concat(F.lit(" "), F.col("left_sym"), F.lit("  "),
                     F.col("right_sym"), F.lit(" ")),
            F.concat(F.lit(" "), F.col("left_sym"), F.col("right_sym"),
                     F.lit(" ")),
        ))
        vocab = _materialize(
            vocab.crossJoin(F.broadcast(
                top1.select("left_sym", "right_sym")))
            .select("word", "wc", merged.alias("syms"))
        )
    return vocab, steps


def bpe_train_merges(docs: DataFrame, merges: int = 8,
                     text_col: str = "text", eow: str = "</w>") -> DataFrame:
    """BPE tokenizer training: the learned merge table — the actual
    iterative loop whose iteration-0 statistic :func:`bpe_pair_stats`
    reports. Each step counts adjacent-symbol pairs over the word
    frequency table, picks the argmax pair under the deterministic
    (pair_count DESC, left_sym, right_sym) total order, and rewrites
    every occurrence greedily left-to-right (see :func:`_bpe_loop`
    for why plain replace over double-spaced symbol strings reproduces
    the reference regex exactly).

    Output: (step, left_sym, right_sym, pair_count, merged) — one row
    per merge, ``merged`` being the new symbol the step mints. All
    exact integers and strings; no floats anywhere.
    """
    _, steps = _bpe_loop(docs, merges, text_col, eow)
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out.select(
        "step", "left_sym", "right_sym", "pair_count",
        F.concat("left_sym", "right_sym").alias("merged"),
    )


def bpe_segmented_vocab(docs: DataFrame, merges: int = 8, top_k: int = 50,
                        text_col: str = "text",
                        eow: str = "</w>") -> DataFrame:
    """The trained tokenizer applied to its own vocabulary: the
    ``top_k`` most frequent words with their segmentation after
    ``merges`` BPE merges — the table a tokenizer-quality review reads
    (which frequent words are still fragmented?).

    Output: (word, wc, segments, n_tokens) under the deterministic
    (wc DESC, word) top-k order; ``segments`` is the single-space
    rendering of the symbol string, ``n_tokens`` its symbol count.

    SCALE: the loop is vocabulary-sized after one corpus shuffle
    (:func:`_bpe_loop`); the top-k is TakeOrderedAndProject.
    """
    vocab, _ = _bpe_loop(docs, merges, text_col, eow)
    arr = F.split(F.col("syms"), "  ")
    return (
        vocab.orderBy(F.col("wc").desc(), "word").limit(top_k)
        .select(
            "word", "wc",
            F.array_join(arr, " ").alias("segments"),
            F.size(arr).cast("long").alias("n_tokens"),
        )
    )


def bpe_encode_docs(docs: DataFrame, merges: int = 8,
                    text_col: str = "text", id_col: str = "doc_id",
                    eow: str = "</w>") -> DataFrame:
    """Apply the trained BPE merge table to the CORPUS — the
    tokens-per-document accounting every training pipeline runs right
    after learning merges (sequence-length budgeting, packing input,
    tokens-per-epoch math). Trains ``merges`` iterations via
    :func:`_bpe_loop`, then joins the final ``(word, syms)`` vocab
    onto the corpus's exploded words and sums symbol counts per doc.

    Output: (doc_id, n_words, n_tokens) for every doc with at least
    one word; ``n_tokens`` is additive over words (unit-pinned:
    corpus total == Σ vocab wc·|syms|), all exact integers.

    SCALE: the merge loop is vocabulary-sized after one corpus shuffle
    (:func:`_bpe_loop`). The encode itself joins corpus words against
    the vocab-sized segment table — localCheckpointed, so its size
    statistics are known and Spark auto-broadcasts it under the
    threshold (no hint: at web scale the full-corpus vocabulary can
    outgrow a broadcast, and the fallback shuffled hash join on the
    word key is the right plan there, with AQE splitting the Zipf-hot
    stopword partitions). The per-doc groupBy is one map-combined
    exchange.
    """
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout

    vocab, _ = _bpe_loop(docs, merges, text_col, eow)
    seg = vocab.select(
        "word",
        F.size(F.split(F.col("syms"), "  ")).cast("long").alias("word_tokens"),
    )
    words = rebalance_for_fanout(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.length("word") > 0)
    return (
        words.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("word_tokens").alias("n_tokens"),
        )
    )


def lm_familiarity(docs: DataFrame, eval_rate: float = 0.25,
                   salt: str = "lmfam", text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Held-out n-gram LM familiarity score — the engine-exact stand-in
    for the CCNet/KenLM perplexity filter (Wenzek et al. 2020): train a
    bigram frequency model on a deterministic hash split of the corpus,
    score the held-out docs by how familiar their bigrams are, rank by
    ``avg_bits`` ascending to surface out-of-distribution/noise docs.

    The per-bigram statistic is ``floor(log2(train_count))`` computed
    EXACTLY as ``length(bin(count)) - 1`` — a string-length identity on
    the binary rendering, not a libm log (whose last-bit behavior at
    power-of-two boundaries is not portable across engines; the same
    reason sigmoid_preview is rows-only). An unseen bigram contributes
    0 familiarity bits — the same value as a train count of 1, which is
    why round 8 added the add-one SMOOTHED surprisal columns: per
    bigram, ``floor(log2(ctx + V)) - floor(log2(c + 1))`` — the
    floor-log2 rendering of the true Laplace estimate
    ``p = (c+1) / (ctx+V)`` (Jurafsky & Martin ch. 3), where ``ctx`` is
    the train count of bigrams starting with the same first word and
    ``V`` the train next-word vocabulary size. Unseen bigrams now cost
    strictly more than count-1 bigrams, and unseen CONTEXTS fall back
    to ``floor(log2(V))`` — the uniform-over-vocab worst case —
    closing the "0 bits == count 1" coarseness the round-7 verdict
    flagged, still in exact integer arithmetic (each floor-log2 term is
    within 1 bit of the real log, and the per-doc sum is an integer, so
    partition order never perturbs the value; ``avg_*`` are one IEEE
    division per doc at the very end).

    Output: (doc_id, n_bigrams, familiarity_bits, avg_bits,
    surprisal_bits, avg_surprisal) for every held-out doc with at least
    one bigram (docs under 2 words have no signal — the quality_flags
    length gate already rejects them). Rank avg_bits ASCENDING or
    avg_surprisal DESCENDING to surface out-of-distribution docs.

    SCALE: train-side counts are one map-combined explode+groupBy
    (Zipf-heavy grams combine map-side); the score join is
    co-partitioned on the gram key (aggregate output is already hashed
    on ``g``, so the join reuses that partitioning — no broadcast
    needed and no corpus-wide hot key: the per-doc sum shuffles on
    doc_id, which is unique); the final agg is map-combined on id. The
    smoothing tables derive from the GRAM-TYPE table, not the corpus:
    ``ctx`` is a |vocab|-sized rollup of ``cnt`` and ``V`` a 1-row
    scalar, so they broadcast below the threshold; past it the
    first-word join key is Zipf-hot (stopword contexts) and AQE's
    skew-join split handles it — a join, not a window, so no
    unsplittable task.
    """
    from trendmachine_spark.extensions.dedup import _materialize, shingles
    from trendmachine_spark.extensions.sampling import train_eval_split

    train, held = train_eval_split(docs, eval_rate, salt, id_col)
    # codegen bigram rows (shingles distinct=False), not the
    # interpreted HOF gram_array — 52.7 -> 4.4 s end-to-end on the
    # x10 corpus (SCALE.md r8).
    # three consumers (score join, ctx rollup, V scalar) — without
    # materialization the corpus-sized explode+agg would re-execute per
    # consumer (no exchange reuse across subtree copies, SCALE.md r5)
    cnt = _materialize(
        shingles(train, text_col, id_col, k=2, distinct=False)
        .groupBy(F.col("shingle").alias("g"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ctx = (
        cnt.groupBy(F.substring_index("g", " ", 1).alias("_w1"))
        .agg(F.sum("c").alias("_ctx"))
    )
    vsz = cnt.agg(
        F.countDistinct(F.substring_index("g", " ", -1)).alias("_v")
    )
    hb = (shingles(held, text_col, id_col, k=2, distinct=False)
          .withColumnRenamed("shingle", "g"))
    bits = F.coalesce(F.length(F.bin("c")) - 1, F.lit(0)).cast("long")
    den_bits = F.length(F.bin(F.coalesce(F.col("_ctx"), F.lit(0)) + F.col("_v"))) - 1
    num_bits = F.length(F.bin(F.coalesce(F.col("c"), F.lit(0)) + 1)) - 1
    return (
        hb.join(cnt, "g", "left")
        .join(ctx, F.substring_index(hb["g"], " ", 1) == F.col("_w1"), "left")
        .crossJoin(F.broadcast(vsz))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(bits).alias("familiarity_bits"),
            F.sum((den_bits - num_bits).cast("long")).alias("surprisal_bits"),
        )
        .select(
            id_col, "n_bigrams", "familiarity_bits",
            (F.col("familiarity_bits").cast("double") / F.col("n_bigrams"))
            .alias("avg_bits"),
            "surprisal_bits",
            (F.col("surprisal_bits").cast("double") / F.col("n_bigrams"))
            .alias("avg_surprisal"),
        )
    )


def vocab_coverage(docs: DataFrame, top_k: int = 1000,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-``top_k`` vocabulary with cumulative corpus coverage — the
    table a tokenizer vocab-size decision reads ("how many word types
    cover 95% of running tokens?").

    Output: (term, cnt, rank, cum_coverage) where rank orders by
    (cnt desc, term) — a deterministic total order — and cum_coverage
    is the running token share covered by ranks 1..rank, denominated
    by the FULL corpus token count (not just the top-k's).

    Shape: one map-combined word count, then a DISTRIBUTED top-k
    (orderBy+limit plans TakeOrderedAndProject — per-partition heaps,
    no global sort); only the ``top_k`` surviving rows pass through the
    unpartitioned rank/cumsum window, so the single-partition window —
    normally a scale-killer — is bounded by the parameter, not the
    data. The corpus total rides in as a broadcast scalar.
    """
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout

    words = rebalance_for_fanout(docs.select(F.col(text_col))).select(
        F.explode(F.split(F.col(text_col), " ")).alias("term"))
    wc = (
        words.filter(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = wc.agg(F.sum("cnt").cast("double").alias("_total"))
    top = wc.orderBy(F.col("cnt").desc(), "term").limit(top_k)
    order = Window.orderBy(F.col("cnt").desc(), "term")
    cum = order.rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.withColumn("rank", F.row_number().over(order).cast("long"))
        .withColumn("_cum", F.sum("cnt").over(cum))
        .crossJoin(F.broadcast(total))
        .select(
            "term", "cnt", "rank",
            (F.col("_cum").cast("double") / F.col("_total")).alias("cum_coverage"),
        )
    )


def chunk_documents(docs: DataFrame, chunk_words: int = 32, overlap: int = 8,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Overlapping fixed-width word chunks — the RAG / long-context
    preprocessing step (split each document into windows of
    ``chunk_words`` words advancing by ``chunk_words - overlap``).

    Chunk i covers words [i*stride, i*stride + chunk_words); the last
    chunk may be partial; a document shorter than one chunk yields
    exactly one chunk. Chunk count is 1 + ceil(max(0, n - chunk_words)
    / stride), all in integer arithmetic so Spark and the DuckDB oracle
    agree exactly.

    Output: (doc_id, chunk_id, start_pos, n_tokens, chunk_text) —
    ``start_pos`` 0-based word offset, ``n_tokens`` the actual words in
    the chunk.

    Shape: ZERO key exchanges — split + exploded index sequence +
    ``element_at`` per offset (codegen, the ``shingles`` idiom;
    trailing NULLs give the partial last chunk for free); an
    under-split scan gets the conditional fan-out rebalance
    (:func:`~trendmachine_spark.extensions.dedup.rebalance_for_fanout`,
    a no-op at real multi-split scale). Row growth is
    the only cost: ~n/stride rows per doc, each a narrow projection.
    At 100 TB this is a pure map stage that pipelines into whatever
    sink or embedding step follows; no state, no skew surface.
    """
    assert 0 <= overlap < chunk_words
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout

    stride = chunk_words - overlap
    words = F.split(F.col(text_col), " ")
    src = rebalance_for_fanout(docs.select(F.col(id_col), F.col(text_col)))
    base = src.select(F.col(id_col), words.alias("_w"), F.size(words).alias("_n"))
    n_extra = F.greatest(F.col("_n") - chunk_words, F.lit(0))
    n_chunks = (F.lit(1) + F.floor((n_extra + (stride - 1)) / stride)).cast("int")
    start = (F.col("chunk_id") * stride).alias("start_pos")
    # try_element_at: the last chunk is partial; ANSI element_at raises
    # out of bounds where concat_ws needs a skippable NULL
    chunk = F.concat_ws(
        " ",
        *[
            F.try_element_at(F.col("_w"), F.col("chunk_id") * stride + j + 1)
            for j in range(chunk_words)
        ],
    )
    return (
        base.select(
            F.col(id_col), "_w", "_n",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("int").alias("chunk_id"),
            start.cast("int").alias("start_pos"),
            F.least(F.lit(chunk_words), F.col("_n") - F.col("chunk_id") * stride)
            .cast("int")
            .alias("n_tokens"),
            chunk.alias("chunk_text"),
        )
    )


def corpus_card(docs: DataFrame, group_col: str = "source",
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Long-form per-source corpus card: the one-table summary a
    dataset release ships — size, length distribution, exact-dup rate,
    and model-quality rate per source, as (source, metric, value) rows.

    Metrics: n_docs, total_tokens, mean_chars, p50_chars, p90_chars
    (exact nearest-rank-lower, the :func:`corpus_stats` rule),
    exact_dup_rate (1 - distinct content hashes / docs), quality_rate
    (fraction passing :func:`quality_score`'s threshold). All exact
    ratios of exact integers, cast to double for the uniform value
    column.

    Shape: every per-doc input (chars, tokens, md5, quality flag) is a
    projection off ONE scan — the quality model rides along as a Column
    expression (:func:`quality_score_col`), NOT a joined DataFrame, so
    there are no joins anywhere; the source-ordered rank window and the
    final per-source aggregate share the group clustering (the
    corpus_stats idiom; the count-distinct adds its usual second agg
    pass on the same keys). The stack to long form is narrow.
    Composing per-expression rather than per-DataFrame is what keeps
    the card single-pass.
    """
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout

    base = rebalance_for_fanout(
        docs.select(F.col(group_col), F.col(id_col), F.col(text_col))
    ).select(
        F.col(group_col).alias("grp"),
        F.col(id_col),
        F.length(text_col).alias("_chars"),
        F.size(F.split(F.col(text_col), " ")).alias("_toks"),
        F.md5(F.col(text_col)).alias("_h"),
        (quality_score_col(text_col) >= 0.5).cast("long").alias("keep_quality"),
    )
    wg = Window.partitionBy("grp")
    w = wg.orderBy("_chars", id_col)
    ranked = (
        base.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wg))
    )
    p50 = F.expr("(_n - 1) div 2 + 1")
    p90 = F.expr("((_n - 1) * 9) div 10 + 1")
    agg = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("_toks").cast("double").alias("total_tokens"),
        (F.sum("_chars").cast("double") / F.count(F.lit(1))).alias("mean_chars"),
        F.max(F.when(F.col("_rn") == p50, F.col("_chars"))).cast("double").alias("p50_chars"),
        F.max(F.when(F.col("_rn") == p90, F.col("_chars"))).cast("double").alias("p90_chars"),
        (
            F.lit(1.0)
            - F.count_distinct(F.col("_h")).cast("double") / F.count(F.lit(1))
        ).alias("exact_dup_rate"),
        (F.sum("keep_quality").cast("double") / F.count(F.lit(1))).alias("quality_rate"),
    )
    metrics = ["n_docs", "total_tokens", "mean_chars", "p50_chars",
               "p90_chars", "exact_dup_rate", "quality_rate"]
    stack = "stack({n}, {args}) as (metric, value)".format(
        n=len(metrics), args=", ".join(f"'{m}', {m}" for m in metrics)
    )
    return agg.selectExpr("grp as " + group_col, stack)


def corpus_stats(docs: DataFrame, group_col: str = "source",
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-group corpus report: doc counts, token/char totals, and
    EXACT engine-portable length quantiles — the summary table every
    corpus card / mixing decision starts from.

    Quantiles use the deterministic nearest-rank-lower rule: sort the
    group by (chars, doc_id), pick the value at 1-based rank
    ``(n-1)*p // 1/p' + 1`` in pure integer arithmetic — bit-identical
    across engines, unlike interpolated percentiles whose float
    index arithmetic can differ in the last ulp, and unlike
    ``percentile_approx`` which is sketch-approximate.

    Output: (group, n_docs, total_tokens, mean_chars, p50_chars,
    p90_chars).

    Shape (r10 rewrite, CORPUS_STATS_DECOMP.json): the value at
    nearest-rank k depends only on the sorted MULTISET of lengths, so
    instead of row_number over a full per-group sort of every document
    (whose parallelism is bounded by the number of groups — a handful
    of sources serialized ~0.9 s of the x20 wall on 32 cores), build
    the (group, chars) HISTOGRAM with a map-combined aggregate, then
    pick the rank from a running count over the tiny distinct-length
    table. Docs cross the wire once as pre-aggregated counts; the
    per-group sort touches distinct lengths only. Values are
    bit-identical to the row_number formulation (oracle unchanged).

    Measured dead end, kept out (CORPUS_STATS_DECOMP.json): counting
    tokens arithmetically as spaces+1 via
    ``length(t) - length(translate(t, ' ', ''))`` is equivalent for
    any string but 1.5x SLOWER than ``size(split(...))`` on this scan
    (0.90 vs 0.59 s at x20) — translate's per-char copy costs more
    than split's array build. The whole query is tokenize-scan-bound
    (scan floor 0.59 s of the ~1 s wall); the histogram buys
    group-count-independent parallelism at cluster scale, not local
    wall.
    """
    from trendmachine_spark.extensions.dedup import rebalance_for_fanout

    n_tok = F.size(F.split(F.col(text_col), " "))
    hist = (
        rebalance_for_fanout(
            docs.select(F.col(group_col), F.col(id_col), F.col(text_col))
        )
        .select(
            F.col(group_col).alias("grp"),
            F.length(text_col).alias("_chars"),
            n_tok.alias("_toks"),
        )
        .groupBy("grp", "_chars")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum("_toks").alias("_tok_sum"),
        )
    )
    wg = Window.partitionBy("grp")
    cum = F.sum("_cnt").over(wg.orderBy("_chars"))
    ranked = (
        hist.withColumn("_cum", cum)
        .withColumn("_n", F.sum("_cnt").over(wg))
    )
    p50 = F.expr("(_n - 1) div 2 + 1")
    p90 = F.expr("((_n - 1) * 9) div 10 + 1")

    def at_rank(rank):  # histogram bucket holding the 1-based rank
        return F.max(
            F.when((F.col("_cum") - F.col("_cnt") < rank)
                   & (rank <= F.col("_cum")), F.col("_chars"))
        ).cast("long")

    return (
        ranked.groupBy("grp")
        .agg(
            F.sum("_cnt").alias("n_docs"),
            F.sum("_tok_sum").alias("total_tokens"),
            (F.sum(F.col("_chars").cast("long") * F.col("_cnt")).cast("double")
             / F.sum("_cnt")).alias("mean_chars"),
            at_rank(p50).alias("p50_chars"),
            at_rank(p90).alias("p90_chars"),
        )
        .withColumnRenamed("grp", group_col)
    )
