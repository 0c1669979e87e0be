"""Sequence packing: greedy concatenation of documents into fixed
token budgets — the step between a filtered corpus and a trainer's
fixed-length batches (every large-scale pretraining pipeline packs;
see e.g. the T5/GPT-NeoX data loaders).

Spark-first decomposition: packing is an order-dependent scan with a
running-total RESET (a document that would overflow starts a new
pack), which no window function expresses — the cumsum-bucket trick
``floor(cumsum / budget)`` mis-bins every document that straddles a
boundary. So the scan runs as ``applyInPandas`` per HASH BUCKET:

* bucket = md5(doc_id) mod n_buckets — deterministic, so pack
  membership is a pure function of (corpus, budget, n_buckets),
  independent of partitioning/cluster size (same contract as
  sampling.hash_uniform);
* within a bucket, docs pack in doc_id order (deterministic greedy
  first-fit against the running budget);
* buckets are the parallelism AND memory unit: each task touches
  ~corpus/n_buckets docs of (id, n_tokens) — two narrow columns, the
  text itself never moves — so executor memory is bounded regardless
  of corpus size, and n_buckets scales the fan-out at 100 TB.

Output: (pack_id, doc_id, n_tokens, offset) — the assignment table a
writer joins back against the corpus to emit packed shards. A single
document longer than the budget gets its own pack (offset 0),
recorded rather than truncated; trainers decide whether to split it.

SQL-expressible only via a recursive CTE — which the registry oracle
now provides (exact per-row walk, value-hash-checked); invariants (exhaustive/unique assignment, budget respected
except single-overflow packs, contiguous offsets, partition-count
invariance) are pinned by tests/test_extensions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = "pack_id string, doc_id long, n_tokens long, offset long"


def pack_sequences(docs: DataFrame, budget: int = 2048, n_buckets: int = 64,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Greedy deterministic packing of whitespace-token counts into
    ``budget``-sized packs; see module docstring for the contract."""
    sized = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
        F.pmod(
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
            .cast("long"),
            F.lit(n_buckets),
        ).alias("_bucket"),
    )

    cap = budget

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id")
        bucket = int(pdf["_bucket"].iloc[0])
        out, pack_i, used = [], 0, 0
        for doc, nt in zip(pdf["doc_id"], pdf["n_tokens"]):
            if used > 0 and used + nt > cap:
                pack_i += 1
                used = 0
            out.append((f"b{bucket}p{pack_i}", doc, nt, used))
            used += nt
        return pd.DataFrame(out, columns=["pack_id", "doc_id", "n_tokens", "offset"])

    return sized.groupBy("_bucket").applyInPandas(pack, PACK_SCHEMA)


def packed_text(docs: DataFrame, budget: int = 2048, n_buckets: int = 64,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Trainer-ready packed sequences: each pack's documents joined
    back to the corpus and concatenated in offset order (single-space
    separator, so whitespace token counts stay additive:
    len(split(text)) == total_tokens for every pack).

    Output: (pack_id, n_docs, total_tokens, text).

    Shape: the assignment table shuffles on doc_id to meet the corpus
    (text moves exactly once, same property as sinks.write_packed_corpus),
    then one groupBy(pack_id) with an ``array_sort`` on (offset, text)
    structs so concatenation order never depends on collect_list
    arrival order. The sink is the shard-file materialization of the
    same join; this is the queryable twin with a value-hash oracle.
    """
    asg = pack_sequences(docs, budget, n_buckets, text_col, id_col)
    joined = asg.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")),
        "doc_id",
    )
    return joined.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("offset"), F.col("_t")))),
                lambda s: s["_t"],
            ),
            " ",
        ).alias("text"),
    )


def training_shards(docs: DataFrame, n_shards: int = 16,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic output-shard assignment audit — the table a 100 TB
    corpus writer reads before ``partitionBy``-ing the final export
    (are the shards balanced? what does each hold?).

    shard = md5('shard:' || doc_id) mod ``n_shards`` — membership is a
    pure function of the id (same contract as pack_sequences' bucket
    and sampling's hash_uniform: reproducible across runs, engines,
    partitionings, and cluster sizes; a salted key decouples shard
    geometry from pack-bucket geometry). Per shard: document count,
    whitespace-token and char totals, and the id range.

    Scale: one narrow projection plus ONE map-combined aggregation on
    ``n_shards`` keys — every partition emits at most ``n_shards``
    partial rows, so the shuffle is bytes regardless of corpus size.
    The writer itself is ``df.withColumn("shard", ...).write
    .partitionBy("shard")`` with this table as its manifest.
    """
    shard = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("shard:"), F.col(id_col).cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long"),
        F.lit(n_shards),
    )
    return (
        docs.select(
            shard.alias("shard"),
            F.col(id_col).alias("_id"),
            F.length(text_col).cast("long").alias("_chars"),
            F.size(F.split(F.col(text_col), " ")).cast("long").alias("_toks"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_toks").alias("total_tokens"),
            F.sum("_chars").alias("total_chars"),
            F.min("_id").alias("min_doc_id"),
            F.max("_id").alias("max_doc_id"),
        )
    )
