"""Training-batch assembly operators over `documents` (north-star
extension): sequence packing and temperature-based source mixing.

Both are the last relational steps before tokenized text leaves a
curation pipeline for a trainer:

- sequence packing: concat-and-chunk documents into fixed-token-budget
  training sequences (the GPT-style pack: documents are concatenated in a
  deterministic order and cut every `budget` tokens, so a document can
  straddle a sequence boundary). Packing is done WITHIN hash shards —
  the window is partitioned by shard, so the cumulative sum parallelizes
  across shards and no global sort/window exists anywhere. That is also
  the semantics trainers want: each shard is an independent stream of
  sequences, shards shuffle freely across data-loader workers.
- mixing weights: temperature-scaled source weighting (p_s ∝ tokens_s^α,
  α=0.7 — the multilingual/multi-source rebalancing rule from the mBERT/
  XLM-R line of work, used for pretraining mixes): computes each source's
  sampled weight, its up/over-sampling factor vs natural frequency, and
  its expected token budget share. All aggregates — the model is
  O(n_sources) and broadcast-sized by construction.

Token counts use the same whitespace length-arithmetic as
operators/text.py (exact, codegen'd, portable to the DuckDB oracle).
Shard keys use md5 hex chars 5-6 so draws are independent of the chars
used by split (1), shard (1-2), and downsample (3-4) in sampling.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_BUDGET = 512  # tokens per packed training sequence
_N_PACK_SHARDS = 16
_ALPHA = 0.7  # mixing temperature


def _nibble(c):
    # '0'..'9' → 0..9, 'a'..'f' → 10..15 via ascii arithmetic (portable)
    return F.when(c <= "9", F.ascii(c) - 48).otherwise(F.ascii(c) - 87)


def sequence_packing(
    spark: SparkSession,
    budget: int = _BUDGET,
    n_shards: int = _N_PACK_SHARDS,
) -> DataFrame:
    """Pack documents into fixed-budget training sequences, per shard.

    Per (shard, sequence): docs starting in the sequence, docs that
    straddle its right boundary, and their token mass. The cumulative
    token count is a running-sum window PARTITIONED BY shard (ordered by
    doc_id — deterministic), so at 100 TB each shard's packing is an
    independent narrow task after one hash shuffle; there is no global
    ordering anywhere. Sequence ids use integer `div` (exact, no double
    rounding at large cumulative counts)."""
    staged = (
        doc_tokens_shard(spark.table("documents"), n_shards)
        .withColumn(
            "cum",
            F.sum("n_tokens").over(Window.partitionBy("shard").orderBy("doc_id")),
        )
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            F.expr(f"(cum - n_tokens) div {budget}").alias("seq_id"),
            F.expr(f"(cum - 1) div {budget}").alias("seq_id_last"),
        )
    )
    return pack_summary(staged)


def doc_tokens_shard(docs: DataFrame, n_shards: int = _N_PACK_SHARDS) -> DataFrame:
    """(doc_id, shard, n_tokens) — the packing input frame, shared by the
    batch window form and the streaming state twin
    (streaming/packing_stream.py) so both pack the SAME shard streams
    with the SAME token arithmetic."""
    n_tokens = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" ")))) + 1
    ).cast("long")
    shard = (
        _nibble(F.substring(F.md5("text"), 5, 1)) * 16
        + _nibble(F.substring(F.md5("text"), 6, 1))
    ) % n_shards
    return docs.select(
        "doc_id", shard.cast("int").alias("shard"), n_tokens.alias("n_tokens")
    )


def pack_summary(staged: DataFrame) -> DataFrame:
    """Per-(shard, sequence) roll-up of staged packing assignments —
    shared by the batch and streaming packers (identical downstream
    semantics ⇒ the equality proof compares this one output)."""
    return (
        staged.groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("seq_id_last") > F.col("seq_id")).cast("long")).alias(
                "n_split_docs"
            ),
            F.sum("n_tokens").alias("started_tokens"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .orderBy("shard", "seq_id")
    )


def mix_weights(
    spark: SparkSession, alpha: float = _ALPHA, token_budget: int = 1_000_000
) -> DataFrame:
    """Temperature-scaled source mixing table: weight_s = T_s^α / Σ T^α.

    `oversample` is the factor vs natural frequency (>1 = the source is
    up-sampled by the temperature — small sources gain, large ones lose;
    α=1 is natural sampling, α=0 is uniform). `expected_tokens` is the
    source's share of a training token budget under the mix. Two tiny
    aggregations; the totals enter as a 1-row crossJoin (scalar
    broadcast), never a shuffle of the doc table beyond the per-source
    agg."""
    docs = spark.table("documents")
    n_tokens = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" ")))) + 1
    ).cast("long")
    per_source = docs.select(F.col("source"), n_tokens.alias("t")).groupBy(
        "source"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("t").alias("total_tokens"),
    ).withColumn("w_raw", F.pow(F.col("total_tokens").cast("double"), alpha))
    totals = per_source.agg(
        F.sum("w_raw").alias("w_sum"),
        F.sum("total_tokens").cast("double").alias("t_sum"),
    )
    return (
        per_source.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.round(F.col("w_raw") / F.col("w_sum"), 6).alias("weight"),
            F.round(
                (F.col("w_raw") / F.col("w_sum"))
                / (F.col("total_tokens") / F.col("t_sum")),
                6,
            ).alias("oversample"),
            F.round(F.col("w_raw") / F.col("w_sum") * token_budget)
            .cast("long")
            .alias("expected_tokens"),
        )
        .orderBy("source")
    )


def chunk_windows(
    spark: SparkSession, size: int = 64, stride: int = 48
) -> DataFrame:
    """Overlapping word-window chunking — the RAG-indexing / context-
    window prep step: each document splits into windows of `size` words
    every `stride` words (overlap = size - stride). Per doc: window
    count, total chunk words (counting overlap re-reads), and the tail
    window's length. The whole computation is sequence+transform inside
    the row — map-only, no explode, no shuffle; at 100 TB this runs at
    scan speed. Chunk STARTS enumerate every stride offset <= n_words
    (tails shorter than a full window are kept and measured rather than
    silently merged — the policy choice is visible in last_chunk_words).
    """
    docs = spark.table("documents")
    ws = F.split(F.lower("text"), " ")
    n_words = F.size(ws)
    starts = F.sequence(F.lit(1), n_words, F.lit(stride))
    lens = F.transform(
        starts, lambda s: F.least(F.lit(size), n_words - s + 1)
    )
    return docs.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        F.size(starts).alias("n_chunks"),
        F.aggregate(lens, F.lit(0), lambda acc, x: acc + x).alias(
            "total_chunk_words"
        ),
        F.element_at(lens, -1).alias("last_chunk_words"),
    )
