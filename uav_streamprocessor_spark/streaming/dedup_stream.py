"""Incremental streaming near-duplicate detection.

A pretraining ingest pipeline can't re-run batch LSH over the whole
corpus per arrival; the scalable shape is an accumulated BUCKET INDEX:
each micro-batch computes its MinHash band signatures, joins them
against the signatures of everything ingested before it (cross-batch
pairs) and against itself (within-batch pairs), then appends its own
signatures to the index. The union of pairs over all batches equals the
batch LSH candidate set over the full corpus — asserted in
tests/test_dedup_stream.py against operators/dedup.minhash_candidates.

Scale properties:
- The index stores (doc_id, band, band_sig) — 16 narrow rows per doc,
  never text. The per-batch join is band-bucket-keyed, exactly like the
  batch operator; index-side partition pruning keeps replayed batches
  out (`src_batch < current`).
- Idempotent under foreachBatch replay: each batch OVERWRITES its own
  `src_batch=N` partition of the index and its own pairs directory, so
  an at-least-once retry converges to the same state (same pattern as
  sinks.IdempotentBatchSink).
- At 100 TB the index compacts periodically (many small src_batch dirs →
  bucketed-by-band_sig files); noted here, not needed at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uav_streamprocessor_spark.operators.dedup import (
    band_signatures,
    minhash_signature,
)
from uav_streamprocessor_spark.operators.partitioning import spread_scan


def batch_band_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, band, band_sig) for one micro-batch.

    r17: the micro-batch usually arrives as ONE file (maxFilesPerTrigger
    pacing), which would run the 64-permutation signature UDF on one
    core — spread_scan parallelizes it exactly like the batch operator's
    pre-UDF repartition (no-op when the trigger batched many files)."""
    sigs = spread_scan(docs, "doc_id").select(
        "doc_id", minhash_signature("text").alias("sig")
    )
    return band_signatures(sigs)


def make_incremental_neardup_sink(index_dir: str, pairs_dir: str):
    """foreachBatch function: detect near-dup candidate pairs of this
    batch against (index ∪ itself), then extend the index."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bands = batch_band_signatures(batch_df).persist()
        try:
            new = bands.alias("new")
            # within-batch pairs (a < b)
            within = (
                new.join(
                    bands.alias("b"),
                    (F.col("new.band") == F.col("b.band"))
                    & (F.col("new.band_sig") == F.col("b.band_sig"))
                    & (F.col("new.doc_id") < F.col("b.doc_id")),
                )
                .select(
                    F.col("new.doc_id").alias("doc_id_a"),
                    F.col("b.doc_id").alias("doc_id_b"),
                )
            )
            pairs = within
            try:
                store = spark.read.parquet(index_dir).filter(
                    F.col("src_batch") < F.lit(batch_id)
                )
                has_store = True
            except Exception:  # first batch: no index yet
                has_store = False
            if has_store:
                cross = (
                    store.alias("old")
                    .join(
                        new,
                        (F.col("old.band") == F.col("new.band"))
                        & (F.col("old.band_sig") == F.col("new.band_sig"))
                        & (F.col("old.doc_id") != F.col("new.doc_id")),
                    )
                    .select(
                        F.least("old.doc_id", "new.doc_id").alias("doc_id_a"),
                        F.greatest("old.doc_id", "new.doc_id").alias("doc_id_b"),
                    )
                )
                pairs = pairs.union(cross)
            # idempotent per-batch outputs: a replayed batch overwrites
            # its own partition/directory, never duplicating state
            pairs.distinct().write.mode("overwrite").parquet(
                f"{pairs_dir}/batch={batch_id}"
            )
            bands.withColumn("src_batch", F.lit(batch_id)).write.mode(
                "overwrite"
            ).parquet(f"{index_dir}/src_batch={batch_id}")
        finally:
            bands.unpersist()

    return process


def run_incremental_neardup(
    doc_stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
):
    """Wire the sink to a document stream (availableNow for tests)."""
    return (
        doc_stream.writeStream.foreachBatch(
            make_incremental_neardup_sink(index_dir, pairs_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
