"""Incremental KLL quantile maintenance over a streaming event feed —
the quantile member of the streaming mergeable-sketch pair (HLL distinct
counts live in sketch_stream.py; the batch trio incl. approx-top-k is
operators/sketches.py). Running p50/p90/p99 of `value` per event type
WITHOUT sorting or rescanning events.

Same store shape as the HLL sink: each micro-batch reduces to one KLL
sketch per event_type and OVERWRITES its own `src_batch=N` partition of
a parquet store (dynamic partition overwrite → at-least-once replay
never double-counts: a redelivered batch replaces its own partition).
One contract difference from the HLL twin: KLL compaction is RANDOMIZED
by design, so a replayed partition holds a statistically equivalent
sketch, not identical bytes — convergence is "n exact + rank bounds
hold", not bit equality (asserted exactly that way in tests). Readers
fold-merge the tiny stored sketches. k=200 gives ~1.65% one-sided rank
error (DataSketches bound) — the read-time assertion target.

Scale properties:
- State per batch is |event_types| sketches (~KB each), independent of
  event volume; reader merge cost is O(batches × types), not O(events).
- The fold uses the same collect_list + aggregate() merge as the batch
  rollup (kll_sketch_merge_double has no union-agg form yet); fan-in is
  batches × types — bounded — and KLL rank-error bounds hold under ANY
  merge order, which is what the tests assert (estimates are
  order-sensitive in the last ULP, bounds are not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_K = 200


def make_incremental_kll_sink(store_dir: str, k: int = _K):
    """foreachBatch function: reduce the batch to per-type KLL sketches
    and overwrite this batch's partition of the store."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        per_type = (
            batch_df.groupBy("event_type")
            .agg(F.kll_sketch_agg_double("value", F.lit(k)).alias("sketch"))
            .withColumn("src_batch", F.lit(batch_id))
        )
        (
            per_type.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("src_batch")
            .parquet(store_dir)
        )

    return process


def run_incremental_kll(
    event_stream: DataFrame, store_dir: str, checkpoint_dir: str, k: int = _K
):
    """Wire the sink to an event stream (availableNow for tests)."""
    return (
        event_stream.writeStream.foreachBatch(
            make_incremental_kll_sink(store_dir, k)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def running_quantiles(spark: SparkSession, store_dir: str) -> DataFrame:
    """Running p50/p90/p99 + exact n per event_type from the accumulated
    store — a fold-merge of tiny sketches, no event rescan."""
    merged = (
        spark.read.parquet(store_dir)
        .groupBy("event_type")
        .agg(F.collect_list("sketch").alias("sks"))
        .select(
            "event_type",
            F.aggregate(
                F.expr("slice(sks, 2, greatest(size(sks) - 1, 0))"),
                F.element_at("sks", 1),
                lambda acc, x: F.kll_sketch_merge_double(acc, x),
            ).alias("sk"),
        )
    )
    return merged.select(
        "event_type",
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.5)), 6).alias("p50"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.9)), 6).alias("p90"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.99)), 6).alias("p99"),
        F.kll_sketch_get_n_double("sk").alias("n"),
    )
