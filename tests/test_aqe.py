"""AQE runtime re-planning proofs: the two mechanisms SCALE.md leans on
for the cases static planning can't size — skew-join splitting and
shuffle-partition coalescing — demonstrated actually ENGAGING, not just
enabled in the session builder."""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def _final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_skewed_join_partition(spark):
    """One key carries ~100x the rows of the others; with the skew
    thresholds scaled to test data, AQE must mark the sort-merge join
    skew=true (splitting the hot partition into parallel tasks). This is
    the runtime half of the skew story — operators/skew.py covers the
    structural half (salting) for shapes AQE can't fix."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # pad must be INCOMPRESSIBLE — skew detection compares compressed
        # shuffle block sizes, and a constant pad lz4s to nothing
        left = spark.range(200_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(7)).otherwise(F.col("id"))
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(2_000).select(
            F.col("id").alias("k"), F.lit("r").alias("tag")
        )
        joined = left.join(right, "k")
        plan = _final_plan(joined.groupBy("tag").count())
        assert "isFinalPlan=true" in plan
        assert re.search(r"SortMergeJoin.*skew=true", plan), (
            f"AQE did not split the skewed partition:\n{plan[:2000]}"
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """A tiny aggregation shuffled across 32 configured partitions must
    be coalesced by AQE at runtime (AQEShuffleRead coalesced) — the
    mechanism that keeps small-SF runs from paying 32-task overhead per
    stage while the SAME config scales up."""
    df = (
        spark.range(1_000)
        .groupBy((F.col("id") % 5).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = _final_plan(df)
    assert "isFinalPlan=true" in plan
    assert "AQEShuffleRead coalesced" in plan, (
        f"AQE did not coalesce:\n{plan[:2000]}"
    )


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """The third runtime mechanism SCALE.md leans on for fact-to-fact
    joins too big to broadcast: Spark's runtime bloom-filter join
    (SPARK-32268) builds a bloom filter from the SELECTIVE side's join
    keys and pushes it into the large side's scan, discarding
    never-matching rows before the shuffle. Demonstrated ENGAGING
    (BloomFilterMightContain in the optimized plan), not just enabled:
    with the creation thresholds floored, a selective dim filter must
    inject the filter; and the join result must equal the un-hinted
    plan (pruning is semantically free)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # keep it a SMJ
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(300_000).select(
            (F.col("id") % 50_000).alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        dim = spark.range(50_000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("attr")
        ).filter(F.col("attr") == 3)  # selective: ~1/97 of keys survive
        joined = fact.join(dim, "k").groupBy("attr").count()
        optimized = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in optimized or "BloomFilterMightContain" in optimized, (
            f"runtime bloom filter not injected:\n{optimized[:2000]}"
        )
        got = {(r["attr"], r["count"]) for r in joined.collect()}
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    want = {(r["attr"], r["count"]) for r in fact.join(dim, "k").groupBy("attr").count().collect()}
    assert got == want and len(got) == 1
