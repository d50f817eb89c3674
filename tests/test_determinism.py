"""Scale-behavior proofs that don't fit the oracle: nested-schema
pruning and parallelism-invariance.

- Nested pruning: at 100 TB, struct columns are wide; a scan that
  materializes the whole struct for a one-leaf projection reads orders
  of magnitude more bytes. ReadSchema must show only the referenced
  leaf.
- Parallelism invariance: results must not depend on the partition
  count. Float aggregates are the classic leak (summation order varies
  with parallelism) — the engine's rounding conventions exist exactly
  to absorb that, so re-running headline float-heavy queries at a very
  different shuffle width must produce identical rows.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from uav_streamprocessor_spark import registry
from uav_streamprocessor_spark.storage import formatted_plan

_Q = registry.queries()


def test_nested_struct_scan_prunes_to_leaf(spark, tmp_path):
    path = str(tmp_path / "nested")
    spark.range(0, 100).select(
        "id",
        F.struct(
            F.col("id").alias("a"),
            (F.col("id") * 2).alias("b"),
            F.lit("x").alias("c"),
        ).alias("meta"),
    ).write.mode("overwrite").parquet(path)

    df = spark.read.parquet(path).select(F.col("meta.b"))
    plan = formatted_plan(df)
    m = re.search(r"ReadSchema: (.*)", plan)
    assert m, f"no ReadSchema in plan:\n{plan[:1200]}"
    schema = m.group(1)
    assert "b" in schema
    # pruned: sibling leaves must not be read
    assert ":a" not in schema.replace("meta", "") and "c:" not in schema, (
        f"struct not pruned to leaf: {schema}"
    )


def test_results_invariant_under_shuffle_parallelism(spark):
    """Re-run float-heavy queries with shuffle.partitions dropped 32→3:
    collected rows must be identical (the rounding conventions absorb
    summation-order differences). Catches any operator whose output
    depends on partitioning — the property that silently breaks when a
    query moves from local[32] to a 1000-executor cluster."""
    names = [
        "tpch_q1_pricing",
        "text_unigram_cross_entropy",
        "rel_price_statistics",
        "ev_sessionize_gap",
    ]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    for name in names:
        results[name] = sorted(map(str, _Q[name](spark, SF_SMALL).collect()))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        for name in names:
            rerun = sorted(map(str, _Q[name](spark, SF_SMALL).collect()))
            assert rerun == results[name], f"{name}: result depends on parallelism"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
