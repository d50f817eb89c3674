"""Bucketed storage layout: same-bucketed tables join with ZERO shuffle —
the structural proof behind SCALE.md's frames⋈detections claim."""

from __future__ import annotations

import re

import pytest

from tests.conftest import SF_SMALL
from uav_streamprocessor_spark.fixtures import register_uav_views
from uav_streamprocessor_spark.storage import (
    bucketed_join_plan_is_shuffle_free,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    register_uav_views(spark, SF_SMALL)
    write_bucketed(
        spark.table("frames").select("camera_id", "frame_number", "width", "height"),
        "frames_b",
        bucket_cols=["camera_id", "frame_number"],
        sort_cols=["camera_id", "frame_number"],
    )
    write_bucketed(
        spark.table("detections"),
        "detections_b",
        bucket_cols=["camera_id", "frame_number"],
        sort_cols=["camera_id", "frame_number"],
    )
    yield "frames_b", "detections_b"
    spark.sql("DROP TABLE IF EXISTS frames_b")
    spark.sql("DROP TABLE IF EXISTS detections_b")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    shuffle_free, plan = bucketed_join_plan_is_shuffle_free(
        spark, left, right, ["camera_id", "frame_number"]
    )
    assert shuffle_free, f"bucketed join still shuffles:\n{plan[:2000]}"


def test_shuffle_detector_flags_non_bucketed_join(spark, tmp_path):
    """Negative control: a plain parquet⋈parquet join on a non-bucketed
    key MUST be flagged as shuffling (guards the detector itself — a
    substring check that can never fire would make the bucketing proof
    vacuous)."""
    from uav_streamprocessor_spark.storage import plan_is_shuffle_free

    a = spark.range(0, 10000).withColumnRenamed("id", "k")
    b = spark.range(0, 10000).withColumnRenamed("id", "k")
    for name, df in [("plain_a", a), ("plain_b", b)]:
        df.write.mode("overwrite").parquet(str(tmp_path / name))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.read.parquet(str(tmp_path / "plain_a")).join(
            spark.read.parquet(str(tmp_path / "plain_b")), "k"
        )
        shuffle_free, plan = plan_is_shuffle_free(joined)
        assert not shuffle_free, f"shuffling join not flagged:\n{plan[:2000]}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_broadcast_join_counts_as_shuffle_free(spark, tmp_path):
    """BroadcastExchange must NOT trip the detector (dim broadcast is the
    desired plan, not a shuffle)."""
    from pyspark.sql import functions as F

    from uav_streamprocessor_spark.storage import plan_is_shuffle_free

    big = spark.range(0, 10000).withColumnRenamed("id", "k")
    dim = spark.range(0, 10).withColumnRenamed("id", "k")
    shuffle_free, plan = plan_is_shuffle_free(big.join(F.broadcast(dim), "k"))
    assert shuffle_free, f"broadcast join wrongly flagged:\n{plan[:2000]}"


def test_bucketed_join_correct(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = spark.table(left).join(
        spark.table(right), ["camera_id", "frame_number"]
    )
    expected = spark.table("frames").select(
        "camera_id", "frame_number", "width", "height"
    ).join(spark.table("detections"), ["camera_id", "frame_number"])
    assert joined.count() == expected.count()


def test_window_spec_detector_flags_global_window(spark):
    """Negative control for plan_window_specs (mirrors the shuffle-
    detector control): a deliberately global Window.orderBy must be
    reported unpartitioned and a partitioned twin partitioned — if a
    Spark version ever prints an empty [] partitionSpec group, the
    bracket-count heuristic would pass the no-global-window gate
    vacuously; this test catches that."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from uav_streamprocessor_spark.storage import plan_window_specs

    df = spark.range(0, 100).withColumn("grp", F.col("id") % 7)
    global_w = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    specs = plan_window_specs(global_w)
    assert specs, "no Window node found in a windowed plan"
    assert all(not part for part, _ in specs), f"global window not flagged: {specs}"

    part_w = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("grp").orderBy("id"))
    )
    specs_p = plan_window_specs(part_w)
    assert specs_p and all(part for part, _ in specs_p), (
        f"partitioned window misreported: {specs_p}"
    )


def test_partitioned_write_prunes_partitions_on_read(spark, tmp_path):
    """Hive-partitioned layout (the 100 TB directory scheme: partition by
    low-cardinality scan keys like date/camera): a partition-column
    predicate must land in the scan's PartitionFilters — directories are
    skipped without reading a footer. Negative control: a data-column
    predicate must NOT appear there (it belongs to PushedFilters), so
    this can't pass vacuously on a reader that ignores partitioning."""
    from uav_streamprocessor_spark.storage import formatted_plan

    path = str(tmp_path / "part_events")
    df = spark.range(0, 1000).selectExpr(
        "id", "id % 7 AS day_bucket", "id * 2 AS value"
    )
    df.write.mode("overwrite").partitionBy("day_bucket").parquet(path)

    pruned = spark.read.parquet(path).filter("day_bucket = 3 AND value > 100")
    plan = formatted_plan(pruned)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day_bucket" in m.group(1), f"no partition pruning:\n{plan[:1200]}"
    assert "value" not in m.group(1), "data predicate misplaced in PartitionFilters"
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "value" in pushed.group(1), "data predicate not pushed"
    # pruning is effective: only one of seven directories is read
    assert pruned.count() == sum(1 for i in range(1000) if i % 7 == 3 and i * 2 > 100)


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    """Compaction must reduce the file count to the target, keep every
    row bit-identical, and restore row-group skip-effectiveness when
    sorted (min/max ranges disjoint across files)."""
    from uav_streamprocessor_spark.storage import compact_parquet

    path = str(tmp_path / "many_small")
    # simulate micro-batch litter: 40 single-row-group files, keys interleaved
    for i in range(40):
        spark.range(i * 10, (i + 1) * 10).selectExpr(
            "id % 100 AS key", "id AS payload"
        ).coalesce(1).write.mode("append").parquet(path)
    import os

    before = spark.read.parquet(path).collect()
    n_before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_before >= 40

    n_after = compact_parquet(spark, path, target_files=4, sort_cols=["key"])
    assert n_after == 4
    after = spark.read.parquet(path).collect()
    assert sorted(map(str, after)) == sorted(map(str, before))


def test_permissive_json_ingest_quarantines_corrupt_rows(spark, tmp_path):
    """Ingest tolerance (SURVEY §2.2 error handling): PERMISSIVE JSON
    reads must load every well-formed row and quarantine malformed ones
    into _corrupt_record instead of failing the job — at 100 TB a single
    bad line must never kill a scan. FAILFAST is the opt-in strict twin."""
    from pyspark.sql import functions as F

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "text": "also ok"}\n'
        '{"doc_id": "not-a-number", "text": "type drift"}\n'
    )
    df = (
        spark.read.schema("doc_id long, text string, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
        .cache()  # SPARK-21610: corrupt-record column needs materialization
    )
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    assert bad.count() == 2  # the non-JSON line and the type-drift line
    df.unpersist()


def test_zorder_layout_skips_files_linear_sort_cannot(spark, tmp_path):
    """Measurable skip proof: a 64×64 uniform grid written as 16 files.
    Linear sort by x makes a y-range predicate touch EVERY file (each
    file spans all y); Z-order keeps both dims tight per file, so the
    same predicate's matching rows come from a strict subset of files.
    File touch is observed via input_file_name() on matching rows."""
    from pyspark.sql import functions as F

    from uav_streamprocessor_spark.storage import rewrite_zordered

    path = str(tmp_path / "grid")
    grid = spark.range(0, 64 * 64).selectExpr(
        "CAST(id % 64 AS INT) AS x", "CAST(id DIV 64 AS INT) AS y", "id AS payload"
    )
    # linear layout: range-partition+sort by x only
    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(path)

    def files_touched():
        return (
            spark.read.parquet(path)
            .filter("y >= 8 AND y < 16")
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    n_linear = files_touched()
    assert n_linear == 16, "every x-sorted file spans all y values"

    rewrite_zordered(spark, path, "x", "y", n_files=16)
    n_z = files_touched()
    assert n_z < n_linear / 2, f"z-order should halve file touches, got {n_z}"
    # same data after rewrite
    assert spark.read.parquet(path).count() == 64 * 64


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """DPP: a filter on the DIM side of a join must prune FACT partitions
    at runtime — the scan's PartitionFilters grows a dynamicpruning
    subquery, and only the matching partition's rows are read. This is
    the scale mechanism that turns 'join orders to this month's dim
    slice' into a one-partition scan at 100 TB."""
    register_uav_views(spark, SF_SMALL)
    fact_dir = str(tmp_path / "orders_part")
    spark.table("orders").write.partitionBy("o_orderpriority").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [("1-URGENT", "keep"), ("2-HIGH", "drop"), ("3-MEDIUM", "drop"),
         ("4-NOT SPECIFIED", "drop"), ("5-LOW", "drop")],
        "prio string, tag string",
    )
    joined = fact.join(
        dim.filter("tag = 'keep'"), fact["o_orderpriority"] == dim["prio"]
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), f"no DPP in plan:\n{plan[:1500]}"
    prios = {
        r["o_orderpriority"]
        for r in joined.select("o_orderpriority").distinct().collect()
    }
    assert prios == {"1-URGENT"}
