"""Positive controls for correct-empty queries (VERDICT r2 #4).

Two oracle checks legitimately return 0 rows (`uav_segment_reassembly`,
`rel_suppliers_no_lineitems`) — but a 0=0 comparison can't distinguish
correct-empty from broken-empty (e.g. the query swapped for LIMIT 0).
Each test here PERTURBS the input so the true answer is non-empty and
asserts the query reports exactly the seeded rows: a vacuous
implementation fails these.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from uav_streamprocessor_spark.fixtures import register_uav_views
from uav_streamprocessor_spark.operators import relational, uav_core


def test_segment_reassembly_detects_dropped_segment(spark):
    """Dropping one segment from the split must surface that segment's
    frames in the reassembly diff — the diff is a real EXCEPT ALL, not a
    constant-empty plan."""
    register_uav_views(spark, SF_SMALL)
    frames = spark.table("frames")
    segments = spark.table("segments")
    dropped = segments.orderBy("camera_id", "segment_id").limit(1).collect()[0]
    remaining = segments.filter(
        ~(
            (F.col("camera_id") == dropped["camera_id"])
            & (F.col("segment_id") == dropped["segment_id"])
        )
    )
    diff = uav_core.segment_reassembly_diff(frames, remaining)
    missing = diff.collect()
    assert len(missing) > 0, "dropped segment not detected"
    # every reported frame belongs to the dropped segment's range
    assert all(
        r["camera_id"] == dropped["camera_id"]
        and dropped["start_frame"] <= r["frame_number"] < dropped["end_frame"]
        for r in missing
    )
    expected = frames.filter(
        (F.col("camera_id") == dropped["camera_id"])
        & (F.col("frame_number") >= dropped["start_frame"])
        & (F.col("frame_number") < dropped["end_frame"])
    ).count()
    assert len(missing) == expected

    # unperturbed control: the real split reassembles losslessly (the 0
    # the driver sees is THIS 0)
    assert uav_core.segment_reassembly_diff(frames, segments).count() == 0


def test_suppliers_no_lineitems_detects_seeded_supplier(spark):
    """Seeding a supplier with no lineitems must make the anti join
    report it — and only it."""
    register_uav_views(spark, SF_SMALL)
    supplier = spark.read.parquet(f"{SF_SMALL}/supplier.parquet")
    baseline = relational.suppliers_without_lineitems(spark).count()
    ghost = spark.createDataFrame(
        [(999_999_999, "GHOST SUPPLIER", 0, 0.0)], supplier.schema
    )
    try:
        supplier.unionAll(ghost).createOrReplaceTempView("supplier")
        rows = relational.suppliers_without_lineitems(spark).collect()
        assert len(rows) == baseline + 1
        assert any(
            r["s_suppkey"] == 999_999_999 and r["s_name"] == "GHOST SUPPLIER"
            for r in rows
        )
    finally:
        # restore the unperturbed view for other tests in this session
        supplier.createOrReplaceTempView("supplier")
