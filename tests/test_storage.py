"""Bucketed storage layout: same-bucketed tables join with ZERO shuffle —
the structural proof behind SCALE.md's frames⋈detections claim."""

from __future__ import annotations

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


def test_bucketed_join_correct(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = spark.table(left).join(
        spark.table(right), ["camera_id", "frame_number"]
    )
    expected = spark.table("frames").select(
        "camera_id", "frame_number", "width", "height"
    ).join(spark.table("detections"), ["camera_id", "frame_number"])
    assert joined.count() == expected.count()
