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


# ---------------------------------------------------------------------------
# Media gates (VERDICT r5 #8 / r6 #7): each media operator gets a PLANTED
# positive — a perturbed input whose correct output is known exactly — so a
# vacuous/miswired implementation (wrong frame slicing, dropped channel,
# threshold never firing) fails here even though the driver only row-counts
# these rows-only queries.
# ---------------------------------------------------------------------------

import numpy as np
import pytest

from uav_streamprocessor_spark.operators import multimodal
from uav_streamprocessor_spark.operators.pixel import decode_image, encode_image

_MEDIA_DDL = (
    "media_id long, media_type string, mime string, width int, "
    "height int, duration_ms long, payload binary"
)


def test_scene_changes_fire_on_planted_hard_cut_only(spark):
    """A video with a single hard cut (4 black frames, then 4 white) must
    report EXACTLY one cut, at the first white frame, with the exact luma
    jump (255); an all-static twin must report none."""
    h, w, n = 16, 16, 8
    black = np.zeros((h, w, 3), dtype=np.uint8)
    white = np.full((h, w, 3), 255, dtype=np.uint8)
    cut = np.concatenate([black] * 4 + [white] * 4, axis=0)
    static = np.concatenate([black] * n, axis=0)
    media = spark.createDataFrame(
        [
            (1, "video", "raw", w, h, n * 1000, encode_image(cut)),
            (2, "video", "raw", w, h, n * 1000, encode_image(static)),
        ],
        _MEDIA_DDL,
    )
    rows = multimodal.video_scene_changes(media, threshold=12.0).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["media_id"], r["frame_index"]) == (1, 4)
    assert r["mean_abs_diff"] == 255.0


def test_resized_thumb_preserves_planted_spatial_structure(spark):
    """Resizing a half-black/half-white 32x32 image to 4x4 must keep the
    halves (left columns 0, right columns 255) — a resize that scrambles
    axes, drops a channel, or returns the input unchanged fails."""
    arr = np.zeros((32, 32, 3), dtype=np.uint8)
    arr[:, 16:] = 255
    media = spark.createDataFrame(
        [(1, "image", "raw", 32, 32, None, encode_image(arr))], _MEDIA_DDL
    )
    out = multimodal.resize_images(media, target=4).collect()
    assert len(out) == 1
    thumb = decode_image(bytes(out[0]["payload"]))
    assert thumb.shape == (4, 4, 3)
    assert (thumb[:, :2] == 0).all() and (thumb[:, 2:] == 255).all()


def test_audio_features_flag_planted_clipping_outlier(spark):
    """A full-scale square wave planted among quiet sines must surface as
    the loudness outlier with exactly known features: peak 32767, RMS
    32767, zero-crossing rate 1/8 (two sign changes per 16-sample
    period)."""
    import numpy as _np

    t = _np.arange(8000)
    quiet = (1000 * _np.sin(2 * _np.pi * 440 * t / 16000)).astype("<i2")
    square = _np.where((t // 8) % 2 == 0, 32767, -32767).astype("<i2")
    media = spark.createDataFrame(
        [
            (1, "audio", "pcm16", None, None, 500, quiet.tobytes()),
            (2, "audio", "pcm16", None, None, 500, square.tobytes()),
        ],
        _MEDIA_DDL,
    )
    feats = {r["media_id"]: r for r in
             multimodal.extract_audio_features(media).collect()}
    assert feats[2]["peak"] == 32767
    assert feats[2]["rms"] == pytest.approx(32767.0)
    assert feats[2]["zero_crossing_rate"] == pytest.approx(1 / 8, abs=1e-3)
    # the outlier is separable from the quiet corpus by an order of magnitude
    assert feats[2]["rms"] > 10 * feats[1]["rms"]


def test_image_features_exact_on_planted_quadrants(spark):
    """An image whose four 16x16 quadrants hold constant values 0/64/128/
    255 has an exactly-known mean, std, and 4x4 luma fingerprint (each
    fingerprint quadrant = its plateau value x 192, the integer luma3
    block sum over 8x8 px x 3 channels — the r13 lossless convention) —
    wrong axis order, wrong channel mix, or a fingerprint built on the
    unpooled image all fail."""
    import json as _json

    arr = np.zeros((32, 32, 3), dtype=np.uint8)
    arr[:16, 16:] = 64
    arr[16:, :16] = 128
    arr[16:, 16:] = 255
    media = spark.createDataFrame(
        [(1, "image", "raw", 32, 32, None, encode_image(arr))], _MEDIA_DDL
    )
    feats = multimodal.extract_image_features(media).collect()
    assert len(feats) == 1
    r = feats[0]
    expected_mean = (0 + 64 + 128 + 255) / 4
    assert r["mean_intensity"] == pytest.approx(expected_mean)
    fp = np.array(_json.loads(r["luma_fingerprint"])).reshape(4, 4)
    block_sum = 8 * 8 * 3  # px per 4x4-grid block x channels
    assert (fp[:2, :2] == 0).all()
    assert (fp[:2, 2:] == 64 * block_sum).all()
    assert (fp[2:, :2] == 128 * block_sum).all()
    assert (fp[2:, 2:] == 255 * block_sum).all()


def test_frame_samples_recover_planted_frame_payloads(spark):
    """Sampling every 2nd frame of a 6-frame stack whose frame i is the
    constant value 40*i must return frames 0/2/4 with exactly those
    constants — off-by-one slicing or height miscalculation fails."""
    h, w = 8, 8
    frames = [np.full((h, w, 3), 40 * i, dtype=np.uint8) for i in range(6)]
    stack = np.concatenate(frames, axis=0)
    media = spark.createDataFrame(
        [(1, "video", "raw", w, h, 6_000, encode_image(stack))], _MEDIA_DDL
    )
    rows = {r["frame_index"]: r for r in
            multimodal.frame_sample_video(media, every_n=2).collect()}
    assert sorted(rows) == [0, 2, 4]
    for i, r in rows.items():
        img = decode_image(bytes(r["payload"]))
        assert img.shape == (h, w, 3)
        assert (img == 40 * i).all()
