"""Codec-free real-container path (VERDICT r11 #1): RIFF/AVI demux
through the uav_video DataSource — NON-skipped in this container.

The reference decodes real containers via cv2 (uav/frame_reader.py:
124,165); these tests exercise real container BYTES end-to-end with
zero codec dependencies: a spec-correct DIB (BI_RGB) AVI is generated
in-test, demuxed inside DataSource partitions, decoded to real pixels
by numpy row arithmetic, and run through the full S2→F1→T1/T2→K1
pipeline un-gated.
"""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from uav_streamprocessor_spark.operators.pixel import decode_image
from uav_streamprocessor_spark.sources.avi import (
    FOURCC_DIB,
    FOURCC_MJPG,
    FOURCC_UAVR,
    AviFile,
    write_avi,
    write_engine_frames_avi,
)
from uav_streamprocessor_spark.sources.video_source import register


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _dib_frames(n: int, h: int = 36, w: int = 63, seed: int = 7):
    # width 63 exercises the 4-byte DIB stride padding (63*3 = 189 -> 192)
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


# -- container layer (no Spark) ---------------------------------------------


def test_dib_roundtrip_exact_pixels(tmp_path):
    frames = _dib_frames(9)
    p = write_avi(tmp_path / "cam.avi", frames, fps=24.0)
    a = AviFile(p)
    assert (a.width, a.height, a.n_frames) == (63, 36, 9)
    assert a.fps == pytest.approx(24.0) and a.fourcc == FOURCC_DIB
    for i, f0 in enumerate(frames):
        assert np.array_equal(a.frame_array(i), f0)


def test_missing_idx1_falls_back_to_movi_scan(tmp_path):
    frames = _dib_frames(5)
    a = AviFile(write_avi(tmp_path / "n.avi", frames, fps=25.0, with_idx1=False))
    assert a.n_frames == 5
    assert np.array_equal(a.frame_array(3), frames[3])


def test_absolute_offset_idx1_detected(tmp_path):
    """Both idx1 offset conventions occur in the wild: relative to the
    movi list fourcc (our writer) and absolute file offsets. The parser
    probes the first entry and must read either."""
    import struct

    frames = _dib_frames(6)
    p = write_avi(tmp_path / "rel.avi", frames, fps=25.0)
    raw = open(p, "rb").read()
    i = raw.find(b"idx1")
    size = struct.unpack("<I", raw[i + 4 : i + 8])[0]
    movi = raw.find(b"movi")
    ents = bytearray(raw[i + 8 : i + 8 + size])
    for e in range(0, size, 16):
        off = struct.unpack("<I", ents[e + 8 : e + 12])[0]
        ents[e + 8 : e + 12] = struct.pack("<I", off + movi)
    p2 = tmp_path / "abs.avi"
    p2.write_bytes(raw[: i + 8] + bytes(ents) + raw[i + 8 + size :])
    assert np.array_equal(AviFile(str(p2)).frame_array(4), frames[4])


def test_mjpg_demux_is_opaque_payload_passthrough(tmp_path):
    """Compressed streams demux byte-exactly without any pixel decode —
    the (frame_number, jpeg_bytes) contract. Odd payload sizes exercise
    the RIFF even-padding rule."""
    payloads = [bytes([i]) * (101 + i) for i in range(5)]
    p = write_avi(
        tmp_path / "m.avi", payloads, fps=30.0, fourcc=FOURCC_MJPG,
        width=64, height=36,
    )
    a = AviFile(p)
    assert a.fourcc == FOURCC_MJPG and a.n_frames == 5
    assert [a.frame_bytes(i) for i in range(5)] == payloads
    assert list(a.frames(1, 3)) == payloads[1:3]
    with pytest.raises(ValueError, match="uncompressed DIB"):
        a.frame_array(0)


def test_non_riff_file_rejected(tmp_path):
    p = tmp_path / "x.avi"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        AviFile(str(p))


# -- DataSource integration (S2 batch) ---------------------------------------


def test_avi_batch_read_through_datasource(spark, tmp_path):
    """Real container bytes through spark.read.format('uav_video'):
    header-derived metadata, seek-based partition split, exact pixels."""
    frames = _dib_frames(50, h=36, w=63)
    p = write_avi(tmp_path / "flight1.avi", frames, fps=24.0)
    df = (
        spark.read.format("uav_video")
        .option("path", p)
        .option("framesPerPartition", "20")
        .load()
    )
    # partition planning off the header frame count: ceil(50/20) = 3
    assert df.rdd.getNumPartitions() == 3
    rows = df.orderBy("frame_number").collect()
    assert len(rows) == 50
    r0 = rows[0]
    assert r0["camera_id"] == "flight1"  # file stem, reference naming
    assert (r0["width"], r0["height"]) == (63, 36)
    assert r0["fps"] == pytest.approx(24.0)
    assert [r["frame_number"] for r in rows] == list(range(50))
    # demuxed DIB pixels decode EXACTLY — a partition that sought to
    # frame 37 must serve frame 37, not an off-by-stride neighbor
    for i in (0, 19, 20, 37, 49):
        assert np.array_equal(decode_image(bytes(rows[i]["image"])), frames[i])


def test_avi_uavr_batch_passthrough(spark, tmp_path):
    """Engine raw-tensor buffers round-trip a real container untouched."""
    from uav_streamprocessor_spark.operators.pixel import make_test_image

    eng = [make_test_image(s, 36, 64) for s in range(8)]
    p = write_engine_frames_avi(tmp_path / "u.avi", eng, fps=25.0)
    rows = (
        spark.read.format("uav_video").option("path", p).load()
        .orderBy("frame_number").collect()
    )
    assert [bytes(r["image"]) for r in rows] == eng


def test_avi_camera_pushdown_prunes_whole_files(spark, tmp_path):
    pa = write_avi(tmp_path / "camA.avi", _dib_frames(10), fps=25.0)
    pb = write_avi(tmp_path / "camB.avi", _dib_frames(10, seed=9), fps=25.0)
    df = (
        spark.read.format("uav_video")
        .option("path", f"{pa},{pb}")
        .option("pushdown", "true")
        .load()
        .filter(F.col("camera_id") == "camA")
    )
    assert df.rdd.getNumPartitions() == 1  # camB pruned before any demux
    assert df.count() == 10


# -- S3 streaming + full pipeline -------------------------------------------


def test_avi_stream_read_availablenow(spark, tmp_path):
    """S3 over a real container: frame-index offsets, bounded per-batch
    ranges, all frames delivered exactly once under availableNow."""
    frames = _dib_frames(24, h=18, w=32)
    p = write_avi(tmp_path / "rt.avi", frames, fps=12.0)
    out: list = []
    q = (
        spark.readStream.format("uav_video")
        .option("path", p)
        .option("framesPerBatch", "10")
        .load()
        .writeStream.foreachBatch(
            lambda b, _id: out.extend(b.select("frame_number").collect())
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(r["frame_number"] for r in out) == list(range(24))


def test_full_pixel_pipeline_over_real_container_ungated(spark, tmp_path):
    """VERDICT r11 #1 'done' criterion: the uav_pixel_detections path
    (decode → keyframe decimate → fused letterbox+detect → explode) runs
    rows-green over REAL demuxed container bytes, un-gated, in this
    codec-free container."""
    from uav_streamprocessor_spark.plans.pipeline import keyframe_detections_flat

    # 90 frames -> 3 keyframes at the reference's every-30th decimation
    frames = _dib_frames(90, h=90, w=160, seed=11)
    p = write_avi(tmp_path / "mission.avi", frames, fps=25.0)
    src = (
        spark.read.format("uav_video")
        .option("path", p)
        .option("framesPerPartition", "30")
        .load()
    )
    flat = keyframe_detections_flat(src)
    rows = flat.collect()
    assert len(rows) > 0
    assert {r["camera_id"] for r in rows} == {"mission"}
    assert {r["frame_number"] for r in rows} <= {0, 30, 60}
    # detections carry the detector contract over real pixels (null rows
    # are keyframes with zero detections — explode_outer semantics)
    dets = [r for r in rows if r["confidence"] is not None]
    assert all(0.0 <= r["confidence"] <= 1.0 for r in dets)


def test_avi_to_recorder_sink_end_to_end(spark, tmp_path):
    """S2 → K1 over real container bytes: demux, record per-camera
    segments, reassemble the single-file deliverable."""
    from uav_streamprocessor_spark.streaming.sinks import (
        OrderedRecorderSink,
        reassemble_segments,
    )

    p = write_avi(tmp_path / "flightX.avi", _dib_frames(12, h=18, w=32), fps=30.0)
    src = spark.read.format("uav_video").option("path", p).load()
    rec = tmp_path / "rec"
    OrderedRecorderSink(str(rec))(src, 0)
    res = reassemble_segments(str(rec))
    assert res["flightX"]["segments"] == 1 and not res["flightX"]["reencoded"]
    lines = [json.loads(x) for x in open(rec / "flightX.jsonl")]
    assert [x["frame_number"] for x in lines] == list(range(12))
    assert lines[0]["fps"] == 30.0 and lines[0]["w"] == 32
