"""K1's codec-free REAL-video deliverable: OrderedRecorderSink(fmt="avi")
muxes engine frames into spec-correct BI_RGB AVI segments with the
pure-Python writer (sources/avi.AviStreamWriter) and reassemble_segments
recovers the single-file deliverable by LOSSLESS chunk-level remux — the
reference's one-mp4-per-source output (uav/frame_processing.py:142-159)
reproduced end-to-end in this container with zero codec dependencies,
including the S2 round-trip: the deliverable reads back pixel-exactly
through the `uav_video` DataSource."""

from __future__ import annotations

import numpy as np
import pytest

from uav_streamprocessor_spark.operators.pixel import decode_image, make_test_image
from uav_streamprocessor_spark.sources.avi import (
    FOURCC_MJPG,
    AviFile,
    AviStreamWriter,
    write_avi,
)
from uav_streamprocessor_spark.sources.video_source import register
from uav_streamprocessor_spark.streaming.sinks import (
    OrderedRecorderSink,
    reassemble_segments,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _rgb_frames(n, h=18, w=32, seed=7):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_stream_writer_bytes_equal_one_shot_writer(tmp_path):
    """The incremental (patch-on-close) writer and the one-shot muxer
    must emit identical bytes — the streaming sink inherits every fixture
    round-trip proof for free."""
    frames = _rgb_frames(6)
    one_shot = tmp_path / "a.avi"
    streamed = tmp_path / "b.avi"
    write_avi(one_shot, frames, fps=30.0)
    w = AviStreamWriter(streamed, 32, 18, fps=30.0)
    for f in frames:
        w.write_frame(f)
    w.close()
    assert one_shot.read_bytes() == streamed.read_bytes()
    # close is idempotent and reports the frame count
    assert w.n_frames == 6
    w.close()

    # opaque-fourcc parity too (odd payload sizes exercise chunk padding)
    payloads = [bytes([i]) * 101 for i in range(4)]
    p1, p2 = tmp_path / "c.avi", tmp_path / "d.avi"
    write_avi(p1, payloads, fps=25.0, fourcc=FOURCC_MJPG, width=8, height=6)
    w2 = AviStreamWriter(p2, 8, 6, fps=25.0, fourcc=FOURCC_MJPG)
    for p in payloads:
        w2.write_frame(p)
    w2.close()
    assert p1.read_bytes() == p2.read_bytes()


def _frames_df(spark, cams_frames):
    rows = [
        (cam, n, 32, 18, 25.0, make_test_image(seed0 + n, 18, 32))
        for cam, count, seed0 in cams_frames
        for n in range(count)
    ]
    return spark.createDataFrame(
        rows,
        "camera_id string, frame_number long, width int, height int, "
        "fps double, image binary",
    ).repartition(8)


def test_avi_recorder_sink_end_to_end(spark, tmp_path):
    """fmt='avi' over two micro-batches → lossless reassembly → the
    single-file deliverable demuxes to the exact source pixels in frame
    order, for every camera."""
    rec = tmp_path / "rec"
    sink = OrderedRecorderSink(str(rec), fmt="avi")
    sink(_frames_df(spark, [("camA", 5, 100), ("camB", 3, 900)]), 0)
    # batch 1 continues camA only
    b1 = _frames_df(spark, [("camA", 4, 105)]).selectExpr(
        "camera_id", "frame_number + 5 AS frame_number", "width", "height",
        "fps", "image",
    )
    sink(b1, 1)

    res = reassemble_segments(str(rec), fmt="avi")
    assert res["camA"] == {
        "segments": 2, "reencoded": False, "fps_fallback": False,
    }
    assert res["camB"]["segments"] == 1

    av = AviFile(str(rec / "camA.avi"))
    assert av.n_frames == 9 and (av.width, av.height) == (32, 18)
    assert abs(av.fps - 25.0) < 1e-9
    for i in range(9):
        expected = decode_image(make_test_image(100 + i, 18, 32))
        assert (av.frame_array(i) == expected).all()
    avb = AviFile(str(rec / "camB.avi"))
    assert avb.n_frames == 3
    assert (avb.frame_array(2) == decode_image(make_test_image(902, 18, 32))).all()

    # chunk-level losslessness: deliverable payloads are the segment
    # payloads verbatim, in batch order
    seg_payloads = [
        p
        for seg in sorted(rec.glob("camA.b*.avi"))
        for p in AviFile(str(seg)).frames()
    ]
    assert list(av.frames()) == seg_payloads

    # replayed batch overwrites its own segment: deliverable unchanged
    before = (rec / "camA.avi").read_bytes()
    sink2 = OrderedRecorderSink(str(rec), fmt="avi")
    sink2(_frames_df(spark, [("camA", 5, 100), ("camB", 3, 900)]), 0)
    reassemble_segments(str(rec), fmt="avi")
    assert (rec / "camA.avi").read_bytes() == before


def test_avi_deliverable_reads_back_through_uav_video_source(spark, tmp_path):
    """K1 → S2 loop: the recorder's single-file deliverable is a real
    container the engine's own DataSource (and any player) demuxes —
    frame numbers, dims, fps, and PIXELS all survive the round trip."""
    rec = tmp_path / "rec"
    sink = OrderedRecorderSink(str(rec), fmt="avi")
    sink(_frames_df(spark, [("mission", 7, 40)]), 0)
    reassemble_segments(str(rec), fmt="avi")

    df = (
        spark.read.format("uav_video")
        .option("path", str(rec / "mission.avi"))
        .load()
    )
    rows = sorted(df.collect(), key=lambda r: r["frame_number"])
    assert [r["frame_number"] for r in rows] == list(range(7))
    assert rows[0]["camera_id"] == "mission"
    assert (rows[0]["width"], rows[0]["height"]) == (32, 18)
    for r in rows:
        expected = decode_image(make_test_image(40 + r["frame_number"], 18, 32))
        assert (decode_image(bytes(r["image"])) == expected).all()


def test_avi_writer_rejects_reserved_camera_id(tmp_path):
    from uav_streamprocessor_spark.streaming.sinks import _AviCameraWriter

    with pytest.raises(ValueError, match="reserved segment suffix"):
        _AviCameraWriter(tmp_path, "camA.b000001", 0, 32, 18, 25.0)


def test_full_streaming_pipeline_real_avi_both_ends(spark, tmp_path):
    """The reference's whole loop with REAL containers on BOTH ends,
    codec-free: readStream demuxes an actual AVI file, the keyframe→
    detect→send branch posts payloads, the record branch muxes real AVI
    segments, and reassembly yields a single playable file whose pixels
    equal the source's — uav/main.py:109-141 end to end in this
    container with zero codec dependencies."""
    import json

    from uav_streamprocessor_spark.streaming.sinks import HttpSenderSink
    from uav_streamprocessor_spark.streaming.uav_pipeline import (
        run_streaming_pipeline,
    )

    frames = _rgb_frames(60, h=36, w=64, seed=3)
    src = write_avi(tmp_path / "patrol.avi", frames, fps=25.0)

    delivered = tmp_path / "delivered"
    delivered.mkdir()
    ddir = str(delivered)

    def fake_post(url, image, metadata, timeout):
        fn = json.loads(metadata)["frame_number"]
        with open(f"{ddir}/{fn}.json", "w") as f:
            f.write(metadata)
        return 200

    result = run_streaming_pipeline(
        spark,
        src,
        str(tmp_path / "rec_out"),
        str(tmp_path / "ckpt"),
        sender=HttpSenderSink("http://cc.test/ingest", post=fake_post),
        frames_per_batch=25,  # partition granularity (availableNow drains
        record_fmt="avi",     # the whole source in one micro-batch)
    )
    assert result["sent"] == 2 and result["send_errors"] == 0  # keyframes 0, 30
    assert {p.stem for p in delivered.iterdir()} == {"0", "30"}
    assert result["skipped_frames"] == 0
    seg = result["segments"]["patrol"]
    assert seg["segments"] >= 1 and not seg["reencoded"]

    out = AviFile(str(tmp_path / "rec_out" / "patrol.avi"))
    assert out.n_frames == 60 and (out.width, out.height) == (64, 36)
    assert abs(out.fps - 25.0) < 1e-9
    for i in (0, 1, 24, 25, 30, 59):  # batch boundaries + keyframes + ends
        assert (out.frame_array(i) == frames[i]).all()


def test_mjpeg_recorder_compresses_and_round_trips(spark, tmp_path):
    """fmt='mjpeg': the codec-free COMPRESSED deliverable — real baseline
    JPEGs inside MJPG-AVI segments, lossless chunk reassembly, readable
    back through the uav_video DataSource (which re-enters the engine's
    JPEG decoder), and materially smaller than both the raw frames and
    the uncompressed DIB lane."""
    from uav_streamprocessor_spark.operators.jpeg import is_jpeg
    from uav_streamprocessor_spark.operators.pixel import decode_image, encode_image
    from uav_streamprocessor_spark.sources.avi import FOURCC_MJPG

    h, w, n = 48, 64, 6
    yy, xx = np.mgrid[0:h, 0:w]
    frames = [
        np.stack(
            [
                np.sin(yy / 9 + i) * 100 + 128,
                np.cos(xx / 11 + i) * 100 + 128,
                np.sin((yy + xx) / 14) * 100 + 128,
            ],
            -1,
        ).astype(np.uint8)
        for i in range(n)
    ]
    df = spark.createDataFrame(
        [("camM", i, w, h, 25.0, encode_image(f)) for i, f in enumerate(frames)],
        "camera_id string, frame_number long, width int, height int, "
        "fps double, image binary",
    ).repartition(4)

    rec = tmp_path / "rec"
    OrderedRecorderSink(str(rec), fmt="mjpeg")(df, 0)
    res = reassemble_segments(str(rec), fmt="mjpeg")
    assert res["camM"] == {
        "segments": 1, "reencoded": False, "fps_fallback": False,
    }

    av = AviFile(str(rec / "camM.avi"))
    assert av.fourcc == FOURCC_MJPG and av.n_frames == n
    assert all(is_jpeg(p) for p in av.frames())
    raw_bytes = n * h * w * 3
    assert (rec / "camM.avi").stat().st_size < raw_bytes / 3  # real compression

    sdf = (
        spark.read.format("uav_video")
        .option("path", str(rec / "camM.avi"))
        .load()
    )
    rows = sorted(sdf.collect(), key=lambda r: r["frame_number"])
    assert [r["frame_number"] for r in rows] == list(range(n))
    for r, src in zip(rows, frames):
        out = decode_image(bytes(r["image"]))
        mse = np.mean((src.astype(float) - out.astype(float)) ** 2)
        assert 10 * np.log10(255.0**2 / mse) >= 32.0


def test_remux_refuses_mixed_lanes_in_one_out_dir(tmp_path):
    """The 'avi' (DIB) and 'mjpeg' lanes share the .avi segment
    extension: if both recorders ever wrote segments for the SAME camera
    into one out_dir, chunk-level concat under segment 0's latched
    fourcc would produce a silently corrupt deliverable (ADVICE r12).
    _remux_avi must refuse with a descriptive error instead."""
    from uav_streamprocessor_spark.operators.jpeg import encode_jpeg
    from uav_streamprocessor_spark.sources.avi import FOURCC_MJPG, write_avi

    rec = tmp_path / "rec"
    rec.mkdir()
    frame = _rgb_frames(1)[0]
    write_avi(rec / "camX.b000000.avi", [frame], fps=25.0)  # DIB lane
    jpg = encode_jpeg(frame, quality=90)
    write_avi(
        rec / "camX.b000001.avi", [jpg], fps=25.0, fourcc=FOURCC_MJPG,
        width=32, height=18,
    )  # mjpeg lane, same camera
    with pytest.raises(ValueError, match="mixed recorder lanes"):
        reassemble_segments(str(rec), fmt="avi", keep_segments=True)

    # geometry mismatch within ONE lane is refused the same way
    rec2 = tmp_path / "rec2"
    rec2.mkdir()
    write_avi(rec2 / "camY.b000000.avi", [frame], fps=25.0)
    write_avi(
        rec2 / "camY.b000001.avi", _rgb_frames(1, h=8, w=16), fps=25.0,
    )
    with pytest.raises(ValueError, match="latched"):
        reassemble_segments(str(rec2), fmt="avi", keep_segments=True)
