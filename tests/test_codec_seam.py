"""Codec drop-in contract tests (VERDICT r2 #6).

No video/image codec ships in this container, so the engine gates real
decode behind two seams: `_open_decoder` (video source, cv2.VideoCapture
shape — reference uav/frame_reader.py:116-155) and the pixel ops' codec
pair (cv2.imencode/imdecode shape — frame_processing.py:221). These tests
prove the seams are REAL: a cv2-shaped fake module / codec pair drops in
and the Spark plumbing — DataSource planning, partition reads, Arrow UDF
batches — runs unmodified, end to end, through executors.
"""

from __future__ import annotations

import textwrap

import numpy as np
import pytest
from pyspark.sql import functions as F

# Deterministic cv2-shaped module: 12 frames of 24x32, pixel value =
# frame index. Written to a file and shipped via addPyFile so EXECUTOR
# python workers import it too (driver-side monkeypatching never reaches
# them). Constants carry real cv2 values.
FAKE_CV2 = textwrap.dedent(
    """
    import numpy as np

    CAP_PROP_POS_FRAMES = 1
    CAP_PROP_FRAME_WIDTH = 3
    CAP_PROP_FRAME_HEIGHT = 4
    CAP_PROP_FPS = 5
    CAP_PROP_FRAME_COUNT = 7

    class VideoCapture:
        def __init__(self, path):
            self._ok = str(path).endswith(".mp4")
            self._n, self._w, self._h = 12, 32, 24
            self._pos = 0

        def isOpened(self):
            return self._ok

        def get(self, prop):
            return {CAP_PROP_FPS: 24.0, CAP_PROP_FRAME_COUNT: self._n,
                    CAP_PROP_FRAME_WIDTH: self._w,
                    CAP_PROP_FRAME_HEIGHT: self._h}[prop]

        def set(self, prop, value):
            if prop == CAP_PROP_POS_FRAMES:
                self._pos = int(value)

        def read(self):
            if self._pos >= self._n:
                return False, None
            i = self._pos
            self._pos += 1
            return True, np.full((self._h, self._w, 3), i % 256, np.uint8)

        def release(self):
            pass
    """
)


@pytest.fixture(scope="module")
def fake_cv2_on_cluster(spark, tmp_path_factory):
    from uav_streamprocessor_spark.sources.video_source import register

    register(spark)
    p = tmp_path_factory.mktemp("fakecv2") / "cv2.py"
    p.write_text(FAKE_CV2)
    # reaches the driver's planning worker AND every executor worker
    spark.sparkContext.addPyFile(str(p))
    return spark


def test_video_source_runs_on_cv2_shaped_decoder(fake_cv2_on_cluster):
    """A non-synthetic path now resolves through _Cv2Decoder: open →
    probe props → seek → read(start, end), partitioned, on executors —
    the exact call sequence a real cv2 build would see."""
    spark = fake_cv2_on_cluster
    df = (
        spark.read.format("uav_video")
        .option("path", "/videos/camZ.mp4")
        .option("framesPerPartition", "5")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # ceil(12/5): range partitioning ran
    rows = df.orderBy("frame_number").collect()
    assert [r["frame_number"] for r in rows] == list(range(12))
    assert {(r["camera_id"], r["width"], r["height"], r["fps"]) for r in rows} == {
        ("camZ", 32, 24, 24.0)
    }
    # frames decoded through the fake capture, re-encoded by the engine codec
    from uav_streamprocessor_spark.operators.pixel import decode_image

    img7 = decode_image(bytes(rows[7]["image"]))
    assert img7.shape == (24, 32, 3) and (img7 == 7).all()


def test_video_source_seek_respected_mid_file(fake_cv2_on_cluster):
    """A partition starting mid-file must CAP_PROP_POS_FRAMES-seek, not
    re-read from zero — frame content equals its index, so a missing
    seek shifts every pixel value."""
    spark = fake_cv2_on_cluster
    df = (
        spark.read.format("uav_video")
        .option("path", "/videos/camZ.mp4")
        .option("framesPerPartition", "4")
        .load()
        .filter(F.col("frame_number") >= 8)
    )
    from uav_streamprocessor_spark.operators.pixel import decode_image

    rows = df.orderBy("frame_number").collect()
    assert [r["frame_number"] for r in rows] == [8, 9, 10, 11]
    assert all(
        (decode_image(bytes(r["image"])) == r["frame_number"]).all() for r in rows
    )


def test_decoder_reread_restarts_at_start(fake_cv2_on_cluster):
    """The reference's re-iteration defect (SURVEY.md §0): a second
    iteration over VideoReader resumes MID-STREAM because __iter__ reuses
    the advanced capture position (uav/frame_reader.py:135-140). The
    engine's decoder contract requires read(start, end) to be stateless
    w.r.t. prior calls — Spark retries/speculative tasks re-read the same
    partition range on the same long-lived worker, so a resume-where-you-
    left-off decoder would silently shift every retried frame. Two
    sequential read(0, n) calls on ONE decoder must both start at frame 0
    and return identical bytes — for the injected cv2 decoder AND the
    synthetic one."""
    from uav_streamprocessor_spark.sources.video_source import _open_decoder

    for spec in (
        "/videos/camZ.mp4",
        "synthetic://camS?frames=12&w=32&h=24&seed=7",
    ):
        dec = _open_decoder(spec)
        first = [(t[1], bytes(t[5])) for t in dec.read(0, 6)]
        second = [(t[1], bytes(t[5])) for t in dec.read(0, 6)]
        assert [i for i, _ in first] == list(range(6)), spec
        assert second == first, f"{spec}: re-read did not restart at frame 0"
        # and a mid-file seek after a sequential read still lands exactly
        tail = [(t[1], bytes(t[5])) for t in dec.read(8, 12)]
        assert [i for i, _ in tail] == [8, 9, 10, 11], spec


def test_unopenable_source_raises_like_reference(fake_cv2_on_cluster):
    """isOpened() False → IOError at open, mirroring frame_reader's
    open-failure path (not a silent empty source)."""
    from uav_streamprocessor_spark.sources.video_source import _open_decoder

    with pytest.raises(IOError):
        _open_decoder("/videos/not_a_video.avi")


def test_pixel_ops_run_on_swapped_codec(spark):
    """letterbox_and_detect with a jpeg-shaped fake codec (magic header +
    tensor payload — structurally like cv2.imencode output) must produce
    EXACTLY the detections of the raw-tensor codec on the same pixels:
    the ops depend only on the (encode, decode) contract. The codec pair
    pickles by value into the mapInPandas closure — no executor-side
    module injection needed."""
    from uav_streamprocessor_spark.operators.pixel import (
        decode_image,
        letterbox_and_detect,
        make_test_image,
    )

    MAGIC = b"FAKEJPG1"

    def fake_encode(arr):
        h, w = arr.shape[:2]
        return MAGIC + h.to_bytes(4, "big") + w.to_bytes(4, "big") + arr.tobytes()

    def fake_decode(buf):
        assert buf[:8] == MAGIC, "fake codec fed non-fake bytes"
        h = int.from_bytes(buf[8:12], "big")
        w = int.from_bytes(buf[12:16], "big")
        return np.frombuffer(buf, np.uint8, offset=16).reshape(h, w, 3)

    arrays = [decode_image(make_test_image(s, 36, 64)) for s in range(8)]
    schema = "camera_id string, frame_number long, image binary"

    def run(codec_encode, codec):
        frames = spark.createDataFrame(
            [("cam0", i, codec_encode(a)) for i, a in enumerate(arrays)], schema
        )
        out = letterbox_and_detect(frames, codec=codec)
        return sorted(
            (r["frame_number"], tuple(map(tuple, r["detections"])))
            for r in out.select("frame_number", "detections").collect()
        )

    from uav_streamprocessor_spark.operators.pixel import encode_image

    raw = run(encode_image, None)
    fake = run(fake_encode, (fake_encode, fake_decode))
    assert fake == raw
    assert any(dets for _, dets in fake)  # non-vacuous: some boxes found
