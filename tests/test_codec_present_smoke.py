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
    """cv2-shaped module recording every VideoWriter interaction."""
    opened = []  # (path, fourcc, fps, size) per constructor call

    class _FakeWriter:
        def __init__(self, path, fourcc, fps, size):
            self.path, self.fourcc, self.fps, self.size = path, fourcc, fps, size
            self.frames = []
            self.released = False
            opened.append(self)

        def isOpened(self):
            return True

        def write(self, frame):
            # cv2 requires a writable, contiguous BGR uint8 array
            assert frame.flags["WRITEABLE"] and frame.flags["C_CONTIGUOUS"]
            assert frame.dtype == np.uint8 and frame.ndim == 3
            self.frames.append(frame.shape)

        def release(self):
            self.released = True

    mod = types.ModuleType("cv2")
    mod.VideoWriter = _FakeWriter
    mod.VideoWriter_fourcc = lambda *c: "".join(c)
    mod._opened = opened
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
