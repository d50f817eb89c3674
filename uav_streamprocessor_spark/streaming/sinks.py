"""Streaming sinks (SURVEY.md §2 ops K1/K2; §7 M4).

The reference's sinks are a lazily-initialized MP4 writer
(uav/frame_processing.py:132-200) and a fire-and-forget HTTP POST
(uav/frame_processing.py:203-262, errors swallowed per frame → at-most-
once). The engine upgrades both to checkpointed foreachBatch sinks:
at-least-once delivery, per-row error tolerance preserved, and the K1
global-order requirement made explicit (per-batch orderBy + single
writer — SURVEY.md §7 'What's hard' #2).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uav_streamprocessor_spark.config import DEFAULT_CONFIG, PipelineConfig


@dataclass
class HttpSenderSink:
    """K2 FrameSender as foreachBatch: POSTs each keyframe row's payload
    to `url` with a bounded timeout; per-row failures are recorded, not
    fatal (the reference swallows them at frame granularity,
    frame_processing.py:257-262 — here they're counted and surfaced).

    Delivery is at-least-once: a batch retried after a sink crash re-sends
    rows (the reference is at-most-once; the delta is documented, not
    hidden). `post` is injectable for tests/no-network containers.
    """

    url: str
    cfg: PipelineConfig = field(default_factory=lambda: DEFAULT_CONFIG)
    post: Callable[[str, bytes, str, float], int] | None = None
    errors: int = 0
    sent: int = 0

    def __post_init__(self) -> None:
        # URL validation as in the reference (frame_processing.py:208-209)
        if not self.url.startswith(("http://", "https://")):
            raise ValueError(f"target URL must be http(s)://, got {self.url!r}")

    def _default_post(self, url: str, image: bytes, metadata: str, timeout: float) -> int:
        import urllib.request

        req = urllib.request.Request(
            url,
            data=json.dumps({"metadata": metadata, "n_bytes": len(image or b"")}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        post = self.post or self._default_post
        timeout = self.cfg.http_timeout_s
        url = self.url
        rows = batch.select("frame_number", "frame_jpeg", "metadata").collect()
        for r in rows:
            try:
                status = post(url, r["frame_jpeg"], r["metadata"], timeout)
                if status >= 400:
                    raise OSError(f"HTTP {status}")
                self.sent += 1
            except Exception:
                self.errors += 1  # skip-and-continue per row


@dataclass
class OrderedRecorderSink:
    """K1 FrameSaver as foreachBatch: appends frame rows to one file per
    camera in frame order.

    The reference relies on implicit arrival order (main.py:113); Spark
    partitions destroy that, so order is re-established per batch with
    orderBy(frame_number) and a single writer per camera — a deliberate
    throughput/order trade confined to this sink. Config (size, fps) is
    latched from the first frame seen per camera, mirroring
    frame_processing.py:147-159; later size mismatches are skipped
    (:172-179) and counted.
    """

    out_dir: str
    cfg: PipelineConfig = field(default_factory=lambda: DEFAULT_CONFIG)
    skipped: int = 0
    _latched: dict = field(default_factory=dict)

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        out = Path(self.out_dir)
        out.mkdir(parents=True, exist_ok=True)
        cols = ["camera_id", "frame_number", "width", "height", "fps"]
        rows = batch.select(*cols).orderBy("camera_id", "frame_number").collect()
        for r in rows:
            cam = r["camera_id"]
            if cam not in self._latched:
                fps = r["fps"]
                self._latched[cam] = (
                    r["width"],
                    r["height"],
                    fps if fps and fps > 0 else self.cfg.fallback_fps,
                )
            w, h, fps = self._latched[cam]
            if (r["width"], r["height"]) != (w, h):
                self.skipped += 1
                continue
            with open(out / f"{cam}.jsonl", "a") as f:
                f.write(
                    json.dumps(
                        {"frame_number": r["frame_number"], "w": w, "h": h, "fps": fps}
                    )
                    + "\n"
                )


def parquet_sink(df: DataFrame, path: str, checkpoint: str, partition_by: list[str] | None = None):
    """The canonical at-scale sink: checkpointed parquet append,
    partitioned (e.g. by camera_id/date) so downstream scans prune."""
    w = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w
