"""Python DataSource WRITER: atomic partitioned JSONL output.

Completes the engine's DataSource-v2 surface: sources/video_source.py
implements the reader + stream-reader halves; this implements the writer
half with the full task-commit protocol — the piece that makes
distributed writes safe under task retries:

  write(iterator)  -> each task writes to a UUID-suffixed temp file and
                      returns its name in a WriterCommitMessage
  commit(messages) -> the DRIVER renames only the files named by
                      committed tasks into place and writes _SUCCESS
  abort(messages)  -> temp files are left un-renamed (and removed);
                      a retried/zombie task's file is never published

Reference analogue: FrameSaver opens one writer per source and appends
sequentially (uav/frame_processing.py:142-159) — safe only because the
reference is single-threaded. The commit protocol is what the same
contract requires with N concurrent writers and at-least-once tasks.

JSONL because the container has no extra codecs and the format is
line-atomic; the protocol is format-agnostic.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class JsonlCommitMessage(WriterCommitMessage):
    def __init__(self, temp_name: str, rows: int):
        self.temp_name = temp_name
        self.rows = rows


def _sweep_stale_temps(path: str) -> None:
    """Remove orphaned `_temp-*` files. commit()/abort() only learn the
    temp names of tasks that COMPLETED write(); a task that dies mid-
    write leaks its temp forever (and a streaming sink re-leaks per
    retried micro-batch). By the time the driver runs commit/abort,
    every published temp has already been renamed away, so anything
    still matching the prefix is garbage from a failed or zombie task
    of this or an earlier batch. Single-writer-per-path is the sink's
    existing contract (micro-batches are sequential), so the sweep
    can't race a live writer."""
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return
    for name in names:
        if name.startswith("_temp-"):
            try:
                os.remove(os.path.join(path, name))
            except FileNotFoundError:
                pass


class JsonlWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("uav_jsonl requires a path option")

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        temp_name = f"_temp-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, temp_name), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return JsonlCommitMessage(temp_name, n)

    def commit(self, messages):
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(os.path.join(self.path, m.temp_name), final)
            total += m.rows
        # publish only after every rename: readers gate on _SUCCESS
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(str(total))
        _sweep_stale_temps(self.path)

    def abort(self, messages):
        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.temp_name))
            except FileNotFoundError:
                pass
        _sweep_stale_temps(self.path)


class JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming half of the writer: the same temp-file + driver-rename
    protocol, with the batch id in the publish path. Each micro-batch
    commits into its own `batch-{id}/` directory (files + _SUCCESS), so
    an at-least-once REPLAY republishes the same directory instead of
    appending duplicates — the file-sink analogue of the partition-
    overwrite idempotence every store in streaming/ uses. Task retries
    within a batch are handled exactly like the batch writer: only the
    files named by committed tasks are renamed into place."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("uav_jsonl requires a path option")

    def write(self, iterator):
        os.makedirs(self.path, exist_ok=True)
        temp_name = f"_temp-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, temp_name), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return JsonlCommitMessage(temp_name, n)

    def commit(self, messages, batchId):
        d = os.path.join(self.path, f"batch-{batchId:05d}")
        os.makedirs(d, exist_ok=True)
        # replayed batch: drop the previous publish of THIS batch only
        for old in os.listdir(d):
            os.remove(os.path.join(d, old))
        total = 0
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = os.path.join(d, f"part-{i:05d}.jsonl")
            os.replace(os.path.join(self.path, m.temp_name), final)
            total += m.rows
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write(str(total))
        _sweep_stale_temps(self.path)

    def abort(self, messages, batchId):
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.temp_name))
            except FileNotFoundError:
                pass
        _sweep_stale_temps(self.path)


class JsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "uav_jsonl"

    def writer(self, schema, overwrite: bool):
        return JsonlWriter(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return JsonlStreamWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(JsonlDataSource)
