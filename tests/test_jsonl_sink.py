"""JSONL DataSource writer: content fidelity + the commit protocol's
atomicity guarantees (temp files never visible as output, _SUCCESS only
after publish, aborted task files cleaned up)."""

from __future__ import annotations

import json
import os

import pytest

from uav_streamprocessor_spark.sources import jsonl_sink


def test_jsonl_writer_commits_atomically(spark, tmp_path):
    jsonl_sink.register(spark)
    out = str(tmp_path / "out")
    df = spark.range(1000).selectExpr("id", "id * 2 AS doubled")
    df.repartition(4).write.format("uav_jsonl").mode("append").option("path", out).save()

    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names
    parts = [n for n in names if n.startswith("part-")]
    assert len(parts) == 4
    assert not [n for n in names if n.startswith("_temp-")], "temp leaked"

    rows = []
    for p in parts:
        with open(os.path.join(out, p)) as f:
            rows += [json.loads(line) for line in f]
    assert len(rows) == 1000
    assert {r["id"] for r in rows} == set(range(1000))
    assert all(r["doubled"] == r["id"] * 2 for r in rows)
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert f.read() == "1000"


def test_jsonl_writer_abort_leaves_no_published_output(spark, tmp_path):
    """A failing task must abort the job with no part files or _SUCCESS
    published — the commit protocol's whole point."""
    jsonl_sink.register(spark)
    out = str(tmp_path / "out_fail")
    df = spark.range(100).selectExpr(
        "id", "CASE WHEN id = 50 THEN raise_error('boom') ELSE 'ok' END AS v"
    )
    with pytest.raises(Exception, match="boom"):
        df.repartition(2).write.format("uav_jsonl").mode("append").option("path", out).save()
    if os.path.isdir(out):
        names = os.listdir(out)
        assert not [n for n in names if n.startswith("part-")]
        assert "_SUCCESS" not in names


def test_jsonl_stream_writer_publishes_per_batch_and_replay_converges(
    spark, tmp_path
):
    """Streaming half of the DataSource writer: each micro-batch commits
    into its own batch-{id}/ directory with files + _SUCCESS and no temp
    litter; a full replay (fresh checkpoint, same sink dir) republishes
    the SAME batch directories instead of appending duplicates."""
    jsonl_sink.register(spark)
    src = tmp_path / "stream_src"
    base = spark.range(300).selectExpr("id", "id * 3 AS tripled")
    for m in range(3):
        base.filter(f"id % 3 = {m}").coalesce(1).write.parquet(
            str(src / f"f{m}")
        )
    out = str(tmp_path / "stream_out")

    def run(tag):
        stream = (
            spark.readStream.schema("id long, tripled long")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src) + "/*")
        )
        q = (
            stream.writeStream.format("uav_jsonl")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    def read_all():
        rows = []
        batch_dirs = sorted(
            d for d in os.listdir(out) if d.startswith("batch-")
        )
        for d in batch_dirs:
            names = os.listdir(os.path.join(out, d))
            assert "_SUCCESS" in names
            for p in sorted(n for n in names if n.startswith("part-")):
                with open(os.path.join(out, d, p)) as f:
                    rows += [json.loads(line) for line in f]
        return batch_dirs, rows

    run("r1")
    batch_dirs, rows = read_all()
    assert len(batch_dirs) == 3
    assert not [n for n in os.listdir(out) if n.startswith("_temp-")]
    assert {r["id"] for r in rows} == set(range(300))
    assert all(r["tripled"] == r["id"] * 3 for r in rows)

    run("r2")  # replay everything: same dirs, same rows, no duplicates
    batch_dirs2, rows2 = read_all()
    assert batch_dirs2 == batch_dirs
    assert sorted(r["id"] for r in rows2) == sorted(r["id"] for r in rows)


def test_stale_temp_files_swept_on_commit(spark, tmp_path):
    """ADVICE r4: a task that dies mid-write leaks its _temp-* file —
    commit()/abort() never learn its name. The commit-time sweep must
    clear any orphaned temp (batch and streaming writers both)."""
    jsonl_sink.register(spark)

    # batch writer
    out_b = tmp_path / "batch_out"
    os.makedirs(out_b)
    stale_b = out_b / "_temp-deadbeef.jsonl"
    stale_b.write_text('{"orphan": true}\n')
    spark.range(10).write.format("uav_jsonl").mode("append").option(
        "path", str(out_b)
    ).save()
    assert not stale_b.exists()
    assert (out_b / "_SUCCESS").exists()

    # streaming writer
    out_s = tmp_path / "stream_out"
    os.makedirs(out_s)
    stale_s = out_s / "_temp-cafebabe.jsonl"
    stale_s.write_text('{"orphan": true}\n')
    src = tmp_path / "src"
    spark.range(20).coalesce(1).write.parquet(str(src / "f0"))
    q = (
        spark.readStream.schema("id long")
        .parquet(str(src) + "/*")
        .writeStream.format("uav_jsonl")
        .option("path", str(out_s))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not stale_s.exists()
    assert not [n for n in os.listdir(out_s) if n.startswith("_temp-")]
