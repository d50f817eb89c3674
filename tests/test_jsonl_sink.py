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
