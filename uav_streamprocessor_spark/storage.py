"""Storage layout utilities — the 100 TB data-layout story (SCALE.md).

Bucketing co-locates join keys at write time: two tables bucketed by the
same keys into the same bucket count join WITHOUT a shuffle — at 100 TB
the frames⋈detections join (the engine's hottest) becomes a zero-exchange
local join. Verified structurally in tests (no Exchange in the joined
physical plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+optionally sorted) managed table. Sorting
    within buckets additionally enables merge-join without sort and better
    min/max pruning."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def bucketed_join_plan_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> tuple[bool, str]:
    """Join two same-bucketed tables and report whether the physical plan
    contains any shuffle Exchange (it must not, when bucket spec matches
    the join keys). Returns (shuffle_free, plan_text)."""
    joined = spark.table(left_table).join(spark.table(right_table), on)
    return plan_is_shuffle_free(joined)


def plan_is_shuffle_free(df: DataFrame) -> tuple[bool, str]:
    """Structural shuffle detection: a shuffle node prints as
    '(N) Exchange' in explain('formatted') (its hashpartitioning arguments
    are on a separate line, so substring checks on
    'Exchange hashpartitioning' never fire). BroadcastExchange is allowed —
    dim broadcast is not a shuffle."""
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    shuffle_free = re.search(r"\(\d+\) Exchange\b", plan) is None
    return shuffle_free, plan


def formatted_plan(df: DataFrame) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_window_specs(df: DataFrame) -> list[tuple[bool, str]]:
    """(is_partitioned, arguments_line) for every Window node in the
    formatted physical plan. A Window's Arguments line carries up to 3
    top-level bracket groups ([exprs], [partition], [order]); either of
    the last two may be absent. With 2 groups the second is ambiguous by
    count alone — but an ORDER group always prints sort directions
    (`ASC`/`DESC`), a partition group never does, so a 2-group line is
    partitioned iff its second group carries no direction marker. A
    global window (no partition spec) is a single-partition sort, the
    scale anti-pattern the plan audit hunts."""
    import re

    lines = formatted_plan(df).splitlines()
    out: list[tuple[bool, str]] = []
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) Window\b", line.strip()):
            for nxt in lines[i + 1 : i + 8]:
                if nxt.strip().startswith("Arguments:"):
                    depth = 0
                    groups: list[str] = []
                    buf: list[str] = []
                    for ch in nxt:
                        if ch == "[":
                            if depth == 0:
                                buf = []
                            depth += 1
                            if depth == 1:
                                continue
                        elif ch == "]":
                            depth -= 1
                            if depth == 0:
                                groups.append("".join(buf))
                                continue
                        if depth >= 1:
                            buf.append(ch)
                    if len(groups) >= 3:
                        partitioned = True
                    elif len(groups) == 2:
                        partitioned = not re.search(
                            r"\b(ASC|DESC)\b", groups[1]
                        )
                    else:
                        partitioned = False
                    out.append((partitioned, nxt.strip()))
                    break
    return out


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_files: int,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-files compaction — the standing maintenance job of any
    streaming ingest (each micro-batch leaves a file; a year of
    micro-batches leaves millions, and at 100 TB the NameNode/listing
    cost and per-file scan overhead dominate). Rewrites `path` into
    `target_files` files, optionally sorted within files so parquet
    row-group min/max stats become selective again (late-arriving data
    interleaves key ranges; sorting restores skip-effectiveness).

    Write-then-swap: the rewrite lands in a sibling temp dir and
    replaces the original only after success, so a failed compaction
    never loses data. Returns the resulting file count.
    """
    import os
    import shutil

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    out = df.repartition(target_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    )


def zorder_key(col_a, col_b, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative int columns — the
    multi-dimensional clustering key. Linear sort makes file min/max
    stats selective for ONE column; writing files sorted by the
    interleaved key keeps BOTH columns' ranges tight per file, so a
    predicate on either (or a 2D box) skips most files/row groups.
    Pure built-in bit ops → whole-stage codegen, no UDF."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(col_a.cast("long"), i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(col_b.cast("long"), i).bitwiseAND(F.lit(1))
        z = (
            z.bitwiseOR(F.shiftleft(bit_a, 2 * i + 1))
            .bitwiseOR(F.shiftleft(bit_b, 2 * i))
        )
    return z


def rewrite_zordered(
    spark: SparkSession, path: str, col_a: str, col_b: str, n_files: int
) -> None:
    """Rewrite a parquet dir into n_files files clustered by the Z-order
    of (col_a, col_b): range-partition on the z key (repartitionByRange
    keeps z-contiguous blocks together — a hash repartition would undo
    the clustering), sort within files, drop the helper column."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__zorder"
    (
        df.withColumn("__z", zorder_key(F.col(col_a), F.col(col_b)))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    import os
    import shutil

    old = path.rstrip("/") + "__old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
