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
    formatted physical plan. A Window's Arguments line carries 3 top-level
    bracket groups when partitioned ([exprs], [partition], [order]) and 2
    when global ([exprs], [order]) — a global window is a single-partition
    sort, the scale anti-pattern the plan audit hunts."""
    import re

    lines = formatted_plan(df).splitlines()
    out: list[tuple[bool, str]] = []
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) Window\b", line.strip()):
            for nxt in lines[i + 1 : i + 8]:
                if nxt.strip().startswith("Arguments:"):
                    depth = 0
                    groups = 0
                    for ch in nxt:
                        if ch == "[":
                            if depth == 0:
                                groups += 1
                            depth += 1
                        elif ch == "]":
                            depth -= 1
                    out.append((groups >= 3, nxt.strip()))
                    break
    return out
