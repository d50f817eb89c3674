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
    contains any Exchange (it must not, when bucket spec matches the join
    keys). Returns (shuffle_free, plan_text)."""
    import contextlib
    import io

    joined = spark.table(left_table).join(spark.table(right_table), on)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    # BroadcastExchange is fine (dim broadcast); shuffle Exchange is not
    shuffle_free = "Exchange hashpartitioning" not in plan
    return shuffle_free, plan
