"""Event-stream operators in batch form (SURVEY.md §2.2 streaming rows).

These are the batch twins of the streaming surface in streaming/ — same
semantics (tumbling/sliding/session windows, JSON props extraction, exact
dedup), expressed so the DuckDB oracle can verify them. The streaming
module reuses these column expressions under readStream.

The reference's only window-like construct is row-count decimation
(uav/main.py:116); real event-time windows are the engine's upgrade path
(SURVEY.md §1.3: ts from frame_number/fps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def event_type_stats(spark: SparkSession) -> DataFrame:
    return (
        spark.table("events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def hourly_tumbling_counts(spark: SparkSession) -> DataFrame:
    """Tumbling 1-hour window. Uses window() (the streaming-native
    operator) whose .start for hour-aligned windows equals
    date_trunc('hour', ts) — which is exactly what the oracle computes."""
    ev = spark.table("events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_window_counts(spark: SparkSession) -> DataFrame:
    """Sliding 1-hour window every 30 minutes: each event lands in 2
    windows. Output keyed by window start epoch seconds (exact integers,
    hash-stable cross-engine)."""
    ev = spark.table("events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "n_events",
        )
    )


def session_windows_per_user(spark: SparkSession, gap_minutes: int = 30) -> DataFrame:
    """Session windows (30-min inactivity gap) per user, batch form via
    session_window() — the same operator Structured Streaming uses. Output:
    user_id, session start epoch, event count.

    The oracle reproduces it with gaps-and-islands SQL (lag + cumulative
    sum of new-session markers), proving the semantics rather than the
    implementation."""
    ev = spark.table("events")
    return (
        ev.groupBy(
            F.col("user_id"),
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start_epoch"),
            "n_events",
        )
    )


def json_props_extract(spark: SparkSession) -> DataFrame:
    """JSON functions over the props column (engine surface for
    to_json/from_json/get_json_object — the reference serializes metadata
    as JSON, uav/frame_processing.py:247-248)."""
    ev = spark.table("events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def dedup_events_exact(spark: SparkSession) -> DataFrame:
    """Exact dedup: first event per (user_id, event_type) by (ts,
    event_id). Window row_number=1 — the deterministic form of
    dropDuplicates (which is tie-arbitrary); at scale this is one shuffle
    on the dedup key."""
    ev = spark.table("events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id",
                F.round("value", 2).alias("value"))
    )


def user_activity_rollup(spark: SparkSession) -> DataFrame:
    """Per-user daily activity with running total — window over grouped
    aggregate."""
    ev = spark.table("events")
    daily = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        "user_id", "day", "n_events",
        F.sum("n_events").over(w).alias("running_events"),
    )


def map_functions_surface(spark: SparkSession) -> DataFrame:
    """Map-typed column surface (SURVEY.md §2.2: engine exposes map_* —
    the reference has no maps): build a map from event fields, then
    element_at / map_keys / size back out."""
    ev = spark.table("events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.element_at(m, "uid").alias("m_uid"),
        F.size(m).alias("m_size"),
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
    )


def try_expressions(spark: SparkSession) -> DataFrame:
    """Explicit error-tolerance surface (SURVEY.md §7 'What's hard' #4):
    the reference swallows per-row failures (frame_processing.py:53-57,
    113-115, 257-262); the engine makes that policy visible with try_*
    expressions that yield NULL instead of failing the task."""
    ev = spark.table("events")
    k = F.get_json_object("props", "$.k")
    missing = F.get_json_object("props", "$.missing")
    return ev.select(
        "event_id",
        F.col("event_type").try_cast("int").alias("bad_cast"),
        k.try_cast("int").alias("k_parsed"),
        missing.try_cast("int").alias("k_missing"),
        F.coalesce(k.try_cast("int"), F.lit(-1)).alias("k_or_default"),
    )
