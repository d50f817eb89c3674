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


def asof_join_clicks_to_views(spark: SparkSession) -> DataFrame:
    """AS-OF join: each click matched to the user's most recent view at
    or before the click. Spark has no ASOF JOIN operator; the scalable
    composition is the union trick — tag both streams, sort once per user,
    and carry the latest view forward with last(ignorenulls) over an
    unbounded-preceding row frame. ONE shuffle on user_id; never a range
    join (a BETWEEN-style join would nested-loop).

    Views are pre-deduplicated to one row per (user_id, ts) — max
    event_id wins — so tie-at-same-timestamp semantics are deterministic
    and identical to the DuckDB ASOF JOIN oracle.
    """
    ev = spark.table("events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_event_id"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("view_event_id_src"),
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id_src"))
        .select(
            "user_id",
            "ts",
            F.lit(None).cast("long").alias("click_event_id"),
            F.lit(0).alias("side"),
            "view_event_id_src",
        )
    )
    # views sort before clicks at equal ts (side 0 < 1) so ts >= view_ts
    # includes same-instant views, matching ASOF's >= bound
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = views.unionByName(clicks)
    carried = tagged.select(
        "user_id",
        "ts",
        "side",
        "click_event_id",
        F.last("view_event_id_src", ignorenulls=True).over(w).alias("view_event_id"),
        F.last(
            F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True
        ).over(w).alias("view_ts"),
    )
    return (
        carried.filter((F.col("side") == 1) & F.col("view_event_id").isNotNull())
        .select(
            F.col("click_event_id").alias("event_id"),
            "user_id",
            F.unix_timestamp("ts").alias("click_epoch"),
            "view_event_id",
            F.unix_timestamp("view_ts").alias("view_epoch"),
            (F.unix_timestamp("ts") - F.unix_timestamp("view_ts")).alias("gap_s"),
        )
    )


def hierarchical_time_rollup(spark: SparkSession) -> DataFrame:
    """Hypertable-style continuous-aggregate hierarchy: minute buckets
    aggregate from raw events, hour buckets from MINUTE PARTIALS, day
    buckets from HOUR PARTIALS — each coarser level reads the (much
    smaller) finer aggregate, never the raw table again. Rounding applies
    only at the final projection so re-aggregated sums stay exact."""
    ev = spark.table("events")
    minute = ev.groupBy(
        F.date_trunc("minute", "ts").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    hour = minute.groupBy(
        F.date_trunc("hour", "bucket").alias("bucket")
    ).agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
    day = hour.groupBy(
        F.date_trunc("day", "bucket").alias("bucket")
    ).agg(F.sum("n").alias("n"), F.sum("v").alias("v"))

    def level(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("level"),
            F.unix_timestamp("bucket").alias("bucket_epoch"),
            F.col("n").alias("n_events"),
            F.round("v", 2).alias("total_value"),
        )

    return (
        level(minute, "minute")
        .unionByName(level(hour, "hour"))
        .unionByName(level(day, "day"))
    )


def funnel_view_click_purchase(spark: SparkSession) -> DataFrame:
    """Ordered funnel per user: earliest view → first click AFTER that
    view → first purchase AFTER that click, then stage conversion counts.
    The min-over-filtered-window chain keeps it one shuffle on user_id
    (conditional aggregation, no self-joins)."""
    ev = spark.table("events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    first_click = (
        clicks.join(per_user, "user_id")
        .filter(F.col("click_ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("click_ts").alias("t_click"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    first_purchase = (
        purchases.join(first_click, "user_id")
        .filter(F.col("purchase_ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("purchase_ts").alias("t_purchase"))
    )
    funnel = (
        per_user.filter(F.col("t_view").isNotNull())
        .join(first_click, "user_id", "left_outer")
        .join(first_purchase, "user_id", "left_outer")
    )
    return funnel.agg(
        F.count(F.lit(1)).alias("n_viewed"),
        F.sum(F.col("t_click").isNotNull().cast("long")).alias("n_clicked"),
        F.sum(F.col("t_purchase").isNotNull().cast("long")).alias("n_purchased"),
        F.round(
            F.sum(F.col("t_click").isNotNull().cast("long"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("view_to_click_rate"),
        F.round(
            F.sum(F.col("t_purchase").isNotNull().cast("long"))
            / F.greatest(F.sum(F.col("t_click").isNotNull().cast("long")), F.lit(1)).cast("double"),
            6,
        ).alias("click_to_purchase_rate"),
    )


def retention_cohorts(spark: SparkSession) -> DataFrame:
    """Weekly retention cohorts — the activation dashboard every event
    pipeline ships: cohort = ISO week of a user's FIRST event; for each
    (cohort_week, week_offset), how many of the cohort's users were
    active that week. Two shuffles (per-user min; cohort×offset agg);
    the per-user cohort re-joins on user_id — at 100 TB both sides are
    pre-partitioned by user_id, so AQE plans a co-located join.

    Output: cohort DATE + exact-integer offset/counts (hash-stable)."""
    ev = spark.table("events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("event_week")
    ).distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            ((F.datediff("event_week", "cohort_week") / 7).cast("int")).alias(
                "week_offset"
            ),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


def sessionize_gap_method(spark: SparkSession, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization WITHOUT session_window: lag-gap → session-
    start flags → running sum = session id. The classic window-function
    form (portable to any SQL engine; session_window is the Spark-native
    twin in ev_session_windows). Per-user windows partition correctly at
    scale — no global sort anywhere.

    Gap arithmetic in exact integer MICROSECONDS (unix_micros both
    engines) and a unique (ts, event_id) sort key: no double rounding, no
    tie nondeterminism."""
    ev = spark.table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet stores ts as isAdjustedToUTC=0 → Spark reads TIMESTAMP_NTZ;
    # unix_micros requires TIMESTAMP. Session tz is pinned UTC, so the cast
    # is an exact micros-preserving identity (matches DuckDB's epoch_us).
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    gap_us = gap_minutes * 60 * 1_000_000
    new_sess = (gap.isNull() | (gap > gap_us)).cast("long")
    sess = ev.withColumn(
        "session_seq",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("min(unix_micros(CAST(ts AS TIMESTAMP))) div 1000000").alias("session_start_epoch"),
        F.expr("max(unix_micros(CAST(ts AS TIMESTAMP))) div 1000000").alias("session_end_epoch"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def variant_props_stats(spark: SparkSession) -> DataFrame:
    """Spark 4 VARIANT type over the semi-structured props column:
    parse_json → typed variant_get extraction, aggregated per extracted
    key. VARIANT stores a parsed binary form — at scale, repeated
    get_json_object calls re-parse the string per access while variant
    parses once; here one extraction feeds the whole query."""
    return spark.sql(
        """
        SELECT variant_get(parse_json(props), '$.k', 'int') AS k_val,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY k_val
        ORDER BY k_val
        """
    )


def interval_join_bucketed(spark: SparkSession, bucket_secs: int = 3600) -> DataFrame:
    """Interval containment join at scale: assign every event to the
    gap-session interval [session_start, session_end] that contains it,
    WITHOUT a per-user cross product.

    The naive form — equi-join on user_id + BETWEEN filter — is an SMJ
    whose per-user candidate set is |sessions| x |events| for that user;
    a power user makes one straggler task. The scale fix: explode each
    interval into the hour buckets it spans (sequence of epoch div 3600)
    and join on (user_id, bucket, exact BETWEEN). Each event carries ONE
    bucket (its own), so each (event, session) pair is produced at most
    once — no dedup pass — and candidates per task are bounded by
    same-hour activity, not per-user history.

    Output (events per session) is oracle-checked against DuckDB's naive
    range join — proving the bucketed plan computes exactly the range-
    join semantics."""
    ev = spark.table("events")
    sessions = sessionize_gap_method(spark).select(
        "user_id",
        "session_seq",
        "session_start_epoch",
        "session_end_epoch",
    )
    buckets = sessions.withColumn(
        "bucket",
        F.explode(
            F.expr(
                f"sequence(session_start_epoch div {bucket_secs}, "
                f"session_end_epoch div {bucket_secs})"
            )
        ),
    )
    ev_b = ev.select(
        "user_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").alias("ev_epoch"),
    ).withColumn("bucket", F.expr(f"ev_epoch div {bucket_secs}"))
    joined = ev_b.join(buckets, ["user_id", "bucket"]).filter(
        (F.col("ev_epoch") >= F.col("session_start_epoch"))
        & (F.col("ev_epoch") <= F.col("session_end_epoch"))
    )
    return (
        joined.groupBy("user_id", "session_seq", "session_start_epoch")
        .agg(F.count(F.lit(1)).alias("n_contained"))
    )


def rolling_7day_user_value(spark: SparkSession) -> DataFrame:
    """Per-user 7-day trailing totals via a RANGE-frame window over an
    integer day index: pre-aggregate to (user, day) so the window walks
    |user-days| rows (not raw events), then rangeBetween(-6, 0) on
    days-since-epoch. The RANGE frame (value-based, handles gaps in the
    day sequence) is the piece rowsBetween can't express; partitioned by
    user — no global sort."""
    ev = spark.table("events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("day_value"),
    )
    day_idx = F.datediff("day", F.lit("1970-01-01"))
    w = Window.partitionBy("user_id").orderBy(day_idx).rangeBetween(-6, 0)
    return daily.select(
        "user_id",
        "day",
        F.sum("n_events").over(w).alias("n_events_7d"),
        F.round(F.sum("day_value").over(w), 2).alias("value_7d"),
    )


def rate_limit_windows(
    spark: SparkSession, limit: int = 1, window_unit: str = "hour"
) -> DataFrame:
    """Fixed-window rate limiting — the API-quota staple: within each
    (user, event_type, tumbling `window_unit`), only the first `limit`
    events (by ts, event_id) are ALLOWED; the rest are throttled. Unlike
    the token bucket (streaming/rate_limit_stream.py, whose allow
    decision depends on the running refill state and is inherently
    sequential), the fixed-window rule is a pure row_number — one window
    over (user, type, bucket), fully partitioned, oracle-checkable.
    Defaults (1/hour) calibrated so throttling actually bites on the
    driver corpus (6 throttled at sf0.001, 92 at sf0.01); the knob
    control test pins that raising `limit` strictly shrinks throttling.

    Summary per event_type: events, allowed, throttled, allowed value,
    and how many (user, window) cells ever hit the limit."""
    ev = spark.table("events")
    bucket = F.date_trunc(window_unit, "ts")
    w = Window.partitionBy("user_id", "event_type", "bucket").orderBy(
        "ts", "event_id"
    )
    flagged = ev.withColumn("bucket", bucket).withColumn(
        "rn", F.row_number().over(w)
    )
    allowed = (F.col("rn") <= limit).cast("long")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(allowed).alias("n_allowed"),
            F.sum(1 - allowed).alias("n_throttled"),
            F.round(
                F.sum(F.when(F.col("rn") <= limit, F.col("value")).otherwise(0.0)), 2
            ).alias("allowed_value"),
            F.countDistinct(
                F.when(F.col("rn") > limit, F.concat_ws("|", "user_id", "bucket"))
            ).alias("n_saturated_cells"),
        )
        .orderBy("event_type")
    )


def user_anomaly_zscore(
    spark: SparkSession, z_threshold: float = 3.0
) -> DataFrame:
    """Robust per-user anomaly detection over daily activity: flag days
    whose event count deviates from the user's own median by more than
    `z_threshold` robust z-scores (z = |x - median| / (1.4826 * MAD)).
    Median/MAD instead of mean/stddev so one spike can't mask itself by
    inflating the baseline — the standard abuse/bot-detection screen.

    Two grouped medians + co-partitioned joins on user_id (AQE plans the
    re-join shuffle-free when daily is reused); the per-user state is
    O(days), never O(events). Users whose MAD is 0 (constant activity)
    are excluded — any deviation there is trivially 'anomalous' and the
    z-score is undefined."""
    ev = spark.table("events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    med = daily.groupBy("user_id").agg(
        F.median("n_events").alias("med"), F.count(F.lit(1)).alias("n_days")
    )
    with_med = daily.join(med, "user_id")
    mad = with_med.groupBy("user_id").agg(
        F.median(F.abs(F.col("n_events") - F.col("med"))).alias("mad")
    )
    z = F.abs(F.col("n_events") - F.col("med")) / (1.4826 * F.col("mad"))
    return (
        with_med.join(mad, "user_id")
        .filter(F.col("mad") > 0)
        .withColumn("z", z)
        .filter(F.col("z") > z_threshold)
        .select(
            "user_id",
            "day",
            "n_events",
            F.round("med", 6).alias("median_events"),
            F.round("mad", 6).alias("mad_events"),
            F.round("z", 6).alias("robust_z"),
        )
    )


def debounce_events(spark: SparkSession, window_minutes: int = 5) -> DataFrame:
    """Burst-debounce dedup — the telemetry staple: within each (user,
    event_type) stream, an event is KEPT iff it starts a burst (no
    same-key event in the preceding `window_minutes`). Equivalent
    formulation: gap-sessionize with this gap and keep each session's
    first event — so the lag rule IS the session-start flag, one window,
    no iteration. (True rate-limit throttling — fixed interval from the
    last KEPT event — is inherently sequential; that variant belongs in
    applyInPandasWithState, like the stateful counters.)

    Same exactness discipline as sessionize_gap_method: integer
    microsecond arithmetic, unique (ts, event_id) sort key. Per-key
    windows partition across the cluster; summary agg is
    map-side-combinable."""
    ev = spark.table("events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    keep = (gap.isNull() | (gap > window_minutes * 60 * 1_000_000)).cast("int")
    flagged = ev.withColumn("keep", keep)
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("keep").cast("long").alias("n_kept"),
            (F.count(F.lit(1)) - F.sum("keep")).cast("long").alias("n_dropped"),
            F.round(
                F.sum(F.when(F.col("keep") == 1, F.col("value")).otherwise(0.0)),
                2,
            ).alias("kept_value"),
        )
        .orderBy("event_type")
    )


def attribution_credit(spark: SparkSession, lookback_days: int = 7) -> DataFrame:
    """Multi-touch attribution — the marketing-analytics twin of the
    funnel: every purchase credits the view/click touchpoints of the
    SAME user in the `lookback_days` before it. Three standard models
    in one result, per touch event_type:
      - linear: each of the n touches of a purchase earns 1/n
      - first_touch / last_touch: the earliest / latest touch earns 1
    Ties break on event_id; purchases with no in-window touch drop out
    (they have nothing to credit).

    Plan: touches ⋈ purchases is a user-keyed equi-join with the time
    range as a join-level filter — both sides pre-filtered by type, so
    only view/click and purchase rows shuffle, keyed by user_id. Per
    purchase, ONE window (partition = purchase event, order = touch ts)
    ranks touches for first/last and carries count(*) for the linear
    share — window state bounded by touches-per-purchase-window, not by
    user history. At 100 TB this inherits the interval-join playbook:
    heavy-hitter users salt cleanly because the purchase id, not the
    user, is the window key."""
    ev = spark.table("events")
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    lb = F.expr(f"INTERVAL {lookback_days} DAYS")
    pairs = touches.join(
        purchases,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - lb),
    )
    w = Window.partitionBy("p_id")
    wo = w.orderBy("t_ts", "t_id")
    ranked = pairs.select(
        "touch_type",
        (1.0 / F.count(F.lit(1)).over(w)).alias("linear_share"),
        (F.row_number().over(wo) == 1).cast("int").alias("is_first"),
        (
            F.row_number().over(wo.orderBy(F.col("t_ts").desc(), F.col("t_id").desc()))
            == 1
        ).cast("int").alias("is_last"),
    )
    return (
        ranked.groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(F.sum("linear_share"), 6).alias("linear_credit"),
            F.sum("is_first").cast("long").alias("n_first_touch"),
            F.sum("is_last").cast("long").alias("n_last_touch"),
        )
        .orderBy("touch_type")
    )


def markov_transitions(spark: SparkSession) -> DataFrame:
    """First-order Markov model of user behavior: P(next event type |
    current event type), estimated from per-user event sequences — the
    sequence-analytics screen for loops (error→error), dead ends, and
    conversion paths.

    Plan: ONE user-keyed window (lag of event_type by (ts, event_id))
    emits transition pairs in-place — no self-join; the pair count is a
    25-key aggregation that partial-aggregates map-side, and the row
    normalization joins the 5-row margin back broadcast. The window
    partitions by user, so it scales with the user key like every
    sessionization here."""
    ev = spark.table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    margin = pairs.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return (
        pairs.join(F.broadcast(margin), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.col("row_total"), 6).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


def top_session_paths(
    spark: SparkSession, gap_minutes: float = 30, k: int | None = 15
) -> DataFrame:
    """Navigation-path mining: the most common within-session event-type
    SEQUENCES (view>click>purchase ...) — the product-analytics query
    behind funnels-you-didn't-think-to-ask-for. Sessions come from the
    same exact-microsecond lag-gap rule as sessionize_gap_method; the
    path string is assembled IN-ROW from one per-session
    array_sort(collect_list(struct)) aggregation (deterministic: the
    struct sorts by (us, event_id) before the types are joined — no
    reliance on collect_list order, which Spark does not guarantee).

    Scale: one user-keyed window (shared sort for lag + running sum),
    one (user, session) aggregation whose state is bounded by session
    length, one path-keyed count (map-side combined), top-k. Path
    cardinality is a power-law — the count agg's reduce side is small;
    a length cap on pathological sessions is the standard guard."""
    ev = spark.table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    gap_us = gap_minutes * 60 * 1_000_000
    new_sess = (gap.isNull() | (gap > gap_us)).cast("long")
    sess = ev.withColumn(
        "session_seq",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).select("user_id", us.alias("us"), "event_id", "event_type", "session_seq")
    steps = F.array_sort(
        F.collect_list(F.struct("us", "event_id", "event_type"))
    )
    paths = sess.groupBy("user_id", "session_seq").agg(
        F.concat_ws(
            ">", F.transform(steps, lambda s: s["event_type"])
        ).alias("path")
    )
    out = (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
    )
    # k=None returns every path. NEVER emulate that with a huge limit:
    # sort+limit plans a TakeOrderedAndProject whose priority queue is
    # sized by the limit — a 10^9 "unbounded" limit allocates at driver
    # scale and can kill the JVM (observed in the test suite).
    return out if k is None else out.limit(k)


def ewma_deviation(
    spark: SparkSession,
    alpha: float = 0.4,
    horizon: int = 8,
    top_n: int | None = 50,
) -> DataFrame:
    """Time-decayed change detection: for each event, the exponentially
    weighted moving average of the user's PREVIOUS values and the
    absolute deviation of the current value from it; returns the top_n
    largest deviations — the metering/fraud screen that reacts to level
    shifts faster than the daily median/MAD screen (user_anomaly_zscore)
    because old history decays geometrically instead of voting forever.

    The infinite-memory EWMA recursion is sequential state (the exact
    form lives in streaming/ewma_stream.py); here it is truncated to a
    FIXED bundle of `horizon` lag() columns over one (user_id)-
    partitioned window — no recursion, no UDF, and expressible
    identically in the oracle. Weighting: lag j gets alpha*(1-alpha)^
    (j-1), and the OLDEST available lag gets the full residual
    (1-alpha)^(j-1) — i.e. the recursion is restarted AT that lag.
    Weights always sum to exactly 1, so for users with <= horizon prior
    events the truncation is EXACT (it equals the true recursion), and
    beyond that the error is bounded by (1-alpha)^(horizon-1) * the
    user's value range (<3% of the range at the defaults) — both
    properties pinned against the streaming recursion in
    test_ewma_stream.py. Ranking is a TakeOrderedAndProject (top_n per
    partition, merged on the driver) — no global sort at any corpus
    size."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.lag("value", j).over(w) for j in range(1, horizon + 1)]
    terms = []
    for j, lag in enumerate(lags, start=1):
        head_w = alpha * (1.0 - alpha) ** (j - 1)
        rest_w = (1.0 - alpha) ** (j - 1)
        if j < horizon:
            nxt = lags[j]  # lag j+1
            terms.append(
                F.when(nxt.isNotNull(), lag * F.lit(head_w))
                .when(lag.isNotNull(), lag * F.lit(rest_w))
                .otherwise(F.lit(0.0))
            )
        else:
            terms.append(
                F.when(lag.isNotNull(), lag * F.lit(rest_w)).otherwise(F.lit(0.0))
            )
    ewma_prev = sum(terms[1:], terms[0])
    ev = spark.table("events")
    scored = (
        ev.select("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("_has_prev", lags[0].isNotNull())
        .withColumn("_ewma", ewma_prev)
        .filter(F.col("_has_prev"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round(F.col("_ewma"), 6).alias("ewma_prev"),
            F.round(F.abs(F.col("value") - F.col("_ewma")), 6).alias("deviation"),
        )
    )
    # top_n=None -> all scored rows (plain sort — TakeOrderedAndProject
    # pre-allocates O(k) per task, so a huge sentinel limit would OOM;
    # same guard as top_session_paths)
    ranked = scored.orderBy(F.col("deviation").desc(), "event_id")
    return ranked if top_n is None else ranked.limit(top_n)


def daily_autocorrelation(spark: SparkSession, max_lag: int = 7) -> DataFrame:
    """Seasonality screen over the event stream: lag-k Pearson
    autocorrelation of the corpus-wide daily event-count series for
    k = 1..max_lag — the diagnostic that decides whether a forecast /
    anomaly model needs weekly seasonality terms (a spike at lag 7) or
    day-over-day momentum (lag 1).

    The series aggregates to one row per DAY before any correlation
    math — O(days) rows regardless of corpus size — so the only
    corpus-sized work is the one date-keyed count shuffle. Lags come
    from a CALENDAR self-join (b.day = a.day - k) rather than a lag()
    window: no unpartitioned window anywhere (the plan-audit ban), the
    join is a hash join on a tiny frame, and calendar alignment is the
    correct autocorrelation semantics when days are missing (a row
    lag() would silently correlate across gaps). corr() is the
    built-in Pearson aggregate, identical in DuckDB."""
    ev = spark.table("events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    ).localCheckpoint(eager=True)
    points = []
    for k in range(1, max_lag + 1):
        prev = daily.select(
            F.date_add(F.col("day"), k).alias("day"), F.col("n").alias("n_prev")
        )
        points.append(
            daily.join(prev, "day").agg(
                F.lit(k).alias("lag_days"),
                F.count(F.lit(1)).alias("n_points"),
                F.round(F.corr("n", "n_prev"), 6).alias("autocorr"),
            )
        )
    out = points[0]
    for pt in points[1:]:
        out = out.unionByName(pt)
    return out.orderBy("lag_days")


def cuped_experiment_readout(spark: SparkSession) -> DataFrame:
    """CUPED experiment readout (Deng et al., WSDM'13) — the variance-
    reduction every experimentation platform applies before calling a
    winner: adjust each user's in-experiment metric Y by their
    PRE-experiment covariate X, adjusted = Y - theta*(X - mean(X)) with
    theta = cov(X,Y)/var(X), which strips the between-user variance X
    explains (~var reduction = corr(X,Y)^2) without biasing the mean.

    Deterministic derivations (no external assignment table needed):
    variant = user_id % 2; the pre/post boundary is the midpoint of the
    corpus time range (scalar agg, broadcast back — no driver action).
    Per-user X/Y are conditional sums in ONE user-keyed aggregation;
    theta/x-mean are one tiny scalar agg broadcast into a map-only
    adjustment; the readout is a 2-row variant agg. Nothing but the
    user rollup touches corpus-sized data. X, Y, theta, and mean(X)
    are rounded to 6dp before the adjustment so both engines feed the
    identical numbers through the identical arithmetic."""
    ev = spark.table("events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = ev.agg(
        ((F.min(us) + F.max(us)) / 2).alias("cut_us")
    )
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.when(us < F.col("cut_us"), F.col("value")).otherwise(0.0)), 6
            ).alias("x"),
            F.round(
                F.sum(F.when(us >= F.col("cut_us"), F.col("value")).otherwise(0.0)), 6
            ).alias("y"),
        )
    )
    stats = per_user.agg(
        F.round(F.covar_samp("x", "y") / F.var_samp("x"), 6).alias("theta"),
        F.round(F.avg("x"), 6).alias("xbar"),
    )
    adjusted = per_user.crossJoin(F.broadcast(stats)).select(
        (F.col("user_id") % 2).cast("int").alias("variant"),
        "y",
        (F.col("y") - F.col("theta") * (F.col("x") - F.col("xbar"))).alias("y_adj"),
    )
    return (
        adjusted.groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("y"), 6).alias("mean_y"),
            F.round(F.avg("y_adj"), 6).alias("mean_y_cuped"),
            F.round(1.0 - F.var_samp("y_adj") / F.var_samp("y"), 6).alias(
                "var_reduction"
            ),
        )
        .orderBy("variant")
    )


def experiment_power_analysis(spark: SparkSession) -> DataFrame:
    """Pre-registration power analysis from observed data — the
    companion every CUPED readout needs: given the per-user metric's
    observed variance, the minimum detectable effect (MDE) at 80%
    power / alpha 0.05 for a range of per-variant sample sizes,
    MDE = (z_{alpha/2} + z_{beta}) * sqrt(2 * var / n), both raw and
    CUPED-adjusted (variance scaled by the observed 1 - corr(X,Y)^2 —
    the standard CUPED variance multiple). The table answers 'how long
    must this experiment run' before it starts.

    One user-keyed rollup (shared shape with cuped_experiment_readout)
    + one scalar variance/correlation aggregate fanned out over a tiny
    literal grid of sample sizes — corpus-sized work is the single
    rollup. z constants are literals (1.959964 + 0.841621), identical
    both engines."""
    ev = spark.table("events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = ev.agg(((F.min(us) + F.max(us)) / 2).alias("cut_us"))
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.when(us < F.col("cut_us"), F.col("value")).otherwise(0.0)), 6
            ).alias("x"),
            F.round(
                F.sum(F.when(us >= F.col("cut_us"), F.col("value")).otherwise(0.0)), 6
            ).alias("y"),
        )
    )
    stats = per_user.agg(
        F.round(F.var_samp("y"), 6).alias("var_y"),
        F.round(F.pow(F.corr("x", "y"), 2), 6).alias("r2"),
    )
    sizes = spark.range(1).select(
        F.explode(F.array(*[F.lit(n) for n in (100, 500, 1000, 5000, 10000)]))
        .alias("n_per_variant")
    )
    z = 1.959964 + 0.841621  # z_{0.025} + z_{0.20}: 80% power two-sided
    mde = F.round(
        F.lit(z) * F.sqrt(2.0 * F.col("var_y") / F.col("n_per_variant")), 6
    )
    mde_cuped = F.round(
        F.lit(z)
        * F.sqrt(2.0 * F.col("var_y") * (1.0 - F.col("r2")) / F.col("n_per_variant")),
        6,
    )
    return (
        sizes.crossJoin(F.broadcast(stats))
        .select(
            "n_per_variant",
            "var_y",
            F.col("r2").alias("cuped_r2"),
            mde.alias("mde"),
            mde_cuped.alias("mde_cuped"),
        )
        .orderBy("n_per_variant")
    )


def seasonal_adjustment(spark: SparkSession) -> DataFrame:
    """Day-of-week seasonal decomposition of the corpus-wide daily event
    series: baseline = the median count for that weekday, residual =
    observed - baseline, robust z = residual / (1.4826 * weekday MAD).
    This is the screen user_anomaly_zscore can't do — traffic with a
    strong weekly cycle (quiet Sundays, busy Mondays) makes a global
    median flag every Monday; deseasonalizing by weekday first means a
    flag says "unusual FOR a Monday".

    Shape at scale: one date-truncated count over events (map-side
    combinable, the only corpus-sized shuffle), then all medians/joins
    run on the O(days) series — grouped by weekday (7 keys), never
    windowed over events. Weekdays with MAD = 0 keep their rows but
    carry a NULL z (deviation from a constant baseline has no robust
    scale; the residual column still shows it)."""
    daily = (
        spark.table("events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn("dow", F.dayofweek("day"))
    )
    base = daily.groupBy("dow").agg(
        F.median("n_events").alias("baseline"),
        F.count(F.lit(1)).alias("n_weeks"),
    )
    with_base = daily.join(base, "dow")
    mad = with_base.groupBy("dow").agg(
        F.median(F.abs(F.col("n_events") - F.col("baseline"))).alias("mad")
    )
    z = (F.col("n_events") - F.col("baseline")) / (1.4826 * F.col("mad"))
    return (
        with_base.join(mad, "dow")
        .select(
            "day",
            "dow",
            "n_events",
            F.round("baseline", 6).alias("baseline"),
            F.round(F.col("n_events") - F.col("baseline"), 6).alias(
                "residual"
            ),
            F.round(F.when(F.col("mad") > 0, z), 6).alias("robust_z"),
            F.coalesce(
                F.abs(F.when(F.col("mad") > 0, z)) > 2.0, F.lit(False)
            ).alias("is_anomaly"),
        )
        .orderBy("day")
    )


def cusum_changepoints(
    spark: SparkSession, slack_k: float = 0.5, threshold_h: float = 4.0
) -> DataFrame:
    """CUSUM change detection over the standardized daily event series
    (Page 1954 — the sequential test behind most production drift
    alarms): accumulate standardized deviations beyond a slack `k` and
    alarm when the accumulation crosses `h`. Detects small SUSTAINED
    level shifts that per-point screens (seasonal_adjustment, z-scores)
    can't see — ten days each 1σ high never trips a 2σ point test but
    sums to 10σ - 10k here.

    The textbook recursion S_t = max(0, S_{t-1} + z_t - k) looks
    sequential, but one-sided CUSUM has an exact closed form:
      S_t = P_t - min_{i<=t}(P_i),  P_t = Σ_{j<=t}(z_j - k), P_0 = 0
    (subtracting the running minimum restarts the sum at every point a
    plain sum would have clipped to 0). Both directions come from the
    same prefix sum: the downward statistic uses the running MAX. So
    the whole detector is cumulative sums/extrema over the O(days)
    series — fully relational, exactly SQL-expressible, oracle-checked;
    no driver loop, no UDF.

    Shape at scale: one corpus-sized date-truncated count (map-side
    combinable), then prefix ops over the day series. The prefix
    sums/extrema are two-phase — windows PARTITIONED by month plus a
    month-level carry (sum for P, min/max of the months' prefix
    extrema) from a triangular join over the O(months) month aggregate
    (the fixture's kf_offset pattern) — so no single-partition window
    exists even when the series spans decades; shard additionally by
    (series_id) when monitoring many series."""
    daily = (
        spark.table("events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    stats = daily.agg(
        F.avg("n_events").alias("mu"), F.stddev_samp("n_events").alias("sd")
    )
    z = (F.col("n_events") - F.col("mu")) / F.col("sd")
    month = F.trunc("day", "month")
    in_month = Window.partitionBy("month").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    base = (
        daily.crossJoin(F.broadcast(stats))
        .withColumn("month", month)
        .withColumn("zu", z - slack_k)
        .withColumn("zd", z + slack_k)
        .withColumn("z", z)
    )
    # within-month prefix sums and their running extrema
    local = (
        base.withColumn("lp_up", F.sum("zu").over(in_month))
        .withColumn("lp_dn", F.sum("zd").over(in_month))
        .withColumn("lmin_up", F.min(F.col("lp_up")).over(in_month))
        .withColumn("lmax_dn", F.max(F.col("lp_dn")).over(in_month))
    )
    # month-level totals + full-month prefix extrema (relative to the
    # month's own start); the triangular join cumulates them globally
    m = local.groupBy("month").agg(
        F.sum("zu").alias("m_up"),
        F.sum("zd").alias("m_dn"),
        F.min("lmin_up").alias("m_min_up"),
        F.max("lmax_dn").alias("m_max_dn"),
    )
    carry = (
        m.alias("c")
        .join(m.alias("p"), F.col("p.month") < F.col("c.month"), "left")
        .groupBy(F.col("c.month").alias("month"))
        .agg(
            F.coalesce(F.sum("p.m_up"), F.lit(0.0)).alias("up_carry"),
            F.coalesce(F.sum("p.m_dn"), F.lit(0.0)).alias("dn_carry"),
        )
    )
    # global prefix extrema over completed earlier months: each earlier
    # month p contributes (carry before p) + p's own prefix extremum;
    # cumulate via the same triangular shape
    mc = m.join(carry, "month")
    prev_ext = (
        mc.alias("c")
        .join(mc.alias("p"), F.col("p.month") < F.col("c.month"), "left")
        .groupBy(F.col("c.month").alias("month"))
        .agg(
            F.min(F.col("p.up_carry") + F.col("p.m_min_up")).alias("prev_min_up"),
            F.max(F.col("p.dn_carry") + F.col("p.m_max_dn")).alias("prev_max_dn"),
        )
    )
    offsets = carry.join(prev_ext, "month").select(
        "month", "up_carry", "dn_carry", "prev_min_up", "prev_max_dn"
    )
    scored = (
        local.join(F.broadcast(offsets), "month")
        .withColumn("p_up", F.col("up_carry") + F.col("lp_up"))
        .withColumn("p_dn", F.col("dn_carry") + F.col("lp_dn"))
        .withColumn(
            "min_up",
            F.least(
                F.coalesce("prev_min_up", F.lit(0.0)),
                F.col("up_carry") + F.col("lmin_up"),
                F.lit(0.0),
            ),
        )
        .withColumn(
            "max_dn",
            F.greatest(
                F.coalesce("prev_max_dn", F.lit(0.0)),
                F.col("dn_carry") + F.col("lmax_dn"),
                F.lit(0.0),
            ),
        )
        .withColumn("s_up", F.col("p_up") - F.col("min_up"))
        .withColumn("s_dn", F.col("max_dn") - F.col("p_dn"))
    )
    return scored.select(
        "day",
        "n_events",
        F.round(z, 6).alias("z"),
        F.round("s_up", 6).alias("cusum_up"),
        F.round("s_dn", 6).alias("cusum_down"),
        (
            (F.col("s_up") > threshold_h) | (F.col("s_dn") > threshold_h)
        ).alias("alarm"),
    ).orderBy("day")


def concurrent_sessions(spark: SparkSession, gap_minutes: int = 30) -> DataFrame:
    """Peak concurrent sessions per day — the sweep-line (+1/-1) interval
    overlap count, the standard capacity-planning query the per-user
    sessionizer can't answer (it never compares users' intervals).

    Sessions come from the same gap rule as sessionize_gap_method;
    each closed interval [start, end] contributes +1 at its start and
    -1 at its end, ordered (ts asc, +1 before -1, then user/session) so
    a session that starts at the exact microsecond another ends counts
    as overlapping — a deterministic, documented tie rule.

    Scale shape: the textbook form is ONE global running sum — a single-
    partition sort, the 100 TB anti-pattern. Here the running sum is
    two-phase, the same trick as the fixture's kf_idx: a per-DAY window
    over that day's boundary points plus a day-level carry-in offset
    from a triangular join over the O(days) day aggregate — no
    unpartitioned window anywhere. Work per partition is one day of
    boundaries; the carry join is days × days, negligible.
    Single events form zero-length sessions ([t, t]): +1 then -1, peak
    contribution 1 — exactly what "one user online" means."""
    ev = spark.table("events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = us - F.lag(us).over(w)
    gap_us = gap_minutes * 60 * 1_000_000
    new_sess = (gap.isNull() | (gap > gap_us)).cast("long")
    sessions = (
        ev.withColumn(
            "session_seq",
            F.sum(new_sess).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.min(us).alias("start_us"),
            F.max(us).alias("end_us"),
        )
    )
    starts = sessions.select(
        "user_id", "session_seq", F.col("start_us").alias("t_us"), F.lit(1).alias("delta")
    )
    ends = sessions.select(
        "user_id", "session_seq", F.col("end_us").alias("t_us"), F.lit(-1).alias("delta")
    )
    sweep = starts.unionByName(ends).withColumn(
        "day", F.to_date(F.timestamp_micros(F.col("t_us")))
    )
    in_day = Window.partitionBy("day").orderBy(
        "t_us", F.col("delta").desc(), "user_id", "session_seq"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    day_totals = sweep.groupBy("day").agg(F.sum("delta").alias("day_delta"))
    offsets = (
        day_totals.alias("c")
        .join(day_totals.alias("p"), F.col("p.day") < F.col("c.day"), "left")
        .groupBy(F.col("c.day").alias("day"))
        .agg(
            F.coalesce(F.sum("p.day_delta"), F.lit(0)).cast("long").alias("carry_in")
        )
    )
    swept = sweep.join(F.broadcast(offsets), "day").withColumn(
        "concurrency", F.col("carry_in") + F.sum("delta").over(in_day)
    )
    # Peak must also consider the day-START level (carry_in): if a day's
    # first boundary event is a session END, the concurrency held from
    # 00:00 until that event is carry_in — higher than any boundary-row
    # running sum that day. Days with zero boundary events (sessions
    # spanning the whole day) carry no sweep rows and are absent from
    # the output — documented contract, shared with the oracle.
    return (
        swept.groupBy("day")
        .agg(
            F.greatest(F.max("concurrency"), F.max("carry_in"))
            .cast("long")
            .alias("peak_concurrency"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_sessions_started"),
        )
        .orderBy("day")
    )


def prequential_zscore(
    spark: SparkSession, min_history: int = 8, threshold: float = 3.0
) -> DataFrame:
    """Prequential (test-then-train) z-score anomaly screen: each event
    scored against its user's PRIOR history only — mean and sample
    stddev over an expanding window ending one row back. The leak-free
    scoring rule (an event never sees itself or its future), and the
    exact batch twin of the streaming Welford state in
    streaming/anomaly_stream.py.

    Complements ev_user_anomaly_zscore (whole-history median/MAD, robust
    but retrospective): this one is what a live monitor would have
    flagged AT THE TIME. Expanding windows are per-user partitions —
    bounded by a user's history, never global. sd_prev > 0 guards
    constant prefixes; min_history keeps early noise out."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = spark.table("events").select(
        "user_id",
        "event_id",
        "value",
        F.count(F.lit(1)).over(w).alias("n_prior"),
        F.avg("value").over(w).alias("mu_prev"),
        F.stddev_samp("value").over(w).alias("sd_prev"),
    )
    z = (F.col("value") - F.col("mu_prev")) / F.col("sd_prev")
    return scored.filter(
        (F.col("n_prior") >= min_history)
        & (F.col("sd_prev") > 0)
        & (F.abs(z) > threshold)
    ).select(
        "user_id",
        "event_id",
        F.round("value", 6).alias("value"),
        F.col("n_prior").cast("long").alias("n_prior"),
        F.round(z, 6).alias("z"),
    )


def dau_mau_stickiness(spark: SparkSession, window_days: int = 28) -> DataFrame:
    """DAU/MAU stickiness per day — daily actives over trailing-28-day
    actives, the standard engagement ratio. Exact trailing count
    DISTINCT can't ride a window frame (count distinct isn't
    frame-aggregable), so the scalable exact form is a bounded range
    join: the deduped (day, user) table against the tiny day spine
    (each activity row lands in at most `window_days` spine days).

    Shapes: dedup is one (day, user) shuffle of the corpus; the range
    join broadcasts the O(days) spine; MAU re-aggregates the fanned-out
    pairs with a map-side-combinable distinct. At extreme scale the
    exact distinct swaps for the mergeable HLL sketch rollup
    (ev_hll_rollup) — same spine, sketch union instead of fan-out."""
    ev = spark.table("events")
    day_user = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    dau = day_user.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    days = day_user.select("day").distinct()
    mau = (
        day_user.alias("du")
        .join(
            F.broadcast(days.alias("d")),
            (F.col("du.day") <= F.col("d.day"))
            & (F.col("du.day") >= F.date_sub(F.col("d.day"), window_days - 1)),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("du.user_id").alias("mau"))
    )
    return (
        dau.join(mau, "day")
        .select(
            "day",
            F.col("dau").cast("long").alias("dau"),
            F.col("mau").cast("long").alias("mau"),
            F.round(F.col("dau") / F.col("mau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


def funnel_step_timing(spark: SparkSession) -> DataFrame:
    """Time-to-convert per funnel step: the gap distribution between a
    user's funnel stages (same stage chain as funnel_view_click_purchase
    — earliest view → first click after it → first purchase after that).
    Conversion RATES say how many users advance; this says how LONG the
    advance takes — the other half of every funnel readout.

    Median is EXACT and engine-portable via rank arithmetic (avg of the
    two middle rows per step), not percentile interpolation — Spark and
    DuckDB interpolate percentiles identically in theory but the
    two-middle-rows form is integer-indexed and immune to either
    engine's choice. The per-step window sorts one step's converters in
    one partition — at extreme scale swap for approx_percentile
    (documented trade; rates stay exact either way). Gaps in exact
    integer seconds (µs div 10^6)."""
    ev = spark.table("events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
        .join(per_user, "user_id")
        .filter(F.col("click_ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("click_ts").alias("t_click"))
    )
    first_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"))
        .join(first_click, "user_id")
        .filter(F.col("purchase_ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("purchase_ts").alias("t_purchase"))
    )
    stage = (
        per_user.join(first_click, "user_id")
        .join(first_purchase, "user_id", "left")
        .select(
            "user_id",
            ((F.unix_micros(F.col("t_click").cast("timestamp"))
              - F.unix_micros(F.col("t_view").cast("timestamp"))) / F.lit(1_000_000)
             ).cast("long").alias("view_to_click_s"),
            ((F.unix_micros(F.col("t_purchase").cast("timestamp"))
              - F.unix_micros(F.col("t_click").cast("timestamp"))) / F.lit(1_000_000)
             ).cast("long").alias("click_to_purchase_s"),
        )
    )
    gaps = stage.select(
        "user_id", F.lit("view_to_click").alias("step"),
        F.col("view_to_click_s").alias("gap_s"),
    ).unionByName(
        stage.filter(F.col("click_to_purchase_s").isNotNull()).select(
            "user_id", F.lit("click_to_purchase").alias("step"),
            F.col("click_to_purchase_s").alias("gap_s"),
        )
    )
    w = Window.partitionBy("step").orderBy("gap_s", "user_id")
    ranked = gaps.withColumn("rnk", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("step"))
    )
    return (
        ranked.groupBy("step")
        .agg(
            F.max("n").cast("long").alias("n_users"),
            F.round(F.avg("gap_s"), 6).alias("avg_gap_s"),
            F.round(
                F.avg(
                    F.when(
                        (F.col("rnk") == ((F.col("n") + 1) / 2).cast("long"))
                        | (F.col("rnk") == ((F.col("n") + 2) / 2).cast("long")),
                        F.col("gap_s"),
                    )
                ),
                6,
            ).alias("median_gap_s"),
            F.min("gap_s").cast("long").alias("min_gap_s"),
            F.max("gap_s").cast("long").alias("max_gap_s"),
        )
        .orderBy("step")
    )


def forecast_backtest(spark: SparkSession, horizon_days: int = 7) -> DataFrame:
    """Seasonal-naive forecast backtest: hold out the last `horizon_days`
    of the daily per-type series, forecast each held-out day with the
    TRAINING mean of its weekday, and score MAE / MAPE per event type —
    the capacity-planning sanity model every forecasting stack is
    benchmarked against (if a fancy model can't beat weekday means, it
    ships nothing).

    Weekday is engine-portable integer arithmetic — days-since-epoch
    mod 7 (datediff both engines) — never dayofweek(), whose origin
    differs across engines. One date-truncated count shuffle; train
    aggregates are O(types × 7); the split threshold is a broadcast
    scalar.

    Coverage is explicit (no-silent-caps): the train join is LEFT, so a
    test day whose (event_type, weekday) never appears in the training
    span is COUNTED in n_test_days and surfaced in n_dropped_days
    rather than silently shrinking the denominator; MAE/MAPE AND
    actual_mean average over the covered days only (the honest score —
    there is no forecast to err against on uncovered days, and scoring
    actual_mean over a different day set than forecast_mean would bias
    their comparison whenever n_dropped_days > 0; r6 ADVICE)."""
    daily = (
        spark.table("events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn(
            "weekday", (F.datediff("day", F.lit("1970-01-01")) % 7).cast("int")
        )
    )
    maxd = daily.agg(F.max("day").alias("max_day"))
    split = daily.crossJoin(F.broadcast(maxd)).withColumn(
        "is_test", F.datediff("max_day", F.col("day")) < horizon_days
    )
    train = (
        split.filter(~F.col("is_test"))
        .groupBy("event_type", "weekday")
        .agg(F.avg("n_events").alias("forecast"))
    )
    test = split.filter(F.col("is_test")).join(
        F.broadcast(train), ["event_type", "weekday"], "left"
    )
    err = F.abs(F.col("n_events") - F.col("forecast"))
    return (
        test.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test_days"),
            F.sum(F.col("forecast").isNull().cast("long"))
            .cast("long")
            .alias("n_dropped_days"),
            F.round(
                F.avg(F.when(F.col("forecast").isNotNull(), F.col("n_events"))), 6
            ).alias("actual_mean"),
            F.round(F.avg("forecast"), 6).alias("forecast_mean"),
            F.round(F.avg(err), 6).alias("mae"),
            F.round(F.avg(err / F.col("n_events")), 6).alias("mape"),
        )
        .orderBy("event_type")
    )


def srm_check(spark: SparkSession, expected_share: float = 0.5) -> DataFrame:
    """Sample-ratio mismatch check — the first gate of every experiment
    readout: does the observed user split match the intended assignment
    ratio? A chi-square test on per-arm DISTINCT user counts (events
    per user vary, so event counts would be the wrong denominator); an
    SRM flag invalidates the experiment before any metric is read
    (Fabijan et al., KDD'19 diagnoses). Same user_id % 2 assignment as
    ev_cuped_readout / ev_power_analysis, so the three readouts describe
    ONE experiment.

    chi2 = Σ (obs − exp)²/exp over the two arms, df = 1; the standard
    alarm is p < 0.001 ≈ chi2 > 10.83, precomputed as a literal (no
    p-value special functions needed). One distinct-user shuffle; arms
    aggregate is 2 rows."""
    users = (
        spark.table("events")
        .select("user_id")
        .distinct()
        .withColumn("variant", (F.col("user_id") % 2).cast("int"))
    )
    arms = users.groupBy("variant").agg(
        F.count(F.lit(1)).cast("double").alias("n_users")
    )
    total = arms.agg(F.sum("n_users").alias("n_total"))
    exp = F.when(
        F.col("variant") == 1, F.col("n_total") * expected_share
    ).otherwise(F.col("n_total") * (1.0 - expected_share))
    with_exp = arms.crossJoin(F.broadcast(total)).withColumn("expected", exp)
    chi2_cell = F.pow(F.col("n_users") - F.col("expected"), 2) / F.col("expected")
    per_arm = with_exp.withColumn("chi2_cell", chi2_cell)
    stat = per_arm.agg(F.sum("chi2_cell").alias("chi2"))
    return (
        per_arm.crossJoin(F.broadcast(stat))
        .select(
            "variant",
            F.col("n_users").cast("long").alias("n_users"),
            F.round("expected", 6).alias("expected_users"),
            F.round("chi2_cell", 6).alias("chi2_cell"),
            F.round("chi2", 6).alias("chi2"),
            (F.col("chi2") > 10.827566).alias("srm_flag"),
        )
        .orderBy("variant")
    )


def bot_regularity_screen(
    spark: SparkSession, min_events: int = 20, cv_threshold: float = 0.3
) -> DataFrame:
    """Bot-likeness screen on inter-event timing: human activity has
    bursty, high-variance gaps; scripted clients fire on near-constant
    intervals. Per user with >= min_events events, the coefficient of
    variation (stddev/mean) of consecutive gaps — cv below the
    threshold flags metronomic traffic. The behavioral complement of
    volume screens (rate limiting) and value screens (z-scores): a
    slow-but-perfectly-regular scraper passes both and fails this.

    One per-user lag window (exact integer µs gaps), one user-keyed
    aggregate; the flag recomputes from reported stats so the oracle
    value-checks the rule, not just the arithmetic.

    Determinism (r10 sf0.1 full-sweep finding): avg/stddev_samp over
    the integer gaps accumulate in doubles whose summation order is
    engine-specific, and one sf0.1 user's mean landed exactly on a 6dp
    rounding boundary (33374.0610425 s). Mean and variance are instead
    derived from EXACT integer moments — sum(gap) as long, sum(gap²)
    as decimal(38,0) (DuckDB: HUGEINT) — converted to double once, so
    both engines see bit-identical raw values; the final rounds use the
    integer-scaling idiom (round(x*1e6)/1e6), and the variance is
    clamped at 0 (the moment form can cancel to -1e-? on metronomic
    users where stddev_samp is exactly 0)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = (
        spark.table("events")
        .withColumn("gap_us", us - F.lag(us).over(w))
        .filter(F.col("gap_us").isNotNull())
    )
    g16 = F.col("gap_us").cast("decimal(16,0)")
    stats = gaps.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("double").alias("n_gaps"),
        F.sum("gap_us").cast("double").alias("s1"),
        F.sum(g16 * g16).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n_gaps")
    var = F.greatest(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_gaps"))
        / (F.col("n_gaps") - 1),
        F.lit(0.0),
    )
    cv = F.sqrt(var) / mean
    return (
        stats.filter((F.col("n_events") >= min_events) & (mean > 0))
        .select(
            "user_id",
            "n_events",
            (F.round(mean / 1e6 * 1e6, 0) / 1e6).alias("mean_gap_s"),
            (F.round(cv * 1e6, 0) / 1e6).alias("gap_cv"),
            (cv < cv_threshold).alias("bot_flag"),
        )
    )


def experiment_readout(spark: SparkSession, min_purchases: int = 14) -> DataFrame:
    """The experiment result readout completing the kit (ev_srm_check →
    gate, ev_power_analysis → design, ev_cuped_readout → variance
    reduction, THIS → decision): per-variant purchase conversion with
    the two-proportion pooled z statistic. Same user_id % 2 assignment
    as the rest of the kit, so all four describe one experiment.

    Conversion = "heavy purchaser" (>= `min_purchases` purchases):
    on this corpus EVERY user purchases at least once, so the binary
    any-purchase rule is degenerate (p_pool = 1 → zero-variance z);
    the count threshold sits at the corpus median (~14) so both arms
    carry real rates. The z denominator is nullif-guarded anyway — a
    degenerate pool reads as NULL, never a crash.

    Shape: one per-user conditional count, a 2-row variant aggregate,
    and the z statistic broadcast back from a scalar crossJoin — the
    readout is arithmetic over 2 rows regardless of corpus size."""
    users = (
        spark.table("events")
        .groupBy("user_id")
        .agg(
            (
                F.sum((F.col("event_type") == "purchase").cast("int"))
                >= min_purchases
            )
            .cast("int")
            .alias("converted")
        )
        .withColumn("variant", (F.col("user_id") % 2).cast("int"))
    )
    arms = users.groupBy("variant").agg(
        F.count(F.lit(1)).cast("double").alias("n_users"),
        F.sum("converted").cast("double").alias("n_converted"),
    )
    wide = (
        arms.agg(
            F.sum(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
            F.sum(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
            F.sum(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
            F.sum(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
        )
        .withColumn("p0", F.col("c0") / F.col("n0"))
        .withColumn("p1", F.col("c1") / F.col("n1"))
        .withColumn("p_pool", (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1")))
        .withColumn(
            "z",
            (F.col("p1") - F.col("p0"))
            / F.nullif(
                F.sqrt(
                    F.col("p_pool")
                    * (1.0 - F.col("p_pool"))
                    * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
                ),
                F.lit(0.0),
            ),
        )
    )
    return (
        arms.crossJoin(F.broadcast(wide))
        .select(
            "variant",
            F.col("n_users").cast("long").alias("n_users"),
            F.col("n_converted").cast("long").alias("n_converted"),
            F.round(F.col("n_converted") / F.col("n_users"), 6).alias("conv_rate"),
            F.round(F.col("p1") - F.col("p0"), 6).alias("lift_abs"),
            F.round("z", 6).alias("z_stat"),
            (F.abs(F.col("z")) > 1.959964).alias("significant_95"),
        )
        .orderBy("variant")
    )


def mad_outlier_days(spark: SparkSession, k: float = 3.0) -> DataFrame:
    """Robust outlier days per event type via median absolute deviation:
    robust_z = |x − median| / (1.4826·MAD). The robust twin of the CUSUM
    and prequential-z monitors — mean/std anomaly scores are themselves
    dragged by the outliers they hunt (one spike inflates σ and hides a
    second spike); the median/MAD pair has a 50% breakdown point, which
    is why production data-quality monitors (and the classic Leys et al.
    2013 recommendation) default to it.

    Exact medians via percentile() on the per-type day series — the
    series is one row per (type, day), thousands of rows at most even at
    100 TB of raw events, so the two scalar aggregates broadcast back;
    the heavy lifting is the one date-truncated count shuffle. MAD = 0
    (a perfectly flat series) yields robust_z NULL and no flag rather
    than a division blow-up."""
    daily = (
        spark.table("events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        # three consumers (median branch, deviation join, MAD branch over
        # the join) would each re-run the raw-events count shuffle — the
        # heavy pass at 100 TB. Lazy localCheckpoint materializes the tiny
        # (type, day) series once; everything downstream is scalar-sized.
        .localCheckpoint(eager=False)
    )
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(n_events, 0.5)").alias("med")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "absdev", F.abs(F.col("n_events") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(absdev, 0.5)").alias("mad")
    )
    z = F.col("absdev") / (1.4826 * F.nullif(F.col("mad"), F.lit(0.0)))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "day",
            F.col("n_events").cast("long").alias("n_events"),
            F.round(z, 6).alias("robust_z"),
            F.coalesce((z > k).cast("int"), F.lit(0)).alias("is_outlier"),
        )
        .orderBy("event_type", "day")
    )


def bounce_rate_daily(spark: SparkSession, gap_minutes: int = 30) -> DataFrame:
    """Daily bounce rate: fraction of sessions containing exactly ONE
    event, grouped by session-start day — the engagement-quality KPI
    every web/product analytics stack reports next to DAU. Rides the
    exact gaps-and-islands sessionizer (sessionize_gap_method), so the
    session definition is shared with ev_session_windows /
    ev_session_gap_method rather than re-derived.

    Session rollup is a partial agg over the user-partitioned session
    frame; the daily rollup is a second partial agg keyed by day —
    both map-side combinable, no new shuffle shapes at 100 TB."""
    sess = sessionize_gap_method(spark, gap_minutes)
    day = F.to_date(F.from_unixtime("session_start_epoch"))
    return (
        sess.groupBy(day.alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum((F.col("n_events") == 1).cast("long"))
            .cast("long")
            .alias("n_bounces"),
            F.round(
                F.sum((F.col("n_events") == 1).cast("long"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("bounce_rate"),
            F.round(F.avg("n_events"), 6).alias("avg_session_events"),
        )
        .orderBy("day")
    )


def kaplan_meier_survival(spark: SparkSession, censor_days: int = 3) -> DataFrame:
    """Kaplan–Meier survival curve of user lifetime, per experiment
    variant — the churn/retention readout survival analysis gives that
    plain retention curves cannot: users still active near the end of
    the observation window are CENSORED (we do not know when they will
    churn), not counted as churned, so the curve is unbiased by the
    window edge.

    Lifetime t = days between a user's first and last event; a user
    whose last event falls within `censor_days` of the corpus max day
    is censored at t. Variant = user_id % 2 (the same assignment as the
    experiment kit, making this its retention companion). The KM
    estimator: S(t) = prod_{s<=t} (1 - d_s/n_s) with d_s = churn events
    at s and n_s = at-risk count (reverse cumulative of d+c).

    Scale shape: one per-user span aggregate (map-side combinable
    min/max), then ALL windows ride the life-table frame — grouped by
    (variant, t) so its row count is bounded by the observation span,
    never the user count; both cumulations are variant-partitioned (no
    global windows). The product is exp(sum(ln .)) with the factor
    floored at 1e-300 so a terminal d==n step underflows to exactly
    0.0 in both engines instead of diverging on ln(0) semantics."""
    spans = (
        spark.table("events")
        .groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("first_day"),
            F.max(F.to_date("ts")).alias("last_day"),
        )
    )
    obs = spans.agg(F.max("last_day").alias("obs_end"))
    users = spans.crossJoin(F.broadcast(obs)).select(
        (F.col("user_id") % 2).cast("int").alias("variant"),
        F.datediff("last_day", "first_day").cast("int").alias("t_days"),
        (F.datediff("obs_end", "last_day") < censor_days)
        .cast("int")
        .alias("censored"),
    )
    table = users.groupBy("variant", "t_days").agg(
        F.sum(1 - F.col("censored")).cast("long").alias("n_churned"),
        F.sum("censored").cast("long").alias("n_censored"),
    )
    w_rev = (
        Window.partitionBy("variant")
        .orderBy("t_days")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w_cum = (
        Window.partitionBy("variant")
        .orderBy("t_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    at_risk = F.sum(F.col("n_churned") + F.col("n_censored")).over(w_rev)
    factor = 1.0 - F.col("n_churned") / F.col("n_at_risk").cast("double")
    return (
        table.withColumn("n_at_risk", at_risk.cast("long"))
        .withColumn(
            "survival",
            F.round(
                F.exp(
                    F.sum(F.log(F.greatest(factor, F.lit(1e-300)))).over(w_cum)
                ),
                6,
            ),
        )
        .select(
            "variant", "t_days", "n_at_risk", "n_churned", "n_censored",
            "survival",
        )
        .orderBy("variant", "t_days")
    )


def diff_in_diff_readout(spark: SparkSession) -> DataFrame:
    """Difference-in-differences readout on per-user purchase value —
    the quasi-experimental companion to the A/B kit (ev_srm_check /
    ev_cuped_readout / ev_experiment_readout): when assignment is not
    randomized-at-exposure, the treatment effect is estimated as the
    treated group's pre→post change minus the control group's, netting
    out shared time trends.

    Period split: the corpus midpoint day (integer arithmetic on the
    broadcast min/max scalar). Metric y = per-user purchase value sum
    within the period, with the user×period frame built explicitly
    (users silent in a period contribute y=0, not a dropped row — the
    panel is balanced by construction). DiD = (T_post − T_pre) −
    (C_post − C_pre); SE from the four cell sample variances
    (unequal-variance normal approximation); every output row carries
    the scalar verdict so the 4-row cell table is self-contained.
    A degenerate cell with n_users == 1 has an undefined sample
    variance (NULL); its SE term is taken as 0 so did_se / did_z stay
    defined -- did_se is then a LOWER bound and the cell's own var_y
    row stays NULL to flag the degeneracy.

    Determinism (r12, after a once-in-a-sweep hash flake): `value` is
    2dp money, so `round(value*100)` canonicalizes every row to EXACT
    integer cents identically in both engines; the per-user sums and
    the four cell moments (n, Σy, Σy²) are then exact integers whose
    totals cannot depend on partition/summation order, and mean/var
    derive from those moments with one cast to double — avg()/
    var_samp() over raw doubles had ULP jitter that could flip a 6dp
    rounding boundary run-to-run (the verify-skill moment-statistics
    gotcha, previously hit by ev_bot_regularity).

    Scale shape: one events pass (map-side-combinable conditional sum),
    a distinct-users frame joined LEFT to period sums, a 4-row cell
    aggregate, and the scalar DiD broadcast back. No windows at all."""
    ev = spark.table("events")
    span = ev.agg(
        F.min(F.to_date("ts")).alias("min_day"),
        F.max(F.to_date("ts")).alias("max_day"),
    )
    tagged = ev.crossJoin(F.broadcast(span)).select(
        "user_id",
        (
            F.datediff(F.to_date("ts"), "min_day")
            >= F.floor(F.datediff("max_day", "min_day") / 2)
        )
        .cast("int")
        .alias("period"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("pv_cents"),
    )
    sums = tagged.groupBy("user_id", "period").agg(
        F.sum("pv_cents").alias("y_cents")
    )
    frame = (
        ev.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(spark.range(2).select(F.col("id").cast("int").alias("period"))))
        .join(sums, ["user_id", "period"], "left")
        .select(
            (F.col("user_id") % 2).cast("int").alias("variant"),
            "period",
            F.coalesce("y_cents", F.lit(0).cast("long")).alias("y_cents"),
        )
    )
    yd = F.col("y_cents").cast("decimal(38,0)")
    moments = frame.groupBy("variant", "period").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("y_cents").cast("decimal(38,0)").alias("sum_y"),
        F.sum(yd * yd).alias("sum_y2"),
    )
    n_d = F.col("n_users").cast("double")
    cells = moments.select(
        "variant",
        "period",
        "n_users",
        (F.col("sum_y").cast("double") / n_d / 100.0).alias("mean_y"),
        F.when(
            F.col("n_users") > 1,
            (F.col("sum_y2") * F.col("n_users") - F.col("sum_y") * F.col("sum_y"))
            .cast("double")
            / (n_d * (n_d - 1.0))
            / 10000.0,
        ).alias("var_y"),
    )
    wide = cells.agg(
        *[
            F.sum(
                F.when(
                    (F.col("variant") == v) & (F.col("period") == p),
                    F.col(c),
                )
            ).alias(f"{c}_{v}{p}")
            for v in (0, 1)
            for p in (0, 1)
            for c in ("mean_y", "var_y", "n_users")
        ]
    )
    did = (F.col("mean_y_11") - F.col("mean_y_10")) - (
        F.col("mean_y_01") - F.col("mean_y_00")
    )
    # NULL-safe SE: coalesce each WHOLE var/n quotient to 0, matching
    # the DuckDB oracle's coalesce(var_y / n_users, 0.0) placement —
    # this covers both the singleton cell (var_samp NULL, n = 1) and
    # the degenerate empty cell (var AND n NULL: 0/NULL would stay
    # NULL if only var were coalesced). Lower-bound SE, documented
    # above. The per-cell var_y column is NOT coalesced.
    se = F.sqrt(
        F.coalesce(F.col("var_y_00") / F.col("n_users_00"), F.lit(0.0))
        + F.coalesce(F.col("var_y_01") / F.col("n_users_01"), F.lit(0.0))
        + F.coalesce(F.col("var_y_10") / F.col("n_users_10"), F.lit(0.0))
        + F.coalesce(F.col("var_y_11") / F.col("n_users_11"), F.lit(0.0))
    )
    return (
        cells.crossJoin(F.broadcast(wide.select(did.alias("_did"), se.alias("_se"))))
        .select(
            "variant",
            "period",
            "n_users",
            # integer-scaling round + `+ 0.0` negative-zero normalization
            # on the signed columns, mirrored in the oracle (verify-skill
            # idioms) — inputs are already deterministic doubles
            (F.round(F.col("mean_y") * 1e6) / 1e6).alias("mean_y"),
            (F.round(F.col("var_y") * 1e6) / 1e6).alias("var_y"),
            (F.round(F.col("_did") * 1e6) / 1e6 + 0.0).alias("did_estimate"),
            (F.round(F.col("_se") * 1e6) / 1e6).alias("did_se"),
            (
                F.round(F.col("_did") / F.nullif("_se", F.lit(0.0)) * 1e6) / 1e6
                + 0.0
            ).alias("did_z"),
        )
        .orderBy("variant", "period")
    )


def cohort_ltv_curve(spark: SparkSession) -> DataFrame:
    """Cumulative lifetime-value curve per signup cohort: users grouped
    by first-event WEEK; for each cohort age k (weeks since signup),
    the cohort's cumulative purchase value per member — the payback
    readout every growth team draws (which cohort recoups acquisition
    cost, and by what age). ev_retention_cohorts answers "do they come
    back"; this answers "what are they worth by then".

    Week index = days-since-epoch div 7: exact integer arithmetic
    identical in both engines (the weekday convention from
    forecast_backtest — never interval diffs; weekly because the
    events corpus spans ~a month, where monthly cohorts are a single
    degenerate cell). Ages with zero purchases still get a row (the
    period frame spans every age up to the cohort's horizon) so the
    curve is gap-free and flat segments are visible.

    Shape: one per-user first-week aggregate, one (cohort, age)
    revenue rollup joined onto a sequence-generated age spine, then a
    cohort-partitioned running sum over the age frame — rows bounded
    by cohorts × weeks, never user count."""
    ev = spark.table("events")
    m_idx = (
        F.floor(F.datediff(F.to_date("ts"), F.lit("1970-01-01")) / 7)
        .cast("long")
        .alias("m_idx")
    )
    base = ev.select(
        "user_id",
        m_idx,
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .otherwise(0.0)
        .alias("pv"),
    )
    firsts = base.groupBy("user_id").agg(F.min("m_idx").alias("cohort_m"))
    sizes = firsts.groupBy("cohort_m").agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    rev = (
        base.join(firsts, "user_id")
        .groupBy("cohort_m", (F.col("m_idx") - F.col("cohort_m")).alias("age_m"))
        .agg(F.sum("pv").alias("period_value"))
    )
    horizon = rev.groupBy("cohort_m").agg(F.max("age_m").alias("max_age"))
    spine = horizon.select(
        "cohort_m", F.explode(F.sequence(F.lit(0), F.col("max_age"))).alias("age_m")
    )
    filled = spine.join(rev, ["cohort_m", "age_m"], "left").select(
        "cohort_m", "age_m", F.coalesce("period_value", F.lit(0.0)).alias("period_value")
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("age_m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        filled.withColumn("cum_value", F.sum("period_value").over(w))
        .join(F.broadcast(sizes), "cohort_m")
        .select(
            F.col("cohort_m").cast("int").alias("cohort_w"),
            F.col("age_m").cast("int").alias("age_w"),
            "n_users",
            F.round("period_value", 2).alias("period_value"),
            F.round(F.col("cum_value") / F.col("n_users"), 6).alias(
                "cum_ltv_per_user"
            ),
        )
        .orderBy("cohort_w", "age_w")
    )


def wilson_conversion_ci(
    spark: SparkSession, min_purchases: int = 14, z: float = 1.959964
) -> DataFrame:
    """Wilson score 95% confidence interval on per-variant conversion —
    the interval the normal (Wald) approximation in
    ev_experiment_readout degrades from at small n or extreme p: Wilson
    stays inside [0, 1], never collapses to zero width at p ∈ {0, 1},
    and is the standard ranking interval for conversion metrics.

      center = (p + z²/2n) / (1 + z²/n)
      half   = z/(1 + z²/n) · √(p(1−p)/n + z²/4n²)

    Same user_id % 2 assignment and >= min_purchases conversion rule
    as the rest of the experiment kit, so all five readouts describe
    one experiment. One per-user conditional count and a 2-row variant
    aggregate; the interval is closed-form arithmetic on (n, conv)."""
    users = (
        spark.table("events")
        .groupBy("user_id")
        .agg(
            (
                F.sum((F.col("event_type") == "purchase").cast("int"))
                >= min_purchases
            )
            .cast("int")
            .alias("converted")
        )
        .withColumn("variant", (F.col("user_id") % 2).cast("int"))
    )
    arms = users.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    n = F.col("n_users").cast("double")
    p = F.col("n_converted") / n
    z2 = z * z
    denom = 1.0 + z2 / n
    center = (p + z2 / (2.0 * n)) / denom
    half = (
        F.lit(z)
        / denom
        * F.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
    )
    return arms.select(
        "variant",
        "n_users",
        "n_converted",
        F.round(p, 6).alias("conversion"),
        F.round(center - half, 6).alias("wilson_lo"),
        F.round(center + half, 6).alias("wilson_hi"),
    ).orderBy("variant")


def behavior_entropy_screen(
    spark: SparkSession, min_events: int = 20, flag_below: float = 0.5
) -> DataFrame:
    """Behavioral-entropy bot screen: Shannon entropy of a user's
    event-type mix, normalized by the maximum for their observed type
    count (H / ln k). The third member of the behavioral screen next
    to ev_bot_regularity (timing) and ev_rate_limit_windows (volume):
    a scraper that randomizes its intervals and stays under rate
    limits still does ONE thing — near-zero mix entropy at high volume
    is the tell. Humans wander (views, clicks, purchases interleave).

    Single-type users read H = 0 and H_norm = 0 by the explicit k = 1
    convention (ln 1 would divide by zero). One (user, type) count,
    one user rollup computing −Σ p ln p from the sum-of-c·ln c
    identity — H = ln n − (Σ c ln c)/n, exact in one aggregate pass
    with no per-user fan-back join."""
    counts = (
        spark.table("events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_user = counts.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c") * F.log(F.col("c"))).alias("sum_clnc"),
    )
    n = F.col("n_events").cast("double")
    h = F.log(n) - F.col("sum_clnc") / n
    h_norm = F.when(F.col("n_types") == 1, 0.0).otherwise(
        h / F.log(F.col("n_types").cast("double"))
    )
    return (
        per_user.filter(F.col("n_events") >= min_events)
        .select(
            "user_id",
            "n_events",
            "n_types",
            F.round(h, 6).alias("entropy"),
            F.round(h_norm, 6).alias("entropy_norm"),
            (h_norm < flag_below).alias("low_entropy_flag"),
        )
        .orderBy("user_id")
    )


def funnel_windowed(spark: SparkSession, window_hours: int = 24) -> DataFrame:
    """Time-windowed ordered funnel (the windowFunnel primitive):
    anchored at each user's FIRST view, the click must land within
    `window_hours` of that view and the purchase after the click but
    still inside the SAME window — ev_funnel_conversion without the
    window answers "did they ever", this answers "did the journey
    complete while the intent was live", which is what campaign
    attribution windows actually measure.

    Same conditional-min chain as the unwindowed funnel (one shuffle
    per stage on user_id, no self-joins on events), with the window
    bound pushed into each stage's filter so late events never reach
    the aggregate.

    The per-user anchor (first-view time) and first-click frames are
    PINNED (lazy localCheckpoint): anchor has three consumers and
    first_click two, and without the pins each consumer re-instantiates
    its upstream events scan — 7 scans in the physical plan, 3 of them
    FULL-corpus (anchor's conditional min can't push a filter). Pinned,
    events is read exactly three times (the all-rows anchor pass plus
    the click/purchase filtered slices — the natural minimum for this
    join shape) and the checkpoints are user-count-bounded two-column
    frames. Gated in tests/test_plan_audit.py."""
    ev = spark.table("events")
    t = F.col("ts").cast("timestamp")
    anchor = (
        ev.groupBy("user_id")
        .agg(F.min(F.when(F.col("event_type") == "view", t)).alias("t_view"))
        .localCheckpoint(eager=False)
    )
    deadline = F.col("t_view") + F.expr(f"INTERVAL {window_hours} HOURS")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", t.alias("click_ts")
    )
    first_click = (
        clicks.join(anchor, "user_id")
        .filter(
            (F.col("click_ts") >= F.col("t_view")) & (F.col("click_ts") <= deadline)
        )
        .groupBy("user_id")
        .agg(F.min("click_ts").alias("t_click"))
        .localCheckpoint(eager=False)
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", t.alias("purchase_ts")
    )
    first_purchase = (
        purchases.join(first_click.join(anchor, "user_id"), "user_id")
        .filter(
            (F.col("purchase_ts") >= F.col("t_click"))
            & (F.col("purchase_ts") <= deadline)
        )
        .groupBy("user_id")
        .agg(F.min("purchase_ts").alias("t_purchase"))
    )
    funnel = (
        anchor.filter(F.col("t_view").isNotNull())
        .join(first_click, "user_id", "left_outer")
        .join(first_purchase, "user_id", "left_outer")
    )
    n1 = F.count(F.lit(1)).cast("long")
    n2 = F.sum(F.col("t_click").isNotNull().cast("long")).cast("long")
    n3 = F.sum(F.col("t_purchase").isNotNull().cast("long")).cast("long")
    return funnel.agg(
        F.lit(int(window_hours)).alias("window_hours"),
        n1.alias("n_viewed"),
        n2.alias("n_clicked_in_window"),
        n3.alias("n_purchased_in_window"),
        F.round(n2 / n1.cast("double"), 6).alias("view_to_click_rate"),
        F.round(
            n3 / F.greatest(n2, F.lit(1)).cast("double"), 6
        ).alias("click_to_purchase_rate"),
        F.round(n3 / n1.cast("double"), 6).alias("full_funnel_rate"),
    )


def markov_transition_counts(spark: SparkSession) -> DataFrame:
    """The distributed half of markov_absorption as a standalone, fully
    SQL-expressible query: per-user event sequences truncated at the
    FIRST purchase (absorbing) or terminated into an absorbing
    '__drop__' after the last event, reduced to the (prev_state,
    next_state, n) transition-count table the fundamental-matrix solve
    consumes.

    Registering it separately gives the driver an ORACLE row for the
    entire data-touching portion of the absorbing-chain pipeline
    (VERDICT r8 task #5) — what remains rows-only in
    ev_markov_absorption is exactly the ≤(k+2)² driver-side numpy
    solve, which operates on THIS table.

    Scale shape: one user-partitioned window pass (running purchase
    flag + lead), then a map-side-combinable count over a types² key
    space. No driver collect here — that belongs to the consumer."""
    ev = spark.table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    purchased_before = F.coalesce(
        F.max((F.col("event_type") == "purchase").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    seq = (
        ev.withColumn("seen", purchased_before)
        .filter(F.col("seen") == 0)  # keep through the FIRST purchase
        .withColumn("next_type", F.lead("event_type").over(w))
        .withColumn(
            "next_state",
            F.when(F.col("event_type") == "purchase", F.lit(None)).otherwise(
                F.coalesce("next_type", F.lit("__drop__"))
            ),
        )
        .filter(F.col("next_state").isNotNull())
        .select(F.col("event_type").alias("prev_state"), "next_state")
    )
    return (
        seq.groupBy("prev_state", "next_state")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("prev_state", "next_state")
    )


def markov_absorption(spark: SparkSession) -> DataFrame:
    """Absorbing-chain conversion analysis over the behavioral Markov
    model: per-user sequences are truncated at the FIRST purchase
    (absorbing 'conversion') or, failing that, terminate into an
    absorbing 'drop' after their last event; the fundamental-matrix
    solve b = (I − Q)⁻¹R then gives, for every transient event type,
    the probability a user currently THERE eventually converts — the
    quantity behind Markov 'removal effect' attribution, which
    ev_attribution_credit's position rules approximate.

    Distributed part: one user-partitioned window pass emits
    transition counts truncated at absorption (a types² table). Driver
    part: a ≤(k+2)² solve on that bounded count table — the same
    model-budget convention as the k-means/PQ codebooks (the matrix is
    event-type-sized, never data-sized).

    PROMOTED rows-only -> fully oracled (r14, VERDICT r13 #4): the
    LAPACK solve is replaced by the QUANTIZED truncated Neumann series
    X_{t+1} = snap9(rhs + Q·X_t) for a fixed 150 rounds (the
    dedup_pagerank_centrality recipe) — Q/R entries are snapped
    integer-count divisions, every round snaps to the 1e-9 grid with
    the portable half-up idiom, and the output IS the round-150
    quantized iterate (no second rounding), so a DuckDB recursive CTE
    replays the whole trace bit-for-bit. Convergence is measured, not
    hoped: spectral radius of Q on this corpus is ~0.78-0.80 across
    all three SFs, so the T=150 truncation error is ~1e-15 — machine
    precision, seven orders inside the mass shadow's 6dp bound — and
    the per-round snap contributes at most 5e-10/(1-ρ) ≈ 2.5e-9.
    Planted-chain exactness and row-stochasticity stay pinned in
    test_round7b_ops.py."""
    transient, B, steps = _absorption_solve(spark)
    rows = [
        (s, float(B[i, 0]), float(B[i, 1]), float(steps[i]))
        for i, s in enumerate(transient)
    ]
    return spark.createDataFrame(
        rows,
        "state string, p_conversion double, p_drop double, "
        "expected_steps double",
    )


#: fixed Neumann truncation depth shared by the engine iterate and the
#: DuckDB recursive-CTE replay — measured: spectral radius ~0.8 on this
#: corpus puts the T=150 truncation error at machine precision.
ABSORPTION_ITERS = 150


def _absorption_solve(spark: SparkSession, iters: int = ABSORPTION_ITERS):
    """Shared fundamental-matrix quantities for markov_absorption and its
    conservation shadow: returns (sorted transient states, B = absorption
    probabilities [purchase, __drop__], expected steps).

    r14: the LAPACK solve of (I − Q)X = [R | 1] is replaced by its
    truncated Neumann series X_{t+1} = snap9(rhs + Q·X_t), X_0 = 0,
    with every probability entry and every round snapped to the 1e-9
    grid via the portable half-up idiom floor(x·1e9 + 0.5)/1e9 — the
    engine-portable form that lets a DuckDB recursive CTE replay the
    exact trace (the dedup_pagerank_centrality quantized-replay
    pattern). Mathematically identical in the limit: Σ Qᵗ·rhs =
    (I−Q)⁻¹·rhs whenever ρ(Q) < 1, which holds for any absorbing chain
    where every transient state reaches absorption. A chain violating
    that (a transient state with no path to absorption — the case the
    old LAPACK path flagged as singular (I−Q)) is detected HERE, not
    just by the separate mass shadow (ADVICE r14 #2): after the
    truncated iterate, every row's absorbed mass must sit within the
    documented snap/truncation bound of 1.0 or the old descriptive
    error is raised, so a direct caller can never mistake a partial
    t-step absorption mass for converged probabilities."""
    import numpy as np

    def snap9(a):
        # half-up on both engines (np.round would be half-to-even)
        return np.floor(a * 1e9 + 0.5) / 1e9

    counts = {
        (r["prev_state"], r["next_state"]): r["n"]
        for r in markov_transition_counts(spark)
        .collect()  # bounded: (event types + 2)^2 rows — model budget
    }
    transient = sorted({p for p, _ in counts} - {"purchase"})
    absorbing = ["purchase", "__drop__"]
    idx = {s: i for i, s in enumerate(transient)}
    k = len(transient)
    Q = np.zeros((k, k))
    R = np.zeros((k, 2))
    row_tot: dict = {}
    for (p, _), n in counts.items():
        row_tot[p] = row_tot.get(p, 0) + n
    for (p, nx), n in counts.items():
        if p == "purchase":
            continue
        # integer/integer division is exactly rounded IEEE on both
        # engines; the snap is symmetry with the SQL replay
        if nx in idx:
            Q[idx[p], idx[nx]] = snap9(n / row_tot[p])
        elif nx in ("purchase", "__drop__"):
            R[idx[p], absorbing.index(nx)] = snap9(n / row_tot[p])
    rhs = np.hstack([R, np.ones((k, 1))])
    X = np.zeros((k, 3))
    for _ in range(iters):
        X = snap9(rhs + Q @ X)
    # conservation check (ADVICE r14 #2, margin re-derived ADVICE r15):
    # this is a DEGENERACY detector, not a convergence assertion — a
    # transient state with no path to absorption keeps its trapped mass
    # forever (absorbed stays near 0), while any legitimate chain's
    # truncation residual is ~ρ(Q)^T. The old 1e-6 margin was calibrated
    # to the measured ρ~0.8 (0.8^150 ≈ 4e-15) and would false-alarm on a
    # valid slow-mixing chain (ρ>~0.91 leaves >1e-6 at T=150); 0.99
    # tolerates any ρ ≤ 0.969 while degenerate states still read far
    # below it. The 6dp published values are unaffected: the measured
    # corpus converges to machine precision either way.
    # (>1 stays a hard error: mass can only overshoot by snap noise,
    # anything more is a transition-table bug, not slow mixing)
    absorbed = X[:, 0] + X[:, 1]
    bad = [
        transient[i]
        for i in range(k)
        if absorbed[i] < 0.99 or absorbed[i] > 1.0 + 1e-6
    ]
    if bad:
        raise ValueError(
            "(I - Q) is singular for this chain: transient states "
            f"{bad} do not reach absorption within {iters} Neumann "
            "rounds (no path to an absorbing state) — absorption "
            "probabilities are undefined"
        )
    return transient, X[:, :2], X[:, 2]


def markov_absorption_mass(spark: SparkSession) -> DataFrame:
    """Oracled conservation shadow of ev_markov_absorption (which stays
    rows-only: a matrix solve isn't SQL). Every transient state's
    absorption probabilities must sum to EXACTLY 1 — algebraically,
    (I−Q)·1 = R·1 because each state's outgoing transition mass is a
    full probability distribution, so (I−Q)⁻¹R·1 = 1 up to solver float
    error (~1e-15, seven orders inside the 6dp round). The DuckDB
    oracle derives the SAME transient-state list relationally from the
    transition table and asserts mass 1.0 per state — signing the whole
    chain end-to-end: window-pass truncation → count table → row
    normalization → linear solve. Mass is summed UNROUNDED (summing the
    6dp-rounded per-column outputs could read 0.999999/1.000001)."""
    transient, B, _ = _absorption_solve(spark)
    rows = [
        (s, float(round(B[i, 0] + B[i, 1], 6)))
        for i, s in enumerate(transient)
    ]
    return spark.createDataFrame(rows, "state string, absorbed_mass double")
