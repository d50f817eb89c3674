"""Mergeable-sketch rollups over `events` (north-star extension: the
pre-aggregation layer a 100 TB analytics store keeps per partition/day so
distinct-count and quantile questions never rescan raw data).

Built on Spark 4's native Apache DataSketches functions (JVM-side,
whole-stage-codegen aggregates — no UDFs):

- HLL: `hll_sketch_agg` per (event_type, day) -> `hll_union_agg` rollup.
  The sketch column is the stored artifact; estimates come out of the
  merge, so a year of dailies answers "distinct users last quarter"
  by unioning ~90 sketches instead of rescanning the quarter.
- KLL: `kll_sketch_agg_double` per group -> `kll_sketch_merge_double`
  rollup -> quantiles with bounded rank error, same merge-don't-rescan
  contract.

Sketch estimates are deterministic for fixed input + params but are NOT
reproducible in DuckDB (different algorithms), so the estimate queries
register rows-only; the load-bearing invariants — merge-of-parts ==
sketch-of-whole, and rank-error bounds vs exact — are pinned in
tests/test_pipeline_ops.py, and as of r11 every sketch's documented
ACCURACY CONTRACT is additionally oracled as a constant-true audit
query (ev_hll_rollup_bound, ev_kll_rank_bound, ev_hll_overlap_bound —
see the *_error_bound / *_rank_bound functions below). The top-k
rollup is the exception that promotes outright: at tested SFs it sits
in the sketch's exact regime, so its output equals the exact SQL
top-k and is fully oracled.

Reference parity note: the reference keeps two driver-side counters
(uav/main.py:90-91); sketches are the scale generalization of "running
tallies the driver can afford to keep".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def hll_daily_user_sketches(spark: SparkSession, lg_k: int = 12) -> DataFrame:
    """Per (event_type, day) HLL sketch of user_id — the stored daily
    artifact. lg_k=12 -> ~2 KB per sketch, <1% typical error."""
    ev = spark.table("events")
    return (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sketch"))
    )


def hll_rollup(spark: SparkSession, lg_k: int = 12) -> DataFrame:
    """Distinct-users per event_type from MERGED daily sketches, next to
    the exact count: the estimate answers from ~|days| tiny sketches,
    the exact column exists so the registered output self-documents the
    error. Merge is associative — the same rollup works day->month->year
    without touching raw rows."""
    daily = hll_daily_user_sketches(spark, lg_k)
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_users"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = (
        spark.table("events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return merged.join(exact, "event_type").select(
        "event_type", "n_days", "est_users", "exact_users"
    )


def kll_value_quantiles(spark: SparkSession, k: int = 200) -> DataFrame:
    """Per-event-type p50/p90/p99 of `value` from per-day KLL sketches
    merged upward — quantiles WITHOUT a sort or a full rescan. k=200
    gives ~1.65% one-sided rank error (DataSketches bound)."""
    ev = spark.table("events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.kll_sketch_agg_double("value", F.lit(k)).alias("sk")
    )
    # kll_sketch_merge_double is a two-sketch scalar (no union-agg form
    # yet): fold the per-day sketches with aggregate(); day counts per
    # group are small (the rollup fan-in), so collect_list is bounded.
    # slice(2..) keeps the init sketch from merging with itself.
    merged = daily.groupBy("event_type").agg(
        F.collect_list("sk").alias("sks")
    ).select(
        "event_type",
        F.aggregate(
            F.expr("slice(sks, 2, greatest(size(sks) - 1, 0))"),
            F.element_at("sks", 1),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("sk"),
    )
    return merged.select(
        "event_type",
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.5)), 6).alias("p50"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.9)), 6).alias("p90"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.99)), 6).alias("p99"),
        F.kll_sketch_get_n_double("sk").alias("n"),
    )


def topk_daily_sketches(
    spark: SparkSession, max_items: int = 4096
) -> DataFrame:
    """Per (event_type, day) frequent-items sketch of user_id
    (approx_top_k_accumulate — Spark 4's mergeable top-k state). With
    maxItemsTracked >= the group's distinct count the counts are exact;
    under-sized, it degrades gracefully to approximate heavy hitters.
    ~The stored daily artifact, like the HLL/KLL dailies."""
    ev = spark.table("events")
    return ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.expr(f"approx_top_k_accumulate(user_id, {max_items})").alias(
            "state"
        )
    )


class ExactRegimeViolation(RuntimeError):
    """A sketch query's exact-SQL oracle premise no longer holds at the
    current data scale — the query is CORRECT but approximate, so the
    oracle comparison must be demoted to rows-only, not read as a wrong
    answer."""


def topk_users_rollup(
    spark: SparkSession, k: int = 10, max_items: int = 4096, slack: int = 16,
    guard_exact_regime: bool = False,
) -> DataFrame:
    """Top-k users per event_type from MERGED daily sketches — the
    frequent-items member of the mergeable-summaries trio (HLL distinct,
    KLL quantiles, top-k frequencies): a quarter's heavy hitters is a
    combine of ~90 daily states, never a rescan. Output is exploded to
    (event_type, rnk, user_id, est_count) rows.

    Tie discipline (ADVICE r4): re-deriving rank relationally fixes tie
    ORDER, but asking the sketch for exactly k items leaves MEMBERSHIP
    at the k-th boundary to the sketch's internal (unspecified) order
    when counts tie across the cutoff. So the estimate over-fetches
    k + `slack` items and the k-cut happens relationally on
    (count desc, user_id) — deterministic membership whenever the
    boundary tie group fits inside the slack (tests pin the boundary
    against the exact group-by; a >slack-wide tie at the cutoff would
    surface there).

    `guard_exact_regime` (ADVICE r11): the registry's exact-SQL oracle is
    only valid while every (event_type, day) group's distinct-user count
    stays <= maxItemsTracked — past that the sketch degrades (correctly)
    to approximate heavy hitters and the oracle sweep would misread a
    working query as a divergence. The guard asserts the precondition
    with one small agg over events (cheap next to the two sketch passes)
    and raises ExactRegimeViolation carrying the measured margin instead
    of letting the sweep surface a confusing hash mismatch."""
    if guard_exact_regime:
        worst = (
            spark.table("events")
            .groupBy("event_type", F.to_date("ts").alias("day"))
            .agg(F.countDistinct("user_id").alias("n_distinct"))
            .agg(F.max("n_distinct").alias("worst"))
            .first()["worst"]
        )
        if worst is not None and worst > max_items:
            raise ExactRegimeViolation(
                f"ev_topk_users_rollup exact-SQL oracle precondition broken: "
                f"max per-(event_type, day) distinct users = {worst} > "
                f"maxItemsTracked = {max_items}; the sketch is now "
                "approximate — demote this query to rows-only"
            )
    daily = topk_daily_sketches(spark, max_items)
    merged = daily.groupBy("event_type").agg(
        F.expr("approx_top_k_combine(state)").alias("state")
    )
    est = merged.select(
        "event_type",
        F.expr(f"approx_top_k_estimate(state, {k + slack})").alias("top"),
    )
    flat = est.select("event_type", F.explode("top").alias("e")).select(
        "event_type",
        F.col("e.item").cast("long").alias("user_id"),
        F.col("e.count").cast("long").alias("est_count"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("est_count").desc(), "user_id"
    )
    return (
        flat.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("event_type", "rnk", "user_id", "est_count")
        .orderBy("event_type", "rnk")
    )


def hll_audience_overlap(spark: SparkSession, lg_k: int = 12) -> DataFrame:
    """Sketch-based audience-overlap matrix: estimated |users(A) ∩
    users(B)| for every event-type pair via inclusion-exclusion over
    HLL sketches — |A∩B| ≈ |A| + |B| - |A∪B|, with |A∪B| from
    hll_union (lossless on HLL registers). The segment-overlap question
    every audience/attribution system answers WITHOUT re-scanning raw
    events: per-type sketches build in one pass (KBs each), and any
    pair intersects driver-free from the stored sketches.

    Inclusion-exclusion error compounds both sketches' relative error
    (~1.04/sqrt(2^lg_k) each) and is the standard caveat for SMALL
    intersections of LARGE sets — the test pins estimates against the
    exact countDistinct truth at a tolerance derived from that bound.

    One event scan -> |types| sketches -> |types|² in-row pair math
    (the pair join is sketch-count-sized, never event-sized). Sketches
    aren't oracle-portable -> rows-only + pytest exactness."""
    ev = spark.table("events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sketch"),
    )
    a = sk.select(
        F.col("event_type").alias("type_a"), F.col("sketch").alias("sk_a")
    )
    b = sk.select(
        F.col("event_type").alias("type_b"), F.col("sketch").alias("sk_b")
    )
    est_a = F.hll_sketch_estimate("sk_a")
    est_b = F.hll_sketch_estimate("sk_b")
    est_union = F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    inter = est_a + est_b - est_union
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            est_a.cast("long").alias("est_users_a"),
            est_b.cast("long").alias("est_users_b"),
            est_union.cast("long").alias("est_union"),
            F.greatest(inter, F.lit(0.0)).cast("long").alias("est_overlap"),
            F.round(
                F.greatest(inter, F.lit(0.0)) / F.least(est_a, est_b), 6
            ).alias("overlap_coeff"),
        )
        .orderBy("type_a", "type_b")
    )


def hll_rollup_error_bound(
    spark: SparkSession, lg_k: int = 12, sigmas: float = 4.0
) -> DataFrame:
    """Accuracy-contract audit for the rows-only HLL rollup (the
    rel_approx_distinct_bound pattern): DataSketches HLL relative
    standard error is ~1.04/sqrt(2^lg_k) (~1.6% at lg_k=12), and the
    estimate is deterministic for fixed input+params, so
    |est − exact| ≤ sigmas·rse·exact + 16 is a stable, checkable bound.
    n_days and exact_users are exact integer anchors the oracle
    recomputes; within_bound is the contract verdict."""
    rse = 1.04 / (2.0 ** (lg_k / 2.0))
    r = hll_rollup(spark, lg_k)
    slack = F.col("exact_users").cast("double") * (sigmas * rse) + 16.0
    ok = (
        F.abs(
            F.col("est_users").cast("double")
            - F.col("exact_users").cast("double")
        )
        <= slack
    )
    return r.select(
        "event_type", "n_days", "exact_users", ok.alias("within_bound")
    )


def kll_quantile_rank_bound(
    spark: SparkSession, k: int = 200, eps: float = 0.033
) -> DataFrame:
    """Rank-error audit for the rows-only KLL quantiles (the
    rel_approx_percentile_bound pattern): the sketch VALUE is
    engine-specific, but KLL's contract is a bounded normalized rank
    error (~1.65% one-sided at k=200; `eps` doubles it for the daily
    merge fan-in). The returned quantile's true rank interval within
    its group must bracket q·n to within eps·n + 1. The fact table
    never shuffles for the audit: the 3-rows-per-type quantile output
    joins back via broadcast."""
    ev = spark.table("events").select("event_type", "value").filter(
        F.col("value").isNotNull()
    )
    qs = [0.5, 0.9, 0.99]
    kq = kll_value_quantiles(spark, k)  # event_type, p50, p90, p99, n
    per_q = kq.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(q)).alias("q"),
                        F.col(c).alias("v"),
                    )
                    for q, c in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]
                ]
            )
        ).alias("z"),
    ).select("event_type", F.col("z.q").alias("q"), F.col("z.v").alias("v"))
    ranks = (
        ev.join(F.broadcast(per_q), "event_type")
        .groupBy("event_type", "q")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((F.col("value") < F.col("v")).cast("long")).alias("rank_lo"),
            F.sum((F.col("value") <= F.col("v")).cast("long")).alias("rank_hi"),
        )
    )
    n = F.col("n_rows").cast("double")
    slack = n * eps + 1.0
    within = (
        (F.col("q") * n - F.col("rank_hi").cast("double") <= slack)
        & (F.col("rank_lo").cast("double") - F.col("q") * n <= slack)
    )
    return ranks.select(
        "event_type", "q", "n_rows", within.alias("within_bound")
    )


def hll_overlap_error_bound(
    spark: SparkSession, lg_k: int = 12, sigmas: float = 4.0
) -> DataFrame:
    """Accuracy-contract audit for the rows-only inclusion-exclusion
    overlap (completes the bound-audit family): |A∩B| ≈ |A|+|B|−|A∪B|
    compounds THREE sketch estimates, so the audited bound is
    sigmas·rse·(|A|+|B|+|A∪B|) + 16 against the exact countDistinct
    intersection — the standard small-intersection-of-large-sets caveat
    made checkable. The exact intersection is one events self-join on
    user_id pre-aggregated to (user, type-set) — never event×event."""
    rse = 1.04 / (2.0 ** (lg_k / 2.0))
    est = hll_audience_overlap(spark, lg_k)
    ev = spark.table("events").select("event_type", "user_id").distinct()
    a = ev.select(F.col("event_type").alias("type_a"), "user_id")
    b = ev.select(F.col("event_type").alias("type_b"), "user_id")
    exact = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    j = est.join(exact, ["type_a", "type_b"], "left").fillna(
        0, subset=["exact_overlap"]
    )
    slack = (
        (
            F.col("est_users_a") + F.col("est_users_b") + F.col("est_union")
        ).cast("double")
        * (sigmas * rse)
        + 16.0
    )
    ok = (
        F.abs(
            F.col("est_overlap").cast("double")
            - F.col("exact_overlap").cast("double")
        )
        <= slack
    )
    return j.select(
        "type_a", "type_b", "exact_overlap", ok.alias("within_bound")
    ).orderBy("type_a", "type_b")
