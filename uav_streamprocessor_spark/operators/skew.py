"""Skew mitigation patterns (SCALE.md): salted two-phase aggregation and
salted replicate joins.

AQE's skew-join splitting (on in session.py) handles storage-level skew at
runtime, but two structural skews need SALTING, which no optimizer can
inject for you:

- low-cardinality aggregation keys: groupBy over a 5-value column puts
  the whole corpus on 5 reducers at any cluster size. Phase 1 aggregates
  on (key, salt) — fanning each hot key over n_salts reducers — phase 2
  merges the tiny partials.
- hot join keys: one key holding a large fraction of a fact table lands
  a single straggler task. The fact side derives a deterministic salt,
  the dim side explodes to every salt value, and the join key becomes
  (key, salt) — the hot key spreads over n_salts tasks at the cost of
  replicating dim rows n_salts×.

Both produce results identical to their unsalted forms (oracle-checked
with plain GROUP BY / JOIN SQL); only the physical distribution differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_two_phase_agg(spark: SparkSession, n_salts: int = 16) -> DataFrame:
    """Per-event-type totals via salted two-phase aggregation. event_type
    has ~5 distinct values — a direct groupBy caps reducer parallelism at
    5 forever; the (key, salt) partial spreads each key over `n_salts`
    reducers and the merge phase touches 5 × n_salts tiny rows.

    Salt derives from event_id (deterministic, uniform), never random —
    replays and retries must salt identically."""
    ev = spark.table("events")
    partial = (
        ev.withColumn("salt", F.col("event_id") % n_salts)
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("v"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("n").alias("n_events"),
        F.round(F.sum("v"), 2).alias("total_value"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    salt_expr,
    n_salts: int = 8,
) -> DataFrame:
    """Generic salted replicate join: `fact` rows carry a deterministic
    salt in [0, n_salts); `dim` rows replicate to all salts; the equi-join
    runs on keys + salt. Result set is exactly the plain join's.

    `salt_expr` must be a deterministic column over fact's columns (e.g.
    a row id modulo n_salts) — random salts break replay/retry."""
    salted_fact = fact.withColumn("_salt", salt_expr % n_salts)
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    return salted_fact.join(salted_dim, [*keys, "_salt"]).drop("_salt")


def salted_priority_revenue(spark: SparkSession, n_salts: int = 8) -> DataFrame:
    """lineitem ⋈ orders with the fact side salted on l_linenumber —
    the demonstration query for `salted_join` (orderkey frequency is
    uniform in the synthetic corpus, but the plan shape is the one a hot
    orderkey needs). Aggregated to priority-level revenue so the result
    is compact and oracle-comparable to the plain join."""
    li = spark.table("lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    orders = spark.table("orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(
        li,
        orders,
        ["l_orderkey"],
        salt_expr=F.col("l_linenumber"),
        n_salts=n_salts,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def join_key_skew_audit(spark: SparkSession) -> DataFrame:
    """Pre-join skew probe — the numbers you read BEFORE deciding
    whether a join needs salting/AQE-splitting: per candidate join key,
    the rows-per-key distribution of the fact side (lineitem) and how
    concentrated it is. Reports for each key column: distinct keys,
    max/avg rows per key (the straggler ratio — a key holding 100× the
    average lands one task with 100× the work), exact p50/p99 of the
    per-key histogram, and the share of rows behind the single hottest
    key. The decision inputs of SCALE.md's salting rules, AS a query.

    Shape at scale: one map-side-combinable count per key column over
    the fact scan (the per-key histogram is |keys| rows, not |rows|),
    then scalar aggs over that histogram — exact percentiles over
    key-count rows, never event rows. Fully relational, DuckDB-oracled."""
    li = spark.table("lineitem")

    def profile(keycol: str):
        hist = li.groupBy(keycol).agg(F.count(F.lit(1)).alias("n"))
        return hist.agg(
            F.lit(keycol).alias("key_column"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n").alias("n_rows"),
            F.max("n").alias("max_per_key"),
            F.round(F.avg("n"), 6).alias("avg_per_key"),
            F.round(F.expr("percentile(n, 0.5)"), 6).alias("p50_per_key"),
            F.round(F.expr("percentile(n, 0.99)"), 6).alias("p99_per_key"),
            F.round(F.max("n") / F.avg("n"), 6).alias("straggler_ratio"),
            F.round(F.max("n") / F.sum("n"), 6).alias("top1_share"),
        )

    out = profile("l_orderkey")
    for c in ("l_partkey", "l_suppkey"):
        out = out.unionByName(profile(c))
    return out.select(
        "key_column",
        "n_keys",
        "n_rows",
        "max_per_key",
        "avg_per_key",
        "p50_per_key",
        "p99_per_key",
        "straggler_ratio",
        "top1_share",
        (F.col("straggler_ratio") > 10.0).alias("needs_salting"),
    ).orderBy("key_column")
