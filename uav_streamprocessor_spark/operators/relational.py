"""Relational core over the star schema (SURVEY.md §2.2: joins, aggs,
rollup/cube, pivot, set ops, windows, string/date/math functions).

The reference has no relational engine (its only aggregation is two driver
counters, uav/main.py:90-91) — this module proves the engine's relational
depth using idiomatic DataFrame plans: broadcast for dims, map-side
partial aggregation, TakeOrderedAndProject for top-k.

Doubles in outputs are rounded (2dp money, 6dp ratios) so cross-engine
oracle hashing is ULP-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)


# --- TPC-H Q1: pricing summary report (adapted to available columns) ---
def q1_pricing_summary(spark: SparkSession) -> DataFrame:
    li = _t(spark, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- TPC-H Q3: shipping priority (3-way join + top-k) ---
def q3_shipping_priority(spark: SparkSession) -> DataFrame:
    cust = _t(spark, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = _t(spark, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-06-01"))
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


# --- TPC-H Q5-style: revenue by nation within a region ---
def q5_local_supplier_volume(spark: SparkSession) -> DataFrame:
    """5-way join; fixed-size dims (region/nation) are hint-broadcast.
    customer/supplier scale with SF, so they carry NO hint — AQE
    size-checks them (still broadcast at test SF, shuffle join at 100 TB
    where a forced broadcast would OOM the executors)."""
    region = _t(spark, "region")
    nation = _t(spark, "nation")
    supplier = _t(spark, "supplier")
    customer = _t(spark, "customer")
    orders = _t(spark, "orders")
    li = _t(spark, "lineitem")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(supplier, li["l_suppkey"] == supplier["s_suppkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
    )


def revenue_by_region(spark: SparkSession) -> DataFrame:
    """Full rollup along region→nation of customer order revenue."""
    nation = _t(spark, "nation")
    region = _t(spark, "region")
    customer = _t(spark, "customer")
    orders = _t(spark, "orders")
    return (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


def top_customers_by_revenue(spark: SparkSession, k: int = 10) -> DataFrame:
    customer = _t(spark, "customer")
    orders = _t(spark, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
             F.count(F.lit(1)).alias("n_orders"))
        .join(customer, F.col("o_custkey") == customer["c_custkey"])
        .orderBy(F.col("revenue").desc(), F.col("o_custkey"))
        .limit(k)
        .select("o_custkey", "c_name", "c_mktsegment", "revenue", "n_orders")
    )


def orders_rollup(spark: SparkSession) -> DataFrame:
    """GROUP BY ROLLUP(status, priority) with grouping-set totals."""
    return (
        _t(spark, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def orders_cube(spark: SparkSession) -> DataFrame:
    return (
        _t(spark, "orders")
        .withColumn("order_year", F.year("o_orderdate"))
        .cube("o_orderstatus", "order_year")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def lineitem_pivot_linestatus(spark: SparkSession) -> DataFrame:
    """Pivot l_linestatus into columns (oracle expresses the same as
    conditional aggregation)."""
    return (
        _t(spark, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnsRenamed({"O": "qty_open", "F": "qty_filled"})
    )


def mktsegment_distinct_stats(spark: SparkSession) -> DataFrame:
    """Exact distinct counts per nation (approx variant is a separate
    rows-only query — sketches aren't cross-engine-stable)."""
    customer = _t(spark, "customer")
    nation = _t(spark, "nation")
    return (
        customer.join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


def approx_distinct_parts(spark: SparkSession) -> DataFrame:
    """HLL++ approximate distinct — rows-only check (sketch results are
    engine-specific by design)."""
    return (
        _t(spark, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
    )


def approx_distinct_error_bound(
    spark: SparkSession, rsd: float = 0.05, sigmas: float = 4.0
) -> DataFrame:
    """Relative-error-bound audit for approx_count_distinct (the same
    contract pattern as approx_percentile_rank_error): HLL++ register
    values are engine-specific, but the sketch's documented accuracy —
    relative standard deviation `rsd` (Spark's default 0.05) — is
    checkable against the exact count in the same pass. The audit
    asserts |approx − exact| ≤ sigmas·rsd·exact + 16 (HLL error is
    deterministic for fixed data — no RNG — so this is a stable bound,
    not a flaky probabilistic one; the absolute slack covers tiny
    groups where the relative form degenerates). The oracle asserts the
    constant-true table with the exact count as the integer anchor."""
    slack = F.col("exact_parts").cast("double") * (sigmas * rsd) + 16.0
    ok = (
        F.abs(
            F.col("approx_parts").cast("double")
            - F.col("exact_parts").cast("double")
        )
        <= slack
    )
    return approx_distinct_parts(spark).select(
        "l_returnflag",
        "exact_parts",
        ok.alias("within_bound"),
    )


def zorder_layout_audit(
    spark: SparkSession, bits: int = 10, n_files: int = 32
) -> DataFrame:
    """Z-order (Morton) vs linear-sort layout quality — the lakehouse
    OPTIMIZE ZORDER decision as a query (storage.zorder_key /
    rewrite_zordered are the rewrite half; this audits WHY). Rows are
    assigned to `n_files` fixed z-range buckets (pure arithmetic — no
    global sort window, so the plan stays shuffle-once) and, for
    comparison, to linear buckets on column a alone; per (layout, file)
    the min/max span of BOTH columns is the zone-map selectivity a scan
    would get. Z-order keeps both spans ~sqrt(cells/files) wide; linear
    sort makes a tight and b useless (~full range) — the audit output
    shows exactly the trade. Morton interleave is built-in bit ops
    (whole-stage codegen, no UDF) and fully oracle-portable."""
    from uav_streamprocessor_spark.storage import zorder_key

    cells = 1 << (2 * bits)  # z range: 4^bits
    side = 1 << bits
    li = _t(spark, "lineitem").select(
        F.col("l_partkey").alias("pa"), F.col("l_suppkey").alias("pb")
    )
    # min-max scale each column to the full bit width first — what real
    # OPTIMIZE ZORDER implementations do: the interleave only balances
    # dimensions of equal bit-width, and raw key ranges are data-
    # dependent (l_suppkey spans ~100 values at sf0.01). One-row agg,
    # broadcast back (the bounded-scalar crossJoin pattern).
    bounds = li.agg(
        F.min("pa").alias("a_lo"), F.max("pa").alias("a_hi"),
        F.min("pb").alias("b_lo"), F.max("pb").alias("b_hi"),
    )
    scaled = li.crossJoin(F.broadcast(bounds)).select(
        F.expr(
            f"CAST(((pa - a_lo) * {side}) DIV (a_hi - a_lo + 1) AS BIGINT)"
        ).alias("a"),
        F.expr(
            f"CAST(((pb - b_lo) * {side}) DIV (b_hi - b_lo + 1) AS BIGINT)"
        ).alias("b"),
    )
    z = scaled.select(
        "a", "b", zorder_key(F.col("a"), F.col("b"), bits).alias("zval")
    ).select(
        "a",
        "b",
        F.expr(f"CAST((zval * {n_files}) DIV {cells} AS INT)").alias("z_file"),
        F.expr(f"CAST((a * {n_files}) DIV {side} AS INT)").alias("lin_file"),
    )

    def spans(file_col: str, name: str) -> DataFrame:
        return (
            z.groupBy(F.col(file_col).alias("file_id"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.max("a") - F.min("a")).alias("a_span"),
                (F.max("b") - F.min("b")).alias("b_span"),
            )
            .withColumn("layout", F.lit(name))
        )

    return spans("z_file", "zorder").unionByName(
        spans("lin_file", "linear")
    ).select("layout", "file_id", "n_rows", "a_span", "b_span")


def zorder_oracle_sql(bits: int = 10, n_files: int = 32) -> str:
    """Generated DuckDB oracle for zorder_layout_audit: the Morton
    interleave as a sum of disjoint powers of two (bit OR of disjoint
    terms == addition, portable as plain arithmetic)."""
    cells = 1 << (2 * bits)
    side = 1 << bits
    morton = " + ".join(
        f"(((a >> {i}) & 1) * {1 << (2 * i + 1)}) + "
        f"(((b >> {i}) & 1) * {1 << (2 * i)})"
        for i in range(bits)
    )
    return f"""
WITH bounds AS (
  SELECT min(l_partkey) AS a_lo, max(l_partkey) AS a_hi,
         min(l_suppkey) AS b_lo, max(l_suppkey) AS b_hi
  FROM lineitem
), pts AS (
  SELECT CAST(((l_partkey - a_lo) * {side}) // (a_hi - a_lo + 1) AS BIGINT) AS a,
         CAST(((l_suppkey - b_lo) * {side}) // (b_hi - b_lo + 1) AS BIGINT) AS b
  FROM lineitem CROSS JOIN bounds
), assig AS (
  SELECT a, b,
         CAST((({morton}) * {n_files}) // {cells} AS INT) AS z_file,
         CAST((a * {n_files}) // {side} AS INT) AS lin_file
  FROM pts
)
SELECT 'zorder' AS layout, z_file AS file_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(max(a) - min(a) AS BIGINT) AS a_span,
       CAST(max(b) - min(b) AS BIGINT) AS b_span
FROM assig GROUP BY z_file
UNION ALL
SELECT 'linear', lin_file, CAST(count(*) AS BIGINT),
       CAST(max(a) - min(a) AS BIGINT), CAST(max(b) - min(b) AS BIGINT)
FROM assig GROUP BY lin_file
"""


def customer_order_rank(spark: SparkSession) -> DataFrame:
    """Window ranking: each customer's 3 largest orders with order-date
    lag — rank/lag/lead over a per-customer window."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, "orders")
        .withColumn("rnk", F.row_number().over(w))
        .withColumn(
            "prev_order_date",
            F.lag(F.col("o_orderdate").cast("date"), 1).over(w),
        )
        .filter(F.col("rnk") <= 3)
        .select(
            "o_custkey", "rnk", "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "prev_order_date",
        )
    )


def customers_1995_and_1996(spark: SparkSession) -> DataFrame:
    """Set op: INTERSECT of customer keys active in both years."""
    orders = _t(spark, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96)


def customers_1995_not_1996(spark: SparkSession) -> DataFrame:
    """Set op: EXCEPT (distinct semantics — subtract)."""
    orders = _t(spark, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.subtract(y96)


def suppliers_without_lineitems(spark: SparkSession) -> DataFrame:
    """Anti join (NOT EXISTS)."""
    supplier = _t(spark, "supplier")
    li = _t(spark, "lineitem").select("l_suppkey")
    return supplier.join(li, supplier["s_suppkey"] == li["l_suppkey"], "left_anti") \
        .select("s_suppkey", "s_name")


def parts_like_filter(spark: SparkSession) -> DataFrame:
    """String functions: LIKE, upper/lower, substring, length, concat.

    Predicates match values that exist in the synthetic corpus (p_type ∈
    {ECONOMY, SMALL, ...}, p_name like 'red widget') so the check runs on
    real rows, not an empty result."""
    part = _t(spark, "part")
    return (
        part.filter(F.col("p_type").like("%ECO%") | F.col("p_name").like("%red%"))
        .select(
            "p_partkey",
            F.upper(F.col("p_brand")).alias("brand_upper"),
            F.substring(F.col("p_type"), 1, 5).alias("type_prefix"),
            F.length(F.col("p_name")).alias("name_len"),
            F.concat_ws("/", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        )
    )


def orders_by_month(spark: SparkSession) -> DataFrame:
    """Date functions: year/month/quarter extraction + date_trunc."""
    return (
        _t(spark, "orders")
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


def math_functions_showcase(spark: SparkSession) -> DataFrame:
    """Math surface: abs, round, floor/ceil, mod, greatest/least, sign,
    sqrt of exact squares (ULP-safe)."""
    li = _t(spark, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


def correlated_exists_orders(spark: SparkSession) -> DataFrame:
    """Customers whose every order exceeds a threshold — anti join against
    the violating set (relational form of a correlated NOT EXISTS)."""
    orders = _t(spark, "orders")
    customer = _t(spark, "customer")
    small = orders.filter(F.col("o_totalprice") < 50000).select("o_custkey").distinct()
    has_orders = orders.select("o_custkey").distinct()
    return (
        customer.join(has_orders, customer["c_custkey"] == has_orders["o_custkey"], "left_semi")
        .join(small, customer["c_custkey"] == small["o_custkey"], "left_anti")
        .select("c_custkey", "c_name")
    )


def customers_above_avg_balance(spark: SparkSession) -> DataFrame:
    """Scalar subquery: balance above the global average (broadcast of a
    1-row aggregate — no correlated re-evaluation)."""
    customer = _t(spark, "customer")
    avg_bal = customer.agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", F.round("c_acctbal", 2).alias("c_acctbal"))
    )


def part_min_price_supplier(spark: SparkSession) -> DataFrame:
    """TPC-H Q2-flavored: per part, the minimum offered price and the
    lowest-keyed supplier offering it (window min + tie-break — the
    relational form of a correlated MIN subquery)."""
    li = _t(spark, "lineitem")
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("l_extendedprice"), F.col("l_suppkey")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_partkey",
            F.round("l_extendedprice", 2).alias("min_price"),
            F.col("l_suppkey").alias("best_suppkey"),
        )
    )


def nations_with_many_customers(spark: SparkSession, min_customers: int = 5) -> DataFrame:
    """GROUP BY + HAVING."""
    customer = _t(spark, "customer")
    nation = _t(spark, "nation")
    return (
        customer.join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"),
             F.round(F.avg("c_acctbal"), 6).alias("avg_balance"))
        .filter(F.col("n_customers") >= min_customers)
    )


def order_price_histogram(spark: SparkSession) -> DataFrame:
    """width_bucket-style CASE bucketing of order totals → histogram."""
    orders = _t(spark, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "lt_50k")
        .when(F.col("o_totalprice") < 100000, "50k_100k")
        .when(F.col("o_totalprice") < 200000, "100k_200k")
        .otherwise("ge_200k")
    )
    return (
        orders.groupBy(bucket.alias("price_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


def q6_forecasting_revenue(spark: SparkSession) -> DataFrame:
    """TPC-H Q6: pure filter+aggregate — the canonical predicate-pushdown
    showcase (every predicate reaches the parquet scan; no shuffle beyond
    the 1-row final agg)."""
    li = _t(spark, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# --- TPC-H Q4 (adapted): order priority checking ---
def q4_order_priority(spark: SparkSession) -> DataFrame:
    """Orders in 1996Q3 with at least one lineitem shipped after the
    order date (EXISTS → left-semi join; the synthetic schema has no
    l_commitdate/l_receiptdate, so shipdate > orderdate stands in for the
    'late lineitem' predicate, TPC-H Q4). Priority histogram."""
    orders = _t(spark, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = _t(spark, "lineitem")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"]),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --- TPC-H Q7 (adapted): volume shipping between two nations ---
def q7_volume_shipping(spark: SparkSession) -> DataFrame:
    """Revenue shipped between NATION_1 and NATION_2 (either direction)
    by (supplier nation, customer nation, ship year). nation is
    hint-broadcast; the SF-scaling supplier/customer sides are left to
    AQE. The big shuffle is lineitem⋈orders plus the final 4-group agg."""
    n1, n2 = "NATION_1", "NATION_2"
    nation = _t(spark, "nation").select("n_nationkey", "n_name")
    supp = (
        _t(spark, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = _t(spark, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = _t(spark, "orders").select("o_orderkey", "o_custkey")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
    )
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(revenue, 2).alias("revenue"))
        .select("supp_nation", "cust_nation", F.col("l_year").cast("int").alias("l_year"), "revenue")
    )


# --- TPC-H Q10 (adapted): returned item reporting ---
def q10_returned_items(spark: SparkSession) -> DataFrame:
    """Top 20 customers by revenue lost to returns (l_returnflag = 'R')
    in a two-quarter window."""
    li = _t(spark, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    cust = _t(spark, "customer")
    nation = _t(spark, "nation")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(revenue, 2).alias("revenue"),
            F.round(F.min("c_acctbal"), 2).alias("c_acctbal"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --- TPC-H Q14: promotion effect ---
def q14_promo_effect(spark: SparkSession) -> DataFrame:
    """Share of monthly revenue from PROMO-type parts: conditional
    aggregation over the part⋈lineitem join (part broadcast)."""
    li = _t(spark, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    part = _t(spark, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy(F.month("l_shipdate").alias("ship_month"))
        .agg(
            F.round(100.0 * promo_rev / F.sum(rev), 6).alias("promo_pct"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
        .select(F.col("ship_month").cast("int").alias("ship_month"), "promo_pct", "total_revenue")
    )


# --- TPC-H Q15: top supplier(s) by period revenue ---
def q15_top_supplier(spark: SparkSession) -> DataFrame:
    """Suppliers whose 1996H1 revenue equals the maximum (the Q15 view +
    scalar-subquery form: revenue agg reused, max via broadcast join)."""
    li = _t(spark, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-07-01"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supp = _t(spark, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- TPC-H Q18: large-volume customers ---
def q18_large_volume_customers(spark: SparkSession) -> DataFrame:
    """Orders whose total quantity exceeds 300 (p99 ≈ 270 in the synthetic
    corpus, so the filter selects a real thin top), with customer info.
    The HAVING subquery is a semi join on the aggregated orderkeys."""
    li = _t(spark, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    orders = _t(spark, "orders")
    cust = _t(spark, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# --- TPC-H Q19 (adapted): discounted revenue, disjunctive predicates ---
def q19_disjunctive_revenue(spark: SparkSession) -> DataFrame:
    """Revenue from three OR-branches over (p_type, p_size, l_quantity) —
    the optimizer must evaluate a disjunction across join columns without
    degrading the equi-join (part scales with SF: no broadcast hint, AQE
    decides)."""
    li = _t(spark, "lineitem")
    part = _t(spark, "part").select("p_partkey", "p_type", "p_size")
    j = li.join(part, li["l_partkey"] == part["p_partkey"])
    cond = (
        ((F.col("p_type") == "SMALL") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 15))
        | ((F.col("p_type") == "MEDIUM") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 25))
        | ((F.col("p_type") == "LARGE") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 35))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --- TPC-H Q22 (adapted): global sales opportunity ---
def q22_sales_opportunity(spark: SparkSession) -> DataFrame:
    """Customers with above-average positive balances and no orders,
    grouped by nation: scalar-subquery threshold (broadcast) + anti join
    + dim join."""
    cust = _t(spark, "customer")
    avg_pos = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    orders = _t(spark, "orders").select("o_custkey")
    nation = _t(spark, "nation")
    return (
        cust.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# --- statistical aggregates: exact percentiles, corr/covar/stddev ---
def order_price_statistics(spark: SparkSession) -> DataFrame:
    """Exact linear-interpolation percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`) plus correlation/covariance/stddev per order
    status. Exact percentile is a sort-based aggregate — at 100 TB use
    percentile_approx (t-digest sketch, rows-only twin below)."""
    return (
        _t(spark, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
            F.round(F.stddev_samp("o_totalprice"), 6).alias("price_stddev"),
            F.round(F.corr("o_totalprice", "o_custkey"), 6).alias("price_cust_corr"),
            F.round(F.covar_samp("o_totalprice", "o_custkey"), 6).alias("price_cust_covar"),
        )
    )


def order_price_approx_percentiles(spark: SparkSession) -> DataFrame:
    """percentile_approx (t-digest): the 100 TB form of the exact twin
    above — sketch results are engine-specific, so rows-only."""
    return (
        _t(spark, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile_approx("o_totalprice", 0.5).alias("approx_median"),
            F.percentile_approx("o_totalprice", 0.9).alias("approx_p90"),
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("exact_median"),
        )
    )


def approx_percentile_rank_error(
    spark: SparkSession, accuracy: int = 1000
) -> DataFrame:
    """Rank-error-bound audit for percentile_approx (VERDICT r10 #5 —
    the oracled shadow for the rows-only sketch twin above). The sketch
    VALUE is engine-specific, but its contract is relational: Spark
    documents percentile_approx's rank error as ≤ n/accuracy, so the
    returned value's true rank interval [rank_lo, rank_hi] within its
    group must bracket q*n to within n/accuracy (+1 for the closed/open
    boundary convention). The query computes the verdict per (group, q)
    from the data; the oracle asserts the bound holds everywhere — a
    sketch regression flips a boolean and breaks the value hash.

    Scale shape: the sketch agg is one pass; the rank audit joins the
    3-rows-per-group sketch output back via broadcast, so the fact table
    never shuffles for the audit."""
    orders = _t(spark, "orders")
    qs = [0.25, 0.5, 0.75]
    apx = orders.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", qs, accuracy).alias("apx"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    qarr = F.array(*[F.lit(float(x)) for x in qs])
    per_q = apx.select(
        "o_orderstatus",
        "n_rows",
        F.explode(
            F.arrays_zip(qarr.alias("q"), F.col("apx").alias("v"))
        ).alias("z"),
    ).select(
        "o_orderstatus", "n_rows",
        F.col("z.q").alias("q"), F.col("z.v").alias("v"),
    )
    ranks = (
        orders.select("o_orderstatus", "o_totalprice")
        .join(F.broadcast(per_q), "o_orderstatus")
        .groupBy("o_orderstatus", "q", "n_rows")
        .agg(
            F.sum((F.col("o_totalprice") < F.col("v")).cast("long")).alias("rank_lo"),
            F.sum((F.col("o_totalprice") <= F.col("v")).cast("long")).alias("rank_hi"),
        )
    )
    n = F.col("n_rows").cast("double")
    slack = n / accuracy + 1.0
    within = (
        (F.col("q") * n - F.col("rank_hi").cast("double") <= slack)
        & (F.col("rank_lo").cast("double") - F.col("q") * n <= slack)
    )
    return ranks.select(
        "o_orderstatus", "q", "n_rows", within.alias("within_bound")
    )


def lineitem_unpivot(spark: SparkSession) -> DataFrame:
    """UNPIVOT (wide → long): the three lineitem rate columns melted to
    (metric, value) rows — Spark's unpivot/melt operator; the oracle
    expresses the same reshape as a UNION ALL."""
    li = _t(spark, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "value",
    ).select(
        "l_orderkey", "l_linenumber", "metric", F.round("value", 2).alias("value")
    )


def orders_grouping_sets(spark: SparkSession) -> DataFrame:
    """Explicit GROUPING SETS — (status), (priority), and grand total,
    i.e. neither rollup nor cube; grouping_id disambiguates the set."""
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# --- TPC-H Q13: customer order-count distribution ---
def q13_customer_distribution(spark: SparkSession) -> DataFrame:
    """Histogram of customers by order count, INCLUDING zero-order
    customers — the left outer join TPC-H uses to catch them, then a
    second aggregation over the first's results."""
    cust = _t(spark, "customer").select("c_custkey")
    orders = _t(spark, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --- TPC-H Q8 (adapted): national market share ---
def q8_market_share(spark: SparkSession) -> DataFrame:
    """NATION_1's share of supplier revenue among customers in NATION_1's
    own region, per ship year. The region key arrives via a broadcast
    one-row scalar join (no driver-side lookup); nation hint-broadcast,
    customer/supplier-derived sides left to AQE (they scale with SF)."""
    nation = _t(spark, "nation").select("n_nationkey", "n_name", "n_regionkey")
    target = nation.filter(F.col("n_name") == "NATION_1").select(
        F.col("n_regionkey").alias("target_rk")
    )
    cust_region = (
        _t(spark, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_regionkey").alias("cust_rk"))
    )
    supp_nation = (
        _t(spark, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = _t(spark, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = _t(spark, "orders").select("o_orderkey", "o_custkey")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust_region, orders["o_custkey"] == F.col("c_custkey"))
        .join(supp_nation, li["l_suppkey"] == F.col("s_suppkey"))
        .crossJoin(F.broadcast(target))
        .filter(F.col("cust_rk") == F.col("target_rk"))
    )
    nat_rev = F.sum(F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(0.0))
    return (
        joined.groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(nat_rev / F.sum(rev), 6).alias("mkt_share"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
        .select(F.col("l_year").cast("int").alias("l_year"), "mkt_share", "total_revenue")
    )


# --- TPC-H Q2 (adapted): minimum-cost supplier per part within a region ---
def q2_min_cost_supplier(spark: SparkSession) -> DataFrame:
    """For each ECONOMY part, the cheapest lineitem unit price offered by
    a supplier in ASIA, and the lowest-keyed supplier offering it — the
    correlated-MIN subquery of TPC-H Q2 as a self-join-free two-phase
    aggregate (min-price agg, join back on (part, price), tie-break by
    min suppkey). lineitem stands in for the absent partsupp; unit price
    = extendedprice/quantity rounded to 2dp BEFORE the min so the
    join-back key is hash-stable. The rounding uses the integer-scaling
    idiom round(x*100)/100 on BOTH engines: plain round(x, 2) decimal-
    rounds the shortest repr in Spark but binary-rounds in DuckDB, and
    at sf0.1 1661 of 600k quotients land exactly on a .xx5 boundary
    where the two disagree (verified: the scaled form diverges on 0)."""
    nation = _t(spark, "nation")
    region = _t(spark, "region").filter(F.col("r_name") == "ASIA")
    supp = (
        _t(spark, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    part = _t(spark, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey", "p_name"
    )
    offers = (
        _t(spark, "lineitem")
        .filter(F.col("l_quantity") > 0)
        .select(
            "l_partkey",
            "l_suppkey",
            (
                F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100, 0)
                / 100
            ).alias("unit_price"),
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
    )
    min_price = offers.groupBy(
        F.col("l_partkey").alias("mp_partkey")
    ).agg(F.min("unit_price").alias("min_unit_price"))
    return (
        offers.join(
            min_price,
            (F.col("l_partkey") == F.col("mp_partkey"))
            & (F.col("unit_price") == F.col("min_unit_price")),
        )
        .groupBy(F.col("l_partkey").alias("p_partkey"), "p_name", "min_unit_price")
        .agg(F.min("s_suppkey").alias("best_suppkey"))
    )


# --- TPC-H Q9 (adapted): product-type profit by nation and year ---
def q9_product_profit(spark: SparkSession) -> DataFrame:
    """Profit on 'red' parts by (supplier nation, order year). The absent
    ps_supplycost is proxied by 10% of p_retailprice per unit — the plan
    shape (part+supplier dims into lineitem⋈orders, 2-key agg) is Q9's."""
    part = _t(spark, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    nation = _t(spark, "nation").select("n_nationkey", "n_name")
    supp = (
        _t(spark, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = _t(spark, "lineitem")
    orders = _t(spark, "orders").select("o_orderkey", "o_orderdate")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * 0.1 * F.col("l_quantity")
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
        .select("nation", F.col("o_year").cast("int").alias("o_year"), "sum_profit")
    )


# --- TPC-H Q11 (adapted): parts holding a significant share of value ---
def q11_important_value_parts(spark: SparkSession) -> DataFrame:
    """Parts whose lineitem value exceeds 1.5x the AVERAGE part value —
    Q11's group-vs-global-scalar HAVING, with the one-row global agg
    broadcast into the filter (no driver action; the global avg re-aggs
    the grouped values, not the base table). Q11's original fixed-share
    cutoff (0.1%) empties under the corpus's uniform value distribution
    at sf >= 0.01 — a 0=0 oracle proves nothing, so the threshold is
    relative (non-vacuous at every test SF: 4/49/514 rows)."""
    li = _t(spark, "lineitem").select(
        "l_partkey", (F.col("l_extendedprice") * F.col("l_quantity")).alias("val")
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("val").alias("part_value"))
    avg_val = per_part.agg(F.avg("part_value").alias("avg_value"))
    return (
        per_part.crossJoin(F.broadcast(avg_val))
        .filter(F.col("part_value") > F.col("avg_value") * 1.5)
        .select("l_partkey", F.round("part_value", 2).alias("part_value"))
    )


# --- TPC-H Q16 (adapted): supplier counts by part attributes ---
def q16_part_supplier_counts(spark: SparkSession) -> DataFrame:
    """Distinct suppliers able to supply each (brand, type, size) combo,
    excluding Brand#13, PROMO parts, and suppliers in arrears (negative
    acctbal — the 'complaints' NOT IN of Q16 as an anti join)."""
    part = _t(spark, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    bad_supp = _t(spark, "supplier").filter(F.col("s_acctbal") < 0.0).select(
        "s_suppkey"
    )
    li = _t(spark, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(bad_supp, li["l_suppkey"] == bad_supp["s_suppkey"], "left_anti")
        .join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- TPC-H Q17 (adapted): small-quantity-order revenue ---
def q17_small_quantity_revenue(spark: SparkSession) -> DataFrame:
    """Average yearly revenue lost if small orders (quantity < 50% of the
    part's average) were not filled — Q17's correlated per-part AVG as a
    grouped agg joined back into lineitem (never a per-row subquery)."""
    li = _t(spark, "lineitem")
    part = _t(spark, "part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    avg_qty = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_orders"),
        )
    )


# --- TPC-H Q21 (adapted): suppliers who kept multi-supplier orders waiting ---
def q21_waiting_suppliers(spark: SparkSession, k: int = 20) -> DataFrame:
    """Suppliers that were the SOLE late shipper (shipdate > 60 days
    after the order date) on an order involving >= 2 suppliers — Q21's
    double-EXISTS/NOT-EXISTS expressed as per-order DISTINCT-supplier
    counts computed as collect_set WINDOWS over the order partition:
    the lineitem⋈orders join already hash-partitions on the order key,
    the windows reuse that partitioning (zero extra shuffle — countDistinct
    isn't window-legal but size(collect_set) is, and set size is bounded
    by suppliers-per-order, single digits in TPC-H data). The earlier
    agg-and-join-back form scanned lineitem twice and shuffled four
    times; this is one orderkey shuffle + one suppkey shuffle."""
    li = _t(spark, "lineitem")
    orders = _t(spark, "orders").select("o_orderkey", "o_orderdate")
    lo = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).withColumn(
        "is_late", F.datediff("l_shipdate", "o_orderdate") > 60
    )
    w = Window.partitionBy("l_orderkey")
    counted = lo.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(
                F.when(F.col("is_late"), F.col("l_suppkey"))
            ).over(w)
        ).alias("n_late_supp"),
    )
    blamed = counted.filter(
        F.col("is_late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    supp = _t(spark, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(k)
    )


def order_window_navigation(spark: SparkSession) -> DataFrame:
    """Window-navigation surface in one pass over per-customer windows:
    ntile quartiles, percent_rank, cume_dist, first_value, nth_value —
    all over a UNIQUE sort key (totalprice, orderkey) so peer-group
    semantics can't diverge between engines. One shuffle on o_custkey;
    every window shares the partitioning."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        _t(spark, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.ntile(4).over(w).alias("price_quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.first("o_orderkey").over(w).alias("biggest_orderkey"),
            F.nth_value("o_orderkey", 2).over(w_full).alias("second_orderkey"),
        )
    )


# --- TPC-H Q12 (adapted): shipping modes and order priority ---
def q12_shipping_priority(spark: SparkSession) -> DataFrame:
    """Q12's shape — lineitem⋈orders, conditional priority counts per
    shipping class — adapted to the corpus: l_linestatus stands in for
    the absent l_shipmode, and "slow shipping" (shipdate > 30 days after
    the order date) stands in for the commit/receipt-date lateness
    predicate (those columns don't exist here). One fact-fact shuffle on
    orderkey; the agg is two-level map-side-combinable conditional
    counts. Completes the 22-query TPC-H adaptation set."""
    li = _t(spark, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = _t(spark, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    slow = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).filter(
        F.datediff("l_shipdate", "o_orderdate") > 30
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        slow.groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# --- TPC-H Q20 (adapted): dominant suppliers of small parts ---
def q20_excess_suppliers(spark: SparkSession) -> DataFrame:
    """Q20's nested-subquery shape — suppliers holding "excess" stock of
    parts matching a name prefix — adapted to the corpus: lineitem
    stands in for the absent partsupp, and a supplier is "dominant" for
    a part when its shipped quantity exceeds 2× the fair share
    (part_qty / n_suppliers) — the original's fixed 0.5*sum cutoff
    returns zero rows at every SF on this corpus's uniform quantity
    distribution (max observed share ≈ 23%), which would recreate the
    0=0 vacuous-oracle problem; the relative form returns 7/99/857
    suppliers at sf 0.001/0.01/0.1 (same treatment as q11).
    Agg-inside-agg: per-(part,supplier) totals, per-part totals, join
    on partkey, then a distinct-supplier semi-join back to supplier.
    Two shuffles on partkey, one on suppkey; `part` carries no
    broadcast hint (it scales with SF — AQE decides)."""
    small_parts = (
        _t(spark, "part")
        .filter(F.col("p_name").startswith("small "))
        .select("p_partkey")
    )
    shipped = (
        _t(spark, "lineitem")
        .join(small_parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    part_totals = shipped.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("supp_qty").alias("part_qty"),
        F.count(F.lit(1)).alias("n_supp"),
    )
    dominant = shipped.join(
        part_totals, F.col("l_partkey") == F.col("pt_partkey")
    ).filter(
        F.col("supp_qty") > F.lit(2.0) * F.col("part_qty") / F.col("n_supp")
    )
    supp = _t(spark, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    return (
        supp.join(
            dominant.select("l_suppkey").distinct(),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name", "s_nationkey")
        .orderBy("s_suppkey")
    )


# --- recursive CTE (Spark 4): calendar-spine gap fill ---
def monthly_revenue_spine(spark: SparkSession) -> DataFrame:
    """Month spine via WITH RECURSIVE (Spark 4) + left join: the
    gap-filling reporting staple — months with zero orders still get a
    row. Spark's recursive CTEs are UNION ALL-only (no distinct-union),
    which is exactly right for a strictly-increasing generator like this
    spine; cyclic closures (connected components) can't terminate under
    UNION ALL and stay imperative in operators/graph.py. The spine is
    O(months) rows on the driver side of the join — broadcast by AQE —
    and the orders side aggregates map-side after date_trunc.

    The stop bound rides ALONG the recursion as a carried column: a
    scalar subquery in the step's WHERE re-evaluates per iteration
    (~80 full orders rescans — measured 11s warm at sf0.1; carrying
    the bound drops it to the one anchor scan, ~0.5s)."""
    return spark.sql(
        """
        WITH RECURSIVE spine(month_start, hi) AS (
          SELECT to_date(date_trunc('month', min(o_orderdate))),
                 to_date(date_trunc('month', max(o_orderdate)))
          FROM orders
          UNION ALL
          SELECT add_months(month_start, 1), hi FROM spine
          WHERE month_start < hi
        )
        SELECT s.month_start,
               CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
               round(coalesce(sum(o.o_totalprice), 0.0), 2) AS revenue
        FROM spine s
        LEFT JOIN orders o
          ON to_date(date_trunc('month', o.o_orderdate)) = s.month_start
        GROUP BY s.month_start
        ORDER BY s.month_start
        """
    )


def merge_upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Generic MERGE (upsert): rows in `updates` override same-key rows in
    `base`; keys only in `updates` are inserts; everything else passes
    through. Expressed as a full-outer join + per-column coalesce — the
    shape Catalyst plans as one shuffle on the key (or a broadcast when
    the update batch is small, the common CDC case; AQE decides).

    Scale: the canonical snapshot-maintenance pattern for a training-data
    corpus — daily delta merged into the base without rewriting unmatched
    partitions' semantics. Column set = base's; updates must share it."""
    cols = base.columns
    b, u = base.alias("b"), updates.alias("u")
    joined = b.join(u, F.col(f"b.{key}").eqNullSafe(F.col(f"u.{key}")), "full_outer")
    return joined.select(
        *[F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c) for c in cols]
    )


def merge_upsert_summary(spark: SparkSession) -> DataFrame:
    """Registered surface: merge a deterministic update batch (every 10th
    order re-priced + restatused, every 100th key re-inserted above the
    key range) into `orders`, then summarize by status so the full merged
    result is value-checked compactly."""
    orders = spark.table("orders")
    base = orders.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            F.col("o_orderkey").alias("key"),
            F.lit("U").alias("status"),
            (F.col("o_totalprice") + 100.0).alias("price"),
        )
        .unionAll(
            orders.filter(F.col("o_orderkey") % 100 == 0).select(
                (F.col("o_orderkey") + 30000000).alias("key"),
                F.lit("N").alias("status"),
                F.lit(1000.0).alias("price"),
            )
        )
    )
    merged = merge_upsert(base, updates, "key")
    return (
        merged.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("price"), 2).alias("total_price"),
        )
        .orderBy("status")
    )


def scd2_order_priority_history(spark: SparkSession) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an append-only change
    log: each customer's orders, ordered by (o_orderdate, o_orderkey),
    are successive observations of o_orderpriority. Runs of equal values
    collapse to one row; each surviving row gets an
    [effective_from, effective_to) validity range (lead of the next
    change's date; NULL = open) and an is_current flag — the standard
    lakehouse dimension-history pattern.

    Plan: two stacked windows over the SAME partitioning
    (o_custkey) — Catalyst reuses one shuffle + sort for both the lag
    (change detection) and the lead (range close); no global window
    anywhere."""
    orders = spark.table("orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = orders.select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        "o_orderpriority",
        F.lag("o_orderpriority").over(w).alias("prev_p"),
    ).filter(
        F.col("prev_p").isNull() | (F.col("prev_p") != F.col("o_orderpriority"))
    )
    nxt = F.lead("o_orderdate").over(w)
    return changes.select(
        "o_custkey",
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("effective_from"),
        nxt.alias("effective_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


def price_decile_stats(spark: SparkSession) -> DataFrame:
    """Feature binning via ntile: per order-priority DECILES of
    o_totalprice (deterministic tie-break on o_orderkey), then per-bucket
    count/min/max/sum. Partitioned ntile — the global-ORDER BY form is a
    single-partition sort and is exactly what the plan-audit gate
    forbids; binning within a natural partition key is the scale shape
    (per-source quality-score deciles in a corpus pipeline)."""
    orders = spark.table("orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            "o_orderpriority",
            "o_totalprice",
            F.ntile(10).over(w).alias("decile"),
        )
        .groupBy("o_orderpriority", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


def referential_audit(spark: SparkSession) -> DataFrame:
    """Referential-integrity audit across the corpus relationships a
    pipeline depends on: orphan counts per link (child rows whose parent
    key is absent), as (relationship, n_child, n_orphans). Anti-joins
    only — each link is one narrow-key shuffle (or broadcast when the
    parent side is a dim); no row bodies move."""
    def link(child: DataFrame, parent: DataFrame, key_c: str, key_p: str, name: str):
        c = child.select(F.col(key_c).alias("k"))
        p = parent.select(F.col(key_p).alias("k")).distinct() \
            .withColumn("hit", F.lit(1))
        # one left join, one pass: total + orphans together (NO driver
        # action in plan construction — count() here would collect)
        return (
            c.join(p, "k", "left")
            .agg(
                F.count(F.lit(1)).alias("n_child"),
                F.sum(F.col("hit").isNull().cast("long")).alias("n_orphans"),
            )
            .select(F.lit(name).alias("relationship"), "n_child", "n_orphans")
        )

    orders = spark.table("orders")
    customer = spark.table("customer")
    lineitem = spark.table("lineitem")
    nation = spark.table("nation")
    supplier = spark.table("supplier")
    return (
        link(orders, customer, "o_custkey", "c_custkey", "orders->customer")
        .unionAll(link(lineitem, orders, "l_orderkey", "o_orderkey", "lineitem->orders"))
        .unionAll(link(customer, nation, "c_nationkey", "n_nationkey", "customer->nation"))
        .unionAll(link(supplier, nation, "s_nationkey", "n_nationkey", "supplier->nation"))
    )


def table_profile(spark: SparkSession) -> DataFrame:
    """Column-profiling audit over `orders` — the schema-drift /
    data-quality report a pipeline snapshots per ingest: per column,
    null count, distinct count, and lexicographic min/max rendered as
    strings so one narrow schema covers every type. One pass, all
    aggregates map-side combinable."""
    orders = spark.table("orders")

    def prof(col: str):
        c = F.col(col)
        return orders.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(c.isNull().cast("long")).alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).cast("string").alias("min_value"),
            F.max(c).cast("string").alias("max_value"),
        ).select(F.lit(col).alias("column_name"), "n_rows", "n_nulls",
                 "n_distinct", "min_value", "max_value")

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    out = prof(cols[0])
    for c in cols[1:]:
        out = out.unionAll(prof(c))
    return out


def k_anonymity_audit(spark: SparkSession, k: int = 5) -> DataFrame:
    """k-anonymity audit over the (nation, market-segment) quasi-
    identifier pair: equivalence-class sizes, how many classes fall
    below k, and the population exposed — the re-identification-risk
    snapshot a release pipeline runs next to PII redaction. One
    groupBy + one tiny agg; nothing wide moves."""
    customer = spark.table("customer")
    classes = customer.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("class_size")
    )
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum((F.col("class_size") < k).cast("long")).alias("n_below_k"),
        F.sum(
            F.when(F.col("class_size") < k, F.col("class_size")).otherwise(0)
        ).alias("rows_exposed"),
        F.min("class_size").alias("min_class_size"),
    )


def scd2_snapshot(spark: SparkSession, as_of: str = "1997-06-01") -> DataFrame:
    """Point-in-time dimension reconstruction over the SCD2 history:
    the priority version of every customer AS OF `as_of` — the temporal
    query the [effective_from, effective_to) ranges exist to answer
    (time-travel joins, backtesting, training-data snapshot cuts).

    Semantics: half-open validity — a version applies when
    effective_from <= as_of < effective_to (NULL effective_to = open).
    Exactly one row per customer with any history on/before the date.

    Plan: the history build's two stacked windows (one o_custkey
    shuffle, reused) + a codegen'd range filter — the filter prunes to
    <= 1 row per customer, no further shuffle. At 100 TB the history
    table would be materialized once (storage.write_bucketed on the
    dimension key) and snapshot reads become a bucket-pruned scan."""
    snap = F.lit(as_of).cast("date")
    hist = scd2_order_priority_history(spark)
    return hist.filter(
        (F.col("effective_from") <= snap)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > snap))
    ).select("o_custkey", "priority", "effective_from", "effective_to")


def l_diversity_audit(spark: SparkSession, l_threshold: int = 3) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., ICDE'06) — the
    homogeneity-attack check k-anonymity misses: a class can hold >= k
    rows yet leak the sensitive attribute if every row shares one
    value. Quasi-identifier: c_nationkey; sensitive: c_mktsegment.
    Per class: distinct-l (distinct sensitive values), entropy-l
    (exp of Shannon entropy of the in-class sensitive distribution —
    the effective number of values), and the below-threshold flag.

    One (QI, sensitive) count agg + one QI-level rollup; entropy folds
    from the value counts relationally (sum p*ln p), so the audit is
    two map-side-combined shuffles at any scale — same posture as the
    k-anonymity audit it extends."""
    customer = spark.table("customer")
    counts = customer.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    # p computed against the class total via a window over the VALUE-COUNT
    # table (|QI| x |sensitive| rows — tiny at any corpus scale)
    p = F.col("n") / F.sum("n").over(Window.partitionBy("c_nationkey"))
    per_class = (
        counts.withColumn("p", p)
        .groupBy("c_nationkey")
        .agg(
            F.sum("n").alias("class_size"),
            F.count(F.lit(1)).alias("distinct_l"),
            (-F.sum(F.col("p") * F.log("p"))).alias("_h"),
        )
    )
    return per_class.select(
        "c_nationkey",
        "class_size",
        "distinct_l",
        F.round(F.exp("_h"), 6).alias("entropy_l"),
        (F.col("distinct_l") < l_threshold).alias("below_l"),
    ).orderBy("c_nationkey")


def benford_audit(spark: SparkSession) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    fabricated-numbers forensic (organic multiplicative amounts follow
    P(d) = log10(1 + 1/d); uniform or hand-entered values don't). Per
    leading digit: observed count/share, expected share, and the
    chi-square contribution; the total chi-square is the fraud-screen
    statistic.

    Leading digit extraction is string arithmetic on the absolute
    value (portable, no float-log edge cases); one 9-key groupBy with
    map-side combine — nothing wide moves at any scale."""
    orders = spark.table("orders")
    # strip zeros and the dot per-character ([0.] — no zero-width regex,
    # which Java and RE2 handle differently), then the first remaining
    # char is the leading significant digit
    digit = F.substring(
        F.regexp_replace(F.abs(F.col("o_totalprice")).cast("string"), "[0.]", ""),
        1,
        1,
    ).cast("int")
    by_digit = (
        orders.select(digit.alias("digit"))
        .filter(F.col("digit").between(1, 9))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    # denominator as a broadcast scalar agg — no driver action at build
    n_total = by_digit.agg(F.sum("n_orders").cast("double").alias("n_total"))
    expected = F.log10(1.0 + 1.0 / F.col("digit"))
    obs_share = F.col("n_orders") / F.col("n_total")
    chi2 = F.pow(obs_share - expected, 2) / expected * F.col("n_total")
    return (
        by_digit.crossJoin(F.broadcast(n_total))
        .select(
            "digit",
            "n_orders",
            F.round(obs_share, 6).alias("observed_share"),
            F.round(expected, 6).alias("benford_share"),
            F.round(chi2, 6).alias("chi2_term"),
        )
        .orderBy("digit")
    )


def snapshot_diff(spark: SparkSession) -> DataFrame:
    """Dataset-release diff: classify every key across two table
    versions as unchanged / updated / deleted / inserted, with value
    deltas per class — what a corpus release pipeline publishes next to
    each new snapshot (and the audit that catches a bad upstream merge
    before training sees it). v2 derives deterministically from
    `orders` with the same mutation pattern merge_upsert uses (every
    10th key re-priced +100 and re-statused, every 100th key a fresh
    insert above the key range) plus every 7th-mod-1000 key DELETED.

    Plan shape: one full-outer join on the key — the single shuffle —
    then the per-key class falls out of null-side tests and a value
    comparison; the readout aggregates to 4 rows with map-side combine.
    At 100 TB both snapshot scans prune to the compared columns, and
    bucketed-by-key storage (storage.write_bucketed) makes the diff
    join shuffle-free."""
    orders = spark.table("orders")
    v1 = orders.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    v2 = (
        v1.filter(F.col("key") % 1000 != 7)  # deletions
        .select(
            "key",
            F.when(F.col("key") % 10 == 0, F.lit("U")).otherwise(F.col("status")).alias("status"),
            F.when(F.col("key") % 10 == 0, F.col("price") + 100.0).otherwise(F.col("price")).alias("price"),
        )
        .unionAll(
            v1.filter(F.col("key") % 100 == 0).select(
                (F.col("key") + 30000000).alias("key"),
                F.lit("N").alias("status"),
                F.lit(1000.0).alias("price"),
            )
        )
    )
    a, b = v1.alias("a"), v2.alias("b")
    joined = a.join(b, F.col("a.key") == F.col("b.key"), "full_outer")
    cls = (
        F.when(F.col("b.key").isNull(), "deleted")
        .when(F.col("a.key").isNull(), "inserted")
        .when(
            (F.col("a.status") == F.col("b.status"))
            & (F.col("a.price") == F.col("b.price")),
            "unchanged",
        )
        .otherwise("updated")
    )
    return (
        joined.select(
            cls.alias("change"),
            F.coalesce(F.col("b.price"), F.lit(0.0)).alias("new_price"),
            F.coalesce(F.col("a.price"), F.lit(0.0)).alias("old_price"),
        )
        .groupBy("change")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.round(F.sum(F.col("new_price") - F.col("old_price")), 2).alias(
                "price_delta"
            ),
        )
        .orderBy("change")
    )


def revenue_gini(spark: SparkSession) -> DataFrame:
    """Gini coefficient of customer revenue per market segment — the
    standard inequality / concentration audit (is a segment's revenue
    spread evenly or carried by a few whales?).

    Closed form over ascending ranks: G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n
    with x sorted ascending. Ranks are per-SEGMENT windows (a handful of
    balanced partitions, each sorted distributedly within its task — not
    a global sort); ties broken on custkey so both engines rank
    identically. Customers without orders are excluded (revenue joins
    from orders); segment revenue rounded 2dp, gini 6dp."""
    rev = (
        _t(spark, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("revenue"))
        .join(
            F.broadcast(
                _t(spark, "customer").select("c_custkey", "c_mktsegment")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy("revenue", "o_custkey")
    ranked = rev.withColumn("rnk", F.row_number().over(w))
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum("revenue"), 2).alias("total_revenue"),
            F.round(
                2.0
                * F.sum(F.col("rnk") * F.col("revenue"))
                / (F.count(F.lit(1)) * F.sum("revenue"))
                - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
                6,
            ).alias("gini"),
        )
        .orderBy("c_mktsegment")
    )


def abc_classification(spark: SparkSession) -> DataFrame:
    """ABC / Pareto classification of customers by revenue within each
    market segment: class A = customers covering the first 80% of
    segment revenue (by descending-revenue cumulative share), B to 95%,
    C the tail. The classic inventory/CRM curation split.

    The cumulative share is a per-segment window (descending revenue,
    custkey tie-break) — segments bound the sort. At 100 TB, replace the
    exact per-segment cumsum with revenue-quantile bucketing
    (approx_percentile on revenue, then a broadcast threshold join);
    the exact window form here is the oracle-checkable reference
    semantics. A customer's class uses the cumulative share INCLUDING
    its own revenue, so the first customer of a segment is always A."""
    rev = (
        _t(spark, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("revenue"))
        .join(
            F.broadcast(
                _t(spark, "customer").select("c_custkey", "c_mktsegment")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("revenue").desc(), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg_total = Window.partitionBy("c_mktsegment")
    share = F.sum("revenue").over(w) / F.sum("revenue").over(seg_total)
    cls = (
        F.when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C")
    )
    classed = rev.withColumn("abc_class", cls).withColumn("cum_share", share)
    return (
        classed.groupBy("c_mktsegment", "abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum("revenue"), 2).alias("class_revenue"),
        )
        .withColumn(
            "revenue_share",
            F.round(
                F.col("class_revenue")
                / F.sum("class_revenue").over(Window.partitionBy("c_mktsegment")),
                6,
            ),
        )
        .orderBy("c_mktsegment", "abc_class")
    )


def cohort_repurchase_matrix(spark: SparkSession) -> DataFrame:
    """Classic cohort retention over ORDERS: customers grouped by the
    month of their first order; for each offset k, the fraction of the
    cohort that ordered again k months later. The lifetime-value /
    repurchase readout — ev_retention_cohorts' twin on the relational
    star schema (cohorts in both proves the pattern is schema-agnostic).

    Month index = year*12 + (month−1) — exact integer arithmetic
    identical in both engines (never month diffs via intervals; the
    zero-based month keeps December inside its own year when the index
    is split back). Two shuffles: first-order month per customer
    (map-side combinable min), then the (cohort, offset) distinct-count
    rollup; cohort sizes broadcast back for the rate."""
    o = _t(spark, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("m_idx"),
    )
    firsts = o.groupBy("o_custkey").agg(F.min("m_idx").alias("cohort_m"))
    activity = (
        o.join(firsts, "o_custkey")
        .select(
            "o_custkey",
            "cohort_m",
            (F.col("m_idx") - F.col("cohort_m")).alias("offset_m"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_m").agg(
        F.countDistinct("o_custkey").alias("cohort_size")
    )
    return (
        activity.groupBy("cohort_m", "offset_m")
        .agg(F.countDistinct("o_custkey").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_m")
        .select(
            F.floor(F.col("cohort_m") / 12).cast("int").alias("cohort_year"),
            (F.col("cohort_m") % 12 + 1).cast("int").alias("cohort_month"),
            F.col("offset_m").cast("int").alias("offset_m"),
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort_year", "cohort_month", "offset_m")
    )


def incremental_daily_revenue(spark: SparkSession) -> DataFrame:
    """Incremental aggregate maintenance (IVM): the daily revenue rollup
    computed the way a warehouse REFRESHES it — a maintained base
    aggregate (all days before the newest) merged with the newest day's
    delta via partial-aggregate union — rather than recomputed from
    scratch. The oracle IS the from-scratch aggregate, so the value
    hash proves merge-maintenance ≡ recompute, the IVM correctness
    property, not just this query's output.

    count/sum are the mergeable forms (avg re-derives as sum/count at
    read time — never merge averages). At scale the base aggregate is a
    stored table and only the delta partition scans; here both derive
    from the corpus with the split on max(o_orderdate), broadcast as a
    scalar."""
    o = _t(spark, "orders").select(
        F.to_date("o_orderdate").alias("day"), "o_totalprice"
    )
    mx = o.agg(F.max("day").alias("max_day"))
    tagged = o.crossJoin(F.broadcast(mx))
    base = (
        tagged.filter(F.col("day") < F.col("max_day"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("revenue"),
        )
    )
    delta = (
        tagged.filter(F.col("day") == F.col("max_day"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("revenue"),
        )
    )
    merged = (
        base.unionByName(delta)
        .groupBy("day")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.round(F.sum("revenue"), 2).alias("revenue"),
        )
        .withColumn(
            # integer-scaled rounding (the detection_labels idiom):
            # Spark's round(x, 6) HALF_UPs a decimal string while DuckDB
            # rounds the binary value — they disagree on exact .xxxxxx5
            # doubles (first seen at sf0.1: 16958984.06/64 lands on one);
            # round(x*1e6)/1e6 sees the same IEEE product in both engines
            "avg_order",
            F.round(F.col("revenue") / F.col("n_orders") * 1000000) / 1000000,
        )
    )
    return merged.orderBy("day")


def t_closeness_audit(spark: SparkSession, t_threshold: float = 0.2) -> DataFrame:
    """t-closeness audit (Li et al., ICDE'07) — completes the
    k-anonymity → l-diversity → t-closeness triad: a class can be
    diverse yet still leak when its sensitive-attribute DISTRIBUTION
    differs sharply from the population's (the skewness attack).
    Quasi-identifier: c_nationkey; sensitive: c_acctbal bucketed by
    global deciles. For an ordered attribute the right distance is
    Earth Mover's, which over m ordered equal-probability buckets
    reduces (Li et al.'s ordered-distance definition) to
    Σ|cumulative difference| / (m − 1) — divide by 9 here, not 10: the
    last bucket's cumulative difference is identically 0 (both
    distributions sum to 1), so a mean over all m buckets would scale
    t by (m−1)/m and make the 0.2 threshold incomparable to literature
    t values. Exactly computable relationally.

    Shapes (same posture as the sibling audits): decile breakpoints are
    ONE exact-percentile scalar aggregate broadcast back as literals
    (the score_normalization pattern — no global window anywhere);
    the (class × bucket) grid is |QI| × 10 rows built from the class
    list crossed with a literal bucket spine, so zero-count buckets
    participate in the cumulative; the EMD folds over a 10-row window
    per class."""
    customer = spark.table("customer").select("c_nationkey", "c_acctbal")
    qs = [i / 10.0 for i in range(1, 10)]
    breaks = customer.agg(
        *[
            F.percentile("c_acctbal", F.lit(q)).alias(f"p{int(q * 10)}")
            for q in qs
        ]
    )
    bucket = sum(
        (F.col("c_acctbal") > F.col(f"p{i}")).cast("int") for i in range(1, 10)
    )
    bucketed = customer.crossJoin(F.broadcast(breaks)).select(
        "c_nationkey", bucket.alias("bucket")
    )
    global_counts = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("g_n")
    )
    class_counts = bucketed.groupBy("c_nationkey", "bucket").agg(
        F.count(F.lit(1)).alias("c_n")
    )
    classes = bucketed.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("class_size")
    )
    spine = spark.range(10).select(F.col("id").cast("int").alias("bucket"))
    total = global_counts.agg(
        F.sum("g_n").cast("double").alias("n_total")
    )
    grid = (
        classes.crossJoin(F.broadcast(spine))
        .join(class_counts, ["c_nationkey", "bucket"], "left")
        .join(F.broadcast(global_counts), "bucket", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "c_nationkey",
            "class_size",
            "bucket",
            (F.coalesce("c_n", F.lit(0)) / F.col("class_size")).alias("c_p"),
            (F.coalesce("g_n", F.lit(0)) / F.col("n_total")).alias("g_p"),
        )
    )
    cum = Window.partitionBy("c_nationkey").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    emd = (
        F.sum(F.abs(F.sum("c_p").over(cum) - F.sum("g_p").over(cum))).over(
            Window.partitionBy("c_nationkey")
        )
        / F.lit(9.0)
    )
    return (
        grid.withColumn("emd", emd)
        .groupBy("c_nationkey")
        .agg(
            F.max("class_size").cast("long").alias("class_size"),
            F.round(F.max("emd"), 6).alias("t_emd"),
        )
        .withColumn("t_flag", F.col("t_emd") > t_threshold)
        .orderBy("c_nationkey")
    )


def rfm_segmentation(spark: SparkSession) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic CRM grid: each customer scored 1-5 per dimension against
    exact population quintile breakpoints, then counted per (R, F, M)
    cell with the conventional names for the corner cells. Recency
    scores INVERT (recently active = 5).

    Breakpoints are one exact-percentile scalar aggregate broadcast
    back (the score_normalization pattern — no global window); the
    per-customer pass is one orders rollup; the grid aggregate is at
    most 125 rows. Boundary rule: score = 1 + Σ(v > p_k) — ties go to
    the lower score in both engines identically."""
    o = _t(spark, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("day"),
        "o_totalprice",
    )
    mx = o.agg(F.max("day").alias("max_day"))
    per_cust = (
        o.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.min(F.datediff("max_day", F.col("day"))).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("o_totalprice").alias("monetary"),
        )
    )
    qs = [0.2, 0.4, 0.6, 0.8]
    bp = per_cust.agg(
        *[F.percentile("recency_days", F.lit(q)).alias(f"r{int(q*100)}") for q in qs],
        *[F.percentile("frequency", F.lit(q)).alias(f"f{int(q*100)}") for q in qs],
        *[F.percentile("monetary", F.lit(q)).alias(f"m{int(q*100)}") for q in qs],
    )
    def score(col, prefix):
        s = F.lit(1)
        for q in qs:
            s = s + (F.col(col) > F.col(f"{prefix}{int(q*100)}")).cast("int")
        return s

    scored = per_cust.crossJoin(F.broadcast(bp)).select(
        "o_custkey",
        (F.lit(6) - score("recency_days", "r")).alias("r_score"),
        score("frequency", "f").alias("f_score"),
        score("monetary", "m").alias("m_score"),
    )
    name = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4), "champions")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), "at_risk_loyal")
        .when((F.col("r_score") >= 4) & (F.col("f_score") <= 2), "new_or_returning")
        .when((F.col("r_score") <= 2) & (F.col("f_score") <= 2) & (F.col("m_score") <= 2), "hibernating")
        .otherwise("core")
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .withColumn("segment", name)
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# small-file compaction planning (round 7)
# ---------------------------------------------------------------------------


def compaction_plan(spark: SparkSession, target_bytes: int = 4000) -> DataFrame:
    """Small-file compaction planner — the lakehouse maintenance op that
    turns N tiny files into ceil(bytes/target) right-sized ones. Files
    are modeled by the documents table (doc_id = file, n_chars = bytes,
    source = table partition); assignment is NEXT-FIT by fixed byte
    boundaries: bin = floor(cumulative_bytes_before / target) within
    each partition, in deterministic file order.

    One partition-keyed window (running sum) + a partial-agg rollup; a
    partition's plan never looks at another partition — embarrassingly
    parallel at 100 TB, which is why real compactors (Delta OPTIMIZE,
    Iceberg rewrite_data_files) shard exactly this way. Output is the
    per-output-file manifest: how many inputs, total bytes, fill ratio
    vs target (the tail bin of each partition underfills — that residue
    is the compaction win)."""
    files = spark.table("documents").select("doc_id", "source", "n_chars")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = files.withColumn(
        "bin_id",
        F.floor((F.sum("n_chars").over(w) - F.col("n_chars")) / target_bytes)
        .cast("int"),
    )
    return (
        binned.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("n_chars").cast("long").alias("total_bytes"),
            F.round(F.sum("n_chars") / F.lit(float(target_bytes)), 6).alias(
                "fill_ratio"
            ),
        )
        .orderBy("source", "bin_id")
    )


def zone_map_pruning_audit(spark: SparkSession) -> DataFrame:
    """Zone-map / data-skipping effectiveness audit: lineitem is zoned
    by ship-month (the proxy for parquet files laid down by an
    ingest-time-partitioned writer), per-zone min/max statistics are
    collected exactly as a lakehouse manifest would store them, and
    three representative predicates are evaluated against the STATS
    ALONE to count how many zones a scan could skip.

    The audit answers the 100 TB question before the cluster does:
    a predicate on the clustering column (ship year) prunes almost
    everything; predicates on columns uniform within every zone
    (quantity, discount) prune nothing — the signal that those
    workloads need sort/Z-ordering, not more partitions, and exactly
    what Spark's own partition pruning + parquet row-group skipping
    would achieve on this layout.

    One map-side-combinable aggregate over lineitem (the stats pass),
    then arithmetic over the ~80-row zone table via stack() — the
    audit itself never rescans the data."""
    li = _t(spark, "lineitem")
    month = F.to_date("l_shipdate")
    zone = (F.year(month) * 12 + F.month(month) - 1).alias("zone_m")
    zones = li.groupBy(zone).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("l_quantity").alias("max_q"),
        F.min("l_discount").alias("min_d"),
        F.max("l_discount").alias("max_d"),
    ).localCheckpoint(eager=False)
    # pinned (~80 rows): the three predicate branches each consume zones —
    # unpinned, the "one stats pass" claim is false (3 lineitem scans)
    y1998 = 1998 * 12
    p_ship = (F.col("zone_m") < y1998) | (F.col("zone_m") > y1998 + 11)
    p_qty = F.col("max_q") <= 45
    p_disc = (F.col("max_d") < 0.05) | (F.col("min_d") > 0.07)
    # three predicate rows via explicit union over the ~80-row zone
    # table (driver-free arithmetic; a stack() would need expr-string
    # plumbing for computed booleans)
    parts = [
        ("shipdate_1998", p_ship),
        ("quantity_gt45", p_qty),
        ("discount_05_07", p_disc),
    ]
    tagged = None
    for name, pred in parts:
        t = zones.select(
            F.lit(name).alias("predicate"),
            pred.cast("int").alias("pruned"),
            "n_rows",
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    return (
        tagged.groupBy("predicate")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_zones"),
            F.sum("pruned").cast("long").alias("n_pruned"),
            F.sum("n_rows").cast("long").alias("rows_total"),
            F.sum(F.col("pruned") * F.col("n_rows")).cast("long").alias("rows_skipped"),
            F.round(F.sum("pruned") / F.count(F.lit(1)).cast("double"), 6).alias(
                "zone_prune_ratio"
            ),
            F.round(
                F.sum(F.col("pruned") * F.col("n_rows"))
                / F.sum("n_rows").cast("double"),
                6,
            ).alias("row_skip_ratio"),
        )
        .orderBy("predicate")
    )


def bloom_join_audit(spark: SparkSession) -> DataFrame:
    """Runtime-filter (bloom join) payoff audit for the classic Q3
    shape — orders semi-joined to BUILDING-segment customers: from the
    build-side key count and probe-side match rate alone, compute the
    expected false-positive rate and scan reduction of pushing a bloom
    filter of b bits/key down to the probe scan, for b in {8, 12, 16}.

      fpr(b) ≈ 0.6185^b   (optimal hash count k = b·ln2)
      est_probe_out = matches + non_matches · fpr

    This is the decision Spark's own runtime row-level filtering
    (spark.sql.optimizer.runtime.bloomFilter) makes implicitly; the
    audit makes it explicit so a 100 TB job can size the filter — or
    skip it when the join is not selective enough to pay for the
    broadcast.

    Shape: one distinct-count on the build side, one boolean rollup on
    the probe side (left-semi flag via a broadcast hash join), then
    closed-form arithmetic over a 3-row literal frame. The probe table
    is scanned ONCE."""
    cust = (
        _t(spark, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    build = cust.agg(F.countDistinct("c_custkey").cast("long").alias("build_keys"))
    probe = (
        _t(spark, "orders")
        .join(
            F.broadcast(cust.withColumn("matched", F.lit(1))),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("probe_rows"),
            F.sum(F.coalesce("matched", F.lit(0))).cast("long").alias("match_rows"),
        )
    )
    bits = spark.range(1).select(
        F.explode(F.array(F.lit(8), F.lit(12), F.lit(16))).alias("bits_per_key")
    )
    fpr = F.pow(F.lit(0.6185), F.col("bits_per_key"))
    est_out = F.col("match_rows") + (
        F.col("probe_rows") - F.col("match_rows")
    ) * fpr
    return (
        bits.crossJoin(F.broadcast(build))
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("bits_per_key").cast("int").alias("bits_per_key"),
            "build_keys",
            "probe_rows",
            "match_rows",
            F.round(fpr, 6).alias("fpr"),
            F.round(est_out, 2).alias("est_probe_out_rows"),
            F.round(1.0 - est_out / F.col("probe_rows"), 6).alias(
                "scan_reduction"
            ),
        )
        .orderBy("bits_per_key")
    )
