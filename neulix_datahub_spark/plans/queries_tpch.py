"""TPC-H analogue query set (SURVEY §2 J4/A7/W2/IO8 — the delegated-SQL
surface the reference pushes to BigQuery verbatim via
``core/utils/db_core.py:119-135``; these pin the join / subquery /
window semantics our engine must honor natively).

Adapted to the driver fixtures (no ``partsupp`` table, no comment /
shipmode / receiptdate columns — see FIXTURES.md): partsupp-shaped
queries (Q2/Q9/Q16) use ``lineitem`` as the part↔supplier relation, and
date-lag predicates (Q12/Q21) use ``l_shipdate - o_orderdate`` in place
of commit/receipt dates.

Scale notes (100 TB design point), applied throughout:
- only CONSTANT-size dimensions (region/nation — BROADCAST_TABLES in
  sources/tables.py) carry explicit broadcast hints; supplier/customer/
  part all grow with scale factor (TPC-H: SF x 10k/150k/200k rows), so
  their join strategy is left to AQE (a forced broadcast of a
  multi-hundred-GB table at the 100 TB design point is an executor OOM,
  and the hint would override AQE's runtime choice);
- fact⋈fact joins (orders⋈lineitem) shuffle on the join key once and
  aggregate partially map-side;
- LIMIT queries carry a deterministic id tiebreak so the cut is stable
  across engines;
- no Python in any hot path: every expression is a built-in, the whole
  plan stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from neulix_datahub_spark.plans._exact import (
    money_sum,
    money_sum_sql,
    revenue_sum_sql,
)
from neulix_datahub_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev():
    """Discounted revenue expression (built once per query — F.col needs
    an active session in classic mode, so this cannot be a module constant)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _rev_dec():
    """Decimal-exact discounted revenue term: price (2-dp money) times
    (1 - discount) (2-dp fraction) is an exact 4-dp decimal, so sums of
    it are associative — the driver-hashed revenue checksums cannot
    flip their last digit on partial-agg order (plans/_exact.py)."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit("1.00").cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )


# ---------------------------------------------------------------------------
# Q2 analogue — min-cost supplier per part (correlated-min via window rank).
# partsupp is emulated by lineitem's (l_partkey, l_suppkey) with unit price
# l_extendedprice / l_quantity; the classic correlated subquery
# `cost = (SELECT min(cost) ...)` becomes a rank-1 window — same result,
# one shuffle, no re-scan.
# ---------------------------------------------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    supp = _t(spark, sf_dir, "supplier")
    offers = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(
            "p_partkey",
            "p_brand",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
        )
    )
    # Rank-1-per-part as a struct-min hash aggregate, not a sort window:
    # min(struct(unit_cost, l_suppkey)) is lexicographic — the same row
    # the `row_number() OVER (ORDER BY unit_cost, l_suppkey) = 1` window
    # picks — but aggregates with map-side combine instead of sorting
    # every partition's offers, the difference between a hash agg and a
    # full per-key sort at the 100 TB design point.
    best = (
        offers.groupBy("p_partkey", "p_brand")
        .agg(F.min(F.struct("unit_cost", "l_suppkey")).alias("__best"))
        .select(
            "p_partkey",
            "p_brand",
            F.col("__best.l_suppkey").alias("l_suppkey"),
            F.col("__best.unit_cost").alias("unit_cost"),
        )
    )
    return (
        best.join(supp, best.l_suppkey == supp.s_suppkey)
        .select(
            "p_partkey",
            "p_brand",
            F.col("s_name").alias("supplier_name"),
            F.round("unit_cost", 6).alias("unit_cost"),
        )
    )


Q2_SQL = """
WITH offers AS (
    SELECT p_partkey, p_brand, l_suppkey,
           l_extendedprice / l_quantity AS unit_cost,
           row_number() OVER (PARTITION BY p_partkey
                              ORDER BY l_extendedprice / l_quantity, l_suppkey) AS rn
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'STANDARD' AND p_size <= 10
)
SELECT p_partkey, p_brand, s_name AS supplier_name,
       round(unit_cost, 6) AS unit_cost
FROM offers JOIN supplier ON l_suppkey = s_suppkey
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Q7 analogue — volume shipped between two nations by year.
# ---------------------------------------------------------------------------

def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = F.col("supp_nation").isin("NATION_1", "NATION_2") & F.col(
        "cust_nation"
    ).isin("NATION_1", "NATION_2") & (F.col("supp_nation") != F.col("cust_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(_rev_dec()).cast("double").alias("volume"))
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       {revenue_sum_sql("l_extendedprice", "l_discount")} AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


# ---------------------------------------------------------------------------
# Q8 analogue — a nation's market share inside a region, by order year.
# ---------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cnation = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("c_nk"))
    snation = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(cnation), F.col("c_nationkey") == F.col("c_nk"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(snation), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            # both sums decimal-exact → the double ratio is the same
            # division of the same two doubles in every engine
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", _rev_dec()).otherwise(
                        F.lit("0.00").cast("decimal(6,4)")
                    )
                ).cast("double")
                / F.sum(_rev_dec()).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


Q8_SQL = """
SELECT year(o_orderdate) AS o_year,
       round(CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
                      THEN CAST(l_extendedprice AS DECIMAL(18,2))
                           * (CAST('1.00' AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                      ELSE CAST('0.00' AS DECIMAL(6,4)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST('1.00' AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE),
             6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  AND p_type = 'ECONOMY' AND r_name = 'ASIA'
GROUP BY year(o_orderdate)
"""


# ---------------------------------------------------------------------------
# Q9 analogue — profit by supplier nation and order year (partsupp cost
# dropped; profit = discounted revenue; part filter on type).
# ---------------------------------------------------------------------------

def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(_rev_dec()).cast("double").alias("profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       {revenue_sum_sql("l_extendedprice", "l_discount")} AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_type = 'PROMO'
GROUP BY n_name, year(o_orderdate)
"""


# ---------------------------------------------------------------------------
# Q12 analogue — late-shipment counts by line status and order priority
# class (ship lag > 90 days replaces the commit/receipt-date predicate).
# ---------------------------------------------------------------------------

def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(late)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q13 analogue — distribution of customers by order count (zero included:
# the left outer join is the point of the query).
# ---------------------------------------------------------------------------

def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
) per_cust
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q15 analogue — top supplier(s) by quarterly revenue (scalar-max subquery).
# The max is a single-row aggregate joined back in — Spark broadcasts it, so
# the revenue CTE is computed once per side but never shuffled wide.
# ---------------------------------------------------------------------------

def q15_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_dec()).cast("double").alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("supplier_no", F.col("s_name").alias("supplier_name"), "total_revenue")
    )


Q15_SQL = f"""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           {revenue_sum_sql("l_extendedprice", "l_discount")} AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT supplier_no, s_name AS supplier_name, total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


# ---------------------------------------------------------------------------
# Q16 analogue — distinct supplier count per (brand, type, size) bucket,
# lineitem as the part↔supplier relation.
# ---------------------------------------------------------------------------

def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17)
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q17 analogue — revenue from small-quantity orders of one brand: the
# correlated `avg per part` subquery becomes a window mean over the
# brand-filtered fact slice (one shuffle, no second scan).
# ---------------------------------------------------------------------------

def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    joined = li.join(part, li.l_partkey == part.p_partkey).select(
        "p_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(money_sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


Q17_SQL = f"""
SELECT round({money_sum_sql("l_extendedprice")} / 7.0, 4) AS avg_yearly
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#2'
  AND l_quantity < 0.5 * (
      SELECT avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


# ---------------------------------------------------------------------------
# Q18 analogue — large-volume customers (HAVING over a fact⋈fact join).
# ---------------------------------------------------------------------------

def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.round("total_qty", 4).alias("total_qty"),
        )
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey AS orderkey, o_totalprice AS totalprice,
       round(total_qty, 4) AS total_qty
FROM (
    SELECT l_orderkey, sum(l_quantity) AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
) big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# Q19 analogue — disjunctive brand/size/quantity predicates: Catalyst keeps
# the whole OR-of-ANDs as one post-join filter over a broadcast join.
# ---------------------------------------------------------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(F.sum(_rev_dec()).cast("double").alias("revenue"))


Q19_SQL = f"""
SELECT {revenue_sum_sql("l_extendedprice", "l_discount")} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q21 analogue — suppliers who alone shipped late on multi-supplier
# finished orders. EXISTS / NOT EXISTS in the oracle; in Spark the
# per-order supplier sets reduce to one aggregation over distinct
# (order, supplier, late) triples — one shuffle instead of two self-joins.
# ---------------------------------------------------------------------------

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    triples = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(late, F.lit(1)).otherwise(F.lit(0)).alias("is_late"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("is_late").alias("is_late"))
    )
    per_order = triples.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    lone_late = per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    return (
        lone_late.join(supp, F.col("late_supp") == supp.s_suppkey)
        .groupBy(F.col("s_name").alias("supplier_name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


Q21_SQL = """
WITH triples AS (
    SELECT l_orderkey, l_suppkey,
           max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END) AS is_late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY l_orderkey, l_suppkey
),
per_order AS (
    SELECT l_orderkey, count(*) AS n_supp, sum(is_late) AS n_late,
           max(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
    FROM triples GROUP BY l_orderkey
)
SELECT s_name AS supplier_name, count(*) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE n_supp > 1 AND n_late = 1
GROUP BY s_name
"""


# ---------------------------------------------------------------------------
# Q22 analogue — well-funded customers with no URGENT orders, by market
# segment (scalar AVG subquery + anti-join; the fixture gives every
# customer *some* order, so the anti-join targets the urgent subset to
# keep the result non-trivial).
# ---------------------------------------------------------------------------

def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    # avg from the exact decimal sum: identical double in every engine,
    # so the c_acctbal > avg_bal row membership cannot drift
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (money_sum("c_acctbal") / F.count(F.lit(1))).alias("avg_bal")
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(
        orders.select("o_custkey").distinct(),
        rich.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return idle.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("numcust"),
        money_sum("c_acctbal").alias("totacctbal"),
    )


Q22_SQL = f"""
SELECT c_mktsegment AS segment, count(*) AS numcust,
       {money_sum_sql("c_acctbal")} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT {money_sum_sql("c_acctbal")} / count(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Q4 analogue — order-priority checking: orders in a quarter with at least
# one late line (EXISTS → left-semi join with a correlated non-equi date
# predicate; commit/receipt dates absent in the fixture, so "late" is
# l_shipdate > o_orderdate + 30 days). The semi-join keeps one row per
# order regardless of how many lines qualify — Catalyst never widens the
# fact side, and the orders date filter reaches the parquet scan.
# ---------------------------------------------------------------------------

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    with_late_line = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        with_late_line.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-07-01'
  AND o_orderdate < TIMESTAMP '1995-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q11 analogue — important part values: per-part traded value restricted to
# ASIA-nation suppliers, keeping parts above a fraction of the grand total
# (scalar-subquery HAVING). partsupp is emulated by lineitem with value
# l_extendedprice * l_quantity. The supplier filter is a region→nation→
# supplier broadcast chain (no fact shuffle); the grand total is a 1-row
# aggregate broadcast back — the per-part aggregate is computed once and
# reused by both sides (same CTE in the oracle).
# ---------------------------------------------------------------------------

def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    # part_value is an exact 2-dp decimal (money × integral quantity)
    # and the 0.1% threshold derives from its exact sum — the
    # part_value > min_value row membership is then identical in every
    # engine, instead of hinging on double-sum association.
    per_part = (
        li.join(supp.select("s_suppkey"), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_quantity").cast("decimal(4,0)")
            )
            .cast("double")
            .alias("part_value")
        )
    )
    threshold = per_part.agg(
        (money_sum("part_value") * F.lit(0.001)).alias("min_value")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("min_value"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


Q11_SQL = """
WITH per_part AS (
    SELECT l_partkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE) AS part_value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > (SELECT CAST(sum(CAST(part_value AS DECIMAL(18,2))) AS DOUBLE)
                           * CAST(0.001 AS DOUBLE)
                    FROM per_part)
ORDER BY part_value DESC, l_partkey
"""


# ---------------------------------------------------------------------------
# Q20 analogue — suppliers holding an excess share of a part line: for
# STANDARD parts, a supplier qualifies if its shipped quantity of some part
# exceeds 12% of that part's total (the availqty > 0.5*sum(qty) nesting of
# the original). Per-part totals come from a window over the already-grouped
# (part, supplier) aggregate — no second join against the fact — and the
# qualifying supplier set semi-joins into the supplier dim.
# ---------------------------------------------------------------------------

def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supp = _t(spark, sf_dir, "supplier")
    per_ps = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    excess = per_ps.withColumn("part_qty", F.sum("supp_qty").over(w)).filter(
        F.col("supp_qty") > 0.12 * F.col("part_qty")
    )
    return (
        supp.join(
            excess.select("l_suppkey").distinct(),
            supp.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .select(F.col("s_name").alias("supplier_name"), "s_acctbal")
        .orderBy("supplier_name")
    )


Q20_SQL = """
WITH per_ps AS (
    SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'STANDARD'
    GROUP BY l_partkey, l_suppkey
),
excess AS (
    SELECT l_suppkey
    FROM (
        SELECT l_suppkey, supp_qty,
               sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
        FROM per_ps
    )
    WHERE supp_qty > 0.12 * part_qty
)
SELECT s_name AS supplier_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM excess)
ORDER BY supplier_name
"""


TPCH_QUERIES = {
    "q4_order_priority": (q4_order_priority, Q4_SQL, "J4 Q4 exists semi-join"),
    "q11_important_part_values": (
        q11_important_part_values,
        Q11_SQL,
        "J4 Q11 scalar-subquery HAVING",
    ),
    "q20_excess_share_suppliers": (
        q20_excess_share_suppliers,
        Q20_SQL,
        "J4/W2 Q20 nested share semi-join",
    ),
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL, "J4/W2 Q2 correlated-min"),
    "q7_nation_volume": (q7_nation_volume, Q7_SQL, "J4 Q7 multi-dim join"),
    "q8_market_share": (q8_market_share, Q8_SQL, "J4 Q8 conditional share"),
    "q9_profit_by_nation": (q9_profit_by_nation, Q9_SQL, "J4 Q9"),
    "q12_late_shipments": (q12_late_shipments, Q12_SQL, "J4 Q12 date-lag"),
    "q13_order_count_distribution": (
        q13_order_count_distribution,
        Q13_SQL,
        "J4 Q13 outer-join distribution",
    ),
    "q15_top_suppliers": (q15_top_suppliers, Q15_SQL, "J4 Q15 scalar-max"),
    "q16_supplier_part_counts": (
        q16_supplier_part_counts,
        Q16_SQL,
        "A7 Q16 distinct agg",
    ),
    "q17_small_quantity_revenue": (
        q17_small_quantity_revenue,
        Q17_SQL,
        "J4/W2 Q17 correlated-avg",
    ),
    "q18_large_volume_customers": (
        q18_large_volume_customers,
        Q18_SQL,
        "J4 Q18 HAVING",
    ),
    "q19_disjunctive_revenue": (q19_disjunctive_revenue, Q19_SQL, "J4 Q19 OR-pred"),
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_SQL, "J4 Q21 exists/not-exists"),
    "q22_idle_customers": (q22_idle_customers, Q22_SQL, "J4 Q22 anti-join + scalar"),
}
