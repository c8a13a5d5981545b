"""Extended query set: summary stats (A1), pivot/cube (A7), null-fill
(F6), header/name projections (F1/F3), math surface (SC10), delegated SQL
(IO8/EP2), TPC-H Q10/Q14 analogues, and the sliding-window batch parity
(S1). Registered into the main QUERIES dict by plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from neulix_datahub_spark.functions.cleaning import (
    fill_nulls_by_type,
    project_to_header,
    sanitize_columns,
)
from neulix_datahub_spark.functions.ranking import local_relation
from neulix_datahub_spark.plans._exact import money_sum, revenue_sum
from neulix_datahub_spark.sources.tables import load_table, register_tables


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# A1: summary statistics (describe analogue, data_core.py:107-108) — exact
# aggregates in long format (one row per numeric column) so the oracle can
# check them (df.summary()'s quartiles are approximate by design).
# ---------------------------------------------------------------------------

_DESCRIBE_COLS = ("l_quantity", "l_extendedprice", "l_discount")


def describe_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    parts = [
        li.agg(
            F.lit(c).alias("column"),
            F.count(F.col(c)).alias("n"),
            F.round(F.avg(c), 6).alias("mean"),
            F.round(F.stddev_samp(c), 6).alias("std"),
            F.round(F.min(c), 6).alias("min"),
            F.round(F.max(c), 6).alias("max"),
        )
        for c in _DESCRIBE_COLS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


DESCRIBE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", count({c}) AS n, round(avg({c}), 6) AS mean,
       round(stddev_samp({c}), 6) AS std, round(min({c}), 6) AS min,
       round(max({c}), 6) AS max FROM lineitem"""
    for c in _DESCRIBE_COLS
)


# ---------------------------------------------------------------------------
# A7: pivot and cube
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.round(F.sum("value"), 4))
        .orderBy("user_id")
    )
    return out


PIVOT_SQL = f"""
SELECT user_id,
       {', '.join(f"round(sum(CASE WHEN event_type = '{t}' THEN value END), 4) AS {t}" for t in _EVENT_TYPES)}
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def cube_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
        )
    )


CUBE_SQL = """
SELECT coalesce(o_orderstatus, 'ALL')   AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*)                         AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# F6: null-fill by type class (db_core.py:41-53) — nulls planted from the
# fixture deterministically, then sanitized.
# ---------------------------------------------------------------------------

def fill_nulls_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    dirty = ev.select(
        "event_id",
        F.when(F.col("value") <= 100.0, F.col("value")).alias("value"),
        F.when(F.col("event_type") != "view", F.col("event_type")).alias("event_type"),
    )
    return fill_nulls_by_type(dirty)


FILL_NULLS_SQL = """
SELECT event_id,
       coalesce(CASE WHEN value <= 100.0 THEN value END, 0)         AS value,
       coalesce(CASE WHEN event_type <> 'view' THEN event_type END, '') AS event_type
FROM events
"""


# ---------------------------------------------------------------------------
# F1 / F3: header projection and name sanitization as queries
# ---------------------------------------------------------------------------

def header_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 (sheets_core.py:194-209): exact header, missing → '', null → ''."""
    cust = _t(spark, sf_dir, "customer")
    return project_to_header(cust, ["c_name", "c_acctbal", "priority_class"])


HEADER_SQL = """
SELECT coalesce(CAST(c_name AS VARCHAR), '')    AS c_name,
       coalesce(CAST(c_acctbal AS VARCHAR), '') AS c_acctbal,
       ''                                        AS priority_class
FROM customer
"""


def sanitized_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 (db_core.py:55-72): messy aliases → sanitized identifiers."""
    cust = _t(spark, sf_dir, "customer")
    dirty = cust.select(
        F.col("c_name").alias("Nome  Cliente"),
        F.col("c_acctbal").alias("1saldo (R$)"),
        F.col("c_mktsegment").alias(" segmento "),
    )
    return sanitize_columns(dirty)


SANITIZED_SQL = """
SELECT c_name AS Nome_Cliente, c_acctbal AS col_1saldo_R, c_mktsegment AS segmento
FROM customer
"""


# ---------------------------------------------------------------------------
# SC10: math/stats surface
# ---------------------------------------------------------------------------

def stats_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
            F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("covar_qd"),
        )
        .orderBy("l_returnflag")
    )


STATS_SQL = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(stddev_samp(l_quantity), 6)           AS std_qty,
       round(var_samp(l_discount), 6)              AS var_disc,
       round(covar_samp(l_quantity, l_discount), 6) AS covar_qd
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# IO8/EP2: the delegated-SQL surface — the SAME SQL string runs through
# spark.sql (over registered views) and the DuckDB oracle. Scalar subquery
# + grouped agg, the shapes the reference shipped to BigQuery verbatim.
# ---------------------------------------------------------------------------

# One string, two engines (spark.sql AND the DuckDB oracle run it
# verbatim) — so the averages derive from decimal-exact sums: a plain
# round(avg(double), 4) flipped its last digit at sf0.1 when the
# engines' partial sums straddled a rounding boundary.
DELEGATED_SQL = """
SELECT p_brand, count(*) AS n_parts,
       round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 4) AS avg_price
FROM part
WHERE p_retailprice > (SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                              / count(*) FROM part)
GROUP BY p_brand
ORDER BY p_brand
"""


def load_behaviors_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IO10/IO11 + IO16 driver-visible (round 5): the load-behavior
    state machine run end-to-end — replace seeds the table (written
    with GZIP compression to exercise the codec knob), append doubles
    it, an EMPTY append is skipped by the guard (db_core.py:99-101),
    replace resets it (back to snappy) — landing state re-read and
    aggregated after each step. The oracle recomputes each step's
    expected counts/sums from the raw table arithmetic, so a green row
    pins the mode mapping, the empty-guard, and both codecs' round-trip
    in one query."""
    from neulix_datahub_spark.sources.io import (
        warehouse_scratch,
        write_parquet,
        write_table,
    )

    root = warehouse_scratch(spark, "_neulix_load_")
    path = f"{root}/tbl"
    nation = _t(spark, sf_dir, "nation")
    # step 1: replace (gzip)
    write_parquet(nation, path, compression="gzip")
    # step 2: append
    write_table(nation, path, "append")
    # step 3: empty append — guard must skip, not clobber
    write_table(nation.filter(F.lit(False)), path, "append")
    # materialize NOW: the step-4 replace deletes these files, and a
    # lazy plan read after that would hit FILE_NOT_EXIST
    d = spark.read.parquet(path).agg(
        F.count(F.lit(1)), F.sum("n_nationkey")
    ).first()
    # step 4: replace resets
    write_table(nation, path, "replace")
    f = spark.read.parquet(path).agg(
        F.count(F.lit(1)), F.sum("n_nationkey")
    ).first()
    return local_relation(
        spark,
        [(int(d[0]), int(d[1]), int(f[0]), int(f[1]))],
        "rows_after_append bigint, keysum_after_append bigint, "
        "rows_after_replace bigint, keysum_after_replace bigint",
    )


LOAD_BEHAVIORS_SQL = """
SELECT CAST(2 * count(*) AS BIGINT) AS rows_after_append,
       CAST(2 * sum(n_nationkey) AS BIGINT) AS keysum_after_append,
       CAST(count(*) AS BIGINT) AS rows_after_replace,
       CAST(sum(n_nationkey) AS BIGINT) AS keysum_after_replace
FROM nation
"""


def price_quartiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 grouped exact percentiles (round 5): p25/median/p75 + IQR of
    order value PER priority via the exact ``percentile`` aggregate —
    both engines interpolate linearly, so 4-dp rounding matches. The
    global exact form is `price_percentiles`; this is the grouped
    surface. At 100 TB swap to percentile_approx (mergeable GK) exactly
    as approx_price_percentiles demonstrates — exact grouped
    percentiles materialize each group's values."""
    orders = _t(spark, sf_dir, "orders")
    q = lambda p: F.percentile("o_totalprice", F.lit(p))
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(q(0.25), 4).alias("p25"),
            F.round(q(0.5), 4).alias("median"),
            F.round(q(0.75), 4).alias("p75"),
            F.round(q(0.75) - q(0.25), 4).alias("iqr"),
        )
        .orderBy("o_orderpriority")
    )


PRICE_QUARTILES_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       round(quantile_cont(o_totalprice, 0.5), 4) AS median,
       round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
       round(quantile_cont(o_totalprice, 0.75)
             - quantile_cont(o_totalprice, 0.25), 4) AS iqr
FROM orders
GROUP BY 1
ORDER BY o_orderpriority
"""


def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration analysis (round 5): the Pareto question — what
    share of revenue do the top 10%/20% of customers carry — plus the
    exact Gini coefficient via the rank formula
    G = 2·Σ(rank·sᵢ)/(n·Σs) − (n+1)/n over spend ranked ascending with
    a customer-key tiebreak (deterministic ranks, so both engines
    compute identical sums). One customer-keyed aggregation; the exact
    ranks come from the TWO-PHASE rank (operators/sequence.py
    with_sorted_rank: range-repartition + local row_number + broadcast
    prefix offsets) and the grand totals from a broadcast single-row
    aggregate — NO single-partition global window, so the Pareto shares
    hold at 10⁹-customer grain."""
    from neulix_datahub_spark.operators.sequence import with_sorted_rank

    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("__s"))
    totals = spend.agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__s").alias("__total")
    )
    ranked = (
        with_sorted_rank(spend, ["__s", "o_custkey"], "__rk")
        .crossJoin(F.broadcast(totals))
        .select("__s", "__rk", "__n", "__total")
    )
    return ranked.agg(
        F.max("__n").cast("bigint").alias("n_customers"),
        F.round(F.max("__total"), 2).alias("total_revenue"),
        F.round(
            F.sum(F.when(F.col("__rk") > 0.9 * F.col("__n"), F.col("__s")).otherwise(0.0))
            / F.max("__total"),
            6,
        ).alias("top10pct_share"),
        F.round(
            F.sum(F.when(F.col("__rk") > 0.8 * F.col("__n"), F.col("__s")).otherwise(0.0))
            / F.max("__total"),
            6,
        ).alias("top20pct_share"),
        F.round(
            (2.0 * F.sum(F.col("__rk") * F.col("__s")))
            / (F.max("__n") * F.max("__total"))
            - (F.max("__n") + 1.0) / F.max("__n"),
            6,
        ).alias("gini"),
    )


CONCENTRATION_SQL = """
WITH spend AS (
    SELECT o_custkey, sum(o_totalprice) AS s FROM orders GROUP BY 1
),
ranked AS (
    SELECT s, o_custkey,
           row_number() OVER (ORDER BY s, o_custkey) AS rk,
           count(*) OVER () AS n,
           sum(s) OVER () AS total
    FROM spend
)
SELECT CAST(max(n) AS BIGINT) AS n_customers,
       round(max(total), 2) AS total_revenue,
       round(sum(CASE WHEN rk > 0.9 * n THEN s ELSE 0 END) / max(total), 6)
           AS top10pct_share,
       round(sum(CASE WHEN rk > 0.8 * n THEN s ELSE 0 END) / max(total), 6)
           AS top20pct_share,
       round((2.0 * sum(rk * s) / (max(n) * max(total))) - (max(n) + 1.0) / max(n), 6)
           AS gini
FROM ranked
"""


def ship_delay_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfilment lead time per priority: days from order date to line
    shipment (the operational KPI behind Q12's late-shipment check) —
    avg, exact median and max over the fact-fact join. One shuffle for
    the join (AQE-planned), one 5-key aggregation; exact median at
    toy scale, percentile_approx at 100 TB as usual."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff("l_shipdate", "o_orderdate")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.avg(delay), 4).alias("avg_days"),
            F.round(F.percentile(delay, F.lit(0.5)), 4).alias("median_days"),
            F.max(delay).cast("bigint").alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


SHIP_DELAY_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       round(avg(date_diff('day', o_orderdate, l_shipdate)), 4) AS avg_days,
       round(quantile_cont(date_diff('day', o_orderdate, l_shipdate), 0.5), 4)
           AS median_days,
       CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS max_days
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
ORDER BY o_orderpriority
"""


def basket_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Items-per-order histogram with percentage shares — the basket
    profile the co-purchase miner's bounded-blowup argument rests on.
    Two aggregations (order-keyed, then <=max-basket keys); the share
    normalizer is a window over the tiny histogram frame."""
    li = _t(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("__n"))
    hist = sizes.groupBy(F.col("__n").alias("items_per_order")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        hist.select(
            "items_per_order",
            "n_orders",
            F.round(
                100.0 * F.col("n_orders") / F.sum("n_orders").over(Window.partitionBy()),
                4,
            ).alias("pct"),
        )
        .orderBy("items_per_order")
    )


BASKET_SQL = """
WITH sizes AS (SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1)
SELECT CAST(n AS BIGINT) AS items_per_order,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(100.0 * count(*) / sum(count(*)) OVER (), 4) AS pct
FROM sizes
GROUP BY n
ORDER BY items_per_order
"""


def monthly_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar seasonality over the 6.5-year order history: each
    month-of-year's revenue against the uniform 1/12 expectation
    (index > 1 = hot month). One scan + 12-key aggregation; the
    normalizer is a window over the 12-row frame."""
    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(F.month("o_orderdate").alias("month")).agg(
        F.sum("o_totalprice").alias("__rev")
    )
    return (
        monthly.select(
            F.col("month").cast("bigint").alias("month"),
            F.round("__rev", 2).alias("revenue"),
            F.round(
                F.col("__rev")
                / (F.sum("__rev").over(Window.partitionBy()) / 12.0),
                6,
            ).alias("seasonality_index"),
        )
        .orderBy("month")
    )


SEASONALITY_SQL = """
WITH monthly AS (
    SELECT month(o_orderdate) AS m, sum(o_totalprice) AS rev
    FROM orders GROUP BY 1
)
SELECT CAST(m AS BIGINT) AS month, round(rev, 2) AS revenue,
       round(rev / (sum(rev) OVER () / 12.0), 6) AS seasonality_index
FROM monthly
ORDER BY month
"""


def customer_tenure_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime span: years between first and last order,
    bucketed, with cohort sizes and average order counts — the
    engagement-longevity profile. One customer-keyed aggregation, then
    a <=7-key histogram."""
    orders = _t(spark, sf_dir, "orders")
    span = orders.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("__d"),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        span.groupBy(
            F.floor(F.col("__d") / 365.0).cast("bigint").alias("tenure_years")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("__n"), 4).alias("avg_orders"),
        )
        .orderBy("tenure_years")
    )


TENURE_SQL = """
WITH span AS (
    SELECT o_custkey,
           date_diff('day', min(o_orderdate), max(o_orderdate)) AS d,
           count(*) AS n
    FROM orders GROUP BY 1
)
SELECT CAST(floor(d / 365.0) AS BIGINT) AS tenure_years,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(avg(n), 4) AS avg_orders
FROM span
GROUP BY 1
ORDER BY tenure_years
"""


def return_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returns analysis: per-brand return percentage and returned value
    (the merchandising KPI behind Q10's returned-revenue ranking) —
    fact⋈dim join, conditional aggregation, 25-key result."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag", "l_extendedprice"
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    returned = (F.col("l_returnflag") == "R").cast("int")
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(100.0 * F.sum(returned) / F.count(F.lit(1)), 4).alias(
                "return_pct"
            ),
            F.sum(
                F.when(
                    F.col("l_returnflag") == "R",
                    F.col("l_extendedprice").cast("decimal(18,2)"),
                ).otherwise(F.lit("0.00").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("returned_value"),
        )
        .orderBy("p_brand")
    )


RETURN_RATE_SQL = """
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       round(100.0 * sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             / count(*), 4) AS return_pct,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2))
                     ELSE CAST('0.00' AS DECIMAL(18,2)) END) AS DOUBLE)
           AS returned_value
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
ORDER BY p_brand
"""


def discount_by_quantity_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-policy profile: average discount and net revenue per
    10-unit quantity band — the volume-discount curve Q19's disjunctive
    predicates slice. One scan, <=6-key aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_quantity") / 10).cast("bigint").alias("qty_band")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.avg("l_discount"), 6).alias("avg_discount"),
            revenue_sum("l_extendedprice", "l_discount").alias("net_revenue"),
        )
        .orderBy("qty_band")
    )


DISCOUNT_BAND_SQL = """
SELECT CAST(floor(l_quantity / 10) AS BIGINT) AS qty_band,
       CAST(count(*) AS BIGINT) AS n_items,
       round(avg(l_discount), 6) AS avg_discount,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST('1.00' AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS net_revenue
FROM lineitem
GROUP BY 1
ORDER BY qty_band
"""


def csv_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IO3/IO4/IO5 driver-visible: write customer to a ';'-delimited CSV,
    read it back through the delimiter-SNIFFING loader (one-line probe,
    then the real scan), and aggregate. The oracle recomputes the
    aggregate from the parquet table, so a green row proves the CSV
    sink, the sniffer, and the PERMISSIVE scan round-trip every row and
    type (inferSchema must land c_acctbal back on double)."""
    import tempfile

    from neulix_datahub_spark.sources.io import read_csv_sniffed, write_csv

    tmp = tempfile.mkdtemp(prefix="neulix_csv_rt_")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    write_csv(cust, f"{tmp}/customer_csv", delimiter=";")
    back = read_csv_sniffed(spark, f"{tmp}/customer_csv")
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum("c_acctbal").alias("sum_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


CSV_ROUNDTRIP_SQL = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def json_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IO6 driver-visible: orders → JSON-lines sink → scan → aggregate;
    the oracle recomputes from parquet, proving the JSON sink/scan
    round-trips rows and numeric types."""
    import tempfile

    from neulix_datahub_spark.sources.io import read_json, write_json

    tmp = tempfile.mkdtemp(prefix="neulix_json_rt_")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    write_json(orders, f"{tmp}/orders_json")
    back = read_json(spark, f"{tmp}/orders_json")
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


JSON_ROUNDTRIP_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def update_rewrite_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IO9 driver-visible: copy customer to a scratch parquet table, run
    the SQL-UPDATE rewrite (+500 balance for the BUILDING segment), scan
    the rewritten table and aggregate. The oracle recomputes the
    post-update aggregate with CASE WHEN over the pristine parquet, so a
    green row proves the read → conditional-replace → staging-swap cycle
    touched exactly the matched rows."""
    import tempfile

    from neulix_datahub_spark.sources.io import update_parquet_table

    tmp = tempfile.mkdtemp(prefix="neulix_upd_")
    path = f"{tmp}/customer_copy"
    _t(spark, sf_dir, "customer").write.mode("overwrite").parquet(path)
    update_parquet_table(
        spark,
        path,
        set_exprs={"c_acctbal": F.round(F.col("c_acctbal") + 500.0, 4)},
        where=F.col("c_mktsegment") == "BUILDING",
    )
    return (
        spark.read.parquet(path)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum("c_acctbal").alias("sum_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


UPDATE_REWRITE_SQL = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(CASE WHEN c_mktsegment = 'BUILDING'
                      THEN round(c_acctbal + 500.0, 4)
                      ELSE c_acctbal END AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def bulk_manifest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IO10/IO12 driver-visible: load a {source: destination} manifest
    (the reference's upload_raw_files_to_bq loop) pointing two fixture
    tables at scratch destinations with replace behavior, then aggregate
    the loaded tables; the oracle recomputes from the originals — a
    green row proves the manifest loop landed every row of every entry."""
    import tempfile

    from neulix_datahub_spark.sources.io import bulk_load

    tmp = tempfile.mkdtemp(prefix="neulix_bulk_")
    manifest = {
        f"{sf_dir}/region.parquet": f"{tmp}/region_dest",
        f"{sf_dir}/nation.parquet": f"{tmp}/nation_dest",
    }
    results = bulk_load(spark, manifest, loading_behavior="replace")
    assert all(v == "ok" for v in results.values()), results
    region = spark.read.parquet(f"{tmp}/region_dest").select(
        F.col("r_regionkey").alias("key")
    )
    nation = spark.read.parquet(f"{tmp}/nation_dest").select(
        F.col("n_nationkey").alias("key")
    )
    return (
        region.withColumn("table", F.lit("region"))
        .unionByName(nation.withColumn("table", F.lit("nation")))
        .groupBy("table")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("key").alias("key_sum"))
        .orderBy("table")
    )


BULK_MANIFEST_SQL = """
SELECT 'region' AS "table", CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(r_regionkey) AS BIGINT) AS key_sum FROM region
UNION ALL
SELECT 'nation', CAST(count(*) AS BIGINT), CAST(sum(n_nationkey) AS BIGINT) FROM nation
ORDER BY "table"
"""


def doc_store_upsert_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IO14 driver-visible: the batched document-store upsert sink
    (foreachPartition, commit every 500 ops, injected client callable)
    with a file-backed write_batch standing in for the Firestore client:
    each committed batch lands as one JSON-lines file, executor-side.
    Reading the landed store back and aggregating proves every row
    arrived exactly once with its derived string __doc_id; the oracle
    recomputes from the orders table.

    The scratch store is derived from ``spark.sql.warehouse.dir`` — the
    root every deployment already shares between driver and executors
    (local FS here, NFS/HDFS/fuse mount on a cluster) — so the
    executor-side write_batch files and the driver's read-back resolve
    to the same store everywhere, not just in local mode. In deployment
    the injected callable is a real document-store client (the point of
    the seam) and no filesystem path is involved at all."""
    import json
    import os
    import uuid

    from neulix_datahub_spark.sources.adapters import upsert_to_document_store
    from neulix_datahub_spark.sources.io import warehouse_scratch

    store = warehouse_scratch(spark, "_neulix_docstore_")

    def write_batch(batch: list[dict]) -> None:
        path = os.path.join(store, f"{uuid.uuid4().hex}.json")
        with open(path, "w", encoding="utf-8") as f:
            for d in batch:
                f.write(json.dumps(d) + "\n")

    sel = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    upsert_to_document_store(sel, "o_orderkey", write_batch, batch_size=500)
    back = spark.read.json(store)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("__doc_id").alias("n_distinct_ids"),
            money_sum("o_totalprice").alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


DOC_STORE_UPSERT_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct_ids,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def orc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IO1/IO2 sibling, driver-visible: part → ORC sink → ORC scan →
    aggregate per brand. The oracle recomputes from the parquet table,
    so a green row proves the ORC sink/scan round-trips every row and
    type (long keys, double prices, strings) through Spark's native
    vectorized ORC path."""
    from neulix_datahub_spark.sources.io import (
        read_orc,
        warehouse_scratch,
        write_orc,
    )

    path = warehouse_scratch(spark, "_neulix_orc_rt_")
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    write_orc(part, path)
    back = read_orc(spark, path)
    return (
        back.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            money_sum("p_retailprice").alias("sum_price"),
        )
        .orderBy("p_brand")
    )


ORC_ROUNDTRIP_SQL = """
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM part
GROUP BY p_brand
ORDER BY p_brand
"""


def partitioned_events_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IO2 layout tier, driver-visible: events written to a Hive-style
    DATE-partitioned parquet layout (``event_date=2024-01-DD/`` — the
    100 TB layout SURVEY §6 prescribes for the fact tables), then read
    back with a one-week filter and aggregated per event_type. The
    filter matches the partition DIRECTORIES, so the scan lists and
    reads 7 of the 30 date partitions and zero data files outside them
    — PartitionFilters-only pruning, asserted on the physical plan and
    on the scanned-file list in tests/test_io.py. The oracle recomputes
    the aggregate from the raw events table under the same date window,
    so a green row proves the partitioned sink round-trips every row
    (including the partition column's value<->directory encoding) and
    that pruning dropped nothing it shouldn't."""
    from neulix_datahub_spark.sources.io import (
        warehouse_scratch,
        write_partitioned_parquet,
    )

    ev = _t(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    path = warehouse_scratch(spark, "_neulix_events_parted_")
    write_partitioned_parquet(ev, path, ["event_date"])
    back = spark.read.parquet(path).filter(
        (F.col("event_date") >= F.lit("2024-01-08").cast("date"))
        & (F.col("event_date") <= F.lit("2024-01-14").cast("date"))
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.col("event_date")).alias("n_days"),
            money_sum("value").alias("sum_value"),
        )
        .orderBy("event_type")
    )


PARTITIONED_EVENTS_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
GROUP BY event_type
ORDER BY event_type
"""


def snapshot_upsert_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IO9/J2 transactional tier (round 4): the versioned snapshot table
    (sources/snapshots.py — immutable snapshot dirs + atomic pointer
    publish, the engine-neutral stand-in for Delta/Iceberg MERGE the
    environment can't install). Publishes customer as v1, applies the
    same keyed upsert as upsert_customer_balances via upsert_snapshot
    (v2), re-reads THROUGH the pointer and aggregates per segment; also
    asserts the v1 reader still sees the pre-upsert table (the isolation
    property the staged swap lacks). The oracle recomputes the post-
    upsert aggregate from the raw customer table. The snapshot root is
    derived from the shared warehouse dir (executors write the snapshot
    parquet), like every scratch path in this module."""
    from neulix_datahub_spark.sources.io import warehouse_scratch
    from neulix_datahub_spark.sources.snapshots import (
        current_version,
        read_snapshot_table,
        upsert_snapshot,
        write_snapshot,
    )

    root = warehouse_scratch(spark, "_neulix_snap_")
    cust = _t(spark, sf_dir, "customer")
    v1 = write_snapshot(cust, root)
    updates = cust.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") + 1000.0, 4)
    )
    v2 = upsert_snapshot(spark, root, updates, key="c_custkey")
    assert (v1, v2) == ("v00000001", "v00000002"), (v1, v2)
    assert current_version(root) == v2
    # isolation: the pre-upsert snapshot is still intact by name
    n_before = read_snapshot_table(spark, root, version=v1).count()
    assert n_before == cust.count(), n_before
    return (
        read_snapshot_table(spark, root)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.count_distinct("c_custkey").alias("n_distinct_keys"),
            F.sum(F.round(F.col("c_acctbal"), 4).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_balance"),
        )
        .orderBy("c_mktsegment")
    )


SNAPSHOT_UPSERT_SQL = """
WITH upserted AS (
    SELECT c_custkey, c_mktsegment,
           CASE WHEN c_custkey % 10 = 0
                THEN round(c_acctbal + 1000.0, 4)
                ELSE c_acctbal END AS c_acctbal
    FROM customer
)
SELECT c_mktsegment,
       count(*) AS n_customers,
       CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct_keys,
       CAST(sum(CAST(round(c_acctbal, 4) AS DECIMAL(18,2))) AS DOUBLE) AS sum_balance
FROM upserted
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def catalog_commit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table atomic commit (round 5, snapshots.py::commit_tables):
    commit a balances table and a segments table under catalog v1, then
    commit ONLY an updated balances (+1000 on every 10th key) as v2 —
    segments carries forward by manifest. Reading THROUGH the catalog
    joins the two tables from one commit; the oracle recomputes the
    joined aggregate from the raw customer table with the same update
    applied. A green row proves commit/carry-forward/consistent-read
    end-to-end, not just unit-level."""
    from neulix_datahub_spark.sources.io import warehouse_scratch
    from neulix_datahub_spark.sources.snapshots import (
        commit_tables,
        read_catalog,
    )

    root = warehouse_scratch(spark, "_neulix_catalog_")
    cust = _t(spark, sf_dir, "customer")
    balances = cust.select("c_custkey", "c_acctbal")
    segments = cust.select("c_custkey", "c_mktsegment")
    v1 = commit_tables({"balances": balances, "segments": segments}, root)
    updated = balances.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 10 == 0, F.round(F.col("c_acctbal") + 1000.0, 4)
        ).otherwise(F.col("c_acctbal")),
    )
    v2 = commit_tables({"balances": updated}, root)
    assert (v1, v2) == ("v00000001", "v00000002"), (v1, v2)
    view = read_catalog(spark, root)
    return (
        view["balances"]
        .join(view["segments"], "c_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.round(F.col("c_acctbal"), 4).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_balance"),
        )
        .orderBy("c_mktsegment")
    )


CATALOG_COMMIT_SQL = """
WITH upserted AS (
    SELECT c_custkey, c_mktsegment,
           CASE WHEN c_custkey % 10 = 0
                THEN round(c_acctbal + 1000.0, 4)
                ELSE c_acctbal END AS c_acctbal
    FROM customer
)
SELECT c_mktsegment,
       count(*) AS n_customers,
       CAST(sum(CAST(round(c_acctbal, 4) AS DECIMAL(18,2))) AS DOUBLE) AS sum_balance
FROM upserted
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def snapshot_changes_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC tier (round 5): ``snapshot_diff`` — the change feed between
    two versions of a snapshot table, the engine-neutral analogue of
    Delta/Iceberg CDF. Three versions are published: customer (v1); a
    keyed upsert of modified balances (+1000 for custkey%10==0) plus
    genuinely new rows (custkey+2e6 clones of the %100==0 slice) (v2);
    and a delete of the custkey%100==50 slice (v3). ``snapshot_diff(v1
    -> current)`` must classify every row as exactly one of
    insert/update/delete — updates carrying the NEW balance, deletes
    the OLD — which the oracle recomputes from the raw customer table
    with the same CASE arithmetic. One full-outer join on the key; the
    value comparison is a single struct eqNullSafe."""
    from neulix_datahub_spark.sources.io import warehouse_scratch
    from neulix_datahub_spark.sources.snapshots import (
        read_snapshot_table,
        snapshot_diff,
        upsert_snapshot,
        write_snapshot,
    )

    root = warehouse_scratch(spark, "_neulix_snapdiff_")
    cust = _t(spark, sf_dir, "customer")
    v1 = write_snapshot(cust, root)
    updates = cust.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") + 1000.0, 4)
    )
    inserts = cust.filter(F.col("c_custkey") % 100 == 0).withColumn(
        "c_custkey", F.col("c_custkey") + 2_000_000
    )
    upsert_snapshot(spark, root, updates.unionByName(inserts), key="c_custkey")
    write_snapshot(
        read_snapshot_table(spark, root).filter(F.col("c_custkey") % 100 != 50),
        root,
    )
    diff = snapshot_diff(spark, root, from_version=v1, key="c_custkey")
    return (
        diff.groupBy("_change_type")
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            F.sum(F.round(F.col("c_acctbal"), 4).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_balance"),
        )
        .orderBy("_change_type")
    )


SNAPSHOT_CHANGES_SQL = """
WITH ch AS (
    SELECT 'insert' AS _change_type, c_acctbal
    FROM customer WHERE c_custkey % 100 = 0
    UNION ALL
    SELECT 'delete', c_acctbal
    FROM customer WHERE c_custkey % 100 = 50
    UNION ALL
    SELECT 'update', round(c_acctbal + 1000.0, 4)
    FROM customer WHERE c_custkey % 10 = 0 AND c_custkey % 100 <> 50
)
SELECT _change_type,
       CAST(count(*) AS BIGINT) AS n_changes,
       CAST(sum(CAST(round(c_acctbal, 4) AS DECIMAL(18,2))) AS DOUBLE) AS sum_balance
FROM ch
GROUP BY _change_type
ORDER BY _change_type
"""


def quality_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint tier (round 5, operators/quality.py): the
    engine-side generalization of the reference's homologation flag
    checks (``sheets_core.py:86-92``) — declarative constraints, all
    row-level checks fused into ONE aggregation pass, uniqueness one
    distinct-count, referential integrity one anti-join. The fixture is
    clean, so the query PLANTS violations (the o_orderkey%1000==7 slice
    re-unioned with null custkey, negative total, bogus status —
    duplicating its keys): every check's violation count is then a
    non-trivial number the oracle recomputes from the same planted
    arithmetic, and two checks stay green to prove `passed` isn't
    hardwired false."""
    from neulix_datahub_spark.operators import quality as Q

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    bad = (
        orders.filter(F.col("o_orderkey") % 1000 == 7)
        .withColumn("o_custkey", F.lit(None).cast("long"))
        .withColumn("o_totalprice", F.lit(-1.0))
        .withColumn("o_orderstatus", F.lit("X"))
    )
    dirty = orders.unionByName(bad)
    checks = [
        *Q.not_null("o_orderkey", "o_custkey"),
        Q.unique("o_orderkey"),
        Q.in_range("o_totalprice", lo=0.0),
        Q.values_in("o_orderstatus", ["O", "F", "P"]),
        Q.matches("o_orderpriority", r"^[1-5]-[A-Z ]+$"),
        Q.foreign_key("o_custkey", cust, "c_custkey"),
    ]
    return Q.run_checks(dirty, checks)


# The oracle rebuilds the dirty table and recomputes every check's
# SEMANTICS from the data (not the planted arithmetic), so a green row
# proves the fused-agg counts, the distinct-count and the anti-join all
# mean what the constraint says.
QUALITY_REPORT_SQL = """
WITH dirty AS (
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    UNION ALL
    SELECT o_orderkey, NULL, 'X', -1.0, o_orderpriority
    FROM orders WHERE o_orderkey % 1000 = 7
),
t AS (SELECT count(*) AS total FROM dirty)
SELECT "check", violations = 0 AS passed,
       CAST(violations AS BIGINT) AS violations,
       CAST(t.total AS BIGINT) AS total_rows
FROM (
    SELECT 'not_null_o_orderkey' AS "check",
           (SELECT count(*) FROM dirty WHERE o_orderkey IS NULL) AS violations
    UNION ALL SELECT 'not_null_o_custkey',
           (SELECT count(*) FROM dirty WHERE o_custkey IS NULL)
    UNION ALL SELECT 'unique_o_orderkey',
           (SELECT count(*) - count(DISTINCT o_orderkey) FROM dirty)
    UNION ALL SELECT 'range_o_totalprice',
           (SELECT count(*) FROM dirty
            WHERE o_totalprice < 0 OR o_totalprice IS NULL)
    UNION ALL SELECT 'values_o_orderstatus',
           (SELECT count(*) FROM dirty
            WHERE o_orderstatus NOT IN ('O','F','P') OR o_orderstatus IS NULL)
    UNION ALL SELECT 'matches_o_orderpriority',
           (SELECT count(*) FROM dirty
            WHERE NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
               OR o_orderpriority IS NULL)
    UNION ALL SELECT 'fk_o_custkey',
           (SELECT count(*) FROM dirty d
            WHERE d.o_custkey IS NULL
               OR NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = d.o_custkey))
), t
ORDER BY "check"
"""


def fetch_hook_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2/IO22 driver-visible: the per-row fetch hook over a URL column,
    run through the REAL mapInPandas plumbing (Arrow batches, output
    schema suffix) with the injectable deterministic fetcher — the
    driver gate has no network, and determinism is the point: the stub
    derives title/content from sha256(url), which the DuckDB oracle
    replays bit-for-bit. Swapping in http_fetch/selenium_fetch changes
    the injected callable only."""
    from neulix_datahub_spark.sources.web import fetch_url_column

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    urls = docs.select(
        "doc_id",
        F.concat(F.lit("https://example.com/doc/"), F.col("doc_id")).alias("url"),
    )
    return fetch_url_column(urls).select(
        "doc_id", "status", "title", "content_sha256", "n_bytes"
    )


FETCH_HOOK_SQL = """
SELECT doc_id,
       200 AS status,
       'title:' || substr(sha256('https://example.com/doc/' || CAST(doc_id AS VARCHAR)), 1, 12) AS title,
       sha256(sha256('https://example.com/doc/' || CAST(doc_id AS VARCHAR))) AS content_sha256,
       CAST(64 AS BIGINT) AS n_bytes
FROM documents
WHERE doc_id % 25 = 0
"""


_CRAWL_DEPTH = 3


def crawl_frontier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IO22/EP1 crawl tier: the distributed BFS frontier
    (sources/web.py crawl_frontier — parallel fetch, link extraction
    with relative-href resolution, exactly-once URL dedup via per-round
    anti-join, breadth-first depth labels) over the deterministic
    binary-tree site (stub_site_fetch: /page/N links to 2N, 2N+1). The
    reachable set is a pure function of the seed, so the oracle replays
    it with a recursive CTE: per-depth page count, OK count, and the
    sum of crawled page ids (parsed back out of the REAL extracted
    titles) must all match exactly."""
    from neulix_datahub_spark.sources.web import crawl_frontier, stub_site_fetch

    pages = crawl_frontier(
        spark,
        ["http://site.test/page/1"],
        fetcher=stub_site_fetch,
        max_depth=_CRAWL_DEPTH,
    )
    return (
        pages.groupBy("depth")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.count_if(F.col("status") == 200).alias("n_ok"),
            F.sum(
                F.regexp_extract("title", r"Page (\d+)", 1).cast("long")
            ).alias("sum_page_ids"),
        )
        .orderBy("depth")
    )


_CRAWL_SQL = f"""
WITH RECURSIVE t AS (
    SELECT 1 AS n, 0 AS depth
    UNION ALL
    SELECT x.child, t.depth + 1
    FROM t CROSS JOIN LATERAL (
        SELECT unnest([t.n * 2, t.n * 2 + 1]) AS child
    ) x
    WHERE t.depth < {_CRAWL_DEPTH} AND x.child <= 500
)
SELECT depth,
       count(*) AS n_pages,
       count(*) AS n_ok,
       CAST(sum(n) AS BIGINT) AS sum_page_ids
FROM t
GROUP BY depth
ORDER BY depth
"""


def text_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IO7 driver-visible: document texts → text-file sink → text scan →
    aggregate. Text files split records on newlines, so the write
    projects to one newline-free string column (the IO7 contract); the
    oracle recomputes the aggregate from the parquet table."""
    import tempfile

    from neulix_datahub_spark.sources.io import read_text, write_text

    tmp = tempfile.mkdtemp(prefix="neulix_text_rt_")
    lines = load_table(spark, sf_dir, "documents").select(
        F.regexp_replace("text", r"[\r\n]+", " ").alias("value")
    )
    write_text(lines, f"{tmp}/docs_txt")
    back = read_text(spark, f"{tmp}/docs_txt")
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.min(F.length("value")).alias("min_chars"),
        F.max(F.length("value")).alias("max_chars"),
    )


TEXT_ROUNDTRIP_SQL = r"""
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(len(regexp_replace(text, '[\r\n]+', ' ', 'g'))) AS BIGINT) AS total_chars,
       CAST(min(len(regexp_replace(text, '[\r\n]+', ' ', 'g'))) AS BIGINT) AS min_chars,
       CAST(max(len(regexp_replace(text, '[\r\n]+', ' ', 'g'))) AS BIGINT) AS max_chars
FROM documents
"""


def task_exchange_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IO24 + IO20/IO21 + F7 driver-visible: a two-task pipeline
    exchanging a PATH manifest, never data (the 100 TB orchestration
    rule — Airflow XCom carries the parquet location). Task 1 derives a
    messy SIM/NAO flag column from orders and writes it through
    task_output; task 2 reads it back via task_input, runs the
    ONE_OF_LIST validation (check_allowed_values) and the messy-boolean
    parse (flag_columns), and aggregates. The oracle recomputes the
    aggregate straight from orders, proving the exchange + validation +
    parse round-trip."""
    import tempfile

    from neulix_datahub_spark.sources.adapters import (
        check_allowed_values,
        flag_columns,
        task_input,
        task_output,
    )

    tmp = tempfile.mkdtemp(prefix="neulix_xchg_")
    stage1 = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "SIM").otherwise("NAO").alias("Homologado"),
    )
    manifest = task_output(stage1, f"{tmp}/stage1")

    stage2 = task_input(spark, manifest)
    assert check_allowed_values(stage2, "Homologado", allowed=("SIM", "NAO"))
    flagged = flag_columns(stage2, {"is_approved": "homologado"})
    return flagged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("is_approved").cast("bigint")).alias("n_approved"),
    )


TASK_EXCHANGE_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_approved
FROM orders
"""


def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted JOIN, driver-visible (operators/skew.py salted_join —
    the manual remedy when one join key dominates and the right side is
    too big to broadcast but small enough to replicate salt times; AQE's
    skew split covers most cases, this is the explicit form). The salt
    only routes rows, so the result must equal a plain join — which is
    exactly what the oracle computes."""
    from neulix_datahub_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        salted_join(li, orders, on=["o_orderkey"], salt=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            revenue_sum("l_extendedprice", "l_discount").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


SALTED_JOIN_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST('1.00' AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def grid_dedupe_append_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IO18/IO19 + F1/F2 + J1 driver-visible: the reference's Sheets
    homologation composite end-to-end. A driver-side grid (header row +
    the 10 lowest-key customers, with a deliberately messy header
    ' C_CustKey ' the case-insensitive resolver must match) plays the
    existing sheet; the 30 lowest-key customers stream in; the composite
    anti-joins, projects to the grid header and appends through the
    injected writer. The appended batch goes back through
    grid_to_dataframe and is aggregated; the oracle derives ranks 11-30
    independently. Grid contents are driver-side lists — bounded by
    construction, exactly like the Sheets API they model."""
    from neulix_datahub_spark.sources.adapters import (
        dedupe_append_to_grid,
        grid_to_dataframe,
    )

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    header = [" C_CustKey ", "c_name"]
    top10 = cust.orderBy("c_custkey").limit(10).collect()
    existing_rows = [header] + [[str(r.c_custkey), r.c_name] for r in top10]
    incoming = cust.orderBy("c_custkey").limit(30)

    appended: list[list[str]] = []

    def append(batch: list[list[str]]) -> int:
        appended.extend(batch)
        return len(batch)

    dedupe_append_to_grid(existing_rows, incoming, "c_custkey", append)
    back = grid_to_dataframe(spark, [header] + appended)
    return back.agg(
        F.count(F.lit(1)).alias("n_appended"),
        F.min(F.col(" C_CustKey ").cast("bigint")).alias("min_key"),
        F.max(F.col(" C_CustKey ").cast("bigint")).alias("max_key"),
    )


GRID_DEDUPE_SQL = """
WITH ranked AS (
    SELECT c_custkey, row_number() OVER (ORDER BY c_custkey) AS rn
    FROM customer
)
SELECT CAST(count(*) AS BIGINT) AS n_appended,
       CAST(min(c_custkey) AS BIGINT) AS min_key,
       CAST(max(c_custkey) AS BIGINT) AS max_key
FROM ranked
WHERE rn BETWEEN 11 AND 30
"""


def bucketed_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located bucketed join, driver-visible (SCALE.md layout
    strategy): write orders and lineitem bucketed by the join key with
    the same bucket count, join the bucketed tables — Catalyst plans the
    join with NO Exchange (asserted in tests/test_io.py; the shuffle is
    paid once at layout time, the 100 TB recipe for fact-fact joins) —
    and aggregate revenue per order priority. The oracle recomputes the
    aggregate from the raw tables, proving the bucketed layout
    round-trips every row."""
    import uuid

    from neulix_datahub_spark.sources.bucketing import bucketed_join, write_bucketed

    run = uuid.uuid4().hex[:8]
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice", "l_discount"
    )
    write_bucketed(orders, f"b_orders_{run}", ["o_orderkey"], 16)
    write_bucketed(li, f"b_lineitem_{run}", ["o_orderkey"], 16)
    return (
        bucketed_join(spark, f"b_orders_{run}", f"b_lineitem_{run}", on=["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            revenue_sum("l_extendedprice", "l_discount").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


BUCKETED_REVENUE_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST('1.00' AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def delegated_sql_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP2 (db_core.py:119-135): arbitrary SQL over the registered catalog
    — parse/optimize/execute entirely inside Catalyst, no translation."""
    register_tables(spark, sf_dir, ("part",))
    return spark.sql(DELEGATED_SQL)


# Spark's recursive-CTE surface (Spark 4): same shape as the DuckDB
# oracle below, differing only in the integer-division spelling
# (`DIV` vs `//`). The synthetic parent edge is key DIV 10 — a
# deterministic tree over the real customer table, the org-chart /
# bill-of-materials workload the delegated-SQL surface (IO8) must
# support now that warehouses run WITH RECURSIVE.
_HIERARCHY_SPARK_SQL = """
WITH RECURSIVE chain AS (
    SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth FROM customer
    UNION ALL
    SELECT node, cur DIV 10 AS cur, depth + 1 AS depth FROM chain WHERE cur > 0
),
depths AS (SELECT node, max(depth) AS depth FROM chain GROUP BY node)
SELECT depth,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM depths d JOIN customer c ON c.c_custkey = d.node
GROUP BY depth
ORDER BY depth
"""


def customer_hierarchy_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IO8 breadth (round 5): native ``WITH RECURSIVE`` through
    ``spark.sql`` — each customer walks a deterministic parent chain
    (key DIV 10) to the root; per-depth member counts and balance
    rollups. Recursion depth is O(log10 max key) (≤ 7 at sf1), far
    under Spark's recursion-level limit; each recursion step is one
    narrow projection+filter, so the plan scales like a handful of
    scans, not like the closure of a general graph."""
    register_tables(spark, sf_dir, ("customer",))
    return spark.sql(_HIERARCHY_SPARK_SQL)


HIERARCHY_SQL = """
WITH RECURSIVE chain AS (
    SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth FROM customer
    UNION ALL
    SELECT node, cur // 10, depth + 1 FROM chain WHERE cur > 0
),
depths AS (SELECT node, max(depth) AS depth FROM chain GROUP BY node)
SELECT depth,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM depths d JOIN customer c ON c.c_custkey = d.node
GROUP BY depth
ORDER BY depth
"""


# ---------------------------------------------------------------------------
# TPC-H Q10 / Q14 analogues
# ---------------------------------------------------------------------------

def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: top-20 customers by revenue on returned items."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revenue_sum("l_extendedprice", "l_discount").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST('1.00' AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue share — conditional agg over a fact⋈dim join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_share_pct")
        )
    )


Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
"""


# ---------------------------------------------------------------------------
# S1 sliding-window batch parity
# ---------------------------------------------------------------------------

def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes — each event lands in two
    windows; same groupBy runs under readStream."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


SLIDING_SQL = """
WITH assigned AS (
    SELECT CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP) AS window_start,
           event_type
    FROM events
    UNION ALL
    SELECT CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800 - 1800) AS TIMESTAMP) AS window_start,
           event_type
    FROM events
)
SELECT window_start, event_type, count(*) AS n_events
FROM assigned
GROUP BY window_start, event_type
"""


# ---------------------------------------------------------------------------
# W2 analytic windows: lag + delta + running sum per user over event time.
# ---------------------------------------------------------------------------

def user_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: lag/delta/running-sum over (user, ts) — the full analytic
    window frame surface (ROWS UNBOUNDED PRECEDING). Deterministic
    ordering via the (ts, event_id) composite."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        F.round(F.lag("value").over(w), 4).alias("prev_value"),
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
        F.round(F.sum("value").over(frame), 4).alias("running_sum"),
    )


DELTAS_SQL = """
SELECT user_id, event_id,
       round(value, 4) AS value,
       round(lag(value) OVER w, 4) AS prev_value,
       round(value - lag(value) OVER w, 4) AS delta,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
           AS running_sum
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------------------------------
# Skew-salted aggregation — must equal the plain GROUP BY (the salt only
# routes rows), so the plain SQL is its oracle.
# ---------------------------------------------------------------------------

def salted_flag_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the (skew-prone, low-cardinality)
    returnflag key; identical result to the direct groupBy by
    construction."""
    from neulix_datahub_spark.operators.skew import salted_aggregate

    li = _t(spark, sf_dir, "lineitem")
    out = salted_aggregate(
        li,
        ["l_returnflag"],
        {
            "n_items": (F.count(F.lit(1)), "sum"),
            "sum_qty": (F.sum("l_quantity"), "sum"),
            "max_price": (F.max("l_extendedprice"), "max"),
        },
        salt=8,
    )
    return out.select(
        "l_returnflag",
        "n_items",
        F.round("sum_qty", 4).alias("sum_qty"),
        F.round("max_price", 4).alias("max_price"),
    )


SALTED_SQL = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l_quantity), 4) AS sum_qty,
       round(max(l_extendedprice), 4) AS max_price
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# As-of join: each event sees the latest hourly snapshot published at or
# before its timestamp (snapshots publish at hour END, so events join to
# the previous hour's aggregate). DuckDB's native ASOF JOIN is the oracle.
# ---------------------------------------------------------------------------

def events_asof_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neulix_datahub_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    snaps = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 30)
        .groupBy("user_id", F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("snap_n"))
        .select(
            "user_id",
            F.col("w.end").alias("ts"),
            F.col("w.end").alias("snap_ts"),
            "snap_n",
        )
    )
    left = ev.select("user_id", "event_id", "ts")
    return asof_join(left, snaps, on="ts", by="user_id")


ASOF_SQL = """
WITH snaps AS (
    SELECT user_id,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS snap_ts,
           CAST(count(*) AS BIGINT) AS snap_n
    FROM events
    WHERE user_id < 30
    GROUP BY user_id, date_trunc('hour', ts)
)
SELECT e.user_id, e.event_id, e.ts, s.snap_ts, s.snap_n
FROM (SELECT user_id, event_id, ts FROM events WHERE user_id < 30) e
ASOF LEFT JOIN snaps s
  ON e.user_id = s.user_id AND e.ts >= s.snap_ts
"""


# ---------------------------------------------------------------------------
# Range (interval) join: orders priced into value bands via the binned
# equi-join form; oracle is the plain BETWEEN join.
# ---------------------------------------------------------------------------

def orders_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neulix_datahub_spark.operators.asof import range_join

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    bands = local_relation(
        spark,
        [(0.0, 50_000.0, "low"), (50_000.0, 150_000.0, "mid"),
         (150_000.0, 1e9, "high")],
        "lo double, hi double, band string",
    )
    joined = range_join(
        orders, bands, point="o_totalprice", start="lo", end="hi",
        bin_width=50_000,
    )
    return (
        joined.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("total_value"),
        )
        .orderBy("band")
    )


PRICE_BANDS_SQL = """
SELECT band, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders
JOIN (VALUES (0.0, 50000.0, 'low'), (50000.0, 150000.0, 'mid'),
             (150000.0, 1e9, 'high')) AS bands(lo, hi, band)
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
ORDER BY band
"""


# ---------------------------------------------------------------------------
# Round-2 additions: driver-visible forms of previously unit-only
# operators (SC4 coercing parse, SC8 JSON serialize, F2 column resolver,
# J3 positional alignment, U1 synthetic-data constraints).
# ---------------------------------------------------------------------------

def coerced_timestamps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SC4 driver-visible: a deterministically 'messy' string column
    (every 7th order corrupted) pushed through the coercing parse
    (``try_timestamp`` — invalid → NULL, the reference's
    pd.to_datetime(errors='coerce'), ``db_core.py:52``), then aggregated
    so the oracle checks both the parse and the null-coercion counts."""
    from neulix_datahub_spark.functions.cleaning import try_timestamp

    orders = _t(spark, sf_dir, "orders")
    messy = F.when(
        F.col("o_orderkey") % 7 == 0, F.lit("not-a-date")
    ).otherwise(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
    parsed = orders.select(
        "o_orderstatus", try_timestamp(messy).alias("__ts")
    )
    return (
        parsed.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("__ts").alias("n_parsed"),
            F.date_format(F.min("__ts"), "yyyy-MM-dd").alias("min_day"),
            F.date_format(F.max("__ts"), "yyyy-MM-dd").alias("max_day"),
        )
        .orderBy("o_orderstatus")
    )


COERCED_TS_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(ts) AS BIGINT) AS n_parsed,
       strftime(min(ts), '%Y-%m-%d') AS min_day,
       strftime(max(ts), '%Y-%m-%d') AS max_day
FROM (
    SELECT o_orderstatus,
           TRY_CAST(CASE WHEN o_orderkey % 7 = 0 THEN 'not-a-date'
                         ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
                    END AS TIMESTAMP) AS ts
    FROM orders
)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def json_serialized_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SC8 driver-visible: row → JSON document (``to_json(struct(...))``),
    hash-compared byte-for-byte against DuckDB's serializer (both emit
    compact key:value form; payload restricted to int/string/date — float
    repr differs between engines and belongs in SC7's parse direction)."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    return orders.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                "o_orderkey",
                "o_orderstatus",
                # pre-format: engines disagree on raw-timestamp JSON text
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderday"),
            )
        ).alias("doc"),
    ).orderBy("o_orderkey")


JSON_SERIALIZE_SQL = """
SELECT o_orderkey,
       to_json({'o_orderkey': o_orderkey,
                'o_orderstatus': o_orderstatus,
                'o_orderday': strftime(o_orderdate, '%Y-%m-%d')}) AS doc
FROM orders
WHERE o_orderkey % 50 = 0
ORDER BY o_orderkey
"""


def resolved_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 driver-visible: case-insensitive + substring column resolution
    (``find_col``, reference ``sheets_core.py:55-66``) actually driving a
    projection — 'O_TOTALPRICE' resolves exact-insensitively,
    'orderpri' by substring; the oracle pins what they resolved to."""
    from neulix_datahub_spark.functions.cleaning import find_col

    orders = _t(spark, sf_dir, "orders")
    price = find_col(orders, "O_TOTALPRICE")
    prio = find_col(orders, "orderpri")
    return orders.select(
        "o_orderkey",
        F.col(price).alias("resolved_price"),
        F.col(prio).alias("resolved_priority"),
    ).orderBy("o_orderkey")


RESOLVED_SQL = """
SELECT o_orderkey,
       o_totalprice AS resolved_price,
       o_orderpriority AS resolved_priority
FROM orders
ORDER BY o_orderkey
"""


def positional_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 driver-visible: the reference's positional zip (synthetic row i
    inherits original row i's frozen columns, ``data_core.py:163-166``) as
    an explicit row_number alignment join — i-th customer by key paired
    with i-th order by key. Sort keys are unique, so the alignment is
    deterministic at any parallelism. Positions come from the TWO-PHASE
    rank (operators/sequence.py with_sorted_rank) — no single-partition
    global window, so the alignment holds at any row count; the join on
    position is then an ordinary shuffle equi-join."""
    from neulix_datahub_spark.operators.sequence import with_sorted_rank

    cust = with_sorted_rank(
        _t(spark, sf_dir, "customer").select("c_custkey", "c_name"),
        ["c_custkey"],
        "__rn",
    )
    orders = with_sorted_rank(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        ["o_orderkey"],
        "__rn",
    )
    return (
        cust.join(orders, "__rn")
        .select(
            F.col("__rn").alias("pos"),
            "c_custkey", "c_name", "o_orderkey", "o_totalprice",
        )
        .orderBy("pos")
    )


ALIGN_SQL = """
SELECT c.rn AS pos, c_custkey, c_name, o_orderkey, o_totalprice
FROM (SELECT c_custkey, c_name,
             row_number() OVER (ORDER BY c_custkey) AS rn FROM customer) c
JOIN (SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_orderkey) AS rn FROM orders) o
  ON c.rn = o.rn
ORDER BY pos
"""


def synth_constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 driver-visible: the synthetic-data generator's *contract*,
    checked as one row of invariants the oracle can pin as constants —
    the sampled values themselves are seeded-random (not portable), but
    the constraints are exact: requested row count, id continuation from
    max(source)+1 with contiguous unique ids (W1), bootstrap values drawn
    from the source domain, frozen columns preserved positionally (J3)."""
    from neulix_datahub_spark.operators.synth import generate_synthetic_data

    src = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    n_req = 500
    synth = generate_synthetic_data(
        src, n_req, mutable_columns=["c_acctbal", "c_mktsegment"],
        id_column="c_custkey",
    )
    bounds = src.agg(
        F.max("c_custkey").alias("max_id"),
        F.min("c_acctbal").alias("lo"),
        F.max("c_acctbal").alias("hi"),
        F.collect_set("c_mktsegment").alias("segs"),
        F.collect_set("c_name").alias("names"),
    )
    return synth.join(F.broadcast(bounds)).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count_distinct("c_custkey") == n_req).alias("ids_unique"),
        (
            (F.min("c_custkey") == F.first("max_id") + 1)
            & (F.max("c_custkey") == F.first("max_id") + n_req)
        ).alias("ids_contiguous_from_max"),
        F.every(
            F.col("c_acctbal").between(F.col("lo"), F.col("hi"))
        ).alias("acctbal_in_domain"),
        F.every(
            F.array_contains("segs", F.col("c_mktsegment"))
        ).alias("segments_in_domain"),
        F.every(F.array_contains("names", F.col("c_name"))).alias(
            "frozen_names_preserved"
        ),
    )


SYNTH_CHECK_SQL = """
SELECT CAST(500 AS BIGINT) AS n_rows,
       TRUE AS ids_unique,
       TRUE AS ids_contiguous_from_max,
       TRUE AS acctbal_in_domain,
       TRUE AS segments_in_domain,
       TRUE AS frozen_names_preserved
"""


def lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 extension (round 5): Pearson correlation matrix over the four
    lineitem measures in ONE aggregation pass (all pairs share one scan
    and a 1-row reduce — operators/profile.py::correlation_matrix).
    The oracle recomputes every pair with DuckDB's corr(); both engines
    run numerically stable covariance updates, so 6-dp rounding
    absorbs the summation-order difference."""
    from neulix_datahub_spark.operators.profile import correlation_matrix

    li = _t(spark, sf_dir, "lineitem")
    return correlation_matrix(
        li, ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]
    )


_COLS_CORR = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]
LINEITEM_CORR_SQL = "\nUNION ALL\n".join(
    f"SELECT '{a}' AS col_a, '{b}' AS col_b, round(corr({a}, {b}), 6) AS corr FROM lineitem"
    for i, a in enumerate(_COLS_CORR)
    for b in _COLS_CORR[i:]
) + "\nORDER BY col_a, col_b"


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 extension (round 5): fixed-range equi-width histogram of
    o_totalprice — 20 buckets over [0, 600000], bucket assignment a
    pure expression so the whole thing is one scan + one shuffle on
    <=20 keys. The oracle replays the identical bucket arithmetic."""
    from neulix_datahub_spark.operators.profile import value_histogram

    return value_histogram(
        _t(spark, sf_dir, "orders"), "o_totalprice", bins=20, lo=0.0, hi=600_000.0
    )


PRICE_HISTOGRAM_SQL = """
SELECT bucket,
       round(bucket * 30000.0, 6) AS lo_edge,
       round((bucket + 1) * 30000.0, 6) AS hi_edge,
       CAST(count(*) AS BIGINT) AS cnt
FROM (
    SELECT least(19, CAST(floor(o_totalprice / 30000.0) AS INT)) AS bucket
    FROM orders
    WHERE o_totalprice IS NOT NULL AND o_totalprice >= 0 AND o_totalprice <= 600000
)
GROUP BY bucket
ORDER BY bucket
"""



def copurchased_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket tier (round 5): top-10 brand pairs co-occurring in
    the same order — the pairwise-co-occurrence aggregation every
    recommender feature pipeline runs. Plan: lineitem⋈part projects
    (order, brand), dedupes to distinct pairs per order (a brand bought
    twice in one order is one co-occurrence), self-joins within the
    order key (orders are small baskets, so the per-key pair blow-up is
    bounded by basket size — the with_pair_tasks cap exists for when it
    is not), counts pairs, takes an ordered top-10."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    l, r = ob.alias("l"), ob.alias("r")
    pairs = l.join(
        r,
        (F.col("l.l_orderkey") == F.col("r.l_orderkey"))
        & (F.col("l.p_brand") < F.col("r.p_brand")),
    )
    return (
        pairs.groupBy(
            F.col("l.p_brand").alias("brand_a"), F.col("r.p_brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "brand_a", "brand_b")
        .limit(10)
    )


COPURCHASED_SQL = """
WITH ob AS (
    SELECT DISTINCT l_orderkey, p_brand
    FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
       CAST(count(*) AS BIGINT) AS n_orders
FROM ob a JOIN ob b
  ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
GROUP BY 1, 2
ORDER BY n_orders DESC, brand_a, brand_b
LIMIT 10
"""


def customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 breadth (round 5): ntile(4) over account balance per market
    segment, aggregated per (segment, quartile) — the windowed
    bucketing HR/finance-style reports run. The window's ORDER BY
    carries the key tiebreak so tile boundaries are deterministic."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        cust.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 4).alias("min_bal"),
            F.round(F.max("c_acctbal"), 4).alias("max_bal"),
        )
        .orderBy("c_mktsegment", "quartile")
    )


QUARTILES_SQL = """
SELECT c_mktsegment, quartile,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(min(c_acctbal), 4) AS min_bal,
       round(max(c_acctbal), 4) AS max_bal
FROM (
    SELECT c_mktsegment, c_acctbal,
           ntile(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal, c_custkey) AS quartile
    FROM customer
)
GROUP BY 1, 2
ORDER BY c_mktsegment, quartile
"""



def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 tier (round 5, operators/scd.py): history-keeping
    dimension maintenance, the sibling of the Type 1 upsert the
    reference has. Bootstraps customer as the open first version
    (2024-01-01), applies TWO change batches — balances +1000 for
    custkey%10==0 at 2024-03-01 (a batch that also carries UNCHANGED
    %7==0 rows, which must no-op), then a segment move to 'MOVED' for
    %20==0 at 2024-06-01 — and aggregates the resulting version table
    per is_current. The oracle rebuilds the expected current/closed
    version sets with CASE arithmetic: every key one current row;
    %10==0 keys one closed v1; %20==0 keys additionally a closed v2
    carrying the +1000 balance but the ORIGINAL segment."""
    from neulix_datahub_spark.operators.scd import scd2_apply, scd2_init

    cust = _t(spark, sf_dir, "customer")
    attrs = ["c_mktsegment", "c_acctbal"]
    dim = scd2_init(
        cust.select("c_custkey", *attrs), "c_custkey", attrs, "2024-01-01"
    )
    b1 = cust.filter(
        (F.col("c_custkey") % 10 == 0) | (F.col("c_custkey") % 7 == 0)
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.when(
            F.col("c_custkey") % 10 == 0, F.round(F.col("c_acctbal") + 1000.0, 4)
        ).otherwise(F.col("c_acctbal")).alias("c_acctbal"),
        F.lit("2024-03-01").cast("date").alias("ts"),
    )
    dim = scd2_apply(dim, b1, "c_custkey", "ts", attrs)
    b2 = cust.filter(F.col("c_custkey") % 20 == 0).select(
        "c_custkey",
        F.lit("MOVED").alias("c_mktsegment"),
        F.round(F.col("c_acctbal") + 1000.0, 4).alias("c_acctbal"),
        F.lit("2024-06-01").cast("date").alias("ts"),
    )
    dim = scd2_apply(dim, b2, "c_custkey", "ts", attrs)
    return (
        dim.groupBy("is_current")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("c_custkey").alias("n_keys"),
            F.count_if(F.col("c_mktsegment") == "MOVED").alias("n_moved"),
            F.sum(F.round("c_acctbal", 4).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_bal"),
        )
        .orderBy("is_current")
    )


SCD2_SQL = """
WITH cur AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 20 = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg,
           CASE WHEN c_custkey % 10 = 0 THEN round(c_acctbal + 1000.0, 4)
                ELSE c_acctbal END AS bal
    FROM customer
),
closed AS (
    SELECT c_custkey, c_mktsegment AS seg, c_acctbal AS bal
    FROM customer WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT c_custkey, c_mktsegment, round(c_acctbal + 1000.0, 4)
    FROM customer WHERE c_custkey % 20 = 0
)
SELECT is_current, n_rows, n_keys, n_moved, sum_bal
FROM (
    SELECT TRUE AS is_current, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_keys,
           CAST(count(*) FILTER (seg = 'MOVED') AS BIGINT) AS n_moved,
           CAST(sum(CAST(round(bal, 4) AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM cur
    UNION ALL
    SELECT FALSE, CAST(count(*) AS BIGINT),
           CAST(count(DISTINCT c_custkey) AS BIGINT),
           CAST(count(*) FILTER (seg = 'MOVED') AS BIGINT),
           CAST(sum(CAST(round(bal, 4) AS DECIMAL(18,2))) AS DOUBLE)
    FROM closed
)
ORDER BY is_current
"""



def orders_at_dimension_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 point-in-time join (round 5): revenue attributed to the
    customer segment AS OF each order's date, against a three-era
    dimension history (bootstrap 1990-01-01; balance change for
    custkey%10==0 at 1997-01-01; segment move to 'MOVED' for %20==0 at
    1999-07-01 — the fixture's orders span 1995..2001, so all three
    eras receive orders). The interval predicate rides as a residual on
    the key hash join. The oracle resolves the same versioning with
    CASE logic on (custkey, o_orderdate) directly."""
    from neulix_datahub_spark.operators.scd import (
        scd2_apply,
        scd2_asof_join,
        scd2_init,
    )

    cust = _t(spark, sf_dir, "customer")
    attrs = ["c_mktsegment", "c_acctbal"]
    dim = scd2_init(
        cust.select("c_custkey", *attrs), "c_custkey", attrs, "1990-01-01"
    )
    b1 = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", "c_mktsegment",
        F.round(F.col("c_acctbal") + 1000.0, 4).alias("c_acctbal"),
        F.lit("1997-01-01").cast("date").alias("ts"),
    )
    dim = scd2_apply(dim, b1, "c_custkey", "ts", attrs)
    b2 = cust.filter(F.col("c_custkey") % 20 == 0).select(
        "c_custkey", F.lit("MOVED").alias("c_mktsegment"),
        F.round(F.col("c_acctbal") + 1000.0, 4).alias("c_acctbal"),
        F.lit("1999-07-01").cast("date").alias("ts"),
    )
    dim = scd2_apply(dim, b2, "c_custkey", "ts", attrs)
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderdate", "o_totalprice"
    )
    joined = scd2_asof_join(orders, dim, "c_custkey", "o_orderdate")
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


ORDERS_ASOF_SQL = """
SELECT seg AS c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM (
    SELECT CASE WHEN c.c_custkey % 20 = 0
                 AND CAST(o.o_orderdate AS DATE) >= DATE '1999-07-01'
                THEN 'MOVED' ELSE c.c_mktsegment END AS seg,
           o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
GROUP BY seg
ORDER BY seg
"""



def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 completion (round 5): explicit GROUPING SETS — the
    non-hierarchical multi-grain aggregate rollup/cube can't express
    ((status, priority), (status), (priority)) without also paying the
    grand total. Spark spells it via SQL on a registered temp view (the
    DataFrame API has rollup/cube only); grouping() flags distinguish
    real nulls from subtotal rows."""
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__gs_orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus) AS g_status,
               grouping(o_orderpriority) AS g_priority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority))
        ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
    """)


GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), (o_orderpriority))
ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
"""


def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 completion (round 5): UNPIVOT/melt — wide measures to long
    (measure, value) rows via the native unpivot (Expand node: one scan,
    no join, ×#measures fan-out), aggregated per (returnflag, measure)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").alias("extendedprice"),
        F.col("l_discount").alias("discount"),
    )
    long = li.unpivot(
        ["l_returnflag"], ["quantity", "extendedprice", "discount"],
        "measure", "value",
    )
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum("value").alias("sum_value"),
        )
        .orderBy("l_returnflag", "measure")
    )


UNPIVOT_SQL = """
SELECT l_returnflag, measure,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM (
    SELECT l_returnflag, 'quantity' AS measure,
           CAST(l_quantity AS DOUBLE) AS value FROM lineitem
    UNION ALL
    SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_returnflag, 'discount', l_discount FROM lineitem
)
GROUP BY 1, 2
ORDER BY l_returnflag, measure
"""



def robust_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust-stats tier (round 5): winsorized revenue + MAD outlier
    counts per order status — the heavy-tail treatment
    (operators/profile.py winsorize / mad_outlier_flag) every
    training-statistics pipeline applies before aggregating. The
    oracle recomputes the exact percentile bounds, the clamped sum,
    and the 6-dp-rounded modified z-scores from scratch."""
    from neulix_datahub_spark.operators.profile import (
        mad_outlier_flag,
        winsorize,
    )

    orders = _t(spark, sf_dir, "orders")
    w = winsorize(orders, "o_totalprice", 0.05, 0.95, out_col="price_w")
    flagged = mad_outlier_flag(w, "o_totalprice")
    # Decompose the winsorized sum into exact pieces: unclamped rows
    # are 2-dp money (decimal sum, exact); clamped rows all equal one
    # of the two percentile bounds, so their contribution is count ×
    # bound — ONE multiplication instead of n float additions. A plain
    # round(sum(price_w), 4) at ~1e9 magnitude rides on partial-agg
    # association; this derivation is a three-term sum both engines
    # evaluate identically.
    unclamped = F.col("price_w") == F.col("o_totalprice")
    lo_cl = F.col("price_w") > F.col("o_totalprice")
    hi_cl = F.col("price_w") < F.col("o_totalprice")
    return (
        flagged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.coalesce(
                F.sum(
                    F.when(unclamped, F.col("o_totalprice").cast("decimal(18,2)"))
                ).cast("double"),
                F.lit(0.0),
            ).alias("__mid"),
            F.count_if(lo_cl).alias("__n_lo"),
            F.count_if(hi_cl).alias("__n_hi"),
            F.coalesce(F.max(F.when(lo_cl, F.col("price_w"))), F.lit(0.0)).alias("__lo"),
            F.coalesce(F.max(F.when(hi_cl, F.col("price_w"))), F.lit(0.0)).alias("__hi"),
            F.count_if(F.col("is_outlier")).alias("n_outliers"),
        )
        .select(
            "o_orderstatus",
            "n_orders",
            (
                F.col("__mid")
                + F.col("__n_lo") * F.col("__lo")
                + F.col("__n_hi") * F.col("__hi")
            ).alias("sum_winsorized"),
            "n_outliers",
        )
        .orderBy("o_orderstatus")
    )


ROBUST_PRICE_SQL = """
WITH b AS (
    SELECT quantile_cont(o_totalprice, 0.05) AS lo,
           quantile_cont(o_totalprice, 0.95) AS hi,
           quantile_cont(o_totalprice, 0.5) AS med
    FROM orders
),
d AS (
    SELECT quantile_cont(abs(o_totalprice - b.med), 0.5) AS mad
    FROM orders, b
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       coalesce(CAST(sum(CASE WHEN o_totalprice >= b.lo AND o_totalprice <= b.hi
                              THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                     AS DOUBLE), 0.0)
         + count(*) FILTER (o_totalprice < b.lo) * coalesce(max(CASE
               WHEN o_totalprice < b.lo THEN b.lo END), 0.0)
         + count(*) FILTER (o_totalprice > b.hi) * coalesce(max(CASE
               WHEN o_totalprice > b.hi THEN b.hi END), 0.0)
           AS sum_winsorized,
       CAST(count(*) FILTER (
            round(abs(0.6745 * (o_totalprice - b.med) / d.mad), 6) > 3.5
       ) AS BIGINT) AS n_outliers
FROM orders, b, d
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""



def price_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift monitoring (round 5): population stability index of the
    order-price distribution between the 1995–1997 era (reference) and
    1998+ (current), over the shared 20-bucket [0, 600k] grid — the
    check a training pipeline runs before mixing eras. Two histogram
    scans, a ≤20-row join, one reduce; the oracle recomputes the
    clamped-proportion PSI arithmetic exactly."""
    from neulix_datahub_spark.operators.profile import (
        population_stability_index,
    )

    orders = _t(spark, sf_dir, "orders")
    ref = orders.filter(F.year("o_orderdate") <= 1997)
    cur = orders.filter(F.year("o_orderdate") >= 1998)
    return population_stability_index(
        ref, cur, "o_totalprice", bins=20, lo=0.0, hi=600_000.0
    )


PRICE_DRIFT_SQL = """
WITH b AS (
    SELECT least(19, CAST(floor(o_totalprice / 30000.0) AS INT)) AS bucket,
           CASE WHEN year(o_orderdate) <= 1997 THEN 1 ELSE 0 END AS is_ref
    FROM orders
    WHERE o_totalprice IS NOT NULL AND o_totalprice >= 0 AND o_totalprice <= 600000
),
h AS (
    SELECT bucket,
           sum(is_ref) AS r, sum(1 - is_ref) AS c
    FROM b GROUP BY bucket
),
t AS (SELECT sum(r)::DOUBLE AS nr, sum(c)::DOUBLE AS nc FROM h)
SELECT round(sum((p - q) * ln(p / q)), 6) AS psi,
       CAST(t.nr AS BIGINT) AS n_ref,
       CAST(t.nc AS BIGINT) AS n_cur
FROM (
    SELECT greatest(h.r / t.nr, 1e-6) AS p,
           greatest(h.c / t.nc, 1e-6) AS q
    FROM h, t
), t
GROUP BY t.nr, t.nc
"""



def python_datasource_stats(spark, sf_dir: str):
    """IO25 (round 9): Spark 4 Python Data Source API — a custom
    partition-parallel source (sources/pysource.py) whose every byte is
    a pure function of the row id. The scan runs one executor task per
    declared partition; the per-shard aggregate (counts, id range, a
    decimal-exact md5 content checksum) must equal the oracle's
    generate_series re-derivation — proving the custom source delivers
    every row exactly once across partitions with no duplication, loss,
    or partition-boundary drift at any parallelism."""
    from pyspark.sql import functions as F

    from neulix_datahub_spark.sources.pysource import register_sources

    register_sources(spark)
    df = (
        spark.read.format("neulix_synthetic_corpus")
        .option("rows", "1200")
        .option("shards", "8")
        .load()
    )
    key = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("decimal(38,0)")
    return (
        df.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
            F.sum(key).cast("decimal(38,0)").cast("string").alias("checksum"),
        )
        .orderBy("shard")
    )


PYSOURCE_SQL = """
WITH gen AS (
    SELECT i AS doc_id,
           CAST(CAST('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 4) AS BIGINT) % 8
                AS INT) AS shard,
           'doc ' || CAST(i AS VARCHAR) || ' body '
               || substr(md5(CAST(i AS VARCHAR)), 1, 16) AS text
    FROM generate_series(0, 1199) AS t(i)
)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS min_id,
       CAST(max(doc_id) AS BIGINT) AS max_id,
       CAST(CAST(sum(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT))
                 AS DECIMAL(38,0)) AS VARCHAR) AS checksum
FROM gen
GROUP BY shard
ORDER BY shard
"""


EXT_QUERIES = {
    "python_datasource_stats": (
        python_datasource_stats,
        PYSOURCE_SQL,
        "IO25: Spark 4 Python Data Source API, exactly-once per-partition delivery hash-checked",
    ),
    "coerced_timestamps": (coerced_timestamps, COERCED_TS_SQL, "SC4 coercing parse"),
    "json_serialized_orders": (json_serialized_orders, JSON_SERIALIZE_SQL, "SC8 JSON serialize"),
    "resolved_projection": (resolved_projection, RESOLVED_SQL, "F2 column resolver"),
    "positional_alignment": (positional_alignment, ALIGN_SQL, "J3 positional zip"),
    "synth_constraint_check": (synth_constraint_check, SYNTH_CHECK_SQL, "U1 synth contract"),
    "events_asof_snapshots": (events_asof_snapshots, ASOF_SQL, "as-of join"),
    "orders_price_bands": (orders_price_bands, PRICE_BANDS_SQL, "binned range join"),
    "user_event_deltas": (user_event_deltas, DELTAS_SQL, "W2 lag/running frame"),
    "salted_flag_revenue": (salted_flag_revenue, SALTED_SQL, "skew-salted agg"),
    "describe_lineitem": (describe_lineitem, DESCRIBE_SQL, "A1 summary stats"),
    "pivot_event_values": (pivot_event_values, PIVOT_SQL, "A7 pivot"),
    "cube_order_status": (cube_order_status, CUBE_SQL, "A7 cube"),
    "fill_nulls_events": (fill_nulls_events, FILL_NULLS_SQL, "F6"),
    "header_projection": (header_projection, HEADER_SQL, "F1"),
    "sanitized_projection": (sanitized_projection, SANITIZED_SQL, "F3"),
    "stats_by_returnflag": (stats_by_returnflag, STATS_SQL, "SC10"),
    "delegated_sql_query": (delegated_sql_query, DELEGATED_SQL, "IO8/EP2"),
    "customer_hierarchy_depths": (
        customer_hierarchy_depths,
        HIERARCHY_SQL,
        "IO8 breadth: native WITH RECURSIVE hierarchy rollup",
    ),
    "catalog_commit_stats": (
        catalog_commit_stats,
        CATALOG_COMMIT_SQL,
        "atomic multi-table commit + carry-forward + consistent read",
    ),
    "bucketed_revenue_by_priority": (
        bucketed_revenue_by_priority,
        BUCKETED_REVENUE_SQL,
        "co-located bucketed fact-fact join (Exchange-free plan)",
    ),
    "return_rate_by_brand": (
        return_rate_by_brand,
        RETURN_RATE_SQL,
        "per-brand return rate and returned value",
    ),
    "discount_by_quantity_band": (
        discount_by_quantity_band,
        DISCOUNT_BAND_SQL,
        "volume-discount curve per 10-unit quantity band",
    ),
    "monthly_seasonality_index": (
        monthly_seasonality_index,
        SEASONALITY_SQL,
        "month-of-year revenue seasonality vs uniform expectation",
    ),
    "customer_tenure_profile": (
        customer_tenure_profile,
        TENURE_SQL,
        "customer lifetime-span histogram with order intensity",
    ),
    "ship_delay_by_priority": (
        ship_delay_by_priority,
        SHIP_DELAY_SQL,
        "fulfilment lead time per priority (avg/median/max days)",
    ),
    "basket_size_distribution": (
        basket_size_distribution,
        BASKET_SQL,
        "items-per-order histogram with percentage shares",
    ),
    "revenue_concentration": (
        revenue_concentration,
        CONCENTRATION_SQL,
        "Pareto shares + exact Gini over per-customer spend",
    ),
    "price_quartiles_by_priority": (
        price_quartiles_by_priority,
        PRICE_QUARTILES_SQL,
        "A1: grouped exact percentiles (p25/median/p75 + IQR)",
    ),
    "load_behaviors_stats": (
        load_behaviors_stats,
        LOAD_BEHAVIORS_SQL,
        "IO10/IO11/IO16: replace/append/empty-guard state machine + codecs",
    ),
    "csv_roundtrip_stats": (
        csv_roundtrip_stats,
        CSV_ROUNDTRIP_SQL,
        "IO3/IO4/IO5 CSV sink + sniffed scan round-trip",
    ),
    "json_roundtrip_stats": (
        json_roundtrip_stats,
        JSON_ROUNDTRIP_SQL,
        "IO6 JSON sink + scan round-trip",
    ),
    "update_rewrite_stats": (
        update_rewrite_stats,
        UPDATE_REWRITE_SQL,
        "IO9 UPDATE rewrite (read -> conditional replace -> swap)",
    ),
    "bulk_manifest_stats": (
        bulk_manifest_stats,
        BULK_MANIFEST_SQL,
        "IO10/IO12 manifest bulk load",
    ),
    "grid_dedupe_append_stats": (
        grid_dedupe_append_stats,
        GRID_DEDUPE_SQL,
        "IO18/IO19+F1/F2+J1 Sheets homologation composite",
    ),
    "salted_join_revenue": (
        salted_join_revenue,
        SALTED_JOIN_SQL,
        "skew-salted join == plain join (routing-only salt)",
    ),
    "task_exchange_stats": (
        task_exchange_stats,
        TASK_EXCHANGE_SQL,
        "IO24+IO20/IO21+F7 path-not-data task exchange w/ validation",
    ),
    "fetch_hook_profile": (
        fetch_hook_profile,
        FETCH_HOOK_SQL,
        "U2/IO22 per-row fetch hook (oracle replays the stub fetcher)",
    ),
    "crawl_frontier_stats": (
        crawl_frontier_stats,
        _CRAWL_SQL,
        "IO22/EP1 BFS crawl frontier vs recursive-CTE reachability oracle",
    ),
    "text_roundtrip_stats": (
        text_roundtrip_stats,
        TEXT_ROUNDTRIP_SQL,
        "IO7 text sink + scan round-trip",
    ),
    "doc_store_upsert_stats": (
        doc_store_upsert_stats,
        DOC_STORE_UPSERT_SQL,
        "IO14 batched document upsert sink (file-backed client)",
    ),
    "snapshot_upsert_stats": (
        snapshot_upsert_stats,
        SNAPSHOT_UPSERT_SQL,
        "IO9/J2 versioned snapshot table: atomic pointer publish + upsert",
    ),
    "partitioned_events_stats": (
        partitioned_events_stats,
        PARTITIONED_EVENTS_SQL,
        "IO2 date-partitioned layout: directory-pruned scan round-trip",
    ),
    "orc_roundtrip_stats": (
        orc_roundtrip_stats,
        ORC_ROUNDTRIP_SQL,
        "IO1/IO2 sibling: native ORC sink + scan round-trip",
    ),
    "snapshot_changes_stats": (
        snapshot_changes_stats,
        SNAPSHOT_CHANGES_SQL,
        "CDC: snapshot_diff change feed (insert/update/delete) across versions",
    ),
    "quality_report_orders": (
        quality_report_orders,
        QUALITY_REPORT_SQL,
        "declarative data-quality constraints (fused single-pass checks)",
    ),
    "lineitem_correlations": (
        lineitem_correlations,
        LINEITEM_CORR_SQL,
        "A1: one-pass Pearson correlation matrix (long form)",
    ),
    "price_histogram": (
        price_histogram,
        PRICE_HISTOGRAM_SQL,
        "A1: one-pass fixed-range equi-width histogram",
    ),
    "copurchased_brand_pairs": (
        copurchased_brand_pairs,
        COPURCHASED_SQL,
        "market-basket pairwise co-occurrence, bounded-basket self-join",
    ),
    "customer_balance_quartiles": (
        customer_balance_quartiles,
        QUARTILES_SQL,
        "W2: ntile windowed bucketing per segment",
    ),
    "scd2_customer_history": (
        scd2_customer_history,
        SCD2_SQL,
        "SCD Type 2 dimension maintenance across two change batches",
    ),
    "orders_at_dimension_time": (
        orders_at_dimension_time,
        ORDERS_ASOF_SQL,
        "SCD2 point-in-time (as-of) join: segment as of order date",
    ),
    "grouping_sets_revenue": (
        grouping_sets_revenue,
        GROUPING_SETS_SQL,
        "A7: explicit GROUPING SETS with grouping() flags",
    ),
    "unpivot_lineitem_measures": (
        unpivot_lineitem_measures,
        UNPIVOT_SQL,
        "A7: native unpivot (wide->long Expand, no join)",
    ),
    "robust_price_stats": (
        robust_price_stats,
        ROBUST_PRICE_SQL,
        "robust stats: winsorized sums + MAD modified-z outlier counts",
    ),
    "price_drift_psi": (
        price_drift_psi,
        PRICE_DRIFT_SQL,
        "drift: population stability index between order-date eras",
    ),
    "q10_returned_revenue": (q10_returned_revenue, Q10_SQL, "J4 Q10"),
    "q14_promo_share": (q14_promo_share, Q14_SQL, "J4 Q14 conditional agg"),
    "events_sliding": (events_sliding, SLIDING_SQL, "S1 sliding parity"),
}
