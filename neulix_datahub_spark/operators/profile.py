"""Whole-table profile operator (SURVEY §2.4 A1–A6).

The reference's flagship analytic is ``inspect_output``
(``core/utils/data_core.py:178-299``): for every column it emits dtype,
null count, null pct, distinct count, 5 sample values and the top-10
value counts (nulls shown as ``'__NULL__'``, everything stringified,
``data_core.py:237-262``). It does this with an eager per-column pandas
loop — O(columns) passes over the data.

Here it is one declarative job: the table is unpivoted to a long
``(column, value)`` relation (a single projection — no shuffle), then ONE
hash aggregation computes counts/nulls/distincts per column and ONE
window pass extracts the per-column top-10. Two shuffles total regardless
of column count; at 100 TB the melt multiplies bytes by ~#cols, so
``columns=`` lets callers profile a projection (column pruning still
reaches the parquet scan for the untouched columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

NULL_SENTINEL = "__NULL__"


def _melt(df: DataFrame, columns: list[str] | None) -> DataFrame:
    cols = columns or df.columns
    stringified = df.select(
        *[F.col(c).cast("string").alias(c) for c in cols]
    )
    return stringified.unpivot([], cols, "column", "value")


def profile_stats(
    df: DataFrame, columns: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """A2+A3+A5 in one aggregation: per-column row/null/distinct counts.

    Output: ``column, n_rows, null_count, null_pct, unique_count`` — one
    row per profiled column. ``unique_count`` is exact by default
    (reference ``nunique(dropna=True)``, ``data_core.py:243-246``, and
    what the DuckDB oracle checks); ``exact=False`` swaps in
    ``approx_count_distinct`` (HyperLogLog++) — at 100 TB the exact
    distinct forces a per-column shuffle of all values, the sketch
    aggregates in fixed memory.
    """
    distinct_agg = F.count_distinct if exact else F.approx_count_distinct
    melted = _melt(df, columns)
    return (
        melted.groupBy("column")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count("value")).alias("null_count"),
            F.round(
                (F.count(F.lit(1)) - F.count("value")) * 100.0 / F.count(F.lit(1)), 6
            ).alias("null_pct"),
            distinct_agg("value").alias("unique_count"),
        )
    )


def top_k_values(
    df: DataFrame, column: str, k: int = 10, null_sentinel: str = NULL_SENTINEL
) -> DataFrame:
    """A4: top-k value counts for one column, nulls → sentinel, stringified,
    deterministic tie-break on the value itself (``data_core.py:253-262``).

    Plan: partial (map-side) count → final count → ``TakeOrderedAndProject``
    via limit; no full sort at scale.
    """
    return (
        df.select(F.coalesce(F.col(column).cast("string"), F.lit(null_sentinel)).alias("value"))
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("value"))
        .limit(k)
    )


def profile_table(
    df: DataFrame, columns: list[str] | None = None, k: int = 10, n_samples: int = 5
) -> DataFrame:
    """A6: the full ``inspect_output`` analogue — one output row per column:
    ``column, dtype, null_count, null_pct, unique_count, sample_values,
    top_10`` (``top_10`` is ``array<struct<value:string, count:bigint>>``,
    matching the reference's list-of-dicts, ``data_core.py:254-262``).

    Deviation noted for determinism: the reference samples the *first* 5
    non-null values (arrival order, ``data_core.py:248-251``); we take the
    5 smallest distinct stringified values so the result is stable across
    partitionings — arrival order is undefined in a distributed scan.
    """
    cols = columns or df.columns
    spark = df.sparkSession
    melted = _melt(df, cols)

    stats = (
        melted.groupBy("column")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count("value")).alias("null_count"),
            F.round(
                (F.count(F.lit(1)) - F.count("value")) * 100.0 / F.count(F.lit(1)), 6
            ).alias("null_pct"),
            F.count_distinct("value").alias("unique_count"),
        )
    )

    counted = (
        melted.select("column", F.coalesce("value", F.lit(NULL_SENTINEL)).alias("value"))
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    w_top = Window.partitionBy("column").orderBy(F.desc("count"), F.asc("value"))
    top10 = (
        counted.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= k)
        .groupBy("column")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("rn"), F.col("value"), F.col("count")))
            ).alias("ranked")
        )
        .select(
            "column",
            F.transform("ranked", lambda s: F.struct(s.value.alias("value"), s.count.alias("count"))).alias("top_10"),
        )
    )

    w_sample = Window.partitionBy("column").orderBy(F.asc("value"))
    samples = (
        melted.filter(F.col("value").isNotNull())
        .select("column", "value")
        .distinct()
        .withColumn("rn", F.row_number().over(w_sample))
        .filter(F.col("rn") <= n_samples)
        .groupBy("column")
        .agg(F.array_sort(F.collect_list("value")).alias("sample_values"))
    )

    from neulix_datahub_spark.functions.ranking import local_relation

    dtypes = local_relation(
        spark,
        [(f.name, f.dataType.simpleString()) for f in df.schema.fields if f.name in set(cols)],
        "column string, dtype string",
    )

    return (
        stats.join(F.broadcast(dtypes), "column", "left")
        .join(top10, "column", "left")
        .join(samples, "column", "left")
        .select(
            "column", "dtype", "n_rows", "null_count", "null_pct",
            "unique_count", "sample_values", "top_10",
        )
    )


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """A1 extension: Pearson correlation for every column pair in ONE
    aggregation pass — ``len(cols)²/2`` ``corr`` expressions share one
    scan and one (1-row) reduce, instead of the O(k²) separate jobs a
    naive loop issues. ``F.corr`` is the engine's numerically stable
    (Welford-style) implementation — never the naive
    sum-of-products formula, which catastrophically cancels at 100 TB
    row counts. Returns long-form ``(col_a, col_b, corr)`` with
    ``col_a <= col_b``, rounded to 6 dp."""
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i:]]
    row = df.agg(
        *[F.round(F.corr(a, b), 6).alias(f"{a}\x00{b}") for a, b in pairs]
    )
    melted = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        F.col(f"`{a}\x00{b}`").alias("corr"),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("p")
    )
    return melted.select("p.col_a", "p.col_b", "p.corr").orderBy("col_a", "col_b")


def value_histogram(
    df: DataFrame, col: str, bins: int, lo: float, hi: float
) -> DataFrame:
    """A1 extension: fixed-range equi-width histogram in one pass —
    bucket index is a pure expression (no sampling, no second scan for
    bounds; pass literals so the plan stays single-scan — derive them
    from a prior ``describe`` when unknown). Values at ``hi`` land in
    the last bucket; out-of-range and null values are dropped. Returns
    ``(bucket, lo_edge, hi_edge, cnt)`` for NON-EMPTY buckets."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if not hi > lo:
        # without the guard width=0 makes (x-lo)/width = Inf, and the
        # ANSI int cast of floor(Inf) throws a baffling overflow error
        # deep in the plan instead of naming the bad argument
        raise ValueError(f"empty value range: lo={lo} hi={hi}")
    width = (hi - lo) / bins
    x = F.col(col).cast("double")
    bucket = F.least(
        F.lit(bins - 1), F.floor((x - lo) / width).cast("int")
    )
    return (
        df.filter(x.isNotNull() & (x >= lo) & (x <= hi))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * width, 6).alias("lo_edge"),
            F.round(F.lit(lo) + (F.col("bucket") + 1) * width, 6).alias("hi_edge"),
            "cnt",
        )
        .orderBy("bucket")
    )


def winsorize(
    df: DataFrame, col: str, lo_pct: float = 0.01, hi_pct: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """A1/F-cleaning extension: clamp ``col`` to its exact
    [``lo_pct``, ``hi_pct``] percentiles — the standard heavy-tail
    treatment before training-statistics aggregation. Two jobs: one
    percentile aggregate (a bounded 2-value driver collect — the bounds
    ARE driver state, like k-means centroids), one narrow map. At
    100 TB swap ``F.percentile`` for ``F.percentile_approx`` (mergeable
    GK sketch) — same two-job shape."""
    p = df.agg(
        F.percentile(col, F.array(F.lit(lo_pct), F.lit(hi_pct))).alias("p")
    ).first()["p"]
    if p is None or p[0] is None:
        # empty / all-null column: nothing to clamp — keep the schema
        # contract (out_col present) instead of a bare TypeError
        return df.withColumn(out_col or col, F.col(col))
    lo, hi = float(p[0]), float(p[1])
    return df.withColumn(
        out_col or col, F.least(F.greatest(F.col(col), F.lit(lo)), F.lit(hi))
    )


def mad_outlier_flag(
    df: DataFrame, col: str, threshold: float = 3.5, flag_col: str = "is_outlier"
) -> DataFrame:
    """Robust outlier flag via the Iglewicz–Hoaglin modified z-score:
    ``|0.6745 · (x − median) / MAD| > threshold``. Median/MAD resist
    the very outliers a mean/std rule would absorb. Two bounded
    percentile jobs for the scalars, then a narrow map; the z-score is
    rounded to 6 dp before the comparison so an engine-replay (the
    DuckDB oracle) cannot flip a borderline row on 1e-12 noise. A
    zero-MAD column (>=50% constant values) flags nothing rather than
    dividing by zero; an empty/all-null column likewise flags nothing
    (no distribution to be an outlier OF) instead of a bare TypeError."""
    med_row = df.agg(F.percentile(col, F.lit(0.5))).first()[0]
    if med_row is None:
        return df.withColumn(flag_col, F.lit(False))
    med = float(med_row)
    mad = float(df.agg(F.percentile(F.abs(F.col(col) - med), F.lit(0.5))).first()[0])
    if mad == 0.0:
        return df.withColumn(flag_col, F.lit(False))
    z = F.round(F.abs(0.6745 * (F.col(col) - med) / mad), 6)
    return df.withColumn(flag_col, z > threshold)


def population_stability_index(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    bins: int,
    lo: float,
    hi: float,
    eps: float = 1e-6,
) -> DataFrame:
    """Drift monitoring (the training-data op): PSI between a reference
    and a current sample of ``col`` over a shared fixed-range bucketing
    — ``Σ (p_i − q_i) · ln(p_i / q_i)`` with proportions clamped to
    ``eps`` so an empty bucket contributes a large-but-finite term
    (<0.1 stable, 0.1–0.25 drifting, >0.25 shifted, the usual reading).

    One scan per side (the two histograms), a ≤``bins``-row join, and a
    1-row reduce — sample sizes never meet in a shuffle. Returns one
    row: ``(psi, n_ref, n_cur)``."""
    hr = value_histogram(ref, col, bins, lo, hi).select(
        "bucket", F.col("cnt").alias("__r")
    )
    hc = value_histogram(cur, col, bins, lo, hi).select(
        "bucket", F.col("cnt").alias("__c")
    )
    allb = hr.join(hc, "bucket", "full_outer").select(
        F.coalesce("__r", F.lit(0)).alias("__r"),
        F.coalesce("__c", F.lit(0)).alias("__c"),
    )
    tot = allb.agg(
        F.sum("__r").alias("nr"), F.sum("__c").alias("nc")
    )
    terms = allb.crossJoin(tot).select(
        F.greatest(F.col("__r") / F.col("nr"), F.lit(eps)).alias("p"),
        F.greatest(F.col("__c") / F.col("nc"), F.lit(eps)).alias("q"),
        "nr", "nc",
    )
    return terms.agg(
        F.round(F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 6).alias("psi"),
        F.max("nr").cast("bigint").alias("n_ref"),
        F.max("nc").cast("bigint").alias("n_cur"),
    )


def exact_fixed_point_percentiles(
    df: DataFrame, col: str, percentiles: list[float], scale: int = 100
) -> DataFrame:
    """EXACT percentiles of a fixed-point column WITHOUT a global sort —
    the 100 TB replacement for ``F.percentile`` when values are money
    (or any bounded-precision decimal): group by the scaled integer
    value, cumulative-sum counts in value order, and pick the smallest
    value whose cumulative count reaches ``ceil(p·n)`` (lower /
    ``quantile_disc`` semantics — always an actual data value, never an
    interpolated float).

    Plan: one map-side-combined groupBy over the value DOMAIN (bounded
    by the column's precision×range, NOT by row count — ~10⁷ cells for
    any realistic money column, constant as data grows), then a window
    over that bounded domain. Contrast with sort-based percentiles
    (full-data range shuffle) and percentile_approx (mergeable but
    approximate): for fixed-point columns this is both exact AND
    bounded-shuffle. Every emitted number is integer-derived, so any
    engine replaying the cumsum lands on the identical result — the
    driver hashes it with zero tolerance.
    """
    from pyspark.sql.window import Window

    # NULLs are excluded up front (standard percentile semantics): a
    # null value would survive the groupBy as a null bucket that sorts
    # FIRST in Spark's ascending window but LAST in most SQL engines,
    # shifting every cumulative count — and it would inflate n. Both
    # engines agree only on the null-free histogram.
    df = df.filter(F.col(col).isNotNull())
    cents = F.round(F.col(col) * scale).cast("long")
    hist = df.groupBy(cents.alias("__v")).agg(F.count(F.lit(1)).alias("__c"))
    # bounded grain: window over the value DOMAIN histogram (see docstring)
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("__cum", F.sum("__c").over(w))
    n = hist.agg(F.sum("__c").alias("__n"))
    targets = [
        (p, F.ceil(F.lit(p) * F.col("__n")).cast("long")) for p in percentiles
    ]
    rows = []
    for p, tgt in targets:
        rows.append(
            cum.crossJoin(n)
            .filter(F.col("__cum") >= tgt)
            .agg(
                F.lit(p).alias("p"),
                (F.min("__v") / F.lit(float(scale))).alias("value"),
            )
        )
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), rows)
