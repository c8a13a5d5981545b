"""Skew-mitigation utilities for the 100 TB design point.

AQE's skew-join splitting (on in session.py) handles most sort-merge
skew automatically, and partial aggregation handles skewed group keys.
These helpers are the *manual* tools for the cases AQE can't fix:
broadcast-ineligible dimension joins against pathologically hot keys,
and high-cardinality aggregations where one key dominates a partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_pair_tasks(
    df: DataFrame,
    block_cols: list[str],
    max_block_size: int,
    order_col: str,
) -> DataFrame:
    """Triangular pair-task decomposition: make a blocked SELF-JOIN's
    per-task work bounded without changing its output.

    A block of B rows generates B² join pairs on ONE reducer — the
    quadratic bomb of every block-then-verify similarity operator. This
    splits each block into m = ceil(B / max_block_size) chunks and fans
    every row out to the m pair-tasks its chunk participates in: chunk c
    covers the diagonal task (c, c) plus cross tasks (i, c) for i < c and
    (c, j) for j > c. Joining on ``block_cols + [__task_i, __task_j]``
    and keeping a pair iff ``(__chunk_a != __chunk_b) OR (__task_i ==
    __task_j)`` yields EXACTLY the blocked self-join's pairs — each
    cross-chunk pair meets only in its single shared task, and same-chunk
    pairs are claimed by the diagonal — while no task holds more than
    2·max_block_size rows (≤ max_block_size² pairs). The cost is the
    standard triangle replication: each row shuffles m times instead of
    once, i.e. linear fan-out buys the quadratic bound.

    Adds ``__chunk`` (this row's chunk), ``__task_i``/``__task_j`` (one
    row per task, exploded). ``order_col`` makes chunk assignment
    deterministic; ANY assignment yields identical join output, so it
    only pins test/explain reproducibility. The chunking row_number
    shuffles on ``block_cols`` — the same exchange the join itself needs,
    so no extra shuffle stage at equal key granularity.
    """
    w = Window.partitionBy(*block_cols).orderBy(order_col)
    wc = Window.partitionBy(*block_cols)
    c = F.floor((F.row_number().over(w) - 1) / max_block_size).cast("int")
    m = F.ceil(F.count(F.lit(1)).over(wc) / max_block_size).cast("int")
    out = df.withColumn("__chunk", c).withColumn("__m", m)
    task_t = "array<struct<__task_i:int,__task_j:int>>"
    low = F.transform(
        F.sequence(F.lit(0), F.col("__chunk")),
        lambda i: F.struct(
            i.cast("int").alias("__task_i"), F.col("__chunk").alias("__task_j")
        ),
    )
    high = F.when(
        F.col("__chunk") + 1 <= F.col("__m") - 1,
        F.transform(
            F.sequence(F.col("__chunk") + 1, F.col("__m") - 1),
            lambda j: F.struct(
                F.col("__chunk").alias("__task_i"), j.cast("int").alias("__task_j")
            ),
        ),
    ).otherwise(F.array().cast(task_t))
    return (
        out.withColumn("__task", F.explode(F.concat(low.cast(task_t), high)))
        .select("*", "__task.__task_i", "__task.__task_j")
        .drop("__task", "__m")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with hot-key salting: the large/skewed ``left`` gets a
    random salt in [0, salt); the replicable ``right`` is exploded
    ``salt``× so every (key, salt) bucket finds its match. A key that
    would land on one reducer now spreads over ``salt`` of them, at the
    cost of shuffling ``right`` ``salt`` times — use when ``right`` is
    too big to broadcast but small enough to replicate.

    The salt only routes rows; join results are identical to a plain
    join (asserted in tests).
    """
    salted_left = left.withColumn(
        "__salt", F.floor(F.rand(seed) * salt).cast("int")
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return salted_left.join(salted_right, on=[*on, "__salt"], how=how).drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, str]],
    salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation with explicit salting for re-aggregatable
    measures: phase 1 aggregates on (keys, salt) so a hot key spreads
    over ``salt`` reducers; phase 2 merges the partials.

    ``aggs`` maps output name → (phase-1 aggregate expression, merge)
    where merge is ``"sum"`` (for sum/count partials), ``"min"`` or
    ``"max"``. Not valid for non-decomposable aggregates (avg must be
    expressed as sum+count and divided afterwards).
    """
    mergers = {"sum": F.sum, "min": F.min, "max": F.max}
    for name, (_, merge) in aggs.items():
        if merge not in mergers:
            raise ValueError(
                f"non-decomposable merge {merge!r} for {name!r}: only "
                f"{sorted(mergers)} re-aggregate correctly over salted "
                "partials — express avg as sum+count and divide after, "
                "countDistinct via a two-phase distinct-then-count"
            )
    phase1 = (
        df.withColumn("__salt", F.floor(F.rand(seed) * salt).cast("int"))
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[mergers[merge](name).alias(name) for name, (_, merge) in aggs.items()]
    )


def rebalance_for_write(df: DataFrame, *cols: str) -> DataFrame:
    """AQE REBALANCE hint — the write-side skew tool: before a
    partitioned/bucketed write, ask AQE to split oversized shuffle
    partitions AND coalesce tiny ones at runtime (optionally keyed by
    ``cols`` so co-located data stays together). Unlike a fixed
    ``repartition(n)`` this adapts to the actual data volume per key,
    which is what prevents both straggler tasks and small-file spray
    from one static guess. No-op semantics: row set is unchanged."""
    return df.hint("rebalance", *[F.col(c) for c in cols]) if cols else df.hint(
        "rebalance"
    )


def key_skew_profile(df: DataFrame, key_col: str, top_n: int = 5) -> DataFrame:
    """The measurement that DECIDES between the tools above: per-key
    distribution diagnostics for a prospective join/agg key, in one
    aggregation pass over the key histogram.

    Emits a single row: distinct keys, total rows, max/median key count,
    the skew ratio (max / median — AQE's own skew-join trigger is this
    shape), the top-``top_n`` keys' share of all rows, and the Shannon
    entropy of the key distribution normalized to [0, 1] (1 = uniform;
    near 0 = one key dominates). Rule of thumb wired into SCALE.md:
    skew_ratio > 10 on a shuffle key means salt (salted_join /
    salted_aggregate) or broadcast the other side; entropy is the
    cheaper monitor to alert on over time.

    Plan: groupBy(key) count (map-side combined), then a single-row
    reduce over the histogram — the histogram, not the data, is what
    crosses the second exchange, so the profile costs one scan at any
    table size. The top-N share comes from ``orderBy().limit(top_n)``
    (TakeOrderedAndProject: per-partition top-N, driver merges
    #partitions·N rows) and the per-key probabilities from a broadcast
    single-row total — NO global window anywhere, so the profile holds
    at unbounded key cardinality (the earlier spelling ranked the whole
    histogram through a single-partition window).
    """
    hist = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__c"))
    tot = hist.agg(F.sum("__c").alias("__N"))
    topn = (
        hist.orderBy(F.desc("__c"), F.col(key_col))
        .limit(top_n)
        .agg(F.sum("__c").alias("__topc"))
    )
    enriched = hist.crossJoin(F.broadcast(tot)).withColumn(
        "__p", F.col("__c").cast("double") / F.col("__N")
    )
    stats = enriched.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__c").alias("n_rows"),
        F.max("__c").alias("max_key_rows"),
        F.median("__c").alias("median_key_rows"),
        F.round(F.max("__c") / F.median("__c"), 4).alias("skew_ratio"),
        F.round(
            F.try_divide(
                -F.sum(F.col("__p") * F.log2("__p")),
                F.log2(F.count(F.lit(1)).cast("double")),
            ),
            6,
        ).alias("norm_entropy"),
    )
    return stats.crossJoin(F.broadcast(topn)).select(
        "n_keys",
        "n_rows",
        "max_key_rows",
        "median_key_rows",
        "skew_ratio",
        F.round(F.col("__topc") / F.col("n_rows"), 6).alias(f"top{top_n}_share"),
        "norm_entropy",
    )
