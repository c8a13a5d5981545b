"""Probabilistic sketches as pure Column expressions: Bloom-filter join
pruning and count-min frequency estimation.

The reference engine has no sketch tier — its joins and counts are eager
pandas merges at laptop scale (``core/utils/db_core.py``'s merge-based
upserts). At 100 TB the dominant cost of a selective join is shuffling
big-side rows that can never match; the classic fix is a Bloom filter
built from the small side's keys, broadcast, and applied *before* the
shuffle. Spark's own runtime row-level filtering does this only for
specific plan shapes; here it is an explicit, composable operator so any
pipeline stage can prune early.

Everything below is expression-only (md5 / xxhash64, bit ops, map
lookups): no Python UDFs, no driver-side state, fully codegen'd. The
Bloom bitmap rides in ONE broadcast row as ``map<int, long>`` (word
index → 64-bit word), so memory is O(set bits), not O(m), and the probe
is two map lookups short of free.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Bloom filter: build from the small side, prune the big side pre-shuffle
# ---------------------------------------------------------------------------


def _bloom_positions(
    key: Column, num_bits: int, num_hashes: int, hash_family: str = "xxhash64"
) -> list[Column]:
    """k independent bit positions. Two families:

    - ``xxhash64`` (default): seeded JVM-side 64-bit avalanche — the
      fast path for engine-internal pruning.
    - ``md5``: first 8 hex chars of ``md5('bloom{i}:' || key)`` — ~2x
      the expression cost, but byte-for-byte reproducible in ANY SQL
      engine (same portability contract as the CMS/KMV sketches), which
      is what lets an external oracle rebuild the *identical* filter and
      audit every membership decision, and lets a filter built by one
      engine be shipped to another. NULL keys coalesce to '' like every
      portable hash family here.
    """
    if hash_family == "md5":
        return [
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(f"bloom{i}:"),
                                F.coalesce(key.cast("string"), F.lit("")),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(num_bits),
            ).cast("int")
            for i in range(num_hashes)
        ]
    if hash_family != "xxhash64":
        raise ValueError(f"unknown hash_family {hash_family!r}")
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits)).cast("int")
        for i in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame,
    key_col: str,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Aggregate the distinct keys of ``df`` into a single-row Bloom
    bitmap: ``{bitmap: map<int,long>}`` where entry ``w`` holds the 64
    bits ``[64w, 64w+64)``. Absent words are all-zero (map lookup
    ``coalesce``s to 0 at probe time), so a sparse filter costs memory
    proportional to its population, not its size.

    Plan shape: one narrow projection (k positions per key), one
    partial-aggregated ``bit_or`` groupBy over at most ``num_bits/64``
    words, one 1-row collect into a map. The result is broadcast-joined
    by :func:`bloom_prefilter`; at 2^20 bits the row is ≤128 KB — always
    broadcastable, regardless of how large the build side's *row* data
    was.
    """
    key = F.col(key_col)
    pos = F.explode(
        F.array(*_bloom_positions(key, num_bits, num_hashes, hash_family))
    )
    words = (
        df.select(pos.alias("pos"))
        .select(
            F.shiftright("pos", 6).alias("word"),
            F.expr("shiftleft(1L, pos & 63)").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("bitmap")
    )


def bloom_might_contain(
    key: Column, bitmap: Column, *, num_bits: int, num_hashes: int,
    hash_family: str = "xxhash64",
) -> Column:
    """True iff every one of the key's k bits is set — i.e. the key *may*
    be in the build set (false positives possible, negatives exact)."""
    checks = []
    for p in _bloom_positions(key, num_bits, num_hashes, hash_family):
        # try_element_at, not element_at: ANSI mode (Spark 4 default)
        # makes a missing map key THROW; absent words must read as 0.
        word = F.coalesce(
            F.try_element_at(bitmap, F.shiftright(p, 6)), F.lit(0).cast("long")
        )
        # call_function: the Python shiftleft wrapper only takes an int
        # literal shift; the SQL function accepts a Column.
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), p.bitwiseAND(F.lit(63))
        )
        checks.append(word.bitwiseAND(mask) != F.lit(0))
    return reduce(lambda a, b: a & b, checks)


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Drop big-side rows whose key is provably absent from the build
    set, BEFORE any shuffle. The bitmap row is cross-broadcast (1 row),
    the probe is a pure expression, and the surviving superset still goes
    through the exact join — the filter only changes *how much data
    moves*, never the answer. This is the standard 100 TB semi-join
    shape: shuffle volume drops from |big| to |matches| + ε·|big|.
    """
    probed = df.crossJoin(F.broadcast(bloom))
    keep = bloom_might_contain(
        F.col(key_col), F.col("bitmap"), num_bits=num_bits,
        num_hashes=num_hashes, hash_family=hash_family,
    )
    return probed.filter(keep).drop("bitmap")


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable approximate frequencies
# ---------------------------------------------------------------------------


def _cms_bucket(key: Column, seed: int, width: int) -> Column:
    """Row ``seed``'s bucket for ``key``: first 8 hex chars of
    md5(seed:key) mod width. md5-on-string is engine-portable (DuckDB
    reproduces it byte-for-byte), which is what lets the driver's oracle
    recompute the *same* sketch rather than trusting ours."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width))


def cms_build(
    df: DataFrame, key_col: str, *, width: int = 256, depth: int = 4
) -> DataFrame:
    """Count-min sketch of ``key_col``'s frequency distribution as a
    ``(seed, bucket, cnt)`` relation — ``depth`` hash rows of ``width``
    counters. The relational encoding (vs an opaque binary blob) keeps
    it queryable, mergeable (union + re-sum), and oracle-checkable.

    Plan shape: explode ×depth (narrow), one partially-aggregated
    groupBy over ``depth·width`` cells — the shuffle moves at most
    ``depth·width·partitions`` partial counts no matter how many input
    rows, which is the whole point of a sketch at 100 TB.
    """
    key = F.col(key_col)
    cell = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("seed"),
                    _cms_bucket(key, s, width).alias("bucket"),
                )
                for s in range(depth)
            ]
        )
    )
    return (
        df.select(cell.alias("cell"))
        .select("cell.seed", "cell.bucket")
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for each probe key: min over the sketch
    rows of the probed counter. Guarantees estimate ≥ true count, with
    overshoot ≤ e·N/width at the usual confidence — the estimate is a
    *deterministic* function of (data, seeds), so two engines computing
    it agree exactly.

    The probe side re-derives each key's (seed, bucket) with the same
    expression used at build time — no skew or drift between build and
    probe hashing — then a broadcast-sized join picks up the counters.
    """
    key = F.col(key_col)
    probe_cells = probes.select(
        key.alias(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _cms_bucket(key, s, width).alias("bucket"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, "cell.seed", "cell.bucket")
    return (
        probe_cells.join(sketch, ["seed", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min partials: counters are pure sums, so the merge is
    union + re-sum per (seed, bucket) cell — and unlike HLL's mode
    ladder, the merged sketch is EXACTLY the sketch of the concatenated
    input (asserted by the driver-checked merge query). This is what
    lets per-day/per-shard sketches be stored once and any range be
    answered by addition, never a rescan."""
    from functools import reduce

    merged = reduce(lambda a, b: a.unionByName(b), sketches)
    return merged.groupBy("seed", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_inner_product(
    sketch_a: DataFrame, sketch_b: DataFrame, depth: int = 4
) -> DataFrame:
    """AMS/CMS join-cardinality estimate from two sketches built with
    the SAME (width, depth, seeds): per hash row, the dot product of the
    counter vectors upper-bounds the true equi-join size
    ``Σ_k f_A(k)·f_B(k)``; the row-wise MIN is the estimate. Guarantees:
    always ≥ the true size (counters only over-count), and within
    ``e·N_A·N_B/width`` of it with probability ``1 - e^-depth`` — and
    for FIXED data+seeds the estimate is a pure integer function both
    engines reproduce exactly, so the driver can hash it.

    This is the 100 TB join planner's cardinality probe: the answer
    costs one join over ``depth·width`` cells — the base tables are
    never touched, so estimating "how big is A ⋈ B" before committing
    to a shuffle strategy is O(sketch), not O(data). Sketch the two
    sides once (mergeable per-partition/per-day, see ``cms_merge``),
    then any pairwise join size is a dot product. The same self-join
    form (sketch against itself) is the classic AMS F2 / second-moment
    estimate — the skew statistic behind salting decisions
    (``operators/skew.py``).

    Reference trace: the reference delegates planning to its warehouse
    (``core/utils/db_core.py`` passthrough); this is the engine-side
    primitive a planner needs when there is no warehouse to ask.
    """
    a = sketch_a.select("seed", "bucket", F.col("cnt").alias("__ca"))
    b = sketch_b.select("seed", "bucket", F.col("cnt").alias("__cb"))
    # inner join: a cell missing from either side contributes 0 to the
    # dot product, exactly as if its counter were present with cnt=0.
    # A seed with NO shared cells therefore has dot 0 — it just produces
    # no row; if any of the depth rows is missing the min is 0 (and so,
    # by the per-seed upper bound, is the true join size). Hypothesis
    # found the unguarded form returning null on fully disjoint sketches.
    return (
        a.join(b, ["seed", "bucket"])
        .groupBy("seed")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__dot"))
        .agg(
            F.when(
                F.count(F.lit(1)) < F.lit(depth), F.lit(0).cast("long")
            )
            .otherwise(F.min("__dot").cast("long"))
            .alias("est_join_size")
        )
    )


# ---------------------------------------------------------------------------
# K-minimum-values: mergeable distinct-count with SET ALGEBRA
# ---------------------------------------------------------------------------


def kmv_build(df: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """K-minimum-values distinct sketch: the k smallest md5 hashes of
    the distinct keys, as a (rank, hash_hex) relation. Estimator:
    ``(k-1) / h_(k)`` with hashes mapped to (0,1) — standard KMV, ±1/√k
    relative error. Complements the HLL tier (operators/profile.py)
    with the property HLL lacks: the sketch IS a uniform sample of the
    distinct keys' hash space, so two sketches support set ALGEBRA —
    union (merge minima), and Jaccard/intersection via the shared-
    prefix resolution (kmv_jaccard) — with a fully engine-portable
    derivation (md5 on strings, lexicographic order; any SQL engine
    replays it bit-for-bit, which is what lets the driver HASH the
    sketch itself, not just tolerate its estimate).

    Plan: distinct → ``orderBy(h).limit(k)``, which Catalyst plans as
    TakeOrderedAndProject — each partition keeps only its k smallest
    hashes and the merge sees k·partitions rows, never the key
    universe. Ranks are then assigned by a window over the k survivors
    (bounded single partition by construction — this is the pattern,
    NOT an unpartitioned window over the input).
    """
    from pyspark.sql.window import Window

    h = F.md5(F.col(key_col).cast("string")).alias("h")
    smallest = df.select(h).distinct().orderBy("h").limit(k)
    # bounded grain: window over the k smallest hashes (k rows)
    w = F.row_number().over(Window.orderBy("h"))
    return smallest.withColumn("rank", w).select(
        "rank", F.col("h").alias("hash_hex")
    )


def kmv_union(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Union of two KMV sketches = the k smallest of the merged hash
    sets — EXACTLY the sketch of the unioned key sets (same closure
    law as cms_merge; driver-checked). Constant-size merge: 2k rows in,
    k out."""
    from pyspark.sql.window import Window

    merged = (
        a.select("hash_hex")
        .unionByName(b.select("hash_hex"))
        .distinct()
        .orderBy("hash_hex")
        .limit(k)
    )
    # bounded grain: window over a k-row sketch relation
    w = F.row_number().over(Window.orderBy("hash_hex"))
    return merged.withColumn("rank", w).select("rank", "hash_hex")


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: map the k-th smallest
    hash's first 8 hex chars to (0,1) and take (k-1)/h_k. If the sketch
    holds fewer than k hashes the count was below k and is EXACT (the
    sketch saw every distinct hash). Integer-exact inputs (rank, hex
    prefix) make the estimate a pure function both engines reproduce."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("__n"),
        F.max(F.when(F.col("rank") == k, F.col("hash_hex"))).alias("__kh"),
    )
    hk = F.conv(F.substring("__kh", 1, 8), 16, 10).cast("double") / F.lit(
        float(1 << 32)
    )
    return agg.select(
        F.when(F.col("__n") < k, F.col("__n").cast("double"))
        .otherwise(F.lit(float(k - 1)) / hk)
        .alias("est_distinct")
    )


def sketch_join_plan(
    build: DataFrame,
    probe: DataFrame,
    key_col: str,
    *,
    width: int = 512,
    depth: int = 4,
    broadcast_max_rows: int = 1_000_000,
    skew_ratio_threshold: float = 8.0,
) -> dict:
    """Cost-based join-strategy decision from SKETCH statistics — the
    closure of the sketch tier: one CMS pass per side yields (a) the
    build side's row count, (b) the estimated join cardinality
    (``cms_inner_product``), and (c) a skew signal — the probe side's
    estimated self-join size vs the uniform baseline ``N²/distinct``
    (F2/uniform ≈ 1 for balanced keys, ≫1 for hot keys). Decision:

    - build side small → ``broadcast`` (hash join, no shuffle of probe)
    - hot probe keys   → ``salted`` (operators/skew.salted_join)
    - otherwise        → ``shuffle`` (plain sort-merge/hash)

    Returns the decision dict {strategy, n_build, est_join_rows,
    skew_ratio}; ``execute_sketch_planned_join`` applies it. The
    decision is a deterministic integer/ratio function of (data,
    seeds), so a driver oracle can replay it — a planner whose choices
    are auditable, not vibes. At 100 TB the sketches come from table
    maintenance (mergeable per-partition partials), so the decision
    costs O(depth·width), not a scan."""
    n_build = build.count()
    sk_b = cms_build(build, key_col, width=width, depth=depth)
    sk_p = cms_build(probe, key_col, width=width, depth=depth)
    est_join = int(cms_inner_product(sk_b, sk_p, depth=depth).first()["est_join_size"])
    probe_f2 = int(cms_inner_product(sk_p, sk_p, depth=depth).first()["est_join_size"])
    n_probe = probe.count()
    # approx_count_distinct, not distinct().count(): the planner's skew
    # baseline only feeds a >=8x threshold, and the exact form shuffles
    # every distinct VALUE — the one cost a sketch-driven planner exists
    # to avoid. HLL++ partials merge in fixed memory (no value exchange)
    # and are deterministic for fixed data, so the decision stays
    # auditable.
    distinct_est = max(1, int(
        probe.agg(F.approx_count_distinct(key_col)).first()[0]
    ))
    uniform_f2 = max(1.0, n_probe * n_probe / distinct_est)
    skew_ratio = probe_f2 / uniform_f2
    if n_build <= broadcast_max_rows:
        strategy = "broadcast"
    elif skew_ratio >= skew_ratio_threshold:
        strategy = "salted"
    else:
        strategy = "shuffle"
    return {
        "strategy": strategy,
        "n_build": n_build,
        "est_join_rows": est_join,
        "skew_ratio": skew_ratio,
    }


def execute_sketch_planned_join(
    build: DataFrame,
    probe: DataFrame,
    key_col: str,
    plan: dict,
    how: str = "inner",
) -> DataFrame:
    """Apply a ``sketch_join_plan`` decision. All three strategies
    return the IDENTICAL relational result (salting only routes rows;
    broadcast is a physical hint) — the plan changes how data moves,
    never the answer, which is what lets the driver hash the joined
    result regardless of the chosen path."""
    from neulix_datahub_spark.operators.skew import salted_join

    if plan["strategy"] == "broadcast":
        return probe.join(F.broadcast(build), key_col, how)
    if plan["strategy"] == "salted":
        return salted_join(probe, build, on=[key_col], how=how)
    return probe.join(build, key_col, how)
