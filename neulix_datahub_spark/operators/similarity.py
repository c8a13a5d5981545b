"""Similarity search over embedding columns (SURVEY §2.11 L3).

Not in the reference (which has no vector data); this is the
training-data-pipeline extension: top-k nearest neighbors over an
``array<float>`` column.

Two tiers, per the 100 TB design point:

- **Brute force** (`cosine_top_k`): exact, SQL-expressible (the DuckDB
  oracle checks it), one scan + ``TakeOrderedAndProject`` — the dot
  product is a codegen'd ``aggregate(zip_with(...))`` expression, no
  Python. Right answer for one query vector against any corpus size
  (linear scan parallelizes perfectly; no shuffle at all).
- **IVF-style bucketed** (`ivf_top_k`): for *many* probes at scale, assign
  vectors to coarse centroid buckets once (k-means via spark.ml or a
  deterministic hash-projection fallback), then search only the probe's
  nearest buckets — trades recall for a ~#buckets/#probed speedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sql_double(v: float | None) -> str:
    """A SQL double literal that parses to exactly ``v``: Python repr
    is the shortest round-trip decimal and both engines' parses are
    correctly rounded, so the bits survive the text trip. ``None``
    renders as a typed NULL (the IVFADC degenerate-cell sentinel)."""
    import math

    if v is None:
        return "CAST(NULL AS DOUBLE)"
    f = float(v)
    if math.isnan(f):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(f):
        return f"CAST('{'-' if f < 0 else ''}Infinity' AS DOUBLE)"
    return f"CAST('{f!r}' AS DOUBLE)"


def const_double_array(values) -> Column:
    """A constant ``array<double>`` built through ONE ``F.expr`` call.

    The obvious spellings are driver-bound (r13 optimization round,
    measured): both ``F.array(*[F.lit(x) …])`` and ``F.lit(list)``
    (which PySpark expands to per-element ``lit`` calls internally)
    cost one py4j round-trip PER ELEMENT — ~0.5 s to build one 8×64
    centroid table, paid per Lloyd iteration because the literals
    change. Rendering the literal as SQL text ships it in one call;
    Catalyst constant-folds it to the identical array literal, so
    values and execution are bit-for-bit the per-element form's."""
    return F.expr("array(" + ",".join(_sql_double(v) for v in values) + ")")


def const_double_matrix(rows) -> Column:
    """Nested constant ``array<array<double>>`` via one ``F.expr``
    (see :func:`const_double_array` for why)."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_sql_double(v) for v in row) + ")"
            for row in rows
        )
        + ")"
    )


def _dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two array columns (built-ins only)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity_expr(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity between two array columns as a pure expression."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _dot(ca, cb) / (_norm(ca) * _norm(cb))


def _cosine_to_literal(vec: Column, query_vector: list[float]) -> Column:
    """Cosine of an array column against a CONSTANT query vector: the
    query's norm folds to a Python scalar (same left-to-right double
    accumulation Spark's fold performs, so the value is bit-identical),
    leaving one dot + one row-norm fold per row instead of three."""
    import math

    acc = 0.0
    for x in query_vector:
        acc += float(x) * float(x)
    q = const_double_array(query_vector)
    return _dot(vec, q) / (_norm(vec) * F.lit(math.sqrt(acc)))


def cosine_top_k(
    df: DataFrame,
    query_vector: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector.

    Output ``(id, score)`` ordered by score desc with the id as a
    deterministic tiebreak. The literal vector is inlined into the plan
    (no join, no broadcast needed); ``orderBy().limit(k)`` compiles to
    ``TakeOrderedAndProject`` — each partition keeps only its local top-k,
    so the driver sees #partitions·k rows regardless of corpus size.
    """
    return (
        df.select(
            F.col(id_col),
            _cosine_to_literal(F.col(vec_col), query_vector).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def cosine_self_join_top_k(
    df: DataFrame,
    probe_ids: list[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k neighbors for a *set* of probe ids in one job: broadcast the
    (small) probe side against the corpus scan, window-rank per probe.

    Returns ``(probe_id, neighbor_id, score)``; excludes self-matches.
    """
    return _probe_top_k(df, probe_ids, k, vec_col, id_col)


def _probe_top_k(
    df: DataFrame,
    probe_ids: list[int],
    k: int,
    vec_col: str,
    id_col: str,
    sim_ceiling: float | None = None,
) -> DataFrame:
    """Shared probe-set top-k body (cosine_self_join_top_k and
    hard_negative_candidates differ ONLY by the optional score ceiling;
    keeping one implementation means a fix to the norm handling or the
    tiebreak can't silently miss one of them): broadcast the probe
    projections against one corpus scan, optional band filter BEFORE
    the ranking window, window partitioned per probe."""
    from pyspark.sql import Window

    probes = df.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("__q"),
        _norm(F.col(vec_col)).alias("__qn"),
    )
    scored = df.select(
        F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("__vn")
    ).crossJoin(F.broadcast(probes)).filter(
        F.col(id_col) != F.col("probe_id")
    ).select(
        "probe_id",
        F.col(id_col).alias("neighbor_id"),
        (_dot(F.col(vec_col), F.col("__q")) / (F.col("__vn") * F.col("__qn"))).alias("score"),
    )
    if sim_ceiling is not None:
        scored = scored.filter(F.col("score") < sim_ceiling)
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def probe_bucket_set(
    spark,
    query_vector: list[float],
    num_buckets: int,
    *,
    n_probes: int | None = None,
    hamming_probe: int = 1,
    vec_col: str = "embedding",
    seed: int = 42,
) -> set[int]:
    """Which buckets a query should search — shared by the in-memory
    probe (ivf_top_k) and the persisted index (query_ivf_index) so the
    two paths can never disagree on probe policy. With ``n_probes``,
    multi-probe by flip cost (sum of |margin| over flipped planes);
    otherwise a Hamming ball. The query's margins come from running the
    SAME bucketing expressions over a one-row frame; driver work is one
    1-row job + a B-entry sort, corpus-independent."""
    import math
    from itertools import combinations

    n_planes = int(math.log2(num_buckets))
    if 2**n_planes != num_buckets:
        raise ValueError("num_buckets must be a power of two")
    from neulix_datahub_spark.functions.ranking import local_relation

    qdf = local_relation(spark, [(query_vector,)], f"{vec_col} array<double>")
    if n_probes is not None:
        projs = qdf.select(
            F.array(
                *[_plane_projection(F.col(vec_col), p, seed) for p in range(n_planes)]
            ).alias("pr")
        ).first()["pr"]
        q_bucket = 0
        for p in range(n_planes):
            q_bucket = q_bucket * 2 + (1 if projs[p] > 0 else 0)
        # Enumerate all B candidate buckets by flip cost; plane p owns bit
        # (n_planes-1-p) of the bucket id (MSB-first, matching
        # ivf_assign_buckets' bucket*2+bit construction).
        cands = []
        for mask in range(2**n_planes):
            cost = 0.0
            b = q_bucket
            for p in range(n_planes):
                if (mask >> p) & 1:
                    cost += abs(projs[p])
                    b ^= 1 << (n_planes - 1 - p)
            cands.append((cost, b))
        cands.sort()
        return {b for _, b in cands[: max(1, n_probes)]}
    q_bucket = ivf_assign_buckets(qdf, num_buckets, vec_col, seed).first()["bucket"]
    probe_buckets = {q_bucket}
    for r in range(1, hamming_probe + 1):
        for bits in combinations(range(n_planes), r):
            b = q_bucket
            for bit in bits:
                b ^= 1 << bit
            probe_buckets.add(b)
    return probe_buckets


def ivf_top_k(
    df: DataFrame,
    query_vector: list[float],
    k: int = 10,
    num_buckets: int = 64,
    hamming_probe: int = 1,
    n_probes: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """L3 scale path: approximate top-k — search only a few LSH buckets,
    then exact cosine inside them.

    Two probe policies:

    - ``n_probes=P`` (preferred, classic multi-probe LSH): probe the P
      buckets with the smallest *flip cost* — the cost of a candidate
      bucket is the sum of |hyperplane margin| over the planes flipped to
      reach it, so the search visits the buckets most likely to hold
      near-boundary neighbors first. P buckets of B means a ~P/B corpus
      scan with recall far above the same-budget Hamming-ball probe,
      because a large-margin plane is almost never worth flipping.
    - ``hamming_probe=h`` (fallback when ``n_probes`` is None): probe
      every bucket within h bit-flips, margin-blind.

    The query's plane margins/bucket come from running the SAME bucketing
    expressions over a one-row DataFrame, so corpus and probe can never
    disagree on hash semantics. Driver-side work is one 1-row job plus a
    2^log2(B)=B-entry sort — independent of corpus size.
    """
    spark = df.sparkSession
    bucketed = ivf_assign_buckets(df, num_buckets, vec_col, seed)
    probe_buckets = probe_bucket_set(
        spark, query_vector, num_buckets,
        n_probes=n_probes, hamming_probe=hamming_probe,
        vec_col=vec_col, seed=seed,
    )

    return (
        bucketed.filter(F.col("bucket").isin(*probe_buckets))
        .select(
            F.col(id_col),
            _cosine_to_literal(F.col(vec_col), query_vector).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def ivf_batch_top_k(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    num_buckets: int = 64,
    n_probes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
    seed: int = 42,
    broadcast_probes: bool = True,
) -> DataFrame:
    """L3 scale path for MANY probes in one job: each probe searches its
    own bucket plus the ``n_probes - 1`` cheapest single-plane flips,
    ranked by that probe's hyperplane margins — the distributed sibling
    of ``ivf_top_k``'s driver-side multi-probe.

    Everything probe-side is a narrow expression (projections → bucket →
    margin-sorted flip candidates → explode). With
    ``broadcast_probes=True`` (default) the exploded probe side is
    BROADCAST against the bucketed corpus scan — the corpus never
    shuffles, exactly like ``cosine_self_join_top_k`` but touching only
    ~n_probes/num_buckets of it per probe. A broadcast build side is
    bounded by executor memory and Spark's broadcast limit (~8 GB /
    512M rows), so the default is right only while
    |probes| × n_probes × (vector + margins) fits those bounds — for a
    genuinely large probe set pass ``broadcast_probes=False`` to run
    the same plan as a shuffle hash join on the candidate-bucket key
    (both sides exchange on ``bucket``; identical output, asserted in
    tests). Top-k is a per-probe ``row_number`` window over the
    candidate scores either way.

    Candidates are limited to Hamming ≤ 1 of the probe's bucket (origin
    + margin-ranked single flips): multi-flip subsets would need a
    per-row subset sort that codegen can't express cheaply, and a
    near-boundary neighbor differs from the probe almost always on
    low-margin planes one at a time. For deeper probe sequences on a
    single query, use ``ivf_top_k(n_probes=...)`` which enumerates all
    2^planes subsets driver-side. With ``num_buckets=2`` the candidate
    set covers the whole space, so the result equals brute force
    (asserted in tests).

    Returns ``(probe_id, neighbor_id, score)``, ``score`` = cosine,
    ≤ k rows per probe ordered by (score desc, neighbor_id).
    """
    import math

    from pyspark.sql import Window

    n_planes = int(math.log2(num_buckets))
    if 2**n_planes != num_buckets:
        raise ValueError("num_buckets must be a power of two")
    if not 1 <= n_probes <= n_planes + 1:
        raise ValueError(
            f"n_probes must be in [1, {n_planes + 1}] (origin + one flip "
            "per plane); deeper sequences are the driver-side ivf_top_k's job"
        )

    bucketed = ivf_assign_buckets(corpus, num_buckets, vec_col, seed).select(
        F.col(id_col).alias("__cid"),
        F.col(vec_col).alias("__cv"),
        _norm(F.col(vec_col)).alias("__cn"),
        "bucket",
    )

    projs = F.array(
        *[_plane_projection(F.col(vec_col), p, seed) for p in range(n_planes)]
    )
    p_side = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("__pv"),
        _norm(F.col(vec_col)).alias("__pn"),
        projs.alias("__projs"),
    )
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        bucket = bucket * 2 + F.when(
            F.element_at("__projs", p + 1) > 0, 1
        ).otherwise(0)
    p_side = p_side.withColumn("__bucket", bucket)
    flips = F.array(
        *[
            F.struct(
                F.abs(F.element_at("__projs", p + 1)).alias("cost"),
                F.col("__bucket")
                .bitwiseXOR(F.lit(1 << (n_planes - 1 - p)))
                .alias("b"),
            )
            for p in range(n_planes)
        ]
    )
    cands = F.concat(
        F.array(F.struct(F.lit(0.0).alias("cost"), F.col("__bucket").alias("b"))),
        F.slice(F.array_sort(flips), 1, n_probes - 1) if n_probes > 1 else F.array().cast(
            "array<struct<cost:double,b:long>>"
        ),
    )
    p_side = p_side.select(
        "probe_id", "__pv", "__pn",
        F.explode(F.transform(cands, lambda s: s["b"])).alias("__cand_bucket"),
    )

    p_join = F.broadcast(p_side) if broadcast_probes else p_side
    scored = bucketed.join(p_join, F.col("bucket") == F.col("__cand_bucket"))
    if exclude_self:
        scored = scored.filter(F.col("__cid") != F.col("probe_id"))
    scored = scored.select(
        "probe_id",
        F.col("__cid").alias("neighbor_id"),
        (_dot(F.col("__cv"), F.col("__pv")) / (F.col("__cn") * F.col("__pn"))).alias(
            "score"
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def mmr_rerank(
    candidates: DataFrame,
    rel_col: str,
    vec_col: str,
    id_col: str = "doc_id",
    k: int = 10,
    lam_num: int = 7,
    lam_den: int = 10,
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998)
    diversified re-rank of a BOUNDED candidate set — the standard
    post-retrieval step that trades raw relevance against redundancy:

        pick argmax  λ·rel(d) − (1−λ)·max_{p∈picked} sim(d, p)

    ``candidates`` carries (id, rel_q6 integer, vec) for the top-N of
    an upstream retrieval (N is small by construction — this runs
    AFTER top-k, never on a corpus; the fixed-size greedy is
    driver-side like the IVF-PQ ADC cell ranking, bounded at N²
    similarity scalars). Vectors must be L2-NORMALIZED (every upstream
    retrieval here produces them that way): pair similarity is the
    plain inner product, which equals cosine for unit vectors and
    stays finite (0) for zero vectors where a cosine would NaN.
    Arithmetic is PURE INTEGER end-to-end so any
    engine replays it bit-for-bit: relevance arrives q6-quantized,
    pairwise cosines quantize to q6 in-plan, and λ rides as the exact
    fraction lam_num/lam_den — the greedy compares
    ``lam_num·rel − (lam_den−lam_num)·max_sim`` (same order as the
    λ-weighted float for any tie-free input, and ties break on min
    id deterministically). The first pick is the plain relevance
    argmax (the λ-only case of the same formula).

    Returns ``(id_col, mmr_rank, rel_q6, penalty_q6)`` for the k
    picks, where penalty_q6 is the max-similarity term the winning
    pick paid (0 for the first)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not (0 <= lam_num <= lam_den) or lam_den < 1:
        raise ValueError(
            f"lam must be a fraction in [0, 1]: got {lam_num}/{lam_den}"
        )
    rows = candidates.select(
        F.col(id_col), F.col(rel_col).cast("long"), F.col(vec_col)
    ).collect()
    ids = [r[0] for r in rows]
    rel = {r[0]: int(r[1]) for r in rows}
    # pairwise cosine q6 via the SAME quantization the callers use —
    # computed in-plan, not in Python floats. The self-join runs over a
    # LocalRelation re-creation of the rows just collected (doubles
    # round-trip losslessly, so _dot sees identical inputs):
    # crossJoining `candidates` against itself both re-evaluated its
    # whole lineage twice AND — when the caller's relation was a
    # parallelized list, defaultParallelism pickled partitions —
    # scheduled a cores² Python-task cartesian for an N≤20-row product
    # (measured 14 s per call on 8 local rows; ~0.3 s this way).
    from neulix_datahub_spark.functions.ranking import local_relation

    spark = candidates.sparkSession
    vec_df = local_relation(
        spark,
        [(r[0], r[2]) for r in rows],
        candidates.select(F.col(id_col), F.col(vec_col)).schema,
    )
    pairs = (
        vec_df.alias("a")
        .crossJoin(vec_df.alias("b"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("__i"),
            F.col(f"b.{id_col}").alias("__j"),
            F.floor(
                F.lit(1e6)
                * _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
            )
            .cast("long")
            .alias("__s"),
        )
        .collect()
    )
    sim: dict[tuple, int] = {}
    for r in pairs:
        sim[(r["__i"], r["__j"])] = int(r["__s"])
        sim[(r["__j"], r["__i"])] = int(r["__s"])
    picked: list[tuple] = []
    remaining = set(ids)
    while remaining and len(picked) < k:
        best = None
        for d in remaining:
            pen = max((sim.get((d, p), 0) for p, _, _ in picked), default=0)
            score = lam_num * rel[d] - (lam_den - lam_num) * pen
            key = (-score, d)
            if best is None or key < best[0]:
                best = (key, d, pen)
        picked.append((best[1], rel[best[1]], best[2]))
        remaining.discard(best[1])
    from pyspark.sql.types import (
        IntegerType, LongType, StructField, StructType,
    )

    out = [
        (int(i + 1), d, int(r), int(p))
        for i, (d, r, p) in enumerate(picked)
    ]
    out_schema = StructType([
        StructField("mmr_rank", IntegerType()),
        StructField(id_col, LongType()),
        StructField("rel_q6", LongType()),
        StructField("penalty_q6", LongType()),
    ])
    return local_relation(spark, out, out_schema).select(
        id_col, "mmr_rank", "rel_q6", "penalty_q6"
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_filter: Column | None = None,
) -> DataFrame:
    """L2 embedding variant: pairs whose cosine similarity crosses
    ``threshold`` — ``(id_a, id_b, cos_sim)``, each unordered pair once.

    ``probe_filter`` restricts the PROBE side (id_a); every probe pairs
    with the WHOLE corpus regardless of id order — the join condition
    is ``id_a < id_b OR NOT probe(b)``, which (a) keeps each
    probe↔probe pair once in canonical order, (b) emits probe↔non-probe
    pairs in both id orders as (probe, other), and (c) reduces to the
    classic ``id_a < id_b`` when there is no filter. A plain
    ``id_a < id_b`` with a probe side silently missed every
    near-duplicate whose corpus id was SMALLER than the probe's — the
    max-id probe always came back empty. The probe side broadcasts, so
    the corpus never shuffles. For full-corpus near-dup at 100 TB,
    bucket first (``ivf_assign_buckets``) and run this within buckets.

    Norms are computed once per ROW in the pre-join projections, so the
    per-PAIR work is just the dot product — a 3x cut in the pairwise
    expression cost versus recomputing both norms for every pair.
    """
    side = df if probe_filter is None else df.filter(probe_filter)
    probes = side.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        _norm(F.col(vec_col)).alias("__na"),
    )
    is_probe = F.lit(True) if probe_filter is None else probe_filter
    corpus = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        _norm(F.col(vec_col)).alias("__nb"),
        is_probe.alias("__bp"),
    )
    pair = (F.col("id_a") < F.col("id_b")) | ~F.col("__bp")
    return (
        corpus.join(F.broadcast(probes), pair)
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _plane_projection(vec: Column, plane: int, seed: int) -> Column:
    """Signed projection of ``vec`` onto pseudo-random hyperplane
    ``plane``: sign_{plane,dim} = ±1 from xxhash64(plane, dim, seed) — a
    fixed hyperplane without materializing vectors. The sign of the
    result is the plane's bucket bit; its magnitude is the margin
    multi-probe ranks flip candidates by."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    prods = F.zip_with(
        vec,
        idx,
        lambda x, i: x.cast("double")
        * F.when(
            F.xxhash64(F.lit(plane), i, F.lit(seed)).bitwiseAND(F.lit(1)) == 1,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)),
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


# (num_planes, dim, seed) -> sign matrix. The signs are pure constants
# (data-independent), so memoizing them is constant folding, not result
# caching: every bench/oracle run still computes all data-dependent
# work from the parquet inputs.
_PLANE_SIGNS_CACHE: dict[tuple[int, int, int], list[list[float]]] = {}


def _plane_signs(
    spark, num_planes: int, dim: int, seed: int
) -> list[list[float]]:
    """The ±1.0 hyperplane sign matrix ``[plane][dim]`` that
    :func:`_plane_projection` derives per row per element from
    ``xxhash64(plane, i, seed)`` — evaluated ONCE in Spark (identical
    argument types: int plane, int index, int seed literal, so the
    hashes are bit-for-bit the ones the inline expression computes)
    and inlined as a nested array literal. Two wins, both measured:
    the banding expression no longer re-hashes planes×dim times per
    ROW at execution, and the driver no longer builds planes×dim
    Column nodes per call (~6 s of py4j round-trips per
    ``vector_banded_signatures`` call at 64×64 before this)."""
    key = (num_planes, dim, seed)
    got = _PLANE_SIGNS_CACHE.get(key)
    if got is None:
        rows = (
            spark.range(num_planes)
            .select(
                F.col("id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i: F.when(
                        F.xxhash64(
                            F.col("id").cast("int"), i, F.lit(seed)
                        ).bitwiseAND(F.lit(1))
                        == 1,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0)),
                ).alias("s"),
            )
            .orderBy("id")
            .collect()
        )
        got = [list(r["s"]) for r in rows]
        _PLANE_SIGNS_CACHE[key] = got
    return got


def vector_banded_signatures(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 128,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Sign-LSH banding projection ``(id, band, band_hash)`` — the
    VECTOR-side analogue of :func:`~neulix_datahub_spark.operators
    .dedupe.banded_signatures`, emitted at the same grain so the
    persisted-index candidate machinery (within-batch self-pairs,
    band-partitioned writes, delta ⋈ at-rest equi-joins) is shared
    verbatim between the text and semantic indexes.

    ``num_planes`` seeded data-INDEPENDENT hyperplanes (per-dimension
    xxhash64 signs, :func:`_plane_projection`) give each vector a sign
    bit-string; ``bands`` groups of ``num_planes // bands`` bits each
    pack into a long (doubling arithmetic, ANSI-safe for ≤62 bits per
    band), and two vectors are candidates when ANY band agrees —
    per-band collision probability (1 − θ/π)^r, the classic
    SimHash/banding trade. The defaults (r=8, b=16) target the
    production semantic-dedup regime (cosine ≳ 0.85, SemDeDup-style);
    a low-threshold corpus needs wider recall (smaller r, more bands).
    Hyperplanes depend only on (plane, dim, seed) — never on data — so
    banding is a pure function of the vector, which is what makes an
    incremental index's candidate set provably EQUAL to the batch
    one (a centroid-trained bucketing could not give that theorem:
    retraining on grown data moves the buckets).

    NULL vectors carry no bands and are dropped — nothing to
    near-match on, same rule as NULL text in the MinHash banding."""
    if num_planes % bands != 0 or bands <= 0:
        raise ValueError("num_planes must be a positive multiple of bands")
    r_bits = num_planes // bands
    if r_bits > 62:
        raise ValueError("more than 62 planes per band overflows the packed long")
    # r13 optimization, measured: the per-plane expression form spent
    # ~6 s of DRIVER time per call building planes×dim Column nodes
    # over py4j and re-evaluated planes×dim xxhash64 calls per ROW at
    # execution. The hyperplane signs are pure constants, so they are
    # evaluated once (_plane_signs — same hashes bit-for-bit) and ride
    # in as ONE nested array literal; all projections and all band
    # packs then come out of a single transform expression. The
    # projections array materializes once per row via the
    # wrap-in-array-and-transform trick (the repo's no-CSE-across-
    # lambdas lesson) so the band packs index an evaluated value, and
    # each sign row is sliced to the row's own vector length, keeping
    # ragged inputs bit-identical to the sequence-indexed form.
    vec = F.col(vec_col)
    dim_row = (
        df.filter(vec.isNotNull())
        .agg(F.max(F.size(vec)).alias("d"))
        .first()
    )
    dim = int(dim_row["d"]) if dim_row and dim_row["d"] is not None else 1
    signs = const_double_matrix(
        _plane_signs(df.sparkSession, num_planes, dim, seed)
    )
    projs = F.transform(
        signs,
        lambda srow: F.aggregate(
            F.zip_with(
                vec,
                F.slice(srow, 1, F.size(vec)),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    entries = F.element_at(
        F.transform(
            F.array(projs),  # projections evaluate once as the element
            lambda pr: F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.aggregate(
                        F.slice(pr, b * r_bits + 1, r_bits),
                        F.lit(0).cast("long"),
                        lambda acc, p: acc * 2
                        + F.when(p > 0, 1).otherwise(0),
                    ).alias("band_hash"),
                ),
            ),
        ),
        1,
    )
    sig = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.explode(entries).alias("__e"))
        .select("id", F.col("__e.band").alias("band"),
                F.col("__e.band_hash").alias("band_hash"))
    )
    # materialization barrier, same reason as banded_signatures: the
    # band rows feed both sides of a self-join and the projection
    # expressions must not inline into each
    return sig.repartition("id")


def ivf_assign_buckets(
    df: DataFrame,
    num_buckets: int = 64,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Scale path: assign each vector to a coarse bucket via signed random
    hyperplane projections (LSH) — ``num_buckets`` must be a power of two;
    log2(num_buckets) hyperplanes, each derived deterministically from the
    seed via per-dimension xxhash64 signs.

    This is the shuffle-free index build: one narrow projection. Probing
    searches only matching (or multi-probe/Hamming-adjacent) buckets.
    """
    import math

    n_planes = int(math.log2(num_buckets))
    if 2**n_planes != num_buckets:
        raise ValueError("num_buckets must be a power of two")

    # same constant-sign-matrix rewrite as vector_banded_signatures:
    # signs evaluate once (bit-identical hashes), projections + the
    # bucket fold come out of one expression instead of n_planes
    # inline plane expressions per row
    vec = F.col(vec_col)
    dim_row = df.agg(F.max(F.size(vec)).alias("d")).first()
    dim = int(dim_row["d"]) if dim_row and dim_row["d"] is not None else 1
    signs = const_double_matrix(
        _plane_signs(df.sparkSession, n_planes, dim, seed)
    )
    projs = F.transform(
        signs,
        lambda srow: F.aggregate(
            F.zip_with(
                vec,
                F.slice(srow, 1, F.size(vec)),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    bucket = F.element_at(
        F.transform(
            F.array(projs),  # projections evaluate once as the element
            lambda pr: F.aggregate(
                pr,
                F.lit(0).cast("long"),
                lambda acc, p: acc * 2 + F.when(p > 0, 1).otherwise(0),
            ),
        ),
        1,
    )
    return df.withColumn("bucket", bucket)


def embedding_centroids(
    df: DataFrame,
    strata_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-stratum centroid of an embedding column, in long form
    ``(strata, dim, centroid)`` — the building block for cluster
    profiling, IVF coarse quantizers, and drift monitoring.

    Plan shape: ``posexplode`` is linear ×dim fan-out over the scan (no
    pre-shuffle); the (stratum, dim) average is two-phase, so the
    exchange carries one partial sum per (stratum, dim) per task —
    #strata × dim rows, independent of corpus size. Long form keeps the
    output SQL-expressible (the oracle checks it exactly); reassemble
    with :func:`centroid_vectors` when an array is needed.
    """
    return (
        df.select(
            F.col(strata_col).alias("__st"),
            F.posexplode(F.col(vec_col)).alias("dim", "__v"),
        )
        .groupBy("__st", "dim")
        .agg(F.avg(F.col("__v").cast("double")).alias("centroid"))
        .select(F.col("__st").alias(strata_col), "dim", "centroid")
    )


def centroid_vectors(
    centroids_long: DataFrame,
    strata_col: str = "label",
) -> DataFrame:
    """Reassemble long-form centroids into ``(strata, centroid_vec)``
    arrays (dim-ordered). One tiny shuffle keyed by stratum; the result
    is #strata rows — always broadcastable."""
    return centroids_long.groupBy(strata_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("dim"), F.col("centroid")))
            ),
            lambda s: s["centroid"],
        ).alias("centroid_vec")
    )


def centroid_distances(
    df: DataFrame,
    strata_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Euclidean distance of every vector to its stratum centroid — the
    embedding-space outlier/drift signal (mislabeled or off-distribution
    points sit far from their centroid).

    Two-pass by necessity (the centroid is a stratum-global fact):
    pass 1 aggregates centroids (output is #strata rows — broadcast);
    pass 2 re-scans and computes the distance as a codegen'd
    ``zip_with``/``aggregate`` expression. The corpus never shuffles.
    """
    cents = centroid_vectors(embedding_centroids(df, strata_col, vec_col), strata_col)
    diff = F.zip_with(
        F.col(vec_col),
        F.col("centroid_vec"),
        lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
    )
    dist = F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v))
    return df.join(F.broadcast(cents), strata_col).select(
        id_col, strata_col, dist.alias("centroid_dist")
    )


def dim_min_max(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension (min, max) over an embedding corpus, long form
    ``(dim, vmin, vmax)`` — the calibration pass for scalar quantization.
    posexplode fan-out + two-phase agg; the exchange carries one partial
    per (dim, task)."""
    return (
        df.select(F.posexplode(F.col(vec_col)).alias("dim", "__v"))
        .groupBy("dim")
        .agg(
            F.min(F.col("__v").cast("double")).alias("vmin"),
            F.max(F.col("__v").cast("double")).alias("vmax"),
        )
    )


def quantize_embeddings_int8(
    df: DataFrame,
    calib: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar int8 quantization against a per-dimension (vmin, vmax)
    calibration table: ``q_d = round((v_d - vmin_d) / (vmax_d - vmin_d)
    * 255) - 128`` — 4x smaller vectors for ANN shortlist scans, with
    the calibration broadcast back over the corpus (no shuffle).

    Adds ``<vec_col>_q`` (array<int>). Degenerate dims (vmax == vmin)
    quantize to 0. Dequantize with the same table to bound error at
    half a step per dim.
    """
    cal = calib.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "vmin"))), lambda s: s["vmin"]
        ).alias("__mins"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "vmax"))), lambda s: s["vmax"]
        ).alias("__maxs"),
    )
    idx = F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1)
    q = F.transform(
        idx,
        lambda i: F.when(
            F.element_at("__maxs", i + 1) > F.element_at("__mins", i + 1),
            # clamp to int8: vectors appended AFTER calibration can
            # exceed the calibrated range, and an unclamped code (e.g.
            # 382) overflows any downstream tinyint/Arrow int8 buffer
            F.greatest(
                F.lit(-128),
                F.least(
                    F.lit(127),
                    F.round(
                        (F.element_at(F.col(vec_col), i + 1).cast("double")
                         - F.element_at("__mins", i + 1))
                        / (F.element_at("__maxs", i + 1) - F.element_at("__mins", i + 1))
                        * 255
                    ).cast("int")
                    - 128,
                ),
            ),
        ).otherwise(F.lit(0)),
    )
    return (
        df.join(F.broadcast(cal))
        .withColumn(f"{vec_col}_q", q)
        .drop("__mins", "__maxs")
    )


# ---------------------------------------------------------------------------
# Persisted IVF index (index lifecycle: build / query / append)
# ---------------------------------------------------------------------------

_IVF_META = "_IVF_META.json"


def build_ivf_index(
    df: DataFrame,
    path: str,
    num_buckets: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> dict:
    """Materialize the IVF index AT REST: assign buckets (one narrow
    projection — the hyperplanes are seed-derived expressions, so there
    is nothing to train or store beyond the seed) and write the corpus
    partitioned by bucket, plus a metadata sidecar. A probe then reads
    ONLY its probed bucket directories — partition pruning turns the
    ~P/B candidate fraction into a P/B *disk-read* fraction, which is
    the point of an at-rest index: the in-memory form still scans and
    filters the full corpus file set.
    """
    import json
    import os

    from neulix_datahub_spark.operators.skew import rebalance_for_write

    # rebalance by bucket before the partitioned write: without it every
    # input partition opens a writer per touched bucket (#partitions ×
    # #buckets small files — the classic small-file spray); with it AQE
    # coalesces each bucket to ~few right-sized files and still SPLITS a
    # hot bucket across writers instead of bottlenecking one task
    bucketed = rebalance_for_write(
        ivf_assign_buckets(df, num_buckets, vec_col, seed), "bucket"
    )
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(path)
    spark = df.sparkSession
    meta = {
        "num_buckets": num_buckets,
        "seed": seed,
        "vec_col": vec_col,
        "id_col": id_col,
        # count the LANDED files (parquet-footer metadata, near-free)
        # instead of df.count(), which would re-execute the whole input
        # lineage a second time right after writing it
        "n_vecs": spark.read.parquet(path).count(),
    }
    # os-level sidecar write: the same local/posix-fs assumption as the
    # snapshot pointer machinery (documented repo-wide); an object-store
    # deployment swaps this one call for its FS API or a table property
    with open(os.path.join(path, _IVF_META), "w", encoding="utf-8") as f:
        json.dump(meta, f, sort_keys=True)
    return meta


def read_ivf_meta(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path, _IVF_META), encoding="utf-8") as f:
        return json.load(f)


def query_ivf_index(
    spark,
    path: str,
    query_vector: list[float],
    k: int = 10,
    n_probes: int | None = None,
    hamming_probe: int = 1,
) -> DataFrame:
    """Search a persisted IVF index: compute the probe-bucket set
    driver-side (same policy helper as ivf_top_k), scan ONLY those
    bucket directories (the `bucket IN (...)` filter is a partition
    filter — directory pruning, verified by unit), exact cosine within.
    """
    meta = read_ivf_meta(path)
    probes = probe_bucket_set(
        spark, query_vector, meta["num_buckets"],
        n_probes=n_probes, hamming_probe=hamming_probe,
        vec_col=meta["vec_col"], seed=meta["seed"],
    )
    return (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(*probes))
        .select(
            F.col(meta["id_col"]),
            _cosine_to_literal(F.col(meta["vec_col"]), query_vector).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(meta["id_col"]))
        .limit(k)
    )


def append_to_ivf_index(df: DataFrame, path: str) -> None:
    """Incremental index maintenance: bucket the new vectors with the
    index's OWN stored parameters and append — only the touched bucket
    directories gain files; existing data never rewrites. (LSH buckets
    need no re-training, so append never degrades the index structure —
    the file-count growth inside hot buckets is what compaction
    maintenance is for.)"""
    import json
    import os

    meta = read_ivf_meta(path)
    bucketed = ivf_assign_buckets(
        df, meta["num_buckets"], meta["vec_col"], meta["seed"]
    )
    bucketed.write.mode("append").partitionBy("bucket").parquet(path)
    # keep the sidecar's vector count true: every consumer of n_vecs
    # (recall denominators, compaction triggers) would otherwise drift
    # further from reality with each append
    meta["n_vecs"] = df.sparkSession.read.parquet(path).count()
    with open(os.path.join(path, _IVF_META), "w", encoding="utf-8") as f:
        json.dump(meta, f, sort_keys=True)


def hard_negative_candidates(
    df: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    sim_ceiling: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Contrastive-training hard-negative mining: per probe, the ``k``
    HIGHEST-cosine neighbors strictly below ``sim_ceiling``. The
    ceiling is the part naive top-k mining gets wrong: the very nearest
    neighbors of a document are usually its near-duplicates or true
    positives, and labelling those as negatives poisons a contrastive
    loss — hard negatives live in the band just below "same thing".

    Plan shape = cosine_self_join_top_k's: the probe set broadcasts
    against one corpus scan, the band filter runs BEFORE the ranking
    window, and the window partitions by probe (bounded k rows out per
    probe). At 100 TB swap the scan side for the IVF index
    (query_ivf_index) — same band-then-rank composition over the
    candidate subset.
    """
    return _probe_top_k(
        df, probe_ids, k, vec_col, id_col, sim_ceiling=sim_ceiling
    )


def _nearest_code(sub_vec: Column, cents: list[list[float]]) -> Column:
    """Index of the nearest centroid (squared L2, first-wins ties) as a
    pure expression with the centroids inlined as literals — the PQ
    encode step, shared by the one-shot composition and the persisted
    index's build/ingest so both provably encode identically."""
    # one transform over the codebook as a single nested literal (the
    # _assign_expr plan-size lesson: k·dim inline literal nodes cost
    # ~1 s of Catalyst analysis per fresh plan; same fold arithmetic,
    # same order, bit-identical codes)
    table = const_double_matrix(cents)
    dists = F.transform(
        table,
        lambda c: F.aggregate(
            F.zip_with(
                sub_vec,
                c,
                lambda x, y: (x.cast("double") - y)
                * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _block_dot(q_block: list[float], c_block: list[float]) -> float:
    """Left-to-right double dot product of two Python float blocks —
    the SAME accumulation order as :func:`_dot`'s fold and the oracle's
    ``list_sum(list_transform(...))``, so driver-side scalars derived
    from collected centroids are bit-identical across engines."""
    acc = 0.0
    for x, y in zip(q_block, c_block):
        acc += float(x) * float(y)
    return acc


def ivf_pq_search(
    df: DataFrame,
    query_vector: list[float],
    k: int = 10,
    coarse_k: int = 8,
    coarse_iters: int = 3,
    n_probes: int = 2,
    pq_k: int = 8,
    pq_iters: int = 3,
    top_cells: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, dict]:
    """IVF-PQ composed retrieval (SURVEY §2.11 L3, round 12): the
    three-stage ANN funnel a production vector store runs — coarse
    quantizer prune → product-quantization approximate rank → exact
    re-rank — as ONE declarative query. Returns ``(top-k DataFrame
    (id, score), info dict)`` where info carries the funnel counts
    (``n_candidates`` after the coarse probe, ``n_shortlist`` after the
    PQ cut) that prove each stage actually pruned.

    Stage 1 — IVF coarse probe: a deterministic k-means coarse
    quantizer (:func:`~neulix_datahub_spark.operators.clustering
    .kmeans_lloyd`: md5-seeded init, argmin assignment, so a DuckDB
    oracle replays every step) partitions the corpus into ``coarse_k``
    cells; the query probes its ``n_probes`` nearest coarse centroids
    (driver-side argmin over k·d floats) and only those cells'
    vectors survive. (The LSH-bucketed :func:`ivf_top_k` family covers
    the data-independent-bucketing regime; the k-means coarse quantizer
    here is the classic IVF formulation and, unlike xxhash64 planes,
    is exactly replayable in SQL — every count this function emits can
    be hash-checked, not just bound-pinned.)

    Stage 2 — PQ shortlist: the vector splits into two halves, each
    with its own ``pq_k``-codeword codebook (two more deterministic
    Lloyd runs — the pq_codebook_profile machinery); a candidate's
    approximate score is the cosine between the query and its CELL
    reconstruction (concatenated codewords), which depends only on the
    (code0, code1) cell — so the per-subspace dot/norm tables are
    computed ONCE driver-side (pq_k·2 scalars, asymmetric-distance
    style) and the cut keeps candidates in the ``top_cells``
    best-scoring cells OF ALL pq_k² cells (cell-grain cut: no
    within-cell tie-break on row ids, so near-duplicate vectors in one
    cell never straddle the cut; ranking the fixed k² cell table is
    data-size-independent and happens on the driver).

    Stage 3 — exact re-rank: full-precision cosine over the shortlist
    only, 6-dp-rounded, id tie-break — the same contract as
    :func:`cosine_top_k`.

    Scale: stages 1-2 are narrow projections with literal centroid
    arrays (no shuffle, no UDF); the only wide op is stage 3's
    TakeOrderedAndProject over the shortlist. Driver traffic is
    O(coarse_k·d + pq_k·d) floats — never rows. At 100 TB the corpus
    would be written partitioned by coarse cell (build_ivf_index's
    layout) so stage 1 is directory pruning; compose via
    ``build_ivf_index`` + this function's stages 2-3 over the probed
    read."""
    import math

    from neulix_datahub_spark.operators.clustering import (
        assign_clusters,
        kmeans_lloyd_fused,
    )

    d = len(query_vector)
    if d % 2 != 0:
        raise ValueError(f"vector dim must be even for 2 subspaces, got {d}")
    half = d // 2
    q = [float(x) for x in query_vector]

    # stages 1+2 training, fused: the coarse quantizer and both PQ
    # subspace codebooks are three INDEPENDENT Lloyd problems over the
    # same corpus scan, so they train in one fused pass per iteration
    # (kmeans_lloyd_fused — bit-identical to the sequential loops, a
    # third of the corpus passes; 12 Spark jobs → 4).
    subspaces = [(1, half), (half + 1, half)]
    coarse, *codebooks = kmeans_lloyd_fused(
        df,
        [
            (F.col(vec_col), coarse_k, coarse_iters),
            *[
                (F.slice(vec_col, start, ln), pq_k, pq_iters)
                for start, ln in subspaces
            ],
        ],
        id_col=id_col,
    )

    # stage 1: driver-side probe selection over the coarse centroids
    assigned = assign_clusters(df, coarse, vec_col)
    d2 = []
    for ci, c in enumerate(coarse):
        acc = 0.0
        for i in range(d):
            diff = q[i] - float(c[i])
            acc += diff * diff
        d2.append((acc, ci))
    probes = [ci for _, ci in sorted(d2)[:n_probes]]
    cand = assigned.filter(F.col("cluster").isin(*probes))
    # asymmetric tables: per codeword, dot(q_sub, codeword) and |codeword|²
    dots, norm2 = [], []
    for s, (start, ln) in enumerate(subspaces):
        q_sub = q[start - 1 : start - 1 + ln]
        dots.append([_block_dot(q_sub, c) for c in codebooks[s]])
        norm2.append([_block_dot(c, c) for c in codebooks[s]])
    qn = math.sqrt(_block_dot(q, q))
    cells = []
    for c0 in range(pq_k):
        for c1 in range(pq_k):
            denom = qn * math.sqrt(norm2[0][c0] + norm2[1][c1])
            score = (dots[0][c0] + dots[1][c1]) / denom
            cells.append((score, c0, c1))
    cells.sort(key=lambda t: (-t[0], t[1], t[2]))
    kept_cells = [(c0, c1) for _, c0, c1 in cells[:top_cells]]

    coded = cand.select(
        F.col(id_col),
        F.col(vec_col),
        _nearest_code(F.slice(vec_col, 1, half), codebooks[0]).alias("__c0"),
        _nearest_code(F.slice(vec_col, half + 1, half), codebooks[1]).alias(
            "__c1"
        ),
    )
    keep = F.array(
        *[F.lit(c0 * pq_k + c1) for c0, c1 in kept_cells]
    )
    shortlist = coded.filter(
        F.array_contains(keep, F.col("__c0") * pq_k + F.col("__c1"))
    )

    # stage 3: exact re-rank over the shortlist
    topk = (
        shortlist.select(
            F.col(id_col),
            F.round(
                _cosine_to_literal(F.col(vec_col), q), 6
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
    # the two funnel counts are extra bounded jobs serving the
    # verification query this composition exists for; production
    # probing belongs on the persisted index
    # (operators/ivfpq_index.query_ivfpq_index / _batch), which
    # amortizes the three Lloyd trainings this one-shot form re-runs
    # per call
    info = {
        "probes": probes,
        "kept_cells": kept_cells,
        "n_candidates": cand.count(),
        "n_shortlist": shortlist.count(),
    }
    return topk, info
