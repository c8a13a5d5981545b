"""Deduplication operators (SURVEY §2.3 J1, §2.11 L1/L2).

Reference semantics:
- J1 dedupe-append: collect existing ids, append only rows whose id is not
  already present (``core/utils/sheets_core.py:163-177``) — an anti-join.
- The reference has no content dedup; L1/L2 are the training-data-pipeline
  extensions: exact dedup by content hash, and near-dup detection via
  MinHash banding / SimHash — the standard large-corpus recipes.

Scale design:
- exact dedup shuffles on a 256-bit content hash (uniform keys, no skew);
- MinHash banding turns the O(n²) pair problem into an equi-join on
  (band_id, band_hash) buckets — only same-bucket pairs are compared, the
  canonical LSH trick. Everything is built-in expressions (xxhash64,
  transform, aggregate) — no Python in the hot path, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dedupe_append(
    existing: DataFrame, incoming: DataFrame, key: str, broadcast_existing_keys: bool = True
) -> DataFrame:
    """J1: rows of ``incoming`` whose ``key`` is absent from ``existing``
    (``sheets_core.py:163-177``). Blank/null keys are skipped from the
    existing set, as the reference does (``sheets_core.py:171-176``).

    The existing side is reduced to its distinct keys before the anti-join,
    so with a bounded key set it broadcasts and the incoming scan never
    shuffles.
    """
    keys = (
        existing.select(F.col(key))
        .filter(F.col(key).isNotNull() & (F.trim(F.col(key).cast("string")) != ""))
        .distinct()
    )
    if broadcast_existing_keys:
        keys = F.broadcast(keys)
    return incoming.join(keys, on=key, how="left_anti")


def normalize_text(col: Column | str) -> Column:
    """Canonical text form for content dedup: lowercase, collapse
    whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def content_fingerprint(col: Column | str) -> Column:
    """L4-style document fingerprint: sha2-256 of the normalized text."""
    return F.sha2(normalize_text(col), 256)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """L1: keep one row (minimum id — deterministic) per normalized-content
    fingerprint.

    Plan shape: single scan → groupBy(fingerprint) with ``min(struct(id,
    rest...))`` — struct comparison is lexicographic, and the id leads, so
    the min struct IS the min-id row. The struct-min aggregate gets a
    map-side partial combine, so duplicate rows collapse *before* the
    shuffle: on a dup-heavy 100 TB corpus the exchange carries roughly one
    row per distinct document. (The groupBy + semi-join formulation scans
    twice and shuffles the full data by id; a window formulation shuffles
    everything with no partial agg — both strictly worse.)
    """
    other = [c for c in df.columns if c != id_col]
    # NULL text has no content to deduplicate ON: its fingerprint is
    # NULL, and a plain groupBy would treat every such row as ONE group
    # and silently delete all but the min-id one. Coalescing the group
    # key to a per-row unique value keeps each NULL-text row its own
    # survivor — still one pass, one shuffle (the sentinel prefix can't
    # collide with real sha-256 hex).
    fp = F.coalesce(
        content_fingerprint(text_col),
        F.concat(F.lit("__nulltext__"), F.col(id_col).cast("string")),
    )
    packed = df.select(
        fp.alias("__fp"),
        F.struct(F.col(id_col), *[F.col(c) for c in other]).alias("__row"),
    )
    return (
        packed.groupBy("__fp")
        .agg(F.min("__row").alias("__row"))
        .select("__row.*")
        .select(*df.columns)
    )


def _shingles(col: Column, n: int) -> Column:
    """Word n-gram shingle set of the normalized text (distinct).

    Built by one ``regexp_extract_all`` pass: a zero-width match at every
    token start (lookbehind ``(?<=^|\\s)``) whose lookahead captures the
    next ``n`` tokens — overlapping n-grams in a single JVM regex scan.
    The obvious ``transform(sequence(...), i -> concat_ws(slice(...)))``
    form computes the same set but higher-order functions fall out of
    whole-stage codegen into the interpreted evaluator: measured 8x
    slower (3.7 s vs 0.46 s for the sf0.1 8-gram explode). Documents
    shorter than ``n`` tokens degrade to one whole-text shingle, exactly
    like the DuckDB oracles' CASE fallback."""
    normed = normalize_text(col)
    pat = rf"(?<=^|\s)(?=((?:\S+ ){{{n - 1}}}\S+))"
    grams = F.regexp_extract_all(normed, F.lit(pat), F.lit(1))
    # NULL text -> EMPTY set, not array(NULL): xxhash64(NULL) is the
    # constant seed hash, so array(NULL) made every NULL-text document
    # a jaccard-1.0 "near-duplicate" of every other one across the
    # minhash/ngram/simhash paths. Empty sets pair with nothing.
    return F.array_distinct(
        F.when(F.size(grams) > 0, grams)
        .when(normed.isNotNull(), F.array(normed))
        .otherwise(F.array().cast("array<string>"))
    )


def minhash_signature(col: Column | str, num_hashes: int = 64, n: int = 3,
                      seed: int = 42) -> Column:
    """MinHash signature (array<bigint>, length ``num_hashes``) over word
    ``n``-gram shingles.

    The i-th signature slot is ``min(xxhash64(shingle, seed, i))`` over the
    shingle set — one independent 64-bit hash family per slot, fully
    deterministic, computed as built-in array expressions (no UDF, stays
    in codegen).
    """
    c = F.col(col) if isinstance(col, str) else col
    # Hash each shingle string ONCE, then derive the per-slot families by
    # re-hashing the 8-byte value — string shingling is the expensive part
    # and must not be repeated per slot. The whole signature is ONE nested
    # transform expression (not num_hashes unrolled aggregates): unrolling
    # blows the expression tree past the codegen limits and the plan falls
    # back to interpreted evaluation, ~10x slower.
    base = F.transform(_shingles(c, n), lambda s: F.xxhash64(s, F.lit(seed)))
    # ONE fold over the hashed shingles with the num_hashes-slot min
    # vector as accumulator: a per-slot `array_min(transform(base, ...))`
    # would re-reference base num_hashes times, and CSE does not reach
    # inside lambdas — the shingling would run once per slot.
    maxes = F.array_repeat(F.lit((1 << 63) - 1).cast("long"), num_hashes)
    return F.aggregate(
        base,
        maxes,
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda a, i: F.least(a, F.xxhash64(h, i)),
        ),
    )


def banded_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """The LSH banding projection ``(__id, band, band_hash)`` — the
    deterministic function of a document's text that decides which
    buckets it lands in. Shared by the one-shot candidate join
    (:func:`minhash_near_duplicates`) and the persisted signature index
    (``operators/dedupe_index.py``): the same expression tree on both
    paths is what makes the incremental candidate set provably EQUAL to
    the batch one (band collision is a pure function of the text), not
    merely similar."""
    _validate_banding(num_hashes, bands)
    rows_per_band = num_hashes // bands
    # NULL text has an EMPTY shingle set; its signature would be the
    # constant init array, making every NULL-text doc band-collide with
    # every other one — they carry no content to near-match on
    sig = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        minhash_signature(text_col, num_hashes, shingle_n, seed).alias("__sig"),
    )
    # Materialization barrier: without it Catalyst inlines the signature
    # expression into every band computation AND both join sides —
    # recomputing the expensive shingling ~2×bands times. The repartition
    # shuffles only (id, 64×8B signature) and is reused by both sides of
    # the self-join (ReusedExchange).
    sig = sig.repartition("__id")
    return sig.select(
        "__id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.transform(
                        F.slice("__sig", b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ))
                ),
            )
        ).alias("band", "band_hash"),
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """L2: candidate near-duplicate pairs via MinHash + LSH banding.

    Returns ``(id_a, id_b, n_bands)`` with ``id_a < id_b`` — pairs that
    collide in ≥1 of ``bands`` bands (rows per band = num_hashes/bands).
    Candidates should be verified with a Jaccard estimate (fraction of
    matching signature slots) by the caller if precision matters.

    Plan shape: signature (narrow) → explode to ``bands`` rows → shuffle
    on (band, band_hash) → self-join within buckets. At 100 TB the bucket
    join replaces the quadratic cross-product; skewed mega-buckets (e.g.
    boilerplate docs) are handled by AQE skew-join splitting.
    """
    banded = banded_signatures(
        df, text_col, id_col, num_hashes, bands, shingle_n, seed
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .groupBy(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )
    return pairs


def _validate_grid_threshold(threshold: float) -> None:
    """The pair operators round jaccard to 6 dp before thresholding
    (mirrored in every DuckDB oracle). For a threshold ON the 1e-6 grid
    that introduces no false negatives — round(j,6) >= j - 5e-7 lands
    back on the grid at or above the threshold whenever j >= t — only
    possible epsilon-INCLUSIONS of pairs within 5e-7 below it. An
    OFF-grid threshold breaks that argument (a qualifying pair can
    round below it), so it is refused here rather than silently
    weakening the documented zero-false-negative contract."""
    if round(threshold, 6) != threshold:
        raise ValueError(
            f"threshold {threshold!r} is not representable at 6 decimal "
            "places — the 6-dp jaccard rounding could drop qualifying "
            "pairs; pass a threshold on the 1e-6 grid"
        )


def _validate_banding(num_hashes: int, bands: int) -> None:
    """LSH banding is only well-defined when bands evenly tiles the
    signature: bands > num_hashes makes rows-per-band 0, every band
    hash becomes hash('') for EVERY document, and the bucket join
    degenerates to the full O(n²) cross product; a non-divisor silently
    ignores trailing signature slots, weakening the collision
    probability the miss-rate math relies on."""
    if not 1 <= bands <= num_hashes or num_hashes % bands != 0:
        raise ValueError(
            f"bands must divide num_hashes with 1 <= bands <= num_hashes; "
            f"got num_hashes={num_hashes}, bands={bands}"
        )


def jaccard_expr(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array columns (set semantics —
    array_intersect/array_union both dedupe), as a codegen'd expression."""
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(F.array_union(a, b))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    threshold: float = 0.02,
    block_col: str | None = None,
    max_block: int | None = None,
) -> DataFrame:
    """L2 variant: exact word n-gram Jaccard over document pairs.

    Pairs are generated within ``block_col`` groups (e.g. language) when
    given — at scale you NEVER all-pairs the corpus; the block column is
    the cheap stand-in for an LSH bucket (compose with
    ``minhash_near_duplicates`` to generate candidates and this to verify
    them exactly). Returns ``(id_a, id_b, jaccard)`` with ``id_a < id_b``
    and ``jaccard >= threshold``.

    ``max_block`` bounds the quadratic blow-up of a hot block (a
    boilerplate-heavy language at 100 TB): blocks are split into
    ≤max_block chunks and the self-join runs per chunk-PAIR task via
    :func:`~neulix_datahub_spark.operators.skew.with_pair_tasks` — output
    identical to the unbounded join (asserted in tests), per-task pair
    count ≤ max_block², shuffle volume ×ceil(B/max_block) for a B-row
    block. Leave None only when the blocking key is already
    bounded-by-construction (e.g. an LSH band bucket).

    Plan: one scan computes shingle sets (narrow), self-join shuffles both
    sides on the block key, Jaccard is a pure array expression — no UDF.
    The per-pair intersection runs over xxhash64'd shingles, not strings:
    |A∩B| and |A∪B| are invariant under an injective map, long equality
    beats string equality in the intersect's hash set, and the shuffled
    arrays shrink to 8 bytes/shingle — measured 2.3x on the sf0.1 probe
    self-join with bit-identical output.
    """
    _validate_grid_threshold(threshold)
    if max_block is not None and block_col is None:
        raise ValueError("max_block requires block_col")
    sh = df.select(
        F.col(id_col).alias("__id"),
        *( [F.col(block_col).alias("__blk")] if block_col else [] ),
        F.array_distinct(
            F.transform(_shingles(F.col(text_col), n), lambda s: F.xxhash64(s))
        ).alias("__sh"),
    ).withColumn("__sz", F.size("__sh"))
    # Materialization barrier: otherwise Catalyst inlines the shingling
    # expression into both sides of the self-join and recomputes it per
    # PAIR instead of per document (measured 34s -> ~2s at sf0.1). The
    # bounded path gets the same barrier from with_pair_tasks' window
    # exchange (ReusedExchange dedupes it across the join's two sides).
    if max_block is not None:
        from neulix_datahub_spark.operators.skew import with_pair_tasks

        sh = with_pair_tasks(sh, ["__blk"], max_block, "__id")
    else:
        sh = sh.repartition(F.col("__blk") if block_col else F.col("__id"))
    # Dataset-alias self-join (NOT per-side rename projections): keeping
    # the two sides canonically IDENTICAL sub-plans lets a shuffle-join
    # plan reuse one exchange for both inputs — shingling + windowed
    # explode then compute once, not twice. At toy SF AQE broadcasts
    # (build side is tiny) so the reuse is latent; interleaved A/B at
    # sf0.1 measured alias 1.32s vs renamed 1.44s under broadcast, and
    # 1.17s when a shuffle join is forced (reuse realized). No join
    # hint is forced: at the 100 TB design point the exploded pair-task
    # table exceeds the broadcast threshold and AQE lands on the
    # shuffle join — and with it the shared exchange — by itself.
    left, right = sh.alias("l"), sh.alias("r")
    cond = F.col("l.__id") < F.col("r.__id")
    if block_col:
        cond = cond & (F.col("l.__blk") == F.col("r.__blk"))
    if max_block is not None:
        cond = (
            cond
            & (F.col("l.__task_i") == F.col("r.__task_i"))
            & (F.col("l.__task_j") == F.col("r.__task_j"))
            & (
                (F.col("l.__chunk") != F.col("r.__chunk"))
                | (F.col("l.__task_i") == F.col("l.__task_j"))
            )
        )
    # Shingle arrays are distinct, so |A∪B| = |A|+|B|-|A∩B|: one
    # array_intersect per pair (CSE merges the two references in codegen)
    # instead of intersect + union — halves the per-pair hash-set work.
    inter = F.size(F.array_intersect(F.col("l.__sh"), F.col("r.__sh"))).cast("double")
    return (
        left.join(right, cond)
        .select(
            F.col("l.__id").alias("id_a"),
            F.col("r.__id").alias("id_b"),
            F.round(
                inter / (F.col("l.__sz") + F.col("r.__sz") - inter), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def verify_candidate_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """L2 verification stage: exact word n-gram Jaccard over a candidate
    pair list (``(id_a, id_b, ...)``) — the second half of the canonical
    candidates→verify near-dup recipe (``minhash_near_duplicates`` emits
    the candidates).

    Returns ``(id_a, id_b, jaccard)`` for pairs at or above ``threshold``.

    Scale shape: the candidate list is tiny relative to the corpus (LSH
    prunes the quadratic pair space), so this is two id-equi-joins of a
    small relation against the shingle projection — no self-join, no
    cross-product, Jaccard as a pure array expression.
    """
    return verify_pairs_with_shingles(
        pairs, shingle_projection(df, text_col, id_col, n), threshold
    )


def shingle_projection(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """``(__vid, __vsh, __vsz)`` — each document's xxhash64'd word
    ``n``-gram shingle set with its size, the verify stage's working
    relation. Hashed shingles for the same reason as in
    ngram_jaccard_pairs: identical Jaccard, cheaper per-pair set work
    and an 8-byte/shingle shuffle. Shared by the one-shot verify and
    the persisted signature index so the exact-Jaccard verdicts of the
    batch and incremental paths are the same expression, bit for bit.
    NULL-text documents carry no shingles and are dropped (they can
    never appear in a candidate pair — banding filters them too)."""
    sh = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__vid"),
        F.array_distinct(
            F.transform(_shingles(F.col(text_col), n), lambda s: F.xxhash64(s))
        ).alias("__vsh"),
    ).withColumn("__vsz", F.size("__vsh"))
    # Materialization barrier: keeps Catalyst from inlining the shingle
    # expression into both join sides (same pathology as in
    # ngram_jaccard_pairs above — shingles must be computed once per doc).
    return sh.repartition("__vid")


def verify_pairs_with_shingles(
    pairs: DataFrame, sh: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of ``(id_a, id_b, ...)`` candidates
    against a precomputed :func:`shingle_projection` relation ``sh`` —
    the from-features form of :func:`verify_candidate_pairs`, used by
    the incremental index where prior documents' shingles come from
    parquet instead of being recomputed from text."""
    _validate_grid_threshold(threshold)
    a = sh.select(
        F.col("__vid").alias("id_a"), F.col("__vsh").alias("__sh_a"),
        F.col("__vsz").alias("__sz_a"),
    )
    b = sh.select(
        F.col("__vid").alias("id_b"), F.col("__vsh").alias("__sh_b"),
        F.col("__vsz").alias("__sz_b"),
    )
    # Shingle arrays are distinct, so |A∪B| = |A|+|B|-|A∩B| (see
    # ngram_jaccard_pairs for why intersect-only halves the work).
    inter = F.size(F.array_intersect(F.col("__sh_a"), F.col("__sh_b"))).cast("double")
    return (
        pairs.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter / (F.col("__sz_a") + F.col("__sz_b") - inter), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(col: Column | str, num_bits: int = 64, shingle_n: int = 2,
            seed: int = 42) -> Column:
    """L2 variant: 64-bit SimHash of the text's shingle set — per-bit
    majority vote over shingle hashes, as a single array expression.

    Near-dups then differ in few bits: compare with
    ``bit_count(simhash(a) ^ simhash(b)) <= k`` after an LSH-style
    band join on hash prefixes.
    """
    c = F.col(col) if isinstance(col, str) else col
    hashes = F.transform(_shingles(c, shingle_n), lambda s: F.xxhash64(s, F.lit(seed)))
    # Per-bit majority vote: +1 when the shingle hash has the bit set, -1
    # otherwise; bit i of the result is 1 iff the vote is positive. Packed
    # with shift/OR (bit ops don't overflow under ANSI; arithmetic would).
    # Built as ONE nested transform/aggregate expression — an unrolled
    # num_bits-term chain exceeds codegen limits and drops the whole
    # projection to interpreted mode (~10x slower).
    # ONE pass over the shingle hashes with the 64-long vote vector as the
    # fold accumulator — num_bits separate aggregates would each
    # re-reference (and re-compute) the shingling expression, since
    # common-subexpression elimination does not reach inside lambda
    # functions.
    zeros = F.array_repeat(F.lit(0).cast("long"), num_bits)
    votes = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(num_bits - 1)),
            lambda a, i: a + F.getbit(h, i) * 2 - 1,
        ),
    )
    # 1<<i as a literal array; bit 63 is Long.MIN (same bit pattern —
    # lit(1<<63) itself would overflow the signed long).
    pows = F.array(
        *[
            F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long")
            for i in range(num_bits)
        ]
    )
    packed = F.aggregate(
        F.zip_with(
            votes,
            pows,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, b: acc.bitwiseOR(b),
    )
    return packed


def prefix_filter_join(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    set_expr: Column | None = None,
) -> DataFrame:
    """EXACT set-similarity self-join (PPJoin-style prefix filtering):
    every pair of documents whose word-set Jaccard is >= ``threshold``,
    with zero false negatives — the deterministic complement to the
    probabilistic MinHash-LSH path (which trades a small miss rate for
    fewer candidates).

    The prefix principle: order every document's distinct tokens by one
    GLOBAL rarity order (corpus frequency asc, token asc); if
    J(x, y) >= t, then x and y must share at least one token among each
    side's first ``|s| - ceil(t * |s|) + 1`` tokens. So only prefix
    tokens are exploded into the candidate join — and because the
    prefix is taken from the RAREST tokens, the candidate blocks are
    the smallest possible ones. A length filter (``t*|x| <= |y|``)
    prunes further before the exact verify.

    Plan: token-frequency agg (one shuffle) → rank join → per-doc
    sorted token array → prefix explode → equi-join on token (id_a <
    id_b dedup) → distinct candidates → exact Jaccard via
    array_intersect on the two full token arrays. All expression-level;
    the candidate join is an ordinary shuffled equi-join whose hot keys
    are, by construction, the rarest tokens. At 100 TB the frequency
    table is the only global state and it broadcast-joins.

    Returns (id_a, id_b, jaccard) for pairs meeting the threshold.
    Completeness (== brute force) is unit-proven; the driver query
    hashes it against an all-pairs DuckDB oracle.

    ``set_expr`` overrides the element set (default: distinct lowercase
    words). Pass ``_shingles(col, n)`` for n-gram sets — on corpora with
    a small shared vocabulary, word sets are near-degenerate (most pairs
    qualify) while shingle sets isolate true near-duplicates; the choice
    changes WHAT similarity means, not the algorithm.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    _validate_grid_threshold(threshold)
    toks = (
        set_expr
        if set_expr is not None
        else F.array_distinct(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda t: t != ""
            )
        )
    )
    docs = df.select(F.col(id_col).alias("id"), toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    freq = (
        docs.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked_toks = (
        docs.select("id", F.explode("toks").alias("tok"))
        .join(freq, "tok")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("freq", "tok"))
                ),
                lambda s: s["tok"],
            ).alias("toks"),
            F.count(F.lit(1)).alias("sz"),
        )
    )
    prefix_len = (F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1).cast(
        "int"
    )
    prefixes = ranked_toks.select(
        "id", "sz", F.explode(F.slice("toks", 1, prefix_len)).alias("tok")
    )
    a = prefixes.select(
        F.col("id").alias("id_a"), F.col("sz").alias("sz_a"), "tok"
    )
    b = prefixes.select(
        F.col("id").alias("id_b"), F.col("sz").alias("sz_b"), "tok"
    )
    cands = (
        a.join(b, "tok")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("sz_b") * F.lit(threshold) <= F.col("sz_a"))
            & (F.col("sz_a") * F.lit(threshold) <= F.col("sz_b"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    ta = ranked_toks.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    tb = ranked_toks.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size("toks_a") + F.size("toks_b") - inter
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("jaccard", F.round(inter.cast("double") / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
