"""Corpus-curation operators for training-data pipelines (SURVEY §2.11
L4+): benchmark decontamination, deterministic content-hash mixing /
sampling, and C4-style boilerplate-line removal.

Not in the reference (its text handling stops at stringify/strip) —
these are the standard large-corpus curation steps a 100 TB pipeline
runs between dedup and packing. Everything is built-in Column
expressions and DataFrame composition; nothing crosses into Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from neulix_datahub_spark.operators.dedupe import _shingles, normalize_text

# ---------------------------------------------------------------------------
# Benchmark n-gram contamination (decontamination pass)
# ---------------------------------------------------------------------------


def benchmark_ngram_contamination(
    train: DataFrame,
    bench: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 8,
    prefilter_bits: int | None = None,
) -> DataFrame:
    """Flag training documents that share any word ``n``-gram with a
    benchmark/eval document — the GPT-3/PaLM-style decontamination test
    (they use 8–13-gram overlap; default 8).

    Plan shape: both sides explode their distinct shingle sets and meet
    in a LEFT SEMI equi-join on the shingle string, then a distinct on
    the training id. The training side is linear fan-out over the corpus
    scan (no pre-shuffle); the benchmark side is a real eval set — fixed
    size, *not* growing with corpus scale — so at 100 TB AQE turns the
    semi-join into a broadcast automatically. No hint is forced here
    because in *this* fixture the probe set is carved out of the corpus
    and therefore scales with SF (see tests/test_plan_shapes.py).

    ``prefilter_bits`` (opt-in, e.g. 2^18): Bloom-prune the training
    grams BEFORE they reach the semi-join's exchange (sketches.
    bloom_build over the benchmark grams, one broadcast row, xxhash64
    family — engine-internal, never oracle-visible). The filter only
    shrinks what moves, never the answer (no false negatives; false
    positives die in the exact semi-join — invariance pinned in
    tests/test_curation.py). Use it ONLY when the benchmark-gram side
    exceeds the broadcast threshold: while the semi-join broadcasts,
    there is no exchange to avoid and the filter is pure overhead
    (measured at sf0.1 where AQE broadcasts: 1.95 s with vs 1.41 s
    without). At a real multi-benchmark eval suite (gram set >> 64 MB)
    the semi-join shuffles the full corpus gram fan-out, and the
    pre-shuffle prune is the difference between moving |corpus grams|
    and |matches| + ε.

    Returns distinct ``(id_col)`` rows of contaminated training docs.
    """
    train_grams = train.select(
        F.col(id_col),
        F.explode(_shingles(F.col(text_col), n)).alias("__gram"),
    )
    bench_grams = bench.select(
        F.explode(_shingles(F.col(bench_text_col), n)).alias("__gram")
    ).distinct()
    if prefilter_bits is not None:
        from neulix_datahub_spark.operators.sketches import (
            bloom_build,
            bloom_prefilter,
        )

        bloom = bloom_build(bench_grams, "__gram", num_bits=prefilter_bits)
        train_grams = bloom_prefilter(
            train_grams, "__gram", bloom, num_bits=prefilter_bits
        )
    return (
        train_grams.join(bench_grams, "__gram", "left_semi")
        .select(id_col)
        .distinct()
    )


def benchmark_excerpt(
    df: DataFrame, *, text_col: str = "text", first_tokens: int = 12
) -> DataFrame:
    """Deterministic pseudo-benchmark for fixtures without a real eval
    set: the first ``first_tokens`` tokens of each document's normalized
    text. Pure SQL-expressible so a DuckDB oracle can rebuild it."""
    tokens = F.split(normalize_text(F.col(text_col)), " ")
    return df.select(
        F.concat_ws(" ", F.slice(tokens, 1, first_tokens)).alias(text_col)
    )


# ---------------------------------------------------------------------------
# Deterministic content-hash mixing / sampling
# ---------------------------------------------------------------------------


def hash_bucket_hex(col: Column | str, digits: int = 4, *, salt: str = "") -> Column:
    """Leading ``digits`` hex chars of md5(salt || text) — a
    deterministic, content-addressed sampling key. Fixed-length
    lowercase hex compares lexicographically exactly as its numeric
    value, so thresholding is a plain string comparison that any engine
    (Spark, DuckDB, Trino) reproduces bit-for-bit.

    ``salt`` is DOMAIN SEPARATION, and it is load-bearing: every
    decision family (sampling, splitting, sharding) must hash a
    DIFFERENT string, or composing them correlates catastrophically —
    measured: an un-salted 30% sample followed by an un-salted 80/10/10
    split put EVERY surviving document in train (the sample keeps
    exactly the low end of the same hash space the split's first range
    covers), leaving val/test empty. Same scheme as epoch_order_key's
    'epoch:' prefix. NULL text coalesces to '' so contentless rows
    route deterministically instead of poisoning the key to NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.coalesce(c, F.lit("")))), 1, digits
    )


def rate_to_hex_cutoff(rate: float, digits: int = 4) -> str:
    """Map a sampling rate in [0, 1] to the hex-string cutoff such that
    ``hash_bucket_hex(text) < cutoff`` keeps ~``rate`` of content
    (exactly ``floor(rate * 16**digits) / 16**digits``). Rate 1.0 maps
    to ``"g"`` — lexicographically above every hex string, keep-all —
    because the exact cutoff ``16**digits`` would be one digit longer
    and fixed-width string comparison would misorder it."""
    space = 16**digits
    if rate >= 1.0:
        return "g"
    return format(int(rate * space), f"0{digits}x")


def hash_mixing_sample(
    df: DataFrame,
    rates: dict[str, float],
    *,
    strata_col: str = "lang",
    text_col: str = "text",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic stratified down-sampling for dataset mixing: keep a
    per-stratum fraction of documents, decided by a content hash rather
    than a RNG.

    Content-addressed sampling is the property a 100 TB mixing pipeline
    needs: the keep/drop decision for a document depends only on its
    bytes, so it is identical across shards, re-runs, and engines — no
    seed plumbing, no partition-order sensitivity, and exact duplicates
    are kept or dropped *together* (sampling never breaks dedup
    invariants). Plan shape: one narrow filter over the scan; no
    shuffle, fully codegen'd.
    """
    cutoff = F.lit(rate_to_hex_cutoff(default_rate))
    for stratum, rate in sorted(rates.items()):
        cutoff = F.when(
            F.col(strata_col) == stratum, F.lit(rate_to_hex_cutoff(rate))
        ).otherwise(cutoff)
    return df.filter(hash_bucket_hex(text_col, salt="sample:") < cutoff)


def stratified_topn_sample(
    df: DataFrame,
    n: int,
    *,
    strata_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic fixed-size-per-stratum sampling: keep exactly
    ``n`` documents per stratum, chosen by content-hash rank (md5 of the
    text, id as tie-break) — the budgeted cousin of
    :func:`hash_mixing_sample` for "at most N docs per domain" caps.

    Hash-ranking gives reservoir-sampling's uniformity without its
    order-dependence: the winners are a pure function of the data, so
    re-runs, shard layouts, and engines agree. Plan shape: one shuffle
    keyed by stratum for the ``row_number`` window; at 100 TB a skewed
    mega-domain serializes through one task — pre-filter such domains
    with :func:`hash_mixing_sample` (rate ≈ budget/domain size) before
    ranking, which bounds every partition.
    """
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.concat(F.lit("topn:"), F.coalesce(F.col(text_col), F.lit("")))),
        F.col(id_col),
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 1 << 31


def portable_uniform(id_col: Column | str, rounds: int = 2) -> Column:
    """Deterministic pseudo-uniform in (0, 1] from an integer id, using
    ONLY integer arithmetic both Spark and any SQL oracle evaluate
    identically (glibc's LCG constants, iterated; no engine-specific
    hash, no libm). ``pmod(id, M)`` first maps ANY bigint id — negative
    included — into [0, M) and keeps every product below 2^62 (ANSI-
    mode overflow-safe); a signed ``%`` would follow the dividend's
    sign and let a negative id drive the LCG state negative, making the
    output ≤ 0 (0 exactly at state == -1) and the w/u priority divide
    unsafe. Low LCG bits are weak, so two rounds decorrelate the value
    from the raw id; the output (state+1)/(M+1) is in (0, 1] — never 0
    — making it safe as a divisor. SQL oracles must mirror with a
    floor-mod spelling: ``((id % M) + M) % M``.

    This is the seed discipline hash_mixing_sample applies to text,
    transplanted to integer keys: the draw is a pure function of the
    id, so shards, re-runs, and engines agree row-for-row.
    """
    state = F.col(id_col) if isinstance(id_col, str) else id_col
    state = F.pmod(state, F.lit(_LCG_M))
    for _ in range(rounds):
        state = (state * F.lit(_LCG_A) + F.lit(_LCG_C)) % F.lit(_LCG_M)
    return (state + F.lit(1)).cast("double") / F.lit(float(_LCG_M + 1))


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    *,
    strata_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling without replacement via priority sampling
    (Duffield–Lund–Thorup): each row draws priority ``w / u`` with
    ``u = portable_uniform(id)``; the top ``k`` priorities (per stratum
    when ``strata_col`` is given) are the sample. Inclusion probability
    rises with weight, and the returned ``est_weight`` column —
    ``max(w, tau)`` with ``tau`` the (k+1)-th priority — makes any
    subset-sum over the sample an UNBIASED estimator of the same sum
    over the full table (the DLT theorem), which is what a curation
    pipeline needs to audit "how many tokens would this filter drop"
    from a sample instead of a full pass.

    Fully deterministic (integer LCG draw, priority ties impossible for
    distinct ids with distinct draws, id tie-break regardless), so the
    sample is reproducible across engines — the driver query hashes it
    against a DuckDB re-derivation. Plan: one shuffle on the stratum for
    the ranking window; same skew guidance as stratified_topn_sample.
    """
    u = portable_uniform(id_col)
    pr = F.col(weight_col).cast("double") / u
    parts = [F.col(strata_col)] if strata_col else []
    w = Window.partitionBy(*parts).orderBy(F.desc("__priority"), F.col(id_col))
    ranked = (
        df.withColumn("__priority", pr)
        .withColumn("__rk", F.row_number().over(w))
        .withColumn(
            "__tau",
            F.max(F.when(F.col("__rk") == k + 1, F.col("__priority"))).over(
                Window.partitionBy(*parts)
            ),
        )
    )
    return (
        ranked.filter(F.col("__rk") <= k)
        .withColumn(
            "est_weight",
            F.greatest(
                F.col(weight_col).cast("double"), F.coalesce("__tau", F.lit(0.0))
            ),
        )
        .drop("__priority", "__rk", "__tau")
    )


# ---------------------------------------------------------------------------
# C4-style boilerplate-line removal
# ---------------------------------------------------------------------------


def _norm_line(col: Column) -> Column:
    return F.lower(F.trim(col))


def boilerplate_lines(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 10,
) -> DataFrame:
    """Distinct normalized lines occurring in at least ``min_docs``
    distinct documents — the C4 "three-sentence / repeated line" family
    of boilerplate detectors (navigation chrome, cookie banners,
    subscribe footers).

    Plan shape: explode lines (linear fan-out, no pre-shuffle) →
    groupBy(line) with a partial-aggregated approx/exact distinct-doc
    count. Line cardinality ~ corpus size, but the aggregate is map-side
    combined and the *output* (lines above threshold) is tiny — the
    exchange carries one row per distinct line, the result broadcasts.
    """
    lines = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.split(F.col(text_col), "\n")).alias("__raw"),
    ).select("__doc", _norm_line(F.col("__raw")).alias("__line"))
    return (
        lines.filter(F.col("__line") != "")
        .groupBy("__line")
        .agg(F.countDistinct("__doc").alias("__n_docs"))
        .filter(F.col("__n_docs") >= min_docs)
        .select("__line")
    )


def remove_boilerplate_lines(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 10,
) -> DataFrame:
    """Strip corpus-frequent lines from every document, preserving the
    order of the surviving lines.

    Two-pass shape (the only correct one — "is this line boilerplate" is
    a corpus-global fact): pass 1 computes the boilerplate line set
    (small — it broadcasts); pass 2 re-explodes with position, drops
    flagged lines via LEFT ANTI join, and reassembles with
    ``array_sort(collect_list(struct(pos, line)))`` so reassembly is a
    single shuffle keyed by document id. Adds ``n_lines_removed`` per
    doc; docs that were pure boilerplate survive with empty text (the
    final LEFT join from the source keeps them — a bare groupBy over
    kept lines would silently drop them).
    """
    bp = boilerplate_lines(
        df, text_col=text_col, id_col=id_col, min_docs=min_docs
    )
    other = [c for c in df.columns if c != text_col]
    base = df.withColumn(
        "__n_lines", F.size(F.split(F.col(text_col), "\n"))
    )
    lines = base.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__raw"),
    ).withColumn("__line", _norm_line(F.col("__raw")))
    rebuilt = (
        lines.join(bp, "__line", "left_anti")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__pos"), F.col("__raw")))
            ).alias("__ordered")
        )
    )
    return base.select(*other, "__n_lines").join(rebuilt, id_col, "left").select(
        *other,
        F.coalesce(
            F.concat_ws(
                "\n", F.transform(F.col("__ordered"), lambda s: s["__raw"])
            ),
            F.lit(""),
        ).alias(text_col),
        (
            F.col("__n_lines")
            - F.coalesce(F.size(F.col("__ordered")), F.lit(0))
        ).alias("n_lines_removed"),
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------


def hash_split(
    df: DataFrame,
    splits: dict[str, float],
    *,
    text_col: str = "text",
    split_col: str = "split",
    digits: int = 4,
) -> DataFrame:
    """Assign every row to a named split (e.g. train/val/test) by
    content hash: the first ``digits`` hex chars of md5(text) partition
    hash space into contiguous ranges sized by the given weights.

    Content-keyed (not id-keyed or RNG-keyed) splitting is the
    leakage-safe choice for a training corpus: exact duplicates hash
    identically and therefore land in the SAME split, so a val/test
    document can never have a byte-identical twin in train. The
    assignment is a pure function of the bytes — stable across re-runs,
    shards, engines, and corpus growth (adding documents never moves an
    existing one between splits).

    Weights must sum to ~1; the last listed split absorbs the hash-space
    remainder from cutoff rounding. Plan shape: one narrow projection —
    no shuffle, no RNG, fully codegen'd.
    """
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    names = list(splits)
    bucket = hash_bucket_hex(text_col, digits, salt="split:")
    expr: Column | None = None
    acc = 0.0
    for name in names[:-1]:
        acc += splits[name]
        cond = bucket < F.lit(rate_to_hex_cutoff(acc, digits))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    label = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(names[-1])
    )
    return df.withColumn(split_col, label)


def cluster_split(
    df: DataFrame,
    near_dup_pairs: DataFrame,
    splits: dict[str, float],
    *,
    id_col: str,
    text_col: str = "text",
    split_col: str = "split",
    cluster_col: str = "cluster",
    digits: int = 4,
) -> DataFrame:
    """Near-dup-leakage-safe split: the whole near-duplicate CLUSTER
    moves between splits as one unit.

    ``hash_split`` already guarantees byte-identical twins co-locate
    (same content hash). But after near-dedup the corpus still holds
    clusters of ~equal documents with different bytes — content-hashing
    each one independently can put a train document's 0.9-Jaccard twin
    into test, which leaks. Fix: resolve the verified near-dup pairs
    into connected components, then key every member's split off the
    cluster REPRESENTATIVE's text hash (min-id member), so the whole
    cluster lands together and the assignment stays content-addressed
    (stable across re-runs, shards and engines; adding documents never
    moves an existing singleton).

    Plan shape: component resolution is the bounded iterative join in
    operators/components.py (shuffles keyed on doc id); the rest is two
    id-keyed joins (cluster -> representative text) + the same narrow
    hash expression as ``hash_split``. Returns ``df`` plus
    ``cluster_col`` (representative id) and ``split_col``.
    """
    from neulix_datahub_spark.operators.components import connected_components

    comps = connected_components(near_dup_pairs).withColumnRenamed("id", id_col)
    with_cluster = (
        df.join(comps, on=id_col, how="left")
        .withColumn(cluster_col, F.coalesce("component", F.col(id_col)))
        .drop("component")
    )
    # Representative = the minimum cluster member PRESENT IN df, not the
    # raw component label: pairs may have been mined on a superset
    # corpus (before a quality filter), in which case the component
    # label can name a document df no longer contains — an inner join
    # keyed on the label would then silently DROP the whole cluster.
    # Recomputing the representative from df itself keeps the operator
    # total and the co-location guarantee intact.
    reps = (
        with_cluster.groupBy(cluster_col)
        .agg(F.min(id_col).alias("__rep_id"))
        .join(
            df.select(F.col(id_col).alias("__rep_id"), F.col(text_col).alias("__rep_text")),
            on="__rep_id",
        )
        .drop("__rep_id")
    )
    labeled = hash_split(
        with_cluster.join(reps, on=cluster_col),
        splits,
        text_col="__rep_text",
        split_col=split_col,
        digits=digits,
    )
    return labeled.drop("__rep_text")


def export_corpus(
    df: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    n_shards: int = 8,
    shuffle_seed: int | None = None,
) -> dict:
    """Physical training-data EXPORT: land the curated corpus as
    ``path/shard=N/`` parquet with a ``_MANIFEST.json`` recording per-
    shard row counts and an order-insensitive content checksum
    (sum of xxhash64(text) per shard, 64-bit wrapping) — what a trainer
    needs to (a) consume shards independently and (b) verify integrity
    after transfer without re-reading bytes twice.

    Shard assignment is the content-addressed md5-prefix key
    (hash_bucket_hex), so the layout is stable across re-runs and
    engines — re-exporting an unchanged corpus is byte-stable modulo
    parquet encoding. One narrow projection + one partitioned write +
    one n_shards-row aggregate; returns the manifest dict.
    """
    import json

    shard = (
        F.conv(hash_bucket_hex(text_col, 4, salt="shard:"), 16, 10).cast("long")
        % n_shards
    ).alias("shard")
    out = df.withColumn("shard", shard)
    if shuffle_seed is not None:
        # deterministic within-shard training order: sort by a seeded
        # content hash — reproducible across re-runs/engines (unlike
        # rand()) yet uncorrelated with any source ordering; trainers
        # read shards sequentially and get the same "shuffle" every
        # epoch-0 restart.
        out = out.repartition("shard").sortWithinPartitions(
            "shard", F.xxhash64(F.concat(F.lit(str(shuffle_seed)), F.col(text_col)))
        )
    out.write.mode("overwrite").partitionBy("shard").parquet(path)
    landed = out.sparkSession.read.parquet(path)
    stats = (
        landed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # wrapping 64-bit sum: stay in ANSI-safe territory by summing
            # in decimal then taking mod 2^64 back into a string
            F.sum(F.xxhash64(F.col(text_col)).cast("decimal(38,0)")).alias("__sum"),
        )
        .select(
            "shard",
            "n_rows",
            # 2^64 as an exact DECIMAL literal — `lit(2)**64` is pow(),
            # which returns DOUBLE and would round the checksum to 53
            # bits, letting small corruptions cancel invisibly
            F.pmod(
                F.col("__sum"),
                F.expr("CAST('18446744073709551616' AS DECIMAL(38,0))"),
            )
            .cast("decimal(38,0)")
            .cast("string")
            .alias("checksum"),
        )
        .collect()  # bounded: n_shards rows
    )
    manifest = {
        "n_shards": n_shards,
        "shuffle_seed": shuffle_seed,
        "shards": {
            int(r["shard"]): {"n_rows": r["n_rows"], "checksum": r["checksum"]}
            for r in stats
        },
        "total_rows": int(sum(r["n_rows"] for r in stats)),
    }
    import os

    with open(os.path.join(path, "_MANIFEST.json"), "w", encoding="utf-8") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


def verify_export(spark, path: str, text_col: str = "text") -> bool:
    """Re-derive the per-shard counts/checksums from the landed parquet
    and compare against ``_MANIFEST.json`` — the post-transfer integrity
    check. Raises ValueError naming the first mismatching shard."""
    import json
    import os

    with open(os.path.join(path, "_MANIFEST.json"), encoding="utf-8") as f:
        manifest = json.load(f)
    landed = spark.read.parquet(path)
    stats = (
        landed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.xxhash64(F.col(text_col)).cast("decimal(38,0)")).alias("__sum"),
        )
        .select(
            "shard",
            "n_rows",
            # 2^64 as an exact DECIMAL literal — `lit(2)**64` is pow(),
            # which returns DOUBLE and would round the checksum to 53
            # bits, letting small corruptions cancel invisibly
            F.pmod(
                F.col("__sum"),
                F.expr("CAST('18446744073709551616' AS DECIMAL(38,0))"),
            )
            .cast("decimal(38,0)")
            .cast("string")
            .alias("checksum"),
        )
        .collect()
    )
    got = {
        int(r["shard"]): {"n_rows": r["n_rows"], "checksum": r["checksum"]}
        for r in stats
    }
    for shard, want in manifest["shards"].items():
        if got.get(int(shard)) != want:
            raise ValueError(
                f"shard {shard} integrity mismatch: manifest {want}, "
                f"landed {got.get(int(shard))}"
            )
    if set(got) != {int(s) for s in manifest["shards"]}:
        raise ValueError("landed shards differ from manifest shard set")
    return True


def time_embargo_split(
    df: "DataFrame",
    ts_col: str,
    cutoff: str,
    embargo_days: int,
    *,
    split_col: str = "split",
) -> "DataFrame":
    """Leakage-safe TEMPORAL split with a purge gap: rows strictly
    before ``cutoff`` are ``train``; rows inside the ``embargo_days``
    window starting at the cutoff are ``purged`` (excluded from BOTH
    sides); rows at or after cutoff+embargo are ``test``.

    The embargo is the part naive time splits miss: when labels or
    features aggregate a trailing window (delivery outcomes, 30-day
    revenue, session stats), a test row just after the cutoff shares
    its lookback window with train rows - temporal leakage that
    inflates offline metrics. Purging one full window length between
    the eras severs every overlapping-window pair (the purged-K-fold
    discipline from financial ML, applied as a corpus operator).

    Complements hash_split (content identity) and cluster_split
    (near-duplicate identity): the three leakage channels - byte
    twins, near-dup twins, temporal windows - each need their own
    split discipline. Pure expression, no shuffle, deterministic.
    """
    ts = F.col(ts_col)
    lo = F.lit(cutoff).cast("timestamp")
    # interval arithmetic, NOT date_add on a truncated date: a
    # time-bearing cutoff ('... 18:00') must push the purge window a
    # full embargo past that INSTANT — truncating to midnight silently
    # shortened the window by up to a day, letting trailing-window
    # overlap leak into test (the exact leakage this operator severs)
    hi = lo + F.expr(f"INTERVAL {int(embargo_days)} DAY")
    return df.withColumn(
        split_col,
        F.when(ts < lo, "train").when(ts < hi, "purged").otherwise("test"),
    )


def temperature_mixture_sample(
    df: DataFrame,
    budget: int,
    alpha: float = 0.5,
    *,
    strata_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled mixture sampling — the multilingual-corpus
    rebalancing rule (mBERT/XLM-R style): stratum ``s`` gets quota
    ``k_s = floor(budget · n_s^α / Σ_t n_t^α)``, which up-weights small
    strata relative to their raw share (α=1 is proportional, α=0 is
    uniform; 0.5–0.7 is the usual pretraining range). Within each
    stratum the ``k_s`` content-hash-smallest documents win (salt
    ``'tmix:'`` — domain-separated from every other hash family here,
    see hash_bucket_hex), so the pick is deterministic and duplicates
    sort ADJACENTLY (ties broken by ``id_col``) — but unlike the
    rate-based samplers a fixed-size quota boundary can split a
    duplicate group (same trade as stratified_topn_sample); run exact
    dedup first when that matters.

    Cross-engine exactness (the driver hashes the result): for the
    default α=0.5 the weights are ``sqrt(n_s)`` — IEEE-754 requires
    sqrt to be correctly rounded, so both engines produce bit-identical
    doubles — and the denominator is folded in EXPLICIT ascending order
    (``aggregate(array_sort(collect_list(...)))``), not whatever
    grouping order the engine's partial aggregation happens to meet, so
    Σ is bit-identical too; every later *, /, floor is a single
    correctly-rounded op. For other α, pow() is only faithfully (not
    correctly) rounded and quotas may differ ±1 at astronomically-
    unlikely boundaries across engines.

    Plan: one groupBy(strata) count (rows = #strata), a broadcast of the
    quota relation, and one per-stratum rank window — the same shape as
    stratified_topn_sample; at 100 TB swap the rank window for the
    two-phase range-repartition rank if a single stratum outgrows a
    task's sort budget.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    from pyspark.sql.window import Window

    weight = (
        F.sqrt(F.col("__n"))
        if alpha == 0.5
        else F.pow(F.col("__n"), F.lit(alpha))
    )
    counts = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__w", weight)
    )
    denom = counts.agg(
        F.aggregate(
            F.array_sort(F.collect_list("__w")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("__S")
    )
    quota = counts.crossJoin(denom).select(
        strata_col,
        F.floor(F.lit(float(budget)) * F.col("__w") / F.col("__S"))
        .cast("long")
        .alias("__k"),
    )
    rank_key = F.md5(
        F.concat(F.lit("tmix:"), F.coalesce(F.col(text_col), F.lit("")))
    )
    w = Window.partitionBy(strata_col).orderBy(rank_key, F.col(id_col))
    return (
        df.join(F.broadcast(quota), strata_col)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= F.col("__k"))
        .drop("__r", "__k")
    )


def epoch_order_key(text_col: Column | str, epoch: int) -> Column:
    """Deterministic per-EPOCH training order: md5 of ``epoch:text``.
    Each epoch is an independent, reproducible permutation of the
    corpus — the property a training loop needs from "shuffle every
    epoch" without RNG state to checkpoint: restarting epoch 7 replays
    epoch 7's exact order, on any engine (md5 is portable, so even the
    order itself is oracle-checkable). Pair with export_corpus's
    within-shard sort to materialize one epoch's layout.

    NULL text coalesces to '' like every hash family here
    (hash_bucket_hex): md5(NULL) is NULL, and engines disagree on where
    NULL sorts (Spark first, DuckDB last) — a contentless row must get
    a deterministic portable position, not an engine-dependent one."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(F.concat(F.lit(f"{epoch}:"), F.coalesce(c, F.lit(""))))


def plan_token_budget_waterfall(
    counts: DataFrame,
    *,
    budget: int | None = None,
    budget_frac: tuple[int, int] | None = None,
    cap_frac: tuple[int, int] = (7, 5),
    key_col: str = "source",
    n_col: str = "n_tokens",
    weight_scale: int = 1_000_000,
) -> DataFrame:
    """Token-budget allocation across sources with an epoch cap — the
    LLaMA-style data-recipe planner: source ``i`` (with ``n_i`` tokens
    available) targets ``λ·w_i`` tokens under sqrt-temperature weights,
    but never more than ``cap_i = floor(n_i · cap_num/cap_den)``
    (repeating a small source beyond ~a few epochs hurts); the water
    level ``λ`` solves ``Σ min(cap_i, λ·w_i) = budget``. Returns one
    row per source: ``(key_col, n_col, cap_tokens, capped,
    alloc_tokens, epochs)`` with ``Σ alloc == budget`` exactly (up to
    the documented final rounding).

    Closed form, no iteration: sort by ``r_i = cap_i/w_i``; a source is
    capped iff ``r_i`` lies below the water level computed AS IF every
    smaller-``r`` source were capped — a per-row prefix test that is
    globally consistent because capping a below-level source only
    RAISES the level and the first above-level source freezes it (the
    classic water-filling KKT argument). One ordered window pass.

    Cross-engine exactness (the driver hashes the result): every
    DECISION is integer arithmetic — caps and budget are rational
    floors of token counts, weights are fixed-point
    ``floor(weight_scale · sqrt(n))`` (sqrt is correctly rounded by
    IEEE-754, so bit-identical everywhere), prefix sums are integer,
    and the cap test multiplies integers (decimal(38,0), HUGEINT in
    the DuckDB mirror). Doubles appear only in the two final
    correctly-rounded ops per row (one multiply-or-cast, one divide),
    rounded to 4/6 dp on output.

    Scale: one aggregate to the per-source grain, then windows over the
    SOURCE DOMAIN — bounded grain (a corpus has dozens-to-thousands of
    sources, never corpus-proportional rows), the
    ``mixture_resample_plan`` precedent.

    ``n_col`` values must be >= 1 (a zero-token source has weight 0 and
    an undefined cap/weight ratio; real corpora can't produce one —
    every document tokenizes to at least the empty-string token).
    """
    if (budget is None) == (budget_frac is None):
        raise ValueError("pass exactly one of budget / budget_frac")
    cap_num, cap_den = cap_frac
    from pyspark.sql.window import Window

    base = counts.select(
        F.col(key_col),
        F.col(n_col).cast("long").alias(n_col),
        F.floor(F.col(n_col) * cap_num / cap_den).cast("long").alias(
            "cap_tokens"
        ),
        F.floor(F.lit(weight_scale) * F.sqrt(F.col(n_col))).cast("long").alias(
            "__w"
        ),
    )
    if budget_frac is not None:
        b_expr = F.floor(
            F.sum(n_col) * budget_frac[0] / budget_frac[1]
        ).cast("long")
    else:
        b_expr = F.lit(int(budget)).cast("long")
    tot = base.agg(
        b_expr.alias("__b"), F.sum("__w").cast("long").alias("__w_total")
    )
    # one-row broadcast; the ordered windows below run on the bounded
    # source domain (see docstring) — sanctioned global windows
    order = [(F.col("cap_tokens") * F.lit(1.0) / F.col("__w")), F.col(key_col)]
    prev = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    flagged = (
        base.crossJoin(F.broadcast(tot))
        .withColumn(
            "__c_prev",
            F.coalesce(F.sum("cap_tokens").over(prev), F.lit(0)).cast("long"),
        )
        .withColumn(
            "__w_rest",
            (
                F.col("__w_total")
                - F.coalesce(F.sum("__w").over(prev), F.lit(0))
            ).cast("long"),
        )
        .withColumn(
            "capped",
            F.col("cap_tokens").cast("decimal(38,0)") * F.col("__w_rest")
            < (F.col("__b") - F.col("__c_prev")).cast("decimal(38,0)")
            * F.col("__w"),
        )
    )
    lam = flagged.agg(
        F.sum(F.when(F.col("capped"), F.col("cap_tokens")).otherwise(0))
        .cast("long")
        .alias("__c_capped"),
        F.sum(F.when(F.col("capped"), 0).otherwise(F.col("__w")))
        .cast("long")
        .alias("__w_unc"),
    )
    # least() is a no-op in the feasible case (uncapped rows sit at or
    # below the water level by construction); for an INFEASIBLE budget
    # (>= Σ cap) it degrades gracefully — every source allocates its
    # cap and the remainder is unassigned — instead of over-allocating
    alloc = F.when(F.col("capped"), F.col("cap_tokens").cast("double")).otherwise(
        F.least(
            F.col("cap_tokens").cast("double"),
            ((F.col("__b") - F.col("__c_capped")) * F.col("__w")).cast("double")
            / F.col("__w_unc").cast("double"),
        )
    )
    return (
        flagged.crossJoin(F.broadcast(lam))
        .select(
            key_col,
            n_col,
            "cap_tokens",
            "capped",
            F.round(alloc, 4).alias("alloc_tokens"),
            F.round(alloc / F.col(n_col), 6).alias("epochs"),
        )
    )


def materialize_epoch_plan(
    df: DataFrame,
    plan: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str = "source",
    n_col: str = "n_tokens",
    alloc_col: str = "alloc_tokens",
) -> DataFrame:
    """Turn a :func:`plan_token_budget_waterfall` allocation into the
    actual multi-epoch training multiset: source ``s`` with allocation
    ``a_s`` over ``n_s`` available tokens emits ``q = floor(a_s/n_s)``
    FULL epochs of every document (rows ``epoch = 0..q-1``) plus a
    FRACTIONAL epoch (``epoch = q``) holding the content-hash-smallest
    documents whose cumulative token count fits the remainder
    ``a_s − q·n_s`` — the deterministic "repeat small sources ~1.4
    epochs" recipe a data-constrained pretraining run actually executes.

    Returns ``(strata_col, id_col, epoch, n_doc_tokens)``. Deterministic
    and oracle-replayable: the fractional pick orders by
    ``md5('emix:'||text)`` (domain-separated salt, ties by id) and takes
    documents while the running token sum stays within the remainder —
    so the emitted token total undershoots the allocation by less than
    one document, never overshoots. Zero-token documents are excluded
    from the fractional pick (they would otherwise ride any prefix for
    free and appear with ``q+1`` multiplicity even at remainder 0);
    they still receive their ``q`` full epochs.

    Scale: the plan is a per-source relation (broadcast); full epochs
    are a row-local ``explode(sequence)``; the only window is the
    per-source cumulative sum for the fractional pick — partitioned by
    source, and at 100 TB a single source outgrowing one task's sort is
    the two-phase-rank swap documented on ``temperature_mixture_sample``.
    """
    from pyspark.sql.window import Window

    from neulix_datahub_spark.operators.dedupe import normalize_text

    toks = F.coalesce(
        F.size(F.split(normalize_text(F.col(text_col)), " ")), F.lit(0)
    )
    p = plan.select(
        strata_col,
        F.col(n_col).cast("long").alias("__n"),
        F.col(alloc_col).cast("double").alias("__alloc"),
    )
    joined = df.select(
        strata_col, id_col, F.col(text_col), toks.alias("__dt")
    ).join(F.broadcast(p), strata_col)
    q = F.floor(F.col("__alloc") / F.col("__n")).cast("long")
    joined = joined.withColumn("__q", q).withColumn(
        "__frac_toks",
        F.col("__alloc") - (F.col("__q") * F.col("__n")).cast("double"),
    )
    full = (
        joined.filter(F.col("__q") >= 1)
        .select(
            strata_col,
            id_col,
            F.explode(F.sequence(F.lit(0), F.col("__q") - 1)).alias("epoch"),
            F.col("__dt").alias("n_doc_tokens"),
        )
    )
    key = F.md5(
        F.concat(F.lit("emix:"), F.coalesce(F.col(text_col), F.lit("")))
    )
    w = (
        Window.partitionBy(strata_col)
        .orderBy(key, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # zero-token (NULL/blank-text) docs would ride any prefix for free
    # (they never advance the running sum), entering the fractional
    # epoch even at remainder 0 with q+1 multiplicity — exclude them
    # from the candidates (they still get their q full epochs)
    frac = (
        joined.filter(F.col("__dt") > 0)
        .withColumn("__cum", F.sum("__dt").over(w))
        .filter(F.col("__cum") <= F.col("__frac_toks"))
        .select(
            strata_col,
            id_col,
            F.col("__q").alias("epoch"),
            F.col("__dt").alias("n_doc_tokens"),
        )
    )
    return full.unionByName(frac)
