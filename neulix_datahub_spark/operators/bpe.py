"""Distributed BPE merge learning (training-data extension, SURVEY
§2.11 tier — the tokenizer-vocabulary step of an LLM data pipeline).

Byte-pair encoding (Sennrich et al. 2016) learns a tokenizer vocabulary
by repeatedly merging the corpus's most frequent adjacent symbol pair.
The classical trainer is a single-process loop over a word-count table;
the Spark-first decomposition keeps exactly that structure but makes
every heavy step a distributed aggregate:

1. **Word table** — one scan: normalize → split → explode → groupBy
   word. This is the only pass over the CORPUS; everything after runs
   on the vocabulary relation (distinct words × counts), which is
   bounded by the language, not the data volume — the same reason
   classical BPE trainers operate on word counts.
2. **Per-round pair count** — each word carries its symbol sequence as
   a ``US``-delimited string (``\\x1f a \\x1f b \\x1f`` …). Pairs come
   from one expression (split → adjacent zip → explode), weighted by
   word count, one map-side-combined groupBy, and the round's winner is
   ``ORDER BY count DESC, pair ASC LIMIT 1`` — TakeOrderedAndProject,
   ONE row to the driver per round (the k-means centroid discipline:
   driver traffic is O(rounds), never O(data)).
3. **Merge rewrite** — a LEFT FOLD over each word's symbol sequence
   (``aggregate`` lambda with a delimited-string accumulator): when the
   accumulator's last symbol is ``a`` and the next symbol is ``b``,
   the tail rewrites to ``ab``; otherwise the symbol appends. This is
   exactly BPE's greedy leftmost-non-overlapping merge, INCLUDING
   consecutive occurrences of the same pair: ``aaaa`` + (a,a) →
   ``aa aa``. (A plain string ``replace`` of ``␟a␟b␟`` was tried first
   and is WRONG there — each match consumes the boundary delimiter the
   next occurrence needs, so ``aaaa`` became ``aa a a``; the
   hypothesis property against a pure-Python reference caught it, and
   both engines had agreed with each other while deviating from
   canonical BPE.)

Every step is engine-portable (regexp char-split, string replace,
integer counts, lexicographic tie-break), so an external SQL engine
replays the identical merge sequence — the driver oracle for
``bpe_merges_check`` unrolls the rounds as CTEs and must land on the
same merges, counts included.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neulix_datahub_spark.operators.dedupe import normalize_text

# Reserved symbol delimiter. The batched trainer's SQL mirror
# additionally reserves 0x1c–0x1e for its kept-pair record/needle
# encoding, so the full reserved range is the four C0 separators
# 0x1c–0x1f. The contract is ENFORCED, not assumed of the corpus:
# every unit relation and apply path normalizes through
# :func:`_bpe_normalize`, which deletes the reserved range before
# whitespace collapse (mirrored verbatim in every DuckDB oracle's
# normalization), so a corpus containing these C0 controls can never
# desynchronize the engine's exact string comparisons from the
# oracle's string-record scan. They are control codes no tokenizer
# wants as symbols anyway.
US = "\x1f"

# Java regex hex escapes — the same literal parses identically in
# DuckDB's RE2 and Python's re, which is what keeps the three
# normalization mirrors provably in sync.
RESERVED = r"[\x1c-\x1f]"

# ``rewrite="auto"`` crossover: below this many symbolized chars in the
# working relation, the per-round ~0.5-0.8 s codegen compile of a fresh
# fold expression dominates and the Arrow replay tier wins (measured
# 1.58 → 0.80 s/round at ~3 MB, sf0.1 raw units); above it, JVM
# whole-stage-codegen per-byte throughput dominates and fold wins. The
# measured crossover sits well above 100 MB on 32 cores — 64 MB is the
# conservative side, so auto only leaves the JVM path when the working
# set is unambiguously compile-bound.
_AUTO_ARROW_MAX_CHARS = 64 << 20

# ``rewrite="auto"`` second crossover (r14): below this many symbolized
# chars the whole working set is bounded driver data (16 M chars ≈
# 32 MB of Python strings) and even the Arrow tier's ~0.8 s/round is
# pure Spark job overhead — scheduling + Arrow boundary + a shuffle for
# a few thousand rows, per round, times O(M/batch-yield) rounds. The
# driver tier collects the symbolized working set ONCE and runs the
# identical count → rank → select_batch → rewrite cycle in-process
# (same shared _rewrite_sym_fn closure, same integer counts, same
# (count DESC, a, b) order — Python's code-point string order equals
# Spark's UTF8 binary order), so the merge list is bit-identical by
# construction (parity-pinned by unit test). At 100 TB the working set
# blows past this bound and auto stays on arrow/fold — the gate is the
# same bounded-driver-traffic contract as the per-round top-window
# collect the trainer already does.
_AUTO_DRIVER_MAX_CHARS = 16 << 20


def _bpe_normalize(col: Column) -> Column:
    """BPE's canonical text form: the reserved C0 separators deleted
    FIRST (deletion may join two whitespace runs), then the shared
    lowercase/collapse/trim of ``normalize_text``."""
    return normalize_text(F.regexp_replace(col, RESERVED, ""))


def _symbolize(word: Column) -> Column:
    """``'abc'`` → ``'␟a␟b␟c␟'``: one delimiter around every symbol, so
    a pair pattern ``␟a␟b␟`` can never match across a symbol boundary
    (a symbol *ending* in ``a`` followed by ``b`` does not contain the
    delimited pattern)."""
    return F.concat(F.lit(US), F.regexp_replace(word, "(?s)(.)", f"$1{US}"))


def _merge_fold(sym: Column, a: str, b: str) -> Column:
    """Greedy leftmost merge of adjacent (a, b) over a delimited symbol
    string, as a left fold: the accumulator is the rewritten delimited
    string; when it ends with ``␟a␟`` and the incoming symbol is ``b``,
    the tail becomes ``ab`` (the suffix check is delimiter-anchored, so
    a symbol merely ENDING in ``a`` can never false-match). Consecutive
    same-pair runs merge correctly because the fold's cursor moves one
    SYMBOL at a time — the non-overlapping-scan pitfall of a string
    replace (see module docstring) cannot occur."""
    syms = F.filter(F.split(sym, US), lambda x: x != "")
    return F.aggregate(
        syms,
        F.lit(US),
        lambda acc, x: F.when(
            acc.endswith(F.lit(f"{US}{a}{US}")) & (x == F.lit(b)),
            F.concat(
                F.substring(acc, F.lit(1), F.length(acc) - F.lit(len(a) + 1)),
                F.lit(f"{a}{b}{US}"),
            ),
        ).otherwise(F.concat(acc, x, F.lit(US))),
    )


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus's (word, count) relation — BPE's working set. One
    scan, one map-side-combined groupBy; output is bounded by the
    vocabulary."""
    norm = _bpe_normalize(F.col(text_col))
    return (
        df.select(F.explode(F.split(norm, " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word count: ``(a, b, c)``.

    The pair list is zip(s[:-1], s[1:]) over a PRE-PROJECTED symbol
    array — each slice evaluates the array column once per row. (A
    ``transform(sequence(...), i -> element_at(syms, i))`` formulation
    re-evaluated the split+filter expression per element: O(len²) per
    row, which turned raw-mode units (~300 symbols) into a 10x
    slowdown; measured 11s -> <1s per round on the sf0.01 corpus.)"""
    projected = words.select(
        F.filter(F.split("sym", US), lambda x: x != "").alias("s"), "n"
    ).filter(F.size("s") >= 2)
    pairs = F.arrays_zip(
        F.slice("s", 1, F.size("s") - 1).alias("a"),
        F.slice(F.col("s"), 2, F.size("s") - 1).alias("b"),
    )
    return (
        projected.select(F.explode(pairs).alias("p"), "n")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("c"))
    )


def _free_checkpoint(df: DataFrame) -> None:
    """Release a ``localCheckpoint(eager=True)`` DataFrame's cached
    blocks. The checkpointed plan is a LogicalRDD whose backing RDD is
    reachable through the JVM handle; unpersisting it immediately frees
    the blocks instead of waiting for GC + ContextCleaner — without
    this an n-round iterative trainer accumulates O(n) materialized
    copies of its working relation (fine at 8 rounds, not at
    tokenizer-scale round counts). Best-effort: any py4j surprise just
    leaves the block to the ContextCleaner — but LOGGED, so a Spark
    version changing the internal call shape degrades the O(1)-storage
    contract observably instead of silently."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception as exc:  # pragma: no cover - version drift guard
        import logging

        logging.getLogger(__name__).warning(
            "checkpoint unpersist failed (%s); storage bound degrades "
            "to O(rounds) until the ContextCleaner catches up", exc
        )


def bpe_learn_merges(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> list[dict]:
    """Learn ``n_merges`` BPE merges over the corpus. Returns the merge
    list (rank order): ``{rank, left, right, merged, pair_count}``.

    Driver loop is O(n_merges) with ONE collected row AND ONE Spark job
    per round: the rewritten vocabulary is localCheckpoint'd LAZILY
    (the iteration invariant, same as connected_components' edge list)
    so the next round's pair-count collect materializes it as a side
    effect — an eager checkpoint doubled the job count for no benefit.
    The PREVIOUS round's checkpoint is freed as soon as the new one has
    materialized (storage stays O(1) rounds). Stops early when no
    adjacent pair remains (vocabulary fully merged).

    At a realistic vocabulary size (~32k merges) prefer
    :func:`bpe_learn_merges_batched` — this single-merge loop runs one
    sequential Spark round per merge."""
    words = (
        word_counts(df, text_col)
        .select(_symbolize(F.col("word")).alias("sym"), "n")
        .localCheckpoint(eager=False)
    )
    prev: DataFrame | None = None
    merges: list[dict] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()  # bounded: one row per round; materializes words
        )
        if prev is not None:
            _free_checkpoint(prev)  # only after the successor is computed
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["c"])
        merges.append(
            {"rank": rank, "left": a, "right": b, "merged": a + b,
             "pair_count": c}
        )
        prev = words
        words = words.select(
            _merge_fold(F.col("sym"), a, b).alias("sym"), "n"
        ).localCheckpoint(eager=False)
    # same exit discipline as the batched trainer: the merge list is
    # the output — release the final working relations instead of
    # leaking one pinned copy per call to the ContextCleaner
    if prev is not None:
        _free_checkpoint(prev)
    _free_checkpoint(words)
    return merges


def select_batch(
    ranked: list[tuple[str, str, int]],
) -> list[tuple[str, str, int]]:
    """Greedy-maximal non-interacting batch from a ranked pair window —
    the per-round selection rule of the BATCHED trainer, shared by the
    engine and (as a list_reduce prefix scan) the SQL oracle.

    Scanning in rank order (count DESC, a, b), a candidate is kept iff
    it interacts with NO already-kept pair s: the candidate's symbols
    avoid {s.a, s.b, s.a+s.b}, its merged string avoids {s.a, s.b},
    and the merged strings differ. Under that condition applying one
    kept merge can neither create nor destroy an occurrence of another
    (the new symbol s.a+s.b is excluded from every other kept pair),
    so the batch applies in ONE left-to-right pass — at most one kept
    pair can match a given adjacency, since kept pairs are distinct."""
    kept: list[tuple[str, str, int]] = []
    for a, b, c in ranked:
        ok = True
        for sa, sb, _ in kept:
            sm = sa + sb
            if (sa in (a, b) or sb in (a, b) or sm in (a, b)
                    or (a + b) in (sa, sb) or sm == a + b):
                ok = False
                break
        if ok:
            kept.append((a, b, c))
    return kept


def _merge_fold_multi(
    sym: Column, pairs: list[tuple[str, str]]
) -> Column:
    """One left-to-right greedy pass applying a whole non-interacting
    batch: at each fold step the (last-symbol, incoming) adjacency is
    checked against every kept pair (chained conditions — at most one
    can match), same delimiter-anchored rewrite as the single-pair
    fold."""
    syms = F.filter(F.split(sym, US), lambda x: x != "")

    def step(acc: Column, x: Column) -> Column:
        out = None
        for a, b in pairs:
            cond = acc.endswith(F.lit(f"{US}{a}{US}")) & (x == F.lit(b))
            rewrite = F.concat(
                F.substring(acc, F.lit(1), F.length(acc) - F.lit(len(a) + 1)),
                F.lit(f"{a}{b}{US}"),
            )
            out = F.when(cond, rewrite) if out is None else out.when(cond, rewrite)
        fallthrough = F.concat(acc, x, F.lit(US))
        return fallthrough if out is None else out.otherwise(fallthrough)

    return F.aggregate(syms, F.lit(US), step)


def raw_unit_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Raw-mode working set: each distinct NORMALIZED text (whitespace
    collapsed, lowercased) is one unit, space included as an ordinary
    mergeable symbol — SentencePiece-style no-pre-tokenization
    training, where multi-word pieces are allowed. At corpus scale the
    working set is the distinct-document relation, so a real deployment
    samples/chunks the corpus first (exactly what SentencePiece's
    sentence sampling does); word mode keeps the Heaps-law-bounded
    vocabulary working set instead."""
    norm = _bpe_normalize(F.col(text_col))
    return (
        df.select(norm.alias("unit"))
        .filter(F.col("unit") != "")
        .groupBy("unit")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_learn_merges_batched(
    df: DataFrame,
    n_rounds: int,
    window: int = 256,
    text_col: str = "text",
    unit: str = "word",
    initial_merges: list[dict] | None = None,
    rewrite: str = "fold",
) -> list[dict]:
    """Batched BPE training: per round, ONE pair-count aggregate feeds
    a top-``window`` collect (bounded driver traffic: ≤window rows per
    round), :func:`select_batch` keeps the greedy-maximal
    non-interacting prefix-scan subset, and the whole batch applies in
    ONE fold rewrite — so a vocabulary of M merges costs
    O(M / batch-yield) Spark rounds instead of O(M) (measured yield
    ~20/round on natural text at window=256: 32k merges in ~1.6k
    rounds, vs 32k sequential jobs for the single-merge loop).

    ``unit="word"`` trains on the space-split vocabulary relation
    (classical, Heaps-bounded); ``unit="raw"`` trains SentencePiece-
    style on whole normalized texts with space as a mergeable symbol.
    Returns merge dicts ``{rank, round, round_rank, left, right,
    merged, pair_count}`` in application order; stops early when the
    corpus has no adjacent pairs left. Prior rounds' checkpoints are
    freed as soon as the next round materializes (O(1) storage).

    ``initial_merges`` RESUMES training from an existing vocabulary
    (e.g. :func:`load_merges`): the prior merges replay over the fresh
    working set (one fold pass per original round) before the first
    new round, and rank/round numbering continues where they left off —
    ``train(R)`` ≡ ``train(k)`` then ``resume with R−k`` on the same
    corpus, which is the grow-an-existing-tokenizer workflow.

    ``rewrite`` picks the per-round working-set rewrite tier —
    bit-identical results (parity-pinned by unit test), different cost
    shapes: ``"fold"`` (default) is the JVM expression fold — zero
    serialization, whole-stage-codegen'd, the winner whenever the unit
    relation is large (the 100 TB regime: per-byte JVM throughput
    dominates, and the per-round codegen compile amortizes over data);
    ``"arrow"`` replays the round's batch through the Arrow
    mapInPandas tier — a fresh fold expression costs a ~0.5-0.8 s
    codegen compile EVERY round (the pair literals change), so on
    small working sets the arrow tier halves the round time (measured
    sf0.1 raw units, 16 rounds: 1.58 → 0.80 s/round). Rule of thumb:
    many rounds over a modest distinct-unit relation → arrow; few
    rounds or a huge relation → fold. ``"driver"`` (r14) collects the
    symbolized working set once and runs the identical
    count → rank → select → rewrite cycle in-process — the right tier
    when the working set is bounded driver data and every per-round
    Spark job is pure overhead. ``"auto"`` measures the working
    set ONCE (one count+sum-of-lengths aggregate over the relation the
    first round materializes anyway — amortized over every round) and
    picks driver below :data:`_AUTO_DRIVER_MAX_CHARS` symbolized
    chars, arrow below :data:`_AUTO_ARROW_MAX_CHARS`, fold above: a
    100 TB corpus always folds (the sizing job is one extra
    round-equivalent out of ~1.6k), a demo/CI-sized working set stops
    paying per-round jobs. The choice is logged, and the tiers are
    bit-identical (parity-pinned), so auto never changes results —
    only the cost shape."""
    if unit not in ("word", "raw"):
        raise ValueError(f"unknown unit {unit!r}")
    if rewrite not in ("fold", "arrow", "auto", "driver"):
        raise ValueError(f"unknown rewrite {rewrite!r}")
    units = word_counts(df, text_col) if unit == "word" else (
        raw_unit_counts(df, text_col).withColumnRenamed("unit", "word")
    )
    base = units.select(_symbolize(F.col("word")).alias("sym"), "n")
    rank = 0
    rnd0 = 0
    if initial_merges:
        # replay the prior vocabulary through the VECTORIZED tier, not
        # chained folds: a realistically sized initial merge list
        # (thousands of rounds) as nested aggregate-lambdas is exactly
        # the analyzer cliff the batched trainer exists to avoid. One
        # checkpoint total — the symbolize stage stays lazy inside the
        # replay's lineage instead of orphaning a materialized copy.
        base = _replay_merges_pandas(base, initial_merges)
        rank = initial_merges[-1]["rank"]
        rnd0 = initial_merges[-1].get("round", 0)
    # NOTE (r13 optimization round): a pre-loop repartition to
    # defaultParallelism was tried here and REVERTED — at bench scale
    # the working set is a few thousand rows, and 32 tasks' scheduling
    # + per-task Arrow overhead per round cost MORE than the
    # single-partition Python pass it parallelized (measured +0.2 s per
    # round). At 100 TB the unit relation is large enough that AQE
    # keeps real parallelism on its own.
    words = base.localCheckpoint(eager=False)
    if rewrite == "auto":
        sized = words.agg(
            F.count(F.lit(1)).alias("n_units"),
            F.coalesce(F.sum(F.length("sym")), F.lit(0)).alias("n_chars"),
        ).first()
        n_chars = int(sized["n_chars"])
        rewrite = (
            "driver" if n_chars <= _AUTO_DRIVER_MAX_CHARS
            else "arrow" if n_chars <= _AUTO_ARROW_MAX_CHARS
            else "fold"
        )
        import logging

        logging.getLogger(__name__).info(
            "bpe auto rewrite tier: %s (%d units, %d symbolized chars, "
            "thresholds %d/%d)",
            rewrite, int(sized["n_units"]), n_chars,
            _AUTO_DRIVER_MAX_CHARS, _AUTO_ARROW_MAX_CHARS,
        )
    merges: list[dict] = []
    if rewrite == "driver":
        # Bounded-working-set tier (r14): ONE collect replaces
        # O(rounds) Spark jobs. Same cycle, same shared closures as the
        # distributed tiers — count adjacent pairs (integer sums),
        # rank by (count DESC, a, b), select_batch, apply the batch via
        # _rewrite_sym_fn — so the merge list is bit-identical
        # (parity-pinned by unit test). The collect is the lazy
        # checkpoint's materializing action; the pin is freed
        # immediately after.
        from collections import Counter

        # symbol LISTS as the working representation: split once at
        # collect, rewrite and count on lists every round (the string
        # tiers re-split per round because their rows must round-trip
        # a string column; here nothing crosses a boundary)
        units = [
            ([x for x in r[0].split(US) if x], int(r[1]))
            for r in words.select("sym", "n").collect()
        ]
        _free_checkpoint(words)
        pending: list[dict] = []
        for rnd in range(rnd0 + 1, rnd0 + n_rounds + 1):
            cnt: Counter = Counter()
            if pending:
                rounds1 = _merge_rounds(pending)
                new_units = []
                for syms, n in units:
                    syms = _apply_merges_symbols(syms, rounds1)
                    new_units.append((syms, n))
                    for p in zip(syms, syms[1:]):
                        cnt[p] += n
                units = new_units
            else:
                for syms, n in units:
                    for p in zip(syms, syms[1:]):
                        cnt[p] += n
            ranked = sorted(
                ((a, b, c) for (a, b), c in cnt.items()),
                key=lambda t: (-t[2], t[0], t[1]),
            )[:window]
            if not ranked:
                break
            kept = select_batch(ranked)
            batch: list[dict] = []
            for j, (a, b, c) in enumerate(kept, 1):
                rank += 1
                batch.append(
                    {"rank": rank, "round": rnd, "round_rank": j, "left": a,
                     "right": b, "merged": a + b, "pair_count": c}
                )
            merges.extend(batch)
            pending = batch
        return merges
    if rewrite == "arrow":
        # Fused tier (r13 optimization): each round runs ONE Arrow pass
        # (_rewrite_and_count_pandas) that applies the PREVIOUS round's
        # batch and emits the partial pair counts of the rewritten
        # working set — the JVM pair expansion (the measured 2.0 s of
        # the old 1.8–2.0 s round at sf0.1) and one boundary crossing
        # per round both disappear; counts are bit-identical (integer
        # partial sums). The final round's batch is never applied —
        # exactly like the old loop, whose last lazy rewrite was never
        # materialized.
        pin = words  # the checkpointed relation backing `words`
        pending: list[dict] = []
        for rnd in range(rnd0 + 1, rnd0 + n_rounds + 1):
            fused = _rewrite_and_count_pandas(words, pending).localCheckpoint(
                eager=False
            )
            ranked = [
                (r["a"], r["b"], int(r["c"]))
                for r in (
                    fused.filter(F.col("a").isNotNull())
                    .groupBy("a", "b")
                    .agg(F.sum("c").alias("c"))
                    .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
                    .limit(window)
                    .collect()  # bounded; materializes the fused frame
                )
            ]
            _free_checkpoint(pin)  # successor is materialized now
            pin = fused
            words = fused.filter(F.col("sym").isNotNull()).select("sym", "n")
            if not ranked:
                break
            kept = select_batch(ranked)
            batch: list[dict] = []
            for j, (a, b, c) in enumerate(kept, 1):
                rank += 1
                batch.append(
                    {"rank": rank, "round": rnd, "round_rank": j, "left": a,
                     "right": b, "merged": a + b, "pair_count": c}
                )
            merges.extend(batch)
            pending = batch
        _free_checkpoint(pin)
        return merges

    prev: DataFrame | None = None
    for rnd in range(rnd0 + 1, rnd0 + n_rounds + 1):
        ranked = [
            (r["a"], r["b"], int(r["c"]))
            for r in (
                _pair_counts(words)
                .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
                .limit(window)
                .collect()  # bounded: ≤window rows; materializes words
            )
        ]
        if prev is not None:
            _free_checkpoint(prev)  # only after the successor is computed
        if not ranked:
            break
        kept = select_batch(ranked)
        batch: list[dict] = []
        for j, (a, b, c) in enumerate(kept, 1):
            rank += 1
            batch.append(
                {"rank": rank, "round": rnd, "round_rank": j, "left": a,
                 "right": b, "merged": a + b, "pair_count": c}
            )
        merges.extend(batch)
        prev = words
        words = words.select(
            _merge_fold_multi(F.col("sym"), [(a, b) for a, b, _ in kept])
            .alias("sym"), "n"
        ).localCheckpoint(eager=False)
    # release the working relation on the way out: the trainer's output
    # is the merge list, not the rewritten vocabulary, and leaving the
    # final two checkpoints to the ContextCleaner made the CHUNKED
    # resume workflow (train k rounds, persist, resume) accumulate one
    # pinned copy per call — measured persisted_rdds 2 -> 6 across a
    # 7-chunk 4.2k-merge run before this. Unpersist is idempotent, so
    # re-freeing an already-freed prev is harmless.
    if prev is not None:
        _free_checkpoint(prev)
    _free_checkpoint(words)
    return merges


def _rewrite_sym_fn(rounds: list[dict[tuple[str, str], str]]):
    """The per-string rewrite closure shared by every Arrow replay
    path (one greedy pass per round over the delimited symbol string)
    — ONE implementation, so the fused rewrite+count pass is
    bit-identical to the plain replay by construction."""

    def rewrite(sym: str) -> str:
        syms = [x for x in sym.split(US) if x]
        out = _apply_merges_symbols(syms, rounds)
        return US + US.join(out) + US if out else US

    return rewrite


def _replay_merges_pandas(words: DataFrame, merges: list[dict]) -> DataFrame:
    """Rewrite a delimited-symbol working set ``(sym, n)`` by replaying
    a merge list — one greedy pass per original round, Arrow-batched.
    The resume path of the batched trainer: merge-count-independent
    plan size, output format identical to the fold rewrites."""
    rounds = _merge_rounds(merges)

    def run(batches: Iterator) -> Iterator:
        rewrite = _rewrite_sym_fn(rounds)
        for pdf in batches:
            pdf["sym"] = pdf["sym"].map(rewrite)
            yield pdf

    return words.mapInPandas(run, schema="sym string, n bigint")


def _rewrite_and_count_pandas(
    words: DataFrame, merges: list[dict]
) -> DataFrame:
    """ONE Arrow pass per batched-trainer round (r13 optimization):
    apply the previous round's merge batch (the identical
    :func:`_rewrite_sym_fn` rewrite the plain replay uses) and emit
    per-partition PARTIAL adjacent-pair counts over the rewritten
    symbols, union-typed in one output frame:

    - working-set rows ``(sym, n, NULL, NULL, NULL)`` — the next
      round's relation, and
    - partial-count rows ``(NULL, NULL, a, b, c)`` — ``c`` the
      Counter total for the pair within this partition; the caller's
      ``groupBy(a, b).sum(c)`` finishes the aggregation (integer
      addition — order-independent, so the totals are exactly
      :func:`_pair_counts`'s).

    Why: the JVM pair expansion (split → slice×2 → arrays_zip →
    explode → hash-agg over ~2M string structs) measured 2.0 s per
    round at sf0.1 against 0.8 s for the Python rewrite pass it
    followed — and the rewritten strings were crossing the Arrow
    boundary back just to be re-split. Counting where the split
    already happened removes the explode AND one boundary crossing
    per round (measured: full round 1.8–2.0 s → ~0.9 s). Partial
    counts keep the shuffle tiny (distinct pairs per partition), the
    same map-side-combine profile as the JVM aggregate."""
    rounds = _merge_rounds(merges) if merges else []

    def run(batches: Iterator) -> Iterator:
        from collections import Counter

        import pandas as pd

        rewrite = _rewrite_sym_fn(rounds)
        for pdf in batches:
            if rounds:
                pdf["sym"] = pdf["sym"].map(rewrite)
            cnt: Counter = Counter()
            for sym, n in zip(pdf["sym"], pdf["n"]):
                syms = [x for x in sym.split(US) if x]
                nn = int(n)
                prev = None
                for s in syms:
                    if prev is not None:
                        cnt[(prev, s)] += nn
                    prev = s
            out_sym = pd.DataFrame(
                {
                    "sym": pdf["sym"],
                    # nullable Int64 so the concat with pair rows never
                    # upcasts counts to float
                    "n": pd.array(pdf["n"], dtype="Int64"),
                    "a": pd.Series([None] * len(pdf), dtype=object),
                    "b": pd.Series([None] * len(pdf), dtype=object),
                    "c": pd.Series([None] * len(pdf), dtype="Int64"),
                }
            )
            if cnt:
                keys = list(cnt)
                out_pair = pd.DataFrame(
                    {
                        "sym": pd.Series([None] * len(keys), dtype=object),
                        "n": pd.Series([None] * len(keys), dtype="Int64"),
                        "a": [k[0] for k in keys],
                        "b": [k[1] for k in keys],
                        "c": [cnt[k] for k in keys],
                    }
                )
                yield pd.concat([out_sym, out_pair], ignore_index=True)
            else:
                yield out_sym

    return words.mapInPandas(
        run, schema="sym string, n bigint, a string, b string, c bigint"
    )


def _merge_rounds(merges: list[dict]) -> list[dict[tuple[str, str], str]]:
    """Group a merge list into REPLAY rounds: batched-trainer dicts
    (carrying ``round``) group per training round; classic single-merge
    dicts get one round each — so replaying one greedy pass per round
    is bit-identical to whatever rewrite produced the list."""
    rounds: list[dict[tuple[str, str], str]] = []
    last_round: int | None = None
    for m in merges:
        rnd = m.get("round")
        if rnd is None or rnd != last_round or last_round is None:
            rounds.append({})
        last_round = rnd
        rounds[-1][(m["left"], m["right"])] = m["left"] + m["right"]
    return rounds


def save_merges(spark, merges: list[dict], path: str) -> None:
    """Persist a learned merge table as parquet — the train-once /
    apply-everywhere workflow of a real tokenizer (the merge list IS
    the tokenizer; segmenting jobs load it instead of retraining).
    Classic (single-merge) and batched merge lists both round-trip;
    ``round``/``round_rank`` are NULL for classic lists."""
    from neulix_datahub_spark.functions.ranking import local_relation

    local_relation(
        spark,
        [
            (m["rank"], m.get("round"), m.get("round_rank"), m["left"],
             m["right"], m["merged"], m["pair_count"])
            for m in merges
        ],
        "rank bigint, round bigint, round_rank bigint, left string, "
        "right string, merged string, pair_count bigint",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> list[dict]:
    """Load a merge table saved by :func:`save_merges`, in application
    (rank) order, ready for :func:`bpe_segment` /
    :func:`bpe_segment_pandas` (batched lists keep their per-round
    grouping so the vectorized replay stays bit-identical to the
    trainer's rewrite)."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    merges = []
    for r in rows:
        m = {"rank": int(r["rank"]), "left": r["left"], "right": r["right"],
             "merged": r["merged"], "pair_count": int(r["pair_count"])}
        if r["round"] is not None:
            m["round"] = int(r["round"])
            m["round_rank"] = int(r["round_rank"])
        merges.append(m)
    return merges


def export_hf_merges(
    merges: list[dict],
    path: str,
    vocab_path: str | None = None,
    space_marker: str | None = None,
) -> None:
    """Emit the learned merge table in the standard ``merges.txt``
    format (``#version: 0.2`` header, one space-separated pair per line
    in rank order) that HuggingFace ``tokenizers``/GPT-2-style BPE
    loaders consume — the hand-the-tokenizer-to-a-training-stack
    bridge. Optionally also writes the companion ``vocab.json``
    (token → id: base symbols first in sorted order, then merged
    tokens in rank order — every id a consumer of merges.txt needs).

    Semantic caveat, documented rather than papered over: HF applies
    merges LOWEST-RANK-FIRST with revisiting, while this engine's
    default replay is once-each-in-rank-order (see
    :func:`_apply_merges_symbols`) — the two can segment differently
    when a later merge creates an occurrence of an earlier pair
    (divergence pinned by unit test). Export with
    ``bpe_segment_pandas(..., priority="rank")`` on the Spark side when
    bit-compatibility with the HF consumer matters.

    ``merges.txt`` separates the pair with a SPACE, so raw-unit merge
    tables (space is a mergeable symbol) are unrepresentable as-is:
    pass ``space_marker`` (conventionally ``"Ġ"``, the GPT-2 byte-level
    visible-space) to map spaces inside symbols, or export word-mode
    tables directly.
    """
    import json

    lines = ["#version: 0.2"]
    products: list[str] = []
    leaves: set[str] = set()
    for m in sorted(merges, key=lambda m: m["rank"]):
        parts = []
        for side in (m["left"], m["right"]):
            if " " in side:
                if space_marker is None:
                    raise ValueError(
                        f"merge pair ({m['left']!r}, {m['right']!r}) contains "
                        "a space — unrepresentable in merges.txt; pass "
                        "space_marker (e.g. 'Ġ') or export a word-mode table"
                    )
                side = side.replace(" ", space_marker)
            if "\n" in side:
                raise ValueError(
                    "newline inside a merge symbol cannot round-trip "
                    "through merges.txt (normalized corpora never "
                    "produce one)"
                )
            parts.append(side)
        lines.append(f"{parts[0]} {parts[1]}")
        products.append(parts[0] + parts[1])
        leaves.update(parts)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    if vocab_path is not None:
        produced = set(products)
        base = sorted(leaves - produced)
        # first-wins, contiguous ids: two merges can legitimately
        # produce the SAME merged string (('ab','c') and ('a','bc')),
        # and a naive enumerate would overwrite the earlier id leaving
        # a gap — an HF consumer sizing an embedding matrix from
        # len(vocab) vs max(id)+1 would then disagree with itself
        vocab: dict[str, int] = {}
        for tok in base + products:
            if tok not in vocab:
                vocab[tok] = len(vocab)
        with open(vocab_path, "w", encoding="utf-8") as f:
            json.dump(vocab, f, ensure_ascii=False, sort_keys=False)


def _apply_merges_rank(
    syms: list[str], ranks: dict[tuple[str, str], int]
) -> list[str]:
    """The HF/GPT-2 ``bpe()`` loop: repeatedly find the LOWEST-RANK
    adjacent pair present in the sequence and merge every (leftmost-
    first, non-overlapping) occurrence, until no ranked pair remains.
    Unlike the once-each replay, a later-created occurrence of an
    earlier merge IS revisited — the semantics an exported
    ``merges.txt`` gets from HuggingFace consumers."""
    while len(syms) >= 2:
        best: tuple[str, str] | None = None
        best_rank = -1
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best is None or r < best_rank):
                best, best_rank = pair, r
        if best is None:
            return syms
        a, b = best
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _apply_merges_symbols(
    syms: list[str], rounds: list[dict[tuple[str, str], str]]
) -> list[str]:
    """Replay a merge list over a symbol sequence: one greedy leftmost
    pass PER ROUND, each pass merging any adjacency found in that
    round's batch (at most one batch pair can match a given adjacency —
    batches hold distinct pairs). Single-merge rounds make this the
    once-each-in-rank-order semantics of the chained expression folds
    (NOT the HF lowest-rank-first loop, which can revisit earlier
    merges); batched rounds make it bit-identical to the batched
    trainer's per-round rewrite."""
    for lut in rounds:
        out: list[str] = []
        for x in syms:
            if out and (merged := lut.get((out[-1], x))) is not None:
                out[-1] = merged
            else:
                out.append(x)
        syms = out
    return syms


def bpe_segment_pandas(
    df: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    unit: str = "word",
    priority: str = "replay",
) -> DataFrame:
    """Vectorized APPLY tier: segment every document by replaying the
    learned merge list in an Arrow-batched ``mapInPandas`` pass —
    the at-scale form of :func:`bpe_segment`, whose chained
    expression folds are exactly parity-checked against this path at
    small vocab (``bpe_apply_parity_stats``) but blow up the analyzer
    at a realistic merge count (32k chained lambda folds is a codegen
    cliff long before data size matters; one Python pass replaying a
    dict of 32k merges is not).

    Merges from the BATCHED trainer (dicts carrying ``round``) replay
    as one pass per ROUND — bit-identical to the trainer's per-round
    rewrite; classic single-merge lists replay one pass per merge,
    matching the fold chain. Per-batch the tokenizer memoizes by
    unique word (``unit="word"``, Zipf makes the hit rate high) or
    unique normalized text (``unit="raw"``). Narrow: no shuffle, each
    batch transforms in place; the merge list ships once per executor
    via the closure.

    ``priority="rank"`` switches the per-unit replay to the HF/GPT-2
    lowest-rank-first loop (:func:`_apply_merges_rank`) — the
    semantics a consumer of :func:`export_hf_merges`' ``merges.txt``
    applies. Use it when this engine segments alongside an HF stack;
    the default ``"replay"`` stays bit-identical to the trainer's own
    rewrite (and to the fold chain for classic lists)."""
    import re

    if unit not in ("word", "raw"):
        raise ValueError(f"unknown unit {unit!r}")
    if priority not in ("replay", "rank"):
        raise ValueError(f"unknown priority {priority!r}")
    if out_col in df.columns:
        raise ValueError(
            f"out_col {out_col!r} already exists in the input columns "
            f"{df.columns}; pick a distinct name (mapInPandas would "
            "bind a duplicate field and fail confusingly downstream)"
        )
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    if priority == "rank":
        ranks = {
            (m["left"], m["right"]): m["rank"]
            for m in sorted(merges, key=lambda m: m["rank"])
        }

        def _apply(syms: list[str]) -> list[str]:
            return _apply_merges_rank(syms, ranks)
    else:
        rounds = _merge_rounds(merges)

        def _apply(syms: list[str]) -> list[str]:
            return _apply_merges_symbols(syms, rounds)
    # fresh StructType: StructType.add MUTATES, and df.schema hands back
    # the DataFrame's own cached instance — mutating it corrupts the
    # input's column list before mapInPandas binds it
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(StringType()))]
    )
    # JAVA's \s ([ \t\n\x0B\f\r]) and space-only trim, NOT Python's re
    # \s/str.strip(): Python's are Unicode-aware (U+00A0, U+2028,
    # U+3000 all match), so they would collapse characters the
    # engine's normalize (Spark regexp_replace + trim) keeps as
    # ordinary symbols — silently breaking fold==vectorized parity on
    # any corpus containing non-ASCII whitespace. The reserved C0
    # separators are deleted FIRST, mirroring _bpe_normalize.
    rsv = re.compile(RESERVED)
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def run(batches: Iterator) -> Iterator:
        memo: dict[str, list[str]] = {}

        def tokenize(text: str) -> list[str] | None:
            if not isinstance(text, str):
                return None  # NULL text -> NULL tokens, like the folds
            norm = ws.sub(" ", rsv.sub("", text).lower()).strip(" ")
            if unit == "raw":
                got = memo.get(norm)
                if got is None:
                    got = memo[norm] = _apply(list(norm))
                return got
            toks: list[str] = []
            for w in norm.split(" "):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _apply(list(w))
                toks.extend(got)
            return toks

        for pdf in batches:
            pdf[out_col] = pdf[text_col].map(tokenize)
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def bpe_segment(text: Column, merges: list[dict]) -> Column:
    """Apply a learned merge list to whitespace-tokenized text: returns
    the per-document symbol array after replaying every merge in rank
    order — the APPLY side of the trainer, one chained narrow fold per
    merge (no UDF, no shuffle). The space stays in the symbol stream as
    a barrier symbol (merge sides come from space-split words, so no
    pair ever involves it) and is dropped at the end — merges can never
    cross a word boundary."""
    norm = _bpe_normalize(text)
    s = F.concat(F.lit(US), F.regexp_replace(norm, "(?s)(.)", f"$1{US}"))
    for m in merges:
        s = _merge_fold(s, m["left"], m["right"])
    return F.filter(F.split(s, US), lambda x: (x != "") & (x != " "))
