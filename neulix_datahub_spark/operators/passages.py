"""Exact-substring (passage-level) dedup — the Lee et al.
"Deduplicating Training Data Makes Language Models Better" recipe,
re-expressed as declarative DataFrame ops.

Document-level near-dup (MinHash/SimHash, ``operators/dedupe.py``)
misses the common failure mode of web corpora: a boilerplate paragraph
or license block pasted into thousands of otherwise-distinct pages.
This module finds the *maximal token runs* that repeat across (or
within) documents — or that match an external needle set, the
passage-level decontamination case — and can excise them, leaving the
unique remainder:

- ``positioned_token_grams`` — (id, pos, gram) word n-grams with their
  0-based start-token position, one JVM regex pass per document.
- ``repeated_passages`` — disjoint maximal covered intervals per
  document: every n-gram occurring >= ``min_count`` times corpus-wide
  marks its n tokens; overlapping/touching marks merge into one
  passage (interval union via a per-document running-max window).
- ``matching_passages`` — same interval machinery, but the marks come
  from a semi-join against an external gram set (a benchmark/eval
  suite): GPT-3-style decontamination at SPAN grain instead of
  drop-the-whole-document.
- ``remove_repeated_passages`` / ``remove_matching_passages`` —
  rewrite the text with covered tokens excised. No token explode: the
  per-document run list (small) joins back to the document row and a
  single array expression filters the token array in place.

Parity with the reference: the reference's pandas hub has no
passage-level dedup (its dedup is row-identity — see
``reference/core/utils/db_core.py`` upsert paths); this is part of the
L2+ training-data tier the engine adds beyond reference coverage.

Exactness (round-12 adjudication of the "under-merge" note): the gram
method's COVERAGE is not an approximation — a token is marked iff it
lies inside an ``n``-gram whose corpus count >= ``min_count``, which is
definitionally the same set as "inside an ``n``-token substring
occurring >= ``min_count`` times", i.e. exactly what Lee et al.'s
suffix-array pass covers at threshold length ``n`` (every window of a
longer repeat repeats at least as often, so longer repeats are fully
covered; sub-``n`` repeats are out of scope BY DEFINITION — ``n`` is
the minimum passage length, their 50-token dial). Pinned extensionally
against a brute-force reference on random + adversarial corpora
(tests/test_passages.py::test_runs_equal_brute_force_reference). The
proposed two-pass n/2n run-join tightening was therefore dropped: it
had nothing to tighten. What a suffix array buys over this is the
per-MAXIMAL-REPEAT grouping (which copies align where), not better
excision coverage; that form stays out of scope for a declarative
engine.

Scale notes (100 TB): the gram aggregate gets a map-side combine and
shuffles one row per distinct gram; the join back is an equi-join on
the gram key (AQE-broadcast when the repeated-gram set is small, which
on real corpora it is after the >= min_count filter — and the needle
set of a real eval suite is fixed-size, so the decontamination form
broadcasts outright). Windows are partitioned by document id — no
global window anywhere. At full scale the gram key would be
``xxhash64(gram)`` to shrink shuffle width (identical result modulo
2^-64 collisions); the string key keeps the DuckDB oracles exact at
fixture scale, mirroring ``duplicate_passage_stats``'s documented
trade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from neulix_datahub_spark.operators.dedupe import normalize_text

__all__ = [
    "positioned_token_grams",
    "repeated_passages",
    "matching_passages",
    "remove_repeated_passages",
    "remove_matching_passages",
]


def _tokens(col: Column) -> Column:
    """Token array of the normalized text (Java ``\\s`` collapse, trim,
    lower — the engine-wide contract). NULL text stays NULL; empty text
    splits to ``[""]`` exactly like DuckDB's ``string_split``."""
    return F.split(normalize_text(col), " ")


def positioned_token_grams(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """Explode each document into its word ``n``-grams WITH the 0-based
    start-token position: ``(id_col, pos, gram)``.

    One ``regexp_extract_all`` pass (the ``_shingles`` lookahead trick —
    a zero-width match at every token start captures the next ``n``
    tokens), so element ``i`` of the match array IS the gram starting at
    token ``i`` and ``posexplode`` recovers positions for free. Documents
    shorter than ``n`` tokens produce no rows (they cannot contain an
    ``n``-token passage) — unlike ``_shingles`` there is deliberately no
    whole-text fallback here, because positions must be real.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    if id_col in ("pos", "gram"):
        raise ValueError(
            f"id_col {id_col!r} collides with the output's pos/gram columns"
        )
    normed = normalize_text(F.col(text_col))
    pat = rf"(?<=^|\s)(?=((?:\S+ ){{{n - 1}}}\S+))"
    grams = F.regexp_extract_all(normed, F.lit(pat), F.lit(1))
    return df.select(
        F.col(id_col),
        F.posexplode(F.coalesce(grams, F.array().cast("array<string>"))).alias(
            "pos", "gram"
        ),
    )


def _with_gram_key(grams: DataFrame, key_mode: str) -> DataFrame:
    """Project the gram identity the aggregate/join runs on. ``string``
    keeps the literal n-gram (DuckDB-oracle-exact, the fixture mode);
    ``hash`` replaces it with ``xxhash64(gram)`` — 8 bytes on the wire
    instead of ~50-byte token strings, the 100 TB shuffle-width mode
    (identical result modulo 2^-64 collisions; engine-internal, never
    oracle-visible — the bloom-prefilter stance)."""
    if key_mode == "string":
        return grams
    if key_mode == "hash":
        return grams.withColumn("gram", F.xxhash64("gram"))
    raise ValueError(f"key_mode must be 'string' or 'hash', got {key_mode!r}")


def _merge_hits_into_runs(hits: DataFrame, id_col: str, n: int) -> DataFrame:
    """Interval union: hit positions (each covering ``n`` tokens) merge
    into disjoint maximal runs per document. A hit starts a new passage
    only when its coverage neither overlaps nor touches the running max
    of prior covered ends (contiguous covered blocks are ONE passage;
    the -2 sentinel keeps the first hit a start)."""
    prev = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = Window.partitionBy(id_col).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marked = hits.withColumn(
        "__is_start",
        (
            F.col("pos")
            > F.coalesce(F.max(F.col("pos") + n - 1).over(prev), F.lit(-2)) + 1
        ).cast("int"),
    ).withColumn("__run", F.sum("__is_start").over(run))
    return (
        marked.groupBy(id_col, "__run")
        .agg(
            F.min("pos").alias("start_pos"),
            (F.max("pos") + n - 1).alias("end_pos"),
        )
        .select(
            id_col,
            "start_pos",
            "end_pos",
            (F.col("end_pos") - F.col("start_pos") + 1).alias("n_tokens"),
        )
    )


def repeated_passages(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    min_count: int = 2,
    key_mode: str = "string",
) -> DataFrame:
    """Maximal repeated passages: ``(id_col, start_pos, end_pos,
    n_tokens)`` — 0-based inclusive token intervals, disjoint within a
    document by construction.

    An ``n``-gram is *repeated* when it occurs >= ``min_count`` times in
    the whole corpus (total occurrences — a document repeating its own
    passage counts, matching Lee et al.'s substring definition).
    ``key_mode='hash'`` switches the aggregate/join key to
    ``xxhash64(gram)`` — the 100 TB shuffle-width mode, result-invariant
    modulo 2^-64 collisions (see :func:`_with_gram_key`).
    """
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    grams = _with_gram_key(
        positioned_token_grams(df, text_col, id_col, n), key_mode
    )
    repeated = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") >= min_count)
        .select("gram")
    )
    hits = grams.join(repeated, "gram").select(id_col, "pos")
    return _merge_hits_into_runs(hits, id_col, n)


def matching_passages(
    df: DataFrame,
    needles: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    needle_text_col: str = "text",
    key_mode: str = "string",
) -> DataFrame:
    """Passage-level decontamination marks: maximal token runs of ``df``
    covered by ``n``-grams that appear anywhere in ``needles`` (the
    benchmark/eval suite). Same output shape as ``repeated_passages``.

    The needle side reduces to its distinct gram set — for a real eval
    suite that is fixed-size (never grows with corpus scale), so the
    semi-join broadcasts and the training corpus is never shuffled.
    """
    grams = _with_gram_key(
        positioned_token_grams(df, text_col, id_col, n), key_mode
    )
    needle_grams = _with_gram_key(
        positioned_token_grams(
            needles.select(
                F.monotonically_increasing_id().alias("__nid"),
                F.col(needle_text_col),
            ),
            needle_text_col,
            "__nid",
            n,
        ),
        key_mode,
    ).select("gram").distinct()
    hits = grams.join(needle_grams, "gram", "left_semi").select(id_col, "pos")
    return _merge_hits_into_runs(hits, id_col, n)


def _scrub_with_runs(
    df: DataFrame, runs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Excise the run intervals from each document's token stream: the
    input frame with ``text_col`` replaced by the normalized text minus
    all covered tokens (joined by single spaces; a fully-covered
    document becomes the empty string), plus bookkeeping columns
    ``n_tokens_before`` / ``n_tokens_after`` / ``n_passages``.

    The run list collapses to one small array per touched document and
    joins back to the document row; the token array is then filtered in
    place by an ``exists``-over-runs lambda — no token explode, no
    reassembly shuffle. Untouched documents keep their normalized token
    stream verbatim.
    """
    # the bookkeeping columns are appended to the output; silently
    # shadowing an existing column would corrupt downstream consumers
    # (the bpe_segment_pandas out_col lesson) — refuse instead
    clash = {"n_tokens_before", "n_tokens_after", "n_passages"} & set(
        df.columns
    )
    if clash:
        raise ValueError(
            f"input already has column(s) {sorted(clash)} — rename them "
            "before scrubbing; the scrub appends bookkeeping columns of "
            "those names"
        )
    per_doc = runs.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct("start_pos", "end_pos"))
        ).alias("__runs"),
        F.count(F.lit(1)).alias("n_passages"),
        F.sum("n_tokens").alias("__covered"),
    )
    toks = _tokens(F.col(text_col))
    n_before = F.coalesce(F.size(toks), F.lit(0))
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("__runs"),
            lambda r: (i >= r["start_pos"]) & (i <= r["end_pos"]),
        ),
    )
    others = [c for c in df.columns if c != text_col]
    return (
        df.join(per_doc, id_col, "left")
        .select(
            *others,
            F.when(F.col("__runs").isNull(), normalize_text(F.col(text_col)))
            .otherwise(F.concat_ws(" ", kept))
            .alias(text_col),
            n_before.alias("n_tokens_before"),
            (n_before - F.coalesce(F.col("__covered"), F.lit(0))).alias(
                "n_tokens_after"
            ),
            F.coalesce(F.col("n_passages"), F.lit(0)).alias("n_passages"),
        )
    )


def remove_repeated_passages(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    min_count: int = 2,
    key_mode: str = "string",
) -> DataFrame:
    """Excise every corpus-repeated passage (see ``repeated_passages``).
    NOT idempotent by design: removal can butt new token adjacencies
    together (Lee et al. §4.1 accept the same)."""
    runs = repeated_passages(df, text_col, id_col, n, min_count, key_mode)
    return _scrub_with_runs(df, runs, text_col, id_col)


def remove_matching_passages(
    df: DataFrame,
    needles: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    needle_text_col: str = "text",
    key_mode: str = "string",
) -> DataFrame:
    """Excise every benchmark-matching passage (see
    ``matching_passages``): span-grain decontamination — the document
    survives minus the leaked excerpt, where the document-grain form
    (``curation.benchmark_ngram_contamination``) would drop it whole."""
    runs = matching_passages(
        df, needles, text_col, id_col, n, needle_text_col, key_mode
    )
    return _scrub_with_runs(df, runs, text_col, id_col)
