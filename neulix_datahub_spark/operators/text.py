"""Text-analysis operators for training-data pipelines (SURVEY §2.11 L4).

Not in the reference (its text handling stops at stringify/strip); these
are the corpus-curation extensions: token counting, quality scoring,
n-gram-heuristic language ID, and content fingerprinting. All pure
Column expressions — the entire document scan stays inside whole-stage
codegen; nothing crosses into Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neulix_datahub_spark.operators.dedupe import content_fingerprint, normalize_text

# Tiny per-language stopword marker sets for the n-gram heuristic. Public
# common-word lists; enough to discriminate on real text. Deliberately
# small so the regexes stay cheap.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
    "pt": ("o", "a", "de", "que", "e"),
}


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))


def word_token_count(col: Column | str) -> Column:
    """BPE-ish subword proxy: count word chunks and standalone
    punctuation/digit runs separately (regex tokenizer)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are common stopwords for ``lang``."""
    c = F.col(col) if isinstance(col, str) else col
    markers = "|".join(LANG_MARKERS[lang])
    hits = F.regexp_count(F.lower(c), F.lit(rf"\b({markers})\b"))
    return F.when(token_count(c) > 0, hits.cast("double") / token_count(c)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite heuristic quality score in [0, 1]:
    mean-word-length plausibility + low punctuation + stopword presence —
    the standard cheap pre-filters a corpus pipeline runs before anything
    expensive."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    mean_word = F.when(n_tok > 0, F.length(F.trim(c)).cast("double") / n_tok).otherwise(F.lit(0.0))
    len_ok = F.when((mean_word >= 3) & (mean_word <= 12), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(c) <= 0.2, 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(c) >= 0.01, 1.0).otherwise(0.0)
    nonempty = F.when(n_tok >= 5, 1.0).otherwise(0.0)
    return F.round((len_ok + punct_ok + stop_ok + nonempty) / 4.0, 6)


# Default weights for the model-based quality filter. In production
# these come from a trained classifier (fastText/logreg distilled to a
# linear head); the shape of the computation — broadcast weights applied
# as one codegen'd expression over cheap features — is the part that
# matters at 100 TB, and it is identical whatever the weights are.
QUALITY_MODEL: dict[str, float] = {
    "bias": -2.0,
    "log_tokens": 0.55,
    "punct_ratio": -6.0,
    "stopword_ratio": 9.0,
    "mean_word_len": 0.05,
}


def linear_quality_score(
    col: Column | str, model: dict[str, float] | None = None
) -> Column:
    """Model-based document quality: logistic score over the cheap text
    features (log token count, punctuation ratio, stopword ratio, mean
    word length) with caller-supplied weights — the expression-level
    analogue of running a distilled quality classifier, sitting between
    the heuristic :func:`quality_score` gates and a real model UDF.

    The weight dict is tiny and becomes literals in the expression tree
    (the degenerate "broadcast the model" case), so the whole score is
    one whole-stage-codegen projection: no UDF, no shuffle, no Python.
    """
    m = dict(QUALITY_MODEL, **(model or {}))
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    mean_word = F.when(
        n_tok > 0, F.length(F.trim(c)).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    z = (
        F.lit(m["bias"])
        + F.lit(m["log_tokens"]) * F.log1p(n_tok.cast("double"))
        + F.lit(m["punct_ratio"]) * punct_ratio(c)
        + F.lit(m["stopword_ratio"]) * stopword_ratio(c)
        + F.lit(m["mean_word_len"]) * mean_word
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def lang_id(col: Column | str) -> Column:
    """N-gram-heuristic language ID: pick the language whose marker-word
    hit count is highest (ties broken by language code order,
    deterministic). Returns the language code, or 'und' when nothing hits."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    scored = [
        F.struct(
            F.regexp_count(c, F.lit(rf"\b({'|'.join(words)})\b")).alias("hits"),
            F.lit(code).alias("code"),
        )
        for code, words in sorted(LANG_MARKERS.items())
    ]
    # array_max on struct orders by first field (hits) then code; invert
    # code ordering is not needed — highest hits wins, ties pick the
    # lexicographically largest code, documented determinism.
    best = F.array_max(F.array(*scored))
    return F.when(best.hits > 0, best.code).otherwise(F.lit("und"))


def fingerprint(col: Column | str) -> Column:
    """L4 document fingerprint: sha2-256 over normalized text (shared with
    the exact-dedup operator)."""
    return content_fingerprint(col)


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """L4: corpus-level TF-IDF — top ``k`` terms by summed tf·idf.

    Pure DataFrame composition (explode → two aggregations → broadcast
    of the single-row corpus size): tf is the term's count in a doc, idf
    is ln(N / df). Fully SQL-expressible, so the DuckDB oracle checks it
    exactly — the spark.ml HashingTF+IDF pipeline trades that
    checkability for feature-vector output; this is the analytic form.

    Scale: the explode is linear fan-out (no shuffle); doc-term counts
    shuffle on (doc, term) with map-side combine; term stats shuffle on
    term. Both keys are high-cardinality and uniform — no skew beyond
    stopwords, which AQE splits.
    """
    terms = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.split(normalize_text(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    doc_term = terms.groupBy("__doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.countDistinct(id_col).alias("__n"))
    term_stats = (
        doc_term.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sum("tf").alias("total_tf"),
        )
        .join(F.broadcast(n_docs))
        .select(
            "term",
            "doc_freq",
            F.round(
                F.col("total_tf") * F.log(F.col("__n") / F.col("doc_freq")), 6
            ).alias("tfidf"),
        )
    )
    return term_stats.orderBy(F.desc("tfidf"), F.asc("term")).limit(k)


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text profile: adds token/quality/lang/fingerprint columns.
    Single narrow projection — no shuffle."""
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        word_token_count(text_col).alias("n_word_tokens"),
        F.round(punct_ratio(text_col), 6).alias("punct_ratio"),
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing (L4+ curation: redact before training)
# ---------------------------------------------------------------------------

# Deliberately simple, portable regexes (no lookarounds — must behave
# identically under Spark's Java regex and common RE2-style engines):
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # digits interleaved with AT MOST ONE separator each — the earlier
    # unbounded [0-9()\-\s]{7,} run matched any numeric list ('10 20 30
    # 40'), redacting tables/year lists and merging adjacent numbers
    "phone": r"\+?[0-9](?:[()\-\s]?[0-9]){7,}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def pii_match_count(col: Column | str, kind: str) -> Column:
    """Number of matches of one PII pattern in the text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[kind]), F.lit(0)))


def scrub_pii(col: Column | str, replacement: str = "[REDACTED]") -> Column:
    """Redact all PII patterns (email/phone/SSN) from the text — one
    chained regexp_replace expression, fully codegen'd; at 100 TB this is
    a single narrow projection over the corpus scan, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    out = c
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, replacement)
    return out


# ---------------------------------------------------------------------------
# Repetition stats (L4+ curation: Gopher/C4-style quality signals)
# ---------------------------------------------------------------------------

def char_entropy(col: Column | str) -> Column:
    """Shannon entropy (nats) of the character distribution of the
    normalized text — the cheap degenerate-content detector (mashed keys,
    base64 blobs, and single-char runs all sit far from natural-language
    entropy, which is ~2.5–3.5 nats for alphabetic scripts).

    Pure expression, same family as :func:`top_word_share`: sort the
    character array, then one linear fold over equal-adjacent runs
    accumulating ``S = Σ c·ln(c)`` per run; entropy follows from the
    identity ``-Σ (c/n)·ln(c/n) = ln(n) - S/n``. O(n log n) per doc —
    replaces the earlier O(alphabet · length) count-per-distinct-char
    form; nothing leaves codegen, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(normalize_text(c), "")
    n = F.size(chars)

    def _term(run: Column) -> Column:
        r = run.cast("double")
        return F.when(run > 0, r * F.log(r)).otherwise(F.lit(0.0))

    def _step(acc: Column, ch: Column) -> Column:
        is_run = ch == acc["prev"]
        run = F.when(is_run, acc["run"] + 1).otherwise(F.lit(1))
        s = F.when(is_run, acc["s"]).otherwise(acc["s"] + _term(acc["run"]))
        return F.struct(ch.alias("prev"), run.alias("run"), s.alias("s"))

    big_s = F.aggregate(
        F.array_sort(chars),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0.0).alias("s"),
        ),
        _step,
        lambda acc: acc["s"] + _term(acc["run"]),
    )
    ent = F.log(n.cast("double")) - big_s / n.cast("double")
    return F.when(n > 0, F.round(ent, 6)).otherwise(F.lit(0.0))


def dup_ngram_fraction(col: Column | str, n: int = 2) -> Column:
    """Fraction of a document's word ``n``-grams that are repeats of an
    earlier one (1 − distinct/total) — the Gopher "duplicate n-gram
    fraction" repetition signal; looping/boilerplate text scores high,
    natural prose near zero.

    Total n-gram count is arithmetic on the token count (no second
    array build); the distinct count reuses the single-regex-pass
    shingle set. Documents shorter than ``n`` tokens score 0."""
    c = F.col(col) if isinstance(col, str) else col
    n_tokens = token_count(normalize_text(c))
    total = n_tokens - F.lit(n - 1)
    from neulix_datahub_spark.operators.dedupe import _shingles

    distinct_n = F.size(_shingles(c, n))
    return F.when(
        total > 0,
        F.round(
            F.lit(1.0) - distinct_n.cast("double") / total.cast("double"), 6
        ),
    ).otherwise(F.lit(0.0))


def top_word_share(col: Column | str) -> Column:
    """Fraction of all tokens taken by the single most frequent token of
    the normalized text — the word-level repetition signal (degenerate/
    boilerplate docs score high; Gopher filters on exactly this family).

    Pure expression: the most-frequent-token count equals the longest
    run of equal adjacent tokens after an array_sort — one O(n log n)
    sort plus a single O(n) fold tracking (prev, current-run, best-run),
    replacing the earlier O(distinct x total) count-per-distinct-token
    form. Nothing leaves codegen and there is no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    # drop the '' artifact: split('', ' ') is [''] (size 1), which made
    # an EMPTY document score 1.0 — maximally repetitive — while
    # token_count reports 0 tokens for the same text
    tokens = F.filter(
        F.split(normalize_text(c), " "), lambda t: t != ""
    )

    def _step(acc: Column, t: Column) -> Column:
        run = F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            t.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    best = F.aggregate(
        F.array_sort(tokens),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        _step,
        lambda acc: acc["best"],
    )
    return F.when(
        F.size(tokens) > 0,
        best.cast("double") / F.size(tokens),
    ).otherwise(F.lit(0.0))


def doc_unigram_perplexity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """L4+ LM-quality signal (the CCNet recipe, unigram form): score each
    document by the perplexity of a unigram language model trained on the
    corpus itself — ``exp(-mean_t ln p(t))`` over the document's tokens.
    Low = in-distribution text, high = noise/garble; the standard
    pretraining-corpus quality filter (KenLM in CCNet; the unigram form
    keeps the whole computation inside Spark SQL).

    Plan shape for 100 TB: tokenize once into per-doc term frequencies
    (one explode + groupBy with map-side combine), derive the vocabulary
    from the TF table (sub-linear in corpus size, Heaps' law), join TF
    against vocab on the token key (one shuffle), and carry the 1-row
    token total via a broadcast join. No Python anywhere.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(text_col), " ")).alias("__tok"),
    )
    tf = toks.groupBy(id_col, "__tok").agg(F.count(F.lit(1)).alias("__tf"))
    vocab = tf.groupBy("__tok").agg(F.sum("__tf").alias("__cnt"))
    total = vocab.agg(F.sum("__cnt").alias("__n"))
    scored = (
        tf.join(vocab, "__tok")
        .join(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            (
                F.sum(F.col("__tf") * F.log(F.col("__cnt") / F.col("__n")))
                / F.sum("__tf")
            ).alias("__avg_lp")
        )
    )
    return scored.select(F.col(id_col), F.exp(-F.col("__avg_lp")).alias("perplexity"))


def winnow_fingerprints(
    col: Column | str, k: int = 3, window: int = 4, seed: int = 42
) -> Column:
    """L4: winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    the MOSS rolling-hash scheme) as ONE array expression.

    Ordered word ``k``-grams (duplicates kept — position matters, unlike
    the distinct shingle SET MinHash uses) are hashed, then every
    sliding window of ``window`` consecutive gram hashes contributes its
    minimum; the distinct selected minima are the document's
    fingerprint set. The winnowing guarantee: any shared run of at
    least ``window + k - 1`` tokens between two documents yields at
    least one shared fingerprint — robust passage-level matching with a
    sketch ~|tokens|/window long, the localized complement of MinHash's
    whole-document similarity.

    Stays in codegen: one regex pass for the ordered grams, one
    transform for the hashes, one transform-over-sequence of array_min
    slices. Documents shorter than ``k`` tokens degrade to one
    whole-text hash.
    """
    c = F.col(col) if isinstance(col, str) else col
    normed = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    pat = rf"(?<=^|\s)(?=((?:\S+ ){{{k - 1}}}\S+))"
    grams = F.regexp_extract_all(normed, F.lit(pat), F.lit(1))
    hashes = F.when(F.size(grams) > 0, F.transform(
        grams, lambda g: F.xxhash64(g, F.lit(seed))
    )).otherwise(F.array(F.xxhash64(normed, F.lit(seed))))
    n = F.size(hashes)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - window, F.lit(0))),
            lambda i: F.array_min(F.slice(hashes, i + 1, F.least(F.lit(window), n))),
        )
    )


def doc_bigram_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame:
    """L4+ LM-quality signal, bigram form (one step closer to CCNet's
    KenLM than :func:`doc_unigram_perplexity`): per-doc perplexity under
    an interpolated bigram model trained on the corpus itself —
    ``p(cur|prev) = lam·c(prev,cur)/c(prev) + (1-lam)·c(cur)/N`` with
    the unigram corpus count as the context denominator (documented
    simplification: no doc-boundary adjustment; the oracle mirrors it).
    Documents with fewer than two tokens get no score (null-free output:
    they are absent from the result).

    Plan shape for 100 TB: tokenize once, derive adjacent pairs as a
    NARROW array transform (no window, no self-join on position), then
    three token-keyed aggregations (unigram counts, bigram counts, the
    1-row total) joined back against the exploded pairs — every shuffle
    is keyed on token text, the same sub-linear vocabulary argument as
    the unigram model. No Python anywhere.
    """
    t = F.split(normalize_text(text_col), " ")
    base = df.select(F.col(id_col), t.alias("__t"))
    pairs = (
        base.filter(F.size("__t") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(2, size(__t)), "
                    "i -> struct(element_at(__t, i - 1) AS prev, "
                    "element_at(__t, i) AS cur))"
                )
            ).alias("__pc"),
        )
        .select(id_col, F.col("__pc.prev").alias("__prev"), F.col("__pc.cur").alias("__cur"))
    )
    toks = base.select(F.explode("__t").alias("__tok"))
    uni = toks.groupBy("__tok").agg(F.count(F.lit(1)).cast("double").alias("__cnt"))
    total = uni.agg(F.sum("__cnt").alias("__n"))
    big = pairs.groupBy("__prev", "__cur").agg(
        F.count(F.lit(1)).cast("double").alias("__bc")
    )
    up = uni.select(F.col("__tok").alias("__prev"), F.col("__cnt").alias("__pcnt"))
    uc = uni.select(F.col("__tok").alias("__cur"), F.col("__cnt").alias("__ccnt"))
    p = lam * F.col("__bc") / F.col("__pcnt") + (1.0 - lam) * F.col("__ccnt") / F.col(
        "__n"
    )
    return (
        pairs.join(big, ["__prev", "__cur"])
        .join(up, "__prev")
        .join(uc, "__cur")
        .join(F.broadcast(total))
        .groupBy(id_col)
        .agg(F.exp(-F.avg(F.log(p))).alias("perplexity"))
    )


def nfc_normalize_udf():
    """L4 cleaning: Unicode NFC normalization as a VECTORIZED scalar
    pandas UDF — the one text op in this module that genuinely needs
    Python (Spark SQL has no Unicode-normalization function; composed
    vs decomposed forms otherwise break dedup fingerprints, shingles
    and tokenizers that all compare bytes).

    Arrow-batched SERIES→SERIES: each executor call normalizes a whole
    pandas batch via str-accessor-free pd.Series.map over
    unicodedata.normalize — 10-100× over a row-at-a-time Python UDF per
    the standard pandas-UDF arithmetic; still Python-priced, so run it
    ONCE at corpus ingest (before fingerprinting), not per query."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(batch: pd.Series) -> pd.Series:
        return batch.map(
            lambda s: None if s is None else unicodedata.normalize("NFC", s)
        )

    return nfc


def _hashed_feature_codes(
    col: Column | str, dim: int, bigrams: bool
) -> Column:
    """``array<struct<b, s>>`` of (bucket, sign) codes for the
    normalized tokens (+ adjacent bigrams): bucket =
    ``int(md5('hemb:'||f)[:8], 16) % dim``, sign ±1 from the 9th hex
    digit's parity. Each feature hashes exactly ONCE (the naive
    per-dimension spelling re-inlined the hash into every dim lambda —
    Catalyst does no common-subexpression elimination across lambda
    bodies; measured ~9 s/doc before the hoist). Shared by both
    embedding spellings so their parity is structural."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.coalesce(
        F.split(normalize_text(c), " "), F.array().cast("array<string>")
    )
    feats = toks
    if bigrams:
        # zip_with against the 1-shifted slice: both ARGUMENTS evaluate
        # once per row, and the lambda touches only its element vars.
        # The previous index spelling (element_at(toks, i) inside a
        # transform lambda) re-inlined the whole normalize+split PER
        # BIGRAM ELEMENT, twice — the no-CSE-across-lambdas trap again,
        # measured 24 µs/feature (~13 s for 5 000 sf0.1 docs) vs ~2 s
        # after the hoist. zip_with pads the shorter side with NULL, so
        # the final pair (and every pair of a <2-token doc) drops in
        # the null filter — no size guard needed.
        bg = F.filter(
            F.zip_with(
                toks,
                F.slice(
                    toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))
                ),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
            lambda x: x.isNotNull(),
        )
        feats = F.concat(toks, bg)

    # two-stage: hash every feature ONCE into its hex string, then
    # derive (bucket, sign) from the element var — putting both
    # substrings on `h` inside one lambda would run md5 twice per
    # feature (interpreted HOF bodies get no subexpression reuse)
    hashes = F.transform(
        feats, lambda f: F.md5(F.concat(F.lit("hemb:"), f))
    )
    return F.transform(
        hashes,
        lambda h: F.struct(
            (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % dim).alias(
                "b"
            ),
            (
                F.lit(1)
                - F.lit(2)
                * (F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2)
            ).alias("s"),
        ),
    )


def _l2_normalize_or_zero(raw: Column) -> Column:
    """``array<long>`` counts → unit-L2 ``array<double>`` (all-zero
    stays all-zero); index-order double accumulation both engines.

    Spelled through two nested 1-element-array transforms so ``raw``
    and the norm each evaluate ONCE: the direct spelling put the norm
    aggregate inside the normalize lambda, where (no CSE across
    lambda boundaries) it re-ran per element — and ``raw`` here is
    often itself an O(features × dim) fold, making that O(features ×
    dim²) per row (measured 42 ms/doc at dim 64; ~1 ms after this
    hoist). Same arithmetic in the same order — values bit-identical,
    only the evaluation count changes (the batch-ADC sequence-
    transform lesson, third application)."""
    return F.element_at(
        F.transform(
            F.array(raw),  # raw materializes once as the element
            lambda r: F.element_at(
                F.transform(
                    F.array(
                        F.sqrt(
                            F.aggregate(
                                r,
                                F.lit(0.0),
                                lambda acc, x: acc
                                + x.cast("double") * x.cast("double"),
                            )
                        )
                    ),  # norm materializes once as the element
                    lambda n: F.when(
                        n > 0,
                        F.transform(r, lambda x: x.cast("double") / n),
                    ).otherwise(
                        F.transform(r, lambda x: x.cast("double"))
                    ),
                ),
                1,
            ),
        ),
        1,
    )


def hashed_ngram_embedding(
    col: Column | str, dim: int = 64, bigrams: bool = True
) -> Column:
    """L3/L4 bridge (round 12): a deterministic, model-free text
    embedding via the signed hashing trick (Weinberger et al.; the
    role Spark ML's HashingTF plays, but md5-derived so a DuckDB
    oracle replays it bit-for-bit — murmur3 is not portable).

    Features are the normalized tokens (plus adjacent-token bigrams by
    default); each feature lands in a signed bucket
    (:func:`_hashed_feature_codes`), counts accumulate as exact
    INTEGERS (so the pre-normalization vector is engine-exact), then
    the vector is L2-normalized in doubles. NULL/empty text → the
    zero vector.

    This is the pure-COLUMN spelling: no explode, no shuffle, but the
    accumulation fold runs interpreted at O(features × dim) lambda
    evaluations per row (~2 ms/doc at dim=64 after the r13 norm hoist
    — see ``_l2_normalize_or_zero``) — fine for expression contexts
    and modest dims. For corpus-scale embedding jobs use
    :func:`hashed_embedding_table`, which hashes identically (shared
    code construction, parity unit-pinned) but aggregates by explode +
    groupBy and assembles via an O(dim) map lookup."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    bs = _hashed_feature_codes(col, dim, bigrams)
    raw = F.aggregate(
        bs,
        F.array_repeat(F.lit(0).cast("long"), dim),
        lambda acc, x: F.transform(
            acc,
            lambda v, i: v
            + F.when(x["b"] == i.cast("long"), x["s"]).otherwise(
                F.lit(0).cast("long")
            ),
        ),
    )
    return _l2_normalize_or_zero(raw)


def hashed_embedding_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 64,
    bigrams: bool = True,
    out_col: str = "embedding",
) -> DataFrame:
    """The corpus-scale spelling of :func:`hashed_ngram_embedding`:
    ``(id_col, out_col)`` with identical values (parity unit-pinned —
    the feature-code construction is literally shared).

    Plan shape: explode the per-row feature codes → ONE map-side-
    combined (id, bucket) aggregate of the signed counts → per-doc
    map assembly + O(dim) lookups. The shuffle carries at most
    min(#features, dim) rows per document (bucket-grain, not
    token-grain), and the per-row assembly is O(dim) instead of the
    Column form's O(features × dim) interpreted fold. Documents whose
    text is NULL (no features) are preserved with the zero vector via
    the left join."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    if out_col in (id_col,):
        raise ValueError(f"out_col {out_col!r} collides with id_col")
    bs = _hashed_feature_codes(text_col, dim, bigrams)
    # the norm comes out of the SAME aggregate as the bucket map —
    # zero buckets contribute zero, so Σ__v² over cells == Σ over the
    # assembled array, as exact integers (< 2^53, so equal to the
    # double fold at any association). Computing it here instead of
    # inside the normalize lambda matters enormously: a norm spelled
    # as aggregate(raw,…) INSIDE transform(e, x/norm) re-evaluates the
    # whole O(dim) map-lookup fold per element (no CSE across lambda
    # boundaries — the SCALE.md lesson, measured 20s for 5 000 docs at
    # sf0.1); as a plain aggregate column it is one per-row attribute
    # and the same job runs in ~1s.
    cells = (
        df.select(F.col(id_col), F.explode(bs).alias("__x"))
        .groupBy(id_col, F.col("__x.b").alias("__b"))
        .agg(F.sum("__x.s").cast("long").alias("__v"))
        .groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("__b", "__v"))
            ).alias("__m"),
            F.sqrt(
                F.sum(F.col("__v") * F.col("__v")).cast("double")
            ).alias("__nrm"),
        )
    )
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i.cast("long")),
            F.lit(0).cast("long"),
        ),
    )
    e = F.transform(raw, lambda x: x.cast("double"))
    normed = F.when(
        F.col("__nrm") > 0,
        F.transform(e, lambda x: x / F.col("__nrm")),
    ).otherwise(e)
    return (
        df.select(id_col)
        .join(cells, id_col, "left")
        .select(
            F.col(id_col),
            F.when(
                F.col("__m").isNull(),
                F.array_repeat(F.lit(0.0), dim),
            )
            .otherwise(normed)
            .alias(out_col),
        )
    )
