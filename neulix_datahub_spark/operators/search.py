"""Full-text search over the corpus: inverted index + boolean retrieval
+ BM25 ranking, expressed relationally.

An inverted index IS a relation — ``(token, doc_id, tf)`` — and every
classic IR operation is relational algebra over it: conjunctive boolean
retrieval is a semi-join-and-count (a doc matches an AND query iff its
posting rows cover every term), BM25 is one join + one aggregate over
document/term statistics. Expressing it this way buys what a bespoke
index structure cannot: the index is a table (partition it by token
hash, snapshot-version it, time-travel it), the planner prunes and
broadcasts it like any table, and a SQL oracle can replay retrieval
bit-for-bit.

Scale shape: the index build is one explode + one groupBy (shuffle on
token — skewed stopword tokens are exactly the hot keys
operators/skew.py handles; or drop them, as every production index
does). A query touches only its terms' postings: the per-term semi-join
reads |postings(term)| rows, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neulix_datahub_spark.operators.dedupe import normalize_text


def tokenize(col) -> F.Column:
    """Whitespace tokens of the normalized text (lowercase, collapsed) —
    the same normalization the dedup tier uses, so index and corpus
    agree on what a token is."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(normalize_text(c), " ")


def normalize_terms(terms: list[str]) -> list[str]:
    """Query terms through the SAME normalization the index applied to
    the corpus (``tokenize``'s Python twin: lowercase, collapse
    whitespace, split). Without this, 'Spark' or 'table ' compares raw
    against lowercased postings and silently matches nothing — the
    query side must agree with the index on what a token is, exactly as
    the module docstring promises. A multi-word term contributes each
    of its tokens. Raises on an effectively-empty query: a silent
    zero-match (or a vacuous match-all) hides a caller bug."""
    import re

    out: list[str] = []
    for t in terms:
        # Java \s class + space-only strip (Python's Unicode \s would
        # tokenize queries differently than the JVM-side postings)
        out.extend(
            w
            for w in re.sub(r"[ \t\n\x0b\f\r]+", " ", t.lower())
            .strip(" ").split(" ")
            if w
        )
    if not out:
        raise ValueError(f"query terms are empty after normalization: {terms!r}")
    return out


def build_inverted_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The ``(token, doc_id, tf)`` postings relation plus nothing else —
    document frequencies and lengths derive from it by aggregation
    (kept normalized: one fact, no denormalized copies to drift)."""
    return (
        df.select(F.col(id_col), F.explode(tokenize(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def conjunctive_search(
    index: DataFrame, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Boolean AND retrieval: docs whose postings cover EVERY query
    term — one filtered scan of the terms' postings, one groupBy, a
    count==n_terms filter. Returns (doc_id)."""
    terms = normalize_terms(terms)
    n = len(set(terms))
    return (
        index.filter(F.col("token").isin(list(set(terms))))
        .groupBy(id_col)
        .agg(F.count_distinct("token").alias("__hit"))
        .filter(F.col("__hit") == n)
        .select(id_col)
    )


def bm25_rank(
    index: DataFrame,
    doc_lengths: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 scoring of the query terms (OR semantics, standard Robertson
    idf with the +1 floor):

        score(d) = Σ_t ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
                   · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

    ``doc_lengths`` carries (doc_id, dl) for every document (derivable
    from the index: sum(tf) per doc). One join of the query terms'
    postings against df/length stats, one aggregate per doc. Returns
    (doc_id, score) — callers round before ranking if cross-engine
    order stability at float ties matters (the driver query does).
    """
    uniq = list(set(normalize_terms(terms)))
    # one combined driver action for both corpus scalars (count() plus
    # a second agg would scan doc_lengths twice per query)
    stats = doc_lengths.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("a")
    ).first()
    n_docs, avgdl = stats["n"], stats["a"]
    if not n_docs:
        # empty corpus: no postings, no scores — float(None) would
        # TypeError below; an empty frame is the honest answer
        return doc_lengths.select(
            F.col(id_col), F.lit(0.0).alias("score")
        ).limit(0)
    dfreq = (
        index.filter(F.col("token").isin(uniq))
        .groupBy("token")
        .agg(F.count_distinct(id_col).alias("__df"))
    )
    postings = index.filter(F.col("token").isin(uniq)).join(
        F.broadcast(dfreq), "token"
    ).join(doc_lengths, id_col)
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf_term = (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl))))
    )
    return (
        postings.select(F.col(id_col), (idf * tf_term).alias("__s"))
        .groupBy(id_col)
        .agg(F.sum("__s").alias("score"))
    )


def proximity_spans(
    pos_index: DataFrame, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """NEAR/k retrieval support: for every document containing ALL the
    (distinct) query terms, the MINIMAL span — min over one-occurrence-
    per-term choices of ``max(pos) − min(pos)`` — the number a
    proximity predicate (``span <= slop``) filters on and a proximity
    ranker scores by. Relationally: one join leg per distinct term,
    equi-joined on the document (each leg reads only that term's
    postings; occurrences per term per doc are few, so the k-way join
    is occurrences^k-per-doc, never tokens^k — the phrase_search
    argument with ranges instead of consecutive equality). Returns
    ``(id_col, min_span, n_combos)`` where n_combos counts the
    one-per-term choices examined."""
    toks = sorted(set(normalize_terms(terms)))
    if len(toks) < 2:
        raise ValueError(
            f"proximity needs at least 2 distinct terms, got {toks!r}"
        )
    legs = None
    cols = []
    for k, term in enumerate(toks):
        leg = pos_index.filter(F.col("token") == term).select(
            F.col(id_col), F.col("pos").alias(f"__p{k}")
        )
        legs = leg if legs is None else legs.join(leg, id_col)
        cols.append(F.col(f"__p{k}"))
    span = F.greatest(*cols) - F.least(*cols)
    return legs.groupBy(id_col).agg(
        F.min(span).cast("long").alias("min_span"),
        F.count(F.lit(1)).cast("long").alias("n_combos"),
    )


def keyword_snippets(
    df: DataFrame,
    terms: list[str],
    window: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    pos_index: DataFrame | None = None,
) -> DataFrame:
    """Result snippets: for every document matching any query term,
    the contiguous token window that covers the MOST query-term hits
    (the highlight excerpt a search result page shows). Fully
    relational and deterministic, so a SQL oracle replays it:

    - hit positions come from the positional postings (one filtered
      scan of the terms' rows);
    - candidate windows anchor AT each hit ``p`` and span tokens
      ``[p, p + 2·window]``; coverage is a bounded self-join of the
      doc's hit positions (hits per doc are few — the join is
      hit²-per-doc, not token²);
    - best window = max coverage, then EARLIEST anchor (the
      struct-max trick: ``max(struct(cnt, -pos))`` needs no window
      function);
    - the snippet text is a slice of the normalized token array
      joined on single spaces (the index's own tokenization, so the
      excerpt matches what scored).

    ``pos_index`` (optional) supplies precomputed ``(id_col, pos,
    token)`` rows — e.g. the persisted positional family via
    ``search_index.keyword_snippets_index`` — so hit detection reads
    the index and only MATCHED documents re-tokenize for the excerpt;
    omitted, positions build from ``df`` directly.

    Returns ``(id_col, n_hits, anchor_pos, covered, snippet)`` with
    0-based ``anchor_pos``."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    uniq = list(set(normalize_terms(terms)))
    if pos_index is None:
        pos_index = build_positional_index(df, text_col, id_col)
    pos = pos_index.filter(F.col("token").isin(uniq))
    a, b = pos.alias("a"), pos.alias("b")
    covered = (
        a.join(
            b,
            (F.col(f"a.{id_col}") == F.col(f"b.{id_col}"))
            & (F.col("b.pos") >= F.col("a.pos"))
            & (F.col("b.pos") <= F.col("a.pos") + 2 * window),
        )
        .groupBy(F.col(f"a.{id_col}").alias(id_col), F.col("a.pos").alias("__p"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    best = covered.groupBy(id_col).agg(
        F.max(F.struct(F.col("__c"), (-F.col("__p")).alias("__np"))).alias(
            "__b"
        ),
        F.count(F.lit(1)).cast("long").alias("n_hits"),
    )
    # join FIRST, tokenize after: the excerpt slice then evaluates only
    # on matched documents (projected above the join), not the corpus
    toks = F.filter(tokenize(text_col), lambda t: t != "")
    return (
        df.select(F.col(id_col), F.col(text_col))
        .join(best, id_col)
        .select(
            id_col,
            "n_hits",
            (-F.col("__b.__np")).cast("long").alias("anchor_pos"),
            F.col("__b.__c").cast("long").alias("covered"),
            F.array_join(
                F.slice(
                    toks, -F.col("__b.__np") + 1, F.lit(2 * window + 1)
                ),
                " ",
            ).alias("snippet"),
        )
    )


def rrf_fuse(
    ranked: list[DataFrame], id_col: str = "doc_id", k: int = 60
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of N
    ranked lists — the standard score-free way to combine retrieval
    signals whose scores are incomparable (BM25 vs cosine, here):

        rrf(d) = Σ_lists 1 / (k + rank_list(d))

    Each input carries ``(id_col, rank)`` with rank 1-based; a document
    absent from a list simply contributes nothing (the union-groupBy
    spelling — no outer-join ladder, one shuffle at id grain no matter
    how many lists). k=60 is the paper's constant. The arithmetic is
    engine-exact: each contribution is one correctly-rounded IEEE
    division of small integers and the per-doc sum has ≤N terms —
    callers round before ordering all the same (the BM25 discipline).
    Returns ``(id_col, rrf)``."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    contrib = [
        df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias("__c"),
        )
        for df in ranked
    ]
    out = contrib[0]
    for c in contrib[1:]:
        out = out.unionByName(c)
    return out.groupBy(id_col).agg(F.sum("__c").alias("rrf"))


def build_positional_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The phrase-capable index: ``(token, doc_id, pos)`` — one row per
    token OCCURRENCE with its 0-based position. Bigger than the tf
    index by the repetition factor; build it only when phrase/proximity
    queries are in the workload (the standard Lucene trade)."""
    return df.select(
        F.col(id_col),
        F.posexplode(tokenize(text_col)).alias("pos", "token"),
    ).filter(F.col("token") != "")


def phrase_search(
    pos_index: DataFrame, phrase: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Exact phrase retrieval: the terms must occur at CONSECUTIVE
    positions. Relationally: self-joins of the positional postings with
    ``pos_k = pos_0 + k`` — each join leg reads only that term's
    postings, and the equi-join key (doc, aligned position) keeps it a
    hash join, no window or UDF. Returns distinct (doc_id,
    n_occurrences)."""
    phrase = normalize_terms(phrase)
    legs = None
    for k, term in enumerate(phrase):
        leg = pos_index.filter(F.col("token") == term).select(
            F.col(id_col),
            (F.col("pos") - k).alias("__start"),
        )
        legs = leg if legs is None else legs.join(leg, [id_col, "__start"])
    return legs.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_occurrences"))
