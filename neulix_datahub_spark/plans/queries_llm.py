"""Training-data-pipeline queries (SURVEY §2.11): the near-dup tier
(exact n-gram Jaccard, embedding-cosine, MinHash/SimHash pipelines),
the LM-quality tier (unigram + interpolated-bigram perplexity), text
curation (packing/chunking/decontamination/boilerplate/entropy/NFC
normalization), exact distributed PCA (+ Gram-partial mergeability),
k-means, and the leakage-safe splits. Everything here is
oracle-hash-checked — approximate operators emit exact anchors plus
measured-bound verdicts the oracle pins true.

Pair generation is bounded deterministically (a doc_id / vec_id modulus
picks the probe set) — the oracle needs an exact, enumerable pair set; at
100 TB the same operators run with LSH buckets as the blocking key
instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neulix_datahub_spark.operators.dedupe import (
    minhash_near_duplicates,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    verify_candidate_pairs,
)
from neulix_datahub_spark.functions.ranking import local_relation
from neulix_datahub_spark.operators.similarity import embedding_near_duplicates
from neulix_datahub_spark.sources.tables import load_table


def planted_near_dup_corpus(spark: SparkSession, sf_dir: str, n_docs: int = 100) -> DataFrame:
    """The fixture corpus has no organic near-dups, so the near-dup
    pipelines are exercised on a planted one: the first ``n_docs``
    documents plus a perturbed copy of each (id shifted by 1e6, first
    token dropped) — every planted pair is a high-Jaccard near-dup the
    pipeline must find, and the construction is pure SQL so a DuckDB
    oracle can rebuild it exactly."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < n_docs)
    perturbed = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000).withColumn(
        "text", F.expr("substring(text, instr(text, ' ') + 1)")
    )
    return docs.unionByName(perturbed)


def ngram_jaccard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram Jaccard over same-language doc pairs (probe set:
    doc_id % 10 == 0). ``max_block=128`` routes the language blocks
    through the triangular pair-task decomposition (with_pair_tasks), so
    the driver row also certifies the bounded path: output is identical
    to the all-pairs block join the oracle computes, but no task ever
    holds more than 128² pairs — the shape that survives a
    boilerplate-heavy language at 100 TB. The price is real and
    accepted: the task-key exchange + per-side window put the bench
    sample at ~1.3s vs ~0.85s for the unbounded join at sf0.1 (round 5
    moved the self-join to canonically identical dataset-alias sides —
    interleaved A/B measured 1.32s vs 1.44s for the renamed-projection
    form, and 1.17s under a forced shuffle join where the shared
    exchange is realized; the hint stays unforced because AQE reaches
    the shuffle join on its own at real scale. A lineage-breaking
    localCheckpoint was measured to claw back only ~0.25s, rejected). Language blocks GROW with the corpus, so the
    unbounded form is a quadratic bomb at the design point — fixed
    overhead at toy scale buys the bound that matters. Multi-chunk
    output-identity is additionally driver-certified by
    fuzzy_part_pairs at sf0.01 and unit-asserted on a 60-row hot block
    at caps 3/7/16. At 100 TB the cap would sit in the thousands."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return ngram_jaccard_pairs(
        docs, text_col="text", id_col="doc_id", n=2, threshold=0.02,
        block_col="lang", max_block=128,
    )


# DuckDB mirrors the Spark shingling exactly: normalize (lower, collapse
# whitespace, trim), split on ' ', adjacent-pair shingles (i, i+1) —
# DuckDB list slices are 1-based and end-inclusive, so t[i:i+1] is the
# bigram at i — with a whole-text fallback for one-token docs, then
# set-semantics intersect/union.
_NGRAM_JACCARD_SQL = """
WITH sh AS (
    SELECT doc_id, lang,
           list_distinct(
               CASE WHEN len(t) >= 2
                    THEN [array_to_string(t[i:i+1], ' ')
                          for i in generate_series(1, len(t) - 1)]
                    ELSE [array_to_string(t, ' ')] END
           ) AS shingles
    FROM (
        SELECT doc_id, lang,
               string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' ') AS t
        FROM documents WHERE doc_id % 10 = 0
    )
)
SELECT id_a, id_b, jaccard
FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                 / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND a.lang = b.lang
)
WHERE jaccard >= 0.02
"""


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine near-duplicate pairs: probe set vec_id % 20 == 0 against the
    full corpus, threshold 0.30.

    This is deliberately the probe×corpus BRUTE-FORCE form — it exists
    because it is exactly SQL-expressible, so the DuckDB oracle can pin
    the arithmetic the approximate paths are verified against. It is NOT
    the 100 TB path: a full-corpus near-dup run buckets first
    (``ivf_assign_buckets``) and pairs within buckets, exactly as
    dedupe.py routes text near-dup through MinHash bands — see
    ``ivf_recall_check`` for the bucketed path's driver-checked recall."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(
        emb,
        threshold=0.30,
        probe_filter=F.col("vec_id") % 20 == 0,
    )


_EMBEDDING_NEAR_DUP_SQL = """
SELECT id_a, id_b, cos_sim
FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
               AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.vec_id % 20 = 0
     AND (a.vec_id < b.vec_id OR NOT (b.vec_id % 20 = 0))
)
WHERE cos_sim >= 0.30
"""


def tfidf_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: corpus-level TF-IDF top-20 terms, exact and oracle-checked."""
    from neulix_datahub_spark.operators.text import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, text_col="text", id_col="doc_id", k=20)


_TFIDF_SQL = """
WITH terms AS (
    SELECT doc_id,
           unnest(string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' ')) AS term
    FROM documents
),
doc_term AS (
    SELECT doc_id, term, count(*) AS tf
    FROM terms WHERE term <> '' GROUP BY doc_id, term
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
stats AS (
    SELECT term, CAST(count(*) AS BIGINT) AS doc_freq,
           CAST(sum(tf) AS BIGINT) AS total_tf
    FROM doc_term GROUP BY term
)
SELECT term, doc_freq,
       round(total_tf * ln(n_docs::DOUBLE / doc_freq), 6) AS tfidf
FROM stats, n
ORDER BY tfidf DESC, term
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Concat-and-chunk packing: documents laid head-to-tail per language,
# assigned to the 2048-token pack where each starts (exclusive running
# sum / budget — see operators/packing.py). Summary per (lang, pack).
# ---------------------------------------------------------------------------

def token_pack_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from neulix_datahub_spark.operators.packing import pack_by_token_budget
    from neulix_datahub_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count("text").alias("n_tokens")
    )
    packed = pack_by_token_budget(
        docs, id_col="doc_id", token_col="n_tokens", budget=2048, part_col="lang"
    )
    return (
        packed.groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
        )
        .orderBy("lang", "pack_id")
    )


_PACK_SQL = """
WITH toks AS (
    SELECT doc_id, lang,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '[ \t\n\v\f\r]+')) END AS n_tokens
    FROM documents
),
packed AS (
    SELECT lang, n_tokens,
           CAST(floor(coalesce(sum(n_tokens) OVER (
                    PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                / 2048.0) AS BIGINT) AS pack_id
    FROM toks
)
SELECT lang, pack_id, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
FROM packed
GROUP BY lang, pack_id
ORDER BY lang, pack_id
"""


def doc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+ sliding-window chunking (round 4): chunk_by_tokens splits
    each document into 64-token windows overlapping by 8 — the RAG /
    eval-context prep sibling of token_pack_summary's tape packing.
    Aggregates per language over every chunk row; the oracle replays
    the identical chunk geometry (count, coverage, partials) with
    DuckDB list slicing, so any boundary/overlap drift hash-fails.
    Plan: narrow split + sequence-explode + slice, one shuffle for the
    final aggregate — scales like any per-document map."""
    from neulix_datahub_spark.operators.packing import chunk_by_tokens

    docs = load_table(spark, sf_dir, "documents")
    ch = chunk_by_tokens(docs, "text", "doc_id", chunk_size=64, overlap=8)
    return (
        ch.groupBy("lang")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_chunk_tokens").cast("bigint").alias("sum_chunk_tokens"),
            F.sum(F.when(F.col("n_chunk_tokens") < 64, 1).otherwise(0))
            .cast("bigint")
            .alias("n_partial_chunks"),
        )
        .orderBy("lang")
    )


_CHUNK_SQL = """
WITH t AS (
    SELECT doc_id, lang,
           CASE WHEN trim(regexp_replace(text, '[ \t\n\v\f\r]+', ' ', 'g')) = ''
                THEN CAST([] AS VARCHAR[])
                ELSE string_split(trim(regexp_replace(text, '[ \t\n\v\f\r]+', ' ', 'g')), ' ')
           END AS toks
    FROM documents
),
sized AS (
    SELECT doc_id, lang, toks,
           CASE WHEN len(toks) <= 64 THEN 1
                ELSE (len(toks) - 64 + 55) // 56 + 1 END AS n_chunks
    FROM t
),
chunks AS (
    SELECT doc_id, lang,
           len(toks[u.i * 56 + 1 : u.i * 56 + 64]) AS n_chunk_tokens
    FROM sized, unnest(generate_series(0, n_chunks - 1)) u(i)
)
SELECT lang,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       count(*) AS n_chunks,
       CAST(sum(n_chunk_tokens) AS BIGINT) AS sum_chunk_tokens,
       CAST(count(*) FILTER (WHERE n_chunk_tokens < 64) AS BIGINT) AS n_partial_chunks
FROM chunks
GROUP BY lang
ORDER BY lang
"""


def udtf_chunk_parity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 (round 9): the Python UDTF surface, oracle-checked by parity.
    ChunkTokensUDTF (lateral table function, row-at-a-time Python)
    mirrors chunk_by_tokens (pure expressions); this query runs BOTH
    over the corpus, counts full-row disagreements with two symmetric
    exceptAll's (``n_udtf_mismatch``, pinned 0 by the oracle), and
    reports the per-language chunk stats FROM THE UDTF PATH — so the
    driver hash certifies the UDTF's own output, not just the
    comparison. The UDTF tier is deliberately absent from the headline
    bench: it is the slowest Python path and exists for semantics the
    expression forms cover here (see operators/udtfs.py)."""
    from neulix_datahub_spark.operators.packing import chunk_by_tokens
    from neulix_datahub_spark.operators.udtfs import register_udtfs

    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents")
    u = spark.sql(
        "SELECT d.doc_id, d.lang, c.chunk_id, c.chunk_text, c.n_chunk_tokens "
        "FROM {d} d, LATERAL neulix_chunk_tokens(d.text, 64, 8) c",
        d=docs,
    )
    e = chunk_by_tokens(docs, "text", "doc_id", chunk_size=64, overlap=8).select(
        "doc_id", "lang", "chunk_id", "chunk_text", "n_chunk_tokens"
    )
    mism = u.exceptAll(e).unionByName(e.exceptAll(u)).agg(
        F.count(F.lit(1)).alias("__m")
    )
    return (
        u.groupBy("lang")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_chunk_tokens").cast("bigint").alias("sum_chunk_tokens"),
        )
        .crossJoin(F.broadcast(mism))
        .select(
            "lang", "n_docs", "n_chunks", "sum_chunk_tokens",
            F.col("__m").cast("bigint").alias("n_udtf_mismatch"),
        )
        .orderBy("lang")
    )


_UDTF_CHUNK_SQL = """
WITH t AS (
    SELECT doc_id, lang,
           CASE WHEN trim(regexp_replace(text, '[ \t\n\v\f\r]+', ' ', 'g')) = ''
                THEN CAST([] AS VARCHAR[])
                ELSE string_split(trim(regexp_replace(text, '[ \t\n\v\f\r]+', ' ', 'g')), ' ')
           END AS toks
    FROM documents
    WHERE text IS NOT NULL
),
sized AS (
    SELECT doc_id, lang, toks,
           CASE WHEN len(toks) <= 64 THEN 1
                ELSE (len(toks) - 64 + 55) // 56 + 1 END AS n_chunks
    FROM t
),
chunks AS (
    SELECT doc_id, lang,
           len(toks[u.i * 56 + 1 : u.i * 56 + 64]) AS n_chunk_tokens
    FROM sized, unnest(generate_series(0, n_chunks - 1)) u(i)
)
SELECT lang,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       count(*) AS n_chunks,
       CAST(sum(n_chunk_tokens) AS BIGINT) AS sum_chunk_tokens,
       CAST(0 AS BIGINT) AS n_udtf_mismatch
FROM chunks
GROUP BY lang
ORDER BY lang
"""


def minhash_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 candidates→verify, oracle-checked: MinHash LSH candidates over
    the planted near-dup corpus, verified with exact 3-gram Jaccard and
    kept at >= 0.8.

    This is the correctness signal for the LSH path: the DuckDB oracle
    computes the exact >= 0.8 pair set from scratch (all-pairs — fine at
    oracle scale, never the 100 TB plan), so a green row proves the
    banded join missed none of them. At 64 hashes / 16 bands the miss
    probability for a 0.8-Jaccard pair is (1 - 0.8^4)^16 ≈ 2e-4 and the
    planted pairs sit near 0.95, so agreement is structural, not luck."""
    corpus = planted_near_dup_corpus(spark, sf_dir)
    cand = minhash_near_duplicates(
        corpus, text_col="text", id_col="doc_id", num_hashes=64, bands=16, shingle_n=3
    )
    return verify_candidate_pairs(
        corpus, cand, text_col="text", id_col="doc_id", n=3, threshold=0.8
    )


_MINHASH_VERIFIED_SQL = """
WITH corpus AS (
    SELECT doc_id, text FROM documents WHERE doc_id < 100
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, substring(text, instr(text, ' ') + 1) AS text
    FROM documents WHERE doc_id < 100
),
sh AS (
    SELECT doc_id,
           list_distinct(
               CASE WHEN len(t) >= 3
                    THEN [array_to_string(t[i:i+2], ' ')
                          for i in generate_series(1, len(t) - 2)]
                    ELSE [array_to_string(t, ' ')] END
           ) AS shingles
    FROM (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' ') AS t
        FROM corpus
    )
)
SELECT id_a, id_b, jaccard
FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                 / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
WHERE jaccard >= 0.8
"""


def simhash_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 determinism check, driver-visible and oracle-checked: SimHash
    and the MinHash signature are pure functions of the *normalized*
    text, so uppercasing and whitespace inflation must not change either.
    Counts per language how many documents survive both invariances —
    the oracle asserts all of them do. Runs on a deterministic 20%
    sample (doc_id % 5): a normalization bug hits every document
    equally, so the sample carries the full signal at a fifth of the
    4-signature cost (sim+minhash on clean AND messy text)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    messy = F.regexp_replace(F.upper(F.col("text")), " ", "   ")
    return (
        docs.select(
            "lang",
            (simhash("text") == simhash(messy)).cast("long").alias("__sim_ok"),
            (minhash_signature("text") == minhash_signature(messy))
            .cast("long")
            .alias("__mh_ok"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__sim_ok").alias("n_simhash_invariant"),
            F.sum("__mh_ok").alias("n_minhash_invariant"),
        )
        .orderBy("lang")
    )


_SIMHASH_INVARIANCE_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_simhash_invariant,
       CAST(count(*) AS BIGINT) AS n_minhash_invariant
FROM documents
WHERE doc_id % 5 = 0
GROUP BY lang
ORDER BY lang
"""


def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+ curation, driver-visible: PII redaction over the corpus. The
    fixture text is synthetic bag-of-words (no organic PII), so emails are
    planted deterministically on every 7th doc; the query counts matches
    before scrubbing and asserts zero remain after — per language, so the
    oracle checks both the detector and the scrubber end-to-end."""
    from neulix_datahub_spark.operators.text import (
        PII_PATTERNS,
        pii_match_count,
        scrub_pii,
    )

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact: user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.col("text")),
    )
    scrubbed = planted.select(
        "lang",
        pii_match_count("text", "email").alias("__n_email"),
        pii_match_count(scrub_pii("text"), "email").alias("__n_after"),
    )
    return (
        scrubbed.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("__n_email") > 0).cast("long")).alias("n_docs_with_email"),
            F.sum("__n_email").alias("n_email_matches"),
            F.every(F.col("__n_after") == 0).alias("all_clean_after_scrub"),
        )
        .orderBy("lang")
    )


_PII_SQL = r"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_email,
       CAST(sum(n_email) AS BIGINT) AS n_email_matches,
       TRUE AS all_clean_after_scrub
FROM (
    SELECT lang,
           len(regexp_extract_all(
               CASE WHEN doc_id % 7 = 0
                    THEN text || ' contact: user' || CAST(doc_id AS VARCHAR) || '@example.com'
                    ELSE text END,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email
    FROM documents
)
GROUP BY lang
ORDER BY lang
"""


def word_repetition_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+ curation, driver-visible: Gopher-style word-repetition signal —
    per language, the average and maximum share of a document's tokens
    taken by its single most frequent token. Degenerate/boilerplate docs
    score high; curation pipelines threshold on this family."""
    from neulix_datahub_spark.operators.text import top_word_share

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return (
        docs.select("lang", top_word_share("text").alias("__share"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("__share"), 6).alias("avg_top_word_share"),
            F.round(F.max("__share"), 6).alias("max_top_word_share"),
        )
        .orderBy("lang")
    )


_REPETITION_SQL = r"""
WITH toks AS (
    SELECT doc_id, lang,
           string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' ') AS t
    FROM documents WHERE doc_id % 5 = 0
),
shares AS (
    SELECT doc_id, lang,
           CASE WHEN len(t) > 0 THEN (
               SELECT max(cnt)::DOUBLE FROM (
                   SELECT count(*) AS cnt FROM unnest(t) AS u(w) GROUP BY w
               )
           ) / len(t) ELSE 0.0 END AS share
    FROM toks
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(share), 6) AS avg_top_word_share,
       round(max(share), 6) AS max_top_word_share
FROM shares
GROUP BY lang
ORDER BY lang
"""


def char_entropy_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+ curation, driver-visible: per-language character-entropy
    profile — the cheap degenerate-content signal (mashed keys / blobs /
    single-char runs sit far below natural-language entropy)."""
    from neulix_datahub_spark.operators.text import char_entropy

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", char_entropy("text").alias("__ent"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("__ent"), 6).alias("avg_char_entropy"),
            F.round(F.min("__ent"), 6).alias("min_char_entropy"),
            F.round(F.max("__ent"), 6).alias("max_char_entropy"),
        )
        .orderBy("lang")
    )


_CHAR_ENTROPY_SQL = r"""
WITH norm AS (
    SELECT lang, trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')) AS nt
    FROM documents
),
ents AS (
    SELECT lang,
           CASE WHEN len(nt) > 0 THEN round((
               SELECT -sum((cnt::DOUBLE / len(nt)) * ln(cnt::DOUBLE / len(nt)))
               FROM (
                   SELECT count(*) AS cnt
                   FROM unnest(string_split(nt, '')) AS u(ch)
                   GROUP BY ch
               )
           ), 6) ELSE 0.0 END AS ent
    FROM norm
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(ent), 6) AS avg_char_entropy,
       round(min(ent), 6) AS min_char_entropy,
       round(max(ent), 6) AS max_char_entropy
FROM ents
GROUP BY lang
ORDER BY lang
"""


# Per-language mixing rates for the sampler query. Content-hash
# sampling: cutoffs are 4-hex-digit md5 prefixes (en keeps 1/2, zh 1/8,
# the rest 1/4) — see operators/curation.py for why string comparison is
# the portable form.
MIXING_RATES = {"en": 0.5, "de": 0.25, "es": 0.25, "fr": 0.25, "zh": 0.125}


def token_budget_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7 curation, driver-visible (round 11): the token-budget epoch
    planner — allocate ``budget = floor(1.3 × total tokens)`` across
    sources by sqrt-temperature water-filling with a ``1.4 × n_i``
    epoch cap (``curation.plan_token_budget_waterfall``; closed-form,
    one ordered window pass, every decision integer-exact). At sf0.01
    the two smallest sources CAP and the freed budget waterfalls to the
    rest — the branch is load-bearing at the driver's gate; the
    allocation column sums back to the budget by construction.

    The DuckDB oracle replays the identical fixed-point construction:
    rational-floor caps/budget, ``floor(1e6·sqrt(n))`` weights, the
    HUGEINT prefix cap test, and the same two correctly-rounded double
    ops per output row."""
    from neulix_datahub_spark.operators.curation import (
        plan_token_budget_waterfall,
    )
    from neulix_datahub_spark.operators.dedupe import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    toks = F.coalesce(
        F.size(F.split(normalize_text(F.col("text")), " ")), F.lit(0)
    )
    counts = docs.groupBy("source").agg(
        F.sum(toks).cast("long").alias("n_tokens")
    )
    return plan_token_budget_waterfall(
        counts, budget_frac=(13, 10), cap_frac=(7, 5)
    ).orderBy("source")


# Factored (the head/tail lesson): the CTE prefix computes the
# integer-exact water-filling; _WATERFALL_SQL reads the plan out,
# _EPOCH_MATERIALIZE_SQL builds the realized epoch multiset on top.
_WATERFALL_CTES = r"""
WITH counts AS (
    SELECT source,
           CAST(sum(len(string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
),
base AS (
    SELECT source, n_tokens,
           CAST(floor(n_tokens * 7 / 5) AS BIGINT) AS cap_tokens,
           CAST(floor(1000000 * sqrt(n_tokens)) AS BIGINT) AS w
    FROM counts
),
tot AS (SELECT CAST(floor(sum(n_tokens) * 13 / 10) AS BIGINT) AS b,
               CAST(sum(w) AS BIGINT) AS w_total FROM base),
ordered AS (
    SELECT base.*, b, w_total,
           COALESCE(CAST(sum(cap_tokens) OVER (ORDER BY cap_tokens * 1.0 / w, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS c_prev,
           w_total - COALESCE(CAST(sum(w) OVER (ORDER BY cap_tokens * 1.0 / w, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS w_rest
    FROM base, tot
),
flagged AS (
    SELECT *,
           (cap_tokens::HUGEINT * w_rest < (b - c_prev)::HUGEINT * w) AS capped
    FROM ordered
),
lam AS (
    SELECT CAST(sum(CASE WHEN capped THEN cap_tokens ELSE 0 END) AS BIGINT)
               AS c_capped,
           CAST(sum(CASE WHEN capped THEN 0 ELSE w END) AS BIGINT) AS w_unc
    FROM flagged
),
plan AS (
    SELECT source, n_tokens, cap_tokens, capped,
           CASE WHEN capped THEN CAST(cap_tokens AS DOUBLE)
                ELSE least(CAST(cap_tokens AS DOUBLE),
                           CAST((b - c_capped) * w AS DOUBLE)
                           / CAST(w_unc AS DOUBLE)) END AS alloc_raw
    FROM flagged, lam
)
"""

_WATERFALL_SQL = _WATERFALL_CTES + r"""
SELECT source, n_tokens, cap_tokens, capped,
       round(alloc_raw, 4) AS alloc_tokens,
       round(alloc_raw / n_tokens, 6) AS epochs
FROM plan
ORDER BY source
"""


_LOGREG_ITERS, _LOGREG_LR, _LOGREG_QUANT = 10, 0.1, 1_000_000

# integer feature construction shared by engine and oracle (centered,
# |x| <= ~16 so plain GD converges; see operators/classifier.py).
# `split` is the content-hash train/holdout assignment (hash_split's
# 'split:' salt, 0.8 cutoff = 'cccc'); the base query trains on ALL
# rows, the holdout query on the train slice only.
_LOGREG_FEAT_SQL = r"""
WITH toks AS (
    SELECT lang,
           CASE WHEN substring(md5('split:' || COALESCE(text, '')), 1, 4)
                     < 'cccc'
                THEN 'train' ELSE 'holdout' END AS split,
           string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' ') AS t
    FROM documents
),
feat AS (
    SELECT lang, split,
           CAST(floor(len(t) / 16) AS BIGINT) - 10 AS f1,
           CAST(floor(floor(100.0 * len(list_distinct(t)) / len(t)) / 8)
                AS BIGINT) - 6 AS f2,
           CAST(list_aggregate([len(x) for x in t], 'max') AS BIGINT) - 5
               AS f3,
           CASE WHEN 2 * len(list_distinct(t)) >= len(t) THEN 1 ELSE 0 END
               AS y
    FROM toks
),
w0 AS (SELECT 0.0 AS b, 0.0 AS wa, 0.0 AS wb, 0.0 AS wc)
"""


def _logreg_oracle_sql(
    final_sql: str,
    train_where: str = "",
    iters: int = _LOGREG_ITERS,
    lr: float = _LOGREG_LR,
    quant: int = _LOGREG_QUANT,
    phases: list[tuple[int, str]] | None = None,
    feat_sql: str | None = None,
) -> str:
    """Assemble the unrolled-GD oracle (the batched-BPE 16-CTE
    precedent): iteration i computes four exact INTEGER gradient sums
    from the fixed-point-quantized residual over its phase's TRAINING
    slice, then the next weight row by the same two correctly-rounded
    double ops the engine performs; ``final_sql`` reads the scored
    corpus out.

    ``phases`` is a list of ``(n_iters, where_clause)`` — the warm-
    start refresh lifecycle unrolls as later phases continuing from
    the previous phase's weight row over a DIFFERENT slice, with the
    slice's own ``n`` in the update (``train_where``/``iters`` are the
    single-phase shorthand)."""
    if phases is None:
        phases = [(iters, train_where)]
    nn_ctes = ",\n".join(
        f"nn{p} AS (SELECT CAST(count(*) AS BIGINT) AS n FROM feat "
        f"{where})"
        for p, (_, where) in enumerate(phases)
    )
    parts = [
        (feat_sql or _LOGREG_FEAT_SQL).replace(
            "w0 AS", f"{nn_ctes},\nw0 AS"
        )
    ]
    i = 0
    for p, (k, where) in enumerate(phases):
        for _ in range(k):
            parts.append(f""",
g{i} AS MATERIALIZED (
    SELECT CAST(sum(rq) AS BIGINT) AS g0,
           CAST(sum(rq * f1) AS BIGINT) AS g1,
           CAST(sum(rq * f2) AS BIGINT) AS g2,
           CAST(sum(rq * f3) AS BIGINT) AS g3
    FROM (
        SELECT f1, f2, f3,
               CAST(floor({quant} * (1.0 / (1.0 + exp(-(w.b + w.wa * f1
                    + w.wb * f2 + w.wc * f3))) - y)) AS BIGINT) AS rq
        FROM feat, w{i} w {where}
    )
),
w{i + 1} AS (
    SELECT w.b - {lr} * (g.g0 / ({quant} * nn{p}.n)) AS b,
           w.wa - {lr} * (g.g1 / ({quant} * nn{p}.n)) AS wa,
           w.wb - {lr} * (g.g2 / ({quant} * nn{p}.n)) AS wb,
           w.wc - {lr} * (g.g3 / ({quant} * nn{p}.n)) AS wc
    FROM w{i} w, g{i} g, nn{p}
)""")
            i += 1
    parts.append(f""",
scored AS (
    SELECT lang, split, y,
           1.0 / (1.0 + exp(-(w.b + w.wa * f1 + w.wb * f2 + w.wc * f3)))
               AS s,
           w.b, w.wa, w.wb, w.wc
    FROM feat, w{i} w
)
""")
    parts.append(final_sql.format(quant=quant))
    return "".join(parts)


# the stream twin's feature SQL: the shared construction + the
# content-hash micro-batch assignment ('stream:' salt, hex digit < '8')
_LOGREG_STREAM_FEAT_SQL = _LOGREG_FEAT_SQL.replace(
    "THEN 'train' ELSE 'holdout' END AS split,",
    "THEN 'train' ELSE 'holdout' END AS split,\n"
    "           CASE WHEN substring(md5('stream:' || COALESCE(text, '')),"
    " 1, 1) < '8'\n                THEN 'a' ELSE 'b' END AS sbatch,",
).replace(
    "    SELECT lang, split,",
    "    SELECT lang, split, sbatch,",
)
assert "sbatch" in _LOGREG_STREAM_FEAT_SQL


_TRAINED_CLASSIFIER_SQL = _logreg_oracle_sql(
    """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN s >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(CAST(sum(CAST(floor({quant} * s) AS BIGINT)) AS DOUBLE)
             / ({quant}.0 * count(*)), 4) AS avg_score,
       round(any_value(b), 6) AS w_bias,
       round(any_value(wa), 6) AS w_f1,
       round(any_value(wb), 6) AS w_f2,
       round(any_value(wc), 6) AS w_f3
FROM scored
GROUP BY lang
ORDER BY lang"""
)

_HOLDOUT_CLASSIFIER_SQL = _logreg_oracle_sql(
    """
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN (s >= 0.5) = (y = 1) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       CAST(sum(CASE WHEN s >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(CAST(sum(CAST(floor({quant} * s) AS BIGINT)) AS DOUBLE)
             / ({quant}.0 * count(*)), 4) AS avg_score
FROM scored
GROUP BY split
ORDER BY split""",
    train_where="WHERE split = 'train'",
)

# the refresh lifecycle unrolled: day 1 trains 4 iterations on the
# 80% slice ('train' under the shared split salt), day 2 warm-starts
# 6 more over the FULL corpus (the slice's own n in each phase's
# update) — the oracle lands on the sidecar's committed weights only
# if warm start, the JSON weight round-trip, and the per-phase n are
# all exact
_REFRESH_CLASSIFIER_SQL = _logreg_oracle_sql(
    """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN s >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(CAST(sum(CAST(floor({quant} * s) AS BIGINT)) AS DOUBLE)
             / ({quant}.0 * count(*)), 4) AS avg_score,
       round(any_value(b), 6) AS w_bias,
       round(any_value(wa), 6) AS w_f1,
       round(any_value(wb), 6) AS w_f2,
       round(any_value(wc), 6) AS w_f3,
       CAST(10 AS BIGINT) AS iters_done,
       TRUE AS sidecar_roundtrip_exact
FROM scored
GROUP BY lang
ORDER BY lang""",
    phases=[(4, "WHERE split = 'train'"), (6, "")],
)


# mini-batch SGD (round 13): the shared feature construction + the
# content-hash batch assignment ('mb:' salt, first 8 hex digits mod 4)
# — the deterministic schedule both engines and every rerun walk
_LOGREG_MB_FEAT_SQL = _LOGREG_FEAT_SQL.replace(
    "THEN 'train' ELSE 'holdout' END AS split,",
    "THEN 'train' ELSE 'holdout' END AS split,\n"
    "           CAST('0x' || substring(md5('mb:' || COALESCE(text, '')),"
    " 1, 8) AS BIGINT) % 4 AS mb,",
).replace(
    "    SELECT lang, split,",
    "    SELECT lang, split, mb,",
)
assert " AS mb" in _LOGREG_MB_FEAT_SQL

# 2 epochs × 4 content-hash batches = 8 one-iteration phases, each
# dividing by its batch's own n — the mini-batch trajectory unrolled
_MINIBATCH_CLASSIFIER_SQL = _logreg_oracle_sql(
    """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN s >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(CAST(sum(CAST(floor({quant} * s) AS BIGINT)) AS DOUBLE)
             / ({quant}.0 * count(*)), 4) AS avg_score,
       round(any_value(b), 6) AS w_bias,
       round(any_value(wa), 6) AS w_f1,
       round(any_value(wb), 6) AS w_f2,
       round(any_value(wc), 6) AS w_f3
FROM scored
GROUP BY lang
ORDER BY lang""",
    phases=[
        (1, f"WHERE mb = {b}") for _ in range(2) for b in range(4)
    ],
    feat_sql=_LOGREG_MB_FEAT_SQL,
)


STREAM_REFRESH_CLASSIFIER_SQL = _logreg_oracle_sql(
    """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN s >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(CAST(sum(CAST(floor({quant} * s) AS BIGINT)) AS DOUBLE)
             / ({quant}.0 * count(*)), 4) AS avg_score,
       round(any_value(b), 6) AS w_bias,
       round(any_value(wa), 6) AS w_f1,
       round(any_value(wb), 6) AS w_f2,
       round(any_value(wc), 6) AS w_f3,
       CAST(10 AS BIGINT) AS iters_done,
       CAST(1 AS BIGINT) AS last_batch_id
FROM scored
GROUP BY lang
ORDER BY lang""",
    phases=[
        (4, "WHERE split = 'train'"),
        (3, "WHERE sbatch = 'a'"),
        (3, "WHERE sbatch = 'b'"),
    ],
    feat_sql=_LOGREG_STREAM_FEAT_SQL,
)


def trained_classifier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+ model-based quality filtering, TRAINING included (round 11):
    where ``quality_classifier_stats`` applies fixed weights, this query
    TRAINS the logistic model in-engine — 10 full-batch GD iterations
    over integer text features (length band, repetition percentile
    band, max-token-length), weak labels from the repetition rule
    (distinct/total >= 1/2), fixed-point gradient accumulation so every
    gradient is an exact integer sum (``operators/classifier.py``) —
    then scores the corpus with the learned weights. Emits per
    language: docs, kept (score >= 0.5), the quantized mean score, and
    the learned weights themselves (every GD step oracle-pinned: the
    DuckDB oracle replays all 10 iterations as unrolled CTEs and must
    land on the SAME weights to 6 dp). At sf0.01 the model reaches
    ~97% training accuracy against the weak labels and keeps ~42% —
    the branch separations are load-bearing.

    Scale: per iteration ONE map-side-combined aggregate of 4 integers
    over a narrow integer projection (pinned by localCheckpoint so the
    text features compute once, not once per iteration); the driver
    holds 4 floats."""
    from neulix_datahub_spark.operators.classifier import (
        logistic_score,
        train_logistic_classifier,
    )
    from neulix_datahub_spark.operators.dedupe import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    t = F.split(normalize_text(F.col("text")), " ")
    tot, dis = F.size(t), F.size(F.array_distinct(t))
    mx = F.array_max(F.transform(t, lambda x: F.length(x)))
    feat = docs.select(
        "lang",
        (F.floor(tot / F.lit(16)).cast("long") - 10).alias("f1"),
        (
            F.floor(F.floor(F.lit(100.0) * dis / tot) / F.lit(8)).cast("long")
            - 6
        ).alias("f2"),
        (mx.cast("long") - 5).alias("f3"),
        (F.lit(2) * dis >= tot).cast("int").alias("y"),
    ).localCheckpoint(eager=True)
    w = train_logistic_classifier(
        feat,
        ["f1", "f2", "f3"],
        "y",
        iters=_LOGREG_ITERS,
        lr=_LOGREG_LR,
        quant=_LOGREG_QUANT,
    )
    s = logistic_score(w, ["f1", "f2", "f3"])
    sq = F.floor(F.lit(float(_LOGREG_QUANT)) * s).cast("long")
    return (
        feat.select("lang", s.alias("__s"), sq.alias("__sq"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("__s") >= 0.5).cast("bigint")).alias("n_kept"),
            F.round(
                F.sum("__sq").cast("double")
                / (F.lit(float(_LOGREG_QUANT)) * F.count(F.lit(1))),
                4,
            ).alias("avg_score"),
        )
        .withColumn("w_bias", F.round(F.lit(w[0]), 6))
        .withColumn("w_f1", F.round(F.lit(w[1]), 6))
        .withColumn("w_f2", F.round(F.lit(w[2]), 6))
        .withColumn("w_f3", F.round(F.lit(w[3]), 6))
        .orderBy("lang")
    )


def classifier_holdout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+ model evaluation (round 11): the leakage-safe ML loop —
    content-hash 80/20 split (``curation.hash_split``: exact duplicates
    land in the SAME split, so holdout never sees a byte-identical
    twin of a training doc), train the logistic model on the TRAIN
    slice only, score BOTH slices. Emits per split: docs, correct
    predictions against the weak labels, kept share, quantized mean
    score — the holdout row is the one that certifies the model
    generalizes rather than memorizes.

    The DuckDB oracle replays split assignment (same md5 'split:' salt
    and 'cccc' cutoff), all 10 GD iterations over the train slice, and
    both evaluations."""
    from neulix_datahub_spark.operators.classifier import (
        logistic_score,
        train_logistic_classifier,
    )
    from neulix_datahub_spark.operators.curation import hash_split
    from neulix_datahub_spark.operators.dedupe import normalize_text

    docs = hash_split(
        load_table(spark, sf_dir, "documents"),
        {"train": 0.8, "holdout": 0.2},
    )
    t = F.split(normalize_text(F.col("text")), " ")
    tot, dis = F.size(t), F.size(F.array_distinct(t))
    mx = F.array_max(F.transform(t, lambda x: F.length(x)))
    feat = docs.select(
        "split",
        (F.floor(tot / F.lit(16)).cast("long") - 10).alias("f1"),
        (
            F.floor(F.floor(F.lit(100.0) * dis / tot) / F.lit(8)).cast("long")
            - 6
        ).alias("f2"),
        (mx.cast("long") - 5).alias("f3"),
        (F.lit(2) * dis >= tot).cast("int").alias("y"),
    ).localCheckpoint(eager=True)
    w = train_logistic_classifier(
        feat.filter(F.col("split") == "train"),
        ["f1", "f2", "f3"],
        "y",
        iters=_LOGREG_ITERS,
        lr=_LOGREG_LR,
        quant=_LOGREG_QUANT,
    )
    s = logistic_score(w, ["f1", "f2", "f3"])
    sq = F.floor(F.lit(float(_LOGREG_QUANT)) * s).cast("long")
    return (
        feat.select(
            "split",
            "y",
            s.alias("__s"),
            sq.alias("__sq"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                ((F.col("__s") >= 0.5) == (F.col("y") == 1)).cast("bigint")
            ).alias("n_correct"),
            F.sum((F.col("__s") >= 0.5).cast("bigint")).alias("n_kept"),
            F.round(
                F.sum("__sq").cast("double")
                / (F.lit(float(_LOGREG_QUANT)) * F.count(F.lit(1))),
                4,
            ).alias("avg_score"),
        )
        .orderBy("split")
    )


def classifier_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+ model evaluation, completed (round 13): the holdout check
    reports accuracy; a curation pipeline decides with per-class
    precision/recall/F1 (the classes are imbalanced — accuracy alone
    hides a keep-everything classifier) and a calibration table (is a
    0.8 score actually right 80% of the time — the number a
    quality-threshold sweep trusts). Train on the content-hash 80%
    slice, evaluate the HOLDOUT slice only:

    - per class c in {0, 1}: support, tp/fp/fn as exact integers, and
      precision = tp/(tp+fp), recall = tp/(tp+fn),
      F1 = 2tp/(2tp+fp+fn) — each a SINGLE correctly-rounded division
      of integers, floor-quantized to q6 (NULL when the denominator is
      0, identically in both engines);
    - per score decile floor(10·s): count, quantized mean predicted
      score, observed positive rate.

    The DuckDB oracle unrolls the 10 GD iterations (the shared
    ``_logreg_oracle_sql`` builder) and replays every count, division
    and bin."""
    from neulix_datahub_spark.operators.classifier import (
        logistic_score,
        train_logistic_classifier,
    )
    from neulix_datahub_spark.operators.curation import hash_split
    from neulix_datahub_spark.operators.dedupe import normalize_text

    docs = hash_split(
        load_table(spark, sf_dir, "documents"),
        {"train": 0.8, "holdout": 0.2},
    )
    t = F.split(normalize_text(F.col("text")), " ")
    tot, dis = F.size(t), F.size(F.array_distinct(t))
    mx = F.array_max(F.transform(t, lambda x: F.length(x)))
    feat = docs.select(
        "split",
        (F.floor(tot / F.lit(16)).cast("long") - 10).alias("f1"),
        (
            F.floor(F.floor(F.lit(100.0) * dis / tot) / F.lit(8)).cast("long")
            - 6
        ).alias("f2"),
        (mx.cast("long") - 5).alias("f3"),
        (F.lit(2) * dis >= tot).cast("int").alias("y"),
    ).localCheckpoint(eager=True)
    w = train_logistic_classifier(
        feat.filter(F.col("split") == "train"),
        ["f1", "f2", "f3"],
        "y",
        iters=_LOGREG_ITERS,
        lr=_LOGREG_LR,
        quant=_LOGREG_QUANT,
    )
    s = logistic_score(w, ["f1", "f2", "f3"])
    hold = (
        feat.filter(F.col("split") == "holdout")
        .select(
            "y",
            (s >= 0.5).cast("int").alias("yp"),
            F.floor(F.lit(10.0) * s).cast("long").alias("bin"),
            F.floor(F.lit(float(_LOGREG_QUANT)) * s).cast("long").alias(
                "sq"
            ),
        )
        .localCheckpoint(eager=True)
    )

    def _q6_div(num: F.Column, den: F.Column) -> F.Column:
        return F.when(
            den > 0, F.floor(F.lit(1e6) * num / den).cast("double")
        )

    cls_rows = []
    for c in (0, 1):
        tp = F.sum(((F.col("yp") == c) & (F.col("y") == c)).cast("bigint"))
        fp = F.sum(((F.col("yp") == c) & (F.col("y") != c)).cast("bigint"))
        fn = F.sum(((F.col("yp") != c) & (F.col("y") == c)).cast("bigint"))
        cls_rows.append(
            hold.agg(
                F.sum((F.col("y") == c).cast("bigint")).alias("n"),
                tp.alias("tp"),
                fp.alias("fp"),
                fn.alias("fn"),
            ).select(
                F.lit("class").alias("metric_kind"),
                F.lit(c).cast("long").alias("k"),
                "n", "tp", "fp", "fn",
                _q6_div(F.col("tp"), F.col("tp") + F.col("fp")).alias(
                    "m1_q6"
                ),
                _q6_div(F.col("tp"), F.col("tp") + F.col("fn")).alias(
                    "m2_q6"
                ),
                _q6_div(
                    F.lit(2) * F.col("tp"),
                    F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn"),
                ).alias("m3_q6"),
            )
        )
    bins = (
        hold.groupBy(F.col("bin").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("sq").alias("__sqs"),
            F.sum("y").cast("long").alias("__pos"),
        )
        .select(
            F.lit("bin").alias("metric_kind"),
            "k",
            "n",
            F.lit(None).cast("long").alias("tp"),
            F.lit(None).cast("long").alias("fp"),
            F.lit(None).cast("long").alias("fn"),
            F.round(
                F.col("__sqs").cast("double")
                / (F.lit(float(_LOGREG_QUANT)) * F.col("n")),
                4,
            ).alias("m1_q6"),
            F.round(F.col("__pos").cast("double") / F.col("n"), 4).alias(
                "m2_q6"
            ),
            F.lit(None).cast("double").alias("m3_q6"),
        )
    )
    out = cls_rows[0].unionByName(cls_rows[1]).unionByName(bins)
    return out.orderBy("metric_kind", "k")


_EVAL_METRICS_SQL = _logreg_oracle_sql(
    """
, hold AS (
    SELECT y, CASE WHEN s >= 0.5 THEN 1 ELSE 0 END AS yp,
           CAST(floor(10.0 * s) AS BIGINT) AS bin,
           CAST(floor({quant} * s) AS BIGINT) AS sq
    FROM scored WHERE split = 'holdout'
),
cls AS (
    SELECT 'class' AS metric_kind, CAST(c.c AS BIGINT) AS k,
           CAST(sum(CASE WHEN y = c.c THEN 1 ELSE 0 END) AS BIGINT) AS n,
           CAST(sum(CASE WHEN yp = c.c AND y = c.c THEN 1 ELSE 0 END)
                AS BIGINT) AS tp,
           CAST(sum(CASE WHEN yp = c.c AND y != c.c THEN 1 ELSE 0 END)
                AS BIGINT) AS fp,
           CAST(sum(CASE WHEN yp != c.c AND y = c.c THEN 1 ELSE 0 END)
                AS BIGINT) AS fn
    FROM hold, (SELECT unnest([0, 1]) AS c) c
    GROUP BY c.c
),
clsm AS (
    SELECT metric_kind, k, n, tp, fp, fn,
           CASE WHEN tp + fp > 0
                THEN CAST(floor(1000000.0 * tp / (tp + fp)) AS DOUBLE)
           END AS m1_q6,
           CASE WHEN tp + fn > 0
                THEN CAST(floor(1000000.0 * tp / (tp + fn)) AS DOUBLE)
           END AS m2_q6,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN CAST(floor(1000000.0 * 2 * tp / (2 * tp + fp + fn))
                          AS DOUBLE)
           END AS m3_q6
    FROM cls
),
binm AS (
    SELECT 'bin' AS metric_kind, bin AS k,
           CAST(count(*) AS BIGINT) AS n,
           CAST(NULL AS BIGINT) AS tp, CAST(NULL AS BIGINT) AS fp,
           CAST(NULL AS BIGINT) AS fn,
           round(CAST(sum(sq) AS DOUBLE) / ({quant}.0 * count(*)), 4)
               AS m1_q6,
           round(CAST(sum(y) AS DOUBLE) / count(*), 4) AS m2_q6,
           CAST(NULL AS DOUBLE) AS m3_q6
    FROM hold GROUP BY bin
)
SELECT * FROM clsm
UNION ALL
SELECT * FROM binm
ORDER BY metric_kind, k""",
    train_where="WHERE split = 'train'",
)


def classifier_refresh_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+ incremental classifier refresh (round 12, r11-verdict task
    3): the daily-DAG retraining lifecycle end-to-end — day 1 trains 4
    GD iterations on the 80% content-hash slice and COMMITS the weights
    to a sidecar (``classifier.save_classifier``, write-then-rename);
    day 2 ``refresh_classifier`` warm-starts 6 more iterations over the
    FULL (grown) corpus from the persisted weights and commits back.
    Scores the corpus with the refreshed model; emits per language:
    docs, kept, quantized mean score, the refreshed weights, the
    sidecar's advanced ``iters_done``, and a verdict that the sidecar
    JSON round-trip preserved the weights BIT-exactly (refresh vs a
    direct warm-start call that never touches disk).

    The DuckDB oracle unrolls BOTH phases — 4 iterations over the
    slice with the slice's n, then 6 over the full relation with the
    full n, continuing from the phase-1 weight row — and must land on
    the same committed weights to 6 dp; it pins the round-trip verdict
    true and ``iters_done`` at 10. Reference parity: the daily re-run
    operating model of neulix_dataflow/dags/wikipedia_dag.py:20-23.

    Scale: per iteration ONE map-side-combined aggregate of 4 integer
    sums over the localCheckpoint-pinned integer features; the sidecar
    holds 4 floats — state is O(d), never O(rows)."""
    from neulix_datahub_spark.operators.classifier import (
        load_classifier,
        logistic_score,
        refresh_classifier,
        save_classifier,
        train_logistic_classifier,
    )
    from neulix_datahub_spark.operators.curation import hash_split
    from neulix_datahub_spark.operators.dedupe import normalize_text
    from neulix_datahub_spark.sources.io import warehouse_scratch

    docs = hash_split(
        load_table(spark, sf_dir, "documents"),
        {"train": 0.8, "holdout": 0.2},
    )
    t = F.split(normalize_text(F.col("text")), " ")
    tot, dis = F.size(t), F.size(F.array_distinct(t))
    mx = F.array_max(F.transform(t, lambda x: F.length(x)))
    feat = docs.select(
        "lang",
        "split",
        (F.floor(tot / F.lit(16)).cast("long") - 10).alias("f1"),
        (
            F.floor(F.floor(F.lit(100.0) * dis / tot) / F.lit(8)).cast("long")
            - 6
        ).alias("f2"),
        (mx.cast("long") - 5).alias("f3"),
        (F.lit(2) * dis >= tot).cast("int").alias("y"),
    ).localCheckpoint(eager=True)
    cols = ["f1", "f2", "f3"]
    # day 1: train on the slice, commit the sidecar
    w_day1 = train_logistic_classifier(
        feat.filter(F.col("split") == "train"),
        cols,
        "y",
        iters=4,
        lr=_LOGREG_LR,
        quant=_LOGREG_QUANT,
    )
    path = f"{warehouse_scratch(spark, '_neulix_clf_')}/model"
    save_classifier(
        path, w_day1, cols, "y", _LOGREG_LR, _LOGREG_QUANT, iters_done=4
    )
    # day 2: warm-start refresh over the full corpus, commit back
    meta = refresh_classifier(feat, path, iters=6)
    w = meta["weights"]
    # the same 6 warm-started iterations WITHOUT the sidecar round-trip
    # must give bit-identical weights (JSON doubles are repr-exact)
    direct = train_logistic_classifier(
        feat,
        cols,
        "y",
        iters=6,
        lr=_LOGREG_LR,
        quant=_LOGREG_QUANT,
        initial_weights=w_day1,
    )
    roundtrip_exact = w == direct == load_classifier(path)["weights"]
    s = logistic_score(w, cols)
    sq = F.floor(F.lit(float(_LOGREG_QUANT)) * s).cast("long")
    return (
        feat.select("lang", s.alias("__s"), sq.alias("__sq"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("__s") >= 0.5).cast("bigint")).alias("n_kept"),
            F.round(
                F.sum("__sq").cast("double")
                / (F.lit(float(_LOGREG_QUANT)) * F.count(F.lit(1))),
                4,
            ).alias("avg_score"),
        )
        .withColumn("w_bias", F.round(F.lit(w[0]), 6))
        .withColumn("w_f1", F.round(F.lit(w[1]), 6))
        .withColumn("w_f2", F.round(F.lit(w[2]), 6))
        .withColumn("w_f3", F.round(F.lit(w[3]), 6))
        .withColumn("iters_done", F.lit(int(meta["iters_done"])).cast("long"))
        .withColumn("sidecar_roundtrip_exact", F.lit(bool(roundtrip_exact)))
        .orderBy("lang")
    )


def classifier_minibatch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+ mini-batch SGD (round 13, r12-verdict task 4): full-batch GD
    scans the whole slice every iteration; this query trains the same
    logistic model with ``train_logistic_classifier_minibatch`` — 2
    epochs over 4 content-hash batches (md5 'mb:' salt, first 8 hex
    digits mod 4), one GD step per batch with the BATCH's own n in the
    update, so an epoch touches each row once while taking 4 weight
    updates. The schedule is content-addressed (ascending batch id),
    not partition-ordered, so both engines and every rerun walk the
    identical sequence: the DuckDB oracle unrolls all 8 steps as
    one-iteration phases over the same md5 slices and must land on the
    SAME weights to 6 dp. Emits per language: docs, kept, quantized
    mean score, and the learned weights.

    Scale: per step ONE 4-integer aggregate over 1/4 of the pinned
    feature projection (at rest the projection would be written
    partitioned by mb, making each step's filter partition pruning);
    driver state is 4 floats + the 4-entry batch schedule."""
    from neulix_datahub_spark.operators.classifier import (
        logistic_score,
        train_logistic_classifier_minibatch,
    )
    from neulix_datahub_spark.operators.dedupe import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    t = F.split(normalize_text(F.col("text")), " ")
    tot, dis = F.size(t), F.size(F.array_distinct(t))
    mx = F.array_max(F.transform(t, lambda x: F.length(x)))
    mb = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("mb:"), F.coalesce(F.col("text"), F.lit(""))
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 4
    )
    feat = docs.select(
        "lang",
        mb.alias("mb"),
        (F.floor(tot / F.lit(16)).cast("long") - 10).alias("f1"),
        (
            F.floor(F.floor(F.lit(100.0) * dis / tot) / F.lit(8)).cast("long")
            - 6
        ).alias("f2"),
        (mx.cast("long") - 5).alias("f3"),
        (F.lit(2) * dis >= tot).cast("int").alias("y"),
    ).localCheckpoint(eager=True)
    w = train_logistic_classifier_minibatch(
        feat,
        ["f1", "f2", "f3"],
        "y",
        "mb",
        epochs=2,
        lr=_LOGREG_LR,
        quant=_LOGREG_QUANT,
    )
    s = logistic_score(w, ["f1", "f2", "f3"])
    sq = F.floor(F.lit(float(_LOGREG_QUANT)) * s).cast("long")
    return (
        feat.select("lang", s.alias("__s"), sq.alias("__sq"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("__s") >= 0.5).cast("bigint")).alias("n_kept"),
            F.round(
                F.sum("__sq").cast("double")
                / (F.lit(float(_LOGREG_QUANT)) * F.count(F.lit(1))),
                4,
            ).alias("avg_score"),
        )
        .withColumn("w_bias", F.round(F.lit(w[0]), 6))
        .withColumn("w_f1", F.round(F.lit(w[1]), 6))
        .withColumn("w_f2", F.round(F.lit(w[2]), 6))
        .withColumn("w_f3", F.round(F.lit(w[3]), 6))
        .orderBy("lang")
    )


def epoch_plan_materialization_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7 curation, driver-visible (round 11): the waterfall plan
    REALIZED — ``materialize_epoch_plan`` turns each source's
    allocation into ``floor(alloc/n)`` full epochs of every document
    plus a content-hash-picked fractional epoch whose running token sum
    fits the remainder. Emits per source: full-epoch count, rows and
    tokens actually materialized, the plan's allocation, and the fill
    ratio (undershoots by < one document's tokens, never overshoots —
    the per-source invariant a data-constrained pretraining run needs).

    The DuckDB oracle replays plan + materialization end-to-end: the
    integer-exact water-filling CTEs, the same md5('emix:'||text)
    fractional ordering, generate_series epoch fan-out, and the
    running-sum cutoff."""
    from neulix_datahub_spark.operators.curation import (
        materialize_epoch_plan,
        plan_token_budget_waterfall,
    )
    from neulix_datahub_spark.operators.dedupe import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    toks = F.coalesce(
        F.size(F.split(normalize_text(F.col("text")), " ")), F.lit(0)
    )
    counts = docs.groupBy("source").agg(
        F.sum(toks).cast("long").alias("n_tokens")
    )
    plan = plan_token_budget_waterfall(
        counts, budget_frac=(13, 10), cap_frac=(7, 5)
    )
    mat = materialize_epoch_plan(docs, plan)
    per = mat.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows_emitted"),
        F.sum("n_doc_tokens").cast("long").alias("tokens_emitted"),
    )
    return (
        plan.select(
            "source",
            "n_tokens",
            "alloc_tokens",
            F.floor(F.col("alloc_tokens") / F.col("n_tokens"))
            .cast("long")
            .alias("full_epochs"),
        )
        .join(per, "source", "left")
        .select(
            "source",
            "full_epochs",
            F.coalesce("n_rows_emitted", F.lit(0)).cast("long").alias(
                "n_rows_emitted"
            ),
            F.coalesce("tokens_emitted", F.lit(0)).cast("long").alias(
                "tokens_emitted"
            ),
            "alloc_tokens",
            F.round(
                F.coalesce("tokens_emitted", F.lit(0)) / F.col("alloc_tokens"),
                6,
            ).alias("fill_ratio"),
        )
        .orderBy("source")
    )


# CTE prefix shared by the materialization query and the shuffle-order
# query: the realized epoch multiset WITH its epoch index per row.
_EPOCH_ROWS_CTES = _WATERFALL_CTES + r"""
, rounded AS (
    SELECT source, n_tokens, round(alloc_raw, 4) AS alloc FROM plan
),
dtok AS (
    SELECT doc_id, source,
           COALESCE(len(string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' ')), 0) AS d_toks,
           md5('emix:' || COALESCE(text, '')) AS k
    FROM documents
),
qq AS (
    SELECT source, n_tokens, alloc,
           CAST(floor(alloc / n_tokens) AS BIGINT) AS fe,
           alloc - CAST(CAST(floor(alloc / n_tokens) AS BIGINT) * n_tokens
                        AS DOUBLE) AS frac_toks
    FROM rounded
),
full_rows AS (
    SELECT d.doc_id, d.source, d.d_toks, CAST(u.e - 1 AS BIGINT) AS epoch
    FROM dtok d JOIN qq USING (source),
         LATERAL unnest(generate_series(1, qq.fe)) AS u(e)
    WHERE qq.fe >= 1
),
cum_rows AS (
    SELECT d.doc_id, d.source, d.d_toks, qq.frac_toks, qq.fe,
           sum(d.d_toks) OVER (PARTITION BY d.source ORDER BY d.k, d.doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
    FROM dtok d JOIN qq USING (source)
),
frac_rows AS (
    -- zero-token docs are excluded from the fractional pick (engine
    -- parity: they never advance the running sum, so without this they
    -- would enter any remainder, even 0, with q+1 multiplicity)
    SELECT doc_id, source, d_toks, fe AS epoch FROM cum_rows
    WHERE cum <= frac_toks AND d_toks > 0
),
allrows AS (
    SELECT * FROM full_rows UNION ALL SELECT * FROM frac_rows
)
"""

_EPOCH_MATERIALIZE_SQL = _EPOCH_ROWS_CTES + r"""
, agg AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_rows_emitted,
           CAST(sum(d_toks) AS BIGINT) AS tokens_emitted
    FROM allrows GROUP BY source
)
SELECT q.source,
       q.fe AS full_epochs,
       COALESCE(a.n_rows_emitted, 0) AS n_rows_emitted,
       COALESCE(a.tokens_emitted, 0) AS tokens_emitted,
       q.alloc AS alloc_tokens,
       round(COALESCE(a.tokens_emitted, 0) / q.alloc, 6) AS fill_ratio
FROM qq q LEFT JOIN agg a USING (source)
ORDER BY source
"""


def epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7 curation (round 12): the DETERMINISTIC training-order shuffle
    over the realized epoch multiset — the last step between a curation
    plan and an actual dataloader manifest. Every (source, doc, epoch)
    row gets a global 1-based order index by content-hash sort
    (``md5('eshuf:'||epoch||':'||source||':'||doc_id)`` — epoch in the
    salt, so each epoch reshuffles; ties impossible since the triple is
    unique, but the full triple rides the ORDER BY anyway). The rank is
    the two-phase ``with_sorted_rank`` (range-repartition + prefix-sum
    of partition counts — no single-task global window; the W1
    machinery reused at the curation tier).

    Emits per (source, epoch): row count, min/max order index, and an
    order-weighted checksum ``sum(ord · (doc_id % 997))`` that pins the
    GLOBAL assignment — a single transposition anywhere in the corpus
    moves it. The DuckDB oracle replays plan → materialization →
    row_number over the same key."""
    from neulix_datahub_spark.operators.curation import (
        materialize_epoch_plan,
        plan_token_budget_waterfall,
    )
    from neulix_datahub_spark.operators.dedupe import normalize_text
    from neulix_datahub_spark.operators.sequence import with_sorted_rank

    docs = load_table(spark, sf_dir, "documents")
    toks = F.coalesce(
        F.size(F.split(normalize_text(F.col("text")), " ")), F.lit(0)
    )
    counts = docs.groupBy("source").agg(
        F.sum(toks).cast("long").alias("n_tokens")
    )
    plan = plan_token_budget_waterfall(
        counts, budget_frac=(13, 10), cap_frac=(7, 5)
    )
    mat = materialize_epoch_plan(docs, plan).withColumn(
        "__k",
        F.md5(
            F.concat(
                F.lit("eshuf:"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("source"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ),
    )
    ordered = with_sorted_rank(
        mat,
        [F.asc("__k"), F.asc("epoch"), F.asc("source"), F.asc("doc_id")],
        "ord",
    )
    return (
        ordered.groupBy("source", "epoch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("ord").cast("long").alias("min_ord"),
            F.max("ord").cast("long").alias("max_ord"),
            F.sum(F.col("ord") * (F.col("doc_id") % 997))
            .cast("long")
            .alias("ord_checksum"),
        )
        .orderBy("source", "epoch")
    )


_EPOCH_SHUFFLE_SQL = _EPOCH_ROWS_CTES + r"""
, shuf AS (
    SELECT source, epoch, doc_id,
           row_number() OVER (
               ORDER BY md5('eshuf:' || CAST(epoch AS VARCHAR) || ':' ||
                            source || ':' || CAST(doc_id AS VARCHAR)),
                        epoch, source, doc_id
           ) AS ord
    FROM allrows
)
SELECT source, epoch,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(ord) AS BIGINT) AS min_ord,
       CAST(max(ord) AS BIGINT) AS max_ord,
       CAST(sum(ord * (doc_id % 997)) AS BIGINT) AS ord_checksum
FROM shuf
GROUP BY source, epoch
ORDER BY source, epoch
"""


def hashed_embedding_similarity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3/L4 bridge (round 12): model-free signed-hashing text
    embeddings (``operators/text.py hashed_ngram_embedding`` — the
    HashingTF role with an md5-portable hash) evaluated on the planted
    near-dup corpus. Every original embeds, every first-token-dropped
    twin embeds, and the query compares the cosine of each PLANTED
    pair (orig i, twin i) against a MISMATCHED pairing (orig i,
    twin (i+1) mod 100) — the signal an embedding must carry for
    near-dup work. Cosines are fixed-point-quantized per pair
    (floor(1e6·cos), the classifier-gradient trick) so the sums are
    exact integers; the global mass/support pins the full bucket+sign
    assignment of every document. All values replayed by the DuckDB
    oracle; the separation verdict is computed on both sides, not
    pinned."""
    from neulix_datahub_spark.operators.similarity import (
        cosine_similarity_expr,
    )
    from neulix_datahub_spark.operators.text import hashed_embedding_table

    corpus = planted_near_dup_corpus(spark, sf_dir)
    emb = hashed_embedding_table(
        corpus, "text", "doc_id", dim=64, out_col="e"
    ).localCheckpoint(eager=True)
    mass_q6 = F.floor(
        F.lit(1e6)
        * F.aggregate(
            F.col("e"), F.lit(0.0), lambda acc, x: acc + F.abs(x)
        )
    ).cast("long")
    nnz = F.aggregate(
        F.col("e"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.when(x != 0.0, 1).otherwise(0),
    )
    glob = emb.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(mass_q6).cast("long").alias("mass_q6_sum"),
        F.sum(nnz).cast("long").alias("n_nonzero_dims"),
    )
    orig = emb.filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("o"), F.col("e").alias("a")
    )
    twin = emb.filter(F.col("doc_id") >= 1_000_000).select(
        (F.col("doc_id") - 1_000_000).alias("t"), F.col("e").alias("b")
    )
    cos_q6 = F.floor(
        F.lit(1e6) * cosine_similarity_expr(F.col("a"), F.col("b"))
    ).cast("long")
    planted = (
        orig.join(twin, orig["o"] == twin["t"])
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(cos_q6).cast("long").alias("planted_cos_q6_sum"),
        )
    )
    mismatch = (
        orig.join(twin, twin["t"] == (orig["o"] + 1) % 100)
        .agg(F.sum(cos_q6).cast("long").alias("mismatch_cos_q6_sum"))
    )
    return (
        glob.crossJoin(planted)
        .crossJoin(mismatch)
        .select(
            "n_docs",
            "n_pairs",
            "mass_q6_sum",
            "n_nonzero_dims",
            "planted_cos_q6_sum",
            "mismatch_cos_q6_sum",
            (
                F.col("planted_cos_q6_sum") > F.col("mismatch_cos_q6_sum")
            ).alias("planted_beats_mismatch"),
        )
    )


# the planted-corpus hashed-embedding CTE block (corpus → feats → emb
# → normed), shared by the similarity check and the end-to-end
# text→vector→index retrieval oracle in queries_scale.py
HASHED_EMB_CTES = r"""
WITH corpus AS (
    SELECT doc_id, text FROM documents WHERE doc_id < 100
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id,
           substring(text, instr(text, ' ') + 1) AS text
    FROM documents WHERE doc_id < 100
),
feats AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 2
                THEN t || [t[i] || ' ' || t[i+1]
                           for i in generate_series(1, len(t) - 1)]
                ELSE t END AS f
    FROM (
        SELECT doc_id,
               COALESCE(string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' '), []) AS t
        FROM corpus
    )
),
emb AS MATERIALIZED (
    SELECT doc_id, e,
           sqrt(list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * x)))
               AS nrm
    FROM (
        SELECT doc_id,
               list_transform(range(0, 64), i -> CAST(COALESCE(list_sum(
                   list_transform(f, ff ->
                       CASE WHEN CAST('0x' || substr(md5('hemb:' || ff), 1, 8) AS BIGINT) % 64 = i
                            THEN 1 - 2 * (CAST('0x' || substr(md5('hemb:' || ff), 9, 1) AS BIGINT) % 2)
                            ELSE 0 END)), 0) AS BIGINT)) AS e
        FROM feats
    )
),
normed AS MATERIALIZED (
    SELECT doc_id,
           CASE WHEN nrm > 0
                THEN list_transform(e, x -> CAST(x AS DOUBLE) / nrm)
                ELSE list_transform(e, x -> CAST(x AS DOUBLE)) END AS e
    FROM emb
)
"""

_HASHED_EMB_SQL = HASHED_EMB_CTES + r"""
, gstats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CAST(floor(1000000 * list_sum(
               list_transform(e, x -> abs(x)))) AS BIGINT)) AS BIGINT)
               AS mass_q6_sum,
           CAST(sum(len(list_filter(e, x -> x <> 0.0))) AS BIGINT)
               AS n_nonzero_dims
    FROM normed
),
pairs AS (
    SELECT o.doc_id AS o, t.doc_id - 1000000 AS t,
           CAST(floor(1000000 *
               list_sum(list_transform(range(1, len(o.e)+1),
                                       i -> o.e[i] * t.e[i]))
               / (sqrt(list_sum(list_transform(o.e, x -> x * x)))
                  * sqrt(list_sum(list_transform(t.e, x -> x * x))))
           ) AS BIGINT) AS cq6
    FROM normed o JOIN normed t
      ON o.doc_id < 100 AND t.doc_id >= 1000000
),
planted AS (
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(cq6) AS BIGINT) AS planted_cos_q6_sum
    FROM pairs WHERE t = o
),
mismatch AS (
    SELECT CAST(sum(cq6) AS BIGINT) AS mismatch_cos_q6_sum
    FROM pairs WHERE t = (o + 1) % 100
)
SELECT g.n_docs, p.n_pairs, g.mass_q6_sum, g.n_nonzero_dims,
       p.planted_cos_q6_sum, m.mismatch_cos_q6_sum,
       p.planted_cos_q6_sum > m.mismatch_cos_q6_sum
           AS planted_beats_mismatch
FROM gstats g, planted p, mismatch m
"""


def mixing_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+ curation, driver-visible: deterministic content-hash mixing
    sampler — per-language kept counts under the MIXING_RATES targets.
    The keep/drop decision is a pure function of the document bytes
    (md5-prefix threshold), so the oracle reproduces it exactly and the
    realized rate converges to the target as the corpus grows."""
    from neulix_datahub_spark.operators.curation import hash_mixing_sample

    docs = load_table(spark, sf_dir, "documents")
    total = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    sampled = (
        hash_mixing_sample(docs, MIXING_RATES)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("__n_sampled"))
    )
    return (
        total.join(sampled, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.coalesce("__n_sampled", F.lit(0)).alias("n_sampled"),
            F.round(
                F.coalesce("__n_sampled", F.lit(0)) / F.col("n_docs"), 6
            ).alias("realized_rate"),
        )
        .orderBy("lang")
    )


_MIXING_SQL = """
WITH flagged AS (
    SELECT lang,
           CASE WHEN substring(md5('sample:' || COALESCE(text, '')), 1, 4) <
                     CASE lang WHEN 'en' THEN '8000'
                               WHEN 'de' THEN '4000'
                               WHEN 'es' THEN '4000'
                               WHEN 'fr' THEN '4000'
                               WHEN 'zh' THEN '2000'
                               ELSE 'g' END
                THEN 1 ELSE 0 END AS keep
    FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(keep) AS BIGINT) AS n_sampled,
       round(sum(keep)::DOUBLE / count(*), 6) AS realized_rate
FROM flagged
GROUP BY lang
ORDER BY lang
"""


def contamination_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+ curation, driver-visible: benchmark decontamination — count
    per language how many corpus documents share an 8-token run with the
    pseudo-benchmark (first 12 tokens of every 13th document). Every
    13th doc is structurally contaminated (it contains its own excerpt);
    any extras are organic near-duplicates sharing an 8-gram run, so the
    query checks both the machinery and the real signal."""
    from neulix_datahub_spark.operators.curation import (
        benchmark_excerpt,
        benchmark_ngram_contamination,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = benchmark_excerpt(
        docs.filter(F.col("doc_id") % 13 == 0), first_tokens=12
    )
    cont = benchmark_ngram_contamination(docs, bench, n=8).withColumn(
        "__c", F.lit(1)
    )
    return (
        docs.join(cont, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("__c", F.lit(0))).alias("n_contaminated"),
        )
        .orderBy("lang")
    )


_CONTAMINATION_SQL = r"""
WITH norm AS (
    SELECT doc_id, lang,
           string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' ') AS t
    FROM documents
),
bgrams AS (
    SELECT DISTINCT unnest(
        CASE WHEN len(bt) >= 8
             THEN [array_to_string(bt[i:i+7], ' ')
                   for i in generate_series(1, len(bt) - 7)]
             ELSE [array_to_string(bt, ' ')] END
    ) AS g
    FROM (SELECT t[1:12] AS bt FROM norm WHERE doc_id % 13 = 0)
),
cont AS (
    SELECT DISTINCT doc_id
    FROM (
        SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(t) >= 8
                 THEN [array_to_string(t[i:i+7], ' ')
                       for i in generate_series(1, len(t) - 7)]
                 ELSE [array_to_string(t, ' ')] END
        )) AS g
        FROM norm
    )
    WHERE g IN (SELECT g FROM bgrams)
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM cont)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
FROM documents
GROUP BY lang
ORDER BY lang
"""


def boilerplate_removal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+ curation, driver-visible: C4-style boilerplate-line removal.
    The fixture text is single-line, so footers are planted (two
    distinct boilerplate lines on doc_id % 4 in {0, 1}); the operator
    must find exactly the planted lines (corpus-frequency >= 10) and
    removing them must restore every document byte-for-byte —
    ``n_text_restored == n_docs`` is the end-to-end proof."""
    from neulix_datahub_spark.operators.curation import remove_boilerplate_lines

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.col("text"),
                F.lit("\nsubscribe to our newsletter for updates"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.col("text"), F.lit("\nfollow us on example social")),
        )
        .otherwise(F.col("text")),
    )
    cleaned = remove_boilerplate_lines(planted, min_docs=10).select(
        "doc_id", "lang", "text", "n_lines_removed"
    )
    orig = docs.select("doc_id", F.col("text").alias("__orig"))
    return (
        cleaned.join(orig, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_lines_removed").alias("n_lines_removed"),
            F.sum((F.col("n_lines_removed") > 0).cast("long")).alias(
                "n_docs_touched"
            ),
            F.sum((F.col("text") == F.col("__orig")).cast("long")).alias(
                "n_text_restored"
            ),
        )
        .orderBy("lang")
    )


_BOILERPLATE_SQL = """
WITH planted AS (
    SELECT doc_id, lang, text AS orig,
           CASE WHEN doc_id % 4 = 0
                THEN text || chr(10) || 'subscribe to our newsletter for updates'
                WHEN doc_id % 4 = 1
                THEN text || chr(10) || 'follow us on example social'
                ELSE text END AS ptext
    FROM documents
),
lines AS (
    SELECT doc_id, lang, orig, len(l) AS n_lines,
           u.raw AS raw, u.pos AS pos, lower(trim(u.raw)) AS line
    FROM (
        SELECT doc_id, lang, orig, l,
               unnest([{'raw': l[i], 'pos': i}
                       for i in generate_series(1, len(l))]) AS u
        FROM (SELECT *, string_split(ptext, chr(10)) AS l FROM planted)
    )
),
bp AS (
    SELECT line FROM (
        SELECT line, count(DISTINCT doc_id) AS nd
        FROM lines WHERE line <> '' GROUP BY line
    ) WHERE nd >= 10
),
rebuilt AS (
    SELECT doc_id, any_value(lang) AS lang, any_value(orig) AS orig,
           any_value(n_lines) AS n_lines,
           string_agg(raw, chr(10) ORDER BY pos) AS text,
           count(*) AS n_kept
    FROM lines
    WHERE line NOT IN (SELECT line FROM bp)
    GROUP BY doc_id
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_lines - n_kept) AS BIGINT) AS n_lines_removed,
       CAST(sum(CASE WHEN n_lines > n_kept THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs_touched,
       CAST(sum(CASE WHEN text = orig THEN 1 ELSE 0 END) AS BIGINT)
           AS n_text_restored
FROM rebuilt
GROUP BY lang
ORDER BY lang
"""


def stratified_sample_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+ curation (tail-registered; rotates into the driver window in
    round 3): deterministic hash-ranked top-5 docs per source. The
    per-language id-sum pins the *exact* selection — any change in the
    ranking or tie-break flips it."""
    from neulix_datahub_spark.operators.curation import stratified_topn_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_topn_sample(docs, 5, strata_col="source")
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("doc_id").alias("sum_doc_id"),
        )
        .orderBy("lang")
    )


_STRATIFIED_SQL = """
WITH ranked AS (
    SELECT lang, doc_id,
           row_number() OVER (PARTITION BY source
                              ORDER BY md5('topn:' || COALESCE(text, '')), doc_id) AS rk
    FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
FROM ranked
WHERE rk <= 5
GROUP BY lang
ORDER BY lang
"""


def source_mixing_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+ curation (tail-registered; rotates in round 3): per-source
    mixing dashboard — doc counts, token totals, and each source's share
    of corpus tokens (what a mixing-weights pass consumes). Corpus total
    arrives via a broadcast single-row join, not a window over all rows."""
    from neulix_datahub_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "lang", token_count("text").alias("__tok")
    )
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("__tok").alias("total_tokens"),
    )
    corpus = docs.agg(F.sum("__tok").alias("__corpus_tokens"))
    return (
        per_source.join(F.broadcast(corpus))
        .select(
            "source",
            "n_docs",
            "n_langs",
            "total_tokens",
            F.round(
                F.col("total_tokens") / F.col("__corpus_tokens"), 6
            ).alias("token_share"),
        )
        .orderBy("source")
    )


_SOURCE_MIXING_SQL = r"""
WITH toks AS (
    SELECT source, lang,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '[ \t\n\v\f\r]+')) END AS tok
    FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(tok) AS BIGINT) AS total_tokens,
       round(sum(tok) / (SELECT sum(tok)::DOUBLE FROM toks), 6) AS token_share
FROM toks
GROUP BY source
ORDER BY source
"""


def dup_bigram_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+ curation (tail-registered; rotates in round 3): Gopher-style
    duplicate-bigram fraction per language — the repetition signal that
    catches looping generations and templated boilerplate."""
    from neulix_datahub_spark.operators.text import dup_ngram_fraction

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", dup_ngram_fraction("text", n=2).alias("__f"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("__f"), 6).alias("avg_dup_bigram_fraction"),
            F.round(F.max("__f"), 6).alias("max_dup_bigram_fraction"),
        )
        .orderBy("lang")
    )


_DUP_BIGRAM_SQL = r"""
WITH toks AS (
    SELECT lang,
           string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' ') AS t
    FROM documents
),
fracs AS (
    SELECT lang,
           CASE WHEN len(t) - 1 > 0 THEN round(
               1.0 - len(list_distinct(
                   [array_to_string(t[i:i+1], ' ')
                    for i in generate_series(1, len(t) - 1)]
               ))::DOUBLE / (len(t) - 1), 6)
           ELSE 0.0 END AS f
    FROM toks
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(f), 6) AS avg_dup_bigram_fraction,
       round(max(f), 6) AS max_dup_bigram_fraction
FROM fracs
GROUP BY lang
ORDER BY lang
"""


def embedding_centroid_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3+ embedding analytics (tail-registered; rotates in round 3):
    per-label centroid of the embedding corpus in long (label, dim,
    value) form — SQL-expressible, so the oracle checks the exact
    cluster means an IVF coarse quantizer or drift monitor would use."""
    from neulix_datahub_spark.operators.similarity import embedding_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = embedding_centroids(emb, strata_col="label")
    return cents.select(
        "label", "dim", F.round("centroid", 6).alias("centroid")
    ).orderBy("label", "dim")


_CENTROID_SQL = """
WITH expl AS (
    SELECT label, u.dim AS dim, u.v AS v
    FROM (
        SELECT label,
               unnest([{'v': embedding[i]::DOUBLE, 'dim': i - 1}
                       for i in generate_series(1, len(embedding))]) AS u
        FROM embeddings
    )
)
SELECT label, dim, round(avg(v), 6) AS centroid
FROM expl
GROUP BY label, dim
ORDER BY label, dim
"""


def centroid_outliers_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3+ embedding analytics (tail-registered; rotates in round 3):
    distance of each vector to its label centroid, rolled up per label —
    the embedding-space outlier/drift signal. Corpus never shuffles: the
    #labels-row centroid table broadcasts back over the scan."""
    from neulix_datahub_spark.operators.similarity import centroid_distances

    emb = load_table(spark, sf_dir, "embeddings")
    d = centroid_distances(emb, strata_col="label")
    return (
        d.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("centroid_dist"), 6).alias("avg_centroid_dist"),
            F.round(F.max("centroid_dist"), 6).alias("max_centroid_dist"),
        )
        .orderBy("label")
    )


_CENTROID_OUTLIER_SQL = """
WITH expl AS (
    SELECT vec_id, label, u.dim AS dim, u.v AS v
    FROM (
        SELECT vec_id, label,
               unnest([{'v': embedding[i]::DOUBLE, 'dim': i - 1}
                       for i in generate_series(1, len(embedding))]) AS u
        FROM embeddings
    )
),
cents AS (
    SELECT label, dim, avg(v) AS c FROM expl GROUP BY label, dim
),
dists AS (
    SELECT e.vec_id, e.label, sqrt(sum((e.v - c.c) * (e.v - c.c))) AS d
    FROM expl e JOIN cents c USING (label, dim)
    GROUP BY e.vec_id, e.label
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       round(avg(d), 6) AS avg_centroid_dist,
       round(max(d), 6) AS max_centroid_dist
FROM dists
GROUP BY label
ORDER BY label
"""


def semantic_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2/L3 composition (tail-registered; rotates in round 3): semantic
    near-dup — embedding-cosine candidates (probe set vec_id % 20,
    cos >= 0.30) verified by exact word-bigram Jaccard (>= 0.02) on the
    corresponding documents. The two-stage shape is the production
    recipe: cheap vector recall first, exact text precision second;
    both stages are broadcast-probe joins, the corpus never shuffles."""
    from neulix_datahub_spark.operators.dedupe import verify_candidate_pairs
    from neulix_datahub_spark.operators.similarity import (
        embedding_near_duplicates,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    cand = embedding_near_duplicates(
        emb, threshold=0.30, probe_filter=F.col("vec_id") % 20 == 0
    )
    verified = verify_candidate_pairs(
        docs, cand, text_col="text", id_col="doc_id", n=2, threshold=0.02
    )
    return (
        cand.join(verified, ["id_a", "id_b"])
        .select("id_a", "id_b", "cos_sim", "jaccard")
        .orderBy("id_a", "id_b")
    )


def incremental_semantic_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2/L3 INCREMENTAL (round 11): the embedding-side sibling of
    ``incremental_dedup_stats``. Build the persisted vector index
    (double-cast embeddings + hashed bigram shingles + labels at rest)
    over 3/4 of the corpus, then ingest the remaining quarter as a
    never-seen DELTA: candidates come from ONE broadcast-probe cosine
    join of the delta against the at-rest vectors (prior↔prior pairs
    are never re-emitted), verification reads persisted shingles, and
    the labels extend through the shared reduced graph.

    The DuckDB oracle recomputes the answer from first principles over
    the FULL corpus — all-pairs cosine (6-dp) >= 0.30 AND exact bigram
    Jaccard (6-dp) >= 0.02 → recursive closure → min-label survivors —
    so a green hash row proves build(prior) + ingest(delta) ==
    dedupe(full), exactly, for the semantic recipe too."""
    from neulix_datahub_spark.operators.semantic_index import (
        build_semantic_index,
        ingest_semantic_delta,
        semantic_survivors,
    )
    from neulix_datahub_spark.sources.io import warehouse_scratch

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    prior = F.col("vec_id") % 4 != 0
    root = warehouse_scratch(spark, "_neulix_sem_idx_")
    path = f"{root}/index"
    build_semantic_index(
        emb.filter(prior), docs.filter(F.col("doc_id") % 4 != 0), path
    )
    ingest_semantic_delta(
        spark, emb.filter(~prior), docs.filter(F.col("doc_id") % 4 == 0), path
    )
    kept = semantic_survivors(spark, path, emb, "vec_id")
    return kept.agg(
        F.count(F.lit(1)).alias("n_survivors"),
        F.sum((F.col("vec_id") % 4 != 0).cast("bigint")).alias("n_kept_prior"),
        F.sum((F.col("vec_id") % 4 == 0).cast("bigint")).alias("n_kept_delta"),
        F.sum("vec_id").alias("sum_kept_ids"),
    )


def banded_semantic_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2/L3 INCREMENTAL at the 100 TB candidate shape (round 11): the
    same build(3/4) + ingest(1/4) lifecycle as
    ``incremental_semantic_dedup_stats`` but with
    ``candidates="banded"`` — sign-LSH band collisions
    (``operators/similarity.py::vector_banded_signatures``, 64 planes ×
    32 bands) persisted as a band-partitioned relation, the per-delta
    candidate join an AQE-broadcast delta-bands ⋈ at-rest-bands
    equi-join instead of the brute-force delta × corpus cross, then the
    exact-cosine precision stage + shared Jaccard verify.

    The DuckDB oracle is the SAME exact closure (shared CTE literal):
    banding recall at these parameters is 1.0 on this corpus — measured
    0 missed candidate pairs at sf0.001/0.01/0.1, and deterministic
    (seeded hyperplanes) — so a green hash row proves the banded
    incremental lifecycle lands EXACTLY on the from-first-principles
    answer, ingest stage included (``n_delta_edges`` pins the edges the
    ingest discovered against the closure's delta-touching pair count).
    At fixture scale the band join prunes little (random-direction
    synthetic embeddings); at sf0.1 it already cuts candidate pairs
    12.5 M → 2.0 M, and the trade is parameter-controlled (defaults
    target the cos ≳ 0.85 production regime)."""
    from neulix_datahub_spark.operators.semantic_index import (
        build_semantic_index,
        ingest_semantic_delta,
        semantic_survivors,
    )
    from neulix_datahub_spark.sources.io import warehouse_scratch

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    prior = F.col("vec_id") % 4 != 0
    root = warehouse_scratch(spark, "_neulix_sem_band_")
    path = f"{root}/index"
    build_semantic_index(
        emb.filter(prior), docs.filter(F.col("doc_id") % 4 != 0), path,
        candidates="banded", num_planes=64, bands=32,
    )
    stats = ingest_semantic_delta(
        spark, emb.filter(~prior), docs.filter(F.col("doc_id") % 4 == 0), path
    )
    kept = semantic_survivors(spark, path, emb, "vec_id")
    return kept.agg(
        F.lit(stats["n_edges"]).cast("bigint").alias("n_delta_edges"),
        F.count(F.lit(1)).alias("n_survivors"),
        F.sum((F.col("vec_id") % 4 != 0).cast("bigint")).alias("n_kept_prior"),
        F.sum((F.col("vec_id") % 4 == 0).cast("bigint")).alias("n_kept_delta"),
        F.sum("vec_id").alias("sum_kept_ids"),
    )


# The exact semantic-dedup closure shared by both incremental-index
# oracles (exact candidates and sign-LSH banded candidates — the
# NEARDUP_CLOSURE_SQL lesson: one literal, not three drifting copies):
# all-pairs cosine (6-dp) >= 0.30 → exact bigram Jaccard (6-dp) >= 0.02
# → recursive transitive closure → min-label components → losers.
_SEMANTIC_CLOSURE_CTES = r"""
WITH RECURSIVE cand AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]), 6) >= 0.30
),
sh AS (
    SELECT doc_id,
           list_distinct(
               CASE WHEN len(t) >= 2
                    THEN [array_to_string(t[i:i+1], ' ')
                          for i in generate_series(1, len(t) - 1)]
                    ELSE [array_to_string(t, ' ')] END
           ) AS shingles
    FROM (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' ') AS t
        FROM documents
    )
),
edges AS (
    SELECT id_a AS u, id_b AS v
    FROM cand
    JOIN sh sa ON sa.doc_id = cand.id_a
    JOIN sh sb ON sb.doc_id = cand.id_b
    WHERE round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
          / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6) >= 0.02
),
sym AS (
    SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges
),
reach AS (
    SELECT id, id AS r FROM (SELECT DISTINCT u AS id FROM sym)
    UNION
    SELECT reach.id, s.v AS r FROM reach JOIN sym s ON reach.r = s.u
),
losers AS (
    SELECT id FROM (SELECT id, min(r) AS component FROM reach GROUP BY id)
    WHERE id != component
)
"""

_INCR_SEMANTIC_SQL = _SEMANTIC_CLOSURE_CTES + r"""
SELECT CAST(count(*) AS BIGINT) AS n_survivors,
       CAST(sum(CASE WHEN vec_id % 4 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept_prior,
       CAST(sum(CASE WHEN vec_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept_delta,
       CAST(sum(vec_id) AS BIGINT) AS sum_kept_ids
FROM embeddings
WHERE vec_id NOT IN (SELECT id FROM losers)
"""

# The banded variant additionally pins the INGEST stage by value:
# n_delta_edges is the count of verified pairs touching the delta
# quarter — exactly what ingest_semantic_delta's edge discovery must
# find (prior↔prior pairs are resolved at build and never re-emitted).
_BANDED_SEMANTIC_SQL = _SEMANTIC_CLOSURE_CTES + r"""
SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM edges
     WHERE u % 4 = 0 OR v % 4 = 0) AS n_delta_edges,
    CAST(count(*) AS BIGINT) AS n_survivors,
    CAST(sum(CASE WHEN vec_id % 4 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_kept_prior,
    CAST(sum(CASE WHEN vec_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_kept_delta,
    CAST(sum(vec_id) AS BIGINT) AS sum_kept_ids
FROM embeddings
WHERE vec_id NOT IN (SELECT id FROM losers)
"""


_SEMANTIC_DEDUP_SQL = r"""
WITH cand AS (
    SELECT id_a, id_b, cos_sim FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 6) AS cos_sim
        FROM embeddings a JOIN embeddings b
          ON a.vec_id % 20 = 0
         AND (a.vec_id < b.vec_id OR NOT (b.vec_id % 20 = 0))
    ) WHERE cos_sim >= 0.30
),
sh AS (
    SELECT doc_id,
           list_distinct(
               CASE WHEN len(t) >= 2
                    THEN [array_to_string(t[i:i+1], ' ')
                          for i in generate_series(1, len(t) - 1)]
                    ELSE [array_to_string(t, ' ')] END
           ) AS s
    FROM (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' ') AS t
        FROM documents
    )
)
SELECT id_a, id_b, cos_sim, jaccard FROM (
    SELECT c.id_a, c.id_b, c.cos_sim,
           round(len(list_intersect(a.s, b.s))::DOUBLE
                 / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
    FROM cand c
    JOIN sh a ON a.doc_id = c.id_a
    JOIN sh b ON b.doc_id = c.id_b
)
WHERE jaccard >= 0.02
ORDER BY id_a, id_b
"""


def quantization_error_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3+ storage path (tail-registered; rotates in round 3): int8
    scalar quantization of the embedding corpus against per-dimension
    min/max calibration, reporting the worst round-trip error per
    dimension — which the oracle recomputes exactly, proving the
    quantize/dequantize pair honors the half-step error bound."""
    from neulix_datahub_spark.operators.similarity import (
        dim_min_max,
        quantize_embeddings_int8,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    calib = dim_min_max(emb)
    qdf = quantize_embeddings_int8(emb, calib)
    z = qdf.select(
        F.posexplode(F.arrays_zip("embedding", "embedding_q")).alias("dim", "z")
    ).select(
        "dim",
        F.col("z.embedding").cast("double").alias("__v"),
        F.col("z.embedding_q").alias("__q"),
    )
    err = z.join(calib, "dim").select(
        "dim",
        F.abs(
            (F.col("__q") + 128) / 255.0 * (F.col("vmax") - F.col("vmin"))
            + F.col("vmin")
            - F.col("__v")
        ).alias("__e"),
    )
    return (
        err.groupBy("dim")
        .agg(F.round(F.max("__e"), 6).alias("max_abs_err"))
        .join(calib, "dim")
        .select(
            "dim",
            F.round("vmin", 6).alias("vmin"),
            F.round("vmax", 6).alias("vmax"),
            "max_abs_err",
        )
        .orderBy("dim")
    )


_QUANTIZATION_SQL = """
WITH expl AS (
    SELECT vec_id, u.dim AS dim, u.v AS v
    FROM (
        SELECT vec_id,
               unnest([{'v': embedding[i]::DOUBLE, 'dim': i - 1}
                       for i in generate_series(1, len(embedding))]) AS u
        FROM embeddings
    )
),
calib AS (
    SELECT dim, min(v) AS vmin, max(v) AS vmax FROM expl GROUP BY dim
),
err AS (
    SELECT e.dim,
           abs((CASE WHEN c.vmax > c.vmin
                     THEN round((e.v - c.vmin) / (c.vmax - c.vmin) * 255) - 128
                     ELSE 0 END + 128) / 255.0 * (c.vmax - c.vmin)
               + c.vmin - e.v) AS ae
    FROM expl e JOIN calib c USING (dim)
)
SELECT c.dim, round(c.vmin, 6) AS vmin, round(c.vmax, 6) AS vmax,
       round(max(ae), 6) AS max_abs_err
FROM err JOIN calib c USING (dim)
GROUP BY c.dim, c.vmin, c.vmax
ORDER BY c.dim
"""


def kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3+ clustering: deterministic k-means (k=8, 5 iterations,
    md5-seeded init) over the embedding corpus, reporting per-cluster
    size and inertia. Fully hash-checked: the DuckDB oracle REPLAYS the
    whole Lloyd run as unrolled CTEs (portable md5 seed order, argmin
    assignment, per-dim avg update with empty-cluster carry-over), so
    every assignment decision across all 5 iterations must agree across
    engines — far stronger than pinning output constants."""
    from neulix_datahub_spark.operators.clustering import (
        kmeans_inertia,
        kmeans_lloyd,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = kmeans_lloyd(emb, k=8, iters=5)
    return kmeans_inertia(assigned, centroids).orderBy("cluster")


def _kmeans_oracle_sql(k: int = 8, iters: int = 5) -> str:
    """Unrolled Lloyd in pure SQL, mirroring kmeans_lloyd exactly:
    c0 = k seeds by md5(id) → (assign, update) × iters → final assign +
    per-cluster inertia against the last centroids. The assignment ranks
    on the SQUARED distance as an explicit per-dim sum of squares — the
    same quantity Spark's fold argmins — NOT list_distance: a
    correctly-rounded sqrt can compare equal for two distinct squared
    distances, flipping one assignment that cascades through every
    unrolled iteration. (Residual flake risk: both engines accumulate
    doubles sequentially but a different summation ORDER over dims could
    still reorder exact near-ties; dims are summed in index order on both
    sides, so this only bites if an engine changes fold order.) Update is
    the per-(cluster, dim) mean; an empty cluster keeps its previous
    centroid via the LEFT JOIN + coalesce."""
    seed_order = "md5(CAST(vec_id AS VARCHAR)), vec_id"
    d2 = (
        "list_sum(list_transform(range(1, len({v})+1),"
        " i -> ({v}[i] - {c}[i]) * ({v}[i] - {c}[i])))"
    )
    assign = (
        "SELECT vec_id, v, cluster FROM (\n"
        "    SELECT e.vec_id, e.v, c.cluster,\n"
        "           row_number() OVER (PARTITION BY e.vec_id\n"
        "                              ORDER BY "
        + d2.format(v="e.v", c="c.c")
        + ", c.cluster) AS rn\n"
        "    FROM e CROSS JOIN {prev} c) WHERE rn = 1"
    )
    ctes = [
        "e AS (\n  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v\n"
        "  FROM embeddings)",
        f"c0 AS (\n  SELECT row_number() OVER (ORDER BY {seed_order}) - 1 AS cluster, v AS c\n"
        f"  FROM e ORDER BY {seed_order} LIMIT {k})",
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        ctes.append(f"a{i} AS (\n  " + assign.format(prev=prev) + ")")
        ctes.append(
            f"u{i} AS (\n"
            "  SELECT cluster, list(m ORDER BY d) AS c FROM (\n"
            "    SELECT cluster, d, avg(x) AS m FROM (\n"
            f"      SELECT cluster, unnest(v) AS x, generate_subscripts(v, 1) AS d FROM a{i})\n"
            "    GROUP BY cluster, d)\n"
            "  GROUP BY cluster)"
        )
        ctes.append(
            f"c{i} AS (\n  SELECT p.cluster, coalesce(u.c, p.c) AS c\n"
            f"  FROM {prev} p LEFT JOIN u{i} u ON p.cluster = u.cluster)"
        )
        prev = f"c{i}"
    ctes.append("afinal AS (\n  " + assign.format(prev=prev) + ")")
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT a.cluster, count(*) AS n_vecs,\n"
        "       round(sum("
        + d2.format(v="a.v", c="c.c")
        + "), 4) AS inertia\n"
        f"FROM afinal a JOIN {prev} c ON a.cluster = c.cluster\n"
        "GROUP BY a.cluster\n"
        "ORDER BY a.cluster"
    )


_KMEANS_SQL = _kmeans_oracle_sql()


def duplicate_passage_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2+ exact-substring-dedup signal (the Lee et al. "Deduplicating
    Training Data" passage-level check, aggregate form): which fraction
    of each language's distinct word 8-grams also appear in at least one
    OTHER document. High shared-share marks boilerplate/templated
    passages that near-dup document matching misses.

    Plan: one shingle explode (single-regex-pass 8-grams), a gram-key
    aggregate with map-side combine, one join back on the gram key, one
    lang aggregate. At 100 TB the gram JOIN key would be xxhash64(gram)
    to shrink shuffle width — identical result modulo hash collisions;
    the string key keeps the DuckDB oracle exact here."""
    from neulix_datahub_spark.operators.dedupe import _shingles

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", "lang", F.explode(_shingles(F.col("text"), 8)).alias("g")
    )
    gram_docs = grams.groupBy("g").agg(F.count_distinct("doc_id").alias("__nd"))
    shared = (F.col("__nd") >= 2).cast("bigint")
    return (
        grams.join(gram_docs, "g")
        .groupBy("lang")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(shared).alias("n_shared_grams"),
            F.round(F.sum(shared) / F.count(F.lit(1)), 6).alias("shared_share"),
        )
        .orderBy("lang")
    )


_DUP_PASSAGE_SQL = r"""
WITH norm AS (
    SELECT doc_id, lang,
           string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' ') AS t
    FROM documents
),
grams AS (
    SELECT doc_id, lang, unnest(list_distinct(
        CASE WHEN len(t) >= 8
             THEN [array_to_string(t[i:i+7], ' ')
                   for i in generate_series(1, len(t) - 7)]
             ELSE [array_to_string(t, ' ')] END)) AS g
    FROM norm
),
gd AS (SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY g)
SELECT lang,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_grams,
       round(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
           AS shared_share
FROM grams JOIN gd USING (g)
GROUP BY lang
ORDER BY lang
"""


def _scrub_profile(scrubbed: DataFrame) -> DataFrame:
    """The shared per-language pin every passage-scrub query emits:
    interval bookkeeping (docs/passages/token counts), covered share,
    and the exact md5 content checksum of every scrubbed text (so the
    oracle verifies the literal output strings, not just sizes)."""
    key = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("decimal(38,0)")
    return (
        scrubbed.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_passages") > 0).cast("bigint")).alias(
                "n_docs_scrubbed"
            ),
            F.sum("n_passages").cast("bigint").alias("n_passages"),
            F.sum("n_tokens_before").cast("bigint").alias("n_tokens_before"),
            F.sum("n_tokens_after").cast("bigint").alias("n_tokens_after"),
            F.round(
                (F.sum("n_tokens_before") - F.sum("n_tokens_after"))
                / F.sum("n_tokens_before"),
                6,
            ).alias("covered_share"),
            F.sum(key).cast("decimal(38,0)").cast("string").alias(
                "scrub_checksum"
            ),
        )
        .orderBy("lang")
    )


def passage_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2+ exact-substring dedup, REMOVAL form (round 11 — the Lee et
    al. recipe end-to-end, where ``duplicate_passage_stats`` is only the
    aggregate signal): every word 8-gram occurring >= 2 times corpus-wide
    marks its tokens; overlapping marks merge into maximal disjoint
    passages (interval-union window per document); the passages are
    EXCISED from the token stream by ``remove_repeated_passages``. The
    emitted per-language profile pins the scrub three ways — interval
    bookkeeping (token counts before/after, passage count), an exact
    md5 content checksum of every scrubbed text (so the oracle verifies
    the literal output strings, not just their sizes), and the covered
    share.

    The DuckDB oracle replays the whole construction from first
    principles: positioned grams → >= 2 filter → the same running-max
    interval union → covered positions exploded → NOT EXISTS anti-join
    → string_agg reassembly → identical checksum.

    Scale: one gram aggregate (map-side combine, one row per distinct
    gram on the exchange), one equi-join back on the gram key, windows
    partitioned by doc_id, and the scrub itself is a per-row array
    expression — no token explode, no reassembly shuffle. At 100 TB the
    gram key would be xxhash64(gram) (documented trade in
    operators/passages.py)."""
    from neulix_datahub_spark.operators.passages import remove_repeated_passages

    docs = load_table(spark, sf_dir, "documents")
    scrubbed = remove_repeated_passages(docs, "text", "doc_id", n=8, min_count=2)
    return _scrub_profile(scrubbed)


# The passage-scrub oracle, factored (the NEARDUP_CLOSURE_SQL /
# WORD_W0_SQL lesson — one literal per construction, composed): the
# head builds normalized token arrays + positioned 8-grams; each query
# defines its own `hits` CTE (corpus-repeat filter vs benchmark-needle
# semi-join); the tail replays the identical interval union, NOT
# EXISTS excision, string_agg reassembly, and checksum.
_PASSAGE_HEAD_SQL = r"""
WITH norm AS (
    SELECT doc_id, lang,
           string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' ') AS t
    FROM documents
),
grams AS (
    SELECT doc_id, i AS pos, array_to_string(t[i:i+7], ' ') AS g
    FROM norm, LATERAL unnest(generate_series(1, len(t) - 7)) AS u(i)
    WHERE len(t) >= 8
),
"""

_PASSAGE_TAIL_SQL = r"""
marked AS (
    SELECT doc_id, pos,
           CASE WHEN pos > COALESCE(max(pos + 7) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
                THEN 1 ELSE 0 END AS is_start
    FROM hits
),
isl AS (
    SELECT doc_id, pos,
           sum(is_start) OVER (
               PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING
           ) AS run_id
    FROM marked
),
runs AS (
    SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
    FROM isl GROUP BY doc_id, run_id
),
covered AS (SELECT doc_id, unnest(generate_series(s, e)) AS pos FROM runs),
toks AS (
    SELECT doc_id, t[i] AS tok, i AS pos
    FROM norm, LATERAL unnest(generate_series(1, len(t))) AS u(i)
    WHERE t IS NOT NULL
),
kept AS (
    SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS scrub
    FROM toks
    WHERE NOT EXISTS (
        SELECT 1 FROM covered c
        WHERE c.doc_id = toks.doc_id AND c.pos = toks.pos
    )
    GROUP BY doc_id
),
perdoc AS (
    SELECT n.doc_id, n.lang,
           COALESCE(len(n.t), 0) AS n_before,
           COALESCE(r.n_passages, 0) AS n_passages,
           COALESCE(r.cov, 0) AS cov,
           CASE WHEN n.t IS NULL THEN NULL
                ELSE COALESCE(k.scrub, '') END AS scrub
    FROM norm n
    LEFT JOIN (
        SELECT doc_id, count(*) AS n_passages, sum(e - s + 1) AS cov
        FROM runs GROUP BY doc_id
    ) r USING (doc_id)
    LEFT JOIN kept k ON n.doc_id = k.doc_id
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_passages > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs_scrubbed,
       CAST(sum(n_passages) AS BIGINT) AS n_passages,
       CAST(sum(n_before) AS BIGINT) AS n_tokens_before,
       CAST(sum(n_before - cov) AS BIGINT) AS n_tokens_after,
       round(sum(cov)::DOUBLE / sum(n_before), 6) AS covered_share,
       CAST(sum(CAST('0x' || substr(md5(scrub), 1, 15) AS BIGINT)::HUGEINT)
            AS VARCHAR) AS scrub_checksum
FROM perdoc
GROUP BY lang
ORDER BY lang
"""

_PASSAGE_SCRUB_SQL = _PASSAGE_HEAD_SQL + r"""
rep AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM grams JOIN rep USING (g)),
""" + _PASSAGE_TAIL_SQL

_CONTAM_SCRUB_SQL = _PASSAGE_HEAD_SQL + r"""
bex AS (SELECT t[1:12] AS bt FROM norm WHERE doc_id % 13 = 0),
needles AS (
    SELECT DISTINCT array_to_string(bt[i:i+7], ' ') AS g
    FROM bex, LATERAL unnest(generate_series(1, len(bt) - 7)) AS u(i)
    WHERE len(bt) >= 8
),
hits AS (
    SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM needles)
),
""" + _PASSAGE_TAIL_SQL


def incremental_passage_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2+ INCREMENTAL exact-substring dedup (round 11): the persisted
    gram-count index (``operators/passage_index.py``). Build the index
    over the PRIOR corpus (doc_id % 4 != 3), ingest the remaining
    quarter as a never-seen daily DELTA (one fragment, committed by
    sidecar pointer bump), then scrub the FULL corpus against the
    index. The oracle is ``_PASSAGE_SCRUB_SQL`` VERBATIM — the
    from-scratch full-corpus recompute — so a green hash row IS the
    equivalence proof: build(prior) + ingest(delta) == count(full),
    exactly (gram counts are a pure additive function of the documents;
    the interval-union/excision machinery is shared with the batch
    form).

    Scale: the ingest never reads the at-rest gram relation — only the
    one-column id ledger (idempotence anti-join); everything that
    shuffles is delta-sized. The read-side sum-by-gram over fragments
    runs at scrub time, where the batch form would pay the same
    aggregate over the full corpus anyway."""
    from neulix_datahub_spark.operators.passage_index import (
        build_passage_index,
        ingest_passage_delta,
        scrub_against_passage_index,
    )
    from neulix_datahub_spark.sources.io import warehouse_scratch

    docs = load_table(spark, sf_dir, "documents")
    prior = docs.filter(F.col("doc_id") % 4 != 3)
    delta = docs.filter(F.col("doc_id") % 4 == 3)
    root = warehouse_scratch(spark, "_neulix_passage_idx_")
    path = f"{root}/index"
    build_passage_index(prior, path, n=8)
    ingest_passage_delta(spark, delta, path)
    scrubbed = scrub_against_passage_index(spark, docs, path, min_count=2)
    return _scrub_profile(scrubbed)


def contamination_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+/L2+ decontamination at SPAN grain (round 11): the GPT-3-style
    8-gram benchmark-overlap test, but instead of dropping contaminated
    documents whole (``contamination_by_lang``), the leaked spans are
    EXCISED and the document survives — ``remove_matching_passages``
    over the same pseudo-benchmark fixture (first 12 tokens of every
    13th document). Every 13th doc is structurally contaminated (its
    own excerpt), so its prefix run disappears; organic 8-gram overlaps
    lose their spans too. The emitted profile is the same three-way pin
    as ``passage_scrub_stats`` — interval bookkeeping, covered share,
    and an exact md5 checksum of every scrubbed text.

    Scale: the needle side of a REAL eval suite is fixed-size, so the
    gram semi-join broadcasts and the corpus is never shuffled; here
    the pseudo-benchmark is carved from the corpus (scales with SF), so
    the plan-shape test asserts only no-cartesian/no-global-window, not
    broadcast (same stance as contamination_by_lang)."""
    from neulix_datahub_spark.operators.curation import benchmark_excerpt
    from neulix_datahub_spark.operators.passages import remove_matching_passages

    docs = load_table(spark, sf_dir, "documents")
    bench = benchmark_excerpt(
        docs.filter(F.col("doc_id") % 13 == 0), first_tokens=12
    )
    scrubbed = remove_matching_passages(docs, bench, "text", "doc_id", n=8)
    return _scrub_profile(scrubbed)


def unigram_perplexity_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+ LM-quality filter (CCNet recipe, unigram form): per-doc
    perplexity under a corpus-trained unigram LM, profiled per language.
    Fully SQL-expressible, so the oracle recomputes the LM and every
    per-doc score. Tail-registered: rotates into the driver window next
    round; locally oracle-green at sf0.001 and sf0.01."""
    from neulix_datahub_spark.operators.text import doc_unigram_perplexity

    docs = load_table(spark, sf_dir, "documents")
    ppl = doc_unigram_perplexity(docs)
    return (
        docs.select("doc_id", "lang")
        .join(ppl, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("perplexity"), 4).alias("avg_ppl"),
            F.round(F.min("perplexity"), 4).alias("min_ppl"),
            F.round(F.max("perplexity"), 4).alias("max_ppl"),
        )
        .orderBy("lang")
    )


_PERPLEXITY_SQL = r"""
WITH toks AS (
    SELECT doc_id,
           unnest(string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' ')) AS tok
    FROM documents
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
vocab AS (SELECT tok, sum(tf) AS cnt FROM tf GROUP BY tok),
total AS (SELECT sum(cnt) AS n FROM vocab),
scored AS (
    SELECT doc_id, exp(-(sum(tf * ln(cnt / n)) / sum(tf))) AS ppl
    FROM tf JOIN vocab USING (tok) CROSS JOIN total
    GROUP BY doc_id
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(ppl), 4) AS avg_ppl,
       round(min(ppl), 4) AS min_ppl,
       round(max(ppl), 4) AS max_ppl
FROM scored JOIN documents USING (doc_id)
GROUP BY lang
ORDER BY lang
"""


def winnow_overlap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 rolling-hash document fingerprinting (round 5): winnowing
    (MOSS) sketches via ``operators/text.py::winnow_fingerprints``,
    oracle-pinned in the round-5 self-verdict style (the raw xxhash64
    fingerprints have no DuckDB equivalent, but their separating power
    does). Plants near-dup twins of the doc_id<100 slice (first raw
    token dropped) and emits one row:

    - ``n_pairs`` — oracle recomputes from the same filter;
    - ``min_planted_overlap_ge_40pct`` / ``avg_planted_overlap_ge_90pct``
      — a twin shares a long token run, and winnowing guarantees a
      shared fingerprint per shared run of >= window+k-1 tokens; pinned
      TRUE (measured min 0.5/0.75/0.75, avg 0.96/0.97/0.97 at
      sf0.001/0.01/0.1);
    - ``max_cross_overlap_le_10pct`` — consecutive unrelated docs share
      almost nothing; pinned TRUE (measured max 0.028/0.022/0.031)."""
    from neulix_datahub_spark.operators.text import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    pert = docs.withColumn("text", F.expr("substring(text, instr(text, ' ') + 1)"))
    a = docs.select("doc_id", winnow_fingerprints("text").alias("__fa"))
    b = pert.select("doc_id", winnow_fingerprints("text").alias("__fb"))
    ov = F.size(F.array_intersect("__fa", "__fb")) / F.size(
        F.array_union("__fa", "__fb")
    )
    planted = a.join(b, "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        (F.min(ov) >= 0.40).alias("min_planted_overlap_ge_40pct"),
        (F.avg(ov) >= 0.90).alias("avg_planted_overlap_ge_90pct"),
    )
    l, r = a.alias("l"), a.alias("r")
    xov = F.size(F.array_intersect("l.__fa", "r.__fa")) / F.size(
        F.array_union("l.__fa", "r.__fa")
    )
    cross = l.join(r, F.col("l.doc_id") + 1 == F.col("r.doc_id")).agg(
        (F.max(xov) <= 0.10).alias("max_cross_overlap_le_10pct")
    )
    return planted.crossJoin(cross)


_WINNOW_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       TRUE AS min_planted_overlap_ge_40pct,
       TRUE AS avg_planted_overlap_ge_90pct,
       TRUE AS max_cross_overlap_le_10pct
FROM documents WHERE doc_id < 100
"""


def bigram_perplexity_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+ LM-quality filter, bigram form (round 5): per-doc perplexity
    under a corpus-trained INTERPOLATED bigram model (λ=0.75 bigram MLE
    + 0.25 unigram backoff — one step closer to CCNet's KenLM than the
    unigram query), profiled per language. Fully SQL-expressible: the
    oracle retrains the whole LM and rescores every document."""
    from neulix_datahub_spark.operators.text import doc_bigram_perplexity

    docs = load_table(spark, sf_dir, "documents")
    ppl = doc_bigram_perplexity(docs)
    return (
        docs.select("doc_id", "lang")
        .join(ppl, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("perplexity"), 4).alias("avg_ppl"),
            F.round(F.min("perplexity"), 4).alias("min_ppl"),
            F.round(F.max("perplexity"), 4).alias("max_ppl"),
        )
        .orderBy("lang")
    )


_BIGRAM_PPL_SQL = r"""
WITH base AS (
  SELECT doc_id, lang,
         string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' ') AS t
  FROM documents
),
toks AS (SELECT unnest(t) AS tok FROM base),
uni AS (SELECT tok, count(*)::DOUBLE AS cnt FROM toks GROUP BY tok),
n AS (SELECT sum(cnt) AS n FROM uni),
pairs AS (
  SELECT doc_id, pc.prev AS prev, pc.cur AS cur
  FROM (
    SELECT doc_id,
           unnest([{'prev': t[i], 'cur': t[i+1]}
                   for i in generate_series(1, len(t) - 1)]) AS pc
    FROM base WHERE len(t) >= 2
  )
),
big AS (SELECT prev, cur, count(*)::DOUBLE AS bc FROM pairs GROUP BY prev, cur),
scored AS (
  SELECT p.doc_id,
         exp(-avg(ln(0.75 * b.bc / up.cnt + 0.25 * uc.cnt / n.n))) AS ppl
  FROM pairs p
  JOIN big b ON p.prev = b.prev AND p.cur = b.cur
  JOIN uni up ON up.tok = p.prev
  JOIN uni uc ON uc.tok = p.cur
  CROSS JOIN n
  GROUP BY p.doc_id
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(ppl), 4) AS avg_ppl,
       round(min(ppl), 4) AS min_ppl,
       round(max(ppl), 4) AS max_ppl
FROM scored JOIN documents USING (doc_id)
GROUP BY lang
ORDER BY lang
"""


def pca_embedding_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 adjunct (round 5): exact distributed PCA over the embedding
    corpus, oracle-pinned in the self-verdict style. The Gram pass is
    mapInPandas partial Xᵀ X sums (fixed-size per partition, merged over
    ≤2 145 keys — see operators/decomposition.py); the 64×64 eigensolve
    runs on the driver; a SECOND distributed pass projects the corpus on
    the top-8 eigenvectors (codegen'd zip_with dot products) and checks
    that the per-component sample variances equal the eigenvalues — an
    end-to-end proof of Gram assembly + eigensolve + projection. The
    oracle recomputes the exact anchor (total variance = Σ per-dim
    var_samp) and pins every verdict true."""
    import numpy as np

    from neulix_datahub_spark.operators.decomposition import (
        fit_pca,
        projected_variances,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    model = fit_pca(emb, "embedding", dim=64)
    pv = projected_variances(emb, "embedding", model, k=8)
    ev = model.eigenvalues
    ortho_err = float(
        np.abs(model.components.T @ model.components - np.eye(model.dim)).max()
    )
    proj_ok = all(
        abs(pv[i] - ev[i]) <= 1e-5 * max(abs(ev[i]), 1e-9) + 1e-9 for i in range(8)
    )
    row = (
        model.n,
        model.dim,
        round(model.total_variance, 6),
        bool(
            abs(float(ev.sum()) - model.total_variance)
            <= 1e-9 * max(model.total_variance, 1.0)
        ),
        bool(np.all(np.diff(ev) <= 1e-12)),
        bool(ortho_err < 1e-8),
        bool(proj_ok),
        bool(float(ev[:8].sum()) / model.total_variance >= 8.0 / model.dim),
    )
    return local_relation(
        spark,
        [row],
        (
            "n_vecs bigint, dim int, total_variance double, "
            "eig_sum_matches_trace boolean, evr_monotone boolean, "
            "components_orthonormal boolean, projected_var_matches_eigs boolean, "
            "top8_evr_ge_uniform boolean"
        ),
    )


_PCA_SQL = """
SELECT CAST(n.n AS BIGINT) AS n_vecs,
       CAST(64 AS INT) AS dim,
       round(tv.tv, 6) AS total_variance,
       TRUE AS eig_sum_matches_trace,
       TRUE AS evr_monotone,
       TRUE AS components_orthonormal,
       TRUE AS projected_var_matches_eigs,
       TRUE AS top8_evr_ge_uniform
FROM (SELECT count(*) AS n FROM embeddings) n,
     (SELECT sum(v) AS tv FROM (
         SELECT var_samp(x) AS v FROM (
             SELECT unnest(embedding)::DOUBLE AS x,
                    generate_subscripts(embedding, 1) AS i
             FROM embeddings
         ) GROUP BY i
     )) tv
"""


def cluster_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-leakage-safe train/eval split (round 5,
    operators/curation.py::cluster_split): MinHash LSH candidates →
    exact 3-gram-Jaccard verify (>= 0.8) → connected components → every
    cluster member inherits the split keyed off the REPRESENTATIVE's
    content hash, so a test document can never have a 0.9-Jaccard twin
    in train. The DuckDB oracle recomputes from first principles:
    all-pairs exact Jaccard, recursive-CTE closure, the same md5-prefix
    cutoff — so a green row proves the LSH surfaced every true pair AND
    the cluster-keyed assignment matches exactly. The straddle count is
    structural (split is a function of the cluster) but recomputed by
    both engines as the invariant the operator exists to enforce."""
    from neulix_datahub_spark.operators.curation import cluster_split

    corpus = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cand = minhash_near_duplicates(corpus, "text", "doc_id", num_hashes=64, bands=16)
    pairs = verify_candidate_pairs(
        corpus, cand, text_col="text", id_col="doc_id", n=3, threshold=0.8
    )
    labeled = cluster_split(
        corpus, pairs, {"train": 0.8, "eval": 0.2}, id_col="doc_id"
    )
    per_split = labeled.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("cluster").alias("n_clusters"),
    )
    straddle = (
        labeled.select("cluster", "split")
        .distinct()
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("__n_splits"))
        .agg(
            F.sum((F.col("__n_splits") > 1).cast("bigint")).alias(
                "n_straddling_clusters"
            )
        )
    )
    return per_split.crossJoin(straddle).orderBy("split")


# Mirrors cluster_split exactly: same 3-gram shingles/normalization as
# the LSH-dedup oracle, closure by recursive CTE, split by the first 4
# hex chars of md5(representative text) < 'cccc' (= rate_to_hex_cutoff
# (0.8, 4)).
_CLUSTER_SPLIT_SQL = """
WITH RECURSIVE sh AS (
    SELECT doc_id,
           list_distinct(
               CASE WHEN len(t) >= 3
                    THEN [array_to_string(t[i:i+2], ' ')
                          for i in generate_series(1, len(t) - 2)]
                    ELSE [array_to_string(t, ' ')] END
           ) AS shingles
    FROM (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' ') AS t
        FROM documents
    )
),
edges AS (
    SELECT a.doc_id AS u, b.doc_id AS v
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
          / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.8
),
sym AS (
    SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges
),
reach AS (
    SELECT id, id AS r FROM (SELECT DISTINCT u AS id FROM sym)
    UNION
    SELECT reach.id, s.v AS r FROM reach JOIN sym s ON reach.r = s.u
),
comp AS (
    SELECT id, min(r) AS component FROM reach GROUP BY id
),
labeled AS (
    SELECT d.doc_id, coalesce(c.component, d.doc_id) AS cluster
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
),
assigned AS (
    SELECT l.doc_id, l.cluster,
           CASE WHEN substring(md5('split:' || COALESCE(r.text, '')), 1, 4) < 'cccc'
                THEN 'train' ELSE 'eval' END AS split
    FROM labeled l JOIN documents r ON l.cluster = r.doc_id
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters,
       (SELECT CAST(count(*) AS BIGINT) FROM (
            SELECT cluster FROM (SELECT DISTINCT cluster, split FROM assigned)
            GROUP BY cluster HAVING count(*) > 1
       )) AS n_straddling_clusters
FROM assigned
GROUP BY split
ORDER BY split
"""


def unicode_normalization_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 cleaning via the VECTORIZED scalar pandas-UDF surface
    (operators/text.py::nfc_normalize_udf — Spark SQL has no Unicode
    normalization, so this is the one honest Python hot-path in the
    text tier). A decomposed e+COMBINING-ACUTE suffix is planted on
    every document identically in both engines; NFC must compose it,
    shrinking each doc by exactly one character — the oracle recomputes
    with DuckDB's native nfc_normalize, so the hash check pins the
    UDF's Arrow batch path AND the normalization semantics."""
    from neulix_datahub_spark.operators.text import nfc_normalize_udf

    docs = load_table(spark, sf_dir, "documents")
    nfc = nfc_normalize_udf()
    planted = docs.select(
        "lang", F.concat("text", F.lit("e\u0301")).alias("__raw")
    )
    return (
        planted.select(
            "lang",
            F.length("__raw").alias("__rawlen"),
            F.length(nfc(F.col("__raw"))).alias("__nfclen"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__rawlen").alias("raw_chars"),
            F.sum("__nfclen").alias("nfc_chars"),
        )
        .orderBy("lang")
    )


_NFC_SQL = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text || 'e' || chr(769))) AS BIGINT) AS raw_chars,
       CAST(sum(length(nfc_normalize(text || 'e' || chr(769)))) AS BIGINT)
           AS nfc_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


def pca_merge_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA MERGEABILITY (round 5, the HLL/CMS-merge-check pattern for
    the Gram path): fit the model from TWO shard partials (vec_id
    parity split, Grams merged by plain sums) and one-shot from the
    full corpus — the eigenvalue spectra must agree to float roundoff
    (the partials are sums, so merging is exact up to summation order;
    gate 1e-9 relative). Oracle recomputes the exact total-variance
    anchor and pins the verdicts. This is the invariant that lets a
    100 TB deployment keep one small Gram partial per day/source and
    refresh the global model without rescanning history."""
    import numpy as np

    from neulix_datahub_spark.operators.decomposition import (
        collect_gram_partial,
        model_from_partials,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    even = collect_gram_partial(emb.filter(F.col("vec_id") % 2 == 0), "embedding", 64)
    odd = collect_gram_partial(emb.filter(F.col("vec_id") % 2 == 1), "embedding", 64)
    merged = model_from_partials([even, odd], 64)
    one_shot = model_from_partials(
        [collect_gram_partial(emb, "embedding", 64)], 64
    )
    rel = np.max(
        np.abs(merged.eigenvalues - one_shot.eigenvalues)
        / np.maximum(np.abs(one_shot.eigenvalues), 1e-12)
    )
    row = (
        merged.n,
        round(merged.total_variance, 6),
        bool(merged.n == one_shot.n),
        bool(rel <= 1e-9),
        bool(
            abs(merged.total_variance - one_shot.total_variance)
            <= 1e-9 * max(one_shot.total_variance, 1.0)
        ),
    )
    return local_relation(
        spark,
        [row],
        (
            "n_vecs bigint, total_variance double, counts_match boolean, "
            "eigs_match_1e9 boolean, trace_match_1e9 boolean"
        ),
    )


_PCA_MERGE_SQL = """
SELECT CAST(n.n AS BIGINT) AS n_vecs,
       round(tv.tv, 6) AS total_variance,
       TRUE AS counts_match,
       TRUE AS eigs_match_1e9,
       TRUE AS trace_match_1e9
FROM (SELECT count(*) AS n FROM embeddings) n,
     (SELECT sum(v) AS tv FROM (
         SELECT var_samp(x) AS v FROM (
             SELECT unnest(embedding)::DOUBLE AS x,
                    generate_subscripts(embedding, 1) AS i
             FROM embeddings
         ) GROUP BY i
     )) tv
"""


def bloom_decontamination_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4+/sketch synthesis (round 9): Bloom-filter benchmark
    decontamination — the 100 TB shape of the exact semi-join in
    contamination_by_lang. The benchmark's 8-gram shingles build a
    PORTABLE (md5-family) Bloom filter (2^16 bits, k=3, one broadcast
    row); every training shingle probes it as a pure expression BEFORE
    any shuffle, so the exact semi-join only ever sees the flagged
    superset. Per language: docs, bloom-flagged, exactly-contaminated,
    and false positives — the oracle REBUILDS the identical filter from
    the same md5 bit positions (set-membership form), so every per-doc
    flag decision is hash-checked, and ``n_bloom_flagged >= n_exact``
    with ``n_false_pos`` the measured sketch trade (0 at small SF,
    a few tenths of a percent once the filter carries real load)."""
    from neulix_datahub_spark.operators.curation import (
        benchmark_excerpt,
        benchmark_ngram_contamination,
    )
    from neulix_datahub_spark.operators.dedupe import _shingles
    from neulix_datahub_spark.operators.sketches import bloom_build, bloom_prefilter

    docs = load_table(spark, sf_dir, "documents")
    bench = benchmark_excerpt(
        docs.filter(F.col("doc_id") % 13 == 0), first_tokens=12
    )
    bench_grams = bench.select(
        F.explode(_shingles(F.col("text"), 8)).alias("__gram")
    ).distinct()
    bloom = bloom_build(
        bench_grams, "__gram", num_bits=1 << 16, num_hashes=3, hash_family="md5"
    )
    train_grams = docs.select(
        "doc_id", F.explode(_shingles(F.col("text"), 8)).alias("__gram")
    )
    flagged = (
        bloom_prefilter(
            train_grams, "__gram", bloom,
            num_bits=1 << 16, num_hashes=3, hash_family="md5",
        )
        .select("doc_id")
        .distinct()
        .withColumn("__b", F.lit(1))
    )
    exact = benchmark_ngram_contamination(docs, bench, n=8).withColumn(
        "__e", F.lit(1)
    )
    return (
        docs.join(flagged, "doc_id", "left")
        .join(exact, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("__b", F.lit(0))).alias("n_bloom_flagged"),
            F.sum(F.coalesce("__e", F.lit(0))).alias("n_exact"),
            F.sum(
                F.when(
                    F.col("__b").isNotNull() & F.col("__e").isNull(), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("n_false_pos"),
        )
        .orderBy("lang")
    )


_BLOOM_DECON_SQL = r"""
WITH norm AS (
    SELECT doc_id, lang,
           string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' ') AS t
    FROM documents
),
bgrams AS (
    SELECT DISTINCT unnest(
        CASE WHEN len(bt) >= 8
             THEN [array_to_string(bt[i:i+7], ' ')
                   for i in generate_series(1, len(bt) - 7)]
             ELSE [array_to_string(bt, ' ')] END
    ) AS g
    FROM (SELECT t[1:12] AS bt FROM norm WHERE doc_id % 13 = 0)
),
bits AS (
    SELECT DISTINCT
        CAST('0x' || substr(md5('bloom' || CAST(s.i AS VARCHAR) || ':' || g), 1, 8)
             AS BIGINT) % 65536 AS b
    FROM bgrams, generate_series(0, 2) AS s(i)
),
tgrams AS (
    SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(t) >= 8
             THEN [array_to_string(t[i:i+7], ' ')
                   for i in generate_series(1, len(t) - 7)]
             ELSE [array_to_string(t, ' ')] END
    )) AS g
    FROM norm
),
bloomed AS (
    SELECT DISTINCT doc_id FROM tgrams
    WHERE CAST('0x' || substr(md5('bloom0:' || g), 1, 8) AS BIGINT) % 65536
              IN (SELECT b FROM bits)
      AND CAST('0x' || substr(md5('bloom1:' || g), 1, 8) AS BIGINT) % 65536
              IN (SELECT b FROM bits)
      AND CAST('0x' || substr(md5('bloom2:' || g), 1, 8) AS BIGINT) % 65536
              IN (SELECT b FROM bits)
),
exact AS (
    SELECT DISTINCT doc_id FROM tgrams WHERE g IN (SELECT g FROM bgrams)
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM bloomed)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_flagged,
       CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM exact)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM bloomed)
                      AND doc_id NOT IN (SELECT doc_id FROM exact)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
FROM documents
GROUP BY lang
ORDER BY lang
"""


def temperature_mixture_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation tier (round 9): temperature-scaled mixture sampling —
    quota ``floor(200 · sqrt(n_lang) / Σ sqrt(n))`` per language, the
    k hash-smallest docs per language win (temperature_mixture_sample,
    α=0.5). Reports per language the corpus size, how many survived,
    and the id-sum of the survivors — the id-sum pins WHICH documents
    won, not just how many, so the oracle re-derives the full pick. The
    α=0.5 path is bit-exact cross-engine (correctly-rounded sqrt +
    order-pinned denominator fold), so the driver hashes it with zero
    tolerance."""
    from neulix_datahub_spark.operators.curation import temperature_mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = (
        temperature_mixture_sample(docs, budget=200, alpha=0.5)
        .select("doc_id")
        .withColumn("__k", F.lit(1))
    )
    return (
        docs.join(kept, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("__k", F.lit(0))).alias("n_kept"),
            F.sum(
                F.when(F.col("__k").isNotNull(), F.col("doc_id")).otherwise(
                    F.lit(0)
                )
            ).alias("kept_id_sum"),
        )
        .orderBy("lang")
    )


_TEMPERATURE_MIX_SQL = """
WITH c AS (
    SELECT lang, count(*) AS n FROM documents GROUP BY lang
),
s AS (
    SELECT list_reduce(list_sort(list(sqrt(n))), (a, b) -> a + b) AS S FROM c
),
q AS (
    SELECT lang, CAST(floor(200.0 * sqrt(n) / S) AS BIGINT) AS k FROM c, s
),
r AS (
    SELECT lang, doc_id,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('tmix:' || COALESCE(text, '')), doc_id
           ) AS rk
    FROM documents
)
SELECT r.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN r.rk <= q.k THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN r.rk <= q.k THEN r.doc_id ELSE 0 END) AS BIGINT)
           AS kept_id_sum
FROM r JOIN q ON r.lang = q.lang
GROUP BY r.lang
ORDER BY r.lang
"""


def bpe_merges_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary tier (round 9): learn the corpus's first 8
    BPE merges with the distributed trainer (operators/bpe.py — word
    table one corpus scan, then per-round pair-count aggregates over
    the vocabulary relation, ONE collected row per round) and emit the
    merge sequence with its pair counts. Every step is engine-portable
    (regexp char-split, greedy left-to-right string replace, integer
    counts, lexicographic tie-break), so the oracle replays the
    IDENTICAL training run as 8 unrolled CTE rounds — the driver hash
    pins the whole algorithm, not a summary of it."""
    from neulix_datahub_spark.operators.bpe import bpe_learn_merges

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_learn_merges(docs, n_merges=8)
    return local_relation(
        spark,
        [
            (m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
            for m in merges
        ],
        "rank bigint, lhs string, rhs string, merged string, pair_count bigint",
    ).orderBy("rank")


_FOLD = """list_reduce(
        list_prepend(chr(31), list_filter(string_split({col}, chr(31)), x -> x <> '')),
        (acc, x) -> CASE
            WHEN ends_with(acc, chr(31) || p{i}.a || chr(31)) AND x = p{i}.b
            THEN substr(acc, 1, length(acc) - length(p{i}.a) - 1)
                 || p{i}.a || p{i}.b || chr(31)
            ELSE acc || x || chr(31) END
    )"""



# BPE's canonical text form, mirrored VERBATIM from the engine's
# _bpe_normalize (operators/bpe.py): the reserved C0 separators
# 0x1c-0x1f — chr(31) is the symbol delimiter, chr(28)-chr(30) the
# batched oracle's record/needle codes — are DELETED first (enforcing
# the reserved-codepoint contract instead of assuming it of the
# corpus), then Java-\s whitespace collapse + space trim. The same
# regex literal parses identically in Java, RE2 and Python re.
def bpe_norm_sql(col: str = "text") -> str:
    return (
        "trim(regexp_replace(lower(regexp_replace(" + col
        + r", '[\x1c-\x1f]', '', 'g')), '[ \t\n\v\f\r]+', ' ', 'g'))"
    )


# The word-grain w0 CTE (normalize -> space-split -> per-word symbol
# stream with counts) shared VERBATIM by every word-mode BPE oracle —
# one copy, so a normalization fix can never miss a mirror (the round-10
# whitespace-parity lesson).
WORD_W0_SQL = r"""
WITH w0 AS (
    SELECT chr(31) || regexp_replace(word, '(?s)(.)', '\1' || chr(31), 'g') AS sym,
           CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT unnest(string_split(""" + bpe_norm_sql("text") + r""", ' ')) AS word
        FROM documents
    )
    WHERE word <> ''
    GROUP BY word
),"""

def _bpe_round(i: int) -> str:
    # the merge rewrite is the same greedy left fold the engine runs —
    # see operators/bpe.py::_merge_fold (a plain string replace is NOT
    # equivalent on consecutive same-pair runs). LEFT JOIN ON TRUE +
    # NULL passthrough mirrors the engine's early stop: once the corpus
    # fully merges, p{i} is empty and every later round is a no-op
    # instead of emptying the whole chain.
    fold = _FOLD.format(col="sym", i=i)
    return f"""
p{i} AS (
    SELECT p.a AS a, p.b AS b, CAST(sum(n) AS BIGINT) AS c
    FROM (
        SELECT unnest([struct_pack(a := l[i], b := l[i+1])
                       for i in generate_series(1, len(l) - 1)]) AS p, n
        FROM (SELECT list_filter(string_split(sym, chr(31)), x -> x <> '') AS l, n
              FROM w{i - 1})
        WHERE len(l) >= 2
    )
    GROUP BY p.a, p.b
    ORDER BY c DESC, a, b
    LIMIT 1
),
w{i} AS (
    SELECT CASE WHEN p{i}.a IS NULL THEN sym ELSE {fold} END AS sym, n
    FROM w{i - 1} LEFT JOIN p{i} ON TRUE
)"""


_BPE_SQL = (
    WORD_W0_SQL
    + ",".join(_bpe_round(i) for i in range(1, 9))
    + """
SELECT * FROM (
"""
    + "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, a AS lhs, b AS rhs, a || b AS merged, "
        f"c AS pair_count FROM p{i}"
        for i in range(1, 9)
    )
    + """
)
ORDER BY rank
"""
)


def bpe_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer tier, APPLY side (round 9; re-planned round 10): learn
    8 BPE merges, segment the corpus with them, and report per language
    the token accounting: documents, BPE tokens, character-symbol
    tokens before any merge, and the compression the merges bought.

    Round-10 plan change (engine only — the oracle and the result are
    unchanged): token COUNTS don't need per-document segmentation.
    Merges never cross word boundaries, so tokens(doc) = Σ
    tokens(word); the fold chain therefore runs once per DISTINCT word
    (the Heaps-bounded vocabulary relation — the same working set the
    trainer uses) and the corpus side is explode → join → aggregate,
    with AQE free to broadcast the tiny token-count table. The old
    per-document fold chain cost 10.5 s at sf0.1; this plan is
    training-dominated. (Per-document token ARRAYS are a different
    operator: bpe_segment / bpe_segment_pandas.)"""
    from neulix_datahub_spark.operators.bpe import (
        US,
        _bpe_normalize,
        _merge_fold,
        _symbolize,
        bpe_learn_merges,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_learn_merges(docs, n_merges=8)
    norm = _bpe_normalize(F.col("text"))
    lang_words = docs.select(
        "lang", F.explode(F.split(norm, " ")).alias("word")
    ).filter(F.col("word") != "")
    sym = _symbolize(F.col("word"))
    for m in merges:
        sym = _merge_fold(sym, m["left"], m["right"])
    word_tokens = lang_words.select("word").distinct().select(
        "word",
        F.size(F.filter(F.split(sym, US), lambda x: x != "")).alias("__wt"),
        F.length("word").alias("__wc"),
    )
    token_sums = (
        lang_words.join(word_tokens, "word")
        .groupBy("lang")
        .agg(
            F.sum("__wt").alias("__sum_wt"),
            F.sum("__wc").alias("__sum_wc"),
        )
    )
    # per-lang base mirrors the oracle's per-document sum semantics:
    # NULL iff the lang has ONLY NULL texts; 0 if any doc normalizes to
    # a (possibly empty) string. The word-join alone would return NULL
    # for an all-empty-text lang where the oracle returns 0 — the
    # latent-divergence class the r10 LEFT JOIN guard fixed elsewhere.
    base = F.max(F.when(F.col("text").isNotNull(), F.lit(0)).cast("bigint"))
    return (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), base.alias("__base"))
        .join(token_sums, "lang", "left")
        .select(
            "lang", "n_docs",
            (F.col("__base") + F.coalesce("__sum_wt", F.lit(0)))
            .alias("n_bpe_tokens"),
            (F.col("__base") + F.coalesce("__sum_wc", F.lit(0)))
            .alias("n_char_tokens"),
        )
        .select(
            "lang", "n_docs", "n_bpe_tokens", "n_char_tokens",
            # try_divide: ANSI `/` throws DIVIDE_BY_ZERO for an
            # all-empty lang; DuckDB's ::DOUBLE / 0 is NULL, and
            # try_divide returns exactly NULL on a zero divisor
            F.round(
                F.try_divide("n_char_tokens", "n_bpe_tokens"), 6
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


def _bpe_apply_round(i: int) -> str:
    fold = _FOLD.format(col="s", i=i)
    return f"""
t{i} AS (
    SELECT lang, n_char,
           CASE WHEN p{i}.a IS NULL OR s IS NULL THEN s ELSE {fold} END AS s
    FROM t{i - 1} LEFT JOIN p{i} ON TRUE
)"""


_BPE_TOKENIZE_SQL = (
    WORD_W0_SQL
    + ",".join(_bpe_round(i) for i in range(1, 9))
    + r""",
t0 AS (
    SELECT lang,
           length(replace(""" + bpe_norm_sql("text") + r""", ' ', ''))
               AS n_char,
           chr(31) || regexp_replace(""" + bpe_norm_sql("text") + r""",
               '(?s)(.)', '\1' || chr(31), 'g') AS s
    FROM documents
),"""
    + ",".join(_bpe_apply_round(i) for i in range(1, 9))
    + r"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(list_filter(string_split(s, chr(31)),
                                x -> x <> '' AND x <> ' ')))
            AS BIGINT) AS n_bpe_tokens,
       CAST(sum(n_char) AS BIGINT) AS n_char_tokens,
       round(sum(n_char)::DOUBLE
             / sum(len(list_filter(string_split(s, chr(31)),
                                   x -> x <> '' AND x <> ' '))), 6)
           AS chars_per_token
FROM t8
GROUP BY lang
ORDER BY lang
"""
)


def bpe_batched_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer tier at TOKENIZER SCALE (round 10): train a 300+-merge
    vocabulary with the BATCHED trainer (operators/bpe.py::
    bpe_learn_merges_batched) — 16 rounds, window 256, raw
    (SentencePiece-style, no pre-tokenization) units, each round ONE
    pair-count aggregate + a greedy-maximal non-interacting batch
    applied in a single fold pass. Emits the full merge table in
    application order; the oracle replays the ENTIRE batched training
    run (ranked window, prefix-scan selection, multi-pair fold) as 16
    unrolled materialized CTE rounds, so the driver hash pins the whole
    batched algorithm — selection rule included — not a summary."""
    from neulix_datahub_spark.operators.bpe import bpe_learn_merges_batched

    docs = load_table(spark, sf_dir, "documents")
    # rewrite="auto": sizing aggregate → arrow on compile-bound test
    # corpora, fold at scale; tiers are bit-identical (parity-pinned).
    merges = bpe_learn_merges_batched(
        docs, n_rounds=16, window=256, unit="raw", rewrite="auto"
    )
    return local_relation(
        spark,
        [
            (m["rank"], m["round"], m["round_rank"], m["left"], m["right"],
             m["merged"], m["pair_count"])
            for m in merges
        ],
        "rank bigint, rnd bigint, round_rank bigint, lhs string, "
        "rhs string, merged string, pair_count bigint",
    ).orderBy("rank")


def _batched_fold(i: int) -> str:
    """Single multi-pair fold pass for batched round ``i`` — the
    prototype-1 shape: the list_filter match is consulted via [1]
    indexing in the OUTER lambda body only (DuckDB 1.0 miscompiles
    indexed access on a captured outer param inside a nested lambda)."""
    m = (f"list_filter(b{i}.ms, m -> ends_with(acc, chr(31) || m.a || chr(31))"
         f" AND x = m.b)")
    return f"""list_reduce(
        list_prepend(chr(31), list_filter(string_split(sym, chr(31)), x -> x <> '')),
        (acc, x) -> CASE
            WHEN len({m}) > 0
            THEN substr(acc, 1, length(acc) - length({m}[1].a) - 1)
                 || {m}[1].a || {m}[1].b || chr(31)
            ELSE acc || x || chr(31) END
    )"""


def _batched_round(i: int, window: int) -> str:
    """One batched training round. The greedy-maximal selection runs as
    a list_reduce prefix scan whose accumulator is a single VARCHAR of
    kept records ``RS a US b US ab RS`` (chr 30/31) and whose
    candidates carry pre-rendered interaction NEEDLES (chr 28 separates
    record from needle block, chr 29 separates needles): a candidate is
    kept iff none of its 9 needles occurs in the accumulator — the
    capture-safe encoding of select_batch's rule (the inner lambda only
    references plain ``acc`` and its own param)."""
    fold = _batched_fold(i)
    cand = (
        "chr(30) || a || chr(31) || b || chr(31) || a || b || chr(30)"
        " || chr(28) ||"
        " chr(30) || a || chr(31) || chr(29) || chr(30) || b || chr(31)"
        " || chr(29) ||"
        " chr(31) || a || chr(31) || chr(29) || chr(31) || b || chr(31)"
        " || chr(29) ||"
        " chr(31) || a || chr(30) || chr(29) || chr(31) || b || chr(30)"
        " || chr(29) ||"
        " chr(30) || a || b || chr(31) || chr(29) || chr(31) || a || b"
        " || chr(31) || chr(29) || chr(31) || a || b || chr(30)"
    )
    return f"""
c{i} AS MATERIALIZED (
    SELECT p.a AS a, p.b AS b, CAST(sum(n) AS BIGINT) AS c
    FROM (
        SELECT unnest([struct_pack(a := l[i], b := l[i+1])
                       for i in generate_series(1, len(l) - 1)]) AS p, n
        FROM (SELECT list_filter(string_split(sym, chr(31)), x -> x <> '') AS l, n
              FROM w{i - 1})
        WHERE len(l) >= 2
    )
    GROUP BY p.a, p.b
),
g{i} AS MATERIALIZED (
    SELECT coalesce(list({cand} ORDER BY c DESC, a, b)[:{window}], []) AS rl
    FROM c{i}
),
b{i} AS MATERIALIZED (
    SELECT list_transform(
        list_filter(string_split(CASE WHEN len(rl) = 0 THEN '' ELSE
            list_reduce(
                list_prepend('', rl),
                (acc, x) -> CASE WHEN len(list_filter(
                        string_split(string_split(x, chr(28))[2], chr(29)),
                        nd -> nd <> '' AND contains(acc, nd))) = 0
                    THEN acc || string_split(x, chr(28))[1] ELSE acc END
            ) END, chr(30)), r -> r <> ''),
        r -> struct_pack(a := string_split(r, chr(31))[1],
                         b := string_split(r, chr(31))[2])) AS ms
    FROM g{i}
),
k{i} AS MATERIALIZED (
    SELECT unnest(ms).a AS a, unnest(ms).b AS b,
           generate_subscripts(ms, 1) AS round_rank
    FROM b{i}
),
w{i} AS MATERIALIZED (
    SELECT CASE WHEN len(b{i}.ms) = 0 THEN sym ELSE {fold} END AS sym, n
    FROM w{i - 1}, b{i}
)"""


_BPE_BATCHED_ROUNDS = 16
_BPE_BATCHED_WINDOW = 256


def batched_with_clause(n_rounds: int, window: int) -> str:
    """WITH clause replaying a batched training run: w0 (raw units) +
    ``n_rounds`` unrolled batched rounds. Shared by the two batched
    driver queries and the hypothesis engine-vs-oracle property (which
    generates SMALL parameterizations over random corpora)."""
    return (
        r"""
WITH w0 AS MATERIALIZED (
    SELECT chr(31) || regexp_replace(norm, '(?s)(.)', '\1' || chr(31), 'g') AS sym,
           CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT """ + bpe_norm_sql("text") + r""" AS norm
        FROM documents
    )
    WHERE norm <> ''
    GROUP BY norm
),"""
        + ",".join(_batched_round(i, window) for i in range(1, n_rounds + 1))
    )


def batched_vocab_sql(n_rounds: int, window: int) -> str:
    """The full batched merge-table replay (rank, rnd, round_rank, lhs,
    rhs, merged, pair_count) at the given parameterization."""
    return (
        batched_with_clause(n_rounds, window)
        + """
SELECT CAST(row_number() OVER (ORDER BY rnd, round_rank) AS BIGINT) AS rank,
       CAST(rnd AS BIGINT) AS rnd,
       CAST(round_rank AS BIGINT) AS round_rank,
       lhs, rhs, merged, CAST(pair_count AS BIGINT) AS pair_count
FROM (
"""
        + "\nUNION ALL\n".join(
            f"SELECT {i} AS rnd, k{i}.round_rank, k{i}.a AS lhs, k{i}.b AS rhs, "
            f"k{i}.a || k{i}.b AS merged, c{i}.c AS pair_count "
            f"FROM k{i} JOIN c{i} ON k{i}.a = c{i}.a AND k{i}.b = c{i}.b"
            for i in range(1, n_rounds + 1)
        )
        + """
)
ORDER BY rank
"""
    )


# shared WITH clause at the registered parameterization — both batched
# driver queries (merge table / apply stats) replay the same run
_BPE_BATCHED_WITH = batched_with_clause(_BPE_BATCHED_ROUNDS, _BPE_BATCHED_WINDOW)

_BPE_BATCHED_SQL = batched_vocab_sql(_BPE_BATCHED_ROUNDS, _BPE_BATCHED_WINDOW)


def bpe_vocab_coverage_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer EVALUATION (round 10): the vocabulary coverage curve —
    after training the 8-merge vocab, how much of the corpus's token
    stream do the top-k symbols cover? The standard Zipf sanity check
    on a learned tokenizer (a healthy vocab front-loads coverage; a
    degenerate one doesn't). Engine: fold once per DISTINCT word,
    explode symbols weighted by word count, rank by (freq DESC, symbol)
    and emit the top 20 with cumulative corpus share. The window is
    GLOBAL but over bounded grain — the symbol vocabulary, not the
    corpus (same exemption class as the sketch/percentile queries).
    The oracle replays training and reads the same curve off w8."""
    from pyspark.sql import Window

    from neulix_datahub_spark.operators.bpe import (
        US,
        _merge_fold,
        _symbolize,
        bpe_learn_merges,
        word_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_learn_merges(docs, n_merges=8)
    words = word_counts(docs)
    sym = _symbolize(F.col("word"))
    for m in merges:
        sym = _merge_fold(sym, m["left"], m["right"])
    freqs = (
        words.select(
            F.explode(F.filter(F.split(sym, US), lambda x: x != ""))
            .alias("symbol"),
            "n",
        )
        .groupBy("symbol")
        .agg(F.sum("n").alias("freq"))
    )
    # bounded grain: rows here are distinct vocabulary SYMBOLS (Heaps-
    # bounded), never corpus rows — the global order is safe at 100 TB.
    # total rides the SAME window sort (unbounded frame) instead of a
    # second aggregate + crossJoin, which would re-derive the fold
    # lineage over every distinct word a second time.
    order = [F.desc("freq"), F.asc("symbol")]
    cum_w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot_w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        freqs.select(
            F.row_number().over(Window.orderBy(*order)).alias("rank"),
            "symbol", "freq",
            F.sum("freq").over(cum_w).alias("__cum"),
            F.sum("freq").over(tot_w).alias("__total"),
        )
        .filter(F.col("rank") <= 20)
        .select(
            "rank", "symbol", "freq",
            F.round(F.try_divide("__cum", "__total"), 6).alias("cum_share"),
        )
        .orderBy("rank")
    )


_BPE_COVERAGE_SQL = (
    WORD_W0_SQL
    + ",".join(_bpe_round(i) for i in range(1, 9))
    + r""",
freqs AS (
    SELECT symbol, CAST(sum(n) AS BIGINT) AS freq
    FROM (
        SELECT unnest(list_filter(string_split(sym, chr(31)),
                                  x -> x <> '')) AS symbol, n
        FROM w8
    )
    GROUP BY symbol
),
ranked AS (
    SELECT symbol, freq,
           row_number() OVER (ORDER BY freq DESC, symbol) AS rank,
           sum(freq) OVER (ORDER BY freq DESC, symbol
                           ROWS UNBOUNDED PRECEDING) AS cum,
           sum(freq) OVER () AS total
    FROM freqs
)
SELECT CAST(rank AS BIGINT) AS rank, symbol, freq,
       round(cum::DOUBLE / total, 6) AS cum_share
FROM ranked
WHERE rank <= 20
ORDER BY rank
"""
)


def bpe_batched_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer tier at scale, APPLY side (round 10): train the
    313-merge batched vocabulary (raw units) and segment the corpus
    with the VECTORIZED mapInPandas tier — one Arrow pass replaying the
    per-round batches, the plan shape that survives a 32k-merge
    vocabulary. Emits whole-corpus token accounting (docs, tokens,
    chars, distinct final symbols, compression). The oracle never sees
    the vectorized path: it replays the batched training run and reads
    the SAME stats off the final vocabulary relation w16 (raw units ≡
    normalized documents, counts = multiplicities), so the driver hash
    pins vectorized-apply == trainer-rewrite == oracle end-to-end at a
    vocabulary size the chained folds could not reach."""
    from neulix_datahub_spark.operators.bpe import (
        _bpe_normalize,
        bpe_learn_merges_batched,
        bpe_segment_pandas,
    )

    docs = load_table(spark, sf_dir, "documents")
    # rewrite="auto": one sizing aggregate picks the per-round rewrite
    # tier — arrow here (test corpora are compile-bound: ~1.6 s/round of
    # fold is mostly codegen compile of fresh pair literals), fold on a
    # real corpus (JVM per-byte throughput dominates). Bit-identical
    # either way (parity-pinned), so the oracle replay is unaffected.
    merges = bpe_learn_merges_batched(
        docs, n_rounds=16, window=256, unit="raw", rewrite="auto"
    )
    norm = _bpe_normalize(F.col("text"))
    corpus = docs.filter(F.length(norm) > 0)
    seg = bpe_segment_pandas(corpus, merges, unit="raw", out_col="__toks")
    # ONE segmentation pass, one explode, one aggregate: a non-empty
    # unit always yields >=1 symbol, so explode preserves every doc and
    # n_docs/n_chars fall out of the token grain (chars == sum of
    # symbol lengths by construction; n_docs counts pos-0 tokens — one
    # per document ROW, so NULL or duplicated doc_ids still count like
    # the oracle's sum(n)). A second aggregation over `seg` would
    # re-run the Arrow tokenize pass over the whole corpus.
    exploded = seg.select(F.posexplode("__toks").alias("pos", "s"))
    return exploded.agg(
        F.sum(F.when(F.col("pos") == 0, 1).otherwise(0))
        .cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.length("s")).alias("n_chars"),
        F.count_distinct("s").alias("n_distinct_symbols"),
    ).select(
        "n_docs", "n_tokens", "n_chars", "n_distinct_symbols",
        F.round(F.try_divide("n_chars", "n_tokens"), 6)
        .alias("chars_per_token"),
    )


_BPE_BATCHED_APPLY_SQL = (
    _BPE_BATCHED_WITH
    + """
SELECT CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(sum(n * len(list_filter(string_split(sym, chr(31)),
                                    x -> x <> ''))) AS BIGINT) AS n_tokens,
       CAST(sum(n * length(replace(sym, chr(31), ''))) AS BIGINT) AS n_chars,
       (SELECT CAST(count(DISTINCT s) AS BIGINT)
        FROM (SELECT unnest(list_filter(string_split(sym, chr(31)),
                                        x -> x <> '')) AS s
              FROM w{R})) AS n_distinct_symbols,
       round(sum(n * length(replace(sym, chr(31), '')))::DOUBLE
             / sum(n * len(list_filter(string_split(sym, chr(31)),
                                       x -> x <> ''))), 6)
           AS chars_per_token
FROM w{R}
""".format(R=_BPE_BATCHED_ROUNDS)
)


def bpe_apply_parity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer tier, APPLY parity (round 10): learn the 8-merge vocab
    and segment every document through BOTH apply paths — the chained
    expression folds (bpe_segment) and the Arrow-vectorized mapInPandas
    replay (bpe_segment_pandas, the at-scale tier) — reporting per-lang
    token sums from each. The oracle replays the fold chain once and
    emits its sum under BOTH columns, so the driver hash pins
    fold == vectorized == oracle on real data (the same discipline that
    paired the UDTF with the expression chunker)."""
    from neulix_datahub_spark.operators.bpe import (
        bpe_learn_merges,
        bpe_segment,
        bpe_segment_pandas,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_learn_merges(docs, n_merges=8)
    vec = bpe_segment_pandas(docs, merges, out_col="__vec")
    return (
        vec.select(
            "lang",
            F.size(bpe_segment(F.col("text"), merges)).alias("__f"),
            F.size("__vec").alias("__v"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__f").alias("n_tok_fold"),
            F.sum("__v").alias("n_tok_vec"),
        )
        .orderBy("lang")
    )


_BPE_APPLY_PARITY_SQL = (
    WORD_W0_SQL
    + ",".join(_bpe_round(i) for i in range(1, 9))
    + r""",
t0 AS (
    SELECT lang,
           chr(31) || regexp_replace(""" + bpe_norm_sql("text") + r""",
               '(?s)(.)', '\1' || chr(31), 'g') AS s
    FROM documents
),"""
    + ",".join(
        f"""
t{i} AS (
    SELECT lang,
           CASE WHEN p{i}.a IS NULL OR s IS NULL THEN s
                ELSE {_FOLD.format(col="s", i=i)} END AS s
    FROM t{i - 1} LEFT JOIN p{i} ON TRUE
)"""
        for i in range(1, 9)
    )
    + r"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(list_filter(string_split(s, chr(31)),
                                x -> x <> '' AND x <> ' ')))
            AS BIGINT) AS n_tok_fold,
       CAST(sum(len(list_filter(string_split(s, chr(31)),
                                x -> x <> '' AND x <> ' ')))
            AS BIGINT) AS n_tok_vec
FROM t8
GROUP BY lang
ORDER BY lang
"""
)


_HYBRID_TOPN = 20
_HYBRID_RRF_K = 60


def hybrid_retrieval_rrf_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (round 13): the fusion step every production
    search stack runs over its lexical and semantic legs — BM25 top-20
    (operators/search.py, the 3-term query) and hashed-embedding
    cosine top-20 (operators/text.py signed-hashing embeddings, query
    = the same terms as one string) combined by reciprocal-rank fusion
    (``rrf_fuse``, Cormack et al. 2009, k=60). Both legs are already
    individually oracle-replayable; this query proves the COMPOSITION:
    per-leg ranks are deterministic cross-engine (BM25 rounded to 6dp,
    cosine floor-quantized to q6 — both with doc_id tie-break), the
    RRF sum is two correctly-rounded divisions and one addition, and
    the DuckDB oracle replays everything — tokenization, df/dl stats,
    the saturation term, the full signed-hashing embedding of corpus
    AND query, both rank windows, the fusion arithmetic. Emits the
    fused top-10 with each leg's rank (NULL where a doc appears in
    only one leg — the case RRF exists to handle)."""
    from neulix_datahub_spark.functions.ranking import ranked_topk
    from neulix_datahub_spark.operators.search import (
        bm25_rank,
        build_inverted_index,
        rrf_fuse,
    )
    from neulix_datahub_spark.operators.text import (
        hashed_embedding_table,
        hashed_ngram_embedding,
    )
    from neulix_datahub_spark.plans.queries_scale import _SEARCH_TERMS

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # lexical leg — the keyword_search_bm25 machinery (postings cached:
    # lengths, df stats, scoring and the corpus scalars all derive
    # from them; one cache entry per corpus via CacheManager dedupe)
    index = build_inverted_index(docs).persist()
    lengths = index.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # top-k FIRST via orderBy+limit (TakeOrderedAndProject — no global
    # window over the corpus), ranked on the DRIVER (20-row bounded
    # collect, ranked_topk): each leg feeds THREE consumers (the fusion
    # union + the rank join-backs), and the local relation serves all
    # of them without re-running the leg's pipeline or the eager
    # localCheckpoint + unpartitioned-WindowExec rank the old form paid
    lex = ranked_topk(
        bm25_rank(index, lengths, _SEARCH_TERMS)
        .select("doc_id", F.round("score", 6).alias("__s")),
        [F.desc("__s"), F.asc("doc_id")],
        _HYBRID_TOPN,
    ).select("doc_id", "rank")
    # semantic leg — corpus embeddings vs the query string's embedding
    # (both L2-normalized by construction, so cosine is a plain dot:
    # no norm division, no zero-vector edge)
    emb = hashed_embedding_table(docs, "text", "doc_id", dim=64, out_col="e")
    # the query vector evaluates ONCE on the driver and rides into the
    # per-row dot as a 64-float literal array — leaving it as a column
    # from a broadcast 1-row frame inlines the whole embedding fold
    # into the zip_with lambdas (the no-CSE-across-lambdas trap,
    # SCALE.md) and measured 18s instead of milliseconds at sf0.1
    qvec = (
        spark.createDataFrame([(" ".join(_SEARCH_TERMS),)], "qtext string")
        .select(hashed_ngram_embedding("qtext", dim=64).alias("qe"))
        .first()["qe"]
    )
    from neulix_datahub_spark.operators.similarity import (
        const_double_array,
    )

    qlit = const_double_array(qvec)
    dot = F.aggregate(
        F.zip_with(F.col("e"), qlit, lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    sem = ranked_topk(
        emb.select(
            "doc_id", F.floor(F.lit(1e6) * dot).cast("long").alias("__q6")
        ),
        [F.desc("__q6"), F.asc("doc_id")],
        _HYBRID_TOPN,
    ).select("doc_id", "rank")
    fused = rrf_fuse([lex, sem], id_col="doc_id", k=_HYBRID_RRF_K)
    # fused top-10 ranked the same driver-side way (the old form ranked
    # every fused row through an unpartitioned window, then filtered
    # rank <= 10 — identical output under the same total order)
    return (
        ranked_topk(
            fused.select("doc_id", F.round("rrf", 9).alias("rrf")),
            [F.desc("rrf"), F.asc("doc_id")],
            10,
        )
        .join(lex.withColumnRenamed("rank", "lex_rank"), "doc_id", "left")
        .join(sem.withColumnRenamed("rank", "sem_rank"), "doc_id", "left")
        .select(
            "rank",
            "doc_id",
            "rrf",
            F.col("lex_rank").cast("long").alias("lex_rank"),
            F.col("sem_rank").cast("long").alias("sem_rank"),
        )
        .orderBy("rank")
    )


_HYBRID_SQL = r"""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT -1 AS doc_id, 'spark table query' AS text
),
toks AS (
    SELECT doc_id, unnest(string_split(
        trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' ')) AS token
    FROM documents
),
idx AS (
    SELECT token, doc_id, count(*) AS tf FROM toks
    WHERE token != '' GROUP BY 1, 2
),
dl AS (SELECT doc_id, sum(tf) AS dl FROM idx GROUP BY 1),
stats AS (SELECT count(*) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
q AS (SELECT unnest(['spark', 'table', 'query']) AS token),
dfreq AS (
    SELECT token, count(DISTINCT doc_id) AS df
    FROM idx WHERE token IN (SELECT token FROM q) GROUP BY 1
),
scored AS (
    SELECT i.doc_id,
           sum(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * i.tf * (1.2 + 1.0)
               / (i.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))) AS score
    FROM idx i
    JOIN dfreq d USING (token)
    JOIN dl l USING (doc_id)
    CROSS JOIN stats s
    GROUP BY i.doc_id
),
lexrank AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY round(score, 6) DESC, doc_id ASC)
               AS rank
    FROM scored
    QUALIFY rank <= 20
),
feats AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 2
                THEN t || [t[i] || ' ' || t[i+1]
                           for i in generate_series(1, len(t) - 1)]
                ELSE t END AS f
    FROM (
        SELECT doc_id,
               COALESCE(string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' '), []) AS t
        FROM corpus
    )
),
emb AS MATERIALIZED (
    SELECT doc_id, e,
           sqrt(list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * x)))
               AS nrm
    FROM (
        SELECT doc_id,
               list_transform(range(0, 64), i -> CAST(COALESCE(list_sum(
                   list_transform(f, ff ->
                       CASE WHEN CAST('0x' || substr(md5('hemb:' || ff), 1, 8) AS BIGINT) % 64 = i
                            THEN 1 - 2 * (CAST('0x' || substr(md5('hemb:' || ff), 9, 1) AS BIGINT) % 2)
                            ELSE 0 END)), 0) AS BIGINT)) AS e
        FROM feats
    )
),
normed AS MATERIALIZED (
    SELECT doc_id,
           CASE WHEN nrm > 0
                THEN list_transform(e, x -> CAST(x AS DOUBLE) / nrm)
                ELSE list_transform(e, x -> CAST(x AS DOUBLE)) END AS e
    FROM emb
),
semrank AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY q6 DESC, doc_id ASC) AS rank
    FROM (
        SELECT d.doc_id,
               CAST(floor(1000000 * list_sum(
                   list_transform(range(1, len(d.e) + 1),
                                  i -> d.e[i] * qv.e[i]))) AS BIGINT) AS q6
        FROM normed d, (SELECT e FROM normed WHERE doc_id = -1) qv
        WHERE d.doc_id >= 0
    )
    QUALIFY rank <= 20
),
fused AS (
    SELECT doc_id, round(sum(1.0 / (60.0 + rank)), 9) AS rrf
    FROM (
        SELECT doc_id, rank FROM lexrank
        UNION ALL
        SELECT doc_id, rank FROM semrank
    )
    GROUP BY doc_id
),
top AS (
    SELECT doc_id, rrf,
           row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rank
    FROM fused
    QUALIFY rank <= 10
)
SELECT t.rank, t.doc_id, t.rrf,
       CAST(l.rank AS BIGINT) AS lex_rank,
       CAST(s.rank AS BIGINT) AS sem_rank
FROM top t
LEFT JOIN lexrank l USING (doc_id)
LEFT JOIN semrank s USING (doc_id)
ORDER BY t.rank
"""


_MMR_K = 10
_MMR_TOPN = 20
_MMR_LAM_NUM = 7
_MMR_LAM_DEN = 10


def mmr_diversified_retrieval_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified retrieval (round 13): Maximal Marginal Relevance
    (``operators/similarity.mmr_rerank``) over the semantic top-20 —
    the post-retrieval step that stops near-duplicate hits from
    monopolizing the answer. Relevance is the q6-quantized inner
    product against the query embedding (hashed signed-hashing, both
    sides L2-normalized); pair redundancy is the q6 inner product
    between candidates (one bounded 20×20 self-join); the greedy runs
    in exact INTEGER arithmetic (λ = 7/10 as the comparison
    ``7·rel − 3·max_sim``, min-id tie-break), so the DuckDB oracle
    replays the embeddings, the candidate window, all pair products,
    and every one of the 10 greedy steps UNROLLED as CTEs — nothing
    pinned. Emits each pick with the redundancy penalty it paid and
    its plain-relevance rank (the reordering is the point)."""
    from pyspark.sql import Window

    from neulix_datahub_spark.operators.similarity import mmr_rerank
    from neulix_datahub_spark.operators.text import (
        hashed_embedding_table,
        hashed_ngram_embedding,
    )
    from neulix_datahub_spark.plans.queries_scale import _SEARCH_TERMS

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = hashed_embedding_table(docs, "text", "doc_id", dim=64, out_col="e")
    qvec = (
        spark.createDataFrame([(" ".join(_SEARCH_TERMS),)], "qtext string")
        .select(hashed_ngram_embedding("qtext", dim=64).alias("qe"))
        .first()["qe"]
    )
    from neulix_datahub_spark.operators.similarity import (
        const_double_array,
    )

    qlit = const_double_array(qvec)
    dot = F.aggregate(
        F.zip_with(F.col("e"), qlit, lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    from neulix_datahub_spark.functions.ranking import ranked_topk

    # bounded top-N candidate set ranked on the driver: the local
    # relation replaces the eager localCheckpoint pin AND the
    # unpartitioned-WindowExec rel_rank (same total order, same ranks)
    cand = ranked_topk(
        emb.select(
            "doc_id",
            F.floor(F.lit(1e6) * dot).cast("long").alias("rel_q6"),
            "e",
        ),
        [F.desc("rel_q6"), F.asc("doc_id")],
        _MMR_TOPN,
        rank_col="rel_rank",
    )
    rel_rank = cand.select("doc_id", "rel_rank")
    picks = mmr_rerank(
        cand.drop("rel_rank"),
        "rel_q6",
        "e",
        id_col="doc_id",
        k=_MMR_K,
        lam_num=_MMR_LAM_NUM,
        lam_den=_MMR_LAM_DEN,
    )
    return (
        picks.join(rel_rank, "doc_id")
        .select(
            F.col("mmr_rank").cast("long").alias("mmr_rank"),
            "doc_id",
            "rel_q6",
            "penalty_q6",
            F.col("rel_rank").cast("long").alias("rel_rank"),
        )
        .orderBy("mmr_rank")
    )


def _mmr_sql() -> str:
    """The MMR oracle: embeddings + candidate window + pair products,
    then the greedy UNROLLED — one (scored, pick, picked) CTE triple
    per step, exactly the integer comparison the engine runs."""
    head = r"""
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT -1 AS doc_id, 'spark table query' AS text
),
feats AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 2
                THEN t || [t[i] || ' ' || t[i+1]
                           for i in generate_series(1, len(t) - 1)]
                ELSE t END AS f
    FROM (
        SELECT doc_id,
               COALESCE(string_split(trim(regexp_replace(lower(text), '[ \t\n\v\f\r]+', ' ', 'g')), ' '), []) AS t
        FROM corpus
    )
),
emb AS MATERIALIZED (
    SELECT doc_id, e,
           sqrt(list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * x)))
               AS nrm
    FROM (
        SELECT doc_id,
               list_transform(range(0, 64), i -> CAST(COALESCE(list_sum(
                   list_transform(f, ff ->
                       CASE WHEN CAST('0x' || substr(md5('hemb:' || ff), 1, 8) AS BIGINT) % 64 = i
                            THEN 1 - 2 * (CAST('0x' || substr(md5('hemb:' || ff), 9, 1) AS BIGINT) % 2)
                            ELSE 0 END)), 0) AS BIGINT)) AS e
        FROM feats
    )
),
normed AS MATERIALIZED (
    SELECT doc_id,
           CASE WHEN nrm > 0
                THEN list_transform(e, x -> CAST(x AS DOUBLE) / nrm)
                ELSE list_transform(e, x -> CAST(x AS DOUBLE)) END AS e
    FROM emb
),
cand AS MATERIALIZED (
    SELECT doc_id, rel_q6, e,
           row_number() OVER (ORDER BY rel_q6 DESC, doc_id ASC) AS rel_rank
    FROM (
        SELECT d.doc_id,
               CAST(floor(1000000 * list_sum(
                   list_transform(range(1, len(d.e) + 1),
                                  i -> d.e[i] * qv.e[i]))) AS BIGINT)
                   AS rel_q6,
               d.e
        FROM normed d, (SELECT e FROM normed WHERE doc_id = -1) qv
        WHERE d.doc_id >= 0
    )
    QUALIFY rel_rank <= 20
),
pairsym AS MATERIALIZED (
    SELECT a.doc_id AS i, b.doc_id AS j,
           CAST(floor(1000000 * list_sum(
               list_transform(range(1, len(a.e) + 1),
                              i2 -> a.e[i2] * b.e[i2]))) AS BIGINT) AS s
    FROM cand a, cand b WHERE a.doc_id != b.doc_id
),
picked_0 AS (SELECT CAST(NULL AS BIGINT) AS doc_id WHERE FALSE)"""
    steps = []
    for i in range(1, _MMR_K + 1):
        # every per-step CTE is MATERIALIZED: inlined CTEs would expand
        # the previous level at each of its ~3 reference sites — a
        # 3^k-deep plan tree by step k (measured: the un-materialized
        # spelling never finished planning at k=10)
        steps.append(f""",
scored_{i} AS MATERIALIZED (
    SELECT c.doc_id, c.rel_q6,
           COALESCE((SELECT max(p.s) FROM pairsym p
                     WHERE p.i = c.doc_id
                       AND p.j IN (SELECT doc_id FROM picked_{i - 1})), 0)
               AS pen
    FROM cand c
    WHERE c.doc_id NOT IN (SELECT doc_id FROM picked_{i - 1})
),
pick_{i} AS MATERIALIZED (
    SELECT doc_id, rel_q6, pen, {i} AS mmr_rank
    FROM scored_{i}
    ORDER BY {_MMR_LAM_NUM} * rel_q6
             - {_MMR_LAM_DEN - _MMR_LAM_NUM} * pen DESC, doc_id ASC
    LIMIT 1
),
picked_{i} AS MATERIALIZED (
    SELECT doc_id FROM picked_{i - 1}
    UNION ALL SELECT doc_id FROM pick_{i}
)""")
        steps.append("")
    picks_union = "\nUNION ALL\n".join(
        f"    SELECT * FROM pick_{i}" for i in range(1, _MMR_K + 1)
    )
    tail = f""",
all_picks AS (
{picks_union}
)
SELECT CAST(p.mmr_rank AS BIGINT) AS mmr_rank, p.doc_id, p.rel_q6,
       CAST(p.pen AS BIGINT) AS penalty_q6,
       CAST(c.rel_rank AS BIGINT) AS rel_rank
FROM all_picks p JOIN cand c USING (doc_id)
ORDER BY p.mmr_rank
"""
    return head + "".join(steps) + tail


_MMR_SQL = _mmr_sql()


LLM_QUERIES = {
    "mmr_diversified_retrieval_check": (
        mmr_diversified_retrieval_check,
        _MMR_SQL,
        "MMR diversified re-rank: integer greedy over q6 relevance + "
        "pair redundancy, all 10 steps unrolled in the oracle",
    ),
    "classifier_eval_metrics": (
        classifier_eval_metrics,
        _EVAL_METRICS_SQL,
        "holdout per-class precision/recall/F1 (single-division q6 "
        "integers) + decile calibration table, GD fully unrolled",
    ),
    "hybrid_retrieval_rrf_check": (
        hybrid_retrieval_rrf_check,
        _HYBRID_SQL,
        "hybrid search: BM25 + hashed-embedding cosine legs fused by "
        "reciprocal-rank fusion, both legs + fusion fully replayed",
    ),
    "bpe_batched_vocab_stats": (
        bpe_batched_vocab_stats,
        _BPE_BATCHED_SQL,
        "tokenizer tier at scale: 300+-merge batched training run, oracle replays "
        "every round incl. the greedy-maximal selection rule",
    ),
    "bpe_apply_parity_stats": (
        bpe_apply_parity_stats,
        _BPE_APPLY_PARITY_SQL,
        "tokenizer tier: fold-chain vs vectorized mapInPandas apply parity, "
        "oracle-pinned per lang",
    ),
    "bpe_vocab_coverage_stats": (
        bpe_vocab_coverage_stats,
        _BPE_COVERAGE_SQL,
        "tokenizer eval: top-20 vocabulary coverage curve (Zipf sanity check), "
        "oracle replays training and the ranked cumulative shares",
    ),
    "bpe_batched_tokenize_stats": (
        bpe_batched_tokenize_stats,
        _BPE_BATCHED_APPLY_SQL,
        "tokenizer tier at scale: vectorized apply of the 313-merge batched "
        "vocab, oracle reads the same stats off the replayed final vocabulary",
    ),
    "bpe_tokenize_stats": (
        bpe_tokenize_stats,
        _BPE_TOKENIZE_SQL,
        "tokenizer tier: learned-merge segmentation over the corpus, train+apply oracle",
    ),
    "udtf_chunk_parity_stats": (
        udtf_chunk_parity_stats,
        _UDTF_CHUNK_SQL,
        "U4: Python UDTF lateral chunking, row-identical to the expression form",
    ),
    "bpe_merges_check": (
        bpe_merges_check,
        _BPE_SQL,
        "tokenizer tier: distributed BPE merge learning, oracle replays the full training run",
    ),
    "bloom_decontamination_stats": (
        bloom_decontamination_stats,
        _BLOOM_DECON_SQL,
        "L4+/sketch: portable-Bloom decontamination prefilter, FP-audited",
    ),
    "temperature_mixture_stats": (
        temperature_mixture_stats,
        _TEMPERATURE_MIX_SQL,
        "curation: temperature (alpha=0.5) mixture sampling, id-sum pinned",
    ),
    "winnow_overlap_stats": (
        winnow_overlap_stats,
        _WINNOW_SQL,
        "L4 winnowing (MOSS rolling-hash) fingerprints, oracle-pinned overlap",
    ),
    "unigram_perplexity_by_lang": (
        unigram_perplexity_by_lang,
        _PERPLEXITY_SQL,
        "L4+ unigram-LM perplexity quality filter (CCNet recipe)",
    ),
    "duplicate_passage_stats": (
        duplicate_passage_stats,
        _DUP_PASSAGE_SQL,
        "L2+ exact-substring (passage) dedup signal",
    ),
    "passage_scrub_stats": (
        passage_scrub_stats,
        _PASSAGE_SCRUB_SQL,
        "L2+ exact-substring dedup REMOVAL: interval-merged passages "
        "excised, output content checksummed",
    ),
    "contamination_scrub_stats": (
        contamination_scrub_stats,
        _CONTAM_SCRUB_SQL,
        "L4+ span-grain decontamination: benchmark-matching passages "
        "excised instead of dropping documents",
    ),
    "incremental_passage_scrub_stats": (
        incremental_passage_scrub_stats,
        _PASSAGE_SCRUB_SQL,
        "L2+ incremental: persisted gram-count index + delta ingest "
        "== full-corpus passage scrub (oracle is the from-scratch SQL)",
    ),
    "tfidf_top20": (tfidf_top20, _TFIDF_SQL, "L4 TF-IDF"),
    "pii_scrub_stats": (pii_scrub_stats, _PII_SQL, "L4+ PII detect/scrub"),
    "word_repetition_by_lang": (
        word_repetition_by_lang,
        _REPETITION_SQL,
        "L4+ Gopher-style repetition signal",
    ),
    "minhash_verified_pairs": (
        minhash_verified_pairs,
        _MINHASH_VERIFIED_SQL,
        "L2 LSH candidates + exact-Jaccard verify",
    ),
    "simhash_invariance": (
        simhash_invariance,
        _SIMHASH_INVARIANCE_SQL,
        "L2 SimHash/MinHash normalization invariance",
    ),
    "token_pack_summary": (token_pack_summary, _PACK_SQL, "L4+ concat-chunk packing"),
    "doc_chunk_stats": (
        doc_chunk_stats,
        _CHUNK_SQL,
        "L4+ sliding-window chunking (64-token windows, 8 overlap)",
    ),
    "char_entropy_by_lang": (
        char_entropy_by_lang,
        _CHAR_ENTROPY_SQL,
        "L4+ char-entropy quality signal",
    ),
    "mixing_sample_counts": (
        mixing_sample_counts,
        _MIXING_SQL,
        "L4+ content-hash mixing sampler",
    ),
    "token_budget_waterfall": (
        token_budget_waterfall,
        _WATERFALL_SQL,
        "L7 token-budget epoch planner: sqrt-temperature water-filling "
        "with integer-exact cap decisions",
    ),
    "epoch_plan_materialization_stats": (
        epoch_plan_materialization_stats,
        _EPOCH_MATERIALIZE_SQL,
        "L7 epoch-plan materialization: full epochs + content-hash "
        "fractional epoch, never overshooting the allocation",
    ),
    "epoch_shuffle_order": (
        epoch_shuffle_order,
        _EPOCH_SHUFFLE_SQL,
        "L7 deterministic training-order shuffle over the epoch "
        "multiset (two-phase global rank, order-weighted checksum)",
    ),
    "hashed_embedding_similarity_check": (
        hashed_embedding_similarity_check,
        _HASHED_EMB_SQL,
        "L3/L4 bridge: md5-portable signed-hashing text embeddings; "
        "planted-pair vs mismatched-pair cosine separation, exact "
        "fixed-point sums",
    ),
    "trained_classifier_stats": (
        trained_classifier_stats,
        _TRAINED_CLASSIFIER_SQL,
        "L4+ in-engine logistic-regression TRAINING (10 GD iterations, "
        "fixed-point gradients; oracle replays every step)",
    ),
    "classifier_holdout_stats": (
        classifier_holdout_stats,
        _HOLDOUT_CLASSIFIER_SQL,
        "L4+ leakage-safe evaluation: content-hash 80/20 split, train "
        "on train only, holdout accuracy oracle-replayed",
    ),
    "classifier_refresh_stats": (
        classifier_refresh_stats,
        _REFRESH_CLASSIFIER_SQL,
        "L4+ incremental classifier refresh: sidecar-committed warm "
        "start, two-phase GD oracle-replayed, round-trip pinned exact",
    ),
    "classifier_minibatch_stats": (
        classifier_minibatch_stats,
        _MINIBATCH_CLASSIFIER_SQL,
        "L4+ mini-batch SGD: content-hash batch schedule, 8 one-step "
        "phases with per-batch n, full trajectory oracle-replayed",
    ),
    "contamination_by_lang": (
        contamination_by_lang,
        _CONTAMINATION_SQL,
        "L4+ benchmark n-gram decontamination",
    ),
    "boilerplate_removal_stats": (
        boilerplate_removal_stats,
        _BOILERPLATE_SQL,
        "L4+ C4-style boilerplate-line removal",
    ),
    "ngram_jaccard_docs": (ngram_jaccard_docs, _NGRAM_JACCARD_SQL, "L2 n-gram Jaccard"),
    "embedding_near_dup": (
        embedding_near_dup,
        _EMBEDDING_NEAR_DUP_SQL,
        "L2/L3 cosine near-dup",
    ),
    # Tail-registered round-2 additions: past the driver's ~50-entry
    # window this round; rotate into _PRIORITY_R3 next round.
    "stratified_sample_summary": (
        stratified_sample_summary,
        _STRATIFIED_SQL,
        "L4+ hash-ranked top-n per stratum",
    ),
    "source_mixing_profile": (
        source_mixing_profile,
        _SOURCE_MIXING_SQL,
        "L4+ per-source mixing weights",
    ),
    "dup_bigram_by_lang": (
        dup_bigram_by_lang,
        _DUP_BIGRAM_SQL,
        "L4+ Gopher duplicate-bigram fraction",
    ),
    "embedding_centroid_profile": (
        embedding_centroid_profile,
        _CENTROID_SQL,
        "L3+ per-label embedding centroids",
    ),
    "centroid_outliers_by_label": (
        centroid_outliers_by_label,
        _CENTROID_OUTLIER_SQL,
        "L3+ centroid-distance outlier signal",
    ),
    "semantic_dedup_pairs": (
        semantic_dedup_pairs,
        _SEMANTIC_DEDUP_SQL,
        "L2/L3 embedding-recall + text-verify near-dup",
    ),
    "incremental_semantic_dedup_stats": (
        incremental_semantic_dedup_stats,
        _INCR_SEMANTIC_SQL,
        "L2/L3 incremental: persisted vector index + delta ingest == full dedup",
    ),
    "banded_semantic_dedup_stats": (
        banded_semantic_dedup_stats,
        _BANDED_SEMANTIC_SQL,
        "L2/L3 incremental, 100 TB shape: sign-LSH banded candidate join "
        "== exact closure (recall 1.0 at these parameters, measured)",
    ),
    "quantization_error_profile": (
        quantization_error_profile,
        _QUANTIZATION_SQL,
        "L3+ int8 scalar quantization round-trip bound",
    ),
    "kmeans_cluster_profile": (
        kmeans_cluster_profile,
        _KMEANS_SQL,
        "L3+ distributed Lloyd k-means (oracle replays the full run)",
    ),
    "pca_embedding_check": (
        pca_embedding_check,
        _PCA_SQL,
        "L3+ exact distributed PCA (Gram partials), self-verdict oracle",
    ),
    "bigram_perplexity_by_lang": (
        bigram_perplexity_by_lang,
        _BIGRAM_PPL_SQL,
        "L4+ interpolated bigram-LM perplexity, oracle retrains the LM",
    ),
    "cluster_split_stats": (
        cluster_split_stats,
        _CLUSTER_SPLIT_SQL,
        "L2+ near-dup-leakage-safe cluster-keyed train/eval split",
    ),
    "pca_merge_check": (
        pca_merge_check,
        _PCA_MERGE_SQL,
        "PCA Gram-partial mergeability (shard sums == one-shot spectrum)",
    ),
    "unicode_normalization_stats": (
        unicode_normalization_stats,
        _NFC_SQL,
        "L4 vectorized pandas-UDF NFC normalization vs native oracle",
    ),
}
