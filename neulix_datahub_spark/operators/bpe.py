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
3. **Merge rewrite** — one ``replace`` of ``␟a␟b␟`` with ``␟ab␟`` per
   word. String ``replace`` scans left-to-right non-overlapping in
   every engine — exactly BPE's greedy leftmost-non-overlapping merge
   (``aaa`` + merge (a,a) → ``aa a``, never ``a aa`` or ``aaa``), and
   the replacement re-inserts both delimiters so symbol boundaries
   survive consumption by an adjacent match.

Every step is engine-portable (regexp char-split, string replace,
integer counts, lexicographic tie-break), so an external SQL engine
replays the identical merge sequence — the driver oracle for
``bpe_merges_check`` unrolls the rounds as CTEs and must land on the
same merges, counts included.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neulix_datahub_spark.operators.dedupe import normalize_text

US = "\x1f"


def _symbolize(word: Column) -> Column:
    """``'abc'`` → ``'␟a␟b␟c␟'``: one delimiter around every symbol, so
    a pair pattern ``␟a␟b␟`` can never match across a symbol boundary
    (a symbol *ending* in ``a`` followed by ``b`` does not contain the
    delimited pattern)."""
    return F.concat(F.lit(US), F.regexp_replace(word, "(.)", f"$1{US}"))


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus's (word, count) relation — BPE's working set. One
    scan, one map-side-combined groupBy; output is bounded by the
    vocabulary."""
    norm = normalize_text(F.col(text_col))
    return (
        df.select(F.explode(F.split(norm, " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word count: ``(a, b, c)``."""
    syms = F.filter(F.split("sym", US), lambda x: x != "")
    pairs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(syms) - 1, F.lit(0))),
        lambda i: F.struct(
            F.element_at(syms, i).alias("a"),
            F.element_at(syms, i + 1).alias("b"),
        ),
    )
    return (
        words.filter(F.size(syms) >= 2)
        .select(F.explode(pairs).alias("p"), "n")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("c"))
    )


def bpe_learn_merges(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> list[dict]:
    """Learn ``n_merges`` BPE merges over the corpus. Returns the merge
    list (rank order): ``{rank, left, right, merged, pair_count}``.

    Driver loop is O(n_merges) with ONE collected row per round; every
    per-round computation is a distributed aggregate over the
    vocabulary relation (localCheckpoint'd once — the iteration
    invariant, same as connected_components' edge list). Stops early
    when no adjacent pair remains (vocabulary fully merged)."""
    words = (
        word_counts(df, text_col)
        .select(_symbolize(F.col("word")).alias("sym"), "n")
        .localCheckpoint(eager=True)
    )
    merges: list[dict] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()  # bounded: one row per round
        )
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["c"])
        merges.append(
            {"rank": rank, "left": a, "right": b, "merged": a + b,
             "pair_count": c}
        )
        words = words.select(
            F.replace(
                F.col("sym"),
                F.lit(f"{US}{a}{US}{b}{US}"),
                F.lit(f"{US}{a}{b}{US}"),
            ).alias("sym"),
            "n",
        ).localCheckpoint(eager=True)
    return merges


def bpe_segment(text: Column, merges: list[dict]) -> Column:
    """Apply a learned merge list to whitespace-tokenized text: returns
    the per-document symbol array after replaying every merge in rank
    order — the APPLY side of the trainer, one chained narrow
    expression per merge (no UDF, no shuffle). Word boundaries are
    double delimiters, so merges never cross words."""
    norm = normalize_text(text)
    s = F.concat(F.lit(US), F.regexp_replace(norm, "(.)", f"$1{US}"))
    # a space is itself a delimited symbol; remove it so words are
    # separated by a double delimiter no pair pattern can span
    s = F.replace(s, F.lit(f"{US} {US}"), F.lit(f"{US}{US}"))
    for m in merges:
        s = F.replace(
            s,
            F.lit(f"{US}{m['left']}{US}{m['right']}{US}"),
            F.lit(f"{US}{m['merged']}{US}"),
        )
    return F.filter(F.split(s, US), lambda x: x != "")
