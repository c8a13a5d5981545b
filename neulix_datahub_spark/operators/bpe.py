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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neulix_datahub_spark.operators.dedupe import normalize_text

# Reserved symbol delimiter. A text character equal to it degenerates
# to an empty symbol and is dropped from the symbol stream — in BOTH
# engines identically (same construction), so parity holds; corpora
# that legitimately contain 0x1f should be scrubbed upstream (it is a
# C0 control code no tokenizer wants as a symbol anyway).
US = "\x1f"


def _symbolize(word: Column) -> Column:
    """``'abc'`` → ``'␟a␟b␟c␟'``: one delimiter around every symbol, so
    a pair pattern ``␟a␟b␟`` can never match across a symbol boundary
    (a symbol *ending* in ``a`` followed by ``b`` does not contain the
    delimited pattern)."""
    return F.concat(F.lit(US), F.regexp_replace(word, "(.)", f"$1{US}"))


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
            _merge_fold(F.col("sym"), a, b).alias("sym"), "n"
        ).localCheckpoint(eager=True)
    return merges


def bpe_segment(text: Column, merges: list[dict]) -> Column:
    """Apply a learned merge list to whitespace-tokenized text: returns
    the per-document symbol array after replaying every merge in rank
    order — the APPLY side of the trainer, one chained narrow fold per
    merge (no UDF, no shuffle). The space stays in the symbol stream as
    a barrier symbol (merge sides come from space-split words, so no
    pair ever involves it) and is dropped at the end — merges can never
    cross a word boundary."""
    norm = normalize_text(text)
    s = F.concat(F.lit(US), F.regexp_replace(norm, "(.)", f"$1{US}"))
    for m in merges:
        s = _merge_fold(s, m["left"], m["right"])
    return F.filter(F.split(s, US), lambda x: (x != "") & (x != " "))
