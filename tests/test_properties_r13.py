"""Round-13 hypothesis properties for the search/retrieval tier:
token_bucket is the exact Python twin of the at-rest partition key on
arbitrary unicode tokens; rrf_fuse is list-order invariant, matches
the scalar definition, and never invents documents; the BM25 index
exactness theorem holds on arbitrary generated corpora (not just the
hand fixtures)."""

from __future__ import annotations

import zlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# tokens as the tokenizer can actually produce them: non-empty,
# whitespace-free (the split guarantees it), any other unicode
_token = st.text(
    st.characters(blacklist_categories=("Zs", "Zl", "Zp", "Cc", "Cs")),
    min_size=1,
    max_size=12,
)


@given(toks=st.lists(_token, min_size=1, max_size=20, unique=True))
@settings(max_examples=8, deadline=None)
def test_token_bucket_twin_property(spark, toks):
    from neulix_datahub_spark.operators.search_index import token_bucket

    df = spark.createDataFrame([(t,) for t in toks], "token string")
    got = {
        r["token"]: r["b"]
        for r in df.select(
            "token",
            F.pmod(F.crc32(F.col("token")), F.lit(32)).cast("int").alias("b"),
        ).collect()
    }
    want = {t: zlib.crc32(t.encode("utf-8")) % 32 for t in toks}
    assert got == want
    assert got == {t: token_bucket(t, 32) for t in toks}


@given(
    ranks_a=st.lists(
        st.integers(1, 30), min_size=0, max_size=10, unique=True
    ),
    ranks_b=st.lists(
        st.integers(1, 30), min_size=0, max_size=10, unique=True
    ),
    k=st.integers(1, 100),
)
@settings(max_examples=8, deadline=None)
def test_rrf_fuse_matches_scalar_definition(spark, ranks_a, ranks_b, k):
    """rrf(d) == Σ 1/(k + rank_list(d)) computed in plain Python, list
    order does not matter, and the output id set is exactly the union
    of the input id sets."""
    from neulix_datahub_spark.operators.search import rrf_fuse

    # doc ids chosen so the lists overlap partially: list A ranks doc
    # r at rank r; list B ranks doc r+5 at rank r
    a = [(r, r) for r in ranks_a]
    b = [(r + 5, r) for r in ranks_b]
    if not a and not b:
        return
    dfa = spark.createDataFrame(a or [(None, None)], "doc_id long, rank long")
    dfb = spark.createDataFrame(b or [(None, None)], "doc_id long, rank long")
    dfa = dfa.filter(F.col("doc_id").isNotNull())
    dfb = dfb.filter(F.col("doc_id").isNotNull())

    got = {
        r["doc_id"]: r["rrf"]
        for r in rrf_fuse([dfa, dfb], k=k).collect()
    }
    flipped = {
        r["doc_id"]: r["rrf"]
        for r in rrf_fuse([dfb, dfa], k=k).collect()
    }
    want: dict[int, float] = {}
    for doc, rank in a + b:
        want[doc] = want.get(doc, 0.0) + 1.0 / (k + rank)
    assert set(got) == set(want)
    assert got == flipped
    for doc, v in want.items():
        # ≤2 terms: float addition is commutative, so equality is exact
        assert got[doc] == v


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["red", "blue", "fox", "dog", "run", "x"]),
            min_size=0,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=12,
    ),
    split_at=st.integers(0, 12),
)
@settings(max_examples=6, deadline=None)
def test_search_index_exactness_property(spark, tmp_path_factory, texts, split_at):
    """build(A)+ingest(B) == build(A∪B) on ARBITRARY corpora — at-rest
    postings rows, doclens rows and unrounded query scores all
    bit-identical, wherever the prior/delta split lands (including
    empty delta and empty prior slices)."""
    from neulix_datahub_spark.operators.search_index import (
        build_search_index,
        ingest_search_delta,
        query_search_index,
        read_live_doclens,
        read_live_postings,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    cut = min(split_at, len(rows))
    prior, delta = rows[:cut], rows[cut:]
    if not prior:
        prior, delta = delta, prior
    if not prior:
        return
    base = tmp_path_factory.mktemp("sidx")
    inc, full = str(base / "inc"), str(base / "full")
    schema = "doc_id long, text string"
    build_search_index(spark.createDataFrame(prior, schema), inc)
    if delta:
        ingest_search_delta(spark, spark.createDataFrame(delta, schema), inc)
    build_search_index(spark.createDataFrame(rows, schema), full)

    for reader in (read_live_postings, read_live_doclens):
        assert sorted(map(tuple, reader(spark, inc).collect())) == sorted(
            map(tuple, reader(spark, full).collect())
        )
    got = sorted(
        map(tuple, query_search_index(spark, inc, ["fox", "dog"]).collect())
    )
    want = sorted(
        map(tuple, query_search_index(spark, full, ["fox", "dog"]).collect())
    )
    assert got == want


def _cand_df(spark, rows):
    # (doc_id, rel_q6, unit vec)
    return spark.createDataFrame(
        rows, "doc_id long, rel_q6 long, e array<double>"
    )


def test_mmr_rerank_planted_redundancy(spark):
    """Two near-identical top docs: plain relevance ranks them 1-2;
    MMR must demote the duplicate below a less-relevant-but-novel
    doc. Integer arithmetic end-to-end, min-id tie-break."""
    from neulix_datahub_spark.operators.similarity import mmr_rerank

    e1 = [1.0, 0.0, 0.0]
    e1b = [1.0, 0.0, 0.0]          # exact duplicate direction of e1
    e2 = [0.0, 1.0, 0.0]           # orthogonal, lower relevance
    rows = [(1, 1_000_000, e1), (2, 990_000, e1b), (3, 500_000, e2)]
    got = [
        (r["mmr_rank"], r["doc_id"], r["penalty_q6"])
        for r in mmr_rerank(
            _cand_df(spark, rows), "rel_q6", "e", k=3
        ).orderBy("mmr_rank").collect()
    ]
    # pick1: doc 1 (max rel, penalty 0); pick2: doc 2 pays sim 1.0
    # (7*990000 - 3*1000000 = 3.93M) vs doc 3 (7*500000 - 0 = 3.5M) →
    # doc 2 still wins; pick3: doc 3. With a harsher λ the duplicate
    # loses — verified below.
    assert got == [(1, 1, 0), (2, 2, 1_000_000), (3, 3, 0)]

    harsh = [
        (r["mmr_rank"], r["doc_id"])
        for r in mmr_rerank(
            _cand_df(spark, rows), "rel_q6", "e", k=3,
            lam_num=1, lam_den=2,
        ).orderBy("mmr_rank").collect()
    ]
    # λ=1/2: doc 2 scores 990000-1000000 < 0; doc 3 scores 500000 →
    # the novel doc outranks the duplicate
    assert harsh == [(1, 1), (2, 3), (3, 2)]


@given(
    rels=st.lists(
        st.integers(0, 1_000_000), min_size=1, max_size=8, unique=True
    )
)
@settings(max_examples=6, deadline=None)
def test_mmr_lambda_one_is_pure_relevance(spark, rels):
    """λ = 1 (lam_num == lam_den) ignores redundancy entirely: the MMR
    order must equal the (rel desc, id asc) order on any candidates."""
    from neulix_datahub_spark.operators.similarity import mmr_rerank

    rows = [
        (i, r, [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0])
        for i, r in enumerate(rels)
    ]
    got = [
        r["doc_id"]
        for r in mmr_rerank(
            _cand_df(spark, rows), "rel_q6", "e",
            k=len(rows), lam_num=1, lam_den=1,
        ).orderBy("mmr_rank").collect()
    ]
    want = [i for i, _ in sorted(enumerate(rels), key=lambda t: (-t[1], t[0]))]
    assert got == want


def test_keyword_snippets_semantics(spark):
    """Max-coverage anchored window, earliest-anchor ties, clamped
    slice at doc end, no-hit docs excluded, snippet text comes from
    the index's own normalized tokenization."""
    from neulix_datahub_spark.operators.search import keyword_snippets

    docs = spark.createDataFrame(
        [
            # hits at 0 and 2 cluster; a lone hit at 9: the window
            # [0..4] covers 2 hits and wins over [9..13]'s 1
            (1, "red x red y z a b c d red"),
            # tie on coverage (two isolated hits) → earliest anchor
            (2, "a red b c d e f g h i j red"),
            # hit at the last token: slice clamps, snippet is short
            (3, "a b c d e red"),
            (4, "no matching tokens here"),
            (5, "  Red   UPPER case  "),  # normalization applies
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_hits"], r["anchor_pos"], r["covered"], r["snippet"]
        )
        for r in keyword_snippets(docs, ["red"], window=2).collect()
    }
    assert set(got) == {1, 2, 3, 5}
    assert got[1] == (3, 0, 2, "red x red y z")
    assert got[2] == (2, 1, 1, "red b c d e")
    assert got[3] == (1, 5, 1, "red")
    assert got[5] == (1, 0, 1, "red upper case")
