"""Persisted incremental BM25 search index (round 13): the exactness
theorem build(A)+ingest(B) == build(A∪B) BIT-identically (no frozen
parameters — the strong claim the ANN family cannot make); re-ingest
adds nothing; orphan fragments are swept; deletes are scoring-exact
and final-until-compaction; compaction is a pure rewrite; the crc32
bucket twin matches Spark's partition key."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from neulix_datahub_spark.operators.search import (
    bm25_rank,
    build_inverted_index,
)
from neulix_datahub_spark.operators.search_index import (
    build_search_index,
    compact_search_index,
    conjunctive_search_index,
    delete_from_search_index,
    ingest_search_delta,
    query_search_index,
    read_live_doclens,
    read_live_postings,
    read_search_meta,
    token_bucket,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


_PRIOR = [
    (1, "spark shuffles the table on the join key"),
    (2, "a query plan prunes the table partitions"),
    (3, "broadcast the small table to every executor"),
    (4, "nothing relevant whatsoever here"),
    (5, ""),  # empty doc: ledger row with dl=0, invisible to scoring
]
_DELTA = [
    (101, "the query reads only the probed table buckets"),
    (102, "spark spark spark repeated for saturation"),
    (103, "   "),  # all-whitespace: dl=0 ledger row
]
_TERMS = ["spark", "table", "query"]


def _scores(spark, path, terms=_TERMS):
    return sorted(
        map(
            tuple,
            query_search_index(spark, path, terms)
            .select("doc_id", F.round("score", 9).alias("s"))
            .collect(),
        )
    )


def _postings_rows(spark, path):
    return sorted(
        map(
            tuple,
            read_live_postings(spark, path)
            .select("token", "id", "tf", "bkt")
            .collect(),
        )
    )


def test_incremental_equals_rebuild_exact(spark, tmp_path):
    """The headline theorem: every at-rest row AND every query score is
    identical between incremental maintenance and a from-scratch
    rebuild on the union — unrounded float equality on scores."""
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    build_search_index(_docs(spark, _PRIOR), inc)
    ingest_search_delta(spark, _docs(spark, _DELTA), inc)
    build_search_index(_docs(spark, _PRIOR + _DELTA), full)

    assert _postings_rows(spark, inc) == _postings_rows(spark, full)
    assert sorted(
        map(tuple, read_live_doclens(spark, inc).collect())
    ) == sorted(map(tuple, read_live_doclens(spark, full).collect()))
    got = sorted(
        map(tuple, query_search_index(spark, inc, _TERMS).collect())
    )
    want = sorted(
        map(tuple, query_search_index(spark, full, _TERMS).collect())
    )
    assert got == want  # bit-exact, no rounding


def test_matches_batch_tier_scoring(spark, tmp_path):
    """The index query == the in-memory batch tier (build_inverted_index
    + bm25_rank) on the same corpus — shared scoring code, same rows."""
    path = str(tmp_path / "idx")
    docs = _docs(spark, _PRIOR + _DELTA)
    build_search_index(_docs(spark, _PRIOR), path)
    ingest_search_delta(spark, _docs(spark, _DELTA), path)

    index = build_inverted_index(docs)
    lengths = index.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    want = sorted(
        map(
            tuple,
            bm25_rank(index, lengths, _TERMS)
            .select("doc_id", F.round("score", 9))
            .collect(),
        )
    )
    assert _scores(spark, path) == want


def test_reingest_is_noop(spark, tmp_path):
    path = str(tmp_path / "idx")
    build_search_index(_docs(spark, _PRIOR), path)
    st1 = ingest_search_delta(spark, _docs(spark, _DELTA), path)
    before = _postings_rows(spark, path)
    st2 = ingest_search_delta(spark, _docs(spark, _DELTA), path)
    assert st1["n_new"] == 3 and st2["n_new"] == 0
    assert st2["n_fragments"] == st1["n_fragments"]
    assert _postings_rows(spark, path) == before


def test_empty_doc_idempotence_via_ledger(spark, tmp_path):
    """Docs with zero kept tokens still land in the ledger (dl=0), so
    re-delivering them is a no-op and they never score."""
    path = str(tmp_path / "idx")
    build_search_index(_docs(spark, _PRIOR), path)
    lens = dict(
        (r["id"], r["dl"])
        for r in read_live_doclens(spark, path).collect()
    )
    assert lens[5] == 0 and len(lens) == 5
    st = ingest_search_delta(spark, _docs(spark, [(5, "")]), path)
    assert st["n_new"] == 0
    assert all(r[0] != 5 for r in _scores(spark, path))


def test_orphan_fragment_swept(spark, tmp_path):
    """A fragment written without its pointer bump (crash between the
    two) is invisible and gets removed by the next ingest."""
    path = str(tmp_path / "idx")
    build_search_index(_docs(spark, _PRIOR), path)
    meta = read_search_meta(path)
    orphan = os.path.join(path, "postings_v0", "frag=7")
    os.makedirs(orphan, exist_ok=True)
    before = _scores(spark, path)
    assert _scores(spark, path) == before  # orphan not read
    ingest_search_delta(spark, _docs(spark, _DELTA), path)
    assert not os.path.isdir(orphan)
    assert read_search_meta(path)["n_fragments"] == meta["n_fragments"] + 1


def test_delete_is_scoring_exact_and_final(spark, tmp_path):
    """Post-delete scores == rebuild without the deleted docs (df/N/
    avgdl all recomputed over live); re-ingest of a tombstoned id
    refuses until compaction, then works."""
    path, ref = str(tmp_path / "idx"), str(tmp_path / "ref")
    build_search_index(_docs(spark, _PRIOR), path)
    ingest_search_delta(spark, _docs(spark, _DELTA), path)
    dead = _docs(spark, [(2, "x"), (102, "x"), (999, "absent")]).select(
        "doc_id"
    )
    st = delete_from_search_index(spark, dead, path)
    assert st["n_tombstones"] == 3 and st["n_live"] == 6

    survivors = [r for r in _PRIOR + _DELTA if r[0] not in (2, 102)]
    build_search_index(_docs(spark, survivors), ref)
    assert _scores(spark, path) == _scores(spark, ref)

    with pytest.raises(ValueError, match="tombstoned"):
        ingest_search_delta(spark, _docs(spark, [(102, "back again")]), path)

    before = _scores(spark, path)
    compact_search_index(spark, path)
    assert _scores(spark, path) == before  # compaction invariant
    st2 = ingest_search_delta(
        spark, _docs(spark, [(102, "back again")]), path
    )
    assert st2["n_new"] == 1


def test_compact_purges_and_merges(spark, tmp_path):
    path = str(tmp_path / "idx")
    build_search_index(_docs(spark, _PRIOR), path)
    ingest_search_delta(spark, _docs(spark, _DELTA), path)
    delete_from_search_index(
        spark, _docs(spark, [(4, "x")]).select("doc_id"), path
    )
    log = compact_search_index(spark, path)
    meta = read_search_meta(path)
    assert log["fragments_before"] == 2 and log["fragments_after"] == 1
    assert meta["generation"] == 1 and meta["n_fragments"] == 1
    assert meta["n_docs"] == 7  # 8 ingested - 1 purged
    assert not os.path.isdir(os.path.join(path, "postings_v0"))
    assert not os.path.isdir(os.path.join(path, "tombs_v0"))
    assert all(r[0] != 4 for r in _postings_rows(spark, path))


def test_crc32_bucket_twin_matches_spark(spark):
    """The driver-side zlib.crc32 bucket MUST equal the at-rest
    partition key pmod(crc32(token), n) for pruning to be sound."""
    toks = ["spark", "table", "query", "a", "ünïcode", "x" * 50]
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    got = {
        r["token"]: r["b"]
        for r in df.select(
            "token",
            F.pmod(F.crc32(F.col("token")), F.lit(32)).cast("int").alias("b"),
        ).collect()
    }
    assert got == {t: token_bucket(t, 32) for t in toks}


def test_bucket_pruning_reads_only_query_buckets(spark, tmp_path):
    """The physical plan's partition filter carries the bkt IN (...)
    literal — non-queried token directories are never listed."""
    path = str(tmp_path / "idx")
    build_search_index(_docs(spark, _PRIOR), path, n_buckets=8)
    plan = (
        query_search_index(spark, path, ["spark"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    b = token_bucket("spark", 8)
    assert f"bkt#" in plan or "PartitionFilters" in plan
    assert f"[isnotnull(bkt" in plan or f"bkt" in plan
    # the stronger check: partition filter names exactly this bucket
    assert str(b) in plan


def test_stopwords_frozen_and_applied(spark, tmp_path):
    path = str(tmp_path / "idx")
    build_search_index(
        _docs(spark, _PRIOR), path, stopwords=["the", "a", "to"]
    )
    toks = {r["token"] for r in read_live_postings(spark, path).collect()}
    assert not toks & {"the", "a", "to"}
    assert read_search_meta(path)["stopwords"] == ["a", "the", "to"]
    # a stopword query term simply contributes nothing (OR semantics)
    rows = query_search_index(spark, path, ["the"]).collect()
    assert rows == []


def test_conjunctive_search_index(spark, tmp_path):
    path = str(tmp_path / "idx")
    build_search_index(_docs(spark, _PRIOR), path)
    ingest_search_delta(spark, _docs(spark, _DELTA), path)
    got = sorted(
        r["doc_id"]
        for r in conjunctive_search_index(
            spark, path, ["table", "query"]
        ).collect()
    )
    assert got == [2, 101]  # the only docs carrying BOTH terms
    assert conjunctive_search_index(spark, path, _TERMS).count() == 0


def test_duplicate_ids_rejected(spark, tmp_path):
    path = str(tmp_path / "idx")
    with pytest.raises(ValueError, match="duplicate"):
        build_search_index(
            _docs(spark, [(1, "x"), (1, "y")]), path
        )
    build_search_index(_docs(spark, _PRIOR), path)
    with pytest.raises(ValueError, match="duplicate"):
        ingest_search_delta(
            spark, _docs(spark, [(50, "x"), (50, "y")]), path
        )


def test_positional_phrase_lifecycle(spark, tmp_path):
    """Phrase retrieval against the at-rest positional family:
    incremental == rebuild, deletes respected, compaction preserves
    answers, non-positional indexes refuse clearly."""
    from neulix_datahub_spark.operators.search import (
        build_positional_index,
        phrase_search,
    )
    from neulix_datahub_spark.operators.search_index import (
        phrase_search_index,
    )

    rows = [
        (1, "the state of the art model"),
        (2, "state of the union address"),
        (3, "a state of the art result and state of the art speed"),
        (4, "art of the state"),
    ]
    prior, delta = rows[:2], rows[2:]
    inc = str(tmp_path / "inc")
    build_search_index(
        _docs(spark, prior), inc, positional=True, stopwords=["the", "of"]
    )
    ingest_search_delta(spark, _docs(spark, delta), inc)
    phrase = ["state", "of", "the", "art"]
    got = sorted(
        map(tuple, phrase_search_index(spark, inc, phrase).collect())
    )
    # batch-tier truth over the union corpus (positions keep stopwords
    # even though the postings dropped them)
    want = sorted(
        map(
            tuple,
            phrase_search(
                build_positional_index(_docs(spark, rows)), phrase
            ).collect(),
        )
    )
    assert got == want == [(1, 1), (3, 2)]

    delete_from_search_index(
        spark, _docs(spark, [(3, "x")]).select("doc_id"), inc
    )
    assert sorted(
        map(tuple, phrase_search_index(spark, inc, phrase).collect())
    ) == [(1, 1)]
    compact_search_index(spark, inc)
    assert sorted(
        map(tuple, phrase_search_index(spark, inc, phrase).collect())
    ) == [(1, 1)]
    assert not os.path.isdir(os.path.join(inc, "positions_v0"))
    assert os.path.isdir(os.path.join(inc, "positions_v1"))


def test_phrase_refused_without_positional(spark, tmp_path):
    path = str(tmp_path / "idx")
    build_search_index(_docs(spark, _PRIOR), path)
    with pytest.raises(ValueError, match="positional"):
        from neulix_datahub_spark.operators.search_index import (
            phrase_search_index,
        )

        phrase_search_index(spark, path, ["join", "key"]).collect()


def test_proximity_and_snippets_from_index_parity(spark, tmp_path):
    """The at-rest positional family serves NEAR/k and snippets
    identically to the corpus-built forms — and respects tombstones."""
    from neulix_datahub_spark.operators.search import (
        build_positional_index,
        keyword_snippets,
        proximity_spans,
    )
    from neulix_datahub_spark.operators.search_index import (
        keyword_snippets_index,
        proximity_search_index,
    )

    rows = [
        (1, "spark writes the table after the query runs"),
        (2, "query a spark table"),
        (3, "spark here but the other words very far away table query"),
        (4, "no relevant words"),
    ]
    docs = _docs(spark, rows)
    path = str(tmp_path / "idx")
    build_search_index(docs, path, positional=True)

    terms = ["spark", "table", "query"]
    want_prox = sorted(
        map(tuple, proximity_spans(build_positional_index(docs), terms).collect())
    )
    got_prox = sorted(
        map(tuple, proximity_search_index(spark, path, terms).collect())
    )
    assert got_prox == want_prox
    spans = {r[0]: r[1] for r in got_prox}
    assert spans[2] == 3 and spans[1] == 6 and spans[3] == 10
    assert 4 not in spans

    want_snip = sorted(
        map(tuple, keyword_snippets(docs, terms, window=2).collect())
    )
    got_snip = sorted(
        map(
            tuple,
            keyword_snippets_index(spark, path, docs, terms, window=2).collect(),
        )
    )
    assert got_snip == want_snip

    # tombstones: doc 2 deleted -> gone from both index-served forms
    delete_from_search_index(
        spark, _docs(spark, [(2, "x")]).select("doc_id"), path
    )
    assert all(
        r[0] != 2
        for r in proximity_search_index(spark, path, terms).collect()
    )
    assert all(
        r[0] != 2
        for r in keyword_snippets_index(
            spark, path, docs, terms, window=2
        ).collect()
    )
