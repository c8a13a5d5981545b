"""Exact-substring (passage) dedup — operators/passages.py.

Covers the three layers: positioned grams, interval-merged maximal
passages, and removal — plus a hypothesis property that replays the
whole construction against an independent pure-Python reference, and
the quality-aware canonical survivor pick (operators/components.py).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from neulix_datahub_spark.operators.components import canonical_by_components
from neulix_datahub_spark.operators.passages import (
    matching_passages,
    positioned_token_grams,
    remove_matching_passages,
    remove_repeated_passages,
    repeated_passages,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_positioned_grams_positions_and_short_docs(spark):
    df = _docs(spark, ["a b c d", "a b", None, ""])
    got = sorted(
        map(tuple, positioned_token_grams(df, "text", "doc_id", 3).collect())
    )
    # doc 0: grams at token starts 0 and 1; doc 1 too short; NULL/empty: none
    assert got == [(0, 0, "a b c"), (0, 1, "b c d")]


def test_repeated_passages_merge_overlapping_hits(spark):
    # "a b c" repeats at positions 0 and 2 of doc 0 (overlapping via
    # doc 1's copies): hits 0 and 2 with n=3 overlap -> ONE run [0..4]
    df = _docs(spark, ["a b c a b c d", "a b c x", "b c a y", "c a b z"])
    runs = {
        r["doc_id"]: (r["start_pos"], r["end_pos"], r["n_tokens"])
        for r in repeated_passages(df, "text", "doc_id", n=3).collect()
        if r["doc_id"] == 0
    }
    # repeated grams sit at starts 0..3 ("b c d" at 4 is unique), so one
    # passage covers tokens 0..5 and the trailing "d" survives
    assert runs[0] == (0, 5, 6)


def test_repeated_passages_distinct_runs_stay_apart(spark):
    # doc 0 has "a b c" at pos 0 and "x y z" at pos 4 (gap token "q"):
    # two disjoint passages [0..2], [4..6]
    df = _docs(spark, ["a b c q x y z", "a b c", "x y z"])
    got = sorted(
        (r["start_pos"], r["end_pos"])
        for r in repeated_passages(df, "text", "doc_id", n=3).collect()
        if r["doc_id"] == 0
    )
    assert got == [(0, 2), (4, 6)]


def test_within_doc_repetition_counts(spark):
    # min_count=2 over TOTAL occurrences: a doc repeating its own
    # passage is covered even when no other doc shares it
    df = _docs(spark, ["p q r s p q r s", "unrelated text here"])
    got = [
        (r["start_pos"], r["end_pos"])
        for r in repeated_passages(df, "text", "doc_id", n=4).collect()
    ]
    assert got == [(0, 7)]


def test_remove_repeated_passages_excises_and_counts(spark):
    df = _docs(spark, ["a b c q x y z", "a b c", "x  y\tz", "fresh words only"])
    out = {
        r["doc_id"]: r
        for r in remove_repeated_passages(df, "text", "doc_id", n=3).collect()
    }
    # doc 0: both passages excised, lone 'q' survives
    assert out[0]["text"] == "q"
    assert out[0]["n_tokens_before"] == 7
    assert out[0]["n_tokens_after"] == 1
    assert out[0]["n_passages"] == 2
    # docs 1/2 fully covered -> empty string, 0 tokens after
    assert out[1]["text"] == "" and out[1]["n_tokens_after"] == 0
    # doc 2 normalizes "x  y\tz" -> "x y z" before matching
    assert out[2]["text"] == "" and out[2]["n_tokens_before"] == 3
    # untouched doc keeps its (normalized) token stream, 0 passages
    assert out[3]["text"] == "fresh words only"
    assert out[3]["n_passages"] == 0
    assert out[3]["n_tokens_after"] == out[3]["n_tokens_before"] == 3


def _reference_scrub(texts, n, min_count):
    """Independent pure-Python replay: gram counts -> covered interval
    union -> kept tokens."""
    toks = [t.lower().split() for t in texts]
    counts: dict[tuple, int] = {}
    for tt in toks:
        for i in range(len(tt) - n + 1):
            g = tuple(tt[i : i + n])
            counts[g] = counts.get(g, 0) + 1
    out = []
    for tt in toks:
        covered = set()
        for i in range(len(tt) - n + 1):
            if counts[tuple(tt[i : i + n])] >= min_count:
                covered.update(range(i, i + n))
        kept = [w for i, w in enumerate(tt) if i not in covered]
        out.append((" ".join(kept), len(tt), len(tt) - len(covered)))
    return out


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta".split()),
            min_size=1,
            max_size=12,
        ).map(" ".join),
        min_size=1,
        max_size=10,
    ),
    n=st.integers(2, 3),
)
@settings(max_examples=6, deadline=None)
def test_scrub_matches_pure_python_reference(spark, texts, n):
    df = _docs(spark, texts)
    got = {
        r["doc_id"]: (r["text"], r["n_tokens_before"], r["n_tokens_after"])
        for r in remove_repeated_passages(df, "text", "doc_id", n=n).collect()
    }
    want = dict(enumerate(_reference_scrub(texts, n, 2)))
    assert got == want


def test_canonical_by_components_argmax_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (9, 99)],
        "id long, score long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    kept = sorted(
        r["id"]
        for r in canonical_by_components(
            df, pairs, id_col="id", score="score"
        ).collect()
    )
    # cluster {1,2,3}: 2 and 3 tie at 30 -> min id 2 wins; 4 and 9 unpaired
    assert kept == [2, 4, 9]


def test_canonical_matches_min_id_when_scores_equal(spark):
    from neulix_datahub_spark.operators.components import dedup_by_components

    df = spark.createDataFrame(
        [(i, 1) for i in range(8)], "id long, score long"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    canon = sorted(
        r["id"]
        for r in canonical_by_components(df, pairs, "id", F.col("score")).collect()
    )
    minid = sorted(
        r["id"] for r in dedup_by_components(df, pairs, "id").collect()
    )
    assert canon == minid  # constant score degrades to the min-id pick


def test_remove_matching_passages_decontaminates(spark):
    train = _docs(
        spark,
        [
            "the quick brown fox jumps over the lazy dog tail end",
            "completely unrelated training text with no overlap at all",
        ],
    )
    bench = spark.createDataFrame(
        [("quick brown fox jumps over the lazy dog",)], "text string"
    )
    out = {
        r["doc_id"]: r
        for r in remove_matching_passages(
            train, bench, "text", "doc_id", n=3
        ).collect()
    }
    # every 3-gram of the bench string marks doc 0's tokens 1..8; the
    # marks chain into one passage, leaving "the ... tail end"
    assert out[0]["text"] == "the tail end"
    assert out[0]["n_passages"] == 1
    assert out[0]["n_tokens_before"] == 11
    assert out[0]["n_tokens_after"] == 3
    # the clean doc is untouched
    assert out[1]["n_passages"] == 0
    assert out[1]["text"].startswith("completely unrelated")


def test_matching_passages_needle_shorter_than_n(spark):
    train = _docs(spark, ["a b c d e f g h"])
    bench = spark.createDataFrame([("a b",)], "text string")
    # needles shorter than n carry no n-gram: nothing matches
    assert matching_passages(train, bench, "text", "doc_id", n=3).count() == 0


def test_scrub_refuses_bookkeeping_column_clash(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, "a b c", 7)], "doc_id long, text string, n_passages long"
    )
    with pytest.raises(ValueError, match="n_passages"):
        remove_repeated_passages(df, "text", "doc_id", n=2)


def test_positioned_grams_refuses_reserved_id_col(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b c")], "pos long, text string")
    with pytest.raises(ValueError, match="collides"):
        positioned_token_grams(df, "text", "pos", 2)


def test_hash_key_mode_is_result_invariant(spark):
    """key_mode='hash' (the 100 TB shuffle-width mode) must produce the
    IDENTICAL scrub as the oracle-exact string mode — on the hand
    corpus, the decontamination path, and the sf0.001 documents
    fixture."""
    from neulix_datahub_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    hand = _docs(spark, ["a b c a b c d", "a b c x", "b c a y", "c a b z"])
    for df, n in ((hand, 3), (load_table(spark, SF_DIR, "documents"), 8)):
        s = sorted(
            map(
                tuple,
                remove_repeated_passages(
                    df, "text", "doc_id", n=n, key_mode="string"
                ).collect(),
            )
        )
        h = sorted(
            map(
                tuple,
                remove_repeated_passages(
                    df, "text", "doc_id", n=n, key_mode="hash"
                ).collect(),
            )
        )
        assert s == h

    bench = spark.createDataFrame([("a b c",)], "text string")
    s = sorted(
        map(
            tuple,
            remove_matching_passages(
                hand, bench, "text", "doc_id", n=3, key_mode="string"
            ).collect(),
        )
    )
    h = sorted(
        map(
            tuple,
            remove_matching_passages(
                hand, bench, "text", "doc_id", n=3, key_mode="hash"
            ).collect(),
        )
    )
    assert s == h


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=0,
        max_size=12,
    ),
    scores=st.lists(st.integers(0, 5), min_size=10, max_size=10),
)
@settings(max_examples=8, deadline=None)
def test_canonical_matches_union_find_reference(spark, edges, scores):
    """Property: on random edge lists and scores, the engine's
    argmax-per-component survivor set equals an independent pure-Python
    union-find + argmax replay (ties by min id)."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(scores)], "id long, score long"
    )
    if edges:
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    else:
        pairs = spark.createDataFrame([], "id_a long, id_b long")
    got = sorted(
        r["id"]
        for r in canonical_by_components(df, pairs, "id", "score").collect()
    )

    parent = list(range(10))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    clustered = {v for e in edges for v in e}
    for i in clustered:
        comps.setdefault(find(i), []).append(i)
    losers = set()
    for members in comps.values():
        winner = max(members, key=lambda i: (scores[i], -i))
        losers |= set(members) - {winner}
    want = sorted(i for i in range(10) if i not in losers)
    assert got == want


# ---------------------------------------------------------------------------
# Exactness adjudication (round 12): the r11 continuity notes claimed
# the n-gram-run approximation "under-merges passages whose repeats
# differ in length" and proposed a two-pass n/2n run-join tightening.
# The claim is FALSE: a token is covered by the gram method iff it lies
# inside an n-gram whose corpus count >= min_count, which is
# definitionally identical to "inside an n-token substring occurring
# >= min_count times corpus-wide" — the coverage semantics Lee et al.'s
# suffix-array pass computes at threshold length n. The properties
# below pin that equivalence EXTENSIONALLY against a brute-force pure-
# Python reference on random corpora over a tiny alphabet (dense
# repeats) plus the exact adversarial shapes the note worried about
# (nested repeats of different lengths, whole-short-document repeats,
# chained touching repeats). No tightening pass exists because none is
# needed; sub-n repeats are invisible BY DEFINITION (n IS the minimum
# passage length, Lee et al.'s 50-token dial).
# ---------------------------------------------------------------------------


def _ref_runs(docs, n, min_count):
    """Brute-force reference: count every n-token window corpus-wide,
    mark member tokens of windows with count >= min_count, emit maximal
    contiguous covered blocks per doc as (id, start, end, n_tokens)."""
    from collections import Counter

    toks = {i: t.split(" ") for i, t in docs}
    grams = Counter()
    for tk in toks.values():
        for p in range(len(tk) - n + 1):
            grams[tuple(tk[p : p + n])] += 1
    out = []
    for i, tk in toks.items():
        covered = set()
        for p in range(len(tk) - n + 1):
            if grams[tuple(tk[p : p + n])] >= min_count:
                covered.update(range(p, p + n))
        run = None  # (start, last) of the open contiguous block
        for t in sorted(covered) + [None]:
            if run is not None and (t is None or t > run[1] + 1):
                out.append((i, run[0], run[1], run[1] - run[0] + 1))
                run = None
            if t is not None:
                run = (run[0], t) if run is not None else (t, t)
    return sorted(out)


def _engine_runs(spark, docs, n, min_count):
    df = spark.createDataFrame(list(docs), "doc_id long, text string")
    got = repeated_passages(df, "text", "doc_id", n=n, min_count=min_count)
    return sorted(
        (r.doc_id, r.start_pos, r.end_pos, r.n_tokens) for r in got.collect()
    )


@given(
    data=st.lists(
        st.lists(st.sampled_from("ab"), min_size=1, max_size=14),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(min_value=2, max_value=4),
    min_count=st.integers(min_value=2, max_value=3),
)
@settings(max_examples=12, deadline=None)
def test_runs_equal_brute_force_reference(spark, data, n, min_count):
    docs = [(i, " ".join(tk)) for i, tk in enumerate(data)]
    assert _engine_runs(spark, docs, n, min_count) == _ref_runs(
        docs, n, min_count
    )


def test_runs_exact_on_differing_length_repeats(spark):
    """The adversarial shapes behind the (refuted) under-merge claim:
    a long repeat containing a shorter, more-frequent repeat; a repeat
    appearing as the WHOLE of an n-length document; two repeats that
    touch in one document but come from different partners."""
    cases = [
        # nested repeats of different lengths (min_count separates them)
        (
            [
                (0, "a b c d e f"),
                (1, "a b c d e f"),
                (2, "b c d"),
                (3, "b c d"),
            ],
            3,
            2,
        ),
        (
            [
                (0, "a b c d e f"),
                (1, "a b c d e f"),
                (2, "b c d"),
                (3, "b c d"),
            ],
            3,
            3,  # only the 3-gram "b c d" reaches count 4; long repeat at 2
        ),
        # whole short document IS the repeated passage (len == n)
        ([(0, "x y z q r"), (1, "x y z")], 3, 2),
        # chained touching repeats from different partners merge into
        # one contiguous block in the host (coverage-identical)
        ([(0, "a b c d e f"), (1, "a b c"), (2, "d e f")], 3, 2),
        # doc shorter than n: no grams, no runs, and its text cannot
        # lend counts to anything
        ([(0, "a b"), (1, "a b c"), (2, "a b c")], 3, 2),
    ]
    for docs, n, mc in cases:
        assert _engine_runs(spark, docs, n, mc) == _ref_runs(docs, n, mc)
