"""Hypothesis properties for the round-7 operators — the SURVEY §5
strategy (randomized laws, not fixtures) extended to the new tiers.
Example counts are small: each example is a real Spark job."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

WORDS = ["alpha", "beta", "gamma", "delta", "eps"]


@given(
    docs=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    wa=st.integers(min_value=0, max_value=len(WORDS) - 1),
    wb=st.integers(min_value=0, max_value=len(WORDS) - 1),
)
@settings(max_examples=8, deadline=None)
def test_phrase_search_matches_naive(spark, docs, wa, wb):
    """phrase_search over the positional index equals the naive Python
    overlap-safe scan, for every random corpus and 2-word phrase —
    including repeated and overlapping occurrences."""
    from neulix_datahub_spark.operators.search import (
        build_positional_index,
        phrase_search,
    )

    phrase = [WORDS[wa], WORDS[wb]]
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_occurrences
        for r in phrase_search(build_positional_index(df), phrase).collect()
    }
    want = {}
    for i, toks in enumerate(docs):
        n = sum(
            1
            for j in range(len(toks) - 1)
            if toks[j] == phrase[0] and toks[j + 1] == phrase[1]
        )
        if n:
            want[i] = n
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1_000_000), st.sampled_from("abc")),
        min_size=1,
        max_size=30,
    ),
    nparts=st.integers(min_value=2, max_value=7),
)
@settings(max_examples=6, deadline=None)
def test_table_checksum_order_and_partitioning_invariant(spark, rows, nparts):
    """portable_table_checksum is a pure function of the row multiset:
    permuting and repartitioning the frame never changes it; dropping
    one row always does (sum of 60-bit keys — collisions need ~2^30
    rows, not 30)."""
    from neulix_datahub_spark.operators.quality import portable_table_checksum

    df = spark.createDataFrame(rows, "k long, s string")
    base = portable_table_checksum(df, ["k", "s"]).first()
    shuffled = portable_table_checksum(
        df.orderBy(F.desc("s"), F.asc("k")).repartition(nparts), ["k", "s"]
    ).first()
    assert (base.n_rows, base.content_sum) == (shuffled.n_rows, shuffled.content_sum)
    if base.n_rows > 1:
        fewer = portable_table_checksum(
            df.limit(base.n_rows - 1), ["k", "s"]
        ).first()
        assert fewer.content_sum != base.content_sum


@given(
    ka=st.lists(st.integers(0, 50), min_size=1, max_size=40),
    kb=st.lists(st.integers(0, 50), min_size=1, max_size=40),
)
@settings(max_examples=6, deadline=None)
def test_cms_inner_product_never_undershoots(spark, ka, kb):
    """est >= true equi-join size for every random key multiset pair
    (counters only over-count), and exact when width kills collisions."""
    from collections import Counter

    from neulix_datahub_spark.operators.sketches import cms_build, cms_inner_product

    a = spark.createDataFrame([(k,) for k in ka], "k long")
    b = spark.createDataFrame([(k,) for k in kb], "k long")
    true_size = sum(ca * Counter(kb)[k] for k, ca in Counter(ka).items())
    est = cms_inner_product(
        cms_build(a, "k", width=64, depth=4), cms_build(b, "k", width=64, depth=4)
    ).first()["est_join_size"]
    assert est >= true_size
    exact = cms_inner_product(
        cms_build(a, "k", width=8192, depth=4),
        cms_build(b, "k", width=8192, depth=4),
    ).first()["est_join_size"]
    assert exact == true_size


@given(
    tss=st.lists(
        st.datetimes(
            min_value=__import__("datetime").datetime(1995, 1, 1),
            max_value=__import__("datetime").datetime(1999, 12, 31),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=8, deadline=None)
def test_embargo_split_total_and_exclusive(spark, tss):
    """Every timestamp lands in exactly ONE split, and the splits
    respect the half-open boundaries, for arbitrary timestamps."""
    from neulix_datahub_spark.operators.curation import time_embargo_split

    df = spark.createDataFrame([(t,) for t in tss], "ts timestamp")
    out = time_embargo_split(df, "ts", "1997-01-01", 90).collect()
    assert len(out) == len(tss)
    import datetime as dt

    lo = dt.datetime(1997, 1, 1)
    hi = lo + dt.timedelta(days=90)
    for r in out:
        want = "train" if r.ts < lo else ("purged" if r.ts < hi else "test")
        assert r.split == want, (r.ts, r.split)


def test_table_checksum_distinguishes_null_positions(spark):
    """Regression: concat_ws silently SKIPS null columns, so rows
    differing only in WHICH column is null used to collide — a
    migration shifting values between columns validated as identical.
    The flag+value field encoding keeps every (nullness, value)
    combination distinct, and agrees with the DuckDB rendering of the
    same rule (see _MIG_SQL)."""
    from neulix_datahub_spark.operators.quality import portable_table_checksum

    a = spark.createDataFrame([("a", None, "b")], "x string, y string, z string")
    b = spark.createDataFrame([("a", "b", None)], "x string, y string, z string")
    ca = portable_table_checksum(a, ["x", "y", "z"]).first()
    cb = portable_table_checksum(b, ["x", "y", "z"]).first()
    assert ca.content_sum != cb.content_sum

    # 2-col swap: (x, NULL) vs (NULL, x) must differ too
    c = spark.createDataFrame([("x", None)], "a string, b string")
    d = spark.createDataFrame([(None, "x")], "a string, b string")
    assert (
        portable_table_checksum(c, ["a", "b"]).first().content_sum
        != portable_table_checksum(d, ["a", "b"]).first().content_sum
    )


def test_table_checksum_matches_duckdb_on_nulls(spark):
    """Spark and DuckDB compute the SAME checksum for a null-bearing
    table when both replay the flag+value rendering — the cross-engine
    handshake the operator exists for."""
    import duckdb

    from neulix_datahub_spark.operators.quality import portable_table_checksum

    rows = [(1, "a"), (2, None), (None, "c"), (None, None)]
    df = spark.createDataFrame(rows, "k long, s string")
    got = portable_table_checksum(df, ["k", "s"]).first()

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES (1, 'a'), (2, NULL), "
        "(NULL, 'c'), (NULL, NULL)) AS v(k, s)"
    )
    want = con.execute(
        "SELECT count(*) AS n, CAST(sum(CAST('0x' || substr(md5("
        "  (CASE WHEN k IS NULL THEN '1' ELSE '0' END) || COALESCE(k::VARCHAR,'')"
        "  || chr(31) ||"
        "  (CASE WHEN s IS NULL THEN '1' ELSE '0' END) || COALESCE(s,'')"
        "), 1, 15) AS BIGINT)::HUGEINT) AS VARCHAR) FROM t"
    ).fetchone()
    con.close()
    assert (got.n_rows, got.content_sum) == want


def test_exact_fixed_point_percentiles_ignore_nulls(spark):
    """Regression: a null value used to survive into the cent histogram,
    sort first in Spark's window (nulls-first) and shift every
    percentile — while DuckDB orders nulls last, so the engines also
    disagreed. Standard percentile semantics: nulls excluded."""
    from neulix_datahub_spark.operators.profile import (
        exact_fixed_point_percentiles,
    )

    vals = [(float(v),) for v in range(1, 101)]
    clean = spark.createDataFrame(vals, "x double")
    dirty = spark.createDataFrame(vals + [(None,)] * 7, "x double")
    want = {
        r.p: r.value
        for r in exact_fixed_point_percentiles(clean, "x", [0.25, 0.5, 0.9]).collect()
    }
    got = {
        r.p: r.value
        for r in exact_fixed_point_percentiles(dirty, "x", [0.25, 0.5, 0.9]).collect()
    }
    assert got == want == {0.25: 25.0, 0.5: 50.0, 0.9: 90.0}
