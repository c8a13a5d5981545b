"""Unit + property tests for cleaning functions (SURVEY §5.2 items 3–4):
parse_flag totality, sanitize idempotence, find_col resolution order."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from neulix_datahub_spark.functions.cleaning import (
    comma_decimal,
    fill_nulls_by_type,
    find_col,
    parse_flag,
    project_to_header,
    sanitize_column_name,
    try_timestamp,
)


# --- sanitize_column_name (F3) ---------------------------------------------

@pytest.mark.parametrize(
    "raw,want",
    [
        (" Id ", "Id"),
        ("1column", "col_1column"),
        ("preço (R$)", "pre_o_R"),
        ("a__b___c", "a_b_c"),
        ("__x__", "x"),
        ("", "col"),
        ("123", "col_123"),
        ("ok_name", "ok_name"),
    ],
)
def test_sanitize_cases(raw, want):
    assert sanitize_column_name(raw) == want


@given(st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_sanitize_idempotent_and_safe(name):
    once = sanitize_column_name(name)
    assert sanitize_column_name(once) == once  # idempotence
    assert once and not once[0].isdigit()
    assert all(ch.isalnum() or ch == "_" for ch in once)
    assert "__" not in once


# --- find_col (F2) -----------------------------------------------------------

def test_find_col_exact_beats_substring(spark):
    df = spark.createDataFrame([("a", "b", "c")], "`QUALITY check` string, quality string, x string")
    assert find_col(df, "quality") == "quality"          # exact lowercase wins
    assert find_col(df, "quality ch") == "QUALITY check"  # substring fallback
    assert find_col(df, "missing") is None


# --- parse_flag (F7) ---------------------------------------------------------

TRUTHY = ["1", "true", "t", "sim", "s", "yes", "y", " SIM ", "Y", "1,0", "1.0", "01.0"]
FALSY = ["0", "nao", "no", "", "2", "0.0", "0,0", None, "x", "10", "truey"]


def test_parse_flag_semantics(spark):
    rows = [(v,) for v in TRUTHY + FALSY]
    df = spark.createDataFrame(rows, "v string")
    got = [r.f for r in df.select(parse_flag("v").alias("f")).collect()]
    assert got == [True] * len(TRUTHY) + [False] * len(FALSY)


@given(st.one_of(st.none(), st.text(max_size=12)))
@settings(max_examples=30, deadline=None)
def test_parse_flag_total(spark, v):
    # never null, never errors, regardless of input
    df = spark.createDataFrame([(v,)], "v string")
    out = df.select(parse_flag("v").alias("f")).first().f
    assert out in (True, False)


# --- scalar casts ------------------------------------------------------------

def test_comma_decimal_and_timestamp(spark):
    df = spark.createDataFrame(
        [("1,5", "2024-01-02 03:04:05"), ("junk", "not a date")], "n string, t string"
    )
    got = df.select(comma_decimal("n").alias("n"), try_timestamp("t").alias("t")).collect()
    assert got[0].n == 1.5 and got[0].t is not None
    assert got[1].n is None and got[1].t is None


# --- fill_nulls_by_type (F6) -------------------------------------------------

def test_fill_nulls_by_type(spark):
    df = spark.createDataFrame(
        [(None, None, None), (2, "x", 1.5)], "i int, s string, d double"
    )
    got = fill_nulls_by_type(df).orderBy("i").collect()
    assert (got[0].i, got[0].s, got[0].d) == (0, "", 0.0)
    assert (got[1].i, got[1].s, got[1].d) == (2, "x", 1.5)


# --- project_to_header (F1) --------------------------------------------------

def test_project_to_header(spark):
    df = spark.createDataFrame([(1, None)], "a int, b string")
    out = project_to_header(df, ["b", "a", "missing"])
    row = out.first()
    assert out.columns == ["b", "a", "missing"]
    assert (row.b, row.a, row.missing) == ("", "1", "")


# --- observability (logs.py parity via df.observe) ----------------------------

def test_observed_write_collects_metrics(spark, tmp_path):
    from pyspark.sql import functions as F

    from neulix_datahub_spark.observability import observed_write, with_metrics

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "id long, name string"
    )
    rec = observed_write(df, str(tmp_path / "out"))
    assert rec["n_rows"] == 3
    assert rec["nulls_name"] == 1
    assert rec["nulls_id"] == 0
    assert spark.read.parquet(rec["path"]).count() == 3

    observed, obs = with_metrics(df, {"total_ids": F.sum("id")})
    observed.count()
    assert obs.get["total_ids"] == 6


# --- filter_computed (plan barrier) ------------------------------------------

def test_filter_computed_matches_plain_filter_and_blocks_pushdown(spark):
    from neulix_datahub_spark.functions.planning import filter_computed

    df = spark.createDataFrame(
        [(i, "x" * (i % 7 + 1)) for i in range(100)], "id long, s string"
    )
    scored = df.select("id", F.length(F.regexp_replace("s", "x", "yy")).alias("n"))
    pred = F.col("n") >= 4
    plain = scored.filter(pred)
    guarded = filter_computed(scored, pred)
    assert sorted(guarded.collect()) == sorted(plain.collect())
    assert guarded.columns == plain.columns

    # The guarded plan's Filter must test the computed attribute, not an
    # inlined copy of the regex expression.
    optimized = guarded._jdf.queryExecution().optimizedPlan().toString()
    filter_lines = [l for l in optimized.splitlines() if "Filter" in l]
    assert filter_lines and all("regexp" not in l for l in filter_lines)
