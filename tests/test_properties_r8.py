"""Round-8 hypothesis properties: the two-phase global-ordering
operators (operators/sequence.py) must be EXTENSIONALLY EQUAL to their
single-partition-window spellings on arbitrary multisets — duplicates,
negative values, any partition count. The window forms are the
executable specification; the two-phase forms are the scalable
implementations the plan-shape tests pin."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F


@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=60),
    nparts=st.integers(min_value=1, max_value=9),
)
@settings(max_examples=6, deadline=None)
def test_sorted_rank_equals_window_spec(spark, vals, nparts):
    from neulix_datahub_spark.operators.sequence import with_sorted_rank

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v long"
    )
    order = [F.desc("v"), F.asc("k")]
    got = with_sorted_rank(df, order, "r", num_partitions=nparts)
    want = df.withColumn("r", F.row_number().over(Window.orderBy(*order)))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=60),
    n=st.integers(min_value=1, max_value=11),
)
@settings(max_examples=6, deadline=None)
def test_ntile_equals_window_spec(spark, vals, n):
    """Every (N, n) relationship, including n > N and heavy ties."""
    from neulix_datahub_spark.operators.sequence import with_ntile

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v long"
    )
    order = [F.asc("v"), F.asc("k")]
    got = with_ntile(df, order, n, "q", num_partitions=4)
    want = df.withColumn("q", F.ntile(n).over(Window.orderBy(*order)))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@given(vals=st.lists(st.integers(-50, 50), min_size=1, max_size=60))
@settings(max_examples=6, deadline=None)
def test_running_total_equals_window_spec(spark, vals):
    from neulix_datahub_spark.operators.sequence import with_running_total

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v long"
    )
    order = [F.asc("v"), F.asc("k")]
    got = with_running_total(df, order, "v", "c", num_partitions=5)
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("c", F.sum("v").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
