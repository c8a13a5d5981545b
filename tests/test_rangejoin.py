"""Bucketed range join: identity with the literal theta join, left-join
unmatched recovery, guard rails, and the no-nested-loop plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _frames(spark, n_points=200, n_intervals=17):
    # deterministic, overlapping, some degenerate (lo == hi), some
    # intervals empty of points, some points outside every interval
    pts = spark.range(n_points).select(
        F.col("id").alias("pid"), ((F.col("id") * 37) % 500).alias("x")
    )
    iv = spark.range(n_intervals).select(
        F.col("id").alias("iid"),
        ((F.col("id") * 53) % 400).alias("lo"),
        (((F.col("id") * 53) % 400) + (F.col("id") * 11) % 90).alias("hi"),
    )
    return pts, iv


@pytest.mark.parametrize("width", [1, 7, 64, 1000])
def test_range_join_equals_theta_join(spark, width):
    """Row-for-row identical to the BETWEEN theta join at any bucket
    width — width only changes the physical shape, never the result."""
    from neulix_datahub_spark.operators.rangejoin import range_join

    pts, iv = _frames(spark)
    got = range_join(pts, iv, "x", "lo", "hi", width)
    want = pts.join(iv, (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
    key = lambda r: (r.pid, r.iid)  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
    assert want.count() > 0


def test_range_join_left_keeps_unmatched_points(spark):
    from neulix_datahub_spark.operators.rangejoin import range_join

    pts, iv = _frames(spark, n_points=50, n_intervals=3)
    got = range_join(pts, iv, "x", "lo", "hi", 25, how="left", point_key="pid")
    inner = range_join(pts, iv, "x", "lo", "hi", 25)
    matched_pids = {r.pid for r in inner.select("pid").distinct().collect()}
    rows = got.collect()
    # every point appears; unmatched ones exactly once with null interval
    unmatched = [r for r in rows if r.iid is None]
    assert {r.pid for r in unmatched} == {
        r.pid for r in pts.collect()
    } - matched_pids
    assert len(rows) == inner.count() + len(unmatched)


def test_range_join_guards(spark):
    from neulix_datahub_spark.operators.rangejoin import range_join

    pts, iv = _frames(spark, 5, 2)
    with pytest.raises(ValueError, match="bucket_width"):
        range_join(pts, iv, "x", "lo", "hi", 0)
    with pytest.raises(ValueError, match="point_key"):
        range_join(pts, iv, "x", "lo", "hi", 10, how="left")
    with pytest.raises(ValueError, match="collide"):
        range_join(pts, pts.withColumnRenamed("pid", "q"), "x", "lo", "hi", 10)
    with pytest.raises(ValueError, match="how"):
        range_join(pts, iv, "x", "lo", "hi", 10, how="full")


def test_range_join_plan_has_no_nested_loop(spark):
    """The decomposition's whole point: the physical plan is a shuffled
    (or broadcast-hash) EQUI join — BroadcastNestedLoopJoin, the only
    native strategy for a raw BETWEEN join, must not appear."""
    from neulix_datahub_spark.observability import plan_summary
    from neulix_datahub_spark.operators.rangejoin import range_join

    pts, iv = _frames(spark)
    got = range_join(pts, iv, "x", "lo", "hi", 32)
    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    s = plan_summary(got)
    assert s["broadcast_joins"] + s["sort_merge_joins"] >= 1 or "ShuffledHashJoin" in plan


def test_coverage_and_range_join_reconcile(spark):
    """Conservation law between the two interval decompositions: each
    order contributes once per covering window in promo_window_revenue
    and exactly once (at its depth) in window_coverage_revenue, so
    sum(n_orders) over windows == sum(depth * n_orders) over depths,
    and the depth-weighted revenue reconciles the same way."""
    from neulix_datahub_spark.plans.queries_scale import (
        promo_window_revenue,
        window_coverage_revenue,
    )
    from tests.conftest import SF_DIR

    per_window = promo_window_revenue(spark, SF_DIR).collect()
    per_depth = window_coverage_revenue(spark, SF_DIR).collect()
    assert sum(r.n_orders for r in per_window) == sum(
        r.depth * r.n_orders for r in per_depth
    )
    assert abs(
        sum(r.sum_revenue for r in per_window)
        - sum(r.depth * r.sum_revenue for r in per_depth)
    ) < 1.0  # rounded-at-2dp aggregates
    # total orders across depths == table size (every order classified)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert sum(r.n_orders for r in per_depth) == orders


def test_suggest_bucket_width_and_identity(spark):
    """The auto width is the median interval length (>= 1) and the join
    result with the suggested width is identical to the theta join."""
    import pytest as _pytest

    from neulix_datahub_spark.operators.rangejoin import (
        range_join,
        suggest_bucket_width,
    )

    pts, iv = _frames(spark)
    w = suggest_bucket_width(iv, "lo", "hi")
    med = sorted(r.hi - r.lo for r in iv.collect())[len(iv.collect()) // 2]
    assert w >= 1.0 and abs(w - max(1.0, med)) <= 1.0  # median-ish (even-count interp)
    got = range_join(pts, iv, "x", "lo", "hi", w)
    want = pts.join(iv, (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
    assert got.count() == want.count()
    with _pytest.raises(ValueError, match="empty"):
        suggest_bucket_width(iv.limit(0), "lo", "hi")


def test_file_pruning_report_scores_layouts(spark, tmp_path):
    """The footer-stats pruning report distinguishes layouts: a z-order
    by (custkey, totalprice) skips files for probes on EITHER column,
    while a custkey-only sort cannot skip anything for a price probe."""
    from neulix_datahub_spark.sources.layout import (
        file_pruning_report,
        write_zordered,
    )
    from tests.conftest import SF_DIR

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    b = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).first()
    bounds = {
        "o_custkey": (float(b[0]), float(b[1])),
        "o_totalprice": (float(b[2]), float(b[3])),
    }
    zo = str(tmp_path / "zo")
    write_zordered(orders, zo, bounds, bits=10, n_files=16)
    lex = str(tmp_path / "lex")
    (orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite").parquet(lex))

    # narrow price slab (middle 5% of the range)
    lo_p = b[2] + 0.47 * (b[3] - b[2])
    hi_p = b[2] + 0.52 * (b[3] - b[2])
    z_price = file_pruning_report(zo, {"o_totalprice": (lo_p, hi_p)})
    l_price = file_pruning_report(lex, {"o_totalprice": (lo_p, hi_p)})
    assert l_price["skipped_frac"] == 0.0  # price spans every custkey file
    assert z_price["skipped_frac"] > 0.2   # z-curve localizes price too

    # custkey slab: both layouts prune (z somewhat, lex perfectly)
    lo_c = b[0] + 0.47 * (b[1] - b[0])
    hi_c = b[0] + 0.52 * (b[1] - b[0])
    z_ck = file_pruning_report(zo, {"o_custkey": (lo_c, hi_c)})
    l_ck = file_pruning_report(lex, {"o_custkey": (lo_c, hi_c)})
    assert l_ck["skipped_frac"] > 0.8
    assert z_ck["skipped_frac"] > 0.2
    # The z-order contract is balanced WORST-CASE coverage: its worst
    # single-dimension probe still prunes, while the 1-D layout's worst
    # probe (the orthogonal column) prunes nothing. (On its own sort
    # column the specialized 1-D layout rightly wins — z-order trades
    # that peak for not having a blind spot.)
    assert min(z_ck["skipped_frac"], z_price["skipped_frac"]) > min(
        l_ck["skipped_frac"], l_price["skipped_frac"]
    )


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    pts=st.lists(st.integers(min_value=-50, max_value=150), min_size=0, max_size=30),
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=-40, max_value=120),
            st.integers(min_value=0, max_value=60),
        ),
        min_size=0,
        max_size=12,
    ),
    width=st.sampled_from([1, 3, 17, 200]),
)
@settings(max_examples=6, deadline=None)
def test_range_join_identity_property(spark, pts, ivs, width):
    """Hypothesis: for arbitrary points, arbitrary (possibly degenerate,
    touching, nested, duplicate) intervals, and any bucket width, the
    bucketed join equals the theta join — including empty sides."""
    from neulix_datahub_spark.operators.rangejoin import range_join

    p = spark.createDataFrame(
        [(i, x) for i, x in enumerate(pts)] or [(0, None)], "pid int, x int"
    ).filter(F.col("x").isNotNull())
    iv = spark.createDataFrame(
        [(i, lo, lo + ln) for i, (lo, ln) in enumerate(ivs)] or [(0, None, None)],
        "iid int, lo int, hi int",
    ).filter(F.col("lo").isNotNull())
    got = sorted(
        (r.pid, r.iid) for r in range_join(p, iv, "x", "lo", "hi", width).collect()
    )
    want = sorted(
        (r.pid, r.iid)
        for r in p.join(
            iv, (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi"))
        ).collect()
    )
    assert got == want


def test_asof_join_null_timestamps_match_nothing(spark):
    """Round-9 review: a NULL-ts right row used to sort to the window's
    edge and be carried into real probes; a NULL-ts left row under
    direction='forward' sorted last and inherited the latest right row.
    Both now yield NULL matches (pandas merge_asof refuses NaN keys;
    left-outer semantics keep the left row)."""
    from neulix_datahub_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("u", 5, "probe5"), ("u", None, "probenull")],
        "k string, ts int, tag string",
    )
    right = spark.createDataFrame(
        [("u", 3, "ok"), ("u", None, "ghost")],
        "k string, ts int, payload string",
    )
    back = {r.tag: r.payload for r in
            asof_join(left, right, on="ts", by="k").collect()}
    assert back == {"probe5": "ok", "probenull": None}

    fwd = {r.tag: r.payload for r in
           asof_join(left, right, on="ts", by="k",
                     direction="forward").collect()}
    # no right row at ts >= 5 except the ghost -> both unmatched
    assert fwd == {"probe5": None, "probenull": None}

    # and a real forward match still works
    right2 = spark.createDataFrame(
        [("u", 7, "later"), ("u", None, "ghost")],
        "k string, ts int, payload string",
    )
    fwd2 = {r.tag: r.payload for r in
            asof_join(left, right2, on="ts", by="k",
                      direction="forward").collect()}
    assert fwd2 == {"probe5": "later", "probenull": None}


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property (round 9): asof_join == pandas merge_asof on random
    keyed integer series, both directions, with and without tolerance —
    the reference semantics the operator claims (its docstring names
    the merge_asof surface). Left rows are deduplicated per (key, ts)
    probe grain and right rows per (key, ts) to keep merge_asof's
    contract well-defined (it requires sorted unique-ish keys; our
    window form tolerates duplicates but then the 'which payload' pick
    is engine-arbitrary, so the property pins the unambiguous core)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    import pandas as pd

    from neulix_datahub_spark.operators.asof import asof_join

    ts = st.integers(0, 30)
    key = st.sampled_from(["u", "v"])

    @settings(max_examples=10, deadline=None)
    @given(
        lefts=st.lists(st.tuples(key, ts), min_size=1, max_size=10,
                       unique=True),
        rights=st.lists(st.tuples(key, ts), min_size=1, max_size=10,
                        unique=True),
        direction=st.sampled_from(["backward", "forward"]),
        tol=st.sampled_from([None, 0, 3, 100]),
    )
    def check(lefts, rights, direction, tol):
        ldf = spark.createDataFrame(
            [(k, t, f"L{k}{t}") for k, t in lefts], "k string, ts long, ltag string"
        )
        rdf = spark.createDataFrame(
            [(k, t, f"R{k}{t}") for k, t in rights], "k string, ts long, payload string"
        )
        got = {
            (r.k, r.ts): r.payload
            for r in asof_join(
                ldf, rdf, on="ts", by="k", direction=direction, tolerance=tol
            ).collect()
        }
        lp = pd.DataFrame(sorted(lefts), columns=["k", "ts"]).sort_values("ts", kind="stable")
        rp = pd.DataFrame(
            [(k, t, f"R{k}{t}") for k, t in sorted(rights)],
            columns=["k", "ts", "payload"],
        ).sort_values("ts", kind="stable")
        want_df = pd.merge_asof(
            lp, rp, on="ts", by="k", direction=direction,
            tolerance=tol if tol is None else int(tol),
        )
        want = {
            (r.k, r.ts): (None if pd.isna(r.payload) else r.payload)
            for r in want_df.itertuples()
        }
        assert got == want, (lefts, rights, direction, tol, got, want)

    check()
