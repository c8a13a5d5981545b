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


# ---------------------------------------------------------------------------
# Replay-protocol property: the _ReplayGuard state machine (streaming/
# sinks.py) must fold EVERY source row EXACTLY ONCE across arbitrary
# checkpoint losses — any old/new batch packings, any crash point, any
# source growth between restarts. The model below mirrors the sink's
# action semantics 1:1 (fold/skip/stage/restamp/rebuild) on a plain
# list; no Spark. A pure-logic hole here is a data-loss or double-count
# bug in every exactly-once sink that shares the guard.
# ---------------------------------------------------------------------------


def _fp(batch):
    """Order-independent (count, xor-of-row-hashes) — the model twin of
    sinks._batch_fingerprint."""
    x = 0
    for r in batch:
        x ^= (r * 2654435761) & ((1 << 64) - 1)
    return len(batch), x


def _pack(rows, sizes):
    """Cut ``rows`` into non-empty batches using ``sizes`` greedily;
    the remainder becomes the final batch."""
    out, i = [], 0
    for s in sizes:
        if i >= len(rows):
            break
        out.append(rows[i:i + s])
        i += s
    if i < len(rows):
        out.append(rows[i:])
    return [b for b in out if b]


class _Table:
    """The sink's durable state: folded rows + the five stamp fields."""

    def __init__(self):
        self.folded: list = []
        self.meta = None  # {id, n, x, cn, cx}


def _deliver(table, batches, stop_after=None):
    """One query lifetime: a fresh _ReplayGuard processes ``batches``
    (ids 0..), applying the sink's action semantics to ``table``.
    ``stop_after`` simulates a crash after that many batches."""
    from neulix_datahub_spark.streaming.sinks import _ReplayGuard

    run = _ReplayGuard()
    staged: list = []
    for bid, batch in enumerate(batches):
        if stop_after is not None and bid >= stop_after:
            return  # crash: in-memory guard + staged list are lost
        n, x = _fp(batch)
        action = run.decide(bid, n, x, dict(table.meta) if table.meta else None)
        if action == "skip":
            continue
        if action == "stage":
            staged.extend(batch)
            continue
        if action == "restamp":
            cn, cx = table.meta["cn"], table.meta["cx"]
            table.meta = {"id": bid, "n": n, "x": x, "cn": cn, "cx": cx}
            staged = []
            continue
        if action == "rebuild":
            table.folded = staged + list(batch)
            table.meta = {"id": bid, "n": n, "x": x,
                          "cn": run.cum_n, "cx": run.cum_x}
            staged = []
            continue
        # fold
        prev_cn = table.meta["cn"] if table.meta else 0
        prev_cx = table.meta["cx"] if table.meta else 0
        table.folded.extend(batch)
        table.meta = {"id": bid, "n": n, "x": x,
                      "cn": prev_cn + n, "cx": prev_cx ^ x}


@given(
    base=st.lists(st.integers(0, 9), max_size=12),
    tail1=st.lists(st.integers(0, 9), max_size=6),
    tail2=st.lists(st.integers(0, 9), max_size=6),
    sizes_a=st.lists(st.integers(1, 5), max_size=6),
    sizes_b=st.lists(st.integers(1, 5), max_size=6),
    sizes_c=st.lists(st.integers(1, 5), max_size=6),
    commit_frac=st.floats(0.0, 1.0),
    crash_frac=st.floats(0.0, 1.0),
)
@settings(max_examples=300, deadline=None)
def test_replay_guard_folds_each_row_exactly_once(
    base, tail1, tail2, sizes_a, sizes_b, sizes_c, commit_frac, crash_frac
):
    """Lifetime 1 folds a prefix of packing A and dies with its
    checkpoint lost; lifetime 2 re-delivers the (possibly grown) source
    under packing B and may crash at ANY batch boundary; lifetime 3
    re-delivers the (possibly further grown) source under packing C to
    completion. The folded table must equal the final source exactly —
    no loss, no double count, no refusal — for every combination."""
    table = _Table()

    batches_a = _pack(base, sizes_a)
    committed = round(commit_frac * len(batches_a))
    _deliver(table, batches_a, stop_after=committed)

    src2 = base + tail1
    batches_b = _pack(src2, sizes_b)
    crash_at = round(crash_frac * len(batches_b))
    _deliver(table, batches_b, stop_after=crash_at)

    src3 = src2 + tail2
    _deliver(table, _pack(src3, sizes_c))

    assert sorted(table.folded) == sorted(src3)


def test_two_phase_rank_is_stable_across_repeated_actions(spark):
    """The checkpoint must pin ONE bucketing: evaluating the same
    returned frame twice (two separate actions) and rebuilding the
    operator fresh must all yield identical ranks — the corruption mode
    repartitionByRange's boundary sampling allows without the pin was
    rows swapping partitions between evaluations (observed pre-pin at
    sf0.01: 1468/1500 alignment rows)."""
    from neulix_datahub_spark.operators.sequence import with_sorted_rank

    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") * 2654435761 % 1000).alias("v")
    )
    ranked = with_sorted_rank(df, [F.asc("v"), F.asc("id")], "r", num_partitions=7)
    first = sorted(map(tuple, ranked.collect()))
    second = sorted(map(tuple, ranked.collect()))
    rebuilt = sorted(
        map(tuple, with_sorted_rank(
            df, [F.asc("v"), F.asc("id")], "r", num_partitions=7
        ).collect())
    )
    assert first == second == rebuilt


def test_replay_guard_strict_mode_refuses_unverified_rebuild(monkeypatch):
    """Round-9 hardening (r8 ADVICE): the mid-batch-overrun rebuild
    cannot fingerprint-verify the committed prefix, so it silently
    discards committed rows when the restarted source lost its head.
    NEULIX_STRICT_REPLAY=1 must turn that rebuild into a refusal, and
    the verified paths (skip/restamp/fold) must be unaffected."""
    import pytest as _pytest

    from neulix_datahub_spark.streaming.sinks import _ReplayGuard

    # committed: 3 rows across two batches, stamped meta at id=1
    meta = {"id": 1, "n": 1, "x": 7, "cn": 3, "cx": 5}

    monkeypatch.setenv("NEULIX_STRICT_REPLAY", "1")
    # restart re-delivers a 4-row first batch: cum_n=4 overruns cn=3
    run = _ReplayGuard()
    with _pytest.raises(RuntimeError, match="NEULIX_STRICT_REPLAY"):
        run.decide(0, 4, 9, dict(meta))

    # verified prefix replay still restamps under strict mode
    run2 = _ReplayGuard()
    assert run2.decide(0, 2, 2 ^ 5, dict(meta)) == "stage"
    assert run2.decide(1, 1, 2, dict(meta)) == "restamp"

    # and the default (flag unset) keeps the documented rebuild trade
    monkeypatch.delenv("NEULIX_STRICT_REPLAY")
    run3 = _ReplayGuard()
    assert run3.decide(0, 4, 9, dict(meta)) == "rebuild"
