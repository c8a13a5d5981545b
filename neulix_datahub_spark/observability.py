"""Operation metrics (parity with the reference's structured logging).

The reference logs every operation's counts/paths/sizes to Cloud Logging
(``core/configs/logs.py:24-107``; call sites like ``storage.py:138-140``)
— as separate eager passes over the data. The Spark-first form is
``df.observe``: named accumulator metrics collected DURING the action
(zero extra passes, zero extra shuffles), retrieved from the
``Observation`` handle afterwards and handed to whatever log sink the
deployment uses.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Observation


def with_metrics(
    df: DataFrame,
    metrics: dict[str, Column] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach named metrics to ``df``; they are computed as a side effect
    of the NEXT action on the returned frame (no extra job, unlike the
    reference's separate count/size calls).

    Default metrics mirror what the reference logs: row count and, for
    each numeric column, a null count.
    """
    if metrics is None:
        metrics = {"n_rows": F.count(F.lit(1))}
        for f in df.schema.fields:
            metrics[f"nulls_{f.name}"] = F.count(F.lit(1)) - F.count(f.name)
    obs = Observation()
    first, *rest = [expr.alias(name) for name, expr in metrics.items()]
    return df.observe(obs, first, *rest), obs


def observed_write(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    fmt: str = "parquet",
    logger: Any | None = None,
) -> dict[str, Any]:
    """Write ``df`` and return the op-log record the reference would emit
    (rows written, per-column null counts, destination) — collected from
    the write itself, not a second pass. Pass a ``logs.StructuredLogger``
    to also emit the record as a severity-leveled log line (the
    reference's per-operation Cloud Logging call, ``storage.py:138-140``)."""
    observed, obs = with_metrics(df)
    observed.write.mode(mode).format(fmt).save(path)
    record = dict(obs.get)
    record["path"] = path
    record["format"] = fmt
    if logger is not None:
        logger.inf(f"wrote {record.get('n_rows', '?')} rows to {path}", **record)
    return record


def observe_stream(
    df: DataFrame, name: str, metrics: dict[str, Column] | None = None
) -> DataFrame:
    """Streaming twin of :func:`with_metrics`: attach named accumulator
    metrics to a STREAMING DataFrame. Spark evaluates them per
    micro-batch during the batch's own processing (zero extra passes);
    collect them with :class:`StreamMetricsCollector` — the
    ``Observation`` handle used batch-side does not support streams."""
    if metrics is None:
        metrics = {"n_rows": F.count(F.lit(1))}
    first, *rest = [expr.alias(n) for n, expr in metrics.items()]
    return df.observe(name, first, *rest)


class StreamMetricsCollector:
    """StreamingQueryListener that accumulates the observed-metrics rows
    of every micro-batch for one observation ``name`` — the engine-side
    feed for the reference-style per-operation op log, without a second
    pass over the stream.

    Usage::

        col = StreamMetricsCollector(spark, "ingest")
        try:
            q = observe_stream(stream, "ingest").writeStream...start()
            q.awaitTermination()
        finally:
            col.close()
        col.batches  # [{'n_rows': ...}, ...] one dict per micro-batch

    ``close()`` (or the context-manager exit) detaches the listener —
    leaked listeners outlive the query and double-count the next one."""

    def __init__(self, spark, name: str):
        from pyspark.sql.streaming import StreamingQueryListener

        self.batches: list[dict] = []
        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                om = event.progress.observedMetrics
                if name in om:
                    outer.batches.append(om[name].asDict())

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self._listener = _L()
        self._spark = spark
        spark.streams.addListener(self._listener)

    def close(self) -> None:
        self._spark.streams.removeListener(self._listener)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def plan_summary(df) -> dict:
    """Executed-plan shape counters for plan-regression guards: parquet
    scans, shuffle exchanges, broadcast/sort-merge joins, Python
    evaluation nodes, and whether any pushed filter reached a scan.
    This is the measurement behind SCALE.md's plan-evidence table and
    the tests that pin plan shapes — kept as engine API so a deployment
    can alert when a code change regresses a plan (e.g. a lost
    broadcast or a new Python hot path), not just when it slows down.

    Uses the CURRENT query execution: call after an action for the
    AQE-final plan, or directly for the static plan. On classic
    sessions this reads ``queryExecution().executedPlan()`` via py4j;
    under Spark Connect (no ``_jdf``) it falls back to capturing the
    public ``explain()`` output in "simple" mode, which renders the
    physical plan with the same inline tokens the counters match
    (``Exchange hashpartitioning(...)``, ``FileScan parquet``,
    ``PushedFilters: [...]``) — "formatted" mode would NOT work, it
    splits node names from their arguments.
    """
    import re

    try:
        jdf = df._jdf  # classic py4j session
    except Exception:
        jdf = None
    if jdf is not None:
        plan = jdf.queryExecution().executedPlan().toString()
    else:  # Spark Connect: capture the public explain output
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="simple")
        plan = buf.getvalue()
    # an executed AQE plan prints "== Final Plan ==" followed by
    # "== Initial Plan ==" — counting both would double every metric,
    # so keep only the final section when the marker is present
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==", 1)[0]
    return {
        "parquet_scans": len(re.findall(r"FileScan parquet", plan)),
        "shuffles": len(
            re.findall(
                r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)", plan
            )
        ),
        "broadcast_joins": len(
            re.findall(r"BroadcastHashJoin|BroadcastNestedLoop", plan)
        ),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "python_eval_nodes": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas", plan)
        ),
        "has_pushed_filters": (
            "PushedFilters: [" in plan and "PushedFilters: []" not in plan
        ),
    }


def plan_diff(before, after) -> dict:
    """Plan-regression report between two versions of a query: the
    plan_summary counter deltas plus named verdicts for the regressions
    worth alerting on (lost broadcast, new shuffles, new Python nodes,
    lost pushdown). Wire it across a refactor or a dependency bump —
    the numbers come from the same executed-plan counters the plan
    tests pin, so an alert here means the physical plan really moved."""
    a, b = plan_summary(before), plan_summary(after)
    deltas = {k: b[k] - a[k] for k in a if isinstance(a[k], int)}
    return {
        "before": a,
        "after": b,
        "deltas": deltas,
        "lost_broadcast": b["broadcast_joins"] < a["broadcast_joins"],
        "new_shuffles": b["shuffles"] > a["shuffles"],
        "new_python_nodes": b["python_eval_nodes"] > a["python_eval_nodes"],
        "lost_pushdown": a["has_pushed_filters"] and not b["has_pushed_filters"],
    }
