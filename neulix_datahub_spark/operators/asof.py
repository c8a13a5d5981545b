"""As-of (time-series) join — a custom operator Spark lacks natively
(SURVEY §2.3 notes range/as-of joins absent from the reference; this is
the training-/event-data extension, the semantics of pandas
``merge_asof`` and DuckDB/kdb ASOF JOIN).

For each left row, attach the latest right row whose timestamp is <= the
left timestamp, per key. The naive formulation is a range join
(quadratic blow-up); the scalable form used here is union + window:

1. tag both sides and union them (same shuffle key: the join key),
2. one window pass ordered by (ts, tag) carries the most recent right
   payload forward (``last(..., ignorenulls=True)``),
3. keep left rows and unpack the carried payload.

One shuffle on the key, one sort within partitions — the plan a
1000-executor cluster wants: no per-row probing, no interval cross
product, skew bounded by events-per-key like any window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    start: str,
    end: str,
    by: str | None = None,
    bin_width: int | None = None,
) -> DataFrame:
    """Interval join: left rows whose ``point`` falls in
    ``[right.start, right.end)`` — with the bin trick that keeps it an
    equi-join at scale.

    A naive ``ON point BETWEEN start AND end`` is a broadcast-nested-loop
    (quadratic) join. Binning both sides to width-``bin_width`` buckets
    (an interval joins every bucket it overlaps) turns it into an
    equi-join on (key?, bin) followed by the exact containment filter —
    the standard interval-join recipe. ``bin_width`` must be >= the
    typical interval length (each interval lands in
    len/bin_width + 1 buckets); None auto-sizes nothing and falls back
    to the naive join, for small inputs / correctness baselines.

    ``point``/``start``/``end`` must be numeric (cast timestamps to epoch
    first).
    """
    if by is not None:
        left = left.withColumnRenamed(by, f"__l_{by}")
        key_conds = [F.col(f"__l_{by}") == F.col(by)]
    else:
        key_conds = []
    contain = (F.col(point) >= F.col(start)) & (F.col(point) < F.col(end))

    if bin_width is None:
        out = left.join(right, [*key_conds, contain])
    else:
        lb = left.withColumn("__lbin", F.floor(F.col(point) / bin_width))
        rb = right.withColumn(
            "__rbin",
            F.explode(
                F.sequence(
                    F.floor(F.col(start) / bin_width),
                    # end is exclusive; (end - 1) avoids registering an
                    # interval in a bucket it only touches at its open edge
                    F.floor((F.col(end) - 1) / bin_width),
                )
            ),
        )
        out = lb.join(
            rb, [F.col("__lbin") == F.col("__rbin"), *key_conds, contain]
        ).drop("__lbin", "__rbin")

    if by is not None:
        # right's key column is redundant after the equi-join
        out = out.drop(by).withColumnRenamed(f"__l_{by}", by)
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance: str | int | float | None = None,
) -> DataFrame:
    """Left as-of join (pandas ``merge_asof`` surface): per ``by`` group,
    ``backward`` picks the latest ``right`` row with ``right.on <=
    left.on``; ``forward`` the earliest with ``right.on >= left.on``.
    ``tolerance`` bounds the staleness — an interval string (``"2
    hours"``) for timestamp keys or a number for numeric keys; matches
    further away revert to null. Right columns (except ``by``/``on``)
    are appended, suffixed on collision; unmatched left rows keep nulls
    (left-outer semantics).

    Ties (equal ``on``): the right row sorts before the left probe (tag
    0 < 1 under either direction's ordering), so an exactly-simultaneous
    right row IS visible — matching DuckDB ASOF (>=) semantics.

    Plan shape is direction-independent: ONE shuffle on ``by`` for the
    union + window carry; no interval product, no range join.

    NULL ``on`` values: a right row with a NULL timestamp is dropped
    (it cannot be "before" or "after" anything — pandas merge_asof
    refuses NaN keys outright; without the drop it would sort to one
    end of the window and be carried into real rows), and a left row
    with a NULL timestamp survives with a NULL match (left-outer
    semantics) instead of inheriting whichever right row happens to
    sort adjacent.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right = right.filter(F.col(on).isNotNull())
    r_payload_cols = [c for c in right.columns if c not in (by, on)]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in r_payload_cols
    }
    r_on_type = right.schema[on].dataType.simpleString()

    l_tagged = left.select(
        F.col(by), F.col(on), F.lit(1).alias("__tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in r_payload_cols
            ) + ">"
        ).alias("__r"),
        F.lit(None).cast(r_on_type).alias("__r_on"),
    )
    r_tagged = right.select(
        F.col(by), F.col(on), F.lit(0).alias("__tag"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{c}`:{left.schema[c].dataType.simpleString()}" for c in left.columns
            ) + ">"
        ).alias("__l"),
        F.struct(*[F.col(c) for c in r_payload_cols]).alias("__r"),
        F.col(on).alias("__r_on"),
    )

    order_on = F.col(on) if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(by)
        .orderBy(order_on, F.col("__tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__rc", F.last("__r", ignorenulls=True).over(w))
        .withColumn("__rc_on", F.last("__r_on", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
        # a NULL left timestamp matches nothing (see docstring)
        .withColumn(
            "__rc", F.when(F.col(on).isNotNull(), F.col("__rc"))
        )
    )
    if tolerance is not None:
        if isinstance(tolerance, str):
            bound = F.expr(f"INTERVAL {tolerance}")
        else:
            bound = F.lit(tolerance)
        if direction == "backward":
            ok = F.col(on) <= F.col("__rc_on") + bound
        else:
            ok = F.col("__rc_on") <= F.col(on) + bound
        carried = carried.withColumn(
            "__rc", F.when(ok, F.col("__rc")).otherwise(F.lit(None))
        )
    return carried.select(
        *[F.col("__l")[c].alias(c) for c in left.columns],
        *[F.col("__rc")[c].alias(out_names[c]) for c in r_payload_cols],
    )
