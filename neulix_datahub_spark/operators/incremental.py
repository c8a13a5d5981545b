"""Incremental maintenance of materialized aggregates from a change
feed — recompute cost proportional to the CHANGES, not the table.

The reference's warehouse surface re-runs dashboard SQL from scratch on
every poll (``core/utils/db_core.py:119-135``); at 100 TB a full
recompute of ``GROUP BY k: count, sum`` per refresh is the single
largest avoidable cost in a reporting pipeline. Count/sum (and anything
derived from them: mean, ratios) form a commutative group — each row's
contribution can be ADDED on insert and SUBTRACTED on delete — so a
feed carrying pre-images (``snapshot_diff(..., pre_image=True)``, the
Delta CDF row protocol) is enough to maintain the aggregate exactly:

    update_preimage  -> subtract old row's contribution
    update_postimage -> add new row's contribution

which also handles rows whose GROUP KEY changes (the pre-image leaves
the old group, the post-image enters the new one) — the case a naive
"overwrite changed keys" consumer gets wrong.

Plan: the feed aggregates map-side to one delta row per touched group
(O(|changes|) shuffle), then one outer join against the existing
aggregate (broadcast when the delta side is small, which it is by
construction). The maintained result is proven equal to a full
recompute by the ``incremental_agg_check`` driver query and the
round-trip law unit.

Caveat (documented, inherent): float sums accumulate in a different
order than a recompute, so equality is exact for counts/ints and
within-1e-9-relative for doubles; long-running pipelines should
periodically re-snapshot the aggregate (same answer, fresh float error)
— standard practice for any incremental view maintenance system.
Maintain money columns as DECIMAL to make the sums associative and the
maintained value EXACTLY equal to a recompute forever (the fill zeros
below are type-preserving, so decimal columns stay decimal through the
merge).

NULL conventions (both deliberate, both required for the delta algebra
to be exact):

- **Group keys are null-safe.** A NULL group key is one group, exactly
  as ``groupBy`` treats it — the merge join matches on ``eqNullSafe``,
  because a null-unsafe join would never match the stored NULL-key row
  with its delta and the group would silently fork into two rows, one
  per batch.
- **Sums are SUM0 (0-coalesced).** A group whose values are all NULL
  reports sum 0, not SQL's NULL. This is what makes signed maintenance
  exact under DELETES: "remove the last non-null value" must land on a
  concrete 0 — no sum-only state can know it should snap back to NULL
  without also maintaining per-column non-null counts. Seed aggregates
  with ``coalesce(sum(x), 0)`` and compare recomputes the same way
  (the Druid/Calcite SUM0 convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SIGN = {
    "insert": 1,
    "update_postimage": 1,
    "delete": -1,
    "update_preimage": -1,
}


def agg_delta(
    feed: DataFrame, group_cols: list[str], sum_map: dict[str, str]
) -> DataFrame:
    """Collapse a pre-image change feed into one signed delta row per
    touched group: ``__dcnt`` (row-count delta) and one ``__d_<out>``
    per maintained sum. ``sum_map`` maps output sum-column name ->
    source column in the feed."""
    if "_change_type" not in feed.columns:
        raise ValueError("feed must carry _change_type (snapshot_diff pre_image=True)")
    sign = F.col("_change_type")
    adds = [t for t, s in _SIGN.items() if s == 1]
    subs = [t for t, s in _SIGN.items() if s == -1]
    sign_val = (
        F.when(sign.isin(*adds), F.lit(1))
        .when(sign.isin(*subs), F.lit(-1))
        .otherwise(F.raise_error(F.concat(F.lit("unknown _change_type: "), sign)))
    )
    return (
        feed.withColumn("__sign", sign_val)
        .groupBy(*group_cols)
        .agg(
            F.sum("__sign").alias("__dcnt"),
            *[
                F.sum(F.col("__sign") * F.col(src)).alias(f"__d_{out}")
                for out, src in sum_map.items()
            ],
        )
    )


def apply_agg_delta(
    agg: DataFrame,
    feed: DataFrame,
    group_cols: list[str],
    count_col: str,
    sum_map: dict[str, str],
) -> DataFrame:
    """Maintain ``agg`` (columns: group_cols + count_col + sum_map
    keys) against a pre-image change feed. Returns the updated
    aggregate: groups whose maintained count reaches zero disappear
    (they have no remaining rows), brand-new groups appear.
    """
    missing = [c for c in (*group_cols, count_col, *sum_map) if c not in agg.columns]
    if missing:
        raise ValueError(f"agg is missing columns: {missing}")
    delta = agg_delta(feed, group_cols, sum_map)
    # NULL-SAFE group match (see module docstring): `on=group_cols`
    # would use null-unsafe equality, so a NULL group key stored in the
    # aggregate could never meet its delta — the group would emit two
    # rows (stale + delta-only) and fork further every batch.
    a, d = agg.alias("__a"), delta.alias("__d")
    cond = None
    for c in group_cols:
        e = F.col(f"__a.{c}").eqNullSafe(F.col(f"__d.{c}"))
        cond = e if cond is None else cond & e
    merged = a.join(d, on=cond, how="full_outer")
    zero = F.lit(0)
    out = merged.select(
        *[
            F.when(F.col(f"__d.__dcnt").isNull(), F.col(f"__a.{c}"))
            .otherwise(F.col(f"__d.{c}"))
            .alias(c)
            for c in group_cols
        ],
        (
            F.coalesce(F.col(f"__a.{count_col}"), zero)
            + F.coalesce(F.col("__d.__dcnt"), zero)
        ).alias(count_col),
        *[
            (
                F.coalesce(
                    F.col(f"__a.{out_col}"),
                    F.lit(0).cast(agg.schema[out_col].dataType),
                )
                + F.coalesce(
                    F.col(f"__d.__d_{out_col}"),
                    F.lit(0).cast(agg.schema[out_col].dataType),
                )
            ).alias(out_col)
            for out_col in sum_map
        ],
    )
    return out.filter(F.col(count_col) > 0)
