"""Plan-shaping helpers.

Catalyst's ``PushDownPredicates`` rewrites ``project(expensive).filter(on
derived)`` into ``filter(expensive inlined).project(expensive again)`` —
correct, but it evaluates every expensive expression twice per surviving
row (subexpression elimination does not reach across the Filter/Project
operator boundary). When the projection is a heavy regex/hash stack and
the filter keeps most rows, that inlining is a pessimization.

``filter_computed`` pins such a projection in place by routing the rows
through a one-element ``explode(array(struct(...)))``: predicates that
reference a generator's output cannot be pushed through the ``Generate``
node, so the filter evaluates against the *computed* struct fields and
the expensive projection runs exactly once per row. (A nondeterministic
guard column does NOT work — pushdown only requires the *referenced*
projection fields to be deterministic, siblings don't protect them.)
The barrier is deterministic, JVM-side, shuffle-free; its cost is one
struct wrap + unwrap per row. Use only when the guarded projection is
expensive AND the filter is not very selective; for selective filters the
default pushdown (compute-predicate-first, project survivors) wins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_computed(df: DataFrame, predicate: Column) -> DataFrame:
    """``df.filter(predicate)`` evaluated against ``df``'s already-computed
    columns — Catalyst is prevented from inlining ``df``'s projection into
    the predicate and re-deriving it per row. The predicate's column
    references collapse to struct-field accesses above the Generate
    barrier; the projection below it runs exactly once."""
    packed = df.select(F.explode(F.array(F.struct(*df.columns))).alias("__row"))
    return packed.select("__row.*").filter(predicate)
