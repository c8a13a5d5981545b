"""Fuzzy (edit-distance) matching with blocked joins.

The reference resolves entity collisions by exact key equality only
(pandas merges in ``core/utils/db_core.py``); real catalogs need
tolerance for typos and near-identical names. The scalable shape is the
same as every similarity operator in this engine: a cheap *blocking*
key turns the quadratic all-pairs comparison into a per-block join, and
the expensive verifier (``levenshtein``, JVM built-in) runs only inside
blocks.

Block-key choice is the whole scale story. Edit distance ≤ k implies
the strings share a prefix-or-length structure, so practical blockers
are: first token, length band (len DIV (k+1)), or q-gram signature.
A block key with B-sized blocks costs Σ B² comparisons — bound B (salt
over-large blocks, or intersect two independent blockings) before
trusting this at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_self_pairs(
    df: DataFrame,
    text_col: str,
    *,
    max_dist: int = 2,
    block: Column | None = None,
    max_block: int | None = None,
) -> DataFrame:
    """Distinct unordered pairs of ``text_col`` values within a block
    whose Levenshtein distance is ≤ ``max_dist``.

    Default block = first whitespace token: for multi-word names a small
    edit budget rarely survives a different leading word, and it keeps
    every comparison inside a same-prefix bucket. Returns
    ``(name_a, name_b, dist)`` with ``name_a < name_b`` so each pair
    appears once and output order is deterministic up to sort.

    ``max_block`` bounds the hot-block quadratic (every "John ..." in a
    100 TB catalog sharing one first-token block): blocks split into
    ≤max_block chunks, comparisons run per chunk-pair task
    (:func:`~neulix_datahub_spark.operators.skew.with_pair_tasks`) —
    output identical to the unbounded join, per-task comparisons
    ≤ max_block².

    Plan shape: distinct-project (one shuffle over unique values — tiny
    relative to the corpus), then a per-block equi-join with the
    levenshtein verifier as a join residual. No UDFs; levenshtein is a
    JVM built-in inside codegen.
    """
    blk = (
        block
        if block is not None
        else F.split(F.col(text_col), r"\s+").getItem(0)
    )
    names = df.select(
        F.col(text_col).alias("name"), blk.alias("__blk")
    ).distinct()
    cond = (F.col("a.__blk") == F.col("b.__blk")) & (
        F.col("a.name") < F.col("b.name")
    )
    if max_block is not None:
        from neulix_datahub_spark.operators.skew import with_pair_tasks

        names = with_pair_tasks(names, ["__blk"], max_block, "name")
        cond = (
            cond
            & (F.col("a.__task_i") == F.col("b.__task_i"))
            & (F.col("a.__task_j") == F.col("b.__task_j"))
            & (
                (F.col("a.__chunk") != F.col("b.__chunk"))
                | (F.col("a.__task_i") == F.col("a.__task_j"))
            )
        )
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(b, cond)
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.levenshtein("a.name", "b.name").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


def fuzzy_lookup_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    *,
    max_dist: int = 2,
    how: str = "inner",
) -> DataFrame:
    """Join two tables on approximate string equality: exact matches
    join for free; the fuzzy residual joins inside first-token blocks
    with a distance bound.

    Use for reconciling a dirty feed against a clean dimension (the
    reference's Sheets-vs-warehouse reconciliation, done by exact
    anti-join at ``core/utils/db_core.py:209-235``, upgraded with typo
    tolerance). Broadcast the smaller side when it is a dimension.
    """
    lb = F.split(F.col(left_col), r"\s+").getItem(0)
    rb = F.split(F.col(right_col), r"\s+").getItem(0)
    cond = (lb == rb) & (
        F.levenshtein(F.col(left_col), F.col(right_col)) <= max_dist
    )
    return left.join(right, cond, how)
