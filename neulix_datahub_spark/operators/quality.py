"""Declarative data-quality constraints (the reference's homologation
tier, generalized).

The reference enforces quality operationally: reviewer flag columns
(``sanity_check``/``quality_check``, ``sheets_core.py:86-92``), dropdown
validation, and ad-hoc count logging. This module is the engine-side
form a 100 TB pipeline needs instead: CONSTRAINTS declared as data, all
row-level checks fused into ONE aggregation pass over the table (the
Deequ/dbt-test shape), relational checks (uniqueness, referential
integrity) each one shuffle — never a per-check table scan.

A check is a ``Check`` row; ``run_checks`` returns one result row per
check: ``(check, passed, violations, total_rows)``. Use it as a gate
(``all(passed)``) or land the report in the ops log.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named constraint. ``violations`` is a *row-level* predicate
    counting offending rows (fused into the single agg pass), unless the
    check is relational (unique / foreign key), which carry their own
    plan."""

    name: str
    kind: str  # "row" | "unique" | "fk"
    predicate: Column | None = None  # row: true == VIOLATION
    cols: tuple[str, ...] = ()
    ref: DataFrame | None = None
    ref_col: str | None = None


def not_null(*cols: str) -> list[Check]:
    """One check per column: nulls are violations."""
    return [
        Check(name=f"not_null_{c}", kind="row", predicate=F.col(c).isNull())
        for c in cols
    ]


def in_range(col: str, lo: float | None = None, hi: float | None = None) -> Check:
    """Violation when outside [lo, hi] (None = unbounded) or null."""
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return Check(name=f"range_{col}", kind="row", predicate=cond | F.col(col).isNull())


def values_in(col: str, allowed: Iterable[str]) -> Check:
    """Violation when the value is outside the allowed set (nulls violate
    too — declare nullable enums as not-null + values_in separately)."""
    return Check(
        name=f"values_{col}",
        kind="row",
        predicate=~F.col(col).isin(*list(allowed)) | F.col(col).isNull(),
    )


def matches(col: str, pattern: str, name: str | None = None) -> Check:
    """Violation when the column does not match ``pattern`` (Java regex
    FIND semantics — anchor with ``^...$`` for a full match)."""
    return Check(
        name=name or f"matches_{col}",
        kind="row",
        predicate=~F.col(col).rlike(pattern) | F.col(col).isNull(),
    )


def unique(*cols: str) -> Check:
    """Violation rows = extra rows sharing a duplicated NON-NULL key
    (fully-non-null row count minus distinct count — null keys are
    not_null's business, not uniqueness's). One distinct-count shuffle,
    map-side combined."""
    return Check(name="unique_" + "_".join(cols), kind="unique", cols=tuple(cols))


def foreign_key(col: str, ref: DataFrame, ref_col: str) -> Check:
    """Violation rows = rows whose ``col`` has no match in ``ref``'s
    ``ref_col`` (nulls violate). Left-anti join; at scale the dim side
    is broadcast by AQE when small, shuffled otherwise — no hint forced."""
    return Check(name=f"fk_{col}", kind="fk", predicate=None, cols=(col,),
                 ref=ref, ref_col=ref_col)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all checks; returns ``(check, passed, violations,
    total_rows)`` ordered by check name.

    Plan shape: every row-kind check compiles to one conditional-count
    expression in a SINGLE aggregation over one table scan — adding a
    50th check adds an expression, not a pass. Each unique/fk check adds
    exactly one aggregate job of its own (a distinct-count or an
    anti-join count). Results are unioned driver-side from scalar
    aggregates (bounded: one row per check), not collected data."""
    total = df.count()
    rows: list[tuple[str, bool, int]] = []

    row_checks = [c for c in checks if c.kind == "row"]
    if row_checks:
        agg = df.agg(
            *[
                F.count_if(c.predicate).alias(c.name)
                for c in row_checks
            ]
        ).first()
        for c in row_checks:
            v = int(agg[c.name])
            rows.append((c.name, v == 0, v))

    for c in checks:
        if c.kind == "unique":
            key_set = reduce(
                lambda a, b: a & b, [F.col(x).isNotNull() for x in c.cols]
            )
            r = df.agg(
                (
                    F.count_if(key_set)
                    - F.count_distinct(*[F.col(x) for x in c.cols])
                ).alias("v")
            ).first()
            v = int(r["v"])
            rows.append((c.name, v == 0, v))
        elif c.kind == "fk":
            assert c.ref is not None and c.ref_col is not None
            v = (
                df.select(F.col(c.cols[0]).alias("__k"))
                .join(
                    c.ref.select(F.col(c.ref_col).alias("__k")).distinct(),
                    on="__k",
                    how="left_anti",
                )
                .count()
            )
            rows.append((c.name, v == 0, v))

    spark = df.sparkSession
    from neulix_datahub_spark.functions.ranking import local_relation

    out = local_relation(
        spark,
        [(n, p, v, total) for n, p, v in rows],
        "check string, passed boolean, violations bigint, total_rows bigint",
    )
    return out.orderBy("check")


def k_anonymity_profile(
    df: DataFrame, quasi_cols: list[str], k: int = 10
) -> DataFrame:
    """Re-identification risk under a quasi-identifier set: every row
    whose (quasi_cols) combination is shared by fewer than ``k`` rows is
    re-identifiable to within that group — the k-anonymity criterion.
    Emits one summary row: group/row totals, how many groups and rows
    fall below k, the at-risk row fraction, and the minimum group size
    (the table's effective k).

    The privacy complement to the PII scrubbers in operators/text.py:
    scrubbing removes direct identifiers; this measures whether the
    remaining categorical shape still isolates individuals — the check a
    training-data release runs before publishing per-group statistics.

    Plan: one groupBy over the quasi columns (map-side combined), then a
    single-row reduce over the group histogram — same cost envelope as
    key_skew_profile, and at 100 TB only the histogram crosses the
    second exchange.
    """
    hist = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__c"))
    return hist.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("__c").alias("n_rows"),
        F.sum((F.col("__c") < k).cast("long")).alias("groups_below_k"),
        F.sum(F.when(F.col("__c") < k, F.col("__c")).otherwise(0)).alias(
            "rows_at_risk"
        ),
        F.round(
            F.sum(F.when(F.col("__c") < k, F.col("__c")).otherwise(0))
            / F.sum("__c"),
            6,
        ).alias("at_risk_frac"),
        F.min("__c").alias("effective_k"),
    )


def quarantine_fk_orphans(
    df: DataFrame, col: str, ref: DataFrame, ref_col: str
) -> tuple[DataFrame, DataFrame]:
    """REPAIR counterpart of :func:`foreign_key`: split ``df`` into
    (clean, quarantined) — quarantined rows have no ``ref`` match on
    ``col`` (nulls quarantine too, matching the check's violation
    semantics). The quarantine side keeps every column so the rows are
    re-processable once the dimension catches up — the late-arriving-
    dimension pattern: facts land before their dim row, get quarantined
    instead of dropped or crashing the load, and a later re-run of the
    quarantine against the grown dim drains it.

    Two anti/semi joins over one frame; AQE broadcasts the dim side
    when small. Deterministic split: clean ∪ quarantined == df exactly.
    """
    keys = ref.select(F.col(ref_col).alias(col)).distinct()
    clean = df.join(keys, col, "left_semi")
    quarantined = df.join(keys, col, "left_anti")
    return clean, quarantined


def portable_table_checksum(df: DataFrame, cols: list[str]) -> "DataFrame":
    """Order- and partitioning-independent CONTENT checksum over the
    listed columns, portable across engines: per row, a 60-bit integer
    from the md5 of the delimited column rendering; the checksum is
    ``(row_count, exact integer SUM of the row keys)`` — addition is
    commutative, the sum stays exact in a 38-digit decimal, and md5 is
    replayable anywhere, so two systems can verify a migration landed
    identical content without co-locating the data or agreeing on row
    order.

    Restrict ``cols`` to string/integer/date columns (or pre-normalize
    floats to fixed-point ints first): float→string rendering is the
    one thing engines do NOT agree on. The unit separator (0x1f) guards
    against concat ambiguity ('ab','c' vs 'a','bc').

    Nulls are encoded EXPLICITLY: every field is rendered as a 1-char
    null flag ('1' null / '0' present) followed by the value ('' for
    null). A separator-join that simply skips or blanks nulls would
    make ``(a, NULL, b)`` and ``(a, b, NULL)`` collide — a migration
    that shifts values between columns would then validate as
    identical; the flag keeps every (nullness, value) field distinct.
    The SQL mirror (plans/queries_scale.py ``_MIG_SQL``) replays the
    same flag+value rendering so both engines agree on null-bearing
    tables too.
    """
    rendered = F.concat_ws(
        "\x1f",
        *[
            F.concat(
                F.when(F.col(c).isNull(), F.lit("1")).otherwise(F.lit("0")),
                F.coalesce(F.col(c).cast("string"), F.lit("")),
            )
            for c in cols
        ],
    )
    key = F.conv(F.substring(F.md5(rendered), 1, 15), 16, 10).cast("decimal(38,0)")
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(key).cast("decimal(38,0)").cast("string").alias("content_sum"),
    )
