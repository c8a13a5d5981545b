"""Deterministic column tokenization with a reversibility vault — the
privacy layer between ``scrub_pii`` (destructive redaction,
operators/text.py) and ``k_anonymity_profile`` (release auditing,
operators/quality.py).

Pattern: replace an identifying column with a keyed deterministic token
(HMAC-style: sha2 over secret‖value), and store the (token → value)
mapping ONCE in a separate vault table with its own access controls.
Determinism is the operational property: the same value always
tokenizes identically, so JOINS, GROUP BYs, and DISTINCT over the
tokenized column give byte-identical answers to the raw column —
analytics pipelines keep working with zero knowledge of the raw values,
and re-identification is a controlled vault join, not a guess.

Everything is built-in expressions (sha2, concat): codegen'd, no UDFs,
and replayable by any engine that has SHA-256 — which is what lets the
driver hash the tokenized analytics against a DuckDB replay.

Honesty note: sha2(secret‖value) is a practical tokenizer, not a
formal HMAC (no length-extension concern here since tokens are never
verified, only matched); swap in a real KMS-backed FPE/HMAC in
deployments with a crypto policy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_for(col: Column | str, secret: str) -> Column:
    """The deterministic token expression: sha2-256 of secret‖value.
    Null values stay null (no token leaks 'this row had no value')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNotNull(), F.sha2(F.concat(F.lit(secret + ":"), c.cast("string")), 256)
    )


def tokenize_columns(
    df: DataFrame, cols: list[str], secret: str, suffix: str = ""
) -> DataFrame:
    """Replace each listed column with its token (same column name +
    optional suffix). One narrow projection — no shuffle."""
    out = df
    for c in cols:
        out = out.withColumn(c + suffix, token_for(c, secret))
        if suffix:
            out = out.drop(c)
    return out


def build_vault(df: DataFrame, cols: list[str], secret: str) -> DataFrame:
    """The (column, token, value) reversibility vault: one row per
    DISTINCT value per column. Store it separately from the data (its
    access policy IS the privacy boundary); re-identification is a join
    on (column, token). Shuffle carries distinct values only."""
    parts = [
        df.select(
            F.lit(c).alias("column"),
            token_for(c, secret).alias("token"),
            F.col(c).cast("string").alias("value"),
        )
        .filter(F.col("token").isNotNull())
        .distinct()
        for c in cols
    ]
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), parts)


def detokenize(
    df: DataFrame, vault: DataFrame, col: str, out_col: str | None = None
) -> DataFrame:
    """Controlled re-identification: broadcast-join the vault back onto
    a tokenized column. Tokens absent from the vault stay null — a
    token never reverses by computation, only by lookup."""
    v = vault.filter(F.col("column") == col).select(
        F.col("token").alias(col), F.col("value").alias(out_col or f"{col}_value")
    )
    return df.join(F.broadcast(v), col, "left")
