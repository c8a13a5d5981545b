"""Edge adapters (SURVEY §2 stage 8): the reference's external-service
surfaces re-expressed as thin, testable boundaries around the engine.

Design rule (SURVEY §7.0): the engine core is DataFrame-in/DataFrame-out;
external services touch data only at sinks via ``foreachPartition`` /
``toLocalIterator`` on *bounded* results. Every adapter here separates the
pure, oracle-testable transformation from the service call, and the
service call itself is injectable (a callable), so tests exercise the full
path without credentials or network.

Reference citations per adapter are in the docstrings.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from functools import reduce
from operator import and_

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neulix_datahub_spark.functions.cleaning import find_col, parse_flag, project_to_header


# ---------------------------------------------------------------------------
# Firestore-shaped document store (IO13/IO14, EP3)
# ---------------------------------------------------------------------------

def document_query(
    df: DataFrame,
    filters: dict[str, object] | None = None,
    order_by: str | None = None,
    descending: bool = False,
    limit: int | None = None,
) -> DataFrame:
    """IO13/EP3: the reference's Firestore query builder
    (``db_core.py:235-270``) — conjunctive equality filters, then
    order_by, then limit — composed as DataFrame ops. Catalyst collapses
    it to one Scan+Filter+TakeOrdered plan.

    Filters compare null-SAFELY: Firestore's ``== None`` matches
    documents whose field is null, while a plain ``==`` against a None
    literal is three-valued NULL and silently matches nothing. For
    non-None filter values the two spellings select identical rows
    (NULL cells fail both). ``limit`` follows the reference's
    ``if limit:`` truthiness — 0/None mean NO limit, not "return
    nothing" (``db_core.py:252-256``)."""
    out = df
    if filters:
        out = out.filter(
            reduce(and_, [F.col(k).eqNullSafe(F.lit(v)) for k, v in filters.items()])
        )
    if order_by is not None:
        out = out.orderBy(F.desc(order_by) if descending else F.asc(order_by))
    if limit:
        out = out.limit(limit)
    return out


def upsert_to_document_store(
    df: DataFrame,
    id_column: str,
    write_batch: Callable[[list[dict]], None],
    batch_size: int = 500,
) -> int:
    """IO14: batched document upsert sink (``db_core.py:272-337`` — commit
    every 500 ops). Runs on the executors via ``foreachPartition``; the
    service client is the injected ``write_batch`` callable. Returns the
    row count (the reference logs it, ``db_core.py:333``).

    The id column is validated up front (the reference aborts before
    any write, ``db_core.py:283-289``) — a KeyError inside
    foreachPartition would surface as an executor task failure AFTER
    earlier partitions already committed to the store. The frame is
    pinned (localCheckpoint) so the counted rows and the written rows
    are the SAME evaluation — count + foreachPartition over a
    nondeterministic lineage (sample, limit, rand) could otherwise
    write a different set than it reports."""
    if id_column not in df.columns:
        raise ValueError(
            f"id column {id_column!r} not in DataFrame columns {df.columns}"
        )
    id_c = id_column

    def sink(rows: Iterable) -> None:
        batch: list[dict] = []
        for row in rows:
            d = row.asDict(recursive=True)
            d["__doc_id"] = str(d[id_c])  # doc_id = str(row[id]) (db_core.py:308-312)
            batch.append(d)
            if len(batch) >= batch_size:
                write_batch(batch)
                batch = []
        if batch:
            write_batch(batch)

    df = df.localCheckpoint(eager=True)
    n = df.count()
    if n == 0:  # empty-input guard (db_core.py:351-353)
        return 0
    df.foreachPartition(sink)
    return n


# ---------------------------------------------------------------------------
# Sheets-shaped string grid (IO18/IO19/IO21, J1 composite)
# ---------------------------------------------------------------------------

def grid_to_dataframe(spark: SparkSession, rows: list[list[str]]) -> DataFrame:
    """IO18: header-row string grid → all-string DataFrame
    (``sheets_core.py:153-161``: row 0 is the header). Ragged rows are
    padded/truncated to the header width like the Sheets API returns them.
    The schema is built as a StructType, not a DDL string — real sheet
    headers contain blanks and backticks that break DDL parsing."""
    from pyspark.sql.types import StringType, StructField, StructType

    header, body = rows[0], rows[1:]
    width = len(header)
    fixed = [tuple((r + [""] * width)[:width]) for r in body]
    schema = StructType([StructField(h, StringType()) for h in header])
    return spark.createDataFrame(fixed, schema=schema)


def dedupe_append_to_grid(
    existing_rows: list[list[str]],
    incoming: DataFrame,
    id_column: str,
    append: Callable[[list[list[str]]], int],
    batch_size: int = 10_000,
) -> int:
    """The reference's homologation composite (J1 + F1/F2 + IO19,
    ``sheets_core.py:163-228``): resolve the id column case-insensitively,
    collect existing non-blank ids, anti-join, project to the grid header,
    append via the injected writer. Returns rows appended."""
    spark = incoming.sparkSession
    header = existing_rows[0] if existing_rows else incoming.columns
    grid = grid_to_dataframe(spark, existing_rows) if len(existing_rows) > 1 else None

    # Incoming side: F2 substring resolution (caller's own frame).
    # GRID side: EXACT case-insensitive match only, raising when absent —
    # the reference's ID_COLUMN_NOT_IN_SHEET posture
    # (sheets_core.py:179-186). A substring fallback here could latch
    # onto an unrelated column ('paid' for 'id') and anti-join away
    # incoming rows on coincidental values, and silently SKIPPING dedupe
    # when the header lacks the id would append duplicates on every run.
    inc_id = find_col(incoming, id_column) or id_column
    out = incoming
    if grid is not None:
        grid_id = next(
            (c for c in grid.columns
             if c.strip().lower() == id_column.strip().lower()),
            None,
        )
        if grid_id is None:
            raise ValueError(
                f"ID_COLUMN_NOT_IN_SHEET: {id_column!r} not in grid header "
                f"{grid.columns}"
            )
        existing_ids = (
            grid.select(F.trim(F.col(grid_id)).alias("__id"))
            .filter(F.col("__id") != "")
            .distinct()
        )
        out = out.join(
            F.broadcast(existing_ids),
            F.trim(out[inc_id].cast("string")) == existing_ids["__id"],
            "left_anti",
        )
    # The grid's header may spell the id differently (' Id ' vs 'id') —
    # align the incoming column to the header name before projecting.
    header_id = next((h for h in header if h.strip().lower() == inc_id.strip().lower()), None)
    if header_id is not None and header_id != inc_id:
        out = out.withColumnRenamed(inc_id, header_id)
    out = project_to_header(out, header)

    appended = 0
    batch: list[list[str]] = []
    for row in out.toLocalIterator():  # bounded result at the sink boundary
        batch.append(list(row))
        if len(batch) >= batch_size:
            appended += append(batch)
            batch = []
    if batch:
        appended += append(batch)
    return appended


def check_allowed_values(df: DataFrame, column: str, allowed: tuple[str, ...] = ("SIM", "NAO")) -> bool:
    """IO21 engine analogue: the ONE_OF_LIST validation
    (``sheets_core.py:230-273``) as a CHECK-constraint assertion."""
    return df.filter(~F.col(column).isin(*allowed) & F.col(column).isNotNull()).isEmpty()


def flag_columns(df: DataFrame, flags: dict[str, str]) -> DataFrame:
    """F7 flag derivation (``sheets_core.py:86-92``): for each
    (output_name → source column), resolve the source case-insensitively
    and parse its messy boolean."""
    out = df
    for out_name, source in flags.items():
        resolved = find_col(df, source)
        out = out.withColumn(out_name, parse_flag(resolved) if resolved else F.lit(False))
    return out


# ---------------------------------------------------------------------------
# Email / alert sink (IO23)
# ---------------------------------------------------------------------------

def alert_attachment(df: DataFrame, max_rows: int = 100_000) -> tuple[str, int]:
    """IO23: bounded DataFrame → CSV attachment body
    (``logs.py:153-219`` attach_dataframe). Guard: alerts are small; a
    result larger than ``max_rows`` is a pipeline bug, not an email."""
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(f"alert attachment exceeds {max_rows} rows; aggregate first")
    return pdf.to_csv(index=False), len(pdf)


# ---------------------------------------------------------------------------
# Path-based task exchange (IO24)
# ---------------------------------------------------------------------------

def task_output(df: DataFrame, path: str) -> dict[str, object]:
    """IO24: inter-task exchange carries *paths*, never data
    (SURVEY §2.1 IO24, 100 TB rule). Writes parquet, returns the manifest
    dict an orchestrator (Airflow XCom) would pass downstream."""
    df.write.mode("overwrite").parquet(path)
    return {"path": path, "format": "parquet"}


def task_input(spark: SparkSession, manifest: dict[str, object]) -> DataFrame:
    """IO24 inverse: manifest → DataFrame."""
    assert manifest.get("format") == "parquet"
    return spark.read.parquet(str(manifest["path"]))
