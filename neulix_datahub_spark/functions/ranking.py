"""Driver-side rank attachment for bounded top-k results.

The retrieval query paths all end the same way: a relation already
reduced to at most ``k`` rows (``orderBy().limit(k)`` — planned as
TakeOrderedAndProject — or an index probe's k-row shortlist) needs a
dense ``rank`` column under the same total order. Spelling that as
``row_number().over(Window.orderBy(...))`` is correct but runs through
an unpartitioned WindowExec: every executed plan funnels the input into
ONE partition and logs the "No Partition Defined" warning, and the
warning noise buries any future window that really is unpartitioned
over corpus-sized input.

Since the input is k-bounded BY CONSTRUCTION, the rank is driver work:
collect the k rows in order (bounded driver traffic — the same
contract as the k-means seed draw or the BPE merge collect) and attach
``rank`` by enumeration in a local relation. No Window, no extra
checkpoint; downstream joins see a tiny local relation they can
broadcast. Values are exact: doubles/longs round-trip the collect and
re-create losslessly, and the enumeration order is the collected
``orderBy`` order, which must be a TOTAL order (callers tie-break on
the id column) — identical to what row_number would assign.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.types import IntegerType, StructField, StructType


def local_relation(
    spark: SparkSession, data: list[tuple], schema: StructType | str
) -> DataFrame:
    """Bounded driver-side rows as a true LocalRelation.

    ``spark.createDataFrame(list, schema)`` takes the pickled-RDD path
    (``applySchemaToPythonRDD``): the rows live as pickled bytes behind
    a PythonRDD scan that re-runs a Python worker on EVERY action —
    measured 0.3–4.5 s per evaluation for 8 rows, and a crossJoin of
    two such relations schedules a cores² task cartesian. Routing the
    same rows through a pandas frame (Arrow conversion path) lands them
    as a ``LocalTableScan`` — JVM-resident, ~0.1 s per action, and the
    planner can broadcast it without running any task. Values are
    unchanged: doubles/longs/strings/arrays round-trip pandas object
    columns and the Arrow writer casts to the explicit schema."""
    import pandas as pd

    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    names = [f.name for f in schema.fields]
    pdf = pd.DataFrame(
        {
            n: pd.Series([row[i] for row in data], dtype=object)
            for i, n in enumerate(names)
        },
        columns=names,
    )
    return spark.createDataFrame(pdf, schema)


def ranked_topk(
    df: DataFrame,
    order: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``k`` of ``df`` under the total order ``order`` with a dense
    1-based ``rank_col`` attached, as a LOCAL relation (schema = df's
    fields + ``rank_col`` int). ``order`` must be a total order or the
    ranks are not deterministic."""
    rows = df.orderBy(*order).limit(k).collect()
    schema = StructType(
        list(df.schema.fields)
        + [StructField(rank_col, IntegerType(), False)]
    )
    data = [tuple(r) + (i + 1,) for i, r in enumerate(rows)]
    return local_relation(df.sparkSession, data, schema)
