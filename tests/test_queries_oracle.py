"""Mirror of the driver's correctness gate: every oracle-checked query in
the registry must match its DuckDB SQL at sf0.001; rows-only queries must
run and return a stable schema."""

from __future__ import annotations

import pytest

from neulix_datahub_spark.plans.queries import QUERIES
from tests.conftest import SF_DIR
from tests.compare import assert_frames_match

ORACLE_NAMES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, ddb, name):
    spec = QUERIES[name]
    actual = spec.fn(spark, SF_DIR).toPandas()
    expected = ddb.execute(spec.oracle).df()
    assert_frames_match(actual, expected)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
