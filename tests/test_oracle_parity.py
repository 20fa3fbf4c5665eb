"""Driver-protocol parity: every registered query with an oracle must
match DuckDB exactly at sf0.01 (the driver's correctness gate scale).

This file auto-covers every query added to the registry — adding an
operator without passing here means the driver's CORRECTNESS gate would
fail too.
"""

import pytest

from flink_join_scaling_spark import plans
from tests.conftest import SF_ORACLE
from tests.oracle_utils import assert_parity

ORACLE_QUERIES = sorted(n for n, s in plans.QUERIES.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in plans.QUERIES.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    spec = plans.QUERIES[name]
    assert_parity(spec.fn(spark, SF_ORACLE), spec.oracle, SF_ORACLE)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    spec = plans.QUERIES[name]
    df = spec.fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
