"""The gate: every registered query with an oracle must match DuckDB
exactly, the same comparison the driver runs (SURVEY.md section 5.2.1).
"""

import pytest

from pypiper_spark.registry import all_queries
from tests.parity import assert_query_matches

SPECS = sorted(all_queries().values(), key=lambda s: s.name)
WITH_ORACLE = [s for s in SPECS if s.oracle is not None]
ROWS_ONLY = [s for s in SPECS if s.oracle is None]


@pytest.mark.parametrize("spec", WITH_ORACLE, ids=lambda s: s.name)
def test_oracle_parity(spark, oracle, sf_dir, spec):
    got = spec.fn(spark, sf_dir)
    exp = oracle.sql(spec.oracle).df()
    assert_query_matches(got, exp, name=spec.name)


@pytest.mark.parametrize("spec", ROWS_ONLY, ids=lambda s: s.name)
def test_rows_only_runs(spark, sf_dir, spec):
    """Rows-only queries must at least run and return a stable schema."""
    df = spec.fn(spark, sf_dir)
    assert df.columns, f"{spec.name}: no columns"
    assert df.count() >= 0
