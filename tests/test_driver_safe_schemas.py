"""Every registered query must emit a driver-safe (flat) schema.

The driver canonicalizes result frames with pandas.sort_values over all
columns, which raises TypeError on list/dict cells — so an array/map/
struct final column is a guaranteed driver-side crash regardless of
whether the values are right (round-1 lesson: 6 queries shipped that
way while the tolerant local harness reported green). This test builds
every query's plan (schema only, no execution) and rejects complex
output columns at the registry level.
"""

import pytest

from pypiper_spark.registry import all_queries, assert_driver_safe_schema

QS = all_queries()


@pytest.mark.parametrize("name", sorted(QS))
def test_output_schema_is_driver_safe(spark, sf_dir, name):
    df = QS[name].fn(spark, sf_dir)
    assert_driver_safe_schema(df, name)
