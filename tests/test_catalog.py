"""Catalog: schema guarantees, events normalization, handle memoization."""

import pytest

from pypiper_spark.catalog import EXPECTED_COLUMNS, TABLES, load_table


def test_all_tables_load_with_expected_columns(spark, sf_dir):
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        assert set(EXPECTED_COLUMNS[t]) <= set(df.columns), t


def test_events_ts_is_ntz_microseconds(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    r = ev.orderBy("event_id").select("ts").first()
    assert r.ts.microsecond or r.ts.second  # real sub-second precision survived


def test_money_columns_are_two_decimal(spark, sf_dir):
    """The cents-arithmetic discipline (compare.py) rests on this."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    bad = li.filter(
        F.abs(F.col("l_extendedprice") * 100 - F.round(F.col("l_extendedprice") * 100))
        > 1e-6
    ).count()
    assert bad == 0


def test_handle_memoized_per_session(spark, sf_dir):
    a = load_table(spark, sf_dir, "orders")
    b = load_table(spark, sf_dir, "orders")
    assert a is b


def test_unknown_table_raises(spark, sf_dir):
    with pytest.raises(KeyError, match="unknown table"):
        load_table(spark, sf_dir, "nonexistent")
