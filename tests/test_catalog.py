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


def test_runtime_confs_respect_explicit_shuffle_partitions(spark):
    """ADVICE r10 (medium): catalog.load_table re-applies
    apply_runtime_confs on every uncached load; with partition sizing
    baked into RUNTIME_CONFS that silently reset the suite's explicit
    8 back to core count. apply_runtime_confs may only resize a
    session still carrying Spark's stock default of 200."""
    from pypiper_spark.session import apply_runtime_confs

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # explicit non-default choice must survive a re-apply
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        apply_runtime_confs(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
        # the stock default means "nobody chose" — gets core-sized
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        apply_runtime_confs(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") != "200"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_explicit_shuffle_partitions_survive_uncached_load_table(spark, sf_dir):
    """VERDICT r11 #7b: the same guarantee exercised THROUGH the real
    path — an UNCACHED load_table call (which re-applies
    apply_runtime_confs) must not stomp an explicit caller-sized
    shuffle-partition conf."""
    from pypiper_spark.catalog import _HANDLE_CACHE

    before = spark.conf.get("spark.sql.shuffle.partitions")
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"), "region")
    evicted = _HANDLE_CACHE.pop(key, None)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        load_table(spark, sf_dir, "region")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
        if evicted is not None:
            _HANDLE_CACHE[key] = evicted


def test_table_num_rows_directory_parquet_and_geometry(tmp_path):
    """ADVICE r10: directory-style parquet tables raised
    IsADirectoryError inside the old row-count helpers, which was
    swallowed into n=0 — silently selecting the small-corpus simhash
    geometry at ANY scale. table_num_rows must sum part-file footers,
    and _sh_geometry must pick the wide regime on a directory table
    above the threshold."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pypiper_spark.fingerprint import table_num_rows
    from pypiper_spark.queries.dedup import _SH_WIDE_ROWS, _sh_geometry

    d = tmp_path / "documents.parquet"
    d.mkdir()
    half = _SH_WIDE_ROWS // 2 + 1
    for i, name in enumerate(["part-0.parquet", "part-1.parquet"]):
        pq.write_table(
            pa.table({"doc_id": pa.array(range(i * half, (i + 1) * half))}),
            d / name,
        )
    (d / "_SUCCESS").write_text("")  # marker files must be ignored
    assert table_num_rows(str(tmp_path), "documents") == 2 * half
    bits, _, band_bits, interleave, _ = _sh_geometry(str(tmp_path))
    assert (bits, band_bits, interleave) == (64, 16, True)
    # missing table stays 0 (and small regime) rather than raising
    assert table_num_rows(str(tmp_path), "nope") == 0
