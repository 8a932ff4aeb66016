"""Sinks and non-parquet sources (SURVEY.md 2B: sink row; reference
A15 Printer/terminal-consumer analog).

Parquet is the primary format (columnar, statistics, pushdown); CSV
and JSON exist for interchange. Writers take ``partition_by`` because
at 100 TB an unpartitioned output directory is an anti-pattern: the
partition columns are what lets the NEXT query's scan prune.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "csv", "json")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {FORMATS}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def read_table_any(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: T.StructType | str | None = None
) -> DataFrame:
    """Read back what write_table wrote. CSV/JSON are schema-on-read
    text formats: pass the schema explicitly (inference is a full
    extra pass and guesses types — never in a prod path)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.format(fmt).load(path)
