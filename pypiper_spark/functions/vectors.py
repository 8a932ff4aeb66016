"""Vector math over ArrayType(FloatType) columns, pure higher-order
functions (JVM-side, no Python). Shared by the similarity and dedup
queries.

Float discipline: all arithmetic is done in DOUBLE (cast once), sums
are sequential left-folds (F.aggregate) in both engines, and any
cross-engine-compared similarity is rounded to 6 decimals — granularity
~1e8 above the achievable accumulation error for 64-dim vectors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sql_dot(a: str, b: str) -> str:
    """DuckDB twin of dot(): list_dot_product on double lists."""
    return f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def sql_cosine(a: str, b: str) -> str:
    return (
        f"({sql_dot(a, b)} / "
        f"(sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"
    )
