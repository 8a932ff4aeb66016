"""Oracle-hash discipline helpers (SURVEY.md section 5.3).

The driver compares Spark results against DuckDB with an
order-insensitive value hash — so values must be *bit-identical*, not
merely close. Two rules, applied on BOTH sides of every query:

1. **Exact decimal aggregation.** Summing doubles is order-dependent;
   partition order differs between engines (and between runs at
   different parallelism). We cast to DECIMAL(30,10) before SUM —
   decimal addition is exact and therefore order-independent — then
   cast the total back to double. Both engines perform the identical
   double->decimal->double conversions, giving bit-equal results at
   any partitioning. This also makes results reproducible on a
   1000-executor cluster, which float sums are not.

2. **Microsecond timestamps, UTC, timestamp_ntz.** See catalog.py.

Floating-point *per-row* arithmetic (x*y, x-y) is IEEE-deterministic
and needs no treatment; only multi-row reductions do. For inherently
float reductions (stddev, corr, cosine) round to a scale whose
granularity is many orders above the achievable error.

**Cast-placement rule (learned from a real 1-ulp failure):** the
double->decimal cast itself is only engine-agnostic when the source
value sits far from a rounding boundary — true for the testdata's
2-decimal money columns, false for a full-precision product like
extendedprice*(1-discount)*(1+tax). So: cast the *raw columns* (huge
margin), then multiply in decimal (exact), never cast a full-precision
double expression. Use ``money2`` for that.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 2 matches the data's decimal precision AND keeps the scaled
# integer below 2^53 for any plausible sum (< 9e13), so the final
# decimal->double conversion is exact in BOTH engines. (At scale 10,
# DuckDB's int128->double path rounds before dividing and can land
# 1 ulp off Spark's correctly-rounded BigDecimal conversion — observed
# at sf0.01.) Raise precision, never scale, for bigger data.
DEC = "decimal(30,2)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str) -> Column:
    """Order-independent (exact) sum of a double column, as double."""
    return F.sum(_c(col).cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / non-null count."""
    c = _c(col)
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB twin of dsum(expr)."""
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(30,2))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB twin of davg(expr)."""
    return f"(CAST(sum(CAST(({expr}) AS DECIMAL(30,2))) AS DOUBLE) / count({expr}))"


def money2(col: Column | str, precision: int = 12) -> Column:
    """Cast a 2-decimal money column to exact decimal for arithmetic."""
    return _c(col).cast(f"decimal({precision},2)")


def sql_money2(expr: str, precision: int = 12) -> str:
    return f"CAST({expr} AS DECIMAL({precision},2))"


def round6(col: Column) -> Column:
    """For inherently-float reductions: granularity 1e-6 >> ~1e-12 error."""
    return F.round(col, 6)
