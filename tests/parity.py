"""Local replica of the driver's Spark-vs-DuckDB comparison.

The driver compares row-count + schema + order-insensitive value-hash.
We replicate that as: sorted-column, sorted-row, exact-value frame
equality, with dtype canonicalization that preserves *kind* (int vs
float vs string vs timestamp) so genuine schema breaks still fail.
"""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd


def _canon_cell(v):
    """Make cells hashable/sortable and engine-neutral.

    STRICT on complex cells: the real driver's canonicalizer
    (pandas.sort_values over all columns) raises TypeError on
    list/dict cells, so we must too — a tolerant local canon is how
    round 1 shipped 6 driver crashes. Queries must serialize arrays
    and maps (to_json / array_join / flatten) in their final
    projection."""
    if isinstance(v, (list, np.ndarray, dict)):
        raise TypeError(
            f"complex cell {type(v).__name__} in result frame — the real driver "
            "crashes on these; serialize with to_json/array_join in the query"
        )
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return 0.0 if f == 0.0 else f  # collapse -0.0
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, dt.date) and not isinstance(v, dt.datetime):
        return dt.datetime(v.year, v.month, v.day)
    return v


def _kind(series: pd.Series) -> str:
    k = series.dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return "timestamp"
    if k == "b":
        return "bool"
    return "object"


def canonicalize(df: pd.DataFrame) -> tuple[pd.DataFrame, dict[str, str]]:
    df = df.reindex(sorted(df.columns), axis=1)
    kinds = {c: _kind(df[c]) for c in df.columns}
    out = {}
    for c in df.columns:
        s = df[c]
        if kinds[c] == "timestamp":
            s = pd.Series(s).dt.tz_localize(None) if getattr(s.dt, "tz", None) else s
            s = s.astype("datetime64[us]")
            out[c] = s
        else:
            out[c] = s.map(_canon_cell)
    res = pd.DataFrame(out)
    if len(res.columns):
        res = res.sort_values(by=list(res.columns), key=lambda s: s.map(_sort_key)).reset_index(
            drop=True
        )
    return res, kinds


def _sort_key(v):
    # total order across NaN/None/values for deterministic row sort
    if v is None:
        return (0, "")
    if isinstance(v, float) and math.isnan(v):
        return (1, "")
    return (2, str(v))


def assert_query_matches(spark_df, oracle_df: pd.DataFrame, name: str = "") -> None:
    got = spark_df.toPandas() if not isinstance(spark_df, pd.DataFrame) else spark_df
    exp = oracle_df

    assert len(got) == len(exp), f"{name}: row count {len(got)} != oracle {len(exp)}"
    assert sorted(got.columns) == sorted(
        exp.columns
    ), f"{name}: columns {sorted(got.columns)} != oracle {sorted(exp.columns)}"

    gc, gk = canonicalize(got)
    ec, ek = canonicalize(exp)
    for c in gc.columns:
        assert gk[c] == ek[c], f"{name}: column {c!r} kind {gk[c]} != oracle {ek[c]}"

    for c in gc.columns:
        a, b = gc[c], ec[c]
        if gk[c] == "float":
            ok = [
                (x == y)
                or (x is None and y is None)
                or (
                    isinstance(x, float)
                    and isinstance(y, float)
                    and math.isnan(x)
                    and math.isnan(y)
                )
                for x, y in zip(a, b)
            ]
        else:
            ok = [
                (x == y) or (_isnull(x) and _isnull(y)) for x, y in zip(a, b)
            ]
        if not all(ok):
            bad = [i for i, o in enumerate(ok) if not o][:5]
            detail = "\n".join(f"  row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r}" for i in bad)
            raise AssertionError(
                f"{name}: column {c!r} value mismatch ({sum(not o for o in ok)} rows):\n{detail}"
            )


def _isnull(x) -> bool:
    if x is None:
        return True
    if isinstance(x, float) and math.isnan(x):
        return True
    try:
        return pd.isna(x) is True
    except (TypeError, ValueError):
        return False
