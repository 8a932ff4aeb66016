"""Query registry: the single source of truth the driver contract
(__spark_entry__.py) and the local parity tests both read.

Every operator from SURVEY.md section 2B registers itself here with a
Spark implementation and (when SQL-expressible) a DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL twin; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""
    # Oracle FACTORY for twins that must inline a corpus-derived
    # artifact as SQL literals (e.g. the persisted KMeans centroids):
    # called with the sf_dir the oracle will run against, returns the
    # SQL. Static `oracle` strings stay the default — a factory is
    # only for oracles that cannot be written down at import time.
    oracle_factory: Callable[[str], str] | None = None

    @property
    def has_oracle(self) -> bool:
        return self.oracle is not None or self.oracle_factory is not None


def resolve_oracle(spec: QuerySpec, sf_dir: str) -> str | None:
    """The DuckDB twin SQL for ``spec`` against the corpus at
    ``sf_dir`` — the static string when one exists, else the factory
    output (which may build/load the corpus-keyed artifact it inlines,
    exactly like the Spark side of the same query would)."""
    if spec.oracle is not None:
        return spec.oracle
    if spec.oracle_factory is not None:
        return spec.oracle_factory(sf_dir)
    return None


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    oracle_factory: Callable[[str], str] | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        if oracle is not None and oracle_factory is not None:
            raise ValueError(f"{name!r}: pass oracle OR oracle_factory, not both")
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            tags=tuple(tags),
            doc=fn.__doc__ or "",
            oracle_factory=oracle_factory,
        )
        return fn

    return deco


def assert_driver_safe_schema(df: DataFrame, name: str = "") -> None:
    """Reject array/map/struct output columns.

    The driver canonicalizes result frames with pandas.sort_values over
    all columns, which raises TypeError on list-valued cells — any
    complex final column is therefore a guaranteed driver-side crash
    (round-1 lesson: 6 queries shipped that way). Queries must
    serialize complex values (to_json / array_join / flatten to
    scalars) in their final projection."""
    from pyspark.sql import types as T

    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    if bad:
        raise TypeError(
            f"query {name or '<unnamed>'} has driver-unsafe output columns "
            f"({', '.join(bad)}); serialize them in the final projection"
        )


def all_queries() -> dict[str, QuerySpec]:
    """Import all query modules and return the full registry."""
    import pypiper_spark.queries  # noqa: F401  (import populates registry)

    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    return all_queries()[name]
