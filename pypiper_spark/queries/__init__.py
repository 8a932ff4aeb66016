"""Importing this package registers every query in the registry."""

from pypiper_spark.queries import (  # noqa: F401
    aggregates,
    flagship,
    joins,
    projections,
    scans,
)
