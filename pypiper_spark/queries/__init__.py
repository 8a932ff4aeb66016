"""Importing this package registers every query in the registry."""

from pypiper_spark.queries import (  # noqa: F401
    aggregates,
    dedup,
    events_streaming,
    extras,
    flagship,
    joins,
    llm_filters,
    llm_prep,
    llm_scoring,
    maintenance,
    modern_aggs,
    modern_sql,
    projections,
    scalar_funcs,
    scans,
    sorts_setops,
    sql_api,
    subqueries,
    text,
    timeseries,
    tpch_shapes,
    udfs,
    vectors,
    windows,
)
from pypiper_spark import multimodal  # noqa: F401,E402  (registers q_multimodal_decode)
