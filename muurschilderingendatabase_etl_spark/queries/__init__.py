"""Operator inventory (SURVEY.md §2.3) — importing this package registers
every query with the registry. One module per operator category."""

from muurschilderingendatabase_etl_spark.queries import (  # noqa: F401
    aggregation,
    array_json,
    dedup,
    flagship,
    functions_extra,
    joins,
    multimodal,
    projection,
    quality,
    rdf_graph,
    relational_extras,
    scalar_fns,
    scans,
    setops,
    similarity,
    sort_limit,
    sql_api,
    streaming_windows,
    subqueries,
    timeseries,
    textanalysis,
    udf_surface,
    windows,
)
