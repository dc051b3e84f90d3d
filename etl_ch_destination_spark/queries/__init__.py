"""Operator registrations (SURVEY §2). Importing this package registers
every implemented query + oracle into the registry."""

from etl_ch_destination_spark.queries import (  # noqa: F401
    aggregations,
    behavior,
    joins,
    llm_dedup_extra,
    llm_text,
    llm_vectors,
    projection,
    reports,
    reports_supply,
    scalars_complex,
    scd,
    scalars_date,
    scalars_math,
    scalars_string,
    setops,
    sorts,
    sources_sinks,
    streaming_batch,
    timeseries,
    udfs,
    windows,
)
