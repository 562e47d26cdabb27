"""Operator modules. Importing this package registers every query in the
central registry (bigdatainfinance1_spark.registry.QUERIES)."""

from bigdatainfinance1_spark.operators import (  # noqa: F401
    aggregates,
    analytics,
    analytics2,
    analytics3,
    dedup,
    io_etl,
    iterative,
    joins,
    multimodal,
    pipeline,
    pricing,
    relational,
    retrieval,
    scalars,
    scale_patterns,
    similarity,
    text,
    udfs,
    windows,
)
