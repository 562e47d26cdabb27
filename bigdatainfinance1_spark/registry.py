"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers here as a named query with an
optional DuckDB oracle SQL. ``__spark_entry__.py`` exposes this registry to
the driver verbatim; tests iterate it to hash-check Spark vs DuckDB locally
before the driver does.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver's weaker rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a (spark, sf_dir) -> DataFrame query.

    ``oracle`` is the equivalent DuckDB SQL over the pre-registered views
    (region nation customer supplier part orders lineitem events documents
    embeddings). Column names/aliases MUST match the Spark output exactly —
    the driver sorts columns by name before value-hashing.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags)
        return fn

    return deco


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every operator module so their @query decorators run."""
    import bigdatainfinance1_spark.operators  # noqa: F401
    import bigdatainfinance1_spark.streaming  # noqa: F401

    return QUERIES
