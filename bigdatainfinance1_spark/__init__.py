"""bigdatainfinance1_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities surveyed in SURVEY.md (reference Parhamallboje/BigDatainFinance1;
the reference snapshot at /root/reference is empty — see SURVEY.md §0 — so the
capability surface is defined by SURVEY.md §2 and graded by the DuckDB oracle
contract in __spark_entry__.py).

Design rules (SURVEY.md §4):
- DataFrame/SQL API only; Catalyst + Tungsten pick physical strategies.
- Built-in `pyspark.sql.functions` on hot paths; Pandas UDFs only where the
  built-ins genuinely can't express the semantics.
- Broadcast small dims, AQE on, shuffle partitions sized per scale factor.
"""

from bigdatainfinance1_spark.registry import QUERIES, QuerySpec, query
from bigdatainfinance1_spark.session import get_spark
from bigdatainfinance1_spark.sources.catalog import TABLES, load_table, load_tables, register_views

__all__ = [
    "QUERIES",
    "QuerySpec",
    "query",
    "get_spark",
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
]
