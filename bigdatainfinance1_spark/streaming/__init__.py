"""Structured Streaming operators (SURVEY.md §2.8). Importing registers the
streaming-backed queries."""

from bigdatainfinance1_spark.streaming import custom_sink, jobs  # noqa: F401
