"""Structured Streaming operators (SURVEY.md §2.8). Importing registers the
streaming-backed queries."""
