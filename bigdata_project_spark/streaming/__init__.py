"""Structured Streaming layer (SURVEY.md §2.9 — the reference's
declared-but-stubbed EP3 pipeline). Importing registers its queries."""

from bigdata_project_spark.streaming import pipeline  # noqa: F401
