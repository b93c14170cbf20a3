"""Structured Streaming composition of the pipeline (SURVEY.md §2.10)."""
