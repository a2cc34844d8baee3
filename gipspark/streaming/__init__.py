"""Structured-streaming facet over the ``events`` table (SURVEY.md §2.10)."""
