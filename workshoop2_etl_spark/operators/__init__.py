"""Relational + data-pipeline operators (reference SURVEY.md §2)."""
