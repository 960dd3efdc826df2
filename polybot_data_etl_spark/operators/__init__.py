"""Relational operator query surface (SURVEY.md §2 rows 1-44, 62-66)."""
