"""Scalar/text/vector/UDF query surface (SURVEY.md §2 rows 45-61, 71-74)."""
