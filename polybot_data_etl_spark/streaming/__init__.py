"""Structured Streaming jobs (SURVEY.md §2 #67-70)."""
