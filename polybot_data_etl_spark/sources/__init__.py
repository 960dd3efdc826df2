"""File connectors + sinks (SURVEY.md §2 #3-5)."""
