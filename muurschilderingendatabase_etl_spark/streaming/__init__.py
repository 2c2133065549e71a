"""Structured Streaming operators over the events table (SURVEY.md §2.3
'Streaming')."""
