"""Batch and streaming sources/sinks (SURVEY.md §3 group A)."""
