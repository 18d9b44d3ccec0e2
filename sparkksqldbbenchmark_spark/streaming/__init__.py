"""Structured Streaming layer (SURVEY.md §2.9 T1-T11): declarative
pipeline builder, trigger/output-mode/checkpoint handling, progress
monitoring."""
