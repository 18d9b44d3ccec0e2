"""Scalar/aggregate function catalog (SURVEY.md §2.8) and numerically
stable aggregation helpers."""
