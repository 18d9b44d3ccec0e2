"""Named query plans: the SURVEY.md §2 operator inventory mapped onto the
TESTDATA tables, each with a DuckDB oracle for the correctness gate."""

from sparkksqldbbenchmark_spark.plans.registry import QUERIES, ORACLE, query

__all__ = ["QUERIES", "ORACLE", "query"]
