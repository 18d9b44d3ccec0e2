"""ksql-style SQL front door (SURVEY.md §3 entry point 2)."""

from sparkksqldbbenchmark_spark.sql.ksql import KsqlFrontDoor, translate_ksql

__all__ = ["KsqlFrontDoor", "translate_ksql"]
