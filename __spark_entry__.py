"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (plus the
LLM-pipeline extensions), (spark, sf_dir) → DataFrame.
``oracle_sql()`` — matching DuckDB ANSI SQL for the correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

# Importing the plan modules populates the registry.
import sparkksqldbbenchmark_spark.plans.reference_queries  # noqa: F401

try:
    import sparkksqldbbenchmark_spark.plans.llm_queries  # noqa: F401
except ImportError:
    pass
try:
    import sparkksqldbbenchmark_spark.plans.streaming_queries  # noqa: F401
except ImportError:
    pass
try:
    import sparkksqldbbenchmark_spark.plans.ksql_queries  # noqa: F401
except ImportError:
    pass
try:
    import sparkksqldbbenchmark_spark.plans.extended_queries  # noqa: F401
except ImportError:
    pass
try:
    import sparkksqldbbenchmark_spark.plans.curation_queries  # noqa: F401
except ImportError:
    pass

from sparkksqldbbenchmark_spark.plans.registry import ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's tumbling-window weather aggregation)
    on /root/testdata/sf0.001."""
    return QUERIES["weather_window_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
