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

# The driver grades at most the FIRST 50 registered queries per round.
# Order is therefore part of the contract. With 71 registered queries the
# policy is ROTATION: every query must hold a driver-graded row from SOME
# round, so queries that have never been graded take head slots and the
# displaced TAIL is drawn from queries that are already green in a prior
# round's CORRECTNESS_r*.json AND whose implementation has not materially
# changed since (their recorded verdict remains valid evidence).
#
# Round-3 rotation: the nine round-3-new queries that r02 never graded
# (streaming_stream_join, cube_rollup_report, tpch_q10_returned_items,
# skewed_agg_salted, skewed_join_replicated, hash_split_assignment,
# dedup_keep_best, window_function_suite, embedding_quantization) move
# into the head; nine r02-green queries whose machinery stays covered by
# graded siblings move out:
#   dedup_clusters             — r02 green; its cluster-labeling CTE is the
#                                exact input of the now-graded dedup_keep_best
#   dedup_simhash              — r02 green; unchanged since
#   similarity_ann_lsh         — r02 green; brute topk + IVF stay graded
#   value_counts               — r02 green; same TakeOrdered shape as the
#                                graded top_k_values
#   station_enrichment_join    — r02 green; J2 twin region_zone_lookup graded
#   group_by_sum_consumption   — r02 green; grouped sums graded via tpch_q1 /
#                                per_station_accumulation
#   validity_filter            — r02 green; predicate machinery ubiquitous in
#                                graded rows
#   numeric_projection_summary — r02 green; same summary-agg shape as the
#                                graded correlation/scalar suites
#   count_distinct_stations    — r02 green; unchanged since
# Carried-over tail (r02-green exact twins of still-graded queries, and the
# two rows-only checks): latest_by_rownumber, weather_window_agg_sql,
# weather_window_agg_by_station, streaming_union_window_agg,
# latest_by_offset, argmax_station, streaming_window_agg,
# dedup_ngram_jaccard, session_window_agg, latency_percentiles,
# multimodal_frame_sample, approx_count_distinct.
#
# All TAIL entries remain registered and keep passing the local oracle
# replica (tools/check_correctness.py); tests/test_contract.py pins that the
# non-TAIL prefix fits in the 50-row window.
TAIL: tuple[str, ...] = (
    "session_window_agg",
    "latency_percentiles",
    "dedup_clusters",
    "dedup_simhash",
    "similarity_ann_lsh",
    "value_counts",
    "station_enrichment_join",
    "group_by_sum_consumption",
    "validity_filter",
    "numeric_projection_summary",
    "count_distinct_stations",
    "latest_by_rownumber",
    "weather_window_agg_sql",
    "weather_window_agg_by_station",
    "streaming_union_window_agg",
    "latest_by_offset",
    "argmax_station",
    "streaming_window_agg",
    "dedup_ngram_jaccard",
    "multimodal_frame_sample",
    "approx_count_distinct",
)

DRIVER_WINDOW = 50


def _ordered_names() -> list[str]:
    head = [n for n in QUERIES if n not in TAIL]
    return head + [n for n in TAIL if n in QUERIES]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's tumbling-window weather aggregation)
    on /root/testdata/sf0.001."""
    return QUERIES["weather_window_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {n: ORACLE[n] for n in _ordered_names() if n in ORACLE}
