"""Oracle verification for the round-9 graduated queries
(plans/round9_queries.py — formerly the next_round.py staging area).

Runs every round-9 query on Spark and its DuckDB oracle twin over the
same sf0.001 parquet, comparing row count, sorted column names, and the
order-insensitive canonical value hash — the identical procedure
tools/check_correctness.py replicates from the driver — plus the
container-type gate (no raw array/map/struct result column may reach
the driver's comparator). Kept after graduation so the newest registry
cohort stays locally pinned at multiple scale factors (CHECK_SF_DIR).

Cohort-specific invariant tests beyond the value-hash oracle live in
their operator test modules (test_video.py, test_substring.py,
test_ngram_lm.py, test_stateful.py, test_pyds.py, test_skew.py,
test_layout.py, test_udf_surface.py) — the staged-era coverage carries
over unchanged since graduation only swaps the registering decorator.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_correctness import (  # noqa: E402
    TABLES,
    canon_rows,
    container_columns,
)

import sparkksqldbbenchmark_spark.plans.round9_queries  # noqa: E402,F401
from sparkksqldbbenchmark_spark.plans.registry import (  # noqa: E402
    ORACLE,
    QUERIES,
)

ROUND9 = (
    "inline_struct_explode",
    "string_suite2",
    "bitwise_suite",
    "width_bucket_histogram",
    "ratio_to_report_share",
    "token_length_log_histogram",
    "pivot_dynamic_two_pass",
    "csv_line_codec_suite",
    "checksum_encoding_suite",
    "video_mjpeg_frame_extract",
    "sql_scripting_variables",
    "identifier_parameterized_query",
    "pipe_syntax_suite",
    "sql_table_function_lateral",
    "json_roundtrip_suite",
    "ngram_lm_familiarity",
    "exact_substring_spans",
    "state_store_reader_audit",
    "partition_overwrite_backfill",
    "schema_evolution_mergeschema",
    "orc_roundtrip_scan",
    "streaming_foreachbatch_exactly_once",
    "python_datasource_stream_sink_roundtrip",
    "mapinarrow_token_stats",
    "aqe_skew_join_split",
    "inmemory_cache_scan",
    "temperature_mixture_quota",
    "pandas_api_on_spark_agg",
    "stat_crosstab_matrix",
    "luhn_pii_check",
    "array_mutation_suite",
    "try_function_suite2",
    "char_octet_length_suite",
)

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def test_every_round9_query_registered_with_oracle():
    missing = [n for n in ROUND9 if n not in QUERIES or n not in ORACLE]
    assert not missing, f"round-9 queries missing from registry: {missing}"


@pytest.mark.parametrize("name", sorted(ROUND9))
def test_round9_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert container_columns(sdf) == [], (
        f"{name}: container-typed result column — the driver's comparator "
        f"cannot hash it; serialize at the query boundary"
    )
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLE[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), (
        f"{name}: rows {len(srows)} vs oracle {len(orows)}"
    )
    sh, slines = canon_rows(scols, srows)
    oh, olines = canon_rows(ocols, orows)
    if sh != oh:
        diff = [
            f"  spark: {a}\n  duck : {b}"
            for a, b in zip(slines, olines)
            if a != b
        ][:5]
        pytest.fail(f"{name}: value hash mismatch\n" + "\n".join(diff))
    assert len(srows) > 0, f"{name}: empty result"
