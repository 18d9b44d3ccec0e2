"""Oracle verification for the round-10 graduated queries
(plans/round10_queries.py — formerly the next_round.py staging area).

Runs every round-10 query on Spark and its DuckDB oracle twin over the
same sf0.001 parquet, comparing row count, sorted column names, and the
order-insensitive canonical value hash — the identical procedure
tools/check_correctness.py replicates from the driver — plus the
container-type gate (no raw array/map/struct result column may reach
the driver's comparator). Kept after graduation so the newest registry
cohort stays locally pinned at multiple scale factors (CHECK_SF_DIR).

Cohort-specific invariant tests beyond the value-hash oracle live in
tests/test_round10_invariants.py (brute-force second witnesses for the
sweep/sketch/certificate rows) — the staged-era coverage carries over
unchanged since graduation only swaps the registering decorator.
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

import sparkksqldbbenchmark_spark.plans.round10_queries  # noqa: E402,F401
from sparkksqldbbenchmark_spark.plans.registry import (  # noqa: E402
    ORACLE,
    QUERIES,
)

ROUND10 = (
    "bm25_odds_retrieval",
    "interval_coverage_sweep",
    "countmin_heavy_hitters",
    "merkle_range_digest",
    "acf_lag_autocorr",
    "pareto_frontier_skyline",
    "geo_nearest_site_join",
    "geohash_bucket_stats",
    "python_datasource_filter_pushdown",
    "benford_leading_digit",
    "peak_concurrency_sweep",
    "weighted_median_grouped",
    "binned_ks_statistic",
    "gini_concentration_by_type",
    "markov_transition_matrix",
    "udtf_dynamic_schema_analyze",
    "arrow_scalar_udf_suite",
    "cogroup_applyinpandas_reconcile",
    "applyinarrow_group_stats",
    "conversation_render_budget",
    "global_peak_concurrency",
    "json_corrupt_record_handling",
    "ols_trend_by_key",
    "rolling_median_smooth",
    "grouped_gk_quantiles_certified",
    "quantile_normalization_cross_source",
    "minhash_estimate_error_certified",
    "decontam_max_span",
    "pack_composition_audit",
    "collision_probability_suite",
    "fano_burstiness_by_type",
    "pagerank_dupgraph_3iter",
    "hll_union_reaggregate",
    "series_shape_signature_buckets",
    "python_datasource_sink_append_audit",
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


def test_every_round10_query_registered_with_oracle():
    missing = [n for n in ROUND10 if n not in QUERIES or n not in ORACLE]
    assert not missing, f"round-10 queries missing from registry: {missing}"


@pytest.mark.parametrize("name", sorted(ROUND10))
def test_round10_query_matches_oracle(spark, duck, name):
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
