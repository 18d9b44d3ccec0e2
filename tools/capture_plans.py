"""Capture .explain("formatted") for named queries into plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [names...]
  suffix: "before" or "after" — file becomes plans/$SPARK_GRAFT_PLANS_ROUND/
          <name>_<suffix>.txt (round dir defaults to r18)
  names:  registered query names (default: the bench HEADLINE set plus the
          extended-bench list).

Runs with the same session profile as bench.py (AQE off, 32 shuffle
partitions) so the captured plans are the plans the bench actually times.
Queries whose builders execute eager sub-jobs (localCheckpoint) run those
jobs; the captured explain is of the final returned DataFrame.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sparkksqldbbenchmark_spark.session import SessionConfig, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_NAMES = [
    "weather_window_agg",
    "weather_window_agg_by_station",
    "union_streams_agg",
    "latency_percentiles",
    "multiway_timejoin_ffill",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "per_station_accumulation",
    "dedup_minhash_lsh",
    "similarity_topk_cosine",
    "text_quality_scores",
    "hourly_series_pivot_fold",
    "exact_substring_spans",
    "pagerank_dupgraph_3iter",
    "pca_power_iteration_1d",
    "semdedup_quantized_prune",
    "ngram_lm_familiarity",
    "bm25_odds_retrieval",
    "countmin_heavy_hitters",
    "interval_coverage_sweep",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_NAMES
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r18"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        SessionConfig(
            app_name="capture_plans",
            aqe=False,
            extra={"spark.ui.showConsoleProgress": "false"},
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"  SKIP {name}: not registered", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"capture_plans: {name}")
        df = fn(spark, SF_DIR)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"  {name}: {n_ex} Exchange nodes -> {path}", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
