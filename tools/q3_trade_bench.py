"""Measure the tpch_q3 SHUFFLE_MERGE-pin trade BOTH ways, at bench scale
and at synthetic 100M-row scale (VERDICT r09 ask #4).

Context: at the test SFs Catalyst auto-BROADCASTS the filtered lineitem
side of orders⋈lineitem (it fits the 10 MB threshold there) — a plan
that cannot exist at 100 TB, where lineitem is the biggest table. The
registry query (plans/reference_queries.py tpch_q3_shipping_priority)
pins SHUFFLE_MERGE on that join (commit 4590f4e). This tool measures
the pinned plan against an un-pinned twin (identical except for the
hint) so docs/DESIGN_100TB.md carries the crossover with numbers
instead of an assertion.

Run: python tools/q3_trade_bench.py [synthetic_lineitem_millions]
     (default 100; pass 0 to skip the synthetic phase)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from sparkksqldbbenchmark_spark.functions.stable import stable_sum
from sparkksqldbbenchmark_spark.session import SessionConfig, get_spark

SF_DIR = "/root/testdata/sf0.1"


def q3_plan(c: DataFrame, o: DataFrame, l: DataFrame, pin: bool) -> DataFrame:
    """The registry's q3 shape; `pin` toggles ONLY the SHUFFLE_MERGE
    hint on the lineitem side (everything else byte-identical)."""
    if pin:
        l = l.hint("shuffle_merge")
    joined = l.join(
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(
            stable_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def best_of(fn, n: int = 5) -> tuple[float, float]:
    times = []
    for _ in range(n):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return min(times), max(times) - min(times)


def join_strategy(df: DataFrame) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "BroadcastHashJoin" in plan and "SortMergeJoin" in plan:
        return "SMJ+BHJ(dim)"
    if "SortMergeJoin" in plan:
        return "SMJ only"
    return "BHJ only"


def measure(tag: str, c, o, l) -> None:
    for pin in (True, False):
        df = q3_plan(c, o, l, pin)
        df.count()  # warm-up execution, discarded
        dt, spread = best_of(lambda: q3_plan(c, o, l, pin).count())
        # which join ran on o⋈l: read the executed plan once
        strat = join_strategy(q3_plan(c, o, l, pin))
        print(
            f"{tag} pin={'SHUFFLE_MERGE' if pin else 'auto'}: "
            f"{dt:.3f}s (+{spread:.3f}s spread) [{strat}]"
        )


def main() -> None:
    millions = float(sys.argv[1]) if len(sys.argv) > 1 else 100.0
    spark = get_spark(
        SessionConfig(
            app_name="q3-trade",
            aqe=False,  # match bench.py config
            extra={"spark.driver.memory": "48g",
                   "spark.ui.showConsoleProgress": "false"},
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).count()  # JVM warm-up

    from sparkksqldbbenchmark_spark.catalog import load_table

    with open("/proc/loadavg") as fh:
        print(f"loadavg at start: {fh.read().split()[:3]}")

    # --- phase 1: the bench tables (sf0.1) ---
    c = load_table(spark, SF_DIR, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, SF_DIR, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = load_table(spark, SF_DIR, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    measure("sf0.1", c, o, l)

    if millions <= 0:
        return

    # --- phase 2: synthetic 100M-row lineitem (scale_smoke pattern) ---
    n_l = int(millions * 1_000_000)
    n_o = n_l // 4
    n_c = max(n_o // 10, 1)
    d = tempfile.mkdtemp(prefix="q3_trade_")
    try:
        print(f"generating lineitem={n_l:,} orders={n_o:,} "
              f"customer={n_c:,} into {d}...", file=sys.stderr)
        (
            spark.range(n_c)
            .select(
                F.col("id").alias("c_custkey"),
                F.element_at(
                    F.array(*[F.lit(x) for x in
                              ("BUILDING", "AUTOMOBILE", "MACHINERY",
                               "HOUSEHOLD", "FURNITURE")]),
                    (F.col("id") % 5 + 1).cast("int"),
                ).alias("c_mktsegment"),
            )
            .repartition(8)
            .write.mode("overwrite").parquet(f"{d}/customer")
        )
        (
            spark.range(n_o)
            .select(
                F.col("id").alias("o_orderkey"),
                (F.col("id") % n_c).alias("o_custkey"),
                (
                    F.lit("1995-01-01 00:00:00").cast("timestamp")
                    + ((F.col("id") % 1095) * 86400).cast("string")
                    .cast("interval second")
                ).alias("o_orderdate"),
            )
            .repartition(32)
            .write.mode("overwrite").parquet(f"{d}/orders")
        )
        (
            spark.range(n_l)
            .select(
                (F.col("id") % n_o).alias("l_orderkey"),
                (
                    F.lit("1995-01-01 00:00:00").cast("timestamp")
                    + ((F.col("id") % 1200) * 86400).cast("string")
                    .cast("interval second")
                ).alias("l_shipdate"),
                F.round((F.col("id") % 90000) / 100.0 + 1.0, 2)
                .alias("l_extendedprice"),
                F.round((F.col("id") % 10) / 100.0, 2).alias("l_discount"),
            )
            .repartition(32)
            .write.mode("overwrite").parquet(f"{d}/lineitem")
        )
        c2 = spark.read.parquet(f"{d}/customer").where(
            F.col("c_mktsegment") == "BUILDING"
        )
        o2 = spark.read.parquet(f"{d}/orders").where(
            F.col("o_orderdate")
            < F.lit("1998-03-15 00:00:00").cast("timestamp")
        )
        l2 = spark.read.parquet(f"{d}/lineitem").where(
            F.col("l_shipdate")
            > F.lit("1995-03-15 00:00:00").cast("timestamp")
        )
        measure(f"{millions:g}M", c2, o2, l2)
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
