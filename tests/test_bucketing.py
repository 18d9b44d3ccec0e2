"""Bucketed co-located join: the write-once/join-many layout must
actually elide the join shuffles — pinned against the plain-parquet
twin, same data, same join, same session."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.catalog import load_table
from sparkksqldbbenchmark_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from tests.conftest import SF_DIR


def test_bucketed_join_elides_exchanges(spark):
    """orders⋈lineitem on the order key: bucketed tables → SortMergeJoin
    with ZERO Exchange; the identical plain join needs one Exchange per
    side. Results must be identical row-for-row."""
    run = uuid.uuid4().hex[:8]
    lt, rt = f"li_b_{run}", f"ord_b_{run}"
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("k"), "o_totalprice"
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        # force the SMJ path so the exchange count is the observable
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        write_bucketed(li, lt, "k", buckets=8)
        write_bucketed(orders, rt, "k", buckets=8)

        joined = bucketed_join(spark, lt, rt, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, (
            "bucketed join must not shuffle either side:\n" + plan
        )
        # NOTE the per-task Sort remains: Spark only trusts persisted
        # in-bucket order when each bucket holds exactly ONE file, and a
        # multi-partition writer emits one file per (task, bucket). The
        # in-memory sort of an already-bucket-local partition is cheap;
        # the Exchange elision above is the scale win. (Write with one
        # task per bucket if the sort matters.)
        assert "SelectedBucketsCount" in plan  # bucketed scan engaged

        plain = li.join(orders, "k")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert plain_plan.count("Exchange hashpartitioning") == 2, (
            "twin without bucketing should shuffle both sides"
        )

        a = joined.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("q"),
        ).collect()[0]
        b = plain.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("q"),
        ).collect()[0]
        assert (a["n"], a["q"]) == (b["n"], b["q"])
        assert a["n"] > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_bucketed_aggregation_elides_exchange(spark):
    """groupBy on the bucket key also rides the bucket distribution: no
    exchange before the final aggregate."""
    run = uuid.uuid4().hex[:8]
    t = f"li_agg_{run}"
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        write_bucketed(li, t, "k", buckets=8)
        agged = (
            spark.table(t)
            .groupBy("k")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = agged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.sql(f"DROP TABLE IF EXISTS {t}")
