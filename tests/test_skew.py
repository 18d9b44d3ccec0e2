"""Salting correctness: salted plans must produce byte-identical results
to the straightforward plans they replace."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.catalog import load_table
from sparkksqldbbenchmark_spark.operators.skew import (
    replicated_skew_join,
    salted_sum_count,
)

SF = "/root/testdata/sf0.001"


def test_salted_aggregation_matches_plain(spark):
    events = load_table(spark, SF, "events")
    salted = salted_sum_count(
        events, ["event_type"], "value", salt_col="event_id", buckets=8
    )
    plain = events.groupBy("event_type").agg(
        F.round(F.sum(F.col("value").cast("decimal(38,6)")), 2)
        .cast("double")
        .alias("sum_value"),
        F.count(F.lit(1)).alias("row_count"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    assert {tuple(r) for r in salted.collect()} == {
        tuple(r) for r in plain.collect()
    }


def test_replicated_skew_join_matches_plain(spark):
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, SF, "customer").select("c_custkey", "c_name")
    small = customer.withColumnRenamed("c_custkey", "o_custkey")
    salted = replicated_skew_join(
        orders, small, "o_custkey", salt_col="o_orderkey", buckets=4
    )
    plain = orders.join(small, "o_custkey")
    assert salted.count() == plain.count()
    assert {tuple(r) for r in salted.select("o_orderkey", "c_name").collect()} == {
        tuple(r) for r in plain.select("o_orderkey", "c_name").collect()
    }
