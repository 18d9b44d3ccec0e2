"""Reference-parity queries (SURVEY.md §2) on the TESTDATA tables.

Column mapping (FIXTURES.md §1 driver mapping): events.ts → timeObserved,
events.user_id → stationId, events.event_type → metric, events.value →
value, events.event_id → producer_ts/offset (monotone row index).

Every aggregate is aliased identically in the DataFrame plan and the oracle
SQL. Rounded double sums/avgs use the stable decimal-sum pattern
(functions/stable.py) so value hashes are bit-identical across engines and
partition orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.catalog import load_table
from sparkksqldbbenchmark_spark.functions.stable import (
    sql_stable_avg,
    sql_stable_sum,
    stable_avg,
    stable_sum,
)
from sparkksqldbbenchmark_spark.operators.aggregates import (
    correlation_pairs,
    latest_by_offset,
    per_key_accumulation,
    percentile_stats,
    value_counts,
)
from sparkksqldbbenchmark_spark.operators.joins import (
    enrich,
    forward_fill,
    multiway_outer_time_join,
)
from sparkksqldbbenchmark_spark.operators.ordering import argmax_row, top_k
from sparkksqldbbenchmark_spark.operators.windowed_agg import tumbling_window_agg
from sparkksqldbbenchmark_spark.plans.registry import query

# Shared oracle fragments: epoch-aligned tumbling bucket, matching
# F.window(ts, dur).start (both align to the Unix epoch).
_BUCKET_H = "time_bucket(INTERVAL 1 HOUR, ts)"
_BUCKET_M = "time_bucket(INTERVAL 1 MINUTE, ts)"
_FMT = "'%Y-%m-%d %H:%M:%S'"
_AVG_V = sql_stable_avg("value", 2)


@query(
    "weather_window_agg",
    oracle=f"""
    SELECT strftime({_BUCKET_H}, {_FMT}) AS window_start,
           strftime({_BUCKET_H} + INTERVAL 1 HOUR, {_FMT}) AS window_end,
           event_type,
           {_AVG_V} AS avg_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value,
           count(*) AS message_count,
           min(event_id) AS min_producer_ts
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def weather_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core query, batch form (A1,
    SparkWeatherConsumer.scala:245-271): tumbling window × metric →
    avg/min/max/count/min(producer_ts), rounded + stringified bounds."""
    events = load_table(spark, sf_dir, "events")
    return tumbling_window_agg(
        events,
        ts_col="ts",
        window_duration="1 hour",
        keys=("event_type",),
        value_col="value",
        order_col="event_id",
    )


@query(
    "weather_window_agg_by_station",
    oracle=f"""
    SELECT strftime({_BUCKET_M}, {_FMT}) AS window_start,
           strftime({_BUCKET_M} + INTERVAL 1 MINUTE, {_FMT}) AS window_end,
           event_type, user_id,
           {_AVG_V} AS avg_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value,
           count(*) AS message_count,
           min(event_id) AS min_producer_ts
    FROM events
    GROUP BY 1, 2, 3, 4
    """,
)
def weather_window_agg_by_station(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 at full reference granularity: 1-minute tumbling ×
    (metric, stationId) — the exact grouping of
    setup-ksqldb-correct.sh:93-115."""
    events = load_table(spark, sf_dir, "events")
    return tumbling_window_agg(
        events,
        ts_col="ts",
        window_duration="1 minute",
        keys=("event_type", "user_id"),
        value_col="value",
        order_col="event_id",
    )


@query(
    "weather_window_agg_sql",
    oracle=f"""
    SELECT strftime({_BUCKET_H}, {_FMT}) AS window_start,
           event_type,
           {_AVG_V} AS avg_value,
           count(*) AS message_count
    FROM events
    GROUP BY 1, 2
    """,
)
def weather_window_agg_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — the same aggregation through the SQL front door (ksqlDB twin,
    profiles/low_latency.sql:5-30), proving DataFrame/SQL plan parity."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT date_format(window.start, 'yyyy-MM-dd HH:mm:ss') AS window_start,
               event_type,
               CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                     / count(value) AS avg_value,
               count(*) AS message_count
        FROM events
        GROUP BY window(ts, '1 hour'), event_type
        """
    )


@query(
    "latest_by_offset",
    oracle="""
    SELECT user_id,
           max_by(value, event_id) AS latest_value,
           max(event_id) AS max_event_id
    FROM events GROUP BY user_id
    """,
)
def latest_by_offset_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — ksqlDB LATEST_BY_OFFSET via max_by over the arrival offset
    (setup-ksqldb-correct.sh:102)."""
    events = load_table(spark, sf_dir, "events")
    return latest_by_offset(events, ["user_id"], "value", "event_id")


@query(
    "latency_percentiles",
    oracle=f"""
    SELECT count(*) AS sample_count,
           {sql_stable_avg("value", 2)} AS avg_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value,
           round(stddev_pop(value), 2) AS stddev_value,
           round(quantile_cont(value, 0.5), 2) AS p5,
           round(quantile_cont(value, 0.95), 2) AS p95,
           round(quantile_cont(value, 0.99), 2) AS p99
    FROM events
    WHERE value > 0 AND value < 600000
    """,
)
def latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+A5+P4 — the latency monitor's metrics pipeline
    (LatencyMonitor.scala:211-302): validity filter then exact percentiles,
    population std-dev, min/max/avg/count."""
    events = load_table(spark, sf_dir, "events")
    valid = events.where((F.col("value") > 0) & (F.col("value") < 600000))
    return percentile_stats(valid, "value")


@query(
    "latency_nearest_rank_percentiles",
    oracle="""
    WITH ranked AS (
        SELECT value,
               row_number() OVER (ORDER BY value) AS rn,
               count(*) OVER () AS n
        FROM events WHERE value > 0 AND value < 600000
    )
    SELECT max(CASE WHEN rn - 1 = least(CAST(floor(n * 0.5) AS BIGINT), n - 1)
                    THEN value END) AS p50_nr,
           max(CASE WHEN rn - 1 = least(CAST(floor(n * 0.95) AS BIGINT), n - 1)
                    THEN value END) AS p95_nr,
           max(CASE WHEN rn - 1 = least(CAST(floor(n * 0.99) AS BIGINT), n - 1)
                    THEN value END) AS p99_nr
    FROM ranked
    """,
)
def latency_nearest_rank_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4, reference convention — percentile = sorted[(count·p).toInt]
    clamped (LatencyMonitor.scala:278-280), NOT interpolated.

    Scale-safe selection plan: instead of a global row_number over the
    DATA (single-partition sort of n rows), build the distinct-value
    histogram with one shuffle, cumulative-sum it, and pick the smallest
    value whose cumulative count covers each target rank. The explicit
    single-partition window runs over |distinct values| rows — bounded
    by the measure's DOMAIN (2-dp latencies saturate in the tens of
    thousands regardless of row count; sf0.01→sf0.1 grows rows 10× but
    distinct values only 2.7×), the same bounded-small-side pattern as
    the forward-fill carry. For truly continuous unbounded measures the
    documented swap is percentile_approx."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").where(
        (F.col("value") > 0) & (F.col("value") < 600000)
    )
    hist = events.groupBy("value").agg(F.count(F.lit(1)).alias("cnt"))
    total = hist.agg(F.sum("cnt").alias("n"))
    wcum = (
        Window.partitionBy(F.lit(0))
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(wcum)).crossJoin(
        F.broadcast(total)
    )

    def pick(p: float, alias: str) -> F.Column:
        # 0-based nearest-rank index; its value = first histogram bucket
        # whose cumulative count exceeds the index
        idx = F.least(F.floor(F.col("n") * F.lit(p)), F.col("n") - 1)
        return F.min(
            F.when(F.col("cum") >= idx + 1, F.col("value"))
        ).alias(alias)

    return cum.agg(
        pick(0.5, "p50_nr"), pick(0.95, "p95_nr"), pick(0.99, "p99_nr")
    )


@query(
    "top_k_values",
    oracle="""
    SELECT event_id, user_id, event_type, round(value, 2) AS value
    FROM events ORDER BY value DESC, event_id LIMIT 5
    """,
)
def top_k_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O4 — top-5 by measure (LatencyMonitor.scala:383-391), event_id
    tie-break for determinism. Compiles to TakeOrderedAndProject."""
    events = load_table(spark, sf_dir, "events")
    return top_k(
        events.select(
            "event_id", "user_id", "event_type", F.round("value", 2).alias("value")
        ),
        [F.desc("value"), F.asc("event_id")],
        5,
    )


@query(
    "argmax_station",
    oracle="""
    SELECT event_id, user_id, event_type, round(value, 2) AS value
    FROM events ORDER BY value DESC, event_id LIMIT 1
    """,
)
def argmax_station(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 — row with the max recorded value (dmi/scripts/wind.py:308-314)."""
    events = load_table(spark, sf_dir, "events")
    return argmax_row(
        events.select(
            "event_id", "user_id", "event_type", F.round("value", 2).alias("value")
        ),
        [F.desc("value"), F.asc("event_id")],
    )


@query(
    "union_streams_agg",
    oracle=f"""
    SELECT strftime({_BUCKET_H}, {_FMT}) AS window_start,
           event_type,
           {_AVG_V} AS avg_value,
           count(*) AS message_count
    FROM (
        SELECT * FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT * FROM events WHERE event_type = 'view'
    )
    GROUP BY 1, 2
    """,
)
def union_streams_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2 — two homogeneous streams unioned before windowing
    (SparkWeatherConsumer.scala:232; low_latency.sql:24-27). unionByName →
    Catalyst sees one scan-union, aggregation pushes partials below the
    shuffle on both branches."""
    events = load_table(spark, sf_dir, "events")
    wind = events.where(F.col("event_type") == "click")
    sunshine = events.where(F.col("event_type") == "view")
    unioned = wind.unionByName(sunshine)
    return (
        unioned.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            stable_avg("value", 2).alias("avg_value"),
            F.count(F.lit(1)).alias("message_count"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "avg_value",
            "message_count",
        )
    )


@query(
    "station_enrichment_join",
    oracle=f"""
    SELECT r.r_name AS region_name,
           count(*) AS customer_count,
           {sql_stable_avg("c.c_acctbal", 2)} AS avg_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def station_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — fact-to-small-dim enrichment (dmi/scripts/wind.py:180-209),
    expressed as customer→nation→region. Both dims broadcast: zero shuffle
    of the fact side before aggregation."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    enriched = enrich(
        enrich(customer, nation, on=[customer.c_nationkey == nation.n_nationkey]),
        region,
        on=[F.col("n_regionkey") == region.r_regionkey],
    )
    return enriched.groupBy(F.col("r_name").alias("region_name")).agg(
        F.count(F.lit(1)).alias("customer_count"),
        stable_avg("c_acctbal", 2).alias("avg_acctbal"),
    )


@query(
    "region_zone_lookup",
    oracle="""
    SELECT n.n_name AS nation_name,
           CASE WHEN r.r_regionkey >= 2 THEN '1' ELSE '2' END AS zone
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def region_zone_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 + P7/F15 — broadcast dictionary lookup (region_muncipality.json)
    plus the threshold zone derivation (`calculate_dk_area`,
    price_prediction.ipynb cell 4) as native when/otherwise."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = enrich(nation, region, on=[nation.n_regionkey == region.r_regionkey])
    return joined.select(
        F.col("n_name").alias("nation_name"),
        F.when(F.col("r_regionkey") >= 2, "1").otherwise("2").alias("zone"),
    )


@query(
    "multiway_timejoin_ffill",
    oracle=f"""
    WITH click AS (
        SELECT {_BUCKET_H} AS datetime, {_AVG_V} AS click_value
        FROM events WHERE event_type = 'click' GROUP BY 1
    ), view AS (
        SELECT {_BUCKET_H} AS datetime, {_AVG_V} AS view_value
        FROM events WHERE event_type = 'view' GROUP BY 1
    ), error AS (
        SELECT {_BUCKET_H} AS datetime, {_AVG_V} AS error_value
        FROM events WHERE event_type = 'error' GROUP BY 1
    ), merged AS (
        SELECT coalesce(click.datetime, view.datetime, error.datetime) AS datetime,
               click_value, view_value, error_value
        FROM click
        FULL OUTER JOIN view ON click.datetime = view.datetime
        FULL OUTER JOIN error
            ON coalesce(click.datetime, view.datetime) = error.datetime
    )
    SELECT strftime(datetime, {_FMT}) AS datetime,
           last_value(click_value IGNORE NULLS)
               OVER (ORDER BY datetime ROWS UNBOUNDED PRECEDING) AS click_value,
           last_value(view_value IGNORE NULLS)
               OVER (ORDER BY datetime ROWS UNBOUNDED PRECEDING) AS view_value,
           last_value(error_value IGNORE NULLS)
               OVER (ORDER BY datetime ROWS UNBOUNDED PRECEDING) AS error_value
    FROM merged
    """,
)
def multiway_timejoin_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 + W1 — the notebook pipeline (price_prediction.ipynb cell 14):
    N hourly series → full-outer join fold on time → forward-fill. Spark
    full-outer join keys coalesce automatically with `on=str`.

    The three series share ONE events scan + ONE aggregation (optimization
    guide §2.3/§2.4: per-series filtered scans re-read the fact table N
    times and shuffle N aggregations; aggregating once by (hour, type) and
    deriving each series as a filter over the tiny materialized aggregate
    is the 100 TB plan — the fold's join inputs are |hours| rows, never
    |events|). The per-(hour, type) average equals the per-series average,
    so the fold output is bit-identical to the N-scan form; the full-outer
    fold itself (the J1 operator) is unchanged. The materialization is a
    localCheckpoint at bench scale — persist/checkpoint on a cluster."""
    events = load_table(spark, sf_dir, "events")
    per_type = (
        events.where(F.col("event_type").isin("click", "view", "error"))
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(stable_avg("value", 2).alias("v"))
        .select(F.col("window.start").alias("datetime"), "event_type", "v")
        .localCheckpoint(eager=True)
    )

    def series(event_type: str) -> DataFrame:
        return per_type.where(F.col("event_type") == event_type).select(
            "datetime", F.col("v").alias(f"{event_type}_value")
        )

    merged = multiway_outer_time_join(
        [series("click"), series("view"), series("error")], "datetime"
    )
    filled = forward_fill(
        merged,
        "datetime",
        ["click_value", "view_value", "error_value"],
        # the fold input is the checkpointed per-hour aggregate — the 2x
        # recompute of the tiny fold is cheaper than a second
        # materialization job (see forward_fill docstring)
        materialize=False,
    )
    return filled.withColumn(
        "datetime", F.date_format("datetime", "yyyy-MM-dd HH:mm:ss")
    )


@query(
    "correlation_matrix",
    oracle="""
    SELECT round(corr(l_quantity, l_extendedprice), 4)
               AS corr_l_quantity_l_extendedprice,
           round(corr(l_discount, l_extendedprice), 4)
               AS corr_l_discount_l_extendedprice,
           round(corr(l_quantity, l_discount), 4)
               AS corr_l_quantity_l_discount
    FROM lineitem
    """,
)
def correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — pairwise Pearson correlation over numeric columns
    (price_prediction.ipynb cell 14 `.corr()`). One aggregation pass
    computes all pairs."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return correlation_pairs(
        lineitem,
        [
            ("l_quantity", "l_extendedprice"),
            ("l_discount", "l_extendedprice"),
            ("l_quantity", "l_discount"),
        ],
    )


@query(
    "per_station_accumulation",
    oracle=f"""
    SELECT user_id,
           count(*) AS observation_count,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value,
           {sql_stable_sum("value", 2)} AS sum_value,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_observed,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_observed,
           string_agg(DISTINCT event_type, ', ' ORDER BY event_type)
               AS parameters_measured,
           count(DISTINCT event_type) AS parameter_count
    FROM events GROUP BY user_id
    """,
)
def per_station_accumulation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 + F19 — the DMI per-station accumulator
    (dmi/scripts/wind.py:107-150) as one hash aggregation."""
    events = load_table(spark, sf_dir, "events")
    return per_key_accumulation(
        events, key="user_id", value_col="value", ts_col="ts",
        param_col="event_type",
    )


@query(
    "value_counts",
    oracle="SELECT event_type, count(*) AS count FROM events GROUP BY event_type",
)
def value_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — value_counts (dmi/scripts/wind.py:267-276)."""
    return value_counts(load_table(spark, sf_dir, "events"), "event_type")


@query(
    "count_distinct_stations",
    oracle="""
    SELECT count(DISTINCT user_id) AS distinct_stations,
           count(*) AS total_observations
    FROM events
    """,
)
def count_distinct_stations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — distinct-station count (dmi/scripts/sunlight.py:71-72). Exact
    here; at 100 TB prefer approx_count_distinct (HLL, mergeable)."""
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.countDistinct("user_id").alias("distinct_stations"),
        F.count(F.lit(1)).alias("total_observations"),
    )


@query(
    "validity_filter",
    oracle=f"""
    SELECT count(*) AS valid_count,
           {sql_stable_avg("value", 2)} AS avg_valid_value
    FROM events
    WHERE value > 0 AND value < 600000
      AND ts > TIMESTAMP '2020-01-01 00:00:00'
    """,
)
def validity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — the latency monitor's validity predicate
    (LatencyMonitor.scala:211-243). Predicates push down to the parquet
    scan (visible as PushedFilters in .explain)."""
    events = load_table(spark, sf_dir, "events")
    valid = events.where(
        (F.col("value") > 0)
        & (F.col("value") < 600000)
        & (F.col("ts") > F.lit("2020-01-01 00:00:00").cast("timestamp"))
    )
    return valid.agg(
        F.count(F.lit(1)).alias("valid_count"),
        stable_avg("value", 2).alias("avg_valid_value"),
    )


@query(
    "scalar_function_suite",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           CAST(epoch(date_trunc('second', ts)) * 1000 AS BIGINT) AS ts_epoch_ms,
           round(value, 2) AS value_rounded,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
           concat(CAST(user_id AS VARCHAR), '-', CAST(event_id AS VARCHAR))
               AS station_key,
           substring(event_type, 1, 2) AS type_prefix,
           upper(event_type) AS type_upper,
           CASE WHEN value >= 500 THEN '1' ELSE '2' END AS zone,
           str_split(props, '"')[2] AS prop_key_name
    FROM events
    """,
)
def scalar_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-series showcase (SURVEY §2.8): datetime format/epoch-ms (F4/F6),
    round (F5), JSON extraction (F18), key concat (F22), substring/char
    extraction (F14), threshold bucketing (F15), string split + element
    pick (F9). All built-in JVM expressions — whole-stage codegen."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        (F.unix_timestamp("ts") * F.lit(1000)).cast("long").alias("ts_epoch_ms"),
        F.round("value", 2).alias("value_rounded"),
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.concat_ws("-", F.col("user_id"), F.col("event_id")).alias("station_key"),
        F.substring("event_type", 1, 2).alias("type_prefix"),
        F.upper("event_type").alias("type_upper"),
        F.when(F.col("value") >= 500, "1").otherwise("2").alias("zone"),
        F.element_at(F.split("props", '"'), 2).alias("prop_key_name"),
    )


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_stable_sum("l_quantity", 2)} AS sum_qty,
           {sql_stable_sum("l_extendedprice", 2)} AS sum_base_price,
           {sql_stable_sum("l_extendedprice * (1 - l_discount)", 2)}
               AS sum_disc_price,
           {sql_stable_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 2)}
               AS sum_charge,
           {sql_stable_avg("l_quantity", 2)} AS avg_qty,
           {sql_stable_avg("l_extendedprice", 2)} AS avg_price,
           {sql_stable_avg("l_discount", 4)} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary — the headline batch-throughput query
    for the bench harness (scan-heavy, partial-agg friendly)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_sum("l_quantity", 2).alias("sum_qty"),
            stable_sum("l_extendedprice", 2).alias("sum_base_price"),
            stable_sum(disc_price, 2).alias("sum_disc_price"),
            stable_sum(disc_price * (1 + F.col("l_tax")), 2).alias("sum_charge"),
            stable_avg("l_quantity", 2).alias("avg_qty"),
            stable_avg("l_extendedprice", 2).alias("avg_price"),
            stable_avg("l_discount", 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_stable_sum("l.l_extendedprice * (1 - l.l_discount)", 2)} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style join+agg+top-k: broadcast the filtered customer dim;
    orders⋈lineitem shuffles on the order key — the only unavoidable
    shuffle at scale.

    r18 optimization (guide §3.1 deliberate join strategy): the order-key
    join is a SHUFFLED-HASH join building on the (orders ⋈ customer)
    side — it replaces the r9 SHUFFLE_MERGE hint, deleting both SMJ
    sorts (after-plan: 0 Sort nodes; paired A/B 0.664→0.625 s /
    0.758→0.724 s min-of-5). The r9 audit point stands — never
    broadcast lineitem-derived relations that cannot exist at 100 TB;
    the orders build side is bounded per partition by the shuffle
    partition count, which scales with the cluster. Pre-aggregating
    lineitem to order grain before the join (guide §2.3) was tried and
    REVERTED: order keys are near-unique in filtered lineitem (~3.6
    rows/key), so partial aggregation compressed nothing and the extra
    hash-aggregate pass measured 0.62 → 0.98 s.

    Post-join aggregation reuses the join's l_orderkey partitioning
    (no third exchange — o_orderdate is functionally dependent on the
    key)."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    joined = l.join(
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey).hint(
            "shuffle_hash"
        ),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(
            stable_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )
