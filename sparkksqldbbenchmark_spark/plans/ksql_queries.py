"""The ksqlDB-dialect query surface through the SQL front door, oracle-
checked. The query text mirrors the reference's CREATE TABLE AS SELECT
(setup-ksqldb-correct.sh:93-115 / profiles/low_latency.sql:5-30) with the
events-table column mapping."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparkksqldbbenchmark_spark.catalog import load_table
from sparkksqldbbenchmark_spark.plans.registry import query
from sparkksqldbbenchmark_spark.sql.ksql import KsqlFrontDoor

_KSQL_TEXT = """
SELECT TIMESTAMPTOSTRING(WINDOWSTART, 'yyyy-MM-dd HH:mm:ss') AS window_start,
       CAST(WINDOWEND AS BIGINT) AS window_end_ms,
       user_id, event_type,
       AS_VALUE(user_id) AS key_user_id,
       LATEST_BY_OFFSET(value) AS latest_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       COUNT(*) AS message_count,
       MIN(event_id) AS min_producer_ts,
       MAX(ROWTIME) AS processing_end_ts
FROM events
WINDOW TUMBLING (SIZE 1 MINUTES)
GROUP BY user_id, event_type
EMIT CHANGES
"""


@query(
    "ksql_windowed_table",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 MINUTE, ts),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(epoch(time_bucket(INTERVAL 1 MINUTE, ts) + INTERVAL 1 MINUTE)
                * 1000 AS BIGINT) AS window_end_ms,
           user_id, event_type,
           user_id AS key_user_id,
           max_by(value, event_id) AS latest_value,
           min(value) AS min_value,
           max(value) AS max_value,
           count(*) AS message_count,
           min(event_id) AS min_producer_ts,
           max(epoch_ms(ts)) AS processing_end_ts
    FROM events
    GROUP BY 1, 2, 3, 4
    """,
)
def ksql_windowed_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A3+F6+F7+T1 — the reference's ksql aggregation text run through
    the front door's dialect translation (LATEST_BY_OFFSET → max_by,
    TIMESTAMPTOSTRING → date_format, WINDOWSTART/END → window.start/end,
    WINDOW TUMBLING → window() grouping, AS_VALUE → identity, ROWTIME →
    unix_millis(ts) — the full construct set of low_latency.sql:5-30,
    with MAX(ROWTIME) standing in for the reference's processing_end_ts
    over deterministic event time so the oracle can replay it)."""
    front = KsqlFrontDoor(spark, ts_col="ts", offset_col="event_id")
    front.create_stream("events", load_table(spark, sf_dir, "events"))
    result = front.create_table_as("events_aggregated", _KSQL_TEXT)
    assert isinstance(result, DataFrame)
    return result
