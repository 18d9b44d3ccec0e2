"""TESTDATA table catalog.

Loads the driver-generated parquet tables (TESTDATA.md) and registers them
as temp views so both the DataFrame API and the SQL front door see the same
relations. Parquet scans get predicate pushdown + column pruning from
Catalyst for free; loaders never collect.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_session_confs(spark: SparkSession) -> None:
    """Make any externally-created SparkSession (e.g. the driver's) able
    to run our plans deterministically: timestamp[ns] parquet handling and
    UTC timestamp rendering (oracle comparisons format timestamps as
    strings — a non-UTC session would shift them). Both are runtime
    confs. ANSI mode (Spark 4 default: on) is disabled to match the
    reference's permissive arithmetic — corr/ratio divisions over empty
    or constant groups must yield NULL, not DIVIDE_BY_ZERO."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _normalize_nanos(df)


def _normalize_nanos(df: DataFrame) -> DataFrame:
    """Normalize the `ts` column to TimestampType regardless of which
    parquet encoding the driver generated:

    - timestamp[ns] → int64 nanos under spark.sql.legacy.parquet.nanosAsLong:
      converted with the same ns→µs floor truncation DuckDB applies.
    - timestamp[us] (no tz) → Spark 4 reads it as TIMESTAMP_NTZ, which
      `withWatermark` / `unix_millis` / event-time windows reject. The
      session runs in UTC (ensure_session_confs), so a cast to TIMESTAMP
      is value-preserving: the wall-clock fields are reinterpreted as UTC
      instants, exactly how DuckDB reads the same file.

    The loader must not assume either encoding — the driver has switched
    between them across rounds."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            # EVERY NTZ temporal column (ts, o_orderdate, l_shipdate, …)
            # — not just `ts`: an NTZ column is a latent failure for any
            # future watermark/unix_millis use, and the UTC cast is
            # value-preserving for all of them.
            df = df.withColumn(
                field.name, F.col(field.name).cast("timestamp")
            )
        elif field.name == "ts" and isinstance(field.dataType, LongType):
            # Exact FLOOR division in integer space: `/` would promote to
            # double, whose 256 ns ulp at epoch-nano magnitude shifts the
            # floored microsecond by ±1 (exposed by µs-precision joins);
            # bare `div` truncates toward zero, which diverges from floor
            # for pre-1970 (negative) nanos. pmod makes the remainder
            # non-negative so the subtraction floors for either sign.
            df = df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.expr("(ts - pmod(ts, 1000)) div 1000")
                ),
            )
    return df


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every table and register `<name>` temp views.

    Delegates to load_table so registered views get the same session
    confs and ns→µs timestamp normalization as direct loads — a view
    exposing raw int64 nanos would silently break time queries."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
