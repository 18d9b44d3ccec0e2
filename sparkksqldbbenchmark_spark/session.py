"""SparkSession factory exposing the reference's configuration surface.

The reference tunes Spark via env/argv (SparkWeatherConsumer.scala:14-51):
shuffle partitions, AQE, Kryo, state-store provider, event- vs
processing-time. We expose the same knobs as a dataclass and map them onto
SparkConf. Designed for cluster scale: AQE on (coalescing + skew-join),
UTC session timezone for deterministic timestamp semantics, Arrow enabled
for the Pandas-UDF extension surface.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class SessionConfig:
    """Engine configuration (superset of the reference's env surface).

    Parity notes: shuffle_partitions ≈ SHUFFLE_PARTITIONS env
    (SparkWeatherConsumer.scala:20), aqe ≈ spark.sql.adaptive.* (:46-47),
    kryo ≈ :48, state store provider ≈ :50.
    """

    app_name: str = "sparkksqldbbenchmark-spark"
    master: str | None = None  # None → respect spark.master / local[*]
    shuffle_partitions: int = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    aqe: bool = True
    timezone: str = "UTC"
    # streaming
    state_store_provider: str | None = None  # None → Spark default (HDFS-backed)
    # scale knobs
    max_partition_bytes: str = "128m"
    broadcast_threshold: str = "64m"
    extra: dict[str, str] = field(default_factory=dict)

    def to_conf(self) -> dict[str, str]:
        conf = {
            "spark.sql.shuffle.partitions": str(self.shuffle_partitions),
            "spark.sql.adaptive.enabled": str(self.aqe).lower(),
            "spark.sql.adaptive.coalescePartitions.enabled": str(self.aqe).lower(),
            "spark.sql.adaptive.skewJoin.enabled": str(self.aqe).lower(),
            "spark.sql.session.timeZone": self.timezone,
            "spark.sql.files.maxPartitionBytes": self.max_partition_bytes,
            "spark.sql.autoBroadcastJoinThreshold": self.broadcast_threshold,
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
            # deterministic, ANSI-off cast semantics (errors='coerce' parity,
            # price_prediction.ipynb cell 3)
            "spark.sql.ansi.enabled": "false",
            "spark.ui.enabled": "false",
            # TESTDATA events.parquet stores timestamp[ns]; read the raw
            # int64 and convert in the loader (catalog.load_table) — DuckDB
            # applies the same ns→µs truncation.
            "spark.sql.legacy.parquet.nanosAsLong": "true",
        }
        if self.state_store_provider:
            conf["spark.sql.streaming.stateStore.providerClass"] = (
                self.state_store_provider
            )
        conf.update(self.extra)
        return conf


def cluster_profile(**overrides) -> SessionConfig:
    """Recommended configuration for a real multi-executor deployment at
    large scale (vs the local-bench profile): AQE + skew-join on, RocksDB
    state store for large streaming state, shuffle partitions sized for
    ~128 MB post-shuffle partitions (tune to 2-3x total executor cores)."""
    cfg = SessionConfig(
        shuffle_partitions=2000,
        aqe=True,
        state_store_provider=(
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
        extra={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128m",
            "spark.sql.shuffle.spill.compress": "true",
            "spark.shuffle.file.buffer": "1m",
        },
    )
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg


def get_spark(config: SessionConfig | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine configuration."""
    config = config or SessionConfig()
    builder = SparkSession.builder.appName(config.app_name)
    if config.master:
        builder = builder.master(config.master)
    elif not os.environ.get("SPARK_MASTER") and "spark.master" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        builder = builder.master(f"local[{cpus}]")
    for k, v in config.to_conf().items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
