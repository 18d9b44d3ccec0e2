"""PySpark-native analytics engine with the capabilities of the
SparkKsqlDbBenchmark reference (streaming tumbling-window aggregation,
ksql-style SQL front door, batch time-series analytics, latency metrics),
extended with large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Everything is declarative DataFrame / Spark SQL — Catalyst plans the
physical execution. Nothing here is a port of the reference's Scala/ksqlDB
code; reference files are cited in docstrings only to document semantic
parity (e.g. spark-consumer/.../SparkWeatherConsumer.scala:245-258 for the
core windowed aggregation).
"""

from sparkksqldbbenchmark_spark.session import get_spark, SessionConfig

__all__ = ["get_spark", "SessionConfig"]
__version__ = "0.1.0"
