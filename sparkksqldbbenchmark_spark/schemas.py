"""Schema registry: the reference's record contracts as StructTypes plus
their Avro JSON forms (SURVEY.md §1).

WeatherData mirrors producer/src/main/resources/weather.avsc:1-13 (and the
inline duplicate at SparkWeatherConsumer.scala:185-199); AggregatedWeather
mirrors SparkWeatherConsumer.scala:67-86 (= LatencyMonitor.scala:81-100 =
register-schemas.sh:36-52 — one schema, three declarations in the
reference; one here).
"""

from __future__ import annotations

import json

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WEATHER_DATA = StructType(
    [
        StructField("timeObserved", StringType()),
        StructField("stationId", IntegerType()),
        StructField("stationName", StringType()),
        StructField("metric", StringType()),
        StructField("value", DoubleType()),
        StructField("producer_ts", LongType()),
    ]
)

AGGREGATED_WEATHER = StructType(
    [
        StructField("window_start", StringType()),
        StructField("window_end", StringType()),
        StructField("metric", StringType()),
        StructField("stationId", IntegerType()),
        StructField("stationName", StringType()),
        StructField("avg_value", DoubleType()),
        StructField("min_value", DoubleType()),
        StructField("max_value", DoubleType()),
        StructField("message_count", LongType()),
        StructField("min_producer_ts", LongType()),
        StructField("processing_end_ts", LongType()),
    ]
)

_AVRO_TYPES = {
    "string": "string",
    "integer": "int",
    "long": "long",
    "double": "double",
    "boolean": "boolean",
}


def to_avro_json(schema: StructType, name: str, namespace: str = "engine") -> str:
    """StructType → Avro record schema JSON (flat records only — the
    reference's schemas are flat)."""
    fields = [
        {"name": f.name, "type": _AVRO_TYPES[f.dataType.typeName()]}
        for f in schema.fields
    ]
    return json.dumps(
        {"type": "record", "name": name, "namespace": namespace,
         "fields": fields}
    )


WEATHER_DATA_AVRO = to_avro_json(WEATHER_DATA, "WeatherData")
AGGREGATED_WEATHER_AVRO = to_avro_json(AGGREGATED_WEATHER, "AggregatedWeather")
