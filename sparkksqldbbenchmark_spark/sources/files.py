"""File-based sources: every batch scan shape the reference exercises.

S5/S8 plain CSV (header), S10 semicolon-delimited CSV
(price_prediction.ipynb cells 10/12), S9 CSV-inside-zip (cell 8),
S12 JSON-lines (weather/txt_to_json.py — Spark reads JSONL natively, the
reference's txt→json conversion step disappears), plus parquet.

All readers return lazy DataFrames with explicit schemas where the caller
provides one (schema inference is a full extra scan — never default to it
at 100 TB).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    *,
    schema: StructType | None = None,
    sep: str = ",",
    header: bool = True,
    permissive: bool = True,
) -> DataFrame:
    """CSV scan. PERMISSIVE mode keeps malformed rows as nulls — the
    reference's skip-malformed guard (KafkaWeatherProducer.scala:121-123)
    is then a simple null filter downstream."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE" if permissive else "FAILFAST")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_semicolon_csv(
    spark: SparkSession, path: str, *, schema: StructType | None = None
) -> DataFrame:
    """S10 — the DMI hourly exports use ';' (notebook cells 10/12)."""
    return read_csv(spark, path, schema=schema, sep=";")


def read_zipped_csv(
    spark: SparkSession,
    zip_path: str,
    *,
    member: str | None = None,
    schema: StructType | None = None,
    sep: str = ",",
) -> DataFrame:
    """S9 — CSV inside a zip archive (2024_Consumption.zip, notebook cell
    8). Zip is not a splittable container, so the archive is extracted
    once to scratch and the CSV read normally — the extraction is a
    driver-side prepare step, not part of the query plan. For 100 TB
    ingest, data should land as parquet; this adapter exists for parity
    with the reference's ad-hoc inputs."""
    out_dir = tempfile.mkdtemp(prefix="unzip_")
    with zipfile.ZipFile(zip_path) as z:
        names = [member] if member else [
            n for n in z.namelist() if n.lower().endswith(".csv")
        ]
        for n in names:
            z.extract(n, out_dir)
    paths = [os.path.join(out_dir, n) for n in names]
    return read_csv(spark, ",".join(paths) if len(paths) == 1 else out_dir,
                    schema=schema, sep=sep)


def read_json(
    spark: SparkSession,
    path: str,
    *,
    schema: StructType | None = None,
    multiline: bool = False,
) -> DataFrame:
    """S11/S12 — JSON & JSON-lines (GeoJSON pages land as multiline
    documents; JSONL needs no conversion step, unlike the reference's
    txt_to_json.py)."""
    reader = spark.read.option("multiLine", str(multiline).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_csv(df: DataFrame, path: str, *, header: bool = True) -> None:
    """S13 — CSV sink (dmi/scripts/wind.py:258)."""
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)
