"""Minimal pure-Python Avro binary codec for flat record schemas.

The production decode path is spark-avro's from_avro (sources/kafka.py
decode_avro_value, reference SparkWeatherConsumer.scala:201-211). This
container has neither spark-avro nor a Python avro library, so S2/S3
would otherwise only ever exercise the 5-byte Confluent framing — never
actual Avro bytes. This module implements the Avro 1.x BINARY encoding
(public spec, https://avro.apache.org/docs/current/specification/) for
the subset the reference's schemas need — flat records of primitives and
``["null", T]`` unions:

- int/long: zigzag-encoded variable-length integers
- float/double: little-endian IEEE 754
- string/bytes: long-prefixed payload
- boolean: single byte; null: zero bytes
- union ["null", T]: long branch index then the branch encoding

Output bytes are identical to what the reference's KafkaAvroSerializer
produces after its 5-byte header (same spec, same field order), so the
end-to-end test — encode → add_confluent_header → Spark binary column →
strip_confluent_header → decode — exercises the real wire format.

Spark integration decodes via mapInPandas (Arrow batches, blobs never on
the driver). At 100 TB the JVM from_avro path is the right tool; this is
the documented degradation contract, not a replacement.
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    BinaryType,
    StructField,
    StructType,
)

# --------------------------------------------------------------- varint --


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        b = data[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


# ---------------------------------------------------------------- codec --

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "string", "bytes"}


def _encode_value(typ, v) -> bytes:
    if isinstance(typ, list):  # union: branch index then branch value
        if v is None and "null" in typ:
            return _zigzag_encode(typ.index("null"))
        branch = next(
            i for i, t in enumerate(typ) if t != "null"
        )
        return _zigzag_encode(branch) + _encode_value(typ[branch], v)
    if typ == "null":
        return b""
    if typ == "boolean":
        return bytes([1 if v else 0])
    if typ in ("int", "long"):
        return _zigzag_encode(int(v))
    if typ == "float":
        return struct.pack("<f", v)
    if typ == "double":
        return struct.pack("<d", v)
    if typ == "string":
        raw = v.encode("utf-8")
        return _zigzag_encode(len(raw)) + raw
    if typ == "bytes":
        return _zigzag_encode(len(v)) + v
    raise ValueError(f"unsupported avro type: {typ!r}")


def _decode_value(typ, data: bytes, pos: int):
    if isinstance(typ, list):
        branch, pos = _zigzag_decode(data, pos)
        return _decode_value(typ[branch], data, pos)
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return data[pos] == 1, pos + 1
    if typ in ("int", "long"):
        return _zigzag_decode(data, pos)
    if typ == "float":
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if typ == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if typ == "string":
        n, pos = _zigzag_decode(data, pos)
        return data[pos : pos + n].decode("utf-8"), pos + n
    if typ == "bytes":
        n, pos = _zigzag_decode(data, pos)
        return bytes(data[pos : pos + n]), pos + n
    raise ValueError(f"unsupported avro type: {typ!r}")


def _fields(schema: dict | str) -> list[tuple[str, object]]:
    if isinstance(schema, str):
        schema = json.loads(schema)
    if schema.get("type") != "record":
        raise ValueError("only flat record schemas are supported")
    return [(f["name"], f["type"]) for f in schema["fields"]]


def encode_record(schema: dict | str, record: dict) -> bytes:
    """Record encoding = field encodings concatenated in schema order."""
    return b"".join(
        _encode_value(t, record[name]) for name, t in _fields(schema)
    )


def decode_record(schema: dict | str, data: bytes) -> dict:
    out = {}
    pos = 0
    for name, t in _fields(schema):
        out[name], pos = _decode_value(t, data, pos)
    return out


# ------------------------------------------------------ spark integration --

_SPARK_TYPES: dict[str, DataType] = {
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "string": StringType(),
    "bytes": BinaryType(),
}


def spark_schema_for(schema: dict | str) -> StructType:
    """Avro record schema → Spark StructType (same mapping spark-avro
    applies to flat records; unions with null become nullable fields)."""
    fields = []
    for name, t in _fields(schema):
        nullable = isinstance(t, list)
        base = next(x for x in t if x != "null") if nullable else t
        fields.append(StructField(name, _SPARK_TYPES[base], nullable))
    return StructType(fields)


def decode_avro_value_python(
    df: DataFrame,
    avro_schema_json: str,
    *,
    framed: bool = True,
    value_col: str = "value",
) -> DataFrame:
    """Degradation-path twin of decode_avro_value: same framing handling
    (strip_confluent_header expression) but the Avro body is decoded by
    this module inside mapInPandas instead of spark-avro's from_avro.
    Output schema matches from_avro's flat-record mapping, so downstream
    plans (flatten_payload etc.) are unchanged."""
    import pandas as pd

    from sparkksqldbbenchmark_spark.sources.kafka import (
        strip_confluent_header,
    )

    schema = json.loads(avro_schema_json)
    names = [n for n, _ in _fields(schema)]
    payload = (
        strip_confluent_header(F.col(value_col))
        if framed
        else F.col(value_col)
    )
    stripped = df.withColumn("__avro_payload", payload)
    # decoded fields carry a __avro_ prefix in the flat frame so record
    # field names (e.g. the weather schema's `value`) can't collide with
    # Kafka columns; the struct packing below restores the real names
    # the flat __avro_ fields are always nullable regardless of the Avro
    # schema: a tombstone (null payload) nulls every field of its row
    out_schema = StructType(
        [f for f in stripped.schema.fields if f.name != "__avro_payload"]
        + [
            StructField(f"__avro_{f.name}", f.dataType, True)
            for f in spark_schema_for(schema).fields
        ]
    )

    null_record = {n: None for n in names}

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            # Kafka tombstones (null values) arrive as None/NaN in the
            # pandas batch; decode to all-null fields so the packed struct
            # below can become a null struct, matching from_avro's output.
            decoded = [
                decode_record(schema, bytes(b))
                if isinstance(b, (bytes, bytearray))
                else null_record
                for b in pdf["__avro_payload"]
            ]
            res = pdf.drop(columns=["__avro_payload"])
            for n in names:
                res[f"__avro_{n}"] = [d[n] for d in decoded]
            yield res

    flat = stripped.mapInPandas(batches, out_schema)
    # package the record fields as a `data` struct — the same shape
    # decode_avro_value produces, so flatten_payload works on either.
    # A null payload yields data = NULL (not a struct of nulls), the same
    # as the JVM from_avro path on a tombstone.
    keep = [f.name for f in df.schema.fields]
    struct_type = spark_schema_for(schema)
    packed = F.struct(*[F.col(f"__avro_{n}").alias(n) for n in names])
    return flat.select(
        *keep,
        F.when(F.col(value_col).isNull(), F.lit(None).cast(struct_type))
        .otherwise(packed)
        .alias("data"),
    )
