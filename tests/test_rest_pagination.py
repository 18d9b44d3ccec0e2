"""S11 paginated REST/GeoJSON ingest (dmi/scripts/wind.py:59-174) with
an injected fetcher — the pagination loop, stop condition, feature
flattening, and null-geometry handling, no network."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sparkksqldbbenchmark_spark.sources.rest import (
    flatten_features,
    iter_pages,
    read_paginated_geojson,
)


def _feature(sid, value, coords=(10.1, 56.2)):
    return {
        "type": "Feature",
        "geometry": (
            {"type": "Point", "coordinates": list(coords)} if coords else None
        ),
        "properties": {
            "stationId": sid,
            "parameterId": "wind_speed",
            "value": value,
        },
    }


def _pager(pages):
    """fetch_page stub over a canned page list; records offsets seen."""
    calls = []

    def fetch(offset, limit):
        calls.append((offset, limit))
        idx = offset // limit
        return (
            {"features": pages[idx]} if idx < len(pages) else {"features": []}
        )

    return fetch, calls


def test_pagination_stops_on_empty_page():
    pages = [[_feature(1, 1.0)], [_feature(2, 2.0)]]
    fetch, calls = _pager(pages)
    got = list(iter_pages(fetch, limit=100))
    assert len(got) == 2
    # third call saw the empty page and stopped; offsets advanced by limit
    assert calls == [(0, 100), (100, 100), (200, 100)]


def test_pagination_respects_max_offset():
    fetch, calls = _pager([[_feature(i, 0.0)] for i in range(100)])
    list(iter_pages(fetch, limit=10, max_offset=30))
    assert calls == [(0, 10), (10, 10), (20, 10)]


def test_flatten_skips_bad_features_keeps_null_geometry():
    page = {
        "features": [
            _feature(6013, 5.5),
            {"type": "Feature", "properties": {}},  # no props content
            {"type": "Feature", "properties": {"value": 1.0}},  # no station
            _feature(6014, 7.0, coords=None),  # geometry-less: kept
        ]
    }
    rows = flatten_features(page)
    assert [r["stationId"] for r in rows] == [6013, 6014]
    assert rows[0]["longitude"] == 10.1 and rows[0]["latitude"] == 56.2
    assert rows[1]["longitude"] is None and rows[1]["latitude"] is None


def test_read_paginated_geojson_end_to_end(spark):
    pages = [
        [_feature(6013, 5.5), _feature(6014, 3.2)],
        [_feature(6013, 6.1, coords=None)],
    ]
    fetch, _ = _pager(pages)
    df = read_paginated_geojson(spark, fetch, limit=1000)
    assert df.count() == 3
    agg = (
        df.groupBy("stationId")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    )
    by_sid = {r["stationId"]: r for r in agg}
    assert by_sid[6013]["n"] == 2 and by_sid[6013]["mx"] == 6.1
    assert by_sid[6014]["n"] == 1


def test_read_paginated_geojson_empty_needs_schema(spark):
    fetch, _ = _pager([])
    schema = StructType(
        [
            StructField("stationId", LongType()),
            StructField("parameterId", StringType()),
            StructField("value", DoubleType()),
            StructField("longitude", DoubleType()),
            StructField("latitude", DoubleType()),
        ]
    )
    df = read_paginated_geojson(spark, fetch, schema=schema)
    assert df.count() == 0
    assert df.schema == schema

    import pytest

    with pytest.raises(ValueError, match="explicit schema"):
        read_paginated_geojson(spark, fetch)
