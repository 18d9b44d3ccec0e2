"""Paginated REST/GeoJSON ingestion (S11 — dmi/scripts/wind.py:59-174).

The reference pulls DMI observations through an offset-paginated
GeoJSON API: loop `offset += limit`, GET a page, stop on the first
empty `features` list, flatten each feature's `properties` +
`geometry.coordinates` into rows. This module reproduces that ingest
shape with the TRANSPORT INJECTED: the paginator consumes any
`fetch_page(offset, limit) -> dict` callable — a requests.get wrapper
in a deployment, a local-fixture reader in tests (network is out of
engine scope per SURVEY §2.1; the pagination/flatten logic is the
queryable surface and is fully testable without a socket).

Driver-side accumulation is correct here, matching the reference: the
API is the bottleneck and pages land as Python dicts regardless; Spark
parallelism starts at the DataFrame hand-off. For a bulk landed-file
ingest (pages already on disk) use sources/files.read_json directly.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession


def iter_pages(
    fetch_page: Callable[[int, int], dict],
    *,
    limit: int = 300_000,
    max_offset: int = 1_000_000,
) -> Iterator[dict]:
    """Offset-pagination loop (wind.py:62-84): yield each page's raw
    GeoJSON dict; stop at the first page with no `features`, or at the
    reference's max_offset safety bound."""
    offset = 0
    while offset < max_offset:
        page = fetch_page(offset, limit)
        features = (page or {}).get("features", [])
        if not features:
            break
        yield page
        offset += limit


def flatten_features(page: dict) -> list[dict]:
    """GeoJSON features → flat rows (wind.py:88-139): properties dict +
    geometry.coordinates as (longitude, latitude). Features without
    properties or a stationId are skipped, exactly as the reference
    skips them; missing geometry yields NULL coordinates rather than a
    dropped row."""
    rows: list[dict] = []
    for feature in page.get("features", []):
        props = feature.get("properties") or {}
        if not props or "stationId" not in props:
            continue
        geometry = feature.get("geometry") or {}
        coords = geometry.get("coordinates") or None
        row = dict(props)
        row["longitude"] = float(coords[0]) if coords else None
        row["latitude"] = float(coords[1]) if coords else None
        rows.append(row)
    return rows


def read_paginated_geojson(
    spark: SparkSession,
    fetch_page: Callable[[int, int], dict],
    *,
    limit: int = 300_000,
    max_offset: int = 1_000_000,
    schema=None,
) -> DataFrame:
    """Full S11 ingest: paginate, flatten, hand off to Spark. With no
    explicit schema the frame is inferred from the accumulated rows
    (fine at API scale); pass a StructType for a stable contract."""
    rows: list[dict] = []
    for page in iter_pages(fetch_page, limit=limit, max_offset=max_offset):
        rows.extend(flatten_features(page))
    if schema is not None:
        return spark.createDataFrame(rows, schema)
    if not rows:
        raise ValueError(
            "paginated source returned no features and no schema was "
            "given — pass an explicit schema to allow empty results"
        )
    return spark.createDataFrame(rows)
