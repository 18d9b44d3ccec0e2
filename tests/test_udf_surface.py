"""UDF extension surface (SURVEY §2.10): the engine's reference-parity
paths use zero UDFs, but udf/pandas_udf/applyInPandas are the documented
escape hatches. calculate_dk_area (price_prediction.ipynb cell 4) is
implemented both ways and must agree."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def native_dk_area(code_col, lon_col):
    """The engine's native form: when/otherwise (P7/F15)."""
    return (
        F.when(F.col(code_col) >= 500, "1")
        .when(F.col(code_col).isNull(), None)
        .otherwise(F.when(F.col(lon_col) < 11.0, "1").otherwise("2"))
    )


def _make_pandas_dk_area():
    """Arrow-vectorized twin — the notebook's row-wise apply, batched.
    (Defined lazily: pandas_udf registration needs an active session.)"""

    @pandas_udf("string")
    def pandas_dk_area(code: pd.Series, lon: pd.Series) -> pd.Series:
        out = pd.Series([None] * len(code), dtype="object")
        has_code = code.notna()
        out[has_code & (code >= 500)] = "1"
        small = has_code & (code < 500)
        out[small & (lon < 11.0)] = "1"
        out[small & (lon >= 11.0)] = "2"
        return out

    return pandas_dk_area


def test_pandas_udf_matches_native(spark):
    pandas_dk_area = _make_pandas_dk_area()
    rows = [
        (1, 600.0, 12.0),
        (2, 101.0, 8.1),
        (3, 300.0, 12.5),
        (4, None, 9.0),
    ]
    df = spark.createDataFrame(rows, "id long, code double, lon double")
    got = df.select(
        "id",
        native_dk_area("code", "lon").alias("native"),
        pandas_dk_area("code", "lon").alias("vectorized"),
    ).collect()
    for r in got:
        assert r["native"] == r["vectorized"], r
    by_id = {r["id"]: r["native"] for r in got}
    assert by_id == {1: "1", 2: "1", 3: "2", 4: None}


def test_apply_in_pandas_grouped(spark):
    """applyInPandas grouped-map: per-group normalization, the grouped
    extension shape."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 30.0)],
        "k string, v double",
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf["v"] = pdf["v"] - pdf["v"].mean()
        return pdf

    out = df.groupBy("k").applyInPandas(center, "k string, v double")
    got = {(r["k"], r["v"]) for r in out.collect()}
    assert got == {("a", -1.0), ("a", 1.0), ("b", -10.0), ("b", 10.0)}
