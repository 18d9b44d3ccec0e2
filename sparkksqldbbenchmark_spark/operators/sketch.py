"""KMV (k-minimum-values) distinct-count sketch (north-star "novel
sketch" surface; Bar-Yossef et al. '02).

Unlike HLL (F.approx_count_distinct — whose estimate is not reproducible
relationally, hence the rows-only approx_count_distinct check), KMV is
DETERMINISTIC given the hash function: the estimate is a pure function of
the k smallest distinct hash values, so a DuckDB oracle can replay it
exactly. The hash is the engines' shared md5-prefix integer
(functions used across the dedup suite): first 15 hex chars → 60-bit
integer, uniform on [0, 2^60).

Estimator: with U_k = kth smallest distinct hash / 2^60 (the kth order
statistic of n uniform draws), E[U_k] = k/(n+1), and the standard
unbiased KMV estimate is (k-1)/U_k. Relative error ~ 1/sqrt(k-2).

Scale shape: map-side partial dedup in the hash aggregate → shuffle of
|distinct hashes| only → TakeOrderedAndProject keeps k per partition and
merges — no global sort, no full distinct materialized on one node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_BITS = 60  # 15 hex chars


def kmv_distinct_estimate(
    df: DataFrame, col: str, *, k: int = 64
) -> DataFrame:
    """One row: (sample_k, kth_hash, est_distinct) — the KMV sketch of
    count(DISTINCT col). `sample_k < k` means the column had fewer than
    k distinct values and kth_hash degenerates to the max (the estimate
    still behaves: U_k then over-covers)."""
    hv = (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("hv")
    )
    smallest = (
        df.select(hv)
        .groupBy("hv")
        .agg(F.lit(1))
        .select("hv")
        .orderBy("hv")
        .limit(k)
    )
    return smallest.agg(
        F.count(F.lit(1)).alias("sample_k"),
        F.max("hv").alias("kth_hash"),
        (
            F.lit(float(k - 1))
            * F.pow(F.lit(2.0), F.lit(float(_HASH_BITS)))
            / F.max("hv").cast("double")
        ).alias("est_distinct"),
    )
