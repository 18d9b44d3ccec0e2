"""Deterministic sampling and dataset-split operators for training-data
pipelines.

Both operators key on a cross-engine md5-derived hash
(llm/hashing.spark_md5_int) so the SAME rows are selected on Spark and in
the DuckDB oracle, run-to-run and engine-to-engine — no rand() anywhere.

Scale design: both are pure scan-side filters/projections — the hash is
computed per row from the key column, compared against a constant
threshold, and never shuffled. At 100 TB that means: no repartition, no
window, full predicate/column pushdown to the parquet scan, and the
selected fraction streams straight into the next stage. The classic
alternative (row_number over a per-stratum window ordered by hash) gives
exact per-stratum counts but costs a full shuffle on the stratum key and
melts on skewed strata; the threshold form is the one that survives a
1000-executor cluster, with binomial-concentration counts (±O(√n) of the
target fraction) that are fully deterministic given the salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Hash buckets for fraction/threshold arithmetic. 10_000 buckets → fraction
# resolution of 0.01%; the md5-derived 60-bit hash is uniform so bucket =
# hash % N_BUCKETS is uniform too.
N_BUCKETS = 10_000


def hash_bucket(key: Column | str, salt: str, n_buckets: int = N_BUCKETS) -> Column:
    """Deterministic uniform bucket in [0, n_buckets) for a key column.

    The salt namespaces independent sampling decisions: a doc sampled by
    ``salt='sample-v1'`` is statistically independent of its train/val/test
    assignment under ``salt='split-v1'`` (different salt → different md5
    stream), yet both are reproducible forever.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    keyed = F.concat(F.lit(f"{salt}:"), key_col.cast("string"))
    # md5 over the salted string key → 60-bit int → mod buckets; the same
    # arithmetic as llm/hashing.spark_md5_int, built with Column ops so the
    # key can be any expression.
    return (
        F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("bigint")
        % n_buckets
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "sample-v1",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash bucket
    falls under its stratum's fraction threshold.

    One scan, zero shuffles: the stratum→threshold map compiles to a CASE
    expression evaluated row-side. Approximate per-stratum counts
    (binomial around fraction·n) — the trade that keeps this a filter
    rather than a window shuffle; see module docstring.
    """
    threshold = None
    for stratum, frac in sorted(fractions.items()):
        cond = F.col(stratum_col) == F.lit(stratum)
        t = F.lit(int(round(frac * N_BUCKETS)))
        threshold = F.when(cond, t) if threshold is None else threshold.when(cond, t)
    threshold = (
        threshold.otherwise(F.lit(int(round(default_fraction * N_BUCKETS))))
        if threshold is not None
        else F.lit(int(round(default_fraction * N_BUCKETS)))
    )
    bucket = hash_bucket(key_col, salt)
    return df.withColumn("sample_bucket", bucket).where(
        F.col("sample_bucket") < threshold
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    boundaries: dict[str, int] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every row a stable train/val/test split label from its key
    hash. ``boundaries`` maps label → exclusive upper percent bound over a
    100-bucket space, in label order: the default {'train': 98, 'val': 99,
    'test': 100} is a 98/1/1 split.

    Keying on a document id (not row position) makes the assignment stable
    under repartitioning, re-ingestion, and appends — the property that
    matters for contamination control: a doc can never migrate from test
    into train when the corpus grows.
    """
    if boundaries is None:
        boundaries = {"train": 98, "val": 99, "test": 100}
    if not boundaries:
        raise ValueError("hash_split: boundaries must name at least one split")
    if max(boundaries.values()) != 100:
        # every bucket 0-99 must map to a label — a silent NULL split is
        # exactly the contamination hazard this operator exists to prevent
        raise ValueError(
            "hash_split: largest boundary must be 100 so all buckets are "
            f"covered (got {max(boundaries.values())})"
        )
    bucket = hash_bucket(key_col, salt, n_buckets=100)
    label = None
    for name, upper in sorted(boundaries.items(), key=lambda kv: kv[1]):
        cond = bucket < F.lit(upper)
        label = F.when(cond, name) if label is None else label.when(cond, name)
    return df.withColumn("split_bucket", bucket).withColumn(
        "split", label
    )
