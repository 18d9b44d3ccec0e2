"""Scan-side sentence statistics without the quadratic fold.

The curation/Gopher rows need only TWO numbers per document from the
planted sentence structure: the sentence count ``ns`` and the distinct
sentence count ``nd``. The original implementation materialized the
sentence STRINGS with one ``aggregate()`` higher-order fold whose state
struct carried the growing sentence array and the current sentence
prefix — every flagged word copied the whole accumulated array and
every word re-concatenated the accumulated prefix, so one document cost
O(ns² + Σ|sentence|²) interpreted work (optimization guide §4: the
single most expensive per-row expression in the registry, measured as
the dominant term of curation_pipeline_v4's 7 s).

This module computes the same two numbers in O(n) per document inside
ONE Arrow-batched pandas UDF (guide §4.2: hand whole batches to
Python, move only the columns the function needs — the token array —
across the boundary once):

- A word whose md5-int & 3 == 0 CLOSES its sentence (the planted
  boundary convention shared by every consumer), so the 1-based END
  positions of the sentences are exactly the flagged positions, plus
  ``len(toks)`` when the last word is unflagged (the fold's trailing
  ``cur`` flush).
- ``ns`` = number of ends.
- Tokens come from ``\\S+`` extraction, so they contain no spaces and
  joining with ' ' is injective: two sentences are string-equal iff
  their token slices are tuple-equal. ``nd`` therefore counts distinct
  token TUPLES — no string building at all.

The UDF is marked non-deterministic ON PURPOSE (guide §4.4): the keep
filters downstream reference ns/nd, and Catalyst would otherwise push
the predicate below the projection by INLINING the stats expression
into it — evaluating the whole chain a second time per row (and, for
the earlier native-expression form of this module, re-evaluating the
token/flag arrays PER ELEMENT inside the pushed predicate's lambdas:
a measured 6 s → 53 s blow-up on curation_pipeline_v3). Results are
deterministic; the flag only pins evaluation to exactly once.

A native-expression variant (filter/slice/array_distinct over boundary
positions) was measured first: 1.8× faster than the fold in isolation,
but any filter pushed through it re-evaluates ``element_at(ends, k)``
lambdas per element with the full upstream expression inlined —
catastrophically quadratic. The Python boundary is the form whose cost
model survives the optimizer.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _stats_batch(toks_batch) -> tuple[list[int], list[int]]:
    ns_out: list[int] = []
    nd_out: list[int] = []
    md5 = hashlib.md5
    for toks in toks_batch:
        n = len(toks)
        ends: list[int] = []
        for i, w in enumerate(toks):
            # spark_md5_int(w) & 3 == 0: first 15 hex chars of md5 as
            # int (< 2^60, exact in both engines)
            if int(md5(w.encode()).hexdigest()[:15], 16) & 3 == 0:
                ends.append(i + 1)
        if not ends or ends[-1] != n:
            ends.append(n)
        ns_out.append(len(ends))
        seen = set()
        prev = 0
        for e in ends:
            seen.add(tuple(toks[prev:e]))
            prev = e
        nd_out.append(len(seen))
    return ns_out, nd_out


def sentence_counts_udf() -> Column:
    """Arrow-batched (iterator form, guide §4.5) sentence-stat UDF:
    array<string> toks → struct<ns int, nd int>."""
    import pandas as pd

    def _stats_gen(
        batches: Iterator[pd.Series],
    ) -> Iterator[pd.DataFrame]:
        for toks_s in batches:
            ns_out, nd_out = _stats_batch(toks_s)
            yield pd.DataFrame({"ns": ns_out, "nd": nd_out})

    _stats = F.pandas_udf(
        _stats_gen,
        "struct<ns: int, nd: int>",
        F.PandasUDFType.SCALAR_ITER,
    )

    # deliberate: block predicate pushdown/duplication (guide §4.4),
    # not an actual source of randomness
    return _stats.asNondeterministic()


def with_sentence_counts(
    df: DataFrame,
    toks_col: str = "toks",
    ns_col: str = "ns",
    nd_col: str = "nd",
) -> DataFrame:
    """Add sentence-count columns ``ns_col``/``nd_col`` derived from the
    token array ``toks_col`` (must be non-empty on every row)."""
    stats = sentence_counts_udf()
    out = df.withColumn("_sc_stats", stats(F.col(toks_col)))
    out = out.withColumn(ns_col, F.col("_sc_stats.ns"))
    out = out.withColumn(nd_col, F.col("_sc_stats.nd"))
    return out.drop("_sc_stats")
