"""Sentence-stat device tests (llm/sentences.py, r18 optimization).

The curation/Gopher rows replaced the O(ns²) accumulate-struct fold
with an Arrow-batched pandas UDF computing (ns, nd) in O(n). These
tests pin the device against a direct Python replica of the ORIGINAL
fold semantics (build sentence strings, count, count-distinct) on
corner-case token lists, and pin the Spark plan properties the
optimization relies on (single ArrowEvalPython, no fold re-evaluation
under a pushed filter).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.llm.sentences import (
    _stats_batch,
    with_sentence_counts,
)


def _flag(w: str) -> bool:
    return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) & 3 == 0


def _fold_reference(toks: list[str]) -> tuple[int, int]:
    """Direct replica of the original aggregate() fold: build the
    sentence STRINGS, then count and count-distinct."""
    ss: list[str] = []
    cur = ""
    for w in toks:
        joined = w if cur == "" else f"{cur} {w}"
        if _flag(w):
            ss.append(joined)
            cur = ""
        else:
            cur = joined
    if cur != "":
        ss.append(cur)
    return len(ss), len(set(ss))


def _flagged_word() -> str:
    for i in range(10000):
        w = f"w{i}"
        if _flag(w):
            return w
    raise AssertionError("no flagged word found")


def _unflagged_word() -> str:
    for i in range(10000):
        w = f"w{i}"
        if not _flag(w):
            return w
    raise AssertionError("no unflagged word found")


def test_stats_batch_matches_fold_on_corner_cases():
    fw, uw = _flagged_word(), _unflagged_word()
    cases = [
        [uw],                      # single unflagged -> 1 sentence
        [fw],                      # single flagged -> 1 sentence
        [fw, fw, fw],              # consecutive boundaries, duplicates
        [uw, uw, uw],              # no boundary at all
        [uw, fw, uw, fw, uw],      # trailing unflagged flush
        [uw, fw, uw, fw],          # ends on a boundary
        [uw, fw, uw, fw, uw, fw],  # repeated sentence [uw fw] x3
        [fw, uw],                  # boundary first
        [f"w{i}" for i in range(200)],  # long mixed run
    ]
    ns, nd = _stats_batch(cases)
    for toks, got_ns, got_nd in zip(cases, ns, nd):
        exp_ns, exp_nd = _fold_reference(toks)
        assert (got_ns, got_nd) == (exp_ns, exp_nd), toks


def test_with_sentence_counts_spark_matches_fold(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "one"),
        (2, "x y z x y z x y z"),
        (3, "  padded   whitespace   tokens  "),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).select(
        "doc_id",
        F.expr("regexp_extract_all(text, '\\\\S+', 0)").alias("toks"),
    ).where(F.size("toks") > 0)
    out = {
        r.doc_id: (r.ns, r.nd)
        for r in with_sentence_counts(df).select(
            "doc_id", "ns", "nd"
        ).collect()
    }
    toks_by_id = {r.doc_id: list(r.toks) for r in df.collect()}
    for doc_id, toks in toks_by_id.items():
        assert out[doc_id] == _fold_reference(toks), doc_id


def test_pushed_filter_does_not_reevaluate_stats(spark):
    """The keep filters downstream reference ns/nd; the UDF is marked
    non-deterministic precisely so Catalyst cannot push the predicate
    below the projection and re-evaluate the stats (or, worse, inline
    array intermediates into per-element lambdas — the measured
    6 s → 53 s blow-up on curation_pipeline_v3). Exactly ONE Python
    eval node must survive optimization."""
    df = spark.createDataFrame(
        [(i, "a b c d e f g") for i in range(10)], ["doc_id", "text"]
    ).select(
        "doc_id",
        F.expr("regexp_extract_all(text, '\\\\S+', 0)").alias("toks"),
    ).where(F.size("toks") > 0)
    out = with_sentence_counts(df).where(
        (F.col("ns") - F.col("nd")) * 1000000 / F.col("ns") < 300000
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    n_py = plan.count("ArrowEvalPython") + plan.count("BatchEvalPython")
    assert n_py == 1, plan
