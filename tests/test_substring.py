"""Exact-substring span detection (llm/substring.py): corner cases and
a seeded brute-force reference comparison — span merging is exactly
maximal-consecutive-runs, short docs contribute nothing, and within-doc
repeats alone do not create "shared" windows.
"""

from __future__ import annotations

import random

import pytest

from sparkksqldbbenchmark_spark.llm.substring import shared_span_stats


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute(texts, k=3, min_docs=2):
    """Reference implementation: windows as tuples, doc frequency by
    set membership, spans by consecutive-position grouping."""
    toks = [t.lower().split() for t in texts]
    wins = [
        [tuple(ts[i : i + k]) for i in range(len(ts) - k + 1)]
        if len(ts) >= k
        else []
        for ts in toks
    ]
    docs_of = {}
    for d, ws in enumerate(wins):
        for w in set(ws):
            docs_of.setdefault(w, set()).add(d)
    out = {}
    for d, ws in enumerate(wins):
        shared = [
            i + 1 for i, w in enumerate(ws) if len(docs_of[w]) >= min_docs
        ]
        if not shared:
            continue
        spans, start = [], shared[0]
        prev = shared[0]
        for p in shared[1:]:
            if p != prev + 1:
                spans.append(prev - start + 1)
                start = p
            prev = p
        spans.append(prev - start + 1)
        out[d] = (len(shared), len(spans), max(spans) + k - 1)
    return out


def _run(spark, texts, k=3):
    rows = shared_span_stats(
        _df(spark, texts), "text", "doc_id", k=k
    ).collect()
    return {
        r.doc_id: (r.n_shared_pos, r.n_spans, r.longest_span_tokens)
        for r in rows
    }


def test_two_docs_single_shared_run_merges_to_one_span(spark):
    texts = [
        "a b c d e x y z",
        "q r a b c d e s",
    ]
    got = _run(spark, texts, k=3)
    # shared 3-gram windows: (a b c), (b c d), (c d e) — consecutive in
    # both docs → ONE span of 3 windows = 5 tokens
    assert got == _brute(texts, 3)
    assert got[0] == (3, 1, 5)


def test_disjoint_shared_regions_stay_separate_spans(spark):
    texts = [
        "a b c GAP1 GAP2 x y z",
        "a b c OTHER1 OTHER2 x y z",
    ]
    got = _run(spark, texts, k=3)
    assert got == _brute(texts, 3)
    assert got[0] == (2, 2, 3)  # two 1-window spans of 3 tokens


def test_short_docs_and_unshared_docs_absent(spark):
    texts = [
        "a b",            # shorter than k → no windows
        "p q r s t",      # windows, none shared
        "a b c d",
        "a b c d",
    ]
    got = _run(spark, texts, k=3)
    assert got == _brute(texts, 3)
    assert set(got) == {2, 3}


def test_within_doc_repeat_alone_is_not_shared(spark):
    # doc 0 repeats its own trigram; doc frequency counts DISTINCT
    # documents, so a self-repeat must not mark anything shared
    texts = ["m n o m n o m n o", "completely different words here"]
    assert _run(spark, texts, k=3) == {}


def test_seeded_random_corpus_matches_bruteforce(spark):
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 20)))
        for _ in range(25)
    ]
    for k in (2, 3, 5):
        assert _run(spark, texts, k=k) == _brute(texts, k=k), k
