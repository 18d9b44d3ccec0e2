"""Unit tests for the two round-4-wired training-pipeline operators:
operators/packing.pack_offsets (distributed prefix-sum sequence packing)
and llm/decontam.ngram_overlap (benchmark decontamination audit).
Both also carry driver-graded oracle queries (plans/curation_queries);
these tests pin the operator-level semantics on hand-built frames."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.llm.decontam import ngram_overlap
from sparkksqldbbenchmark_spark.operators.packing import pack_offsets


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def _expected_offsets(rows, capacity, seed="pack-v1"):
    """Brute-force twin: python md5 key, global sort, running sum."""

    def key(doc_id):
        h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
        return int(h[:15], 16)

    ordered = sorted(rows, key=lambda r: (key(r[0]), r[0]))
    out, acc = {}, 0
    for doc_id, n in ordered:
        out[doc_id] = (
            acc,
            acc // capacity,
            acc % capacity,
            acc % capacity + n > capacity,
        )
        acc += n
    return out


def test_pack_offsets_matches_bruteforce(spark):
    rows = [(i, (i * 37) % 190 + 1) for i in range(200)]
    got = {
        r["doc_id"]: (
            r["start_offset"],
            r["pack_id"],
            r["pack_offset"],
            r["straddles"],
        )
        for r in pack_offsets(_docs(spark, rows), capacity=128).collect()
    }
    assert got == _expected_offsets(rows, capacity=128)


def test_pack_offsets_independent_of_bucket_count(spark):
    """The bucketed prefix-sum decomposition is an execution detail:
    any power-of-two bucket count yields the identical assignment."""
    rows = [(i, i % 50 + 1) for i in range(300)]
    df = _docs(spark, rows)
    a = sorted(
        pack_offsets(df, capacity=256, n_buckets=4).collect(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        pack_offsets(df, capacity=256, n_buckets=1024).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_pack_offsets_total_and_contiguity(spark):
    """Offsets tile the token stream exactly: sorted start offsets are
    the exclusive cumsum of token counts (no gaps, no overlap), and the
    final document ends at the corpus total."""
    rows = [(i, (i * 13) % 97 + 1) for i in range(150)]
    res = pack_offsets(_docs(spark, rows), capacity=64).collect()
    by_start = sorted(res, key=lambda r: r["start_offset"])
    acc = 0
    for r in by_start:
        assert r["start_offset"] == acc
        acc += r["n_tokens"]
    assert acc == sum(n for _, n in rows)


def test_pack_offsets_rejects_non_divisor_buckets(spark):
    with pytest.raises(ValueError):
        pack_offsets(_docs(spark, [(1, 1)]), n_buckets=1000)


WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"


def _text_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_overlap_flags_exact_copy(spark):
    eval_df = _text_df(spark, [(100, WORDS)])
    train = _text_df(
        spark,
        [
            (1, WORDS),  # exact copy -> full overlap
            (2, "unrelated words that share no eight gram with the eval"
                " set at all here"),
        ],
    )
    got = {
        r["doc_id"]: r
        for r in ngram_overlap(train, eval_df, n=8, threshold=0.3).collect()
    }
    assert set(got) == {1, 2}, "every training doc must appear in the audit"
    assert got[1]["overlap_count"] == got[1]["n_shingles"] > 0
    assert got[1]["overlap_frac"] == 1.0 and got[1]["contaminated"]
    assert got[2]["overlap_count"] == 0
    assert got[2]["overlap_frac"] == 0.0 and not got[2]["contaminated"]


def test_ngram_overlap_partial_and_threshold(spark):
    # 12-token train doc vs an 11-token eval doc sharing its first 11
    # tokens: train has 5 shingles (12-8+1); the 4 lying fully inside
    # the shared 11-token prefix overlap -> frac 0.8
    shared = WORDS + " kilo lima"
    eval_df = _text_df(spark, [(100, WORDS + " kilo")])  # 11 tokens
    train = _text_df(spark, [(1, shared)])
    row = ngram_overlap(train, eval_df, n=8, threshold=0.7).collect()[0]
    assert row["n_shingles"] == 5
    assert row["overlap_count"] == 4
    assert row["overlap_frac"] == pytest.approx(0.8)
    assert row["contaminated"]  # 0.8 >= 0.7


def test_ngram_overlap_short_doc_single_shingle(spark):
    """Docs shorter than n words collapse to one whole-doc shingle (the
    greatest(...,1) guard) — overlap is then exact-match semantics."""
    eval_df = _text_df(spark, [(100, "tiny eval doc")])
    train = _text_df(spark, [(1, "tiny eval doc"), (2, "different doc")])
    got = {
        r["doc_id"]: r
        for r in ngram_overlap(train, eval_df, n=8, threshold=0.5).collect()
    }
    assert got[1]["n_shingles"] == 1 and got[1]["contaminated"]
    assert got[2]["n_shingles"] == 1 and not got[2]["contaminated"]


def test_ngram_overlap_shuffle_fallback_matches_broadcast(spark):
    eval_df = _text_df(spark, [(100, WORDS)])
    train = _text_df(spark, [(1, WORDS), (2, "something else entirely"
                                             " with many other words here"
                                             " to fill the doc out")])
    a = sorted(
        ngram_overlap(train, eval_df, broadcast_eval=True).collect(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        ngram_overlap(train, eval_df, broadcast_eval=False).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_pack_offsets_property_random_corpora(spark):
    """Property: for arbitrary (id, n_tokens) corpora — including zero
    token counts, duplicated sizes, and non-contiguous ids — the
    distributed prefix-sum assignment equals the brute-force global
    cumsum in shuffle order. Hypothesis drives the corpus shape; Spark
    runs once per example, so examples are few but adversarial."""
    from hypothesis import given, settings, strategies as st

    corpus = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )

    @settings(max_examples=6, deadline=None)
    @given(rows=corpus, capacity=st.sampled_from([1, 7, 64, 2048]))
    def check(rows, capacity):
        got = {
            r["doc_id"]: (
                r["start_offset"],
                r["pack_id"],
                r["pack_offset"],
                r["straddles"],
            )
            for r in pack_offsets(
                _docs(spark, rows), capacity=capacity, n_buckets=16
            ).collect()
        }
        assert got == _expected_offsets(rows, capacity=capacity)

    check()


def test_pack_manifest_tiles_docs_and_packs(spark):
    """Manifest invariants: each doc's segments tile its tokens exactly
    (slice starts contiguous from 0, lengths sum to n_tokens); each
    pack's segments tile the pack exactly (offsets contiguous from 0,
    full packs sum to capacity); zero-token docs emit nothing."""
    from sparkksqldbbenchmark_spark.operators.packing import pack_manifest

    rows = [(i, (i * 131) % 300) for i in range(120)]  # includes 0-token
    packed = pack_offsets(_docs(spark, rows), capacity=256)
    man = pack_manifest(packed, capacity=256).collect()

    by_doc = {}
    for r in man:
        by_doc.setdefault(r["doc_id"], []).append(r)
    expected_docs = {i for i, n in rows if n > 0}
    assert set(by_doc) == expected_docs
    for doc_id, segs in by_doc.items():
        segs.sort(key=lambda r: r["doc_slice_start"])
        acc = 0
        for s in segs:
            assert s["doc_slice_start"] == acc
            assert s["seg_tokens"] >= 1
            acc += s["seg_tokens"]
        assert acc == dict(rows)[doc_id]

    by_pack = {}
    for r in man:
        by_pack.setdefault(r["pack_id"], []).append(r)
    last_pack = max(by_pack)
    for pack_id, segs in by_pack.items():
        segs.sort(key=lambda r: r["pack_offset"])
        acc = 0
        for s in segs:
            assert s["pack_offset"] == acc, "segments must tile the pack"
            acc += s["seg_tokens"]
        if pack_id != last_pack:
            assert acc == 256, f"non-final pack {pack_id} must be full"
        else:
            assert 0 < acc <= 256
