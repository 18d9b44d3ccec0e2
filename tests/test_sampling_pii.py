"""Tests for deterministic sampling/split operators and PII scrubbing."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.llm.pii import (
    PII_PATTERNS,
    with_pii_scrub,
)
from sparkksqldbbenchmark_spark.operators.sampling import (
    hash_bucket,
    hash_split,
    stratified_sample,
)

from .conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


# ------------------------------------------------------------- sampling --


def test_hash_bucket_range_and_determinism(spark):
    df = _docs(spark).select(
        hash_bucket("doc_id", "sample-v1").alias("b")
    )
    rows = [r.b for r in df.collect()]
    assert all(0 <= b < 10_000 for b in rows)
    rows2 = [r.b for r in df.collect()]
    assert rows == rows2


def test_hash_bucket_salt_independence(spark):
    df = _docs(spark).select(
        hash_bucket("doc_id", "a").alias("ba"),
        hash_bucket("doc_id", "b").alias("bb"),
    )
    rows = df.collect()
    assert any(r.ba != r.bb for r in rows)


def test_stratified_sample_fractions_and_stability(spark):
    docs = _docs(spark)
    fractions = {"en": 0.5, "de": 0.2}
    sampled = stratified_sample(docs, "lang", fractions, key_col="doc_id")
    got = sampled.groupBy("lang").count().collect()
    totals = dict(
        docs.groupBy("lang").count().rdd.map(tuple).collect()
    )
    for row in got:
        frac = fractions.get(row["lang"], 0.0)
        assert frac > 0, "unsampled stratum leaked through"
        # binomial tolerance: generous 3-sigma-ish band at tiny n
        import math

        n = totals[row["lang"]]
        sd = math.sqrt(n * frac * (1 - frac))
        assert abs(row["count"] - n * frac) <= 3 * sd + 1
    # stability under repartitioning: same rows either way
    ids_a = {r.doc_id for r in sampled.select("doc_id").collect()}
    ids_b = {
        r.doc_id
        for r in stratified_sample(
            docs.repartition(7), "lang", fractions, key_col="doc_id"
        )
        .select("doc_id")
        .collect()
    }
    assert ids_a == ids_b


def test_stratified_sample_is_shuffle_free(spark):
    docs = _docs(spark)
    sampled = stratified_sample(
        docs, "lang", {"en": 0.5}, key_col="doc_id"
    ).select("doc_id", "sample_bucket")
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_hash_split_complete_and_stable(spark):
    docs = _docs(spark)
    labeled = hash_split(docs, "doc_id")
    rows = labeled.select("doc_id", "split", "split_bucket").collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert all(r.split is not None for r in rows)
    # stable under growth: assignment of existing ids unchanged when the
    # corpus is filtered (split is a pure function of the key)
    subset = hash_split(docs.where(F.col("doc_id") < 100), "doc_id")
    sub = {r.doc_id: r.split for r in subset.collect()}
    full = {r.doc_id: r.split for r in rows}
    assert all(full[k] == v for k, v in sub.items())
    # 98/1/1 means train strongly dominates
    from collections import Counter

    c = Counter(r.split for r in rows)
    assert c["train"] > 0.9 * len(rows)


# ------------------------------------------------------------------ pii --


def test_pii_patterns_match_python_re(spark):
    """Spark's Java regex and Python re agree on these dialect-restricted
    patterns — independent reference for the cross-engine claim."""
    samples = [
        "write to alice.smith+tag@sub.example.co today",
        "ssn 123-45-6789 phone 555-123-4567 both present",
        "server at 10.0.255.3 and 192.168.1.100.",
        "no pii here at all",
        "trailing match bob@x.io",
        "123-45-678 is not an ssn; 1234-56-7890 neither",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "id long, text string")
    out = with_pii_scrub(df, text_col="text").collect()
    for row in out:
        s = samples[row.id]
        for name, pat in PII_PATTERNS.items():
            expect = len(re.findall(pat, s))
            assert row[f"{name}_count"] == expect, (name, s)


def test_pii_redaction_replaces_all(spark):
    df = spark.createDataFrame(
        [(1, "a@b.io then 10.1.2.3 then 999-12-3456 then 555-000-1111 end")],
        "id long, text string",
    )
    row = with_pii_scrub(df, text_col="text").collect()[0]
    assert row.redacted == (
        "<EMAIL> then <IPV4> then <SSN> then <PHONE> end"
    )
    assert row.total_pii == 4
    # idempotent: scrubbing the redacted text finds nothing
    df2 = spark.createDataFrame([(1, row.redacted)], "id long, text string")
    row2 = with_pii_scrub(df2, text_col="text").collect()[0]
    assert row2.total_pii == 0


def test_pii_scrub_is_shuffle_free(spark):
    docs = _docs(spark)
    out = with_pii_scrub(docs, text_col="text").select(
        "doc_id", "total_pii", "redacted"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_pii_counts_match_python_re_randomized(spark):
    """Property-style: over 500 seeded random strings drawn from an
    alphabet dense in digits/@/.-, Spark's Java-regex counts equal
    Python re.findall counts for every pattern (three engines agree:
    Java, RE2 via the oracle gate, Python here)."""
    import random

    rng = random.Random(20260813)
    alphabet = "0123456789@.- abcdefg\t"
    samples = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 80)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "id long, text string"
    )
    rows = with_pii_scrub(df, text_col="text").collect()
    mismatches = []
    for row in rows:
        cur = samples[row.id]
        total = 0
        for name, pat in PII_PATTERNS.items():
            expect = len(re.findall(pat, cur))
            total += expect
            if row[f"{name}_count"] != expect:
                mismatches.append(
                    (name, repr(cur), row[f"{name}_count"], expect)
                )
            cur = re.sub(pat, f"<{name.upper()}>", cur)
        # the audit invariant: counts sum to the redactions in the output
        if row.total_pii != total or row.redacted != cur:
            mismatches.append(("staged", repr(samples[row.id])))
    assert not mismatches, mismatches[:5]
