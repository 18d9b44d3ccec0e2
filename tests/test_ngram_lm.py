"""Semantic pins for the n-gram LM familiarity scorer (graduated to
plans/round9_queries.py) beyond the value-hash oracle: text copied from
the training slice must outscore novel-vocabulary text, and
out-of-vocabulary bigrams contribute exactly zero.
"""

from __future__ import annotations

import sparkksqldbbenchmark_spark.plans.round9_queries  # noqa: F401
from sparkksqldbbenchmark_spark.plans.registry import QUERIES as STAGED

SF_DIR = "/root/testdata/sf0.001"


def test_training_copy_outscores_novel_text(spark):
    """Replace two held-out docs' text: one with a verbatim copy of a
    TRAINING doc, one with pure novel vocabulary. The copy must come
    back with high familiarity and full bigram coverage; the novel doc
    with zero."""
    from pyspark.sql import functions as F

    from sparkksqldbbenchmark_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    train_text = (
        docs.where(F.col("doc_id") == 1).collect()[0].text
    )  # doc 1 is in the training slice (1 % 10 != 0)
    novel = " ".join(f"zzqx{i}" for i in range(30))
    patched = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 10, F.lit(train_text))
        .when(F.col("doc_id") == 20, F.lit(novel))
        .otherwise(F.col("text")),
    )

    # route the query's documents load to the patched frame
    import sparkksqldbbenchmark_spark.plans.round9_queries as nr

    orig_load = nr.load_table
    nr.load_table = lambda s, d, n: patched if n == "documents" else orig_load(s, d, n)
    try:
        rows = {
            r.doc_id: r
            for r in STAGED["ngram_lm_familiarity"](spark, SF_DIR).collect()
        }
    finally:
        nr.load_table = orig_load

    copy_row, novel_row = rows[10], rows[20]
    # the verbatim copy: every bigram seen in training, familiarity > 0
    assert copy_row.n_known == copy_row.n_bigrams > 0
    assert copy_row.familiarity > 0
    # the novel doc: nothing seen, familiarity exactly zero
    assert novel_row.n_known == 0
    assert novel_row.familiarity == 0
    # and the copy strictly outscores the novel doc per-bigram
    assert (
        copy_row.familiarity / copy_row.n_bigrams
        > novel_row.familiarity / max(novel_row.n_bigrams, 1)
    )
