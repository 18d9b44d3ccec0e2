"""Training-data curation queries: composite pipelines a 100 TB data
curation job actually runs — vocabulary statistics, quality+lang+dedup
filtering — built from the llm/ operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.catalog import load_table
from sparkksqldbbenchmark_spark.llm import pii
from sparkksqldbbenchmark_spark.llm import text as text_ops
from sparkksqldbbenchmark_spark.llm.hashing import (
    spark_md5_int,
    spark_tokens,
    sql_md5_int,
)
from sparkksqldbbenchmark_spark.operators.sampling import (
    hash_split,
    stratified_sample,
)
from sparkksqldbbenchmark_spark.plans.registry import query


@query(
    "vocab_top_tokens",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text),
               '\S+'))) AS token
        FROM documents
    )
    SELECT token,
           count(*) AS doc_frequency
    FROM tok
    GROUP BY token
    ORDER BY doc_frequency DESC, token
    LIMIT 20
    """,
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: top-20 tokens by document frequency
    (distinct docs containing the token). explode(distinct tokens) →
    count → TakeOrderedAndProject; partial counts merge map-side so the
    shuffle carries one row per (token, partition)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.expr(spark_tokens("lower(text)")))
        ).alias("token"),
    )
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_frequency"))
        .orderBy(F.desc("doc_frequency"), F.asc("token"))
        .limit(20)
    )


@query(
    "text_repetition_ratio",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents
    ), g AS (
        SELECT doc_id,
               list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                   i -> array_to_string(toks[i : i + 2], ' ')) AS grams
        FROM t
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS total_3grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS distinct_3grams,
           1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                 / CAST(len(grams) AS DOUBLE) AS repetition_ratio
    FROM g
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (boilerplate/spam signal): fraction of
    word 3-grams that are repeats. High ratio → templated or degenerate
    text — a standard pretraining-quality heuristic alongside the
    stopword/length filters."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.expr(spark_tokens("text")).alias("toks")
    )
    grams = toks.select(
        "doc_id",
        F.expr(
            "transform(sequence(1, greatest(size(toks) - 2, 1)),"
            " i -> concat_ws(' ', slice(toks, i, 3)))"
        ).alias("grams"),
    )
    return grams.select(
        "doc_id",
        F.size("grams").cast("long").alias("total_3grams"),
        F.size(F.array_distinct("grams")).cast("long").alias("distinct_3grams"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct("grams")).cast("double")
            / F.size("grams").cast("double")
        ).alias("repetition_ratio"),
    )


@query(
    "curation_pipeline",
    oracle=rf"""
    WITH scored AS (
        SELECT doc_id, source, lang,
               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                   AS n_tokens,
               CAST(len(list_filter(regexp_extract_all(text, '\S+'),
                    t -> list_contains([{",".join(chr(39)+w+chr(39) for w in text_ops.STOPWORDS["en"])}], lower(t))))
                   AS BIGINT) AS stopword_hits,
               min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
        FROM documents
    ), kept AS (
        SELECT * FROM scored
        WHERE doc_id = canonical_id        -- exact-dedup keep-first
          AND n_tokens >= 20               -- length floor
          AND stopword_hits * 1.0 / n_tokens >= 0.05  -- quality floor
    )
    SELECT source,
           count(*) AS docs_kept,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_kept
    FROM kept GROUP BY source
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite curation job: exact-dedup (keep canonical) + length
    floor + stopword-ratio quality floor, reporting kept docs/tokens per
    source — the shape of a real pretraining-data filter stage. One
    window (content-hash partition) + one aggregation."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    scored = text_ops.with_quality_scores(docs).withColumn(
        "canonical_id",
        F.min("doc_id").over(Window.partitionBy(F.md5("text"))),
    )
    kept = scored.where(
        (F.col("doc_id") == F.col("canonical_id"))
        & (F.col("n_tokens") >= 20)
        & (F.col("stopword_hits") * 1.0 / F.col("n_tokens") >= 0.05)
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
    )


# -------------------------------------------------------- PII scrubbing --

def _enrich_expr(cast_type: str) -> str:
    """Deterministic PII-bearing text, identical SQL in both dialects: the
    synthetic corpus contains no PII, so the query plants emails / phones /
    SSNs / IPs derived from doc_id (different doc_id residues get different
    PII classes) and then scrubs them. Everything downstream — counts,
    redaction, hashes — exercises the real operator on measurable input."""

    def c(e: str) -> str:
        return f"cast({e} as {cast_type})"

    return (
        "concat(text,"
        " case when doc_id % 3 = 0 then"
        f" concat(' Contact user', {c('doc_id')},"
        " '@example.com for details.') else '' end,"
        " case when doc_id % 4 = 0 then"
        f" concat(' Call 555-', lpad({c('doc_id % 1000')}, 3, '0'), '-',"
        f" lpad({c('doc_id % 10000')}, 4, '0'), '.') else '' end,"
        " case when doc_id % 5 = 0 then"
        f" concat(' SSN ', {c('doc_id % 900 + 100')}, '-',"
        f" {c('doc_id % 90 + 10')}, '-', {c('doc_id % 9000 + 1000')},"
        " ' on file.') else '' end,"
        " case when doc_id % 2 = 0 then"
        f" concat(' Seen from 10.', {c('doc_id % 256')}, '.0.',"
        f" {c('(doc_id * 7) % 256')}, '.') else '' end)"
    )


def _pii_oracle() -> str:
    staged = pii.sql_pii_staged_counts("enriched")
    counts = ",\n           ".join(
        f"{cnt} AS {name}_count" for name, cnt in staged
    )
    total = " + ".join(cnt for _, cnt in staged)
    scrub = pii.sql_pii_scrub("enriched")
    return (
        "WITH e AS (\n"
        f"    SELECT doc_id, {_enrich_expr('varchar')} AS enriched\n"
        "    FROM documents\n"
        ")\n"
        f"SELECT doc_id,\n           {counts},\n"
        f"           {total} AS total_pii,\n"
        f"           md5({scrub}) AS redacted_hash,\n"
        f"           CAST(len({scrub}) AS BIGINT) AS redacted_len\n"
        "FROM e"
    )


@query("pii_scrub_stats", oracle=_pii_oracle())
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails, US-shape SSNs/phones, IPv4) with per-class
    match counts — the scrub stage of a pretraining-data pipeline. Pure
    regexp_replace/split built-ins: per-row, codegen'd, no shuffle; at
    100 TB this runs at parquet-scan speed. The redacted text is reported
    as md5 + length so the oracle pins the exact output bytes without
    hauling full documents through the compare."""
    docs = load_table(spark, sf_dir, "documents")
    enriched = docs.withColumn("enriched", F.expr(_enrich_expr("string")))
    scrubbed = pii.with_pii_scrub(enriched, text_col="enriched")
    return scrubbed.select(
        "doc_id",
        *[F.col(f"{n}_count") for n in pii.PII_PATTERNS],
        "total_pii",
        F.md5("redacted").alias("redacted_hash"),
        F.length("redacted").cast("long").alias("redacted_len"),
    )


# ------------------------------------------------- deterministic sampling --

_SAMPLE_FRACTIONS = {"en": 0.5, "de": 0.3, "fr": 0.2, "es": 0.2, "zh": 0.1}


def _sample_oracle() -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN {int(round(frac * 10000))}"
        for lang, frac in sorted(_SAMPLE_FRACTIONS.items())
    )
    # built from the SAME shared hash builder as the Spark side's
    # hash_bucket arithmetic (llm/hashing) so the convention can't drift
    key = "'sample-v1:' || CAST(doc_id AS VARCHAR)"
    bucket = f"({sql_md5_int(key)}) % 10000"
    return (
        "WITH b AS (\n"
        f"    SELECT doc_id, lang, {bucket} AS sample_bucket\n"
        "    FROM documents\n"
        ")\n"
        "SELECT doc_id, lang, sample_bucket\n"
        "FROM b\n"
        f"WHERE sample_bucket < CASE lang {cases} ELSE 0 END"
    )


@query("stratified_sample", oracle=_sample_oracle())
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsampling (en 50%, de 30%, fr/es 20%,
    zh 10%) — the data-mixing step of corpus assembly. Hash-threshold
    form: one scan, ZERO shuffles (the stratum→threshold map compiles to a
    row-side CASE), reproducible row set under any partitioning. The exact
    per-stratum-count alternative (row_number window per stratum) costs a
    full shuffle and melts on skewed strata; binomial-accurate fractions
    are the 100 TB trade. operators/sampling.py."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "lang", _SAMPLE_FRACTIONS, key_col="doc_id"
    ).select("doc_id", "lang", "sample_bucket")


def _split_oracle() -> str:
    key = "'split-v1:' || CAST(doc_id AS VARCHAR)"
    bucket = f"({sql_md5_int(key)}) % 100"
    return (
        "WITH b AS (\n"
        f"    SELECT doc_id, n_chars, {bucket} AS split_bucket\n"
        "    FROM documents\n"
        "), labeled AS (\n"
        "    SELECT CASE WHEN split_bucket < 98 THEN 'train'\n"
        "                WHEN split_bucket < 99 THEN 'val'\n"
        "                ELSE 'test' END AS split,\n"
        "           n_chars\n"
        "    FROM b\n"
        ")\n"
        "SELECT split, count(*) AS n_docs,\n"
        "       CAST(sum(n_chars) AS BIGINT) AS total_chars\n"
        "FROM labeled GROUP BY split"
    )


@query("hash_split_assignment", oracle=_split_oracle())
def hash_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable train/val/test assignment (98/1/1) keyed on doc_id hash —
    contamination control for training corpora: a document's split never
    changes under repartitioning, re-ingestion, or corpus growth. Scan +
    one small aggregation; the per-doc labeling itself is shuffle-free.
    operators/sampling.py."""
    docs = load_table(spark, sf_dir, "documents")
    labeled = hash_split(docs, "doc_id")
    return labeled.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# ------------------------------------------------ cluster-aware keep-best --

def _keep_best_oracle() -> str:
    from sparkksqldbbenchmark_spark.plans.llm_queries import (
        _cluster_oracle,
        sql_quality_score,
    )

    return f"""
    WITH labels AS (
        {_cluster_oracle()}
    ), quality AS (
        SELECT doc_id,
               {sql_quality_score("text")} AS quality_score
        FROM documents
    ), ranked AS (
        SELECT l.component AS cluster_id, l.doc_id, q.quality_score,
               count(*) OVER (PARTITION BY l.component) AS cluster_size,
               row_number() OVER (PARTITION BY l.component
                   ORDER BY q.quality_score DESC, l.doc_id) AS rn
        FROM labels l JOIN quality q ON l.doc_id = q.doc_id
    )
    SELECT cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size,
           doc_id AS kept_doc_id, quality_score AS kept_quality
    FROM ranked WHERE rn = 1
    """


@query("dedup_keep_best", oracle=_keep_best_oracle())
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware canonicalization: within each near-dup cluster
    (minhash-LSH pair graph → connected components) keep the HIGHEST-
    quality document, not the arbitrary first — the keep-policy real
    curation jobs want. One row per cluster with its size, survivor and
    survivor quality. Ties break on doc_id; the quality composite is the
    same IEEE expression in both engines, so ordering is deterministic.
    Cost beyond clustering: one broadcast-size join + a window over
    clusters (components are tiny by construction — bounded by LSH
    candidate reach)."""
    from pyspark.sql import Window

    from sparkksqldbbenchmark_spark.llm import dedup
    from sparkksqldbbenchmark_spark.llm.cluster import (
        connected_components_min_label,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id")
    labels = connected_components_min_label(
        docs.select(F.col("doc_id").alias("id")),
        pairs,
        src_col="doc_a",
        dst_col="doc_b",
    ).select(F.col("id").alias("doc_id"), F.col("component"))
    quality = text_ops.with_quality_scores(docs).select(
        "doc_id", "quality_score"
    )
    joined = labels.join(quality, "doc_id")
    w = Window.partitionBy("component")
    ranked = joined.withColumn(
        "cluster_size", F.count(F.lit(1)).over(w).cast("long")
    ).withColumn(
        "rn",
        F.row_number().over(
            w.orderBy(F.desc("quality_score"), F.asc("doc_id"))
        ),
    )
    return ranked.where(F.col("rn") == 1).select(
        F.col("component").alias("cluster_id"),
        "cluster_size",
        F.col("doc_id").alias("kept_doc_id"),
        F.col("quality_score").alias("kept_quality"),
    )


def _packing_oracle(capacity: int = 2048, seed: str = "pack-v1") -> str:
    # Global-order twin of operators/packing.pack_offsets: one window
    # cumsum over the md5 shuffle key (the oracle runs at small SF where
    # a single-partition sort is fine; the Spark side decomposes it into
    # the bucketed prefix sum documented in operators/packing.py).
    key = sql_md5_int(f"('{seed}:' || CAST(doc_id AS VARCHAR))")
    return rf"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                   AS n_tokens,
               {key} AS key
        FROM documents
    ), o AS (
        SELECT doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (ORDER BY key, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS start_offset
        FROM t
    )
    SELECT doc_id, n_tokens, CAST(start_offset AS BIGINT) AS start_offset,
           CAST(start_offset // {capacity} AS BIGINT) AS pack_id,
           CAST(start_offset % {capacity} AS BIGINT) AS pack_offset,
           (start_offset % {capacity}) + n_tokens > {capacity} AS straddles
    FROM o
    """


@query("sequence_packing", oracle=_packing_oracle())
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing of the corpus into 2048-token
    context windows in deterministic-shuffle order (operators/packing).
    Per document: global token start offset, pack id, in-pack offset,
    straddle flag. The Spark plan is the distributed prefix sum (range-
    bucketed cumsum + constant-size carry broadcast) — one data shuffle
    at any scale; the oracle is the equivalent single global cumsum."""
    from sparkksqldbbenchmark_spark.operators.packing import pack_offsets

    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id",
        F.size(F.expr(spark_tokens("text"))).cast("long").alias("n_tokens"),
    )
    return pack_offsets(
        with_tokens, id_col="doc_id", tokens_col="n_tokens", capacity=2048
    ).select(
        "doc_id",
        "n_tokens",
        "start_offset",
        "pack_id",
        "pack_offset",
        "straddles",
    )


def _decontam_oracle(n: int = 8, threshold: float = 0.3) -> str:
    from sparkksqldbbenchmark_spark.llm.hashing import sql_word_shingles

    sh = sql_word_shingles("text", n)
    h = sql_md5_int("sh")
    return rf"""
    WITH trs AS (
        SELECT doc_id, {h} AS shash
        FROM (SELECT doc_id, unnest({sh}) AS sh
              FROM documents WHERE doc_id % 50 <> 0)
    ), evs AS (
        SELECT DISTINCT {h} AS shash
        FROM (SELECT unnest({sh}) AS sh
              FROM documents WHERE doc_id % 50 = 0)
    ), totals AS (
        SELECT doc_id, count(*) AS n_shingles FROM trs GROUP BY doc_id
    ), hits AS (
        SELECT t.doc_id, count(*) AS overlap_count
        FROM trs t JOIN evs e USING (shash) GROUP BY t.doc_id
    )
    SELECT t.doc_id, t.n_shingles,
           COALESCE(h.overlap_count, 0) AS overlap_count,
           CAST(COALESCE(h.overlap_count, 0) AS DOUBLE) / t.n_shingles
               AS overlap_frac,
           CAST(COALESCE(h.overlap_count, 0) AS DOUBLE) / t.n_shingles
               >= {threshold} AS contaminated
    FROM totals t LEFT JOIN hits h ON t.doc_id = h.doc_id
    """


@query("decontam_ngram_overlap", oracle=_decontam_oracle())
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination audit (llm/decontam.ngram_overlap): the
    held-out 'eval set' is every 50th document; every remaining training
    document reports its distinct word-8-gram count, how many of those
    8-grams appear anywhere in the eval set, and the contamination flag.
    The eval shingle-hash set is broadcast, so the corpus side is a
    map-side semi-join — no corpus shuffle beyond the per-doc count."""
    from sparkksqldbbenchmark_spark.llm.decontam import ngram_overlap

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 50 != 0)
    eval_df = docs.where(F.col("doc_id") % 50 == 0)
    return ngram_overlap(
        train, eval_df, text_col="text", id_col="doc_id", n=8, threshold=0.3
    ).select(
        "doc_id", "n_shingles", "overlap_count", "overlap_frac", "contaminated"
    )


def _manifest_oracle(capacity: int = 2048, seed: str = "pack-v1") -> str:
    key = sql_md5_int(f"('{seed}:' || CAST(doc_id AS VARCHAR))")
    return rf"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                   AS n_tokens,
               {key} AS key
        FROM documents
    ), o AS (
        SELECT doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (ORDER BY key, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS s
        FROM t WHERE n_tokens > 0
    ), seg AS (
        SELECT doc_id, n_tokens, s,
               unnest(range(CAST(s // {capacity} AS BIGINT),
                            CAST((s + n_tokens - 1) // {capacity} + 1
                                 AS BIGINT))) AS p
        FROM o
    )
    SELECT p AS pack_id, doc_id,
           CAST(greatest(s - p * {capacity}, 0) AS BIGINT) AS pack_offset,
           CAST(greatest(p * {capacity} - s, 0) AS BIGINT)
               AS doc_slice_start,
           CAST(least(s + n_tokens, (p + 1) * {capacity})
               - greatest(s, p * {capacity}) AS BIGINT) AS seg_tokens
    FROM seg
    """


@query("sequence_packing_manifest", oracle=_manifest_oracle())
def sequence_packing_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pack manifest a training loader actually consumes: one row
    per (pack, document segment) — straddling documents split into one
    segment per pack with the in-pack offset and the slice of their own
    tokens that lands there (operators/packing.pack_manifest over the
    sequence_packing assignment). Pure codegen explode on top of the
    distributed prefix sum; no additional shuffle."""
    from sparkksqldbbenchmark_spark.operators.packing import (
        pack_manifest,
        pack_offsets,
    )

    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id",
        F.size(F.expr(spark_tokens("text"))).cast("long").alias("n_tokens"),
    )
    packed = pack_offsets(
        with_tokens, id_col="doc_id", tokens_col="n_tokens", capacity=2048
    )
    return pack_manifest(packed, capacity=2048)


# ------------------------------------------------- token-budget selection --

_BUDGET = 20_000  # tokens; a pipeline parameter, constant for the gate


def _budget_oracle(budget: int = _BUDGET) -> str:
    from sparkksqldbbenchmark_spark.plans.llm_queries import sql_quality_score

    return rf"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                   AS n_tokens,
               {sql_quality_score("text")} AS quality_score
        FROM documents
    ), o AS (
        SELECT doc_id, n_tokens, quality_score,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY quality_score DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS cum_before
        FROM t
    )
    SELECT doc_id, n_tokens, quality_score, cum_before,
           cum_before < {budget} AS selected
    FROM o
    """


@query("token_budget_selection", oracle=_budget_oracle())
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked corpus cut at a global token budget — "take the
    best documents until the budget is spent", the selection step between
    scoring and packing in corpus assembly. Every document reports its
    exclusive running token total in (quality DESC, doc_id) order and
    whether it starts inside the budget.

    Spark plan is operators/selection.ordered_budget_select: the same
    distributed prefix sum as sequence packing, range-bucketed here by a
    64-level quality grid (monotone in the priority order, so
    level-major + in-level order == global order) — one data shuffle +
    a |levels|-row carry broadcast at any scale, where the oracle's
    single global window would be one reducer. The quality composite is
    the shared IEEE expression (sql_quality_score), so the cross-engine
    order is identical; doc_id breaks ties totally."""
    from sparkksqldbbenchmark_spark.operators.selection import (
        ordered_budget_select,
    )

    docs = load_table(spark, sf_dir, "documents")
    t = text_ops.with_quality_scores(docs).select(
        "doc_id",
        F.size(F.expr(spark_tokens("text"))).cast("long").alias("n_tokens"),
        "quality_score",
    )
    out = ordered_budget_select(
        t,
        level=F.floor((F.lit(1.0) - F.col("quality_score")) * 64).cast(
            "long"
        ),
        order=[F.desc("quality_score"), F.asc("doc_id")],
        weight_col="n_tokens",
        budget=_BUDGET,
    )
    return out.select(
        "doc_id", "n_tokens", "quality_score", "cum_before", "selected"
    )


# -------------------------------------------- passage-level duplicate scan --

_CHUNK_W = 16  # words per passage chunk


def _passage_oracle(w: int = _CHUNK_W) -> str:
    h = sql_md5_int("chunk")
    return rf"""
    WITH tok AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
        FROM documents
    ), ch AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(0, CAST(ceil(len(toks) / {w}.0) AS BIGINT)),
                   i -> array_to_string(toks[(i*{w}+1):(i*{w}+{w})], ' ')))
                   AS chunk
        FROM tok WHERE len(toks) > 0
    ), h AS (
        SELECT doc_id, {h} AS chash FROM ch
    ), freq AS (
        SELECT chash, count(DISTINCT doc_id) AS nd FROM h GROUP BY chash
    ), per AS (
        SELECT h.doc_id,
               count(*) AS n_chunks,
               sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS dup_chunks
        FROM h JOIN freq f USING (chash) GROUP BY h.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_chunks, 0) AS BIGINT) AS n_chunks,
           CAST(COALESCE(p.dup_chunks, 0) AS BIGINT) AS dup_chunks,
           CASE WHEN COALESCE(p.n_chunks, 0) = 0 THEN 0.0
                ELSE CAST(p.dup_chunks AS DOUBLE) / p.n_chunks
           END AS dup_frac
    FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
    """


@query("passage_dup_stats", oracle=_passage_oracle())
def passage_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level duplication audit (the C4/RefinedWeb "duplicate
    paragraph" signal, at fixed 16-word chunk grain since the synthetic
    corpus has no paragraph marks): each document's text is cut into
    non-overlapping word chunks; a chunk is duplicated if it appears in
    ≥2 distinct documents; every document reports its chunk count,
    duplicated-chunk count and fraction.

    Differs from shingle dedup (overlapping n-grams → pairwise
    similarity) — this is corpus-frequency analysis of aligned segments,
    the shape used to REMOVE boilerplate passages rather than whole
    near-dup docs. Plan: codegen chunking (transform+slice, no Python),
    explode, one hash-keyed aggregate for chunk frequencies, join back
    on the same key (AQE broadcasts the dup set when small), one doc-key
    rollup. All keys uniform (md5) — no skew at 100 TB; memory is bounded
    by chunks-per-task, never whole-corpus."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.expr(spark_tokens("text"))
    chunks_expr = F.expr(
        f"transform(sequence(0, cast((size({spark_tokens('text')}) + {_CHUNK_W - 1})"
        f" div {_CHUNK_W} as int) - 1),"
        f" i -> concat_ws(' ', slice({spark_tokens('text')}, i*{_CHUNK_W}+1, {_CHUNK_W})))"
    )
    exploded = (
        docs.where(F.size(toks) > 0)
        .select("doc_id", F.explode(chunks_expr).alias("chunk"))
        .select("doc_id", F.expr(spark_md5_int("chunk")).alias("chash"))
    )
    freq = exploded.groupBy("chash").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    per = (
        exploded.join(freq, "chash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("nd") >= 2).cast("long")).alias("dup_chunks"),
        )
    )
    return docs.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
        F.coalesce("dup_chunks", F.lit(0)).cast("long").alias("dup_chunks"),
        F.when(
            F.coalesce("n_chunks", F.lit(0)) == 0, F.lit(0.0)
        )
        .otherwise(
            F.col("dup_chunks").cast("double") / F.col("n_chunks")
        )
        .alias("dup_frac"),
    )


# ------------------------------------------------ fuzzy edit-distance dedup --

_FUZZY_PRE = 24     # blocking prefix length
_FUZZY_MAXD = 40    # max edit distance reported


def _fuzzy_oracle(pre: int = _FUZZY_PRE, maxd: int = _FUZZY_MAXD) -> str:
    return f"""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_distance,
           levenshtein(a.text, b.text)
               <= {maxd} AS is_near_dup
    FROM (SELECT doc_id, substring(text, 1, {pre}) AS pre, text
          FROM documents) a
    JOIN (SELECT doc_id, substring(text, 1, {pre}) AS pre, text
          FROM documents) b
      ON a.pre = b.pre AND a.doc_id < b.doc_id
    """


@query("fuzzy_dedup_levenshtein", oracle=_fuzzy_oracle())
def fuzzy_dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup detection with prefix blocking — the fuzzy
    complement to shingle/minhash dedup for short-edit duplicates
    (boilerplate variants, OCR noise): candidate pairs share an exact
    24-char text prefix (an equi-join on a derived key — never n²), and
    each candidate pair is scored with full-text Levenshtein, entirely
    JVM-side (F.levenshtein is codegen; both engines implement classic
    edit distance). At 100 TB the blocking key bounds the quadratic term
    by true prefix-collision density, the same argument as LSH banding;
    a production variant blocks on several offsets/lengths to cover
    prefix-edited dups, each block an independent equi-join."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.substring("text", 1, _FUZZY_PRE).alias("pre"),
        F.col("text").alias("text_a"),
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"),
        F.substring("text", 1, _FUZZY_PRE).alias("pre"),
        F.col("text").alias("text_b"),
    )
    pairs = a.join(b, "pre").where(F.col("doc_a") < F.col("doc_b"))
    dist = F.levenshtein("text_a", "text_b")
    return pairs.select(
        "doc_a",
        "doc_b",
        dist.cast("long").alias("edit_distance"),
        (dist <= _FUZZY_MAXD).alias("is_near_dup"),
    )


@query(
    "deterministic_corpus_shuffle",
    oracle="""
    SELECT doc_id,
           CAST(row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
               AS BIGINT) AS shuffle_pos
    FROM documents
    """,
)
def deterministic_corpus_shuffle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reproducible corpus shuffle — the training-order permutation:
    every doc gets a global position in md5(doc_id) order, identical on
    every run/engine (re-runs of a training job must see the same data
    order; rand() cannot provide that). The oracle states the semantics
    as a global ORDER BY row_number; the Spark plan must NOT do that — a
    global window drags 10^11 rows through ONE reducer. Instead the
    hash's first byte range-buckets the order (monotone prefix of the
    sort key, 256 parallel levels) and the position is the same
    distributed prefix-sum as packing/budget-selection: per-level
    parallel rank + a 256-row carry broadcast
    (operators/selection.ordered_budget_select with unit weight —
    cum_before IS the exclusive global rank). One data shuffle at any
    corpus size."""
    from sparkksqldbbenchmark_spark.operators.selection import (
        ordered_budget_select,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("__h")
    )
    ranked = ordered_budget_select(
        docs.withColumn("__one", F.lit(1)),
        level=F.expr("cast(conv(substring(__h, 1, 2), 16, 10) as long)"),
        order=[F.asc("__h"), F.asc("doc_id")],
        weight_col="__one",
        budget=1,  # budget unused; cum_before is the rank
        cum_col="shuffle_pos",
    )
    return ranked.select("doc_id", F.col("shuffle_pos").cast("long").alias("shuffle_pos"))
