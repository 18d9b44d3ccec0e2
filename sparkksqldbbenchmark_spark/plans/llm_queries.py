"""LLM training-data-pipeline queries (the north-star extensions), each
with a DuckDB oracle generated from the SAME hash/shingle expression
builders the Spark operators use (llm/hashing.py), so the two sides cannot
drift.

Multimodal queries are rows-only (no oracle): the mapInPandas decode path
is not SQL-expressible by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.catalog import load_table
from sparkksqldbbenchmark_spark.llm import dedup, multimodal, similarity, text
from sparkksqldbbenchmark_spark.llm.hashing import (
    sql_md5_int,
    sql_minhash_sig,
    sql_tokens,
    sql_word_shingles,
)
from sparkksqldbbenchmark_spark.plans.registry import query

# ---------------------------------------------------------------- dedup --


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           min(doc_id) AS canonical_id,
           count(*) AS dup_count
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup_groups(docs, "text", "doc_id")


def _minhash_oracle(k: int = 16, bands: int = 4, n: int = 3,
                    threshold: float = 0.5) -> str:
    rows = k // bands
    sh = sql_word_shingles("text", n)
    inter = "len(list_filter(sa.shingles, s -> list_contains(sb.shingles, s)))"
    return f"""
    WITH sh AS (
        SELECT doc_id, {sh} AS shingles FROM documents
    ), sigged AS (
        SELECT doc_id, shingles, {sql_minhash_sig("shingles", k)} AS sig
        FROM sh
    ), banded AS (
        SELECT doc_id, b AS band_idx,
               md5(array_to_string(list_transform(
                   sig[b*{rows}+1 : b*{rows}+{rows}],
                   x -> CAST(x AS VARCHAR)), '-')) AS bh
        FROM sigged, range(0, {bands}) t(b)
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a
        JOIN banded b ON a.band_idx = b.band_idx AND a.bh = b.bh
                      AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST({inter} AS DOUBLE)
             / CAST(len(sa.shingles) + len(sb.shingles) - {inter} AS DOUBLE)
             AS jaccard_sim
    FROM cand
    JOIN sh sa ON cand.doc_a = sa.doc_id
    JOIN sh sb ON cand.doc_b = sb.doc_id
    WHERE CAST({inter} AS DOUBLE)
             / CAST(len(sa.shingles) + len(sb.shingles) - {inter} AS DOUBLE)
          >= {threshold}
    """


@query("dedup_minhash_lsh", oracle=_minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, "text", "doc_id")


def _incremental_oracle(
    k: int = 16, bands: int = 4, n: int = 3,
    threshold: float = 0.5, split: int = 250,
) -> str:
    rows = k // bands
    sh = sql_word_shingles("text", n)
    inter = "len(list_filter(sa.shingles, s -> list_contains(sb.shingles, s)))"
    jac = (
        f"CAST({inter} AS DOUBLE) / CAST(len(sa.shingles)"
        f" + len(sb.shingles) - {inter} AS DOUBLE)"
    )
    return f"""
    WITH sh AS (
        SELECT doc_id, {sh} AS shingles FROM documents
    ), sigged AS (
        SELECT doc_id, {sql_minhash_sig("shingles", k)} AS sig FROM sh
    ), banded AS (
        SELECT doc_id, b AS band_idx,
               md5(array_to_string(list_transform(
                   sig[b*{rows}+1 : b*{rows}+{rows}],
                   x -> CAST(x AS VARCHAR)), '-')) AS bh
        FROM sigged, range(0, {bands}) t(b)
    ), cand AS (
        SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS match_id
        FROM banded a
        JOIN banded b ON a.band_idx = b.band_idx AND a.bh = b.bh
        WHERE a.doc_id >= {split} AND b.doc_id < {split}
    ), scored AS (
        SELECT new_id, match_id, {jac} AS jaccard_sim
        FROM cand
        JOIN sh sa ON cand.new_id = sa.doc_id
        JOIN sh sb ON cand.match_id = sb.doc_id
        WHERE {jac} >= {threshold}
    )
    SELECT new_id, match_id, jaccard_sim
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY new_id
            ORDER BY jaccard_sim DESC, match_id ASC) AS rn
        FROM scored
    )
    WHERE rn = 1
    """


@query("dedup_incremental_vs_corpus", oracle=_incremental_oracle())
def dedup_incremental_vs_corpus(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental dedup (llm/dedup.incremental_lsh_matches): the new
    batch (doc_id ≥ 250) is checked for near-duplicates against the
    historical corpus (doc_id < 250) — each new doc's best corpus match
    by verified Jaccard, via new⋈corpus LSH bucket collisions only
    (never corpus⋈corpus). The production round persists the corpus-side
    band buckets between ingests, so per-round cost scales with the
    batch, not the corpus (see operator docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.incremental_lsh_matches(
        docs.where(F.col("doc_id") >= 250),
        docs.where(F.col("doc_id") < 250),
        "text",
        "doc_id",
    )


def _simhash_oracle(bits: int = 32, bands: int = 4, max_h: int = 3) -> str:
    width = bits // bands
    toks = sql_tokens("text")
    th = sql_md5_int("t")
    simhash = f"""
        list_sum(list_transform(range(0, {bits}), b ->
            CASE WHEN list_sum(list_transform({toks}, t ->
                     CASE WHEN ({th} >> b) & 1 = 1 THEN 1 ELSE -1 END)) >= 0
                 THEN (1::BIGINT << b) ELSE 0::BIGINT END))
    """
    return f"""
    WITH sim AS (
        SELECT doc_id, CAST({simhash} AS BIGINT) AS simhash FROM documents
    ), banded AS (
        SELECT doc_id, simhash, b AS band_idx,
               (simhash >> (b * {width})) & {(1 << width) - 1} AS bh
        FROM sim, range(0, {bands}) t(b)
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS h_a, b.simhash AS h_b
        FROM banded a
        JOIN banded b ON a.band_idx = b.band_idx AND a.bh = b.bh
                      AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(h_a, h_b)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(h_a, h_b)) <= {max_h}
    """


@query("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(docs, "text", "doc_id")


def _jaccard_oracle(n: int = 5, threshold: float = 0.4) -> str:
    sh = sql_word_shingles("text", n)
    return f"""
    WITH sh AS (
        SELECT doc_id, {sh} AS shingles FROM documents
    ), ex AS (
        SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh
    ), co AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS inter
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE)
               AS jaccard_sim
    FROM co
    WHERE CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE)
          >= {threshold}
    """


@query("dedup_ngram_jaccard", oracle=_jaccard_oracle())
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, "text", "doc_id")


def _cluster_oracle() -> str:
    # pair graph = the minhash-LSH candidates (the scale path), not the
    # raw-shingle inverted-index join
    return f"""
    WITH RECURSIVE pairs AS (
        {_minhash_oracle()}
    ), edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ), reach(doc_id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.a, r.label
        FROM reach r JOIN edges e ON r.doc_id = e.b
    )
    SELECT doc_id, min(label) AS component
    FROM reach GROUP BY doc_id
    """


@query("dedup_clusters", oracle=_cluster_oracle())
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering (iterative connected components over the
    minhash-LSH pair graph — the bucketed candidate path that survives
    100 TB, not the raw-shingle inverted-index join): every document
    labeled with its component's min doc id — singletons keep their own
    id, duplicate groups collapse to one canonical. Spark side iterates
    min-label propagation (distributed join+agg per round, convergence
    checked every few rounds); the oracle computes the same fixpoint
    with a recursive CTE over the same minhash candidate pairs."""
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
    )
    return labels.select(F.col("id").alias("doc_id"), "component")


# ----------------------------------------------------------- similarity --

_SQL_DOT = (
    "list_reduce(list_transform(range(1, {dim} + 1),"
    " i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
)


def _sql_dot(a: str, b: str, dim: int = 64) -> str:
    return _SQL_DOT.format(a=a, b=b, dim=dim)


def _cosine_topk_oracle(nq: int = 10, k: int = 5, dim: int = 64) -> str:
    dot_qc = _sql_dot("q.vec", "c.vec", dim)
    return f"""
    WITH base AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ), normed AS (
        SELECT vec_id, vec,
               sqrt({_sql_dot("vec", "vec", dim)}) AS norm
        FROM base
    ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               {dot_qc} / (q.norm * c.norm) AS cos
        FROM normed q JOIN normed c ON q.vec_id != c.vec_id
        WHERE q.vec_id < {nq}
    ), ranked AS (
        SELECT query_id, cand_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, cand_id) AS rank
        FROM scored
    )
    SELECT query_id, cand_id, round(cos, 6) AS cosine_sim,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    """


@query("similarity_topk_cosine", oracle=_cosine_topk_oracle())
def similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb)


def _planes_values(num_planes: int = 4, dim: int = 64) -> str:
    planes = similarity.hyperplanes(num_planes, dim)
    rows = ", ".join(
        f"({i}, [{', '.join(str(x) for x in p)}]::DOUBLE[])"
        for i, p in enumerate(planes)
    )
    return f"(VALUES {rows}) p(pid, pvec)"


def _ann_oracle(num_planes: int = 4, nq: int = 10, k: int = 5,
                dim: int = 64) -> str:
    return f"""
    WITH base AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ), normed AS (
        SELECT vec_id, vec, sqrt({_sql_dot("vec", "vec", dim)}) AS norm
        FROM base
    ), buckets AS (
        SELECT n.vec_id,
               SUM(CASE WHEN {_sql_dot("n.vec", "p.pvec", dim)} >= 0.0
                        THEN (1::BIGINT << p.pid) ELSE 0::BIGINT END)
                   AS bucket
        FROM normed n, {_planes_values(num_planes, dim)}
        GROUP BY n.vec_id
    ), nb AS (
        SELECT n.vec_id, n.vec, n.norm, b.bucket
        FROM normed n JOIN buckets b ON n.vec_id = b.vec_id
    ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               {_sql_dot("q.vec", "c.vec", dim)} / (q.norm * c.norm) AS cos
        FROM nb q JOIN nb c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
        WHERE q.vec_id < {nq}
    ), ranked AS (
        SELECT query_id, cand_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, cand_id) AS rank
        FROM scored
    )
    SELECT query_id, cand_id, round(cos, 6) AS cosine_sim,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    """


@query("similarity_ann_lsh", oracle=_ann_oracle())
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ann_lsh_topk(emb)


def _ivf_oracle(num_centroids: int = 8, nq: int = 10, k: int = 5,
                dim: int = 64, lloyd_iters: int = 2) -> str:
    # Lloyd rounds unrolled: assignment under c{i-1} → element-wise mean
    # over integer nano-unit quantized components (floor(x*1e9+0.5) —
    # identical IEEE ops in both engines), summed as exact BIGINTs
    # (order-independent, matching the Spark side bit for bit) → c{i}.
    # Seeds c0 = first K vectors. See kmeans_centroids docstring for why
    # this replaced the DECIMAL(38,12) cast (cross-engine half-way
    # rounding divergence on dyadic tie values present in the data).
    lloyd = ""
    prev = "c0"
    for i in range(1, lloyd_iters + 1):
        lloyd += f""", a{i} AS (
        SELECT vec_id, vec, centroid_id FROM (
            SELECT n.vec_id, n.vec, c.centroid_id,
                   row_number() OVER (
                       PARTITION BY n.vec_id
                       ORDER BY {_sql_dot("n.vec", "c.cvec", dim)}
                                / (n.norm * c.cnorm) DESC, c.centroid_id
                   ) AS r
            FROM normed n CROSS JOIN {prev} c
        ) WHERE r = 1
    ), m{i} AS (
        SELECT centroid_id, r.i AS pos,
               CAST(SUM(CAST(FLOOR(vec[r.i] * 1e9 + 0.5) AS BIGINT))
                    AS DOUBLE)
                   / (CAST(COUNT(*) AS DOUBLE) * 1e9) AS mv
        FROM a{i}, range(1, {dim + 1}) r(i)
        GROUP BY centroid_id, r.i
    ), c{i} AS (
        SELECT centroid_id, cvec,
               sqrt({_sql_dot("cvec", "cvec", dim)}) AS cnorm
        FROM (
            SELECT centroid_id, list(mv ORDER BY pos) AS cvec
            FROM m{i} GROUP BY centroid_id
        )
    )"""
        prev = f"c{i}"
    return f"""
    WITH base AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ), normed AS (
        SELECT vec_id, vec, sqrt({_sql_dot("vec", "vec", dim)}) AS norm
        FROM base
    ), c0 AS (
        SELECT vec_id AS centroid_id, vec AS cvec, norm AS cnorm
        FROM normed WHERE vec_id < {num_centroids}
    ){lloyd}, centroids AS (
        SELECT centroid_id, cvec, cnorm FROM {prev}
    ), assigned AS (
        SELECT vec_id, vec, norm, centroid_id FROM (
            SELECT n.vec_id, n.vec, n.norm, c.centroid_id,
                   row_number() OVER (
                       PARTITION BY n.vec_id
                       ORDER BY {_sql_dot("n.vec", "c.cvec", dim)}
                                / (n.norm * c.cnorm) DESC, c.centroid_id
                   ) AS r
            FROM normed n CROSS JOIN centroids c
        ) WHERE r = 1
    ), pair AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               {_sql_dot("q.vec", "c.vec", dim)} / (q.norm * c.norm) AS cos
        FROM assigned q
        JOIN assigned c ON q.centroid_id = c.centroid_id
                        AND q.vec_id != c.vec_id
        WHERE q.vec_id < {nq}
    ), ranked AS (
        SELECT query_id, cand_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, cand_id) AS rank
        FROM pair
    )
    SELECT query_id, cand_id, round(cos, 6) AS cosine_sim,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    """


@query("similarity_ivf_topk", oracle=_ivf_oracle())
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(emb)


def _near_dup_oracle(num_planes: int = 4, threshold: float = 0.4,
                     dim: int = 64) -> str:
    return f"""
    WITH base AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ), normed AS (
        SELECT vec_id, vec, sqrt({_sql_dot("vec", "vec", dim)}) AS norm
        FROM base
    ), buckets AS (
        SELECT n.vec_id,
               SUM(CASE WHEN {_sql_dot("n.vec", "p.pvec", dim)} >= 0.0
                        THEN (1::BIGINT << p.pid) ELSE 0::BIGINT END)
                   AS bucket
        FROM normed n, {_planes_values(num_planes, dim)}
        GROUP BY n.vec_id
    ), nb AS (
        SELECT n.vec_id, n.vec, n.norm, b.bucket
        FROM normed n JOIN buckets b ON n.vec_id = b.vec_id
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_sql_dot("a.vec", "b.vec", dim)} / (a.norm * b.norm), 6)
               AS cosine_sim
    FROM nb a JOIN nb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_sql_dot("a.vec", "b.vec", dim)} / (a.norm * b.norm)
          >= {threshold}
    """


@query("dedup_embedding_cosine", oracle=_near_dup_oracle())
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_pairs(emb, threshold=0.4)


# ----------------------------------------------------------------- text --

_STOP_EN = ",".join(f"'{w}'" for w in text.STOPWORDS["en"])


def sql_quality_score(text_expr: str = "text") -> str:
    """DuckDB twin of text.with_quality_scores' composite quality_score —
    the ONE place the SQL formula lives (text_quality_scores' oracle and
    dedup_keep_best's oracle both build from it, so a weight change
    cannot drift between them)."""
    toks = f"regexp_extract_all({text_expr}, '\\S+')"
    return (
        f"0.4 * least(CAST(len({toks}) AS DOUBLE) / 100.0, 1.0)"
        f" + 0.4 * (CAST(len(list_filter({toks},"
        f" t -> list_contains([{_STOP_EN}], lower(t)))) AS DOUBLE)"
        f" / CAST(len({toks}) AS DOUBLE))"
        f" + 0.2 * (1.0 - CAST(len(regexp_extract_all({text_expr},"
        f" '[^A-Za-z0-9\\s]')) AS DOUBLE)"
        f" / CAST(len({text_expr}) AS DOUBLE))"
    )


@query(
    "text_token_counts",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
                AS BIGINT) AS bpe_tokens
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.with_token_counts(docs).select("doc_id", "ws_tokens", "bpe_tokens")


@query(
    "text_quality_scores",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(text) AS BIGINT) AS n_chars_calc,
               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                   AS n_tokens,
               CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
                   AS BIGINT) AS punct_count,
               CAST(len(list_filter(regexp_extract_all(text, '\S+'),
                    t -> list_contains([{_STOP_EN}], lower(t))))
                   AS BIGINT) AS stopword_hits,
               CAST(list_sum(list_transform(regexp_extract_all(text, '\S+'),
                    t -> len(t))) AS DOUBLE) AS tok_chars,
               {sql_quality_score("text")} AS quality_score
        FROM documents
    )
    SELECT doc_id, n_chars_calc, n_tokens, punct_count, stopword_hits,
           tok_chars / CAST(n_tokens AS DOUBLE) AS avg_token_len,
           CAST(punct_count AS DOUBLE) / CAST(n_chars_calc AS DOUBLE)
               AS punct_ratio,
           CAST(stopword_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE)
               AS stopword_ratio,
           quality_score
    FROM t
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.with_quality_scores(docs).select(
        "doc_id", "n_chars_calc", "n_tokens", "punct_count", "stopword_hits",
        "avg_token_len", "punct_ratio", "stopword_ratio", "quality_score",
    )


def _langid_oracle() -> str:
    hits = {
        lang: (
            f"CAST(len(list_filter(regexp_extract_all(text, '\\S+'),"
            f" t -> list_contains([{','.join(chr(39) + w + chr(39) for w in ws)}],"
            f" lower(t)))) AS BIGINT)"
        )
        for lang, ws in text.STOPWORDS.items()
    }
    return rf"""
    WITH h AS (
        SELECT doc_id, lang,
               {hits['en']} AS hits_en,
               {hits['de']} AS hits_de,
               {hits['fr']} AS hits_fr,
               {hits['es']} AS hits_es,
               regexp_matches(text, '[\x{{4e00}}-\x{{9fff}}]') AS has_cjk
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN has_cjk THEN 'zh'
                WHEN greatest(hits_en, hits_de, hits_fr, hits_es) = 0
                     THEN 'und'
                WHEN hits_en = greatest(hits_en, hits_de, hits_fr, hits_es)
                     THEN 'en'
                WHEN hits_de = greatest(hits_en, hits_de, hits_fr, hits_es)
                     THEN 'de'
                WHEN hits_fr = greatest(hits_en, hits_de, hits_fr, hits_es)
                     THEN 'fr'
                ELSE 'es' END AS predicted_lang
    FROM h
    """


@query("text_lang_id", oracle=_langid_oracle())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.with_lang_id(docs).select("doc_id", "lang", "predicted_lang")


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(lower(regexp_replace(text, '[^A-Za-z0-9]+', '', 'g')))
               AS fingerprint,
           {sql_md5_int("lower(regexp_replace(text, '[^A-Za-z0-9]+', '', 'g'))")}
               AS fingerprint_int
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.with_fingerprint(docs).select(
        "doc_id", "fingerprint", "fingerprint_int"
    )


# ----------------------------------------------------------- multimodal --


@query(
    "multimodal_feature_extract",
    # The decode itself is Python (mapInPandas) — but the deterministic
    # fake codec is md5-derived, so the oracle can recompute the expected
    # output in SQL and verify the Arrow/Pandas path byte-for-byte.
    # The registered shape explodes the feature vector to one (doc_id,
    # bin, feat) row per bin: every column is a scalar the checker can
    # sort/hash (an array<double> column is unhashable for its pandas
    # canonicalizer), and the k/16 feature values are exact doubles in
    # both engines. The operator API (extract_features) keeps the array.
    oracle="""
    SELECT d.doc_id,
           ['image','audio','video'][(d.doc_id % 3) + 1] AS media_type,
           16::BIGINT AS n_bytes,
           CAST(d.doc_id % 640 + 16 AS INTEGER) AS width,
           CAST(d.doc_id % 480 + 16 AS INTEGER) AS height,
           r.bin::INT AS bin,
           len(list_filter(range(1, 17), i ->
               ('0x' || substring(md5(d.text), 2*i-1, 2))::INT % 16 = r.bin))
           / 16.0 AS feat
    FROM documents d, range(0, 16) r(bin)
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    blobs = multimodal.attach_media_blobs(docs)
    feats = multimodal.extract_features(blobs)
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        "width",
        "height",
        F.posexplode("features").alias("bin", "feat"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, frame_idx, upper(md5(text)) AS payload_hex
    FROM (SELECT doc_id, text,
                 unnest(range(0, ((doc_id % 640 + 16) % 10) + 1))
                     AS frame_idx
          FROM documents WHERE doc_id % 3 = 2)
    WHERE frame_idx % 2 = 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (llm/multimodal.frame_sample_plan):
    per synthetic video row, explode the deterministic frame index list
    and keep every 2nd frame. The graded projection hex-encodes the
    binary payload so the oracle can reproduce it (upper(md5(text)) —
    attach_media_blobs derives the blob from md5 of the text); the plan
    under it is the real binary-column path."""
    docs = load_table(spark, sf_dir, "documents")
    blobs = multimodal.attach_media_blobs(docs)
    return multimodal.frame_sample_plan(blobs).select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.hex("payload").alias("payload_hex"),
    )


def _quant_oracle(dim: int = 64) -> str:
    # Strict left-fold float sums (list_reduce) mirror Spark's aggregate()
    # fold order; floor(x + 0.5) rounding is identical in both engines
    # (round() is not: HALF_UP vs half-away tie rules).
    d = "CAST(e AS DOUBLE)"
    return f"""
    WITH s AS (
        SELECT vec_id, embedding,
               list_reduce(list_transform(embedding,
                   e -> abs({d})), (a, b) -> greatest(a, b)) / 127.0
                   AS scale
        FROM embeddings
    ), q AS (
        SELECT vec_id, embedding, scale,
               CASE WHEN scale = 0 THEN list_transform(embedding, e -> 0.0)
                    ELSE list_transform(embedding, e -> greatest(least(
                        floor({d} / scale + 0.5), 127.0), -127.0))
               END AS qv
        FROM s
    )
    SELECT vec_id, scale,
           CAST(list_reduce(qv, (a, b) -> a + b) AS BIGINT) AS q_sum,
           CAST(list_reduce(list_transform(qv, v -> abs(v)),
                (a, b) -> a + b) AS BIGINT) AS q_l1,
           sqrt(list_reduce(list_transform(range(1, {dim} + 1),
                i -> (CAST(embedding[i] AS DOUBLE) - qv[i] * scale)
                   * (CAST(embedding[i] AS DOUBLE) - qv[i] * scale)),
                (a, b) -> a + b)) AS recon_err
    FROM q
    """


@query("embedding_quantization", oracle=_quant_oracle())
def embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column — the
    compression step in front of a vector index (IVF/PQ pipelines): per
    vector, scale = max|x|/127, elements round to [-127, 127], and the
    query reports the quantized checksum/L1 plus the L2 reconstruction
    error. All arithmetic is array HOFs over the float32 values cast to
    double per element — deterministic fold order shared with the oracle.
    Per-row, shuffle-free, scan-speed at 100 TB; for a production hot
    path the same expressions posexplode to codegen'd per-element rows
    (the similarity._dot pattern, llm/similarity.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    d = "cast(e as double)"
    scale = F.expr(
        f"aggregate(embedding, cast(0.0 as double),"
        f" (a, e) -> greatest(a, abs({d}))) / 127.0"
    )
    qv = F.expr(
        "case when scale = 0.0 then transform(embedding, e -> 0.0d)"
        f" else transform(embedding, e -> greatest(least("
        f"floor({d} / scale + 0.5d), 127.0d), -127.0d)) end"
    )
    with_q = (
        emb.withColumn("scale", scale)
        .withColumn("qv", qv)
    )
    err_terms = (
        "zip_with(embedding, qv,"
        " (e, q) -> (cast(e as double) - q * scale)"
        " * (cast(e as double) - q * scale))"
    )
    return with_q.select(
        "vec_id",
        "scale",
        F.expr(
            "cast(aggregate(qv, cast(0.0 as double), (a, v) -> a + v)"
            " as bigint)"
        ).alias("q_sum"),
        F.expr(
            "cast(aggregate(transform(qv, v -> abs(v)),"
            " cast(0.0 as double), (a, v) -> a + v) as bigint)"
        ).alias("q_l1"),
        F.sqrt(
            F.expr(
                f"aggregate({err_terms}, cast(0.0 as double),"
                " (a, v) -> a + v)"
            )
        ).alias("recon_err"),
    )


@query(
    "multimodal_resize",
    oracle="""
    SELECT doc_id,
           media_type,
           CAST(w AS INTEGER) AS orig_width,
           CAST(h AS INTEGER) AS orig_height,
           CAST(floor(w * scale) AS INTEGER) AS new_width,
           CAST(floor(h * scale) AS INTEGER) AS new_height,
           CAST(CASE WHEN text IS NULL THEN NULL
                     ELSE greatest(1, floor(16 * scale)) END AS BIGINT)
               AS n_bytes,
           substring(upper(md5(text)), 1,
                     CAST(2 * greatest(1, floor(16 * scale)) AS INTEGER))
               AS payload_hex
    FROM (
        SELECT doc_id, text,
               CASE doc_id % 3 WHEN 0 THEN 'image'
                               WHEN 1 THEN 'audio'
                               ELSE 'video' END AS media_type,
               doc_id % 640 + 16 AS w,
               doc_id % 480 + 16 AS h,
               least(128.0 / (doc_id % 640 + 16),
                     128.0 / (doc_id % 480 + 16), 1.0) AS scale
        FROM documents
    )
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media resize-to-fit (llm/multimodal.resize_media): every blob
    scaled into a 128×128 box, aspect preserved, never upscaled — the
    image-normalization stage of a multimodal ingest, run through the
    real mapInPandas Arrow path. The oracle replays the geometry
    (identical IEEE scale arithmetic) and the deterministic stand-in
    payload truncation (hex prefix of the md5-derived blob), so the
    graded row checks the full batch plumbing, not just the formula."""
    from sparkksqldbbenchmark_spark.llm import multimodal

    docs = load_table(spark, sf_dir, "documents")
    blobs = multimodal.attach_media_blobs(docs)
    return multimodal.resize_media(blobs, target_w=128, target_h=128)


@query(
    "multimodal_decode_roundtrip",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               doc_id % 4 AS fmt,
               doc_id % 16 + 4 AS w,
               doc_id % 12 + 4 AS h,
               doc_id % 50 + 10 AS n,
               (doc_id % 5 + 2) * 8 AS gw,
               (doc_id % 3 + 2) * 8 AS gh,
               ((doc_id % 6) // 2 + 1) * 16 AS jw,
               ((doc_id % 9) // 3 + 1) * 16 AS jh
        FROM documents WHERE doc_id < 400
    ), ctile AS (
        SELECT b.doc_id,
               (b.doc_id + 7 * tx.i + 13 * ty.i) % 256 AS r,
               (b.doc_id * 3 + 11 * tx.i + 5 * ty.i) % 256 AS g,
               (b.doc_id * 7 + 17 * tx.i + 3 * ty.i) % 256 AS bl
        FROM base b,
             unnest(range(0, b.jw // 16)) tx(i),
             unnest(range(0, b.jh // 16)) ty(i)
        WHERE b.fmt = 3
    ), cconv AS (
        -- forward JFIF RGB->YCbCr, operation-for-operation the codec's
        -- left-associated expressions (llm/codecs.rgb_to_ycbcr). Every
        -- literal is cast to DOUBLE: DuckDB would otherwise evaluate
        -- 0.299 * r in exact DECIMAL arithmetic, which differs from the
        -- codec's IEEE doubles by 1 in FLOOR on thousands of RGB
        -- triples (latent divergence outside the current tile domain)
        SELECT doc_id,
               GREATEST(0, LEAST(255, FLOOR(
                   CAST(0.299 AS DOUBLE) * r
                   + CAST(0.587 AS DOUBLE) * g
                   + CAST(0.114 AS DOUBLE) * bl + 0.5))) AS y,
               GREATEST(0, LEAST(255, FLOOR(
                   CAST(-0.168736 AS DOUBLE) * r
                   - CAST(0.331264 AS DOUBLE) * g
                   + CAST(0.5 AS DOUBLE) * bl
                   + 128.0 + 0.5))) AS cb,
               GREATEST(0, LEAST(255, FLOOR(
                   CAST(0.5 AS DOUBLE) * r
                   - CAST(0.418688 AS DOUBLE) * g
                   - CAST(0.081312 AS DOUBLE) * bl
                   + 128.0 + 0.5))) AS cr
        FROM ctile
    ), cback AS (
        SELECT doc_id,
               GREATEST(0, LEAST(255, FLOOR(
                   y + CAST(1.402 AS DOUBLE) * (cr - 128) + 0.5))) AS r2,
               GREATEST(0, LEAST(255, FLOOR(
                   y - CAST(0.344136 AS DOUBLE) * (cb - 128)
                   - CAST(0.714136 AS DOUBLE) * (cr - 128)
                   + 0.5))) AS g2,
               GREATEST(0, LEAST(255, FLOOR(
                   y + CAST(1.772 AS DOUBLE) * (cb - 128) + 0.5))) AS b2
        FROM cconv
    ), csum AS (
        SELECT doc_id, CAST(SUM(256 * (r2 + g2 + b2)) AS BIGINT) AS s
        FROM cback GROUP BY doc_id
    ), s AS (
        SELECT b.*,
               CAST(CASE b.fmt WHEN 0 THEN b.w * b.h
                               WHEN 1 THEN b.n
                               WHEN 2 THEN b.gw * b.gh
                               ELSE b.jw * b.jh * 3 END AS BIGINT)
                   AS n_units,
               CAST(CASE b.fmt WHEN 0 THEN
                        list_sum(flatten(list_transform(range(0, b.h),
                            y -> list_transform(range(0, b.w), x ->
                                (b.doc_id + 7 * x + 13 * y) % 256))))
                    WHEN 1 THEN
                        list_sum(list_transform(range(0, b.n), i ->
                            (b.doc_id * 31 + i * 17) % 65536 - 32768))
                    WHEN 2 THEN
                        64 * list_sum(flatten(list_transform(
                            range(0, b.gh // 8), yb ->
                            list_transform(range(0, b.gw // 8), xb ->
                                (b.doc_id + 11 * xb + 29 * yb) % 256))))
                    ELSE cs.s
                    END AS BIGINT) AS unit_sum
        FROM base b LEFT JOIN csum cs ON b.doc_id = cs.doc_id
    )
    SELECT doc_id,
           CASE WHEN fmt = 1 THEN 'audio' ELSE 'image' END AS media_type,
           CASE fmt WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
                    ELSE 'jpeg' END AS codec,
           CAST(CASE fmt WHEN 0 THEN w WHEN 2 THEN gw
                         WHEN 3 THEN jw END AS INTEGER) AS width,
           CAST(CASE fmt WHEN 0 THEN h WHEN 2 THEN gh
                         WHEN 3 THEN jh END AS INTEGER) AS height,
           CAST(CASE WHEN fmt = 1 THEN 8000 END AS INTEGER)
               AS sample_rate,
           n_units,
           unit_sum,
           CAST(unit_sum AS DOUBLE) / CAST(n_units AS DOUBLE)
               AS mean_value
    FROM s
    """,
)
def multimodal_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec round-trip (llm/codecs.py + multimodal.decode_blob):
    each doc id is synthesized into a genuine PNG (id % 4 == 0 — the
    encoder cycles all five scanline filters, so decode exercises
    Sub/Up/Average/Paeth unfiltering, zlib inflate and CRC checks), a
    RIFF 16-bit PCM WAV (== 1), a baseline grayscale JPEG (== 2 —
    marker walk, DQT/DHT table construction from the stream, Huffman +
    DPCM + EXTEND entropy decode, dequant + 2-D IDCT), or a baseline
    4:2:0 COLOR JPEG (== 3 — three-component interleaved MCUs, chroma
    subsampling/upsampling and both YCbCr conversions on top of the
    grayscale machinery), then decoded back through the actual format
    parsers and reduced to per-blob statistics. Block-constant tiles
    with DC-exact quant tables make the lossy DCT path round-trip
    exactly, and for color the decoded pixels equal the double JFIF
    conversion of the tile constants — which the oracle replays in SQL
    literal-for-literal (cconv/cback CTEs), so every decoded value is
    recomputed analytically: a wrong filter, stride, Huffman table,
    sampling factor, or conversion constant shifts unit_sum and fails
    the hash. Both stages run in one mapInPandas pass chain over Arrow
    batches; blobs never leave the executors, and only fixed-size
    stats reach the result — the 100 TB shape for media pipelines."""
    from sparkksqldbbenchmark_spark.llm import multimodal

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    blobs = multimodal.synth_media_blobs(docs)
    return multimodal.decode_media_stats(blobs)
