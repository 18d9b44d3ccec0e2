"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the correctness baseline. Query set × corpus
  via broadcast join (queries are small by construction), dot product and
  norms unrolled to plain codegen'd arithmetic (see _dot — Spark
  interprets higher-order-function lambdas per element, so the unrolled
  form stays in whole-stage codegen at ~5× the throughput), per-query
  top-k via window rank. Cost O(|Q|·n·d) — fine for |Q| ≪ n.
- LSH-bucketed ANN: random-hyperplane signatures (Charikar '02). P
  deterministic planes (module-seeded) → P sign bits → bucket id; search
  touches only the query's bucket. The scale path: bucket join replaces
  the n² cross product, buckets are uniform by construction. Recall is
  tunable via P (fewer bits → bigger buckets → higher recall).

Embeddings are float32 on disk; all arithmetic casts to double first so
Spark and the DuckDB oracle fold the same IEEE values.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic hyperplanes (fixed seed — must match the oracle SQL, which
# inlines the same literals via planes_sql()).
_PLANE_SEED = 1234


def hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    rng = random.Random(_PLANE_SEED)
    return [
        [round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)]
        for _ in range(num_planes)
    ]


# Embedding dimensionality of the documents/embeddings tables. The dot
# product is unrolled to this many terms; vectors are fixed-width by
# construction (TESTDATA embeddings are dim-64 float32).
_DIM = 64


def _dot(a: str, b: str, dim: int = _DIM) -> str:
    """Unrolled dot product: dim multiply-adds as plain codegen'd
    arithmetic. Spark evaluates higher-order functions (aggregate/
    zip_with lambdas) interpreted per element — the known-slow shape in
    the hottest similarity path — while this form stays inside
    whole-stage codegen. Left-associative `+` gives the exact
    left-to-right fold order of DuckDB's list_reduce in the oracle, so
    values are bit-identical cross-engine (double addition is
    order-sensitive; the order here is part of the contract).

    Each element casts to double individually (exact for float32 input;
    a no-op after SimplifyCasts when the array is already double). This
    lets callers pass the RAW float embedding column — materializing a
    transform(..., cast)'d copy is a trap: CollapseProject inlines the
    interpreted transform into every one of the 2×dim element
    references, re-evaluating it per reference (measured ~1 s/query at
    sf0.1)."""
    return " + ".join(
        f"(cast({a}[{i}] as double) * cast({b}[{i}] as double))"
        for i in range(dim)
    )


def _dot_literal(vec: str, plane: list[float]) -> str:
    """Dot of an array column against a Python-literal plane — the plane
    components inline as double literals (no array construction, no
    per-element extraction to optimize away)."""
    return " + ".join(
        f"(cast({vec}[{i}] as double) * cast({x} as double))"
        for i, x in enumerate(plane)
    )


def with_unit_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Append `vec` (the raw embedding array — kept float32-typed; _dot
    casts per element, so no transform()'d double copy exists to be
    inlined by CollapseProject, and shuffles move the 4-byte floats) and
    `norm`."""
    return df.withColumn("vec", F.col(vec_col)).withColumn(
        "norm", F.expr(f"sqrt({_dot('vec', 'vec')})")
    )


def cosine_topk_codegen(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    num_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """Pure-JVM brute-force cosine top-k (unrolled codegen dot, broadcast
    query side). Kept as the no-Python reference twin of cosine_topk —
    tests pin the two bit-identical; it loses to the Arrow form ~2× at
    sf0.1 because each of the num_queries×n pairs re-extracts 2×dim
    array elements row-at-a-time."""
    from pyspark.sql import Window

    base = with_unit_norm(df.select(id_col, vec_col), vec_col)
    queries = base.where(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    cand = base.select(
        F.col(id_col).alias("cand_id"), "vec", "norm"
    )
    scored = (
        cand.join(F.broadcast(queries), F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim",
            F.expr(_dot("qvec", "vec")) / (F.col("qnorm") * F.col("norm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "cand_id",
            F.round("cosine_sim", 6).alias("cosine_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def cosine_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    num_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k for the first `num_queries` ids (excluding
    self-matches), vectorized: an Arrow-batched mapInPandas computes each
    partition's LOCAL top-k against every query, and one tiny window
    merges the ≤ |partitions|·num_queries·k survivors globally. Local
    top-k under the same total order (sim desc, id asc) makes the merge
    exact — top-k is distributive — so the candidate side never shuffles
    and the Python→JVM boundary carries k rows per (partition, query),
    not n·num_queries scored pairs. This is the one deliberate Python
    surface in the similarity family (brief-sanctioned for brute-force
    cosine): measured head-to-head under the fixed consecutive sampler
    (discarded warm-up, prior-min stop rule) it is 0.47 s vs the codegen
    twin's 0.92 s at sf0.1 (2k×64 vectors) and 0.68 s vs 1.21 s at a
    10×-union corpus (20k vectors) — a stable ~2× at both scales, since
    per-pair work is matrix-shaped. (The r08 bench's 1.517 s reading was
    a sampling artifact: the then-broken stop condition cut every
    still-improving series at 3 samples, keeping only early-JIT
    numbers.)

    Numeric contract: bit-identical values to cosine_topk_codegen and
    the DuckDB list_reduce oracle. The fold accumulates one product term
    per dimension sequentially in float64 (acc = acc + mat[:,i]·q[i] —
    vectorized across rows, ordered across dims), exactly the
    left-to-right order of the unrolled codegen dot; float32→float64
    casts are exact in both engines. A BLAS dot (np.dot / @) would be
    faster still but sums pairwise — bit-different, failing the oracle
    hash.

    The query side (num_queries rows — bounded small by contract, the
    same cardinality class as a broadcast dim) is collected once and
    shipped in the UDF closure. The scale path for large query sets or
    corpora is ann_lsh_topk / ivf_topk; this is the exact baseline they
    are measured against."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    def fold_sq(mat):
        acc = np.zeros(mat.shape[0], dtype=np.float64)
        for i in range(mat.shape[1]):
            acc = acc + mat[:, i] * mat[:, i]
        return acc

    def fold_dot(mat, vec):
        acc = np.zeros(mat.shape[0], dtype=np.float64)
        for i in range(mat.shape[1]):
            acc = acc + mat[:, i] * vec[i]
        return acc

    qrows = sorted(
        df.select(id_col, vec_col)
        .where(F.col(id_col) < num_queries)
        .collect(),
        key=lambda r: r[id_col],
    )
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    qmat = np.array(
        [[float(x) for x in r[vec_col]] for r in qrows], dtype=np.float64
    )
    qnorm = np.sqrt(fold_sq(qmat)) if len(qrows) else np.array([])

    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("cand_id", LongType()),
            StructField("cosine_sim", DoubleType()),
        ]
    )

    def local_topk(it):
        for pdf in it:
            if len(pdf) == 0 or len(qids) == 0:
                continue
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norm = np.sqrt(fold_sq(mat))
            out_q, out_c, out_s = [], [], []
            for j in range(len(qids)):
                sims = fold_dot(mat, qmat[j]) / (qnorm[j] * norm)
                mask = cids != qids[j]
                mc, ms = cids[mask], sims[mask]
                order = np.lexsort((mc, -ms))[:k]
                out_q.append(np.full(len(order), qids[j], dtype=np.int64))
                out_c.append(mc[order])
                out_s.append(ms[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "cand_id": np.concatenate(out_c),
                    "cosine_sim": np.concatenate(out_s),
                }
            )

    local = df.select(id_col, vec_col).mapInPandas(local_topk, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("cand_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "cand_id",
            F.round("cosine_sim", 6).alias("cosine_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def lsh_bucket_col(vec_expr: str, planes: list[list[float]]) -> str:
    """Bucket id = bit i set iff dot(vec, plane_i) >= 0."""
    terms = []
    for i, p in enumerate(planes):
        terms.append(
            f"IF({_dot_literal(vec_expr, p)} >= 0.0,"
            f" shiftleft(cast(1 as bigint), {i}), cast(0 as bigint))"
        )
    return " + ".join(terms)


def ann_lsh_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    num_planes: int = 4,
    num_queries: int = 10,
    k: int = 5,
    dim: int = 64,
) -> DataFrame:
    """ANN top-k: hyperplane-LSH bucket join then exact cosine within the
    bucket. Approximate — neighbors in other buckets are missed; that is
    the documented recall/speed trade."""
    from pyspark.sql import Window

    planes = hyperplanes(num_planes, dim)
    base = with_unit_norm(df.select(id_col, vec_col), vec_col).withColumn(
        "bucket", F.expr(lsh_bucket_col("vec", planes))
    )
    queries = base.where(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    cand = base.select(
        F.col(id_col).alias("cand_id"), "vec", "norm", "bucket"
    )
    scored = (
        cand.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("cand_id") != F.col("query_id")),
        )
        .withColumn(
            "cosine_sim",
            F.expr(_dot("qvec", "vec")) / (F.col("qnorm") * F.col("norm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "cand_id",
            F.round("cosine_sim", 6).alias("cosine_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def kmeans_centroids(
    base: DataFrame,
    id_col: str = "vec_id",
    *,
    num_centroids: int = 8,
    lloyd_iters: int = 2,
) -> DataFrame:
    """Deterministic distributed k-means (Lloyd) coarse quantizer:
    seeds = the first `num_centroids` vectors, then a fixed number of
    assign/re-center rounds. Each round is one broadcast score-join
    (argmax cosine, ties to the lower centroid id) plus one element-wise
    mean.

    The mean is computed over components quantized to integer nano-units
    (``floor(x*1e9 + 0.5)`` — identical IEEE double multiply/add/floor in
    every engine, so the integers match bit-for-bit cross-engine), summed
    as exact BIGINTs (order-independent), and divided once in double.
    This replaces the earlier CAST(x AS DECIMAL(38,12)) sum, whose
    rounding convention differs between engines on exact half-way values:
    Spark casts double->decimal HALF_UP on the shortest decimal string
    while DuckDB rounds the binary value HALF_EVEN, and the embeddings
    data really contains odd-multiple-of-2^-13 components (7 at sf0.1)
    where the two disagree by 1e-12. Quantizing at 1e-9 keeps full
    float32 precision for |x| <= 1 (~7 significant digits) and is exact
    by construction. `base` is with_unit_norm output: (id, vec, norm).

    The fixed iteration count keeps the plan static (no driver-side
    convergence loop) — the standard production trade for coarse
    quantizers, where cell quality plateaus after a few rounds.

    Assignment is max_by over (c_cos, -centroid_id) structs, NOT a
    row_number window: the K scored rows per vector are born co-located
    (they come from one input row's broadcast join), so the aggregate
    collapses them map-side and the exchange carries n rows with no
    sort — the window form shuffled and sorted all n×K."""
    cent = base.where(F.col(id_col) < num_centroids).select(
        F.col(id_col).alias("centroid_id"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
    )
    for _ in range(lloyd_iters):
        scored = base.join(F.broadcast(cent)).withColumn(
            "c_cos",
            F.expr(_dot("vec", "cvec")) / (F.col("norm") * F.col("cnorm")),
        )
        assigned = (
            scored.groupBy(id_col)
            .agg(
                F.max_by(
                    F.struct("centroid_id", "vec"),
                    F.struct(F.col("c_cos"), -F.col("centroid_id")),
                ).alias("__best")
            )
            .select(
                F.col("__best.centroid_id").alias("centroid_id"),
                F.col("__best.vec").alias("vec"),
            )
        )
        means = (
            assigned.select("centroid_id", F.posexplode("vec"))
            .groupBy("centroid_id", "pos")
            .agg(
                (
                    F.sum(
                        F.floor(F.col("col") * F.lit(1e9) + F.lit(0.5))
                        .cast("long")
                    ).cast("double")
                    / (F.count(F.lit(1)).cast("double") * F.lit(1e9))
                ).alias("mv")
            )
        )
        cent = (
            means.groupBy("centroid_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, mv))),"
                    " s -> s.mv)"
                ).alias("cvec")
            )
            .withColumn("cnorm", F.expr(f"sqrt({_dot('cvec', 'cvec')})"))
        )
    return cent


def ivf_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    num_centroids: int = 8,
    num_queries: int = 10,
    k: int = 5,
    lloyd_iters: int = 2,
) -> DataFrame:
    """IVF-style ANN: a coarse quantizer partitions the corpus into cells;
    search probes only the query's cell (nprobe=1).

    Centroids come from a seeded, fixed-round Lloyd refinement
    (kmeans_centroids) — deterministic and oracle-checkable. The plan
    shape (broadcast centroids → argmin assignment → cell-equi-join →
    exact rerank) is the join-based shape that scales: assignment is a
    broadcast nested score over K centroids, search never leaves the
    cell."""
    from pyspark.sql import Window

    base = with_unit_norm(df.select(id_col, vec_col), vec_col)
    # r18 (guide §5): base feeds every Lloyd iteration's score join AND
    # the final assignment — without a barrier the scan+norm subtree
    # re-ran once per consumer inside the unrolled centroid lineage
    # (measured 12.3 → 4.8 s at sf0.1, identical rows). Partitioned on
    # the id so the per-iteration argmax groupBy is exchange-free.
    base = base.repartition(F.col(id_col)).localCheckpoint(eager=True)
    centroids = kmeans_centroids(
        base,
        id_col,
        num_centroids=num_centroids,
        lloyd_iters=lloyd_iters,
    )
    scored = base.join(F.broadcast(centroids)).withColumn(
        "c_cos",
        F.expr(_dot("vec", "cvec")) / (F.col("norm") * F.col("cnorm")),
    )
    # argmin cell via max_by (see kmeans_centroids: map-side collapse of
    # the K co-located scored rows, no n×K window sort)
    assigned = (
        scored.groupBy(id_col)
        .agg(
            F.max_by(
                F.struct("centroid_id", "vec", "norm"),
                F.struct(F.col("c_cos"), -F.col("centroid_id")),
            ).alias("__best")
        )
        .select(
            id_col,
            F.col("__best.vec").alias("vec"),
            F.col("__best.norm").alias("norm"),
            F.col("__best.centroid_id").alias("centroid_id"),
        )
    )
    queries = assigned.where(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.col("centroid_id").alias("qcell"),
    )
    cand = assigned.select(
        F.col(id_col).alias("cand_id"), "vec", "norm", "centroid_id"
    )
    pair = cand.join(
        F.broadcast(queries),
        (F.col("centroid_id") == F.col("qcell"))
        & (F.col("cand_id") != F.col("query_id")),
    ).withColumn(
        "cosine_sim",
        F.expr(_dot("qvec", "vec")) / (F.col("qnorm") * F.col("norm")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("cand_id")
    )
    return (
        pair.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "cand_id",
            F.round("cosine_sim", 6).alias("cosine_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    num_planes: int = 4,
    threshold: float = 0.95,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    threshold), LSH-bucketed so only same-bucket pairs are compared."""
    planes = hyperplanes(num_planes, dim)
    base = with_unit_norm(df.select(id_col, vec_col), vec_col).withColumn(
        "bucket", F.expr(lsh_bucket_col("vec", planes))
    )
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col("vec").alias("vec_a"),
        F.col("norm").alias("norm_a"),
        "bucket",
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col("vec").alias("vec_b"),
        F.col("norm").alias("norm_b"),
        "bucket",
    )
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine_sim",
            F.expr(_dot("vec_a", "vec_b"))
            / (F.col("norm_a") * F.col("norm_b")),
        )
        .where(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim"))
    )
