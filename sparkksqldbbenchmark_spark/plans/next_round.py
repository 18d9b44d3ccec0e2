"""Round-17 staging area: fully-built, oracle-verified queries that are
NOT yet registered with the driver-graded registry.

Why a separate module: the driver grades exactly the first 50 entries of
``__spark_entry__.queries()`` and the round-16 head is committed (8
flagships + the 25 round-15 graduates in plans/round16_queries.py + the
round-16 slot-fillers + re-grades). New work lands here with a
MODULE-LOCAL registry; tests/test_next_round.py runs the same
Spark-vs-DuckDB comparison the driver runs, so each staged query is
already verified green before it rotates into the graded head next
round (swap ``staged_query`` for ``plans.registry.query``, import the
module from ``__spark_entry__``, and move freshly-green head rows to
TAIL with pins -- mechanics as executed in rounds 6-16, see
plans/round6_queries.py .. round16_queries.py history).

Opening state: EMPTY -- the round-15 staging queue fully drained at the
round-16 rotation (all 25 rows graduated, docs/ROTATION_R16.md). The
round-17 refill lands during round 16, kept no larger than the free
slots remaining after the round-17 rotation, every row with a
brute-force or property-based second witness in the same commit and a
measured scale point or written scale arithmetic for any novel
data-scaling shape (VERDICT r15 ask #9).

Design notes per query live in the docstrings; every one follows the
repo-wide cross-engine determinism rules (functions/stable.py,
llm/hashing.py): integer or exact-decimal arithmetic wherever a value is
compared, libm only where both engines are correctly-rounded (IEEE
division), md5-based hashing for anything pseudo-random.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from sparkksqldbbenchmark_spark.catalog import load_table  # noqa: F401

QueryFn = Callable[[SparkSession, str], DataFrame]

STAGED: dict[str, QueryFn] = {}
STAGED_ORACLE: dict[str, str] = {}


def staged_query(name: str, oracle: str) -> Callable[[QueryFn], QueryFn]:
    """Module-local twin of plans.registry.query -- keeps staged work out
    of the driver's grading window until deliberately rotated in."""

    def deco(fn: QueryFn) -> QueryFn:
        STAGED[name] = fn
        STAGED_ORACLE[name] = oracle
        return fn

    return deco


# ---------- supervised discretization: adjacent-bin merge sweep --

_SDM_BINS = 20
# merge adjacent bins whose positive-rate gap is below 5%:
# 20 * |k_lo*n_hi - k_hi*n_lo| < n_lo*n_hi  (exact integers)
_SDM_GAP_DEN = 20


def _sdm_oracle(nb: int = _SDM_BINS, gd: int = _SDM_GAP_DEN) -> str:
    return f"""
    WITH binned AS (
        SELECT least({nb - 1},
                     greatest(0, CAST(floor(value / 5.0) AS BIGINT)))
                   AS bin,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    grid AS (SELECT unnest(range({nb})) AS bin),
    agg AS (
        SELECT g.bin,
               CAST(count(b.bin) AS BIGINT) AS n,
               CAST(coalesce(sum(b.y), 0) AS BIGINT) AS k
        FROM grid g LEFT JOIN binned b ON b.bin = g.bin
        GROUP BY g.bin
    ),
    pairs AS (
        SELECT hi.bin,
               lo.n AS n_lo, lo.k AS k_lo,
               hi.n AS n_hi, hi.k AS k_hi,
               lo.k * hi.n - hi.k * lo.n AS rate_gap_x,
               (lo.n = 0 OR hi.n = 0
                OR {gd} * abs(lo.k * hi.n - hi.k * lo.n)
                   < lo.n * hi.n) AS merged
        FROM agg lo JOIN agg hi ON hi.bin = lo.bin + 1
    ),
    flagged AS (
        SELECT a.bin, a.n, a.k,
               CASE WHEN p.merged IS NULL OR NOT p.merged
                    THEN 1 ELSE 0 END AS new_island,
               coalesce(p.rate_gap_x, 0) AS rate_gap_x,
               coalesce(p.merged, FALSE) AS merged_with_prev
        FROM agg a LEFT JOIN pairs p ON p.bin = a.bin
    )
    SELECT bin, n, k,
           CAST(rate_gap_x AS BIGINT) AS rate_gap_x,
           merged_with_prev,
           CAST(sum(new_island) OVER (
               ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS island
    FROM flagged
    """


@staged_query(
    "supervised_discretization_merge_sweep", oracle=_sdm_oracle()
)
def supervised_discretization_merge_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SUPERVISED DISCRETIZATION by adjacent-bin merging — the
    ChiMerge-family sweep (Kerber 1992) executed as ONE bounded-frame
    pass: values bin into {_SDM_BINS} fixed bins, each adjacent pair
    is tested for label-rate equality, pairs whose positive-rate gap
    is below 1/{_SDM_GAP_DEN} merge, and the island id (running count
    of unmerged boundaries over the ordered 20-row frame) IS the
    learned discretization. The test statistic is the EXACT
    cross-multiplied rate gap k_lo*n_hi - k_hi*n_lo — the signed
    pre-squared numerator of the pair chi2 (the Brier-row device):
    emitting it unsquared keeps every engine in BIGINT at any bin
    skew, where T*delta^2 would overflow int64 once a bin holds
    ~10^5 rows. Empty-bin pairs merge by definition (no evidence of
    difference — Kerber's rule).

    Scale shape: one partial+final aggregate to the bounded bin
    frame; the pair test, merge verdicts, and island prefix-sum all
    run on the <= {_SDM_BINS}-row frame. Nothing scales past the
    scan.

    Reference basis: feature-engineering family (width_bucket r9,
    equi_depth_partition_bounds r13 TAIL, pav_isotonic r15 — this
    adds the SUPERVISED bin-merging member the seeds called for)."""
    ev = load_table(spark, sf_dir, "events")
    nb, gd = _SDM_BINS, _SDM_GAP_DEN
    binned = ev.select(
        F.least(
            F.lit(nb - 1),
            F.greatest(
                F.lit(0), F.floor(F.col("value") / 5.0).cast("long")
            ),
        ).alias("bin"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    grid = spark.range(nb).select(F.col("id").alias("bin"))
    agg = (
        grid.join(binned, "bin", "left")
        .groupBy("bin")
        .agg(
            F.count("y").cast("long").alias("n"),
            F.coalesce(F.sum("y"), F.lit(0)).cast("long").alias("k"),
        )
    )
    lo = agg.select(
        (F.col("bin") + 1).alias("bin"),
        F.col("n").alias("n_lo"),
        F.col("k").alias("k_lo"),
    )
    pairs = lo.join(
        agg.select(
            "bin", F.col("n").alias("n_hi"), F.col("k").alias("k_hi")
        ),
        "bin",
    ).select(
        "bin",
        (F.col("k_lo") * F.col("n_hi") - F.col("k_hi") * F.col("n_lo"))
        .alias("rate_gap_x"),
        (
            (F.col("n_lo") == 0)
            | (F.col("n_hi") == 0)
            | (
                gd
                * F.abs(
                    F.col("k_lo") * F.col("n_hi")
                    - F.col("k_hi") * F.col("n_lo")
                )
                < F.col("n_lo") * F.col("n_hi")
            )
        ).alias("merged"),
    )
    flagged = agg.join(pairs, "bin", "left").select(
        "bin",
        "n",
        "k",
        F.coalesce("rate_gap_x", F.lit(0))
        .cast("long")
        .alias("rate_gap_x"),
        F.coalesce("merged", F.lit(False)).alias("merged_with_prev"),
        F.when(
            F.col("merged").isNull() | ~F.col("merged"), 1
        )
        .otherwise(0)
        .alias("new_island"),
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return flagged.select(
        "bin",
        "n",
        "k",
        "rate_gap_x",
        "merged_with_prev",
        F.sum("new_island").over(w).cast("long").alias("island"),
    )


# ---------- de-seasonalized CUSUM drift flags (composed) --

_SCUSUM_H = 200000  # flag threshold, cents


def _scusum_oracle(h: int = _SCUSUM_H) -> str:
    return f"""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(sum(CAST(floor(value * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    keyed AS (
        SELECT event_type, d,
               (d - DATE '1970-01-01') % 7 AS dow,
               cents
        FROM daily
    ),
    med AS (
        SELECT event_type, dow,
               CAST(quantile_disc(cents, 0.5) AS BIGINT) AS med
        FROM keyed GROUP BY event_type, dow
    ),
    resid AS (
        SELECT k.event_type, k.d, k.cents - m.med AS r
        FROM keyed k JOIN med m USING (event_type, dow)
    ),
    pre AS (
        SELECT event_type, d,
               sum(r) OVER (
                   PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS pt
        FROM resid
    ),
    cusum AS (
        SELECT event_type, d,
               pt - least(CAST(0 AS BIGINT), min(pt) OVER (
                   PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW)) AS st
        FROM pre
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(st) AS BIGINT) AS max_cusum_cents,
           CAST(sum(CASE WHEN st > {h} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flag_days,
           coalesce(strftime(min(CASE WHEN st > {h} THEN d END),
                    '%Y-%m-%d'), '') AS first_flag_day
    FROM cusum GROUP BY event_type
    """


@staged_query(
    "seasonal_cusum_residual_flags", oracle=_scusum_oracle()
)
def seasonal_cusum_residual_flags(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DE-SEASONALIZED CUSUM — the ROTATION_R16 seed composing the
    round-16 weekday-median profile with the graduated CUSUM device:
    per event_type, the daily total is centered by its weekday's
    DISCRETE median (removing the day-of-week seasonality that would
    otherwise fire the detector every weekend), and the one-sided
    CUSUM runs over the residuals via the prefix-sum identity
    S_t = P_t - min(0, min_{i<=t} P_i) — two window frames over ONE
    per-type sort instead of the unparallelizable scan-left
    recurrence. Grades per type: days, peak CUSUM, flag days above
    {_SCUSUM_H} cents, and the first flag date.

    Scale shape: one partial+final aggregate to the (type x day)
    grain, a bounded (type x 7) order-statistic frame broadcast
    back, then type-partitioned windows over day series — the same
    exchange plan as the graduated cusum_drift_flags with one extra
    bounded join.

    Reference basis: time-series family composition
    (cusum_drift_flags r14, dow_seasonal_median_residuals r16 — the
    seed: de-seasonalize BEFORE detecting, or the detector measures
    the calendar)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", "ts")).alias("d"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    keyed = daily.select(
        "event_type",
        "d",
        (
            F.datediff(F.col("d"), F.lit("1970-01-01")) % 7
        ).alias("dow"),
        "cents",
    )
    med = keyed.groupBy("event_type", "dow").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)"
        )
        .cast("long")
        .alias("med")
    )
    resid = keyed.join(F.broadcast(med), ["event_type", "dow"]).select(
        "event_type", "d", (F.col("cents") - F.col("med")).alias("r")
    )
    w = Window.partitionBy("event_type").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    pre = resid.select(
        "event_type", "d", F.sum("r").over(w).alias("pt")
    )
    cusum = pre.select(
        "event_type",
        "d",
        (
            F.col("pt")
            - F.least(F.lit(0).cast("long"), F.min("pt").over(w))
        ).alias("st"),
    )
    return cusum.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("st").cast("long").alias("max_cusum_cents"),
        F.sum(F.when(F.col("st") > _SCUSUM_H, 1).otherwise(0))
        .cast("long")
        .alias("n_flag_days"),
        F.coalesce(
            F.date_format(
                F.min(
                    F.when(F.col("st") > _SCUSUM_H, F.col("d"))
                ),
                "yyyy-MM-dd",
            ),
            F.lit(""),
        ).alias("first_flag_day"),
    )


# ---------- calibration-weighted reciprocal-rank fusion --

_WRRF_K = 60
_WRRF_TOPN = 40
_WRRF_OUT = 5
_WRRF_VAL = 10  # validation depth for the per-ranker weight


def _wrrf_oracle(
    k: int = _WRRF_K,
    topn: int = _WRRF_TOPN,
    out: int = _WRRF_OUT,
    vd: int = _WRRF_VAL,
) -> str:
    from sparkksqldbbenchmark_spark.llm.hashing import sql_md5_int

    q = f"({sql_md5_int('text')} % 1000)"
    return f"""
    WITH sliced AS (
        SELECT source, doc_id, n_chars, lang, {q} AS quality
        FROM (
            SELECT source, doc_id, n_chars, lang, text,
                   row_number() OVER (
                       PARTITION BY source ORDER BY doc_id
                   ) AS rn
            FROM documents
        ) WHERE rn <= {topn}
    ),
    ranked AS (
        SELECT source, doc_id, lang,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY n_chars DESC, doc_id
               ) AS r1,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY quality DESC, doc_id
               ) AS r2
        FROM sliced
    ),
    w AS (
        SELECT 1 + sum(CASE WHEN r1 <= {vd} AND lang = 'en'
                            THEN 1 ELSE 0 END) AS w1,
               1 + sum(CASE WHEN r2 <= {vd} AND lang = 'en'
                            THEN 1 ELSE 0 END) AS w2
        FROM ranked
    ),
    fused AS (
        SELECT source, doc_id, r1, r2, w.w1, w.w2,
               (w.w1 * ({k} + r2) + w.w2 * ({k} + r1)) AS num,
               ({k} + r1) * ({k} + r2) AS den
        FROM ranked, w
    ),
    ordered AS (
        SELECT source, doc_id, r1, r2, w1, w2, num, den,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY num * 1099511627776 // den DESC, doc_id
               ) AS fused_rank
        FROM fused
    )
    SELECT source, CAST(fused_rank AS BIGINT) AS fused_rank,
           doc_id, CAST(r1 AS BIGINT) AS rank_by_length,
           CAST(r2 AS BIGINT) AS rank_by_quality,
           CAST(w1 AS BIGINT) AS weight_length,
           CAST(w2 AS BIGINT) AS weight_quality,
           CAST(num * 1000000 // den AS BIGINT) AS wrrf_micros
    FROM ordered WHERE fused_rank <= {out}
    """


@staged_query(
    "rrf_weighted_fusion_exact", oracle=_wrrf_oracle()
)
def rrf_weighted_fusion_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CALIBRATION-WEIGHTED reciprocal-rank fusion — the ROTATION_R16
    seed: the graduated RRF combiner with per-ranker weights LEARNED
    from the data instead of fixed at 1. Each ranker's weight is
    1 + its validation hit count (quality-label docs it placed in
    its top {_WRRF_VAL} — the held-out precision a production fusion
    layer tunes weights with), and the fused score becomes
    w1/(k+r1) + w2/(k+r2), carried as ONE exact integer fraction
    (num/den over the common denominator) and ordered by the
    floor-key embedding — no floating point anywhere.

    Scale shape: identical to the graduated RRF row — a bounded
    top-{_WRRF_TOPN} slice per source BEFORE any ranking window,
    plus one 1-row weight scalar broadcast (the only addition).

    Reference basis: retrieval family
    (reciprocal_rank_fusion_exact r15 staged — this adds the
    weighted form; brier_reliability_bins r16 motivates WHY rankers
    earn different weights)."""
    from sparkksqldbbenchmark_spark.llm.hashing import spark_md5_int

    k, topn, out, vd = _WRRF_K, _WRRF_TOPN, _WRRF_OUT, _WRRF_VAL
    docs = load_table(spark, sf_dir, "documents")
    q = f"({spark_md5_int('text')}) % 1000"
    sliced = (
        docs.select(
            "source",
            "doc_id",
            "n_chars",
            "lang",
            F.expr(q).alias("quality"),
            F.row_number()
            .over(Window.partitionBy("source").orderBy("doc_id"))
            .alias("rn"),
        )
        .where(F.col("rn") <= topn)
        .drop("rn")
    )
    ranked = sliced.select(
        "source",
        "doc_id",
        "lang",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.col("n_chars").desc(), "doc_id"
            )
        )
        .alias("r1"),
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.col("quality").desc(), "doc_id"
            )
        )
        .alias("r2"),
    )
    w = ranked.agg(
        (
            1
            + F.sum(
                F.when(
                    (F.col("r1") <= vd) & (F.col("lang") == "en"), 1
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("w1"),
        (
            1
            + F.sum(
                F.when(
                    (F.col("r2") <= vd) & (F.col("lang") == "en"), 1
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("w2"),
    )
    fused = ranked.crossJoin(F.broadcast(w)).select(
        "source",
        "doc_id",
        "r1",
        "r2",
        "w1",
        "w2",
        (
            F.col("w1") * (k + F.col("r2"))
            + F.col("w2") * (k + F.col("r1"))
        ).alias("num"),
        ((k + F.col("r1")) * (k + F.col("r2"))).alias("den"),
    )
    ordered = fused.select(
        "*",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.expr("num * 1099511627776 div den").desc(),
                "doc_id",
            )
        )
        .alias("fused_rank"),
    ).where(F.col("fused_rank") <= out)
    return ordered.select(
        "source",
        F.col("fused_rank").cast("long").alias("fused_rank"),
        "doc_id",
        F.col("r1").cast("long").alias("rank_by_length"),
        F.col("r2").cast("long").alias("rank_by_quality"),
        F.col("w1").cast("long").alias("weight_length"),
        F.col("w2").cast("long").alias("weight_quality"),
        F.expr("num * 1000000 div den")
        .cast("long")
        .alias("wrrf_micros"),
    )


# ---------- Pareto-frontier knee point (max chord distance) --


def _knee_oracle() -> str:
    return """
    WITH cells AS (
        SELECT p_brand AS brand,
               CAST(p_size AS BIGINT) AS size,
               CAST(min(CAST(floor(p_retailprice * 100) AS BIGINT))
                    AS BIGINT) AS price
        FROM part GROUP BY p_brand, p_size
    ),
    frontier AS (
        SELECT c.* FROM cells c
        WHERE NOT EXISTS (
            SELECT 1 FROM cells c2
            WHERE c2.brand = c.brand AND c2.size > c.size
              AND c2.price <= c.price
        )
    ),
    ends AS (
        SELECT brand,
               min_by(size, size) AS a_size,
               min_by(price, size) AS a_price,
               max_by(size, size) AS b_size,
               max_by(price, size) AS b_price,
               count(*) AS n_frontier
        FROM frontier GROUP BY brand
    ),
    crossed AS (
        SELECT f.brand, f.size, f.price, e.n_frontier,
               abs((e.b_size - e.a_size) * (f.price - e.a_price)
                   - (e.b_price - e.a_price) * (f.size - e.a_size))
                   AS cross_x
        FROM frontier f JOIN ends e USING (brand)
    )
    SELECT brand,
           CAST(n_frontier AS BIGINT) AS n_frontier,
           CAST(min_by(size,
                (-cross_x) * 8589934592 + size) AS BIGINT)
               AS knee_size,
           CAST(min_by(price,
                (-cross_x) * 8589934592 + size) AS BIGINT)
               AS knee_price_cents,
           CAST(max(cross_x) AS BIGINT) AS knee_cross_x
    FROM crossed GROUP BY brand, n_frontier
    """


@staged_query("pareto_knee_maxcross", oracle=_knee_oracle())
def pareto_knee_maxcross(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KNEE POINT of each brand's Pareto frontier — the point a
    human picks off a cost/benefit curve, computed exactly: the
    frontier point maximizing distance to the chord between the
    frontier's endpoints. Distance ordering needs no sqrt or
    division — the 2-D cross product
    (b-a) x (p-a) is an exact integer whose absolute value orders
    chord distances (the chord is fixed per brand, so the |cross| /
    |chord| normalization is a constant factor), making argmax knee
    selection a composite-BIGINT min_by with size ties. Grades per
    brand: frontier size, the knee cell, and its cross-product mass.

    Scale shape: parts reduce to domain-bounded (brand, size) cells
    before anything pairwise (the graduated skyline's device); the
    frontier window, endpoint fold, and knee argmax all run on the
    bounded cell frame.

    Reference basis: multi-criteria family (skyline_pareto_frontier
    r14, pareto_frontier_skyline r10 TAIL — this adds the SELECTION
    step a frontier exists to feed)."""
    part = load_table(spark, sf_dir, "part")
    cells = part.groupBy(
        F.col("p_brand").alias("brand"),
        F.col("p_size").cast("long").alias("size"),
    ).agg(
        F.min(F.floor(F.col("p_retailprice") * 100).cast("long"))
        .cast("long")
        .alias("price")
    )
    w = (
        Window.partitionBy("brand")
        .orderBy(F.col("size").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        cells.withColumn("m1", F.min("price").over(w))
        .where(F.col("m1").isNull() | (F.col("m1") > F.col("price")))
        .drop("m1")
    )
    ends = frontier.groupBy("brand").agg(
        F.min_by("size", "size").alias("a_size"),
        F.min_by("price", "size").alias("a_price"),
        F.max_by("size", "size").alias("b_size"),
        F.max_by("price", "size").alias("b_price"),
        F.count(F.lit(1)).alias("n_frontier"),
    )
    crossed = frontier.join(F.broadcast(ends), "brand").select(
        "brand",
        "size",
        "price",
        "n_frontier",
        F.abs(
            (F.col("b_size") - F.col("a_size"))
            * (F.col("price") - F.col("a_price"))
            - (F.col("b_price") - F.col("a_price"))
            * (F.col("size") - F.col("a_size"))
        ).alias("cross_x"),
    )
    key = (-F.col("cross_x")) * F.lit(8589934592) + F.col("size")
    return crossed.groupBy(
        "brand", F.col("n_frontier").cast("long").alias("n_frontier")
    ).agg(
        F.min_by("size", key).cast("long").alias("knee_size"),
        F.min_by("price", key).cast("long").alias("knee_price_cents"),
        F.max("cross_x").cast("long").alias("knee_cross_x"),
    )


# ---------- context-length policy sweep (truncate + pad cost) --

_CLP_LENGTHS = (64, 128, 256)
_CLP_B = 8  # batch size (sequences per padded batch)


def _clp_oracle(
    lengths: tuple = _CLP_LENGTHS, b: int = _CLP_B
) -> str:
    vals = ", ".join(f"({L})" for L in lengths)
    return f"""
    WITH pol AS (SELECT * FROM (VALUES {vals}) t(ctx_len)),
    lens AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(trim(text), '\\S+'))
                    AS BIGINT) AS n_tok
        FROM documents
    ),
    used AS (
        SELECT p.ctx_len, l.doc_id, l.n_tok,
               least(l.n_tok, p.ctx_len) AS used,
               greatest(l.n_tok - p.ctx_len, 0) AS truncated
        FROM pol p CROSS JOIN lens l
    ),
    batched AS (
        SELECT ctx_len, used, truncated,
               (row_number() OVER (
                   PARTITION BY ctx_len
                   ORDER BY used, doc_id) - 1) // {b} AS batch
        FROM used
    ),
    per AS (
        SELECT ctx_len, batch,
               count(*) AS n, max(used) AS mx,
               sum(used) AS s, sum(truncated) AS tr
        FROM batched GROUP BY ctx_len, batch
    )
    SELECT CAST(ctx_len AS BIGINT) AS ctx_len,
           CAST(count(*) AS BIGINT) AS n_batches,
           CAST(sum(s) AS BIGINT) AS used_tokens,
           CAST(sum(tr) AS BIGINT) AS truncated_tokens,
           CAST(sum(n * mx - s) AS BIGINT) AS padding_tokens,
           CAST(sum(n * mx - s) * 1000000 // sum(n * mx)
                AS BIGINT) AS pad_waste_micros,
           CAST(sum(tr) * 1000000 // (sum(s) + sum(tr))
                AS BIGINT) AS trunc_loss_micros
    FROM per GROUP BY ctx_len
    """


@staged_query(
    "context_length_policy_sweep", oracle=_clp_oracle()
)
def context_length_policy_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CONTEXT-LENGTH POLICY SWEEP — the two costs a max-sequence-
    length choice trades, graded exactly per policy: TRUNCATION loss
    (tokens cut from docs longer than the context) vs PADDING waste
    (length-sorted batches of {_CLP_B} still pad to the batch max).
    Short contexts truncate more; long contexts pad more — the sweep
    emits both exact token masses and floor-micros rates for
    {_CLP_LENGTHS}, the table a training-config review reads.

    Scale shape: one scan-side token count crossed with the bounded
    3-row policy frame, one rank window per policy partition
    (parallel across policies; the two-level chunked rank at
    production scale), batch-grain then policy-grain aggregates.

    Reference basis: packing family (padding_waste_sorted_vs_fifo
    r15 staged measured the SORT lever; this measures the LENGTH
    lever — together they fix the batcher's two knobs)."""
    b = _CLP_B
    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), "\\s+"))
        .cast("long")
        .alias("n_tok"),
    )
    pol = spark.createDataFrame(
        [(L,) for L in _CLP_LENGTHS], "ctx_len long"
    )
    used = F.broadcast(pol).crossJoin(lens).select(
        "ctx_len",
        "doc_id",
        F.least(F.col("n_tok"), F.col("ctx_len")).alias("used"),
        F.greatest(
            F.col("n_tok") - F.col("ctx_len"), F.lit(0)
        ).alias("truncated"),
    )
    batched = used.select(
        "ctx_len",
        "used",
        "truncated",
        F.floor(
            (
                F.row_number().over(
                    Window.partitionBy("ctx_len").orderBy(
                        "used", "doc_id"
                    )
                )
                - 1
            )
            / b
        ).alias("batch"),
    )
    per = batched.groupBy("ctx_len", "batch").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("used").alias("mx"),
        F.sum("used").alias("s"),
        F.sum("truncated").alias("tr"),
    )
    return per.groupBy(F.col("ctx_len").cast("long").alias("ctx_len")).agg(
        F.count(F.lit(1)).cast("long").alias("n_batches"),
        F.sum("s").cast("long").alias("used_tokens"),
        F.sum("tr").cast("long").alias("truncated_tokens"),
        F.sum(F.col("n") * F.col("mx") - F.col("s"))
        .cast("long")
        .alias("padding_tokens"),
        F.expr(
            "sum(n * mx - s) * 1000000 div sum(n * mx)"
        )
        .cast("long")
        .alias("pad_waste_micros"),
        F.expr(
            "sum(tr) * 1000000 div (sum(s) + sum(tr))"
        )
        .cast("long")
        .alias("trunc_loss_micros"),
    )


# ---------- density-greedy token-budget knapsack, certified --


def _density_oracle() -> str:
    from sparkksqldbbenchmark_spark.llm.hashing import sql_md5_int

    q = f"({sql_md5_int('text')} % 1000)"
    return f"""
    WITH items AS (
        SELECT doc_id,
               CAST({q} + 1 AS BIGINT) AS v,
               CAST(greatest(len(regexp_extract_all(
                   trim(text), '\\S+')), 1) AS BIGINT) AS c
        FROM documents
    ),
    ordered AS (
        SELECT doc_id, v, c,
               row_number() OVER (
                   ORDER BY v * 1099511627776 // c DESC, doc_id
               ) AS rk,
               sum(c) OVER (
                   ORDER BY v * 1099511627776 // c DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum_c,
               sum(v) OVER (
                   ORDER BY v * 1099511627776 // c DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum_v
        FROM items
    ),
    b AS (
        SELECT CAST(sum(c) // 10 AS BIGINT) AS budget FROM items
    ),
    sel AS (
        SELECT coalesce(max(rk), 0) AS n_sel,
               coalesce(max(cum_v), 0) AS sel_v,
               coalesce(max(cum_c), 0) AS sel_c
        FROM ordered, b WHERE cum_c <= b.budget
    ),
    nxt AS (
        SELECT o.v AS nv, o.c AS nc
        FROM ordered o, sel s WHERE o.rk = s.n_sel + 1
    )
    SELECT CAST(s.n_sel AS BIGINT) AS n_sel,
           CAST(s.sel_v AS BIGINT) AS selected_value,
           CAST(s.sel_c AS BIGINT) AS selected_cost,
           b.budget,
           CAST(s.sel_v
                + coalesce((b.budget - s.sel_c) * n.nv // n.nc, 0)
                AS BIGINT) AS frac_opt_floor,
           CAST((SELECT max(v) FROM items) AS BIGINT) AS max_item_v,
           (s.sel_v + (SELECT max(v) FROM items)
            >= s.sel_v
               + coalesce((b.budget - s.sel_c) * n.nv // n.nc, 0))
               AS within_additive_bound
    FROM sel s, b LEFT JOIN nxt n ON TRUE
    """


@staged_query(
    "density_greedy_budget_certified", oracle=_density_oracle()
)
def density_greedy_budget_certified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DENSITY-GREEDY KNAPSACK under a token budget, with the
    classic additive certificate: items (docs) carry integer value
    (md5 quality + 1) and cost (token count); greedy takes the
    value-density prefix (density ordered by the exact floor-key
    embedding v*2^40 // c — no floating-point ratios) while the
    running cost fits the 10% token budget. The certificate is the
    LP-relaxation bound made exact: fractional OPT = greedy prefix +
    the next item's pro-rata slice (one exact floor), and
    greedy + max_item_value >= frac_OPT >= integer OPT — the
    standard proof that density-greedy is within one item of
    optimal, graded as a value instead of assumed.

    Scale shape: one scan-side value/cost projection, one global
    rank window (two-level chunked at production scale — the
    deterministic_corpus_shuffle pattern), a 1-row budget scalar,
    and two bounded scalar folds. No joins at item grain.

    Reference basis: selection family (token_budget_selection r4
    flagship is the priority-cut member; waterfill r14 the
    fairness member; this is the VALUE-DENSITY member with its
    approximation certificate)."""
    from sparkksqldbbenchmark_spark.llm.hashing import spark_md5_int

    docs = load_table(spark, sf_dir, "documents")
    q = f"({spark_md5_int('text')}) % 1000"
    items = docs.select(
        "doc_id",
        (F.expr(q) + 1).cast("long").alias("v"),
        F.greatest(
            F.size(F.split(F.trim(F.col("text")), "\\s+")), F.lit(1)
        )
        .cast("long")
        .alias("c"),
    )
    key = F.expr("v * 1099511627776 div c")
    w = Window.orderBy(key.desc(), "doc_id")
    frame = w.rowsBetween(Window.unboundedPreceding, 0)
    ordered = items.select(
        "doc_id",
        "v",
        "c",
        F.row_number().over(w).alias("rk"),
        F.sum("c").over(frame).alias("cum_c"),
        F.sum("v").over(frame).alias("cum_v"),
    )
    b = items.agg(
        (F.sum("c") / 10).cast("long").alias("budget"),
        F.max("v").alias("max_item_v"),
    )
    sel = (
        ordered.crossJoin(F.broadcast(b))
        .where(F.col("cum_c") <= F.col("budget"))
        .agg(
            F.coalesce(F.max("rk"), F.lit(0)).alias("n_sel"),
            F.coalesce(F.max("cum_v"), F.lit(0)).alias("sel_v"),
            F.coalesce(F.max("cum_c"), F.lit(0)).alias("sel_c"),
        )
    )
    nxt = (
        ordered.crossJoin(F.broadcast(sel))
        .where(F.col("rk") == F.col("n_sel") + 1)
        .select(F.col("v").alias("nv"), F.col("c").alias("nc"))
    )
    return (
        sel.crossJoin(F.broadcast(b))
        .join(F.broadcast(nxt), F.lit(True), "left")
        .select(
            F.col("n_sel").cast("long").alias("n_sel"),
            F.col("sel_v").cast("long").alias("selected_value"),
            F.col("sel_c").cast("long").alias("selected_cost"),
            "budget",
            (
                F.col("sel_v")
                + F.coalesce(
                    F.expr("(budget - sel_c) * nv div nc"), F.lit(0)
                )
            )
            .cast("long")
            .alias("frac_opt_floor"),
            F.col("max_item_v").cast("long").alias("max_item_v"),
            (
                F.col("sel_v") + F.col("max_item_v")
                >= F.col("sel_v")
                + F.coalesce(
                    F.expr("(budget - sel_c) * nv div nc"), F.lit(0)
                )
            ).alias("within_additive_bound"),
        )
    )


# ---------- sort-key delta-compression estimate (layout lever) --


def _sortkey_oracle() -> str:
    return """
    WITH base AS (
        SELECT event_id, user_id, ts,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    orderings AS (
        SELECT 'natural' AS ordering,
               cents - lag(cents) OVER (ORDER BY event_id) AS d
        FROM base
        UNION ALL
        SELECT 'by_time',
               cents - lag(cents) OVER (ORDER BY ts, event_id)
        FROM base
        UNION ALL
        SELECT 'by_user_time',
               cents - lag(cents) OVER (
                   ORDER BY user_id, ts, event_id)
        FROM base
        UNION ALL
        SELECT 'by_value',
               cents - lag(cents) OVER (ORDER BY cents, event_id)
        FROM base
    )
    SELECT ordering,
           CAST(count(d) AS BIGINT) AS n_deltas,
           CAST(sum(abs(d)) AS BIGINT) AS abs_delta_mass,
           CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_deltas,
           CAST(max(abs(d)) AS BIGINT) AS max_abs_delta,
           CAST(sum(CASE WHEN abs(d) < 256 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_byte_deltas
    FROM orderings GROUP BY ordering
    """


@staged_query(
    "sortkey_delta_compression_estimate", oracle=_sortkey_oracle()
)
def sortkey_delta_compression_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SORT-KEY DELTA-COMPRESSION ESTIMATE — the layout lever graded
    as exact integers: columnar delta/frame-of-reference encodings
    compress in proportion to how small consecutive differences are,
    so the CHOICE of table sort key is a storage-cost decision. For
    four candidate orderings (insertion order, event time, user+time
    — the clustered-write key, and the value itself) the row grades
    the exact delta profile of the cents column: total |delta| mass,
    zero-delta count (run-length wins), max delta (bit-width
    ceiling), and byte-encodable deltas — the table a lakehouse
    OPTIMIZE/CLUSTER BY decision reads. Ordering by the value itself
    is the proven floor (sorted deltas sum telescopically to
    max - min).

    Scale shape: four ordered passes over one scan (each a global
    window — the two-level chunked form at production scale, where
    each pass is really a per-file statistic computed at write time);
    everything after collapses to a 4-row frame.

    Reference basis: layout family (clustered_write_sorted_runs r9
    TAIL, range/zorder_layout_scan r7 TAIL — those grade READ
    pruning; this grades the WRITE-side compression economics of the
    same sort keys)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )

    def ordered(tag: str, *cols):
        w = Window.orderBy(*cols)
        return base.select(
            F.lit(tag).alias("ordering"),
            (F.col("cents") - F.lag("cents").over(w)).alias("d"),
        )

    orderings = (
        ordered("natural", "event_id")
        .unionByName(ordered("by_time", "ts", "event_id"))
        .unionByName(
            ordered("by_user_time", "user_id", "ts", "event_id")
        )
        .unionByName(ordered("by_value", "cents", "event_id"))
    )
    return orderings.groupBy("ordering").agg(
        F.count("d").cast("long").alias("n_deltas"),
        F.sum(F.abs(F.col("d"))).cast("long").alias("abs_delta_mass"),
        F.sum(F.when(F.col("d") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero_deltas"),
        F.max(F.abs(F.col("d"))).cast("long").alias("max_abs_delta"),
        F.sum(F.when(F.abs(F.col("d")) < 256, 1).otherwise(0))
        .cast("long")
        .alias("n_byte_deltas"),
    )


# ---------- differential-privacy sensitivity / noise budget --

_DP_EPS_X10 = 5  # epsilon = 0.5


def _dp_oracle(eps_x10: int = _DP_EPS_X10) -> str:
    return f"""
    WITH per_user AS (
        SELECT event_type, user_id,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(abs(floor(value * 100)) AS BIGINT))
                    AS BIGINT) AS abs_cents
        FROM events GROUP BY event_type, user_id
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n_rows) AS BIGINT) AS n_rows,
           CAST(max(n_rows) AS BIGINT) AS count_sensitivity,
           CAST(max(abs_cents) AS BIGINT) AS sum_sensitivity_cents,
           CAST(max(n_rows) * 10 * 1000000 / {eps_x10} AS BIGINT)
               AS count_noise_scale_micros,
           CAST(max(abs_cents) * 10 * 1000000 / {eps_x10} AS BIGINT)
               AS sum_noise_scale_micros
    FROM per_user GROUP BY event_type
    """


@staged_query(
    "dp_sensitivity_noise_budget", oracle=_dp_oracle()
)
def dp_sensitivity_noise_budget(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """USER-LEVEL DP SENSITIVITY AUDIT — the exact, data-derived
    inputs a differentially-private release needs BEFORE any noise is
    drawn: under user-level neighboring datasets (add/remove one
    user's entire contribution), the L1 sensitivity of a per-type
    COUNT is the max rows any one user contributes and of a SUM the
    max absolute cents mass any one user contributes — both exact
    integer maxima over the per-user contribution frame. The row also
    prices the Laplace noise scale sensitivity/epsilon at epsilon =
    {_DP_EPS_X10}/10 in exact floor micros (the noise itself is
    random by definition and out of grading scope; the CALIBRATION is
    deterministic and is what pipelines get wrong).

    Scale shape: one partial+final aggregate to the (type, user)
    contribution grain, one rollup to |types| rows. The contribution
    grain is exactly what a production DP accountant maintains.

    Reference basis: governance family (k_anonymity r15,
    l_diversity r16, data_retention r14 — this adds the
    DP-release-calibration member)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.abs(F.floor(F.col("value") * 100)).cast("long"))
        .cast("long")
        .alias("abs_cents"),
    )
    return per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.max("n_rows").cast("long").alias("count_sensitivity"),
        F.max("abs_cents").cast("long").alias("sum_sensitivity_cents"),
        F.expr(
            f"cast(max(n_rows) * 10 * 1000000 / {_DP_EPS_X10} as bigint)"
        ).alias("count_noise_scale_micros"),
        F.expr(
            f"cast(max(abs_cents) * 10 * 1000000 / {_DP_EPS_X10}"
            " as bigint)"
        ).alias("sum_noise_scale_micros"),
    )


# ---------- Theil-Sen robust trend slope (exact fractions) --


def _theil_sen_oracle() -> str:
    return """
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(sum(CAST(floor(value * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, cents,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY d) - 1 AS i
        FROM daily
    ),
    slopes AS (
        SELECT a.event_type,
               b.cents - a.cents AS num,
               b.i - a.i AS den
        FROM idx a JOIN idx b
          ON b.event_type = a.event_type AND b.i > a.i
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(quantile_disc(
               num * 1099511627776 // den, 0.5) AS BIGINT)
               AS median_slope_key,
           CAST(sum(CASE WHEN num > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_rising_pairs,
           CAST(sum(CASE WHEN num < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_falling_pairs
    FROM slopes GROUP BY event_type
    """


@staged_query(
    "theil_sen_slope_exact", oracle=_theil_sen_oracle()
)
def theil_sen_slope_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """THEIL-SEN ROBUST TREND — the median-of-pairwise-slopes
    estimator (up to 29% outlier breakdown, vs 0% for OLS) computed
    exactly: per event_type the daily series indexes 0..n-1, every
    i<j pair contributes slope (y_j - y_i)/(j - i), and the median
    slope is selected by the integer key num*2^40 div den (both
    engines truncate toward zero — still a strict order embedding,
    since distinct slopes differ by more than 2^-40 when day gaps
    keep den < 2^20), so both engines pick the identical median pair
    with NO floating-point slopes. The key itself is the graded
    value (an exact, reversible rendering of the slope), alongside
    the sign census of all pairs (the Mann-Kendall trend numerator).

    Scale shape: the fact scan collapses to the bounded (type x day)
    frame FIRST; the pairwise slope frame is |days|^2 per type —
    bounded by the calendar, not the corpus (30 days -> 435 pairs).
    The robust twin of the TAIL ols_trend_by_key row at identical
    exchange cost.

    Reference basis: time-series family (ols_trend_by_key r12 TAIL,
    cusum r14, seasonal CUSUM staged — the robust-slope member)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", "ts")).alias("d"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    idx = daily.select(
        "event_type",
        "cents",
        (
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("d")
            )
            - 1
        ).alias("i"),
    )
    a = idx.select(
        "event_type",
        F.col("cents").alias("ca"),
        F.col("i").alias("ia"),
    )
    b = idx.select(
        "event_type",
        F.col("cents").alias("cb"),
        F.col("i").alias("ib"),
    )
    slopes = (
        a.join(b, "event_type")
        .where(F.col("ib") > F.col("ia"))
        .select(
            "event_type",
            (F.col("cb") - F.col("ca")).alias("num"),
            (F.col("ib") - F.col("ia")).alias("den"),
        )
    )
    return slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP "
            "(ORDER BY num * 1099511627776 div den)"
        )
        .cast("long")
        .alias("median_slope_key"),
        F.sum(F.when(F.col("num") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_rising_pairs"),
        F.sum(F.when(F.col("num") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_falling_pairs"),
    )


# ---------- team-draft interleaving preference (online eval) --

_TDI_TOPN = 40
_TDI_K = 4  # interleaved positions
_TDI_CLICK = 500  # click iff md5 quality >= threshold


def _tdi_oracle(
    topn: int = _TDI_TOPN, k: int = _TDI_K, ct: int = _TDI_CLICK
) -> str:
    from sparkksqldbbenchmark_spark.llm.hashing import sql_md5_int

    q = f"({sql_md5_int('text')} % 1000)"

    def coin(r):
        expr = f"(source || '#coin{r}')"
        return f"({sql_md5_int(expr)} % 2)"

    return f"""
    WITH sliced AS (
        SELECT source, doc_id, n_chars, {q} AS quality
        FROM (
            SELECT source, doc_id, n_chars, text,
                   row_number() OVER (
                       PARTITION BY source ORDER BY doc_id
                   ) AS rn
            FROM documents
        ) WHERE rn <= {topn}
    ),
    ranked AS (
        SELECT source, doc_id, quality,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY n_chars DESC, doc_id) AS ra,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY quality DESC, doc_id) AS rb
        FROM sliced
    ),
    teams AS (
        SELECT source,
               {coin(1)} AS t1,
               1 - {coin(1)} AS t2,
               {coin(3)} AS t3,
               1 - {coin(3)} AS t4
        FROM (SELECT DISTINCT source FROM sliced)
    ),
    p1 AS (
        SELECT r.source,
               min_by(r.doc_id,
                   CASE WHEN t.t1 = 0 THEN r.ra ELSE r.rb END) AS d1,
               min(t.t1) AS team1
        FROM ranked r JOIN teams t USING (source)
        GROUP BY r.source
    ),
    p2 AS (
        SELECT r.source,
               min_by(r.doc_id,
                   CASE WHEN t.t2 = 0 THEN r.ra ELSE r.rb END) AS d2,
               min(t.t2) AS team2
        FROM ranked r
        JOIN teams t USING (source)
        JOIN p1 ON p1.source = r.source AND r.doc_id != p1.d1
        GROUP BY r.source
    ),
    p3 AS (
        SELECT r.source,
               min_by(r.doc_id,
                   CASE WHEN t.t3 = 0 THEN r.ra ELSE r.rb END) AS d3,
               min(t.t3) AS team3
        FROM ranked r
        JOIN teams t USING (source)
        JOIN p1 ON p1.source = r.source AND r.doc_id != p1.d1
        JOIN p2 ON p2.source = r.source AND r.doc_id != p2.d2
        GROUP BY r.source
    ),
    p4 AS (
        SELECT r.source,
               min_by(r.doc_id,
                   CASE WHEN t.t4 = 0 THEN r.ra ELSE r.rb END) AS d4,
               min(t.t4) AS team4
        FROM ranked r
        JOIN teams t USING (source)
        JOIN p1 ON p1.source = r.source AND r.doc_id != p1.d1
        JOIN p2 ON p2.source = r.source AND r.doc_id != p2.d2
        JOIN p3 ON p3.source = r.source AND r.doc_id != p3.d3
        GROUP BY r.source
    ),
    picks AS (
        SELECT source, 1 AS pos, d1 AS doc_id, team1 AS team FROM p1
        UNION ALL
        SELECT source, 2, d2, team2 FROM p2
        UNION ALL
        SELECT source, 3, d3, team3 FROM p3
        UNION ALL
        SELECT source, 4, d4, team4 FROM p4
    )
    SELECT p.source,
           CAST(p.pos AS BIGINT) AS pos,
           p.doc_id,
           CAST(p.team AS BIGINT) AS team,
           (r.quality >= {ct}) AS clicked
    FROM picks p JOIN ranked r
      ON r.source = p.source AND r.doc_id = p.doc_id
    """


@staged_query(
    "team_draft_interleave_preference", oracle=_tdi_oracle()
)
def team_draft_interleave_preference(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TEAM-DRAFT INTERLEAVING — the online ranker-comparison
    protocol (Radlinski et al. 2008) as exact relational rounds: two
    rankers (by length, by md5 quality) alternate draft picks into
    one {_TDI_K}-slot result list; pick order within each round is an
    md5 coin per (source, round) — deterministic, so BOTH engines
    draft the identical list. A deterministic click model (quality >=
    {_TDI_CLICK}) labels each position; the per-team click credit is
    the preference signal an interleaving experiment reads. Grades
    the full per-position draft table (source, pos, doc_id, team,
    clicked) — the raw log an online-eval pipeline aggregates.

    Scale shape: a bounded top-{_TDI_TOPN} slice per source before
    anything else; each draft round is a bounded join + one min_by
    aggregate over the slice (the graduated MMR unrolled-greedy
    device with a two-ranker twist). Corpus size touches only the
    slicing window.

    Reference basis: retrieval-eval family (reciprocal_rank_fusion
    r15, rrf_weighted staged, average_precision r14 — those grade
    OFFLINE metrics; this is the ONLINE protocol that replaces them
    when clicks exist)."""
    from sparkksqldbbenchmark_spark.llm.hashing import spark_md5_int

    topn, ct = _TDI_TOPN, _TDI_CLICK
    docs = load_table(spark, sf_dir, "documents")
    q = f"({spark_md5_int('text')}) % 1000"
    sliced = (
        docs.select(
            "source",
            "doc_id",
            "n_chars",
            F.expr(q).alias("quality"),
            F.row_number()
            .over(Window.partitionBy("source").orderBy("doc_id"))
            .alias("rn"),
        )
        .where(F.col("rn") <= topn)
        .drop("rn")
    )
    ranked = sliced.select(
        "source",
        "doc_id",
        "quality",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.col("n_chars").desc(), "doc_id"
            )
        )
        .alias("ra"),
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.col("quality").desc(), "doc_id"
            )
        )
        .alias("rb"),
    )

    def coin(r):
        expr = f"concat(source, '#coin{r}')"
        return F.expr(f"({spark_md5_int(expr)}) % 2")

    teams = ranked.select("source").distinct().select(
        "source",
        coin(1).alias("t1"),
        (1 - coin(1)).alias("t2"),
        coin(3).alias("t3"),
        (1 - coin(3)).alias("t4"),
    )
    base = ranked.join(teams, "source")

    def draft(cur, tcol, out_d, out_t):
        rank_used = F.when(
            F.col(tcol) == 0, F.col("ra")
        ).otherwise(F.col("rb"))
        return cur.groupBy("source").agg(
            F.min_by("doc_id", rank_used).alias(out_d),
            F.min(tcol).alias(out_t),
        )

    p1 = draft(base, "t1", "d1", "team1")
    c2 = base.join(p1, "source").where(F.col("doc_id") != F.col("d1"))
    p2 = draft(c2, "t2", "d2", "team2")
    c3 = c2.join(p2, "source").where(F.col("doc_id") != F.col("d2"))
    p3 = draft(c3, "t3", "d3", "team3")
    c4 = c3.join(p3, "source").where(F.col("doc_id") != F.col("d3"))
    p4 = draft(c4, "t4", "d4", "team4")
    picks = (
        p1.select(
            "source",
            F.lit(1).cast("long").alias("pos"),
            F.col("d1").alias("doc_id"),
            F.col("team1").cast("long").alias("team"),
        )
        .unionByName(
            p2.select(
                "source",
                F.lit(2).cast("long").alias("pos"),
                F.col("d2").alias("doc_id"),
                F.col("team2").cast("long").alias("team"),
            )
        )
        .unionByName(
            p3.select(
                "source",
                F.lit(3).cast("long").alias("pos"),
                F.col("d3").alias("doc_id"),
                F.col("team3").cast("long").alias("team"),
            )
        )
        .unionByName(
            p4.select(
                "source",
                F.lit(4).cast("long").alias("pos"),
                F.col("d4").alias("doc_id"),
                F.col("team4").cast("long").alias("team"),
            )
        )
    )
    return picks.join(
        ranked.select("source", "doc_id", "quality"),
        ["source", "doc_id"],
    ).select(
        "source",
        "pos",
        "doc_id",
        "team",
        (F.col("quality") >= ct).alias("clicked"),
    )


# ---------- Benjamini-Hochberg FDR step-up (exact integers) --

_BH_ALPHA_DEN = 10  # alpha = 1/10


def _bh_oracle(ad: int = _BH_ALPHA_DEN) -> str:
    from sparkksqldbbenchmark_spark.llm.hashing import sql_md5_int

    expr = "(event_type || '#' || CAST(hr AS VARCHAR))"
    # planted signal: 'purchase' cells carry tiny p-values (true
    # effects); the rest are uniform nulls — without the plant BH
    # never rejects on 120 uniform draws and the row grades nothing
    p = (
        f"(CASE WHEN event_type = 'purchase' "
        f"THEN {sql_md5_int(expr)} % 500 "
        f"ELSE {sql_md5_int(expr)} % 1000000 END)"
    )
    return f"""
    WITH cells AS (
        SELECT DISTINCT event_type, hour(ts) AS hr FROM events
    ),
    tested AS (
        SELECT event_type, hr, {p} AS p_x FROM cells
    ),
    ranked AS (
        SELECT event_type, hr, p_x,
               row_number() OVER (ORDER BY p_x, event_type, hr)
                   AS rk,
               count(*) OVER () AS m
        FROM tested
    ),
    sat AS (
        SELECT *,
               ({ad} * p_x * m <= rk * 1000000) AS satisfied
        FROM ranked
    ),
    kstar AS (
        SELECT coalesce(max(CASE WHEN satisfied THEN rk END), 0)
                   AS ks
        FROM sat
    )
    SELECT s.event_type,
           CAST(s.hr AS BIGINT) AS hr,
           CAST(s.p_x AS BIGINT) AS p_x,
           CAST(s.rk AS BIGINT) AS rank,
           s.satisfied,
           (s.rk <= k.ks) AS rejected
    FROM sat s, kstar k
    """


@staged_query(
    "benjamini_hochberg_fdr_stepup", oracle=_bh_oracle()
)
def benjamini_hochberg_fdr_stepup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BENJAMINI-HOCHBERG FDR CONTROL, step-up, exact — the multiple-
    testing correction a metric-monitoring deployment needs when it
    runs one drift test per (type, hour) cell every day: order the m
    per-cell p-values, find the LARGEST rank i with
    p_(i) <= i * alpha / m, and reject exactly ranks 1..i — by
    step-up semantics a rank below the cutoff is rejected even where
    its own satisfied flag is false (the step-up/step-down difference;
    proved on random p-vectors by the hypothesis property suite, and
    visible here as the graded satisfied/rejected column pair). The
    comparison is pure integers ({_BH_ALPHA_DEN} * p_x * m <=
    rank * 10^6); p-values are md5-deterministic with a planted
    signal block ('purchase' cells are true effects — 120 uniform
    nulls alone would never reject and the row would grade nothing).

    Scale shape: the test frame is the bounded (type x 24) cell
    grid; the ordering window, cutoff scalar, and verdicts all run
    on that frame. In production the p-values arrive from the
    per-cell drift tests (psi/chi2 rows) at the same bounded grain.

    Reference basis: evaluation/monitoring family (psi_drift_bins
    r15, chi2_independence r14, binned_ks r10 TAIL — those produce
    the per-cell statistics; this row decides WHICH cells to alert
    on without flooding the pager)."""
    from sparkksqldbbenchmark_spark.llm.hashing import spark_md5_int

    ad = _BH_ALPHA_DEN
    ev = load_table(spark, sf_dir, "events")
    cells = ev.select(
        "event_type", F.hour("ts").alias("hr")
    ).distinct()
    h = spark_md5_int("concat(event_type, '#', cast(hr as string))")
    # planted signal (see oracle note): purchase cells are true effects
    pexpr = F.expr(
        f"CASE WHEN event_type = 'purchase' THEN ({h}) % 500 "
        f"ELSE ({h}) % 1000000 END"
    )
    tested = cells.select("event_type", "hr", pexpr.alias("p_x"))
    w = Window.orderBy("p_x", "event_type", "hr")
    ranked = tested.select(
        "event_type",
        "hr",
        "p_x",
        F.row_number().over(w).alias("rk"),
    )
    m = tested.agg(F.count(F.lit(1)).alias("m"))
    sat = ranked.crossJoin(F.broadcast(m)).select(
        "*",
        (ad * F.col("p_x") * F.col("m") <= F.col("rk") * 1000000)
        .alias("satisfied"),
    )
    kstar = sat.agg(
        F.coalesce(
            F.max(F.when(F.col("satisfied"), F.col("rk"))), F.lit(0)
        ).alias("ks")
    )
    return sat.crossJoin(F.broadcast(kstar)).select(
        "event_type",
        F.col("hr").cast("long").alias("hr"),
        F.col("p_x").cast("long").alias("p_x"),
        F.col("rk").cast("long").alias("rank"),
        "satisfied",
        (F.col("rk") <= F.col("ks")).alias("rejected"),
    )


# ---------- Kaplan-Meier hazard table (exact integers) --


def _km_oracle() -> str:
    return """
    WITH spans AS (
        SELECT user_id,
               min(CAST(date_trunc('day', ts) AS DATE)) AS f,
               max(CAST(date_trunc('day', ts) AS DATE)) AS l
        FROM events GROUP BY user_id
    ),
    horizon AS (SELECT max(l) AS dmax FROM spans),
    lived AS (
        SELECT user_id,
               (l - f) AS lifespan,
               (l = h.dmax) AS censored
        FROM spans, horizon h
    ),
    grid AS (
        SELECT unnest(range(0,
            (SELECT max(lifespan) FROM lived) + 1)) AS k
    )
    SELECT CAST(g.k AS BIGINT) AS day_k,
           CAST(count(*) AS BIGINT) AS n_at_risk,
           CAST(sum(CASE WHEN v.lifespan = g.k AND NOT v.censored
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
           CAST(sum(CASE WHEN v.lifespan = g.k AND v.censored
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_censored,
           CAST(sum(CASE WHEN v.lifespan = g.k AND NOT v.censored
                         THEN 1 ELSE 0 END) * 1000000 // count(*)
                AS BIGINT) AS hazard_micros
    FROM grid g JOIN lived v ON v.lifespan >= g.k
    GROUP BY g.k
    """


@staged_query("km_hazard_table_exact", oracle=_km_oracle())
def km_hazard_table_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KAPLAN-MEIER HAZARD TABLE with right-censoring, exact — the
    survival-analysis sufficient statistics a retention model is fit
    from: each user's observed lifespan runs first-event day to
    last-event day; users still active on the corpus's final day are
    CENSORED (their true lifespan is only known to exceed the
    observation window — counting them as churned is the classic
    retention-analysis bias this row exists to separate out). Per
    day-offset k the table grades the at-risk count (lifespan >= k),
    exact churn events, censoring exits, and the discrete hazard
    d_k/n_k in floor micros. The KM survival product and any fitted
    model follow from exactly these columns.

    Scale shape: the fact scan collapses at the per-user span
    aggregate; the (lifespan, censored) frame joins a
    calendar-bounded day grid (|days| rows) on an inequality over
    the BOUNDED grid — never at event grain.

    Reference basis: product-analytics family (cohort_retention r5
    TAIL grades the cohort matrix; stickiness_dau_mau r14 TAIL the
    ratio; this adds the censoring-aware survival grain)."""
    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.min(F.to_date(F.date_trunc("day", "ts"))).alias("f"),
        F.max(F.to_date(F.date_trunc("day", "ts"))).alias("l"),
    )
    horizon = spans.agg(F.max("l").alias("dmax"))
    lived = spans.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        F.datediff("l", "f").cast("long").alias("lifespan"),
        (F.col("l") == F.col("dmax")).alias("censored"),
    )
    kmax = lived.agg(F.max("lifespan").alias("mx"))
    grid = (
        kmax.select(
            F.explode(
                F.sequence(F.lit(0), F.col("mx").cast("int"))
            ).alias("day_k")
        )
    )
    joined = F.broadcast(grid).join(
        lived, lived.lifespan >= F.col("day_k")
    )
    churn = F.when(
        (F.col("lifespan") == F.col("day_k")) & ~F.col("censored"), 1
    ).otherwise(0)
    cens = F.when(
        (F.col("lifespan") == F.col("day_k")) & F.col("censored"), 1
    ).otherwise(0)
    return joined.groupBy(
        F.col("day_k").cast("long").alias("day_k")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_at_risk"),
        F.sum(churn).cast("long").alias("n_churned"),
        F.sum(cens).cast("long").alias("n_censored"),
        F.expr(
            "cast(sum(case when lifespan = day_k and not censored"
            " then 1 else 0 end) * 1000000 div count(*) as bigint)"
        ).alias("hazard_micros"),
    )


# ---------- streaming exact windowed median (order statistic) --


def _stream_median_oracle() -> str:
    return """
    WITH d0 AS (
        SELECT date_trunc('day', min(ts)) AS t0 FROM events
    ),
    day1 AS (
        SELECT ts, event_type,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events, d0
        WHERE ts >= d0.t0 AND ts < d0.t0 + INTERVAL 1 DAY
    ),
    wm AS (
        SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM day1
    ),
    b AS (
        SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS ws,
               event_type, cents
        FROM day1
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(quantile_disc(cents, 0.5) AS BIGINT)
               AS median_cents
    FROM b, wm
    WHERE ws + INTERVAL 15 MINUTE <= wm.w
    GROUP BY ws, event_type
    """


@staged_query(
    "streaming_window_exact_median", oracle=_stream_median_oracle()
)
def streaming_window_exact_median(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING EXACT WINDOWED MEDIAN — an order statistic inside a
    watermarked append-mode aggregate: the per-(window, type) value
    list accumulates as streaming aggregation state (collect_list is
    a stateful agg) and the DISCRETE median is taken at emission by
    element_at(sort_array(...), (n+1) div 2) — exact, not
    approx_percentile, so both engines agree value-for-value on every
    closed window. Grades the closed-set rule (windows whose end
    clears the final watermark) jointly with the order statistic —
    the production shape for per-window latency p50s where a sketch's
    error bars are unacceptable.

    Fixture: the proven ordered-file device (mtime-forced,
    maxFilesPerTrigger=1, two files: bulk then the max-ts row that
    advances the watermark for the final flush); the dir and auto
    checkpoint are reclaimed after the memory sink materializes.

    Scale shape: watermarked tumbling aggregate — state bounded by
    OPEN windows times their in-window row count (the honest cost of
    an exact in-window order statistic; beyond memory the GK-summary
    row is the documented mergeable fallback). The median itself is
    emission-time, per closed window, never a global sort.

    Reference basis: SURVEY §2.9 T1/T4 x §2.4 A4: the reference
    grades windowed means and batch percentiles separately; this
    composes them — the exact percentile IN the stream."""
    import os
    import shutil
    import tempfile
    import uuid

    from sparkksqldbbenchmark_spark.streaming.pipeline import (
        run_to_memory,
    )

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.date_trunc("day", F.min("ts")).alias("t0"))
    day1 = (
        ev.crossJoin(F.broadcast(bounds))
        .where(
            (F.col("ts") >= F.col("t0"))
            & (F.col("ts") < F.col("t0") + F.expr("INTERVAL 1 DAY"))
        )
        .select(
            "ts",
            "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
            "event_id",
        )
    )
    wlast = Window.orderBy(F.desc("ts"), F.desc("event_id"))
    marked = day1.withColumn("__rk", F.row_number().over(wlast))
    head = marked.where(F.col("__rk") > 1).select(
        "ts", "event_type", "cents"
    )
    tail = marked.where(F.col("__rk") == 1).select(
        "ts", "event_type", "cents"
    )
    base = tempfile.mkdtemp(prefix="smedian_")
    try:
        sdir = os.path.join(base, "stream")
        os.makedirs(sdir)
        for i, part_df in enumerate((head, tail)):
            tmp = os.path.join(base, f"part{i}")
            part_df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = [
                f for f in os.listdir(tmp) if f.endswith(".parquet")
            ][0]
            dst = os.path.join(sdir, f"file{i}.parquet")
            shutil.copy(os.path.join(tmp, part), dst)
            os.utime(dst, (1_700_000_000 + i * 60,) * 2)
        stream = (
            spark.readStream.schema(
                "ts timestamp, event_type string, cents long"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(sdir)
        )
        agged = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(
                F.window("ts", "15 minutes").alias("w"), "event_type"
            )
            .agg(F.collect_list("cents").alias("vals"))
            .select(
                F.date_format(
                    "w.start", "yyyy-MM-dd HH:mm:ss"
                ).alias("window_start"),
                "event_type",
                F.size("vals").cast("long").alias("n"),
                F.expr(
                    "element_at(sort_array(vals),"
                    " cast((size(vals) + 1) div 2 as int))"
                )
                .cast("long")
                .alias("median_cents"),
            )
        )
        name = f"smedian_{uuid.uuid4().hex[:8]}"
        q = run_to_memory(agged, name, output_mode="append")
        q.stop()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.table(name)


# ---------- skew salt-factor plan from the key histogram --

_SALT_H = 64  # heavy-hitter capacity (same guarantee as the sidecar)
_SALT_TARGET_DEN = 32  # per-task target = total/32 rows


def _salt_plan_oracle(
    h: int = _SALT_H, td: int = _SALT_TARGET_DEN
) -> str:
    return f"""
    WITH ok AS (
        SELECT CASE WHEN o_custkey % 97 < 30 THEN 0
                    ELSE o_custkey END AS k
        FROM orders
    ),
    co AS (SELECT k, count(*) AS n FROM ok GROUP BY k),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM co),
    hot AS (
        SELECT k, n FROM co, tot WHERE n * {h} >= t
    )
    SELECT h.k AS hot_key,
           CAST(h.n AS BIGINT) AS n_rows,
           CAST((h.n * {td} + t.t - 1) // t.t AS BIGINT)
               AS salt_factor,
           CAST(t.t // {td} AS BIGINT) AS per_task_target,
           CAST((h.n + (h.n * {td} + t.t - 1) // t.t - 1)
                // ((h.n * {td} + t.t - 1) // t.t) AS BIGINT)
               AS rows_per_salt,
           ((h.n + (h.n * {td} + t.t - 1) // t.t - 1)
            // ((h.n * {td} + t.t - 1) // t.t)
            <= t.t // {td}) AS within_target
    FROM hot h, tot t
    """


@staged_query(
    "skew_salt_plan_from_histogram", oracle=_salt_plan_oracle()
)
def skew_salt_plan_from_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SKEW SALT-FACTOR PLANNING from per-key statistics — the third
    act of the skew trilogy: the twin MEASURED why undetected heavy
    hitters break cardinality estimates, the MG sidecar DETECTED and
    priced them, and this row PLANS the remediation a salted
    repartition executes: for every heavy key (freq > N/{_SALT_H},
    the Misra-Gries guarantee) the salt factor is
    ceil(n_k / (N/{_SALT_TARGET_DEN})) — just enough replication that
    each salted sub-key lands under the per-task row target — and the
    certificate checks the resulting rows-per-salt actually clears
    the target (exact ceiling arithmetic on both engines, the
    within_target column graded as a value). This is the arithmetic
    Spark's AQE skew-split performs at runtime, planned ahead from
    ANALYZE-grade statistics.

    Scale shape: one partial+final per-key count (the MG grain), a
    1-row total broadcast, and the bounded hot set (pigeonhole
    <= {_SALT_H} keys). Nothing scales past the first aggregate.

    Reference basis: scale-pattern family (skewed_join_replicated r2
    executes a fixed replication; join_cardinality_skew_twin +
    mg_sidecar r16 measure and detect; this row closes the loop with
    the plan)."""
    h, td = _SALT_H, _SALT_TARGET_DEN
    orders = load_table(spark, sf_dir, "orders")
    skew = F.when(
        F.col("o_custkey") % 97 < 30, F.lit(0)
    ).otherwise(F.col("o_custkey"))
    co = orders.select(skew.alias("k")).groupBy("k").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = co.agg(F.sum("n").cast("long").alias("t"))
    hot = (
        co.crossJoin(F.broadcast(tot))
        .where(F.col("n") * h >= F.col("t"))
    )
    salt = F.expr(f"(n * {td} + t - 1) div t")
    rows_per_salt = F.expr(
        f"(n + (n * {td} + t - 1) div t - 1)"
        f" div ((n * {td} + t - 1) div t)"
    )
    return hot.select(
        F.col("k").alias("hot_key"),
        F.col("n").cast("long").alias("n_rows"),
        salt.cast("long").alias("salt_factor"),
        F.expr(f"t div {td}").cast("long").alias("per_task_target"),
        rows_per_salt.cast("long").alias("rows_per_salt"),
        (rows_per_salt <= F.expr(f"t div {td}")).alias(
            "within_target"
        ),
    )
