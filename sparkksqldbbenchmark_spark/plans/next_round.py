"""Round-18 staging area: fully-built, oracle-verified queries that are
NOT yet registered with the driver-graded registry.

Why a separate module: the driver grades exactly the first 50 entries of
``__spark_entry__.queries()`` and the round-17 head is committed (8
flagships + the 26 round-17 graduates in plans/round17_queries.py + the
15 auto-checkpoint streaming re-grades + the foreachBatch fixture
re-grade). New work lands here with a MODULE-LOCAL registry;
tests/test_next_round.py runs the same Spark-vs-DuckDB comparison the
driver runs, so each staged query is already verified green before it
rotates into the graded head next round (swap ``staged_query`` for
``plans.registry.query``, import the module from ``__spark_entry__``,
and move freshly-green head rows to TAIL with pins -- mechanics as
executed in rounds 6-17, see plans/round6_queries.py ..
round17_queries.py history).

Opening state: ONE row — team_draft_interleave_k6_generated, held back
from the round-17 graduation (27 staged > 26 free slots once the
foreachBatch fixture re-grade took a head slot, VERDICT r16 ask #4; its
machinery is graded round 17 via the suite sibling
team_draft_interleave_preference). The round-18 refill lands during
round 17 per docs/ROTATION_R17.md's seed list, kept no larger than the
free slots remaining, every row with a brute-force or property-based
second witness in the same commit and a measured scale point or written
scale arithmetic for any novel data-scaling shape.

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


# ---------- team-draft interleaving at k=6 (generated rounds) --

_TD6_TOPN = 40
_TD6_K = 6  # interleaved positions -> 3 coin rounds
_TD6_CLICK = 500


def _td6_oracle(
    topn: int = _TD6_TOPN, k: int = _TD6_K, ct: int = _TD6_CLICK
) -> str:
    from sparkksqldbbenchmark_spark.llm.hashing import sql_md5_int

    q = f"({sql_md5_int('text')} % 1000)"

    def coin(r):
        expr = f"(source || '#coin{r}')"
        return f"({sql_md5_int(expr)} % 2)"

    team = {
        i: (coin(i) if i % 2 == 1 else f"1 - {coin(i - 1)}")
        for i in range(1, k + 1)
    }
    ctes = []
    picks = []
    for i in range(1, k + 1):
        excl = "\n        ".join(
            f"JOIN p{j} ON p{j}.source = r.source "
            f"AND r.doc_id != p{j}.d{j}"
            for j in range(1, i)
        )
        ctes.append(
            f"""p{i} AS (
        SELECT r.source,
               min_by(r.doc_id,
                   CASE WHEN t.t{i} = 0 THEN r.ra ELSE r.rb END)
                   AS d{i},
               min(t.t{i}) AS team{i}
        FROM ranked r JOIN teams t USING (source)
        {excl}
        GROUP BY r.source
    )"""
        )
        picks.append(
            f"SELECT source, {i} AS pos, d{i} AS doc_id, "
            f"team{i} AS team FROM p{i}"
        )
    all_ctes = ",\n    ".join(ctes)
    all_picks = "\n        UNION ALL\n        ".join(picks)
    tcols = ",\n               ".join(
        f"{team[i]} AS t{i}" for i in range(1, k + 1)
    )
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
               {tcols}
        FROM (SELECT DISTINCT source FROM sliced)
    ),
    {all_ctes},
    picks AS (
        {all_picks}
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
    "team_draft_interleave_k6_generated", oracle=_td6_oracle()
)
def team_draft_interleave_k6_generated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TEAM-DRAFT INTERLEAVING AT k={_TD6_K} WITH LOOP-GENERATED
    ROUNDS — the ROTATION_R17 round-18 seed: the staged k=4 row's
    hand-written p1..p4 chain becomes a LOOP that only BUILDS the
    lazy plan (the device the weighted-MMR row proved for greedy
    selection), so k scales without hand-written rounds. Three md5
    coins (one per pair of positions) decide draft order; position
    2r-1 goes to the round-r coin's team and position 2r to the
    other, each pick the min_by argmax over the not-yet-picked
    slice under that team's ranking. The deterministic click model
    labels every position; the graded table is the raw per-position
    interleaving log.

    Scale shape: identical to the k=4 row — one bounded
    top-{_TD6_TOPN} slice per source, then {_TD6_K} bounded
    join + min_by rounds over the slice. Corpus size touches only
    the slicing window. The generated-SQL twin drives DuckDB, so
    both engines draft the identical list at any k.

    Reference basis: retrieval-eval family
    (team_draft_interleave_preference staged k=4;
    mmr_diversified_topk_weighted r16 head — the loop-generation
    device this row ports to interleaving)."""
    from sparkksqldbbenchmark_spark.llm.hashing import spark_md5_int

    topn, k, ct = _TD6_TOPN, _TD6_K, _TD6_CLICK
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
        *[
            (
                coin(i) if i % 2 == 1 else (1 - coin(i - 1))
            ).alias(f"t{i}")
            for i in range(1, k + 1)
        ],
    )
    cur = ranked.join(teams, "source")
    picks = None
    for i in range(1, k + 1):
        rank_used = F.when(
            F.col(f"t{i}") == 0, F.col("ra")
        ).otherwise(F.col("rb"))
        p = cur.groupBy("source").agg(
            F.min_by("doc_id", rank_used).alias(f"d{i}"),
            F.min(f"t{i}").alias(f"team{i}"),
        )
        sel = p.select(
            "source",
            F.lit(i).cast("long").alias("pos"),
            F.col(f"d{i}").alias("doc_id"),
            F.col(f"team{i}").cast("long").alias("team"),
        )
        picks = sel if picks is None else picks.unionByName(sel)
        cur = cur.join(
            p.select("source", f"d{i}"), "source"
        ).where(F.col("doc_id") != F.col(f"d{i}"))
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




# ---------- Good-Turing frequency smoothing (exact integers) -----

_GT_SCALE = 1000000  # ppm scale for the adjusted-count readout


def _gt_oracle(scale: int = _GT_SCALE) -> str:
    return f"""
    WITH ws AS (
        SELECT string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
        SELECT array_to_string(w[i:i+2], ' ') AS gram
        FROM ws, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) p
        WHERE len(w) >= 3
    ),
    counts AS (SELECT gram, count(*) AS r FROM grams GROUP BY 1),
    fof AS (SELECT r, count(*) AS n_r FROM counts GROUP BY 1),
    tot AS (
        SELECT CAST(sum(r * n_r) AS BIGINT) AS n,
               CAST(sum(CASE WHEN r = 1 THEN n_r ELSE 0 END)
                    AS BIGINT) AS n1
        FROM fof
    )
    SELECT CAST(f.r AS BIGINT) AS r,
           CAST(f.n_r AS BIGINT) AS n_r,
           CAST(COALESCE(f2.n_r, 0) AS BIGINT) AS n_r_next,
           CAST((f.r + 1) * COALESCE(f2.n_r, 0) * {scale} // f.n_r
                AS BIGINT) AS r_star_ppm,
           t.n AS total_tokens,
           CAST(t.n1 * {scale} // t.n AS BIGINT) AS p_unseen_ppm
    FROM fof f
    LEFT JOIN fof f2 ON f2.r = f.r + 1
    CROSS JOIN tot t
    """


@staged_query(
    "good_turing_frequency_smoothing", oracle=_gt_oracle()
)
def good_turing_frequency_smoothing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GOOD-TURING FREQUENCY SMOOTHING (Good 1953) — the classical
    language-model smoothing estimate, computed over the corpus word
    TRIGRAM counts (the n-gram-LM grain where the frequency spectrum
    is Zipf-rich: the fixture unigram vocabulary is a ~28-word salad
    with no singletons, while its trigram table populates classes
    r = 1, 2, 3, ... exactly as an LM event table does): from the
    frequency-of-frequencies table N_r (how many distinct trigrams
    occur exactly r times), the adjusted count is
    r* = (r+1) N_(r+1) / N_r and the total probability mass reserved
    for UNSEEN events is N_1 / N. Both are ratios of exact integers,
    graded as ppm-scaled integer divisions (identical floor semantics
    in both engines); the output grain is one row per occupied
    frequency class r, carrying N_r, N_(r+1), r*, the corpus event
    total, and the unseen mass.

    Scale shape: gram-grain explode (3 consecutive words joined; the
    per-doc transform is a bounded array HOF, no self-join) feeds ONE
    data shuffle (the trigram-count aggregate, partial+final map-side
    combined); the frequency-of-frequencies re-aggregate runs over
    the event-vocabulary grain (orders of magnitude smaller), and the
    r -> r+1 self-join plus the two corpus scalars operate on the
    O(100)-row N_r table — broadcast territory at any corpus size.
    The N_r table is the same artifact a 100 TB LM-data pipeline
    computes for Katz backoff or simple-Good-Turing fitting; nothing
    in the plan holds more than the vocabulary aggregate at once.

    Reference basis: statistics family precedent (latency percentiles,
    correlation matrix — BenchmarkRunner.scala:155-170's derived-stat
    convention); the LM-smoothing member alongside the staged
    ngram-familiarity and BPE rows (docs/ROTATION_R17.md round-18
    seed list)."""
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select(F.split("text", " ").alias("w"))
        .where(F.size("w") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 2), i ->"
                    " concat_ws(' ', element_at(w, i),"
                    " element_at(w, i + 1), element_at(w, i + 2)))"
                )
            ).alias("gram")
        )
    )
    counts = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("r")
    )
    fof = counts.groupBy("r").agg(
        F.count(F.lit(1)).cast("long").alias("n_r")
    )
    tot = fof.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("long").alias("n"),
        F.sum(
            F.when(F.col("r") == 1, F.col("n_r")).otherwise(0)
        )
        .cast("long")
        .alias("n1"),
    )
    nxt = fof.select(
        (F.col("r") - 1).alias("r_join"),
        F.col("n_r").alias("n_r_next"),
    )
    return (
        fof.join(
            F.broadcast(nxt), fof["r"] == nxt["r_join"], "left"
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("r").cast("long").alias("r"),
            "n_r",
            F.coalesce("n_r_next", F.lit(0))
            .cast("long")
            .alias("n_r_next"),
            F.expr(
                f"(r + 1) * coalesce(n_r_next, 0) * {_GT_SCALE}"
                " div n_r"
            )
            .cast("long")
            .alias("r_star_ppm"),
            F.col("n").alias("total_tokens"),
            F.expr(f"n1 * {_GT_SCALE} div n")
            .cast("long")
            .alias("p_unseen_ppm"),
        )
    )
