"""Invariant tests for the round-10 graduated cohort
(plans/round10_queries.py — formerly the next_round.py staging area),
beyond the value-hash oracle (tests/test_round10_queries.py): each
operator's result is re-derived
by an INDEPENDENT brute-force twin in plain Python over the collected
slice — a second witness with none of the SQL machinery shared, the
same pattern the graduated cohorts carry (session-vs-batch agreement,
quota exactness, MRR consistency).
"""

from __future__ import annotations

import sparkksqldbbenchmark_spark.plans.round10_queries  # noqa: F401
from sparkksqldbbenchmark_spark.plans.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_interval_coverage_matches_bruteforce_merge(spark):
    """Union length per user == classic sort-and-merge on the raw
    intervals, computed driver-side in integer microseconds."""
    from sparkksqldbbenchmark_spark.catalog import load_table

    got = {
        r.user_id: (r.n_intervals, r.covered_us)
        for r in QUERIES["interval_coverage_sweep"](spark, SF_DIR).collect()
    }
    rows = (
        load_table(spark, SF_DIR, "events")
        .where("user_id < 300")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        s = int(r.ts.timestamp() * 1_000_000)
        e = s + (r.event_id % 7 + 1) * 60_000_000
        by_user.setdefault(r.user_id, []).append((s, e))
    for uid, ivs in by_user.items():
        ivs.sort()
        covered, cur_s, cur_e = 0, *ivs[0]
        for s, e in ivs[1:]:
            if s > cur_e:
                covered += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        covered += cur_e - cur_s
        assert got[uid] == (len(ivs), covered), uid


def test_peak_concurrency_matches_bruteforce(spark):
    """Per-user and GLOBAL peaks == endpoint-scan maximum, and the
    chunked global form can never exceed the sum of per-user peaks."""
    from sparkksqldbbenchmark_spark.catalog import load_table

    per_user = {
        r.user_id: r.peak_concurrency
        for r in QUERIES["peak_concurrency_sweep"](spark, SF_DIR).collect()
    }
    g = QUERIES["global_peak_concurrency"](spark, SF_DIR).collect()[0]

    rows = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id"
    ).collect()

    def peak(endpoints):
        cur = best = 0
        # (-1 before +1) at equal instants: touching ≠ concurrent
        for _, d in sorted(endpoints):
            cur += d
            best = max(best, cur)
        return best

    by_user: dict = {}
    all_points = []
    for r in rows:
        s = int(r.ts.timestamp() * 1_000_000)
        e = s + (r.event_id % 7 + 1) * 60_000_000
        pts = [(s, 1), (e, -1)]
        all_points += pts
        if r.user_id < 300:
            by_user.setdefault(r.user_id, []).extend(pts)
    for uid, pts in by_user.items():
        assert per_user[uid] == peak(pts), uid
    assert g.peak_concurrency == peak(all_points)
    assert g.n_intervals == len(rows)


def test_countmin_never_underestimates_and_min_rule(spark):
    rows = QUERIES["countmin_heavy_hitters"](spark, SF_DIR).collect()
    assert rows and all(r.never_underestimates for r in rows)
    assert all(r.est_n >= r.true_n for r in rows)
    # total mass conservation: sum of truths == table rows
    from sparkksqldbbenchmark_spark.catalog import load_table

    n = load_table(spark, SF_DIR, "events").count()
    assert sum(r.true_n for r in rows) == n


def test_merkle_digest_localizes_the_planted_row(spark):
    """Exactly one partition mismatches and it is order 42's
    (42 % 16 = 10); counts agree everywhere (same rows, one edited)."""
    rows = QUERIES["merkle_range_digest"](spark, SF_DIR).collect()
    assert len(rows) == 16
    bad = [r for r in rows if not r.digests_match]
    assert len(bad) == 1 and bad[0].part == 42 % 16
    assert all(r.n_a == r.n_b for r in rows)


def test_weighted_median_matches_bruteforce(spark):
    from sparkksqldbbenchmark_spark.catalog import load_table

    got = {
        r.event_type: (r.total_weight, r.weighted_median)
        for r in QUERIES["weighted_median_grouped"](spark, SF_DIR).collect()
    }
    rows = load_table(spark, SF_DIR, "events").select(
        "event_type", "value", "event_id", "user_id"
    ).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(
            (r.value, r.event_id, r.user_id % 5 + 1)
        )
    for et, vals in by_type.items():
        vals.sort(key=lambda t: (t[0], t[1]))
        tot = sum(w for _, _, w in vals)
        cum = 0
        med = None
        for v, _, w in vals:
            cum += w
            if cum * 2 >= tot:
                med = v
                break
        assert got[et] == (tot, med), et


def test_gini_matches_bruteforce(spark):
    from sparkksqldbbenchmark_spark.catalog import load_table

    got = {
        r.event_type: (r.n, r.gini_num, r.gini_den)
        for r in QUERIES["gini_concentration_by_type"](
            spark, SF_DIR
        ).collect()
    }
    rows = load_table(spark, SF_DIR, "events").select(
        "event_type", "value"
    ).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(
            round(r.value * 100)
        )
    for et, xs in by_type.items():
        xs.sort()
        n, s0 = len(xs), sum(xs)
        s1 = sum(i * x for i, x in enumerate(xs, start=1))
        assert got[et] == (n, 2 * s1 - (n + 1) * s0, n * s0), et
        # Gini of non-negative values lies in [0, 1)
        assert 0 <= (2 * s1 - (n + 1) * s0) / (n * s0) < 1


def test_binned_ks_matches_bruteforce(spark):
    import math

    from sparkksqldbbenchmark_spark.catalog import load_table

    r = QUERIES["binned_ks_statistic"](spark, SF_DIR).collect()[0]
    rows = load_table(spark, SF_DIR, "events").where(
        "event_type IN ('click', 'view')"
    ).select("event_type", "value").collect()
    h1: dict = {}
    h2: dict = {}
    for x in rows:
        b = math.floor(x.value)
        (h1 if x.event_type == "click" else h2)[b] = (
            (h1 if x.event_type == "click" else h2).get(b, 0) + 1
        )
    t1, t2 = sum(h1.values()), sum(h2.values())
    c1 = c2 = 0
    d = 0
    for b in sorted(set(h1) | set(h2)):
        c1 += h1.get(b, 0)
        c2 += h2.get(b, 0)
        d = max(d, abs(t2 * c1 - t1 * c2))
    assert (r.n_click, r.n_view, r.d_scaled) == (t1, t2, d)
    assert 0.0 <= r.ks_d <= 1.0


def test_markov_rows_normalize_and_count(spark):
    rows = QUERIES["markov_transition_matrix"](spark, SF_DIR).collect()
    by_from: dict = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    for ft, rs in by_from.items():
        # floor-division ppm rows sum to ≤ 1e6 and within |types| of it
        s = sum(r.p_ppm for r in rs)
        assert 1_000_000 - len(rs) < s <= 1_000_000, ft


def test_pareto_frontier_matches_bruteforce_dominance(spark):
    from sparkksqldbbenchmark_spark.catalog import load_table

    got = {
        r.o_orderkey: r.on_frontier
        for r in QUERIES["pareto_frontier_skyline"](spark, SF_DIR).collect()
    }
    rows = load_table(spark, SF_DIR, "orders").where(
        "o_orderkey < 4000"
    ).select("o_orderkey", "o_totalprice", "o_orderdate").collect()
    for a in rows:
        dominated = any(
            b.o_totalprice < a.o_totalprice
            and b.o_orderdate > a.o_orderdate
            for b in rows
        )
        assert got[a.o_orderkey] == (not dominated), a.o_orderkey


def test_geo_nearest_matches_bruteforce(spark):
    from sparkksqldbbenchmark_spark.catalog import load_table
    from sparkksqldbbenchmark_spark.plans.round10_queries import _spark_udeg

    from pyspark.sql import functions as F

    sites = (
        load_table(spark, SF_DIR, "supplier")
        .where("s_suppkey < 40")
        .select(
            "s_suppkey",
            F.expr(_spark_udeg("s_suppkey", "lat")).alias("la"),
            F.expr(_spark_udeg("s_suppkey", "lon")).alias("lo"),
        )
        .collect()
    )
    pts = (
        load_table(spark, SF_DIR, "events")
        .where("event_id < 200")
        .select(
            "event_id",
            F.expr(_spark_udeg("event_id", "lat")).alias("la"),
            F.expr(_spark_udeg("event_id", "lon")).alias("lo"),
        )
        .collect()
    )
    got = {
        r.event_id: (r.nearest_site, r.best_d2)
        for r in QUERIES["geo_nearest_site_join"](spark, SF_DIR).collect()
    }
    for p in pts:
        best = min(
            (
                (p.la - s.la) ** 2 + (p.lo - s.lo) ** 2,
                s.s_suppkey,
            )
            for s in sites
        )
        assert got[p.event_id] == (best[1], best[0]), p.event_id


def test_conversation_render_budget_shape(spark):
    rows = QUERIES["conversation_render_budget"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_turns_kept <= 6
        assert r.prompt.count("\n") == r.n_turns_kept - 1
        for line in r.prompt.split("\n"):
            typ, cents = line.split(" ")
            assert typ in {"click", "view", "error", "purchase", "signup"}
            int(cents)


def test_pushdown_reader_without_filter_reads_everything(spark, tmp_path):
    """No pushable predicate → no pruning: every partition is read and
    the full rowcount comes back (the pushdown must never DROP rows it
    was not asked to)."""
    import os

    from pyspark.sql import functions as F

    from sparkksqldbbenchmark_spark.sources.pyds import (
        register_python_sources,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register_python_sources(spark)
    scratch = str(tmp_path / "scratch_nofilter")
    os.makedirs(scratch)
    df = (
        spark.read.format("events_pushdown")
        .option("path", f"{SF_DIR}/events.parquet")
        .option("scratch", scratch)
        .option("rows_per_part", "100")
        .load()
        # non-pushable predicate only (event_type is declined)
        .where(F.col("event_type") != "click")
    )
    n = df.count()
    exact = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where("event_type != 'click'")
        .count()
    )
    assert n == exact
    markers = [f for f in os.listdir(scratch) if f.endswith(".marker")]
    assert len(markers) == 10  # 1000 rows / 100 per part — nothing pruned


def test_bm25_matches_python_rederivation(spark):
    """Python re-derivation with the identical operation order yields
    bit-equal floats (every op is IEEE correctly rounded)."""
    from sparkksqldbbenchmark_spark.catalog import load_table

    got = {
        r.doc_id: r.bm25_odds
        for r in QUERIES["bm25_odds_retrieval"](spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).collect()
    terms = ("join", "hash", "scan", "vector")
    stats = []
    for d in docs:
        toks = d.text.split(" ")
        stats.append(
            (d.doc_id, len(toks), {t: toks.count(t) for t in terms})
        )
    n_docs = len(stats)
    avgdl = float(sum(s[1] for s in stats)) / n_docs
    df = {t: sum(1 for s in stats if s[2][t] > 0) for t in terms}
    for doc_id, dl, tf in stats:
        if doc_id >= 300:
            continue
        score = 0.0
        for t in terms:
            idf = (n_docs - df[t] + 0.5) / (df[t] + 0.5)
            tfc = (tf[t] * 2.2) / (
                tf[t] + 1.2 * (0.25 + 0.75 * (dl / avgdl))
            )
            score = score + idf * tfc
        assert got[doc_id] == score, doc_id


def test_quantile_normalization_properties(spark):
    """Within-source order is preserved, per-source extremes map to the
    global extremes, and the normalized multiset of each source follows
    the global distribution's values (all ranks are valid positions)."""
    from sparkksqldbbenchmark_spark.catalog import load_table

    rows = QUERIES["quantile_normalization_cross_source"](
        spark, SF_DIR
    ).collect()
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    assert len(rows) == len(docs)
    gvals = sorted(d.n_chars for d in docs)
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (r.n_chars, r.doc_id))
        # monotone: normalized never decreases along the source order
        norm = [r.normalized_n_chars for r in rs]
        assert norm == sorted(norm), src
        # extremes map to the global extremes
        assert norm[0] == gvals[0] and norm[-1] == gvals[-1], src
        # every normalized value is an actual global value
        gset = set(gvals)
        assert all(v in gset for v in norm), src


def test_decontam_max_span_detects_planted_leak(spark):
    """Plant a verbatim 24-token copy of an EVAL doc's opening inside a
    TRAINING doc: its max contiguous span must be ≥ 24 tokens and the
    ≥16-token policy flag must fire; a doc with no eval 8-grams stays
    at span 0."""
    from pyspark.sql import functions as F

    from sparkksqldbbenchmark_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    )
    eval_text = docs.where("doc_id = 20").collect()[0].text  # 20%10==0
    leak = " ".join(eval_text.split(" ")[:24])
    novel = " ".join(f"qzx{i}" for i in range(40))
    patched = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 11, F.concat_ws(" ", F.lit(novel), F.lit(leak)))
        .when(F.col("doc_id") == 13, F.lit(novel))
        .otherwise(F.col("text")),
    )

    import sparkksqldbbenchmark_spark.plans.round10_queries as nr

    orig = nr.load_table
    nr.load_table = (
        lambda s, d, n: patched if n == "documents" else orig(s, d, n)
    )
    try:
        rows = {
            r.doc_id: r
            for r in QUERIES["decontam_max_span"](spark, SF_DIR).collect()
        }
    finally:
        nr.load_table = orig

    assert rows[11].max_span_tokens >= 24
    assert rows[11].contaminated_span
    assert rows[13].max_span_tokens == 0 and rows[13].n_hits == 0
    assert not rows[13].contaminated_span


def test_pagerank_mass_conservation_and_bounds(spark):
    """Integer PageRank invariants: every node's rank ≥ the teleport
    base; total mass stays within floor-rounding loss of 10^12 (floor
    ops only LOSE mass, < 1 unit per division). Rank-vs-degree ordering
    is deliberately NOT asserted: the dup graph is a union of symmetric
    near-clique components, whose stationary ranks are uniform up to
    floor noise (observed ±2 units at sf0.001) regardless of degree —
    asserting hub>leaf there tests the noise, not the algorithm."""
    rows = QUERIES["pagerank_dupgraph_3iter"](spark, SF_DIR).collect()
    assert rows
    n = len(rows)
    base = 150_000_000_000 // n
    total = sum(r.pagerank_e12 for r in rows)
    assert all(r.pagerank_e12 >= base for r in rows)
    # mass ≤ 1.0 (floor ops only lose), and within a generous loss bound
    assert total <= 1_000_000_000_000
    assert total >= 1_000_000_000_000 * 90 // 100
