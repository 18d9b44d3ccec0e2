"""Second witnesses for the round-16 slot-filler head rows
(plans/round16_queries.py, the rows landed during round 16), beyond the
value-hash oracle: each operator's result is re-derived by an
INDEPENDENT brute-force twin in plain Python over the collected slice —
a second witness sharing none of the SQL machinery, the standard every
graded cohort carries (VERDICT r15 ask #9). Where the graded query uses
an algebraic shortcut (the PAV max-min identity, the closed-form water
level, the heavy-hitter sidecar decomposition), the witness runs the
DIRECT form the shortcut replaces (stack-based pooling, unit filling,
the plain per-key dict walk).
"""

from __future__ import annotations

import hashlib
import statistics
from collections import Counter, defaultdict
from fractions import Fraction

from sparkksqldbbenchmark_spark.catalog import load_table
import sparkksqldbbenchmark_spark.plans.round16_queries  # noqa: F401
from sparkksqldbbenchmark_spark.plans.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _shingles(text: str, n: int):
    toks = text.split()
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    }


def test_l_diversity_matches_counter_walk(spark):
    """QI cells re-counted with plain dicts; the violation counts,
    exposed rows, and worst-cell diversity must match exactly."""
    rows = load_table(spark, SF_DIR, "events").select(
        "ts", "value", "event_type"
    ).collect()
    cells = defaultdict(set)
    nrows = Counter()
    import datetime

    epoch = datetime.date(1970, 1, 1)
    for r in rows:
        dow = (r.ts.date() - epoch).days % 7
        vb = min(9, max(0, int(r.value // 10)))
        key = (dow, r.ts.hour, vb)
        cells[key].add(r.event_type)
        nrows[key] += 1
    exp = {}
    for dow in {k[0] for k in cells}:
        ks = [k for k in cells if k[0] == dow]
        exp[dow] = (
            len(ks),
            sum(nrows[k] for k in ks),
            sum(1 for k in ks if len(cells[k]) < 2),
            sum(1 for k in ks if len(cells[k]) < 3),
            sum(nrows[k] for k in ks if len(cells[k]) < 2),
            min(len(cells[k]) for k in ks),
        )
    got = {
        r.dow: (
            r.n_qi_cells,
            r.n_rows,
            r.l2_violating_cells,
            r.l3_violating_cells,
            r.rows_at_risk_l2,
            r.min_cell_diversity,
        )
        for r in QUERIES["l_diversity_risk_audit"](
            spark, SF_DIR
        ).collect()
    }
    assert got == exp
    # the fixture must exercise the violation path (else the row is
    # vacuously green)
    assert any(v[2] > 0 for v in exp.values())


def test_mg_sidecar_matches_dict_walk_and_fixes_the_twin(spark):
    """The sidecar estimate re-derived with plain dicts, and the
    salience check: the certificate this row grades TRUE is the same
    one the skew twin grades FALSE at this SF and above — the fix is
    observable, not vacuous."""
    H, BUCKETS = 64, 16
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_custkey"
    ).collect()
    customer = load_table(spark, SF_DIR, "customer").select(
        "c_custkey"
    ).collect()

    def skewed(k):
        return 0 if k % 97 < 30 else k

    co = Counter(skewed(r.o_custkey) for r in orders)
    cc = Counter(skewed(r.c_custkey) for r in customer)
    t_o, t_c = sum(co.values()), sum(cc.values())
    hot = {k for k, n in co.items() if n * H >= t_o} | {
        k for k, n in cc.items() if n * H >= t_c
    }
    hot_exact = sum(co.get(k, 0) * cc.get(k, 0) for k in hot)
    ro, rc = defaultdict(lambda: [0, 0]), defaultdict(lambda: [0, 0])
    for k, n in co.items():
        if k not in hot:
            ro[k % BUCKETS][0] += n
            ro[k % BUCKETS][1] += 1
    for k, n in cc.items():
        if k not in hot:
            rc[k % BUCKETS][0] += n
            rc[k % BUCKETS][1] += 1
    rest = sum(
        ro[b][0] * rc[b][0] // max(rc[b][1], 1)
        for b in ro
        if b in rc
    )
    actual = sum(co[k] * cc.get(k, 0) for k in co)
    r = QUERIES["join_cardinality_mg_sidecar_estimate"](
        spark, SF_DIR
    ).collect()[0]
    assert (
        r.n_hot_keys,
        r.hot_mass_exact,
        r.rest_predicted,
        r.predicted,
        r.actual,
    ) == (len(hot), hot_exact, rest, hot_exact + rest, actual)
    assert r.ratio_micros == (hot_exact + rest) * 1000000 // actual
    assert r.within_10x, "the sidecar must restore the certificate"
    # the hot key must actually dominate, or the row proves nothing
    assert hot_exact * 2 > actual


def test_early_stopping_matches_policy_replay(spark):
    """The patience policy replayed day by day per run in plain
    Python — running best, stall counter, stop index, regret."""
    rows = load_table(spark, SF_DIR, "events").select(
        "ts", "user_id", "value"
    ).collect()
    daily = defaultdict(int)
    for r in rows:
        import math

        daily[(r.user_id % 32, r.ts.date())] += int(
            math.floor(r.value * 100)
        )
    got = {
        r.run: r
        for r in QUERIES["early_stopping_patience_plan"](
            spark, SF_DIR
        ).collect()
    }
    runs = defaultdict(list)
    for (run, d), cents in daily.items():
        runs[run].append((d, cents))
    assert set(got) == set(runs)
    for run, series in runs.items():
        series.sort()
        best = None
        stall = 0
        stop_idx = None
        for i, (_, cents) in enumerate(series, start=1):
            if best is None or cents < best:
                best = cents
                stall = 0
            else:
                stall += 1
            if stall >= 3 and stop_idx is None:
                stop_idx = i
        n_days = len(series)
        eff_stop = stop_idx if stop_idx is not None else n_days
        best_at_stop = min(c for _, c in series[:eff_stop])
        best_overall = min(c for _, c in series)
        g = got[run]
        assert (
            g.n_days,
            g.stop_idx,
            g.stopped,
            g.best_at_stop_cents,
            g.best_overall_cents,
            g.regret_cents,
            g.saved_days,
        ) == (
            n_days,
            eff_stop,
            stop_idx is not None,
            best_at_stop,
            best_overall,
            best_at_stop - best_overall,
            n_days - eff_stop,
        ), run
    # both policy outcomes must occur in the fixture
    assert any(g.stopped for g in got.values())


def test_dow_median_matches_statistics_median_low(spark):
    """Discrete median = the lower of statistics' two middle order
    statistics; residuals re-summed in plain Python."""
    rows = load_table(spark, SF_DIR, "events").select(
        "ts", "value", "event_type"
    ).collect()
    import datetime
    import math

    epoch = datetime.date(1970, 1, 1)
    daily = defaultdict(int)
    for r in rows:
        daily[(r.event_type, r.ts.date())] += int(
            math.floor(r.value * 100)
        )
    groups = defaultdict(list)
    for (et, d), cents in daily.items():
        groups[(et, (d - epoch).days % 7)].append(cents)
    got = {
        (r.event_type, r.dow): r
        for r in QUERIES["dow_seasonal_median_residuals"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(groups)
    for key, vals in groups.items():
        med = statistics.median_low(vals)
        g = got[key]
        assert g.n_days == len(vals)
        assert g.median_cents == med, key
        assert g.abs_resid_sum_cents == sum(
            abs(v - med) for v in vals
        )
        assert g.abs_resid_max_cents == max(
            abs(v - med) for v in vals
        )


def test_brier_bins_match_counter_walk_and_identities(spark):
    """Per-bin sufficient statistics re-counted in plain Python, plus
    the decomposition identities: resolution diffs sum to zero across
    bins (law of total probability) and a bin is perfectly calibrated
    iff its reliability diff is zero."""
    rows = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type"
    ).collect()
    step = 101 // 10 + 1
    bins = defaultdict(lambda: [0, 0, 0])  # n, n_pos, sum_pct
    for r in rows:
        pct = _md5int(str(r.event_id)) % 101
        b = min(9, pct // step)
        y = 1 if r.event_type == "purchase" else 0
        bins[b][0] += 1
        bins[b][1] += y
        bins[b][2] += pct
    n_all = sum(v[0] for v in bins.values())
    s_all = sum(v[1] for v in bins.values())
    got = {
        r.bin: r
        for r in QUERIES["brier_reliability_bins_exact"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(bins)
    for b, (n, k, sp) in bins.items():
        g = got[b]
        assert (g.n, g.n_pos, g.sum_pred_pct) == (n, k, sp)
        assert g.reliability_diff_x100 == sp - 100 * k
        assert g.resolution_diff_xn == k * n_all - s_all * n
        assert (g.n_all, g.s_all) == (n_all, s_all)
    assert sum(g.resolution_diff_xn for g in got.values()) == 0


def test_wmmr_matches_weighted_greedy_trace(spark):
    """The lambda = 1/4, k = 4 greedy selection replayed in plain
    Python (score = rel - 3 * max_sim), plus the salience check: the
    weighted trace must DIVERGE from the lambda = 1/2 trace for at
    least one source at some rank > 1, or the weight graded nothing."""
    rows = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    by_src = defaultdict(list)
    shing = {}
    for r in rows:
        q = _md5int(r.text) % 1000
        by_src[r.source].append((q, r.doc_id))
        shing[r.doc_id] = _shingles(r.text, 3)

    def jac(a, b):
        sa, sb = shing[a], shing[b]
        u = len(sa | sb)
        return (len(sa & sb) * 1000000) // max(u, 1)

    def greedy(cands, rel, k, w):
        remaining = [d for _, d in cands]
        selected, trace = [], []
        for _ in range(k):
            best = None
            for d in remaining:
                msim = max(
                    (jac(d, p) for p in selected), default=0
                )
                score = rel[d] - w * msim
                if best is None or (-score, d) < best[0]:
                    best = ((-score, d), d, msim)
            _, pick, msim = best
            trace.append((pick, msim))
            selected.append(pick)
            remaining.remove(pick)
        return trace

    got = defaultdict(dict)
    for r in QUERIES["mmr_diversified_topk_weighted"](
        spark, SF_DIR
    ).collect():
        got[r.source][r.select_rank] = r
    diverged = False
    for src, docs in by_src.items():
        cand = sorted(docs, key=lambda t: (-t[0], t[1]))[:8]
        rel = {d: q * 1000 for q, d in cand}
        trace_w = greedy(cand, rel, 4, 3)
        trace_half = greedy(cand, rel, 4, 1)
        assert len(got[src]) == 4
        for rank, (pick, msim) in enumerate(trace_w, start=1):
            g = got[src][rank]
            assert g.doc_id == pick, (src, rank)
            assert g.rel_micros == rel[pick]
            assert g.max_sim_to_prior_micros == msim
        if [p for p, _ in trace_w] != [p for p, _ in trace_half]:
            diverged = True
    assert diverged, (
        "lambda = 1/4 must change at least one source's selection"
    )


def test_curation_v4_matches_python_pipeline(spark):
    """The five-stage pipeline re-run in plain Python: dup-ratio
    binning, STACK-based PAV pooling (the direct algorithm the
    max-min identity replaces), the base-rate keep cut as exact
    Fractions, canonical dedup, EXACT 5-shingle containment
    decontamination (the direct form the Bloom accelerates), and
    unit-by-unit water filling."""
    rows = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "lang", "text"
    ).collect()
    pool = [r for r in rows if _md5int(str(r.doc_id)) % 10 != 0]
    eval_docs = [r for r in rows if _md5int(str(r.doc_id)) % 10 == 0]
    eval_sh = set()
    for r in eval_docs:
        eval_sh |= _shingles(r.text, 5)

    # stage 1+2: dup-ratio bins, PAV by stack pooling, base-rate cut
    doc_stats = {}
    for r in pool:
        toks = r.text.split()
        if not toks:
            continue
        sents, cur = [], []
        for w in toks:
            cur.append(w)
            if _md5int(w) & 3 == 0:
                sents.append(" ".join(cur))
                cur = []
        if cur:
            sents.append(" ".join(cur))
        ns, nd = len(sents), len(set(sents))
        ratio_bin = min(19, (ns - nd) * 1000000 // ns // 50000)
        rb = 19 - ratio_bin
        doc_stats[r.doc_id] = (
            r.source,
            r.text,
            len(toks),
            rb,
            1 if r.lang == "en" else 0,
        )
    agg = defaultdict(lambda: [0, 0])
    for _, _, _, rb, y in doc_stats.values():
        agg[rb][0] += 1
        agg[rb][1] += y
    # stack-based PAV over nonempty bins in rb order (pools merge
    # while the left pool's mean exceeds the right's)
    pools = []  # (rbs, k, n)
    for rb in sorted(agg):
        n, k = agg[rb]
        pools.append(([rb], k, n))
        while len(pools) > 1 and Fraction(
            pools[-2][1], pools[-2][2]
        ) > Fraction(pools[-1][1], pools[-1][2]):
            rbs2, k2, n2 = pools.pop()
            rbs1, k1, n1 = pools.pop()
            pools.append((rbs1 + rbs2, k1 + k2, n1 + n2))
    fitted = {}
    for rbs, k, n in pools:
        for rb in rbs:
            fitted[rb] = Fraction(k, n)
    s_all = sum(v[4] for v in doc_stats.values())
    n_all = len(doc_stats)
    base = Fraction(s_all, n_all)
    kept = {
        did: (src, text, nw)
        for did, (src, text, nw, rb, _) in doc_stats.items()
        if fitted[rb] >= base
    }
    assert 0 < len(kept) < len(doc_stats), (
        "the PAV cut must be non-trivial at this SF"
    )

    # stage 3: canonical dedup by md5(text)
    canon = {}
    for did, (src, text, nw) in sorted(kept.items()):
        canon.setdefault(hashlib.md5(text.encode()).hexdigest(), did)
    deduped = {
        did: v
        for did, v in kept.items()
        if canon[hashlib.md5(v[1].encode()).hexdigest()] == did
    }
    # stage 4: exact 5-shingle containment decontam
    clean, dropped = {}, Counter()
    for did, (src, text, nw) in deduped.items():
        if _shingles(text, 5) & eval_sh:
            dropped[src] += 1
        else:
            clean[did] = (src, nw)
    totals, counts = Counter(), Counter()
    for src, nw in clean.values():
        totals[src] += nw
        counts[src] += 1
    # stage 5: direct unit-by-unit water filling
    budget = sum(totals.values()) // 2
    alloc = {s: 0 for s in totals}
    for _ in range(budget):
        cands = [s for s in alloc if alloc[s] < totals[s]]
        if not cands:
            break
        s = min(cands, key=lambda s: (alloc[s], s))
        alloc[s] += 1
    got = {
        r.source: (
            r.docs_kept,
            r.docs_decontaminated,
            r.total_tokens,
            r.allocated_tokens,
        )
        for r in QUERIES["curation_pipeline_v4_composed"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(totals)
    for src in totals:
        assert got[src] == (
            counts[src],
            dropped.get(src, 0),
            totals[src],
            alloc[src],
        ), src
