"""Invariant tests for the round-12 cohort (graduated round 13 into
plans/round12_queries.py), beyond the
value-hash oracle (tests/test_next_round.py): each novel operator's
result is re-derived by an INDEPENDENT brute-force twin in plain
Python over the collected slice — a second witness sharing none of
the SQL machinery, the standard every graduated cohort carries.
(tablesample_repeatable_certified grades self-certifying booleans and
xpath_scalar_suite grades a render/extract identity — neither has a
meaningful independent twin beyond its oracle.)
"""

from __future__ import annotations

import sparkksqldbbenchmark_spark.plans.round12_queries  # noqa: F401
import sparkksqldbbenchmark_spark.plans.round13_queries  # noqa: F401
from sparkksqldbbenchmark_spark.catalog import load_table
from sparkksqldbbenchmark_spark.plans.registry import QUERIES as GRADUATED

SF_DIR = "/root/testdata/sf0.001"


def test_misra_gries_certificate_matches_counter(spark):
    from collections import Counter

    rows = load_table(spark, SF_DIR, "events").select("user_id").collect()
    items = Counter(
        r.user_id % 4 if r.user_id % 3 == 0 else r.user_id + 1000
        for r in rows
    )
    n = sum(items.values())
    thr = n // 16
    expected = {
        it: (c, c - thr, n, thr) for it, c in items.items() if c > thr
    }
    got = {
        r.item: (r.exact_count, r.mg_counter_floor, r.n_total,
                 r.mg_threshold)
        for r in GRADUATED["heavy_hitters_misra_gries_certified"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected
    # the MG guarantee itself: survivors' certified floors are positive
    assert all(v[1] >= 1 for v in got.values())


def test_q17_small_quantity_matches_bruteforce(spark):
    import math
    from collections import defaultdict

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).collect()
    parts = {
        r.p_partkey: r.p_brand
        for r in load_table(spark, SF_DIR, "part")
        .select("p_partkey", "p_brand", "p_size")
        .collect()
        if r.p_size < 10
    }
    sums: dict = defaultdict(lambda: [0.0, 0])
    for r in li:
        s = sums[r.l_partkey]
        s[0] += r.l_quantity
        s[1] += 1
    agg: dict = defaultdict(lambda: [0, 0])
    for r in li:
        if r.l_partkey not in parts:
            continue
        sq, cq = sums[r.l_partkey]
        if r.l_quantity * 5.0 * cq < sq:
            a = agg[parts[r.l_partkey]]
            a[0] += 1
            a[1] += math.floor(r.l_extendedprice * 100)
    expected = {
        b: (n, cents, float(cents) / 700.0)
        for b, (n, cents) in agg.items()
    }
    got = {
        r.p_brand: (r.n_small_qty_lines, r.revenue_cents,
                    r.avg_yearly_cents)
        for r in GRADUATED["tpch_q17_small_quantity_revenue"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected


def test_q12_priority_split_matches_counter(spark):
    from collections import Counter
    from datetime import timedelta

    modes = ("MAIL", "SHIP", "AIR", "TRUCK", "RAIL", "FOB", "REG")
    orders = {
        r.o_orderkey: (r.o_orderdate, r.o_orderpriority)
        for r in load_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .collect()
    }
    hi: Counter = Counter()
    lo: Counter = Counter()
    for r in (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey", "l_shipdate")
        .collect()
    ):
        mode = modes[r.l_partkey % 7]
        if mode not in ("MAIL", "SHIP"):
            continue
        odate, prio = orders[r.l_orderkey]
        if r.l_shipdate > odate + timedelta(days=30):
            (hi if prio in ("1-URGENT", "2-HIGH") else lo)[mode] += 1
    got = {
        r.l_shipmode: (r.high_line_count, r.low_line_count)
        for r in GRADUATED["tpch_q12_shipmode_priority"](
            spark, SF_DIR
        ).collect()
    }
    expected = {
        m: (hi.get(m, 0), lo.get(m, 0))
        for m in set(hi) | set(lo)
    }
    assert got == expected


def test_mixture_planner_matches_waterfilling_replay(spark):
    rows = (
        load_table(spark, SF_DIR, "documents")
        .groupBy("source")
        .sum("n_chars")
        .collect()
    )
    per = {
        r.source: (
            r["sum(n_chars)"],
            int(r.source[3:]) % 4 + 1,
            4 * r["sum(n_chars)"],
        )
        for r in rows
    }
    B = 2 * sum(t for t, _, _ in per.values())
    W = sum(w for _, w, _ in per.values())
    order = sorted(per, key=lambda s: (per[s][2] / per[s][1], s))
    cumcap = cumw = 0
    r_star = None
    sat: dict = {}
    for s in order:
        _, w, cap = per[s]
        r_k = ((B - cumcap) * 1_000_000) // (W - cumw)
        sat[s] = cap * 1_000_000 <= r_k * w
        if not sat[s] and r_star is None:
            r_star = r_k
        cumcap += cap
        cumw += w
    expected = {}
    for s, (t, w, cap) in per.items():
        alloc = (
            cap if sat[s] or r_star is None
            else (w * r_star) // 1_000_000
        )
        expected[s] = (t, w, cap, alloc, (alloc * 1_000_000) // t)
    got = {
        r.source: (r.tokens, r.weight, r.cap, r.allocation, r.epochs_e6)
        for r in GRADUATED["mixture_epoch_repeat_planner"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected
    # budget is respected and at least one source is rate-limited
    assert sum(v[3] for v in got.values()) <= B


def test_oov_rate_matches_counter(spark):
    from collections import Counter

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("source", "text")
        .collect()
    )
    tf: Counter = Counter()
    for r in docs:
        tf.update(r.text.split(" "))
    vocab = {
        t
        for t, _ in sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[
            :500
        ]
    }
    expected: dict = {}
    per_src_tokens: dict = {}
    for r in docs:
        toks = r.text.split(" ")
        st = per_src_tokens.setdefault(r.source, [0, 0, set()])
        st[0] += len(toks)
        for t in toks:
            if t not in vocab:
                st[1] += 1
                st[2].add(t)
    expected = {
        s: (n, oov, len(dist))
        for s, (n, oov, dist) in per_src_tokens.items()
    }
    got = {
        r.source: (r.n_tokens, r.n_oov, r.n_distinct_oov)
        for r in GRADUATED["oov_rate_by_source"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_threshold_sweep_matches_counter(spark):
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text", "n_chars")
        .collect()
    )
    expected = {}
    for i in range(10):
        thr = 120 + 10 * i
        tp = fp = fn = tn = 0
        for r in docs:
            if r.n_chars <= 0:
                continue
            score = (
                1000 * (len(r.text) - len(r.text.replace(" ", "")))
            ) // r.n_chars
            pos = r.doc_id % 5 != 0
            if score >= thr:
                tp, fp = tp + pos, fp + (not pos)
            else:
                fn, tn = fn + pos, tn + (not pos)
        expected[thr] = (tp, fp, fn, tn)
    got = {
        r.thr_e3: (r.tp, r.fp, r.fn, r.tn)
        for r in GRADUATED["quality_threshold_sweep_confusion"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected


def test_zipf_by_source_matches_counter(spark):
    from collections import Counter

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("source", "text")
        .collect()
    )
    per_src: dict = {}
    for r in docs:
        per_src.setdefault(r.source, Counter()).update(
            r.text.split(" ")
        )
    expected: dict = {}
    for s, cnt in per_src.items():
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        for r_idx, (_, n) in enumerate(ranked, start=1):
            b = r_idx.bit_length()
            e = expected.setdefault(
                (s, b), [0, 0, 1 << 62, 0]
            )
            e[0] += 1
            e[1] += n
            e[2] = min(e[2], r_idx)
            e[3] = max(e[3], r_idx)
    got = {
        (r.source, r.rank_bucket): [
            r.n_tokens, r.mass, r.rank_lo, r.rank_hi
        ]
        for r in GRADUATED["zipf_tail_mass_by_source"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected


def test_feature_store_pit_matches_bruteforce(spark):
    """Both as-of enrichments replayed with per-key sorted scans in
    plain Python (bisect on snapshot timestamps) — none of the
    union-tag + last-carry machinery shared."""
    import bisect
    import math
    from collections import defaultdict

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "user_id", "event_type", "ts", "value")
        .collect()
    )
    ufeat: dict = defaultdict(dict)
    tfeat: dict = defaultdict(dict)
    for r in rows:
        c = math.floor(r.value * 100)
        if r.event_id % 7 == 0:
            k = ufeat[r.user_id]
            k[r.ts] = max(k.get(r.ts, c), c)
        if r.event_id % 11 == 0:
            k = tfeat[r.event_type]
            k[r.ts] = max(k.get(r.ts, c), c)
    usorted = {k: sorted(v) for k, v in ufeat.items()}
    tsorted = {k: sorted(v) for k, v in tfeat.items()}

    def pick(snapshots, sorted_ts, key, ts):
        if key not in snapshots:
            return None
        i = bisect.bisect_right(sorted_ts[key], ts)
        if i == 0:
            return None
        return snapshots[key][sorted_ts[key][i - 1]]

    expected = {
        r.event_id: (
            r.user_id,
            r.event_type,
            r.ts.strftime("%Y-%m-%d %H:%M:%S"),
            pick(ufeat, usorted, r.user_id, r.ts),
            pick(tfeat, tsorted, r.event_type, r.ts),
        )
        for r in rows
        if r.event_id % 50 == 0
    }
    got = {
        r.event_id: (r.user_id, r.event_type, r.event_ts, r.u_feat,
                     r.t_feat)
        for r in GRADUATED["feature_store_pit_join"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected


def test_pmi_pairs_match_counter(spark):
    from collections import Counter
    from itertools import combinations

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect()
    )
    tf: Counter = Counter()
    for r in docs:
        tf.update(r.text.split(" "))
    vocab = {
        t
        for t, _ in sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[
            :64
        ]
    }
    nx: Counter = Counter()
    nxy: Counter = Counter()
    for r in docs:
        present = sorted(set(r.text.split(" ")) & vocab)
        nx.update(present)
        nxy.update(combinations(present, 2))
    n = len({r.doc_id for r in docs})
    scored = [
        (
            (c * n * 1_000_000) // (nx[u] * nx[v]),
            u,
            v,
            c,
            nx[u],
            nx[v],
        )
        for (u, v), c in nxy.items()
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    expected = {
        (u, v): (c, nu, nv, lift)
        for lift, u, v, c, nu, nv in scored[:20]
    }
    got = {
        (r.tok_u, r.tok_v): (r.n_xy, r.n_x, r.n_y, r.lift_e6)
        for r in GRADUATED["token_pmi_top_pairs"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_chi_square_matches_integer_replay(spark):
    from collections import Counter, defaultdict

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", "user_id")
        .collect()
    )
    cells: dict = defaultdict(Counter)
    for r in rows:
        cells[r.event_type][r.user_id % 10] += 1
    expected = {}
    for t, cnt in cells.items():
        n = sum(cnt.values())
        k = len(cnt)
        ss = sum((10 * o - n) ** 2 for o in cnt.values())
        ss += (10 - k) * n * n
        expected[t] = (n, k, (ss * 1_000_000) // (10 * n), 9)
    got = {
        r.event_type: (r.n, r.n_cells_present, r.chi2_e6, r.df)
        for r in GRADUATED["chi_square_uniformity_by_type"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected


def test_calendar_suite_matches_python_calendar(spark):
    import calendar
    from collections import defaultdict

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", "ts")
        .collect()
    )
    agg: dict = defaultdict(lambda: [0, 0, 0, 0, 0, set(), None])
    for r in rows:
        d = r.ts.date()
        a = agg[r.event_type]
        a[0] += 1
        a[1] += calendar.monthrange(d.year, d.month)[1]
        a[2] += (d.month - 1) // 3 + 1
        a[3] += d.isocalendar()[1]
        # Spark dayofweek: Sunday=1 .. Saturday=7
        a[4] += d.isoweekday() % 7 + 1
        a[5].add((d.year, d.month))
        # add_months(d, 2) with month-end clamp
        y, m = d.year + (d.month + 1) // 12, (d.month + 1) % 12 + 1
        day = min(d.day, calendar.monthrange(y, m)[1])
        p2 = f"{y:04d}-{m:02d}-{day:02d}"
        a[6] = p2 if a[6] is None or p2 > a[6] else a[6]
    expected = {
        t: (a[0], a[1], a[2], a[3], a[4], len(a[5]), a[6])
        for t, a in agg.items()
    }
    got = {
        r.event_type: (
            r.n,
            r.last_day_dom_sum,
            r.quarter_sum,
            r.weekofyear_sum,
            r.dayofweek_sum,
            r.n_months,
            r.max_plus_2m,
        )
        for r in GRADUATED["calendar_function_suite"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected


def test_ivm_merge_matches_dict_fold_replay(spark):
    """The partial-state MERGE itself replayed in plain Python (two
    dicts folded key-wise), independently of the full-recompute
    oracle — both the merge rule and the recompute contract hold."""
    import math
    from collections import defaultdict

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "event_type", "ts", "value")
        .collect()
    )

    def build(pred):
        out: dict = defaultdict(lambda: [0, 0, None, None, None])
        for r in rows:
            if not pred(r.event_id):
                continue
            day = r.ts.replace(hour=0, minute=0, second=0,
                               microsecond=0)
            import calendar as _cal
            day_us = int(
                _cal.timegm(day.timetuple()) * 1_000_000
            )
            c = math.floor(r.value * 100)
            a = out[(r.event_type, day_us)]
            a[0] += 1
            a[1] += c
            a[2] = c if a[2] is None else min(a[2], c)
            a[3] = c if a[3] is None else max(a[3], c)
            a[4] = (
                r.event_id if a[4] is None else max(a[4], r.event_id)
            )
        return out

    base = build(lambda e: e % 10 != 0)
    delta = build(lambda e: e % 10 == 0)
    expected = {}
    for k in set(base) | set(delta):
        if k not in base:
            expected[k] = tuple(delta[k])
        elif k not in delta:
            expected[k] = tuple(base[k])
        else:
            b, d = base[k], delta[k]
            expected[k] = (
                b[0] + d[0],
                b[1] + d[1],
                min(b[2], d[2]),
                max(b[3], d[3]),
                max(b[4], d[4]),
            )
    got = {
        (r.event_type, r.day_us): (
            r.n, r.cents_sum, r.cents_min, r.cents_max, r.hwm_event_id
        )
        for r in GRADUATED["ivm_aggregate_delta_merge"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected


def test_prefix_energy_matches_numpy(spark):
    import math

    import numpy as np

    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    X = np.array(
        [
            [math.floor(float(x) * 1000) for x in r.embedding]
            for r in rows
        ],
        dtype=np.int64,
    )
    sq = X * X
    total = int(sq.sum())
    expected = {}
    for k in (8, 16, 32, 64):
        pe = int(sq[:, :k].sum())
        expected[k] = (pe, total, len(rows),
                       (pe * 1_000_000) // total)
    got = {
        r.k: (r.prefix_energy, r.total_energy, r.n_vecs,
              r.energy_ratio_e6)
        for r in GRADUATED["embedding_prefix_energy"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected


def test_hard_negatives_match_numpy(spark):
    import math

    import numpy as np

    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    ids = [r.vec_id for r in rows]
    labels = {r.vec_id: r.label for r in rows}
    X = {
        r.vec_id: np.array(
            [math.floor(float(x) * 1000) for x in r.embedding],
            dtype=np.int64,
        )
        for r in rows
    }
    expected = {}
    for a in ids:
        if a % 20 != 0:
            continue
        best = None
        for b in ids:
            if labels[b] == labels[a]:
                continue
            d = int(X[a] @ X[b])
            if best is None or (d, -b) > (best[0], -best[1]):
                best = (d, b)
        expected[a] = (labels[a], best[1], labels[best[1]], best[0])
    got = {
        r.anchor_id: (r.anchor_label, r.neg_id, r.neg_label, r.dot)
        for r in GRADUATED["hard_negative_mining_topk"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected


def test_span_union_matches_interval_merge(spark):
    docs = [
        r.doc_id
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id")
        .collect()
    ]
    expected = {}
    for d in docs:
        spans = sorted(
            (
                (d * 7 + i * 13) % 200,
                (d * 7 + i * 13) % 200 + 10 + (i * 5) % 20,
            )
            for i in range(d % 3 + 2)
        )
        merged = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        expected[d] = (
            len(spans),
            len(merged),
            sum(e - s for s, e in merged),
            max(e - s for s, e in merged),
        )
    got = {
        r.doc_id: (
            r.n_spans_in,
            r.n_merged,
            r.covered_chars,
            r.max_island_len,
        )
        for r in GRADUATED["doc_span_interval_union"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected


def test_global_row_index_matches_sorted_enumerate(spark):
    rows = (
        load_table(spark, SF_DIR, "events")
        .select("ts", "event_id")
        .collect()
    )
    ordered = sorted(rows, key=lambda r: (r.ts, r.event_id))
    per_day: dict = {}
    for gidx, r in enumerate(ordered):
        d = r.ts.strftime("%Y-%m-%d")
        a = per_day.setdefault(d, [0, None, None, 0])
        a[0] += 1
        a[1] = gidx if a[1] is None else min(a[1], gidx)
        a[2] = gidx if a[2] is None else max(a[2], gidx)
        a[3] += gidx
    expected = {d: tuple(a) for d, a in per_day.items()}
    got = {
        r.day: (r.n, r.min_idx, r.max_idx, r.idx_sum)
        for r in GRADUATED["global_row_index_two_level"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected
    # contiguity across days: each day's min is the previous max + 1
    seq = sorted(got.values(), key=lambda t: t[1])
    for prev, cur in zip(seq, seq[1:]):
        assert cur[1] == prev[2] + 1


def test_erasure_cascade_matches_set_replay(spark):
    erased = {
        r.c_custkey
        for r in load_table(spark, SF_DIR, "customer")
        .select("c_custkey")
        .collect()
        if r.c_custkey % 37 == 0
    }
    customers = load_table(spark, SF_DIR, "customer").count()
    orders = (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_custkey")
        .collect()
    )
    kept_orders = {
        r.o_orderkey for r in orders if r.o_custkey not in erased
    }
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey")
        .collect()
    )
    expected = {
        "customer": (customers, customers - len(erased)),
        "orders": (len(orders), len(kept_orders)),
        "lineitem": (
            len(li),
            sum(1 for r in li if r.l_orderkey in kept_orders),
        ),
    }
    got = {
        r.table_name: (r.n_before, r.n_after)
        for r in GRADUATED["right_to_erasure_cascade"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected


def test_curriculum_phases_match_sorted_cumsum(spark):
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text", "n_chars")
        .collect()
    )
    scored = sorted(
        (
            (1000 * (len(r.text) - len(r.text.replace(" ", ""))))
            // r.n_chars,
            r.doc_id,
            r.n_chars,
        )
        for r in docs
        if r.n_chars > 0
    )
    total = sum(c for _, _, c in scored)
    expected: dict = {}
    cum = 0
    for score, _, chars in scored:
        phase = (cum * 4) // total
        a = expected.setdefault(phase, [0, 0, None, None])
        a[0] += 1
        a[1] += chars
        a[2] = score if a[2] is None else min(a[2], score)
        a[3] = score if a[3] is None else max(a[3], score)
        cum += chars
    expected = {p: tuple(a) for p, a in expected.items()}
    got = {
        r.phase: (r.n_docs, r.total_chars, r.min_score_e3,
                  r.max_score_e3)
        for r in GRADUATED["curriculum_token_budget_phases"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected
    assert set(got) == {0, 1, 2, 3}


def test_mask_matches_python_classes(spark):
    """Spark mask() re-derived with str.translate over the planted
    identifiers; also checks the digest column against hashlib."""
    import hashlib
    from collections import defaultdict

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", "user_id")
        .collect()
    )

    def pymask(s: str) -> str:
        return "".join(
            "X" if c.isupper() else "x" if c.islower()
            else "n" if c.isdigit() else c
            for c in s
        )

    masked: dict = defaultdict(set)
    sha: dict = defaultdict(set)
    n: dict = defaultdict(int)
    for r in rows:
        masked[r.event_type].add(pymask(f"{r.event_type}-{r.user_id}"))
        sha[r.event_type].add(
            hashlib.sha256(
                f"{r.event_type}#{r.user_id % 100}".encode()
            ).hexdigest()
        )
        n[r.event_type] += 1
    got = {
        r.event_type: (r.n, r.n_distinct_masked, r.min_sha_hex,
                       r.aes_roundtrip_ok, r.mask_hides_digits)
        for r in GRADUATED["mask_crypto_suite"](spark, SF_DIR).collect()
    }
    expected = {
        t: (n[t], len(masked[t]), min(sha[t]), True, True)
        for t in n
    }
    assert got == expected


def test_avro_roundtrip_matches_reference_decoder(spark):
    """The wire bytes produced by the staged row's encode stage are
    re-decoded with an independent minimal Avro reader written inline
    here (varint + zigzag + utf8 by hand, no codec module imports)."""
    import math

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "event_type", "value")
        .collect()
    )
    expected: dict = {}
    for r in rows:
        if r.event_id % 5 != 0:
            continue
        c = math.floor(r.value * 100)
        a = expected.setdefault(r.event_type, [0, 0, None, None])
        a[0] += 1
        a[1] += c
        a[2] = r.event_id if a[2] is None else min(a[2], r.event_id)
        a[3] = r.event_id if a[3] is None else max(a[3], r.event_id)
    got = {
        r.event_type: [r.n, r.cents_sum, r.min_id, r.max_id]
        for r in GRADUATED["avro_codec_roundtrip_batch"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected

    # independent byte-level check of the encoder on one record
    from sparkksqldbbenchmark_spark.plans.round12_queries import (
        _AVRO_EV_SCHEMA,
    )
    from sparkksqldbbenchmark_spark.sources.avro_codec import (
        encode_record,
    )

    wire = encode_record(
        _AVRO_EV_SCHEMA
        if isinstance(_AVRO_EV_SCHEMA, str)
        else _AVRO_EV_SCHEMA,
        {"event_id": 150, "event_type": "click", "cents": -3},
    )

    def read_varint(b, p):
        shift = acc = 0
        while True:
            byte = b[p]
            p += 1
            acc |= (byte & 0x7F) << shift
            shift += 7
            if not byte & 0x80:
                return (acc >> 1) ^ -(acc & 1), p
        raise AssertionError

    v, p = read_varint(wire, 0)
    assert v == 150
    slen, p = read_varint(wire, p)
    assert wire[p:p + slen].decode() == "click"
    p += slen
    v, p = read_varint(wire, p)
    assert v == -3 and p == len(wire)


def test_interval_overlap_matches_quadratic_scan(spark):
    from datetime import timedelta

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "event_type", "ts")
        .collect()
    )
    a = [
        (r.event_type, r.ts,
         r.ts + timedelta(seconds=(r.event_id % 7 + 1) * 600))
        for r in rows
        if r.event_id % 101 == 0
    ]
    b = [
        (r.ts, r.ts + timedelta(seconds=(r.event_id % 5 + 1) * 900))
        for r in rows
        if r.event_id % 103 == 0
    ]
    expected: dict = {}
    for t, alo, ahi in a:
        for blo, bhi in b:
            if alo < bhi and blo < ahi:
                td = min(ahi, bhi) - max(alo, blo)
                ov = (
                    td.days * 86_400_000_000
                    + td.seconds * 1_000_000
                    + td.microseconds
                )
                e = expected.setdefault(t, [0, 0, 0])
                e[0] += 1
                e[1] += ov
                e[2] = max(e[2], ov)
    got = {
        r.event_type: [r.n_pairs, r.total_overlap_us,
                       r.max_overlap_us]
        for r in GRADUATED["interval_overlap_join_buckets"](
            spark, SF_DIR
        ).collect()
    }
    assert got == {t: v for t, v in expected.items()}


def test_time_to_convert_matches_per_user_scan(spark):
    rows = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    fc: dict = {}
    for r in rows:
        if r.event_type == "click":
            fc[r.user_id] = min(fc.get(r.user_id, r.ts), r.ts)
    fs: dict = {}
    for r in rows:
        if (
            r.event_type == "signup"
            and r.user_id in fc
            and r.ts > fc[r.user_id]
        ):
            fs[r.user_id] = min(fs.get(r.user_id, r.ts), r.ts)
    expected: dict = {}
    for u, s in fs.items():
        td = s - fc[u]
        d = (
            td.days * 86_400_000_000
            + td.seconds * 1_000_000
            + td.microseconds
        )
        b = max(d, 1).bit_length()
        a = expected.setdefault(b, [0, 0, None, None])
        a[0] += 1
        a[1] += d
        a[2] = d if a[2] is None else min(a[2], d)
        a[3] = d if a[3] is None else max(a[3], d)
    expected = {b: tuple(a) for b, a in expected.items()}
    got = {
        r.delta_bucket: (r.n_users, r.total_us, r.min_us, r.max_us)
        for r in GRADUATED["time_to_convert_dyadic"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected


def test_neyman_allocation_matches_integer_replay(spark):
    import math
    from collections import defaultdict

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", "value")
        .collect()
    )
    s: dict = defaultdict(lambda: [0, 0, 0])
    for r in rows:
        c = math.floor(r.value * 100)
        a = s[r.event_type]
        a[0] += 1
        a[1] += c
        a[2] += c * c
    strata = {
        t: (n, n * sq - sm * sm) for t, (n, sm, sq) in s.items()
    }
    w = {t: math.isqrt(v) for t, (_, v) in strata.items()}
    # isqrt == floor(sqrt) exactly for these magnitudes
    tw = sum(w.values())
    base = {t: (w[t] * 1000) // tw for t in w}
    rem = {t: (w[t] * 1000) % tw for t in w}
    extras = 1000 - sum(base.values())
    ranked = sorted(w, key=lambda t: (-rem[t], t))
    alloc = {
        t: base[t] + (1 if i < extras else 0)
        for i, t in enumerate(ranked)
    }
    expected = {
        t: (strata[t][0], strata[t][1], w[t], alloc[t]) for t in w
    }
    got = {
        r.event_type: (r.n_h, r.var_num, r.w, r.alloc)
        for r in GRADUATED["neyman_allocation_plan"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected
    assert sum(a for *_, a in got.values()) == 1000


def test_sliding_distinct_matches_per_hour_scan(spark):
    from datetime import timedelta

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts")
        .collect()
    )
    pairs = {
        (r.user_id, r.ts.replace(minute=0, second=0, microsecond=0))
        for r in rows
    }
    hours = sorted({h for _, h in pairs})
    expected = {}
    for th in hours:
        lo = th - timedelta(hours=24)
        expected[th.strftime("%Y-%m-%d %H:%M:%S")] = len(
            {u for u, h in pairs if lo < h <= th}
        )
    got = {
        r.hour: r.distinct_users_24h
        for r in GRADUATED["rolling_24h_sliding_distinct"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected


def test_dq_audit_matches_counter_scan(spark):
    rows = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "value", "ts")
        .collect()
    )
    import datetime

    n = len(rows)
    nulls = sum(1 for r in rows if r.value is None)
    oob = sum(
        1 for r in rows
        if r.value is not None and (r.value < 0 or r.value > 1000)
    )
    dups = n - len({r.event_id for r in rows})
    stale = sum(
        1 for r in rows if r.ts < datetime.datetime(2020, 1, 1)
    )
    orders = {
        r.o_orderkey
        for r in load_table(spark, SF_DIR, "orders")
        .select("o_orderkey")
        .collect()
    }
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey")
        .collect()
    )
    orphans = sum(1 for r in li if r.l_orderkey not in orders)
    expected = {
        "value_not_null": (nulls, n),
        "value_in_range": (oob, n),
        "event_id_unique": (dups, n),
        "lineitem_order_fk": (orphans, len(li)),
        "ts_sane_lower_bound": (stale, n),
    }
    got = {
        r.check_name: (r.n_violations, r.n_checked)
        for r in GRADUATED["dq_expectation_audit"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_label_weights_match_counter(spark):
    from collections import Counter

    labels = Counter(
        r.label
        for r in load_table(spark, SF_DIR, "embeddings")
        .select("label")
        .collect()
    )
    total, k = sum(labels.values()), len(labels)
    expected = {
        lb: (
            n,
            (n * 1_000_000) // total,
            (total * 1_000_000) // (n * k),
        )
        for lb, n in labels.items()
    }
    got = {
        r.label: (r.n, r.share_e6, r.weight_e6)
        for r in GRADUATED["label_inverse_frequency_weights"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected


def test_datetime_constructors_hold_on_every_row(spark):
    got = {
        r.event_type: (r.date_roundtrip_ok, r.ts_roundtrip_ok)
        for r in GRADUATED["datetime_constructor_suite"](
            spark, SF_DIR
        ).collect()
    }
    assert got and all(v == (True, True) for v in got.values())


def test_affinity_cosine_matches_set_intersection(spark):
    import math
    from collections import defaultdict

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", "user_id")
        .collect()
    )
    users: dict = defaultdict(set)
    for r in rows:
        users[r.event_type].add(r.user_id)
    types = sorted(users)
    expected = {}
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            common = len(users[a] & users[b])
            expected[(a, b)] = (
                len(users[a]),
                len(users[b]),
                common,
                math.floor(
                    common
                    * 1000000.0
                    / math.sqrt(float(len(users[a]) * len(users[b])))
                ),
            )
    got = {
        (r.type_a, r.type_b): (r.n_a, r.n_b, r.n_common, r.cosine_e6)
        for r in GRADUATED["event_type_affinity_cosine"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected


def test_in_session_conversion_matches_greedy_sessionizer(spark):
    from collections import defaultdict
    from datetime import timedelta

    rows = sorted(
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    sessions: dict = defaultdict(list)
    last: dict = {}
    for r in rows:
        if (
            r.user_id not in last
            or r.ts - last[r.user_id] > timedelta(minutes=30)
        ):
            sessions[r.user_id].append([])
        sessions[r.user_id][-1].append((r.ts, r.event_type))
        last[r.user_id] = r.ts
    agg: dict = defaultdict(lambda: [0, 0, 0])
    for u, sess in sessions.items():
        for s in sess:
            clicks = [t for t, e in s if e == "click"]
            signups = [t for t, e in s if e == "signup"]
            a = agg[u % 10]
            a[0] += 1
            if clicks:
                a[1] += 1
                if signups and max(signups) > min(clicks):
                    a[2] += 1
    expected = {
        b: (n, c, v, (v * 1_000_000) // max(c, 1))
        for b, (n, c, v) in agg.items()
    }
    got = {
        r.user_bucket: (
            r.n_sessions,
            r.n_with_click,
            r.n_converted,
            r.conv_rate_e6,
        )
        for r in GRADUATED["in_session_conversion_rate"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected


def test_labelprop_matches_synchronized_replay(spark):
    """Two synchronized frequency-max iterations replayed with plain
    Python dicts over the same LSH pair list."""
    from collections import Counter, defaultdict

    from sparkksqldbbenchmark_spark.llm.dedup import lsh_banded_buckets
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents")
    _, buckets = lsh_banded_buckets(docs, "text", "doc_id")
    a = buckets.select(F.col("doc_id").alias("u"), "band_idx", "bh")
    b = buckets.select(F.col("doc_id").alias("v"), "band_idx", "bh")
    pairs = {
        (r.u, r.v)
        for r in a.join(b, ["band_idx", "bh"])
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .collect()
    }
    adj: dict = defaultdict(set)
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    labels = {n: n for n in adj}
    for _ in range(2):
        new = {}
        for n, neigh in adj.items():
            cnt = Counter(labels[m] for m in neigh)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new
    expected: dict = {}
    for n, lbl in labels.items():
        e = expected.setdefault(lbl, [0, None, None])
        e[0] += 1
        e[1] = n if e[1] is None else min(e[1], n)
        e[2] = n if e[2] is None else max(e[2], n)
    expected = {k: tuple(v) for k, v in expected.items()}
    got = {
        r.community: (r.n_members, r.min_doc_id, r.max_doc_id)
        for r in GRADUATED["labelprop_communities_2iter"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected


def test_blocklist_scan_matches_str_count(spark):
    from collections import defaultdict

    from sparkksqldbbenchmark_spark.plans.round12_queries import _BLOCKLIST

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("source", "text")
        .collect()
    )
    agg: dict = defaultdict(lambda: [0, 0, 0, 0])
    for r in docs:
        h = sum(r.text.count(t) for t in _BLOCKLIST)
        a = agg[r.source]
        a[0] += 1
        a[1] += h >= 5
        a[2] += h
        a[3] = max(a[3], h)
    expected = {s: tuple(v) for s, v in agg.items()}
    got = {
        r.source: (r.n_docs, r.n_flagged, r.total_hits, r.max_hits)
        for r in GRADUATED["blocklist_term_scan"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_split_leakage_matches_pair_label_replay(spark):
    """Pair labels replayed over the detector's own pair list with an
    independently-computed md5 split bucket per doc."""
    import hashlib
    from collections import defaultdict

    from sparkksqldbbenchmark_spark.llm.dedup import minhash_lsh_pairs

    docs = load_table(spark, SF_DIR, "documents")
    pairs = [
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, "text", "doc_id").collect()
    ]

    def split(doc_id: int) -> str:
        h = hashlib.md5(f"split-v1:{doc_id}".encode()).hexdigest()
        b = int(h[:15], 16) % 100
        return "train" if b < 80 else "val" if b < 90 else "test"

    agg: dict = defaultdict(lambda: [0, 0])
    for a, b in pairs:
        sa, sb = split(a), split(b)
        cell = (min(sa, sb), max(sa, sb))
        agg[cell][0] += 1
        agg[cell][1] += sa != sb
    expected = {k: tuple(v) for k, v in agg.items()}
    got = {
        (r.split_a, r.split_b): (r.n_pairs, r.n_leaking)
        for r in GRADUATED["split_leakage_near_dup_audit"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected


def test_lorenz_deciles_match_sorted_replay(spark):
    from collections import Counter, defaultdict

    rows = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", "user_id")
        .collect()
    )
    per: dict = defaultdict(Counter)
    for r in rows:
        per[r.event_type][r.user_id] += 1
    expected: dict = {}
    for t, cnt in per.items():
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        n_users, total = len(ranked), sum(cnt.values())
        for rk, (_, n) in enumerate(ranked, start=1):
            d = ((rk - 1) * 10) // n_users
            e = expected.setdefault((t, d), [0, 0])
            e[0] += 1
            e[1] += n
        for d in range(10):
            if (t, d) in expected:
                e = expected[(t, d)]
                if len(e) == 2:
                    e.append((e[1] * 1_000_000) // total)
    expected = {k: tuple(v) for k, v in expected.items()}
    got = {
        (r.event_type, r.decile): (
            r.n_users_in_decile,
            r.n_events,
            r.share_e6,
        )
        for r in GRADUATED["lorenz_concentration_deciles"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected
    # the PER-USER average is non-increasing along the curve (raw
    # decile shares need not be: deciles carry unequal user counts
    # when n_users % 10 != 0) — compare as exact cross-products
    for t in {k[0] for k in got}:
        cells = [got[(t, d)] for d in range(10) if (t, d) in got]
        for (u1, e1, _), (u2, e2, _) in zip(cells, cells[1:]):
            assert e1 * u2 >= e2 * u1


def test_periodicity_detector_exact_on_planted(spark):
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    from collections import defaultdict

    agg: dict = defaultdict(lambda: [0, 0, 0])
    for r in docs:
        if len(r.text) < 96:
            continue
        probe = (
            r.text[:24] * 4 if r.doc_id % 10 == 0 else r.text[:96]
        )
        shift = (probe + probe).find(probe, 1)
        a = agg[r.source]
        a[0] += 1
        a[1] += 0 < shift < 96
        a[2] += r.doc_id % 10 == 0
    expected = {s: tuple(v) for s, v in agg.items()}
    got = {
        r.source: (r.n_docs, r.n_periodic, r.n_planted)
        for r in GRADUATED["periodicity_detector_planted"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected
    # every planted doc must be detected
    assert all(v[1] >= v[2] for v in got.values())


def test_aho_corasick_automaton_classic_cases():
    """The textbook he/she/his/hers case plus overlap and repeat
    patterns, counted by hand — no Spark involved."""
    from sparkksqldbbenchmark_spark.llm.blocklist import (
        build_automaton,
        count_hits,
    )

    a = build_automaton(["he", "she", "his", "hers"])
    # "ushers": she, he, hers
    assert count_hits("ushers", a) == 3
    assert count_hits("his hers she he", a) == 6
    assert count_hits("", a) == 0
    assert count_hits("xyz", a) == 0
    # different needles overlapping in the text each count
    b = build_automaton(["ab", "ba"])
    assert count_hits("ababa", b) == 4
    # a needle occurring at consecutive positions
    c = build_automaton(["aa"])
    assert count_hits("aaaa", c) == 3


def test_aho_corasick_stage_matches_exact_twin(spark):
    """The mapInPandas automaton stage equals the exact SQL twin row
    for row, and a pure-Python str-scan third witness agrees (for the
    graded borderless needles, all-occurrence == non-overlapping)."""
    exact = {
        r.source: (r.n_docs, r.n_flagged, r.total_hits, r.max_hits)
        for r in GRADUATED["blocklist_term_scan"](spark, SF_DIR).collect()
    }
    ac = {
        r.source: (r.n_docs, r.n_flagged, r.total_hits, r.max_hits)
        for r in GRADUATED["blocklist_aho_corasick_stage"](
            spark, SF_DIR
        ).collect()
    }
    assert ac == exact


def test_schedule_manifest_matches_hash_replay(spark):
    import hashlib
    from collections import defaultdict

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("source", "doc_id", "n_chars")
        .collect()
    )
    per: dict = defaultdict(lambda: [0, 0])
    by_src: dict = defaultdict(list)
    for r in docs:
        per[r.source][0] += r.n_chars
        per[r.source][1] += 1
        by_src[r.source].append((r.doc_id, r.n_chars))
    expected = {}
    for s, (t, n) in per.items():
        w = int(s[3:]) % 4 + 1
        a = (w * t) // 2
        full, frac = a // t, a % t
        for e in range(1, full + 1):
            expected[(s, e)] = (n, t)
        if frac > 0:
            e = full + 1
            kept = [
                (d, c)
                for d, c in by_src[s]
                if int(
                    hashlib.md5(f"ep#{e}#{d}".encode()).hexdigest()[
                        :15
                    ],
                    16,
                )
                % t
                < frac
            ]
            expected[(s, e)] = (
                len(kept),
                sum(c for _, c in kept),
            )
    got = {
        (r.source, r.epoch): (r.n_docs_kept, r.chars_kept)
        for r in GRADUATED["mixture_schedule_manifest"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected
    # fractional epochs keep roughly their token share (hash law of
    # large numbers at 25 docs/source is loose — just assert bounds)
    for (s, e), (nk, ck) in got.items():
        t, n = per[s]
        assert 0 <= nk <= n and 0 <= ck <= t


def test_lang_id_confusion_matches_python_replay(spark):
    """The confusion matrix replayed in pure Python over the collected
    corpus — tokenizer (\\S+ runs), per-language stopword hits, the CJK
    override, and the exact argmax TIE RULE (en>de>fr>es when-chain,
    und on zero hits) re-derived with none of the SQL machinery."""
    import re

    from sparkksqldbbenchmark_spark.llm.text import STOPWORDS

    rows = load_table(spark, SF_DIR, "documents").select(
        "lang", "text"
    ).collect()
    expected: dict[tuple[str, str], int] = {}
    order = ("en", "de", "fr", "es")
    stop = {lg: set(ws) for lg, ws in STOPWORDS.items()}
    for r in rows:
        toks = re.findall(r"\S+", r.text)
        hits = {
            lg: sum(1 for t in toks if t.lower() in stop[lg])
            for lg in order
        }
        best = max(hits.values())
        if re.search(r"[一-鿿]", r.text):
            pred = "zh"
        elif best == 0:
            pred = "und"
        else:
            pred = next(lg for lg in order if hits[lg] == best)
        expected[(r.lang, pred)] = expected.get((r.lang, pred), 0) + 1
    got = {
        (r.lang, r.predicted_lang): (r.n, r.is_correct)
        for r in GRADUATED["lang_id_confusion_matrix"](
            spark, SF_DIR
        ).collect()
    }
    assert got == {
        (lang, pred): (n, lang == pred)
        for (lang, pred), n in expected.items()
    }


def test_embedding_norm_hof_vs_explode_matches_python_replay(spark):
    """The HOF-fold squared norms re-derived per vector in plain Python
    (floor(x*1000)^2 summed over components — exact int arithmetic on
    the same IEEE doubles), grouped by label; and the in-query
    fold-vs-explode pin must report True for every label."""
    import math

    rows = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    expected: dict[str, list[int]] = {}
    for r in rows:
        n2 = sum(
            math.floor(float(x) * 1000) ** 2 for x in r.embedding
        )
        agg = expected.setdefault(r.label, [0, 0])
        agg[0] += 1
        agg[1] += n2
    got = {
        r.label: (r.n_vecs, r.total_norm2, r.hof_matches_explode)
        for r in GRADUATED["embedding_norm_hof_vs_explode"](
            spark, SF_DIR
        ).collect()
    }
    assert got == {
        lbl: (n, tot, True) for lbl, (n, tot) in expected.items()
    }
