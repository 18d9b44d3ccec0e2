"""Invariant tests for the round-14 cohort (graduated round 15 into
plans/round14_queries.py), beyond the value-hash oracle: each operator's result
is re-derived by an INDEPENDENT brute-force twin in plain Python over
the collected slice — a second witness sharing none of the SQL
machinery, the standard every staged cohort carries. Where the staged
query uses an algebraic shortcut (the water-filling closed-form index
arithmetic, the kappa integer pair), the witness runs the DIRECT form
the shortcut replaces (unit-by-unit filling, fraction kappa).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from fractions import Fraction

from sparkksqldbbenchmark_spark.catalog import load_table
import sparkksqldbbenchmark_spark.plans.round14_queries  # noqa: F401
from sparkksqldbbenchmark_spark.plans.registry import QUERIES as STAGED

SF_DIR = "/root/testdata/sf0.001"


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_gopher_rules_match_python_walk(spark):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).collect()
    expected = {}
    for r in docs:
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
        n_words, n_sents = len(toks), len(sents)
        nd = len(set(sents))
        bigrams = Counter(
            f"{toks[i]} {toks[i + 1]}" for i in range(n_words - 1)
        )
        max_bg = max(bigrams.values()) if bigrams else 0
        n_short = sum(1 for w in toks if len(w) <= 2)
        dup = (n_sents - nd) * 1000000 // n_sents
        topbg = max_bg * 2 * 1000000 // n_words
        short = n_short * 1000000 // n_words
        expected[r.doc_id] = (
            n_words, n_sents, dup, topbg, short,
            dup < 300000 and topbg < 200000 and short < 400000,
        )
    got = {
        r.doc_id: (
            r.n_words, r.n_sentences, r.dup_sent_micros,
            r.top_bigram_micros, r.short_tok_micros, r.keep,
        )
        for r in STAGED["gopher_repetition_rules"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected
    # the composite rule must actually split the corpus
    keeps = {v[-1] for v in got.values()}
    assert keeps == {True, False}


def test_cohens_kappa_matches_fraction_arithmetic(spark):
    """Direct kappa = (po - pe) / (1 - pe) over exact Fractions vs
    the staged row's integer (num, den) pair — they must be the SAME
    rational number, not merely close."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "doc_id"
    ).collect()
    labels = defaultdict(list)
    for r in docs:
        a = _md5int(f"{r.doc_id}#a") % 3
        b = a if _md5int(f"{r.doc_id}#agree") % 4 < 3 else _md5int(
            f"{r.doc_id}#b"
        ) % 3
        labels[r.source].append((a, b))
    got = {
        r.source: (r.n_docs, r.n_agree, r.kappa_num, r.kappa_den)
        for r in STAGED["cohens_kappa_exact"](spark, SF_DIR).collect()
    }
    assert set(got) == set(labels)
    for src, pairs in labels.items():
        n = len(pairs)
        agree = sum(1 for a, b in pairs if a == b)
        ra = Counter(a for a, _ in pairs)
        cb = Counter(b for _, b in pairs)
        po = Fraction(agree, n)
        pe = Fraction(sum(ra[k] * cb[k] for k in set(ra) | set(cb)),
                      n * n)
        kappa = (po - pe) / (1 - pe)
        gn, ga, num, den = got[src]
        assert (gn, ga) == (n, agree)
        assert Fraction(num, den) == kappa, src
        # planted structure: B copies A ~3/4 of the time, so kappa
        # must be solidly positive
        assert Fraction(num, den) > Fraction(1, 2), src


def test_waterfill_matches_unit_by_unit_filling(spark):
    """The closed-form index arithmetic vs the DIRECT simulation:
    hand out the budget one level-increment at a time."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "text"
    ).collect()
    totals = defaultdict(int)
    for r in docs:
        totals[r.source] += len(r.text.split())
    budget = sum(totals.values()) // 2
    # direct water-fill: raise the common level until the next raise
    # would overshoot, then +1 the lexicographically first unsaturated
    alloc = {s: 0 for s in totals}
    level = 0
    while True:
        unsat = [s for s in totals if totals[s] > level]
        step = len(unsat)
        if step == 0 or sum(alloc.values()) + step > budget:
            break
        # raising the level by 1 gives each unsaturated source +1
        level += 1
        for s in unsat:
            alloc[s] = level
        # saturated sources hold at their totals
        for s in totals:
            if totals[s] <= level:
                alloc[s] = totals[s]
    rem = budget - sum(alloc.values())
    for s in sorted(s for s in totals if totals[s] > level)[:rem]:
        alloc[s] += 1
    got = {
        r.source: (
            r.total_tokens, r.allocated_tokens, r.saturated, r.level
        )
        for r in STAGED["waterfill_budget_allocation"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(totals)
    assert sum(a for _, a, _, _ in got.values()) == budget
    for s, (tot, a, sat, lvl) in got.items():
        assert tot == totals[s]
        assert a == alloc[s], (s, a, alloc[s])
        assert a <= tot
        if sat:
            assert a == tot  # saturated = taken whole
        else:
            assert a in (lvl, lvl + 1)  # at the level, maybe +1
    # max-min fairness: unsaturated allocations differ by at most 1
    un = [a for s, (tot, a, sat, _) in got.items() if not sat]
    if un:
        assert max(un) - min(un) <= 1


def test_two_hop_sum_matches_python_gather(spark):
    """2-hop aggregation re-walked in Python over the SAME candidate
    edge set (the LSH bucket join is graded machinery since r8; the
    new logic — degree gather and neighbor aggregation — is what the
    witness re-derives)."""
    import pyspark.sql.functions as F

    from sparkksqldbbenchmark_spark.llm.dedup import lsh_banded_buckets

    docs = load_table(spark, SF_DIR, "documents")
    _, buckets = lsh_banded_buckets(docs, "text", "doc_id")
    a = buckets.select(F.col("doc_id").alias("da"), "band_idx", "bh")
    b = buckets.select(F.col("doc_id").alias("db"), "band_idx", "bh")
    pairs = {
        (r.da, r.db)
        for r in a.join(b, ["band_idx", "bh"])
        .where(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
        .collect()
    }
    nbrs = defaultdict(set)
    for u, v in pairs:
        nbrs[u].add(v)
        nbrs[v].add(u)
    deg = {u: len(vs) for u, vs in nbrs.items()}
    expected = {
        u: (
            deg[u],
            sum(deg[v] for v in vs),
            max(deg[v] for v in vs),
        )
        for u, vs in nbrs.items()
    }
    got = {
        r.doc_id: (
            r.degree, r.two_hop_degree_sum, r.max_neighbor_degree
        )
        for r in STAGED["graph_2hop_degree_sum"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected
    assert expected, "fixture must contain at least one dup edge"


def test_retention_plan_matches_python_walk(spark):
    import datetime

    rows = load_table(spark, SF_DIR, "events").select(
        "event_type", "ts"
    ).collect()
    now = max(r.ts for r in rows)
    ttl = {"click": 30, "view": 7, "error": 14}
    per = defaultdict(lambda: [0, 0, None])  # n, n_expired, max_over
    for r in rows:
        t = ttl.get(r.event_type, 90)
        st = per[(r.event_type, t)]
        st[0] += 1
        if r.ts < now - datetime.timedelta(days=t):
            st[1] += 1
            over = (
                now.date() - r.ts.date()
            ).days - t
            st[2] = over if st[2] is None else max(st[2], over)
    expected = {
        et: (t, n, ne, ne * 1000000 // n, mo)
        for (et, t), (n, ne, mo) in per.items()
    }
    got = {
        r.event_type: (
            r.ttl_days, r.n_rows, r.n_expired,
            r.expired_micros, r.max_days_overdue,
        )
        for r in STAGED["data_retention_expiry_plan"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected
    # the 30-day window vs 7-day TTL means views MUST have expiries
    assert got["view"][2] > 0


def test_bloom_decontam_matches_python_bitset_replay(spark):
    m, k = 4096, 3

    def shingles(text):
        toks = text.split()
        n = max(len(toks) - 2, 1)
        return {" ".join(toks[i:i + 3]) for i in range(n)}

    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "doc_id", "text"
    ).collect()
    train, test = [], []
    for r in docs:
        (train if _md5int(str(r.doc_id)) % 2 == 0 else test).append(r)
    train_sh = set()
    for r in train:
        train_sh |= shingles(r.text)
    bloom = 0
    for sh in train_sh:
        for j in range(k):
            bloom |= 1 << (_md5int(f"{j}#{sh}") % m)
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0, 0, 0])
    for r in test:
        shs = shingles(r.text)
        nb = ne = nfp = nfn = 0
        for sh in shs:
            hit = all(
                bloom >> (_md5int(f"{j}#{sh}") % m) & 1
                for j in range(k)
            )
            ex = sh in train_sh
            nb += hit
            ne += ex
            nfp += hit and not ex
            nfn += ex and not hit
        a = agg[r.source]
        a[0] += 1
        a[1] += len(shs)
        a[2] += nb
        a[3] += ne
        a[4] += nfp
        a[5] += nfn
        a[6] += ne > 0
        a[7] += nb > 0
    expected = {s: tuple(v) for s, v in agg.items()}
    got = {
        r.source: (
            r.n_test_docs, r.n_shingles_probed, r.n_bloom_hits,
            r.n_exact_hits, r.n_false_positives,
            r.n_false_negatives, r.n_docs_contaminated,
            r.n_docs_flagged,
        )
        for r in STAGED["decontam_bloom_prefilter_certified"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected
    assert sum(v[5] for v in got.values()) == 0, "Bloom FN must be 0"
    assert sum(v[3] for v in got.values()) > 0, (
        "fixture must contain real contamination"
    )

def test_bbit_minwise_matches_python_bit_replay(spark):
    """The 1-bit agreement and the Jaccard re-derived in plain
    Python: shingles by hand, the SAME affine minhash family
    replayed with hashlib, bits compared directly."""
    from sparkksqldbbenchmark_spark.llm.hashing import _BMUL as BMUL
    from sparkksqldbbenchmark_spark.llm.hashing import _P31 as P31

    k = 64

    def mh(shs, kk):
        hs = [_md5int(s) & P31 for s in shs]
        return [
            min(((2 * j + 1) * h + (j * BMUL) % P31) % P31 for h in hs)
            for j in range(kk)
        ]

    def shingles(text):
        toks = text.split()
        n = max(len(toks) - 2, 1)
        return {" ".join(toks[i:i + 3]) for i in range(n)}

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_DIR, "documents").select(
            "doc_id", "text"
        ).collect()
    }
    got = {
        (r.doc_a, r.doc_b): (
            r.jaccard_micros, r.agree_bits, r.est_micros
        )
        for r in STAGED["bbit_minwise_estimate_on_candidates"](
            spark, SF_DIR
        ).collect()
    }
    assert got, "LSH must yield candidate pairs on this fixture"
    for (a, b), (jm, ab, em) in got.items():
        sa, sb = shingles(docs[a]), shingles(docs[b])
        inter = len(sa & sb)
        union = len(sa | sb)
        assert jm == inter * 1000000 // union
        siga, sigb = mh(sorted(sa), k), mh(sorted(sb), k)
        agree = sum(
            1 for x, y in zip(siga, sigb) if (x & 1) == (y & 1)
        )
        assert ab == agree, (a, b)
        assert em == max(0, (2 * agree - k) * 1000000 // k)
        # candidates are near-dups: the 1-bit estimate must point the
        # same way as the exact Jaccard for the planted pairs
        if jm >= 900000:
            assert em >= 500000, (a, b, jm, em)


def test_audio_decimation_matches_python_codec_walk(spark):
    from sparkksqldbbenchmark_spark.llm import codecs

    got = {
        r.doc_id: (
            r.n_in, r.n_out, r.sum_in, r.sum_out,
            r.first_out, r.last_out,
        )
        for r in STAGED["audio_decimate_boxcar"](
            spark, SF_DIR
        ).collect()
    }
    docs = [
        r.doc_id
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id")
        .where("doc_id < 400")
        .collect()
    ]
    assert set(got) == set(docs)
    for did in docs:
        n = did % 50 + 10
        s = [(31 * did + 17 * i) % 65536 - 32768 for i in range(n)]
        # full codec round-trip, independent of the mapInPandas path
        _, _, s2 = codecs.decode_wav(codecs.encode_wav(s))
        assert s2 == s
        dec = [(s[2 * j] + s[2 * j + 1]) // 2 for j in range(n // 2)]
        assert got[did] == (
            n, len(dec), sum(s), sum(dec), dec[0], dec[-1]
        )


def test_jl_ratio_matches_numpy_projection(spark):
    """The Rademacher projection re-derived with numpy integer
    matrices — and the JL moment identity checked in aggregate: the
    MEAN ratio over all audited pairs must sit near 1 (the per-pair
    scatter is the measured concentration, the mean is the theorem)."""
    import numpy as np

    from sparkksqldbbenchmark_spark.plans.round14_queries import _jl_signs

    S = np.array(_jl_signs(8, 64), dtype=np.int64)
    emb = {
        r.vec_id: np.array(
            [math.floor(x * 1000) for x in r.embedding],
            dtype=np.int64,
        )
        for r in load_table(spark, SF_DIR, "embeddings").select(
            "vec_id", "embedding"
        ).collect()
    }
    got = {
        (r.vec_a, r.vec_b): (r.d2_orig, r.d2_proj, r.ratio_micros)
        for r in STAGED["jl_projection_distance_certified"](
            spark, SF_DIR
        ).collect()
    }
    assert got
    ratios = []
    for (a, b), (d2o, d2p, rm) in got.items():
        qa, qb = emb[a], emb[b]
        eo = int(((qa - qb) ** 2).sum())
        ep = int(((S @ qa - S @ qb) ** 2).sum())
        assert (d2o, d2p) == (eo, ep), (a, b)
        assert rm == ep * 1000000 // (8 * eo)
        ratios.append(rm)
    mean = sum(ratios) / len(ratios)
    assert 600000 < mean < 1700000, mean

def test_sft_loss_mask_matches_python_walk(spark):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).collect()
    expected = {}
    for r in docs:
        toks = r.text.split()
        if not toks:
            continue
        lens, cur = [], 0
        for w in toks:
            cur += 1
            if _md5int(w) & 3 == 0:
                lens.append(cur)
                cur = 0
        if cur:
            lens.append(cur)
        loss = sum(L for i, L in enumerate(lens) if i % 2 == 1)
        total = sum(lens)
        expected[r.doc_id] = (
            len(lens), len(lens) // 2, loss, total - loss,
            loss * 1000000 // total,
        )
    got = {
        r.doc_id: (
            r.n_turns, r.n_assistant_turns, r.n_loss_tokens,
            r.n_masked_tokens, r.loss_frac_micros,
        )
        for r in STAGED["sft_loss_mask_plan"](spark, SF_DIR).collect()
    }
    assert got == expected
    # both roles must carry tokens somewhere in the corpus
    assert any(v[2] > 0 for v in got.values())
    assert any(v[3] > 0 for v in got.values())


def test_temporal_straddle_matches_python_sessionizer(spark):
    import datetime

    rows = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id"
    ).collect()
    boundary = min(r.ts for r in rows) + datetime.timedelta(days=21)
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, r.event_id))
    gap = datetime.timedelta(hours=12)
    per_day = defaultdict(lambda: [0, 0, 0])
    for evs in by_user.values():
        evs.sort()
        sessions = []
        for ts, _ in evs:
            if sessions and ts - sessions[-1][-1] <= gap:
                sessions[-1].append(ts)
            else:
                sessions.append([ts])
        for sess in sessions:
            day = sess[0].date()
            st = per_day[day]
            st[0] += 1
            if sess[0] < boundary <= sess[-1]:
                st[1] += 1
            if sess[0] < boundary:
                st[2] += sum(1 for t in sess if t >= boundary)
    expected = {
        d: tuple(v) for d, v in per_day.items()
    }
    got = {
        r.session_day: (
            r.n_sessions, r.n_straddling, r.leaked_events
        )
        for r in STAGED["temporal_split_straddle_audit"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected
    assert sum(v[1] for v in got.values()) > 0, (
        "fixture must contain straddling sessions"
    )

def test_curation_v2_matches_python_pipeline_walk(spark):
    """The composed pipeline re-walked end-to-end in Python: Gopher
    dup-sentence keep -> exact canonical dedup -> unit-by-unit
    water-filling over the survivors — and consistency with the
    STANDALONE gopher row's keep verdict on the dup-sentence rule."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    keep = {}
    n_words = {}
    for r in docs:
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
        dup = (len(sents) - len(set(sents))) * 1000000 // len(sents)
        keep[r.doc_id] = dup < 300000
        n_words[r.doc_id] = len(toks)
    canonical = {}
    for r in docs:
        if r.doc_id in keep and keep[r.doc_id]:
            key = hashlib.md5(r.text.encode()).hexdigest()
            canonical.setdefault(key, r.doc_id)
            canonical[key] = min(canonical[key], r.doc_id)
    survivors = set(canonical.values())
    totals = defaultdict(int)
    docs_kept = defaultdict(int)
    for r in docs:
        if r.doc_id in survivors:
            totals[r.source] += n_words[r.doc_id]
            docs_kept[r.source] += 1
    budget = sum(totals.values()) // 2
    alloc = {s: 0 for s in totals}
    level = 0
    while True:
        unsat = [s for s in totals if totals[s] > level]
        if not unsat or sum(alloc.values()) + len(unsat) > budget:
            break
        level += 1
        for s in totals:
            alloc[s] = min(totals[s], level)
    rem = budget - sum(alloc.values())
    for s in sorted(s for s in totals if totals[s] > level)[:rem]:
        alloc[s] += 1
    got = {
        r.source: (r.docs_kept, r.total_tokens, r.allocated_tokens)
        for r in STAGED["curation_pipeline_v2_composed"](
            spark, SF_DIR
        ).collect()
    }
    expected = {
        s: (docs_kept[s], totals[s], alloc[s]) for s in totals
    }
    assert got == expected
    assert sum(a for _, _, a in got.values()) == budget
    # consistency with the standalone gopher row on the shared rule
    g = {
        r.doc_id: r.dup_sent_micros
        for r in STAGED["gopher_repetition_rules"](
            spark, SF_DIR
        ).collect()
    }
    for did, k in keep.items():
        assert (g[did] < 300000) == k

def _plan(spark, name: str) -> str:
    df = STAGED[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_sft_mask_plan_has_zero_exchanges(spark):
    """The loss-mask fold's whole claim: doc-grain in, doc-grain out,
    NOTHING row-grain crosses an exchange."""
    plan = _plan(spark, "sft_loss_mask_plan")
    assert "Exchange" not in plan
    assert "CartesianProduct" not in plan


def test_jl_projection_plan_is_scan_plus_one_join(spark):
    """The Rademacher matrix is a plan literal: no per-row hashing,
    no shuffle for the projection itself — only the vec_id+1 pair
    join may exchange/broadcast."""
    plan = _plan(spark, "jl_projection_distance_certified")
    assert "CartesianProduct" not in plan
    assert "md5" not in plan.lower()
    assert plan.count("Exchange") <= 2


def test_gopher_only_exchange_is_doc_local_bigram(spark):
    """Sentence folds stay scan-side; the bigram mode is the only
    row-grain exchange and its key embeds doc_id (no cross-doc hot
    key), plus the doc-grain join-back."""
    plan = _plan(spark, "gopher_repetition_rules")
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "doc_id" in line, line


def test_waterfill_rowgrain_work_is_one_aggregate(spark):
    """Everything after the per-source aggregate runs on the
    #sources-bounded frame: no range partitioning, no sort-merge
    join of row-grain data."""
    plan = _plan(spark, "waterfill_budget_allocation")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan

def test_rendezvous_matches_python_argmax_and_theorem(spark):
    """Owners re-derived by a direct Python argmax over the same
    weights, plus the HRW minimal-disruption theorem checked from
    first principles on the raw assignment (not just the rolled-up
    counts): growing 8 -> 9 shards, every moved doc moves TO shard 8."""
    MASK = 36028797018963967
    docs = [
        r.doc_id
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id")
        .collect()
    ]

    def owner(did, n):
        return max(
            range(n),
            key=lambda s: (
                (_md5int(f"{did}#{s}") & MASK) * 16 + (15 - s)
            ),
        )

    moved_to_new = defaultdict(int)
    n_docs = defaultdict(int)
    for did in docs:
        o1, o2 = owner(did, 8), owner(did, 9)
        n_docs[o1] += 1
        if o2 != o1:
            assert o2 == 8, (did, o1, o2)  # the theorem itself
            moved_to_new[o1] += 1
    got = {
        r.shard: (r.n_docs, r.moved_to_new, r.moved_elsewhere)
        for r in STAGED["rendezvous_shard_assignment_certified"](
            spark, SF_DIR
        ).collect()
    }
    assert got == {
        s: (n_docs[s], moved_to_new[s], 0) for s in n_docs
    }
    total = sum(n_docs.values())
    moved = sum(moved_to_new.values())
    # balance: roughly 1/9 of keys move (binomial tolerance)
    assert abs(moved - total / 9) < 4 * (total / 9) ** 0.5 + 5


def test_average_precision_matches_python_rank_walk(spark):
    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "doc_id"
    ).collect()
    by_src = defaultdict(list)
    for r in docs:
        score = _md5int(f"{r.doc_id}#score")
        rel = 1 if _md5int(f"{r.doc_id}#rel") % 5 == 0 else 0
        by_src[r.source].append((score, r.doc_id, rel))
    expected = {}
    for src, rows in by_src.items():
        rows.sort(key=lambda t: (-t[0], t[1]))
        cum = 0
        num = 0
        nrel = 0
        for k, (_, _, rel) in enumerate(rows, start=1):
            cum += rel
            if rel:
                nrel += 1
                num += cum * 1000000 // k
        expected[src] = (len(rows), nrel, num, num // nrel)
    got = {
        r.source: (
            r.n_docs, r.n_relevant, r.ap_num_micros, r.ap_micros
        )
        for r in STAGED["average_precision_exact"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected
    # ~20% planted relevance at random scores means AP should sit
    # near the relevant fraction, far from 0 and from 1
    for src, (n, nrel, _, ap) in got.items():
        assert 0 < nrel < n
        assert 30000 < ap < 900000, (src, ap)

def test_macro_f1_matches_sklearn_free_python(spark):
    """Per-class F1 re-derived with plain Counters over the SAME
    planted annotator fixture the kappa row uses — and
    cross-reconciled with the kappa row's agreement count:
    sum of per-class TP == n_agree for every source."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "source", "doc_id"
    ).collect()
    cells = defaultdict(Counter)
    for r in docs:
        a = _md5int(f"{r.doc_id}#a") % 3
        b = a if _md5int(f"{r.doc_id}#agree") % 4 < 3 else _md5int(
            f"{r.doc_id}#b"
        ) % 3
        cells[r.source][(a, b)] += 1
    expected = {}
    for src, cnt in cells.items():
        for c in range(3):
            tp = cnt[(c, c)]
            fp = sum(v for (t, p), v in cnt.items()
                     if p == c and t != c)
            fn = sum(v for (t, p), v in cnt.items()
                     if t == c and p != c)
            expected[(src, c)] = (
                tp, fp, fn, 2 * tp, 2 * tp + fp + fn,
                2 * tp * 1000000 // (2 * tp + fp + fn),
            )
    got = {
        (r.source, r.cls): (
            r.tp, r.fp, r.fn, r.f1_num, r.f1_den, r.f1_micros
        )
        for r in STAGED["macro_f1_exact"](spark, SF_DIR).collect()
    }
    assert got == expected
    kappa = {
        r.source: r.n_agree
        for r in STAGED["cohens_kappa_exact"](spark, SF_DIR).collect()
    }
    for src in cells:
        assert (
            sum(got[(src, c)][0] for c in range(3)) == kappa[src]
        ), src
    # the ~3/4 copy structure keeps F1 well above chance (~1/3)
    # everywhere, and high in aggregate (small per-cell samples at
    # sf0.001 scatter individual classes down to ~0.46)
    assert all(v[5] > 400000 for v in got.values())
    mean = sum(v[5] for v in got.values()) / len(got)
    assert mean > 700000, mean
