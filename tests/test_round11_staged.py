"""Invariant tests for the round-11 cohort (graduated round 12 into
plans/round11_queries.py), beyond the value-hash oracle: each operator's
result is re-derived by an INDEPENDENT brute-force twin in plain Python
over the collected slice — a second witness with none of the SQL
machinery shared, the same pattern every graduated cohort carries.
Every row of the cohort graduated by round 13 (ohlc_hourly_bars and
id_sequence_gap_audit via plans/round12_queries.py), so all witnesses
read the graduated registry.
"""

from __future__ import annotations

import sparkksqldbbenchmark_spark.plans.round11_queries  # noqa: F401
import sparkksqldbbenchmark_spark.plans.round12_queries  # noqa: F401
from sparkksqldbbenchmark_spark.plans.registry import QUERIES as GRADUATED

SF_DIR = "/root/testdata/sf0.001"


def test_pca_power_iteration_matches_numpy_integer_replay(spark):
    """The 3-step quantized power iteration re-run in numpy int64 with
    the identical op sequence must give bit-equal v3 (every step is
    exact integers or correctly-rounded IEEE ops)."""
    import math

    import numpy as np

    from sparkksqldbbenchmark_spark.catalog import load_table

    got = {
        r.j: r.v_e6
        for r in GRADUATED["pca_power_iteration_1d"](spark, SF_DIR).collect()
    }
    rows = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    X = np.array(
        [
            [math.floor(float(x) * 1000) for x in r.embedding]
            for r in sorted(rows, key=lambda r: r.vec_id)
        ],
        dtype=np.int64,
    )
    d = X.shape[1]
    v = np.full(d, 1_000_000, dtype=np.int64)
    for _ in range(3):
        s = X @ v  # exact int64
        w = X.T @ s  # exact int64
        wq = np.floor(w.astype(np.float64) / 1e9).astype(np.int64)
        nrm = math.sqrt(float((wq * wq).sum()))
        v = np.floor(wq.astype(np.float64) * 1e6 / nrm).astype(np.int64)
    assert got == {j: int(v[j]) for j in range(d)}


def test_semdedup_prune_matches_bruteforce(spark):
    """Assignment (argmax exact dot, tie→lowest cid) and the 150k-dot
    prune replayed in pure Python; per-cluster kept/pruned must agree."""
    import math

    from sparkksqldbbenchmark_spark.catalog import load_table

    got = {
        r.cluster_id: (r.cluster_size, r.n_pruned, r.n_kept)
        for r in GRADUATED["semdedup_quantized_prune"](
            spark, SF_DIR
        ).collect()
    }
    rows = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    q = {
        r.vec_id: [math.floor(float(x) * 100) for x in r.embedding]
        for r in rows
    }
    cents = {cid: q[cid] for cid in q if cid < 8}
    assign: dict = {}
    for vid, vec in q.items():
        best = max(
            cents,
            key=lambda c: (
                sum(a * b for a, b in zip(vec, cents[c])),
                -c,
            ),
        )
        assign.setdefault(best, []).append(vid)
    expected: dict = {}
    for cid, members in assign.items():
        members.sort()
        pruned = set()
        for i, keep in enumerate(members):
            for pr in members[i + 1 :]:
                dot = sum(a * b for a, b in zip(q[keep], q[pr]))
                if dot > 150_000:
                    pruned.add(pr)
        expected[cid] = (
            len(members),
            len(pruned),
            len(members) - len(pruned),
        )
    assert got == expected


def test_triangle_count_matches_bruteforce(spark):
    """Triangles per node re-counted from the edge set with plain
    Python set intersections."""
    from sparkksqldbbenchmark_spark.catalog import load_table
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
    adj: dict = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    # enumerate each triangle once as an ordered triple u < v < w,
    # crediting all three corners
    tri = {n: 0 for n in adj}
    for u, v in pairs:
        for w in adj[u] & adj[v]:
            if w > v:
                tri[u] += 1
                tri[v] += 1
                tri[w] += 1
    got = {
        r.doc_id: (r.degree, r.n_triangles)
        for r in GRADUATED["dupgraph_triangle_count"](spark, SF_DIR).collect()
    }
    expected = {n: (len(adj[n]), tri[n]) for n in adj}
    assert got == expected


def test_session_dynamic_gap_matches_interval_union(spark):
    """Sessions replayed as a pure-Python interval-union sweep: same
    session count, same (start, end, n, cents) multiset per user."""
    from sparkksqldbbenchmark_spark.catalog import load_table

    rows = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_type", "value", "event_id"
    ).collect()
    by_user: dict = {}
    for r in rows:
        t = int(r.ts.timestamp() * 1_000_000)
        gap = 1800 if r.event_type == "error" else 600
        by_user.setdefault(r.user_id, []).append(
            (t, t + gap * 1_000_000)
        )
    expected: dict = {}
    for uid, ivs in by_user.items():
        ivs.sort()
        sessions = []
        cur = None
        for t, te in ivs:
            if cur is None or t >= cur[1]:
                cur = [t, te, 0]
                sessions.append(cur)
            else:
                cur[1] = max(cur[1], te)
            cur[2] += 1
        expected[uid] = sorted((s[0], s[1], s[2]) for s in sessions)
    got_rows = GRADUATED["session_window_dynamic_gap"](
        spark, SF_DIR
    ).collect()
    got: dict = {}
    for r in got_rows:
        got.setdefault(r.user_id, []).append((r.session_start, r.session_end, r.n_events))
    import datetime as dt

    for uid, sess in expected.items():
        g = sorted(got[uid])
        assert len(g) == len(sess), uid
        for (gs, ge, gn), (es, ee, en) in zip(g, sess):
            fmt = "%Y-%m-%d %H:%M:%S"
            assert gs == dt.datetime.fromtimestamp(
                es / 1e6, dt.timezone.utc
            ).strftime(fmt), uid
            assert ge == dt.datetime.fromtimestamp(
                ee / 1e6, dt.timezone.utc
            ).strftime(fmt), uid
            assert gn == en, uid


def test_udtf_run_stats_matches_sequential_replay(spark):
    from sparkksqldbbenchmark_spark.catalog import load_table

    got = {
        r.event_type: (r.longest_inc_run, r.n_rows, r.n_increases)
        for r in GRADUATED["udtf_table_arg_partition_by"](
            spark, SF_DIR
        ).collect()
    }
    rows = load_table(spark, SF_DIR, "events").select(
        "event_type", "ts", "event_id", "value"
    ).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(
            (r.ts, r.event_id, r.value)
        )
    for et, rs in by_type.items():
        rs.sort(key=lambda t: (t[0], t[1]))
        best = cur = inc = 0
        prev = None
        for _, _, v in rs:
            if prev is not None and v > prev:
                cur += 1
                inc += 1
            else:
                cur = 1
            best = max(best, cur)
            prev = v
        assert got[et] == (best, len(rs), inc), et


def test_asof_nearest_matches_bruteforce(spark):
    from sparkksqldbbenchmark_spark.catalog import load_table

    got = {
        r.event_id: (r.side, r.nearest_cents, r.delta_us)
        for r in GRADUATED["asof_nearest_join"](spark, SF_DIR).collect()
    }
    rows = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "value"
    ).collect()
    import math

    refs: dict = {}
    for r in rows:
        if r.event_id % 100 == 0:
            refs.setdefault(r.user_id, []).append(
                (
                    int(r.ts.timestamp() * 1_000_000),
                    math.floor(r.value * 100),
                )
            )
    for v in refs.values():
        v.sort()
    for r in rows:
        if r.event_id % 100 == 0 or r.event_id >= 20000:
            continue
        t = int(r.ts.timestamp() * 1_000_000)
        cands = refs.get(r.user_id, [])
        back = max((c for c in cands if c[0] <= t), default=None)
        fwd = min((c for c in cands if c[0] >= t), default=None)
        if back and (not fwd or t - back[0] <= fwd[0] - t):
            exp = ("back", back[1], t - back[0])
        elif fwd:
            exp = ("fwd", fwd[1], fwd[0] - t)
        else:
            # user has no reference readings: left-join semantics keep
            # the row with null payload (side defaults to 'fwd')
            exp = ("fwd", None, None)
        assert got[r.event_id] == exp, r.event_id


def test_mad_outliers_match_statistics_module(spark):
    """Nearest-rank median/MAD replayed with plain sorted lists."""
    import math

    from sparkksqldbbenchmark_spark.catalog import load_table

    got = {
        r.event_type: (r.median_cents, r.mad_cents, r.n, r.n_outliers)
        for r in GRADUATED["mad_robust_outliers"](spark, SF_DIR).collect()
    }
    rows = load_table(spark, SF_DIR, "events").select(
        "event_type", "value"
    ).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(
            math.floor(r.value * 100)
        )

    def nr_median(xs):
        xs = sorted(xs)
        return xs[(len(xs) + 1) // 2 - 1]

    for et, xs in by_type.items():
        med = nr_median(xs)
        devs = [abs(x - med) for x in xs]
        mad = nr_median(devs)
        outl = sum(1 for d in devs if d > 3 * mad)
        assert got[et] == (med, mad, len(xs), outl), et


def test_bpe_pairs_match_counter(spark):
    from collections import Counter

    from sparkksqldbbenchmark_spark.catalog import load_table

    got = [
        (r.pair, r.n)
        for r in GRADUATED["bpe_pair_merge_candidates"](
            spark, SF_DIR
        ).collect()
    ]
    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    c: Counter = Counter()
    for d in docs:
        for tok in d.text.split(" "):
            for i in range(len(tok) - 1):
                c[tok[i : i + 2]] += 1
    expected = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == expected


def test_novelty_growth_matches_set_replay(spark):
    from sparkksqldbbenchmark_spark.catalog import load_table

    got = {
        r.bucket: (r.new_trigrams, r.vocab_size)
        for r in GRADUATED["ngram_novelty_growth"](spark, SF_DIR).collect()
    }
    docs = sorted(
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .collect(),
        key=lambda r: r.doc_id,
    )
    firsts: dict = {}
    for d in docs:
        toks = d.text.split(" ")
        for i in range(len(toks) - 2):
            tri = " ".join(toks[i : i + 3])
            if tri not in firsts:
                firsts[tri] = d.doc_id
    buckets: dict = {}
    for tri, did in firsts.items():
        buckets[did // 100] = buckets.get(did // 100, 0) + 1
    cum = 0
    for bk in sorted(buckets):
        cum += buckets[bk]
        assert got[bk] == (buckets[bk], cum), bk


def test_running_distinct_users_monotone_and_total(spark):
    rows = GRADUATED["running_distinct_users"](spark, SF_DIR).collect()
    from sparkksqldbbenchmark_spark.catalog import load_table

    truth = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .count()
        .collect()
    )
    totals = {r.event_type: r["count"] for r in truth}
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r.day)
        assert rs[-1].cumulative_users == totals[et], et
        cums = [r.cumulative_users for r in rs]
        assert cums == sorted(cums), et
        assert sum(r.new_users for r in rs) == totals[et], et


def test_dyadic_rank_mass_matches_counter(spark):
    from collections import Counter

    from sparkksqldbbenchmark_spark.catalog import load_table

    got = {
        r.rank_bucket: (r.n_tokens, r.mass, r.rank_lo, r.rank_hi)
        for r in GRADUATED["vocab_dyadic_rank_mass"](spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    c: Counter = Counter()
    for d in docs:
        c.update(d.text.split(" "))
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    expected: dict = {}
    for r, (_tok, n) in enumerate(ranked, start=1):
        b = r.bit_length()
        t = expected.setdefault(b, [0, 0, r, r])
        t[0] += 1
        t[1] += n
        t[3] = r
    assert got == {b: tuple(v) for b, v in expected.items()}


def test_kcore_peeling_matches_set_replay(spark):
    from sparkksqldbbenchmark_spark.catalog import load_table
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
    adj: dict = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    alive = set(adj)
    for _ in range(3):
        alive = {
            n for n in alive if len(adj[n] & alive) >= 2
        }
    got = {
        r.doc_id: (r.degree, r.in_2core_after_3_peels)
        for r in GRADUATED["kcore_dupgraph_3peel"](spark, SF_DIR).collect()
    }
    assert got == {n: (len(adj[n]), n in alive) for n in adj}


def test_kmeans_lloyd_step_matches_bruteforce(spark):
    import math

    from sparkksqldbbenchmark_spark.catalog import load_table

    got = {
        (r.cluster_id, r.j): (
            r.cluster_size,
            r.comp_sum,
            r.new_centroid_e2,
        )
        for r in GRADUATED["kmeans_lloyd_step_quantized"](
            spark, SF_DIR
        ).collect()
    }
    rows = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    q = {
        r.vec_id: [math.floor(float(x) * 100) for x in r.embedding]
        for r in rows
    }
    cents = {cid: q[cid] for cid in q if cid < 8}
    assign: dict = {}
    for vid, vec in q.items():
        best = max(
            cents,
            key=lambda c: (
                sum(a * b for a, b in zip(vec, cents[c])),
                -c,
            ),
        )
        assign.setdefault(best, []).append(vid)
    expected: dict = {}
    for cid, members in assign.items():
        for j in range(len(q[members[0]])):
            s = sum(q[m][j] for m in members)
            expected[(cid, j)] = (
                len(members),
                s,
                math.floor(float(s) * 100 / len(members)),
            )
    assert got == expected


def test_ohlc_bars_match_bruteforce(spark):
    """OHLC bars re-derived in plain Python: per (event_type, hour)
    bucket, open = cents of the (ts, event_id)-first row, close = the
    last, high/low = extremes, volume = count — none of the
    min_by/max_by aggregate machinery shared."""
    import math

    from sparkksqldbbenchmark_spark.catalog import load_table

    rows = load_table(spark, SF_DIR, "events").select(
        "event_type", "ts", "event_id", "value"
    ).collect()
    buckets: dict = {}
    for r in rows:
        h = r.ts.replace(minute=0, second=0, microsecond=0)
        buckets.setdefault(
            (r.event_type, h.strftime("%Y-%m-%d %H:%M:%S")), []
        ).append((r.ts, r.event_id, math.floor(r.value * 100)))
    expected = {}
    for key, members in buckets.items():
        members.sort(key=lambda m: (m[0], m[1]))
        cents = [m[2] for m in members]
        expected[key] = (
            cents[0],
            max(cents),
            min(cents),
            cents[-1],
            len(cents),
        )
    got = {
        (r.event_type, r.hour): (
            r.open_cents,
            r.high_cents,
            r.low_cents,
            r.close_cents,
            r.volume,
        )
        for r in GRADUATED["ohlc_hourly_bars"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_id_gap_audit_matches_sorted_scan(spark):
    """Gap ranges re-derived by sorting the surviving ids in Python and
    walking consecutive pairs — one linear scan, no windows, no
    bucketing; the two-level chunked plan must agree exactly."""
    from sparkksqldbbenchmark_spark.catalog import load_table

    ids = sorted(
        r.event_id
        for r in load_table(spark, SF_DIR, "events")
        .select("event_id")
        .collect()
        if r.event_id % 7 != 3
    )
    gaps = [
        (prev + 1, cur - 1)
        for prev, cur in zip(ids, ids[1:])
        if cur - prev > 1
    ]
    row = GRADUATED["id_sequence_gap_audit"](spark, SF_DIR).collect()[0]
    assert row.n_gaps == len(gaps)
    assert row.missing_ids == sum(hi - lo + 1 for lo, hi in gaps)
    assert row.first_gap_lo == min(lo for lo, _ in gaps)
    assert row.last_gap_hi == max(hi for _, hi in gaps)
    assert row.gap_checksum == sum(lo + hi for lo, hi in gaps)


def test_survivorship_merge_matches_unionfind_replay(spark):
    """Golden-record merge re-derived with a plain-Python union-find
    over the LSH pair list plus dict-based field rules — none of the
    iterative min-label propagation or aggregate machinery shared."""
    from sparkksqldbbenchmark_spark.catalog import load_table
    from sparkksqldbbenchmark_spark.llm.dedup import minhash_lsh_pairs

    docs = load_table(spark, SF_DIR, "documents")
    pairs = [
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, "text", "doc_id").collect()
    ]
    meta = {
        r.doc_id: (r.n_chars, r.source)
        for r in docs.select("doc_id", "n_chars", "source").collect()
    }
    parent = {d: d for d in meta}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict = {}
    for d in meta:
        comps.setdefault(find(d), []).append(d)
    # component label = min member id (find() roots at the min because
    # unions always re-parent the larger root)
    expected = {}
    for root, members in comps.items():
        chars = {m: meta[m][0] for m in members}
        longest = min(members, key=lambda m: (-chars[m], m))
        expected[root] = (
            len(members),
            min(members),
            longest,
            max(chars.values()),
            sum(chars.values()),
            "|".join(sorted({meta[m][1] for m in members})),
        )
    got = {
        r.component: (
            r.n_members,
            r.survivor_id,
            r.longest_doc_id,
            r.max_chars,
            r.total_chars,
            r.sources,
        )
        for r in GRADUATED["dedup_survivorship_merge"](
            spark, SF_DIR
        ).collect()
    }
    assert got == expected
