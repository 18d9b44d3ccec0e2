"""Scale smoke: generate events at ~100× sf0.1 (10M rows, multi-file) in
scratch space and measure the core plans — the empirical "would this hold
at 1000×?" check. Expected: near-linear wall-clock in rows (the plans are
scan + partial-agg + bounded shuffles), multi-task scans (many files →
real parallelism, unlike the single-row-group TESTDATA files).

Run: python tools/scale_smoke.py [rows_millions]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.operators.windowed_agg import (
    tumbling_window_agg,
)
from sparkksqldbbenchmark_spark.session import SessionConfig, get_spark


def new_family_probes(spark, n: int, docs, docs_n: int) -> None:
    """Round-12 staged-family probes (VERDICT r12 ask #5): the
    Aho-Corasick blocklist stage (prove linear-in-text vs the
    per-term SQL twin), the split-leakage near-dup audit (LSH pair
    frame + split labels + rollup end-to-end), and the mixture
    schedule manifest (per-source plan arithmetic + one hash-predicate
    scan). `docs` is the word-salad corpus (planted dup every 1000th
    id, ~60 vocab words per doc)."""
    import time as _t

    from pyspark.sql import functions as F

    from sparkksqldbbenchmark_spark.llm.blocklist import (
        with_blocklist_hits,
    )

    vocab = ("key agg row scan slow fast table value part hash merge "
             "batch window spark order data column join small line "
             "customer query big the group sort stream filter").split()
    terms_small = ("merge", "window", "stream", "hash", "batch",
                   "filter", "spark", "query")
    # 26*26 genuinely-matchable two-word needles + the vocab = 702
    # terms: the production-size regime where the SQL twin's
    # one-codegen-expression-per-needle form stops scaling
    terms_big = tuple(
        f"{a} {b}" for a in vocab for b in vocab
    ) + tuple(vocab)

    def _auto(terms, label):
        t0 = _t.time()
        row = (
            with_blocklist_hits(docs.select("text"), terms)
            .agg(F.sum("hits").alias("h"), F.count(F.lit(1)).alias("c"))
            .collect()[0]
        )
        s = _t.time() - t0
        print(
            f"docs={docs_n:,} blocklist_aho[{label},{len(terms)} terms]"
            f"={s:.1f}s ({int(docs_n / s):,} docs/s, hits={row['h']:,})"
        )
        return s

    def _sql(terms, label):
        t0 = _t.time()
        hits = None
        for t in terms:
            th = (
                F.length("text")
                - F.length(F.replace(F.col("text"), F.lit(t)))
            ) / len(t)
            th = th.cast("long")
            hits = th if hits is None else hits + th
        row = (
            docs.select(hits.alias("hits"))
            .agg(F.sum("hits").alias("h"))
            .collect()[0]
        )
        s = _t.time() - t0
        print(
            f"docs={docs_n:,} blocklist_sql[{label},{len(terms)} terms]"
            f"={s:.1f}s ({int(docs_n / s):,} docs/s, hits={row['h']:,})"
        )
        return s

    # one unmeasured pass to pay Python-worker spin-up/JIT so the
    # small-vs-big comparison is warm on both sides
    with_blocklist_hits(
        docs.select("text").limit(50_000), terms_small
    ).agg(F.sum("hits")).collect()
    a_small = _auto(terms_small, "small")
    a_big = _auto(terms_big, "big")
    s_small = _sql(terms_small, "small")
    s_mid = _sql(terms_big[:64], "mid")
    print(
        f"docs={docs_n:,} blocklist_linearity: automaton "
        f"{len(terms_small)}->{len(terms_big)} terms "
        f"{a_big / a_small:.2f}x; sql {len(terms_small)}->64 terms "
        f"{s_mid / s_small:.2f}x "
        f"(per-term cost: automaton ~flat, sql ~linear)"
    )

    # split-leakage audit end-to-end: LSH pair frame + hash-split
    # labels + contingency rollup (pairs planted every 1000th doc)
    from sparkksqldbbenchmark_spark.llm.dedup import minhash_lsh_pairs
    from sparkksqldbbenchmark_spark.operators.sampling import hash_split

    t0 = _t.time()
    pairs = minhash_lsh_pairs(docs, "text", "doc_id").select(
        "doc_a", "doc_b"
    )
    splits = hash_split(
        docs.select("doc_id"),
        "doc_id",
        {"train": 80, "val": 90, "test": 100},
    ).select("doc_id", "split")
    labeled = (
        pairs.join(
            splits.select(
                F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
            ),
            "doc_a",
        )
        .join(
            splits.select(
                F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
            ),
            "doc_b",
        )
        .groupBy(
            F.least("sa", "sb").alias("a"), F.greatest("sa", "sb").alias("b")
        )
        .agg(
            F.count(F.lit(1)).alias("np"),
            F.sum(F.when(F.col("sa") != F.col("sb"), 1).otherwise(0)).alias(
                "nl"
            ),
        )
        .agg(F.sum("np"), F.sum("nl"))
        .collect()[0]
    )
    leak_s = _t.time() - t0
    print(
        f"docs={docs_n:,} split_leakage_audit={leak_s:.1f}s "
        f"({labeled[0]:,} pairs, {labeled[1]:,} leaking, "
        f"{int(docs_n / leak_s):,} docs/s)"
    )

    # mixture schedule manifest: per-source totals -> 20-row plan
    # arithmetic -> ONE partial-epoch scan with a scan-fused md5 keep
    # predicate (epochs multiply the plan frame, not the corpus)
    from sparkksqldbbenchmark_spark.llm.hashing import spark_md5_int

    t0 = _t.time()
    sdocs = docs.select(
        "doc_id",
        F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string")).alias(
            "source"
        ),
        F.length("text").cast("long").alias("n_chars"),
    )
    per_src = sdocs.groupBy("source").agg(
        F.sum("n_chars").alias("t"), F.count(F.lit(1)).alias("n_docs")
    ).select(
        "source", "t", "n_docs",
        (F.expr("CAST(substring(source, 4) AS BIGINT)") % 4 + 1).alias("w"),
    )
    plan = per_src.select(
        "source", "t", "n_docs", F.expr("(w * t) DIV 2").alias("a")
    ).select(
        "source", "t", "n_docs",
        F.expr("a DIV t").alias("full_epochs"),
        F.expr("a % t").alias("frac_num"),
    )
    epochs = spark.range(1, 3).select(F.col("id").alias("epoch"))
    full_rows = (
        plan.crossJoin(F.broadcast(epochs))
        .where(F.col("epoch") <= F.col("full_epochs"))
        .select("source", "epoch", F.col("n_docs").alias("kept"))
    )
    partials = plan.where(F.col("frac_num") > 0).select(
        "source",
        (F.col("full_epochs") + 1).alias("partial_epoch"),
        "t",
        "frac_num",
    )
    keep_hash = spark_md5_int(
        "concat('ep#', cast(partial_epoch as string), '#', "
        "cast(doc_id as string))"
    )
    partial_rows = (
        sdocs.join(F.broadcast(partials), "source")
        .where(F.expr(f"({keep_hash}) % t") < F.col("frac_num"))
        .groupBy("source", F.col("partial_epoch").alias("epoch"))
        .agg(F.count(F.lit(1)).alias("kept"))
        .select("source", "epoch", "kept")
    )
    manifest = full_rows.unionByName(partial_rows).agg(
        F.count(F.lit(1)).alias("rows"), F.sum("kept").alias("kept")
    ).collect()[0]
    sched_s = _t.time() - t0
    print(
        f"docs={docs_n:,} mixture_schedule={sched_s:.1f}s "
        f"({manifest['rows']} manifest rows, {manifest['kept']:,} doc-"
        f"epochs kept, {int(docs_n / sched_s):,} docs/s)"
    )


def round14_family_probes(spark, n: int) -> None:
    """Round-14 staged-shape probe (VERDICT r13 ask #5): the LSH
    band-tuning sweep (lsh_band_sensitivity_audit) — the one round-13
    graduate without a 100M-table entry. Signatures are computed once
    per banding over a planted-dup word-salad corpus (every 1000th doc
    duplicates its neighbor, the --only-new recipe); each banding adds
    only its band-bucket equi-join + Jaccard verify, both LSH-bounded.
    Run via `python tools/scale_smoke.py N --r14`."""
    import time as _t

    from pyspark.sql import functions as F

    from sparkksqldbbenchmark_spark.llm.dedup import lsh_banded_buckets

    vocab = ("key agg row scan slow fast table value part hash merge "
             "batch window spark order data column join small line "
             "customer query big the group sort stream filter").split()
    arr = "array(" + ",".join(f"'{w}'" for w in vocab) + ")"
    base_id = F.when(
        F.col("id") % 1000 == 999, F.col("id") - 1
    ).otherwise(F.col("id"))
    docs_n = max(50_000, n // 100)
    docs = spark.range(docs_n).withColumn("bid", base_id).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, 60), i -> "
            f"element_at({arr}, cast(pmod(hash(bid * 31 + i), "
            f"{len(vocab)}) + 1 as int))))"
        ).alias("text"),
    ).localCheckpoint()
    planted = docs_n // 1000
    for bands in (4, 8):
        t0 = _t.time()
        shingle_side, buckets = lsh_banded_buckets(
            docs, "text", "doc_id", num_hashes=16, bands=bands
        )
        left = buckets.select(
            F.col("doc_id").alias("doc_a"), "band_idx", "bh"
        )
        right = buckets.select(
            F.col("doc_id").alias("doc_b"), "band_idx", "bh"
        )
        cand = (
            left.join(right, ["band_idx", "bh"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .dropDuplicates(["doc_a", "doc_b"])
        )
        verified = cand.join(
            shingle_side.select(
                F.col("doc_id").alias("doc_a"),
                F.col("shingles").alias("sh_a"),
            ),
            "doc_a",
        ).join(
            shingle_side.select(
                F.col("doc_id").alias("doc_b"),
                F.col("shingles").alias("sh_b"),
            ),
            "doc_b",
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
        row = verified.agg(
            F.count(F.lit(1)).alias("nc"),
            F.sum(F.when(inter / union >= 0.5, 1).otherwise(0))
            .cast("long")
            .alias("nv"),
        ).collect()[0]
        s = _t.time() - t0
        print(
            f"docs={docs_n:,} lsh_band_sweep[b={bands},r={16 // bands}]"
            f"={s:.1f}s ({int(docs_n / s):,} docs/s, "
            f"candidates={row['nc']:,}, verified={row['nv']:,}, "
            f"planted={planted:,})"
        )

    # --- gopher repetition rules: scan-side folds + doc-local bigram ---
    from sparkksqldbbenchmark_spark.llm.hashing import (
        spark_md5_int,
        spark_tokens,
    )

    t0 = _t.time()
    toks = docs.select(
        "doc_id", F.expr(spark_tokens("text")).alias("toks")
    ).where(F.size("toks") > 0)
    pairs_e = (
        f"zip_with(toks, transform(toks, w -> "
        f"({spark_md5_int('w')} & 3) = 0), "
        f"(w, f) -> struct(w as w, f as f))"
    )
    sents_expr = (
        f"aggregate({pairs_e},"
        " struct(cast(array() as array<string>) as ss, '' as cur),"
        " (a, p) -> if(p.f,"
        "   struct(concat(a.ss, array(if(a.cur = '', p.w,"
        "          concat(a.cur, ' ', p.w)))) as ss, '' as cur),"
        "   struct(a.ss as ss, if(a.cur = '', p.w,"
        "          concat(a.cur, ' ', p.w)) as cur)),"
        " a -> if(a.cur != '', concat(a.ss, array(a.cur)), a.ss))"
    )
    per_doc = toks.select(
        "doc_id", "toks", F.expr(sents_expr).alias("sents")
    ).select(
        "doc_id",
        F.size("toks").alias("nw"),
        F.size("sents").alias("ns"),
        F.size(F.array_distinct("sents")).alias("nd"),
    )
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "case when size(toks) >= 2 then"
                " transform(sequence(1, size(toks) - 1), i ->"
                "  concat(element_at(toks, i), ' ',"
                "         element_at(toks, i + 1)))"
                " else array() end"
            )
        ).alias("bg"),
    )
    bg_max = (
        bg.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("mx"))
    )
    row = (
        per_doc.join(bg_max, "doc_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (F.col("ns") - F.col("nd")) * 1000000
                    / F.col("ns")
                    >= 300000,
                    1,
                ).otherwise(0)
            ).alias("dup_flagged"),
        )
        .collect()[0]
    )
    sgo = _t.time() - t0
    print(
        f"docs={docs_n:,} gopher_rules={sgo:.1f}s "
        f"({int(docs_n / sgo):,} docs/s, dup_flagged={row['dup_flagged']:,})"
    )

    # --- bloom decontamination probe: broadcast bitset vs test scan ---
    from sparkksqldbbenchmark_spark.llm.hashing import (
        spark_word_shingles_from_tokens,
    )

    m, k = 1 << 20, 3  # production-sized bitset: 1 Mbit is still 4 KB*32
    t0 = _t.time()
    sh_side = toks.select(
        "doc_id",
        F.expr(spark_word_shingles_from_tokens("toks", 3)).alias("shs"),
    )
    split = F.expr(f"{spark_md5_int('cast(doc_id as string)')} % 2")
    train_sh = (
        sh_side.where(split == 0)
        .select(F.explode("shs").alias("sh"))
        .distinct()
    )
    j = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    hp = (
        "("
        + spark_md5_int("concat(cast(j as string), '#', sh)")
        + f") % {m}"
    )
    bloom = (
        train_sh.select("sh", j)
        .select(F.expr(hp).alias("p"))
        .groupBy(F.expr("p DIV 32").alias("word"))
        .agg(
            F.expr("bit_or(shiftleft(1L, cast(p % 32 as int)))").alias(
                "bits"
            )
        )
    )
    test_sh = sh_side.where(split == 1).select(
        "doc_id", F.explode("shs").alias("sh")
    )
    probes = test_sh.select("doc_id", "sh", j).select(
        "doc_id", "sh", F.expr(hp).alias("p")
    )
    hits = (
        probes.join(F.broadcast(bloom), F.expr("word = p DIV 32"), "left")
        .select(
            "doc_id",
            "sh",
            F.when(
                F.col("bits").isNotNull()
                & (
                    F.expr("bits & shiftleft(1L, cast(p % 32 as int))")
                    != 0
                ),
                1,
            )
            .otherwise(0)
            .alias("hit"),
        )
        .groupBy("doc_id", "sh")
        .agg(F.when(F.sum("hit") == k, 1).otherwise(0).alias("bh"))
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum("bh").alias("n_flagged"),
        )
        .collect()[0]
    )
    sbl = _t.time() - t0
    print(
        f"docs={docs_n:,} bloom_decontam[m=2^20]={sbl:.1f}s "
        f"({int(docs_n / sbl):,} docs/s, shingles={hits['n_sh']:,}, "
        f"flagged={hits['n_flagged']:,})"
    )

    # --- 2-hop gather over the planted-dup LSH graph ---
    t0 = _t.time()
    _, buckets = lsh_banded_buckets(docs, "text", "doc_id")
    aa = buckets.select(F.col("doc_id").alias("da"), "band_idx", "bh")
    bb = buckets.select(F.col("doc_id").alias("db"), "band_idx", "bh")
    cand2 = (
        aa.join(bb, ["band_idx", "bh"])
        .where(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )
    edges = cand2.select(
        F.col("da").alias("u"), F.col("db").alias("v")
    ).unionAll(cand2.select(F.col("db").alias("u"), F.col("da").alias("v")))
    deg = edges.groupBy(F.col("u").alias("doc")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    row2 = (
        edges.join(
            deg.select(F.col("doc").alias("u"), F.col("degree").alias("d0")),
            "u",
        )
        .join(
            deg.select(F.col("doc").alias("v"), F.col("degree").alias("dn")),
            "v",
        )
        .groupBy("u", "d0")
        .agg(F.sum("dn").alias("s2"))
        .agg(F.count(F.lit(1)).alias("nodes"), F.sum("s2").alias("tot"))
        .collect()[0]
    )
    s2h = _t.time() - t0
    print(
        f"docs={docs_n:,} two_hop_gather={s2h:.1f}s "
        f"(nodes_with_edges={row2['nodes']:,})"
    )


def round13b_family_probes(spark, n: int) -> None:
    """Third-wave staged-shape probes (repeated_span_cut_plan,
    setsim_prefix_filter_join, kmv_sketch_union_merge_certified):
    self-contained synthetic inputs, run via
    `python tools/scale_smoke.py N --r13b`."""
    import time as _t

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    # 1) repeated-span cut plan over n/100 word-salad docs (the
    # dup-HEAVY extreme: a 31-word vocab makes nearly every 16-char
    # window repeat, so the join-back carries ~every position — the
    # worst case for the merge join and the island windows).
    vocab = ("key agg row scan slow fast table value part hash merge "
             "batch window spark order data column join small line "
             "customer query big the group sort stream filter").split()
    arr = "array(" + ",".join(f"'{w}'" for w in vocab) + ")"
    docs_n = max(n // 100, 10_000)
    docs = spark.range(docs_n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 32).cast("string").alias("source"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, 60), i -> "
            f"element_at({arr}, cast(pmod(hash(id * 31 + i), "
            f"{len(vocab)}) + 1 as int))))"
        ).alias("text"),
    )
    t0 = _t.time()
    pos = docs.select(
        "source",
        "doc_id",
        F.explode(
            F.expr(
                "case when length(text) >= 16"
                " then sequence(1, length(text) - 15)"
                " else array() end"
            )
        ).alias("p"),
        "text",
    ).select(
        "source", "doc_id", F.col("p").cast("long").alias("p"),
        F.expr("substring(text, p, 16)").alias("w"),
    )
    dupw = (
        pos.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("source", "w")
    )
    cuts = pos.join(dupw.hint("merge"), ["source", "w"]).select(
        "source", "doc_id", F.col("p").alias("s"),
        (F.col("p") + 16).alias("e"),
    )
    w_prev = (
        W.partitionBy("doc_id").orderBy("s")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_run = (
        W.partitionBy("doc_id").orderBy("s")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    marked = cuts.withColumn(
        "is_new",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)),
            1,
        ).otherwise(0),
    )
    merged = (
        marked.withColumn("island", F.sum("is_new").over(w_run))
        .groupBy("source", "doc_id", "island")
        .agg(F.min("s").alias("lo"), F.max("e").alias("hi"))
    )
    got = (
        merged.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("docs_affected"),
            F.sum(F.col("hi") - F.col("lo")).alias("cut"),
        )
        .agg(F.sum("docs_affected"), F.sum("cut"))
        .collect()[0]
    )
    cut_s = _t.time() - t0
    n_pos = docs_n * 330
    print(
        f"docs={docs_n:,} span_cut_plan={cut_s:.1f}s "
        f"(~{n_pos:,} positions, {int(n_pos / cut_s):,} pos/s, "
        f"docs_affected={got[0]:,}, cut_chars={got[1]:,})"
    )


    # 4) within-doc greedy chunker: pure scan-side HOF fold, zero
    # exchanges — throughput should track the scan alone.
    from sparkksqldbbenchmark_spark.llm.hashing import (
        spark_md5_int as _smi,
        spark_tokens as _stk,
    )

    t0 = _t.time()
    toks = docs.select(
        "doc_id", F.expr(_stk("text")).alias("toks")
    )
    flags = F.expr(
        f"transform(toks, w -> ({_smi('w')} & 3) = 0)"
    )
    lens_expr = (
        "aggregate(flags,"
        " struct(cast(array() as array<int>) as lens, 0 as cur),"
        " (a, f) -> if(f,"
        "   struct(concat(a.lens, array(a.cur + 1)) as lens, 0 as cur),"
        "   struct(a.lens as lens, a.cur + 1 as cur)),"
        " a -> if(a.cur > 0, concat(a.lens, array(a.cur)), a.lens))"
    )
    greedy = (
        "aggregate(lens,"
        " struct(0 as nch, 0 as cur, 0 as mx),"
        " (a, L) -> if(a.cur > 0 and a.cur + L > 12,"
        "   struct(a.nch + 1 as nch, L as cur,"
        "          greatest(a.mx, a.cur) as mx),"
        "   struct(a.nch as nch, a.cur + L as cur, a.mx as mx)),"
        " a -> struct(a.nch + 1 as nch, a.cur as cur,"
        "             greatest(a.mx, a.cur) as mx))"
    )
    chk = (
        toks.withColumn("flags", flags)
        .withColumn("lens", F.expr(lens_expr))
        .withColumn("st", F.expr(greedy))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("st.nch")).alias("chunks"),
        )
        .collect()[0]
    )
    ch_s = _t.time() - t0
    print(
        f"docs={docs_n:,} sentence_chunk_fold={ch_s:.1f}s "
        f"({int(docs_n / ch_s):,} docs/s, chunks={chk['chunks']:,})"
    )

    # 2) prefix-filter set-sim join over n/100 mostly-unique-token
    # docs with a planted dup per 1000 (the realistic Zipf-tail shape
    # prefix filtering exploits: rare shingles -> tiny posting lists).
    pdocs = spark.range(docs_n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(1, 40), i -> "
            "concat('w', pmod(hash((case when id % 1000 = 999 "
            f"then id - 999 else id end) * 131 + i), {docs_n * 4}))))"
        ).alias("text"),
    )
    t0 = _t.time()
    from sparkksqldbbenchmark_spark.llm.hashing import (
        spark_word_shingles,
    )

    sets = pdocs.select(
        "doc_id", F.expr(spark_word_shingles("text", 3)).alias("sh")
    )
    tok = sets.select("doc_id", F.explode("sh").alias("g"))
    dfreq = tok.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    sz = sets.select("doc_id", F.size("sh").cast("long").alias("n"))
    rk_w = W.partitionBy("doc_id").orderBy("df", "g")
    ranked = (
        tok.join(dfreq.hint("merge"), "g")
        .join(sz.hint("merge"), "doc_id")
        .withColumn("rk", F.row_number().over(rk_w))
    )
    pfx = ranked.where(
        F.col("rk") <= F.expr("n - ((3 * n + 4) DIV 5) + 1")
    ).select("doc_id", "g")
    cand = (
        pfx.select(F.col("doc_id").alias("da"), "g")
        .join(pfx.select(F.col("doc_id").alias("db"), "g"), "g")
        .where(F.col("da") < F.col("db"))
        .select("da", "db")
        .dropDuplicates(["da", "db"])
    )
    x = sets.select(F.col("doc_id").alias("da"), F.col("sh").alias("sha"))
    y = sets.select(F.col("doc_id").alias("db"), F.col("sh").alias("shb"))
    qualified = (
        cand.hint("merge").join(x, "da").hint("merge").join(y, "db")
        .where(
            F.size(F.array_intersect("sha", "shb")) * 1000000
            >= 600000
            * (
                F.size("sha") + F.size("shb")
                - F.size(F.array_intersect("sha", "shb"))
            )
        )
        .count()
    )
    pf_s = _t.time() - t0
    planted = docs_n // 1000
    assert qualified >= planted, (
        f"prefix filter lost planted dups: {qualified} < {planted}"
    )
    print(
        f"docs={docs_n:,} prefix_filter_setsim={pf_s:.1f}s "
        f"({int(docs_n / pf_s):,} docs/s, qualified={qualified:,} "
        f"[planted {planted:,}])"
    )

    # 3) KMV two-level union-merge over n distinct elements, 32 sources
    from sparkksqldbbenchmark_spark.llm.hashing import spark_md5_int

    k = 32
    t0 = _t.time()
    hsh = spark.range(n).select(
        (F.col("id") % 32).alias("source"),
        F.expr(
            spark_md5_int("cast(id as string)") + " & 2147483647"
        ).alias("h"),
    )
    lvl1 = (
        hsh.withColumn("salt", F.col("h") % 64)
        .groupBy("source", "salt")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("part"))
    )
    src_sketch = (
        lvl1.select("source", F.explode("part").alias("h"))
        .groupBy("source")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("sk"))
    )
    merged_v = sorted(
        r.h
        for r in src_sketch.select(
            F.explode("sk").alias("h")
        ).distinct().orderBy("h").limit(k).collect()
    )
    d1 = (
        hsh.withColumn("salt", F.col("h") % 64)
        .groupBy("salt")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("part"))
    )
    direct_v = sorted(
        r.h
        for r in d1.select(F.explode("part").alias("h"))
        .distinct().orderBy("h").limit(k).collect()
    )
    kmv_s = _t.time() - t0
    assert merged_v == direct_v, "KMV merge identity broken at scale"
    est = (k - 1) * 2147483647 // merged_v[-1]
    print(
        f"rows={n:,} kmv_union_merge={kmv_s:.1f}s "
        f"({int(n / kmv_s):,} rows/s, est_distinct={est:,}, "
        f"identity verified)"
    )


def round15_family_probes(spark, n: int) -> None:
    """Round-15 probes (VERDICT r14 ask #5): the three round-14 staged
    rows that graduated with written scale arithmetic but no measured
    1M-point entry — b-bit minwise on LSH candidates (the 32×
    signature-compression axis), the JL plan-literal projection (one
    scan-side fold per vector), and the composed curation-v2 capstone
    (Gopher keep -> canonical dedup -> water-fill, chained). Run via
    `python tools/scale_smoke.py 100 --r15` (docs = rows/100)."""
    import time as _t

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparkksqldbbenchmark_spark.llm.dedup import lsh_banded_buckets
    from sparkksqldbbenchmark_spark.llm.hashing import (
        spark_md5_int,
        spark_minhash_sig,
        spark_tokens,
    )

    vocab = ("key agg row scan slow fast table value part hash merge "
             "batch window spark order data column join small line "
             "customer query big the group sort stream filter").split()
    arr = "array(" + ",".join(f"'{w}'" for w in vocab) + ")"
    base_id = F.when(
        F.col("id") % 1000 == 999, F.col("id") - 1
    ).otherwise(F.col("id"))
    docs_n = max(50_000, n // 100)
    docs = spark.range(docs_n).withColumn("bid", base_id).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 8).cast("string").alias("source"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, 60), i -> "
            f"element_at({arr}, cast(pmod(hash(bid * 31 + i), "
            f"{len(vocab)}) + 1 as int))))"
        ).alias("text"),
    ).localCheckpoint()

    # --- b-bit minwise on LSH candidates (k=64 wide sig, b=1) ---
    t0 = _t.time()
    shingle_side, buckets = lsh_banded_buckets(docs, "text", "doc_id")
    wide = shingle_side.select(
        "doc_id",
        "shingles",
        F.expr(spark_minhash_sig("shingles", 64)).alias("wsig"),
    )
    cand = (
        buckets.select(F.col("doc_id").alias("doc_a"), "band_idx", "bh")
        .join(
            buckets.select(
                F.col("doc_id").alias("doc_b"), "band_idx", "bh"
            ),
            ["band_idx", "bh"],
        )
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    paired = cand.join(
        wide.select(
            F.col("doc_id").alias("doc_a"),
            F.col("shingles").alias("sh_a"),
            F.col("wsig").alias("sig_a"),
        ),
        "doc_a",
    ).join(
        wide.select(
            F.col("doc_id").alias("doc_b"),
            F.col("shingles").alias("sh_b"),
            F.col("wsig").alias("sig_b"),
        ),
        "doc_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    agree = F.expr(
        "size(filter(zip_with(sig_a, sig_b,"
        " (x, y) -> (x & 1) = (y & 1)), z -> z))"
    )
    # est_micros = (2*agree - k) * 1e6 / k, exact_micros = inter/union
    row = paired.agg(
        F.count(F.lit(1)).alias("nc"),
        F.avg(
            F.abs(
                (2 * agree - 64) * F.lit(1_000_000) / 64
                - inter * F.lit(1_000_000) / union
            )
        ).alias("mean_abs_err_micros"),
    ).collect()[0]
    s = _t.time() - t0
    print(
        f"docs={docs_n:,} bbit_minwise={s:.1f}s "
        f"({int(docs_n / s):,} docs/s, candidates={row['nc']:,}, "
        f"mean_abs_est_err={row['mean_abs_err_micros'] / 1e6:.4f})"
    )

    # --- JL plan-literal projection (64 -> 8) + bounded pair audit ---
    from sparkksqldbbenchmark_spark.plans.round14_queries import _jl_signs

    vecs_n = docs_n
    t0 = _t.time()
    q = spark.range(vecs_n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), j -> "
            "cast(pmod(hash(id * 131 + j), 2001) - 1000 as bigint))"
        ).alias("q"),
    )
    signs = _jl_signs(8, 64)
    proj_cols = [
        F.expr(
            "aggregate(zip_with(q, array("
            + ",".join(str(v) for v in row)
            + "), (x, s) -> x * s), cast(0 as bigint), (a, x) -> a + x)"
        ).alias(f"p{h}")
        for h, row in enumerate(signs)
    ]
    proj = q.select("vec_id", "q", *proj_cols)
    a = proj.where(F.col("vec_id") % 5 == 0)
    b = proj.select(
        (F.col("vec_id") - 1).alias("vid_join"),
        F.col("q").alias("qb"),
        *[F.col(f"p{h}").alias(f"pb{h}") for h in range(8)],
    )
    pairs = a.join(b, a.vec_id == b.vid_join)
    d2_orig = F.expr(
        "aggregate(zip_with(q, qb, (x, y) -> (x - y) * (x - y)),"
        " cast(0 as bigint), (acc, x) -> acc + x)"
    )
    d2_proj = sum(
        (F.col(f"p{h}") - F.col(f"pb{h}"))
        * (F.col(f"p{h}") - F.col(f"pb{h}"))
        for h in range(8)
    )
    row = pairs.agg(
        F.count(F.lit(1)).alias("np"),
        F.avg(d2_proj * 1_000_000 / (8 * d2_orig)).alias("mean_ratio"),
    ).collect()[0]
    s = _t.time() - t0
    print(
        f"vecs={vecs_n:,} jl_projection={s:.1f}s "
        f"({int(vecs_n / s):,} vecs/s, pairs={row['np']:,}, "
        f"mean_ratio={row['mean_ratio'] / 1e6:.4f})"
    )

    # --- composed curation v2: gopher keep -> dedup -> water-fill ---
    t0 = _t.time()
    toks = docs.select(
        "doc_id", "source", "text",
        F.expr(spark_tokens("text")).alias("toks"),
    ).where(F.size("toks") > 0)
    pairs_e = (
        f"zip_with(toks, transform(toks, w -> "
        f"({spark_md5_int('w')} & 3) = 0), "
        f"(w, f) -> struct(w as w, f as f))"
    )
    sents_expr = (
        f"aggregate({pairs_e},"
        " struct(cast(array() as array<string>) as ss, '' as cur),"
        " (a, p) -> if(p.f,"
        "   struct(concat(a.ss, array(if(a.cur = '', p.w,"
        "          concat(a.cur, ' ', p.w)))) as ss, '' as cur),"
        "   struct(a.ss as ss, if(a.cur = '', p.w,"
        "          concat(a.cur, ' ', p.w)) as cur)),"
        " a -> if(a.cur != '', concat(a.ss, array(a.cur)), a.ss))"
    )
    quality = toks.withColumn("sents", F.expr(sents_expr)).select(
        "doc_id", "source", "text",
        F.size("toks").alias("n_words"),
        F.size("sents").alias("ns"),
        F.size(F.array_distinct("sents")).alias("nd"),
    )
    keepers = quality.where(
        (F.col("ns") - F.col("nd")) * 1000000 / F.col("ns") < 300000
    )
    canon = keepers.withColumn(
        "canonical_id",
        F.min("doc_id").over(Window.partitionBy(F.md5("text"))),
    )
    survivors = (
        canon.where(F.col("doc_id") == F.col("canonical_id"))
        .groupBy("source")
        .agg(
            F.sum("n_words").cast("long").alias("total_tokens"),
            F.count(F.lit(1)).cast("long").alias("docs_kept"),
        )
    )
    out = survivors.agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.sum("docs_kept").alias("kept"),
        F.sum("total_tokens").alias("tok"),
    ).collect()[0]
    s = _t.time() - t0
    print(
        f"docs={docs_n:,} curation_v2_composed={s:.1f}s "
        f"({int(docs_n / s):,} docs/s, sources={out['n_sources']}, "
        f"kept={out['kept']:,}, surviving_tokens={out['tok']:,})"
    )


def round16_family_probes(spark, n: int) -> None:
    """Round-15 staged-shape probes for the corpus-scale round-16
    staging rows (the others collapse to bounded frames at the first
    aggregate and inherit measured families): bigram draft acceptance
    (token-grain shuffle + vocab-grain predictor join), the second
    Pregel superstep (two node-grain gathers over the dup graph),
    prefix-cache hit mass (group-grain aggregate), and curation v3
    (the v2 chain + Bloom decontam stage). Run via
    `python tools/scale_smoke.py 100 --r16` (docs = rows/100)."""
    import time as _t

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparkksqldbbenchmark_spark.llm.dedup import lsh_banded_buckets
    from sparkksqldbbenchmark_spark.llm.hashing import (
        spark_md5_int,
        spark_tokens,
        spark_word_shingles,
    )

    vocab = ("key agg row scan slow fast table value part hash merge "
             "batch window spark order data column join small line "
             "customer query big the group sort stream filter").split()
    arr = "array(" + ",".join(f"'{w}'" for w in vocab) + ")"
    base_id = F.when(
        F.col("id") % 1000 == 999, F.col("id") - 1
    ).otherwise(F.col("id"))
    docs_n = max(50_000, n // 100)
    docs = spark.range(docs_n).withColumn("bid", base_id).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 8).cast("string").alias("source"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, 60), i -> "
            f"element_at({arr}, cast(pmod(hash(bid * 31 + i), "
            f"{len(vocab)}) + 1 as int))))"
        ).alias("text"),
    ).localCheckpoint()

    # --- bigram draft acceptance: scan-side zip + vocab join ---
    t0 = _t.time()
    tarr = F.split(F.trim(F.col("text")), "\\s+")
    bigrams = docs.select(
        "source",
        F.explode(
            F.zip_with(
                F.slice(tarr, 1, F.greatest(F.size(tarr) - 1, F.lit(0))),
                F.slice(tarr, 2, F.greatest(F.size(tarr) - 1, F.lit(0))),
                lambda w1, w2: F.struct(w1.alias("w1"), w2.alias("w2")),
            )
        ).alias("bg"),
    ).select("source", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    counts = bigrams.groupBy("source", "w1", "w2").agg(
        F.count(F.lit(1)).alias("c")
    )
    pred = (
        counts.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source", "w1").orderBy(
                    F.col("c").desc(), "w2"
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("source", "w1", F.col("w2").alias("w2_pred"))
    )
    row = (
        bigrams.join(pred, ["source", "w1"])
        .agg(
            F.count(F.lit(1)).alias("np"),
            F.sum(
                F.when(F.col("w2") == F.col("w2_pred"), 1).otherwise(0)
            ).alias("na"),
        )
        .collect()[0]
    )
    s = _t.time() - t0
    print(
        f"docs={docs_n:,} bigram_acceptance={s:.1f}s "
        f"({int(docs_n / s):,} docs/s, positions={row['np']:,}, "
        f"accepted={row['na']:,})"
    )

    # --- second Pregel superstep over the dup graph ---
    t0 = _t.time()
    _, buckets = lsh_banded_buckets(docs, "text", "doc_id")
    ca = buckets.select(F.col("doc_id").alias("doc_a"), "band_idx", "bh")
    cb = buckets.select(F.col("doc_id").alias("doc_b"), "band_idx", "bh")
    cand = (
        ca.join(cb, ["band_idx", "bh"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    edges = cand.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionAll(
        cand.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    ).localCheckpoint()
    deg = edges.groupBy(F.col("u").alias("doc")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    h1 = (
        edges.join(
            deg.select(F.col("doc").alias("v"), F.col("degree").alias("dn")),
            "v",
        )
        .groupBy(F.col("u").alias("doc"))
        .agg(F.sum("dn").alias("h1"))
    )
    h2 = (
        edges.join(
            h1.select(F.col("doc").alias("v"), F.col("h1").alias("mn")),
            "v",
        )
        .groupBy(F.col("u"))
        .agg(F.sum("mn").alias("h2"))
    )
    row = h2.agg(
        F.count(F.lit(1)).alias("nodes"), F.sum("h2").alias("mass")
    ).collect()[0]
    s = _t.time() - t0
    print(
        f"docs={docs_n:,} pregel_superstep2={s:.1f}s "
        f"({int(docs_n / s):,} docs/s, nodes={row['nodes']:,})"
    )

    # --- prefix-cache hit mass ---
    t0 = _t.time()
    tokc = F.split(F.trim(F.col("text")), "\\s+")
    pfx = docs.select(
        "source",
        F.array_join(F.slice(tokc, 1, 8), " ").alias("prefix"),
        F.least(F.lit(8), F.size(tokc)).alias("plen"),
    )
    groups = pfx.groupBy("source", "prefix", "plen").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    row = groups.agg(
        F.sum("n_docs").alias("nd"),
        F.sum((F.col("n_docs") - 1) * F.col("plen")).alias("cache"),
    ).collect()[0]
    s = _t.time() - t0
    print(
        f"docs={docs_n:,} prefix_cache={s:.1f}s "
        f"({int(docs_n / s):,} docs/s, cacheable={row['cache']:,})"
    )

    # --- curation v3: gopher -> dedup -> bloom decontam -> totals ---
    t0 = _t.time()
    evalsplit = F.expr(
        f"{spark_md5_int('cast(doc_id as string)')} % 10"
    )
    pool = docs.where(evalsplit != 0)
    eval_docs = docs.where(evalsplit == 0)
    shexpr = F.expr(spark_word_shingles("text", 3))
    eval_sh = eval_docs.select(F.explode(shexpr).alias("esh")).distinct()
    tk = pool.select(
        "doc_id", "source", "text",
        F.expr(spark_tokens("text")).alias("toks"),
    ).where(F.size("toks") > 0)
    pairs_e = (
        f"zip_with(toks, transform(toks, w -> "
        f"({spark_md5_int('w')} & 3) = 0), "
        f"(w, f) -> struct(w as w, f as f))"
    )
    sents_expr = (
        f"aggregate({pairs_e},"
        " struct(cast(array() as array<string>) as ss, '' as cur),"
        " (a, p) -> if(p.f,"
        "   struct(concat(a.ss, array(if(a.cur = '', p.w,"
        "          concat(a.cur, ' ', p.w)))) as ss, '' as cur),"
        "   struct(a.ss as ss, if(a.cur = '', p.w,"
        "          concat(a.cur, ' ', p.w)) as cur)),"
        " a -> if(a.cur != '', concat(a.ss, array(a.cur)), a.ss))"
    )
    quality = tk.withColumn("sents", F.expr(sents_expr)).select(
        "doc_id", "source", "text",
        F.size("toks").alias("n_words"),
        F.size("sents").alias("ns"),
        F.size(F.array_distinct("sents")).alias("nd"),
    )
    keepers = quality.where(
        (F.col("ns") - F.col("nd")) * 1000000 / F.col("ns") < 300000
    )
    canon = keepers.withColumn(
        "canonical_id",
        F.min("doc_id").over(Window.partitionBy(F.md5("text"))),
    )
    deduped = canon.where(F.col("doc_id") == F.col("canonical_id"))
    m, kbits = 4096, 3
    j = F.explode(F.sequence(F.lit(0), F.lit(kbits - 1))).alias("j")
    hp = (
        "("
        + spark_md5_int("concat(cast(j as string), '#', sh)")
        + f") % {m}"
    )
    bloom = (
        eval_sh.select(F.col("esh").alias("sh"), j)
        .select(F.expr(hp).alias("p"))
        .groupBy(F.expr("p DIV 32").alias("word"))
        .agg(
            F.expr("bit_or(shiftleft(1L, cast(p % 32 as int)))")
            .cast("long")
            .alias("bits")
        )
    )
    train_sh = deduped.select("doc_id", F.explode(shexpr).alias("sh"))
    probes = train_sh.select("doc_id", "sh", j).select(
        "doc_id", "sh", F.expr(hp).alias("p")
    )
    flagged_sh = (
        probes.join(
            F.broadcast(bloom), F.expr("word = p DIV 32"), "left"
        )
        .select(
            "doc_id", "sh",
            F.when(
                F.col("bits").isNotNull()
                & (
                    F.expr("bits & shiftleft(1L, cast(p % 32 as int))")
                    != 0
                ),
                1,
            ).otherwise(0).alias("hit"),
        )
        .groupBy("doc_id", "sh")
        .agg(F.sum("hit").alias("hits"))
        .where(F.col("hits") == kbits)
    )
    contaminated = (
        flagged_sh.join(
            eval_sh.select(F.col("esh").alias("sh")), "sh"
        )
        .select("doc_id")
        .distinct()
    )
    clean = deduped.join(contaminated, "doc_id", "left_anti")
    row = clean.agg(
        F.count(F.lit(1)).alias("kept"),
        F.sum("n_words").alias("tok"),
    ).collect()[0]
    s = _t.time() - t0
    print(
        f"docs={docs_n:,} curation_v3_composed={s:.1f}s "
        f"({int(docs_n / s):,} docs/s, kept={row['kept']:,}, "
        f"tokens={row['tok'] or 0:,})"
    )


def round17_family_probes(spark, n: int) -> None:
    """Round-16 staged-shape probes for the corpus-grain round-17
    staging rows (the discretization/CUSUM/knee/weighted-RRF rows
    collapse to bounded frames at the first aggregate and inherit
    measured families): the density-greedy knapsack (one GLOBAL rank
    window over the corpus — the deterministic_corpus_shuffle shape)
    and the context-length policy sweep (three policy-partitioned
    rank windows + batch-grain aggregates over 3x the corpus). Run
    via `python tools/scale_smoke.py 100 --r17` (docs = rows/100)."""
    import time as _t

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparkksqldbbenchmark_spark.llm.hashing import spark_md5_int

    vocab = ("key agg row scan slow fast table value part hash merge "
             "batch window spark order data column join small line "
             "customer query big the group sort stream filter").split()
    arr = "array(" + ",".join(f"'{w}'" for w in vocab) + ")"
    base_id = F.when(
        F.col("id") % 1000 == 999, F.col("id") - 1
    ).otherwise(F.col("id"))
    docs_n = max(50_000, n // 100)
    docs = spark.range(docs_n).withColumn("bid", base_id).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, 60), i -> "
            f"element_at({arr}, cast(pmod(hash(bid * 31 + i), "
            f"{len(vocab)}) + 1 as int))))"
        ).alias("text"),
    ).localCheckpoint()

    # --- density-greedy knapsack: one global rank + scalar folds ---
    t0 = _t.time()
    q = f"({spark_md5_int('text')}) % 1000"
    items = docs.select(
        "doc_id",
        (F.expr(q) + 1).cast("long").alias("v"),
        F.greatest(
            F.size(F.split(F.trim(F.col("text")), "\\s+")), F.lit(1)
        ).cast("long").alias("c"),
    )
    key = F.expr("v * 1099511627776 div c")
    w = Window.orderBy(key.desc(), "doc_id")
    frame = w.rowsBetween(Window.unboundedPreceding, 0)
    ordered = items.select(
        "v", "c",
        F.row_number().over(w).alias("rk"),
        F.sum("c").over(frame).alias("cum_c"),
        F.sum("v").over(frame).alias("cum_v"),
    )
    b = items.agg((F.sum("c") / 10).cast("long").alias("budget"))
    row = (
        ordered.crossJoin(F.broadcast(b))
        .where(F.col("cum_c") <= F.col("budget"))
        .agg(
            F.coalesce(F.max("rk"), F.lit(0)).alias("n_sel"),
            F.coalesce(F.max("cum_v"), F.lit(0)).alias("sel_v"),
        )
        .collect()[0]
    )
    s = _t.time() - t0
    print(
        f"docs={docs_n:,} density_greedy={s:.1f}s "
        f"({int(docs_n / s):,} docs/s, n_sel={row['n_sel']:,}, "
        f"value={row['sel_v']:,}) — NOTE the global window is the "
        f"plain single-sort form here; at cluster scale the row "
        f"documents the two-level chunked-rank escape hatch"
    )

    # --- context-length policy sweep: 3 policy partitions ---
    t0 = _t.time()
    lens = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), "\\s+"))
        .cast("long").alias("n_tok"),
    )
    pol = spark.createDataFrame([(32,), (48,), (64,)], "ctx_len long")
    used = F.broadcast(pol).crossJoin(lens).select(
        "ctx_len", "doc_id",
        F.least(F.col("n_tok"), F.col("ctx_len")).alias("used"),
        F.greatest(F.col("n_tok") - F.col("ctx_len"), F.lit(0))
        .alias("truncated"),
    )
    batched = used.select(
        "ctx_len", "used", "truncated",
        F.floor(
            (F.row_number().over(
                Window.partitionBy("ctx_len").orderBy("used", "doc_id")
            ) - 1) / 8
        ).alias("batch"),
    )
    per = batched.groupBy("ctx_len", "batch").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("used").alias("mx"),
        F.sum("used").alias("s"),
        F.sum("truncated").alias("tr"),
    )
    rows = per.groupBy("ctx_len").agg(
        F.sum(F.col("n") * F.col("mx") - F.col("s")).alias("pad"),
        F.sum("tr").alias("tr"),
    ).collect()
    s = _t.time() - t0
    print(
        f"docs={docs_n:,} context_policy_sweep={s:.1f}s "
        f"({int(3 * docs_n / s):,} doc-policies/s, "
        + ", ".join(
            f"L={r['ctx_len']}: pad={r['pad']:,}/trunc={r['tr']:,}"
            for r in sorted(rows, key=lambda r: r['ctx_len'])
        )
    )




def round17b_family_probes(spark, n: int) -> None:
    """Round-16 staged-shape probe for the batch-3 staging rows:
    winnowing fingerprint selection is the one genuinely
    corpus-CHARACTER-grain shape (every k-gram hashed, a bounded
    window pass per doc) — BPE supersteps collapse to the distinct
    VOCABULARY at the first aggregate and the edit-distance-1 join
    is vocab-bounded (written arithmetic in DESIGN_100TB.md). Run
    via `python tools/scale_smoke.py 100 --r17b` (docs = rows/100)."""
    import time as _t

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparkksqldbbenchmark_spark.llm.hashing import spark_md5_int

    vocab = ("key agg row scan slow fast table value part hash merge "
             "batch window spark order data column join small line "
             "customer query big the group sort stream filter").split()
    arr = "array(" + ",".join(f"'{w}'" for w in vocab) + ")"
    docs_n = max(50_000, n // 100)
    docs = spark.range(docs_n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, 60), i -> "
            f"element_at({arr}, cast(pmod(hash(id * 31 + i), "
            f"{len(vocab)}) + 1 as int))))"
        ).alias("text"),
    ).localCheckpoint()

    k, w, hmod, pbase = 5, 4, 1 << 30, 1 << 20
    t0 = _t.time()
    h = spark_md5_int(f"substring(text, pos, {k})")
    grams = docs.where(F.length("text") >= k).select(
        "doc_id",
        "text",
        (F.length("text") - k + 1).alias("n_grams"),
        F.explode(
            F.expr(f"sequence(1, length(text) - {k} + 1)")
        ).alias("pos"),
    ).select(
        "doc_id", "n_grams", "pos",
        (F.expr(h) % hmod).alias("h"),
    )
    wf = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(w - 1), 0)
    )
    keyed = grams.select(
        "doc_id",
        F.min(
            F.col("h") * pbase + (F.lit(pbase - 1) - F.col("pos"))
        ).over(wf).alias("sel_key"),
        "pos",
    ).where(F.col("pos") >= w)
    sel = keyed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.countDistinct("sel_key").alias("n_selected"),
    )
    row = sel.agg(
        F.sum("n_windows").alias("nw"),
        F.sum("n_selected").alias("ns"),
    ).collect()[0]
    s = _t.time() - t0
    print(
        f"docs={docs_n:,} winnowing={s:.1f}s "
        f"({int(docs_n / s):,} docs/s, windows={row['nw']:,}, "
        f"selected={row['ns']:,}, density="
        f"{row['ns'] / row['nw']:.4f} vs 2/(w+1)={2 / (w + 1):.4f})"
    )

    # --- edit1 deletion-neighborhood join: vocab-grain state ----
    t0 = _t.time()
    base = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") >= 3)
        .distinct()
    )
    planted = base.select(
        F.concat(
            F.expr(
                f"substring(word, 1, cast(({spark_md5_int('word')})"
                f" % length(word) as int))"
            ),
            F.expr(
                f"substring(word, cast(({spark_md5_int('word')})"
                f" % length(word) as int) + 2)"
            ),
        ).alias("word")
    )
    vocab = (
        base.select("word", F.lit(1).alias("o"))
        .unionByName(planted.select("word", F.lit(0).alias("o")))
        .groupBy("word")
        .agg(F.max("o").alias("is_orig"))
    )
    sigs = (
        vocab.select("word", F.col("word").alias("sig"))
        .unionByName(
            vocab.select(
                "word",
                F.explode(
                    F.expr(
                        "transform(sequence(1, length(word)),"
                        " i -> concat(substring(word, 1, i - 1),"
                        " substring(word, i + 1)))"
                    )
                ).alias("sig"),
            )
        )
        .distinct()
    )
    cand = (
        sigs.alias("a")
        .join(
            sigs.alias("b"),
            on=(F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.word") < F.col("b.word")),
        )
        .select(
            F.col("a.word").alias("wa"), F.col("b.word").alias("wb")
        )
        .distinct()
    )
    npairs = cand.where(
        F.levenshtein("wa", "wb") <= 1
    ).count()
    s = _t.time() - t0
    print(
        f"docs={docs_n:,} edit1_join={s:.1f}s "
        f"({int(docs_n / s):,} docs/s, pairs={npairs:,}) — cost is "
        f"the corpus word-distinct aggregate; signature/join state "
        f"is VOCAB-grain and flat in corpus size"
    )

    # --- BPE supersteps: corpus-grain freq, vocab-grain state ----
    t0 = _t.time()
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    ).localCheckpoint()
    state = (
        words.select(
            "word",
            "freq",
            F.explode(F.expr("sequence(1, length(word))")).alias("p"),
        )
        .select(
            "word",
            "freq",
            F.col("p").cast("long").alias("pos"),
            F.expr("substring(word, p, 1)").alias("sym"),
        )
    )
    from pyspark.sql import Window as _W

    wn = _W.partitionBy("word").orderBy("pos")
    merges = []
    for _k in range(3):
        n = state.withColumn("nxt", F.lead("sym").over(wn))
        best = (
            n.where(F.col("nxt").isNotNull())
            .groupBy(
                F.col("sym").alias("ml"), F.col("nxt").alias("mr")
            )
            .agg(F.sum("freq").cast("long").alias("mcnt"))
            .orderBy(F.desc("mcnt"), "ml", "mr")
            .limit(1)
        )
        m = n.crossJoin(F.broadcast(best)).withColumn(
            "mt",
            F.col("nxt").isNotNull()
            & (F.col("sym") == F.col("ml"))
            & (F.col("nxt") == F.col("mr")),
        )
        g = m.withColumn(
            "grp",
            F.when(
                F.col("mt"),
                F.col("pos")
                - F.row_number().over(
                    _W.partitionBy("word", "mt").orderBy("pos")
                ),
            ),
        )
        e = g.withColumn(
            "merged",
            F.col("mt")
            & (
                (
                    F.col("pos")
                    - F.min("pos").over(
                        _W.partitionBy("word", "grp")
                    )
                )
                % 2
                == 0
            ),
        )
        r = e.select(
            "word",
            "freq",
            "pos",
            F.when(F.col("merged"), F.concat("sym", "nxt"))
            .otherwise(F.col("sym"))
            .alias("sym"),
            F.coalesce(F.lag("merged").over(wn), F.lit(False)).alias(
                "prevm"
            ),
        )
        state = r.where(~F.col("prevm")).select(
            "word",
            "freq",
            F.row_number().over(wn).cast("long").alias("pos"),
            "sym",
        ).localCheckpoint()
        mrow = best.collect()[0]
        merges.append(f"{mrow['ml']}+{mrow['mr']}")
    ntok = state.agg(F.sum("freq")).collect()[0][0]
    s = _t.time() - t0
    print(
        f"docs={docs_n:,} bpe_3_supersteps={s:.1f}s "
        f"({int(docs_n / s):,} docs/s, merges={','.join(merges)}, "
        f"tokens_after={ntok:,}) — corpus-grain cost is ONE word-"
        f"frequency aggregate; superstep state is vocab x word-len "
        f"(checkpointed per step here, the production form)"
    )


def main() -> None:
    import os as _os, sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from _scratch import activate

    activate()
    millions = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    n = int(millions * 1_000_000)
    # local-mode driver == the executor: the default 1g heap dies on the
    # forward_fill materialization at 10M+ rows. On a cluster this is
    # executor memory; here size the single JVM for the data we generate.
    spark = get_spark(
        SessionConfig(
            app_name="scale-smoke",
            extra={"spark.driver.memory": "48g"},
        )
    )
    d = tempfile.mkdtemp(prefix="scale_events_")
    if "--r13" in sys.argv:
        round13_family_probes(spark, n)
        return
    if "--r13b" in sys.argv:
        round13b_family_probes(spark, n)
        return
    if "--r14" in sys.argv:
        round14_family_probes(spark, n)
        return
    if "--r15" in sys.argv:
        round15_family_probes(spark, n)
        return
    if "--r16" in sys.argv:
        round16_family_probes(spark, n)
        return
    if "--r17" in sys.argv:
        round17_family_probes(spark, n)
        return
    if "--r17b" in sys.argv:
        round17b_family_probes(spark, n)
        return
    if "--only-new" in sys.argv:
        # round-12 staged-family probes only: build just the word-salad
        # corpus (same recipe as the dedup section below) and return
        vocab = ("key agg row scan slow fast table value part hash merge "
                 "batch window spark order data column join small line "
                 "customer query big the group sort stream filter").split()
        arr = "array(" + ",".join(f"'{w}'" for w in vocab) + ")"
        base_id = F.when(
            F.col("id") % 1000 == 999, F.col("id") - 1
        ).otherwise(F.col("id"))
        docs_n = max(50_000, n // 20)
        try:
            (
                spark.range(docs_n)
                .withColumn("bid", base_id)
                .select(
                    F.col("id").alias("doc_id"),
                    F.expr(
                        f"concat_ws(' ', transform(sequence(1, 60), i -> "
                        f"element_at({arr}, cast(pmod(hash(bid * 31 + i), "
                        f"{len(vocab)}) + 1 as int))))"
                    ).alias("text"),
                )
                .repartition(32)
                .write.mode("overwrite")
                .parquet(d + "_docs")
            )
            docs = spark.read.parquet(d + "_docs")
            new_family_probes(spark, n, docs, docs_n)
        finally:
            shutil.rmtree(d, ignore_errors=True)
            shutil.rmtree(d + "_docs", ignore_errors=True)
        return
    try:
        print(f"generating {n:,} events into {d} (32 files)...",
              file=sys.stderr)
        t0 = time.time()
        (
            spark.range(n)
            .select(
                F.col("id").alias("event_id"),
                (
                    F.lit("2024-01-01 00:00:00").cast("timestamp")
                    + (F.col("id") % 2_592_000).cast("string")
                    .cast("interval second")
                ).alias("ts"),
                (F.col("id") % 1500).alias("user_id"),
                F.element_at(
                    F.array(*[F.lit(x) for x in
                              ("click", "view", "error", "purchase",
                               "signup")]),
                    (F.col("id") % 5 + 1).cast("int"),
                ).alias("event_type"),
                F.round((F.col("id") % 100000) / 100.0, 2).alias("value"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(d)
        )
        gen_s = time.time() - t0
        print(f"generated in {gen_s:.1f}s", file=sys.stderr)

        events = spark.read.parquet(d)

        t0 = time.time()
        agg = tumbling_window_agg(
            events, ts_col="ts", window_duration="1 hour",
            keys=("event_type",), value_col="value", order_col="event_id",
        )
        groups = agg.count()
        core_s = time.time() - t0

        t0 = time.time()
        stations = (
            events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("c"), F.avg("value").alias("a"))
            .count()
        )
        acc_s = time.time() - t0

        t0 = time.time()
        top = events.orderBy(F.desc("value"), F.asc("event_id")).limit(5)
        top.collect()
        topk_s = time.time() - t0

        rows_per_sec = int(n / core_s)
        print(
            f"rows={n:,} core_window_agg={core_s:.1f}s "
            f"({rows_per_sec:,} rows/s, {groups} groups) "
            f"per_key_acc={acc_s:.1f}s ({stations} keys) top_k={topk_s:.1f}s"
        )

        # dedup over a corpus that scales with the run (n/20 docs,
        # min 50k): synthetic word-salad docs (deterministic from id),
        # ~60 words each, with every 1000th doc duplicating its
        # predecessor so recall is observable.
        from sparkksqldbbenchmark_spark.llm.dedup import minhash_lsh_pairs

        vocab = ("key agg row scan slow fast table value part hash merge "
                 "batch window spark order data column join small line "
                 "customer query big the group sort stream filter").split()
        arr = "array(" + ",".join(f"'{w}'" for w in vocab) + ")"
        base_id = F.when(
            F.col("id") % 1000 == 999, F.col("id") - 1
        ).otherwise(F.col("id"))
        docs_n = max(50_000, n // 20)
        docs = (
            spark.range(docs_n)
            .withColumn("bid", base_id)
            .select(
                F.col("id").alias("doc_id"),
                F.expr(
                    f"concat_ws(' ', transform(sequence(1, 60), i -> "
                    f"element_at({arr}, cast(pmod(hash(bid * 31 + i), "
                    f"{len(vocab)}) + 1 as int))))"
                ).alias("text"),
            )
        )
        docs.write.mode("overwrite").parquet(d + "_docs")
        docs = spark.read.parquet(d + "_docs")
        t0 = time.time()
        pairs = minhash_lsh_pairs(docs, "text", "doc_id").count()
        dedup_s = time.time() - t0
        print(
            f"docs={docs_n:,} minhash_lsh={dedup_s:.1f}s ({pairs} dup "
            f"pairs, {int(docs_n / dedup_s):,} docs/s)"
        )

        # curation ops at 10× documents: PII scrub (regex redaction over
        # every doc, planted emails so matches are real), stratified
        # sample + hash split (scan-side filters — should be near scan
        # speed), OLAP cube over the 10M events.
        from sparkksqldbbenchmark_spark.llm.pii import with_pii_scrub
        from sparkksqldbbenchmark_spark.operators.sampling import (
            hash_split,
            stratified_sample,
        )

        cdocs = docs.withColumn(
            "lang",
            F.element_at(
                F.array(*[F.lit(x) for x in ("en", "de", "fr", "es", "zh")]),
                (F.col("doc_id") % 5 + 1).cast("int"),
            ),
        ).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.col("text"),
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.col("text")),
        )
        t0 = time.time()
        scrubbed = with_pii_scrub(cdocs, text_col="text")
        n_pii = scrubbed.agg(F.sum("total_pii")).collect()[0][0]
        pii_s = time.time() - t0
        t0 = time.time()
        n_sample = stratified_sample(
            cdocs, "lang", {"en": 0.5, "de": 0.3, "fr": 0.2}, "doc_id"
        ).count()
        samp_s = time.time() - t0
        t0 = time.time()
        n_splits = hash_split(cdocs, "doc_id").groupBy("split").count().count()
        split_s = time.time() - t0
        print(
            f"docs={docs_n:,} pii_scrub={pii_s:.1f}s ({n_pii} redactions, "
            f"{int(docs_n / pii_s):,} docs/s) "
            f"stratified_sample={samp_s:.1f}s ({n_sample} kept) "
            f"hash_split={split_s:.1f}s ({n_splits} splits)"
        )
        t0 = time.time()
        cube_rows = (
            events.cube(
                "event_type", F.hour("ts").cast("long").alias("hod")
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .count()
        )
        cube_s = time.time() - t0
        print(
            f"rows={n:,} cube_rollup={cube_s:.1f}s ({cube_rows} cells, "
            f"{int(n / cube_s):,} rows/s)"
        )

        # global forward-fill over the full event stream (the two-pass
        # day-bucketed plan — SURVEY §7 risk 7): null every 7th value,
        # fill with NO partition columns, count filled rows. The check
        # is that this scales like a parallel window, not a global sort.
        from sparkksqldbbenchmark_spark.operators.joins import forward_fill

        holey = events.withColumn(
            "value",
            F.when(F.col("event_id") % 7 != 0, F.col("value")),
        )
        t0 = time.time()
        filled = forward_fill(holey, "ts", ["value"])
        n_filled = filled.where(F.col("value").isNotNull()).count()
        ffill_s = time.time() - t0
        print(
            f"rows={n:,} global_ffill={ffill_s:.1f}s "
            f"({n_filled:,} non-null after fill, "
            f"{int(n / ffill_s):,} rows/s)"
        )

        # sequence packing over the events table treated as a corpus
        # (n_tokens synthesized from the value column): the distributed
        # prefix sum must stay one-data-shuffle at any row count.
        from sparkksqldbbenchmark_spark.operators.packing import (
            pack_offsets,
        )

        corpus = events.select(
            F.col("event_id").alias("doc_id"),
            (F.col("event_id") % 512 + 1).cast("long").alias("n_tokens"),
        )
        t0 = time.time()
        packed = pack_offsets(corpus, capacity=2048)
        n_packs = packed.agg(
            F.countDistinct("pack_id").alias("p")
        ).collect()[0]["p"]
        pack_s = time.time() - t0
        print(
            f"rows={n:,} sequence_packing={pack_s:.1f}s "
            f"({n_packs:,} packs, {int(n / pack_s):,} docs/s)"
        )

        # token-budget selection over the same synthetic corpus: the
        # priority-ordered prefix sum (quality stand-in = a uniform
        # derived score) must scale exactly like packing — one data
        # shuffle on the level grid + constant-size carry.
        from sparkksqldbbenchmark_spark.operators.selection import (
            ordered_budget_select,
        )

        scored = corpus.withColumn(
            "score", (F.col("doc_id") % 997).cast("double") / 997.0
        )
        t0 = time.time()
        sel = ordered_budget_select(
            scored,
            level=F.floor((F.lit(1.0) - F.col("score")) * 64).cast("long"),
            order=[F.desc("score"), F.asc("doc_id")],
            weight_col="n_tokens",
            budget=n * 64,  # ~25% of total tokens
        )
        n_sel = sel.where(F.col("selected")).count()
        sel_s = time.time() - t0
        print(
            f"rows={n:,} budget_selection={sel_s:.1f}s "
            f"({n_sel:,} selected, {int(n / sel_s):,} docs/s)"
        )

        # passage-chunk frequency audit over the word-salad docs: explode
        # to 16-word chunks, hash-keyed frequency agg + join-back — the
        # duplicate-passage signal at chunk grain.
        t0 = time.time()
        toks = "regexp_extract_all(text, '\\\\S+', 0)"
        chunk_docs = docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, cast((size({toks}) + 15)"
                    f" div 16 as int) - 1),"
                    f" i -> concat_ws(' ', slice({toks}, i*16+1, 16)))"
                )
            ).alias("chunk"),
        ).select(
            "doc_id",
            F.expr(
                "cast(conv(substring(md5(chunk), 1, 15), 16, 10) as bigint)"
            ).alias("chash"),
        )
        freq = chunk_docs.groupBy("chash").agg(
            F.countDistinct("doc_id").alias("nd")
        )
        n_dup_chunks = (
            chunk_docs.join(freq, "chash")
            .where(F.col("nd") >= 2)
            .count()
        )
        chunk_s = time.time() - t0
        print(
            f"docs={docs_n:,} passage_dup={chunk_s:.1f}s "
            f"({n_dup_chunks:,} duplicated chunk instances, "
            f"{int(docs_n / chunk_s):,} docs/s)"
        )

        # incremental dedup: a 10% "new batch" checked against the other
        # 90% as the historical corpus — per-round cost must scale with
        # the batch, not the corpus (only new⋈corpus bucket collisions
        # are joined). The planted dup pairs are id-adjacent so none
        # straddle the split (0 matches expected); the measurement is
        # the directional bucket-join cost, recall is oracle-graded at
        # test scale (dedup_incremental_vs_corpus).
        from sparkksqldbbenchmark_spark.llm.dedup import (
            incremental_lsh_matches,
        )

        split_at = int(docs_n * 0.9)
        t0 = time.time()
        n_matches = incremental_lsh_matches(
            docs.where(F.col("doc_id") >= split_at),
            docs.where(F.col("doc_id") < split_at),
            "text",
            "doc_id",
        ).count()
        incr_s = time.time() - t0
        print(
            f"docs={docs_n:,} incremental_dedup={incr_s:.1f}s "
            f"({n_matches:,} new-batch matches, batch={docs_n - split_at:,})"
        )

        new_family_probes(spark, n, docs, docs_n)
        round13_family_probes(spark, n)
        round14_family_probes(spark, n)
        if "--only-new" in sys.argv:
            return

        # deterministic corpus shuffle: global rank via the leveled
        # prefix sum — one data shuffle + 256-row carry at any size;
        # verify the permutation is total (n distinct positions).
        from sparkksqldbbenchmark_spark.operators.selection import (
            ordered_budget_select,
        )

        t0 = time.time()
        hashed = docs.select(
            "doc_id", F.md5(F.col("doc_id").cast("string")).alias("__h")
        ).withColumn("__one", F.lit(1))
        ranked = ordered_budget_select(
            hashed,
            level=F.expr(
                "cast(conv(substring(__h, 1, 2), 16, 10) as long)"
            ),
            order=[F.asc("__h"), F.asc("doc_id")],
            weight_col="__one",
            budget=1,
            cum_col="shuffle_pos",
        )
        n_pos = ranked.agg(
            F.countDistinct("shuffle_pos").alias("p")
        ).collect()[0]["p"]
        shuf_s = time.time() - t0
        assert n_pos == docs_n, (n_pos, docs_n)
        print(
            f"docs={docs_n:,} det_shuffle={shuf_s:.1f}s "
            f"({int(docs_n / shuf_s):,} docs/s, total permutation)"
        )

        # --- round-6 operators (plans/round6_queries.py shapes) ---

        # sliding-window chunking: narrow explode+substring, zero
        # shuffles — must run at scan speed.
        t0 = time.time()
        n_chunks = (
            docs.select(
                "doc_id",
                F.explode(
                    F.expr(
                        "sequence(0, cast(ceil(greatest(length(text), 1)"
                        " / 150.0) as int) - 1)"
                    )
                ).alias("k"),
                "text",
            )
            .select(
                F.expr(
                    "md5(substring(text, cast(k * 150 + 1 as int), 200))"
                ).alias("h")
            )
            .count()
        )
        chunkop_s = time.time() - t0
        print(
            f"docs={docs_n:,} chunk_stride={chunkop_s:.1f}s "
            f"({n_chunks:,} chunks, {int(docs_n / chunkop_s):,} docs/s)"
        )

        # rolling 7-day active users via the explode trick: user-day
        # de-dup first, then the 7× expansion on user-days only.
        t0 = time.time()
        udays = events.select(
            "user_id", F.to_date("ts").alias("dd")
        ).distinct()
        wau_rows = (
            udays.select(
                "user_id",
                F.explode(F.expr("sequence(0, 6)")).alias("k"),
                "dd",
            )
            .select(
                "user_id",
                F.date_add(F.col("dd"), F.col("k")).alias("active_day"),
            )
            .distinct()
            .groupBy("active_day")
            .agg(F.countDistinct("user_id").alias("wau"))
            .count()
        )
        wau_s = time.time() - t0
        print(
            f"rows={n:,} rolling_wau={wau_s:.1f}s "
            f"({wau_rows} days, {int(n / wau_s):,} rows/s)"
        )

        # rarity-weighted tf top-terms: tokenize explode → two
        # partial-agg shuffles → term join → per-group top-k window.
        t0 = time.time()
        toks_df = cdocs.select(
            F.col("lang").alias("src"),
            F.explode(F.expr(toks)).alias("term"),
        )
        tf = toks_df.groupBy("src", "term").agg(F.count("*").alias("tf"))
        dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
        from pyspark.sql import Window as W

        topterms = (
            tf.join(dfreq, "term")
            .withColumn("score", F.col("tf") * (F.lit(6) - F.col("df")))
            .withColumn(
                "rank",
                F.row_number().over(
                    W.partitionBy("src").orderBy(
                        F.col("score").desc(), F.col("term")
                    )
                ),
            )
            .where(F.col("rank") <= 5)
            .count()
        )
        tfidf_s = time.time() - t0
        print(
            f"docs={docs_n:,} tfidf_topterms={tfidf_s:.1f}s "
            f"({topterms} rows, {int(docs_n / tfidf_s):,} docs/s)"
        )

        # histogram-CDF normalization: scan-side bucketing + bounded
        # histogram prefix sum + broadcast join-back.
        t0 = time.time()
        bl = docs.withColumn(
            "bucket",
            F.floor(F.length("text").cast("double") / 10.0).cast("long"),
        )
        hist = bl.groupBy("bucket").agg(F.count("*").alias("cnt"))
        wcum = W.orderBy("bucket").rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
        cdf = hist.select(
            "bucket",
            F.sum("cnt").over(wcum).alias("cum"),
            F.sum("cnt").over(W.partitionBy()).alias("nn"),
        )
        n_cdf = bl.join(F.broadcast(cdf), "bucket").count()
        cdfop_s = time.time() - t0
        print(
            f"docs={docs_n:,} cdf_normalize={cdfop_s:.1f}s "
            f"({n_cdf:,} rows, {int(docs_n / cdfop_s):,} docs/s)"
        )

        # --- staged round-6: z-order write + 2-D box scan ---
        from sparkksqldbbenchmark_spark.operators.layout import (
            file_range_stats,
            write_zordered,
        )

        t0 = time.time()
        zd = d + "_zorder"
        write_zordered(
            events.select("event_id", "user_id", "value"),
            zd,
            "event_id",
            "user_id",
            bits=8,
            num_files=32,
        )
        zw_s = time.time() - t0
        t0 = time.time()
        xs = {f: r for f, *r in file_range_stats(zd, "event_id")}
        ys = {f: r for f, *r in file_range_stats(zd, "user_id")}
        box = (F.col("event_id").between(n // 10, int(n * 0.35))
               & F.col("user_id").between(150, 525))
        n_box = spark.read.parquet(zd).where(box).count()
        zq_s = time.time() - t0
        x_over = {f for f, (lo, hi) in xs.items()
                  if lo <= int(n * 0.35) and hi >= n // 10}
        b_over = {f for f in x_over
                  if ys[f][0] <= 525 and ys[f][1] >= 150}
        print(
            f"rows={n:,} zorder_write={zw_s:.1f}s "
            f"({int(n / zw_s):,} rows/s) box_scan={zq_s:.1f}s "
            f"({n_box:,} rows, files {len(b_over)}/{len(xs)} touched, "
            f"{len(x_over) - len(b_over)} skipped by 2nd dim)"
        )

        # --- round-6: runtime bloom-filter join, off vs on ---
        # a realistic dim TABLE (materialized once, 1500 rows) —
        # keeping it a distinct() over the fact would make the bloom
        # build re-scan the whole fact and charge the filter for it.
        dim_path = d + "_dim"
        (
            events.select("user_id").distinct()
            .where(F.col("user_id") % 20 == 0)  # 5% of users
            .coalesce(1)
            .write.mode("overwrite").parquet(dim_path)
        )
        dim = spark.read.parquet(dim_path)
        # free executor memory from the earlier measurements before the
        # only payload-bearing shuffle in the file (the off-mode join
        # moves ~6 GB of row payload at 100M rows)
        spark.catalog.clearCache()
        # The fact must carry a payload THROUGH the shuffle: a bare
        # join().count() lets Catalyst prune every column but the key,
        # so neither mode serializes any payload and the filter has
        # nothing to save (measured: off≈on at 100M in that shape).
        # sum(length(payload)) after the join keeps the column alive —
        # the bloom filter's win is exactly the payload bytes it stops
        # from entering the exchange.
        fact = events.withColumn(
            "payload", F.expr("repeat(cast(event_id as string), 8)")
        )
        bloom_confs = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "false",
            "spark.sql.optimizer.runtime.bloomFilter."
            "creationSideThreshold": "100MB",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "0",
        }
        saved = {k: spark.conf.get(k, None) for k in bloom_confs}
        try:
            # Interleave alternating-order off/on pairs and report the
            # median: a single off-then-on pair hands the 'on' run the
            # 'off' run's page-cache/JIT warm-up, biasing the ratio
            # (the ordering flaw the r05 shuffle-partition comparison
            # already avoids).
            import statistics

            times: dict[str, list[float]] = {"off": [], "on": []}
            nj = 0
            for order in (("off", "on"), ("on", "off"), ("off", "on")):
                for mode in order:
                    bloom_confs[
                        "spark.sql.optimizer.runtime.bloomFilter.enabled"
                    ] = "true" if mode == "on" else "false"
                    for k, v in bloom_confs.items():
                        spark.conf.set(k, v)
                    t0 = time.time()
                    row = (
                        fact.join(dim, "user_id")
                        .agg(
                            F.count(F.lit(1)).alias("nj"),
                            F.sum(F.length("payload")).alias("pb"),
                        )
                        .collect()[0]
                    )
                    nj = row["nj"]
                    times[mode].append(time.time() - t0)
            t_off = statistics.median(times["off"])
            t_on = statistics.median(times["on"])
            print(
                f"rows={n:,} bloom_join off={t_off:.1f}s "
                f"on={t_on:.1f}s ({nj:,} joined rows, 5% selective dim, "
                f"~{row['pb'] // max(nj, 1)} B payload through the "
                f"shuffle; median of 3 alternating-order pairs — "
                f"off={[round(t, 1) for t in times['off']]} "
                f"on={[round(t, 1) for t in times['on']]})"
            )
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

        # --- staged round-7 operator shapes (plans/next_round.py) ---
        # batch sessionization: the per-user sort-window chain (lag →
        # running sum → aggregate) — the heaviest new shape (full
        # per-key sort of the event set)
        t0 = time.time()
        wse = W.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.unix_micros(F.col("ts")) - F.lag(
            F.unix_micros(F.col("ts"))
        ).over(wse)
        sess_n = (
            events.withColumn(
                "is_new",
                F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1)
                .otherwise(0),
            )
            .withColumn(
                "session_id",
                F.sum("is_new").over(
                    wse.rowsBetween(W.unboundedPreceding, W.currentRow)
                ),
            )
            .groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .count()
        )
        sess_s = time.time() - t0
        print(
            f"rows={n:,} batch_sessionize={sess_s:.1f}s "
            f"({sess_n:,} sessions, {int(n / sess_s):,} rows/s)"
        )

        # trailing-24h RANGE frame per user: two-pointer moving frame
        # over the same per-user sort
        t0 = time.time()
        wr = (
            W.partitionBy("user_id")
            .orderBy(F.unix_micros("ts"))
            .rangeBetween(-24 * 3600 * 1_000_000, 0)
        )
        # consume the windowed value — a bare count() lets Catalyst
        # prune the unused window entirely (measured: "452M rows/s")
        rng_n = (
            events.select(
                "event_id",
                F.count(F.lit(1)).over(wr).alias("n24"),
            )
            .agg(F.sum("n24"))
            .collect()[0][0]
        )
        rng_s = time.time() - t0
        print(
            f"rows={n:,} range_24h_window={rng_s:.1f}s "
            f"({int(n / rng_s):,} rows/s, sum_n24={rng_n:,})"
        )

        # bitmap day activity: 8-byte mergeable partial-agg state
        t0 = time.time()
        d0 = events.agg(F.min(F.to_date("ts")).alias("d0"))
        # same pruning hazard: consume the bitmaps via popcount-sum
        bm = (
            events.crossJoin(F.broadcast(d0))
            .select(
                "user_id",
                F.datediff(F.to_date("ts"), F.col("d0")).alias("di"),
            )
            .where(F.col("di").between(0, 62))
            .groupBy("user_id")
            .agg(F.bit_or(F.expr("shiftleft(1L, di)")).alias("bm"))
            .agg(
                F.count(F.lit(1)).alias("nu"),
                F.sum(F.bit_count("bm")).alias("days"),
            )
            .collect()[0]
        )
        bm_n = bm["nu"]
        bm_s = time.time() - t0
        print(
            f"rows={n:,} bitmap_activity={bm_s:.1f}s "
            f"({bm_n:,} users, {int(n / bm_s):,} rows/s)"
        )

        # --- staged round-8 operator shapes (plans/next_round.py) ---
        # TWAP: lead() per user + integer integral aggregate — the
        # per-key sort is shared between the window and the aggregate
        t0 = time.time()
        wt = W.partitionBy("user_id").orderBy("ts", "event_id")
        seg = events.select(
            "user_id",
            F.floor(F.col("value") * 100).cast("long").alias("vc"),
            F.unix_micros("ts").alias("t0c"),
            F.lead(F.unix_micros("ts")).over(wt).alias("t1c"),
        ).where(F.col("t1c").isNotNull())
        twap = (
            seg.groupBy("user_id")
            .agg(
                F.expr(
                    "CAST(sum(vc * (t1c - t0c)) DIV sum(t1c - t0c)"
                    " AS BIGINT)"
                ).alias("twap")
            )
            .agg(F.count(F.lit(1)), F.sum("twap"))
            .collect()[0]
        )
        twap_s = time.time() - t0
        print(
            f"rows={n:,} time_weighted_avg={twap_s:.1f}s "
            f"({twap[0]:,} keys, {int(n / twap_s):,} rows/s)"
        )

        # 16-term dyadic EMA: 16 lag() expressions over ONE window —
        # consume the weighted sums so the window is not pruned
        t0 = time.time()
        terms = None
        for i in range(16):
            term = F.coalesce(
                F.lag(F.floor(F.col("value") * 100), i).over(wt),
                F.lit(0),
            ) * (1 << (15 - i))
            terms = term if terms is None else terms + term
        ema_sum = (
            events.select(terms.alias("w"))
            .agg(F.sum("w"))
            .collect()[0][0]
        )
        ema_s = time.time() - t0
        print(
            f"rows={n:,} ema_dyadic={ema_s:.1f}s "
            f"({int(n / ema_s):,} rows/s, checksum={ema_sum})"
        )

        # HLL + bitmap distinct sketches: kilobyte partials per key —
        # should track the plain count-distinct shape
        t0 = time.time()
        sk = (
            events.groupBy("event_type")
            .agg(
                F.expr(
                    "hll_sketch_estimate(hll_sketch_agg(user_id))"
                ).alias("est"),
                F.count_distinct("user_id").alias("exact"),
            )
            .agg(F.sum("est"), F.sum("exact"))
            .collect()[0]
        )
        sk_s = time.time() - t0
        print(
            f"rows={n:,} hll_sketch_agg={sk_s:.1f}s "
            f"({int(n / sk_s):,} rows/s, est_sum={int(sk[0])},"
            f" exact_sum={sk[1]})"
        )

        # multiway series fold, two plans: N-scan join fold (the graded
        # J1 shape) vs 1-scan pivot fold (staged hourly_series_pivot_fold)
        # — consume the merged values so neither plan is pruned
        def consume(df):
            cols = [
                F.sum(F.coalesce(F.col(c), F.lit(0.0)))
                for c in ("cv", "vv", "ev")
            ]
            return df.agg(*cols).collect()[0]

        t0 = time.time()
        def series(et, alias):
            return (
                events.where(F.col("event_type") == et)
                .groupBy(F.window("ts", "1 hour"))
                .agg(F.avg("value").alias(alias))
                .select(F.col("window.start").alias("dt"), alias)
            )
        j = (
            series("click", "cv")
            .join(series("view", "vv"), "dt", "full_outer")
            .join(series("error", "ev"), "dt", "full_outer")
        )
        consume(j)
        join_s = time.time() - t0

        t0 = time.time()
        pv = (
            events.where(F.col("event_type").isin("click", "view", "error"))
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.avg("value").alias("v"))
            .groupBy(F.col("w.start").alias("dt"))
            .pivot("event_type", ["click", "view", "error"])
            .agg(F.first("v"))
            .withColumnRenamed("click", "cv")
            .withColumnRenamed("view", "vv")
            .withColumnRenamed("error", "ev")
        )
        consume(pv)
        pivot_s = time.time() - t0
        print(
            f"rows={n:,} series_fold join={join_s:.1f}s (3 scans) "
            f"pivot={pivot_s:.1f}s (1 scan) — "
            f"{join_s / pivot_s:.2f}x"
        )

        # --- staged round-9 operator shapes (plans/next_round.py) ---
        # Both are document-grain text operators; build n/10 synthetic
        # docs of 24 vocab tokens each (vocab 5k — windows genuinely
        # collide across docs, like a real near-dup corpus).
        docs_n = max(n // 10, 1)
        docs = spark.range(docs_n).select(
            F.col("id").alias("doc_id"),
            F.expr(
                "transform(sequence(0, 23),"
                " i -> concat('w', (id * 7 + i * i) % 5000))"
            ).alias("t"),
        )

        # n-gram LM familiarity: train bigram counts on 90%, score 10%
        t0 = time.time()
        big = docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), i ->"
                    " concat_ws(' ', element_at(t, i),"
                    " element_at(t, i + 1)))"
                )
            ).alias("bg"),
        )
        train = (
            big.where(F.col("doc_id") % 10 != 0)
            .groupBy("bg")
            .agg(F.count(F.lit(1)).alias("cn"))
        )
        lm = (
            big.where(F.col("doc_id") % 10 == 0)
            .join(train, "bg", "left")
            .groupBy("doc_id")
            .agg(F.sum(F.coalesce("cn", F.lit(0))).alias("fam"))
            .agg(F.count(F.lit(1)).alias("nd"), F.sum("fam"))
            .collect()[0]
        )
        lm_s = time.time() - t0
        n_big = docs_n * 23
        print(
            f"rows={n:,} ngram_lm_familiarity={lm_s:.1f}s "
            f"({docs_n:,} docs, {n_big:,} bigrams, "
            f"{int(n_big / lm_s):,} bigrams/s)"
        )

        # exact-substring spans: 8-token window hash -> doc-frequency
        # -> join back -> gaps-and-islands span merge
        t0 = time.time()
        pos = docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 7), i ->"
                    " struct(i AS pos, cast(conv(substring(md5("
                    "concat_ws(' ', slice(t, i, 8))), 1, 15), 16, 10)"
                    " as bigint) AS h))"
                )
            ).alias("pk"),
        ).select("doc_id", "pk.pos", "pk.h")
        freq = pos.groupBy("h").agg(
            F.count_distinct("doc_id").alias("nd")
        )
        shared = pos.join(freq.where(F.col("nd") >= 2), "h").select(
            "doc_id", "pos"
        )
        wq = W.partitionBy("doc_id").orderBy("pos")
        spans = (
            shared.withColumn(
                "grp", F.col("pos") - F.row_number().over(wq)
            )
            .groupBy("doc_id", "grp")
            .agg(F.count(F.lit(1)).alias("kg"))
            .agg(
                F.count(F.lit(1)).alias("spans"),
                F.sum("kg").alias("pos_total"),
            )
            .collect()[0]
        )
        spans_s = time.time() - t0
        n_win = docs_n * 17
        print(
            f"rows={n:,} exact_substring_spans={spans_s:.1f}s "
            f"({docs_n:,} docs, {n_win:,} windows, "
            f"{spans['spans']:,} spans, {int(n_win / spans_s):,} win/s)"
        )

        # as-of tolerance join (graded asof_tolerance_join shape): every
        # event pulls the latest reference reading (every 100th event)
        # for its user, then the tolerance cut drops stale matches —
        # union-tag + last-carry, ONE shuffle on the key, no range join
        from sparkksqldbbenchmark_spark.operators.joins import asof_join

        t0 = time.time()
        ref = (
            events.where(F.col("event_id") % 100 == 0)
            .select(
                "user_id",
                "ts",
                F.col("value").alias("ref_value"),
                F.col("ts").alias("ref_ts"),
            )
        )
        tol = asof_join(
            events.select("event_id", "user_id", "ts", "value"),
            ref,
            on=["user_id"],
            ts_col="ts",
            payload_cols=["ref_value", "ref_ts"],
        )
        matched = (
            tol.where(
                F.col("ref_ts").isNotNull()
                & (
                    F.unix_micros("ts") - F.unix_micros("ref_ts")
                    <= 600 * 1_000_000
                )
            )
            .agg(F.count(F.lit(1)))
            .collect()[0][0]
        )
        asof_s = time.time() - t0
        print(
            f"rows={n:,} asof_tolerance_join={asof_s:.1f}s "
            f"({matched:,} within-tolerance matches, "
            f"{int(n / asof_s):,} rows/s)"
        )

        # round-10 staged operator shapes: BM25 per-doc scoring (scan +
        # 1-row corpus broadcast), interval-coverage sweep (key window +
        # agg), and cross-source quantile normalization (leveled global
        # rank: bounded bucket carries, no global window)
        docs10 = spark.range(max(n // 10, 1)).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7).cast("string").alias("source"),
            (F.col("id") % 541 + 60).alias("n_chars"),
            F.expr(
                "concat_ws(' ', transform(sequence(0, 23),"
                " i -> concat('w', (id * 7 + i * i) % 5000)))"
            ).alias("text"),
        )
        t0 = time.time()
        toks = "split(text, ' ')"
        d10 = docs10.select(
            "doc_id",
            F.expr(f"size({toks})").alias("dl"),
            F.expr(f"size(filter({toks}, x -> x = 'w25'))").alias("tf"),
        )
        corp = d10.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias(
                "avgdl"
            ),
            F.sum(F.when(F.col("tf") > 0, 1).otherwise(0))
            .cast("long")
            .alias("df"),
        )
        bm = (
            d10.crossJoin(F.broadcast(corp))
            .select(
                F.expr(
                    "(((n_docs - df + CAST(0.5 AS DOUBLE))"
                    " / (df + CAST(0.5 AS DOUBLE)))"
                    " * ((tf * CAST(2.2 AS DOUBLE))"
                    " / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))))"
                ).alias("s")
            )
            .agg(F.sum("s"))
            .collect()[0][0]
        )
        bm_s = time.time() - t0
        print(
            f"rows={n:,} bm25_scoring={bm_s:.1f}s "
            f"({max(n // 10, 1):,} docs, "
            f"{int(max(n // 10, 1) / bm_s):,} docs/s)"
        )

        t0 = time.time()
        iv = events.select(
            "user_id",
            "ts",
            F.expr(
                "ts + make_interval(0, 0, 0, 0, 0, 0,"
                " (event_id % 7 + 1) * 60)"
            ).alias("te"),
            "event_id",
        )
        wsw = (
            W.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        cov = (
            iv.withColumn("pm", F.max("te").over(wsw))
            .groupBy("user_id")
            .agg(
                F.sum(
                    F.greatest(
                        F.lit(0).cast("long"),
                        F.unix_micros("te")
                        - F.unix_micros(
                            F.greatest("ts", F.coalesce("pm", "ts"))
                        ),
                    )
                ).alias("covered_us")
            )
            .agg(F.count(F.lit(1)), F.sum("covered_us"))
            .collect()[0]
        )
        cov_s = time.time() - t0
        print(
            f"rows={n:,} interval_coverage={cov_s:.1f}s "
            f"({cov[0]:,} users, {int(n / cov_s):,} rows/s)"
        )

        t0 = time.time()
        wq = W.partitionBy("source").orderBy("n_chars", "doc_id")
        sq = docs10.select(
            "doc_id",
            "source",
            "n_chars",
            F.row_number().over(wq).alias("rs"),
            F.count(F.lit(1)).over(W.partitionBy("source")).alias("ns"),
        )
        qb = docs10.groupBy("n_chars").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        wqb = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, -1)
        qcar = qb.select(
            "n_chars",
            F.coalesce(F.sum("cnt").over(wqb), F.lit(0)).alias("carry"),
        )
        wqi = W.partitionBy("n_chars").orderBy("doc_id")
        qg = docs10.join(F.broadcast(qcar), "n_chars").select(
            F.col("n_chars").alias("gval"),
            (F.col("carry") + F.row_number().over(wqi)).alias("gr"),
        )
        nq = docs10.count()
        qmapped = sq.select(
            "doc_id",
            (
                # CAST BEFORE multiply: 32-bit row_number overflows here
                # at 1M docs (the bug this smoke caught in the staged
                # query)
                F.expr(
                    f"((CAST(rs AS BIGINT) - 1) * ({nq} - 1))"
                    " DIV (CAST(ns AS BIGINT) - 1)"
                )
                + 1
            ).alias("gpos"),
        )
        qn = (
            qmapped.join(qg, qmapped.gpos == qg.gr)
            .agg(F.count(F.lit(1)), F.sum("gval"))
            .collect()[0]
        )
        qn_s = time.time() - t0
        print(
            f"rows={n:,} quantile_normalization={qn_s:.1f}s "
            f"({qn[0]:,} docs mapped, {int(nq / qn_s):,} docs/s)"
        )

        # Python DataSource scan (events_pushdown): full scan+aggregate
        # through the custom-source read path, then a 1%-range query to
        # show pushFilters pruning holds at scale. Single-file layout
        # (the source addresses one parquet; row-range partitions give
        # the parallelism), n/10 rows so the coalesce(1) write stays
        # bounded.
        import os as _os
        import tempfile as _tempfile

        from sparkksqldbbenchmark_spark.sources.pyds import (
            register_python_sources,
        )

        pd_n = max(n // 10, 1)
        pd_file_dir = _tempfile.mkdtemp(prefix="scale_pushdown_")
        (
            spark.read.parquet(d)
            .where(F.col("event_id") < pd_n)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(pd_file_dir + "/tbl")
        )
        one_file = [
            f
            for f in _os.listdir(pd_file_dir + "/tbl")
            if f.endswith(".parquet")
        ][0]
        pd_path = pd_file_dir + "/tbl/" + one_file
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        register_python_sources(spark)
        scratch_full = _tempfile.mkdtemp(prefix="scale_push_full_")
        rpp = max(pd_n // 64, 1)
        t0 = time.time()
        full = (
            spark.read.format("events_pushdown")
            .option("path", pd_path)
            .option("scratch", scratch_full)
            .option("rows_per_part", str(rpp))
            .load()
            .agg(F.count(F.lit(1)), F.sum("user_id"))
            .collect()[0][0]
        )
        pyds_full_s = time.time() - t0
        scratch_rng = _tempfile.mkdtemp(prefix="scale_push_rng_")
        t0 = time.time()
        rng = (
            spark.read.format("events_pushdown")
            .option("path", pd_path)
            .option("scratch", scratch_rng)
            .option("rows_per_part", str(rpp))
            .load()
            .where(F.col("event_id") < pd_n // 100)
            .agg(F.count(F.lit(1)))
            .collect()[0][0]
        )
        pyds_rng_s = time.time() - t0
        parts_read = len(
            [f for f in _os.listdir(scratch_rng) if f.endswith(".marker")]
        )
        print(
            f"rows={n:,} pyds_scan full={pyds_full_s:.1f}s "
            f"({full:,} rows, {int(full / pyds_full_s):,} rows/s) "
            f"1%-range={pyds_rng_s:.1f}s ({rng:,} rows, "
            f"{parts_read}/64 partitions read)"
        )
        shutil.rmtree(pd_file_dir, ignore_errors=True)
        shutil.rmtree(scratch_full, ignore_errors=True)
        shutil.rmtree(scratch_rng, ignore_errors=True)

        # --- round-9 graduate shapes with no multi-scale point yet ---
        # mapInArrow token stats: the RecordBatch-native Python boundary
        # at document grain (n/10 docs, same corpus as the LM shapes) —
        # measures the Arrow hop itself, no pandas, RE2 token counting.
        t0 = time.time()

        def _arrow_batches(it):
            import pyarrow as pa
            import pyarrow.compute as pc

            for batch in it:
                tb = pa.table(batch)
                yield pa.record_batch(
                    {
                        "source": tb["source"].combine_chunks(),
                        "n_chars": pc.cast(
                            pc.utf8_length(tb["text"].combine_chunks()),
                            pa.int64(),
                        ),
                        "n_tokens": pc.cast(
                            pc.count_substring_regex(
                                tb["text"].combine_chunks(),
                                pattern=r"\S+",
                            ),
                            pa.int64(),
                        ),
                    }
                )

        arrow_stats = (
            docs10.select("source", "text")
            .mapInArrow(
                _arrow_batches, "source string, n_chars long, n_tokens long"
            )
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("nd"),
                F.sum("n_chars").alias("ch"),
                F.sum("n_tokens").alias("tk"),
            )
            .collect()
        )
        arrow_s = time.time() - t0
        arrow_docs = sum(r.nd for r in arrow_stats)
        print(
            f"rows={n:,} mapinarrow_token_stats={arrow_s:.1f}s "
            f"({arrow_docs:,} docs, {int(arrow_docs / arrow_s):,} docs/s)"
        )

        # video MJPEG frame extraction: full encode+decode stack inside
        # mapInPandas at n/10,000 videos (codec work is per-video
        # constant; the claim to verify is row-grain parallel scaling
        # of the executor-pinned codec stage, blobs never shuffling).
        from sparkksqldbbenchmark_spark.llm.video import (
            frame_stats_plan,
            synth_video_blobs,
        )

        vids_n = max(n // 10_000, 10)
        t0 = time.time()
        vids = spark.range(vids_n).select(F.col("id").alias("doc_id"))
        vstats = (
            frame_stats_plan(synth_video_blobs(vids), every_n=1)
            .agg(
                F.count(F.lit(1)).alias("frames"),
                F.sum("pixel_sum").alias("ps"),
            )
            .collect()[0]
        )
        video_s = time.time() - t0
        print(
            f"rows={n:,} video_mjpeg_frame_extract={video_s:.1f}s "
            f"({vids_n:,} videos, {vstats['frames']:,} frames, "
            f"{int(vids_n / video_s):,} videos/s)"
        )

        # staged round-11 embedding shapes: the power-iteration matvec
        # pair (s = Xv, w = Xᵀs) and the SemDeDup centroid assignment
        # at n/100 synthetic 64-dim integer vectors — the TESTDATA
        # embeddings table is fixed-size, so the scale question (is
        # the matvec scan-bound?) needs a synthetic matrix.
        emb_n = max(n // 100, 1000)
        qm = (
            spark.range(emb_n)
            .select(
                F.col("id").alias("vec_id"),
                F.explode(F.expr("sequence(0, 63)")).alias("j"),
            )
            .select(
                "vec_id",
                "j",
                (
                    (F.col("vec_id") * 31 + F.col("j") * 17) % 601 - 300
                ).alias("q"),
            )
        )
        qm = qm.localCheckpoint(eager=True)
        t0 = time.time()
        v64 = qm.select("j").distinct().select(
            "j", F.lit(1_000_000).cast("long").alias("v")
        )
        sv = (
            qm.join(F.broadcast(v64), "j")
            .groupBy("vec_id")
            .agg(F.sum(F.col("q") * F.col("v")).alias("s"))
        )
        wv = (
            qm.join(sv, "vec_id")
            .groupBy("j")
            .agg(F.sum(F.col("q") * F.col("s")).alias("w"))
        )
        wn = wv.count()
        matvec_s = time.time() - t0
        print(
            f"rows={n:,} pca_matvec_pair={matvec_s:.1f}s "
            f"({emb_n:,} vecs x 64 dims, {wn} w-rows, "
            f"{int(emb_n / matvec_s):,} vecs/s)"
        )

        t0 = time.time()
        centm = qm.where(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("cid"), "j", F.col("q").alias("cq")
        )
        assigned_n = (
            qm.join(F.broadcast(centm), "j")
            .groupBy("vec_id", "cid")
            .agg(F.sum(F.col("q") * F.col("cq")).alias("dot"))
            .groupBy("vec_id")
            .agg(F.expr("min_by(cid, struct(-dot, cid))").alias("cid"))
            .groupBy("cid")
            .count()
            .count()
        )
        assign_s = time.time() - t0
        print(
            f"rows={n:,} semdedup_assign={assign_s:.1f}s "
            f"({emb_n:,} vecs -> {assigned_n} clusters, "
            f"{int(emb_n / assign_s):,} vecs/s)"
        )

        # staged round-11 graph shape: wedge-join triangle counting on
        # a synthetic bounded-degree graph (ring + chords: degree ~4,
        # the LSH-bucketed regime) at n/10 nodes
        g_n = max(n // 10, 1000)
        ring = spark.range(g_n).select(
            F.col("id").alias("u"),
            ((F.col("id") + 1) % g_n).alias("v"),
        )
        chords = spark.range(g_n).where(F.col("id") % 3 == 0).select(
            F.col("id").alias("u"),
            ((F.col("id") + 2) % g_n).alias("v"),
        )
        gp = (
            ring.unionByName(chords)
            .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
            .distinct()
        )
        gp = gp.localCheckpoint(eager=True)
        t0 = time.time()
        e1 = gp.select(F.col("u").alias("a"), F.col("v").alias("b"))
        e2 = gp.select(F.col("u").alias("b"), F.col("v").alias("c"))
        e3 = gp.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
        tri_n = (
            e1.join(e2, "b")
            .join(
                e3,
                (F.col("a") == F.col("a3"))
                & (F.col("c") == F.col("c3")),
            )
            .count()
        )
        tri_s = time.time() - t0
        print(
            f"rows={n:,} triangle_wedge_join={tri_s:.1f}s "
            f"({g_n:,} nodes, {tri_n:,} triangles, "
            f"{int(g_n / tri_s):,} nodes/s)"
        )

        # staged round-11 kmeans shape: the Lloyd-step centroid UPDATE
        # (assignment above is shared with semdedup) — per-(cluster,
        # dim) exact-integer sums, one shuffle on the assignment key
        t0 = time.time()
        assign16 = (
            qm.join(F.broadcast(centm), "j")
            .groupBy("vec_id", "cid")
            .agg(F.sum(F.col("q") * F.col("cq")).alias("dot"))
            .groupBy("vec_id")
            .agg(F.expr("min_by(cid, struct(-dot, cid))").alias("cid"))
        )
        new_cent_n = (
            qm.join(assign16, "vec_id")
            .groupBy("cid", "j")
            .agg(
                F.count(F.lit(1)).alias("sz"),
                F.sum("q").alias("qsum"),
            )
            .count()
        )
        kmeans_s = time.time() - t0
        print(
            f"rows={n:,} kmeans_lloyd_update={kmeans_s:.1f}s "
            f"({emb_n:,} vecs -> {new_cent_n} centroid cells, "
            f"{int(emb_n / kmeans_s):,} vecs/s)"
        )

        # staged round-11 k-core shape: 3 degree-peel iterations on the
        # same bounded-degree graph — each round one degree aggregate +
        # one semi-join against the surviving vertex set, lineage cut
        # per round exactly as the staged kcore_dupgraph_3peel plan
        t0 = time.time()
        alive = gp
        surv = -1
        for _ in range(3):
            und = alive.select(F.col("u").alias("x")).unionByName(
                alive.select(F.col("v").alias("x"))
            )
            keep = (
                und.groupBy("x")
                .agg(F.count(F.lit(1)).alias("deg"))
                .where(F.col("deg") >= 2)
                .select("x")
            )
            alive = (
                alive.join(
                    keep.select(F.col("x").alias("u")), "u", "semi"
                )
                .join(keep.select(F.col("x").alias("v")), "v", "semi")
                .localCheckpoint(eager=True)
            )
            surv = alive.count()
        kcore_s = time.time() - t0
        print(
            f"rows={n:,} kcore_3peel={kcore_s:.1f}s "
            f"({g_n:,} nodes, {surv:,} surviving edges, "
            f"{int(g_n / kcore_s):,} nodes/s)"
        )

    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(d + "_docs", ignore_errors=True)
        shutil.rmtree(d + "_zorder", ignore_errors=True)
        shutil.rmtree(d + "_dim", ignore_errors=True)




def round13_family_probes(spark, n: int) -> None:
    """Round-13 staged-shape probes: the leveled global rank (RFM's
    core), the bucketed suffix sort + LCP adjacency, CC hash-to-min
    with pointer jumping on a bounded-degree graph, and the
    broadcast-probe integer-dot kNN. Self-contained synthetic inputs;
    run via `python tools/scale_smoke.py N --r13`."""
    import time as _t

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    # leveled global rank over n event-like rows (cents domain 0..99999)
    t0 = _t.time()
    ev = spark.range(n).select(
        F.col("id").alias("rid"),
        ((F.col("id") * 7919) % 100000).alias("cents"),
    )
    hist = ev.groupBy(F.expr("cents DIV 64").alias("b")).agg(
        F.count(F.lit(1)).alias("c")
    )
    wb = W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)
    carry = hist.select(
        "b", F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("carry")
    )
    wi = W.partitionBy(F.expr("cents DIV 64")).orderBy("cents", "rid")
    ranked = (
        ev.withColumn("b", F.expr("cents DIV 64"))
        .join(F.broadcast(carry), "b")
        .select(
            "rid", (F.col("carry") + F.row_number().over(wi)).alias("rk")
        )
    )
    chk = ranked.agg(
        F.count(F.lit(1)).alias("n"), F.sum("rk").alias("s")
    ).collect()[0]
    assert chk["s"] == n * (n + 1) // 2, "rank is not a permutation"
    rank_s = _t.time() - t0
    print(
        f"rows={n:,} leveled_global_rank={rank_s:.1f}s "
        f"({int(n / rank_s):,} rows/s, permutation verified)"
    )

    # bucketed suffix sort + adjacent LCP over n/100 word-salad docs
    vocab = ("key agg row scan slow fast table value part hash merge "
             "batch window spark order data column join small line "
             "customer query big the group sort stream filter").split()
    arr = "array(" + ",".join(f"'{w}'" for w in vocab) + ")"
    docs_n = max(n // 100, 10_000)
    docs = spark.range(docs_n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, 60), i -> "
            f"element_at({arr}, cast(pmod(hash(id * 31 + i), "
            f"{len(vocab)}) + 1 as int))))"
        ).alias("text"),
    )
    t0 = _t.time()
    pos = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "case when length(text) >= 16"
                " then sequence(1, length(text) - 15)"
                " else array() end"
            )
        ).alias("p"),
        "text",
    ).select(
        "doc_id", "p", F.expr("substring(text, p, 16)").alias("suf")
    ).withColumn("bkt", F.expr("substring(suf, 1, 4)"))
    wbk = W.partitionBy("bkt").orderBy("suf", "doc_id", "p")
    lcp = F.size(
        F.expr(
            "filter(sequence(1, 16), i ->"
            " substring(suf, 1, i) = substring(prev, 1, i))"
        )
    )
    stats = (
        pos.select("bkt", "suf", F.lag("suf").over(wbk).alias("prev"))
        .where(F.col("prev").isNotNull())
        .agg(
            F.count(F.lit(1)).alias("pairs"),
            F.max(lcp).alias("max_lcp"),
            F.sum(lcp.cast("long")).alias("total_lcp"),
        )
        .collect()[0]
    )
    suf_s = _t.time() - t0
    n_suf = docs_n * 330
    print(
        f"docs={docs_n:,} suffix_lcp_sort={suf_s:.1f}s "
        f"(~{n_suf:,} suffixes, {int(n_suf / suf_s):,} suffixes/s, "
        f"max_lcp={stats['max_lcp']})"
    )

    # CC hash-to-min + pointer jump, 2 rounds, ring+chords graph
    g_n = max(n // 10, 10_000)
    ring = spark.range(g_n).select(
        F.col("id").alias("u"), ((F.col("id") + 1) % g_n).alias("v")
    )
    chords = spark.range(g_n).where(F.col("id") % 3 == 0).select(
        F.col("id").alias("u"), ((F.col("id") + 2) % g_n).alias("v")
    )
    pairs = (
        ring.unionByName(chords)
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
    )
    edges = pairs.unionByName(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    t0 = _t.time()
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("p")
    )
    for _ in range(2):
        nbr = (
            edges.join(
                labels.select(
                    F.col("node").alias("v"), F.col("p").alias("pv")
                ),
                "v",
            )
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("pv").alias("nm"))
        )
        stepped = labels.join(nbr, "node", "left").select(
            "node",
            F.least("p", F.coalesce("nm", F.col("p"))).alias("p"),
        )
        labels = (
            stepped.join(
                stepped.select(
                    F.col("node").alias("p"), F.col("p").alias("pp")
                ),
                "p",
            )
            .select("node", F.col("pp").alias("p"))
            .localCheckpoint(eager=True)
        )
    n_comp = labels.select("p").distinct().count()
    cc_s = _t.time() - t0
    print(
        f"rows={n:,} cc_pointer_jump={cc_s:.1f}s "
        f"({g_n:,} nodes, {n_comp:,} components after 2 rounds, "
        f"{int(g_n / cc_s):,} nodes/s)"
    )

    # broadcast-probe integer-dot kNN: 20 probes x n/100 vectors
    emb_n = max(n // 100, 10_000)
    vecs = spark.range(emb_n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), j ->"
            " CAST((id * 31 + j * 17) % 601 - 300 AS BIGINT))"
        ).alias("q"),
    )
    probes = vecs.where(F.col("vec_id") % (emb_n // 20) == 0).select(
        F.col("vec_id").alias("qid"), F.col("q").alias("qq")
    )
    t0 = _t.time()
    nn = (
        vecs.crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.expr(
                "aggregate(zip_with(qq, q, (a, b) -> a * b),"
                " 0L, (acc, x) -> acc + x)"
            ).alias("dot"),
        )
        .groupBy("qid")
        .agg(F.expr("min_by(vec_id, struct(-dot, vec_id))").alias("nn"))
        .count()
    )
    knn_s = _t.time() - t0
    print(
        f"rows={n:,} knn_broadcast_dots={knn_s:.1f}s "
        f"({emb_n:,} vecs x {nn} probes, "
        f"{int(emb_n / knn_s):,} vecs/s)"
    )

if __name__ == "__main__":
    main()
