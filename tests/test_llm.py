"""LLM-pipeline operator tests: planted-duplicate recall for the dedup
family, multimodal Arrow plumbing, ANN sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.llm import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base + " today"),  # near dup of 0
        (3, "completely different words about spark query engines and state"),
        (4, "another unrelated document mentioning weather stations and wind"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(docs):
    groups = dedup.exact_dedup_groups(docs, "text", "doc_id").collect()
    by_count = sorted(g["dup_count"] for g in groups)
    assert by_count == [1, 1, 1, 2]
    dup_group = [g for g in groups if g["dup_count"] == 2][0]
    assert dup_group["canonical_id"] == 0


def test_minhash_finds_planted_near_dup(docs):
    pairs = dedup.minhash_lsh_pairs(
        docs, "text", "doc_id", threshold=0.5
    ).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in found  # exact dup always collides, jaccard 1.0
    assert (0, 2) in found or (1, 2) in found  # near dup
    assert all(a < b for a, b in found)
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard_sim"] for r in pairs}
    assert jac[(0, 1)] == 1.0


def test_simhash_hamming_zero_for_exact_dup(docs):
    pairs = dedup.simhash_pairs(docs, "text", "doc_id").collect()
    ham = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    assert ham.get((0, 1)) == 0


def test_ngram_jaccard_planted(docs):
    pairs = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", shingle_n=3, threshold=0.4
    ).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in found


def test_lang_id_real_sentences(spark):
    rows = [
        (0, "the cat and the dog went to the house in a hurry"),
        (1, "der hund und die katze sind nicht mit dem mann"),
        (2, "le chat est dans la maison et les oiseaux"),
        (3, "el perro y el gato es un animal en la casa"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["predicted_lang"]
        for r in text.with_lang_id(df).collect()
    }
    assert got == {0: "en", 1: "de", 2: "fr", 3: "es"}


def test_multimodal_feature_plumbing(spark, docs):
    blobs = multimodal.attach_media_blobs(docs)
    assert dict(blobs.dtypes)["payload"] == "binary"
    feats = multimodal.extract_features(blobs).collect()
    assert len(feats) == 5
    for r in feats:
        assert r["n_bytes"] == 16  # md5 digest bytes
        assert len(r["features"]) == multimodal.FEATURE_DIM
        assert abs(sum(r["features"]) - 1.0) < 1e-9
    # determinism: same text → same features
    by_id = {r["doc_id"]: tuple(r["features"]) for r in feats}
    assert by_id[0] == by_id[1]


def test_multimodal_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_blob(b"xx", "image")


def test_frame_sample_only_videos(spark, docs):
    blobs = multimodal.attach_media_blobs(docs)
    frames = multimodal.frame_sample_plan(blobs).collect()
    video_ids = {
        r["doc_id"]
        for r in blobs.where(F.col("media_type") == "video").collect()
    }
    assert {r["doc_id"] for r in frames} <= video_ids
    assert all(r["frame_idx"] % 2 == 0 for r in frames)


def test_cosine_topk_vectorized_matches_codegen_bitexact(spark):
    """The Arrow mapInPandas cosine_topk and the pure-JVM codegen twin
    must agree to the BIT (not approximately): the vectorized fold adds
    one product term per dimension sequentially in float64, which is the
    same IEEE operation sequence as the unrolled codegen dot. Any drift
    here would silently break the DuckDB oracle hash."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    fast = sorted(
        map(tuple, similarity.cosine_topk(emb, num_queries=7, k=9).collect())
    )
    slow = sorted(
        map(
            tuple,
            similarity.cosine_topk_codegen(
                emb, num_queries=7, k=9
            ).collect(),
        )
    )
    assert fast == slow


def test_cosine_topk_local_merge_partition_independent(spark):
    """Local-top-k-then-merge must give identical results however the
    candidates are partitioned (top-k is distributive under the total
    order (sim desc, cand_id asc))."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    one = sorted(
        map(
            tuple,
            similarity.cosine_topk(
                emb.coalesce(1), num_queries=4, k=6
            ).collect(),
        )
    )
    many = sorted(
        map(
            tuple,
            similarity.cosine_topk(
                emb.repartition(13), num_queries=4, k=6
            ).collect(),
        )
    )
    assert one == many


def test_ann_subset_of_brute_force(spark):
    """LSH top-k results are always genuine neighbors: every (query, cand)
    scored by ANN appears in the brute-force candidate ordering with the
    same cosine."""
    import os

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bf = similarity.cosine_topk(emb, num_queries=5, k=50).collect()
    ann = similarity.ann_lsh_topk(emb, num_queries=5, k=5).collect()
    bf_cos = {(r["query_id"], r["cand_id"]): r["cosine_sim"] for r in bf}
    for r in ann:
        key = (r["query_id"], r["cand_id"])
        if key in bf_cos:
            assert abs(bf_cos[key] - r["cosine_sim"]) < 1e-9


def test_connected_components_transitive_chain(spark):
    """a-b, b-c edges must land a, b, c in ONE component (transitivity —
    the property pairwise dedup alone doesn't give you)."""
    from sparkksqldbbenchmark_spark.llm.cluster import (
        connected_components_min_label,
    )

    nodes = spark.createDataFrame([(i,) for i in range(6)], "id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "doc_a long, doc_b long"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components_min_label(
            nodes, edges, src_col="doc_a", dst_col="doc_b"
        ).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}


def test_ngram_prefix_filter_equals_bruteforce(spark):
    """The prefix-filtered exact-Jaccard path returns EXACTLY the pairs a
    brute-force all-pairs Jaccard finds (candidate completeness + exact
    verify) on the sf0.001 corpus."""
    import itertools

    docs_df = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    got = {
        (r.doc_a, r.doc_b): r.jaccard_sim
        for r in dedup.ngram_jaccard_pairs(
            docs_df, "text", "doc_id", shingle_n=5, threshold=0.4
        ).collect()
    }

    def shingles(t):
        import re

        toks = re.findall(r"\S+", t)
        return {
            " ".join(toks[i : i + 5]) for i in range(max(len(toks) - 4, 1))
        }

    rows = [(r.doc_id, shingles(r.text)) for r in docs_df.collect()]
    want = {}
    for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter)
        if j >= 0.4:
            a, b = min(ia, ib), max(ia, ib)
            want[(a, b)] = j
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12


def test_multimodal_resize_geometry(spark, docs):
    """resize_media: aspect-preserving fit into the target box, never
    upscaled, payload truncated to the scaled length (hex round-trip)."""
    blobs = multimodal.attach_media_blobs(docs)
    out = {r["doc_id"]: r for r in
           multimodal.resize_media(blobs, 128, 128).collect()}
    src = {r["doc_id"]: r for r in blobs.collect()}
    assert set(out) == set(src)
    for doc_id, r in out.items():
        w, h = r["orig_width"], r["orig_height"]
        scale = min(128 / w, 128 / h, 1.0)
        assert r["new_width"] == int(w * scale)
        assert r["new_height"] == int(h * scale)
        # never upscale; fits in the box unless already smaller
        assert r["new_width"] <= max(128, w)
        assert r["new_height"] <= max(128, h)
        expect_len = max(1, int(len(src[doc_id]["payload"]) * scale))
        assert r["n_bytes"] == expect_len
        assert r["payload_hex"] == (
            src[doc_id]["payload"][:expect_len].hex().upper()
        )


def test_incremental_lsh_matches_directional_best(spark):
    """incremental_lsh_matches: finds each new doc's best corpus match,
    never pairs corpus docs with each other, and drops new docs with no
    near-duplicate."""
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark woods tonight")
    corpus = spark.createDataFrame(
        [(1, base), (2, base + " again"), (3, "totally unrelated words "
          "about spark shuffles and parquet row groups here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, base), (11, "nothing in common with anything at all "
          "zebra quantum pickle umbrella seventeen")],
        "doc_id long, text string",
    )
    got = {r["new_id"]: r for r in dedup.incremental_lsh_matches(
        new, corpus, "text", "doc_id").collect()}
    assert set(got) == {10}          # doc 11 has no match → no row
    assert got[10]["match_id"] == 1  # exact copy beats near-copy; tie→min id
    assert got[10]["jaccard_sim"] == 1.0


def test_png_codec_roundtrip_all_filters():
    """encode_png cycles filter types 0-4 per scanline; decode must
    reproduce every byte (gray and RGB) — a stub or partial unfilter
    implementation cannot pass."""
    from sparkksqldbbenchmark_spark.llm import codecs

    for d in (0, 2, 88, 123456):
        w, h = d % 16 + 4, d % 12 + 4
        rows = [
            bytes((d + 7 * x + 13 * y) % 256 for x in range(w))
            for y in range(h)
        ]
        assert codecs.decode_png(codecs.encode_png(rows)) == (w, h, 1, rows)
    rgb = [bytes((y * 31 + i) % 256 for i in range(30)) for y in range(9)]
    assert codecs.decode_png(codecs.encode_png(rgb, channels=3)) == (
        10, 9, 3, rgb,
    )


def test_png_codec_roundtrip_property():
    """Property: ANY 8-bit grayscale image round-trips bit-exactly
    through encode_png/decode_png — random dimensions and pixel content,
    so the filter arithmetic can't overfit the deterministic fixtures."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sparkksqldbbenchmark_spark.llm import codecs

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 18),
        seed=st.integers(0, 2**31),
    )
    def roundtrip(w, h, seed):
        rows = [
            bytes(
                (seed + 97 * x + 31 * y + (x * y) // 3) % 256
                for x in range(w)
            )
            for y in range(h)
        ]
        assert codecs.decode_png(codecs.encode_png(rows)) == (w, h, 1, rows)

    roundtrip()


def test_png_codec_rejects_corruption_and_unsupported():
    from sparkksqldbbenchmark_spark.llm import codecs

    png = bytearray(codecs.encode_png([b"\x01\x02\x03", b"\x04\x05\x06"]))
    png[-6] ^= 0xFF  # flip a bit inside IEND's CRC
    with pytest.raises(codecs.UnsupportedMediaError, match="CRC"):
        codecs.decode_png(bytes(png))
    with pytest.raises(codecs.UnsupportedMediaError, match="not a PNG"):
        codecs.decode_png(b"JFIF....")
    # malformed input must NEVER leak raw struct/zlib errors
    whole = bytes(codecs.encode_png([b"\x01\x02\x03"]))
    # cut inside the IDAT body (magic 8 + IHDR chunk 25 → IDAT at 33)
    with pytest.raises(codecs.UnsupportedMediaError, match="truncated"):
        codecs.decode_png(whole[:43])
    with pytest.raises(codecs.UnsupportedMediaError, match="missing IHDR"):
        codecs.decode_png(codecs.PNG_MAGIC)
    wav = bytearray(codecs.encode_wav([1, 2, 3]))
    wav[-2:] = b"\x00"  # odd-length data chunk... truncated payload
    with pytest.raises(codecs.UnsupportedMediaError):
        codecs.decode_wav(bytes(wav))


def test_wav_codec_roundtrip_and_decode_blob_dispatch():
    from sparkksqldbbenchmark_spark.llm import codecs

    s = [(7 * 31 + i * 17) % 65536 - 32768 for i in range(25)]
    assert codecs.decode_wav(codecs.encode_wav(s)) == (8000, 1, s)
    st = multimodal.decode_blob(codecs.encode_wav(s), "audio")
    assert st["codec"] == "wav" and st["unit_sum"] == sum(s)
    st2 = multimodal.decode_blob(
        codecs.encode_png([bytes([10, 20]), bytes([30, 40])]), "image"
    )
    assert st2["codec"] == "png" and st2["unit_sum"] == 100
    # JPEG magic now dispatches to the real decoder — a garbage body is
    # a decode failure, not an unimplemented format
    with pytest.raises(codecs.UnsupportedMediaError):
        multimodal.decode_blob(b"\xff\xd8\xffJPEG", "image")
    with pytest.raises(NotImplementedError):
        multimodal.decode_blob(b"\x00\x00\x00\x18ftypmp42", "video")


def test_jpeg_codec_block_constant_exact_roundtrip():
    """Block-constant tiles with the DC-exact default quant table (DC
    step 8 divides 8·(v−128)) must survive the lossy DCT path EXACTLY —
    the property the graded decode row's analytic oracle relies on."""
    from sparkksqldbbenchmark_spark.llm import codecs

    for doc_id in (2, 5, 8, 11, 92, 227):
        bw, bh = doc_id % 4 + 2, doc_id % 3 + 2
        rows = [
            bytes(
                (doc_id + 11 * (x // 8) + 29 * (y // 8)) % 256
                for x in range(bw * 8)
            )
            for y in range(bh * 8)
        ]
        w, h, ch, dec = codecs.decode_jpeg(codecs.encode_jpeg(rows))
        assert (w, h, ch) == (bw * 8, bh * 8, 1)
        assert dec == rows, f"doc_id={doc_id} not exact"


def test_jpeg_codec_lossy_roundtrip_bounded_error():
    """Full AC path (nonzero coefficients, ZRL runs, EXTEND sign
    decode, byte stuffing): with an all-ones quant table the only loss
    is coefficient rounding, so max pixel error must stay ≤ 2; odd
    (non-multiple-of-8) dims exercise edge padding + crop."""
    import hashlib

    from sparkksqldbbenchmark_spark.llm import codecs

    for w, h in ((8, 8), (24, 16), (17, 13), (40, 33)):
        rows = [
            bytes(
                hashlib.md5(f"{w * h}/{x}/{y}".encode()).digest()[0]
                for x in range(w)
            )
            for y in range(h)
        ]
        dw, dh, ch, dec = codecs.decode_jpeg(
            codecs.encode_jpeg(rows, quant=[1] * 64)
        )
        assert (dw, dh, ch) == (w, h, 1)
        err = max(
            abs(a - b) for ra, rb in zip(rows, dec) for a, b in zip(ra, rb)
        )
        assert err <= 2, f"{w}x{h}: near-lossless error {err}"


def test_jpeg_codec_rejects_corruption_and_unsupported():
    from sparkksqldbbenchmark_spark.llm import codecs

    good = codecs.encode_jpeg([bytes(range(16)) for _ in range(16)])
    with pytest.raises(codecs.UnsupportedMediaError, match="not a JPEG"):
        codecs.decode_jpeg(b"\x89PNG....")
    with pytest.raises(codecs.UnsupportedMediaError, match="truncated"):
        codecs.decode_jpeg(good[:40])
    # flip SOF0 into SOF2 (progressive) — scan for the marker
    prog = bytearray(good)
    i = prog.index(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(codecs.UnsupportedMediaError, match="progressive"):
        codecs.decode_jpeg(bytes(prog))
    # truncate inside the entropy stream (drop EOI + trailing bytes)
    with pytest.raises(codecs.UnsupportedMediaError):
        codecs.decode_jpeg(good[:-8])
    # decode_blob dispatch for a real JPEG
    st = multimodal.decode_blob(good, "image")
    assert st["codec"] == "jpeg" and st["n_units"] == 256


def test_multimodal_resize_null_payload_stays_null(spark):
    """A NULL blob is missing data, not a zero-byte image: n_bytes and
    payload_hex must come back NULL (the oracle's md5(NULL) agrees),
    while the doc_id-derived geometry stays populated."""
    docs = spark.createDataFrame(
        [(1, None), (2, "hello world")], "doc_id long, text string"
    )
    blobs = multimodal.attach_media_blobs(docs)
    out = {r["doc_id"]: r for r in
           multimodal.resize_media(blobs, 128, 128).collect()}
    assert out[1]["n_bytes"] is None
    assert out[1]["payload_hex"] is None
    assert out[1]["new_width"] == int(
        (1 % 640 + 16) * min(128 / (1 % 640 + 16), 128 / (1 % 480 + 16), 1.0)
    )
    assert out[2]["n_bytes"] is not None
    assert out[2]["payload_hex"]


def test_jpeg_fill_bytes_and_short_sof(spark=None):
    """T.81 B.1.1.2 fill bytes before a marker are legal and must not
    break the marker walk; a truncated SOF0 surfaces as
    UnsupportedMediaError, never a raw IndexError (review findings)."""
    from sparkksqldbbenchmark_spark.llm import codecs

    rows = [bytes(range(16)) for _ in range(16)]
    good = codecs.encode_jpeg(rows)
    # insert one fill 0xFF before the DQT marker
    i = good.index(b"\xff\xdb")
    padded = good[:i] + b"\xff" + good[i:]
    # fill bytes must be transparent: padded decodes exactly like the
    # unpadded stream (the default table is lossy on this gradient, so
    # compare decode-to-decode, not decode-to-source)
    assert codecs.decode_jpeg(padded) == codecs.decode_jpeg(good)
    # SOF0 body truncated to 8 bytes (missing the quant-table id byte)
    j = good.index(b"\xff\xc0")
    trunc = good[: j + 2] + b"\x00\x0a" + good[j + 4 : j + 4 + 8]
    with pytest.raises(codecs.UnsupportedMediaError, match="short SOF0"):
        codecs.decode_jpeg(trunc)


def test_jpeg_color_block_constant_exact_roundtrip():
    """4:2:0 color: block-constant 16×16 RGB tiles survive the FULL
    pipeline (RGB→YCbCr, 2×2 subsample, DCT, Huffman, decode, upsample,
    YCbCr→RGB) landing exactly on the double-converted tile constants —
    the property the graded decode row's cconv/cback oracle CTEs
    replay in SQL."""
    from sparkksqldbbenchmark_spark.llm import codecs

    for doc_id in (3, 7, 11, 19, 227):
        tw, th = (doc_id % 6) // 2 + 1, (doc_id % 9) // 3 + 1
        rows = [
            bytes(
                v
                for x in range(tw * 16)
                for v in (
                    (doc_id + 7 * (x // 16) + 13 * (y // 16)) % 256,
                    (doc_id * 3 + 11 * (x // 16) + 5 * (y // 16)) % 256,
                    (doc_id * 7 + 17 * (x // 16) + 3 * (y // 16)) % 256,
                )
            )
            for y in range(th * 16)
        ]
        w, h, ch, dec = codecs.decode_jpeg(
            codecs.encode_jpeg(rows, channels=3)
        )
        assert (w, h, ch) == (tw * 16, th * 16, 3)
        exp = [
            bytes(
                v
                for x in range(tw * 16)
                for v in codecs.ycbcr_to_rgb(
                    *codecs.rgb_to_ycbcr(
                        rows[y][3 * x],
                        rows[y][3 * x + 1],
                        rows[y][3 * x + 2],
                    )
                )
            )
            for y in range(th * 16)
        ]
        assert dec == exp, f"doc_id={doc_id} color not exact"


def test_jpeg_color_lossy_luma_bounded_error():
    """Gray-in-RGB noise (R=G=B → constant chroma) through the color
    path with all-ones quant tables: chroma survives subsampling
    losslessly and luma error stays ≤ 3 — exercises the interleaved
    MCU decode, upsampling and both conversions on non-constant
    content; odd dims exercise MCU padding + crop."""
    import hashlib

    from sparkksqldbbenchmark_spark.llm import codecs

    for w, h in ((16, 16), (24, 17), (33, 20)):
        rows = [
            bytes(
                hashlib.md5(f"{w}/{x}/{y}".encode()).digest()[0]
                for x in range(w)
                for _ in range(3)
            )
            for y in range(h)
        ]
        dw, dh, ch, dec = codecs.decode_jpeg(
            codecs.encode_jpeg(
                rows, channels=3, quant=[1] * 64, chroma_quant=[1] * 64
            )
        )
        assert (dw, dh, ch) == (w, h, 3)
        err = max(
            abs(a - b) for ra, rb in zip(rows, dec) for a, b in zip(ra, rb)
        )
        assert err <= 3, f"{w}x{h}: color near-lossless error {err}"


def test_jpeg_restart_intervals_transparent_and_validated():
    """DRI/RSTn segmentation (common in real camera/encoder output):
    restart markers byte-align the stream and reset DC predictors, and
    must be fully transparent to decoded pixels in both grayscale and
    color; a wrong-sequence restart marker is a decode error."""
    from sparkksqldbbenchmark_spark.llm import codecs

    rows = [
        bytes((7 + 11 * (x // 8) + 29 * (y // 8)) % 256 for x in range(40))
        for y in range(24)
    ]
    plain = codecs.decode_jpeg(codecs.encode_jpeg(rows))
    for ri in (1, 2, 5):
        seg = codecs.encode_jpeg(rows, restart_interval=ri)
        assert codecs.decode_jpeg(seg) == plain
    # corrupt the first restart marker's index → sequence error
    seg = bytearray(codecs.encode_jpeg(rows, restart_interval=1))
    i = seg.index(b"\xff\xd0")
    seg[i + 1] = 0xD4
    with pytest.raises(codecs.UnsupportedMediaError, match="restart"):
        codecs.decode_jpeg(bytes(seg))
    # color path
    crows = [
        bytes(
            v
            for x in range(32)
            for v in ((x // 16 * 90) % 256, 30, (y // 16 * 50) % 256)
        )
        for y in range(32)
    ]
    cplain = codecs.decode_jpeg(codecs.encode_jpeg(crows, channels=3))
    cseg = codecs.decode_jpeg(
        codecs.encode_jpeg(crows, channels=3, restart_interval=1)
    )
    assert cseg == cplain
