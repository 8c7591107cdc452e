"""Hand-case tests for the round-6-queue library ops (queued6.py's
new entries): sign-pack/Hamming ANN, the linear quality classifier,
and blocked edit-distance near-dup — the brute-force-replay style of
test_datapipe_property.py on constructed micro-fixtures."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from ecmm428_pycart_spark.datapipe import similarity
from ecmm428_pycart_spark.datapipe.dedup import edit_neardup_pairs
from ecmm428_pycart_spark.datapipe.text import classifier_scores


def _emb(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v])
         for i, v in enumerate(vecs)])


def test_sign_pack_known_bits(spark):
    # dims 0,2,5 positive -> bits 0,2,5 -> 1+4+32 = 37; negatives and
    # exact zeros contribute nothing.
    v = [1.0, -1.0, 0.5, 0.0, -2.0, 3.0] + [0.0] * 57
    df = _emb(spark, [v])
    code = df.select(similarity.sign_pack("embedding").alias("c")) \
        .head().c
    assert code == 37


def test_sign_pack_bit62_no_overflow(spark):
    v = [0.0] * 62 + [1.0, 9.0]  # dim 62 set; dim 63 NOT coded
    df = _emb(spark, [v])
    code = df.select(similarity.sign_pack("embedding").alias("c")) \
        .head().c
    assert code == 1 << 62


def test_sign_pack_bits_validation():
    with pytest.raises(ValueError):
        similarity.sign_pack("embedding", bits=64)
    with pytest.raises(ValueError):
        similarity.sign_pack("embedding", bits=0)


def test_binary_hamming_topk_matches_bruteforce(spark):
    import random
    rng = random.Random(42)
    vecs = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(40)]
    df = _emb(spark, vecs)
    out = similarity.binary_hamming_topk(
        df, similarity.query_vector(df, 0), k=5, shortlist=12).collect()
    # Python replay: pack, hamming-shortlist, cosine rerank.
    def pack(v):
        return sum(1 << i for i in range(63) if v[i] > 0)
    q = vecs[0]
    qc = pack(q)
    ham = sorted((bin(pack(v) ^ qc).count("1"), i)
                 for i, v in enumerate(vecs))[:12]
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / math.sqrt(sum(x * x for x in a)
                             * sum(x * x for x in b))
    rer = sorted(((-round(cos(vecs[i], q), 6), i) for _, i in ham))[:5]
    expect = [(i, -c) for c, i in rer]
    got = [(r.vec_id, r.cos) for r in out]
    assert got == [(i, pytest.approx(c, abs=1e-9)) for i, c in expect]


def test_classifier_keep_is_sign_of_raw(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(
            ["alpha beta gamma", "delta epsilon", "alpha alpha alpha",
             "", "   "])])
    out = classifier_scores(docs, dim=16).collect()
    # empty/whitespace docs are filtered (no tokens)
    assert {r.doc_id for r in out} == {0, 1, 2}
    for r in out:
        assert r.keep == (r.raw >= 0)
        # sigmoid bounds + monotone consistency with the keep rule
        assert 0.0 < r.score < 1.0
        assert (r.score >= 0.5) == r.keep
        # raw is the exact integer dot product of counts and weights
        assert isinstance(r.raw, int)


def test_classifier_score_matches_python_sigmoid(spark):
    docs = spark.createDataFrame([Row(doc_id=0, text="x y z x")])
    r = classifier_scores(docs, dim=8).head()
    expect = 1.0 / (1.0 + math.exp(-r.raw / (10000.0 * r.n_tokens)))
    assert r.score == pytest.approx(expect, abs=1e-12)
    assert r.n_tokens == 4


def test_edit_neardup_finds_typo_pair(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    typo = base.replace("jumps", "jumbs")          # 1 edit, same prefix
    far = "a completely different document about pyspark engines ok"
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=base), Row(doc_id=2, text=typo),
         Row(doc_id=3, text=far)])
    pairs = edit_neardup_pairs(docs, max_dist=8).collect()
    assert [(p.doc_a, p.doc_b, p.dist) for p in pairs] == [(1, 2, 1)]


def test_edit_neardup_prefix_block_miss(spark):
    # Identical tails but different 12-char prefixes -> different
    # blocks -> no pair (the documented recall trade of blocking).
    a = "aaaaaaaaaaaa shared tail of the document body here"
    b = "bbbbbbbbbbbb shared tail of the document body here"
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=a), Row(doc_id=2, text=b)])
    assert edit_neardup_pairs(docs, max_dist=8).count() == 0


def test_edit_neardup_block_cap(spark):
    # 6 identical docs in one block, cap=3 -> C(3,2)=3 pairs, the
    # id-ordered survivors.
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="same doc body repeated many times over")
         for i in range(6)])
    pairs = edit_neardup_pairs(docs, max_dist=8, block_cap=3).collect()
    got = sorted((p.doc_a, p.doc_b) for p in pairs)
    assert got == [(0, 1), (0, 2), (1, 2)]
    assert all(p.dist == 0 for p in pairs)


def test_phash_cos_table_libm_parity():
    """Pin all 256 quantized DCT basis entries against DuckDB's cos()
    — the cross-engine contract the m25 oracle rests on."""
    import duckdb

    from ecmm428_pycart_spark.datapipe.multimodal import _PHASH_CT
    rows = duckdb.sql("""
        SELECT t.t, u.u,
               CAST(floor(cos(pi() * (2*t.t+1) * u.u / 64.0) * 10000
                          + 0.5) AS BIGINT)
        FROM unnest(range(0, 32)) t(t), unnest(range(0, 8)) u(u)
    """).fetchall()
    for t, u, w in rows:
        assert int(_PHASH_CT[t, u]) == w, (t, u)


def test_phash_brightness_shift_invariant(spark):
    """A uniform brightness shift moves only the DC coefficient, which
    pHash drops — the robustness dHash lacks. Built with the module's
    own PNG writer so the REAL decode path runs."""
    import zlib

    from ecmm428_pycart_spark.datapipe import multimodal as mm

    def png(shift):
        rows = [[((3 * x + 2 * y) % 150) + shift
                 for x in range(mm.DHASH_W)] for y in range(mm.DHASH_H)]
        import struct
        ihdr = struct.pack(">IIBBBBB", mm.DHASH_W, mm.DHASH_H,
                           8, 0, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + mm._png_chunk(b"IHDR", ihdr)
                + mm._png_chunk(b"IDAT",
                                zlib.compress(mm._filter_rows(rows)))
                + mm._png_chunk(b"IEND", b""))

    df = spark.createDataFrame(
        [Row(doc_id=0, payload=bytearray(png(0))),
         Row(doc_id=1, payload=bytearray(png(50)))])
    h = (df.withColumn("h", mm.image_phash(F.col("payload")))
         .select("doc_id", "h.hash_hi", "h.hash_lo")
         .orderBy("doc_id").collect())
    assert (h[0].hash_hi, h[0].hash_lo) == (h[1].hash_hi, h[1].hash_lo)
    assert h[0].hash_hi > 0 or h[0].hash_lo > 0


def test_label_propagation_matches_python_replay(spark):
    """Sync LPA on a small random graph vs a literal Python replay of
    the rule (most frequent neighbor label, min-label ties, isolated
    nodes keep their seed)."""
    import random
    from collections import Counter

    from ecmm428_pycart_spark.datapipe.graph import label_propagation

    rng = random.Random(7)
    n = 30
    pairs = {(a, b) for a in range(n) for b in range(n)
             if a < b and rng.random() < 0.12}
    und = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    nodes = list(range(n + 2))          # two isolated nodes: n, n+1
    seeds = {k: k % 4 for k in nodes}

    edges = spark.createDataFrame(und, ["src", "dst"])
    labels = spark.createDataFrame(
        [(k, seeds[k]) for k in nodes], ["node", "label"])
    got = {r.node: r.label
           for r in label_propagation(edges, labels, rounds=3).collect()}

    nbrs = {k: [] for k in nodes}
    for a, b in und:
        nbrs[a].append(b)
    cur = dict(seeds)
    for _ in range(3):
        nxt = {}
        for k in nodes:
            if not nbrs[k]:
                nxt[k] = cur[k]
                continue
            cnt = Counter(cur[b] for b in nbrs[k])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[k] = best[0]
        cur = nxt
    assert got == cur


def test_bfs_layers_matches_python_replay(spark):
    """Bounded multi-source BFS on a random sparse digraph vs a
    literal Python frontier replay (nodes beyond max_depth absent)."""
    import random
    from collections import deque

    from ecmm428_pycart_spark.datapipe.graph import bfs_layers

    rng = random.Random(11)
    n = 40
    edges = [(a, b) for a in range(n) for b in range(n)
             if a != b and rng.random() < 0.05]
    sources = [0, 17]
    depth = 3

    e = spark.createDataFrame(edges, ["src", "dst"])
    s = spark.createDataFrame([(k,) for k in sources], ["node"])
    got = {r.node: r.distance
           for r in bfs_layers(e, s, max_depth=depth).collect()}

    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    dist = {k: 0 for k in sources}
    dq = deque(sources)
    while dq:
        u = dq.popleft()
        if dist[u] == depth:
            continue
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    assert got == dist


def test_png_channel_sums_roundtrip(spark):
    """Encode a known RGB array with the module's writer, decode via
    the real PNG path, and check exact integer channel sums."""
    import numpy as np

    from ecmm428_pycart_spark.datapipe import multimodal as mm

    rng = np.random.RandomState(5)
    arr = rng.randint(0, 256, size=(12, 16, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [Row(doc_id=0, payload=bytearray(mm.png_bytes_rgb(arr)))])
    r = (df.withColumn("s", mm.png_channel_sums(F.col("payload")))
         .select("s.*").head())
    want = arr.astype(np.int64).sum(axis=(0, 1))
    assert (r.sum_r, r.sum_g, r.sum_b) == tuple(int(x) for x in want)
    assert r.n_pix == 12 * 16


def test_sentence_dedup_replay(spark):
    """d54's rule on constructed docs: a sentence repeated in 3 docs
    is boilerplate (count > 2); one repeated twice is retained."""
    boiler = "this exact sentence appears in many documents"
    twice = "this one appears exactly two times in total"
    docs = spark.createDataFrame([
        Row(doc_id=0, source="a",
            text=f"{boiler}. {twice}. unique sentence number zero ok"),
        Row(doc_id=1, source="a",
            text=f"{boiler}. {twice}. unique sentence number one ok"),
        Row(doc_id=2, source="b",
            text=f"{boiler}. unique sentence number two is here ok"),
    ])
    from ecmm428_pycart_spark.benchmarks.queued6 import d54_sentence_dedup
    import tempfile, os
    # reuse the query body by emulating _t: write a tiny parquet dir
    d = tempfile.mkdtemp(prefix="d54_test_")
    docs.withColumn("lang", F.lit("en")) \
        .withColumn("n_chars", F.length("text")) \
        .write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r.source: r for r in d54_sentence_dedup(spark, d).collect()}
    # source a: 3 sentences/doc x 2 docs = 6; boiler appears 3x total
    assert out["a"].n_sentences == 6
    assert out["a"].n_dup_sentences == 2          # boiler instances in a
    assert out["b"].n_sentences == 2
    assert out["b"].n_dup_sentences == 1
    assert out["a"].chars_retained == (
        out["a"].chars_total - 2 * len(boiler))
    import shutil
    shutil.rmtree(d)


def test_wav_trim_silence_leading_and_trailing(spark):
    from ecmm428_pycart_spark.datapipe import multimodal as mm

    samples = [0] * 7 + [300, -300, 299, -1] + [0] * 5
    wav = mm.wav_bytes_pcm(1, 8000, samples, 16)
    silent = mm.wav_bytes_pcm(1, 8000, [0] * 10, 16)
    df = spark.createDataFrame(
        [Row(doc_id=0, payload=bytearray(wav)),
         Row(doc_id=1, payload=bytearray(silent))])
    out = {r.doc_id: r for r in
           (df.withColumn("s", mm.wav_trim_silence(F.col("payload")))
            .select("doc_id", "s.*").collect())}
    r = out[0]
    assert (r.n_samples, r.lead_trim, r.tail_trim, r.trimmed_n) \
        == (16, 7, 5, 4)
    s = out[1]
    assert (s.n_samples, s.lead_trim, s.tail_trim, s.trimmed_n) \
        == (10, 10, 0, 0)


def test_zip_manifest_roundtrip_and_crc():
    import zlib

    from ecmm428_pycart_spark.datapipe import multimodal as mm

    members = [("a.txt", b"hello world"), ("dir/b.bin", bytes(range(64)))]
    raw = mm.zip_bytes_store(members)
    # stdlib cross-check: python's zipfile must read our archive
    import io
    import zipfile
    with zipfile.ZipFile(io.BytesIO(raw)) as z:
        assert [i.filename for i in z.infolist()] == [n for n, _ in members]
        assert z.read("a.txt") == b"hello world"
    got = mm.decode_zip_manifest(raw)
    assert [(e["name"], e["size"]) for e in got] == \
        [(n, len(d)) for n, d in members]
    assert all(e["crc_ok"] for e in got)
    assert got[0]["crc"] == zlib.crc32(b"hello world") & 0xFFFFFFFF
    # corrupt one stored byte: CRC must catch it
    bad = bytearray(raw)
    bad[raw.index(b"hello world") + 2] ^= 0xFF
    assert [e["crc_ok"] for e in mm.decode_zip_manifest(bytes(bad))] \
        == [False, True]


def test_script_profile_and_dominance(spark):
    from ecmm428_pycart_spark.datapipe.text import (dominant_script,
                                                    script_profile)

    rows = [
        ("latin text only here", "latin"),
        ("короткий латинский текст проигрывает кириллице", "cyrillic"),
        ("ab 汉字汉字汉字", "han"),
        ("αβγδ ab", "greek"),
        # all-zero tie: every count equals the max, so the FIRST
        # precedence entry (latin) wins
        ("", "latin"),
    ]
    df = spark.createDataFrame([Row(t=t) for t, _ in rows])
    got = df.select(script_profile("t").alias("p"),
                    dominant_script("t").alias("d")).collect()
    assert [r.d for r in got] == [want for _, want in rows]
    assert got[0].p.latin > 0 and got[0].p.cyrillic == 0
    assert got[2].p.han == 6


def test_url_host_normalization_axes(spark):
    from ecmm428_pycart_spark.datapipe.text import url_host

    cases = [
        ("HTTPS://WWW.Example.COM:8443/a/b?q=1#f", "example.com"),
        ("http://sub.domain.org/path", "sub.domain.org"),
        ("ftp://www.files.net", "files.net"),
        ("not a url at all", ""),            # quarantine bucket
        ("https://plain.io", "plain.io"),
    ]
    df = spark.createDataFrame([Row(url=u) for u, _ in cases])
    got = [r.h for r in df.select(url_host("url").alias("h")).collect()]
    assert got == [h for _, h in cases]


def test_countmin_never_underestimates_and_hits_exact(spark):
    """Tiny corpus where bucket collisions are impossible at width
    512: every estimate must EQUAL the exact count; plus the
    overestimate invariant on a colliding 2-bucket sketch."""
    from ecmm428_pycart_spark.datapipe.text import (countmin_estimate,
                                                    countmin_sketch)

    docs = spark.createDataFrame(
        [Row(doc_id=0, text="a b a c"), Row(doc_id=1, text="b a d")])
    exact = {"a": 3, "b": 2, "c": 1, "d": 1}
    targets = spark.createDataFrame([Row(token=t) for t in exact])
    est = {r.token: r.n_est for r in countmin_estimate(
        countmin_sketch(docs), targets).collect()}
    assert est == exact                      # no collisions at 512
    tight = {r.token: r.n_est for r in countmin_estimate(
        countmin_sketch(docs, width=2), targets,
        width=2).collect()}
    assert all(tight[t] >= exact[t] for t in exact)
    missing = countmin_estimate(
        countmin_sketch(docs), spark.createDataFrame(
            [Row(token="zzz_not_in_corpus")])).head()
    assert missing.n_est >= 0               # absent tokens never error


def test_containment_detects_embedded_doc(spark):
    """Doc A fully embedded in B: containment A->B = 1.0 while
    Jaccard is diluted; df cap drops a boilerplate gram."""
    from ecmm428_pycart_spark.datapipe.dedup import containment_pairs

    a = "alpha beta gamma delta epsilon"
    b = ("prefix words here " + a + " suffix tail words close out end")
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=a), Row(doc_id=2, text=b),
         Row(doc_id=3, text="totally different content no overlap")])
    got = {(r.a, r.b): (r.inter, r.n_a, r.n_b)
           for r in containment_pairs(docs, n=3, max_df=16,
                                      min_inter=2).collect()}
    # A has 3 distinct 3-grams, all present in B
    assert got == {(1, 2): (3, 3, len(b.split()) - 2)}
    # cap at max_df=1 removes every shared gram -> no pairs
    assert containment_pairs(docs, n=3, max_df=1,
                             min_inter=1).collect() == []


def test_ulaw_expand_pins_reference_codepoints(spark):
    """CCITT reference values: 0xFF/0x7F are the two zeros, 0x00/0x80
    the extreme magnitudes (+-32124); plus a WAV roundtrip through the
    fmt-7 decoder path."""
    import numpy as np

    from ecmm428_pycart_spark.datapipe import multimodal as mm

    got = mm._ulaw_expand(np.array([0xFF, 0x7F, 0x00, 0x80],
                                   dtype=np.uint8))
    assert got.tolist() == [0, 0, -32124, 32124]
    wav = mm.wav_bytes_ulaw(1, 8000, bytes([0xFF, 0x00, 0x80, 0x7F]))
    s = mm.decode_wav_samples(wav)
    assert s.shape == (4, 1)
    assert s[:, 0].tolist() == [0, -32124, 32124, 0]
    df = spark.createDataFrame([Row(doc_id=0, payload=bytearray(wav))])
    r = (df.withColumn("s", mm.wav_ulaw_stats(F.col("payload")))
         .select("s.*").head())
    assert (r.n_samples, r.sum_val, r.peak, r.n_pos) == (4, 0, 32124, 1)


def test_bmp_roundtrip_both_orientations(spark):
    """Encode a random RGB array bottom-up AND top-down; the real
    decoder must return the identical logical image for both."""
    import numpy as np

    from ecmm428_pycart_spark.datapipe import multimodal as mm

    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(11, 17, 3), dtype=np.uint8)
    for td in (False, True):
        got = mm.decode_bmp_pixels(mm.bmp_bytes_rgb(arr, top_down=td))
        assert (got == arr).all(), f"top_down={td}"
    df = spark.createDataFrame(
        [Row(doc_id=0, payload=bytearray(mm.bmp_bytes_rgb(arr)))])
    r = (df.withColumn("s", mm.bmp_pixel_stats(F.col("payload")))
         .select("s.*").head())
    want = arr.astype(np.int64).sum(axis=(0, 1))
    assert (r.sum_r, r.sum_g, r.sum_b) == tuple(int(x) for x in want)
    assert (r.n_pix, r.tl_g) == (11 * 17, int(arr[0, 0, 1]))


def test_bmp_row_padding_is_stripped():
    """Odd widths force per-row padding; a stride bug would smear
    pad bytes into the next row's pixels."""
    import numpy as np

    from ecmm428_pycart_spark.datapipe import multimodal as mm

    arr = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(3, 5, 3)
    raw = mm.bmp_bytes_rgb(arr)
    assert (len(raw) - 54) == 3 * 16        # 15-byte rows pad to 16
    assert (mm.decode_bmp_pixels(raw) == arr).all()


def test_bmp_unsupported_variants_raise():
    import numpy as np

    from ecmm428_pycart_spark.datapipe import multimodal as mm

    raw = bytearray(mm.bmp_bytes_rgb(
        np.zeros((2, 2, 3), dtype=np.uint8)))
    raw[28] = 32                             # biBitCount -> 32
    with pytest.raises(NotImplementedError):
        mm.decode_bmp_pixels(bytes(raw))


def test_link_prediction_matches_python_replay(spark):
    """Tiny known graph: path 0-1-2-3 plus 4 attached to 1 and 2.
    Brute-force the non-adjacent common-neighbor pairs in Python."""
    from ecmm428_pycart_spark.datapipe.graph import link_prediction_scores

    und = [(0, 1), (1, 2), (2, 3), (1, 4), (2, 4)]
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    nodes = sorted(adj)
    for a in nodes:
        for b in nodes:
            if a < b and b not in adj[a]:
                cn = len(adj[a] & adj[b])
                if cn:
                    want[(a, b)] = (cn, len(adj[a]), len(adj[b]))
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in und]
        + [Row(src=b, dst=a) for a, b in und])
    got = {(r.a, r.b): (r.cn, r.deg_a, r.deg_b)
           for r in link_prediction_scores(edges).collect()}
    assert got == want
    # the hub cap silences wedges THROUGH high-degree centers: with
    # max_degree=2 only nodes 0/3/4 may be centers, and node 4's lone
    # wedge pair (1,2) is adjacent — so every candidate disappears
    capped = link_prediction_scores(edges, max_degree=2).collect()
    assert capped == []


def test_qoi_bytestream_pins_spec_vectors():
    """Hand-computed QOI streams: the encoder must emit byte-exact
    spec ops (RGB for out-of-range diffs, RUN with bias -1, INDEX on
    a 64-slot hash hit) and the decoder must invert them."""
    import numpy as np
    import struct

    from ecmm428_pycart_spark.datapipe import multimodal as mm

    hdr = b"qoif" + struct.pack(">IIBB", 1, 1, 3, 0)
    end = b"\x00" * 7 + b"\x01"
    # 1x1 (128,0,0): dr=-128 exceeds DIFF/LUMA -> QOI_OP_RGB
    assert (mm.qoi_bytes_rgb(np.array([[[128, 0, 0]]], np.uint8))
            == hdr + b"\xfe\x80\x00\x00" + end)
    # 2x1 all-black: equals the (0,0,0,255) seed pixel -> one RUN of 2
    hdr21 = b"qoif" + struct.pack(">IIBB", 1, 2, 3, 0)
    assert (mm.qoi_bytes_rgb(np.zeros((2, 1, 3), np.uint8))
            == hdr21 + b"\xc1" + end)
    # (128,0,0) hashes to slot 53; its reappearance is an INDEX op
    hdr31 = b"qoif" + struct.pack(">IIBB", 1, 3, 3, 0)
    arr = np.array([[[128, 0, 0]], [[10, 10, 10]], [[128, 0, 0]]],
                   np.uint8)
    assert (mm.qoi_bytes_rgb(arr)
            == hdr31 + b"\xfe\x80\x00\x00" + b"\xfe\x0a\x0a\x0a"
            + bytes([53]) + end)
    for a in (np.array([[[128, 0, 0]]], np.uint8),
              np.zeros((2, 1, 3), np.uint8), arr):
        assert (mm.decode_qoi_pixels(mm.qoi_bytes_rgb(a)) == a).all()


def test_qoi_roundtrip_randomized_and_guards():
    """Randomized roundtrips across op-regimes (noise, runs > 62,
    gradients in DIFF range, palette-like index hits) + the loud-
    failure guards."""
    import numpy as np

    from ecmm428_pycart_spark.datapipe import multimodal as mm

    rng = np.random.RandomState(11)
    cases = [rng.randint(0, 256, (9, 13, 3)).astype(np.uint8),
             np.full((70, 1, 3), 7, np.uint8),
             (np.cumsum(rng.randint(-2, 2, 40))
              .repeat(3).reshape(40, 1, 3) % 256).astype(np.uint8),
             (rng.randint(0, 4, (8, 8, 3)) * 85).astype(np.uint8)]
    for a in cases:
        assert (mm.decode_qoi_pixels(mm.qoi_bytes_rgb(a)) == a).all()
    with pytest.raises(ValueError):
        mm.decode_qoi_pixels(b"nope" + bytes(20))
    raw = bytearray(mm.qoi_bytes_rgb(cases[0]))
    raw[12] = 5                                   # channels byte
    with pytest.raises(ValueError):
        mm.decode_qoi_pixels(bytes(raw))


def test_qoi_stats_udf_matches_numpy(spark):
    import numpy as np

    from ecmm428_pycart_spark.datapipe import multimodal as mm

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (mm.QOI_H, mm.QOI_W, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [Row(doc_id=0, payload=bytearray(mm.qoi_bytes_rgb(arr)))])
    r = (df.withColumn("s", mm.qoi_pixel_stats(F.col("payload")))
         .select("s.*").head())
    want = arr.astype(np.int64).sum(axis=(0, 1))
    assert (r.sum_r, r.sum_g, r.sum_b) == tuple(int(x) for x in want)
    assert (r.n_pix, r.last_r) == (mm.QOI_H * mm.QOI_W,
                                   int(arr[-1, -1, 0]))


def test_winnowing_guarantee_and_selection(spark):
    """The winnowing contract: any shared substring of length
    >= k + w - 1 (= 11 normalized chars at k=8, w=4) must produce at
    least one shared selected fingerprint; and every selected
    fingerprint must be one of the doc's own k-gram hashes."""
    from ecmm428_pycart_spark.datapipe.dedup import (winnow_dup_pairs,
                                                     winnow_fingerprints)

    shared = "zqxjkvbwp lumen quartz"       # >= 11 chars normalized
    docs = [(0, "left padding " + shared + " tail one"),
            (1, "other prefix! " + shared + " different end"),
            (2, "completely unrelated content with nothing common")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    fp = winnow_fingerprints(df).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[0] & by_doc[1], "guaranteed shared fingerprint missing"
    # selected hashes are a subset of the doc's own gram hashes
    import hashlib
    norm = "".join(ch for ch in docs[0][1].lower()
                   if ch.isalnum())
    grams = {int(hashlib.md5(norm[i:i + 8].encode()).hexdigest()[:10],
                 16) for i in range(len(norm) - 7)}
    assert by_doc[0] <= grams
    # density: never more fingerprints than grams, never zero for
    # a long-enough doc
    assert 0 < len(by_doc[0]) <= len(grams)
    pairs = {(r.a, r.b): r.shared
             for r in winnow_dup_pairs(df, min_shared=1).collect()}
    assert (0, 1) in pairs and (0, 2) not in pairs


def test_personalized_pagerank_python_replay(spark):
    """Tiny known graph (path 0-1-2-3, plus 4 hanging off 1): replay
    the exact integer recurrence in Python and compare every node's
    mass after 2 rounds."""
    from ecmm428_pycart_spark.datapipe.graph import personalized_pagerank

    und = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2), (1, 4),
           (4, 1)]
    edges = spark.createDataFrame(und, ["src", "dst"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {r.node: (r.is_seed, r.rank)
           for r in personalized_pagerank(
               edges, seeds, rounds=2, alpha_ppm=850000,
               seed_mass=1_000_000_000).collect()}
    deg = {0: 1, 1: 3, 2: 2, 3: 1, 4: 1}
    rank = {n: (1_000_000_000 if n == 0 else 0) for n in deg}
    restart = (150000 * 1_000_000_000) // 1_000_000
    for _ in range(2):
        inm = {n: 0 for n in deg}
        for (u, v) in und:
            inm[v] += rank[u] // deg[u]
        rank = {n: (850000 * inm[n]) // 1_000_000
                + (restart if n == 0 else 0) for n in deg}
    assert got == {n: (1 if n == 0 else 0, rank[n]) for n in deg}


def test_kmv_sketch_exact_replay(spark):
    """Tiny two-group fixture replayed in pure Python: bottom-k
    members, ranks, the under-k exact fallback, and the pair-merge
    matches/estimate algebra."""
    import hashlib

    from ecmm428_pycart_spark.datapipe.text import (kmv_estimates,
                                                    kmv_pair_stats,
                                                    kmv_sketch)

    def h40(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:10], 16)

    ga = [f"k{i}" for i in range(12)]            # group A: 12 keys
    gb = [f"k{i}" for i in range(8, 30)]         # group B: 22, overlap 4
    rows = ([("A", k) for k in ga] + [("B", k) for k in gb]
            + [("A", "k3")])                     # dup key must collapse
    df = spark.createDataFrame(rows, ["source", "gram"])
    k = 16
    sk = kmv_sketch(df, "gram", "source", k=k)
    got = {(r.source, r.h, r.rn) for r in sk.collect()}
    want = set()
    for g, keys in (("A", ga), ("B", gb)):
        hs = sorted({h40(x) for x in keys})[:k]
        want |= {(g, h, i + 1) for i, h in enumerate(hs)}
    assert got == want
    est = {r.source: (r.n_in_sketch, r.est_distinct)
           for r in kmv_estimates(sk, k=k).collect()}
    assert est["A"] == (12, 12)                  # under k -> exact
    hb = sorted({h40(x) for x in gb})
    assert est["B"] == (k, (k - 1) * (1 << 40) // hb[k - 1])
    pair = kmv_pair_stats(sk, k=k).collect()[0]
    ha = sorted({h40(x) for x in ga})
    union = sorted(set(ha) | set(hb))[:k]
    matches = len([x for x in union
                   if x in set(ha[:k]) and x in set(hb[:k])])
    union_est = (k - 1) * (1 << 40) // union[k - 1]
    assert (pair.a, pair.b) == ("A", "B")
    assert pair.matches == matches
    assert pair.union_est == union_est
    assert pair.jaccard_ppm == matches * 10**6 // k
    assert pair.inter_est == matches * union_est // k


def test_tiff_roundtrip_both_endians_and_guards(spark):
    """Both byte orders decode to the identical logical image with
    the right strip count; baseline-scope violations raise."""
    import numpy as np

    from ecmm428_pycart_spark.datapipe import multimodal as mm

    rng = np.random.RandomState(9)
    arr = rng.randint(0, 256, (mm.TIFF_H, mm.TIFF_W)).astype(np.uint8)
    for be in (False, True):
        px, ns = mm.decode_tiff_gray(mm.tiff_bytes_gray(arr, be))
        assert (px == arr).all() and ns == 3
    with pytest.raises(ValueError):
        mm.decode_tiff_gray(b"PK" + bytes(30))
    raw = bytearray(mm.tiff_bytes_gray(arr))
    # flip the Compression SHORT (tag 259) to LZW(5): must raise
    ifd_off = int.from_bytes(raw[4:8], "little")
    for i in range(int.from_bytes(raw[ifd_off:ifd_off + 2], "little")):
        off = ifd_off + 2 + 12 * i
        if int.from_bytes(raw[off:off + 2], "little") == 259:
            raw[off + 8] = 5
    with pytest.raises(NotImplementedError):
        mm.decode_tiff_gray(bytes(raw))
    df = spark.createDataFrame(
        [Row(doc_id=0, payload=bytearray(mm.tiff_bytes_gray(arr)))])
    r = (df.withColumn("s", mm.tiff_pixel_stats(F.col("payload")))
         .select("s.*").head())
    assert (r.sum_px, r.n_pix, r.n_strips, r.last_px) == (
        int(arr.astype(np.int64).sum()), mm.TIFF_H * mm.TIFF_W, 3,
        int(arr[-1, -1]))


def test_stream_kmv_slice_invariance_and_nulls(spark, tmp_path):
    """The determinism claim behind st18: the SAME final sketch for a
    2-slice and a 4-slice micro-batch replay (bottom-k union is
    order-insensitive and idempotent), equal to a pure-Python batch
    replay; null user_ids are dropped."""
    import datetime
    import hashlib
    import uuid

    from ecmm428_pycart_spark.benchmarks.relational import _await_stream
    from ecmm428_pycart_spark.streaming.events import (
        read_events_stream, stream_kmv_distinct,
        write_time_ordered_stream_dir)

    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base + datetime.timedelta(minutes=i),
             None if i % 11 == 0 else (i * 7) % 23,
             "click" if i % 2 else "view", float(i), None)
            for i in range(60)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    k = 8

    def run(n_slices):
        d = str(tmp_path / f"s{n_slices}")
        import os
        os.makedirs(d)
        write_time_ordered_stream_dir(
            [ev.filter(F.pmod(F.col("event_id"), F.lit(n_slices)) == i)
             for i in range(n_slices)], d)
        name = f"kmv_{uuid.uuid4().hex[:8]}"
        _await_stream(
            spark,
            stream_kmv_distinct(
                read_events_stream(spark, d, max_files_per_trigger=1),
                k=k)
            .writeStream.format("memory").queryName(name)
            .outputMode("update").trigger(availableNow=True))
        return {r.event_type: (r.n_in_sketch, r.kth, r.est)
                for r in spark.table(name)
                .groupBy("event_type")
                .agg(F.max("n_in_sketch").alias("n_in_sketch"),
                     F.min(F.when(F.col("kth") > 0, F.col("kth")))
                     .alias("kth"),
                     F.max("est").alias("est")).collect()}

    got2, got4 = run(2), run(4)
    assert got2 == got4
    want = {}
    for typ in ("click", "view"):
        hs = sorted({int(hashlib.md5(str(u).encode()).hexdigest()[:10],
                         16)
                     for (_i, _t2, u, t, _v, _p) in rows
                     if t == typ and u is not None})[:k]
        n = len(hs)
        kth = hs[-1] if n == k else None
        est = n if n < k else (k - 1) * (1 << 40) // kth
        want[typ] = (n, kth, est)
    assert got2 == want


def test_cdc_chunks_shift_invariance_and_replay(spark):
    """The CDC property: prepending text re-chunks only the prefix
    neighborhood — downstream chunks survive byte-identical; plus a
    pure-Python replay of boundaries and byte conservation."""
    import hashlib

    from ecmm428_pycart_spark.datapipe.dedup import (CDC_K, CDC_M,
                                                     CDC_MASK, _cdc_pow,
                                                     cdc_chunks)

    base = ("the quick brown fox jumps over the lazy dog while the "
            "spark engine chunks content by rolling hashes of the "
            "trailing window bytes for storage style deduplication")
    ins = "INSERTED PREFIX " + base
    df = spark.createDataFrame(
        [(0, base), (1, ins), (2, "tiny"), (3, None)],
        "doc_id long, text string")
    rows = cdc_chunks(df).collect()
    by = {}
    for r in rows:
        by.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.chunk_md5, r.chunk_len))
    for v in by.values():
        v.sort()
    # python replay of doc 0
    pw = _cdc_pow()

    def replay(s):
        n = len(s)
        cuts = [0] + [i for i in range(CDC_K, n)
                      if sum(ord(s[i - 1 - j]) * pw[j]
                             for j in range(CDC_K))
                      % CDC_M % CDC_MASK == 0] + [n]
        return [s[cuts[m - 1]:cuts[m]] for m in range(1, len(cuts))]

    want = [(m, hashlib.md5(c.encode()).hexdigest(), len(c))
            for m, c in enumerate(replay(base))]
    assert by[0] == want
    # shift invariance: every base chunk except the first survives in
    # the prefixed doc
    a = {h for _m, h, _l in by[0][1:]}
    b = {h for _m, h, _l in by[1]}
    assert a <= b
    # short doc = one whole-text chunk; null doc contributes nothing
    assert by[2] == [(0, hashlib.md5(b"tiny").hexdigest(), 4)]
    assert 3 not in by
    # bytes conserved
    assert sum(l for _m, _h, l in by[0]) == len(base)


def test_scrub_pii_categories_and_residual(spark):
    from ecmm428_pycart_spark.datapipe.text import scrub_pii

    rows = [
        (0, "mail a.b-c_d%x+1@sub.domain.org and e@f.io end"),
        (1, "server 192.168.0.1 and 10.0.0.255 up"),
        (2, "ssn 123-45-6789 phone 555-123-4567 both"),
        (3, "clean text with numbers 12345 and 1-2 dashes"),
    ]
    out = {r[0]: r for r in
           (scrub_pii(spark.createDataFrame(rows, ["i", "text"]))
            .select("i", "scrubbed", "n_email", "n_ip", "n_ssn",
                    "n_phone", "n_residual").collect())}
    assert out[0].n_email == 2 and out[0].n_residual == 0
    assert out[0].scrubbed == "mail <EMAIL> and <EMAIL> end"
    assert out[1].n_ip == 2
    assert out[1].scrubbed == "server <IP> and <IP> up"
    assert (out[2].n_ssn, out[2].n_phone) == (1, 1)
    assert out[2].scrubbed == "ssn <SSN> phone <PHONE> both"
    assert out[3].scrubbed == rows[3][1]          # untouched
    assert all(v == 0 for v in
               (out[3].n_email, out[3].n_ip, out[3].n_ssn,
                out[3].n_phone, out[3].n_residual))


def test_wav_decimate2_floor_and_alignment(spark):
    """Known samples: negative odd pairs must FLOOR (not truncate),
    a trailing odd sample is dropped, and last_out pins alignment."""
    from ecmm428_pycart_spark.datapipe import multimodal as mm

    samples = [5, -8, -3, 2, 7, 7, 100]     # pairs: -2, -1, 7; drop 100
    wav = mm.wav_bytes_pcm(1, 8000, samples, 16)
    r = (spark.createDataFrame([Row(doc_id=0, payload=bytearray(wav))])
         .withColumn("s", mm.wav_decimate2_stats(F.col("payload")))
         .select("s.*").head())
    assert (r.n_in, r.n_out) == (7, 3)
    assert (r.sum_out, r.peak_out, r.last_out) == (4, 7, 7)


def test_embedding_diagnostics_identity(spark):
    """The sum-vector identity vs a literal O(n^2) pair loop, on a
    tiny fixture engineered to make the mean pairwise dot NEGATIVE
    (truncation toward zero on both engines is part of the
    contract)."""
    from ecmm428_pycart_spark.benchmarks.queued6 import (
        s27_embedding_diagnostics)

    # replay the registered query's math in pure python at sf0.001
    import duckdb
    rows = duckdb.sql(
        "SELECT label, embedding FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    ).fetchall()
    import collections
    import math
    by = collections.defaultdict(list)
    for lab, emb in rows:
        by[lab].append([math.floor(float(v) * 10000) for v in emb])
    got = {r.label: (r.n_vecs, r.sum_norm2, r.centroid_norm2,
                     r.mean_pair_dot)
           for r in s27_embedding_diagnostics(
               spark, "/root/testdata/sf0.001").collect()}
    for lab, vecs in by.items():
        n = len(vecs)
        sn2 = sum(sum(x * x for x in v) for v in vecs)
        cen = [sum(col) for col in zip(*vecs)]
        c2 = sum(s * s for s in cen)
        # brute-force pair sum must equal the identity exactly
        pair = sum(sum(a * b for a, b in zip(vecs[i], vecs[j]))
                   for i in range(n) for j in range(n) if i != j)
        assert pair == c2 - sn2
        # truncation toward zero (Spark div / DuckDB //), not floor
        mean = (c2 - sn2) // (n * (n - 1)) if c2 >= sn2 \
            else -((sn2 - c2) // (n * (n - 1)))
        assert got[lab] == (n, sn2, c2, mean)


def test_detect_media_type_signatures():
    import numpy as np

    from ecmm428_pycart_spark.datapipe import multimodal as mm

    arr3 = np.zeros((2, 2, 3), np.uint8)
    assert mm.detect_media_type(mm.qoi_bytes_rgb(arr3)) == "qoi"
    assert mm.detect_media_type(mm.bmp_bytes_rgb(arr3)) == "bmp"
    assert mm.detect_media_type(
        mm.wav_bytes_pcm(1, 8000, [0, 1], 16)) == "wav"
    for be in (False, True):
        assert mm.detect_media_type(
            mm.tiff_bytes_gray(np.zeros((2, 2), np.uint8), be)) == "tiff"
    assert mm.detect_media_type(
        mm.zip_bytes_store([("a.txt", b"hi")])) == "zip"
    assert mm.detect_media_type(b"\x89PNG\r\n\x1a\nrest") == "png"
    assert mm.detect_media_type(b"\xff\xd8\xff\xe0") == "jpeg"
    assert mm.detect_media_type(b"GIF89a") == "gif"
    assert mm.detect_media_type(b"RIFF\x00\x00\x00\x00AVI ") == "avi"
    assert mm.detect_media_type(b"\x00\x00\x00\x18ftypisom") == "mp4"
    assert mm.detect_media_type(b"garbage bytes") == "unknown"


def test_bipartite_project_replay_and_cap(spark):
    """Tiny incidence list vs a literal pair loop; a mega-basket u is
    dropped by the degree cap before it mints pairs."""
    import itertools
    from collections import Counter

    from ecmm428_pycart_spark.datapipe.graph import bipartite_project

    inc = ([(1, v) for v in (10, 11, 12)]
           + [(2, v) for v in (11, 12)]
           + [(3, v) for v in (10, 12)]
           + [(9, v) for v in range(100, 110)]     # mega-basket
           + [(1, 11)])                            # dup must collapse
    df = spark.createDataFrame(inc, ["u", "v"])
    got = {(r.a, r.b): r.weight
           for r in bipartite_project(df, max_src_degree=5,
                                      min_weight=1).collect()}
    w = Counter()
    baskets = {1: {10, 11, 12}, 2: {11, 12}, 3: {10, 12}}
    for vs in baskets.values():
        for a, b in itertools.combinations(sorted(vs), 2):
            w[(a, b)] += 1
    assert got == dict(w)
    assert not any(a >= 100 for a, _b in got)


def test_homoglyph_normalize_recovers_dups(spark):
    from ecmm428_pycart_spark.datapipe.text import (homoglyph_count,
                                                    homoglyph_normalize)

    spoofed = "thе quick brоwn fоx"          # Cyrillic е and о
    clean = "the quick brown fox"
    df = spark.createDataFrame(
        [(0, spoofed), (1, clean)], ["i", "t"])
    out = {r.i: (r.n, r.c) for r in df.select(
        "i", homoglyph_normalize("t").alias("n"),
        homoglyph_count("t").alias("c")).collect()}
    assert out[0] == (clean, 3)
    assert out[1] == (clean, 0)


def test_srt_cues_parses_and_survives_malformed(spark):
    from ecmm428_pycart_spark.datapipe.text import srt_cues

    srt = ("1\n00:00:01,500 --> 00:00:03,250\nhello world\n\n"
           "2\n00:04:21,300 --> 00:04:22,000\nsecond cue\n\n"
           "oops no timecode here\nstill no timecode\nnope\n\n")
    df = spark.createDataFrame([(0, srt)], ["doc_id", "srt"])
    rows = {r.cue_idx: r for r in srt_cues(df).collect()}
    assert (rows[0].seq, rows[0].start_ms, rows[0].end_ms,
            rows[0].text) == (1, 1500, 3250, "hello world")
    assert (rows[1].seq, rows[1].start_ms, rows[1].end_ms,
            rows[1].text) == (2, 261300, 262000, "second cue")
    # malformed block: NULL seq/times, no crash
    assert rows[2].seq is None and rows[2].start_ms is None
    # trailing blank block dropped
    assert set(rows) == {0, 1, 2}


def test_bounded_shortest_paths_python_replay(spark):
    """Weighted path graph replayed in Python min-plus: 0-1-2-3 line
    with weights 5,1,1 plus a 0-3 shortcut of weight 4: within 2
    rounds node 3 is reached via the shortcut (4), not the line."""
    from ecmm428_pycart_spark.datapipe.graph import bounded_shortest_paths

    und = [(0, 1, 5), (1, 0, 5), (1, 2, 1), (2, 1, 1),
           (2, 3, 1), (3, 2, 1), (0, 3, 4), (3, 0, 4)]
    edges = spark.createDataFrame(und, ["src", "dst", "w"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {r.node: r.dist
           for r in bounded_shortest_paths(edges, seeds,
                                           rounds=2).collect()}
    # round 1: 1->5, 3->4; round 2: 2->min(5+1, 4+1)=5, 3 stays 4
    assert got == {0: 0, 1: 5, 2: 5, 3: 4}
    # more rounds tighten: dist(2) via 3 is 4+1=5 (same), dist(1)
    # via 2 becomes 6 > 5 -> stable
    got4 = {r.node: r.dist
            for r in bounded_shortest_paths(edges, seeds,
                                            rounds=4).collect()}
    assert got4 == {0: 0, 1: 5, 2: 5, 3: 4}


def test_safetensors_roundtrip_and_layout_guards():
    import numpy as np

    from ecmm428_pycart_spark.datapipe import multimodal as mm

    emb = np.arange(12, dtype=np.int32).reshape(3, 4)
    ids = np.array([10, 20, 30], dtype=np.int64)
    u8 = np.array([[1, 2], [3, 250]], dtype=np.uint8)
    raw = mm.safetensors_bytes(
        [("emb", emb), ("ids", ids), ("mask", u8)], {"k": "v"})
    m = {e["name"]: e for e in mm.decode_safetensors_manifest(raw)}
    assert m["emb"]["shape"] == (3, 4) and m["emb"]["sum"] == 66
    assert m["ids"]["dtype"] == "I64" and m["ids"]["sum"] == 60
    assert m["mask"]["n_elems"] == 4 and m["mask"]["sum"] == 256
    # spans tile the buffer in declared order
    assert (m["emb"]["lo"], m["emb"]["hi"]) == (0, 48)
    assert (m["ids"]["lo"], m["ids"]["hi"]) == (48, 72)
    # corrupt an offset -> loud failure
    import json
    import struct
    (hlen,) = struct.unpack("<Q", raw[:8])
    hdr = json.loads(raw[8:8 + hlen])
    hdr["ids"]["data_offsets"] = [50, 74]
    hj = json.dumps(hdr, sort_keys=True,
                    separators=(",", ":")).encode()
    bad = struct.pack("<Q", len(hj)) + hj + raw[8 + hlen:]
    with pytest.raises(ValueError):
        mm.decode_safetensors_manifest(bad)
    # cross-check against the reference layout convention: header
    # length prefix is little-endian u64 and JSON parses standalone
    assert json.loads(raw[8:8 + hlen])["__metadata__"] == {"k": "v"}


def test_snapshot_diff_statuses(spark):
    from ecmm428_pycart_spark.operators.relational import snapshot_diff

    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)],
        "k long, txt string")
    v2 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (5, "new"), (4, "")],
        "k long, txt string")
    got = {r.k: r.status for r in
           snapshot_diff(v1, v2, "k", ["txt"]).collect()}
    # NULL -> '' must register as changed (typed sentinel), not equal
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "changed", 5: "added"}


def test_canonical_url_axes(spark):
    from ecmm428_pycart_spark.datapipe.text import with_canonical_url

    cases = [
        ("HTTP://Example.COM:80/p3/?b=2&utm_source=x&a=1#sec",
         "http://example.com/p3?a=1&b=2"),
        ("http://example.com/p3?a=1&b=2",
         "http://example.com/p3?a=1&b=2"),
        ("https://example.com:443/", "https://example.com/"),
        ("https://example.com:8443/x/?fbclid=zz",
         "https://example.com:8443/x"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com:443/x", "http://example.com:443/x"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], ["i", "url"])
    got = {r.i: r.canon_url
           for r in with_canonical_url(df, "url").collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_gray_patch_means_matches_numpy(spark):
    import struct
    import zlib

    import numpy as np

    from ecmm428_pycart_spark.datapipe import multimodal as mm

    rng = np.random.RandomState(21)
    img = rng.randint(0, 256, (mm.PATCH_H, mm.PATCH_W)).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", mm.PATCH_W, mm.PATCH_H, 8, 0, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + mm._png_chunk(b"IHDR", ihdr)
           + mm._png_chunk(b"IDAT", zlib.compress(
               mm._filter_rows([list(r) for r in img])))
           + mm._png_chunk(b"IEND", b""))
    got = (spark.createDataFrame([Row(doc_id=0, payload=bytearray(png))])
           .select(mm.gray_patch_means(F.col("payload")).alias("m"))
           .head().m)
    want = (img.astype(np.int64).reshape(4, 4, 4, 4).sum(axis=(1, 3))
            // 16).reshape(-1).tolist()
    assert got == want


def test_k_truss_clique_and_cascade(spark):
    """A 4-clique survives k=4; a triangle chain (each edge in one
    triangle) peels entirely — the cascade a one-shot support filter
    would miss."""
    import itertools

    from ecmm428_pycart_spark.datapipe.graph import k_truss

    clique = list(itertools.combinations(range(4), 2))
    # chain of two triangles sharing an edge: supports 1,1,2,1,1 ->
    # round 1 drops the outer edges, round 2 drops the shared one
    chain = [(10, 11), (11, 12), (10, 12), (12, 13), (11, 13)]
    df = spark.createDataFrame(clique + chain + [(3, 10)],
                               ["src", "dst"])
    out = sorted((r.a, r.b) for r in k_truss(df, k=4).collect())
    assert out == sorted(clique)


def test_retention_policy_keeps_longest(spark):
    from ecmm428_pycart_spark.datapipe.dedup import retention_policy

    docs = spark.createDataFrame(
        [(1, "short"), (2, "the longest copy here"), (3, "medium one"),
         (4, "standalone doc"), (5, "the longest copy herE")],
        ["doc_id", "text"])
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (5, 5)], ["doc_id", "component"])
    got = {r.doc_id: (r.cluster, r.keep)
           for r in retention_policy(docs, clusters).collect()}
    # cluster 1: doc 2 longest -> kept; ties impossible here; doc 4
    # unclustered -> own singleton, kept; doc 5 singleton cluster
    assert got == {1: (1, False), 2: (1, True), 3: (1, False),
                   4: (4, True), 5: (5, True)}
    # equal lengths: min id wins
    docs2 = spark.createDataFrame(
        [(7, "same len"), (8, "same len")], ["doc_id", "text"])
    cl2 = spark.createDataFrame([(7, 7), (8, 7)],
                                ["doc_id", "component"])
    got2 = {r.doc_id: r.keep
            for r in retention_policy(docs2, cl2).collect()}
    assert got2 == {7: True, 8: False}


def test_hash_random_walks_python_replay(spark):
    import hashlib

    from ecmm428_pycart_spark.datapipe.graph import hash_random_walks

    und = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2), (2, 3),
           (3, 2)]
    edges = spark.createDataFrame(und, ["src", "dst"])
    seeds = spark.createDataFrame([(0,), (3,)], ["node"])
    got = {(r.walk_id, r.step): r.node
           for r in hash_random_walks(edges, seeds,
                                      steps=2).collect()}
    adj = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)

    def pick(w, t, u):
        return min(adj[u], key=lambda v: (
            int(hashlib.md5(f"{w}:{t}:{v}".encode())
                .hexdigest()[:10], 16) * 4194304 + v))

    want = {}
    for w in (0, 3):
        cur = w
        want[(w, 0)] = cur
        for t in (1, 2):
            cur = pick(w, t, cur)
            want[(w, t)] = cur
    assert got == want


def test_prefix_filter_lossless_vs_bruteforce(spark):
    """The AllPairs contract (dedup.prefix_filter_pairs): joining
    only rarest-first PREFIXES loses no pair with Jaccard >= t —
    output must equal brute-force exact all-pairs, including a pair
    sitting EXACTLY on the threshold (2*inter == union)."""
    import random

    from ecmm428_pycart_spark.datapipe.dedup import prefix_filter_pairs

    rnd = random.Random(73)
    vocab = [f"w{i:02d}" for i in range(30)]
    docs = [rnd.sample(vocab, rnd.randint(4, 12)) for _ in range(16)]
    for i in (0, 3, 7):          # planted near-dups: one token swapped
        clone = list(docs[i])
        clone[0] = "w99"
        docs.append(clone)
    docs.append(["x", "y", "p"])     # ids 19/20: J == 1/2 exactly
    docs.append(["x", "y", "q"])
    docs.append(["u", "v", "m"])     # ids 21/22: J == 1/5, below t
    docs.append(["u", "z2", "q2"])
    df = spark.createDataFrame([(i, " ".join(d))
                                for i, d in enumerate(docs)],
                               "doc_id long, text string")
    got = {(r.a, r.b): (r.inter, r.n_a, r.n_b, r.jaccard_ppm)
           for r in prefix_filter_pairs(df, n=1).collect()}
    sets = {i: set(d) for i, d in enumerate(docs)}
    want = {}
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if 2 * inter >= union:
                    want[(a, b)] = (inter, len(sets[a]), len(sets[b]),
                                    inter * 1000000 // union)
    assert got == want
    assert (19, 20) in got           # exact-threshold pair kept
    assert (21, 22) not in got       # below-threshold pair pruned


def test_hits_scores_python_replay(spark):
    """graph.hits_scores == a literal Python replay of the integer
    max-normalized HITS rounds on a small directed graph (hubs
    pointing at shared authorities must outrank chain nodes)."""
    from ecmm428_pycart_spark.datapipe.graph import hits_scores

    edges = [(0, 1), (0, 2), (0, 3), (4, 1), (4, 2), (2, 5),
             (5, 0), (3, 4)]
    scale = 1_000_000
    nodes = sorted({x for e in edges for x in e})
    hub = {k: scale for k in nodes}
    auth = None
    for _ in range(3):
        araw = {k: 0 for k in nodes}
        for a, b in edges:
            araw[b] += hub[a]
        m = max(araw.values())
        auth = {k: araw[k] * scale // m for k in nodes}
        hraw = {k: 0 for k in nodes}
        for a, b in edges:
            hraw[a] += auth[b]
        m = max(hraw.values())
        hub = {k: hraw[k] * scale // m for k in nodes}
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.auth_ppm, r.hub_ppm)
           for r in hits_scores(df, rounds=3).collect()}
    assert got == {k: (auth[k], hub[k]) for k in nodes}
    assert max(got, key=lambda k: got[k][1]) == 0   # 3-out hub wins


def test_rolling_zscore_boundary_and_zero_variance(spark):
    """funnel.rolling_zscore_outliers: a point at EXACTLY 3 sigma is
    NOT flagged (strict inequality), one past it is, and a
    zero-variance baseline flags any deviation — the division-free
    integer contract, checked against hand-computed s/q/excess."""
    import datetime as dt

    from ecmm428_pycart_spark.datapipe.funnel import (
        rolling_zscore_outliers)

    def hours(key, xs):
        rows = []
        for h, x in enumerate(xs):
            for i in range(x):
                rows.append((key, dt.datetime(2024, 1, 1)
                             + dt.timedelta(hours=h, seconds=i)))
        return rows

    base = [9, 11] * 12                  # s=240, q=2424, n*q-s^2=576
    data = (hours("a", base + [13])      # |x-10| == 3 sigma exactly
            + hours("b", base + [14])    # 3 sigma exceeded
            + hours("d", [10] * 24 + [11]))   # zero-variance baseline
    df = spark.createDataFrame(data, "event_type string, ts timestamp")
    got = {(r.key, r.hr): (r.n, r.s, r.q, r.is_outlier, r.excess)
           for r in rolling_zscore_outliers(df).collect()}
    h0 = int(dt.datetime(2024, 1, 1,
                         tzinfo=dt.timezone.utc).timestamp()) // 3600
    assert got[("a", h0 + 24)] == (24, 240, 2424, 0, 5184 - 5184)
    assert got[("b", h0 + 24)] == (24, 240, 2424, 1, 9216 - 5184)
    assert got[("d", h0 + 24)] == (24, 240, 2400, 1, 576)
    # only full windows are scored: first 24 hours of each key absent
    assert len(got) == 3


def test_sample_allocation_hamilton_and_ties(spark):
    """text.sample_allocation: the classic Hamilton worked example
    (sum of allocations == budget exactly, extras to the largest
    remainders) plus an all-tied remainder case resolved by key
    order."""
    from ecmm428_pycart_spark.datapipe.text import sample_allocation

    df = spark.createDataFrame(
        [("a", 47), ("b", 28), ("c", 15), ("d", 10)], "k string, c long")
    got = {r.k: (r.floor_alloc, r.rem, r.alloc)
           for r in sample_allocation(df, 10, ["k"]).collect()}
    assert got == {"a": (4, 70, 5), "b": (2, 80, 3),
                   "c": (1, 50, 1), "d": (1, 0, 1)}
    assert sum(a for _, _, a in got.values()) == 10

    tie = spark.createDataFrame([("x", 1), ("y", 1), ("z", 1)],
                                "k string, c long")
    got = {r.k: r.alloc for r in sample_allocation(tie, 2, ["k"])
           .collect()}
    assert got == {"x": 1, "y": 1, "z": 0}


def test_tga_roundtrip_both_orientations_and_guards():
    """multimodal TGA codec: encode->decode identity on random
    images in BOTH row orders, exact packet structure on the
    synthetic pattern (5 RLE + 1 RAW per row), and the malformed-
    input guards (truncation, row-crossing packet, trailing bytes)."""
    import numpy as np
    import pytest as _pt

    from ecmm428_pycart_spark.datapipe import multimodal as mm

    rng = np.random.default_rng(38)
    for top_down in (False, True):
        arr = rng.integers(0, 256, (7, 19, 3), dtype=np.uint8)
        # plant runs so both packet kinds occur
        arr[2, 3:9] = arr[2, 3]
        buf = mm.tga_bytes_rle(arr, top_down=top_down)
        px, n_rle, n_raw = mm.decode_tga_pixels(buf)
        assert (px == arr).all()
        assert n_rle >= 1 and n_raw >= 1

    # constant image: RLE only, runs capped at 128
    const = np.full((2, 200, 3), 7, np.uint8)
    px, n_rle, n_raw = mm.decode_tga_pixels(mm.tga_bytes_rle(const))
    assert (px == const).all() and n_raw == 0 and n_rle == 4

    # the synthetic generator pattern: closed-form packet counts
    a, b = 4, 3
    x = np.arange(mm.TGA_W)
    u = np.where(x < 15, x // 3, 100 + x)
    y, c = np.ogrid[:mm.TGA_H, :3]
    arr = ((a * u[None, :, None] + b * y[:, None] + 37 * c[None, :])
           % 256).astype(np.uint8)
    _, n_rle, n_raw = mm.decode_tga_pixels(mm.tga_bytes_rle(arr))
    assert (n_rle, n_raw) == (5 * mm.TGA_H, mm.TGA_H)

    good = mm.tga_bytes_rle(arr)
    with _pt.raises(ValueError):
        mm.decode_tga_pixels(good[:17])          # truncated header
    with _pt.raises(ValueError):
        mm.decode_tga_pixels(good[:-2])          # truncated packet
    with _pt.raises(ValueError):
        mm.decode_tga_pixels(good + b"\x00")     # trailing bytes
    bad = bytearray(good)
    bad[18] = 0x80 | 127                         # 128-run crosses row
    with _pt.raises(ValueError):
        mm.decode_tga_pixels(bytes(bad))


def test_stream_rolling_anomaly_slice_invariance(spark, tmp_path):
    """streaming.stream_rolling_anomaly: the final emission is the
    same for a 2-slice and a 3-slice replay (hour-count accumulation
    is associative) and equals the batch
    funnel.rolling_zscore_outliers aggregate on the same events."""
    import datetime
    import os
    import uuid

    from ecmm428_pycart_spark.benchmarks.relational import _await_stream
    from ecmm428_pycart_spark.datapipe.funnel import (
        rolling_zscore_outliers)
    from ecmm428_pycart_spark.streaming.events import (
        read_events_stream, stream_rolling_anomaly,
        write_time_ordered_stream_dir)

    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for h in range(30):                       # 30 hours, varying load
        for i in range(3 + (h * 7) % 5 + (6 if h == 27 else 0)):
            rows.append((eid, base + datetime.timedelta(hours=h,
                                                        seconds=i),
                         1, "click" if eid % 2 else "view",
                         1.0, None))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")

    def run(n_slices):
        d = str(tmp_path / f"ra{n_slices}")
        os.makedirs(d)
        write_time_ordered_stream_dir(
            [ev.filter(F.pmod(F.col("event_id"), F.lit(n_slices)) == i)
             for i in range(n_slices)], d)
        name = f"ra_{uuid.uuid4().hex[:8]}"
        _await_stream(
            spark,
            stream_rolling_anomaly(
                read_events_stream(spark, d, max_files_per_trigger=1),
                window=6, z=3)
            .writeStream.format("memory").queryName(name)
            .outputMode("update").trigger(availableNow=True))
        from pyspark.sql import Window as W
        t = spark.table(name)
        fin = (t.withColumn("_rn", F.row_number().over(
                   W.partitionBy("event_type")
                   .orderBy(F.col("n_events").desc())))
               .filter(F.col("_rn") == 1))
        return {r.event_type: (r.n_events, r.n_hours, r.n_scored,
                               r.n_outliers, r.max_excess)
                for r in fin.collect()}

    got2, got3 = run(2), run(3)
    assert got2 == got3

    sc = rolling_zscore_outliers(ev, window=6, z=3)
    batch = {r.key: (r.n_scored, r.n_outliers, r.max_excess)
             for r in (sc.groupBy("key")
                       .agg(F.count(F.lit(1)).alias("n_scored"),
                            F.sum("is_outlier").alias("n_outliers"),
                            F.coalesce(
                                F.max(F.when(F.col("excess") > 0,
                                             F.col("excess"))),
                                F.lit(0)).alias("max_excess"))
                       .collect())}
    assert {k: v[2:] for k, v in got2.items()} == batch
    assert all(v[3] >= 1 for v in got2.values())   # h==27 spike flags


def test_modularity_two_cliques_vs_python(spark):
    """graph.modularity_stats on two triangles joined by one bridge
    edge, labels = the two cliques: exact contributions match the
    hand computation, sum(contrib)/(2m)^2 is the textbook Q, and a
    degenerate all-one-community labeling scores contrib == 0
    (in_rows == 2m, deg_sum == 2m)."""
    from ecmm428_pycart_spark.datapipe.graph import modularity_stats

    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(3, 4), (4, 5), (3, 5)]
    bridge = [(2, 3)]
    e = tri1 + tri2 + bridge
    und = e + [(b, a) for a, b in e]
    edges = spark.createDataFrame(und, "src long, dst long")
    labels = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "node long, label long")
    got = {r.label: (r.n_nodes, r.in_rows, r.deg_sum, r.two_m,
                     r.contrib)
           for r in modularity_stats(edges, labels).collect()}
    # 2m = 14 rows; each triangle: 6 intra rows; deg_sum = 7 for the
    # bridge-side clique (2+2+3), contrib = 6*14 - 49 = 35.
    assert got == {0: (3, 6, 7, 14, 35), 1: (3, 6, 7, 14, 35)}
    q = sum(v[4] for v in got.values()) / 14 ** 2
    assert abs(q - (12 / 14 - 2 * (7 / 14) ** 2)) < 1e-12

    one = spark.createDataFrame([(i, 9) for i in range(6)],
                                "node long, label long")
    r = modularity_stats(edges, one).collect()[0]
    assert (r.in_rows, r.deg_sum, r.contrib) == (14, 14, 0)


def test_pb_wire_walk_spec_vectors_and_guards():
    """Protobuf wire codec: the spec's canonical varint/zigzag byte
    vectors, unknown-field skipping by wire type, and the malformed-
    input guards (truncation, overlong varint, group wire types)."""
    import pytest as _pt

    from ecmm428_pycart_spark.datapipe import multimodal as mm

    # protobuf.dev's worked examples
    assert mm.pb_varint(1) == b"\x01"
    assert mm.pb_varint(300) == b"\xac\x02"
    assert mm.pb_zigzag(0) == 0
    assert mm.pb_zigzag(-1) == 1
    assert mm.pb_zigzag(1) == 2
    assert mm.pb_zigzag(-2) == 3
    assert mm.pb_tag(1, 0) == b"\x08"      # field 1 varint -> 0x08

    msg = mm.pb_message_bytes(301, "en", "web", 442)
    d = mm.decode_pb_fields(msg)
    assert d == {"n_fields": 8, "n_unknown": 1, "v1": 301, "v2": -301,
                 "len3": 2, "packed_sum": 0 + 4 + 2, "nested_n": 442,
                 "f64_mod": (301 * 2654435761) % 2 ** 32, "f32": 301}

    with _pt.raises(ValueError):
        mm.decode_pb_fields(msg[:-1])              # truncated fixed
    with _pt.raises(ValueError):
        mm.decode_pb_fields(b"\x08\x80")           # truncated varint
    with _pt.raises(ValueError):
        mm.decode_pb_fields(b"\x80" * 11)          # overlong varint
    with _pt.raises(ValueError):
        mm.decode_pb_fields(mm.pb_tag(1, 3))       # group wire type
    # unknown fields of every wire type are skipped, not errors
    extra = (mm.pb_tag(12, 0) + mm.pb_varint(7)
             + mm.pb_tag(13, 2) + mm.pb_varint(3) + b"abc"
             + mm.pb_tag(14, 5) + b"\x01\x02\x03\x04")
    d2 = mm.decode_pb_fields(msg + extra)
    assert d2["n_unknown"] == 4 and d2["n_fields"] == 11
    assert d2["v1"] == 301                         # known fields intact


def test_lz4_block_roundtrip_overlap_and_guards():
    """LZ4 block codec: randomized roundtrips over repetitive+random
    mixes, the RLE-style overlapping match (offset < matchlen), real
    compression on repetitive text, and the malformed-input guards."""
    import random

    import pytest as _pt

    from ecmm428_pycart_spark.datapipe import multimodal as mm

    rnd = random.Random(40)
    for trial in range(60):
        parts = []
        for _ in range(rnd.randint(0, 6)):
            if rnd.random() < 0.5:
                parts.append(bytes([rnd.randrange(256)])
                             * rnd.randint(1, 300))
            else:
                parts.append(bytes(rnd.randrange(256)
                                   for _ in range(rnd.randint(0, 80))))
        data = b"".join(parts)
        assert mm.lz4_decompress_block(
            mm.lz4_compress_block(data)) == data, trial

    # hand-built overlapping match: 4 literals 'abcd', then offset 1
    # matchlen 8 -> 'abcd' + 'd'*8 (byte-serial self-copy)
    seq = bytes([0x44]) + b"abcd" + b"\x01\x00" + bytes([0x00])
    assert mm.lz4_decompress_block(seq) == b"abcd" + b"d" * 8

    t = b"the quick brown fox " * 50
    c = mm.lz4_compress_block(t)
    assert mm.lz4_decompress_block(c) == t
    assert len(c) < len(t) // 10          # real match coverage

    with _pt.raises(ValueError):
        mm.lz4_decompress_block(c[:-1])                # truncation
    with _pt.raises(ValueError):
        mm.lz4_decompress_block(bytes([0x04]) + b"abcd"
                                + b"\x00\x00" + bytes([0x00]))  # off 0
    with _pt.raises(ValueError):
        mm.lz4_decompress_block(bytes([0x04]) + b"abcd"
                                + b"\xff\x00" + bytes([0x00]))  # OOR


def test_clamped_balance_ledger_replay(spark):
    """funnel.clamped_balance on a hand ledger: overdraws truncate at
    zero and count as clamps; order is (ts, event_id) so a same-
    timestamp pair resolves by id; matches a Python fold."""
    import datetime as dt

    from ecmm428_pycart_spark.datapipe.funnel import clamped_balance

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # (event_id, ts, user, type, value): +500, -900 (clamp), +300
        (1, t0, 1, "purchase", 5.0),
        (2, t0 + dt.timedelta(seconds=1), 1, "click", 9.0),
        (3, t0 + dt.timedelta(seconds=2), 1, "signup", 3.0),
        # user 2: same-ts pair — id order decides: +200 then -100
        (4, t0, 2, "purchase", 2.0),
        (5, t0, 2, "view", 1.0),
        # user 3: immediate overdraw from zero
        (6, t0, 3, "error", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    got = {r.user_id: (r.n_events, r.net_cents, r.final_cents,
                       r.n_clamps)
           for r in clamped_balance(df).collect()}
    assert got == {1: (3, -100, 300, 1),
                   2: (2, 100, 100, 0),
                   3: (1, -400, 0, 1)}


def test_rle_bp_hybrid_roundtrip_and_guards():
    """Parquet RLE/bit-packing hybrid: randomized roundtrips across
    bit widths, the no-mid-stream-pad discipline (a run arriving
    while literals are pending completes their group first), exact
    group counts on the synthetic pattern, and the guards."""
    import random

    import pytest as _pt

    from ecmm428_pycart_spark.datapipe import multimodal as mm

    rnd = random.Random(41)
    for w in (1, 4, 8, 13, 32):
        for _ in range(25):
            n = rnd.randint(0, 120)
            vals = []
            while len(vals) < n:
                if rnd.random() < 0.4:
                    vals.extend([rnd.randrange(1 << w)]
                                * rnd.randint(1, 30))
                else:
                    vals.append(rnd.randrange(1 << w))
            vals = vals[:n]
            got, _, _ = mm.rle_bp_decode(
                mm.rle_bp_encode(vals, w), len(vals), w)
            assert got == vals, (w, n)

    # 3 literals then a run of 20: five literals absorbed to complete
    # the group, the remaining 15 emitted RLE — no mid-stream pad
    vals = [1, 2, 3] + [9] * 20
    buf = mm.rle_bp_encode(vals, 4)
    got, n_rle, n_bp = mm.rle_bp_decode(buf, len(vals), 4)
    assert got == vals and (n_rle, n_bp) == (1, 1)

    # the synthetic gate pattern: 4 RLE runs of 10 + 3 literal groups
    a = 4
    vals = []
    for k in range(4):
        vals.extend([(a * k) % 16] * 10)
    vals += [(a + 3 * j) % 16 for j in range(40, 64)]
    _, n_rle, n_bp = mm.rle_bp_decode(mm.rle_bp_encode(vals, 4),
                                      64, 4)
    assert (n_rle, n_bp) == (4, 3)

    with _pt.raises(ValueError):
        mm.rle_bp_encode([16], 4)                 # out of range
    with _pt.raises(ValueError):
        mm.rle_bp_decode(buf[:-1], len(vals), 4)  # truncation
    with _pt.raises(ValueError):
        mm.rle_bp_decode(buf + b"\x00", 23, 4)    # trailing bytes
    with _pt.raises(ValueError):
        mm.rle_bp_decode(buf, 22, 4)              # nonzero pad claim


def test_interval_islands_hand_cases(spark):
    from ecmm428_pycart_spark.datapipe.funnel import interval_islands

    rows = [
        # key 1: [1,5] + nested [2,3] + touching [5,9] -> one island
        # [1,9]; adjacent-but-not-touching [11,12] -> second island.
        Row(k=1, s=1, e=5), Row(k=1, s=2, e=3),
        Row(k=1, s=5, e=9), Row(k=1, s=11, e=12),
        # key 2: single point interval.
        Row(k=2, s=7, e=7),
        # key 3: adjacent [1,5],[6,7] stay separate at gap 0.
        Row(k=3, s=1, e=5), Row(k=3, s=6, e=7),
    ]
    df = spark.createDataFrame(rows)
    got = {r.k: r for r in
           interval_islands(df, "k", "s", "e").collect()}
    assert (got[1].n_intervals, got[1].n_islands,
            got[1].covered_units, got[1].max_island_units) \
        == (4, 2, 11, 9)
    assert (got[2].n_intervals, got[2].n_islands,
            got[2].covered_units, got[2].max_island_units) \
        == (1, 1, 1, 1)
    assert (got[3].n_intervals, got[3].n_islands,
            got[3].covered_units, got[3].max_island_units) \
        == (2, 2, 7, 5)
    # gap 1 bridges the adjacency on key 3.
    got3 = {r.k: r for r in
            interval_islands(df, "k", "s", "e",
                             merge_gap=1).collect()}
    assert (got3[3].n_islands, got3[3].covered_units) == (1, 7)


def test_inflate_all_block_types_and_guards():
    import zlib
    from ecmm428_pycart_spark.datapipe.multimodal import (
        adler32_manual, inflate, zlib_decompress_manual)
    import random

    rng = random.Random(42)
    cases = [b"", b"a", b"hello world " * 50,
             bytes(rng.randrange(256) for _ in range(5000)),
             b"ab" * 3000,  # overlapping-match (dist < len) replay
             bytes(rng.randrange(4) for _ in range(20000))]
    # level 0 = stored blocks; 1/6/9 = fixed/dynamic mixes.
    for lvl in (0, 1, 6, 9):
        for d in cases:
            assert zlib_decompress_manual(zlib.compress(d, lvl)) == d
    # force every encoder strategy the spec allows.
    for strat in (zlib.Z_FIXED, zlib.Z_RLE, zlib.Z_HUFFMAN_ONLY):
        for d in cases:
            co = zlib.compressobj(6, zlib.DEFLATED, 15, 8, strat)
            assert zlib_decompress_manual(co.compress(d)
                                          + co.flush()) == d
    # hand-built stored block: BFINAL=1 BTYPE=00, LEN=3 NLEN=~3.
    assert inflate(bytes([0x01, 0x03, 0x00, 0xFC, 0xFF])
                   + b"abc") == b"abc"
    assert adler32_manual(b"Wikipedia") == zlib.adler32(b"Wikipedia")
    # guards: reserved BTYPE, NLEN mismatch, bad FCHECK, FDICT,
    # corrupted trailer, truncation.
    with pytest.raises(ValueError, match="reserved block"):
        inflate(bytes([0x07, 0x00]))
    with pytest.raises(ValueError, match="LEN/NLEN"):
        inflate(bytes([0x01, 0x03, 0x00, 0x00, 0x00]) + b"abc")
    good = bytearray(zlib.compress(b"payload", 6))
    bad = bytearray(good)
    bad[1] ^= 0x01
    with pytest.raises(ValueError, match="FCHECK"):
        zlib_decompress_manual(bytes(bad))
    bad = bytearray(good)
    bad[1] |= 0x20
    with pytest.raises(ValueError, match="zlib"):
        zlib_decompress_manual(bytes(bad))
    bad = bytearray(good)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="Adler-32"):
        zlib_decompress_manual(bytes(bad))
    with pytest.raises(ValueError, match="truncated|too short"):
        zlib_decompress_manual(good[:4])


def test_cc_two_phase_vs_union_find(spark):
    import random
    from ecmm428_pycart_spark.datapipe.graph import cc_two_phase

    def uf_labels(n_nodes, edges):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # min-id labels for nodes that appear in edges
        touched = {x for e in edges for x in e}
        return {x: find(x) for x in touched}

    # long path 0-1-...-19 (multi-round star contraction), two
    # separate small components, a cycle.
    path = [(i, i + 1) for i in range(20)]
    extra = [(30, 31), (31, 32), (40, 41), (50, 51), (51, 52),
             (52, 50)]
    edges = path + extra
    df = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in edges])
    got = {r.node: r.component
           for r in cc_two_phase(df).collect()}
    assert got == uf_labels(60, edges)

    # randomized graph replay
    rng = random.Random(7)
    redges = [(rng.randrange(200), rng.randrange(200))
              for _ in range(150)]
    redges = [(a, b) for a, b in redges if a != b]
    rdf = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in redges])
    got = {r.node: r.component
           for r in cc_two_phase(rdf).collect()}
    assert got == uf_labels(200, redges)


def test_annotator_agreement_known_kappa(spark):
    from ecmm428_pycart_spark.datapipe.text import annotator_agreement

    # classic 2x2 worked example: 50 items,
    # a=yes,b=yes: 20; a=yes,b=no: 5; a=no,b=yes: 10; a=no,b=no: 15.
    rows = ([Row(a="y", b="y")] * 20 + [Row(a="y", b="n")] * 5
            + [Row(a="n", b="y")] * 10 + [Row(a="n", b="n")] * 15)
    r = annotator_agreement(spark.createDataFrame(rows),
                            "a", "b").head()
    # po = 35/50 = 0.7; S = 25*30 + 25*20 = 1250;
    # pe = 1250/2500 = 0.5; kappa = 0.2/0.5 = 0.4.
    assert (r.n_items, r.n_agree, r.n_classes) == (50, 35, 2)
    assert (r.po_ppm, r.pe_ppm) == (700000, 500000)
    assert (r.kappa_num, r.kappa_den) == (35 * 50 - 1250,
                                          2500 - 1250)
    assert r.kappa_num * 10 == 4 * r.kappa_den  # kappa == 0.4

    # perfect agreement -> kappa_num == kappa_den
    rows = [Row(a=str(i % 3), b=str(i % 3)) for i in range(30)]
    r = annotator_agreement(spark.createDataFrame(rows),
                            "a", "b").head()
    assert r.n_agree == 30 and r.kappa_num == r.kappa_den

    # below-chance: everything disagrees on a 50/50 split ->
    # negative numerator survives undivided.
    rows = [Row(a="0", b="1")] * 10 + [Row(a="1", b="0")] * 10
    r = annotator_agreement(spark.createDataFrame(rows),
                            "a", "b").head()
    assert r.n_agree == 0 and r.kappa_num < 0
    assert r.kappa_num == 0 * 20 - 200 and r.kappa_den == 400 - 200


def test_postings_varint_codec_and_stats(spark):
    from ecmm428_pycart_spark.datapipe.text import (
        postings_decode, postings_encode, postings_varint_stats,
        varint_encode)

    # LEB128 boundary lengths
    for v, n in [(0, 1), (127, 1), (128, 2), (16383, 2), (16384, 3),
                 (2097151, 3), (2097152, 4)]:
        assert len(varint_encode(v)) == n, v
    # roundtrips: first id 0, multi-byte gaps at boundaries
    for ids in ([0], [0, 127, 255], [5], [0, 128, 16512],
                 list(range(0, 5000, 7)), [1, 2, 3, 131, 16515]):
        assert postings_decode(postings_encode(ids)) == ids
    # guards
    with pytest.raises(ValueError, match="strictly increasing"):
        postings_encode([3, 3])
    with pytest.raises(ValueError, match="strictly increasing"):
        postings_encode([5, 4])
    with pytest.raises(ValueError, match="truncated"):
        postings_decode(b"\x80")
    # Spark stats vs a Python replay on a toy index
    pairs = [Row(term="a", doc_id=d) for d in [0, 1, 200, 1 << 20]] \
        + [Row(term="b", doc_id=d) for d in [7]] \
        + [Row(term="a", doc_id=1)]  # duplicate pair collapses
    got = {r.term: r for r in
           postings_varint_stats(
               spark.createDataFrame(pairs)).collect()}
    a_ids = [0, 1, 200, 1 << 20]
    assert got["a"].n_postings == 4
    assert got["a"].varint_bytes == len(postings_encode(a_ids))
    assert got["a"].id_sum == sum(a_ids)
    assert (got["b"].n_postings, got["b"].varint_bytes,
            got["b"].id_sum) == (1, 1, 7)


def test_stream_value_drift_slice_invariance(spark, tmp_path):
    """streaming.stream_value_drift: 2-slice == 3-slice == a Python
    replay of the q114 chi-square on the same events (bucket-count
    accumulation is associative)."""
    import datetime
    import math
    import os
    import uuid

    from ecmm428_pycart_spark.benchmarks.relational import _await_stream
    from ecmm428_pycart_spark.streaming.events import (
        read_events_stream, stream_value_drift,
        write_time_ordered_stream_dir)

    base = datetime.datetime(2024, 3, 1)
    rows = []
    for eid in range(240):
        day, val = eid % 5, float((eid * 37) % 400)
        # drifting type: odd days systematically pricier
        if eid % 2:
            val += 200.0 * (day % 2)
        rows.append((eid, base + datetime.timedelta(
            days=day, minutes=eid), 1,
            "drift" if eid % 2 else "flat", val, None))
    # null ts / null value rows must be ignored on both sides
    rows.append((900, None, 1, "drift", 5.0, None))
    rows.append((901, base, 1, "flat", None, None))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")

    def run(n_slices):
        d = str(tmp_path / f"vd{n_slices}")
        os.makedirs(d)
        write_time_ordered_stream_dir(
            [ev.filter(F.pmod(F.col("event_id"), F.lit(n_slices)) == i)
             for i in range(n_slices)], d)
        name = f"vd_{uuid.uuid4().hex[:8]}"
        _await_stream(
            spark,
            stream_value_drift(
                read_events_stream(spark, d, max_files_per_trigger=1),
                band_cents=2000)
            .writeStream.format("memory").queryName(name)
            .outputMode("update").trigger(availableNow=True))
        from pyspark.sql import Window as W
        fin = (spark.table(name)
               .withColumn("_rn", F.row_number().over(
                   W.partitionBy("event_type")
                   .orderBy(F.col("n_events").desc())))
               .filter(F.col("_rn") == 1))
        return {r.event_type: (r.n_events, r.n_buckets,
                               r.n_even_days, r.n_odd_days,
                               r.chi2_ppm, r.worst_bucket_ppm)
                for r in fin.collect()}

    got2, got3 = run(2), run(3)
    assert got2 == got3

    # Python replay of the q114 definition
    exp = {}
    for (eid, ts, _u, et, val, _p) in rows:
        if ts is None or val is None:
            continue
        half = (int(ts.timestamp()) // 86400) % 2
        bucket = math.floor(val * 100) // 2000
        acc = exp.setdefault(et, {})
        slot = acc.setdefault(bucket, [0, 0])
        slot[half] += 1
    for et, acc in exp.items():
        n_even = sum(v[0] for v in acc.values())
        n_odd = sum(v[1] for v in acc.values())
        contribs = [(a - c) * (a - c) * 1000000 // (a + c)
                    for a, c in acc.values()]
        assert got2[et][1:] == (len(acc), n_even, n_odd,
                                sum(contribs), max(contribs)), et
    assert got2["drift"][4] > got2["flat"][4]


def test_gzip_member_walk_and_guards():
    import gzip
    import zlib
    from ecmm428_pycart_spark.datapipe.multimodal import (
        crc32_manual, gzip_decompress_manual)

    data = b"the quick brown fox " * 100
    assert crc32_manual(data) == zlib.crc32(data)
    assert crc32_manual(b"") == 0
    dec, mtime, fname = gzip_decompress_manual(
        gzip.compress(data, 6, mtime=12345))
    assert dec == data and mtime == 12345 and fname is None

    # hand-built header exercising FEXTRA + FNAME + FCOMMENT + FHCRC
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw = co.compress(data) + co.flush()
    hdr = bytearray([0x1F, 0x8B, 8, 4 | 8 | 16 | 2,
                     1, 0, 0, 0, 0, 255])
    hdr += (3).to_bytes(2, "little") + b"abc"
    hdr += b"file.txt\x00" + b"a comment\x00"
    hdr += (crc32_manual(bytes(hdr)) & 0xFFFF).to_bytes(2, "little")
    good = bytes(hdr) + raw \
        + zlib.crc32(data).to_bytes(4, "little") \
        + (len(data) % (1 << 32)).to_bytes(4, "little")
    dec2, mt2, fn2 = gzip_decompress_manual(good)
    assert dec2 == data and mt2 == 1 and fn2 == "file.txt"

    # guards: magic, CM, reserved FLG, header CRC, trailer CRC, ISIZE
    base = bytearray(gzip.compress(data, 6, mtime=0))
    for mutate, msg in [
            (lambda b: b.__setitem__(0, 0x1E), "bad magic"),
            (lambda b: b.__setitem__(2, 9), "CM"),
            (lambda b: b.__setitem__(3, 0x80), "reserved"),
            (lambda b: b.__setitem__(len(b) - 5, b[-5] ^ 0xFF),
             "CRC-32 mismatch"),
            (lambda b: b.__setitem__(len(b) - 1, b[-1] ^ 0xFF),
             "ISIZE"),
    ]:
        bad = bytearray(base)
        mutate(bad)
        with pytest.raises(ValueError, match=msg):
            gzip_decompress_manual(bytes(bad))
    hc = bytearray(good)
    hc[13] ^= 0xFF  # corrupt an FEXTRA data byte under the FHCRC
    with pytest.raises(ValueError, match="header CRC"):
        gzip_decompress_manual(bytes(hc))


def test_association_rules_hand_counts(spark):
    from ecmm428_pycart_spark.datapipe.graph import association_rules

    baskets = {1: "ABC", 2: "AB", 3: "AC", 4: "B"}
    rows = [Row(u=u, v=i) for u, s in baskets.items() for i in s]
    out = {(r.a, r.b): r for r in association_rules(
        spark.createDataFrame(rows), min_weight=1).collect()}
    # n_baskets=4, n_A=3, n_B=3, n_C=2, AB=2, AC=2, BC=1
    ab = out[("A", "B")]
    assert (ab.n_ab, ab.n_a, ab.n_b) == (2, 3, 3)
    assert ab.support_ppm == 2 * 1000000 // 4
    assert ab.conf_ab_ppm == 2 * 1000000 // 3
    assert (ab.lift_num, ab.lift_den) == (8, 9)     # lift < 1
    ac = out[("A", "C")]
    assert (ac.lift_num, ac.lift_den) == (8, 6)     # lift > 1
    bc = out[("B", "C")]
    assert (bc.n_ab, bc.conf_ba_ppm) == (1, 1000000 // 2)
    # min_weight=2 drops BC; degree cap 2 drops basket 1 entirely
    out2 = association_rules(spark.createDataFrame(rows),
                             min_weight=2).collect()
    assert {(r.a, r.b) for r in out2} == {("A", "B"), ("A", "C")}
    out3 = {(r.a, r.b): r for r in association_rules(
        spark.createDataFrame(rows), max_src_degree=2,
        min_weight=1).collect()}
    # without basket 1: AB only in u2, AC only in u3; marginals drop
    assert out3[("A", "B")].n_ab == 1
    assert out3[("A", "B")].n_a == 2  # A in u2, u3


def test_png_adaptive_encoder_roundtrip_and_filters():
    import struct
    import zlib

    import numpy as np
    from ecmm428_pycart_spark.datapipe.multimodal import (
        decode_png_pixels, png_encode_adaptive)

    def filters_of(buf, h, w, ch):
        i, idat = 8, b""
        while i + 8 <= len(buf):
            (ln,) = struct.unpack(">I", buf[i:i + 4])
            if buf[i + 4:i + 8] == b"IDAT":
                idat += buf[i + 8:i + 8 + ln]
            i += 12 + ln
        raw = zlib.decompress(idat)
        stride = w * ch + 1
        return {raw[r * stride] for r in range(h)}

    rng = np.random.default_rng(3)
    rand = rng.integers(0, 256, (20, 13, 3), dtype=np.uint8)
    grad_x = np.tile(np.arange(16, dtype=np.uint8) * 16, (16, 1))
    grad_x3 = grad_x[:, :, None] * np.ones((1, 1, 3), np.uint8)
    gray = rng.integers(0, 256, (9, 9), dtype=np.uint8)
    seen = set()
    for arr in (rand, grad_x3, np.zeros((5, 5, 3), np.uint8), gray):
        buf = png_encode_adaptive(arr)
        src = arr if arr.ndim == 3 else arr[:, :, None]
        assert np.array_equal(decode_png_pixels(buf), src)
        h, w = src.shape[:2]
        seen |= filters_of(buf, h, w, src.shape[2])
    # the heuristic must actually be adaptive: noise keeps rows
    # unfiltered-ish, x-gradients pick Sub, identical rows pick Up,
    # and the structured gate pattern reaches Paeth.
    y, x = np.mgrid[0:16, 0:16]
    c = np.arange(3)
    v = (((4 * (x + 2 * y))[:, :, None] + 11 * c[None, None, :]
          + ((x * y) % 7)[:, :, None]) % 256).astype(np.uint8)
    seen |= filters_of(png_encode_adaptive(v), 16, 16, 3)
    assert {1, 2, 4} <= seen and len(seen) >= 4, seen
    with pytest.raises(ValueError, match="uint8"):
        png_encode_adaptive(np.zeros((4, 4, 3), np.int32))
    with pytest.raises(ValueError, match="uint8"):
        png_encode_adaptive(np.zeros((4, 4, 2), np.uint8))


def test_sorted_neighborhood_known_pairs(spark):
    from ecmm428_pycart_spark.datapipe.dedup import (
        sorted_neighborhood_pairs)

    # block = fp & 3 (block_bits=2). Block 1: fps 1, 5, 9, 13 ->
    # sorted run of 4; window 2 pairs each with its two
    # predecessors. Block 2: fps 2, 6 -> one pair. A negative fp
    # lands by its two's-complement low bits (-3 & 3 == 1).
    rows = [Row(doc_id=i, simhash=f) for i, f in
            [(1, 1), (2, 5), (3, 9), (4, 13), (5, 2), (6, 6),
             (7, -3)]]
    got = {(r.doc_a, r.doc_b): (r.block, r.hamming)
           for r in sorted_neighborhood_pairs(
               spark.createDataFrame(rows), window=2,
               block_bits=2).collect()}
    # block 1 sorted by fp: -3 sorts first (doc 7), then 1,5,9,13
    expect_pairs = {(7, 1), (7, 2), (1, 2), (2, 3), (1, 3), (3, 4),
                    (2, 4), (5, 6)}
    assert set(got) == expect_pairs, sorted(got)
    assert got[(1, 2)][1] == bin(1 ^ 5).count("1")
    assert got[(5, 6)] == (2, bin(2 ^ 6).count("1"))
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(spark.createDataFrame(rows),
                                  window=0)


def test_ulaw_compress_inverse_and_clip():
    import numpy as np
    from ecmm428_pycart_spark.datapipe.multimodal import (
        _ulaw_expand, ulaw_compress)

    # bit-exact inverse of the expansion on every byte except 0x7F
    # (negative zero canonically re-encodes as 0xFF)
    b = np.arange(256, dtype=np.uint8)
    rt = ulaw_compress(_ulaw_expand(b))
    assert list(np.nonzero(rt != b)[0]) == [0x7F]
    assert rt[0x7F] == 0xFF
    # clipping: everything past 32635 encodes like 32635
    assert ulaw_compress(np.array([32767])) \
        == ulaw_compress(np.array([32635]))
    assert ulaw_compress(np.array([-32768])) \
        == ulaw_compress(np.array([-32635]))
    # quantization error bounded by half the widest segment step
    x = np.arange(-32768, 32768, dtype=np.int32)
    clip = np.clip(x, -32635, 32635)
    err = np.abs(_ulaw_expand(ulaw_compress(x)) - clip)
    assert err.max() <= 512
    # zero is exact
    assert _ulaw_expand(ulaw_compress(np.array([0])))[0] == 0


def test_zip_deflate_members_roundtrip_and_guards():
    import io
    import zipfile

    from ecmm428_pycart_spark.datapipe.multimodal import (
        decode_zip_members, zip_bytes_mixed)

    data = b"hello zip world " * 200
    z = zip_bytes_mixed([("a.txt", data, 8), ("b.bin", b"\x00\x01", 0),
                         ("c.txt", b"", 8)])
    assert decode_zip_members(z) == [("a.txt", data),
                                     ("b.bin", b"\x00\x01"),
                                     ("c.txt", b"")]
    # independent validation: stdlib zipfile reads our archive
    zf = zipfile.ZipFile(io.BytesIO(z))
    assert zf.read("a.txt") == data and zf.read("b.bin") == b"\x00\x01"
    # deflate actually compressed the repetitive member
    assert len(z) < len(data)
    # guards: corrupt member payload -> CRC mismatch; bad method;
    # missing EOCD
    bad = bytearray(z)
    start = z.index(b"a.txt") + 5
    bad[start] ^= 0xFF
    with pytest.raises(ValueError, match="deflate|CRC"):
        decode_zip_members(bytes(bad))
    with pytest.raises(ValueError, match="method"):
        zip_bytes_mixed([("x", b"d", 9)])
    with pytest.raises(ValueError, match="end-of-central"):
        decode_zip_members(b"not a zip")


def test_robots_filter_longest_match_semantics(spark):
    from ecmm428_pycart_spark.datapipe.text import robots_filter

    rules = spark.createDataFrame(
        [Row(rule_id=1, rtype="disallow", prefix="/private"),
         Row(rule_id=2, rtype="allow", prefix="/private/pub"),
         Row(rule_id=3, rtype="disallow", prefix="/tmp"),
         Row(rule_id=4, rtype="allow", prefix="/tmpx"),
         Row(rule_id=5, rtype="disallow", prefix="/dup"),
         Row(rule_id=6, rtype="allow", prefix="/dup")])
    paths = ["/private/a", "/private/pub/a", "/public/x",
             "/tmp/f", "/tmpxtra", "/dup/page"]
    out = {r.path: (r.rule_id, r.allowed)
           for r in robots_filter(
               spark.createDataFrame([Row(path=p) for p in paths]),
               rules).collect()}
    assert out["/private/a"] == (1, False)        # plain disallow
    assert out["/private/pub/a"] == (2, True)     # longer allow wins
    assert out["/public/x"] == (0, True)          # no match -> allow
    assert out["/tmp/f"] == (3, False)
    assert out["/tmpxtra"] == (4, True)           # /tmpx longer /tmp
    assert out["/dup/page"] == (6, True)          # equal len -> allow


def test_pnm_codec_grammar_and_guards():
    import numpy as np
    from ecmm428_pycart_spark.datapipe.multimodal import (
        pnm_decode, pnm_encode)

    rng = np.random.default_rng(1)
    for arr in (rng.integers(0, 256, (7, 9, 3), dtype=np.uint8),
                rng.integers(0, 256, (5, 4), dtype=np.uint8)):
        assert np.array_equal(pnm_decode(pnm_encode(arr)), arr)
    # full header grammar: comments between tokens, mixed whitespace
    hdr = b"P6 # c1\n# full line comment\n  9\t7\n# last\n255\n"
    raw = bytes(rng.integers(0, 256, 9 * 7 * 3).astype(np.uint8))
    dec = pnm_decode(hdr + raw)
    assert dec.shape == (7, 9, 3) and dec.tobytes() == raw
    with pytest.raises(ValueError, match="PGM/PPM"):
        pnm_decode(b"P3\n1 1\n255\n0 0 0")   # ASCII variant rejected
    with pytest.raises(ValueError, match="truncated raster"):
        pnm_decode(b"P5\n4 4\n255\n" + b"\x00" * 15)
    with pytest.raises(NotImplementedError, match="16-bit"):
        pnm_decode(b"P5\n1 1\n65535\n\x00\x00")
    with pytest.raises(ValueError, match="uint8"):
        pnm_encode(np.zeros((2, 2), np.int32))


def test_registrable_domain_psl_semantics(spark):
    from ecmm428_pycart_spark.datapipe.text import registrable_domain

    sfx = spark.createDataFrame(
        [Row(suffix=s) for s in
         ["com", "org", "uk", "co.uk", "ac.uk", "github.io", "io"]])
    hosts = ["www.example.com", "blog.example.co.uk",
             "a.b.example.co.uk", "example.ac.uk", "co.uk",
             "user1.github.io", "deep.user2.github.io",
             "plain.io", "unmatched.zz"]
    out = {r.host: (r.public_suffix, r.registrable)
           for r in registrable_domain(
               spark.createDataFrame([Row(host=h) for h in hosts]),
               sfx).collect()}
    assert out["www.example.com"] == ("com", "example.com")
    # longest suffix wins: co.uk beats uk
    assert out["blog.example.co.uk"] == ("co.uk", "example.co.uk")
    assert out["a.b.example.co.uk"] == ("co.uk", "example.co.uk")
    assert out["example.ac.uk"] == ("ac.uk", "example.ac.uk")
    # a host that IS a suffix has no registrable part
    assert out["co.uk"] == ("co.uk", None)
    # private suffix: github.io beats io
    assert out["user1.github.io"] == ("github.io",
                                      "user1.github.io")
    assert out["deep.user2.github.io"] == ("github.io",
                                           "user2.github.io")
    assert out["plain.io"] == ("io", "plain.io")
    assert out["unmatched.zz"] == (None, None)


def test_utf8_audit_spec_vectors():
    from ecmm428_pycart_spark.datapipe.text import utf8_audit

    c = utf8_audit("abc€𝄞ü".encode())
    assert (c["ascii"], c["two"], c["three"], c["four"]) \
        == (3, 1, 1, 1)
    assert sum(v for k, v in c.items()
               if k not in ("ascii", "two", "three", "four")) == 0
    # the spec's named violations, one vector each
    assert utf8_audit(b"\xC0\xAF")["overlong"] == 1       # 2-byte '/'
    assert utf8_audit(b"\xE0\x80\xAF")["overlong"] == 1   # 3-byte
    assert utf8_audit(b"\xF0\x80\x80\xAF")["overlong"] == 1
    assert utf8_audit(b"\xED\xA0\x80")["surrogate"] == 1  # U+D800
    assert utf8_audit(b"\xF4\x90\x80\x80")["too_large"] == 1
    assert utf8_audit(b"\xE2\x82")["truncated"] == 1
    assert utf8_audit(b"\x80")["bad_lead"] == 1           # stray cont
    assert utf8_audit(b"\xFF")["bad_lead"] == 1
    assert utf8_audit(b"\xE2\x41\x41")["bad_continuation"] == 1
    # a valid decode agrees with Python's own decoder on counts
    s = ("мир 你好 🎉 plain").encode()
    c = utf8_audit(s)
    assert c["ascii"] + c["two"] + c["three"] + c["four"] \
        == len(s.decode())


def test_mp3_frame_walk_and_guards():
    from ecmm428_pycart_spark.datapipe.multimodal import (
        _MP3_BITRATES, _MP3_RATES, mp3_frame_bytes, mp3_walk)

    buf = b"".join(mp3_frame_bytes(1 + (3 + f) % 14, 0, f % 2)
                   for f in range(8))
    n, br, rate, ms = mp3_walk(buf)
    assert n == 8 and rate == 44100
    assert br == sum(_MP3_BITRATES[1 + (3 + f) % 14]
                     for f in range(8))
    assert ms == 8 * (1152000 // 44100)
    # every (bitrate, rate, padding) combo roundtrips as one frame
    for bi in range(1, 15):
        for ri in range(3):
            for pad in (0, 1):
                f = mp3_frame_bytes(bi, ri, pad)
                assert len(f) == (144 * _MP3_BITRATES[bi] * 1000
                                  // _MP3_RATES[ri]) + pad
                assert mp3_walk(f)[0] == 1
    with pytest.raises(ValueError, match="lost sync"):
        mp3_walk(b"\x00" * 8)
    with pytest.raises(ValueError, match="truncated frame"):
        mp3_walk(buf[:-1])
    bad = bytearray(mp3_frame_bytes(1, 0, 0))
    bad[1] &= 0b11100111  # version -> MPEG-2.5 (reserved here)
    with pytest.raises(NotImplementedError, match="MPEG-1"):
        mp3_walk(bytes(bad))
    free = bytearray(mp3_frame_bytes(1, 0, 0))
    free[2] &= 0x0F       # bitrate index -> 0 (free format)
    with pytest.raises(ValueError, match="free/bad bitrate"):
        mp3_walk(bytes(free))
    with pytest.raises(ValueError, match="bad bitrate"):
        mp3_frame_bytes(15, 0, 0)


def test_warc_roundtrip_and_framing():
    """REAL WARC walk (ISO 28500): header case/order insensitivity,
    Content-Length framing that ignores payload content (a payload
    embedding 'WARC/1.0' must NOT resync), and loud failures on every
    malformed shape."""
    from ecmm428_pycart_spark.datapipe.multimodal import (
        decode_warc_records, warc_bytes)

    buf = warc_bytes([
        ("response", "http://host3.example/p0", b"alpha"),
        # odd record: lower-cased, reversed header order (writer
        # contract) AND a payload containing the record marker
        ("request", "https://other.example:8080/q", b"WARC/1.0\r\nfake"),
        ("response", "http://host3.example/p2", b""),
    ])
    rs = decode_warc_records(buf)
    assert [r["warc_type"] for r in rs] == ["response", "request",
                                            "response"]
    assert rs[1]["payload"] == b"WARC/1.0\r\nfake"
    assert rs[1]["host"] == "other.example:8080"
    assert rs[2]["content_length"] == 0
    assert sum(r["content_length"] for r in rs) == 5 + 14 + 0
    # malformed shapes all raise (never silent resync)
    for bad, msg in [
            (b"HTTP/1.0\r\n\r\n", "version"),
            (b"WARC/1.0\r\nWARC-Type: x\r\n\r\n", "Content-Length"),
            (b"WARC/1.0\r\ncontent-length: 5\r\n\r\nab\r\n\r\n",
             "separator|truncated"),
            (buf[:-2], "separator|truncated"),
            (buf[:10], "unterminated"),
    ]:
        with pytest.raises(ValueError, match=msg):
            decode_warc_records(bad)


def test_warc_stats_udf_closed_forms(spark):
    """synth_warc_payload -> warc_record_stats matches the generative
    algebra for hand-picked ids (incl. id 0 and a 3-record id)."""
    from ecmm428_pycart_spark.datapipe import multimodal as mm

    df = spark.createDataFrame([Row(doc_id=i) for i in (0, 7, 38)])
    out = {r["doc_id"]: r["s"] for r in df.withColumn(
        "s", mm.warc_record_stats(
            mm.synth_warc_payload(F.col("doc_id")))).collect()}
    for i in (0, 7, 38):
        k = i % 3 + 1
        lens = [(i % 17) + 3 * j + 5 for j in range(k)]
        s = out[i]
        assert s["n_records"] == k
        assert s["n_responses"] == sum(1 for j in range(k)
                                       if j % 2 == 0)
        assert s["total_content"] == sum(lens)
        assert s["payload_sum"] == sum(
            (97 + (i + j) % 26) * lens[j] for j in range(k))
        assert s["first_host"] == f"host{(i // 7) % 5}.example"


def test_mixing_weights_hand_case(spark):
    """alpha=1/2 smoothing on a constructed 3-source corpus: token
    counts 100/400/2500 -> sqrt 10/20/50 -> weights 125000/250000/
    625000 ppm exactly (vs raw 33333/133333/833333): the tail source
    is upsampled ~3.7x, the head damped, the exact-integer contract
    honored (floor div, weights sum to <= 1e6)."""
    from ecmm428_pycart_spark.datapipe.text import mixing_weights

    rows = []
    for src, n in (("a", 100), ("b", 400), ("c", 2500)):
        rows.append(Row(doc_id=len(rows), source=src,
                        text=" ".join(["tok"] * n)))
    out = {r["source"]: r for r in
           mixing_weights(spark.createDataFrame(rows)).collect()}
    assert out["a"]["n_tokens"] == 100
    assert (out["a"]["w_ppm"], out["b"]["w_ppm"],
            out["c"]["w_ppm"]) == (125000, 250000, 625000)
    assert (out["a"]["p_ppm"], out["b"]["p_ppm"],
            out["c"]["p_ppm"]) == (33333, 133333, 833333)


def test_dup_span_stats_hand_case(spark):
    """Constructed corpus: docs A and B share one verbatim 12-token
    span (-> 5 consecutive duplicated 8-gram positions in each), doc
    C shares nothing, docs D+E+... all share a boilerplate span with
    df above the cap (-> excluded). Exact run accounting."""
    from ecmm428_pycart_spark.datapipe.dedup import dup_span_stats

    shared = " ".join(f"s{i}" for i in range(12))
    boiler = " ".join(f"b{i}" for i in range(8))
    rows = [
        Row(doc_id=0, text=f"a0 a1 a2 {shared} a3 a4 a5"),
        Row(doc_id=1, text=f"z0 z1 {shared} z2 z3 z4 z5"),
        Row(doc_id=2, text=" ".join(f"c{i}" for i in range(30))),
    ]
    # 5 docs all sharing `boiler` -> its gram df = 5 > max_df 4
    for d in range(3, 8):
        rows.append(Row(doc_id=d, text=f"u{d}x {boiler} v{d}y"))
    out = {r["doc_id"]: r for r in
           dup_span_stats(spark.createDataFrame(rows), n=8,
                          max_df=4).collect()}
    # a 12-token shared span yields 12-8+1 = 5 consecutive dup grams
    assert set(out) == {0, 1}
    for d in (0, 1):
        assert out[d]["n_dup_positions"] == 5
        assert out[d]["max_run"] == 5


def test_gzip_concatenated_members():
    """RFC 1952 §2.2 member concatenation (the .warc.gz layout):
    decode_gzip_members splits on REAL member boundaries located via
    inflate's consumed byte length — never by scanning for magic
    bytes (members may embed 1f 8b in their deflate stream)."""
    import gzip

    from ecmm428_pycart_spark.datapipe.multimodal import (
        decode_gzip_members, gzip_decompress_manual, inflate,
        inflate_consumed)

    parts = [b"\x1f\x8b fake magic inside " * 9, b"", b"tail"]
    buf = b"".join(gzip.compress(p, 6, mtime=i)
                   for i, p in enumerate(parts))
    ms = decode_gzip_members(buf)
    assert [d for d, _ in ms] == parts
    assert sum(ln for _, ln in ms) == len(buf)
    # inflate_consumed reports the exact deflate end offset
    import zlib
    raw = zlib.compress(parts[0], 6)[2:-4]
    out, used = inflate_consumed(raw + b"JUNK")
    assert out == parts[0] and used == len(raw)
    assert inflate(raw) == parts[0]
    # the single-member API now rejects trailing bytes
    with pytest.raises(ValueError, match="trailing"):
        gzip_decompress_manual(buf)
    # a truncated second member fails loudly mid-walk
    with pytest.raises(ValueError):
        decode_gzip_members(buf[:-5])


def test_warc_gz_stats_udf_closed_forms(spark):
    """synth_warc_gz_payload -> warc_gz_member_stats: one gzip member
    per WARC record, decompressed bytes match the verified 154-based
    record-length closed form."""
    from ecmm428_pycart_spark.datapipe import multimodal as mm

    df = spark.createDataFrame([Row(doc_id=i) for i in (0, 7, 38)])
    out = {r["doc_id"]: r["s"] for r in df.withColumn(
        "s", mm.warc_gz_member_stats(
            mm.synth_warc_gz_payload(F.col("doc_id")))).collect()}
    for i in (0, 7, 38):
        k = i % 3 + 1
        lens = [(i % 17) + 3 * j + 5 for j in range(k)]
        s = out[i]
        assert s["n_members"] == k and s["n_records"] == k
        assert s["total_raw"] == sum(
            154 + (8 if j % 2 == 0 else 7)
            + (2 if lens[j] >= 10 else 1) + lens[j]
            for j in range(k))
        assert s["payload_sum"] == sum(
            (97 + (i + j) % 26) * lens[j] for j in range(k))


def test_html_extract_hand_cases(spark):
    """REAL html.parser extraction: tricky markup (entities, comments,
    script with '<', attribute values containing '>') plus the
    synth_html closed forms on a constructed doc."""
    from ecmm428_pycart_spark.datapipe.text import (
        html_extract_stats, html_to_text, synth_html)

    tricky = ('<p>a &amp; b</p><!-- <p>no</p> -->'
              '<script>if (x<2) {}</script>'
              '<a href="/x?q=1&gt;2" title="a>b">c d</a><br/><p>e</p>'
              '<style>p>span {}</style><title>skip me</title>')
    ext, nl, lt = html_to_text(tricky)
    assert ext == "a & b c d e"
    assert (nl, lt) == (1, 2)

    # 37 tokens -> 4 paragraphs; only pid 1 is linked (pid 3 is last-
    # adjacent exclusion doesn't apply, but 3 % 4 != 1)
    text = " ".join(f"t{i}" for i in range(37))
    ext2, nl2, lt2 = html_to_text(synth_html(5, text))
    assert ext2 == text and (nl2, lt2) == (1, 2)

    df = spark.createDataFrame([Row(doc_id=5, source="a", text=text)])
    s = html_extract_stats(df).select("s.*").head()
    assert (s["n_ext_tokens"], s["n_links"], s["link_tokens"]) \
        == (37, 1, 2)


def test_outlink_extraction_closed_form_and_hardening(spark):
    """ADVICE r6: oracle the outlink chain. Hosts extracted from the
    synthetic page must equal the closed form
    [f'h{(doc_id*7+pid) % 13}' for eligible pids], BOTH quoting styles
    must actually occur across link indices ((pid//4) % 2 keys the
    quote — the old pid % 2 key never flipped because link pids are
    always odd), decoys must be skipped, and the real-crawl hardening
    must hold: first duplicate href wins, userinfo/port/case stripped."""
    from ecmm428_pycart_spark.datapipe.text import (
        extract_outlink_hosts, outlink_host_edges, synth_html_outlinks)

    doc_id = 5
    text = " ".join(f"t{i}" for i in range(130))  # 13 paragraphs
    html = synth_html_outlinks(doc_id, text)
    eligible = [pid for pid in range(13) if pid % 4 == 1 and pid < 12]
    assert eligible == [1, 5, 9]
    assert extract_outlink_hosts(html) == \
        [f"h{(doc_id * 7 + pid) % 13}" for pid in eligible]
    # both quoting styles appear (link 0 -> double, link 1 -> single)
    assert 'href="' in html and "href='" in html
    # decoy data-href targets never leak into the host list
    assert "decoy" not in " ".join(extract_outlink_hosts(html))

    # real-crawl hardening hand cases
    assert extract_outlink_hosts(
        '<a href="https://first.example/a" href="https://second.example/b">'
        "x</a>") == ["first"]
    assert extract_outlink_hosts(
        '<a href="https://user@H.Example:8080/p">x</a>') == ["h"]
    assert extract_outlink_hosts(
        '<a href="/relative">x</a><a href="ftp://f.example/x">y</a>') == []

    # Spark round-trip: edge list matches a Python replay, and pmod
    # keeps src_host non-negative even for a negative doc_id
    df = spark.createDataFrame(
        [Row(doc_id=5, text=text), Row(doc_id=-3, text=text)])
    got = sorted(
        (r.doc_id, r.src_host, r.dst_host)
        for r in outlink_host_edges(df).collect())
    want = sorted(
        (d, f"h{d % 13}", f"h{(d * 7 + pid) % 13}")
        for d in (5, -3) for pid in eligible)
    assert got == want
