"""Unit tests for the training-data-pipeline operators
(dedup / similarity / text analysis / multimodal plumbing)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pubmed_and_method_spark.operators.dedup import (
    exact_dedup,
    exact_dup_assignments,
    jaccard_verify,
    minhash_dedup_candidates,
    simhash64,
    simhash_near_dups,
)
from pubmed_and_method_spark.operators.similarity import (
    brute_force_topk,
    cosine_near_dup_pairs,
    lsh_topk,
)
from pubmed_and_method_spark.operators.text import predict_lang


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "the QUICK brown fox  jumps over the lazy dog!!"),  # exact dup of 1 after normalization
        (3, "The quick brown fox jumps over the lazy cat"),     # near dup
        (4, "completely different content about spark engines"),
        (5, "completely different content about spark engines"),  # exact dup of 4
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_exact_dedup_groups(docs):
    groups = {r.rep_id: r.n_dups for r in exact_dedup(docs, "doc_id", "text").collect()}
    assert groups[1] == 2
    assert groups[4] == 2
    assert groups[3] == 1


def test_exact_dup_assignments(docs):
    asg = {r.doc_id: r.rep_id for r in exact_dup_assignments(docs, "doc_id", "text").collect()}
    assert asg == {1: 1, 2: 1, 3: 3, 4: 4, 5: 4}


def test_minhash_lsh_plus_jaccard_verify(spark, docs):
    from pubmed_and_method_spark.functions.normalize import clean_tokens

    toks = docs.select(
        "doc_id", F.array_distinct(clean_tokens("text")).alias("toks")
    )
    cands = minhash_dedup_candidates(toks, "doc_id", "toks", num_hashes=16, bands=8)
    got = {(r.doc_id1, r.doc_id2) for r in cands.collect()}
    assert (1, 2) in got  # identical token sets must collide
    assert (4, 5) in got
    verified = jaccard_verify(cands, toks, "doc_id", "toks", threshold=0.99)
    vgot = {(r.doc_id1, r.doc_id2) for r in verified.collect()}
    assert (1, 2) in vgot and (4, 5) in vgot
    assert (1, 3) not in vgot  # near-dup fails the 0.99 bar


def test_simhash_identical_and_near(spark, docs):
    from pubmed_and_method_spark.functions.normalize import clean_tokens

    toks = docs.select(
        "doc_id", F.array_distinct(clean_tokens("text")).alias("toks")
    )
    sh = {r.doc_id: r.simhash for r in simhash64(toks, "doc_id", "toks").collect()}
    assert sh[1] == sh[2]
    assert sh[4] == sh[5]
    near = simhash_near_dups(toks, "doc_id", "toks", max_hamming=3)
    got = {(r.doc_id1, r.doc_id2): r.hamming for r in near.collect()}
    assert got[(1, 2)] == 0
    assert got[(4, 5)] == 0


def test_simhash_band_blocking_complete(spark):
    """Pigeonhole property: every pair within max_hamming MUST be
    found by band blocking (cross-check vs exhaustive hamming)."""
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(30):
        base = list(rng.choice(vocab, size=12, replace=False))
        rows.append((i, base))
        if i % 3 == 0:  # planted near-dup: one token swapped
            mod = base.copy()
            mod[0] = f"x{i}"
            rows.append((100 + i, mod))
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    sh = {r.doc_id: r.simhash for r in simhash64(df, "doc_id", "toks").collect()}
    found = {
        (r.doc_id1, r.doc_id2)
        for r in simhash_near_dups(df, "doc_id", "toks", max_hamming=3).collect()
    }
    ids = sorted(sh)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            ham = bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1")
            if ham <= 3:
                assert (a, b) in found, (a, b, ham)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(11)
    base = rng.standard_normal((20, 16)).astype("float32")
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    # planted near-dups: tiny perturbations of vec 0 and 7
    for j, src in [(100, 0), (107, 7)]:
        rows.append(
            (j, [float(x + 0.01 * rng.standard_normal()) for x in base[src]])
        )
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_brute_force_topk_finds_planted(vectors):
    res = brute_force_topk(
        vectors.filter(F.col("vec_id").isin(0, 7)), vectors, k=1
    ).collect()
    best = {r.query_id: r.cand_id for r in res}
    assert best[0] == 100
    assert best[7] == 107


def test_lsh_topk_recall_on_planted(vectors):
    res = lsh_topk(vectors, dim=16, k=3, bits=6, tables=6, seed=1).collect()
    best = {}
    for r in res:
        if r.rnk == 1:
            best[r.query_id] = r.cand_id
    assert best.get(0) == 100
    assert best.get(7) == 107


def test_lsh_topk_recall_gate(spark):
    """Quality gate for the ANN scale path (r03 verdict #1): on the
    ER-shaped clustered corpus, lsh_topk at the DEFAULT knobs
    (8 bits x 4 tables) must recover >=90% of the exact top-5, while
    doing a small fraction of the exact work (candidate volume well
    under n-1 per query)."""
    from pubmed_and_method_spark.operators.similarity import topk_recall
    from pubmed_and_method_spark.sources.datagen import clustered_embeddings_df

    emb = clustered_embeddings_df(
        spark, n_entities=40, per_entity=6, dim=64, noise=0.15, seed=7
    ).cache()
    n = emb.count()
    m = topk_recall(emb, dim=64, k=5, bits=8, tables=4, seed=42)
    assert m["recall_at_k"] >= 0.9, m
    assert m["n_queries"] == n
    # sub-exhaustive: exact evaluations per query must be far below
    # the brute-force n-1 (the whole point of the index)
    assert m["mean_candidates_per_query"] < (n - 1) / 2, m
    emb.unpersist()


def test_cosine_near_dup_pairs(vectors):
    pairs = cosine_near_dup_pairs(
        vectors, dim=16, threshold=0.95, bits=6, tables=8, seed=1
    ).collect()
    got = {(r.vec_id1, r.vec_id2) for r in pairs}
    assert (0, 100) in got
    assert (7, 107) in got


def test_predict_lang(spark):
    rows = [
        ("the cat and the dog of the house",),  # en
        ("der hund und die katze ist nicht da",),  # de
        ("le chat est dans la maison et les chiens",),  # fr
        ("xyzzy qwerty",),  # no hits -> default en
    ]
    df = spark.createDataFrame(rows, ["text"])
    got = [r.p for r in df.select(predict_lang("text").alias("p")).collect()]
    assert got == ["en", "de", "fr", "en"]


def test_multimodal_decode_contract(spark, docs):
    from pubmed_and_method_spark.operators.multimodal import (
        attach_binary_payload,
        decode_batches,
    )

    out = decode_batches(attach_binary_payload(docs), codec="stub").collect()
    assert len(out) == docs.count()
    for r in out:
        assert r.modality == "image/fake"
        assert r.n_bytes > 0
        assert len(r.checksum) == 32
        assert 1 <= r.width <= 64 and 1 <= r.height <= 64
        assert len(r.feature) == 8


def test_multimodal_resize_contract(spark, docs):
    """resize_batches: 1 row in -> 1 row out, payload shrunk to the
    target budget, deterministic across runs (stub codec, real
    mapInPandas plumbing)."""
    from pubmed_and_method_spark.operators.multimodal import (
        attach_binary_payload,
        resize_batches,
    )

    payloads = attach_binary_payload(docs)
    a = sorted(resize_batches(payloads, 8, 8, codec="stub").collect())
    b = sorted(resize_batches(payloads, 8, 8, codec="stub").collect())
    assert a == b  # deterministic
    assert len(a) == docs.count()
    for r in a:
        assert (r.width, r.height) == (8, 8)
        assert 1 <= len(r.resized) <= max(1, 8 * 8 // 64)
        assert 0 < r.resize_ratio <= 1.0


def test_multimodal_codec_resolution(spark):
    """codec='auto' must resolve to PIL exactly when Pillow imports;
    'pil' without Pillow must raise ImportError at plan-build time
    (not inside an executor); unknown codecs rejected."""
    from pubmed_and_method_spark.operators import multimodal as M

    assert M._resolve_codec("auto") == ("pil" if M._PIL else "stub")
    assert M._resolve_codec("stub") == "stub"
    with pytest.raises(ValueError):
        M._resolve_codec("ffmpeg")
    if M._PIL is None:
        with pytest.raises(ImportError):
            M._resolve_codec("pil")


def test_multimodal_pnm_real_codec(spark, docs):
    """The dependency-free REAL codec: engine-built P5 payloads must
    decode to header-true dimensions and a pixel histogram that
    matches an independent per-row numpy recomputation; resize must be
    a true nearest-neighbour resample (verified against numpy
    indexing on the decoded raster)."""
    import numpy as np

    from pubmed_and_method_spark.operators import multimodal as M

    payloads = M.attach_pnm_payload(docs)
    raw = {r.doc_id: (bytes(r.payload), r.text)
           for r in payloads.select("doc_id", "payload", "text").collect()}
    dec = {r.doc_id: r
           for r in M.decode_batches(payloads, codec="pnm").collect()}
    for doc_id, (blob, text) in raw.items():
        tlen = len(text)
        w = tlen % 13 + 4
        h = -(-tlen // w)
        header = f"P5 {w} {h} 255\n".encode()
        assert blob == header + text.encode().ljust(w * h, b"\x00")
        r = dec[doc_id]
        assert (r.width, r.height) == (w, h)
        px = np.frombuffer(blob[len(header):], dtype=np.uint8)
        want = np.bincount(px >> 5, minlength=8) / (w * h)
        # DECODED_SCHEMA ships features as float32
        assert r.feature == pytest.approx(want.tolist(), abs=1e-6)
    res = {r.doc_id: bytes(r.resized)
           for r in M.resize_batches(payloads, 3, 2, codec="pnm").collect()}
    for doc_id, out in res.items():
        w2, h2, px2 = M._pnm_parse(out)
        assert (w2, h2) == (3, 2)
        w, h, px = M._pnm_parse(raw[doc_id][0])
        img = px.reshape(h, w)
        rows = (np.arange(2) * h) // 2
        cols = (np.arange(3) * w) // 3
        assert (px2.reshape(2, 3) == img[np.ix_(rows, cols)]).all()


def test_multimodal_pnm_strictness():
    """A real decoder must REJECT malformed bytes, not fabricate
    metadata: bad magic, truncated raster, missing header newline."""
    from pubmed_and_method_spark.operators import multimodal as M

    with pytest.raises(ValueError):
        M._pnm_decode(b"P6 2 2 255\n" + b"\x00" * 12)  # color PPM: unsupported
    with pytest.raises(ValueError):
        M._pnm_decode(b"P5 4 4 255\n" + b"\x00" * 3)  # truncated raster
    with pytest.raises(ValueError):
        M._pnm_decode(b"plain text, no header")
    with pytest.raises(ValueError):
        M._pnm_decode(None)
    assert M._pnm_decode(b"P5 2 2 255\n\x00\x20\xff\x40") == (
        2, 2, [0.25, 0.25, 0.25, 0.0, 0.0, 0.0, 0.0, 0.25],
    )


def test_multimodal_pil_real_codec(spark):
    """Real-codec path (runs only where Pillow is installed — the
    `multimodal` extra): decode must report true pixel dimensions and
    a valid luminance histogram; resize must produce a PNG that
    round-trips to the target size."""
    from pubmed_and_method_spark.operators import multimodal as M

    if M._PIL is None:
        pytest.skip("Pillow not installed in this environment")
    from io import BytesIO

    def png_bytes(w, h, val):
        img = M._PIL.new("L", (w, h), color=val)
        buf = BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [(1, png_bytes(10, 6, 0)), (2, png_bytes(32, 8, 255))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").withColumn(
        "meta",
        F.struct(
            F.lit("image/png").alias("mime"),
            F.length("payload").alias("n_bytes"),
        ),
    )
    dec = {r.doc_id: r for r in M.decode_batches(df, codec="pil").collect()}
    assert (dec[1].width, dec[1].height) == (10, 6)
    assert (dec[2].width, dec[2].height) == (32, 8)
    assert dec[1].feature[0] == pytest.approx(1.0)  # all-black -> bin 0
    assert dec[2].feature[7] == pytest.approx(1.0)  # all-white -> bin 7
    res = {r.doc_id: r for r in M.resize_batches(df, 4, 4, codec="pil").collect()}
    for r in res.values():
        img = M._PIL.open(BytesIO(bytes(r.resized)))
        assert img.size == (4, 4)


def test_multimodal_frame_sample_expansion(spark, docs):
    """frame_sample_batches: the 1 -> N row expansion of a video
    demuxer — one row per sampled frame, stride every_k, monotone
    timestamp offsets, exact expected row count per doc."""
    import math

    from pubmed_and_method_spark.operators.multimodal import (
        attach_binary_payload,
        frame_sample_batches,
    )

    payloads = attach_binary_payload(docs)
    frames = frame_sample_batches(payloads, every_k=2, frame_bytes=8, fps=25)
    rows = frames.collect()
    n_bytes = {
        r.doc_id: r.meta.n_bytes for r in payloads.select("doc_id", "meta").collect()
    }
    expected = sum(
        math.ceil(max(1, nb // 8) / 2) for nb in n_bytes.values()
    )
    assert len(rows) == expected
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        idxs = sorted(r.frame_idx for r in rs)
        assert idxs == list(range(0, max(1, n_bytes[doc_id] // 8), 2))
        for r in rs:
            assert r.ts_offset_ms == r.frame_idx * 1000 // 25
            assert len(r.frame) > 0


def test_winnow_guarantee_and_edges(spark):
    """Winnowing guarantee: two documents sharing a token run of
    length >= w+k-1 share at least one fingerprint; plus the short-doc
    and empty-doc degradation contract."""
    from pubmed_and_method_spark.operators.dedup import winnow_fingerprints

    shared = "gradient descent converges under convex losses with small steps"
    rows = [
        (1, f"intro alpha beta {shared} gamma delta closing words"),
        (2, f"unrelated opening text {shared} different ending entirely here"),
        (3, "nothing in common with the others at all whatsoever today"),
        (4, "tiny doc"),          # < k tokens after cleaning -> 1 whole-doc gram
        (5, "the a an"),          # all stopwords -> no tokens -> no rows
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = winnow_fingerprints(df, "doc_id", "text", k=3, w=4)
    by_doc = {
        r.doc_id: set(r.fps)
        for r in fps.groupBy("doc_id").agg(
            F.collect_set("fp").alias("fps")
        ).collect()
    }
    # shared passage (9 tokens >= w+k-1 = 6) -> shared fingerprint
    assert by_doc[1] & by_doc[2]
    # no shared passage -> no shared fingerprint on this tiny corpus
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    # short doc degrades to exactly one fingerprint
    assert len(by_doc[4]) == 1
    # no-token doc emits no rows
    assert 5 not in by_doc
    # density: fingerprints per doc well below gram count (~2/(w+1))
    n_toks = 11
    assert all(len(v) < n_toks for v in by_doc.values())


def test_winnow_near_dup_pairs_df_cap(spark):
    """The df-cap drops boilerplate grams BEFORE the self-join: a gram
    shared by every doc must not produce all-pairs output."""
    from pubmed_and_method_spark.operators.dedup import winnow_near_dup_pairs

    boiler = "standard legal disclaimer applies to every single document here"
    rows = [(i, f"{boiler} unique{i} filler{i} content{i} body{i}")
            for i in range(1, 7)]
    # docs 1 and 2 additionally share a real passage
    passage = "shared analysis of entity resolution blocking strategies"
    rows[0] = (1, f"{boiler} {passage} tail one")
    rows[1] = (2, f"{boiler} {passage} tail two")
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # cap at 3: the boilerplate grams (df=6) are dropped, the shared
    # passage (df=2) survives
    pairs = winnow_near_dup_pairs(
        df, "doc_id", "text", k=3, w=4, min_shared=1, max_doc_freq=3
    ).collect()
    got = {(r.doc_id1, r.doc_id2) for r in pairs}
    assert (1, 2) in got
    # without the cap the boilerplate joins everything to everything
    uncapped = winnow_near_dup_pairs(
        df, "doc_id", "text", k=3, w=4, min_shared=1, max_doc_freq=1000
    ).count()
    assert uncapped > len(got)


def test_duplicate_spans_hand_computed(spark):
    """Adjacent duplicated 3-grams merge into ONE maximal span with
    1-based inclusive token offsets; every boundary re-derived by
    hand.  doc1/doc2 share the run [alpha beta gamma delta] -> two
    overlapping dup grams -> one merged span of length 4."""
    from pubmed_and_method_spark.operators.dedup import duplicate_spans

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "omega alpha beta gamma delta kappa"),
        (3, "nothing shared appears anywhere herein"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.span_start, r.span_end, r.span_len, r.n_dup_grams)
        for r in duplicate_spans(df, "doc_id", "text", k=3).collect()
    }
    # doc1 grams: pos1 [a b g], pos2 [b g d] duplicated -> span 1..4
    # doc2: same grams at pos2/pos3 -> span 2..5
    assert got == {1: (1, 4, 4, 2), 2: (2, 5, 4, 2)}


def test_duplicate_spans_split_and_degenerate(spark):
    """Dup-gram positions more than k apart stay SEPARATE spans; docs
    shorter than k tokens or with no duplicated gram emit no rows."""
    from pubmed_and_method_spark.operators.dedup import duplicate_spans

    head, tail = "redwood cypress maple", "basalt gneiss schist"
    rows = [
        (1, f"{head} fern moss lichen pine {tail}"),
        (2, f"{head} clay silt loam sand {tail}"),
        (3, "tiny doc"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_dup_grams)
        for r in duplicate_spans(df, "doc_id", "text", k=3).collect()
    )
    # 10 tokens/doc: dup grams only at pos 1 (head) and pos 8 (tail);
    # gap 7 > k -> two spans per doc, never welded across the filler.
    assert got == [
        (1, 1, 3, 1), (1, 8, 10, 1), (2, 1, 3, 1), (2, 8, 10, 1),
    ]


def test_bm25_topk_hand_computed(spark):
    """One BM25 score re-derived with python math (Lucene +1 idf,
    k1=1.2, b=0.75, avgdl as exact quotient); docs without query
    terms are absent; ranking deterministic."""
    import math

    from pubmed_and_method_spark.functions.tfidf import bm25_topk

    rows = [
        (1, "merge merge window"),
        (2, "stream"),
        (3, "alpha beta gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in bm25_topk(
            df, "doc_id", "text", ["merge", "window", "stream"], k=10
        ).collect()
    }
    assert set(got) == {1, 2}  # doc 3 matches nothing
    n, avgdl = 3, 7 / 3
    k1, b = 1.2, 0.75

    def contrib(tf, dfreq, dl):
        idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
        return round(
            idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl)), 6
        )

    expect_d1 = round(contrib(2, 1, 3) + contrib(1, 1, 3), 6)
    assert got[1].n_terms_matched == 2
    assert got[1].bm25 == expect_d1
    assert got[2].bm25 == contrib(1, 1, 1)


def test_ivf_topk_recall_gate(spark):
    """Quality gate for the trained-IVF ANN path: on the ER-shaped
    clustered corpus, ivf_topk at the default knobs (16 lists x 4
    probes) must recover >=90% of the exact top-5 while evaluating a
    small fraction of the brute-force candidates."""
    from pubmed_and_method_spark.operators.similarity import ivf_recall
    from pubmed_and_method_spark.sources.datagen import clustered_embeddings_df

    emb = clustered_embeddings_df(
        spark, n_entities=40, per_entity=6, dim=64, noise=0.15, seed=7
    ).cache()
    n = emb.count()
    m = ivf_recall(emb, dim=64, k=5, nlist=16, nprobe=4, seed=42)
    assert m["recall_at_k"] >= 0.9, m
    assert m["n_queries"] == n
    # sub-exhaustive: ~nprobe/nlist of brute force, far below n-1
    assert m["mean_candidates_per_query"] < (n - 1) / 2, m
    emb.unpersist()


def test_ivf_assignment_contract(spark):
    """IVF index invariants: every vector lands in EXACTLY one list
    (partition function, no loss, no double-count) and probes exactly
    nprobe lists; the portable twin agrees with an independent
    numpy re-derivation of assignment + probe + score on a small
    corpus."""
    import numpy as np
    from pubmed_and_method_spark.operators.similarity import (
        ivf_topk_portable,
        train_ivf_centroids,
        _ivf_candidate_sims,
    )
    from pubmed_and_method_spark.sources.datagen import clustered_embeddings_df

    emb = clustered_embeddings_df(
        spark, n_entities=8, per_entity=4, dim=16, noise=0.2, seed=3
    ).cache()
    n = emb.count()

    # exactly-one-list partition: candidate side of the sims builder
    cents = train_ivf_centroids(
        emb, nlist=4, sample_size=64, iters=4, seed=42
    )
    assert cents.shape == (4, 16)
    sims = _ivf_candidate_sims(emb, "vec_id", "embedding", cents, nprobe=4)
    # probing ALL lists with a 1-list-per-candidate partition must
    # reproduce the complete pairset exactly once (no dup, no loss)
    got = sims.groupBy("query_id").count().collect()
    assert all(r["count"] == n - 1 for r in got)
    assert len(got) == n

    # portable twin vs independent numpy re-derivation
    import hashlib

    rows = emb.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    q = {
        r.vec_id: np.floor(
            np.array(r.embedding, dtype=np.float64) * 10000
        ).astype(np.int64)
        for r in rows
    }
    cids = sorted(
        ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:3]
    def dists(i):
        return sorted(
            ((int(((q[i] - q[c]) ** 2).sum()), c) for c in cids)
        )
    assign = {i: dists(i)[0][1] for i in ids}
    probes = {i: [c for _, c in dists(i)[:2]] for i in ids}
    expect = set()
    for i in ids:
        cands = [
            j for j in ids if j != i and assign[j] in probes[i]
        ]
        scored = sorted(
            (
                (
                    -round(
                        float(q[i] @ q[j])
                        / np.sqrt(
                            float(q[i] @ q[i]) * float(q[j] @ q[j])
                        ),
                        9,
                    ),
                    j,
                )
                for j in cands
            )
        )[:5]
        for rnk, (negcos, j) in enumerate(scored, 1):
            expect.add((i, j, -negcos, rnk))
    got_p = {
        (r.query_id, r.cand_id, float(r.cos_r), r.rnk)
        for r in ivf_topk_portable(
            emb, "vec_id", "embedding", dim=16, k=5, nlist=3, nprobe=2
        ).collect()
    }
    assert got_p == expect
    emb.unpersist()


def test_profile_columns_exact_and_edges(spark):
    """Validity follows the empty-string==missing convention; distinct
    and avg_len skip nulls; one row per profiled column."""
    from pubmed_and_method_spark.operators.profiling import profile_columns

    df = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, "  "), (4, None), (5, "abc")],
        "id long, s string",
    )
    rows = {r.col_name: r for r in profile_columns(df, ["id", "s"]).collect()}
    assert rows["id"].n_valid == 5 and rows["id"].n_distinct == 5
    assert rows["s"].n_valid == 2          # '', '  ', NULL all invalid
    assert rows["s"].n_distinct == 3       # 'abc', '', '  ' (null skipped)
    # avg_len over non-null values only: (3+0+2+3)/4
    assert abs(rows["s"].avg_len - 2.0) < 1e-9


def test_profile_approx_within_rsd(spark, docs):
    """The HLL scale path must land within ~3x the configured rsd of
    the exact distinct counts on the documents corpus (HLL error is a
    distribution; 3 sigma keeps the gate honest but non-flaky)."""
    from pubmed_and_method_spark.operators.profiling import profile_columns

    cols = ["doc_id", "text"]
    exact = {
        r.col_name: r.n_distinct
        for r in profile_columns(docs, cols, approx=False).collect()
    }
    approx = {
        r.col_name: r.n_distinct
        for r in profile_columns(docs, cols, approx=True, rsd=0.05).collect()
    }
    for c in cols:
        if exact[c] == 0:
            continue
        rel = abs(approx[c] - exact[c]) / exact[c]
        assert rel <= 0.15, (c, exact[c], approx[c])


def test_pack_sequences_invariants(spark):
    """Packing tiles every document exactly (span lengths sum to the
    doc's token count), every sequence is exactly `budget` tokens
    except each shard's last, spans never exceed the budget window,
    and zero-token docs vanish."""
    from pubmed_and_method_spark.functions.normalize import clean_tokens
    from pubmed_and_method_spark.operators.packing import pack_sequences

    rows = [
        (i, " ".join(f"token{i}word{j}" for j in range(3 + (i * 7) % 40)))
        for i in range(1, 60)
    ] + [(60, "the a an"), (61, "")]  # zero-token docs
    df = spark.createDataFrame(rows, "doc_id long, text string")
    budget = 16
    spans = pack_sequences(df, "doc_id", "text", budget=budget, n_shards=3)
    rs = spans.collect()
    assert all(1 <= r.tok_len <= budget for r in rs)
    assert all(0 <= r.start_in_seq < budget for r in rs)
    assert not any(r.doc_id in (60, 61) for r in rs)

    # spans tile each doc exactly
    ntok = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", F.size(clean_tokens("text")).alias("n")
        ).collect()
    }
    per_doc = {}
    for r in rs:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.tok_len
    for d, tot in per_doc.items():
        assert tot == ntok[d], (d, tot, ntok[d])

    # every sequence full except the shard's last
    per_seq = {}
    for r in rs:
        per_seq[(r.shard, r.seq_id)] = (
            per_seq.get((r.shard, r.seq_id), 0) + r.tok_len
        )
    last = {}
    for (sh, sq) in per_seq:
        last[sh] = max(last.get(sh, -1), sq)
    for (sh, sq), tot in per_seq.items():
        if sq != last[sh]:
            assert tot == budget, (sh, sq, tot)
        else:
            assert 1 <= tot <= budget
    # sequences are contiguous from 0 per shard (no holes)
    for sh in last:
        assert {q for (s, q) in per_seq if s == sh} == set(
            range(last[sh] + 1)
        )


def test_consolidate_strategies(spark):
    """Golden-record merge: every strategy, with the determinism
    contracts pinned — mode ties break to the smallest value,
    set_union comes back sorted, of_rep takes the min-rep_col row."""
    from pubmed_and_method_spark.operators.consolidate import consolidate

    rows = [
        # cluster a: mode tie between "x" and "y" (2 each) -> "x"
        (1, 10, "x", 5), (1, 11, "y", 7), (1, 12, "x", 3), (1, 13, "y", 1),
        # cluster b: clear mode "z"
        (2, 20, "z", 2), (2, 21, "z", 4), (2, 22, "w", 6),
    ]
    df = spark.createDataFrame(
        rows, "cluster int, rid long, tag string, val int"
    )
    out = {
        r.cluster: r
        for r in consolidate(
            df,
            "cluster",
            {
                "rep_rid": ("min", "rid"),
                "total": ("sum", "val"),
                "top": ("max", "val"),
                "rep_val": ("of_rep", "val"),
                "tags": ("set_union", "tag"),
                "tag_mode": ("mode", "tag"),
            },
            rep_col="rid",
        ).collect()
    }
    a, b = out[1], out[2]
    assert (a.n_members, a.rep_rid, a.total, a.top) == (4, 10, 16, 7)
    assert a.rep_val == 5  # value on row rid=10
    assert a.tags == ["x", "y"]
    assert a.tag_mode == "x"  # 2-2 tie -> smallest value
    assert (b.n_members, b.rep_rid, b.tag_mode, b.rep_val) == (3, 20, "z", 2)


def test_consolidate_validation(spark):
    from pubmed_and_method_spark.operators.consolidate import consolidate

    df = spark.createDataFrame([(1, 2)], "cluster int, v int")
    with pytest.raises(ValueError, match="unknown strategies"):
        consolidate(df, "cluster", {"o": ("median", "v")})
    with pytest.raises(ValueError, match="requires rep_col"):
        consolidate(df, "cluster", {"o": ("of_rep", "v")})


def test_decontaminate_planted(spark):
    """A corpus doc that copies an 8-token benchmark run is flagged;
    untouched docs are not; the short-doc whole-gram fallback matches
    verbatim short answers."""
    from pubmed_and_method_spark.operators.decontam import decontaminate

    passage = "alpha beta gamma delta epsilon zeta eta theta"
    bench = spark.createDataFrame(
        [(100, passage + " iota kappa"), (101, "tiny answer")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix words here " + passage + " suffix words"),
            (2, "entirely unrelated content about distributed joins "
                "and shuffle partitions running along nicely today"),
            (3, "tiny answer"),  # short doc == short benchmark doc
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in decontaminate(
            corpus, bench, "doc_id", "text", n=8
        ).collect()
    }
    assert 1 in out and out[1].n_hit_grams >= 1
    assert 3 in out and out[3].hit_frac == 1.0
    assert 2 not in out


def test_repetition_stats_values(spark):
    """Hand-computed metrics: 'a a a a' -> ratio .25, dup 2/3, top 1;
    a single-token doc -> zero gram fractions."""
    from pubmed_and_method_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "one"), (3, "x y x y x")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert out[1].n_toks == 4
    assert out[1].distinct_token_ratio == 0.25
    assert out[1].dup_ngram_frac == round(2 / 3, 6)
    assert out[1].top_ngram_frac == 1.0
    assert out[2].dup_ngram_frac == 0.0 and out[2].top_ngram_frac == 0.0
    # grams of 3: 'x y','y x','x y','y x' -> ng=4, ndg=2, top=2
    assert out[3].dup_ngram_frac == 0.5
    assert out[3].top_ngram_frac == 0.5


def test_sample_mixture_budget(spark):
    """Greedy per-source token budgets: a doc is taken iff the budget
    is not yet full when it starts (at most one-doc overshoot);
    unlisted sources drop; same seed -> same mixture."""
    from pubmed_and_method_spark.operators.sampling import sample_mixture

    df = spark.createDataFrame(
        [(i, "a", 10) for i in range(5)]
        + [(i + 10, "b", 7) for i in range(5)]
        + [(99, "zzz", 3)],
        ["id", "src", "nt"],
    )
    out = sample_mixture(df, "id", "nt", "src", {"a": 25, "b": 1}, seed=1)
    rows = out.collect()
    a = [r for r in rows if r.source == "a"]
    b = [r for r in rows if r.source == "b"]
    assert sum(r.n_toks for r in a) == 30  # 3 docs x 10: budget 25 + overshoot
    assert len(b) == 1
    assert not [r for r in rows if r.source == "zzz"]
    again = sample_mixture(
        df, "id", "nt", "src", {"a": 25, "b": 1}, seed=1
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_pii_stats_planted(spark):
    from pubmed_and_method_spark.operators.pii import pii_stats, redact

    rows = [
        (1, "mail me at jane.doe+spam@sub.example.co.uk today"),
        (2, "cards 4111-1111-1111-1111 and 5500-0000-0000-0004"),
        (3, "ssn 123-45-6789 phone 415-555-0199 ip 10.0.255.3"),
        (4, "no pii here, just 12345 and a-b-c and v1.2 notes"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in pii_stats(df).collect()}

    assert (out[1].n_email, out[1].n_pii) == (1, 1)
    assert "<EMAIL>" in out[1].redacted
    assert "jane.doe" not in out[1].redacted
    assert (out[2].n_ccard, out[2].n_pii) == (2, 2)
    assert out[2].redacted.count("<CCARD>") == 2
    assert (out[3].n_ssn, out[3].n_phone, out[3].n_ipv4) == (1, 1, 1)
    assert out[3].n_pii == 3
    # class shapes are mutually exclusive: the SSN/phone digits must
    # not double-count as each other
    assert (out[3].n_ccard, out[3].n_email) == (0, 0)
    assert out[4].n_pii == 0 and out[4].redacted == rows[3][1]
    assert out[5].n_pii == 0 and out[5].redacted == ""

    # idempotence: redacting already-redacted text changes nothing
    once = pii_stats(df).select("doc_id", F.col("redacted").alias("text"))
    twice = {r.doc_id: r.redacted for r in
             once.select("doc_id", redact("text").alias("redacted")).collect()}
    assert twice == {d: r.redacted for d, r in out.items()}


def test_semantic_dedup_planted(spark):
    from pubmed_and_method_spark.operators.similarity import (
        semantic_dedup_portable,
    )

    rng = np.random.RandomState(7)
    base = rng.randn(6, 16).astype("float64")
    base /= np.abs(base).max(axis=1, keepdims=True) * 2  # keep |x| <= 0.5
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # 100 + i: near-identical copy of vector i (cos ~ 1) -> must drop
    rows.append((100, [float(x * 0.999) for x in base[0]]))
    rows.append((105, [float(x * 1.001) for x in base[5]]))
    # 200: negation of vector 1 (cos = -1) -> same cluster or not,
    # never a duplicate
    rows.append((200, [float(-x) for x in base[1]]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    out = {r.vec_id: r for r in semantic_dedup_portable(
        df, "vec_id", "embedding", dim=16, nlist=3, quant=1000
    ).collect()}

    assert len(out) == 9
    assert out[100].is_kept == 0 and out[100].dup_of == 0
    assert out[105].is_kept == 0 and out[105].dup_of == 5
    assert out[200].is_kept == 1 and out[200].dup_of == -1
    for i in range(6):
        assert out[i].is_kept == 1, i
    # dup pairs land in the same cluster (near-identical vectors
    # cannot straddle an integer-L2 assignment boundary)
    assert out[100].cid == out[0].cid
    assert out[105].cid == out[5].cid


def test_mutual_top1_hub_kill(spark):
    """Reciprocal-top-1 on a hand-built sims table: the isolated pair
    (a,b) is mutual; hub h is everyone's best neighbor but reciprocates
    only one — exactly one hub edge survives, every other hub in-edge
    dies without any threshold."""
    from pubmed_and_method_spark.operators.similarity import mutual_top1

    sims = [
        # a and b point at each other hardest
        ("a", "b", 0.9), ("b", "a", 0.9),
        ("a", "h", 0.5), ("b", "h", 0.5),
        # x, y, z all point at the hub h
        ("x", "h", 0.8), ("y", "h", 0.7), ("z", "h", 0.6),
        ("x", "y", 0.2), ("y", "x", 0.2), ("z", "x", 0.1),
        # h's own best is x (reciprocated), then y (not)
        ("h", "x", 0.8), ("h", "y", 0.3),
    ]
    df = spark.createDataFrame(sims, "query_id string, cand_id string, cos double")
    got = {
        (r.query_id1, r.cand_id2) for r in mutual_top1(df).collect()
    }
    assert got == {("a", "b"), ("h", "x")}

    # deterministic tie-break: equal scores fall to the smaller cand id
    ties = [
        ("p", "q", 0.5), ("p", "r", 0.5),
        ("q", "p", 0.5), ("r", "p", 0.5),
    ]
    df2 = spark.createDataFrame(ties, "query_id string, cand_id string, cos double")
    assert {
        (r.query_id1, r.cand_id2) for r in mutual_top1(df2).collect()
    } == {("p", "q")}


def test_prefix_filter_jaccard_completeness(spark):
    """Prefix filtering is EXACT: on seeded random token sets the
    result equals the brute-force all-pairs Jaccard >= 3/5 set (the
    guarantee LSH lacks), counts are exact integers, and the n=1 /
    identical-set / threshold=1 edges behave."""
    import random
    from itertools import combinations

    from pubmed_and_method_spark.operators.set_join import (
        prefix_filter_jaccard_join,
    )

    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(30)]
    docs = []
    for i in range(60):
        k = rng.randint(1, 8)
        docs.append((i, sorted(rng.sample(vocab, k))))
    # plant near-identical and identical sets
    docs.append((100, docs[0][1]))
    docs.append((101, docs[1][1] + ["t29"]))

    df = spark.createDataFrame(docs, "doc_id long, toks array<string>")
    got = {
        (r.doc_id1, r.doc_id2): (r.n_inter, r.n_union)
        for r in prefix_filter_jaccard_join(df).collect()
    }

    sets = {i: set(ts) for i, ts in docs}
    want = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        uni = len(sets[a] | sets[b])
        if 5 * inter >= 3 * uni:
            want[(a, b)] = (inter, uni)
    assert got == want
    assert (0, 100) in got  # identical planted pair survives

    # threshold 1/1: prefix shrinks to the single rarest token and
    # only identical sets remain
    strict = {
        (r.doc_id1, r.doc_id2)
        for r in prefix_filter_jaccard_join(df, num=1, den=1).collect()
    }
    assert strict == {
        (a, b)
        for a, b in combinations(sorted(sets), 2)
        if sets[a] == sets[b]
    }

    import pytest

    with pytest.raises(ValueError, match="threshold"):
        prefix_filter_jaccard_join(df, num=6, den=5)


def test_prefix_filter_guard(spark):
    """r05 guards for the PPJoin degenerate-vocabulary blowup (r04
    verdict weak #2): (1) on a natural Zipfian-ish vocabulary the
    max_posting cap never binds — the guarded result equals both the
    unguarded operator and the brute-force Jaccard set (recall stays
    the provable 100%); (2) on a degenerate vocabulary the
    candidate_budget pre-flight aborts with a diagnostic instead of
    launching an ~all-pairs join; (3) a capped degenerate run is
    bounded and every emitted pair still passes the exact verify."""
    import random
    from itertools import combinations

    import pytest

    from pubmed_and_method_spark.operators.set_join import (
        prefix_filter_jaccard_join,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(400)]
    docs = []
    for i in range(80):
        docs.append((i, sorted(rng.sample(vocab, rng.randint(6, 10)))))
    docs.append((200, docs[0][1]))             # identical planted pair
    docs.append((201, docs[1][1] + ["w399"]))  # near planted pair
    df = spark.createDataFrame(docs, "doc_id long, toks array<string>")

    def res(d, **kw):
        return {
            (r.doc_id1, r.doc_id2): (r.n_inter, r.n_union)
            for r in prefix_filter_jaccard_join(d, **kw).collect()
        }

    exact = res(df)
    guarded = res(df, max_posting=16, candidate_budget=10_000)
    assert guarded == exact  # cap did not bind on the natural vocab

    sets = {i: set(ts) for i, ts in docs}
    want = {}
    for a, b in combinations(sorted(sets), 2):
        inter, uni = len(sets[a] & sets[b]), len(sets[a] | sets[b])
        if 5 * inter >= 3 * uni:
            want[(a, b)] = (inter, uni)
    assert guarded == want  # 100% recall vs brute force
    assert (0, 200) in guarded

    # degenerate vocabulary: 300 docs over 4 tokens -> dense prefixes
    deg = [
        (i, sorted(rng.sample(["a", "b", "c", "d"], 3)))
        for i in range(300)
    ]
    dfd = spark.createDataFrame(deg, "doc_id long, toks array<string>")
    with pytest.raises(ValueError, match="degenerate vocabulary"):
        prefix_filter_jaccard_join(dfd, candidate_budget=1000)

    # capped degenerate run: bounded candidates, exact-verified output
    capped = prefix_filter_jaccard_join(dfd, max_posting=8).collect()
    degsets = {i: set(ts) for i, ts in deg}
    for r in capped:
        inter = len(degsets[r.doc_id1] & degsets[r.doc_id2])
        uni = len(degsets[r.doc_id1] | degsets[r.doc_id2])
        assert (r.n_inter, r.n_union) == (inter, uni)
        assert 5 * inter >= 3 * uni


def test_dedup_retention_quality_survivor(spark):
    """Exactly one survivor per cluster, highest score wins, ties to
    the smallest id, every evictee tagged with its survivor."""
    from pubmed_and_method_spark.operators.dedup import dedup_retention

    rows = [
        # cluster 1: 20 beats 10 on score
        (10, 1, 5), (20, 1, 9),
        # cluster 2: score tie -> smaller id 30 kept
        (30, 2, 7), (40, 2, 7),
        # singleton cluster
        (50, 3, 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, cluster long, score long")
    got = {r.doc_id: r for r in dedup_retention(
        df, cluster_col="cluster", id_col="doc_id", score_col="score"
    ).collect()}
    assert len(got) == 5
    assert [got[i].kept for i in (10, 20, 30, 40, 50)] == [0, 1, 1, 0, 1]
    assert got[10].kept_doc == 20
    assert got[40].kept_doc == 30
    assert got[50].kept_doc == 50
    # per-cluster invariant: exactly one kept row
    from collections import Counter

    per = Counter(r.cluster for r in got.values() if r.kept == 1)
    assert all(v == 1 for v in per.values()) and len(per) == 3


def test_block_skew_profile_hand_computed(spark):
    """Sizes [1,1,2,3,8,33] -> buckets 0/1/3/5 with hand-computed
    pair mass, shares, cumulative tail shares, and salt factors."""
    from pubmed_and_method_spark.operators.profiling import (
        block_skew_profile,
    )

    rows = []
    for key, n in [("a", 1), ("b", 1), ("c", 2), ("d", 3), ("e", 8), ("f", 33)]:
        rows += [(key,)] * n
    df = spark.createDataFrame(rows, ["bk"])
    out = {
        r.size_bucket: r
        for r in block_skew_profile(df, "bk", salt_target=32).collect()
    }
    assert set(out) == {0, 1, 3, 5}
    tot = 0 + 1 + 3 + 28 + 528
    assert out[0].n_blocks == 2 and out[0].n_pairs == 0
    assert out[1].n_blocks == 2 and out[1].n_pairs == 4
    assert out[3].n_pairs == 28 and out[3].max_block_size == 8
    assert out[5].n_pairs == 528 and out[5].rec_salt == 2
    assert out[5].pair_share == round(528 / tot, 6)
    assert out[5].cum_pair_share == round(528 / tot, 6)
    assert out[3].cum_pair_share == round((528 + 28) / tot, 6)
    assert out[0].cum_pair_share == 1.0
    assert out[1].rec_salt == 1 and out[0].rec_salt == 1


def test_leakage_free_split_group_atomic(spark):
    """Groups never straddle; the naive audit flags exactly the
    multi-member groups whose members' own md5 sides disagree
    (expected sides re-derived with hashlib)."""
    import hashlib

    from pubmed_and_method_spark.plans.curate import leakage_free_split

    rows = []
    for gid in range(40):
        size = 1 + (gid % 3)
        for m in range(size):
            rows.append((gid * 100 + m, f"g{gid}"))
    df = spark.createDataFrame(rows, ["doc_id", "fingerprint"])
    out = {
        r.group_key: r
        for r in leakage_free_split(df, "doc_id", "fingerprint").collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()[:2]
    for gid in range(40):
        g = out[f"g{gid}"]
        want_split = "train" if md5(f"g{gid}") < "b4" else "eval"
        assert g.split == want_split
        members = [gid * 100 + m for m in range(1 + (gid % 3))]
        sides = {md5(str(i)) < "b4" for i in members}
        assert g.naive_straddled == int(len(sides) == 2)
        assert g.n_docs == len(members)
    # the fixture must actually exercise both outcomes
    assert any(r.naive_straddled == 1 for r in out.values())
    assert any(
        r.naive_straddled == 0 and r.n_docs > 1 for r in out.values()
    )


def test_random_cross_pairs_disjoint_deterministic(spark):
    """Each record in at most one pair; pairing re-derived exactly
    with hashlib; per-bucket odd leftover dropped."""
    import hashlib
    from collections import defaultdict

    from pubmed_and_method_spark.operators.sampling import (
        random_cross_pairs,
    )

    ids = [f"c{i:03d}" for i in range(137)]
    df = spark.createDataFrame([(i,) for i in ids], ["cid"])
    got = sorted(
        (r.id1, r.id2) for r in random_cross_pairs(df, "cid").collect()
    )
    used = [x for p in got for x in p]
    assert len(used) == len(set(used))

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    buckets = defaultdict(list)
    for i in ids:
        buckets[md5(i)[0]].append(i)
    want = []
    for b, members in buckets.items():
        members.sort(key=lambda i: (md5(i), i))
        for k in range(0, len(members) - 1, 2):
            want.append((members[k], members[k + 1]))
    assert got == sorted(want)
    assert len(got) == sum(len(m) // 2 for m in buckets.values())


def test_compression_ratio_matches_zlib_and_separates(spark):
    """UDF output == direct zlib byte math; a repetitive text scores
    far below a high-entropy one; empty/null -> null."""
    import zlib

    from pubmed_and_method_spark.operators.text import compression_ratio

    rep = "spark shuffle " * 200
    import base64
    import hashlib

    rand = "".join(
        base64.b64encode(hashlib.sha256(str(i).encode()).digest()).decode()
        for i in range(80)
    )
    rows = [(1, rep), (2, rand), (3, ""), (4, None), (5, "tiny")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r.zlib_ratio
        for r in df.select(
            "doc_id", compression_ratio("text").alias("zlib_ratio")
        ).collect()
    }
    for i, t in rows:
        if not t:
            assert out[i] is None, i
        else:
            raw = t.encode()
            assert out[i] == round(len(zlib.compress(raw, 6)) / len(raw), 6)
    assert out[1] < 0.1 < 0.5 < out[2]


def test_temporal_decay_score_math_and_monotonicity(spark):
    """decay == 2^(-gap/h) round-6; gap 0 keeps llr intact; evidence
    shrinks toward 0 monotonically with gap; python re-derivation."""
    from pubmed_and_method_spark.operators.temporal import (
        temporal_decay_score,
    )

    weights = {"f1": (2.0, -1.5), "f2": (1.25, -0.75)}
    rows = [
        ("a", 1, 1, 0.0),
        ("b", 1, 1, 30.0),
        ("c", 1, 1, 365.0),
        ("d", 0, 0, 30.0),
    ]
    df = spark.createDataFrame(rows, ["pid", "f1", "f2", "gap"])
    out = {
        r.pid: r
        for r in temporal_decay_score(
            df, weights, "gap", half_life_days=30.0
        ).collect()
    }
    for pid, f1, f2, gap in rows:
        d = round(2.0 ** (-gap / 30.0), 6)
        w1 = 2.0 if f1 else -1.5
        w2 = 1.25 if f2 else -0.75
        assert out[pid].decay == d
        assert out[pid].llr == round(w1 + w2, 6)
        assert out[pid].llr_decayed == round(
            round(w1 * d, 6) + round(w2 * d, 6), 6
        )
    assert out["a"].llr_decayed == out["a"].llr  # gap 0: undecayed
    assert abs(out["c"].llr_decayed) < abs(out["b"].llr_decayed) < abs(
        out["b"].llr
    )
    assert abs(out["d"].llr_decayed) < abs(out["d"].llr)  # disagreement too


def test_interval_overlap_join_equals_brute_force(spark):
    """Bucketed candidates + exact verify == brute-force theta-join
    on random intervals, across bucket widths smaller/near/larger
    than the intervals, including negative coordinates."""
    import itertools
    import random

    from pubmed_and_method_spark.operators.temporal import (
        interval_overlap_join,
    )

    rng = random.Random(23)
    rows = []
    for i in range(120):
        s = rng.randint(-5000, 5000)
        rows.append((f"i{i:03d}", "g" + str(i % 3), s, s + rng.randint(0, 800)))
    df = spark.createDataFrame(rows, ["iid", "grp", "s", "e"])
    want = sorted(
        (a[0], b[0], a[1], min(a[3], b[3]) - max(a[2], b[2]))
        for a, b in itertools.combinations(sorted(rows), 2)
        if a[1] == b[1]
        and a[2] <= b[3]
        and b[2] <= a[3]
        and min(a[3], b[3]) - max(a[2], b[2]) > 0
    )
    for w in (50, 500, 5000):
        got = sorted(
            tuple(r)
            for r in interval_overlap_join(
                df, "iid", "s", "e", w, partition_cols=["grp"]
            ).collect()
        )
        assert got == want, f"width {w}"
