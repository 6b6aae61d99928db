"""Training-data pipeline operators: dedup / similarity / textstats /
multimodal plumbing — verified against brute-force references."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions import (
    cosine_topk,
    doc_fingerprint,
    embedding_near_dups,
    exact_dedup,
    language_id,
    lsh_ann_topk,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    quality_score,
    simhash_near_dups,
    token_counts,
)
from lucene_solr_spark.functions.multimodal import (
    decode_image,
    extract_image_features,
    sample_video_frames,
    synthesize_media,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "alpha beta gamma delta epsilon"),          # exact dup of 0
        (2, "alpha beta gamma delta zeta"),              # near dup of 0
        (3, "totally different content here now"),
        (4, "alpha beta gamma delta epsilon"),          # exact dup of 0
        (5, "unrelated words nothing shared at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def brute_jaccard(a: str, b: str, n: int) -> float:
    def sh(t):
        w = t.split()
        return set(" ".join(w[i : i + n]) for i in range(len(w) - n + 1))

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(dup_docs):
    groups = exact_dedup(dup_docs).collect()
    by_rep = {g["rep_id"]: g for g in groups}
    assert by_rep[0]["dup_count"] == 3 and by_rep[0]["members"] == [0, 1, 4]
    assert by_rep[2]["dup_count"] == 1


def test_ngram_jaccard_pairs_match_brute_force(dup_docs):
    got = {
        (r["ida"], r["idb"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dup_docs, n=2, threshold=0.3).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in dup_docs.collect()}
    for i in texts:
        for j in texts:
            if i < j:
                bj = brute_jaccard(texts[i], texts[j], 2)
                if bj >= 0.3:
                    assert (i, j) in got and abs(got[(i, j)] - bj) < 1e-9
                else:
                    assert (i, j) not in got


def test_minhash_lsh_finds_exact_dups(dup_docs):
    pairs = {
        (r["ida"], r["idb"]) for r in minhash_lsh_pairs(dup_docs, threshold=0.5).collect()
    }
    # identical docs always collide in every band
    assert (0, 1) in pairs and (0, 4) in pairs and (1, 4) in pairs
    # verification step kills low-jaccard candidates
    assert all(p[0] != 3 and p[1] != 3 for p in pairs if 5 in p or 3 in p)


def test_simhash_near_dups(dup_docs):
    pairs = {
        (r["ida"], r["idb"]): r["hamming"]
        for r in simhash_near_dups(dup_docs, max_hamming=16).collect()
    }
    assert pairs[(0, 1)] == 0 and pairs[(0, 4)] == 0
    assert (0, 2) in pairs  # near dup within 16 bits
    assert (0, 3) not in pairs and (0, 5) not in pairs


# ------------------------------------------------------------- similarity
@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_cosine_topk_matches_numpy(emb):
    pdf = emb.toPandas()
    q = list(pdf[pdf.vec_id == 0].iloc[0]["embedding"])
    got = [(r["vec_id"], r["cosine"]) for r in cosine_topk(emb, q, 5).collect()]
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    qv = np.asarray(q, dtype=np.float64)
    cos = M @ qv / (np.linalg.norm(M, axis=1) * np.linalg.norm(qv))
    order = sorted(zip(pdf["vec_id"], cos), key=lambda t: (-t[1], t[0]))[:5]
    assert [g[0] for g in got] == [int(o[0]) for o in order]
    for g, o in zip(got, order):
        # Spark multiplies float32 elements before the double fold →
        # ~1e-8 drift vs full-double numpy
        assert abs(g[1] - o[1]) < 1e-6
    assert got[0][0] == 0  # self-match first


def test_lsh_ann_recall(emb):
    pdf = emb.toPandas()
    q = list(pdf[pdf.vec_id == 3].iloc[0]["embedding"])
    exact = [r["vec_id"] for r in cosine_topk(emb, q, 10).collect()]
    approx = [r["vec_id"] for r in lsh_ann_topk(emb, q, 10, num_planes=6, probe_hamming=2).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert approx[0] == 3  # self-match always in its own bucket
    assert recall >= 0.5  # multiprobe LSH recall floor on 500 vecs


def test_ivf_ann_recall_and_determinism(emb):
    from lucene_solr_spark.functions.similarity import ivf_ann_topk

    pdf = emb.toPandas()
    q = list(pdf[pdf.vec_id == 3].iloc[0]["embedding"])
    exact = [r["vec_id"] for r in cosine_topk(emb, q, 10).collect()]
    approx = [
        r["vec_id"]
        for r in ivf_ann_topk(emb, q, 10, num_centroids=8, nprobe=3).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert approx[0] == 3  # the query's own cell is always probed first
    assert recall >= 0.5
    # deterministic rebuild: hash-seeded init + fixed Lloyd iterations
    again = [
        r["vec_id"]
        for r in ivf_ann_topk(emb, q, 10, num_centroids=8, nprobe=3).collect()
    ]
    assert approx == again


def test_ivf_probe_prunes_candidates(emb):
    from pyspark.sql import functions as F

    from lucene_solr_spark.functions.similarity import ivf_index

    assigned, _C = ivf_index(emb, num_centroids=8)
    counts = {
        r["_cid"]: r["n"]
        for r in assigned.groupBy("_cid").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == emb.count()
    assert len(counts) >= 2  # quantizer actually partitions the space


def test_embedding_near_dups_self_consistency(spark):
    rows = [(i, [float(i), 1.0, 0.0]) for i in range(3)]
    rows.append((10, [3.0, 3.0, 0.0]))  # parallel to vec 1 → cosine 1.0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["ida"], r["idb"]) for r in embedding_near_dups(df, 0.999, num_planes=4).collect()}
    assert (1, 10) in pairs


def test_cosine_all_pairs_exact_matches_numpy(emb):
    from lucene_solr_spark.functions.similarity import cosine_all_pairs_exact

    pdf = emb.toPandas()
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    ids = pdf["vec_id"].to_numpy()
    want = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if S[i, j] >= 0.4
    }
    for blocks in (1, 4, 7):  # block count must not change the answer
        got = {
            (r["ida"], r["idb"])
            for r in cosine_all_pairs_exact(emb, 0.4, num_blocks=blocks).collect()
        }
        assert got == want, f"num_blocks={blocks}"


def test_cosine_all_pairs_exact_beats_lsh_recall(emb):
    """The exact path has recall 1.0 where the LSH-bucketed path is lossy."""
    from lucene_solr_spark.functions.similarity import cosine_all_pairs_exact

    exact = {
        (r["ida"], r["idb"])
        for r in cosine_all_pairs_exact(emb, 0.4, num_blocks=4).collect()
    }
    lsh = {
        (r["ida"], r["idb"])
        for r in embedding_near_dups(emb, 0.4, num_planes=4).collect()
    }
    assert lsh <= exact  # LSH output is a subset (exact verify step)
    assert len(exact) >= len(lsh)


@pytest.mark.parametrize("sf_dir", [SF, "/root/testdata/sf0.01"])
def test_cosine_fixture_boundary_margins(sf_dir):
    """The embedding_pairs_exact gate compares ROUND(cosine, 4) across two
    engines whose dot/norm evaluation order differs by ~1e-15; the gate is
    only deterministic if no pair's true cosine sits within that deviation
    of the τ=0.4 threshold or a .00005 rounding boundary.  Pin both
    margins ≥ 1e-9 (7 orders above the cross-engine deviation) on the
    fixtures the driver and the suite actually compare on."""
    import duckdb

    con = duckdb.connect()
    pdf = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchdf()
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    assert (norms > 0).all()  # zero-norm rows are excluded by the kernel
    Mn = M / norms
    S = Mn @ Mn.T
    vals = S[np.triu_indices(len(Mn), k=1)]
    assert np.abs(vals - 0.4).min() > 1e-9
    kept = vals[vals >= 0.4]
    dist = np.abs((kept * 10000) % 1 - 0.5) / 10000
    assert dist.min() > 1e-9


# ------------------------------------------------------------- textstats
def test_token_counts(spark):
    df = spark.createDataFrame([(1, "Hello, world 42!")], "doc_id long, text string")
    r = token_counts(df).collect()[0]
    assert r["ws_tokens"] == 3
    # bpe: hello , world 42 ! → 5
    assert r["bpe_tokens"] == 5


def test_quality_score_bounds(docs_df):
    rows = quality_score(docs_df, "text").select("quality").collect()
    vals = [r["quality"] for r in rows]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_language_id_cjk(spark):
    df = spark.createDataFrame(
        [(1, "中文 文本 多一些"), (2, "the quick fox and the dog is a")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert got[1] == "zh" and got[2] == "en"


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta alpha"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprint(df).collect()}
    assert got[1] == got[3] != got[2]
    assert all(v >= 0 for v in got.values())


# ------------------------------------------------------------- multimodal
def test_bmp_roundtrip():
    import numpy as np

    from lucene_solr_spark.functions.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (3, 2), (64, 33), (5, 7)]:  # odd widths hit padding
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all()


def test_wav_roundtrip():
    import numpy as np

    from lucene_solr_spark.functions.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(7)
    mono = rng.integers(-32768, 32767, 1000, dtype=np.int16)
    s, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and (s[:, 0] == mono).all()
    stereo = rng.integers(-32768, 32767, (500, 2), dtype=np.int16)
    s2, _ = decode_wav(encode_wav(stereo, 44100))
    assert (s2 == stereo).all()


def test_multimodal_plumbing(spark):
    media = synthesize_media(spark, 40, kind="image")
    feats = extract_image_features(media, feature_dim=16)
    rows = feats.collect()
    assert len(rows) == 40
    assert all(len(r["features"]) == 16 for r in rows)
    # deterministic: same payload → same features
    again = {r["media_id"]: r["features"] for r in extract_image_features(media, 16).collect()}
    first = {r["media_id"]: r["features"] for r in rows}
    assert first == again
    # features derive from REAL decoded pixels: decode one payload on
    # the driver and recompute the channel means
    import numpy as np

    from lucene_solr_spark.functions.multimodal import decode_bmp

    one = media.filter("media_id = 3").collect()[0]
    img = decode_bmp(bytes(one["payload"]))
    assert img.shape == (one["meta"]["height"], one["meta"]["width"], 3)
    expect = img.reshape(-1, 3).mean(axis=0).astype(np.float32)
    got = np.asarray(first[3][:3], dtype=np.float32)
    assert np.allclose(got, expect)


def test_audio_features(spark):
    media = synthesize_media(spark, 10, kind="audio")
    from lucene_solr_spark.functions.multimodal import extract_audio_features

    rows = extract_audio_features(media).collect()
    assert len(rows) == 10
    assert all(len(r["features"]) == 6 for r in rows)
    assert all(r["features"][0] > 0.1 for r in rows)  # sine has energy


def test_unsupported_formats_raise():
    # JPEG/PNG now decode for real (functions/jpeg.py, functions/png.py);
    # formats without an in-container codec still fail loudly
    with pytest.raises(NotImplementedError):
        decode_image(b"GIF89a\x01\x00\x01\x00")


def test_video_frame_sampling(spark):
    media = synthesize_media(spark, 5, kind="video")
    frames = sample_video_frames(media, every_ms=500)
    pdf = frames.toPandas()
    assert (pdf.groupby("media_id").size() >= 3).all()
    assert (pdf["frame_ts"] % 500 == 0).all()


def test_lexicon_hits_equals_filter_semantics(spark):
    """The regexp_count rewrite of stopword counting must equal the
    original split+filter token-equality semantics exactly (the gate
    oracles encode the latter)."""
    import random

    from pyspark.sql import functions as F

    from lucene_solr_spark.functions.textstats import (
        LANG_LEXICONS,
        _lexicon_hits,
    )

    rng = random.Random(7)
    vocab = (
        [w for lex in LANG_LEXICONS.values() for w in lex]
        + ["spark", "x", "thee", "a.", "the,", "und!", "", " ", "\tthe", "a\r"]
    )
    texts = []
    for _ in range(300):
        n = rng.randint(0, 12)
        sep = lambda: " " * rng.randint(1, 3)  # noqa: E731
        texts.append(sep().join(rng.choice(vocab) for _ in range(n)))
    texts += ["", " ", "the", " the ", "the the", "a  a   a", "la\nde"]
    d = spark.createDataFrame([(t,) for t in texts], ["text"])
    norm = F.lower(F.trim(F.col("text")))
    words = F.split(norm, " +")
    def _old(lex):
        # closure factory: a 2-arg lambda would receive (element, index)
        return F.size(F.filter(words, lambda w: w.isin(lex)))

    cols = {}
    for lang, lex in LANG_LEXICONS.items():
        cols[f"new_{lang}"] = _lexicon_hits(norm, lex)
        cols[f"old_{lang}"] = _old(lex)
    rows = d.select([v.alias(k) for k, v in cols.items()]).collect()
    for r in rows:
        for lang in LANG_LEXICONS:
            assert r[f"new_{lang}"] == r[f"old_{lang}"], (lang, dict(r.asDict()))


def test_sq_quantization_roundtrip_and_recall(emb):
    from lucene_solr_spark.functions.similarity import (
        cosine_topk,
        sq_index,
        sq_topk,
    )

    idx = sq_index(emb)
    codes = idx[0].toPandas()
    flat = np.concatenate([np.asarray(c) for c in codes["_sq"]])
    assert flat.min() >= 0 and flat.max() <= 255  # int8-range codes
    assert flat.max() == 255 and flat.min() == 0  # bounds are attained

    pdf = emb.toPandas()
    q = list(pdf[pdf.vec_id == 0].iloc[0]["embedding"])
    exact = [r["vec_id"] for r in cosine_topk(emb, q, 10).collect()]
    approx = [r["vec_id"] for r in sq_topk(idx, q, 10).collect()]
    assert approx[0] == 0  # self-match survives quantization
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8  # 8-bit/dim keeps cosine nearly intact


def test_sq_matches_numpy_dequant(emb):
    """Codes and dequantized cosines agree with a from-scratch numpy
    quantizer using the same HALF_UP rule."""
    from lucene_solr_spark.functions.similarity import sq_index, sq_topk

    idx, mins, maxs = sq_index(emb)
    pdf = emb.toPandas().sort_values("vec_id")
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mn = np.asarray(mins)
    mx = np.asarray(maxs)
    r = mx - mn
    codes = np.floor((M - mn) * 255.0 / np.where(r == 0, 1, r) + 0.5)
    codes = np.where(r == 0, 0, codes)
    got = (
        idx.orderBy("vec_id").toPandas()["_sq"]
        .apply(lambda c: np.asarray(c, dtype=np.int64))
    )
    assert all((g == c).all() for g, c in zip(got, codes.astype(np.int64)))

    q = list(pdf[pdf.vec_id == 3].iloc[0]["embedding"])
    qc = np.where(r == 0, 0, np.floor((np.asarray(q) - mn) * 255.0 / np.where(r == 0, 1, r) + 0.5))
    qh = mn + qc * (r / 255.0)
    Mh = mn + codes * (r / 255.0)
    cos = Mh @ qh / (np.linalg.norm(Mh, axis=1) * np.linalg.norm(qh))
    want = sorted(zip(pdf["vec_id"], cos), key=lambda t: (-t[1], t[0]))[:5]
    got5 = [(r2["vec_id"], r2["cosine"]) for r2 in sq_topk((idx, mins, maxs), q, 5).collect()]
    assert [g[0] for g in got5] == [int(w[0]) for w in want]
    for g, w in zip(got5, want):
        assert abs(g[1] - w[1]) < 1e-9


@pytest.mark.parametrize("sf_dir", [SF, "/root/testdata/sf0.01"])
def test_sq_fixture_boundary_margins(sf_dir):
    """The sq_ann_topk gate hashes ROUND(cosine, 4); pin every
    quantized-corpus cosine vs the query (vec_id 0) ≥ 1e-9 away from a
    .00005 boundary, and pin the top-10 rank gap so ~1e-15 cross-engine
    sum-order drift cannot flip ranks on the driver fixture."""
    import duckdb

    con = duckdb.connect()
    pdf = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchdf()
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mn, mx = M.min(axis=0), M.max(axis=0)
    r = np.where(mx - mn == 0, 1, mx - mn)
    codes = np.floor((M - mn) * 255.0 / r + 0.5)
    Mh = mn + codes * ((mx - mn) / 255.0)
    qh = Mh[pdf["vec_id"].to_numpy().tolist().index(0)]
    cos = Mh @ qh / (np.linalg.norm(Mh, axis=1) * np.linalg.norm(qh))
    dist = np.abs((cos * 10000) % 1 - 0.5) / 10000
    assert dist.min() > 1e-9
    # quantization boundary margin: no (x-mn)*255/r lands within 1e-9
    # of an exact .5 (where HALF_UP engines could disagree at 1-ulp)
    v = (M - mn) * 255.0 / r
    assert np.abs((v % 1) - 0.5).min() > 1e-9


def test_semantic_dedup_drops_planted_copies(spark):
    """SemDeDup: near-identical vectors (cos >= tau) collapse to the
    min-id survivor; distant vectors and zero-norm vectors are kept."""
    import numpy as np

    from lucene_solr_spark.functions.similarity import semantic_dedup

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16)).astype("float32")
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # planted near-copies of vectors 0..4 (tiny scale+offset, cos ~ 1)
    rows += [
        (100 + i, [float(x * 1.02 + 0.01) for x in base[i]]) for i in range(5)
    ]
    rows.append((999, [0.0] * 16))  # zero-norm: kept unconditionally
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(
            df, threshold=0.98, num_clusters=4, kmeans_iters=2
        ).collect()
    }
    assert len(out) == 46
    assert all(out[i] for i in range(40))        # originals survive
    assert all(not out[100 + i] for i in range(5))  # copies dropped
    assert out[999]                               # zero-norm kept


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Near-dup components always share a split; singletons match the
    plain hash_split assignment."""
    from lucene_solr_spark.functions.pii import hash_split, leakage_safe_split

    df = spark.createDataFrame([(i,) for i in range(30)], ["doc_id"])
    # components: {0,1,2} (chain), {10,11}; everything else singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], ["ida", "idb"]
    )
    out = {
        r["doc_id"]: r
        for r in leakage_safe_split(df, pairs).collect()
    }
    assert len(out) == 30
    assert out[0]["split"] == out[1]["split"] == out[2]["split"]
    assert out[0]["group_key"] == out[1]["group_key"] == out[2]["group_key"] == 0
    assert out[10]["split"] == out[11]["split"]
    base = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    for i in range(30):
        if i not in (1, 2, 11):  # non-reps rehash on their rep's id
            assert out[i]["split"] == base[i]


def test_leakage_safe_split_invariant_random_graphs(spark):
    """Invariant sweep over random pair graphs (fixed seeds): every
    connected component is entirely inside ONE split, including long
    chains and star shapes the pairwise check above does not cover."""
    import numpy as np

    from lucene_solr_spark.functions.pii import leakage_safe_split

    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        n = 60
        edges = {(int(a), int(b)) for a, b in rng.integers(0, n, (40, 2)) if a != b}
        edges = {(min(a, b), max(a, b)) for a, b in edges}
        df = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
        pairs = spark.createDataFrame(
            [(a, b) for a, b in sorted(edges)], ["ida", "idb"]
        )
        rows = leakage_safe_split(df, pairs).collect()
        split_of = {r["doc_id"]: r["split"] for r in rows}
        group_of = {r["doc_id"]: r["group_key"] for r in rows}
        # union-find ground truth
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        comp = {}
        for i in range(n):
            comp.setdefault(find(i), []).append(i)
        for members in comp.values():
            assert len({split_of[m] for m in members}) == 1, (seed, members)
            assert len({group_of[m] for m in members}) == 1, (seed, members)
            assert min(members) == group_of[members[0]], (seed, members)


def test_temperature_mixture_expected_repeats(spark):
    """T=2 flattening: head group rate exactly 1 (never upsampled),
    tail rate = sqrt(n_head/n_tail); expected expansion matches the
    fractional-draw construction within the md5-uniform tolerance."""
    import math

    from lucene_solr_spark.functions.pii import temperature_mixture

    rows = [(i, "big") for i in range(400)] + [
        (1000 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = temperature_mixture(df, group_col="lang", temperature=2.0).collect()
    rates = {r["lang"]: r["rate"] for r in out}
    assert rates["big"] == 1.0
    assert rates["small"] == math.sqrt(4.0)  # sqrt(400/100) = 2.0
    reps = {}
    for r in out:
        reps.setdefault(r["lang"], []).append(r["repeats"])
    assert all(x == 1 for x in reps["big"])       # rate 1.0: always once
    assert all(x == 2 for x in reps["small"])     # rate 2.0: exactly twice
    # fractional case: 400 vs 50 -> rate sqrt(8) ~ 2.828, repeats in {2,3}
    rows = [(i, "big") for i in range(400)] + [
        (1000 + i, "small") for i in range(50)
    ]
    out2 = temperature_mixture(
        spark.createDataFrame(rows, ["doc_id", "lang"]),
        group_col="lang",
        temperature=2.0,
    ).collect()
    small = [r["repeats"] for r in out2 if r["lang"] == "small"]
    assert set(small) <= {2, 3}
    frac = sum(1 for x in small if x == 3) / len(small)
    assert 0.55 <= frac <= 1.0  # E=0.828, 50 draws: loose md5-uniform band


def test_minhash_lsh_hot_bucket_cap(spark):
    """A degenerate bucket (hundreds of identical boilerplate docs)
    must not go quadratic: above max_bucket_size the pairs collapse to
    star edges around the min-id representative (plus rep-level clique
    edges), so the emitted edge count is linear in the bucket size and
    connected-components clustering still groups every copy."""
    import time

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler) for i in range(300)]
    rows += [(1000, "completely different text with novel words here")]
    rows += [(1001, boiler.replace("dog", "cat"))]  # near dup of boiler
    df = spark.createDataFrame(rows, "doc_id long, text string")

    t0 = time.time()
    pairs = minhash_lsh_pairs(df, threshold=0.5, max_bucket_size=50).collect()
    elapsed = time.time() - t0
    got = {(r["ida"], r["idb"]) for r in pairs}
    # linear, not quadratic: 300 identical docs → 299 star edges (+ the
    # rep-level near-dup edge), nowhere near the 300*299/2 clique
    assert len(got) < 350, len(got)
    assert all((0, i) in got for i in range(1, 300))
    # the near dup still pairs through the representative
    assert (0, 1001) in got
    assert not any(1000 in p for p in got)
    # connectivity: clustering groups all 300 copies + the near dup
    from lucene_solr_spark.functions.dedup import dedup_clusters

    clusters = dedup_clusters(
        spark.createDataFrame(
            [(a, b) for a, b in got], "ida long, idb long"
        )
    ).collect()
    comp = {r["doc_id"]: r["rep"] for r in clusters}
    assert len({comp[i] for i in range(300)} | {comp[1001]}) == 1

    # under the cap the exact clique semantics are unchanged
    small = spark.createDataFrame(rows[:4], "doc_id long, text string")
    clique = {
        (r["ida"], r["idb"])
        for r in minhash_lsh_pairs(small, threshold=0.5).collect()
    }
    assert {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)} <= clique
    assert elapsed < 120


def test_video_real_container_roundtrip(spark):
    """kind='video' media are REAL MJPEG-AVI containers: frame
    sampling decodes the actual per-timestamp frame via the idx1
    random-access path, and the decoded brightness matches the
    synthesis closed form (uniform even values → exact JPEG DC)."""
    from lucene_solr_spark.functions.multimodal import sampled_frame_features

    media = synthesize_media(spark, 5, kind="video")
    rows = sampled_frame_features(media, every_ms=250).collect()
    assert rows
    for r in rows:
        i, idx = r["media_id"], r["frame_index"]
        expected = (i * 7 + idx * 20) % 100 * 2 + 20
        assert abs(r["mean_px"] - expected) < 0.5, (i, idx, r["mean_px"])
    # every video contributes one sample per 250ms at fps=4 → one per frame
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], set()).add(r["frame_index"])
    for i, idxs in by_media.items():
        assert idxs == set(range(4 + i % 3)), (i, idxs)
