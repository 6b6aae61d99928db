"""Codec property tests (mirrors BasePostingsFormatTestCase roundtrips,
incl. the all-equal width-0 FOR case, ForUtil.java:40-46)."""

import numpy as np

from lucene_solr_spark.codecs import (
    BLOCK_SIZE,
    decode_posting_block,
    encode_posting_blocks,
    for_decode,
    for_encode,
    vbyte_decode,
    vbyte_encode,
)


def test_vbyte_roundtrip_random():
    rng = np.random.default_rng(7)
    for n in [0, 1, 2, 127, 128, 1000]:
        for hi in [2, 128, 1 << 14, 1 << 28, 1 << 40]:
            v = rng.integers(0, hi, n).astype(np.uint64)
            assert (vbyte_decode(vbyte_encode(v)) == v).all()


def test_vbyte_boundaries():
    v = np.array([0, 127, 128, 16383, 16384, 2**32 - 1, 2**50], dtype=np.uint64)
    enc = vbyte_encode(v)
    assert (vbyte_decode(enc) == v).all()
    # 0..127 take one byte; 128..16383 two
    assert len(vbyte_encode(np.array([127], dtype=np.uint64))) == 1
    assert len(vbyte_encode(np.array([128], dtype=np.uint64))) == 2


def test_for_roundtrip_random():
    rng = np.random.default_rng(11)
    for width_hi in [1, 2, 255, 1 << 16, 1 << 31]:
        v = rng.integers(0, width_hi, BLOCK_SIZE).astype(np.uint64)
        assert (for_decode(for_encode(v)) == v).all()


def test_for_all_equal_width_zero():
    # ForUtil.java:40-46 ALL_VALUES_EQUAL special case
    v = np.full(BLOCK_SIZE, 42, dtype=np.uint64)
    enc = for_encode(v)
    assert enc[0] == 0  # width byte 0
    assert len(enc) <= 4
    assert (for_decode(enc) == v).all()
    z = np.zeros(BLOCK_SIZE, dtype=np.uint64)
    assert (for_decode(for_encode(z)) == z).all()


def test_for_partial_block():
    rng = np.random.default_rng(13)
    v = rng.integers(0, 1000, 37).astype(np.uint64)
    assert (for_decode(for_encode(v)) == v).all()


def test_posting_blocks_roundtrip():
    rng = np.random.default_rng(17)
    for n in [1, 127, 128, 129, 300, 1000]:
        docs = np.sort(rng.choice(10 * n + 10, n, replace=False)).astype(np.uint64)
        tfs = rng.integers(1, 20, n).astype(np.uint64)
        blocks = encode_posting_blocks(docs, tfs)
        dec_docs, dec_tfs = [], []
        for r in blocks:
            d, t = decode_posting_block(
                r["base_docid"], r["count"], r["docs_bin"], r["tfs_bin"]
            )
            dec_docs.append(d)
            dec_tfs.append(t)
            assert r["max_docid"] == int(d.max())
            assert r["max_tf"] == int(t.max())
        assert (np.concatenate(dec_docs) == docs).all()
        assert (np.concatenate(dec_tfs) == tfs).all()


def test_posting_blocks_freq_one_interleave():
    # all-tf-1 tail uses the (delta<<1)|1 trick — one value per doc
    docs = np.array([5, 9, 10], dtype=np.uint64)
    tfs = np.ones(3, dtype=np.uint64)
    blocks = encode_posting_blocks(docs, tfs)
    assert len(blocks) == 1 and blocks[0]["tfs_bin"] is None
    d, t = decode_posting_block(
        blocks[0]["base_docid"], 3, blocks[0]["docs_bin"], None
    )
    assert (d == docs).all() and (t == tfs).all()


def test_segment_blocks_byte_identical_to_per_term():
    # encode_segment_blocks must be byte-for-byte the per-term encoder,
    # across tf=1-only terms (interleave), all-equal FOR blocks, multi-
    # block terms, and singleton terms.
    from lucene_solr_spark.codecs import encode_segment_blocks

    rng = np.random.default_rng(23)
    for trial in range(20):
        nterms = int(rng.integers(1, 40))
        p_docs, tfs, pos, starts, ends = [], [], [], [], []
        cur = 0
        for _ in range(nterms):
            n = int(rng.choice([1, 2, 5, 127, 128, 129, 300]))
            docs = np.sort(
                rng.choice(4 * n + 8, n, replace=False)
            ).astype(np.int64)
            kind = int(rng.integers(0, 3))
            if kind == 0:
                f = np.ones(n, dtype=np.int64)  # all-equal FOR / interleave
            elif kind == 1:
                f = np.full(n, int(rng.integers(1, 9)), dtype=np.int64)
            else:
                f = rng.integers(1, 20, n).astype(np.int64)
            for fi in f:
                pv = np.sort(rng.choice(1000, int(fi), replace=False))
                pos.append(pv.astype(np.int64))
            p_docs.append(docs)
            tfs.append(f)
            starts.append(cur)
            cur += n
            ends.append(cur)
        p_docs = np.concatenate(p_docs)
        tfs_all = np.concatenate(tfs)
        pos_all = np.concatenate(pos) if pos else np.zeros(0, np.int64)
        enc = encode_segment_blocks(
            p_docs,
            tfs_all,
            pos_all,
            np.array(starts, dtype=np.int64),
            np.array(ends, dtype=np.int64),
        )
        pos_off = np.zeros(tfs_all.size + 1, dtype=np.int64)
        np.cumsum(tfs_all, out=pos_off[1:])
        bi = 0
        for t, (s, e) in enumerate(zip(starts, ends)):
            ref = encode_posting_blocks(
                p_docs[s:e], tfs_all[s:e], pos_all[pos_off[s] : pos_off[e]]
            )
            for j, rec in enumerate(ref):
                assert enc["term_index"][bi] == t
                assert enc["block_id"][bi] == j
                assert enc["base_docid"][bi] == rec["base_docid"]
                assert enc["count"][bi] == rec["count"]
                assert enc["max_docid"][bi] == rec["max_docid"]
                assert enc["max_tf"][bi] == rec["max_tf"]
                assert enc["sum_tf"][bi] == rec["sum_tf"]
                assert bytes(enc["docs_bin"][bi]) == bytes(rec["docs_bin"])
                if rec["tfs_bin"] is None:
                    assert enc["tfs_bin"][bi] is None
                else:
                    assert bytes(enc["tfs_bin"][bi]) == bytes(rec["tfs_bin"])
                assert bytes(enc["pos_bin"][bi]) == bytes(rec["pos_bin"])
                bi += 1
        assert bi == len(enc["block_id"])
