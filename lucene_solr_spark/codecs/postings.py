"""Packed posting-list blocks: delta-gap docIDs + tfs, FOR-compressed.

Layout follows the reference's Lucene50PostingsWriter
(codecs/lucene50/Lucene50PostingsWriter.java):

- docIDs are delta-gap coded (``docDelta = docID − lastDocID``, :222);
- full 128-doc blocks are FOR bit-packed (:237 → forUtil.writeBlock);
- the tail (<128 docs) is VByte with the freq-interleave trick —
  ``(delta<<1)|1`` when freq==1, else ``delta<<1`` followed by the freq
  (:338-348).

Unlike the reference's file-pointer streams, each block row here is
*independently decodable* (the block carries its own base docID as
column metadata) so Spark tasks and the WAND kernel can seek blocks by
Parquet row-group pruning instead of skip-list pointers.  Per-block
``max_docid`` / ``max_tf`` columns replace the multi-level skip list
(codecs/MultiLevelSkipListWriter.java) and double as the block-max-WAND
upper-bound source.
"""

from __future__ import annotations

import numpy as np

from lucene_solr_spark.codecs.forutil import BLOCK_SIZE, for_decode, for_encode
from lucene_solr_spark.codecs.vbyte import vbyte_decode, vbyte_encode, vbyte_lengths


def encode_posting_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    positions: np.ndarray | None = None,
    doc_lens: np.ndarray | None = None,
) -> list[dict]:
    """Encode one term's sorted posting list into block records.

    Returns a list of dicts with keys:
    ``block_id, base_docid, count, max_docid, max_tf, sum_tf, docs_bin,
    tfs_bin, pos_bin, lens_bin``.  Full blocks use FOR; the tail uses
    interleaved VByte (tfs_bin=None).  ``positions``, if given, is the
    concatenation of every doc's in-doc position list (lengths = tfs);
    each block's slice is delta-coded per doc and VByte-packed into
    ``pos_bin`` (the .pos stream analog,
    Lucene50PostingsWriter.java:381-392).

    ``doc_lens``, if given, is the per-posting field length (aligned
    with doc_ids); each block's slice is VByte-packed into ``lens_bin``
    so queries score straight from term-pruned blocks without touching
    the norms table — the per-leaf .nvd locality of
    Lucene70NormsFormat.java:37, traded as ~1 VByte per posting of
    extra storage for ZERO per-query norm shuffle.
    """
    docs = np.asarray(doc_ids, dtype=np.uint64)
    freqs = np.asarray(tfs, dtype=np.uint64)
    n = docs.size
    out: list[dict] = []
    lens_bytes = b""
    lens_off = None
    if doc_lens is not None:
        lens_u = np.asarray(doc_lens, dtype=np.uint64)
        lens_bytes = vbyte_encode(lens_u)
        lens_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(vbyte_lengths(lens_u), out=lens_off[1:])
    pos_offsets = None
    pos_bytes = b""
    byte_off = None
    if positions is not None:
        positions = np.asarray(positions, dtype=np.uint64)
        pos_offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(freqs, out=pos_offsets[1:])
        # Encode the WHOLE term's position deltas once, then slice the
        # byte stream per block (block boundaries are doc boundaries,
        # and each doc's first position is absolute, so any block span
        # decodes independently — semantics identical to per-block
        # encoding, minus ~10 numpy-call overheads per tiny block).
        if positions.size:
            deltas_all = np.diff(positions, prepend=np.uint64(0))
            doc_starts = pos_offsets[:-1]
            deltas_all[doc_starts] = positions[doc_starts]
            pos_bytes = vbyte_encode(deltas_all)
            byte_off = np.zeros(deltas_all.size + 1, dtype=np.int64)
            np.cumsum(vbyte_lengths(deltas_all), out=byte_off[1:])
    for block_id, start in enumerate(range(0, n, BLOCK_SIZE)):
        chunk = docs[start : start + BLOCK_SIZE]
        fchunk = freqs[start : start + BLOCK_SIZE]
        base = int(chunk[0])
        gaps = np.diff(chunk, prepend=np.uint64(base))  # first gap = 0
        rec = {
            "block_id": block_id,
            "base_docid": base,
            "count": int(chunk.size),
            "max_docid": int(chunk[-1]),
            "max_tf": int(fchunk.max()),
            "sum_tf": int(fchunk.sum()),
            "pos_bin": None,
            "lens_bin": (
                lens_bytes[
                    lens_off[start] : lens_off[min(start + BLOCK_SIZE, n)]
                ]
                if lens_off is not None
                else None
            ),
        }
        if pos_offsets is not None:
            lo = pos_offsets[start]
            hi = pos_offsets[min(start + BLOCK_SIZE, n)]
            rec["pos_bin"] = (
                pos_bytes[byte_off[lo] : byte_off[hi]]
                if byte_off is not None and hi > lo
                else b""
            )
        if chunk.size == BLOCK_SIZE:
            rec["docs_bin"] = for_encode(gaps)
            rec["tfs_bin"] = for_encode(fchunk)
        else:
            # VByte tail with freq interleave (Lucene50PostingsWriter:338-348)
            parts = np.zeros(2 * chunk.size, dtype=np.uint64)
            one = fchunk == 1
            parts[0::2] = np.where(one, (gaps << np.uint64(1)) | np.uint64(1), gaps << np.uint64(1))
            parts[1::2] = np.where(one, np.uint64(0), fchunk)
            keep = np.ones(2 * chunk.size, dtype=bool)
            keep[1::2] = ~one
            rec["docs_bin"] = vbyte_encode(parts[keep])
            rec["tfs_bin"] = None
        out.append(rec)
    return out


def encode_segment_blocks(
    p_docs: np.ndarray,
    tfs: np.ndarray,
    positions: np.ndarray,
    t_starts: np.ndarray,
    t_ends: np.ndarray,
    run_lens: np.ndarray | None = None,
) -> dict[str, np.ndarray]:
    """Batched, byte-identical equivalent of calling
    :func:`encode_posting_blocks` once per term over a whole segment.

    Inputs are the segment's flat (term, doc)-sorted run arrays —
    ``p_docs``/``tfs`` one entry per (term, doc) run, ``positions`` the
    concatenation of every run's in-doc positions, ``t_starts``/
    ``t_ends`` the per-term run spans.  Returns columnar arrays
    (``term_index`` maps each block back to its term) in (term,
    block_id) order.

    Why: the per-term encoder pays ~30 numpy-call fixed overheads per
    term, and real vocabularies are dominated by df<10 terms — profiled
    at 8.3 s of a 15.9 s 30k-doc segment flush.  Here every stream is
    encoded ONCE for the whole segment and sliced per block:

    - full 128-blocks are gathered into (n, 128) matrices and bit-packed
      per FOR width group (≤64 ``packbits`` calls per segment instead of
      two per block; 128·w bits is always byte-aligned, so row-wise
      packing equals per-block packing byte-for-byte);
    - ALL_VALUES_EQUAL blocks (the all-tfs-equal fast path of
      ForUtil.java:40-46 — common for tf=1 terms) slice one shared
      VByte stream of their representative values;
    - VByte tails and the positions stream are single whole-segment
      encodes sliced by cumulative byte lengths (the whole-term trick
      of the positions stream, applied segment-wide).
    """
    p_docs = np.asarray(p_docs, dtype=np.int64)
    tfs64 = np.asarray(tfs, dtype=np.uint64)
    t_starts = np.asarray(t_starts, dtype=np.int64)
    t_ends = np.asarray(t_ends, dtype=np.int64)
    nruns = p_docs.size
    nterms = t_starts.size
    lens = t_ends - t_starts
    nblocks = (lens + BLOCK_SIZE - 1) // BLOCK_SIZE
    total = int(nblocks.sum())
    first_block = np.zeros(nterms, dtype=np.int64)
    np.cumsum(nblocks[:-1], out=first_block[1:])
    block_term = np.repeat(np.arange(nterms, dtype=np.int64), nblocks)
    block_j = np.arange(total, dtype=np.int64) - first_block[block_term]
    bstart = t_starts[block_term] + BLOCK_SIZE * block_j
    bend = np.minimum(bstart + BLOCK_SIZE, t_ends[block_term])
    size = bend - bstart

    # doc gaps, flat: every block's first gap is 0 (diff prepend base)
    gaps = np.zeros(nruns, dtype=np.int64)
    if nruns > 1:
        gaps[1:] = p_docs[1:] - p_docs[:-1]
    gaps[bstart] = 0
    gaps_u = gaps.astype(np.uint64)

    base = p_docs[bstart]
    max_docid = p_docs[bend - 1]
    max_tf = np.maximum.reduceat(tfs64, bstart)
    sum_tf = np.add.reduceat(tfs64, bstart)

    docs_bin = np.empty(total, dtype=object)
    tfs_bin = np.empty(total, dtype=object)
    pos_bin = np.empty(total, dtype=object)

    full = size == BLOCK_SIZE
    full_idx = np.flatnonzero(full)
    _SIZE_VB = vbyte_encode(np.array([BLOCK_SIZE], dtype=np.uint64))

    if full_idx.size:
        cols = np.arange(BLOCK_SIZE, dtype=np.int64)
        for src, dest in ((gaps_u, docs_bin), (tfs64, tfs_bin)):
            mat = src[bstart[full_idx][:, None] + cols[None, :]]
            mx = mat.max(axis=1)
            mn = mat.min(axis=1)
            eq = mx == mn
            # ALL_VALUES_EQUAL rows: [0][vbyte(v)][vbyte(128)]
            if eq.any():
                reps = mat[eq, 0]
                vb = vbyte_encode(reps)
                off = np.zeros(reps.size + 1, dtype=np.int64)
                np.cumsum(vbyte_lengths(reps), out=off[1:])
                for k, bi in enumerate(full_idx[eq]):
                    dest[bi] = b"\x00" + vb[off[k] : off[k + 1]] + _SIZE_VB
            # width-packed rows, grouped by width so each group is one
            # packbits over a (k, 128·w) bit matrix
            neq = ~eq
            if neq.any():
                sub_idx = full_idx[neq]
                sub = mat[neq]
                # exact for v < 2^53: doubles hold these ints exactly
                widths = np.ceil(np.log2(sub.max(axis=1) + 1.0)).astype(np.int64)
                for w in np.unique(widths):
                    wsel = widths == w
                    rows = sub[wsel]
                    shifts = np.arange(w - 1, -1, -1, dtype=np.uint64)
                    bits = (
                        (rows[:, :, None] >> shifts[None, None, :])
                        & np.uint64(1)
                    ).astype(np.uint8)
                    packed = np.packbits(bits.reshape(rows.shape[0], -1), axis=1)
                    head = bytes([int(w)]) + _SIZE_VB
                    for k, bi in enumerate(sub_idx[wsel]):
                        dest[bi] = head + packed[k].tobytes()

    # ---- VByte tails: one interleaved stream for all tail blocks ----
    tail_idx = np.flatnonzero(~full)
    if tail_idx.size:
        tail_run = np.zeros(nruns, dtype=bool)
        for bi in tail_idx:  # tails are few: ≤1 per term
            tail_run[bstart[bi] : bend[bi]] = True
        tg = gaps_u[tail_run]
        tf_t = tfs64[tail_run]
        one = tf_t == np.uint64(1)
        parts = np.zeros(2 * tg.size, dtype=np.uint64)
        parts[0::2] = np.where(
            one, (tg << np.uint64(1)) | np.uint64(1), tg << np.uint64(1)
        )
        parts[1::2] = np.where(one, np.uint64(0), tf_t)
        keep = np.ones(2 * tg.size, dtype=bool)
        keep[1::2] = ~one
        kept = parts[keep]
        vb = vbyte_encode(kept)
        voff = np.zeros(kept.size + 1, dtype=np.int64)
        np.cumsum(vbyte_lengths(kept), out=voff[1:])
        # kept-value index at each tail run boundary
        vals_per_run = np.where(one, 1, 2).astype(np.int64)
        run_voff = np.zeros(tg.size + 1, dtype=np.int64)
        np.cumsum(vals_per_run, out=run_voff[1:])
        # global run index → tail-flat index
        g2t = np.cumsum(tail_run) - 1
        for bi in tail_idx:
            lo = run_voff[g2t[bstart[bi]]]
            hi = run_voff[g2t[bend[bi] - 1] + 1]
            docs_bin[bi] = vb[voff[lo] : voff[hi]]
            tfs_bin[bi] = None

    # ---- positions: one whole-segment delta+VByte stream ------------
    positions = np.asarray(positions, dtype=np.uint64)
    pos_offsets = np.zeros(nruns + 1, dtype=np.int64)
    np.cumsum(tfs64.astype(np.int64), out=pos_offsets[1:])
    if positions.size:
        deltas = np.diff(positions, prepend=np.uint64(0))
        run_starts = pos_offsets[:-1]
        deltas[run_starts] = positions[run_starts]
        pos_bytes = vbyte_encode(deltas)
        byte_off = np.zeros(deltas.size + 1, dtype=np.int64)
        np.cumsum(vbyte_lengths(deltas), out=byte_off[1:])
        for bi in range(total):
            lo = pos_offsets[bstart[bi]]
            hi = pos_offsets[bend[bi]]
            pos_bin[bi] = pos_bytes[byte_off[lo] : byte_off[hi]] if hi > lo else b""
    else:
        pos_bin[:] = b""

    # ---- per-posting field lengths: one VByte stream, sliced per block
    # (byte-identical to passing doc_lens per term to
    # encode_posting_blocks — same whole-stream/slice equivalence as the
    # positions stream above)
    lens_bin = np.empty(total, dtype=object)
    if run_lens is not None:
        lens_u = np.asarray(run_lens, dtype=np.uint64)
        lens_bytes = vbyte_encode(lens_u)
        lens_off = np.zeros(lens_u.size + 1, dtype=np.int64)
        np.cumsum(vbyte_lengths(lens_u), out=lens_off[1:])
        for bi in range(total):
            lens_bin[bi] = lens_bytes[lens_off[bstart[bi]] : lens_off[bend[bi]]]
    else:
        lens_bin[:] = None

    return {
        "term_index": block_term,
        "block_id": block_j,
        "base_docid": base,
        "count": size,
        "max_docid": max_docid,
        "max_tf": max_tf.astype(np.int64),
        "sum_tf": sum_tf.astype(np.int64),
        "docs_bin": docs_bin,
        "tfs_bin": tfs_bin,
        "pos_bin": pos_bin,
        "lens_bin": lens_bin,
    }


def decode_block_lens(lens_bin: bytes) -> np.ndarray:
    """Decode one block's ``lens_bin`` back to per-posting field lengths."""
    return vbyte_decode(lens_bin)


def decode_block_positions(
    tfs: np.ndarray, pos_bin: bytes
) -> list[np.ndarray]:
    """Decode one block's ``pos_bin`` back to per-doc position arrays."""
    deltas = vbyte_decode(pos_bin)
    offsets = np.zeros(tfs.size + 1, dtype=np.int64)
    np.cumsum(np.asarray(tfs, dtype=np.int64), out=offsets[1:])
    out = []
    for i in range(tfs.size):
        d = deltas[offsets[i] : offsets[i + 1]]
        out.append(np.cumsum(d, dtype=np.uint64))
    return out


def decode_posting_block(
    base_docid: int, count: int, docs_bin: bytes, tfs_bin: bytes | None
) -> tuple[np.ndarray, np.ndarray]:
    """Decode one block row back to (doc_ids, tfs)."""
    if tfs_bin is not None:
        gaps = for_decode(docs_bin)
        tfs = for_decode(tfs_bin)
    else:
        vals = vbyte_decode(docs_bin)
        gaps = np.zeros(count, dtype=np.uint64)
        tfs = np.zeros(count, dtype=np.uint64)
        i = 0
        for k in range(count):
            v = vals[i]
            i += 1
            gaps[k] = v >> np.uint64(1)
            if v & np.uint64(1):
                tfs[k] = 1
            else:
                tfs[k] = vals[i]
                i += 1
    docs = np.cumsum(gaps, dtype=np.uint64) + np.uint64(base_docid)
    return docs, tfs
