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
    doc_ids: np.ndarray, tfs: np.ndarray, positions: np.ndarray | None = None
) -> list[dict]:
    """Encode one term's sorted posting list into block records.

    Returns a list of dicts with keys:
    ``block_id, base_docid, count, max_docid, max_tf, sum_tf, docs_bin,
    tfs_bin, pos_bin``.  Full blocks use FOR; the tail uses interleaved
    VByte (tfs_bin=None).  ``positions``, if given, is the concatenation
    of every doc's in-doc position list (lengths = tfs); each block's
    slice is delta-coded per doc and VByte-packed into ``pos_bin``
    (the .pos stream analog, Lucene50PostingsWriter.java:381-392).
    """
    docs = np.asarray(doc_ids, dtype=np.uint64)
    freqs = np.asarray(tfs, dtype=np.uint64)
    n = docs.size
    out: list[dict] = []
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
