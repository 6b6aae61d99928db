"""Sloppy-phrase kernel: per-doc reference loop vs doc-parallel batch.

The r3 kernel ran ``sloppy_phrase_freq`` once per candidate row inside
the pandas UDF — interpreter-rate work per doc.  The r4 kernel
(``sloppy_phrase_freq_batch``) runs the identical state machine for
every doc at once in numpy.  This script times both on a synthetic
high-df candidate set (every doc contains both phrase terms, the WORST
case for the two-phase plan) and verifies bit-identical float32 freqs.

Usage: python scripts/bench_sloppy_kernel.py [n_docs] [positions_per_doc]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from lucene_solr_spark.queries.sloppy import (  # noqa: E402
    sloppy_phrase_freq,
    sloppy_phrase_freq_batch,
)


def main() -> int:
    D = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    rng = np.random.default_rng(42)
    cols = []
    for _u in range(2):
        col = np.empty(D, dtype=object)
        for d in range(D):
            k = 1 + int(rng.integers(P))
            col[d] = np.sort(
                rng.choice(np.arange(0, 400), size=k, replace=False)
            ).astype(np.int64)
        cols.append(col)
    offsets, slop = [0, 1], 2

    t0 = time.time()
    batch = sloppy_phrase_freq_batch(cols, offsets, slop)
    t_batch = time.time() - t0

    t0 = time.time()
    loop = np.zeros(D, dtype=np.float32)
    for d in range(D):
        loop[d] = sloppy_phrase_freq([cols[0][d], cols[1][d]], offsets, slop)
    t_loop = time.time() - t0

    assert np.array_equal(batch, loop), "kernel mismatch"
    print(
        f"docs={D} batch={t_batch:.2f}s per-doc-loop={t_loop:.2f}s "
        f"speedup={t_loop / t_batch:.1f}x (bit-identical float32 freqs)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
