"""Bob Jenkins lookup3 (Yonik's ycs64 variant) + Lookup3Signature.

Hash.lookup3ycs64 (solr/solrj/src/java/org/apache/solr/common/util/
Hash.java:185-236): the code-point-stream variant of lookup3 hashword
— surrogate pairs consume two UTF-16 units and contribute ONE code
point; the ``+ (length<<2)`` of classic lookup3 is the CALLER's job
(pass initval + (len<<2) to reproduce lookup3 results).  Verified
against the C-derived "hello world" vectors in TestHash.java:30-54.

Lookup3Signature (update/processor/Lookup3Signature.java:27-46): the
SignatureUpdateProcessor default for EXACT dedup — fields are folded
into a running 64-bit hash (each add() seeds with the previous hash),
emitted big-endian.

This is a per-row scalar hash with data-dependent control flow — not
expressible as Spark column expressions, so the DataFrame entry point
is an Arrow-batched pandas UDF (the slow-path budget is one pass over
each row's signature fields, same as the reference's processor).
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF


def _rot(x: int, k: int) -> int:
    x &= _M32
    return ((x << k) | (x >> (32 - k))) & _M32


def lookup3ycs64(s: str, initval: int = 0) -> int:
    """Hash.lookup3ycs64 over a Python str (code points ARE the stream;
    Python strings are already code-point sequences, so the surrogate
    recombination of the Java CharSequence walk is a no-op here).
    Returns an unsigned 64-bit value."""
    a = b = c = (0xDEADBEEF + (initval & _M32)) & _M32
    c = (c + ((initval >> 32) & _M32)) & _M32
    i, n = 0, len(s)
    mixed = True
    while i < n:
        mixed = False
        a = (a + ord(s[i])) & _M32
        i += 1
        if i >= n:
            break
        b = (b + ord(s[i])) & _M32
        i += 1
        if i >= n:
            break
        c = (c + ord(s[i])) & _M32
        i += 1
        if i >= n:
            break
        # mix(a, b, c)
        a = (a - c) & _M32; a ^= _rot(c, 4);  c = (c + b) & _M32
        b = (b - a) & _M32; b ^= _rot(a, 6);  a = (a + c) & _M32
        c = (c - b) & _M32; c ^= _rot(b, 8);  b = (b + a) & _M32
        a = (a - c) & _M32; a ^= _rot(c, 16); c = (c + b) & _M32
        b = (b - a) & _M32; b ^= _rot(a, 19); a = (a + c) & _M32
        c = (c - b) & _M32; c ^= _rot(b, 4);  b = (b + a) & _M32
        mixed = True
    if not mixed:
        # final(a, b, c)
        c ^= b; c = (c - _rot(b, 14)) & _M32
        a ^= c; a = (a - _rot(c, 11)) & _M32
        b ^= a; b = (b - _rot(a, 25)) & _M32
        c ^= b; c = (c - _rot(b, 16)) & _M32
        a ^= c; a = (a - _rot(c, 4)) & _M32
        b ^= a; b = (b - _rot(a, 14)) & _M32
        c ^= b; c = (c - _rot(b, 24)) & _M32
    return ((b << 32) | c) & 0xFFFFFFFFFFFFFFFF


def lookup3ycs(s: str, initval: int = 0) -> int:
    """32-bit variant (the low word of ycs64 at the same seed), signed
    like Java int for direct comparison with the reference vectors."""
    v = lookup3ycs64(s, initval & _M32) & _M32
    return v - (1 << 32) if v >= (1 << 31) else v


def lookup3_signature(*fields: str) -> str:
    """Lookup3Signature: fold each field into the running hash, return
    the big-endian hex signature (the byte[] of getSignature)."""
    h = 0
    for f in fields:
        h = lookup3ycs64(f, h)
    return h.to_bytes(8, "big").hex()


def lookup3_signature_df(df, id_col: str = "doc_id", cols: "tuple[str, ...]" = ("text",)):
    """DataFrame form: (doc_id, signature) via an Arrow-batched pandas
    UDF (per-row scalar hash — the documented slow path; everything
    downstream of the signature stays relational)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _sig_fn(*series):
        out = []
        for vals in zip(*series):
            out.append(lookup3_signature(*[str(v) for v in vals]))
        return pd.Series(out)

    # no type hints: *args signatures aren't inferable — pass the
    # return type explicitly (SCALAR eval is the default)
    _sig = pandas_udf(_sig_fn, "string")

    return df.select(
        F.col(id_col).alias("doc_id"),
        _sig(*[F.col(c) for c in cols]).alias("signature"),
    )
