"""SolrCloud hash-range doc routing + SPLITSHARD.

Reference surfaces:
- solr/solrj/src/java/org/apache/solr/common/cloud/CompositeIdRouter.java
  (hash the route key onto the signed 32-bit ring; a collection's
  shards partition the ring into contiguous [min, max] ranges;
  ``partitionRange`` splits a range into N equal sub-ranges).
- solr/core/src/java/org/apache/solr/cloud/api/collections/
  SplitShardCmd.java (SPLITSHARD: compute sub-ranges, partition the
  parent shard's docs into them, parent retires when children are
  active).
- solr/core/src/java/org/apache/solr/update/SolrIndexSplitter.java
  (the doc-at-a-time partitioning of the parent index by route hash).

Spark-first shape: routing is ONE hash expression — `repartition` by
the shard column gives the cluster layout, and a split is a metadata
change (new range table) plus a partition-local re-bucketing of one
shard's rows; no other shard's data moves.  At 100 TB that locality is
the whole point of SPLITSHARD: the reshard touches 1/num_shards of the
corpus, while a naive re-route of the whole ring would shuffle
everything.

Hash substitution (documented divergence): CompositeIdRouter hashes
with MurmurHash3 x86-32; that is not reproducible inside DuckDB, so
this engine uses the repo-standard md5-prefix hash (first 8 hex chars
→ unsigned 32-bit, recentred onto the signed ring).  Range semantics
— contiguous signed-ring intervals, equal partitioning with the
leftover spread over the first ranges — follow the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RING = 1 << 32
_MIN = -(1 << 31)
_MAX = (1 << 31) - 1


@dataclass(frozen=True)
class HashRange:
    """Closed interval on the signed 32-bit ring (Router.Range)."""

    lo: int
    hi: int

    def split(self, parts: int = 2) -> "list[HashRange]":
        """partitionRange: equal sub-ranges; remainder widens the early
        ones by 1 (CompositeIdRouter.partitionRange's integer split)."""
        span = self.hi - self.lo + 1
        base, extra = divmod(span, parts)
        out, lo = [], self.lo
        for i in range(parts):
            width = base + (1 if i < extra else 0)
            out.append(HashRange(lo, lo + width - 1))
            lo += width
        return out


def collection_ranges(num_shards: int) -> list[HashRange]:
    """The default collection layout: num_shards equal ranges covering
    the whole ring (CompositeIdRouter.partitionRange over [MIN, MAX])."""
    return HashRange(_MIN, _MAX).split(num_shards)


def route_hash(id_col) -> F.Column:
    """Signed 32-bit route hash of the doc id (md5-32 stand-in for
    CompositeIdRouter's murmur3; engine-reproducible in DuckDB via
    CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 1, 8)) AS
    BIGINT) with the same recentring)."""
    u32 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return F.when(u32 >= (1 << 31), u32 - _RING).otherwise(u32)


def _range_expr(ranges: dict[str, HashRange]) -> F.Column:
    """shard-name column from a route-hash column `_rh` (one chained
    conditional — ranges are disjoint so order doesn't matter)."""
    expr = F.lit(None).cast("string")
    for name, r in ranges.items():
        expr = F.when(
            (F.col("_rh") >= r.lo) & (F.col("_rh") <= r.hi), F.lit(name)
        ).otherwise(expr)
    return expr


def route(
    df: DataFrame, num_shards: int, id_col: str = "doc_id"
) -> tuple[DataFrame, dict[str, HashRange]]:
    """Assign every doc its shard (shard1..shardN ring layout).

    Returns (df + [_rh, shard], {shard_name: HashRange}).  At scale the
    caller follows with `.repartition("shard")` (or writes
    partitionBy("shard")) — the routing itself is one scan, no shuffle.
    """
    ranges = {
        f"shard{i + 1}": r
        for i, r in enumerate(collection_ranges(num_shards))
    }
    out = df.withColumn("_rh", route_hash(id_col)).withColumn(
        "shard", _range_expr(ranges)
    )
    return out, ranges


def split_shard(
    routed: DataFrame,
    ranges: dict[str, HashRange],
    shard: str,
    parts: int = 2,
) -> tuple[DataFrame, dict[str, HashRange]]:
    """SPLITSHARD: replace ``shard`` with ``parts`` children covering
    its sub-ranges (shardN_0, shardN_1, …), re-routing ONLY that
    shard's rows (SplitShardCmd + SolrIndexSplitter).

    The returned frame re-evaluates the shard column only where
    shard == parent — every other row's assignment (and partition, at
    scale) is untouched.
    """
    if shard not in ranges:
        raise ValueError(f"unknown shard {shard!r}")
    children = {
        f"{shard}_{i}": r for i, r in enumerate(ranges[shard].split(parts))
    }
    new_ranges = {k: v for k, v in ranges.items() if k != shard}
    new_ranges.update(children)
    child_expr = F.lit(None).cast("string")
    for name, r in children.items():
        child_expr = F.when(
            (F.col("_rh") >= r.lo) & (F.col("_rh") <= r.hi), F.lit(name)
        ).otherwise(child_expr)
    out = routed.withColumn(
        "shard",
        F.when(F.col("shard") == shard, child_expr).otherwise(
            F.col("shard")
        ),
    )
    return out, new_ranges


def shard_report(
    routed: DataFrame, ranges: dict[str, HashRange]
) -> DataFrame:
    """Per-shard manifest row: (shard, lo, hi, docs) — the CLUSTERSTATUS
    view the split is verified against (counts partition the corpus)."""
    spark = routed.sparkSession
    meta = spark.createDataFrame(
        [(k, v.lo, v.hi) for k, v in ranges.items()],
        "shard string, lo long, hi long",
    )
    counts = routed.groupBy("shard").agg(F.count("*").alias("docs"))
    return (
        meta.join(counts, "shard", "left")
        .withColumn("docs", F.coalesce(F.col("docs"), F.lit(0)))
        .orderBy("lo")
    )


# --------------------------------------------------------------------------
# CompositeId routing — multi-tenant `tenant!doc` keys
# (CompositeIdRouter.KeyParser, CompositeIdRouter.java:178-325)
# --------------------------------------------------------------------------

_U32 = (1 << 32) - 1


def _h32u(col: F.Column) -> F.Column:
    """Unsigned 32-bit md5-prefix hash of a STRING column (the repo's
    engine-reproducible murmur3 stand-in — see module docstring)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _mask_top(bits: F.Column) -> F.Column:
    """u32 mask of the top `bits` bits: bits==0 → 0 else -1<<(32-bits)
    (KeyParser.getBitMasks, CompositeIdRouter.java:308-315)."""
    # top-bits mask as arithmetic (shiftleft takes no Column count):
    # m = U32 ^ (2^(32-bits) - 1); 2^k ≤ 2^32 is float64-exact
    low = (F.pow(F.lit(2.0), (F.lit(32) - bits).cast("double")).cast("long")
           - F.lit(1))
    return F.when(bits <= 0, F.lit(0).cast("long")).otherwise(
        F.lit(_U32).bitwiseXOR(low)
    )


def _bits_of(part: F.Column, default: int) -> tuple[F.Column, F.Column]:
    """Split an id part's `/N` bits spec (bitsSeparator, :238-241,
    :299-306): returns (clean_part, bits).  A '/' at position 1
    (Java indexOf == 0) is NOT a spec; non-numeric or >32 specs are
    rejected by the caller via the -1 sentinel, matching getNumBits."""
    slash = F.instr(part, "/")
    # spec = everything after the FIRST '/' (Java indexOf + substring;
    # a second '/' makes the spec non-numeric → default, :299-306)
    spec = part.substr(slash + 1, F.length(part))
    has = slash > 1
    bits = F.when(
        has,
        # getNumBits: empty spec → 0 (the digit loop never runs);
        # digits ≤ 32 → the value; anything else → -1 sentinel
        F.when(spec == "", F.lit(0))
        .when(
            spec.rlike("^[0-9]+$") & (spec.cast("int") <= 32),
            spec.cast("int"),
        )
        .otherwise(F.lit(-1)),
    ).otherwise(F.lit(default))
    clean = F.when(has, F.substring_index(part, "/", 1)).otherwise(part)
    return clean, bits


def composite_route_hash(id_col) -> F.Column:
    """Signed 32-bit CompositeId route hash of `tenant!doc` /
    `app!user!doc` keys as ONE column expression (no Python in the
    row path) — KeyParser.getHash (CompositeIdRouter.java:317-323):
    the top `bits` (default 16; 8/8 for tri-level) of the hash come
    from the tenant part, the rest from the doc part, so one tenant's
    docs occupy one contiguous 2^(32-bits) slice of the ring (tenant
    locality) while spreading inside it.

    Faithful to KeyParser's parsing quirks: a plain id (no '!')
    hashes whole; a trailing '!' adds an empty-string piece
    (:219-221,:243-246); `a!b!` is tri-level with an empty third
    piece; separators beyond the second join the third piece
    (:211-215); `/N` bits specs apply to non-last pieces only
    (:234-241).  Divergence (documented): a malformed `/N` spec
    (getNumBits -1, which the reference feeds into a Java shift whose
    count silently masks to 5 bits) instead falls back to the level
    default here.
    """
    s = F.col(id_col).cast("string")
    i1 = F.instr(s, "!")
    slen = F.length(s)

    p0_raw = F.substring(s, F.lit(1), (i1 - 1).cast("int"))
    rest = s.substr(i1 + 1, slen)  # '' when '!' is last
    i2 = F.instr(rest, "!")
    rlen = F.length(rest)

    # piece layout per KeyParser:167-222 (1=a, 2=a!b / a! / a!!,
    # 3=a!b!c / a!b! — the endsWith('!') pieces++ included)
    tri = (i1 > 0) & (
        ((i2 > 0) & (i2 < rlen))                      # a!b!c...
        | ((i2 > 0) & (i2 == rlen) & (i2 > 1))        # a!b!
    )
    # second piece text (before any bits-spec strip)
    p1_raw = F.when(i2 > 0, F.substring(rest, F.lit(1), (i2 - 1).cast("int"))).otherwise(rest)
    # third piece: everything after the second '!' (may itself hold '!')
    p2_raw = F.when(i2 < rlen, rest.substr(i2 + 1, rlen)).otherwise(F.lit(""))

    # bits specs: piece0 default 16 (2-level) / 8 (tri); piece1 only
    # participates tri-level with default 8
    p0_2l, b0_2l = _bits_of(p0_raw, 16)
    p0_3l, b0_3l = _bits_of(p0_raw, 8)
    p1_3l, b1_3l = _bits_of(p1_raw, 8)
    b0_2l = F.when(b0_2l < 0, F.lit(16)).otherwise(b0_2l)
    b0_3l = F.when(b0_3l < 0, F.lit(8)).otherwise(b0_3l)
    b1_3l = F.when(b1_3l < 0, F.lit(8)).otherwise(b1_3l)

    # --- 2-level hash: h0 & m0 | h1 & ~m0  (getBitMasks(first), :308)
    m0 = _mask_top(b0_2l)
    m1 = m0.bitwiseXOR(F.lit(_U32))
    h2l = (
        _h32u(p0_2l).bitwiseAND(m0)
        .bitwiseOR(_h32u(p1_raw).bitwiseAND(m1))
    )

    # --- tri-level: masks via getBitMasks(first, second) (:289-296)
    t0 = _mask_top(b0_3l)
    t01 = _mask_top(b0_3l + b1_3l)
    t1 = t0.bitwiseXOR(t01)
    t2 = t01.bitwiseXOR(F.lit(_U32))
    h3l = (
        _h32u(p0_3l).bitwiseAND(t0)
        .bitwiseOR(_h32u(p1_3l).bitwiseAND(t1))
        .bitwiseOR(_h32u(p2_raw).bitwiseAND(t2))
    )

    u = (
        F.when(i1 == 0, _h32u(s))
        .when(tri, h3l)
        .otherwise(h2l)
    )
    return F.when(u >= (1 << 31), u - _RING).otherwise(u)


def key_hash_range(route_key: str) -> HashRange:
    """keyHashRange (CompositeIdRouter.java:66-73): the ring slice a
    `_route_` key covers — a point for a plain id, [h0&m0,
    h0&m0 | ~m0] for `tenant!` / `tenant/N!`.  Driver-side: route
    keys are request parameters, never data."""
    if "!" not in route_key:
        h = _py_h32(route_key)
        h = h - _RING if h >= (1 << 31) else h
        return HashRange(h, h)
    first, tail = route_key.split("!", 1)
    if "!" in tail:
        # tri-level `a!b!` route keys use the 8/8 mask pair
        # (getRange:255-258); not wired up — fail loudly rather than
        # return a silently-wrong slice set
        raise NotImplementedError(
            "tri-level _route_ keys are not supported; "
            "use a 2-level 'tenant!' key"
        )
    bits = 16
    if "/" in first[1:]:
        head, spec = first.split("/", 1)
        if spec.isdigit() and int(spec) <= 32:
            first, bits = head, int(spec)
    m0 = 0 if bits == 0 else ((_U32 << (32 - bits)) & _U32)
    lo_u = _py_h32(first) & m0
    hi_u = lo_u | (m0 ^ _U32)
    if m0 == 0:
        return HashRange(_MIN, _MAX)
    lo = lo_u - _RING if lo_u >= (1 << 31) else lo_u
    hi = hi_u - _RING if hi_u >= (1 << 31) else hi_u
    return HashRange(lo, hi)


def _py_h32(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def search_slices(
    ranges: dict[str, HashRange], route_key: str | None
) -> list[str]:
    """getSearchSlicesSingle (CompositeIdRouter.java:76-100): the shard
    subset a `_route_`-scoped query must touch — every shard whose
    range overlaps the key's hash range (all shards when no key).  The
    100-TB payoff of composite ids: a tenant-scoped query fans out to
    ceil(2^(32-bits) / shard_width) shards, not the whole collection."""
    if route_key is None:
        return list(ranges)
    kr = key_hash_range(route_key)
    return [
        name
        for name, r in ranges.items()
        if r.lo <= kr.hi and kr.lo <= r.hi
    ]


def composite_route(
    df: DataFrame, num_shards: int, id_col: str
) -> tuple[DataFrame, dict[str, HashRange]]:
    """route() with CompositeId `tenant!doc` hashing — tenant locality
    plus ring layout in one scan (HashBasedRouter.getTargetSlice over
    KeyParser.getHash).  A tenant-scoped query then touches only
    search_slices(ranges, 'tenant!') shards."""
    ranges = {
        f"shard{i + 1}": r
        for i, r in enumerate(collection_ranges(num_shards))
    }
    out = df.withColumn("_rh", composite_route_hash(id_col)).withColumn(
        "shard", _range_expr(ranges)
    )
    return out, ranges
