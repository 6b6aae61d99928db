"""CompositeId routing (CompositeIdRouter.java KeyParser:178-325),
with a line-faithful Python port of KeyParser as the oracle for the
column-expression hash."""

import hashlib

import pytest

from lucene_solr_spark.index.shards import (
    HashRange,
    collection_ranges,
    composite_route_hash,
    key_hash_range,
    search_slices,
)

U32 = (1 << 32) - 1
RING = 1 << 32


def h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def keyparser_hash(key: str) -> int:
    """Literal port of sliceHash + KeyParser (CompositeIdRouter.java:
    45-57,178-323) with the md5-32 stand-in hash; returns the SIGNED
    hash.  A separator-free id never enters KeyParser — it hashes
    whole (sliceHash:53-55)."""
    if "!" not in key:
        u = h32(key)
        return u - RING if u >= (1 << 31) else u
    parts = []
    i1 = key.find("!")
    if i1 == -1:
        parts.append(key)
    else:
        parts.append(key[:i1])
        last = len(key) - 1
        if i1 < last:
            i2 = key.find("!", i1 + 1)
            if i2 == -1:
                parts.append(key[i1 + 1:])
            elif i2 == last:
                if i1 < i2 - 1:
                    parts.append(key[i1 + 1:i2])
            else:
                parts.append(key[i1 + 1:i2])
                parts.append(key[i2 + 1:])
    pieces = len(parts)
    num_bits = [0, 0]
    if key.endswith("!") and pieces < 3:
        pieces += 1
    if pieces == 3:
        num_bits[0] = 8
        num_bits[1] = 8
        tri = True
    else:
        num_bits[0] = 16
        tri = False
    hashes = []
    for i in range(pieces):
        if i < pieces - 1 and i < len(parts):
            ci = parts[i].find("/")
            if ci > 0:
                spec = parts[i][ci + 1:]
                if spec == "":
                    v = 0  # getNumBits: empty digit loop → 0
                else:
                    v = int(spec) if spec.isdigit() and int(spec) <= 32 else -1
                if v >= 0:  # our documented divergence: bad spec → default
                    num_bits[i] = v
                parts[i] = parts[i][:ci]
        hashes.append(h32(parts[i]) if i < len(parts) else h32(""))
    if tri:
        m0 = 0 if num_bits[0] == 0 else (U32 << (32 - num_bits[0])) & U32
        s01 = num_bits[0] + num_bits[1]
        m01 = 0 if s01 == 0 else (U32 << (32 - s01)) & U32
        m1 = m0 ^ m01
        m2 = m01 ^ U32
        masks = [m0, m1, m2]
    else:
        m0 = 0 if num_bits[0] == 0 else (U32 << (32 - num_bits[0])) & U32
        masks = [m0, m0 ^ U32]
    u = hashes[0] & masks[0]
    for i in range(1, pieces):
        u |= hashes[i] & masks[i]
    return u - RING if u >= (1 << 31) else u


TRICKY = [
    "plain",
    "with/slash",
    "tenant!doc1",
    "tenant!",
    "a!!",
    "a!b!",
    "a!b!c",
    "a!b!c!d",
    "a/4!b",
    "a/0!b",
    "a/32!b",
    "a!b/8!c",
    "a/2!b/4!c",
    "x!y",
    "",
]


def test_column_hash_matches_keyparser_port(spark):
    df = spark.createDataFrame([(k,) for k in TRICKY], "id string")
    got = {
        r["id"]: r["h"]
        for r in df.select(
            "id", composite_route_hash("id").alias("h")
        ).collect()
    }
    for k in TRICKY:
        assert got[k] == keyparser_hash(k), k


def test_tenant_locality(spark):
    """Every `tenant!doc` hash lands inside keyHashRange('tenant!')."""
    rows = [(f"acme!{i}",) for i in range(200)] + [
        (f"globex/4!{i}",) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id string")
    hs = [
        (r["id"], r["h"])
        for r in df.select("id", composite_route_hash("id").alias("h")).collect()
    ]
    acme = key_hash_range("acme!")
    glob = key_hash_range("globex/4!")
    for i, h in hs:
        r = acme if i.startswith("acme") else glob
        assert r.lo <= h <= r.hi, (i, h, r)
    # /4 leaves a 2^28-wide slice; default 16 bits a 2^16 one
    assert glob.hi - glob.lo == (1 << 28) - 1
    assert acme.hi - acme.lo == (1 << 16) - 1


def test_search_slices_subset():
    ranges = {
        f"shard{i+1}": r for i, r in enumerate(collection_ranges(4))
    }
    hit = search_slices(ranges, "acme!")
    assert len(hit) == 1  # 2^16 slice always fits one 2^30 shard
    kr = key_hash_range("acme!")
    r = ranges[hit[0]]
    assert r.lo <= kr.lo and kr.hi <= r.hi
    assert search_slices(ranges, None) == list(ranges)
    # a /1 key spans half the ring → exactly 2 of 4 shards
    assert len(search_slices(ranges, "acme/1!")) == 2
    # /0 = whole ring
    assert len(search_slices(ranges, "acme/0!")) == 4


def test_plain_id_point_range():
    kr = key_hash_range("doc42")
    assert kr.lo == kr.hi == keyparser_hash("doc42")


def test_trilevel_route_key_fails_loudly():
    with pytest.raises(NotImplementedError):
        key_hash_range("a!b!")


def test_column_hash_matches_port_on_random_keys(spark):
    """Randomized cross-check of the column expression vs the
    KeyParser port: random alphabets including '!', '/', digits and
    empty parts."""
    import random

    rng = random.Random(11)
    alphabet = "ab!/!3"
    keys = set()
    for _ in range(300):
        keys.add("".join(rng.choice(alphabet) for _ in range(rng.randint(1, 10))))
    keys = sorted(keys)
    df = spark.createDataFrame([(k,) for k in keys], "id string")
    got = {
        r["id"]: r["h"]
        for r in df.select(
            "id", composite_route_hash("id").alias("h")
        ).collect()
    }
    bad = [(k, got[k], keyparser_hash(k)) for k in keys if got[k] != keyparser_hash(k)]
    assert not bad, bad[:5]
