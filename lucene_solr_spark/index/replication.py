"""Index replication — master/replica segment sync + snapshots.

Reference surfaces:
- solr/core/src/java/org/apache/solr/handler/ReplicationHandler.java
  (the master side: publish (indexversion, generation) + the commit
  point's file list with sizes/checksums; CMD_BACKUP snapshots).
- solr/core/src/java/org/apache/solr/handler/IndexFetcher.java
  (the slave side: compare generations, download ONLY files whose
  name/size/checksum differ from the local copy, stage into a temp
  dir, then move into place and reload; stale files not in the new
  commit point are removed by the deletion policy).

Spark-first restatement: a commit point here is the per-segment JSON
manifest set (SegmentedIndex), and a "file" is a whole segment — the
atomic replication unit — identified by (segment id, generation) and
verified by total byte size.  ``fetch_index`` copies only segments the
replica is missing or holds a stale/size-mismatched copy of, stages
each under a dot-temp name and renames into place (the same
crash-safety protocol the builder's manifest commit uses), deletes
replica segments absent from the master's commit point, and installs
the manifest LAST — a replica killed mid-sync re-syncs exactly the
segments without a matching manifest row.  At scale this is rsync
semantics over segment directories: a merge that rewrote 3 of 800
segments ships 3 segments, not the index.
"""

from __future__ import annotations

import os
import shutil

from lucene_solr_spark.index.segments import SegmentedIndex

_SUBDIRS = ("data",)  # SegmentedIndex._data_dir: one dir per segment
# holds the encoded block rows (postings AND norm payloads ride in the
# same block rows — see the WAND norms-in-block design)


def _seg_dirs(path: str, seg: int) -> list[str]:
    return [os.path.join(path, d, f"segment={seg}") for d in _SUBDIRS]


def _seg_bytes(path: str, seg: int) -> int:
    """Total on-disk bytes of one segment's data dirs (IndexFetcher's
    per-file size comparison, rolled up to the segment unit)."""
    total = 0
    for d in _seg_dirs(path, seg):
        if not os.path.isdir(d):
            return -1
        for root, _dirs, files in os.walk(d):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if not f.startswith(".") and not f.startswith("_")
            )
    return total


def _copy_segment(src: str, dst: str, seg: int) -> int:
    """Stage-then-rename copy of one segment's dirs; returns bytes.
    (IndexFetcher downloads into tmpIndexDir then moves —
    IndexFetcher.java fetchLatestIndex's tmp-dir protocol.)"""
    for sub in _SUBDIRS:
        s = os.path.join(src, sub, f"segment={seg}")
        d = os.path.join(dst, sub, f"segment={seg}")
        tmp = os.path.join(dst, sub, f".segment={seg}.tmp")
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        shutil.copytree(s, tmp)
        if os.path.isdir(d):
            shutil.rmtree(d)
        os.replace(tmp, d)
    return _seg_bytes(dst, seg)


def fetch_index(master: SegmentedIndex, replica: SegmentedIndex) -> dict:
    """One replication poll (IndexFetcher.fetchLatestIndex).

    Returns a report: {fetched: [seg...], skipped: [...], deleted:
    [...], bytes_fetched: n, generation: max-gen}.  Identical commit
    points are a no-op (the slave's indexversion == master's —
    ReplicationHandler returns no files).
    """
    m_man = master.manifest()
    r_man = replica.manifest()
    fetched, skipped, deleted = [], [], []
    bytes_fetched = 0

    for seg, info in sorted(m_man.items()):
        mine = r_man.get(seg)
        same_meta = (
            mine is not None
            and mine.generation == info.generation
            and mine.num_docs == info.num_docs
            and mine.num_blocks == info.num_blocks
        )
        # size check even when metadata agrees — a truncated/partial
        # prior download must re-fetch (IndexFetcher compares local
        # file size before skipping)
        if same_meta and _seg_bytes(replica.path, seg) == _seg_bytes(
            master.path, seg
        ):
            skipped.append(seg)
            continue
        bytes_fetched += _copy_segment(master.path, replica.path, seg)
        replica._commit(info)
        fetched.append(seg)

    # segments not in the master's commit point are stale (retired by
    # a merge) — the deletion policy removes them on index reload
    for seg in sorted(set(r_man) - set(m_man)):
        replica._drop_manifest(seg)
        for d in _seg_dirs(replica.path, seg):
            if os.path.isdir(d):
                shutil.rmtree(d)
        deleted.append(seg)

    gen = max((i.generation for i in m_man.values()), default=0)
    return {
        "fetched": fetched,
        "skipped": skipped,
        "deleted": deleted,
        "bytes_fetched": bytes_fetched,
        "generation": gen,
    }


def snapshot(index: SegmentedIndex, backup_dir: str) -> dict:
    """CMD_BACKUP: copy the current commit point (manifest + its
    segments) into ``backup_dir`` (ReplicationHandler.doSnapShoot /
    SnapShooter.java — snapshot = the commit's file set, taken while
    the index stays live; our manifest-last ordering gives the same
    consistency: data first, manifest only after)."""
    man = index.manifest()
    dst = SegmentedIndex(index.spark, backup_dir)
    for seg, info in sorted(man.items()):
        _copy_segment(index.path, backup_dir, seg)
        dst._commit(info)
    return {"segments": sorted(man), "path": backup_dir}


def restore(backup_dir: str, target: SegmentedIndex) -> dict:
    """CMD_RESTORE: make ``target`` the snapshot's commit point
    (restore = a fetch_index from the snapshot as master)."""
    src = SegmentedIndex(target.spark, backup_dir)
    return fetch_index(src, target)
