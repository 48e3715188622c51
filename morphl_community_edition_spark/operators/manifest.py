"""Rename-as-commit manifests for the persisted index family
(round 9, verdict r8 #7).

The three persisted indexes (dedup postings q134, ANN cells q150,
BM25 buckets q151) previously hand-rolled exactly-once with meta
watermarks plus duplicate-tolerant reads — correct, but a crash
inside a multi-table write left a torn directory that only stayed
harmless because every reader deduped defensively. This module gives
them an atomic commit protocol instead, in the smallest shape that
is actually atomic on a POSIX filesystem:

- **Build-once indexes** (ANN, BM25): all tables are written, then a
  single ``_COMMIT`` JSON marker is written via temp-file +
  ``os.replace`` — rename is atomic, so the marker either exists
  complete or not at all. Readers ``require_commit`` first: a torn
  build (crash before the rename) is REJECTED loudly instead of
  served partially.
- **Append-maintained indexes** (the dedup index): each fold writes
  its slice under ``<table>/<slice_id>/`` (mode=overwrite, so a
  replay of the same slice id rewrites it wholesale), then commits
  ONE ``manifest/<slice_id>.json`` via the same rename. Readers
  assemble every table from the COMMITTED slices only — an
  uncommitted (crashed) fold is invisible by construction, which is
  what makes replay classification byte-identical without read-side
  dedup. The fold's meta (doc count delta, batch watermark, checkpoint
  tag) rides INSIDE the commit record, so "tables appended but
  watermark not advanced" — the round-8 crash window — cannot exist:
  the fold is one atomic event.

Scope note: ``os.replace`` atomicity holds for local/POSIX and NFS
filesystems (the sandbox and most HDFS-mounted edge cases). An object
store without atomic rename (raw S3) needs a real table format
(Delta/Iceberg-style log) — documented limitation, same line every
manifest-file protocol draws.
"""

from __future__ import annotations

import json
import os
import tempfile

COMMIT_MARKER = "_COMMIT"
MANIFEST_DIR = "manifest"


def _atomic_write_json(final_path: str, payload: dict) -> None:
    d = os.path.dirname(final_path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix="._commit-")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final_path)  # the commit point
        # fsync the DIRECTORY too (round-10 advice): without it, a
        # power loss after the rename can roll the dirent back even
        # though the caller — e.g. streaming_dedup_ingest, whose
        # checkpoint advances right after this returns — believes the
        # commit is durable; the batch would then be permanently
        # skipped (watermark lives in the lost record, the replay
        # guard never re-folds it). POSIX-scoped like the rename
        # itself (module scope note).
        dfd = os.open(d, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def fsync_tree(root: str) -> None:
    """fsync every file and directory under ``root`` (bottom-up).

    The commit rename only proves the MANIFEST durable; the slice
    data Spark just wrote has no durability of its own (parquet
    writers don't fsync local files), so without this a power loss
    after commit could persist the commit record while the data
    dirents roll back — the reader would then raise "committed slice
    dir missing" forever and the batch could never be re-folded
    (round-10 review: the durable-manifest/volatile-data inversion is
    strictly worse than the skip it was meant to fix). Callers fsync
    each slice tree BEFORE committing it. Cost: one open+fsync per
    file, a handful per fold. POSIX-scoped like the rename."""
    for dirpath, _dirnames, filenames in os.walk(root, topdown=False):
        for name in filenames:
            try:
                fd = os.open(os.path.join(dirpath, name), os.O_RDONLY)
            except FileNotFoundError:
                continue
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
        fd = os.open(dirpath, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)


def write_commit(path: str, payload: dict | None = None) -> None:
    """Commit a build-once index at ``path`` (write this LAST —
    callers fsync_tree the data first if they need power-loss
    atomicity, not just crash atomicity)."""
    _atomic_write_json(os.path.join(path, COMMIT_MARKER), payload or {})


def clear_commit(path: str) -> None:
    """Remove a stale commit marker BEFORE a rebuild overwrites the
    tables (round-9 review): without this, a crash mid-rebuild leaves
    the OLD marker beside a new/old table mix and require_commit
    would serve the torn state."""
    p = os.path.join(path, COMMIT_MARKER)
    if os.path.exists(p):
        os.unlink(p)


def clear_slices(path: str) -> None:
    """Remove every committed-slice manifest AND slice table dir —
    the rebuild analogue of mode=overwrite for append-maintained
    indexes (round-9 review: a rebuild at a previously-fed path
    otherwise MERGES stale slices into the new index). Manifests go
    first, so a crash mid-wipe leaves an index with no committed
    slices — readers fail loudly instead of reading a mix."""
    import shutil

    d = os.path.join(path, MANIFEST_DIR)
    if os.path.isdir(d):
        shutil.rmtree(d)
    if os.path.isdir(path):
        for sub in os.listdir(path):
            full = os.path.join(path, sub)
            if os.path.isdir(full):
                shutil.rmtree(full)


def read_commit(path: str) -> dict | None:
    """The commit payload of a build-once index, or None if the index
    was never committed (possibly torn)."""
    p = os.path.join(path, COMMIT_MARKER)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def require_commit(path: str, what: str) -> dict:
    c = read_commit(path)
    if c is None:
        raise RuntimeError(
            f"{what} at {path} has no {COMMIT_MARKER} marker — the build "
            "never completed (torn write) or the path is wrong; rebuild "
            "the index"
        )
    return c


def commit_slice(path: str, sid: str, payload: dict) -> None:
    """Commit one slice of an append-maintained index (write LAST,
    after every slice table landed). Idempotent per sid: a replay
    re-writes the same manifest file atomically."""
    _atomic_write_json(
        os.path.join(path, MANIFEST_DIR, f"{sid}.json"), {"sid": sid, **payload}
    )


def committed_slices(path: str) -> list[dict]:
    """All committed LIVE slice records, sid-sorted (build slice first
    by naming convention). Uncommitted slice directories are invisible
    — that is the point. A record may carry ``replaces: [sids...]``
    (written by compaction, round 10): every sid so listed is ignored
    even if its manifest still exists, which makes the compacted
    record's single rename the atomic cut-over — the old manifests'
    deletion afterwards is garbage collection, not correctness."""
    d = os.path.join(path, MANIFEST_DIR)
    if not os.path.isdir(d):
        return []
    recs = []
    for name in sorted(os.listdir(d)):
        if not name.endswith(".json") or name.startswith("._"):
            continue
        with open(os.path.join(d, name)) as f:
            recs.append(json.load(f))
    replaced = {s for r in recs for s in r.get("replaces", [])}
    return [r for r in recs if r["sid"] not in replaced]
