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
filesystems (the sandbox and most HDFS-mounted edge cases). For an
object store without atomic rename (raw S3), the module offers a
second, **versioned** write protocol (round 11, verdict r10 #5) that
never renames:

- every logical record ``<name>.json`` (or the bare ``_COMMIT``
  marker) is written as a fresh write-once file
  ``<name>.v<N>.json`` with a trailing ``"eof": true`` sentinel,
  fsynced, then its directory fsynced;
- readers resolve a logical record to the HIGHEST version whose JSON
  parses completely and carries the sentinel — a torn write (partial
  PUT on a weak store, power loss mid-write) fails the parse and the
  reader falls back to the previous version, or to the
  rename-committed plain file if one exists (mixed-history indexes
  migrate in place);
- "commit" is therefore the completed appearance of a new immutable
  object — the exact primitive object stores do guarantee — and
  replays simply stack another version of the same record (readers
  take the max, so replay stays idempotent).

Select it per index root with :func:`use_versioned_commits` (which
drops a ``_PROTOCOL_VERSIONED`` hint file so other writer processes
inherit the choice) or globally with
``MORPHL_VERSIONED_COMMITS=1``. Readers need no selection: every
read path accepts both record forms unconditionally.
"""

from __future__ import annotations

import json
import os
import re
import tempfile

COMMIT_MARKER = "_COMMIT"
MANIFEST_DIR = "manifest"
PROTOCOL_MARKER = "_PROTOCOL_VERSIONED"

_VERSION_RE = re.compile(r"^(?P<stem>.+)\.v(?P<n>\d+)\.json$")

# roots opted into versioned commits in THIS process (the on-disk
# hint file extends the choice to other processes)
_VERSIONED_ROOTS: set[str] = set()


def use_versioned_commits(root: str) -> None:
    """Opt the index at ``root`` into the versioned (rename-free)
    commit protocol for every subsequent write. Persists the choice as
    a hint file so writers in other processes follow it; the hint is
    itself written versioned-style (write-once + fsync, no rename)."""
    os.makedirs(root, exist_ok=True)
    _VERSIONED_ROOTS.add(os.path.abspath(root))
    hint = os.path.join(root, PROTOCOL_MARKER)
    if not os.path.exists(hint):
        with open(hint, "w") as f:
            f.write("versioned\n")
            f.flush()
            os.fsync(f.fileno())
        fsync_dir(root)


def is_versioned(root: str) -> bool:
    return (
        os.environ.get("MORPHL_VERSIONED_COMMITS") == "1"
        or os.path.abspath(root) in _VERSIONED_ROOTS
        or os.path.exists(os.path.join(root, PROTOCOL_MARKER))
    )


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


def fsync_dir(d: str) -> None:
    """fsync ONE directory's own entries (the dirents binding its
    children). Parent-dir coverage for fsync_tree: a child subtree can
    be fully durable while the dirent binding it into its parent rolls
    back on power loss — callers fsync the parent too."""
    fd = os.open(d, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


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


def _record_stem(final_path: str) -> str:
    """Versioned-file stem of a logical record path: ``x.json`` and
    the extensionless ``_COMMIT`` marker both version as
    ``<stem>.v<N>.json``."""
    return final_path[:-5] if final_path.endswith(".json") else final_path


def _versioned_paths(final_path: str) -> list[tuple[int, str]]:
    """Existing versioned files for a logical record, newest first.
    Torn files are included (the READER validates; the WRITER must
    count them so a crashed write's version number is never reused)."""
    stem = _record_stem(final_path)
    d, base = os.path.dirname(stem), os.path.basename(stem)
    if not os.path.isdir(d):
        return []
    out = []
    pat = re.compile(rf"^{re.escape(base)}\.v(\d+)\.json$")
    for name in os.listdir(d):
        m = pat.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(d, name)))
    out.sort(reverse=True)
    return out


def newest_record_path(final_path: str) -> str | None:
    """Stat-only resolution of a logical record to its newest physical
    file (highest version, else the plain rename-committed file).
    Cheap identity token for caches — does NOT validate the file;
    pair with :func:`read_json_record` for the payload."""
    vs = _versioned_paths(final_path)
    if vs:
        return vs[0][1]
    return final_path if os.path.exists(final_path) else None


def read_json_record(final_path: str) -> dict | None:
    """The newest FULLY-WRITTEN payload of a logical record, or None.
    Versioned candidates are tried newest-first; one that fails to
    parse or lacks the ``eof`` sentinel is a torn write and the reader
    falls back (eventually to the plain rename-committed file, which
    is complete by construction). The sentinel is stripped."""
    for _, p in _versioned_paths(final_path):
        try:
            with open(p) as f:
                payload = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        if payload.pop("eof", None) is True:
            return payload
    if os.path.exists(final_path):
        with open(final_path) as f:
            return json.load(f)
    return None


def write_json_record(final_path: str, payload: dict, root: str) -> None:
    """Commit one logical JSON record under the protocol selected for
    ``root``: rename-as-commit by default, write-once versioned file
    when the root opted in (object-store mode — no rename anywhere on
    the path). The versioned write becomes visible exactly when its
    complete content (terminating in the ``eof`` sentinel) is
    readable; a crash mid-write leaves a torn candidate every reader
    skips, and the next write takes the next version number."""
    if not is_versioned(root):
        _atomic_write_json(final_path, payload)
        return
    vs = _versioned_paths(final_path)
    n = (vs[0][0] + 1) if vs else 1
    p = f"{_record_stem(final_path)}.v{n}.json"
    d = os.path.dirname(p)
    os.makedirs(d, exist_ok=True)
    with open(p, "w") as f:
        json.dump({**payload, "eof": True}, f)
        f.flush()
        os.fsync(f.fileno())
    fsync_dir(d)


def delete_record(final_path: str) -> None:
    """Remove every physical file of a logical record (plain + all
    versions) — GC, not correctness (readers already ignore replaced
    / superseded files)."""
    for _, p in _versioned_paths(final_path):
        try:
            os.unlink(p)
        except FileNotFoundError:
            pass
    if os.path.exists(final_path):
        os.unlink(final_path)


def record_file_exists(final_path: str) -> bool:
    """True if ANY physical file (even a torn version) of the logical
    record remains — the ghost test GC sweeps care about."""
    return bool(_versioned_paths(final_path)) or os.path.exists(final_path)


def _manifest_record_sids(mdir: str) -> set[str]:
    """Distinct logical sids present in a manifest dir, across both
    record forms (plain ``<sid>.json`` and ``<sid>.v<N>.json``)."""
    if not os.path.isdir(mdir):
        return set()
    sids = set()
    for name in os.listdir(mdir):
        if not name.endswith(".json") or name.startswith("._"):
            continue
        m = _VERSION_RE.match(name)
        sids.add(m.group("stem") if m else name[:-5])
    return sids


def list_record_sids(path: str) -> set[str]:
    """Distinct logical sids with any manifest file at the index —
    live, tombstoned, or torn (writer-side sid-uniqueness set)."""
    return _manifest_record_sids(os.path.join(path, MANIFEST_DIR))


def write_commit(path: str, payload: dict | None = None) -> None:
    """Commit a build-once index at ``path`` (write this LAST —
    callers fsync_tree the data first if they need power-loss
    atomicity, not just crash atomicity)."""
    write_json_record(os.path.join(path, COMMIT_MARKER), payload or {}, root=path)


def clear_commit(path: str) -> None:
    """Remove a stale commit marker BEFORE a rebuild overwrites the
    tables (round-9 review): without this, a crash mid-rebuild leaves
    the OLD marker beside a new/old table mix and require_commit
    would serve the torn state."""
    delete_record(os.path.join(path, COMMIT_MARKER))


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
    return read_json_record(os.path.join(path, COMMIT_MARKER))


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
    re-writes the same manifest file atomically (rename mode) or
    stacks a newer version readers resolve to (versioned mode)."""
    write_json_record(
        os.path.join(path, MANIFEST_DIR, f"{sid}.json"),
        {"sid": sid, **payload},
        root=path,
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
    recs = []
    for sid in sorted(_manifest_record_sids(d)):
        rec = read_json_record(os.path.join(d, f"{sid}.json"))
        if rec is not None:  # all-torn versioned record = uncommitted
            recs.append(rec)
    replaced = {s for r in recs for s in r.get("replaces", [])}
    return [r for r in recs if r["sid"] not in replaced]
