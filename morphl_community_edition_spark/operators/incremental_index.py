"""Persisted dedup postings index (A5 × K1 composition, round 7):
the PRODUCTION form of q114's incremental-ingest dedup.

The round-7 decomposition (SCALE.md, tools/profile_q114.py) named
q114's irreducible per-batch term: the corpus-wide shingle
explode+distinct (2.24 s of its 3.44 s at sf0.1), re-derived 14×
across the plan's branches — the one cost that grows with the corpus
no matter how small the batch is. A continuously-fed pipeline does
not re-shingle 100 TB per batch; it maintains an inverted index.
This module is that index:

- ``build_dedup_index(docs, path)`` — one corpus pass writes the
  committed ``base`` slice of four parquet tables under ``path``:
  ``postings`` (doc_id, s — the distinct 3-gram inverted file, the
  expensive explode paid ONCE), ``doc_stats`` (doc_id, n_sh_total),
  ``hashes`` (doc_id + content md5 for the exact tier),
  ``doc_batches`` (doc_id provenance for the reuse guard). At
  cluster scale the postings table would be bucketed by shingle;
  incremental maintenance folds each accepted batch as one committed
  SLICE — table dirs first, one atomic manifest rename last
  (operators/manifest.py, round 9), which carries the fold's meta
  (doc-count delta, batch watermark, checkpoint tag) so a crashed
  fold is invisible rather than duplicate-tolerated.
- ``incremental_dedup_with_index(spark, path, batch, n_docs)`` —
  classify a new batch exactly like q114, but every corpus-side
  input comes from the index: per-batch work is batch-shingling (the
  batch is small by definition) + index probes that are
  batch-bounded (postings semi-joined to the broadcast batch-shingle
  set) — no text decode, no corpus explode.

Semantics are EQUAL to incremental_dedup_frame by construction, and
asserted row-for-row by the suite: the df-valve counts batch +
existing contributions separately (q114's df includes the batch's
own occurrences); valved sizes for existing docs are
``n_sh_total − |doc's shingles ∩ stop|`` where the correction join
is stop-bounded; the Jaccard/near/exact tiers are shared shapes.

Measured at sf0.1 (tools/measure_indexed.py): see SCALE.md round 7 —
the per-batch cost with the index approaches the batch-bounded tail
of the decomposition, which is the point.
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morphl_community_edition_spark.operators import manifest
from morphl_community_edition_spark.operators.dedup import (
    INCR_NEAR_THRESHOLD,
    INCR_VALVE_FRAC,
    INCR_VALVE_MIN_DF,
    resolve_doc_freq_limit,
    word_shingles,
)

SHINGLE_N = 3

# Per-slice doc_id Bloom sidecars (round-10 advice): the reuse guard
# previously scanned the UNION of every committed doc_batches slice on
# every micro-batch — an O(total-indexed-docs) join plus one parquet
# dir listing per slice per batch, growing without bound over a
# long-lived stream. Each fold now also records a Bloom filter of its
# slice's doc_ids (built by a Spark bit_or aggregation — no driver
# pass over the docs), and the guard probes batch ids against the
# sidecars first: only slices with at least one POSSIBLE member get
# the exact parquet probe. In normal operation (no reuse) that set is
# empty, so the steady-state cost is one batch-sized hash pass plus
# slice-count-sized driver JSON reads — independent of corpus size.
BLOOM_K = 4
BLOOM_MIN_BITS = 1 << 14  # 2 KiB floor — tiny slices stay tiny
BLOOM_MAX_BITS = 1 << 23  # 1 MiB cap ≈ 500k docs at ~1% fp; beyond
#                           that the filter saturates GRACEFULLY (more
#                           exact probes, never a missed reuse)


def _bloom_m_bits(n: int) -> int:
    m = BLOOM_MIN_BITS
    while m < 16 * max(n, 1) and m < BLOOM_MAX_BITS:
        m <<= 1
    return m


def _bloom_path(path: str, sid: str) -> str:
    # own dir, NOT manifest/ — committed_slices() globs manifest/*.json
    return os.path.join(path, "blooms", f"{sid}.json")


def _hash_cols():
    """(h1, h2) Kirsch–Mitzenmacher double-hash bases from ONE
    xxhash64 of doc_id — position i is (h1 + i·h2) mod m for ANY m, so
    the numpy probe side can replay the arithmetic exactly (both
    operands < 2^32, so no overflow and pmod == %). shiftRIGHTunsigned
    keeps the Spark side sign-free like the numpy uint64 view."""
    h = F.xxhash64("doc_id")
    h1 = h.bitwiseAND(F.lit(4294967295))
    h2 = F.shiftrightunsigned(h, 32).bitwiseAND(F.lit(4294967295)).bitwiseOR(F.lit(1))
    return h1, h2


def _write_slice_bloom(docs: DataFrame, path: str, sid: str, n: int) -> None:
    """Bloom of the slice's doc_ids -> blooms/<sid>.json (atomic
    write, BEFORE the manifest commit — an uncommitted slice's bloom
    is never consulted, a committed slice always has one). The bitset
    is aggregated in Spark (explode k positions -> word/bit -> bit_or
    per word) and only the ≤ m/64 ≤ 128k set words reach the driver."""
    import base64

    import numpy as np

    m = _bloom_m_bits(n)
    h1, h2 = _hash_cols()
    poss = F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(BLOOM_K)]
    )
    words = (
        docs.select(F.explode(poss).alias("p"))
        .select(
            F.expr("p DIV 64").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .collect()
    )
    arr = np.zeros(m // 64, dtype=np.int64)
    for r in words:
        arr[r["w"]] = r["bits"]
    manifest.write_json_record(
        _bloom_path(path, sid),
        {
            "m": m,
            "k": BLOOM_K,
            "n": int(n),
            # xxhash64 is TYPE-sensitive (xxhash64('42') != xxhash64(42L))
            # while the exact join applies implicit casts — record the
            # indexed doc_id type so a type-drifted batch falls back to
            # the exact probe instead of silently screening everything
            # out (round-10 review)
            "dtype": docs.schema["doc_id"].dataType.simpleString(),
            "words": base64.b64encode(arr.tobytes()).decode(),
        },
        root=path,
    )


def _slice_bloom_from_written(spark: SparkSession, path: str, sid: str) -> int:
    """Write the slice's Bloom sidecar from the PERSISTED
    ``doc_batches/<sid>`` slice (round-11 advice) and return its doc
    count. Building the bloom from a second evaluation of the caller's
    input frame risked sidecar/slice divergence when that frame is
    nondeterministic across evaluations (sample/limit upstream) — a
    bloom false negative would then silently skip the exact reuse
    probe. Reading back the just-written slice makes the sidecar and
    the exact-probe table definitionally the same doc_id set (the same
    device compact_index already uses), and sourcing ``n_docs`` from
    the same read keeps the valve denominator consistent too."""
    written = spark.read.parquet(os.path.join(path, "doc_batches", sid)).select(
        "doc_id"
    )
    n = int(written.count())
    _write_slice_bloom(written, path, sid, n)
    return n


# (path mtime+size)-keyed parse cache: sidecars are immutable once
# committed, but a REBUILD at the same path reuses sids ("base",
# batch ids restart) — the stat key invalidates those, while a
# long-lived stream stops re-reading + re-decoding every historical
# bloom on every micro-batch (round-10 review). LRU-bounded
# (round-11 advice): stat-key supersession only evicts entries for a
# path that is RE-read, so sidecars of deleted indexes (tmp test
# roots, rebuilt paths, other index roots a long-lived driver served
# once) otherwise accumulate forever at up to ~1 MiB decoded each.
# 256 entries ≈ 256 live slices before any re-decode — far above the
# compaction story's steady-state slice count — for ≤ ~256 MiB worst
# case, and an evicted entry costs one re-read, never correctness.
_BLOOM_CACHE_MAX = 256
_BLOOM_CACHE: OrderedDict = OrderedDict()


def _load_bloom(bp: str) -> dict | None:
    # resolve the LOGICAL sidecar path to its newest physical file —
    # under versioned commits (object-store mode) the bytes live in
    # ``<sid>.v<N>.json``; the stat identity keys the cache either way
    real = manifest.newest_record_path(bp)
    if real is None:
        return None
    try:
        st = os.stat(real)
    except FileNotFoundError:
        return None
    key = (bp, real, st.st_mtime_ns, st.st_size)
    hit = _BLOOM_CACHE.get(key)
    if hit is None:
        hit = manifest.read_json_record(bp)
        if hit is None:  # torn sidecar with no complete predecessor
            return None
        _BLOOM_CACHE[key] = hit
        # drop superseded entries for this path (rebuild invalidation)
        for k in [k for k in _BLOOM_CACHE if k[0] == bp and k != key]:
            del _BLOOM_CACHE[k]
        while len(_BLOOM_CACHE) > _BLOOM_CACHE_MAX:
            _BLOOM_CACHE.popitem(last=False)
    else:
        _BLOOM_CACHE.move_to_end(key)
    return hit


def _bloom_hit_sids(batch: DataFrame, blooms: list[tuple[str, dict]]) -> list[str]:
    """Slice sids whose Bloom POSSIBLY contains any batch doc_id — one
    mapInPandas pass over the batch (the sidecars ride into the task
    closure; at the 1 MiB cap that is ≤ slice-count MiB, bounded by
    the same compaction story as the manifest dir itself). A sid NOT
    returned definitely shares no doc_id with the batch — per shared
    element all k positions are set in the slice bloom, so the numpy
    all-k test cannot miss it (false positives only)."""
    import base64

    import numpy as np
    import pandas as pd

    metas = [
        (
            np.uint64(int(b["m"])),
            int(b["k"]),
            np.frombuffer(base64.b64decode(b["words"]), dtype=np.int64).view(np.uint64),
        )
        for _, b in blooms
    ]

    def probe(batches):
        hit: set[int] = set()
        u32 = np.uint64(0xFFFFFFFF)
        for pdf in batches:
            if not len(pdf):
                continue
            hv = pdf["h"].to_numpy().astype(np.int64).view(np.uint64)
            h1 = hv & u32
            h2 = ((hv >> np.uint64(32)) & u32) | np.uint64(1)
            for idx, (m, k, words) in enumerate(metas):
                if idx in hit:
                    continue
                member = np.ones(len(hv), dtype=bool)
                for i in range(k):
                    pos = (h1 + np.uint64(i) * h2) % m
                    w = pos >> np.uint64(6)
                    bit = pos & np.uint64(63)
                    member &= ((words[w] >> bit) & np.uint64(1)).astype(bool)
                    if not member.any():
                        break
                if member.any():
                    hit.add(idx)
        if hit:
            yield pd.DataFrame({"i": sorted(hit)})

    hits = (
        batch.select(F.xxhash64("doc_id").alias("h"))
        .mapInPandas(probe, "i int")
        .distinct()
        .collect()
    )
    return [blooms[r["i"]][0] for r in hits]


def _read_table_slices(
    spark: SparkSession, path: str, name: str, sids: list[str]
) -> DataFrame:
    dirs = [os.path.join(path, name, sid) for sid in sids]
    missing = [d for d in dirs if not os.path.isdir(d)]
    if missing:
        raise ValueError(
            f"index at {path} is corrupt: committed slice dir(s) missing "
            f"{missing[:3]} — the manifest promises data that is gone; "
            "rebuild the index"
        )
    return spark.read.parquet(*dirs)


INDEX_TABLES = ("postings", "doc_stats", "hashes", "doc_batches")


def _fsync_slice(path: str, sid: str) -> None:
    """Make one slice's parquet data durable BEFORE its manifest
    commits (round-10 review): Spark's local parquet writes are not
    fsynced, so committing first could persist the commit record
    across a power loss while the data dirents roll back — a
    permanently "corrupt" index whose batch the watermark forbids
    re-folding. With data-then-manifest fsync ordering, a power loss
    leaves either an uncommitted (invisible, replayable) slice or a
    fully durable one.

    Also fsyncs each PARENT table directory and the index root
    (round-11 advice): fsync_tree makes the slice's own subtree
    durable, but the dirent that binds ``<sid>`` into ``<table>/``
    lives in the parent — without fsyncing it, a power loss can keep
    the fsynced manifest record while the slice dir's binding rolls
    back, the same durable-manifest/volatile-data inversion this
    ordering exists to close. The root fsync covers first-build
    dirents (the table dirs themselves, ``blooms/``)."""
    for t in INDEX_TABLES:
        d = os.path.join(path, t, sid)
        if os.path.isdir(d):
            manifest.fsync_tree(d)
            manifest.fsync_dir(os.path.dirname(d))
    bd = os.path.dirname(_bloom_path(path, sid))
    if os.path.isdir(bd):
        manifest.fsync_dir(bd)
    manifest.fsync_dir(path)


def _shingle_rows(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, s): the distinct n-gram posting rows of each doc."""
    return word_shingles(docs, text_col, SHINGLE_N).select(
        "doc_id", F.explode("shingles").alias("s")
    )


def build_dedup_index(docs: DataFrame, path: str, text_col: str = "text") -> None:
    """One corpus pass -> the committed ``base`` slice of postings /
    doc_stats / hashes / doc_batches under ``path``. ``docs`` needs
    (doc_id, text). The slice's commit record holds the indexed
    DOCUMENT count (doc_stats only has rows for docs with ≥1 shingle,
    so it cannot stand in for corpus size — the valve is
    corpus-relative).

    Rebuild semantics: a build WIPES any previously committed slices
    first (round-9 review: the slice layout would otherwise MERGE a
    prior index's batches into the new one — stale postings, a wrong
    valve denominator, and a retained watermark that silently drops
    the new stream's batches). Manifests are removed before table
    dirs, so a crash mid-wipe fails loudly at read time instead of
    serving a mix."""
    manifest.clear_slices(path)
    _write_index_tables(docs, path, text_col, sid="base", batch_id=None)
    n = _slice_bloom_from_written(docs.sparkSession, path, "base")
    _fsync_slice(path, "base")
    manifest.commit_slice(
        path, "base", {"n_docs": int(n), "batch_id": None, "ckpt_tag": None}
    )


def _slice_sid(batch_id: int | None) -> str:
    """Slice id: deterministic per batch_id (so a partial-fold replay
    OVERWRITES its own crashed slice instead of appending beside it);
    protocol-free appends get a unique id (no replay concept)."""
    if batch_id is not None:
        return f"batch-{int(batch_id):012d}"
    import uuid

    return f"anon-{uuid.uuid4().hex[:16]}"


def _write_index_tables(
    docs: DataFrame, path: str, text_col: str, sid: str, batch_id: int | None
) -> None:
    """Write one SLICE of the four index tables under
    ``<table>/<sid>/`` (mode=overwrite — a replay of the same sid
    rewrites the slice wholesale). Nothing here is visible to readers
    until the caller commits the slice manifest (round 9): the
    round-8 design appended into shared table directories and relied
    on read-side dedup to survive a crash between the appends and the
    watermark advance; with slice-dirs + rename-as-commit that crash
    window cannot produce a readable torn state at all.

    doc_stats is derived by READING BACK the just-written postings
    slice, so the corpus shingle explode — the cost this module
    exists to amortize — runs exactly once per build/append instead
    of twice (round-7 review)."""
    sh = _shingle_rows(docs.select("doc_id", text_col), text_col)
    postings_dir = os.path.join(path, "postings", sid)
    sh.write.mode("overwrite").parquet(postings_dir)
    stats_src = docs.sparkSession.read.parquet(postings_dir)
    stats_src.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sh_total")
    ).write.mode("overwrite").parquet(os.path.join(path, "doc_stats", sid))
    # (doc_id, h), one row per doc — doc_id keyed so the exact-tier
    # probe can exclude the batch's own rows; the read side projects
    # distinct h AFTER that exclusion
    docs.select(
        "doc_id", F.md5(F.col(text_col).cast("binary")).alias("h")
    ).write.mode("overwrite").parquet(os.path.join(path, "hashes", sid))
    # (doc_id, batch_id) provenance — build-time docs carry NULL.
    # Exists so the ingest loop can fail loudly on doc_id REUSE
    # (round-9 advice): the replay exclusion assumes a doc_id appears
    # in at most one batch over the stream lifetime.
    docs.select("doc_id").withColumn(
        "batch_id",
        F.lit(None if batch_id is None else int(batch_id)).cast("long"),
    ).write.mode("overwrite").parquet(os.path.join(path, "doc_batches", sid))


def index_state(path: str) -> dict:
    """Aggregate state of the committed slices: total doc count,
    highest folded batch_id, checkpoint tag. Driver-side JSON reads —
    no Spark job (the manifest is slice-count-sized). A compacted
    slice carries the merged history's high-water batch_id in
    ``watermark`` (its own ``batch_id`` is None — it is not a fold,
    and the reuse guard's own-slice skip must never match it)."""
    return _state_of(manifest.committed_slices(path), path)


def _state_of(recs: list[dict], path: str) -> dict:
    """index_state over an ALREADY-READ slice-record list — so a
    caller that must act on one consistent manifest snapshot
    (compact_index, round-11 race fix) aggregates the same records it
    snapshotted instead of re-listing the manifest dir."""
    n_docs, last, tag = 0, None, None
    for rec in recs:
        n_docs += int(rec.get("n_docs", 0))
        for b in (rec.get("batch_id"), rec.get("watermark")):
            if b is not None and (last is None or b > last):
                last = int(b)
        t = rec.get("ckpt_tag")
        if t is not None:
            if tag is not None and t != tag:
                raise ValueError(
                    f"index at {path} holds slices from two checkpoint tags "
                    f"({tag} and {t}) — it was fed by two different streams"
                )
            tag = t
    return {"n_docs": n_docs, "last_batch_id": last, "ckpt_tag": tag}


def _read_table(spark: SparkSession, path: str, name: str) -> DataFrame:
    """Union of a table's COMMITTED slices. A crashed (uncommitted)
    fold's directory is never in the list — the atomicity story.
    A COMMITTED slice whose table dir is gone is corruption, not a
    skippable gap (round-9 review: silently dropping it would
    misclassify that slice's docs while index_state still counts
    them in the valve denominator) — _read_table_slices fails loudly."""
    sids = [rec["sid"] for rec in manifest.committed_slices(path)]
    if not sids:
        raise ValueError(
            f"index at {path} has no committed {name!r} slices — never "
            "built, or torn before the first commit"
        )
    return _read_table_slices(spark, path, name, sids)


def read_index_doc_count(spark: SparkSession, path: str) -> int:
    """Indexed-corpus document count (manifest-summed; ``spark`` kept
    for signature stability — the read is driver-side)."""
    return index_state(path)["n_docs"]


def read_index_last_batch_id(spark: SparkSession, path: str) -> int | None:
    """Highest streaming batch_id already folded into the index, or
    None for a fresh/batch-built index."""
    return index_state(path)["last_batch_id"]


def append_to_index(
    batch: DataFrame,
    path: str,
    text_col: str = "text",
    batch_id: int | None = None,
    meta=None,
    ckpt_tag: str | None = None,
) -> None:
    """Incremental index maintenance (the A5 append shape): fold an
    ACCEPTED batch into the index as one committed slice — the four
    table slices land under ``<table>/<sid>/``, then ONE manifest
    rename commits them together with the fold's meta (doc count
    delta, batch watermark, checkpoint tag). The fold is atomic
    (round 9): a crash anywhere before the rename leaves an invisible
    slice directory that the deterministic sid lets the replay
    overwrite; "tables appended but watermark not advanced" — the
    round-8 window that forced duplicate-tolerant reads — cannot
    exist.

    ``batch_id`` makes the fold IDEMPOTENT per batch (round-8 advice):
    when given, the manifest records the folded batch ids and a replay
    of an already-committed id is a no-op — foreachBatch is
    at-least-once, so a crash between a downstream commit and the
    checkpoint advance replays the batch. Spark's microbatch ids are
    monotonically increasing per checkpoint, so `<= last` detects a
    replay. Callers without a batch protocol (batch_id=None) keep the
    old contract: append each doc once, under a unique slice id.

    ``meta`` accepts a pre-read ``index_state(path)`` dict so the
    streaming handler's one-read-per-batch stays one read."""
    if meta is None:
        meta = index_state(path)
    last = meta.get("last_batch_id")
    if batch_id is not None and last is not None and batch_id <= last:
        return
    sid = _slice_sid(batch_id)
    _write_index_tables(batch, path, text_col, sid=sid, batch_id=batch_id)
    n = _slice_bloom_from_written(batch.sparkSession, path, sid)
    _fsync_slice(path, sid)
    # the commit point — everything above is invisible until this
    # rename lands, and the record carries the fold's meta with it
    manifest.commit_slice(
        path,
        sid,
        {
            "n_docs": n,
            "batch_id": None if batch_id is None else int(batch_id),
            "ckpt_tag": ckpt_tag,
        },
    )


def compact_index(spark: SparkSession, path: str) -> int:
    """Merge every committed slice into ONE (A5 maintenance, round 10)
    — the production answer to slice-count growth on a long-lived
    stream: per-batch manifest reads, bloom-closure size, and parquet
    file counts are all O(slices), and blooms only bounded the reuse
    probe's SCAN, not the slice census. Returns the number of slices
    merged away (0 = nothing to do).

    Semantics preserved exactly: the compacted slice is the row-union
    of the old slices for all four tables (doc-level ``batch_id``
    provenance included, so the reuse guard's row-level own-batch
    filter still works), its commit record carries the summed
    ``n_docs``, the checkpoint tag, and the history's high-water
    batch_id as ``watermark`` — index_state is identical before and
    after, so the replay guard and the valve denominator cannot drift.

    Crash safety rides the manifest protocol: the compacted record
    lists the sids it ``replaces``, and committed_slices ignores
    replaced sids the moment the compacted manifest's rename lands —
    ONE atomic cut-over, never a both-visible double-count window.
    Everything after the rename (deleting old manifests, blooms, and
    slice dirs) is garbage collection. Two tombstone invariants keep
    the mid-GC crash windows closed (round-10 review):

    - **Tombstones are carried forward**: the new record's
      ``replaces`` also absorbs every sid the old records tombstoned
      whose manifest file still exists (a crash mid-GC can leave such
      ghosts) — otherwise deleting the old compacted record during
      the NEXT compaction's GC would resurrect them as live slices
      (double-counted n_docs, or "committed slice dir missing" if
      their dirs were already swept).
    - **Sid uniqueness is checked against tombstones and leftover
      manifests too**, not just live sids: a sid reused while any
      surviving record still tombstones it would filter ITSELF (and
      with it the whole index) invisible.

    A crash BEFORE the rename leaves an invisible compacted slice
    that the next run overwrites (deterministic sid per watermark).

    Writer concurrency (round 11): the whole compaction acts on ONE
    manifest snapshot taken at entry — every table union, the summed
    meta, and the ``replaces`` list name exactly the slices committed
    at that instant, so a fold that commits while compaction runs is
    simply not part of it: its slice stays live beside the compacted
    one (correct union, correct n_docs/watermark via index_state's
    max/sum) and merges on the next compaction. The regression test
    injects a commit between the snapshot and the cut-over
    (tests/test_incremental_index.py). Folds themselves remain
    single-writer per index (slice sids are batch-deterministic).
    The cut-over also
    invalidates any OUTSTANDING LAZY reader plan built before it
    (those plans name the old slice dirs, which GC removes) — callers
    that hold un-collected DataFrames over the index must materialize
    them before compacting; the streaming handler does (the verdict
    parquet write precedes the fold and the compaction)."""
    recs = manifest.committed_slices(path)
    if len(recs) <= 1:
        return 0
    # ONE manifest snapshot drives the whole compaction (round-11
    # race fix): state, the slice list, and every table read below
    # all derive from `recs`. The old shape re-listed the manifest
    # per table (_read_table), so a fold committing mid-compaction
    # entered the LATER tables' unions but not the earlier ones' —
    # a torn compacted slice that ALSO left the new fold live beside
    # it (double-counted rows). With the snapshot, a concurrent fold
    # is simply not part of this compaction: its slice stays live
    # next to the compacted one and merges on the next pass.
    state = _state_of(recs, path)
    old_sids = [r["sid"] for r in recs]
    mdir = os.path.join(path, manifest.MANIFEST_DIR)
    # ghost tombstones to carry forward: sids already replaced by the
    # records we are about to replace, whose manifest files a crashed
    # GC left behind — they must stay tombstoned after those records
    # are themselves GC'd
    all_tombstoned = {s for r in recs for s in r.get("replaces", [])}
    inherited = {
        s
        for s in all_tombstoned
        if manifest.record_file_exists(os.path.join(mdir, f"{s}.json"))
    }
    # reuse-blocked: live sids, EVERY sid a live record tombstones
    # (even if its manifest is long gone — the tombstoning record
    # survives until this GC completes, and a crash before that makes
    # a reused sid self-tombstone the whole index), and any leftover
    # manifest file
    taken = set(old_sids) | all_tombstoned | manifest.list_record_sids(path)
    sid = base_sid = f"compacted-{(state['last_batch_id'] or 0):012d}"
    bump = 2
    while sid in taken:
        sid = f"{base_sid}-{bump}"
        bump += 1
    for t in INDEX_TABLES:
        _read_table_slices(spark, path, t, old_sids).write.mode("overwrite").parquet(
            os.path.join(path, t, sid)
        )
    doc_ids = spark.read.parquet(os.path.join(path, "doc_batches", sid)).select(
        "doc_id"
    )
    _write_slice_bloom(doc_ids, path, sid, state["n_docs"])
    _fsync_slice(path, sid)
    manifest.commit_slice(
        path,
        sid,
        {
            "n_docs": int(state["n_docs"]),
            "batch_id": None,
            "watermark": state["last_batch_id"],
            "ckpt_tag": state["ckpt_tag"],
            "replaces": sorted(set(old_sids) | inherited),
        },
    )
    # --- GC (invisible already; crash-safe to stop anywhere below;
    # inherited ghosts are swept too, so leftovers don't accumulate) ---
    import shutil

    for s in sorted(set(old_sids) | inherited):
        bp = _bloom_path(path, s)
        manifest.delete_record(bp)
        # the parsed-bloom cache would otherwise pin one dict per
        # compacted-away slice forever (round-10 review)
        for k in [k for k in _BLOOM_CACHE if k[0] == bp]:
            del _BLOOM_CACHE[k]
        for t in INDEX_TABLES:
            d = os.path.join(path, t, s)
            if os.path.isdir(d):
                shutil.rmtree(d)
        manifest.delete_record(os.path.join(mdir, f"{s}.json"))
    return len(old_sids)


def assert_no_doc_id_reuse(
    spark: SparkSession, path: str, batch: DataFrame, batch_id: int
) -> None:
    """Fail loudly when a batch re-submits a doc_id the index already
    holds from an EARLIER batch (round-9 advice): the replay guard's
    own-batch exclusion would make the earlier copy invisible to
    classification — a true duplicate would escape — and the index
    would accumulate conflicting rows per doc_id. Rows recorded with
    THIS batch_id are a partial-fold replay (the exact case the
    exclusion exists for) and do not trip the check; build-time rows
    (NULL batch_id) are always foreign. Reads only COMMITTED slices —
    a crashed fold's provenance rows are invisible like everything
    else in its slice.

    Cost shape (round-10 advice): the probe is BATCH-sized, not
    corpus-sized. Foreign slices are first screened through their
    doc_id Bloom sidecars (one mapInPandas pass over the batch's
    xxhash64s — a sid the screen rejects provably shares no doc_id);
    only screen survivors (plus bloom-less slices from pre-round-10
    indexes) pay the exact parquet join, and in a healthy stream that
    survivor set is empty — no doc_batches file is even listed."""
    bid = int(batch_id)
    batch_dtype = batch.schema["doc_id"].dataType.simpleString()
    exact_sids: list[str] = []
    blooms: list[tuple[str, dict]] = []
    for rec in manifest.committed_slices(path):
        if rec.get("batch_id") == bid:
            continue  # own-slice rows are a partial-fold replay
        b = _load_bloom(_bloom_path(path, rec["sid"]))
        # no sidecar (pre-round-10 index) OR a doc_id type drift
        # between index and batch (xxhash64 is type-sensitive where
        # the exact join casts) -> exact probe, never a silent skip
        if b is not None and b.get("dtype") == batch_dtype:
            blooms.append((rec["sid"], b))
        else:
            exact_sids.append(rec["sid"])
    if blooms:
        exact_sids += _bloom_hit_sids(batch, blooms)
    if not exact_sids:
        return
    reused = (
        _read_table_slices(spark, path, "doc_batches", exact_sids)
        .join(F.broadcast(batch.select("doc_id")), "doc_id")
        .filter(F.coalesce(F.col("batch_id"), F.lit(-1)) != F.lit(bid))
        .limit(1)
        .collect()
    )
    if reused:
        raise ValueError(
            f"batch {batch_id} re-submits doc_id {reused[0]['doc_id']!r} "
            f"already indexed by batch {reused[0]['batch_id']} — doc_ids "
            "must be unique across the stream lifetime (the replay "
            "exclusion would otherwise hide the earlier copy); assign "
            "fresh ids or rebuild the index"
        )


def incremental_dedup_with_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    n_docs: int,
    stop_frac: float = INCR_VALVE_FRAC,
    min_df: int = INCR_VALVE_MIN_DF,
    threshold: float = INCR_NEAR_THRESHOLD,
    text_col: str = "text",
    defensive_read_dedup: bool = True,
) -> DataFrame:
    """(doc_id, status) for each batch doc — exact_dup / near_dup /
    unique — against the persisted index; same result as
    incremental_dedup_frame over (existing ∪ batch) with the batch as
    the new side. ``n_docs`` = existing + batch document count (the
    valve is corpus-relative; the caller tracks corpus size — one
    number, not a job).

    Contract: doc_ids are unique across the index lifetime — the
    own-batch exclusion below cannot distinguish a partial-fold
    replay from a re-submitted id, so a reused id's earlier copy
    would be invisible here (the ingest loop enforces this with
    assert_no_doc_id_reuse before classifying)."""
    # Own-batch EXCLUSION on every index read: with the round-9
    # atomic slice commits a replayed batch can no longer SEE its own
    # half-appended rows (uncommitted slices are invisible), so this
    # is belt-and-braces for one remaining case — a caller that
    # classifies a batch it already FOLDED (q114-style direct use
    # decides fold-then-classify ordering itself). The probe side is
    # batch-sized and broadcast; in normal ingest operation the
    # anti-joins match zero rows, so oracle-checked results are
    # unchanged.
    batch_ids = batch.select("doc_id")
    postings = _read_table(spark, path, "postings")
    # ``defensive_read_dedup`` (default on): duplicate-proof reads —
    # postings dedupe on (doc_id, s) AFTER the batch-shingle filter
    # (candidate-sized, never a corpus shuffle), doc_stats on doc_id.
    # Since round 9 the commit protocol makes duplicates impossible
    # for indexes this module wrote (S11c passes with this OFF), so
    # it survives as a fallback for foreign/hand-assembled indexes;
    # hashes' distinct-h projection is SEMANTIC (many docs may share
    # a hash) and always on.
    doc_stats = _read_table(spark, path, "doc_stats").join(
        F.broadcast(batch_ids), "doc_id", "left_anti"
    )
    if defensive_read_dedup:
        doc_stats = doc_stats.dropDuplicates(["doc_id"])
    hashes = (
        _read_table(spark, path, "hashes")
        .join(F.broadcast(batch_ids), "doc_id", "left_anti")
        .select("h")
        .distinct()
    )
    stop_df_limit = resolve_doc_freq_limit(stop_frac, n_docs, min_df=min_df)

    bsh = _shingle_rows(batch.select("doc_id", text_col), text_col)
    batch_sh = bsh.select("s").distinct()
    # batch-relevant postings slice, batch-excluded (see above),
    # MATERIALIZED once: it feeds the df probe, the candidate join,
    # and the stop correction — without the eager checkpoint each
    # consumer re-scanned the corpus-sized postings table (round-8
    # review measured SIX postings FileScans per batch in the executed
    # plan); the checkpointed frame is candidate-sized
    pfilt = postings.join(F.broadcast(batch_sh), "s").join(
        F.broadcast(batch_ids), "doc_id", "left_anti"
    )
    if defensive_read_dedup:
        pfilt = pfilt.dropDuplicates(["doc_id", "s"])
    pfilt = pfilt.localCheckpoint(eager=True)
    # corpus df of each batch shingle = existing postings + the
    # batch's own occurrences (q114 counts both sides)
    df_exist = pfilt.groupBy("s").agg(F.count(F.lit(1)).alias("__dfe"))
    df_batch = bsh.groupBy("s").agg(F.count(F.lit(1)).alias("__dfb"))
    # stop is broadcast into three consumers; the eager checkpoint
    # pins the (tiny) result instead of re-deriving the aggs per use
    stop = (
        df_batch.join(df_exist, "s", "left")
        .filter(
            (F.coalesce(F.col("__dfe"), F.lit(0)) + F.col("__dfb")) > stop_df_limit
        )
        .select("s")
        .localCheckpoint(eager=True)
    )
    bshv = bsh.join(F.broadcast(stop), "s", "left_anti")
    b_sz = bshv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("na"))

    # candidate existing postings: batch shingles only, stop-valved
    cand = pfilt.join(F.broadcast(stop), "s", "left_anti")
    inter = (
        bshv.select(F.col("doc_id").alias("new_doc"), "s")
        .join(cand.select(F.col("doc_id").alias("ex_doc"), "s"), "s")
        .groupBy("new_doc", "ex_doc")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # valved size of an existing doc = total − |its shingles ∩ stop|:
    # the correction probe is stop-bounded (stop is a subset of the
    # batch's shingles — broadcastable by construction; pfilt keeps
    # the read-side dedupe guard on this probe too)
    stop_correction = (
        pfilt.join(F.broadcast(stop), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__in_stop"))
    )
    e_sz = doc_stats.join(stop_correction, "doc_id", "left").select(
        "doc_id",
        (F.col("n_sh_total") - F.coalesce(F.col("__in_stop"), F.lit(0))).alias("nb"),
    )
    raw_j = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    near = (
        inter.join(b_sz.withColumnRenamed("doc_id", "new_doc"), "new_doc")
        .join(e_sz.withColumnRenamed("doc_id", "ex_doc"), "ex_doc")
        .filter(raw_j >= threshold)
        .select("new_doc")
        .distinct()
        .withColumn("__near", F.lit(1))
    )
    new_docs = batch.select(
        "doc_id", F.md5(F.col(text_col).cast("binary")).alias("h")
    )
    return (
        new_docs.join(hashes.withColumn("__exact", F.lit(1)), "h", "left")
        .join(F.broadcast(near.withColumnRenamed("new_doc", "doc_id")), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("__exact") == 1, "exact_dup")
            .when(F.col("__near") == 1, "near_dup")
            .otherwise("unique")
            .alias("status"),
        )
        .orderBy("doc_id")
    )


def streaming_dedup_ingest(
    stream_docs: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    compact_every: int | None = None,
):
    """The full production ingest loop (A5 × K1 × I8, round 7): each
    micro-batch of documents is (1) classified against the persisted
    index, (2) its verdicts appended to ``out_path`` as
    (doc_id, status, batch_id), and (3) folded into the index — so
    the NEXT batch dedups against everything before it, exactly like
    the continuously-fed corpus q114 models.

    Ordering inside the handler matters: the verdict write runs
    BEFORE append_to_index mutates the tables it read (foreachBatch
    bodies are synchronous, and the parquet write materializes the
    classification eagerly). n_docs for the valve = indexed count +
    this batch (q114 counts both sides).

    Restart safety: ``checkpoint_path`` is REQUIRED (round-7 review —
    with a temp checkpoint, a restart re-reads every source file,
    appending duplicate verdicts and postings and doubling the meta
    count). With a durable checkpoint the file source skips
    already-committed batches on restart. foreachBatch is still
    at-least-once WITHIN a batch — a crash after the side effects but
    before the checkpoint advance replays that batch — so both sinks
    are replay-proof (round-8 advice + review): the handler SKIPS
    ENTIRELY when the incoming batch_id is already folded (meta
    watermark), and for a crash anywhere before the watermark advance
    — including INSIDE the fold's non-atomic table appends — the
    replayed classification excludes the batch's own doc_ids from
    every index read, so it produces exact copies of the original
    verdicts regardless of how much of the fold landed, and
    ``read_verdicts``' (batch_id, doc_id) dedupe loses nothing. The
    watermark itself is guarded by a checkpoint tag recorded in meta:
    feeding one index from a second checkpoint, or restarting after
    the checkpoint was deleted, fails loudly at query start instead
    of silently dropping renumbered batches."""

    import hashlib as _hl

    from morphl_community_edition_spark.streaming.sinks import _sink_exists

    tag = _hl.md5(checkpoint_path.encode()).hexdigest()[:12]
    # START-time watermark sanity (round-8 review): the batch_id
    # watermark only means "already folded" when the ids come from the
    # SAME checkpoint sequence. A different checkpoint (second stream
    # feeding one index) or a deleted-and-recreated one restarts ids
    # at 0, and the `<= last` guard would then SILENTLY drop every
    # replayed-or-new batch. Both cases fail loudly here instead.
    spark0 = stream_docs.sparkSession
    state0 = index_state(index_path)
    last0 = state0["last_batch_id"]
    tag0 = state0["ckpt_tag"]
    if last0 is not None:
        if tag0 is not None and tag0 != tag:
            raise ValueError(
                f"index at {index_path} was fed from a different checkpoint "
                f"(tag {tag0} != {tag}): batch ids are not comparable — use a "
                "fresh index per ingest stream, or the original checkpoint"
            )
        if not _sink_exists(spark0, checkpoint_path):
            raise ValueError(
                f"checkpoint {checkpoint_path} is gone but the index at "
                f"{index_path} retains watermark batch_id={last0}: a restart "
                "would renumber batches from 0 and the replay guard would "
                "silently drop them — restore the checkpoint or rebuild the "
                "index"
            )

    def handle(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # ONE manifest read per batch (driver-side JSON, no job)
        state = index_state(index_path)
        # WHOLE-handler replay guard (round-8 review): if this batch_id
        # was already folded (crash landed between append_to_index and
        # the checkpoint advance), the verdicts were written too (the
        # verdict write precedes the fold) — a replayed batch is
        # re-classified only when the fold did NOT COMMIT, and since
        # round 9 an uncommitted fold is INVISIBLE (slice dirs without
        # a manifest record), so the replayed classification reads
        # exactly the pre-crash index and reproduces the verdicts
        # byte-for-byte.
        last = state["last_batch_id"]
        if last is not None and batch_id <= last:
            return
        b = batch.select("doc_id", text_col).localCheckpoint(eager=True)
        n_b = b.count()
        if n_b == 0:
            return
        # doc_id reuse across batches breaks the replay exclusion's
        # invariant — fail the stream rather than mis-classify
        assert_no_doc_id_reuse(spark, index_path, b, batch_id)
        n_docs = state["n_docs"] + n_b
        res = incremental_dedup_with_index(spark, index_path, b, n_docs=n_docs)
        res.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_path
        )
        append_to_index(
            b, index_path, text_col, batch_id=batch_id, meta=state, ckpt_tag=tag
        )
        # Periodic slice compaction (round 10): runs INSIDE the
        # handler — the single-writer window compact_index requires.
        # After the fold commits, so a crash during compaction leaves
        # the batch durable (replay skips it) and the compacted slice
        # either invisible (pre-commit) or fully cut over; no schedule
        # state to persist — the cadence re-derives from batch_id.
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact_index(spark, index_path)

    return (
        stream_docs.writeStream.foreachBatch(handle)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_verdicts(spark: SparkSession, out_path: str) -> DataFrame:
    """Replay-safe read of the verdict sink: foreachBatch can append
    the same batch twice (any crash before the meta watermark
    advance), so consumers dedupe on the (batch_id, doc_id) key. The
    duplicates are exact row copies because the replayed
    classification excludes the batch's own doc_ids from every index
    read — identical verdicts under any fold prefix — so
    dropDuplicates loses nothing."""
    return spark.read.parquet(out_path).dropDuplicates(["batch_id", "doc_id"])
