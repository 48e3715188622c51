"""Persisted dedup postings index (A5 × K1 composition, round 7):
the PRODUCTION form of q114's incremental-ingest dedup.

The round-7 decomposition (SCALE.md, tools/profile_q114.py) named
q114's irreducible per-batch term: the corpus-wide shingle
explode+distinct (2.24 s of its 3.44 s at sf0.1), re-derived 14×
across the plan's branches — the one cost that grows with the corpus
no matter how small the batch is. A continuously-fed pipeline does
not re-shingle 100 TB per batch; it maintains an inverted index.
This module is that index:

- ``build_dedup_index(docs, path)`` — one corpus pass writes three
  parquet tables under ``path``: ``postings`` (doc_id, s — the
  distinct 3-gram inverted file, the expensive explode paid ONCE),
  ``doc_stats`` (doc_id, n_sh_total), ``hashes`` (content md5 set
  for the exact tier). At cluster scale the postings table would be
  bucketed by shingle; incremental maintenance is an append of the
  accepted batch's rows to all three (the A5 partitioned-sink
  shape).
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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morphl_community_edition_spark.operators.dedup import (
    INCR_NEAR_THRESHOLD,
    INCR_VALVE_FRAC,
    INCR_VALVE_MIN_DF,
    resolve_doc_freq_limit,
    word_shingles,
)

SHINGLE_N = 3


def _shingle_rows(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, s): the distinct n-gram posting rows of each doc."""
    return word_shingles(docs, text_col, SHINGLE_N).select(
        "doc_id", F.explode("shingles").alias("s")
    )


def build_dedup_index(docs: DataFrame, path: str, text_col: str = "text") -> None:
    """One corpus pass -> postings / doc_stats / hashes / meta parquet
    under ``path``. ``docs`` needs (doc_id, text). ``meta`` holds the
    indexed DOCUMENT count (doc_stats only has rows for docs with ≥1
    shingle, so it cannot stand in for corpus size — the valve is
    corpus-relative)."""
    _write_index_tables(docs, path, text_col, mode="overwrite")
    # (doc_id, batch_id) provenance — build-time docs carry NULL.
    # Exists so the ingest loop can fail loudly on doc_id REUSE
    # (round-9 advice): the replay guard's own-batch exclusion assumes
    # a doc_id appears in at most one batch over the stream lifetime;
    # a legitimately re-submitted id would make its earlier indexed
    # copy invisible to classification instead.
    docs.select("doc_id").withColumn(
        "batch_id", F.lit(None).cast("long")
    ).write.mode("overwrite").parquet(os.path.join(path, "doc_batches"))
    _write_meta(docs.sparkSession, path, docs.count())


def _write_index_tables(
    docs: DataFrame, path: str, text_col: str, mode: str
) -> None:
    """Shared by build (overwrite) and append: doc_stats is derived by
    READING BACK the just-written postings slice, so the corpus
    shingle explode — the cost this module exists to amortize — runs
    exactly once per build/append instead of twice (round-7 review:
    the lazy `sh` frame was re-derived for each write)."""
    sh = _shingle_rows(docs.select("doc_id", text_col), text_col)
    postings_dir = os.path.join(path, "postings")
    if mode == "overwrite":
        sh.write.mode("overwrite").parquet(postings_dir)
        stats_src = docs.sparkSession.read.parquet(postings_dir)
    else:
        # append: we can't re-read ONLY this slice back from the
        # postings dir (parquet append has no per-write subdir), so
        # checkpoint the exploded frame once and reuse it for both the
        # postings append and the doc_stats agg (doc_stats is
        # doc-sized, not postings-sized — the double-explode was the
        # real cost)
        sh = sh.localCheckpoint(eager=True)
        sh.write.mode("append").parquet(postings_dir)
        stats_src = sh
    stats_src.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sh_total")
    ).write.mode("append" if mode == "append" else "overwrite").parquet(
        os.path.join(path, "doc_stats")
    )
    # (doc_id, h), one row per doc — doc_id makes the exact-tier probe
    # excludable per batch (round-8 review: a replay after a PARTIAL
    # fold must not let a doc exact-match its own half-appended hash);
    # the read side projects distinct h AFTER that exclusion
    docs.select(
        "doc_id", F.md5(F.col(text_col).cast("binary")).alias("h")
    ).write.mode(mode).parquet(os.path.join(path, "hashes"))


def _write_meta(
    spark: SparkSession,
    path: str,
    n_docs: int,
    last_batch_id: int | None = None,
    ckpt_tag: str | None = None,
) -> None:
    spark.createDataFrame(
        [(
            int(n_docs),
            None if last_batch_id is None else int(last_batch_id),
            ckpt_tag,
        )],
        "n_docs long, last_batch_id long, ckpt_tag string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "meta"))


def _meta_field(row, name: str):
    """Tolerant meta access: indexes written before a column existed
    read as None."""
    try:
        return row[name]
    except (KeyError, ValueError):
        return None


def _read_meta(spark: SparkSession, path: str):
    return spark.read.parquet(os.path.join(path, "meta")).collect()[0]


def read_index_doc_count(spark: SparkSession, path: str) -> int:
    """Indexed-corpus document count, from the one-row meta table."""
    return _read_meta(spark, path)["n_docs"]


def read_index_last_batch_id(spark: SparkSession, path: str) -> int | None:
    """Highest streaming batch_id already folded into the index, or
    None for a fresh/batch-built index (also for indexes written
    before the column existed — missing column reads as None)."""
    return _meta_field(_read_meta(spark, path), "last_batch_id")


def append_to_index(
    batch: DataFrame,
    path: str,
    text_col: str = "text",
    batch_id: int | None = None,
    meta=None,
    ckpt_tag: str | None = None,
) -> None:
    """Incremental index maintenance (the A5 append shape): fold an
    ACCEPTED batch into the index — postings/doc_stats rows append,
    the content-hash table appends one (doc_id, h) row per doc (the
    exact-tier probe projects distinct h at read time, so repeats
    across batches are harmless), meta advances by the batch doc
    count.

    ``batch_id`` makes the fold IDEMPOTENT per batch (round-8 advice):
    when given, meta records the highest folded batch_id and a replay
    of an already-folded id is a no-op — foreachBatch is
    at-least-once, so a crash between a downstream commit and the
    checkpoint advance replays the batch, and without the guard the
    replay would double-append postings/doc_stats/hashes and
    double-advance the valve denominator. Spark's microbatch ids are
    monotonically increasing per checkpoint, so `<= last` detects a
    replay. Residual window (round-8 review): the parquet appends and
    the meta write are not one atomic transaction — a crash BETWEEN
    them leaves the watermark behind, so the replay re-appends the
    slice. That duplication is made harmless at READ time instead
    (incremental_dedup_with_index dedupes postings on (doc_id, s)
    candidate-sized, doc_stats on doc_id, hashes were always
    distinct; meta's count recomputes from the pre-crash value), so
    the pipeline is exactly-once in effect without a transaction log.
    Callers without a batch protocol (batch_id=None) keep the old
    contract: append each doc once."""
    spark = batch.sparkSession
    if meta is None:
        meta = _read_meta(spark, path)
    n_before = meta["n_docs"]
    last = _meta_field(meta, "last_batch_id")
    old_tag = _meta_field(meta, "ckpt_tag")
    if batch_id is not None and last is not None and batch_id <= last:
        return
    _write_index_tables(batch, path, text_col, mode="append")
    # provenance rows for the doc_id-reuse guard (see build_dedup_index;
    # replay copies are harmless — the check is equality-on-batch_id)
    batch.select("doc_id").withColumn(
        "batch_id",
        F.lit(None if batch_id is None else int(batch_id)).cast("long"),
    ).write.mode("append").parquet(os.path.join(path, "doc_batches"))
    # a protocol-free append (batch_id=None) preserves the recorded
    # watermark/tag instead of erasing them
    _write_meta(
        spark,
        path,
        n_before + batch.count(),
        last_batch_id=batch_id if batch_id is not None else last,
        ckpt_tag=ckpt_tag if ckpt_tag is not None else old_tag,
    )


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
    (NULL batch_id) are always foreign. Indexes written before the
    doc_batches table existed skip the check (tolerant read)."""
    from morphl_community_edition_spark.streaming.sinks import _sink_exists

    db = os.path.join(path, "doc_batches")
    if not _sink_exists(spark, db):
        return
    reused = (
        spark.read.parquet(db)
        .join(F.broadcast(batch.select("doc_id")), "doc_id")
        .filter(F.coalesce(F.col("batch_id"), F.lit(-1)) != F.lit(int(batch_id)))
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
    # Own-batch EXCLUSION on every index read (round-8 review): a
    # replay after a PARTIAL fold (crash inside append_to_index,
    # between the table appends and the meta advance) sees the batch's
    # own half-appended rows in the index — without exclusion the
    # re-classification would exact/near-match docs against THEMSELVES
    # and write verdicts that conflict with the pre-crash ones. With
    # it, classification is idempotent under any fold prefix: the
    # batch's own rows are invisible by construction, so the replayed
    # verdicts are exact copies and read_verdicts' dedupe loses
    # nothing. In normal operation (batch not yet folded) the
    # anti-joins match zero rows, so oracle-checked results are
    # unchanged; the probe side is batch-sized and broadcast.
    batch_ids = batch.select("doc_id")
    postings = spark.read.parquet(os.path.join(path, "postings"))
    # dropDuplicates at read time (round-8 review): append_to_index's
    # parquet appends + meta advance are not one atomic transaction —
    # a crash between them lets the replay double-append a batch's
    # postings/doc_stats slice (the watermark never moved). Writes
    # stay at-least-once; READS are duplicate-proof, which makes the
    # pipeline exactly-once in effect: postings dedupe on (doc_id, s)
    # AFTER the batch-shingle filter (candidate-sized, never a corpus
    # shuffle), doc_stats on doc_id (doc-sized; replay copies are
    # exact), hashes project distinct h after the exclusion.
    doc_stats = (
        spark.read.parquet(os.path.join(path, "doc_stats"))
        .join(F.broadcast(batch_ids), "doc_id", "left_anti")
        .dropDuplicates(["doc_id"])
    )
    hashes = (
        spark.read.parquet(os.path.join(path, "hashes"))
        .join(F.broadcast(batch_ids), "doc_id", "left_anti")
        .select("h")
        .distinct()
    )
    stop_df_limit = resolve_doc_freq_limit(stop_frac, n_docs, min_df=min_df)

    bsh = _shingle_rows(batch.select("doc_id", text_col), text_col)
    batch_sh = bsh.select("s").distinct()
    # batch-relevant postings slice, dedup-guarded + batch-excluded
    # (see above), MATERIALIZED once: it feeds the df probe, the
    # candidate join, and the stop correction — without the eager
    # checkpoint each consumer re-scanned the corpus-sized postings
    # table (round-8 review measured SIX postings FileScans per batch
    # in the executed plan); the checkpointed frame is candidate-sized
    pfilt = (
        postings.join(F.broadcast(batch_sh), "s")
        .join(F.broadcast(batch_ids), "doc_id", "left_anti")
        .dropDuplicates(["doc_id", "s"])
        .localCheckpoint(eager=True)
    )
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
    meta0 = _read_meta(spark0, index_path)
    last0 = _meta_field(meta0, "last_batch_id")
    tag0 = _meta_field(meta0, "ckpt_tag")
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
        # ONE meta read per batch (round-8 review: three separate
        # read+collect jobs against the one-row table added fixed
        # latency to every micro-batch)
        meta = _read_meta(spark, index_path)
        # WHOLE-handler replay guard (round-8 review): if this batch_id
        # was already folded (crash landed between append_to_index and
        # the checkpoint advance), the verdicts were written too (the
        # verdict write precedes the fold) — a replayed batch is
        # re-classified only when the fold did NOT complete, and the
        # own-batch exclusion inside incremental_dedup_with_index makes
        # that re-classification identical under any partial fold.
        last = _meta_field(meta, "last_batch_id")
        if last is not None and batch_id <= last:
            return
        b = batch.select("doc_id", text_col).localCheckpoint(eager=True)
        n_b = b.count()
        if n_b == 0:
            return
        # doc_id reuse across batches breaks the replay exclusion's
        # invariant — fail the stream rather than mis-classify
        assert_no_doc_id_reuse(spark, index_path, b, batch_id)
        n_docs = meta["n_docs"] + n_b
        res = incremental_dedup_with_index(spark, index_path, b, n_docs=n_docs)
        res.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_path
        )
        append_to_index(
            b, index_path, text_col, batch_id=batch_id, meta=meta, ckpt_tag=tag
        )

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
