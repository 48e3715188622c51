"""S-suite: batch-vs-stream equivalence (SURVEY.md §5.4).

The events fixture is replayed through a real file micro-batch stream
and each streaming operator's final result must equal its batch twin
exactly.

State-store note: each micro-batch materializes one state store per
shuffle partition; tests pin spark.sql.shuffle.partitions=8 before
building streaming plans so 5-9 micro-batches complete in seconds
(32 partitions × 9 batches of checkpoint fsyncs is pure overhead at
fixture scale — the same knob a real job sizes to its cluster).
"""

from __future__ import annotations

import os
import shutil
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from morphl_community_edition_spark.catalog import load_table
from morphl_community_edition_spark.sources.stream import read_stream_dir, stage_stream_input
from morphl_community_edition_spark.streaming.sinks import to_memory
from morphl_community_edition_spark.streaming.state import running_user_counts
from morphl_community_edition_spark.streaming.windows import session_counts, sliding_counts, tumbling_counts
from tests.conftest import SF_DIR_SMOKE, canonicalize

N_CHUNKS = 4


@pytest.fixture(scope="module", autouse=True)
def small_shuffle(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.fixture(scope="module")
def staged(spark):
    return stage_stream_input(spark, SF_DIR_SMOKE, "events", n_chunks=N_CHUNKS)


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_table(spark, SF_DIR_SMOKE, "events")


def run_stream(spark, df, name, mode="complete", timeout_s=600):
    q = to_memory(df, name, mode)
    deadline = time.time() + timeout_s
    while q.isActive and time.time() < deadline:
        q.awaitTermination(5)
    assert not q.isActive, f"stream {name} still running after {timeout_s}s"
    if q.exception() is not None:
        raise AssertionError(f"stream {name} failed: {q.exception()}")
    return spark.sql(f"SELECT * FROM {name}")


def assert_frames_equal(got, want):
    g, w = canonicalize(got.toPandas()), canonicalize(want.toPandas())
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_s1_tumbling_stream_equals_batch(spark, staged, events_batch):
    stream = read_stream_dir(spark, staged)
    got = run_stream(spark, tumbling_counts(stream, watermark="1 hour"), "s1_tumbling")
    assert_frames_equal(got, tumbling_counts(events_batch))


def test_s1_sliding_stream_equals_batch(spark, staged, events_batch):
    stream = read_stream_dir(spark, staged)
    got = run_stream(spark, sliding_counts(stream, watermark="1 hour"), "s1_sliding")
    assert_frames_equal(got, sliding_counts(events_batch))


def test_s2_session_window_stream_equals_batch_and_sessionize(spark, events_batch):
    # Session state evicts+emits only when the watermark passes a
    # session's end → APPEND mode, with a flush event per user staged
    # as the LAST file so every real session finalizes. The flush rows
    # must flow THROUGH the watermark operator (that's what advances
    # it); their own sessions end beyond the final watermark and never
    # emit, so no output filter is needed.
    staged_flush = stage_stream_input(
        spark, SF_DIR_SMOKE, "events", n_chunks=N_CHUNKS, flush_horizon_hours=2
    )
    stream = read_stream_dir(spark, staged_flush)
    got = run_stream(spark, session_counts(stream, watermark="30 minutes"), "s2_session", mode="append")
    want = session_counts(events_batch)
    assert_frames_equal(got, want)
    # and the lag+cumsum batch sessionizer agrees on session count + sizes
    from morphl_community_edition_spark.operators.sessionize import sessionize

    lag_sessions = sessionize(events_batch).groupBy("user_id", "sess").agg(F.count(F.lit(1)).alias("n"))
    a = got.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n").alias("n_events"))
    b = lag_sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n").alias("n_events")
    )
    assert_frames_equal(a, b)


def test_s3_dedup_within_watermark(spark, staged, events_batch, tmp_path):
    # Stage every chunk TWICE: the copy gets a later mtime, so it
    # arrives in a later micro-batch while its keys are still inside
    # the watermark → exercises cross-batch stateful dedup (I5).
    dup_dir = str(tmp_path / "dup_events")
    shutil.copytree(staged, dup_dir)
    now = time.time()
    parts = sorted(f for f in os.listdir(dup_dir) if f.endswith(".parquet"))
    for i, f in enumerate(parts):
        src = os.path.join(dup_dir, f)
        os.utime(src, (now + 2 * i, now + 2 * i))
        dup = os.path.join(dup_dir, f"dup-{f}")
        shutil.copy(src, dup)
        os.utime(dup, (now + 2 * i + 1, now + 2 * i + 1))
    stream = read_stream_dir(spark, dup_dir)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])
    got = run_stream(spark, deduped.select("event_id"), "s3_dedup", mode="append")
    n = events_batch.count()
    assert got.count() == n
    assert got.select("event_id").distinct().count() == n


def test_checkpoint_recovery_exactly_once(spark, staged, events_batch, tmp_path):
    """Kill a stateful stream mid-input, restart from its checkpoint:
    the resumed query must finish with EXACTLY the batch result — no
    lost chunks, no double counting (file source + state store
    recovery, the property that makes daily-pipeline restarts safe)."""
    ckpt = str(tmp_path / "ckpt")
    out_name = "ckpt_counts"

    def start():
        stream = read_stream_dir(spark, staged)
        agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
        return (
            agg.writeStream.format("memory")
            .queryName(out_name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )

    q = start()
    # let it process SOME but not all chunks, then kill it
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in (q.recentProgress or [])):
            break
        time.sleep(0.5)
    q.stop()
    # restart from the same checkpoint, run to completion
    stream = read_stream_dir(spark, staged)
    agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    q2 = (
        agg.writeStream.format("memory")
        .queryName(out_name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + 600
    while q2.isActive and time.time() < deadline:
        q2.awaitTermination(5)
    assert not q2.isActive and q2.exception() is None
    got = {tuple(r) for r in spark.sql(f"SELECT * FROM {out_name}").collect()}
    want = {
        tuple(r)
        for r in events_batch.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got == want, f"post-recovery result diverged: {got ^ want}"


def test_s4_stream_static_join(spark, staged, events_batch):
    customer = load_table(spark, SF_DIR_SMOKE, "customer").withColumn("uid", F.col("c_custkey") % 150)
    stream = read_stream_dir(spark, staged)
    joined = (
        stream.join(F.broadcast(customer), stream.user_id == customer.uid)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    got = run_stream(spark, joined, "s4_join")
    want = (
        events_batch.join(F.broadcast(customer), events_batch.user_id == customer.uid)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert_frames_equal(got, want)


def test_s4_foreachbatch_upsert_merges_not_overwrites(spark, staged, events_batch, tmp_path):
    """The upsert sink must MERGE into touched buckets: update-mode
    batches carry only changed keys, so a bare overwrite-partition
    write would silently drop every co-bucketed key a later batch
    didn't mention (regression test for exactly that bug)."""
    from morphl_community_edition_spark.streaming.sinks import foreach_batch_upsert

    out = str(tmp_path / "sink")
    stream = read_stream_dir(spark, staged)
    q = foreach_batch_upsert(running_user_counts(stream), out, key_cols=["user_id"])
    deadline = time.time() + 600
    while q.isActive and time.time() < deadline:
        q.awaitTermination(5)
    assert not q.isActive and q.exception() is None
    final = spark.read.parquet(out)
    want = events_batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("running_count"))
    # every user present exactly once, with the final cumulative count
    assert final.count() == want.count()
    g = {(r["user_id"], r["running_count"]) for r in final.collect()}
    w = {(r["user_id"], r["running_count"]) for r in want.collect()}
    assert g == w


def test_s4_stateful_running_counts(spark, staged, events_batch):
    stream = read_stream_dir(spark, staged)
    got = run_stream(spark, running_user_counts(stream), "s4_state", mode="update")
    # final state per user (cumulative counters are monotone → max) == batch aggregate
    final = got.groupBy("user_id").agg(
        F.max("running_count").alias("running_count"), F.max("running_value").alias("running_value")
    )
    want = events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("running_count"),
        (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).cast("double") / 100.0).alias(
            "running_value"
        ),
    )
    assert_frames_equal(final, want)


def test_s5_stream_stream_join_equals_batch(spark, staged, events_batch):
    """I7 completion: stream-STREAM inner join (state on both sides,
    watermark-bounded buffering) must emit exactly the batch join's
    matches. Append is the only supported mode for this shape.
    Eviction is watermark+range-derived (a view drops only once the
    purchase watermark passes v_ts + window), so no watermark delay
    can drop a still-matchable row under in-order replay."""
    from morphl_community_edition_spark.streaming.joins import view_purchase_attribution

    stream = read_stream_dir(spark, staged)
    got = run_stream(
        spark,
        view_purchase_attribution(stream, window="24 hours", watermark="1 hour"),
        "s5_stream_stream",
        mode="append",
    )
    want = view_purchase_attribution(events_batch, window="24 hours", watermark=None)
    # 24h window -> 80 matches at smoke scale (30min gives only 2 —
    # near-vacuous); the 1h delay is deliberately SMALLER than the
    # join window: eviction is watermark+range-derived, so no
    # still-matchable view is dropped under in-order replay
    assert got.count() >= 50, "attribution join too thin — test is near-vacuous"
    assert_frames_equal(got, want)


def test_s6_transform_with_state_matches_legacy_and_batch(spark, staged, events_batch):
    """I6 on Spark 4's StatefulProcessor API: transformWithStateInPandas
    must reach the same final per-user state as applyInPandasWithState
    and the batch aggregate (three independent implementations of the
    running counter, one answer).

    The TWS state-server protocol needs google.protobuf (verified:
    its driver worker dies in StateMessage_pb2 import without it), so
    the check skips in containers without protobuf; the operator's
    plumbing is still import-tested there via running_user_counts_tws
    building a valid streaming plan."""
    pytest.importorskip("google.protobuf", reason="transformWithState state server requires protobuf")
    from morphl_community_edition_spark.streaming.state import running_user_counts_tws

    # TWS creates per-state-variable column families, which the default
    # HDFSBackedStateStoreProvider rejects — RocksDB provider required
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_stream_dir(spark, staged)
        got = run_stream(spark, running_user_counts_tws(stream), "s6_tws", mode="update")
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
    final = got.groupBy("user_id").agg(
        F.max("running_count").alias("running_count"), F.max("running_value").alias("running_value")
    )
    want = events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("running_count"),
        (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).cast("double") / 100.0).alias(
            "running_value"
        ),
    )
    assert_frames_equal(final, want)


def test_s6_tws_plan_builds_without_protobuf(spark, staged):
    """Even without protobuf (no state server), the TWS operator must
    produce a valid unresolved streaming plan — schema + grouping are
    declared eagerly, so misuse fails at author time, not run time."""
    from morphl_community_edition_spark.streaming.state import OUTPUT_SCHEMA, running_user_counts_tws

    df = running_user_counts_tws(read_stream_dir(spark, staged))
    assert df.isStreaming
    assert df.schema == OUTPUT_SCHEMA


# ---- S6: the curation family under streaming ingest ----


@pytest.fixture(scope="module")
def staged_docs(spark):
    return stage_stream_input(
        spark, SF_DIR_SMOKE, "documents", n_chunks=N_CHUNKS, order_col="doc_id"
    )


def test_s6_streaming_token_mask_counts(spark, staged_docs):
    """K4 under A6: q104's denylist-mask accounting over a document
    ingest stream (complete mode) equals the batch twin exactly — the
    curation ops are stateless aggregations, so they run unchanged on
    a stream."""
    from morphl_community_edition_spark.queries.curation import MASK_RE
    from morphl_community_edition_spark.sources.stream import read_stream_dir

    stream = read_stream_dir(spark, staged_docs, "documents")
    hits = F.regexp_count(F.col("text"), F.lit(MASK_RE))
    agg = (
        stream.select("source", hits.alias("hits"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("hits") > 0, 1).otherwise(0)).cast("bigint").alias("masked_docs"),
            F.sum("hits").cast("bigint").alias("total_masks"),
        )
    )
    got = run_stream(spark, agg, "s6_mask", mode="complete")
    from morphl_community_edition_spark.queries import QUERIES

    want = QUERIES["q104_token_mask"](spark, SF_DIR_SMOKE)
    assert canonicalize(got.toPandas()).equals(canonicalize(want.toPandas()))


def test_s6_streaming_quality_filter_sink(spark, staged_docs, tmp_path):
    """The ingest-filter pipeline shape: foreachBatch applies the
    quality cut per micro-batch and appends survivors to a parquet
    sink; the final sink content equals the batch filter over the
    whole corpus (stateless row filters commute with micro-batching)."""
    from morphl_community_edition_spark.operators.textstats import quality_features
    from morphl_community_edition_spark.sources.stream import read_stream_dir

    out = str(tmp_path / "kept_docs")
    stream = read_stream_dir(spark, staged_docs, "documents")

    def keep_quality(batch_df, _batch_id):
        (
            quality_features(batch_df)
            .filter(F.col("quality") > 0.40)
            .select("doc_id", "source", "quality")
            .write.mode("append")
            .parquet(out)
        )

    q = stream.writeStream.foreachBatch(keep_quality).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(600)

    got = spark.read.parquet(out)
    want = (
        quality_features(load_table(spark, SF_DIR_SMOKE, "documents"))
        .filter(F.col("quality") > 0.40)
        .select("doc_id", "source", "quality")
    )
    assert canonicalize(got.toPandas()).equals(canonicalize(want.toPandas()))


def test_s7_streaming_pii_redaction_matches_batch(spark, staged_docs):
    """K4 scrub under A6 ingest (round-6): q118's ordered
    regexp_replace chain applied per micro-batch (append mode — the
    scrub is a stateless projection, the natural streaming shape for
    a redaction pass) must produce exactly the batch query's redacted
    bytes for every document."""
    from morphl_community_edition_spark.queries import QUERIES
    from morphl_community_edition_spark.queries.curation import PII_PATTERNS
    from morphl_community_edition_spark.sources.stream import read_stream_dir

    stream = read_stream_dir(spark, staged_docs, "documents")
    red = F.col("text")
    for _, pat, rep in PII_PATTERNS:
        red = F.regexp_replace(red, pat, rep)
    proj = stream.select("doc_id", F.md5(red).alias("red_md5"))
    got = run_stream(spark, proj, "s7_redact", mode="append")
    want = QUERIES["q118_pii_redaction"](spark, SF_DIR_SMOKE).select(
        "doc_id", "red_md5"
    )
    assert_frames_equal(got, want)


def test_s8_streaming_paragraph_dedup_matches_batch_keepers(spark, staged_docs):
    """K1 paragraph dedup under A6 ingest (round-6): stateful
    dropDuplicates over the exploded paragraph stream must emit
    exactly q119's kept-paragraph set — by keep-first semantics the
    batch keepers ARE the distinct paragraphs, so the streaming state
    path and the batch agg+join path must agree on the set, not just
    the count. (No watermark: availableNow replay with bounded state
    at fixture scale; production bounds state with a watermark on an
    ingest-time column.)"""
    from morphl_community_edition_spark.queries import QUERIES
    from morphl_community_edition_spark.queries.curation import PARA_WORDS
    from morphl_community_edition_spark.sources.stream import read_stream_dir

    def para_col(df):
        ws = F.split(F.col("text"), " ")
        offs = F.sequence(F.lit(0), F.size(ws) - 1, F.lit(PARA_WORDS))
        paras = F.transform(
            offs, lambda off: F.array_join(F.slice(ws, off + 1, PARA_WORDS), " ")
        )
        return df.select(F.explode(paras).alias("para"))

    stream = read_stream_dir(spark, staged_docs, "documents")
    got = run_stream(
        spark, para_col(stream).dropDuplicates(["para"]), "s8_paradedup", mode="append"
    )
    batch = QUERIES["q119_paragraph_dedup"](spark, SF_DIR_SMOKE)
    n_kept = batch.agg(F.sum("n_kept").alias("s")).collect()[0]["s"]
    assert got.count() == n_kept
    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    want = {r["para"] for r in para_col(docs).distinct().collect()}
    assert {r["para"] for r in got.collect()} == want


def test_s4_upsert_sink_null_keys_do_not_accumulate(spark, tmp_path):
    """Round-6 review finding: the sink's left_anti carry-over used
    plain key equality, which never matches NULL = NULL — a null-keyed
    row was carried AND re-appended every batch, growing unboundedly.
    With eqNullSafe the null key upserts like any other: two staged
    micro-batches each carrying a null-keyed row must end with exactly
    ONE null-keyed row holding the second batch's value (and the
    non-null keys behave identically)."""
    import os
    import time as _time

    from morphl_community_edition_spark.streaming.sinks import foreach_batch_upsert

    src = str(tmp_path / "src")
    os.makedirs(src)
    b1 = spark.createDataFrame([(None, 1), (7, 1)], "user_id int, v int")
    b2 = spark.createDataFrame([(None, 2), (8, 2)], "user_id int, v int")
    now = _time.time()
    for i, b in enumerate((b1, b2)):
        p = str(tmp_path / f"chunk{i}")
        b.coalesce(1).write.mode("overwrite").parquet(p)
        part = next(f for f in os.listdir(p) if f.startswith("part-"))
        dst = os.path.join(src, f"part-{i}.parquet")
        os.rename(os.path.join(p, part), dst)
        os.utime(dst, (now + 2 * i, now + 2 * i))
    stream = (
        spark.readStream.schema("user_id int, v int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "sink")
    q = foreach_batch_upsert(stream, out, key_cols=["user_id"])
    deadline = _time.time() + 300
    while q.isActive and _time.time() < deadline:
        q.awaitTermination(5)
    assert not q.isActive and q.exception() is None
    rows = {
        (r["user_id"], r["v"])
        for r in spark.read.parquet(out).select("user_id", "v").collect()
    }
    assert rows == {(None, 2), (7, 1), (8, 2)}, rows


def test_s4_stateful_counts_null_value_contributes_zero(spark, tmp_path):
    """Round-6 review finding: NaN (NULL value) rows hit
    astype('int64'), which silently turns NaN into INT64_MIN and
    poisoned the running accumulator forever. NULLs must contribute 0
    to the value sum (SQL sum-skips-nulls semantics, matching the
    batch twin) while still counting as rows."""
    import os
    import time as _time

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [(1, "2024-01-01 00:00:00", 5, "view", None, "{}"),
            (2, "2024-01-01 00:10:00", 5, "view", 2.5, "{}")]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    got = run_stream(spark, running_user_counts(stream), "s4_nullval", mode="update")
    final = {r["user_id"]: (r["running_count"], r["running_value"]) for r in got.collect()}
    assert final[5] == (2, 2.5), final


def test_s9_stream_static_asof_join_equals_batch(spark, staged, events_batch):
    """C8 under A6 ingest (round-7): the events stream as-of joined
    against a static versioned dimension (per-user purchase history)
    must emit exactly operators/asof.asof_join's batch result — same
    strict-tie, duplicate-version and NULL-key semantics, per row.
    Also re-checked under a tolerance cap, where both sides must null
    out the same too-far matches."""
    from morphl_community_edition_spark.operators.asof import asof_join
    from morphl_community_edition_spark.sources.stream import read_stream_dir
    from morphl_community_edition_spark.streaming.joins import asof_join_stream_static

    dim = events_batch.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    stream = read_stream_dir(spark, staged, "events")
    got = run_stream(
        spark,
        asof_join_stream_static(stream, dim, "user_id", "ts", ["value"]),
        "s9_asof",
        mode="append",
    )
    want = asof_join(events_batch, dim, "user_id", "ts", ["value"], strict=True)
    assert_frames_equal(got, want)

    got_tol = run_stream(
        spark,
        asof_join_stream_static(
            stream, dim, "user_id", "ts", ["value"], tolerance_seconds=3600.0
        ),
        "s9_asof_tol",
        mode="append",
    )
    want_tol = asof_join(
        events_batch, dim, "user_id", "ts", ["value"], strict=True,
        tolerance_seconds=3600.0,
    )
    assert_frames_equal(got_tol, want_tol)
    # the tolerance must actually bite at this fixture, or the second
    # check is the first one again
    n_matched = want.filter(F.col("asof_value").isNotNull()).count()
    n_matched_tol = want_tol.filter(F.col("asof_value").isNotNull()).count()
    assert n_matched_tol < n_matched, "tolerance cap never fired — vacuous"


def test_s10_streaming_hash_rate_sample_equals_batch(spark, staged_docs):
    """K-sampling under A6 ingest (round-7): the deterministic rate
    sampler is a stateless scan-side filter, so it applies to a
    stream UNCHANGED — no watermark, no state — and the streamed
    sample must equal the batch sample exactly (the reproducibility
    property, now across execution modes)."""
    from morphl_community_edition_spark.operators.sampling import hash_rate_sample
    from morphl_community_edition_spark.queries.curation import MIX_RATES
    from morphl_community_edition_spark.sources.stream import read_stream_dir

    stream = read_stream_dir(spark, staged_docs, "documents").select(
        "doc_id", "source"
    )
    got = run_stream(
        spark,
        hash_rate_sample(stream, "doc_id", MIX_RATES, "source"),
        "s10_sample",
        mode="append",
    )
    docs = load_table(spark, SF_DIR_SMOKE, "documents").select("doc_id", "source")
    want = hash_rate_sample(docs, "doc_id", MIX_RATES, "source")
    assert_frames_equal(got, want)


def test_s11_streaming_indexed_dedup_ingest_loop(spark, tmp_path):
    """The full production ingest loop (round-7): documents streamed
    in micro-batches through streaming_dedup_ingest — classify
    against the persisted index, emit verdicts, fold the batch into
    the index — must produce, batch for batch, the SAME verdicts as
    the direct q114 form replayed sequentially (batch i vs the union
    of batches 0..i-1). Starts from an EMPTY index: batch 0 is all
    'unique' by construction, later batches see earlier ones."""
    import glob as _glob

    from morphl_community_edition_spark.operators.incremental_index import (
        build_dedup_index,
        streaming_dedup_ingest,
    )
    from morphl_community_edition_spark.queries.pipeline_ops import (
        incremental_dedup_frame,
    )
    from morphl_community_edition_spark.sources.stream import (
        read_stream_dir,
        stage_stream_input,
    )

    staged = stage_stream_input(
        spark, SF_DIR_SMOKE, "documents", n_chunks=3, order_col="doc_id"
    )
    index_path = str(tmp_path / "index")
    out_path = str(tmp_path / "verdicts")
    empty = spark.createDataFrame([], "doc_id long, text string")
    build_dedup_index(empty, index_path)

    ckpt = str(tmp_path / "ckpt")
    q = streaming_dedup_ingest(
        read_stream_dir(spark, staged, "documents"), index_path, out_path, ckpt
    )
    q.awaitTermination(600)
    assert q.exception() is None

    got = {
        (r["doc_id"], r["status"])
        for r in spark.read.parquet(out_path).collect()
    }

    # direct-form sequential twin over the same chunk files (mtime
    # order == sorted part-name order, the staging contract)
    parts = sorted(_glob.glob(f"{staged}/part-*.parquet"))
    assert len(parts) == 3
    seen = None
    want = set()
    for part in parts:
        chunk = spark.read.parquet(part).select("doc_id", "text")
        # newness rides in the source column (the stage builder prunes
        # to doc_id/source/text, so a side-channel marker would drop)
        marked = chunk.withColumn("source", F.lit("__batch"))
        if seen is not None:
            marked = seen.withColumn("source", F.lit("__corpus")).unionByName(marked)
        res = incremental_dedup_frame(
            marked.select("doc_id", "source", "text"),
            F.col("source") == "__batch",
            n_docs=marked.count(),
        )
        want |= {(r["doc_id"], r["status"]) for r in res.collect()}
        seen = chunk if seen is None else seen.unionByName(chunk)
    assert got == want
    statuses = {s for _, s in got}
    assert "unique" in statuses, "empty-index first batch must be unique"

    # restart with the SAME durable checkpoint: the committed batches
    # must be skipped — no duplicate verdicts, no double-appended
    # index rows, meta unchanged (round-7 review: with a temp
    # checkpoint a restart replayed everything and corrupted the index)
    from morphl_community_edition_spark.operators.incremental_index import (
        read_index_doc_count,
    )

    n_verdicts = spark.read.parquet(out_path).count()
    n_meta = read_index_doc_count(spark, index_path)
    q2 = streaming_dedup_ingest(
        read_stream_dir(spark, staged, "documents"), index_path, out_path, ckpt
    )
    q2.awaitTermination(600)
    assert q2.exception() is None
    assert spark.read.parquet(out_path).count() == n_verdicts, (
        "restart replayed committed batches into the verdict sink"
    )
    assert read_index_doc_count(spark, index_path) == n_meta, (
        "restart double-appended into the index"
    )


def test_s11d_ingest_with_periodic_compaction(spark, tmp_path):
    """Round 10: the ingest loop with compact_every must emit
    byte-identical verdicts to the uncompacted run over the same
    staged chunks, keep index_state identical, and actually shrink
    the slice census; a restart over the compacted index still skips
    committed batches (watermark rides the compacted record)."""
    from morphl_community_edition_spark.operators import manifest as _mf
    from morphl_community_edition_spark.operators.incremental_index import (
        build_dedup_index,
        index_state,
        streaming_dedup_ingest,
    )
    from morphl_community_edition_spark.sources.stream import (
        read_stream_dir,
        stage_stream_input,
    )

    staged = stage_stream_input(
        spark, SF_DIR_SMOKE, "documents", n_chunks=3, order_col="doc_id"
    )
    empty = spark.createDataFrame([], "doc_id long, text string")

    results = {}
    for tag, every in (("plain", None), ("compacted", 2)):
        index_path = str(tmp_path / f"index-{tag}")
        out_path = str(tmp_path / f"verdicts-{tag}")
        build_dedup_index(empty, index_path)
        q = streaming_dedup_ingest(
            read_stream_dir(spark, staged, "documents"),
            index_path, out_path, str(tmp_path / f"ckpt-{tag}"),
            compact_every=every,
        )
        q.awaitTermination(600)
        assert q.exception() is None
        results[tag] = {
            "verdicts": {
                (r["doc_id"], r["status"], r["batch_id"])
                for r in spark.read.parquet(out_path).collect()
            },
            "state": index_state(index_path),
            "slices": len(_mf.committed_slices(index_path)),
        }
    assert results["compacted"]["verdicts"] == results["plain"]["verdicts"]
    # ckpt_tag is md5(checkpoint path) — necessarily differs per run
    for k in ("n_docs", "last_batch_id"):
        assert results["compacted"]["state"][k] == results["plain"]["state"][k]
    assert results["compacted"]["state"]["ckpt_tag"] is not None
    # 3 batches + empty base: plain holds 4 slices; compact_every=2
    # fired after batch 1 (base+b0+b1 -> 1) leaving 1+b2 = 2
    assert results["plain"]["slices"] == 4
    assert results["compacted"]["slices"] == 2

    # restart on the compacted index: committed batches still skipped
    out_path = str(tmp_path / "verdicts-compacted")
    n_before = spark.read.parquet(out_path).count()
    q2 = streaming_dedup_ingest(
        read_stream_dir(spark, staged, "documents"),
        str(tmp_path / "index-compacted"), out_path,
        str(tmp_path / "ckpt-compacted"), compact_every=2,
    )
    q2.awaitTermination(600)
    assert q2.exception() is None
    assert spark.read.parquet(out_path).count() == n_before


def test_s11b_index_append_replay_idempotent(spark, tmp_path):
    """Round-8 advice: foreachBatch is at-least-once, so the index
    fold must be a no-op when a batch_id replays (crash between the
    side effects and the checkpoint advance). Folding batch 0 twice
    must leave postings/doc_stats/hashes/meta exactly as after the
    first fold; folding batch 1 then advances normally; and
    read_verdicts collapses a double-appended verdict batch to one
    copy per (batch_id, doc_id)."""
    from morphl_community_edition_spark.operators.incremental_index import (
        append_to_index,
        build_dedup_index,
        read_index_doc_count,
        read_index_last_batch_id,
        read_verdicts,
    )

    index_path = str(tmp_path / "index")
    empty = spark.createDataFrame([], "doc_id long, text string")
    build_dedup_index(empty, index_path)
    assert read_index_last_batch_id(spark, index_path) is None

    docs = (
        load_table(spark, SF_DIR_SMOKE, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(40)
        .localCheckpoint(eager=True)
    )
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)

    append_to_index(b0, index_path, batch_id=0)
    from morphl_community_edition_spark.operators.incremental_index import (
        _read_table,
    )

    state = {
        t: _read_table(spark, index_path, t).count()
        for t in ("postings", "doc_stats", "hashes")
    }
    n0 = read_index_doc_count(spark, index_path)
    assert read_index_last_batch_id(spark, index_path) == 0

    # replay of the SAME batch id: every table must be untouched
    append_to_index(b0, index_path, batch_id=0)
    for t, n in state.items():
        assert (
            _read_table(spark, index_path, t).count() == n
        ), f"replayed fold double-appended {t}"
    assert read_index_doc_count(spark, index_path) == n0
    assert read_index_last_batch_id(spark, index_path) == 0

    # the next batch id advances normally
    append_to_index(b1, index_path, batch_id=1)
    assert read_index_doc_count(spark, index_path) == n0 + b1.count()
    assert read_index_last_batch_id(spark, index_path) == 1
    assert _read_table(spark, index_path, "postings").count() > state["postings"]

    # verdict-sink replay: duplicate rows collapse at read time
    out_path = str(tmp_path / "verdicts")
    verdicts = b0.select(
        "doc_id", F.lit("unique").alias("status"), F.lit(0).cast("long").alias("batch_id")
    )
    verdicts.write.mode("append").parquet(out_path)
    verdicts.write.mode("append").parquet(out_path)  # the replay
    assert spark.read.parquet(out_path).count() == 2 * b0.count()
    assert read_verdicts(spark, out_path).count() == b0.count()


def test_s11c_midfold_crash_replay_probe_unchanged(spark, tmp_path):
    """Mid-fold crash atomicity (round 9, rename-as-commit): a crash
    inside append_to_index leaves slice tables WITHOUT a manifest
    record — invisible to every reader — and the replay overwrites
    the same deterministic slice id, then commits once. The crashed
    index must end probe-EQUIVALENT to a clean single-append index
    with the defensive read dedup OFF (the commit protocol, not the
    dedup, is now the exactly-once mechanism): identical verdicts,
    identical committed postings row count, identical doc count."""
    from morphl_community_edition_spark.operators.incremental_index import (
        _read_table,
        _slice_sid,
        _write_index_tables,
        append_to_index,
        build_dedup_index,
        incremental_dedup_with_index,
        read_index_doc_count,
    )

    docs = (
        load_table(spark, SF_DIR_SMOKE, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(60)
        .localCheckpoint(eager=True)
    )
    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    bx = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)

    # clean reference: build + one clean append + probe (dedup OFF —
    # the commit protocol alone must carry exactly-once)
    ref_path = str(tmp_path / "ref")
    build_dedup_index(b0, ref_path)
    append_to_index(bx, ref_path, batch_id=0)
    n_ref = read_index_doc_count(spark, ref_path) + b2.count()
    want = {
        tuple(r)
        for r in incremental_dedup_with_index(
            spark, ref_path, b2, n_docs=n_ref, defensive_read_dedup=False
        ).collect()
    }

    # crashed fold: slice tables written, manifest commit missing;
    # then the replay overwrites the slice and commits once
    crash_path = str(tmp_path / "crash")
    build_dedup_index(b0, crash_path)
    _write_index_tables(bx, crash_path, "text", sid=_slice_sid(0), batch_id=0)
    import os as _os

    assert _os.path.isdir(
        _os.path.join(crash_path, "postings", _slice_sid(0))
    ), "fixture failed to write the crashed slice — test went vacuous"
    assert read_index_doc_count(spark, crash_path) == b0.count(), (
        "uncommitted slice leaked into the doc count"
    )
    append_to_index(bx, crash_path, batch_id=0)  # the replay
    assert (
        _read_table(spark, crash_path, "postings").count()
        == _read_table(spark, ref_path, "postings").count()
    ), "replay did not converge to the clean index's committed postings"
    n_crash = read_index_doc_count(spark, crash_path) + b2.count()
    assert n_crash == n_ref, "doc count diverged across the crash replay"
    got = {
        tuple(r)
        for r in incremental_dedup_with_index(
            spark, crash_path, b2, n_docs=n_crash, defensive_read_dedup=False
        ).collect()
    }
    assert got == want


def test_s12_streaming_mg_candidates_superset_and_recount(spark, tmp_path):
    """Heavy hitters under A6 ingest (round-8): streaming Misra-Gries
    candidate state (applyInPandasWithState, one MG(k) summary per
    vocabulary slice, re-emitted per trigger with a monotone ver)
    must end with a candidate union that is a SUPERSET of the true
    stream-lifetime heavy hitters, and the recount composition over
    those candidates must equal the exact batch answer — the
    streaming sketch, like the batch one, must be invisible in the
    answer. The stream is a deterministic skewed corpus (5 hot words
    at 15% each + 200 cold words) sized so MG pruning actually fires
    (k=8 counters per slice vs ~50 distinct words per slice) —
    the smoke fixture's 31-word vocabulary can't prune non-vacuously."""
    from collections import Counter

    import pandas as pd

    from morphl_community_edition_spark.operators.heavyhitters import (
        streaming_mg_candidates,
    )
    from morphl_community_edition_spark.sources.stream import read_stream_dir

    k = 8
    hot = [f"hot{i}" for i in range(5)]
    cold = [f"cold{i}" for i in range(200)]
    stream_dir = str(tmp_path / "mg_stream")
    os.makedirs(stream_dir)
    all_words = []
    for chunk in range(3):
        words = []
        for h in hot:
            words += [h] * 225
        words += [cold[(chunk * 375 + i) % 200] for i in range(375)]
        all_words += words
        pd.DataFrame({"word": words}).to_parquet(
            f"{stream_dir}/part-{chunk:04d}.parquet"
        )
    stream = read_stream_dir(spark, stream_dir, name="__synthetic_words")
    emitted = run_stream(
        spark,
        streaming_mg_candidates(stream, "word", k=k, n_slices=4),
        "s12_mg",
        mode="update",
    ).toPandas()
    # last emission per slice is that slice's final summary
    last_ver = emitted.groupby("slice")["ver"].transform("max")
    cand = set(emitted[emitted["ver"] == last_ver]["item"])
    assert emitted["ver"].max() > 1, "stream collapsed to one batch — not a state test"

    counts = Counter(all_words)
    n = len(all_words)
    exact = {w: c for w, c in counts.items() if c * k > n}
    assert set(exact) == set(hot), exact  # the fixture is non-vacuous by design
    assert set(exact) <= cand, sorted(set(exact) - cand)[:5]
    assert len(cand) < len(counts), "MG never pruned — vacuous superset"

    # recount composition == exact batch answer
    got = {(w, counts[w]) for w in cand if counts[w] * k > n}
    assert got == set(exact.items())


def test_s13_streaming_ann_serve_equals_batch(spark, tmp_path):
    """Continuous retrieval serving under A6 ingest (round-8): probe
    vectors streamed in micro-batches through streaming_ann_serve
    (foreachBatch against the q150 persisted index) must produce, per
    batch, EXACTLY the batch ann_index_topk answer for that probe
    slice — and the union equals one batch serve of all probes (the
    serve is per-probe independent, so slicing must be invisible).
    Restart with the same durable checkpoint appends nothing new."""
    import glob as _glob

    from morphl_community_edition_spark.catalog import load_table
    from morphl_community_edition_spark.operators.ann_index import (
        ann_index_topk,
        build_ann_index,
        read_serve_results,
        streaming_ann_serve,
    )
    from morphl_community_edition_spark.sources.stream import (
        read_stream_dir,
        stage_stream_input,
    )

    emb = load_table(spark, SF_DIR_SMOKE, "embeddings")
    index_path = str(tmp_path / "ann")
    build_ann_index(emb, index_path, n_cells=8)

    staged = stage_stream_input(
        spark, SF_DIR_SMOKE, "embeddings", n_chunks=3, order_col="vec_id"
    )
    out_path = str(tmp_path / "served")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_ann_serve(
        read_stream_dir(spark, staged, "embeddings"),
        index_path, out_path, ckpt, k=3, n_candidates=20, n_probe=3,
    )
    q.awaitTermination(600)
    assert q.exception() is None

    got = {
        (r["q_vec"], r["n_vec"], r["sim"], r["rnk"])
        for r in read_serve_results(spark, out_path).collect()
    }
    want = {
        tuple(r)
        for r in ann_index_topk(
            spark, index_path, emb, k=3, n_candidates=20, n_probe=3
        ).collect()
    }
    assert got == want
    assert len(got) > 0
    n_batches = len({r["batch_id"] for r in spark.read.parquet(out_path).collect()})
    assert n_batches == 3, f"expected 3 micro-batches, saw {n_batches}"

    # restart on the committed checkpoint: nothing re-served
    n_rows = spark.read.parquet(out_path).count()
    q2 = streaming_ann_serve(
        read_stream_dir(spark, staged, "embeddings"),
        index_path, out_path, ckpt, k=3, n_candidates=20, n_probe=3,
    )
    q2.awaitTermination(600)
    assert q2.exception() is None
    assert spark.read.parquet(out_path).count() == n_rows


def test_s14_streaming_rollup_ingest(spark, tmp_path):
    """Continuous rollup maintenance (round 11): lineitem streamed in
    3 micro-batches through streaming_rollup_ingest must serve exactly
    the full-table aggregate — and a restart on the committed
    checkpoint folds nothing twice (slice-per-batch idempotence). A
    second checkpoint feeding the same rollup fails loudly (batch-id
    provenance guard)."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        RollupSpec,
        build_rollup,
        read_rollup,
        streaming_rollup_ingest,
    )

    spec = RollupSpec(keys=("l_suppkey",), measures={"l_quantity": 2}, extrema=("l_orderkey",))
    li = load_table(spark, SF_DIR_SMOKE, "lineitem")
    staged = stage_stream_input(
        spark, SF_DIR_SMOKE, "lineitem", n_chunks=3, order_col="l_orderkey"
    )
    path = str(tmp_path / "rollup")
    build_rollup(li.limit(0), spec, path)  # empty base: stream-fed from zero

    ckpt = str(tmp_path / "ckpt")
    q = streaming_rollup_ingest(read_stream_dir(spark, staged, "lineitem"), path, ckpt)
    q.awaitTermination(600)
    assert q.exception() is None

    def served():
        return {
            tuple(r) for r in read_rollup(spark, path).collect()
        }

    # direct twin: one-shot states over the full table, finalized the
    # same way — build a second rollup from the batch API
    twin = str(tmp_path / "twin")
    build_rollup(li, spec, twin)
    assert served() == {tuple(r) for r in read_rollup(spark, twin).collect()}

    # restart on the committed checkpoint: no new folds
    before = served()
    q2 = streaming_rollup_ingest(read_stream_dir(spark, staged, "lineitem"), path, ckpt)
    q2.awaitTermination(600)
    assert q2.exception() is None
    assert served() == before

    # a different checkpoint cannot feed this rollup
    with pytest.raises(ValueError, match="different checkpoint"):
        streaming_rollup_ingest(
            read_stream_dir(spark, staged, "lineitem"), path, str(tmp_path / "ckpt2")
        )


def test_s15_streaming_hist_ingest(spark, tmp_path):
    """Continuous quantile-histogram maintenance (round 12): lineitem
    streamed in 3 micro-batches through streaming_hist_ingest must
    serve exactly the percentiles a one-shot histogram build computes;
    a restart on the committed checkpoint folds nothing twice, and a
    foreign checkpoint is rejected (the S14 contract, quantile
    member)."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        HistSpec,
        build_hist_rollup,
        quantiles_from_hist,
        streaming_hist_ingest,
    )

    spec = HistSpec(keys=("l_suppkey",), value="l_quantity", scale=0)
    li = load_table(spark, SF_DIR_SMOKE, "lineitem")
    staged = stage_stream_input(
        spark, SF_DIR_SMOKE, "lineitem", n_chunks=3, order_col="l_orderkey"
    )
    path = str(tmp_path / "hist")
    build_hist_rollup(li.limit(0), spec, path)  # empty base: stream-fed

    ckpt = str(tmp_path / "ckpt")
    q = streaming_hist_ingest(read_stream_dir(spark, staged, "lineitem"), path, ckpt)
    q.awaitTermination(600)
    assert q.exception() is None

    pcts = {"p50": (1, 2), "p95": (19, 20)}

    def served():
        return {tuple(r) for r in quantiles_from_hist(spark, path, pcts).collect()}

    twin = str(tmp_path / "twin")
    build_hist_rollup(li, spec, twin)
    want = {tuple(r) for r in quantiles_from_hist(spark, twin, pcts).collect()}
    assert served() == want and want

    before = served()
    q2 = streaming_hist_ingest(read_stream_dir(spark, staged, "lineitem"), path, ckpt)
    q2.awaitTermination(600)
    assert q2.exception() is None
    assert served() == before

    with pytest.raises(ValueError, match="different checkpoint"):
        streaming_hist_ingest(
            read_stream_dir(spark, staged, "lineitem"), path, str(tmp_path / "ckpt2")
        )


def test_s16_compaction_crash_replay_skips_tombstoned_fold(spark, tmp_path):
    """Crash BETWEEN fold-commit and checkpoint-advance, with a
    compaction in between (round 13, verdict r12 #7 — the S11c
    sequence for the ROLLUP family): batch b2's fold commits, the
    process dies before the checkpoint records b2, a maintenance
    compact_rollup tombstones every slice including b2's, and the
    stream restarts. The replayed handler call must hit the
    on_tombstoned="skip" path (its data already lives in the compacted
    slice) — no crash-loop, no double-fold — and the served rollup
    must stay byte-equal to a one-shot batch build.

    The crash is simulated deterministically: the stream runs on a
    staging dir holding only chunks 0-1 (checkpoint advances past b0,
    b1), then chunk 2's fold is applied manually under the exact sid
    the handler would derive (the fold-committed-checkpoint-didn't
    state), compact_rollup runs, chunk 2's file lands, and the same
    checkpoint resumes — Spark assigns it batch id 2, replaying the
    handler call with identical (data, batch_id)."""
    from morphl_community_edition_spark.operators import manifest
    from morphl_community_edition_spark.operators.incremental_agg import (
        RollupSpec,
        append_rollup,
        build_rollup,
        compact_rollup,
        read_rollup,
        streaming_rollup_ingest,
    )

    spec = RollupSpec(
        keys=("l_suppkey",), measures={"l_quantity": 2}, extrema=("l_orderkey",)
    )
    li = load_table(spark, SF_DIR_SMOKE, "lineitem")
    staged_full = stage_stream_input(
        spark, SF_DIR_SMOKE, "lineitem", n_chunks=3, order_col="l_orderkey"
    )
    parts = sorted(
        f for f in os.listdir(staged_full) if f.endswith(".parquet")
    )
    assert len(parts) == 3, f"staging produced {len(parts)} files, want 3"

    # staging dir that starts with chunks 0-1 only; chunk 2 arrives
    # post-"crash" (mtimes preserved so batch order matches file order)
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    for p in parts[:2]:
        src = os.path.join(staged_full, p)
        shutil.copy2(src, os.path.join(staged, p))

    path = str(tmp_path / "rollup")
    build_rollup(li.limit(0), spec, path)
    ckpt = str(tmp_path / "ckpt")
    q = streaming_rollup_ingest(read_stream_dir(spark, staged, "lineitem"), path, ckpt)
    q.awaitTermination(600)
    assert q.exception() is None

    # b2's fold commits (the handler's exact sid), checkpoint does NOT
    # advance — then maintenance compacts, tombstoning b0/b1/b2
    chunk2 = spark.read.parquet(os.path.join(staged_full, parts[2]))
    append_rollup(chunk2, path, sid="b000000002")
    assert compact_rollup(spark, path) == 4  # base + b0 + b1 + b2
    tombstoned = {
        s for r in manifest.committed_slices(path) for s in r.get("replaces", [])
    }
    assert "b000000002" in tombstoned, "fixture went vacuous: b2 not tombstoned"
    # the crash-loop counterfactual: an error-mode fold of the same sid
    # would fail forever on every restart
    with pytest.raises(ValueError, match="compacted away"):
        append_rollup(chunk2, path, sid="b000000002")

    # chunk 2 lands; the same checkpoint resumes and replays it as b2
    src2 = os.path.join(staged_full, parts[2])
    dst2 = os.path.join(staged, parts[2])
    shutil.copy2(src2, dst2)
    now = time.time()
    os.utime(dst2, (now + 60, now + 60))
    q2 = streaming_rollup_ingest(read_stream_dir(spark, staged, "lineitem"), path, ckpt)
    q2.awaitTermination(600)
    assert q2.exception() is None, f"replay crash-looped: {q2.exception()}"

    # no double-fold: the compacted slice is still the only visible one
    live = [r["sid"] for r in manifest.committed_slices(path)]
    assert len(live) == 1 and live[0].startswith("compacted-"), live

    # byte-equal verdict vs a one-shot batch build over the full table
    twin = str(tmp_path / "twin")
    build_rollup(li, spec, twin)
    got = {tuple(r) for r in read_rollup(spark, path).collect()}
    want = {tuple(r) for r in read_rollup(spark, twin).collect()}
    assert got == want and want, "replayed rollup diverged from batch twin"


def test_s17_streaming_cdc_hist_ingest(spark, tmp_path):
    """CDC-mode streaming histogram maintenance (round 13): a change
    stream whose rows carry an op column — inserts AND deletes — is
    folded one atomic signed slice per micro-batch. After the stream
    quiesces the served quantiles must equal a from-scratch build over
    base + inserts − deletes (the corrected fact), a checkpoint
    restart folds nothing twice, and no negative nets remain."""
    import os
    import shutil
    import tempfile
    import time

    from morphl_community_edition_spark.operators.incremental_agg import (
        HistSpec,
        build_hist_rollup,
        quantiles_from_hist,
        streaming_hist_ingest,
        validate_hist,
    )

    spec = HistSpec(keys=("g",), value="x", scale=0)
    rows0 = [(i % 3, float(i % 20)) for i in range(200)]
    rows1 = [(i % 3, float((i * 3) % 20)) for i in range(200, 350)]
    rows2 = [(i % 3, float((i * 7) % 20)) for i in range(350, 400)]
    del0 = [r for i, r in enumerate(rows0) if i % 2 == 0]   # correct half the base
    del1 = [r for i, r in enumerate(rows1) if i % 5 == 0]   # and a fifth of batch 1
    chunks = [
        [(g, x, "I") for g, x in rows1],
        [(g, x, "I") for g, x in rows2] + [(g, x, "D") for g, x in del0],
        # one within-batch net-zero pair: inserted and deleted in the
        # same change batch — must leave no trace in the slice
        [(g, x, "D") for g, x in del1] + [(9, 99.0, "I"), (9, 99.0, "D")],
    ]
    staged = str(tmp_path / "cdc")
    os.makedirs(staged)
    now = time.time()
    for i, rows in enumerate(chunks):
        tmp = tempfile.mkdtemp(prefix="cdcchunk_")
        spark.createDataFrame(rows, "g int, x double, op string").coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
        dst = os.path.join(staged, f"part-{i:02d}.parquet")
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (now + 2 * i, now + 2 * i))
        shutil.rmtree(tmp, ignore_errors=True)

    path = str(tmp_path / "hist")
    build_hist_rollup(
        spark.createDataFrame(rows0, "g int, x double"), spec, path
    )
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("g int, x double, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    q = streaming_hist_ingest(stream, path, ckpt, op_col="op")
    q.awaitTermination(600)
    assert q.exception() is None

    pcts = {"p50": (1, 2), "p95": (19, 20)}

    def served():
        return {tuple(r) for r in quantiles_from_hist(spark, path, pcts).collect()}

    corrected = list(rows0) + rows1 + rows2
    for r in del0 + del1:
        corrected.remove(r)
    twin = str(tmp_path / "twin")
    build_hist_rollup(
        spark.createDataFrame(corrected, "g int, x double"), spec, twin
    )
    want = {tuple(r) for r in quantiles_from_hist(spark, twin, pcts).collect()}
    assert served() == want and want
    assert validate_hist(spark, path).count() == 0

    # restart on the committed checkpoint: no re-folds, serve unchanged
    before = served()
    stream2 = (
        spark.readStream.schema("g int, x double, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    q2 = streaming_hist_ingest(stream2, path, ckpt, op_col="op")
    q2.awaitTermination(600)
    assert q2.exception() is None
    assert served() == before


def test_s18_streaming_cdc_rollup_ingest(spark, tmp_path):
    """CDC-mode streaming SUMMARY-rollup maintenance (round 13 — the
    S17 contract for the sums/counts kind): a change stream with an op
    column folds one atomic signed slice per micro-batch; after
    quiescence the served sums/averages equal a from-scratch build
    over base + inserts − deletes; restart folds nothing twice; an
    extrema spec is refused at stream start."""
    import os
    import shutil
    import tempfile
    import time

    from morphl_community_edition_spark.operators.incremental_agg import (
        RollupSpec,
        build_rollup,
        read_rollup,
        streaming_rollup_ingest,
        validate_rollup,
    )

    spec = RollupSpec(keys=("g",), measures={"x": 2}, extrema=())
    rows0 = [(i % 3, float(i % 20)) for i in range(200)]
    rows1 = [(i % 3, float((i * 3) % 20)) for i in range(200, 350)]
    del0 = [r for i, r in enumerate(rows0) if i % 2 == 0]
    chunks = [
        [(g, x, "I") for g, x in rows1],
        [(g, x, "D") for g, x in del0] + [(9, 99.0, "I"), (9, 99.0, "D")],
    ]
    staged = str(tmp_path / "cdc")
    os.makedirs(staged)
    now = time.time()
    for i, rows in enumerate(chunks):
        tmp = tempfile.mkdtemp(prefix="cdcchunk_")
        spark.createDataFrame(rows, "g int, x double, op string").coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
        dst = os.path.join(staged, f"part-{i:02d}.parquet")
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (now + 2 * i, now + 2 * i))
        shutil.rmtree(tmp, ignore_errors=True)

    path = str(tmp_path / "rollup")
    build_rollup(spark.createDataFrame(rows0, "g int, x double"), spec, path)
    ckpt = str(tmp_path / "ckpt")

    def stream():
        return (
            spark.readStream.schema("g int, x double, op string")
            .option("maxFilesPerTrigger", 1)
            .parquet(staged)
        )

    q = streaming_rollup_ingest(stream(), path, ckpt, op_col="op")
    q.awaitTermination(600)
    assert q.exception() is None

    def served():
        return {tuple(r) for r in read_rollup(spark, path).collect()}

    corrected = list(rows0) + rows1
    for r in del0:
        corrected.remove(r)
    twin = str(tmp_path / "twin")
    build_rollup(spark.createDataFrame(corrected, "g int, x double"), spec, twin)
    want = {tuple(r) for r in read_rollup(spark, twin).collect()}
    assert served() == want and want
    assert validate_rollup(spark, path).count() == 0

    before = served()
    q2 = streaming_rollup_ingest(stream(), path, ckpt, op_col="op")
    q2.awaitTermination(600)
    assert q2.exception() is None
    assert served() == before

    # CDC refuses an extrema-maintaining rollup at stream start
    epath = str(tmp_path / "er")
    build_rollup(
        spark.createDataFrame(rows0, "g int, x double"),
        RollupSpec(keys=("g",), measures={}, extrema=("x",)),
        epath,
    )
    with pytest.raises(ValueError, match="extrema"):
        streaming_rollup_ingest(stream(), epath, str(tmp_path / "ckpt3"), op_col="op")
