"""Object-store-safe (rename-free) commit protocol — round 11,
verdict r10 #5 — plus the compaction-vs-live-writer race fix (#6).

The manifest module's default commit primitive is temp-file +
``os.replace``; an object store without atomic rename can't honor it.
The versioned protocol replaces every logical record with write-once
``<name>.v<N>.json`` files (content-complete = committed). These
tests run the FULL index lifecycle — build, append, classify,
compact, replay, torn-write recovery, streaming ingest — under a
filesystem shim that makes ``os.replace`` raise for any path under
the index root, proving the protocol never renames.

Scope (mirrors manifest.py's module note): the protocol removes
rename-dependence from the COMMIT layer, which is the correctness
boundary of the index family. Slice DATA files are placed by Spark's
own output committer, whose cloud-native variants (S3A magic
committer etc.) solve that layer upstream of this engine.
"""

from __future__ import annotations

import json
import os

import pytest

from morphl_community_edition_spark.operators import manifest as mf
from tests.conftest import SF_DIR_SMOKE


def _ban_replace_under(monkeypatch, root: str) -> None:
    """Shim: os.replace on any destination under ``root`` raises —
    the 'object store without atomic rename' filesystem."""
    real = os.replace

    def guarded(src, dst, *a, **k):
        if os.path.abspath(str(dst)).startswith(os.path.abspath(root)):
            raise AssertionError(
                f"os.replace({src!r}, {dst!r}) under a versioned root — "
                "the rename-free protocol leaked a rename"
            )
        return real(src, dst, *a, **k)

    monkeypatch.setattr(os, "replace", guarded)


def test_versioned_record_layer(tmp_path):
    """Pure record-layer semantics: newest-valid-wins, torn and
    sentinel-less candidates skipped, plain-file fallback, replay
    stacking, GC helpers."""
    root = str(tmp_path / "idx")
    fp = os.path.join(root, "manifest", "base.json")

    # rename mode first (pre-migration history)
    mf.write_json_record(fp, {"sid": "base", "n_docs": 1}, root=root)
    assert os.path.exists(fp)
    assert mf.read_json_record(fp) == {"sid": "base", "n_docs": 1}

    mf.use_versioned_commits(root)
    assert mf.is_versioned(root)
    mf.write_json_record(fp, {"sid": "base", "n_docs": 2}, root=root)
    assert os.path.exists(fp[:-5] + ".v1.json")
    assert mf.read_json_record(fp) == {"sid": "base", "n_docs": 2}

    # torn newer version (truncated JSON) -> fall back to v1
    with open(fp[:-5] + ".v2.json", "w") as f:
        f.write('{"sid": "base", "n_docs": 3')
    assert mf.read_json_record(fp) == {"sid": "base", "n_docs": 2}
    # parseable but sentinel-less (interrupted writer flushed a valid
    # prefix-object) -> also rejected
    with open(fp[:-5] + ".v3.json", "w") as f:
        json.dump({"sid": "base", "n_docs": 4}, f)
    assert mf.read_json_record(fp) == {"sid": "base", "n_docs": 2}
    # next write must step PAST the torn versions, never reuse them
    mf.write_json_record(fp, {"sid": "base", "n_docs": 5}, root=root)
    assert mf.newest_record_path(fp).endswith(".v4.json")
    assert mf.read_json_record(fp) == {"sid": "base", "n_docs": 5}

    assert mf.list_record_sids(root) == {"base"}
    assert mf.record_file_exists(fp)
    mf.delete_record(fp)
    assert not mf.record_file_exists(fp)
    assert mf.read_json_record(fp) is None


def test_versioned_build_once_commit(tmp_path, monkeypatch):
    """_COMMIT marker under the shim: committed reads back, a torn
    marker with no complete predecessor is rejected loudly."""
    root = str(tmp_path / "ann")
    mf.use_versioned_commits(root)
    _ban_replace_under(monkeypatch, root)

    assert mf.read_commit(root) is None
    with pytest.raises(RuntimeError, match="no _COMMIT marker"):
        mf.require_commit(root, "test index")
    mf.write_commit(root, {"k": 7})
    assert mf.require_commit(root, "test index") == {"k": 7}
    assert not os.path.exists(os.path.join(root, mf.COMMIT_MARKER))

    # torn-only marker at a fresh root -> still uncommitted
    root2 = str(tmp_path / "ann2")
    mf.use_versioned_commits(root2)
    with open(os.path.join(root2, mf.COMMIT_MARKER + ".v1.json"), "w") as f:
        f.write('{"k": 9')
    with pytest.raises(RuntimeError, match="no _COMMIT marker"):
        mf.require_commit(root2, "test index")

    # rebuild protocol: clear then recommit stacks a new version
    mf.clear_commit(root)
    assert mf.read_commit(root) is None
    mf.write_commit(root, {"k": 8})
    assert mf.require_commit(root, "test index") == {"k": 8}


def test_versioned_index_lifecycle_no_rename(spark, tmp_path, monkeypatch):
    """The dedup index's full lifecycle — build, two folds, classify,
    compact, replay, reuse guard — under versioned commits with
    os.replace BANNED for the index root. Verdicts must match the
    identical lifecycle run under the default rename protocol."""
    from morphl_community_edition_spark.operators.incremental_index import (
        append_to_index,
        assert_no_doc_id_reuse,
        build_dedup_index,
        compact_index,
        incremental_dedup_with_index,
        index_state,
    )

    base = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i} x{i} y{i}") for i in range(10)],
        "doc_id long, text string",
    )
    b0 = spark.createDataFrame(
        [(10, "alpha beta gamma delta w0 x0 y0"), (11, "iota kappa mu nu pq rs tu")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(12, "iota kappa mu nu pq rs tu")], "doc_id long, text string"
    )
    probe = spark.createDataFrame(
        [(90, "alpha beta gamma delta w0 x0 y0"),
         (91, "zz qq completely fresh words here")],
        "doc_id long, text string",
    )

    def lifecycle(path):
        build_dedup_index(base, path)
        append_to_index(b0, path, batch_id=0, ckpt_tag="t1")
        append_to_index(b1, path, batch_id=1, ckpt_tag="t1")
        st = index_state(path)
        before = sorted(
            map(tuple, incremental_dedup_with_index(
                spark, path, probe, n_docs=st["n_docs"] + 2
            ).collect())
        )
        assert compact_index(spark, path) == 3
        assert index_state(path) == st
        after = sorted(
            map(tuple, incremental_dedup_with_index(
                spark, path, probe, n_docs=st["n_docs"] + 2
            ).collect())
        )
        assert after == before
        # replay of an already-folded batch id is a no-op
        append_to_index(b1, path, batch_id=1, ckpt_tag="t1")
        assert index_state(path) == st
        # reuse guard still sees pre-compaction ids
        bad = spark.createDataFrame([(10, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="re-submits doc_id"):
            assert_no_doc_id_reuse(spark, path, bad, batch_id=5)
        return before

    plain = lifecycle(str(tmp_path / "idx-rename"))

    vpath = str(tmp_path / "idx-versioned")
    mf.use_versioned_commits(vpath)
    _ban_replace_under(monkeypatch, vpath)
    versioned = lifecycle(vpath)
    assert versioned == plain

    # protocol choice persisted on disk (a second writer process
    # would inherit it through the hint file, not the in-memory set)
    assert os.path.exists(os.path.join(vpath, mf.PROTOCOL_MARKER))
    mf._VERSIONED_ROOTS.discard(os.path.abspath(vpath))
    assert mf.is_versioned(vpath)


def test_versioned_s11_streaming_ingest_no_rename(spark, tmp_path, monkeypatch):
    """S11 (the streaming ingest-dedup loop) green under the
    no-atomic-rename shim: verdicts equal the rename-mode run over
    the same staged chunks, restart skips committed batches."""
    from morphl_community_edition_spark.operators.incremental_index import (
        build_dedup_index,
        read_index_doc_count,
        streaming_dedup_ingest,
    )
    from morphl_community_edition_spark.sources.stream import (
        read_stream_dir,
        stage_stream_input,
    )

    staged = stage_stream_input(
        spark, SF_DIR_SMOKE, "documents", n_chunks=2, order_col="doc_id"
    )
    empty = spark.createDataFrame([], "doc_id long, text string")

    def run(tag, versioned):
        index_path = str(tmp_path / f"index-{tag}")
        out_path = str(tmp_path / f"verdicts-{tag}")
        ckpt = str(tmp_path / f"ckpt-{tag}")
        if versioned:
            mf.use_versioned_commits(index_path)
            _ban_replace_under(monkeypatch, index_path)
        build_dedup_index(empty, index_path)
        q = streaming_dedup_ingest(
            read_stream_dir(spark, staged, "documents"), index_path, out_path, ckpt
        )
        q.awaitTermination(600)
        assert q.exception() is None
        got = {
            (r["doc_id"], r["status"])
            for r in spark.read.parquet(out_path).collect()
        }
        # restart on the same checkpoint: committed batches skipped
        q2 = streaming_dedup_ingest(
            read_stream_dir(spark, staged, "documents"), index_path, out_path, ckpt
        )
        q2.awaitTermination(600)
        assert q2.exception() is None
        assert spark.read.parquet(out_path).count() == len(got)
        return got, read_index_doc_count(spark, index_path)

    got_plain, n_plain = run("rename", versioned=False)
    got_versioned, n_versioned = run("versioned", versioned=True)
    assert got_versioned == got_plain
    assert n_versioned == n_plain


def test_compact_index_concurrent_append_race(spark, tmp_path):
    """Round-11 race fix: a fold that commits WHILE compaction is
    copying tables must survive intact beside the compacted slice —
    one consistent manifest snapshot drives all four table unions
    (the old per-table re-list let the late fold enter some unions
    but not others AND stay live: torn slice + double count)."""
    import morphl_community_edition_spark.operators.incremental_index as ii

    path = str(tmp_path / "idx")
    base = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i} x{i} y{i}") for i in range(8)],
        "doc_id long, text string",
    )
    ii.build_dedup_index(base, path)
    ii.append_to_index(
        spark.createDataFrame(
            [(10, "alpha beta gamma delta w0 x0 y0")], "doc_id long, text string"
        ),
        path, batch_id=0, ckpt_tag="t1",
    )

    late = spark.createDataFrame(
        [(11, "iota kappa mu nu pq rs tu uv")], "doc_id long, text string"
    )
    real_read = ii._read_table_slices
    fired = {"done": False}

    def inject(spark_, p, name, sids):
        # commit a concurrent fold between the snapshot and the first
        # table union — the exact mid-compaction window
        if not fired["done"]:
            fired["done"] = True
            ii.append_to_index(late, p, batch_id=1, ckpt_tag="t1")
        return real_read(spark_, p, name, sids)

    ii._read_table_slices = inject
    try:
        merged = ii.compact_index(spark, path)
    finally:
        ii._read_table_slices = real_read
    assert fired["done"]
    assert merged == 2  # base + batch-0; the late fold was not part of it

    st = ii.index_state(path)
    assert st["n_docs"] == 8 + 1 + 1  # nothing lost, nothing doubled
    assert st["last_batch_id"] == 1
    sids = sorted(r["sid"] for r in mf.committed_slices(path))
    assert len(sids) == 2 and sids[0].startswith("batch-") and sids[1].startswith("compacted-")

    # every table's row multiset equals a never-compacted twin's
    twin = str(tmp_path / "twin")
    ii.build_dedup_index(base, twin)
    ii.append_to_index(
        spark.createDataFrame(
            [(10, "alpha beta gamma delta w0 x0 y0")], "doc_id long, text string"
        ),
        twin, batch_id=0, ckpt_tag="t1",
    )
    ii.append_to_index(late, twin, batch_id=1, ckpt_tag="t1")
    for t in ii.INDEX_TABLES:
        got = sorted(map(tuple, ii._read_table(spark, path, t).collect()))
        want = sorted(map(tuple, ii._read_table(spark, twin, t).collect()))
        assert got == want, f"table {t} diverged after the race"

    # classification over the raced index equals the twin's
    probe = spark.createDataFrame(
        [(90, "iota kappa mu nu pq rs tu uv"), (91, "fresh words entirely aa bb")],
        "doc_id long, text string",
    )
    n = st["n_docs"] + 2
    got_v = sorted(map(tuple, ii.incremental_dedup_with_index(spark, path, probe, n_docs=n).collect()))
    want_v = sorted(map(tuple, ii.incremental_dedup_with_index(spark, twin, probe, n_docs=n).collect()))
    assert got_v == want_v

    # the late fold merges on the NEXT compaction
    assert ii.compact_index(spark, path) == 2
    assert ii.index_state(path) == st
