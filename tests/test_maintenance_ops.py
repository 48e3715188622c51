"""Round-11-continuation operators: incremental rollup maintenance
(crash/replay semantics beyond the q159 oracle), HLL sketch-rollup
accuracy vs its exact twin, PSI drift sanity, z-order locality — the
suite-level checks the DuckDB hash gate can't express."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from morphl_community_edition_spark.operators import manifest
from morphl_community_edition_spark.operators.incremental_agg import (
    RollupSpec,
    append_rollup,
    build_rollup,
    read_rollup,
    rollup_spec,
)
from tests.conftest import SF_DIR


def _facts(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id").cast("double") / 100.0).alias("v"),
        F.col("id").alias("k"),
    )


_SPEC = RollupSpec(keys=("g",), measures={"v": 2}, extrema=("k",))


def _served(spark, path):
    return {
        r["g"]: (r["n_rows"], r["v_sum"], r["v_avg"], r["k_min"], r["k_max"])
        for r in read_rollup(spark, path).collect()
    }


def _oracle(spark, lo, hi):
    df = _facts(spark, lo, hi)
    from morphl_community_edition_spark.functions.rounding import dsum, davg

    return {
        r["g"]: (r["n_rows"], r["v_sum"], r["v_avg"], r["k_min"], r["k_max"])
        for r in df.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            dsum(F.col("v")).alias("v_sum"),
            davg(F.col("v")).alias("v_avg"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .collect()
    }


def test_rollup_fold_merge_equals_recompute(spark, tmp_path):
    path = str(tmp_path / "ru")
    build_rollup(_facts(spark, 0, 500), _SPEC, path)
    append_rollup(_facts(spark, 500, 800), path, sid="b1")
    append_rollup(_facts(spark, 800, 1000), path, sid="b2")
    assert _served(spark, path) == _oracle(spark, 0, 1000)


def test_rollup_uncommitted_fold_is_invisible_and_replay_idempotent(spark, tmp_path):
    """Crash mid-fold = slice written, manifest missing: the serve must
    NOT see it; replaying the fold (same sid) must land exactly once."""
    path = str(tmp_path / "ru")
    build_rollup(_facts(spark, 0, 500), _SPEC, path)
    # simulate the crash: write the slice tables only, no commit
    from morphl_community_edition_spark.operators.incremental_agg import (
        _states_dir,
        rollup_states,
    )

    rollup_states(_facts(spark, 500, 1000), _SPEC).write.mode("overwrite").parquet(
        _states_dir(path, "b1")
    )
    assert _served(spark, path) == _oracle(spark, 0, 500)  # invisible
    # replay (the production retry): rewrites the slice and commits
    append_rollup(_facts(spark, 500, 1000), path, sid="b1")
    assert _served(spark, path) == _oracle(spark, 0, 1000)
    # double replay stays idempotent
    append_rollup(_facts(spark, 500, 1000), path, sid="b1")
    assert _served(spark, path) == _oracle(spark, 0, 1000)


def test_rollup_guards(spark, tmp_path):
    path = str(tmp_path / "ru")
    with pytest.raises(ValueError, match="no committed rollup base"):
        read_rollup(spark, path)
    build_rollup(_facts(spark, 0, 100), _SPEC, path)
    with pytest.raises(ValueError, match="reserved"):
        append_rollup(_facts(spark, 0, 1), path, sid="base")
    assert rollup_spec(path) == _SPEC
    # rebuild wipes prior generations: old folds must not leak in
    append_rollup(_facts(spark, 100, 200), path, sid="b1")
    build_rollup(_facts(spark, 0, 50), _SPEC, path)
    assert _served(spark, path) == _oracle(spark, 0, 50)


def test_rollup_versioned_commit_mode(spark, tmp_path):
    """The object-store (no-rename) commit protocol applies to rollups
    unchanged — folds commit as versioned records."""
    path = str(tmp_path / "ruv")
    manifest.use_versioned_commits(path)
    build_rollup(_facts(spark, 0, 300), _SPEC, path)
    append_rollup(_facts(spark, 300, 600), path, sid="b1")
    assert _served(spark, path) == _oracle(spark, 0, 600)
    mdir = os.path.join(path, manifest.MANIFEST_DIR)
    assert any(".v" in f for f in os.listdir(mdir)), "expected versioned records"


def test_hll_rollup_tracks_exact_twin(spark):
    """q160's estimate must sit within HLL lgK=14 tolerance of q161's
    exact distinct count, per group (the q18/q17 device)."""
    from morphl_community_edition_spark.queries import QUERIES

    est = {
        r["event_type"]: r["est_users"]
        for r in QUERIES["q160_hll_sketch_rollup"](spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in QUERIES["q161_exact_distinct_rollup"](spark, SF_DIR).collect()
    }
    assert set(est) == set(exact)
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(2, 0.05 * e), (k, est[k], e)


def test_psi_zero_on_identical_epochs(spark):
    """PSI of a distribution against itself must be ~0 in every bin —
    run q162's arithmetic with both epochs set to the SAME rows."""
    from morphl_community_edition_spark.queries.maintenance import _PSI_BIN_W

    rows = [Row(n=int(50 + (i * 37) % 500)) for i in range(400)]
    df = spark.createDataFrame(rows)
    t = (
        df.select(F.floor(F.col("n") / F.lit(float(_PSI_BIN_W))).cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt_a"))
        .withColumn("cnt_b", F.col("cnt_a"))
    )
    tot = t.agg((F.sum("cnt_a") + F.count(F.lit(1))).cast("bigint").alias("ta"))
    pa = (F.col("cnt_a") + 1) / F.col("ta").cast("double")
    pb = (F.col("cnt_b") + 1) / F.col("ta").cast("double")
    slp = F.floor(F.log(pa / pb) * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    out = t.crossJoin(F.broadcast(tot)).select(((pa - pb) * slp / F.lit(1e6)).alias("c"))
    assert all(abs(r["c"]) < 1e-12 for r in out.collect())


def test_zorder_layout_skips_on_both_dimensions(spark, tmp_path):
    """The point of z-ordering: a layout clustered on the Morton code
    of (x, y) must let a range predicate on EITHER dimension touch a
    small fraction of the partition buckets. Measured, not assumed:
    x and y uniform over the full 16-bit domain, 64 buckets, a 1/16
    range filter on each axis must touch under half the buckets
    (a 1-d layout gives 1/16 on its own axis but ~ALL buckets on the
    other; z-order gives ~1/4 on each — sqrt-decay per dimension)."""
    from morphl_community_edition_spark.operators.zorder import zorder_layout

    n = 1 << 14
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % 65536).alias("x"),
        ((F.col("id") * 40503) % 65536).alias("y"),
    )
    path = str(tmp_path / "zo")
    zorder_layout(df, F.col("x"), F.col("y"), path, bucket_bits=6)
    back = spark.read.parquet(path)
    n_buckets = back.select("zbucket").distinct().count()
    assert n_buckets == 64
    x_touch = (
        back.filter((F.col("x") >= 0) & (F.col("x") < 4096))
        .select("zbucket").distinct().count()
    )
    y_touch = (
        back.filter((F.col("y") >= 0) & (F.col("y") < 4096))
        .select("zbucket").distinct().count()
    )
    assert x_touch <= n_buckets // 2, f"x-range touched {x_touch}/{n_buckets}"
    assert y_touch <= n_buckets // 2, f"y-range touched {y_touch}/{n_buckets}"
    # and the partition column actually prunes: static partition
    # pruning on zbucket reads only the named directories
    pruned = back.filter(F.col("zbucket") == 0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "zbucket" in plan


def test_triangle_count_matches_bruteforce(spark):
    """Degree-oriented enumeration == naive id-ordered enumeration on
    a graph with hubs, isolated edges, and a 5-clique."""
    from itertools import combinations

    from morphl_community_edition_spark.operators.triangles import (
        triangle_corner_counts,
        triangles,
    )

    edges = set()
    edges |= set(combinations([1, 2, 3, 4, 5], 2))  # 5-clique
    edges |= {(10, i) for i in range(11, 30)}  # star hub: no triangles
    edges |= {(11, 12), (20, 21)}  # two closures onto the star
    edges |= {(100, 101)}  # isolated edge
    und = spark.createDataFrame(
        [Row(a=a, b=b) for a, b in sorted(edges)]
    )
    got = {(r["x"], r["y"], r["z"]) for r in triangles(und).collect()}
    # brute force over node triples
    nodes = sorted({n for e in edges for n in e})
    want = set()
    for t in combinations(nodes, 3):
        a, b, c = t
        if {(a, b), (a, c), (b, c)} <= edges:
            want.add(t)
    assert len(got) == len(want)
    assert {tuple(sorted(t)) for t in got} == want
    counts = {
        r["node"]: r["n_triangles"] for r in triangle_corner_counts(und).collect()
    }
    brute = {}
    for t in want:
        for n in t:
            brute[n] = brute.get(n, 0) + 1
    assert counts == brute


def test_rollup_compaction_preserves_semantics(spark, tmp_path):
    """compact_rollup: served result identical before/after, slice
    census collapses to 1, later folds land beside the compacted
    slice, double compaction is stable, and a tombstoned sid is
    rejected instead of committing into invisibility."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        compact_rollup,
    )

    path = str(tmp_path / "ru")
    build_rollup(_facts(spark, 0, 400), _SPEC, path)
    append_rollup(_facts(spark, 400, 700), path, sid="b1")
    append_rollup(_facts(spark, 700, 900), path, sid="b2")
    before = _served(spark, path)
    assert compact_rollup(spark, path) == 3
    assert len(manifest.committed_slices(path)) == 1
    assert _served(spark, path) == before == _oracle(spark, 0, 900)
    # compacting a single slice is a no-op
    assert compact_rollup(spark, path) == 0
    # tombstoned sid rejected; fresh sid folds fine
    with pytest.raises(ValueError, match="compacted away"):
        append_rollup(_facts(spark, 900, 1000), path, sid="b1")
    append_rollup(_facts(spark, 900, 1000), path, sid="b3")
    assert _served(spark, path) == _oracle(spark, 0, 1000)
    # second compaction (compacted slice + b3) under a bumped sid
    assert compact_rollup(spark, path) == 2
    assert _served(spark, path) == _oracle(spark, 0, 1000)


def test_rollup_compaction_crash_windows(spark, tmp_path):
    """Crash before the compacted commit = invisible slice, census
    unchanged; crash mid-GC (old manifests left) = replaced sids stay
    tombstoned and a re-compaction sweeps the ghosts."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        _merge_states,
        _states_dir,
        compact_rollup,
        rollup_spec,
    )

    path = str(tmp_path / "ru")
    build_rollup(_facts(spark, 0, 300), _SPEC, path)
    append_rollup(_facts(spark, 300, 600), path, sid="b1")
    want = _oracle(spark, 0, 600)
    # crash BEFORE commit: states written, no manifest record
    spec = rollup_spec(path)
    states = spark.read.parquet(_states_dir(path, "base")).unionByName(
        spark.read.parquet(_states_dir(path, "b1"))
    )
    _merge_states(states, spec).write.mode("overwrite").parquet(
        _states_dir(path, "compacted-000002")
    )
    assert len(manifest.committed_slices(path)) == 2  # invisible
    assert _served(spark, path) == want
    # the real compaction overwrites the crashed slice dir and commits
    assert compact_rollup(spark, path) == 2
    assert _served(spark, path) == want
    # crash mid-GC simulation: resurrect an old manifest record as a
    # ghost; it must stay invisible (tombstoned by the live record)
    mdir = os.path.join(path, manifest.MANIFEST_DIR)
    manifest.write_json_record(
        os.path.join(mdir, "b1.json"),
        {"sid": "b1", "spec": spec.to_payload()},
        root=path,
    )
    assert {r["sid"] for r in manifest.committed_slices(path)} == {"compacted-000002"}
    assert _served(spark, path) == want
    # next compaction inherits the ghost tombstone and sweeps it
    append_rollup(_facts(spark, 600, 700), path, sid="b4")
    assert compact_rollup(spark, path) == 2
    assert _served(spark, path) == _oracle(spark, 0, 700)
    assert not manifest.record_file_exists(os.path.join(mdir, "b1.json"))
