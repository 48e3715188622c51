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


def test_rollup_concurrent_folds_equal_sequential(spark, tmp_path):
    """Round-13 optimization: independent delta folds overlapped via
    fold_concurrently (guide §2.6) must serve byte-identical states to
    the sequential order — distinct sids write disjoint slice dirs and
    commit per-sid manifests, and the merge is a commutative monoid,
    so completion order cannot matter."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        fold_concurrently,
    )

    seq = str(tmp_path / "ru_seq")
    build_rollup(_facts(spark, 0, 500), _SPEC, seq)
    append_rollup(_facts(spark, 500, 800), seq, sid="b1")
    append_rollup(_facts(spark, 800, 1000), seq, sid="b2")

    par = str(tmp_path / "ru_par")
    build_rollup(_facts(spark, 0, 500), _SPEC, par)
    fold_concurrently(
        lambda: append_rollup(_facts(spark, 500, 800), par, sid="b1"),
        lambda: append_rollup(_facts(spark, 800, 1000), par, sid="b2"),
    )
    assert _served(spark, par) == _served(spark, seq) == _oracle(spark, 0, 1000)


def test_fold_concurrently_propagates_exceptions(spark, tmp_path):
    """A failing fold must raise after all submitted folds settle, and
    the successful sibling's commit must still be visible."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        fold_concurrently,
    )

    path = str(tmp_path / "ru_err")
    build_rollup(_facts(spark, 0, 500), _SPEC, path)

    def boom():
        raise RuntimeError("fold failed")

    with pytest.raises(RuntimeError, match="fold failed"):
        fold_concurrently(
            lambda: append_rollup(_facts(spark, 500, 1000), path, sid="ok"),
            boom,
        )
    assert _served(spark, path) == _oracle(spark, 0, 1000)


def test_fold_concurrently_raises_first_failure_and_accepts_empty(spark, capsys):
    """Round 14 (advice r13): multiple concurrent failures raise the
    FIRST (submission order) after logging the rest; zero folds is a
    no-op instead of ThreadPoolExecutor(max_workers=0)'s ValueError."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        fold_concurrently,
    )

    fold_concurrently()  # must not raise

    def boom_a():
        raise RuntimeError("first failure")

    def boom_b():
        raise ValueError("second failure")

    with pytest.raises(RuntimeError, match="first failure"):
        fold_concurrently(boom_a, boom_b)
    assert "second failure" in capsys.readouterr().err


def test_read_state_union_schema_drift_raises(spark, tmp_path):
    """Round 14 (verdict r13 #7): a slice whose on-disk schema drifted
    must make the multi-path state read refuse loudly — a combined
    spark.read.parquet(*dirs) would silently NULL-fill the missing
    column by name."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        _read_state_union,
        _states_dir,
    )

    path = str(tmp_path / "ru_drift")
    build_rollup(_facts(spark, 0, 500), _SPEC, path)
    append_rollup(_facts(spark, 500, 800), path, sid="b1")
    # simulate external corruption: rewrite slice b1 minus a column
    d = _states_dir(path, "b1")
    drifted = spark.read.parquet(d).drop("v_sum")
    drifted.write.mode("overwrite").parquet(str(tmp_path / "tmp_drift"))
    import shutil

    shutil.rmtree(d)
    shutil.move(str(tmp_path / "tmp_drift"), d)
    with pytest.raises(ValueError, match="slice schema drift"):
        _read_state_union(spark, path, None).collect()


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
    # replay-safe mode: a streaming restart replaying a batch whose
    # slice was compacted away (crash between fold-commit and
    # checkpoint advance, compact_rollup in between) must no-op —
    # the data is already in the compacted slice (r11 advice item)
    append_rollup(_facts(spark, 400, 700), path, sid="b1", on_tombstoned="skip")
    assert _served(spark, path) == _oracle(spark, 0, 900)
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


def test_zorder_bucket_bits_enforced_and_persisted(spark, tmp_path):
    """r11 advice item: the superset property of bucket pruning needs
    bucket_bits even AND equal to the layout's write-time value. Odd
    values are rejected everywhere; the layout persists its value in a
    sidecar and layout_bucket_bits reads it back; a sidecar-less dir
    fails loudly instead of guessing."""
    from morphl_community_edition_spark.operators.zorder import (
        layout_bucket_bits,
        zbucket,
        zbuckets_for_x_range,
        zorder_layout,
    )

    with pytest.raises(ValueError, match="even"):
        zbuckets_for_x_range(0, 10, bucket_bits=7)
    with pytest.raises(ValueError, match="even"):
        zbucket(F.lit(0), bucket_bits=5)
    df = spark.range(100).select(
        (F.col("id") % 64).alias("x"), (F.col("id") % 32).alias("y")
    )
    path = str(tmp_path / "zo")
    with pytest.raises(ValueError, match="even"):
        zorder_layout(df, F.col("x"), F.col("y"), path, bucket_bits=3)
    zorder_layout(df, F.col("x"), F.col("y"), path, bucket_bits=4)
    assert layout_bucket_bits(path) == 4
    bare = str(tmp_path / "bare")
    df.write.parquet(bare)
    with pytest.raises(ValueError, match="sidecar"):
        layout_bucket_bits(bare)


def test_z_ranges_for_rect_exact_and_superset():
    """Decomposition properties, brute-forced: at full depth the
    interval list covers EXACTLY the rectangle's Morton codes; under
    the max_depth/max_ranges valves it stays a superset; an x-only
    rectangle's bucket tier equals the 1-d helper's bucket list."""
    import random

    from morphl_community_edition_spark.operators.zorder import (
        _py_spread,
        z_ranges_for_rect,
        zbuckets_for_ranges,
        zbuckets_for_x_range,
    )

    def zval(x, y):
        return (_py_spread(x) << 1) | _py_spread(y)

    rng = random.Random(7)
    for _ in range(10):
        xl = rng.randrange(0, 65500)
        xh = xl + rng.randrange(1, 30)
        yl = rng.randrange(0, 65500)
        yh = yl + rng.randrange(1, 30)
        ranges = z_ranges_for_rect(xl, xh, yl, yh, max_depth=32, max_ranges=1 << 30)
        area = sum(hi - lo for lo, hi in ranges)
        assert area == (xh - xl) * (yh - yl)  # exact, not just superset
        for x in range(xl, xh):
            for y in range(yl, yh):
                z = zval(x, y)
                assert any(lo <= z < hi for lo, hi in ranges)
        assert all(ranges[i][0] >= ranges[i - 1][1] for i in range(1, len(ranges)))
    for _ in range(10):  # valves: bounded count, still a superset
        xl = rng.randrange(0, 60000)
        xh = xl + rng.randrange(1, 3000)
        yl = rng.randrange(0, 60000)
        yh = yl + rng.randrange(1, 3000)
        ranges = z_ranges_for_rect(xl, xh, yl, yh)
        assert len(ranges) <= 64
        for _ in range(100):
            z = zval(rng.randrange(xl, xh), rng.randrange(yl, yh))
            assert any(lo <= z < hi for lo, hi in ranges)
    assert z_ranges_for_rect(0, 65536, 0, 65536) == [(0, 1 << 32)]
    r = z_ranges_for_rect(100, 200, 0, 65536, max_depth=32, max_ranges=1 << 30)
    assert set(zbuckets_for_ranges(r, 14)) == set(zbuckets_for_x_range(100, 200, 14))


def test_zorder_rect_serve_skips_row_groups_below_bucket_level(spark, tmp_path):
    """The round-11 verdict #8 'done' bar: prove the z-range tier
    prunes BELOW the bucket level. Measured at the parquet footers —
    within the buckets that survive partition pruning, the row groups
    whose [z_min, z_max] span intersects the interval list are a
    strict minority — and at the plan: the z disjuncts reach the scan
    as pushed data filters."""
    import glob

    import pyarrow.parquet as pq

    from morphl_community_edition_spark.operators.zorder import (
        layout_bucket_bits,
        z_range_predicate,
        z_ranges_for_rect,
        zbuckets_for_ranges,
        zorder_layout,
    )

    n = 1 << 17
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % 65536).alias("x"),
        ((F.col("id") * 40503) % 65536).alias("y"),
    )
    path = str(tmp_path / "zo")
    # small row groups so a file holds many — the skipping unit under test
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", str(4 * 1024))
    try:
        zorder_layout(df, F.col("x"), F.col("y"), path, bucket_bits=4)
    finally:
        if old_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old_block)
    ranges = z_ranges_for_rect(1000, 3000, 20000, 24000)
    buckets = zbuckets_for_ranges(ranges, layout_bucket_bits(path))
    assert len(buckets) < 16  # tier 1: some directories pruned
    total_rg = hit_rg = 0
    for b in buckets:
        for f in glob.glob(os.path.join(path, f"zbucket={b}", "*.parquet")):
            meta = pq.ParquetFile(f).metadata
            zi = meta.schema.names.index("z")
            for g in range(meta.num_row_groups):
                st = meta.row_group(g).column(zi).statistics
                total_rg += 1
                if any(lo <= st.max and st.min < hi for lo, hi in ranges):
                    hit_rg += 1
    assert total_rg > 20, f"fixture too coarse ({total_rg} row groups)"
    assert hit_rg < total_rg // 2, f"z ranges hit {hit_rg}/{total_rg} row groups"
    # tier 2 reaches the scan: z bounds appear among pushed filters
    back = spark.read.parquet(path)
    pred = z_range_predicate(ranges, F.col("z"))
    plan = (
        back.filter(pred)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "z" in plan.split("PushedFilters", 1)[1][:4000]
    # and the served rows equal the unpruned filter (superset + exact
    # predicate re-application — correctness does not ride on stats)
    exact = (
        (F.col("x") >= 1000) & (F.col("x") < 3000)
        & (F.col("y") >= 20000) & (F.col("y") < 24000)
    )
    got = back.filter(pred & exact).count()
    want = back.filter(exact).count()
    assert got == want


def test_hist_rollup_fold_merge_equals_recompute(spark, tmp_path):
    """Quantile (histogram) rollup: build + two folds must serve the
    same percentiles as a from-scratch computation over the full data
    — against a pure-Python sorted-multiset reference, which also pins
    the rank = ceil(p·n) percentile_disc semantics."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        HistSpec,
        append_hist_rollup,
        build_hist_rollup,
        quantiles_from_hist,
    )

    def vals(lo, hi):
        return [(i % 5, float((i * 37) % 200) / 10.0) for i in range(lo, hi)]

    spec = HistSpec(keys=("g",), value="x", scale=1)
    path = str(tmp_path / "hq")
    mk = lambda lo, hi: spark.createDataFrame(vals(lo, hi), "g int, x double")
    build_hist_rollup(mk(0, 500), spec, path)
    append_hist_rollup(mk(500, 800), path, sid="b1")
    append_hist_rollup(mk(800, 1000), path, sid="b2")
    pcts = {"p50": (1, 2), "p90": (9, 10), "p25": (1, 4)}
    got = {
        r["g"]: (r["n_rows"], r["p50"], r["p90"], r["p25"])
        for r in quantiles_from_hist(spark, path, pcts).collect()
    }
    by_g = {}
    for g, x in vals(0, 1000):
        by_g.setdefault(g, []).append(int(x * 10 + 0.5))  # scale 1 grid
    want = {}
    for g, xs in by_g.items():
        xs.sort()
        n = len(xs)
        want[g] = (
            n,
            xs[(1 * n + 1) // 2 - 1],
            xs[(9 * n + 9) // 10 - 1],
            xs[(1 * n + 3) // 4 - 1],
        )
    assert got == want
    # replay idempotence + tombstone-skip contract shared with append_rollup
    append_hist_rollup(mk(800, 1000), path, sid="b2")
    got2 = {
        r["g"]: (r["n_rows"], r["p50"], r["p90"], r["p25"])
        for r in quantiles_from_hist(spark, path, pcts).collect()
    }
    assert got2 == want
    with pytest.raises(ValueError, match="reserved"):
        append_hist_rollup(mk(0, 1), path, sid="base")


def test_hist_rollup_serve_never_rereads_fact(spark, tmp_path):
    """quantiles_from_hist's plan must scan only the persisted state
    slices (the read_rollup gate, applied to the quantile member)."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        HistSpec,
        build_hist_rollup,
        quantiles_from_hist,
    )

    fact_path = str(tmp_path / "srcfacts")
    spark.range(1000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 17).cast("double").alias("x")
    ).write.parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    path = str(tmp_path / "hq")
    build_hist_rollup(fact, HistSpec(keys=("g",), value="x", scale=0), path)
    served = quantiles_from_hist(spark, path, {"p50": (1, 2)})
    plan = served._jdf.queryExecution().executedPlan().toString()
    locs = [ln for ln in plan.splitlines() if "Location" in ln or "FileScan" in ln]
    assert locs and all("/hq/" in ln for ln in locs), locs  # Spark elides long paths
    assert served.count() == 3


def test_hist_retraction_is_exact_inverse(spark, tmp_path):
    """retract_hist_rollup (round 13): the group inverse law, served.
    append(b) then retract(b) must serve BYTE-EQUAL to never having
    folded b — quantiles, top-k, and band mass alike — and
    re-appending b under a fresh sid restores the post-append serve.
    validate_hist stays empty throughout (no negative nets)."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        HistSpec,
        append_hist_rollup,
        build_hist_rollup,
        quantiles_from_hist,
        retract_hist_rollup,
        topk_values_from_hist,
        validate_hist,
    )

    def vals(lo, hi):
        return [(i % 5, float((i * 37) % 200) / 10.0) for i in range(lo, hi)]

    spec = HistSpec(keys=("g",), value="x", scale=1)
    path = str(tmp_path / "hr")
    mk = lambda lo, hi: spark.createDataFrame(vals(lo, hi), "g int, x double")
    pcts = {"p50": (1, 2), "p90": (9, 10)}
    serve = lambda: sorted(
        tuple(r) for r in quantiles_from_hist(spark, path, pcts).collect()
    )
    build_hist_rollup(mk(0, 700), spec, path)
    before = serve()
    topk_before = sorted(
        tuple(r) for r in topk_values_from_hist(spark, path, k=2).collect()
    )
    append_hist_rollup(mk(700, 1000), path, sid="b1")
    after_append = serve()
    assert after_append != before  # the batch actually moved the serve
    retract_hist_rollup(mk(700, 1000), path, sid="undo-b1")
    assert serve() == before
    assert (
        sorted(tuple(r) for r in topk_values_from_hist(spark, path, k=2).collect())
        == topk_before
    )
    assert validate_hist(spark, path).count() == 0
    append_hist_rollup(mk(700, 1000), path, sid="b1-again")
    assert serve() == after_append
    # retraction slices honor the same sid rules as appends
    with pytest.raises(ValueError, match="reserved"):
        retract_hist_rollup(mk(0, 1), path, sid="base")


def test_hist_retraction_empties_groups_and_flags_overretraction(spark, tmp_path):
    """A fully-retracted group VANISHES from every reader (net-zero
    rows are dropped at merge — an emptied group must not surface a
    cnt=0 mode or a 0-row quantile), and retracting mass that was
    never appended is caught by validate_hist as negative net rows."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        HistSpec,
        build_hist_rollup,
        quantiles_from_hist,
        read_hist,
        retract_hist_rollup,
        validate_hist,
    )

    spec = HistSpec(keys=("g",), value="x", scale=0)
    path = str(tmp_path / "hrg")
    rows = [(g, float(v)) for g in (0, 1) for v in (1, 2, 2, 3)]
    build_hist_rollup(spark.createDataFrame(rows, "g int, x double"), spec, path)
    # back out EVERY group-1 row
    retract_hist_rollup(
        spark.createDataFrame(
            [(1, float(v)) for v in (1, 2, 2, 3)], "g int, x double"
        ),
        path,
        sid="drop-g1",
    )
    assert validate_hist(spark, path).count() == 0
    served = quantiles_from_hist(spark, path, {"p50": (1, 2)}).collect()
    assert [r["g"] for r in served] == [0]
    assert read_hist(spark, path).filter("g = 1").count() == 0
    # now over-retract: one (g=0, x=9) row that never existed
    retract_hist_rollup(
        spark.createDataFrame([(0, 9.0)], "g int, x double"), path, sid="bogus"
    )
    bad = validate_hist(spark, path).collect()
    assert [(r["g"], r["v"], r["cnt"]) for r in bad] == [(0, 9, -1)]


def test_hist_compaction_drops_retracted_mass(spark, tmp_path):
    """compact_rollup on a HISTOGRAM rollup (kind dispatch, round 13):
    slice census collapses to 1, the served quantiles are identical
    before/after, and the compacted slice physically contains no
    net-zero rows — the retracted mass is garbage-collected, not
    carried as +n/−n pairs. rollup_spec on a hist path fails loudly
    instead of misparsing."""
    from morphl_community_edition_spark.operators import manifest
    from morphl_community_edition_spark.operators.incremental_agg import (
        HistSpec,
        append_hist_rollup,
        build_hist_rollup,
        compact_rollup,
        hist_spec,
        quantiles_from_hist,
        retract_hist_rollup,
        rollup_spec,
        _states_dir,
    )

    def mk(lo, hi):
        return spark.createDataFrame(
            [(i % 3, float((i * 7) % 50)) for i in range(lo, hi)], "g int, x double"
        )

    spec = HistSpec(keys=("g",), value="x", scale=0)
    path = str(tmp_path / "hc")
    build_hist_rollup(mk(0, 300), spec, path)
    append_hist_rollup(mk(300, 500), path, sid="b1")
    retract_hist_rollup(mk(300, 500), path, sid="undo-b1")  # nets to zero
    append_hist_rollup(mk(500, 600), path, sid="b2")
    pcts = {"p50": (1, 2), "p99": (99, 100)}
    before = sorted(tuple(r) for r in quantiles_from_hist(spark, path, pcts).collect())
    assert compact_rollup(spark, path) == 4
    assert len(manifest.committed_slices(path)) == 1
    after = sorted(tuple(r) for r in quantiles_from_hist(spark, path, pcts).collect())
    assert after == before
    sid = manifest.committed_slices(path)[0]["sid"]
    compacted = spark.read.parquet(_states_dir(path, sid))
    assert compacted.filter("cnt <= 0").count() == 0
    # the b1 mass nets to zero against undo-b1: the compacted state must
    # equal a build over [0,300)+[500,600) alone, row for row
    fresh = str(tmp_path / "hc_fresh")
    build_hist_rollup(mk(0, 300).unionByName(mk(500, 600)), spec, fresh)
    fresh_rows = sorted(
        tuple(r) for r in spark.read.parquet(_states_dir(fresh, "base")).collect()
    )
    assert sorted(tuple(r) for r in compacted.collect()) == fresh_rows
    assert hist_spec(path).keys == ("g",)
    with pytest.raises(ValueError, match="HISTOGRAM"):
        rollup_spec(path)
    # folding after compaction still works and the serve reflects it
    append_hist_rollup(mk(600, 650), path, sid="b3")
    assert len(manifest.committed_slices(path)) == 2


def test_hist_snapshot_time_travel_and_vacuum(spark, tmp_path):
    """Snapshot-pinned reads (round 13): a hist_snapshot taken before
    later folds/retractions/compaction serves EXACTLY the state at
    pin time; compact_rollup(gc=False) tombstones but retains the
    pinned slices (live reads cut over, the pin keeps working);
    vacuum_rollup ends the retention window — the pinned read then
    fails loudly, live reads are untouched, and a later compaction
    sweeps any ghost manifests."""
    from morphl_community_edition_spark.operators import manifest
    from morphl_community_edition_spark.operators.incremental_agg import (
        HistSpec,
        append_hist_rollup,
        build_hist_rollup,
        compact_rollup,
        hist_snapshot,
        quantiles_from_hist,
        retract_hist_rollup,
        vacuum_rollup,
    )

    def mk(lo, hi):
        return spark.createDataFrame(
            [(i % 3, float((i * 7) % 50)) for i in range(lo, hi)], "g int, x double"
        )

    spec = HistSpec(keys=("g",), value="x", scale=0)
    path = str(tmp_path / "tt")
    pcts = {"p50": (1, 2), "p90": (9, 10)}
    serve = lambda sids=None: sorted(
        tuple(r) for r in quantiles_from_hist(spark, path, pcts, sids=sids).collect()
    )
    build_hist_rollup(mk(0, 300), spec, path)
    append_hist_rollup(mk(300, 500), path, sid="b1")
    snap = hist_snapshot(path)
    assert snap == ("b1", "base")
    at_pin = serve()
    # later folds don't move the pin
    append_hist_rollup(mk(500, 600), path, sid="b2")
    retract_hist_rollup(mk(0, 100), path, sid="undo-part")
    assert serve(snap) == at_pin
    live_now = serve()
    assert live_now != at_pin
    # logical compaction retains the pinned slices
    assert compact_rollup(spark, path, gc=False) == 4
    assert len(manifest.committed_slices(path)) == 1
    assert serve(snap) == at_pin       # time travel across compaction
    assert serve() == live_now         # live read identical post-compaction
    # retention window ends: physical deletion
    assert vacuum_rollup(path) == 4
    assert vacuum_rollup(path) == 0    # idempotent
    with pytest.raises(ValueError, match="no longer exists"):
        serve(snap)
    assert serve() == live_now         # live serve survives the vacuum
    # folds and (default-gc) compaction keep working after a vacuum
    append_hist_rollup(mk(600, 650), path, sid="b3")
    assert compact_rollup(spark, path) == 2
    assert serve() != live_now
    with pytest.raises(ValueError, match="empty snapshot"):
        serve(())


def test_rollup_retraction_inverse_refusal_and_validation(spark, tmp_path):
    """retract_rollup (round 13): inverse law on sums/counts, loud
    refusal when the spec maintains extrema, emptied groups vanish,
    and validate_rollup flags over-retraction as negative nets."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        RollupSpec,
        append_rollup,
        build_rollup,
        read_rollup,
        retract_rollup,
        validate_rollup,
    )

    def mk(lo, hi):
        return spark.createDataFrame(
            [(i % 3, float((i * 7) % 50)) for i in range(lo, hi)], "g int, x double"
        )

    spec = RollupSpec(keys=("g",), measures={"x": 2}, extrema=())
    path = str(tmp_path / "rr")
    serve = lambda: sorted(tuple(r) for r in read_rollup(spark, path).collect())
    build_rollup(mk(0, 300), spec, path)
    before = serve()
    append_rollup(mk(300, 500), path, sid="b1")
    after = serve()
    assert after != before
    retract_rollup(mk(300, 500), path, sid="undo-b1")
    assert serve() == before
    assert validate_rollup(spark, path).count() == 0
    # back out group 2 entirely: it must vanish from the serve
    g2_rows = [(2, float((i * 7) % 50)) for i in range(0, 300) if i % 3 == 2]
    retract_rollup(
        spark.createDataFrame(g2_rows, "g int, x double"), path, sid="drop-g2"
    )
    assert sorted(r[0] for r in read_rollup(spark, path).collect()) == [0, 1]
    # over-retraction: flagged, not served silently
    retract_rollup(
        spark.createDataFrame([(1, 1.0)] * 5, "g int, x double"), path, sid="bogus"
    )
    bad = validate_rollup(spark, path).collect()
    assert len(bad) == 0  # n_rows still positive for g=1...
    # ...so over-retract PAST zero to force a negative net
    n1 = dict((r["g"], r["n_rows"]) for r in read_rollup(spark, path).collect())[1]
    retract_rollup(
        spark.createDataFrame([(1, 1.0)] * (n1 + 3), "g int, x double"),
        path,
        sid="bogus2",
    )
    assert validate_rollup(spark, path).count() == 1
    # extrema refusal is loud and names the histogram alternative
    epath = str(tmp_path / "re")
    build_rollup(
        mk(0, 50), RollupSpec(keys=("g",), measures={}, extrema=("x",)), epath
    )
    with pytest.raises(ValueError, match="not invertible"):
        retract_rollup(mk(0, 10), epath, sid="c1")


def test_rollup_snapshot_time_travel_summary_kind(spark, tmp_path):
    """snapshot_slices + read_rollup(sids=...) — the q176 time-travel
    contract on the SUMMARY kind: the pin serves the pre-correction
    sums across later folds/retractions and a gc=False compaction;
    vacuum ends the retention window loudly."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        RollupSpec,
        append_rollup,
        build_rollup,
        compact_rollup,
        read_rollup,
        retract_rollup,
        snapshot_slices,
        vacuum_rollup,
    )

    def mk(lo, hi):
        return spark.createDataFrame(
            [(i % 3, float((i * 7) % 50)) for i in range(lo, hi)], "g int, x double"
        )

    spec = RollupSpec(keys=("g",), measures={"x": 2}, extrema=())
    path = str(tmp_path / "ttr")
    serve = lambda sids=None: sorted(
        tuple(r) for r in read_rollup(spark, path, sids=sids).collect()
    )
    build_rollup(mk(0, 300), spec, path)
    append_rollup(mk(300, 400), path, sid="b1")
    snap = snapshot_slices(path)
    at_pin = serve()
    retract_rollup(mk(0, 50), path, sid="corr")
    assert serve() != at_pin
    live = serve()
    assert compact_rollup(spark, path, gc=False) == 3
    assert serve(snap) == at_pin
    assert serve() == live
    assert vacuum_rollup(path) == 3
    with pytest.raises(ValueError, match="no longer exists"):
        serve(snap)
    assert serve() == live


def test_sample_rollup_merge_law_and_bounded_state(spark, tmp_path):
    """Bottom-k sample rollup (round 13): fold-merge == one-shot build
    (the monoid law, on the actual persisted slices), every slice is
    <= k rows per group, and the serve is the exact percentile_disc of
    the merged sample."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        SampleSpec,
        append_sample_rollup,
        build_sample_rollup,
        read_sample,
        _states_dir,
    )

    rows = [(i % 3, float((i * 37) % 997), i) for i in range(3000)]
    mk = lambda lo, hi: spark.createDataFrame(
        rows[lo:hi], "g int, x double, rid bigint"
    )
    spec = SampleSpec(keys=("g",), value="x", id_cols=("rid",), k=64)
    split = str(tmp_path / "split")
    build_sample_rollup(mk(0, 1000), spec, split)
    append_sample_rollup(mk(1000, 2500), split, sid="b1")
    append_sample_rollup(mk(2500, 3000), split, sid="b2")
    oneshot = str(tmp_path / "oneshot")
    build_sample_rollup(mk(0, 3000), spec, oneshot)
    got = sorted(tuple(r) for r in read_sample(spark, split).collect())
    want = sorted(tuple(r) for r in read_sample(spark, oneshot).collect())
    assert got == want and len(want) == 3 * 64
    for sid in ("base", "b1", "b2"):
        slice_df = spark.read.parquet(_states_dir(split, sid))
        per_group = slice_df.groupBy("g").count().collect()
        assert all(r["count"] <= 64 for r in per_group)


def test_sample_rollup_rank_accuracy_vs_exact(spark, tmp_path):
    """The sketch's accuracy contract: for every group, the estimated
    p50/p90 must sit within eps rank units of its true rank on the
    FULL data (uniform-sample bound ~4/sqrt(k); deterministic hash =>
    a pass is stable). Groups smaller than k are sampled completely
    and must be rank-exact up to value ties."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        SampleSpec,
        build_sample_rollup,
        quantiles_from_sample,
    )

    rows = [(i % 3, float((i * i * 31 + i * 17) % 10007), i) for i in range(9000)]
    df = spark.createDataFrame(rows, "g int, x double, rid bigint")
    spec = SampleSpec(keys=("g",), value="x", id_cols=("rid",), k=256)
    path = str(tmp_path / "acc")
    build_sample_rollup(df, spec, path)
    est = {
        r["g"]: (r["p50"], r["p90"])
        for r in quantiles_from_sample(
            spark, path, {"p50": (1, 2), "p90": (9, 10)}
        ).collect()
    }
    by_g = {}
    for g, x, _ in rows:
        by_g.setdefault(g, []).append(x)
    eps = 4 / (256 ** 0.5)  # ~0.25 at 4 sigma... tightened below by measurement
    for g, (p50, p90) in est.items():
        xs = sorted(by_g[g])
        n = len(xs)
        for p, v in ((0.5, p50), (0.9, p90)):
            frac = sum(1 for x in xs if x <= v) / n
            assert abs(frac - p) <= eps, (g, p, v, frac)


def test_sample_rollup_small_groups_are_exact(spark, tmp_path):
    """A group with <= k rows is fully sampled: the estimate IS the
    exact percentile_disc of the group."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        SampleSpec,
        build_sample_rollup,
        quantiles_from_sample,
    )

    rows = [(0, float(v), i) for i, v in enumerate([5, 1, 9, 3, 7])]
    df = spark.createDataFrame(rows, "g int, x double, rid bigint")
    path = str(tmp_path / "small")
    build_sample_rollup(df, SampleSpec(("g",), "x", ("rid",), k=64), path)
    r = quantiles_from_sample(spark, path, {"p50": (1, 2), "p100": (1, 1)}).collect()[0]
    assert (r["n_rows"], r["p50"], r["p100"]) == (5, 5.0, 9.0)


def test_merge_drop_zero_preserves_overretraction_evidence(spark, tmp_path):
    """Round-13 review #1: a group whose n_rows nets to 0 but still
    carries nonzero measure mass (null-measure rows appended, valued
    rows retracted) is a multiset violation — compaction must NOT
    garbage-collect it, and validate_rollup must flag it before AND
    after the compaction."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        RollupSpec,
        build_rollup,
        compact_rollup,
        read_rollup,
        retract_rollup,
        validate_rollup,
    )

    spec = RollupSpec(keys=("g",), measures={"x": 2}, extrema=())
    path = str(tmp_path / "ev")
    build_rollup(
        spark.createDataFrame([(0, None), (0, None), (1, 5.0)], "g int, x double"),
        spec,
        path,
    )
    # retract 2 VALUED rows from group 0 (which only ever had nulls)
    retract_rollup(
        spark.createDataFrame([(0, 5.0), (0, 5.0)], "g int, x double"),
        path,
        sid="bad",
    )
    assert validate_rollup(spark, path).count() == 1  # x_cnt < 0 at g=0
    assert compact_rollup(spark, path) == 2
    bad = validate_rollup(spark, path).collect()  # evidence survived
    assert [(r["g"], r["n_rows"], r["x_cnt"]) for r in bad] == [(0, 0, -2)]
    # the corrupt group SURFACES in the serve (n_rows 0 with leftover
    # mass is visible corruption, not silently hidden); only a healthy
    # all-zero group vanishes
    assert sorted(r["g"] for r in read_rollup(spark, path).collect()) == [0, 1]


def test_compact_dispatches_sample_kind_and_rollup_spec_errors(spark, tmp_path):
    """Round-13 review #3: the sample kind compacts (census -> 1,
    merged sample unchanged) and rollup_spec on a sample path raises
    the curated kind error, not a KeyError."""
    from morphl_community_edition_spark.operators import manifest
    from morphl_community_edition_spark.operators.incremental_agg import (
        SampleSpec,
        append_sample_rollup,
        build_sample_rollup,
        compact_rollup,
        read_sample,
        rollup_spec,
    )

    rows = [(i % 2, float(i), i) for i in range(500)]
    mk = lambda lo, hi: spark.createDataFrame(rows[lo:hi], "g int, x double, rid bigint")
    spec = SampleSpec(keys=("g",), value="x", id_cols=("rid",), k=32)
    path = str(tmp_path / "sc")
    build_sample_rollup(mk(0, 200), spec, path)
    append_sample_rollup(mk(200, 500), path, sid="b1")
    before = sorted(tuple(r) for r in read_sample(spark, path).collect())
    with pytest.raises(ValueError, match="SAMPLE"):
        rollup_spec(path)
    assert compact_rollup(spark, path) == 2
    assert len(manifest.committed_slices(path)) == 1
    assert sorted(tuple(r) for r in read_sample(spark, path).collect()) == before


def test_cdc_extrema_refusal_does_not_bind_checkpoint(spark, tmp_path):
    """Round-13 review #2: a refused CDC start must leave NO
    stream.json behind — the rollup stays startable with a correct
    (non-CDC) invocation on a fresh checkpoint."""
    import os

    from morphl_community_edition_spark.operators.incremental_agg import (
        RollupSpec,
        build_rollup,
        read_rollup,
        streaming_rollup_ingest,
    )

    rows = [(i % 2, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "g int, x double")
    staged = str(tmp_path / "in")
    df.withColumn("op", F.lit("I")).coalesce(1).write.parquet(staged)
    path = str(tmp_path / "er")
    build_rollup(df.limit(0), RollupSpec(keys=("g",), measures={}, extrema=("x",)), path)

    def stream():
        return (
            spark.readStream.schema("g int, x double, op string")
            .option("maxFilesPerTrigger", 1)
            .parquet(staged)
        )

    with pytest.raises(ValueError, match="extrema"):
        streaming_rollup_ingest(stream(), path, str(tmp_path / "ckptA"), op_col="op")
    assert not os.path.exists(os.path.join(path, "stream.json"))
    # correct restart on a DIFFERENT checkpoint succeeds (no stale tag)
    plain = (
        spark.readStream.schema("g int, x double, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .drop("op")
    )
    q = streaming_rollup_ingest(plain, path, str(tmp_path / "ckptB"))
    q.awaitTermination(600)
    assert q.exception() is None
    assert read_rollup(spark, path).count() == 2


def test_sample_identity_hash_is_collision_safe(spark, tmp_path):
    """Round-13 review #4: separator-bearing strings and NULLs in the
    id columns must produce DISTINCT ranks — ('a|b','c') vs
    ('a','b|c') and (NULL,'x') vs ('x',NULL) all stay distinct rows
    of the sample."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        SampleSpec,
        build_sample_rollup,
        read_sample,
    )

    rows = [
        (0, 1.0, "a|b", "c"),
        (0, 2.0, "a", "b|c"),
        (0, 3.0, None, "x"),
        (0, 4.0, "x", None),
    ]
    df = spark.createDataFrame(rows, "g int, v double, a string, b string")
    path = str(tmp_path / "coll")
    build_sample_rollup(
        df, SampleSpec(keys=("g",), value="v", id_cols=("a", "b"), k=64), path
    )
    sample = read_sample(spark, path).collect()
    assert len(sample) == 4
    assert len({r["hk"] for r in sample}) == 4


def test_range_mass_rejects_non_grid_endpoints(spark, tmp_path):
    """Round-13 review #5: a non-integer band endpoint (a raw value
    the caller forgot to quantize) is rejected loudly instead of
    silently truncated toward zero."""
    from morphl_community_edition_spark.operators.incremental_agg import (
        HistSpec,
        build_hist_rollup,
        range_mass_from_hist,
    )

    df = spark.createDataFrame([(0, 199.7), (0, 210.0)], "g int, x double")
    path = str(tmp_path / "rm")
    build_hist_rollup(df, HistSpec(keys=("g",), value="x", scale=-2), path)
    with pytest.raises(ValueError, match="not a grid key"):
        range_mass_from_hist(spark, path, {"cheap": (None, 199.7)}).collect()
    ok = range_mass_from_hist(spark, path, {"cheap": (None, 2)}).collect()[0]
    assert (ok["n_rows"], ok["cheap"]) == (2, 0)  # both quantize to grid key 2
