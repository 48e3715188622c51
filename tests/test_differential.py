"""Hypothesis differential fuzz: randomly generated predicates +
aggregations run through BOTH engines must agree — the property-based
generalization of the fixed oracle contract (SURVEY.md §5.4).

Example counts are small (Spark's per-query latency, not coverage,
is the binding constraint); the generator space still covers the
predicate/aggregation grammar the fixed queries exercise.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from morphl_community_edition_spark.catalog import load_table
from morphl_community_edition_spark.session import get_spark
from tests.conftest import SF_DIR_SMOKE

_ENGINES: dict = {}


@pytest.fixture(scope="module", autouse=True)
def engines(spark):
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR_SMOKE}/{t}.parquet')")
    _ENGINES["spark"] = spark
    _ENGINES["duck"] = con
    # cache the small table once: 25 hypothesis examples otherwise
    # re-scan the file per example
    _ENGINES["lineitem"] = load_table(spark, SF_DIR_SMOKE, "lineitem").cache()
    _ENGINES["lineitem"].count()
    _ENGINES["orders"] = load_table(spark, SF_DIR_SMOKE, "orders").cache()
    _ENGINES["orders"].count()
    yield
    _ENGINES["lineitem"].unpersist()
    _ENGINES["orders"].unpersist()
    _ENGINES.clear()


# predicate grammar over lineitem
num_cols = st.sampled_from(["l_quantity", "l_extendedprice", "l_discount", "l_tax"])
cmp_ops = st.sampled_from(["<", "<=", ">", ">=", "="])
flags = st.sampled_from(["A", "N", "R"])


@st.composite
def lineitem_predicate(draw):
    clauses = []
    for _ in range(draw(st.integers(1, 3))):
        kind = draw(st.integers(0, 2))
        if kind == 0:
            col = draw(num_cols)
            op = draw(cmp_ops)
            val = round(draw(st.floats(0.0, 100.0, allow_nan=False)), 2)
            clauses.append(f"{col} {op} {val}")
        elif kind == 1:
            clauses.append(f"l_returnflag = '{draw(flags)}'")
        else:
            lo = draw(st.integers(1, 5))
            hi = lo + draw(st.integers(0, 4))
            clauses.append(f"l_linenumber BETWEEN {lo} AND {hi}")
    joiner = draw(st.sampled_from([" AND ", " OR "]))
    return joiner.join(clauses)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(pred=lineitem_predicate())
def test_fuzz_filter_count_agree(pred):
    spark_n = _ENGINES["lineitem"].filter(F.expr(pred)).count()
    duck_n = _ENGINES["duck"].execute(f"SELECT count(*) FROM lineitem WHERE ({pred})").fetchall()[0][0]
    assert spark_n == duck_n, f"predicate {pred!r}: spark {spark_n} vs duckdb {duck_n}"


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pred=lineitem_predicate(),
    join_kind=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
)
def test_fuzz_join_counts_agree(pred, join_kind):
    """Random predicate under each join flavor: Spark join count ==
    DuckDB's equivalent SQL form."""
    li = _ENGINES["lineitem"].filter(F.expr(pred))
    orders = _ENGINES["orders"]
    spark_n = orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"), join_kind).count()
    sql = {
        "inner": f"SELECT count(*) FROM orders JOIN (SELECT * FROM lineitem WHERE ({pred})) l ON o_orderkey = l_orderkey",
        "left": f"SELECT count(*) FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE ({pred})) l ON o_orderkey = l_orderkey",
        "left_semi": f"SELECT count(*) FROM orders WHERE EXISTS (SELECT 1 FROM lineitem WHERE ({pred}) AND l_orderkey = o_orderkey)",
        "left_anti": f"SELECT count(*) FROM orders WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE ({pred}) AND l_orderkey = o_orderkey)",
    }[join_kind]
    duck_n = _ENGINES["duck"].execute(sql).fetchall()[0][0]
    assert spark_n == duck_n, f"{join_kind} with {pred!r}: spark {spark_n} vs duckdb {duck_n}"


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    fn=st.sampled_from(["count", "min", "max", "rank", "row_number"]),
    lo=st.integers(0, 5),
    hi=st.integers(0, 5),
    desc=st.booleans(),
)
def test_fuzz_window_frames_agree(fn, lo, hi, desc):
    """Random ROWS frames / rank functions over a total order must
    match DuckDB exactly (exact aggregates only — a float sum's
    within-frame accumulation order is engine-specific)."""
    from pyspark.sql import Window

    orders = _ENGINES["orders"]
    order_col = F.col("o_totalprice").desc() if desc else F.col("o_totalprice").asc()
    sql_ord = f"o_totalprice {'DESC' if desc else 'ASC'}, o_orderkey"
    w = Window.partitionBy("o_custkey").orderBy(order_col, "o_orderkey")
    if fn in ("rank", "row_number"):
        col = (F.rank() if fn == "rank" else F.row_number()).over(w).cast("long")
        sql_fn = f"{fn}() OVER (PARTITION BY o_custkey ORDER BY {sql_ord})"
    else:
        w = w.rowsBetween(-lo, hi)
        col = getattr(F, fn)("o_orderkey").over(w).cast("long")
        sql_fn = (
            f"{fn}(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY {sql_ord} "
            f"ROWS BETWEEN {lo} PRECEDING AND {hi} FOLLOWING)"
        )
    got = {
        tuple(r)
        for r in orders.select("o_orderkey", col.alias("x")).collect()
    }
    want = {
        tuple(r)
        for r in _ENGINES["duck"]
        .execute(f"SELECT o_orderkey, CAST({sql_fn} AS BIGINT) AS x FROM orders")
        .fetchall()
    }
    assert got == want, f"{fn} frame [{lo},{hi}] desc={desc}"


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pred=lineitem_predicate(),
    group=st.sampled_from(["l_returnflag", "l_linestatus", "l_linenumber"]),
)
def test_fuzz_group_counts_agree(pred, group):
    got = {
        tuple(r)
        for r in _ENGINES["lineitem"].filter(F.expr(pred)).groupBy(group).count().collect()
    }
    want = {
        tuple(r)
        for r in _ENGINES["duck"]
        .execute(f"SELECT {group}, count(*) FROM lineitem WHERE ({pred}) GROUP BY 1")
        .fetchall()
    }
    assert got == want, f"predicate {pred!r} group {group}"


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)), min_size=0, max_size=60))
def test_fuzz_components_match_union_find(edges):
    """connected_components vs a pure-Python union-find on random edge
    lists (self-loops and duplicates included): identical partition AND
    identical min-id labeling."""
    from morphl_community_edition_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    spark = get_spark()
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # union-by-min keeps every root the minimum id of its set, so
    # find(n) IS the canonical min-id label
    want = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        df = df.limit(0)
    # driver union-find tier (default gate)
    got = {r["n"]: r["comp"] for r in connected_components(df).collect()}
    assert got == want
    # distributed label-propagation tier (gate forced shut)
    got_dist = {
        r["n"]: r["comp"]
        for r in connected_components(df, driver_max_edges=None).collect()
    }
    assert got_dist == want
    # the O(log n) star variant has the SAME contract — including
    # self-loop-only nodes labeled as singletons
    got_star = {r["n"]: r["comp"] for r in connected_components_star(df).collect()}
    assert got_star == want


def _brute_asof(left_rows, right_rows, strict, direction, tolerance=None):
    """Reference as-of: per left row, scan all right rows of the key.
    ``tolerance`` nulls a match whose |gap| exceeds it (the operator's
    tolerance_seconds projection)."""
    out = {}
    for k, lt, lid in left_rows:
        best = None
        for rk, rt, p in right_rows:
            if rk != k:
                continue
            if direction == "backward":
                ok = rt < lt if strict else rt <= lt
                better = best is None or rt > best[0] or (rt == best[0] and (p is not None and (best[1] is None or p > best[1])))
            else:
                ok = rt > lt if strict else rt >= lt
                better = best is None or rt < best[0] or (rt == best[0] and (p is not None and (best[1] is None or p > best[1])))
            if ok and better:
                best = (rt, p)
        if best is not None and tolerance is not None and abs(best[0] - lt) > tolerance:
            best = None
        out[lid] = None if best is None else best[1]
    return out


def test_asof_differential_vs_brute_force(spark):
    """Randomized differential check of every direction/strictness
    combination against an O(n·m) reference, including duplicate
    timestamps and NULL payloads (the round-3 review bug class).
    Deterministic seed; ties broken by max payload (the operator's
    struct-ordered window tie-break)."""
    import random

    from morphl_community_edition_spark.operators.asof import asof_join

    rng = random.Random(20260813)
    for trial in range(5):
        left_rows = [
            (rng.randint(1, 3), float(rng.randint(0, 12)), f"L{trial}_{i}")
            for i in range(12)
        ]
        right_rows = [
            (
                rng.randint(1, 3),
                float(rng.randint(0, 12)),
                rng.choice([None, 1, 2, 3, 5, 8]),
            )
            for i in range(15)
        ]
        left = spark.createDataFrame(left_rows, "k int, t double, lid string").withColumn(
            "t", F.col("t").cast("timestamp")
        )
        right = spark.createDataFrame(right_rows, "k int, t double, p int").withColumn(
            "t", F.col("t").cast("timestamp")
        )
        for strict in (True, False):
            for direction in ("backward", "forward"):
                for tol in (None, 0.0, 2.0, 5.0):
                    got = {
                        r["lid"]: r["asof_p"]
                        for r in asof_join(
                            left, right, key="k", ts="t", right_payload=["p"],
                            strict=strict, direction=direction,
                            tolerance_seconds=tol,
                        ).collect()
                    }
                    want = _brute_asof(left_rows, right_rows, strict, direction, tol)
                    assert got == want, (trial, strict, direction, tol, got, want)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sigs=st.lists(
        st.integers(0, (1 << 60) - 1), min_size=2, max_size=40, unique=True
    ),
    k=st.integers(0, 3),
)
def test_fuzz_simhash_banding_matches_brute_force(sigs, k):
    """The multi-index Hamming join's pigeonhole guarantee on
    ARBITRARY signatures (round-6, q121's operator): for any set of
    60-bit values and any threshold < n_bands, the banded equi-join +
    exact filter must produce exactly the brute-force pair set —
    losing a pair means the banding math (block width, shift, mask)
    is wrong in a way fixture data might never expose."""
    from morphl_community_edition_spark.operators.dedup import simhash_hamming_pairs

    spark = get_spark()
    sig_df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "doc_id long, simhash long"
    )
    got = {
        (r["a_doc"], r["b_doc"], r["hamming"])
        for r in simhash_hamming_pairs(sig_df, max_hamming=k).collect()
    }
    want = set()
    for i, a in enumerate(sigs):
        for j in range(i + 1, len(sigs)):
            h = bin(a ^ sigs[j]).count("1")
            if h <= k:
                want.add((i, j, h))
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(st.integers(0, 2000), min_size=0, max_size=25),
    ivs=st.lists(
        st.tuples(st.integers(0, 2000), st.integers(0, 2000)),
        min_size=0,
        max_size=15,
    ),
    width=st.sampled_from([1, 7, 60, 900]),
    half_open=st.booleans(),
    bcast=st.booleans(),
)
def test_fuzz_range_join_matches_brute_force(pts, ivs, width, half_open, bcast):
    """C7's bucketized range join on ARBITRARY points/intervals, both
    tiers (shuffle and broadcast_points) and both boundary modes,
    against a Python brute force — random inputs hit the bucket-edge
    cases fixtures never do: points exactly on bucket boundaries,
    zero-length and inverted (lo>hi, empty) intervals, widths larger
    than the whole domain."""
    from morphl_community_edition_spark.operators.interval_join import (
        range_join_bucketized,
    )

    spark = get_spark()
    base = 1_700_000_000
    p_df = spark.createDataFrame(
        [(i, base + t) for i, t in enumerate(pts)], "pid long, ts_e long"
    ).select("pid", F.col("ts_e").cast("timestamp").alias("ts"))
    i_df = spark.createDataFrame(
        [(j, base + a, base + b) for j, (a, b) in enumerate(ivs)],
        "iid long, lo_e long, hi_e long",
    ).select(
        "iid",
        F.col("lo_e").cast("timestamp").alias("lo"),
        F.col("hi_e").cast("timestamp").alias("hi"),
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join_bucketized(
            p_df, i_df, "ts", "lo", "hi", width,
            half_open=half_open, broadcast_points=bcast,
        ).select("pid", "iid").collect()
    }
    want = {
        (i, j)
        for i, t in enumerate(pts)
        for j, (a, b) in enumerate(ivs)
        if ((a <= t < b) if half_open else (a <= t <= b))
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ev=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 7200)),
        min_size=1,
        max_size=40,
    ),
    gap_min=st.sampled_from([1, 5, 30]),
)
def test_fuzz_sessionize_matches_brute_force(ev, gap_min):
    """L4's lag+cumsum sessionizer on ARBITRARY event streams vs a
    Python brute force — random inputs hit the exact-boundary rule
    (an event at EXACTLY prev + gap starts a NEW session, the
    streaming session_window contract) and duplicate timestamps
    (resolved by the event_id tiebreak)."""
    from morphl_community_edition_spark.operators.sessionize import sessionize

    spark = get_spark()
    base = 1_700_000_000
    rows = [(i, u, base + t) for i, (u, t) in enumerate(ev)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_e long").select(
        "event_id", "user_id", F.col("ts_e").cast("timestamp").alias("ts")
    )
    out = sessionize(df, gap_minutes=gap_min, order_tiebreak="event_id")
    got = {r["event_id"]: (r["user_id"], r["sess"]) for r in out.collect()}
    want = {}
    gap_s = gap_min * 60
    for u in {u for u, _ in ev}:
        stream = sorted(
            ((t, i) for i, (uu, t) in enumerate(ev) if uu == u)
        )
        sess, prev = 0, None
        for t, i in stream:
            if prev is None or t - prev >= gap_s:
                sess += 1
            prev = t
            want[i] = (u, sess)
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12)
        .map(" ".join),
        min_size=2,
        max_size=12,
    ),
    valve=st.sampled_from([None, 2, 3]),
)
def test_fuzz_exact_jaccard_matches_brute_force(texts, valve):
    """The dedup family's core primitive (exact_jaccard_pairs, used by
    q37/q93/q98/q114) on ARBITRARY tiny-vocabulary corpora vs a Python
    brute force, WITH the df-valve: intersection and union must both
    use the pruned shingle sets (the valved-path contract), short docs
    must yield no shingles, and the inverted-index candidate join must
    find every qualifying pair."""
    import math

    from morphl_community_edition_spark.operators.dedup import exact_jaccard_pairs

    spark = get_spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["a_doc"], r["b_doc"]): r["jaccard"]
        for r in exact_jaccard_pairs(
            df, n=3, threshold=0.2, max_doc_freq=valve
        ).collect()
    }
    sets = []
    for t in texts:
        ws = t.split(" ")
        sets.append(
            {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)} if len(ws) >= 3 else set()
        )
    if valve is not None:
        df_count: dict[str, int] = {}
        for s in sets:
            for sh in s:
                df_count[sh] = df_count.get(sh, 0) + 1
        sets = [{sh for sh in s if df_count[sh] <= valve} for s in sets]
    want = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if union and inter / union >= 0.2:
                want[(i, j)] = math.floor((inter / union) * 1e6 + 0.5) / 1e6
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=14)
        .map(" ".join),
        min_size=2,
        max_size=12,
    ),
    threshold=st.sampled_from([0.2, 0.34, 0.5, 0.76]),
)
def test_fuzz_prefix_filter_equals_postings(texts, threshold):
    """Round-8 PPJoin path (round-11: + positional filter, + auto
    dispatch with identity collapse): candidate machinery only — the
    (a_doc, b_doc, jaccard) tuple set must equal the direct postings
    join's EXACTLY on arbitrary corpora and thresholds (including
    float-boundary thresholds like 0.34·n_sh, where a non-conservative
    prefix length, length filter, or positional bound would drop a
    true pair; the generator's tiny vocabulary makes byte-identical
    texts common, so the auto path's collapse/expansion is exercised
    hard)."""
    from morphl_community_edition_spark.operators.dedup import exact_jaccard_pairs

    spark = get_spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = {
        (r["a_doc"], r["b_doc"]): r["jaccard"]
        for r in exact_jaccard_pairs(
            df, n=3, threshold=threshold, method="postings"
        ).collect()
    }
    for method in ("prefix", "auto"):
        got = {
            (r["a_doc"], r["b_doc"]): r["jaccard"]
            for r in exact_jaccard_pairs(
                df, n=3, threshold=threshold, method=method
            ).collect()
        }
        assert got == want, method


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    base=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 6)), st.integers(0, 99)),
        min_size=0,
        max_size=12,
        unique_by=lambda r: r[0],
    ),
    delta=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 6)), st.integers(100, 199)),
        min_size=0,
        max_size=12,
        unique_by=lambda r: r[0],
    ),
)
def test_fuzz_merge_upsert_matches_dict_merge(base, delta):
    """L6's SCD-1 merge on ARBITRARY keyed rows (including NULL keys,
    which group as equal-to-NULL) vs the obvious Python dict merge:
    delta wins on key collision, base survives otherwise, nothing is
    duplicated or dropped. Base is key-unique by construction here —
    the multiplying-join hazard for duplicate DELTA keys is covered by
    the guard test in test_smoke_operators."""
    from morphl_community_edition_spark.operators.upsert import merge_upsert

    spark = get_spark()
    schema = "k int, v int"
    b_df = spark.createDataFrame(base, schema)
    d_df = spark.createDataFrame(delta, schema)
    got = {
        r["k"]: r["v"]
        for r in merge_upsert(b_df, d_df, ["k"], assert_unique_delta=True).collect()
    }
    want = {k: v for k, v in base}
    want.update({k: v for k, v in delta})
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 50), st.sampled_from(["aa", "bb", "cc", None])),
        min_size=1,
        max_size=30,
        unique_by=lambda r: r[0],
    ),
    n_parts=st.sampled_from([1, 3, 8]),
)
def test_fuzz_exact_dedup_invariant_under_repartition(rows, n_parts):
    """The determinism contract (SURVEY §5.3: never dropDuplicates)
    fuzz-checked: exact_dedup's keeper set must be IDENTICAL for any
    physical partitioning of the same input — including NULL content
    (to_json keeps field names, so null placement distinguishes) —
    and must equal min-id-per-content computed in Python."""
    from morphl_community_edition_spark.operators.dedup import exact_dedup

    spark = get_spark()
    df = spark.createDataFrame(rows, "doc_id int, text string")
    want = {}
    for i, t in rows:
        key = t
        if key not in want or i < want[key]:
            want[key] = i
    expected = set(want.values())
    for d in (df, df.repartition(n_parts), df.repartition(n_parts, "text")):
        got = {r["doc_id"] for r in exact_dedup(d, ["text"], "doc_id").collect()}
        assert got == expected


def _py_bpe(texts: list[str], k: int) -> tuple[list[tuple], dict, dict]:
    """Pure-Python BPE merge training: the textbook greedy-leftmost
    loop (Sennrich et al. 2016), tie-break (count DESC, lhs, rhs) —
    the third independent formulation next to Spark's stack fold and
    the oracle's island windows."""
    from collections import Counter

    vocab: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] += 1
    syms = {w: list(w) for w in vocab}
    merges = []
    for step in range(k):
        pc: Counter = Counter()
        for w, f in vocab.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step + 1, l, r, l + r, cnt))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms, dict(vocab)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="ab", min_size=1, max_size=6), min_size=1, max_size=6
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(1, 4),
)
def test_fuzz_bpe_matches_reference(texts, k):
    """operators/bpe.bpe_learn == the pure-Python textbook loop on
    random tiny corpora over a 2-letter alphabet (maximal pair
    collisions, including the l == r run case the stack-fold /
    island-window equivalence argument hinges on). Checks BOTH
    outputs of one training run: the merge list (q127) and the final
    segmented vocabulary the tokenize step reads (q131)."""
    from collections import Counter

    from morphl_community_edition_spark.operators.bpe import bpe_learn

    spark = _ENGINES["spark"]
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    rows, vocab = bpe_learn(docs, k=k)
    merges, ref_syms, ref_freq = _py_bpe(texts, k)
    assert [tuple(r) for r in rows] == merges
    got_vocab = {r["word"]: (r["freq"], list(r["syms"])) for r in vocab.collect()}
    assert got_vocab == {w: (ref_freq[w], s) for w, s in ref_syms.items()}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ids=st.lists(st.integers(0, 10**6), min_size=1, max_size=40, unique=True),
    rate_bps=st.integers(0, 10_000),
    salt=st.sampled_from(["a", "mix1", "x9"]),
)
def test_fuzz_hash_rate_sample_matches_md5_reference(ids, rate_bps, salt):
    """operators/sampling.hash_rate_sample == a pure-Python hashlib
    md5 reference on random id sets, rates and salts — pins the exact
    bytes hashed (str(id) + ':' + salt), the 60-bit hex parse, the
    10^6 bucket modulus and the strict < threshold, independently of
    the DuckDB oracle (which shares none of Spark's code but could
    share a misunderstanding)."""
    import hashlib

    from morphl_community_edition_spark.operators.sampling import (
        MOD,
        hash_rate_sample,
    )

    rate = rate_bps / 10_000
    spark = _ENGINES["spark"]
    df = spark.createDataFrame([(i, "s") for i in ids], "doc_id long, source string")
    got = {
        r["doc_id"]
        for r in hash_rate_sample(df, "doc_id", {"s": rate}, "source", salt=salt).collect()
    }
    want = {
        i
        for i in ids
        if int(hashlib.md5(f"{i}:{salt}".encode()).hexdigest()[:15], 16) % MOD
        < int(rate * MOD)
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 2)), st.integers(0, 50)),
        min_size=1, max_size=15,
    ),
    right=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 2)),
            st.integers(0, 50),
            st.one_of(st.none(), st.integers(0, 9)),
        ),
        min_size=0, max_size=15,
    ),
    strict=st.booleans(),
    tol=st.one_of(st.none(), st.integers(0, 20)),
)
def test_fuzz_interval_asof_matches_union_window_asof(left, right, strict, tol):
    """The streaming as-of's interval device == the batch union+window
    asof_join on random inputs covering every claimed-equal case:
    NULL keys (eqNullSafe vs partitionBy grouping), duplicate version
    timestamps (max-payload tie-break), strict equal-ts exclusion,
    NULL payloads, and the tolerance cap. Run in BATCH mode (the
    device is a plain join; S9 covers the streaming execution)."""
    from morphl_community_edition_spark.operators.asof import asof_join
    from morphl_community_edition_spark.streaming.joins import asof_join_stream_static

    spark = _ENGINES["spark"]
    ldf = spark.createDataFrame(
        [(k, float(t), i) for i, (k, t) in enumerate(left)],
        "k int, ts double, lid int",
    )
    rdf = spark.createDataFrame(
        [(k, float(t), v) for k, t, v in right], "k int, ts double, payload int"
    )
    got = {
        (r["lid"], r["asof_payload"])
        for r in asof_join_stream_static(
            ldf, rdf, "k", "ts", ["payload"], watermark=None, strict=strict,
            tolerance_seconds=float(tol) if tol is not None else None,
        ).collect()
    }
    want = {
        (r["lid"], r["asof_payload"])
        for r in asof_join(
            ldf, rdf, "k", "ts", ["payload"], strict=strict,
            tolerance_seconds=float(tol) if tol is not None else None,
        ).collect()
    }
    assert got == want


def _py_pagerank_int(edges: list, iters: int) -> dict:
    """Pure-Python textbook PageRank with the SAME integer-rational
    arithmetic contract as operators/pagerank.py (SCALE-scaled BIGINT,
    floor division everywhere) — the independent third formulation
    next to Spark's join-loop and the oracle's unrolled CTE chain."""
    from collections import defaultdict

    from morphl_community_edition_spark.operators.pagerank import (
        PR_DAMP_PCT,
        PR_SCALE,
    )

    out: dict = defaultdict(int)
    for s, _ in edges:
        out[s] += 1
    nodes = sorted(out)
    n = len(nodes)
    r = {v: PR_SCALE // n for v in nodes}
    for _ in range(iters):
        acc: dict = defaultdict(int)
        for a, b in edges:
            acc[b] += r[a] // out[a]
        r = {
            v: ((100 - PR_DAMP_PCT) * PR_SCALE) // (100 * n)
            + (PR_DAMP_PCT * acc.get(v, 0)) // 100
            for v in nodes
        }
    return r


def _py_pagerank_float(edges: list, iters: int, damp: float = 0.85) -> dict:
    """Classic float PageRank (Page et al. 1999) — validates that the
    integer-rational contract tracks the textbook semantics, not just
    itself."""
    from collections import defaultdict

    out: dict = defaultdict(int)
    for s, _ in edges:
        out[s] += 1
    nodes = sorted(out)
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        acc: dict = defaultdict(float)
        for a, b in edges:
            acc[b] += r[a] / out[a]
        r = {v: (1 - damp) / n + damp * acc.get(v, 0.0) for v in nodes}
    return r


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pairs=st.sets(
        st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=1, max_size=20
    ),
    iters=st.integers(1, 4),
)
def test_fuzz_pagerank_matches_textbook(pairs, iters):
    """operators/pagerank.pagerank == the pure-Python integer textbook
    loop on random small graphs (self-loops, multi-component,
    hub-heavy — symmetrized the same way the query symmetrizes), and
    within float tolerance of the classic float formulation, so the
    10⁻¹² rational truncation is provably cosmetic."""
    from morphl_community_edition_spark.operators.pagerank import (
        PR_SCALE,
        pagerank,
        symmetrize_edges,
    )

    spark = _ENGINES["spark"]
    named = [(f"n{a}", f"n{b}") for a, b in sorted(pairs)]
    sym = named + [(b, a) for a, b in named]
    df = spark.createDataFrame(named, "src string, dst string")
    got = {
        r["node"]: r["r"] for r in pagerank(symmetrize_edges(df), iters=iters).collect()
    }
    assert got == _py_pagerank_int(sym, iters)
    ref = _py_pagerank_float(sym, iters)
    assert all(abs(got[v] / PR_SCALE - ref[v]) < 1e-9 for v in ref)


def _py_label_propagation(sym_edges: list, iters: int) -> dict:
    """Textbook deterministic synchronous LPA with the same contract
    as operators/labelprop.py: neighbour votes + one self-vote,
    winner = (max count, min label), labels start as node ids."""
    nodes = sorted({a for a, _ in sym_edges})
    lab = {v: v for v in nodes}
    for _ in range(iters):
        votes: dict = {}
        for a, b in sym_edges:
            votes.setdefault(b, []).append(lab[a])
        for v in nodes:
            votes.setdefault(v, []).append(lab[v])
        new = {}
        for v, ls in votes.items():
            cnt: dict = {}
            for x in ls:
                cnt[x] = cnt.get(x, 0) + 1
            new[v] = min(cnt, key=lambda x: (-cnt[x], x))
        lab = new
    return lab


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pairs=st.sets(
        st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=1, max_size=20
    ),
    iters=st.integers(1, 4),
)
def test_fuzz_label_propagation_matches_textbook(pairs, iters):
    """operators/labelprop.label_propagation == the pure-Python
    deterministic LPA on random small graphs (self-loops,
    multi-component, bipartite-oscillation shapes — symmetrized the
    same way the query symmetrizes). Distribution/partitioning must
    be invisible: synchronous rounds + total-order tie-break make the
    result exact, not probabilistic."""
    from morphl_community_edition_spark.operators.labelprop import label_propagation
    from morphl_community_edition_spark.operators.pagerank import symmetrize_edges

    spark = _ENGINES["spark"]
    named = [(f"n{a}", f"n{b}") for a, b in sorted(pairs)]
    # NO dedup: symmetrize_edges on input that already carries both
    # directions produces multi-edges, and the operator counts each
    # edge's vote (the pagerank outdeg convention) — the model must too
    sym = named + [(b, a) for a, b in named]
    df = spark.createDataFrame(named, "src string, dst string")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(symmetrize_edges(df), iters=iters).collect()
    }
    assert got == _py_label_propagation(sym, iters)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 500), st.integers(-3, 40)),
        min_size=1,
        max_size=25,
        unique_by=lambda r: r[0],
    ),
    k=st.integers(1, 10),
)
def test_fuzz_weighted_sample_matches_md5_replay(rows, k):
    """q146's operator vs a pure-Python md5 replay: per-row priority
    must equal min over the w clamped replica hashes, and the top-k
    cut must follow the (priority, key) total order exactly —
    including weights below 1 (clamped up) and above the cap
    (clamped down)."""
    import hashlib as _hl

    from morphl_community_edition_spark.operators.sampling import weighted_sample_topk

    spark = _ENGINES["spark"]
    df = spark.createDataFrame(rows, "doc_id long, wt long")
    got = [
        (r["doc_id"], r["w_eff"], r["priority"])
        for r in weighted_sample_topk(
            df, "doc_id", "wt", k=k, salt="w1", max_weight=8
        ).collect()
    ]

    def h(key: int, i: int) -> int:
        return int(_hl.md5(f"{key}#{i}:w1".encode()).hexdigest()[:15], 16)

    want = []
    for key, wt in rows:
        w = max(1, min(int(wt), 8))
        want.append((key, w, min(h(key, i) for i in range(w))))
    want.sort(key=lambda t: (t[2], t[0]))
    assert got == want[:k]


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 30),                        # doc_id (deduped below)
            st.one_of(st.none(), st.integers(0, 4)),   # comp (NULL = its own group)
            st.one_of(st.none(), st.integers(-5, 5)),  # score (NULL must lose)
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
def test_fuzz_keeper_election_matches_argmax(rows):
    """operators/components.keeper_election == the pure-Python
    per-cluster argmax (max score, ties to min id) on random
    memberships — including all-tied clusters, negative scores,
    singleton comps, NULL scores (never beat a real score; all-NULL
    cluster falls back to min id) and NULL comps (one group, flagged
    not dropped — the round-8 review edge cases)."""
    from morphl_community_edition_spark.operators.components import keeper_election

    spark = _ENGINES["spark"]
    df = spark.createDataFrame(
        [(d, c, 2, s) for d, c, s in rows],
        "doc_id long, comp long, cluster_size long, score long",
    )
    got = {
        r["doc_id"]: r["is_keeper"]
        for r in keeper_election(df).collect()
    }
    want_keeper = {}
    for d, c, s in rows:
        key = (s is None, -(s if s is not None else 0), d)
        best = want_keeper.get(c)
        if best is None or key < best:
            want_keeper[c] = key
    want = {d: want_keeper[c][2] == d for d, c, _ in rows}
    assert got == want
    assert len(got) == len(rows), "rows vanished from the election output"


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    words=st.lists(
        st.sampled_from([f"w{i}" for i in range(12)] + ["hot1", "hot2"]),
        min_size=1,
        max_size=120,
    ),
    k=st.integers(2, 8),
)
def test_fuzz_heavy_hitters_exact_matches_counter(words, k):
    """operators/heavyhitters.heavy_hitters_exact == the pure-Python
    Counter reference (count·k > N) on random skewed streams, at
    adversarially small k — and the Misra-Gries candidate stage is a
    superset of the true heavy hitters (the guarantee the recount
    relies on)."""
    from collections import Counter

    from morphl_community_edition_spark.operators.heavyhitters import (
        heavy_hitters_exact,
        misra_gries_summaries,
    )

    spark = _ENGINES["spark"]
    df = spark.createDataFrame([(w,) for w in words], "word string").repartition(4)
    got = {
        (r["word"], r["cnt"])
        for r in heavy_hitters_exact(df, "word", k=k).collect()
    }
    cnt = Counter(words)
    n = len(words)
    want = {(w, c) for w, c in cnt.items() if c * k > n}
    assert got == want
    cand = {
        r["item"]
        for r in misra_gries_summaries(df, "word", k=k).collect()
        if r["item"] is not None
    }
    assert {w for w, _ in want} <= cand


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lists=st.lists(
        st.lists(st.integers(0, 30), min_size=0, max_size=12, unique=True),
        min_size=2,
        max_size=3,
    ),
    k=st.integers(1, 8),
)
def test_fuzz_rrf_and_retrieval_eval_match_reference(lists, k):
    """rrf_fuse and retrieval_recall_mrr vs pure-Python references on
    random rank lists (each inner list IS a ranking: position+1 =
    rank). Covers empty lists, disjoint/overlapping membership, and
    k beyond/below list length — the boundary shapes q155-q157's
    fixture workload can't reach."""
    from morphl_community_edition_spark.operators.fusion import (
        RRF_K,
        RRF_SCALE,
        rrf_fuse,
    )
    from morphl_community_edition_spark.operators.similarity import (
        retrieval_recall_mrr,
    )

    spark = _ENGINES["spark"]
    frames = {}
    for i, ids in enumerate(lists):
        rows = [(int(d), r + 1) for r, d in enumerate(ids)]
        frames[f"r{i}"] = spark.createDataFrame(rows, "doc_id long, rnk int")

    # --- rrf_fuse vs reference ---
    got = {r["doc_id"]: r for r in rrf_fuse(frames).collect()}
    want = {}
    for i, ids in enumerate(lists):
        for r, d in enumerate(ids):
            want[d] = want.get(d, 0) + RRF_SCALE // (RRF_K + r + 1)
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d]["rrf_scaled"] == s, (d, got[d], s)
        for i, ids in enumerate(lists):
            exp = ids.index(d) + 1 if d in ids else None
            assert got[d][f"r{i}_rnk"] == exp

    # --- retrieval_recall_mrr vs reference (r0 = exact, r1 = approx) ---
    ex_ids, ap_ids = lists[0][:k], lists[1][:k]
    ex = frames["r0"].selectExpr("0 AS q_vec", "doc_id AS n_vec", "rnk")
    ap = frames["r1"].selectExpr("0 AS q_vec", "doc_id AS n_vec", "rnk")
    out = retrieval_recall_mrr(ex, ap, k=k).collect()
    if not ex_ids:
        assert out == []
    else:
        assert len(out) == 1
        row = out[0]
        hits = len(set(ex_ids) & set(ap_ids))
        assert row["hits_at_k"] == hits
        assert abs(row["recall_at_k"] - (hits / k)) < 1e-6 + 1e-9
        top1 = ex_ids[0]
        rr = 1000000 // (ap_ids.index(top1) + 1) if top1 in ap_ids else 0
        assert row["rr_scaled"] == rr
