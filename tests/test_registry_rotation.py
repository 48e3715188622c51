"""The registry's disclosed coverage-rotation protocol.

The registry is presented least-recently-verified-first (see
queries/__init__._sort_registry): sort key = (verification credit,
numeric id), where credit is the round of the query's most recent
PASSING CORRECTNESS_r*.json row — and only while the query's current
source still hashes to the fingerprint snapshotted at that
verification (tools/verified_fingerprints.json). These tests pin the
properties the protocol promises — determinism, never-verified-first,
failed-row and edited-source credit revocation (ADVICE r4), numeric
(not lexicographic) tie-break, and full-registry coverage under
repeated prefix sampling.
"""

from __future__ import annotations

import json

from morphl_community_edition_spark import queries as qmod


def _simulated_order(credit: dict[str, int], names: list[str]) -> list[str]:
    return sorted(names, key=lambda s: (credit.get(s, 0), qmod._query_number(s)))


def test_zero_credit_sorts_first():
    credit = qmod._verification_credit()
    names = list(qmod.QUERIES)
    zero = [n for n in names if credit.get(n, 0) == 0]
    if not zero:  # every query currently holds valid credit
        return
    # every zero-credit query precedes every credited one
    pos = {n: i for i, n in enumerate(names)}
    assert max(pos[n] for n in zero) < min(
        pos[n] for n in names if credit.get(n, 0) > 0
    )


def test_order_matches_protocol_exactly():
    credit = qmod._verification_credit()
    assert list(qmod.QUERIES) == _simulated_order(credit, list(qmod.QUERIES))


def test_numeric_tiebreak_not_lexicographic():
    # q100 must NOT land between q09 and q10 within an equal-credit tier
    names = ["q09_a", "q100_b", "q10_c", "q02_d"]
    assert _simulated_order({}, names) == ["q02_d", "q09_a", "q10_c", "q100_b"]


def test_failed_row_confers_no_credit():
    """ADVICE r4 (medium): a query whose latest driver row FAILED must
    sort first for re-check, not rotate to the back."""
    assert not qmod._row_passed(
        {"rows_match": True, "schema_match": True, "hash_match": False}
    )
    assert not qmod._row_passed({"rows_match": False})
    assert qmod._row_passed(
        {"rows_match": True, "schema_match": True, "hash_match": True}
    )
    # no-oracle tier: pass requires a NON-EMPTY result
    assert qmod._row_passed({"err": "no_oracle", "spark_rows": 50})
    assert not qmod._row_passed({"err": "no_oracle", "spark_rows": 0})
    assert not qmod._row_passed({"err": "no_oracle", "spark_rows": None})


def test_edited_source_loses_credit():
    """ADVICE r4 (high): code changed since its snapshotted
    verification must drop to credit 0 — stale evidence cannot shield
    a modified implementation from re-verification."""
    fps = qmod._load_fingerprints()
    if fps is None:  # fresh checkout without the snapshot — degraded mode
        return
    latest = qmod._latest_rows()
    credit = qmod._verification_credit()
    for name, fn in qmod.QUERIES.items():
        ent = latest.get(name)
        if ent is None or not qmod._row_passed(ent[1]):
            assert credit[name] == 0
        elif name not in fps or fps[name]["fp"] != qmod._source_fingerprint(fn):
            # edited (or never-snapshotted) implementation: revoked
            assert credit[name] == 0
        else:
            assert credit[name] == int(fps[name]["round"]) > 0


def test_fingerprint_covers_oracle_sql():
    """The fingerprint must cover the oracle BY VALUE (round-6 review
    finding): for a by-reference registration (oracle=_CONSTANT) the
    decorator text never changes when the constant's SQL does, so
    hashing only getsource would keep stale credit alive. Simulate an
    oracle edit for a by-reference query and assert the fingerprint
    moves; also keep the older decorator-block property."""
    import inspect

    fn = next(iter(qmod.QUERIES.values()))
    assert inspect.getsource(fn).lstrip().startswith("@query")

    name = "q118_pii_redaction"  # registered as oracle=_pii_oracle()
    fn = qmod.QUERIES[name]
    assert "oracle=_pii_oracle()" in inspect.getsource(fn), (
        "test premise: q118 must register its oracle by reference"
    )
    before = qmod._source_fingerprint(fn)
    orig = qmod.ORACLE_SQL[name]
    try:
        qmod.ORACLE_SQL[name] = orig + " -- edited"
        assert qmod._source_fingerprint(fn) != before, (
            "editing a by-reference oracle must change the fingerprint"
        )
    finally:
        qmod.ORACLE_SQL[name] = orig
    assert qmod._source_fingerprint(fn) == before


def test_prefix_sampling_covers_all_queries_across_rounds():
    """Simulate the per-round consumer: it samples the first W entries,
    then (as the harness does) writes a CORRECTNESS row for each.
    Under the protocol every query must be seen within ceil(N/W)+1
    simulated rounds, for any starting history."""
    names = [f"q{i:02d}_x" for i in range(1, 103)]
    w = 50
    credit = {n: 3 for n in names[:50]}  # arbitrary initial history
    seen: set[str] = set(credit)
    for rnd in range(4, 9):
        window = _simulated_order(credit, names)[:w]
        seen.update(window)
        for n in window:
            credit[n] = rnd
    assert seen == set(names)
    # and steady state is a strict round-robin: two consecutive
    # windows never overlap when N >= 2W
    w1 = set(_simulated_order(credit, names)[:w])
    for n in w1:
        credit[n] = 9
    w2 = set(_simulated_order(credit, names)[:w])
    assert not (w1 & w2)


def test_latest_rows_parses_committed_artifacts():
    latest = qmod._latest_rows()
    # r3 artifact exists in-repo; its keys must be mapped to >= 3
    with open(
        qmod.Path(qmod.__file__).resolve().parents[2] / "CORRECTNESS_r03.json"
    ) as f:
        r3 = json.load(f)
    for k in r3:
        assert k in latest and latest[k][0] >= 3


def test_snapshot_refuses_dirty_modules(tmp_path, monkeypatch):
    """ADVICE r5 (low): the fingerprint snapshot must not grant
    verification credit to EDITED source. A driver row without its own
    fp is refused while the query's defining module has uncommitted
    changes; a row carrying an fp (localcheck records one at
    verification time) is used verbatim, dirty or not."""
    import importlib.util
    import inspect
    import os

    repo = qmod.Path(qmod.__file__).resolve().parents[2]
    spec = importlib.util.spec_from_file_location(
        "snapshot_fingerprints_under_test", repo / "tools" / "snapshot_fingerprints.py"
    )
    sf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sf)

    name, fn = next(iter(qmod.QUERIES.items()))
    modfile = os.path.realpath(inspect.getsourcefile(fn))
    fp_path = tmp_path / "fp.json"
    monkeypatch.setattr(qmod, "_FP_PATH", fp_path)
    passing = {"rows_match": True, "schema_match": True, "hash_match": True}

    # dirty module + no row fp -> refused
    monkeypatch.setattr(qmod, "_latest_rows", lambda: {name: (99, dict(passing))})
    monkeypatch.setattr(sf, "_dirty_files", lambda: {modfile})
    sf.main()
    assert name not in json.loads(fp_path.read_text())

    # clean module -> recorded with the current source fingerprint
    monkeypatch.setattr(sf, "_dirty_files", lambda: set())
    sf.main()
    rec = json.loads(fp_path.read_text())[name]
    assert rec == {"round": 99, "fp": qmod._source_fingerprint(fn)}

    # row-carried fp (verification-time evidence) wins even when dirty
    monkeypatch.setattr(
        qmod, "_latest_rows", lambda: {name: (100, dict(passing, fp="deadbeef00000000"))}
    )
    monkeypatch.setattr(sf, "_dirty_files", lambda: {modfile})
    sf.main()
    rec = json.loads(fp_path.read_text())[name]
    assert rec == {"round": 100, "fp": "deadbeef00000000"}


def test_readme_counts_match_registry():
    """Docs hygiene as a test (round-4 verdict #8): the README's
    query/oracle counts are contract surface — they must track the
    live registry exactly, so drift fails the suite instead of
    surviving a round."""
    n_q, n_o = len(qmod.QUERIES), len(qmod.ORACLE_SQL)
    readme = (
        qmod.Path(qmod.__file__).resolve().parents[2] / "README.md"
    ).read_text()
    assert f"{n_q} queries" in readme, f"README should declare {n_q} queries"
    assert f"{n_q} contract queries ({n_o} DuckDB-hash-" in readme, (
        f"README should declare {n_o} hash-checked of {n_q}"
    )


def test_readme_test_count_matches_collection():
    """Round-5 verdict #8: the README's declared TEST count drifted by
    hand; lock it to an actual pytest collection (subprocess
    collect-only, so the number is independent of however THIS run was
    scoped)."""
    import re
    import subprocess
    import sys

    repo = qmod.Path(qmod.__file__).resolve().parents[2]
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True, text=True, cwd=repo, timeout=300,
    ).stdout
    m = re.search(r"(\d+) tests collected", out)
    assert m, f"could not parse collect-only output: {out[-300:]}"
    n = int(m.group(1))
    readme = (repo / "README.md").read_text()
    assert f"{n} tests" in readme, f"README should declare {n} tests"


def test_scale_sweep_artifact_regenerated_this_round():
    """Round-7 verdict #5: the decade-ratio scale evidence must be
    REGENERATED every round, not hand-run once and fossilized. The
    current build round is max(CORRECTNESS_r*) + 1 (the driver writes
    its artifact at round END); tools/scale_sweep.py writes
    SCALE_r{N}.json for that round, and this test is the forcing
    function — red at round start until the sweep has run."""
    import glob
    import json
    import re

    repo = qmod.Path(qmod.__file__).resolve().parents[2]
    import os

    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(str(repo / "CORRECTNESS_r*.json"))
    ]
    if not rounds:  # fresh checkout without driver artifacts
        return
    current = max(rounds) + 1
    path = repo / f"SCALE_r{current:02d}.json"
    assert path.exists(), (
        f"SCALE_r{current:02d}.json missing — run `python tools/scale_sweep.py` "
        "to regenerate this round's decade-ratio evidence"
    )
    report = json.loads(path.read_text())
    assert report["round"] == current
    fams = report["families"]
    assert {"documents", "events", "embeddings"} <= set(fams)
    for fam in fams.values():
        assert fam["sf0.1"] and fam["variants"]
