"""The registry's disclosed coverage-rotation protocol.

The registry is presented least-recently-driver-verified-first (see
queries/__init__._sort_registry): sort key = (round of the query's
most recent CORRECTNESS_r*.json row, numeric id). These tests pin the
properties the protocol promises — determinism, never-verified-first,
numeric (not lexicographic) tie-break, and full-registry coverage
under repeated prefix sampling.
"""

from __future__ import annotations

import json

from morphl_community_edition_spark import queries as qmod


def _simulated_order(last: dict[str, int], names: list[str]) -> list[str]:
    return sorted(names, key=lambda s: (last.get(s, 0), qmod._query_number(s)))


def test_never_verified_sort_first():
    last = qmod._last_verified_round()
    names = list(qmod.QUERIES)
    never = [n for n in names if n not in last]
    if not never:  # all queries have been verified at least once
        return
    # every never-verified query precedes every verified one
    pos = {n: i for i, n in enumerate(names)}
    max_never = max(pos[n] for n in never)
    min_seen = min(pos[n] for n in names if n in last)
    assert max_never < min_seen


def test_order_matches_protocol_exactly():
    last = qmod._last_verified_round()
    assert list(qmod.QUERIES) == _simulated_order(last, list(qmod.QUERIES))


def test_numeric_tiebreak_not_lexicographic():
    # q100 must NOT land between q09 and q10 within an equal-round tier
    names = ["q09_a", "q100_b", "q10_c", "q02_d"]
    assert _simulated_order({}, names) == ["q02_d", "q09_a", "q10_c", "q100_b"]


def test_prefix_sampling_covers_all_queries_across_rounds():
    """Simulate the per-round consumer: it samples the first W entries,
    then (as the harness does) writes a CORRECTNESS row for each.
    Under the protocol every query must be seen within ceil(N/W)+1
    simulated rounds, for any starting history."""
    names = [f"q{i:02d}_x" for i in range(1, 103)]
    w = 50
    last = {n: 3 for n in names[:50]}  # arbitrary initial history
    seen: set[str] = set(last)
    for rnd in range(4, 9):
        window = _simulated_order(last, names)[:w]
        seen.update(window)
        for n in window:
            last[n] = rnd
    assert seen == set(names)
    # and steady state is a strict round-robin: two consecutive
    # windows never overlap when N >= 2W
    w1 = set(_simulated_order(last, names)[:w])
    for n in w1:
        last[n] = 9
    w2 = set(_simulated_order(last, names)[:w])
    assert not (w1 & w2)


def test_last_verified_round_parses_committed_artifacts():
    last = qmod._last_verified_round()
    # r3 artifact exists in-repo; its keys must be mapped to >= 3
    with open(qmod.Path(qmod.__file__).resolve().parents[2] / "CORRECTNESS_r03.json") as f:
        r3 = json.load(f)
    for k in r3:
        assert last.get(k, 0) >= 3
