"""Snapshot query-source fingerprints at verification time (ADVICE r4).

Run at ROUND START, before any code edits. For each registered query
whose most recent committed CORRECTNESS_r*.json row PASSED, and whose
recorded snapshot is older than that row, records::

    {query_name: {"round": <round of that passing row>,
                  "fp": <sha256[:16] of the query's current source>}}

into ``tools/verified_fingerprints.json``. Because the snapshot runs
before the round's edits, "current source" is the source the driver
actually verified. The rotation (queries/__init__._verification_credit)
then grants credit ONLY while a query's live source still hashes to
its snapshotted fp — any later edit drops the query's credit to 0 and
rotates it to the front of the verification window, so changed code
can never coast on stale verification evidence.

Entries for queries no longer in the registry are pruned.

Usage: python tools/snapshot_fingerprints.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from morphl_community_edition_spark import queries as qmod

    path = qmod._FP_PATH
    try:
        fps = json.loads(path.read_text())
        assert isinstance(fps, dict)
    except (OSError, ValueError, AssertionError):
        fps = {}

    latest = qmod._latest_rows()
    updated, pruned = 0, 0
    for name, fn in qmod.QUERIES.items():
        ent = latest.get(name)
        if ent is None or not qmod._row_passed(ent[1]):
            continue
        rnd = ent[0]
        if rnd > int(fps.get(name, {}).get("round", 0)):
            fps[name] = {"round": rnd, "fp": qmod._source_fingerprint(fn)}
            updated += 1
    for stale in set(fps) - set(qmod.QUERIES):
        del fps[stale]
        pruned += 1

    path.write_text(json.dumps(dict(sorted(fps.items())), indent=2) + "\n")
    print(f"{len(fps)} entries ({updated} updated, {pruned} pruned) -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
