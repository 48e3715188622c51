"""Snapshot query-source fingerprints at verification time (ADVICE r4).

Run at ROUND START, before any code edits. For each registered query
whose most recent committed CORRECTNESS_r*.json row PASSED, and whose
recorded snapshot is older than that row, records::

    {query_name: {"round": <round of that passing row>,
                  "fp": <sha256[:16] of the query's current source>}}

into ``tools/verified_fingerprints.json``. The rotation
(queries/__init__._verification_credit) then grants credit ONLY while
a query's live source still hashes to its snapshotted fp — any later
edit drops the query's credit to 0 and rotates it to the front of the
verification window, so changed code can never coast on stale
verification evidence.

Run-at-round-start is ENFORCED, not trusted (ADVICE r5): a
verification row that carries its own ``fp`` field (localcheck.py
records one at verification time) is used verbatim; for rows without
one (the driver's artifacts), the snapshot refuses to record a
fingerprint for any query whose defining module has uncommitted git
modifications — an edited-then-snapshotted source can no longer
inherit the driver's credit.

Entries for queries no longer in the registry are pruned.

Usage: python tools/snapshot_fingerprints.py
"""

from __future__ import annotations

import inspect
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _dirty_files() -> set[str]:
    """Absolute paths of files with uncommitted modifications."""
    try:
        out = subprocess.run(
            ["git", "-C", REPO, "status", "--porcelain"],
            capture_output=True, text=True, check=True,
        ).stdout
    except (OSError, subprocess.CalledProcessError):
        # no git → cannot prove cleanliness → treat everything dirty
        return {"<unknown>"}
    dirty = set()
    for line in out.splitlines():
        p = line[3:].split(" -> ")[-1].strip().strip('"')
        if p:
            dirty.add(os.path.realpath(os.path.join(REPO, p)))
    return dirty


def main() -> int:
    from morphl_community_edition_spark import queries as qmod

    path = qmod._FP_PATH
    try:
        fps = json.loads(path.read_text())
        assert isinstance(fps, dict)
    except (OSError, ValueError, AssertionError):
        fps = {}

    latest = qmod._latest_rows()
    dirty = _dirty_files()
    updated, pruned, refused = 0, 0, 0
    for name, fn in qmod.QUERIES.items():
        ent = latest.get(name)
        if ent is None or not qmod._row_passed(ent[1]):
            continue
        rnd = ent[0]
        if rnd > int(fps.get(name, {}).get("round", 0)):
            row_fp = ent[1].get("fp") if isinstance(ent[1], dict) else None
            if not row_fp:
                try:
                    src = os.path.realpath(inspect.getsourcefile(fn) or "")
                except TypeError:
                    src = ""
                if not src or src in dirty or "<unknown>" in dirty:
                    refused += 1
                    print(
                        f"# refused {name}: defining module has uncommitted "
                        "edits — current source is not what the driver verified",
                        file=sys.stderr,
                    )
                    continue
            fps[name] = {"round": rnd, "fp": row_fp or qmod._source_fingerprint(fn)}
            updated += 1
    for stale in set(fps) - set(qmod.QUERIES):
        del fps[stale]
        pruned += 1

    path.write_text(json.dumps(dict(sorted(fps.items())), indent=2) + "\n")
    print(
        f"{len(fps)} entries ({updated} updated, {pruned} pruned, "
        f"{refused} refused-dirty) -> {path}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
