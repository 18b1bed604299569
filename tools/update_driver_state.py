#!/usr/bin/env python
"""Regenerate tools/driver_state.json — the recorded (round, fingerprint)
of every query's LATEST driver CORRECTNESS row (VERDICT r5 #1).

For each CORRECTNESS_rNN.json the driver has committed, this finds the
commit that added it (the round-boundary snapshot the driver verified),
materializes it as a temporary git worktree, and computes symbol-level
query fingerprints (tools/query_fingerprints.py) against that snapshot.
Each query's recorded fingerprint is the one from the LATEST round in
which it has a driver row.

tests/test_registry_order.py::test_changed_queries_sit_in_checked_prefix
compares these against the working tree: any query whose implementation
fingerprint differs from the recorded one must occupy a slot in the
current 50-query checked prefix, so the NEXT driver run re-verifies it —
no query can ship on a stale driver row.

Run this at the START of a round (after the driver has committed the
previous round's CORRECTNESS file):  python tools/update_driver_state.py
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from query_fingerprints import compute_fingerprints  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE_PATH = os.path.join(REPO, "tools", "driver_state.json")


def _git(*args: str) -> str:
    return subprocess.check_output(["git", *args], cwd=REPO, text=True).strip()


def main() -> None:
    rounds: list[tuple[int, str, str]] = []  # (round, file, commit)
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        base = os.path.basename(path)
        rnd = int(base[len("CORRECTNESS_r"):-len(".json")])
        commit = _git("log", "--diff-filter=A", "--format=%H", "--", base)
        if not commit:
            print(f"!! no commit adds {base}; skipping", file=sys.stderr)
            continue
        rounds.append((rnd, path, commit.splitlines()[-1]))

    state: dict[str, dict] = {}
    for rnd, path, commit in sorted(rounds):
        with open(path) as f:
            rows = json.load(f)
        with tempfile.TemporaryDirectory(prefix=f"snap_r{rnd}_") as tmp:
            wt = os.path.join(tmp, "wt")
            _git("worktree", "add", "--detach", "-f", wt, commit)
            try:
                fps = compute_fingerprints(wt)
            finally:
                _git("worktree", "remove", "--force", wt)
        missing = [q for q in rows if q not in fps]
        if missing:
            print(f"!! round {rnd}: no fingerprint for {missing}",
                  file=sys.stderr)
        for q in rows:
            if q in fps:
                state[q] = {"round": rnd, "commit": commit,
                            "fingerprint": fps[q]}
        print(f"# round {rnd} @ {commit[:9]}: {len(rows)} rows",
              file=sys.stderr)

    with open(STATE_PATH, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"# wrote {STATE_PATH}: {len(state)} queries", file=sys.stderr)


if __name__ == "__main__":
    main()
