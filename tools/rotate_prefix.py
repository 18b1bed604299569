#!/usr/bin/env python
"""Compute the checked-prefix rotation (VERDICT r12 #8 / r13 #9
discipline): flagship first, then every stale-or-new query named on the
command line (the round's touched surface, in the given order), then
the remaining stale queries oldest-driver-round-first, saturating the
50 slots. Prints the ``_CHECKED_PREFIX`` literal for plans/__init__.py
and the ``DECLARED_BACKLOG`` literal (stale ∪ new − prefix) for
tests/test_registry_order.py.

Usage: python tools/rotate_prefix.py [touched1 touched2 ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json  # noqa: E402

from query_fingerprints import compute_fingerprints  # noqa: E402

from census_data_pipeline_spark.plans import ORACLE, QUERIES  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PREFIX_N = 50
FLAGSHIP = "flagship_regional_rollup"


def main() -> None:
    touched = [a for a in sys.argv[1:]]
    with open(os.path.join(REPO, "tools", "driver_state.json")) as f:
        state = json.load(f)
    cur = compute_fingerprints(REPO)
    stale = {
        q for q in state
        if q in QUERIES and cur.get(q) != state[q]["fingerprint"]
    }
    new = set(QUERIES) - set(state)
    need = stale | new
    print(f"# stale={len(stale)} new={len(new)} "
          f"oracle_backed_need={len([q for q in need if q in ORACLE])}",
          file=sys.stderr)
    bad = [t for t in touched if t not in need]
    if bad:
        print(f"# NOTE: touched-but-not-stale (skipped): {bad}",
              file=sys.stderr)
    order: list[str] = [FLAGSHIP]
    for t in touched:
        if t in need and t in ORACLE and t not in order:
            order.append(t)
    # remaining stale, oldest driver round first, then registration order
    reg_pos = {q: i for i, q in enumerate(QUERIES)}
    rest = sorted(
        (q for q in need if q in ORACLE and q not in order),
        key=lambda q: (state.get(q, {}).get("round", -1), reg_pos[q]),
    )
    order.extend(rest)
    prefix = order[:PREFIX_N]
    backlog = sorted(need - set(prefix))
    print("_CHECKED_PREFIX = [")
    for q in prefix:
        print(f'    "{q}",')
    print("]")
    print()
    print("DECLARED_BACKLOG = [")
    for q in backlog:
        print(f'    "{q}",')
    print("]")


if __name__ == "__main__":
    main()
