"""Deterministic offline stand-in for the Census API (no network in the
test environment): generates the same response shape the live endpoint
returns (header row + string rows — see reference
src/census_pipeline.py:343-365), seeded per (state, geography) so example
runs are reproducible. Swap ``fetch=synthetic_fetch`` for the default
transport to run the examples against the live API."""

from __future__ import annotations

import random
import re
import urllib.parse


def _units_for(state: str, geography: str) -> int:
    return {"county": 12, "tract": 40}.get(geography, 5)


def synthetic_fetch(url: str) -> list[list[str]]:
    q = urllib.parse.parse_qs(urllib.parse.urlparse(url).query)
    variables = q["get"][0].split(",")[1:]  # after NAME
    for_clause = q["for"][0]
    geography = for_clause.split(":")[0]
    in_clause = q.get("in", [""])[0]
    m = re.search(r"state:(\d+)", in_clause or for_clause)
    state = (m.group(1) if m else "01").zfill(2)

    rng = random.Random(f"{state}|{geography}")
    header = ["NAME"] + variables + ["state"]
    if geography in ("county", "tract"):
        header.append("county")
    if geography == "tract":
        header.append("tract")

    rows = []
    for i in range(_units_for(state, geography)):
        name = f"Unit {i}, State {state}"
        values = []
        for v in variables:
            base = rng.uniform(100, 100000)
            # sprinkle the reference's sentinel codes and junk values
            roll = rng.random()
            if roll < 0.03:
                values.append("-666666666")
            elif roll < 0.04:
                values.append("N/A")
            else:
                values.append(f"{base:.0f}")
        row = [name] + values + [state]
        if geography in ("county", "tract"):
            row.append(f"{(i % 20) + 1:03d}")
        if geography == "tract":
            row.append(f"{(i + 1) * 100:06d}")
        rows.append(row)
    return [header] + rows
