"""Regenerate GATE_HISTORY.json: query -> {latest_green, rounds} derived
from the committed CORRECTNESS_r0*.json artifacts, so the union-green
invariant (every registered query has at least one green driver round or
a documented rows-only/local-only status) is checkable from one file
instead of re-deriving it by script each round.

A round is "green" for a query when rows+schema+hash all match with no
err; rows-only annex entries count as green when they executed with
rows_match and no err (the documented weaker contract). Run from the
repo root: python tools/gate_history.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build() -> dict:
    sys.path.insert(0, REPO)
    from big_data_elt_pipeline_spark.plans import queries as Q

    registered = sorted(Q.spark_queries())
    oracles = Q.oracle_queries()
    history: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            full = (
                rec.get("rows_match") and rec.get("schema_match")
                and rec.get("hash_match") and not rec.get("err")
            )
            # annex record shape: err == 'no_oracle', matches all None,
            # spark_rows carries the executed row count
            rows_only = (
                rec.get("err") == "no_oracle"
                and rec.get("spark_rows") is not None
                and rec.get("spark_rows") >= 0
            )
            if full or rows_only:
                # mode is tracked PER ROUND so a query that later moves to
                # the rows-only annex reports the contract of its latest
                # green round, not a sticky historical maximum (a past
                # oracle round must not overstate the current contract)
                h = history.setdefault(name, {"rounds": {}})
                h["rounds"][rnd] = "oracle" if full else "rows_only"
    out = {}
    for name in registered:
        h = history.get(name)
        out[name] = {
            "latest_green": max(h["rounds"]) if h else None,
            "rounds": sorted(h["rounds"]) if h else [],
            "mode": (
                h["rounds"][max(h["rounds"])] if h
                else ("oracle_local_only" if oracles.get(name) else "rows_only_local_only")
            ),
        }
    never = sorted(n for n, v in out.items() if v["latest_green"] is None)
    return {
        "registered": len(registered),
        "driver_green_union": len(registered) - len(never),
        "never_driver_gated": never,
        "queries": out,
    }


if __name__ == "__main__":
    payload = build()
    dest = os.path.join(REPO, "GATE_HISTORY.json")
    with open(dest, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=False)
    print(
        f"{dest}: {payload['driver_green_union']}/{payload['registered']} "
        f"driver-green; never gated: {payload['never_driver_gated']}"
    )
