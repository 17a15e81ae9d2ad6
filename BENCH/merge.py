"""Merge watcher.py results.jsonl into per-(variant, cores) capability and
the N->4N efficiency table BASELINE.md reports.

Capability = min build_secs / min query_secs / min sustained_secs across
all legs of that (variant, cores) — preferring QUIET legs (probe before
AND after cleared the window gates); falls back to all legs when no quiet
one exists, flagged in the output.

Usage: python BENCH/merge.py /tmp/watcher_r5/results.jsonl [more.jsonl...]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict

N_QUERIES = 5000
SUSTAINED_BATCHES = 4


def main() -> None:
    rows = []
    for path in sys.argv[1:]:
        with open(path) as f:
            rows += [json.loads(l) for l in f if l.strip()]
    rows = [r for r in rows if "error" not in r["result"]]

    groups: dict[tuple, list] = defaultdict(list)
    for r in rows:
        groups[(r["variant"], r["cores"])].append(r)

    caps = {}
    for key, legs in sorted(groups.items()):
        # capability = min across ALL legs (the fastest leg is by definition
        # the one that saw the quietest window for its core set); quiet-leg
        # mins are reported alongside as the stricter cross-check
        quiet_legs = [l for l in legs if l.get("quiet")]
        cap = {
            "build_secs": min(l["result"]["build_secs"] for l in legs),
            "query_secs": min(l["result"]["query_secs"] for l in legs),
            "sustained_secs": min(l["result"]["sustained_secs"] for l in legs),
            "n_legs": len(legs), "n_quiet": len(quiet_legs),
            "ceilings": sorted(
                round(l["probe_before"]["ceiling_efficiency"], 3) for l in legs
            ),
        }
        if quiet_legs:
            cap["quiet_mins"] = {
                k: min(l["result"][f"{k}_secs"] for l in quiet_legs)
                for k in ("build", "query", "sustained")
            }
        caps[f"{key[0]}:{key[1]}"] = cap

    out = {"capability": caps, "efficiency": {}}
    for variant in {k.split(":")[0] for k in caps}:
        lo, hi = caps.get(f"{variant}:4"), caps.get(f"{variant}:16")
        if not (lo and hi):
            continue
        n_docs = 300000
        out["efficiency"][variant] = {
            "build": round(lo["build_secs"] / hi["build_secs"] / 4, 3),
            "query_sustained": round(lo["sustained_secs"] / hi["sustained_secs"] / 4, 3),
            "query_latency": round(lo["query_secs"] / hi["query_secs"] / 4, 3),
            "build_docs_per_sec_16": round(n_docs / hi["build_secs"], 1),
            "sustained_qps_16": round(
                N_QUERIES * SUSTAINED_BATCHES / hi["sustained_secs"], 1
            ),
            "sustained_qps_4": round(
                N_QUERIES * SUSTAINED_BATCHES / lo["sustained_secs"], 1
            ),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
