#!/usr/bin/env python
"""Tighten-only baseline ratchet (the policy BASELINE.md documents,
made mechanical): fold a bench run's per-query timings into
bench_baseline.json.

    python scripts/ratchet_baseline.py /path/to/bench_output.json

Rules:
- existing query measured FASTER  -> tighten to the new value
- existing query measured slower  -> keep the committed value (window
  variance never loosens a baseline; real regressions are the flag
  pipeline's job, not the ratchet's)
- new query (no baseline)         -> first measurement enters as-is
- `early_probe_clear_streak` is copied from the run (bench.py emits the
  post-adjudication streaks; queries that did not clear by early probe
  this round reset to absent) so the cross-round cap has its state
- metadata (n_queries / n_shared_caches / sf) refreshed from the run

Prints a one-line summary of tightened / kept / added counts.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ratchet(run: dict, baseline: dict) -> tuple[dict, dict]:
    old = baseline.get("queries", {})
    new = run["queries"]
    out: dict[str, float] = {}
    stats = {"tightened": 0, "kept": 0, "added": 0, "dropped": 0}
    for name, t in new.items():
        base = old.get(name)
        if base is None:
            out[name] = t
            stats["added"] += 1
        elif t < base:
            out[name] = t
            stats["tightened"] += 1
        else:
            out[name] = base
            stats["kept"] += 1
    stats["dropped"] = len(set(old) - set(new))
    doc = {
        "metric": run.get("metric", "total_query_wall_sec"),
        "value": round(sum(out.values()), 4),
        "unit": "sec",
        "sf": run.get("sf"),
        "n_queries": sum(
            1 for k in out if not k.startswith("shared_cache:")
        ),
        "n_shared_caches": sum(
            1 for k in out if k.startswith("shared_cache:")
        ),
        "early_probe_clear_streak": run.get(
            "early_probe_clear_streak", {}
        ),
        "queries": dict(sorted(out.items())),
    }
    return doc, stats


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    with open(sys.argv[1]) as fh:
        txt = fh.read()
    # the bench log may carry stderr noise; the result is the last line
    # that parses as a JSON object with a "queries" key
    run = None
    for line in reversed(txt.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            cand = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(cand, dict) and "queries" in cand:
            run = cand
            break
    if run is None:
        print("no bench JSON line found in input")
        return 1
    # streaks live in BENCH_SUMMARY.json (bench.py writes them there)
    summary_path = os.path.join(REPO, "BENCH_SUMMARY.json")
    if os.path.exists(summary_path):
        with open(summary_path) as fh:
            run.setdefault(
                "early_probe_clear_streak",
                json.load(fh).get("early_probe_clear_streak", {}),
            )
    base_path = os.path.join(REPO, "bench_baseline.json")
    baseline = {}
    if os.path.exists(base_path):
        with open(base_path) as fh:
            baseline = json.load(fh)
    doc, stats = ratchet(run, baseline)
    with open(base_path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps({"total": doc["value"], **stats}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
