"""SCALE_BENCH.json is shared by two writers (scale_sweep.py's sweep
sections, scale_x100.py's "x100" section). Round 4 lost the committed
×100 record because the sweep refresh rewrote the whole file; both
writers must now read-modify-write, preserving each other's keys.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))


def test_sweep_merge_preserves_foreign_keys(tmp_path):
    from scale_sweep import merge_write

    path = tmp_path / "SCALE_BENCH.json"
    path.write_text(json.dumps({"x100": {"pass": True}, "queries": {"old": 1}}))
    merge_write({"queries": {"new": 2}, "pass": True}, str(path))
    doc = json.loads(path.read_text())
    assert doc["x100"] == {"pass": True}  # foreign key preserved
    assert doc["queries"] == {"new": 2}  # own key refreshed


def test_x100_section_present_at_head():
    doc = json.loads((REPO / "SCALE_BENCH.json").read_text())
    assert doc.get("x100", {}).get("pass") is True, (
        "SCALE_BENCH.json must carry the x100 spot-check record "
        "(SCALE.md cites SCALE_BENCH.json['x100'])"
    )
    assert doc["x100"]["pagerank"]["ratio"] <= 180
