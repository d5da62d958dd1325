"""Execution-regime telemetry for the two-regime iterative operators.

``connected_components`` and ``pagerank`` each pick between a driver-side
fast path (tiny inputs: avoids per-round job latency) and the distributed
loop (the 100 TB path). The choice is an internal planning decision, which
made the round-2 scale story unverifiable from the outside: nothing could
*observe* that a ×10 input actually crossed the gate. This module is that
observation point — each operator records which regime it took, keyed by
operator name, and the scale sweep / regime tests read it back.

Deliberately a plain module-level dict (no locks): the recorders run on
the driver only, and concurrent driver-side operator launches within one
process are not a supported pattern for the iterative operators anyway.
"""

from __future__ import annotations

import os

# operator name -> {"regime": "driver"|"distributed", "size": int}
LAST: dict[str, dict] = {}


def force_distributed() -> bool:
    """True when SPARK_GRAFT_FORCE_DISTRIBUTED=1: every two-regime gate
    skips its driver fast path. The scale sweep sets this to measure a
    WITHIN-regime x10 ratio when an operator's gate legitimately crosses
    between the two SFs (driver at sf0.1, distributed at sf1): the
    cross-regime wall-clock ratio compares a numpy loop against a
    cluster loop and says nothing about the distributed path's scaling,
    which is the thing the linear-model cap exists to check."""
    return os.environ.get("SPARK_GRAFT_FORCE_DISTRIBUTED") == "1"


def record(op: str, regime: str, size: int) -> None:
    LAST[op] = {"regime": regime, "size": size}
