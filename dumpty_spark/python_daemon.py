"""PySpark worker daemon with the heavy libraries preloaded (r11
optimization, guide §4.5 applied one level up the stack).

PySpark forks each Python worker from a small daemon process; the
daemon itself imports almost nothing, so EVERY fresh worker pays the
full ``import pandas`` / ``pyarrow`` / ``numpy`` cost (~1-2s of pure
CPU each) before its first Arrow batch. A concurrently-heavy stage
that demands a wave of new workers (measured here: a 63-fork wave
inside one ANN audit query, every fork re-importing pandas under a
saturated machine) multiplies that cost by the wave size.

Importing the libraries HERE — in the daemon, before any fork — makes
every forked worker inherit the already-initialized modules through
copy-on-write fork memory: worker start-up drops to the fork itself.
The daemon's extra ~150 MB RSS is shared, not per worker.

Activated via ``spark.python.daemon.module`` (session.py). The module
must be importable on every executor host; in local mode that is this
repo, on a cluster it ships with the package like every other module.
``pyspark.daemon.manager`` is the same entry point the stock daemon
runs — behavior is unchanged except for the preloaded imports.
"""

from __future__ import annotations

import os

# the THP stall fix must be in place before numpy's first import in
# every worker lineage (see dumpty_spark/__init__.py)
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

try:  # preload order: numpy -> pandas -> pyarrow (heaviest last)
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
except Exception:  # pragma: no cover - a worker without the libs still works
    pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
