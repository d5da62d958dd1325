"""Cross-run state store (SURVEY §1.5, §2.7 I1-I3) — replaces TinyDB.

The reference persists per-table ``Extract`` docs + a
``last_successful_run`` watermark in TinyDB JSON files and corrupts them
under concurrent runs (reference README.md:45, extract.py:61-105). Here:
one JSON file per table written atomically (temp + rename), an explicit
single-writer lock, and the same introspection-TTL reuse semantics
(reference pipeline.py:284-300).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Any


@dataclass
class TableState:
    """Per-table plan + run statistics — the reference's Extract dataclass
    surface (extract.py:14-38), minus the GCP-specific fields."""

    name: str
    rows: int | None = None
    min: Any = None
    max: Any = None
    partition_column: str | None = None
    partitions: int | None = None
    predicates: list[str] | None = None
    strategy: str | None = None
    introspect_ts: float | None = None
    extract_uri: str | None = None
    extract_ts: float | None = None
    rows_loaded: int | None = None
    sink_bytes: int | None = None
    advised_partitions: int | None = None
    warnings: list[str] = field(default_factory=list)

    def consistent(self) -> bool:
        """X7: source rows == loaded rows (reference extract.py:36-38)."""
        return self.rows is not None and self.rows == self.rows_loaded

    def introspection_fresh(self, ttl_s: float, now: float | None = None) -> bool:
        """I3: reuse stored stats unless expired (pipeline.py:284-300)."""
        if self.introspect_ts is None:
            return False
        return ((now or time.time()) - self.introspect_ts) <= ttl_s


class StateStore:
    """Directory of per-table JSON states + run watermark, single-writer."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._lock_path = os.path.join(root, ".lock")
        self._lock_fd: int | None = None

    # -- single-writer enforcement (the reference documents corruption
    # under concurrent runs; we refuse instead) --
    def acquire(self) -> None:
        try:
            self._lock_fd = os.open(
                self._lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
            os.write(self._lock_fd, str(os.getpid()).encode())
        except FileExistsError as e:
            raise RuntimeError(
                f"state dir {self.root} is locked by another run "
                f"(remove {self._lock_path} if stale)"
            ) from e

    def release(self) -> None:
        if self._lock_fd is not None:
            os.close(self._lock_fd)
            self._lock_fd = None
        if os.path.exists(self._lock_path):
            os.remove(self._lock_path)

    def __enter__(self) -> "StateStore":
        self.acquire()
        return self

    def __exit__(self, *exc) -> None:
        self.release()

    # -- per-table state --
    def _table_path(self, name: str) -> str:
        return os.path.join(self.root, f"table__{name}.json")

    def get_table(self, name: str) -> TableState | None:
        p = self._table_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return TableState(**json.load(f))

    def put_table(self, state: TableState) -> None:
        p = self._table_path(state.name)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(state), f, indent=2, default=str)
        os.replace(tmp, p)  # atomic on POSIX — no partial writes

    def list_tables(self) -> list[str]:
        return sorted(
            f[len("table__") : -len(".json")]
            for f in os.listdir(self.root)
            if f.startswith("table__") and f.endswith(".json")
        )

    # -- watermark (I1: last_successful_run, reference main.py:88-100) --
    def _wm_path(self) -> str:
        return os.path.join(self.root, "watermark.json")

    def get_watermark(self, default: str | None = None) -> str | None:
        if not os.path.exists(self._wm_path()):
            return default
        with open(self._wm_path()) as f:
            return json.load(f)["last_successful_run"]

    def set_watermark(self, value: str) -> None:
        tmp = self._wm_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_successful_run": value}, f)
        os.replace(tmp, self._wm_path())
