"""Validation (SURVEY X7, P5): row-count reconciliation and table-list
reconcile — the reference's only correctness guards, kept as first-class
engine checks."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Reconciliation:
    requested_missing: tuple[str, ...]  # requested but absent at source
    actual_extra: tuple[str, ...]  # present at source but not requested


def reconcile_table_lists(requested: list[str], actual: list[str]) -> Reconciliation:
    """P5: case-insensitive anti-join both directions (reference
    pipeline.py:569-582)."""
    req = {t.lower(): t for t in requested}
    act = {t.lower(): t for t in actual}
    return Reconciliation(
        requested_missing=tuple(sorted(req[k] for k in req.keys() - act.keys())),
        actual_extra=tuple(sorted(act[k] for k in act.keys() - req.keys())),
    )


def select_incremental(configured: list[str], changed: list[str]) -> list[str]:
    """P6/I2: semi-join of configured tables with the change-tracking
    result (reference main.py:235-239), case-insensitive, order-stable."""
    changed_l = {t.lower() for t in changed}
    return [t for t in configured if t.lower() in changed_l]
