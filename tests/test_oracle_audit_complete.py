"""Mechanical freshness gate for ORACLE_AUDIT.md (VERDICT r10 #2).

The audit ledger caught two real bugs (q_markov_attribution's
unconverged fixed point, q_logrank_test's sparse risk sets) — it must
not rot the way ADVICE.md did in r9.  These tests make rot impossible:

* a NEW query cannot register without a ledger row (exhaustiveness),
* a parity-only (B/C/D) row cannot ship without a RESOLVABLE anchor
  test (file + function existence checked by AST, not convention),
* the prose doc and the code ledger cannot drift apart (every non-A
  query appears in ORACLE_AUDIT.md; every query the doc names is
  registered — this check's first run caught the doc's
  ``q_ratio_variance`` vs the registered ``q_ratio_se``).

No Spark session needed — pure registry/AST/doc checks.
"""

from __future__ import annotations

import ast
import re
from pathlib import Path

from dumpty_spark.queries import REGISTRY
from dumpty_spark.queries.audit_ledger import (
    AUDIT_A,
    AUDIT_B,
    AUDIT_C,
    AUDIT_D,
    classification,
)

REPO = Path(__file__).resolve().parent.parent
DOC = REPO / "ORACLE_AUDIT.md"


def test_every_registered_query_classified_exactly_once():
    """Exhaustive + disjoint: the ledger covers the registry exactly.
    A new operator that registers without adding an audit row fails
    HERE, by name."""
    cls = classification()  # raises on a double classification
    ledger = set(cls)
    registry = set(REGISTRY)
    unclassified = sorted(registry - ledger)
    ghosts = sorted(ledger - registry)
    assert not unclassified, (
        f"registered queries missing an ORACLE_AUDIT classification "
        f"(add a row to dumpty_spark/queries/audit_ledger.py, and an "
        f"anchor if the oracle replays the derivation): {unclassified}"
    )
    assert not ghosts, f"ledger rows for unregistered queries: {ghosts}"


def test_category_tables_are_disjoint():
    sets = [set(AUDIT_A), set(AUDIT_B), set(AUDIT_C), set(AUDIT_D)]
    total = sum(len(s) for s in sets)
    assert len(set().union(*sets)) == total, "a query appears in two categories"


def _resolve_anchor(anchor: str) -> str | None:
    """Return an error string if the anchor does not resolve."""
    if "::" not in anchor:
        return f"anchor {anchor!r} must be 'tests/file.py::test_fn'"
    path, fn = anchor.split("::", 1)
    f = REPO / path
    if not f.exists():
        return f"anchor file missing: {path}"
    tree = ast.parse(f.read_text())
    names = {
        n.name for n in ast.walk(tree)
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    }
    if fn not in names:
        return f"anchor function {fn} not found in {path}"
    if not fn.startswith("test"):
        return f"anchor {anchor} is not a test function"
    return None


def test_every_parity_anchor_resolves():
    """Every B/C/D row's named independent anchor must exist as a real
    test function — a classification without a live anchor is the exact
    rot mode the r10 audit exists to prevent."""
    errors = []
    for table in (AUDIT_B, AUDIT_C, AUDIT_D):
        for name, anchor in sorted(table.items()):
            if not anchor:
                errors.append(f"{name}: no anchor")
                continue
            err = _resolve_anchor(anchor)
            if err:
                errors.append(f"{name}: {err}")
    assert not errors, "anchor-less / dangling parity rows:\n" + "\n".join(errors)


def test_doc_and_ledger_agree():
    """The prose doc and the code ledger cannot drift: every non-A query
    is named (backticked) somewhere in ORACLE_AUDIT.md, and every query
    the doc names is actually registered."""
    txt = DOC.read_text()
    doc_names = set(re.findall(r"`(q_[a-z0-9_]+)`", txt))
    non_a = set(AUDIT_B) | set(AUDIT_C) | set(AUDIT_D)
    missing_from_doc = sorted(non_a - doc_names)
    assert not missing_from_doc, (
        f"parity-classified queries with no ORACLE_AUDIT.md row: "
        f"{missing_from_doc}"
    )
    unregistered = sorted(doc_names - set(REGISTRY))
    assert not unregistered, (
        f"ORACLE_AUDIT.md names queries that are not registered "
        f"(doc rot): {unregistered}"
    )


def test_parity_rows_have_oracles():
    """B/C/D classification is about the ORACLE replaying a derivation —
    a rows-only query (no oracle) has nothing to classify; conversely
    every classified parity query must actually have an oracle."""
    for table in (AUDIT_B, AUDIT_C, AUDIT_D):
        for name in table:
            assert REGISTRY[name].oracle is not None, (
                f"{name} is classified parity-only but has no oracle"
            )
