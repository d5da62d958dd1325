"""Round-9 ADVICE.md fixes, pinned: correct Shapley coefficients,
JW NULL propagation, hubness slice single-source-of-truth, Wilson
comment parity. (The substantive regression guards live beside the
features — test_frontier35.py asserts exact Shapley efficiency,
test_frontier32.py the NULL contract; these pins assert the
single-source-of-truth plumbing can't silently desynchronize again.)"""

from dumpty_spark.queries import REGISTRY  # noqa: F401  (fixture parity)


def test_shapley_fact_dict_is_single_source():
    """_FACT must hold |S|!(n-1-|S|)! for n=4 and the oracle CASE must be
    generated from it (ADVICE r8 high: {1,1,2,6} shipped in both engine
    and oracle, silently passing the value-level check)."""
    import math

    from dumpty_spark.queries.frontier35 import _FACT, _shap_oracle

    n = 4
    for s_size, fact in _FACT.items():
        assert fact == math.factorial(s_size) * math.factorial(n - s_size - 1)
    sql = _shap_oracle()
    for s_size, fact in _FACT.items():
        assert f"WHEN {s_size} THEN {fact}" in sql
    # the weights must sum to n! over all subsets of the other 3 channels
    from math import comb

    assert sum(comb(3, s) * _FACT[s] for s in range(4)) == math.factorial(n)


def test_hubness_slice_interpolated_into_oracle():
    """The oracle must derive the slice bound from _HUB_SLICE (ADVICE r8
    low: a hardcoded 500 desynchronizes when the constant changes)."""
    from dumpty_spark.queries import frontier37 as f37

    assert f"vec_id < {f37._HUB_SLICE}" in f37._HUBNESS_ORACLE
    assert "1000-vector" not in open(f37.__file__).read()


def test_jaro_winkler_docstring_owns_null_contract():
    from dumpty_spark.operators.editdist import jaro_winkler

    assert "NULL" in jaro_winkler.__doc__
