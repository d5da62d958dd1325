"""Round-10 batch (EXT E232-E235) — oracle parity is covered by the
registry t2 tests; these are the INDEPENDENT anchors each query ships
with under the ORACLE_AUDIT.md maintenance rule, plus shape pins."""

from __future__ import annotations

import math

import numpy as np

from dumpty_spark.queries import REGISTRY
from tests.oracle import run_duckdb


def _pav(y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Classic stack-based pool-adjacent-violators — a genuinely
    different algorithm from the engines' minimax formula."""
    blocks = [[y[i] * w[i], w[i], 1] for i in range(len(y))]  # sum, w, count
    out: list = []
    for b in blocks:
        out.append(b)
        while len(out) > 1 and out[-2][0] / out[-2][1] >= out[-1][0] / out[-1][1]:
            s, ww, c = out.pop()
            out[-1][0] += s
            out[-1][1] += ww
            out[-1][2] += c
    fit = []
    for s, ww, c in out:
        fit.extend([s / ww] * c)
    return np.array(fit)


def test_isotonic_equals_stack_pav(spark, sf_smoke):
    rows = sorted(
        REGISTRY["q_isotonic_calibration"].fn(spark, sf_smoke).collect(),
        key=lambda r: r["bin"],
    )
    assert rows
    y = np.array([r["frac_pos"] for r in rows])
    w = np.array([r["n"] for r in rows], dtype=float)
    fit = _pav(y, w)
    for r, f in zip(rows, fit):
        assert abs(r["iso_fit"] - f) < 1e-5
    # monotone, in [0, 1]
    iso = [r["iso_fit"] for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(iso, iso[1:]))
    assert all(-1e-9 <= v <= 1.0 + 1e-9 for v in iso)
    # PAV is the L2-optimal monotone fit of frac_pos, and mean_p is an
    # ESTIMATE of frac_pos — fitting can only reduce the weighted gap
    # to the isotonic projection; the ECE-improvement claim is against
    # the fit data
    assert rows[0]["ece_iso"] <= rows[0]["ece_raw"] + 1e-9
    # pooled blocks conserve mass: weighted mean of fit == weighted
    # mean of raw targets (PAV block property)
    assert abs(np.average(fit, weights=w) - np.average(y, weights=w)) < 1e-9


def test_anova_numpy_recompute_and_partition(spark, sf_smoke):
    d = run_duckdb(
        """
        SELECT event_type,
               CAST(ROUND(value * 1000, 0) AS BIGINT) / 1000.0 AS v
        FROM events
        """,
        sf_smoke,
    )
    (r,) = REGISTRY["q_anova_oneway"].fn(spark, sf_smoke).collect()
    groups = [g["v"].to_numpy() for _, g in d.groupby("event_type")]
    allv = d["v"].to_numpy()
    assert r["k"] == len(groups) and r["n"] == len(allv)
    sst = ((allv - allv.mean()) ** 2).sum()
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    ssb = sst - ssw
    f = (ssb / (len(groups) - 1)) / (ssw / (len(allv) - len(groups)))
    assert abs(r["ss_total"] - sst) < 1e-2
    assert abs(r["ss_within"] - ssw) < 1e-2
    assert abs(r["ss_between"] - ssb) < 1e-2
    assert abs(r["f_stat"] - f) < 1e-3
    assert abs(r["eta_sq"] - ssb / sst) < 1e-4
    # exact variance partition on the published (rounded) components
    assert abs(r["ss_between"] + r["ss_within"] - r["ss_total"]) < 2e-4
    assert 0.0 <= r["eta_sq"] <= 1.0


def test_krippendorff_coincidence_matrix_recompute(spark, sf_smoke):
    (r,) = REGISTRY["q_krippendorff_alpha"].fn(spark, sf_smoke).collect()
    # full canonical D_o/D_e machinery in numpy from the published
    # per-unit vote masses: n0*n1 per unit is verified by the hash; the
    # FORMULA is what this anchors
    n = r["n_values"]
    assert n == 3 * r["units"]
    assert r["neg_votes"] + r["pos_votes"] == n
    d_o = r["pair_disagreements"] / n
    d_e = 2.0 * r["neg_votes"] * r["pos_votes"] / (n * (n - 1))
    alpha = 1.0 - d_o / d_e
    assert abs(r["d_o"] - d_o) < 1e-5
    assert abs(r["d_e"] - d_e) < 1e-5
    assert abs(r["alpha"] - alpha) < 1e-5
    assert r["alpha"] <= 1.0 + 1e-9
    # alpha == 1 iff zero pairwise disagreement
    assert (r["pair_disagreements"] == 0) == (abs(r["alpha"] - 1.0) < 1e-9)
    # and the D_o/D_e construction from raw labels via an independent
    # coincidence-matrix accumulation (unit-by-unit, both orderings)
    lab = run_duckdb(
        """
        WITH med AS (
          SELECT quantile_cont(n_chars, 0.5) AS mc,
                 quantile_cont(len(list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   x -> x != '')), 0.5) AS mw
          FROM documents
        )
        SELECT COALESCE(d.n_chars > med.mc, FALSE)::INT AS r1,
               COALESCE(LENGTH(TRIM(d.text)) > 0 AND
                CAST(LENGTH(list_distinct(list_filter(
                    string_split_regex(lower(d.text), '[^a-z0-9]+'),
                    x -> x != ''))) AS DOUBLE)
                / GREATEST(LENGTH(list_filter(
                    string_split_regex(lower(d.text), '[^a-z0-9]+'),
                    x -> x != '')), 1) > 0.5, FALSE)::INT AS r2,
               COALESCE(LENGTH(list_filter(
                 string_split_regex(lower(d.text), '[^a-z0-9]+'),
                 x -> x != '')) > med.mw, FALSE)::INT AS r3
        FROM documents d, med
        """,
        sf_smoke,
    )
    m = 3
    o = np.zeros((2, 2))
    for row in lab.itertuples(index=False):
        votes = [row.r1, row.r2, row.r3]
        for a in range(m):
            for b in range(m):
                if a != b:
                    o[votes[a], votes[b]] += 1.0 / (m - 1)
    n_c = o.sum(axis=1)
    nn = n_c.sum()
    d_o2 = (o[0, 1] + o[1, 0]) / nn
    d_e2 = 2.0 * n_c[0] * n_c[1] / (nn * (nn - 1))
    assert abs((1.0 - d_o2 / d_e2) - r["alpha"]) < 1e-5


def test_rouge_cross_pins_bleu_hits(spark, sf_smoke):
    (r,) = REGISTRY["q_rouge_pairs"].fn(spark, sf_smoke).collect()
    (b,) = REGISTRY["q_bleu_pairs"].fn(spark, sf_smoke).collect()
    # min(c, r) is symmetric: the clipped hit integers must equal BLEU's
    assert r["r1_hits"] == b["p1_hits"]
    assert r["r2_hits"] == b["p2_hits"]
    assert r["r1_cand_total"] == b["p1_total"]
    assert r["r2_cand_total"] == b["p2_total"]
    # F1 closed form == harmonic mean of the published precision/recall
    for h, rt, ct, rec, f1 in (
        (r["r1_hits"], r["r1_ref_total"], r["r1_cand_total"],
         r["rouge1_recall"], r["rouge1_f1"]),
        (r["r2_hits"], r["r2_ref_total"], r["r2_cand_total"],
         r["rouge2_recall"], r["rouge2_f1"]),
    ):
        p, rr = h / ct, h / rt
        assert abs(rec - rr) < 1e-5
        assert abs(f1 - 2 * p * rr / (p + rr)) < 1e-5
        assert 0.0 <= f1 <= 1.0 and h <= min(rt, ct)
