"""Oracle-independence anchors (VERDICT r9, next-round #2 — the Shapley
bug class): for every query whose DuckDB oracle REPLAYS the engine's own
derivation (unrolled recursions, shared closed forms), a green value hash
proves engine-parity, not mathematical truth — r8's Shapley shipped wrong
coefficients in BOTH engines and passed. Each test here anchors one such
family to an INDEPENDENT derivation:

- a different algebraic formulation of the same recursion (Holt /
  Holt-Winters error-correction form vs the smoothing form both engines
  run),
- an exact solve vs the fixed-point iteration (Markov absorption via
  numpy linear algebra),
- a defining equation rather than its closed-form solution (Wilson score
  interval quadratic),
- an optimality/score condition (IRLS gradient ~ 0 at the returned
  coefficients; log-loss re-evaluated independently),
- a reference library (numpy LAPACK eigvalsh for the covariance
  spectrum),
- a probability axiom (Kneser-Ney per-context normalization; Good-Turing
  mass identities),
- an alternative closed form of the same statistic (2x2 kappa via the
  determinant form),
- independent re-aggregation of the published components (BLEU, MASE,
  calibration ECE, Theil-Sen medians, conformal order statistics,
  Kaplan-Meier cumprod, EB convexity).

The classification of all registered oracles (independent vs
parity-only, and which anchor covers each parity-only family) lives in
ORACLE_AUDIT.md. Raw inputs are loaded through DuckDB (run_duckdb) —
the data PLUMBING is already value-hash-proven by the t2 gate; what
these tests anchor is the MATH downstream of it.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from dumpty_spark.queries import REGISTRY
from tests.oracle import run_duckdb


def _rows(spark, sf_smoke, name):
    return REGISTRY[name].fn(spark, sf_smoke).collect()


# ---------------------------------------------------------------------------
# Holt linear trend — error-correction form (equivalent algebra,
# independently coded): e = y - (l+b); l' = l+b+alpha*e; b' = b+alpha*gamma*e
# ---------------------------------------------------------------------------


def test_holt_trend_error_correction_form(spark, sf_smoke):
    daily = run_duckdb(
        """
        SELECT event_type, date_trunc('day', ts) AS day,
               ROUND(AVG(value), 6) AS y
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        sf_smoke,
    )
    out = {r["event_type"]: r for r in _rows(spark, sf_smoke, "q_holt_trend")}
    assert out
    for et, grp in daily.groupby("event_type"):
        y = grp["y"].to_numpy()
        lvl, b = float(y[0]), float(y[1] - y[0])
        sse = 0.0
        for t in range(1, len(y)):
            e = y[t] - (lvl + b)
            sse += e * e
            lvl = lvl + b + 0.3 * e
            b = b + 0.3 * 0.1 * e
        r = out[et]
        assert r["n_days"] == len(y)
        assert abs(r["level"] - lvl) < 1e-3
        assert abs(r["trend"] - b) < 1e-3
        assert abs(r["forecast_7d"] - (lvl + 7 * b)) < 1e-2
        assert abs(r["rmse"] - math.sqrt(sse / (len(y) - 1))) < 1e-3


# ---------------------------------------------------------------------------
# Holt-Winters additive — error-correction form: e = x-(l+b+s0);
# l' = l+b+a*e; b' = b+a*beta*e; s' = s0+g*(1-a)*e
# ---------------------------------------------------------------------------


def test_holt_winters_error_correction_form(spark, sf_smoke):
    series = run_duckdb(
        """
        WITH bounds AS (SELECT MIN(CAST(ts AS DATE)) AS mn,
                               MAX(CAST(ts AS DATE)) AS mx FROM events),
        days AS (SELECT CAST(UNNEST(generate_series(mn::TIMESTAMP,
                 mx::TIMESTAMP, INTERVAL 1 DAY)) AS DATE) AS d FROM bounds),
        types AS (SELECT DISTINCT event_type FROM events),
        grid AS (SELECT t.event_type, d.d FROM types t CROSS JOIN days d),
        counts AS (SELECT event_type, CAST(ts AS DATE) AS d,
                          COUNT(*)::BIGINT AS n FROM events GROUP BY 1, 2)
        SELECT g.event_type, g.d, CAST(COALESCE(c.n, 0) AS DOUBLE) AS n
        FROM grid g LEFT JOIN counts c
          ON c.event_type = g.event_type AND c.d = g.d
        ORDER BY 1, 2
        """,
        sf_smoke,
    )
    out = {}
    for r in _rows(spark, sf_smoke, "q_holt_winters"):
        out.setdefault(r["event_type"], {})[r["h"]] = r
    a, be, g = 0.3, 0.05, 0.2
    for et, grp in series.groupby("event_type"):
        x = grp["n"].to_numpy()
        if len(x) < 15:
            assert et not in out
            continue
        w1 = x[:7].mean()
        lvl = w1
        tr = (x[7:14].mean() - w1) / 7.0
        seas = list(x[:7] - w1)
        sae = 0
        for t in range(7, len(x)):
            e = x[t] - (lvl + tr + seas[0])
            sae += int(round(1e6 * abs(e)))
            lvl_n = lvl + tr + a * e
            tr = tr + a * be * e
            seas = seas[1:] + [seas[0] + g * (1 - a) * e]
            lvl = lvl_n
        for h in range(1, 8):
            r = out[et][h]
            assert abs(r["forecast"] - (lvl + h * tr + seas[h - 1])) < 1e-2
            assert r["n_fit"] == len(x) - 7
            # micro-integerized error mass: per-term rounding of the two
            # formulations can differ by <=1 micro each
            assert abs(r["sae_micro"] - sae) <= len(x)


# ---------------------------------------------------------------------------
# IRLS logistic regression — optimality anchor: the score equations
# X'(y-p) ~ 0 hold at the returned coefficients, and the published
# log-loss re-evaluates identically in numpy.
# ---------------------------------------------------------------------------


def test_logistic_irls_score_equations(spark, sf_smoke):
    d = run_duckdb(
        """
        WITH pts AS (SELECT CASE WHEN event_type = 'purchase' THEN 1.0
                     ELSE 0.0 END AS y, value FROM events),
        st AS (SELECT AVG(value) AS mu, STDDEV_POP(value) AS sd FROM pts)
        SELECT y, ROUND((value - st.mu) / st.sd, 6) AS x FROM pts, st
        """,
        sf_smoke,
    )
    (r,) = _rows(spark, sf_smoke, "q_logistic_irls")
    y, x = d["y"].to_numpy(), d["x"].to_numpy()
    assert r["n_rows"] == len(y)
    p = 1.0 / (1.0 + np.exp(-(r["coef_a"] + r["coef_b"] * x)))
    n = len(y)
    # Newton from (0,0): 4 steps of a quadratically-convergent solve —
    # the normalized score must be numerically dead
    assert abs(np.sum(y - p)) / n < 1e-6
    assert abs(np.sum((y - p) * x)) / n < 1e-6
    loss = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
    assert abs(r["log_loss"] - loss) < 1e-5
    # fitted loss beats the null model (coefs 0 -> loss ln 2)
    assert loss < math.log(2.0)


# ---------------------------------------------------------------------------
# Markov removal-effect attribution — exact absorption solve: numpy
# (I - Q) a = r vs the engines' 24 fixed-point rounds.
# ---------------------------------------------------------------------------


def test_markov_attribution_exact_solve(spark, sf_smoke):
    from dumpty_spark.queries.frontier10 import _MK_TRANS_SQL

    pr = run_duckdb(
        "WITH " + _MK_TRANS_SQL.strip() + "\nSELECT src, dst, p FROM pr",
        sf_smoke,
    )
    trans = {(r.src, r.dst): r.p for r in pr.itertuples(index=False)}

    def absorb_exact(removed):
        states = sorted(
            {s for s, _ in trans} - ({removed} if removed else set())
        )
        idx = {s: i for i, s in enumerate(states)}
        k = len(states)
        q = np.zeros((k, k))
        r = np.zeros(k)
        for (s, t), p in trans.items():
            if s not in idx:
                continue
            if t == "CONV":
                r[idx[s]] += p
            elif t == "NULL" or t == removed:
                pass
            elif t in idx:
                q[idx[s], idx[t]] += p
        a = np.linalg.solve(np.eye(k) - q, r)
        return a[idx["START"]]

    base = absorb_exact(None)
    out = {r["channel"]: r for r in _rows(spark, sf_smoke, "q_markov_attribution")}
    assert out
    # the engines run 96 fixed-point rounds of a contraction (raised
    # from 24 in r10: the 24-round iterate was ~3.5e-3 short of the
    # fixed point and the round-replaying oracle hash-matched the
    # unconverged value); the exact linear solve is the truth anchor
    shares = []
    for ch, r in out.items():
        assert abs(r["base_conversion"] - base) < 1e-5
        re_exact = 1.0 - absorb_exact(ch) / base
        assert abs(r["removal_effect"] - re_exact) < 1e-5
        assert -1e-9 <= r["removal_effect"] <= 1.0
        shares.append(r["attribution_share"])
    assert abs(sum(shares) - 1.0) < 1e-4


# ---------------------------------------------------------------------------
# Covariance spectrum — LAPACK anchor: trace equals the eigvalsh sum and
# the power-iteration Rayleigh quotient is bracketed by the true
# spectrum (equal to lambda_max when the iteration has converged).
# ---------------------------------------------------------------------------


def test_covariance_spectrum_lapack_anchor(spark, sf_smoke):
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{sf_smoke}/embeddings.parquet").to_pandas()
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mu = np.round(x.mean(axis=0), 6)
    c = np.round(x.T @ x / len(x) - np.outer(mu, mu), 6)
    ev = np.linalg.eigvalsh(c)
    (r,) = _rows(spark, sf_smoke, "q_covariance_spectrum")
    assert abs(r["trace"] - np.trace(c)) < 1e-3
    assert abs(r["trace"] - ev.sum()) < 1e-3
    # Rayleigh quotient of ANY vector is inside the spectrum; after the
    # fixed rounds it must sit at (or just below) the top eigenvalue
    assert ev.min() - 1e-3 <= r["top_eigenvalue"] <= ev.max() + 1e-3
    assert abs(r["explained_share"] - r["top_eigenvalue"] / r["trace"]) < 2e-3


# ---------------------------------------------------------------------------
# Kaplan-Meier — cumprod formulation (engines use exp(cumsum(ln)))
# ---------------------------------------------------------------------------


def test_kaplan_meier_cumprod_form(spark, sf_smoke):
    life = run_duckdb(
        """
        WITH bounds AS (SELECT MAX(ts) AS t_end FROM events),
        p AS (SELECT user_id, ts, LEAD(ts) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS nxt
              FROM events WHERE event_type = 'purchase')
        SELECT date_diff('day', ts, COALESCE(nxt, (SELECT t_end FROM bounds)))
                 AS dur,
               (nxt IS NULL) AS censored
        FROM p
        """,
        sf_smoke,
    )
    durs = life["dur"].to_numpy()
    dead = (~life["censored"]).to_numpy()
    out = _rows(spark, sf_smoke, "q_kaplan_meier")
    assert out
    s = 1.0
    km = {}
    for t in sorted(set(durs.tolist())):
        at_risk = int((durs >= t).sum())
        d = int(dead[durs == t].sum())
        if at_risk > 0:
            s *= 1.0 - d / at_risk
        if d > 0:
            km[t] = (at_risk, d, s)
    prev = 1.0
    for r in out:
        n, d, surv = km[r["duration_days"]]
        assert r["n_at_risk"] == n and r["n_events"] == d
        assert abs(r["survival"] - surv) < 1e-3
        # product-limit curves are non-increasing in [0, 1]
        assert 0.0 <= r["survival"] <= prev + 1e-9
        prev = r["survival"]


# ---------------------------------------------------------------------------
# Seasonal-naive MASE — independent pandas recomputation of the
# textbook definition (test MAE over in-sample seasonal-naive MAE)
# ---------------------------------------------------------------------------


def test_mase_pandas_recompute(spark, sf_smoke):
    daily = run_duckdb(
        """
        WITH bounds AS (SELECT MIN(CAST(ts AS DATE)) AS mn,
                               MAX(CAST(ts AS DATE)) AS mx FROM events),
        days AS (SELECT CAST(UNNEST(generate_series(mn::TIMESTAMP,
                 mx::TIMESTAMP, INTERVAL 1 DAY)) AS DATE) AS d FROM bounds),
        types AS (SELECT DISTINCT event_type FROM events),
        grid AS (SELECT t.event_type, d.d FROM types t CROSS JOIN days d),
        counts AS (SELECT event_type, CAST(ts AS DATE) AS d,
                          COUNT(*)::BIGINT AS n FROM events GROUP BY 1, 2)
        SELECT g.event_type, g.d, COALESCE(c.n, 0)::BIGINT AS n
        FROM grid g LEFT JOIN counts c
          ON c.event_type = g.event_type AND c.d = g.d
        ORDER BY 1, 2
        """,
        sf_smoke,
    )
    out = {
        r["event_type"]: r
        for r in _rows(spark, sf_smoke, "q_seasonal_naive_mase")
    }
    for et, grp in daily.groupby("event_type"):
        x = grp["n"].to_numpy().astype(float)
        t_max = len(x) - 1
        ae = np.abs(x[7:] - x[:-7])  # |y_t - y_{t-7}| for t >= 7
        offs = np.arange(7, len(x))
        test = ae[offs > t_max - 7]
        train = ae[offs <= t_max - 7]
        r = out[et]
        assert r["n_test"] == len(test)
        assert r["test_abs_err"] == int(test.sum())
        assert r["train_abs_err"] == int(train.sum())
        mase = (test.sum() / len(test)) / (train.sum() / len(train))
        assert abs(r["mase"] - mase) < 1e-3


# ---------------------------------------------------------------------------
# Cohen's kappa — alternative closed form for the 2x2 table:
# kappa = 2(ad - bc) / ((a+b)(b+d) + (a+c)(c+d))
# ---------------------------------------------------------------------------


def test_cohens_kappa_determinant_form(spark, sf_smoke):
    (r,) = _rows(spark, sf_smoke, "q_cohens_kappa")
    a, b, c, d, n = r["a"], r["b"], r["c"], r["d"], r["n"]
    assert a + b + c + d == n
    kappa_det = 2.0 * (a * d - b * c) / ((a + b) * (b + d) + (a + c) * (c + d))
    assert abs(r["kappa"] - kappa_det) < 1e-5
    assert -1.0 - 1e-9 <= r["kappa"] <= 1.0 + 1e-9
    assert abs(r["p_observed"] - (a + d) / n) < 1e-5
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / n / n
    assert abs(r["p_expected"] - pe) < 1e-5
    # kappa = 1 iff perfect agreement (b = c = 0)
    if b == 0 and c == 0:
        assert abs(r["kappa"] - 1.0) < 1e-6
    else:
        assert r["kappa"] < 1.0


# ---------------------------------------------------------------------------
# EB shrinkage — convexity axiom + the normal-normal identity
# shrunk = B * prior + (1 - B) * raw with the prior mean recomputed
# independently.
# ---------------------------------------------------------------------------


def test_eb_shrinkage_convexity(spark, sf_smoke):
    m = run_duckdb(
        """
        SELECT AVG(len(list_filter(
                 string_split_regex(lower(text), '[^a-z0-9]+'),
                 x -> x != ''))::DOUBLE) AS m
        FROM documents
        """,
        sf_smoke,
    )["m"].iloc[0]
    rows = _rows(spark, sf_smoke, "q_eb_shrinkage")
    assert rows
    for r in rows:
        assert -1e-9 <= r["b_weight"] <= 1.0 + 1e-9
        blend = r["b_weight"] * m + (1.0 - r["b_weight"]) * r["raw_mean"]
        assert abs(r["shrunk_mean"] - blend) < 1e-3
        lo, hi = sorted((r["raw_mean"], m))
        assert lo - 1e-6 <= r["shrunk_mean"] <= hi + 1e-6


# ---------------------------------------------------------------------------
# Wilson lower bound — the DEFINING quadratic of the score interval:
# (phat - p)^2 = z^2 p(1-p)/n at the endpoint, independent of the
# closed-form transcription both engines share.
# ---------------------------------------------------------------------------


def test_wilson_defining_quadratic(spark, sf_smoke):
    z = 1.96
    rows = _rows(spark, sf_smoke, "q_wilson_ranking")
    assert rows
    for r in rows:
        n, ok, lb = r["n"], r["ok"], r["wilson_lb"]
        phat = ok / n
        assert 0.0 <= lb <= phat + 1e-6  # lower bound never exceeds phat
        resid = (phat - lb) ** 2 - z * z * lb * (1.0 - lb) / n
        assert abs(resid) < 1e-5
        # and the independent closed-form recompute (numpy, not SQL)
        z2 = z * z
        lb_np = (
            phat + z2 / (2 * n) - z * math.sqrt(phat * (1 - phat) / n + z2 / (4 * n * n))
        ) / (1 + z2 / n)
        assert abs(lb - lb_np) < 1e-5


# ---------------------------------------------------------------------------
# Split-conformal — the order-statistic anchor: qhat equals the
# ceil(0.9(n+1))-th smallest calibration residual via numpy sorting,
# and the finite-sample rank property holds on the calibration set.
# ---------------------------------------------------------------------------


def test_conformal_qhat_order_statistic(spark, sf_smoke):
    cal = run_duckdb(
        """
        WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS mn FROM events),
        ev AS (SELECT event_id, event_type, ROUND(value, 4) AS v,
                      DATEDIFF('day', b.mn, CAST(ts AS DATE)) AS off
               FROM events, b),
        mean6 AS (SELECT event_type, ROUND(SUM(v) / COUNT(*), 6) AS mu
                  FROM ev WHERE off <= 19 GROUP BY event_type)
        SELECT e.event_type, ROUND(ABS(e.v - m.mu), 6) AS r
        FROM ev e JOIN mean6 m ON m.event_type = e.event_type
        WHERE e.off BETWEEN 20 AND 24
        """,
        sf_smoke,
    )
    out = {
        r["event_type"]: r for r in _rows(spark, sf_smoke, "q_conformal_interval")
    }
    for et, grp in cal.groupby("event_type"):
        res = np.sort(grp["r"].to_numpy())
        n_cal = len(res)
        r = out[et]
        assert r["n_cal"] == n_cal
        rank = min(math.ceil(0.9 * (n_cal + 1)), n_cal)
        assert abs(r["qhat"] - res[rank - 1]) < 1e-6
        # finite-sample property: qhat covers >= rank/n of calibration
        assert (res <= r["qhat"] + 1e-12).sum() >= rank
        assert 0.0 <= r["coverage"] <= 1.0


def test_conformal_intervals_axioms(spark, sf_smoke):
    for r in _rows(spark, sf_smoke, "q_conformal_intervals"):
        assert r["qhat"] >= 0.0
        assert 0.0 <= r["coverage"] <= 1.0
        assert r["n_cal"] > 0 and r["n_test"] > 0


# ---------------------------------------------------------------------------
# Theil-Sen — numpy median-of-slopes recomputation + tau identities
# ---------------------------------------------------------------------------


def _daily_totals(sf_smoke):
    return run_duckdb(
        """
        WITH bounds AS (SELECT MIN(CAST(ts AS DATE)) AS mn,
                               MAX(CAST(ts AS DATE)) AS mx FROM events),
        days AS (SELECT CAST(UNNEST(generate_series(mn::TIMESTAMP,
                 mx::TIMESTAMP, INTERVAL 1 DAY)) AS DATE) AS d FROM bounds),
        counts AS (SELECT CAST(ts AS DATE) AS d, COUNT(*)::BIGINT AS n
                   FROM events GROUP BY 1)
        SELECT DATEDIFF('day', (SELECT mn FROM bounds), days.d) AS off,
               COALESCE(c.n, 0)::BIGINT AS n
        FROM days LEFT JOIN counts c ON c.d = days.d
        ORDER BY off
        """,
        sf_smoke,
    )


def test_theilsen_trend_median_of_slopes(spark, sf_smoke):
    ser = _daily_totals(sf_smoke)
    off = ser["off"].to_numpy()
    n = ser["n"].to_numpy().astype(float)
    i, j = np.triu_indices(len(n), k=1)
    sm = np.round(1e6 * (n[j] - n[i]) / (off[j] - off[i])).astype(np.int64)
    (r,) = _rows(spark, sf_smoke, "q_theilsen_trend")
    assert r["n_pairs"] == len(sm)
    assert r["n_up"] == int((sm > 0).sum())
    assert r["n_down"] == int((sm < 0).sum())
    assert r["n_flat"] == int((sm == 0).sum())
    assert r["n_up"] + r["n_down"] + r["n_flat"] == r["n_pairs"]
    tau = (r["n_up"] - r["n_down"]) / r["n_pairs"]
    assert abs(r["kendall_tau"] - tau) < 1e-3
    med = int(np.sort(sm)[(len(sm) + 1) // 2 - 1])
    assert r["median_slope_micro"] == med
    assert abs(r["slope_per_day"] - med / 1e6) < 1e-6


# ---------------------------------------------------------------------------
# Good-Turing — mass identities from the published count-of-count
# columns: unseen mass = N1/N, r* = (r+1) N_{r+1} / N_r
# ---------------------------------------------------------------------------


def test_good_turing_identities(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "q_good_turing")
    assert rows
    for r in rows:
        assert abs(r["unseen_mass"] - r["n1"] / r["n_tokens"]) < 1e-5
        assert 0.0 <= r["unseen_mass"] <= 1.0
        for k, nk, nk1 in (
            ("rstar_1", r["n1"], r["n2"]),
            ("rstar_2", r["n2"], r["n3"]),
            ("rstar_3", r["n3"], r["n4"]),
        ):
            rr = int(k[-1])
            if nk == 0:
                assert r[k] is None
            else:
                assert abs(r[k] - (rr + 1) * nk1 / nk) < 1e-5
        # vocab >= n1 + n2 + n3 (counted types at r <= 3 are a subset)
        assert r["vocab"] >= r["n1"] + r["n2"] + r["n3"]


# ---------------------------------------------------------------------------
# BLEU-2 — independent recomputation from the published integer totals
# via the sqrt form (not the exp(mean log) form both engines use)
# ---------------------------------------------------------------------------


def test_bleu2_sqrt_form(spark, sf_smoke):
    (r,) = _rows(spark, sf_smoke, "q_bleu_pairs")
    assert 0 <= r["p1_hits"] <= r["p1_total"]
    assert 0 <= r["p2_hits"] <= r["p2_total"]
    p1 = r["p1_hits"] / r["p1_total"]
    p2 = r["p2_hits"] / r["p2_total"]
    bp = math.exp(1.0 - r["r_len"] / r["c_len"]) if r["c_len"] < r["r_len"] else 1.0
    assert abs(r["bleu2"] - bp * math.sqrt(p1 * p2)) < 1e-3
    assert 0.0 <= r["bleu2"] <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# Bigram perplexity — published-component identities + bounds
# ---------------------------------------------------------------------------


def test_bigram_perplexity_identities(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "q_bigram_perplexity")
    assert rows
    for r in rows:
        avg = r["sum_lp_micro"] / (1e6 * r["n_bigrams"])
        assert abs(r["avg_logprob"] - avg) < 1e-3
        assert abs(r["perplexity"] - math.exp(-avg)) < 1e-2
        # add-one probabilities are < 1 -> log-probs negative, ppl > 1
        assert r["sum_lp_micro"] < 0
        assert r["perplexity"] > 1.0


# ---------------------------------------------------------------------------
# Kneser-Ney — probability axiom: the interpolated model is a proper
# distribution (sums to 1 over the vocabulary for every context), and
# the per-language mean log2 P re-derives in numpy from global counts.
# ---------------------------------------------------------------------------


def test_kneser_ney_normalization_and_recompute(spark, sf_smoke):
    import pandas as pd

    cl = run_duckdb(
        """
        WITH w AS (SELECT lang, list_filter(
                     string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x != '') AS t
                   FROM documents WHERE len(list_filter(
                     string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x != '')) >= 2),
        bg AS (SELECT lang, z[1] AS w1, z[2] AS w2
               FROM (SELECT lang, UNNEST(list_zip(t[1:len(t)-1],
                     t[2:len(t)])) AS z FROM w))
        SELECT lang, w1, w2, COUNT(*)::BIGINT AS n_lw
        FROM bg GROUP BY 1, 2, 3
        """,
        sf_smoke,
    )
    d = 0.75
    cg = cl.groupby(["w1", "w2"], as_index=False)["n_lw"].sum()
    cg = cg.rename(columns={"n_lw": "n"})
    c1 = cg.groupby("w1").agg(c_w1=("n", "sum"), n1p_fwd=("n", "size"))
    cont = cg.groupby("w2").size().rename("n1p_bwd")
    b = float(len(cg))
    # --- axiom: for every context, the interpolated KN distribution over
    # the full continuation vocabulary sums to exactly 1
    for w1 in c1.sample(n=min(25, len(c1)), random_state=7).index:
        cw, nf = c1.loc[w1, "c_w1"], c1.loc[w1, "n1p_fwd"]
        lam = d * nf / cw
        seen = cg[cg["w1"] == w1]
        mass_seen = ((seen["n"] - d) / cw).sum()
        mass_seen += lam * (cont.loc[seen["w2"]].to_numpy().sum() / b)
        unseen_w2 = cont.drop(index=seen["w2"])
        mass_unseen = lam * (unseen_w2.to_numpy().sum() / b)
        assert abs(mass_seen + mass_unseen - 1.0) < 1e-9
    # --- independent recompute of the per-language token-weighted mean
    merged = cg.merge(c1, on="w1").merge(cont, on="w2")
    merged["p"] = (merged["n"] - d) / merged["c_w1"] + d * merged[
        "n1p_fwd"
    ] / merged["c_w1"] * (merged["n1p_bwd"] / b)
    merged["lp"] = np.log2(merged["p"])
    scored = cl.merge(merged[["w1", "w2", "lp"]], on=["w1", "w2"])
    per_lang = scored.groupby("lang").apply(
        lambda g: pd.Series(
            {
                "n_bigrams": g["n_lw"].sum(),
                "m": (g["n_lw"] * g["lp"]).sum() / g["n_lw"].sum(),
            }
        ),
        include_groups=False,
    )
    out = {r["lang"]: r for r in _rows(spark, sf_smoke, "q_kneser_ney")}
    for lang, row in per_lang.iterrows():
        r = out[lang]
        assert r["n_bigrams"] == int(row["n_bigrams"])
        assert abs(r["avg_log2p"] - row["m"]) < 1e-3
        assert abs(r["perplexity"] - 2.0 ** (-row["m"])) < 1e-2


# ---------------------------------------------------------------------------
# Calibration report — independent re-aggregation: ECE equals the
# n-weighted mean of per-bin gaps from the published per-bin columns.
# ---------------------------------------------------------------------------


def test_calibration_ece_reaggregation(spark, sf_smoke):
    rows = _rows(spark, sf_smoke, "q_calibration_bins")
    assert rows
    eces = {r["ece"] for r in rows}
    briers = {r["brier"] for r in rows}
    assert len(eces) == 1 and len(briers) == 1  # global stats repeat per bin
    w = sum(r["n"] for r in rows)
    ece = sum(r["n"] * abs(r["mean_p"] - r["frac_pos"]) for r in rows) / w
    assert abs(next(iter(eces)) - ece) < 1e-3
    for r in rows:
        assert abs(r["abs_gap"] - abs(r["mean_p"] - r["frac_pos"])) < 1e-3
        assert 0.0 <= r["mean_p"] <= 1.0 and 0.0 <= r["frac_pos"] <= 1.0
    assert 0.0 <= next(iter(briers)) <= 1.0
