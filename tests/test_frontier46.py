"""Independent anchors for q_betweenness_approx (E240) — the born-with
anchor mandated by ORACLE_AUDIT.md's maintenance rule.  The registered
oracle replays the bounded level rounds (Category B), so mathematical
truth is pinned here by a GENUINELY different algorithm: textbook
stack-based Brandes (per-source queue BFS building predecessor lists,
reverse-pop dependency accumulation, full float precision, no level
vectorization, no 9dp grid), plus the closed-form path-graph fixture
and a forced-distributed regime-equality check."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dumpty_spark.operators.betweenness import sampled_betweenness
from dumpty_spark.queries import REGISTRY
from dumpty_spark.queries.frontier46 import _BTW_H, _BTW_K


def _exact_bounded_brandes(edge_pairs, sources, max_depth):
    """Textbook Brandes (Algorithm 1 of the 2001 paper), depth-bounded:
    queue BFS with predecessor lists, then pop the visit stack in
    reverse. Independently coded — no shared structure with the
    engine's level-synchronous implementation."""
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for u, v in edge_pairs:
        adj[u].append(v)
    bc = defaultdict(float)
    reach_count = defaultdict(int)
    for s in sources:
        stack = []
        pred = defaultdict(list)
        sigma = defaultdict(int)
        dist = {s: 0}
        sigma[s] = 1
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            if dist[v] == max_depth:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    pred[w].append(v)
        delta = defaultdict(float)
        while stack:
            w = stack.pop()
            for v in pred[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
                reach_count[w] += 1
    return bc, reach_count


def _copurchase_edges(spark, sf_dir):
    from dumpty_spark.queries.shared_graph import copurchase_symmetric

    return [
        (int(r["u"]), int(r["v"]))
        for r in copurchase_symmetric(spark, sf_dir).collect()
    ]


def test_betweenness_exact_brandes_anchor(spark, sf_smoke):
    """The registered query's top-30 must match textbook Brandes run on
    the same graph / sources / depth — values to 1e-3 (the engine's 9dp
    per-level grid vs the anchor's full precision), reach counts
    exactly."""
    rows = REGISTRY["q_betweenness_approx"].fn(spark, sf_smoke).collect()
    assert 0 < len(rows) <= 30
    edges = _copurchase_edges(spark, sf_smoke)
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    sources = [
        u for u, _ in sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:_BTW_K]
    bc, reach = _exact_bounded_brandes(edges, sources, _BTW_H)
    for r in rows:
        assert r["n_sources"] == reach[r["part"]]
        assert r["betweenness"] == pytest.approx(bc[r["part"]], abs=1e-3)
    # the reported top set agrees with the anchor's ranking (slack of a
    # few ranks absorbs 9dp-grid-vs-full-precision boundary ties)
    top_anchor = [
        p for p, _ in sorted(
            bc.items(), key=lambda kv: (-round(kv[1], 4), kv[0])
        )[: len(rows) + 5]
    ]
    for r in rows:
        assert r["part"] in top_anchor
    # and the engine's own output is ordered by its own values
    vals = [r["betweenness"] for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_betweenness_path_graph_closed_form(spark):
    """Path 0-1-2-3-4, all nodes as sources, H=4 covers every pair:
    bc(i) = 2*i*(n-1-i) exactly (ordered-pair convention) — 6, 8, 6 for
    the interior nodes, 0 at the ends."""
    pairs = [(i, i + 1) for i in range(4)]
    sym = pairs + [(b, a) for a, b in pairs]
    e = spark.createDataFrame(sym, ["u", "v"])
    dep = sampled_betweenness(e, sources=[0, 1, 2, 3, 4], max_depth=4)
    got = {
        r["node"]: r["bc"]
        for r in dep.groupBy("node")
        .agg(F.sum("delta").alias("bc"))
        .collect()
    }
    expect = {i: float(2 * i * (5 - 1 - i)) for i in range(5)}
    for node, b in expect.items():
        assert got.get(node, 0.0) == pytest.approx(b, abs=1e-9)


def test_betweenness_regimes_agree(spark, monkeypatch):
    """Driver numpy regime ≡ distributed loop on the same fixture —
    identical (src, node, dist) sets and deltas on the shared 9dp
    grid. Fixture: two triangles joined by a bridge, where the bridge
    endpoints broker everything."""
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)]
    sym = pairs + [(b, a) for a, b in pairs]
    e = spark.createDataFrame(sym, ["u", "v"])
    sources = [0, 2, 3, 5]

    drv = sampled_betweenness(e, sources, max_depth=4)
    drows = sorted(
        (r["src"], r["node"], r["dist"], r["delta"]) for r in drv.collect()
    )
    dist = sampled_betweenness(
        e, sources, max_depth=4, driver_max_edges=0
    )
    xrows = sorted(
        (r["src"], r["node"], r["dist"], r["delta"]) for r in dist.collect()
    )
    assert len(drows) == len(xrows) > 0
    for a, b in zip(drows, xrows):
        assert a[:3] == b[:3]
        assert a[3] == pytest.approx(b[3], abs=1e-9)
    # brokerage sanity: the bridge endpoints (2, 3) dominate
    bc = {}
    for _, node, _, d in drows:
        bc[node] = bc.get(node, 0.0) + d
    assert bc[2] > max(bc.get(0, 0), bc.get(1, 0))
    assert bc[3] > max(bc.get(4, 0), bc.get(5, 0))


def test_betweenness_empty_sources_raises(spark):
    e = spark.createDataFrame([(0, 1)], ["u", "v"])
    with pytest.raises(ValueError):
        sampled_betweenness(e, sources=[], max_depth=2)


# ---------------------------------------------------------------------------
# E241 q_quantile_regression — born anchor: the oracle replays the
# smoothed-Newton trajectory, so truth is pinned by an INDEPENDENT
# algorithm on the TRUE (unsmoothed) pinball objective: profile the
# loss over slope b (convex), with the optimal intercept for each b
# computed exactly as the p-quantile order statistic of (y - b*x), and
# ternary-search the profile. The engine's achieved loss must land
# within 0.05% of that optimum (and cannot materially beat it), and
# the below-line count must satisfy the quantile coverage identity.
# ---------------------------------------------------------------------------


def _qr_data(sf_dir):
    import duckdb

    con = duckdb.connect()
    df = con.execute(f"""
        SELECT date_diff('day',
                 (SELECT MIN(ts::DATE)
                  FROM read_parquet('{sf_dir}/events.parquet')),
                 ts::DATE) AS x,
               ROUND(value * 1000)::BIGINT AS ym
        FROM read_parquet('{sf_dir}/events.parquet')""").df()
    x = df["x"].to_numpy().astype(float)
    y = df["ym"].to_numpy().astype(float) / 1000.0
    return x, y


def _pinball(p, x, y, a, b):
    r = y - a - b * x
    return float(np.mean(np.where(r >= 0, p * r, (p - 1) * r)))


def _profile_optimum(p, x, y):
    """Exact-structure reference: for fixed b the optimal intercept is
    the p-quantile of residuals (order statistic, no iteration); the
    profile in b is convex -> ternary search."""
    def g(b):
        a = float(np.quantile(y - b * x, p))
        return _pinball(p, x, y, a, b)

    lo, hi = -50.0, 50.0
    for _ in range(300):
        m1, m2 = lo + (hi - lo) / 3, hi - (hi - lo) / 3
        if g(m1) < g(m2):
            hi = m2
        else:
            lo = m1
    b = (lo + hi) / 2
    return g(b)


def test_quantile_regression_profile_anchor(spark, sf_smoke):
    rows = {
        r["quantile"]: r
        for r in REGISTRY["q_quantile_regression"].fn(spark, sf_smoke)
        .collect()
    }
    assert set(rows) == {0.5, 0.9}
    x, y = _qr_data(sf_smoke)
    n = len(x)
    for p, r in rows.items():
        ref = _profile_optimum(p, x, y)
        # engine's published loss is recomputable from its coefficients
        own = _pinball(p, x, y, r["coef_intercept"], r["coef_slope"])
        assert r["pinball_loss"] == pytest.approx(own, abs=1e-5)
        # near-optimal on the TRUE pinball objective ...
        assert r["pinball_loss"] <= ref * 1.0005
        # ... and cannot materially beat the exact optimum
        assert r["pinball_loss"] >= ref - 1e-6
        # quantile coverage: below-line fraction ~ p (exact optimum puts
        # floor(n*p) strictly below; smoothing shifts a few points)
        assert abs(r["n_below"] / n - p) < 0.02
        assert r["n"] == n


def test_quantile_regression_beats_intercept_only(spark, sf_smoke):
    """The fitted line's pinball loss must not exceed the best
    intercept-only model (the unconditional p-quantile) — regression
    can only help, and the unconditional quantile is computed by a
    different mechanism entirely (order statistic)."""
    rows = {
        r["quantile"]: r
        for r in REGISTRY["q_quantile_regression"].fn(spark, sf_smoke)
        .collect()
    }
    x, y = _qr_data(sf_smoke)
    for p, r in rows.items():
        a_only = float(np.quantile(y, p))
        assert r["pinball_loss"] <= _pinball(p, x, y, a_only, 0.0) + 1e-9


# ---------------------------------------------------------------------------
# E242/E243/E244 anchors — McNemar / Cochran's Q / Durbin-Watson.
# Labels and series are recomputed INDEPENDENTLY in pandas (regex word
# split, python medians) — no Spark, no SQL shared with either engine.
# ---------------------------------------------------------------------------


def _pandas_labels(sf_dir):
    import re

    import pandas as pd

    df = pd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["n_chars", "text"])

    def words(t):
        return [w for w in re.split(r"[^a-z0-9]+", str(t).lower()) if w]

    ws = df["text"].map(words)
    mc = df["n_chars"].quantile(0.5)
    mw = ws.map(len).quantile(0.5)
    r1 = (df["n_chars"] > mc).astype(int)
    r2 = ws.map(
        lambda w: len(set(w)) / max(len(w), 1) > 0.5
    ) & (df["text"].str.strip().str.len() > 0)
    r2 = r2.astype(int)
    r3 = (ws.map(len) > mw).astype(int)
    return r1.to_numpy(), r2.to_numpy(), r3.to_numpy()


def test_mcnemar_exact_binomial_anchor(spark, sf_smoke):
    """Under H0 the discordant counts are Binom(b+c, 1/2): the published
    normal-approx p must sit near the EXACT binomial two-sided tail
    (independent combinatorial computation), and chi2/chi2_cc must be
    the closed forms of the published integers."""
    from math import comb

    row = REGISTRY["q_mcnemar_test"].fn(spark, sf_smoke).first()
    r1, r2, _ = _pandas_labels(sf_smoke)
    b = int(((r1 == 1) & (r2 == 0)).sum())
    c = int(((r1 == 0) & (r2 == 1)).sum())
    assert (row["b"], row["c"]) == (b, c)
    m = b + c
    k = min(b, c)
    p_exact = min(
        1.0, 2.0 * sum(comb(m, i) for i in range(k + 1)) / 2.0**m
    )
    assert abs(row["p_value"] - p_exact) < 0.05
    assert row["chi2"] == pytest.approx((b - c) ** 2 / m, abs=1e-3)
    assert row["chi2_cc"] == pytest.approx(
        (abs(b - c) - 1) ** 2 / m, abs=1e-3
    )
    # the continuity-corrected statistic IS the z the p came from
    assert row["chi2_cc"] >= 0 and 0 <= row["p_value"] <= 1


def test_cochrans_q_numpy_and_k2_reduction(spark, sf_smoke):
    """Q recomputed from independently derived pandas labels, and the
    defining identity: at k=2 Cochran's Q equals McNemar's uncorrected
    chi2 exactly."""
    row = REGISTRY["q_cochrans_q"].fn(spark, sf_smoke).first()
    r1, r2, r3 = _pandas_labels(sf_smoke)
    k = 3
    cj = np.array([r1.sum(), r2.sum(), r3.sum()], dtype=float)
    ri = r1 + r2 + r3
    q = (
        (k - 1)
        * (k * (cj**2).sum() - cj.sum() ** 2)
        / (k * ri.sum() - (ri.astype(float) ** 2).sum())
    )
    assert row["q_stat"] == pytest.approx(q, abs=1e-3)
    assert (row["c1"], row["c2"], row["c3"]) == tuple(int(x) for x in cj)
    # k=2 reduction: Q(r1, r2) == McNemar chi2 = (b-c)^2/(b+c)
    cj2 = np.array([r1.sum(), r2.sum()], dtype=float)
    ri2 = (r1 + r2).astype(float)
    q2 = (
        (2 - 1)
        * (2 * (cj2**2).sum() - cj2.sum() ** 2)
        / (2 * ri2.sum() - (ri2**2).sum())
    )
    b = int(((r1 == 1) & (r2 == 0)).sum())
    c = int(((r1 == 0) & (r2 == 1)).sum())
    assert q2 == pytest.approx((b - c) ** 2 / (b + c), abs=1e-9)


def test_durbin_watson_numpy_anchor(spark, sf_smoke):
    """DW recomputed definitionally from an independent pandas daily
    series + numpy lstsq, plus the exact identity
    DW = 2(1 - rho1) - (e1^2 + en^2)/SSE and the [0, 4] bound."""
    import pandas as pd

    row = REGISTRY["q_durbin_watson"].fn(spark, sf_smoke).first()
    ev = pd.read_parquet(f"{sf_smoke}/events.parquet",
                         columns=["ts", "value"])
    day = pd.to_datetime(ev["ts"]).dt.date
    d0 = day.min()
    x = day.map(lambda d: (d - d0).days)
    vm = (ev["value"] * 1000).round().astype("int64")
    g = pd.DataFrame({"d": x, "vm": vm}).groupby("d")["vm"].agg(
        ["sum", "count"]
    )
    m = (g["sum"] / g["count"] / 1000.0).round(6)
    ds = m.index.to_numpy(dtype=float)
    A = np.vstack([np.ones_like(ds), ds]).T
    coef, *_ = np.linalg.lstsq(A, m.to_numpy(), rcond=None)
    e = m.to_numpy() - A @ coef
    sse = float((e**2).sum())
    dw = float(((e[1:] - e[:-1]) ** 2).sum() / sse)
    rho1 = float((e[1:] * e[:-1]).sum() / sse)
    assert row["n_days"] == len(ds)
    assert row["intercept"] == pytest.approx(coef[0], abs=1e-3)
    assert row["slope"] == pytest.approx(coef[1], abs=1e-4)
    assert row["dw_stat"] == pytest.approx(dw, abs=1e-3)
    assert row["rho1"] == pytest.approx(rho1, abs=1e-3)
    # exact relation between the published numbers
    ident = 2 * (1 - rho1) - (e[0] ** 2 + e[-1] ** 2) / sse
    assert dw == pytest.approx(ident, abs=1e-9)
    assert 0.0 <= row["dw_stat"] <= 4.0
