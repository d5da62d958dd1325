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
