"""Round-8 batch 10: fertility, split finder, Shapley attribution."""

from dumpty_spark.queries import REGISTRY


def test_fertility_bounds(spark, sf_smoke):
    rows = REGISTRY["q_tokenizer_fertility"].fn(spark, sf_smoke).collect()
    assert len(rows) >= 1
    for r in rows:
        # every [a-z0-9]+ word contributes >= 1 estimated token
        assert r["tokens"] >= r["words"] >= 1
        assert r["fertility"] >= 1.0
        assert r["chars_per_token"] > 0


def test_split_finder_gain_ranking(spark, sf_smoke):
    from dumpty_spark.sources import load_table

    rows = REGISTRY["q_split_finder"].fn(spark, sf_smoke).collect()
    assert len(rows) == 5
    gains = [r["gain"] for r in rows]
    assert gains == sorted(gains, reverse=True)
    total = load_table(spark, sf_smoke, "events").count()
    for r in rows:
        assert r["n_left"] + r["n_right"] == total
        assert 0.0 <= r["gain"] <= 1.0
        assert 0 <= r["pos_left"] <= r["n_left"]
        assert 1 <= r["split_bin"] <= 63


def test_shapley_efficiency_and_shares(spark, sf_smoke):
    rows = REGISTRY["q_shapley_attribution"].fn(spark, sf_smoke).collect()
    assert [r["channel"] for r in rows] == ["click", "error", "signup", "view"]
    shares = [r["share"] for r in rows if r["share"] is not None]
    if shares:
        assert abs(sum(shares) - 1.0) < 1e-4
    # Shapley EFFICIENCY, exactly: sum of phis == v(full) - v(empty).
    # v(15) and v(0) are recomputed independently in DuckDB from the
    # parquet; with the |S|!(n-1-|S|)! weights this holds identically
    # (under the old wrong {1,1,2,6} weights it fails).  Each shapley
    # value is rounded to 6 dp, so tolerance = 4 * 0.5e-6 + eps.
    import duckdb

    con = duckdb.connect()
    v = dict(
        con.execute(
            f"""
WITH ev AS (SELECT * FROM read_parquet('{sf_smoke}/events.parquet')),
fp AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fpts,
         SUM((event_type = 'purchase')::INT)::BIGINT AS n_purch
  FROM ev GROUP BY user_id
),
ch AS (
  SELECT e.user_id,
         BIT_OR(CASE e.event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END) AS mask
  FROM ev e JOIN fp ON fp.user_id = e.user_id
  WHERE e.event_type != 'purchase'
    AND (fp.fpts IS NULL OR e.ts < fp.fpts)
  GROUP BY e.user_id
),
u AS (
  SELECT COALESCE(ch.mask, 0) AS mask, fp.n_purch
  FROM fp LEFT JOIN ch ON ch.user_id = fp.user_id
)
SELECT mask,
       CAST(ROUND(1000000.0 * SUM(n_purch) / COUNT(*), 0) AS BIGINT)
FROM u WHERE mask IN (0, 15) GROUP BY mask
"""
        ).fetchall()
    )
    v15, v0 = v.get(15, 0), v.get(0, 0)
    total = sum(r["shapley"] for r in rows)
    assert abs(total - (v15 - v0) / 1e6) < 3e-6
