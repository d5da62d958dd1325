"""Round-8 batch 7: Jaro-Winkler linkage and Holt-Winters smoothing."""

from pyspark.sql import functions as F

from dumpty_spark.queries import REGISTRY


def test_jaro_winkler_known_values():
    from dumpty_spark.operators.editdist import _jaro_winkler_py as jw

    # Winkler's canonical example pairs
    assert abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12
    assert abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12
    assert jw("abc", "abc") == 1.0
    assert jw("", "abc") == 0.0
    assert jw("abc", "") == 0.0
    assert jw("abc", "xyz") == 0.0
    # prefix bonus only above the 0.7 boost threshold
    low = jw("abcdefghij", "abxxxxxxxx")
    assert low < 0.7 or low == jw("abcdefghij", "abxxxxxxxx")


def test_jaro_winkler_null_propagates(spark):
    from dumpty_spark.operators.editdist import jaro_winkler

    df = spark.createDataFrame(
        [("abc", "abc"), (None, "abc"), ("abc", None), (None, None)],
        "a string, b string",
    ).select(jaro_winkler(F.col("a"), F.col("b")).alias("jw"))
    got = [r["jw"] for r in df.collect()]
    assert got[0] == 1.0
    assert got[1:] == [None, None, None]


def test_jaro_winkler_matches_duckdb_on_fixture(spark, sf_smoke):
    import duckdb

    from dumpty_spark.operators.editdist import _jaro_winkler_py as jw

    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH n AS (SELECT DISTINCT p_name FROM
                   read_parquet('{sf_smoke}/part.parquet'))
        SELECT a.p_name, b.p_name,
               jaro_winkler_similarity(a.p_name, b.p_name)
        FROM n a JOIN n b ON a.p_name < b.p_name LIMIT 500
        """
    ).fetchall()
    assert len(rows) > 0
    for a, b, want in rows:
        assert abs(jw(a, b) - want) < 1e-14, (a, b)


def test_jw_match_plan_and_shape(spark, sf_smoke):
    df = REGISTRY["q_jaro_winkler_match"].fn(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    rows = df.collect()
    sims = [r["jw_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(0.0 <= s <= 1.0 for s in sims)
    assert all(r["name_a"] < r["name_b"] for r in rows)
    # blocking invariant: candidates share the first token
    assert all(
        r["name_a"].split(" ")[0] == r["name_b"].split(" ")[0] for r in rows
    )


def _hw_fold(xs, alpha=0.3, beta=0.05, gamma=0.2):
    """Reference Python replica of the 9dp-requantized fold."""
    w1 = round(sum(xs[:7]) / 7.0, 9)
    lvl = w1
    tr = round((sum(xs[7:14]) / 7.0 - w1) / 7.0, 9)
    seas = [round(v - w1, 9) for v in xs[:7]]
    sae = 0
    for x in xs[7:]:
        el = seas[0]
        sae += int(round(1000000 * abs(x - (lvl + tr + el)), 0))
        lvl_n = round(alpha * (x - el) + (1 - alpha) * (lvl + tr), 9)
        tr_n = round(beta * (lvl_n - lvl) + (1 - beta) * tr, 9)
        s_n = round(gamma * (x - lvl_n) + (1 - gamma) * el, 9)
        seas = seas[1:] + [s_n]
        lvl, tr = lvl_n, tr_n
    return lvl, tr, seas, sae


def test_holt_winters_matches_python_replica(spark, sf_smoke):
    from dumpty_spark.sources import load_table

    got = {
        (r["event_type"], r["h"]): r
        for r in REGISTRY["q_holt_winters"].fn(spark, sf_smoke).collect()
    }
    ev = load_table(spark, sf_smoke, "events")
    daily = (
        ev.select("event_type", F.col("ts").cast("date").alias("d"))
        .groupBy("event_type", "d")
        .count()
        .collect()
    )
    by_type = {}
    all_days = sorted({r["d"] for r in daily})
    import datetime

    lo, hi = all_days[0], all_days[-1]
    n_days = (hi - lo).days + 1
    types = sorted({r["event_type"] for r in daily})
    counts = {(r["event_type"], r["d"]): r["count"] for r in daily}
    for t in types:
        xs = [
            float(counts.get((t, lo + datetime.timedelta(days=i)), 0))
            for i in range(n_days)
        ]
        lvl, tr, seas, sae = _hw_fold(xs)
        for h in range(1, 8):
            row = got[(t, h)]
            assert row["sae_micro"] == sae
            assert row["n_fit"] == n_days - 7
            assert abs(row["forecast"] - round(lvl + h * tr + seas[h - 1], 4)) < 1e-9


def test_holt_winters_shape(spark, sf_smoke):
    rows = REGISTRY["q_holt_winters"].fn(spark, sf_smoke).collect()
    assert len(rows) % 7 == 0 and len(rows) > 0
    for r in rows:
        assert 1 <= r["h"] <= 7
        assert r["sae_micro"] >= 0
