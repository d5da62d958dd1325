"""Round-8 batch 5: LSH parameter planner."""

from dumpty_spark.queries import REGISTRY


def test_lsh_planner_derives_shipped_default(spark, sf_smoke):
    rows = {r["bands"]: r
            for r in REGISTRY["q_lsh_param_planner"].fn(spark, sf_smoke).collect()}
    assert set(rows) == {1, 2, 4, 8, 16, 32}
    # the planner derives the shipped E2b default from first principles
    assert rows[8]["chosen"]
    assert sum(1 for r in rows.values() if r["chosen"]) == 1
    # capture curves are monotone in bands at both similarities
    for s_col in ("capture_at_target", "capture_at_noise"):
        caps = [rows[b][s_col] for b in (1, 2, 4, 8, 16, 32)]
        assert caps == sorted(caps)
    # the measured configs: richer banding can only ADD candidates
    assert rows[8]["candidates"] is not None
    assert rows[16]["candidates"] is not None
    assert rows[16]["candidates"] >= rows[8]["candidates"]
    assert all(rows[b]["candidates"] is None for b in (1, 2, 4, 32))
