"""Round-6 engine extensions, fifth batch (EXT E149-E154): incremental
JOIN-view store, Markov removal-effect attribution, WOE encoding, SCD2
interval audit, ratio-metric variance (delta method vs jackknife), and
the mSPRT always-valid experiment readout.

Design rules shared by the batch: pure-Column / partial-agg plans,
stores rooted under spark.sql.warehouse.dir (shared storage on a real
deployment — the E129 discipline), iteration only over state-count-sized
frames (the 7-state Markov chain), portable md5 coins for arm
assignment, and exact DuckDB oracles (the join-view and Markov oracles
recompute final state from the raw tables, proving the incremental /
iterative paths land exactly on the from-scratch answer).
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dumpty_spark.operators.sampling import bucket_fraction, bucket_fraction_sql
from dumpty_spark.queries import register
from dumpty_spark.session import warehouse_scratch as _warehouse_scratch
from dumpty_spark.sources.parquet import load_table


# ---------------------------------------------------------------------------
# E149: incremental JOIN-view store (delta-join maintenance)
# ---------------------------------------------------------------------------
# The materialized view is revenue-per-nation = orders ⋈ customer,
# maintained through four batches without ever re-reading processed
# facts: two fact batches under the ORIGINAL dimension, a dimension
# update (every %11 customer moves to the next nation) whose A⋈ΔB delta
# re-homes all PAST facts of the moved keys via negative/positive
# partials, then a third fact batch under the UPDATED dimension. The
# oracle recomputes the final state from scratch (all orders joined to
# the final mapping), so the hash match proves the four delta batches
# compose to exactly the from-scratch join.

_JOINVIEW_ORACLE = """
WITH upd AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 11 = 0 THEN (c_nationkey + 1) % 25
              ELSE c_nationkey END AS grp
  FROM customer
)
SELECT u.grp,
       ROUND(SUM(o.o_totalprice), 2) AS rev,
       COUNT(*)::BIGINT AS cnt
FROM orders o JOIN upd u ON u.c_custkey = o.o_custkey
GROUP BY u.grp
ORDER BY u.grp
"""


@register(
    "q_join_view_store",
    oracle=_JOINVIEW_ORACLE,
    doc="incremental JOIN-view store (E149): revenue-per-nation "
    "(orders ⋈ customer) maintained by delta joins through 4 batches — "
    "fact deltas join only the arriving rows, the dimension move emits "
    "negative/positive correction partials for PAST facts of moved keys "
    "(semi-join-pruned history scan), state at rest is hive-partitioned "
    "mergeable partials (idempotent per batch); oracle recomputes the "
    "final view from scratch, proving delta maintenance ≡ full rebuild",
)
def q_join_view_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators import joinview as JV

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    moved = F.col("c_custkey") % 11 == 0
    cust_v2 = cust.select(
        "c_custkey",
        F.when(moved, (F.col("c_nationkey") + 1) % 25)
        .otherwise(F.col("c_nationkey"))
        .alias("c_nationkey"),
    )
    moves = cust.filter(moved).select(
        "c_custkey",
        F.col("c_nationkey").alias("old_grp"),
        ((F.col("c_nationkey") + 1) % 25).alias("new_grp"),
    )
    store = _warehouse_scratch(spark, "jv")
    try:
        # B0/B1: fact deltas under the original dimension
        for bid, m in (("b0", 0), ("b1", 1)):
            JV.view_append(
                JV.fact_delta_partials(
                    orders.filter(F.col("o_orderkey") % 3 == m),
                    cust,
                    "o_custkey",
                    "c_custkey",
                    "c_nationkey",
                    "o_totalprice",
                ),
                store,
                bid,
            )
        # B2: dimension move — re-home every PAST fact of the moved keys
        history = orders.filter(F.col("o_orderkey") % 3 < 2)
        JV.view_append(
            JV.dim_move_partials(
                history,
                moves,
                "o_custkey",
                "c_custkey",
                "old_grp",
                "new_grp",
                "o_totalprice",
            ),
            store,
            "b2",
        )
        # B3: fact delta under the UPDATED dimension
        JV.view_append(
            JV.fact_delta_partials(
                orders.filter(F.col("o_orderkey") % 3 == 2),
                cust_v2,
                "o_custkey",
                "c_custkey",
                "c_nationkey",
                "o_totalprice",
            ),
            store,
            "b3",
        )
        return (
            JV.view_read(spark, store)
            .select("grp", F.round("rev", 2).alias("rev"), F.col("cnt"))
            .orderBy("grp")
            .localCheckpoint()  # materialize before the scratch dir dies
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


# ---------------------------------------------------------------------------
# E150: Markov-chain (removal-effect) attribution
# ---------------------------------------------------------------------------
# The principled upgrade of the U-shaped model (E142): build the
# first-order journey chain START -> {touch channels} -> CONV/NULL from
# each user's segments (same reverse-cumulative segmentation as E142),
# solve for the absorption probability a(START) of reaching CONV, then
# re-solve with each channel knocked out (its inbound transitions
# redirected to NULL) — a channel's removal effect 1 - a_removed/a_base
# is its causal share of conversions under the chain model (Anderl et
# al. 2014). The chain is STATE-COUNT-sized (7 states), so after one
# transition-count scan the 5 absorption solves are metadata work: the
# driver iterates the 7-row system 96 rounds in plain Python (the
# two-regime discipline's driver case — the matrix is constant-sized at
# ANY data scale), and the oracle unrolls the identical 96 rounds per
# scenario as materialized CTEs. P entries are exact count ratios, so
# both engines iterate the same doubles; 6dp output rounding absorbs
# sum-order ulps (the iteration is a contraction — perturbations decay).
#
# ROUND COUNT (r10 oracle-independence audit): 24 rounds was NOT
# converged — at sf0.001 the chain's continue-mass gives rho(Q)~0.79,
# so the 24-round iterate sat ~3.5e-3 below the true absorption
# probability, and the round-replaying oracle hash-matched the
# unconverged value (the Shapley bug class). 96 rounds puts the
# residual at rho^96 ~ 2e-10, far under the 6dp output grid even for
# rho up to ~0.78; tests/test_oracle_independence.py anchors the
# published numbers to an exact numpy (I-Q)^-1 solve at 1e-5.

_MK_CHANNELS = ["click", "error", "signup", "view"]
_MK_ROUNDS = 96

_MK_TRANS_SQL = """
seg AS MATERIALIZED (
  SELECT user_id, event_type, ts, event_id,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
         ) AS g
  FROM events
),
tch AS MATERIALIZED (
  SELECT user_id, g, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, g ORDER BY ts, event_id)
           AS pos,
         COUNT(*) OVER (PARTITION BY user_id, g) AS k
  FROM seg WHERE event_type <> 'purchase'
),
hops AS MATERIALIZED (
  SELECT COALESCE(LAG(event_type) OVER (
           PARTITION BY user_id, g ORDER BY pos), 'START') AS src,
         event_type AS dst
  FROM tch
  UNION ALL
  SELECT event_type AS src,
         CASE WHEN g >= 1 THEN 'CONV' ELSE 'NULL' END AS dst
  FROM tch WHERE pos = k
),
cnt0 AS MATERIALIZED (
  SELECT src, dst, COUNT(*)::BIGINT AS n FROM hops GROUP BY src, dst
  UNION ALL
  -- direct START->CONV: purchases with no preceding touches in their
  -- segment never appear in the touch frame, so their count is added
  -- at the COUNT level (not as synthetic rows)
  SELECT 'START', 'CONV',
         (SELECT COUNT(*) FROM events WHERE event_type = 'purchase')
         - (SELECT COUNT(DISTINCT (user_id, g)) FROM tch WHERE g >= 1)
  WHERE (SELECT COUNT(*) FROM events WHERE event_type = 'purchase')
        - (SELECT COUNT(DISTINCT (user_id, g)) FROM tch WHERE g >= 1) > 0
),
cnt AS MATERIALIZED (
  SELECT src, dst, SUM(n)::BIGINT AS n FROM cnt0 GROUP BY src, dst
),
pr AS MATERIALIZED (
  SELECT src, dst, n::DOUBLE / SUM(n) OVER (PARTITION BY src) AS p
  FROM cnt
)"""


def _mk_absorb_sql(tag: str, removed: str | None) -> str:
    """24 unrolled absorption rounds for one scenario; a{tag}24 has
    (state, a)."""
    guard = f"AND t.src <> '{removed}'" if removed else ""
    kill = f"WHEN t.dst = '{removed}' THEN 0.0::DOUBLE" if removed else ""
    steps = [
        f""",
a{tag}0 AS MATERIALIZED (
  SELECT DISTINCT t.src AS state, 0.0::DOUBLE AS a FROM pr t
  WHERE TRUE {guard}
)"""
    ]
    for k in range(1, _MK_ROUNDS + 1):
        steps.append(
            f""",
a{tag}{k} AS MATERIALIZED (
  SELECT t.src AS state,
         SUM(t.p * CASE WHEN t.dst = 'CONV' THEN 1.0::DOUBLE
                        WHEN t.dst = 'NULL' THEN 0.0::DOUBLE
                        {kill}
                        ELSE COALESCE(v.a, 0.0::DOUBLE) END) AS a
  FROM pr t LEFT JOIN a{tag}{k - 1} v ON v.state = t.dst
  WHERE TRUE {guard}
  GROUP BY t.src
)"""
        )
    return "".join(steps)


def _mk_oracle() -> str:
    parts = ["WITH " + _MK_TRANS_SQL.strip()]
    parts.append(_mk_absorb_sql("b", None))
    for c in _MK_CHANNELS:
        parts.append(_mk_absorb_sql(c[0] + c[-1], c))
    base = f"(SELECT a FROM ab{_MK_ROUNDS} WHERE state = 'START')"
    sel = []
    for c in _MK_CHANNELS:
        tag = c[0] + c[-1]
        rem = (
            f"(1.0::DOUBLE - (SELECT a FROM a{tag}{_MK_ROUNDS} "
            f"WHERE state = 'START') / {base})"
        )
        sel.append(
            f"SELECT '{c}' AS channel, ROUND({base}, 6) AS base_conversion, "
            f"ROUND({rem}, 6) AS removal_effect"
        )
    return (
        "".join(parts)
        + ",\nre AS MATERIALIZED (\n"
        + "\nUNION ALL\n".join(sel)
        + "\n)\nSELECT channel, base_conversion, removal_effect,\n"
        + "       ROUND(removal_effect / SUM(removal_effect) OVER (), 6)"
        + " AS attribution_share\nFROM re ORDER BY channel"
    )


@register(
    "q_markov_attribution",
    oracle=_mk_oracle(),
    doc="Markov removal-effect attribution (E150): first-order journey "
    "chain START→channels→CONV/NULL from the E142 segmentation, "
    "absorption probability solved by 96 fixed-point rounds (enough "
    "to converge below the 6dp grid — the 24-round r6 version published "
    "an unconverged iterate), each "
    "channel's removal effect = 1 − a_removed/a_base with inbound edges "
    "redirected to NULL — the chain is 7-state (constant at any scale) "
    "so all 5 solves are driver-side metadata work after ONE transition "
    "count scan; oracle unrolls the identical rounds per scenario",
)
def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_rev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    seg = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).over(w_rev).alias("g"),
    )
    w_pos = Window.partitionBy("user_id", "g").orderBy("ts", "event_id")
    w_k = Window.partitionBy("user_id", "g")
    tch = (
        seg.filter(F.col("event_type") != "purchase")
        .withColumn("pos", F.row_number().over(w_pos))
        .withColumn("k", F.count("*").over(w_k))
        .localCheckpoint()  # one segmentation pass feeds all three hop kinds
    )
    hops = (
        tch.select(
            F.coalesce(
                F.lag("event_type").over(w_pos), F.lit("START")
            ).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .unionAll(
            tch.filter(F.col("pos") == F.col("k")).select(
                F.col("event_type").alias("src"),
                F.when(F.col("g") >= 1, F.lit("CONV"))
                .otherwise(F.lit("NULL"))
                .alias("dst"),
            )
        )
    )
    cnt = {
        (r["src"], r["dst"]): r["n"]
        for r in hops.groupBy("src", "dst").agg(F.count("*").alias("n")).collect()
    }
    # direct START->CONV segments (a purchase with no preceding touches)
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    n_conv_seg = (
        tch.filter(F.col("g") >= 1).select("user_id", "g").distinct().count()
    )
    direct = n_purch - n_conv_seg
    if direct > 0:
        cnt[("START", "CONV")] = cnt.get(("START", "CONV"), 0) + direct

    # --- driver-side absorption solves: the chain is 7 states, constant
    # at any data scale (the two-regime driver case; exact count-ratio
    # doubles, identical to the oracle's unrolled rounds)
    out_tot = {}
    for (s, _), n in sorted(cnt.items()):
        out_tot[s] = out_tot.get(s, 0) + n
    pr = {(s, t): n / out_tot[s] for (s, t), n in sorted(cnt.items())}

    def absorb(removed: str | None) -> float:
        states = sorted({s for s, _ in pr} - ({removed} if removed else set()))
        a = {s: 0.0 for s in states}
        for _ in range(_MK_ROUNDS):
            new = {}
            for s in states:
                tot = 0.0
                for (src, dst), p in sorted(pr.items()):
                    if src != s:
                        continue
                    if dst == "CONV":
                        tot += p * 1.0
                    elif dst == "NULL" or dst == removed:
                        tot += 0.0
                    else:
                        tot += p * a.get(dst, 0.0)
                new[s] = tot
            a = new
        return a.get("START", 0.0)

    base = absorb(None)
    rows = []
    for c in _MK_CHANNELS:
        re_c = 1.0 - absorb(c) / base
        rows.append((c, round(base, 6), round(re_c, 6)))
    tot_re = sum(r[2] for r in rows)
    out = [
        (c, b, r, round(r / tot_re, 6)) for (c, b, r) in rows
    ]
    return spark.createDataFrame(
        out, "channel string, base_conversion double, removal_effect double, "
        "attribution_share double"
    ).orderBy("channel")


# ---------------------------------------------------------------------------
# E151: weight-of-evidence (WOE) encoding + information value
# ---------------------------------------------------------------------------
# The scorecard-standard categorical encoder (target encoding's E109
# sibling for binary labels): per category, WOE = ln(dist_pos/dist_neg)
# with 0.5 additive smoothing (0.5k on the totals), and the information
# value IV = Σ (dist_pos - dist_neg)·WOE summarizing the feature's
# separating power. One grouped pass; category table broadcast-sized.

_WOE_ORACLE = """
WITH c AS (
  SELECT source,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS pos,
         SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS neg
  FROM documents GROUP BY source
),
t AS (
  SELECT SUM(pos)::DOUBLE AS tp, SUM(neg)::DOUBLE AS tn,
         COUNT(*)::BIGINT AS k
  FROM c
),
w AS (
  SELECT c.source, c.pos, c.neg,
         (c.pos + 0.5::DOUBLE) / (t.tp + 0.5::DOUBLE * t.k) AS dp,
         (c.neg + 0.5::DOUBLE) / (t.tn + 0.5::DOUBLE * t.k) AS dn
  FROM c, t
),
iv AS (SELECT SUM((dp - dn) * LN(dp / dn)) AS iv FROM w)
SELECT w.source, w.pos, w.neg,
       ROUND(LN(w.dp / w.dn), 6) AS woe,
       ROUND((w.dp - w.dn) * LN(w.dp / w.dn), 6) AS iv_contrib,
       ROUND(iv.iv, 6) AS iv_total
FROM w, iv
ORDER BY w.source
"""


@register(
    "q_woe_encoding",
    oracle=_WOE_ORACLE,
    doc="weight-of-evidence encoding (E151): per-category smoothed "
    "WOE = ln(dist_pos/dist_neg) against the lang='en' label plus the "
    "information value rollup — the scorecard-standard encoder, one "
    "grouped pass with the category table broadcast",
)
def q_woe_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("pos"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1)).alias("neg"),
    )
    t = c.agg(
        F.sum("pos").cast("double").alias("tp"),
        F.sum("neg").cast("double").alias("tn"),
        F.count("*").alias("k"),
    )
    w = c.crossJoin(F.broadcast(t)).select(
        "source",
        "pos",
        "neg",
        ((F.col("pos") + 0.5) / (F.col("tp") + 0.5 * F.col("k"))).alias("dp"),
        ((F.col("neg") + 0.5) / (F.col("tn") + 0.5 * F.col("k"))).alias("dn"),
    )
    iv = w.agg(
        F.sum((F.col("dp") - F.col("dn")) * F.log(F.col("dp") / F.col("dn"))).alias(
            "iv"
        )
    )
    return (
        w.crossJoin(F.broadcast(iv))
        .select(
            "source",
            "pos",
            "neg",
            F.round(F.log(F.col("dp") / F.col("dn")), 6).alias("woe"),
            F.round(
                (F.col("dp") - F.col("dn")) * F.log(F.col("dp") / F.col("dn")), 6
            ).alias("iv_contrib"),
            F.round("iv", 6).alias("iv_total"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# E152: SCD2 validity-interval audit
# ---------------------------------------------------------------------------
# The data-quality gate for every slowly-changing-dimension table (E32
# consumes these intervals; this audits them): detect overlapping
# intervals, coverage gaps, inverted rows and keys without an
# open-ended current row. The intervals are built from the same
# purchase-event construction as E32 — contiguous by construction —
# then deterministic defects are injected (%13-keyed extend/shrink,
# %13==7 closes the key's current row) so the audit provably counts
# exactly the injected defects. One window pass per key.

_SCD2_AUDIT_ORACLE = """
WITH upd AS (
  SELECT user_id, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM events WHERE event_type = 'purchase'
),
mut AS (
  SELECT user_id, valid_from,
         CASE
           WHEN user_id % 13 = 0 THEN valid_to + INTERVAL 1 HOUR
           WHEN user_id % 13 = 5 THEN valid_to - INTERVAL 2 HOUR
           WHEN user_id % 13 = 7 AND valid_to IS NULL
             THEN valid_from + INTERVAL 1 HOUR
           ELSE valid_to
         END AS valid_to
  FROM upd
),
flg AS (
  SELECT user_id, valid_from, valid_to,
         LEAD(valid_from) OVER (
           PARTITION BY user_id ORDER BY valid_from) AS next_from
  FROM mut
)
SELECT COUNT(DISTINCT user_id)::BIGINT AS n_keys,
       COUNT(*)::BIGINT AS n_rows,
       SUM(CASE WHEN valid_to IS NOT NULL AND next_from IS NOT NULL
                     AND valid_to > next_from THEN 1 ELSE 0 END)::BIGINT
         AS n_overlaps,
       SUM(CASE WHEN valid_to IS NOT NULL AND next_from IS NOT NULL
                     AND valid_to < next_from THEN 1 ELSE 0 END)::BIGINT
         AS n_gaps,
       SUM(CASE WHEN valid_to IS NOT NULL AND valid_to <= valid_from
                THEN 1 ELSE 0 END)::BIGINT AS n_inverted,
       (SELECT COUNT(*)::BIGINT FROM (
          SELECT user_id FROM flg GROUP BY user_id
          HAVING SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) = 0
        )) AS n_keys_no_current
FROM flg
"""


@register(
    "q_scd2_interval_audit",
    oracle=_SCD2_AUDIT_ORACLE,
    doc="SCD2 validity-interval audit (E152): per-key window pass flags "
    "overlapping intervals, coverage gaps, inverted rows and keys with "
    "no open-ended current row — run against the E32 interval "
    "construction with deterministic %13-keyed defect injection so the "
    "audit provably counts exactly the injected corruption",
)
def q_scd2_interval_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    upd = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    mut = upd.select(
        "user_id",
        "valid_from",
        F.when(
            F.col("user_id") % 13 == 0,
            F.col("valid_to") + F.expr("INTERVAL 1 HOUR"),
        )
        .when(
            F.col("user_id") % 13 == 5,
            F.col("valid_to") - F.expr("INTERVAL 2 HOUR"),
        )
        .when(
            (F.col("user_id") % 13 == 7) & F.col("valid_to").isNull(),
            F.col("valid_from") + F.expr("INTERVAL 1 HOUR"),
        )
        .otherwise(F.col("valid_to"))
        .alias("valid_to"),
    )
    wf = Window.partitionBy("user_id").orderBy("valid_from")
    flg = mut.withColumn("next_from", F.lead("valid_from").over(wf)).localCheckpoint()
    no_current = (
        flg.groupBy("user_id")
        .agg(
            F.sum(F.col("valid_to").isNull().cast("int")).alias("n_open")
        )
        .filter(F.col("n_open") == 0)
        .count()
    )
    both = F.col("valid_to").isNotNull() & F.col("next_from").isNotNull()
    return flg.agg(
        F.countDistinct("user_id").alias("n_keys"),
        F.count("*").alias("n_rows"),
        F.sum((both & (F.col("valid_to") > F.col("next_from"))).cast("int"))
        .cast("long")
        .alias("n_overlaps"),
        F.sum((both & (F.col("valid_to") < F.col("next_from"))).cast("int"))
        .cast("long")
        .alias("n_gaps"),
        F.sum(
            (
                F.col("valid_to").isNotNull()
                & (F.col("valid_to") <= F.col("valid_from"))
            ).cast("int")
        )
        .cast("long")
        .alias("n_inverted"),
        F.lit(no_current).cast("long").alias("n_keys_no_current"),
    )


# ---------------------------------------------------------------------------
# E153: ratio-metric standard error — delta method vs jackknife
# ---------------------------------------------------------------------------
# Revenue-per-event style RATIO metrics violate the iid assumption the
# naive SE makes (users, not events, are the experimental unit). Two
# textbook-correct estimators computed side by side, both exact and
# closed-form from per-user sums: the delta-method linearization
# SE² = Σ(y_i − R·n_i)² / Sn² · U/(U−1), and the leave-one-user-out
# jackknife over R_(-i) = (Sy−y_i)/(Sn−n_i) — one user-grouped pass
# plus a broadcast totals frame, no replicates, no resampling.

_RATIO_SE_ORACLE = """
WITH per AS (
  SELECT event_type, user_id,
         SUM(value) AS y, COUNT(*)::BIGINT AS n
  FROM events GROUP BY event_type, user_id
),
tot AS (
  SELECT event_type, SUM(y) AS sy, SUM(n)::DOUBLE AS sn,
         COUNT(*)::BIGINT AS u
  FROM per GROUP BY event_type
),
jk AS (
  SELECT p.event_type,
         (t.sy - p.y) / (t.sn - p.n) AS r_loo,
         p.y - (t.sy / t.sn) * p.n AS resid
  FROM per p JOIN tot t USING (event_type)
),
jstat AS (
  SELECT event_type,
         AVG(r_loo) AS rbar,
         SUM(resid * resid) AS ss
  FROM jk GROUP BY event_type
)
SELECT t.event_type, t.u AS n_users,
       ROUND(t.sy / t.sn, 6) AS ratio,
       ROUND(SQRT(j.ss / (t.sn * t.sn) * t.u / (t.u - 1)), 6) AS se_delta,
       ROUND(SQRT((t.u - 1.0::DOUBLE) / t.u *
             (SELECT SUM((r_loo - j.rbar) * (r_loo - j.rbar))
              FROM jk WHERE jk.event_type = t.event_type)), 6) AS se_jackknife
FROM tot t JOIN jstat j USING (event_type)
ORDER BY t.event_type
"""


@register(
    "q_ratio_se",
    oracle=_RATIO_SE_ORACLE,
    doc="ratio-metric standard errors (E153): delta-method linearization "
    "and leave-one-user-out jackknife for the per-event ratio metric, "
    "both exact closed forms from per-user sums (no resampling) — the "
    "user-level variance every ratio-metric experiment readout needs",
)
def q_ratio_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type", "user_id").agg(
        F.sum("value").alias("y"), F.count("*").alias("n")
    )
    tot = per.groupBy("event_type").agg(
        F.sum("y").alias("sy"),
        F.sum("n").cast("double").alias("sn"),
        F.count("*").alias("u"),
    )
    jk = per.join(F.broadcast(tot), "event_type").select(
        "event_type",
        ((F.col("sy") - F.col("y")) / (F.col("sn") - F.col("n"))).alias("r_loo"),
        (F.col("y") - (F.col("sy") / F.col("sn")) * F.col("n")).alias("resid"),
    ).localCheckpoint()  # per-user frame feeds two stat passes
    jstat = jk.groupBy("event_type").agg(
        F.avg("r_loo").alias("rbar"), F.sum(F.col("resid") * F.col("resid")).alias("ss")
    )
    jvar = (
        jk.join(F.broadcast(jstat.select("event_type", "rbar")), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                (F.col("r_loo") - F.col("rbar")) * (F.col("r_loo") - F.col("rbar"))
            ).alias("ssj")
        )
    )
    return (
        tot.join(F.broadcast(jstat), "event_type")
        .join(F.broadcast(jvar), "event_type")
        .select(
            "event_type",
            F.col("u").alias("n_users"),
            F.round(F.col("sy") / F.col("sn"), 6).alias("ratio"),
            F.round(
                F.sqrt(
                    F.col("ss")
                    / (F.col("sn") * F.col("sn"))
                    * F.col("u")
                    / (F.col("u") - 1)
                ),
                6,
            ).alias("se_delta"),
            F.round(
                F.sqrt((F.col("u") - F.lit(1.0)) / F.col("u") * F.col("ssj")), 6
            ).alias("se_jackknife"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# E154: mSPRT always-valid experiment readout
# ---------------------------------------------------------------------------
# Fixed-horizon p-values break under the peeking every live dashboard
# does; the mixture sequential probability ratio test (Johari et al.
# 2017) gives an ALWAYS-VALID p-value: with a normal mixture of scale
# τ² over the effect, Λ = sqrt(σ²/(σ²+n·τ²)) ·
# exp(n²τ²δ̂² / (2σ²(σ²+n·τ²))), p = min(1, 1/Λ), monotone
# non-increasing as data accrues. τ² = pooled σ² (the standard default),
# n = the two-sample effective size nt·nc/(nt+nc), md5-coin arms —
# closed form from one grouped pass, the sequential companion to E126.

_MSPRT_ORACLE = f"""
WITH arm AS (
  SELECT event_type,
         {bucket_fraction_sql(["user_id"])} < 0.5 AS treated,
         value
  FROM events
),
g AS (
  SELECT event_type,
         AVG(CASE WHEN treated THEN value END) AS mt,
         AVG(CASE WHEN NOT treated THEN value END) AS mc,
         COUNT(CASE WHEN treated THEN 1 END)::DOUBLE AS nt,
         COUNT(CASE WHEN NOT treated THEN 1 END)::DOUBLE AS nc,
         VAR_POP(value) AS s2
  FROM arm GROUP BY event_type
),
m AS (
  SELECT event_type, mt - mc AS delta,
         nt * nc / (nt + nc) AS neff, s2,
         nt::BIGINT AS n_treat, nc::BIGINT AS n_ctrl
  FROM g
),
lam AS (
  SELECT event_type, n_treat, n_ctrl, delta, s2,
         SQRT(s2 / (s2 + neff * s2))
           * EXP(neff * neff * s2 * delta * delta
                 / (2.0::DOUBLE * s2 * (s2 + neff * s2))) AS lambda
  FROM m
)
SELECT event_type, n_treat, n_ctrl,
       ROUND(delta, 6) AS delta,
       ROUND(lambda, 4) AS lambda,
       ROUND(LEAST(1.0::DOUBLE, 1.0::DOUBLE / lambda), 4) AS always_valid_p,
       (LEAST(1.0::DOUBLE, 1.0::DOUBLE / lambda) < 0.05) AS significant
FROM lam
ORDER BY event_type
"""


@register(
    "q_msprt_readout",
    oracle=_MSPRT_ORACLE,
    doc="mSPRT always-valid p-value (E154): mixture sequential probability "
    "ratio test with τ²=pooled σ² over md5-coin arms — the peeking-proof "
    "sequential companion to the CUPED readout, closed form from one "
    "grouped pass",
)
def q_msprt_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arm = ev.select(
        "event_type",
        (bucket_fraction(["user_id"]) < 0.5).alias("treated"),
        "value",
    )
    g = arm.groupBy("event_type").agg(
        F.avg(F.when(F.col("treated"), F.col("value"))).alias("mt"),
        F.avg(F.when(~F.col("treated"), F.col("value"))).alias("mc"),
        F.count(F.when(F.col("treated"), 1)).cast("double").alias("nt"),
        F.count(F.when(~F.col("treated"), 1)).cast("double").alias("nc"),
        F.var_pop("value").alias("s2"),
    )
    m = g.select(
        "event_type",
        (F.col("mt") - F.col("mc")).alias("delta"),
        (F.col("nt") * F.col("nc") / (F.col("nt") + F.col("nc"))).alias("neff"),
        "s2",
        F.col("nt").cast("long").alias("n_treat"),
        F.col("nc").cast("long").alias("n_ctrl"),
    )
    lam = m.select(
        "event_type",
        "n_treat",
        "n_ctrl",
        "delta",
        "s2",
        (
            F.sqrt(F.col("s2") / (F.col("s2") + F.col("neff") * F.col("s2")))
            * F.exp(
                F.col("neff")
                * F.col("neff")
                * F.col("s2")
                * F.col("delta")
                * F.col("delta")
                / (
                    F.lit(2.0)
                    * F.col("s2")
                    * (F.col("s2") + F.col("neff") * F.col("s2"))
                )
            )
        ).alias("lambda"),
    )
    p = F.least(F.lit(1.0), F.lit(1.0) / F.col("lambda"))
    return lam.select(
        "event_type",
        "n_treat",
        "n_ctrl",
        F.round("delta", 6).alias("delta"),
        F.round("lambda", 4).alias("lambda"),
        F.round(p, 4).alias("always_valid_p"),
        (p < 0.05).alias("significant"),
    ).orderBy("event_type")
