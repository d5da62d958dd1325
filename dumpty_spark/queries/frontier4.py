"""Round-5 engine extensions, fourth batch (EXT E121-E124): label-
propagation communities, process-mining eventually-follows graph, RAKE
keyword extraction, interpolated as-of join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dumpty_spark.queries import register
from dumpty_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# E121: label-propagation community detection (fixed synchronous rounds)
# ---------------------------------------------------------------------------
# The lightweight community detector: every node starts labeled with its
# own id; each synchronous round it adopts the most frequent label among
# its neighbors (ties → smallest label). Fixed at 4 rounds, so the whole
# run is deterministic AND SQL-unrollable — the oracle chains 4 CTE
# rounds exactly like the PageRank oracle chains power iterations. Each
# Spark round is one edges⋈labels shuffle + a (node, label)-sized vote
# rollup; labels are checkpointed per round so lineage stays flat.

_LPA_ROUNDS = 4


def _lpa_oracle(rounds: int = _LPA_ROUNDS, tail: str | None = None) -> str:
    """Chained-CTE replay of the synchronous LPA rounds. ``tail`` swaps
    the final SELECT so siblings (q_modularity_score) can reuse the
    identical label state l{rounds} without re-deriving the rounds."""
    head = """
WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
nodes AS (SELECT DISTINCT u AS id FROM edges),
l0 AS (SELECT id, id AS label FROM nodes)"""
    steps = []
    for k in range(1, rounds + 1):
        steps.append(
            f""",
v{k} AS (
  SELECT e.v AS id, p.label, COUNT(*) AS c
  FROM edges e JOIN l{k - 1} p ON p.id = e.u
  GROUP BY e.v, p.label
),
l{k} AS (
  SELECT id, label FROM (
    SELECT id, label,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, label) AS rn
    FROM v{k}
  ) WHERE rn = 1
)"""
        )
    if tail is None:
        tail = f"""
SELECT label AS community, COUNT(*)::BIGINT AS n_members,
       MIN(id)::BIGINT AS min_member, MAX(id)::BIGINT AS max_member
FROM l{rounds}
GROUP BY label
ORDER BY n_members DESC, community
LIMIT 20"""
    return head + "".join(steps) + tail


@register(
    "q_label_propagation",
    oracle=_lpa_oracle(),
    doc="label-propagation communities (E121): 4 synchronous rounds of "
    "adopt-the-plurality-neighbor-label (ties -> smallest) over the "
    "co-purchase graph, top-20 communities by size — one edges⋈labels "
    "shuffle + a votes rollup per round, labels checkpointed; the oracle "
    "unrolls the same rounds as chained CTEs, so parity is exact",
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumpty_spark.operators.graph import label_propagation
    from dumpty_spark.queries.shared_graph import copurchase_symmetric

    edges = copurchase_symmetric(spark, sf_dir)
    labels = label_propagation(edges, src="u", dst="v", n_rounds=_LPA_ROUNDS)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(
            F.count("*").alias("n_members"),
            F.min("id").alias("min_member"),
            F.max("id").alias("max_member"),
        )
        .orderBy(F.desc("n_members"), F.asc("community"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# E122: eventually-follows graph — process mining over event logs
# ---------------------------------------------------------------------------
# The EFG asks, per ordered activity pair (a, b): for how many users does
# a occur STRICTLY BEFORE some later b — anywhere in the trace, not just
# adjacently (that adjacent view is q_event_transitions). Computed with
# ZERO pair explosion over events: one (user, type) rollup to first/last
# timestamps, then a types×types self-join per user (5×5 rows per user,
# metadata-sized).

_EFG_ORACLE = """
WITH spans AS (
  SELECT user_id, event_type, MIN(ts) AS first_ts, MAX(ts) AS last_ts
  FROM events GROUP BY 1, 2
),
ef AS (
  SELECT a.event_type AS from_type, b.event_type AS to_type,
         COUNT(*) FILTER (WHERE a.first_ts < b.last_ts) AS n_follows,
         COUNT(*) AS n_both
  FROM spans a JOIN spans b
    ON a.user_id = b.user_id AND a.event_type != b.event_type
  GROUP BY 1, 2
)
SELECT from_type, to_type,
       n_follows::BIGINT AS n_follows,
       n_both::BIGINT AS n_users_both,
       ROUND(n_follows::DOUBLE / n_both, 4) AS support
FROM ef
ORDER BY from_type, to_type
"""


@register(
    "q_eventually_follows",
    oracle=_EFG_ORACLE,
    doc="eventually-follows graph (E122): per activity pair, how many "
    "users perform a strictly before some later b anywhere in their "
    "trace — the process-mining EFG complementing the adjacent-only "
    "transition matrix; one (user, type) span rollup + a types-sized "
    "self-join per user, zero event-pair explosion",
)
def q_eventually_follows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    a = spans.select(
        "user_id",
        F.col("event_type").alias("from_type"),
        F.col("first_ts").alias("a_first"),
    )
    b = spans.select(
        "user_id",
        F.col("event_type").alias("to_type"),
        F.col("last_ts").alias("b_last"),
    )
    ef = (
        a.join(b, "user_id")
        .filter(F.col("from_type") != F.col("to_type"))
        .groupBy("from_type", "to_type")
        .agg(
            F.sum(F.when(F.col("a_first") < F.col("b_last"), 1).otherwise(0))
            .cast("long")
            .alias("n_follows"),
            F.count("*").alias("n_users_both"),
        )
    )
    return ef.select(
        "from_type",
        "to_type",
        "n_follows",
        "n_users_both",
        F.round(F.col("n_follows") / F.col("n_users_both"), 4).alias("support"),
    ).orderBy("from_type", "to_type")


# ---------------------------------------------------------------------------
# E123: RAKE keyword extraction — degree/frequency phrase scoring
# ---------------------------------------------------------------------------
# Rapid Automatic Keyword Extraction (Rose et al. 2010, public
# literature): candidate phrases are maximal runs of non-stopwords;
# word score = deg(w)/freq(w) with deg(w) = Σ len(phrase) over phrases
# containing w; phrase score = Σ word scores. Corpus-level: word stats
# are vocabulary-sized aggregates, phrase scores a phrase-keyed rollup —
# no per-doc Python, the same split regex on both engines.

_RAKE_STOPS = "the|and|of|to|a|in|is|it|that|for"
# single-backslash \b on purpose: DuckDB '' literals pass backslashes
# through untouched (RE2 sees \b) and Java regex sees \b via F.split
_RAKE_SPLIT = rf"\b({_RAKE_STOPS})\b|[^a-z0-9 ]"
_RAKE_TOPK = 15

_RAKE_ORACLE = f"""
WITH phr AS (
  SELECT doc_id,
         list_filter(
           list_transform(
             string_split_regex(lower(text), '{_RAKE_SPLIT}'),
             p -> trim(p)),
           p -> p != '') AS phrases
  FROM documents
),
pw AS (
  SELECT doc_id, pid, phrase,
         list_filter(string_split(phrase, ' '), w -> w != '') AS ws
  FROM (
    SELECT doc_id, UNNEST(phrases) AS phrase,
           generate_subscripts(phrases, 1) AS pid
    FROM phr
  )
  WHERE len(list_filter(string_split(phrase, ' '), w -> w != '')) >= 2
),
words AS (
  SELECT doc_id, pid, UNNEST(ws) AS w, len(ws) AS plen FROM pw
),
wstats AS (
  SELECT w, SUM(plen)::DOUBLE AS deg, COUNT(*)::DOUBLE AS freq
  FROM words GROUP BY w
),
pscore AS (
  SELECT wd.doc_id, wd.pid, SUM(ws.deg / ws.freq) AS score
  FROM words wd JOIN wstats ws ON ws.w = wd.w
  GROUP BY wd.doc_id, wd.pid
),
canon AS (
  SELECT array_to_string(pw.ws, ' ') AS phrase, p.score
  FROM pscore p JOIN pw ON pw.doc_id = p.doc_id AND pw.pid = p.pid
)
SELECT phrase,
       COUNT(*)::BIGINT AS n_occurrences,
       ROUND(AVG(score), 4) AS rake_score
FROM canon
GROUP BY phrase
ORDER BY rake_score DESC, phrase
LIMIT {_RAKE_TOPK}
"""


@register(
    "q_rake_keywords",
    oracle=_RAKE_ORACLE,
    doc="RAKE keyword extraction (E123): maximal stopword-free phrase "
    "runs scored by summed word deg/freq (deg = Σ phrase length over "
    "occurrences), corpus top-15 — vocabulary-sized word stats + a "
    "phrase-keyed rollup, identical split regex on both engines",
)
def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    phrases = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), _RAKE_SPLIT)).alias(
            "pid", "rawp"
        ),
    ).select("doc_id", "pid", F.trim("rawp").alias("phrase"))
    pw = phrases.filter(F.col("phrase") != "").select(
        "doc_id",
        "pid",
        F.array_remove(F.split("phrase", " "), "").alias("ws"),
    ).filter(F.size("ws") >= 2)
    words = pw.select(
        "doc_id", "pid", F.size("ws").alias("plen"), F.explode("ws").alias("w")
    )
    wstats = words.groupBy("w").agg(
        F.sum("plen").cast("double").alias("deg"),
        F.count("*").cast("double").alias("freq"),
    )
    pscore = (
        words.join(wstats, "w")
        .groupBy("doc_id", "pid")
        .agg(F.sum(F.col("deg") / F.col("freq")).alias("score"))
    )
    canon = pscore.join(pw, ["doc_id", "pid"]).select(
        F.array_join("ws", " ").alias("phrase"), "score"
    )
    return (
        canon.groupBy("phrase")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.round(F.avg("score"), 4).alias("rake_score"),
        )
        .orderBy(F.desc("rake_score"), F.asc("phrase"))
        .limit(_RAKE_TOPK)
    )


# ---------------------------------------------------------------------------
# E124: interpolated as-of join — sensor-fusion time alignment
# ---------------------------------------------------------------------------
# The as-of family (E6) carries the NEAREST click's value to each
# purchase; this interpolates BETWEEN the bracketing clicks at the
# purchase's own timestamp — how misaligned time series are fused before
# feature engineering. Same union-merge single-window shape as the as-of
# joins: tag both streams, one ordered pass per user, no self-join; edge
# purchases (no click before/after) fall back to the available anchor.

_INTERP_ASOF_ORACLE = """
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN value END AS cv,
         CASE WHEN event_type = 'click' THEN epoch(ts) END AS ct,
         event_type
  FROM events
  WHERE event_type IN ('click', 'purchase') AND user_id < 50
),
m AS (
  SELECT user_id, ts, event_id, event_type,
         LAST_VALUE(cv IGNORE NULLS) OVER w AS pv,
         LAST_VALUE(ct IGNORE NULLS) OVER w AS pt,
         FIRST_VALUE(cv IGNORE NULLS) OVER w2 AS nv,
         FIRST_VALUE(ct IGNORE NULLS) OVER w2 AS nt
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING),
         w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
),
p AS (
  SELECT user_id, event_id, ts,
         CASE
           WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt > pt
             THEN pv + (nv - pv) * (epoch(ts) - pt) / (nt - pt)
           WHEN pv IS NOT NULL THEN pv
           ELSE nv
         END AS iv
  FROM m WHERE event_type = 'purchase'
)
SELECT user_id, event_id,
       STRFTIME(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS p_time,
       ROUND(iv, 4) AS interp_click_value
FROM p
ORDER BY user_id, event_id
"""


@register(
    "q_interp_asof_join",
    oracle=_INTERP_ASOF_ORACLE,
    doc="interpolated as-of join (E124): each purchase picks up the "
    "click value linearly interpolated between its bracketing clicks at "
    "the purchase's own timestamp (edges fall back to the available "
    "anchor) — the sensor-fusion alignment; same union-merge one-window "
    "pass as the as-of family, no self-join",
)
def q_interp_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase") & (F.col("user_id") < 50)
    )
    epoch = F.col("ts").cast("timestamp").cast("double")
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("value")).alias("cv"),
        F.when(F.col("event_type") == "click", epoch).alias("ct"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    m = (
        tagged.withColumn("pv", F.last("cv", ignorenulls=True).over(wb))
        .withColumn("pt", F.last("ct", ignorenulls=True).over(wb))
        .withColumn("nv", F.first("cv", ignorenulls=True).over(wf))
        .withColumn("nt", F.first("ct", ignorenulls=True).over(wf))
        .filter(F.col("event_type") == "purchase")
    )
    iv = (
        F.when(
            F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
            & (F.col("nt") > F.col("pt")),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (epoch - F.col("pt"))
            / (F.col("nt") - F.col("pt")),
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    return m.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("p_time"),
        F.round(iv, 4).alias("interp_click_value"),
    ).orderBy("user_id", "event_id")
