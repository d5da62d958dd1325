"""Deterministic hash-based sampling — the reproducibility-critical
subset operators of a training-data pipeline.

``df.sample()`` is seed-dependent per-partition (a repartition changes
the sample!). These operators instead key the decision on a hash of the
ROW's own key columns, so membership is a pure function of the data:
stable across runs, partitionings, engines, and cluster sizes — and
therefore checkable against a SQL oracle.

Mechanics: take the first ``HEX_DIGITS`` hex chars of md5(key) and
compare lexicographically against a threshold string (lowercase hex
ordering == numeric ordering). Granularity is 16^-HEX_DIGITS (~1.5e-5);
md5 hex is bit-identical in every engine, unlike xxhash64 seeds.

Scale notes: pure map-side projections — no shuffle, no RNG state, no
driver coordination; they compose with scans at 100 TB like any filter
(and push NOTHING down, deliberately: the hash depends on data columns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_DIGITS = 4  # 65536 buckets — granularity of every fraction below


def _bucket(keys: list[str]) -> Column:
    """First HEX_DIGITS hex chars of md5 over the '|'-joined key columns."""
    return F.substring(
        F.md5(F.concat_ws("|", *[F.col(k).cast("string") for k in keys])),
        1,
        HEX_DIGITS,
    )


def _hex_threshold(fraction: float) -> str:
    return format(min(int(fraction * 16**HEX_DIGITS), 16**HEX_DIGITS - 1), f"0{HEX_DIGITS}x")


def bucket_sql(keys: list[str]) -> str:
    """The oracle-side expression mirroring _bucket, for DuckDB."""
    joined = " || '|' || ".join(f"CAST({k} AS VARCHAR)" for k in keys)
    return f"substr(md5({joined}), 1, {HEX_DIGITS})"


def sample_hash(df: DataFrame, keys: list[str], fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically keyed on ``keys``."""
    return df.filter(_bucket(keys) < F.lit(_hex_threshold(fraction)))


def bucket_fraction(keys: list[str]) -> Column:
    """The row's hash bucket as a fraction in [0,1) — the uniform draw
    that per-row acceptance probabilities compare against."""
    return F.conv(_bucket(keys), 16, 10).cast("double") / F.lit(
        float(16**HEX_DIGITS)
    )


def bucket_fraction_sql(keys: list[str]) -> str:
    """Oracle-side expression mirroring bucket_fraction (DuckDB casts
    '0x'-prefixed hex strings to integers natively)."""
    return f"(('0x' || {bucket_sql(keys)})::INTEGER / {float(16 ** HEX_DIGITS)})"


def weighted_sample_hash(
    df: DataFrame, keys: list[str], weight: Column
) -> DataFrame:
    """Bernoulli sampling with a PER-ROW acceptance probability
    (``weight`` in [0,1], e.g. a quality score): keep the row iff its
    deterministic hash fraction falls below its weight. Same guarantees
    as sample_hash — membership is a pure function of the data, so a
    re-run, a repartition, or another engine selects the identical
    subset. The quality-weighted corpus downsampler."""
    return df.filter(bucket_fraction(keys) < weight)


def split_column(keys: list[str], weights: dict[str, float]) -> Column:
    """Label each row with a split name by hash range — e.g.
    {'train': .8, 'val': .1, 'test': .1}. Ranges are half-open and
    exhaustive (the last split absorbs rounding residue)."""
    b = _bucket(keys)
    names = list(weights)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name]
        cond = b < F.lit(_hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return (expr.otherwise(F.lit(names[-1]))) if expr is not None else F.lit(names[-1])


def split_sql(keys: list[str], weights: dict[str, float]) -> str:
    """Oracle-side CASE expression mirroring split_column."""
    b = bucket_sql(keys)
    names = list(weights)
    cum = 0.0
    whens = []
    for name in names[:-1]:
        cum += weights[name]
        whens.append(f"WHEN {b} < '{_hex_threshold(cum)}' THEN '{name}'")
    return "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"


def stratified_sample_hash(
    df: DataFrame, keys: list[str], strata_col: str, fractions: dict[str, float], default: float = 1.0
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    (e.g. downweight crawl data, keep all curated data)."""
    b = _bucket(keys)
    thr = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        lit = F.lit(_hex_threshold(frac))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr = thr.otherwise(F.lit(_hex_threshold(default))) if thr is not None else F.lit(_hex_threshold(default))
    return df.filter(b < thr)


def interleave_mix(
    df: DataFrame,
    keys: list[str],
    strata_col: str,
    fractions: dict[str, float],
    default: float = 1.0,
    pos_col: str = "mix_pos",
) -> DataFrame:
    """Deterministic corpus interleave: per-stratum downsampling to the
    target mix PLUS a reproducible global shuffle position, so consumers
    reading in ``pos_col`` order see the strata interleaved, not in
    source-order blocks (the thing that wrecks training curves).

    The position hash is salted ('mix|' prefix) so it is independent of
    the md5 used for the keep/drop decision — otherwise kept rows would
    cluster in the low end of the position space.
    """
    kept = stratified_sample_hash(df, keys, strata_col, fractions, default)
    pos = F.md5(
        F.concat_ws("|", F.lit("mix"), *[F.col(k).cast("string") for k in keys])
    )
    return kept.withColumn(pos_col, pos)


def sample_exact_k(df: DataFrame, keys: list[str], k: int) -> DataFrame:
    """EXACTLY k rows, deterministically: order by the row's own key hash
    and take the first k. ``sample_hash`` gives a binomial count around
    fraction·N; this is the "give me exactly N eval docs" path. Compiles
    to TakeOrderedAndProject — per-partition heaps of size k + a driver
    merge, never a global sort — so it scales to any corpus while
    remaining a pure function of the keys (partitioning-independent,
    rerun-stable, and expressible in the DuckDB oracle)."""
    return df.orderBy(_bucket(keys), *keys).limit(k)


def sample_stratified_k(df: DataFrame, strata: list[str], keys: list[str],
                        k: int) -> DataFrame:
    """EXACTLY k rows per stratum (fewer if the stratum is smaller),
    deterministically: rank rows within each stratum by their own hash
    and keep the first k. The fixed-size-per-group draw of eval-set
    construction ("200 docs per language"), where proportional sampling
    would starve rare strata.

    Scale shape: one shuffle on the strata columns, then a per-group
    sort bounded by group size. Unlike the global exact-k (TakeOrdered),
    per-group top-k in Spark is a ranking window — the sort is
    per-partition-group, never global, so it scales with the largest
    stratum, not the table. Partition-invariant and rerun-stable for
    the same reason every operator here is: the rank key is a pure
    function of the row."""
    from pyspark.sql import Window

    w = Window.partitionBy(*strata).orderBy(_bucket(keys), *keys)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def weighted_key(keys: list[str], weight: Column) -> Column:
    """The Efraimidis–Spirakis A-Res key u^(1/w): u is the row's own
    deterministic hash uniform (offset +0.5 so u ∈ (0,1) strictly — no
    pow(0,·) sink), w the row's weight. Taking the k LARGEST keys yields
    a weighted sample without replacement where selection probability is
    proportional to w, yet membership stays a pure function of the data.

    Rounded to 9 decimals so the DuckDB oracle (glibc pow) and Spark
    (Math.pow) cannot disagree by an ulp across the top-k boundary."""
    u = (F.conv(_bucket(keys), 16, 10).cast("double") + F.lit(0.5)) / F.lit(
        float(16**HEX_DIGITS)
    )
    return F.round(F.pow(u, F.lit(1.0) / weight), 9)


def weighted_key_sql(keys: list[str], weight_sql: str) -> str:
    """Oracle-side expression mirroring weighted_key."""
    u = f"((('0x' || {bucket_sql(keys)})::INTEGER + 0.5) / {float(16 ** HEX_DIGITS)})"
    return f"ROUND(POW({u}, 1.0 / ({weight_sql})), 9)"


def sample_weighted_k(
    df: DataFrame, keys: list[str], weight: Column, k: int
) -> DataFrame:
    """EXACTLY k rows drawn without replacement with probability ∝
    ``weight`` (quality-weighted corpus selection: high-quality docs much
    likelier to survive, low-quality ones still reachable). Same
    execution shape as sample_exact_k — TakeOrderedAndProject, size-k
    per-partition heaps, no global sort — so it holds at any corpus size.
    Rows with weight <= 0 are excluded up front."""
    score = weighted_key(keys, weight)
    return (
        df.filter(weight > 0)
        .orderBy(score.desc(), *keys)
        .limit(k)
    )


def token_budget_rates(
    df: DataFrame, source_col: str, token_count: Column, budgets: dict[str, float]
) -> dict[str, float]:
    """Per-source acceptance rates that hit a token budget in
    expectation: rate_s = min(1, budget_s / total_tokens_s). One
    partial-agg pass; the totals frame is sources-sized (metadata), so
    collecting it is free at any corpus scale. Sources absent from
    ``budgets`` get rate 0 (excluded from the mix)."""
    totals = {
        r["s"]: r["t"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.sum(token_count).alias("t"))
        .collect()
    }
    # zero-token source: its docs cost nothing against the budget, so a
    # funded source accepts everything (rate 1.0) and an unfunded one is
    # excluded — mirrored exactly in the q_token_budget_mix oracle (a
    # bare budget/0 would be inf in DuckDB but 'else 0.0' here: divergent)
    return {
        s: (
            min(1.0, budgets.get(s, 0.0) / t)
            if t
            else (1.0 if budgets.get(s, 0.0) > 0 else 0.0)
        )
        for s, t in sorted(totals.items())
    }


def token_budget_mix(
    df: DataFrame,
    keys: list[str],
    source_col: str,
    token_count: Column,
    budgets: dict[str, float],
    rates: dict[str, float] | None = None,
) -> DataFrame:
    """The data-recipe sampler every pretraining corpus build runs: draw
    a deterministic subset whose per-source token mass matches a target
    mixture IN EXPECTATION. Composition of the existing primitives —
    rates from token_budget_rates, membership via the md5 hash fraction
    (partition-invariant, engine-independent, re-runnable) — so the
    whole mix is reproducible from (data, budgets) alone."""
    # pass precomputed ``rates`` when the caller needs them too — the
    # stats pass over ``df`` (often a CPU-heavy tokenization plan) then
    # runs once, not once here and once at the call site
    if rates is None:
        rates = token_budget_rates(df, source_col, token_count, budgets)
    rate_col = F.create_map(
        *[x for s, r in rates.items() for x in (F.lit(s), F.lit(r))]
    )[F.col(source_col)]
    return df.filter(bucket_fraction(keys) < rate_col)
