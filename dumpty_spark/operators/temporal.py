"""Temporal joins Spark lacks as built-ins: as-of join and range join.

The reference has no row-level temporal operators at all (its only time
logic is the table-level watermark, src/dumpty/main.py:88-100); these are
part of the training-data-pipeline extension surface, composed from
DataFrame ops so Catalyst/AQE still plan them.

Scale design:

* **as-of join** — the textbook formulations (range cross-join, or a
  per-left-row subquery) explode at scale. We use the union-merge trick:
  tag both sides, union them, and run ONE per-key window pass where each
  left row picks up the ``last`` non-null right payload at-or-before its
  timestamp. Cost: one shuffle on the key, a per-key sort — exactly the
  cost of a sort-merge join, with zero row amplification. 100 TB story:
  partitions by join key, no global sort, no broadcast needed, and skewed
  keys are handled by AQE like any other shuffle.
* **range join** — ``l.ts - w <= r.ts < l.ts`` as a raw ϴ-join is a
  cross product per key. We bucket time into window-sized buckets and
  replicate the RIGHT side into each bucket it can serve (exactly 2 for
  a one-window lookback), turning the ϴ-join into an equi-join on
  (key, bucket) + a residual filter. Row amplification is a constant 2×
  on the smaller side instead of O(n²) pairs; the equi-join shuffles and
  AQE-plans normally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_RTS = "__asof_rts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """As-of LEFT join with pandas-merge_asof direction semantics: for
    every left row attach, within the same ``on`` key group,

    - ``backward`` — the right row with the greatest ``right_ts <= left_ts``;
    - ``forward`` — the right row with the smallest ``right_ts >= left_ts``;
    - ``nearest`` — whichever of those two is closer in time (exact tie →
      backward, matching pandas).

    ``tolerance`` (optional) bounds the match distance like pandas: a
    Column-compatible value (e.g. ``F.expr("INTERVAL 1 HOUR")`` for
    timestamps, a number for numeric keys); candidates farther than it
    revert to NULL. NULLs also if no candidate. Right-side payload columns (everything except
    the keys) come back suffixed. Deterministic when (on, right_ts) is
    unique on the right — callers with duplicate timestamps should
    pre-aggregate the right side.

    All three directions are the same union-merge single-window-pass
    shape (one shuffle on the key, no row amplification); ``nearest``
    runs the backward and forward fills over the SAME sorted partition,
    so it costs one extra window function, not an extra shuffle.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if isinstance(tolerance, (int, float)) and tolerance <= 0:
        raise ValueError("tolerance must be positive (pandas parity)")
    r_payload = [c for c in right.columns if c not in on]
    l_cols = [c for c in left.columns if c not in on]

    # The entire right ROW travels as ONE struct (timestamp + payload):
    # the window fill then picks whole rows, never mixing columns from
    # different right rows — per-column ignorenulls fills would skip a
    # NULL payload value and splice in an older row's value (and defeat
    # the tolerance check, which must bound the row the payload came
    # from).
    pkg_expr = F.struct(
        F.col(right_ts).alias(_RTS),
        *[F.col(c).alias(c) for c in r_payload],
    )
    pkg_type = right.select(pkg_expr.alias("p")).schema["p"].dataType

    r = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        pkg_expr.alias("__pkg"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.lit(None).cast(pkg_type).alias("__pkg"),
        *[F.col(c) for c in l_cols],
    )
    u = r.unionByName(l)

    # Equal-timestamp handling via the side marker in the sort order:
    # backward (inclusive) wants the right row BEFORE the left row, the
    # standalone forward (inclusive) wants it AFTER. ``nearest`` uses the
    # backward ordering for both windows — an exact tie is then seen only
    # by the backward fill, which is exactly the pandas tie rule.
    tie_desc = direction in ("backward", "nearest")
    order = [F.col(_TS).asc(), F.col(_SIDE).desc() if tie_desc else F.col(_SIDE).asc()]
    wb = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    pkg_back = F.last("__pkg", ignorenulls=True).over(wb)
    pkg_fwd = F.first("__pkg", ignorenulls=True).over(wf)

    def within(matched_ts):
        if tolerance is None:
            return F.lit(True)
        dist = F.when(
            matched_ts <= F.col(_TS), F.col(_TS) - matched_ts
        ).otherwise(matched_ts - F.col(_TS))
        return dist <= tolerance

    if direction == "backward":
        chosen = pkg_back
    elif direction == "forward":
        chosen = pkg_fwd
    else:
        use_back = pkg_fwd.isNull() | (
            pkg_back.isNotNull()
            & (
                (F.col(_TS) - pkg_back[_RTS])
                <= (pkg_fwd[_RTS] - F.col(_TS))
            )
        )
        chosen = F.when(use_back, pkg_back).otherwise(pkg_fwd)

    chosen = F.when(within(chosen[_RTS]), chosen)
    fills = [chosen[c].alias(c + suffix) for c in r_payload]

    filled = u.select(
        *on,
        _SIDE,
        *[F.col(c) for c in l_cols],
        *fills,
    )
    return filled.filter(F.col(_SIDE) == 0).drop(_SIDE)


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    window_s: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    count_col: str = "n_in_range",
) -> DataFrame:
    """For every left row, count right rows with
    ``left_ts - window_s <= right_ts < left_ts`` in the same key group
    (strict lookback: the left instant itself is excluded).

    Equi-join on (key, time-bucket) with the right side replicated into
    the two buckets it can serve; the exact range is a residual filter.
    """
    bucket = lambda c: F.floor(F.unix_timestamp(c) / F.lit(window_s))  # noqa: E731

    l = left.withColumn("__b", bucket(F.col(left_ts)))
    r = (
        right.select(*on, F.col(right_ts).alias("__rts"))
        .withColumn("__b0", bucket(F.col("__rts")))
        .withColumn("__b", F.explode(F.array(F.col("__b0"), F.col("__b0") + 1)))
        .drop("__b0")
    )
    joined = l.join(r, on=[*on, "__b"], how="left").withColumn(
        "__hit",
        (
            F.col("__rts").isNotNull()
            & (F.col("__rts") >= F.col(left_ts) - F.expr(f"INTERVAL {window_s} SECOND"))
            & (F.col("__rts") < F.col(left_ts))
        ).cast("long"),
    )
    return (
        joined.groupBy(*[F.col(c) for c in left.columns])
        .agg(F.sum("__hit").alias(count_col))
        .drop("__b")
    )


def resample_ffill(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    interval: str = "1 hour",
) -> DataFrame:
    """Time-series resample + forward fill: bucket ``ts`` to ``interval``
    grains, sum ``value`` per (key, bucket), then densify each key's
    series over its own [min, max] bucket span — missing grains appear
    with the last observed value carried forward and ``is_gap = 1``.

    The gap-filling primitive of feature pipelines (the reference never
    densifies — its incrementality is table-level, SURVEY §2.7 I1-I3;
    this is the row-level analog on the events fixture).

    Shape at scale: the aggregation is a partial-agg shuffle on
    (key, bucket); the grid is built from per-key min/max (tiny) and
    exploded map-side; the fill is a per-key window — bounded state as
    long as keys outnumber executors. For few huge keys, re-window by
    (key, coarser-era) and stitch era boundaries.
    """
    trunc_unit = interval.split()[-1].rstrip("s")
    hourly = df.groupBy(
        F.col(key), F.date_trunc(trunc_unit, F.col(ts)).alias("bucket_ts")
    ).agg(F.round(F.sum(value), 6).alias("__v"))
    grid = (
        hourly.groupBy(key)
        .agg(F.min("bucket_ts").alias("__mn"), F.max("bucket_ts").alias("__mx"))
        .select(
            key,
            F.explode(
                F.sequence("__mn", "__mx", F.expr(f"INTERVAL {interval}"))
            ).alias("bucket_ts"),
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.join(hourly, [key, "bucket_ts"], "left").select(
        F.col(key),
        F.col("bucket_ts"),
        F.last("__v", ignorenulls=True).over(w).alias("value_filled"),
        F.col("__v").isNull().cast("int").alias("is_gap"),
    )
