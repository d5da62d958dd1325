"""Custom stateful streaming operator (SURVEY §2.7 DELEG:
applyInPandasWithState) — a per-user running aggregate with event-time
timeout, the shape every custom sessionizer/accumulator takes.

State is one row per user_id (partitioned by the grouping key); the
pandas batches arrive Arrow-encoded. At scale, state-store size is
bounded by (active keys × state row), and the timeout reaps idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n long, total double, last_ts timestamp"


def _accumulate(
    prior: tuple | None, pdfs: Iterator[pd.DataFrame]
) -> tuple[int, float, Any]:
    """Fold a sequence of pandas batches into the running (count, sum,
    last-seen) triple — the ONE aggregation rule both the
    applyInPandasWithState and transformWithStateInPandas operators run,
    so the two paths cannot drift apart."""
    n, total, last_ts = prior if prior is not None else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max: Any = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    return n, total, last_ts


def _emit_row(user_id, n: int, total: float, last_ts) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "last_ts": [last_ts],
        }
    )


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last_ts = _accumulate(state.get if state.exists else None, pdfs)
    state.update((n, total, last_ts))
    yield _emit_row(user_id, n, total, last_ts)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum, last-seen) via
    applyInPandasWithState; emit one updated row per user per batch."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


try:  # Spark >= 4.0 typed-state API
    from pyspark.sql.streaming import StatefulProcessor
except ImportError:  # pragma: no cover — older Spark
    StatefulProcessor = object  # type: ignore[assignment,misc]


class UserTotalsProcessor(StatefulProcessor):
    """transformWithStateInPandas processor: same per-user running totals
    as ``running_user_totals`` but on Spark 4's typed-state API —
    ValueState instead of a packed tuple, explicit init/close lifecycle,
    and (at scale) the RocksDB state-store backend with changelog
    checkpointing. New pipelines should start here; the
    applyInPandasWithState variant above is kept as the widely-deployed
    predecessor shape. (Module-level class: the processor is pickled to
    the state driver worker, so it must be importable.)"""

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "totals", "n long, total double, last_ts timestamp"
        )

    def handleInputRows(self, key, rows, timerValues):
        prior = self._state.get() if self._state.exists() else None
        n, total, last_ts = _accumulate(prior, rows)
        self._state.update((n, total, last_ts))
        yield _emit_row(key[0], n, total, last_ts)

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals via transformWithStateInPandas
    (Spark 4 typed-state API). Output equals running_user_totals.

    Requires (a) the RocksDB state-store provider
    (``spark.sql.streaming.stateStore.providerClass``) and (b)
    ``google.protobuf`` for the JVM↔Python state protocol — absent in
    minimal environments, so the test is importorskip-gated and
    ``running_user_totals`` remains the runs-everywhere path."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
