"""Arbitrary stateful streaming (SURVEY §2.9 `stream_stateful_counter`).

`applyInPandasWithState`: per-key user state carried across
micro-batches — the escape hatch when windowed/agg built-ins can't
express the logic (custom counters, ML feature state, CDC merge).

Scale notes: state lives in the executor state store partitioned by
key (one shuffle on the key per micro-batch); a processing-time
timeout evicts idle keys so state stays bounded. Keep per-key state
small (here: two numbers).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_counter(
    key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_counter(ev: DataFrame) -> DataFrame:
    """Per-user running (count, total value) emitted each micro-batch.
    Batch-equivalent final state: groupBy(user_id).agg(count, sum) —
    the equivalence is asserted under replay in tests/test_streaming.py.
    """
    return ev.groupBy("user_id").applyInPandasWithState(
        _update_counter,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TWS_OUTPUT_SCHEMA = "user_id long, n_events long, max_value double"


def _lazy_processor():
    """StatefulProcessor subclass built lazily (the class body touches
    streaming internals; keep import-time side effects out of batch-only
    paths)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningUserStats(StatefulProcessor):
        """Per-user running (count, max value) on the Spark 4
        transformWithState API: typed ValueState, Update output mode."""

        def init(self, handle) -> None:
            self._state = handle.getValueState("stats", "n long, mx double")

        def handleInputRows(self, key, rows, timerValues):
            got = self._state.get()
            n, mx = got if got is not None else (0, float("-inf"))
            for pdf in rows:
                n += len(pdf)
                batch_max = float(pdf["value"].max())
                if batch_max > mx:
                    mx = batch_max
            self._state.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    return RunningUserStats()


def running_user_stats_tws(ev: DataFrame) -> DataFrame:
    """Per-user running (count, max) via ``transformWithStateInPandas``
    — the Spark 4 arbitrary-state API (typed state variables, timers,
    TTL) that supersedes applyInPandasWithState. Same scale shape: one
    shuffle on the key per micro-batch, state-store-resident per-key
    state, idle keys evictable via TTL. Batch-equivalent final state:
    groupBy(user_id).agg(count, max) — the replay-equivalence test in
    tests/test_streaming.py runs where protobuf is available (the API's
    state-server protocol needs google.protobuf; absent there, the test
    skips with the reason and applyInPandasWithState remains the
    exercised stateful path)."""
    return ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_lazy_processor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
