"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.13): per-series online running statistics — the streaming
form of the W4 rolling-volatility / A1 moment operators, and the state
pattern an online G6/G7 generator would use.

State per event_type: Welford (n, mean, M2) + EWMA of squared deltas.
Bounded: O(1) per key, keys bounded by distinct event types; timeouts
off (aggregation state, not session state).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),
        T.StructField("ewma_var", T.DoubleType()),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("std", T.DoubleType()),
        T.StructField("ewma_vol", T.DoubleType()),
    ]
)


def stream_running_stats(events: DataFrame, alpha: float = 0.06) -> DataFrame:
    """groupBy(event_type).applyInPandasWithState — emits one updated
    stats row per key per micro-batch. Welford merge is exact across
    batches; EWMA variance uses the batch's values in event order."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, mean, m2, ewma = state.get
        else:
            n, mean, m2, ewma = 0, 0.0, 0.0, 0.0
        for pdf in pdfs:
            for v in pdf["value"].astype(float):
                n += 1
                d = v - mean
                mean += d / n
                m2 += d * (v - mean)
                ewma = (1 - alpha) * ewma + alpha * d * d
        state.update((n, mean, m2, ewma))
        std = (m2 / (n - 1)) ** 0.5 if n > 1 else 0.0
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n": [n],
                "mean": [mean],
                "std": [std],
                "ewma_vol": [ewma**0.5],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
