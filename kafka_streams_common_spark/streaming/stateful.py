"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the Spark-side shape for per-key state the built-in aggregations can't
express (session state machines, per-key counters with emission policies,
enrichment caches).

``running_counter`` is the demonstration operator: a per-key cumulative
event counter whose state survives across microbatches. The structure —
state schema, GroupState get/update, Arrow-batched group iteration — is the
production pattern; the body is where domain logic goes.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("total", T.LongType()),
    ]
)
_STATE_SCHEMA = T.StructType([T.StructField("total", T.LongType())])


def running_counter(grouped_stream: DataFrame, key_col: str) -> DataFrame:
    """Per-key cumulative row counter over a stream.

    Emits one ``(key, total)`` row per key per microbatch in which the key
    appears; ``total`` is cumulative across the whole stream (kept in
    GroupState, the RocksDB-backed state-store analog of a Kafka Streams
    ``transformValues`` with a KeyValueStore).
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (total,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"key": [str(key[0])], "total": [total]})

    return grouped_stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
