"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only state is the batch union+dedup merge; this module
supplies the genuinely-streaming form: arbitrary per-key state carried
across micro-batches (the Structured Streaming primitive for operators
the built-in aggregations can't express — running counters, custom
sessionization, CDC-style accumulators).

Scale notes: state lives in the state store partitioned by the group
key (one shuffle on ``user_id``); Arrow batches in/out, so the Python
worker cost is per-batch, not per-row. Watermark + timeout bound state
growth in production; tests use NoTimeout with availableNow triggers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, v double"


def _accumulate(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user running totals: count + value sum carried in state
    across micro-batches; emits the updated running total once per
    batch in which the key appears."""
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += int(len(pdf))
        v += float(pdf["value"].sum())
    state.update((n, v))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [v]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful per-user running totals over a streaming events frame.

    Output mode must be ``update``; each micro-batch emits the
    cumulative (n_events, total_value) for every user seen in that
    batch — state persists in the checkpointed state store, so a
    restarted query continues the count instead of restarting it.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_running_totals(spark, source_dir: str) -> DataFrame:
    """readStream(parquet events) → stateful running totals."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.events import (
        EVENTS_SCHEMA,
    )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(source_dir)
    )
    return running_user_totals(stream)
