"""Timeout-closed sessionization: arbitrary per-key state plus an
EVENT-TIME TIMEOUT (``applyInPandasWithState`` with
``GroupStateTimeout.EventTimeTimeout``) — emission when time passes,
not only when a key receives data.

``session_window`` (streaming/events.py) already sessionizes
declaratively; this operator exists for the semantics the built-in
can't express: emit the CLOSED session exactly once, when the
event-time watermark passes ``last_event + gap`` — the shape of
"session ended" side effects (billing a visit, flushing a
conversation transcript to the training corpus). A key with no
further events still closes — that is precisely what the timeout
buys: the callback fires with ``state.hasTimedOut`` and an empty
row iterator.

(Spark 4.x's ``transformWithStateInPandas`` — named state variables
+ explicit timers — expresses the same operator; its Python worker
needs ``google.protobuf``, absent in this container, so the engine
ships the equally-capable classic-API form.)

Scale notes: state is one fixed-width tuple per live (user) key in
the state store (shuffled on the group key, RocksDB-backed on a real
cluster), dropped at close; the watermark bounds both state lifetime
and timeout latency. Arrow batches in/out as with every
Pandas-grouped op.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
_STATE_SCHEMA = "start_ms bigint, last_ms bigint, n bigint, v double"


def _make_session_fn(gap_ms: int):
    def close_sessions(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, last, n, v = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(last + gap_ms, unit="ms")],
                    "n_events": [n],
                    "total_value": [v],
                }
            )
            return
        n = 0
        v = 0.0
        lo_ms: int | None = None
        hi_ms: int | None = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
            n += int(len(pdf))
            v += float(pdf["value"].sum())
            b_lo, b_hi = int(ts_ms.min()), int(ts_ms.max())
            lo_ms = b_lo if lo_ms is None else min(lo_ms, b_lo)
            hi_ms = b_hi if hi_ms is None else max(hi_ms, b_hi)
        if n == 0:
            return
        if state.exists:
            start, last, pn, pv = state.get
            start, last, n, v = (
                min(start, lo_ms), max(last, hi_ms), pn + n, pv + v,
            )
        else:
            start, last = lo_ms, hi_ms
        state.update((start, last, n, v))
        # the close timer: fires once the WATERMARK passes last + gap
        state.setTimeoutTimestamp(last + gap_ms)

    return close_sessions


def _gap_to_ms(gap: str) -> int:
    n, unit = gap.split()
    return int(n) * {
        "seconds": 1_000, "second": 1_000,
        "minutes": 60_000, "minute": 60_000,
        "hours": 3_600_000, "hour": 3_600_000,
    }[unit]


def sessionize_with_timeout(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming timeout sessionization: watermarked events grouped
    per user; each CLOSED session emits exactly once, when the
    watermark passes ``last_event + gap`` (session_window semantics:
    end = last event + gap). Append-mode output."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(_gap_to_ms(gap)),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_sessions(
    spark: SparkSession,
    source_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream(parquet events) → timeout sessionization."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.events import (
        EVENTS_SCHEMA,
    )

    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return sessionize_with_timeout(
        reader.load(source_dir).select("user_id", "ts", "value"),
        gap=gap,
        watermark=watermark,
    )
