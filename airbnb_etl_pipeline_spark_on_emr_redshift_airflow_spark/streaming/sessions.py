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

Both stateful APIs are implemented over one shared batch-merge core:
the classic ``applyInPandasWithState`` form (no optional
dependencies — the portable default) and the Spark 4
``transformWithStateInPandas`` form (named state variables + explicit
event-time timers; its Python worker needs ``google.protobuf``, so
``tws_available()`` gates it at runtime — absent in this container,
present on a typical cluster image). ``sessionize_with_timeout(api=)``
selects; the parameterized test pins that both emit identical
sessions wherever the dependency exists.

Scale notes: state is one fixed-width tuple per live (user) key in
the state store (shuffled on the group key, RocksDB-backed on a real
cluster), dropped at close; the watermark bounds both state lifetime
and timeout latency. Arrow batches in/out as with every
Pandas-grouped op.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
_STATE_SCHEMA = "start_ms bigint, last_ms bigint, n bigint, v double"


def _sessions_frame(key, runs: list[list], gap_ms: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [key] * len(runs),
            "session_start": [pd.Timestamp(r[0], unit="ms") for r in runs],
            "session_end": [
                pd.Timestamp(r[1] + gap_ms, unit="ms") for r in runs
            ],
            "n_events": [r[2] for r in runs],
            "total_value": [r[3] for r in runs],
        }
    )


def _merge_batch_runs(
    pdfs: Iterator[pd.DataFrame], stored: list | None, gap_ms: int
) -> list[list] | None:
    """Shared core of both stateful-API forms: fold a batch of
    (ts, value) frames plus the stored open session into gap-merged
    [start_ms, last_ms, n, total] runs, sorted by start. Returns None
    for an empty batch with nothing stored.

    The batch is split into gap-delimited runs first: a backfill (or a
    watermark-lag window wider than the gap) can legitimately carry
    several distinct sessions for one key in one batch — folding them
    into min(start)/max(last) would silently merge separate sessions
    into one over-long session. Late-within-watermark data may sort
    before the stored session, so the stored run is placed by start
    and coalesced rather than assumed to precede the batch."""
    ts_parts: list[np.ndarray] = []
    val_parts: list[np.ndarray] = []
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        ts_parts.append((pdf["ts"].astype("int64") // 1_000_000).to_numpy())
        val_parts.append(pdf["value"].to_numpy(dtype="float64"))
    if not ts_parts:
        return [list(stored)] if stored is not None else None
    ts_ms = np.concatenate(ts_parts)
    vals = np.concatenate(val_parts)
    order = np.argsort(ts_ms, kind="stable")
    ts_ms, vals = ts_ms[order], vals[order]
    cut = np.flatnonzero(np.diff(ts_ms) > gap_ms) + 1
    runs: list[list] = [
        [int(t[0]), int(t[-1]), int(len(t)), float(v.sum())]
        for t, v in zip(np.split(ts_ms, cut), np.split(vals, cut))
    ]
    if stored is not None:
        runs.append(list(stored))
        runs.sort(key=lambda r: r[0])
    merged: list[list] = [runs[0]]
    for r in runs[1:]:
        prev = merged[-1]
        if r[0] <= prev[1] + gap_ms:
            prev[1] = max(prev[1], r[1])
            prev[2] += r[2]
            prev[3] += r[3]
        else:
            merged.append(r)
    return merged


def _make_session_fn(gap_ms: int):
    def close_sessions(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, last, n, v = state.get
            state.remove()
            yield _sessions_frame(key[0], [[start, last, n, v]], gap_ms)
            return
        merged = _merge_batch_runs(
            pdfs, list(state.get) if state.exists else None, gap_ms
        )
        if merged is None:
            return
        closed = merged[:-1]
        if closed:
            # every non-trailing run is followed by an in-batch event
            # more than `gap` later — the session is already over.
            yield _sessions_frame(key[0], closed, gap_ms)
        start, last, n, v = merged[-1]
        state.update((start, last, n, v))
        # the close timer: fires once the WATERMARK passes last + gap
        state.setTimeoutTimestamp(last + gap_ms)

    return close_sessions


_UNIT_MS = {
    "millisecond": 1, "milliseconds": 1, "ms": 1,
    "second": 1_000, "seconds": 1_000, "sec": 1_000, "secs": 1_000,
    "s": 1_000,
    "minute": 60_000, "minutes": 60_000, "min": 60_000, "mins": 60_000,
    "m": 60_000,
    "hour": 3_600_000, "hours": 3_600_000, "hr": 3_600_000,
    "hrs": 3_600_000, "h": 3_600_000,
    "day": 86_400_000, "days": 86_400_000, "d": 86_400_000,
    "week": 604_800_000, "weeks": 604_800_000, "w": 604_800_000,
}


def _gap_to_ms(gap: str) -> int:
    parts = gap.strip().split()
    if len(parts) != 2 or not parts[0].lstrip("-").isdigit():
        raise ValueError(
            f"invalid interval {gap!r}: expected '<n> <unit>', e.g. "
            "'30 minutes'"
        )
    n, unit = int(parts[0]), parts[1].lower()
    if unit not in _UNIT_MS:
        raise ValueError(
            f"invalid interval unit {parts[1]!r} in {gap!r}: supported "
            f"units are {sorted(set(_UNIT_MS))}"
        )
    if n <= 0:
        raise ValueError(f"invalid interval {gap!r}: must be positive")
    return n * _UNIT_MS[unit]


def tws_available() -> bool:
    """True when Spark 4's ``transformWithStateInPandas`` can actually
    run here: its Python worker serializes state over protobuf, so the
    API surface exists without it but every query fails at runtime."""
    try:
        import google.protobuf  # noqa: F401
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError:
        return False
    return True


def _make_tws_processor(gap_ms: int):
    """The same timeout sessionizer as ``_make_session_fn``, expressed
    in the Spark 4 ``transformWithStateInPandas`` vocabulary: a named
    ValueState variable holds the open run; an explicit EVENT-TIME
    timer (registered at ``last + gap``, the previous timer deleted on
    every update) replaces ``GroupStateTimeout``; timer expiry arrives
    as ``handleExpiredTimer`` instead of ``state.hasTimedOut``. The
    batch-merge core is shared (``_merge_batch_runs``), so both forms
    emit identical sessions — pinned by the parameterized test."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
    )

    class _TimeoutSessionProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._handle = handle
            self._session = handle.getValueState("session", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            stored = (
                list(self._session.get()) if self._session.exists() else None
            )
            merged = _merge_batch_runs(rows, stored, gap_ms)
            if merged is None:
                return
            closed = merged[:-1]
            if closed:
                yield _sessions_frame(key[0], closed, gap_ms)
            start, last, n, v = merged[-1]
            if stored is not None and stored[1] != last:
                # re-arm: TWS timers don't replace on re-register
                self._handle.deleteTimer(int(stored[1]) + gap_ms)
            self._session.update((start, last, n, v))
            self._handle.registerTimer(int(last) + gap_ms)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if not self._session.exists():
                return
            start, last, n, v = self._session.get()
            # a stale timer (superseded by later events) fires before
            # the real close — ignore it, the re-armed timer follows
            if expiredTimerInfo.getExpiryTimeInMs() < int(last) + gap_ms:
                return
            self._session.clear()
            yield _sessions_frame(key[0], [[start, last, n, v]], gap_ms)

        def close(self) -> None:
            pass

    return _TimeoutSessionProcessor()


def sessionize_with_timeout(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    api: str = "auto",
) -> DataFrame:
    """Streaming timeout sessionization: watermarked events grouped
    per user; each CLOSED session emits exactly once, when the
    watermark passes ``last_event + gap`` (session_window semantics:
    end = last event + gap). Append-mode output.

    ``api``: ``"classic"`` = ``applyInPandasWithState`` (runs
    everywhere), ``"tws"`` = Spark 4 ``transformWithStateInPandas``
    (named state + explicit timers; needs ``google.protobuf`` in the
    Python workers), ``"auto"`` = classic, the form with no optional
    dependency — both forms emit identical sessions (parameterized
    test), so auto only needs to pick a portable default."""
    if api not in ("auto", "classic", "tws"):
        raise ValueError(f"sessionize_with_timeout: unknown api {api!r}")
    watermarked = events.withWatermark("ts", watermark).groupBy("user_id")
    if api == "tws":
        if not tws_available():
            raise RuntimeError(
                "transformWithStateInPandas needs google.protobuf in the "
                "Python workers; install it or use api='classic'"
            )
        return watermarked.transformWithStateInPandas(
            statefulProcessor=_make_tws_processor(_gap_to_ms(gap)),
            outputStructType=SESSION_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    return watermarked.applyInPandasWithState(
        _make_session_fn(_gap_to_ms(gap)),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_sessions(
    spark: SparkSession,
    source_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
    api: str = "auto",
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
        api=api,
    )
