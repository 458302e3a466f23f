"""Stream-static and stream-stream joins — the two Structured
Streaming join families the event pipelines need beyond windowed
aggregation (SURVEY.md §2.10; the reference's batch equivalent is the
enrich-join cadence of its monthly apps, e.g. the listings⋈hosts
union-enrich in ``apps/process_listings_hosts.py`` rerun per backfill
month).

Both shapes keep the batch/streaming duality the rest of the engine
relies on: the same joins run on static frames (oracle-checkable) and
on ``readStream`` sources with watermarks (state-bounded). The batch
analog of the interval join is last-touch attribution — cataloged as
``e_interval_attribution`` with a DuckDB oracle.

Scale notes:

- **Stream-static**: the static side reloads per micro-batch and
  joins under whatever strategy Catalyst picks — broadcast for a
  dim-sized table (the only sane choice on a cluster: the stream side
  never re-shuffles), shuffle hash otherwise.
- **Stream-stream**: both sides buffer in state keyed by the join
  key; the event-time range condition + watermarks bound how long a
  buffered row can wait for a match, so state is O(rate × lag), not
  O(history). Without the time bound Spark rejects the join outright
  in append mode — the API enforces the 100 TB discipline.
- The equality key (``user_id``) is the shuffle key; a hot user skews
  a state partition the same way it skews a batch join — AQE skew
  handling does not apply inside streaming state, so pre-salt a known
  pathological key upstream if one exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.streaming.events import (
    EVENTS_SCHEMA,
)


def enrich_with_static(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrich: join a (possibly streaming) event frame
    against a static dimension on ``key``. Works identically on a
    static left side — the form the catalog oracle-checks via the
    batch join family (J1's broadcast FK enrich is the same plan).

    The static side is re-evaluated every micro-batch, so a dim table
    backed by a warehouse path picks up slowly-changing updates
    between batches without restarting the query."""
    return stream.join(F.broadcast(dim), key, how)


def interval_join_pairs(
    left: DataFrame,
    right: DataFrame,
    lag: str = "30 minutes",
    key: str = "user_id",
) -> DataFrame:
    """All (left, right) pairs with equal ``key`` where ``right.ts``
    falls in ``(left.ts - lag, left.ts]`` — the canonical event-time
    interval join (click ⋈ preceding view). Column names must not
    collide: callers alias before joining. Works on two streaming
    frames (with watermarks set) and on static frames identically."""
    return left.join(
        right,
        on=[
            F.col(key) == F.col(f"r_{key}"),
            F.col("r_ts") <= F.col("ts"),
            F.col("r_ts") > F.col("ts") - F.expr(f"INTERVAL {lag}"),
        ],
    )


def attribute_last_touch(
    events: DataFrame,
    lag: str = "30 minutes",
    touch_type: str = "view",
    convert_type: str = "click",
) -> DataFrame:
    """Last-touch attribution over a single event log: each
    ``convert_type`` event (click) joins every ``touch_type`` event
    (view) by the same user within ``lag`` before it, keeping the most
    recent touch. Returns one row per attributed conversion:
    (click_id, user_id, click_ts, attributed_view_ts, n_candidate_views).

    This is the batch analog of :func:`stream_interval_join` — same
    join condition, plus the per-conversion argmax the streaming form
    leaves to a downstream aggregation. Conversions with no in-window
    touch drop (inner join): attribution only claims what it can
    explain.

    Plan: one shuffle on ``user_id`` for the equality key (the range
    condition rides along as a join filter), then a groupBy on the
    conversion id — slim (ids + timestamps) all the way, no payload
    columns through the pair blowup."""
    clicks = events.filter(F.col("event_type") == convert_type).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts"),
    )
    views = events.filter(F.col("event_type") == touch_type).select(
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
    )
    return (
        interval_join_pairs(clicks, views, lag=lag)
        .groupBy("click_id", "user_id", "ts")
        .agg(
            F.max("r_ts").alias("attributed_view_ts"),
            F.count("*").alias("n_candidate_views"),
        )
        .select(
            "click_id",
            "user_id",
            F.col("ts").alias("click_ts"),
            "attributed_view_ts",
            "n_candidate_views",
        )
    )


# ---- true streaming entry points (file source; tests drive them to a
# ----  memory sink with trigger availableNow) -----------------------


def stream_static_enrich(
    spark: SparkSession,
    source_dir: str,
    dim: DataFrame,
    key: str = "user_id",
) -> DataFrame:
    """readStream(parquet events) → broadcast-join a static dimension.
    Unstarted; callers pick sink/trigger (append mode — row-wise)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(source_dir)
    )
    return enrich_with_static(stream, dim, key=key)


def stream_interval_join(
    spark: SparkSession,
    source_dir: str,
    lag: str = "30 minutes",
    watermark: str = "1 hour",
    touch_type: str = "view",
    convert_type: str = "click",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream-stream interval join: clicks ⋈ preceding views within
    ``lag``, both sides watermarked so buffered state evicts once no
    in-window partner can still arrive. Emits every in-window pair
    (append mode); the last-touch argmax is a downstream aggregation
    (in batch: :func:`attribute_last_touch`).

    State bound: a view is held for ``watermark + lag`` of event time,
    a click for ``watermark`` — both sides O(rate × horizon). Rows
    arriving with event time already below the watermark are DROPPED
    at the source (the eviction contract the state bound rests on;
    asserted in tests via ``max_files_per_trigger=1`` micro-batch
    sequencing)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    src = reader.load(source_dir)
    clicks = (
        src.filter(F.col("event_type") == convert_type)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts"),
        )
        .withWatermark("ts", watermark)
    )
    views = (
        src.filter(F.col("event_type") == touch_type)
        .select(
            F.col("user_id").alias("r_user_id"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
    )
    return interval_join_pairs(clicks, views, lag=lag).select(
        "click_id", "user_id", "ts", F.col("r_ts").alias("view_ts")
    )
