"""The unified TABLE facade over the lakehouse layers — one handle
that composes what ``sources.optimize`` (versioned snapshots + pointer),
``sources.skipping`` (zone/bloom manifests), and ``sources.deletes``
(op-tagged change batches) each do separately, so a caller no longer
needs to know which layers a table has or in which order they fold
(everything ``examples/lakehouse.py`` previously wired by hand).

Layout under one ``root``::

    root/TABLE                 table config (key column, indexed cols)
    root/live/batch=K/         appended data batches (atomic claims)
    root/zones, root/bloom     skipping manifests over the live dir,
                               reconciled O(batch) on every append
    root/changes/batch=K/      THE mutation log: op-tagged upsert /
                               delete rows (``Table.delete`` writes
                               delete ops here — one log, one total
                               order; no separate tombstone sidecar
                               to race with)
    root/v=N/{data,zones,bloom,FOLDED,_SUCCESS}, root/LATEST
                               optimized snapshots + version pointer
                               (``sources.optimize`` unchanged)

**The watermark contract** makes the whole thing crash-safe without
ever double-counting: ``optimize()`` folds the live batches and change
batches it SAW into a fresh version and records their high-water marks
in ``v=N/FOLDED`` (written before the ``_SUCCESS`` marker — a version
is never committed without it). ``read()`` then serves

    CDC( v_data  ∪  live batches > live_wm ,  changes > changes_wm )

so folded batches are INVISIBLE through the new version the moment the
pointer flips, whether or not the subsequent vacuum ever ran — a crash
between commit and vacuum costs disk, never correctness. Batches that
land DURING an optimize stay above the recorded watermarks and remain
visible. Replayed pipeline periods that rewrite their pinned batch ids
(the ledger replay discipline) converge for the same reason: a
re-written batch at-or-below the watermark is already materialized.

**The filter-under-CDC law is applied internally**:
``read(range_predicates=..., in_predicates=...)`` prunes the bulk
through the version's manifests, prunes the live tail through the
live manifests (both metadata-plane, keep-sets intersect), folds the
un-materialized changes, and then RE-APPLIES every predicate — so
``read(preds)`` ≡ ``read().filter(preds)`` always (pinned in tests),
with the predicates also driving file skipping wherever an index
covers them. Filters the indexes don't cover are simply residual.

100 TB shape: appends, deletes, upserts are O(batch) sidecar writes;
reads plan only manifest-surviving files plus the (bounded, recently
appended) live tail; the CDC fold is change-sized; ``optimize()`` is
the deliberate periodic rewrite that resets the tail to empty and the
fold to a no-op. Readers never coordinate.

**CONCURRENCY (round 12 — optimistic commits, per verb).** At 100 TB
parallel ingest jobs and a compactor racing a writer are the norm;
the facade owns its serialization (the reference externalized it to
Airflow ``max_active_runs=1`` — ``airbnb-etl-airflow.py``) with two
compare-and-swap chains built on the atomic-exclusive-create claim
primitive (``fsutil.create_exclusive``):

- ``append`` — LOCK-FREE on the data plane. Batch numbers are atomic
  claims; blind inserts commute, so N concurrent appenders just land
  N batches. Racing an ``optimize`` is safe by the watermark
  contract: a batch claimed during a fold allocates above the fold's
  watermark and stays served; ``vacuum_live`` only retires batches a
  pointed version materialized. The live MANIFEST reconciliation is
  best-effort under concurrency: a racing vacuum is healed by the
  bounded retry inside :meth:`reconcile_live_manifests`, and
  concurrent appenders overwrite last-writer-wins-to-full-listing —
  the one bad interleaving (last writer listed before an earlier
  batch committed) leaves a LAGGING manifest that pruned reads
  detect fail-closed; one ``reconcile_live_manifests()`` call heals.
- ``upsert`` / ``delete`` / ``write_changes`` — LOCK-FREE, LOG-
  ORDERED. Blind writes whose semantics don't read state: claims
  give each a distinct batch number and the change log's replay
  order (batch number) is the serialization. Same-key concurrent
  blind writes resolve last-batch-wins — deterministic once landed.
- ``merge`` / ``update_where`` / ``delete_where`` (conditional DML,
  auto-allocated ids) — SERIALIZED, FAIL-LOUD. Decisions are made
  against the state as-of the change-log head; the commit requires
  the atomic ticket ``changes/__commit_from={head}``, so of two
  writers that decided from the same head exactly one lands and the
  other raises :class:`ConcurrentWriteError` (its decisions are
  stale — lost update/write skew otherwise). A blind batch landing
  inside the decision window is caught by a post-commit gap check
  (the conditional batch withdraws itself); the one undetected
  window is a blind writer slower than the whole conditional commit
  — run blind ingest and conditional corrections in separate
  windows, or pin batch ids.
- ``optimize`` / ``restore`` — SERIALIZED, FAIL-LOUD. The pointer
  flip is a CAS on the pointer value the fold derived from,
  serialized through the atomic ticket ``root/__flip_from={v}``
  (``sources.optimize._cas_flip``): of two concurrent optimizes one
  flips, the other raises :class:`ConcurrentWriteError` with its
  version left committed-but-unpointed (pinnable, never LATEST) —
  never the silent loss where a stale fold's higher number shadows
  the winner whose vacuum already deleted the batches the loser
  never saw. A winner crashing between ticket and flip is completed
  by the next contender from the ticket's recorded target.
- pinned ``batch_id`` writes (streaming / replayed periods) — bypass
  the tickets: the stream engine or pipeline scheduler owns their
  serialization, and replay idempotence requires rewriting the SAME
  number. Don't mix pinned and auto-allocated writers in one window.
- ``evolve`` / ``drop_columns`` / ``create`` (administrative schema &
  index-config verbs) — NOT ticketed: they rewrite table-level
  metadata (``TABLE``/``SCHEMA``) and rebuild manifests whole. Run
  them in a quiesced window, like every production ALTER TABLE; the
  schema cache self-validates against the SCHEMA file's status
  token, so other handles pick the change up on their next access.

Reference scope note: the reference pipeline rewrites whole parquet
snapshots per run (jirfig/Airbnb-ETL apps write full outputs); this
facade is the extension surface a 100 TB training-data pipeline needs
on top — Delta/Iceberg-style table semantics re-expressed over plain
parquet with Spark-first primitives.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources import fsutil
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.deletes import (
    _batches,
    _claim_batch,
    apply_changes,
    read_with_changes,
    table_changes,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
    ConcurrentWriteError,
    read_version_pointer,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import (
    Predicate,
    build_bloom_manifest,
    build_zone_manifest,
    combined_pruned_read,
    list_data_files,
    update_bloom_manifest,
    update_zone_manifest,
)

_CONFIG = "TABLE"
_FOLDED = "FOLDED"
_SCHEMA = "SCHEMA"


class Table:
    """Handle over one facade-managed table root. Construct against
    an existing root (config is read from ``root/TABLE``) or create a
    new one with :meth:`Table.create`."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        if not fsutil.exists(spark, f"{self.root}/{_CONFIG}"):
            raise ValueError(
                f"Table: no config at {self.root}/{_CONFIG} — not a "
                "facade-managed table root (create one with "
                "Table.create)"
            )
        cfg = json.loads(fsutil.read_text(spark, f"{self.root}/{_CONFIG}"))
        # key_col: a single column name OR a composite key (list of
        # names) — the reference faked composite keys with
        # concat(city,'_',date) surrogates (apps/process_reviews.py:111);
        # the facade accepts the real thing. key_cols is the
        # normalized list every internal fold uses.
        self.key_col = cfg["key_col"]
        self.key_cols: list[str] = (
            [self.key_col] if isinstance(self.key_col, str)
            else list(self.key_col)
        )
        self.zone_cols: list[str] = cfg.get("zone_cols") or []
        self.bloom_cols: list[str] = cfg.get("bloom_cols") or []
        self._live = f"{self.root}/live"
        self._changes = f"{self.root}/changes"
        self._zones = f"{self.root}/zones"
        self._bloom = f"{self.root}/bloom"
        self._schema_cache = None
        self._dropped_cache = None
        self._schema_token = None

    # ----- lifecycle ----------------------------------------------------

    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        key_col: str | list[str],
        zone_cols: list[str] | None = None,
        bloom_cols: list[str] | None = None,
    ) -> "Table":
        """Initialize a table root: persist the config (the key —
        one column name or a COMPOSITE key as a list of names — every
        delete/upsert folds on; the columns the zone and bloom
        manifests index). Idempotent for an identical config; raises
        on a conflicting one (silently switching the key column would
        corrupt every later fold)."""
        root = root.rstrip("/")
        if not isinstance(key_col, str):
            key_col = list(key_col)
            if not key_col or len(set(key_col)) != len(key_col):
                raise ValueError(
                    f"Table.create: composite key must be a non-empty "
                    f"list of distinct column names, got {key_col}"
                )
            if len(key_col) == 1:
                key_col = key_col[0]  # ["k"] ≡ "k" — one config form
        cfg = {
            "key_col": key_col,
            "zone_cols": list(zone_cols or []),
            "bloom_cols": list(bloom_cols or []),
        }
        if fsutil.exists(spark, f"{root}/{_CONFIG}"):
            prev = json.loads(fsutil.read_text(spark, f"{root}/{_CONFIG}"))
            if prev != cfg:
                raise ValueError(
                    f"Table.create: {root} already initialized with a "
                    f"different config ({prev} vs {cfg})"
                )
            return Table(spark, root)
        fsutil.mkdirs(spark, root)
        fsutil.write_text_atomic(spark, f"{root}/{_CONFIG}", json.dumps(cfg))
        return Table(spark, root)

    # ----- internal state -----------------------------------------------

    def _pointer(self) -> int | None:
        try:
            return read_version_pointer(self.root, self.spark)
        except Exception:
            return None

    def _watermarks(self, version: int) -> tuple[int, int]:
        """(live_wm, changes_wm) recorded at ``version``'s commit —
        batches at-or-below these are materialized IN the version and
        must not be served again."""
        path = f"{self.root}/v={version}/{_FOLDED}"
        if not fsutil.exists(self.spark, path):
            raise ValueError(
                f"Table: committed v={version} under {self.root} has "
                f"no {_FOLDED} watermark file — this version was not "
                "written through Table.optimize(); reading through it "
                "could double-count folded batches"
            )
        wm = dict(
            line.split("=", 1)
            for line in fsutil.read_text(self.spark, path).split()
            if "=" in line
        )
        return int(wm["live"]), int(wm["changes"])

    def _tail_ids(self, live_wm: int) -> list[int]:
        return [b for b in _batches(self.spark, self._live) if b > live_wm]

    def _version_index_cols(
        self, version: int
    ) -> tuple[set[str], set[str]]:
        """(zone cols, bloom cols) a committed version ACTUALLY
        carries, read from its own manifests — the source of truth
        under layout evolution (the config only describes what the
        NEXT optimize will build). Metadata-plane: one manifest
        schema read + one file-count-sized distinct."""
        vdir = f"{self.root}/v={version}"
        zc: set[str] = set()
        if fsutil.exists(self.spark, f"{vdir}/zones/_SUCCESS"):
            zc = {
                c[: -len("__min")]
                for c in self.spark.read.parquet(f"{vdir}/zones").columns
                if c.endswith("__min")
            }
        bc: set[str] = set()
        if fsutil.exists(self.spark, f"{vdir}/bloom/_SUCCESS"):
            bc = {
                r["col"]
                for r in self.spark.read.parquet(f"{vdir}/bloom")
                .select("col").distinct().collect()
            }
        return zc, bc

    def evolve(
        self,
        zone_cols: list[str] | None = None,
        bloom_cols: list[str] | None = None,
    ) -> None:
        """PARTITION/LAYOUT EVOLUTION: change which columns the table
        Z-orders and indexes BETWEEN versions. Committed versions are
        untouched — each keeps its own manifests, so time-travel pins
        and the currently pointed version keep pruning exactly their
        own layout (``read()`` resolves index coverage per version);
        the change takes full effect at the next :meth:`optimize`.
        The LIVE manifests rebuild from the current tail listing here
        (O(tail) — the tail is the bounded recent slice), so tail
        pruning switches to the new columns immediately. The key
        column can never change (it anchors every fold)."""
        spark = self.spark
        cfg = {
            "key_col": self.key_col,
            "zone_cols": list(
                zone_cols if zone_cols is not None else self.zone_cols
            ),
            "bloom_cols": list(
                bloom_cols if bloom_cols is not None else self.bloom_cols
            ),
        }
        fsutil.write_text_atomic(
            spark, f"{self.root}/{_CONFIG}", json.dumps(cfg)
        )
        self.zone_cols = cfg["zone_cols"]
        self.bloom_cols = cfg["bloom_cols"]
        # live manifests: rebuild whole (the old ones carry the old
        # columns — update_* cannot reconcile across a schema change)
        ids = _batches(spark, self._live)
        for path, cols, builder in (
            (self._zones, self.zone_cols, build_zone_manifest),
            (self._bloom, self.bloom_cols, build_bloom_manifest),
        ):
            fsutil.delete(spark, path)
            if cols and ids:
                # explicit widest schema: a tail batch written before
                # a widening lacks evolved columns on disk — inference
                # could sample it and miss a newly indexed column
                live = spark.read.schema(self._table_schema()).option(
                    "basePath", self._live
                ).parquet(
                    *[f"{self._live}/batch={b}" for b in ids]
                )
                builder(live, cols).localCheckpoint().coalesce(1).write.mode(
                    "overwrite"
                ).parquet(path)
                spark.catalog.refreshByPath(path)

    def _table_schema(self):
        """The CURRENT table schema (StructType) — the WIDEST one
        under schema evolution. Source of truth is the ``SCHEMA``
        file (written on first append and rewritten on every
        ``merge_schema`` widening); tables predating it fall back to
        inferring from the data, exactly the old behavior.

        SELF-VALIDATING per-handle cache (round 12): the cache keys
        on the SCHEMA file's (mtime, length) status token, so a
        SECOND handle widening the schema invalidates every other
        handle's cache on its next access — one FS stat per check,
        no reliance on writer discipline. (The token is best-effort
        at ms granularity: two same-length rewrites inside one
        millisecond could be missed — the same risk class as any
        mtime-based cache, and the widenings it guards are rare,
        human-scale events.)"""
        token = fsutil.status_token(self.spark, f"{self.root}/{_SCHEMA}")
        if (
            self._schema_cache is not None
            and self._schema_token == token
        ):
            return self._schema_cache
        sch, dropped = self._read_schema_file()
        if sch is None:
            sch = self._any_schema().schema
            dropped = {}
        self._schema_cache = sch
        self._dropped_cache = dropped
        self._schema_token = token
        return sch

    def _dropped_types(self) -> dict:
        """name → DataType of columns dropped by :meth:`drop_columns`
        (kept so a later re-add can be type-checked)."""
        self._table_schema()  # populates both caches
        return dict(self._dropped_cache or {})

    def _read_schema_file(self):
        """(StructType | None, dropped dict) from ``root/SCHEMA``.
        Two formats round-trip: the plain StructType json (pre-drop
        files) and ``{"schema": ..., "dropped": {name: typeJson}}``."""
        from pyspark.sql.types import StructType, _parse_datatype_json_value

        p = f"{self.root}/{_SCHEMA}"
        if not fsutil.exists(self.spark, p):
            return None, {}
        raw = json.loads(fsutil.read_text(self.spark, p))
        if isinstance(raw, dict) and "schema" in raw:
            return (
                StructType.fromJson(raw["schema"]),
                {
                    n: _parse_datatype_json_value(t)
                    for n, t in raw.get("dropped", {}).items()
                },
            )
        return StructType.fromJson(raw), {}

    def _write_schema(self, schema, dropped: dict | None = None) -> None:
        if dropped is None:
            # preserve the recorded drops across widenings
            try:
                dropped = self._dropped_types()
            except ValueError:
                dropped = {}
        payload = (
            {"schema": schema.jsonValue(),
             "dropped": {n: t.jsonValue() for n, t in dropped.items()}}
            if dropped
            else schema.jsonValue()
        )
        fsutil.write_text_atomic(
            self.spark, f"{self.root}/{_SCHEMA}", json.dumps(payload)
        )
        self._schema_cache = schema
        self._dropped_cache = dict(dropped)
        self._schema_token = fsutil.status_token(
            self.spark, f"{self.root}/{_SCHEMA}"
        )

    @staticmethod
    def _align(df: DataFrame, schema) -> DataFrame:
        """Project ``df`` to exactly ``schema``'s columns, null-padding
        the ones it lacks (typed) — the read-side half of schema
        evolution. A no-op select when already aligned."""
        have = set(df.columns)
        return df.select(
            *[
                F.col(f.name)
                if f.name in have
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        )

    def _any_schema(self) -> DataFrame:
        """A zero-row frame carrying the table schema (from the
        pointed version if any, else the live dir)."""
        v = self._pointer()
        if v is not None:
            return self.spark.read.parquet(
                f"{self.root}/v={v}/data"
            ).limit(0)
        ids = _batches(self.spark, self._live)
        if not ids:
            raise ValueError(
                f"Table: {self.root} holds no data yet — append first"
            )
        return self.spark.read.option("basePath", self._live).parquet(
            f"{self._live}/batch={ids[0]}"
        ).drop("batch").limit(0)

    # ----- writes ---------------------------------------------------------

    def _evolve_schema_for_write(
        self, df: DataFrame, merge_schema: bool
    ) -> DataFrame:
        """Write-side schema discipline: validate ``df`` against the
        current table schema, widen it (SCHEMA file first) when
        ``merge_schema`` allows, and return ``df`` aligned to the
        (possibly widened) schema. First append just records ``df``'s
        own schema."""
        try:
            cur = self._table_schema()
        except ValueError:
            cur = None  # first append — nothing to reconcile against
        if cur is None:
            self._write_schema(df.schema)
            return df
        by_name = {f.name: f for f in cur.fields}
        extra = [f for f in df.schema.fields if f.name not in by_name]
        clash = [
            (f.name, by_name[f.name].dataType.simpleString(),
             f.dataType.simpleString())
            for f in df.schema.fields
            if f.name in by_name and f.dataType != by_name[f.name].dataType
        ]
        if clash:
            raise ValueError(
                "Table: column type change is not supported "
                f"(schema evolution is additive-only): {clash}"
            )
        missing = [n for n in by_name if n not in set(df.columns)]
        if not merge_schema:
            if extra or missing:
                raise ValueError(
                    "Table: frame schema differs from the table's "
                    f"(new: {[f.name for f in extra]}, missing: "
                    f"{missing}) — pass merge_schema=True to widen "
                    "additively / null-pad"
                )
            return self._align(df, cur)
        missing_keys = [k for k in self.key_cols if k in missing]
        if missing_keys:
            raise ValueError(
                f"Table: frame lacks the key column(s) {missing_keys}"
            )
        from pyspark.sql.types import StructType

        dropped = self._dropped_types()
        for f in extra:
            if f.name in dropped and f.dataType != dropped[f.name]:
                raise ValueError(
                    f"Table: column {f.name!r} was dropped as "
                    f"{dropped[f.name].simpleString()} — re-adding it "
                    f"as {f.dataType.simpleString()} would mis-decode "
                    "files that still carry the old bytes (plain "
                    "parquet has no column-id mapping); re-add with "
                    "the original type"
                )
            dropped.pop(f.name, None)
        new_schema = StructType(list(cur.fields) + list(extra))
        if extra:
            # SCHEMA widens BEFORE data lands: a crash in between
            # leaves an over-wide schema (harmless NULL column),
            # never a wide file a narrow reader would truncate
            self._write_schema(new_schema, dropped)
        return self._align(df, new_schema)

    def drop_columns(self, cols: list[str]) -> None:
        """DROP COLUMNS as a metadata-only narrowing (the other half
        of schema evolution): the columns leave ``root/SCHEMA`` and
        every read aligns to the narrower schema immediately —
        explicit-schema parquet scans simply stop decoding the bytes,
        O(1), nothing rewritten. The next :meth:`optimize`
        materializes the narrow schema physically; committed versions
        keep theirs (time-travel pins still serve the column).

        Dropped names are RECORDED with their types: a later
        ``merge_schema`` re-add must use the identical type (plain
        parquet has no column-id mapping, so a re-typed re-add would
        mis-decode old bytes), and until an optimize has physically
        rewritten the files, re-adding RESURFACES pre-drop values in
        rows that still carry them — the documented plain-parquet
        trade (Delta hides this behind column mapping); re-add AFTER
        an optimize starts from NULLs. The key column and currently
        indexed columns cannot drop (evolve the indexes first)."""
        from pyspark.sql.types import StructType

        cur = self._table_schema()
        missing = [c for c in cols if c not in cur.names]
        if missing:
            raise ValueError(
                f"Table.drop_columns: not in the schema: {missing}"
            )
        key_hits = [c for c in cols if c in self.key_cols]
        if key_hits:
            raise ValueError(
                f"Table.drop_columns: cannot drop key column(s) "
                f"{key_hits}"
            )
        indexed = [
            c for c in cols if c in self.zone_cols or c in self.bloom_cols
        ]
        if indexed:
            raise ValueError(
                f"Table.drop_columns: {indexed} are indexed — "
                "evolve(zone_cols=..., bloom_cols=...) them away first"
            )
        dropped = self._dropped_types()
        by_name = {f.name: f for f in cur.fields}
        for c in cols:
            dropped[c] = by_name[c].dataType
        self._write_schema(
            StructType([f for f in cur.fields if f.name not in cols]),
            dropped,
        )

    def append(
        self,
        df: DataFrame,
        batch_id: int | None = None,
        merge_schema: bool = False,
    ) -> int:
        """Land ``df`` as one live batch (blind INSERT — the
        high-throughput ingest path; replace-or-insert goes through
        :meth:`upsert`) and reconcile the live skipping manifests to
        the new listing, O(batch). Pass ``batch_id`` (≥ 1) to pin the
        batch number — a replayed pipeline period then REWRITES its
        own batch idempotently instead of double-appending.

        SCHEMA EVOLUTION (additive, the Delta ``mergeSchema``
        contract): with ``merge_schema=True``, ``df`` may carry NEW
        columns (the table schema widens — recorded in ``root/SCHEMA``
        BEFORE the data lands, so a crash between the two writes
        costs an over-wide schema, never silently dropped columns on
        read) and/or MISS existing ones (typed-NULL-padded at write).
        Existing columns must keep their type — changing one raises.
        Without the flag, ``df``'s column set must equal the table's
        exactly (a drifted producer fails loudly instead of silently
        null-padding). Rows written before a widening read as NULL in
        the new columns — every read path aligns to the widest schema
        (explicit-schema parquet reads; nothing is rewritten)."""
        if batch_id is not None and batch_id < 1:
            raise ValueError(
                f"Table.append: batch_id must be >= 1, got {batch_id} "
                "(watermarks start at 0 — a batch 0 would be born "
                "invisible)"
            )
        spark = self.spark
        df = self._evolve_schema_for_write(df, merge_schema)
        fsutil.mkdirs(spark, self._live)
        v = self._pointer()
        live_wm = self._watermarks(v)[0] if v is not None else 0
        n = batch_id if batch_id is not None else _claim_batch(
            spark, self._live, floor=live_wm
        )
        df.write.mode("overwrite").parquet(f"{self._live}/batch={n}")
        spark.catalog.refreshByPath(self._live)
        self.reconcile_live_manifests()
        return n

    def reconcile_live_manifests(self, attempts: int = 3) -> None:
        """Reconcile the LIVE zone/bloom manifests to the current
        live-dir listing (O(new files); identical to a from-scratch
        rebuild by ``update_*_manifest``'s contract). Called by every
        :meth:`append`; also the PUBLIC heal verb for the two
        concurrency windows the CONCURRENCY section documents:

        - a concurrent ``vacuum_live`` can delete a folded batch
          between this reconciliation's listing and its stats scan —
          a transient vanished-file task failure. Reconciliation is
          idempotent-to-current-listing, so the bounded RETRY here
          (fresh listing per attempt) heals it.
        - two concurrent appenders overwrite the manifest
          last-writer-wins; each write covers the FULL listing its
          writer saw, so the final manifest only lags if the last
          writer listed before an earlier writer's batch committed.
          A lagging manifest is never silent — pruned reads fail
          CLOSED naming the unindexed files — and one call here
          heals it."""
        spark = self.spark
        ids = _batches(spark, self._live)
        if not ids:
            return  # nothing appended yet (or everything folded)
        sample = f"{self._live}/batch={ids[-1]}"
        last: Exception | None = None
        for _ in range(attempts):
            try:
                self._reconcile_live_manifests_once(sample)
                return
            except Exception as e:  # vanished-file race: re-list, retry
                last = e
                spark.catalog.refreshByPath(self._live)
        raise last  # persistent failure — not the transient race

    def _reconcile_live_manifests_once(self, sample: str) -> None:
        spark = self.spark
        for path, cols, builder, updater in (
            (self._zones, self.zone_cols,
             build_zone_manifest, update_zone_manifest),
            (self._bloom, self.bloom_cols,
             build_bloom_manifest, update_bloom_manifest),
        ):
            if not cols:
                continue
            if fsutil.exists(spark, f"{path}/_SUCCESS"):
                prev = spark.read.parquet(path)
            else:
                prev = builder(
                    spark.read.parquet(sample), cols
                ).limit(0)
            mf = updater(spark, self._live, prev, cols).localCheckpoint()
            mf.coalesce(1).write.mode("overwrite").parquet(path)
            spark.catalog.refreshByPath(path)

    def upsert(self, df: DataFrame, batch_id: int | None = None) -> int:
        """Replace-or-insert by key: lands one op-tagged change batch
        (O(batch) — nothing data-sized is read or rewritten). ``df``
        must carry the full table schema; one row per key per batch
        (enforced by ``apply_changes``)."""
        cols = [f.name for f in self._table_schema().fields]
        ch = df.select(*cols).withColumn("op", F.lit("upsert"))
        return self._apply(ch, batch_id)

    def delete(
        self, keys, batch_id: int | None = None,
        _serialize_from: int | None = None,
    ) -> int:
        """DELETE by key: one op-tagged change batch of delete rows
        (non-key columns NULL) — merge-on-read, O(batch). ``keys`` is
        a DataFrame carrying the key column(s), or a plain list of
        key values (a list of TUPLES for a composite key, in
        ``key_cols`` order). Funnels through the SAME change log as
        upserts, so delete→re-upsert interleavings have one total
        order (no separate tombstone sidecar to race with)."""
        schema = self._table_schema()
        kset = set(self.key_cols)
        if not isinstance(keys, DataFrame):
            by_name = {f.name: f for f in schema}
            ddl = ", ".join(
                f"{k} {by_name[k].dataType.simpleString()}"
                for k in self.key_cols
            )
            rows = [
                tuple(k) if isinstance(k, (tuple, list)) else (k,)
                for k in keys
            ]
            keys = self.spark.createDataFrame(rows, ddl)
        proj = [
            F.col(f.name) if f.name in kset
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema
        ]
        ch = keys.select(proj).withColumn("op", F.lit("delete"))
        return self._apply(ch, batch_id, serialize_from=_serialize_from)

    def write_changes(
        self, changes: DataFrame, op_col: str = "op",
        batch_id: int | None = None,
    ) -> int:
        """Land one op-tagged change batch MIXING upserts and deletes
        (one row per key; delete rows may leave non-key columns NULL)
        — the CDC-ingest form of :meth:`upsert`/:meth:`delete` for
        pipelines that already produce op-tagged rows (e.g. a
        replayed period's combined correction batch, pinned to its
        period id)."""
        cols = [f.name for f in self._table_schema().fields]
        ch = changes.select(*cols, F.col(op_col).alias("op"))
        return self._apply(ch, batch_id)

    def _clause_state(self, batch_id: int | None) -> DataFrame:
        """The table state a CONDITIONAL write (merge / update_where /
        delete_where) evaluates against. A PINNED batch reads the
        state AS OF the batch just below its own id: a crash-replay
        then re-decides from exactly the pre-batch state instead of
        reading its own half-landed change batch back (arithmetic like
        ``v + 1`` would otherwise re-apply on replay). Pinned ids
        at-or-below the fold watermark are invisible through the
        current version whatever they contain, so the plain read
        serves those (the append-replay convergence discipline)."""
        if batch_id is not None:
            v = self._pointer()
            ch_wm = self._watermarks(v)[1] if v is not None else 0
            if batch_id - 1 >= ch_wm:
                return self.read(_as_of_changes=batch_id - 1)
        return self.read()

    def delete_where(
        self, condition: str, batch_id: int | None = None
    ) -> int:
        """DELETE WHERE (the Delta verb): keys of the current rows
        satisfying ``condition`` (SQL over the table's columns) land
        as one delete change batch — one scan to decide, O(affected)
        written, nothing rewritten (merge-on-read; the next
        :meth:`optimize` materializes it away). Pinned ``batch_id``
        replays re-decide from the pre-batch state (see
        :meth:`_clause_state`) so a crash-replay converges instead of
        resurrecting or over-deleting."""
        base = self._dml_base() if batch_id is None else None
        keys = self._clause_state(batch_id).filter(
            F.expr(condition)
        ).select(*self.key_cols)
        return self.delete(keys, batch_id=batch_id, _serialize_from=base)

    def update_where(
        self,
        condition: str,
        set: dict[str, str],
        batch_id: int | None = None,
    ) -> int:
        """UPDATE WHERE (the Delta verb): rows satisfying
        ``condition`` re-enter as upsert ops with ``set`` applied —
        column → SQL expression over the row's own columns (no
        aliases; this is single-table UPDATE, unlike
        :meth:`merge`'s ``s.``/``t.`` update_set). Unlisted columns
        keep their values. One scan to decide, O(affected) written;
        set expressions pin to the column's declared type so change
        batches stay schema-aligned. Pinned replays converge (the
        pre-batch as-of state — ``v + 1`` applied twice would
        otherwise double-increment)."""
        if not set:
            raise ValueError("Table.update_where: empty set")
        schema = self._table_schema()
        by_name = {f.name: f for f in schema}
        for c in set:
            if c in self.key_cols:
                raise ValueError(
                    f"Table.update_where: set must not touch the key "
                    f"column {c!r}"
                )
            if c not in by_name:
                raise ValueError(
                    f"Table.update_where: set column {c!r} is not in "
                    "the table schema"
                )
        base = self._dml_base() if batch_id is None else None
        hit = self._clause_state(batch_id).filter(F.expr(condition))
        proj = [
            F.expr(set[f.name]).cast(f.dataType).alias(f.name)
            if f.name in set
            else F.col(f.name)
            for f in schema
        ]
        ch = hit.select(*proj).withColumn("op", F.lit("upsert"))
        return self._apply(ch, batch_id, serialize_from=base)

    def merge(
        self,
        source: DataFrame,
        *,
        matched_update=None,
        matched_delete=None,
        not_matched_insert=True,
        not_matched_by_source_delete=None,
        update_set: dict[str, str] | None = None,
        batch_id: int | None = None,
    ) -> int:
        """Conditional MERGE INTO (the Delta/Iceberg DML verb the
        facade lacked): match ``source`` rows against the CURRENT
        table state by key and land the decided actions as ONE
        op-tagged change batch — merge-on-read, O(source) sidecar
        write, nothing data-sized is rewritten.

        Clause semantics (conditions are SQL strings over the aliases
        ``s`` = source row and ``t`` = matched target row; ``True``
        = unconditional, ``None`` = clause absent):

        - ``matched_delete`` — matched rows satisfying it become
          delete ops (checked FIRST, like a MERGE whose DELETE clause
          is listed before UPDATE).
        - ``matched_update`` — remaining matched rows satisfying it
          become upsert ops. Values: all source columns, unless
          ``update_set`` maps target column → SQL expression (over
          ``s.``/``t.``), in which case unlisted columns KEEP the
          target's value (standard ``UPDATE SET`` semantics — the
          one shape a plain :meth:`upsert` cannot express, because
          it needs the target row's current values).
        - ``not_matched_insert`` — source rows with no matching key
          satisfying it become upsert ops. Source columns absent
          from the table schema are ignored; table columns absent
          from the source insert as typed NULLs (CDC feeds are often
          narrower than the table).

        - ``not_matched_by_source_delete`` — the full-sync clause
          (``WHEN NOT MATCHED BY SOURCE THEN DELETE``): TARGET rows
          whose key the source does NOT carry become delete ops when
          the condition (over ``t.`` only) holds. NOTE the cost
          class: unlike every other clause this one's output is
          bounded by the TARGET's absent keys, not the source — with
          a small source against a big table it emits a near-table-
          sized change batch. It exists for the "source IS the
          complete desired state" sync shape; leave it None for
          incremental feeds. Unmatched target rows are otherwise
          untouched by construction.

        100 TB shape: one pass over the folded table state joined to
        the batch-sized source on the key (AQE broadcasts the source
        side; Catalyst prunes target columns the conditions never
        reference), emitting a source-bounded change batch — the
        same cost class as the reads every MERGE engine pays, with
        the write side O(batch) instead of a rewrite. One row per
        source key (``apply_changes`` enforces it — overlapping
        clauses cannot double-emit because delete wins, then update,
        then the row was matched and emits nothing).
        """
        if (
            matched_update is None
            and matched_delete is None
            and not not_matched_insert
            and not_matched_by_source_delete is None
        ):
            raise ValueError("Table.merge: no clause given")
        if update_set is not None and matched_update is None:
            raise ValueError(
                "Table.merge: update_set was given but matched_update "
                "is None — no UPDATE clause would apply it; pass "
                "matched_update=True for an unconditional UPDATE SET"
            )
        keys = self.key_cols
        kset = set(keys)
        schema = self._table_schema()
        src_cols = set(source.columns)
        missing_k = [k for k in keys if k not in src_cols]
        if missing_k:
            raise ValueError(
                f"Table.merge: source must carry the key column(s) "
                f"{missing_k}"
            )

        def _cond(c):
            if c is True:
                return F.lit(True)
            if c is None or c is False:
                return F.lit(False)
            return F.expr(c)

        def _src_val(f):
            if f.name in src_cols:
                return F.col(f"s.{f.name}").alias(f.name)
            return F.lit(None).cast(f.dataType).alias(f.name)

        base = self._dml_base() if batch_id is None else None
        cur = self._clause_state(batch_id)
        on = F.lit(True)
        for k in keys:
            on = on & (F.col(f"s.{k}") == F.col(f"t.{k}"))
        j = source.alias("s").join(cur.alias("t"), on, "left")
        matched = F.col(f"t.{keys[0]}").isNotNull()
        parts = []
        if matched_delete is not None:
            parts.append(
                j.filter(matched & _cond(matched_delete)).select(
                    *[
                        F.col(f"s.{f.name}").alias(f.name)
                        if f.name in kset
                        else F.lit(None).cast(f.dataType).alias(f.name)
                        for f in schema
                    ],
                    F.lit("delete").alias("op"),
                )
            )
        if matched_update is not None:
            upd = {f.name: _src_val(f) for f in schema}
            if update_set is not None:
                # unlisted columns keep the TARGET value
                upd = {
                    f.name: F.col(f"t.{f.name}").alias(f.name)
                    for f in schema
                }
                by_name = {f.name: f for f in schema}
                for c, e in update_set.items():
                    if c in kset:
                        raise ValueError(
                            "Table.merge: update_set must not touch "
                            f"the key column {c!r}"
                        )
                    if c not in by_name:
                        raise ValueError(
                            f"Table.merge: update_set column {c!r} is "
                            "not in the table schema"
                        )
                    # arithmetic may widen (int + 0.5) — pin the
                    # column's declared type so change batches stay
                    # schema-aligned with the data files
                    upd[c] = F.expr(e).cast(by_name[c].dataType).alias(c)
            for k in keys:
                upd[k] = F.col(f"s.{k}").alias(k)
            parts.append(
                # SQL MERGE clause fall-through: a clause whose
                # condition is non-TRUE (false OR NULL) is simply not
                # satisfied, and the row falls to the next clause —
                # so negate the FAIL-CLOSED form of the delete
                # condition (~NULL is NULL and would silently drop
                # the row from this clause too)
                j.filter(
                    matched
                    & ~F.coalesce(_cond(matched_delete), F.lit(False))
                    & _cond(matched_update)
                ).select(
                    *[upd[f.name] for f in schema],
                    F.lit("upsert").alias("op"),
                )
            )
        if not_matched_insert:
            parts.append(
                j.filter(~matched & _cond(not_matched_insert)).select(
                    *[_src_val(f) for f in schema],
                    F.lit("upsert").alias("op"),
                )
            )
        if not_matched_by_source_delete is not None:
            # target keys the source lacks — disjoint from every
            # source-driven clause by construction, so one-op-per-key
            # still holds across the whole batch
            absent = cur.alias("t").join(
                source.select(*keys), keys, "left_anti"
            ).filter(_cond(not_matched_by_source_delete))
            parts.append(
                absent.select(
                    *[
                        F.col(f"t.{f.name}").alias(f.name)
                        if f.name in kset
                        else F.lit(None).cast(f.dataType).alias(f.name)
                        for f in schema
                    ],
                    F.lit("delete").alias("op"),
                )
            )
        ch = parts[0]
        for p in parts[1:]:
            ch = ch.unionByName(p)
        return self._apply(ch, batch_id, serialize_from=base)

    def _dml_base(self) -> int:
        """The change-log HEAD a conditional write reads its state
        as-of: max(pointed changes watermark, highest committed
        change batch). Monotone — vacuum only retires batches at or
        below the watermark — so a commit ticket keyed on it is never
        re-contended after a sweep."""
        v = self._pointer()
        ch_wm = self._watermarks(v)[1] if v is not None else 0
        return max(ch_wm, max(_batches(self.spark, self._changes),
                              default=0))

    def _apply(
        self, ch, batch_id: int | None, serialize_from: int | None = None
    ) -> int:
        """Land one change batch; auto-allocation floors at the
        pointed version's changes watermark so a batch claimed after
        a vacuum can never be reborn under it (invisible).

        ``serialize_from`` (conditional DML only — round 12) is the
        :meth:`_dml_base` head the caller's clauses were decided
        against: the commit then requires the atomic ticket
        ``changes/__commit_from={head}``, so of two conditional
        writers that decided from the same state exactly one commits
        and the other raises :class:`ConcurrentWriteError` — its
        decisions are stale by construction (lost update / write
        skew: e.g. two ``v + 1`` merges would both read v and the
        log would replay v+1, v+1 instead of v+2). After the write,
        a gap check re-lists the log: a blind (ticket-less) batch
        that committed inside ``(head, own)`` also invalidates the
        decisions, so the own batch is withdrawn and the same error
        raised. A blind writer SLOWER than the whole conditional
        commit (claims low, commits after our gap check) escapes
        the check — run blind ingest and conditional corrections in
        separate windows, or pin batch ids (see the CONCURRENCY
        section of the module docstring)."""
        if batch_id is None:
            v = self._pointer()
            ch_wm = self._watermarks(v)[1] if v is not None else 0
            fsutil.mkdirs(self.spark, self._changes)
            if serialize_from is not None:
                return self._commit_serialized(ch, serialize_from, ch_wm)
            batch_id = _claim_batch(self.spark, self._changes, floor=ch_wm)
        return apply_changes(
            ch, self._changes, self.key_cols, batch_id=batch_id
        )

    def _commit_serialized(self, ch, base: int, ch_wm: int) -> int:
        """Ticketed conditional-DML commit (see :meth:`_apply`)."""
        spark = self.spark
        n = _claim_batch(spark, self._changes, floor=max(base, ch_wm))
        ticket = f"{self._changes}/__commit_from={base}"
        if not fsutil.create_exclusive(spark, ticket, text=str(n)):
            try:
                txt = fsutil.read_text(spark, ticket).strip()
            except Exception:  # pragma: no cover - ticket swept mid-read
                txt = ""
            won = (
                txt.isdigit()
                and fsutil.is_committed(
                    spark, f"{self._changes}/batch={txt}"
                )
            )
            if won:
                raise ConcurrentWriteError(
                    f"Table: a concurrent conditional write committed "
                    f"change batch {txt} to {self.root} after this one "
                    f"read state as-of batch {base} — these decisions "
                    "are stale; re-run to decide against the current "
                    "state."
                )
            raise ConcurrentWriteError(
                f"Table: the conditional-write commit from change-log "
                f"head {base} under {self.root} is IN DOUBT — ticket "
                f"{ticket} exists but its batch is not committed (a "
                "concurrent writer is mid-commit, or crashed). Retry "
                "once it commits; if it is dead, release it with "
                f"release_dml_ticket({base}) while no writers are live."
            )
        # Ticket won — RE-VALIDATE the pointed changes watermark
        # before writing (ADVICE r12, the analog of _cas_flip's
        # step-4 pointer re-check): an optimize + vacuum_changes that
        # ran inside the decision window folds intermediate batches
        # into a version and RETIRES them from the log, so the
        # post-commit gap check below cannot see them; the sweep also
        # removes the __commit_from={base} ticket, which is how this
        # writer could (re)create it at all. The pointed watermark is
        # durable evidence: benign interleavings keep it <= base, a
        # fold of any batch committed after this writer's decision
        # moves it past base — then the decisions are stale.
        v2 = self._pointer()
        wm2 = self._watermarks(v2)[1] if v2 is not None else 0
        if wm2 > base:
            fsutil.delete(spark, ticket)  # nothing committed from it
            raise ConcurrentWriteError(
                f"Table: the change-log watermark of {self.root} "
                f"advanced to {wm2} past this conditional write's "
                f"decision head {base} (a concurrent writer committed "
                "and an optimize folded its batches) — these decisions "
                "are stale; re-run to decide against the current state."
            )
        try:
            apply_changes(ch, self._changes, self.key_cols, batch_id=n)
        except BaseException:
            # the write itself failed (e.g. apply_changes rejecting
            # duplicate source keys) — RELEASE the ticket we hold:
            # nothing committed from this head, so giving the
            # transition back is safe, and NOT doing so would brick
            # every later conditional write behind an in-doubt error
            # for a plain user mistake. (A crash loses this cleanup —
            # that's the documented in-doubt window.)
            fsutil.delete(spark, f"{self._changes}/batch={n}")
            fsutil.delete(spark, ticket)
            raise
        blind = [
            b for b in _batches(spark, self._changes) if base < b < n
        ]
        if blind:
            # withdraw our batch: its decisions never saw these rows.
            # Release the ticket too (ADVICE r12 — as the apply-failure
            # branch does): nothing from this head remains committed,
            # and a later same-base contender independently detects
            # the still-committed blind batch via its own gap check —
            # leaving the ticket dangling only buys every such
            # contender a misleading IN-DOUBT error.
            fsutil.delete(spark, f"{self._changes}/batch={n}")
            fsutil.delete(spark, ticket)
            raise ConcurrentWriteError(
                f"Table: blind change batch(es) {blind} committed to "
                f"{self.root} while this conditional write was deciding "
                f"from state as-of batch {base} — batch {n} was "
                "withdrawn; re-run to decide against the current state."
            )
        return n

    def release_dml_ticket(self, base: int) -> bool:
        """Operator verb: delete an ORPHANED conditional-DML commit
        ticket (``__commit_from={base}``) left by a writer that died
        between taking the ticket and committing its batch. Only run
        while no writers are live — releasing a ticket under a SLOW
        writer re-opens the race the ticket closed. Returns whether
        a ticket existed."""
        ticket = f"{self._changes}/__commit_from={base}"
        if fsutil.exists(self.spark, ticket):
            fsutil.delete(self.spark, ticket)
            return True
        return False

    # ----- streaming ingest ----------------------------------------------

    @staticmethod
    def _stream_source(
        spark: SparkSession,
        source_dir: str,
        source_schema: str,
        source_format: str,
        max_files_per_trigger: int | None,
        source_options: dict | None,
    ):
        r = spark.readStream.schema(source_schema).format(source_format)
        if max_files_per_trigger is not None:
            r = r.option("maxFilesPerTrigger", max_files_per_trigger)
        for k, v in (source_options or {}).items():
            r = r.option(k, v)
        return r.load(source_dir)

    @staticmethod
    def _stream_start(writer, checkpoint_dir: str, trigger: dict | None):
        return (
            writer.option("checkpointLocation", checkpoint_dir)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )

    def stream_append(
        self,
        source_dir: str,
        source_schema: str,
        checkpoint_dir: str,
        *,
        source_format: str = "parquet",
        max_files_per_trigger: int | None = 1,
        source_options: dict | None = None,
        trigger: dict | None = None,
    ):
        """Structured-Streaming ingest into the live dir: each
        micro-batch lands through :meth:`append` PINNED to its stream
        batch id (+1 — live batches are 1-based), so a replay from an
        earlier checkpoint REWRITES its own batches instead of
        double-appending, and batches already folded by an optimize
        fall at-or-below the live watermark (invisible — convergent,
        the same discipline as
        :func:`sources.skipping.stream_sink_with_manifest`). Both
        skipping manifests reconcile per micro-batch, so a streamed
        facade table's indexes never go stale. Single ingest mode per
        table: don't mix with auto-allocated manual appends (pinned
        stream ids and claimed ids would contend for numbers).

        Source/trigger knobs (round 12): ``source_format`` (any
        streaming file source — parquet/json/csv/orc/text),
        ``max_files_per_trigger`` (micro-batch size; ``None`` leaves
        the source's default), ``source_options`` (extra reader
        options, e.g. csv header), ``trigger`` (kwargs for
        ``DataStreamWriter.trigger`` — default ``availableNow=True``:
        drain then stop; pass ``{"processingTime": "5 seconds"}`` for
        a long-running ingest). The batch-id pinning — and with it
        replay idempotence — is trigger-independent: Structured
        Streaming assigns the same epoch ids on restart from the same
        checkpoint whatever the trigger."""

        def _sink(batch_df, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            self.append(batch_df, batch_id=batch_id + 1)

        src = self._stream_source(
            self.spark, source_dir, source_schema, source_format,
            max_files_per_trigger, source_options,
        )
        return self._stream_start(
            src.writeStream.foreachBatch(_sink), checkpoint_dir, trigger
        )

    def stream_merge(
        self,
        source_dir: str,
        source_schema: str,
        checkpoint_dir: str,
        *,
        matched_update=None,
        matched_delete=None,
        not_matched_insert=True,
        update_set: dict[str, str] | None = None,
        source_format: str = "parquet",
        max_files_per_trigger: int | None = 1,
        source_options: dict | None = None,
        trigger: dict | None = None,
    ):
        """STREAMING MERGE (round 11): drain source micro-batches
        through :meth:`merge` — each batch's clauses evaluate against
        the table state and land as ONE op-tagged change batch PINNED
        to the stream batch id (+1 — change batches are 1-based), so
        a replay from an earlier checkpoint REWRITES its own batches
        with the SAME decisions instead of double-applying: the
        pinned merge reads the state AS OF the batch below its own id
        (see :meth:`merge`), which makes the decision function of
        (batch content, prior state) only — deterministic across
        replays. Stream-of-merges ≡ the same batches merged
        sequentially (pinned in ``tests/test_table.py``).

        ``not_matched_by_source_delete`` is deliberately absent: with
        a micro-batch source it would delete every target key absent
        from the BATCH — the full-sync clause only makes sense when
        the source is the complete desired state, which a stream
        never is. Single-writer discipline as for every facade write
        path: the change log must not receive concurrent non-stream
        batches (pinned stream ids and claimed ids would contend).

        Source/trigger knobs (round 12): same surface as
        :meth:`stream_append` — ``source_format``,
        ``max_files_per_trigger`` (a merge micro-batch may carry MANY
        source files; one-op-per-key is enforced per batch by
        ``apply_changes``, so widen it only when keys don't repeat
        within a trigger window), ``source_options``, ``trigger``
        (default ``availableNow=True``: drain, then stop)."""

        def _sink(batch_df, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            self.merge(
                batch_df,
                matched_update=matched_update,
                matched_delete=matched_delete,
                not_matched_insert=not_matched_insert,
                update_set=update_set,
                batch_id=batch_id + 1,
            )

        src = self._stream_source(
            self.spark, source_dir, source_schema, source_format,
            max_files_per_trigger, source_options,
        )
        return self._stream_start(
            src.writeStream.foreachBatch(_sink), checkpoint_dir, trigger
        )

    def stream_changes(
        self,
        source_dir: str,
        source_schema: str,
        checkpoint_dir: str,
        op_col: str = "op",
    ):
        """Streaming CDC ingest into the facade's change log
        (delegates to :func:`sources.deletes.stream_changes_sink` —
        pinned stream batch ids, idempotent replay, per-micro-batch
        one-op-per-key enforcement). Downstream consumers follow via
        :meth:`changes`; serving reads reflect every drained batch
        above the watermark immediately."""
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.deletes import (
            stream_changes_sink,
        )

        return stream_changes_sink(
            self.spark, source_dir, source_schema, self._changes,
            self.key_cols, checkpoint_dir, op_col=op_col,
        )

    # ----- reads ----------------------------------------------------------

    def read(
        self,
        range_predicates: list[Predicate] | None = None,
        in_predicates: list[tuple[str, list]] | None = None,
        stats: dict | None = None,
        _as_of_changes: int | None = None,
    ) -> DataFrame:
        """THE read: pointer → pruned bulk ∪ pruned live tail →
        un-materialized change fold → re-applied predicates.
        Semantically ``read(preds) ≡ read().filter(preds)`` — the
        predicates additionally drive zone/bloom file skipping
        wherever the table's indexes cover them (uncovered predicates
        are applied as residual filters only). ``stats={}`` records
        the bulk and tail ``files_total`` / ``files_read``."""
        rp = list(range_predicates or [])
        ip = list(in_predicates or [])
        spark = self.spark
        wide = self._table_schema()
        v = self._pointer()
        live_wm, ch_wm = self._watermarks(v) if v is not None else (0, 0)

        # bulk: the pointed version, pruned through ITS manifests.
        # Which predicates an index covers is resolved PER VERSION
        # from the manifests the version actually carries, not from
        # the current config — after evolve() changed the indexed
        # columns, older versions keep serving their own layout
        # (time-travel pins prune exactly; the pointed version may
        # predate the evolution until the next optimize).
        bulk = None
        if v is not None:
            from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.optimize import (
                read_optimized,
                read_optimized_data,
            )

            vz, vb = self._version_index_cols(v)
            v_rp = [p for p in rp if p[0] in vz]
            v_ip = [p for p in ip if p[0] in vb]
            if v_rp or v_ip:
                bstats: dict | None = {} if stats is not None else None
                bulk = read_optimized(
                    spark, self.root,
                    range_predicates=v_rp or None,
                    in_predicates=v_ip or None,
                    version=v, stats=bstats,
                )
                if stats is not None:
                    stats["bulk"] = bstats
            else:
                bulk = read_optimized_data(spark, self.root, version=v)

        # live tail: batches above the watermark, pruned through the
        # live manifests (restricted to exactly the tail's files);
        # the live manifests always index the CURRENT config's cols
        idx_rp = [p for p in rp if p[0] in self.zone_cols]
        idx_ip = [p for p in ip if p[0] in self.bloom_cols]
        tail_ids = self._tail_ids(live_wm)
        tail = self._read_tail(tail_ids, idx_rp, idx_ip, stats, wide)

        # every leg aligns to the WIDEST schema (a version or batch
        # written before a widening is narrower on disk — its rows
        # read as typed NULL in the new columns)
        if bulk is None and tail is None:
            base = self._align(
                self._any_schema(), wide  # raises on a truly empty table
            )
        elif bulk is None:
            base = tail
        elif tail is None:
            base = self._align(bulk, wide)
        else:
            base = self._align(bulk, wide).unionByName(tail)

        folded = read_with_changes(
            base, self._changes, self.key_cols, from_batch=ch_wm,
            as_of_batch=_as_of_changes, schema=wide,
        )
        # the filter-under-CDC law: upserts re-entered unfiltered, so
        # every predicate re-applies after the fold (and uncovered
        # predicates apply here for the first time)
        for c, lo, hi in rp:
            if lo is not None:
                folded = folded.filter(F.col(c) >= F.lit(lo))
            if hi is not None:
                folded = folded.filter(F.col(c) <= F.lit(hi))
            if lo is None and hi is None:
                folded = folded.filter(F.col(c).isNotNull())
        for c, values in ip:
            folded = folded.filter(F.col(c).isin(*values))
        return folded

    def _read_tail(
        self,
        tail_ids: list[int],
        idx_rp: list[Predicate],
        idx_ip: list[tuple[str, list]],
        stats: dict | None,
        schema=None,
    ) -> DataFrame | None:
        """The live batches above the watermark — manifest-pruned when
        an index covers a predicate, with a fail-closed coverage check
        scoped to exactly the tail's listing (the live manifests may
        lawfully still carry rows for vacuumed files, and reconcile on
        the next append)."""
        spark = self.spark
        if not tail_ids:
            return None
        dirs = [f"{self._live}/batch={b}" for b in tail_ids]
        use_zones = bool(idx_rp) and fsutil.exists(
            spark, f"{self._zones}/_SUCCESS"
        )
        use_bloom = bool(idx_ip) and fsutil.exists(
            spark, f"{self._bloom}/_SUCCESS"
        )
        if not use_zones and not use_bloom:
            rd = spark.read.option("basePath", self._live)
            if schema is not None:
                rd = rd.schema(schema)
            return rd.parquet(*dirs).drop("batch")
        actual: set[str] = set()
        for d in dirs:
            actual.update(list_data_files(spark, d))
        flist = sorted(actual)
        zmf = bmf = None
        if use_zones:
            zmf = spark.read.parquet(self._zones).filter(
                F.col("file").isin(flist)
            )
            self._check_tail_coverage(zmf, actual, "zone")
        if use_bloom:
            bmf = spark.read.parquet(self._bloom).filter(
                F.col("file").isin(flist)
            )
            self._check_tail_coverage(
                bmf.select("file").distinct(), actual, "bloom"
            )
        tstats: dict | None = {} if stats is not None else None
        df = combined_pruned_read(
            spark, self._live,
            zone_manifest=zmf, bloom_manifest=bmf,
            range_predicates=idx_rp if use_zones else None,
            in_predicates=idx_ip if use_bloom else None,
            verify=False,  # coverage verified above, tail-scoped
            stats=tstats, _what="Table.read", schema=schema,
        )
        if stats is not None:
            stats["tail"] = tstats
        return df.drop("batch")

    def _check_tail_coverage(
        self, mf: DataFrame, actual: set[str], what: str
    ) -> None:
        """Every tail file must carry a manifest row — checked with
        ONE aggregate job (round 11): the distinct manifest-file set
        restricted to the tail must equal the tail itself, so its
        order-independent signature (count + xxhash64 sum, the
        ``combined_pruned_read`` device) must match the tail's
        driver-computed signature; only a mismatch pays the exact
        anti-join that names missing files. The driver never sees the
        per-file manifest set."""
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import (
            xxh64_py,
        )

        files = sorted(actual)
        covered = mf.select("file").filter(
            F.col("file").isin(files)
        ).distinct()
        row = covered.agg(
            F.count("file").alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("file").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).head()
        a_n = len(files)
        a_h = sum(xxh64_py(f.encode("utf-8")) for f in files)
        if (a_n, a_h) == (int(row["n"]), int(row["h"])):
            return
        actual_df = self.spark.createDataFrame(
            [(f,) for f in files], "file string"
        )
        missing_df = actual_df.join(covered, "file", "left_anti")
        n_missing = missing_df.count()
        if n_missing:
            examples = sorted(
                r["file"] for r in missing_df.limit(3).collect()
            )
            raise ValueError(
                f"Table.read: {what} manifest is missing "
                f"{n_missing} live tail file(s) (e.g. "
                f"{examples}) — the manifest is stale; "
                "append through Table.append (which reconciles it) or "
                "rebuild it before pruned reads."
            )

    def snapshot(self, version: int | None = None) -> DataFrame:
        """Time travel: the table EXACTLY AS OF a committed version's
        pointer flip (its watermarks folded everything it saw, and
        nothing after) — a plain scan of that version's immutable
        data files, stable until the version is pruned. Default: the
        pointed-at version."""
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.optimize import (
            read_optimized_data,
        )

        return read_optimized_data(self.spark, self.root, version=version)

    def changes(
        self, from_batch: int | None = None, to_batch: int | None = None
    ) -> DataFrame:
        """The change-data-feed read (:func:`sources.deletes
        .table_changes`): the op-tagged NET effect per key of the
        change batches in ``(from_batch, to_batch]`` — the incremental
        feed derived artifacts consume instead of diffing
        snapshots."""
        return table_changes(
            self.spark, self._changes, self.key_cols,
            from_batch=from_batch, to_batch=to_batch,
            schema=self._table_schema(),
        )

    def consume_changes(
        self, consumer_dir: str, apply_fn, to_batch: int | None = None
    ) -> tuple[int, int] | None:
        """Drive one incremental-consumer step over the change feed —
        the loop every derived artifact (LM ledgers, BM25 postings,
        minhash indexes) runs instead of diffing snapshots:

        1. read this consumer's cursor (``consumer_dir/CURSOR``,
           0 when absent — each consumer owns its own directory, so
           several artifacts tail one table independently);
        2. call ``apply_fn(changes_df, from_batch, hi)`` with the
           net-effect feed for ``(cursor, hi]`` (``hi`` = the highest
           committed change batch, or ``to_batch`` to stop earlier —
           e.g. to align consumers for a consistent derived view);
        3. advance the cursor to ``hi`` ONLY after ``apply_fn``
           returns (atomic one-line write).

        Returns ``(from_batch, hi)`` for the consumed range, or None
        when the feed has nothing new. Delivery is at-least-once
        across crashes (a crash between apply and cursor write
        replays the SAME range on the next call), so ``apply_fn``
        must be idempotent per range — which every maintenance path
        in the engine already is: ledger folds key their writes on
        pinned batch/period ids, so a replayed range rewrites the
        same rows instead of double-applying. At-least-once + an
        idempotent applier = exactly-once end to end, the standard
        consumer contract (Kafka-style cursor-after-apply).
        100 TB shape: each step is O(changes in range) — one window
        over the change rows; nothing table-sized participates."""
        spark = self.spark
        cursor_path = f"{consumer_dir.rstrip('/')}/CURSOR"
        cursor = 0
        if fsutil.exists(spark, cursor_path):
            cursor = int(fsutil.read_text(spark, cursor_path).strip())
        ids = [
            b for b in _batches(spark, self._changes)
            if b > cursor and (to_batch is None or b <= to_batch)
        ]
        if not ids:
            return None
        hi = max(ids)
        apply_fn(self.changes(from_batch=cursor, to_batch=hi), cursor, hi)
        fsutil.mkdirs(spark, consumer_dir.rstrip("/"))
        fsutil.write_text_atomic(spark, cursor_path, str(hi))
        return (cursor, hi)

    # ----- maintenance -----------------------------------------------------

    def optimize(
        self,
        target_rows_per_file: int = 1_000_000,
        keep: int = 3,
        vacuum: bool = True,
    ) -> int:
        """Periodic merge-on-write: fold the current live tail and
        un-materialized changes into a fresh committed version
        (Z-order on the zone columns, bloom over the bloom columns,
        manifests rebuilt from the exact files written), record the
        fold watermarks, flip the pointer, then vacuum the folded live
        batches (data-sized; folded CHANGE batches stay by default —
        they are tiny and downstream ``changes()`` consumers may not
        have caught up; retire them with :meth:`vacuum_changes`).
        Batches landing DURING the fold stay above the watermarks and
        remain served. Crash-safe at every step: the watermark file
        commits with the version, so an un-vacuumed folded batch is
        invisible, never double-counted."""
        spark = self.spark
        v = self._pointer()
        live_wm, ch_wm = self._watermarks(v) if v is not None else (0, 0)
        tail_ids = self._tail_ids(live_wm)
        ch_ids = [
            b for b in _batches(spark, self._changes) if b > ch_wm
        ]
        live_wm_new = max(tail_ids, default=live_wm)
        ch_wm_new = max(ch_ids, default=ch_wm)

        if v is None and not tail_ids:
            raise ValueError(
                f"Table.optimize: {self.root} holds no data yet"
            )
        wide = self._table_schema()
        base = None
        if v is not None:
            base = self._align(self.snapshot(v), wide)
        if tail_ids:
            t = spark.read.schema(wide).option(
                "basePath", self._live
            ).parquet(
                *[f"{self._live}/batch={b}" for b in tail_ids]
            ).drop("batch")
            base = t if base is None else base.unionByName(t)
        merged = read_with_changes(
            base, self._changes, self.key_cols,
            from_batch=ch_wm, as_of_batch=ch_wm_new if ch_ids else ch_wm,
            schema=wide,
        )

        dims = self._zorder_dims(merged)
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.optimize import (
            optimize_table,
        )

        n = optimize_table(
            merged, self.root, dims,
            bloom_cols=self.bloom_cols or None,
            target_rows_per_file=target_rows_per_file,
            keep=keep,
            extra_metadata={
                _FOLDED: f"live={live_wm_new}\nchanges={ch_wm_new}\n"
            },
            # CAS commit (round 12): flip only if the pointer still
            # reads the version this fold derived from — a concurrent
            # optimize that committed (and vacuumed) first must make
            # THIS one fail loudly, not shadow its fresher fold with
            # a stale one whose unfolded batches are already deleted
            expected_pointer=v,
        )
        if vacuum:
            self.vacuum_live()
        return n

    def _zorder_dims(self, df: DataFrame) -> list[tuple[str, float, float]]:
        """(col, lo, hi) Z-order dims for the configured zone columns
        — bounds from one agg pass over the frame being optimized (the
        periodic rewrite can afford it). Falls back to the NUMERIC key
        columns when no zone columns are configured (optimize still
        clusters and zone-indexes SOMETHING so point reads prune);
        string key columns are skipped in the fallback (Z-order needs
        numeric dims), and an all-string key yields [] — plain
        compaction, no zone manifest for that version. Explicitly
        CONFIGURED string zone columns still raise (a misconfiguration
        should be loud, not silently unindexed)."""
        cols = self.zone_cols
        if not cols:
            from pyspark.sql.types import NumericType

            by_name = {f.name: f for f in df.schema.fields}
            cols = [
                k for k in self.key_cols
                if isinstance(by_name[k].dataType, NumericType)
            ]
            if not cols:
                return []
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
        row = df.agg(*aggs).head()
        dims = []
        for c in cols:
            lo, hi = row[f"__lo_{c}"], row[f"__hi_{c}"]
            if lo is None:  # all-NULL column: degenerate box
                lo = hi = 0.0
            if isinstance(lo, str):
                raise TypeError(
                    f"Table.optimize: zone column {c!r} is a string — "
                    "Z-order interleaving needs numeric dims; index "
                    "string columns via bloom_cols (equality) or sort "
                    "the layout externally"
                )
            dims.append((c, float(lo), float(hi) + 1.0))
        return dims

    def restore(
        self, version: int, target_rows_per_file: int = 1_000_000,
        keep: int = 3,
    ) -> int:
        """RESTORE the table to a committed ``version`` (the Delta
        verb): serve exactly ``snapshot(version)`` again, undoing
        every append/upsert/delete/optimize since. Implemented as a
        NEW forward version — the pointer never flips backward (that
        invariant is what lets readers trust pins), so the restore
        writes ``version``'s rows as version N+1 with watermarks set
        to the CURRENT batch maxima: everything that landed after
        ``version`` is absorbed-as-discarded (invisible through the
        new version), while batches landing AFTER the restore stay
        above the recorded marks and serve normally. History is
        preserved (the undone versions remain pinnable until pruned),
        the restore itself is re-restorable, and crash-safety is the
        optimize lifecycle's — a half-written restore is an orphan
        directory readers never resolve. Cost: one O(snapshot)
        rewrite, the same class as the optimize every caller already
        budgets.

        The SCHEMA restores too: columns added after ``version``
        disappear, columns dropped after it come back with their
        values — the restored table serves exactly what ``version``
        served, shape included. The schema file rewrites AFTER the
        version commits (a crash in between leaves the restored data
        committed but aligned to the newer schema — wrong shape,
        never wrong values; re-running the restore converges)."""
        spark = self.spark
        if not fsutil.exists(
            spark, f"{self.root}/v={version}/_SUCCESS"
        ):
            raise ValueError(
                f"Table.restore: no committed v={version} under "
                f"{self.root}"
            )
        snap = self.snapshot(version)
        # contract check, not an opaque mid-restore AnalysisException:
        # the restored snapshot must carry every currently indexed
        # column (a column added+indexed after `version` can't be
        # zone/bloom-built from data that predates it)
        have = set(snap.columns)
        stranded = [
            c for c in [*self.zone_cols, *self.bloom_cols]
            if c not in have
        ]
        if stranded:
            raise ValueError(
                f"Table.restore: v={version} lacks currently indexed "
                f"column(s) {stranded} — evolve(zone_cols=..., "
                "bloom_cols=...) the indexes off those columns first, "
                "then restore"
            )
        live_wm_new = max(_batches(spark, self._live), default=0)
        ch_wm_new = max(_batches(spark, self._changes), default=0)
        v = self._pointer()
        if v is not None:
            lw, cw = self._watermarks(v)
            live_wm_new = max(live_wm_new, lw)
            ch_wm_new = max(ch_wm_new, cw)
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.optimize import (
            optimize_table,
        )

        n = optimize_table(
            snap, self.root, self._zorder_dims(snap),
            bloom_cols=self.bloom_cols or None,
            target_rows_per_file=target_rows_per_file,
            keep=keep,
            extra_metadata={
                _FOLDED: f"live={live_wm_new}\nchanges={ch_wm_new}\n"
            },
            expected_pointer=v,  # CAS: racing optimize/restore loses loudly
        )
        # restore the SHAPE as well: the committed version's own
        # schema becomes current (after the commit — a crash between
        # leaves restored data under the newer alignment, never wrong
        # values), and pending drop records reset (the restored state
        # has no files carrying foreign bytes once vacuumed)
        self._write_schema(snap.schema, dropped={})
        self.vacuum_live()
        return n

    def vacuum_live(self) -> int:
        """Physically remove live batches at-or-below the pointed
        version's live watermark (their rows are materialized in the
        version). Returns the number of batches removed. Safe at any
        time: the watermark already made them invisible to reads."""
        v = self._pointer()
        if v is None:
            return 0
        live_wm, _ = self._watermarks(v)
        removed = 0
        for b in _batches(self.spark, self._live):
            if b <= live_wm:
                fsutil.delete(self.spark, f"{self._live}/batch={b}")
                fsutil.delete(self.spark, f"{self._live}/__claim_batch={b}")
                removed += 1
        if removed:
            self.spark.catalog.refreshByPath(self._live)
        return removed

    def vacuum_changes(self, up_to_batch: int) -> int:
        """Retire change batches ≤ ``up_to_batch`` — call once every
        downstream ``changes()`` consumer's cursor has passed it AND
        it is at-or-below the pointed version's changes watermark
        (enforced: serving reads still need everything above)."""
        v = self._pointer()
        _, ch_wm = self._watermarks(v) if v is not None else (0, 0)
        if up_to_batch > ch_wm:
            raise ValueError(
                f"Table.vacuum_changes: up_to_batch={up_to_batch} is "
                f"above the pointed version's changes watermark "
                f"{ch_wm} — those batches are NOT materialized yet; "
                "optimize first"
            )
        removed = 0
        for b in _batches(self.spark, self._changes):
            if b <= up_to_batch:
                fsutil.delete(self.spark, f"{self._changes}/batch={b}")
                fsutil.delete(
                    self.spark, f"{self._changes}/__claim_batch={b}"
                )
                removed += 1
        # DML commit tickets strictly below the retired head are dead:
        # _dml_base() is monotone and already past them, so they can
        # never be contended again — sweeping bounds the dir listing
        for name in fsutil.list_files(
            self.spark, self._changes, "__commit_from=*"
        ):
            try:
                f = int(name.split("=", 1)[1])
            except ValueError:  # pragma: no cover - foreign file
                continue
            if f < up_to_batch:
                fsutil.delete(self.spark, f"{self._changes}/{name}")
        return removed

    def history(self) -> list[dict]:
        """DESCRIBE HISTORY (the Delta verb, round 12): one entry per
        committed version, oldest first — version number, whether it
        is the pointed LATEST, the fold watermarks it recorded
        (which live/change batches it materialized), and whether it
        is an orphaned CAS loser (committed-but-never-pointed — still
        pinnable via :meth:`snapshot`). The ``cas_loser`` flag is
        derived as ``version > pointed``, so it only identifies
        losers ABOVE the current pointer: once a later optimize
        advances the pointer past a loser, that version reads as
        normally superseded (ADVICE r12 — durable per-version parent
        metadata would be needed to tell the two apart after the
        fact). All metadata-plane reads
        (version count is bounded by ``keep``); pairs with
        :meth:`restore` for point-in-time rollback and with
        :meth:`snapshot` for pinned reads."""
        spark = self.spark
        from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.optimize import (
            _committed_versions,
        )

        pointed = self._pointer()
        out = []
        for v in _committed_versions(spark, self.root):
            lw, cw = self._watermarks(v)
            out.append({
                "version": v,
                "is_latest": v == pointed,
                "live_watermark": lw,
                "changes_watermark": cw,
                # a committed version ABOVE the pointer never became
                # LATEST: it lost its pointer CAS (stale fold) — its
                # snapshot is still a consistent pin of what its
                # writer read
                "cas_loser": pointed is not None and v > pointed,
            })
        return out

    def describe(self) -> dict:
        """Operational summary: config, pointer, per-version stats
        (via :func:`sources.optimize.describe_table`), live tail and
        change-log batch ids, current watermarks."""
        v = self._pointer()
        out = {
            "root": self.root,
            "key_col": self.key_col,
            "zone_cols": self.zone_cols,
            "bloom_cols": self.bloom_cols,
            "latest": v,
            "live_batches": _batches(self.spark, self._live),
            "change_batches": _batches(self.spark, self._changes),
        }
        try:
            out["schema"] = [
                (f.name, f.dataType.simpleString())
                for f in self._table_schema().fields
            ]
        except ValueError:
            out["schema"] = None  # empty table — nothing appended yet
        if v is not None:
            from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.optimize import (
                describe_table,
            )

            live_wm, ch_wm = self._watermarks(v)
            out["watermarks"] = {"live": live_wm, "changes": ch_wm}
            out["versions"] = describe_table(self.spark, self.root)[
                "versions"
            ]
        return out


def read_table(
    spark: SparkSession,
    root: str,
    range_predicates: list[Predicate] | None = None,
    in_predicates: list[tuple[str, list]] | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """One-call read of a facade-managed table: resolve the pointer,
    stack zone ∧ bloom pruning over bulk and tail, fold the
    un-materialized changes, re-apply the predicates (the
    filter-under-CDC law). Equivalent to
    ``Table(spark, root).read(...)``."""
    return Table(spark, root).read(
        range_predicates=range_predicates,
        in_predicates=in_predicates,
        stats=stats,
    )
