"""One-call table OPTIMIZE lifecycle: compaction + Z-order
re-clustering + zone/bloom manifest rebuild + versioned pointer flip,
composed so a reader can NEVER observe a stale-manifest or
half-compacted state.

The pieces exist separately — :func:`sources.io.compact_output`
(small-files compaction), :func:`operators.layout.zorder_layout`
(multi-dim clustering), :func:`sources.skipping.build_zone_manifest` /
:func:`build_bloom_manifest` (skipping indexes), and
:func:`sources.gating.versioned_publish` (pointer-flip publish). This
module is the lifecycle contract tying them together, modeled on
Delta/Iceberg OPTIMIZE + snapshot commit:

- every optimize writes a COMPLETE immutable version directory
  ``root/v=N/{data, zones, bloom}`` — the manifests are built from
  the exact files just written, so within a version they can never
  drift from the data;
- the version is committed by a ``_SUCCESS`` marker and then the
  one-line ``root/LATEST`` pointer flips LAST (atomic replace).
  A crash anywhere earlier leaves the pointer on the previous
  version: readers keep serving consistent (data, manifests); the
  crashed attempt's claimed number is burned (the monotone counter
  skips it) and its orphaned partial directory stays invisible to
  version discovery;
- version numbers allocate via an ATOMIC EXCLUSIVE CLAIM
  (``fsutil.create_exclusive``) before any write, so concurrent
  optimizes can never interleave inside one version directory, and
  the pointer flip is FORWARD-ONLY — a slow writer committing an
  older number stays committed and pinnable but never becomes
  LATEST;
- old versions stay intact until pruned (in-flight readers that
  resolved ``v=K`` keep reading ``v=K``); the pointed-at version is
  never pruned; rollback is :func:`sources.gating.rollback_version`'s
  pointer rewrite.

Scale notes: the rewrite is one range exchange (Z-order sampling) +
the write; manifest builds are one distributed pass each over the
fresh files; the pointer flip is metadata-only. Readers pay zero
verification listings (``verify=False`` is sound here and only here:
version directories are immutable once committed, so the manifest's
file set is correct by construction — the fail-closed listing check
exists for mutable roots where writers append behind the manifest's
back).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources import fsutil
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
    ConcurrentWriteError,
    read_version_pointer,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import (
    Predicate,
    build_bloom_manifest,
    build_zone_manifest,
    combined_pruned_read,
)


_UNSET = object()  # sentinel: expected_pointer=None means "no pointer yet"


def _pointer_or_none(spark: SparkSession, root: str) -> int | None:
    try:
        return read_version_pointer(root, spark)
    except Exception:
        return None


def _cas_flip(
    spark: SparkSession, root: str, expected: int | None, n: int
) -> None:
    """Compare-and-swap pointer advancement (round 12): flip
    ``root/LATEST`` to ``n`` ONLY if it still reads ``expected`` (the
    value the caller folded its input from), serialized through an
    atomic flip TICKET so two writers that both saw ``expected`` can
    never both flip — the stale-fold corruption a forward-only flip
    alone permits (the loser's HIGHER version number would shadow the
    winner's fresher fold, and the winner's vacuum has already
    deleted the batches the loser never folded: silent data loss).

    Protocol (each step crash-safe):

    1. ``v=n/_SUCCESS`` is already written — a loser/crasher stays
       committed-but-unpointed (pinnable snapshot, never LATEST).
    2. Re-read the pointer; if it moved off ``expected``, lose fast.
    3. Atomically create ``root/__flip_from={expected}`` with content
       ``n`` (``create_exclusive`` — exactly ONE writer ever owns the
       transition away from a given pointer value).
    4. Ticket won → re-check the pointer still reads ``expected``
       (guards the pathological swept-ticket resurrection) → write
       ``LATEST``.
    5. Ticket lost → if its recorded target is committed and the
       pointer still reads ``expected``, the winner crashed between
       ticket and flip: COMPLETE its transition (idempotent journal
       replay — ticket implies the target's ``_SUCCESS`` exists,
       written in step 1), then raise. An EMPTY ticket (winner
       crashed inside the create-write-close window, or is mid-call)
       is in-doubt: raise naming it; the winner finishing its write
       resolves it, a genuinely dead winner needs the operator to
       delete the ticket once no writers are live.

    Tickets sweep with version pruning (a ticket for a pruned
    generation can never be contended again — allocation and the
    step-4 re-check both sit above it)."""
    current = _pointer_or_none(spark, root)
    if current != expected:
        raise ConcurrentWriteError(
            f"optimize_table: version pointer for {root} moved "
            f"{expected} -> {current} while this optimize folded its "
            f"input; v={n} stays committed-but-unpointed. Re-read the "
            "table and retry."
        )
    ticket = f"{root}/__flip_from={0 if expected is None else expected}"
    if fsutil.create_exclusive(spark, ticket, text=str(n)):
        current = _pointer_or_none(spark, root)
        if current != expected:  # pragma: no cover - swept-ticket race
            raise ConcurrentWriteError(
                f"optimize_table: version pointer for {root} moved "
                f"{expected} -> {current} during commit; v={n} stays "
                "committed-but-unpointed. Re-read the table and retry."
            )
        fsutil.write_text_atomic(spark, f"{root}/LATEST", str(n))
        return
    try:
        txt = fsutil.read_text(spark, ticket).strip()
    except Exception:  # pragma: no cover - ticket swept mid-read
        txt = ""
    if txt.isdigit() and fsutil.exists(spark, f"{root}/v={txt}/_SUCCESS"):
        if _pointer_or_none(spark, root) == expected:
            # winner crashed between ticket and flip: complete it
            fsutil.write_text_atomic(spark, f"{root}/LATEST", txt)
        raise ConcurrentWriteError(
            f"optimize_table: lost the pointer CAS for {root} to "
            f"v={txt} (a concurrent optimize folded the same state "
            f"first); v={n} stays committed-but-unpointed. Re-read "
            "the table and retry."
        )
    raise ConcurrentWriteError(
        f"optimize_table: the pointer transition from {expected} under "
        f"{root} is IN DOUBT — flip ticket {ticket} exists but names "
        f"no committed version (a concurrent writer is mid-commit, or "
        f"crashed inside the ticket write). Retry once it commits; if "
        "it is dead, delete the ticket file while no writers are live."
    )


def _committed_versions(spark: SparkSession, root: str) -> list[int]:
    return sorted(
        int(name.split("=", 1)[1])
        for name in fsutil.list_subdirs(spark, root, "v=*")
        if fsutil.exists(spark, f"{root}/{name}/_SUCCESS")
    )


def optimize_table(
    df: DataFrame,
    root: str,
    zorder_dims: list[tuple[str, float, float]],
    bloom_cols: list[str] | None = None,
    target_rows_per_file: int = 1_000_000,
    zorder_bits: int = 8,
    bloom_n_bits: int | None = None,
    bloom_k: int = 5,
    keep: int = 3,
    extra_metadata: dict[str, str] | None = None,
    expected_pointer=_UNSET,
) -> int:
    """OPTIMIZE ``df`` into a new committed version under ``root`` and
    flip the pointer: Z-order re-cluster on ``zorder_dims``, compact
    to ``target_rows_per_file``, rebuild the zone manifest over the
    Z-order columns and (optionally) the bloom manifest over
    ``bloom_cols``, commit, flip. Returns the new version number.

    ``expected_pointer`` opts into the optimistic-concurrency commit
    (round 12): pass the pointer value read when ``df`` was derived
    (``None`` for a table with no pointer yet) and the flip becomes a
    CAS — it happens only if the pointer STILL reads that value,
    serialized through an atomic flip ticket; a writer that lost the
    race raises :class:`~...sources.gating.ConcurrentWriteError` and
    its version stays committed-but-unpointed (see :func:`_cas_flip`).
    Without it (raw callers that pass explicit content and accept
    last-writer-wins), the legacy forward-only flip applies — don't
    mix the two modes on one root while writers are concurrent.

    Call it with the CURRENT table content (e.g.
    ``read_optimized_data(spark, root)`` unioned with a fresh batch,
    or any curated frame) — the version directory is rebuilt whole,
    which is what OPTIMIZE means: the steady-state ingest path is the
    O(batch) ``stream_sink_with_manifest`` / ``update_*_manifest``
    family; this is the periodic re-layout that restores clustering
    and file sizes after many small appends."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.layout import (
        zorder_layout,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.io import (
        compact_output,
    )

    spark = df.sparkSession
    root = root.rstrip("/")
    fsutil.mkdirs(spark, root)
    versions = _committed_versions(spark, root)
    # OPTIMISTIC version allocation: claim the number with an atomic
    # exclusive create BEFORE writing anything — two concurrent
    # optimizes can then never interleave writes inside one version
    # directory (the corruption mode a committed-versions scan alone
    # cannot prevent). A crashed writer burns its claimed number (the
    # monotone counter skips it; the orphaned partial dir stays
    # invisible to discovery — disk garbage, never served).
    n = (versions[-1] + 1) if versions else 1
    for _ in range(1000):
        if fsutil.create_exclusive(spark, f"{root}/__claim_v={n}"):
            break
        n += 1
    else:  # pragma: no cover - 1000 live writers
        raise RuntimeError(f"optimize_table: could not claim a version "
                           f"number under {root}")
    vdir = f"{root}/v={n}"
    if fsutil.exists(spark, vdir):
        fsutil.delete(spark, vdir)

    # 1. re-cluster + compact the data files: the Z-order range
    #    exchange is sized to the target file count EXPLICITLY —
    #    explicit repartition counts are exempt from AQE partition
    #    coalescing, so the layout lands as ceil(rows/target) files
    #    (one count action; callers optimizing a known table can
    #    afford it — this is the periodic re-layout, not the hot path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // max(1, target_rows_per_file)))
    clustered = zorder_layout(
        df, zorder_dims, bits=zorder_bits, num_partitions=n_files
    )
    compact_output(
        clustered, f"{vdir}/data", target_rows_per_file, total_rows=n_rows
    )

    # 2. manifests over exactly the files just written (never stale
    #    by construction: the version dir is immutable after commit)
    fresh = spark.read.parquet(f"{vdir}/data")
    # auto-size the bloom geometry to the file row target: ~10 bits
    # per key keeps the false-positive rate ~1% at 5 hashes — a fixed
    # small n_bits SATURATES on large files (2000 keys x 5 hashes into
    # 4096 bits leaves ~90% of bits set and every file "possibly
    # contains" every probe: sound, but zero skipping). Power of two,
    # floored at 4096, capped at 2^24 (2 MB/file/col — the Delta-scale
    # bloom budget).
    if bloom_n_bits is None:
        per_file = min(target_rows_per_file, n_rows)
        bloom_n_bits = max(
            4096, min(1 << 24, 1 << (10 * max(1, per_file) - 1).bit_length())
        )
    zone_cols = [c for c, _lo, _hi in zorder_dims]
    if zone_cols:
        build_zone_manifest(fresh, zone_cols).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{vdir}/zones")
    if bloom_cols:
        build_bloom_manifest(
            fresh, bloom_cols, n_bits=bloom_n_bits, k=bloom_k
        ).coalesce(1).write.mode("overwrite").parquet(f"{vdir}/bloom")

    # 2b. caller-supplied metadata files (e.g. the fold watermarks of
    #     sources.table) land INSIDE the version dir BEFORE the commit
    #     marker — a version is never committed without them, so a
    #     reader can rely on their presence exactly when _SUCCESS is.
    for fname, text in (extra_metadata or {}).items():
        fsutil.write_text_atomic(spark, f"{vdir}/{fname}", text)

    # 3. commit marker, THEN the externally visible pointer flip —
    #    strictly last, so readers only ever resolve complete versions.
    #    FORWARD-ONLY: a slow concurrent writer committing an older
    #    claimed number must not yank the pointer backwards (its
    #    version stays committed and pinnable, it just never becomes
    #    LATEST).
    fsutil.write_text_atomic(spark, f"{vdir}/_SUCCESS", "")
    if expected_pointer is not _UNSET:
        _cas_flip(spark, root, expected_pointer, n)
    else:
        try:
            current = read_version_pointer(root, spark)
        except Exception:
            current = 0
        if n > current:
            fsutil.write_text_atomic(spark, f"{root}/LATEST", str(n))

    # 4. prune old versions (never the pointed-at one), claims too —
    #    including claims BURNED by crashed writers (number skipped,
    #    no committed v-dir): any claim below the oldest version we
    #    retain can never be re-contended (allocation starts above the
    #    last committed number), so sweeping them bounds the root's
    #    listing across optimize cycles.
    pointed = read_version_pointer(root, spark)
    for old in versions[: max(0, len(versions) - (keep - 1))]:
        if old != pointed:
            fsutil.delete(spark, f"{root}/v={old}")
    retained = [
        v for v in _committed_versions(spark, root) + [pointed] if v
    ]
    floor = min(retained) if retained else 0
    for pat in ("__claim_v=*", "__flip_from=*"):
        for name in fsutil.list_files(spark, root, pat):
            try:
                m = int(name.split("=", 1)[1])
            except ValueError:  # pragma: no cover - foreign file
                continue
            # a flip ticket for a pruned generation can never be
            # contended again (the CAS re-checks the live pointer)
            if m < floor:
                fsutil.delete(spark, f"{root}/{name}")
    return n


def read_optimized_data(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Plain full scan of the pointed-at version's data files (or a
    pinned ``version`` — time travel: committed versions are immutable
    until pruned, so a pinned read is stable across later optimizes)."""
    root = root.rstrip("/")
    v = version if version is not None else read_version_pointer(root, spark)
    if not fsutil.exists(spark, f"{root}/v={v}/_SUCCESS"):
        raise ValueError(
            f"read_optimized_data: no committed v={v} under {root} "
            "(pruned or never written)"
        )
    return spark.read.parquet(f"{root}/v={v}/data")


def read_optimized(
    spark: SparkSession,
    root: str,
    range_predicates: list[Predicate] | None = None,
    in_predicates: list[tuple[str, list]] | None = None,
    stats: dict | None = None,
    version: int | None = None,
) -> DataFrame:
    """Manifest-pruned read of the pointed-at version: range
    conjunctions prune by the zone manifest, IN-lists by the bloom
    manifest, both at once multiplicatively
    (:func:`sources.skipping.combined_pruned_read`). With no
    predicates, a plain full scan. ``version`` pins a past committed
    version (time travel — its manifests travel with it, so pruning
    stays exact). ``verify=False`` is sound because committed version
    directories are immutable — the manifests were built from exactly
    these files (see module docstring)."""
    root = root.rstrip("/")
    v = version if version is not None else read_version_pointer(root, spark)
    vdir = f"{root}/v={v}"
    if not fsutil.exists(spark, f"{vdir}/_SUCCESS"):
        raise ValueError(
            f"read_optimized: no committed v={v} under {root} "
            "(pruned or never written)"
        )
    if not range_predicates and not in_predicates:
        return spark.read.parquet(f"{vdir}/data")
    zmf = (
        spark.read.parquet(f"{vdir}/zones") if range_predicates else None
    )
    bmf = None
    if in_predicates:
        if not fsutil.exists(spark, f"{vdir}/bloom"):
            raise ValueError(
                f"read_optimized: {root} v={v} was optimized without "
                "bloom_cols — no bloom manifest to serve IN-list "
                "pruning; pass the IN-list as a residual filter on the "
                "zone-pruned read, or re-optimize with bloom_cols"
            )
        bmf = spark.read.parquet(f"{vdir}/bloom")
    return combined_pruned_read(
        spark,
        f"{vdir}/data",
        zone_manifest=zmf,
        bloom_manifest=bmf,
        range_predicates=range_predicates,
        in_predicates=in_predicates,
        verify=False,
        stats=stats,
        _what="read_optimized",
    )


def describe_table(spark: SparkSession, root: str) -> dict:
    """Operational summary of a versioned table — the
    ``DESCRIBE TABLE EXTENDED`` of this layer, all metadata-plane
    reads: the pointer, every committed version's file/row counts and
    manifest coverage, and which indexes each version carries. Useful
    as the health check before/after OPTIMIZE and in retention
    audits."""
    from pyspark.sql import functions as F

    root = root.rstrip("/")
    pointed = read_version_pointer(root, spark)
    out: dict = {"root": root, "latest": pointed, "versions": {}}
    for v in _committed_versions(spark, root):
        vdir = f"{root}/v={v}"
        zones = spark.read.parquet(f"{vdir}/zones")
        agg = zones.agg(
            F.count(F.lit(1)).alias("files"),
            F.sum("n_rows").alias("rows"),
        ).head()
        indexed = sorted(
            c[: -len("__min")]
            for c in zones.columns
            if c.endswith("__min")
        )
        info = {
            "files": agg["files"],
            "rows": int(agg["rows"] or 0),
            "zone_cols": indexed,
            "bloom_cols": [],
        }
        if fsutil.exists(spark, f"{vdir}/bloom/_SUCCESS"):
            bl = spark.read.parquet(f"{vdir}/bloom")
            info["bloom_cols"] = sorted(
                r["col"] for r in bl.select("col").distinct().collect()
            )
            geo = bl.select("n_bits", "k").first()
            info["bloom_geometry"] = {
                "n_bits": geo["n_bits"], "k": geo["k"]
            }
        out["versions"][v] = info
    return out
