"""File-level zone maps (min/max skipping statistics), file-level
Bloom filters, and manifest-pruned reads — the data-skipping layer
over plain parquet.

The reference's only pruning device is hive partitioning
(year/month/city directories); parquet row-group stats prune WITHIN a
scan, but the scan still *plans* every file. At 100 TB what matters is
never touching most files at all: a **zone-map manifest** — one tiny
row per data file holding min/max/null-count per indexed column — lets
the reader intersect a conjunction of range predicates against file
bounding boxes and hand Spark only the files that can match, exactly
the planning model of Iceberg/Delta manifests and the zone maps of
Netezza / Snowflake micro-partitions (Dageville et al., SIGMOD'16).

Composes with :func:`operators.layout.zorder_layout`: Z-ordered files
have tight bounding boxes in EVERY clustered dimension, so the same
manifest prunes on any conjunction of dims (a lexicographic sort is
tight only in its leading column).

Scale/consistency notes:
- The manifest BUILD is one distributed scan (``input_file_name()``
  groupBy — map-side combinable, one exchange carrying a few rows per
  file×partition). Incremental maintenance reads ONLY new files.
- Pruning itself is a METADATA-plane operation: the manifest is
  file-count-sized (~100 K rows for 100 TB at 1 GB files), so
  collecting the surviving file list to the driver is the same cost
  class as Iceberg's manifest planning — deliberately driver-side,
  NOT a data-plane collect.
- Zone semantics are null-safe for the range predicates served here:
  a file whose indexed column is all-NULL has NULL min/max and can
  never satisfy ``col BETWEEN lo AND hi`` (NULL-rejecting), so the
  ``coalesce(..., false)`` keep-condition skips it soundly; rows with
  NULL in a *kept* file are dropped by the residual filter.
- A stale manifest is a correctness hazard (a new file invisible to
  the manifest would be silently un-scanned), so :func:`pruned_read`
  verifies the manifest's file set against the actual listing by
  default and fails loudly on drift.
- Kept files are read with ``.option("basePath", root)`` so hive
  partition columns (e.g. the ``batch_id=`` layout
  :func:`stream_sink_with_manifest` writes) survive pruning — the
  pruned schema is identical to the full-scan schema on partitioned
  and unpartitioned roots alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (col, lo, hi) closed interval; bounds may be numeric OR string (zone
# min/max order is the column's natural order either way — a string
# range like ("event_type", "click", "click") serves equality pruning
# on a layout sorted/clustered by that column).
Bound = float | int | str | None
Predicate = tuple[str, Bound, Bound]


def list_data_files(spark: SparkSession, root: str) -> list[str]:
    """URIs of the data files under ``root`` (recursive; skips
    ``_SUCCESS``/hidden/dot files), in the same ``file://...`` form
    ``input_file_name()`` emits — a pure FileSystem-metadata call."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(root)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    out: list[str] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        out.append(st.getPath().toUri().toString())
    return sorted(out)


_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64_py(data: bytes, seed: int = 42) -> int:
    """Standard XXH64 over ``data`` — bit-exact with Spark's
    ``F.xxhash64`` on a string column (UTF-8 bytes, default seed 42;
    pinned against Spark in ``tests/test_skipping.py``). Returns the
    SIGNED value Spark emits. Exists so a DRIVER-side file listing
    can carry the same order-independent set signature the manifest
    aggregates compute distributedly — comparing the two then costs
    zero Spark jobs (see :func:`combined_pruned_read`)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i + 32 <= n:
            k1 = int.from_bytes(data[i:i + 8], "little")
            v1 = (_rotl64((v1 + k1 * _XXP2) & _M64, 31) * _XXP1) & _M64
            k2 = int.from_bytes(data[i + 8:i + 16], "little")
            v2 = (_rotl64((v2 + k2 * _XXP2) & _M64, 31) * _XXP1) & _M64
            k3 = int.from_bytes(data[i + 16:i + 24], "little")
            v3 = (_rotl64((v3 + k3 * _XXP2) & _M64, 31) * _XXP1) & _M64
            k4 = int.from_bytes(data[i + 24:i + 32], "little")
            v4 = (_rotl64((v4 + k4 * _XXP2) & _M64, 31) * _XXP1) & _M64
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7)
            + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            v = (_rotl64((v * _XXP2) & _M64, 31) * _XXP1) & _M64
            h = (((h ^ v) * _XXP1) + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        k = (_rotl64((k * _XXP2) & _M64, 31) * _XXP1) & _M64
        h = ((_rotl64(h ^ k, 27) * _XXP1) + _XXP4) & _M64
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i:i + 4], "little")
        h = ((_rotl64(h ^ ((k * _XXP1) & _M64), 23) * _XXP2) + _XXP3) & _M64
        i += 4
    while i < n:
        h = (_rotl64(h ^ ((data[i] * _XXP5) & _M64), 11) * _XXP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def _listing_df(spark: SparkSession, root: str) -> DataFrame:
    """The directory listing as a one-column frame — the form every
    manifest reconciliation joins against (round 11: keep-set and
    gone-set logic is distributed semi/anti joins; the listing itself
    is driver-side by nature, the same memory Spark's own file index
    pays)."""
    return spark.createDataFrame(
        [(f,) for f in list_data_files(spark, root)], "file string"
    )


def _empty_file_rows(scan: DataFrame, stats: DataFrame) -> DataFrame:
    """Manifest rows for data files of ``scan`` that produced NO
    group row (zero-row parquet files — a filtered-to-empty batch
    partition writes one): a ``groupBy(input_file_name())`` can never
    see them, yet they ARE in the directory listing, so without an
    explicit row the fail-closed staleness check would reject every
    read of a table containing one. The synthesized row pins the
    empty-file semantics: ``n_rows = 0`` and NULL stats — every
    keep-condition then skips the file (it matches nothing), which is
    exact. ``inputFiles()`` is a driver-side metadata call in the
    same ``file://`` URI form ``input_file_name()`` emits."""
    spark = scan.sparkSession
    listed = spark.createDataFrame(
        [(f,) for f in scan.inputFiles()], "file string"
    )
    missing = listed.join(stats.select("file"), "file", "left_anti")
    filled = [F.lit(0).cast("bigint").alias("n_rows")] + [
        F.lit(None).cast(dict(stats.dtypes)[c]).alias(c)
        if not c.endswith("__nulls")
        else F.lit(0).cast("bigint").alias(c)
        for c in stats.columns
        if c not in ("file", "n_rows")
    ]
    return missing.select("file", *filled)


def build_zone_manifest(
    scan: DataFrame, cols: list[str]
) -> DataFrame:
    """One manifest row per data file of ``scan`` (which must be a
    file-backed read — ``spark.read.parquet(...)``): ``file``,
    ``n_rows``, and ``<col>__min`` / ``<col>__max`` / ``<col>__nulls``
    for each indexed column. One distributed pass; the exchange
    carries per-(file, partition) partial rows only. Zero-row files
    get an explicit (n_rows=0, NULL stats) row so the listing check
    stays satisfiable (see :func:`_empty_file_rows`)."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.sum(F.col(c).isNull().cast("bigint"))
            .cast("bigint")
            .alias(f"{c}__nulls"),
        ]
    stats = scan.groupBy(F.input_file_name().alias("file")).agg(*aggs)
    return stats.unionByName(_empty_file_rows(scan, stats))


def update_zone_manifest(
    spark: SparkSession,
    root: str,
    manifest: DataFrame,
    cols: list[str],
) -> DataFrame:
    """Incrementally reconcile ``manifest`` with the files actually
    under ``root``: stats for NEW files are computed by reading ONLY
    those files (O(new data), never O(table)); rows for files that
    disappeared (compaction, retention delete) are dropped. Returns a
    manifest identical to a from-scratch :func:`build_zone_manifest`
    over the current listing (pinned in tests). Driver-side
    materialization is bounded by the NEW files (which must be listed
    to be read anyway) — known-file reconciliation is distributed
    semi/anti joins, never a per-file Python set (round 11)."""
    actual_df = _listing_df(spark, root)
    new = sorted(
        r["file"]
        for r in actual_df.join(
            manifest.select("file"), "file", "left_anti"
        ).collect()
    )
    # drop rows for files that disappeared: semi-join against the
    # current listing (distributed — no driver-side gone-set)
    out = manifest.join(actual_df, "file", "left_semi")
    if new:
        out = out.unionByName(
            build_zone_manifest(spark.read.parquet(*new), cols)
        )
    return out


def zone_keep_condition(predicates: list[Predicate]):
    """Boolean keep-condition over manifest rows for a conjunction of
    closed-interval predicates ``(col, lo, hi)`` (``None`` = that side
    unbounded). A file is kept iff its [min, max] box intersects every
    interval; all-NULL zones (NULL min/max) are skipped — sound
    because the served predicates are NULL-rejecting."""
    cond = F.lit(True)
    for c, lo, hi in predicates:
        if lo is not None:
            cond = cond & F.coalesce(
                F.col(f"{c}__max") >= F.lit(lo), F.lit(False)
            )
        if hi is not None:
            cond = cond & F.coalesce(
                F.col(f"{c}__min") <= F.lit(hi), F.lit(False)
            )
        if lo is None and hi is None:
            # col IS NOT NULL-style presence predicate: needs at least
            # one non-null value in the zone
            cond = cond & (
                F.coalesce(F.col(f"{c}__nulls"), F.lit(0))
                < F.col("n_rows")
            )
    return cond


def _read_kept(
    spark: SparkSession, root: str, keep: list[str], schema=None
) -> DataFrame:
    """Plan ONLY the kept leaf files. ``basePath=root`` makes Spark
    derive hive partition columns relative to the table root, so a
    pruned read of a partitioned layout (``batch_id=.../part-*``)
    keeps the same schema as the full scan; the zero-files branch
    takes its schema from the same root read, so both branches agree
    on partitioned and plain roots alike. An explicit ``schema``
    (StructType) aligns heterogeneous files under schema evolution:
    files missing a column null-fill it, partition columns still
    append (the facade's widest-schema read)."""
    if schema is not None:
        rd = spark.read.schema(schema).option("basePath", root)
        if not keep:
            return rd.parquet(root).limit(0)
        return rd.parquet(*keep)
    if not keep:
        return spark.createDataFrame([], spark.read.parquet(root).schema)
    return spark.read.option("basePath", root).parquet(*keep)


def _apply_range_residual(
    df: DataFrame, predicates: list[Predicate]
) -> DataFrame:
    for c, lo, hi in predicates:
        if lo is not None:
            df = df.filter(F.col(c) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(c) <= F.lit(hi))
        if lo is None and hi is None:
            df = df.filter(F.col(c).isNotNull())
    return df


def pruned_read(
    spark: SparkSession,
    root: str,
    manifest: DataFrame,
    predicates: list[Predicate],
    verify: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """Read ``root`` scanning ONLY the files whose zone boxes can
    satisfy the conjunction of ``predicates``, then apply the exact
    residual filter — semantically identical to a full scan + filter
    (pinned in tests and by the ``l_zone_pruned_agg`` oracle), but
    the skipped files are never even planned.

    ``verify=True`` (default) checks the manifest covers exactly the
    files actually present and raises on drift — a stale manifest
    would silently drop unindexed files from results, the one failure
    mode a zone-map layer must fail CLOSED on. Pass ``stats={}`` to
    record ``files_total`` / ``files_read``."""
    return combined_pruned_read(
        spark,
        root,
        zone_manifest=manifest,
        range_predicates=predicates,
        verify=verify,
        stats=stats,
        _what="pruned_read",
    )


# ----- file-level Bloom filters (point-lookup skipping) ---------------
#
# Zone maps answer RANGE conjunctions and need the layout to cluster
# the indexed column (a file's [min, max] box over an unclustered
# high-cardinality key spans the whole domain — nothing prunes). A
# per-file BLOOM FILTER prunes equality/IN-list predicates on exactly
# those columns: k seeded xxhash64 bit positions per value, one
# n_bits-wide bitset per (file, column), membership answered from the
# manifest alone. No false negatives ever (a present value's bits are
# all set — correctness is unconditional); false positives only cost
# an extra file read. Same metadata-plane planning model as the zone
# path: the manifest is file-count-sized, the probe condition runs as
# Spark expressions over it (the literal hashes with the SAME
# xxhash64 the build used), and the kept-file list collects to the
# driver — Delta/Iceberg's file-level bloom stats over plain parquet.

# column types whose CAST AS STRING rendering is guaranteed to match
# the probe literal's string form — the hash-domain contract that
# makes "no false negatives" unconditional. A double column would
# render 7 as '7.0' while an int probe hashes '7': silent false
# negatives, so any other type is rejected at BUILD time.
_INTEGRAL_TYPES = frozenset({"tinyint", "smallint", "int", "bigint"})
_BLOOMABLE_TYPES = _INTEGRAL_TYPES | {"string"}


def _sql_str_lit(v: str) -> str:
    """A string key as a Spark-SQL expression that cannot be broken
    or altered by its content: hex-encode the UTF-8 bytes and decode
    in-engine. Quotes, backslashes, and newlines in the key never
    touch the SQL parser (and the result is independent of parser
    escaping modes like ``spark.sql.parser.escapedStringLiterals``);
    the decoded value is a plain STRING, so it hashes in the same
    domain as the build side's CAST AS STRING."""
    return f"decode(unhex('{v.encode('utf-8').hex().upper()}'), 'UTF-8')"


def _bloom_positions(col_expr: str, n_bits: int, k: int) -> str:
    """SQL fragment: the k seeded bit positions of ``col_expr``
    (empty array for NULL — equality predicates are NULL-rejecting,
    so NULLs must not set bits). Hashes the STRING form: Spark's
    xxhash64 is Catalyst-TYPE-sensitive (an int and a bigint of the
    same value hash differently), and the probe side hashes literals
    whose type need not match the column's — the cast pins one hash
    domain for both."""
    return (
        f"CASE WHEN {col_expr} IS NULL THEN array() ELSE "
        f"transform(sequence(0, {k - 1}), "
        f"j -> pmod(xxhash64(j, CAST({col_expr} AS STRING)), {n_bits}))"
        " END"
    )


def build_bloom_manifest(
    scan: DataFrame, cols: list[str], n_bits: int = 4096, k: int = 5
) -> DataFrame:
    """One row per (data file, indexed column) of ``scan``:
    ``file``, ``col``, ``col_type`` (the indexed column's Spark type,
    recorded so the probe can verify its literals live in the same
    hash domain), ``n_bits``, ``k`` and the bitset ``bloom``
    (``n_bits/64`` bigint words). Build is distributed and
    map-side-combinable: explode k positions per (row, col), fold
    per-(file, col, word) with ``bit_or`` (the partial-agg shape —
    the exchange carries at most ``n_bits/64`` rows per file×col per
    partition), assemble the word array from the at-most-64-entry
    map. ``n_bits`` must be a multiple of 64. Only integral and
    string columns are indexable: any other type's CAST AS STRING
    need not match a probe literal's form, which would break the
    no-false-negatives contract."""
    if n_bits % 64:
        raise ValueError(f"build_bloom_manifest: n_bits={n_bits} not /64")
    dtypes = dict(scan.dtypes)
    col_types: dict[str, str] = {}
    for c in cols:
        t = dtypes.get(c)
        if t not in _BLOOMABLE_TYPES:
            raise TypeError(
                f"build_bloom_manifest: column {c!r} has type {t!r}; "
                f"only {sorted(_BLOOMABLE_TYPES)} are bloom-indexable "
                "(other types' CAST AS STRING rendering need not match "
                "a probe literal — silent false negatives)"
            )
        col_types[c] = t
    n_words = n_bits // 64
    pos_structs = ", ".join(
        f"transform({_bloom_positions(c, n_bits, k)},"
        f" p -> struct('{c}' AS col, p AS pos))"
        for c in cols
    )
    ex = scan.select(
        F.input_file_name().alias("file"),
        F.explode(F.expr(f"flatten(array({pos_structs}))")).alias("t"),
    ).select("file", "t.col", "t.pos")
    words = ex.groupBy(
        "file", "col", F.expr("pos div 64").alias("word")
    ).agg(
        F.expr(
            "bit_or(shiftleft(1L, CAST(pos % 64 AS INT)))"
        ).alias("bits")
    )
    type_map = F.create_map(
        *[x for c, t in col_types.items() for x in (F.lit(c), F.lit(t))]
    )
    stats = (
        words.groupBy("file", "col")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("word", "bits"))
            ).alias("__m")
        )
        .select(
            "file",
            "col",
            type_map[F.col("col")].alias("col_type"),
            F.lit(n_bits).alias("n_bits"),
            F.lit(k).alias("k"),
            F.expr(
                f"transform(sequence(0, {n_words - 1}),"
                " w -> coalesce(__m[CAST(w AS BIGINT)], 0L))"
            ).alias("bloom"),
        )
    )
    # zero-row files (and all-NULL columns, which set no bits) never
    # form a group — synthesize all-zero bitsets so the fail-closed
    # listing check stays satisfiable; a zero bitset answers every
    # membership probe 'absent', which is exact for a file holding no
    # values of the column (see _empty_file_rows for the zone analog).
    spark = scan.sparkSession
    listed = spark.createDataFrame(
        [(f, c) for f in scan.inputFiles() for c in cols],
        "file string, col string",
    )
    missing = listed.join(
        stats.select("file", "col"), ["file", "col"], "left_anti"
    ).select(
        "file",
        "col",
        type_map[F.col("col")].alias("col_type"),
        F.lit(n_bits).alias("n_bits"),
        F.lit(k).alias("k"),
        F.expr(
            f"transform(sequence(0, {n_words - 1}), w -> 0L)"
        ).alias("bloom"),
    )
    return stats.unionByName(missing)


def _bloom_probe_tests(
    col: str, col_type: str, values: list, n_bits: int, k: int
) -> str:
    """The OR-of-memberships probe expression over manifest rows for
    one IN-list. Validates both sides of the hash-domain contract:
    probe VALUES must be int or str (a float literal's string form
    need not match CAST AS STRING), and the indexed COLUMN's recorded
    type must agree with the literal kind (probing a string column
    with int keys — or vice versa — hashes a different rendering and
    would produce silent false negatives)."""
    tests = []
    for v in values:
        if not isinstance(v, (int, str)) or isinstance(v, bool):
            raise TypeError(
                f"bloom probe: point-lookup values must be "
                f"int or str, got {type(v).__name__}"
            )
        if isinstance(v, int) and col_type not in _INTEGRAL_TYPES:
            raise TypeError(
                f"bloom probe: int key {v!r} against column {col!r} of "
                f"type {col_type!r} — the build hashed the column's "
                "CAST AS STRING form, which does not match an integer "
                "literal's; probe with the column's own type"
            )
        if isinstance(v, str) and col_type != "string":
            raise TypeError(
                f"bloom probe: str key {v!r} against column {col!r} of "
                f"type {col_type!r} — hash domains differ; probe with "
                "the column's own type"
            )
        lit = _sql_str_lit(v) if isinstance(v, str) else f"{v}L"
        tests.append(
            f"forall({_bloom_positions(lit, n_bits, k)}, "
            "p -> (shiftright(element_at(bloom, CAST(p div 64 AS INT)"
            " + 1), CAST(p % 64 AS INT)) & 1L) = 1L)"
        )
    return " OR ".join(tests)


def _bloom_keep_df(
    manifest: DataFrame, in_predicates: list[tuple[str, list]]
) -> DataFrame:
    """``(file, __bk)`` — one row per file indexed for ALL probed
    columns, ``__bk`` = the conjunction of its membership tests.
    NOTHING file-count-sized is collected here (round 11: at
    10^6-10^7 files the per-file name set was a driver-memory
    bottleneck): the membership tests run as Spark expressions over
    the manifest frame and the caller folds this frame into its one
    summary aggregate + keep-sized paths collect. Files missing one
    probed column's pivot row are ABSENT (not kept-false): they must
    surface in the listing check as unindexed — fail closed, never a
    silent skip. The one driver-side piece is the per-column hash
    geometry — a column-count-sized aggregate."""
    for col, values in in_predicates:
        if not values:
            raise ValueError(
                f"bloom probe: empty IN-list for {col!r} — nothing to "
                "look up"
            )
    if "col_type" not in manifest.columns:
        raise ValueError(
            "bloom probe: manifest predates the col_type column "
            "(pre-upgrade cache) — migrate it with "
            "update_bloom_manifest(root=...), which re-derives the "
            "column types from the data schema, or rebuild with "
            "build_bloom_manifest"
        )
    probe_names = [c for c, _ in in_predicates]
    if len(set(probe_names)) != len(probe_names):
        raise ValueError(
            "bloom probe: duplicate column in in_predicates "
            f"({probe_names}) — merge the IN-lists first (two lists on "
            "one column mean their intersection-of-keeps, which a "
            "single combined list cannot express; pass the smaller "
            "list and apply the other as a residual filter)"
        )
    # one tiny geometry collect per indexed col (scalars only)
    geo_rows = (
        manifest.groupBy("col")
        .agg(
            F.first("col_type").alias("col_type"),
            F.first("n_bits").alias("n_bits"),
            F.first("k").alias("k"),
        )
        .collect()
    )
    geo = {r["col"]: r for r in geo_rows}
    probe_cols = [c for c, _ in in_predicates]
    for c in probe_cols:
        if c not in geo:
            raise ValueError(
                f"bloom probe: column {c!r} is not bloom-indexed "
                f"(manifest covers {sorted(geo)})"
            )
    # per-file: indexed by every probed col AND every probed col's
    # membership test passes. Pivot the per-(file, col) rows to one
    # row per file carrying each probed col's keep boolean.
    per_col = []
    for c, values in in_predicates:
        g = geo[c]
        per_col.append(
            manifest.filter(F.col("col") == c).select(
                "file",
                F.expr(
                    _bloom_probe_tests(
                        c, g["col_type"], values, g["n_bits"], g["k"]
                    )
                ).alias(f"__keep_{c}"),
            )
        )
    joined = per_col[0]
    for other in per_col[1:]:
        joined = joined.join(other, "file", "inner")
    keep_cond = F.lit(True)
    for c in probe_cols:
        keep_cond = keep_cond & F.col(f"__keep_{c}")
    return joined.select("file", keep_cond.alias("__bk"))


def bloom_pruned_read(
    spark: SparkSession,
    root: str,
    manifest: DataFrame,
    col: str,
    values: list,
    verify: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """Read ``root`` scanning only the files whose bloom bitset for
    ``col`` CAN contain at least one of ``values`` (an IN-list /
    equality point lookup), then apply the exact residual filter.
    Never a false negative — a file holding a value always has all k
    bits set, so semantics equal the full scan + filter (pinned in
    tests and the ``l_bloom_point_lookup`` oracle). The probe hashes
    the literals with the SAME seeded xxhash64 expressions the build
    used, evaluated over the manifest frame — no Python
    reimplementation of the hash to drift, and no bitset ever
    collected to the driver. ``verify``/``stats`` as in
    :func:`pruned_read`."""
    return combined_pruned_read(
        spark,
        root,
        bloom_manifest=manifest,
        in_predicates=[(col, values)],
        verify=verify,
        stats=stats,
        _what="bloom_pruned_read",
    )


def combined_pruned_read(
    spark: SparkSession,
    root: str,
    zone_manifest: DataFrame | None = None,
    bloom_manifest: DataFrame | None = None,
    range_predicates: list[Predicate] | None = None,
    in_predicates: list[tuple[str, list]] | None = None,
    verify: bool = True,
    stats: dict | None = None,
    _what: str = "combined_pruned_read",
    schema=None,
) -> DataFrame:
    """ONE metadata-plane read that stacks BOTH skipping devices: the
    zone manifest prunes the range conjunction, the bloom manifest
    prunes the IN-lists, and the file sets INTERSECT — the common
    query shape (date range + id IN-list) skips multiplicatively
    instead of picking one index. Result is semantically identical to
    the full scan + all filters (each keep-set is individually sound
    and superset-of-matching, so their intersection still covers
    every matching file; pinned in tests with value equality and
    ``files_read ≤ min(zone_only, bloom_only)``).

    Either manifest may be omitted (degenerates to the single-index
    readers — :func:`pruned_read` and :func:`bloom_pruned_read` are
    thin wrappers over this). ``stats={}`` records ``files_total``,
    ``files_read`` and, when both indexes participate,
    ``files_zone_kept`` / ``files_bloom_kept``."""
    range_predicates = list(range_predicates or [])
    in_predicates = list(in_predicates or [])
    if zone_manifest is None and bloom_manifest is None:
        raise ValueError(f"{_what}: need at least one manifest")
    if zone_manifest is not None and not range_predicates:
        raise ValueError(f"{_what}: zone manifest given but no "
                         "range_predicates")
    if bloom_manifest is not None and not in_predicates:
        raise ValueError(f"{_what}: bloom manifest given but no "
                         "in_predicates")
    # DISTRIBUTED keep-set plumbing (round 11): nothing
    # known-files-sized is ever materialized on the driver — each
    # manifest answers with ONE aggregate job carrying its kept paths
    # (keep-sized collect_list — the files the read will open), its
    # file count, and an order-independent FILE-SET SIGNATURE
    # (count + sum of xxhash64(file)); set-equality checks
    # (zone vs bloom agreement, manifest vs listing staleness) compare
    # signatures in Python. A MISMATCH pays the exact anti-join jobs
    # that name the differing files, so a collision there can cost
    # jobs but never a wrong error; a MATCH trusts the signature —
    # two differing sets colliding on (count, Σxxhash64) would be
    # accepted, at ~n/2^64 probability per check, which we accept
    # (same risk class as content-hash dedup anywhere else in the
    # engine). No cross-frame joins on the happy path: at 10^6-10^7
    # files the old per-file Python sets were a driver bottleneck,
    # and a full-outer reconciliation join would shuffle where two
    # single-frame aggregates suffice.
    def _sig_aggs(keep_cond):
        return [
            F.sort_array(
                F.collect_list(F.when(keep_cond, F.col("file")))
            ).alias("kept"),
            F.count("file").alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("file").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ]

    def _exact_diff(known_df, what_a: str, other_df, what_b: str):
        """Failure path: name up to 3 files on each side of the
        set difference (exact anti-joins)."""
        only_a = known_df.join(other_df, "file", "left_anti")
        only_b = other_df.join(known_df, "file", "left_anti")
        n_a, n_b = only_a.count(), only_b.count()
        ex_a = sorted(r["file"] for r in only_a.limit(3).collect())
        ex_b = sorted(r["file"] for r in only_b.limit(3).collect())
        return n_a, ex_a, n_b, ex_b

    zrow = brow = None
    zknown = bknown = None
    if zone_manifest is not None:
        zknown = zone_manifest.select("file")
        zrow = zone_manifest.agg(
            *_sig_aggs(zone_keep_condition(range_predicates))
        ).head()
    if bloom_manifest is not None:
        bpivot = _bloom_keep_df(bloom_manifest, in_predicates)
        bknown = bpivot.select("file")
        brow = bpivot.agg(
            *_sig_aggs(F.coalesce(F.col("__bk"), F.lit(False)))
        ).head()
    if zrow is not None and brow is not None:
        if (zrow["n"], zrow["h"]) != (brow["n"], brow["h"]):
            n_a, ex_a, n_b, ex_b = _exact_diff(
                zknown, "zone", bknown, "bloom"
            )
            if n_a or n_b:  # signature mismatch confirmed exactly
                raise ValueError(
                    f"{_what}: zone and bloom manifests disagree on "
                    f"the file set for {root} ({n_a + n_b} file(s) "
                    f"differ; zone-only e.g. {ex_a}, bloom-only e.g. "
                    f"{ex_b}) — reconcile both manifests to the same "
                    "listing first."
                )
    known_row = zrow if zrow is not None else brow
    known_df = zknown if zknown is not None else bknown
    assert known_row is not None and known_df is not None
    if verify:
        # the listing's set signature computes DRIVER-side with the
        # bit-exact python XXH64 — zero Spark jobs on the happy path
        actual = list_data_files(spark, root)
        l_n = len(actual)
        l_h = sum(xxh64_py(f.encode("utf-8")) for f in actual)
        if (l_n, l_h) != (int(known_row["n"]), int(known_row["h"])):
            actual_df = _listing_df(spark, root)
            n_missing, missing, n_extra, extra = _exact_diff(
                actual_df, "listing", known_df, "manifest"
            )
            if n_missing or n_extra:
                raise ValueError(
                    f"{_what}: manifest is stale for {root}: "
                    f"{n_missing} unindexed file(s) (e.g. {missing}), "
                    f"{n_extra} vanished file(s) (e.g. {extra}); "
                    "update the manifest first — reading through a "
                    "stale manifest would silently drop data."
                )
    if zrow is not None and brow is not None:
        keep_list = sorted(set(zrow["kept"]) & set(brow["kept"]))
    else:
        # set() also collapses duplicate manifest rows for the same
        # file — reading a file twice would duplicate output rows,
        # and a dup slips through the signature check (the exact
        # diff finds no SET difference, so no error names it)
        keep_list = sorted(set(known_row["kept"]))
    if stats is not None:
        stats["files_total"] = int(known_row["n"])
        stats["files_read"] = len(keep_list)
        if zrow is not None and brow is not None:
            stats["files_zone_kept"] = len(zrow["kept"])
            stats["files_bloom_kept"] = len(brow["kept"])
    df = _read_kept(spark, root, keep_list, schema=schema)
    df = _apply_range_residual(df, range_predicates)
    for c, values in in_predicates:
        df = df.filter(F.col(c).isin(*values))
    return df


# ----- streaming maintenance --------------------------------------------


def stream_sink_with_manifest(
    spark: SparkSession,
    source_dir: str,
    source_schema: str,
    data_path: str,
    manifest_path: str,
    cols: list[str],
    checkpoint_dir: str,
    bloom_manifest_path: str | None = None,
    bloom_cols: list[str] | None = None,
    bloom_n_bits: int = 4096,
    bloom_k: int = 5,
):
    """Continuously ingest parquet batches from ``source_dir`` into a
    zone-mapped (and optionally bloom-indexed) table: each micro-batch
    lands under ``data_path/batch_id=<id>`` (idempotent overwrite —
    the ledger family's replay discipline: a replayed batch rewrites
    its own partition, never double-appends) and the zone manifest at
    ``manifest_path`` is RECONCILED to the new listing before the
    batch completes — :func:`update_zone_manifest` reads only the
    files the batch just wrote, so manifest maintenance is O(batch),
    never O(table). When ``bloom_manifest_path`` is given the bloom
    manifest is maintained with the SAME discipline
    (:func:`update_bloom_manifest` — O(batch), idempotent replay,
    loud mixed-geometry guard), so a streamed table's point-lookup
    index never goes stale either. Readers therefore always see
    manifests that pass the fail-closed staleness checks.
    ``availableNow`` trigger: drain everything new since the last
    checkpoint, then stop (the periodic-ingest cadence)."""
    if (bloom_manifest_path is None) != (bloom_cols is None):
        raise ValueError(
            "stream_sink_with_manifest: bloom_manifest_path and "
            "bloom_cols must be given together"
        )

    def _sink(batch_df, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{data_path}/batch_id={batch_id}"
        )
        import os as _os

        batch_dir = f"{data_path}/batch_id={batch_id}"
        if _os.path.exists(_os.path.join(manifest_path, "_SUCCESS")):
            prev = spark.read.parquet(manifest_path)
        else:
            prev = build_zone_manifest(
                spark.read.parquet(batch_dir), cols
            ).limit(0)
        # materialize before overwriting the path being read from
        mf = update_zone_manifest(spark, data_path, prev, cols)
        mf.localCheckpoint().coalesce(1).write.mode("overwrite").parquet(
            manifest_path
        )
        spark.catalog.refreshByPath(manifest_path)
        if bloom_manifest_path is not None:
            if _os.path.exists(
                _os.path.join(bloom_manifest_path, "_SUCCESS")
            ):
                bprev = spark.read.parquet(bloom_manifest_path)
            else:
                bprev = build_bloom_manifest(
                    spark.read.parquet(batch_dir),
                    bloom_cols,
                    n_bits=bloom_n_bits,
                    k=bloom_k,
                ).limit(0)
            bmf = update_bloom_manifest(
                spark, data_path, bprev, bloom_cols,
                n_bits=bloom_n_bits, k=bloom_k,
            )
            bmf.localCheckpoint().coalesce(1).write.mode(
                "overwrite"
            ).parquet(bloom_manifest_path)
            spark.catalog.refreshByPath(bloom_manifest_path)

    return (
        spark.readStream.schema(source_schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(source_dir)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def update_bloom_manifest(
    spark: SparkSession,
    root: str,
    manifest: DataFrame,
    cols: list[str],
    n_bits: int = 4096,
    k: int = 5,
) -> DataFrame:
    """Incrementally reconcile a bloom manifest with the files under
    ``root`` — the :func:`update_zone_manifest` counterpart for the
    point-lookup bitsets: rows for vanished files drop, bitsets for
    NEW files are built by reading only those files. ``n_bits``/``k``
    must match the original build (asserted against the surviving
    rows — mixing hash geometries would silently break membership).

    Manifests persisted before the ``col_type`` column existed
    migrate in place: the column is re-derived from the DATA schema
    under ``root`` (sound — the build always recorded the scanned
    column's own type, which is exactly what the data still carries),
    so a warm pre-upgrade cache reconciles instead of erroring."""
    if "col_type" not in manifest.columns:
        dtypes = dict(spark.read.parquet(root).dtypes)
        missing = [c for c in cols if c not in dtypes]
        if missing:
            raise ValueError(
                "update_bloom_manifest: cannot migrate a pre-col_type "
                f"manifest — columns {missing} absent from the data "
                f"under {root}"
            )
        type_map = F.create_map(
            *[x for c in cols for x in (F.lit(c), F.lit(dtypes[c]))]
        )
        manifest = manifest.select(
            "file", "col", type_map[F.col("col")].alias("col_type"),
            "n_bits", "k", "bloom",
        )
    actual_df = _listing_df(spark, root)
    # geometry check distributed: one bounded collect of the first
    # still-live row whose geometry conflicts (round 11 — previously
    # every (file, n_bits, k) row shipped to the driver)
    bad = (
        manifest.join(actual_df, "file", "left_semi")
        .filter((F.col("n_bits") != n_bits) | (F.col("k") != k))
        .select("n_bits", "k")
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(
            "update_bloom_manifest: existing manifest built with "
            f"n_bits={bad[0]['n_bits']}, k={bad[0]['k']} but update "
            f"asked for n_bits={n_bits}, k={k} — bitsets with mixed "
            "hash geometry cannot answer membership"
        )
    new = sorted(
        r["file"]
        for r in actual_df.join(
            manifest.select("file"), "file", "left_anti"
        ).collect()
    )
    out = manifest.join(actual_df, "file", "left_semi")
    if new:
        out = out.unionByName(
            build_bloom_manifest(
                spark.read.parquet(*new), cols, n_bits=n_bits, k=k
            )
        )
    return out
