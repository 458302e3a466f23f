"""Small-file / pointer IO through the Hadoop FileSystem API.

Version pointers, centroid JSON, and _SUCCESS probes are KB-sized
driver-side reads and writes — but on a real deployment the dataset
root is ``s3a://`` / ``hdfs://`` / ``abfs://``, where ``pathlib`` and
``open()`` silently operate on the DRIVER'S LOCAL DISK instead of the
store the Spark writers target. Every helper here resolves the path
against the session's Hadoop configuration, so the same code handles
``/local/path``, ``file://``, and any object store whose connector is
on the classpath; nothing data-sized ever flows through the driver.

Atomicity note: ``write_text_atomic`` stages to ``<path>.tmp`` and
renames. POSIX/HDFS renames are atomic; object-store connectors
emulate rename (copy+delete) — there the pointer flip degrades to
last-writer-wins over a tiny window, which is the store's native PUT
semantics anyway. Readers that resolved the previous pointer keep
reading their immutable ``v=K`` directory regardless (see
``sources.gating.versioned_publish``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` under the session's Hadoop conf."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return bool(fs.exists(p))


def is_committed(spark: SparkSession, path: str) -> bool:
    """True if ``path`` holds a committed Spark output (``_SUCCESS``
    marker present — a bare directory is a torn write)."""
    fs, p = _fs(spark, path)
    _, success = _fs(spark, path.rstrip("/") + "/_SUCCESS")
    return bool(fs.exists(p)) and bool(fs.exists(success))


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, p = _fs(spark, path)
    fs.mkdirs(p)


def delete(spark: SparkSession, path: str, recursive: bool = True) -> None:
    fs, p = _fs(spark, path)
    if fs.exists(p):
        fs.delete(p, recursive)


def read_text(spark: SparkSession, path: str) -> str:
    """Read a small (pointer/metadata-sized) text file."""
    fs, p = _fs(spark, path)
    stream = fs.open(p)
    try:
        # commons-io ships with Hadoop; py4j byte[] args are passed by
        # value, so a read(buf) loop can't work from Python.
        return spark.sparkContext._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def write_text_atomic(spark: SparkSession, path: str, text: str) -> None:
    """Write a small text file via stage-to-``.tmp`` + rename (atomic
    on POSIX/HDFS; best-effort on object-store connectors that emulate
    rename — see module docstring)."""
    fs, p = _fs(spark, path)
    _, tmp = _fs(spark, path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if not fs.rename(tmp, p):
        # HDFS refuses rename onto an existing file; replace explicitly
        fs.delete(p, False)
        if not fs.rename(tmp, p):
            raise RuntimeError(f"atomic pointer write failed: {path}")


def create_exclusive(
    spark: SparkSession, path: str, text: str | None = None
) -> bool:
    """Atomically create a marker file, failing if it already
    exists — the optimistic-concurrency claim primitive
    (``FileSystem.create(path, overwrite=false)`` is atomic on
    POSIX/HDFS; object-store connectors emulate it with a
    conditional-put where supported). Returns True when THIS caller
    created the file, False when someone else holds it.

    ``text`` (optional) is written into the just-created stream —
    the CAS tickets of the table facade record their TARGET this way
    so a crashed winner's transition can be completed by the next
    contender. The atomic step is the create; a crash between create
    and close leaves an EMPTY ticket, which readers must treat as
    in-doubt (see ``sources.optimize._cas_flip``)."""
    fs, p = _fs(spark, path)
    try:
        out = fs.create(p, False)
    except Exception:
        return False
    try:
        if text:
            out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    return True


def list_files(spark: SparkSession, root: str, glob: str) -> list[str]:
    """Names (last path segment) of plain FILES matching
    ``root/glob`` — the claim-marker counterpart of
    :func:`list_subdirs` (exclusive-create claims are empty files,
    which ``list_subdirs``'s isDirectory filter deliberately hides
    from batch/version discovery)."""
    fs, _ = _fs(spark, root)
    jvm = spark.sparkContext._jvm
    pattern = jvm.org.apache.hadoop.fs.Path(root, glob)
    statuses = fs.globStatus(pattern)
    if statuses is None:
        return []
    return [s.getPath().getName() for s in statuses if s.isFile()]


def list_subdirs(spark: SparkSession, root: str, glob: str) -> list[str]:
    """Names (last path segment) of directories matching
    ``root/glob``."""
    fs, _ = _fs(spark, root)
    jvm = spark.sparkContext._jvm
    pattern = jvm.org.apache.hadoop.fs.Path(root, glob)
    statuses = fs.globStatus(pattern)
    if statuses is None:
        return []
    return [
        s.getPath().getName() for s in statuses if s.isDirectory()
    ]


def status_token(spark: SparkSession, path: str):
    """(modification-time-ms, length) of a file, or None when absent —
    a cheap change token for small metadata files (one FileSystem
    stat). Used by the Table facade to self-validate per-handle
    caches of the SCHEMA file: a second writer handle rewriting it
    (``write_text_atomic`` = create + rename, so both fields move)
    invalidates every other handle's cache on its next access."""
    fs, p = _fs(spark, path)
    try:
        st = fs.getFileStatus(p)
    except Exception:
        return None
    return (st.getModificationTime(), st.getLen())
