"""Scheme-aware filesystem helpers (Hadoop FileSystem API).

``file://``, ``s3a://``, ``hdfs://`` all resolve through the same API, so
store probes and size estimates behave identically on a laptop and on a
cluster — the replacement for ``os.listdir``/``os.path.getsize`` calls
that silently see nothing on remote stores.
"""

from __future__ import annotations

from urllib.parse import urlparse


def hadoop_fs(spark, path: str):
    """(FileSystem, Path) for any scheme Hadoop supports.  Raises on
    sessions without a JVM gateway (Spark Connect) — callers fall back."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def is_local_path(path: str) -> bool:
    """True for plain paths and file:// URIs (safe for os-level renames)."""
    return urlparse(path).scheme in ("", "file")


# Filesystems whose directory rename is ATOMIC (a metadata operation):
# local/file, HDFS, viewfs.  Object stores (s3a, gs, wasb/abfs in their
# non-hierarchical modes) implement rename as copy+delete — swapping a
# live index through one risks readers seeing a half-copied store, so
# callers needing an atomic swap must refuse there.
ATOMIC_RENAME_SCHEMES = {"", "file", "hdfs", "viewfs"}


def supports_atomic_rename(path: str) -> bool:
    return urlparse(path).scheme in ATOMIC_RENAME_SCHEMES


def fs_exists(spark, path: str) -> bool:
    fs, jpath = hadoop_fs(spark, path)
    return bool(fs.exists(jpath))


def fs_rename(spark, src: str, dst: str) -> bool:
    """Filesystem-level rename (atomic only on ATOMIC_RENAME_SCHEMES);
    False when the filesystem refuses (e.g. dst exists on some FSes)."""
    fs, jsrc = hadoop_fs(spark, src)
    _, jdst = hadoop_fs(spark, dst)
    return bool(fs.rename(jsrc, jdst))


def fs_delete(spark, path: str) -> bool:
    """Recursive delete; False if the path did not exist."""
    fs, jpath = hadoop_fs(spark, path)
    return bool(fs.delete(jpath, True))


def fs_copy_file(spark, src: str, dst: str) -> None:
    """Single-file copy via Hadoop FileUtil (any scheme pair)."""
    jvm = spark._jvm
    sfs, jsrc = hadoop_fs(spark, src)
    dfs, jdst = hadoop_fs(spark, dst)
    jvm.org.apache.hadoop.fs.FileUtil.copy(
        sfs, jsrc, dfs, jdst, False, spark._jsc.hadoopConfiguration())


def file_len(spark, path: str) -> int | None:
    """Size in bytes via the Hadoop FS (any scheme); None if unknowable."""
    try:
        fs, jpath = hadoop_fs(spark, path)
        return int(fs.getFileStatus(jpath).getLen())
    except Exception:
        return None
