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


def file_len(spark, path: str) -> int | None:
    """Size in bytes via the Hadoop FS (any scheme); None if unknowable."""
    try:
        fs, jpath = hadoop_fs(spark, path)
        return int(fs.getFileStatus(jpath).getLen())
    except Exception:
        return None
