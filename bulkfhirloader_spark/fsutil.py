"""Filesystem helpers that go through Spark's Hadoop FileSystem API, so
they work against whatever storage the session is configured for (local
disk here; HDFS/S3A on a cluster) — never the driver's local ``os.path``,
which would silently disagree with object-store-backed deployments."""

from __future__ import annotations


def fs_path_exists(spark, path: str) -> bool:
    """True iff ``path`` exists on the session's Hadoop filesystem (the
    public FileSystem#exists — one namenode/list call, no Spark job)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))
