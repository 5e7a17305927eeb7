"""Hadoop-filesystem helpers shared by the stateful components
(streaming state, pipeline checkpoints): existence checks, small JSON
sidecar I/O and recursive deletes that resolve paths EXACTLY like the
DataFrame reader/writer does (local, hdfs://, s3a://, ...). Driver-local
``pathlib`` would silently check the wrong filesystem for any non-local
path — observed as "no history" on every streaming batch (round-5
review) — and mangles URI schemes on join ("hdfs://ns/x" ->
"hdfs:/ns/x"), so paths here are plain strings joined with "/"."""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` under the session's Hadoop conf."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, jpath = hadoop_fs(spark, path)
    return fs.exists(jpath)


def fs_delete(spark: SparkSession, path: str) -> bool:
    """Recursive delete; returns True if anything was removed."""
    fs, jpath = hadoop_fs(spark, path)
    return fs.delete(jpath, True)


def fs_mkdirs(spark: SparkSession, path: str) -> None:
    fs, jpath = hadoop_fs(spark, path)
    fs.mkdirs(jpath)


def fs_read_text(spark: SparkSession, path: str) -> str:
    fs, jpath = hadoop_fs(spark, path)
    stream = fs.open(jpath)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def fs_write_text(spark: SparkSession, path: str, text: str) -> None:
    fs, jpath = hadoop_fs(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def fs_append_text(spark: SparkSession, path: str, text: str) -> None:
    """Append emulated as read+rewrite: object stores (S3) reject true
    appends, and the callers are single-driver sidecar logs where the
    read-modify-write race does not arise."""
    existing = fs_read_text(spark, path) if fs_exists(spark, path) else ""
    fs_write_text(spark, path, existing + text)
