"""Filesystem maintenance through the Hadoop FileSystem API.

Maintenance paths (tombstone discovery, compaction rewrites) must work
wherever Spark can read — local disk in this sandbox, HDFS/S3A on a real
cluster. ``os.listdir``/``shutil`` only work for local paths, so every
maintenance touch goes through the JVM's ``org.apache.hadoop.fs.FileSystem``
resolved from the session's Hadoop configuration (scheme-aware: ``file:/``,
``hdfs:/``, ``s3a:/`` all behave identically).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path_str: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    return path.getFileSystem(hconf), path


def path_exists(spark: SparkSession, path_str: str) -> bool:
    fs, path = _fs_and_path(spark, path_str)
    return bool(fs.exists(path))


def mkdirs(spark: SparkSession, path_str: str) -> None:
    fs, path = _fs_and_path(spark, path_str)
    fs.mkdirs(path)


def _hidden_name(name: str) -> bool:
    """Spark's actual discovery rule (InMemoryFileIndex): a '.'/'_'
    prefix hides a path — EXCEPT names containing '=', which are
    partition directories (an underscore-named partition column like
    ``_vb=7`` is data, not metadata)."""
    return name.startswith((".", "_")) and "=" not in name


def _is_hidden_below(base: str, full: str) -> bool:
    """True iff any path component BELOW ``base`` is hidden by Spark's
    convention (e.g. ``_snapshots/``), so data-file listings skip it."""
    rel = full[len(base):].lstrip("/")
    return any(_hidden_name(part) for part in rel.split("/"))


def list_data_files(spark: SparkSession, dir_str: str,
                    recursive: bool = False) -> list[str]:
    """Data-file paths under ``dir_str`` (skips ``_SUCCESS``/hidden
    files and anything inside hidden/underscore directories, matching
    Spark's own discovery). Returns [] if the directory doesn't exist."""
    fs, path = _fs_and_path(spark, dir_str)
    if not fs.exists(path):
        return []
    base = path.toString()
    out: list[str] = []
    if recursive:
        it = fs.listFiles(path, True)
        while it.hasNext():
            st = it.next()
            if not _is_hidden_below(base, st.getPath().toString()):
                out.append(st.getPath().toString())
    else:
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            if st.isFile() and not _hidden_name(name):
                out.append(st.getPath().toString())
    return out


def data_file_count(spark: SparkSession, dir_str: str) -> int:
    return len(list_data_files(spark, dir_str, recursive=True))


def dir_data_bytes(spark: SparkSession, dir_str: str) -> int:
    """Total bytes of non-hidden data files under ``dir_str`` (0 if the
    directory doesn't exist) — drives size-aware compaction targets."""
    fs, path = _fs_and_path(spark, dir_str)
    if not fs.exists(path):
        return 0
    base = path.toString()
    total = 0
    it = fs.listFiles(path, True)
    while it.hasNext():
        st = it.next()
        if not _is_hidden_below(base, st.getPath().toString()):
            total += int(st.getLen())
    return total


def delete_path(spark: SparkSession, path_str: str) -> bool:
    """Recursive delete; False if the path didn't exist."""
    fs, path = _fs_and_path(spark, path_str)
    if not fs.exists(path):
        return False
    return bool(fs.delete(path, True))


def rename_path(spark: SparkSession, src: str, dst: str) -> None:
    """Atomic-where-the-FS-allows rename (HDFS/local: atomic dir move;
    S3A: copy-based). The destination must not exist."""
    fs, src_p = _fs_and_path(spark, src)
    _, dst_p = _fs_and_path(spark, dst)
    if not fs.rename(src_p, dst_p):
        raise IOError(f"rename failed: {src} -> {dst}")


def replace_dir(spark: SparkSession, tmp: str, final: str) -> None:
    """Swap ``tmp`` into place of ``final`` (delete final, rename tmp)."""
    delete_path(spark, final)
    rename_path(spark, tmp, final)


def write_text(spark: SparkSession, path_str: str, content: str) -> None:
    """Write a small text FILE (not a directory) through the Hadoop FS —
    for metadata sidecars like properties.json on any scheme."""
    fs, path = _fs_and_path(spark, path_str)
    out = fs.create(path, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path_str: str) -> str | None:
    """Read a small text file; None if it doesn't exist."""
    fs, path = _fs_and_path(spark, path_str)
    if not fs.exists(path):
        return None
    jvm = spark.sparkContext._jvm
    stream = fs.open(path)
    try:
        sink = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, sink, 4096, False)
        return bytes(sink.toByteArray()).decode("utf-8")
    finally:
        stream.close()


def has_data(spark: SparkSession, dir_str: str) -> bool:
    """True iff any non-hidden data file exists under ``dir_str`` —
    short-circuits on the first hit (no full listing)."""
    fs, path = _fs_and_path(spark, dir_str)
    if not fs.exists(path):
        return False
    base = path.toString()
    it = fs.listFiles(path, True)
    while it.hasNext():
        if not _is_hidden_below(base, it.next().getPath().toString()):
            return True
    return False


def list_dirs(spark: SparkSession, dir_str: str) -> list[str]:
    """Names of non-hidden subdirectories (not full paths). Hidden means
    a '.' or '_' prefix — the same Spark convention ``_is_hidden_below``
    applies to files, so a stray ``_snapshots/`` never surfaces as a
    keyspace."""
    fs, path = _fs_and_path(spark, dir_str)
    if not fs.exists(path):
        return []
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(path)
        if st.isDirectory() and not st.getPath().getName().startswith((".", "_"))
    )
