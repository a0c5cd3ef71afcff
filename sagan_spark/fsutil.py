"""Shared filesystem helpers for driver-side small-file IO.

Every non-DataFrame file touch in the engine (resume manifest, index
sidecars, streaming layout checks) must work wherever the parquet lives —
``file://``, ``hdfs://``, ``s3a://`` — or the 10^12-turn resume story only
runs on a POSIX shared filesystem. A local ``open()``/``os.listdir`` cannot
do that, so these helpers go through the JVM Hadoop FileSystem API that
Spark itself uses (same credentials, same scheme registry).

Driver-side only: Python executors have no JVM gateway, so executor-side
binary writes (the unified2 sink) use ``pyarrow.fs`` instead — see
``engine/route.write_unified2_binary``.

Scope: run STATE (manifests, sidecars, sink trees) goes through here.
Static job CONFIG (.rules files, sagan_spark.yaml) deliberately stays
plain ``open()``: those are driver-local inputs shipped with the job
(``spark-submit --files``), read before a session necessarily exists.

Writes are atomic (temp name + rename) so a crash between a data write and
its metadata write leaves no half-written file. On object stores rename is
copy+delete rather than atomic, but Hadoop's S3A committers give the same
visible-all-or-nothing contract for these small single files.
"""

from __future__ import annotations


def _fs(spark, path: str):
    """(jvm, FileSystem, Path) for a path's scheme, using the session's
    Hadoop configuration (credentials/endpoints identical to DataFrame
    reads on the same path)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def fs_write_text(spark, path: str, content: str) -> None:
    """Atomically write a small text file: create ``<path>.tmp``, then
    rename over the target."""
    jvm, fs, hpath = _fs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    out.write(bytearray(content.encode("utf-8")))
    out.close()
    fs.delete(hpath, False)
    fs.rename(tmp, hpath)


def fs_read_text(spark, path: str) -> str:
    jvm, fs, hpath = _fs(spark, path)
    stream = fs.open(hpath)
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, True)
    return bytes(baos.toByteArray()).decode("utf-8")


def fs_exists(spark, path: str) -> bool:
    _, fs, hpath = _fs(spark, path)
    return bool(fs.exists(hpath))


def fs_mkdirs(spark, path: str) -> None:
    _, fs, hpath = _fs(spark, path)
    fs.mkdirs(hpath)


def fs_listdir(spark, path: str) -> list[str]:
    """Basenames of a directory's entries, sorted. Raises FileNotFoundError
    if the directory does not exist — callers that treat "absent" as empty
    must do so EXPLICITLY (a swallowed generic OSError is how the streaming
    legacy-layout guard silently skipped object-store paths)."""
    _, fs, hpath = _fs(spark, path)
    if not fs.exists(hpath):
        raise FileNotFoundError(path)
    return sorted(st.getPath().getName() for st in fs.listStatus(hpath))


def fs_list_files(spark, path: str, suffix: str = "") -> list[str]:
    """Full URIs of a directory's files ending in ``suffix``, sorted by
    name. URIs round-trip into ``spark.read.parquet`` unchanged."""
    _, fs, hpath = _fs(spark, path)
    if not fs.exists(hpath):
        raise FileNotFoundError(path)
    return sorted(
        str(st.getPath().toString())
        for st in fs.listStatus(hpath)
        if st.isFile() and st.getPath().getName().endswith(suffix)
    )
