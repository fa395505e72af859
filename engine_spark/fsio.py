"""Checkpoint-grade filesystem access for streaming state stores.

Two halves, matching where the code runs:

- :class:`HadoopFS` — a thin driver-side wrapper over the JVM
  ``org.apache.hadoop.fs.FileSystem`` (the same API Spark's own
  checkpointing uses), so state stores written "next to the checkpoint
  dir" actually work when that dir is ``hdfs://`` or ``s3a://`` and not
  just a local mount. Plain local paths resolve through
  ``fs.defaultFS`` (``file:///`` in local mode), so nothing changes for
  tests and single-node runs.

- :func:`atomic_publish_file` — an EXECUTOR-safe single-file publish
  (no SparkSession required): local paths use ``os.replace`` (atomic on
  POSIX); URI paths go through ``pyarrow.fs`` when the scheme is
  supported there. Used by the hot-key marker registry, which is
  written from inside a pandas UDF where no JVM gateway exists.

Atomicity note (the honest 100 TB caveat): directory rename is atomic
on HDFS and POSIX, which is what the epoch-commit protocol relies on.
On S3A a "rename" is copy+delete — the same caveat as Spark's
FileOutputCommitter v1; deployments on raw object stores should point
state at an HDFS/consistent-rename path (or a bucket with a rename-
consistent layer), exactly as they must for Spark checkpoints.
"""

from __future__ import annotations

import os


class HadoopFS:
    """Driver-side wrapper over the JVM Hadoop FileSystem for one base URI.

    All paths passed to methods must live under the same filesystem as
    ``base_uri`` (the usual case: every path inside one state dir).
    """

    def __init__(self, spark, base_uri: str):
        jvm = spark._jvm
        self._jvm = jvm
        self._gw = spark.sparkContext._gateway
        self._Path = jvm.org.apache.hadoop.fs.Path
        conf = spark._jsc.hadoopConfiguration()
        self._fs = self._Path(base_uri).getFileSystem(conf)
        # FileContext gives rename(Options.Rename.NONE): atomically FAIL
        # if the destination exists — FileSystem.rename would instead
        # move src INTO an existing destination directory, which would
        # corrupt a lost commit race into nested state dirs.
        self._fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            self._Path(base_uri).toUri(), conf
        )

    def _p(self, path: str):
        return self._Path(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def list_names(self, path: str) -> list[tuple[str, bool]]:
        """Children of ``path`` as (name, is_directory) pairs; [] if absent."""
        if not self.exists(path):
            return []
        return [
            (st.getPath().getName(), bool(st.isDirectory()))
            for st in self._fs.listStatus(self._p(path))
        ]

    def read_bytes(self, path: str) -> bytes:
        stream = self._fs.open(self._p(path))
        try:
            return bytes(
                self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()

    def write_bytes(self, path: str, data: bytes) -> None:
        out = self._fs.create(self._p(path), True)
        try:
            out.write(data)
        finally:
            out.close()

    def rename(self, src: str, dst: str) -> bool:
        """Atomic no-overwrite rename (FileContext + Options.Rename.NONE):
        atomic on HDFS/POSIX, and returns False — without moving anything —
        when ``dst`` already exists (the lost-the-race signal the commit
        protocols branch on)."""
        RenameOpt = self._jvm.org.apache.hadoop.fs.Options.Rename
        opts = self._gw.new_array(RenameOpt, 1)
        opts[0] = RenameOpt.NONE
        try:
            self._fc.rename(self._p(src), self._p(dst), opts)
            return True
        except Exception as e:  # noqa: BLE001 - py4j wraps the Java class
            if "FileAlreadyExistsException" in str(e) or "already exists" in str(e):
                return False
            raise

    def delete(self, path: str, recursive: bool = True) -> None:
        self._fs.delete(self._p(path), recursive)


def atomic_publish_file(path: str, data: bytes) -> bool:
    """Executor-safe idempotent publish of one small file at ``path``.

    Local paths (no ``://``): write a temp sibling then ``os.replace``
    (atomic). URI paths: ``pyarrow.fs`` — object stores get a direct
    write (a single-object PUT is atomic at object granularity, which is
    all an idempotent marker needs); filesystems with rename get
    temp+move. Returns False when the scheme isn't reachable from this
    worker (caller degrades gracefully — a missed marker only delays
    salting by a batch, never breaks correctness).
    """
    if "://" not in path:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return True
    try:
        from pyarrow import fs as pafs

        filesystem, rel = pafs.FileSystem.from_uri(path)
        if isinstance(filesystem, pafs.LocalFileSystem):
            tmp = f"{rel}.tmp{os.getpid()}"
            with filesystem.open_output_stream(tmp) as f:
                f.write(data)
            filesystem.move(tmp, rel)
        else:
            # object store / HDFS: single-file create; markers are
            # idempotent JSON blobs, so a concurrent double-write of the
            # same content is harmless
            with filesystem.open_output_stream(rel) as f:
                f.write(data)
        return True
    except Exception:  # noqa: BLE001 - marker publish is best-effort
        return False


def executor_read_small_files(dir_path: str, suffix: str = ".json") -> list[bytes]:
    """Executor-safe listing+read of every small file under ``dir_path``
    ending in ``suffix`` (no SparkSession required — the worker-side twin
    of HadoopFS.list_names/read_bytes). Local paths use os.listdir; URI
    paths go through pyarrow.fs. A missing/unreachable directory returns
    [] (callers treat the registry as empty and degrade gracefully)."""
    out: list[bytes] = []
    if "://" not in dir_path:
        try:
            names = os.listdir(dir_path)
        except OSError:
            return out
        for n in sorted(names):
            if not n.endswith(suffix):
                continue
            try:
                with open(os.path.join(dir_path, n), "rb") as f:
                    out.append(f.read())
            except OSError:
                continue
        return out
    try:
        from pyarrow import fs as pafs

        filesystem, rel = pafs.FileSystem.from_uri(dir_path)
        sel = pafs.FileSelector(rel, allow_not_found=True)
        for info in sorted(filesystem.get_file_info(sel), key=lambda i: i.path):
            if info.type != pafs.FileType.File or not info.path.endswith(suffix):
                continue
            try:
                with filesystem.open_input_stream(info.path) as f:
                    out.append(f.read())
            except OSError:
                continue
    except Exception:  # noqa: BLE001 - unreachable scheme → empty registry
        return []
    return out


def publish_parquet_dir(
    fs: "HadoopFS",
    df,
    state_dir: str,
    final: str,
    partition_by: str | None = None,
    sidecar: tuple[str, bytes] | None = None,
) -> bool:
    """Stage-then-atomic-rename publish of one parquet directory — the
    epoch-commit protocol shared by the incremental stores (Bloom /
    minhash predate this helper and keep their own copies; the BM25 and
    IVF stores route through here so a protocol fix lands once).

    Writes ``df`` to a uuid staging dir under ``<state_dir>/_staging``
    (plus an optional ``sidecar`` file, e.g. ``_stats.json``), creates
    the destination's parent, and renames atomically. Returns False —
    after retiring the staging copy — when the destination already
    exists (crash replay or a lost publish race: both no-ops).

    Anything still under ``_staging`` when a publish starts is by
    construction uncommitted garbage (a crash between the parquet write
    and the rename), so it is swept here — otherwise repeated
    crash-replays accumulate dead copies forever (ADVICE r10). The sweep
    is safe under the stores' single-writer contract (one foreachBatch /
    batch loop per state_dir); it only ever touches THIS state_dir.
    """
    import uuid as _uuid

    staging_root = f"{state_dir.rstrip('/')}/_staging"
    fs.delete(staging_root)
    staging = f"{staging_root}/e{_uuid.uuid4().hex}"
    writer = df.repartition(partition_by) if partition_by else df
    w = writer.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(staging)
    if sidecar is not None:
        name, data = sidecar
        fs.write_bytes(f"{staging}/{name}", data)
    parent = final.rsplit("/", 1)[0]
    fs.mkdirs(parent)
    if fs.rename(staging, final):
        return True
    fs.delete(staging)
    return False
