"""Custom Python DataSource WRITER (Spark 4 API): ``manifest_jsonl``
— a JSONL sink with an atomic commit manifest, demonstrating the
two-phase task/driver commit protocol a transactional sink is built
on.

Protocol (the part worth studying):
- each TASK writes ``part-<partition>-<attempt-unique>.jsonl`` and
  returns a commit message (path, rows, crc32) — side files only, no
  shared mutable state;
- the DRIVER's ``commit(messages)`` writes ``_MANIFEST.json`` listing
  exactly the committed files with row counts and checksums. Readers
  that consult the manifest never see uncommitted/orphaned task
  output — the same reader contract as a table-format transaction
  log, in one file;
- ``abort(messages)`` deletes whatever partial task output is known.
  A crashed driver can leave orphan part files, but without a
  manifest they are invisible to manifest-respecting readers — atomic
  visibility comes from the single manifest write, not from cleanup.

Speculative/retried tasks: each attempt writes a UNIQUE file name
(uuid suffix); only the attempt whose message reaches commit() lands
in the manifest, so duplicate attempts cannot double-count.

``read_manifest(spark, dir)`` loads exactly the committed files.
"""

from __future__ import annotations

import json
import os
import uuid
import zlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class _PartFile(WriterCommitMessage):
    def __init__(self, path: str, rows: int, crc32: int) -> None:
        self.path = path
        self.rows = rows
        self.crc32 = crc32


class ManifestJsonlDataSource(DataSource):
    """``df.write.format("manifest_jsonl").option("path", dir)
    .mode("append").save()``"""

    @classmethod
    def name(cls) -> str:
        return "manifest_jsonl"

    def writer(self, schema, overwrite: bool) -> "ManifestJsonlWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("manifest_jsonl requires option 'path'")
        return ManifestJsonlWriter(
            path, [f.name for f in schema.fields], overwrite
        )


class ManifestJsonlWriter(DataSourceWriter):
    def __init__(self, path: str, columns: list[str], overwrite: bool) -> None:
        self._path = path
        self._columns = columns
        self._overwrite = overwrite

    def write(self, iterator) -> _PartFile:
        from pyspark import TaskContext

        os.makedirs(self._path, exist_ok=True)
        pid = TaskContext.get().partitionId()
        fname = f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        fpath = os.path.join(self._path, fname)
        rows = 0
        crc = 0
        with open(fpath, "wb") as f:
            for row in iterator:
                line = (
                    json.dumps(dict(zip(self._columns, row)), default=str)
                    + "\n"
                ).encode()
                crc = zlib.crc32(line, crc)
                f.write(line)
                rows += 1
        return _PartFile(fname, rows, crc & 0xFFFFFFFF)

    def commit(self, messages) -> None:
        # Every commit is a numbered SNAPSHOT (the one-file analog of a
        # table-format log entry): append snapshots extend the previous
        # snapshot's file list, overwrite snapshots start fresh.
        # Superseded part files stay on disk but are invisible to
        # manifest readers; older snapshots remain readable as-of
        # (time travel) until vacuum_manifest removes them. Single
        # concurrent writer (one Spark driver) — same assumption as
        # the rest of this sink's protocol.
        new_files = [
            {"path": m.path, "rows": m.rows, "crc32": m.crc32}
            for m in messages
            if m is not None
        ]
        target = os.path.join(self._path, "_MANIFEST.json")
        # The LATEST POINTER (_MANIFEST.json) is the single source of
        # truth for "previous snapshot" — never max(versioned files):
        # a crash after the versioned write but before the pointer
        # replace leaves an ORPHAN _MANIFEST-N whose job was reported
        # FAILED, and deriving state from it would resurrect that
        # job's files as committed data. Instead the next commit
        # reads the pointer, takes version = pointer+1, and its
        # versioned write OVERWRITES the orphan — the same
        # deterministic-replay discipline as the streaming state
        # stores. The pointer replace is the sole commit point.
        pointer = _load_pointer(self._path)
        files = new_files
        if not self._overwrite and pointer is not None:
            files = pointer["files"] + new_files
        # legacy pre-versioning pointers carry no "version": treat as
        # snapshot 0 so history numbering continues from them
        version = (
            int(pointer.get("version", 0)) + 1 if pointer is not None else 0
        )
        manifest = {
            "version": version,
            "files": files,
            "total_rows": sum(e["rows"] for e in files),
        }
        for out in (_manifest_name(self._path, version), target):
            tmp = out + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=1)
            os.replace(tmp, out)

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self._path, m.path))
            except OSError:
                pass


def register_manifest_sink(spark) -> None:
    spark.dataSource.register(ManifestJsonlDataSource)


def _manifest_name(path: str, version: int) -> str:
    return os.path.join(path, f"_MANIFEST-{version:010d}.json")


def _load_pointer(path: str) -> dict | None:
    """The latest-pointer manifest (_MANIFEST.json), or None if the
    table has never committed."""
    target = os.path.join(path, "_MANIFEST.json")
    if not os.path.exists(target):
        return None
    with open(target) as f:
        return json.load(f)


def _load_manifest(path: str, version: int) -> dict:
    with open(_manifest_name(path, version)) as f:
        return json.load(f)


def manifest_versions(path: str) -> list[int]:
    """Committed snapshot versions under ``path``, ascending."""
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        if name.startswith("_MANIFEST-") and name.endswith(".json"):
            try:
                out.append(int(name[len("_MANIFEST-"):-len(".json")]))
            except ValueError:
                continue
    return sorted(out)


def vacuum_manifest(path: str, keep_last: int = 2) -> list[str]:
    """Remove snapshots older than the newest ``keep_last`` COMMITTED
    versions and every part file neither the latest pointer nor a
    retained snapshot references. Returns removed file names.

    Safety rules, each load-bearing:
    - the latest pointer's files are ALWAYS referenced — on a
      pre-versioning (legacy) table with no _MANIFEST-N files at all,
      vacuum therefore removes nothing instead of destroying the
      table;
    - committed = versions <= the pointer's version. An orphan
      _MANIFEST-N ABOVE the pointer is a failed commit (crash before
      the pointer replace): its manifest and its unreferenced part
      files are removed — vacuum doubles as the failed-commit
      cleaner;
    - the pointer itself is never touched, so plain readers are
      unaffected; time travel simply loses the vacuumed versions —
      the exact trade a table format's VACUUM makes.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    pointer = _load_pointer(path)
    if pointer is None:
        return []  # never committed: nothing is safely removable
    head = int(pointer.get("version", 0))
    versions = manifest_versions(path)
    committed = [v for v in versions if v <= head]
    retained = set(committed[-keep_last:])
    referenced = {e["path"] for e in pointer["files"]}
    for v in retained:
        referenced |= {e["path"] for e in _load_manifest(path, v)["files"]}
    removed = []
    for v in versions:
        if v not in retained:
            os.remove(_manifest_name(path, v))
            removed.append(os.path.basename(_manifest_name(path, v)))
    for name in os.listdir(path):
        if (
            name.startswith("part-")
            and name.endswith(".jsonl")
            and name not in referenced
        ):
            os.remove(os.path.join(path, name))
            removed.append(name)
    return removed


def read_manifest(spark, path: str, version: int | None = None):
    """Load exactly the committed files (and verify their checksums).
    ``version`` reads a historical snapshot (time travel); default is
    the latest commit."""
    if version is not None:
        manifest = _load_manifest(path, version)
    else:
        with open(os.path.join(path, "_MANIFEST.json")) as f:
            manifest = json.load(f)
    for entry in manifest["files"]:
        crc = 0
        with open(os.path.join(path, entry["path"]), "rb") as fh:
            for line in fh:
                crc = zlib.crc32(line, crc)
        if crc & 0xFFFFFFFF != entry["crc32"]:
            raise ValueError(f"checksum mismatch in {entry['path']}")
    files = [os.path.join(path, e["path"]) for e in manifest["files"]]
    return spark.read.json(files) if files else None
