"""Custom Python Data Sink (Spark 4 `pyspark.sql.datasource` writer
API): JSONL part files published atomically through a manifest.

The exactly-once discipline mirrors what every production table
format (and the reference's tellMaster-on-put protocol,
storage/BlockManager.scala:363-395) relies on: tasks write
side-effect-free part files named by a task-unique suffix and return
a commit MESSAGE (path + row count); only the driver's `commit`,
which runs once after every task succeeded, writes `_MANIFEST.json`
naming the surviving files.  Readers trust only files listed in the
manifest, so a re-executed / speculated / failed task can never leak
rows: its orphan part file exists on disk but is invisible.  `abort`
removes any parts named by partial messages.

This is the sink-side complement of `blocktrace.py`'s reader — the
two together cover the full custom-connector surface of the Python
Data Source API.

Concurrent committers (r8): version numbers are claimed by an atomic
hard-link CAS — the engine twin of the reference's
`BlockInfoManager.lockNewBlockForWriting` write-lock CAS
(storage/BlockInfoManager.scala:182-330).  Two jobs racing a commit
to the same table version produce exactly one winner per version;
the loser re-reads the winner's snapshot and retries on the next
version, so both jobs' rows survive and no partial snapshot is ever
visible.  Tested by
tests/test_sources.py::test_manifest_concurrent_commit_conflict.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage
from pyspark.sql.types import StructType


def _remove_quiet(path: str) -> None:
    """Remove a CAS temp body, tolerating a concurrent vacuum having
    already swept it (the temp is ours alone — nothing else links it,
    so double-delete is the only race)."""
    try:
        os.remove(path)
    except FileNotFoundError:
        pass


class PartFileCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


def _json_cell(v):
    """json.dumps default= handler: the sink is exposed for arbitrary
    schemas, so non-JSON-native cells (timestamp/date via isoformat —
    Spark's JSON reader parses ISO back to the typed column —
    Decimal as float, binary as hex) serialize instead of raising
    TypeError and failing the task."""
    import datetime
    import decimal

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


class ManifestJsonlWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options["path"]
        self.columns = schema.fieldNames()
        self.overwrite = overwrite
        # streaming publishers pass their epoch id; it is recorded
        # INSIDE the committed snapshot (atomically with the version
        # file) so batch dedup is part of the commit itself
        bid = options.get("batch_id")
        self.batch_id = int(bid) if bid is not None else None

    def write(self, rows: Iterator) -> PartFileCommit:
        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        # write to a temp name first so a crashed task can never leave
        # a file that looks like a finished part
        tmp = part + ".inprogress"
        with open(tmp, "w") as f:
            for row in rows:
                f.write(
                    json.dumps(dict(zip(self.columns, row)), default=_json_cell)
                    + "\n"
                )
                n += 1
        os.rename(tmp, part)
        return PartFileCommit(part, n)

    def commit(self, messages: list[PartFileCommit]) -> None:
        # Versioned snapshots (time travel): each commit publishes
        # _MANIFEST.v{n}.json.  Append mode carries the previous
        # version's files forward (the new snapshot = old + this
        # job's parts); overwrite starts the file list fresh while
        # old versions keep serving reads of their snapshot.
        #
        # Write-write CONFLICT CONTRACT (the engine twin of
        # BlockInfoManager.lockNewBlockForWriting's CAS,
        # storage/BlockInfoManager.scala:182-330): a version number is
        # CLAIMED atomically — the snapshot body is written to a
        # writer-unique temp file, then os.link() hard-links it to
        # _MANIFEST.v{n}.json, which the filesystem guarantees to
        # succeed for exactly ONE writer per name.  A loser re-reads
        # the winner's snapshot (so the winner's files are carried
        # forward, never clobbered) and retries on the next version.
        # No partial state is ever visible: the name appears only
        # after the body is fully written, so every published
        # _MANIFEST.v*.json is a complete snapshot.
        new = [{"path": m.path, "rows": m.rows} for m in messages]
        while True:
            prev_files: list[dict] = []
            versions = _manifest_versions(self.path)
            if versions and not self.overwrite:
                with open(_version_path(self.path, versions[-1])) as f:
                    prev_files = json.load(f)["files"]
            files = prev_files + new
            manifest = {
                "version": (versions[-1] if versions else 0) + 1,
                "files": sorted(files, key=lambda d: d["path"]),
                "total_rows": sum(e["rows"] for e in files),
                # atomic with the snapshot: a crash can never leave a
                # committed version whose batch id went unrecorded
                "last_batch_id": self.batch_id,
            }
            payload = json.dumps(manifest)
            vpath = _version_path(self.path, manifest["version"])
            tmp = f"{vpath}.{uuid.uuid4().hex}.tmp"
            with open(tmp, "w") as f:
                f.write(payload)
            try:
                os.link(tmp, vpath)  # the CAS: one winner per version
            except FileExistsError:
                _remove_quiet(tmp)
                continue  # lost the race — retry on the next version
            except FileNotFoundError:
                # a concurrent vacuum() swept our in-flight temp body
                # before the link landed (its .tmp sweep is age-gated,
                # but a pathological clock or retention=0 can still
                # race) — rewrite and retry; the version may even
                # still be free
                _remove_quiet(tmp)
                continue
            _remove_quiet(tmp)
            break
        # _MANIFEST.json is an ADVISORY mirror of the latest snapshot
        # (readers resolve "latest" from the version files, see
        # read_manifest); racing mirrors can land out of order and the
        # next commit repairs it, so correctness never depends on it.
        tmp = os.path.join(self.path, f"_MANIFEST.json.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.write(payload)
        os.rename(tmp, os.path.join(self.path, "_MANIFEST.json"))

    def abort(self, messages: list[PartFileCommit]) -> None:
        # Spark's PythonBatchWrite hands abort() null commit messages
        # (observed on 4.1: [null, null, ...]), so the paths cannot
        # come from `messages`.  Instead remove every part not vouched
        # for by an already-published manifest.  Scope note: COMMITS
        # are conflict-safe under concurrency (see commit's CAS), but
        # this abort sweep assumes no OTHER writer has parts awaiting
        # commit at the same instant — the standard caveat of every
        # manifest format without a lock service (cf. Delta's VACUUM
        # retention).  Readers are safe even if this cleanup never
        # runs: unpublished parts are invisible.
        # any file named by ANY committed snapshot stays readable
        listed: set[str] = set()
        for v in _manifest_versions(self.path):
            with open(_version_path(self.path, v)) as f:
                listed |= {e["path"] for e in json.load(f)["files"]}
        for m in messages or []:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
        if os.path.isdir(self.path):
            for fn in os.listdir(self.path):
                full = os.path.join(self.path, fn)
                unpublished = (
                    fn.startswith("part-")
                    and fn.endswith(".jsonl")
                    and full not in listed
                )
                if fn.endswith(".inprogress") or unpublished:
                    os.remove(full)


class ManifestJsonlDataSource(DataSource):
    """`df.write.format("manifest_jsonl").option("path", ...).save()`"""

    @classmethod
    def name(cls) -> str:
        return "manifest_jsonl"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return ManifestJsonlWriter(self.options, schema, overwrite)


def register_manifest_sink(spark) -> None:
    from scache_spark.sources import pin_thread_active_session

    pin_thread_active_session(spark)
    spark.dataSource.register(ManifestJsonlDataSource)


def _manifest_versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for fn in os.listdir(path):
        if fn.startswith("_MANIFEST.v") and fn.endswith(".json"):
            out.append(int(fn[len("_MANIFEST.v") : -len(".json")]))
    return sorted(out)


def _version_path(path: str, version: int) -> str:
    return os.path.join(path, f"_MANIFEST.v{version}.json")


def read_manifest(spark, path: str, schema, version: int | None = None):
    """Read back ONLY the rows the manifest vouches for; pass
    ``version`` to time-travel to an earlier committed snapshot.
    "Latest" resolves from the version files themselves (the
    _MANIFEST.json mirror is advisory — under concurrent committers
    racing mirrors can briefly point one version back)."""
    if version is None:
        versions = _manifest_versions(path)
        mpath = (
            _version_path(path, versions[-1])
            if versions
            else os.path.join(path, "_MANIFEST.json")
        )
    else:
        mpath = _version_path(path, version)
    with open(mpath) as f:
        manifest = json.load(f)
    files = [e["path"] for e in manifest["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


def vacuum(
    path: str, retain_versions: int = 1, tmp_retention_sec: float = 3600.0
) -> dict:
    """Lakehouse VACUUM: keep the newest ``retain_versions`` snapshots,
    delete older version manifests and every part file no surviving
    snapshot references.  Returns {"removed_files": n,
    "removed_versions": m}.

    Safe to run beside CONCURRENT COMMITTERS (r9 advice): a committer's
    CAS temp body (written, not yet os.link'ed) matches ``*.tmp``, so
    the straggler sweep is AGE-GATED — only temp files older than
    ``tmp_retention_sec`` (default 1h, Delta-style retention thinking)
    are treated as crash leftovers; an in-flight commit's temp is
    seconds old and survives.  The commit loop additionally retries on
    FileNotFoundError, so even a mis-tuned retention degrades to a
    retry, never a crashed commit.  Part/manifest deletion keeps the
    single-writer caveat of every lock-service-free manifest format."""
    versions = _manifest_versions(path)
    keep = set(versions[-retain_versions:]) if retain_versions > 0 else set()
    live: set[str] = set()
    for v in keep:
        with open(_version_path(path, v)) as f:
            live |= {e["path"] for e in json.load(f)["files"]}
    removed_files = 0
    removed_versions = 0
    now = time.time()
    for fn in sorted(os.listdir(path)):
        full = os.path.join(path, fn)
        if fn.endswith((".tmp", ".inprogress")):
            # stragglers from crashed writers/committers — never
            # referenced by any snapshot; age-gated so an in-flight
            # concurrent commit's temp body is never swept
            try:
                if now - os.path.getmtime(full) >= tmp_retention_sec:
                    os.remove(full)
            except FileNotFoundError:
                pass  # the owner finished/cleaned it mid-listing
        elif fn.startswith("part-") and fn.endswith(".jsonl") and full not in live:
            os.remove(full)
            removed_files += 1
        elif fn.startswith("_MANIFEST.v") and fn.endswith(".json"):
            v = int(fn[len("_MANIFEST.v") : -len(".json")])
            if v not in keep:
                os.remove(full)
                removed_versions += 1
    return {"removed_files": removed_files, "removed_versions": removed_versions}


def write_stream_batch(batch_df, path: str, batch_id: int) -> bool:
    """foreachBatch publisher with EXACTLY-ONCE semantics over the
    manifest sink: each micro-batch commits one snapshot carrying its
    batchId IN the snapshot itself (written atomically with the
    version file — never a separate post-commit marker, which would
    leave a crash window between commit and marker where a restart
    replays the batch and double-counts).  foreachBatch re-delivers
    only the last uncommitted epoch on restart, so the dedup check is
    simply: skip when the LATEST snapshot already carries this
    batch_id.  Returns True if the batch published, False if it was a
    duplicate."""
    versions = _manifest_versions(path)
    if versions:
        with open(_version_path(path, versions[-1])) as f:
            if json.load(f).get("last_batch_id") == batch_id:
                return False
    spark = batch_df.sparkSession
    register_manifest_sink(spark)
    (
        batch_df.write.format("manifest_jsonl")
        .option("path", path)
        .option("batch_id", str(batch_id))
        .mode("append")
        .save()
    )
    return True
