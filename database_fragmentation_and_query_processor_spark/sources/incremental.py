"""Incremental batch ingestion with a file ledger (exactly-once).

The operational pattern behind every recurring ingest job: each run
must process files that ARRIVED since the last run, exactly once, even
across job crashes. Structured Streaming's file source does this with
its checkpoint; this module provides the same guarantee for plain
batch jobs (the common case for daily training-data drops) without a
streaming runtime:

- A LEDGER directory records, per ingested file, its path, size, and
  mtime (a file that is rewritten in place with new content re-ingests
  because the (size, mtime) identity changes).
- ``new_files`` diffs the current listing against the ledger — pure
  metadata work, no data read.
- ``ingest_increment`` reads ONLY the new files (Spark's reader takes
  an explicit file list, so there is no re-scan of old data), and the
  caller commits the ledger entry AFTER its own write succeeds —
  write-then-commit gives at-least-once on crash, and the ledger diff
  upgrades it to exactly-once on retry.

Scale notes: the listing and ledger are O(file count), not data size;
at 100 TB keep per-file sizes large (compaction upstream) so the
ledger stays small, and store it on the same object store as the data
(it is plain JSON lines, one file per commit — append-only, no
rewrite races). All listing/ledger IO goes through the warehouse FS
shim (fs.py), so the same code runs against local paths, ``hdfs://``
and ``s3a://`` (pass ``spark`` — or an explicit ``fs`` — for URI
warehouses); commit files are written via an atomic create (tmp+rename
locally, single-PUT on object stores)."""

from __future__ import annotations

import json
import time
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession

from .. import fs as fslib


class FileIdent(NamedTuple):
    """A file's identity AS OBSERVED AT LISTING TIME. The ledger must
    record exactly this snapshot — re-stat'ing at commit time would
    record a rewritten file's NEW identity against its OLD (already
    ingested) content, silently skipping the rewrite forever."""

    path: str
    size: int
    mtime_ns: int


def _posix_basename(path: str) -> str:
    return path.rsplit("/", 1)[-1]


def _list_files(fs, path: str, suffix: str) -> dict[str, tuple[int, int]]:
    out: dict[str, tuple[int, int]] = {}
    for full, is_dir, size, mtime_ns in fs.list_status(path):
        name = _posix_basename(full)
        if is_dir or not name.endswith(suffix) or name.startswith(("_", ".")):
            continue
        out[full] = (size, mtime_ns)
    return out


def _read_ledger(fs, ledger_dir: str) -> dict[str, tuple[int, int]]:
    seen: dict[str, tuple[int, int]] = {}
    if not fs.is_dir(ledger_dir):
        return seen
    for full, is_dir, _, _ in fs.list_status(ledger_dir):
        if is_dir or not full.endswith(".jsonl"):
            continue
        for line in fs.read_text(full).splitlines():
            if not line.strip():
                continue
            rec = json.loads(line)
            seen[rec["path"]] = (rec["size"], rec["mtime_ns"])
    return seen


def new_files(
    data_dir: str, ledger_dir: str, suffix: str = ".parquet",
    spark=None, fs=None,
) -> list[FileIdent]:
    """Files present in ``data_dir`` but absent from (or changed since)
    the ledger, each with its (size, mtime_ns) identity captured at
    listing time — metadata-only, nothing is read. Pass the returned
    idents (NOT bare paths) to ``commit_ingest`` so the ledger records
    the identity of the content actually ingested."""
    fs = fs if fs is not None else fslib.fs_for(data_dir, spark)
    current = _list_files(fs, data_dir, suffix)
    seen = _read_ledger(fs, ledger_dir)
    return [
        FileIdent(p, size, mtime)
        for p, (size, mtime) in current.items()
        if seen.get(p) != (size, mtime)
    ]


def ingest_increment(
    spark: SparkSession, data_dir: str, ledger_dir: str, suffix: str = ".parquet",
    fs=None,
) -> tuple[DataFrame | None, list[FileIdent]]:
    """(DataFrame over ONLY the new files, their listing-time idents);
    (None, []) when nothing arrived. Call ``commit_ingest`` with the
    same idents after the downstream write succeeds."""
    idents = new_files(data_dir, ledger_dir, suffix, spark=spark, fs=fs)
    if not idents:
        return None, []
    return spark.read.parquet(*[i.path for i in idents]), idents


def commit_ingest(
    ledger_dir: str, idents: list[FileIdent], spark=None, fs=None
) -> None:
    """Append one ledger commit file covering ``idents``. The recorded
    (size, mtime_ns) is the one CAPTURED AT LISTING TIME, never a fresh
    stat — if the file was rewritten between read and commit, the next
    ``new_files`` diff sees the changed identity and re-ingests the new
    content (the exactly-once-per-content contract). Append-only: a
    crashed run leaves no partial ledger state (the commit file becomes
    visible whole — tmp+rename locally, atomic single-PUT on object
    stores, via the FS shim)."""
    if not idents:
        return
    fs = fs if fs is not None else fslib.fs_for(ledger_dir, spark)
    fs.makedirs(ledger_dir)
    body = "".join(
        json.dumps(
            {"path": i.path, "size": i.size, "mtime_ns": i.mtime_ns}
        )
        + "\n"
        for i in idents
    )
    fs.write_text_atomic(
        fslib.join(ledger_dir, f"commit-{time.time_ns()}.jsonl"), body
    )
