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
rewrite races)."""

from __future__ import annotations

import json
import os
import time
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession


class FileIdent(NamedTuple):
    """A file's identity AS OBSERVED AT LISTING TIME. The ledger must
    record exactly this snapshot — re-stat'ing at commit time would
    record a rewritten file's NEW identity against its OLD (already
    ingested) content, silently skipping the rewrite forever."""

    path: str
    size: int
    mtime_ns: int


def _list_files(path: str, suffix: str) -> dict[str, tuple[int, int]]:
    out: dict[str, tuple[int, int]] = {}
    for name in sorted(os.listdir(path)):
        if not name.endswith(suffix) or name.startswith(("_", ".")):
            continue
        full = os.path.join(path, name)
        st = os.stat(full)
        out[full] = (st.st_size, st.st_mtime_ns)
    return out


def _read_ledger(ledger_dir: str) -> dict[str, tuple[int, int]]:
    seen: dict[str, tuple[int, int]] = {}
    if not os.path.isdir(ledger_dir):
        return seen
    for name in sorted(os.listdir(ledger_dir)):
        if not name.endswith(".jsonl"):
            continue
        with open(os.path.join(ledger_dir, name)) as f:
            for line in f:
                rec = json.loads(line)
                seen[rec["path"]] = (rec["size"], rec["mtime_ns"])
    return seen


def new_files(
    data_dir: str, ledger_dir: str, suffix: str = ".parquet"
) -> list[FileIdent]:
    """Files present in ``data_dir`` but absent from (or changed since)
    the ledger, each with its (size, mtime_ns) identity captured at
    listing time — metadata-only, nothing is read. Pass the returned
    idents (NOT bare paths) to ``commit_ingest`` so the ledger records
    the identity of the content actually ingested."""
    current = _list_files(data_dir, suffix)
    seen = _read_ledger(ledger_dir)
    return [
        FileIdent(p, size, mtime)
        for p, (size, mtime) in current.items()
        if seen.get(p) != (size, mtime)
    ]


def ingest_increment(
    spark: SparkSession, data_dir: str, ledger_dir: str, suffix: str = ".parquet"
) -> tuple[DataFrame | None, list[FileIdent]]:
    """(DataFrame over ONLY the new files, their listing-time idents);
    (None, []) when nothing arrived. Call ``commit_ingest`` with the
    same idents after the downstream write succeeds."""
    idents = new_files(data_dir, ledger_dir, suffix)
    if not idents:
        return None, []
    return spark.read.parquet(*[i.path for i in idents]), idents


def commit_ingest(ledger_dir: str, idents: list[FileIdent]) -> None:
    """Append one ledger commit file covering ``idents``. The recorded
    (size, mtime_ns) is the one CAPTURED AT LISTING TIME, never a fresh
    stat — if the file was rewritten between read and commit, the next
    ``new_files`` diff sees the changed identity and re-ingests the new
    content (the exactly-once-per-content contract). Append-only: a
    crashed run leaves no partial ledger state (the commit file is
    written whole via rename)."""
    if not idents:
        return
    os.makedirs(ledger_dir, exist_ok=True)
    tmp = os.path.join(ledger_dir, f".tmp-{time.time_ns()}")
    with open(tmp, "w") as f:
        for ident in idents:
            f.write(
                json.dumps(
                    {
                        "path": ident.path,
                        "size": ident.size,
                        "mtime_ns": ident.mtime_ns,
                    }
                )
                + "\n"
            )
    os.replace(tmp, os.path.join(ledger_dir, f"commit-{time.time_ns()}.jsonl"))
