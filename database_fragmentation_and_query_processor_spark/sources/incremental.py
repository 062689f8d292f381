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

from pyspark.sql import DataFrame, SparkSession


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


def new_files(data_dir: str, ledger_dir: str, suffix: str = ".parquet") -> list[str]:
    """Paths present in ``data_dir`` but absent from (or changed since)
    the ledger — metadata-only, nothing is read."""
    current = _list_files(data_dir, suffix)
    seen = _read_ledger(ledger_dir)
    return [p for p, ident in current.items() if seen.get(p) != ident]


def ingest_increment(
    spark: SparkSession, data_dir: str, ledger_dir: str, suffix: str = ".parquet"
) -> tuple[DataFrame | None, list[str]]:
    """(DataFrame over ONLY the new files, their paths); (None, []) when
    nothing arrived. Call ``commit_ingest`` with the same paths after
    the downstream write succeeds."""
    paths = new_files(data_dir, ledger_dir, suffix)
    if not paths:
        return None, []
    return spark.read.parquet(*paths), paths


def commit_ingest(ledger_dir: str, paths: list[str]) -> None:
    """Append one ledger commit file covering ``paths``. Append-only —
    a crashed run leaves no partial ledger state (the commit file is
    written whole via rename)."""
    if not paths:
        return
    os.makedirs(ledger_dir, exist_ok=True)
    recs = []
    for p in paths:
        st = os.stat(p)
        recs.append({"path": p, "size": st.st_size, "mtime_ns": st.st_mtime_ns})
    tmp = os.path.join(ledger_dir, f".tmp-{time.time_ns()}")
    with open(tmp, "w") as f:
        for rec in recs:
            f.write(json.dumps(rec) + "\n")
    os.replace(tmp, os.path.join(ledger_dir, f"commit-{time.time_ns()}.jsonl"))
