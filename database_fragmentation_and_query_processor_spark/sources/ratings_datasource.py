"""``::``-delimited MovieLens ratings as a registered Spark data source.

The plain reader (``sources/ratings.py``) maps the reference's
``loadRatings`` (Interface1.py:23-34) onto Spark's CSV scan. This module
re-expresses the same format through PySpark 4's Python DataSource API
(``pyspark.sql.datasource``), so the format participates in the normal
reader surface::

    register(spark)
    df = spark.read.format("movielens_ratings").load(path)

Scale design — the part worth having beyond ``spark.read.csv``:

- **Byte-range splittable.** ``partitions()`` carves each file into
  ~``split_bytes`` ranges (default 32 MiB). A partition that does not
  start at offset 0 skips forward to the first newline (that partial
  line belongs to the previous range); every partition finishes the
  line that crosses its end boundary. Identical to how Hadoop
  ``TextInputFormat`` splits — a single 100 GB ratings dump parallelizes
  across the cluster instead of serializing on one task.
- **One partition per range, enumerated on the driver** from file
  sizes only (no data read at planning time).
- **Arrow-friendly row shape**: rows are yielded as plain tuples in
  schema order; the timestamp field is dropped at parse time exactly
  like the reference (Interface1.py:29-30).

All IO is routed through the warehouse filesystem shim (``fs.py``):
planning resolves listings/sizes with ``fs_for(path, spark)`` (so a
driver with a session can plan over any Hadoop-reachable URI), and the
per-partition data path reads bounded byte ranges through
``fs.read_bytes``. Python workers have no JVM gateway, so the worker
data path supports bare paths and ``file://`` URIs (LocalFS); truly
remote schemes (hdfs/s3a) should use the native splittable scan in
``sources/ratings.py`` — the two readers share the format semantics.
Malformed lines raise — the reference assumes well-formed input; the
quarantining loader family (csv_src/jsonl) is the lenient path.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import posixpath
from collections.abc import Iterator

from ..fs import fs_for

try:  # PySpark >= 4
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover - PySpark 3 fallback
    HAVE_DATASOURCE_API = False

    class DataSource:  # type: ignore[no-redef]
        def __init__(self, options=None):
            self.options = options or {}

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value):
            self.value = value


DEFAULT_SPLIT_BYTES = 32 * 1024 * 1024

#: Block size for the buffered range reader (one fs.read_bytes per
#: block, not per line).
READ_BLOCK_BYTES = 4 * 1024 * 1024

RATINGS_DDL = "userid int, movieid int, rating double"


class RatingsRange(InputPartition):
    """One byte range of one file: [start, end) plus boundary rule."""

    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


def _resolve_files(path: str, fs) -> list[str]:
    """Expand a path / directory / local glob into a sorted file list,
    using only shim calls for path types the shim can answer.

    Directories produced by :class:`RatingsWriter` are read through the
    ``_SUCCESS`` manifest, which closes the job-level commit window: the
    writer publishes renames BEFORE the marker, so a driver crash
    mid-commit leaves part files on disk with no ``_SUCCESS`` — and
    because the staging sweep runs only AFTER the marker, such a
    directory still contains ``_staging/``, which this reader treats as
    a hard "partial commit" error instead of silently returning a
    partial file set. Foreign directories (no ``_staging/``; absent,
    empty, or non-manifest ``_SUCCESS`` — e.g. Hadoop's) keep the plain
    listing behavior."""
    if fs.is_dir(path):
        listing = list(fs.list_status(path))
        names = {posixpath.basename(c) for c, _d, _sz, _mt in listing}
        manifest: list[str] | None = None
        if "_SUCCESS" in names:
            try:
                doc = json.loads(
                    fs.read_text(posixpath.join(path, "_SUCCESS"))
                )
                if isinstance(doc, dict) and isinstance(
                    doc.get("files"), list
                ):
                    manifest = [str(n) for n in doc["files"]]
            except Exception:
                manifest = None  # legacy / foreign marker: list instead
        if manifest is not None:
            missing = sorted(set(manifest) - names)
            if missing:
                raise IOError(
                    f"movielens_ratings: _SUCCESS manifest at {path!r} "
                    f"names files not on disk ({missing}); the commit "
                    f"is corrupt — refusing a partial read"
                )
            out = sorted(posixpath.join(path, n) for n in manifest)
        elif RatingsWriter.STAGING_DIR in names and "_SUCCESS" not in names:
            raise IOError(
                f"movielens_ratings: {path!r} has a {RatingsWriter.STAGING_DIR}/ "
                f"directory but no _SUCCESS marker — either a write job "
                f"is still in progress (reading a destination during "
                f"its first write is unsupported; retry after it "
                f"commits) or a writer crashed mid-commit, in which "
                f"case the visible part files may be a partial set. "
                f"Re-run the write (overwrite mode clears them) or "
                f"remove {RatingsWriter.STAGING_DIR}/ to force a "
                f"plain-listing read."
            )
        else:
            out = sorted(
                child
                for child, is_dir, _sz, _mt in listing
                if not is_dir
                and not posixpath.basename(child).startswith(("_", "."))
            )
    elif fs.exists(path):
        out = [path]
    elif "://" not in path:
        # glob patterns only make sense for bare local paths
        out = sorted(p for p in _glob.glob(path) if os.path.isfile(p))
    else:
        out = []
    if not out:
        raise FileNotFoundError(f"movielens_ratings: no input files at {path!r}")
    return out


def plan_ranges(path: str, split_bytes: int, spark=None) -> list[RatingsRange]:
    """Driver-side planning: file sizes only, no data bytes touched.
    With a session, any Hadoop-reachable URI plans correctly; without
    one, bare paths and ``file://`` URIs resolve via LocalFS."""
    fs = fs_for(path, spark)
    ranges: list[RatingsRange] = []
    for f in _resolve_files(path, fs):
        size = fs.size(f)
        if size == 0:
            continue
        start = 0
        while start < size:
            end = min(start + split_bytes, size)
            ranges.append(RatingsRange(f, start, end))
            start = end
    return ranges


def _iter_range_lines(
    fs, path: str, start: int, end: int, block_bytes: int = READ_BLOCK_BYTES
) -> Iterator[bytes]:
    """Lines of ``path`` owned by range [start, end): skip the partial
    first line at a non-zero start; emit every line STARTING at a
    position <= end (a line starting exactly at ``end`` belongs to
    THIS range, because the next range unconditionally discards its
    first line — the Hadoop LineRecordReader rule). Buffered: one
    ``fs.read_bytes`` per ``block_bytes``, never per line."""
    size = fs.size(path)
    pos = start  # next absolute byte to fetch
    buf = bytearray()
    buf_base = start  # absolute offset of buf[0]
    skip_first = start > 0
    scanned = 0  # index into buf where newline scanning resumes

    while True:
        nl = buf.find(b"\n", scanned)
        if nl == -1:
            if pos < size:
                scanned = len(buf)
                take = min(block_bytes, size - pos)
                chunk = fs.read_bytes(path, pos, take)
                if not chunk:  # defensive: truncated read
                    break
                pos += len(chunk)
                buf.extend(chunk)
                continue
            # EOF: the remainder (no trailing newline) is the last line
            if buf and not skip_first and buf_base <= end:
                yield bytes(buf)
            return
        line = bytes(buf[: nl + 1])
        line_start = buf_base
        del buf[: nl + 1]
        buf_base += nl + 1
        scanned = 0
        if skip_first:
            skip_first = False
            continue
        if line_start > end:
            return
        yield line


def read_range(part: RatingsRange) -> Iterator[tuple[int, int, float]]:
    """Parse one byte range through the filesystem shim (runs in the
    Python worker: ``fs_for`` without a session — bare and ``file://``
    paths resolve to LocalFS; other schemes raise with guidance)."""
    fs = fs_for(part.path)
    for raw in _iter_range_lines(fs, part.path, part.start, part.end):
        s = raw.decode("utf-8").strip()
        if not s:
            continue
        words = s.split("::")
        # reference keeps fields 0-2, drops the timestamp
        yield int(words[0]), int(words[1]), float(words[2])


class RatingsReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("movielens_ratings requires a path")
        self.split_bytes = int(
            options.get("split_bytes", DEFAULT_SPLIT_BYTES)
        )

    def partitions(self):
        # planning runs on the driver, where a session exists
        try:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
        except Exception:  # pragma: no cover - session-less planning
            spark = None
        return plan_ranges(self.path, self.split_bytes, spark)

    def read(self, partition: RatingsRange):
        return read_range(partition)


class RatingsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "movielens_ratings"

    def schema(self) -> str:
        return RATINGS_DDL

    def reader(self, schema):
        return RatingsReader(self.options)

    def writer(self, schema, overwrite: bool):
        names = [f.name for f in schema.fields]
        if names[:3] != ["userid", "movieid", "rating"]:
            raise ValueError(
                f"movielens_ratings writes (userid, movieid, rating) "
                f"schemas; got {names}"
            )
        w = RatingsWriter(self.options, overwrite)
        if overwrite:
            # driver-side: clear previous contents before tasks run
            from ..fs import fs_for

            fs = fs_for(w.path)
            if fs.is_dir(w.path):
                for child, is_dir, _s, _m in fs.list_status(w.path):
                    if not is_dir:
                        fs.delete(child)
        return w


def register(spark) -> None:
    """Idempotent registration of the format with a SparkSession."""
    if not HAVE_DATASOURCE_API:  # pragma: no cover
        raise RuntimeError(
            "movielens_ratings needs the PySpark 4 Python DataSource API"
        )
    spark.dataSource.register(RatingsDataSource)


# ---------------------------------------------------------------------------
# write path: df.write.format("movielens_ratings").save(path)
# ---------------------------------------------------------------------------

try:  # PySpark >= 4 writer surface
    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    HAVE_WRITER_API = True
except ImportError:  # pragma: no cover - PySpark 3 fallback
    HAVE_WRITER_API = False

    class DataSourceWriter:  # type: ignore[no-redef]
        pass

    class WriterCommitMessage:  # type: ignore[no-redef]
        pass


class RatingsCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


def render_rating_line(userid: int, movieid: int, rating: float) -> str:
    """One ``::`` input-format line. The timestamp field the loader
    discards (Interface1.py:29-30) is emitted as 0, and the rating uses
    Python float rendering ('2.0', '4.5') — a write→load round trip
    reproduces the relation exactly."""
    return f"{int(userid)}::{int(movieid)}::{float(rating)}::0"


class RatingsWriter(DataSourceWriter):
    """Per-task writer with a two-phase task commit: each attempt
    stages one uniquely-named file under ``_staging/`` (underscore
    prefix → invisible to the reader's listing), and the DRIVER-side
    ``commit`` renames only the files named in the returned commit
    messages into the destination, then publishes them atomically via
    a ``_SUCCESS`` JSON manifest the reader trusts over the listing
    (see :meth:`commit` for the crash-ordering argument). A
    retried or speculative attempt that finished ``write()`` but lost
    the task-commit race therefore never surfaces to readers — its
    orphan stays in ``_staging/``, which commit/abort sweep. Same
    locality scope as the reader's data path: bare/``file://`` paths
    (Python workers have no JVM gateway); the files are plain text so
    any downstream engine reads them."""

    STAGING_DIR = "_staging"

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("movielens_ratings write requires a path")
        self.overwrite = overwrite

    def write(self, iterator) -> RatingsCommit:
        import uuid as _uuid

        from ..fs import fs_for

        fs = fs_for(self.path)
        staging = posixpath.join(self.path, self.STAGING_DIR)
        fs.makedirs(staging)
        name = f"part-{_uuid.uuid4().hex}.txt"
        dest = posixpath.join(staging, name)
        lines = []
        n = 0
        for row in iterator:
            lines.append(
                render_rating_line(row[0], row[1], row[2])
            )
            n += 1
        fs.write_text_atomic(dest, "\n".join(lines) + ("\n" if lines else ""))
        return RatingsCommit(dest, n)

    def _sweep_staging(self, fs) -> None:
        try:
            fs.delete(posixpath.join(self.path, self.STAGING_DIR),
                      recursive=True)
        except Exception:
            pass  # best-effort: leftovers are invisible to readers

    def commit(self, messages) -> None:
        """Job-level commit in three ordered steps: (1) rename each
        committed attempt's staged file into the destination, (2)
        atomically write the ``_SUCCESS`` MANIFEST (JSON naming exactly
        the published files — the reader trusts it over the listing, so
        the whole committed set becomes visible in the one marker
        write), (3) sweep ``_staging/``. The sweep runs LAST so a crash
        anywhere before the marker leaves ``_staging/`` behind as a
        tamper-evident seal: the reader refuses directories that have
        staging leftovers but no ``_SUCCESS`` (partial commit), instead
        of silently reading whichever subset of renames landed.

        Append mode (``overwrite=False``): the new manifest UNIONS the
        previously committed manifest's files and row count, so earlier
        jobs' part files stay visible — a manifest naming only the
        current job's files would silently orphan every prior commit
        (the manifest-trusting reader never lists them). Appending onto
        a directory that already has visible data files but no valid
        manifest is rejected: there is no authoritative prior file set
        to union, and guessing from the listing could resurrect files a
        crashed overwrite meant to retract. The read-modify-write of
        the manifest runs under the advisory writer lock: without it,
        two concurrent appends both read the same prior manifest and
        the loser's part files are silently orphaned when the winner's
        manifest lands last (ADVICE r10)."""
        from ..fs import acquire_writer_lock, fs_for, release_writer_lock

        fs = fs_for(self.path)
        lock = None
        if not self.overwrite:
            fs.makedirs(self.path)
            lock = acquire_writer_lock(fs, self.path, owner="ratings-append")
        try:
            prior_files: list[str] = []
            prior_rows = 0
            if not self.overwrite:
                prior_files, prior_rows = self._prior_commit(fs)
            # Publish exactly the committed attempts' files; losing
            # speculative/retried attempts stay behind in _staging.
            published = []
            for m in messages:
                if m is not None:
                    name = posixpath.basename(m.path)
                    fs.rename(m.path, posixpath.join(self.path, name))
                    published.append(name)
            total = prior_rows + sum(
                m.n_rows for m in messages if m is not None
            )
            fs.write_text_atomic(
                posixpath.join(self.path, "_SUCCESS"),
                json.dumps(
                    {"n_rows": total,
                     "files": sorted(set(prior_files) | set(published))}
                ) + "\n",
            )
            self._sweep_staging(fs)
        finally:
            if lock is not None:
                release_writer_lock(fs, lock)

    def _prior_commit(self, fs) -> tuple[list[str], int]:
        """The previously committed (files, n_rows) to carry into an
        append's manifest. Empty/fresh destinations append onto
        nothing; a valid manifest is authoritative; visible data files
        WITHOUT a valid manifest are ambiguous (foreign directory, or a
        legacy marker) and append onto them is refused."""
        if not fs.is_dir(self.path):
            return [], 0
        listing = list(fs.list_status(self.path))
        data_names = sorted(
            posixpath.basename(c)
            for c, is_dir, _sz, _mt in listing
            if not is_dir
            and not posixpath.basename(c).startswith("_")
        )
        marker = posixpath.join(self.path, "_SUCCESS")
        doc = None
        # files only: a directory named like a manifest part must not
        # mask a genuinely missing data file (ADVICE r10)
        names = {
            posixpath.basename(c)
            for c, is_dir, _sz, _mt in listing
            if not is_dir
        }
        if "_SUCCESS" in names:
            try:
                doc = json.loads(fs.read_text(marker))
            except Exception:
                doc = None
        if (
            isinstance(doc, dict)
            and isinstance(doc.get("files"), list)
        ):
            files = [str(n) for n in doc["files"]]
            missing = sorted(set(files) - names)
            if missing:
                raise IOError(
                    f"movielens_ratings: cannot append at {self.path!r} — "
                    f"the existing _SUCCESS manifest names files not on "
                    f"disk ({missing}); the prior commit is corrupt"
                )
            try:
                rows = int(doc.get("n_rows", 0))
            except (TypeError, ValueError):
                rows = 0
            return files, rows
        if data_names:
            raise IOError(
                f"movielens_ratings: cannot append at {self.path!r} — "
                f"the directory has visible data files {data_names[:5]} "
                f"but no valid _SUCCESS manifest to union into the new "
                f"commit. Use overwrite mode, or commit the existing "
                f"files with a manifest first."
            )
        return [], 0

    def abort(self, messages) -> None:
        from ..fs import fs_for

        fs = fs_for(self.path)
        for m in messages:
            if m is not None:
                try:
                    fs.delete(m.path)
                except Exception:
                    pass
        self._sweep_staging(fs)
