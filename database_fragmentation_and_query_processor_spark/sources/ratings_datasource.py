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

Local-filesystem paths only (the Python worker opens the file with
``open``); on an HDFS/S3 warehouse this source would resolve ranges
through the Hadoop FileSystem shim (``fs.py``) instead.
Malformed lines raise — the reference assumes well-formed input; the
quarantining loader family (csv_src/jsonl) is the lenient path.
"""

from __future__ import annotations

import glob as _glob
import os
from collections.abc import Iterator

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

RATINGS_DDL = "userid int, movieid int, rating double"


class RatingsRange(InputPartition):
    """One byte range of one file: [start, end) plus boundary rule."""

    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


def _resolve_files(path: str) -> list[str]:
    """Expand a path/glob/directory into a sorted list of data files."""
    if os.path.isdir(path):
        out = sorted(
            p
            for p in _glob.glob(os.path.join(path, "*"))
            if os.path.isfile(p) and not os.path.basename(p).startswith(("_", "."))
        )
    else:
        out = sorted(p for p in _glob.glob(path) if os.path.isfile(p))
    if not out:
        raise FileNotFoundError(f"movielens_ratings: no input files at {path!r}")
    return out


def plan_ranges(path: str, split_bytes: int) -> list[RatingsRange]:
    """Driver-side planning: file sizes only, no data bytes touched."""
    ranges: list[RatingsRange] = []
    for f in _resolve_files(path):
        size = os.path.getsize(f)
        if size == 0:
            continue
        start = 0
        while start < size:
            end = min(start + split_bytes, size)
            ranges.append(RatingsRange(f, start, end))
            start = end
    return ranges


def read_range(part: RatingsRange) -> Iterator[tuple[int, int, float]]:
    """Parse one byte range. Boundary rule (TextInputFormat semantics):
    skip the partial line at a non-zero start; finish the line that
    crosses ``end``."""
    with open(part.path, "rb") as fh:
        fh.seek(part.start)
        if part.start > 0:
            fh.readline()  # first (possibly complete) line -> previous range
        while True:
            # inclusive boundary (Hadoop LineRecordReader rule): a line
            # STARTING at exactly ``end`` is read by THIS range, because
            # the next range unconditionally discards its first line
            if fh.tell() > part.end:
                break
            line = fh.readline()
            if not line:
                break
            s = line.decode("utf-8").strip()
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
        return plan_ranges(self.path, self.split_bytes)

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


def register(spark) -> None:
    """Idempotent registration of the format with a SparkSession."""
    if not HAVE_DATASOURCE_API:  # pragma: no cover
        raise RuntimeError(
            "movielens_ratings needs the PySpark 4 Python DataSource API"
        )
    spark.dataSource.register(RatingsDataSource)
