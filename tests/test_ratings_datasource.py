"""The ``movielens_ratings`` Python DataSource: format registration,
byte-range split semantics, and parity with the CSV-scan loader."""

from __future__ import annotations

import os

import pytest

from database_fragmentation_and_query_processor_spark.sources import (
    ratings_datasource as RDS,
)
from database_fragmentation_and_query_processor_spark.sources.ratings import (
    read_ratings_text,
)

FIXTURE = "/root/reference/test_data1.txt"


@pytest.fixture(scope="module")
def registered(spark):
    RDS.register(spark)
    return spark


def test_reads_reference_fixture(registered):
    df = registered.read.format("movielens_ratings").load(FIXTURE)
    assert [f.name for f in df.schema.fields] == ["userid", "movieid", "rating"]
    rows = sorted(df.collect())
    via_csv = sorted(read_ratings_text(registered, FIXTURE).collect())
    assert [tuple(r) for r in rows] == [tuple(r) for r in via_csv]
    assert len(rows) == 20


def test_byte_range_split_is_lossless(registered):
    """Tiny split_bytes forces many intra-file ranges; the
    skip-partial-line / finish-crossing-line boundary rule must
    reassemble exactly the unsplit row set."""
    whole = sorted(
        tuple(r)
        for r in registered.read.format("movielens_ratings")
        .load(FIXTURE)
        .collect()
    )
    n_parts = 0
    seen = []
    for split in (16, 64, 256):
        ranges = RDS.plan_ranges(FIXTURE, split)
        if split == 16:
            n_parts = len(ranges)
        rows = [r for rg in ranges for r in RDS.read_range(rg)]
        seen.append(sorted(rows))
    assert n_parts > 5  # the fixture really was split many ways
    for got in seen:
        assert got == whole

    split_df = (
        registered.read.format("movielens_ratings")
        .option("split_bytes", "64")
        .load(FIXTURE)
    )
    assert sorted(tuple(r) for r in split_df.collect()) == whole


def test_planning_touches_no_data(tmp_path):
    p = tmp_path / "r.txt"
    p.write_text("1::2::3.5::99\n4::5::2.0::98\n")
    ranges = RDS.plan_ranges(str(p), 8)
    assert sum(r.end - r.start for r in ranges) == os.path.getsize(p)
    assert ranges[0].start == 0
    for a, b in zip(ranges, ranges[1:]):
        assert a.end == b.start


def test_directory_and_missing_paths(tmp_path, registered):
    (tmp_path / "a.txt").write_text("1::2::3.0::1\n")
    (tmp_path / "b.txt").write_text("3::4::5.0::2\n")
    (tmp_path / "_SUCCESS").write_text("")
    df = registered.read.format("movielens_ratings").load(str(tmp_path))
    assert df.count() == 2
    with pytest.raises(Exception):
        RDS.plan_ranges(str(tmp_path / "nope"), 8)


def test_file_uri_partitions_and_read(spark, tmp_path, registered):
    """The r6 gap: the source was local-path-only. All IO now routes
    through the fs.py shim, so a ``file://`` URI plans (HadoopFS via
    the session) and reads (LocalFS in the worker) end to end."""
    p = tmp_path / "uri.txt"
    lines = [f"{i}::{i * 7}::{(i % 10) / 2.0}::{1000 + i}" for i in range(40)]
    p.write_text("\n".join(lines) + "\n")
    uri = f"file://{p}"

    # driver-side planning over the URI, through the session's HadoopFS
    ranges = RDS.plan_ranges(uri, 64, spark)
    assert len(ranges) > 3
    assert all(r.path.startswith("file:") for r in ranges)
    rows = sorted(r for rg in ranges for r in RDS.read_range(rg))
    assert rows == sorted(
        (i, i * 7, (i % 10) / 2.0) for i in range(40)
    )

    # and the registered reader surface over the same URI
    df = (
        registered.read.format("movielens_ratings")
        .option("split_bytes", "64")
        .load(uri)
    )
    assert sorted(tuple(r) for r in df.collect()) == rows


def test_file_uri_directory_listing(spark, registered, tmp_path):
    (tmp_path / "a.txt").write_text("1::2::3.0::1\n")
    (tmp_path / "b.txt").write_text("3::4::5.0::2\n")
    (tmp_path / "_SUCCESS").write_text("")
    df = registered.read.format("movielens_ratings").load(f"file://{tmp_path}")
    assert sorted(tuple(r) for r in df.collect()) == [
        (1, 2, 3.0),
        (3, 4, 5.0),
    ]


def test_write_then_read_roundtrip(spark, registered, tmp_path):
    """The writer side of the format: df.write.format('movielens_ratings')
    renders '::' lines (timestamp 0) that the reader — and the
    reference's own loader — parse back to the identical relation."""
    out = str(tmp_path / "written")
    df = registered.createDataFrame(
        [(1, 122, 5.0), (2, 355, 2.5), (3, 999, 0.0)],
        "userid int, movieid int, rating double",
    )
    df.write.format("movielens_ratings").mode("append").save(out)
    assert (tmp_path / "written" / "_SUCCESS").exists()
    back = registered.read.format("movielens_ratings").load(out)
    assert sorted(tuple(r) for r in back.collect()) == [
        (1, 122, 5.0),
        (2, 355, 2.5),
        (3, 999, 0.0),
    ]
    # the rendered lines carry the reference's 4-field input shape
    import glob

    lines = []
    for f in glob.glob(str(tmp_path / "written" / "part-*.txt")):
        lines += open(f).read().splitlines()
    assert all(len(ln.split("::")) == 4 for ln in lines)
    assert all(ln.endswith("::0") for ln in lines)


def test_write_overwrite_replaces(spark, registered, tmp_path):
    out = str(tmp_path / "ow")
    one = registered.createDataFrame(
        [(1, 1, 1.0)], "userid int, movieid int, rating double"
    )
    two = registered.createDataFrame(
        [(2, 2, 2.0)], "userid int, movieid int, rating double"
    )
    one.write.format("movielens_ratings").mode("append").save(out)
    two.write.format("movielens_ratings").mode("overwrite").save(out)
    back = registered.read.format("movielens_ratings").load(out)
    assert [tuple(r) for r in back.collect()] == [(2, 2, 2.0)]


def test_reference_fixture_roundtrips_through_writer(spark, registered, tmp_path):
    out = str(tmp_path / "ref_rt")
    df = registered.read.format("movielens_ratings").load(FIXTURE)
    df.write.format("movielens_ratings").mode("append").save(out)
    back = registered.read.format("movielens_ratings").load(out)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


def _write_task(writer, rows):
    return writer.write(iter(rows))


def test_writer_stages_then_publishes_on_commit(tmp_path):
    """Task output lands under _staging/ (underscore prefix — invisible
    to the reader's listing); driver commit renames exactly the files
    named in the commit messages into the destination and sweeps the
    staging dir."""
    import posixpath

    from database_fragmentation_and_query_processor_spark.fs import fs_for
    from database_fragmentation_and_query_processor_spark.sources.ratings_datasource import (
        RatingsWriter,
    )

    dest = str(tmp_path / "out")
    w = RatingsWriter({"path": dest}, overwrite=True)
    msg = _write_task(w, [(1, 10, 4.5), (2, 20, 3.0)])
    fs = fs_for(dest)
    assert "/_staging/" in msg.path
    # nothing reader-visible before commit
    visible = [
        posixpath.basename(p)
        for p, is_dir, _s, _m in fs.list_status(dest)
        if not is_dir and not posixpath.basename(p).startswith(("_", "."))
    ]
    assert visible == []
    w.commit([msg])
    visible = [
        posixpath.basename(p)
        for p, is_dir, _s, _m in fs.list_status(dest)
        if not is_dir and not posixpath.basename(p).startswith(("_", "."))
    ]
    assert visible == [posixpath.basename(msg.path)]
    assert not fs.exists(posixpath.join(dest, "_staging"))
    assert fs.exists(posixpath.join(dest, "_SUCCESS"))


def test_writer_orphan_attempt_never_surfaces(tmp_path):
    """A retried/speculative attempt that finished write() but lost the
    task commit (its message is not in the committed set) stays in
    _staging and is swept — the reader can never double-count it. This
    is the round-8 fix for the direct-to-destination orphan."""
    import posixpath

    from database_fragmentation_and_query_processor_spark.fs import fs_for
    from database_fragmentation_and_query_processor_spark.sources.ratings_datasource import (
        RatingsWriter,
    )

    dest = str(tmp_path / "out")
    w = RatingsWriter({"path": dest}, overwrite=True)
    winner = _write_task(w, [(1, 10, 4.5)])
    loser = _write_task(w, [(1, 10, 4.5)])  # same rows, lost the race
    w.commit([winner])  # loser's message never reached the driver
    fs = fs_for(dest)
    visible = [
        posixpath.basename(p)
        for p, is_dir, _s, _m in fs.list_status(dest)
        if not is_dir and not posixpath.basename(p).startswith(("_", "."))
    ]
    assert visible == [posixpath.basename(winner.path)]
    assert not fs.exists(loser.path)  # swept with the staging dir


def test_writer_abort_leaves_destination_clean(tmp_path):
    """abort() removes this attempt's staged files and the staging dir;
    no _SUCCESS, nothing reader-visible."""
    import posixpath

    from database_fragmentation_and_query_processor_spark.fs import fs_for
    from database_fragmentation_and_query_processor_spark.sources.ratings_datasource import (
        RatingsWriter,
    )

    dest = str(tmp_path / "out")
    w = RatingsWriter({"path": dest}, overwrite=True)
    msg = _write_task(w, [(3, 30, 2.5)])
    w.abort([msg])
    fs = fs_for(dest)
    names = [posixpath.basename(p) for p, *_ in fs.list_status(dest)]
    assert not any(not n.startswith(("_", ".")) for n in names)
    assert not fs.exists(posixpath.join(dest, "_staging"))
    assert not fs.exists(posixpath.join(dest, "_SUCCESS"))


def test_success_manifest_pins_the_committed_file_set(tmp_path):
    """Round-9 fix: _SUCCESS is a JSON manifest naming exactly the
    published files; the reader trusts it over the listing, so a stray
    part file dropped beside a committed set (a lost rename from an
    aborted concurrent job, an operator's copy-paste) is never read."""
    import json as _json
    import posixpath

    from database_fragmentation_and_query_processor_spark.fs import fs_for
    from database_fragmentation_and_query_processor_spark.sources.ratings_datasource import (
        RatingsWriter,
        _resolve_files,
    )

    dest = str(tmp_path / "out")
    w = RatingsWriter({"path": dest}, overwrite=True)
    msg = _write_task(w, [(1, 10, 4.5), (2, 20, 3.0)])
    w.commit([msg])
    fs = fs_for(dest)
    doc = _json.loads(fs.read_text(posixpath.join(dest, "_SUCCESS")))
    assert doc["n_rows"] == 2
    assert doc["files"] == [posixpath.basename(msg.path)]
    # a stray file beside the committed set is invisible to the reader
    (tmp_path / "out" / "part-stray.txt").write_text("9::9::1.0::0\n")
    files = _resolve_files(dest, fs)
    assert [posixpath.basename(p) for p in files] == doc["files"]


def test_reader_refuses_partial_commit(tmp_path):
    """A driver crash between the publish renames and the _SUCCESS
    marker leaves part files visible but _staging/ behind (the sweep
    runs last); the reader must refuse that directory rather than
    silently return whichever subset of renames landed."""
    import posixpath

    import pytest as _pytest

    from database_fragmentation_and_query_processor_spark.fs import fs_for
    from database_fragmentation_and_query_processor_spark.sources.ratings_datasource import (
        RatingsWriter,
        _resolve_files,
    )

    dest = str(tmp_path / "out")
    w = RatingsWriter({"path": dest}, overwrite=True)
    msg = _write_task(w, [(1, 10, 4.5)])
    fs = fs_for(dest)
    # simulate the crash: the rename landed, the marker never did
    fs.rename(msg.path, posixpath.join(dest, posixpath.basename(msg.path)))
    assert fs.exists(posixpath.join(dest, RatingsWriter.STAGING_DIR))
    with _pytest.raises(IOError, match="partial|mid-commit"):
        _resolve_files(dest, fs)


def test_manifest_naming_missing_file_is_an_error(tmp_path):
    """A manifest that names files not on disk means the commit is
    corrupt (the ordering makes this unreachable by a crash alone);
    refuse rather than read a partial set."""
    import posixpath

    import pytest as _pytest

    from database_fragmentation_and_query_processor_spark.fs import fs_for
    from database_fragmentation_and_query_processor_spark.sources.ratings_datasource import (
        RatingsWriter,
        _resolve_files,
    )

    dest = str(tmp_path / "out")
    w = RatingsWriter({"path": dest}, overwrite=True)
    msg = _write_task(w, [(1, 10, 4.5)])
    w.commit([msg])
    fs = fs_for(dest)
    fs.delete(posixpath.join(dest, posixpath.basename(msg.path)))
    with _pytest.raises(IOError, match="manifest"):
        _resolve_files(dest, fs)


def test_append_commit_unions_prior_manifest(tmp_path):
    """Round-10 fix (r9 advisor, high): an append-mode commit must
    carry the previously committed manifest forward — a manifest naming
    only the second job's files silently orphans every file the first
    job published (the manifest-trusting reader never lists them)."""
    import json as _json
    import posixpath

    from database_fragmentation_and_query_processor_spark.fs import fs_for
    from database_fragmentation_and_query_processor_spark.sources.ratings_datasource import (
        RatingsWriter,
        _resolve_files,
    )

    dest = str(tmp_path / "out")
    w1 = RatingsWriter({"path": dest}, overwrite=True)
    m1 = _write_task(w1, [(1, 10, 4.5), (2, 20, 3.0)])
    w1.commit([m1])
    w2 = RatingsWriter({"path": dest}, overwrite=False)
    m2 = _write_task(w2, [(3, 30, 1.5)])
    w2.commit([m2])
    fs = fs_for(dest)
    doc = _json.loads(fs.read_text(posixpath.join(dest, "_SUCCESS")))
    assert doc["n_rows"] == 3
    assert doc["files"] == sorted(
        [posixpath.basename(m1.path), posixpath.basename(m2.path)]
    )
    names = {posixpath.basename(p) for p in _resolve_files(dest, fs)}
    assert posixpath.basename(m1.path) in names  # job1 still visible
    assert posixpath.basename(m2.path) in names


def test_append_onto_unmanifested_data_is_refused(tmp_path):
    """Appending onto a directory with visible data files but no valid
    manifest has no authoritative prior file set to union — refuse
    rather than guess from the listing."""
    import pytest as _pytest

    from database_fragmentation_and_query_processor_spark.sources.ratings_datasource import (
        RatingsWriter,
    )

    dest = tmp_path / "out"
    dest.mkdir()
    (dest / "part-foreign.txt").write_text("9::9::1.0::0\n")
    w = RatingsWriter({"path": str(dest)}, overwrite=False)
    msg = _write_task(w, [(1, 10, 4.5)])
    with _pytest.raises(IOError, match="append"):
        w.commit([msg])


def test_append_into_fresh_directory_behaves_like_first_write(tmp_path):
    """Append with no prior commit is just the first commit: one
    manifest naming this job's files."""
    import json as _json
    import posixpath

    from database_fragmentation_and_query_processor_spark.fs import fs_for
    from database_fragmentation_and_query_processor_spark.sources.ratings_datasource import (
        RatingsWriter,
    )

    dest = str(tmp_path / "out")
    w = RatingsWriter({"path": dest}, overwrite=False)
    msg = _write_task(w, [(1, 10, 4.5)])
    w.commit([msg])
    fs = fs_for(dest)
    doc = _json.loads(fs.read_text(posixpath.join(dest, "_SUCCESS")))
    assert doc["n_rows"] == 1
    assert doc["files"] == [posixpath.basename(msg.path)]


def test_spark_append_mode_roundtrip(spark, registered, tmp_path):
    """End-to-end through Spark's writer surface: overwrite then append
    then read — the union of both jobs' rows comes back."""
    dest = str(tmp_path / "out")
    df1 = spark.createDataFrame(
        [(1, 10, 4.5), (2, 20, 3.0)], "userid int, movieid int, rating double"
    )
    df1.write.format("movielens_ratings").mode("overwrite").save(dest)
    df2 = spark.createDataFrame(
        [(3, 30, 1.5)], "userid int, movieid int, rating double"
    )
    df2.write.format("movielens_ratings").mode("append").save(dest)
    got = sorted(
        tuple(r)
        for r in spark.read.format("movielens_ratings").load(dest).collect()
    )
    assert got == [(1, 10, 4.5), (2, 20, 3.0), (3, 30, 1.5)]
