"""Warehouse FS shim (fs.py): the driver-side metadata/commit IO must
work identically through POSIX (LocalFS), the Hadoop FileSystem API
(HadoopFS over file:// — same code path as hdfs:// / s3a://), and the
object-store pointer-commit protocol (no atomic rename).

Also pins the round-6 invariant that NO bare POSIX mutation remains on
warehouse paths outside the shim in the four modules the r5 verdict
flagged (catalog, api, streaming sinks, ingestion ledger).
"""

from __future__ import annotations

import os

import pytest

from database_fragmentation_and_query_processor_spark import fs as fslib
from database_fragmentation_and_query_processor_spark.catalog import FragmentCatalog


# ---------------------------------------------------------------------------
# LocalFS primitives
# ---------------------------------------------------------------------------

def test_localfs_text_roundtrip_and_listing(tmp_path):
    fs = fslib.LocalFS()
    base = str(tmp_path / "wh")
    fs.makedirs(base)
    p = fslib.join(base, "meta.json")
    fs.write_text_atomic(p, '{"a": 1}')
    assert fs.exists(p) and not fs.is_dir(p)
    assert fslib.read_json(fs, p) == {"a": 1}
    # atomic write leaves no tmp litter
    names = [os.path.basename(c[0]) for c in fs.list_status(base)]
    assert names == ["meta.json"]
    fs.delete(p)
    assert not fs.exists(p)


def test_localfs_accepts_file_uris(tmp_path):
    fs = fslib.LocalFS()
    uri = "file://" + str(tmp_path / "x.txt")
    fs.write_text_atomic(uri, "hi")
    assert fs.read_text(uri) == "hi"
    assert (tmp_path / "x.txt").read_text() == "hi"


def test_fs_for_dispatch(tmp_path):
    assert isinstance(fslib.fs_for(str(tmp_path)), fslib.LocalFS)
    assert isinstance(fslib.fs_for("file:///tmp/x"), fslib.LocalFS)
    with pytest.raises(ValueError):
        fslib.fs_for("s3a://bucket/wh")  # no session → explicit error


# ---------------------------------------------------------------------------
# Commit protocol: rename-swap mode
# ---------------------------------------------------------------------------

def _write_marker_dir(fs, d, text):
    fs.makedirs(d)
    fs.write_text_atomic(fslib.join(d, "part-0.txt"), text)


def test_commit_swap_first_and_replace(tmp_path):
    fs = fslib.LocalFS()
    target = str(tmp_path / "ds")
    s1 = fslib.stage_path(fs, target, "v")
    assert not s1.startswith(target + "/")  # sibling dir, layout unchanged
    _write_marker_dir(fs, s1, "one")
    assert fslib.commit_staged(fs, s1, target) == target
    assert fs.read_text(fslib.join(target, "part-0.txt")) == "one"
    assert fslib.dataset_exists(fs, target)
    # replace
    s2 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s2, "two")
    assert fslib.commit_staged(fs, s2, target) == target
    assert fs.read_text(fslib.join(target, "part-0.txt")) == "two"
    # no stage/old litter left behind
    siblings = sorted(os.listdir(tmp_path))
    assert siblings == ["ds"]
    # resolve is a no-op in swap mode
    assert fslib.resolve_dataset(fs, target) == target


# ---------------------------------------------------------------------------
# Commit protocol: pointer mode (object stores without atomic rename)
# ---------------------------------------------------------------------------

def test_commit_pointer_flip_and_prune(tmp_path):
    fs = fslib.LocalFS(atomic_rename=False)
    target = str(tmp_path / "ds")
    assert not fslib.dataset_exists(fs, target)
    committed = []
    for i in range(4):
        staged = fslib.stage_path(fs, target, "gen")
        assert staged.startswith(target + "/gen-")
        _write_marker_dir(fs, staged, f"v{i}")
        committed.append(fslib.commit_staged(fs, staged, target))
    # pointer resolves to the LAST committed generation
    cur = fslib.resolve_dataset(fs, target)
    assert cur == committed[-1]
    assert fs.read_text(fslib.join(cur, "part-0.txt")) == "v3"
    assert fslib.dataset_exists(fs, target)
    # old generations pruned down to KEEP_GENERATIONS
    gens = [n for n in os.listdir(target) if n.startswith("gen-")]
    assert len(gens) == fslib.KEEP_GENERATIONS
    # previous generation retained for in-flight readers
    assert os.path.basename(committed[-2]) in gens


# ---------------------------------------------------------------------------
# HadoopFS through the session JVM, driven with file:// URIs
# ---------------------------------------------------------------------------

def test_hadoopfs_primitives_file_uri(spark, tmp_path):
    base = "file://" + str(tmp_path / "wh")
    fs = fslib.fs_for(base, spark)
    assert isinstance(fs, fslib.HadoopFS)
    assert fs.atomic_rename  # file:// is rename-capable
    fs.makedirs(base)
    p = fslib.join(base, "meta.json")
    fs.write_text_atomic(p, '{"n": 5}')
    assert fs.exists(p)
    assert fslib.read_json(fs, p) == {"n": 5}
    # listing carries (path, is_dir, size, mtime_ns)
    entries = fs.list_status(base)
    assert len(entries) == 1
    path0, is_dir0, size0, mtime0 = entries[0]
    assert path0.endswith("meta.json") and not is_dir0
    assert size0 == len('{"n": 5}') and mtime0 > 0
    fs.rename(p, fslib.join(base, "meta2.json"))
    assert not fs.exists(p) and fs.exists(fslib.join(base, "meta2.json"))
    fs.delete(base, recursive=True)
    assert not fs.exists(base)


def test_hadoopfs_commit_swap_file_uri(spark, tmp_path):
    base = "file://" + str(tmp_path)
    fs = fslib.fs_for(base, spark)
    target = fslib.join(base, "ds")
    s1 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s1, "one")
    assert fslib.commit_staged(fs, s1, target) == target
    s2 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s2, "two")
    fslib.commit_staged(fs, s2, target)
    assert fs.read_text(fslib.join(target, "part-0.txt")) == "two"
    assert sorted(os.listdir(tmp_path)) == ["ds"]


# ---------------------------------------------------------------------------
# Catalog + ledger through the shim
# ---------------------------------------------------------------------------

def test_catalog_over_hadoopfs_file_uri(spark, tmp_path):
    wh = "file://" + str(tmp_path / "wh")
    cat = FragmentCatalog(wh, spark=spark)
    assert isinstance(cat._fs, fslib.HadoopFS)
    cat.update_range(n=5, min_value=0.0, max_value=5.0, interval=1.0)
    cat.update_round_robin(n=3, last_inserted=7)
    # a FRESH catalog instance (new session semantics) sees the state
    cat2 = FragmentCatalog(wh, spark=spark)
    assert cat2.range_meta().n == 5 and cat2.range_meta().interval == 1.0
    assert cat2.round_robin_meta().last_inserted == 7
    # ...and so does a plain LocalFS catalog on the same directory
    cat3 = FragmentCatalog(str(tmp_path / "wh"))
    assert cat3.range_meta().n == 5
    cat2.clear()
    assert FragmentCatalog(wh, spark=spark).range_meta().n == 0


def test_incremental_ledger_over_shim(spark, tmp_path):
    from database_fragmentation_and_query_processor_spark.sources import (
        incremental as inc,
    )

    data = tmp_path / "drops"
    data.mkdir()
    ledger = str(tmp_path / "ledger")
    spark.range(3).write.mode("overwrite").parquet(str(data / "a.parquet"))
    spark.range(5).write.mode("overwrite").parquet(str(data / "b.parquet"))
    # the drop dir contains parquet DIRECTORIES (Spark layout) — this
    # ledger tracks file drops, so write two plain files too
    (data / "c.parquet").write_bytes(b"")
    # file:// URI → HadoopFS listing path
    uri = "file://" + str(data)
    idents = inc.new_files(uri, "file://" + ledger, spark=spark)
    names = sorted(i.path.rsplit("/", 1)[-1] for i in idents)
    assert names == ["c.parquet"]  # dirs are skipped, files tracked
    inc.commit_ingest("file://" + ledger, idents, spark=spark)
    assert inc.new_files(uri, "file://" + ledger, spark=spark) == []
    # rewriting the file with new content re-ingests it
    (data / "c.parquet").write_bytes(b"xx")
    again = inc.new_files(uri, "file://" + ledger, spark=spark)
    assert [i.path.rsplit("/", 1)[-1] for i in again] == ["c.parquet"]


# ---------------------------------------------------------------------------
# No bare POSIX mutation on warehouse paths outside the shim
# ---------------------------------------------------------------------------

def test_no_bare_posix_io_in_shimmed_modules():
    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "database_fragmentation_and_query_processor_spark",
    )
    flagged = [
        "catalog.py",
        "api.py",
        os.path.join("streaming", "events.py"),
        os.path.join("sources", "incremental.py"),
        os.path.join("sources", "ratings_datasource.py"),
        os.path.join("operators", "timeseries.py"),
    ]
    banned = ("os.rename(", "os.replace(", "shutil.rmtree(", "shutil.move(")
    for rel in flagged:
        src = open(os.path.join(pkg, rel)).read()
        for tok in banned:
            assert tok not in src, f"{rel} still calls {tok} directly"
    # the splittable source's DATA path must go through fs.read_bytes,
    # never a bare builtin open (r6 verdict item: local-only datasource)
    import re as _re

    ds_src = open(
        os.path.join(pkg, "sources", "ratings_datasource.py")
    ).read()
    bare_open = _re.findall(r"(?<![\w.])open\(", ds_src)
    assert not bare_open, "ratings_datasource bypasses the fs shim"
    assert "fs.read_bytes" in ds_src or "read_bytes(" in ds_src


def test_writer_lock_contention(tmp_path):
    """Catalog mutations enforce the single-writer model: a live lock
    by another owner fails the mutation fast (with the holder named)
    and leaves the sidecar untouched; release unblocks."""
    import pytest

    from database_fragmentation_and_query_processor_spark import fs as fslib
    from database_fragmentation_and_query_processor_spark.catalog import (
        FragmentCatalog,
    )

    wh = str(tmp_path / "wh")
    cat = FragmentCatalog(wh)
    cat.update_range(n=3)
    shim = fslib.fs_for(wh)
    lock = fslib.acquire_writer_lock(shim, wh, owner="other-writer")
    with pytest.raises(fslib.LockHeldError, match="other-writer"):
        cat.update_range(n=5)
    assert cat.range_meta().n == 3  # losing writer changed nothing
    fslib.release_writer_lock(shim, lock)
    assert cat.update_range(n=5).n == 5


def test_writer_lock_breaks_stale_holder(tmp_path):
    """A lock whose holder exceeded its TTL (crashed client) is broken
    by the next acquirer instead of wedging the catalog forever."""
    import json as _json

    from database_fragmentation_and_query_processor_spark import fs as fslib
    from database_fragmentation_and_query_processor_spark.catalog import (
        FragmentCatalog,
    )

    wh = str(tmp_path / "wh")
    shim = fslib.fs_for(wh)
    shim.makedirs(wh)
    shim.write_text_atomic(
        fslib.join(wh, fslib.LOCK_FILENAME),
        _json.dumps({"owner": "dead", "acquired_ns": 0, "ttl_sec": 1}),
    )
    cat = FragmentCatalog(wh)
    assert cat.update_range(n=7).n == 7  # broke the stale lock
    # and the lock was released again afterwards
    assert not shim.exists(fslib.join(wh, fslib.LOCK_FILENAME))


def test_writer_lock_break_leaves_no_tombstone(tmp_path):
    """The stale break renames to a unique tombstone (atomic: one
    winner per break) and deletes it — nothing lingers beside the
    fresh lock."""
    import json as _json

    from database_fragmentation_and_query_processor_spark import fs as fslib

    wh = str(tmp_path / "wh")
    shim = fslib.fs_for(wh)
    shim.makedirs(wh)
    shim.write_text_atomic(
        fslib.join(wh, fslib.LOCK_FILENAME),
        _json.dumps({"owner": "dead", "acquired_ns": 0, "ttl_sec": 1}),
    )
    lock = fslib.acquire_writer_lock(shim, wh, owner="breaker")
    names = [p for p, _d, _s, _m in shim.list_status(wh)]
    assert not any(".broken-" in n for n in names)
    assert _json.loads(shim.read_text(lock))["owner"] == "breaker"
    fslib.release_writer_lock(shim, lock)


def test_writer_lock_losing_breaker_does_not_steal(tmp_path):
    """Two contenders read the same stale lock; the one whose
    tombstone rename fails (the other won the atomic break) must NOT
    delete anything or claim the lock — it re-contends and fails
    loudly. Simulated by a shim whose rename always raises."""
    import json as _json

    import pytest

    from database_fragmentation_and_query_processor_spark import fs as fslib

    wh = str(tmp_path / "wh")
    real = fslib.fs_for(wh)
    real.makedirs(wh)
    stale = _json.dumps({"owner": "dead", "acquired_ns": 0, "ttl_sec": 1})
    real.write_text_atomic(fslib.join(wh, fslib.LOCK_FILENAME), stale)

    class LosesEveryRename:
        def __getattr__(self, name):
            return getattr(real, name)

        def rename(self, src, dst):
            raise OSError("another contender broke the lock first")

    with pytest.raises(fslib.LockHeldError):
        fslib.acquire_writer_lock(LosesEveryRename(), wh, owner="loser")
    # the existing lock file was never deleted by the loser
    assert real.read_text(fslib.join(wh, fslib.LOCK_FILENAME)) == stale


def test_writer_lock_readback_rejects_stolen_create(tmp_path):
    """On stores where create-if-absent is best-effort, two creates can
    both 'succeed' last-write-wins — the read-back verify means only
    the contender whose payload is actually on disk holds the lock."""
    import json as _json

    import pytest

    from database_fragmentation_and_query_processor_spark import fs as fslib

    wh = str(tmp_path / "wh")
    real = fslib.fs_for(wh)
    real.makedirs(wh)
    foreign = _json.dumps(
        {"owner": "rival", "acquired_ns": 10**30, "ttl_sec": 300}
    )

    class LyingCreate:
        lied = False

        def __getattr__(self, name):
            return getattr(real, name)

        def create_exclusive(self, path, text):
            if not self.lied:
                # first attempt: claims success but the rival's
                # concurrent PUT won (last-write-wins object store)
                self.lied = True
                real.write_text_atomic(path, foreign)
                return True
            return real.create_exclusive(path, text)

    with pytest.raises(fslib.LockHeldError, match="rival"):
        fslib.acquire_writer_lock(LyingCreate(), wh, owner="me")


# ---------------------------------------------------------------------------
# Round-10 hardening: marker-gated swap commits + crash-mid-commit recovery
# ---------------------------------------------------------------------------

def test_commit_refuses_unmarked_staged_dir_when_required(tmp_path):
    """require_marker extends the ratings DataSource's marker-gated
    discipline to the write-then-swap path: a staged dir without the
    job-complete _SUCCESS (crashed or still-running write) must never
    be published over the live dataset."""
    import pytest

    fs = fslib.LocalFS()
    target = str(tmp_path / "ds")
    s0 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s0, "base")
    fs.write_text_atomic(fslib.join(s0, "_SUCCESS"), "")
    fslib.commit_staged(fs, s0, target, require_marker=True)
    s1 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s1, "half-written")  # no _SUCCESS
    with pytest.raises(IOError, match="_SUCCESS"):
        fslib.commit_staged(fs, s1, target, require_marker=True)
    # live dataset untouched by the refused commit
    assert fs.read_text(fslib.join(target, "part-0.txt")) == "base"


def test_recovery_completes_interrupted_commit_with_marker(tmp_path):
    """Crash between the two swap renames (old parked, staged never
    landed): recovery must COMPLETE the commit — the staged sibling
    carries _SUCCESS, so it is the newest consistent version."""
    fs = fslib.LocalFS()
    target = str(tmp_path / "ds")
    s0 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s0, "v0")
    fslib.commit_staged(fs, s0, target)
    # stage v1 (complete, marked), then simulate the crash exactly as
    # the protocol leaves the world: intent breadcrumb + first rename
    # (target -> old) happened, second rename never did
    s1 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s1, "v1")
    fs.write_text_atomic(fslib.join(s1, "_SUCCESS"), "")
    old = fslib.begin_swap(fs, s1, target)
    assert not fs.exists(target)
    got = fslib.recover_interrupted_commit(fs, target)
    assert got == target
    assert fs.read_text(fslib.join(target, "part-0.txt")) == "v1"
    # the completed commit's parked predecessor is superseded, and the
    # breadcrumb does not leak into the published dataset
    assert not fs.exists(old)
    assert not fs.exists(fslib.join(target, fslib.INTENT_FILE))


def test_recovery_rolls_back_to_old_without_marker(tmp_path):
    """Same crash, but the staged dir carries no _SUCCESS (non-Spark
    content, or itself incomplete): recovery must roll BACK to the
    parked pre-commit version, never publish the unmarked dir."""
    fs = fslib.LocalFS()
    target = str(tmp_path / "ds")
    s0 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s0, "v0")
    fslib.commit_staged(fs, s0, target)
    s1 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s1, "v1-unmarked")
    fs.rename(target, f"{target}.{fslib.new_token('old')}")
    got = fslib.recover_interrupted_commit(fs, target)
    assert got == target
    assert fs.read_text(fslib.join(target, "part-0.txt")) == "v0"


def test_recovery_noops_on_healthy_dataset_and_pointer_mode(tmp_path):
    fs = fslib.LocalFS()
    target = str(tmp_path / "ds")
    s0 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s0, "v0")
    fslib.commit_staged(fs, s0, target)
    # healthy: in-flight sibling stages must NOT be touched
    s1 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s1, "inflight")
    fs.write_text_atomic(fslib.join(s1, "_SUCCESS"), "")
    assert fslib.recover_interrupted_commit(fs, target) is None
    assert fs.exists(s1)
    assert fs.read_text(fslib.join(target, "part-0.txt")) == "v0"
    # pointer mode: commits are single atomic pointer writes
    pfs = fslib.LocalFS(atomic_rename=False)
    ptarget = str(tmp_path / "pds")
    ps = fslib.stage_path(pfs, ptarget, "gen")
    _write_marker_dir(pfs, ps, "p0")
    fslib.commit_staged(pfs, ps, ptarget)
    assert fslib.recover_interrupted_commit(pfs, ptarget) is None


def test_recovery_never_promotes_an_abandoned_stage_over_newer_data(
    tmp_path,
):
    """ADVICE r10 (medium): a marked staged dir abandoned before
    commit_staged was ever called (writer died right after the Spark
    write) must NOT be promoted over a NEWER committed version parked
    by a later interrupted commit — that silently reverts the dataset.
    The abandoned stage has no _COMMIT_INTENT breadcrumb, so recovery
    rolls back to the parked newer version instead."""
    fs = fslib.LocalFS()
    target = str(tmp_path / "ds")
    s0 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s0, "v0")
    fslib.commit_staged(fs, s0, target)
    # the abandoned stage: complete content + _SUCCESS, its writer died
    # before ever calling commit_staged (dataset live, so no recovery
    # pass may consume it)
    s_dead = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s_dead, "stale-abandoned")
    fs.write_text_atomic(fslib.join(s_dead, "_SUCCESS"), "")
    # a NEWER version commits normally over the live dataset
    s1 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s1, "v1-committed")
    fs.write_text_atomic(fslib.join(s1, "_SUCCESS"), "")
    fslib.commit_staged(fs, s1, target)
    # a subsequent require_marker=False commit (unmarked content)
    # crashes between its two renames: v1 is parked in old-, the
    # unmarked stage can't be promoted
    s2 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s2, "v2-unmarked")
    fslib.begin_swap(fs, s2, target)
    got = fslib.recover_interrupted_commit(fs, target)
    assert got == target
    assert fs.read_text(fslib.join(target, "part-0.txt")) == "v1-committed"
    # the abandoned stage was GC'd by the superseding v1 commit
    # (token-bounded prune, ADVICE r10-medium closure) — it can never
    # reappear in a later recovery's candidate set
    assert not fs.exists(s_dead)


def test_commit_prunes_stale_old_siblings(tmp_path):
    """ADVICE r10 (low): an old- sibling left by a crash after the
    second rename (before the delete) must not accumulate forever —
    the next successful commit GCs it."""
    fs = fslib.LocalFS()
    target = str(tmp_path / "ds")
    s0 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s0, "v0")
    fslib.commit_staged(fs, s0, target)
    # crash AFTER rename2, before delete: old- survives, target live
    stale_old = f"{target}.old-{fslib.new_token('x')[2:]}"
    fs.makedirs(stale_old)
    fs.write_text_atomic(fslib.join(stale_old, "part-0.txt"), "parked")
    s1 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s1, "v1")
    fs.write_text_atomic(fslib.join(s1, "_SUCCESS"), "")
    fslib.commit_staged(fs, s1, target, require_marker=True)
    assert fs.read_text(fslib.join(target, "part-0.txt")) == "v1"
    assert not fs.exists(stale_old)
    # no _COMMIT_INTENT leaks into the live dataset
    assert not fs.exists(fslib.join(target, fslib.INTENT_FILE))


def test_next_commit_self_heals_interrupted_predecessor(tmp_path):
    """commit_staged runs recovery first: a writer landing after a
    crashed predecessor finds the dataset healed and replaces it
    normally (no missing-target surprise, no lost old version)."""
    fs = fslib.LocalFS()
    target = str(tmp_path / "ds")
    s0 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s0, "v0")
    fslib.commit_staged(fs, s0, target)
    fs.rename(target, f"{target}.{fslib.new_token('old')}")  # the crash
    s2 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s2, "v2")
    fs.write_text_atomic(fslib.join(s2, "_SUCCESS"), "")
    assert fslib.commit_staged(fs, s2, target, require_marker=True) == target
    assert fs.read_text(fslib.join(target, "part-0.txt")) == "v2"


def test_stale_stage_cannot_resurrect_after_target_loss(tmp_path):
    """Crash-injection repro of the ADVICE r10-medium residue: before
    the token-bounded stage GC, a marked stage abandoned after the
    first commit SURVIVED every later successful commit, and any
    target-missing-no-old state (external loss, a drop that missed
    siblings) let recovery's first-commit-liveness branch promote it —
    silently reverting the dataset to stale data. With the GC, the
    superseding commit removes the abandoned stage, so the same
    recovery finds nothing to promote and reports the dataset gone."""
    fs = fslib.LocalFS()
    target = str(tmp_path / "ds")
    s0 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s0, "v0")
    fslib.commit_staged(fs, s0, target)
    # abandoned marked stage: writer died after its Spark write,
    # before commit_staged
    s_dead = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s_dead, "stale-abandoned")
    fs.write_text_atomic(fslib.join(s_dead, "_SUCCESS"), "")
    # a newer version commits normally — this must GC s_dead
    s1 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s1, "v1-committed")
    fs.write_text_atomic(fslib.join(s1, "_SUCCESS"), "")
    fslib.commit_staged(fs, s1, target, require_marker=True)
    assert not fs.exists(s_dead)
    # the dataset is lost without an old- park (the no-old state)
    fs.delete(target, recursive=True)
    assert fslib.recover_interrupted_commit(fs, target) is None
    assert not fs.exists(target)


def test_stage_gc_is_token_bounded(tmp_path):
    """The stage GC must never eat a stage minted AFTER the committing
    writer's own (a hypothetical in-flight successor): only strictly
    older staged siblings are pruned."""
    fs = fslib.LocalFS()
    target = str(tmp_path / "ds")
    s0 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s0, "v0")
    fslib.commit_staged(fs, s0, target)
    s1 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s1, "v1")
    fs.write_text_atomic(fslib.join(s1, "_SUCCESS"), "")
    # an in-flight successor stages AFTER s1 (newer token)
    s_next = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s_next, "v2-in-flight")
    fslib.commit_staged(fs, s1, target, require_marker=True)
    assert fs.read_text(fslib.join(target, "part-0.txt")) == "v1"
    assert fs.exists(s_next)  # newer stage untouched
    # ...and the successor's own commit then lands normally
    fs.write_text_atomic(fslib.join(s_next, "_SUCCESS"), "")
    fslib.commit_staged(fs, s_next, target, require_marker=True)
    assert fs.read_text(fslib.join(target, "part-0.txt")) == "v2-in-flight"


def test_drop_purges_siblings(tmp_path):
    """delete_tables must remove old-/staged siblings with the dataset:
    a dropped table with a surviving marked stage would otherwise be
    resurrected by the next reader's recovery pass."""
    fs = fslib.LocalFS()
    target = str(tmp_path / "ds")
    s0 = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s0, "v0")
    fslib.commit_staged(fs, s0, target)
    s_dead = fslib.stage_path(fs, target, "v")
    _write_marker_dir(fs, s_dead, "stale")
    fs.write_text_atomic(fslib.join(s_dead, "_SUCCESS"), "")
    stale_old = f"{target}.old-{fslib.new_token('x')[2:]}"
    fs.makedirs(stale_old)
    fs.delete(target, recursive=True)
    fslib.purge_siblings(fs, target)
    assert not fs.exists(s_dead)
    assert not fs.exists(stale_old)
    assert fslib.recover_interrupted_commit(fs, target) is None
