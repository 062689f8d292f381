"""Round-14 contracts for the delta-commit layout's lifecycle:

- lost-delta detection (r13 ADVICE medium): a manifest-listed delta
  missing from storage must RAISE, never be silently skipped — the
  manifest is written only after its delta commits and compaction
  clears the manifest before deleting deltas, so listed-but-missing is
  always lost data;
- the auto-compaction policy (r13 verdict task 5): an M-batch ingest
  with ``compact_threshold=N`` never accumulates more than N committed
  segments, with pair-set content identical to an uncompacted run;
- scrambled-input invariance over the segmented read + keyed dedup
  path, base+delta and post-compaction (r13 verdict task 8).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from database_fragmentation_and_query_processor_spark import fs as fslib
from database_fragmentation_and_query_processor_spark.operators import dedup as D
from database_fragmentation_and_query_processor_spark.streaming import near_dup as ND

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

#: 6 tiny batches; docs 101/104 twin standing doc 1, 103/105 twin 102
BATCHES = [
    [(101, "alpha beta gamma delta epsilon zeta")],
    [(102, "one two three four five six seven")],
    [(103, "one two three four five six seven")],
    [(104, "alpha beta gamma delta epsilon zeta")],
    [(105, "one two three four five six seven")],
    [(106, "red orange yellow green blue indigo")],
]
STANDING = [(1, "alpha beta gamma delta epsilon zeta")]


def _write_batches(spark, tmp_path, batches):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, SCHEMA)
        stage = tmp_path / f"stage{i}"
        df.coalesce(1).write.mode("overwrite").parquet(str(stage))
        part = [p for p in stage.iterdir() if p.name.endswith(".parquet")][0]
        part.rename(src / f"commit-{i:03d}.parquet")
    return src


def _seed_index(spark, index_path):
    spark.createDataFrame(STANDING, SCHEMA).transform(
        lambda df: D.build_dedup_index(df, k=16)
    ).write.mode("overwrite").parquet(str(index_path))


def _drain(spark, src, index_path, pairs_path, ckpt, **kw):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = ND.near_dup_sink(
        stream, str(index_path), str(pairs_path), spark,
        threshold=0.6, k=16, bands=4, checkpoint_dir=str(ckpt), **kw,
    )
    q.awaitTermination()


def _pairs(spark, pairs_path):
    return {
        (r["id_a"], r["id_b"])
        for r in ND.read_near_dup_pairs(spark, str(pairs_path)).collect()
    }


def test_missing_delta_raises_not_skips(spark, tmp_path):
    """A manifest-listed delta whose dataset is gone (tmp reaper, manual
    purge) must raise MissingDeltaError from every segmented read —
    the pre-r14 code skipped it and served a silently incomplete
    union."""
    src = _write_batches(spark, tmp_path, BATCHES[:2])
    index_path, pairs_path = tmp_path / "index", tmp_path / "pairs"
    _seed_index(spark, index_path)
    _drain(spark, src, index_path, pairs_path, tmp_path / "ckpt",
           compact_threshold=None)

    wfs = fslib.fs_for(str(index_path), spark)
    assert len(ND._read_manifest(wfs, str(index_path))) == 2
    # reap one committed delta out from under the surviving manifest
    wfs.delete(ND._delta_path(str(index_path), "000001"), recursive=True)

    with pytest.raises(ND.MissingDeltaError, match="000001"):
        ND.read_near_dup_index(spark, str(index_path))
    with pytest.raises(ND.MissingDeltaError):
        ND._segment_dirs(wfs, str(index_path))
    # the pairs side is intact and still reads fine
    assert len(_pairs(spark, pairs_path)) >= 1


def test_auto_compaction_bounds_segment_count(spark, tmp_path):
    """The policy contract: a 6-batch ingest with compact_threshold=2
    never leaves more than 2 committed segments in either manifest,
    and the final pair set matches a threshold-disabled control run
    exactly (compaction is lossless maintenance, not semantics)."""
    src = _write_batches(spark, tmp_path, BATCHES)
    index_path, pairs_path = tmp_path / "index", tmp_path / "pairs"
    _seed_index(spark, index_path)
    _drain(spark, src, index_path, pairs_path, tmp_path / "ckpt",
           compact_threshold=2)

    wfs = fslib.fs_for(str(index_path), spark)
    assert len(ND._read_manifest(wfs, str(index_path))) <= 2
    assert len(ND._read_manifest(wfs, str(pairs_path))) <= 2
    # no orphaned delta dirs beyond the manifest
    deltas_on_disk = [
        s for s in os.listdir(tmp_path) if ND.DELTA_SEP in s
    ]
    listed = {
        ND._delta_path(p, n).rsplit("/", 1)[-1]
        for p in (str(index_path), str(pairs_path))
        for n in ND._read_manifest(wfs, p)
    }
    assert set(deltas_on_disk) <= listed, (deltas_on_disk, listed)

    got = _pairs(spark, pairs_path)

    # control: same ingest, policy disabled
    ctl = tmp_path / "ctl"
    ctl.mkdir()
    src2 = _write_batches(spark, ctl, BATCHES)
    _seed_index(spark, ctl / "index")
    _drain(spark, src2, ctl / "index", ctl / "pairs", ctl / "ckpt",
           compact_threshold=None)
    assert len(ND._read_manifest(wfs, str(ctl / "pairs"))) == len(BATCHES)
    assert got == _pairs(spark, ctl / "pairs")
    assert (101, 104) in got and (102, 103) in got and (1, 101) in got


def test_auto_compaction_later_ingest_probes_compacted_base(spark, tmp_path):
    """After the in-sink compaction, a LATER arrival must still find
    pairs against docs whose deltas were folded into the base."""
    src = _write_batches(spark, tmp_path, BATCHES[:4])
    index_path, pairs_path = tmp_path / "index", tmp_path / "pairs"
    _seed_index(spark, index_path)
    ckpt = tmp_path / "ckpt"
    _drain(spark, src, index_path, pairs_path, ckpt, compact_threshold=2)

    # batch 4's twin (105 ~ 102/103) arrives after everything compacted
    df = spark.createDataFrame(BATCHES[4], SCHEMA)
    stage = tmp_path / "stage-late"
    df.coalesce(1).write.mode("overwrite").parquet(str(stage))
    part = [p for p in stage.iterdir() if p.name.endswith(".parquet")][0]
    part.rename(src / "commit-late.parquet")
    _drain(spark, src, index_path, pairs_path, ckpt, compact_threshold=2)

    got = _pairs(spark, pairs_path)
    assert (102, 105) in got and (103, 105) in got, got


def test_segmented_read_invariant_to_input_order(spark, tmp_path):
    """Scrambled-batch invariance over the segmented layout: ingesting
    the same documents in a different batch order yields the same
    keyed pair set, both through base+deltas and post-compaction."""
    perm = [BATCHES[i] for i in (3, 0, 5, 2, 4, 1)]
    results = {}
    for tag, batches, thresh in (
        ("fwd", BATCHES, None),
        ("perm", perm, None),
        ("perm_compact", perm, 2),
    ):
        root = tmp_path / tag
        root.mkdir()
        src = _write_batches(spark, root, batches)
        _seed_index(spark, root / "index")
        _drain(spark, src, root / "index", root / "pairs", root / "ckpt",
               compact_threshold=thresh)
        results[tag] = _pairs(spark, root / "pairs")
    assert results["fwd"] == results["perm"] == results["perm_compact"]
    # and an explicit compaction of the uncompacted run changes nothing
    ND.compact_near_dup_pairs(spark, str(tmp_path / "perm" / "pairs"))
    ND.compact_near_dup_index(spark, str(tmp_path / "perm" / "index"))
    assert _pairs(spark, tmp_path / "perm" / "pairs") == results["fwd"]


def test_real_resize_pixels_match_driver_replay(spark):
    """multimodal_real_resize's distributed output (generate → vendored
    decode → bilinear resize inside mapInPandas) must byte-match a
    driver-side numpy replay of the same path — actual pixels, not
    plumbing shapes (r13 verdict task 7)."""
    import hashlib
    import zlib

    from database_fragmentation_and_query_processor_spark.multimodal.codecs import (
        decode_ppm,
        encode_ppm,
        resize_rgb,
    )
    from database_fragmentation_and_query_processor_spark.queries import curation as CU

    rows = {
        r["media_id"]: r
        for r in CU.q_multimodal_real_resize(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert len(rows) == CU.RP_N_IMAGES
    for i in (0, 3, 7, 15):
        raw = resize_rgb(
            decode_ppm(encode_ppm(CU._rp_pixels(i))), CU.RP_OUT_W, CU.RP_OUT_H
        ).tobytes()
        assert rows[i]["n_bytes"] == len(raw) == CU.RP_OUT_W * CU.RP_OUT_H * 3
        assert rows[i]["crc"] == zlib.crc32(raw)
        assert rows[i]["digest"] == hashlib.md5(raw).hexdigest()


def test_builtin_codec_rejects_garbage_payload(spark):
    """The real-decode path must fail loudly on a non-image payload —
    never silently stride bytes like the stub."""
    import pytest as _pytest

    from database_fragmentation_and_query_processor_spark.multimodal.binary_ops import (
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"not an image at all"))], "media_id long, payload binary"
    )
    with _pytest.raises(Exception, match="unsupported image container"):
        resize_images(df, width=4, height=4, codec="builtin").collect()


def test_real_audio_rms_matches_driver_replay(spark):
    """multimodal_real_audio's distributed frame RMS (stdlib-wave
    decode + prefix-sum framing inside mapInPandas) must match a
    driver-side replay on the same deterministic PCM — and hand-checked
    frame geometry: frame i covers [i*hop, i*hop+frame)."""
    import numpy as np

    from database_fragmentation_and_query_processor_spark.queries import curation as CU

    rows = [
        ((r["media_id"], r["frame_idx"]), (r["start_frame"], r["rms"]))
        for r in CU.q_multimodal_real_audio(
            spark, "/root/testdata/sf0.001"
        ).collect()
    ]
    got = dict(rows)
    assert len(got) == len(rows)  # (id, frame) keys unique
    # geometry + a brute-force RMS for a spot of frames: the operator
    # emits ceil((n - frame)/hop) + 1 frames (starts 0, hop, 2·hop, …;
    # the last may be partial), never a trailing sliver beyond that
    for i in (0, 5, 11):
        pcm = CU._ra_pcm(i).astype(np.float64).mean(axis=1)
        n = pcm.size
        n_f = (max(n - CU.RA_FRAME, 0) + CU.RA_HOP - 1) // CU.RA_HOP + 1
        for k in range(n_f):
            s = k * CU.RA_HOP
            w = pcm[s : s + CU.RA_FRAME]
            expect = CU._flr_py(float(np.sqrt(np.mean(w * w))), 6)
            assert got[(i, k)] == (s, expect), (i, k, got.get((i, k)))
        assert (i, n_f) not in got


def test_indexed_ann_probes_match_inline_operators(spark):
    """The materialized IVF-PQ index's documented contract: indexed
    probes are result-identical to the inline operators with the same
    (deterministic) quantizers — assignment and codes are computed once
    at build time by the same round-6 arithmetic."""
    sf = "/root/testdata/sf0.001"
    from database_fragmentation_and_query_processor_spark.operators import (
        similarity as S,
    )
    from database_fragmentation_and_query_processor_spark.queries import common as CQ

    emb = CQ._emb(spark, sf)
    qvec = [float(v) for v in
            emb.where("vec_id = 0").select("embedding").head()[0]]
    path, cents, books = CQ._ann_ivfpq_index(spark, sf)

    def rows(df):
        return [tuple(r) for r in df.collect()]

    assert rows(
        S.ivf_topk_indexed(spark, path, qvec, cents, k=10, nprobe=4)
    ) == rows(S.ivf_topk(emb, qvec, k=10, n_lists=16, nprobe=4, cents=cents))
    assert rows(S.pq_topk_indexed(spark, path, qvec, books, k=10)) == rows(
        S.pq_topk(emb, qvec, k=10, m=4, n_codes=8, books=books)
    )
    assert rows(
        S.ivfpq_topk_indexed(spark, path, qvec, cents, books, k=10, nprobe=4)
    ) == rows(
        S.ivfpq_topk(
            emb, qvec, k=10, n_lists=16, nprobe=4, m=4, n_codes=8,
            cents=cents, books=books,
        )
    )


def test_ivfpq_index_probe_is_partition_pruned(spark):
    """The nprobe-list read must reach the scan as PartitionFilters on
    the _list partition column — the storage-level pruning that makes
    the probe touch nprobe/n_lists of a 100 TB corpus."""
    sf = "/root/testdata/sf0.001"
    from database_fragmentation_and_query_processor_spark.operators import (
        similarity as S,
    )
    from database_fragmentation_and_query_processor_spark.queries import common as CQ

    emb = CQ._emb(spark, sf)
    qvec = [float(v) for v in
            emb.where("vec_id = 0").select("embedding").head()[0]]
    path, cents, _books = CQ._ann_ivfpq_index(spark, sf)
    plan = (
        S.ivf_topk_indexed(spark, path, qvec, cents, k=10, nprobe=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "_list" in plan, plan
