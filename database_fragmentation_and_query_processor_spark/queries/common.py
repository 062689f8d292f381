"""The driver-contract correctness surface.

Each entry pairs a Spark DataFrame builder (``QUERIES``) with an exact
ANSI-SQL mirror for DuckDB (``ORACLE_SQL``). Column names, types and
values are engineered to hash-match:

- **Money/measure aggregation is DECIMAL-exact**: cast to DECIMAL before
  SUM (both engines sum decimals exactly), cast the total to DOUBLE once
  at the end. This removes float-summation-order divergence entirely.
- **Counts are BIGINT** on both sides (DuckDB SUM(int)→HUGEINT is cast).
- **Hashes are md5-derived arithmetic**, never engine-native ``hash()``.
- **Top-k/window queries carry explicit unique tie-breaks.**
- Floating similarity scores are rounded to 6 digits on both sides.

The fragmentation queries re-express the reference engine's semantics
(fixed-domain range buckets, deterministic round-robin, provenance +
dual-scheme emission — Interface1.py:122-140, 169-174, 261-347) over
the driver's synthetic ``lineitem`` table, per FIXTURES.md §1.
"""

from __future__ import annotations

import math
from collections.abc import Callable
from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cache import track as _track_cached
from ..functions import text as T
from ..functions.lattice import flr as _flr
from ..functions import vectors as V
from ..operators import dedup as D
from ..operators import merge as MergeOp
from ..operators import sampling as SampleOp
from ..operators import similarity as S
from ..operators.fragmentation import range_fragment_expr
from ..operators.scaling import stable_row_number, widen

# ---------------------------------------------------------------------------
# shared constants (embedded into BOTH the Spark plans and the oracle SQL)
# ---------------------------------------------------------------------------

def _flr_py(x: float, k: int = 6) -> float:
    """Driver-side mirror of functions.lattice.flr: half-up rounding
    via the pure-IEEE floor lattice, for Python-computed constants that
    pair with a latticed SQL expression (Python's builtin round() is
    half-EVEN on the exact binary and would diverge on boundaries)."""
    s = float(10**k)
    return math.floor(x * s + 0.5) / s


class EmptyInputError(ValueError):
    """A query's driver-side sizing/seed pre-pass found an empty
    corpus, and its degenerate output is a non-trivial row shape the
    oracle materializes from constants. Raised DELIBERATELY (r12
    empty-input sweep) so the failure mode is a named contract, never
    an accidental TypeError off a ``head()`` that returned None."""


def _empty_result(spark: SparkSession, schema: str) -> DataFrame:
    """Zero-row frame with the query's output column names — the
    degenerate result for queries whose oracle returns an empty set on
    empty input (top-k over nothing, GROUP BY over nothing). The
    driver's compare only needs names + zero rows to hash-match."""
    return spark.createDataFrame([], schema)


def _nonempty(value, query: str):
    """Guard for a collected driver-side scalar/row: raise the named
    degenerate-input error instead of letting int(None)/None[...]
    surface as a TypeError three frames later."""
    if value is None:
        raise EmptyInputError(
            f"{query}: input table is empty — this query's output is "
            f"derived from a driver-side pre-pass that needs at least "
            f"one row"
        )
    return value

RANGE_N = 5
RANGE_MIN, RANGE_MAX = 0.0, 5.0
RANGE_INTERVAL = (RANGE_MAX - RANGE_MIN) / RANGE_N
RQ_LO, RQ_HI = 1.5, 3.5
PQ_VALUE = 4.5
Q1_CUTOFF = "2000-12-01"
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-01-01"
Q5_REGION = "ASIA"
Q5_LO, Q5_HI = "1996-01-01", "1997-01-01"
MINHASH_K = 8
MINHASH_BANDS = 4
SHINGLE_N = 3
NEAR_DUP_THRESHOLD = 0.8
#: near_dup_audit's exact-ground-truth blocks are verified ≤ this many
#: docs before the quadratic within-block pair join may launch (the
#: audit's scale contract; see operators/dedup.py:blocked_jaccard_pairs)
AUDIT_MAX_BLOCK_DOCS = 4096
EMB_DIM = 64
KNN_K = 10
EMB_DUP_THRESHOLD = 0.99
DUP_SALT = 100_000  # synthesized duplicate doc_id offset


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # delegates so a single patch point covers every family module: the
    # namespace fold COPIES this function's binding into each module,
    # but all copies are one object whose body resolves _t_impl here —
    # tests (test_partition_invariance) patch common._t_impl and every
    # query in every module sees the scrambled reader
    return _t_impl(spark, sf_dir, name)


def _t_impl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _artifact_cache_path(sf_dir: str, tag: str, *source_tables: str) -> str:
    """Temp-dir path for a build-once derived artifact (materialized LSH
    index, day-partitioned events, z-ordered lineitem).

    The digest covers the sf_dir AND each source parquet's (size,
    mtime_ns): fixtures are regenerated IN PLACE between rounds (the r2
    events.parquet drift), so a path keyed on sf_dir alone would keep
    serving a stale derived copy that silently diverges from the DuckDB
    oracle reading the fresh parquet. Content-keying makes a regen land
    on a new path whose missing _SUCCESS forces a rebuild."""
    import hashlib
    import os
    import tempfile

    h = hashlib.md5(sf_dir.encode())
    for name in source_tables:
        st = os.stat(os.path.join(sf_dir, f"{name}.parquet"))
        h.update(f"|{name}:{st.st_size}:{st.st_mtime_ns}".encode())
    return os.path.join(tempfile.gettempdir(), f"dfqp_{tag}_{h.hexdigest()[:16]}")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # delegate (see _t): tests patch common._docs_impl
    return _docs_impl(spark, sf_dir)


def _docs_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, widened: the test file is a single parquet split, and
    the doc operators are CPU-bound per row (shingles, hashes) — one
    split would serialize them on one core. No-op on real clusters
    where the scan is already wide (operators/scaling.py)."""
    return widen(_t(spark, sf_dir, "documents"), key="doc_id")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # delegate (see _t): tests patch common._emb_impl
    return _emb_impl(spark, sf_dir)


def _emb_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    return widen(_t(spark, sf_dir, "embeddings"), key="vec_id")


def _ann_quantizers(spark: SparkSession, sf_dir: str):
    """Build-once quantizer artifacts shared by the whole ANN family:
    the IVF coarse centroids (kmeans_centroids, IVF_N_LISTS lists) and
    the PQ codebooks (pq_codebooks, PQ_M x PQ_CODES), trained once per
    embeddings corpus and cached as JSON content-keyed on the parquet
    (same _artifact_cache_path mechanism that took
    crosslingual_mate_retrieval from 3.75s to 0.86s in r13). Both
    trainers are deterministic round-6 arithmetic, so the cached copy
    is bit-identical to a re-derivation — the five ANN queries keep
    their static-SQL oracles unchanged. This is also the honest
    100 TB serving shape: the quantizer is corpus metadata built at
    index time (n_lists·dim + m·n_codes·(dim/m) scalars), not
    something a probe re-trains."""
    import json
    import os

    path = _artifact_cache_path(sf_dir, "ann_quant", "embeddings")
    fname = os.path.join(path, "quantizers.json")
    if os.path.exists(fname):
        with open(fname) as fh:
            d = json.load(fh)
        return d["cents"], d["books"]
    emb = _emb(spark, sf_dir)
    cents = S.kmeans_centroids(emb, n_lists=IVF_N_LISTS)
    books = S.pq_codebooks(emb, m=PQ_M, n_codes=PQ_CODES, dim=EMB_DIM)
    os.makedirs(path, exist_ok=True)
    tmp = fname + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"cents": cents, "books": books}, fh)
    os.replace(tmp, fname)  # atomic: racing bench workers see all-or-nothing
    return cents, books


def _ann_ivfpq_index(spark: SparkSession, sf_dir: str):
    """Build-once MATERIALIZED IVF-PQ index (similarity.
    write_ivfpq_index: vectors + coarse list assignment + PQ codes,
    partitioned by list) on top of the cached quantizers — the probe
    side of the whole ANN family reads this instead of re-running the
    literal-centroid assignment expressions per query. Returns
    ``(index_path, cents, books)``. Content-keyed like every artifact;
    assignment is deterministic, so indexed probes are result-identical
    to the inline operators (pinned in tests/test_r14_additions.py)."""
    import os

    cents, books = _ann_quantizers(spark, sf_dir)
    path = _artifact_cache_path(sf_dir, "ivfpq_index", "embeddings")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        S.write_ivfpq_index(_emb(spark, sf_dir), path, cents, books)
    return path, cents, books


def _sq8_minmax(spark: SparkSession, sf_dir: str):
    """Build-once per-dimension (min, max) for SQ8 scalar quantization
    — the third quantizer family next to IVF (coarse) and PQ
    (subvector): each dimension is affinely mapped to a uint8 level,
    4x compression at full dimensionality. The min/max table is
    EMB_DIM pairs of corpus metadata built at index time (same
    ``_artifact_cache_path`` contract as ``_ann_quantizers``); a probe
    never rescans the corpus for it. Returns ``(mins, maxs)`` as
    Python double lists — exact float32→double widenings, so the
    DuckDB oracle's MIN/MAX(CAST(embedding[j] AS DOUBLE)) reproduces
    them bit-for-bit."""
    import json
    import os

    path = _artifact_cache_path(sf_dir, "sq8_minmax", "embeddings")
    fname = os.path.join(path, "minmax.json")
    if os.path.exists(fname):
        with open(fname) as fh:
            d = json.load(fh)
        return d["mins"], d["maxs"]
    rows = (
        _emb(spark, sf_dir)
        .select(F.posexplode("embedding").alias("j", "v"))
        .groupBy("j")
        .agg(
            F.min(F.col("v").cast("double")).alias("mn"),
            F.max(F.col("v").cast("double")).alias("mx"),
        )
        .collect()  # bounded: EMB_DIM rows
    )
    by_j = {int(r["j"]): (float(r["mn"]), float(r["mx"])) for r in rows}
    mins = [by_j[j][0] for j in sorted(by_j)]
    maxs = [by_j[j][1] for j in sorted(by_j)]
    os.makedirs(path, exist_ok=True)
    tmp = fname + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"mins": mins, "maxs": maxs}, fh)
    os.replace(tmp, fname)  # atomic: racing bench workers see all-or-nothing
    return mins, maxs


#: sign-LSH signature width, shared by the ANN family and the
#: materialized-index helpers (hoisted from the families module so
#: common's helpers never forward-reference)
ANN_PLANES = 16

#: prefix width of the materialized sign-LSH index: 6 bits (64 bucket
#: dirs; a radius-2 ball reads 22) fits the test corpus — at 100 TB
#: raise it so each bucket stays a few hundred MB
LSH_INDEX_PREFIX_BITS = 6


def _ann_lsh_index(spark: SparkSession, sf_dir: str) -> str:
    """Build-once materialized sign-LSH index (similarity.
    write_lsh_index → partitionBy(sig_prefix)), shared by
    ann_lsh_indexed and the recall/NDCG audits' probe methods.
    Signatures are deterministic, so indexed probes are
    result-identical to the on-the-fly lsh_topk at the same radius."""
    import os

    path = _artifact_cache_path(sf_dir, "lsh_index", "embeddings")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        S.write_lsh_index(
            _emb(spark, sf_dir), path, n_planes=ANN_PLANES,
            prefix_bits=LSH_INDEX_PREFIX_BITS, dim=EMB_DIM,
        )
    return path


def _merge_cache_file(sf_dir: str, algo: str) -> str:
    import os

    return os.path.join(
        _artifact_cache_path(sf_dir, f"merges_{algo}", "documents"),
        "merges.json",
    )


def _store_merge_rows(sf_dir: str, algo: str, rows: list[dict]) -> None:
    """Persist a learner's K-row merge table as the build-once artifact
    (atomic JSON write; rows sorted by step, ready to chain)."""
    import json
    import os

    fname = _merge_cache_file(sf_dir, algo)
    os.makedirs(os.path.dirname(fname), exist_ok=True)
    tmp = fname + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(sorted(rows, key=lambda r: r["step"]), fh)
    os.replace(tmp, fname)


def _learned_merge_rows(spark: SparkSession, sf_dir: str, algo: str):
    """Build-once learned-tokenizer merge table: the K-row result of
    the registered deterministic learner (q_bpe_merge_learning /
    q_wordpiece_learning), cached as JSON content-keyed on
    documents.parquet — consumers like tokenizer_compare_audit apply
    the merges without re-paying the corpus-scanning training loop
    (r13 verdict task 3; same mechanism as _ann_quantizers). The
    learners themselves populate the cache as a free side effect
    (their merge rows are already driver-held), so in any run where a
    learner preceded the audit this is a pure file read; cold
    audit-first sessions pay the learning once here instead."""
    import json
    import os

    fname = _merge_cache_file(sf_dir, algo)
    if os.path.exists(fname):
        with open(fname) as fh:
            return json.load(fh)
    # call-time import: the learners live in later family modules
    # (original file order put them 18k lines below this helper)
    if algo == "bpe":
        from .tokenlearn import q_bpe_merge_learning as learner
    else:
        from .corpusops import q_wordpiece_learning as learner
    rows = [r.asDict() for r in learner(spark, sf_dir).collect()]
    rows.sort(key=lambda r: r["step"])
    if not os.path.exists(fname):  # learner side-effect store is primary
        _store_merge_rows(sf_dir, algo, rows)
    return rows


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same delegate pattern as _t: one patchable implementation point
    # (common._events_impl) behind the binding the fold copies around
    return _events_impl(spark, sf_dir)


def _events_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-adaptive events loader. The fixture's physical ``ts``
    encoding has drifted across generations (TIMESTAMP(NANOS) readable
    only as nanos-BIGINT via ``nanosAsLong``; currently timestamp[us] →
    Spark TIMESTAMP_NTZ). Normalize to two canonical columns so no query
    ever touches the physical encoding:

      ``event_time`` TIMESTAMP — micros precision (UTC session tz)
      ``tsn``        BIGINT    — micros since epoch

    Raw ``ts`` is dropped: any stale reference fails analysis loudly
    instead of silently reading a wrong scale. DuckDB mirrors use
    ``epoch_us(ts)`` for ``tsn`` (DuckDB reads the same parquet as a
    naive-UTC TIMESTAMP at micros precision on every encoding)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # harmless for micros files; required to even read TIMESTAMP(NANOS)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type == "bigint":  # legacy: nanos since epoch as long
        tsn = F.expr("ts div 1000")
    elif ts_type.startswith("timestamp"):  # timestamp / timestamp_ntz
        tsn = F.unix_micros(F.col("ts").cast("timestamp"))
    else:
        raise TypeError(f"unsupported events.ts type: {ts_type}")
    return (
        ev.withColumn("tsn", tsn.cast("bigint"))
        .withColumn("event_time", F.timestamp_micros(F.col("tsn")))
        .drop("ts")
    )


US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min in micros

#: ANN quantizer geometry — shared by the query family AND the
#: build-once artifact helper (_ann_quantizers), so defined with the
#: other cross-family constants.
IVF_N_LISTS = 16
IVF_NPROBE = 4
PQ_M = 4       # subspaces
PQ_CODES = 8   # codebook entries per subspace


# ---------------------------------------------------------------------------
# ratings derivation (FIXTURES.md §1): deterministic mapping of lineitem
# into the reference's ratings(userid, movieid, rating) relation, with a
# stable row number for round-robin assignment.
# ---------------------------------------------------------------------------
RATINGS_CTE = """
ratings AS (
  SELECT CAST(l_orderkey AS INTEGER) AS userid,
         CAST(l_partkey AS INTEGER)  AS movieid,
         ROUND((l_quantity % 5.5) * 2) / 2.0 AS rating,
         ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS rn
  FROM lineitem
)
"""


#: plan cache for the ratings derivation: stable_row_number runs two
#: tiny prep jobs (key min/max, bucket counts) at plan-build time; the
#: inputs are immutable parquet, so the built plan is reusable across
#: the five fragmentation queries within a session.
_RATINGS_PLANS: dict[tuple[int, str], DataFrame] = {}


def _ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matches RATINGS_CTE exactly. The global row number (round-robin
    assignment order) is computed with stable_row_number — bucketed,
    parallel, deterministic — NOT a no-PARTITION window, which would
    sort the whole relation in one task (operators/scaling.py)."""
    key = (id(spark), sf_dir)
    if key in _RATINGS_PLANS:
        return _RATINGS_PLANS[key]
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_linenumber"
    )
    li = stable_row_number(li, ["l_orderkey", "l_linenumber"], out_col="rn")
    out = li.select(
        F.col("l_orderkey").cast("int").alias("userid"),
        F.col("l_partkey").cast("int").alias("movieid"),
        (F.round((F.col("l_quantity") % 5.5) * 2) / 2.0).alias("rating"),
        "rn",
    )
    _RATINGS_PLANS[key] = out
    return out


def _bucket_sql(col: str = "rating") -> str:
    """SQL mirror of range_fragment_expr for the fixed [0,5] domain."""
    return (
        f"CAST(LEAST(GREATEST(CASE WHEN {col} - {RANGE_MIN} <= {RANGE_INTERVAL} "
        f"THEN 0 ELSE CAST(CEIL(({col} - {RANGE_MIN}) / {RANGE_INTERVAL}) AS INTEGER) - 1 END, "
        f"0), {RANGE_N - 1}) AS INTEGER)"
    )


def _bucket_col() -> F.Column:
    return range_fragment_expr(F.col("rating"), RANGE_N, RANGE_MIN, RANGE_MAX)


# ---------------------------------------------------------------------------
