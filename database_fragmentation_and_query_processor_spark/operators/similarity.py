"""Similarity search over embedding columns (``array<float>``).

- ``brute_force_topk``: exact cosine top-k against one query vector.
  The query vector is a literal array folded into the plan (broadcast
  by construction); scan stays a narrow map + a single top-k reduce —
  at 1000 executors this is one pass over the data, no shuffle of the
  vectors themselves (only k rows per partition reach the driver-side
  merge via TakeOrderedAndProject).
- ``knn_join_bruteforce``: exact k-NN for a (small) query set via
  broadcast nested-loop + per-query top-k window.
- ``lsh_topk``: sign-random-projection bucketed ANN — the 100 TB path:
  vectors are bucketed by signature prefix; candidates come only from
  the probe buckets, then exact re-rank.
- ``embedding_near_dup_pairs``: all-pairs cosine above a threshold,
  bucketed by LSH signature to avoid the O(n²) cross join at scale
  (exact variant kept for oracle-checkable small inputs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V


def _as_literal_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k, deterministic tie-break on id."""
    q = _as_literal_vec(query_vec)
    scored = emb.select(
        F.col(id_col),
        F.round(V.cosine(F.col(vec_col), q), round_digits).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.col(id_col)).limit(k)


def knn_join_bruteforce(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact k-NN for each query row: broadcast the (small) query set,
    nested-loop score, per-query top-k via row_number window partitioned
    by query (shuffle keyed on query_id — balanced when #queries >>
    #executors; for huge query sets use lsh_topk)."""
    joined = emb.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        V.cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("rank")
    )


def deterministic_planes(dim: int, n_planes: int) -> list[list[float]]:
    """Fixed pseudo-random hyperplanes from a tiny LCG — deterministic,
    seedless, reproducible in any engine (no RNG calls)."""
    planes = []
    state = 88172645463325252
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            # xorshift64
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            row.append(((state % 2001) - 1000) / 1000.0)
        planes.append(row)
    return planes


def with_lsh_signature(
    emb: DataFrame, n_planes: int = 16, vec_col: str = "embedding",
    sig_col: str = "lsh_sig", dim: int = 64,
) -> DataFrame:
    return emb.withColumn(
        sig_col, V.sign_bits(F.col(vec_col), deterministic_planes(dim, n_planes))
    )


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 16,
    probe_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """ANN top-k: restrict to vectors whose LSH signature is within
    ``probe_hamming`` bits of the query signature, then exact re-rank.
    At scale the signature is a partition/bucket key, so the probe reads
    only matching buckets instead of the full corpus."""
    planes = deterministic_planes(dim, n_planes)
    import math

    q_sig = 0
    for i, p in enumerate(planes):
        d = sum(a * b for a, b in zip(query_vec, p))
        q_sig |= (1 if d >= 0 else 0) << i
    sig = with_lsh_signature(emb, n_planes, vec_col, "_sig", dim)
    cands = sig.where(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(q_sig))) <= probe_hamming
    )
    q = _as_literal_vec(query_vec)
    return (
        cands.select(
            F.col(id_col),
            F.round(V.cosine(F.col(vec_col), q), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )


def _sq_l2(vec: Column, cent: list[float]) -> Column:
    c = F.array(*[F.lit(float(v)) for v in cent])
    return F.aggregate(
        F.zip_with(vec, c, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def nearest_centroid_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """0-based argmin of squared-L2 distance to literal centroids —
    a pure column expression (array of distances + array_position)."""
    d = F.array(*[_sq_l2(vec, c) for c in centroids])
    return (F.array_position(d, F.array_min(d)) - 1).cast("int")


def kmeans_centroids(
    emb: DataFrame,
    n_lists: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic coarse quantizer for IVF: seeds are the n_lists
    lowest-id vectors (no RNG), refined by Lloyd iterations executed as
    DataFrame aggregations — assign via ``nearest_centroid_expr``, new
    means via posexplode + groupBy(list, dim). Only n_lists × dim
    scalars ever reach the driver; the corpus never does."""
    seeds = emb.orderBy(id_col).limit(n_lists).select(vec_col).collect()
    cents = [[float(v) for v in r[vec_col]] for r in seeds]
    dim = len(cents[0])
    for _ in range(iters):
        assigned = emb.withColumn(
            "_list", nearest_centroid_expr(F.col(vec_col), cents)
        )
        means = (
            assigned.select("_list", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("_list", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        new = [list(c) for c in cents]  # empty lists keep their centroid
        for r in means:
            new[r["_list"]][r["pos"]] = float(r["m"])
        cents = new
    return cents


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: k-means coarse quantizer → probe the nprobe
    nearest inverted lists → exact cosine re-rank of candidates only.
    At scale ``_list`` is the partition key of the stored index, so a
    probe reads nprobe/n_lists of the corpus. Complements ``lsh_topk``
    (same contract, hyperplane buckets instead of learned lists)."""
    cents = kmeans_centroids(emb, n_lists, iters, id_col, vec_col)
    dists = [
        sum((float(a) - b) ** 2 for a, b in zip(query_vec, c)) for c in cents
    ]
    probe = sorted(range(len(cents)), key=lambda i: (dists[i], i))[:nprobe]
    assigned = emb.withColumn("_list", nearest_centroid_expr(F.col(vec_col), cents))
    cands = assigned.where(F.col("_list").isin([int(p) for p in probe]))
    q = _as_literal_vec(query_vec)
    return (
        cands.select(
            F.col(id_col),
            F.round(V.cosine(F.col(vec_col), q), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucketed: bool = True,
    n_planes: int = 12,
    dim: int = 64,
) -> DataFrame:
    """Pairs with cosine ≥ threshold. ``bucketed=True`` self-joins on
    the LSH signature (near-identical vectors share all sign bits with
    high probability) — the scale path. ``bucketed=False`` is the exact
    O(n²) variant for small/oracle runs."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if bucketed:
        sig = with_lsh_signature(emb, n_planes, vec_col, "_sig", dim)
        a = sig.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                       F.col("_sig").alias("sig_a"))
        b = sig.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                       F.col("_sig").alias("sig_b"))
        pairs = a.join(b, (F.col("sig_a") == F.col("sig_b"))
                       & (F.col("id_a") < F.col("id_b")))
    else:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "cosine_sim", F.round(V.cosine(F.col("va"), F.col("vb")), 6)
        )
        .where(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
