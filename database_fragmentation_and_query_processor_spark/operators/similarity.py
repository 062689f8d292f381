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
from ..functions.lattice import flr as _flr


def _as_literal_vec(vec: list[float]) -> Column:
    # F.lit(list) (r14; comment corrected per r14 ADVICE): PySpark
    # expands this to array(*[lit(x)…]) and Catalyst constant-folds
    # both spellings to the identical array literal — equivalent to
    # F.array(*lits), kept as the clearer one-constant spelling
    return F.lit([float(v) for v in vec]).cast("array<double>")


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
        _flr(V.cosine(F.col(vec_col), q), round_digits).alias("cosine_sim"),
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
    """ANN top-k over an IN-MEMORY corpus: restrict to vectors whose LSH
    signature is within ``probe_hamming`` bits of the query signature,
    then exact re-rank. This variant computes signatures on the fly and
    filters a full scan — use it when the corpus is already loaded or
    signatures can't be precomputed. For storage-level pruning (read
    only the matching buckets of a 100 TB corpus) materialize the index
    once with ``write_lsh_index`` and probe with ``lsh_topk_indexed``,
    which enumerates the Hamming-ball bucket values so Catalyst
    partition-prunes the read."""
    planes = deterministic_planes(dim, n_planes)
    q_sig = query_signature(query_vec, planes)
    sig = with_lsh_signature(emb, n_planes, vec_col, "_sig", dim)
    cands = sig.where(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(q_sig))) <= probe_hamming
    )
    q = _as_literal_vec(query_vec)
    return (
        cands.select(
            F.col(id_col),
            _flr(V.cosine(F.col(vec_col), q), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )


def query_signature(query_vec: list[float], planes: list[list[float]]) -> int:
    """Driver-side signature of one query vector (same bit order as
    ``functions.vectors.sign_bits``)."""
    sig = 0
    for i, p in enumerate(planes):
        d = sum(float(a) * b for a, b in zip(query_vec, p))
        sig |= (1 if d >= 0 else 0) << i
    return sig


def hamming_ball(value: int, bits: int, radius: int) -> list[int]:
    """All ``bits``-wide values within Hamming distance ``radius`` of
    ``value`` — the bucket values a radius-``radius`` probe must read.
    Size is sum(C(bits, r) for r<=radius): tiny for the prefix widths
    used here (8 bits, radius 2 → 37 of 256 buckets)."""
    from itertools import combinations

    out = {value}
    for r in range(1, radius + 1):
        for pos in combinations(range(bits), r):
            v = value
            for p in pos:
                v ^= 1 << p
            out.add(v)
    return sorted(out)


def write_lsh_index(
    emb: DataFrame,
    path: str,
    n_planes: int = 16,
    prefix_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    mode: str = "overwrite",
) -> None:
    """Materialize the ANN index: vectors + full LSH signature, written
    ``partitionBy(sig_prefix)`` (low ``prefix_bits`` of the signature).

    The prefix — not the full signature — is the partition key so the
    bucket count stays bounded (2^prefix_bits directories, each holding
    ~corpus/2^prefix_bits vectors) independent of ``n_planes``. A probe
    within Hamming radius h can then enumerate its candidate prefixes
    (any signature within h of the query has prefix within h of the
    query's prefix) and Catalyst prunes the rest at file-listing time —
    the same storage trick ``fragmentation.write_fragmented`` plays for
    range fragments.
    """
    sig = with_lsh_signature(emb, n_planes, vec_col, "lsh_sig", dim)
    out = sig.select(
        F.col(id_col),
        F.col(vec_col),
        F.col("lsh_sig"),
        F.col("lsh_sig")
        .bitwiseAND(F.lit((1 << prefix_bits) - 1))
        .cast("int")
        .alias("sig_prefix"),
    )
    # cluster by the partition key before writing: one writer per bucket
    # directory instead of n_tasks x n_buckets small files — at 100 TB
    # the difference between a healthy index and a metadata explosion
    out.repartition(F.col("sig_prefix")).write.mode(mode).partitionBy(
        "sig_prefix"
    ).parquet(path)


def lsh_topk_indexed(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 16,
    probe_hamming: int = 2,
    prefix_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Partition-pruned ANN probe against a ``write_lsh_index`` layout.

    Reads ONLY the ≤ sum(C(prefix_bits, r), r<=h) bucket directories
    whose prefix lies in the query's Hamming ball (an ``isin`` on the
    partition column → PartitionFilters in the scan, asserted by
    tests/test_plan_quality.py), then applies the exact
    ``bit_count(sig XOR qsig) <= h`` filter and re-ranks by true cosine.
    Result-identical to ``lsh_topk`` on the same corpus/parameters.
    """
    planes = deterministic_planes(dim, n_planes)
    q_sig = query_signature(query_vec, planes)
    q_prefix = q_sig & ((1 << prefix_bits) - 1)
    prefixes = hamming_ball(q_prefix, prefix_bits, probe_hamming)
    idx = spark.read.parquet(index_path).where(F.col("sig_prefix").isin(prefixes))
    cands = idx.where(
        F.bit_count(F.col("lsh_sig").bitwiseXOR(F.lit(q_sig))) <= probe_hamming
    )
    q = _as_literal_vec(query_vec)
    return (
        cands.select(
            F.col(id_col),
            _flr(V.cosine(F.col(vec_col), q), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )


def _sq_l2(vec: Column, cent: list[float]) -> Column:
    c = F.lit([float(v) for v in cent]).cast("array<double>")  # constant-folded array literal
    return F.aggregate(
        F.zip_with(vec, c, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def nearest_centroid_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """0-based argmin of squared-L2 distance to literal centroids —
    a pure column expression (array of distances + array_position).

    Distances are rounded to 6 decimals before the argmin so the
    assignment is reproducible bit-for-bit across engines (the DuckDB
    oracle mirrors the same rounding); ties break to the LOWEST list
    index in both (``array_position`` returns the first match).
    """
    d = F.array(*[_flr(_sq_l2(vec, c), 6) for c in centroids])
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
            # round-6 kills double-summation-order divergence so the
            # quantizer (and hence the whole IVF result) is identical
            # across engines — this is what makes the DuckDB oracle for
            # ivf_topk expressible as static SQL. Rounded IN-ENGINE:
            # F.round is half-up like the oracle's ROUND; Python
            # round() is banker's and diverges on exact half-ties.
            .agg(_flr(F.avg(F.col("v").cast("double")), 6).alias("m"))
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
    cents: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN top-k: k-means coarse quantizer → probe the nprobe
    nearest inverted lists → exact cosine re-rank of candidates only.
    At scale ``_list`` is the partition key of the stored index, so a
    probe reads nprobe/n_lists of the corpus. Complements ``lsh_topk``
    (same contract, hyperplane buckets instead of learned lists).

    ``cents`` short-circuits quantizer training with a precomputed
    coarse codebook — the serving-time shape: the quantizer is a
    build-once artifact of the corpus (kmeans_centroids is
    deterministic, so a cached copy is bit-identical to a re-derived
    one), and a probe should never pay the Lloyd jobs again."""
    if cents is None:
        cents = kmeans_centroids(emb, n_lists, iters, id_col, vec_col)
    # (d*d, not d**2: libm pow() isn't guaranteed exact, and the DuckDB
    # oracle mirrors this as an explicit multiply)
    dists = [
        round(sum((float(a) - b) * (float(a) - b) for a, b in zip(query_vec, c)), 6)
        for c in cents
    ]
    probe = sorted(range(len(cents)), key=lambda i: (dists[i], i))[:nprobe]
    assigned = emb.withColumn("_list", nearest_centroid_expr(F.col(vec_col), cents))
    cands = assigned.where(F.col("_list").isin([int(p) for p in probe]))
    q = _as_literal_vec(query_vec)
    return (
        cands.select(
            F.col(id_col),
            _flr(V.cosine(F.col(vec_col), q), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )


def write_ivfpq_index(
    emb: DataFrame,
    path: str,
    cents: list[list[float]],
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Materialize the IVF-PQ ANN index: vectors + their coarse list
    assignment + their PQ codes, written ``partitionBy(_list)`` — the
    learned-quantizer twin of ``write_lsh_index``.

    This is the production serving shape FAISS deploys: quantizers are
    trained once (``kmeans_centroids``/``pq_codebooks``, here passed in
    as the build-once artifacts), every vector is assigned and encoded
    ONCE at index-build time, and a probe reads only its nprobe list
    directories (Catalyst partition-prunes the rest at file-listing
    time) and scores candidates from the precomputed codes. The
    assignment/encoding expressions — argmin over n_lists literal
    centroids, m argmins over n_codes literal sub-centroids — are the
    expensive part of the PLAN as well as the scan, so paying their
    codegen once at build time is what makes the probe plans small.
    Assignment and codes are the same deterministic round-6 arithmetic
    as the inline operators, so indexed probes are result-identical."""
    m = len(books)
    dim = len(cents[0])
    sub = dim // m
    assigned = emb.select(
        F.col(id_col),
        F.col(vec_col),
        F.array(
            *[
                nearest_centroid_expr(
                    F.slice(F.col(vec_col), s * sub + 1, sub), books[s]
                )
                for s in range(m)
            ]
        ).alias("pq_codes"),
        nearest_centroid_expr(F.col(vec_col), cents).alias("_list"),
    )
    # one writer per list directory (same rationale as write_lsh_index)
    assigned.repartition(F.col("_list")).write.mode(mode).partitionBy(
        "_list"
    ).parquet(path)


def _probe_lists(
    query_vec: list[float], cents: list[list[float]], nprobe: int
) -> list[int]:
    """Driver-side nprobe nearest inverted lists (round-6 distances,
    ties to the lowest index — identical to ivf_topk's inline order)."""
    dists = [
        round(
            sum((float(a) - b) * (float(a) - b) for a, b in zip(query_vec, c)),
            6,
        )
        for c in cents
    ]
    return [
        int(i)
        for i in sorted(range(len(cents)), key=lambda i: (dists[i], i))[:nprobe]
    ]


def _adc_expr(
    query_vec: list[float], books: list[list[list[float]]], codes_col: str
) -> Column:
    """PQ asymmetric-distance from MATERIALIZED codes: the query's
    exact L2 to every codebook entry forms literal lookup tables
    (driver-side, m·n_codes scalars) and the distance is m element_at
    lookups on the stored code array — no argmin in the probe plan."""
    m = len(books)
    sub = len(query_vec) // m
    total = None
    for s in range(m):
        qsub = [float(v) for v in query_vec[s * sub : (s + 1) * sub]]
        adc = [
            sum((a - b) * (a - b) for a, b in zip(qsub, c)) for c in books[s]
        ]
        d = F.element_at(
            F.lit([float(x) for x in adc]).cast("array<double>"),
            F.element_at(F.col(codes_col), s + 1) + 1,
        )
        total = d if total is None else total + d
    return total


def ivf_topk_indexed(
    spark,
    index_path: str,
    query_vec: list[float],
    cents: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Partition-pruned IVF probe against a ``write_ivfpq_index``
    layout: read only the nprobe list directories (isin on the
    partition column → PartitionFilters), exact cosine re-rank.
    Result-identical to ``ivf_topk`` with the same quantizer."""
    probe = _probe_lists(query_vec, cents, nprobe)
    idx = spark.read.parquet(index_path).where(F.col("_list").isin(probe))
    q = _as_literal_vec(query_vec)
    return (
        idx.select(
            F.col(id_col),
            _flr(V.cosine(F.col(vec_col), q), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )


def pq_topk_indexed(
    spark,
    index_path: str,
    query_vec: list[float],
    books: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ-ADC top-k from materialized codes: one scan of (id, codes)
    with m table lookups per row — the probe plan carries no codebook
    argmin at all. Result-identical to ``pq_topk`` with the same
    codebooks."""
    idx = spark.read.parquet(index_path)
    return (
        idx.select(
            F.col(id_col),
            _flr(_adc_expr(query_vec, books, "pq_codes"), 6).alias("pq_dist"),
        )
        .orderBy("pq_dist", id_col)
        .limit(k)
    )


def ivfpq_topk_indexed(
    spark,
    index_path: str,
    query_vec: list[float],
    cents: list[list[float]],
    books: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ probe against the materialized index: partition-pruned
    list read + ADC from stored codes. Result-identical to
    ``ivfpq_topk`` with the same quantizers."""
    probe = _probe_lists(query_vec, cents, nprobe)
    idx = spark.read.parquet(index_path).where(F.col("_list").isin(probe))
    return (
        idx.select(
            F.col(id_col),
            _flr(_adc_expr(query_vec, books, "pq_codes"), 6).alias("pq_dist"),
        )
        .orderBy("pq_dist", id_col)
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
            "cosine_sim", _flr(V.cosine(F.col("va"), F.col("vb")), 6)
        )
        .where(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def pq_codebooks(
    emb: DataFrame,
    m: int = 4,
    n_codes: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: the embedding is split into
    ``m`` contiguous subspaces of dim/m dims; each subspace gets its
    own ``n_codes``-entry k-means codebook (the FAISS IVF-PQ memory
    path: m·log2(n_codes) bits per vector instead of dim·32).

    Deterministic like kmeans_centroids — seeds are the n_codes
    lowest-id vectors' sub-slices, refined by Lloyd steps whose means
    round to 6 — and FUSED across subspaces: one posexplode job
    assigns/averages all m subspaces together, so codebook training is
    2 jobs per iteration regardless of m, and only m·n_codes·(dim/m)
    scalars reach the driver."""
    sub = dim // m
    seeds = emb.orderBy(id_col).limit(n_codes).select(vec_col).collect()
    books: list[list[list[float]]] = [
        [
            [float(v) for v in r[vec_col][s * sub : (s + 1) * sub]]
            for r in seeds
        ]
        for s in range(m)
    ]
    subs_arr = F.array(
        *[F.slice(F.col(vec_col), s * sub + 1, sub) for s in range(m)]
    )
    for _ in range(iters):
        exploded = emb.select(
            F.posexplode(subs_arr).alias("s", "subv")
        )
        code = None
        for s in range(m):
            c = nearest_centroid_expr(F.col("subv"), books[s])
            code = (
                F.when(F.col("s") == s, c)
                if code is None
                else code.when(F.col("s") == s, c)
            )
        means = (
            exploded.withColumn("code", code)
            .select("s", "code", F.posexplode("subv").alias("pos", "v"))
            .groupBy("s", "code", "pos")
            # round-6 kills summation-order divergence (same contract
            # as kmeans_centroids → static-SQL oracle expressible).
            # Rounding happens IN-ENGINE: F.round is half-up like the
            # oracle's ROUND, while Python round() is banker's and
            # diverges on exact half-ties at the 6th decimal.
            .agg(_flr(F.avg(F.col("v").cast("double")), 6).alias("mn"))
            .collect()
        )
        new = [[list(c) for c in book] for book in books]
        for r in means:
            new[r["s"]][r["code"]][r["pos"]] = float(r["mn"])
        books = new
    return books


def pq_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m: int = 4,
    n_codes: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """PQ-ADC approximate nearest neighbors: every vector is encoded
    as m codebook indices; the query is NOT encoded — its exact
    squared-L2 to every codebook entry forms the asymmetric-distance
    lookup table (driver-side: m·n_codes scalars), and a vector's
    approximate distance is the sum of m table lookups. The scan is
    one pure-expression pass (argmin per subspace + literal-array
    element_at), no join, no shuffle except the top-k — the 100 TB
    memory story: 8 codes/vector instead of 64 floats.

    ``books`` short-circuits codebook training with a precomputed
    (deterministic, hence bit-identical) artifact — see ivf_topk."""
    dim = len(query_vec)
    sub = dim // m
    if books is None:
        books = pq_codebooks(
            emb, m=m, n_codes=n_codes, iters=iters,
            id_col=id_col, vec_col=vec_col, dim=dim,
        )
    total = None
    for s in range(m):
        qsub = [float(v) for v in query_vec[s * sub : (s + 1) * sub]]
        # ADC table entry: exact L2(q_sub, centroid) in plain Python
        # IEEE doubles, left-to-right — the oracle's list_sum order
        adc = [
            sum((a - b) * (a - b) for a, b in zip(qsub, c))
            for c in books[s]
        ]
        code = nearest_centroid_expr(
            F.slice(F.col(vec_col), s * sub + 1, sub), books[s]
        )
        d = F.element_at(
            F.lit([float(x) for x in adc]).cast("array<double>"), code + 1
        )
        total = d if total is None else total + d
    return (
        emb.select(F.col(id_col), _flr(total, 6).alias("pq_dist"))
        .orderBy("pq_dist", id_col)
        .limit(k)
    )


def ivfpq_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    m: int = 4,
    n_codes: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: list[list[float]] | None = None,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """IVF-PQ: the production ANN composition (what FAISS deploys at
    scale) — the IVF coarse quantizer prunes the search to nprobe
    inverted lists (at scale: partition-pruned index reads,
    nprobe/n_lists of the corpus touched), and candidates are scored
    by the PQ asymmetric-distance table instead of their raw floats
    (m codes per vector in memory, not dim floats). Both quantizers
    are the deterministic round-6 k-means used by ivf_topk/pq_topk, so
    the DuckDB oracle replays the whole composition as static SQL.
    One expression-only scan: coarse assign + probe filter + ADC sum —
    no join anywhere.

    ``cents``/``books`` short-circuit quantizer training with
    precomputed (deterministic, hence bit-identical) artifacts — the
    serving-time shape; see ivf_topk."""
    dim = len(query_vec)
    sub = dim // m
    if cents is None:
        cents = kmeans_centroids(emb, n_lists, iters, id_col, vec_col)
    cdists = [
        round(
            sum((float(a) - b) * (float(a) - b) for a, b in zip(query_vec, c)),
            6,
        )
        for c in cents
    ]
    probe = sorted(range(len(cents)), key=lambda i: (cdists[i], i))[:nprobe]
    if books is None:
        books = pq_codebooks(
            emb, m=m, n_codes=n_codes, iters=iters,
            id_col=id_col, vec_col=vec_col, dim=dim,
        )
    total = None
    for s in range(m):
        qsub = [float(v) for v in query_vec[s * sub : (s + 1) * sub]]
        adc = [
            sum((a - b) * (a - b) for a, b in zip(qsub, c))
            for c in books[s]
        ]
        code = nearest_centroid_expr(
            F.slice(F.col(vec_col), s * sub + 1, sub), books[s]
        )
        d = F.element_at(
            F.lit([float(x) for x in adc]).cast("array<double>"), code + 1
        )
        total = d if total is None else total + d
    coarse = nearest_centroid_expr(F.col(vec_col), cents)
    return (
        emb.where(coarse.isin([int(p) for p in probe]))
        .select(F.col(id_col), _flr(total, 6).alias("pq_dist"))
        .orderBy("pq_dist", id_col)
        .limit(k)
    )
