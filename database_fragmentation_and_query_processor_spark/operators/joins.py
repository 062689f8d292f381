"""Join operators Spark doesn't ship natively: as-of join, bucketed
range join.

Both are built from DataFrame primitives (union + window / bucket
explode + equi-join) so Catalyst still owns the physical plan — no
UDFs, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``ts_col`` <= left's ``ts_col`` within the same ``on`` group
    (inner semantics: left rows with no prior right row are dropped).

    Implementation: tag + union + per-group ordered window carrying the
    last-seen right values forward (``last(..., ignorenulls)``). At
    ties, right sorts before left (``_side`` ascending) → inclusive
    ``>=`` semantics, matching ANSI/DuckDB ``ASOF JOIN``.

    Scale: ONE shuffle on the group keys + a sort within partitions —
    the same cost shape as a sort-merge join, with no range-condition
    nested loop anywhere. Skewed groups can be salted upstream.
    """
    rcarry = [c for c in right.columns if c not in on and c != ts_col]
    lkeep = [c for c in left.columns]

    l = left
    for c in rcarry:
        l = l.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    l = l.withColumn("_side", F.lit(1))

    r = right.select(*on, ts_col, *rcarry)
    for c in lkeep:
        if c not in on and c != ts_col:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r = r.withColumn("_side", F.lit(0))

    u = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
        .over(w)
        .alias(c + suffix)
        for c in rcarry
    ]
    carried_ts = (
        F.last(F.when(F.col("_side") == 0, F.col(ts_col)), ignorenulls=True)
        .over(w)
        .alias(ts_col + suffix)
    )
    out = u.select(*lkeep, "_side", carried_ts, *carried)
    return (
        out.where((F.col("_side") == 1) & F.col(ts_col + suffix).isNotNull())
        .drop("_side")
    )


def range_join_bucketed(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float | None = None,
) -> DataFrame:
    """Join ``fact.value_col`` into ``[bands.lo_col, bands.hi_col)``
    intervals.

    Small band tables (the common case) broadcast — Catalyst turns the
    range predicate into a broadcast nested loop over a tiny build side,
    which is optimal. For big-big range joins pass ``bucket_width``:
    both sides are expanded to overlapping buckets of that width and
    equi-joined on the bucket id first (shuffle on a uniform integer
    key), with the exact range predicate as a post-filter — turning an
    O(n·m) nested loop into a co-partitioned hash join.
    """
    if bucket_width is None:
        cond = (F.col(value_col) >= F.col(lo_col)) & (
            F.col(value_col) < F.col(hi_col)
        )
        return fact.join(F.broadcast(bands), cond)

    fb = fact.withColumn(
        "_bucket", F.floor(F.col(value_col) / F.lit(bucket_width)).cast("bigint")
    )
    bb = bands.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("bigint"),
                F.floor((F.col(hi_col) - F.lit(1e-12)) / F.lit(bucket_width)).cast(
                    "bigint"
                ),
            )
        ),
    )
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fb.join(bb, "_bucket").where(cond).drop("_bucket")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 2,
) -> DataFrame:
    """Entity-resolution fuzzy join: pairs whose strings are within
    Levenshtein ``max_distance``, with FULL recall and no cross join.

    Blocking: strings within edit distance d differ in length by at
    most d, so with length buckets of width d+1 a matching pair is at
    most ONE bucket apart. The left side explodes to its bucket ±1
    (fixed 3x fanout) and equi-joins the right side's bucket; the exact
    ``levenshtein`` filter then runs on candidates only. The shuffle
    key is a small integer — uniform, skew-free — and candidate volume
    is sum of products of adjacent bucket sizes, never |L|x|R|.
    """
    w = max_distance + 1
    lb = F.floor(F.length(F.col(left_col)) / w).cast("bigint")
    rb = F.floor(F.length(F.col(right_col)) / w).cast("bigint")
    l = left.withColumn(
        "_fz_bucket",
        F.explode(F.array(lb - 1, lb, lb + 1)),
    )
    r = right.withColumn("_fz_bucket", rb)
    return (
        l.join(r, "_fz_bucket")
        .where(F.levenshtein(F.col(left_col), F.col(right_col)) <= max_distance)
        .drop("_fz_bucket")
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Semi-join reduction through a hand-built Bloom filter — the
    runtime-filter pattern for joining a 100 TB fact against a selective
    dim: the dim side collapses to a ≤``n_bits``-entry sparse bitset
    (one sorted array in ONE row, ~512 KB at the 64 Ki default),
    broadcast to every fact task, and the fact is pruned MAP-SIDE before
    it ever reaches the join shuffle. A final exact left-semi join
    removes the Bloom's false positives, so the result is row-identical
    to ``fact.join(dim, fact[fact_key] == dim[dim_key], "left_semi")``
    — the filter only cuts shuffle input (by ~the dim's selectivity).

    The bitset is a DENSE array of ``n_bits/64`` bigint words — probe
    cost is O(1) per hash (array index + bit test), never a scan of the
    filter. It is built with one tiny aggregate (``n_hashes`` positions
    per dim key, map-side-combined ``bit_or`` into ≤ ``n_bits/64``
    groups), collected (bounded by the word count, NOT dim cardinality)
    and embedded as a literal — the same bounded-collect pattern as the
    IVF centroid literals.
    """
    n_words = n_bits // 64

    def probes(col: str) -> list:
        return [
            F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(n_bits))
            for i in range(n_hashes)
        ]

    word_rows = (
        dim.select(F.explode(F.array(*probes(dim_key))).alias("p"))
        .selectExpr(
            "cast(p div 64 as int) AS w",
            "shiftleft(cast(1 as bigint), cast(p % 64 as int)) AS b",
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .collect()
    )
    words = [0] * n_words
    for r in word_rows:
        words[r["w"]] = r["bits"]
    # array literal via F.lit(list) (r14; comment corrected per r14
    # ADVICE): PySpark expands lit(list) to array(*[lit(x)…]) and
    # Catalyst constant-folds BOTH forms to the same ArrayType literal,
    # so this is equivalent to F.array(*lits) after optimization — kept
    # as the clearer spelling of "one constant array", not a perf fix.
    bitset = F.lit(words).cast("array<bigint>")

    pre = fact.withColumn("_bs", bitset)
    cond = None
    for i, p in enumerate(probes(fact_key)):
        pre = pre.withColumn(f"_p{i}", p)
        c = F.expr(
            f"(element_at(_bs, cast(_p{i} div 64 as int) + 1)"
            f" & shiftleft(cast(1 as bigint), cast(_p{i} % 64 as int))) != 0"
        )
        cond = c if cond is None else (cond & c)
    pre = pre.where(cond).drop("_bs", *[f"_p{i}" for i in range(n_hashes)])
    keys = dim.select(F.col(dim_key).alias("_bsj_key")).distinct()
    return pre.join(
        keys, pre[fact_key] == keys["_bsj_key"], "left_semi"
    )
