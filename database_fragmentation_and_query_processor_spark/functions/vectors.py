"""Vector math over ``array<float>`` embedding columns.

All pure column expressions (`aggregate`/`zip_with`/`transform`) — they
run inside the JVM with whole-stage codegen, no Python round-trips, and
scale as narrow per-row work. For 100 TB this matters: a Python UDF here
would serialize every vector through Arrow per batch; these don't.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product, sequential left-to-right accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe denominator (0-norm → NULL)."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def l2_distance(a: Column, b: Column) -> Column:
    diff2 = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
    )
    return F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x))


def sign_bits(a: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: one bit per plane (packed into a
    long). ``planes`` are fixed driver-side constants so the expression
    is deterministic and broadcast inside the plan — no shuffle, no UDF.
    """
    bits = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(v)) for v in p])
        bit = (dot(a, plane) >= 0).cast("long")
        bits = bits + F.shiftleft(bit, i)
    return bits
