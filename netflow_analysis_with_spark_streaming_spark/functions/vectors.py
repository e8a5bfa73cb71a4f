"""Embedding-vector expressions: cosine math + deterministic LSH.

All built-in higher-order functions (zip_with / aggregate / transform)
— the dot product runs JVM-side per row, no Python boundary. The LSH
hyperplanes are generated from a Knuth-multiplicative integer formula
rather than rand(seed) so that (a) every executor derives bit-identical
planes with zero driver->executor data movement, and (b) tests and
oracles can reproduce them.

Scale (100 TB): brute-force top-k is O(Q x N) — fine for small Q on a
broadcast query set, the baseline. The LSH path buckets candidates so
each query probes ~N / 2^planes rows; buckets are the join key, so the
probe is a plain shuffled equi-join that AQE can skew-split.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_KNUTH = 2654435761  # golden-ratio multiplicative constant


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sum of elementwise products, left-to-right double accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(vec: Column) -> Column:
    return F.sqrt(dot(vec, vec))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane(j: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane j as array<double> in
    [-1, 1): ((j*dim+k) * KNUTH mod 2^32) / 2^31 - 1."""
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    return F.transform(
        idx,
        lambda k: ((F.lit(j * dim) + k) * _KNUTH % F.lit(2**32)).cast("double")
        / F.lit(float(2**31))
        - 1.0,
    )


def lsh_bucket(vec: Column, dim: int, planes: int = 6) -> Column:
    """Sign-pattern bucket id: bit j = (dot(vec, plane_j) >= 0).

    2^planes buckets; cosine-similar vectors land together with high
    probability (random-hyperplane LSH for angular distance).
    """
    bits = [
        F.when(dot(vec, hyperplane(j, dim)) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")
