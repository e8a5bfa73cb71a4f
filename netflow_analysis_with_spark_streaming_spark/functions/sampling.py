"""Deterministic sampling for training-data pipelines.

``df.sample()`` / ``sampleBy()`` draw from a per-task RNG: the sample
changes with partitioning, task retries and Spark versions — poison
for reproducible corpus builds and for joining a sample against a
later re-run. These operators hash a stable key instead (md5-derived
uniform in [0, 1), the same bit-identical construction the dedup
family uses), so the decision for a row is a pure function of
(key, seed):

- retry/partitioning-invariant, cluster-size-invariant;
- the same row is in/out across EVERY table sharing the key —
  consistent sampling of joined fact/dim tables for free;
- exactly mirrorable in the DuckDB oracles (no rows-only check).

Scale: a narrow codegen'd filter — pushes work to the scan, no
shuffle, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import text as T

_BUCKETS = 1_000_000  # ppm resolution for fractions


def hash_bucket(key: Column, seed: int = 0) -> Column:
    """Stable bucket in [0, 1e6) from the row key — md5-derived, so
    bit-identical in any engine with md5 (DuckDB mirror in
    bucket_sql). NULL keys coalesce to '' (bucketed like the empty
    string, deterministically) — a NULL hash would make every sampling
    predicate NULL and silently drop the row from BOTH sides of a
    split."""
    return T.md5_hash32(F.coalesce(key.cast("string"), F.lit("")), seed) % _BUCKETS


def bucket_sql(key_sql: str, seed: int = 0) -> str:
    """DuckDB mirror of hash_bucket for oracle SQL."""
    coalesced = f"COALESCE(CAST({key_sql} AS VARCHAR), '')"
    return f"({T.md5_hash32_sql(coalesced, seed)} % {_BUCKETS})"


def sample_fraction(
    df: DataFrame, key: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep ~fraction of rows, decided by hash(key, seed) — Bernoulli
    sampling that is deterministic and join-consistent on `key`."""
    return df.filter(hash_bucket(F.col(key), seed) < int(fraction * _BUCKETS))


def sample_by(
    df: DataFrame,
    strata: str,
    key: str,
    fractions: dict[str, float],
    seed: int = 0,
    default: float = 0.0,
) -> DataFrame:
    """Stratified deterministic sampling (`sampleBy` replacement):
    per-stratum keep-fractions, hash-decided. Strata not listed get
    `default`."""
    frac = F.lit(default)
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(strata) == value, F.lit(f)).otherwise(frac)
    return df.filter(
        hash_bucket(F.col(key), seed) < (frac * _BUCKETS).cast("long")
    )


def split_train_holdout(
    df: DataFrame, key: str, holdout_fraction: float = 0.1, seed: int = 0
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, deterministic train/holdout split on the key hash —
    the leakage-safe way to carve an eval set out of a corpus (the
    same document can never drift between splits across re-runs)."""
    cut = int(holdout_fraction * _BUCKETS)
    b = hash_bucket(F.col(key), seed)
    return df.filter(b >= cut), df.filter(b < cut)
