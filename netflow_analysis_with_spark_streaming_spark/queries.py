"""The query corpus: named (spark, sf_dir) -> DataFrame callables plus
matching DuckDB oracle SQL (SURVEY.md §5.2.1).

Registration pattern: each operator module contributes queries via
``register``. Column names are aliased identically on both sides —
the driver's compare sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import tables
from .operators import access_trend as _access_trend

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Range bounds pre-applied on the raw ns column => parquet pushdown;
    # access_trend re-applies them on the timestamp (no-op, keeps the
    # operator self-contained).
    events = tables.load_events_range(
        spark,
        sf_dir,
        _access_trend.DEFAULT_TS_FROM,
        _access_trend.DEFAULT_TS_TO,
    )
    return _access_trend.access_trend(events)


register("flagship_access_trend", _flagship, _access_trend.ACCESS_TREND_ORACLE)

# Widen the corpus: each import registers its module's queries.
from . import queries_relational  # noqa: E402,F401
from . import queries_parity  # noqa: E402,F401
from . import queries_extensions  # noqa: E402,F401
from . import queries_streaming  # noqa: E402,F401
