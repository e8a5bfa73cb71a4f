"""The whole-corpus oracle differential: every registered entry —
driver tier AND folded extras — runs against its DuckDB oracle with
the driver's compare semantics; rows-only entries get a smoke run.

This is the single source of differential coverage (the per-module
ORACLE_CHECKED lists were folded in here when the registry split into
driver/extra tiers), so an entry can't silently lose its check by
moving between tiers.
"""

import pytest

from conftest import CORPUS, SF_ORACLE, assert_matches_oracle

_ALL = sorted(CORPUS.queries())
_ORACLES = CORPUS.oracle_sql()

# Slow streaming entries already exercised end-to-end by the streaming
# differential below get their oracle check here too — no exclusions:
# every name runs exactly once in this module.


@pytest.mark.parametrize("name", _ALL)
def test_corpus_entry(spark, duck, name):
    df = CORPUS.queries()[name](spark, SF_ORACLE)
    if name in _ORACLES:
        assert_matches_oracle(df, duck, _ORACLES[name])
    else:
        # rows-only tier (sketches / iterative / open-session ops):
        # must at least execute and produce a stable, collectable result
        rows = df.collect()
        assert rows is not None
