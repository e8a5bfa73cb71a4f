"""Driver-contract guards: registry shape + oracle SQL validity.

Fast checks (no Spark jobs) that catch contract regressions — a typo'd
oracle or a query registered without a callable — before the driver's
full differential run does.
"""

import importlib
import sys


def _entry():
    if "__spark_entry__" in sys.modules:
        return sys.modules["__spark_entry__"]
    return importlib.import_module("__spark_entry__")


def test_registry_shape():
    mod = _entry()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 60
    assert set(oracles) <= set(qs), "oracle without a query"
    assert all(callable(f) for f in qs.values())
    # rows-only entries are the documented sketch/iterative set
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "agg_approx_distinct",
        "similarity_lsh_topk",
        "similarity_ivf_topk",
        "similarity_quantized_topk",
        "dedup_components",
        "stream_sessionize",
        "stream_dedup_watermark",
    }, rows_only


def test_all_oracles_parse_in_duckdb(duck):
    """EXPLAIN every oracle against the registered views — parse +
    bind errors surface here in milliseconds, not in the driver run."""
    mod = _entry()
    for name, sql in mod.oracle_sql().items():
        try:
            duck.execute("EXPLAIN " + sql)
        except Exception as ex:  # noqa: BLE001
            raise AssertionError(f"oracle for {name} invalid: {ex}") from ex
