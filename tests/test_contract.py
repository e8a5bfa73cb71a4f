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
    from netflow_analysis_with_spark_streaming_spark import queries as Q

    mod = _entry()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    # the harness checks only the first 50 registered entries — the
    # driver tier must fit the window AND follow the explicit order
    assert len(qs) <= Q.DRIVER_WINDOW
    assert list(qs) == Q._DRIVER_ORDER
    assert set(oracles) <= set(qs), "oracle without a query"
    assert all(callable(f) for f in qs.values())
    # rows-only entries are the documented sketch/iterative set
    # every driver entry now carries a DuckDB oracle — the remaining
    # rows-only checks (IVF, open-session sessionize) live in the
    # extra tier with property-test evidence instead
    rows_only = set(qs) - set(oracles)
    assert rows_only == set(), rows_only
    # extras keep their oracles for the pytest differential
    assert set(Q.EXTRA_ORACLES) <= set(Q.EXTRA_QUERIES)
    assert not set(Q.EXTRA_QUERIES) & set(qs), "entry in both tiers"
    assert len(Q.all_queries()) >= 70


def test_strict_driver_order_validation_ran():
    """The registrar-completion protocol must have ended in ONE strict
    validation (every registrar reported done), and strict mode must
    actually raise on a desync — a driver register() removed without a
    _DRIVER_ORDER update can't slip through silently."""
    import pytest

    from netflow_analysis_with_spark_streaming_spark import queries as Q

    assert Q._DONE_REGISTRARS == set(Q._EXPECTED_REGISTRARS)
    saved = Q.QUERIES.pop("corpus_domain_mix")
    try:
        with pytest.raises(RuntimeError, match="missing"):
            Q._apply_driver_order(deferred=False)
    finally:
        Q.QUERIES["corpus_domain_mix"] = saved
        Q._apply_driver_order(deferred=False)  # restore canonical order


def test_unpartitioned_windows_are_allowlisted():
    """A Window.orderBy without partitionBy moves EVERY row to one
    task — the classic 100 TB cliff. The engine's three uses are all
    bounded-cardinality by construction; this meta-test turns that
    manual audit into a regression gate: any NEW unpartitioned window
    in pkg/ fails here until it is allowlisted with its cardinality
    bound."""
    import pathlib

    pkg = (
        pathlib.Path(__file__).resolve().parents[1]
        / "netflow_analysis_with_spark_streaming_spark"
    )
    # (file name, line snippet) -> documented row-count bound
    allowed = {
        ("queries_extensions.py", 'Window.orderBy("p")'):
            "per-partition offsets table: exactly _PACK_PARTS (8) rows",
        ("queries_extensions.py", "Window.orderBy().rowsBetween"):
            "corpus_domain_mix min: one row per language (#sources)",
        ("queries_relational.py", 'Window.orderBy("day")'):
            "day-series analytics: one row per day in the fixture range",
    }
    violations = []
    matched = set()
    for py in sorted(pkg.rglob("*.py")):
        for lineno, line in enumerate(py.read_text().splitlines(), 1):
            if "Window.orderBy" not in line or "partitionBy" in line:
                continue
            hit = [
                key
                for key in allowed
                if key[0] == py.name and key[1] in line
            ]
            if hit:
                matched.update(hit)
            else:
                violations.append(f"{py.name}:{lineno}: {line.strip()}")
    assert not violations, (
        "unpartitioned Window not in the bounded-cardinality allowlist "
        f"(add it WITH its bound, or partition it): {violations}"
    )
    stale = set(allowed) - matched
    assert not stale, f"allowlist entries no longer present in source: {stale}"


def test_all_oracles_parse_in_duckdb(duck):
    """EXPLAIN every oracle (both tiers) against the registered views —
    parse + bind errors surface here in milliseconds, not in the
    driver run."""
    from netflow_analysis_with_spark_streaming_spark import queries as Q

    for name, sql in Q.all_oracles().items():
        try:
            duck.execute("EXPLAIN " + sql)
        except Exception as ex:  # noqa: BLE001
            raise AssertionError(f"oracle for {name} invalid: {ex}") from ex


def test_no_driver_entry_plans_all_pairs(spark):
    """The never-O(n^2) discipline, swept over EVERY batch driver
    entry: no physical plan may contain a CartesianProduct, and a
    BroadcastNestedLoopJoin is allowed only where it is the DESIGNED
    shape (a constant-size side broadcast against the fact side, never
    fact x fact). A future entry that sneaks in an accidental cross
    join fails here at sf0.001 instead of melting a cluster at scale.

    Streaming entries are excluded: their returned DataFrame is a
    memory-sink read, not the executed streaming plan (their shapes
    are pinned by the streaming tests' state/watermark assertions).
    """
    from netflow_analysis_with_spark_streaming_spark import queries as Q
    from netflow_analysis_with_spark_streaming_spark.plans.inspect import (
        executed_plan,
    )

    # entry -> why its BNLJ is the intended plan. similarity_cosine_topk
    # (tiny fixed query set broadcast against all embeddings — linear
    # pair count) carried the only allowlisted BNLJ until its round-12
    # retirement to the pytest tier; the sweep covers driver entries
    # only, so the allowlist is empty until another designed BNLJ lands.
    bnlj_allowed: dict[str, str] = {}
    bad = {}
    seen_bnlj = set()
    for name, fn in Q.QUERIES.items():
        if name.startswith("stream_") or name == "corpus_curate_stream_backfill":
            continue
        plan = executed_plan(fn(spark, "/root/testdata/sf0.001"))
        if "CartesianProduct" in plan:
            bad[name] = "CartesianProduct"
        if "BroadcastNestedLoopJoin" in plan:
            seen_bnlj.add(name)
            if name not in bnlj_allowed:
                bad[name] = "BroadcastNestedLoopJoin not allowlisted"
    assert not bad, bad
    stale = set(bnlj_allowed) - seen_bnlj
    assert not stale, f"BNLJ allowlist entries no longer plan a BNLJ: {stale}"


def test_driver_schemas_stable_across_sf(spark):
    """The harness smoke-checks entry()/queries() for a STABLE schema;
    a type or column that varies with the data (inference drift, empty-
    input fallbacks) breaks the contract even when each run 'works'.
    Every driver entry must produce the identical schema at sf0.001
    and sf0.01."""
    from netflow_analysis_with_spark_streaming_spark import queries as Q

    drift = {}
    for name, fn in Q.QUERIES.items():
        s_small = fn(spark, "/root/testdata/sf0.001").schema
        s_mid = fn(spark, "/root/testdata/sf0.01").schema
        if s_small != s_mid:
            drift[name] = (s_small.simpleString(), s_mid.simpleString())
    assert not drift, drift


def test_registry_survives_any_registrar_import_order():
    """Importing any registrar submodule FIRST (a user reaching for
    one operator family directly) must still produce the full, ordered
    50-entry driver tier — the import cycle through queries.py used to
    raise 'driver order out of sync' for every order but the canonical
    one. Subprocesses because module import order can't be replayed
    in-process."""
    import subprocess
    import sys

    mods = [
        "queries",
        "queries_relational",
        "queries_parity",
        "queries_extensions",
        "queries_streaming",
    ]
    for m in mods:
        code = (
            f"from netflow_analysis_with_spark_streaming_spark import {m}\n"
            "from netflow_analysis_with_spark_streaming_spark import queries as Q\n"
            "assert len(Q.QUERIES) == 50, len(Q.QUERIES)\n"
            "assert list(Q.QUERIES)[0] == 'flagship_access_trend'\n"
            "assert len(Q.ORACLES) == 50\n"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code],
            cwd="/root/repo",
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert proc.returncode == 0, f"{m}-first: {proc.stderr[-1500:]}"
