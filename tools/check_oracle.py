"""Driver-emulating correctness checker (see .claude/skills/verify).

Runs every ``queries()`` entry on a VANILLA SparkSession (hostile
non-UTC timezone preset, no engine confs) and diffs against the DuckDB
``oracle_sql()`` at sf0.01 with the driver's compare semantics:
row count + sorted column names + order-insensitive value multiset.

The DuckDB side is fetched via ``.fetch_arrow_table()``, NOT
``fetchall()``: the driver canonicalizes through Arrow/pandas, where a
DuckDB HUGEINT (the default type of ``SUM`` over integers) surfaces as
decimal128(38,0) / float64 instead of a plain int — ``fetchall()``
hides that and made this gate pass code the driver rejected
(profile_columns, rounds 2-4).  Any decimal column in an oracle result
is therefore a hard FAIL here: cast it to BIGINT/DOUBLE in the SQL.

Usage: python tools/check_oracle.py [name_substring ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return str(v)


def _multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def main() -> int:
    from pyspark.sql import SparkSession

    patterns = sys.argv[1:]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "America/Los_Angeles")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    if os.environ.get("CHECK_ALL_TIERS"):
        from netflow_analysis_with_spark_streaming_spark import queries as Q

        queries, oracles = Q.all_queries(), Q.all_oracles()
    else:
        queries, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in queries.items():
        if patterns and not any(p in name for p in patterns):
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            srows = [tuple(r) for r in df.collect()]
            scols = df.columns
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            failed.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows ({dt:.1f}s, rows-only)")
            continue
        try:
            tbl = con.sql(oracles[name]).fetch_arrow_table()
            dcols = tbl.column_names
            dcolumns = [c.to_pylist() for c in tbl.columns]
            drows = list(zip(*dcolumns)) if dcols else []
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        problems = []
        bad_types = [
            f"{f.name}:{f.type}"
            for f in tbl.schema
            if pa.types.is_decimal(f.type)
        ]
        if bad_types:
            problems.append(
                f"oracle emits decimal/HUGEINT under Arrow ({bad_types}); "
                "CAST to BIGINT/DOUBLE in the SQL"
            )
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if not problems:
            sm, dm = _multiset(srows, scols), _multiset(drows, dcols)
            bad = [(a, b) for a, b in zip(sm, dm) if a != b]
            if bad:
                problems.append(f"values (first 2): {bad[:2]}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"ok    {name}: {len(srows)} rows ({dt:.1f}s)")
    spark.stop()
    if failed:
        print(f"\n{len(failed)} FAILED: {failed}")
        return 1
    print("\nall green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
