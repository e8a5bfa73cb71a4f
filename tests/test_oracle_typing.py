"""Meta-test: every oracle's DuckDB result schema must survive Arrow
canonicalization without decimal/HUGEINT columns.

Why this exists: the driver canonicalizes both sides through
Arrow/pandas before hashing. DuckDB's ``SUM`` over integers returns
HUGEINT, which a plain ``fetchall()`` hides (it comes back as a Python
int) but which surfaces as decimal128(38,0) / float64 under
``.arrow()`` / ``.df()`` — hashing differently from Spark's BIGINT.
That exact gap kept ``profile_columns`` red for three rounds while the
local checker stayed green. The rule this test enforces corpus-wide:
**every DuckDB aggregate over integers must be CAST to BIGINT (or
DOUBLE for ratios) in the oracle SQL.**

DuckDB-only — no SparkSession — so it runs in seconds at sf0.01.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from conftest import CORPUS, SF_ORACLE
from netflow_analysis_with_spark_streaming_spark.schemas import TESTDATA_TABLES

_ORACLES = CORPUS.oracle_sql()


@pytest.fixture(scope="module")
def duck_typing():
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_ORACLE}/{name}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_arrow_schema_has_no_decimals(duck_typing, name):
    schema = duck_typing.sql(_ORACLES[name]).fetch_arrow_table().schema
    offenders = [
        f"{f.name}:{f.type}" for f in schema if pa.types.is_decimal(f.type)
    ]
    assert not offenders, (
        f"oracle '{name}' emits decimal/HUGEINT columns under Arrow "
        f"canonicalization: {offenders} — CAST them to BIGINT/DOUBLE "
        "in the SQL (see queries_parity.py's SUM(CASE...) recipe)"
    )
