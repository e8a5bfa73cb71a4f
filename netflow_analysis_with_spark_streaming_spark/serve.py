"""Result serving helpers (K5 parity: the reference's HTTP layer ends
in `res.json(aggregation result)` — accessTrend.ts:94-97; the engine
equivalent is a bounded collect/toJSON of a query result).

These are DRIVER-side conveniences for small results (the flagship
returns ~days rows). They refuse unbounded payloads instead of
silently materializing a 100 TB DataFrame on the driver — the
footgun the reference's Kafka sink collect() shipped with
(README.md:168,182).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

DEFAULT_MAX_ROWS = 100_000


def to_records(df: DataFrame, max_rows: int = DEFAULT_MAX_ROWS) -> list[dict]:
    """Result rows as JSON-able dicts (the `res.json(data)` payload).

    Guards with limit(max_rows + 1) BEFORE collecting — the driver
    never holds more than the cap + 1 rows even when the input is huge.
    """
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"result exceeds {max_rows} rows; aggregate or raise max_rows "
            "explicitly — driver-side collects must stay bounded"
        )
    return [r.asDict(recursive=True) for r in rows]


def to_json_payload(df: DataFrame, max_rows: int = DEFAULT_MAX_ROWS) -> str:
    """The exact HTTP response body shape: a JSON array of row objects."""
    return json.dumps(to_records(df, max_rows), default=str)
