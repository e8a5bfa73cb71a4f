"""Streaming observability: progress metrics off StreamingQuery.

The reference has zero observability (SURVEY §2.6 — no metrics, no
lag tracking); a production stream needs input rate, processing rate,
batch duration and state size to detect backpressure before it becomes
an outage. Spark already exposes all of it via query.lastProgress /
recentProgress — this module just gives it a stable, testable shape.
"""

from __future__ import annotations

from typing import Any


def progress_summary(query) -> dict[str, Any] | None:
    """Flatten the latest StreamingQueryProgress into the handful of
    numbers an operator dashboard needs. None until the first batch."""
    p = query.lastProgress
    if p is None:
        return None
    state = p.get("stateOperators") or []
    return {
        "batch_id": p.get("batchId"),
        "num_input_rows": p.get("numInputRows"),
        "input_rows_per_sec": p.get("inputRowsPerSecond"),
        "process_rows_per_sec": p.get("processedRowsPerSecond"),
        "batch_duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
        "state_rows": sum(s.get("numRowsTotal", 0) for s in state),
        "state_bytes": sum(s.get("memoryUsedBytes", 0) for s in state),
        "watermark": (p.get("eventTime") or {}).get("watermark"),
    }


def total_input_rows(query) -> int:
    """Rows ingested across the retained progress history."""
    return sum(p.get("numInputRows", 0) for p in (query.recentProgress or []))
