"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.6 T6 — the extension point for semantics the built-in
windowed aggs can't express).

Two operators:
- running_totals: per-key cumulative count/sum carried across
  micro-batches (update semantics) — the live-dashboard accumulator
  the reference pushed to the browser (RealTimeAccess.jsx:17-20),
  now engine-side with bounded, keyed state.
- sessionize: gap-based session windows (close a session when no
  event arrives for `gap` seconds of event time) — the classic
  stateful op that tumbling windows cannot express.

Scale: state lives in the state store partitioned by key; an executor
touches only its keys' state per batch. Event-time timeouts +
watermark bound state growth exactly like windowed aggs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:
    import pandas as pd

RUNNING_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
_RUNNING_STATE = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def running_totals(stream: DataFrame, key: str = "user_id", value: str = "value") -> DataFrame:
    """Cumulative per-key totals, one emission per key per batch."""

    def fn(
        key_tuple: Any, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key_tuple[0]], "n_events": [n], "total_value": [total]}
        )

    return stream.groupBy(key).applyInPandasWithState(
        fn, RUNNING_OUT, _RUNNING_STATE, "update", GroupStateTimeout.NoTimeout
    )


SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)
_SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def sessionize(
    stream: DataFrame,
    gap_seconds: int,
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization: a session closes when the key sees no
    event for `gap_seconds` (event time). Closed sessions are emitted;
    the open session stays in state until its event-time timeout fires
    (watermark-driven), so state is bounded.

    The caller must apply withWatermark(ts_col, ...) upstream —
    event-time timeouts require it.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key_tuple: Any, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key_tuple[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )
            return

        ts_us = []
        for pdf in pdfs:
            ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf[ts_col]))
        ts_us.sort()
        closed = []
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = ts_us[0], ts_us[0], 0
        for t in ts_us:
            if t - last_us > gap_us:
                closed.append((start_us, last_us, n))
                start_us, n = t, 0
            last_us = max(last_us, t)
            n += 1
        state.update((start_us, last_us, n))
        state.setTimeoutTimestamp((last_us // 1000) + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key_tuple[0]] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return stream.groupBy(key).applyInPandasWithState(
        fn, SESSION_OUT, _SESSION_STATE, "append", GroupStateTimeout.EventTimeTimeout
    )


FUNNEL_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", LongType()),
    ]
)
_FUNNEL_STATE = StructType(
    [StructField("stage", LongType()), StructField("reached_us", LongType())]
)


def funnel_stages(
    stream: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-key ordered-funnel progression carried across micro-batches:
    a key advances from stage i to i+1 on the first ``steps[i]`` event
    STRICTLY after the time stage i was reached (same strict-ordering
    semantics as the batch funnel_conversion entry — independent event
    counts are not a funnel). One emission per key per batch (update
    mode); state is two longs per key.

    Within a batch events are sorted by event time before the greedy
    scan, so intra-batch arrival order never matters; across batches
    the usual streaming assumption applies (batches arrive in event-
    time order — same contract as sessionize)."""

    def fn(
        key_tuple: Any, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        stage, reached = state.get if state.exists else (0, -1)
        rows: list[tuple[int, str]] = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col])
            rows.extend(
                (int(t.value // 1000), ty)
                for t, ty in zip(ts, pdf[type_col])
            )
        rows.sort(key=lambda r: r[0])
        n_steps = len(steps)
        for us, typ in rows:
            if stage < n_steps and typ == steps[stage] and (
                stage == 0 or us > reached
            ):
                stage += 1
                reached = us
        state.update((stage, reached))
        yield pd.DataFrame({"user_id": [key_tuple[0]], "stage": [stage]})

    return stream.groupBy(key).applyInPandasWithState(
        fn, FUNNEL_OUT, _FUNNEL_STATE, "update", GroupStateTimeout.NoTimeout
    )
