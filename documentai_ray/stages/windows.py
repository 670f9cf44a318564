"""Windowed aggregation operators over event streams (SURVEY §2.10).

The reference has no event-time semantics (request/response only); these
operators are part of the training-data-pipeline surface: Ray Data is a
batch engine, so windows are expressed as deterministic batch transforms:

- ``tumbling_window_agg``   — truncate ts to the window, groupby.
- ``sliding_window_agg``    — each event is expanded to the ``window/slide``
  windows containing it (vectorized per batch), then a tumbling groupby.
  The expansion happens map-side, so the shuffle carries
  (window_start, key) partials — never raw events times k.
- ``session_windows``       — per-key gap-based sessionization inside
  ``groupby(key).map_groups`` over ts-sorted groups.

Ordering contract: none required across rows — every operator keys on
values derived from the row itself (event time), per SURVEY §2.10's
"no watermarks, no late data" scope (batch = complete input).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window_agg(ds, *, ts_col: str = "ts", key_col: str = "event_type",
                        unit: str = "hour", value_col: str = "value"):
    """Per (window, key): count + sum(value). One pre-aggregated shuffle."""
    from ray.data.aggregate import Count, Sum

    def add_window(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "window_start", pc.floor_temporal(batch.column(ts_col), unit=unit)
        )

    return (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["window_start", key_col])
        .aggregate(Count(alias_name="n_events"), Sum(value_col, alias_name="sum_value"))
    )


def sliding_window_agg(ds, *, ts_col: str = "ts", key_col: str = "event_type",
                       window_minutes: int = 60, slide_minutes: int = 15):
    """Count events per (sliding window, key).

    Each event belongs to ``window/slide`` windows; the per-batch expansion
    emits one (window_start, key) row per membership — vectorized numpy
    timestamp math, no per-row Python."""
    assert window_minutes % slide_minutes == 0
    k = window_minutes // slide_minutes
    slide_us = np.int64(slide_minutes * 60 * 1_000_000)

    from ray.data.aggregate import Count

    def expand(batch: pa.Table) -> pa.Table:
        ts = (
            batch.column(ts_col)
            .cast(pa.timestamp("us"))  # normalize unit before integer math
            .cast(pa.int64())
            .to_numpy()
        )  # µs since epoch
        keys = batch.column(key_col).to_pylist()
        bucket = (ts // slide_us) * slide_us  # slide-aligned bucket of the event
        starts = np.concatenate([bucket - i * slide_us for i in range(k)])
        keys_rep = keys * k
        return pa.table(
            {
                "window_start": pa.array(starts, pa.int64()).cast(pa.timestamp("us")),
                key_col: pa.array(keys_rep, pa.string()),
            }
        )

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby(["window_start", key_col])
        .aggregate(Count(alias_name="n_events"))
    )


def session_windows(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                    gap_minutes: int = 30):
    """Per key: number of sessions and max session length (events), with a
    session break whenever the gap to the previous event exceeds ``gap``."""

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].sort_values()
        breaks = (ts.diff() > pd.Timedelta(minutes=gap_minutes)).cumsum()
        sizes = breaks.value_counts()
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "n_sessions": [int(breaks.max()) + 1 if len(g) else 0],
                "max_session_events": [int(sizes.max())],
            }
        )

    return ds.groupby(key_col).map_groups(sessions, batch_format="pandas")
