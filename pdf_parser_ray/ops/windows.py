"""Event-stream operators (events table: event_id, ts, user_id, event_type,
value, props).

Ray Data has no event-time windowing; these express windows the
batch-native way (ray_guide "Streaming-shaped workloads"):

* tumbling windows = a floor_temporal column + grouped aggregate, with
  per-batch partial aggregation BEFORE the shuffle;
* sessionization = groupby(user_id).map_groups over ts-sorted groups.
  Ordering assumption: all events of one user fit one group (true by
  construction of the groupby); within-group order is imposed by the
  explicit sort inside the group function, not assumed from input.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def tumbling_counts(
    ds: ray.data.Dataset, unit: str = "hour"
) -> ray.data.Dataset:
    """Events per (window_start, event_type): count + sum(value).

    Partial-aggregates inside each batch (Arrow group_by) so the global
    shuffle moves one row per (window, type) per batch, not per event.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch.column("ts"), unit=unit)
        t = pa.table(
            {
                "window_start": win,
                "event_type": batch.column("event_type"),
                "value": batch.column("value"),
            }
        )
        g = t.group_by(["window_start", "event_type"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return g.rename_columns(
            ["window_start", "event_type", "sum_value", "n_events"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["window_start", "event_type"]).aggregate(
        Sum("sum_value", alias_name="sum_value"),
        Sum("n_events", alias_name="n_events"),
    )


def sessionize(
    ds: ray.data.Dataset, gap_seconds: int = 1800
) -> ray.data.Dataset:
    """Per-user session count with a fixed inactivity gap.

    Shuffle key = user_id (uniform unless one user dominates; salt if
    so).  Output: (user_id:int64, n_sessions:int64, n_events:int64).
    """

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gaps = g["ts"].diff().dt.total_seconds()
        n_sessions = int((gaps > gap_seconds).sum()) + 1
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [n_sessions],
                "n_events": [len(g)],
            }
        ).astype({"user_id": "int64", "n_sessions": "int64", "n_events": "int64"})

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
