"""Event-stream operators (events table: event_id, ts, user_id, event_type,
value, props).

Ray Data has no event-time windowing; these express windows the
batch-native way (ray_guide "Streaming-shaped workloads"):

* tumbling windows = a floor_temporal column + grouped aggregate, with
  per-batch partial aggregation BEFORE the shuffle;
* sessionization / window functions = bounded-partition co-location
  (``ops.shuffle.partitioned_map``: hash(user) % n_parts) with the
  per-user work vectorized ACROSS users inside each partition —
  user-cardinality map_groups would pay per-group engine overhead.
  Ordering assumption: all events of one user land in one partition
  (true by construction of the hash); order is imposed by the explicit
  in-partition sort, not assumed from input.
"""

from __future__ import annotations

import math

import numpy as np
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


def sliding_counts(
    ds: ray.data.Dataset, *, width_s: int = 3600, step_s: int = 1800
) -> ray.data.Dataset:
    """Sliding windows: each event lands in every window [start, start+W)
    with start ≡ 0 (mod step) — emitted by per-batch fan-out (W/S rows
    per event) then one grouped aggregate over partials.

    Output: (window_start:timestamp[us], event_type, n_events:int64,
    sum_value:float64).  SQL-mirrored: starts are aligned to the epoch,
    i.e. start = step · k for integer k.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    n_windows = -(-width_s // step_s)  # ceil

    def fan_out(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()  # µs since epoch
        etype = batch.column("event_type").to_numpy(zero_copy_only=False)
        value = batch.column("value").to_numpy()
        step_us = step_s * 1_000_000
        width_us = width_s * 1_000_000
        # newest window containing ts: floor(ts/step)*step; walk back
        base = (ts // step_us) * step_us
        frames = []
        for k in range(n_windows):
            start = base - k * step_us
            mask = ts < start + width_us  # always true for k small; guard
            frames.append(
                pa.table(
                    {
                        "window_start": pa.array(start[mask], pa.int64()),
                        "event_type": pa.array(etype[mask], pa.string()),
                        "value": pa.array(value[mask], pa.float64()),
                    }
                )
            )
        t = pa.concat_tables(frames)
        g = t.group_by(["window_start", "event_type"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return g.rename_columns(["window_start", "event_type", "sum_value", "n_events"])

    partials = ds.map_batches(fan_out, batch_format="pyarrow")
    agg = partials.groupby(["window_start", "event_type"]).aggregate(
        Sum("sum_value", alias_name="sum_value"),
        Sum("n_events", alias_name="n_events"),
    )

    def cast_ts(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("window_start"),
            "window_start",
            batch.column("window_start").cast(pa.timestamp("us")),
        )

    return agg.map_batches(cast_ts, batch_format="pyarrow")


def top_events_per_type(ds: ray.data.Dataset, k: int = 3) -> ray.data.Dataset:
    """Per-group top-k: highest-value events per event_type.

    Scale shape: event_type has FEW distinct values, so a plain
    ``groupby(type).map_groups`` would pull ~1/n_types of the corpus
    into one worker's pandas frame.  Instead each batch keeps only its
    local top-k per type (map_batches partial, ~batch_size/k shrink),
    and only that tiny partial stream enters the final per-type groupby,
    whose groups are bounded by k × n_batches rows.  Deterministic
    tie-break (value DESC, event_id ASC) at both levels.
    Output: (event_type, event_id, value).
    """

    def top(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "event_id"], ascending=[False, True]).head(k)
        return g[["event_type", "event_id", "value"]]

    def partial_top(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["value", "event_id"], ascending=[False, True])
            .groupby("event_type", as_index=False, sort=False)
            .head(k)[["event_type", "event_id", "value"]]
        )

    partials = ds.map_batches(partial_top, batch_format="pandas")
    return partials.groupby("event_type").map_groups(top, batch_format="pandas")


SALT_GROUP_THRESHOLD = 2_000_000
SALT_BUCKET_SECONDS = 7 * 86400


def sessionize(
    ds: ray.data.Dataset,
    gap_seconds: int = 1800,
    *,
    n_parts: int | None = None,
    salt: str = "auto",
    salt_threshold: int = SALT_GROUP_THRESHOLD,
    salt_bucket_seconds: int = SALT_BUCKET_SECONDS,
) -> ray.data.Dataset:
    """Per-user session count with a fixed inactivity gap.

    Shuffle key = user_id — uniform unless one user dominates.  Hot
    keys are handled AUTOMATICALLY (``salt="auto"``): a Misra-Gries
    scan of the pruned key column (``ops.shuffle.detect_hot_keys``, the
    skew_join detector) checks for any user above ``salt_threshold``
    rows; if found, the whole input takes the time-salted two-phase
    plan — phase 1 co-locates by (user, time bucket), so a power user's
    rows spread over ``span / salt_bucket_seconds`` partitions and
    per-partition memory stays bounded by the user's per-bucket rate;
    phase 2 merges the one-row-per-(user, bucket) summaries (counting a
    session as continuing across a bucket boundary when the gap between
    adjacent buckets' edge events ≤ ``gap_seconds``), value-identical
    to the single-pass plan (parity-tested with a planted power user).
    ``salt="force"``/``"off"`` pin a route; "auto" costs one extra
    key-column pass only, and the two-phase plan only when skew exists.

    Output: (user_id:int64, n_sessions:int64, n_events:int64).
    """

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        # Vectorized ACROSS users: one sort, one diff, one groupby-agg —
        # no Python call per user (user cardinality is corpus-scale).
        part = part.sort_values(["user_id", "ts", "event_id"])
        new_sess = (
            ~part["user_id"].eq(part["user_id"].shift())
        ) | (part["ts"].diff().dt.total_seconds() > gap_seconds)
        out = (
            part.assign(__ns=new_sess)
            .groupby("user_id", sort=False)
            .agg(n_sessions=("__ns", "sum"), n_events=("__ns", "size"))
            .reset_index()
        )
        return out.astype(
            {"user_id": "int64", "n_sessions": "int64", "n_events": "int64"}
        )

    from pdf_parser_ray.ops.shuffle import detect_hot_keys, partitioned_map

    part_kw = {"n_parts": n_parts} if n_parts else {}

    if salt == "force" or (
        salt == "auto"
        and detect_hot_keys(ds, "user_id", threshold=salt_threshold)
    ):
        return _sessionize_salted(
            ds, gap_seconds, salt_bucket_seconds, part_kw
        )

    return partitioned_map(ds, ["user_id"], per_partition, **part_kw)


def _sessionize_salted(
    ds: ray.data.Dataset,
    gap_seconds: int,
    bucket_seconds: int,
    part_kw: dict,
) -> ray.data.Dataset:
    """Two-phase sessionize co-located by (user, time bucket): phase 1
    summarizes each bucket locally (sessions counted as if the bucket
    started fresh, plus its edge timestamps); phase 2 merges the
    bounded per-(user, bucket) summary rows, subtracting one session
    for every adjacent bucket pair whose boundary gap ≤ gap_seconds.
    Buckets are CONTIGUOUS time ranges (floor(ts / width)), so the
    boundary check is exact — a random salt would break gap chains.
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    us = bucket_seconds * 1_000_000

    def add_bucket(df: pd.DataFrame):
        return arrow_out(
            df.assign(__bucket=df["ts"].astype("int64") // us)
        )

    def local_summary(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["user_id", "__bucket", "ts", "event_id"])
        new_sess = (
            ~part["user_id"].eq(part["user_id"].shift())
            | ~part["__bucket"].eq(part["__bucket"].shift())
            | (part["ts"].diff().dt.total_seconds() > gap_seconds)
        )
        out = (
            part.assign(__ns=new_sess)
            .groupby(["user_id", "__bucket"], sort=False)
            .agg(
                n_sessions=("__ns", "sum"),
                n_events=("__ns", "size"),
                first_ts=("ts", "min"),
                last_ts=("ts", "max"),
            )
            .reset_index()
        )
        return out.astype(
            {"user_id": "int64", "__bucket": "int64",
             "n_sessions": "int64", "n_events": "int64"}
        )

    def merge_buckets(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["user_id", "__bucket"])
        same_user = part["user_id"].eq(part["user_id"].shift())
        boundary_gap = (
            part["first_ts"] - part["last_ts"].shift()
        ).dt.total_seconds()
        merged = same_user & (boundary_gap <= gap_seconds)
        out = (
            part.assign(__m=merged)
            .groupby("user_id", sort=False)
            .agg(
                n_sessions=("n_sessions", "sum"),
                __m=("__m", "sum"),
                n_events=("n_events", "sum"),
            )
            .reset_index()
        )
        out["n_sessions"] = out["n_sessions"] - out["__m"]
        return out[["user_id", "n_sessions", "n_events"]].astype(
            {"user_id": "int64", "n_sessions": "int64", "n_events": "int64"}
        )

    summaries = partitioned_map(
        ds.map_batches(add_bucket, batch_format="pandas"),
        ["user_id", "__bucket"],
        local_summary,
        **part_kw,
    )
    return partitioned_map(summaries, ["user_id"], merge_buckets, **part_kw)


def running_window(
    ds: ray.data.Dataset,
    *,
    part_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    val_col: str = "value",
    round_to: int = 2,
    n_parts: int | None = None,
    salt: str = "auto",
    salt_threshold: int = SALT_GROUP_THRESHOLD,
    salt_bucket_seconds: int = SALT_BUCKET_SECONDS,
) -> ray.data.Dataset:
    """SQL window functions the co-grouped way: per-partition row_number
    and running sum, ordered by ``order_cols`` (which must be a total
    order within the partition — here (ts, event_id)).

    ONE groupby shuffle co-locates each partition; the in-group work is
    a sort + cumsum.  Hot keys take the distributed-prefix-sum plan
    automatically (``salt="auto"``, same Misra-Gries detector as
    :func:`sessionize`): phase 1 computes LOCAL rn/cumsum per
    (user, time bucket) — a power user spreads over its buckets, so
    per-partition memory is bounded by per-bucket rate — a bounded
    per-(user, bucket) count/sum rollup yields per-bucket OFFSETS
    (the classic prefix-sum recursion), joined back by (user, bucket)
    and added.  The running sum is rounded (cross-row float aggregate
    rule) so accumulation-order drift between plans or engines cannot
    flip the hash; parity is pinned with a planted power user.
    The first ``order_cols`` entry must be the bucketing timestamp
    column when the salted plan can trigger (bucket id = floor(ts /
    width) keeps (bucket, *order_cols) equal to the global order).

    Output: (event_id, part_col, rn:int64, cum_value:float64).
    """
    import numpy as np

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        # Vectorized across partitions-in-partition: one sort, grouped
        # cumcount/cumsum (C speed) — no Python call per user.
        g = part.sort_values([part_col, *order_cols])
        grp = g.groupby(part_col, sort=False)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                part_col: g[part_col].to_numpy(),
                "rn": (grp.cumcount() + 1).to_numpy(dtype=np.int64),
                "cum_value": np.round(
                    grp[val_col].cumsum().to_numpy(dtype=np.float64), round_to
                ),
            }
        )

    from pdf_parser_ray.ops.shuffle import detect_hot_keys, partitioned_map

    part_kw = {"n_parts": n_parts} if n_parts else {}

    if salt == "force" or (
        salt == "auto"
        and detect_hot_keys(ds, part_col, threshold=salt_threshold)
    ):
        return _running_window_salted(
            ds, part_col, order_cols, val_col, round_to,
            salt_bucket_seconds, part_kw,
        )

    return partitioned_map(ds, [part_col], per_partition, **part_kw)


def _running_window_salted(
    ds: ray.data.Dataset,
    part_col: str,
    order_cols: tuple[str, ...],
    val_col: str,
    round_to: int,
    bucket_seconds: int,
    part_kw: dict,
) -> ray.data.Dataset:
    """Distributed prefix sum over (user, time bucket) shards.

    Three bounded stages after the bucket tag: local window per
    (user, bucket); per-bucket count/sum rollup (per-batch partials →
    grouped sum, one row per (user, bucket)); per-user offset scan over
    that rollup; then a hash join ships each shard its offsets.  Two
    passes over the input (the local window and the rollup) — both
    stream; nothing user-cardinality touches the driver.
    """
    import numpy as np

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.relational import hash_join
    from pdf_parser_ray.ops.shuffle import grouped_sum, partitioned_map

    ts_col = order_cols[0]
    us = bucket_seconds * 1_000_000

    def add_bucket(df: pd.DataFrame):
        return arrow_out(
            df.assign(__bucket=df[ts_col].astype("int64") // us)
        )

    tagged = ds.map_batches(add_bucket, batch_format="pandas")

    def local_window(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values([part_col, "__bucket", *order_cols])
        grp = g.groupby([part_col, "__bucket"], sort=False)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                part_col: g[part_col].to_numpy(),
                "__bucket": g["__bucket"].to_numpy(dtype=np.int64),
                "rn_local": (grp.cumcount() + 1).to_numpy(dtype=np.int64),
                # UNROUNDED local sum: rounding happens once, after the
                # offset add, same as the single-pass plan
                "cum_local": grp[val_col].cumsum().to_numpy(dtype=np.float64),
            }
        )

    local = partitioned_map(
        tagged, [part_col, "__bucket"], local_window, **part_kw
    )

    def totals_partial(df: pd.DataFrame):
        g = df.groupby([part_col, "__bucket"], as_index=False).agg(
            cnt=("event_id", "size"), vsum=(val_col, "sum")
        )
        return arrow_out(g.astype({"cnt": "int64", "vsum": "float64"}))

    totals = grouped_sum(
        tagged.map_batches(totals_partial, batch_format="pandas"),
        [part_col, "__bucket"],
        ["cnt", "vsum"],
        **part_kw,
    )

    def offsets_fn(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values([part_col, "__bucket"])
        grp = part.groupby(part_col, sort=False)
        return pd.DataFrame(
            {
                part_col: part[part_col].to_numpy(),
                "__bucket": part["__bucket"].to_numpy(dtype=np.int64),
                "off_cnt": (
                    grp["cnt"].cumsum() - part["cnt"]
                ).to_numpy(dtype=np.int64),
                "off_sum": (
                    grp["vsum"].cumsum() - part["vsum"]
                ).to_numpy(dtype=np.float64),
            }
        )

    offsets = partitioned_map(totals, [part_col], offsets_fn, **part_kw)

    joined = hash_join(local, offsets, on=(part_col, "__bucket"))

    def finalize(df: pd.DataFrame):
        return arrow_out(pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                part_col: df[part_col].astype("int64"),
                "rn": (
                    df["rn_local"].to_numpy(dtype=np.int64)
                    + df["off_cnt"].to_numpy(dtype=np.int64)
                ),
                "cum_value": np.round(
                    df["cum_local"].to_numpy(dtype=np.float64)
                    + df["off_sum"].to_numpy(dtype=np.float64),
                    round_to,
                ),
            }
        ))

    return joined.map_batches(finalize, batch_format="pandas")


def event_type_pivot(
    ds: ray.data.Dataset,
    types: tuple[str, ...] = ("click", "error", "purchase", "signup", "view"),
) -> ray.data.Dataset:
    """Pivot event counts to one wide row per user (n_<type> columns).

    Per-batch crosstab partials (the combiner) shrink the shuffle to one
    row per (user, batch); the groupby sums the partial columns.  The
    type list is an explicit closed set — the schema of a pivot must be
    known up front in a distributed engine (discover it with a separate
    unique() pass when it isn't).

    Output: (user_id, n_click:int64, ..., n_view:int64).
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    cols = [f"n_{t}" for t in types]

    def partial(df: pd.DataFrame):
        ct = pd.crosstab(df["user_id"], df["event_type"])
        ct = ct.reindex(columns=list(types), fill_value=0).astype("int64")
        ct.columns = cols
        return arrow_out(ct.reset_index().astype({"user_id": "int64"}))

    # user_id is a HIGH-cardinality key → co-location sum, not the
    # streaming sort-aggregate (ops/shuffle.grouped_sum rationale;
    # measured 11.9 s → ~3 s at sf0.1/32 for this pivot)
    return grouped_sum(
        ds.map_batches(partial, batch_format="pandas"), ["user_id"], cols
    )


def lag_delta(
    ds: ray.data.Dataset,
    *,
    part_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    val_col: str = "value",
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """LAG window function, delta form: per partition (ordered by
    ``order_cols``), each row's value minus its predecessor's; rows
    with no predecessor are dropped (SQL's ``lag IS NOT NULL``).

    Deltas are differences of two RAW data values (no accumulation), so
    they are bit-identical to a SQL engine with no rounding needed —
    the per-row-ratio rule.  Same bounded-partition co-location and
    cross-user vectorization as :func:`running_window`.

    Output: (event_id, part_col, delta:float64).
    """
    import numpy as np

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values([part_col, *order_cols])
        prev = g.groupby(part_col, sort=False)[val_col].shift()
        keep = prev.notna()
        return pd.DataFrame(
            {
                "event_id": g.loc[keep, "event_id"].to_numpy(),
                part_col: g.loc[keep, part_col].to_numpy(),
                "delta": (
                    g.loc[keep, val_col].to_numpy(dtype=np.float64)
                    - prev[keep].to_numpy(dtype=np.float64)
                ),
            }
        )

    from pdf_parser_ray.ops.shuffle import partitioned_map

    return partitioned_map(
        ds, [part_col], per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def value_histogram(
    ds: ray.data.Dataset,
    *,
    group_col: str = "event_type",
    val_col: str = "value",
    bin_width: float = 100.0,
) -> ray.data.Dataset:
    """Fixed-width value histogram per group: one row per non-empty
    (group, bin), bin = floor(value / bin_width) — the distribution-
    profiling step of a data-quality audit.

    Per-batch partial counts combine BEFORE the shuffle, so the groupby
    moves O(groups × bins × batches) partial rows, never one per event.
    Output: (group_col, bin:int64, n:int64).
    """
    import numpy as np

    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                group_col: df[group_col],
                "bin": np.floor(
                    df[val_col].to_numpy(dtype=np.float64) / bin_width
                ).astype("int64"),
            }
        )
        g = out.groupby([group_col, "bin"], as_index=False).size()
        return g.rename(columns={"size": "n"}).astype({"n": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby([group_col, "bin"])
        .aggregate(Sum("n", alias_name="n"))
    )


def moving_avg(
    ds: ray.data.Dataset,
    *,
    part_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    val_col: str = "value",
    window: int = 3,
    round_to: int = 4,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Frame-based moving average: SQL ``avg(val) OVER (PARTITION BY
    part ORDER BY order_cols ROWS BETWEEN window-1 PRECEDING AND
    CURRENT ROW)``.

    Same bounded-partition co-location as :func:`running_window`; the
    in-partition kernel is one sort + grouped ``rolling(window).mean()``
    (pandas C path, vectorized across users).  The average accumulates
    ≤``window`` raw values but engines may sum them in different orders
    (pandas keeps a sliding sum) — rounded on both sides per the
    cross-row-aggregate rule.

    Output: (event_id, part_col, mov_avg:float64).
    """
    import numpy as np

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values([part_col, *order_cols])
        ma = (
            g.groupby(part_col, sort=False)[val_col]
            .rolling(window, min_periods=1)
            .mean()
            .to_numpy(dtype=np.float64)
        )
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                part_col: g[part_col].to_numpy(),
                "mov_avg": np.round(ma, round_to),
            }
        )

    from pdf_parser_ray.ops.shuffle import partitioned_map

    return partitioned_map(
        ds, [part_col], per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def rank_windows(
    ds: ray.data.Dataset,
    *,
    part_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    val_col: str = "value",
    n_tiles: int = 4,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Ranking window functions per partition, one pass: SQL
    ``ntile(k) OVER (PARTITION BY part ORDER BY order_cols)`` plus
    ``percent_rank()`` / ``cume_dist() OVER (PARTITION BY part ORDER BY
    val)``.

    Semantics pinned to the SQL definitions: NTILE gives the first
    ``n %% k`` tiles one extra row (1-based); percent_rank =
    (rank_min − 1)/(n − 1) with 0 for single-row partitions; cume_dist
    = rank_max/n.  All three divide int64 operands → bit-identical
    doubles cross-engine (no rounding needed).

    Same bounded-partition co-location as :func:`running_window`; the
    kernel vectorizes ACROSS users (one sort, grouped cumcount/rank —
    no Python loop per group).

    Output: (event_id, part_col, tile:int64, pct_rank:float64,
    cume_dist:float64).
    """
    import numpy as np

    k = int(n_tiles)

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values([part_col, *order_cols])
        grp = g.groupby(part_col, sort=False)
        n = grp[val_col].transform("size").to_numpy(dtype=np.int64)
        pos = grp.cumcount().to_numpy(dtype=np.int64)
        base, rem = n // k, n % k
        cut = rem * (base + 1)
        tile = np.where(
            pos < cut,
            pos // np.maximum(base + 1, 1),
            rem + (pos - cut) // np.maximum(base, 1),
        ) + 1
        vgrp = g.groupby(part_col, sort=False)[val_col]
        rmin = vgrp.rank(method="min").to_numpy(dtype=np.float64)
        rmax = vgrp.rank(method="max").to_numpy(dtype=np.float64)
        pct = np.where(n > 1, (rmin - 1.0) / np.maximum(n - 1, 1), 0.0)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                part_col: g[part_col].to_numpy(),
                "tile": tile.astype(np.int64),
                "pct_rank": pct.astype(np.float64),
                "cume_dist": (rmax / n).astype(np.float64),
            }
        )

    from pdf_parser_ray.ops.shuffle import partitioned_map

    return partitioned_map(
        ds, [part_col], per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def dense_value_ranks(
    ds: ray.data.Dataset,
    *,
    group_col: str = "event_type",
    val_col: str = "value",
    k: int = 3,
) -> ray.data.Dataset:
    """Rows whose value is among the k highest DISTINCT values of their
    group, with the dense rank — SQL ``dense_rank() OVER (PARTITION BY
    group ORDER BY val DESC) <= k``.

    Scale shape: a row can hold global dense rank ≤ k only if it holds
    batch-local dense rank ≤ k (more distinct greater values locally ⇒
    more globally), so each batch prunes to its local rank-≤k rows
    (vectorized ``groupby.rank(method="dense")``) and only that bounded
    stream (≤ k·batches rows + ties) reaches the final per-group pass,
    which recomputes ranks over the survivors.  Group count is small
    here; for corpus-cardinality groups route the final pass through
    ``ops.shuffle.grouped_map``.

    Output: (group_col, event_id, value, rank:int64).
    """
    import numpy as np

    def local_ranks(df: pd.DataFrame) -> pd.DataFrame:
        r = df.groupby(group_col, sort=False)[val_col].rank(
            method="dense", ascending=False
        )
        out = df[df.columns.intersection([group_col, "event_id", val_col])]
        out = out.loc[r <= k].copy()
        out["rank"] = r[r <= k].to_numpy(dtype=np.int64)
        return out[[group_col, "event_id", val_col, "rank"]]

    def final(g: pd.DataFrame) -> pd.DataFrame:
        r = g[val_col].rank(method="dense", ascending=False)
        out = g.loc[r <= k, [group_col, "event_id", val_col]].copy()
        out["rank"] = r[r <= k].to_numpy(dtype=np.int64)
        return out

    partials = ds.map_batches(local_ranks, batch_format="pandas")
    return partials.groupby(group_col).map_groups(final, batch_format="pandas")


def grouped_dispersion(
    ds: ray.data.Dataset,
    *,
    group_col: str = "event_type",
    val_col: str = "value",
    ts_col: str = "ts",
    round_to: int = 6,
) -> ray.data.Dataset:
    """Per-group sample standard deviation of ``val`` and Pearson
    correlation of (``val``, event time) from mergeable moment sums
    (n, Σx, Σx², Σt, Σt², Σxt) — the partial-aggregation form of
    ``stddev_samp`` / ``corr``.

    Timestamps are centered to float days before squaring so the moment
    sums stay ~1e2-magnitude and the variance subtraction loses no
    precision (correlation is shift/scale-invariant, so a SQL twin can
    use raw ``epoch(ts)``).  Both outputs are cross-row float
    aggregates → rounded.

    Output: (group_col, n:int64, sd_value:float64, corr_vt:float64).
    """
    import numpy as np

    from ray.data.aggregate import Sum

    epoch = pd.Timestamp("2024-01-01")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df[val_col].to_numpy(dtype=np.float64)
        t = (df[ts_col] - epoch).dt.total_seconds().to_numpy(dtype=np.float64) / 86400.0
        m = pd.DataFrame(
            {
                group_col: df[group_col],
                "n": np.int64(1),
                "sx": x,
                "sx2": x * x,
                "st": t,
                "st2": t * t,
                "sxt": x * t,
            }
        )
        return m.groupby(group_col, as_index=False).sum().astype({"n": "int64"})

    moment_cols = ["n", "sx", "sx2", "st", "st2", "sxt"]
    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group_col)
        .aggregate(*[Sum(c, alias_name=c) for c in moment_cols])
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.float64)
        ssx = df["sx2"] - df["sx"] ** 2 / n   # n·var(x), uncorrected
        var_t = df["st2"] - df["st"] ** 2 / n
        cov = df["sxt"] - df["sx"] * df["st"] / n
        # SQL NULL semantics: stddev_samp needs n≥2; corr needs both
        # variances > 0 (single-row or constant groups would otherwise
        # emit 0/0 warnings, NaN-by-accident, or inf from cov/√0).
        with np.errstate(divide="ignore", invalid="ignore"):
            sd = np.where(n >= 2, np.sqrt(ssx / (n - 1.0)), np.nan)
            denom2 = ssx * var_t
            corr = np.where(denom2 > 0, cov / np.sqrt(denom2), np.nan)
        return pd.DataFrame(
            {
                group_col: df[group_col],
                "n": df["n"].astype("int64"),
                "sd_value": np.round(sd, round_to),
                "corr_vt": np.round(corr, round_to),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def above_group_avg(
    ds: ray.data.Dataset,
    *,
    group_col: str = "event_type",
    val_col: str = "value",
) -> ray.data.Dataset:
    """Correlated-scalar-subquery shape: rows with ``val`` above their
    group's average, aggregated per group — two passes, no self-join.

    Pass 1 computes per-group averages (partial sums → tiny groupby →
    driver-sized frame); the thresholds are broadcast into pass 2's
    filter.  The threshold is FLOORED to 4 dp on both sides: floor is
    the one rounding both engines agree on bit-for-bit, and the last-ulp
    summation-order difference between engines cannot flip it off a
    boundary.

    Output: (group_col, n_above:int64, sum_above:float64 rounded 2).
    """
    import numpy as np
    import ray as _ray

    from ray.data.aggregate import Sum

    def sums(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col, as_index=False).agg(
            sx=(val_col, "sum"), n=(val_col, "size")
        )
        return g.astype({"n": "int64"})

    avg_df = (
        ds.map_batches(sums, batch_format="pandas")
        .groupby(group_col)
        .aggregate(Sum("sx", alias_name="sx"), Sum("n", alias_name="n"))
        .to_pandas()  # group-cardinality rows — driver-sized
    )
    thresholds = {
        r[group_col]: np.floor(r["sx"] / r["n"] * 1e4) / 1e4
        for _, r in avg_df.iterrows()
    }
    ref = _ray.put(thresholds)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        th = worker_state(("above_avg", ref.hex()), lambda: _ray.get(ref))
        bar = df[group_col].map(th).to_numpy(dtype=np.float64)
        keep = df[df[val_col].to_numpy(dtype=np.float64) > bar]
        g = keep.groupby(group_col, as_index=False).agg(
            n_above=(val_col, "size"), sum_above=(val_col, "sum")
        )
        return g.astype({"n_above": "int64"})

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group_col)
        .aggregate(Sum("n_above", alias_name="n_above"), Sum("sum_above", alias_name="sum_above"))
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_above"] = df["n_above"].astype("int64")
        df["sum_above"] = np.round(df["sum_above"].astype("float64"), 2)
        return df

    return agg.map_batches(finish, batch_format="pandas")


def first_last_value(
    ds: ray.data.Dataset,
    *,
    part_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    val_col: str = "value",
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Per-partition FIRST_VALUE/LAST_VALUE — each user's earliest and
    latest event value under a TOTAL order (``order_cols`` must end in
    a unique column so ties cannot make the answer engine-dependent).

    This is the mergeable argmin/argmax pattern: each batch reduces to
    at most TWO rows per user present (its local extremes, one sort +
    head/tail per group), so the co-locating shuffle carries ≤
    2·batches rows per user no matter how many events a power user has
    — skew-immune without salting.  The final pass applies the same
    kernel across whole hash partitions (no per-user task overhead).

    Output: (part_col, first_value:float64, last_value:float64).
    """

    order = list(order_cols)
    cols = [part_col, *order, val_col]

    def local_extremes(df: pd.DataFrame) -> pd.DataFrame:
        s = df[cols].sort_values([part_col, *order], kind="mergesort")
        g = s.groupby(part_col, sort=False)
        return pd.concat([g.head(1), g.tail(1)]).drop_duplicates()

    def finish(part: pd.DataFrame) -> pd.DataFrame:
        s = part.sort_values([part_col, *order], kind="mergesort")
        g = s.groupby(part_col, sort=False)
        first = g.head(1).set_index(part_col)[val_col]
        last = g.tail(1).set_index(part_col)[val_col]
        return pd.DataFrame(
            {
                part_col: first.index,
                "first_value": first.to_numpy(dtype="float64"),
                "last_value": last.to_numpy(dtype="float64"),
            }
        )

    from pdf_parser_ray.ops.shuffle import partitioned_map

    partial = ds.map_batches(local_extremes, batch_format="pandas")
    return partitioned_map(
        partial, [part_col], finish,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def grouped_mode(
    ds: ray.data.Dataset,
    *,
    group_col: str = "event_type",
    val_col: str = "user_id",
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Statistical mode per group — the most frequent ``val_col`` with
    a deterministic (count DESC, value ASC) tie-break.

    Two mergeable stages: per-batch (group, value) counts collapse each
    batch before the shuffle, one bounded co-locating pass sums counts
    and picks the winner per group across whole partitions.  The
    shuffle carries distinct (group, value) pairs, never raw rows.

    Output: (group_col, val_col, n:int64) — one row per group.
    """

    def local_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby([group_col, val_col], as_index=False).size()
        return out.rename(columns={"size": "n"}).astype({"n": "int64"})

    def pick(part: pd.DataFrame) -> pd.DataFrame:
        merged = part.groupby([group_col, val_col], as_index=False)["n"].sum()
        s = merged.sort_values(
            [group_col, "n", val_col], ascending=[True, False, True],
            kind="mergesort",
        )
        return s.groupby(group_col, sort=False).head(1).astype({"n": "int64"})

    from pdf_parser_ray.ops.shuffle import partitioned_map

    partial = ds.map_batches(local_counts, batch_format="pandas")
    return partitioned_map(
        partial, [group_col], pick,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def grouped_concat(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    order_col: str = "doc_id",
    val_col: str = "lang",
    sep: str = ",",
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Ordered grouped string concatenation — SQL
    ``string_agg(val, sep ORDER BY order_col)`` per group.

    Order-sensitive concatenation cannot pre-merge across batches
    without carrying fragment boundaries, so the whole (pruned!)
    triple column set co-locates by hashed group and one vectorized
    sort + groupby-join per partition produces the strings.  Prune to
    exactly (group, order, val) in the caller — the op never ships
    payload columns.

    Output: (group_col, vals:string) — one row per group.
    """

    def concat(part: pd.DataFrame) -> pd.DataFrame:
        s = part.sort_values([group_col, order_col], kind="mergesort")
        out = s.groupby(group_col, sort=False)[val_col].agg(sep.join)
        return pd.DataFrame({group_col: out.index, "vals": out.to_numpy()})

    from pdf_parser_ray.ops.shuffle import partitioned_map

    return partitioned_map(
        ds.select_columns([group_col, order_col, val_col]),
        [group_col],
        concat,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def funnel_counts(
    ds: "ray.data.Dataset",
    stages: list[str],
    *,
    by: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Sequential-funnel analysis: how many users reached each stage IN
    ORDER (stage i+1 strictly after the user's FIRST stage-i event) —
    the product-analytics conversion query.

    Distributed shape: rows prune to the funnel's event types and three
    columns at the batch, then ONE bounded-partition co-location by
    user; inside a partition the frontier walk is vectorized ACROSS
    users (one groupby-min merge chain per stage, no per-user loop) and
    each partition emits ≤ len(stages) partial rows into a tiny final
    aggregate.

    Output: (stage:string, stage_idx:int64, n_users:int64), one row per
    stage, n_users non-increasing down the funnel.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    stage_list = list(stages)
    wanted = set(stage_list)

    def prune(df: pd.DataFrame) -> "object":
        m = df[df[type_col].isin(wanted)]
        return arrow_out(
            pd.DataFrame(
                {
                    by: m[by].to_numpy(),
                    ts_col: m[ts_col].to_numpy(),
                    type_col: m[type_col].to_numpy(),
                }
            )
        )

    pruned = ds.map_batches(prune, batch_format="pandas")

    def partition_counts(part: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros(len(stage_list), dtype=np.int64)
        # frontier: per-user timestamp of the FIRST qualifying event of
        # the previous stage; stage 0's gate is -inf (no constraint)
        frontier = None  # pd.Series indexed by user
        for i, stage in enumerate(stage_list):
            ev = part[part[type_col] == stage]
            if frontier is not None:
                gate = ev[by].map(frontier)
                ev = ev[gate.notna().to_numpy()
                        & (ev[ts_col].to_numpy() > gate.to_numpy())]
            if len(ev) == 0:
                break
            frontier = ev.groupby(by)[ts_col].min()
            counts[i] = len(frontier)
        return pd.DataFrame(
            {
                "stage": stage_list,
                "stage_idx": np.arange(len(stage_list), dtype=np.int64),
                "n_users": counts,
            }
        )

    partials = partitioned_map(
        pruned, [by], partition_counts,
        **({"n_parts": n_parts} if n_parts else {}),
    )
    agg = (
        partials.groupby(["stage", "stage_idx"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "stage": df["stage"],
                "stage_idx": df["stage_idx"].astype("int64"),
                "n_users": df["n_users"].astype("int64"),
            }
        )

    return agg.map_batches(cast, batch_format="pandas").sort("stage_idx")


def time_weighted_avg(
    ds: "ray.data.Dataset",
    *,
    part_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Time-weighted average per partition: each value holds until the
    NEXT event, so it weighs by that interval (the last event of a
    partition has no interval and contributes nothing — SQL's
    ``lead(ts) IS NOT NULL``).  The signal-processing mean for
    irregularly-sampled telemetry.

    Same bounded-partition co-location as :func:`running_window`;
    inside a partition the lead is one vectorized groupby-shift across
    users.  EXACT arithmetic end-to-end: values are 2-dp (cents) and
    timestamps are integer microseconds, so Σ(value_cents·Δt_µs) and
    Σ(Δt_µs) are exact int64 sums in ANY order — the final
    twa = (num/den)/100 is one division of identical operands on both
    engines, no rounding contract needed.  Overflow bound:
    ~9e18 / (5e4 cents × 2.6e9 µs-month) ≈ 70k events/user/month.

    Output: (part_col, twa:float64), partitions with ≥2 events only.
    """
    import numpy as np

    from pdf_parser_ray.ops.shuffle import partitioned_map

    pruned = ds.select_columns([part_col, ts_col, val_col])

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        # (ts, value) order: a bare ts ORDER BY is ambiguous on tied
        # timestamps and the tie-pair's interval would attach to an
        # engine-dependent value
        part = part.sort_values([part_col, ts_col, val_col], kind="mergesort")
        nxt = part.groupby(part_col, sort=False)[ts_col].shift(-1)
        has_next = nxt.notna().to_numpy()
        m = part[has_next]
        if len(m) == 0:
            return pd.DataFrame({
                part_col: pd.Series([], dtype=part[part_col].dtype),
                "twa": pd.Series([], dtype="float64")})
        dt_us = (
            nxt[has_next].to_numpy("datetime64[us]").astype("int64")
            - m[ts_col].to_numpy("datetime64[us]").astype("int64")
        )
        cents = np.rint(m[val_col].to_numpy(dtype=np.float64) * 100.0).astype(
            np.int64
        )
        g = (
            pd.DataFrame({
                part_col: m[part_col].to_numpy(),
                "num": cents * dt_us,
                "den": dt_us,
            })
            .groupby(part_col, as_index=False)[["num", "den"]]
            .sum()
        )
        # every row of a user lands in exactly ONE partition, so the
        # per-user sums here are already complete — emit the final
        # ratio directly instead of paying a second groupby shuffle
        return pd.DataFrame({
            part_col: g[part_col],
            "twa": (g["num"].to_numpy(dtype=np.float64)
                    / g["den"].to_numpy(dtype=np.float64)) / 100.0,
        })

    return partitioned_map(
        pruned, [part_col], per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def time_range_sum(
    ds: "ray.data.Dataset",
    *,
    window_s: int = 3600,
    part_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Time-RANGE window frame: per row, the sum of ``val_col`` over the
    partition's trailing ``window_s`` seconds — SQL's ``RANGE BETWEEN
    INTERVAL .. PRECEDING AND CURRENT ROW`` (the frame :func:`moving_avg`'s
    ROWS frame cannot express: it follows the CLOCK, not row counts).

    One bounded-partition co-location; inside, the whole partition is
    vectorized with NO per-user loop: rows sort once by (user, ts), a
    composite int64 key (user_rank << span_bits | Δts_µs) makes ONE
    searchsorted call resolve every row's frame boundaries, and the
    frame sum is two prefix-sum lookups.  RANGE-frame peer semantics
    (ties on ts include ALL peers, even later-sorted ones) come from
    the side='right' upper bound.  Values sum as exact int64 cents —
    bit-identical, no rounding contract.

    Assumes user_rank × time-span fits int64: span_bits = 44 allows a
    ~557-year µs span and ~1 M distinct users per partition (partition
    count controls the latter at scale).

    Output: (id_col, part_col, win_sum:float64).
    """
    import numpy as np

    from pdf_parser_ray.ops.shuffle import partitioned_map

    span_bits = np.int64(44)
    win_us = np.int64(window_s) * 1_000_000

    pruned = ds.select_columns([id_col, part_col, ts_col, val_col])

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values([part_col, ts_col, id_col], kind="mergesort")
        ts = part[ts_col].to_numpy("datetime64[us]").astype("int64")
        users = part[part_col].to_numpy()
        # dense user rank in sorted order (users are contiguous)
        new_user = np.empty(len(part), dtype=bool)
        new_user[:1] = True
        new_user[1:] = users[1:] != users[:-1]
        rank = np.cumsum(new_user) - 1
        dt = ts - (ts.min() if len(ts) else 0)
        if len(dt) and dt.max() >= (1 << int(span_bits)):
            raise ValueError("time span exceeds the composite-key budget")
        key = (rank.astype("int64") << span_bits) | dt
        cents = np.rint(part[val_col].to_numpy(dtype=np.float64) * 100.0).astype(
            np.int64
        )
        prefix = np.concatenate([[0], np.cumsum(cents)])
        lo = np.searchsorted(key, (rank << span_bits) | np.maximum(dt - win_us, 0), side="left")
        hi = np.searchsorted(key, key, side="right")
        win_cents = prefix[hi] - prefix[lo]
        return pd.DataFrame(
            {
                id_col: part[id_col].to_numpy(),
                part_col: users,
                "win_sum": win_cents.astype(np.float64) / 100.0,
            }
        )

    return partitioned_map(
        pruned, [part_col], per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def dedup_events_in_window(
    ds: "ray.data.Dataset",
    *,
    window_s: int = 3600,
    by: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    id_col: str = "event_id",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Streaming idempotency filter: within each ``by`` key, drop an
    event if the PREVIOUS KEPT event is less than ``window_s`` ago —
    the at-most-once-per-interval rule a retry-prone event firehose
    needs before counting anything.

    Note the kept-anchor semantics (a suppressed event does NOT extend
    the window — events at t, t+0.7h, t+1.4h keep t and t+1.4h): this
    is the rate-limiter rule, strictly stronger than a lag()-based
    filter.  The dependency is sequential per key, but the greedy
    anchor walk vectorizes ACROSS keys: wave r finds every key's r-th
    kept event with ONE searchsorted over the composite (key_rank,
    Δts) int64 key — rounds = max kept-events per key, each round
    O(active keys · log n), no per-key Python loop.

    Output: the kept rows (id_col, *by, ts_col), same dtypes.
    """
    import numpy as np

    from pdf_parser_ray.ops.shuffle import partitioned_map

    key_list = list(by)
    span_bits = np.int64(44)

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values([*key_list, ts_col, id_col], kind="mergesort")
        n = len(part)
        if n == 0:
            return part
        ts = part[ts_col].to_numpy("datetime64[us]").astype("int64")
        win = np.int64(window_s) * 1_000_000
        keys = pd.util.hash_pandas_object(
            part[key_list], index=False
        ).to_numpy()
        new_key = np.empty(n, dtype=bool)
        new_key[:1] = True
        new_key[1:] = keys[1:] != keys[:-1]
        rank = np.cumsum(new_key) - 1
        dt = ts - ts.min()
        if dt.max() >= (1 << int(span_bits)):
            raise ValueError("time span exceeds the composite-key budget")
        K = (rank.astype("int64") << span_bits) | dt
        seg_end = np.concatenate([np.nonzero(new_key)[0][1:], [n]])[rank]
        kept = np.zeros(n, dtype=bool)
        # wave 0: the first event of every key is kept
        cur = np.nonzero(new_key)[0]
        while len(cur):
            kept[cur] = True
            # next kept of each active key: first event with
            # ts >= kept_ts + win inside the key's segment.  Arithmetic
            # ADD (not OR): when dt+win exceeds the span budget the
            # carry pushes the target past this key's whole range and
            # the seg_end check below discards it — no false match on
            # a clamped boundary value.
            target = (rank[cur].astype("int64") << span_bits) + dt[cur] + win
            nxt = np.searchsorted(K, target, side="left")
            cur = nxt[nxt < seg_end[cur]]
        return part[kept]

    pruned = ds.select_columns([id_col, *key_list, ts_col])
    return partitioned_map(
        pruned, key_list, per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def cooccurrence_counts(
    ds: "ray.data.Dataset",
    *,
    by: str = "user_id",
    item_col: str = "event_type",
    max_items_per_key: int = 256,
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Item co-occurrence (market-basket) counts: for every unordered
    item pair, how many keys exhibit BOTH — the association-mining /
    recommender-co-visitation primitive.

    Shape: per-batch (key, item) dedup shrinks the stream to distinct
    pairs, ONE co-location by key, then each key's item set explodes to
    C(items, 2) pairs — capped at ``max_items_per_key`` (a key with
    thousands of distinct items is a bot; the cap bounds the quadratic
    term and is logged in the output contract).  The final groupby runs
    at item-pair cardinality.

    Output: (t1, t2, n_keys:int64), t1 < t2.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    def dedup_batch(df: pd.DataFrame) -> "object":
        return arrow_out(
            df[[by, item_col]].drop_duplicates()
        )

    def pairs_per_partition(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop_duplicates([by, item_col])
        t1s: list = []
        t2s: list = []
        for _, g in part.groupby(by, sort=False):
            items = sorted(g[item_col])[:max_items_per_key]
            m = len(items)
            for i in range(m):
                for j in range(i + 1, m):
                    t1s.append(items[i])
                    t2s.append(items[j])
        out = pd.DataFrame({"t1": t1s, "t2": t2s})
        if len(out) == 0:
            return pd.DataFrame({
                "t1": pd.Series([], dtype=str),
                "t2": pd.Series([], dtype=str),
                "n_keys": pd.Series([], dtype="int64")})
        g = out.groupby(["t1", "t2"], as_index=False).size()
        return g.rename(columns={"size": "n_keys"}).astype({"n_keys": "int64"})

    deduped = ds.map_batches(dedup_batch, batch_format="pandas")
    partials = partitioned_map(
        deduped, [by], pairs_per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )
    agg = partials.groupby(["t1", "t2"]).aggregate(
        Sum("n_keys", alias_name="n_keys")
    )

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "t1": df["t1"], "t2": df["t2"],
            "n_keys": df["n_keys"].astype("int64")})

    return agg.map_batches(cast, batch_format="pandas")


def retention_cohorts(
    ds: "ray.data.Dataset",
    *,
    by: str = "user_id",
    ts_col: str = "ts",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Retention-triangle counts: users grouped by FIRST-active day
    (their cohort), counted per day-offset they return — the
    product-analytics cohort table.

    One co-location by user does everything: per partition, each user's
    first day and distinct activity days reduce to (cohort_day,
    day_offset) partial counts — the emitted stream is bounded by
    distinct (user, day) pairs, and the final groupby runs at
    triangle cardinality (days × offsets), tiny.

    Output: (cohort_day:timestamp[us], day_offset:int64, n_users:int64).
    """
    import numpy as np
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        days = part[ts_col].dt.floor("D")
        ud = pd.DataFrame({by: part[by].to_numpy(), "day": days.to_numpy()})
        ud = ud.drop_duplicates()
        first = ud.groupby(by, sort=False)["day"].transform("min")
        offs = ((ud["day"] - first).dt.days).astype("int64")
        g = (
            pd.DataFrame({"cohort_day": first.to_numpy(),
                          "day_offset": offs.to_numpy()})
            .groupby(["cohort_day", "day_offset"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )
        return arrow_out(g.astype({"day_offset": "int64", "n_users": "int64"}))

    partials = partitioned_map(
        ds.select_columns([by, ts_col]), [by], per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )
    agg = partials.groupby(["cohort_day", "day_offset"]).aggregate(
        Sum("n_users", alias_name="n_users")
    )

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cohort_day": df["cohort_day"],
            "day_offset": df["day_offset"].astype("int64"),
            "n_users": df["n_users"].astype("int64")})

    return agg.map_batches(cast, batch_format="pandas")


def assign_sessions(
    ds: "ray.data.Dataset",
    gap_seconds: int = 1800,
    *,
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Per-event session labels — the row-level twin of
    :func:`sessionize`: each event gets its user's running session
    ordinal (1-based; a new session starts after ``gap_seconds`` of
    inactivity).  The label every downstream session-scoped aggregate
    joins on.

    Same bounded-partition co-location; the label is one vectorized
    gap-flag cumsum across the whole partition (exact integer counts —
    no float contract at all).

    Output: (event_id, user_id, session_id:int64).
    """

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["user_id", "ts", "event_id"])
        new_sess = (
            ~part["user_id"].eq(part["user_id"].shift())
        ) | (part["ts"].diff().dt.total_seconds() > gap_seconds)
        # per-user running count of session starts = session ordinal;
        # cumsum resets implicitly because new_sess is True at every
        # user boundary and groupby-cumsum scopes the sum per user
        sid = (
            part.assign(__ns=new_sess.astype("int64"))
            .groupby("user_id", sort=False)["__ns"]
            .cumsum()
        )
        return pd.DataFrame(
            {
                "event_id": part["event_id"].to_numpy(),
                "user_id": part["user_id"].to_numpy(),
                "session_id": sid.to_numpy(dtype="int64"),
            }
        )

    from pdf_parser_ray.ops.shuffle import partitioned_map

    return partitioned_map(
        ds.select_columns(["event_id", "user_id", "ts"]),
        ["user_id"],
        per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def late_events(
    ds: "ray.data.Dataset",
    *,
    lateness_seconds: int = 3600,
    key: str = "user_id",
    order_col: str = "event_id",
    ts_col: str = "ts",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Watermark-style late-arrival flags — the streaming-ingest gate
    that decides whether an event may still update closed windows.

    ``order_col`` is the ARRIVAL order (monotone ingest sequence; here
    event_id), ``ts_col`` the EVENT time.  A row is late when its event
    time has fallen more than ``lateness_seconds`` behind the per-key
    watermark, i.e. the max event time among STRICTLY EARLIER arrivals
    of the same key (exclusive running max — an event never makes
    itself late; the first arrival per key is never late).

    Same bounded-partition co-location as :func:`assign_sessions`; the
    watermark is one grouped cummax + shift across the whole partition.
    All comparisons happen in exact epoch-microsecond int64 — no float
    contract.

    Output: (event_id, user_id, is_late:bool).
    """
    late_us = int(lateness_seconds) * 1_000_000

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values([key, order_col])
        ts_us = part[ts_col].astype("datetime64[us]").astype("int64")
        # exclusive running max per key: cummax then shift, both
        # cythonized groupby kernels — no per-key Python
        frame = pd.DataFrame(
            {key: part[key].to_numpy(), "__t": ts_us.to_numpy()}
        )
        grp = frame.groupby(key, sort=False)["__t"]
        wm = grp.cummax().groupby(frame[key], sort=False).shift(1)
        is_late = frame["__t"].to_numpy() < (wm.to_numpy() - late_us)
        return pd.DataFrame(
            {
                "event_id": part[order_col].to_numpy(),
                key: part[key].to_numpy(),
                "is_late": is_late,  # NaN watermark compares False
            }
        )

    from pdf_parser_ray.ops.shuffle import partitioned_map

    return partitioned_map(
        ds.select_columns([order_col, key, ts_col]),
        [key],
        per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def scd2_history(
    ds: "ray.data.Dataset",
    *,
    key: str = "user_id",
    attr: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    sentinel: str = "2100-01-01",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """SCD-type-2 history build: collapse a change log into effective-
    dated intervals — the warehouse-dimension shape (one row per
    (key, attr-run) with [effective_from, effective_to) validity; the
    current version carries the ``sentinel`` end date).

    Consecutive rows of one key with the SAME attribute value merge
    into one interval; a row opens a new interval only when its value
    differs from the key's previous row in (ts, tiebreak) order.

    One co-locating shuffle; change detection and interval closing are
    whole-partition vectorized shifts (no per-key loop).  Timestamps
    stay µs-exact; the only comparison is string equality.

    Output: (key, attr, effective_from, effective_to) as timestamp[us].
    """

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        part = part.sort_values([key, ts_col, tiebreak])
        k = part[key].to_numpy()
        v = part[attr].to_numpy()
        new_key = np.empty(len(part), dtype=bool)
        if len(part):
            new_key[0] = True
            new_key[1:] = k[1:] != k[:-1]
        changed = new_key.copy()
        if len(part) > 1:
            changed[1:] |= v[1:] != v[:-1]
        kept = part[changed]
        ts = kept[ts_col].astype("datetime64[us]")
        # interval close = next change of the SAME key, else sentinel
        nxt = ts.shift(-1)
        kk = kept[key].to_numpy()
        last_of_key = np.empty(len(kept), dtype=bool)
        if len(kept):
            last_of_key[-1] = True
            last_of_key[:-1] = kk[:-1] != kk[1:]
        nxt = nxt.where(~last_of_key, pd.Timestamp(sentinel))
        return pd.DataFrame(
            {
                key: kk,
                attr: kept[attr].to_numpy(),
                "effective_from": ts.to_numpy().astype("datetime64[us]"),
                "effective_to": nxt.to_numpy().astype("datetime64[us]"),
            }
        )

    from pdf_parser_ray.ops.shuffle import partitioned_map

    return partitioned_map(
        ds.select_columns([key, attr, ts_col, tiebreak]),
        [key],
        per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def transition_counts(
    ds: ray.data.Dataset,
    *,
    part_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    type_col: str = "event_type",
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """First-order Markov transition counts: for each partition (user)
    ordered by ``order_cols``, count consecutive (prev_type, next_type)
    pairs across the whole corpus — the session-path / clickstream
    transition-matrix builder.

    Shape: one user co-location shuffle (transitions need adjacent
    events of a user in one place), then the per-partition kernel
    REDUCES to ≤ |types|² partial rows before the final groupby — the
    second shuffle moves O(types² × partitions) rows, never one per
    event.  Vectorized across users inside each partition (one sort,
    one shift, one C-speed groupby — no Python per-user loop).

    Output: (prev_type, next_type, n:int64).
    """
    from ray.data.aggregate import Sum

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values([part_col, *order_cols])
        prev = g.groupby(part_col, sort=False)[type_col].shift()
        keep = prev.notna()
        pairs = pd.DataFrame(
            {"prev_type": prev[keep], "next_type": g.loc[keep, type_col]}
        )
        out = pairs.groupby(["prev_type", "next_type"], as_index=False).size()
        return out.rename(columns={"size": "n"}).astype({"n": "int64"})

    from pdf_parser_ray.ops.shuffle import partitioned_map

    partial = partitioned_map(
        ds.select_columns([part_col, *order_cols, type_col]),
        [part_col],
        per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )
    return (
        partial.groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def grouped_entropy(
    ds: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    cat_col: str = "event_type",
    round_to: int = 6,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Shannon entropy (bits) of each key's categorical distribution —
    the behavioral-diversity / anomaly feature (bots have near-zero
    entropy, scripted sweeps near-uniform).

    Per-batch (key, cat) partial counts combine BEFORE the shuffle, so
    the co-location moves O(distinct pairs) rows — bounded by
    |keys| × |cats|, never one per event.  Entropy sums ≤ |cats| terms
    per key; the cross-row float sum is rounded on BOTH engines per the
    driver contract (``+ 0.0`` folds the ``-0.0`` a single-category key
    produces into ``0.0`` so value hashes agree).

    Output: (key_col, n_events:int64, entropy_bits:float64).
    """
    import numpy as np

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([key_col, cat_col], as_index=False).size()
        return g.rename(columns={"size": "n"}).astype({"n": "int64"})

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        # second-level combine: partials for one (key, cat) from many
        # batches collapse first, then entropy across ≤ |cats| rows
        c = part.groupby([key_col, cat_col], as_index=False)["n"].sum()
        tot = c.groupby(key_col)["n"].transform("sum")
        p = c["n"].to_numpy(dtype=np.float64) / tot.to_numpy(dtype=np.float64)
        c["__term"] = -p * np.log2(p)
        out = c.groupby(key_col, as_index=False).agg(
            n_events=("n", "sum"), entropy_bits=("__term", "sum")
        )
        out["entropy_bits"] = np.round(out["entropy_bits"], round_to) + 0.0
        return out.astype({"n_events": "int64"})

    from pdf_parser_ray.ops.shuffle import partitioned_map

    partial = ds.select_columns([key_col, cat_col]).map_batches(
        pair_counts, batch_format="pandas"
    )
    return partitioned_map(
        partial, [key_col], per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def conversion_lag(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    from_type: str = "view",
    to_type: str = "purchase",
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Time-to-convert: per user, seconds from the FIRST ``from_type``
    event to the first ``to_type`` event at-or-after it — the funnel
    latency metric.  Users who never saw ``from_type`` or never
    converted after it are dropped.

    The pre-shuffle combiner keeps per (user) only the per-batch min
    ``from_type`` timestamp and the ≤64 earliest ``to_type`` timestamps
    (more than enough: only the first ``to_type`` ≥ the global min
    ``from_type`` can win, and per-batch candidates below another
    batch's min are discarded at merge).  To stay EXACT with an
    unbounded cap the combiner keeps the min ``to_type`` too — a later
    batch can only lower the ``from`` min, which only widens the
    candidate set; so the merge re-derives the answer from (min_from,
    all candidate to-timestamps ≥ own-batch min).  Simpler and still
    exact: ship per batch the min ``from`` ts and ALL ``to`` ts minima
    per user per batch (≤ one row per user per batch per type) — the
    shuffle moves O(users × batches) rows, never one per event.

    Output: (user_col, lag_s:int64) — exact integer microsecond floor
    to whole seconds, bit-identical to SQL ``epoch`` difference.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        f = df[df[type_col] == from_type]
        t = df[df[type_col] == to_type]
        # per-batch: min 'from' per user; ALL 'to' rows collapse to the
        # per-batch sorted set of candidate minima — but a 'to' below
        # the eventual global min-'from' can still matter only if no
        # later 'to' exists, so keep every per-batch 'to' timestamp
        # that is >= the batch's own per-user min 'to' (i.e. just the
        # per-user sorted 'to' list compressed to unique values).
        fmin = (
            f.groupby(user_col, as_index=False)[ts_col]
            .min()
            .assign(kind="f")
        )
        tvals = (
            t[[user_col, ts_col]]
            .drop_duplicates()
            .assign(kind="t")
        )
        return pd.concat([fmin, tvals], ignore_index=True)

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        f = part[part["kind"] == "f"]
        t = part[part["kind"] == "t"]
        fmin = f.groupby(user_col)[ts_col].min()
        tt = t.merge(fmin.rename("fmin"), left_on=user_col, right_index=True)
        tt = tt[tt[ts_col] >= tt["fmin"]]
        if len(tt) == 0:
            return pd.DataFrame(
                {user_col: pd.Series([], dtype="int64"),
                 "lag_s": pd.Series([], dtype="int64")}
            )
        g = tt.groupby(user_col, as_index=False).agg(
            tmin=(ts_col, "min"), fmin=("fmin", "first")
        )
        lag = (
            g["tmin"].astype("datetime64[us]").astype("int64")
            - g["fmin"].astype("datetime64[us]").astype("int64")
        ) // 1_000_000
        return pd.DataFrame(
            {user_col: g[user_col].astype("int64"), "lag_s": lag.astype("int64")}
        )

    from pdf_parser_ray.ops.shuffle import partitioned_map

    partials = ds.select_columns([user_col, type_col, ts_col]).map_batches(
        partial, batch_format="pandas"
    )
    return partitioned_map(
        partials, [user_col], per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def session_spans(
    ds: "ray.data.Dataset",
    gap_seconds: int = 1800,
    *,
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Session TABLE (one row per session) — the gaps-and-islands
    rollup of :func:`assign_sessions`: per (user, session ordinal) the
    span start/end, event count and whole-second duration.  The shape
    every engagement metric joins against (session length
    distributions, bounce detection, dwell-time models).

    Same single user co-location shuffle; the island assignment and
    the per-session aggregate both happen vectorized inside the
    partition, so output rows (sessions) never exceed input rows.
    Durations are exact integer microsecond floor-divisions — no float
    contract.

    Output: (user_id, session_idx:int64, start_ts, end_ts,
    n_events:int64, duration_s:int64).
    """

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["user_id", "ts", "event_id"])
        new_sess = (
            ~part["user_id"].eq(part["user_id"].shift())
        ) | (part["ts"].diff().dt.total_seconds() > gap_seconds)
        sid = (
            part.assign(__ns=new_sess.astype("int64"))
            .groupby("user_id", sort=False)["__ns"]
            .cumsum()
        )
        g = (
            part.assign(session_idx=sid.to_numpy())
            .groupby(["user_id", "session_idx"], as_index=False)
            .agg(start_ts=("ts", "min"), end_ts=("ts", "max"),
                 n_events=("ts", "size"))
        )
        dur = (
            g["end_ts"].astype("datetime64[us]").astype("int64")
            - g["start_ts"].astype("datetime64[us]").astype("int64")
        ) // 1_000_000
        return g.assign(duration_s=dur).astype(
            {"session_idx": "int64", "n_events": "int64", "duration_s": "int64"}
        )

    from pdf_parser_ray.ops.shuffle import partitioned_map

    return partitioned_map(
        ds.select_columns(["event_id", "user_id", "ts"]),
        ["user_id"],
        per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def user_acquisition(ds: "ray.data.Dataset") -> pd.DataFrame:
    """User-acquisition curve: per day, how many users had their FIRST
    EVER event that day, plus the running total — the growth metric of
    any event stream.

    argmin combiner: per-batch min ts per user (one row per user per
    batch) → co-located exact min per user → per-day counts (bounded
    by the time range) → driver cumsum over the tiny day table.  The
    shuffle moves O(users × batches) rows, never one per event.

    Returns a driver-sized frame: (day, n_new:int64, cum_users:int64).
    """

    def partial_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False)["ts"].min()

    def day_counts(part: pd.DataFrame) -> pd.DataFrame:
        first = part.groupby("user_id", as_index=False)["ts"].min()
        days = first["ts"].dt.floor("D")
        out = days.value_counts().sort_index().reset_index()
        out.columns = ["day", "n_new"]
        return out.astype({"n_new": "int64"})

    from pdf_parser_ray.ops.shuffle import partitioned_map

    per_day = (
        partitioned_map(
            ds.select_columns(["user_id", "ts"]).map_batches(
                partial_min, batch_format="pandas"
            ),
            ["user_id"],
            day_counts,
        )
        .to_pandas()  # bounded: one row per (partition, day)
        .groupby("day", as_index=False)["n_new"]
        .sum()
        .sort_values("day")
        .reset_index(drop=True)
    )
    per_day["cum_users"] = per_day["n_new"].cumsum().astype("int64")
    return per_day.astype({"n_new": "int64", "cum_users": "int64"})


def path_trigrams(
    ds: "ray.data.Dataset",
    *,
    part_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    type_col: str = "event_type",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Second-order path mining: counts of consecutive event-type
    TRIPLES per user stream — the 3-step funnel/journey table that
    first-order transitions (:func:`transition_counts`) can't see
    (e.g. view→click→purchase vs view→click→error).

    Same shape as transition_counts: one user co-location, two
    vectorized shifts, ≤ |types|³ partial rows into a tiny final
    groupby.

    Output: (t1, t2, t3, n:int64).
    """
    from ray.data.aggregate import Sum

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values([part_col, *order_cols])
        by = g.groupby(part_col, sort=False)[type_col]
        t2 = by.shift(1)
        t1 = by.shift(2)
        keep = t1.notna()
        tri = pd.DataFrame(
            {"t1": t1[keep], "t2": t2[keep], "t3": g.loc[keep, type_col]}
        )
        out = tri.groupby(["t1", "t2", "t3"], as_index=False).size()
        return out.rename(columns={"size": "n"}).astype({"n": "int64"})

    from pdf_parser_ray.ops.shuffle import partitioned_map

    partial = partitioned_map(
        ds.select_columns([part_col, *order_cols, type_col]),
        [part_col],
        per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )
    return partial.groupby(["t1", "t2", "t3"]).aggregate(Sum("n", alias_name="n"))


def gap_quantiles(
    ds: "ray.data.Dataset",
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    qs: dict[str, float] | None = None,
    n_parts: int | None = None,
) -> pd.DataFrame:
    """Inter-arrival-time quantiles per event type: within each
    (user, type) stream, the gap to the previous same-type event;
    exact per-type quantiles of those gaps — the cadence profile
    (how often users click vs how often they purchase) that sizes
    session gaps, rate limits and watermark allowances.

    One user co-location produces the gap rows (vectorized two-column
    shift), then the 3-pass selection quantile operator runs per type —
    no group ever materializes on either stage.  Gaps are
    ``µs_int / 1e6`` on both engines (identical operands → identical
    float64), so quantile elements compare bit-identically.

    Returns (type_col, *qs) — one row per event type.
    """
    qs = qs or {"p50_gap_s": 0.5, "p90_gap_s": 0.9}

    def gaps(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values([user_col, type_col, ts_col, order_tiebreak])
        prev = g.groupby([user_col, type_col], sort=False)[ts_col].shift()
        keep = prev.notna()
        us = (
            g.loc[keep, ts_col].astype("datetime64[us]").astype("int64")
            - prev[keep].astype("datetime64[us]").astype("int64")
        )
        return pd.DataFrame(
            {
                type_col: g.loc[keep, type_col].to_numpy(),
                "gap_s": us.to_numpy(dtype="float64") / 1e6,
            }
        )

    from pdf_parser_ray.ops.quantiles import grouped_quantile_disc
    from pdf_parser_ray.ops.shuffle import partitioned_map

    gap_rows = partitioned_map(
        ds.select_columns([user_col, type_col, ts_col, order_tiebreak]),
        [user_col],
        gaps,
        **({"n_parts": n_parts} if n_parts else {}),
    )
    return grouped_quantile_disc(gap_rows, type_col, "gap_s", qs)


def last_touch_attribution(
    ds: "ray.data.Dataset",
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    target: str = "purchase",
    none_label: str = "none",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Last-touch attribution: every ``target`` event credits the
    user's most recent PRECEDING non-target event type (sequence order
    ``order_cols``; a target with no prior touch credits
    ``none_label``) — the marketing-attribution rollup.

    One user co-location; inside the partition the "carry the last
    non-target type forward" is a cython groupby shift+ffill (no
    Python per-user loop), and the partition reduces to ≤ |types|+1
    partial rows before the tiny final groupby.

    Output: (attributed_type, n:int64).
    """
    from ray.data.aggregate import Sum

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values([user_col, *order_cols])
        non_target = g[type_col].where(g[type_col] != target)
        by = g.assign(__nt=non_target).groupby(user_col, sort=False)["__nt"]
        prev_touch = by.shift().groupby(g[user_col], sort=False).ffill()
        hits = g[type_col] == target
        attributed = prev_touch[hits].fillna(none_label)
        out = (
            pd.DataFrame({"attributed_type": attributed})
            .groupby("attributed_type", as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return out.astype({"n": "int64"})

    from pdf_parser_ray.ops.shuffle import partitioned_map

    partial = partitioned_map(
        ds.select_columns([user_col, type_col, *order_cols]),
        [user_col],
        per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )
    return partial.groupby("attributed_type").aggregate(Sum("n", alias_name="n"))


def hourly_profile(
    ds: "ray.data.Dataset",
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    round_to: int = 4,
) -> "ray.data.Dataset":
    """Hour-of-day activity profile per event type: count and mean
    value per (type, hour 0-23) — the seasonality fingerprint that
    sizes capacity and flags bot traffic (flat profiles).

    Per-batch partial (type, hour, n, cents) combine before the
    shuffle: the groupby moves O(types × 24 × batches) rows.  Values
    are 2-decimal money, so the sum runs in EXACT int64 cents
    (winsorized_revenue rationale) and the mean is a per-row ratio of
    identical ints on both engines — bit-identical, NO rounding
    contract (a rounded float mean ties at .xxxx5 where DuckDB's
    half-away and numpy's half-even disagree; measured on this data).

    Output: (type_col, hour:int64, n:int64, avg_value:float64).
    ``round_to`` is unused, kept for signature stability.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                type_col: df[type_col],
                "hour": df[ts_col].dt.hour.astype("int64"),
                "c": np.round(
                    df[val_col].to_numpy(dtype=np.float64) * 100.0
                ).astype("int64"),
            }
        )
        g = out.groupby([type_col, "hour"], as_index=False).agg(
            n=("c", "size"), s=("c", "sum")
        )
        return g.astype({"n": "int64", "s": "int64"})

    agg = (
        ds.select_columns([type_col, ts_col, val_col])
        .map_batches(partial, batch_format="pandas")
        .groupby([type_col, "hour"])
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["avg_value"] = df["s"].to_numpy(dtype=np.float64) / (
            100.0 * df["n"].to_numpy(dtype=np.float64)
        )
        return df.drop(columns="s").astype({"n": "int64", "hour": "int64"})

    return agg.map_batches(finish, batch_format="pandas")


def max_streaks(
    ds: "ray.data.Dataset",
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Longest same-type run per user (run-length encoding reduced to
    its max): the repetition/bot signal — a user whose longest streak
    is 40 clicks is a scraper, not a shopper.

    One user co-location; run ids are a vectorized change-flag cumsum
    across the whole partition, run lengths a C-speed groupby size,
    and the per-user winner a (length DESC, type ASC) head(1) — ties
    break to the lexicographically first type, same rule in the SQL
    twin.

    Output: (user_col, streak_type, streak_len:int64).
    """

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values([user_col, *order_cols])
        new_run = (~g[user_col].eq(g[user_col].shift())) | (
            ~g[type_col].eq(g[type_col].shift())
        )
        run_id = new_run.cumsum()
        runs = (
            g.assign(__rid=run_id)
            .groupby("__rid", sort=False)
            .agg(
                **{
                    user_col: (user_col, "first"),
                    "streak_type": (type_col, "first"),
                    "streak_len": (type_col, "size"),
                }
            )
        )
        best = (
            runs.sort_values(
                [user_col, "streak_len", "streak_type"],
                ascending=[True, False, True],
            )
            .groupby(user_col, sort=False)
            .head(1)
        )
        return best.reset_index(drop=True).astype(
            {user_col: "int64", "streak_len": "int64"}
        )

    from pdf_parser_ray.ops.shuffle import partitioned_map

    return partitioned_map(
        ds.select_columns([user_col, type_col, *order_cols]),
        [user_col],
        per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def type_burstiness(
    ds: "ray.data.Dataset",
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
    window: str = "h",
) -> "ray.data.Dataset":
    """Burstiness (Fano factor) per event type: sample variance of the
    per-window event counts divided by their mean — 1.0 ≈ Poisson
    arrivals, ≫1 bursty (incidents, campaigns), ≪1 metronomic (cron,
    bots).

    Two bounded reductions, no row-level shuffle: per-batch partial
    (type, window) counts → exact window counts (the tumbling
    combiner), then integer moment sums (n, Σc, Σc²) per type.  Both
    variance and mean derive from the SAME int64 sums on both engines
    (var = (n·Σc² − (Σc)²) / (n·(n−1))), so every emitted float is a
    ratio of identical ints — bit-identical, no rounding contract.

    Output: (type_col, n_windows:int64, mean_per_window:float64,
    fano:float64); types with a single window emit NaN fano (sample
    variance undefined — NULL in the SQL twin).
    """
    import numpy as np

    from ray.data.aggregate import Sum

    def window_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                type_col: df[type_col],
                "w": df[ts_col].dt.floor(window),
            }
        )
        g = out.groupby([type_col, "w"], as_index=False).size()
        return g.rename(columns={"size": "c"}).astype({"c": "int64"})

    counts = (
        ds.select_columns([type_col, ts_col])
        .map_batches(window_partial, batch_format="pandas")
        .groupby([type_col, "w"])
        .aggregate(Sum("c", alias_name="c"))
    )

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c"].to_numpy(dtype="int64")
        g = pd.DataFrame({type_col: df[type_col], "c": c, "c2": c * c})
        out = g.groupby(type_col, as_index=False).agg(
            n=("c", "size"), s=("c", "sum"), ss=("c2", "sum")
        )
        return out.astype({"n": "int64", "s": "int64", "ss": "int64"})

    agg = (
        counts.map_batches(moments, batch_format="pandas")
        .groupby(type_col)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
        )
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype="int64")
        s = df["s"].to_numpy(dtype="int64")
        ss = df["ss"].to_numpy(dtype="int64")
        mean = s.astype(np.float64) / n.astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            var = np.where(
                n > 1,
                (n.astype(np.float64) * ss - (s.astype(np.float64)) ** 2)
                / (n.astype(np.float64) * (n - 1).astype(np.float64)),
                np.nan,
            )
            fano = var / mean
        return pd.DataFrame(
            {
                type_col: df[type_col],
                "n_windows": n,
                "mean_per_window": mean,
                "fano": fano,
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def interval_join_pairs(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    from_type: str = "view",
    to_type: str = "purchase",
    window_s: int = 3600,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Stream-stream interval join, aggregated per key: for every user,
    count ALL (from_type, to_type) event pairs with
    0 ≤ t_to − t_from ≤ window_s, plus the exact total lag — the
    bounded-time correlation join (ad attribution, view→buy windows)
    that a plain equi-join cannot express.

    The pair set is quadratic per user in the worst case, so the pairs
    themselves never materialize: ONE user co-location, and inside
    each partition the per-user sorted to-array answers every from-row
    by binary search (np.searchsorted window bounds) while the
    prefix-sum of to-timestamps turns "sum of lags in my window" into
    two subtractions.  O(n log n) per partition, zero pair explosion.

    Exactness: timestamps compare as int64 microseconds; lag_s_total
    is the sum of whole-second FLOORS of µs differences (each pair's
    floor, then the sum — matching SQL's sum of date_diff seconds)…
    floor per pair requires per-pair work, so instead the contract is
    the µs SUM: lag_us_total = Σ (t_to − t_from) in exact int64 µs,
    which SQL re-derives identically with no float anywhere.

    Output: (user_col, n_pairs:int64, lag_us_total:int64), users with
    ≥1 pair.
    """
    import numpy as np

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    w_us = np.int64(window_s) * np.int64(1_000_000)

    def prune(df: pd.DataFrame):
        keep = df[df[type_col].isin([from_type, to_type])]
        return arrow_out(
            pd.DataFrame(
                {
                    user_col: keep[user_col].to_numpy(),
                    "is_to": (keep[type_col] == to_type).to_numpy(),
                    "ts_us": keep[ts_col]
                    .to_numpy("datetime64[us]")
                    .astype("int64"),
                }
            )
        )

    pruned = ds.select_columns([user_col, type_col, ts_col]).map_batches(
        prune, batch_format="pandas"
    )

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        rows_u, rows_n, rows_l = [], [], []
        for u, g in part.groupby(user_col):
            f = np.sort(g.loc[~g["is_to"], "ts_us"].to_numpy())
            t = np.sort(g.loc[g["is_to"], "ts_us"].to_numpy())
            if len(f) == 0 or len(t) == 0:
                continue
            lo = np.searchsorted(t, f, side="left")
            hi = np.searchsorted(t, f + w_us, side="right")
            cnt = hi - lo
            pos = cnt > 0
            if not pos.any():
                continue
            csum = np.concatenate([[0], np.cumsum(t)])
            lag = (csum[hi] - csum[lo]) - cnt * f
            rows_u.append(u)
            rows_n.append(int(cnt.sum()))
            rows_l.append(int(lag[pos].sum()))
        return pd.DataFrame(
            {
                user_col: pd.Series(rows_u, dtype="int64"),
                "n_pairs": pd.Series(rows_n, dtype="int64"),
                "lag_us_total": pd.Series(rows_l, dtype="int64"),
            }
        )

    return partitioned_map(
        pruned, [user_col], per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def cusum_changepoint(
    ds: ray.data.Dataset,
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """CUSUM change-point scan per key: the (ts, id)-ordered running
    sum of deviations from the key's mean, reported at its maximum
    |excursion| — the classic level-shift detector.

    EXACT integer contract: deviations are n·x − S (value in cents,
    scaled by the key's row count so the mean never becomes a float),
    so the running sum, its |max| and the argmax timestamp are
    bit-identical to the SQL window twin.  Overflow bound:
    n·max|n·x−S| < 2^63 (≈10^7 rows × 10^5-dollar values — document
    per deployment).

    The sequential prefix scan distributes via the prefix-offset plan
    (token_budget_cap family): per-(key, day) integer partials → tiny
    driver exclusive offsets → one (key, day) co-location computes its
    local cumsum + offset and emits only its best row.  No partition
    ever holds more than a day of one key.

    Output: (type_col, max_cusum:int64, change_ts) — the earliest
    timestamp attaining the maximum |cusum|, (ts, id) tie-break.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    def day_of(ts_us: np.ndarray) -> np.ndarray:
        return ts_us // np.int64(86_400_000_000)

    def base(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": df[type_col].to_numpy(),
                "ts_us": df[ts_col].to_numpy("datetime64[us]").astype("int64"),
                "eid": df[id_col].to_numpy().astype("int64"),
                "x": np.rint(df[value_col].to_numpy() * 100.0).astype(
                    np.int64
                ),
            }
        )

    src = ds.select_columns(
        [type_col, ts_col, value_col, id_col]
    ).map_batches(lambda df: arrow_out(base(df)), batch_format="pandas")

    # pass B partials: per (key, day) sums — ≤ keys × days rows total;
    # pass A's (n, S) fall out of the same rollup at the driver.
    def day_partial(df: pd.DataFrame):
        g = pd.DataFrame(
            {
                "k": df["k"],
                "day": day_of(df["ts_us"].to_numpy()),
                "sx": df["x"],
                "cnt": np.int64(1),
            }
        )
        return arrow_out(
            g.groupby(["k", "day"], as_index=False)[["sx", "cnt"]].sum()
        )

    days = (
        src.map_batches(day_partial, batch_format="pandas")
        .groupby(["k", "day"])
        .aggregate(Sum("sx", alias_name="sx"), Sum("cnt", alias_name="cnt"))
        .to_pandas()  # keys × days — bounded
        .sort_values(["k", "day"])
    )
    totals = days.groupby("k").agg(n=("cnt", "sum"), s=("sx", "sum"))
    nS = {k: (int(r["n"]), int(r["s"])) for k, r in totals.iterrows()}

    offsets: dict[tuple, int] = {}
    for k, grp in days.groupby("k"):
        n_k, s_k = nS[k]
        run = 0
        for _, row in grp.iterrows():
            offsets[(k, int(row["day"]))] = run
            run += n_k * int(row["sx"]) - s_k * int(row["cnt"])

    off_ref = ray.put((offsets, nS))

    def tag_day(df: pd.DataFrame):
        return arrow_out(df.assign(day=day_of(df["ts_us"].to_numpy())))

    tagged = src.map_batches(tag_day, batch_format="pandas")

    def best_per_group(part: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        offs, stats = worker_state(
            ("cusum_off", off_ref.hex()), lambda: ray.get(off_ref)
        )
        rows = []
        for (k, day), g in part.groupby(["k", "day"]):
            n_k, s_k = stats[k]
            g = g.sort_values(["ts_us", "eid"], kind="mergesort")
            d = n_k * g["x"].to_numpy(dtype=np.int64) - s_k
            cum = offs[(k, int(day))] + np.cumsum(d)
            a = np.abs(cum)
            i = int(np.lexsort(
                (g["eid"].to_numpy(), g["ts_us"].to_numpy(), -a)
            )[0])
            rows.append(
                (k, int(a[i]), int(g["ts_us"].to_numpy()[i]),
                 int(g["eid"].to_numpy()[i]))
            )
        out = pd.DataFrame(
            rows, columns=["k", "a", "ts_us", "eid"]
        )
        return out.astype(
            {"a": "int64", "ts_us": "int64", "eid": "int64"}
        ) if len(out) else pd.DataFrame(
            {
                "k": pd.Series([], dtype="object"),
                "a": pd.Series([], dtype="int64"),
                "ts_us": pd.Series([], dtype="int64"),
                "eid": pd.Series([], dtype="int64"),
            }
        )

    best = partitioned_map(
        tagged, ["k", "day"], best_per_group,
        **({"n_parts": n_parts} if n_parts else {}),
    ).to_pandas()  # ≤ keys × days rows

    pick = best.sort_values(
        ["a", "ts_us", "eid"], ascending=[False, True, True],
        kind="mergesort",
    ).groupby("k", as_index=False).first().sort_values("k")

    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(
            {
                type_col: pick["k"].to_numpy(),
                "max_cusum": pick["a"].astype("int64").to_numpy(),
                "change_ts": pick["ts_us"]
                .astype("int64")
                .to_numpy()
                .astype("datetime64[us]"),
            }
        )
    )


def acf_lag1(
    ds: ray.data.Dataset,
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    round_to: int = 6,
    n_parts: int | None = None,
) -> pd.DataFrame:
    """Lag-1 autocorrelation per key: Pearson correlation of each
    value with its (ts, id)-ordered predecessor — the mean-reversion /
    momentum diagnostic of an event stream (white noise ≈ 0, trending
    > 0, oscillating < 0).

    EXACT integer contract (the cusum_changepoint family): values snap
    to int64 cents, every pair-sum (n, Σprev, Σcur, Σprev², Σcur²,
    Σprev·cur) is an exact integer, and both engines evaluate the
    identical float closed form over bit-identical operands (overflow
    bound: Σx² < 2^63 ⇒ rows × max-cents² ≲ 9·10^18 — document per
    deployment).

    The sequential pair structure distributes by (key, day) co-location:
    each bucket computes its in-bucket pair sums with one vectorized
    sort + shift, and emits its FIRST and LAST element so the driver
    can stitch the ≤ keys × days cross-midnight pairs (day order = time
    order because the bucket key is derived from ts).  No partition
    ever holds more than a day of one key; the driver merge is
    O(keys × days), never O(rows).

    Returns a driver-sized DataFrame
    (type_col, n_pairs:int64, acf1:float64), keys with < 2 rows or zero
    variance dropped, sorted by key.
    """
    import numpy as np

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    def base(df: pd.DataFrame) -> pa.Table:
        ts_us = df[ts_col].to_numpy("datetime64[us]").astype("int64")
        return arrow_out(
            pd.DataFrame(
                {
                    "k": df[type_col].to_numpy(),
                    "ts_us": ts_us,
                    "eid": df[id_col].to_numpy().astype("int64"),
                    "x": np.rint(
                        df[value_col].to_numpy(dtype=np.float64) * 100.0
                    ).astype(np.int64),
                    "day": ts_us // np.int64(86_400_000_000),
                }
            )
        )

    src = ds.select_columns(
        [type_col, ts_col, value_col, id_col]
    ).map_batches(base, batch_format="pandas")

    def bucket_sums(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (k, day), g in part.groupby(["k", "day"], sort=False):
            g = g.sort_values(["ts_us", "eid"], kind="mergesort")
            x = g["x"].to_numpy(dtype=np.int64)
            prev, cur = x[:-1], x[1:]
            rows.append(
                (
                    k,
                    int(day),
                    len(cur),
                    int(prev.sum()),
                    int(cur.sum()),
                    int((prev * prev).sum()),
                    int((cur * cur).sum()),
                    int((prev * cur).sum()),
                    int(x[0]),
                    int(x[-1]),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "k", "day", "n", "sx", "sy", "sxx", "syy", "sxy",
                "first_x", "last_x",
            ],
        ).astype(
            {
                "day": "int64", "n": "int64", "sx": "int64", "sy": "int64",
                "sxx": "int64", "syy": "int64", "sxy": "int64",
                "first_x": "int64", "last_x": "int64",
            }
        )

    buckets = partitioned_map(
        src, ["k", "day"], bucket_sums,
        **({"n_parts": n_parts} if n_parts else {}),
    ).to_pandas()  # ≤ keys × days rows — bounded

    out_rows = []
    for k, grp in buckets.sort_values(["k", "day"]).groupby("k", sort=True):
        n = int(grp["n"].sum())
        sx = int(grp["sx"].sum())
        sy = int(grp["sy"].sum())
        sxx = int(grp["sxx"].sum())
        syy = int(grp["syy"].sum())
        sxy = int(grp["sxy"].sum())
        # cross-midnight pairs: last element of each bucket with the
        # first element of the key's next present bucket
        last = grp["last_x"].to_numpy()[:-1]
        first = grp["first_x"].to_numpy()[1:]
        n += len(last)
        sx += int(last.sum())
        sy += int(first.sum())
        sxx += int((last * last).sum())
        syy += int((first * first).sum())
        sxy += int((last * first).sum())
        if n < 2:
            continue
        nf = float(n)
        num = nf * float(sxy) - float(sx) * float(sy)
        vx = nf * float(sxx) - float(sx) * float(sx)
        vy = nf * float(syy) - float(sy) * float(sy)
        if vx <= 0 or vy <= 0:
            continue
        # math.sqrt = IEEE-correctly-rounded, the same op the SQL twin's
        # sqrt() performs on the bit-identical product
        out_rows.append((k, n, round(num / math.sqrt(vx * vy), round_to)))
    return pd.DataFrame(out_rows, columns=[type_col, "n_pairs", "acf1"]).astype(
        {"n_pairs": "int64"}
    )


def km_conversion(
    ds: ray.data.Dataset,
    *,
    origin_type: str = "signup",
    event_type: str = "purchase",
    us_per_bucket: int = 86_400_000_000,
    n_parts: int | None = None,
) -> pd.DataFrame:
    """Kaplan–Meier product-limit curve for time-to-conversion with
    right-censoring — survival analysis as a dataflow op: cohorts are
    users with an ``origin_type`` event; the event is their first
    ``event_type`` AT/after origin; users who never convert are
    CENSORED at their last observed event (the estimator's whole point
    — dropping them would bias conversion fast).

    Scale shape: per-batch pre-partials (per-user min origin, max seen,
    plus raw conversion-candidate timestamps) → ONE user co-location
    where the per-user triple reduces vectorized across users → each
    partition emits day-bucketed (d, c) partials, so the driver merge
    is bucket-bounded.  The survival product is computed as
    ``exp(cumsum(ln(1 − d/n)))`` in day order — the identical
    operand-ordered float tree the SQL twin's windowed
    ``exp(sum(ln()) OVER (ORDER BY day))`` builds — and rounded to 6.

    Returns (day:int64, n_risk:int64, n_events:int64, n_censored:int64,
    survival:float64), day ascending.
    """
    import numpy as np

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].astype("datetime64[us]")
        us = ts.astype("int64")
        et = df["event_type"]
        uid = df["user_id"]
        outs = []
        o = df.loc[et == origin_type]
        if len(o):
            g = pd.DataFrame(
                {"user_id": uid[o.index], "t": us[o.index]}
            ).groupby("user_id", as_index=False)["t"].min()
            outs.append(g.assign(kind=0))
        e = df.loc[et == event_type]
        if len(e):  # candidates stay raw: which qualify depends on t0
            outs.append(
                pd.DataFrame(
                    {"user_id": uid[e.index].to_numpy(),
                     "t": us[e.index].to_numpy(), "kind": 1}
                )
            )
        g = pd.DataFrame({"user_id": uid, "t": us}).groupby(
            "user_id", as_index=False
        )["t"].max()
        outs.append(g.assign(kind=2))
        out = pd.concat(outs, ignore_index=True)
        return arrow_out(out.astype({"t": "int64", "kind": "int64"}))

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        # map_groups can hand the partition over with a named index
        # (observed: 'user_id' as both index level and column) — drop it.
        part = part.reset_index(drop=True)
        t0 = (
            part.loc[part["kind"] == 0]
            .groupby("user_id")["t"].min()
            .rename("t0")
        )
        if not len(t0):
            return pd.DataFrame(
                {"day": pd.Series([], dtype="int64"),
                 "d": pd.Series([], dtype="int64"),
                 "c": pd.Series([], dtype="int64")}
            )
        ev = part.loc[part["kind"] == 1, ["user_id", "t"]].join(
            t0, on="user_id", how="inner"
        )
        # an EMPTY left side makes join name the result index after the
        # right's index ('user_id') — ambiguous with the column below.
        ev.index.name = None
        ev = ev.loc[ev["t"] >= ev["t0"]]
        te = ev.groupby("user_id")["t"].min().rename("te")
        tx = (
            part.loc[part["kind"] == 2]
            .groupby("user_id")["t"].max()
            .rename("tx")
        )
        u = pd.concat([t0, te, tx], axis=1).loc[t0.index]
        obs = u["te"].notna()
        end = u["te"].where(obs, u["tx"]).astype("int64")
        day = (end - u["t0"].astype("int64")) // us_per_bucket
        g = (
            pd.DataFrame(
                {"day": day.to_numpy(), "obs": obs.to_numpy(),
                 "cen": (~obs).to_numpy()}
            )
            .groupby("day", as_index=False)
            .agg(d=("obs", "sum"), c=("cen", "sum"))
        )
        return g.astype({"day": "int64", "d": "int64", "c": "int64"})

    parts = partitioned_map(
        ds.select_columns(["user_id", "ts", "event_type"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["user_id"],
        fold,
        **({"n_parts": n_parts} if n_parts else {}),
    ).to_pandas()  # bounded: buckets x partitions
    if "day" not in parts.columns or not len(parts):
        return pd.DataFrame(
            {c: pd.Series([], dtype="float64" if c == "survival" else "int64")
             for c in ["day", "n_risk", "n_events", "n_censored", "survival"]}
        )
    km = (
        parts.groupby("day", as_index=False)[["d", "c"]]
        .sum()
        .sort_values("day")
        .reset_index(drop=True)
    )
    gone = (km["d"] + km["c"]).cumsum().shift(1, fill_value=0)
    n_risk = int(km["d"].sum() + km["c"].sum()) - gone
    d = km["d"].to_numpy(dtype=np.float64)
    n = n_risk.to_numpy(dtype=np.float64)
    # d == n (everyone at risk converts) sends the product to exactly
    # 0 forever; clamp instead of ln(0) — the twin mirrors the flag.
    dead = d >= n
    arg = np.where(dead, 1.0, 1.0 - d / np.where(dead, 1.0, n))
    term = np.log(arg)
    killed = np.cumsum(dead) > 0
    surv = np.where(
        killed, 0.0, np.round(np.exp(np.cumsum(term)), 6) + 0.0
    )
    return pd.DataFrame(
        {
            "day": km["day"].astype("int64"),
            "n_risk": n_risk.astype("int64"),
            "n_events": km["d"].astype("int64"),
            "n_censored": km["c"].astype("int64"),
            "survival": surv,
        }
    )


def ewma_daily(
    ds: "ray.data.Dataset",
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    window_days: int = 16,
    round_to: int = 6,
) -> pd.DataFrame:
    """Truncated-window EWMA (α = 1/2) of daily cent totals per key —
    the smoothed daily-volume trend line every ops dashboard draws,
    with the decay expressed in EXACT integers: lag-k weight =
    2^(window−1−k), normalized over the days actually present, so both
    engines sum the same powers of two and the single division is the
    only float.

    Plan: per-batch (key, day, cents) partials → ONE bounded groupby
    (|keys| × |days| rows — bounded by the calendar, never O(rows)) →
    the windowed weighted sum runs vectorized on the driver over that
    tiny table (house rank_auc pattern).  Weight sums use Python ints
    (the SQL twin shifts HUGEINTs), so no overflow at any corpus scale;
    a day with no rows contributes neither numerator nor denominator.

    Output: (key_col, day:datetime64[us], ewma:float64) — one row per
    observed (key, day).
    """
    import numpy as np
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame) -> pa.Table:
        cents = np.rint(df[val_col].to_numpy(dtype=np.float64) * 100.0).astype(
            np.int64
        )
        # int64 day index through the shuffle (no timestamp key — Ray's
        # sort boundary re-encodes datetime keys with a noisy precision
        # warning; ints are also cheaper to compare)
        day_idx = (
            df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
            // 86_400_000_000
        )
        g = (
            pd.DataFrame({key_col: df[key_col], "day_idx": day_idx, "c": cents})
            .groupby([key_col, "day_idx"], as_index=False)
            .sum()
        )
        return arrow_out(g)

    daily = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby([key_col, "day_idx"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # |keys|×|days| — calendar-bounded
        .sort_values([key_col, "day_idx"])
        .reset_index(drop=True)
    )
    daily["day"] = (daily["day_idx"].astype("int64") * 86_400_000_000).astype(
        "datetime64[us]"
    )
    top = window_days - 1
    out_key: list = []
    out_day: list = []
    out_val: list = []
    for key, g in daily.groupby(key_col, sort=True):
        days = g["day_idx"].to_numpy(dtype=np.int64)
        cents = [int(v) for v in g["c"]]
        for i in range(len(days)):
            num = 0
            den = 0
            j = i
            while j >= 0 and days[i] - days[j] <= top:
                w = 1 << (top - int(days[i] - days[j]))
                num += cents[j] * w
                den += w
                j -= 1
            out_key.append(key)
            out_day.append(g["day"].iloc[i])
            out_val.append(round(float(num) / float(den), round_to))
    return pd.DataFrame(
        {key_col: pd.Series(out_key, dtype=str),
         "day": pd.Series(out_day, dtype="datetime64[us]"),
         "ewma": pd.Series(out_val, dtype="float64")}
    )


def gapfill_daily(
    ds: "ray.data.Dataset",
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> pd.DataFrame:
    """Dense calendar gap-fill: per (type, day) event counts + exact
    cent totals densified over the GLOBAL [min_day, max_day] range —
    days where a type logged nothing appear explicitly with zeros, the
    shape every downstream time-series consumer (EWMA, changepoint,
    forecasting) needs so that silence reads as 0, not as a missing
    row.

    Plan: per-batch partial (type, day) rollup → ONE groupby at
    (types × days) cardinality — never O(events) through the shuffle —
    → driver-side densify of the bounded calendar grid (the result is
    types × days rows by construction, driver-sized at any corpus
    scale).  Day keys cross the shuffle as int64 days-since-epoch.

    Returns a driver-sized frame
    (event_type, day:datetime64, n_events:int64, cents:int64).
    """
    import numpy as np

    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame):
        day = (
            df[ts_col].to_numpy("datetime64[us]").astype("int64")
            // 86_400_000_000
        )
        cents = np.rint(df[value_col].to_numpy() * 100).astype("int64")
        g = (
            pd.DataFrame(
                {type_col: df[type_col].to_numpy(), "day": day,
                 "n": np.int64(1), "cents": cents}
            )
            .groupby([type_col, "day"], as_index=False)
            .agg(n=("n", "sum"), cents=("cents", "sum"))
        )
        return arrow_out(g)

    agg = (
        ds.select_columns([type_col, ts_col, value_col])
        .map_batches(partial, batch_format="pandas")
        .groupby([type_col, "day"])
        .aggregate(
            Sum("n", alias_name="n_events"),
            Sum("cents", alias_name="cents"),
        )
        .to_pandas()  # bounded: types × days rows
    )
    days = pd.RangeIndex(agg["day"].min(), agg["day"].max() + 1)
    types = sorted(agg[type_col].unique())
    grid = pd.MultiIndex.from_product(
        [types, days], names=[type_col, "day"]
    ).to_frame(index=False)
    out = grid.merge(agg, on=[type_col, "day"], how="left")
    out["n_events"] = out["n_events"].fillna(0).astype("int64")
    out["cents"] = out["cents"].fillna(0).astype("int64")
    out["day"] = pd.to_datetime(
        out["day"].astype("int64") * 86_400_000_000, unit="us"
    )
    return out.sort_values([type_col, "day"]).reset_index(drop=True)


def decay_attribution(
    ds: "ray.data.Dataset",
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    from_type: str = "view",
    to_type: str = "purchase",
    bucket_s: int = 900,
    n_buckets: int = 4,
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Time-decay attribution: every ``to_type`` event's cent value is
    credited to each preceding ``from_type`` touchpoint of the same
    user with weight 2^-(lag bucket) — the multi-touch attribution
    model (half-life = ``bucket_s``) behind marketing/readout
    pipelines.  Weights are exact dyadic rationals: bucket
    s = lag_us // (bucket_s·10⁶) ∈ [0, n_buckets) gets numerator
    ``(1 << (n_buckets-1)) >> s`` over the fixed denominator
    2^(n_buckets-1), so the whole credit is ONE int64 and the DuckDB
    twin replays it bit-for-bit (no float anywhere).

    Pairs never materialize: one user co-location; per user the sorted
    to-stream answers all from-rows via ``np.searchsorted`` window
    bounds per bucket, and a prefix sum over to-cents turns "sum of
    credited cents in my bucket" into two subtractions — O(n log n)
    per partition with ``n_buckets`` passes, zero pair explosion.

    Output: (user_col, n_pairs:int64, credit_num:int64) for users with
    ≥1 attributed pair; credit_cents = credit_num / 2^(n_buckets-1).
    """
    import numpy as np

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    b_us = np.int64(bucket_s) * np.int64(1_000_000)
    top = 1 << (n_buckets - 1)

    def prune(df: pd.DataFrame):
        keep = df[df[type_col].isin([from_type, to_type])]
        is_to = (keep[type_col] == to_type).to_numpy()
        cents = np.rint(keep[value_col].to_numpy() * 100).astype("int64")
        return arrow_out(
            pd.DataFrame(
                {
                    user_col: keep[user_col].to_numpy(),
                    "is_to": is_to,
                    "ts_us": keep[ts_col]
                    .to_numpy("datetime64[us]")
                    .astype("int64"),
                    "cents": np.where(is_to, cents, np.int64(0)),
                }
            )
        )

    pruned = ds.select_columns(
        [user_col, type_col, ts_col, value_col]
    ).map_batches(prune, batch_format="pandas")

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        rows_u, rows_n, rows_c = [], [], []
        for u, g in part.groupby(user_col):
            f = np.sort(g.loc[~g["is_to"], "ts_us"].to_numpy())
            to = g.loc[g["is_to"], ["ts_us", "cents"]].sort_values("ts_us")
            t = to["ts_us"].to_numpy()
            if len(f) == 0 or len(t) == 0:
                continue
            csum = np.concatenate(
                [[0], np.cumsum(to["cents"].to_numpy())]
            )
            n_pairs = 0
            credit = 0
            for s in range(n_buckets):
                lo = np.searchsorted(t, f + s * b_us, side="left")
                hi = np.searchsorted(t, f + (s + 1) * b_us, side="left")
                n_pairs += int((hi - lo).sum())
                credit += (top >> s) * int((csum[hi] - csum[lo]).sum())
            if n_pairs == 0:
                continue
            rows_u.append(u)
            rows_n.append(n_pairs)
            rows_c.append(credit)
        return pd.DataFrame(
            {
                user_col: pd.Series(rows_u, dtype="int64"),
                "n_pairs": pd.Series(rows_n, dtype="int64"),
                "credit_num": pd.Series(rows_c, dtype="int64"),
            }
        )

    kwargs = {} if n_parts is None else {"n_parts": n_parts}
    return partitioned_map(pruned, [user_col], per_partition, **kwargs)


def rolling_distinct(
    ds: "ray.data.Dataset",
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Sliding-window COUNT(DISTINCT) — rolling active users: for every
    OBSERVED day, how many distinct keys appeared in the trailing
    ``window_days`` days (the WAU/MAU family).  Tumbling distinct
    (:func:`grouped_distinct_exact` per day) can't answer this because
    overlapping windows share members; naive windowed distinct would
    re-shuffle raw rows once per window.

    Plan: batch-local (day, key) pair dedup → vectorized explode of
    each pair to the ≤``window_days`` window anchors it serves (shuffle
    volume = distinct pairs × window, never rows × window), anchors
    gated to the observed-day spine (a driver-tiny exact pre-pass over
    the pruned ts column) → ONE pair co-location for the global
    distinct count per anchor.

    Output: (day:datetime64[us], n_users:int64), one row per observed
    day, counting the trailing window ending that day (inclusive).
    """
    import numpy as np

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.sketches import grouped_distinct_exact

    us_day = np.int64(86_400_000_000)

    def day_partial(df: pd.DataFrame):
        d = np.unique(
            df[ts_col].to_numpy("datetime64[us]").astype("int64") // us_day
        )
        return arrow_out(pd.DataFrame({"day": d}))

    # partials are per-batch-unique days: ≤ batches × calendar-days rows,
    # driver-tiny; final dedup on the driver (Dataset.unique would work
    # semantically but trips a Ray 2.49 Unique-aggregate set bug here)
    observed = np.unique(
        ds.select_columns([ts_col])
        .map_batches(day_partial, batch_format="pandas")
        .to_pandas()["day"]
        .to_numpy(dtype="int64")
    )
    offsets = np.arange(window_days, dtype="int64")

    def explode(df: pd.DataFrame):
        pairs = pd.DataFrame(
            {
                "day": df[ts_col]
                .to_numpy("datetime64[us]")
                .astype("int64")
                // us_day,
                key_col: df[key_col].to_numpy(),
            }
        ).drop_duplicates()
        n = len(pairs)
        anchor = np.repeat(pairs["day"].to_numpy(), window_days) + np.tile(
            offsets, n
        )
        keys = np.repeat(pairs[key_col].to_numpy(), window_days)
        keep = np.isin(anchor, observed)
        return arrow_out(
            pd.DataFrame(
                {"anchor": anchor[keep], key_col: keys[keep]}
            ).drop_duplicates()
        )

    counts = grouped_distinct_exact(
        ds.select_columns([ts_col, key_col]).map_batches(
            explode, batch_format="pandas"
        ),
        "anchor",
        key_col,
        **({"n_parts": n_parts} if n_parts else {}),
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "day": pd.to_datetime(
                    df["anchor"].astype("int64") * 86_400_000_000,
                    unit="us",
                ),
                "n_users": df["n_distinct"].astype("int64"),
            }
        )

    return counts.map_batches(finalize, batch_format="pandas")


def daily_new_returning(
    ds: "ray.data.Dataset",
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Per-day split of active users into NEW (first-ever activity that
    day) vs RETURNING — the growth-vs-retention daily readout that
    combines :func:`user_acquisition` (new) with daily actives in one
    pass.

    Plan: batch-local distinct (key, day) pairs → ONE key co-location
    (every user's full day set lands in one partition, so first-day is
    decided locally) → per-partition (day, new/returning) count
    partials → tiny day-cardinality rollup.  Shuffle volume = distinct
    (key, day) pairs, never rows.

    Output: (day:datetime64[us], n_new:int64, n_returning:int64).
    """
    import numpy as np

    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    us_day = np.int64(86_400_000_000)

    def pair_dedup(df: pd.DataFrame):
        return arrow_out(
            pd.DataFrame(
                {
                    key_col: df[key_col].to_numpy(),
                    "day": df[ts_col]
                    .to_numpy("datetime64[us]")
                    .astype("int64")
                    // us_day,
                }
            ).drop_duplicates()
        )

    pairs = ds.select_columns([key_col, ts_col]).map_batches(
        pair_dedup, batch_format="pandas"
    )

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        p = part.drop_duplicates()  # global dedup: pairs are co-located
        first = p.groupby(key_col)["day"].transform("min")
        is_new = p["day"].to_numpy() == first.to_numpy()
        g = (
            pd.DataFrame(
                {"day": p["day"].to_numpy(),
                 "n_new": is_new.astype("int64"),
                 "n_returning": (~is_new).astype("int64")}
            )
            .groupby("day", as_index=False)
            .sum()
        )
        return g.astype({"n_new": "int64", "n_returning": "int64"})

    counts = partitioned_map(
        pairs, [key_col], per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    ).groupby("day").aggregate(
        Sum("n_new", alias_name="n_new"),
        Sum("n_returning", alias_name="n_returning"),
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "day": pd.to_datetime(
                    df["day"].astype("int64") * 86_400_000_000, unit="us"
                ),
                "n_new": df["n_new"].astype("int64"),
                "n_returning": df["n_returning"].astype("int64"),
            }
        )

    return counts.map_batches(finalize, batch_format="pandas")


def peak_concurrency(
    ds: ray.data.Dataset,
    start_col: str,
    end_col: str,
    *,
    n_buckets: int = 256,
) -> pd.DataFrame:
    """Sweep-line peak concurrency over half-open [start, end) integer
    intervals — "how many sessions were simultaneously open at the
    worst moment" (capacity planning over session spans, connection
    logs, job schedules).

    Classic sweep: every interval emits (+1 at start, -1 at end);
    the running sum over boundaries ordered by (t, delta) — departures
    first at equal t, the half-open convention — peaks at the answer.
    Distributed via the shard_plan histogram plan: boundary rows tag a
    time-range bucket → per-bucket delta subtotals → driver EXCLUSIVE
    prefix gives each bucket its entering concurrency → bucket
    co-location runs the vectorized local cumsum.  No global sort; no
    worker holds more than a bucket.

    Output (eager, one row): (peak:int64, at_us:int64 — the earliest
    boundary time achieving the peak).
    """
    import numpy as np

    from ray.data.aggregate import Max, Min

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    bounds = ds.select_columns([start_col, end_col]).aggregate(
        Min(start_col, alias_name="lo"), Max(end_col, alias_name="hi")
    )
    lo = int(bounds["lo"])
    width = max(1, -(-(int(bounds["hi"]) - lo + 1) // n_buckets))

    def boundaries(df: pd.DataFrame) -> pd.DataFrame:
        s = df[start_col].astype("int64")
        e = df[end_col].astype("int64")
        t = np.concatenate([s.to_numpy(), e.to_numpy()])
        d = np.concatenate(
            [np.ones(len(s), dtype=np.int64), -np.ones(len(e), dtype=np.int64)]
        )
        return arrow_out(
            pd.DataFrame(
                {"t": t, "d": d, "__bucket": (t - lo) // width}
            )
        )

    b = ds.select_columns([start_col, end_col]).map_batches(
        boundaries, batch_format="pandas"
    )

    def subtotal(df: pd.DataFrame) -> pd.DataFrame:
        return arrow_out(df.groupby("__bucket", as_index=False)["d"].sum())

    subs = (
        b.map_batches(subtotal, batch_format="pandas")
        .to_pandas()  # <= batches x n_buckets rows — bounded
        .groupby("__bucket", as_index=False)["d"].sum()
        .sort_values("__bucket")
    )
    offs = dict(
        zip(
            subs["__bucket"],
            np.concatenate(([0], np.cumsum(subs["d"].to_numpy())[:-1])),
        )
    )

    def local_sweep(part: pd.DataFrame) -> pd.DataFrame:
        out = []
        for bk, g in part.groupby("__bucket"):
            g = g.sort_values(["t", "d"])
            c = int(offs.get(bk, 0)) + g["d"].to_numpy().cumsum()
            i = int(np.argmax(c))
            out.append((int(c[i]), int(g["t"].to_numpy()[c == c[i]].min())))
        peaks = pd.DataFrame(out, columns=["peak", "at_us"])
        return arrow_out(peaks.astype({"peak": "int64", "at_us": "int64"}))

    parts = partitioned_map(b, ["__bucket"], local_sweep).to_pandas()
    peak = int(parts["peak"].max())
    at = int(parts.loc[parts["peak"] == peak, "at_us"].min())
    return pd.DataFrame(
        {
            "peak": pd.Series([peak], dtype="int64"),
            "at_us": pd.Series([at], dtype="int64"),
        }
    )


def interval_coverage(
    ds: ray.data.Dataset,
    start_col: str,
    end_col: str,
    *,
    n_buckets: int = 256,
) -> pd.DataFrame:
    """Union length + maximal-run count of half-open [start, end)
    integer intervals — "how much wall-clock had at least one open
    session, in how many contiguous stretches" (the coverage sibling
    of :func:`peak_concurrency`).

    Sweep convention differs from the peak op ON PURPOSE: arrivals
    sort BEFORE departures at equal t (ORDER BY t, d DESC), so
    touching intervals [0,5)+[5,10) form ONE covered run of length 10
    — union semantics; the peak op needs departures first.  Segment
    (t_i → t_{i+1}) counts when the running concurrency after row i is
    positive; a run starts at any row where c transitions 0 → >0.

    Same histogram plan as the peak op, with the two cross-bucket
    subtleties handled: each bucket adds its leading span (bucket
    range start → first boundary) when its ENTERING concurrency is
    positive and its trailing span (last boundary → range end) when
    its exit is; bucket ranges with no boundaries at all are filled
    at the driver — their concurrency is the next present bucket's
    entering offset, constant across the gap.

    Output (eager, one row): (covered_us:int64, n_runs:int64).
    """
    import numpy as np

    from ray.data.aggregate import Max, Min

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    bounds = ds.select_columns([start_col, end_col]).aggregate(
        Min(start_col, alias_name="lo"), Max(end_col, alias_name="hi")
    )
    lo = int(bounds["lo"])
    width = max(1, -(-(int(bounds["hi"]) - lo + 1) // n_buckets))

    def boundaries(df: pd.DataFrame) -> pd.DataFrame:
        s = df[start_col].astype("int64")
        e = df[end_col].astype("int64")
        t = np.concatenate([s.to_numpy(), e.to_numpy()])
        d = np.concatenate(
            [np.ones(len(s), dtype=np.int64), -np.ones(len(e), dtype=np.int64)]
        )
        return arrow_out(
            pd.DataFrame({"t": t, "d": d, "__bucket": (t - lo) // width})
        )

    b = ds.select_columns([start_col, end_col]).map_batches(
        boundaries, batch_format="pandas"
    )

    def subtotal(df: pd.DataFrame) -> pd.DataFrame:
        return arrow_out(df.groupby("__bucket", as_index=False)["d"].sum())

    subs = (
        b.map_batches(subtotal, batch_format="pandas")
        .to_pandas()
        .groupby("__bucket", as_index=False)["d"].sum()
        .sort_values("__bucket")
    )
    present = subs["__bucket"].to_numpy(dtype=np.int64)
    offs_arr = np.concatenate(([0], np.cumsum(subs["d"].to_numpy())[:-1]))
    offs = dict(zip(present, offs_arr))

    def local_sweep(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bk, g in part.groupby("__bucket"):
            g = g.sort_values(["t", "d"], ascending=[True, False])
            t = g["t"].to_numpy()
            off = int(offs.get(bk, 0))
            c = off + g["d"].to_numpy().cumsum()
            covered = int(np.sum((t[1:] - t[:-1])[c[:-1] > 0]))
            rng_lo = lo + int(bk) * width
            rng_hi = rng_lo + width
            if off > 0:
                covered += int(t[0] - rng_lo)
            if c[-1] > 0:
                covered += int(rng_hi - t[-1])
            prev = np.concatenate(([off], c[:-1]))
            runs = int(np.sum((c > 0) & (prev == 0)))
            rows.append((int(bk), covered, runs))
        out = pd.DataFrame(rows, columns=["__bucket", "covered", "runs"])
        return arrow_out(
            out.astype({"__bucket": "int64", "covered": "int64", "runs": "int64"})
        )

    parts = partitioned_map(b, ["__bucket"], local_sweep).to_pandas()
    covered = int(parts["covered"].sum())
    runs = int(parts["runs"].sum())
    # empty bucket ranges between present buckets: concurrency there is
    # the NEXT present bucket's entering offset, constant across the gap
    order = np.argsort(present)
    pb, po = present[order], offs_arr[order]
    for a, bnext, onext in zip(pb[:-1], pb[1:], po[1:]):
        gap = int(bnext - a - 1)
        if gap > 0 and onext > 0:
            covered += gap * width
    return pd.DataFrame(
        {
            "covered_us": pd.Series([covered], dtype="int64"),
            "n_runs": pd.Series([runs], dtype="int64"),
        }
    )


def seasonal_decompose_daily(
    ds: "ray.data.Dataset",
    ts_col: str,
    value_col: str,
    *,
    cents: bool = True,
) -> pd.DataFrame:
    """Classical additive seasonal decomposition of a daily total
    series (the moving-average method of Macaulay 1931 — statsmodels'
    ``seasonal_decompose`` lineage): trend = centered 7-day moving
    average, weekly seasonal = per-ISO-dow mean of the detrended
    series, residual = the rest.  Days without a full 7-day window
    drop (the classical edge rule).

    Exact-integer trick shared with the SQL twin: the detrended series
    lives in a 7× domain — d7 = 7·value − Σ₇ (an exact int64), so the
    per-dow seasonal numerators are exact integer sums and every float
    in the output is a PER-ROW ratio of identical operands (no
    rounding contract needed anywhere).

    Shape: daily totals from one bounded grouped sum (partial cents
    per batch first); the day series itself is calendar-bounded, so
    the rolling window runs vectorized at the driver.

    Output (eager, one row per full-window day): (day:timestamp,
    value_cents:int64, trend, seasonal, resid:float64).
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    scale = 100.0 if cents else 1.0

    def daily_partial(df: pd.DataFrame):
        v = np.rint(df[value_col].to_numpy(dtype=np.float64) * scale).astype(
            np.int64
        )
        g = pd.DataFrame(
            {"day": df[ts_col].dt.floor("D"), "v": v}
        )
        return arrow_out(g.groupby("day", as_index=False)["v"].sum())

    daily = (
        grouped_sum(
            ds.select_columns([ts_col, value_col]).map_batches(
                daily_partial, batch_format="pandas"
            ),
            ["day"],
            ["v"],
        )
        .to_pandas()  # calendar-bounded: one row per day
        .sort_values("day")
        .reset_index(drop=True)
    )
    v = daily["v"].to_numpy(dtype=np.int64)
    n = len(v)
    if n < 7:
        return pd.DataFrame(
            {
                "day": pd.Series([], dtype="datetime64[us]"),
                "value_cents": pd.Series([], dtype="int64"),
                "trend": pd.Series([], dtype="float64"),
                "seasonal": pd.Series([], dtype="float64"),
                "resid": pd.Series([], dtype="float64"),
            }
        )
    s7 = np.convolve(v, np.ones(7, dtype=np.int64), mode="valid")  # exact
    full = daily.iloc[3 : n - 3].reset_index(drop=True)
    d7 = 7 * full["v"].to_numpy(dtype=np.int64) - s7
    dow = full["day"].dt.dayofweek.to_numpy() + 1  # ISO 1=Mon..7=Sun
    seas_num = np.zeros(8, dtype=np.int64)
    seas_cnt = np.zeros(8, dtype=np.int64)
    np.add.at(seas_num, dow, d7)
    np.add.at(seas_cnt, dow, 1)
    sd7_over_cd = np.zeros(8, dtype=np.float64)
    nz = seas_cnt > 0
    sd7_over_cd[nz] = seas_num[nz] / seas_cnt[nz]
    seasonal = sd7_over_cd[dow] / 7.0
    trend = s7 / 7.0
    resid = (d7 - sd7_over_cd[dow]) / 7.0
    return pd.DataFrame(
        {
            "day": full["day"],
            "value_cents": full["v"].astype("int64"),
            "trend": trend,
            "seasonal": seasonal,
            "resid": resid,
        }
    )
