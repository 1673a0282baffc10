"""Exact grouped quantiles over unbounded groups — multi-pass selection.

A naive grouped median (``groupby(g).map_groups(sort)``) pulls every
group into one worker: a scale-killer when groups are corpus-sized.
This module computes EXACT quantiles without ever materializing a group:

1. stats pass    — per-group (n, lo, hi) via per-batch partials.
2. histogram pass — per-group fixed-bin counts as long (group, bin, n)
   rows; partial-aggregated, so the shuffle is O(groups × bins), not
   O(rows).
3. candidate pass — only rows whose bin contains a requested rank are
   collected (per-bin population ≈ n/bins for non-degenerate data; all
   passes compute the bin index with the SAME float expression, so
   membership is consistent regardless of boundary rounding).

The driver then sorts each tiny candidate set and indexes the rank(s).

Two rank rules, both pinned to DuckDB semantics (calibrated
empirically):

* :func:`grouped_quantile_disc` — the element at 0-based rank
  ``ceil(q·n) − 1`` (``quantile_disc``); values come straight from the
  data, bit-identical to SQL.
* :func:`grouped_quantile_cont` — linear interpolation at position
  ``h = q·(n−1)`` between ranks ``floor(h)`` and ``ceil(h)``
  (``quantile_cont`` / type-7).  Interpolated values are cross-engine
  float arithmetic → rounded to ``round_to`` on both sides.

Skew note: a group whose values are all identical degenerates to one
bin holding the whole group — the candidate collection is then bounded
by that group's size; raise ``bins`` or pre-round such values.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray
import ray.data


def _grouped_rank_values(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    rank_fn,
    qs: dict[str, float],
    *,
    bins: int,
) -> tuple[dict, dict]:
    """Shared 3-pass selection core.

    ``rank_fn(q, n) -> list[int]`` gives the 0-based global ranks each
    output column needs (1 for disc, 2 for cont).  Returns
    ``(values, ns)``: ``values[group][out_col] -> [value at each
    requested rank, in rank order]`` and ``ns[group] -> n``.

    The (group, value) projection is MATERIALIZED up front: the
    selection is inherently multi-pass (stats → histogram →
    candidates), and re-executing the lazy lineage per pass re-reads
    the parquet (and re-runs any upstream map) 3×.  Two slim columns
    live in the object store — which spills, not the driver heap —
    so the trade holds at corpus scale (measured 9.0 s → 3.6 s for
    the chained event_mad at sf0.1/32 CPUs).
    """
    from ray.data.aggregate import Max, Min, Sum

    ds = ds.select_columns([group_col, value_col]).materialize()

    # ---- pass 1: per-group n / lo / hi --------------------------------
    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col)[value_col].agg(["count", "min", "max"])
        g = g.reset_index()
        g.columns = [group_col, "n", "lo", "hi"]
        return g.astype({"n": "int64"})

    stats = (
        ds.map_batches(stats_partial, batch_format="pandas")
        .groupby(group_col)
        .aggregate(
            Sum("n", alias_name="n"),
            Min("lo", alias_name="lo"),
            Max("hi", alias_name="hi"),
        )
        .to_pandas()
    )
    ranges = {
        row[group_col]: (
            float(row["lo"]),
            (float(row["hi"]) - float(row["lo"])) / bins or 1.0,
        )
        for _, row in stats.iterrows()
    }
    ranges_ref = ray.put(ranges)

    def _bin_index(groups: pd.Series, values: np.ndarray, rng: dict) -> np.ndarray:
        # Series.map(dict) is a C-speed lookup — no per-row Python lambda.
        lo = groups.map({g: r[0] for g, r in rng.items()}).to_numpy(dtype="float64")
        width = groups.map({g: r[1] for g, r in rng.items()}).to_numpy(dtype="float64")
        return np.clip(
            np.floor((values - lo) / width).astype("int64"), 0, bins - 1
        )

    # ---- pass 2: per-group histogram (long rows) ----------------------
    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        rng = ray.get(ranges_ref)
        # Pass 1's count/min/max exclude nulls (pandas agg semantics);
        # bin the same population or cumulative counts desync from n
        # (np.floor(NaN) would land every null row in bin 0).
        df = df[df[value_col].notna()]
        idx = _bin_index(df[group_col], df[value_col].to_numpy(), rng)
        out = pd.DataFrame({group_col: df[group_col], "bin": idx})
        g = out.groupby([group_col, "bin"], as_index=False).size()
        return g.rename(columns={"size": "cnt"}).astype({"cnt": "int64"})

    # (group, bin) has groups×bins keys — Ray 2.49's streaming
    # sort-aggregate degrades ~4-7x there (measured 15.5 s vs 3.5 s on
    # the sf0.1 orders histogram); route through the co-location sum.
    from pdf_parser_ray.ops.shuffle import grouped_sum

    hist = grouped_sum(
        ds.map_batches(hist_partial, batch_format="pandas"),
        [group_col, "bin"],
        ["cnt"],
    ).to_pandas()

    # driver: locate the target bin + below-count for every needed rank
    ns: dict = {}
    targets: dict = {}   # group -> {bin -> [(out_col, slot, rank_in_bin)]}
    for _, srow in stats.iterrows():
        g, n = srow[group_col], int(srow["n"])
        ns[g] = n
        if n == 0:  # all-null group: quantile is NULL (DuckDB semantics)
            continue
        h = hist[hist[group_col] == g].sort_values("bin")
        cbins = h["bin"].to_numpy()
        counts = h["cnt"].to_numpy()
        cum = np.cumsum(counts)
        for out_col, q in qs.items():
            for slot, rank in enumerate(rank_fn(q, n)):
                pos = int(np.searchsorted(cum, rank + 1))
                b = int(cbins[pos])
                below = int(cum[pos - 1]) if pos > 0 else 0
                targets.setdefault(g, {}).setdefault(b, []).append(
                    (out_col, slot, rank - below)
                )
    targets_ref = ray.put({g: set(b) for g, b in targets.items()})

    # ---- pass 3: collect candidate rows (target bins only) ------------
    def candidates(df: pd.DataFrame):
        import pyarrow as pa

        rng = ray.get(ranges_ref)
        tg = ray.get(targets_ref)
        df = df[df[value_col].notna()]  # same population as passes 1–2
        idx = _bin_index(df[group_col], df[value_col].to_numpy(), rng)
        keep = np.zeros(len(df), dtype=bool)
        for g, bset in tg.items():   # vectorized per group (few groups)
            keep |= (df[group_col] == g).to_numpy() & np.isin(idx, list(bset))
        out = df.loc[keep, [group_col, value_col]].copy()
        out["bin"] = idx[keep]
        # Arrow out: a size-0 pandas frame with object columns trips
        # Ray's block size estimator ("cannot call vectorize on size 0").
        return pa.Table.from_pandas(out, preserve_index=False)

    cand = ds.map_batches(candidates, batch_format="pandas").to_pandas()

    values: dict = {}
    for g, by_bin in targets.items():
        slots: dict = {}
        for b, wants in by_bin.items():
            vals = np.sort(
                cand[(cand[group_col] == g) & (cand["bin"] == b)][value_col].to_numpy()
            )
            for out_col, slot, k in wants:
                slots.setdefault(out_col, {})[slot] = float(vals[k])
        values[g] = {
            out_col: [by_slot[s] for s in sorted(by_slot)]
            for out_col, by_slot in slots.items()
        }
    return values, ns


def grouped_quantile_disc(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: dict[str, float],
    *,
    bins: int = 2048,
) -> pd.DataFrame:
    """Exact discrete quantiles per group.

    ``qs`` maps output column names to quantile fractions, e.g.
    ``{"p50": 0.5, "p95": 0.95}``.  Returns a pandas DataFrame with
    columns ``(group_col, *qs)`` — element values straight from the
    data, so a SQL ``quantile_disc`` oracle compares bit-identically.
    """

    def ranks(q: float, n: int) -> list[int]:
        return [max(0, math.ceil(q * n) - 1)]   # 0-based, DuckDB rule

    values, ns = _grouped_rank_values(
        ds, group_col, value_col, ranks, qs, bins=bins
    )
    rows = [
        {
            group_col: g,
            **{
                c: values.get(g, {}).get(c, [float("nan")])[0]
                for c in qs
            },
        }
        for g in ns  # all-null groups yield NULL (DuckDB semantics)
    ]
    out = pd.DataFrame(rows).sort_values(group_col).reset_index(drop=True)
    return out[[group_col, *qs.keys()]]


def grouped_quantile_cont(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: dict[str, float],
    *,
    bins: int = 2048,
    round_to: int = 6,
) -> pd.DataFrame:
    """Interpolated (continuous) quantiles per group — DuckDB's
    ``quantile_cont`` / NumPy's default 'linear' rule: position
    ``h = q·(n−1)``, value ``v[⌊h⌋] + (h−⌊h⌋)·(v[⌈h⌉] − v[⌊h⌋])``.

    Same 3-pass selection as :func:`grouped_quantile_disc`, fetching
    the two bracketing ranks; only the final interpolation differs.
    Interpolated values are rounded to ``round_to`` on both engine
    sides (cross-engine float arithmetic).
    """

    def ranks(q: float, n: int) -> list[int]:
        h = q * (n - 1)
        lo, hi = int(math.floor(h)), int(math.ceil(h))
        return [lo] if lo == hi else [lo, hi]

    values, ns = _grouped_rank_values(
        ds, group_col, value_col, ranks, qs, bins=bins
    )
    rows = []
    for g, n in ns.items():
        row = {group_col: g}
        per = values.get(g, {})
        for out_col, q in qs.items():
            vals = per.get(out_col)
            h = q * (n - 1)
            if vals is None:  # all-null group → NULL (DuckDB semantics)
                row[out_col] = float("nan")
            elif len(vals) == 1:
                row[out_col] = round(vals[0], round_to)
            else:
                f = h - math.floor(h)
                row[out_col] = round(vals[0] + f * (vals[1] - vals[0]), round_to)
        rows.append(row)
    out = pd.DataFrame(rows).sort_values(group_col).reset_index(drop=True)
    return out[[group_col, *qs.keys()]]


def grouped_mad(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    *,
    bins: int = 2048,
) -> pd.DataFrame:
    """Median absolute deviation per group — the ROBUST scale estimate
    (z-scores break when the outliers they hunt inflate the stddev;
    MAD has a 50 % breakdown point).

    Two chained 3-pass selections, neither materializing a group:
    median per group (:func:`grouped_quantile_disc`), the tiny median
    map broadcast via ``ray.put``, then the same selection over
    ``|value − median|``.  Both statistics are ELEMENT VALUES of
    identical float sets on both engines (the deviation subtracts the
    same two operands), so the oracle compares bit-identically — no
    rounding contract.

    Returns a driver-sized frame: (group_col, med:float64, mad:float64).

    Fast path (default): ONE distinct-(group, value) count shuffle.
    When the value domain is quantized (prices, scores — the common
    case), the aggregated histogram is driver-sized and BOTH chained
    medians are exact weighted selections over it: the median is an
    element of the histogram, and every deviation ``|v − med|`` is
    recomputed on the distinct values with the identical float64
    subtraction a row-wise pass would do — so the selected elements
    are bit-identical to the multi-pass result (measured 11.5 s → one
    shuffle on the sf0.1 bench).  Falls back to the chained 3-pass
    selections when the histogram outgrows ``distinct_limit`` rows
    (unquantized domains at corpus scale).
    """
    import math as _math

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    def hist_partial(df: pd.DataFrame):
        sub = df[[group_col, value_col]].dropna()
        g = (
            sub.groupby([group_col, value_col], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        g["n"] = g["n"].astype("int64")
        return arrow_out(g)

    # int-keyed co-location, NOT groupby().aggregate(): Ray 2.49's
    # sort-aggregate on a high-cardinality float key measured 13 s for
    # this histogram at sf0.1 vs ~2 s via grouped_sum.
    hist = grouped_sum(
        ds.select_columns([group_col, value_col]).map_batches(
            hist_partial, batch_format="pandas"
        ),
        [group_col, value_col],
        ["n"],
    ).materialize()
    distinct_limit = 2_000_000
    if hist.count() <= distinct_limit:
        df = hist.to_pandas()

        def select_median(vals: np.ndarray, cnts: np.ndarray) -> float:
            # DuckDB quantile_disc rule: 0-based rank max(0, ceil(qN)-1)
            n_total = int(cnts.sum())
            k = max(0, _math.ceil(0.5 * n_total) - 1)
            cum = np.cumsum(cnts)
            return float(vals[np.searchsorted(cum, k + 1)])

        rows = []
        for g, sub in df.groupby(group_col):
            v = sub[value_col].to_numpy(dtype=np.float64)
            n = sub["n"].to_numpy(dtype=np.int64)
            order = np.argsort(v, kind="mergesort")
            v, n = v[order], n[order]
            med = select_median(v, n)
            dev = np.abs(v - med)
            o2 = np.argsort(dev, kind="mergesort")
            rows.append(
                {group_col: g, "med": med,
                 "mad": select_median(dev[o2], n[o2])}
            )
        out = pd.DataFrame(rows, columns=[group_col, "med", "mad"])
        return out.sort_values(group_col).reset_index(drop=True)

    # one materialized projection feeds BOTH chained selections (each
    # is itself multi-pass; see _grouped_rank_values)
    proj = ds.select_columns([group_col, value_col]).materialize()
    med = grouped_quantile_disc(
        proj, group_col, value_col, {"med": 0.5}, bins=bins
    )
    med_ref = ray.put(dict(zip(med[group_col], med["med"])))

    def deviations(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        m = worker_state(("mad_med", med_ref.hex()), lambda: ray.get(med_ref))
        center = df[group_col].map(m).to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                group_col: df[group_col],
                "__dev": np.abs(
                    df[value_col].to_numpy(dtype=np.float64) - center
                ),
            }
        )

    dev = proj.map_batches(deviations, batch_format="pandas")
    mad = grouped_quantile_disc(dev, group_col, "__dev", {"mad": 0.5}, bins=bins)
    out = med.merge(mad, on=group_col)
    return out.sort_values(group_col).reset_index(drop=True)


def global_value_ranks(
    ds: ray.data.Dataset,
    value_col: str,
    id_col: str,
    *,
    bucket_width: float = 1.0,
    n_tiles: int = 10,
    n_parts: int = 64,
) -> ray.data.Dataset:
    """EXACT global rank / percent_rank / ntile of every row under the
    total order (value, id) — WITHOUT a global sort.

    The all-to-all a ``sort()`` needs is replaced by the histogram +
    prefix-offset plan (the token_budget_cap distributed-prefix-sum
    family applied to ordering):

    1. one streaming pass bins values into ORDERED coarse buckets
       (``floor(value / bucket_width)``) and emits per-batch bucket
       counts — bounded at value-range/width rows per batch;
    2. the driver turns the (tiny) bucket histogram into EXCLUSIVE
       prefix offsets: rows in earlier buckets = the global rank base
       of each bucket;
    3. one bucket co-location ranks each bucket locally by (value, id)
       and adds its offset — exact because the bucket function is
       monotone in value, so bucket order IS value order.

    Skew note: a bucket is the co-location unit, so ``bucket_width``
    must keep the densest bucket partition-sized (at 10^12 rows pick
    widths from a quantile sketch, or recurse: re-bucket any bucket
    whose count exceeds the partition budget by a finer width —
    documented assumption, not needed at bench scale).

    ntile follows the SQL rule (first N mod k tiles get the extra
    row): tile = the smallest t with rank ≤ t·⌈N/k⌉ adjusted for the
    remainder — computed closed-form from (rank, N, k) on both
    engines.  percent_rank = (rank−1)/(N−1), a ratio of identical
    ints.

    Output: (id_col, value_col, rnk:int64, pct_rank:float64,
    tile:int64).
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    def bucket_of(vals: np.ndarray) -> np.ndarray:
        return np.floor(vals / bucket_width).astype(np.int64)

    def hist_partial(df: pd.DataFrame):
        b = bucket_of(df[value_col].to_numpy(dtype=np.float64))
        u, c = np.unique(b, return_counts=True)
        return arrow_out(pd.DataFrame({"b": u, "c": c.astype(np.int64)}))

    hist = (
        ds.select_columns([value_col])
        .map_batches(hist_partial, batch_format="pandas")
        .to_pandas()  # ≤ batches × buckets rows — bounded
        .groupby("b", as_index=False)["c"].sum()
        .sort_values("b")
    )
    n_total = int(hist["c"].sum())
    offsets = dict(
        zip(hist["b"], np.concatenate([[0], hist["c"].cumsum()[:-1]]))
    )
    off_ref = ray.put(offsets)

    def tag(df: pd.DataFrame):
        b = bucket_of(df[value_col].to_numpy(dtype=np.float64))
        return arrow_out(
            pd.DataFrame(
                {
                    id_col: df[id_col].to_numpy(),
                    value_col: df[value_col].to_numpy(),
                    "b": b,
                }
            )
        )

    tagged = ds.select_columns([id_col, value_col]).map_batches(
        tag, batch_format="pandas"
    )

    # SQL ntile: first r tiles have q+1 rows, rest q (q = N//k, r = N%k)
    q, r = divmod(n_total, n_tiles)
    big = r * (q + 1)  # rows covered by the q+1-sized tiles

    def rank_partition(part: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        offs: dict = worker_state(
            ("gvr_off", off_ref.hex()), lambda: ray.get(off_ref)
        )
        out = []
        for b, g in part.groupby("b"):
            g = g.sort_values(
                [value_col, id_col], kind="mergesort"
            ).reset_index(drop=True)
            rnk = np.arange(1, len(g) + 1, dtype=np.int64) + int(offs[b])
            if q == 0:
                tile = np.minimum(rnk, n_tiles)
            else:
                tile = np.where(
                    rnk <= big,
                    (rnk - 1) // (q + 1) + 1,
                    r + (rnk - big - 1) // q + 1,
                ).astype(np.int64)
            out.append(
                pd.DataFrame(
                    {
                        id_col: g[id_col],
                        value_col: g[value_col],
                        "rnk": rnk,
                        "pct_rank": (rnk - 1).astype(np.float64)
                        / float(n_total - 1)
                        if n_total > 1
                        else np.zeros(len(g)),
                        "tile": tile,
                    }
                )
            )
        empty = pd.DataFrame(
            {
                id_col: pd.Series([], dtype="int64"),
                value_col: pd.Series([], dtype="float64"),
                "rnk": pd.Series([], dtype="int64"),
                "pct_rank": pd.Series([], dtype="float64"),
                "tile": pd.Series([], dtype="int64"),
            }
        )
        return arrow_out(pd.concat(out, ignore_index=True) if out else empty)

    return partitioned_map(tagged, ["b"], rank_partition, n_parts=n_parts)


def gini_coefficient(
    ds: ray.data.Dataset,
    value_col: str,
    id_col: str,
    *,
    bucket_width: float = 1.0,
    n_parts: int = 64,
) -> ray.data.Dataset:
    """Exact Gini inequality coefficient over integer-valued amounts —
    the sorted-rank identity G = Σ(2·rank − n − 1)·x / (n·Σx) computed
    WITHOUT a global sort, by composing :func:`global_value_ranks`
    (histogram + prefix offsets + bucket co-location) with one partial
    moment pass.

    The identity is permutation-invariant within ties (equal x
    contribute the same regardless of rank order), so the (value, id)
    tie-break is immaterial to the result — the twin needs no tie
    discipline.  All sums are exact int64 (values must be integers,
    e.g. cents); the only float is the final ratio of two ints both
    engines hold bit-identically.  Overflow bound: n·Σx < 2^63 —
    ~9×10^18 value-units, document per use.

    Output: one row (gini:float64, n:int64).
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out

    ranks = global_value_ranks(
        ds, value_col, id_col, bucket_width=bucket_width, n_parts=n_parts
    )

    def partial(df: pd.DataFrame):
        x = df[value_col].to_numpy(dtype=np.int64)
        r = df["rnk"].to_numpy(dtype=np.int64)
        return arrow_out(
            pd.DataFrame(
                {
                    "srx": [int((r * x).sum())],
                    "sx": [int(x.sum())],
                    "n": [np.int64(len(df))],
                }
            )
        )

    agg = ranks.map_batches(partial, batch_format="pandas").aggregate(
        Sum("srx", alias_name="srx"),
        Sum("sx", alias_name="sx"),
        Sum("n", alias_name="n"),
    )
    import ray.data as rd

    srx, sx, n = int(agg["srx"]), int(agg["sx"]), int(agg["n"])
    num = 2 * srx - (n + 1) * sx
    gini = float(num) / (float(n) * float(sx)) if n and sx else 0.0
    return rd.from_pandas(
        pd.DataFrame({"gini": [gini], "n": [np.int64(n)]})
    )


def weighted_median(
    ds: ray.data.Dataset,
    value_col: str,
    weight_col: str,
    *,
    bucket_width: float = 1.0,
    n_parts: int = 64,
) -> ray.data.Dataset:
    """Exact weighted median: the smallest value v whose running weight
    (over values ascending) reaches half the total — two bounded
    passes, no global sort.

    Pass 1 histograms integer weights per ordered value-bucket (the
    global_value_ranks plan); the driver's prefix sum finds the single
    bucket that straddles W/2.  Pass 2 scans ONLY that bucket's rows
    (a vectorized filter, no shuffle), sorts its bounded frame, and
    picks the boundary value.  Weights must be integers (exact
    comparison 2·cum ≥ W, no float accumulation).

    Output: one row (median:float64, total_weight:int64).
    """
    from pdf_parser_ray.io_utils import arrow_out

    def bucket_of(vals: np.ndarray) -> np.ndarray:
        return np.floor(vals / bucket_width).astype(np.int64)

    def hist_partial(df: pd.DataFrame):
        b = bucket_of(df[value_col].to_numpy(dtype=np.float64))
        w = df[weight_col].to_numpy(dtype=np.int64)
        g = pd.DataFrame({"b": b, "w": w}).groupby("b", as_index=False).sum()
        return arrow_out(g)

    hist = (
        ds.select_columns([value_col, weight_col])
        .map_batches(hist_partial, batch_format="pandas")
        .to_pandas()
        .groupby("b", as_index=False)["w"].sum()
        .sort_values("b")
    )
    total = int(hist["w"].sum())
    cum = hist["w"].cumsum()
    # smallest bucket where 2*cum >= total
    idx = int(np.searchsorted(2 * cum.to_numpy(), total, side="left"))
    target_b = int(hist["b"].iloc[idx])
    before = int(cum.iloc[idx - 1]) if idx > 0 else 0

    def in_bucket(df: pd.DataFrame):
        b = bucket_of(df[value_col].to_numpy(dtype=np.float64))
        keep = df[b == target_b]
        return arrow_out(keep[[value_col, weight_col]])

    rows = (
        ds.select_columns([value_col, weight_col])
        .map_batches(in_bucket, batch_format="pandas")
        .to_pandas()  # one bucket — bounded by construction
        .sort_values(value_col, kind="mergesort")
    )
    cum2 = before + rows[weight_col].astype("int64").cumsum().to_numpy()
    pos = int(np.searchsorted(2 * cum2, total, side="left"))
    med = float(rows[value_col].iloc[pos])
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(
            {"median": [med], "total_weight": [np.int64(total)]}
        )
    )


def grouped_trimmed_mean(
    ds: ray.data.Dataset,
    group_col: str,
    val_col: str,
    *,
    trim: float = 0.1,
    round_to: int = 6,
) -> pd.DataFrame:
    """10 %-trimmed (by default) mean per group — the robust location
    estimate between the mean (outlier-hostage) and the median
    (information-discarding): drop the ⌊n·trim⌋ lowest and highest
    values, average the rest.

    NO group co-location (the group key is low-cardinality — the
    forbidden skew pattern): values snap to int64 cents and ONE bounded
    groupby builds per-(group, cents) counts; the driver prefix-scans
    each group's tiny value histogram and takes the rank window
    [⌊n·trim⌋+1, n−⌊n·trim⌋] — tie-invariant because tied boundary
    values are equal, so partial inclusion by count is exact.  All
    arithmetic is integer until the final mean (sum::DOUBLE / kept /
    100), the tree the SQL row_number twin shares.

    Returns a driver-sized DataFrame
    (group_col, n_kept:int64, trimmed_mean:float64), sorted by group.
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame):
        g = (
            pd.DataFrame(
                {
                    group_col: df[group_col],
                    "x": np.rint(
                        df[val_col].to_numpy(dtype=np.float64) * 100.0
                    ).astype(np.int64),
                    "c": np.int64(1),
                }
            )
            .groupby([group_col, "x"], as_index=False)
            .sum()
        )
        return arrow_out(g.astype({"c": "int64"}))

    # co-locate, don't stream-sort-aggregate: groups × distinct cents
    # is a ~10^5-key space — the Q18-lesson regime (measured 7.8 s ->
    # ~2 s at sf0.1/32 CPUs with grouped_sum).
    from pdf_parser_ray.ops.shuffle import grouped_sum

    counts = (
        grouped_sum(
            ds.select_columns([group_col, val_col]).map_batches(
                partial, batch_format="pandas"
            ),
            [group_col, "x"],
            ["c"],
        )
        .to_pandas()  # ≤ groups × distinct cents — bounded
        .sort_values([group_col, "x"])
    )

    rows = []
    for k, grp in counts.groupby(group_col, sort=True):
        c = grp["c"].to_numpy(dtype=np.int64)
        x = grp["x"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        lo = int(n * trim)
        hi = n - lo
        if hi <= lo:
            continue
        cum = np.cumsum(c)
        prev = cum - c
        kept = np.clip(cum, lo, hi) - np.clip(prev, lo, hi)
        n_kept = int(kept.sum())
        s = int((x * kept).sum())
        rows.append(
            (k, n_kept, round(float(s) / float(n_kept) / 100.0, round_to))
        )
    return pd.DataFrame(
        rows, columns=[group_col, "n_kept", "trimmed_mean"]
    ).astype({"n_kept": "int64"})


def grouped_value_ranks(
    ds: ray.data.Dataset,
    value_col: str,
    id_col: str,
    group_col: str,
    *,
    bucket_width: float | dict = 1.0,
    n_tiles: int = 10,
    n_parts: int = 64,
) -> ray.data.Dataset:
    """:func:`global_value_ranks` generalized to PER-GROUP total orders:
    exact rank / percent_rank / ntile of every row under (value, id)
    within its group — ``ntile(k) OVER (PARTITION BY group ORDER BY
    value, id)`` without a sort, for groups of ANY cardinality.

    Same histogram + prefix-offset plan, keyed (group, bucket):
    per-batch (group, bucket) counts → driver exclusive offsets per
    group → one (group, bucket) co-location ranks locally and adds the
    offset.  ``bucket_width`` may be a dict keyed by group value so
    differently-scaled groups (days vs cents) keep their histograms
    bounded; the driver table is Σ_g (range_g / width_g) rows.

    Output: (id_col, group_col, value_col, rnk:int64,
    pct_rank:float64, tile:int64).
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    def width_of(g) -> float:
        if isinstance(bucket_width, dict):
            return float(bucket_width[g])
        return float(bucket_width)

    def bucket_arr(gvals: np.ndarray, vals: np.ndarray) -> np.ndarray:
        if not isinstance(bucket_width, dict):
            return np.floor(vals / float(bucket_width)).astype(np.int64)
        w = np.array([width_of(g) for g in gvals], dtype=np.float64)
        return np.floor(vals / w).astype(np.int64)

    def hist_partial(df: pd.DataFrame):
        b = bucket_arr(
            df[group_col].to_numpy(), df[value_col].to_numpy(np.float64)
        )
        g = (
            pd.DataFrame({group_col: df[group_col], "b": b, "c": np.int64(1)})
            .groupby([group_col, "b"], as_index=False)
            .sum()
        )
        return arrow_out(g.astype({"c": "int64"}))

    hist = (
        ds.select_columns([group_col, value_col])
        .map_batches(hist_partial, batch_format="pandas")
        .to_pandas()  # ≤ batches × buckets — bounded by construction
        .groupby([group_col, "b"], as_index=False)["c"].sum()
        .sort_values([group_col, "b"])
    )
    offsets: dict = {}
    totals: dict = {}
    for g, grp in hist.groupby(group_col):
        cum = grp["c"].cumsum().to_numpy()
        for b, off in zip(grp["b"], np.concatenate([[0], cum[:-1]])):
            offsets[(g, int(b))] = int(off)
        totals[g] = int(cum[-1])
    off_ref = ray.put((offsets, totals))

    def tag(df: pd.DataFrame):
        b = bucket_arr(
            df[group_col].to_numpy(), df[value_col].to_numpy(np.float64)
        )
        return arrow_out(
            pd.DataFrame(
                {
                    id_col: df[id_col].to_numpy(),
                    group_col: df[group_col].to_numpy(),
                    value_col: df[value_col].to_numpy(),
                    "b": b,
                }
            )
        )

    tagged = ds.select_columns(
        [id_col, group_col, value_col]
    ).map_batches(tag, batch_format="pandas")

    def rank_partition(part: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        offs, tots = worker_state(
            ("grv_off", off_ref.hex()), lambda: ray.get(off_ref)
        )
        out = []
        for (g, b), grp in part.groupby([group_col, "b"]):
            grp = grp.sort_values(
                [value_col, id_col], kind="mergesort"
            ).reset_index(drop=True)
            n_g = tots[g]
            rnk = np.arange(1, len(grp) + 1, dtype=np.int64) + offs[(g, int(b))]
            q, r = divmod(n_g, n_tiles)
            if q == 0:
                tile = np.minimum(rnk, n_tiles)
            else:
                big = r * (q + 1)
                tile = np.where(
                    rnk <= big,
                    (rnk - 1) // (q + 1) + 1,
                    r + (rnk - big - 1) // q + 1,
                ).astype(np.int64)
            out.append(
                pd.DataFrame(
                    {
                        id_col: grp[id_col],
                        group_col: grp[group_col],
                        value_col: grp[value_col],
                        "rnk": rnk,
                        "pct_rank": (rnk - 1).astype(np.float64)
                        / float(n_g - 1)
                        if n_g > 1
                        else np.zeros(len(grp)),
                        "tile": tile,
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    group_col: pd.Series([], dtype="object"),
                    value_col: pd.Series([], dtype="float64"),
                    "rnk": pd.Series([], dtype="int64"),
                    "pct_rank": pd.Series([], dtype="float64"),
                    "tile": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    return partitioned_map(
        tagged, [group_col, "b"], rank_partition, n_parts=n_parts
    )


def quantile_norm(
    ds: ray.data.Dataset,
    value_col: str,
    id_col: str,
    group_col: str,
    *,
    out_col: str = "norm",
    grid: int = 100,
    bucket_width: float | dict = 1.0,
    n_parts: int = 64,
) -> ray.data.Dataset:
    """Cross-group quantile normalization (the batch-effect corrector):
    replace each row's value with the GLOBAL value at its within-group
    percentile, so differently-scaled groups (sources, labs, crawls)
    become comparable — a source whose lengths run 2x long maps onto
    the same global scale as everyone else.

    Exact, selection-based: within-group percent_rank comes from
    :func:`grouped_value_ranks` (histogram + prefix offsets, (value,id)
    total order — tie-free, so SQL percent_rank agrees bit for bit);
    the target scale is ``grid+1`` global ``quantile_disc`` selections
    (one histogram pass, broadcast as grid+1 floats); the mapping
    ``norm = P[floor(pct·grid)]`` is row-local.  No interpolation
    anywhere — every output value is an element of the data, and every
    float op (the pct ratio, the floor index) is identical on both
    engines.

    Output: (id_col, group_col, value_col, out_col), one row per input
    row.
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.stages import worker_state

    qs = {f"g{i}": i / float(grid) for i in range(grid + 1)}

    def const_group(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(__g=np.int64(0))

    pdf = grouped_quantile_disc(
        ds.select_columns([value_col]).map_batches(
            const_group, batch_format="pandas"
        ),
        "__g", value_col, qs,
    )
    scale = np.array(
        [pdf[f"g{i}"].iloc[0] for i in range(grid + 1)], dtype=np.float64
    )
    sref = ray.put(scale)

    ranks = grouped_value_ranks(
        ds, value_col, id_col, group_col,
        bucket_width=bucket_width, n_parts=n_parts,
    )

    def apply_norm(df: pd.DataFrame) -> pd.DataFrame:
        sc = worker_state(("qnorm_scale", sref.hex()), lambda: ray.get(sref))
        idx = np.floor(
            df["pct_rank"].to_numpy(dtype=np.float64) * grid
        ).astype(np.int64)
        return arrow_out(
            pd.DataFrame(
                {
                    id_col: df[id_col].to_numpy(),
                    group_col: df[group_col].to_numpy(),
                    value_col: df[value_col].to_numpy(),
                    out_col: sc[idx],
                }
            )
        )

    return ranks.map_batches(apply_norm, batch_format="pandas")
