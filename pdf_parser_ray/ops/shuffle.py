"""Bounded-partition grouped execution.

``Dataset.groupby(keys).map_groups(fn)`` pays ~70 µs of Ray machinery
per GROUP.  For corpus-scale key cardinalities (users, documents, LSH
buckets) that overhead dwarfs the actual kernel: measured at sf0.1,
MinHash-LSH pair emission spent ~6 s invoking 80 k near-empty groups
around a <1 s kernel.

:func:`grouped_map` keeps the same per-group function contract but
shuffles by ``hash(keys) % n_parts`` instead of by raw key: the
all-to-all moves identical bytes, the executor sees ``n_parts`` bounded
groups, and the per-key fan-out happens INSIDE each partition via
pandas' C-speed groupby.  Partition sizes stay uniform because the hash
is uniform; a skewed KEY still lands one big group in one partition —
cap or salt it in the caller exactly as with plain map_groups.

SIZING RULE: one partition = one worker pandas frame, so pick
``n_parts ≈ total_grouped_rows / 10^6`` (≈ a few hundred MB a frame).
The default suits up to ~5×10^8 grouped rows; EVERY caller in this
repo plumbs ``n_parts`` through so a 10^12-row job can raise it —
partition count costs nothing (measured: 64 vs 512 parts identical
wall), undersized partition COUNT costs worker memory.
"""

from __future__ import annotations

import pandas as pd
import ray.data

DEFAULT_PARTS = 512


def size_parts(
    n_rows: int | None,
    *,
    rows_per_part: int = 100_000,
    lo: int = 32,
    hi: int = DEFAULT_PARTS,
) -> int:
    """Partition count sized to the DATA: ~``rows_per_part`` rows per
    partition, clamped to [lo, hi]; unknown size → ``hi`` (the safe
    direction at scale).  Rationale: each partitioned_map exchange pays
    a fixed cost per partition (tag/merge tasks + sort keys — measured
    ~2.3 s at 512 parts vs ~0.5 s at 64 on a 40k-row table), so
    ITERATIVE ops whose per-round state is node-bounded (pointer_jump,
    bfs_distances) must not pay 512-way machinery on 10^4-row state.
    ``lo`` keeps every core busy; callers with a known bigger cluster
    pass ``n_parts`` explicitly as before."""
    if n_rows is None:
        return hi
    return max(lo, min(hi, -(-int(n_rows) // rows_per_part)))


def detect_hot_keys(
    ds: ray.data.Dataset,
    key: str,
    *,
    threshold: int,
    capacity: int = 4096,
) -> list:
    """Misra-Gries hot-key scan shared by skew_join and the salted
    window ops: one extra pass over the PRUNED key column (no shuffle —
    per-batch mergeable MG partials, tiny driver merge; ops/sketches).

    Returns CANDIDATE hot keys: every key whose true count ≥
    ``threshold`` is guaranteed present (miss-proof), plus possibly
    keys below it when the sketch shed mass.  The gate is
    ``est + shed ≥ threshold`` where ``shed`` is the sketch's EXACT
    total decremented mass (true_count ≤ est + shed) — with no
    capacity overflow shed is 0 and the gate is exact.  The advisor-r3
    failure mode (N large enough that a genuinely hot key's MG
    estimate dips below an absolute threshold and the caller silently
    skips salting — precisely at the scale salting exists for) is
    structurally gone: over-inclusion merely salts ≤ capacity extra
    keys, a bounded cost in the safe direction, and a warning is
    emitted when the slack exceeds the threshold (gate degraded to
    "every sketched key").
    """
    import warnings

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.sketches import MisraGries

    def mg_partial(df: pd.DataFrame):
        mg = MisraGries(capacity)
        mg.add_counts(df[key].value_counts().to_dict())
        items = mg.counts
        return arrow_out(pd.DataFrame(
            {"value": [list(items.keys())], "n": [list(items.values())],
             "shed": [int(mg.shed)]}
        ))

    parts = ds.select_columns([key]).map_batches(
        mg_partial, batch_format="pandas"
    ).take_all()
    merged = MisraGries(capacity)
    for p in parts:
        merged.add_counts(dict(zip(p["value"], (int(x) for x in p["n"]))))
        merged.shed += int(p["shed"])
    if merged.shed >= threshold:
        warnings.warn(
            f"detect_hot_keys: MG shed mass {merged.shed} >= threshold "
            f"{threshold} — every sketched key is a hot-key candidate; "
            f"raise capacity (={capacity}) for a sharper gate",
            RuntimeWarning,
        )
    return [
        v for v, n in merged.counts.items() if n + merged.shed >= threshold
    ]


def grouped_map(
    ds: ray.data.Dataset,
    keys: list[str],
    fn,
    *,
    n_parts: int = DEFAULT_PARTS,
    drop_singletons: bool = False,
) -> ray.data.Dataset:
    """``groupby(keys).map_groups(fn)`` with a bounded group count.

    ``fn`` receives one pandas frame per distinct key tuple (same
    contract as ``map_groups``) and must return a pandas frame.
    ``drop_singletons=True`` discards one-row groups in a single
    vectorized pass before the Python loop — for pair-emitting kernels
    (LSH buckets) where singletons produce nothing, this skips the vast
    majority of groups wholesale.
    """
    key_list = list(keys)

    def add_part(df: pd.DataFrame):
        from pdf_parser_ray.io_utils import arrow_out

        h = pd.util.hash_pandas_object(df[key_list], index=False)
        # assign = shallow copy + new column; never deep-copies payloads.
        # Arrow block out: the __part sort-shuffle combines pandas
        # blocks ~11x slower (io_utils.arrow_out rationale).
        return arrow_out(df.assign(__part=(h % n_parts).astype("int64")))

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop(columns="__part")
        if drop_singletons:
            part = part[part.duplicated(key_list, keep=False)]
        outs = [fn(g) for _, g in part.groupby(key_list, sort=False)]
        if not outs:
            # fn must yield a TYPED empty frame for an empty group so
            # all output blocks share one schema.
            return fn(part.head(0))
        return pd.concat(outs, ignore_index=True)

    return (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby("__part")
        .map_groups(per_partition, batch_format="pandas")
    )


def partitioned_map(
    ds: ray.data.Dataset,
    keys: list[str],
    fn,
    *,
    n_parts: int = DEFAULT_PARTS,
) -> ray.data.Dataset:
    """Co-locate rows by ``keys`` and hand fn WHOLE PARTITIONS (every
    row of a key tuple is guaranteed to be in exactly one call) — for
    kernels that vectorize ACROSS groups (sort + groupby-cumsum style)
    instead of looping per group.  ``fn`` must itself respect group
    boundaries; it gets a mixed-key frame."""
    key_list = list(keys)

    def add_part(df: pd.DataFrame):
        from pdf_parser_ray.io_utils import arrow_out

        h = pd.util.hash_pandas_object(df[key_list], index=False)
        return arrow_out(df.assign(__part=(h % n_parts).astype("int64")))

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        return fn(part.drop(columns="__part"))

    return (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby("__part")
        .map_groups(per_partition, batch_format="pandas")
    )


def write_range_partitioned(
    ds,
    out_dir: str,
    col: str,
    *,
    n_ranges: int = 16,
    sample_per_batch: int = 256,
) -> "object":
    """Range-partitioned parquet sink: rows land in ``out_dir/
    range_id=K/`` by sampled quantile boundaries of ``col`` — the
    layout that lets a later reader prune whole directories for a
    range predicate, and lets a failed writer resume per range dir.

    Boundary protocol (no global sort): each batch contributes an
    evenly-strided sample of ≤``sample_per_batch`` values (a partial —
    bounded regardless of corpus size); the driver takes quantiles of
    the pooled sample and broadcasts the ``n_ranges - 1`` cutpoints;
    assignment is one vectorized ``searchsorted`` per batch.  Ranges
    are approximately equal-sized (sampling error only), boundaries are
    exact: every row in range K has col < every row in range K+1.

    Returns the boundaries (list of floats, len ``n_ranges - 1``).
    """
    import numpy as np
    import pandas as pd
    import ray

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.stages import worker_state

    def sample_batch(df: pd.DataFrame):
        v = df[col].dropna().to_numpy()
        if len(v) > sample_per_batch:
            idx = np.linspace(0, len(v) - 1, sample_per_batch).astype(np.int64)
            v = np.sort(v)[idx]
        return arrow_out(pd.DataFrame({"v": v}))

    sample = ds.select_columns([col]).map_batches(
        sample_batch, batch_format="pandas"
    ).to_pandas()["v"].to_numpy()
    if len(sample) == 0:
        raise ValueError(f"no non-null values in {col!r}")
    qs = np.linspace(0, 1, n_ranges + 1)[1:-1]
    bounds = np.unique(np.quantile(np.sort(sample), qs))
    bref = ray.put(bounds)

    def assign(df: pd.DataFrame):
        b = worker_state(("range_bounds", bref.hex()), lambda: ray.get(bref))
        rid = np.searchsorted(b, df[col].to_numpy(), side="right")
        return arrow_out(df.assign(range_id=rid.astype(np.int64)))

    ds.map_batches(assign, batch_format="pandas").write_parquet(
        out_dir, partition_cols=["range_id"]
    )
    return [float(x) for x in bounds]


def grouped_sum(
    ds: ray.data.Dataset,
    keys: list[str],
    value_cols: list[str],
    *,
    n_parts: int = DEFAULT_PARTS,
) -> ray.data.Dataset:
    """Exact grouped sums via int-keyed co-location — the drop-in
    replacement for ``groupby(keys).aggregate(Sum(...))`` on HIGH-
    cardinality keys.  Ray 2.49's streaming sort-aggregate degrades
    badly there (measured on the 150k-key Q18 rollup at sf0.1/32 CPUs:
    25.7 s fused groupby().aggregate() vs 2.8 s this way; its
    AggregateReduce burned 550 s of CPU on 580k rows).  Feed it the
    usual per-batch partials; each key lands in exactly one partition,
    so the C-speed pandas sum inside is the global sum.

    Output: keys + value_cols, one row per distinct key tuple.
    """
    from pdf_parser_ray.io_utils import arrow_out

    def sum_partition(part: pd.DataFrame):
        return arrow_out(
            part.groupby(list(keys), as_index=False)[list(value_cols)].sum()
        )

    return partitioned_map(ds, list(keys), sum_partition, n_parts=n_parts)


def grouped_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    spec: dict[str, tuple[str, str]],
    *,
    n_parts: int = DEFAULT_PARTS,
) -> ray.data.Dataset:
    """General co-location aggregate for HIGH-cardinality keys — the
    ``grouped_sum`` rationale extended to any pandas reduction.

    ``spec`` maps output column -> (input column, reduction name), e.g.
    ``{"n_docs": ("win_hash", "size"), "n_occ": ("cnt", "sum")}``;
    reduction names are pandas GroupBy aggregations ("sum", "min",
    "max", "size", "mean", ...).  Exact because each key tuple lands in
    exactly one partition.

    Output: keys + spec keys, one row per distinct key tuple.
    """
    from pdf_parser_ray.io_utils import arrow_out

    named = {out: pd.NamedAgg(column=c, aggfunc=f) for out, (c, f) in spec.items()}

    def agg_partition(part: pd.DataFrame):
        g = part.groupby(list(keys), as_index=False).agg(**named)
        for out, (_c, f) in spec.items():
            if f == "size":
                g[out] = g[out].astype("int64")
        return arrow_out(g)

    return partitioned_map(ds, list(keys), agg_partition, n_parts=n_parts)


def rendezvous_assign(
    ds,
    key_col: str,
    shards: "list[str]",
    *,
    out_col: str = "shard",
):
    """Rendezvous (highest-random-weight, Thaler & Ravishankar 1998)
    shard assignment: each key goes to the shard with the largest
    md5-derived weight of ``"{key}|{shard}"`` — the stable routing
    primitive behind shard maps and cache rings.  The HRW property
    (pinned by test): removing a shard moves ONLY the keys that lived
    on it; every other key keeps its assignment — unlike mod-N hashing
    where nearly all keys move.

    Weights are the first-16-hex md5 value (the repo's shared
    md5→UBIGINT idiom), ties broken by lexicographic shard name, so
    the DuckDB twin re-derives identical assignments.  The shard list
    is bounded and travels inside the closure; |shards| md5 calls per
    row, row-local, zero shuffle.

    Output: input columns + out_col:str.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    from pdf_parser_ray.io_utils import arrow_out

    names = sorted(shards)  # tie-break order = lexicographic

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[key_col].astype(str)
        best = np.zeros(len(df), dtype=np.uint64)
        pick = np.empty(len(df), dtype=object)
        first = True
        for s in names:
            w = np.fromiter(
                (
                    int(hashlib.md5(f"{k}|{s}".encode()).hexdigest()[:16], 16)
                    for k in keys
                ),
                dtype=np.uint64,
                count=len(df),
            )
            upd = w > best if not first else np.ones(len(df), dtype=bool)
            pick[upd] = s
            best = np.maximum(best, w)
            first = False
        out = df.copy()
        out[out_col] = pick
        return arrow_out(out)

    return ds.map_batches(assign, batch_format="pandas")
