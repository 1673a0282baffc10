"""Table profiling and referential-integrity auditing.

The data-quality counterpart of ops/curation.validate_rows: instead of
gating individual rows against declared expectations, these summarize a
whole table (per-column null/distinct/min-max profile) and audit
foreign-key relationships across tables (orphan counts) — the two
checks an ingest pipeline runs before and after a large load.

Both are expressed the streaming way:

* :func:`profile_table` makes two passes.  Pass A is pure per-batch
  partial aggregation (one row per (batch, column) carrying count /
  null-count / numeric min / numeric max) collapsed by a tiny
  ``groupby(col_name)`` — shuffle volume is O(batches x columns), never
  O(rows).  Pass B counts exact distincts with the distinct-pair
  combiner (``ops.sketches.grouped_distinct_exact``): batch-local
  dedup first, so the shuffle is bounded by the number of DISTINCT
  (column, value) pairs.  For columns whose distinct cardinality
  approaches the row count at 10^12 rows, swap pass B for the KMV /
  HLL sketches in ops/sketches.py (mergeable, constant-size) — the
  exact pass here is the oracle-checkable twin.

* :func:`ri_audit` builds each parent key set DISTRIBUTED (per-batch
  distinct over just the key column, driver union of the bounded
  partials — bytes moved = 8 x distinct keys, never the parent
  payload, and no shuffle at all), broadcasts the sorted key array
  once via ``ray.put``, and counts orphans with a vectorized
  ``searchsorted`` membership probe per batch.  A fact-sized parent
  (orders under lineitem) still fits this shape because only the KEY
  column travels; past broadcast size, route through
  ``relational.bloom_prefilter`` (definite-member prefilter) plus the
  partitioned ``relational.hash_join`` for the residue — same
  size-routing rule as the semi/anti joins.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _to_numeric(col: pd.Series) -> pd.Series | None:
    """Map a profilable column to float64 for min/max, or None if the
    dtype has no numeric order we report (strings/objects)."""
    if pd.api.types.is_datetime64_any_dtype(col):
        # epoch microseconds — exact in float64 up to 2^53 (year ~2255).
        # Pin the unit: pandas may hold datetime64[ns] or [us] depending
        # on the Arrow source, and a bare astype(int64) would differ by
        # 1000x between them.  NaT would cast to int64-min, so mask it
        # back to NaN before min/max.
        num = col.astype("datetime64[us]").astype("int64").astype("float64")
        return num.mask(col.isna())
    if pd.api.types.is_bool_dtype(col):
        return col.astype("float64")
    if pd.api.types.is_numeric_dtype(col):
        return col.astype("float64")
    return None


def _distinct_token(col: pd.Series) -> pd.Series:
    """Injective stringification for distinct counting (only equality
    matters — the oracle counts distincts natively on the typed col)."""
    if pd.api.types.is_datetime64_any_dtype(col):
        return col.astype("int64").astype("string")
    if pd.api.types.is_float_dtype(col):
        # repr roundtrips float64, so distinct strings == distinct floats.
        return col.map(repr).astype("string")
    return col.astype("string")


def profile_table(ds: ray.data.Dataset) -> pd.DataFrame:
    """One-pass-per-concern column profile of a Dataset.

    Output (one row per column, n_cols rows total):
    ``(col_name:str, n_rows:int64, n_nulls:int64, n_distinct:int64,
    min_num:double, max_num:double)`` — min/max are reported on a
    float64 scale (timestamps as epoch microseconds); non-numeric
    columns carry the 0.0 sentinel so the output schema stays uniform
    and NaN-free (NaN vs SQL NULL is undefined territory for the
    driver's value hash).
    """
    from ray.data.aggregate import Max, Min, Sum

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.sketches import grouped_distinct_exact

    def scalar_partial(df: pd.DataFrame) -> pa.Table:
        rows = []
        for name in df.columns:
            col = df[name]
            num = _to_numeric(col)
            has = num is not None and num.notna().any()
            rows.append(
                {
                    "col_name": name,
                    "n_rows": len(col),
                    "n_nulls": int(col.isna().sum()),
                    "is_num": bool(num is not None),
                    "min_num": float(num.min()) if has else np.inf,
                    "max_num": float(num.max()) if has else -np.inf,
                }
            )
        return arrow_out(pd.DataFrame(rows))

    scalars = (
        ds.map_batches(scalar_partial, batch_format="pandas")
        .groupby("col_name")
        .aggregate(
            Sum(on="n_rows", alias_name="n_rows"),
            Sum(on="n_nulls", alias_name="n_nulls"),
            Max(on="is_num", alias_name="is_num"),
            Min(on="min_num", alias_name="min_num"),
            Max(on="max_num", alias_name="max_num"),
        )
        .to_pandas()  # n_cols rows — driver-safe by construction
    )

    def melt_distinct(df: pd.DataFrame) -> pa.Table:
        parts = []
        for name in df.columns:
            # dropna BEFORE tokenizing: repr(nan) and NaT.astype(int64)
            # would otherwise smuggle null markers in as distinct values.
            v = _distinct_token(df[name].dropna()).drop_duplicates()
            # only the distinct COUNT survives — hash tokens to 64 bits
            # so wide values (document text) never ride the pair shuffle
            # (same rationale as k_anonymity_audit's sensitive hash)
            hv = pd.util.hash_array(
                v.to_numpy(dtype=object)
            ).astype("uint64").view("int64")
            parts.append(pd.DataFrame({"col_name": name, "v": hv}))
        return arrow_out(pd.concat(parts, ignore_index=True))

    distincts = grouped_distinct_exact(
        ds.map_batches(melt_distinct, batch_format="pandas"), "col_name", "v"
    ).to_pandas()

    out = scalars.merge(distincts, on="col_name", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0)  # all-null column
    non_num = ~out["is_num"].astype(bool)
    out.loc[non_num, ["min_num", "max_num"]] = 0.0
    out = out.drop(columns="is_num").sort_values("col_name", ignore_index=True)
    return out.astype(
        {"n_rows": "int64", "n_nulls": "int64", "n_distinct": "int64"}
    )[["col_name", "n_rows", "n_nulls", "n_distinct", "min_num", "max_num"]]


def _distinct_keys(parent: ray.data.Dataset, pk: str) -> np.ndarray:
    """Sorted distinct int64 key array, built with ZERO shuffle: each
    batch emits its local distinct keys (the combiner), the driver
    unions the bounded partials.  Driver memory equals the broadcast
    key array we need anyway — same footprint as ``Dataset.unique`` but
    without paying that aggregate's all-to-all exchange (measured ~1 s
    of shuffle floor per relation at sf0.1).  Past broadcast size,
    route through relational.bloom_prefilter + hash_join instead."""

    def batch_distinct(df: pd.DataFrame) -> pa.Table:
        from pdf_parser_ray.io_utils import arrow_out

        return arrow_out(
            pd.DataFrame({pk: df[pk].dropna().unique()}).astype("int64")
        )

    parts = (
        parent.select_columns([pk])
        .map_batches(batch_distinct, batch_format="pandas")
        .take_all()  # bounded by the distinct key count (broadcast-sized)
    )
    if not parts:
        return np.empty(0, dtype="int64")
    return np.unique(np.fromiter((r[pk] for r in parts), dtype="int64"))


def key_skew(
    ds: ray.data.Dataset,
    key: str,
    *,
    top_k: int = 20,
) -> ray.data.Dataset:
    """Shuffle-key skew diagnostic: the ``top_k`` heaviest key values
    and their row counts — the check to run BEFORE choosing a
    partitioning key (a hot key here means salting or a broadcast
    route; every shuffle planning note in this repo starts from this
    histogram).

    Shape: per-batch value_counts partials (the combiner) →
    key-cardinality co-location sum (ops.shuffle.grouped_sum) → tiny
    global sort-limit.  Deterministic (n DESC, key ASC) tie-break.

    Output: (key, n:int64), top_k rows.
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    def partial(df: pd.DataFrame) -> pa.Table:
        g = df[key].value_counts().reset_index()
        g.columns = [key, "n"]
        return arrow_out(g.astype({"n": "int64"}))

    counts = grouped_sum(
        ds.select_columns([key]).map_batches(partial, batch_format="pandas"),
        [key], ["n"],
    )
    return counts.sort(["n", key], descending=[True, False]).limit(top_k)


def grouped_corr(
    ds: ray.data.Dataset,
    x: str,
    y: str,
    by: str,
    *,
    round_to: int = 4,
) -> ray.data.Dataset:
    """Pearson correlation of two numeric columns per group, from
    one-pass sufficient statistics: each batch folds to one
    (group, n, Σx, Σy, Σxx, Σyy, Σxy) row, a group-cardinality groupby
    sums them, and the closed-form estimate runs on the tiny aggregate.
    Shuffle volume is O(batches x groups); rows with a NULL in either
    column are excluded (SQL corr semantics).

    The final value is the naive-sums formula
    (nΣxy − ΣxΣy) / sqrt((nΣxx − Σx²)(nΣyy − Σy²)) rounded to
    ``round_to`` — the SQL twin spells out the SAME expression tree over
    its own sums, so cross-engine drift is limited to last-ulp
    summation noise on the Σ terms, far inside the rounding.  Groups
    with zero variance in either column yield NULL (dropped).

    Output: (by, n:int64, corr:float64), one row per group.
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame) -> pa.Table:
        d = df[[by, x, y]].dropna(subset=[x, y])
        xs = d[x].astype("float64")
        ys = d[y].astype("float64")
        g = (
            pd.DataFrame(
                {
                    by: d[by],
                    "n": 1,
                    "sx": xs,
                    "sy": ys,
                    "sxx": xs * xs,
                    "syy": ys * ys,
                    "sxy": xs * ys,
                }
            )
            .groupby(by, as_index=False)
            .sum()
        )
        g["n"] = g["n"].astype("int64")
        return arrow_out(g)

    sums = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(by)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
    )

    def finalize(df: pd.DataFrame) -> pa.Table:
        n = df["n"].astype("float64")
        cov = n * df["sxy"] - df["sx"] * df["sy"]
        vx = n * df["sxx"] - df["sx"] ** 2
        vy = n * df["syy"] - df["sy"] ** 2
        denom = np.sqrt(vx * vy)
        out = pd.DataFrame(
            {
                by: df[by],
                "n": df["n"].astype("int64"),
                "corr": np.round(cov / denom, round_to),
            }
        )
        out = out[np.isfinite(out["corr"])]
        return arrow_out(out)

    return sums.map_batches(finalize, batch_format="pandas")


def orphan_count(
    child: ray.data.Dataset, fk: str, parent: ray.data.Dataset, pk: str
) -> tuple[int, int]:
    """(n_child_rows, n_orphans): child rows whose ``fk`` has no match
    in parent's ``pk``.  NULL foreign keys count as orphans (they
    reference nothing)."""
    return _orphan_count_with_keys(child, fk, _distinct_keys(parent, pk))


def _orphan_count_with_keys(
    child: ray.data.Dataset, fk: str, key_arr: np.ndarray
) -> tuple[int, int]:
    key_ref = ray.put(key_arr)

    def partial(df: pd.DataFrame) -> pa.Table:
        arr = ray.get(key_ref)
        col = df[fk]
        vals = col.fillna(-(2**62)).astype("int64").to_numpy()
        pos = np.searchsorted(arr, vals)
        hit = (pos < len(arr)) & (arr[np.minimum(pos, len(arr) - 1)] == vals)
        hit &= col.notna().to_numpy()
        from pdf_parser_ray.io_utils import arrow_out

        return arrow_out(
            pd.DataFrame(
                {"n": [len(df)], "orphans": [int((~hit).sum())]}
            ).astype("int64")
        )

    totals = child.select_columns([fk]).map_batches(
        partial, batch_format="pandas"
    )
    n = totals.sum(["n", "orphans"])
    return int(n["sum(n)"]), int(n["sum(orphans)"])


RI_BROADCAST_MAX_KEYS = 5_000_000  # ~40 MB of int64 keys per parent


def ri_audit(
    relations: list[tuple[str, ray.data.Dataset, str, ray.data.Dataset, str]],
    *,
    mode: str = "auto",
    broadcast_max_keys: int = RI_BROADCAST_MAX_KEYS,
    n_parts: int | None = None,
) -> pd.DataFrame:
    """Referential-integrity audit over (name, child, fk, parent, pk)
    relations.  Output: (relation:str, n_rows:int64, n_orphans:int64),
    one row per relation, sorted by relation name.  NULL foreign keys
    count as orphans on both routes.

    Two routes, chosen PER RELATION (``mode="auto"`` | "broadcast" |
    "join"):

    * **broadcast** — dimension-sized parents: every distinct parent
      key lands on the driver once, is ``ray.put`` once, and each child
      batch does a vectorized searchsorted membership probe.  Exactly
      TWO Dataset runs for all broadcast relations together (all parent
      key passes union into one tagged execution, all child probes into
      a second — each execution costs ~0.4-0.7 s fixed, so the naive
      per-relation loop paid ~11 for six relations); a parent Dataset
      object reused across relations (same object, same key column) is
      scanned once.
    * **join** — FACT-sized parents (VERDICT r3 #1: ``lineitem →
      orders`` pulls every distinct orderkey to the driver — billions
      at 100× scale): child fk counts and parent distinct keys
      co-partition by key hash; inside each partition the parent
      membership check is a vectorized merge, and only ONE
      (n, orphans) partial row per relation per partition ever reaches
      the driver.  Nothing key-cardinality is ever collected or
      broadcast.  Parent scans are deduped across relations here too.

    ``auto`` routes a relation by the parent's no-exec row estimate
    (parquet-footer sum — an upper bound on distinct keys; unknown →
    join, the safe direction) against ``broadcast_max_keys``.
    Route parity is pinned by test; the sf-fixture oracle covers the
    broadcast route the driver samples.
    """
    from pdf_parser_ray.io_utils import arrow_out, unreserve

    if not relations:
        return pd.DataFrame(
            {"relation": pd.Series([], dtype="object"),
             "n_rows": pd.Series([], dtype="int64"),
             "n_orphans": pd.Series([], dtype="int64")}
        )
    if mode not in ("auto", "broadcast", "join"):
        raise ValueError(f"mode must be auto|broadcast|join, got {mode!r}")

    # -- per-relation route decision (no plan execution: footer sums)
    from pdf_parser_ray.ops.dedup import _rows_estimate_no_exec

    est_cache: dict[tuple[int, str], int | None] = {}

    def parent_route(parent: ray.data.Dataset, pk: str) -> str:
        if mode != "auto":
            return mode
        ck = (id(parent), pk)
        if ck not in est_cache:
            est_cache[ck] = _rows_estimate_no_exec(parent)
        e = est_cache[ck]
        return "broadcast" if (e is not None and e <= broadcast_max_keys) else "join"

    bc_rels = []  # (rel_idx, name, child, fk, parent, pk)
    join_rels = []
    for rel_idx, (name, child, fk, parent, pk) in enumerate(relations):
        tgt = bc_rels if parent_route(parent, pk) == "broadcast" else join_rels
        tgt.append((rel_idx, name, child, fk, parent, pk))

    results: dict[int, tuple[int, int]] = {}  # rel_idx -> (n, orphans)

    # ================================================ broadcast route
    if bc_rels:
        # -- pass 1: every distinct (parent, pk) in one union'd execution
        parent_ix: dict[tuple[int, str], int] = {}
        parent_specs: list[tuple[ray.data.Dataset, str]] = []
        for _, _, _, _, parent, pk in bc_rels:
            ck = (id(parent), pk)
            if ck not in parent_ix:
                parent_ix[ck] = len(parent_specs)
                parent_specs.append((parent, pk))

        def key_pass(idx: int, parent: ray.data.Dataset, pk: str):
            def batch_distinct(df: pd.DataFrame) -> pa.Table:
                k = pd.Series(df[pk].dropna().unique()).astype("int64")
                return arrow_out(pd.DataFrame({"src": np.int64(idx), "k": k}))

            return parent.select_columns([pk]).map_batches(
                batch_distinct, batch_format="pandas"
            )

        union_keys = key_pass(0, *parent_specs[0])
        for i, spec in enumerate(parent_specs[1:], 1):
            union_keys = union_keys.union(key_pass(i, *spec))
        # union-of-maps plan: reservation starves it (io_utils.unreserve)
        kt = unreserve(union_keys).to_pandas()  # bounded: broadcast-sized
        key_refs = [
            ray.put(np.unique(
                kt.loc[kt["src"] == i, "k"].to_numpy(dtype="int64")
            ))
            for i in range(len(parent_specs))
        ]

        # -- pass 2: every child probe in one union'd execution
        def probe_pass(rel_idx: int, child: ray.data.Dataset, fk: str, ref):
            def partial(df: pd.DataFrame) -> pa.Table:
                arr = ray.get(ref)
                col = df[fk]
                vals = col.fillna(-(2**62)).astype("int64").to_numpy()
                pos = np.searchsorted(arr, vals)
                hit = (pos < len(arr)) & (
                    arr[np.minimum(pos, max(len(arr) - 1, 0))] == vals
                ) if len(arr) else np.zeros(len(vals), dtype=bool)
                hit &= col.notna().to_numpy()
                return arrow_out(
                    pd.DataFrame(
                        {"rel": [rel_idx], "n": [len(df)],
                         "orphans": [int((~hit).sum())]}
                    ).astype("int64")
                )

            return child.select_columns([fk]).map_batches(
                partial, batch_format="pandas"
            )

        probes = None
        for rel_idx, name, child, fk, parent, pk in bc_rels:
            p = probe_pass(
                rel_idx, child, fk, key_refs[parent_ix[(id(parent), pk)]]
            )
            probes = p if probes is None else probes.union(p)
        totals = unreserve(probes).to_pandas().groupby("rel").sum()
        for rel_idx, *_rest in bc_rels:
            if rel_idx in totals.index:
                results[rel_idx] = (
                    int(totals.loc[rel_idx, "n"]),
                    int(totals.loc[rel_idx, "orphans"]),
                )

    # ===================================================== join route
    if join_rels:
        from pdf_parser_ray.ops.shuffle import partitioned_map

        # parent scans deduped: tag parent keys by parent-spec index
        # and map each relation to its spec inside the partition kernel
        j_parent_ix: dict[tuple[int, str], int] = {}
        j_parent_specs: list[tuple[ray.data.Dataset, str]] = []
        for _, _, _, _, parent, pk in join_rels:
            ck = (id(parent), pk)
            if ck not in j_parent_ix:
                j_parent_ix[ck] = len(j_parent_specs)
                j_parent_specs.append((parent, pk))
        rel_to_spec = {
            rel_idx: j_parent_ix[(id(parent), pk)]
            for rel_idx, _, _, _, parent, pk in join_rels
        }

        # row kinds in the unioned key stream:
        #   0 = child fk counts (rel, k, c)         — per-batch partials
        #   1 = parent distinct keys (spec→rel col, k) — per-batch
        #   2 = child NULL-fk counts (rel, c); k=0 carries no meaning
        def child_pass(rel_idx: int, child: ray.data.Dataset, fk: str):
            def partial(df: pd.DataFrame) -> pa.Table:
                col = df[fk]
                nn = col.dropna().astype("int64")
                vc = nn.value_counts()
                frames = [pd.DataFrame({
                    "k": vc.index.to_numpy(dtype="int64"),
                    "rel": np.int64(rel_idx),
                    "c": vc.to_numpy(dtype="int64"),
                    "kind": np.int64(0),
                })]
                n_null = len(col) - len(nn)
                if n_null:
                    frames.append(pd.DataFrame({
                        "k": [np.int64(0)], "rel": [np.int64(rel_idx)],
                        "c": [np.int64(n_null)], "kind": [np.int64(2)],
                    }))
                return arrow_out(pd.concat(frames, ignore_index=True))

            return child.select_columns([fk]).map_batches(
                partial, batch_format="pandas"
            )

        def parent_pass(spec_idx: int, parent: ray.data.Dataset, pk: str):
            def partial(df: pd.DataFrame) -> pa.Table:
                k = pd.Series(df[pk].dropna().unique()).astype("int64")
                return arrow_out(pd.DataFrame({
                    "k": k,
                    "rel": np.full(len(k), spec_idx, dtype="int64"),
                    "c": np.zeros(len(k), dtype="int64"),
                    "kind": np.ones(len(k), dtype="int64"),
                }))

            return parent.select_columns([pk]).map_batches(
                partial, batch_format="pandas"
            )

        stream = None
        for rel_idx, _name, child, fk, _parent, _pk in join_rels:
            p = child_pass(rel_idx, child, fk)
            stream = p if stream is None else stream.union(p)
        for spec_idx, (parent, pk) in enumerate(j_parent_specs):
            stream = stream.union(parent_pass(spec_idx, parent, pk))

        spec_of_rel = dict(rel_to_spec)  # closure-safe copy

        def per_partition(part: pd.DataFrame) -> pd.DataFrame:
            ch = part[part["kind"] == 0]
            par = part.loc[part["kind"] == 1, ["rel", "k"]].drop_duplicates()
            par = par.rename(columns={"rel": "spec"}).assign(_hit=1)
            nulls = part[part["kind"] == 2]
            rows = {}
            if len(ch):
                probe = ch.assign(
                    spec=ch["rel"].map(spec_of_rel).astype("int64")
                ).merge(par, on=["spec", "k"], how="left")
                n_by = probe.groupby("rel")["c"].sum()
                orph_by = probe.loc[probe["_hit"].isna()].groupby(
                    "rel")["c"].sum()
                for r, n in n_by.items():
                    rows[int(r)] = [int(n), int(orph_by.get(r, 0))]
            for r, c in zip(nulls["rel"], nulls["c"]):
                cur = rows.setdefault(int(r), [0, 0])
                cur[0] += int(c)
                cur[1] += int(c)  # NULL fk is an orphan (broadcast parity)
            return pd.DataFrame({
                "rel": pd.Series(list(rows), dtype="int64"),
                "n": pd.Series([v[0] for v in rows.values()], dtype="int64"),
                "orphans": pd.Series(
                    [v[1] for v in rows.values()], dtype="int64"),
            })

        part_kw = {"n_parts": n_parts} if n_parts else {}
        jt = unreserve(partitioned_map(
            stream, ["k"], per_partition, **part_kw
        )).to_pandas()  # bounded: ≤ relations × n_parts rows
        if len(jt):
            jtot = jt.groupby("rel")[["n", "orphans"]].sum()
            for rel_idx, *_rest in join_rels:
                if rel_idx in jtot.index:
                    results[rel_idx] = (
                        int(jtot.loc[rel_idx, "n"]),
                        int(jtot.loc[rel_idx, "orphans"]),
                    )

    rows = [
        {"relation": name,
         "n_rows": results.get(i, (0, 0))[0],
         "n_orphans": results.get(i, (0, 0))[1]}
        for i, (name, *_rest) in enumerate(relations)
    ]
    out = pd.DataFrame(rows).sort_values("relation", ignore_index=True)
    return out.astype({"n_rows": "int64", "n_orphans": "int64"})


def embedding_dim_stats(
    ds: "ray.data.Dataset", col: str = "embedding", round_to: int = 4
) -> "ray.data.Dataset":
    """Per-dimension mean/variance over a ``list<float>`` embedding
    column — the feature-scaling statistics a normalization or PCA
    stage is fit from.

    One pass: each batch stacks its vectors into a (rows x dim) matrix
    and emits ONE partial row per dimension (sum, sum-of-squares,
    count), so the shuffle is O(batches x dim), never O(rows).  The
    finish computes mean = s/n and the naive-sums variance
    (ss - s*s/n)/n — the same expression tree the SQL twin spells —
    rounded to ``round_to`` (cross-row float-sum contract).

    Output: (dim:int64 1-based, mean:float64, variance:float64).
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.vstack(df[col].to_numpy()).astype(np.float64)
        return arrow_out(
            pd.DataFrame(
                {
                    "dim": np.arange(1, m.shape[1] + 1, dtype=np.int64),
                    "s": m.sum(axis=0),
                    "ss": (m * m).sum(axis=0),
                    "n": np.int64(m.shape[0]),
                }
            )
        )

    agg = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pandas")
        .groupby("dim")
        .aggregate(
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
            Sum("n", alias_name="n"),
        )
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        s, ss, n = df["s"], df["ss"], df["n"]
        return pd.DataFrame(
            {
                "dim": df["dim"].astype("int64"),
                "mean": (s / n).round(round_to),
                "variance": ((ss - s * s / n) / n).round(round_to),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def grouped_zscore_outliers(
    ds: "ray.data.Dataset",
    *,
    key: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    z: int = 3,
    scale: int = 100,
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Per-group z-score outlier flags with NO float contract: values
    are fixed-point (``scale``=100 → cents), and the |v - mean| > z·σ
    test is evaluated in cross-multiplied int64 —
    (n·v - s)² > z²·(n·ss - s²) — so both engines compare identical
    integers (exact under int64 given v·scale ≲ 1e4 and group rows
    ≲ 1e4; grows as n²·v²).

    One co-locating shuffle by ``key``; group sums are vectorized
    transforms across the whole partition.

    Output: (id_col, key, is_outlier:bool).
    """
    z2 = int(z) * int(z)

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        vc = np.rint(part[value_col].to_numpy() * scale).astype(np.int64)
        f = pd.DataFrame({key: part[key].to_numpy(), "vc": vc})
        g = f.groupby(key, sort=False)["vc"]
        s = g.transform("sum").to_numpy()
        n = g.transform("size").to_numpy()
        ss = (
            f.assign(v2=f["vc"] * f["vc"])
            .groupby(key, sort=False)["v2"]
            .transform("sum")
            .to_numpy()
        )
        lhs = n * vc - s
        flag = lhs * lhs > z2 * (n * ss - s * s)
        return pd.DataFrame(
            {
                id_col: part[id_col].to_numpy(),
                key: part[key].to_numpy(),
                "is_outlier": flag,
            }
        )

    from pdf_parser_ray.ops.shuffle import partitioned_map

    return partitioned_map(
        ds.select_columns([id_col, key, value_col]),
        [key],
        per_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def dup_ratio_by_source(
    ds: "ray.data.Dataset",
    *,
    group_col: str = "source",
    text_col: str = "text",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Per-source duplication health metric: row count, distinct-text
    count (by md5, so any SQL engine re-derives it) and the duplicate
    ratio — the first corpus report a curation run prints.

    One (group, hash) co-locating shuffle carrying per-batch partial
    counts (batch-local dedup first, so shuffle rows are bounded by
    distinct texts per batch, never corpus rows); the per-source
    rollup that follows is group-cardinality tiny.  The ratio is an
    exact int/int expression — no rounding contract.

    Output: (group_col, n_docs:int64, n_distinct:int64,
    dup_ratio:float64).
    """
    import hashlib

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_agg, grouped_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df[text_col]
        h = pd.Series(
            [
                hashlib.md5(str(v).encode("utf-8")).hexdigest()
                if v is not None and v == v
                else None
                for v in t
            ],
            index=df.index,
        )
        g = (
            pd.DataFrame({group_col: df[group_col], "h": h})
            .groupby([group_col, "h"], as_index=False, dropna=False)
            .size()
        )
        g["n"] = g.pop("size").astype("int64")
        return arrow_out(g)

    pair_counts = grouped_sum(
        ds.map_batches(partial, batch_format="pandas"),
        [group_col, "h"],
        ["n"],
        **({"n_parts": n_parts} if n_parts else {}),
    )

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        nn = df["h"].notna()
        g = (
            pd.DataFrame(
                {
                    group_col: df[group_col],
                    "n_docs": df["n"].astype("int64"),
                    "n_distinct": nn.astype("int64"),
                }
            )
            .groupby(group_col, as_index=False)
            .sum()
        )
        return arrow_out(g)

    from ray.data.aggregate import Sum

    out = (
        pair_counts.map_batches(rollup, batch_format="pandas")
        .groupby(group_col)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_distinct", alias_name="n_distinct"),
        )
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        nd = df["n_docs"].astype("int64")
        nu = df["n_distinct"].astype("int64")
        return pd.DataFrame(
            {
                group_col: df[group_col],
                "n_docs": nd,
                "n_distinct": nu,
                "dup_ratio": (nd - nu).astype("float64")
                / nd.astype("float64"),
            }
        )

    return out.map_batches(finish, batch_format="pandas")


def table_checksum(
    ds: "ray.data.Dataset",
    key_col: str,
    text_col: str,
    *,
    group_col: str = "source",
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Order-insensitive per-group table checksum: the uint64
    wraparound sum of md5-prefix row hashes — the anti-entropy
    fingerprint two replicas (or a source and its re-run) compare to
    verify they hold identical rows, without moving any data.

    Exact at ANY row count: int64 two's-complement wraparound during
    the distributed sum IS mod-2^64 arithmetic, and the SQL twin sums
    exactly in HUGEINT then takes mod 2^64 — identical bit patterns.
    Shuffle volume is one partial row per (batch, group).

    Output: (group_col, checksum_hex:string 16 chars).
    """
    import hashlib

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        basis = (
            df[key_col].astype(str) + ":" + df[text_col].fillna("").astype(str)
        )
        h = np.fromiter(
            (
                int(hashlib.md5(v.encode("utf-8")).hexdigest()[:16], 16)
                for v in basis
            ),
            dtype=np.uint64,
            count=len(basis),
        ).view(np.int64)
        g = (
            pd.DataFrame({group_col: df[group_col], "part": h})
            .groupby(group_col, as_index=False)["part"]
            .sum()  # numpy int64 reduce: wraps mod 2^64 by design
        )
        g["part"] = g["part"].astype("int64")
        return arrow_out(g)

    sums = grouped_sum(
        ds.map_batches(partial, batch_format="pandas"),
        [group_col],
        ["part"],
        **({"n_parts": n_parts} if n_parts else {}),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        u = df["part"].to_numpy(dtype=np.int64).view(np.uint64)
        return pd.DataFrame(
            {
                group_col: df[group_col],
                "checksum_hex": [format(x, "016x") for x in u],
            }
        )

    return sums.map_batches(finish, batch_format="pandas")


def embedding_covariance(
    ds: "ray.data.Dataset", col: str = "embedding", round_to: int = 4
) -> "ray.data.Dataset":
    """Upper-triangle covariance matrix of the embedding columns — the
    PCA-fit moment pass (fit-small/apply-wide: the dim×dim moments are
    the only thing that ever leaves the scan; an eigendecomposition of
    the returned matrix is a driver-side O(dim³) afterthought).

    One pass: each batch matmuls its (rows × dim) block into ONE
    dim×dim Gram partial plus per-dim sums, emitted long as
    (i, j, sxy, si, sj, n) for i ≤ j — O(batches × dim²) shuffle rows,
    never O(rows).  The finish computes the naive-sums covariance
    (sxy − si·sj/n)/n — the same expression tree the SQL twin spells —
    rounded to ``round_to`` (cross-row float-sum contract, the
    embedding_dim_stats convention).

    Output: (i:int64, j:int64, cov:float64), 1-based dims, i ≤ j.
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.vstack(df[col].to_numpy()).astype(np.float64)
        gram = m.T @ m
        s = m.sum(axis=0)
        iu, ju = np.triu_indices(m.shape[1])
        return arrow_out(
            pd.DataFrame(
                {
                    "i": (iu + 1).astype(np.int64),
                    "j": (ju + 1).astype(np.int64),
                    "sxy": gram[iu, ju],
                    "si": s[iu],
                    "sj": s[ju],
                    "n": np.int64(m.shape[0]),
                }
            )
        )

    # 2080 (i, j) keys at dim=64: the streaming sort-aggregate degrades
    # on key spaces this size (the Q18 lesson, BASELINE.md) — co-locate
    # instead (measured 13.5 s -> ~1 s at sf0.1/32 CPUs).
    from pdf_parser_ray.ops.shuffle import grouped_sum

    agg = grouped_sum(
        ds.select_columns([col]).map_batches(partial, batch_format="pandas"),
        ["i", "j"],
        ["sxy", "si", "sj", "n"],
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        sxy, si, sj, n = df["sxy"], df["si"], df["sj"], df["n"]
        return pd.DataFrame(
            {
                "i": df["i"].astype("int64"),
                "j": df["j"].astype("int64"),
                "cov": ((sxy - si * sj / n) / n).round(round_to),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def grouped_ols(
    ds: ray.data.Dataset,
    x: str,
    y: str,
    by: str,
    *,
    x_cents: bool = False,
    y_cents: bool = False,
    round_to: int = 6,
) -> ray.data.Dataset:
    """Per-group simple linear regression (OLS slope + intercept of
    ``y`` on ``x``) from one-pass sufficient statistics — the trend
    estimator of a pricing/drift audit, same plan as
    :func:`grouped_corr`: per-batch (group, n, Σx, Σy, Σxx, Σxy)
    partials, one bounded groupby, closed form on the tiny aggregate.

    EXACT-sums contract: with ``x_cents`` / ``y_cents`` the inputs are
    snapped to int64 cents so every Σ term is an exact integer —
    both engines then evaluate the identical float expression
    slope = (nΣxy − ΣxΣy) / (nΣxx − Σx²),
    intercept = (Σy − slope·Σx) / n
    over bit-identical operands (cross-engine drift: zero; rounding is
    cosmetic).  Without the cents flags the sums are float64 and the
    usual same-tree + round contract applies.  Zero-variance groups
    drop (slope undefined).

    Output: (by, n:int64, slope:float64, intercept:float64) — slope and
    intercept are in INPUT units (cents scaling cancels in slope/x and
    is divided back out of the intercept).
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    def snap(s: pd.Series, cents: bool) -> np.ndarray:
        v = s.to_numpy(dtype=np.float64)
        if cents:
            return np.rint(v * 100.0).astype(np.int64)
        return v

    def partial(df: pd.DataFrame) -> pa.Table:
        d = df[[by, x, y]].dropna(subset=[x, y])
        xs = snap(d[x], x_cents)
        ys = snap(d[y], y_cents)
        g = (
            pd.DataFrame(
                {
                    by: d[by],
                    "n": np.int64(1),
                    "sx": xs,
                    "sy": ys,
                    "sxx": xs * xs,
                    "sxy": xs * ys,
                }
            )
            .groupby(by, as_index=False)
            .sum()
        )
        return arrow_out(g)

    sums = grouped_sum(
        ds.map_batches(partial, batch_format="pandas"),
        [by],
        ["n", "sx", "sy", "sxx", "sxy"],
    )

    xs_scale = 100.0 if x_cents else 1.0
    ys_scale = 100.0 if y_cents else 1.0

    def finalize(df: pd.DataFrame) -> pa.Table:
        n = df["n"].astype("float64")
        sx = df["sx"].astype("float64")
        sy = df["sy"].astype("float64")
        num = n * df["sxy"].astype("float64") - sx * sy
        den = n * df["sxx"].astype("float64") - sx * sx
        with np.errstate(divide="ignore", invalid="ignore"):
            slope_s = num / den  # in SCALED units (cents if flagged)
            # unscale with the exact op order the SQL twin spells:
            # divide by the y scale, multiply by the x scale (each a
            # power of ten or the bit-exact no-op 1.0)
            slope = slope_s / ys_scale * xs_scale
            intercept = ((sy - slope_s * sx) / n) / ys_scale
        out = pd.DataFrame(
            {
                by: df[by],
                "n": df["n"].astype("int64"),
                "slope": np.round(slope, round_to),
                "intercept": np.round(intercept, round_to),
            }
        )
        out = out[np.isfinite(out["slope"])]
        return arrow_out(out)

    return sums.map_batches(finalize, batch_format="pandas")


def grouped_skew_kurt(
    ds: ray.data.Dataset,
    val: str,
    by: str,
    *,
    round_to: int = 4,
) -> ray.data.Dataset:
    """Population skewness and excess kurtosis per group from one-pass
    raw-moment sums (n, Σx … Σx⁴) — the shape profile of a value
    distribution (heavy tails / asymmetry) that a histogram only shows
    qualitatively.

    Plan: per-batch moment partials → one bounded groupby → closed
    form.  Sums are float64 (x⁴ overflows int64 at realistic value
    ranges), so the SQL twin spells the SAME central-moment expression
    tree over its own Σ terms and both sides round to ``round_to`` —
    the cross-row-aggregate rule (summation-order noise only).
    Zero-variance groups drop.

    Output: (by, n:int64, skewness:float64, kurtosis:float64) where
    kurtosis is EXCESS kurtosis (normal = 0).
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame) -> pa.Table:
        d = df[[by, val]].dropna(subset=[val])
        xs = d[val].to_numpy(dtype=np.float64)
        g = (
            pd.DataFrame(
                {
                    by: d[by],
                    "n": np.int64(1),
                    "s1": xs,
                    "s2": xs * xs,
                    "s3": xs * xs * xs,
                    "s4": xs * xs * xs * xs,
                }
            )
            .groupby(by, as_index=False)
            .sum()
        )
        g["n"] = g["n"].astype("int64")
        return arrow_out(g)

    sums = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(by)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2"),
            Sum("s3", alias_name="s3"),
            Sum("s4", alias_name="s4"),
        )
    )

    def finalize(df: pd.DataFrame) -> pa.Table:
        n = df["n"].astype("float64")
        m = df["s1"] / n
        # central moments via the binomial expansion over raw sums —
        # the SQL twin uses this EXACT tree (not two-pass centering).
        m2 = df["s2"] / n - m * m
        m3 = df["s3"] / n - 3.0 * m * (df["s2"] / n) + 2.0 * m**3
        m4 = (
            df["s4"] / n
            - 4.0 * m * (df["s3"] / n)
            + 6.0 * m * m * (df["s2"] / n)
            - 3.0 * m**4
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            skew = m3 / m2**1.5
            kurt = m4 / (m2 * m2) - 3.0
        out = pd.DataFrame(
            {
                by: df[by],
                "n": df["n"].astype("int64"),
                "skewness": np.round(skew, round_to),
                "kurtosis": np.round(kurt, round_to),
            }
        )
        out = out[np.isfinite(out["skewness"])]
        return arrow_out(out)

    return sums.map_batches(finalize, batch_format="pandas")


def rank_auc(
    ds: ray.data.Dataset,
    score_col: str,
    label_col: str,
    *,
    round_to: int = 6,
) -> pd.DataFrame:
    """Mann-Whitney AUC of an INTEGER score ranking a boolean label —
    "does this quality signal actually separate the classes?", the
    classifier-free evaluation every filter heuristic needs before it
    gates a corpus.

    AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻), computed exactly
    from per-score class counts: one bounded groupby(score) of
    per-batch partials (distinct integer scores ≤ max-score — bounded,
    never O(rows)), then an ordered prefix scan over that tiny table:
    2U = Σ_s n⁺(s)·(2·Σ_{t<s} n⁻(t) + n⁻(s)).  All arithmetic until the
    final division is int64-exact, so the SQL window twin is
    value-identical; the one division rounds to ``round_to``.

    Returns a one-row DataFrame (auc:float64, n_pos:int64,
    n_neg:int64) — driver-sized by construction.
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame) -> pa.Table:
        pos = df[label_col].to_numpy(dtype=bool)
        g = (
            pd.DataFrame(
                {
                    "s": df[score_col].to_numpy(dtype=np.int64),
                    "np_": pos.astype("int64"),
                    "nn_": (~pos).astype("int64"),
                }
            )
            .groupby("s", as_index=False)
            .sum()
        )
        return arrow_out(g)

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("s")
        .aggregate(Sum("np_", alias_name="np_"), Sum("nn_", alias_name="nn_"))
        .to_pandas()  # ≤ distinct integer scores — bounded
        .sort_values("s")
    )
    n_pos = int(counts["np_"].sum())
    n_neg = int(counts["nn_"].sum())
    if n_pos == 0 or n_neg == 0:
        return pd.DataFrame(
            {"auc": [float("nan")], "n_pos": [n_pos], "n_neg": [n_neg]}
        )
    neg_below = counts["nn_"].cumsum().shift(fill_value=0).to_numpy(dtype=np.int64)
    two_u = int(
        (
            counts["np_"].to_numpy(dtype=np.int64)
            * (2 * neg_below + counts["nn_"].to_numpy(dtype=np.int64))
        ).sum()
    )
    auc = round(two_u / (2.0 * n_pos * n_neg), round_to)
    return pd.DataFrame({"auc": [auc], "n_pos": [n_pos], "n_neg": [n_neg]})


def contingency_chi2(
    ds: ray.data.Dataset,
    row_col: str,
    col_col: str,
    *,
    round_to: int = 6,
) -> pd.DataFrame:
    """Pearson chi-square independence test of two categorical columns
    (+ Cramér's V effect size) — "is the language mix actually different
    across sources, or just noise?", the cross-tab audit behind any
    stratification decision.

    One bounded groupby of per-batch (row, col) count partials builds
    the contingency table (R × C cells — bounded, never O(rows));
    marginals, expected counts and the χ² sum run on that tiny table at
    the driver.  Counts stay int64-exact end-to-end, so the SQL twin's
    only float drift is cell-summation order in the final χ² — far
    inside ``round_to``.  Zero cells of the observed R × C grid COUNT
    (expected > 0 whenever both marginals > 0, which observed rows
    guarantee).

    Returns a one-row DataFrame (chi2:float64, dof:int64,
    cramers_v:float64, n:int64).
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame) -> pa.Table:
        g = (
            df[[row_col, col_col]]
            .assign(n=np.int64(1))
            .groupby([row_col, col_col], as_index=False)
            .sum()
        )
        g["n"] = g["n"].astype("int64")
        return arrow_out(g)

    obs = (
        ds.select_columns([row_col, col_col])
        .map_batches(partial, batch_format="pandas")
        .groupby([row_col, col_col])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # R × C cells — bounded
    )
    total = int(obs["n"].sum())
    table = obs.pivot_table(
        index=row_col, columns=col_col, values="n", fill_value=0
    ).astype("int64")
    r_tot = table.sum(axis=1).to_numpy(dtype=np.float64)
    c_tot = table.sum(axis=0).to_numpy(dtype=np.float64)
    expected = np.outer(r_tot, c_tot) / float(total)
    o = table.to_numpy(dtype=np.float64)
    chi2 = float(((o - expected) ** 2 / expected).sum())
    dof = (table.shape[0] - 1) * (table.shape[1] - 1)
    k = min(table.shape[0] - 1, table.shape[1] - 1)
    v = math.sqrt(chi2 / (total * k)) if k > 0 else float("nan")
    return pd.DataFrame(
        {
            "chi2": [round(chi2, round_to)],
            "dof": np.array([dof], dtype="int64"),
            "cramers_v": [round(v, round_to)],
            "n": np.array([total], dtype="int64"),
        }
    )


def benford_digit_counts(
    ds: ray.data.Dataset,
    val: str,
    by: str,
) -> ray.data.Dataset:
    """First-significant-digit distribution per group (the Benford's-law
    fraud/synthetic-data audit): values snap to positive int64 cents and
    the leading digit is computed with EXACT integer arithmetic (a float
    log10 first guess, then integer power-of-ten comparisons fix the
    boundary cases) — equivalent to the decimal string's first character,
    which is what the SQL twin reads, with no float edge cases at powers
    of ten.

    Per-batch partial counts → one bounded groupby (groups × 9 rows).
    Non-positive cents drop (no leading digit).  All-integer output:
    hash-exact against the SQL twin with zero rounding contracts.

    Output: (by, digit:int64 in 1..9, n:int64).
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame) -> pa.Table:
        cents = np.rint(
            df[val].to_numpy(dtype=np.float64) * 100.0
        ).astype(np.int64)
        keep = cents > 0
        c = cents[keep]
        # leading decimal digit without strings: strip 10^(ndigits-1)
        nd = np.floor(np.log10(c.astype(np.float64))).astype(np.int64)
        # float log10 can land one low/high at power-of-ten boundaries;
        # correct exactly with integer comparisons
        p = np.power(10, nd)
        nd = np.where(c >= p * 10, nd + 1, np.where(c < p, nd - 1, nd))
        digit = c // np.power(10, nd)
        g = (
            pd.DataFrame({by: df[by].to_numpy()[keep], "digit": digit})
            .assign(n=np.int64(1))
            .groupby([by, "digit"], as_index=False)
            .sum()
        )
        return arrow_out(g.astype({"digit": "int64", "n": "int64"}))

    return (
        ds.select_columns([by, val])
        .map_batches(partial, batch_format="pandas")
        .groupby([by, "digit"])
        .aggregate(Sum("n", alias_name="n"))
    )


def hill_alpha(
    ds: ray.data.Dataset,
    val: str,
    by: str,
    *,
    xmin: float = 100.0,
    round_to: int = 6,
) -> ray.data.Dataset:
    """Hill estimator of the power-law tail exponent per group —
    α = 1 + n / Σ ln(x / xmin) over values ≥ xmin — the Zipf-ness
    check on document-length / frequency distributions (web corpora
    are famously α ≈ 2; a synthetic or truncated corpus isn't).

    Per-batch partials (n, Σ ln(x/xmin)) → one bounded groupby →
    closed form.  Both engines take ln of the IDENTICAL doubles
    (x::DOUBLE / xmin); drift is ±1 ulp per term and summation order —
    absorbed by ``round_to``.  Groups with no tail rows (or all
    x == xmin, Σ = 0) drop.

    Output: (by, n:int64, alpha:float64).
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame) -> pa.Table:
        x = df[val].to_numpy(dtype=np.float64)
        keep = x >= xmin
        g = (
            pd.DataFrame(
                {
                    by: df[by].to_numpy()[keep],
                    "n": np.int64(1),
                    "sln": np.log(x[keep] / xmin),
                }
            )
            .groupby(by, as_index=False)
            .sum()
        )
        g["n"] = g["n"].astype("int64")
        return arrow_out(g)

    sums = (
        ds.select_columns([by, val])
        .map_batches(partial, batch_format="pandas")
        .groupby(by)
        .aggregate(Sum("n", alias_name="n"), Sum("sln", alias_name="sln"))
    )

    def finalize(df: pd.DataFrame) -> pa.Table:
        with np.errstate(divide="ignore", invalid="ignore"):
            alpha = 1.0 + df["n"].astype("float64") / df["sln"]
        out = pd.DataFrame(
            {
                by: df[by],
                "n": df["n"].astype("int64"),
                "alpha": np.round(alpha, round_to),
            }
        )
        out = out[np.isfinite(out["alpha"])]
        return arrow_out(out)

    return sums.map_batches(finalize, batch_format="pandas")


def two_sample_ks(
    ds: ray.data.Dataset,
    val: str,
    group_col: str,
    group_a: str,
    group_b: str,
    *,
    round_to: int = 6,
) -> pd.DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the value
    distributions of two groups — D = max |F_a(x) − F_b(x)| over the
    union of observed values — the distribution-shift test behind
    "did this source's quality profile drift?".

    Values snap to int64 cents; ONE bounded groupby builds the
    per-value class counts (≤ distinct cents values — bounded by the
    value range, never O(rows); document per deployment).  The driver
    prefix-scans that tiny table: every CDF step is an exact-int
    division (cum::DOUBLE / n — correctly rounded from identical
    operands on both engines), so the max and the final D are
    bit-identical before the cosmetic round.

    Returns a one-row DataFrame (d_stat:float64, n_a:int64, n_b:int64).
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame) -> pa.Table:
        m = df[df[group_col].isin([group_a, group_b])]
        x = np.rint(m[val].to_numpy(dtype=np.float64) * 100.0).astype(
            np.int64
        )
        isa = (m[group_col] == group_a).to_numpy()
        g = (
            pd.DataFrame(
                {
                    "x": x,
                    "ca": isa.astype("int64"),
                    "cb": (~isa).astype("int64"),
                }
            )
            .groupby("x", as_index=False)
            .sum()
        )
        return arrow_out(g.astype({"ca": "int64", "cb": "int64"}))

    # co-locate, don't stream-sort-aggregate: the key space is the
    # distinct cents values (~10^5) — the Q18-lesson regime where
    # Ray's streaming sort-aggregate degrades (measured 4.7 s -> ~2 s
    # at sf0.1/32 CPUs with grouped_sum).
    from pdf_parser_ray.ops.shuffle import grouped_sum

    counts = (
        grouped_sum(
            ds.select_columns([group_col, val]).map_batches(
                partial, batch_format="pandas"
            ),
            ["x"],
            ["ca", "cb"],
        )
        .to_pandas()  # ≤ distinct cents values — bounded
        .sort_values("x")
    )
    n_a = int(counts["ca"].sum())
    n_b = int(counts["cb"].sum())
    if n_a == 0 or n_b == 0:
        return pd.DataFrame(
            {"d_stat": [float("nan")],
             "n_a": np.array([n_a], dtype="int64"),
             "n_b": np.array([n_b], dtype="int64")}
        )
    cu_a = counts["ca"].cumsum().to_numpy(dtype=np.int64)
    cu_b = counts["cb"].cumsum().to_numpy(dtype=np.int64)
    d = np.abs(
        cu_a.astype(np.float64) / float(n_a)
        - cu_b.astype(np.float64) / float(n_b)
    ).max()
    return pd.DataFrame(
        {"d_stat": [round(float(d), round_to)],
         "n_a": np.array([n_a], dtype="int64"),
         "n_b": np.array([n_b], dtype="int64")}
    )


def contingency_mi(
    ds: ray.data.Dataset,
    row_col: str,
    col_col: str,
    *,
    round_to: int = 6,
) -> pd.DataFrame:
    """Mutual information (nats) between two categorical columns —
    the information-theoretic companion to :func:`contingency_chi2`
    (same one-bounded-groupby contingency plan):
    MI = Σ_{ij, n_ij>0} (n_ij/N) · ln(N·n_ij / (r_i·c_j)).

    All counts int64-exact; the ln/ratio tree is shared with the SQL
    twin, leaving cell-summation order as the only drift — inside
    ``round_to``.

    Returns a one-row DataFrame (mi:float64, n:int64).
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame) -> pa.Table:
        g = (
            df[[row_col, col_col]]
            .assign(n=np.int64(1))
            .groupby([row_col, col_col], as_index=False)
            .sum()
        )
        g["n"] = g["n"].astype("int64")
        return arrow_out(g)

    obs = (
        ds.select_columns([row_col, col_col])
        .map_batches(partial, batch_format="pandas")
        .groupby([row_col, col_col])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # R × C cells — bounded
    )
    total = float(obs["n"].sum())
    r_tot = obs.groupby(row_col)["n"].transform("sum").to_numpy(np.float64)
    c_tot = obs.groupby(col_col)["n"].transform("sum").to_numpy(np.float64)
    nij = obs["n"].to_numpy(np.float64)
    mi = float(
        ((nij / total) * np.log(total * nij / (r_tot * c_tot))).sum()
    )
    return pd.DataFrame(
        {"mi": [round(mi, round_to)],
         "n": np.array([int(total)], dtype="int64")}
    )


def grouped_spearman(
    ds: ray.data.Dataset,
    x: str,
    y: str,
    by: str,
    *,
    x_cents: bool = False,
    y_cents: bool = False,
    round_to: int = 4,
) -> ray.data.Dataset:
    """Spearman rank correlation per group — Pearson over AVERAGE ranks
    (tie rule), the monotone-association answer when the relationship
    isn't linear.

    Sort-free plan: one bounded groupby builds each group's per-value
    histogram for BOTH axes (≤ groups × distinct values — bounded by
    the VALUE RANGE in cents, never by rows; document per deployment);
    the driver turns histograms into doubled average ranks
    (2·rank = 2·cum_below + cnt + 1 — an exact INTEGER, no .5s),
    broadcasts the two lookup tables once via ``ray.put``, and one
    map pass accumulates the usual (n, Σrx, Σry, Σrxrx, Σryry, Σrxry)
    partials per group.  Ranks are identical integers on both engines;
    the Σ products are float64 (2^53 overflow at corpus scale), so the
    SQL twin shares the naive-sums Pearson tree and both sides round
    to ``round_to`` — the grouped_corr convention.

    Output: (by, n:int64, spearman:float64); zero-variance groups drop.
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    def snap(s: pd.Series, cents: bool) -> np.ndarray:
        v = s.to_numpy(dtype=np.float64)
        if cents:
            return np.rint(v * 100.0).astype(np.int64)
        # rint, not truncation: the SQL twin's round() must agree on
        # (the nominally integral) values stored as doubles
        return np.rint(v).astype(np.int64)

    def hist_partial(df: pd.DataFrame) -> pa.Table:
        xs = snap(df[x], x_cents)
        ys = snap(df[y], y_cents)
        g = pd.concat(
            [
                pd.DataFrame(
                    {by: df[by], "axis": np.int64(0), "v": xs, "c": np.int64(1)}
                ),
                pd.DataFrame(
                    {by: df[by], "axis": np.int64(1), "v": ys, "c": np.int64(1)}
                ),
            ],
            ignore_index=True,
        )
        return arrow_out(
            g.groupby([by, "axis", "v"], as_index=False)["c"].sum()
        )

    hist = (
        grouped_sum(
            ds.select_columns([by, x, y]).map_batches(
                hist_partial, batch_format="pandas"
            ),
            [by, "axis", "v"],
            ["c"],
        )
        .to_pandas()  # groups × 2 × distinct values — bounded
        .sort_values([by, "axis", "v"])
    )

    # doubled average ranks: 2r = 2·cum_below + cnt + 1 (exact ints)
    lut: dict = {}
    for (g, axis), grp in hist.groupby([by, "axis"]):
        cum = grp["c"].cumsum().to_numpy(dtype=np.int64)
        cnt = grp["c"].to_numpy(dtype=np.int64)
        r2 = 2 * (cum - cnt) + cnt + 1
        lut[(g, int(axis))] = pd.Series(
            r2, index=grp["v"].to_numpy(), dtype="int64"
        )
    lut_ref = ray.put(lut)

    def moment_partial(df: pd.DataFrame) -> pa.Table:
        from pdf_parser_ray.stages import worker_state

        tables: dict = worker_state(
            ("spear_lut", lut_ref.hex()), lambda: ray.get(lut_ref)
        )
        parts = []
        xs_all = snap(df[x], x_cents)
        ys_all = snap(df[y], y_cents)
        frame = pd.DataFrame({by: df[by].to_numpy(), "xv": xs_all, "yv": ys_all})
        for g, grp in frame.groupby(by, sort=False):
            rx = (
                grp["xv"].map(tables[(g, 0)]).to_numpy(dtype=np.float64)
            )
            ry = (
                grp["yv"].map(tables[(g, 1)]).to_numpy(dtype=np.float64)
            )
            parts.append(
                (g, len(grp), rx.sum(), ry.sum(), (rx * rx).sum(),
                 (ry * ry).sum(), (rx * ry).sum())
            )
        out = pd.DataFrame(
            parts, columns=[by, "n", "sx", "sy", "sxx", "syy", "sxy"]
        )
        return arrow_out(out.astype({"n": "int64"}))

    from ray.data.aggregate import Sum

    sums = (
        ds.select_columns([by, x, y])
        .map_batches(moment_partial, batch_format="pandas")
        .groupby(by)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
    )

    def finalize(df: pd.DataFrame) -> pa.Table:
        n = df["n"].astype("float64")
        num = n * df["sxy"] - df["sx"] * df["sy"]
        vx = n * df["sxx"] - df["sx"] ** 2
        vy = n * df["syy"] - df["sy"] ** 2
        with np.errstate(divide="ignore", invalid="ignore"):
            rho = num / np.sqrt(vx * vy)
        out = pd.DataFrame(
            {
                by: df[by],
                "n": df["n"].astype("int64"),
                "spearman": np.round(rho, round_to),
            }
        )
        out = out[np.isfinite(out["spearman"])]
        return arrow_out(out)

    return sums.map_batches(finalize, batch_format="pandas")


def ab_welch_srm(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    val_col: str = "value",
    round_to: int = 6,
    n_parts: int | None = None,
) -> pd.DataFrame:
    """A/B experiment readout: deterministic 50/50 hash-gate arm
    assignment per USER, Welch z statistic on per-user spend, and the
    sample-ratio-mismatch (SRM) chi-square — the standard trio every
    experimentation platform computes before anyone trusts a lift
    number.

    Arm = first md5 hex char of the user id < '8' (exactly the repo's
    split-gate idiom, so the SQL CASE over the same prefix is
    value-identical).  The unit of analysis is the USER: per-user cent
    totals come from one ``grouped_sum`` co-location (high-cardinality
    key, never a low-cardinality map_groups), then per-arm moments
    (n, Σy, Σy²) reduce to TWO rows.  All sums are exact integers; the
    final floats are written cast-then-divide (``float(num)/float(den)``)
    to mirror DuckDB's HUGEINT→DOUBLE conversion order, and round to
    ``round_to``.

    SRM chi² = (n_a − n_b)²/n (1 dof vs the designed 50/50 split);
    Welch z = (m_a − m_b)/√(s²_a/n_a + s²_b/n_b) with the unbiased
    per-arm variance s² = (n·Σy² − (Σy)²)/(n·(n−1)).

    Returns a ONE-row DataFrame (n_a, n_b, sum_a, sum_b:int64 cents,
    mean_a, mean_b, diff, z, srm_chi2:float64) — driver-sized by
    construction.
    """
    import hashlib

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    def per_user_partial(df: pd.DataFrame) -> pa.Table:
        vc = np.rint(df[val_col].to_numpy(dtype=np.float64) * 100.0).astype(
            np.int64
        )
        g = (
            pd.DataFrame({user_col: df[user_col], "y": vc})
            .groupby(user_col, as_index=False)
            .sum()
        )
        return arrow_out(g)

    users = grouped_sum(
        ds.map_batches(per_user_partial, batch_format="pandas"),
        [user_col],
        ["y"],
        **({"n_parts": n_parts} if n_parts else {}),
    )

    def arm_moments(df: pd.DataFrame) -> pa.Table:
        arm = (
            df[user_col]
            .map(
                lambda i: hashlib.md5(str(i).encode("ascii")).hexdigest()[0]
                < "8"
            )
            .map({True: 0, False: 1})
            .astype("int64")
        )
        y = df["y"].to_numpy(dtype=np.int64)
        g = (
            pd.DataFrame({"arm": arm, "n": np.int64(1), "s": y, "ss": y * y})
            .groupby("arm", as_index=False)
            .sum()
        )
        return arrow_out(g)

    from ray.data.aggregate import Sum

    rows = (
        users.map_batches(arm_moments, batch_format="pandas")
        .groupby("arm")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
        )
        .to_pandas()  # exactly ≤2 rows — bounded
        .set_index("arm")
    )
    if not {0, 1} <= set(rows.index):
        return pd.DataFrame(
            {"n_a": [0], "n_b": [0], "sum_a": [0], "sum_b": [0],
             "mean_a": [float("nan")], "mean_b": [float("nan")],
             "diff": [float("nan")], "z": [float("nan")],
             "srm_chi2": [float("nan")]}
        )
    n_a, s_a, ss_a = (int(rows.loc[0, c]) for c in ("n", "s", "ss"))
    n_b, s_b, ss_b = (int(rows.loc[1, c]) for c in ("n", "s", "ss"))
    m_a = float(s_a) / float(n_a)
    m_b = float(s_b) / float(n_b)
    va = float(n_a * ss_a - s_a * s_a) / float(n_a * (n_a - 1))
    vb = float(n_b * ss_b - s_b * s_b) / float(n_b * (n_b - 1))
    diff = m_a - m_b
    z = diff / np.sqrt(va / float(n_a) + vb / float(n_b))
    n = n_a + n_b
    srm = float((n_a - n_b) * (n_a - n_b)) / float(n)
    return pd.DataFrame(
        {
            "n_a": pd.Series([n_a], dtype="int64"),
            "n_b": pd.Series([n_b], dtype="int64"),
            "sum_a": pd.Series([s_a], dtype="int64"),
            "sum_b": pd.Series([s_b], dtype="int64"),
            "mean_a": [round(m_a, round_to)],
            "mean_b": [round(m_b, round_to)],
            "diff": [round(diff, round_to)],
            "z": [round(float(z), round_to)],
            "srm_chi2": [round(srm, round_to)],
        }
    )


def ab_cuped(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    val_col: str = "value",
    ts_col: str = "ts",
    round_to: int = 6,
    n_parts: int | None = None,
) -> pd.DataFrame:
    """CUPED variance-reduced A/B readout: the pre-period per-user spend
    is the control covariate, θ = cov(x, y)/var(x) pooled across arms,
    adjusted arm means m_y − θ·(m_x − m̄_x) — the industry-standard
    trick that shrinks experiment confidence intervals without touching
    the treatment.

    The pre/post boundary is the INTEGER microsecond midpoint of the
    global ts range ((epoch_us(min)+epoch_us(max))//2, pre = tus ≤ mid)
    so both engines draw the identical line.  Per-user (x, y) cent
    totals come from ONE ``grouped_sum`` co-location; per-arm and
    pooled moments (n, Σx, Σy, Σxy, Σx²) are exact int64 sums reduced
    to two rows.  θ and the adjusted means are cast-then-divide floats
    in twin-identical operand order, round-``round_to``.

    Returns ONE row: (n_a, n_b:int64, theta, adj_mean_a, adj_mean_b,
    diff_adj, diff_raw:float64).
    """
    from ray.data.aggregate import Max, Min, Sum

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    bounds = ds.aggregate(Min(ts_col), Max(ts_col))
    lo = pd.Timestamp(bounds[f"min({ts_col})"]).to_datetime64().astype(
        "datetime64[us]"
    ).astype("int64")
    hi = pd.Timestamp(bounds[f"max({ts_col})"]).to_datetime64().astype(
        "datetime64[us]"
    ).astype("int64")
    mid = (int(lo) + int(hi)) // 2

    def per_user_partial(df: pd.DataFrame) -> pa.Table:
        vc = np.rint(df[val_col].to_numpy(dtype=np.float64) * 100.0).astype(
            np.int64
        )
        tus = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        pre = tus <= mid
        g = (
            pd.DataFrame(
                {user_col: df[user_col],
                 "x": np.where(pre, vc, 0),
                 "y": np.where(pre, 0, vc)}
            )
            .groupby(user_col, as_index=False)
            .sum()
        )
        return arrow_out(g)

    users = grouped_sum(
        ds.map_batches(per_user_partial, batch_format="pandas"),
        [user_col],
        ["x", "y"],
        **({"n_parts": n_parts} if n_parts else {}),
    )

    def arm_moments(df: pd.DataFrame) -> pa.Table:
        import hashlib

        arm = (
            df[user_col]
            .map(
                lambda i: hashlib.md5(str(i).encode("ascii")).hexdigest()[0]
                < "8"
            )
            .map({True: 0, False: 1})
            .astype("int64")
        )
        x = df["x"].to_numpy(dtype=np.int64)
        y = df["y"].to_numpy(dtype=np.int64)
        g = (
            pd.DataFrame(
                {"arm": arm, "n": np.int64(1), "sx": x, "sy": y,
                 "sxy": x * y, "sxx": x * x}
            )
            .groupby("arm", as_index=False)
            .sum()
        )
        return arrow_out(g)

    rows = (
        users.map_batches(arm_moments, batch_format="pandas")
        .groupby("arm")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
        )
        .to_pandas()  # ≤2 rows — bounded
        .set_index("arm")
    )
    nan_row = pd.DataFrame(
        {"n_a": [0], "n_b": [0], "theta": [float("nan")],
         "adj_mean_a": [float("nan")], "adj_mean_b": [float("nan")],
         "diff_adj": [float("nan")], "diff_raw": [float("nan")]}
    )
    if not {0, 1} <= set(rows.index):
        return nan_row
    a = {c: int(rows.loc[0, c]) for c in ("n", "sx", "sy", "sxy", "sxx")}
    b = {c: int(rows.loc[1, c]) for c in ("n", "sx", "sy", "sxy", "sxx")}
    n = a["n"] + b["n"]
    sx, sy = a["sx"] + b["sx"], a["sy"] + b["sy"]
    sxy, sxx = a["sxy"] + b["sxy"], a["sxx"] + b["sxx"]
    den = n * sxx - sx * sx
    if den == 0:
        return nan_row
    theta = float(n * sxy - sx * sy) / float(den)
    mx_pool = float(sx) / float(n)
    m_ya = float(a["sy"]) / float(a["n"])
    m_yb = float(b["sy"]) / float(b["n"])
    m_xa = float(a["sx"]) / float(a["n"])
    m_xb = float(b["sx"]) / float(b["n"])
    adj_a = m_ya - theta * (m_xa - mx_pool)
    adj_b = m_yb - theta * (m_xb - mx_pool)
    return pd.DataFrame(
        {
            "n_a": pd.Series([a["n"]], dtype="int64"),
            "n_b": pd.Series([b["n"]], dtype="int64"),
            "theta": [round(theta, round_to)],
            "adj_mean_a": [round(adj_a, round_to)],
            "adj_mean_b": [round(adj_b, round_to)],
            "diff_adj": [round(adj_a - adj_b, round_to)],
            "diff_raw": [round(m_ya - m_yb, round_to)],
        }
    )


# Poisson(1) CDF thresholds for the distributed bootstrap, as exact
# 48-bit integers floor(F(k)·2^48), k = 0..7: a 48-bit md5 hash u is
# assigned weight w = #{k : u >= T_k} — the inverse-CDF draw spelled in
# pure integer comparisons so Ray and SQL agree bit-for-bit.  P(w > 8)
# ≈ 1.1e-7 is truncated to 8 by construction (both engines).
_POIS1_T48 = tuple(
    int(math.floor(f * (1 << 48)))
    for f in (
        lambda e1=math.exp(-1.0): [
            e1 * sum(1.0 / math.factorial(j) for j in range(k + 1))
            for k in range(8)
        ]
    )()
)


def poisson_bootstrap_ci(
    ds: ray.data.Dataset,
    *,
    val: str = "value",
    group_col: str = "event_type",
    id_col: str = "event_id",
    n_reps: int = 32,
) -> pd.DataFrame:
    """Per-group mean with Poisson-bootstrap interval — THE bootstrap
    that works on sharded data (Chamandy et al., Google 2012): instead
    of resampling n rows with replacement (impossible across shards),
    every row enters replicate r with weight ~ Poisson(1), drawn
    deterministically from md5(r, id).  One streaming pass emits
    (group, rep, Σw·cents, Σw) partials — the shuffle is groups ×
    replicates rows, never data-sized.

    Exactness: values snap to int64 cents (the value_ks_test rule),
    weights come from integer threshold comparisons against
    ``_POIS1_T48``, so every replicate mean is a ratio of exact
    integers — bit-identical across engines with NO rounding contract;
    the interval picks the 2nd-smallest / 2nd-largest replicate means
    (a ~94% CI at 32 reps) by value, so tie order cannot matter.

    Output (driver-sized): (group_col, n:int64, mean:float64,
    boot_lo:float64, boot_hi:float64).
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.sketches import _hash_strings_md5

    t48 = np.array(_POIS1_T48, dtype=np.int64)

    def partial(df: pd.DataFrame):
        cents = np.rint(df[val].to_numpy(dtype=np.float64) * 100.0).astype(
            np.int64
        )
        grp = df[group_col].astype(str).to_numpy()
        ids = df[id_col].to_numpy()
        frames = [
            pd.DataFrame(
                {"g": grp, "rep": np.int64(-1), "swx": cents,
                 "sw": np.int64(1)}
            )
        ]
        for r in range(n_reps):
            h = (
                _hash_strings_md5([f"{r}:{i}" for i in ids]).astype(np.uint64)
                >> np.uint64(16)
            ).astype(np.int64)  # top 48 bits of the 64-bit md5 prefix
            w = (h[:, None] >= t48[None, :]).sum(axis=1).astype(np.int64)
            frames.append(
                pd.DataFrame(
                    {"g": grp, "rep": np.int64(r), "swx": w * cents, "sw": w}
                )
            )
        out = (
            pd.concat(frames, ignore_index=True)
            .groupby(["g", "rep"], as_index=False)[["swx", "sw"]]
            .sum()
        )
        return arrow_out(out.astype({"swx": "int64", "sw": "int64"}))

    agg = (
        ds.select_columns([group_col, id_col, val])
        .map_batches(partial, batch_format="pandas")
        .groupby(["g", "rep"])
        .aggregate(Sum("swx", alias_name="swx"), Sum("sw", alias_name="sw"))
        .to_pandas()  # bounded: groups × (n_reps + 1) rows
    )
    rows = []
    for g, gg in agg.groupby("g"):
        base = gg[gg["rep"] == -1].iloc[0]
        reps = gg[(gg["rep"] >= 0) & (gg["sw"] > 0)]
        means = np.sort(reps["swx"].to_numpy(np.int64)
                        / reps["sw"].to_numpy(np.int64))
        rows.append(
            {group_col: g, "n": int(base["sw"]),
             "mean": float(base["swx"]) / float(base["sw"]),
             "boot_lo": means[1], "boot_hi": means[-2]}
        )
    out = pd.DataFrame(rows).sort_values(group_col).reset_index(drop=True)
    return out.astype({"n": "int64", "mean": "float64",
                       "boot_lo": "float64", "boot_hi": "float64"})


def calibration_bins(
    ds: ray.data.Dataset,
    score_col: str,
    label_col: str,
    *,
    bin_width: int = 10,
) -> ray.data.Dataset:
    """Reliability diagram for an INTEGER score against a boolean
    label: fixed-width score bins (``floor(score / bin_width)`` —
    one-pass, no min/max prepass), per bin the row count, positive
    count, exact mean score and positive fraction (each a ratio of
    int64s → bit-identical doubles on both engines).

    The audit a learned gate (perceptron margin, NB log-odds bucket,
    quality score) gets before its threshold is trusted: monotone
    frac_pos across bins = the score ranks; frac_pos ≈ its bin's
    implied probability = it calibrates.

    Per-batch partial → capped DRIVER reduce (r5: distinct bins ≤
    score range / bin_width, so the partial stream is bins × batches
    tiny rows — Ray's sort-aggregate barrier cost ~6 s at sf0.1/32 for
    a ~20-row answer, the table_shapes pathology; the cap trips loudly
    if a caller ever feeds an unbounded score domain).  Output:
    (bin:int64, n:int64, n_pos:int64, mean_score:float64,
    frac_pos:float64).
    """
    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame):
        s = df[score_col].to_numpy(dtype=np.int64)
        pos = df[label_col].to_numpy(dtype=bool)
        g = (
            pd.DataFrame(
                {
                    "bin": np.floor_divide(s, bin_width),
                    "n": np.ones(len(s), dtype=np.int64),
                    "n_pos": pos.astype("int64"),
                    "sum_s": s,
                }
            )
            .groupby("bin", as_index=False)
            .sum()
        )
        return arrow_out(g)

    pool_limit = 5_000_000
    pool = (
        ds.map_batches(partial, batch_format="pandas")
        .limit(pool_limit + 1)
        .to_pandas()
    )
    if len(pool) > pool_limit:
        raise ValueError(
            f"calibration_bins partial pool exceeds {pool_limit} rows "
            "(bins × batches); the score domain is not bounded — widen "
            "bin_width or restore a distributed grouped_sum finish"
        )
    df = pool.groupby("bin", as_index=False)[["n", "n_pos", "sum_s"]].sum()
    out = pd.DataFrame(
        {
            "bin": df["bin"].astype("int64"),
            "n": df["n"].astype("int64"),
            "n_pos": df["n_pos"].astype("int64"),
            "mean_score": df["sum_s"].to_numpy(dtype=np.float64)
            / df["n"].to_numpy(dtype=np.int64),
            "frac_pos": df["n_pos"].to_numpy(dtype=np.float64)
            / df["n"].to_numpy(dtype=np.int64),
        }
    ).reset_index(drop=True)
    import ray.data as _rd

    return _rd.from_pandas(out)


def loo_group_effect(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
) -> ray.data.Dataset:
    """Leave-one-group-out effect on the corpus mean — the cheapest
    data-valuation audit: for every group, the mean of ``value_col``
    over everything EXCEPT that group, and the delta it causes
    (loo_mean − overall mean; positive = removing the group RAISES
    corpus quality by this metric).

    One pass of per-batch (group, sum, count) partials → one bounded
    groupby; the exclusion arithmetic is totals-minus-group on the
    driver-sized table, every mean a ratio of exact int64s.

    Output: (group_col, n:int64, group_mean:float64, loo_mean:float64,
    delta:float64).
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame):
        g = df.groupby(group_col, as_index=False).agg(
            s=(value_col, "sum"), n=(value_col, "size")
        )
        return arrow_out(g.astype({"s": "int64", "n": "int64"}))

    agg = (
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pandas")
        .groupby(group_col)
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )

    def finish(df: pd.DataFrame):
        S = np.int64(df["s"].sum())
        N = np.int64(df["n"].sum())
        s = df["s"].to_numpy(dtype=np.int64)
        n = df["n"].to_numpy(dtype=np.int64)
        rest_n = N - n
        loo = np.where(rest_n > 0, (S - s) / np.maximum(rest_n, 1), 0.0)
        overall = S / N if N else 0.0
        return arrow_out(
            pd.DataFrame(
                {
                    group_col: df[group_col],
                    "n": n,
                    "group_mean": s / np.maximum(n, 1),
                    "loo_mean": loo,
                    "delta": loo - overall,
                }
            )
        )

    # the grouped table is bounded (|groups| rows) — one-block finish
    return agg.repartition(1).map_batches(finish, batch_format="pandas")


def isotonic_calibration(
    ds: ray.data.Dataset,
    score_col: str,
    pos_col: str,
    *,
    bin_width: int = 10,
    n_parts: int | None = None,
) -> pd.DataFrame:
    """Isotonic (monotone) calibration of an integer score against a
    binary label — PAVA's exact solution via the minimax identity
    fitted(k) = max_{i<=k} min_{j>=k} mean(y over bins i..j), the
    calibration step a learned quality gate gets when the reliability
    diagram (calibration_bins) shows non-monotone bins.

    Exactness: per-bin (n, sum_pos) are int64; every candidate mean is
    ONE division of two int64 prefix-sum differences, and max/min pick
    among identical doubles on both engines — bit-identical, NO
    rounding contract.  The O(B^3) minimax is driver-side over the
    BOUNDED bin rollup (B = score range / bin_width), after per-batch
    partial (bin, n, s) combiners and one bounded grouped sum — the
    corpus never moves.

    Output (eager, driver-sized): (bin:int64, n:int64, n_pos:int64,
    frac_pos:float64, fitted:float64) with fitted monotone
    non-decreasing in bin.
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = (
            df[score_col].astype("int64").floordiv(bin_width).astype("int64")
        )
        g = pd.DataFrame(
            {"bin": b, "pos": df[pos_col].astype(bool).astype("int64")}
        ).groupby("bin", as_index=False).agg(n=("pos", "size"), s=("pos", "sum"))
        return arrow_out(
            pd.DataFrame(
                {
                    "bin": g["bin"].astype("int64"),
                    "n": g["n"].astype("int64"),
                    "s": g["s"].astype("int64"),
                }
            )
        )

    kw = {"n_parts": n_parts} if n_parts else {}
    rolled = (
        grouped_sum(
            ds.select_columns([score_col, pos_col]).map_batches(
                partial, batch_format="pandas"
            ),
            ["bin"],
            ["n", "s"],
            **kw,
        )
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    B = len(rolled)
    n = rolled["n"].to_numpy(dtype=np.int64)
    s = rolled["s"].to_numpy(dtype=np.int64)
    SN = np.concatenate(([0], np.cumsum(n)))
    SS = np.concatenate(([0], np.cumsum(s)))
    # mean of bins i..j (0-based, inclusive): one int/int division each
    num = SS[None, 1:] - SS[:-1, None]   # [i, j]
    den = SN[None, 1:] - SN[:-1, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        M = num / den
    M[np.tril_indices(B, k=-1)] = np.inf          # j < i: undefined
    suf = np.minimum.accumulate(M[:, ::-1], axis=1)[:, ::-1]  # min_{j>=k}
    suf[np.tril_indices(B, k=-1)] = -np.inf       # i > k: excluded
    fitted = np.maximum.accumulate(suf, axis=0).diagonal()     # max_{i<=k}
    return pd.DataFrame(
        {
            "bin": rolled["bin"].astype("int64"),
            "n": n,
            "n_pos": s,
            "frac_pos": s / n,
            "fitted": fitted.copy(),
        }
    )

def ndcg_at_k(
    ds: ray.data.Dataset,
    score_col: str,
    rel_col: str,
    id_col: str,
    *,
    k: int = 10,
    round_to: int = 6,
) -> pd.DataFrame:
    """NDCG@k of an integer score ranking graded integer relevance —
    the standard retrieval/eval readout (Järvelin & Kekäläinen 2002)
    alongside :func:`rank_auc`: DCG@k = Σ rel_i / log2(i+1) over the
    (score DESC, id ASC) ranking, normalized by the ideal DCG over
    relevance sorted DESC.

    Distributed shape: each batch keeps only its local top-k rows by
    (score, id) AND its top-k relevance grades — two k-bounded partial
    combiners in one pass — so the driver finish merges ≤ 2k·batches
    rows, never the corpus.  The (score DESC, id ASC) tie-break makes
    the ranking deterministic under any partitioning; the ≤k-term DCG
    sums round to ``round_to`` (sum-order contract).

    Output (eager, one row): (k:int64, dcg:float64, idcg:float64,
    ndcg:float64); ndcg = 0.0 when idcg = 0.
    """
    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "score": df[score_col].astype("int64"),
                "rel": df[rel_col].astype("int64"),
                "id": df[id_col].astype("int64"),
            }
        )
        top = d.sort_values(["score", "id"], ascending=[False, True]).head(k)
        ideal = d.sort_values(["rel", "id"], ascending=[False, True]).head(k)
        return arrow_out(
            pd.concat(
                [top.assign(part="t"), ideal.assign(part="i")]
            ).reset_index(drop=True)
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    disc = 1.0 / np.log2(np.arange(2, k + 2, dtype=np.float64))
    top = (
        parts[parts["part"] == "t"]
        .sort_values(["score", "id"], ascending=[False, True])
        .head(k)
    )
    ideal = (
        parts[parts["part"] == "i"]
        .sort_values(["rel", "id"], ascending=[False, True])
        .head(k)
    )
    dcg = float(
        np.round((top["rel"].to_numpy() * disc[: len(top)]).sum(), round_to)
    )
    idcg = float(
        np.round((ideal["rel"].to_numpy() * disc[: len(ideal)]).sum(), round_to)
    )
    ndcg = float(np.round(dcg / idcg, round_to)) if idcg > 0 else 0.0
    return pd.DataFrame(
        {
            "k": pd.Series([k], dtype="int64"),
            "dcg": [dcg],
            "idcg": [idcg],
            "ndcg": [ndcg],
        }
    )


def ranking_metrics(
    ds: ray.data.Dataset,
    score_col: str,
    rel_col: str,
    id_col: str,
    *,
    k: int = 10,
    round_to: int = 6,
) -> pd.DataFrame:
    """MRR + precision@k + recall@k of an integer score ranking a
    binary label — the rest of the retrieval-eval family next to
    :func:`ndcg_at_k` / :func:`rank_auc`.

    MRR here is the single-query reciprocal rank TRUNCATED AT k
    (MRR@k): 1/position of the first relevant item within the top k
    under the deterministic (score DESC, id ASC) order, 0.0 when no
    relevant item ranks that high.  precision@k = hits_k / k,
    recall@k = hits_k / total_relevant.

    One pass, two k-bounded partials per batch (local top-k rows +
    local relevant count); the driver finish merges ≤ k·batches rows
    plus one int per batch.  All three ratios are int/int divisions —
    exact; rounded to ``round_to`` for the shared contract.

    Output (eager, one row): (k:int64, n_relevant:int64, hits:int64,
    mrr:float64, precision:float64, recall:float64).
    """
    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "score": df[score_col].astype("int64"),
                "rel": df[rel_col].astype("int64"),
                "id": df[id_col].astype("int64"),
            }
        )
        top = d.sort_values(["score", "id"], ascending=[False, True]).head(k)
        top = top.assign(nrel=0)
        total = pd.DataFrame(
            {"score": [0], "rel": [0], "id": [0],
             "nrel": [int(d["rel"].gt(0).sum())]}
        )
        return arrow_out(
            pd.concat([top.assign(part="t"), total.assign(part="n")])
            .reset_index(drop=True)
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    n_rel = int(parts.loc[parts["part"] == "n", "nrel"].sum())
    top = (
        parts[parts["part"] == "t"]
        .sort_values(["score", "id"], ascending=[False, True])
        .head(k)
    )
    rel = top["rel"].gt(0).to_numpy()
    hits = int(rel.sum())
    first = int(np.argmax(rel)) + 1 if hits else 0
    mrr = round(1.0 / first, round_to) if first else 0.0
    precision = round(hits / k, round_to)
    recall = round(hits / n_rel, round_to) if n_rel else 0.0
    return pd.DataFrame(
        {
            "k": pd.Series([k], dtype="int64"),
            "n_relevant": pd.Series([n_rel], dtype="int64"),
            "hits": pd.Series([hits], dtype="int64"),
            "mrr": [mrr],
            "precision": [precision],
            "recall": [recall],
        }
    )


def mann_whitney_u(
    ds: ray.data.Dataset,
    value_col: str,
    group_col: str,
    a_label: str,
    b_label: str,
    *,
    cents: bool = True,
    round_to: int = 6,
) -> pd.DataFrame:
    """Mann-Whitney U rank-sum test between two label populations —
    the nonparametric two-sample location test (Mann & Whitney 1947),
    completing the hypothesis-test family next to Welch
    (:func:`ab_welch_srm`), chi-square and the KS statistic: does the
    ``value_col`` distribution of ``a_label`` rows stochastically
    dominate that of ``b_label`` rows?

    Sort-free distributed shape (the :func:`grouped_spearman` histogram
    rule): ONE per-batch partial pass counts (value -> a-count,
    b-count), one int-keyed ``grouped_sum`` co-locates the per-value
    histogram (shuffle bounded by DISTINCT cent values, never rows),
    and the driver finishes on the bounded histogram with EXACT integer
    arithmetic — doubled average ranks 2r = 2·cum_below + cnt + 1, so
    2·R_A = Σ ca·(2·cum_below + cnt + 1) is an exact Python big-int
    even past int64 at 10^12 rows, as are the tie term Σ(t³−t) and the
    U numerator.  Only the final z-score divides into float64, through
    the SAME expression tree as the SQL twin.

    U = R_A − n_A(n_A+1)/2; z = (U − n_A n_B/2) /
    sqrt(n_A n_B/12 · ((n+1) − T/(n(n−1)))) with the tie-corrected
    variance (no continuity correction — the twin convention).

    Output (eager, one row): (n_a:int64, n_b:int64, u:float64 — exact
    .5 steps, unrounded; z:float64 rounded to ``round_to``).
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    def hist_partial(df: pd.DataFrame) -> pa.Table:
        lab = df[group_col]
        keep = lab.isin([a_label, b_label]).to_numpy()
        v = df[value_col].to_numpy(dtype=np.float64)[keep]
        snapped = (
            np.rint(v * 100.0).astype(np.int64)
            if cents
            else np.rint(v).astype(np.int64)
        )
        is_a = (lab.to_numpy()[keep] == a_label).astype(np.int64)
        g = pd.DataFrame({"v": snapped, "ca": is_a, "cb": 1 - is_a})
        return arrow_out(g.groupby("v", as_index=False)[["ca", "cb"]].sum())

    hist = (
        grouped_sum(
            ds.select_columns([group_col, value_col]).map_batches(
                hist_partial, batch_format="pandas"
            ),
            ["v"],
            ["ca", "cb"],
        )
        .to_pandas()  # bounded: one row per distinct cent value
        .sort_values("v")
    )

    ca = hist["ca"].to_numpy(dtype=np.int64)
    cnt = (ca + hist["cb"].to_numpy(dtype=np.int64)).astype(np.int64)
    cum_below = np.cumsum(cnt) - cnt
    # exact big-int finish: numpy would overflow int64 at corpus scale
    r2a = int(np.sum(ca.astype(object) * (2 * cum_below + cnt + 1)))
    n_a = int(ca.sum())
    n_b = int(hist["cb"].sum())
    n = n_a + n_b
    tie_t = int(np.sum(cnt.astype(object) ** 3 - cnt, dtype=object))
    u = (r2a - n_a * (n_a + 1)) / 2.0
    if n_a == 0 or n_b == 0 or n < 2:
        z = float("nan")
    else:
        var = n_a * n_b / 12.0 * ((n + 1) - tie_t / (n * (n - 1)))
        z = (
            round((u - n_a * n_b / 2.0) / np.sqrt(var), round_to)
            if var > 0
            else float("nan")
        )
    return pd.DataFrame(
        {
            "n_a": pd.Series([n_a], dtype="int64"),
            "n_b": pd.Series([n_b], dtype="int64"),
            "u": pd.Series([u], dtype="float64"),
            "z": pd.Series([z], dtype="float64"),
        }
    )


def _pca_fit(
    ds: ray.data.Dataset, col: str, n_components: int
) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """PCA fit on the dim×dim moment pass (the fit-small half): one
    Gram-partial scan (O(batches × dim²) shuffle rows, the
    :func:`embedding_covariance` plan), covariance + eigendecomposition
    at the driver.  Deterministic sign: each component's largest-|x|
    element (lowest index on ties) is made positive.

    Returns (mean[dim], components[n_components, dim] eigenvalue-DESC,
    eigenvalues[n_components])."""
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    def partial(df: pd.DataFrame) -> pa.Table:
        m = np.vstack(df[col].to_numpy()).astype(np.float64)
        gram = m.T @ m
        s = m.sum(axis=0)
        iu, ju = np.triu_indices(m.shape[1])
        return arrow_out(
            pd.DataFrame(
                {
                    "i": iu.astype(np.int64),
                    "j": ju.astype(np.int64),
                    "sxy": gram[iu, ju],
                    "si": s[iu],
                    "sj": s[ju],
                    "n": np.int64(m.shape[0]),
                }
            )
        )

    mom = grouped_sum(
        ds.select_columns([col]).map_batches(partial, batch_format="pandas"),
        ["i", "j"],
        ["sxy", "si", "sj", "n"],
    ).to_pandas()  # dim(dim+1)/2 rows — driver-sized by construction

    dim = int(mom["i"].max()) + 1
    cov = np.zeros((dim, dim))
    mean = np.zeros(dim)
    n = float(mom["n"].iloc[0])
    for _, r in mom.iterrows():
        i, j = int(r["i"]), int(r["j"])
        c = (r["sxy"] - r["si"] * r["sj"] / n) / n
        cov[i, j] = cov[j, i] = c
        if i == j:
            mean[i] = r["si"] / n
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T.copy()
    evals = evals[order]
    for c in comps:  # deterministic sign
        pivot = int(np.argmax(np.abs(c)))
        if c[pivot] < 0:
            c *= -1.0
    return mean, comps, evals


def embedding_pca(
    ds: ray.data.Dataset,
    col: str = "embedding",
    id_col: str = "vec_id",
    *,
    n_components: int = 2,
    round_to: int = 6,
) -> ray.data.Dataset:
    """PCA projection of every embedding onto the top principal
    components — fit-small / apply-wide (the :func:`embedding_pca_variance`
    fit broadcast once via ``ray.put``, a linear-algebra sibling of
    :func:`~pdf_parser_ray.ops.similarity.jl_project` where the basis is
    LEARNED from the moment pass instead of seeded): dimensionality
    reduction before clustering / visualization / coreset selection.

    Scale shape: the fit sees only dim×dim moments; the apply is one
    stateless vectorized matmul pass per batch with the (mean,
    components) lookup shipped once per worker — zero shuffle.

    Output: (id_col, pc1..pcK:float64 rounded to ``round_to``).
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.stages import worker_state

    mean, comps, _ = _pca_fit(ds, col, n_components)
    fit_ref = ray.put((mean, comps))

    def project(df: pd.DataFrame) -> pa.Table:
        mu, cs = worker_state(
            ("pca_fit", fit_ref.hex()), lambda: ray.get(fit_ref)
        )
        m = np.vstack(df[col].to_numpy()).astype(np.float64)
        proj = np.round((m - mu) @ cs.T, round_to)
        out = pd.DataFrame({id_col: df[id_col].astype("int64")})
        for c in range(proj.shape[1]):
            out[f"pc{c + 1}"] = proj[:, c]
        return arrow_out(out)

    return ds.select_columns([id_col, col]).map_batches(
        project, batch_format="pandas"
    )


def embedding_pca_variance(
    ds: ray.data.Dataset,
    col: str = "embedding",
    *,
    n_components: int = 4,
    round_to: int = 6,
) -> pd.DataFrame:
    """Explained-variance readout of the PCA fit: eigenvalue and
    explained-variance ratio per retained component (the scree table
    that decides K before :func:`embedding_pca` applies it).  One
    moment pass, full eigenspectrum at the driver; evr denominator is
    the covariance trace = Σ all eigenvalues.

    Output (eager, n_components rows): (component:int64,
    eigenvalue:float64, evr:float64), eigenvalue DESC."""
    probe = ds.limit(1).take(1)[0][col]
    dim = len(probe)
    _mean, _comps, evals_all = _pca_fit(ds, col, dim)
    trace = float(evals_all.sum())
    k = min(n_components, len(evals_all))
    return pd.DataFrame(
        {
            "component": pd.Series(range(1, k + 1), dtype="int64"),
            "eigenvalue": np.round(evals_all[:k], round_to),
            "evr": np.round(evals_all[:k] / trace, round_to),
        }
    )


def bcubed_eval(
    ds: ray.data.Dataset,
    pred_col: str,
    truth_col: str,
    *,
    round_to: int = 6,
) -> pd.DataFrame:
    """B-cubed extrinsic clustering evaluation (Bagga & Baldwin 1998;
    the dedup-clustering scorecard of Amigó et al. 2009): per-item
    precision |C(i)∩T(i)|/|C(i)| and recall |C(i)∩T(i)|/|T(i)|,
    averaged — computed from the contingency identity
    Σ_{c,t} n_ct²/n_c (resp. /n_t) / N, so no per-item pass exists.

    Distributed shape: batch-partial (pred, truth) pair counts → ONE
    (c,t) co-location builds the contingency (bounded by distinct label
    pairs, materialized — two consumers); then one co-location on c
    computes each cluster's marginal AND its Σ n_ct²/n_c contribution
    in-partition (n_c is complete there by construction — no broadcast
    marginal map, which would be corpus-sized under singleton-heavy
    dedup labelings), one on t symmetrically; each reduces to ONE float
    per partition before the driver.  Precision/recall round to
    ``round_to`` (cross-row float-sum contract); F1 derives from the
    rounded pair.

    Output (eager, one row): (n:int64, precision, recall, f1:float64).
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum, partitioned_map

    def pair_partial(df: pd.DataFrame):
        g = pd.DataFrame({"c": df[pred_col], "t": df[truth_col]})
        g["n"] = np.int64(1)
        return arrow_out(g.groupby(["c", "t"], as_index=False)["n"].sum())

    cont = grouped_sum(
        ds.select_columns([pred_col, truth_col]).map_batches(
            pair_partial, batch_format="pandas"
        ),
        ["c", "t"],
        ["n"],
    ).materialize()  # consumed by both marginal passes below

    def ratio_by(key: str):
        def per_part(part: pd.DataFrame) -> pd.DataFrame:
            n = part["n"].to_numpy(dtype=np.float64)
            denom = part.groupby(key)["n"].transform("sum").to_numpy(
                dtype=np.float64
            )
            return pd.DataFrame(
                {
                    "s": [float((n * n / denom).sum())],
                    "n_rows": [int(part["n"].sum())],
                }
            )

        return partitioned_map(cont, [key], per_part).to_pandas()

    p_parts = ratio_by("c")
    r_parts = ratio_by("t")
    n_total = int(p_parts["n_rows"].sum())
    if n_total == 0:
        return pd.DataFrame(
            {
                "n": pd.Series([0], dtype="int64"),
                "precision": [0.0],
                "recall": [0.0],
                "f1": [0.0],
            }
        )
    precision = round(float(p_parts["s"].sum()) / n_total, round_to)
    recall = round(float(r_parts["s"].sum()) / n_total, round_to)
    f1 = (
        round(2 * precision * recall / (precision + recall), round_to)
        if precision + recall > 0
        else 0.0
    )
    return pd.DataFrame(
        {
            "n": pd.Series([n_total], dtype="int64"),
            "precision": [precision],
            "recall": [recall],
            "f1": [f1],
        }
    )


def conformal_ols_intervals(
    ds: ray.data.Dataset,
    x: str,
    y: str,
    by: str,
    id_col: str,
    *,
    alpha_permille: int = 100,
    y_cents: bool = True,
) -> ray.data.Dataset:
    """Split-conformal prediction intervals around a per-group OLS fit
    (Vovk et al. 2005; the split/inductive variant of Papadopoulos et
    al. 2002): even ``id_col`` rows FIT the line, odd rows CALIBRATE —
    the conformal quantile q̂ is the ⌈(n_cal+1)(1−α)⌉-th smallest
    absolute residual, giving ŷ ± q̂ with ≥ 1−α finite-sample coverage
    on exchangeable data.

    Exactness contract: the fit uses exact int64 cent/size sums
    (the grouped_ols closed form, identical float tree to the SQL
    twin); calibration residuals snap to CENTS so the per-group
    quantile is an integer-histogram nearest-rank lookup — one bounded
    grouped count shuffle (groups × distinct residual cents), no
    per-row quantile state.

    Output: (by, n_fit:int64, n_cal:int64, slope:float64,
    intercept:float64, q_hat_cents:int64 — interval half-width).
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum
    from pdf_parser_ray.stages import worker_state

    scale = 100.0 if y_cents else 1.0

    def fit_partial(df: pd.DataFrame):
        d = df[df[id_col] % 2 == 0]
        X = d[x].to_numpy(dtype=np.float64)
        Y = np.rint(d[y].to_numpy(dtype=np.float64) * scale).astype(np.int64)
        g = pd.DataFrame(
            {
                by: d[by],
                "n": np.int64(1),
                "sx": d[x].astype("int64"),
                "sy": Y,
                "sxx": (X * X).astype(np.int64),
                "sxy": (X * Y).astype(np.int64),
            }
        )
        return arrow_out(
            g.groupby(by, as_index=False)[["n", "sx", "sy", "sxx", "sxy"]].sum()
        )

    sums = grouped_sum(
        ds.select_columns([by, x, y, id_col]).map_batches(
            fit_partial, batch_format="pandas"
        ),
        [by],
        ["n", "sx", "sy", "sxx", "sxy"],
    ).to_pandas()  # bounded: one row per group

    fits: dict = {}
    for _, r in sums.iterrows():
        n, sx, sy, sxx, sxy = (
            int(r["n"]), int(r["sx"]), int(r["sy"]), int(r["sxx"]),
            int(r["sxy"]),
        )
        denom = n * sxx - sx * sx
        if n == 0 or denom == 0:
            continue
        slope = (n * sxy - sx * sy) / denom
        intercept = (sy - slope * sx) / n
        fits[r[by]] = (slope, intercept, n)
    fit_ref = ray.put(fits)

    def cal_partial(df: pd.DataFrame):
        fmap = worker_state(
            ("conf_fits", fit_ref.hex()), lambda: ray.get(fit_ref)
        )
        d = df[df[id_col] % 2 == 1]
        rows = []
        for g, grp in d.groupby(by, sort=False):
            fit = fmap.get(g)
            if fit is None:
                continue
            slope, intercept, _ = fit
            X = grp[x].to_numpy(dtype=np.float64)
            Y = np.rint(grp[y].to_numpy(dtype=np.float64) * scale)
            res = np.rint(np.abs(Y - (slope * X + intercept))).astype(np.int64)
            u, c = np.unique(res, return_counts=True)
            rows.append(pd.DataFrame({by: g, "res": u, "c": c}))
        if not rows:
            return arrow_out(
                pd.DataFrame(
                    {
                        by: pd.Series([], dtype="object"),
                        "res": pd.Series([], dtype="int64"),
                        "c": pd.Series([], dtype="int64"),
                    }
                )
            )
        return arrow_out(pd.concat(rows, ignore_index=True))

    hist = grouped_sum(
        ds.select_columns([by, x, y, id_col]).map_batches(
            cal_partial, batch_format="pandas"
        ),
        [by, "res"],
        ["c"],
    ).to_pandas()  # bounded: groups × distinct residual cents

    out_rows = []
    if by not in hist.columns:  # every group degenerate → empty frame
        hist = pd.DataFrame(
            {
                by: pd.Series([], dtype="object"),
                "res": pd.Series([], dtype="int64"),
                "c": pd.Series([], dtype="int64"),
            }
        )
    for g, grp in hist.sort_values([by, "res"]).groupby(by, sort=True):
        slope, intercept, n_fit = fits[g]
        c = grp["c"].to_numpy(dtype=np.int64)
        n_cal = int(c.sum())
        rank = min(
            n_cal,
            -(-((n_cal + 1) * (1000 - alpha_permille)) // 1000),  # ceil
        )
        cum = np.cumsum(c)
        q_hat = int(grp["res"].to_numpy()[np.searchsorted(cum, rank)])
        out_rows.append((g, n_fit, n_cal, slope, intercept, q_hat))
    out = pd.DataFrame(
        out_rows,
        columns=[by, "n_fit", "n_cal", "slope", "intercept", "q_hat_cents"],
    ).astype({"n_fit": "int64", "n_cal": "int64", "q_hat_cents": "int64"})
    return ray.data.from_arrow(pa.Table.from_pandas(out, preserve_index=False))


# Abramowitz & Stegun 26.2.17 — shared verbatim with the SQL twin
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_AS_T = 0.2316419
_INV_SQRT_2PI = 0.3989422804014327


def _norm_sf(x: float) -> float:
    """Upper-tail Φ̄(x) for x ≥ 0 via the A&S 26.2.17 polynomial —
    elementary ops only (exp, *, +) so DuckDB evaluates the identical
    expression tree."""
    t = 1.0 / (1.0 + _AS_T * x)
    poly = t * (
        _AS_B[0]
        + t * (_AS_B[1] + t * (_AS_B[2] + t * (_AS_B[3] + t * _AS_B[4])))
    )
    import math

    return _INV_SQRT_2PI * math.exp(-x * x / 2.0) * poly


def grouped_welch_fdr(
    ds: ray.data.Dataset,
    value_col: str,
    group_col: str,
    unit_col: str,
    *,
    alpha: float = 0.05,
    round_to: int = 6,
) -> pd.DataFrame:
    """Per-group two-cohort Welch z tests with Benjamini-Hochberg FDR
    control (Benjamini & Hochberg 1995) — the multiple-testing guard a
    metrics platform needs the moment it tests MANY segments at once:
    each ``group_col`` value runs an independent Welch test between
    the even/odd ``unit_col`` cohorts; the m p-values are then
    BH-adjusted (p̂_(i) = min_{j≥i} p_(j)·m/j, clamped to 1).

    Exactness: per-(group, cohort) moments (n, Σy, Σy²) are exact
    int64 cent sums from ONE bounded grouped shuffle; z follows the
    ab_welch_srm cast-then-divide float tree; Φ̄ is the shared
    A&S 26.2.17 polynomial; p rounds to ``round_to`` BEFORE the BH
    suffix-min (so both engines adjust identical inputs), and ranks
    order by (p, group) — fully deterministic under ties.

    Output: one row per testable group (both cohorts n ≥ 2) —
    (group_col, n_a:int64, n_b:int64, z, p, p_adj:float64,
    significant:bool — p_adj ≤ alpha).
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    def moment_partial(df: pd.DataFrame) -> pa.Table:
        y = np.rint(df[value_col].to_numpy(dtype=np.float64) * 100.0).astype(
            np.int64
        )
        g = pd.DataFrame(
            {
                group_col: df[group_col],
                "cohort": (df[unit_col].astype("int64") % 2),
                "n": np.int64(1),
                "sy": y,
                "syy": y * y,
            }
        )
        return arrow_out(
            g.groupby([group_col, "cohort"], as_index=False)[
                ["n", "sy", "syy"]
            ].sum()
        )

    mom = grouped_sum(
        ds.select_columns([group_col, unit_col, value_col]).map_batches(
            moment_partial, batch_format="pandas"
        ),
        [group_col, "cohort"],
        ["n", "sy", "syy"],
    ).to_pandas()  # bounded: groups × 2 rows

    rows = []
    for g, grp in mom.groupby(group_col, sort=True):
        sides = {int(r["cohort"]): r for _, r in grp.iterrows()}
        if 0 not in sides or 1 not in sides:
            continue
        stat = {}
        for c in (0, 1):
            n, sy, syy = (
                int(sides[c]["n"]), int(sides[c]["sy"]), int(sides[c]["syy"])
            )
            if n < 2:
                stat = None
                break
            mean = float(sy) / float(n)
            var = float(n * syy - sy * sy) / float(n * (n - 1))
            stat[c] = (n, mean, var)
        if stat is None:
            continue
        (na, ma, va), (nb, mb, vb) = stat[0], stat[1]
        se2 = va / na + vb / nb
        if se2 <= 0:
            continue
        import math

        z = (ma - mb) / math.sqrt(se2)
        p = round(min(1.0, 2.0 * _norm_sf(abs(z))), round_to)
        rows.append((g, na, nb, round(z, round_to), p))
    if not rows:
        return pd.DataFrame(
            {
                group_col: pd.Series([], dtype="object"),
                "n_a": pd.Series([], dtype="int64"),
                "n_b": pd.Series([], dtype="int64"),
                "z": pd.Series([], dtype="float64"),
                "p": pd.Series([], dtype="float64"),
                "p_adj": pd.Series([], dtype="float64"),
                "significant": pd.Series([], dtype="bool"),
            }
        )
    out = pd.DataFrame(rows, columns=[group_col, "n_a", "n_b", "z", "p"])
    m = len(out)
    out = out.sort_values(["p", group_col]).reset_index(drop=True)
    raw = [p * m / (i + 1) for i, p in enumerate(out["p"])]
    suffix = [0.0] * m
    running = float("inf")
    for i in range(m - 1, -1, -1):
        running = min(running, raw[i])
        suffix[i] = round(min(1.0, running), round_to)
    out["p_adj"] = suffix
    out["significant"] = out["p_adj"] <= alpha
    return out.astype({"n_a": "int64", "n_b": "int64"})


def diff_in_diff(
    ds: ray.data.Dataset,
    ts_col: str,
    value_col: str,
    unit_col: str,
    *,
    split_ts: "pd.Timestamp",
    round_to: int = 6,
) -> pd.DataFrame:
    """Difference-in-differences readout (Card & Krueger 1994 design):
    treatment = the md5 hash gate on the UNIT (the repo's split-gate
    idiom — deterministic, covariate-free), period = before/after
    ``split_ts``; the causal estimate is the interaction
    (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre), with the pooled
    standard error from the four cells' Welch variances.

    One bounded grouped shuffle: per-batch (treat, post) exact int64
    cent moments (n, Σy, Σy²) — four cells total; every mean/variance
    follows the ab_welch_srm cast-then-divide float tree.

    Output (eager, one row): (n_tp, n_tq, n_cp, n_cq:int64 — cell
    sizes (T/C × post/pre), did:float64 — the interaction in cents,
    se:float64, z:float64 rounded to ``round_to``).
    """
    import hashlib
    import math

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    def cell_partial(df: pd.DataFrame) -> pa.Table:
        y = np.rint(df[value_col].to_numpy(dtype=np.float64) * 100.0).astype(
            np.int64
        )
        treat = df[unit_col].map(
            lambda i: hashlib.md5(str(i).encode("ascii")).hexdigest()[0] < "8"
        )
        post = df[ts_col] >= split_ts
        g = pd.DataFrame(
            {
                "treat": treat.astype("int64"),
                "post": post.astype("int64"),
                "n": np.int64(1),
                "sy": y,
                "syy": y * y,
            }
        )
        return arrow_out(
            g.groupby(["treat", "post"], as_index=False)[
                ["n", "sy", "syy"]
            ].sum()
        )

    mom = grouped_sum(
        ds.select_columns([ts_col, value_col, unit_col]).map_batches(
            cell_partial, batch_format="pandas"
        ),
        ["treat", "post"],
        ["n", "sy", "syy"],
    ).to_pandas()  # exactly four rows

    cells: dict = {}
    for _, r in mom.iterrows():
        n, sy, syy = int(r["n"]), int(r["sy"]), int(r["syy"])
        if n < 2:
            continue
        mean = float(sy) / float(n)
        var = float(n * syy - sy * sy) / float(n * (n - 1))
        cells[(int(r["treat"]), int(r["post"]))] = (n, mean, var)
    if len(cells) < 4:
        return pd.DataFrame(
            {
                "n_tp": pd.Series([0], dtype="int64"),
                "n_tq": pd.Series([0], dtype="int64"),
                "n_cp": pd.Series([0], dtype="int64"),
                "n_cq": pd.Series([0], dtype="int64"),
                "did": [float("nan")],
                "se": [float("nan")],
                "z": [float("nan")],
            }
        )
    (ntp, mtp, vtp) = cells[(1, 1)]
    (ntq, mtq, vtq) = cells[(1, 0)]
    (ncp, mcp, vcp) = cells[(0, 1)]
    (ncq, mcq, vcq) = cells[(0, 0)]
    did = (mtp - mtq) - (mcp - mcq)
    se = math.sqrt(vtp / ntp + vtq / ntq + vcp / ncp + vcq / ncq)
    z = round(did / se, round_to) if se > 0 else float("nan")
    return pd.DataFrame(
        {
            "n_tp": pd.Series([ntp], dtype="int64"),
            "n_tq": pd.Series([ntq], dtype="int64"),
            "n_cp": pd.Series([ncp], dtype="int64"),
            "n_cq": pd.Series([ncq], dtype="int64"),
            "did": [did],
            "se": [se],
            "z": [z],
        }
    )


def james_stein_means(
    ds: ray.data.Dataset,
    value_col: str,
    group_col: str,
    *,
    round_to: int = 6,
) -> ray.data.Dataset:
    """Empirical-Bayes shrinkage of per-group means toward the grand
    mean (James & Stein 1961 / Efron & Morris 1975) — the estimator a
    metrics platform wants for SPARSE segments, where raw group means
    are mostly noise: x̂_g = x̄ + (1 − c)·(x̄_g − x̄) with
    c = (m − 3)·σ̄² / Σ_g (x̄_g − x̄)², σ̄² the mean of the groups'
    squared standard errors (s²_g/n_g), clamped to [0, 1].

    One bounded grouped shuffle (exact int64 cent moments per group);
    the shrinkage algebra runs on the tiny group table with the
    cast-then-divide float tree, Σ over groups in ``group_col``-sorted
    order (the SQL twin orders the same way; the final floats round to
    ``round_to`` as cross-row sums).

    Output: (group_col, n:int64, raw_mean, shrunk_mean:float64
    rounded, shrink_c:float64 rounded — identical on every row).
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    def moment_partial(df: pd.DataFrame) -> pa.Table:
        y = np.rint(df[value_col].to_numpy(dtype=np.float64) * 100.0).astype(
            np.int64
        )
        g = pd.DataFrame(
            {group_col: df[group_col], "n": np.int64(1), "sy": y, "syy": y * y}
        )
        return arrow_out(
            g.groupby(group_col, as_index=False)[["n", "sy", "syy"]].sum()
        )

    mom = (
        grouped_sum(
            ds.select_columns([group_col, value_col]).map_batches(
                moment_partial, batch_format="pandas"
            ),
            [group_col],
            ["n", "sy", "syy"],
        )
        .to_pandas()  # bounded: one row per group
        .sort_values(group_col)
        .reset_index(drop=True)
    )
    mom = mom[mom["n"] >= 2].reset_index(drop=True)
    m = len(mom)
    n = mom["n"].astype("int64")
    sy = mom["sy"].astype("int64")
    syy = mom["syy"].astype("int64")
    grand = float(int(sy.sum())) / float(int(n.sum()))
    means = sy.astype("float64") / n.astype("float64")
    s2 = (n * syy - sy * sy).astype("float64") / (n * (n - 1)).astype(
        "float64"
    )
    se2_mean = float((s2 / n.astype("float64")).sum()) / m if m else 0.0
    dev2 = float(((means - grand) ** 2).sum())
    if m > 3 and dev2 > 0:
        c = min(1.0, max(0.0, (m - 3) * se2_mean / dev2))
    else:
        c = 0.0
    shrunk = grand + (1.0 - c) * (means - grand)
    out = pd.DataFrame(
        {
            group_col: mom[group_col],
            "n": n,
            "raw_mean": means,
            "shrunk_mean": np.round(shrunk, round_to),
            "shrink_c": np.round(np.full(m, c), round_to),
        }
    )
    return ray.data.from_arrow(pa.Table.from_pandas(out, preserve_index=False))


def theil_sen_slope(
    ds: ray.data.Dataset,
    x: str,
    y: str,
    by: str,
    id_col: str,
    *,
    sample_k: int = 40,
    y_cents: bool = True,
) -> pd.DataFrame:
    """Theil-Sen robust slope per group (Theil 1950 / Sen 1968: the
    median of all pairwise slopes — 29% breakdown point where OLS has
    none) on a DETERMINISTIC md5-bounded sample: each group keeps its
    ``sample_k`` rows with the smallest md5(id) hex (the repo's
    seeded-sample idiom, so the SQL twin selects the identical rows),
    then evaluates all O(k²) pairwise slopes exactly.

    Distributed shape: per-batch partial top-k by hash per group → one
    bounded co-location → driver finish on groups × k rows.  Slopes
    are per-pair ratios of identical int operands (bit-identical
    doubles); the reported slope is the LOWER median — the
    ((n_pairs+1)//2)-th smallest — a selection, not an average, so no
    rounding contract is needed.

    Output (eager): (by, n_sample:int64, n_pairs:int64,
    theil_slope:float64); groups with < 2 distinct x in sample drop.
    """
    import hashlib

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    def sample_partial(df: pd.DataFrame) -> pa.Table:
        h = df[id_col].map(
            lambda i: hashlib.md5(str(i).encode("ascii")).hexdigest()
        )
        g = pd.DataFrame(
            {
                by: df[by],
                "h": h,
                "xv": df[x].astype("int64"),
                "yv": np.rint(
                    df[y].to_numpy(dtype=np.float64)
                    * (100.0 if y_cents else 1.0)
                ).astype(np.int64),
            }
        )
        return arrow_out(
            g.sort_values([by, "h"]).groupby(by, as_index=False).head(sample_k)
        )

    def per_part(part: pd.DataFrame) -> pd.DataFrame:
        return (
            part.sort_values([by, "h"])
            .groupby(by, as_index=False)
            .head(sample_k)
        )

    sample = partitioned_map(
        ds.select_columns([by, x, y, id_col]).map_batches(
            sample_partial, batch_format="pandas"
        ),
        [by],
        per_part,
    ).to_pandas()  # bounded: groups × sample_k

    rows = []
    for g, grp in sample.sort_values([by, "h"]).groupby(by, sort=True):
        grp = grp.head(sample_k)
        xv = grp["xv"].to_numpy(dtype=np.int64)
        yv = grp["yv"].to_numpy(dtype=np.int64)
        ii, jj = np.triu_indices(len(grp), k=1)
        dx = xv[jj] - xv[ii]
        keep = dx != 0
        if not keep.any():
            continue
        slopes = (yv[jj] - yv[ii])[keep] / dx[keep]
        slopes.sort()
        n_pairs = len(slopes)
        med = float(slopes[(n_pairs + 1) // 2 - 1])
        rows.append((g, len(grp), n_pairs, med))
    return pd.DataFrame(
        rows, columns=[by, "n_sample", "n_pairs", "theil_slope"]
    ).astype({"n_sample": "int64", "n_pairs": "int64"})


def _log_phi_pair(z: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """(ln Φ(z), ln(1−Φ(z))) via the shared A&S 26.2.17 upper tail —
    branch so each log always consumes the DIRECTLY-computed small
    tail (no 1−x cancellation on the side that matters)."""
    z = np.asarray(z, dtype=np.float64)
    q_abs = np.array([_norm_sf(abs(x)) for x in z])  # Q(|z|)
    log_phi = np.where(z >= 0, np.log(1.0 - q_abs), np.log(q_abs))
    log_q = np.where(z >= 0, np.log(q_abs), np.log(1.0 - q_abs))
    return log_phi, log_q


def grouped_anderson_darling(
    ds: ray.data.Dataset,
    value_col: str,
    group_col: str,
    *,
    round_to: int = 4,
) -> ray.data.Dataset:
    """Anderson-Darling normality statistic per group (Anderson &
    Darling 1954; the tail-sensitive refinement of the KS gate in
    q:value_ks_test): A² = −n − (1/n)Σᵢ(2i−1)[ln Φ(zᵢ) +
    ln(1−Φ(z_{n+1−i}))] against the N(μ̂, σ̂²) fit.

    Sort-free: the per-(group, cent-value) histogram (ONE bounded
    co-location, the mannwhitney/spearman plan) turns each distinct
    value's run of sorted positions [a, a+k) into EXACT integer
    coefficient sums — Σ(2i−1) = k(2a+k−2) for the Φ side and
    k(2n+2−2a−k) for the survival side — so no row-level rank pass
    exists.  μ̂, σ̂ (population) come from exact int64 cent moments;
    Φ is the shared A&S 26.2.17 polynomial, branch-evaluated so each
    log reads its own directly-computed tail.  A² rounds to
    ``round_to`` (cross-row float sums).

    Output: (group_col, n:int64, a2:float64); groups with σ̂ = 0 drop.
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    def hist_partial(df: pd.DataFrame) -> pa.Table:
        v = np.rint(df[value_col].to_numpy(dtype=np.float64) * 100.0).astype(
            np.int64
        )
        g = pd.DataFrame({group_col: df[group_col], "v": v})
        g["k"] = np.int64(1)
        return arrow_out(g.groupby([group_col, "v"], as_index=False)["k"].sum())

    hist = (
        grouped_sum(
            ds.select_columns([group_col, value_col]).map_batches(
                hist_partial, batch_format="pandas"
            ),
            [group_col, "v"],
            ["k"],
        )
        .to_pandas()  # bounded: groups × distinct cent values
        .sort_values([group_col, "v"])
        .reset_index(drop=True)
    )
    rows = []
    for g, grp in hist.groupby(group_col, sort=True):
        k = grp["k"].to_numpy(dtype=np.int64)
        v = grp["v"].to_numpy(dtype=np.int64)
        n = int(k.sum())
        sy = int((k * v).sum())
        syy = int((k * v * v).sum())
        var_num = n * syy - sy * sy
        if n < 2 or var_num <= 0:
            continue
        mean = sy / n
        std = np.sqrt(var_num) / n
        z = (v - mean) / std
        cum = np.cumsum(k)
        a = cum - k + 1  # 1-based start of each value's run
        s1 = k * (2 * a + k - 2)
        s2 = k * (2 * n + 2 - 2 * a - k)
        log_phi, log_q = _log_phi_pair(z)
        a2 = -n - float((s1 * log_phi + s2 * log_q).sum()) / n
        rows.append((g, n, round(a2, round_to)))
    if not rows:  # every group degenerate → typed empty (Ray would
        # otherwise surface a column-less frame downstream)
        return ray.data.from_arrow(
            pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "a2": pa.array([], pa.float64()),
                }
            )
        )
    out = pd.DataFrame(rows, columns=[group_col, "n", "a2"]).astype(
        {"n": "int64"}
    )
    return ray.data.from_arrow(pa.Table.from_pandas(out, preserve_index=False))
