"""Mergeable sketches: approximate distinct counting at corpus scale.

A bare ``ds.unique(col)`` / COUNT(DISTINCT) shuffles every value.  The
scale pattern (ray_guide "Aggregation at scale") is one sketch per batch
+ a tiny merge: this module implements HyperLogLog from the published
algorithm (Flajolet et al. 2007, with the standard small-range
linear-counting correction) over 2^b registers.

Accuracy: σ ≈ 1.04/√m → ~1.6% at b=12 (4096 registers, 4 KB/sketch).
Sketches are numpy uint8 arrays; merge = elementwise max — perfect for
``map_batches`` partials unioned on the driver or in a reduce stage.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import ray.data


class HLL:
    __slots__ = ("b", "m", "registers")

    def __init__(self, b: int = 12, registers: np.ndarray | None = None):
        self.b = b
        self.m = 1 << b
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Vectorized add of 64-bit hashes."""
        if len(hashes) == 0:
            return
        h = hashes.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.b)).astype(np.int64)
        rest = (h << np.uint64(self.b)) | (np.uint64(1) << np.uint64(self.b - 1))
        # rank = position of the leftmost 1 bit in the remaining 64-b bits
        lz = np.zeros(len(rest), dtype=np.uint8)
        cur = rest.copy()
        mask_top = np.uint64(1) << np.uint64(63)
        alive = np.ones(len(rest), dtype=bool)
        for _ in range(64 - self.b + 1):
            top_zero = alive & ((cur & mask_top) == 0)
            lz[top_zero] += 1
            alive = top_zero
            if not alive.any():
                break
            cur[alive] = cur[alive] << np.uint64(1)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HLL") -> "HLL":
        return HLL(self.b, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting correction
        return float(est)


def _hash_strings(values) -> np.ndarray:
    """Process-stable, well-distributed 64-bit hashes.

    Vectorized via ``pandas.util.hash_array`` (siphash-1-3 with a FIXED
    default key — identical across processes/workers, unlike Python's
    salted ``hash``).  ~40× faster than a per-value hashlib loop.
    """
    arr = np.asarray([str(v) for v in values], dtype=object)
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr).astype(np.uint64)


def _hash_strings_md5(values) -> np.ndarray:
    """md5-prefix 64-bit hashes: slower than siphash but reproducible in
    ANY engine (``('0x' || substr(md5(v),1,16))::UBIGINT`` in DuckDB) —
    the hash that lets a SQL oracle emulate the registers bit-exactly."""
    import hashlib

    return np.fromiter(
        (int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:16], 16)
         for v in values),
        dtype=np.uint64,
        count=len(values),
    )


def hll_distinct(
    ds: ray.data.Dataset, col: str, b: int = 12, *, hash_fn: str = "siphash"
) -> float:
    """Approximate COUNT(DISTINCT col): per-batch sketches merged on the
    driver (each partial is 4 KB — the merge is trivially small).

    ``hash_fn="md5"`` swaps the fast siphash for md5-prefix hashing so
    the whole sketch (buckets, ranks, estimate) is reproducible in SQL.
    """
    hasher = _hash_strings_md5 if hash_fn == "md5" else _hash_strings

    def sketch_batch(df: pd.DataFrame) -> pd.DataFrame:
        h = HLL(b)
        h.add_hashes(hasher(df[col].dropna().tolist()))
        return pd.DataFrame({"sketch": [h.registers.tobytes()]})

    parts = ds.map_batches(sketch_batch, batch_format="pandas").take_all()
    merged = HLL(b)
    for p in parts:
        merged = merged.merge(HLL(b, np.frombuffer(p["sketch"], dtype=np.uint8).copy()))
    return merged.estimate()


# --------------------------------------------------------- heavy hitters

class MisraGries:
    """Misra-Gries heavy-hitters summary (Misra & Gries 1982) with the
    mergeable-summaries combine rule (Agarwal et al., PODS 2012): add
    counter maps, then if over capacity subtract the (k+1)-th largest
    count from every counter and drop the non-positive ones.

    Guarantee: each reported count undercounts by at most N/ (k+1).
    When the true number of distinct values never exceeds ``k`` (at any
    merge point), NO decrement ever happens and counts are EXACT —
    which is what makes the driver's SQL oracle applicable on the
    synthetic tables.

    ``shed`` tracks the EXACT total mass subtracted by shrinks (summed
    across merges): for any value v, true_count(v) lies in
    [counts.get(v, 0), counts.get(v, 0) + shed].  It is the tight
    per-instance undercount bound (always ≤ the worst-case N/(k+1)),
    letting callers decide whether a key COULD exceed a threshold —
    detect_hot_keys' miss-proof candidate gate rides on it.
    """

    __slots__ = ("k", "counts", "shed")

    def __init__(self, k: int, counts: dict | None = None, shed: int = 0):
        self.k = k
        self.counts: dict = counts or {}
        self.shed = int(shed)

    def add_counts(self, value_counts: dict) -> None:
        c = self.counts
        for v, n in value_counts.items():
            c[v] = c.get(v, 0) + int(n)
        self._shrink()

    def merge(self, other: "MisraGries") -> "MisraGries":
        out = MisraGries(self.k, dict(self.counts), self.shed + other.shed)
        out.add_counts(other.counts)
        return out

    def _shrink(self) -> None:
        if len(self.counts) <= self.k:
            return
        threshold = sorted(self.counts.values(), reverse=True)[self.k]
        self.shed += int(threshold)
        self.counts = {
            v: n - threshold for v, n in self.counts.items() if n > threshold
        }

    def top(self, n: int) -> list[tuple]:
        # deterministic: count desc, value asc
        return sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))[:n]


def top_k_frequent(
    ds: ray.data.Dataset, col: str, *, k: int = 10, capacity: int = 4096
) -> pd.DataFrame:
    """Top-k most frequent values of ``col`` via mergeable Misra-Gries
    partials: one bounded (≤ capacity entries) summary per batch, a tiny
    driver merge — no shuffle of the raw values at all.

    Exact when distinct(col) ≤ capacity (see :class:`MisraGries`);
    approximate with the N/(capacity+1) undercount bound otherwise.
    Output columns: (value, n) sorted by (n desc, value asc).
    """

    def sketch_batch(df: pd.DataFrame) -> pd.DataFrame:
        mg = MisraGries(capacity)
        vc = df[col].dropna().value_counts()
        mg.add_counts(vc.to_dict())
        items = mg.counts
        return pd.DataFrame(
            {"value": [list(items.keys())], "n": [list(items.values())]}
        )

    parts = ds.map_batches(sketch_batch, batch_format="pandas").take_all()
    merged = MisraGries(capacity)
    for p in parts:
        merged.add_counts(dict(zip(p["value"], (int(x) for x in p["n"]))))
    top = merged.top(k)
    return pd.DataFrame(
        {"value": [t[0] for t in top], "n": pd.Series([t[1] for t in top], dtype="int64")}
    )


def grouped_hll_distinct(
    ds: ray.data.Dataset, group_col: str, col: str, *, b: int = 12,
    hash_fn: str = "siphash",
) -> ray.data.Dataset:
    """Approximate COUNT(DISTINCT col) PER GROUP — the mergeable-sketch
    shape for grouped cardinality at corpus scale.

    Per batch: one 2^b-byte HLL register row per group present in the
    batch (vectorized siphash, max-reduced registers); the ONLY shuffle
    is a groupby over (group, sketch) rows — O(groups x batches) rows of
    fixed size, never the raw values.  The per-group merge is a
    register-wise max over at most #batches sketches.

    Compare with the exact twin (distinct pairs -> grouped count) when
    the driver needs a hash-checkable answer; the sketch path is for
    cardinalities where the exact distinct shuffle is the bottleneck.

    Output: (group_col, n_distinct_est:float64).
    """

    hasher = _hash_strings_md5 if hash_fn == "md5" else _hash_strings

    def sketch_batch(df: pd.DataFrame):
        groups, sketches = [], []
        for g, sub in df.groupby(group_col, sort=False):
            h = HLL(b)
            h.add_hashes(hasher(sub[col].dropna().tolist()))
            groups.append(g)
            sketches.append(h.registers.tobytes())
        from pdf_parser_ray.io_utils import arrow_out

        return arrow_out(pd.DataFrame({group_col: groups, "sketch": sketches}))

    def merge_group(part: pd.DataFrame) -> pd.DataFrame:
        merged = HLL(b)
        for sbytes in part["sketch"]:
            merged = merged.merge(
                HLL(b, np.frombuffer(sbytes, dtype=np.uint8).copy())
            )
        return pd.DataFrame(
            {
                group_col: [part[group_col].iloc[0]],
                "n_distinct_est": [merged.estimate()],
            }
        )

    return (
        ds.map_batches(sketch_batch, batch_format="pandas")
        .groupby(group_col)
        .map_groups(merge_group, batch_format="pandas")
    )


def grouped_distinct_exact(
    ds: ray.data.Dataset, group_col: str, col: str, *, n_parts: int | None = None
) -> ray.data.Dataset:
    """Exact COUNT(DISTINCT col) per group — the sketch's oracle twin.

    Per-batch pair dedup (the combiner) -> hash-partitioned co-location
    of the distinct (group, col) pairs (ONE int-keyed shuffle via
    ops.shuffle.partitioned_map — a direct groupby on the string pair
    key would sort-shuffle on wide strings, measured 3-4x slower on the
    profile_events column melt) -> per-partition global dedup + count
    -> tiny final grouped sum.  Shuffle volume is bounded by the number
    of DISTINCT pairs, not rows.

    Output: (group_col, n_distinct:int64).
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    def pair_dedup(df: pd.DataFrame):
        return arrow_out(df[[group_col, col]].drop_duplicates())

    pairs = ds.map_batches(pair_dedup, batch_format="pandas")

    def count_partition(part: pd.DataFrame) -> pd.DataFrame:
        # every (group, col) pair lands in exactly one partition, so a
        # partition-local dedup is a global dedup
        g = part.drop_duplicates().groupby(group_col, as_index=False).size()
        return g.rename(columns={"size": "n_distinct"}).astype(
            {"n_distinct": "int64"}
        )

    partials = partitioned_map(
        pairs, [group_col, col], count_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )
    return partials.groupby(group_col).aggregate(
        Sum("n_distinct", alias_name="n_distinct")
    )


def psi_drift(
    ds,
    *,
    split_ts,
    lo: float,
    hi: float,
    n_bins: int = 10,
    value_col: str = "value",
    ts_col: str = "ts",
    round_to: int = 4,
):
    """Population-stability-index drift between two time windows — the
    data-quality monitor a continuously-ingesting corpus runs per
    increment (reference window vs current window).

    Distributed shape: each batch folds to ≤ 2·(n_bins+2) partial rows
    (window × bin counts via one vectorized digitize) before a tiny
    groupby; the PSI formula runs driver-side on the 2×(n_bins+2)-cell
    table.  Bin edges are FIXED (lo/hi/n_bins params), not data-derived
    — a second quantile pass would double the scan and make the metric
    non-reproducible across increments.

    PSI = Σ (q_i − p_i)·ln(q_i/p_i) over bins non-empty on either side,
    with underflow/overflow edge bins and the standard ε-smoothing
    (ε = 1e-6) replacing a zero share — WITHOUT it, mass moving into a
    previously-empty bin (the strongest drift signal) would be silently
    masked out.  Rounded to ``round_to`` (transcendental-function
    cross-engine tolerance, the lm_score rule).

    Output: one-row pandas DataFrame (psi:float64, n_ref:int64,
    n_cur:int64).
    """
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out

    edges = np.linspace(lo, hi, n_bins + 1)
    split = pd.Timestamp(split_ts)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cur = (df[ts_col] >= split).to_numpy()
        # bins 0..n_bins+1: 0 = underflow, n_bins+1 = overflow
        b = np.digitize(df[value_col].to_numpy(dtype=np.float64), edges)
        rows = []
        for is_cur in (False, True):
            counts = np.bincount(b[cur == is_cur], minlength=n_bins + 2)
            nz = np.nonzero(counts)[0]
            rows.append(pd.DataFrame({
                "win": np.full(len(nz), int(is_cur), dtype=np.int64),
                "bin": nz.astype(np.int64),
                "n": counts[nz].astype(np.int64)}))
        return arrow_out(pd.concat(rows, ignore_index=True))

    cells = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["win", "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ 2·(n_bins+2) rows
    )
    ref = np.zeros(n_bins + 2, dtype=np.float64)
    cur = np.zeros(n_bins + 2, dtype=np.float64)
    for _, r in cells.iterrows():
        (cur if r["win"] else ref)[int(r["bin"])] = float(r["n"])
    n_ref, n_cur = ref.sum(), cur.sum()
    p = ref / max(n_ref, 1.0)
    q = cur / max(n_cur, 1.0)
    m = (p > 0) | (q > 0)
    ps = np.where(p[m] > 0, p[m], 1e-6)
    qs = np.where(q[m] > 0, q[m], 1e-6)
    psi = float(np.round(((qs - ps) * np.log(qs / ps)).sum(), round_to))
    return pd.DataFrame({
        "psi": [psi],
        "n_ref": [int(n_ref)],
        "n_cur": [int(n_cur)]})


def grouped_top_k_frequent(
    ds: ray.data.Dataset,
    group_col: str,
    col: str,
    *,
    k: int = 5,
    capacity: int = 4096,
) -> ray.data.Dataset:
    """Top-k most frequent ``col`` values PER GROUP via mergeable
    Misra-Gries partials — the grouped twin of :func:`top_k_frequent`
    (heavy tokens per language, heavy domains per snapshot, ...).

    Per batch: one bounded (≤ capacity entries) summary row per group
    present — the shuffle moves O(groups × batches) fixed-size
    summaries, never raw values; the per-group merge folds ≤ #batches
    summaries.  Exact when distinct(col) ≤ capacity within every group
    (the MisraGries guarantee), approximate with the N/(capacity+1)
    undercount bound otherwise.

    Output: (group_col, value, n:int64), ≤ k rows per group,
    (n DESC, value ASC) within each group.
    """

    def sketch_batch(df: pd.DataFrame):
        from pdf_parser_ray.io_utils import arrow_out

        groups, values, counts = [], [], []
        for g, sub in df.groupby(group_col, sort=False):
            mg = MisraGries(capacity)
            mg.add_counts(sub[col].dropna().value_counts().to_dict())
            groups.append(g)
            values.append(list(mg.counts.keys()))
            counts.append([int(x) for x in mg.counts.values()])
        return arrow_out(
            pd.DataFrame(
                {group_col: groups, "values": values, "counts": counts}
            )
        )

    def merge_group(part: pd.DataFrame) -> pd.DataFrame:
        merged = MisraGries(capacity)
        for vals, cnts in zip(part["values"], part["counts"]):
            merged.add_counts(dict(zip(vals, (int(c) for c in cnts))))
        top = merged.top(k)
        return pd.DataFrame(
            {
                group_col: [part[group_col].iloc[0]] * len(top),
                "value": [t[0] for t in top],
                "n": pd.Series([t[1] for t in top], dtype="int64"),
            }
        )

    return (
        ds.map_batches(sketch_batch, batch_format="pandas")
        .groupby(group_col)
        .map_groups(merge_group, batch_format="pandas")
    )


def approx_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: list[float],
    *,
    k: int = 4096,
    id_col: str | None = None,
    hash_fn: str = "siphash",
) -> pd.DataFrame:
    """Approximate quantiles from a KMV (bottom-k-by-hash) uniform
    sample — the mergeable-sketch quantile tier next to the EXACT
    3-pass `ops.quantiles` machinery (use that when the driver needs a
    hash-checkable answer; use this when one streaming pass must serve
    many quantiles cheaply).

    The k rows with the smallest siphash of their identity form a
    uniform-without-replacement sample whose merge is just "keep the
    global bottom k" — order-, partition- and rerun-invariant, no RNG.
    Per batch: one vectorized hash + ``np.argpartition``; globally: a
    tiny sort-limit over ≤ k·batches candidate rows.  Error ~ O(1/√k)
    on quantile rank (standard bottom-k sampling bound).

    ``id_col=None`` hashes the VALUE's string form — fine when values
    are near-unique; pass a real id column when heavy value duplication
    would bias the sample toward distinct values.

    Output: one-row pandas DataFrame, a column per requested quantile
    (named q50, q90, ... by percentile).
    """

    def bottom_k(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[col].dropna()
        basis = (
            df.loc[vals.index, id_col] if id_col is not None else vals
        )
        if hash_fn == "md5":
            # SQL-reproducible sampling hash (the hll_users_md5 trick):
            # DuckDB re-derives the identical bottom-k sample.
            h = _hash_strings_md5(basis.tolist())
        else:
            h = pd.util.hash_array(
                np.asarray([str(v) for v in basis], dtype=object)
            ).astype(np.uint64)
        if len(h) > k:
            idx = np.argpartition(h, k)[:k]
        else:
            idx = np.arange(len(h))
        return pd.DataFrame(
            {
                "h": h[idx].astype("uint64"),
                "v": vals.to_numpy(dtype=np.float64)[idx],
            }
        )

    import ray.data as _rd

    sample = (
        ds.map_batches(bottom_k, batch_format="pandas")
        .sort("h")
        .limit(k)
        .to_pandas()  # ≤ k rows by construction
    )
    v = np.sort(sample["v"].to_numpy())
    out = {}
    for q in qs:
        name = f"q{int(round(q * 100))}"
        if len(v) == 0:
            out[name] = [float("nan")]
        else:
            # nearest-rank on the uniform sample
            r = min(len(v) - 1, max(0, int(np.ceil(q * len(v))) - 1))
            out[name] = [float(v[r])]
    return pd.DataFrame(out)


def cms_top_k(
    ds: ray.data.Dataset,
    col: str = "user_id",
    *,
    depth: int = 4,
    width: int = 1024,
    k: int = 10,
) -> pd.DataFrame:
    """Count-Min sketch heavy hitters (Cormode & Muthukrishnan 2005):
    ``depth`` hash rows × ``width`` counters, update = +1 in one cell
    per row, estimate = min over rows — never under-counts, over-counts
    by at most εN with ε = e/width at the stated confidence.

    Per-batch partials are the sketch's own cells ((row, cell, n)
    triples, ≤ depth×width nonzero per batch) merged by a driver-side
    sum — bounded at depth×width regardless of corpus size, the
    mergeability that makes CMS the streaming alternative to an exact
    (value → count) shuffle.  Hash row j uses
    ``int(md5(f"{j}:{value}")[:8], 16) % width`` so a SQL engine can
    replay the EXACT cells (the register-exact oracle trick).

    The candidate set scanned for the top-k is the exact distinct-value
    set (per-batch unique partial → ``Dataset.unique``) — fine for
    user-cardinality columns; at 100 TB pair the sketch with a
    Misra-Gries candidate pass (:func:`top_k_frequent`) instead.

    Returns a driver-sized frame: (col, est_n:int64), top ``k`` by
    (est_n DESC, value ASC).
    """
    cms = _cms_merged_sketch(ds, col, depth=depth, width=width)

    candidates = sorted(ds.unique(col))
    cand = np.asarray(candidates)
    cells = _cms_cells(cand, depth, width)
    est = cms[np.arange(depth)[None, :], cells].min(axis=1)
    order = np.lexsort((cand, -est))[:k]
    return pd.DataFrame(
        {col: cand[order], "est_n": est[order].astype("int64")}
    )


def _cms_cells(values: np.ndarray, depth: int, width: int) -> np.ndarray:
    """distinct values -> (len, depth) int cell matrix via md5 — hash
    row j of value v is ``int(md5(f"{j}:{v}")[:8], 16) % width``, the
    SQL-replayable register contract shared by every CMS op here."""
    import hashlib

    out = np.empty((len(values), depth), dtype=np.int64)
    for i, v in enumerate(values):
        s = str(v)
        for j in range(depth):
            out[i, j] = (
                int(hashlib.md5(f"{j}:{s}".encode()).hexdigest()[:8], 16)
                % width
            )
    return out


def _cms_merged_sketch(
    ds: ray.data.Dataset, col: str, *, depth: int, width: int
) -> np.ndarray:
    """Per-batch CMS partials ((row, cell, n) triples, ≤ depth×width
    nonzero each) merged into one (depth, width) int64 sketch on the
    driver — bounded regardless of corpus size."""

    def sketch_batch(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        cache = worker_state(("cms_cells", depth, width), dict)
        counts = df[col].value_counts()
        vals = counts.index.to_numpy()
        missing = [v for v in vals if v not in cache]
        if missing:
            for v, row in zip(
                missing, _cms_cells(np.asarray(missing), depth, width)
            ):
                cache[v] = row
        mat = np.zeros((depth, width), dtype=np.int64)
        n = counts.to_numpy()
        for v, c in zip(vals, n):
            mat[np.arange(depth), cache[v]] += c
        j, cell = np.nonzero(mat)
        return pd.DataFrame(
            {"j": j.astype("int64"), "cell": cell.astype("int64"),
             "n": mat[j, cell].astype("int64")}
        )

    parts = (
        ds.select_columns([col])
        .map_batches(sketch_batch, batch_format="pandas")
        .to_pandas()  # bounded: <= depth*width rows per batch
    )
    cms = np.zeros((depth, width), dtype=np.int64)
    np.add.at(cms, (parts["j"].to_numpy(), parts["cell"].to_numpy()),
              parts["n"].to_numpy())
    return cms


def cms_selfjoin_size(
    ds: ray.data.Dataset,
    col: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> pd.DataFrame:
    """Self-join size (second frequency moment F2 = Σ_k c(k)²) estimate
    from the Count-Min sketch inner product (Cormode & Muthukrishnan
    2005 §4.2): est = min over hash rows of Σ_cell n² — an upper bound
    that tightens as width grows, computed WITHOUT the key-cardinality
    shuffle an exact Σc² needs.  The planner statistic for "how big
    would a join / self-join on this key be" and the standard skew
    diagnostic (F2/N² → uniformity).

    Same register contract as :func:`cms_top_k`, so a SQL twin replays
    the exact cells and takes the identical min — the estimate itself
    is value-checked, not just row-checked.

    Returns one row: (est:int64).
    """
    cms = _cms_merged_sketch(ds, col, depth=depth, width=width)
    est = int((cms.astype(object) ** 2).sum(axis=1).min())
    return pd.DataFrame({"est": pd.Series([est], dtype="int64")})


def grouped_kmv_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    col: str,
    qs: list[float],
    *,
    k: int = 1024,
    id_col: str | None = None,
    hash_fn: str = "siphash",
    n_parts: int | None = None,
) -> pd.DataFrame:
    """Per-group KMV quantiles — :func:`approx_quantiles` with a GROUP
    BY: each group keeps the k rows with the smallest identity hash (a
    uniform sample), merged by "keep the group's global bottom k".
    The per-group alternative to the exact 3-pass selection when the
    group count is large and one streaming pass must serve them all.

    Per-batch partials bound at k rows per (group, batch); ONE
    co-location shuffle of those partials; nearest-rank picks inside
    each bounded group frame.  ``hash_fn="md5"`` keeps the whole
    SAMPLE SQL-rederivable (the approx_quantiles_md5 trick, per
    group).

    Returns a driver-sized frame: (group_col, q50, q90, ... one column
    per requested quantile).
    """
    hasher = _hash_strings_md5 if hash_fn == "md5" else _hash_strings

    def bottom_k(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[col].dropna()
        sub = df.loc[vals.index]
        basis = sub[id_col] if id_col is not None else vals
        h = hasher(basis.tolist())
        part = pd.DataFrame(
            {
                group_col: sub[group_col].to_numpy(),
                "h": h.astype("uint64"),
                "v": vals.to_numpy(dtype=np.float64),
            }
        )
        return (
            part.sort_values([group_col, "h"])
            .groupby(group_col, sort=False)
            .head(k)
        )

    def per_group(part: pd.DataFrame) -> pd.DataFrame:
        g = (
            part.sort_values([group_col, "h"])
            .groupby(group_col, sort=False)
            .head(k)
        )
        rows = []
        for key, grp in g.groupby(group_col, sort=False):
            v = np.sort(grp["v"].to_numpy())
            row = {group_col: key}
            for q in qs:
                r = min(len(v) - 1, max(0, int(np.ceil(q * len(v))) - 1))
                row[f"q{int(round(q * 100))}"] = float(v[r])
            rows.append(row)
        cols = [group_col, *(f"q{int(round(q * 100))}" for q in qs)]
        if not rows:
            return pd.DataFrame({c: [] for c in cols})
        return pd.DataFrame(rows)[cols]

    from pdf_parser_ray.ops.shuffle import partitioned_map

    out = partitioned_map(
        ds.map_batches(bottom_k, batch_format="pandas"),
        [group_col],
        per_group,
        **({"n_parts": n_parts} if n_parts else {}),
    ).to_pandas()  # one row per group
    return out.sort_values(group_col).reset_index(drop=True)


def approx_pct_rank(
    ds: ray.data.Dataset,
    col: str,
    *,
    id_col: str,
    k: int = 1024,
    hash_fn: str = "md5",
) -> ray.data.Dataset:
    """Approximate percentile-rank normalization: every row scored by
    its value's rank within a KMV bottom-k uniform sample of the SAME
    column — the scale route to percent_rank().  An exact global
    percent_rank needs a total-order sort of the corpus; the sample CDF
    costs one streaming pass + a k-float broadcast and is within
    O(1/√k) of it.

    ``pct = searchsorted_right(sample, v) / |sample|`` — with
    ``hash_fn="md5"`` the sample is SQL-rederivable, so even the
    APPROXIMATION is value-checked by the oracle (both engines count
    sample values <= v over the identical sample; the ratio divides the
    same two ints — bit-identical).

    Output: (id_col, col, pct:float64).
    """
    hasher = _hash_strings_md5 if hash_fn == "md5" else _hash_strings

    def bottom_k(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[col].dropna()
        basis = df.loc[vals.index, id_col]
        h = hasher(basis.tolist())
        if len(h) > k:
            idx = np.argpartition(h, k)[:k]
        else:
            idx = np.arange(len(h))
        return pd.DataFrame(
            {"h": h[idx].astype("uint64"),
             "v": vals.to_numpy(dtype=np.float64)[idx]}
        )

    import ray

    sample = (
        ds.map_batches(bottom_k, batch_format="pandas")
        .sort("h")
        .limit(k)
        .to_pandas()  # ≤ k rows by construction
    )
    sv = np.sort(sample["v"].to_numpy())
    sref = ray.put(sv)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        s = worker_state(("pctrank_sample", sref.hex()), lambda: ray.get(sref))
        v = df[col].to_numpy(dtype=np.float64)
        pct = np.searchsorted(s, v, side="right").astype(np.float64) / len(s)
        return pd.DataFrame({id_col: df[id_col], col: df[col], "pct": pct})

    return ds.select_columns([id_col, col]).map_batches(
        score, batch_format="pandas"
    )


def vocab_overlap(
    ds: ray.data.Dataset,
    *,
    source_col: str = "source",
    text_col: str = "text",
    k: int = 256,
) -> pd.DataFrame:
    """Estimated vocabulary Jaccard between every pair of sources via
    KMV (bottom-k) sketches — the set-INTERSECTION estimator the
    distinct-count sketches (HLL/KMV) don't give you: J(A,B) ≈
    |{h ∈ bottom-k(A∪B) : h ∈ A's sketch ∧ h ∈ B's sketch}| / k.

    Scale plan: one streaming pass; each batch emits its per-source
    DISTINCT-token bottom-k (md5-prefix 64-bit hashes — SQL-
    rederivable), so the driver merge sees ≤ batches × sources × k
    hash rows and every pairwise estimate runs over k-sized arrays.
    No token ever shuffles; 10^12 docs cost exactly the scan.

    The estimate is itself value-checked: jaccard_est is a ratio of
    the two integers (n_common, k_eff) the DuckDB twin re-derives
    exactly from the same md5 bottom-k rule.

    Output: (source_a, source_b, n_common:int64, k_eff:int64,
    jaccard_est:float64), one row per unordered source pair, sorted.
    """
    import re as _re

    word_re = _re.compile(r"\S+")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows_s, rows_h = [], []
        for src, grp in df.groupby(source_col):
            toks = set()
            for t in grp[text_col]:
                toks.update(word_re.findall((t or "").lower()))
            if not toks:
                continue
            hs = np.unique(_hash_strings_md5(sorted(toks)))[:k]
            rows_s.extend([src] * len(hs))
            rows_h.append(hs)
        return pd.DataFrame(
            {
                source_col: pd.Series(rows_s, dtype="object"),
                "h": np.concatenate(rows_h)
                if rows_h
                else np.array([], dtype=np.uint64),
            }
        )

    parts = ds.select_columns([source_col, text_col]).map_batches(
        partial, batch_format="pandas"
    ).to_pandas()  # ≤ batches × sources × k rows — sketch-bounded

    sketches: dict[str, np.ndarray] = {}
    for src, grp in parts.groupby(source_col):
        hs = np.unique(grp["h"].to_numpy(dtype=np.uint64))
        sketches[src] = hs[:k]

    names = sorted(sketches)
    out = {"source_a": [], "source_b": [], "n_common": [], "k_eff": [],
           "jaccard_est": []}
    for i, a in enumerate(names):
        sa = sketches[a]
        set_a = set(sa.tolist())
        for b in names[i + 1:]:
            sb = sketches[b]
            union_k = np.unique(np.concatenate([sa, sb]))[:k]
            set_b = set(sb.tolist())
            common = sum(
                1 for h in union_k.tolist() if h in set_a and h in set_b
            )
            out["source_a"].append(a)
            out["source_b"].append(b)
            out["n_common"].append(common)
            out["k_eff"].append(len(union_k))
            out["jaccard_est"].append(common / len(union_k))
    res = pd.DataFrame(out)
    res["n_common"] = res["n_common"].astype("int64")
    res["k_eff"] = res["k_eff"].astype("int64")
    return res


def log_bucket_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    col: str,
    qs: list[float],
) -> pd.DataFrame:
    """DDSketch-style relative-error quantiles from a log2 bucket
    histogram — the mergeable streaming-quantile sketch with a
    RELATIVE accuracy guarantee (estimate within ±33% of the true
    value at any quantile, any distribution; fixed-width histograms
    lose the tail, KMV samples lose determinism at scale).

    The sketch is ``bucket = floor(log2(cents))`` per positive value —
    computed EXACTLY via the float64 exponent field (np.frexp), never a
    transcendental, so the DuckDB twin (``length(bin(cents)) - 1``) is
    value-identical bit for bit.  Per-batch (group, bucket) partials
    bound the reduce at |groups| × ~40 rows regardless of input size;
    merge is elementwise count addition (the mergeability that makes
    this the cross-shard quantile of choice at 100 TB).  The quantile
    estimate walks the cumulative histogram to nearest-rank
    ``ceil(q·n)`` and reports the bucket's geometric-range midpoint
    ``1.5·2^b`` cents — exact integer-derived floats on both engines.

    Returns a driver-sized frame:
    (group_col, n:int64, q50:float64, ... one column per quantile).
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df[col].to_numpy(dtype=np.float64) * 100.0).astype(
            "int64"
        )
        keep = cents > 0
        # frexp: cents = m * 2^e with 0.5 <= m < 1, exact for < 2^53,
        # so floor(log2(cents)) = e - 1 with no transcendental error.
        _, exp = np.frexp(cents[keep].astype(np.float64))
        g = (
            pd.DataFrame(
                {
                    group_col: df.loc[keep, group_col].to_numpy(),
                    "bucket": (exp - 1).astype("int64"),
                }
            )
            .groupby([group_col, "bucket"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return g.astype({"n": "int64"})

    hist = (
        ds.select_columns([group_col, col])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()  # bounded: |groups| x ~40 buckets x batches
        .groupby([group_col, "bucket"], as_index=False)["n"]
        .sum()
        .sort_values([group_col, "bucket"])
    )
    rows = []
    for key, grp in hist.groupby(group_col, sort=True):
        counts = grp["n"].to_numpy(dtype=np.int64)
        buckets = grp["bucket"].to_numpy(dtype=np.int64)
        cum = counts.cumsum()
        n = int(cum[-1])
        row = {group_col: key, "n": np.int64(n)}
        for q in qs:
            rank = int(np.ceil(q * n))
            b = int(buckets[np.searchsorted(cum, max(rank, 1))])
            # geometric-range midpoint of [2^b, 2^(b+1)) back in units
            row[f"q{int(round(q * 100))}_est"] = 3.0 * float(2**b) / 200.0
        rows.append(row)
    out = pd.DataFrame(rows)
    return out.reset_index(drop=True)


def cms_counts(
    ds: ray.data.Dataset,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> ray.data.Dataset:
    """Count-min sketch frequency estimates (Cormode & Muthukrishnan
    2005) — the fixed-memory answer to "how often does each key occur"
    when the key space is too large for an exact count table.  The
    sketch is a depth×width int64 counter matrix; estimate(k) =
    min_d M[d, h_d(k)] ≥ true count (one-sided overcount only).

    Build: per-batch partials emit nonzero (d, bucket, n) triples →
    ONE bounded groupby at depth×width cardinality (never O(rows) or
    O(keys)); the merged matrix (32 KB at 4×1024) is broadcast once.
    Probe: per-key exact counts come from the usual partial-count +
    grouped_sum co-location, then estimates attach row-locally — so
    the output doubles as an accuracy audit (``overcount`` column).

    Hash h_d(k) = ``int(md5(f"{d}:{k}")[:8], 16) % width`` — DuckDB
    ``('0x' || substr(md5(d || ':' || k::VARCHAR), 1, 8))::BIGINT %
    width``, the register-exact oracle trick; everything stays int64,
    so the driver hash check needs no rounding contract at all.

    Output: (key_col, est:int64, exact:int64, overcount:int64), one
    row per distinct key.
    """
    import hashlib

    import ray

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum
    from pdf_parser_ray.stages import worker_state

    def _buckets(keys: "pd.Series") -> "np.ndarray":
        """(len(keys), depth) int64 bucket matrix via a worker cache.

        factorize + one row-gather: the md5 loop runs over the batch's
        UNIQUE keys only (worker-cached across batches); per-row work is
        a single C-speed ``mat[codes]`` (the per-row list comprehension
        it replaces cost ~2 s of the 6.6 s sf0.1 bench time)."""
        cache = worker_state(("cms_md5", depth, width), dict)
        codes, uniques = pd.factorize(keys, sort=False)
        for k in uniques:
            if k not in cache:
                cache[k] = tuple(
                    int(
                        hashlib.md5(f"{d}:{k}".encode("utf-8")).hexdigest()[:8],
                        16,
                    )
                    % width
                    for d in range(depth)
                )
        if not len(uniques):
            return np.empty((0, depth), dtype=np.int64)
        mat = np.array([cache[k] for k in uniques], dtype=np.int64)
        return mat[codes]

    keyed = ds.select_columns([key_col])

    def sketch_partial(df: pd.DataFrame):
        if not len(df):
            return arrow_out(
                pd.DataFrame(
                    {"d": pd.Series([], dtype="int64"),
                     "bucket": pd.Series([], dtype="int64"),
                     "n": pd.Series([], dtype="int64")}
                )
            )
        b = _buckets(df[key_col])
        frames = []
        for d in range(depth):
            cnt = np.bincount(b[:, d], minlength=width)
            nz = np.flatnonzero(cnt)
            frames.append(
                pd.DataFrame(
                    {"d": np.int64(d), "bucket": nz, "n": cnt[nz]}
                )
            )
        out = pd.concat(frames, ignore_index=True)
        return arrow_out(out.astype({"bucket": "int64", "n": "int64"}))

    merged = grouped_sum(
        keyed.map_batches(sketch_partial, batch_format="pandas"),
        ["d", "bucket"],
        ["n"],
    ).to_pandas()  # bounded: ≤ depth × width rows
    M = np.zeros((depth, width), dtype=np.int64)
    M[merged["d"].to_numpy(dtype=np.int64),
      merged["bucket"].to_numpy(dtype=np.int64)] = merged["n"].to_numpy(
        dtype=np.int64
    )
    m_ref = ray.put(M)

    def count_partial(df: pd.DataFrame):
        g = df.groupby(key_col, as_index=False).size()
        g = g.rename(columns={"size": "exact"})
        g["exact"] = g["exact"].astype("int64")
        return arrow_out(g)

    exact = grouped_sum(
        keyed.map_batches(count_partial, batch_format="pandas"),
        [key_col],
        ["exact"],
    )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        m = worker_state(("cms_m", m_ref.hex()), lambda: ray.get(m_ref))
        if not len(df):
            return pd.DataFrame(
                {key_col: pd.Series([], dtype="int64"),
                 "est": pd.Series([], dtype="int64"),
                 "exact": pd.Series([], dtype="int64"),
                 "overcount": pd.Series([], dtype="int64")}
            )
        b = _buckets(df[key_col])
        est = np.min(
            np.stack([m[d, b[:, d]] for d in range(depth)], axis=1), axis=1
        ).astype("int64")
        exact_n = df["exact"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {key_col: df[key_col].to_numpy(),
             "est": est,
             "exact": exact_n,
             "overcount": est - exact_n}
        )

    return exact.map_batches(attach, batch_format="pandas")


def hll_overlap_pairs(
    ds: ray.data.Dataset, group_col: str, col: str, *, b: int = 12,
    hash_fn: str = "siphash",
) -> pd.DataFrame:
    """Pairwise distinct-value OVERLAP between groups via
    inclusion-exclusion on HLL sketches: |A∩B| ≈ est(A) + est(B) −
    est(A∪B), where the union sketch is the register-wise max — the
    audience-overlap readout (shared users between event types) that
    exact distinct-pair counting would pay a second shuffle for.

    Same scan as :func:`grouped_hll_distinct` (one (group, sketch) row
    per batch-group, O(groups × batches) fixed-size rows, raw values
    never shuffle); the driver merges per group and evaluates all
    group pairs on the merged registers.  Per-sketch estimates round
    to 4dp and the overlap is their exact float combination — the
    expression tree the md5-tier SQL twin shares.

    Output (eager, one row per unordered pair, type_a < type_b):
    (type_a, type_b, est_a, est_b, est_union, est_overlap:float64).
    """
    hasher = _hash_strings_md5 if hash_fn == "md5" else _hash_strings

    def sketch_batch(df: pd.DataFrame):
        groups, sketches = [], []
        for g, sub in df.groupby(group_col, sort=False):
            h = HLL(b)
            h.add_hashes(hasher(sub[col].dropna().tolist()))
            groups.append(g)
            sketches.append(h.registers.tobytes())
        from pdf_parser_ray.io_utils import arrow_out

        return arrow_out(pd.DataFrame({group_col: groups, "sketch": sketches}))

    parts = (
        ds.select_columns([group_col, col])
        .map_batches(sketch_batch, batch_format="pandas")
        .to_pandas()  # bounded: groups × batches fixed-size sketch rows
    )
    merged: dict = {}
    for g, sub in parts.groupby(group_col, sort=True):
        m = HLL(b)
        for sbytes in sub["sketch"]:
            m = m.merge(HLL(b, np.frombuffer(sbytes, dtype=np.uint8).copy()))
        merged[g] = m
    names = sorted(merged)
    rows = []
    for i, ga in enumerate(names):
        for gb in names[i + 1 :]:
            union = merged[ga].merge(merged[gb])
            ea = round(merged[ga].estimate(), 4)
            eb = round(merged[gb].estimate(), 4)
            eu = round(union.estimate(), 4)
            rows.append((ga, gb, ea, eb, eu, ea + eb - eu))
    return pd.DataFrame(
        rows,
        columns=[
            "type_a", "type_b", "est_a", "est_b", "est_union", "est_overlap",
        ],
    )


def misra_gries_heavy(
    ds: ray.data.Dataset,
    col: str,
    *,
    k: int = 64,
) -> pd.DataFrame:
    """Misra-Gries heavy hitters as a MERGEABLE summary (Misra & Gries
    1982; mergeability per Agarwal et al., PODS 2012) — the
    deterministic counterpart of the CMS route (`cms_top_users`):
    after merging, every item with true frequency > n/k is PRESENT and
    each kept counter lower-bounds the true count by at most n/k.

    Shape: per-batch ``value_counts`` reduced to ≤ k counters (subtract
    the (k+1)-th largest count, keep only positive); the driver merge
    sums the ≤ k·batches counter rows and prunes once more —
    O(batches × k) rows ever leave the scan, raw values never shuffle.
    Each batch also reports its stream length on its rows (recovered
    once per batch id), so the error bound n/k is exact.

    Output (eager, ≤ k rows): (item:string, est:int64 — surviving
    counter, a lower bound on the true count; n:int64 — total stream
    length; err_bound:int64 = floor(n/k)); est DESC, item ASC.
    """
    import uuid

    from pdf_parser_ray.io_utils import arrow_out

    def summarize(df: pd.DataFrame):
        vc = df[col].dropna().astype(str).value_counts()
        n = int(vc.sum())
        if len(vc) > k:
            sub = int(vc.iloc[k])  # (k+1)-th largest
            vc = vc.iloc[:k] - sub
            vc = vc[vc > 0]
        out = vc.rename_axis("item").reset_index(name="c")
        if not len(out) and n:
            # the prune can empty the whole summary (e.g. an all-distinct
            # batch: every count 1, sub 1) — n rides on kept rows, so an
            # empty summary would silently drop this batch's stream
            # length and understate the freq > n/k guarantee.  Emit a
            # null-item sentinel carrying n; the driver merge's
            # groupby("item") drops it from the counters.
            # dtype "string": an all-None object column would reach
            # Arrow as null-typed and clash with string blocks
            out = pd.DataFrame(
                {"item": pd.Series([None], dtype="string"), "c": [0]}
            )
        out["n"] = np.int64(n)
        out["batch"] = uuid.uuid4().hex
        return arrow_out(out.astype({"c": "int64"}))

    parts = (
        ds.select_columns([col])
        .map_batches(summarize, batch_format="pandas")
        .to_pandas()  # bounded: ≤ k rows per batch
    )
    if not len(parts):
        return pd.DataFrame(
            {
                "item": pd.Series([], dtype="object"),
                "est": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "err_bound": pd.Series([], dtype="int64"),
            }
        )
    n_total = int(parts.groupby("batch")["n"].first().sum())
    merged = parts.groupby("item", as_index=False)["c"].sum()
    if len(merged) > k:
        merged = merged.sort_values(["c", "item"], ascending=[False, True])
        sub = int(merged["c"].iloc[k])
        merged["c"] = merged["c"] - sub
        merged = merged[merged["c"] > 0]
    out = merged.sort_values(["c", "item"], ascending=[False, True])
    return pd.DataFrame(
        {
            "item": out["item"].to_numpy(),
            "est": out["c"].to_numpy(dtype="int64"),
            "n": np.full(len(out), n_total, dtype="int64"),
            "err_bound": np.full(len(out), n_total // k, dtype="int64"),
        }
    )


class KLLSketch:
    """KLL streaming quantile sketch (Karnin, Lambert & Liberty, FOCS
    2016): a ladder of weighted buffers — level h holds items of weight
    2^h; an over-full level sorts, keeps alternating items, and
    promotes them one level up (the compaction halves count, preserves
    total weight EXACTLY when the compacted count is even; an odd
    straggler stays behind).  Capacity at level h shrinks geometrically
    (c^(H-h)·k, c=2/3) so total space is O(k) while rank error stays
    ~O(1/k) of n.

    This implementation uses the DETERMINISTIC alternating-offset coin
    (a per-level flip-flop) instead of a random bit: reproducible
    across reruns of the same batch stream, same practical accuracy —
    the randomized guarantee's constants no longer apply verbatim,
    which is why the repo pins accuracy empirically in tests instead
    of citing the paper bound.

    Weight conservation is an invariant: Σ_h 2^h·|level_h| == n.
    """

    C = 2.0 / 3.0

    def __init__(self, k: int = 200):
        self.k = k
        self.levels: list[list[float]] = [[]]
        self.n = 0
        self._coin = 0

    def _capacity(self, h: int) -> int:
        depth = len(self.levels) - h - 1
        return max(2, int(np.ceil(self.k * (self.C**depth))))

    def update_many(self, values: np.ndarray) -> None:
        self.levels[0].extend(float(v) for v in values)
        self.n += len(values)
        self._compress()

    def _total(self) -> int:
        return sum(len(lv) for lv in self.levels)

    def _compress(self) -> None:
        while self._total() > sum(
            self._capacity(h) for h in range(len(self.levels))
        ):
            for h, lv in enumerate(self.levels):
                if len(lv) > self._capacity(h):
                    self._compact(h)
                    break
            else:
                break

    def _compact(self, h: int) -> None:
        lv = sorted(self.levels[h])
        if len(lv) % 2 == 1:
            # odd straggler keeps its weight at this level
            keep_back = [lv.pop(-1 if self._coin else 0)]
        else:
            keep_back = []
        self._coin ^= 1
        promoted = lv[self._coin % 2 :: 2]
        # re-flip so successive compactions alternate offsets
        if h + 1 == len(self.levels):
            self.levels.append([])
        self.levels[h] = keep_back
        self.levels[h + 1].extend(promoted)

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        out = KLLSketch(self.k)
        out.n = self.n + other.n
        H = max(len(self.levels), len(other.levels))
        out.levels = [[] for _ in range(H)]
        for src in (self, other):
            for h, lv in enumerate(src.levels):
                out.levels[h].extend(lv)
        out._compress()
        return out

    def quantile(self, q: float) -> float:
        items: list = []
        for h, lv in enumerate(self.levels):
            w = 1 << h
            items.extend((v, w) for v in lv)
        if not items:
            return float("nan")
        items.sort()
        target = q * self.n
        acc = 0
        for v, w in items:
            acc += w
            if acc >= target:
                return v
        return items[-1][0]


def kll_quantiles(
    ds: ray.data.Dataset,
    col: str,
    quantiles: "tuple[float, ...]" = (0.5, 0.9, 0.99),
    *,
    k: int = 200,
) -> pd.DataFrame:
    """Distributed quantiles via mergeable KLL sketches: one sketch per
    batch (vectorized append + ladder compaction), driver merge of the
    O(k)-sized partials — raw values never shuffle, memory is O(k)
    per worker regardless of n.  The modern successor of the KMV
    bottom-k route (`approx_quantiles`) with uniform rank error
    instead of sample-rank error.

    Output (eager, one row per quantile): (q:float64, value:float64,
    n:int64)."""
    sketches = (
        ds.select_columns([col])
        .map_batches(
            lambda df: pd.DataFrame(
                {
                    "blob": [
                        _kll_serialize(
                            _kll_from_values(
                                df[col].dropna().to_numpy(dtype=np.float64), k
                            )
                        )
                    ]
                }
            ),
            batch_format="pandas",
        )
        .to_pandas()  # bounded: one O(k) blob per batch
    )
    merged = KLLSketch(k)
    for blob in sketches["blob"]:
        merged = merged.merge(_kll_deserialize(blob, k))
    return pd.DataFrame(
        {
            "q": pd.Series(list(quantiles), dtype="float64"),
            "value": [merged.quantile(q) for q in quantiles],
            "n": pd.Series([merged.n] * len(quantiles), dtype="int64"),
        }
    )


def _kll_from_values(values: np.ndarray, k: int) -> KLLSketch:
    s = KLLSketch(k)
    s.update_many(values)
    return s


def _kll_serialize(s: KLLSketch) -> bytes:
    import pickle

    return pickle.dumps((s.n, s.levels))


def _kll_deserialize(blob: bytes, k: int) -> KLLSketch:
    import pickle

    n, levels = pickle.loads(blob)
    s = KLLSketch(k)
    s.n = n
    s.levels = [list(lv) for lv in levels]
    return s
