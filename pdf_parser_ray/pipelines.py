"""Corpus-level extraction pipelines (Dataset-in → Dataset-out, lazy).

These functions never call ``ray.init`` and never materialize the corpus:
they compose lazy Dataset transforms and hand the stream back to the
caller (who consumes via ``write_parquet`` / ``iter_batches`` / an
aggregate).  See :mod:`pdf_parser_ray.checkpoint` for the resumable,
partition-manifested job runner.
"""

from __future__ import annotations

from typing import Any

import ray.data

from pdf_parser_ray.stages import (
    DOC_BATCH_SIZE,
    OVERSIZE_THRESHOLD,
    ExtractDocuments,
    payload_size_mask,
)

CORPUS_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_corpus(
    path: str | list[str],
    num_blocks: int | None = None,
    lang: str | None = None,
    **kwargs: Any,
) -> ray.data.Dataset:
    """Read a CC-style corpus with column pruning at the read.

    ``lang`` pushes a row filter INTO the parquet read (pyarrow dataset
    expression → row-group pruning + per-batch filtering before rows
    ever enter the object store) — the "prune at the read" rule: a
    language-sliced job over a 100 TB corpus should never materialize
    the other languages.

    ``num_blocks`` applies an EXPLICIT post-read ``repartition`` (no
    shuffle — block split/coalesce only): use it when the input file
    layout is skewed (a few giant parquet files would otherwise bound
    parallelism at the file count).  Leave None when files ≫ CPUs — the
    read's own block splitting is then sufficient.
    """
    if lang is not None:
        import pyarrow.compute as pc

        kwargs.setdefault("filter", pc.field("lang") == lang)
    ds = ray.data.read_parquet(path, columns=CORPUS_COLUMNS, **kwargs)
    if num_blocks:
        ds = ds.repartition(num_blocks)
    return ds


def extract_corpus(
    ds: ray.data.Dataset,
    *,
    exec_mode: str = "tasks",
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = DOC_BATCH_SIZE,
    include_spans: bool = True,
    split_oversized: bool = True,
    oversize_threshold: int = OVERSIZE_THRESHOLD,
    oversize_concurrency: int | tuple[int, int] = (1, 4),
) -> ray.data.Dataset:
    """The flagship: corpus Dataset → extraction Dataset.

    Execution modes for the main (small-payload) branch:

    * ``"tasks"`` (default) — stateless ``map_batches`` tasks with a
      worker-process-global CMap cache.  Ray reuses worker processes, so
      the cache amortizes exactly like actor state, while tasks schedule
      elastically with zero pool-creation cost per execution (measured
      locally: ~30k docs/s vs ~16k docs/s for the actor pool at 32 CPUs
      on short jobs; on multi-hour cluster jobs the gap vanishes).
    * ``"actors"`` — the classic stateful actor pool
      (:class:`ExtractDocuments`); prefer it when the stage grows
      heavyweight state (models, font blobs) whose lifecycle must be
      tied to actors, or when per-stage resource isolation matters.

    Skew handling (SURVEY.md §4): payloads above ``oversize_threshold``
    route to a DEDICATED pool with ``batch_size=1`` so one multi-MB
    document never stalls a batch of small ones; branches are unioned
    (task pool under ``exec_mode="tasks"``, actor pool under
    ``"actors"``).  The split costs a second (cheap, column-pruned)
    pass over the input — disable with ``split_oversized=False`` for
    known-uniform corpora.  NOTE: under Ray's default per-operator
    resource reservation the union plan runs ~60 % slower than the
    single-branch plan because the allocator holds slots for the mostly
    idle oversized branch; session owners should set
    ``DataContext.op_resource_reservation_enabled = False`` for this
    plan shape (measured 16.7 s → 10.2 s at sf0.1×8 / 32 CPUs; see
    bench.py).

    ``concurrency=None``: tasks mode lets the streaming executor elastically
    size the pool; actors mode defaults to an autoscaling ``(1, CPUs)``.
    """
    if concurrency is None and exec_mode == "actors":
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = (1, max(1, ncpu))

    def main_branch(sub: ray.data.Dataset) -> ray.data.Dataset:
        if exec_mode == "tasks":
            from pdf_parser_ray.stages import extract_batch_task

            return sub.map_batches(
                extract_batch_task,
                fn_kwargs={"include_spans": include_spans},
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=concurrency,
            )
        return sub.map_batches(
            ExtractDocuments,
            fn_constructor_kwargs={"include_spans": include_spans},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    if not split_oversized:
        return main_branch(ds)

    small = main_branch(
        ds.map_batches(
            payload_size_mask,
            fn_kwargs={"threshold": oversize_threshold, "keep_small": True},
            batch_format="pyarrow",
        )
    )
    big_masked = ds.map_batches(
        payload_size_mask,
        fn_kwargs={"threshold": oversize_threshold, "keep_small": False},
        batch_format="pyarrow",
    )
    if exec_mode == "tasks":
        # Dedicated task stage, batch_size=1: same isolation (one
        # oversized doc per task) without reserving idle actors — the
        # mask fuses into the task, so blocks with no oversized rows
        # cost one cheap pyarrow filter.  Measured at sf0.1×8/32 CPUs:
        # actor-pool big branch 16.5 s headline → task big branch
        # ~12 s (the pool ramp + min-actor reservation was starving
        # the main branch).
        from pdf_parser_ray.stages import extract_batch_task

        big = big_masked.map_batches(
            extract_batch_task,
            fn_kwargs={"include_spans": include_spans},
            batch_format="pyarrow",
            batch_size=1,
        )
    else:
        big = big_masked.map_batches(
            ExtractDocuments,
            fn_constructor_kwargs={"include_spans": include_spans},
            batch_format="pyarrow",
            batch_size=1,  # one oversized doc per actor call
            concurrency=oversize_concurrency,
        )
    return small.union(big)


def dedup_rare(
    ds: ray.data.Dataset,
    key_col: str,
    *,
    order_col: str | None = None,
    assume_rare_dups: bool = True,
    n_parts: int | None = None,
    materialize: bool = True,
) -> ray.data.Dataset:
    """Exact dedup on ``key_col`` — one surviving row per key — tuned
    for corpora where duplicated keys are RARE.

    Default route (``assume_rare_dups=True``): a column-pruned count
    pass (key only — multi-MB payload columns never enter this shuffle)
    finds the DUPLICATED keys; that bounded set is broadcast, rows with
    unique keys stream through untouched (zero shuffle for the vast
    majority), and only the duplicated minority takes the full-row
    ``groupby(key)`` shuffle.  Assumption: duplicated keys are a small
    fraction of the corpus (the broadcast set must fit workers); for
    high-duplication corpora pass ``assume_rare_dups=False`` to take
    the single full-row hash-partition shuffle instead.

    Winner per key: first row seen when ``order_col`` is None (the
    reference's keep-first rule — nondeterministic between equals under
    parallel block order), else the row with the MIN ``order_col``
    (deterministic; use the id column for rerun-stable output).

    ``materialize=False`` (VERDICT r3 #8) skips pinning the input in
    the object store: the rare-dups route consumes its input three
    times (count pass + both branches), so the default materialize
    trades object-store spill for avoiding 3× lineage recompute —
    callers whose upstream is already checkpointed parquet should pass
    False and let the (cheap, pruned) re-reads stream.
    """
    import pandas as pd
    import ray as _ray

    from pdf_parser_ray.ops.shuffle import partitioned_map

    def winners(part: pd.DataFrame) -> pd.DataFrame:
        # Vectorized across keys: sort + drop_duplicates (C speed) —
        # key cardinality is corpus-scale, so no Python call per key.
        if order_col is not None:
            part = part.sort_values(order_col)
        return part.drop_duplicates(key_col, keep="first")

    _np = {"n_parts": n_parts} if n_parts else {}
    if not assume_rare_dups:
        return partitioned_map(ds, [key_col], winners, **_np)

    import pyarrow as pa
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    # Three consumers follow (count pass + both branches): materialize
    # once so an expensive upstream lineage (extraction, fingerprinting)
    # runs ONCE and the consumers read cached blocks — the object store
    # spills oversized corpora to disk, which is far cheaper than three
    # full recomputes.  Same pattern as connected_components' edge input.
    # materialize=False: the caller's upstream is checkpointed — let
    # each consumer re-read and stream.
    if materialize:
        ds = ds.materialize()

    def partial_counts(t: pa.Table) -> pa.Table:
        g = t.group_by(key_col).aggregate([(key_col, "count")])
        return g.rename_columns([key_col, "n"])

    counts = (
        ds.select_columns([key_col])
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("n", alias_name="n"))
    )
    dup_rows = counts.map_batches(
        lambda t: t.filter(pc.greater(t.column("n"), 1)).select([key_col]),
        batch_format="pyarrow",
    ).take_all()  # bounded: only keys that actually repeat
    if not dup_rows:
        # no key repeats: every row streams through untouched — and an
        # empty pa.array would be null-typed, breaking is_in anyway.
        return ds
    # broadcast once; tasks fetch zero-copy from local plasma per node
    dup_ref = _ray.put(pa.array(sorted(r[key_col] for r in dup_rows)))

    def keep_unique(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.invert(
                pc.fill_null(pc.is_in(t.column(key_col), _ray.get(dup_ref)), False)
            )
        )

    def keep_duplicated(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.fill_null(pc.is_in(t.column(key_col), _ray.get(dup_ref)), False)
        )

    unique_branch = ds.map_batches(keep_unique, batch_format="pyarrow")
    dup_branch = partitioned_map(
        ds.map_batches(keep_duplicated, batch_format="pyarrow"),
        [key_col],
        winners,
        **_np,
    )
    return unique_branch.union(dup_branch)


def dedup_urls(
    ds: ray.data.Dataset, *, assume_rare_dups: bool = True
) -> ray.data.Dataset:
    """Exact per-url dedup (SURVEY.md §2.7 D5): one surviving row per
    url.  Thin wrapper over :func:`dedup_rare` (keep-first winner)."""
    return dedup_rare(ds, "url", assume_rare_dups=assume_rare_dups)


def export_training_data(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    min_tokens: int = 5,
    max_dup_frac: float = 0.6,
    boundaries: tuple[tuple[str, str], ...] = (("train", "d0"), ("val", "e8")),
    last: str = "test",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, int]:
    """End-to-end training-data export: quality gate → exact near-layout
    dedup → split assignment → hive-partitioned parquet, streaming
    throughout.

    Stages (each a lazy transform; no full materialization):

    1. row-local gate: ≥ ``min_tokens`` whitespace tokens AND
       duplicate-word fraction ≤ ``max_dup_frac`` (the Gopher-style
       repetition rule from :mod:`ops.webtext`);
    2. row-local fingerprint: md5 of whitespace/case-normalized text
       (layout-invariant dedup key, same rule as
       :func:`ops.text_stats.fingerprint_batch`);
    3. exact dedup via :func:`dedup_rare` on the fingerprint with a
       deterministic min-``id_col`` winner — unique fingerprints never
       shuffle;
    4. :func:`ops.curation.assign_splits` (md5 hash gate);
    5. ``write_parquet(out_dir, partition_cols=["split"])`` — one
       directory per split, so downstream trainers read their split
       with zero filtering and a failed export is re-runnable per
       split directory.

    Returns rows-per-split counts read back from the written output
    (parquet metadata count — no data scan).
    """
    import pandas as pd

    from pdf_parser_ray.ops.curation import assign_splits
    from pdf_parser_ray.ops.text_stats import TOKEN_PAT, layout_fingerprint

    def gate_and_fp(df: pd.DataFrame) -> pd.DataFrame:
        text = df[text_col].fillna("")
        n_tokens = text.str.count(TOKEN_PAT).astype("int64")
        words = text.str.split(" ")
        n_words = words.str.len().astype("int64")
        # vectorized distinct count: one explode + grouped nunique
        ex = words.explode()
        n_distinct = (
            ex.groupby(level=0).nunique().reindex(df.index, fill_value=0)
        ).astype("int64")
        dup_frac = 1.0 - n_distinct / n_words.where(n_words > 0, 1)
        keep = (n_tokens >= min_tokens) & (dup_frac <= max_dup_frac)
        out = df[keep].copy()
        out["fp"] = layout_fingerprint(out[text_col])
        return out

    gated = ds.map_batches(gate_and_fp, batch_format="pandas")
    deduped = dedup_rare(gated, "fp", order_col=id_col)
    tagged = assign_splits(deduped, boundaries, last=last, id_col=id_col)
    tagged.drop_columns(["fp"]).write_parquet(out_dir, partition_cols=["split"])

    import os as _os

    counts: dict[str, int] = {}
    for name in sorted({n for n, _ in boundaries} | {last}):
        part = _os.path.join(out_dir, f"split={name}")
        if _os.path.isdir(part):
            counts[name] = ray.data.read_parquet(part, columns=[id_col]).count()
        else:
            counts[name] = 0
    return counts


def status_counts(ds: ray.data.Dataset):
    """Small corpus-stats groupby: rows per status (metrics surface)."""
    from ray.data.aggregate import Count

    return ds.groupby("status").aggregate(Count(alias_name="n"))


def _fp_to_int64(fps) -> "object":
    """First 8 md5-hex bytes as int64 (the Bloom key space)."""
    import numpy as np

    return np.fromiter(
        (int.from_bytes(bytes.fromhex(f[:16]), "big", signed=True) for f in fps),
        dtype=np.int64,
        count=len(fps),
    )


def _bloom_bytes(n_items: int, fp_rate: float) -> int:
    """Byte size of BloomFilter(n_items, fp_rate).bits WITHOUT
    allocating it (the route probe must not malloc a 10^9-key array)."""
    import math

    n_items = max(1, n_items)
    m = int(math.ceil(-n_items * math.log(fp_rate) / (math.log(2) ** 2)))
    return (max(64, m) + 7) // 8


def incremental_dedup(
    new_ds: ray.data.Dataset,
    index_dir: str,
    *,
    fp_rate: float = 0.001,
    text_col: str = "text",
    id_col: str = "doc_id",
    positives_limit: int = 5_000_000,
    bloom_mode: str = "auto",
    driver_filter_bytes: int = 256 << 20,
    shard_filter_bytes: int = 64 << 20,
    n_parts: int | None = None,
    materialize: bool = True,
) -> ray.data.Dataset:
    """Incremental-ingestion dedup: keep only the rows of ``new_ds``
    whose (layout-normalized md5) fingerprint is NOT in the persisted
    fingerprint index at ``index_dir`` — the "append a new crawl
    segment to an existing corpus" shape.

    Scale design — the new stream never joins the (corpus-sized) index.
    Two Bloom routes (``bloom_mode``: "auto" | "driver" | "sharded"):

    * **driver** — the filter fits the driver (≤ ``driver_filter_bytes``
      at the sized capacity): each index batch sets bits into its own
      same-shaped filter (same (m, k) — they derive from the index row
      count, fixed up front) and emits just the bit array; the driver
      ORs the per-batch arrays (mergeable-sketch pattern) and
      broadcasts the merged filter once.
    * **sharded** (VERDICT r3 #3 — 10^9+ key indexes, where one bit
      array is gigabytes): the filter is sharded by key hash.  Index
      KEYS (8 B each) and the new stream's keys co-partition by
      ``shard = key % n_shards``; each partition builds its shards'
      filters locally from the raw keys and probes its new-stream keys
      in place.  NO bit array ever lands on the driver or rides a
      message — per-shard filters (≤ ``shard_filter_bytes``) exist
      only partition-locally; the shuffle moves keys, the driver only
      ever holds the (``positives_limit``-bounded) positive fp set.

    Both routes continue identically — and produce identical survivors
    (parity-tested), since the confirm pass removes exactly the false
    positives either filter admits:

    2. The new stream is fingerprinted row-locally and intra-batch
       deduped (:func:`dedup_rare`, min-``id_col`` winner).
    3. Bloom NEGATIVES are definitely-new: they stream through with
       zero further work (the common case for a fresh crawl segment).
    4. Bloom POSITIVES (true overlap + ~``fp_rate`` false positives —
       bounded by ``positives_limit``) broadcast their fp set; one
       column-pruned scan of the index confirms which actually exist;
       the confirmed-seen set broadcasts back and drops its rows.

    Returns the surviving rows WITH their ``fp`` column, so the caller
    can append `(fp)` to the index for the next increment.

    ``materialize=False`` (VERDICT r3 #8) streams the fingerprinted
    new-segment lineage on every consumer instead of pinning it — for
    callers whose ``new_ds`` is already checkpointed parquet.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray as _ray

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.relational import BloomFilter
    from pdf_parser_ray.ops.text_stats import layout_fingerprint
    from pdf_parser_ray.stages import worker_state

    if bloom_mode not in ("auto", "driver", "sharded"):
        raise ValueError(
            f"bloom_mode must be auto|driver|sharded, got {bloom_mode!r}"
        )

    index = ray.data.read_parquet(index_dir, columns=["fp"])
    n_index = max(1, index.count())
    filter_bytes = _bloom_bytes(n_index, fp_rate)
    if bloom_mode == "auto":
        bloom_mode = (
            "driver" if filter_bytes <= driver_filter_bytes else "sharded"
        )

    def add_fp(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["fp"] = layout_fingerprint(out[text_col])
        return out

    fresh = dedup_rare(
        new_ds.map_batches(add_fp, batch_format="pandas"), "fp",
        order_col=id_col, materialize=materialize,
    )
    if materialize:
        # consumed by BOTH the negative and positive splits
        fresh = fresh.materialize()

    if bloom_mode == "driver":
        def batch_bits(t: pa.Table) -> pa.Table:
            bf = BloomFilter(n_index, fp_rate)
            bf.add_many(_fp_to_int64(t.column("fp").to_pylist()))
            return pa.table(
                {"bits": pa.array([bf.bits.tobytes()], pa.binary())}
            )

        merged = BloomFilter(n_index, fp_rate)
        for row in index.map_batches(
            batch_bits, batch_format="pyarrow"
        ).take_all():
            merged.bits |= np.frombuffer(row["bits"], dtype=np.uint8)
        bf_ref = _ray.put(merged)

        def split(df: pd.DataFrame, keep_positive: bool):
            bf: BloomFilter = worker_state(
                ("incr_bloom", bf_ref.hex()), lambda: _ray.get(bf_ref)
            )
            out = df
            if len(df):
                mask = bf.contains_many(_fp_to_int64(df["fp"].tolist()))
                out = df[mask] if keep_positive else df[~mask]
            # Arrow out: size-0 pandas object columns trip Ray's block
            # size estimator (log noise); Arrow empties are typed+quiet.
            return pa.Table.from_pandas(out, preserve_index=False)

        negatives = fresh.map_batches(
            split, fn_kwargs={"keep_positive": False}, batch_format="pandas"
        )
        positives = fresh.map_batches(
            split, fn_kwargs={"keep_positive": True}, batch_format="pandas"
        ).materialize()  # consumed twice: fp-set collect + final filter
        pos_rows = positives.select_columns(["fp"]).take_all()
        pos_fps = sorted({r["fp"] for r in pos_rows})
        n_pos = len(pos_rows)
    else:
        # ---------------------------------------------- sharded route
        from pdf_parser_ray.ops.shuffle import partitioned_map

        n_shards = max(
            2, -(-filter_bytes // max(1, shard_filter_bytes))  # ceil div
        )
        shard_items = -(-n_index // n_shards)

        def shard_of(k: "np.ndarray") -> "np.ndarray":
            return (k.view(np.uint64) % np.uint64(n_shards)).astype(np.int64)

        def index_keys(t: pa.Table) -> pa.Table:
            k = _fp_to_int64(t.column("fp").to_pylist())
            return arrow_out(pd.DataFrame({
                "shard": shard_of(k),
                "k": k,
                "fp": pd.Series([None] * len(k), dtype="object"),
                "kind": np.ones(len(k), dtype=np.int8),
            }))

        def fresh_keys(df: pd.DataFrame):
            k = _fp_to_int64(df["fp"].tolist())
            return arrow_out(pd.DataFrame({
                "shard": shard_of(k),
                "k": k,
                "fp": df["fp"].astype(object).to_numpy(),
                "kind": np.zeros(len(k), dtype=np.int8),
            }))

        stream = index.map_batches(index_keys, batch_format="pyarrow").union(
            fresh.select_columns(["fp"]).map_batches(
                fresh_keys, batch_format="pandas"
            )
        )

        def probe_partition(part: pd.DataFrame) -> pd.DataFrame:
            fps: list = []
            for _s, g in part.groupby("shard", sort=False):
                new = g[g["kind"] == 0]
                if not len(new):
                    continue
                bf = BloomFilter(shard_items, fp_rate)
                idx_k = g.loc[g["kind"] == 1, "k"].to_numpy(dtype=np.int64)
                if len(idx_k):
                    bf.add_many(idx_k)
                hit = bf.contains_many(new["k"].to_numpy(dtype=np.int64))
                fps.extend(new.loc[hit, "fp"])
            return pd.DataFrame({"fp": pd.Series(fps, dtype="object")})

        part_kw = {"n_parts": n_parts} if n_parts else {}
        pos_df = partitioned_map(
            stream, ["shard"], probe_partition, **part_kw
        ).to_pandas()  # bounded: positives only (limit-guarded below)
        pos_fps = (
            sorted(set(pos_df["fp"])) if "fp" in pos_df.columns else []
        )
        n_pos = len(pos_df)
        positives = None  # built below from the pos set

    if n_pos > positives_limit:
        raise ValueError(
            f"{n_pos} bloom-positive rows exceed positives_limit; "
            "shard the increment or dedup via a hash join on fp"
        )
    if not pos_fps:
        if bloom_mode == "driver":
            return negatives
        return fresh
    pos_set = pa.array(pos_fps, pa.string())

    if bloom_mode == "sharded":
        # split fresh by membership in the (bounded) positive fp set
        pos_ref = _ray.put(frozenset(pos_fps))

        def split_by_set(df: pd.DataFrame, keep_positive: bool):
            s: frozenset = worker_state(
                ("incr_pos", pos_ref.hex()), lambda: _ray.get(pos_ref)
            )
            m = df["fp"].isin(s)
            out = df[m] if keep_positive else df[~m]
            return pa.Table.from_pandas(out, preserve_index=False)

        negatives = fresh.map_batches(
            split_by_set, fn_kwargs={"keep_positive": False},
            batch_format="pandas",
        )
        positives = fresh.map_batches(
            split_by_set, fn_kwargs={"keep_positive": True},
            batch_format="pandas",
        )

    confirmed_rows = index.map_batches(
        lambda t, _s=pos_set: t.filter(
            pc.fill_null(pc.is_in(t.column("fp"), _s), False)
        ),
        batch_format="pyarrow",
    ).take_all()  # bounded by the positive set
    confirmed_ref = _ray.put(frozenset(r["fp"] for r in confirmed_rows))

    def drop_confirmed(df: pd.DataFrame) -> pd.DataFrame:
        seen: frozenset = worker_state(
            ("incr_confirmed", confirmed_ref.hex()),
            lambda: _ray.get(confirmed_ref),
        )
        return df[~df["fp"].isin(seen)]

    survivors = positives.map_batches(drop_confirmed, batch_format="pandas")
    return negatives.union(survivors)


def near_dedup_corpus(
    docs: "ray.data.Dataset",
    *,
    method: str = "minhash",
    threshold: float = 0.5,
    max_hamming: int = 3,
    hash_fn: str = "crc32",
    mode: str = "auto",
    broadcast_limit: int = 5_000_000,
) -> "ray.data.Dataset":
    """End-to-end near-duplicate scrub (the RefinedWeb/CCNet curation
    composition): candidate pairs → connected components → keep each
    cluster's canonical member (the min doc_id — the component label)
    plus every unpaired doc.

    ``mode="broadcast"`` (default): the drop set is the non-canonical
    cluster members only — collected once and broadcast into an anti
    join; the corpus itself never shuffles.  Right when near-dups are a
    modest fraction.  ``broadcast_limit`` guards the web-scale case
    (RefinedWeb measures 30–50 % near-duplicates in CC crawls — there
    the "bounded" drop set is corpus-order) with a ValueError directing
    to the join route.

    ``mode="join"`` (VERDICT r3 #2 — the scale path): the drop set
    stays a Dataset; docs LEFT-join the marked drops on doc_id and
    unmarked rows survive.  One co-location exchange of (doc_id,
    payload), no driver collection of any size.  Identical output
    (parity-tested).  A clean corpus (zero near-dup pairs) yields an
    empty, schema-less component table that Acero cannot join against
    — a ``limit(1)`` probe early-returns ``docs`` first (ADVICE r4).

    ``mode="auto"`` (default, VERDICT r4 #2): probe the drop set with
    a bounded ``limit(broadcast_limit + 1)`` collection — within the
    limit the probe already IS the broadcast set (nothing re-runs);
    beyond it fall through to the join route instead of raising.  The
    fall-through re-executes the candidate pipeline once (components
    materialize internally, so the re-run is label-table-sized, not
    corpus-sized).

    ``docs`` needs (doc_id:int64, text); returns the surviving rows
    with their original columns.
    """
    import numpy as np
    import pandas as pd

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.dedup import (
        connected_components,
        minhash_lsh_pairs,
        simhash_near_pairs,
    )
    from pdf_parser_ray.ops.relational import broadcast_semi_join, hash_join

    if mode not in ("auto", "broadcast", "join"):
        raise ValueError(f"mode must be auto|broadcast|join, got {mode!r}")
    if method == "minhash":
        pairs = minhash_lsh_pairs(docs, threshold=threshold, hash_fn=hash_fn)
    elif method == "simhash":
        pairs = simhash_near_pairs(
            docs, max_hamming=max_hamming, hash_fn=hash_fn
        )
    else:
        raise ValueError(f"unknown near-dedup method {method!r}")

    comp = connected_components(pairs.select_columns(["a", "b"]))
    non_canon = comp.map_batches(
        lambda df: df.loc[df["node"] != df["component"], ["node"]],
        batch_format="pandas",
    )

    if mode != "join":
        drops_df = non_canon.limit(broadcast_limit + 1).to_pandas()
        # empty filtered dataset → column-less frame, and a clean corpus
        # (zero near-dup pairs) is the common case — skip the gate.
        if "node" not in drops_df.columns or not len(drops_df):
            return docs
        if len(drops_df) <= broadcast_limit:
            drops = drops_df["node"].astype("int64").tolist()
            return broadcast_semi_join(docs, drops, on="doc_id", anti=True)
        if mode == "broadcast":
            raise ValueError(
                f"near-dup drop set exceeds broadcast_limit="
                f"{broadcast_limit}; use mode='join' for this corpus"
            )
        # mode == "auto": over-limit drop set → the join route (and the
        # probe just proved it non-empty, so skip the emptiness guard).
    elif not len(non_canon.limit(1).to_pandas()):
        # Explicit join mode on a clean corpus: the empty component
        # table is schema-less and Acero's hash join cannot plan
        # against it (ADVICE r4) — survivors are simply the input.
        return docs

    marked = non_canon.map_batches(
        lambda df: arrow_out(pd.DataFrame({
            "doc_id": df["node"].astype("int64"),
            "__drop": np.ones(len(df), dtype=np.int8)})),
        batch_format="pandas",
    )
    joined = hash_join(docs, marked, ["doc_id"], join_type="left_outer")
    return joined.map_batches(
        lambda df: df.loc[df["__drop"].isna()].drop(columns="__drop"),
        batch_format="pandas",
    )


def dup_aware_weights(
    docs: "ray.data.Dataset",
    *,
    method: str = "minhash",
    threshold: float = 0.5,
    max_hamming: int = 3,
    hash_fn: str = "crc32",
    mode: str = "auto",
    broadcast_limit: int = 5_000_000,
) -> "ray.data.Dataset":
    """Duplicate-aware sampling weights (the SlimPajama/soft-dedup
    alternative to dropping near-dups): every document gets its
    near-dup CLUSTER SIZE and the sampling weight ``1/cluster_size``,
    so a training run can downweight boilerplate cliques instead of
    deleting them.

    Same candidate machinery as :func:`near_dedup_corpus` (LSH pairs →
    connected components).  ``mode="broadcast"`` (default) collects the
    node→size table once and broadcasts it — the corpus never shuffles,
    the attach is row-local; ``broadcast_limit`` guards the web-scale
    case where near-dup nodes are corpus-order (VERDICT r3 #2).
    ``mode="join"`` keeps everything a Dataset: cluster sizes come from
    one grouped sum over the component table, ride a hash join back to
    the nodes, and a LEFT join attaches them to doc_ids (missing →
    cluster_size 1) — no driver collection of any size.  A clean
    corpus (zero pairs) makes the component table empty and schema-less
    — Acero cannot join it, so a ``limit(1)`` probe short-circuits to
    all-singleton weights first (ADVICE r4).  ``mode="auto"``
    (default, VERDICT r4 #2): bounded ``limit + 1`` probe — within the
    limit the probe is the broadcast table itself; beyond it fall
    through to the join route instead of raising.  ``weight``
    divides two exact ints (1.0 / int64) → bit-identical doubles on
    both engines and both routes (parity-tested).

    Output: (doc_id:int64, cluster_size:int64, weight:float64).
    """
    import numpy as np
    import pandas as pd

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.dedup import (
        connected_components,
        minhash_lsh_pairs,
        simhash_near_pairs,
    )

    if mode not in ("auto", "broadcast", "join"):
        raise ValueError(f"mode must be auto|broadcast|join, got {mode!r}")
    if method == "minhash":
        pairs = minhash_lsh_pairs(docs, threshold=threshold, hash_fn=hash_fn)
    elif method == "simhash":
        pairs = simhash_near_pairs(
            docs, max_hamming=max_hamming, hash_fn=hash_fn
        )
    else:
        raise ValueError(f"unknown near-dedup method {method!r}")

    comp = connected_components(pairs.select_columns(["a", "b"]))

    def all_singletons(df: pd.DataFrame):
        ids = df["doc_id"].astype("int64").to_numpy()
        return arrow_out(pd.DataFrame({
            "doc_id": ids,
            "cluster_size": np.ones(len(ids), dtype=np.int64),
            "weight": np.ones(len(ids), dtype=np.float64),
        }))

    cdf = None
    if mode != "join":
        cdf = comp.limit(broadcast_limit + 1).to_pandas()
        if len(cdf) > broadcast_limit:
            if mode == "broadcast":
                raise ValueError(
                    f"near-dup component table exceeds broadcast_limit="
                    f"{broadcast_limit}; use mode='join' for this corpus"
                )
            cdf = None  # mode == "auto": fall through to the join route
    elif not len(comp.limit(1).to_pandas()):
        # Explicit join mode, clean corpus: the empty component table
        # is schema-less — Acero cannot plan a join against it (ADVICE
        # r4).  Every doc is its own cluster of size 1.
        return docs.select_columns(["doc_id"]).map_batches(
            all_singletons, batch_format="pandas"
        )

    if cdf is None:
        from pdf_parser_ray.ops.relational import hash_join
        from pdf_parser_ray.ops.shuffle import grouped_sum

        def size_partial(df: pd.DataFrame):
            g = df.groupby("component", as_index=False).size()
            return arrow_out(g.rename(columns={"size": "csz"}))

        sizes = grouped_sum(
            comp.map_batches(size_partial, batch_format="pandas"),
            ["component"], ["csz"],
        )
        node_sz = hash_join(comp, sizes, ["component"])

        def as_doc_rows(df: pd.DataFrame):
            return arrow_out(pd.DataFrame({
                "doc_id": df["node"].astype("int64"),
                "csz": df["csz"].astype("int64")}))

        marked = node_sz.map_batches(as_doc_rows, batch_format="pandas")
        joined = hash_join(
            docs.select_columns(["doc_id"]), marked, ["doc_id"],
            join_type="left_outer",
        )

        def finish(df: pd.DataFrame):
            csz = df["csz"].fillna(1).astype("int64").to_numpy()
            return arrow_out(pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64").to_numpy(),
                "cluster_size": csz,
                "weight": 1.0 / csz,
            }))

        return joined.map_batches(finish, batch_format="pandas")

    if len(cdf):
        sizes = cdf.groupby("component")["node"].transform("size")
        node_size = dict(
            zip(cdf["node"].astype("int64"), sizes.astype("int64"))
        )
    else:
        node_size = {}
    size_ref = ray.put(node_size)

    def attach(df: pd.DataFrame):
        from pdf_parser_ray.stages import worker_state

        sizes: dict = worker_state(
            ("dupw", size_ref.hex()), lambda: ray.get(size_ref)
        )
        ids = df["doc_id"].astype("int64")
        csz = ids.map(sizes).fillna(1).astype("int64").to_numpy()
        return arrow_out(
            pd.DataFrame(
                {
                    "doc_id": ids.to_numpy(),
                    "cluster_size": csz,
                    "weight": 1.0 / csz,
                }
            )
        )

    return docs.select_columns(["doc_id"]).map_batches(
        attach, batch_format="pandas"
    )


def curate_web_corpus(
    ds,
    table_root: str,
    *,
    host_col: str = "host",
    text_col: str = "text",
    id_col: str = "doc_id",
    boiler_permille: int = 500,
    with_counts: bool = True,
    gate_kwargs: dict | None = None,
) -> dict:
    """The composed web-curation journey, end to end: host-scoped
    boilerplate strip → Gopher composite quality gate → exact dedup →
    versioned append into a :class:`~pdf_parser_ray.tablelog.TableLog`
    — each stage the library operator a pipeline would use standalone,
    chained with co-location joins (no broadcast of corpus-sized key
    sets anywhere).

    Returns the attrition summary: ``{"in": n, "after_gate": n,
    "after_dedup": n, "version": v, "table": root}`` (counts cost one
    pass each — pass ``with_counts=False`` to skip all but the final).
    """
    import ray.data  # noqa: F401

    from pdf_parser_ray.ops.dedup import exact_dedup
    from pdf_parser_ray.ops.relational import colo_join
    from pdf_parser_ray.ops.webtext import gopher_gate, host_boilerplate_strip
    from pdf_parser_ray.tablelog import TableLog

    n_in = ds.count() if with_counts else -1

    stripped = host_boilerplate_strip(
        ds,
        host_col=host_col,
        text_col=text_col,
        id_col=id_col,
        min_permille=boiler_permille,
    ).map_batches(
        lambda df: df.rename(columns={"clean_text": text_col}),
        batch_format="pandas",
    ).materialize()  # consumed by the gate AND both joins below

    gate = gopher_gate(
        stripped, text_col=text_col, id_col=id_col, **(gate_kwargs or {})
    )
    keep_ids = gate.filter(expr="keep == True").select_columns([id_col])
    gated = colo_join(
        stripped, keep_ids, [id_col],
        [text_col, "n_lines", "n_dropped"], [],
    ).materialize()
    n_gated = gated.count() if with_counts else -1

    winners = exact_dedup(gated).select_columns([id_col])
    survivors = colo_join(
        gated, winners, [id_col],
        [text_col, "n_lines", "n_dropped"], [],
    )

    log = TableLog(table_root)
    version = log.append(survivors)
    n_out = log.history()[-1]["n_rows"]
    return {
        "in": n_in,
        "after_gate": n_gated,
        "after_dedup": n_out,
        "version": version,
        "table": table_root,
    }
