"""Logical-plan shuffle budgets (ops/plan.py).

These tests pin each pipeline's all-to-all exchange count BEFORE
execution — the design-for-scale rules ("pre-aggregate, then one small
groupby", "broadcast, don't shuffle-join") as enforced invariants.  A
refactor that silently adds a shuffle fails here instead of at 100 TB.
"""

import pandas as pd
import pytest
import ray.data

from pdf_parser_ray.ops.plan import (
    assert_max_shuffles,
    plan_summary,
    shuffle_count,
)

SF = "/root/testdata/sf0.001"


def test_counts_groupby_and_ignores_maps(ray_session):
    ds = ray.data.read_parquet(f"{SF}/events.parquet")
    assert shuffle_count(ds) == 0
    assert shuffle_count(ds.map_batches(lambda b: b)) == 0
    assert shuffle_count(ds.groupby("event_type").count()) == 1
    assert shuffle_count(ds.sort("event_id")) == 1
    two = ds.groupby("event_type").count().sort("event_type")
    assert shuffle_count(two) == 2


def test_plan_summary_shape(ray_session):
    ds = ray.data.read_parquet(f"{SF}/events.parquet").groupby("event_type").count()
    s = plan_summary(ds)
    assert s["shuffles"] == 1
    assert s["depth"] >= 2
    assert sum(s["ops"].values()) >= 2


def test_assert_max_shuffles_raises(ray_session):
    ds = ray.data.read_parquet(f"{SF}/events.parquet").groupby("event_type").count()
    assert_max_shuffles(ds, 1, "grouped count")
    with pytest.raises(AssertionError, match="budget"):
        assert_max_shuffles(ds, 0, "grouped count")


# -- budgets for the repo's own pipelines (Dataset-returning queries) --

BUDGETS = {
    # partial-agg then one small groupby
    "doc_stats": 1,
    "dedup_exact": 1,
    "top_events_per_type": 1,
    # row-local map pipelines: zero exchanges
    "token_stats": 0,
    "quality": 0,
    "fingerprint": 0,
    "lang_id": 0,
    "validate_events": 0,
    "chunk_documents": 0,
    # one co-locating partition shuffle
    "sessionize": 1,
    "assign_sessions": 1,
    "distinct_users_per_type": 2,  # partitioned_map + final grouped sum
    # session-13 additions
    "blocklist_gate": 0,
    "blocklist_gate_ac": 0,
    "blocklist_rates": 1,       # bounded-key pattern rollup
    "shard_plan": 1,            # one bucket co-location
    "shard_plan_summary": 2,    # plan + bounded shard rollup
    "html_tables": 0,
    "table_shapes": 0,          # r5: doc-local rollup, zero exchange
    "dup_weights_md5": 0,       # cluster sizes broadcast; attach row-local
    "bpe_encode": 0,            # merge table broadcast; encode row-local
    "perceptron_predict": 0,    # weights broadcast; scoring row-local
    "epoch_repeats": 1,         # one bucket co-location (prefix-sum plan)
    # session-14 additions
    "line_dedup": 0,            # hot-line set broadcast; scrub row-local
    "unigram_encode": 0,        # piece table broadcast; Viterbi row-local
    "entity_tag": 0,            # gazetteer offsets are row-local
    "entity_tag_ac": 0,
    "frontier_schedule": 1,     # one host co-location; delays broadcast
    "frontier_makespan": 1,     # partial counts -> one bounded host sum
    "filter_funnel": 1,         # per-batch signals -> one bounded source sum
    "char_entropy": 0,          # one vectorized map, row-local
    "compression_ratio": 0,     # zlib kernel per row, row-local
    "jsonl_roundtrip": 0,       # shard write is map-only; read is map-only
    "dp_user_counts": 1,        # partial counts -> one co-located sum
    "dehyphenate": 0,           # vectorized regex join, row-local
    "jl_project": 0,            # deterministic matrix rebuilt per worker
    "domain_rollup": 1,         # partial counts -> one bounded domain sum
    "stem_vocab": 1,            # distinct-token partials -> one stem colo
    "rendezvous_shards": 0,     # HRW weights are row-local
}


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_query_shuffle_budget(ray_session, name):
    from pdf_parser_ray.queries import QUERIES

    ds = QUERIES[name](SF)
    assert isinstance(ds, ray.data.Dataset), "budget test needs a lazy Dataset"
    assert_max_shuffles(ds, BUDGETS[name], name)


def test_tumbling_counts_single_shuffle(ray_session):
    from pdf_parser_ray.ops.windows import tumbling_counts

    ds = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["ts", "event_type", "value"]
    )
    assert_max_shuffles(tumbling_counts(ds, unit="hour"), 1, "tumbling_counts")


def test_extraction_flagship_zero_shuffle(ray_session, tmp_path):
    """The headline pipeline moves every block exactly never."""
    from pdf_parser_ray.corpus import ensure_corpus
    from pdf_parser_ray.pipelines import extract_corpus, read_corpus

    ds = extract_corpus(read_corpus(ensure_corpus(200, seed=7)))
    assert_max_shuffles(ds, 0, "extract_corpus")
