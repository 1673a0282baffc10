"""Logical-plan introspection: count the shuffles before paying for them.

The brief's scale rules ("minimize shuffles", "pre-aggregate before a
groupby", "broadcast small sides") are design constraints — this module
turns them into ASSERTABLE invariants.  A Dataset's logical plan is
available before execution, so tests can pin each pipeline's shuffle
budget (tests/test_plan.py) and any refactor that silently adds an
all-to-all exchange fails CI instead of dying at 100 TB.

Works on lazy Datasets only (inspection executes nothing).  Ray internal
APIs are version-pinned to ray 2.49 (guarded imports; the module
degrades to conservative name-matching if the internals move).
"""

from __future__ import annotations

from collections import Counter

import ray.data

try:  # ray 2.49 internals — guarded so a Ray upgrade degrades gracefully
    from ray.data._internal.logical.operators.all_to_all_operator import (
        AbstractAllToAll,
        RandomizeBlocks,
    )
except ImportError:  # pragma: no cover — future-ray fallback
    AbstractAllToAll = None
    RandomizeBlocks = None

try:
    from ray.data._internal.logical.operators.join_operator import Join
except ImportError:  # pragma: no cover
    Join = None

# Names used only when the class imports above failed.
_SHUFFLE_NAME_HINTS = ("Aggregate", "Sort", "RandomShuffle", "Repartition", "Join")


def walk(ds: ray.data.Dataset):
    """Yield every logical operator in ``ds``'s plan (root first)."""
    seen = set()
    stack = [ds._logical_plan.dag]
    while stack:
        op = stack.pop()
        if id(op) in seen:
            continue
        seen.add(id(op))
        yield op
        stack.extend(op.input_dependencies)


def _is_shuffle(op) -> bool:
    if AbstractAllToAll is not None:
        if RandomizeBlocks is not None and isinstance(op, RandomizeBlocks):
            return False  # block-order metadata move, not a data exchange
        if isinstance(op, AbstractAllToAll):
            return True
        return Join is not None and isinstance(op, Join)
    return any(h in type(op).__name__ for h in _SHUFFLE_NAME_HINTS)


def shuffle_count(ds: ray.data.Dataset) -> int:
    """Number of all-to-all exchanges (groupby/sort/shuffle-repartition/
    random-shuffle/join) the plan will run.  Every one moves each block
    across the cluster — the scale currency this repo budgets."""
    return sum(1 for op in walk(ds) if _is_shuffle(op))


def plan_summary(ds: ray.data.Dataset) -> dict:
    """{'ops': Counter(type name -> count), 'shuffles': n, 'depth': n}.

    ``depth`` is the longest input chain — a proxy for pipeline stages
    that must run serially.
    """
    ops = Counter(type(op).__name__ for op in walk(ds))

    def depth(op) -> int:
        return 1 + max((depth(d) for d in op.input_dependencies), default=0)

    return {
        "ops": ops,
        "shuffles": shuffle_count(ds),
        "depth": depth(ds._logical_plan.dag),
    }


def assert_max_shuffles(ds: ray.data.Dataset, budget: int, label: str = "") -> None:
    """Raise AssertionError when the plan exceeds its shuffle budget."""
    n = shuffle_count(ds)
    if n > budget:
        ops = Counter(type(op).__name__ for op in walk(ds) if _is_shuffle(op))
        raise AssertionError(
            f"{label or 'pipeline'}: {n} shuffles > budget {budget} ({dict(ops)})"
        )
