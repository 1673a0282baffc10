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
    """Process-stable, well-distributed 64-bit hashes (blake2b/8)."""
    import hashlib

    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        digest = hashlib.blake2b(str(v).encode("utf-8"), digest_size=8).digest()
        out[i] = int.from_bytes(digest, "little")
    return out


def hll_distinct(ds: ray.data.Dataset, col: str, b: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): per-batch sketches merged on the
    driver (each partial is 4 KB — the merge is trivially small)."""

    def sketch_batch(df: pd.DataFrame) -> pd.DataFrame:
        h = HLL(b)
        h.add_hashes(_hash_strings(df[col].dropna().tolist()))
        return pd.DataFrame({"sketch": [h.registers.tobytes()]})

    parts = ds.map_batches(sketch_batch, batch_format="pandas").take_all()
    merged = HLL(b)
    for p in parts:
        merged = merged.merge(HLL(b, np.frombuffer(p["sketch"], dtype=np.uint8).copy()))
    return merged.estimate()
