"""Mini-driver: run a queries() entry and its oracle SQL side by side.

Mimics the driver's CORRECTNESS check: row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted
by all columns).
"""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def dtype_family(dtype) -> str:
    """Coarse dtype class the driver's value hash is sensitive to.

    int64 vs float64 serialize differently (1981 vs 1981.0) even when
    values are equal — the round-2 as-of/range join failures shipped
    exactly that — so the sweep must flag family mismatches, not coerce
    them away.  Masked Int64 and plain int64 are the same family (both
    reach Arrow as int64)."""
    kind = getattr(dtype, "kind", None)
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind == "M":
        return "datetime"
    return "object"


def compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    """Returns a list of mismatch descriptions (empty == match)."""
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    for col in ray_df.columns:
        fa, fb = dtype_family(ray_df[col].dtype), dtype_family(sql_df[col].dtype)
        if fa != fb:
            problems.append(
                f"dtype[{col}]: ray={ray_df[col].dtype} ({fa}) vs "
                f"sql={sql_df[col].dtype} ({fb})"
            )
    if len(ray_df) != len(sql_df):
        problems.append(f"row count: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canonical(ray_df), canonical(sql_df)
    if len(a) == len(b):
        for col in a.columns:
            ca, cb = a[col], b[col]
            if pd.api.types.is_float_dtype(ca) or pd.api.types.is_float_dtype(cb):
                import numpy as np

                if not np.allclose(
                    ca.astype(float), cb.astype(float), rtol=0, atol=1e-9, equal_nan=True
                ):
                    bad = (ca.astype(float) - cb.astype(float)).abs().max()
                    problems.append(f"values[{col}]: max |diff|={bad}")
            else:
                if not ca.astype(str).equals(cb.astype(str)):
                    neq = (ca.astype(str) != cb.astype(str))
                    i = neq.idxmax()
                    problems.append(
                        f"values[{col}]: first diff at row {i}: {ca[i]!r} vs {cb[i]!r}"
                    )
    return problems
