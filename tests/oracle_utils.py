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


def compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    """Returns a list of mismatch descriptions (empty == match)."""
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
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
