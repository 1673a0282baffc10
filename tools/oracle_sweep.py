"""Full oracle sweep: run every queries() entry against its DuckDB twin.

Usage: python tools/oracle_sweep.py [sf_dir]   (default /root/testdata/sf0.01)

Mimics the driver's CORRECTNESS gate per query (row count, columns,
order-insensitive value compare via tests/oracle_utils.compare) and
prints one line per query plus a final ``FAILS: n``.  Queries without an
oracle entry run rows-only (must not raise; row count printed).
"""

from __future__ import annotations

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=16,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from oracle_utils import compare, duckdb_con, to_pandas

    from pdf_parser_ray.queries import QUERIES, SQL

    con = duckdb_con(sf)
    fails = 0
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        try:
            ray_df = to_pandas(QUERIES[name](sf))
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            fails += 1
            continue
        dt = time.perf_counter() - t0
        if name in SQL:
            probs = compare(ray_df, con.execute(SQL[name]).df())
            if probs:
                print(f"{name}: FAIL {probs}  [{dt:.1f}s]")
                fails += 1
            else:
                print(f"{name}: ok ({len(ray_df)} rows)  [{dt:.1f}s]")
        else:
            print(f"{name}: rows-only ({len(ray_df)} rows)  [{dt:.1f}s]")
    print(f"FAILS: {fails}")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
