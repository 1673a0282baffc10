"""Versioned parquet tables with time travel — a commit-log layer
(the Delta/Iceberg idea at its smallest useful size) over plain
parquet directories, so long-running curation pipelines get atomic
appends, reproducible reads of ANY historical version, and safe
concurrent writers without a metastore.

Design (all local-filesystem primitives, rename-for-atomicity):

* ``<root>/_log/<10-digit version>.json`` — one commit per version:
  ``{"version": N, "op": "append"|"overwrite", "add": [relpaths],
  "remove": [relpaths], "n_rows": int, "columns": [...]}``.
  The LOG is the source of truth; data files are immutable once
  referenced.
* A commit is ``os.rename(tmp, final)`` of the next version number —
  rename fails (or the file already exists) when another writer won
  the race, which surfaces as ``CommitConflict`` instead of silent
  corruption: optimistic concurrency without locks.
* ``read(version=...)`` replays the log up to the version and hands
  the surviving file set to ``ray.data.read_parquet`` — time travel
  is just a shorter replay.  ``vacuum()`` deletes files no live
  version references (point-in-time reads older than the latest
  overwrite die with vacuum, as in the big systems).

Scale notes: commits carry file LISTS, not row data — a 100 TB table
is thousands of parquet parts and a few KB of log per commit; replay
cost is O(commits), independent of data size.  Writers stream through
``Dataset.write_parquet`` (no driver materialization).
"""

from __future__ import annotations

import glob
import json
import os
import uuid

import ray.data

__all__ = ["TableLog", "CommitConflict"]


class CommitConflict(RuntimeError):
    """Another writer committed this version first — re-read and retry."""


class TableLog:
    def __init__(self, root: str):
        self.root = root
        self.log_dir = os.path.join(root, "_log")
        os.makedirs(self.log_dir, exist_ok=True)

    # ------------------------------------------------------------ log

    def _commit_files(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.log_dir, "*.json")))

    def latest_version(self) -> int:
        files = self._commit_files()
        return int(os.path.basename(files[-1])[:-5]) if files else -1

    def history(self) -> list[dict]:
        out = []
        for f in self._commit_files():
            with open(f) as fh:
                out.append(json.load(fh))
        return out

    def _active_files(self, version: int | None = None) -> list[str]:
        live: list[str] = []
        for commit in self.history():
            if version is not None and commit["version"] > version:
                break
            if commit["op"] == "overwrite":
                live = []
            for r in commit.get("remove", []):
                if r in live:
                    live.remove(r)
            live.extend(commit["add"])
        return live

    def _commit(self, payload: dict, base: int) -> int:
        # optimistic concurrency: the writer pinned ``base`` BEFORE
        # writing data; if someone else landed base+1 meanwhile, the
        # rename target exists and the commit conflicts instead of
        # silently appending after state it never saw
        version = base + 1
        payload = {"version": version, **payload}
        final = os.path.join(self.log_dir, f"{version:010d}.json")
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(payload, f)
        try:
            # os.link raises FileExistsError on EEXIST atomically —
            # unlike rename, which silently REPLACES an existing file,
            # so two writers racing past an exists() check would both
            # "succeed" and the loser's commit would be lost
            os.link(tmp, final)
        except FileExistsError:
            raise CommitConflict(f"version {version} already committed") from None
        except OSError as e:  # pragma: no cover — platform-specific race
            raise CommitConflict(str(e)) from e
        finally:
            os.unlink(tmp)
        return version

    # ----------------------------------------------------------- data

    def _write_parts(self, ds: ray.data.Dataset) -> tuple[list[str], int]:
        part_dir = f"parts-{uuid.uuid4().hex}"
        abs_dir = os.path.join(self.root, part_dir)
        ds.write_parquet(abs_dir)
        files = sorted(
            os.path.relpath(p, self.root)
            for p in glob.glob(os.path.join(abs_dir, "**", "*.parquet"),
                               recursive=True)
        )
        if not files:  # empty dataset → a valid zero-row commit
            return [], 0
        n = ray.data.read_parquet(abs_dir).count()
        return files, n

    def append(self, ds: ray.data.Dataset) -> int:
        base = self.latest_version()
        files, n = self._write_parts(ds)
        cols = list(ds.schema().names)
        return self._commit(
            {"op": "append", "add": files, "remove": [], "n_rows": n,
             "columns": cols},
            base,
        )

    def overwrite(self, ds: ray.data.Dataset) -> int:
        base = self.latest_version()
        files, n = self._write_parts(ds)
        cols = list(ds.schema().names)
        return self._commit(
            {"op": "overwrite", "add": files, "remove": [], "n_rows": n,
             "columns": cols},
            base,
        )

    def read(self, version: int | None = None) -> ray.data.Dataset:
        files = self._active_files(version)
        if not files:
            import pyarrow as pa

            return ray.data.from_arrow(pa.table({}))
        return ray.data.read_parquet(
            [os.path.join(self.root, f) for f in files]
        )

    def vacuum(self, *, retention_s: float = 24 * 3600.0) -> int:
        """Delete data files a reader can no longer reach: files some
        commit referenced that are no longer live (superseded by an
        overwrite / remove), plus UNREFERENCED files — failed or
        abandoned writes — older than ``retention_s`` seconds.

        The age threshold exists because an in-flight append writes its
        parts BEFORE its commit lands: a concurrent vacuum would
        otherwise see those parts as orphans and destroy data that is
        about to be committed (the retention-period rule production
        table formats use for exactly this race).  Returns the number
        of files removed; time travel across an overwrite stops working
        afterwards (the documented trade).
        """
        import time

        live = set(self._active_files())
        referenced_all: set[str] = set()
        for commit in self.history():
            referenced_all.update(commit["add"])
        now = time.time()
        removed = 0
        for p in glob.glob(
            os.path.join(self.root, "parts-*", "**", "*.parquet"),
            recursive=True,
        ):
            rel = os.path.relpath(p, self.root)
            if rel in live:
                continue
            if rel not in referenced_all:
                try:
                    age = now - os.path.getmtime(p)
                except OSError:  # pragma: no cover — deleted under us
                    continue
                if age < retention_s:
                    continue  # possibly an in-flight writer's parts
            os.unlink(p)
            removed += 1
        return removed
