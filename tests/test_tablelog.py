"""Versioned table log: atomic commits, time travel, conflict
detection, vacuum (pdf_parser_ray/tablelog.py)."""

import json
import os

import pandas as pd
import pytest
import ray.data

from pdf_parser_ray.tablelog import CommitConflict, TableLog


def _df(lo, hi):
    return pd.DataFrame({"k": range(lo, hi), "v": [f"r{i}" for i in range(lo, hi)]})


class TestTableLog:
    def test_append_and_time_travel(self, ray_session, tmp_path):
        t = TableLog(str(tmp_path / "t"))
        v0 = t.append(ray.data.from_pandas(_df(0, 5)))
        v1 = t.append(ray.data.from_pandas(_df(5, 8)))
        assert (v0, v1) == (0, 1)
        assert t.read().count() == 8
        assert t.read(version=0).count() == 5
        got = sorted(r["k"] for r in t.read(version=0).take_all())
        assert got == [0, 1, 2, 3, 4]

    def test_overwrite_resets_then_history_persists(self, ray_session, tmp_path):
        t = TableLog(str(tmp_path / "t"))
        t.append(ray.data.from_pandas(_df(0, 5)))
        t.overwrite(ray.data.from_pandas(_df(100, 103)))
        t.append(ray.data.from_pandas(_df(103, 104)))
        assert t.read().count() == 4
        assert t.read(version=0).count() == 5  # pre-overwrite still readable
        hist = t.history()
        assert [h["op"] for h in hist] == ["append", "overwrite", "append"]
        assert [h["version"] for h in hist] == [0, 1, 2]
        assert hist[1]["n_rows"] == 3

    def test_commit_conflict_detected(self, ray_session, tmp_path):
        t = TableLog(str(tmp_path / "t"))
        t.append(ray.data.from_pandas(_df(0, 3)))
        # writer A pins its base and writes its data files...
        base = t.latest_version()
        files, n = t._write_parts(ray.data.from_pandas(_df(3, 6)))
        # ...then a rival writer lands version base+1 FIRST
        rival = os.path.join(
            str(tmp_path / "t"), "_log", f"{base + 1:010d}.json"
        )
        with open(rival, "w") as f:
            json.dump({"version": base + 1, "op": "append", "add": [],
                       "remove": [], "n_rows": 0, "columns": []}, f)
        with pytest.raises(CommitConflict):
            t._commit({"op": "append", "add": files, "remove": [],
                       "n_rows": n, "columns": ["k", "v"]}, base)
        # a fresh attempt re-reads the log and lands cleanly after
        v = t.append(ray.data.from_pandas(_df(3, 6)))
        assert v == base + 2
        assert t.read().count() == 6  # rival's empty commit + ours

    def test_vacuum_drops_pre_overwrite_files(self, ray_session, tmp_path):
        t = TableLog(str(tmp_path / "t"))
        t.append(ray.data.from_pandas(_df(0, 5)))
        t.overwrite(ray.data.from_pandas(_df(9, 12)))
        removed = t.vacuum()
        assert removed >= 1
        assert t.read().count() == 3           # live table intact
        assert sorted(r["k"] for r in t.read().take_all()) == [9, 10, 11]

    def test_empty_table_reads_empty(self, ray_session, tmp_path):
        t = TableLog(str(tmp_path / "t"))
        assert t.read().count() == 0

    def test_conflict_never_replaces_winner(self, ray_session, tmp_path):
        """The commit primitive must FAIL atomically on an existing
        version (os.link EEXIST), not rename over it — a plain rename
        would silently replace the race winner's commit (ADVICE r2)."""
        t = TableLog(str(tmp_path / "t"))
        t.append(ray.data.from_pandas(_df(0, 3)))
        base = t.latest_version()
        rival_path = os.path.join(
            str(tmp_path / "t"), "_log", f"{base + 1:010d}.json"
        )
        rival_payload = {"version": base + 1, "op": "append",
                         "add": ["rival-part"], "remove": [],
                         "n_rows": 1, "columns": ["k"]}
        with open(rival_path, "w") as f:
            json.dump(rival_payload, f)
        with pytest.raises(CommitConflict):
            t._commit({"op": "append", "add": ["loser-part"],
                       "remove": [], "n_rows": 9, "columns": ["k"]}, base)
        with open(rival_path) as f:
            assert json.load(f) == rival_payload  # winner intact
        # loser's tmp file cleaned up
        log_dir = os.path.join(str(tmp_path / "t"), "_log")
        assert not [p for p in os.listdir(log_dir) if p.startswith(".tmp-")]

    def test_vacuum_spares_recent_uncommitted_parts(
        self, ray_session, tmp_path
    ):
        """Parts written by an in-flight append (data lands BEFORE the
        commit) must survive a concurrent vacuum; only unreferenced
        files older than the retention window are orphans (ADVICE r2)."""
        t = TableLog(str(tmp_path / "t"))
        t.append(ray.data.from_pandas(_df(0, 3)))
        # writer B has staged its parts but not committed yet
        files, n = t._write_parts(ray.data.from_pandas(_df(3, 6)))
        assert t.vacuum() == 0                 # fresh → protected
        for rel in files:
            assert os.path.exists(os.path.join(str(tmp_path / "t"), rel))
        # writer B lands; its data must be complete
        t._commit({"op": "append", "add": files, "remove": [],
                   "n_rows": n, "columns": ["k", "v"]}, t.latest_version())
        assert t.read().count() == 6
        # a genuinely abandoned write IS collected once past retention
        t._write_parts(ray.data.from_pandas(_df(50, 52)))
        assert t.vacuum(retention_s=0.0) >= 1
        assert t.read().count() == 6           # live table intact


def test_empty_append_is_valid_commit(ray_session, tmp_path):
    import pyarrow as pa

    t = TableLog(str(tmp_path / "t"))
    t.append(ray.data.from_pandas(_df(0, 3)))
    empty = ray.data.from_pandas(_df(0, 3)).filter(expr="k > 99")
    v = t.append(empty)
    assert v == 1
    assert t.history()[-1]["n_rows"] == 0
    assert t.read().count() == 3
