"""Scratch-space hygiene contract (round-11, after the r10 driver bench
was disk-killed by 25 GB of leaked DuckDB spill + 9 GB of dead Spark
scratch): the spill dir is per-process unique and torn down, the reaper
removes only stale dirs matching our own patterns, and the oracle gate
actually routes DuckDB's temp_directory through the managed dir.
"""

from __future__ import annotations

import os
import time

from tools import scratch


def test_spill_dir_unique_and_cleaned():
    d = scratch.spill_dir()
    assert os.path.isdir(d)
    assert f"{scratch.SPILL_PREFIX}" in os.path.basename(d)
    # unique per process unless pinned via env
    assert str(os.getpid()) in d or os.environ.get("GS_DUCK_SPILL_DIR")
    scratch.cleanup_spill()
    assert not os.path.exists(d)
    # idempotent
    scratch.cleanup_spill()


def _dead_pid() -> int:
    """A PID guaranteed not to be running."""
    pid = 99999
    while os.path.exists(f"/proc/{pid}"):
        pid -= 1
    return pid


def test_reap_stale_removes_only_old_matching_dirs(tmp_path, monkeypatch):
    # no-JVM case: Spark scratch is orphaned by definition → mtime rules
    monkeypatch.setattr(scratch, "_live_jvm_exists", lambda: False)
    dead = _dead_pid()
    old_spill = tmp_path / f"gs_duck_spill_{dead}"
    old_spark = tmp_path / "spark-deadbeef"
    old_blockmgr = tmp_path / "blockmgr-cafe"
    fresh = tmp_path / f"gs_duck_spill_{dead - 1}"
    unrelated = tmp_path / "somethingelse-old"
    for d in (old_spill, old_spark, old_blockmgr, fresh, unrelated):
        d.mkdir()
        (d / "f.bin").write_bytes(b"x")
    stale_t = time.time() - 7200  # 2h old > 1h default threshold
    for d in (old_spill, old_spark, old_blockmgr, unrelated):
        os.utime(d / "f.bin", (stale_t, stale_t))
        os.utime(d, (stale_t, stale_t))

    removed = scratch.reap_stale(tmp=str(tmp_path))

    assert sorted(removed) == sorted(
        [str(old_spill), str(old_spark), str(old_blockmgr)]
    )
    assert fresh.exists(), "fresh scratch must survive"
    assert unrelated.exists(), "non-matching dirs are never touched"


def test_reap_skips_spark_dirs_while_any_jvm_lives(tmp_path, monkeypatch):
    # advisor r11: an idle-but-live Spark session can go >1h without
    # refreshing mtimes; reaping its block manager kills its shuffles.
    # While ANY JVM is alive, spark-*/blockmgr-* are off limits — but
    # dead-PID spill dirs are still reaped (they encode their owner).
    monkeypatch.setattr(scratch, "_live_jvm_exists", lambda: True)
    old_spark = tmp_path / "spark-idlelive"
    old_blockmgr = tmp_path / "blockmgr-idlelive"
    dead_spill = tmp_path / f"gs_duck_spill_{_dead_pid()}"
    for d in (old_spark, old_blockmgr, dead_spill):
        d.mkdir()
    stale_t = time.time() - 7200
    for d in (old_spark, old_blockmgr, dead_spill):
        os.utime(d, (stale_t, stale_t))

    removed = scratch.reap_stale(tmp=str(tmp_path))

    assert removed == [str(dead_spill)]
    assert old_spark.exists() and old_blockmgr.exists()


def test_reap_skips_spill_dir_of_live_pid(tmp_path, monkeypatch):
    monkeypatch.setattr(scratch, "_live_jvm_exists", lambda: False)
    live_owner = tmp_path / "gs_duck_spill_1"  # PID 1 is always alive
    live_owner.mkdir()
    stale_t = time.time() - 7200
    os.utime(live_owner, (stale_t, stale_t))
    assert scratch.reap_stale(tmp=str(tmp_path)) == []
    assert live_owner.exists()


def test_live_jvm_probe_runs():
    # smoke: the /proc scan must not raise; value depends on the box
    assert scratch._live_jvm_exists() in (True, False)


def test_reap_stale_keeps_dir_with_fresh_child(tmp_path, monkeypatch):
    # dir mtime old, but a top-level entry was touched recently → a live
    # session actively spilling — must NOT be reaped (even with no JVM,
    # so the mtime gate is exercised, not the liveness gate)
    monkeypatch.setattr(scratch, "_live_jvm_exists", lambda: False)
    live = tmp_path / "spark-live"
    live.mkdir()
    f = live / "shuffle.data"
    f.write_bytes(b"x")
    stale_t = time.time() - 7200
    os.utime(live, (stale_t, stale_t))  # dir itself looks old
    assert scratch.reap_stale(tmp=str(tmp_path)) == []
    assert live.exists()


def test_reap_never_touches_own_spill_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("GS_DUCK_SPILL_DIR", str(tmp_path / "gs_duck_spill_own"))
    scratch._spill_dir = None  # reset the lazy singleton for this test
    own = scratch.spill_dir()
    stale_t = time.time() - 7200
    os.utime(own, (stale_t, stale_t))
    assert scratch.reap_stale(tmp=str(tmp_path)) == []
    assert os.path.isdir(own)
    scratch.cleanup_spill()


def test_free_gb_positive():
    assert scratch.free_gb() > 0


def test_oracle_gate_routes_duckdb_spill_through_managed_dir():
    from tools.oracle_check import duck_connection

    con = duck_connection("/root/testdata/sf0.001")
    got = con.execute("SELECT current_setting('temp_directory')").fetchone()[0]
    con.close()
    assert got == scratch.spill_dir()
    scratch.cleanup_spill()
