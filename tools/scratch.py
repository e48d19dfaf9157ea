"""Scratch-space hygiene shared by bench.py and the oracle tooling.

Round-10 post-mortem: the driver's official bench run died with
``java.io.IOException: No space left on device`` (BENCH_r10.json rc=1)
because the repo's own tooling leaked scratch — 25 GB of DuckDB spill
in a fixed ``/tmp/gs_duck_spill`` (set once, never cleaned) plus ~9 GB
of ``blockmgr-*``/``spark-*`` dirs from dead Spark sessions. This
module is the fix:

* ``spill_dir()`` — a per-process UNIQUE DuckDB temp dir, registered
  for removal at interpreter exit, so concurrent runs can't collide
  and a normal exit can't leak.
* ``cleanup_spill()`` — explicit teardown for the current process's
  spill dir (callable from a ``finally``; idempotent).
* ``reap_stale()`` — removes spill/Spark scratch dirs in /tmp whose
  newest top-level mtime is older than a threshold (default 1 h).
  mtime-based liveness is deliberate: this box is single-tenant, the
  only producers are our own sessions, and a live Spark/DuckDB session
  that is actively spilling refreshes its top-level entries. The
  reaper runs at bench preflight — the one moment the contract says no
  sweep may be running (FIXTURES.md: never leave a sweep running into
  the harvest window).
* ``free_gb()`` — disk headroom for the preflight gate.
"""

from __future__ import annotations

import atexit
import glob
import os
import shutil
import time

SPILL_PREFIX = "gs_duck_spill"
#: /tmp dir patterns the reaper may touch — ONLY scratch our own
#: tooling (DuckDB spill) or Spark itself (local dirs / block manager)
#: creates. Nothing else in /tmp is ever removed.
REAPABLE_PATTERNS = (f"{SPILL_PREFIX}*", "blockmgr-*", "spark-*")

_spill_dir: str | None = None


def spill_dir() -> str:
    """Per-process unique DuckDB temp dir (created lazily, auto-reaped)."""
    global _spill_dir
    if _spill_dir is None:
        _spill_dir = os.environ.get(
            "GS_DUCK_SPILL_DIR", f"/tmp/{SPILL_PREFIX}_{os.getpid()}"
        )
        os.makedirs(_spill_dir, exist_ok=True)
        atexit.register(cleanup_spill)
    return _spill_dir


def cleanup_spill() -> None:
    """Remove this process's spill dir. Idempotent; safe in finally blocks."""
    global _spill_dir
    if _spill_dir and os.path.isdir(_spill_dir):
        shutil.rmtree(_spill_dir, ignore_errors=True)
    _spill_dir = None


def _newest_mtime(path: str) -> float:
    """Newest mtime among the dir and its first-level entries.

    One level is enough to detect liveness (Spark refreshes top-level
    shuffle/block subdirs while active; DuckDB rewrites spill files in
    the root) without walking a multi-GB tree.
    """
    newest = 0.0
    try:
        newest = os.stat(path).st_mtime
        with os.scandir(path) as it:
            for entry in it:
                try:
                    newest = max(newest, entry.stat(follow_symlinks=False).st_mtime)
                except OSError:
                    continue
    except OSError:
        pass
    return newest


def reap_stale(tmp: str = "/tmp", max_age_s: float = 3600.0) -> list[str]:
    """Remove stale scratch dirs under *tmp*; returns the paths removed.

    A dir is stale when its newest top-level mtime is older than
    ``max_age_s`` (env override ``GS_REAP_MAX_AGE_S``). The current
    process's own spill dir is always skipped.
    """
    max_age_s = float(os.environ.get("GS_REAP_MAX_AGE_S", max_age_s))
    now = time.time()
    removed: list[str] = []
    for pattern in REAPABLE_PATTERNS:
        for path in glob.glob(os.path.join(tmp, pattern)):
            if not os.path.isdir(path) or path == _spill_dir:
                continue
            if now - _newest_mtime(path) > max_age_s:
                shutil.rmtree(path, ignore_errors=True)
                if not os.path.exists(path):
                    removed.append(path)
    return removed


def free_gb(path: str = "/tmp") -> float:
    """Free disk space at *path* in GiB."""
    return shutil.disk_usage(path).free / (1024**3)
