"""Shared filesystem helpers for the manifest-committed stores
(BM25 segments, IVFPQ segments, versioned tables).

One implementation of the age-gate discipline (ADVICE r14 #4): a
directory is only 'stale' once the NEWEST entry in its whole tree is
older than the grace window — the top-level mtime goes stale the
moment the first child lands, so gating on it could sweep an
in-flight write.
"""

from __future__ import annotations

import os
import shutil


def newest_mtime(path: str) -> float | None:
    """max mtime over ``path`` and everything under it, or None if the
    path vanished (its writer finished or another sweeper won)."""
    try:
        latest = os.path.getmtime(path)
    except FileNotFoundError:
        return None
    for walk_root, dirs, files in os.walk(path):
        for name in dirs + files:
            try:
                latest = max(
                    latest, os.path.getmtime(os.path.join(walk_root, name))
                )
            except FileNotFoundError:
                continue
    return latest


def vacuum_unlisted_dirs(
    root: str,
    listed: set[str],
    grace_seconds: float,
    dry_run: bool,
) -> dict:
    """Reclaim entries of ``root`` whose names are not in ``listed``
    and whose whole tree has aged past ``grace_seconds`` — the shared
    segment-store sweep (compaction-retired segments, torn-add
    leftovers, crashed staging dirs). Fresh dirs are spared: they may
    be an in-flight write or a segment a just-superseded manifest's
    reader still holds — which is why compactions ``os.utime`` each
    dir they retire (ADVICE r15 #3): the age gate then counts from
    RETIREMENT, not from the segment's possibly-ancient write time,
    so a long-lived segment is protected for the full grace window
    after it leaves the manifest. Deletions tolerate a concurrent
    sweeper (ignore_errors)."""
    import time

    now = time.time()
    drop = []
    if os.path.isdir(root):
        for name in sorted(os.listdir(root)):
            if name in listed:
                continue
            latest = newest_mtime(os.path.join(root, name))
            if latest is not None and now - latest >= grace_seconds:
                drop.append(name)
    plan = {"dirs_removed": len(drop), "dirs": drop, "dry_run": dry_run}
    if dry_run:
        return plan
    for name in drop:
        shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    return plan
