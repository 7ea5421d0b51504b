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


# ---------------------------------------------------------------------------
# Manifest generation claims (ADVICE r15): the shared optimistic-
# concurrency primitive for the manifest-committed stores. A store's
# manifest read-modify-write claims generation read+1 with an O_EXCL
# marker before the atomic replace — exactly one writer commits each
# generation; a loser re-reads the winner's manifest and re-applies
# its delta (or aborts loudly when the deltas conflict).
# ---------------------------------------------------------------------------

# How long an unfinished claim blocks other writers before they steal
# it (a crashed writer's marker must not wedge the store forever; a
# LIVE writer finishes its replace in milliseconds).
GEN_STEAL_SECONDS = 60.0


def committed_generation(root: str) -> int:
    """Generation recorded in the store's committed ``_MANIFEST.json``
    (0 when the store is empty/unreadable — then no marker is a
    committed one and the steal gate cannot block)."""
    import json

    try:
        with open(os.path.join(root, "_MANIFEST.json")) as f:
            return int(json.load(f).get("generation", 0))
    except (FileNotFoundError, ValueError, TypeError, json.JSONDecodeError):
        return 0


def claim_generation(root: str, gen: int, steal_seconds: float | None = None) -> bool:
    """O_CREAT|O_EXCL claim of manifest generation ``gen`` under
    ``root``. Exactly one writer wins a generation number. A marker
    older than the steal window is a crashed writer's leftover —
    removed so the next attempt can claim (the remove itself tolerates
    a racing stealer). Only markers ABOVE the committed manifest's
    generation are stealable: a marker at or below it is the committed
    history's claim record — the very thing that makes a stale-read
    racer's O_EXCL fail — and stealing it would let two slow writers
    (>steal window staging segments) replace a committed generation
    with one built from stale state, silently dropping the real
    winner's delta (ADVICE r16 #2)."""
    import time

    if steal_seconds is None:
        steal_seconds = GEN_STEAL_SECONDS
    marker = os.path.join(root, f"_gen-{gen:09d}")
    try:
        os.close(os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
        return True
    except FileExistsError:
        try:
            age = time.time() - os.path.getmtime(marker)
        except FileNotFoundError:
            return False  # holder finished or another stealer won
        if age >= steal_seconds and gen > committed_generation(root):
            try:
                os.remove(marker)  # crashed claimer: unwedge the store
            except FileNotFoundError:
                pass
        return False


def clear_generation_markers(root: str, below: int | None = None) -> None:
    """Remove claim markers under ``root`` — all of them (a fresh store
    bootstrap over crashed-claim leftovers), or only those strictly
    below ``below`` (committed history; the CURRENT generation's marker
    must persist, it is what makes a stale-read racer's claim fail)."""
    try:
        names = os.listdir(root)
    except FileNotFoundError:
        return
    for name in names:
        if not name.startswith("_gen-"):
            continue
        try:
            gen = int(name[5:])
        except ValueError:
            continue
        if below is not None and gen >= below:
            continue
        try:
            os.remove(os.path.join(root, name))
        except FileNotFoundError:
            pass
