"""Versioned table sink: snapshot commit + time travel (S33).

VERDICT r12 task #6 — the lakehouse capability a 100 TB pipeline
assumes (the Delta/Iceberg posture, re-expressed with the repo's own
ingredients: S31's manifest-commit protocol, #161's snapshot-diff
read, #233's CDC-apply semantics downstream). Pure stdlib + parquet —
no table-format library exists in this environment, and the point is
the COMMIT PROTOCOL, not the file format.

Layout under ``table_dir``::

    data/commit-<token>/   parquet written by exactly one commit
    _v{N}.json             manifest: ordered data dirs + schema + counts

A version's manifest lists every data directory composing it, so an
APPEND version reuses the previous version's directories by reference
(no rewrite — O(delta) commit cost), and an OVERWRITE version lists
only its own. Old data dirs are never mutated or deleted, which is
what makes every historical version readable forever (time travel)
until an explicit vacuum.

Commit protocol (crash-safe, first-writer-wins):

1. write the commit's parquet under ``data/commit-<token>/``
   (invisible — no manifest references it yet);
2. write the manifest body to ``_tmp-v{N}-<token>.json``;
3. CLAIM the version with ``os.link(tmp, _v{N}.json)`` — hard-link
   creation is atomic and FAILS if the name exists, so exactly one
   writer wins a version number; the loser retries at N+1 (the
   optimistic-concurrency loop every table format runs);
4. unlink the temp.

A crash before step 3 leaves orphan data/temp files that no manifest
references — readers never see them (pinned), and the next commit is
unaffected. A torn manifest is impossible: readers only open
``_v{N}.json`` names, which come into existence atomically complete.

Schema contract: append validates the incoming frame's schema against
the latest manifest (same column names + types, any order) — silent
drift is an error, the Delta posture. Overwrite may change schema
(it starts a new lineage of data dirs; old versions keep theirs).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_RE = "_v{n}.json"


def _manifest_name(n: int) -> str:
    return f"_v{n}.json"


def list_versions(table_dir: str) -> list[int]:
    """Committed version numbers, ascending. Temps (_tmp-*) and data
    dirs are never versions."""
    try:
        names = os.listdir(table_dir)
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        if n.startswith("_v") and n.endswith(".json"):
            try:
                out.append(int(n[2:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(table_dir: str, version: int) -> dict:
    path = os.path.join(table_dir, _manifest_name(version))
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no committed version {version} at {table_dir} "
            f"(have {list_versions(table_dir)})"
        )
    with open(path) as f:
        return json.load(f)


def _schema_key(df: DataFrame) -> list[list[str]]:
    """Order-insensitive (name, type) signature."""
    return sorted([f.name, f.dataType.simpleString()] for f in df.schema.fields)


def write_version(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    max_attempts: int = 20,
) -> int:
    """Commit ``df`` as a new version; returns the version number.

    mode='append': the new version = previous version's data dirs +
    this commit's (schema-validated against the latest version).
    mode='overwrite': the new version = this commit's dir only (a new
    lineage; prior versions stay readable)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(table_dir, exist_ok=True)
    token = uuid.uuid4().hex[:12]
    rel_dir = os.path.join("data", f"commit-{token}")
    df.write.mode("overwrite").parquet(os.path.join(table_dir, rel_dir))
    n_rows = df.sparkSession.read.parquet(
        os.path.join(table_dir, rel_dir)
    ).count()

    for _attempt in range(max_attempts):
        versions = list_versions(table_dir)
        nxt = (versions[-1] + 1) if versions else 0
        if mode == "append" and versions:
            prev = _read_manifest(table_dir, versions[-1])
            if prev["schema"] != _schema_key(df):
                raise ValueError(
                    "append schema mismatch vs latest version: "
                    f"{prev['schema']} != {_schema_key(df)} — overwrite "
                    "to change schema"
                )
            dirs = list(prev["data_dirs"]) + [rel_dir]
            total = prev["n_rows"] + n_rows
        else:
            dirs = [rel_dir]
            total = n_rows
        manifest = {
            "version": nxt,
            "mode": mode,
            "data_dirs": dirs,
            "n_rows": total,
            "n_rows_commit": n_rows,
            "schema": _schema_key(df),
        }
        tmp = os.path.join(table_dir, f"_tmp-v{nxt}-{token}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        final = os.path.join(table_dir, _manifest_name(nxt))
        try:
            os.link(tmp, final)  # atomic claim: fails iff nxt is taken
            os.unlink(tmp)
            return nxt
        except FileExistsError:
            os.unlink(tmp)  # lost the race — recompute against the winner
            continue
    raise RuntimeError(
        f"could not claim a version after {max_attempts} attempts "
        f"(extreme commit contention on {table_dir})"
    )


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the exact row set of ``version`` (default:
    latest). Reads only the manifest's data dirs — orphans from
    crashed commits are invisible by construction."""
    versions = list_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no committed versions at {table_dir}")
    v = versions[-1] if version is None else version
    man = _read_manifest(table_dir, v)
    paths = [os.path.join(table_dir, d) for d in man["data_dirs"]]
    return spark.read.parquet(*paths)


def diff_versions(
    spark: SparkSession, table_dir: str, v_old: int, v_new: int
) -> dict[str, int]:
    """Row-multiset diff between two committed versions (the #161
    snapshot-diff read over time-travel frames): rows added, removed,
    and the net count change."""
    old = read_version(spark, table_dir, v_old)
    new = read_version(spark, table_dir, v_new)
    added = new.exceptAll(old).count()
    removed = old.exceptAll(new).count()
    return {
        "added": added,
        "removed": removed,
        "n_rows_old": old.count(),
        "n_rows_new": new.count(),
    }
