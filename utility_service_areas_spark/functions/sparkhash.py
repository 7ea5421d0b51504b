"""Driver/planner-side replica of Spark's ``xxhash64`` expression.

Purpose (r16): BUCKET PRUNING in the versioned-table DataSource —
``write_version_bucketed`` lays a table out in ``pmod(xxhash64(keys),
n_buckets)`` hash buckets, so an equality predicate on the bucket key
determines its bucket *at plan time*... if the planner can evaluate
Spark's hash. The Python DataSource planner runs in a session-less
subprocess (no JVM, no Spark jobs), so the hash is replicated here in
pure Python and PINNED against ``F.xxhash64`` over randomized values
of every supported type (tests/test_sparkhash.py) — a drifted replica
fails the pin, never silently mis-prunes (and pruning is only an
optimization: a wrong bucket would drop rows, which is exactly why the
pin is exhaustive across types, signs, and chaining).

Algorithm: XXH64 (Yann Collet's public xxHash, the same public spec
Spark's ``XxHash64Function`` implements) with Spark's conventions:
seed 42, integer types hashed as little-endian signed bytes (8 for
long, 4 for int/date-days), strings as UTF-8 bytes, multi-column
hashing chained by feeding each column's hash as the next seed, and
NULL columns skipped (the seed passes through).
"""

from __future__ import annotations

import datetime

_M = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int) -> int:
    """Unsigned XXH64 of ``data`` with ``seed`` (the public spec)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


_EPOCH = datetime.date(1970, 1, 1)

# sql simpleString -> byte encoder (None value = column skipped, per
# Spark's null convention)
_ENCODERS = {
    "bigint": lambda v: int(v).to_bytes(8, "little", signed=True),
    "long": lambda v: int(v).to_bytes(8, "little", signed=True),
    "int": lambda v: int(v).to_bytes(4, "little", signed=True),
    "integer": lambda v: int(v).to_bytes(4, "little", signed=True),
    "smallint": lambda v: int(v).to_bytes(4, "little", signed=True),
    "tinyint": lambda v: int(v).to_bytes(4, "little", signed=True),
    "string": lambda v: str(v).encode("utf-8"),
    "date": lambda v: (v - _EPOCH).days.to_bytes(4, "little", signed=True),
    "boolean": lambda v: (1 if v else 0).to_bytes(4, "little", signed=True),
}


def supported_hash_type(sql_type: str) -> bool:
    return sql_type in _ENCODERS


def spark_xxhash64(values: list[tuple[object, str]], seed: int = 42) -> int:
    """Spark's ``F.xxhash64(col1, col2, ...)`` evaluated driver-side:
    ``values`` is [(value, sql_simple_type), ...] in column order. The
    result is SIGNED 64-bit, exactly Spark's. Raises KeyError for an
    unsupported type — callers treat that as 'cannot prune'."""
    h = seed
    for value, sql_type in values:
        if value is None:
            continue  # Spark skips null columns: the seed passes through
        h = xxh64(_ENCODERS[sql_type](value), h)
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_hash_bucket(
    values: list[tuple[object, str]], n_buckets: int
) -> int:
    """``pmod(xxhash64(cols), n_buckets)`` — the bucket id
    ``write_version_bucketed``/``merge_version`` assign (versioned.py
    ``_bucket_of``), evaluated at plan time."""
    return spark_xxhash64(values) % n_buckets
