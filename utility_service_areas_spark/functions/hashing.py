"""Arrow-batched hashing UDFs for the operators whose inner loop
genuinely can't be expressed with built-in Column functions:
SimHash (bit-vote accumulation) and winnowing fingerprints (rolling
window minimum). Both are deterministic (md5-based, no RNG) so runs
are reproducible and resumable at cluster scale.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType

_MASK64 = (1 << 64) - 1


def _token_hash64(token: str) -> int:
    return int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "big")


def simhash64_py(text: str) -> int:
    """64-bit SimHash over whitespace tokens (signed int64 for Spark)."""
    votes = [0] * 64
    for tok in text.lower().split():
        h = _token_hash64(tok)
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    sig = 0
    for b in range(64):
        if votes[b] > 0:
            sig |= 1 << b
    # two's-complement into signed int64
    return sig - (1 << 64) if sig >= (1 << 63) else sig


@F.pandas_udf(LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: simhash64_py(t or ""))


def hamming64_py(a: int, b: int) -> int:
    return bin((a ^ b) & _MASK64).count("1")


@F.pandas_udf(IntegerType())
def hamming64(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [hamming64_py(int(x), int(y)) for x, y in zip(a, b)], dtype="int32"
    )


def winnow_fingerprints_py(text: str, k: int = 8, w: int = 4) -> list[int]:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    rolling char k-gram hashes, keep the min of each w-window, dedupe.
    Returns a sorted list of signed int64 fingerprints.
    """
    s = " ".join((text or "").lower().split())
    if len(s) < k:
        return []
    hashes = [
        int.from_bytes(hashlib.md5(s[i : i + k].encode()).digest()[:8], "big")
        for i in range(len(s) - k + 1)
    ]
    picked: set[int] = set()
    for i in range(max(1, len(hashes) - w + 1)):
        picked.add(min(hashes[i : i + w]))
    return sorted(x - (1 << 64) if x >= (1 << 63) else x for x in picked)


@F.pandas_udf(ArrayType(LongType()))
def winnow_fingerprints(texts: pd.Series) -> pd.Series:
    return texts.map(winnow_fingerprints_py)
