"""Text expression helpers shared by the dedup/text operators.

Everything here is a pure Column expression (JVM-side, codegen) —
the hot path of a 100 TB text pipeline must not cross into Python.
The expressions are written to be exactly mirrorable in DuckDB SQL
(same tokenization regex, same 1-based indexing) so the driver's
oracle gate can verify them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokenization shared by every text operator: whitespace split of the
# trimmed text. Mirror in SQL: string_split_regex(trim(text), '[ \t\n\x0b\f\r]+').
TOKEN_SPLIT_RE = r"[ \t\n\x0b\f\r]+"

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
# Mirror in SQL: regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0b\f\r]').
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0b\f\r]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), TOKEN_SPLIT_RE)


# SQL-literal form of TOKEN_SPLIT_RE: backslashes doubled so the SQL
# parser hands the regex engine the same raw `[ \t\n\x0b\f\r]+` pattern
# the Column form passes (equivalence pinned in tests).
_TOKEN_SPLIT_SQL = r"'[ \\t\\n\\x0b\\f\\r]+'"


def tokens_sql(col: str) -> str:
    """Pre-rendered SQL string form of :func:`tokens` for hot
    construction paths (r17 batch F: building the query is real driver
    latency — one selectExpr parse beats a py4j round-trip per Column
    node). Value-identical to ``tokens(F.col(col))``."""
    return f"split(trim({col}), {_TOKEN_SPLIT_SQL})"


def shingles_sql(tok: str, k: int = 3) -> str:
    """Pre-rendered SQL string form of :func:`shingles` over an
    already-materialized token-array column named ``tok``.
    Value-identical to ``shingles(F.col(tok), k)`` (pinned in tests)."""
    grams = tok
    for j in range(1, k):
        shifted = f"slice({tok}, {j + 1}, size({tok}))"
        grams = f"zip_with({grams}, {shifted}, (x, y) -> concat_ws(' ', x, y))"
    full = f"slice({grams}, 1, greatest(size({tok}) - {k - 1}, 0))"
    return (
        f"CASE WHEN size({tok}) >= {k} THEN array_distinct({full}) "
        f"ELSE CAST(array() AS array<string>) END"
    )


def shingles(tok: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles (space-joined), 1-based like SQL.

    SQL mirror:
      list_distinct([tok[i]||' '||...||tok[i+k-1]
                     for i in generate_series(1, len(tok)-k+1)])

    Built by zipping the token array against its own k-1 shifted
    slices: each slice is evaluated once per row, so cost is O(n·k)
    string concats — the naive per-position element_at() form
    re-evaluates the (unmaterialized) token array inside the lambda
    and measured ~30× slower. Guarded: < k tokens → empty array
    (Spark's sequence() would count backwards on a negative range).
    """
    n = F.size(tok)
    grams = tok
    for j in range(1, k):
        shifted = F.slice(tok, j + 1, n)  # tokens j..end (1-based start j+1)
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat_ws(" ", a, b))
    # zip_with pads the shorter side with null and concat_ws skips
    # nulls, so tail entries degrade to short grams — cut them off.
    full = F.slice(grams, 1, F.greatest(n - (k - 1), F.lit(0)))
    return F.when(n >= k, F.array_distinct(full)).otherwise(
        F.array().cast("array<string>")
    )


def normalized_text(col: Column) -> Column:
    """Canonical form for exact dedup: lowercase, whitespace-collapsed.

    SQL mirror: trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')).
    """
    return F.trim(F.regexp_replace(F.lower(col), r"[ \t\n\x0b\f\r]+", " "))


def minhash_col(shingle: Column, seed: int) -> Column:
    """One MinHash component: lexicographic min of seeded md5 hex.

    md5 is a JVM builtin on both Spark and DuckDB, so an entire
    MinHash signature is computed without any Python UDF — the 100 TB
    hot path stays in whole-stage codegen.
    SQL mirror: min(md5('<seed>:' || s)).
    """
    return F.min(F.md5(F.concat(F.lit(f"{seed}:"), shingle)))
