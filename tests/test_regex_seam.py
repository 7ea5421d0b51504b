"""Java-vs-RE2 regex seam property tests (VERDICT r6 task 6).

Every oracle that round-trips a Java regex through a DuckDB/RE2 mirror
is a silent divergence surface: the engines disagree on `\\s` (Java
includes \\x0B, RE2 does not — the r6 root-cause class), and could in
principle disagree on other char-class shorthand. After the r7 fix the
repo pins explicit classes everywhere; these tests feed adversarial
control / unicode-space characters through BOTH engines and assert the
mirrored expressions agree byte-for-byte, so a regression reintroducing
`\\s` (or any engine-divergent shorthand) fails here before it can flap
a driver hash.

Covered seams (functions/textops.py ↔ the plans' SQL fragments):
  - whitespace tokenization (token count)
  - normalized_text (lowercase + collapse + trim, the dedup hash input)
  - BPE_RE subword extraction count
  - text_clean's character-class strip
  - events_json_extract's '"k": <digits>' extraction
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from utility_service_areas_spark.functions.textops import (
    BPE_RE,
    TOKEN_SPLIT_RE,
    normalized_text,
    tokens,
)

# The adversarial alphabet: every char either engine's \s matches, the
# divergence char itself (\x0B), adjacent control chars, unicode spaces
# (NBSP, EN SPACE, IDEOGRAPHIC SPACE, LINE/PARA SEP, NEL), plus plain
# text so tokens exist.
_ALPHABET = st.sampled_from(
    list("ab z9.!?'-")
    + ["\t", "\n", "\x0b", "\f", "\r", "\x00", "\x1f", "\x85"]
    + [" ", " ", " ", " ", "　"]
)

_TEXTS = st.lists(
    st.text(alphabet=_ALPHABET, min_size=0, max_size=24),
    min_size=1,
    max_size=24,
)

_TOKS_SQL = "string_split_regex(trim(text, ' '), '[ \t\n\x0b\f\r]+')"


def _duck(rows: list[str], expr_sql: str):
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(rows)), "text": rows}))
    return [
        r[0] for r in con.execute(
            f"SELECT {expr_sql} FROM t ORDER BY i"
        ).fetchall()
    ]


def _spark_col(spark, rows: list[str], col):
    df = spark.createDataFrame(
        list(zip(range(len(rows)), rows)), ["i", "text"]
    )
    return [r.v for r in df.select(col.alias("v")).orderBy("i").collect()]


@given(rows=_TEXTS)
@settings(max_examples=15, deadline=None)
def test_token_count_seam(spark, rows):
    got = _spark_col(
        spark, rows, F.size(tokens(F.col("text"))).cast("long")
    )
    want = _duck(rows, f"CAST(len({_TOKS_SQL}) AS BIGINT)")
    assert got == want


@given(rows=_TEXTS)
@settings(max_examples=15, deadline=None)
def test_normalized_text_seam(spark, rows):
    got = _spark_col(spark, rows, normalized_text(F.col("text")))
    want = _duck(
        rows,
        "trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g'), ' ')",
    )
    assert got == want


@given(rows=_TEXTS)
@settings(max_examples=15, deadline=None)
def test_bpe_token_count_seam(spark, rows):
    got = _spark_col(
        spark,
        rows,
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_RE), 0)).cast(
            "long"
        ),
    )
    want = _duck(
        rows,
        "CAST(len(regexp_extract_all(lower(text),"
        " '[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0b\f\r]')) AS BIGINT)",
    )
    assert got == want


@given(rows=_TEXTS)
@settings(max_examples=15, deadline=None)
def test_text_clean_seam(spark, rows):
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 .,!?'-]", " "),
            r"[ \t\n\x0b\f\r]+",
            " ",
        )
    )
    got = _spark_col(spark, rows, cleaned)
    want = _duck(
        rows,
        "trim(regexp_replace("
        "regexp_replace(lower(text), '[^a-z0-9 .,!?''-]', ' ', 'g'),"
        " '[ \t\n\x0b\f\r]+', ' ', 'g'))",
    )
    assert got == want


@given(
    rows=st.lists(
        st.text(
            alphabet=st.sampled_from(list('k":0123456789 {}') + ["\t", "\x0b", "\n"]),
            min_size=0,
            max_size=20,
        ),
        min_size=1,
        max_size=24,
    )
)
@settings(max_examples=15, deadline=None)
def test_json_k_extract_seam(spark, rows):
    # Compare the extracted STRING (the regex seam): the production
    # query's cast-to-long is total on the events table (every props
    # has a "k") but throws under ANSI on the no-match '' here.
    pat = '"k":[ \t\n\x0b\f\r]*(\\d+)'
    got = _spark_col(spark, rows, F.regexp_extract(F.col("text"), pat, 1))
    want = _duck(
        rows,
        "regexp_extract(text, '\"k\":[ \t\n\x0b\f\r]*(\\d+)', 1)",
    )
    assert got == want


@given(
    rows=st.lists(
        st.text(
            alphabet=st.sampled_from(
                list("0123456789.-@ ax_") + ["\t", "\x0b", "　"]
            ),
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=24,
    )
)
@settings(max_examples=15, deadline=None)
def test_pii_redaction_seam(spark, rows):
    """The PII patterns (\\b, \\d, explicit classes) must redact
    identically under Java regex and RE2 — \\b/\\d are ASCII-identical
    in both engines, but this pins it against regressions."""
    from utility_service_areas_spark.plans.pipeline_queries import (
        _RE_IP,
        _RE_PHONE,
    )

    expr = F.regexp_replace(
        F.regexp_replace(F.col("text"), _RE_IP, "<IP>"), _RE_PHONE, "<PHONE>"
    )
    got = _spark_col(spark, rows, expr)
    want = _duck(
        rows,
        f"regexp_replace(regexp_replace(text, '{_RE_IP}', '<IP>', 'g'),"
        f" '{_RE_PHONE}', '<PHONE>', 'g')",
    )
    assert got == want
