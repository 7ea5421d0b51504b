"""Text analysis operators (SURVEY.md §2.4): language-ID heuristic,
quality scoring, token counting, document fingerprinting. All but the
fingerprint are pure JVM Column expressions (no UDF on the hot path);
each is exactly mirrorable in ANSI SQL for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from utility_service_areas_spark.functions.hashing import winnow_fingerprints
from utility_service_areas_spark.functions.textops import BPE_RE, STOPWORDS, tokens


def token_counts(text: Column) -> tuple[Column, Column]:
    """(whitespace token count, BPE-ish subword count), both BIGINT."""
    ws = F.size(tokens(text)).cast("long")
    bpe = F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_RE), 0)).cast("long")
    return ws, bpe


def stopword_hits(text: Column) -> Column:
    """Occurrences (not distinct) of stopword tokens, BIGINT."""
    return F.size(
        F.filter(tokens(text), lambda t: t.isin(*STOPWORDS))
    ).cast("long")


def lang_guess(text: Column, en_threshold: float = 0.08) -> Column:
    """n-gram-free language-ID heuristic: English stopword density.

    A real deployment plugs a trained model in here; the operator
    contract (text → label, JVM-side, no shuffle) is what matters for
    the pipeline shape.
    """
    n = F.size(tokens(text))
    ratio = stopword_hits(text) / F.greatest(n, F.lit(1))
    return F.when(ratio >= en_threshold, F.lit("en")).otherwise(F.lit("other"))


def quality_score_micros(text: Column) -> Column:
    """Composite quality score in micros-bigint.

    0.4·alpha_ratio + 0.3·min(1, n_tokens/100) + 0.3·distinct_ratio —
    length-, punctuation- and repetition-sensitive, the standard
    cheap pre-filter in front of expensive LLM-data stages. All
    components are integer-derived doubles, so Spark and the SQL
    oracle agree bitwise before rounding.
    """
    tok = tokens(text)
    n = F.size(tok).cast("double")
    n_distinct = F.size(F.array_distinct(tok)).cast("double")
    alpha = F.length(F.regexp_replace(F.lower(text), r"[^a-z]", "")).cast("double")
    chars = F.greatest(F.length(text), F.lit(1)).cast("double")
    score = (
        0.4 * (alpha / chars)
        + 0.3 * F.least(F.lit(1.0), n / 100.0)
        + 0.3 * (n_distinct / F.greatest(n, F.lit(1.0)))
    )
    # floor(x + 0.5), NOT round(x): Spark's round() goes through
    # BigDecimal HALF_UP on the shortest-decimal rendering while
    # DuckDB's std::round works on the binary double — they can
    # disagree on .5-boundary docs. floor(+0.5) is pure binary-double
    # arithmetic, engine-identical by construction (score >= 0 always,
    # so the negative-value asymmetry of floor(+0.5) never applies).
    return F.floor(score * 1_000_000 + 0.5).cast("long")


def fingerprint_docs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Winnowing fingerprints per doc (Arrow-batched UDF; the rolling
    window min is not expressible with built-ins). Returns
    (doc_id, n_fingerprints, min_fingerprint) plus the full set.
    """
    fp = winnow_fingerprints(F.col(text_col))
    return df.select(
        F.col(id_col),
        fp.alias("fingerprints"),
    ).select(
        id_col,
        "fingerprints",
        F.size("fingerprints").cast("long").alias("n_fingerprints"),
        F.element_at(F.col("fingerprints"), 1).alias("min_fingerprint"),
    )
