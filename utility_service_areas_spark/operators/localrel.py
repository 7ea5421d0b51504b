"""Small driver-side literal/collected row sets as LOCAL relations.

The list overload of ``spark.createDataFrame`` plans as a parallelized
PythonRDD pickle stage: ``defaultParallelism`` pickle tasks whose
worker pool has its own PythonWorkerFactory key, so the first query to
hit it in a session pays a fresh Python daemon start (plus the
preload-import storm) with every task slot blocked — measured in-bench
as 7-9 s of pure wait on a 32-task stage, charged to whichever query
ran first. Routing the same rows through pandas/Arrow instead plans as
a ``LocalTableScan``: no job, no Python workers, and exact-size
statistics (a literal dim auto-broadcasts without a hint; an
RDD-backed frame reports defaultSizeInBytes and does not).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession


def local_df(
    spark: SparkSession,
    rows: Iterable[tuple] | Sequence[tuple],
    schema,
) -> DataFrame:
    """``createDataFrame`` for small literal frames, planned as a
    LocalTableScan via pandas/Arrow. ``schema`` is a DDL string, a
    StructType, or a plain column-name list (type inference then
    matches the list path: ints → long, strs → string). Falls back to
    the stock list path if the pandas/Arrow conversion declines
    (exotic nested literals) — values are identical either way.
    """
    rows = list(rows)
    try:
        import pandas as pd

        if isinstance(schema, str):
            from pyspark.sql.types import _parse_datatype_string

            st = _parse_datatype_string(schema)
            if not rows:
                return _empty_local(spark, st)
            names = [f.name for f in st.fields]
            pdf = pd.DataFrame.from_records(rows, columns=names)
            return spark.createDataFrame(pdf, schema=schema)
        if isinstance(schema, (list, tuple)):
            pdf = pd.DataFrame.from_records(rows, columns=list(schema))
            # Parity with the stock list path (ADVICE r17): a None in
            # an integer column makes pandas infer float64 (b=2.0,
            # type double) where createDataFrame(list) infers bigint
            # with nulls. Re-type such columns as nullable Int64 —
            # Arrow maps that to int64 + validity, i.e. bigint.
            for i, col in enumerate(pdf.columns):
                if pdf[col].dtype == "float64" and all(
                    v is None
                    or (isinstance(v, int) and not isinstance(v, bool))
                    for v in (r[i] for r in rows)
                ):
                    pdf[col] = pdf[col].astype("Int64")
            return spark.createDataFrame(pdf)
        if not rows:
            return _empty_local(spark, schema)
        names = [f.name for f in schema.fields]
        pdf = pd.DataFrame.from_records(rows, columns=names)
        return spark.createDataFrame(pdf, schema=schema)
    except Exception:  # pragma: no cover - conversion fallback
        return spark.createDataFrame(rows, schema)


def _empty_local(spark: SparkSession, st) -> DataFrame:
    """Zero-row frame of the given StructType without an RDD: pyspark
    routes an EMPTY pandas frame back to the pickle path, so build it
    as typed null projections over range(0) (pure JVM, zero rows).

    The null-cast projection is inherently nullable, so a declared
    nullable=false field would silently widen (ADVICE r17) — those
    rare frames take the stock path instead, which preserves the exact
    schema (zero rows: the pickle stage costs nothing to execute)."""
    from pyspark.sql import functions as F

    if any(not f.nullable for f in st.fields):
        return spark.createDataFrame([], st)
    return spark.range(0).select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in st.fields]
    )
