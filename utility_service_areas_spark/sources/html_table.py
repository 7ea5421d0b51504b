"""HTML-table source: distributed extraction of <table> grids from
saved HTML pages.

Parity: the reference scrapes RCA's `table.RCAGrid` grids with
rvest::html_table (R/functions.R:40-54,251-256 — certificate lists
and per-certificate chronology pages). Spark-first shape: binaryFile
scan → mapInPandas with a stdlib HTMLParser → long-form
(path, table_idx, row_idx, cells) rows; callers project cells into
typed columns.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

HTML_TABLE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("table_idx", IntegerType()),
        StructField("table_class", StringType()),
        StructField("row_idx", IntegerType()),
        StructField("cells", ArrayType(StringType())),
    ]
)


class _TableParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__()
        self.tables: list[tuple[str, list[list[str]]]] = []
        self._depth = 0
        self._row: list[str] | None = None
        self._cell: list[str] | None = None

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self._depth += 1
            cls = dict(attrs).get("class", "")
            self.tables.append((cls, []))
        elif tag == "tr" and self._depth:
            self._row = []
        elif tag in ("td", "th") and self._row is not None:
            self._cell = []

    def handle_endtag(self, tag):
        if tag == "table" and self._depth:
            self._depth -= 1
        elif tag == "tr" and self._row is not None:
            self.tables[-1][1].append(self._row)
            self._row = None
        elif tag in ("td", "th") and self._cell is not None:
            self._row.append(" ".join("".join(self._cell).split()))
            self._cell = None

    def handle_data(self, data):
        if self._cell is not None:
            self._cell.append(data)


def parse_html_tables_bytes(path: str, blob: bytes) -> list[dict]:
    parser = _TableParser()
    try:
        parser.feed(blob.decode("utf-8", errors="replace"))
    except Exception:
        return []
    rows = []
    for t_idx, (cls, trs) in enumerate(parser.tables):
        for r_idx, cells in enumerate(trs):
            rows.append(
                {
                    "path": path,
                    "table_idx": t_idx,
                    "table_class": cls,
                    "row_idx": r_idx,
                    "cells": cells,
                }
            )
    return rows


def read_html_tables(spark: SparkSession, path_glob: str) -> DataFrame:
    binary = spark.read.format("binaryFile").load(path_glob)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                out.extend(parse_html_tables_bytes(row["path"], row["content"]))
            yield pd.DataFrame(
                out,
                columns=["path", "table_idx", "table_class", "row_idx", "cells"],
            )

    return binary.select("path", "content").mapInPandas(parse, HTML_TABLE_SCHEMA)
