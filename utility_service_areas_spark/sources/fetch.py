"""Distributed fetch layer with missing-placeholder semantics.

Parity: the reference's per-certificate download fan-out
(download_certificate_kml / _pdf / _chronology, R/functions.R:84-164):
open the certificate detail page, resolve the asset link
(`ViewFile.aspx` anchor), download it — and when the link is absent,
record a MISSING placeholder instead of failing; when the asset was
already downloaded, skip the network round-trip.

Spark-first shape: the driver never loops over rows. The key table
repartitions to the requested fan-out and a `mapInPandas` pass runs
the two-step fetch per row with bounded retries; each partition is a
sequential (polite) client, so total concurrency == partition count.
Already-fetched keys short-circuit via a broadcast semi-join against
the existing-assets table — the distributed analogue of the
reference's `file.exists` skip. Failures degrade to rows, never job
aborts: `status ∈ {fetched, cached, missing, error}` and the
downstream anti_join_missing query surfaces the gaps, exactly like
the reference's `data/missing-placeholder/` directory.

No network exists in this environment, so the default fetcher raises
NotImplementedError; tests (and any networked deployment) inject a
callable. The plumbing — schema, fan-out, retry, placeholder rows —
is real and tested.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

Fetcher = Callable[[str], bytes]
LinkResolver = Callable[[bytes], str | None]

FETCH_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("url", StringType()),
        StructField("status", StringType()),  # fetched | cached | missing | error
        StructField("n_attempts", IntegerType()),
        StructField("content", BinaryType()),
        StructField("error", StringType()),
    ]
)


def default_fetcher(url: str) -> bytes:
    """Placeholder for an HTTP GET. This sandbox has no network access;
    deployments inject e.g. a `urllib`/`requests`-backed callable."""
    raise NotImplementedError(
        "no network in this environment — pass fetcher= explicitly"
    )


def _retrying(fetcher: Fetcher, url: str, max_retries: int, backoff_s: float):
    """(bytes | None, attempts, last_error) with bounded retries."""
    err = None
    for attempt in range(1, max_retries + 1):
        try:
            return fetcher(url), attempt, None
        except Exception as e:  # noqa: BLE001 — any transport error retries
            err = f"{type(e).__name__}: {e}"
            if attempt < max_retries and backoff_s > 0:
                time.sleep(backoff_s * (2 ** (attempt - 1)))
    return None, max_retries, err


def fetch_assets(
    keys: DataFrame,
    key_col: str,
    url_col: str,
    fetcher: Fetcher = default_fetcher,
    link_resolver: LinkResolver | None = None,
    existing: DataFrame | None = None,
    max_retries: int = 3,
    backoff_s: float = 0.0,
    fanout: int | None = None,
) -> DataFrame:
    """Fetch one asset per key row; returns FETCH_SCHEMA rows.

    Two-step when ``link_resolver`` is given (reference flow: detail
    page → find `ViewFile.aspx` link → download; resolver returning
    None ⇒ status='missing', parity R/functions.R:100-108). One-step
    (url fetched directly) otherwise. ``existing`` (any DataFrame with
    ``key_col``) marks keys as status='cached' without touching the
    fetcher — broadcast join, no per-row existence checks.
    """
    plan = keys.select(
        F.col(key_col).cast("string").alias("key"), F.col(url_col).alias("url")
    )
    if existing is not None:
        have = existing.select(F.col(key_col).cast("string").alias("key")).distinct()
        plan = plan.join(
            F.broadcast(have.withColumn("__cached", F.lit(True))), "key", "left"
        )
    else:
        plan = plan.withColumn("__cached", F.lit(None).cast("boolean"))
    if fanout:
        plan = plan.repartition(fanout)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                key, url = row["key"], row["url"]
                # Arrow may surface the nullable boolean as pd.NA
                # (bool(pd.NA) raises); treat any non-True as uncached.
                if pd.notna(row["__cached"]) and bool(row["__cached"]):
                    out.append((key, url, "cached", 0, None, None))
                    continue
                blob, attempts, err = _retrying(fetcher, url, max_retries, backoff_s)
                if blob is None:
                    out.append((key, url, "error", attempts, None, err))
                    continue
                if link_resolver is not None:
                    asset_url = link_resolver(blob)
                    if asset_url is None:
                        # Reference: placeholder file in missing-placeholder/
                        out.append((key, url, "missing", attempts, None, None))
                        continue
                    blob2, attempts2, err2 = _retrying(
                        fetcher, asset_url, max_retries, backoff_s
                    )
                    if blob2 is None:
                        out.append(
                            (key, asset_url, "error", attempts + attempts2, None, err2)
                        )
                        continue
                    out.append((key, asset_url, "fetched", attempts + attempts2, blob2, None))
                else:
                    out.append((key, url, "fetched", attempts, blob, None))
            yield pd.DataFrame(
                out, columns=["key", "url", "status", "n_attempts", "content", "error"]
            )

    return plan.mapInPandas(run, FETCH_SCHEMA)


def missing_assets(fetched: DataFrame) -> DataFrame:
    """The rows downstream must treat as placeholders (parity: the
    reference's `data/missing-placeholder/*-MISSING.txt` listing)."""
    return fetched.filter(F.col("status").isin("missing", "error")).select(
        "key", "url", "status", "error"
    )
