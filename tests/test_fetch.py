"""Distributed fetch layer (sources/fetch.py) — fake-fetcher tests of
the reference's download fan-out semantics (R/functions.R:84-164):
link-missing → placeholder row, transient failure → retry, permanent
failure → error row, already-downloaded → cached short-circuit.

Fakes are defined INSIDE each test (no module-level helpers) so
cloudpickle ships them to the Python workers by value — a function in
this module would be pickled by reference and fail to import there.
"""

from __future__ import annotations

import pytest

from utility_service_areas_spark.sources.fetch import (
    default_fetcher,
    fetch_assets,
    missing_assets,
)


def test_two_step_fetch_and_missing_placeholder(spark):
    def fake(url: str) -> bytes:
        if url.startswith("detail://with-link/"):
            key = url.rsplit("/", 1)[1]
            return f"<a href='asset://{key}'>KMLDoc</a>".encode()
        if url.startswith("detail://no-link/"):
            return b"<html>no anchor here</html>"
        if url.startswith("asset://"):
            return b"BYTES:" + url.rsplit("/", 1)[-1].encode()
        raise ValueError(f"unknown url {url}")

    def resolve(page: bytes) -> str | None:
        text = page.decode()
        return text.split("'")[1] if "asset://" in text else None

    keys = spark.createDataFrame(
        [("8", "detail://with-link/8"), ("169", "detail://no-link/169")],
        ["certificate_number", "cpcn_url"],
    )
    out = fetch_assets(
        keys, "certificate_number", "cpcn_url", fetcher=fake, link_resolver=resolve
    )
    rows = {r.key: r for r in out.collect()}
    assert rows["8"].status == "fetched"
    assert bytes(rows["8"].content) == b"BYTES:8"
    assert rows["8"].url == "asset://8"  # final URL recorded
    assert rows["169"].status == "missing" and rows["169"].content is None
    gaps = missing_assets(out).collect()
    assert [g.key for g in gaps] == ["169"]


def test_retry_then_success_and_permanent_error(spark):
    calls: dict[str, int] = {}

    def fake(url: str) -> bytes:
        if url.startswith("flaky://"):
            n = calls.get(url, 0) + 1
            calls[url] = n
            if n < 3:
                raise ConnectionError("transient")
            return b"OK"
        raise ConnectionError("permanent")

    keys = spark.createDataFrame([("1", "flaky://a"), ("2", "dead://b")], ["k", "u"])
    # fanout=1 keeps the flaky counter inside one python worker task
    out = {
        r.key: r
        for r in fetch_assets(
            keys, "k", "u", fetcher=fake, max_retries=3, fanout=1
        ).collect()
    }
    assert out["1"].status == "fetched" and out["1"].n_attempts == 3
    assert out["2"].status == "error" and out["2"].n_attempts == 3
    assert "ConnectionError" in out["2"].error


def test_cached_short_circuit(spark):
    def exploding(url: str) -> bytes:
        if "8" in url:
            raise AssertionError("cached key must not hit the fetcher")
        if url.startswith("detail://with-link/"):
            key = url.rsplit("/", 1)[1]
            return f"<a href='asset://{key}'>KMLDoc</a>".encode()
        return b"BYTES:" + url.rsplit("/", 1)[-1].encode()

    def resolve(page: bytes) -> str | None:
        text = page.decode()
        return text.split("'")[1] if "asset://" in text else None

    keys = spark.createDataFrame(
        [("8", "detail://with-link/8"), ("9", "detail://with-link/9")], ["k", "u"]
    )
    existing = spark.createDataFrame([("8",)], ["k"])
    out = {
        r.key: r
        for r in fetch_assets(
            keys, "k", "u", fetcher=exploding, link_resolver=resolve, existing=existing
        ).collect()
    }
    assert out["8"].status == "cached" and out["8"].content is None
    assert out["9"].status == "fetched"


def test_default_fetcher_raises():
    with pytest.raises(NotImplementedError):
        default_fetcher("http://example.com")
