"""Web-scrape source (SURVEY §2.1 IO22, EP1).

The reference drives headless Firefox via Selenium spiders
(``neulix_dataflow/spiders/base_spider.py:5-16``; Wikipedia/LinkedIn
variants at ``example_spider.py:3-8`` / ``linkedin_spider.py:3-8``) from
Airflow DAGs, extracting page titles.

Spark-first shape: a URL column fans out to executor-side fetches via
Arrow-batched ``mapInPandas`` — the fetch itself stays outside Catalyst
(it is IO, not relational work), but the fan-out, retry bookkeeping, and
result schema are engine concerns and are real here. The fetcher is
injectable: production plugs Selenium/requests in; this container has
neither, so the default is a clearly-marked deterministic stub (and the
Selenium path raises NotImplementedError until a driver binary exists).
"""

from __future__ import annotations

import hashlib
import re
import urllib.error
import urllib.request
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FETCH_SCHEMA_SUFFIX = [
    T.StructField("status", T.IntegerType()),
    T.StructField("title", T.StringType()),
    T.StructField("content_sha256", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
]


def stub_fetch(url: str) -> tuple[int, str, bytes]:
    """STUB fetcher — no Selenium/geckodriver/requests in this container.
    Returns deterministic fake (status, title, body) derived from the
    URL so the distributed plumbing is testable end-to-end. Swap for
    ``selenium_fetch`` / an HTTP client in a real deployment."""
    digest = hashlib.sha256(url.encode("utf-8")).hexdigest()
    return 200, f"title:{digest[:12]}", digest.encode("ascii")


_TITLE_RE = re.compile(rb"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)


def http_fetch(url: str, timeout: float = 30.0) -> tuple[int, str, bytes]:
    """Non-Selenium fetch path (stdlib urllib — no browser binary needed):
    GET the URL, extract ``<title>`` with a regex, return
    ``(status, title, body)``. This is the usable default for IO22 in
    environments without geckodriver; it covers the reference spiders'
    actual extraction (page title, ``base_spider.py:5-16``) for
    static pages. JS-rendered pages still need ``selenium_fetch``.

    Network errors yield a synthetic status (0 for transport failures,
    the HTTP code for 4xx/5xx) instead of raising — one bad URL must not
    kill a 10k-URL partition task.
    """
    req = urllib.request.Request(url, headers={"User-Agent": "neulix-datahub-spark/IO22"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read()
            status = resp.status
    except urllib.error.HTTPError as e:
        return e.code, "", e.read() if e.fp else b""
    except (urllib.error.URLError, OSError, ValueError):
        return 0, "", b""
    m = _TITLE_RE.search(body)
    title = m.group(1).decode("utf-8", errors="replace").strip() if m else ""
    return status, title, body


def selenium_fetch(url: str) -> tuple[int, str, bytes]:
    """The reference's fetch path (headless Firefox, ``base_spider.py:6-9``
    → ``driver.title``). Requires selenium + geckodriver on every
    executor; not available here."""
    raise NotImplementedError(
        "selenium/geckodriver not present in this environment; "
        "inject stub_fetch or an HTTP fetcher instead"
    )


def fetch_url_column(
    df: DataFrame,
    url_col: str = "url",
    fetcher: Callable[[str], tuple[int, str, bytes]] = stub_fetch,
) -> DataFrame:
    """IO22: executor-side page fetch over a URL column.

    Output = input columns + (status, title, content_sha256, n_bytes).
    Each Arrow batch is fetched sequentially within a task; parallelism
    comes from partitioning the URL list (``df.repartition(n)`` before
    calling — fetch latency, not CPU, is the bottleneck, so partitions
    should be sized to ~100s of URLs).
    """
    out_schema = T.StructType(list(df.schema.fields) + FETCH_SCHEMA_SUFFIX)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            results = [fetcher(u) for u in pdf[url_col]]
            yield pdf.assign(
                status=[r[0] for r in results],
                title=[r[1] for r in results],
                content_sha256=[
                    hashlib.sha256(r[2]).hexdigest() for r in results
                ],
                n_bytes=[len(r[2]) for r in results],
            )

    return df.mapInPandas(op, schema=out_schema)
