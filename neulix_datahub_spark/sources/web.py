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


def selenium_fetch(url: str, timeout: float = 15.0) -> tuple[int, str, bytes]:
    """The reference's fetch path (headless Firefox,
    ``base_spider.py:5-16``: ``Options()`` + ``--headless`` →
    ``webdriver.Firefox`` → ``driver.get`` → ``driver.title``). Builds
    the real browser when selenium + geckodriver are installed on the
    executor; raises NotImplementedError when the browser stack is
    absent (this sandbox has neither — the integration test in
    tests/test_services.py runs only under NEULIX_SELENIUM_TESTS=1).

    Returns ``(status, title, page_source_bytes)``; selenium exposes no
    HTTP status, so a successfully rendered page reports 200 — the
    reference never reads a status at all."""
    try:
        from selenium import webdriver  # type: ignore
        from selenium.webdriver.firefox.options import Options  # type: ignore
    except ImportError as exc:
        raise NotImplementedError(
            "selenium not present in this environment; "
            "inject stub_fetch or http_fetch instead"
        ) from exc
    opts = Options()
    opts.add_argument("--headless")  # base_spider.py:7
    try:
        driver = webdriver.Firefox(options=opts)
    except Exception as exc:  # geckodriver/Firefox missing or broken
        raise NotImplementedError(
            f"geckodriver/Firefox unavailable ({exc}); "
            "inject stub_fetch or http_fetch instead"
        ) from exc
    try:
        driver.set_page_load_timeout(timeout)
        driver.get(url)
        title = driver.title or ""
        body = (driver.page_source or "").encode("utf-8", errors="replace")
        return 200, title, body
    finally:
        driver.quit()


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


_HREF_RE = re.compile(rb"""<a\s[^>]*href=["']([^"'#]+)["']""", re.IGNORECASE)


def extract_links(body: bytes, base_url: str, same_host: bool = True) -> list[str]:
    """Pure-stdlib href extraction + resolution: absolute URLs out of a
    page body (urljoin handles relative paths), optionally restricted
    to the base URL's host — the polite-crawler default. Deterministic
    and dependency-free, so the crawl layer stays testable without a
    browser; swap in an HTML5 parser for adversarial markup."""
    from urllib.parse import urljoin, urlparse

    base_host = urlparse(base_url).netloc
    out: list[str] = []
    seen = set()
    for m in _HREF_RE.finditer(body):
        href = m.group(1).decode("utf-8", errors="replace").strip()
        url = urljoin(base_url, href)
        if not url.startswith(("http://", "https://")):
            continue
        if same_host and urlparse(url).netloc != base_host:
            continue
        if url not in seen:
            seen.add(url)
            out.append(url)
    return out


def fetch_and_extract(
    df: DataFrame,
    url_col: str = "url",
    fetcher: Callable[[str], tuple[int, str, bytes]] = stub_fetch,
    same_host: bool = True,
) -> DataFrame:
    """fetch_url_column + link extraction in ONE executor pass (the body
    never crosses batches, only its hash and links do) — the building
    block the crawl frontier iterates."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + FETCH_SCHEMA_SUFFIX
        + [T.StructField("links", T.ArrayType(T.StringType()))]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            results = [fetcher(u) for u in pdf[url_col]]
            yield pdf.assign(
                status=[r[0] for r in results],
                title=[r[1] for r in results],
                content_sha256=[hashlib.sha256(r[2]).hexdigest() for r in results],
                n_bytes=[len(r[2]) for r in results],
                links=[
                    extract_links(r[2], u, same_host=same_host)
                    for r, u in zip(results, pdf[url_col])
                ],
            )

    return df.mapInPandas(op, schema=out_schema)


def crawl_frontier(
    spark,
    seeds: list[str],
    fetcher: Callable[[str], tuple[int, str, bytes]] = stub_fetch,
    max_depth: int = 2,
    same_host: bool = True,
) -> DataFrame:
    """Distributed BFS crawl: each round fetches the current frontier
    in parallel (fetch_and_extract), collects the discovered links, and
    anti-joins against everything already visited — exactly-once per
    URL, breadth-first depth labels, bounded by ``max_depth`` driver
    iterations (the same bounded-loop shape as Lloyd's k-means in
    operators/clustering.py: iteration count is a CONSTANT, data volume
    per round is distributed work).

    This is the engine-side form of the reference's spider DAGs
    (``neulix_dataflow/spiders/base_spider.py`` + the Airflow loop):
    frontier management, URL dedup, and depth accounting are relational
    work — only the fetch callable is IO. At scale, checkpoint
    ``visited`` to a snapshot table per round and size frontier
    partitions to fetch latency (~100s of URLs each).

    Returns one row per fetched page: (url, depth, status, title,
    content_sha256, n_bytes).
    """
    from pyspark.sql import functions as F

    frontier = spark.createDataFrame([(u,) for u in seeds], "url string").distinct()
    pages = None
    for depth in range(max_depth + 1):
        # materialize each round ONCE (localCheckpoint truncates the
        # lineage too): without this, every later reference to `pages`
        # or the anti-join would re-run the fetchers — re-crawling the
        # whole site per round. At deployment scale, swap for a
        # snapshot-table write per round (restartable crawls).
        fetched = fetch_and_extract(
            frontier, "url", fetcher=fetcher, same_host=same_host
        ).withColumn("depth", F.lit(depth)).localCheckpoint()
        keep = fetched.select(
            "url", "depth", "status", "title", "content_sha256", "n_bytes"
        )
        pages = keep if pages is None else pages.unionByName(keep)
        if depth == max_depth:
            break
        discovered = (
            fetched.select(F.explode("links").alias("url")).distinct()
        )
        frontier = discovered.join(
            pages.select("url").distinct(), "url", "left_anti"
        )
        if frontier.isEmpty():
            break
    return pages


_SITE_MAX = 500


def stub_site_fetch(url: str) -> tuple[int, str, bytes]:
    """Deterministic synthetic SITE (not just a page): ``/page/N`` has
    title ``Page N`` and relative links to its binary-tree children
    ``2N`` and ``2N+1`` (while ≤ 500). A pure function of the URL, so a
    crawl over it is exactly reproducible — the driver oracle replays
    the reachable set with a recursive CTE. Out-of-range pages 404,
    exercising the crawl's error path."""
    m = re.search(r"/page/(\d+)$", url)
    n = int(m.group(1)) if m else 0
    if not m or n < 1 or n > _SITE_MAX:
        return 404, "", b""
    links = "".join(
        f'<a href="/page/{k}">p{k}</a>'
        for k in (2 * n, 2 * n + 1)
        if k <= _SITE_MAX
    )
    body = f"<html><title>Page {n}</title>{links}</html>".encode()
    return 200, f"Page {n}", body
