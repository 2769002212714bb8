"""The fetch interface (S3): pluggable page fetchers, all returning the
same ``FETCH_SCHEMA`` so the crawl loop is fetcher-agnostic.

Two implementations, per SURVEY §7 ("No-network fetch"):

* :func:`table_fetcher` — fetch = inner equi-join against a
  ``web_pages(url, html)`` table.  This is what the sandboxed crawl
  (crawl.py run_round) inlines today; exposed here behind the common
  interface.
* :func:`http_fetcher` — a real network fetcher as an Arrow-batched
  ``mapInPandas`` stage: each executor task drains its URL batch with
  bounded concurrency.  Backends: ``aiohttp`` (asyncio fan-out,
  import-gated — not installed in this sandbox) and ``urllib``
  (stdlib thread pool — always available; the unit tests exercise it
  against an in-process ``http.server``, no external network).
  Reference analogue: the async crawl4ai fetch in
  crawler_service.py:52-70 — misses there set ``result.success=False``
  and are dropped from extraction; here they come back as rows with
  ``html IS NULL`` + an ``error``, which is exactly the shape the S8
  errors sink ingests (:func:`split_fetched`).

Scale notes (the part that matters at 10^10 URLs):

* The fetcher is a per-partition streaming stage — no driver-side URL
  list, no collect.  Partition count × ``concurrency`` is the global
  connection budget.
* Politeness is NOT re-implemented here: the crawl loop's O3 stage
  (robots disallow + per-host crawl-delay quota, salted top-k) decides
  WHAT enters a fetch round; the loop repartitions the round's URLs by
  host before handing them over (crawl.py run_round, fetcher branch),
  and each drain bounds in-flight requests per host at
  ``cfg.per_host`` — together one host is served by one task at
  ≤ ``per_host`` concurrency regardless of cluster width.
* Timeouts/retries are per-URL and never fail the task: a fetch stage
  at 10^10 scale WILL see every failure mode, and a poison URL must
  cost one error row, not a task retry storm.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# url echoes the input; html NULL ⇔ miss (error says why; status is the
# HTTP code when one was received, NULL for transport-level failures)
FETCH_SCHEMA = (
    "url string, html binary, status int, error string, elapsed_ms double"
)

# A Fetcher takes a DataFrame with a `url` column and returns
# FETCH_SCHEMA rows, one per input url (table_fetcher: misses omitted
# by join semantics are re-added as NULL-html rows so the contract —
# one output row per input url — holds for both implementations).
Fetcher = Callable[[DataFrame], DataFrame]


def table_fetcher(web_pages: DataFrame) -> Fetcher:
    """Fetch = LEFT equi-join against ``web_pages(url, html)``: hits
    carry the stored bytes (status 200), misses come back as
    ``html IS NULL`` error rows — the no-network implementation of the
    same contract :func:`http_fetcher` serves in deployment."""
    corpus = web_pages.select("url", F.col("html").alias("_hit_html"))

    def fetch(urls: DataFrame) -> DataFrame:
        return (
            urls.select("url")
            .join(corpus, "url", "left")
            .select(
                "url",
                F.col("_hit_html").alias("html"),
                F.when(F.col("_hit_html").isNotNull(), F.lit(200))
                .otherwise(F.lit(404)).alias("status"),
                F.when(F.col("_hit_html").isNull(),
                       F.lit("not in web_pages")).alias("error"),
                F.lit(0.0).alias("elapsed_ms"),
            )
        )

    return fetch


@dataclass(frozen=True)
class HttpFetchConfig:
    concurrency: int = 32        # in-flight requests per task
    # in-flight requests per HOST per task (0/None = uncapped).  The
    # crawl loop additionally repartitions the fetch batch by host so
    # one host lives on ONE task — together that makes `per_host` the
    # GLOBAL per-server bound regardless of cluster width (the
    # reference bounds politeness globally at 55 coroutines only
    # because it is single-process, crawler_usecase.py:29)
    per_host: int = 8
    timeout_s: float = 10.0
    max_bytes: int = 4 << 20     # oversized bodies truncated, not failed
    retries: int = 1             # extra attempts on transport errors
    user_agent: str = "doccrawler-spark/0.1"
    backend: str = "auto"        # auto | aiohttp | urllib
    # server-throttle statuses retried with backoff (all other HTTP
    # errors are final on the first response); a 429/503 Retry-After
    # header is honored when parseable, clamped to max_backoff_s
    retry_statuses: tuple[int, ...] = (429, 503)
    backoff_s: float = 0.5       # base of the exponential fallback
    max_backoff_s: float = 30.0  # clamp on Retry-After AND the fallback


def _retry_delay_s(retry_after: str | None, attempt: int,
                   cfg: HttpFetchConfig) -> float:
    """Seconds to back off before retry ``attempt`` (0-based): the
    server's Retry-After when parseable (delta-seconds or HTTP-date,
    RFC 9110 §10.2.3), else exponential from ``backoff_s``; always
    clamped to [0, max_backoff_s] — a hostile/buggy header must not
    park an executor thread for an hour."""
    delay = cfg.backoff_s * (2 ** attempt)
    if retry_after:
        try:
            delay = float(retry_after.strip())
        except ValueError:
            try:
                from email.utils import parsedate_to_datetime

                delay = (parsedate_to_datetime(retry_after).timestamp()
                         - time.time())
            except (TypeError, ValueError):
                pass
    return max(0.0, min(delay, cfg.max_backoff_s))


def _fetch_one_urllib(url: str, cfg: HttpFetchConfig):
    """One GET via stdlib urllib: returns (html, status, error).  Never
    raises — every failure mode becomes an error row.  Server-throttle
    statuses (cfg.retry_statuses: 429/503) are retried with
    Retry-After-aware backoff; the sleep happens while the caller's
    per-host semaphore slot is HELD, which is deliberate — a host
    answering 429 gets its effective concurrency reduced, not a
    different request hammered into the freed slot."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url, headers={"User-Agent": cfg.user_agent}
    )
    last_err = "unreachable"
    retries = max(0, cfg.retries)
    for attempt in range(1 + retries):
        try:
            with urllib.request.urlopen(req, timeout=cfg.timeout_s) as r:
                body = r.read(cfg.max_bytes)
                return body, int(r.status), None
        except urllib.error.HTTPError as e:  # got a response, bad code
            code = int(e.code)
            retry_after = e.headers.get("Retry-After")
            # close the error response NOW: leaving it to GC keeps the
            # socket open through the (up to max_backoff_s) sleep —
            # under sustained throttling that accumulates open fds per
            # executor thread while the per-host slot is held
            e.close()
            if code in cfg.retry_statuses and attempt < retries:
                time.sleep(_retry_delay_s(retry_after, attempt, cfg))
                continue
            return None, code, f"http {code}"
        except Exception as e:  # transport: back off, retry, report
            last_err = f"{type(e).__name__}: {e}"
            if attempt < retries:
                time.sleep(_retry_delay_s(None, attempt, cfg))
    return None, None, last_err


def _drain_urllib(urls: list[str], cfg: HttpFetchConfig):
    import threading
    from concurrent.futures import ThreadPoolExecutor
    from urllib.parse import urlsplit

    # per-host in-flight cap: one semaphore per distinct host, created
    # up front on the draining thread (workers racing a lazy dict
    # could mint two semaphores for one host and double the cap)
    sems = (
        {h: threading.Semaphore(max(1, cfg.per_host))
         for h in {urlsplit(u).netloc for u in urls}}
        if cfg.per_host else None
    )

    if sems is not None and len(sems) > 1:
        # the crawl loop repartitions by host, so a task's batch
        # arrives host-GROUPED — submitted as-is, the first
        # ``concurrency`` workers would all block on one host's
        # semaphore while other hosts' URLs queue behind them
        # (head-of-line blocking).  Round-robin interleave by host so
        # distinct hosts stay in flight while each respects per_host;
        # result order is irrelevant (rows carry their url).
        from collections import deque
        from itertools import chain, zip_longest

        by_host: dict[str, deque] = {}
        for u in urls:
            by_host.setdefault(urlsplit(u).netloc, deque()).append(u)
        urls = [u for u in chain.from_iterable(
            zip_longest(*by_host.values())) if u is not None]

    def one(u: str):
        if sems is not None:
            with sems[urlsplit(u).netloc]:
                t0 = time.monotonic()
                html, status, err = _fetch_one_urllib(u, cfg)
        else:
            t0 = time.monotonic()
            html, status, err = _fetch_one_urllib(u, cfg)
        return u, html, status, err, (time.monotonic() - t0) * 1e3

    with ThreadPoolExecutor(max_workers=max(1, cfg.concurrency)) as ex:
        return list(ex.map(one, urls))


def _drain_aiohttp(urls: list[str], cfg: HttpFetchConfig):
    """asyncio+aiohttp fan-out: one event loop per batch, a semaphore
    bounding in-flight requests.  Import-gated — callers reach this
    only when aiohttp is installed (backend='aiohttp' raises otherwise,
    'auto' falls back to urllib)."""
    import asyncio

    import aiohttp  # noqa: F401  (import-gated dependency)

    async def one(session, sem, u: str):
        t0 = time.monotonic()
        last_err = "unreachable"
        retries = max(0, cfg.retries)
        for attempt in range(1 + retries):
            try:
                async with sem, session.get(u) as r:
                    body = await r.content.read(cfg.max_bytes)
                    if (int(r.status) in cfg.retry_statuses
                            and attempt < retries):
                        delay = _retry_delay_s(
                            r.headers.get("Retry-After"), attempt, cfg)
                    elif r.status >= 400:
                        return (u, None, int(r.status),
                                f"http {r.status}",
                                (time.monotonic() - t0) * 1e3)
                    else:
                        return (u, body, int(r.status), None,
                                (time.monotonic() - t0) * 1e3)
                # backoff OUTSIDE the connection context (the pooled
                # connection goes back) but inside the loop.  Unlike
                # the urllib drain, the per-host bound here lives at
                # the connector pool, so a backing-off coroutine does
                # NOT hold its host slot — the throttled host's
                # concurrency is not reduced during the wait, only
                # this one request is delayed.
                await asyncio.sleep(delay)
            except Exception as e:
                last_err = f"{type(e).__name__}: {e}"
                if attempt < retries:
                    await asyncio.sleep(_retry_delay_s(None, attempt, cfg))
        return u, None, None, last_err, (time.monotonic() - t0) * 1e3

    async def run():
        sem = asyncio.Semaphore(max(1, cfg.concurrency))
        timeout = aiohttp.ClientTimeout(total=cfg.timeout_s)
        # connector enforces the per-host bound at the connection pool
        # (limit_per_host=0 is aiohttp's "uncapped")
        connector = aiohttp.TCPConnector(
            limit=max(1, cfg.concurrency),
            limit_per_host=max(0, cfg.per_host or 0),
        )
        async with aiohttp.ClientSession(
            timeout=timeout, connector=connector,
            headers={"User-Agent": cfg.user_agent},
        ) as session:
            return await asyncio.gather(
                *[one(session, sem, u) for u in urls]
            )

    return asyncio.run(run())


def _resolve_backend(backend: str):
    if backend == "urllib":
        return _drain_urllib
    if backend == "aiohttp":
        import aiohttp  # noqa: F401 — raise ImportError here, clearly

        return _drain_aiohttp
    if backend == "auto":
        try:
            import aiohttp  # noqa: F401

            return _drain_aiohttp
        except ImportError:
            return _drain_urllib
    raise ValueError(f"unknown fetch backend {backend!r}")


def http_fetcher(cfg: HttpFetchConfig | None = None) -> Fetcher:
    """A real HTTP fetcher as an Arrow-batched ``mapInPandas`` stage.

    Each task drains its Arrow batches of URLs with ``cfg.concurrency``
    in-flight requests (aiohttp event loop when installed, stdlib
    thread pool otherwise) and yields FETCH_SCHEMA rows — misses as
    ``html IS NULL`` + error, never task failures.  The backend
    resolves INSIDE the task (executors decide from their own
    environment), but backend='aiohttp' is validated driver-side too so
    a missing dependency fails at construction, not mid-job."""
    cfg = cfg or HttpFetchConfig()
    _resolve_backend(cfg.backend)  # driver-side validation

    def fetch(urls: DataFrame) -> DataFrame:
        import pandas as pd

        def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            drain = _resolve_backend(cfg.backend)
            for b in batches:
                if not len(b):
                    continue
                rows = drain(list(b["url"]), cfg)
                yield pd.DataFrame(
                    rows,
                    columns=["url", "html", "status", "error",
                             "elapsed_ms"],
                )

        return urls.select("url").mapInPandas(run, schema=FETCH_SCHEMA)

    return fetch


def split_fetched(fetched: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(pages, errors): pages carry bytes onward to extraction; errors
    are the S8 sink's rows (url, status, error) — the split the
    reference makes on ``result.success`` (crawler_service.py:62-70)."""
    pages = fetched.filter(F.col("html").isNotNull()).select("url", "html")
    errors = fetched.filter(F.col("html").isNull()).select(
        "url", "status", "error"
    )
    return pages, errors
