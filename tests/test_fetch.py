"""The fetch interface (S3): table-join and HTTP implementations must
serve the same FETCH_SCHEMA contract — one row per input url, misses
as NULL-html error rows (the S8 shape), never task failures.

The HTTP tests run against an in-process ``http.server`` on
127.0.0.1 (sandbox-legal: executor Python workers share the host, so
the loopback server is reachable from inside mapInPandas tasks)."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F


def _page_body(i: int) -> bytes:
    return (
        f"<html><head><title>p{i}</title></head>"
        f"<body><p>deterministic body {i}</p></body></html>"
    ).encode()


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 (http.server API)
        if self.path.startswith("/page/"):
            body = _page_body(int(self.path.rsplit("/", 1)[1]))
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_error(404)

    def log_message(self, *a):  # keep pytest output clean
        pass


@pytest.fixture(scope="module")
def http_base():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_fetcher_contract(spark, http_base):
    from doccrawler_spark.fetch import (
        HttpFetchConfig,
        http_fetcher,
        split_fetched,
    )

    urls = [f"{http_base}/page/{i}" for i in range(10)]
    urls.append(f"{http_base}/missing")          # HTTP 404
    urls.append("http://127.0.0.1:1/refused")    # transport failure
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    fetch = http_fetcher(HttpFetchConfig(
        backend="urllib", concurrency=8, timeout_s=5, retries=0,
    ))
    rows = {r["url"]: r for r in fetch(df).collect()}

    assert set(rows) == set(urls)  # one row per input url
    for i in range(10):
        r = rows[f"{http_base}/page/{i}"]
        assert bytes(r["html"]) == _page_body(i)
        assert r["status"] == 200 and r["error"] is None
        assert r["elapsed_ms"] >= 0.0
    miss = rows[f"{http_base}/missing"]
    assert miss["html"] is None and miss["status"] == 404
    assert "404" in miss["error"]
    refused = rows["http://127.0.0.1:1/refused"]
    assert refused["html"] is None and refused["status"] is None
    assert refused["error"]

    pages, errors = split_fetched(fetch(df))
    assert pages.count() == 10
    err_rows = {r["url"] for r in errors.collect()}
    assert err_rows == {f"{http_base}/missing",
                        "http://127.0.0.1:1/refused"}


def test_http_fetcher_oversize_truncated(spark, http_base):
    """max_bytes truncates, never fails: a page bigger than the cap
    comes back as its first max_bytes bytes with status 200."""
    from doccrawler_spark.fetch import HttpFetchConfig, http_fetcher

    df = spark.createDataFrame([(f"{http_base}/page/3",)], "url string")
    fetch = http_fetcher(HttpFetchConfig(
        backend="urllib", max_bytes=10, retries=0,
    ))
    r = fetch(df).collect()[0]
    assert bytes(r["html"]) == _page_body(3)[:10]
    assert r["status"] == 200


def test_table_fetcher_same_contract(spark):
    from doccrawler_spark.fetch import table_fetcher

    web = spark.createDataFrame(
        [("https://a/1", bytearray(b"<p>one</p>"))], "url string, html binary"
    )
    urls = spark.createDataFrame(
        [("https://a/1",), ("https://a/2",)], "url string"
    )
    rows = {r["url"]: r for r in table_fetcher(web)(urls).collect()}
    assert bytes(rows["https://a/1"]["html"]) == b"<p>one</p>"
    assert rows["https://a/1"]["status"] == 200
    assert rows["https://a/2"]["html"] is None
    assert rows["https://a/2"]["status"] == 404
    assert rows["https://a/2"]["error"]


def _tiny_web(spark):
    from doccrawler_spark.webgen import gen_seeds, tiny_spec, web_pages_pandas

    spec = tiny_spec()
    pdf = web_pages_pandas(spec)
    web = spark.createDataFrame(
        pdf,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    seeds = [s["seed_url"] for s in gen_seeds(spec)]
    return web, seeds, {r.url: bytes(r.html) for r in pdf.itertuples()}


def _crawl_seen(spark, web, seeds, root, **cfg_kw):
    from doccrawler_spark.crawl import CrawlConfig, crawl, seen_all

    cat = crawl(spark, web, seeds, root, CrawlConfig(max_depth=3, **cfg_kw))
    return {
        (r["url"], r["round"], r["depth"])
        for r in seen_all(spark, cat).collect()
    }


def test_crawl_with_table_fetcher_equals_default(spark, tmp_path):
    """The fetcher seam must be invisible: a crawl through
    cfg.fetcher=table_fetcher(web) produces the identical seen set to
    the inlined fetch join."""
    from doccrawler_spark.fetch import table_fetcher

    web, seeds, _ = _tiny_web(spark)
    base = _crawl_seen(spark, web, seeds, str(tmp_path / "default"))
    via = _crawl_seen(spark, web, seeds, str(tmp_path / "fetcher"),
                      fetcher=table_fetcher(web))
    assert base and via == base


def test_crawl_over_real_http(spark, tmp_path, http_base):
    """Deployment-shape e2e: the SAME tiny web served by a real HTTP
    server, crawled through http_fetcher (mapInPandas, loopback) with
    web_pages=None — identical seen set to the no-network join crawl.
    URLs are tunneled as hex so the synthetic https://… authority maps
    onto the loopback server without DNS."""
    from doccrawler_spark.fetch import HttpFetchConfig, http_fetcher

    web, seeds, page_map = _tiny_web(spark)
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        type("H", (BaseHTTPRequestHandler,), {
            "do_GET": lambda self: _serve_mapped(self, page_map),
            "log_message": lambda self, *a: None,
        }),
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base_url = f"http://127.0.0.1:{srv.server_address[1]}"
        inner = http_fetcher(HttpFetchConfig(
            backend="urllib", concurrency=16, timeout_s=10, retries=1,
        ))

        def rewriting_fetcher(urls):
            mapped = urls.select(
                F.col("url").alias("orig"),
                F.concat(
                    F.lit(base_url + "/u/"),
                    F.hex(F.encode(F.col("url"), "utf-8")),
                ).alias("url"),
            )
            got = inner(mapped.select("url"))
            return mapped.join(got, "url").select(
                F.col("orig").alias("url"),
                "html", "status", "error", "elapsed_ms",
            )

        expect = _crawl_seen(spark, web, seeds, str(tmp_path / "join"))
        got = _crawl_seen(spark, None, seeds, str(tmp_path / "http"),
                          fetcher=rewriting_fetcher)
        assert expect and got == expect
    finally:
        srv.shutdown()


def _serve_mapped(handler, page_map):
    if handler.path.startswith("/u/"):
        try:
            url = bytes.fromhex(handler.path[3:]).decode()
        except ValueError:
            handler.send_error(400)
            return
        body = page_map.get(url)
        if body is not None:
            handler.send_response(200)
            handler.send_header("Content-Length", str(len(body)))
            handler.end_headers()
            handler.wfile.write(body)
            return
    handler.send_error(404)


def test_aiohttp_backend_is_import_gated():
    """backend='aiohttp' must fail at CONSTRUCTION (driver-side) when
    aiohttp is absent — not mid-job on the executors."""
    from doccrawler_spark.fetch import HttpFetchConfig, http_fetcher

    try:
        import aiohttp  # noqa: F401

        pytest.skip("aiohttp installed here; gate not exercisable")
    except ImportError:
        pass
    with pytest.raises(ImportError):
        http_fetcher(HttpFetchConfig(backend="aiohttp"))


class _CountingHandler(BaseHTTPRequestHandler):
    """Tracks, per Host header, the peak number of requests being
    served simultaneously — the server-side instrument for the
    per-host politeness cap."""

    lock = threading.Lock()
    current: dict = {}
    peak: dict = {}
    first_seen: dict = {}
    done: dict = {}
    arrival_done: dict = {}
    hold_s = 0.08

    def do_GET(self):  # noqa: N802 (http.server API)
        import time as _t

        host = self.headers.get("Host", "?")
        cls = type(self)
        with cls.lock:
            cls.current[host] = cls.current.get(host, 0) + 1
            cls.peak[host] = max(cls.peak.get(host, 0), cls.current[host])
            if host not in cls.first_seen:
                cls.first_seen[host] = _t.monotonic()
                # ordering instrument: how many requests of EVERY host
                # had fully completed when this host's first arrived —
                # scheduling-jitter-proof, unlike wall-clock spreads
                cls.arrival_done[host] = dict(cls.done)
        _t.sleep(cls.hold_s)
        body = b"<html><body>ok</body></html>"
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)
        with cls.lock:
            cls.current[host] -= 1
            cls.done[host] = cls.done.get(host, 0) + 1

    def log_message(self, *a):
        pass


@pytest.fixture()
def counting_server():
    cls = type("C", (_CountingHandler,),
               {"lock": threading.Lock(), "current": {}, "peak": {},
                "first_seen": {}, "done": {}, "arrival_done": {}})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), cls)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_address[1]}", cls
    srv.shutdown()


def test_per_host_cap_bounds_concurrency(spark, counting_server):
    """cfg.per_host is a hard bound on simultaneous requests to one
    host within a task: the loopback server never observes more than
    per_host in-flight requests, while an uncapped drain under the
    same load demonstrably overlaps more (proving the instrument —
    and the pool — actually exercise concurrency)."""
    from doccrawler_spark.fetch import HttpFetchConfig, http_fetcher

    netloc, cls = counting_server
    urls = [f"http://{netloc}/p/{i}" for i in range(24)]
    df = spark.createDataFrame([(u,) for u in urls], "url string").coalesce(1)

    fetch = http_fetcher(HttpFetchConfig(
        backend="urllib", concurrency=8, per_host=2, timeout_s=10,
        retries=0,
    ))
    assert fetch(df).count() == 24
    assert cls.peak.get(netloc, 0) <= 2

    cls.peak.clear(), cls.current.clear()
    uncapped = http_fetcher(HttpFetchConfig(
        backend="urllib", concurrency=8, per_host=0, timeout_s=10,
        retries=0,
    ))
    assert uncapped(df).count() == 24
    assert cls.peak.get(netloc, 0) > 2


def test_per_host_cap_with_host_partitioning(spark, counting_server):
    """The crawl-loop wiring: URLs repartitioned by host before the
    fetcher (one host → one task) keep EVERY host at ≤ per_host
    in-flight globally, even with several hosts in the same round.
    127.0.0.1 and localhost reach the same server but are distinct
    hosts to both the partitioner and the per-host semaphores."""
    from doccrawler_spark.fetch import HttpFetchConfig, http_fetcher

    netloc, cls = counting_server
    port = netloc.rsplit(":", 1)[1]
    hosts = [netloc, f"localhost:{port}"]
    rows = [(f"http://{h}/p/{i}", h) for h in hosts for i in range(12)]
    df = spark.createDataFrame(rows, "url string, host string")

    fetch = http_fetcher(HttpFetchConfig(
        backend="urllib", concurrency=8, per_host=2, timeout_s=10,
        retries=0,
    ))
    out = fetch(df.repartition(F.col("host")).select("url"))
    assert out.count() == 24
    for h in hosts:
        assert 1 <= cls.peak.get(h, 0) <= 2, cls.peak


def test_urllib_drain_interleaves_hosts(counting_server):
    """Head-of-line regression (r7): the crawl's host repartition hands
    a task its URL batch host-GROUPED, so a submission-order drain
    would park every pool worker on the first host's semaphore while
    the second host's URLs wait — per-host politeness accidentally
    serializing cross-host work.  The drain must interleave hosts:
    both hosts' FIRST requests arrive essentially together (not one
    full per-host drain apart), while each host still respects
    per_host.  Calls _drain_urllib directly — no Spark, pure pool."""
    from doccrawler_spark.fetch import HttpFetchConfig, _drain_urllib

    netloc, cls = counting_server
    port = netloc.rsplit(":", 1)[1]
    hosts = [netloc, f"localhost:{port}"]
    # host-grouped batch: all of host A, then all of host B
    urls = [f"http://{h}/p/{i}" for h in hosts for i in range(12)]
    cfg = HttpFetchConfig(backend="urllib", concurrency=8, per_host=2,
                          timeout_s=10, retries=0)
    rows = _drain_urllib(urls, cfg)
    assert len(rows) == 24 and all(r[2] == 200 for r in rows)
    for h in hosts:
        assert 1 <= cls.peak.get(h, 0) <= 2, cls.peak
    # ORDERING assertion (r8, replacing a wall-clock spread that could
    # flake under CI scheduling jitter): serialized head-of-line would
    # start host B only after most of host A's 12 requests COMPLETED
    # (8 pool workers all parked on A first); interleaved submission
    # starts each host's first request before the other host has
    # finished even half its batch.
    for h, other in (hosts, hosts[::-1]):
        finished_first = cls.arrival_done[h].get(other, 0)
        assert finished_first < 6, (
            f"{other} completed {finished_first}/12 before {h}'s first "
            f"request arrived (head-of-line)")

# ---------------------------------------------------------------------------
# server-throttle retries (429/503 + Retry-After)


@pytest.fixture()
def throttle_server():
    """Fresh per-test server: a path ``/t<k>/...`` answers its first k
    requests with 429 + ``Retry-After: 0``, then 200; everything else
    404s.  Request counts per path are exposed for assertions."""
    import re

    counts: dict[str, int] = {}
    lock = threading.Lock()

    class H(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (http.server API)
            with lock:
                counts[self.path] = n = counts.get(self.path, 0) + 1
            m = re.match(r"^/t(\d+)/", self.path)
            if m is None:
                self.send_error(404)
                return
            if n <= int(m.group(1)):
                self.send_response(429)
                self.send_header("Retry-After", "0")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            body = b"ok:" + self.path.encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", counts
    srv.shutdown()


def test_throttle_status_retried_then_ok(throttle_server):
    """A 429 with Retry-After is retried (honoring the header) and the
    eventual 200 body comes back as a normal hit row — the throttle
    never surfaces as an error when a retry attempt remains."""
    from doccrawler_spark.fetch import HttpFetchConfig, _drain_urllib

    base, counts = throttle_server
    cfg = HttpFetchConfig(backend="urllib", concurrency=4,
                          retries=2, backoff_s=0.01)
    rows = _drain_urllib([f"{base}/t1/a", f"{base}/t2/b"], cfg)
    by_path = {u.rsplit("/", 2)[-2] + "/" + u.rsplit("/", 1)[-1]:
               (html, status, err) for u, html, status, err, _ in rows}
    assert by_path["t1/a"] == (b"ok:/t1/a", 200, None)
    assert by_path["t2/b"] == (b"ok:/t2/b", 200, None)
    assert counts["/t1/a"] == 2   # one throttle + one success
    assert counts["/t2/b"] == 3   # two throttles + one success


def test_throttle_retries_exhausted_is_error_row(throttle_server):
    """When every attempt is throttled, the result is an error row with
    the throttle status — never a raised exception/task failure."""
    from doccrawler_spark.fetch import HttpFetchConfig, _drain_urllib

    base, counts = throttle_server
    cfg = HttpFetchConfig(backend="urllib", retries=1, backoff_s=0.01)
    (_, html, status, err, _), = _drain_urllib([f"{base}/t9/x"], cfg)
    assert html is None and status == 429 and err == "http 429"
    assert counts["/t9/x"] == 2   # initial + exactly `retries` attempts


def test_non_throttle_http_error_not_retried(throttle_server):
    """404 (and every status outside retry_statuses) is final on the
    first response — no retry budget burned on deterministic misses."""
    from doccrawler_spark.fetch import HttpFetchConfig, _drain_urllib

    base, counts = throttle_server
    cfg = HttpFetchConfig(backend="urllib", retries=3, backoff_s=0.01)
    (_, html, status, err, _), = _drain_urllib([f"{base}/nope"], cfg)
    assert html is None and status == 404 and err == "http 404"
    assert counts["/nope"] == 1


def test_retry_delay_parsing():
    """Retry-After forms per RFC 9110: delta-seconds, HTTP-date (past
    dates → 0), garbage → exponential fallback; everything clamped to
    max_backoff_s."""
    from doccrawler_spark.fetch import HttpFetchConfig, _retry_delay_s

    cfg = HttpFetchConfig(backoff_s=0.5, max_backoff_s=4.0)
    assert _retry_delay_s("3", 0, cfg) == 3.0
    assert _retry_delay_s(" 2 ", 0, cfg) == 2.0
    assert _retry_delay_s("0", 0, cfg) == 0.0
    assert _retry_delay_s("9999", 0, cfg) == 4.0          # clamped
    assert _retry_delay_s("Mon, 01 Jan 1990 00:00:00 GMT", 0, cfg) == 0.0
    assert _retry_delay_s(None, 0, cfg) == 0.5            # fallback
    assert _retry_delay_s(None, 2, cfg) == 2.0            # 0.5 * 2^2
    assert _retry_delay_s(None, 10, cfg) == 4.0           # clamped
    assert _retry_delay_s("not-a-date", 1, cfg) == 1.0    # fallback
