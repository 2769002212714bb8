"""Deterministic synthetic web generator (M0 — FIXTURES.md §1).

Produces the authoritative ``web_pages(url, warc_ts, html, text, lang)``
table from BASELINE.json ``input_hint`` plus the ``seeds`` table, with
no external data.  Every page is a pure function of
``(spec, site_index, page_index)`` so generation itself distributes
over Spark (``generate_web_pages_df`` uses mapInPandas over an index
range — the bench tier is never materialized on the driver).

The golden ``text`` column is computed here with the same kernels the
oracle uses: ``merge_content(extract_text(html),
extract_hidden_snippets(html))`` — the engine must reproduce it
byte-identically.

Graph properties exercised (FIXTURES.md): cycles, duplicate links,
shared URLs across sites (global seen-set, reference
src/app/state/crawler_state.py:14), chains deeper than MAX_DEPTH,
dead links (fetch misses), pages with zero links, login/signup/support
noise, non-English locale links, #fragment links, off-domain links,
hidden per-language snippet markup, robots.txt + sitemap.xml rows,
and one hot host holding the majority of URLs (skew salting).
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from .kernels.html import extract_page
from .kernels.merge import merge_content
from .kernels.urls import url_hash

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _rng(*parts) -> random.Random:
    """Process-stable RNG (md5-derived seed — ``hash()`` of str is
    randomized per process and would differ between executors)."""
    key = "|".join(str(p) for p in parts).encode("utf-8")
    return random.Random(int.from_bytes(hashlib.md5(key).digest()[:8], "big"))

_WORDS = (
    "index vector query embed chunk crawl spark shuffle partition schema "
    "frontier politeness robots snippet markdown parquet snapshot lineage "
    "broadcast join filter window topk rerank hybrid sparse dense batch"
).split()

_CODE_LANGS = ["python", "javascript", "go"]


@dataclass(frozen=True)
class SiteSpec:
    host: str
    n_pages: int
    sitemap: bool = False
    sitemap_size: int = 0
    # empty /sitemap.xml (zero <loc>) + a valid /sitemap_index.xml —
    # exercises the parse-result fallthrough (helper.py:219-225)
    sitemap_index_fallthrough: bool = False
    crawl_delay: float | None = None
    disallow: tuple[str, ...] = ()
    branching: int = 3
    extra_links: int = 2
    lang: str = "en"
    # multiplies body-text volume (bench tier uses realistic ~10 KB
    # pages; real Common-Crawl HTML is tens of KB)
    text_scale: int = 1


@dataclass(frozen=True)
class WebSpec:
    sites: tuple[SiteSpec, ...]
    seed: int = 42

    @property
    def hosts(self) -> list[str]:
        return [s.host for s in self.sites]


def tiny_spec() -> WebSpec:
    """~70 pages, 2 sites (one sitemap-mode) — unit/e2e tests."""
    return WebSpec(sites=(
        SiteSpec("docs.alpha.test", 40, branching=3, extra_links=2,
                 disallow=("/private/",), crawl_delay=None),
        SiteSpec("docs.beta.test", 30, sitemap=True, sitemap_size=12),
    ))


def small_spec() -> WebSpec:
    """~5k pages, 8 sites, one hot host with ~60% of URLs — skew tests."""
    sites = [SiteSpec("docs.hot.test", 3000, branching=6, extra_links=3,
                      disallow=("/private/",), crawl_delay=1.0)]
    for k in range(6):
        sites.append(SiteSpec(f"docs.site{k}.test", 330, branching=4))
    sites.append(SiteSpec("docs.mapped.test", 120, sitemap=True, sitemap_size=40))
    return WebSpec(sites=tuple(sites))


def bench_spec(n_pages: int = 200_000, n_sites: int = 20,
               text_scale: int = 24, branching: int = 16) -> WebSpec:
    """Bench tier: big BFS sites, one hot host (~40%), realistic
    ~23 KB pages (Common-Crawl HTML is tens of KB), branching 16 so
    the frontier reaches fleet-width rounds quickly — per-round fixed
    costs (snapshot commits, scheduling) amortize over fat rounds the
    way they do at 10^10-URL scale."""
    hot = int(n_pages * 0.4)
    rest = (n_pages - hot) // (n_sites - 1)
    sites = [SiteSpec("docs.hot.test", hot, branching=branching, extra_links=3,
                      text_scale=text_scale)]
    for k in range(n_sites - 1):
        sites.append(SiteSpec(f"docs.site{k}.test", rest, branching=branching,
                              extra_links=3, text_scale=text_scale))
    return WebSpec(sites=tuple(sites))


# ------------------------------------------------------------------ pages


def page_url(host: str, i: int) -> str:
    return f"https://{host}" if i == 0 else f"https://{host}/doc/{i}"


def seed_url(host: str) -> str:
    return f"https://{host}"


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _page_links(spec: WebSpec, s: SiteSpec, i: int) -> list[str]:
    """Deterministic outlink list for page i of site s (absolute URLs)."""
    rng = _rng(spec.seed, "links", s.host, i)
    links: list[str] = []
    # tree children — guarantees BFS layering deeper than MAX_DEPTH
    for c in range(1, s.branching + 1):
        child = i * s.branching + c
        if child < s.n_pages:
            links.append(page_url(s.host, child))
    # cycle back to parent & root (dup/cycle coverage)
    if i > 0:
        links.append(page_url(s.host, (i - 1) // s.branching))
        links.append(page_url(s.host, 0))
    # random extras (may duplicate tree links)
    for _ in range(s.extra_links):
        links.append(page_url(s.host, rng.randrange(s.n_pages)))
    # fragment variant of an existing link (F4 strip coverage)
    if links:
        links.append(links[0] + "#section-" + str(i % 5))
    # noise the rule filter must drop (F7)
    if i % 3 == 0:
        links.append(f"https://{s.host}/login")
        links.append(f"https://{s.host}/support")
    if i % 4 == 0:
        links.append(f"https://{s.host}/es/doc/{i}")  # locale page
    # off-domain + cross-site (dropped by same-domain filter F5)
    links.append("https://github.com/example/repo")
    other = spec.hosts[(i + 1) % len(spec.hosts)]
    if other != s.host:
        links.append(page_url(other, 1))
    # dead link (fetch miss) every 7th page
    if i % 7 == 0:
        links.append(f"https://{s.host}/doc/missing{i}")
    # robots-disallowed target every 5th page (if site has disallows)
    if s.disallow and i % 5 == 0:
        links.append(f"https://{s.host}/private/{i}")
    return links


def _page_html(spec: WebSpec, s: SiteSpec, i: int) -> str:
    rng = _rng(spec.seed, "html", s.host, i)
    title = f"{s.host} Documentation" if i == 0 else f"Doc {i} — {s.host}"
    parts = [f"<html><head><title>{title}</title>",
             "<script>var x = 1;</script></head><body>"]
    parts.append(f"<h1>Guide {i} for {s.host}</h1>")
    parts.append(f"<p>{_sentence(rng, 18)}.</p>")
    parts.append(f"<h2>Usage {_sentence(rng, 2)}</h2>")
    parts.append(f"<p>{_sentence(rng, 24)}.</p>")
    for k in range(s.text_scale - 1):
        parts.append(f"<h2>Section {k} {_sentence(rng, 2)}</h2>")
        parts.append(f"<p>{_sentence(rng, 60)}.</p>")
        parts.append(f"<p>{_sentence(rng, 60)}.</p>")
    if i % 2 == 0:
        parts.append("<ul><li>step " + _sentence(rng, 4) + "</li><li>then "
                     + _sentence(rng, 4) + "</li></ul>")
    # visible code block
    if i % 2 == 0:
        parts.append(
            '<pre><code class="language-python">import engine\n'
            f'engine.run("{s.host}", {i})</code></pre>'
        )
    # hidden per-language tabs (every 4th page)
    if i % 4 == 0:
        for lang in _CODE_LANGS[1:]:
            parts.append(
                f'<div style="display: none"><pre><code class="language-{lang}">'
                f'// {lang} sample {i}\nrun("{s.host}", {i})</code></pre></div>'
            )
        # duplicate hidden block — dedup coverage (seen_code_blocks)
        parts.append(
            '<div style="display:none"><pre><code class="language-javascript">'
            f'// javascript sample {i}\nrun("{s.host}", {i})</code></pre></div>'
        )
    for j, link in enumerate(_page_links(spec, s, i)):
        parts.append(f'<a href="{link}">link {j}</a>')
    parts.append(f"<p>{_sentence(rng, 12)}.</p>")
    parts.append("</body></html>")
    return "".join(parts)


def _robots_txt(s: SiteSpec) -> str:
    lines = ["User-agent: *"]
    lines += [f"Disallow: {p}" for p in s.disallow]
    if s.crawl_delay is not None:
        lines.append(f"Crawl-delay: {s.crawl_delay}")
    return "\n".join(lines) + "\n"


def _sitemap_xml(s: SiteSpec) -> str:
    locs = [page_url(s.host, i) for i in range(min(s.sitemap_size, s.n_pages))]
    body = "".join(f"<url><loc>{u}</loc></url>" for u in locs)
    return f'<?xml version="1.0"?><urlset>{body}</urlset>'


def _warc_ts(url: str) -> datetime:
    return _EPOCH + timedelta(seconds=url_hash(url) % 10_000_000)


def _special_rows(s: SiteSpec) -> list[dict]:
    rows = []
    if s.disallow or s.crawl_delay is not None:
        txt = _robots_txt(s)
        url = f"https://{s.host}/robots.txt"
        rows.append({"url": url, "warc_ts": _warc_ts(url),
                     "html": txt.encode("utf-8"), "text": txt, "lang": "en"})
    if s.sitemap:
        xml = _sitemap_xml(s)
        url = f"https://{s.host}/sitemap.xml"
        rows.append({"url": url, "warc_ts": _warc_ts(url),
                     "html": xml.encode("utf-8"), "text": xml, "lang": "en"})
    if s.sitemap_index_fallthrough:
        empty = '<?xml version="1.0"?><urlset></urlset>'
        u1 = f"https://{s.host}/sitemap.xml"
        rows.append({"url": u1, "warc_ts": _warc_ts(u1),
                     "html": empty.encode("utf-8"), "text": empty, "lang": "en"})
        xml = _sitemap_xml(s)
        u2 = f"https://{s.host}/sitemap_index.xml"
        rows.append({"url": u2, "warc_ts": _warc_ts(u2),
                     "html": xml.encode("utf-8"), "text": xml, "lang": "en"})
    return rows


def gen_page_row(spec: WebSpec, s: SiteSpec, i: int) -> dict:
    html = _page_html(spec, s, i)
    md, hidden = extract_page(html)
    text = merge_content(md, hidden)
    url = page_url(s.host, i)
    return {"url": url, "warc_ts": _warc_ts(url),
            "html": html.encode("utf-8"), "text": text, "lang": s.lang}


def _locale_rows(spec: WebSpec, s: SiteSpec) -> list[dict]:
    """Non-English pages (locale links point here; filter must drop)."""
    rows = []
    for i in range(0, s.n_pages, 4):
        url = f"https://{s.host}/es/doc/{i}"
        html = (f"<html><head><title>Doc {i} es</title></head>"
                f"<body><p>contenido {i}</p></body></html>")
        md, hidden = extract_page(html)
        rows.append({"url": url, "warc_ts": _warc_ts(url),
                     "html": html.encode("utf-8"),
                     "text": merge_content(md, hidden), "lang": "es"})
    return rows


def gen_web_pages(spec: WebSpec):
    """Iterator of all web_pages rows (driver-side; tiny/small tiers)."""
    for s in spec.sites:
        yield from _special_rows(s)
        for i in range(s.n_pages):
            yield gen_page_row(spec, s, i)
        yield from _locale_rows(spec, s)


def gen_seeds(spec: WebSpec) -> list[dict]:
    from .kernels.html import extract_title, site_id_from_title
    seeds = []
    for s in spec.sites:
        html = _page_html(spec, s, 0)
        sid = site_id_from_title(extract_title(html), seed_url(s.host))
        seeds.append({"seed_url": seed_url(s.host), "site_id": sid})
    return seeds


# ------------------------------------------------------------ spark side

WEB_PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def web_pages_pandas(spec: WebSpec):
    import pandas as pd

    return pd.DataFrame(list(gen_web_pages(spec)))


def generate_web_pages_df(spark, spec: WebSpec, slices_per_site: int = 32):
    """Distributed generation: one task per (site, slice) index range.

    Scale path: the bench/10^10 tier is produced by executors, never
    the driver — each task regenerates its page range from the pure
    per-page function.
    """
    import pandas as pd

    tasks = []
    for si, s in enumerate(spec.sites):
        n_slices = min(slices_per_site, max(1, s.n_pages // 256))
        step = -(-s.n_pages // n_slices)
        for lo in range(0, s.n_pages, step):
            tasks.append((si, lo, min(lo + step, s.n_pages)))
    tasks_df = spark.createDataFrame(tasks, "site_ix int, lo int, hi int").repartition(
        min(len(tasks), 256)
    )
    site_list = list(spec.sites)

    def gen(batches):
        for pdf in batches:
            for site_ix, lo, hi in pdf.itertuples(index=False):
                s = site_list[site_ix]
                rows = [gen_page_row(spec, s, i) for i in range(lo, hi)]
                if lo == 0:
                    rows += _special_rows(s) + _locale_rows(spec, s)
                yield pd.DataFrame(rows)

    return tasks_df.mapInPandas(gen, WEB_PAGES_SCHEMA)
