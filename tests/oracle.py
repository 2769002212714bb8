"""Sequential crawl oracle — pure-Python reimplementation of the
reference's crawl loop semantics (SURVEY.md §3.4 items 1-6) over the
synthetic web_pages fixture.

Defines THE golden behavior: single worker, FIFO queue (strict BFS),
canonically sorted link expansion, global seen-set with add-at-enqueue,
sitemap exclusions, per-site ≤180-link filter-batch budget, optional
politeness (robots disallow + per-host per-round quota with deferral).
The Spark engine must match its visited set exactly, its ordering at
(depth, priority) granularity, and its extracted text byte-for-byte.

Reference citations: crawl_page gates crawler_service.py:46,82-89;
budget helper.py:239-248 + crawler_service.py:103-112; seen-set
crawler_service.py:114-118, crawler_usecase.py:123-136.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from doccrawler_spark.kernels.filters import rule_filter_batch
from doccrawler_spark.kernels.html import (
    extract_page,
    extract_title,
    parse_robots,
    parse_sitemap,
    site_id_from_title,
)
from doccrawler_spark.kernels.merge import merge_content
from doccrawler_spark.kernels.urls import filter_urls_by_domain, host_of, strip_fragment


@dataclass
class OracleConfig:
    max_depth: int = 3
    budget_per_site: int = 50
    filter_batch_size: int = 180
    politeness: bool = True
    round_seconds: float = 60.0
    max_rounds: int = 64


@dataclass
class OracleResult:
    crawled: list[dict] = field(default_factory=list)  # processed order
    seen: set[str] = field(default_factory=set)
    budget: dict[str, int] = field(default_factory=dict)
    misses: list[str] = field(default_factory=list)
    # rich form of misses (url/host/site_id/depth/round/priority) — the
    # golden rows for the engine's S8 errors sink
    miss_rows: list[dict] = field(default_factory=list)
    # (url, site_id, round-added) per seen-set insertion — the golden
    # rows for the engine's frontier is_new deltas / streaming dedup
    seen_rows: list[dict] = field(default_factory=list)
    rounds: int = 0


def _page_text(html: str) -> str:
    md, hidden = extract_page(html)
    return merge_content(md, hidden)


class SequentialOracle:
    def __init__(self, web_pages: dict[str, str], cfg: OracleConfig) -> None:
        """web_pages: url → html string (the fixture's html column)."""
        self.pages = web_pages
        self.cfg = cfg
        self.robots: dict[str, tuple[list[str], float | None]] = {}
        for url, html in web_pages.items():
            if url.endswith("/robots.txt"):
                self.robots[host_of(url)] = parse_robots(html)

    # ------------------------------------------------------- politeness
    def _disallowed(self, url: str) -> bool:
        if not self.cfg.politeness:
            return False
        rules = self.robots.get(host_of(url))
        if not rules:
            return False
        path = url.split(host_of(url), 1)[1]
        return any(path.startswith(p) for p in rules[0])

    def _quota(self, host: str) -> int | None:
        if not self.cfg.politeness:
            return None
        rules = self.robots.get(host)
        if not rules or rules[1] is None:
            return None
        return max(1, int(self.cfg.round_seconds // rules[1]))

    # ------------------------------------------------------------- run
    def run(self, seeds: list[str]) -> OracleResult:
        cfg = self.cfg
        res = OracleResult()
        frontier: list[tuple] = []  # (url, depth, site_id, home, sitemap, prio)
        next_prio = 0

        # seeding — crawler_usecase.py:104-136
        for seed in seeds:
            base_html = self.pages.get(seed)
            title = extract_title(base_html) if base_html is not None else ""
            site_id = site_id_from_title(title, seed)
            res.budget.setdefault(site_id, 0)

            locs: list[str] = []
            for probe in ("/sitemap.xml", "/sitemap_index.xml"):
                xml = self.pages.get(seed.rstrip("/") + probe)
                if xml is not None:
                    locs = parse_sitemap(xml)
                    if locs:
                        break
            if locs:
                for loc in locs:
                    if self._disallowed(loc):
                        continue
                    frontier.append((loc, 1, site_id, seed, True, next_prio))
                    next_prio += 1
            else:
                if self._disallowed(seed):
                    continue
                res.seen.add(seed)
                res.seen_rows.append(
                    {"url": seed, "site_id": site_id, "round": 0}
                )
                frontier.append((seed, 1, site_id, seed, False, next_prio))
                next_prio += 1

        # round loop (round == 1 for the first processing pass)
        round_ = 0
        while frontier and round_ < cfg.max_rounds:
            round_ += 1
            frontier.sort(key=lambda it: it[5])
            taken_per_host: dict[str, int] = {}
            process: list[tuple] = []
            deferred: list[tuple] = []
            for item in frontier:
                host = host_of(item[0])
                q = self._quota(host)
                if q is None or taken_per_host.get(host, 0) < q:
                    taken_per_host[host] = taken_per_host.get(host, 0) + 1
                    process.append(item)
                else:
                    deferred.append(item)
            frontier = deferred

            for url, depth, site_id, home, sitemap_mode, prio in process:
                # F1 depth gate (crawler_service.py:46)
                if depth >= cfg.max_depth:
                    continue
                html = self.pages.get(url)
                if html is None:  # fetch miss == result.success False
                    res.misses.append(url)
                    res.miss_rows.append({
                        "url": url, "host": host_of(url), "site_id": site_id,
                        "depth": depth, "round": round_, "priority": prio,
                    })
                    continue
                md, hidden = extract_page(html)
                text = merge_content(md, hidden)
                res.crawled.append({
                    "url": url, "site_id": site_id, "base_url": home,
                    "text": text, "depth": depth, "round": round_,
                    "priority": prio,
                })
                if sitemap_mode:  # F3 (crawler_service.py:82-83)
                    continue
                # page-level budget pre-check (crawler_service.py:85-86)
                if res.budget[site_id] >= cfg.budget_per_site:
                    continue
                if depth + 1 >= cfg.max_depth:  # F2 (:88-89)
                    continue

                from doccrawler_spark.kernels.html import discover_links
                raw = discover_links(html)
                internal = sorted(set(strip_fragment(u) for u in raw))
                internal = filter_urls_by_domain(url, internal)

                filtered: list[str] = []
                bs = cfg.filter_batch_size
                for i in range(0, len(internal), bs):
                    # per-batch budget check + increment (helper.py:239-248)
                    if res.budget[site_id] >= cfg.budget_per_site:
                        continue
                    res.budget[site_id] += 1
                    filtered.extend(rule_filter_batch(internal[i:i + bs]))

                for link in sorted(set(filtered)):
                    if self._disallowed(link):
                        continue
                    if link in res.seen:
                        continue
                    res.seen.add(link)
                    res.seen_rows.append(
                        {"url": link, "site_id": site_id, "round": round_}
                    )
                    frontier.append(
                        (link, depth + 1, site_id, home, False, next_prio)
                    )
                    next_prio += 1

        res.rounds = round_
        return res
