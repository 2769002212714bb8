"""HTML extraction kernels: fit-markdown text, links, hidden snippets.

These are the deterministic stand-ins for the reference's browser
stack (crawl4ai ``DefaultMarkdownGenerator`` + ``PruningContentFilter``
at src/app/config/crawler_config.py:5-26, link discovery via
``result.links['internal']`` at src/app/services/crawler_service.py:91-98,
and the Playwright hidden-snippet pass at
src/app/services/hidden_code_snippets_service.py:22-185).  The sandbox
has no browser/network, so the *golden* ``text`` column of the
``web_pages`` fixture is produced by exactly these kernels applied by
the sequential oracle — the engine must reproduce it byte-identically
(per-row invariant in BASELINE.json ``input_hint``).

Dialect handled: regular HTML; block elements h1-h6/p/li, anchors
(text kept, target ignored — the reference extracts with
``ignore_links=True``), fenced code from ``<pre><code
class="language-X">``, and hidden per-language snippet blocks marked
with ``style="display: none"`` (the markup the reference's Playwright
pass force-shows, hidden_code_snippets_service.py:96-120).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_LANG_CLASS_RE = re.compile(r"language-([\w+-]+)")
_WS_RE = re.compile(r"\s+")
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
_HREF_RE = re.compile(r"""<a\s[^>]*href=["']([^"']+)["']""", re.IGNORECASE)
_LOC_RE = re.compile(r"<loc>\s*(.*?)\s*</loc>", re.IGNORECASE | re.DOTALL)

_HEADING_TAGS = {"h1": "#", "h2": "##", "h3": "###", "h4": "####",
                 "h5": "#####", "h6": "######"}
_BLOCK_TAGS = set(_HEADING_TAGS) | {"p", "li"}


def _is_hidden(attrs: list[tuple[str, str | None]]) -> bool:
    for k, v in attrs:
        if k == "style" and v and re.search(r"display\s*:\s*none", v):
            return True
    return False


class _FitMarkdownParser(HTMLParser):
    """One pass over the HTML producing visible markdown blocks and the
    hidden per-language snippet map."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self.hidden: dict[str, list[str]] = {}
        self._hidden_depth = 0
        self._skip_depth = 0  # script/style subtrees
        self._inline: list[str] = []
        self._block_prefix = ""
        self._in_block = False
        self._pre_depth = 0
        self._pre_lang = "text"
        self._pre_buf: list[str] = []
        self._hidden_seen: set[str] = set()

    # -- block helpers -------------------------------------------------
    def _flush_inline(self) -> None:
        if not self._in_block:
            self._inline = []
            return
        text = _WS_RE.sub(" ", "".join(self._inline)).strip()
        self._inline = []
        self._in_block = False
        if text:
            prefix = self._block_prefix
            self.blocks.append(f"{prefix}{text}" if prefix else text)

    # -- parser callbacks ----------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style", "head"):
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if _is_hidden(attrs) or self._hidden_depth:
            self._hidden_depth += 1
        if tag == "pre":
            self._pre_depth += 1
            self._pre_buf = []
            self._pre_lang = "text"
            return
        if tag == "code" and self._pre_depth:
            for k, v in attrs:
                if k == "class" and v:
                    m = _LANG_CLASS_RE.search(v)
                    if m:
                        self._pre_lang = m.group(1).lower()
            return
        if self._pre_depth:
            return
        if tag in _BLOCK_TAGS and not self._hidden_depth:
            self._flush_inline()
            self._in_block = True
            self._block_prefix = (
                _HEADING_TAGS[tag] + " " if tag in _HEADING_TAGS
                else "- " if tag == "li" else ""
            )

    def handle_endtag(self, tag):
        if tag in ("script", "style", "head"):
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "pre" and self._pre_depth:
            self._pre_depth -= 1
            code = "".join(self._pre_buf).strip("\n")
            if self._hidden_depth:
                # hidden snippet: dedup globally per page, keep first
                # (mirrors seen_code_blocks at
                # hidden_code_snippets_service.py:60-75)
                key = f"{self._pre_lang}\0{code}"
                if code and key not in self._hidden_seen:
                    self._hidden_seen.add(key)
                    self.hidden.setdefault(self._pre_lang, []).append(code)
            elif code:
                self.blocks.append(f"```{self._pre_lang}\n{code}\n```")
        if self._hidden_depth:
            self._hidden_depth -= 1
            return
        if tag in _BLOCK_TAGS and not self._pre_depth:
            self._flush_inline()

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._pre_depth:
            self._pre_buf.append(data)
        elif self._in_block and not self._hidden_depth:
            self._inline.append(data)


def extract_page(html: str) -> tuple[str, dict[str, list[str]]]:
    """Parse once → (fit_markdown, hidden_snippets {lang: [code,...]})."""
    p = _FitMarkdownParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return "\n\n".join(p.blocks), p.hidden


def extract_text(html: str) -> str:
    """Visible fit-markdown only (the X1 operator)."""
    return extract_page(html)[0]


def extract_hidden_snippets(html: str) -> dict[str, list[str]]:
    """Hidden per-language code snippets (the X3 operator)."""
    return extract_page(html)[1]


def discover_links(html: str) -> list[str]:
    """All ``<a href>`` targets in document order (X2).

    Absolute http(s) URLs only — the fixture generator emits absolute
    links, matching what crawl4ai's resolved ``result.links`` carries.
    """
    return [u for u in _HREF_RE.findall(html) if u.startswith(("http://", "https://"))]


def extract_title(html: str) -> str:
    """<title> text, entity-decoded and whitespace-collapsed."""
    import html as _html

    m = _TITLE_RE.search(html)
    return _WS_RE.sub(" ", _html.unescape(m.group(1))).strip() if m else ""


def site_id_from_title(title: str, base_url: str) -> str:
    """Title → snake_case site id, netloc fallback.

    Mirrors helper.py:41-63: strip non-word chars, spaces→underscore;
    on failure (empty title) use ``netloc.replace('.', '_')``.
    """
    from urllib.parse import urlparse

    clean = re.sub(r"[^\w\s]", "", title)
    clean = re.sub(r"\s+", "_", clean)
    if clean:
        return clean
    return urlparse(base_url).netloc.replace(".", "_")


def parse_sitemap(xml: str) -> list[str]:
    """<loc> entries in document order (helper.py:192-213)."""
    return [u.strip() for u in _LOC_RE.findall(xml) if u.strip()]


def parse_robots(text: str) -> tuple[list[str], float | None]:
    """robots.txt → (disallow path prefixes, crawl_delay seconds).

    The reference has NO robots handling (SURVEY.md §2.5 O3); this is
    the politeness layer added per BASELINE.json north_rule.  Simple
    dialect: every ``Disallow:`` and ``Crawl-delay:`` line counts
    (agent groups ignored).
    """
    disallow: list[str] = []
    delay: float | None = None
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "disallow" and val:
            disallow.append(val)
        elif key == "crawl-delay":
            try:
                delay = float(val)
            except ValueError:
                pass
    return disallow, delay
