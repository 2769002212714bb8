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


def extract_page_reference(html: str) -> tuple[str, dict[str, list[str]]]:
    """html.parser-based implementation — the semantic reference the
    fast scanner below must match byte-for-byte (cross-checked by
    tests/test_kernels.py::test_fast_parser_equivalence)."""
    p = _FitMarkdownParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return "\n\n".join(p.blocks), p.hidden


# --------------------------------------------------------- fast scanner
#
# html.parser walks the input character-by-character in Python (~1 MB/s)
# and dominated the crawl's per-page cost (~8 ms for a 10 KB page).  The
# scanner below drives the SAME state machine at tag granularity using
# C-speed regex search (~0.3-0.5 ms/page).  It reproduces
# extract_page_reference byte-identically on well-formed HTML, including
# html.parser quirks we must keep (entity decoding in data, CDATA
# content mode for script/style, startend tags, comments/PIs dropped,
# bare "<" treated as text).

_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)"          # close-slash, name
    r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*)"      # raw attrs (quote-aware)
    r"(/?)>"
)
_STYLE_ATTR_RE = re.compile(
    r"""(?:^|\s)style\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""", re.IGNORECASE)
_CLASS_ATTR_RE = re.compile(
    r"""(?:^|\s)class\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""", re.IGNORECASE)
_DISPLAY_NONE_RE = re.compile(r"display\s*:\s*none")


def extract_page(html_s: str) -> tuple[str, dict[str, list[str]]]:
    """Parse once → (fit_markdown, hidden_snippets {lang: [code,...]}).

    Fast regex-scanner equivalent of :func:`extract_page_reference`
    (X1+X3 fused — crawl4ai markdown + Playwright hidden-snippet pass,
    crawler_config.py:5-26 / hidden_code_snippets_service.py:22-185).
    """
    import html as _html

    blocks: list[str] = []
    hidden: dict[str, list[str]] = {}
    hidden_seen: set[str] = set()
    hidden_depth = 0
    skip_depth = 0
    inline: list[str] = []
    block_prefix = ""
    in_block = False
    pre_depth = 0
    pre_lang = "text"
    pre_buf: list[str] = []

    def data(seg: str) -> None:
        nonlocal inline
        if skip_depth:
            return
        if "&" in seg:
            seg = _html.unescape(seg)
        if pre_depth:
            pre_buf.append(seg)
        elif in_block and not hidden_depth:
            inline.append(seg)

    def flush_inline() -> None:
        nonlocal inline, in_block
        if not in_block:
            inline = []
            return
        text = _WS_RE.sub(" ", "".join(inline)).strip()
        inline = []
        in_block = False
        if text:
            blocks.append(f"{block_prefix}{text}" if block_prefix else text)

    def start(tag: str, raw_attrs: str) -> None:
        nonlocal skip_depth, hidden_depth, pre_depth, pre_lang, pre_buf
        nonlocal in_block, block_prefix
        if tag in ("script", "style", "head"):
            skip_depth += 1
            return
        if skip_depth:
            return
        if hidden_depth:
            hidden_depth += 1
        else:
            m = _STYLE_ATTR_RE.search(raw_attrs) if "=" in raw_attrs else None
            if m:
                v = next(g for g in m.groups() if g is not None)
                if "&" in v:
                    v = _html.unescape(v)
                if _DISPLAY_NONE_RE.search(v):
                    hidden_depth += 1
        if tag == "pre":
            pre_depth += 1
            pre_buf = []
            pre_lang = "text"
            return
        if tag == "code" and pre_depth:
            m = _CLASS_ATTR_RE.search(raw_attrs)
            if m:
                v = next(g for g in m.groups() if g is not None)
                if "&" in v:
                    v = _html.unescape(v)
                lm = _LANG_CLASS_RE.search(v)
                if lm:
                    pre_lang = lm.group(1).lower()
            return
        if pre_depth:
            return
        if tag in _BLOCK_TAGS and not hidden_depth:
            flush_inline()
            in_block = True
            block_prefix = (
                _HEADING_TAGS[tag] + " " if tag in _HEADING_TAGS
                else "- " if tag == "li" else ""
            )

    def end(tag: str) -> None:
        nonlocal skip_depth, hidden_depth, pre_depth
        if tag in ("script", "style", "head"):
            skip_depth = max(0, skip_depth - 1)
            return
        if skip_depth:
            return
        if tag == "pre" and pre_depth:
            pre_depth -= 1
            code = "".join(pre_buf).strip("\n")
            if hidden_depth:
                key = f"{pre_lang}\0{code}"
                if code and key not in hidden_seen:
                    hidden_seen.add(key)
                    hidden.setdefault(pre_lang, []).append(code)
            elif code:
                blocks.append(f"```{pre_lang}\n{code}\n```")
        if hidden_depth:
            hidden_depth -= 1
            return
        if tag in _BLOCK_TAGS and not pre_depth:
            flush_inline()

    pos = 0
    n = len(html_s)
    find = html_s.find
    tag_match = _TAG_RE.match
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            data(html_s[pos:])
            break
        if lt > pos:
            data(html_s[pos:lt])
        m = tag_match(html_s, lt)
        if m:
            closing, name, raw_attrs, selfclose = m.groups()
            name = name.lower()
            pos = m.end()
            if closing:
                end(name)
            else:
                start(name, raw_attrs)
                if selfclose:
                    end(name)
                elif name in ("script", "style") and skip_depth:
                    # html.parser CDATA mode: raw text until the
                    # matching close tag, never parsed as markup
                    cm = re.search(
                        rf"</\s*{name}(?:\s[^>]*)?>", html_s[pos:], re.IGNORECASE
                    )
                    if cm:
                        pos += cm.end()
                        end(name)
                    else:
                        pos = n
        elif html_s.startswith("<!--", lt):
            e = find("-->", lt + 4)
            pos = n if e < 0 else e + 3
        elif lt + 1 < n and html_s[lt + 1] in "!?":
            e = find(">", lt + 1)
            pos = n if e < 0 else e + 1
        else:
            data("<")
            pos = lt + 1
    # NOTE: no flush at EOF — html.parser's state machine drops a block
    # still open when input ends, and byte-identity includes that case
    return "\n\n".join(blocks), hidden


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
