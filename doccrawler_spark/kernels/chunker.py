"""Deterministic chunker — stand-in for the reference's LLM batch-API
chunking (X5: src/app/usecases/chunking_usecase/chunking_helper.py:47-168,
prompt rules at src/app/utils/prompts.py:44-182).

The prompt's stated segmentation rules are encoded directly:
  * chunk by headings/subheadings, never split arbitrarily;
  * keep fenced code blocks inside the chunk they belong to;
  * blocks under the trailing ``# Additional Code Snippets`` header are
    re-homed into the first chunk containing a fenced block of the same
    language (prompt: "put them in appropriate chunk"), else the last
    chunk;
  * per-chunk metadata: sdk_framework_name, href, base_url,
    sdk_framework ∈ {sdk, framework}, has_code_snippet, version,
    domains, subdomains (schema: src/app/models/schemas/llm_response.py:10-24).
"""

from __future__ import annotations

import re

_FENCE_OPEN_RE = re.compile(r"^```(\w+)\s*$")
_HEADING_RE = re.compile(r"^(#{1,2})\s+\S")
_ADDITIONAL_HEADER = "# Additional Code Snippets"


def _split_blocks(text: str) -> list[str]:
    """Split markdown into lines grouped so fenced code stays atomic."""
    lines = text.split("\n")
    blocks: list[list[str]] = [[]]
    in_fence = False
    for ln in lines:
        if ln.startswith("```"):
            in_fence = not in_fence
            blocks[-1].append(ln)
            if not in_fence:
                blocks.append([])
            continue
        if not in_fence and _HEADING_RE.match(ln):
            blocks.append([ln])
        else:
            blocks[-1].append(ln)
    return ["\n".join(b).strip("\n") for b in blocks if any(s.strip() for s in b)]


def _fence_langs(chunk: str) -> list[str]:
    langs = []
    for ln in chunk.split("\n"):
        m = _FENCE_OPEN_RE.match(ln)
        if m:
            langs.append(m.group(1).lower())
    return langs


def chunk_text(
    text: str,
    *,
    href: str,
    base_url: str,
    site_id: str,
    min_chunk_chars: int = 200,
) -> list[dict]:
    """Split one page's merged markdown into metadata-tagged chunks."""
    # 1. peel off the Additional Code Snippets tail (added by merge X4)
    additional = ""
    idx = text.find(_ADDITIONAL_HEADER)
    if idx != -1:
        additional = text[idx + len(_ADDITIONAL_HEADER):]
        text = text[:idx]

    # 2. heading-aligned segmentation, fences atomic
    chunks = _split_blocks(text)

    # 3. merge too-small chunks into their predecessor
    merged: list[str] = []
    for c in chunks:
        if merged and len(c) < min_chunk_chars and not c.startswith("```"):
            merged[-1] = merged[-1] + "\n\n" + c
        else:
            merged.append(c)
    chunks = merged if merged else ([text.strip()] if text.strip() else [])

    # 4. re-home the additional snippets per language
    if additional:
        for fence_match in re.finditer(r"```(\w+)\n(.*?)```", additional, re.DOTALL):
            lang = fence_match.group(1).lower()
            block = f"```{lang}\n{fence_match.group(2)}```"
            target = None
            for i, c in enumerate(chunks):
                if lang in _fence_langs(c):
                    target = i
                    break
            if target is None:
                target = len(chunks) - 1 if chunks else None
            if target is None:
                chunks = [block]
            else:
                chunks[target] = chunks[target] + "\n\n" + block

    # 5. metadata (prompt rules: consistent name/classification per page)
    low = text.lower()
    sdk_framework = "sdk" if "sdk" in low else "framework"
    out = []
    for i, c in enumerate(chunks):
        out.append(
            {
                "chunk_ix": i,
                "chunked_data": c,
                "metadata": {
                    "sdk_framework_name": site_id,
                    "base_url": base_url,
                    "href": href,
                    "sdk_framework": sdk_framework,
                    "has_code_snippet": bool(_fence_langs(c)),
                    "version": None,
                    "versions": None,
                    "supported_languages": [],
                    "domains": [],
                    "subdomains": [],
                },
                "is_summary": False,
            }
        )
    return out


def summary_chunk(
    site_id: str, base_url: str, page_texts: list[tuple[str, str]], top_n: int = 4
) -> dict:
    """Deterministic site summary chunk (X6 stand-in).

    The reference collects a site's hrefs (cap 180), has an LLM pick
    the 4 most informative links, then writes a summary chunk marked
    ``is_summary`` (chunking_helper.py:282-478, chunking_usecase.py:62-65).
    Deterministic rule: top-4 pages by (longest text, url asc);
    summary = their first heading lines.
    """
    ranked = sorted(page_texts[:180], key=lambda t: (-len(t[1]), t[0]))[:top_n]
    lines = [f"Summary of {site_id} ({base_url})"]
    for url, text in ranked:
        heads = [ln for ln in text.split("\n") if ln.startswith("#")][:3]
        lines.append(f"## {url}")
        lines.extend(heads)
    return {
        "chunk_ix": 0,
        "chunked_data": "\n".join(lines),
        "metadata": {
            "sdk_framework_name": site_id,
            "base_url": base_url,
            "href": base_url,
            "sdk_framework": "framework",
            "has_code_snippet": False,
            "version": None,
            "versions": None,
            "supported_languages": [],
            "domains": [],
            "subdomains": [],
        },
        "is_summary": True,
    }
