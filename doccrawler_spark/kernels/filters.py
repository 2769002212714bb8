"""Deterministic URL relevance filter — the rule-based stand-in for the
reference's LLM link filter (F7).

The reference batches ≤180 links into a GPT call with ``filter_prompt``
(src/app/services/crawler_service.py:103-112, helper.py:236-291,
prompt at src/app/utils/prompts.py:1-42).  The prompt's stated rules
are deterministic; we encode them directly so the whole pipeline is
reproducible (and the backend stays pluggable — an LLM batch endpoint
could replace :func:`rule_filter_batch` behind the same signature).

Prompt rules mirrored:
  * exclude authentication / account pages (login, signup, sessionType=…),
    support pages, general account settings;
  * exclude non-English documentation locales;
  * fragment links were already stripped upstream (F4);
  * output contains no repeats (first occurrence wins).
"""

from __future__ import annotations

import re

# login/signup/support/account/settings — prompt INSTRUCTIONS lines 2-3
# and the worked example (status.* is KEPT there, so no status rule).
_EXCLUDE_RE = re.compile(
    r"(?i)(?:"
    r"[/?&_-](?:log[-_]?in|sign[-_]?in|sign[-_]?up|register|logout)(?:[/?&.#]|$)"
    r"|sessionType=(?:login|signup)"
    r"|/support(?:[/?#]|$)"
    r"|/account(?:[/?#]|$)"
    r"|/settings(?:[/?#]|$)"
    r")"
)

# "Exclude urls that redirect to documentation in some different
# languages. I only want pages that are in English."
_LOCALES = (
    "es fr de ja zh zh-cn zh-tw ko pt pt-br ru it nl pl tr ar hi id th vi"
).split()
_LOCALE_RE = re.compile(
    r"(?i)(?:/(?:%s)/|[?&](?:lang|locale|hl)=(?!en)\w)" % "|".join(_LOCALES)
)


def keep_url(url: str) -> bool:
    """True when the URL survives the relevance rules."""
    if _EXCLUDE_RE.search(url):
        return False
    if _LOCALE_RE.search(url):
        return False
    return True


def rule_filter_batch(links: list[str]) -> list[str]:
    """Filter one ≤180-link batch; dedups preserving first occurrence
    (the prompt demands no repeating URLs in the output)."""
    seen: set[str] = set()
    out: list[str] = []
    for u in links:
        if u in seen or not keep_url(u):
            continue
        seen.add(u)
        out.append(u)
    return out
