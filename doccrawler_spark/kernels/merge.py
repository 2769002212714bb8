"""Snippet merge kernel — byte-compatible with the reference's
``merge_content`` (src/app/usecases/crawler_usecase/helper.py:93-131).

The golden ``text`` column equals ``merge_content(extract_text(html),
extract_hidden_snippets(html))``, so every byte quirk of the reference
algorithm is load-bearing and intentionally preserved:

* each fenced block it touches is re-emitted as
  `````{lang}\n{code}\n```\n`` — since the regex's code group
  usually already ends in ``\n`` this *adds* a blank line vs the input;
* hidden snippets for a language are spliced after the FIRST fenced
  block of that language only (dict ``pop``);
* leftovers land under a trailing ``# Additional Code Snippets``
  header in insertion (document) order.

This is a clean-room reimplementation of the published algorithm, not
a copy; behavior verified by tests/test_kernels.py golden cases.
"""

from __future__ import annotations

import re

_FENCE_RE = re.compile(r"```(\w+)\n(.*?)```", re.DOTALL)


def merge_content(markdown: str, hidden: dict[str, list[str]]) -> str:
    """Splice hidden per-language snippets into fit-markdown."""
    remaining = {k: list(v) for k, v in hidden.items()}  # don't mutate input
    out: list[str] = []
    cursor = 0
    spliced: set[str] = set()

    for m in _FENCE_RE.finditer(markdown):
        lang = m.group(1).lower()
        body = m.group(2)
        out.append(markdown[cursor:m.start()])
        out.append(f"```{lang}\n{body}\n```\n")
        if lang in remaining:
            for alt in remaining.pop(lang):
                out.append(f"\n```{lang}\n{alt}\n```\n")
            spliced.add(lang)
        cursor = m.end()

    out.append(markdown[cursor:])

    if remaining:
        out.append("\n\n# Additional Code Snippets\n")
        for lang, snippets in remaining.items():
            if lang in spliced:
                continue
            for snippet in snippets:
                out.append(f"\n```{lang}\n{snippet}\n```\n")

    return "".join(out)
