"""HTML sanitize/extract functions (SURVEY.md §2.A rows 6 and 10 —
paragraphHTML at fetchRumors.js:59-73; the second sanctioned pandas UDF).

Reimplements the reference's sanitizer semantics with the stdlib HTML
parser (no jsdom/lxml in this container): keep only ``<a>`` elements,
restricted to their ``href`` attribute plus a forced ``target="_blank"``;
every other element is flattened to its text content; whitespace runs are
collapsed and the result trimmed.
"""

from __future__ import annotations

from html import escape
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


# Void elements never open a containing scope (they cannot wrap an anchor).
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _Sanitizer(HTMLParser):
    """Stream the markup, emitting text for everything and tags only for
    anchors (href kept, target forced, all else dropped) — the same
    projection the reference applies by DOM-walking a clone.

    Reference fidelity details (fetchRumors.js:59-73): the DOM walk visits
    elements in document order and replaces each NON-anchor element with
    its textContent — so an anchor nested inside <em>/<b>/<span> is
    destroyed before it is reached and must flatten to text here too
    (tracked via the open non-anchor container count). jsdom auto-closes
    unclosed anchors on serialization; :func:`sanitize_html_str` balances
    them the same way at end-of-input.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out: list[str] = []
        self.anchor_depth = 0  # anchors currently open AND emitted as tags
        self._container_depth = 0  # open non-anchor, non-void elements

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            if self._container_depth == 0:
                href = next((v for k, v in attrs if k == "href"), None)
                if href:
                    self.out.append(
                        f'<a href="{escape(href, quote=True)}" target="_blank">'
                    )
                else:
                    self.out.append("<a>")
                self.anchor_depth += 1
            # anchor inside a non-anchor container: flattened (text only)
        elif tag not in _VOID:
            self._container_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            if self._container_depth == 0 and self.anchor_depth > 0:
                self.out.append("</a>")
                self.anchor_depth -= 1
        elif tag not in _VOID and self._container_depth > 0:
            self._container_depth -= 1

    def handle_data(self, data: str) -> None:
        # innerHTML-style serialization re-escapes text nodes (& < >), which
        # is what the reference returns from clone.innerHTML.
        self.out.append(escape(data, quote=False))


import re

_FULL_WRAP = re.compile(r"^\s*<(\w+)[^>]*>(.*)</\1>\s*$", re.DOTALL | re.IGNORECASE)


def _unwrap_root(raw: str) -> str:
    """Strip non-anchor wrapper elements that enclose the ENTIRE input.

    The reference sanitizes a DOM *element* (the paragraph root,
    fetchRumors.js:60) whose own tag is never flattened; in the string API
    that root arrives as outer markup, so full-string wrappers play the
    root role and must not count as anchor-destroying containers.
    """
    while True:
        m = _FULL_WRAP.match(raw)
        if not m or m.group(1).lower() == "a":
            return raw
        raw = m.group(2)


def sanitize_html_str(raw: str | None) -> str:
    if not raw:
        return ""
    p = _Sanitizer()
    p.feed(_unwrap_root(raw))
    p.close()
    p.out.extend("</a>" for _ in range(p.anchor_depth))  # jsdom auto-close
    joined = "".join(p.out)
    return " ".join(joined.split())


@F.pandas_udf(T.StringType())
def _sanitize_html_udf(s: pd.Series) -> pd.Series:
    return s.map(sanitize_html_str)


def sanitize_html(c: Column) -> Column:
    """Column form of the sanitizer (Arrow-batched pandas UDF)."""
    return _sanitize_html_udf(c)
