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


class _Sanitizer(HTMLParser):
    """Stream the markup, emitting text for everything and tags only for
    anchors (href kept, target forced, all else dropped) — the same
    projection the reference applies by DOM-walking a clone."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out: list[str] = []
        self._anchor_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            href = next((v for k, v in attrs if k == "href"), None)
            if href:
                self.out.append(f'<a href="{escape(href, quote=True)}" target="_blank">')
            else:
                self.out.append("<a>")
            self._anchor_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag == "a" and self._anchor_depth > 0:
            self.out.append("</a>")
            self._anchor_depth -= 1

    def handle_data(self, data: str) -> None:
        # innerHTML-style serialization re-escapes text nodes (& < >), which
        # is what the reference returns from clone.innerHTML.
        self.out.append(escape(data, quote=False))


def sanitize_html_str(raw: str | None) -> str:
    if not raw:
        return ""
    p = _Sanitizer()
    p.feed(raw)
    p.close()
    joined = "".join(p.out)
    return " ".join(joined.split())


@F.pandas_udf(T.StringType())
def _sanitize_html_udf(s: pd.Series) -> pd.Series:
    return s.map(sanitize_html_str)


def sanitize_html(c: Column) -> Column:
    """Column form of the sanitizer (Arrow-batched pandas UDF)."""
    return _sanitize_html_udf(c)
