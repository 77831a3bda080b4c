"""Composed tag-page extractor (SURVEY.md §2.A row 6 — ``parseTagPage``,
fetchRumors.js:75-124).

Reimplements the reference's single biggest bespoke chunk from scratch on
the stdlib HTML parser (no jsdom/lxml in this container): raw HTML page ->
item rows, via

- container fallback chain: first ``<main>``, else ``id="content"``, else
  ``class~="content"``, else ``class~="container"``, else ``<body>``
  (fetchRumors.js:79-84);
- a document-order walk of every element under the container in which ANY
  element whose cleaned text contains a "Month DD, YYYY" pattern becomes
  the current date and is consumed (forward-fill / LOCF state,
  fetchRumors.js:92-97);
- item admission: ``<p>``/``<li>`` only, requires a current date, cleaned
  text length >= 15 (fetchRumors.js:99-101);
- last ``<a>`` (any depth, document order) supplies url + source name,
  defaulting to "HoopsHype" (fetchRumors.js:103-106);
- ``paragraphHTML`` snippet: only depth-1 anchors survive (href kept,
  ``target="_blank"`` forced); every other element flattens to its text
  (fetchRumors.js:59-73 — same semantics as functions/html.py, here over
  the in-memory tree);
- hard cap of 80 items per page (fetchRumors.js:119).

The walk is pure per-page Python: on Spark it runs as an Arrow-batched
pandas UDF over the page column — embarrassingly parallel, no state shared
across pages, so it scales with the page count at any corpus size.

Limitations vs a browser DOM (documented, not load-bearing for the driver
fixtures or tests): no implicit auto-close of ``<p>``/``<li>`` — input is
expected to be well-formed, as the reference site's markup is.
"""

from __future__ import annotations

import re
from html import escape
from html.parser import HTMLParser

__all__ = ["parse_tag_page", "extract_iso_date", "clean_ws"]

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_MONTHS = {
    "january": 1, "february": 2, "march": 3, "april": 4, "may": 5,
    "june": 6, "july": 7, "august": 8, "september": 9, "october": 10,
    "november": 11, "december": 12,
}

# First "Word DD, YYYY" occurrence anywhere in the text (fetchRumors.js:43).
_DATE_RE = re.compile(r"([A-Za-z]+)\s+(\d{1,2}),\s+(\d{4})")

_WS_RE = re.compile(r"\s+")


def clean_ws(s: str | None) -> str:
    """clean() — collapse whitespace runs, trim (fetchRumors.js:32)."""
    return _WS_RE.sub(" ", s or "").strip()


def extract_iso_date(txt: str | None) -> str:
    """First "Month DD, YYYY" in the text -> "YYYY-MM-DD", else "".

    Only the FIRST regex match is considered; an invalid month name there
    returns "" even if a valid date appears later (fetchRumors.js:42-50).
    """
    m = _DATE_RE.search(txt or "")
    if not m:
        return ""
    mm = _MONTHS.get(m.group(1).lower())
    if not mm:
        return ""
    return f"{m.group(3)}-{mm:02d}-{int(m.group(2)):02d}"


class _Elem:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str | None]):
        self.tag = tag
        self.attrs = attrs
        self.children: list[object] = []  # _Elem | str (text node)

    def text_content(self) -> str:
        parts: list[str] = []
        # iterative pre-order to keep deep pages off the Python stack
        stack: list[object] = [self]
        while stack:
            n = stack.pop()
            if isinstance(n, str):
                parts.append(n)
            else:
                stack.extend(reversed(n.children))
        return "".join(parts)

    def walk(self):
        """All descendant elements in document order (self excluded)."""
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if isinstance(n, _Elem):
                yield n
                stack.extend(reversed(n.children))

    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Elem("#root", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs) -> None:
        el = _Elem(tag, dict(attrs))
        self.stack[-1].children.append(el)
        if tag not in _VOID:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs) -> None:
        self.stack[-1].children.append(_Elem(tag, dict(attrs)))

    def handle_endtag(self, tag) -> None:
        # pop to the nearest matching open tag; ignore strays
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data) -> None:
        self.stack[-1].children.append(data)


def _build_tree(html: str) -> _Elem:
    b = _TreeBuilder()
    b.feed(html or "")
    b.close()
    return b.root


def _select_container(root: _Elem) -> _Elem:
    """main -> #content -> .content -> .container -> body -> root
    (fetchRumors.js:79-84); each selector takes the FIRST match in
    document order."""
    by_id = by_class_content = by_class_container = body = None
    for el in root.walk():
        if el.tag == "main":
            return el
        if by_id is None and el.attrs.get("id") == "content":
            by_id = el
        if by_class_content is None and "content" in el.classes():
            by_class_content = el
        if by_class_container is None and "container" in el.classes():
            by_class_container = el
        if body is None and el.tag == "body":
            body = el
    return by_id or by_class_content or by_class_container or body or root


def _paragraph_html(p: _Elem) -> str:
    """paragraphHTML (fetchRumors.js:59-73): depth-1 anchors keep href +
    forced target="_blank"; every other child element flattens to its
    escaped text content (which also destroys anchors nested inside it —
    the reference's static NodeList walk replaces the wrapper before its
    descendants are visited). Serialized innerHTML-style, whitespace
    collapsed."""
    out: list[str] = []
    for c in p.children:
        if isinstance(c, str):
            out.append(escape(c, quote=False))
        elif c.tag == "a":
            href = c.attrs.get("href")
            inner = escape(c.text_content(), quote=False)
            if href:
                out.append(
                    f'<a href="{escape(href, quote=True)}" target="_blank">'
                    f"{inner}</a>"
                )
            else:
                out.append(f"<a>{inner}</a>")
        else:
            out.append(escape(c.text_content(), quote=False))
    return clean_ws("".join(out))


def parse_tag_page(html: str | None, max_items: int = 80) -> list[dict]:
    """Raw tag-page HTML -> ordered item dicts (fetchRumors.js:75-124).

    Returns up to ``max_items`` dicts with keys ``title``,
    ``snippet_html``, ``url``, ``source_name``, ``date_iso``,
    ``last_anchor_text`` — one per admitted ``<p>``/``<li>`` block.
    """
    if not html:
        return []
    root = _build_tree(html)
    container = _select_container(root)

    out: list[dict] = []
    current_date = ""
    for el in container.walk():
        text = clean_ws(el.text_content())
        iso = extract_iso_date(text)
        if iso:
            # ANY element carrying a date pattern — heading, wrapper, or
            # even a would-be item — becomes the date and is consumed.
            current_date = iso
            continue
        if el.tag not in ("p", "li") or not current_date:
            continue
        if not text or len(text) < 15:
            continue
        anchors = [a for a in el.walk() if a.tag == "a"]
        last_a = anchors[-1] if anchors else None
        url = (last_a.attrs.get("href") if last_a else None) or ""
        last_text = clean_ws(last_a.text_content()) if last_a else ""
        out.append(
            {
                "title": text,
                "snippet_html": _paragraph_html(el),
                "url": url,
                "source_name": last_text or "HoopsHype",
                "date_iso": current_date,
                "last_anchor_text": last_text,
            }
        )
        if len(out) >= max_items:
            break
    return out
