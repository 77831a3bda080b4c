"""String scalar functions.

Each reimplements, as a Spark column expression, a scalar from the reference
(cites are to /root/reference/netlify/functions/fetchRumors.js and
/root/reference/index.html — semantics only; no code is translated).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


# The reference's clean() uses JS /\s/, which matches UNICODE whitespace
# (NBSP, ideographic space U+3000, line/para separators, BOM). Java and
# RE2 \s are ASCII-only, so both engines get an explicit class: ASCII \s
# plus the JS extras as literal characters (portable across Java + RE2).
JS_WS_CLASS = (
    "[\\s   -     　﻿]"
)


def clean(c: Column) -> Column:
    """Whitespace-normalize: collapse runs of whitespace to one space, trim.

    Null-safe (null -> ''), matching ``clean`` at fetchRumors.js:32 —
    including its JS Unicode-whitespace semantics (U+3000 etc. collapse).
    DuckDB oracles keep plain ``\\s+``: fixture text is ASCII, where the
    two classes are identical; the Unicode branch is pinned by unit tests
    (tests/test_functions.py) instead of the cross-engine differ.
    """
    return F.trim(F.regexp_replace(F.coalesce(c, F.lit("")), JS_WS_CLASS + "+", " "))


@F.pandas_udf(T.StringType())
def _nfd_strip_accents(s: pd.Series) -> pd.Series:
    """Vectorized NFD-normalize + strip combining marks (U+0300-036F).

    Spark has no built-in NFD fold, so this is one of the two sanctioned
    pandas UDFs (SURVEY.md §4.2 item 3). Arrow-batched, not per-row.
    """

    def fold(v: str | None) -> str:
        if v is None:
            return ""
        return "".join(
            ch
            for ch in unicodedata.normalize("NFD", v)
            if not (0x0300 <= ord(ch) <= 0x036F)
        )

    return s.map(fold)


def slugify(c: Column) -> Column:
    """Tag-slug normalization per fetchRumors.js:33-38.

    NFD-fold diacritics, lowercase, '&' -> ' and ', runs of non-[a-z0-9]
    -> '_', strip leading/trailing '_'.
    """
    folded = F.lower(_nfd_strip_accents(c))
    anded = F.regexp_replace(folded, "&", " and ")
    underscored = F.regexp_replace(anded, "[^a-z0-9]+", "_")
    return F.regexp_replace(underscored, "^_+|_+$", "")


def slugify_expr_ascii(c: Column) -> Column:
    """ASCII-input fast path of :func:`slugify` — pure column expression.

    Identical to :func:`slugify` when the input has no diacritics; keeps the
    hot path fully inside whole-stage codegen (no Python round-trip).
    """
    folded = F.lower(c)
    anded = F.regexp_replace(folded, "&", " and ")
    underscored = F.regexp_replace(anded, "[^a-z0-9]+", "_")
    return F.regexp_replace(underscored, "^_+|_+$", "")


def html_escape(c: Column) -> Column:
    """Escape ``& < > " '`` to entities, per ``esc`` at index.html:49.

    ``&`` first so already-escaped entities are not double-escaped twice
    differently from the reference (which also escapes `&` first).
    """
    out = F.regexp_replace(F.coalesce(c, F.lit("")), "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    out = F.regexp_replace(out, ">", "&gt;")
    out = F.regexp_replace(out, '"', "&quot;")
    out = F.regexp_replace(out, "'", "&#39;")
    return out


def dedup_key(date: Column, title: Column, url: Column) -> Column:
    """Composite dedup key ``date::title[:120]::url`` (fetchRumors.js:142,192)."""
    return F.concat_ws(
        "::",
        F.coalesce(date.cast("string"), F.lit("")),
        F.substring(F.coalesce(title, F.lit("")), 1, 120),
        F.coalesce(url, F.lit("")),
    )


# Trailing-anchor pattern of a sanitized snippet: the reference checks the
# LAST <a> tag and whether the snippet ends with it (fetchRumors.js:167 —
# case-insensitive, href and label both required non-empty). snippet_html is
# INNER html (fetchRumors.js:72), so a trailing anchor really ends the string.
_TRAILING_ANCHOR = r'(?i)<a[^>]*href="([^"]+)"[^>]*>([^<]+)</a>\s*$'


def body_already_has_source(snippet_html: Column, url: Column, source_name: Column) -> Column:
    """True iff the snippet's trailing anchor already cites the source.

    Per ``bodyAlreadyHasSource`` (fetchRumors.js:161-172): false when url is
    empty or there is no trailing anchor; else true when the trailing
    anchor's href (rtrim '/') equals url (rtrim '/'), or its visible text
    equals sourceName case-insensitively. Pure column expression — no UDF.
    """
    href = F.regexp_extract(snippet_html, _TRAILING_ANCHOR, 1)
    text = F.regexp_extract(snippet_html, _TRAILING_ANCHOR, 2)
    has_anchor = href != F.lit("")
    norm = lambda c: F.regexp_replace(c, "/+$", "")  # noqa: E731
    # the reference clean()s the label before comparing (fetchRumors.js:167),
    # which collapses interior whitespace runs — not just trim
    ws = lambda c: F.trim(F.regexp_replace(c, JS_WS_CLASS + "+", " "))  # noqa: E731
    same_href = norm(href) == norm(F.coalesce(url, F.lit("")))
    same_text = F.lower(ws(text)) == F.lower(ws(F.coalesce(source_name, F.lit(""))))
    return (
        (F.coalesce(url, F.lit("")) != F.lit(""))
        & has_anchor
        & (same_href | same_text)
    )
