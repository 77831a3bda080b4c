"""Unit tests for the scalar-function library against literal expectations
lifted from reference semantics (FIXTURES.md §B; SURVEY.md §5.2)."""

from __future__ import annotations

import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hh_rumors_presto_spark.functions import (
    body_already_has_source,
    clean,
    dedup_key,
    extract_iso_date,
    fmt_month_abbrev,
    html_escape,
    slugify,
)


def eval_fn(spark, fn, *values):
    """Evaluate a Column fn over literal inputs; return list of results."""
    df = spark.createDataFrame([(v if isinstance(v, tuple) else (v,)) for v in values],
                               [f"c{i}" for i in range(len(values[0]) if isinstance(values[0], tuple) else 1)])
    cols = [F.col(c) for c in df.columns]
    return [r[0] for r in df.select(fn(*cols).alias("out")).collect()]


def test_clean(spark):
    out = eval_fn(spark, clean, "  a \t b\n", "x", None, "   ")
    assert out == ["a b", "x", "", ""]


def test_clean_unicode_whitespace_like_js(spark):
    """JS /\\s/ matches Unicode whitespace; Java's is ASCII-only. clean()
    must collapse NBSP, ideographic space (U+3000), narrow NBSP, and line
    separator like the reference does."""
    out = eval_fn(
        spark,
        clean,
        "a b",          # NBSP
        "汉　字",         # ideographic space between CJK
        "x  y",    # narrow NBSP + math space run
        "p q",          # JS line separator
        "　lead and trail　",
    )
    assert out == ["a b", "汉 字", "x y", "p q", "lead and trail"]


def test_slugify_cjk_and_diacritics(spark):
    """Reference slug charset is [a-z0-9_]: CJK drops to '_', diacritics
    fold to ASCII first (NFD strip), '&' becomes ' and '."""
    out = eval_fn(spark, slugify, "汉字 Tag", "Dončić & Café", "naïve  café")
    assert out == ["tag", "doncic_and_cafe", "naive_cafe"]
    for s in out:
        assert all(ch.islower() or ch.isdigit() or ch == "_" for ch in s)


def test_slugify(spark):
    out = eval_fn(
        spark,
        slugify,
        "Luka Dončić, Dallas & Mavs",
        "  LeBron James ",
        "Victor Wembanyama!!!",
        None,
    )
    assert out == [
        "luka_doncic_dallas_and_mavs",
        "lebron_james",
        "victor_wembanyama",
        "",
    ]


def test_extract_iso_date(spark):
    import datetime

    out = eval_fn(
        spark,
        extract_iso_date,
        "traded on October 5, 2025 for cash",
        "signed May 7, 1999.",
        "no date here",
        None,
    )
    assert out == [
        datetime.date(2025, 10, 5),
        datetime.date(1999, 5, 7),
        None,
        None,
    ]


def test_fmt_month_abbrev(spark):
    # Nonstandard table: bare May, Jun./Jul./Sep. (fetchRumors.js:157)
    out = eval_fn(
        spark,
        lambda c: fmt_month_abbrev(c),
        "2025-05-03",
        "2025-09-03",
        "2025-06-15",
        "2025-07-04",
        "2025-10-15",
        "not-a-date",
        None,
    )
    assert out == [
        "May 3, 2025",
        "Sep. 3, 2025",
        "Jun. 15, 2025",
        "Jul. 4, 2025",
        "Oct. 15, 2025",
        "",
        "",
    ]


def test_html_escape(spark):
    out = eval_fn(spark, html_escape, '<a href="x">Tom & \'co\'</a>', None)
    assert out == [
        "&lt;a href=&quot;x&quot;&gt;Tom &amp; &#39;co&#39;&lt;/a&gt;",
        "",
    ]


def test_dedup_key(spark):
    rows = [("2025-01-02", "T" * 200, "http://u")]
    df = spark.createDataFrame(rows, ["d", "t", "u"])
    out = df.select(
        dedup_key(F.col("d"), F.col("t"), F.col("u")).alias("k")
    ).collect()[0][0]
    assert out == "2025-01-02::" + "T" * 120 + "::http://u"


@pytest.mark.parametrize(
    "snippet,url,name,expected",
    [
        # snippet_html is INNER html (paragraphHTML output) — anchor can
        # genuinely end the string. href matches url (modulo trailing /):
        ('x said <a href="http://s/a/">ESPN</a>', "http://s/a", "Other", True),
        # trailing anchor text matches sourceName case-insensitively
        ('x said <a href="http://else">espn</a>', "http://s/a", "ESPN", True),
        # uppercase tag still matches (reference regex has /i)
        ('x said <A HREF="http://s/a">ESPN</A>', "http://s/a", "Other", True),
        # anchor not trailing -> false
        ('<a href="http://s/a">ESPN</a> said', "http://s/a", "ESPN", False),
        # empty url -> false
        ('x said <a href="http://s/a">ESPN</a>', "", "ESPN", False),
        # no anchor at all -> false
        ("plain text", "http://s/a", "ESPN", False),
        # empty href or empty label -> no match -> false (ref uses + not *)
        ('x <a href="">ESPN</a>', "http://s/a", "ESPN", False),
        ('x <a href="http://s/a"></a>', "http://s/a", "ESPN", False),
        # label with interior whitespace run still matches: the reference
        # clean()s the label (collapses \s+) before comparing
        ('x said <a href="http://else">ESPN  Insider</a>', "http://s/a", "ESPN Insider", True),
        ('x said <a href="http://else">ESPN\tInsider</a>', "http://s/a", "espn insider", True),
    ],
)
def test_body_already_has_source(spark, snippet, url, name, expected):
    df = spark.createDataFrame([(snippet, url, name)], ["s", "u", "n"])
    out = df.select(
        body_already_has_source(F.col("s"), F.col("u"), F.col("n")).alias("b")
    ).collect()[0][0]
    assert out is expected


# ---- property-based (SURVEY.md §5.2) ----

_text = st.text(alphabet=string.printable, max_size=60)


@settings(max_examples=20, deadline=None)
@given(st.lists(_text, min_size=1, max_size=20))
def test_clean_idempotent(spark, values):
    once = eval_fn(spark, clean, *values)
    twice = eval_fn(spark, clean, *once)
    assert once == twice


@settings(max_examples=20, deadline=None)
@given(st.lists(_text, min_size=1, max_size=20))
def test_slug_charset_invariant(spark, values):
    for s in eval_fn(spark, slugify, *values):
        assert set(s) <= set(string.ascii_lowercase + string.digits + "_")
        assert not s.startswith("_") and not s.endswith("_")


def test_extract_iso_date_malformed_phrases(spark):
    """Regex-matched but unparseable phrases must yield null, not an ANSI
    parse error (reference returns '')."""
    out = eval_fn(
        spark,
        extract_iso_date,
        "met in Boston 12, 2024 today",
        "quantity May 45, 2025 units",
    )
    assert out == [None, None]


def test_single_token_doc_shingles(spark):
    """Single-token / empty documents produce empty shingle sets instead of
    an ANSI element_at crash."""
    from pyspark.sql import functions as F

    from hh_rumors_presto_spark.queries.extensions_dedup import bigram_shingles

    df = spark.createDataFrame([("solo",), ("a b",), ("",)], ["text"])
    out = [
        r[0]
        for r in df.select(
            bigram_shingles(F.split("text", " ")).alias("s")
        ).collect()
    ]
    assert out == [[], ["a b"], []]
