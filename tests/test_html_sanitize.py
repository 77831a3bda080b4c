"""Unit tests for the HTML sanitizer (reference paragraphHTML semantics,
fetchRumors.js:59-73)."""

from __future__ import annotations

import pytest

from hh_rumors_presto_spark.functions.html import sanitize_html_str


@pytest.mark.parametrize(
    "raw,expected",
    [
        # non-anchor elements flatten to text
        ("<p>Hello <b>world</b></p>", "Hello world"),
        # anchors keep href only, target forced, rel/class dropped
        (
            '<p>See <a href="http://x/y" rel="nofollow" class="z">link</a></p>',
            'See <a href="http://x/y" target="_blank">link</a>',
        ),
        # anchor without href -> bare <a> (reference only sets target when
        # href exists, fetchRumors.js:65)
        ("<p><a name='n'>text</a></p>", "<a>text</a>"),
        # whitespace collapse + trim
        ("<p>  a \n\t b  </p>", "a b"),
        # text re-escaped like innerHTML serialization
        ("<p>Tom &amp; Jerry &lt;3</p>", "Tom &amp; Jerry &lt;3"),
        # nested markup inside anchor flattens but the anchor survives
        (
            '<a href="u"><b>bold</b> label</a>',
            '<a href="u" target="_blank">bold label</a>',
        ),
        # empty / null-ish
        ("", ""),
        (None, ""),
    ],
)
def test_sanitize_html_str(raw, expected):
    assert sanitize_html_str(raw) == expected


def test_sanitize_column_form(spark):
    from pyspark.sql import functions as F

    from hh_rumors_presto_spark.functions.html import sanitize_html

    df = spark.createDataFrame(
        [('<p>x <a href="u" rel="r">s</a></p>',)], ["raw"]
    )
    out = df.select(sanitize_html(F.col("raw")).alias("s")).collect()[0][0]
    assert out == 'x <a href="u" target="_blank">s</a>'


@pytest.mark.parametrize(
    "raw,expected",
    [
        # anchor nested inside a non-anchor element is destroyed (the
        # reference's DOM walk replaces <em> with its textContent first)
        ('<em><a href="x">t</a></em> tail', "t tail"),
        # unclosed anchor auto-closes (jsdom serialization behavior)
        ('<a href="x">unclosed', '<a href="x" target="_blank">unclosed</a>'),
        # full-string wrappers act as the root and do not destroy anchors
        (
            '<div><p>x <a href="u">s</a></p></div>',
            'x <a href="u" target="_blank">s</a>',
        ),
    ],
)
def test_sanitize_reference_fidelity(raw, expected):
    assert sanitize_html_str(raw) == expected
