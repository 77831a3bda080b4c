"""Unit tests for the composed tag-page extractor (reference parseTagPage
semantics, fetchRumors.js:75-124) — pure-Python layer, no Spark."""

from __future__ import annotations

from hh_rumors_presto_spark.functions.page_extract import (
    clean_ws,
    extract_iso_date,
    parse_tag_page,
)

DATE_H = "<h2>March 5, 2024</h2>"
ITEM = "<p>A fifteen-plus character rumor body here</p>"


def wrap(inner: str, container: str = "main") -> str:
    open_close = {
        "main": ("<main>", "</main>"),
        "id": ('<div id="content">', "</div>"),
        "class-content": ('<div class="content">', "</div>"),
        "class-container": ('<div class="container">', "</div>"),
        "body": ("", ""),
    }[container]
    return (
        "<html><body>"
        + open_close[0]
        + inner
        + open_close[1]
        + "</body></html>"
    )


class TestExtractIsoDate:
    def test_basic(self):
        assert extract_iso_date("Heading March 5, 2024 tail") == "2024-03-05"

    def test_day_padding(self):
        assert extract_iso_date("May 7, 1999") == "1999-05-07"

    def test_invalid_month_first_match_wins(self):
        # only the FIRST "Word DD, YYYY" match is considered
        # (fetchRumors.js:43 uses a single exec)
        assert extract_iso_date("Foo 3, 2024 then March 5, 2024") == ""

    def test_no_date(self):
        assert extract_iso_date("no date here") == ""
        assert extract_iso_date(None) == ""


class TestContainerFallback:
    """fetchRumors.js:79-84: main > #content > .content > .container > body."""

    def test_main_wins_over_all(self):
        html = (
            "<html><body>"
            '<div class="container">' + DATE_H + "<p>Decoy item never to be emitted</p></div>"
            "<main>" + DATE_H + ITEM + "</main>"
            "</body></html>"
        )
        items = parse_tag_page(html)
        assert len(items) == 1
        assert items[0]["title"].startswith("A fifteen-plus")

    def test_each_fallback_level(self):
        for c in ("main", "id", "class-content", "class-container", "body"):
            items = parse_tag_page(wrap(DATE_H + ITEM, c))
            assert len(items) == 1, c

    def test_content_class_beats_container_class(self):
        html = (
            "<html><body>"
            '<div class="container">' + DATE_H + "<p>Container decoy item text here</p></div>"
            '<div class="content">' + DATE_H + ITEM + "</div>"
            "</body></html>"
        )
        items = parse_tag_page(html)
        assert len(items) == 1
        assert items[0]["title"].startswith("A fifteen-plus")

    def test_outside_container_excluded(self):
        html = (
            "<html><body><main>" + DATE_H + ITEM + "</main>"
            "<footer>" + DATE_H + "<p>Footer rumor that must not appear</p></footer>"
            "</body></html>"
        )
        assert len(parse_tag_page(html)) == 1


class TestDateForwardFill:
    def test_no_date_yet_rejects(self):
        # items before the first date heading have no currentDateISO
        # (fetchRumors.js:100)
        html = wrap(ITEM + DATE_H + ITEM)
        items = parse_tag_page(html)
        assert len(items) == 1

    def test_date_carries_across_items(self):
        html = wrap(
            DATE_H + ITEM + ITEM + "<h2>March 6, 2024</h2>" + ITEM
        )
        items = parse_tag_page(html)
        assert [i["date_iso"] for i in items] == [
            "2024-03-05", "2024-03-05", "2024-03-06",
        ]

    def test_item_containing_date_is_consumed_as_heading(self):
        # a <p> whose text matches the date pattern updates the date and
        # is NOT emitted as an item (fetchRumors.js:96-97 runs before the
        # item-block check)
        html = wrap(
            DATE_H
            + "<p>As reported on March 9, 2024 by someone somewhere</p>"
            + ITEM
        )
        items = parse_tag_page(html)
        assert len(items) == 1
        assert items[0]["date_iso"] == "2024-03-09"

    def test_wrapper_div_with_date_text_consumed_before_heading(self):
        # a wrapper whose textContent contains the date matches first in
        # document order — same net date, heading also consumed
        html = wrap("<div>" + DATE_H + ITEM + "</div>")
        items = parse_tag_page(html)
        assert len(items) == 1
        assert items[0]["date_iso"] == "2024-03-05"


class TestAdmission:
    def test_short_text_rejected(self):
        assert parse_tag_page(wrap(DATE_H + "<p>too short</p>")) == []

    def test_li_admitted(self):
        items = parse_tag_page(
            wrap(DATE_H + "<ul><li>List-item rumor body of ample length</li></ul>")
        )
        assert len(items) == 1

    def test_non_item_tags_ignored(self):
        html = wrap(DATE_H + "<div>A div of ample length is not an item block</div>")
        assert parse_tag_page(html) == []

    def test_page_cap_80(self):
        html = wrap(DATE_H + ITEM * 100)
        assert len(parse_tag_page(html)) == 80

    def test_cap_parameter(self):
        html = wrap(DATE_H + ITEM * 10)
        assert len(parse_tag_page(html, max_items=3)) == 3


class TestSourceAttribution:
    def test_last_anchor_wins(self):
        html = wrap(
            DATE_H
            + '<p>Body text of sufficient length <a href="u1">First</a>'
            ' and <a href="u2">Second</a></p>'
        )
        [it] = parse_tag_page(html)
        assert it["url"] == "u2"
        assert it["source_name"] == "Second"
        assert it["last_anchor_text"] == "Second"

    def test_nested_anchor_counts_for_source_but_flattens_in_snippet(self):
        # el.querySelectorAll("a") sees nested anchors (fetchRumors.js:103)
        # but paragraphHTML destroys them (the wrapper flattens first)
        html = wrap(
            DATE_H
            + '<p>Long enough body <em><a href="nested">NestedSrc</a></em></p>'
        )
        [it] = parse_tag_page(html)
        assert it["url"] == "nested"
        assert it["source_name"] == "NestedSrc"
        assert "<a" not in it["snippet_html"]
        assert "NestedSrc" in it["snippet_html"]

    def test_no_anchor_defaults_hoopshype(self):
        [it] = parse_tag_page(wrap(DATE_H + ITEM))
        assert it["url"] == ""
        assert it["source_name"] == "HoopsHype"
        assert it["last_anchor_text"] == ""

    def test_anchor_without_href_empty_url(self):
        html = wrap(DATE_H + "<p>Body long enough here <a name='x'>Label</a></p>")
        [it] = parse_tag_page(html)
        assert it["url"] == ""
        assert it["source_name"] == "Label"


class TestSnippet:
    def test_markup_flattened_anchor_kept(self):
        html = wrap(
            DATE_H
            + '<p><b>Bold</b> rumor body text <a href="u" rel="x">Src</a></p>'
        )
        [it] = parse_tag_page(html)
        assert it["snippet_html"] == (
            'Bold rumor body text <a href="u" target="_blank">Src</a>'
        )

    def test_title_is_clean_text_content(self):
        html = wrap(
            DATE_H + "<p>  Spaced \n text  <a href='u'>Src</a></p>"
        )
        [it] = parse_tag_page(html)
        assert it["title"] == "Spaced text Src"


def test_clean_ws():
    assert clean_ws("  a \n\t b  ") == "a b"
    assert clean_ws(None) == ""
    assert clean_ws("") == ""
