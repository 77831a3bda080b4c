"""Unit tests for the HTTP-shaped transport contract (reference fetch
layer + crawl loop, fetchRumors.js:14-56,126-151) — pure Python."""

from __future__ import annotations

import base64

import pytest

from hh_rumors_presto_spark.sources.http_transport import (
    AUTH_ENV_VAR,
    HttpStatusError,
    build_request_headers,
    crawl_tag,
    dict_transport,
    fetch_text,
    page_url,
)

DATE_H = "<h2>March 5, 2024</h2>"


def page_html(n_items: int, tag: str = "x") -> str:
    items = "".join(
        f"<p>Crawl item body {tag} number {i} long enough</p>"
        for i in range(n_items)
    )
    return f"<html><body><main>{DATE_H}{items}</main></body></html>"


class TestRequestConfig:
    def test_default_auth_header(self, monkeypatch):
        monkeypatch.delenv(AUTH_ENV_VAR, raising=False)
        h = build_request_headers()
        assert h["authorization"].startswith("Basic ")
        assert "Mozilla/5.0" in h["user-agent"]
        assert h["accept-language"] == "en-US,en;q=0.9"

    def test_env_var_pair(self, monkeypatch):
        monkeypatch.setenv(AUTH_ENV_VAR, "alice:s3cret")
        h = build_request_headers()
        expected = base64.b64encode(b"alice:s3cret").decode()
        assert h["authorization"] == f"Basic {expected}"

    def test_explicit_pair_beats_env(self, monkeypatch):
        monkeypatch.setenv(AUTH_ENV_VAR, "alice:s3cret")
        h = build_request_headers("bob:pw")
        assert h["authorization"] == (
            "Basic " + base64.b64encode(b"bob:pw").decode()
        )


class TestFetchText:
    def test_ok(self):
        t = dict_transport({"u": (200, {}, "body")}, require_auth=False)
        assert fetch_text(t, "u", {}) == "body"

    def test_non_2xx_raises_with_reference_message(self):
        t = dict_transport({"u": (503, {}, "")}, require_auth=False)
        with pytest.raises(HttpStatusError, match=r"HTTP 503 for u"):
            fetch_text(t, "u", {})

    def test_404_for_unknown_url(self):
        t = dict_transport({}, require_auth=False)
        with pytest.raises(HttpStatusError, match=r"HTTP 404"):
            fetch_text(t, "nope", {})

    def test_redirect_followed(self):
        t = dict_transport(
            {"a": (302, {"location": "b"}, ""), "b": (200, {}, "end")},
            require_auth=False,
        )
        assert fetch_text(t, "a", {}) == "end"

    def test_redirect_loop_raises(self):
        t = dict_transport(
            {"a": (302, {"location": "b"}, ""), "b": (301, {"location": "a"}, "")},
            require_auth=False,
        )
        with pytest.raises(HttpStatusError):
            fetch_text(t, "a", {})

    def test_missing_auth_401(self):
        t = dict_transport({"u": (200, {}, "body")})  # require_auth=True
        with pytest.raises(HttpStatusError, match=r"HTTP 401"):
            fetch_text(t, "u", {})
        # and the built headers satisfy it
        assert fetch_text(t, "u", build_request_headers()) == "body"


class TestPageUrl:
    def test_first_page_no_suffix(self):
        assert page_url("http://o", "slug", 1) == "http://o/rumors/tag/slug/"

    def test_later_pages(self):
        assert (
            page_url("http://o", "slug", 4) == "http://o/rumors/tag/slug/page/4/"
        )


def serve(pages: dict[int, tuple[int, dict, str]]):
    mapping = {
        page_url("http://o", "s", n): resp for n, resp in pages.items()
    }
    return dict_transport(mapping, require_auth=False)


class TestCrawl:
    def test_break_on_error_keeps_partial(self):
        t = serve(
            {
                1: (200, {}, page_html(3, "a")),
                2: (200, {}, page_html(3, "b")),
                3: (500, {}, ""),
                4: (200, {}, page_html(3, "c")),  # never reached
            }
        )
        items, debug = crawl_tag(t, "http://o", "s", max_pages=10)
        assert len(items) == 6
        assert {it["page"] for it in items} == {1, 2}
        assert "page3Error_s" in debug
        assert "HTTP 500" in debug["page3Error_s"]

    def test_missing_page_stops_scan(self):
        t = serve({1: (200, {}, page_html(2, "a"))})
        items, debug = crawl_tag(t, "http://o", "s", max_pages=10)
        assert len(items) == 2
        assert "page2Error_s" in debug

    def test_dedup_across_pages(self):
        # identical items on two pages: date::title::url key dedups
        # (fetchRumors.js:141-146)
        same = page_html(3, "same")
        t = serve({1: (200, {}, same), 2: (200, {}, same), 3: (404, {}, "")})
        items, _ = crawl_tag(t, "http://o", "s", max_pages=10)
        assert len(items) == 3
        assert all(it["page"] == 1 for it in items)

    def test_total_cap_stops_pagination(self):
        t = serve({n: (200, {}, page_html(60, f"p{n}")) for n in range(1, 11)})
        items, _ = crawl_tag(t, "http://o", "s", max_pages=10, total_limit=150)
        assert len(items) == 150
        # cap reached after page 3 (60+60+60) -> page 4 never fetched
        assert max(it["page"] for it in items) == 3

    def test_per_page_limit(self):
        t = serve({1: (200, {}, page_html(100, "a")), 2: (404, {}, "")})
        items, _ = crawl_tag(t, "http://o", "s", per_page_limit=80)
        assert len(items) == 80
