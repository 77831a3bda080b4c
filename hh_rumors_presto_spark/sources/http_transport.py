"""HTTP-shaped transport contract for the paged crawl (SURVEY.md §2.A
row 5 — the reference's fetch layer, fetchRumors.js:14-56 and the crawl
loop fetchRumors.js:126-151).

The container is sandboxed (no outbound network), so the transport is a
callable ``transport(url, headers) -> (status, headers, body)`` — an
in-process fixture in tests and driver runs, a real ``urllib`` GET in
deployment. Everything AROUND that callable reproduces the reference's
behavior:

- request config: Basic-Auth pair from an env var with a default
  (fetchRumors.js:17-20 — env name and default are ours, no reference
  credentials), spoofed browser user-agent + accept-language
  (fetchRumors.js:22-28);
- redirect-follow on 3xx Location up to a hop limit
  (``redirect: "follow"``, fetchRumors.js:29);
- non-2xx -> ``HttpStatusError("HTTP {status} for {url}")``
  (fetchRumors.js:53-55);
- page-URL scheme ``{origin}/rumors/tag/{slug}/`` +
  ``page/{n}/`` for n>1 (fetchRumors.js:131);
- crawl loop: serial pages 1..max, break on the first transport error
  KEEPING pages already fetched (fetchRumors.js:133-138), per-item
  dedup on ``date::title[:120]::url`` (fetchRumors.js:141-146), stop
  once the total cap is reached (fetchRumors.js:148).

Scale note: the crawl is driver-sequenced by nature (page N's failure
decides whether N+1 is fetched); each fetched page's PARSE is pure and
runs wherever the page row lands — the scan_http_crawl query feeds pages
through the same Arrow-batched extractor as extract_page_items.
"""

from __future__ import annotations

import base64
import os
from collections.abc import Callable

from hh_rumors_presto_spark.functions.page_extract import parse_tag_page

# (status, headers, body)
TransportResult = tuple[int, dict[str, str], str]
Transport = Callable[[str, dict[str, str]], TransportResult]

AUTH_ENV_VAR = "HH_SPARK_BASIC_AUTH"
_DEFAULT_AUTH_PAIR = "user:password"  # neutral stand-in, not a real secret

USER_AGENT = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120 Safari/537.36"
)

_REDIRECT_STATUSES = frozenset({301, 302, 303, 307, 308})
MAX_REDIRECTS = 5


class HttpStatusError(Exception):
    """Non-2xx response (the reference throws `HTTP {status} for {url}`)."""

    def __init__(self, status: int, url: str):
        super().__init__(f"HTTP {status} for {url}")
        self.status = status
        self.url = url


def build_request_headers(auth_pair: str | None = None) -> dict[str, str]:
    """The reference's request config: spoofed UA, accept-language, and a
    Basic authorization header from an env-var pair with a default."""
    pair = auth_pair or os.environ.get(AUTH_ENV_VAR) or _DEFAULT_AUTH_PAIR
    token = base64.b64encode(pair.encode()).decode()
    return {
        "user-agent": USER_AGENT,
        "accept-language": "en-US,en;q=0.9",
        "authorization": f"Basic {token}",
    }


def fetch_text(
    transport: Transport, url: str, headers: dict[str, str]
) -> str:
    """GET with redirect-follow; non-2xx raises HttpStatusError."""
    for _ in range(MAX_REDIRECTS + 1):
        status, resp_headers, body = transport(url, headers)
        if status in _REDIRECT_STATUSES:
            location = resp_headers.get("location")
            if not location:
                raise HttpStatusError(status, url)
            url = location
            continue
        if not 200 <= status < 300:
            raise HttpStatusError(status, url)
        return body
    raise HttpStatusError(310, url)  # redirect loop exhausted


def page_url(origin: str, slug: str, page: int) -> str:
    """{origin}/rumors/tag/{slug}/ (+ page/{n}/ beyond page 1)."""
    suffix = f"page/{page}/" if page > 1 else ""
    return f"{origin}/rumors/tag/{slug}/{suffix}"


def crawl_tag(
    transport: Transport,
    origin: str,
    slug: str,
    max_pages: int = 10,
    total_limit: int = 150,
    per_page_limit: int = 80,
    auth_pair: str | None = None,
) -> tuple[list[dict], dict]:
    """collectFromOneTag (fetchRumors.js:126-151): serial page crawl with
    break-on-error-keep-partial, per-item dedup, and a total cap.

    Returns ``(items, debug)`` — each item dict carries the extractor
    fields plus ``page``; debug records per-page errors under
    ``page{n}Error_{slug}`` exactly like the reference's dbg object."""
    headers = build_request_headers(auth_pair)
    items: list[dict] = []
    seen: set[str] = set()
    debug: dict = {}
    for page in range(1, max_pages + 1):
        url = page_url(origin, slug, page)
        try:
            html = fetch_text(transport, url, headers)
        except Exception as e:  # stop the scan, keep partial results
            debug[f"page{page}Error_{slug}"] = str(e)
            break
        for it in parse_tag_page(html, max_items=per_page_limit):
            key = f"{it['date_iso']}::{it['title'][:120]}::{it['url']}"
            if key in seen:
                continue
            seen.add(key)
            items.append({**it, "page": page})
        if len(items) >= total_limit:
            break
    return items[:total_limit], debug


def dict_transport(
    pages: dict[str, TransportResult], require_auth: bool = True
) -> Transport:
    """Fixture transport over a url -> (status, headers, body) mapping.
    Unknown URLs 404; missing/blank authorization 401 when
    ``require_auth`` — so tests prove the header config is actually
    applied."""

    def transport(url: str, headers: dict[str, str]) -> TransportResult:
        if require_auth and not headers.get("authorization", "").startswith(
            "Basic "
        ):
            return 401, {}, "unauthorized"
        return pages.get(url, (404, {}, "not found"))

    return transport
