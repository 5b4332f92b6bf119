"""Web search + page reading with pluggable providers.

Counterpart of the reference's websearch subsystem (super_rag/websearch/
+ api/web.py): FIVE search providers behind one ABC — duckduckgo, google,
jina, yep, llms.txt discovery (websearch/search/providers/) — with the
reference's merge/rank semantics (api/web.py:185 _merge_and_rank_results:
dedup by URL keeping first, stable sort by provider rank, re-sequence),
its search fallback ladder (jina -> duckduckgo -> yep, api/web.py:380),
and a reader service with the jina-reader -> local-readability ladder
(api/web.py:311-373; trafilatura's role is played by
websearch/readability.py — paragraph text/link-density extraction).

Providers use plain httpx; environments without egress get empty results
plus an explicit 'offline' flag rather than exceptions.  ``transport``
injects an httpx transport so tests run against an in-process stub.
"""

from __future__ import annotations

import html as html_lib
import logging
import re
from dataclasses import dataclass
from typing import Optional
from urllib.parse import quote, urlsplit

import httpx

from super_rag_tpu.websearch.readability import extract_readable

logger = logging.getLogger(__name__)

__all__ = ["SearchResult", "Provider", "DuckDuckGoProvider", "JinaProvider",
           "GoogleProvider", "YepProvider", "LlmTxtProvider",
           "WebSearchService", "extract_readable", "merge_and_rank"]


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


def _domain(url: str) -> str:
    try:
        return (urlsplit(url).netloc or "").lower().removeprefix("www.")
    except ValueError:
        return ""


def merge_and_rank(per_provider: list[list[SearchResult]],
                   max_results: int) -> list[SearchResult]:
    """Reference merge semantics (api/web.py:185): concatenate, dedup by
    URL keeping the FIRST occurrence (provider order = priority), stable
    sort by each result's provider-local rank, re-sequence ranks."""
    seen: set[str] = set()
    unique: list[SearchResult] = []
    for results in per_provider:
        for r in results:
            if r.url and r.url not in seen:
                seen.add(r.url)
                unique.append(r)
    unique.sort(key=lambda r: r.rank)  # stable: ties keep provider order
    out = []
    for i, r in enumerate(unique[:max_results]):
        out.append(SearchResult(title=r.title, url=r.url, snippet=r.snippet,
                                provider=r.provider, rank=i + 1))
    return out


class Provider:
    name = "base"

    def search(self, query: str, max_results: int,
               source: Optional[str] = None) -> list[SearchResult]:
        """``source`` restricts to a site/domain (reference providers'
        site: handling)."""
        raise NotImplementedError

    @staticmethod
    def _site_query(query: str, source: Optional[str]) -> str:
        if not source:
            return query
        dom = _domain(source if "//" in source else "https://" + source)
        return f"site:{dom} {query}".strip() if dom else query


class DuckDuckGoProvider(Provider):
    name = "duckduckgo"

    def __init__(self, client: httpx.Client):
        self.client = client

    def search(self, query: str, max_results: int,
               source: Optional[str] = None) -> list[SearchResult]:
        r = self.client.get(
            "https://html.duckduckgo.com/html/",
            params={"q": self._site_query(query, source)},
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
                snippet=_strip_html(m.group(3)), provider=self.name,
                rank=i + 1,
            ))
        return out


class JinaProvider(Provider):
    """s.jina.ai search endpoint (needs an API key)."""

    name = "jina"

    def __init__(self, client: httpx.Client, api_key: str):
        self.client = client
        self.api_key = api_key

    def search(self, query: str, max_results: int,
               source: Optional[str] = None) -> list[SearchResult]:
        r = self.client.get(
            f"https://s.jina.ai/{quote(self._site_query(query, source))}",
            headers={"Authorization": f"Bearer {self.api_key}",
                     "Accept": "application/json"},
        )
        r.raise_for_status()
        data = r.json().get("data", [])[:max_results]
        return [
            SearchResult(title=d.get("title", ""), url=d.get("url", ""),
                         snippet=d.get("description", ""), provider=self.name,
                         rank=i + 1)
            for i, d in enumerate(data)
        ]


class GoogleProvider(Provider):
    """Google Programmable Search (Custom Search JSON API).

    The reference scrapes via googlesearch-python
    (websearch/search/providers/google_search_provider.py); the official
    JSON API is the stable equivalent and needs api_key + engine id."""

    name = "google"

    def __init__(self, client: httpx.Client, api_key: str, cx: str):
        self.client = client
        self.api_key = api_key
        self.cx = cx

    def search(self, query: str, max_results: int,
               source: Optional[str] = None) -> list[SearchResult]:
        params = {"key": self.api_key, "cx": self.cx,
                  "q": self._site_query(query, source),
                  "num": min(max_results, 10)}
        r = self.client.get("https://www.googleapis.com/customsearch/v1",
                            params=params)
        r.raise_for_status()
        items = r.json().get("items", [])[:max_results]
        return [
            SearchResult(title=d.get("title", ""), url=d.get("link", ""),
                         snippet=d.get("snippet", ""), provider=self.name,
                         rank=i + 1)
            for i, d in enumerate(items)
        ]


class YepProvider(Provider):
    """yep.com public search API (the reference wraps it via the
    yepsearch package — websearch/search/providers/yep_search_provider.py;
    same endpoint, no key required)."""

    name = "yep"

    def __init__(self, client: httpx.Client):
        self.client = client

    def search(self, query: str, max_results: int,
               source: Optional[str] = None) -> list[SearchResult]:
        r = self.client.get(
            "https://api.yep.com/fs/2/search",
            params={"client": "web", "gl": "all", "no_correct": "false",
                    "q": self._site_query(query, source),
                    "safeSearch": "off", "type": "web"},
            headers={"User-Agent": "Mozilla/5.0"},
        )
        r.raise_for_status()
        data = r.json()
        results = (data[1] if isinstance(data, list) and len(data) > 1
                   else data).get("results", [])
        out = []
        for d in results:
            if d.get("type") not in (None, "Organic", "web"):
                continue
            out.append(SearchResult(
                title=_strip_html(d.get("title", "")), url=d.get("url", ""),
                snippet=_strip_html(d.get("snippet", "")),
                provider=self.name, rank=len(out) + 1,
            ))
            if len(out) >= max_results:
                break
        return out


class LlmTxtProvider(Provider):
    """llms.txt discovery (reference llm_txt_search_provider.py): probe
    the domain's well-known llms.txt locations and return its link list
    as results.  Uses ``source`` as the domain; query filters links."""

    name = "llm_txt"
    PATHS = ("/llms.txt", "/.well-known/llms.txt", "/docs/llms.txt",
             "/api/llms.txt", "/reference/llms.txt")
    _LINK = re.compile(r"\[([^\]]+)\]\((https?://[^)\s]+)\)(?:\s*:\s*(.*))?")

    def __init__(self, client: httpx.Client):
        self.client = client

    def search(self, query: str, max_results: int,
               source: Optional[str] = None) -> list[SearchResult]:
        if not source:
            return []
        if source.endswith("llms.txt") and "//" in source:
            candidates = [source]
        else:
            dom = _domain(source if "//" in source else "https://" + source)
            if not dom:
                return []
            candidates = [f"https://{dom}{p}" for p in self.PATHS]
        content = ""
        for url in candidates:
            try:
                r = self.client.get(url, follow_redirects=True)
                if r.status_code == 200 and "[" in r.text:
                    content = r.text
                    break
            except Exception:  # noqa: BLE001 — try the next location
                continue
        if not content:
            return []
        terms = [t for t in query.lower().split() if t]
        out = []
        for m in self._LINK.finditer(content):
            title, url, desc = m.group(1), m.group(2), m.group(3) or ""
            hay = f"{title} {desc}".lower()
            if terms and not any(t in hay for t in terms):
                continue
            out.append(SearchResult(title=title.strip(), url=url,
                                    snippet=desc.strip(),
                                    provider=self.name, rank=len(out) + 1))
            if len(out) >= max_results:
                break
        return out


class WebSearchService:
    def __init__(self, jina_api_key: Optional[str] = None,
                 google_api_key: Optional[str] = None,
                 google_cx: Optional[str] = None,
                 timeout: float = 15.0, transport=None):
        self.client = httpx.Client(timeout=timeout, follow_redirects=True,
                                   transport=transport)
        self.jina_api_key = jina_api_key
        self.providers: list[Provider] = []
        if jina_api_key:
            self.providers.append(JinaProvider(self.client, jina_api_key))
        self.providers.append(DuckDuckGoProvider(self.client))
        if google_api_key and google_cx:
            self.providers.append(
                GoogleProvider(self.client, google_api_key, google_cx)
            )
        self.providers.append(YepProvider(self.client))
        self.providers.append(LlmTxtProvider(self.client))

    def _named(self, names: list[str]) -> list[Provider]:
        by = {p.name: p for p in self.providers}
        return [by[n] for n in names if n in by]

    def search(self, query: str, max_results: int = 5,
               providers: Optional[list[str]] = None,
               source: Optional[str] = None) -> list[dict]:
        """Multi-provider search with reference merge/rank + fallback.

        No ``providers`` given -> the reference's ladder (api/web.py:380):
        jina (when a key exists) else duckduckgo; on empty results fall
        through duckduckgo then yep.  Explicit ``providers`` -> query all
        of them and merge/rank.  ``source`` restricts to a domain (and
        activates llms.txt discovery when it is the only signal)."""
        if providers:
            chosen = self._named(providers)
        elif source and not query.strip():
            chosen = self._named(["llm_txt"])
        else:
            ladder = (["jina"] if self.jina_api_key else []) \
                + ["duckduckgo", "yep"]
            for name in ladder:
                res = self._try(self._named([name])[0], query, max_results,
                                source)
                if res:
                    return [r.to_dict() for r in
                            merge_and_rank([res], max_results)]
            return []
        per = []
        for p in chosen:
            res = self._try(p, query, max_results, source)
            if res:
                per.append(res)
        return [r.to_dict() for r in merge_and_rank(per, max_results)]

    def _try(self, p: Provider, query: str, max_results: int,
             source: Optional[str]) -> list[SearchResult]:
        try:
            return p.search(query, max_results, source=source)
        except Exception as e:  # noqa: BLE001 — offline or provider down
            logger.warning("web provider %s failed: %s", p.name, e)
            return []

    # -- reader (jina -> local readability ladder, api/web.py:311-373) ----

    def read(self, urls: list[str], max_chars: int = 20000) -> list[dict]:
        out = []
        for url in urls[:10]:
            page = None
            if self.jina_api_key:
                page = self._read_jina(url, max_chars)
            if page is None:
                page = self._read_local(url, max_chars)
            out.append(page)
        return out

    def _read_jina(self, url: str, max_chars: int) -> Optional[dict]:
        try:
            r = self.client.get(
                "https://r.jina.ai/" + url,
                headers={"Authorization": f"Bearer {self.jina_api_key}",
                         "Accept": "text/plain"},
            )
            r.raise_for_status()
            text = r.text.strip()
            if not text:
                return None
            return {"url": url, "status": "ok", "reader": "jina",
                    "text": text[:max_chars]}
        except Exception as e:  # noqa: BLE001 — ladder falls through
            logger.info("jina reader failed for %s: %s", url, e)
            return None

    def _read_local(self, url: str, max_chars: int) -> dict:
        try:
            r = self.client.get(url, headers={"User-Agent": "Mozilla/5.0"})
            r.raise_for_status()
            return {"url": url, "status": "ok", "reader": "readability",
                    "text": extract_readable(r.text, max_chars)}
        except Exception as e:  # noqa: BLE001
            return {"url": url, "status": "error", "error": str(e)}

    def close(self) -> None:
        self.client.close()
