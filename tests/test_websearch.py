"""Websearch: 5 providers behind the ABC, reference merge/rank semantics,
search fallback ladder, llms.txt discovery, and the jina -> readability
reader ladder — all against an in-process stub web (httpx MockTransport).
Reference: api/web.py:185 (merge), :311-373 (reader ladder), :380
(search ladder); websearch/search/providers/*."""

import httpx
import pytest

from super_rag_tpu.websearch.readability import extract_readable
from super_rag_tpu.websearch.service import (
    SearchResult,
    WebSearchService,
    merge_and_rank,
)

DDG_HTML = """
<html><body>
<a class="result__a" href="https://a.com/1">Alpha One</a>
<div class="result__snippet">first snippet</div>
<a class="result__a" href="https://b.com/2">Beta Two</a>
<div class="result__snippet">second snippet</div>
</body></html>
"""

ARTICLE_HTML = """
<html><head><title>The Article</title></head><body>
<nav><a href="/x">Home</a> <a href="/y">About</a> <a href="/z">More</a></nav>
<header><a href="/login">Log in here now</a></header>
<article>
<h1>Main headline</h1>
<p>This is the first real paragraph of the article, with enough prose to
be clearly content. It talks about things, at length, with commas and
periods. The quick brown fox jumps over the lazy dog repeatedly.</p>
<p>A second paragraph continues the discussion in detail, because real
articles have multiple dense paragraphs of actual text content.</p>
</article>
<footer><a href="/privacy">Privacy</a> <a href="/terms">Terms</a></footer>
</body></html>
"""


class StubWeb:
    def __init__(self):
        self.calls = []
        self.fail = set()  # provider hosts that should 500

    def handler(self, request: httpx.Request) -> httpx.Response:
        host = request.url.host
        self.calls.append(host)
        if host in self.fail:
            return httpx.Response(500, text="down")
        if host == "html.duckduckgo.com":
            return httpx.Response(200, text=DDG_HTML)
        if host == "s.jina.ai":
            return httpx.Response(200, json={"data": [
                {"title": "Jina Hit", "url": "https://j.com/1",
                 "description": "jina snippet"},
                {"title": "Dup of A", "url": "https://a.com/1",
                 "description": "same url as ddg"},
            ]})
        if host == "www.googleapis.com":
            return httpx.Response(200, json={"items": [
                {"title": "Google Hit", "link": "https://g.com/1",
                 "snippet": "google snippet"},
            ]})
        if host == "api.yep.com":
            return httpx.Response(200, json=[
                "Ok", {"results": [
                    {"type": "Organic", "title": "Yep <b>Hit</b>",
                     "url": "https://y.com/1", "snippet": "yep snippet"},
                ]}])
        if host == "docs.example.com":
            if request.url.path == "/llms.txt":
                return httpx.Response(200, text=(
                    "# Docs\n"
                    "[Quickstart](https://docs.example.com/qs): get going\n"
                    "[API Reference](https://docs.example.com/api): "
                    "endpoints and auth\n"
                ))
            return httpx.Response(404)
        if host == "r.jina.ai":
            return httpx.Response(200, text="jina-extracted body text")
        if host == "page.test":
            return httpx.Response(200, text=ARTICLE_HTML)
        return httpx.Response(404)


@pytest.fixture
def stub():
    return StubWeb()


def svc(stub, **kw):
    return WebSearchService(transport=httpx.MockTransport(stub.handler), **kw)


def test_five_providers_registered(stub):
    s = svc(stub, jina_api_key="k", google_api_key="g", google_cx="cx")
    assert [p.name for p in s.providers] == [
        "jina", "duckduckgo", "google", "yep", "llm_txt"]


def test_merge_and_rank_reference_semantics():
    a = [SearchResult("A1", "https://a/1", "", "p1", 1),
         SearchResult("A2", "https://a/2", "", "p1", 2)]
    b = [SearchResult("B1", "https://a/1", "", "p2", 1),  # dup url
         SearchResult("B2", "https://b/2", "", "p2", 2)]
    out = merge_and_rank([a, b], 10)
    urls = [r.url for r in out]
    assert urls == ["https://a/1", "https://b/2", "https://a/2"] or \
        urls == ["https://a/1", "https://a/2", "https://b/2"]
    # dedup kept the FIRST provider's version
    assert out[0].provider == "p1"
    # ranks re-sequenced 1..n
    assert [r.rank for r in out] == [1, 2, 3]


def test_explicit_providers_merge(stub):
    s = svc(stub, jina_api_key="k")
    res = s.search("q", max_results=10,
                   providers=["jina", "duckduckgo", "yep"])
    urls = {r["url"] for r in res}
    assert {"https://j.com/1", "https://a.com/1", "https://b.com/2",
            "https://y.com/1"} <= urls
    # the duplicate url appears once, owned by jina (first in list)
    owners = [r["provider"] for r in res if r["url"] == "https://a.com/1"]
    assert owners == ["jina"]


def test_ladder_prefers_jina_then_falls_back(stub):
    s = svc(stub, jina_api_key="k")
    res = s.search("q", max_results=5)
    assert all(r["provider"] == "jina" for r in res)
    # jina down -> duckduckgo serves
    stub.fail.add("s.jina.ai")
    res = s.search("q", max_results=5)
    assert res and all(r["provider"] == "duckduckgo" for r in res)
    # ddg down too -> yep is the last rung
    stub.fail.add("html.duckduckgo.com")
    res = s.search("q", max_results=5)
    assert res and all(r["provider"] == "yep" for r in res)
    # everything down -> empty, no exception
    stub.fail.add("api.yep.com")
    assert s.search("q", max_results=5) == []


def test_no_key_ladder_starts_at_ddg(stub):
    s = svc(stub)
    res = s.search("q")
    assert res[0]["provider"] == "duckduckgo"
    assert "s.jina.ai" not in stub.calls


def test_google_provider(stub):
    s = svc(stub, google_api_key="g", google_cx="cx")
    res = s.search("q", providers=["google"])
    assert res[0]["url"] == "https://g.com/1"


def test_llms_txt_discovery(stub):
    s = svc(stub)
    res = s.search("", source="docs.example.com", providers=["llm_txt"],
                   max_results=5)
    assert {r["url"] for r in res} == {"https://docs.example.com/qs",
                                       "https://docs.example.com/api"}
    # query filters the link list
    res = s.search("endpoints", source="docs.example.com",
                   providers=["llm_txt"])
    assert [r["url"] for r in res] == ["https://docs.example.com/api"]


def test_source_only_routes_to_llms_txt(stub):
    s = svc(stub)
    res = s.search("", source="docs.example.com")
    assert res and all(r["provider"] == "llm_txt" for r in res)


def test_reader_ladder_jina_then_local(stub):
    s = svc(stub, jina_api_key="k")
    pages = s.read(["https://page.test/x"])
    assert pages[0]["reader"] == "jina"
    assert pages[0]["text"] == "jina-extracted body text"
    stub.fail.add("r.jina.ai")
    pages = s.read(["https://page.test/x"])
    assert pages[0]["reader"] == "readability"
    assert "first real paragraph" in pages[0]["text"]


def test_reader_error_status(stub):
    s = svc(stub)
    pages = s.read(["https://missing.test/x"])
    assert pages[0]["status"] == "error"


def test_readability_drops_boilerplate():
    text = extract_readable(ARTICLE_HTML)
    assert "The Article" in text  # title kept
    assert "first real paragraph" in text
    assert "second paragraph" in text
    assert "Privacy" not in text and "Log in" not in text
    assert "Home" not in text


def test_readability_survives_broken_html():
    text = extract_readable("<p>unclosed <div>nested <b>bold"
                            "<p>More prose here with, commas. And periods.")
    assert "More prose" in text


def test_readability_link_farm_drops():
    farm = "<body><div>" + " ".join(
        f'<a href="/{i}">link {i}</a>' for i in range(50)
    ) + "</div><p>" + "Real prose sentence, with commas. " * 10 + \
        "</p></body>"
    text = extract_readable(farm)
    assert "Real prose" in text
    assert "link 3" not in text
