"""LLM client layer against a stub OpenAI-compatible server."""

import asyncio
import json
import threading

import httpx
import pytest

from super_rag_tpu.api.http import HttpServer, Request, Response, Router
from super_rag_tpu.llm.client import OpenAICompatClient, ResponseCache
from super_rag_tpu.llm.errors import (
    AuthenticationError,
    RateLimitError,
    is_retryable_error,
    wrap_provider_error,
)
from super_rag_tpu.llm.resolver import ModelResolver, RemoteEmbedder
from super_rag_tpu.store.db import Database


class StubProvider:
    """Minimal OpenAI-compatible server on our own HTTP runtime."""

    def __init__(self):
        self.calls = {"completions": 0, "embeddings": 0, "rerank": 0}
        self.fail_next = 0  # respond 503 this many times
        router = Router()

        async def completions(req: Request) -> Response:
            self.calls["completions"] += 1
            if self.fail_next > 0:
                self.fail_next -= 1
                return Response.json({"error": "overloaded"}, status=503)
            if req.headers.get("authorization") == "Bearer bad":
                return Response.json({"error": "bad key"}, status=401)
            body = req.json()
            prompt = body["messages"][-1]["content"]
            return Response.json({
                "choices": [{"message": {"content": f"echo:{prompt}"}}],
                "usage": {"prompt_tokens": 5, "completion_tokens": 2},
            })

        async def embeddings(req: Request) -> Response:
            self.calls["embeddings"] += 1
            texts = req.json()["input"]
            return Response.json({
                "data": [{"index": i, "embedding": [float(len(t)), 1.0]}
                         for i, t in enumerate(texts)],
            })

        async def rerank(req: Request) -> Response:
            self.calls["rerank"] += 1
            docs = req.json()["documents"]
            return Response.json({
                "results": [
                    {"index": i, "relevance_score": float(i)}
                    for i in range(len(docs))
                ] + [{"index": 99, "relevance_score": 1.0}],  # invalid idx
            })

        router.add("POST", "/v1/chat/completions", completions)
        router.add("POST", "/v1/embeddings", embeddings)
        router.add("POST", "/v1/rerank", rerank)
        self.server = HttpServer(router)
        self.loop = asyncio.new_event_loop()
        started = threading.Event()

        def run():
            asyncio.set_event_loop(self.loop)
            self.loop.run_until_complete(self.server.start("127.0.0.1", 0))
            started.set()
            self.loop.run_forever()

        threading.Thread(target=run, daemon=True).start()
        started.wait(10)

    @property
    def url(self):
        return f"http://127.0.0.1:{self.server.port}/v1"


@pytest.fixture(scope="module")
def stub():
    return StubProvider()


def client_for(stub, tmp_path, **kw):
    return OpenAICompatClient(
        stub.url, api_key="ok", model="m1",
        cache=ResponseCache(str(tmp_path / "cache.db")), **kw,
    )


def test_complete(stub, tmp_path):
    c = client_for(stub, tmp_path)
    assert c.complete(prompt="hello") == "echo:hello"
    assert c.stats.snapshot()["calls"] == 1
    assert c.stats.snapshot()["prompt_tokens"] == 5


def test_completion_cache_at_temperature_zero(stub, tmp_path):
    c = client_for(stub, tmp_path)
    before = stub.calls["completions"]
    a = c.complete(prompt="cached", temperature=0.0)
    b = c.complete(prompt="cached", temperature=0.0)
    assert a == b == "echo:cached"
    assert stub.calls["completions"] == before + 1  # second was a cache hit
    assert c.cache.hits >= 1


def test_embed_order_preserved(stub, tmp_path):
    c = client_for(stub, tmp_path)
    out = c.embed(["a", "bbb", "cc"], use_cache=False)
    assert [row[0] for row in out] == [1.0, 3.0, 2.0]


def test_rerank_filters_invalid_indices(stub, tmp_path):
    c = client_for(stub, tmp_path)
    out = c.rerank("q", ["d0", "d1"])
    assert [r["index"] for r in out] == [0, 1]  # index 99 dropped


def test_retry_on_503(stub, tmp_path):
    c = client_for(stub, tmp_path, max_retries=3)
    stub.fail_next = 2
    assert c.complete(prompt="retry me") == "echo:retry me"


def test_auth_error_not_retried(stub, tmp_path):
    c = OpenAICompatClient(stub.url, api_key="bad", model="m1",
                           cache_enabled=False, max_retries=3)
    before = stub.calls["completions"]
    with pytest.raises(AuthenticationError):
        c.complete(prompt="x")
    assert stub.calls["completions"] == before + 1  # single attempt


def test_error_taxonomy():
    r = httpx.Response(429, text="slow down",
                       request=httpx.Request("POST", "http://x"))
    err = wrap_provider_error(
        httpx.HTTPStatusError("", request=r.request, response=r)
    )
    assert isinstance(err, RateLimitError) and is_retryable_error(err)


def test_resolver_and_remote_embedder(stub, tmp_path):
    db = Database(str(tmp_path / "r.db"))
    db.upsert_provider("stub", base_url=stub.url)
    db.upsert_model("stub", "embedding", "m-embed",
                    tags=["default_for_embedding"])
    db.set_provider_key("stub", "public", "ok")
    resolver = ModelResolver(db)
    client = resolver.embedding_client({})
    assert client is not None and client.model == "m-embed"
    assert resolver.probe_embedding_dim(client) == 2
    emb = RemoteEmbedder(client)
    out = emb.embed(["xy", "z"])
    assert out.shape == (2, 2)


def test_resolver_returns_none_when_unconfigured(tmp_path):
    db = Database(str(tmp_path / "e.db"))
    assert ModelResolver(db).completion_client({}) is None


def test_prompt_library():
    from super_rag_tpu.llm import prompts

    # every template placeholder renders
    assert "{context}" in prompts.RAG_ANSWER
    assert prompts.RAG_ANSWER.format(context="c", query="q")
    assert prompts.CHAT_ANSWER.format(history="h", context="c", query="q")
    assert prompts.CHAT_TITLE.format(first_message="hello")
    assert prompts.AGENT_SYSTEM.format(tool_descriptions="t", history="h",
                                       query="q")
    assert prompts.SUMMARY_MAP.format(text="t")
    assert prompts.SUMMARY_REDUCE.format(title="t", parts="p")
    assert prompts.KG_EXTRACTION.format(text="t")

    p = prompts.build_agent_query_prompt(
        "what is x",
        history=[{"role": "user", "parts": [{"type": "text", "text": "hi"}]},
                 {"role": "assistant",
                  "parts": [{"type": "references", "references": []}]}],
        collection_titles=["kb"],
    )
    assert "user: hi" in p and "what is x" in p and "kb" in p
    # empty history and scope degrade to placeholders, not KeyErrors
    p2 = prompts.build_agent_query_prompt("q")
    assert "(no prior messages)" in p2 and "(none)" in p2
