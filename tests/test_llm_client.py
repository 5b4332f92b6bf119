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


def test_resolver_reuses_clients_across_calls(stub, tmp_path):
    """Per-search resolution must not construct (and leak) a fresh httpx
    pool per query: same resolved identity -> same client object; a
    late-registered provider changes the identity -> new client."""
    db = Database(str(tmp_path / "cc.db"))
    db.upsert_provider("stub", base_url=stub.url)
    db.upsert_model("stub", "rerank", "m-rr", tags=["default_for_rerank"])
    resolver = ModelResolver(db)
    c1 = resolver.rerank_client({})
    c2 = resolver.rerank_client({})
    assert c1 is c2
    # re-tagging a different model re-resolves to a NEW client
    db.upsert_model("stub", "rerank", "m-rr2", tags=["default_for_rerank"])
    c3 = resolver.rerank_client({"rerank": {"provider": "stub",
                                            "model": "m-rr2"}})
    assert c3 is not c1 and c3.model == "m-rr2"


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
    assert prompts.KG_EXTRACTION.format(text="t", types="  T")

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


# -- provider dialects (anthropic / dashscope / gemini) ----------------------


class StubDialects:
    """One server speaking the three non-openai dialect wire formats."""

    def __init__(self):
        self.seen: dict[str, dict] = {}
        router = Router()

        async def anthropic_messages(req: Request) -> Response:
            self.seen["anthropic"] = {"headers": dict(req.headers),
                                      "body": req.json()}
            body = req.json()
            text = body["messages"][-1]["content"]
            sys_part = f"[{body.get('system', '')}]" if body.get(
                "system") else ""
            return Response.json({
                "content": [
                    {"type": "thinking", "thinking": "hmm"},
                    {"type": "text", "text": f"{sys_part}claude:{text}"},
                ],
                "usage": {"input_tokens": 3, "output_tokens": 2},
            })

        async def ds_generation(req: Request) -> Response:
            self.seen["ds_gen"] = req.json()
            msg = req.json()["input"]["messages"][-1]["content"]
            return Response.json({
                "output": {"choices": [{"message": {"content": f"ds:{msg}"}}]}
            })

        async def ds_embed(req: Request) -> Response:
            texts = req.json()["input"]["texts"]
            # out-of-order on purpose: client must sort by text_index
            embs = [{"text_index": i, "embedding": [float(len(t)), 2.0]}
                    for i, t in enumerate(texts)][::-1]
            return Response.json({"output": {"embeddings": embs}})

        async def ds_rerank(req: Request) -> Response:
            self.seen["ds_rerank"] = req.json()
            docs = req.json()["input"]["documents"]
            return Response.json({"output": {"results": [
                {"index": i, "relevance_score": 1.0 / (i + 1)}
                for i in range(len(docs))
            ] + [{"index": -1, "relevance_score": 9.0}]}})

        async def gemini_generate(req: Request) -> Response:
            self.seen["gemini"] = {"headers": dict(req.headers),
                                   "body": req.json()}
            body = req.json()
            text = body["contents"][-1]["parts"][0]["text"]
            return Response.json({"candidates": [{
                "content": {"parts": [{"text": "gem:"}, {"text": text}]}
            }]})

        async def gemini_embed(req: Request) -> Response:
            reqs = req.json()["requests"]
            return Response.json({"embeddings": [
                {"values": [float(len(r["content"]["parts"][0]["text"]))]}
                for r in reqs
            ]})

        router.add("POST", "/v1/messages", anthropic_messages)
        router.add("POST",
                   "/api/v1/services/aigc/text-generation/generation",
                   ds_generation)
        router.add("POST",
                   "/api/v1/services/embeddings/text-embedding/text-embedding",
                   ds_embed)
        router.add("POST", "/api/v1/services/rerank/text-rerank/text-rerank",
                   ds_rerank)
        router.add("POST", "/v1beta/models/g1:generateContent",
                   gemini_generate)
        router.add("POST", "/v1beta/models/g1:batchEmbedContents",
                   gemini_embed)
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
        return f"http://127.0.0.1:{self.server.port}"


@pytest.fixture(scope="module")
def dialects():
    return StubDialects()


def test_anthropic_complete_hoists_system(dialects, tmp_path):
    from super_rag_tpu.llm.client import AnthropicClient

    c = AnthropicClient(dialects.url, api_key="sk-a", model="c3",
                        cache=ResponseCache(str(tmp_path / "a.db")))
    out = c.complete(messages=[
        {"role": "system", "content": "be brief"},
        {"role": "user", "content": "hi"},
    ])
    assert out == "[be brief]claude:hi"  # thinking block skipped
    sent = dialects.seen["anthropic"]
    assert sent["headers"].get("x-api-key") == "sk-a"
    assert sent["headers"].get("anthropic-version")
    assert "authorization" not in sent["headers"]
    assert all(m["role"] != "system" for m in sent["body"]["messages"])
    assert sent["body"]["max_tokens"] > 0  # required by the Messages API


def test_anthropic_has_no_embed_or_rerank(dialects):
    from super_rag_tpu.llm.client import AnthropicClient
    from super_rag_tpu.llm.errors import BadRequestError

    c = AnthropicClient(dialects.url, model="c3", cache_enabled=False)
    with pytest.raises(BadRequestError):
        c.embed(["x"])
    with pytest.raises(BadRequestError):
        c.rerank("q", ["d"])


def test_dashscope_dialect(dialects, tmp_path):
    from super_rag_tpu.llm.client import DashScopeClient

    c = DashScopeClient(dialects.url, api_key="k", model="qwen",
                        cache=ResponseCache(str(tmp_path / "d.db")))
    assert c.complete(prompt="ping") == "ds:ping"
    emb = c.embed(["ab", "xyz"])  # stub returns rows reversed
    assert emb == [[2.0, 2.0], [3.0, 2.0]]
    rr = c.rerank("q", ["d0", "d1"], top_n=2)
    assert [r["index"] for r in rr] == [0, 1]  # invalid -1 filtered
    assert dialects.seen["ds_rerank"]["parameters"]["top_n"] == 2
    assert dialects.seen["ds_rerank"]["parameters"]["return_documents"] is False


def test_gemini_dialect(dialects, tmp_path):
    from super_rag_tpu.llm.client import GeminiClient
    from super_rag_tpu.llm.errors import BadRequestError

    c = GeminiClient(dialects.url, api_key="gk", model="g1",
                     cache=ResponseCache(str(tmp_path / "g.db")))
    out = c.complete(messages=[
        {"role": "system", "content": "s"},
        {"role": "assistant", "content": "prev"},
        {"role": "user", "content": "q1"},
    ])
    assert out == "gem:q1"  # multi-part joined
    sent = dialects.seen["gemini"]
    assert sent["headers"].get("x-goog-api-key") == "gk"
    roles = [c_["role"] for c_ in sent["body"]["contents"]]
    assert roles == ["model", "user"]  # assistant->model, system hoisted
    assert sent["body"]["systemInstruction"]["parts"][0]["text"] == "s"
    assert c.embed(["abc", "de"]) == [[3.0], [2.0]]
    with pytest.raises(BadRequestError):
        c.rerank("q", ["d"])


def test_make_client_dispatch(tmp_path):
    from super_rag_tpu.llm.client import (
        AnthropicClient,
        DashScopeClient,
        GeminiClient,
        make_client,
    )

    kw = dict(base_url="http://x", cache_enabled=False)
    assert type(make_client("openai", **kw)) is OpenAICompatClient
    assert type(make_client("Anthropic", **kw)) is AnthropicClient
    assert type(make_client("dashscope", **kw)) is DashScopeClient
    assert type(make_client("gemini", **kw)) is GeminiClient
    assert type(make_client("unknown-thing", **kw)) is OpenAICompatClient
    assert type(make_client("", **kw)) is OpenAICompatClient


def test_resolver_uses_provider_api_type(dialects, tmp_path):
    from super_rag_tpu.llm.client import DashScopeClient

    db = Database(str(tmp_path / "dlt.db"))
    db.upsert_provider("ds", base_url=dialects.url, api_type="dashscope")
    db.upsert_model("ds", "rerank", "qwen-rr", tags=["default_for_rerank"])
    resolver = ModelResolver(db)
    client = resolver.rerank_client({})
    assert isinstance(client, DashScopeClient)
    rr = client.rerank("q", ["a", "b", "c"])
    assert [r["index"] for r in rr] == [0, 1, 2]


def test_per_collection_rerank_reaches_remote_dialect(dialects, tmp_path):
    """Regression: the search DAG's rerank node must use the COLLECTION
    config's rerank ModelSpec (resolved at search time), not a boot-time
    constant — a dialect provider registered after startup was silently
    ignored (caught by the round-4 server drive)."""
    import asyncio as aio

    from super_rag_tpu.config import Settings
    from super_rag_tpu.service.collection_service import CollectionService
    from super_rag_tpu.service.context import build_context

    cfg = Settings(data_dir=str(tmp_path), embedding_dim=64,
                   index_dtype="float32", vocab_size=1 << 14)
    ctx = build_context(cfg)
    # provider registered AFTER the context was built
    ctx.db.upsert_provider("ds", base_url=dialects.url,
                           api_type="dashscope")
    collections = CollectionService(ctx)
    coll = collections.create(
        "u", "kb", config={"rerank": {"provider": "ds", "model": "qwen"}}
    )
    eng = ctx.engines.get(coll["id"], coll["config"])
    eng.ingest([f"passage {i} about topic {i}" for i in range(6)])

    res = aio.run(collections.execute_search(
        "u", coll["id"], "topic 3", top_k=3, use_rerank=True,
    ))
    assert res["items"], res
    # the stub scores index i as float(i): rerank visibly reordered
    assert any(it["recall_type"] == "reranked" for it in res["items"])
    # and the REMOTE dialect endpoint is what scored this exact query
    assert dialects.seen["ds_rerank"]["input"]["query"] == "topic 3"
