"""End-to-end API tests over a real socket (httpx against our server)."""

import asyncio
import base64
import json
import threading

import httpx
import pytest

from super_rag_tpu.app import App
from super_rag_tpu.config import Settings


class ServerThread:
    """Runs the asyncio app in a thread; tests use sync httpx."""

    def __init__(self, tmp_path):
        self.cfg = Settings(
            data_dir=str(tmp_path), embedding_dim=64, index_dtype="float32",
            vocab_size=1 << 14, port=0,
        )
        self.loop = asyncio.new_event_loop()
        self.app = None
        self.started = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()
        assert self.started.wait(30)

    def _run(self):
        asyncio.set_event_loop(self.loop)

        async def boot():
            # in-process scheduler: uploads index synchronously (simplest
            # deterministic mode for tests)
            self.app = App(self.cfg, background_tasks=False)
            await self.app.start(port=0)
            self.started.set()

        self.loop.run_until_complete(boot())
        self.loop.run_forever()

    @property
    def base(self):
        return f"http://127.0.0.1:{self.app.port}"

    def stop(self):
        async def shutdown():
            await self.app.stop()

        fut = asyncio.run_coroutine_threadsafe(shutdown(), self.loop)
        fut.result(10)
        self.loop.call_soon_threadsafe(self.loop.stop)
        self.thread.join(10)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    srv = ServerThread(tmp_path_factory.mktemp("api"))
    yield srv
    srv.stop()


@pytest.fixture(scope="module")
def client(server):
    with httpx.Client(base_url=server.base, timeout=60) as c:
        r = c.post("/api/v1/auth/register",
                   json={"username": "alice", "password": "secret123"})
        assert r.status_code == 201, r.text
        r = c.post("/api/v1/auth/login",
                   json={"username": "alice", "password": "secret123"})
        assert r.status_code == 200
        token = r.json()["token"]
        c.headers["Authorization"] = f"Bearer {token}"
        yield c


def test_health(server):
    r = httpx.get(server.base + "/health")
    assert r.status_code == 200 and r.json()["status"] == "ok"


def test_auth_required(server):
    r = httpx.get(server.base + "/api/v1/collections")
    assert r.status_code == 401


def test_login_wrong_password(server):
    r = httpx.post(server.base + "/api/v1/auth/login",
                   json={"username": "alice", "password": "wrong"})
    assert r.status_code == 401


@pytest.fixture(scope="module")
def collection(client):
    r = client.post("/api/v1/collections",
                    json={"title": "kb", "description": "test"})
    assert r.status_code == 201, r.text
    return r.json()


def test_collection_crud(client, collection):
    r = client.get("/api/v1/collections")
    assert any(c["id"] == collection["id"] for c in r.json())
    r = client.get(f"/api/v1/collections/{collection['id']}")
    assert r.json()["title"] == "kb"
    r = client.put(f"/api/v1/collections/{collection['id']}",
                   json={"description": "updated"})
    assert r.json()["description"] == "updated"


MD = """# Handbook

## Retrieval

the fox jumps over the dog and runs into the forest.

## Hardware

TPUs multiply matrices using systolic arrays at high throughput.
"""


@pytest.fixture(scope="module")
def document(client, collection):
    r = client.post(
        f"/api/v1/collections/{collection['id']}/documents",
        json=[{"name": "handbook.md", "content": MD}],
    )
    assert r.status_code == 201, r.text
    return r.json()[0]


def test_document_indexed(client, document):
    r = client.get(f"/api/v1/documents/{document['id']}")
    doc = r.json()
    assert doc["status"] == "COMPLETE"
    assert doc["indexes"][0]["status"] == "ACTIVE"


def test_document_chunks(client, document):
    r = client.get(f"/api/v1/documents/{document['id']}/chunks")
    chunks = r.json()
    assert chunks and any("systolic" in c["text"] for c in chunks)


def test_search_route(client, collection, document):
    r = client.post(
        f"/api/v1/collections/{collection['id']}/searches",
        json={"query": "how do TPUs multiply matrices", "top_k": 2},
    )
    assert r.status_code == 201, r.text
    items = r.json()["items"]
    assert items and "systolic" in items[0]["text"]
    assert items[0]["rank"] == 1


def test_search_requires_query(client, collection):
    r = client.post(f"/api/v1/collections/{collection['id']}/searches", json={})
    assert r.status_code == 422


def test_multipart_upload(client, collection):
    r = client.post(
        f"/api/v1/collections/{collection['id']}/documents",
        files={"file": ("notes.md", b"# Notes\n\nzebra quantum banana.",
                        "text/markdown")},
    )
    assert r.status_code == 201, r.text
    doc = r.json()[0]
    r = client.post(
        f"/api/v1/collections/{collection['id']}/searches",
        json={"query": "zebra quantum banana", "top_k": 1},
    )
    assert "zebra" in r.json()["items"][0]["text"]


def test_duplicate_upload_conflict(client, collection):
    r = client.post(
        f"/api/v1/collections/{collection['id']}/documents",
        json=[{"name": "dup.md", "content": MD}],
    )
    assert r.status_code == 409


def test_preview_range(client, document):
    r = client.get(f"/api/v1/documents/{document['id']}/preview",
                   headers={"Range": "bytes=2-9"})
    assert r.status_code == 206
    assert r.content == MD.encode()[2:10]


def test_document_delete_removes_from_search(client, collection):
    r = client.post(
        f"/api/v1/collections/{collection['id']}/documents",
        json=[{"name": "temp.md", "content": "# T\n\nxylophone vortex."}],
    )
    did = r.json()[0]["id"]
    r = client.post(
        f"/api/v1/collections/{collection['id']}/searches",
        json={"query": "xylophone vortex", "top_k": 1},
    )
    assert "xylophone" in r.json()["items"][0]["text"]
    assert client.delete(f"/api/v1/documents/{did}").status_code == 204
    r = client.post(
        f"/api/v1/collections/{collection['id']}/searches",
        json={"query": "xylophone vortex", "top_k": 1},
    )
    items = r.json()["items"]
    assert not items or "xylophone" not in items[0]["text"]


def test_workflow_run(client, collection):
    defn = {
        "name": "wf",
        "graph": {
            "nodes": [
                {"id": "start", "type": "start", "data": {}},
                {"id": "vs", "type": "vector_search",
                 "data": {"input_values": {
                     "top_k": 3, "similarity_threshold": None,
                     "collection_ids": [collection["id"]]}}},
            ],
            "edges": [{"source": "start", "target": "vs",
                       "targetHandle": "query"}],
        },
    }
    r = client.post("/api/v1/workflows",
                    json={"title": "my flow", "definition": defn})
    assert r.status_code == 201, r.text
    wid = r.json()["id"]
    r = client.post(f"/api/v1/workflows/{wid}/run",
                    json={"inputs": {"query": "systolic arrays"}})
    assert r.status_code == 200, r.text
    out = r.json()["outputs"]
    assert out["vs"]["docs"], out
    r = client.get(f"/api/v1/workflows/{wid}/runs")
    runs = r.json()
    assert runs and runs[0]["status"] == "SUCCESS"
    r = client.get(f"/api/v1/workflow-runs/{runs[0]['id']}")
    assert any(nr["node_id"] == "vs" for nr in r.json()["node_runs"])


def test_node_type_catalog_route(client):
    r = client.get("/api/v1/nodeflow/node-types")
    assert {c["type"] for c in r.json()} >= {"start", "vector_search", "merge"}


def test_llm_provider_crud(client):
    r = client.post("/api/v1/llm_providers",
                    json={"name": "openai", "label": "OpenAI"})
    assert r.status_code == 201
    r = client.post("/api/v1/llm_providers/openai/models",
                    json={"api": "embedding", "model": "text-embedding-3-small",
                          "tags": ["default_for_embedding"]})
    assert r.status_code == 201
    r = client.get("/api/v1/llm/available_models?tag=default_for_embedding")
    assert any(m["model"] == "text-embedding-3-small" for m in r.json())


def test_marketplace_flow(server, client, collection):
    r = client.post(f"/api/v1/collections/{collection['id']}/publish")
    assert r.status_code == 200
    # bob subscribes and can read the shared collection
    with httpx.Client(base_url=server.base, timeout=30) as bob:
        bob.post("/api/v1/auth/register",
                 json={"username": "bob", "password": "hunter22"})
        token = bob.post("/api/v1/auth/login",
                         json={"username": "bob", "password": "hunter22"}
                         ).json()["token"]
        bob.headers["Authorization"] = f"Bearer {token}"
        r = bob.get("/api/v1/marketplace/collections")
        assert any(m["collection_id"] == collection["id"] for m in r.json())
        bob.post(f"/api/v1/marketplace/collections/{collection['id']}/subscribe")
        r = bob.post(
            f"/api/v1/collections/{collection['id']}/searches",
            json={"query": "systolic arrays", "top_k": 1},
        )
        assert r.status_code == 201, r.text
        # but bob cannot modify it
        r = bob.delete(f"/api/v1/collections/{collection['id']}")
        assert r.status_code == 403


def test_api_key_auth(server, client):
    r = client.post("/api/v1/apikeys", json={"description": "ci"})
    key = r.json()["key"]
    with httpx.Client(base_url=server.base, timeout=30) as c2:
        c2.headers["Authorization"] = f"Bearer {key}"
        assert c2.get("/api/v1/users/me").json()["username"] == "alice"
    assert client.delete(f"/api/v1/apikeys/{r.json()['id']}").status_code == 204


def test_chat_sse(client, collection):
    r = client.post("/api/v1/chats",
                    json={"title": "t", "collection_ids": [collection["id"]]})
    chat_id = r.json()["id"]
    with client.stream(
        "POST", f"/api/v1/chats/{chat_id}/completions",
        json={"message": "tell me about systolic arrays"},
    ) as r:
        assert r.status_code == 200
        assert r.headers["content-type"].startswith("text/event-stream")
        events = []
        for line in r.iter_lines():
            if line.startswith("event: "):
                events.append(line[7:])
    assert events[0] == "start" and events[-1] == "done"
    assert "references" in events and "delta" in events
    r = client.get(f"/api/v1/chats/{chat_id}")
    msgs = r.json()["messages"]
    assert [m["role"] for m in msgs] == ["user", "assistant"]


def test_chat_title_generation(client):
    chat_id = client.post("/api/v1/chats", json={}).json()["id"]
    # no user message yet -> 409
    r = client.post(f"/api/v1/chats/{chat_id}/title")
    assert r.status_code == 409
    with client.stream(
        "POST", f"/api/v1/chats/{chat_id}/completions",
        json={"message": "what is a systolic array used for"},
    ) as s:
        for _ in s.iter_lines():
            pass
    r = client.post(f"/api/v1/chats/{chat_id}/title")
    assert r.status_code == 200
    # offline fallback titles from the first user message
    assert "systolic" in r.json()["title"]


def test_audit_log(client):
    r = client.get("/api/v1/audit_logs?limit=5")
    assert r.status_code == 200
    assert len(r.json()) > 0
    assert r.json()[0]["path"].startswith("/api/v1")
    # reference hyphen dialect (api/audit.py:18,105)
    rows = client.get("/api/v1/audit-logs?limit=5")
    assert rows.status_code == 200 and rows.json()
    one = client.get(f"/api/v1/audit-logs/{rows.json()[0]['id']}")
    assert one.status_code == 200


def test_404_and_405(client):
    assert client.get("/api/v1/nope").status_code == 404
    assert client.delete("/health").status_code == 405


def test_chat_websocket(server, client, collection):
    """Drive the RFC6455 path with the websockets client library."""
    import websockets.sync.client as wsc

    r = client.post("/api/v1/chats",
                    json={"title": "ws", "collection_ids": [collection["id"]]})
    chat_id = r.json()["id"]
    token = client.headers["Authorization"].split(" ")[1]
    url = (server.base.replace("http://", "ws://")
           + f"/api/v1/chats/{chat_id}/connect")
    with wsc.connect(url, additional_headers={
        "Authorization": f"Bearer {token}"}) as ws:
        ws.send(json.dumps({"message": "what about the fox"}))
        events = []
        while True:
            ev = json.loads(ws.recv(timeout=30))
            events.append(ev["event"])
            if ev["event"] == "done":
                break
    assert events[0] == "start" and "delta" in events


def test_mcp_protocol(server, client, collection):
    """MCP JSON-RPC: initialize, tools/list, search tool call."""
    key = client.post("/api/v1/apikeys", json={"description": "mcp"}).json()["key"]
    with httpx.Client(base_url=server.base, timeout=60,
                      headers={"Authorization": f"Bearer {key}"}) as mcp:
        r = mcp.post("/mcp", json={"jsonrpc": "2.0", "id": 1,
                                   "method": "initialize", "params": {}})
        assert r.json()["result"]["serverInfo"]["name"] == "super-rag-tpu"
        r = mcp.post("/mcp", json={"jsonrpc": "2.0", "id": 2,
                                   "method": "tools/list"})
        names = {t["name"] for t in r.json()["result"]["tools"]}
        assert {"list_collections", "search_collection"} <= names
        r = mcp.post("/mcp", json={
            "jsonrpc": "2.0", "id": 3, "method": "tools/call",
            "params": {"name": "list_collections", "arguments": {}}})
        body = json.loads(r.json()["result"]["content"][0]["text"])
        assert any(c["id"] == collection["id"] for c in body["collections"])
        r = mcp.post("/mcp", json={
            "jsonrpc": "2.0", "id": 4, "method": "tools/call",
            "params": {"name": "search_collection",
                       "arguments": {"collection_id": collection["id"],
                                      "query": "systolic arrays"}}})
        body = json.loads(r.json()["result"]["content"][0]["text"])
        assert body["items"] and "systolic" in body["items"][0]["text"]


def test_mcp_requires_auth_for_tools(server):
    r = httpx.post(server.base + "/mcp", json={
        "jsonrpc": "2.0", "id": 1, "method": "tools/call",
        "params": {"name": "list_collections", "arguments": {}}})
    assert r.json()["error"]["code"] == -32001


def test_agent_crud_and_ws(server, client, collection):
    """Agent bot CRUD + tool-loop WebSocket chat (offline policy)."""
    import websockets.sync.client as wsc

    r = client.post("/api/v1/agents",
                    json={"title": "helper",
                          "config": {"collection_ids": [collection["id"]]}})
    assert r.status_code == 201, r.text
    aid = r.json()["id"]
    assert client.get(f"/api/v1/agents/{aid}").json()["title"] == "helper"

    chat_id = client.post("/api/v1/chats", json={"title": "a"}).json()["id"]
    token = client.headers["Authorization"].split(" ")[1]
    url = (server.base.replace("http://", "ws://")
           + f"/api/v1/agents/{aid}/chats/{chat_id}/connect")
    with wsc.connect(url, additional_headers={
        "Authorization": f"Bearer {token}"}) as ws:
        ws.send(json.dumps({"message": "systolic arrays"}))
        kinds = []
        while True:
            ev = json.loads(ws.recv(timeout=30))
            kinds.append(ev["event"])
            if ev["event"] == "done":
                final = ev["data"]["text"]
                break
    assert "tool_call" in kinds and "tool_result" in kinds
    assert "systolic" in final
    assert client.delete(f"/api/v1/agents/{aid}").status_code == 204


def test_ag_ui_sse(server, client, collection):
    r = client.post("/api/v1/agents",
                    json={"title": "h2",
                          "config": {"collection_ids": [collection["id"]]}})
    aid = r.json()["id"]
    with client.stream(
        "POST", f"/api/v1/agents/{aid}/chats/any/ag-ui",
        json={"message": "fox"},
    ) as resp:
        assert resp.status_code == 200
        events = [l[7:] for l in resp.iter_lines() if l.startswith("event: ")]
    assert events[0] == "RunStarted" and events[-1] == "RunFinished"


def test_web_search_offline_degrades(client):
    r = client.post("/api/v1/web/search", json={"query": "anything"})
    assert r.status_code == 200
    body = r.json()
    assert body["results"] == [] and body["offline"] is True


def test_graph_routes(client, collection):
    r = client.get(f"/api/v1/collections/{collection['id']}/graph/stats")
    assert r.status_code == 200
    assert {"nodes", "edges"} <= set(r.json())
    r = client.get(f"/api/v1/collections/{collection['id']}/graph")
    assert {"nodes", "edges"} <= set(r.json())


def test_schema_validation(client, collection):
    # bad vocab_size (not power of two)
    r = client.post("/api/v1/collections",
                    json={"title": "x", "config": {"vocab_size": 1000}})
    assert r.status_code == 422
    # top_k out of range
    r = client.post(f"/api/v1/collections/{collection['id']}/searches",
                    json={"query": "q", "top_k": 5000})
    assert r.status_code == 422
    assert "top_k" in r.json()["error"]["message"]


def test_archive_upload(client, collection):
    import io, zipfile
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("one.md", "# One\n\nalpaca vicuna llama.")
        z.writestr("two.md", "# Two\n\nnarwhal beluga orca.")
    r = client.post(
        f"/api/v1/collections/{collection['id']}/documents",
        files={"file": ("bundle.zip", buf.getvalue(), "application/zip")},
    )
    assert r.status_code == 201, r.text
    assert len(r.json()) == 2
    r = client.post(f"/api/v1/collections/{collection['id']}/searches",
                    json={"query": "narwhal beluga", "top_k": 1})
    assert "narwhal" in r.json()["items"][0]["text"]


def test_two_phase_upload(client, collection):
    r = client.post(
        f"/api/v1/collections/{collection['id']}/documents/upload",
        files={"file": ("staged.md", b"# Staged\n\nplatypus echidna.",
                        "text/markdown")},
    )
    assert r.status_code == 201, r.text
    staged = r.json()[0]
    r = client.post(
        f"/api/v1/collections/{collection['id']}/documents/confirm",
        json=[{"upload_id": staged["upload_id"], "name": staged["name"]}],
    )
    assert r.status_code == 201, r.text
    r = client.post(f"/api/v1/collections/{collection['id']}/searches",
                    json={"query": "platypus echidna", "top_k": 1})
    assert "platypus" in r.json()["items"][0]["text"]
    # confirming again fails: staged object consumed
    r = client.post(
        f"/api/v1/collections/{collection['id']}/documents/confirm",
        json=[{"upload_id": staged["upload_id"], "name": staged["name"]}],
    )
    assert r.status_code == 404


def test_embeddings_endpoint(client):
    r = client.post("/v1/embeddings", json={"input": ["hello", "world"]})
    assert r.status_code == 200
    data = r.json()["data"]
    assert len(data) == 2 and len(data[0]["embedding"]) > 0
    assert data[1]["index"] == 1
    r = client.post("/v1/embeddings", json={"input": []})
    assert r.status_code == 422


def test_chat_file_upload_and_search(client):
    chat_id = client.post("/api/v1/chats", json={"title": "files"}).json()["id"]
    r = client.post(
        f"/api/v1/chats/{chat_id}/documents",
        files={"file": ("notes.md", b"# N\n\nquetzal resplendent bird.",
                        "text/markdown")},
    )
    assert r.status_code == 201, r.text
    r = client.post(f"/api/v1/chats/{chat_id}/files/search",
                    json={"query": "quetzal bird"})
    assert r.status_code == 200, r.text
    assert "quetzal" in r.json()["items"][0]["text"]
    # reference path dialect (api/chat.py:311)
    r = client.post(f"/api/v1/chats/{chat_id}/search",
                    json={"query": "quetzal bird"})
    assert r.status_code == 200, r.text
    assert "quetzal" in r.json()["items"][0]["text"]
    # another chat must NOT see this file
    other = client.post("/api/v1/chats", json={"title": "other"}).json()["id"]
    r = client.post(f"/api/v1/chats/{other}/files/search",
                    json={"query": "quetzal bird"})
    items = r.json()["items"]
    assert not items or "quetzal" not in items[0]["text"]


def test_metrics_endpoint(client):
    r = client.get("/metrics")
    assert r.status_code == 200
    body = r.text
    assert "super_rag_http_requests_total" in body
    assert "super_rag_documents_total" in body


def test_metrics_requires_auth(server):
    # ADVICE r1 (low): /metrics exposed collection ids/row counts publicly
    r = httpx.get(server.base + "/metrics")
    assert r.status_code == 401


def test_header_injection_stripped(server, client, collection):
    # ADVICE r1 (medium): CR/LF in a document name must not split the
    # response when echoed back via X-Document-Name on /preview.
    r = client.post(
        f"/api/v1/collections/{collection['id']}/documents",
        json=[{
            "name": "evil\r\nSet-Cookie: pwned=1\r\n.md",
            "content": "# Evil\n\ninjection probe body.",
        }],
    )
    assert r.status_code == 201, r.text
    did = r.json()[0]["id"]
    r = client.get(f"/api/v1/documents/{did}/preview")
    assert r.status_code == 200
    assert "set-cookie" not in {k.lower() for k in r.headers}
    assert "pwned" in r.headers.get("X-Document-Name", "")  # flattened, not split


def test_agent_ws_cannot_write_other_users_chat(server, client, collection):
    # ADVICE r1 (medium): agent WS persisted messages into any chat id.
    import websockets.sync.client as wsc

    # mallory owns an agent but not alice's chat
    alice_chat = client.post("/api/v1/chats", json={"title": "private"}
                             ).json()["id"]
    with httpx.Client(base_url=server.base, timeout=30) as mal:
        mal.post("/api/v1/auth/register",
                 json={"username": "mallory", "password": "sneaky12"})
        token = mal.post("/api/v1/auth/login",
                         json={"username": "mallory", "password": "sneaky12"}
                         ).json()["token"]
        mal.headers["Authorization"] = f"Bearer {token}"
        aid = mal.post("/api/v1/agents",
                       json={"title": "m", "config": {}}).json()["id"]
        url = (server.base.replace("http://", "ws://")
               + f"/api/v1/agents/{aid}/chats/{alice_chat}/connect")
        with wsc.connect(url, additional_headers={
            "Authorization": f"Bearer {token}"}) as ws:
            ev = json.loads(ws.recv(timeout=15))
            assert ev["event"] == "error"
        # AG-UI path enforces the same ownership rule
        r = mal.post(f"/api/v1/agents/{aid}/chats/{alice_chat}/ag-ui",
                     json={"message": "hi"})
        assert r.status_code == 404
    r = client.get(f"/api/v1/chats/{alice_chat}")
    assert r.json()["messages"] == []


def test_web_ui_served(server):
    r = httpx.get(server.base + "/")
    assert r.status_code == 200
    assert "super-rag-tpu" in r.text and "hybrid search" in r.text


def test_workflow_sse_stream(client, collection):
    defn = {
        "name": "stream-wf",
        "graph": {
            "nodes": [
                {"id": "start", "type": "start", "data": {}},
                {"id": "hs", "type": "hybrid_search",
                 "data": {"input_values": {"top_k": 2,
                                            "collection_ids": [collection["id"]]}}},
            ],
            "edges": [{"source": "start", "target": "hs",
                       "targetHandle": "query"}],
        },
    }
    with client.stream("POST", "/api/v1/workflows/run/stream",
                       json={"definition": defn,
                             "inputs": {"query": "systolic arrays"}}) as r:
        assert r.status_code == 200
        events = [l[7:] for l in r.iter_lines() if l.startswith("event: ")]
    assert events[0] == "FLOW_START"
    assert "NODE_END" in events
    assert events[-1] == "RESULT"


def test_direct_sharing(server, client, collection):
    # share with bob (registered in marketplace test; ensure exists)
    httpx.post(server.base + "/api/v1/auth/register",
               json={"username": "carol", "password": "pw123456"})
    r = client.post(f"/api/v1/collections/{collection['id']}/shares",
                    json={"username": "carol"})
    assert r.status_code == 201, r.text
    # unknown user rejected
    assert client.post(f"/api/v1/collections/{collection['id']}/shares",
                       json={"username": "nobody"}).status_code == 422
    with httpx.Client(base_url=server.base, timeout=30) as carol:
        tok = carol.post("/api/v1/auth/login",
                         json={"username": "carol", "password": "pw123456"}
                         ).json()["token"]
        carol.headers["Authorization"] = f"Bearer {tok}"
        r = carol.get("/api/v1/collections/shared-with-me")
        assert any(c["id"] == collection["id"] for c in r.json())
        r = carol.post(f"/api/v1/collections/{collection['id']}/searches",
                       json={"query": "systolic arrays", "top_k": 1})
        assert r.status_code == 201
        # no mutation rights
        assert carol.delete(
            f"/api/v1/collections/{collection['id']}").status_code == 403
    # revoke
    client.delete(f"/api/v1/collections/{collection['id']}/shares/carol")
    with httpx.Client(base_url=server.base, timeout=30) as carol:
        tok = carol.post("/api/v1/auth/login",
                         json={"username": "carol", "password": "pw123456"}
                         ).json()["token"]
        carol.headers["Authorization"] = f"Bearer {tok}"
        r = carol.post(f"/api/v1/collections/{collection['id']}/searches",
                       json={"query": "x", "top_k": 1})
        assert r.status_code == 403


def test_default_models_route(client):
    r = client.get("/api/v1/llm/default_models")
    assert r.status_code == 200
    body = r.json()
    assert "embedding" in body and "collection_completion" in body


def test_collection_rebuild_and_packs(client, collection):
    r = client.post(f"/api/v1/collections/{collection['id']}/rebuild_indexes")
    assert r.status_code == 200 and r.json()["rebuilt"] >= 1
    # documents searchable again after rebuild
    r = client.post(f"/api/v1/collections/{collection['id']}/searches",
                    json={"query": "systolic arrays", "top_k": 1})
    assert r.json()["items"]
    r = client.get("/api/v1/nodeflow/packs")
    assert "hybrid_search" in r.json()["registered_types"]


def test_multi_collection_search(client, collection):
    r = client.post("/api/v1/collections", json={"title": "second"})
    cid2 = r.json()["id"]
    client.post(f"/api/v1/collections/{cid2}/documents",
                json=[{"name": "m.md", "content": "# M\n\nokapi giraffid forest."}])
    r = client.post("/api/v1/searches",
                    json={"collection_ids": [collection["id"], cid2],
                          "query": "okapi giraffid", "top_k": 3})
    assert r.status_code == 201, r.text
    items = r.json()["items"]
    assert items and "okapi" in items[0]["text"]
    # results can come from either collection
    assert r.json()["collection_ids"] == [collection["id"], cid2]


def test_pagination(client):
    r = client.get("/api/v1/collections?limit=1")
    assert len(r.json()) == 1
    all_cols = client.get("/api/v1/collections").json()
    page2 = client.get("/api/v1/collections?limit=1&offset=1").json()
    if len(all_cols) > 1:
        assert page2[0]["id"] == all_cols[1]["id"]


def test_mcp_batch_and_ping(server, client):
    key = client.post("/api/v1/apikeys", json={"description": "b"}).json()["key"]
    with httpx.Client(base_url=server.base, timeout=30,
                      headers={"Authorization": f"Bearer {key}"}) as mcp:
        r = mcp.post("/mcp", json=[
            {"jsonrpc": "2.0", "id": 1, "method": "ping"},
            {"jsonrpc": "2.0", "method": "notifications/initialized"},
            {"jsonrpc": "2.0", "id": 2, "method": "prompts/list"},
        ])
        body = r.json()
        assert isinstance(body, list) and len(body) == 2  # notif dropped
        assert body[0]["id"] == 1 and "result" in body[0]
        assert body[1]["result"]["prompts"][0]["name"] == "super_rag_usage_guide"
        r = mcp.post("/mcp", json={"jsonrpc": "2.0", "id": 3,
                                   "method": "nope/nope"})
        assert r.json()["error"]["code"] == -32601
        r = mcp.post("/mcp", content=b"{broken")
        assert r.json()["error"]["code"] == -32700


def test_audit_captures_response_and_redacts_secrets(client):
    client.post("/api/v1/collections", json={"title": "audited"})
    logs = client.get("/api/v1/audit_logs?limit=50").json()
    create = next(l for l in logs if l["method"] == "POST"
                  and l["path"] == "/api/v1/collections"
                  and "audited" in l.get("request", ""))
    assert "audited" in create["response"]  # response body captured
    login = next(l for l in logs if l["path"] == "/api/v1/auth/login")
    assert login["request"] == "<redacted>"
    assert "secret123" not in (login.get("response") or "")


def test_multipart_multi_file_and_edge_cases(client, collection):
    # two files in one request -> two documents
    r = client.post(
        f"/api/v1/collections/{collection['id']}/documents",
        files=[("file", ("m1.md", b"# A\n\nokapi first file.", "text/markdown")),
               ("file", ("m2.md", b"# B\n\nokapi second file.", "text/markdown"))],
    )
    assert r.status_code == 201 and len(r.json()) == 2
    # form field without filename is skipped, not an error
    r = client.post(
        f"/api/v1/collections/{collection['id']}/documents",
        data={"note": "not a file"},
        files={"file": ("m3.md", b"# C\n\nokapi third.", "text/markdown")},
    )
    assert r.status_code == 201 and len(r.json()) == 1
    # empty json body list -> no documents, still 201
    r = client.post(f"/api/v1/collections/{collection['id']}/documents",
                    json=[])
    assert r.status_code == 201 and r.json() == []
    # missing name -> 422
    r = client.post(f"/api/v1/collections/{collection['id']}/documents",
                    json=[{"content": "x"}])
    assert r.status_code == 422


def test_image_search_route(client):
    # vision indexing is opt-in per collection config (reference
    # config.enable_vision)
    r = client.post("/api/v1/collections",
                    json={"title": "scans",
                          "config": {"enable_vision": True}})
    assert r.status_code == 201, r.text
    collection = r.json()
    # build a tiny scanned-PDF (JPEG XObject, no text layer) and upload it
    import io as _io

    import numpy as _np
    from PIL import Image as _Image

    def jpeg(color, seed):
        rng = _np.random.default_rng(seed)
        arr = _np.zeros((64, 96, 3), _np.uint8)
        arr[:] = color
        arr = _np.clip(arr.astype(int) + rng.integers(-15, 15, arr.shape),
                       0, 255).astype(_np.uint8)
        arr[::8] = 255 - arr[::8]
        buf = _io.BytesIO()
        _Image.fromarray(arr).save(buf, format="JPEG")
        return buf.getvalue()

    img = jpeg((210, 40, 40), 1)
    pdf = b"%PDF-1.4\n" + (
        b"10 0 obj\n<< /Subtype /Image /Width 96 /Height 64 "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode "
        b"/Length %d >>\nstream\n" % len(img)
    ) + img + b"\nendstream\nendobj\n%%EOF\n"
    r = client.post(
        f"/api/v1/collections/{collection['id']}/documents",
        json=[{"name": "scan.pdf",
               "content_base64": base64.b64encode(pdf).decode()}],
    )
    assert r.status_code == 201, r.text
    # reconcile runs synchronously in tests; search by a similar image
    query = base64.b64encode(jpeg((210, 40, 40), 2)).decode()
    r = client.post(
        f"/api/v1/collections/{collection['id']}/searches/image",
        json={"image_base64": query, "top_k": 3},
    )
    assert r.status_code == 201, r.text
    items = r.json()["items"]
    assert items and items[0]["asset_id"]
    # the stored asset is servable
    r = client.get(f"/api/v1/collections/{collection['id']}"
                   f"/assets/{items[0]['asset_id']}")
    assert r.status_code == 200
    assert r.headers["content-type"].startswith("image/")


def test_contract_validation_shared_surfaces(server, client, collection):
    # REST: typed 422s with field locations
    r = client.post("/api/v1/agents", json={"title": ""})
    assert r.status_code == 422 and "title" in r.json()["error"]["message"]
    r = client.post("/api/v1/workflows",
                    json={"title": "bad", "definition": {"graph": {}}})
    assert r.status_code == 422
    r = client.post("/api/v1/auth/register",
                    json={"username": "shorty", "password": "short"})
    assert r.status_code == 422
    r = client.post("/api/v1/searches", json={"query": "x"})
    assert r.status_code == 422  # collection_ids required
    # MCP shares the same SearchRequest contract
    key = client.post("/api/v1/apikeys", json={"description": "c"}).json()["key"]
    r = httpx.post(server.base + "/mcp", headers={
        "Authorization": f"Bearer {key}"}, json={
        "jsonrpc": "2.0", "id": 9, "method": "tools/call",
        "params": {"name": "search_collection",
                   "arguments": {"collection_id": collection["id"],
                                  "query": "x", "top_k": 5000}}})
    assert "top_k" in json.dumps(r.json().get("error", r.json()))


def test_nested_document_routes(client, collection, document):
    cid, did = collection["id"], document["id"]
    # reference-shaped nested GET (api/collections.py:167)
    r = client.get(f"/api/v1/collections/{cid}/documents/{did}")
    assert r.status_code == 200 and r.json()["id"] == did
    # wrong collection -> 404
    r2 = client.post("/api/v1/collections",
                     json={"title": "other", "description": ""})
    other = r2.json()["id"]
    r = client.get(f"/api/v1/collections/{other}/documents/{did}")
    assert r.status_code == 404
    # nested preview honors Range
    r = client.get(f"/api/v1/collections/{cid}/documents/{did}/preview",
                   headers={"Range": "bytes=0-7"})
    assert r.status_code == 206 and r.content == MD.encode()[:8]
    # raw object download (reference api/collections.py:211)
    r = client.get(f"/api/v1/collections/{cid}/documents/{did}/object")
    assert r.status_code == 200 and r.content == MD.encode()
    # path traversal outside the document dir is rejected
    r = client.get(f"/api/v1/collections/{cid}/documents/{did}/object",
                   params={"path": f"{other}/whatever"})
    assert r.status_code == 403
    # nested rebuild + collection-wide failed rebuild
    r = client.post(f"/api/v1/collections/{cid}/documents/{did}/rebuild_indexes")
    assert r.status_code == 200 and r.json()["rebuilt"] >= 1
    r = client.post(f"/api/v1/collections/{cid}/rebuild_failed_indexes")
    assert r.status_code == 200


def test_paginated_envelope_and_bulk_delete(client, collection):
    cid = collection["id"]
    made = []
    for i in range(3):
        r = client.post(
            f"/api/v1/collections/{cid}/documents",
            json=[{"name": f"bulk{i}.md", "content": f"# B{i}\n\ndoc {i}."}],
        )
        made.append(r.json()[0]["id"])
    # reference pagination dialect -> envelope
    r = client.get(f"/api/v1/collections/{cid}/documents",
                   params={"page": 1, "page_size": 2, "sort_by": "name",
                           "sort_order": "asc", "search": "bulk"})
    env = r.json()
    assert env["total"] == 3 and env["total_pages"] == 2
    assert [d["name"] for d in env["items"]] == ["bulk0.md", "bulk1.md"]
    assert env["has_next"] and not env["has_prev"]
    # legacy dialect still returns a bare array
    r = client.get(f"/api/v1/collections/{cid}/documents")
    assert isinstance(r.json(), list)
    # bulk delete (reference api/collections.py:187)
    r = client.request("DELETE", f"/api/v1/collections/{cid}/documents",
                       json={"document_ids": made})
    assert r.status_code == 200 and sorted(r.json()["deleted"]) == sorted(made)
    names = [d["name"] for d in
             client.get(f"/api/v1/collections/{cid}/documents").json()]
    assert not any(n.startswith("bulk") for n in names)


def test_llm_provider_full_surface(client):
    # create
    r = client.post("/api/v1/llm_providers",
                    json={"name": "acme", "label": "Acme",
                          "base_url": "http://acme.local/v1"})
    assert r.status_code == 201
    # detail + 404
    assert client.get("/api/v1/llm_providers/acme").json()["label"] == "Acme"
    assert client.get("/api/v1/llm_providers/nope").status_code == 404
    # update w/ dialects + api key in one body (reference api/llm.py:92)
    r = client.put("/api/v1/llm_providers/acme",
                   json={"label": "Acme2", "rerank_dialect": "jina_ai",
                         "api_key": "sk-verysecret-key"})
    assert r.json()["label"] == "Acme2"
    assert json.loads(r.json()["extra"])["rerank_dialect"] == "jina_ai"
    # models incl. slashed name via {model:path}
    r = client.post("/api/v1/llm_providers/acme/models",
                    json={"api": "completion", "model": "org/chat-9b",
                          "tags": ["recommend", "free"]})
    assert r.status_code == 201
    r = client.put("/api/v1/llm_providers/acme/models/completion/org/chat-9b",
                   json={"context_window": 32768})
    assert r.status_code == 200 and r.json()["context_window"] == 32768
    # flat model listing
    r = client.get("/api/v1/llm_provider_models",
                   params={"provider_name": "acme"})
    assert any(m["model"] == "org/chat-9b" for m in r.json())
    # llm_configuration masks the key
    cfg = client.get("/api/v1/llm_configuration").json()
    acme = [p for p in cfg["providers"] if p["name"] == "acme"][0]
    assert "verysecret" not in (acme["api_key"] or "")
    assert any(m["model"] == "org/chat-9b" for m in cfg["models"])
    # POST available_models: default = recommend tag; AND/OR conditions
    items = client.post("/api/v1/available_models").json()["items"]
    assert any(m["model"] == "org/chat-9b" for m in items)
    items = client.post("/api/v1/available_models",
                        json={"tag_filters": [{"operation": "AND",
                                               "tags": ["free", "paid"]}]}
                        ).json()["items"]
    assert not any(m["model"] == "org/chat-9b" for m in items)
    # default_models PUT stores scenario tags (reference mechanism)
    r = client.put("/api/v1/default_models", json={"defaults": [
        {"scenario": "default_for_collection_completion",
         "provider_name": "acme", "model": "org/chat-9b"}]})
    got = {i["scenario"]: i for i in r.json()["items"]}
    assert got["default_for_collection_completion"]["model"] == "org/chat-9b"
    assert got["default_for_embedding"]["model"] != "org/chat-9b"
    # unknown scenario rejected; slashed-model delete works
    assert client.put("/api/v1/default_models", json={"defaults": [
        {"scenario": "bogus"}]}).status_code == 422
    r = client.delete("/api/v1/llm_providers/acme/models/completion/org/chat-9b")
    assert r.status_code == 204
    assert client.get("/api/v1/llm_provider_models",
                      params={"provider_name": "acme"}).json() == []


def test_auth_reference_dialect(client, server):
    # unprefixed /register /login /user /logout (reference api/auth.py)
    with httpx.Client(base_url=server.base, timeout=30) as c:
        r = c.post("/api/v1/register",
                   json={"username": "bobby", "password": "bobpass123"})
        assert r.status_code == 201
        r = c.post("/api/v1/login",
                   json={"username": "bobby", "password": "bobpass123"})
        tok = r.json()["token"]
        c.headers["Authorization"] = f"Bearer {tok}"
        assert c.get("/api/v1/user").json()["username"] == "bobby"
        # change-password: wrong old -> 400, right old -> rehash + relogin
        r = c.post("/api/v1/change-password",
                   json={"old_password": "wrong", "new_password": "newpass123"})
        assert r.status_code == 400
        r = c.post("/api/v1/change-password",
                   json={"old_password": "bobpass123",
                         "new_password": "newpass123"})
        assert r.status_code == 200
        assert c.post("/api/v1/login",
                      json={"username": "bobby",
                            "password": "newpass123"}).status_code == 200
        assert c.post("/api/v1/logout").status_code == 200


def test_admin_delete_user(client, server):
    # alice is the first account -> admin (bootstrap rule)
    with httpx.Client(base_url=server.base, timeout=30) as c:
        c.post("/api/v1/register",
               json={"username": "victim", "password": "victimpass1"})
        r = c.post("/api/v1/login",
                   json={"username": "victim", "password": "victimpass1"})
        vid = r.json()["user"]["id"]
    me_id = client.get("/api/v1/user").json()["id"]
    assert client.delete(f"/api/v1/users/{me_id}").status_code == 400  # self
    assert client.delete(f"/api/v1/users/{vid}").status_code == 204
    assert client.delete(f"/api/v1/users/{vid}").status_code == 404


def test_workflow_delete_and_versions(client):
    defn = {"name": "wf", "graph": {"nodes": [
        {"id": "in", "type": "start", "data": {}}], "edges": []}}
    r = client.post("/api/v1/workflows", json={"title": "v", "definition": defn})
    wid = r.json()["id"]
    # snapshot a version (reference api/workflow.py:63)
    r = client.post(f"/api/v1/workflows/{wid}/versions", json={})
    assert r.status_code == 201 and r.json()["version"] == 2
    r = client.get(f"/api/v1/workflows/{wid}/versions/2")
    assert r.status_code == 200 and r.json()["definition"]["name"] == "wf"
    assert client.get(f"/api/v1/workflows/{wid}/versions/9").status_code == 404
    # delete
    assert client.delete(f"/api/v1/workflows/{wid}").status_code == 204
    assert client.get(f"/api/v1/workflows/{wid}").status_code == 404


def test_agent_chat_crud(client):
    aid = client.post("/api/v1/agents",
                      json={"title": "helper"}).json()["id"]
    r = client.post(f"/api/v1/agents/{aid}/chats", json={})
    assert r.status_code == 201
    chat = r.json()
    assert chat["bot_id"] == aid and chat["peer_type"] == "agent"
    cid = chat["id"]
    assert any(c["id"] == cid for c in
               client.get(f"/api/v1/agents/{aid}/chats").json())
    r = client.get(f"/api/v1/agents/{aid}/chats/{cid}")
    assert r.status_code == 200 and r.json()["messages"] == []
    r = client.put(f"/api/v1/agents/{aid}/chats/{cid}",
                   json={"title": "renamed"})
    assert r.json()["title"] == "renamed"
    # wrong agent -> 404
    aid2 = client.post("/api/v1/agents", json={"title": "x"}).json()["id"]
    assert client.get(f"/api/v1/agents/{aid2}/chats/{cid}").status_code == 404
    assert client.delete(f"/api/v1/agents/{aid}/chats/{cid}").status_code == 204


def test_sharing_and_marketplace_browse(client, collection, document, server):
    cid = collection["id"]
    # status -> publish -> status (reference api/collections.py:61-120);
    # an earlier test may have published the shared fixture, so reset first
    client.delete(f"/api/v1/collections/{cid}/sharing")
    assert client.get(
        f"/api/v1/collections/{cid}/sharing").json()["is_published"] is False
    r = client.post(f"/api/v1/collections/{cid}/sharing")
    assert r.json()["is_published"] is True and r.json()["published_at"]
    # another logged-in user can browse the published collection
    with httpx.Client(base_url=server.base, timeout=30) as c:
        c.post("/api/v1/register",
               json={"username": "reader", "password": "readerpass1"})
        tok = c.post("/api/v1/login",
                     json={"username": "reader",
                           "password": "readerpass1"}).json()["token"]
        c.headers["Authorization"] = f"Bearer {tok}"
        r = c.get(f"/api/v1/marketplace/collections/{cid}")
        assert r.status_code == 200 and r.json()["owner"] == "alice"
        docs = c.get(f"/api/v1/marketplace/collections/{cid}/documents").json()
        assert any(d["id"] == document["id"] for d in docs)
        r = c.get(f"/api/v1/marketplace/collections/{cid}/documents/"
                  f"{document['id']}/preview")
        assert r.status_code == 200 and r.content == MD.encode()
        r = c.get(f"/api/v1/marketplace/collections/{cid}/documents/"
                  f"{document['id']}/object", headers={"Range": "bytes=0-3"})
        assert r.status_code == 206 and r.content == MD.encode()[:4]
        # subscriptions listed under the reference path too
        c.post(f"/api/v1/marketplace/collections/{cid}/subscribe")
        subs = c.get("/api/v1/marketplace/collections/subscriptions").json()
        assert any(s["collection_id"] == cid for s in subs)
    # unpublish hides it
    client.delete(f"/api/v1/collections/{cid}/sharing")
    with httpx.Client(base_url=server.base, timeout=30) as c:
        tok = c.post("/api/v1/login",
                     json={"username": "reader",
                           "password": "readerpass1"}).json()["token"]
        c.headers["Authorization"] = f"Bearer {tok}"
        assert c.get(
            f"/api/v1/marketplace/collections/{cid}").status_code == 404


def test_chat_reference_dialect(client, collection):
    chat = client.post("/api/v1/chats", json={
        "title": "t", "collection_ids": [collection["id"]]}).json()
    cid = chat["id"]
    # PUT rename (reference ChatUpdate)
    assert client.put(f"/api/v1/chats/{cid}",
                      json={"title": "renamed"}).json()["title"] == "renamed"
    # /chats/{id}/search alias (reference api/chat.py:311)
    r = client.post(f"/api/v1/chats/{cid}/search", json={"query": "fox"})
    assert r.status_code == 200
    # chat document detail (reference api/chat.py:369)
    files = {"file": ("note.md", b"# N\n\nzebra quark.", "text/markdown")}
    up = client.post(f"/api/v1/chats/{cid}/documents", files=files)
    did = up.json()[0]["id"]
    r = client.get(f"/api/v1/chats/{cid}/documents/{did}")
    assert r.status_code == 200 and r.json()["id"] == did
    other = client.post("/api/v1/chats", json={"title": "o"}).json()["id"]
    assert client.get(
        f"/api/v1/chats/{other}/documents/{did}").status_code == 404
    # frontend completions, non-streaming (reference api/chat.py:281)
    r = client.post(f"/api/v1/chat/completions/frontend?chat_id={cid}",
                    json={"message": "what does the fox do?"})
    assert r.status_code == 200 and r.json()["chat_id"] == cid
    assert "text" in r.json()


def test_review_fixes_security(client, collection, document, server):
    cid, did = collection["id"], document["id"]
    # 1. ?path traversal with '..' cannot escape the document directory
    prefix = "/".join([cid, document["content_hash"][:16]])
    evil = f"{prefix}/../../{cid}/other/secret"
    r = client.get(f"/api/v1/collections/{cid}/documents/{did}/object",
                   params={"path": evil})
    assert r.status_code == 403
    # 2. a marketplace subscriber cannot delete or rebuild owner documents
    client.post(f"/api/v1/collections/{cid}/sharing")
    with httpx.Client(base_url=server.base, timeout=30) as c:
        c.post("/api/v1/register",
               json={"username": "intruder", "password": "intruderpw1"})
        tok = c.post("/api/v1/login",
                     json={"username": "intruder",
                           "password": "intruderpw1"}).json()["token"]
        c.headers["Authorization"] = f"Bearer {tok}"
        c.post(f"/api/v1/marketplace/collections/{cid}/subscribe")
        assert c.delete(
            f"/api/v1/collections/{cid}/documents/{did}").status_code == 403
        assert c.request(
            "DELETE", f"/api/v1/collections/{cid}/documents",
            json={"document_ids": [did]}).status_code == 403
        assert c.post(
            f"/api/v1/collections/{cid}/documents/{did}/rebuild_indexes"
        ).status_code == 403
        assert c.post(
            f"/api/v1/collections/{cid}/rebuild_failed_indexes"
        ).status_code == 403
    client.delete(f"/api/v1/collections/{cid}/sharing")
    # document survived all of it
    assert client.get(
        f"/api/v1/collections/{cid}/documents/{did}").status_code == 200


def test_review_fixes_user_tombstone(client, server):
    # deleting a user must NOT free the username for takeover re-registration
    with httpx.Client(base_url=server.base, timeout=30) as c:
        c.post("/api/v1/register",
               json={"username": "ghost", "password": "ghostpass12"})
        gid = c.post("/api/v1/login",
                     json={"username": "ghost",
                           "password": "ghostpass12"}).json()["user"]["id"]
    assert client.delete(f"/api/v1/users/{gid}").status_code == 204
    with httpx.Client(base_url=server.base, timeout=30) as c:
        # name stays reserved (tombstone row)
        assert c.post("/api/v1/register",
                      json={"username": "ghost",
                            "password": "whatever123"}).status_code == 409
        # and the old credentials no longer work
        assert c.post("/api/v1/login",
                      json={"username": "ghost",
                            "password": "ghostpass12"}).status_code == 403


def test_review_fixes_deleted_collection_unpublished(client, server):
    r = client.post("/api/v1/collections",
                    json={"title": "shortlived", "description": ""})
    cid = r.json()["id"]
    client.post(f"/api/v1/collections/{cid}/sharing")
    client.delete(f"/api/v1/collections/{cid}")
    assert client.get(
        f"/api/v1/marketplace/collections/{cid}").status_code == 404
    assert cid not in [m["collection_id"] for m in
                       client.get("/api/v1/marketplace/collections").json()]


def test_review_fixes_pagination_robustness(client, collection):
    cid = collection["id"]
    # unorderable sort key (config is a dict) must not 500
    r = client.get("/api/v1/collections", params={"page": 1, "sort_by": "config"})
    assert r.status_code == 200
    # non-integer page -> 422, not 500
    assert client.get(f"/api/v1/collections/{cid}/documents",
                      params={"page": "abc"}).status_code == 422
    assert client.get(f"/api/v1/collections/{cid}/documents",
                      params={"limit": "abc"}).status_code == 422


def test_review_fixes_byte_ranges(client, collection, document):
    cid, did = collection["id"], document["id"]
    base = f"/api/v1/collections/{cid}/documents/{did}/object"
    # malformed Range -> ignored, full 200 body (RFC 7233)
    r = client.get(base, headers={"Range": "bytes=0-xyz"})
    assert r.status_code == 200 and r.content == MD.encode()
    # suffix range serves the LAST N bytes with Content-Range
    r = client.get(base, headers={"Range": "bytes=-8"})
    assert r.status_code == 206 and r.content == MD.encode()[-8:]
    total = len(MD.encode())
    assert r.headers["content-range"] == \
        f"bytes {total-8}-{total-1}/{total}"
    # normal range carries Content-Range too
    r = client.get(base, headers={"Range": "bytes=2-9"})
    assert r.content == MD.encode()[2:10]
    assert r.headers["content-range"] == f"bytes 2-9/{total}"
    # unsatisfiable -> full body, not a crash
    r = client.get(base, headers={"Range": f"bytes={total+10}-"})
    assert r.status_code == 200


def test_review_fixes_bulk_delete_atomic(client, collection):
    cid = collection["id"]
    made = [client.post(f"/api/v1/collections/{cid}/documents",
                        json=[{"name": f"atomic{i}.md",
                               "content": f"# A{i}\n\natomic {i}."}]
                        ).json()[0]["id"] for i in range(2)]
    # a bogus id anywhere in the list -> 404 and NOTHING is deleted
    r = client.request("DELETE", f"/api/v1/collections/{cid}/documents",
                       json={"document_ids": [made[0], "doc-nope", made[1]]})
    assert r.status_code == 404
    for did in made:
        assert client.get(
            f"/api/v1/collections/{cid}/documents/{did}").status_code == 200
    r = client.request("DELETE", f"/api/v1/collections/{cid}/documents",
                       json={"document_ids": made})
    assert r.status_code == 200 and sorted(r.json()["deleted"]) == sorted(made)


def test_review_fixes_workflow_delete_cascades(client):
    defn = {"name": "wf", "graph": {"nodes": [
        {"id": "in", "type": "start", "data": {}}], "edges": []}}
    wid = client.post("/api/v1/workflows",
                      json={"title": "c", "definition": defn}).json()["id"]
    rid = client.post(f"/api/v1/workflows/{wid}/run",
                      json={"inputs": {"query": "x"}}).json()["run_id"]
    assert client.delete(f"/api/v1/workflows/{wid}").status_code == 204
    # runs are cascaded, not orphaned
    assert client.get(f"/api/v1/workflow-runs/{rid}").status_code == 404
