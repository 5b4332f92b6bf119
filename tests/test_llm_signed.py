"""Signed-auth provider dialects (Bedrock SigV4, Vertex service-account
OAuth) against stub servers that VERIFY the authentication server-side."""

from __future__ import annotations

import asyncio
import base64
import hashlib
import json
import threading
from urllib.parse import quote

import pytest

from super_rag_tpu.api.http import HttpServer, Request, Response, Router
from super_rag_tpu.llm.client import make_client
from super_rag_tpu.llm.errors import BadRequestError
from super_rag_tpu.store.objectstore import sigv4_headers

ACCESS, SECRET = "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"


class _Stub:
    """Stub server on the project's own HTTP runtime."""

    def __init__(self, router: Router):
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


class BedrockStub(_Stub):
    """Verifies the SigV4 Authorization header by recomputing the
    signature from the received request with the shared signer."""

    def __init__(self):
        self.verified = 0
        self.bad = 0
        router = Router()

        async def invoke(req: Request) -> Response:
            model = req.path_params["model"]
            # the server decodes the path; rebuild the wire form the
            # client signed (model ids carry ':' -> '%3A')
            wire_path = f"/model/{quote(model, safe='')}/invoke"
            expected = sigv4_headers(
                "POST",
                f"http://{req.headers.get('host')}{wire_path}",
                region="us-east-1", access_key=ACCESS, secret_key=SECRET,
                payload_hash=hashlib.sha256(req.body).hexdigest(),
                amz_date=req.headers.get("x-amz-date", ""),
                service="bedrock",
                extra_headers={"content-type":
                               req.headers.get("content-type", "")},
            )["Authorization"]
            if req.headers.get("authorization", "") != expected:
                self.bad += 1
                return Response.json({"message": "SignatureDoesNotMatch"},
                                     status=403)
            self.verified += 1
            body = req.json()
            if model.startswith("anthropic."):
                q = body["messages"][-1]["content"]
                return Response.json({
                    "content": [{"type": "text", "text": f"br:{q}"}],
                    "usage": {"input_tokens": 3, "output_tokens": 2},
                })
            if "texts" in body:  # cohere embed
                return Response.json({
                    "embeddings": [[float(len(t)), 2.0]
                                   for t in body["texts"]],
                })
            if "inputText" in body and "textGenerationConfig" not in body:
                return Response.json({
                    "embedding": [float(len(body["inputText"])), 1.0],
                })
            return Response.json({
                "results": [{"outputText": f"titan:{body['inputText']}"}],
            })

        router.add("POST", "/model/{model}/invoke", invoke)
        super().__init__(router)


@pytest.fixture(scope="module")
def bedrock():
    return BedrockStub()


def _bedrock_client(url, key, model):
    c = make_client("bedrock", base_url=url, api_key=key, model=model,
                    cache_enabled=False)
    c.region = "us-east-1"  # the stub URL has no amazonaws.com host
    return c


def test_bedrock_anthropic_complete_signature_verified(bedrock):
    c = _bedrock_client(bedrock.url, f"{ACCESS}:{SECRET}",
                        "anthropic.claude-3-haiku-20240307-v1:0")
    out = c.complete(prompt="hello")
    assert out == "br:hello"
    assert bedrock.verified >= 1 and bedrock.bad == 0


def test_bedrock_titan_completion_dialect(bedrock):
    c = _bedrock_client(bedrock.url, f"{ACCESS}:{SECRET}",
                        "amazon.titan-text-express-v1")
    assert c.complete(prompt="yo", max_tokens=16) == "titan:yo"


def test_bedrock_titan_and_cohere_embed(bedrock):
    c = _bedrock_client(bedrock.url, f"{ACCESS}:{SECRET}",
                        "amazon.titan-embed-text-v2:0")
    out = c.embed(["abc", "defg"])
    assert out == [[3.0, 1.0], [4.0, 1.0]]
    out2 = c.embed(["xy"], model="cohere.embed-english-v3")
    assert out2 == [[2.0, 2.0]]
    assert bedrock.bad == 0


def test_bedrock_bad_secret_rejected(bedrock):
    c = _bedrock_client(bedrock.url, f"{ACCESS}:WRONG",
                        "anthropic.claude-3-haiku-20240307-v1:0")
    c.max_retries = 1
    with pytest.raises(Exception):
        c.complete(prompt="x")
    assert bedrock.bad >= 1


def test_bedrock_rerank_unsupported(bedrock):
    c = _bedrock_client(bedrock.url, f"{ACCESS}:{SECRET}", "m")
    with pytest.raises(BadRequestError):
        c.rerank("q", ["d"])


def test_bedrock_region_parsed_from_host():
    c = make_client(
        "bedrock", api_key="a:b", cache_enabled=False,
        base_url="https://bedrock-runtime.eu-west-2.amazonaws.com")
    assert c.region == "eu-west-2"


# ---------------------------------------------------------------------------
# Vertex


@pytest.fixture(scope="module")
def rsa_key():
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import rsa

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    ).decode()
    return key, pem


class VertexStub(_Stub):
    """Token endpoint verifies the RS256 assertion with the public key;
    model endpoints require the bearer token it issued."""

    def __init__(self, public_key):
        self.tokens_issued = 0
        self.jwt_claims = None
        router = Router()

        async def token(req: Request) -> Response:
            from urllib.parse import parse_qs

            from cryptography.hazmat.primitives import hashes
            from cryptography.hazmat.primitives.asymmetric import padding

            form = parse_qs(req.body.decode())
            assertion = form["assertion"][0]
            head, claims, sig = assertion.split(".")
            public_key.verify(  # raises on a bad signature
                base64.urlsafe_b64decode(sig + "=" * (-len(sig) % 4)),
                (head + "." + claims).encode(),
                padding.PKCS1v15(), hashes.SHA256(),
            )
            self.jwt_claims = json.loads(
                base64.urlsafe_b64decode(claims + "=" * (-len(claims) % 4)))
            self.tokens_issued += 1
            return Response.json({"access_token": "tok-123",
                                  "expires_in": 3600})

        async def model(req: Request) -> Response:
            if req.headers.get("authorization") != "Bearer tok-123":
                return Response.json({"error": "unauthenticated"},
                                     status=401)
            body = req.json()
            if req.path_params["m"].endswith(":predict"):
                return Response.json({"predictions": [
                    {"embeddings": {"values": [float(len(i["content"])),
                                               3.0]}}
                    for i in body["instances"]
                ]})
            q = body["contents"][-1]["parts"][0]["text"]
            return Response.json({"candidates": [{"content": {
                "parts": [{"text": f"vx:{q}"}]}}]})

        router.add("POST", "/token", token)
        router.add(
            "POST",
            "/v1/projects/{p}/locations/{loc}/publishers/google/models/{m}",
            model,
        )
        super().__init__(router)


@pytest.fixture()
def vertex(rsa_key):
    key, pem = rsa_key
    stub = VertexStub(key.public_key())
    sa = {
        "type": "service_account", "project_id": "proj-1",
        "client_email": "svc@proj-1.iam.gserviceaccount.com",
        "private_key": pem, "token_uri": f"{stub.url}/token",
    }
    return stub, json.dumps(sa)


def test_vertex_complete_and_embed(vertex):
    stub, sa_json = vertex
    c = make_client("vertex", base_url=stub.url, api_key=sa_json,
                    model="gemini-2.0-flash", cache_enabled=False)
    out = c.complete(prompt="hi there")
    assert out == "vx:hi there"
    assert stub.jwt_claims["iss"] == "svc@proj-1.iam.gserviceaccount.com"
    assert stub.jwt_claims["aud"].endswith("/token")
    emb = c.embed(["abcd"], model="text-embedding-005")
    assert emb == [[4.0, 3.0]]
    # the bearer token is cached — one token round-trip for both calls
    assert stub.tokens_issued == 1
    assert c.project == "proj-1"


def test_vertex_dialect_aliases():
    from super_rag_tpu.llm.signed import VertexClient

    sa = json.dumps({"project_id": "p", "client_email": "e",
                     "private_key": "k", "token_uri": "http://t"})
    c = make_client("vertex_ai", base_url="http://x", api_key=sa)
    assert isinstance(c, VertexClient)
    assert c.location == "us-central1"
