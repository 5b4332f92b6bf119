"""Signed-auth model providers: AWS Bedrock (SigV4) and GCP Vertex AI
(OAuth2 service-account JWT).

The reference reaches these through LiteLLM's provider registry
(super_rag/llm/embed/embedding_service.py:168-175 routes "bedrock/..."
and "vertex_ai/..." model prefixes); here each is one client class in
the same DIALECTS registry as openai/anthropic/dashscope/gemini
(llm/client.py:442).  The SigV4 signer is shared with the S3 object
store (store/objectstore.py sigv4_headers — validated against the AWS
test-suite vectors); Vertex's RS256 service-account assertion uses the
image's `cryptography` package.
"""

from __future__ import annotations

import base64
import hashlib
import json
import re
import time
from typing import Optional, Sequence
from urllib.parse import quote, urlsplit

import httpx

from super_rag_tpu.llm.client import OpenAICompatClient, ResponseCache
from super_rag_tpu.llm.errors import (
    BadRequestError,
    is_retryable_error,
    wrap_provider_error,
)
from super_rag_tpu.store.objectstore import sigv4_headers


class BedrockClient(OpenAICompatClient):
    """AWS Bedrock runtime dialect (SigV4-signed ``InvokeModel``).

    Credentials ride in ``api_key`` as ``"ACCESS_KEY:SECRET_KEY"``; the
    region is parsed from the endpoint host
    (``bedrock-runtime.us-east-1.amazonaws.com``) or passed explicitly.
    Model families: ``anthropic.*`` messages for completion,
    ``amazon.titan-embed*`` / ``cohere.embed*`` for embeddings.
    """

    ANTHROPIC_VERSION = "bedrock-2023-05-31"
    DEFAULT_MAX_TOKENS = 1024

    def __init__(self, base_url: str, api_key: str = "",
                 region: Optional[str] = None, **kw):
        kw.setdefault("provider", "bedrock")
        super().__init__(base_url, api_key, **kw)
        host = urlsplit(self.base_url).netloc
        m = re.search(r"\.([a-z0-9-]+)\.amazonaws\.com", host)
        self.region = region or (m.group(1) if m else "us-east-1")
        self.access_key, _, self.secret_key = (api_key or "").partition(":")

    def _post(self, path: str, payload: dict) -> dict:
        """SigV4-signed POST with the base client's retry/error policy."""
        body = json.dumps(payload).encode()
        url = f"{self.base_url}{path}"
        last: Optional[Exception] = None
        for attempt in range(self.max_retries):
            t0 = time.perf_counter()
            try:
                headers = sigv4_headers(
                    "POST", url,
                    region=self.region,
                    access_key=self.access_key,
                    secret_key=self.secret_key,
                    payload_hash=hashlib.sha256(body).hexdigest(),
                    service="bedrock",
                    extra_headers={"content-type": "application/json"},
                )
                r = self._client.post(url, content=body, headers=headers)
                r.raise_for_status()
                data = r.json()
                self.stats.record((time.perf_counter() - t0) * 1000,
                                  data.get("usage"))
                return data
            except Exception as e:  # noqa: BLE001 — classified below
                err = wrap_provider_error(e, self.provider, self.model)
                self.stats.record((time.perf_counter() - t0) * 1000,
                                  error=True)
                last = err
                if (not is_retryable_error(err)
                        or attempt == self.max_retries - 1):
                    raise err from e
                time.sleep(min(2.0 ** attempt, 8.0))
        raise last  # pragma: no cover

    @staticmethod
    def _invoke_path(model: str) -> str:
        # bedrock model ids contain ':' (…-v1:0) — single-encoded on the
        # wire; the signer double-encodes it in the canonical request
        return f"/model/{quote(model, safe='')}/invoke"

    def complete(self, prompt: Optional[str] = None,
                 messages: Optional[list[dict]] = None,
                 temperature: float = 0.1, max_tokens: Optional[int] = None,
                 model: Optional[str] = None, use_cache: bool = True) -> str:
        mdl = model or self.model
        msgs = messages or [{"role": "user", "content": prompt or ""}]
        if mdl.startswith("anthropic."):
            system = "\n".join(m.get("content", "") for m in msgs
                               if m.get("role") == "system")
            payload: dict = {
                "anthropic_version": self.ANTHROPIC_VERSION,
                "max_tokens": max_tokens or self.DEFAULT_MAX_TOKENS,
                "messages": [m for m in msgs if m.get("role") != "system"],
                "temperature": temperature,
            }
            if system:
                payload["system"] = system
        else:  # amazon.titan-text dialect
            text = "\n".join(m.get("content", "") for m in msgs)
            payload = {
                "inputText": text,
                "textGenerationConfig": {
                    "temperature": temperature,
                    **({"maxTokenCount": max_tokens} if max_tokens else {}),
                },
            }
        ck = None
        if self.cache and use_cache and temperature == 0.0:
            ck = ResponseCache.key("completion", {"m": mdl, **payload})
            hit = self.cache.get(ck)
            if hit is not None:
                return hit
        data = self._post(self._invoke_path(mdl), payload)
        if mdl.startswith("anthropic."):
            text_out = "".join(b.get("text", "")
                               for b in data.get("content", [])
                               if b.get("type") == "text")
        else:
            text_out = "".join(r.get("outputText", "")
                               for r in data.get("results", []))
        if ck is not None:
            self.cache.put(ck, text_out)
        return text_out

    def embed(self, texts: Sequence[str], model: Optional[str] = None,
              use_cache: bool = True) -> list[list[float]]:
        mdl = model or self.model
        ck = None
        if self.cache and use_cache:
            ck = ResponseCache.key("embedding", {"m": mdl,
                                                 "t": list(texts)})
            hit = self.cache.get(ck)
            if hit is not None:
                return hit
        if mdl.startswith("cohere."):
            data = self._post(self._invoke_path(mdl), {
                "texts": list(texts), "input_type": "search_document",
            })
            out = [list(map(float, e)) for e in data.get("embeddings", [])]
        else:  # amazon.titan-embed dialect: one text per invocation
            out = []
            for t in texts:
                data = self._post(self._invoke_path(mdl), {"inputText": t})
                out.append(list(map(float, data.get("embedding", []))))
        if ck is not None:
            self.cache.put(ck, out)
        return out

    def rerank(self, query: str, documents: Sequence[str],
               top_n: Optional[int] = None,
               model: Optional[str] = None) -> list[dict]:
        raise BadRequestError(
            "the bedrock dialect serves no rerank API", self.provider
        )


def _b64url(data: bytes) -> bytes:
    return base64.urlsafe_b64encode(data).rstrip(b"=")


def _sa_assertion(sa: dict, now: Optional[float] = None) -> str:
    """RS256 service-account JWT (grant_type=jwt-bearer assertion)."""
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding

    now = time.time() if now is None else now
    header = _b64url(json.dumps({"alg": "RS256", "typ": "JWT"}).encode())
    claims = _b64url(json.dumps({
        "iss": sa["client_email"],
        "scope": "https://www.googleapis.com/auth/cloud-platform",
        "aud": sa["token_uri"],
        "iat": int(now), "exp": int(now) + 3600,
    }).encode())
    signing_input = header + b"." + claims
    key = serialization.load_pem_private_key(
        sa["private_key"].encode(), password=None)
    sig = key.sign(signing_input, padding.PKCS1v15(), hashes.SHA256())
    return (signing_input + b"." + _b64url(sig)).decode()


class VertexClient(OpenAICompatClient):
    """GCP Vertex AI dialect (OAuth2 service-account auth).

    ``api_key`` is the service-account JSON (the string itself or a path
    to it); an RS256 jwt-bearer assertion is exchanged at the account's
    ``token_uri`` for a cached bearer token.  Completion uses the Gemini
    ``generateContent`` wire shape, embeddings the ``:predict``
    text-embedding shape.
    """

    def __init__(self, base_url: str, api_key: str = "",
                 location: Optional[str] = None,
                 project: Optional[str] = None, **kw):
        kw.setdefault("provider", "vertex")
        super().__init__(base_url, api_key, **kw)
        raw = api_key or "{}"
        if not raw.lstrip().startswith("{"):
            with open(raw) as f:
                raw = f.read()
        self.sa = json.loads(raw)
        self.project = project or self.sa.get("project_id", "")
        host = urlsplit(self.base_url).netloc
        m = re.match(r"([a-z0-9-]+)-aiplatform\.googleapis\.com", host)
        self.location = location or (m.group(1) if m else "us-central1")
        self._token: Optional[str] = None
        self._token_exp = 0.0

    def _bearer(self) -> str:
        if self._token and time.time() < self._token_exp - 60:
            return self._token
        r = self._client.post(self.sa["token_uri"], data={
            "grant_type": "urn:ietf:params:oauth:grant-type:jwt-bearer",
            "assertion": _sa_assertion(self.sa),
        })
        r.raise_for_status()
        tok = r.json()
        self._token = tok["access_token"]
        self._token_exp = time.time() + float(tok.get("expires_in", 3600))
        return self._token

    def _headers(self) -> dict:
        return {"Content-Type": "application/json",
                "Authorization": f"Bearer {self._bearer()}"}

    def _model_path(self, model: str, verb: str) -> str:
        return (f"/v1/projects/{self.project}/locations/{self.location}"
                f"/publishers/google/models/{model}:{verb}")

    def complete(self, prompt: Optional[str] = None,
                 messages: Optional[list[dict]] = None,
                 temperature: float = 0.1, max_tokens: Optional[int] = None,
                 model: Optional[str] = None, use_cache: bool = True) -> str:
        mdl = model or self.model
        msgs = messages or [{"role": "user", "content": prompt or ""}]
        system = "\n".join(m.get("content", "") for m in msgs
                           if m.get("role") == "system")
        contents = [{
            "role": "model" if m.get("role") == "assistant" else "user",
            "parts": [{"text": m.get("content", "")}],
        } for m in msgs if m.get("role") != "system"]
        payload: dict = {
            "contents": contents,
            "generationConfig": {
                "temperature": temperature,
                **({"maxOutputTokens": max_tokens} if max_tokens else {}),
            },
        }
        if system:
            payload["systemInstruction"] = {"parts": [{"text": system}]}
        ck = None
        if self.cache and use_cache and temperature == 0.0:
            ck = ResponseCache.key("completion", {"m": mdl, **payload})
            hit = self.cache.get(ck)
            if hit is not None:
                return hit
        data = self._post(self._model_path(mdl, "generateContent"), payload)
        cands = data.get("candidates", [])
        text = "".join(
            p.get("text", "")
            for p in (cands[0].get("content", {}).get("parts", [])
                      if cands else [])
        )
        if ck is not None:
            self.cache.put(ck, text)
        return text

    def embed(self, texts: Sequence[str], model: Optional[str] = None,
              use_cache: bool = True) -> list[list[float]]:
        mdl = model or self.model
        payload = {"instances": [{"content": t} for t in texts]}
        ck = None
        if self.cache and use_cache:
            ck = ResponseCache.key("embedding", {"m": mdl, **payload})
            hit = self.cache.get(ck)
            if hit is not None:
                return hit
        data = self._post(self._model_path(mdl, "predict"), payload)
        out = [list(map(float, p.get("embeddings", {}).get("values", [])))
               for p in data.get("predictions", [])]
        if ck is not None:
            self.cache.put(ck, out)
        return out

    def rerank(self, query: str, documents: Sequence[str],
               top_n: Optional[int] = None,
               model: Optional[str] = None) -> list[dict]:
        raise BadRequestError(
            "the vertex dialect serves no rerank API here", self.provider
        )
