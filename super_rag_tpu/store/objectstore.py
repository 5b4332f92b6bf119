"""Object store for original documents.

Mirrors the reference's ObjectStore contract (objectstore/base.py:7-100:
put/get/obj_size/stream_range/delete + factory by settings) with a local
filesystem backend and a WORKING S3 backend: a from-scratch AWS
Signature-V4 client over httpx (reference objectstore/s3.py:27-197 uses
boto3/aioboto3; this image has neither, and the protocol is small) —
path-style addressing so MinIO/RustFS endpoints work unchanged, ranged
streaming GETs, ListObjectsV2 paging for delete_prefix.  The signer is
validated against the AWS sigv4 test-suite vector (tests/test_s3.py).
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import os
import shutil
from typing import BinaryIO, Iterator, Optional
from urllib.parse import quote, unquote, urlsplit


class ObjectStore:
    def wire_config(self) -> Optional[dict]:
        """kwargs for :func:`get_object_store` that reconstruct this
        store in another process (the ProcessScheduler ships it to
        ingest workers); None when the store is not reconstructible
        (e.g. a test transport) — callers must then prepare in-process."""
        return None

    def put(self, path: str, data: bytes | BinaryIO) -> None:
        raise NotImplementedError

    def get(self, path: str) -> bytes:
        raise NotImplementedError

    def obj_size(self, path: str) -> int:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def stream_range(self, path: str, start: int = 0,
                     end: Optional[int] = None,
                     chunk_size: int = 1 << 20) -> Iterator[bytes]:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def delete_prefix(self, prefix: str) -> None:
        raise NotImplementedError


class LocalObjectStore(ObjectStore):
    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    def wire_config(self) -> Optional[dict]:
        return {"store_type": "local", "root": self.root}

    def _fs(self, path: str) -> str:
        full = os.path.abspath(os.path.join(self.root, path.lstrip("/")))
        if not full.startswith(self.root + os.sep) and full != self.root:
            raise ValueError(f"path escapes object store root: {path}")
        return full

    def put(self, path: str, data: bytes | BinaryIO) -> None:
        full = self._fs(path)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        tmp = full + ".tmp"
        with open(tmp, "wb") as f:
            if isinstance(data, bytes):
                f.write(data)
            else:
                shutil.copyfileobj(data, f)
        os.replace(tmp, full)

    def get(self, path: str) -> bytes:
        with open(self._fs(path), "rb") as f:
            return f.read()

    def obj_size(self, path: str) -> int:
        return os.path.getsize(self._fs(path))

    def exists(self, path: str) -> bool:
        return os.path.isfile(self._fs(path))

    def stream_range(self, path: str, start: int = 0,
                     end: Optional[int] = None,
                     chunk_size: int = 1 << 20) -> Iterator[bytes]:
        size = self.obj_size(path)
        stop = size if end is None else min(end, size)
        with open(self._fs(path), "rb") as f:
            f.seek(start)
            remaining = stop - start
            while remaining > 0:
                block = f.read(min(chunk_size, remaining))
                if not block:
                    break
                remaining -= len(block)
                yield block

    def delete(self, path: str) -> None:
        full = self._fs(path)
        if os.path.isfile(full):
            os.remove(full)

    def delete_prefix(self, prefix: str) -> None:
        full = self._fs(prefix)
        if os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)


# -- AWS Signature V4 (the S3 auth scheme) -----------------------------------

_UNSIGNED = "UNSIGNED-PAYLOAD"


def _uri_encode(s: str, is_key: bool = False) -> str:
    # AWS canonical encoding: unreserved chars only; '/' kept in keys
    return quote(s, safe="/-_.~" if is_key else "-_.~")


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def sigv4_headers(
    method: str,
    url: str,
    *,
    region: str,
    access_key: str,
    secret_key: str,
    payload_hash: str,
    amz_date: Optional[str] = None,
    service: str = "s3",
    extra_headers: Optional[dict] = None,
) -> dict:
    """Compute the SigV4 ``Authorization`` (+ x-amz-*) headers.

    Implements the canonical-request / string-to-sign / derived-key chain
    of the AWS SigV4 spec; validated against the aws-sig-v4-test-suite
    'get-vanilla' vector in tests/test_s3.py.
    """
    if amz_date is None:
        amz_date = datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y%m%dT%H%M%SZ"
        )
    date = amz_date[:8]
    parts = urlsplit(url)
    host = parts.netloc

    headers = {"host": host, "x-amz-date": amz_date}
    if service == "s3":
        headers["x-amz-content-sha256"] = payload_hash
    for k, v in (extra_headers or {}).items():
        headers[k.lower()] = v
    signed_names = sorted(headers)
    canonical_headers = "".join(
        f"{k}:{' '.join(str(headers[k]).split())}\n" for k in signed_names
    )
    signed_headers = ";".join(signed_names)

    # canonical query: decode each name/value, re-encode exactly once,
    # sort by (key, value).  parts.query arrives percent-encoded from the
    # caller; encoding it again would sign '%20' as '%2520'.
    q_pairs = []
    if parts.query:
        for pair in parts.query.split("&"):
            k, _, v = pair.partition("=")
            q_pairs.append((_uri_encode(unquote(k)), _uri_encode(unquote(v))))
    canonical_query = "&".join(f"{k}={v}" for k, v in sorted(q_pairs))

    # canonical URI: for the s3 service the path is used VERBATIM —
    # it is already single-percent-encoded by the caller and S3 forbids
    # the double-encoding other services apply (re-encoding '%' would
    # sign '/a%20b' as '/a%2520b' → SignatureDoesNotMatch on any key
    # that needs encoding).  Every OTHER service (bedrock, execute-api,
    # ...) canonicalizes with the path segments encoded TWICE per the
    # SigV4 spec: the wire path stays single-encoded, the canonical form
    # re-encodes it (':' in bedrock model ids -> '%3A' on the wire,
    # '%253A' in the canonical request).
    if service == "s3":
        canonical_path = parts.path or "/"
    else:
        canonical_path = "/".join(
            _uri_encode(seg) for seg in (parts.path or "/").split("/")
        ) or "/"
    canonical_request = "\n".join([
        method.upper(),
        canonical_path,
        canonical_query,
        canonical_headers,
        signed_headers,
        payload_hash,
    ])
    scope = f"{date}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join([
        "AWS4-HMAC-SHA256",
        amz_date,
        scope,
        hashlib.sha256(canonical_request.encode()).hexdigest(),
    ])
    k_date = _hmac(("AWS4" + secret_key).encode(), date)
    k_region = _hmac(k_date, region)
    k_service = _hmac(k_region, service)
    k_signing = _hmac(k_service, "aws4_request")
    signature = hmac.new(k_signing, string_to_sign.encode(),
                         hashlib.sha256).hexdigest()
    out = {k: v for k, v in headers.items() if k != "host"}
    out["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed_headers}, Signature={signature}"
    )
    return out


class S3Error(RuntimeError):
    def __init__(self, status: int, body: str):
        super().__init__(f"S3 error {status}: {body[:300]}")
        self.status = status


class S3ObjectStore(ObjectStore):
    """SigV4 S3 client over httpx (sync), path-style addressing.

    ``transport`` injects an httpx transport for tests (MockTransport
    stub server); production uses the default HTTP transport against
    AWS or any S3-compatible endpoint (MinIO, RustFS — the reference's
    deployment target, docker-compose.yml).
    """

    def __init__(self, bucket: str, endpoint_url: Optional[str] = None,
                 region: Optional[str] = None,
                 access_key: Optional[str] = None,
                 secret_key: Optional[str] = None,
                 transport=None):
        import httpx

        self.bucket = bucket
        self.region = region or os.environ.get("AWS_REGION", "us-east-1")
        self.access_key = access_key or os.environ.get(
            "AWS_ACCESS_KEY_ID", "")
        self.secret_key = secret_key or os.environ.get(
            "AWS_SECRET_ACCESS_KEY", "")
        self.endpoint = (endpoint_url
                         or f"https://s3.{self.region}.amazonaws.com"
                         ).rstrip("/")
        self._custom_transport = transport is not None
        self._client = httpx.Client(transport=transport, timeout=30.0)

    def wire_config(self) -> Optional[dict]:
        if self._custom_transport:  # test stub — not reconstructible
            return None
        return {"store_type": "s3", "bucket": self.bucket,
                "endpoint_url": self.endpoint, "region": self.region,
                "access_key": self.access_key,
                "secret_key": self.secret_key}

    def _url(self, key: str, query: str = "") -> str:
        path = f"/{self.bucket}/" + _uri_encode(key.lstrip("/"), is_key=True)
        return self.endpoint + path + (f"?{query}" if query else "")

    def _request(self, method: str, key: str, query: str = "",
                 body: bytes = b"", stream: bool = False,
                 extra_headers: Optional[dict] = None):
        url = self._url(key, query)
        payload_hash = hashlib.sha256(body).hexdigest()
        headers = sigv4_headers(
            method, url, region=self.region, access_key=self.access_key,
            secret_key=self.secret_key, payload_hash=payload_hash,
            extra_headers=extra_headers,
        )
        req = self._client.build_request(method, url, headers=headers,
                                         content=body)
        return self._client.send(req, stream=stream)

    def put(self, path: str, data: bytes | BinaryIO) -> None:
        body = data if isinstance(data, bytes) else data.read()
        r = self._request("PUT", path, body=body)
        if r.status_code >= 300:
            raise S3Error(r.status_code, r.text)

    def get(self, path: str) -> bytes:
        r = self._request("GET", path)
        if r.status_code == 404:
            raise FileNotFoundError(path)
        if r.status_code >= 300:
            raise S3Error(r.status_code, r.text)
        return r.content

    def obj_size(self, path: str) -> int:
        r = self._request("HEAD", path)
        if r.status_code == 404:
            raise FileNotFoundError(path)
        if r.status_code >= 300:
            raise S3Error(r.status_code, r.text)
        return int(r.headers.get("content-length", "0"))

    def exists(self, path: str) -> bool:
        return self._request("HEAD", path).status_code == 200

    def stream_range(self, path: str, start: int = 0,
                     end: Optional[int] = None,
                     chunk_size: int = 1 << 20) -> Iterator[bytes]:
        rng = f"bytes={start}-" + ("" if end is None else str(end - 1))
        r = self._request("GET", path, stream=True,
                          extra_headers={"range": rng})
        if r.status_code >= 300:
            r.read()
            r.close()
            if r.status_code == 404:
                raise FileNotFoundError(path)
            raise S3Error(r.status_code, r.text)
        try:
            yield from r.iter_bytes(chunk_size)
        finally:
            r.close()

    def delete(self, path: str) -> None:
        r = self._request("DELETE", path)
        if r.status_code >= 300 and r.status_code != 404:
            raise S3Error(r.status_code, r.text)

    def list(self, prefix: str = "") -> list[str]:
        """All keys under ``prefix`` (ListObjectsV2, paged)."""
        import xml.etree.ElementTree as ET

        keys: list[str] = []
        token = ""
        while True:
            query = ("list-type=2&prefix="
                     + _uri_encode(prefix.lstrip("/")))
            if token:
                query += "&continuation-token=" + _uri_encode(token)
            r = self._request("GET", "", query=query)
            if r.status_code >= 300:
                raise S3Error(r.status_code, r.text)
            root = ET.fromstring(r.text)
            ns = ""
            if root.tag.startswith("{"):
                ns = root.tag[: root.tag.index("}") + 1]
            for c in root.findall(f"{ns}Contents"):
                k = c.find(f"{ns}Key")
                if k is not None and k.text:
                    keys.append(k.text)
            nxt = root.find(f"{ns}NextContinuationToken")
            if nxt is None or not nxt.text:
                return keys
            token = nxt.text

    def delete_prefix(self, prefix: str) -> None:
        for key in self.list(prefix):
            self.delete(key)


def get_object_store(store_type: str = "local", **kwargs) -> ObjectStore:
    if store_type == "local":
        return LocalObjectStore(kwargs.get("root", "./data/objects"))
    if store_type == "s3":
        kwargs.pop("root", None)  # local-only argument
        return S3ObjectStore(**kwargs)
    raise ValueError(f"unknown object store type: {store_type}")
