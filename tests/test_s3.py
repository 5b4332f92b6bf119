"""S3 object store: SigV4 signer vs the official AWS test vector, and the
full client against an in-process stub S3 server (httpx MockTransport) —
reference objectstore/s3.py:27-197 parity without boto3."""

import hashlib
import io

import httpx
import pytest

from super_rag_tpu.engine.snapshot import (
    load_index_from_store,
    save_index_to_store,
    store_snapshot_exists,
)
from super_rag_tpu.store.objectstore import (
    S3Error,
    S3ObjectStore,
    get_object_store,
    sigv4_headers,
)

EMPTY_SHA = hashlib.sha256(b"").hexdigest()


def test_sigv4_aws_test_suite_get_vanilla():
    """aws-sig-v4-test-suite/get-vanilla: the canonical spec vector."""
    h = sigv4_headers(
        "GET", "https://example.amazonaws.com/",
        region="us-east-1", service="service",
        access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        payload_hash=EMPTY_SHA,
        amz_date="20150830T123600Z",
    )
    assert h["Authorization"] == (
        "AWS4-HMAC-SHA256 "
        "Credential=AKIDEXAMPLE/20150830/us-east-1/service/aws4_request, "
        "SignedHeaders=host;x-amz-date, "
        "Signature=5fa00fa31553b73ebf1942676e86291e8372ff2a2260956d9b8aae1d"
        "763fbf31"
    )


def test_sigv4_aws_test_suite_get_vanilla_query():
    """get-vanilla-query-order-key-case: query canonicalization."""
    h = sigv4_headers(
        "GET", "https://example.amazonaws.com/?Param2=value2&Param1=value1",
        region="us-east-1", service="service",
        access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        payload_hash=EMPTY_SHA,
        amz_date="20150830T123600Z",
    )
    assert h["Authorization"].endswith(
        "Signature=b97d918cfa904a5beff61c982a1b6f458b799221646efd99d3219ec94"
        "cdf2500"
    )


class StubS3:
    """Minimal in-process S3: PUT/GET/HEAD/DELETE + Range + ListObjectsV2.

    Verifies every request carries a structurally-valid SigV4 header with
    the expected access key (signature math is covered by the AWS vector
    tests above)."""

    def __init__(self, access_key="AK", bucket="b"):
        self.objects: dict[str, bytes] = {}
        self.access_key = access_key
        self.bucket = bucket

    def handler(self, request: httpx.Request) -> httpx.Response:
        auth = request.headers.get("Authorization", "")
        assert auth.startswith("AWS4-HMAC-SHA256 Credential="
                               + self.access_key + "/"), auth
        assert "Signature=" in auth and "SignedHeaders=" in auth
        assert request.headers.get("x-amz-content-sha256")
        path = request.url.path
        assert path.startswith(f"/{self.bucket}/")
        key = path[len(self.bucket) + 2:]
        if request.method == "PUT":
            self.objects[key] = request.content
            return httpx.Response(200)
        if request.method == "DELETE":
            self.objects.pop(key, None)
            return httpx.Response(204)
        if request.method == "HEAD":
            if key not in self.objects:
                return httpx.Response(404)
            return httpx.Response(
                200, headers={"content-length": str(len(self.objects[key]))}
            )
        if request.method == "GET" and "list-type" in dict(
            request.url.params
        ):
            prefix = request.url.params.get("prefix", "")
            keys = sorted(k for k in self.objects if k.startswith(prefix))
            items = "".join(f"<Contents><Key>{k}</Key></Contents>"
                            for k in keys)
            return httpx.Response(
                200,
                text=("<?xml version='1.0'?><ListBucketResult>"
                      f"{items}</ListBucketResult>"),
            )
        if request.method == "GET":
            if key not in self.objects:
                return httpx.Response(404)
            data = self.objects[key]
            rng = request.headers.get("range")
            if rng:
                spec = rng.split("=", 1)[1]
                start_s, _, end_s = spec.partition("-")
                start = int(start_s)
                stop = int(end_s) + 1 if end_s else len(data)
                return httpx.Response(206, content=data[start:stop])
            return httpx.Response(200, content=data)
        return httpx.Response(405)


@pytest.fixture
def store():
    stub = StubS3()
    s = S3ObjectStore(
        "b", endpoint_url="https://s3.test", access_key="AK",
        secret_key="SK", transport=httpx.MockTransport(stub.handler),
    )
    s._stub = stub
    return s


def test_put_get_roundtrip(store):
    store.put("docs/a.txt", b"hello world")
    assert store.get("docs/a.txt") == b"hello world"
    assert store.obj_size("docs/a.txt") == 11
    assert store.exists("docs/a.txt")
    assert not store.exists("docs/missing.txt")


def test_put_file_object(store):
    store.put("f", io.BytesIO(b"streamed"))
    assert store.get("f") == b"streamed"


def test_get_missing_raises(store):
    with pytest.raises(FileNotFoundError):
        store.get("nope")
    with pytest.raises(FileNotFoundError):
        store.obj_size("nope")


def test_stream_range(store):
    store.put("big", bytes(range(100)))
    assert b"".join(store.stream_range("big", 10, 20)) == bytes(range(10, 20))
    assert b"".join(store.stream_range("big", 90)) == bytes(range(90, 100))
    full = b"".join(store.stream_range("big", chunk_size=7))
    assert full == bytes(range(100))


def test_delete_and_prefix(store):
    store.put("p/1", b"1")
    store.put("p/2", b"2")
    store.put("q/3", b"3")
    assert store.list("p/") == ["p/1", "p/2"]
    store.delete_prefix("p/")
    assert store.list("p/") == []
    assert store.exists("q/3")
    store.delete("q/3")
    assert not store.exists("q/3")


def test_keys_with_special_chars(store):
    key = "dir with space/ünïcode+plus.txt"
    store.put(key, b"x")
    assert store.exists(key)
    assert store.get(key) == b"x"


def _spec_signature(request: httpx.Request, secret_key: str) -> str:
    """Independent server-side SigV4 recompute, straight from the AWS
    spec: for service=s3 the canonical URI is the wire path VERBATIM
    (single-encoded, never re-encoded), the canonical query is each
    name/value encoded exactly once and sorted.  Written separately from
    sigv4_headers so a signer-side double-encoding bug mismatches here."""
    import hmac as _hmac_mod
    from urllib.parse import quote as _q
    from urllib.parse import unquote as _uq

    amz_date = request.headers["x-amz-date"]
    date = amz_date[:8]
    auth = request.headers["Authorization"]
    signed_headers = auth.split("SignedHeaders=")[1].split(",")[0]
    names = signed_headers.split(";")
    canon_headers = "".join(
        f"{n}:{' '.join(request.headers.get(n, '').split())}\n"
        for n in names
    )
    q_pairs = []
    raw_q = request.url.query.decode()
    if raw_q:
        for pair in raw_q.split("&"):
            k, _, v = pair.partition("=")
            q_pairs.append((_q(_uq(k), safe="-_.~"),
                            _q(_uq(v), safe="-_.~")))
    canonical = "\n".join([
        request.method,
        request.url.raw_path.decode().split("?")[0],
        "&".join(f"{k}={v}" for k, v in sorted(q_pairs)),
        canon_headers,
        signed_headers,
        request.headers["x-amz-content-sha256"],
    ])
    scope = f"{date}/us-east-1/s3/aws4_request"
    sts = "\n".join([
        "AWS4-HMAC-SHA256", amz_date, scope,
        hashlib.sha256(canonical.encode()).hexdigest(),
    ])
    key = ("AWS4" + secret_key).encode()
    for part in (date, "us-east-1", "s3", "aws4_request"):
        key = _hmac_mod.new(key, part.encode(), hashlib.sha256).digest()
    return _hmac_mod.new(key, sts.encode(), hashlib.sha256).hexdigest()


def test_signature_verifies_for_encoded_keys():
    """Keys needing percent-encoding must sign the single-encoded wire
    path (S3 forbids double-encoding) — a re-encoding signer fails this
    against a verifying server (ADVICE r3 #2)."""
    seen: list[httpx.Request] = []

    def handler(request: httpx.Request) -> httpx.Response:
        seen.append(request)
        got = request.headers["Authorization"].split("Signature=")[1]
        want = _spec_signature(request, "SK")
        assert got == want, (
            f"signature mismatch for {request.url!r}: {got} != {want}")
        return httpx.Response(200, content=b"ok")

    s = S3ObjectStore(
        "b", endpoint_url="https://s3.test", access_key="AK",
        secret_key="SK", region="us-east-1",
        transport=httpx.MockTransport(handler),
    )
    s.put("dir with space/ü.txt", b"x")
    s.get("dir with space/ü.txt")
    s.put("a+b/c%d.txt", b"y")
    # ListObjectsV2 with a continuation-token needing encoding
    s._request("GET", "", query="list-type=2&prefix=dir%20with%20space%2F"
               "&continuation-token=tok%2Bwith%2Fspecials%3D%3D")
    assert len(seen) == 4


def test_error_status_raises():
    def always_500(request):
        return httpx.Response(500, text="InternalError")

    s = S3ObjectStore("b", endpoint_url="https://s3.test", access_key="AK",
                      secret_key="SK",
                      transport=httpx.MockTransport(always_500))
    with pytest.raises(S3Error):
        s.put("k", b"x")
    with pytest.raises(S3Error):
        s.get("k")
    with pytest.raises(S3Error):
        s.list("")


def test_factory_builds_s3():
    s = get_object_store("s3", bucket="b", endpoint_url="https://x",
                         access_key="a", secret_key="s", root="ignored")
    assert isinstance(s, S3ObjectStore)


def test_snapshot_to_store_roundtrip(store):
    import numpy as np

    from super_rag_tpu.engine.index import DeviceIndex, IndexSpec

    idx = DeviceIndex(IndexSpec(dim=16, vocab_size=1 << 12))
    idx.add(np.random.default_rng(0).standard_normal((3, 16)),
            ["alpha doc", "beta doc", "gamma doc"],
            metadata=[{"i": i} for i in range(3)])
    assert not store_snapshot_exists(store, "snapshots/c1")
    save_index_to_store(idx, store, "snapshots/c1")
    assert store_snapshot_exists(store, "snapshots/c1")
    restored = load_index_from_store(store, "snapshots/c1")
    assert restored.size == 3
    assert restored.row_meta[1]["text"] == "beta doc"
    v, i = restored.search_dense(
        np.asarray(idx.emb[:1].astype("float32")), k=1, flt=None
    )
    assert int(np.asarray(i)[0, 0]) == 0
