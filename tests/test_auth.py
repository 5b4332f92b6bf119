"""Auth unit tests: JWT integrity, expiry, password hashing."""

import time

import pytest

from super_rag_tpu.api.auth import (
    Auth,
    decode_jwt,
    hash_password,
    make_jwt,
    verify_password,
)
from super_rag_tpu.api.http import HttpError, Request
from super_rag_tpu.store.db import Database


def make_req(headers=None):
    return Request(method="GET", path="/", query={}, headers=headers or {},
                   body=b"")


def test_password_hash_roundtrip():
    h = hash_password("s3cret")
    assert verify_password("s3cret", h)
    assert not verify_password("wrong", h)
    assert not verify_password("s3cret", "garbage")
    assert hash_password("s3cret") != h  # salted


def test_jwt_roundtrip_and_tamper():
    tok = make_jwt({"sub": "u1"}, "key", ttl_s=60)
    assert decode_jwt(tok, "key")["sub"] == "u1"
    assert decode_jwt(tok, "other-key") is None
    h, b, s = tok.split(".")
    assert decode_jwt(f"{h}.{b}x.{s}", "key") is None  # tampered payload
    assert decode_jwt("not-a-token", "key") is None


def test_jwt_expiry():
    tok = make_jwt({"sub": "u1"}, "key", ttl_s=-1)
    assert decode_jwt(tok, "key") is None


def test_auth_resolution(tmp_path):
    db = Database(str(tmp_path / "a.db"))
    auth = Auth(db, "secret", ttl_hours=1)
    user = auth.register("alice", "pw123456")
    assert user["role"] == "admin"  # first user bootstraps admin
    u2 = auth.register("bob", "pw123456")
    assert u2["role"] == "user"
    with pytest.raises(HttpError):
        auth.register("alice", "again")  # duplicate
    with pytest.raises(HttpError):
        auth.login("alice", "wrong")
    _, tok = auth.login("alice", "pw123456")
    req = make_req({"authorization": f"Bearer {tok}"})
    assert auth.required(req)["username"] == "alice"
    # disabled account
    db.execute("UPDATE user SET is_active=0 WHERE username='bob'")
    with pytest.raises(HttpError):
        auth.login("bob", "pw123456")
    # admin check
    _, btok = (None, None)
    req_b = make_req()
    with pytest.raises(HttpError):
        auth.required(req_b)


def test_api_key_resolution(tmp_path):
    db = Database(str(tmp_path / "k.db"))
    auth = Auth(db, "secret")
    user = auth.register("alice", "pw123456")
    rec = db.create_api_key(user["id"], "test")
    req = make_req({"authorization": f"Bearer {rec['key']}"})
    assert auth.resolve(req)["username"] == "alice"
    req_bad = make_req({"authorization": "Bearer sk-nope"})
    assert auth.resolve(req_bad) is None
