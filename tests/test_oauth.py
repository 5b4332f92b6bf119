"""OAuth account flow (reference: fastapi-users OAuth, db/models.py:108-143).

The code exchange runs against a fake provider by injecting the Auth
object's JSON fetcher — no network needed (this image has no egress)."""

import json
import urllib.parse

import httpx
import pytest

from tests.test_api import ServerThread


@pytest.fixture(scope="module")
def oauth_server(tmp_path_factory):
    srv = ServerThread(tmp_path_factory.mktemp("oauth"))
    srv.app.ctx.auth.oauth_providers = {
        "github": {
            "client_id": "cid-123",
            "client_secret": "sek-456",
            "authorize_url": "https://github.test/login/oauth/authorize",
            "token_url": "https://github.test/login/oauth/access_token",
            "userinfo_url": "https://api.github.test/user",
            "scope": "user:email",
            "username_field": "login",
        }
    }
    calls = []

    def fake_fetch(url, data=None, headers=None):
        calls.append({"url": url, "data": data, "headers": headers})
        if "access_token" in url:
            assert data["client_id"] == "cid-123"
            assert data["client_secret"] == "sek-456"
            if data["code"] == "good-code":
                return {"access_token": "gho_tok"}
            return {}
        assert headers["Authorization"] == "Bearer gho_tok"
        return {"id": 4242, "login": "octo", "email": "octo@example.com"}

    srv.app.ctx.auth._fetch_json = fake_fetch
    srv.calls = calls
    yield srv
    srv.stop()


def test_oauth_full_flow(oauth_server):
    base = oauth_server.base
    r = httpx.get(base + "/api/v1/auth/oauth/github/authorize")
    assert r.status_code == 200
    url = r.json()["authorization_url"]
    assert url.startswith("https://github.test/login/oauth/authorize?")
    q = urllib.parse.parse_qs(urllib.parse.urlsplit(url).query)
    assert q["client_id"] == ["cid-123"]
    state = q["state"][0]

    r = httpx.get(base + "/api/v1/auth/oauth/github/callback",
                  params={"code": "good-code", "state": state})
    assert r.status_code == 200, r.text
    body = r.json()
    assert body["user"]["username"] == "octo"
    assert body["user"]["email"] == "octo@example.com"
    token = body["token"]
    with httpx.Client(base_url=base, headers={
        "Authorization": f"Bearer {token}"}) as c:
        assert c.get("/api/v1/users/me").json()["username"] == "octo"
        accounts = c.get("/api/v1/users/me/oauth_accounts").json()
        assert accounts and accounts[0]["provider"] == "github"
        assert accounts[0]["account_id"] == "4242"

    # a SECOND login with the same account links to the same user
    state2 = httpx.get(base + "/api/v1/auth/oauth/github/authorize"
                       ).json()["state"]
    r = httpx.get(base + "/api/v1/auth/oauth/github/callback",
                  params={"code": "good-code", "state": state2})
    assert r.json()["user"]["username"] == "octo"


def test_oauth_rejects_bad_state_and_code(oauth_server):
    base = oauth_server.base
    r = httpx.get(base + "/api/v1/auth/oauth/github/callback",
                  params={"code": "good-code", "state": "forged"})
    assert r.status_code == 401
    state = httpx.get(base + "/api/v1/auth/oauth/github/authorize"
                      ).json()["state"]
    r = httpx.get(base + "/api/v1/auth/oauth/github/callback",
                  params={"code": "bad-code", "state": state})
    assert r.status_code == 401


def test_oauth_unknown_provider(oauth_server):
    r = httpx.get(oauth_server.base + "/api/v1/auth/oauth/gitlab/authorize")
    assert r.status_code == 404
