"""Demo hosting periphery: talk-time limiter + demo app server endpoints.

Covers the capability the reference deployment implements in
``/root/reference/demo/limiter.py`` + ``demo/server.py`` (metering with
chunked reservations, queueing when compute is busy, secret-holding search
proxy, SDP proxy) as rebuilt in ``demo/limiter.py`` / ``demo/server.py``.
All tests drive a real in-process HTTP server or the limiter directly with
an injected clock — no network, no real upstreams.
"""

from __future__ import annotations

import http.client
import importlib.util
import json
import sys
import threading
from pathlib import Path

import pytest

DEMO_DIR = Path(__file__).resolve().parent.parent / "demo"


def _load(name: str):
    if str(DEMO_DIR) not in sys.path:
        sys.path.insert(0, str(DEMO_DIR))
    spec = importlib.util.spec_from_file_location(name, DEMO_DIR / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod  # dataclasses resolves cls.__module__ via sys.modules
    spec.loader.exec_module(mod)
    return mod


limiter = _load("limiter")
demo_server = _load("server")


class Clock:
    def __init__(self, t: float = 1_700_000_000.0) -> None:
        self.t = t

    def __call__(self) -> float:
        return self.t

    def advance(self, s: float) -> None:
        self.t += s


@pytest.fixture()
def budget(tmp_path):
    clock = Clock()
    b = limiter.TalkBudget(tmp_path / "usage.sqlite3", clock=clock, chunk_s=10, reap_after_s=20)
    return b, clock


# ── limiter: reservations, budgets, identity ─────────────────────────


def test_grant_debits_first_chunk(budget):
    b, _ = budget
    grant = b.grant(["id_a"], "anonymous")
    assert isinstance(grant, limiter.Grant)
    assert grant.remaining_s == 300 - 10
    assert b.remaining(["id_a"], "anonymous") == 290


def test_unmetered_tier_grants_without_debit(budget):
    b, _ = budget
    grant = b.grant(["id_a"], "unlimited")
    assert isinstance(grant, limiter.Grant)
    assert grant.remaining_s is None
    assert b.remaining(["id_a"], "unlimited") is None


def test_denied_when_budget_exhausted(budget):
    b, clock = budget
    for _ in range(30):  # 30 chunks x 10 s = the full 300 s anon budget
        outcome = b.grant(["id_a"], "anonymous")
        b.end(outcome.session_id)  # end immediately... but refund applies
        clock.advance(1)
    # ends refund most of each chunk, so burn the budget via heartbeats
    grant = b.grant(["id_a"], "anonymous")
    while True:
        clock.advance(10)
        beat = b.heartbeat(grant.session_id)
        if beat["expired"]:
            break
    assert b.remaining(["id_a"], "anonymous") == 0
    assert isinstance(b.grant(["id_a"], "anonymous"), limiter.Denied)


def test_or_matched_identities_governed_by_max(budget):
    b, clock = budget
    grant = b.grant(["id_addr", "id_cookie"], "anonymous")
    clock.advance(25)
    b.heartbeat(grant.session_id)
    b.end(grant.session_id)
    spent_pair = 300 - b.remaining(["id_addr", "id_cookie"], "anonymous")
    # clearing one identifier (new cookie) must NOT reset the budget
    assert 300 - b.remaining(["id_addr", "id_fresh_cookie"], "anonymous") == spent_pair
    assert 300 - b.remaining(["id_other_addr", "id_cookie"], "anonymous") == spent_pair


def test_heartbeat_extends_reservation(budget):
    b, clock = budget
    grant = b.grant(["id_a"], "anonymous")
    clock.advance(8)
    beat = b.heartbeat(grant.session_id)
    assert beat["expired"] is False
    # elapsed 8 s + one-chunk lookahead => reservation grew to 20 s
    assert beat["remaining_s"] == 300 - 20


def test_heartbeat_expires_when_budget_dry(budget):
    b, clock = budget
    grant = b.grant(["id_a"], "anonymous")
    clock.advance(301)
    beat = b.heartbeat(grant.session_id)
    assert beat["expired"] is True
    assert beat["remaining_s"] == 0


def test_unknown_session_heartbeat_expires(budget):
    b, _ = budget
    assert b.heartbeat("talk_missing")["expired"] is True


def test_end_refunds_unused_reservation(budget):
    b, clock = budget
    grant = b.grant(["id_a"], "anonymous")
    clock.advance(3)  # talked 3 s of the 10 s reserved
    b.end(grant.session_id)
    assert b.remaining(["id_a"], "anonymous") == 300 - 4  # elapsed+1, not the chunk
    assert b.end(grant.session_id) == {"ok": False}  # double-end is a no-op


def test_sweep_reaps_only_silent_sessions(budget):
    b, clock = budget
    stale = b.grant(["id_a"], "anonymous")
    clock.advance(15)
    fresh = b.grant(["id_b"], "anonymous")
    clock.advance(10)  # stale silent 25 s (> 20 reap), fresh 10 s
    assert b.sweep() == 1
    assert b.heartbeat(stale.session_id)["expired"] is True
    assert b.heartbeat(fresh.session_id)["expired"] is False


def test_grant_caps_chunk_at_remaining(budget):
    b, clock = budget
    grant = b.grant(["id_a"], "anonymous")
    # burn down to < one chunk left
    while (b.remaining(["id_a"], "anonymous") or 0) > 4:
        clock.advance(10)
        if b.heartbeat(grant.session_id)["expired"]:
            break
    left = b.remaining(["id_a"], "anonymous")
    if left and left > 0:
        g2 = b.grant(["id_a"], "anonymous")
        assert isinstance(g2, limiter.Grant)
        assert g2.remaining_s == 0  # partial chunk reserved, nothing beyond


def test_cookie_sign_and_verify_roundtrip():
    codec = limiter.IdentityCodec(secret=b"s" * 32)
    signed = codec.mint_cookie()
    value = signed.rpartition(".")[0]
    assert codec.read_cookie(signed) == value
    assert codec.read_cookie(value + ".forged0000000000000000000") is None
    assert codec.read_cookie("") is None


def test_identity_hash_stable_and_distinct():
    codec = limiter.IdentityCodec(secret=b"s" * 32)
    assert codec.hash_identity("addr:1.2.3.4") == codec.hash_identity("addr:1.2.3.4")
    assert codec.hash_identity("addr:1.2.3.4") != codec.hash_identity("addr:1.2.3.5")
    assert codec.hash_identity("x") != limiter.IdentityCodec(secret=b"t" * 32).hash_identity("x")


# ── demo app server over real HTTP ───────────────────────────────────


class _TestServer(demo_server.DemoAppServer):
    """Demo server with upstream probes faked for tests."""

    def __init__(self, address, config):
        self.free_units = True
        self.search_payload: dict = {"results": [], "answer": ""}
        self.sdp_response = (201, {"Content-Type": "application/sdp",
                                   "Location": "/v1/realtime/calls/c_1"}, b"v=0 answer")
        self.forwarded: list = []
        super().__init__(address, config)

    def pool_has_free_unit(self) -> bool:
        return self.free_units

    def forward_sdp(self, offer_sdp, query):
        self.forwarded.append((offer_sdp, query))
        return self.sdp_response

    def run_search(self, query):
        if isinstance(self.search_payload, Exception):
            raise self.search_payload
        return dict(self.search_payload, q=query)


@pytest.fixture()
def demo_app(tmp_path):
    config = demo_server.DemoConfig(
        s2s_url="http://127.0.0.1:1", search_key="test-key", limits=True,
        db_path=str(tmp_path / "usage.sqlite3"),
        member_tokens={"member-tok"}, unlimited_tokens={"admin-tok"},
    )
    server = _TestServer(("127.0.0.1", 0), config)
    clock = Clock()
    server.budget = limiter.TalkBudget(
        tmp_path / "usage.sqlite3", clock=clock, chunk_s=10, reap_after_s=20
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield server, server.server_address[1], clock
    server.shutdown()
    server.server_close()


def _request(port, method, path, body=None, headers=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
    payload = json.dumps(body).encode() if isinstance(body, dict) else body
    conn.request(method, path, body=payload, headers=headers or {})
    resp = conn.getresponse()
    raw = resp.read()
    conn.close()
    try:
        data = json.loads(raw)
    except (json.JSONDecodeError, UnicodeDecodeError):
        data = raw
    hdrs = dict(resp.getheaders())
    # dict() collapses duplicate headers (e.g. two Set-Cookie); keep them all
    hdrs["Set-Cookie-All"] = [v for k, v in resp.getheaders() if k.lower() == "set-cookie"]
    return resp.status, hdrs, data


def test_config_reports_capabilities(demo_app):
    _, port, _ = demo_app
    status, _, data = _request(port, "GET", "/api/config")
    assert status == 200
    assert data["search"] is True and data["metering"] is True and data["rtc"] is True


def test_me_anonymous_sets_signed_cookie(demo_app):
    server, port, _ = demo_app
    status, headers, data = _request(port, "GET", "/api/me")
    assert status == 200 and data["tier"] == "anonymous"
    assert data["remaining_s"] == 300
    cookie = headers.get("Set-Cookie", "")
    assert demo_server.ANON_COOKIE in cookie
    signed = cookie.split("=", 1)[1].split(";")[0]
    assert server.codec.read_cookie(signed) is not None


def test_me_with_member_token(demo_app):
    _, port, _ = demo_app
    status, _, data = _request(
        port, "GET", "/api/me", headers={"Authorization": "Bearer member-tok"}
    )
    assert status == 200 and data["tier"] == "member" and data["remaining_s"] == 600


def test_me_with_unlimited_token(demo_app):
    _, port, _ = demo_app
    _, _, data = _request(port, "GET", "/api/me", headers={"Authorization": "Bearer admin-tok"})
    assert data["tier"] == "unlimited" and data["remaining_s"] is None


def test_search_proxies_query(demo_app):
    server, port, _ = demo_app
    server.search_payload = {"results": [{"title": "T"}], "answer": "42"}
    status, _, data = _request(port, "POST", "/api/search", body={"q": "meaning of life"})
    assert status == 200 and data["answer"] == "42" and data["q"] == "meaning of life"


def test_search_requires_query_and_key(demo_app, tmp_path):
    server, port, _ = demo_app
    status, _, _ = _request(port, "POST", "/api/search", body={})
    assert status == 400
    server.config.search_key = ""
    status, _, _ = _request(port, "POST", "/api/search", body={"q": "x"})
    assert status == 501


def test_search_upstream_failure_is_502(demo_app):
    server, port, _ = demo_app
    server.search_payload = RuntimeError("boom")
    status, _, _ = _request(port, "POST", "/api/search", body={"q": "x"})
    assert status == 502


def test_calls_proxies_sdp_offer(demo_app):
    server, port, _ = demo_app
    status, headers, body = _request(
        port, "POST", "/api/calls?model=s2s", body=b"v=0 offer",
        headers={"Content-Type": "application/sdp"},
    )
    assert status == 201 and body == b"v=0 answer"
    assert headers["Location"].endswith("/c_1")
    assert server.forwarded == [(b"v=0 offer", "model=s2s")]


def test_calls_requires_offer(demo_app):
    _, port, _ = demo_app
    status, _, _ = _request(port, "POST", "/api/calls")
    assert status == 400


def test_session_grant_when_pool_free(demo_app):
    _, port, _ = demo_app
    status, _, data = _request(port, "POST", "/api/session")
    assert status == 200 and data["granted"] is True
    assert data["remaining_s"] == 290 and data["session_id"].startswith("talk_")


def test_session_queues_when_pool_busy(demo_app):
    server, port, _ = demo_app
    server.free_units = False
    _, _, first = _request(port, "POST", "/api/session")
    _, _, second = _request(port, "POST", "/api/session")
    assert first["queued"] is True and first["position"] == 1
    assert second["position"] == 2

    # ticket polls report position; the front converts to a grant when a
    # slot frees, later tickets move up
    status, _, data = _request(port, "GET", f"/api/queue/{first['ticket']}")
    assert status == 200 and data == {"queued": True, "position": 1}
    server.free_units = True
    _, _, data = _request(port, "GET", f"/api/queue/{first['ticket']}")
    assert data["granted"] is True
    _, _, data = _request(port, "GET", f"/api/queue/{second['ticket']}")
    assert data["granted"] is True  # now at the front


def test_queue_join_preserved_while_pool_free_but_queue_nonempty(demo_app):
    server, port, _ = demo_app
    server.free_units = False
    _, _, first = _request(port, "POST", "/api/session")
    server.free_units = True
    # a newcomer may not jump the existing line
    _, _, second = _request(port, "POST", "/api/session")
    assert second["queued"] is True and second["position"] == 2
    assert first["position"] == 1


def test_queue_leave_and_unknown_ticket(demo_app):
    server, port, _ = demo_app
    server.free_units = False
    _, _, ticket = _request(port, "POST", "/api/session")
    status, _, data = _request(port, "DELETE", f"/api/queue/{ticket['ticket']}")
    assert status == 200 and data["left"] is True
    status, _, _ = _request(port, "GET", f"/api/queue/{ticket['ticket']}")
    assert status == 404
    # sendBeacon-style exit
    server.free_units = False
    _, _, t2 = _request(port, "POST", "/api/session")
    _request(port, "POST", "/api/queue/end", body={"ticket": t2["ticket"]})
    status, _, _ = _request(port, "GET", f"/api/queue/{t2['ticket']}")
    assert status == 404


def test_heartbeat_and_end_over_http(demo_app):
    _, port, clock = demo_app
    _, _, grant = _request(port, "POST", "/api/session")
    clock.advance(12)
    _, _, beat = _request(port, "POST", "/api/session/heartbeat",
                          body={"session_id": grant["session_id"]})
    assert beat["expired"] is False and beat["remaining_s"] == 300 - 30
    _, _, done = _request(port, "POST", "/api/session/end",
                          body={"session_id": grant["session_id"]})
    assert done["ok"] is True


def test_session_denied_when_budget_spent(demo_app):
    server, port, clock = demo_app
    headers = {"X-Forwarded-For": "9.9.9.9"}
    _, _, grant = _request(port, "POST", "/api/session", headers=headers)
    while True:
        clock.advance(10)
        _, _, beat = _request(port, "POST", "/api/session/heartbeat",
                              body={"session_id": grant["session_id"]})
        if beat["expired"]:
            break
    status, _, data = _request(port, "POST", "/api/session", headers=headers)
    assert status == 429 and data["granted"] is False
    assert data["reason"] == "daily_limit_reached"


def test_metering_off_grants_unmetered(tmp_path):
    config = demo_server.DemoConfig(
        s2s_url="http://127.0.0.1:1", search_key="", limits=False,
        db_path=str(tmp_path / "u.sqlite3"), member_tokens=set(), unlimited_tokens=set(),
    )
    server = _TestServer(("127.0.0.1", 0), config)
    assert server.budget is None
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        _, _, data = _request(port, "POST", "/api/session")
        assert data["granted"] is True and data["remaining_s"] is None
        _, _, beat = _request(port, "POST", "/api/session/heartbeat", body={"session_id": "x"})
        assert beat["expired"] is False
        _, _, config_data = _request(port, "GET", "/api/config")
        assert config_data["search"] is False and config_data["metering"] is False
    finally:
        server.shutdown()
        server.server_close()


def test_static_files_still_served(demo_app):
    _, port, _ = demo_app
    status, _, body = _request(port, "GET", "/index.html")
    assert status == 200 and b"<html" in body.lower()


# ── HF OAuth sign-in (demo/auth.py; reference demo/auth.py flow) ──────

auth_mod = _load("auth")


class _Resp:
    def __init__(self, payload):
        self._payload = payload

    def raise_for_status(self):
        pass

    def json(self):
        return self._payload


class _FakeHTTP:
    """httpx-shaped stub: records the token exchange, serves userinfo."""

    def __init__(self, userinfo):
        self.userinfo = userinfo
        self.posts: list = []
        self.gets: list = []

    def post(self, url, data=None):
        self.posts.append((url, data))
        return _Resp({"access_token": "tok-abc"})

    def get(self, url, headers=None):
        self.gets.append((url, headers))
        return _Resp(self.userinfo)


def _enable_oauth(server, userinfo):
    server.oauth.client_id = "cid-1"
    server.oauth.client_secret = "sec-1"
    server.oauth._http = _FakeHTTP(userinfo)
    return server.oauth._http


def _login_state(headers):
    """(state query param, Cookie header carrying the browser nonce)."""
    from urllib.parse import parse_qs, urlparse

    state = parse_qs(urlparse(headers["Location"]).query)["state"][0]
    nonce_cookie = headers["Set-Cookie"].split(";")[0]
    assert nonce_cookie.startswith(auth_mod.STATE_COOKIE + "=")
    return state, nonce_cookie


def test_oauth_login_redirects_to_hf_authorize(demo_app):
    server, port, _ = demo_app
    _enable_oauth(server, {"sub": "u1"})
    status, headers, _ = _request(port, "GET", auth_mod.LOGIN_PATH)
    assert status == 302
    loc = headers["Location"]
    assert loc.startswith("https://huggingface.co/oauth/authorize?")
    assert "client_id=cid-1" in loc and "state=" in loc and "response_type=code" in loc


def test_oauth_login_disabled_without_client_id(demo_app):
    _, port, _ = demo_app
    status, _, data = _request(port, "GET", auth_mod.LOGIN_PATH)
    assert status == 404


def test_oauth_callback_sets_session_and_me_reports_user(demo_app):
    server, port, _ = demo_app
    http_stub = _enable_oauth(
        server, {"sub": "u-42", "preferred_username": "alice", "isPro": True})
    _, headers, _ = _request(port, "GET", auth_mod.LOGIN_PATH)
    state, nonce_cookie = _login_state(headers)
    status, headers, _ = _request(
        port, "GET", f"{auth_mod.CALLBACK_PATH}?code=abc&state={state}",
        headers={"Cookie": nonce_cookie})
    assert status == 302 and headers["Location"] == "/"
    session_cookies = [c for c in headers["Set-Cookie-All"]
                       if c.startswith(auth_mod.SESSION_COOKIE + "=")]
    assert session_cookies, headers["Set-Cookie-All"]
    cookie = session_cookies[0].split(";")[0]
    # the one-time state nonce is cleared alongside
    assert any(c.startswith(auth_mod.STATE_COOKIE + "=;") or
               c.startswith(auth_mod.STATE_COOKIE + "=Max") or
               (c.startswith(auth_mod.STATE_COOKIE + "=") and "Max-Age=0" in c)
               for c in headers["Set-Cookie-All"])
    # the exchange hit the provider's token endpoint with the code
    assert http_stub.posts and http_stub.posts[0][1]["code"] == "abc"
    status, _, data = _request(port, "GET", "/api/me", headers={"Cookie": cookie})
    assert status == 200
    assert data["tier"] == "unlimited"  # PRO -> unmetered
    assert data["user"] == "alice"
    assert data["remaining_s"] is None


def test_oauth_plain_user_gets_member_tier_and_budget(demo_app):
    server, port, _ = demo_app
    _enable_oauth(server, {"sub": "u-7", "preferred_username": "bob"})
    _, headers, _ = _request(port, "GET", auth_mod.LOGIN_PATH)
    state, nonce_cookie = _login_state(headers)
    _, headers, _ = _request(
        port, "GET", f"{auth_mod.CALLBACK_PATH}?code=c2&state={state}",
        headers={"Cookie": nonce_cookie})
    cookie = [c for c in headers["Set-Cookie-All"]
              if c.startswith(auth_mod.SESSION_COOKIE + "=")][0].split(";")[0]
    status, _, data = _request(port, "GET", "/api/me", headers={"Cookie": cookie})
    assert data["tier"] == "member" and data["user"] == "bob"
    assert isinstance(data["remaining_s"], int)


def test_oauth_callback_rejects_forged_state(demo_app):
    server, port, _ = demo_app
    _enable_oauth(server, {"sub": "u1"})
    status, _, _ = _request(
        port, "GET", f"{auth_mod.CALLBACK_PATH}?code=abc&state=123.deadbeef")
    assert status == 403


def test_oauth_callback_rejects_state_from_another_browser(demo_app):
    """Login CSRF: a validly-signed state completes only in the browser that
    holds the matching nonce cookie minted at /login."""
    server, port, _ = demo_app
    _enable_oauth(server, {"sub": "u1"})
    _, headers, _ = _request(port, "GET", auth_mod.LOGIN_PATH)
    state, _nonce_cookie = _login_state(headers)
    # no nonce cookie (victim's browser never visited /login)
    status, _, _ = _request(
        port, "GET", f"{auth_mod.CALLBACK_PATH}?code=abc&state={state}")
    assert status == 403
    # a different browser's nonce doesn't match either
    status, _, _ = _request(
        port, "GET", f"{auth_mod.CALLBACK_PATH}?code=abc&state={state}",
        headers={"Cookie": f"{auth_mod.STATE_COOKIE}=deadbeef"})
    assert status == 403


def test_oauth_callback_rejects_replayed_signed_cookie_as_state(demo_app):
    """Any codec-signed value verifies (anon/session cookies included); a
    replayed one must 403, not crash on the timestamp parse."""
    server, port, _ = demo_app
    _enable_oauth(server, {"sub": "u1"})
    anon = server.codec.mint_cookie()  # signed, but payload is a uuid hex
    status, _, _ = _request(
        port, "GET", f"{auth_mod.CALLBACK_PATH}?code=abc&state={anon}")
    assert status == 403


def test_oauth_logout_clears_session(demo_app):
    server, port, _ = demo_app
    _enable_oauth(server, {"sub": "u-42", "preferred_username": "alice"})
    _, headers, _ = _request(port, "GET", auth_mod.LOGIN_PATH)
    state, nonce_cookie = _login_state(headers)
    _, headers, _ = _request(
        port, "GET", f"{auth_mod.CALLBACK_PATH}?code=x&state={state}",
        headers={"Cookie": nonce_cookie})
    cookie = [c for c in headers["Set-Cookie-All"]
              if c.startswith(auth_mod.SESSION_COOKIE + "=")][0].split(";")[0]
    status, headers, _ = _request(port, "GET", auth_mod.LOGOUT_PATH,
                                  headers={"Cookie": cookie})
    assert status == 302
    assert "Max-Age=0" in headers["Set-Cookie"]
    # a cleared cookie value no longer authenticates
    status, _, data = _request(port, "GET", "/api/me",
                               headers={"Cookie": auth_mod.SESSION_COOKIE + "="})
    assert data["user"] is None and data["tier"] == "anonymous"


def test_oauth_tier_resolution_org_membership():
    assert auth_mod.HFOAuth.resolve_tier({"isPro": True}) == "unlimited"
    assert auth_mod.HFOAuth.resolve_tier(
        {"orgs": [{"preferred_username": "Cerebras"}]}) == "unlimited"
    assert auth_mod.HFOAuth.resolve_tier({"orgs": ["smolagents"]}) == "unlimited"
    assert auth_mod.HFOAuth.resolve_tier({"sub": "x"}) == "member"


def test_oauth_config_advertises_login_paths(demo_app):
    server, port, _ = demo_app
    _enable_oauth(server, {"sub": "u1"})
    _, _, data = _request(port, "GET", "/api/config")
    assert data["oauth"] is True
    assert data["loginPath"] == auth_mod.LOGIN_PATH
