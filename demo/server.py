"""Demo web server: static front-end plus the hosting periphery.

Capability counterpart of the reference deployment's ``demo/server.py``
(static Space + secret-holding proxies + login metering + queue), recast
for a self-hosted realtime server instead of a load-balanced Space:

- **Static files** for the browser client (index.html, app.js, ...).
- ``GET /api/config`` — what the front-end may use (search tool on/off,
  realtime URL, metering on/off) without exposing any server-side secret.
- ``POST /api/search`` — same-origin web-search proxy: the Serper-style
  API key lives HERE, never in the browser (the search tool needs a
  secret a static page cannot hold).
- ``POST /api/calls`` — WebRTC SDP proxy to the realtime server's
  ``/v1/realtime/calls`` so the browser only ever dials this origin.
- **Talk-time metering + queue** (enabled with ``DEMO_LIMITS=1``):
  ``POST /api/session`` answers a grant (budget reserved chunk-by-chunk,
  see :mod:`limiter`), a ``denied`` when today's budget is spent, or a
  queue ticket when every pipeline unit is busy; ``GET /api/queue/{id}``
  polls position and claims a grant at the front; heartbeat/end endpoints
  keep the reservation honest. Queueing reserves nothing — budget is
  debited only when a slot is actually granted.

Identity tiers: HF OAuth sign-in (``demo/auth.py``; active when the Spaces
platform injects ``OAUTH_CLIENT_ID`` — PRO/org members are unmetered,
signed-in users get the member budget), or static bearer tokens for
self-hosted deployments (``DEMO_MEMBER_TOKENS`` / ``DEMO_UNLIMITED_TOKENS``);
everyone else is anonymous, tracked by hashed address + signed cookie
(most-spent governs — see limiter).

    python demo/server.py --port 8081   # with `s2s-tpu serve` on :8080
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import threading
import time
import uuid
from collections import OrderedDict
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent))  # sibling-module import (demo is not a package)
from limiter import HEARTBEAT_S, IdentityCodec, Denied, Grant, TalkBudget  # noqa: E402

logger = logging.getLogger("s2s.demo.server")

SEARCH_UPSTREAM = os.environ.get("DEMO_SEARCH_URL", "https://google.serper.dev/search")
ANON_COOKIE = "s2s_demo_anon"


class DemoConfig:
    """Server-side knobs, resolved once (injectable for tests)."""

    def __init__(
        self,
        s2s_url: str = "",
        search_key: str = "",
        limits: bool = False,
        db_path: str = "",
        member_tokens: Optional[set] = None,
        unlimited_tokens: Optional[set] = None,
        search_upstream: str = SEARCH_UPSTREAM,
    ) -> None:
        self.s2s_url = s2s_url or os.environ.get("S2S_URL", "http://127.0.0.1:8080")
        self.search_key = search_key or os.environ.get("SERPER_API_KEY", "").strip()
        self.limits = limits or os.environ.get("DEMO_LIMITS", "") not in ("", "0", "false")
        self.db_path = db_path or os.environ.get(
            "DEMO_USAGE_DB", str(Path(os.environ.get("TMPDIR", "/tmp")) / "s2s-demo-usage.sqlite3")
        )
        self.member_tokens = member_tokens if member_tokens is not None else {
            t for t in os.environ.get("DEMO_MEMBER_TOKENS", "").split(",") if t
        }
        self.unlimited_tokens = unlimited_tokens if unlimited_tokens is not None else {
            t for t in os.environ.get("DEMO_UNLIMITED_TOKENS", "").split(",") if t
        }
        self.search_upstream = search_upstream
        # Public origin for OAuth redirect_uri construction.  When set (the
        # hosted deployment: SPACE_HOST is injected by HF Spaces), the Host
        # header is never trusted for the authorize URL — a spoofed Host
        # otherwise yields an attacker-controlled redirect_uri.  Local dev
        # (unset) falls back to the Host header.
        space_host = os.environ.get("SPACE_HOST", "").strip()
        self.public_base = (
            os.environ.get("DEMO_PUBLIC_BASE", "").strip().rstrip("/")
            or (f"https://{space_host}" if space_host else "")
        )


class SessionQueue:
    """FIFO wait line for pipeline-unit slots.  Tickets carry no budget
    reservation; the front ticket converts to a grant only when the
    realtime pool reports a free unit."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._tickets: "OrderedDict[str, dict]" = OrderedDict()

    def join(self, identities: list, tier: str) -> dict:
        ticket = "q_" + uuid.uuid4().hex[:16]
        with self._lock:
            self._tickets[ticket] = {
                "identities": identities, "tier": tier, "joined_at": time.time(),
            }
            return {"queued": True, "ticket": ticket, "position": len(self._tickets)}

    def position(self, ticket: str) -> Optional[int]:
        """1-based position, or None for an unknown/expired ticket."""
        with self._lock:
            for i, t in enumerate(self._tickets):
                if t == ticket:
                    return i + 1
            return None

    def claim_front(self, ticket: str) -> Optional[dict]:
        """Pop and return the ticket's payload iff it is at the front."""
        with self._lock:
            if self._tickets and next(iter(self._tickets)) == ticket:
                return self._tickets.popitem(last=False)[1]
            return None

    def leave(self, ticket: str) -> bool:
        with self._lock:
            return self._tickets.pop(ticket, None) is not None

    def __len__(self) -> int:
        with self._lock:
            return len(self._tickets)


class DemoAppServer(ThreadingHTTPServer):
    """ThreadingHTTPServer carrying the demo app state for its handlers."""

    daemon_threads = True

    def __init__(self, address, config: DemoConfig) -> None:
        from auth import HFOAuth

        self.config = config
        self.codec = IdentityCodec()
        self.budget = TalkBudget(config.db_path) if config.limits else None
        self.queue = SessionQueue()
        self.oauth = HFOAuth(self.codec)
        self.static_dir = str(Path(__file__).parent)
        super().__init__(address, DemoHandler)

    # ── realtime-server probes (overridable in tests) ────────────────

    def pool_has_free_unit(self) -> bool:
        """True when the realtime server reports an idle pipeline unit."""
        import httpx

        try:
            resp = httpx.get(f"{self.config.s2s_url}/v1/pool", timeout=3.0)
            units = resp.json().get("units", [])
            return any(u.get("state") == "idle" for u in units)
        except Exception:  # noqa: BLE001 — probe failure must not 500 the demo
            logger.warning("pool probe failed", exc_info=True)
            return True  # fail open: the realtime server enforces its own limit

    def forward_sdp(self, offer_sdp: bytes, query: str) -> tuple[int, dict, bytes]:
        """Proxy a WebRTC offer to the realtime server; (status, headers, body)."""
        import httpx

        url = f"{self.config.s2s_url}/v1/realtime/calls"
        if query:
            url += f"?{query}"
        resp = httpx.post(
            url, content=offer_sdp, headers={"Content-Type": "application/sdp"}, timeout=10.0
        )
        headers = {"Content-Type": resp.headers.get("Content-Type", "application/sdp")}
        if "Location" in resp.headers:
            headers["Location"] = resp.headers["Location"]
        return resp.status_code, headers, resp.content

    def run_search(self, query: str) -> dict:
        """Call the Serper-style upstream with the server-held key and
        reduce the response to what the voice agent needs."""
        import httpx

        resp = httpx.post(
            self.config.search_upstream,
            json={"q": query},
            headers={"X-API-KEY": self.config.search_key, "Content-Type": "application/json"},
            timeout=10.0,
        )
        resp.raise_for_status()
        payload = resp.json()
        results = [
            {"title": r.get("title", ""), "link": r.get("link", ""), "snippet": r.get("snippet", "")}
            for r in payload.get("organic", [])[:5]
        ]
        answer = (payload.get("answerBox") or {}).get("answer", "")
        return {"results": results, "answer": answer}


class DemoHandler(SimpleHTTPRequestHandler):
    """Routes /api/* to the app endpoints; everything else is static."""

    server: DemoAppServer
    protocol_version = "HTTP/1.1"

    def __init__(self, request, client_address, server) -> None:
        super().__init__(request, client_address, server, directory=server.static_dir)

    def log_message(self, fmt, *args):  # quiet: stdlib logs every request to stderr
        logger.debug("%s " + fmt, self.address_string(), *args)

    # ── identity ─────────────────────────────────────────────────────

    def _cookies(self) -> dict:
        cookies = {}
        for part in self.headers.get("Cookie", "").split(";"):
            if "=" in part:
                k, _, v = part.strip().partition("=")
                cookies[k] = v
        return cookies

    def _identity(self) -> tuple[list, str, Optional[str]]:
        """(hashed identities, tier, Set-Cookie value or None)."""
        codec = self.server.codec
        auth = self.headers.get("Authorization", "")
        token = auth.removeprefix("Bearer ").strip() if auth.startswith("Bearer ") else ""
        if token and token in self.server.config.unlimited_tokens:
            return [codec.hash_identity("tok:" + token)], "unlimited", None
        if token and token in self.server.config.member_tokens:
            return [codec.hash_identity("tok:" + token)], "member", None
        cookies = self._cookies()
        # HF OAuth session (demo/auth.py): signed-in users key their budget
        # by hashed HF subject, tier from PRO/org membership
        session = self.server.oauth.session_from_cookies(cookies)
        if session is not None:
            return [codec.hash_identity("sub:" + session["sub"])], session["tier"], None
        # anonymous: hashed address + signed cookie id, OR-matched by the limiter
        anon_id = codec.read_cookie(cookies.get(ANON_COOKIE, ""))
        set_cookie = None
        if anon_id is None:
            signed = codec.mint_cookie()
            anon_id = signed.rpartition(".")[0]
            set_cookie = (f"{ANON_COOKIE}={signed}; Path=/; Max-Age=31536000; SameSite=Lax"
                          + ("; Secure" if self._is_https() else ""))
        addr = self.headers.get("X-Forwarded-For", "").split(",")[0].strip() or self.client_address[0]
        return (
            [codec.hash_identity("addr:" + addr), codec.hash_identity("anon:" + anon_id)],
            "anonymous",
            set_cookie,
        )

    # ── plumbing ─────────────────────────────────────────────────────

    def _json(self, status: int, payload: dict, set_cookie: Optional[str] = None) -> None:
        body = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        if set_cookie:
            self.send_header("Set-Cookie", set_cookie)
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> bytes:
        length = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(length) if length else b""

    def _json_body(self) -> dict:
        try:
            return json.loads(self._body() or b"{}")
        except json.JSONDecodeError:
            return {}

    # ── routes ───────────────────────────────────────────────────────

    def _redirect(self, location: str, *set_cookies: Optional[str]) -> None:
        self.send_response(302)
        self.send_header("Location", location)
        for cookie in set_cookies:
            if cookie:
                self.send_header("Set-Cookie", cookie)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def _callback_uri(self) -> str:
        from auth import CALLBACK_PATH

        base = self.server.config.public_base
        if base:  # configured origin (hosted deployment): never trust Host
            return f"{base}{CALLBACK_PATH}"
        host = self.headers.get("Host", "localhost")
        scheme = "https" if self._is_https() else "http"
        return f"{scheme}://{host}{CALLBACK_PATH}"

    def _is_https(self) -> bool:
        """True when the browser's request arrived over HTTPS (the hosted
        deployment terminates TLS at a proxy that sets X-Forwarded-Proto)."""
        if self.server.config.public_base.startswith("https://"):
            return True
        return self.headers.get("X-Forwarded-Proto") == "https"

    def do_GET(self) -> None:  # noqa: N802 — stdlib handler contract
        from auth import CALLBACK_PATH, LOGIN_PATH, LOGOUT_PATH

        path, _, query = self.path.partition("?")
        oauth = self.server.oauth
        if path == LOGIN_PATH:
            if not oauth.enabled:
                return self._json(404, {"error": "sign-in disabled"})
            url, state_cookie = oauth.login_redirect(
                self._callback_uri(), secure=self._is_https())
            return self._redirect(url, state_cookie)
        if path == CALLBACK_PATH:
            cookie = (
                oauth.handle_callback(query, self._callback_uri(), self._cookies(),
                                      secure=self._is_https())
                if oauth.enabled else None
            )
            if cookie is None:
                return self._json(403, {"error": "oauth verification failed"})
            return self._redirect("/", cookie, oauth.state_clear_cookie(secure=self._is_https()))
        if path == LOGOUT_PATH:
            return self._redirect("/", oauth.logout_cookie(secure=self._is_https()))
        if path == "/api/config":
            cfg = self.server.config
            return self._json(200, {
                "search": bool(cfg.search_key),
                "s2sUrl": cfg.s2s_url,
                "rtc": True,
                "metering": cfg.limits,
                "heartbeatS": HEARTBEAT_S,
                "oauth": oauth.enabled,
                "loginPath": LOGIN_PATH,
                "logoutPath": LOGOUT_PATH,
            })
        if path == "/api/me":
            identities, tier, cookie = self._identity()
            remaining = (
                self.server.budget.remaining(identities, tier)
                if self.server.budget is not None else None
            )
            session = oauth.session_from_cookies(self._cookies())
            return self._json(200, {
                "tier": tier,
                "remaining_s": remaining,
                "user": session.get("name") if session else None,
            }, cookie)
        if path.startswith("/api/queue/"):
            return self._queue_poll(path.removeprefix("/api/queue/"))
        if path.startswith("/api/"):
            return self._json(404, {"error": "unknown endpoint"})
        super().do_GET()

    def do_POST(self) -> None:  # noqa: N802
        path, _, query = self.path.partition("?")
        if path == "/api/search":
            return self._search()
        if path == "/api/calls":
            return self._calls(query)
        if path == "/api/session":
            return self._session_start()
        if path == "/api/session/heartbeat":
            return self._heartbeat()
        if path in ("/api/session/end", "/api/queue/end"):
            return self._session_end(path)
        return self._json(404, {"error": "unknown endpoint"})

    def do_DELETE(self) -> None:  # noqa: N802
        path = self.path.split("?", 1)[0]
        if path.startswith("/api/queue/"):
            gone = self.server.queue.leave(path.removeprefix("/api/queue/"))
            return self._json(200 if gone else 404, {"left": gone})
        return self._json(404, {"error": "unknown endpoint"})

    # ── endpoint bodies ──────────────────────────────────────────────

    def _search(self) -> None:
        if not self.server.config.search_key:
            return self._json(501, {"error": "search is not configured"})
        query = str(self._json_body().get("q", "")).strip()
        if not query:
            return self._json(400, {"error": "missing q"})
        try:
            return self._json(200, self.server.run_search(query))
        except Exception:  # noqa: BLE001 — upstream failure maps to 502
            logger.warning("search upstream failed", exc_info=True)
            return self._json(502, {"error": "search upstream failed"})

    def _calls(self, query: str) -> None:
        offer = self._body()
        if not offer:
            return self._json(400, {"error": "missing SDP offer"})
        try:
            status, headers, body = self.server.forward_sdp(offer, query)
        except Exception:  # noqa: BLE001
            logger.warning("calls proxy failed", exc_info=True)
            return self._json(502, {"error": "realtime server unreachable"})
        self.send_response(status)
        for key, value in headers.items():
            self.send_header(key, value)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _session_start(self) -> None:
        identities, tier, cookie = self._identity()
        if self.server.budget is None:
            return self._json(200, {"granted": True, "session_id": "talk_" + uuid.uuid4().hex[:20],
                                    "remaining_s": None, "heartbeat_s": HEARTBEAT_S}, cookie)
        self.server.budget.sweep()
        if not self.server.pool_has_free_unit() or len(self.server.queue) > 0:
            return self._json(200, self.server.queue.join(identities, tier), cookie)
        return self._grant(identities, tier, cookie)

    def _grant(self, identities: list, tier: str, cookie: Optional[str]) -> None:
        outcome = self.server.budget.grant(identities, tier)
        if isinstance(outcome, Denied):
            return self._json(429, {"granted": False, "reason": outcome.reason,
                                    "remaining_s": outcome.remaining_s}, cookie)
        assert isinstance(outcome, Grant)
        return self._json(200, {"granted": True, "session_id": outcome.session_id,
                                "remaining_s": outcome.remaining_s,
                                "heartbeat_s": outcome.heartbeat_s}, cookie)

    def _queue_poll(self, ticket: str) -> None:
        position = self.server.queue.position(ticket)
        if position is None:
            return self._json(404, {"error": "unknown ticket"})
        if position == 1 and self.server.pool_has_free_unit():
            payload = self.server.queue.claim_front(ticket)
            if payload is not None:
                if self.server.budget is None:
                    return self._json(200, {"granted": True,
                                            "session_id": "talk_" + uuid.uuid4().hex[:20],
                                            "remaining_s": None, "heartbeat_s": HEARTBEAT_S})
                return self._grant(payload["identities"], payload["tier"], None)
        return self._json(200, {"queued": True, "position": position})

    def _heartbeat(self) -> None:
        if self.server.budget is None:
            return self._json(200, {"expired": False, "remaining_s": None})
        session_id = str(self._json_body().get("session_id", ""))
        return self._json(200, self.server.budget.heartbeat(session_id))

    def _session_end(self, path: str) -> None:
        body = self._json_body()
        if path == "/api/queue/end":
            self.server.queue.leave(str(body.get("ticket", "")))
            return self._json(200, {"ok": True})
        if self.server.budget is None:
            return self._json(200, {"ok": True})
        return self._json(200, self.server.budget.end(str(body.get("session_id", ""))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8081)
    parser.add_argument("--s2s-url", default="", help="realtime server base URL")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    server = DemoAppServer((args.host, args.port), DemoConfig(s2s_url=args.s2s_url))
    mode = "metered" if server.budget is not None else "open"
    print(f"demo on http://{args.host}:{args.port} ({mode}; realtime: {server.config.s2s_url})")
    server.serve_forever()


if __name__ == "__main__":
    main()
