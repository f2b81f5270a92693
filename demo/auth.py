"""HF OAuth sign-in for the hosted demo (reference ``demo/auth.py``).

Implements Hugging Face's Spaces OAuth (authorization-code flow) directly
against the stdlib HTTP server — the reference attaches
``huggingface_hub.attach_huggingface_oauth`` to FastAPI; this repo's demo
server is framework-free, so the three routes are hand-rolled:

  GET  /oauth/huggingface/login     302 to the HF authorize endpoint
  GET  /oauth/huggingface/callback  code->token exchange + signed session cookie
  GET  /oauth/huggingface/logout    clears the cookie

Activation mirrors the reference: the OAuth env (``OAUTH_CLIENT_ID``,
``OAUTH_CLIENT_SECRET``, ``OPENID_PROVIDER_URL``) is injected by the Spaces
platform when the Space README sets ``hf_oauth: true`` — locally nothing is
set and sign-in stays disabled (everyone is anonymous / token-tier).

Identity -> limiter tier:
  - signed-in PRO or member of an unlimited org -> ``unlimited``
  - signed-in otherwise                          -> ``member``
  - anonymous                                    -> ``anonymous``
"""

from __future__ import annotations

import hmac
import json
import logging
import os
import secrets
import time
import urllib.parse
from typing import Any, Optional

logger = logging.getLogger("demo.auth")

LOGIN_PATH = "/oauth/huggingface/login"
CALLBACK_PATH = "/oauth/huggingface/callback"
LOGOUT_PATH = "/oauth/huggingface/logout"

SESSION_COOKIE = "s2s_user"
#: short-lived browser-binding cookie set at /login: the callback only
#: accepts a state whose embedded nonce matches it, so an attacker cannot
#: complete the flow in a victim's browser with their own code+state
#: (OAuth login-CSRF; the state parameter alone doesn't bind the browser)
STATE_COOKIE = "s2s_oauth_state"
_SESSION_MAX_AGE = 60 * 60 * 8  # one working day; HF tokens expire sooner
_STATE_MAX_AGE = 600

#: org usernames whose members are unmetered (reference default set); the
#: UNLIMITED_ORGS env (comma/space-separated) adds more
_DEFAULT_UNLIMITED_ORGS = {"cerebras", "huggingfacem4", "smolagents", "pollen-robotics"}


def _unlimited_orgs() -> set[str]:
    raw = os.environ.get("UNLIMITED_ORGS", "")
    extra = {o.strip().lower() for o in raw.replace(",", " ").split() if o.strip()}
    return _DEFAULT_UNLIMITED_ORGS | extra


class HFOAuth:
    """OAuth glue bound to the demo's :class:`limiter.IdentityCodec` (state
    and session cookies ride its HMAC signing)."""

    def __init__(self, codec, http=None) -> None:
        self.codec = codec
        self.client_id = os.environ.get("OAUTH_CLIENT_ID", "")
        self.client_secret = os.environ.get("OAUTH_CLIENT_SECRET", "")
        self.provider = os.environ.get(
            "OPENID_PROVIDER_URL", "https://huggingface.co"
        ).rstrip("/")
        self.scopes = os.environ.get("OAUTH_SCOPES", "openid profile")
        self._http = http  # injectable for tests; defaults to httpx

    @property
    def enabled(self) -> bool:
        return bool(self.client_id)

    # ── routes ────────────────────────────────────────────────────────

    def login_redirect(self, redirect_uri: str, secure: bool = False) -> tuple[str, str]:
        """The HF authorize URL for a 302 plus the ``Set-Cookie`` value for
        the browser-binding state nonce.  ``secure=True`` (HTTPS request)
        adds the Secure attribute so the nonce never rides plaintext."""
        nonce = secrets.token_hex(16)
        state = self.codec.sign_cookie(f"{int(time.time())}:{nonce}")
        params = urllib.parse.urlencode({
            "client_id": self.client_id,
            "redirect_uri": redirect_uri,
            "response_type": "code",
            "scope": self.scopes,
            "state": state,
        })
        state_cookie = (
            f"{STATE_COOKIE}={nonce}; Path=/; Max-Age={_STATE_MAX_AGE}; "
            "HttpOnly; SameSite=Lax" + ("; Secure" if secure else "")
        )
        return f"{self.provider}/oauth/authorize?{params}", state_cookie

    def handle_callback(
        self, query: str, redirect_uri: str, cookies: dict[str, str],
        secure: bool = False,
    ) -> Optional[str]:
        """Exchange the code; returns a ``Set-Cookie`` value for the signed
        session, or None when state/code verification fails.  The state must
        carry the nonce minted at /login for THIS browser (``cookies``)."""
        q = urllib.parse.parse_qs(query)
        state = (q.get("state") or [""])[0]
        code = (q.get("code") or [""])[0]
        payload = self.codec.read_cookie(state)
        if not code or payload is None:
            return None
        # the codec verifies any value it ever signed (session/anon cookies
        # included), so parse defensively rather than trusting the shape
        ts_raw, _, nonce = payload.partition(":")
        try:
            ts = int(ts_raw)
        except ValueError:
            return None
        browser_nonce = cookies.get(STATE_COOKIE, "")
        if (
            time.time() - ts > _STATE_MAX_AGE
            or not nonce
            or not hmac.compare_digest(nonce, browser_nonce)
        ):
            return None
        try:
            token = self._exchange_code(code, redirect_uri)
            user = self._userinfo(token)
        except Exception:  # noqa: BLE001 — provider/network errors end as 403
            logger.exception("OAuth code exchange failed")
            return None
        tier = self.resolve_tier(user)
        session = {
            "sub": str(user.get("sub", "")),
            "name": user.get("preferred_username") or user.get("name") or "",
            "tier": tier,
            "exp": int(time.time()) + _SESSION_MAX_AGE,
        }
        payload = self.codec.sign_cookie(
            urllib.parse.quote(json.dumps(session, separators=(",", ":")))
        )
        # the session cookie carries the tier grant: Secure on HTTPS so it
        # can never leak over a plaintext request (ADVICE r04)
        return (
            f"{SESSION_COOKIE}={payload}; Path=/; Max-Age={_SESSION_MAX_AGE}; "
            "HttpOnly; SameSite=Lax" + ("; Secure" if secure else "")
        )

    @staticmethod
    def logout_cookie(secure: bool = False) -> str:
        return (f"{SESSION_COOKIE}=; Path=/; Max-Age=0; HttpOnly; SameSite=Lax"
                + ("; Secure" if secure else ""))

    @staticmethod
    def state_clear_cookie(secure: bool = False) -> str:
        return (f"{STATE_COOKIE}=; Path=/; Max-Age=0; HttpOnly; SameSite=Lax"
                + ("; Secure" if secure else ""))

    # ── session cookie -> identity ───────────────────────────────────

    def session_from_cookies(self, cookies: dict[str, str]) -> Optional[dict]:
        """The verified, unexpired session dict, else None."""
        raw = self.codec.read_cookie(cookies.get(SESSION_COOKIE, ""))
        if raw is None:
            return None
        try:
            session = json.loads(urllib.parse.unquote(raw))
        except (ValueError, TypeError):
            return None
        if not session.get("sub") or session.get("exp", 0) < time.time():
            return None
        return session

    # ── HF API calls ─────────────────────────────────────────────────

    def _client(self):
        if self._http is None:
            import httpx

            # one shared client for the server's lifetime: per-call clients
            # leak connection pools (GC-reclaimed sockets) under login traffic
            self._http = httpx.Client(timeout=15.0)
        return self._http

    def _exchange_code(self, code: str, redirect_uri: str) -> str:
        resp = self._client().post(
            f"{self.provider}/oauth/token",
            data={
                "client_id": self.client_id,
                "client_secret": self.client_secret,
                "grant_type": "authorization_code",
                "code": code,
                "redirect_uri": redirect_uri,
            },
        )
        resp.raise_for_status()
        return resp.json()["access_token"]

    def _userinfo(self, token: str) -> dict[str, Any]:
        resp = self._client().get(
            f"{self.provider}/oauth/userinfo",
            headers={"Authorization": f"Bearer {token}"},
        )
        resp.raise_for_status()
        return resp.json()

    # ── tier resolution (reference resolve_tier) ─────────────────────

    @staticmethod
    def resolve_tier(user: dict[str, Any]) -> str:
        if user.get("isPro") or user.get("is_pro"):
            return "unlimited"
        orgs = user.get("orgs") or []
        names = set()
        for org in orgs:
            if isinstance(org, dict):
                names.add(str(org.get("preferred_username") or org.get("name") or "").lower())
            else:
                names.add(str(org).lower())
        if names & _unlimited_orgs():
            return "unlimited"
        return "member"
