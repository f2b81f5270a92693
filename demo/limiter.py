"""Per-day talk-time budgets for the hosted demo.

Capability counterpart of the reference deployment's metering
(``/root/reference/demo/limiter.py``): the demo server is not in the audio
path (the browser dials the realtime server directly), so talk time is
metered with server-clock **chunked reservations** instead of stream
accounting:

- ``grant()`` debits the first chunk from today's budget up front, so two
  parallel grants against one identity see each other's spend;
- the client heartbeats while talking; each heartbeat extends the
  reservation one chunk at a time until the budget runs dry, at which
  point the heartbeat answers ``expired`` and the client tears down;
- a clean ``end()`` reconciles the reservation to the true elapsed time and
  refunds the unused remainder; a vanished client (no end, no heartbeat)
  is reaped by ``sweep()`` and forfeits at most one chunk.

Budgets are keyed per UTC day — a new day is a new row, no reset job.
Identities are HMAC-hashed before storage; anonymous visitors are tracked
by BOTH a hashed address and a hashed signed-cookie id, and the
most-spent identifier governs, so clearing one of them does not refresh
the budget.  Storage is SQLite (WAL) at an injectable path.

Everything is a :class:`TalkBudget` instance with an injectable clock so
the tests can drive time; there is no module-level mutable state.
"""

from __future__ import annotations

import hashlib
import hmac
import json
import logging
import os
import secrets
import sqlite3
import threading
import time
import uuid
from dataclasses import dataclass
from datetime import datetime, timezone
from pathlib import Path
from typing import Callable, Iterable, Optional

logger = logging.getLogger("s2s.demo.limiter")

#: tier → seconds of talk time per UTC day (None = unmetered)
TIER_BUDGETS_S: dict[str, Optional[int]] = {
    "anonymous": int(os.environ.get("DEMO_LIMIT_ANON_S", "300")),
    "member": int(os.environ.get("DEMO_LIMIT_MEMBER_S", "600")),
    "unlimited": None,
}

#: reservation granularity: what a crash can forfeit, and the heartbeat step
CHUNK_S = int(os.environ.get("DEMO_RESERVE_CHUNK_S", "10"))

#: client heartbeat cadence we advertise (server tolerates up to the reap age)
HEARTBEAT_S = int(os.environ.get("DEMO_HEARTBEAT_S", "5"))

#: a session silent this long is swept (forfeits its reserved remainder)
REAP_AFTER_S = int(os.environ.get("DEMO_SESSION_REAP_S", "20"))


def budget_for_tier(tier: str) -> Optional[int]:
    """Daily allowance in seconds, or None when the tier is unmetered."""
    return TIER_BUDGETS_S.get(tier, TIER_BUDGETS_S["anonymous"])


@dataclass(frozen=True)
class Grant:
    """A successful reservation: the client may talk and must heartbeat."""

    session_id: str
    remaining_s: Optional[int]  # after the initial chunk debit; None = unmetered
    heartbeat_s: int = HEARTBEAT_S


@dataclass(frozen=True)
class Denied:
    """Budget exhausted for every identity supplied."""

    remaining_s: int = 0
    reason: str = "daily_limit_reached"


class IdentityCodec:
    """HMAC-based identity hashing + signed anonymous-cookie minting.

    A stable ``secret`` keeps hashed keys (and therefore budgets) valid
    across restarts; with the random default they only hold per-uptime.
    """

    def __init__(self, secret: bytes | None = None) -> None:
        env = os.environ.get("DEMO_HASH_SECRET", "").strip()
        self._secret = secret or (env.encode() if env else secrets.token_bytes(32))

    def hash_identity(self, raw: str) -> str:
        mac = hmac.new(self._secret, raw.encode("utf-8"), hashlib.sha256)
        return "id_" + mac.hexdigest()[:48]

    def mint_cookie(self) -> str:
        """Fresh anonymous id, returned in signed ``<id>.<sig>`` form."""
        return self.sign_cookie(uuid.uuid4().hex)

    def sign_cookie(self, value: str) -> str:
        sig = hmac.new(self._secret, value.encode("utf-8"), hashlib.sha256).hexdigest()[:24]
        return f"{value}.{sig}"

    def read_cookie(self, signed: str) -> Optional[str]:
        """The embedded id when the signature verifies, else None."""
        if not signed or "." not in signed:
            return None
        value, _, sig = signed.rpartition(".")
        expect = hmac.new(self._secret, value.encode("utf-8"), hashlib.sha256).hexdigest()[:24]
        return value if hmac.compare_digest(sig, expect) else None


class TalkBudget:
    """SQLite-backed daily talk-time accounting with chunked reservations."""

    def __init__(
        self,
        db_path: str | Path,
        clock: Callable[[], float] = time.time,
        chunk_s: int = CHUNK_S,
        reap_after_s: int = REAP_AFTER_S,
    ) -> None:
        self._db_path = str(db_path)
        self._clock = clock
        self.chunk_s = chunk_s
        self.reap_after_s = reap_after_s
        self._lock = threading.Lock()
        with self._lock:
            con = self._connect()
            try:
                con.execute(
                    """CREATE TABLE IF NOT EXISTS spend (
                           identity TEXT NOT NULL,
                           day TEXT NOT NULL,
                           seconds INTEGER NOT NULL DEFAULT 0,
                           PRIMARY KEY (identity, day)
                       )"""
                )
                con.execute(
                    """CREATE TABLE IF NOT EXISTS reservations (
                           session_id TEXT PRIMARY KEY,
                           identities TEXT NOT NULL,
                           day TEXT NOT NULL,
                           tier TEXT NOT NULL,
                           started_at REAL NOT NULL,
                           last_beat_at REAL NOT NULL,
                           reserved_s INTEGER NOT NULL,
                           closed INTEGER NOT NULL DEFAULT 0
                       )"""
                )
                con.commit()
            finally:
                con.close()

    # ── storage plumbing ─────────────────────────────────────────────

    def _connect(self) -> sqlite3.Connection:
        con = sqlite3.connect(self._db_path, timeout=5.0)
        con.execute("PRAGMA journal_mode=WAL")
        con.execute("PRAGMA busy_timeout=5000")
        return con

    def _today(self) -> str:
        return datetime.fromtimestamp(self._clock(), tz=timezone.utc).date().isoformat()

    @staticmethod
    def _spent_one(con: sqlite3.Connection, identity: str, day: str) -> int:
        row = con.execute(
            "SELECT seconds FROM spend WHERE identity=? AND day=?", (identity, day)
        ).fetchone()
        return int(row[0]) if row else 0

    @classmethod
    def _spent(cls, con: sqlite3.Connection, identities: Iterable[str], day: str) -> int:
        """Governing spend across OR-matched identities (max, not sum)."""
        return max((cls._spent_one(con, i, day) for i in identities), default=0)

    @classmethod
    def _debit(
        cls, con: sqlite3.Connection, identities: Iterable[str], day: str, delta_s: int
    ) -> None:
        for identity in identities:
            new = max(0, cls._spent_one(con, identity, day) + delta_s)
            con.execute(
                """INSERT INTO spend (identity, day, seconds) VALUES (?, ?, ?)
                   ON CONFLICT(identity, day) DO UPDATE SET seconds=excluded.seconds""",
                (identity, day, new),
            )

    # ── public API ───────────────────────────────────────────────────

    def remaining(self, identities: list[str], tier: str) -> Optional[int]:
        """Seconds left today for the governing identity (None = unmetered)."""
        budget = budget_for_tier(tier)
        if budget is None:
            return None
        with self._lock:
            con = self._connect()
            try:
                return max(0, budget - self._spent(con, identities, self._today()))
            finally:
                con.close()

    def grant(self, identities: list[str], tier: str) -> Grant | Denied:
        """Reserve the first chunk of talk time, debiting it immediately."""
        budget = budget_for_tier(tier)
        session_id = "talk_" + uuid.uuid4().hex[:20]
        now = self._clock()
        if budget is None:
            return Grant(session_id=session_id, remaining_s=None)
        with self._lock:
            con = self._connect()
            try:
                day = self._today()
                left = budget - self._spent(con, identities, day)
                if left <= 0:
                    return Denied()
                first = min(self.chunk_s, left)
                self._debit(con, identities, day, first)
                con.execute(
                    """INSERT INTO reservations (session_id, identities, day, tier,
                           started_at, last_beat_at, reserved_s, closed)
                       VALUES (?, ?, ?, ?, ?, ?, ?, 0)""",
                    (session_id, json.dumps(identities), day, tier, now, now, first),
                )
                con.commit()
                return Grant(session_id=session_id, remaining_s=max(0, left - first))
            finally:
                con.close()

    def heartbeat(self, session_id: str) -> dict:
        """Extend the reservation one chunk; ``{"expired": True}`` when dry."""
        now = self._clock()
        with self._lock:
            con = self._connect()
            try:
                row = con.execute(
                    """SELECT identities, day, tier, started_at, reserved_s, closed
                       FROM reservations WHERE session_id=?""",
                    (session_id,),
                ).fetchone()
                if row is None or row[5]:
                    return {"expired": True, "reason": "unknown_session"}
                identities, day, tier, started_at, reserved_s = (
                    json.loads(row[0]), row[1], row[2], float(row[3]), int(row[4]),
                )
                budget = budget_for_tier(tier)
                if budget is None:
                    con.execute(
                        "UPDATE reservations SET last_beat_at=? WHERE session_id=?",
                        (now, session_id),
                    )
                    con.commit()
                    return {"expired": False, "remaining_s": None}
                elapsed = now - started_at
                # extend until the reservation covers the NEXT heartbeat window
                added = 0
                while reserved_s + added < elapsed + self.chunk_s:
                    left = budget - self._spent(con, identities, day)
                    if left <= 0:
                        break
                    step = min(self.chunk_s, left)
                    self._debit(con, identities, day, step)
                    added += step
                reserved_s += added
                expired = reserved_s < elapsed
                con.execute(
                    "UPDATE reservations SET last_beat_at=?, reserved_s=? WHERE session_id=?",
                    (now, reserved_s, session_id),
                )
                con.commit()
                left = max(0, budget - self._spent(con, identities, day))
                return {"expired": expired, "remaining_s": left}
            finally:
                con.close()

    def end(self, session_id: str) -> dict:
        """Reconcile to real elapsed time, refunding the unused reservation."""
        now = self._clock()
        with self._lock:
            con = self._connect()
            try:
                row = con.execute(
                    """SELECT identities, day, tier, started_at, reserved_s, closed
                       FROM reservations WHERE session_id=?""",
                    (session_id,),
                ).fetchone()
                if row is None or row[5]:
                    return {"ok": False}
                identities, day, tier, started_at, reserved_s = (
                    json.loads(row[0]), row[1], row[2], float(row[3]), int(row[4]),
                )
                if budget_for_tier(tier) is not None:
                    used = min(reserved_s, int(now - started_at) + 1)
                    refund = reserved_s - used
                    if refund > 0:
                        self._debit(con, identities, day, -refund)
                con.execute(
                    "UPDATE reservations SET closed=1, last_beat_at=? WHERE session_id=?",
                    (now, session_id),
                )
                con.commit()
                return {"ok": True}
            finally:
                con.close()

    def sweep(self) -> int:
        """Close sessions silent past the reap age (reservation forfeited —
        at most one chunk beyond real usage). Returns the count closed."""
        now = self._clock()
        with self._lock:
            con = self._connect()
            try:
                rows = con.execute(
                    "SELECT session_id FROM reservations WHERE closed=0 AND last_beat_at < ?",
                    (now - self.reap_after_s,),
                ).fetchall()
                for (sid,) in rows:
                    con.execute(
                        "UPDATE reservations SET closed=1 WHERE session_id=?", (sid,)
                    )
                con.commit()
                if rows:
                    logger.info("Swept %d silent demo sessions", len(rows))
                return len(rows)
            finally:
                con.close()
