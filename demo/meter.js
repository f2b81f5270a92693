/* Talk-time metering client (capability counterpart of the reference
 * demo's login/metering/queue flow in demo/main.js + demo/server.py):
 * acquire a session grant from the demo server before opening the
 * realtime transport, poll a queue ticket while every pipeline unit is
 * busy, keep the grant alive with heartbeats, and release it on stop.
 *
 * Everything degrades to a no-op when the page is not served by
 * demo/server.py (raw static hosting / metering disabled). */

async function getConfig() {
  try {
    const resp = await fetch("/api/config");
    if (!resp.ok) return {};
    return await resp.json();
  } catch (e) {
    return {}; // static hosting: no /api at all
  }
}

function authHeaders() {
  const token = localStorage.getItem("s2s_demo_token");
  return token ? { Authorization: `Bearer ${token}` } : {};
}

export class Meter {
  constructor(chat) {
    this.chat = chat;
    this.sessionId = null;
    this.ticket = null;
    this.heartbeatS = 30;
    this._timer = null;
    this.enabled = false;
    this.onExpired = null; // set by the app: called when budget runs out mid-talk
  }

  /* Resolve to true when talking may start (granted or metering is off);
   * false when denied.  Blocks polling while queued. */
  async acquire() {
    const cfg = await getConfig();
    this.enabled = cfg.metering === true;
    this.heartbeatS = cfg.heartbeatS ?? 30;
    if (!this.enabled) return true;

    let payload = await this._post("/api/session", {});
    while (payload?.queued) {
      this.ticket = payload.ticket;
      this.chat.status(`all lines busy — you are #${payload.position} in line…`);
      await new Promise((ok) => setTimeout(ok, 2000));
      const resp = await fetch(`/api/queue/${this.ticket}`, { headers: authHeaders() });
      if (!resp.ok) return false; // ticket expired server-side
      payload = await resp.json();
    }
    this.ticket = null;
    if (!payload?.granted) {
      const mins = Math.ceil((payload?.remaining_s ?? 0) / 60);
      this.chat.status(
        payload?.reason === "budget"
          ? "daily talk time used up — come back tomorrow"
          : `not granted${mins ? ` (${mins} min left)` : ""}`
      );
      return false;
    }
    this.sessionId = payload.session_id;
    this._showRemaining(payload.remaining_s);
    this._timer = setInterval(() => this._heartbeat(), this.heartbeatS * 1000);
    return true;
  }

  async _heartbeat() {
    const payload = await this._post("/api/session/heartbeat", { session_id: this.sessionId });
    if (!payload) return; // transient network error: keep the session
    this._showRemaining(payload.remaining_s);
    if (payload.expired) {
      this.chat.status("talk time used up — session ending");
      this.release();
      if (this.onExpired) this.onExpired();
    }
  }

  _showRemaining(remainingS) {
    if (remainingS == null) return; // unlimited tier
    const m = Math.floor(remainingS / 60);
    const s = Math.floor(remainingS % 60);
    this.chat.status(`talking — ${m}:${String(s).padStart(2, "0")} left today`);
  }

  release() {
    clearInterval(this._timer);
    this._timer = null;
    if (this.ticket) {
      this._post("/api/queue/end", { ticket: this.ticket });
      this.ticket = null;
    }
    if (this.sessionId) {
      this._post("/api/session/end", { session_id: this.sessionId });
      this.sessionId = null;
    }
  }

  async _post(path, body) {
    try {
      const resp = await fetch(path, {
        method: "POST",
        headers: { "Content-Type": "application/json", ...authHeaders() },
        body: JSON.stringify(body),
      });
      if (resp.status === 429) return await resp.json(); // denied payload
      if (!resp.ok) return null;
      return await resp.json();
    } catch (e) {
      return null;
    }
  }
}

/* HF sign-in widget (capability counterpart of the reference demo's HF
 * OAuth login): when the demo server advertises oauth in /api/config,
 * render a sign-in link (or the signed-in user + tier + sign-out) into
 * #account.  Static hosting / oauth-disabled: renders nothing. */
export async function renderAccount() {
  const el = document.getElementById("account");
  if (!el) return;
  const cfg = await getConfig();
  if (!cfg.oauth) return;
  let me = {};
  try {
    const resp = await fetch("/api/me", { headers: authHeaders() });
    if (resp.ok) me = await resp.json();
  } catch (e) { return; }
  el.textContent = "";
  if (me.user) {
    // me.user is the HF display name — arbitrary user text, so build DOM
    // nodes (textContent) rather than innerHTML to keep script out
    const left = me.remaining_s == null ? "unlimited" : `${Math.floor(me.remaining_s / 60)} min left today`;
    el.append("signed in as ");
    const b = document.createElement("b");
    b.textContent = me.user;
    el.append(b, ` (${me.tier}, ${left}) — `);
    const out = document.createElement("a");
    out.href = cfg.logoutPath;
    out.textContent = "sign out";
    el.append(out);
  } else {
    const a = document.createElement("a");
    a.href = cfg.loginPath;
    a.textContent = "Sign in with Hugging Face";
    el.append(a, " for more daily talk time");
  }
}
