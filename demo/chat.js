/* Chat transcript UI (reference demo/ui/chat.js, re-shaped for this build):
 * user/assistant bubbles with PER-STREAM rendering — assistant deltas are
 * keyed by (response_id, item_id, output_index, content_index) so
 * interleaved or out-of-band responses each get their own bubble and a
 * done-event never reprints text that already streamed — plus in-place
 * partial transcription, collapsible tool-call rows, cancelled-response
 * marking, response.done reconstruction fallback (done-only servers),
 * a status line, and a usage footer. */

export class ChatUI {
  constructor(root, statusEl, usageEl) {
    this.root = root;
    this.statusEl = statusEl;
    this.usageEl = usageEl;
    this.partialEl = null;
    this.pendingEl = null; // "…" placeholder between speech end and first delta
    this.streams = new Map(); // stream key -> {el, text}
    this._scrollQueued = false;
  }

  /* Coalesced, position-respecting autoscroll: a burst of deltas schedules
   * ONE write per frame, and a reader who scrolled up to re-read history is
   * never yanked back down (reference chat pane behavior). */
  _scrollToBottom() {
    if (this._scrollQueued) return;
    const nearBottom =
      this.root.scrollHeight - this.root.scrollTop - this.root.clientHeight < 80;
    if (!nearBottom) return;
    this._scrollQueued = true;
    requestAnimationFrame(() => {
      this._scrollQueued = false;
      this.root.scrollTop = this.root.scrollHeight;
    });
  }

  _bubble(cls) {
    const el = document.createElement("div");
    el.className = `bubble ${cls}`;
    this.root.appendChild(el);
    this._scrollToBottom();
    return el;
  }

  /* Placeholder while the cascade is thinking (speech stopped, no reply
   * delta yet); dismissed by the first assistant delta or response end. */
  pending() {
    if (this.pendingEl) return;
    this.pendingEl = this._bubble("assistant pending");
    this.pendingEl.textContent = "…";
  }

  _clearPending() {
    this.pendingEl?.remove();
    this.pendingEl = null;
  }

  static streamKey(evt) {
    return [evt.response_id, evt.item_id, evt.output_index, evt.content_index].join("|");
  }

  status(text) {
    this.statusEl.textContent = text;
  }

  _userText(bubble, text) {
    /* user bubbles keep text in a dedicated span so an attached audio
     * replay player (userAudio) survives transcript updates */
    let span = bubble.querySelector(".txt");
    if (!span) {
      span = document.createElement("span");
      span.className = "txt";
      bubble.prepend(span);
    }
    span.textContent = text;
  }

  userPartial(text) {
    if (!this.partialEl) this.partialEl = this._bubble("user partial");
    this._userText(this.partialEl, text);
    this._scrollToBottom();
  }

  userFinal(text) {
    if (this.partialEl) {
      this.partialEl.classList.remove("partial");
      this._userText(this.partialEl, text);
      this.partialEl = null;
    } else if (text) {
      this._userText(this._bubble("user"), text);
    }
  }

  userAudio(itemId, blob, seconds) {
    /* attach (or, on a reopened turn, replace) a replay player for the
     * audio the backend actually heard (recorder.js); one per item */
    let player = this.audioPlayers?.get(itemId);
    if (!player) {
      this.audioPlayers ??= new Map();
      player = document.createElement("audio");
      player.controls = true;
      player.className = "user-audio";
      const host = this.partialEl
        ?? [...this.root.querySelectorAll(".bubble.user")].pop()
        ?? this._bubble("user");
      host.appendChild(player);
      this.audioPlayers.set(itemId, player);
    }
    if (player.src) URL.revokeObjectURL(player.src);
    player.src = URL.createObjectURL(blob);
    player.title = `${seconds.toFixed(1)} s as heard by the server`;
    // one replay at a time: starting one pauses every other user player
    player.onplay = () => {
      for (const other of this.audioPlayers.values())
        if (other !== player && !other.paused) other.pause();
    };
  }

  userCancelled() {
    /* input discarded (reopen/cancel): drop the live partial bubble */
    this.partialEl?.remove();
    this.partialEl = null;
  }

  assistantDelta(evt) {
    this._clearPending();
    const key = ChatUI.streamKey(evt);
    let stream = this.streams.get(key);
    if (!stream) {
      stream = { el: this._bubble("assistant"), text: "" };
      this.streams.set(key, stream);
    }
    stream.text += evt.delta ?? "";
    stream.el.textContent = stream.text;
    this._scrollToBottom();
  }

  assistantDone(evt) {
    /* done-only fallback: servers that never sent deltas for this stream
     * still render the full transcript once */
    const key = ChatUI.streamKey(evt);
    if (this.streams.has(key)) return; // streamed live — never reprint
    const transcript = evt.transcript ?? evt.text ?? "";
    if (transcript) this._bubble("assistant").textContent = transcript;
  }

  toolCall(name, args) {
    const el = this._bubble("tool");
    const head = document.createElement("span");
    head.textContent = `⚙ ${name}(…)`;
    head.style.cursor = "pointer";
    const body = document.createElement("pre");
    body.textContent = args;
    body.style.display = "none";
    head.onclick = () => {
      body.style.display = body.style.display === "none" ? "block" : "none";
    };
    el.append(head, body);
  }

  responseDone(response) {
    this._clearPending();
    const status = response?.status ?? "completed";
    /* reconstruction fallback: render any assistant message items that
     * never streamed (e.g. text-only turns on done-only paths) */
    for (const item of response?.output ?? []) {
      if (item.role !== "assistant") continue;
      for (const part of item.content ?? []) {
        this.assistantDone({
          response_id: response.id,
          item_id: item.id,
          output_index: 0,
          content_index: 0,
          transcript: part.transcript ?? part.text ?? "",
        });
      }
    }
    if (status === "cancelled") {
      for (const [key, stream] of this.streams) {
        if (key.startsWith(`${response?.id}|`)) stream.el.classList.add("cancelled");
      }
    }
    for (const key of [...this.streams.keys()]) {
      if (key.startsWith(`${response?.id}|`)) this.streams.delete(key);
    }
    this.status(status === "completed" ? "turn complete — speak!" : `response ${status}`);
  }

  error(message) {
    this._clearPending();
    this._bubble("error").textContent = `error: ${message}`;
  }

  usage(u) {
    if (!this.usageEl || !u) return;
    const total = (u.input_tokens || 0) + (u.output_tokens || 0);
    this.usageEl.textContent =
      `tokens in/out: ${u.input_tokens ?? 0}/${u.output_tokens ?? 0} (total ${total})`;
  }
}

/* Shared server-event -> ChatUI routing used by both transports.  Covers
 * the full GA event set the server emits (see realtime/handlers.py). */
export function routeServerEvent(evt, chat, hooks = {}) {
  switch (evt.type) {
    case "session.created":
      chat.status(`session ${evt.session?.id ?? ""} — speak!`);
      break;
    case "session.updated":
      break; // settings echoed; no UI change
    case "input_audio_buffer.speech_started":
      if (hooks.onBargeIn) hooks.onBargeIn();
      if (hooks.onSpeechStarted) hooks.onSpeechStarted(evt);
      chat._clearPending(); // user spoke again: the old reply won't come
      chat.status("listening…");
      break;
    case "input_audio_buffer.speech_stopped":
      if (hooks.onSpeechStopped) hooks.onSpeechStopped(evt);
      chat.status("thinking…");
      chat.pending();
      break;
    case "conversation.item.created":
      break; // item identity only; text renders via transcription/deltas
    case "conversation.item.input_audio_transcription.delta":
      chat.userPartial(evt.delta);
      break;
    case "conversation.item.input_audio_transcription.completed":
      chat.userFinal(evt.transcript);
      break;
    case "response.created":
    case "response.output_item.added":
    case "response.content_part.added":
      break; // lifecycle bookkeeping; bubbles open on first delta
    case "response.output_audio_transcript.delta":
    case "response.output_text.delta":
      chat.assistantDelta(evt);
      break;
    case "response.output_audio_transcript.done":
    case "response.output_text.done":
      chat.assistantDone(evt);
      break;
    case "response.output_audio.delta":
      if (hooks.onAudioDelta) hooks.onAudioDelta(evt.delta);
      break;
    case "response.output_audio.done":
      break;
    case "response.function_call_arguments.done":
      chat.toolCall(evt.name ?? "tool", evt.arguments ?? "");
      if (hooks.onToolCall) hooks.onToolCall(evt); // client-executed tools (web_search)
      break;
    case "response.done":
      chat.responseDone(evt.response);
      if (evt.response?.usage) chat.usage(evt.response.usage);
      break;
    case "error":
      chat.error(evt.error?.message ?? "unknown");
      break;
  }
}
