/* Chat transcript UI (reference demo/ui/chat.js, trimmed to the voice-agent
 * essentials): user/assistant bubbles, in-place partial transcription,
 * streamed assistant deltas appended to one bubble per response, tool-call
 * rows, a status line, and a usage footer. */

export class ChatUI {
  constructor(root, statusEl, usageEl) {
    this.root = root;
    this.statusEl = statusEl;
    this.usageEl = usageEl;
    this.partialEl = null;
    this.assistantEl = null;
  }

  _bubble(cls) {
    const el = document.createElement("div");
    el.className = `bubble ${cls}`;
    this.root.appendChild(el);
    this.root.scrollTop = this.root.scrollHeight;
    return el;
  }

  status(text) {
    this.statusEl.textContent = text;
  }

  userPartial(text) {
    if (!this.partialEl) this.partialEl = this._bubble("user partial");
    this.partialEl.textContent = text;
    this.root.scrollTop = this.root.scrollHeight;
  }

  userFinal(text) {
    if (this.partialEl) {
      this.partialEl.classList.remove("partial");
      this.partialEl.textContent = text;
      this.partialEl = null;
    } else if (text) {
      this._bubble("user").textContent = text;
    }
    this.assistantEl = null; // next assistant delta opens a fresh bubble
  }

  assistantDelta(text) {
    if (!this.assistantEl) this.assistantEl = this._bubble("assistant");
    this.assistantEl.textContent += text;
    this.root.scrollTop = this.root.scrollHeight;
  }

  toolCall(name, args) {
    const el = this._bubble("tool");
    el.textContent = `⚙ ${name}(${args})`;
  }

  responseDone(status) {
    this.assistantEl = null;
    this.status(status === "completed" ? "turn complete — speak!" : `response ${status}`);
  }

  error(message) {
    this._bubble("error").textContent = `error: ${message}`;
  }

  usage(u) {
    if (!this.usageEl || !u) return;
    const total = (u.input_tokens || 0) + (u.output_tokens || 0);
    this.usageEl.textContent =
      `tokens in/out: ${u.input_tokens ?? 0}/${u.output_tokens ?? 0} (total ${total})`;
  }
}

/* Shared server-event -> ChatUI routing used by both transports. */
export function routeServerEvent(evt, chat, hooks = {}) {
  switch (evt.type) {
    case "session.created":
      chat.status(`session ${evt.session?.id ?? ""} — speak!`);
      break;
    case "input_audio_buffer.speech_started":
      if (hooks.onBargeIn) hooks.onBargeIn();
      chat.status("listening…");
      break;
    case "input_audio_buffer.speech_stopped":
      chat.status("thinking…");
      break;
    case "conversation.item.input_audio_transcription.delta":
      chat.userPartial(evt.delta);
      break;
    case "conversation.item.input_audio_transcription.completed":
      chat.userFinal(evt.transcript);
      break;
    case "response.output_audio_transcript.delta":
      chat.assistantDelta(evt.delta);
      break;
    case "response.output_audio.delta":
      if (hooks.onAudioDelta) hooks.onAudioDelta(evt.delta);
      break;
    case "response.function_call_arguments.done":
      chat.toolCall(evt.name ?? "tool", evt.arguments ?? "");
      break;
    case "response.done":
      chat.responseDone(evt.response?.status ?? "completed");
      if (evt.response?.usage) chat.usage(evt.response.usage);
      break;
    case "error":
      chat.error(evt.error?.message ?? "unknown");
      break;
  }
}
