/* WebSocket transport client (reference demo/ws/s2s-ws-client.js, trimmed):
 * AudioWorklet mic capture -> input_audio_buffer.append; assistant audio
 * deltas -> AudioWorklet ring-buffer playback with sample-accurate barge-in
 * clear. */

import { routeServerEvent } from "./chat.js";
import { rmsLevel } from "./orb.js";
import { TurnRecorder } from "./recorder.js";

const RATE = 16000;

function int16ToB64(int16) {
  let bin = "";
  for (let i = 0; i < int16.length; i++) {
    const v = int16[i] & 0xffff;
    bin += String.fromCharCode(v & 0xff, v >> 8);
  }
  return btoa(bin);
}

function b64ToInt16(b64) {
  const raw = atob(b64);
  const buf = new Int16Array(raw.length / 2);
  for (let i = 0; i < buf.length; i++) {
    buf[i] = ((raw.charCodeAt(2 * i) | (raw.charCodeAt(2 * i + 1) << 8)) << 16) >> 16;
  }
  return buf;
}

export class WSClient {
  constructor(chat, orb = null) {
    this.chat = chat;
    this.orb = orb;
    this.ws = null;
    this.audioCtx = null;
    this.mediaStream = null;
    this.captureNode = null;
    this.playbackNode = null;
    this.stopped = false;
    this._opts = null;
    this._url = null;
    this._retries = 0;
    // bounded copy of the SENT frames, cut at the server's VAD boundaries
    // into per-turn replayable WAVs (recorder.js); stays on the page
    this.recorder = new TurnRecorder({ rate: RATE });
  }

  _connect(url) {
    this.ws = new WebSocket(url);
    this.ws.onmessage = (m) =>
      routeServerEvent(JSON.parse(m.data), this.chat, {
        onBargeIn: () => this.playbackNode?.port.postMessage({ clear: true }),
        onAudioDelta: (b64) => {
          const pcm = b64ToInt16(b64);
          this.orb?.setAssistantLevel(rmsLevel(pcm));
          this.playbackNode?.port.postMessage({ pcm, rate: RATE });
        },
        onToolCall: (evt) => this._opts?.onToolCall?.(evt, this),
        onSpeechStarted: (evt) => this.recorder.speechStarted(evt),
        onSpeechStopped: (evt) => {
          const seg = this.recorder.speechStopped(evt);
          if (seg) this.chat.userAudio?.(seg.itemId, seg.blob, seg.seconds);
        },
      });
    this.ws.onclose = () => this._scheduleReconnect();
    return new Promise((ok, bad) => {
      this.ws.onopen = ok;
      this.ws.onerror = bad;
    });
  }

  /* auto-reconnect with exponential backoff; the session (settings +
   * audio graph) is re-established on the new socket */
  _scheduleReconnect() {
    if (this.stopped) return;
    const delay = Math.min(10000, 500 * 2 ** this._retries++);
    this.chat.status(`disconnected — reconnecting in ${(delay / 1000).toFixed(1)} s…`);
    setTimeout(async () => {
      if (this.stopped) return;
      try {
        await this._connect(this._url);
        this._retries = 0;
        this._sendSessionUpdate();
        this.chat.status("reconnected — speak!");
      } catch (e) {
        this._scheduleReconnect();
      }
    }, delay);
  }

  async start(url, { instructions, voice, micDeviceId, tools, onToolCall } = {}) {
    this._url = url;
    this._opts = { instructions, voice, micDeviceId, tools, onToolCall };
    await this._connect(url);

    this.audioCtx = new AudioContext();
    await this.audioCtx.audioWorklet.addModule("worklets/capture.js");
    await this.audioCtx.audioWorklet.addModule("worklets/playback.js");

    this.playbackNode = new AudioWorkletNode(this.audioCtx, "s2s-playback");
    this.playbackNode.connect(this.audioCtx.destination);

    try {
      const audio = { channelCount: 1, echoCancellation: true, noiseSuppression: true };
      if (micDeviceId) audio.deviceId = { exact: micDeviceId };
      this.mediaStream = await navigator.mediaDevices.getUserMedia({ audio });
      const srcNode = this.audioCtx.createMediaStreamSource(this.mediaStream);
      this.captureNode = new AudioWorkletNode(this.audioCtx, "s2s-capture");
      srcNode.connect(this.captureNode);
      this.captureNode.port.onmessage = (m) => {
        this.orb?.setUserLevel(rmsLevel(m.data));
        if (this.ws?.readyState !== WebSocket.OPEN) return;
        this.recorder.append(m.data);
        this.ws.send(
          JSON.stringify({ type: "input_audio_buffer.append", audio: int16ToB64(m.data) })
        );
      };
    } catch (e) {
      this.chat.status("no microphone — text-only mode");
    }

    this._sendSessionUpdate();
  }

  sendEvent(evt) {
    /* raw client->server event (tool outputs, follow-up response.create) */
    if (this.ws?.readyState !== WebSocket.OPEN) return;
    this.ws.send(JSON.stringify(evt));
  }

  _sendSessionUpdate() {
    const { instructions, voice, tools } = this._opts ?? {};
    const session = {
      type: "realtime",
      audio: {
        input: {
          format: { type: "audio/pcm", rate: RATE },
          turn_detection: { type: "server_vad", interrupt_response: true },
        },
        output: { format: { type: "audio/pcm", rate: RATE } },
      },
    };
    if (instructions) session.instructions = instructions;
    if (voice) session.audio.output.voice = voice;
    if (tools?.length) session.tools = tools;
    if (this.ws?.readyState === WebSocket.OPEN)
      this.ws.send(JSON.stringify({ type: "session.update", session }));
  }

  updateSession(session) {
    /* live mid-session settings: VAD knobs, voice, instructions */
    if (this.ws?.readyState !== WebSocket.OPEN) return;
    this.ws.send(JSON.stringify({ type: "session.update", session }));
  }

  sendText(text) {
    if (this.ws?.readyState !== WebSocket.OPEN) return;
    this.ws.send(
      JSON.stringify({
        type: "conversation.item.create",
        item: { type: "message", role: "user", content: [{ type: "input_text", text }] },
      })
    );
    this.ws.send(JSON.stringify({ type: "response.create", response: {} }));
  }

  stop() {
    this.stopped = true;
    this.captureNode?.disconnect();
    this.mediaStream?.getTracks().forEach((t) => t.stop());
    this.playbackNode?.port.postMessage({ clear: true });
    this.audioCtx?.close();
    if (this.ws && this.ws.readyState === WebSocket.OPEN) this.ws.close();
  }
}
