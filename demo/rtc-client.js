/* WebRTC transport client (reference demo/rtc/s2s-rtc-client.js, trimmed):
 * mic track + remote audio track over RTP (the browser handles Opus and
 * jitter), events over the `oai-events` data channel, SDP offer POSTed to
 * the server's /v1/realtime/calls endpoint. */

import { routeServerEvent } from "./chat.js";

export class RTCClient {
  constructor(chat, orb = null) {
    this.chat = chat;
    this.orb = orb;
    this.pc = null;
    this.channel = null;
    this.mediaStream = null;
    this.audioEl = null;
    this._analysers = [];
  }

  _attachAnalyser(ctx, source, setLevel) {
    /* WebAudio analyser-driven orb levels (RTP audio never surfaces PCM
     * frames to JS, unlike the WS worklet path). */
    const analyser = ctx.createAnalyser();
    analyser.fftSize = 512;
    source.connect(analyser);
    const buf = new Float32Array(analyser.fftSize);
    const timer = setInterval(() => {
      analyser.getFloatTimeDomainData(buf);
      let acc = 0;
      for (let i = 0; i < buf.length; i++) acc += buf[i] * buf[i];
      setLevel(Math.sqrt(acc / buf.length));
    }, 50);
    this._analysers.push({ timer, ctx });
  }

  async start(callsUrl, { instructions, voice, micDeviceId, tools, onToolCall } = {}) {
    this._opts = { instructions, voice, tools, onToolCall };
    this.pc = new RTCPeerConnection();
    const audio = { channelCount: 1, echoCancellation: true, noiseSuppression: true };
    if (micDeviceId) audio.deviceId = { exact: micDeviceId };
    this.mediaStream = await navigator.mediaDevices.getUserMedia({ audio });
    for (const track of this.mediaStream.getTracks()) {
      this.pc.addTrack(track, this.mediaStream);
    }

    this.audioEl = new Audio();
    this.audioEl.autoplay = true;
    this.pc.ontrack = (evt) => {
      const stream = evt.streams[0] ?? new MediaStream([evt.track]);
      this.audioEl.srcObject = stream;
      if (this.orb) {
        const ctx = new AudioContext();
        this._attachAnalyser(ctx, ctx.createMediaStreamSource(stream),
          (v) => this.orb.setAssistantLevel(v));
      }
    };
    if (this.orb) {
      const ctx = new AudioContext();
      this._attachAnalyser(ctx, ctx.createMediaStreamSource(this.mediaStream),
        (v) => this.orb.setUserLevel(v));
    }

    this.channel = this.pc.createDataChannel("oai-events", { ordered: true });
    this.channel.onmessage = (m) =>
      routeServerEvent(JSON.parse(m.data), this.chat, {
        onToolCall: (evt) => this._opts?.onToolCall?.(evt, this),
      });
    this.channel.onopen = () => {
      const session = { type: "realtime" };
      if (instructions) session.instructions = instructions;
      if (voice) session.audio = { output: { voice } };
      if (tools?.length) session.tools = tools;
      this.channel.send(JSON.stringify({ type: "session.update", session }));
    };

    const offer = await this.pc.createOffer();
    await this.pc.setLocalDescription(offer);
    await new Promise((ok) => {
      if (this.pc.iceGatheringState === "complete") return ok();
      this.pc.onicegatheringstatechange = () => {
        if (this.pc.iceGatheringState === "complete") ok();
      };
    });

    const resp = await fetch(callsUrl, {
      method: "POST",
      headers: { "content-type": "application/sdp" },
      body: this.pc.localDescription.sdp,
    });
    if (!resp.ok) throw new Error(`SDP negotiation failed: ${resp.status} ${await resp.text()}`);
    const answer = await resp.text();
    await this.pc.setRemoteDescription({ type: "answer", sdp: answer });
    this.chat.status("WebRTC connected — speak!");
  }

  updateSession(session) {
    if (this.channel?.readyState !== "open") return;
    this.channel.send(JSON.stringify({ type: "session.update", session }));
  }

  sendEvent(evt) {
    /* raw client->server event (tool outputs, follow-up response.create) */
    if (this.channel?.readyState !== "open") return;
    this.channel.send(JSON.stringify(evt));
  }

  sendText(text) {
    if (this.channel?.readyState !== "open") return;
    this.channel.send(
      JSON.stringify({
        type: "conversation.item.create",
        item: { type: "message", role: "user", content: [{ type: "input_text", text }] },
      })
    );
    this.channel.send(JSON.stringify({ type: "response.create", response: {} }));
  }

  stop() {
    for (const { timer, ctx } of this._analysers) {
      clearInterval(timer);
      ctx.close();
    }
    this._analysers = [];
    this.mediaStream?.getTracks().forEach((t) => t.stop());
    this.channel?.close();
    this.pc?.close();
    if (this.audioEl) this.audioEl.srcObject = null;
  }
}
