/* Minimal browser client for the s2s-tpu realtime server (WebSocket
 * transport).  Mic -> 16 kHz PCM16 base64 appends; assistant audio deltas ->
 * scheduled WebAudio playback; barge-in: playback queue flushed on
 * input_audio_buffer.speech_started.  (The reference demo additionally does
 * HF auth/metering and WebRTC — out of scope here.) */

const RATE = 16000;
let ws, audioCtx, workletNode, mediaStream;
let playHead = 0;
let liveSources = [];
let partialEl = null;

const statusEl = document.getElementById("status");
const transcriptEl = document.getElementById("transcript");
const startBtn = document.getElementById("start");

function log(cls, text) {
  const el = document.createElement("div");
  el.className = cls;
  el.textContent = text;
  transcriptEl.appendChild(el);
  transcriptEl.scrollTop = transcriptEl.scrollHeight;
  return el;
}

function b64ToInt16(b64) {
  const raw = atob(b64);
  const buf = new Int16Array(raw.length / 2);
  for (let i = 0; i < buf.length; i++) {
    buf[i] = (raw.charCodeAt(2 * i) | (raw.charCodeAt(2 * i + 1) << 8)) << 16 >> 16;
  }
  return buf;
}

function int16ToB64(int16) {
  let bin = "";
  for (let i = 0; i < int16.length; i++) {
    const v = int16[i] & 0xffff;
    bin += String.fromCharCode(v & 0xff, v >> 8);
  }
  return btoa(bin);
}

function playDelta(b64) {
  const pcm = b64ToInt16(b64);
  const buf = audioCtx.createBuffer(1, pcm.length, RATE);
  const ch = buf.getChannelData(0);
  for (let i = 0; i < pcm.length; i++) ch[i] = pcm[i] / 32768;
  const src = audioCtx.createBufferSource();
  src.buffer = buf;
  src.connect(audioCtx.destination);
  const at = Math.max(audioCtx.currentTime + 0.05, playHead);
  src.start(at);
  playHead = at + buf.duration;
  liveSources.push(src);
  src.onended = () => { liveSources = liveSources.filter((s) => s !== src); };
}

function clearPlayback() {
  for (const src of liveSources) { try { src.stop(); } catch (e) {} }
  liveSources = [];
  playHead = 0;
}

function onServerEvent(evt) {
  switch (evt.type) {
    case "session.created":
      statusEl.textContent = `session ${evt.session.id} — speak!`;
      break;
    case "input_audio_buffer.speech_started":
      clearPlayback(); // barge-in echo cut
      statusEl.textContent = "listening…";
      break;
    case "conversation.item.input_audio_transcription.delta":
      if (!partialEl) partialEl = log("partial", "");
      partialEl.textContent = evt.delta;
      break;
    case "conversation.item.input_audio_transcription.completed":
      if (partialEl) { partialEl.remove(); partialEl = null; }
      log("user", "YOU: " + evt.transcript);
      break;
    case "response.output_audio_transcript.delta":
      log("assistant", "AGENT: " + evt.delta.trim());
      break;
    case "response.output_audio.delta":
      playDelta(evt.delta);
      break;
    case "response.done":
      statusEl.textContent = "turn complete — speak!";
      break;
    case "error":
      statusEl.textContent = "error: " + evt.error.message;
      break;
  }
}

const WORKLET = `
class MicTap extends AudioWorkletProcessor {
  process(inputs) {
    const ch = inputs[0][0];
    if (ch) this.port.postMessage(ch.slice(0));
    return true;
  }
}
registerProcessor("mic-tap", MicTap);
`;

async function start() {
  const url = document.getElementById("url").value;
  ws = new WebSocket(url);
  ws.onmessage = (m) => onServerEvent(JSON.parse(m.data));
  ws.onclose = () => { statusEl.textContent = "disconnected"; stop(); };
  await new Promise((ok, bad) => { ws.onopen = ok; ws.onerror = bad; });

  audioCtx = new AudioContext({ sampleRate: RATE });
  mediaStream = await navigator.mediaDevices.getUserMedia({
    audio: { sampleRate: RATE, channelCount: 1, echoCancellation: true },
  });
  await audioCtx.audioWorklet.addModule(
    URL.createObjectURL(new Blob([WORKLET], { type: "text/javascript" }))
  );
  const srcNode = audioCtx.createMediaStreamSource(mediaStream);
  workletNode = new AudioWorkletNode(audioCtx, "mic-tap");
  srcNode.connect(workletNode);
  workletNode.port.onmessage = (m) => {
    if (ws.readyState !== WebSocket.OPEN) return;
    const f32 = m.data;
    const i16 = new Int16Array(f32.length);
    for (let i = 0; i < f32.length; i++) {
      i16[i] = Math.max(-32768, Math.min(32767, f32[i] * 32768));
    }
    ws.send(JSON.stringify({ type: "input_audio_buffer.append", audio: int16ToB64(i16) }));
  };

  ws.send(JSON.stringify({
    type: "session.update",
    session: {
      type: "realtime",
      audio: {
        input: {
          format: { type: "audio/pcm", rate: RATE },
          turn_detection: { type: "server_vad", interrupt_response: true },
        },
        output: { format: { type: "audio/pcm", rate: RATE } },
      },
    },
  }));

  startBtn.textContent = "Stop";
  startBtn.classList.add("stop");
}

function stop() {
  if (workletNode) workletNode.disconnect();
  if (mediaStream) mediaStream.getTracks().forEach((t) => t.stop());
  if (audioCtx) audioCtx.close();
  if (ws && ws.readyState === WebSocket.OPEN) ws.close();
  clearPlayback();
  startBtn.textContent = "Start";
  startBtn.classList.remove("stop");
  statusEl.textContent = "idle";
}

startBtn.onclick = () => {
  if (startBtn.textContent === "Start") start().catch((e) => {
    statusEl.textContent = "failed: " + e;
  });
  else stop();
};
