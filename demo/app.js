/* Demo wiring: transport selection (WebSocket | WebRTC), session options,
 * text side-channel, chat UI, talk-time metering (when served by
 * demo/server.py with DEMO_LIMITS=1), and the client-executed web_search
 * tool loop (reference demo/main.js). */

import { ChatUI } from "./chat.js";
import { WSClient } from "./ws-client.js";
import { RTCClient } from "./rtc-client.js";
import { Orb } from "./orb.js";
import { Meter, renderAccount } from "./meter.js";
import { WEB_SEARCH_TOOL, searchAvailable, handleToolCall } from "./tools.js";

const statusEl = document.getElementById("status");
const transcriptEl = document.getElementById("transcript");
const usageEl = document.getElementById("usage");
const startBtn = document.getElementById("start");
const textInput = document.getElementById("text-input");
const sendBtn = document.getElementById("send-text");

const chat = new ChatUI(transcriptEl, statusEl, usageEl);
const orb = new Orb(document.getElementById("orb"));
const meter = new Meter(chat);
renderAccount();
meter.onExpired = () => stop();
let client = null;

/* mic device picker: populated once permission is granted (labels are
 * blank before getUserMedia) */
async function populateMics() {
  try {
    const devices = await navigator.mediaDevices.enumerateDevices();
    const mic = document.getElementById("mic");
    const current = mic.value;
    mic.innerHTML = '<option value="">default mic</option>';
    for (const d of devices.filter((d) => d.kind === "audioinput")) {
      const opt = document.createElement("option");
      opt.value = d.deviceId;
      opt.textContent = d.label || `mic ${mic.length}`;
      mic.appendChild(opt);
    }
    mic.value = current;
  } catch (e) { /* no device access yet */ }
}
populateMics();
navigator.mediaDevices?.addEventListener?.("devicechange", populateMics);

async function start() {
  const transport = document.getElementById("transport").value;
  const url = document.getElementById("url").value;
  const instructions = document.getElementById("instructions").value || undefined;
  const voice = document.getElementById("voice").value || undefined;
  const micDeviceId = document.getElementById("mic").value || undefined;
  if (!(await meter.acquire())) return; // denied: status line explains why
  const tools = (await searchAvailable()) ? [WEB_SEARCH_TOOL] : undefined;
  client = transport === "webrtc" ? new RTCClient(chat, orb) : new WSClient(chat, orb);
  chat.status(`connecting (${transport})…`);
  await client.start(url, {
    instructions, voice, micDeviceId, tools,
    onToolCall: (evt, c) => handleToolCall(evt, c, chat),
  });
  populateMics(); // labels become visible after permission
  startBtn.textContent = "Stop";
  startBtn.classList.add("stop");
}

/* live VAD knobs -> session.update (the server applies turn-detection
 * changes mid-session) */
function bindVadSlider(id, valId, fmt, build) {
  const el = document.getElementById(id);
  const val = document.getElementById(valId);
  el.addEventListener("input", () => {
    val.textContent = fmt(el.value);
    client?.updateSession({
      type: "realtime",
      audio: { input: { turn_detection: build(parseFloat(el.value)) } },
    });
  });
}
bindVadSlider("vad-thresh", "vad-thresh-val", (v) => Number(v).toFixed(2),
  (v) => ({ type: "server_vad", threshold: v }));
bindVadSlider("vad-silence", "vad-silence-val", (v) => `${v} ms`,
  (v) => ({ type: "server_vad", silence_duration_ms: v }));

function stop() {
  meter.release();
  client?.stop();
  client = null;
  startBtn.textContent = "Start";
  startBtn.classList.remove("stop");
  chat.status("idle");
}

startBtn.onclick = () => {
  if (startBtn.textContent === "Start") {
    start().catch((e) => chat.status("failed: " + e));
  } else {
    stop();
  }
};

sendBtn.onclick = () => {
  const text = textInput.value.trim();
  if (!text || !client) return;
  chat.userFinal(text);
  client.sendText(text);
  textInput.value = "";
};

textInput.addEventListener("keydown", (e) => {
  if (e.key === "Enter") sendBtn.onclick();
});

document.getElementById("transport").addEventListener("change", (e) => {
  const urlEl = document.getElementById("url");
  urlEl.value =
    e.target.value === "webrtc"
      ? urlEl.value.replace(/^ws/, "http").replace("/v1/realtime", "/v1/realtime/calls")
      : urlEl.value.replace(/^http/, "ws").replace("/v1/realtime/calls", "/v1/realtime");
});
