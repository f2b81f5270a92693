/* User-turn audio recorder (reference demo/ws/user-audio-recorder.js,
 * re-designed for this build): keeps a bounded ring of the PCM16 frames
 * ACTUALLY SENT over the realtime socket (post-capture-worklet, so replay
 * is what the backend heard) and cuts it at the server's VAD boundaries
 * (speech_started.audio_start_ms / speech_stopped.audio_end_ms) into a
 * per-item WAV the chat can play back.  A reopened turn (same item_id)
 * extends the prior recording, matching the chat's one-bubble-per-item
 * behavior.  Nothing leaves the page. */

const BYTES = 2;

export function pcm16ToWavBlob(int16, rate) {
  const data = int16.byteLength;
  const buf = new ArrayBuffer(44 + data);
  const v = new DataView(buf);
  const ascii = (off, s) => [...s].forEach((c, i) => v.setUint8(off + i, c.charCodeAt(0)));
  ascii(0, "RIFF"); v.setUint32(4, 36 + data, true); ascii(8, "WAVE");
  ascii(12, "fmt "); v.setUint32(16, 16, true);
  v.setUint16(20, 1, true); v.setUint16(22, 1, true);
  v.setUint32(24, rate, true); v.setUint32(28, rate * BYTES, true);
  v.setUint16(32, BYTES, true); v.setUint16(34, 16, true);
  ascii(36, "data"); v.setUint32(40, data, true);
  new Int16Array(buf, 44).set(int16);
  return new Blob([buf], { type: "audio/wav" });
}

export class TurnRecorder {
  constructor({ rate = 16000, preRollMs = 5000, maxBufferMs = 120000 } = {}) {
    this.rate = rate;
    this.preRoll = Math.round((rate * preRollMs) / 1000);
    this.maxBuffer = Math.round((rate * maxBufferMs) / 1000);
    this.frames = []; // {start, pcm:Int16Array} at absolute sample offsets
    this.sent = 0; // total samples ever appended
    this.active = null; // {itemId, start}
    this.itemId = "";
    this.itemPcm = new Int16Array(0);
  }

  /** One mic frame as it goes onto the socket. */
  append(int16) {
    if (!int16?.length) return;
    this.frames.push({ start: this.sent, pcm: int16 });
    this.sent += int16.length;
    this._prune();
  }

  _sampleAt(ms, fallback) {
    if (!Number.isFinite(ms) || ms < 0) return fallback;
    return Math.max(0, Math.min(Math.round((ms * this.rate) / 1000), this.sent));
  }

  /** Server speech_started: pin the onset (usually inside the pre-roll). */
  speechStarted({ item_id, audio_start_ms } = {}) {
    const itemId = item_id || `audio_${this.sent}`;
    this.active = { itemId, start: this._sampleAt(audio_start_ms, this.sent) };
    if (itemId !== this.itemId) {
      this.itemId = itemId;
      this.itemPcm = new Int16Array(0);
    }
    this._prune();
  }

  /** Server speech_stopped: cut the segment.  Same item_id (a reopen)
   * extends the prior recording.  Returns {itemId, blob, seconds} | null. */
  speechStopped({ item_id, audio_end_ms } = {}) {
    const active = this.active;
    if (!active) return null;
    this.active = null;
    const itemId = item_id || active.itemId;
    const floor = this.frames.length ? this.frames[0].start : this.sent;
    const start = Math.max(active.start, floor);
    let end = this._sampleAt(audio_end_ms, this.sent);
    if (end <= start) end = this.sent;
    const seg = this._slice(start, Math.min(end, this.sent));
    this._prune();
    if (!seg.length) return null;
    if (itemId !== this.itemId) {
      this.itemId = itemId;
      this.itemPcm = new Int16Array(0);
    }
    const joined = new Int16Array(this.itemPcm.length + seg.length);
    joined.set(this.itemPcm, 0);
    joined.set(seg, this.itemPcm.length);
    this.itemPcm = joined;
    return {
      itemId,
      blob: pcm16ToWavBlob(joined, this.rate),
      seconds: joined.length / this.rate,
    };
  }

  reset() {
    this.frames = [];
    this.sent = 0;
    this.active = null;
    this.itemId = "";
    this.itemPcm = new Int16Array(0);
  }

  _slice(start, end) {
    const parts = [];
    let total = 0;
    for (const f of this.frames) {
      const a = Math.max(start, f.start);
      const b = Math.min(end, f.start + f.pcm.length);
      if (b <= a) continue;
      const part = f.pcm.subarray(a - f.start, b - f.start);
      parts.push(part);
      total += part.length;
    }
    const out = new Int16Array(total);
    let off = 0;
    for (const p of parts) {
      out.set(p, off);
      off += p.length;
    }
    return out;
  }

  _prune() {
    const hardFloor = Math.max(0, this.sent - this.maxBuffer);
    const softFloor = this.active ? this.active.start : Math.max(0, this.sent - this.preRoll);
    const floor = Math.max(hardFloor, softFloor);
    while (this.frames.length && this.frames[0].start + this.frames[0].pcm.length <= floor) {
      this.frames.shift();
    }
  }
}
