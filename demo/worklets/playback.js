/* Playback AudioWorklet: ring buffer fed from the main thread, silence
 * when dry, and a `clear` message for sample-accurate barge-in flush
 * (reference demo/worklets playback path — scheduled BufferSources can't
 * cut already-scheduled audio cleanly).
 *
 * Messages in:  {pcm: Int16Array, rate: number}  |  {clear: true}
 * Messages out: {played: n} every ~100 ms (for UI level meters).       */

class PlaybackProcessor extends AudioWorkletProcessor {
  constructor() {
    super();
    this.buf = new Float32Array(sampleRate * 30); // 30 s ring
    this.readIdx = 0;
    this.writeIdx = 0;
    this.played = 0;
    this.lastReport = 0;
    this.port.onmessage = (m) => {
      if (m.data.clear) {
        this.readIdx = this.writeIdx = 0;
        return;
      }
      const pcm = m.data.pcm;
      const srcRate = m.data.rate || 16000;
      const ratio = srcRate / sampleRate;
      let pos = 0;
      while (pos + 1 < pcm.length) {
        const i = Math.floor(pos);
        const frac = pos - i;
        const s = (pcm[i] * (1 - frac) + pcm[i + 1] * frac) / 32768;
        this.buf[this.writeIdx % this.buf.length] = s;
        this.writeIdx++;
        pos += ratio;
      }
    };
  }

  process(_inputs, outputs) {
    const out = outputs[0][0];
    if (!out) return true;
    for (let i = 0; i < out.length; i++) {
      if (this.readIdx < this.writeIdx) {
        out[i] = this.buf[this.readIdx % this.buf.length];
        this.readIdx++;
        this.played++;
      } else {
        out[i] = 0;
      }
    }
    if (this.played - this.lastReport > sampleRate / 10) {
      this.port.postMessage({ played: this.played, buffered: this.writeIdx - this.readIdx });
      this.lastReport = this.played;
    }
    return true;
  }
}

registerProcessor("s2s-playback", PlaybackProcessor);
