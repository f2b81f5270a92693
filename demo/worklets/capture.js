/* Mic capture AudioWorklet (reference demo/worklets — worklet-thread
 * capture instead of deprecated ScriptProcessorNode).
 *
 * Runs at the AudioContext rate (usually 48 kHz), downsamples to 16 kHz
 * with linear interpolation inside the worklet thread, and posts
 * fixed-size Int16Array frames (512 samples = one pipeline chunk) to the
 * main thread.  Transferables keep the hot path copy-free. */

const TARGET_RATE = 16000;
const FRAME = 512;

class CaptureProcessor extends AudioWorkletProcessor {
  constructor() {
    super();
    this.ratio = sampleRate / TARGET_RATE;
    this.readPos = 0; // fractional position into the stream
    this.carry = new Float32Array(0); // source samples not yet consumed
    this.out = new Int16Array(FRAME);
    this.outLen = 0;
  }

  process(inputs) {
    const ch = inputs[0] && inputs[0][0];
    if (!ch) return true;
    const src = new Float32Array(this.carry.length + ch.length);
    src.set(this.carry, 0);
    src.set(ch, this.carry.length);

    let pos = this.readPos;
    while (pos + 1 < src.length) {
      const i = Math.floor(pos);
      const frac = pos - i;
      const sample = src[i] * (1 - frac) + src[i + 1] * frac;
      this.out[this.outLen++] = Math.max(-32768, Math.min(32767, sample * 32768));
      if (this.outLen === FRAME) {
        this.port.postMessage(this.out, [this.out.buffer]);
        this.out = new Int16Array(FRAME);
        this.outLen = 0;
      }
      pos += this.ratio;
    }
    const consumed = Math.floor(pos);
    this.carry = src.slice(consumed);
    this.readPos = pos - consumed;
    return true;
  }
}

registerProcessor("s2s-capture", CaptureProcessor);
