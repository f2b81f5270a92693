/* Audio-reactive orb (reference demo/orb-visualizer.js, re-imagined small):
 * a canvas circle whose inner glow follows the mic level and whose outer
 * ring follows assistant playback, with spring smoothing so levels breathe
 * instead of flickering.  Pure main-thread: callers feed RMS levels from
 * the capture/playback paths. */

export class Orb {
  constructor(canvas) {
    this.canvas = canvas;
    this.ctx = canvas.getContext("2d");
    this.user = 0; // smoothed 0..1
    this.assistant = 0;
    this.userTarget = 0;
    this.assistantTarget = 0;
    this.phase = 0;
    this.running = true;
    this._tick = this._tick.bind(this);
    requestAnimationFrame(this._tick);
  }

  setUserLevel(v) {
    this.userTarget = Math.min(1, v * 4);
  }

  setAssistantLevel(v) {
    this.assistantTarget = Math.min(1, v * 4);
  }

  stop() {
    this.running = false;
  }

  _tick() {
    if (!this.running) return;
    // spring toward targets; decay targets so silence settles to rest
    this.user += (this.userTarget - this.user) * 0.25;
    this.assistant += (this.assistantTarget - this.assistant) * 0.25;
    this.userTarget *= 0.92;
    this.assistantTarget *= 0.92;
    this.phase += 0.02;

    const { width: w, height: h } = this.canvas;
    const ctx = this.ctx;
    ctx.clearRect(0, 0, w, h);
    const cx = w / 2;
    const cy = h / 2;
    const base = Math.min(w, h) * 0.22;
    const breathe = 1 + 0.04 * Math.sin(this.phase);

    // outer ring: assistant speech
    const ringR = base * (1.35 + 0.5 * this.assistant) * breathe;
    ctx.beginPath();
    ctx.arc(cx, cy, ringR, 0, Math.PI * 2);
    ctx.strokeStyle = `rgba(110, 160, 255, ${0.25 + 0.6 * this.assistant})`;
    ctx.lineWidth = 2 + 6 * this.assistant;
    ctx.stroke();

    // core: user speech
    const coreR = base * (1 + 0.45 * this.user) * breathe;
    const grad = ctx.createRadialGradient(cx, cy, coreR * 0.1, cx, cy, coreR);
    grad.addColorStop(0, `rgba(150, 230, 160, ${0.75 + 0.25 * this.user})`);
    grad.addColorStop(1, "rgba(40, 90, 60, 0.1)");
    ctx.beginPath();
    ctx.arc(cx, cy, coreR, 0, Math.PI * 2);
    ctx.fillStyle = grad;
    ctx.fill();

    requestAnimationFrame(this._tick);
  }
}

/* RMS of an Int16Array frame, normalised to 0..1. */
export function rmsLevel(int16) {
  if (!int16 || !int16.length) return 0;
  let acc = 0;
  for (let i = 0; i < int16.length; i++) {
    const v = int16[i] / 32768;
    acc += v * v;
  }
  return Math.sqrt(acc / int16.length);
}
