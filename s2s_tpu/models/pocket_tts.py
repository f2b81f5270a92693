"""Pocket-TTS-class delayed-streams TTS LM in pure JAX (reference
``TTS/pocket_tts_handler.py`` drives Kyutai's external ``pocket_tts``
package; architecture per the Moshi / delayed-streams model family,
Défossez et al. 2024, arXiv:2410.00037 §3.3-3.4, which Pocket TTS
instantiates at CPU-friendly scale).

Structure:

- **Backbone** — a causal transformer at the 12.5 Hz frame rate
  (rmsnorm + rope + gated-SiLU, via :mod:`s2s_tpu.models.decoder_lm`).
  Its input at each frame is the SUM of the text-stream embedding and one
  embedding per audio codebook, each audio stream delayed by its
  ``delays[k]`` frames (the acoustic-delay trick that lets one AR step
  emit all codebooks while keeping the semantic stream ahead).
- **Depformer** — a small transformer over the codebook slots *within* a
  frame: slot k's input is a per-slot projection of the backbone hidden
  plus the embedding of the previous slot's sampled code; each slot has
  its own output head.  This is the Moshi "RQ-Transformer over depth".
- **Voice conditioning** — a voice-embedding prefix (rows of backbone-dim
  vectors from a Kyutai ``tts-voices`` file) prefilled into the backbone
  cache before the text/audio frames, standing in for the reference's
  ``voice`` catalog names / cloning from audio
  (``pocket_tts_handler.py:28-52``).
- **Codec** — codes feed the faithful Mimi decoder
  (:mod:`s2s_tpu.models.mimi`) for 24 kHz waveforms.

Text scheduling: the reference package runs Kyutai's word-level aligner to
pace text tokens; here text tokens stream one per frame then hold
``text_pad_id`` (documented simplification — the converter-loaded weights
govern pacing via the EOS head either way).

TPU design mirrors ``qwen3_tts``: frame generation runs as ONE fused
``lax.scan`` program per chunk (backbone step + depformer inner scan per
frame), with the Mimi decode fused behind it; shapes are static, the KV
cache is a donated carry.  Numerics for the depformer/backbone are pinned
by ``tests/test_pocket_tts.py`` against the torch twin in
``scripts/_pocket_torch_twin.py``; the Mimi side has its own parity
fixture.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from s2s_tpu.models import decoder_lm, mimi
from s2s_tpu.models.common import Params, rms_norm
from s2s_tpu.models.decoder_lm import DecodeState, DecoderLMConfig

SAMPLE_RATE = mimi.SAMPLE_RATE
FRAME_RATE = 12.5


@dataclass(frozen=True)
class PocketTTSConfig:
    text_vocab: int = 4000        # sentencepiece text tokens
    text_pad_id: int = 3          # stream filler once text is exhausted
    n_q: int = 8
    codebook_size: int = 2048
    audio_eos_id: int = 2048      # extra slot-0 head row: end of speech
    delays: tuple = (0, 2, 2, 2, 2, 2, 2, 2)
    backbone: DecoderLMConfig = field(default_factory=lambda: DecoderLMConfig(
        vocab_size=1, d_model=1024, n_layers=16, n_heads=16, n_kv_heads=16,
        d_ff=2816, max_seq_len=2048, rope_theta=10000.0, rms_eps=1e-8,
        tie_embeddings=False, dtype=jnp.bfloat16,
    ))
    dep: DecoderLMConfig = field(default_factory=lambda: DecoderLMConfig(
        vocab_size=1, d_model=1024, n_layers=6, n_heads=16, n_kv_heads=16,
        d_ff=2816, max_seq_len=16, rope_theta=10000.0, rms_eps=1e-8,
        tie_embeddings=False, dtype=jnp.bfloat16,
    ))
    mimi: mimi.MimiConfig = field(default_factory=mimi.MimiConfig)
    dtype: Any = jnp.bfloat16

    @property
    def max_delay(self) -> int:
        return max(self.delays)

    @staticmethod
    def tiny() -> "PocketTTSConfig":
        small = dict(vocab_size=1, n_heads=4, n_kv_heads=4, tie_embeddings=False,
                     dtype=jnp.float32)
        return PocketTTSConfig(
            text_vocab=64, text_pad_id=3, n_q=4, codebook_size=64, audio_eos_id=64,
            delays=(0, 2, 2, 2),
            backbone=DecoderLMConfig(d_model=32, n_layers=2, d_ff=64, max_seq_len=128,
                                     rms_eps=1e-8, **small),
            dep=DecoderLMConfig(d_model=32, n_layers=2, d_ff=64, max_seq_len=8,
                                rms_eps=1e-8, **small),
            mimi=mimi.MimiConfig.tiny(),
            dtype=jnp.float32,
        )


def _norm01(key, shape, dtype, scale=0.02):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def init_params(key, cfg: PocketTTSConfig = PocketTTSConfig()) -> Params:
    ks = iter(jax.random.split(key, 16))
    d, dd, dt = cfg.backbone.d_model, cfg.dep.d_model, cfg.dtype
    backbone = decoder_lm.init_params(next(ks), cfg.backbone)
    backbone.pop("lm_head", None)
    backbone.pop("embed", None)
    dep = decoder_lm.init_params(next(ks), cfg.dep)
    dep.pop("lm_head", None)
    dep.pop("embed", None)
    return {
        "backbone": backbone,
        "text_embed": _norm01(next(ks), (cfg.text_vocab, d), dt),
        # +1 row per stream: the "empty" token before the delayed stream starts
        "audio_embeds": _norm01(next(ks), (cfg.n_q, cfg.codebook_size + 1, d), dt),
        "dep": dep,
        "dep_in": _norm01(next(ks), (cfg.n_q, d, dd), dt),
        "dep_bos": _norm01(next(ks), (dd,), dt),
        "dep_embeds": _norm01(next(ks), (cfg.n_q - 1, cfg.codebook_size, dd), dt),
        # slot 0 head carries the extra EOS row
        "dep_head0": _norm01(next(ks), (dd, cfg.codebook_size + 1), dt, scale=dd ** -0.5),
        "dep_heads": _norm01(next(ks), (cfg.n_q - 1, dd, cfg.codebook_size), dt, scale=dd ** -0.5),
        "mimi": mimi.init_decoder_params(next(ks), cfg.mimi),
    }


# ---------------------------------------------------------------------------
# generation
# ---------------------------------------------------------------------------


class PocketState(NamedTuple):
    lm_state: DecodeState
    ring: jax.Array       # (max_delay + 1, B, n_q) recent frames' codes
    frame: jax.Array      # () int32 — frames generated so far


def _empty_ring(cfg: PocketTTSConfig, batch: int) -> jax.Array:
    # the "+1 row" empty-stream token = codebook_size
    return jnp.full((cfg.max_delay + 1, batch, cfg.n_q), cfg.codebook_size, jnp.int32)


def _depformer_frame(params, cfg: PocketTTSConfig, hidden):
    """Expand one backbone hidden (B, D) into all n_q codes via the
    depth transformer.  Returns (codes (B, n_q), eos (B,))."""
    dep = cfg.dep
    b = hidden.shape[0]
    state = decoder_lm.init_decode_state(dep, b, max_t=cfg.n_q + 1)

    h_proj0 = hidden.astype(dep.dtype) @ params["dep_in"][0]
    x, state = decoder_lm._hidden_step(
        params["dep"], dep, (h_proj0 + params["dep_bos"][None, :])[:, None, :], state
    )
    h = rms_norm(x[:, 0], params["dep"]["final_norm"], dep.rms_eps)
    logits0 = h.astype(jnp.float32) @ params["dep_head0"].astype(jnp.float32)
    code0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    eos = code0 == cfg.audio_eos_id
    code0 = jnp.clip(code0, 0, cfg.codebook_size - 1)

    def body(carry, xs):
        prev_code, state = carry
        in_proj, emb_table, head = xs
        inp = hidden.astype(dep.dtype) @ in_proj + emb_table[prev_code]
        x, state = decoder_lm._hidden_step(params["dep"], dep, inp[:, None, :], state)
        h = rms_norm(x[:, 0], params["dep"]["final_norm"], dep.rms_eps)
        logits = h.astype(jnp.float32) @ head.astype(jnp.float32)
        code = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (code, state), code

    (_, _), rest = jax.lax.scan(
        body, (code0, state),
        (params["dep_in"][1:], params["dep_embeds"], params["dep_heads"]),
    )
    codes = jnp.concatenate([code0[None], rest], axis=0).T  # (B, n_q)
    return codes, eos


def _frame_input(params, cfg: PocketTTSConfig, text_tokens_bt, ring, frame):
    """Backbone input embedding for this frame: text stream + delayed audio
    streams.  text_tokens_bt: (B, T_text) padded schedule; ring holds the
    last max_delay+1 frames' codes (oldest first)."""
    t_text = text_tokens_bt.shape[1]
    idx = jnp.clip(frame, 0, t_text - 1)
    text_tok = jnp.where(frame < t_text, text_tokens_bt[:, idx],
                         jnp.full((text_tokens_bt.shape[0],), cfg.text_pad_id))
    emb = params["text_embed"][text_tok]
    ring_len = cfg.max_delay + 1
    for k, delay in enumerate(cfg.delays):
        # code generated at frame (frame - 1 - delay) = ring slot offset
        slot = (frame - 1 - delay) % ring_len
        tok = jnp.where(frame - 1 - delay >= 0, ring[slot, :, k],
                        jnp.full((ring.shape[1],), cfg.codebook_size))
        emb = emb + params["audio_embeds"][k][tok]
    return emb.astype(cfg.dtype)


def prefill_voice(params, cfg: PocketTTSConfig, voice_prefix, state: DecodeState) -> DecodeState:
    """Prefill the backbone cache with the voice-embedding prefix
    (B, T_v, D).  Returns the advanced DecodeState."""
    t_v = voice_prefix.shape[1]
    _, state = decoder_lm._hidden_prefill(
        params["backbone"], cfg.backbone, voice_prefix.astype(cfg.dtype), state,
        jnp.asarray(t_v, jnp.int32),
    )
    return state


def generate_frames(params, cfg: PocketTTSConfig, text_tokens_bt, state: PocketState,
                    n_frames: int):
    """Generate *n_frames* codec frames in ONE fused scan.
    Returns (codes (n, B, n_q), eos_flags (n, B), new state)."""

    def body(carry, _):
        st = carry
        emb = _frame_input(params, cfg, text_tokens_bt, st.ring, st.frame)
        x, lm_state = decoder_lm._hidden_step(
            params["backbone"], cfg.backbone, emb[:, None, :], st.lm_state
        )
        hidden = rms_norm(x[:, 0], params["backbone"]["final_norm"], cfg.backbone.rms_eps)
        codes, eos = _depformer_frame(params, cfg, hidden)
        ring = st.ring.at[st.frame % (cfg.max_delay + 1)].set(codes)
        return PocketState(lm_state, ring, st.frame + 1), (codes, eos)

    state, (codes, eos) = jax.lax.scan(body, state, None, length=n_frames)
    return codes, eos, state


def init_state(cfg: PocketTTSConfig, batch: int = 1, cache_len: int | None = None) -> PocketState:
    lm_state = decoder_lm.init_decode_state(
        cfg.backbone, batch, max_t=cache_len or cfg.backbone.max_seq_len
    )
    return PocketState(lm_state, _empty_ring(cfg, batch), jnp.asarray(0, jnp.int32))


def synthesize_utterance(params, cfg: PocketTTSConfig, text_tokens_bt, max_frames: int,
                         voice_prefix=None, cache_len: int | None = None):
    """Whole utterance in ONE program: optional voice prefill + frame scan +
    Mimi decode.  Returns (audio (B, T_samples), n_valid_frames ())."""
    state = init_state(cfg, text_tokens_bt.shape[0], cache_len)
    if voice_prefix is not None:
        state = state._replace(lm_state=prefill_voice(params, cfg, voice_prefix, state.lm_state))
    codes, eos, state = generate_frames(params, cfg, text_tokens_bt, state, max_frames)
    # codes: (n, B, n_q) -> (B, n, n_q); un-delay each stream so frame f of
    # the DECODED audio takes codebook k from generation step f + delays[k]
    codes_b = codes.transpose(1, 0, 2)
    aligned = []
    for k, delay in enumerate(cfg.delays):
        aligned.append(jnp.roll(codes_b[:, :, k], -delay, axis=1))
    aligned = jnp.stack(aligned, axis=-1)
    n_audio = max_frames - cfg.max_delay
    audio = mimi.decode(params["mimi"], cfg.mimi, aligned[:, :n_audio])
    any_eos = jnp.any(eos, axis=0)
    first_eos = jnp.argmax(eos[:, 0])
    n_valid = jnp.where(any_eos[0], jnp.maximum(first_eos.astype(jnp.int32) - cfg.max_delay, 0),
                        n_audio)
    return audio, n_valid


jit_synthesize = partial(jax.jit, static_argnums=(1, 3, 5))(synthesize_utterance)


def config_from_params(params: Params) -> PocketTTSConfig:
    """Infer the model configuration from a converted checkpoint's shapes
    (exact dims come from the checkpoint, not hardcoded defaults).  Heads
    keep the family ratio d_model/64; dtype follows the stored weights;
    delays/pad ids keep the family defaults (metadata, not weights)."""
    base = PocketTTSConfig()
    text_vocab, d = np.shape(params["text_embed"])
    n_q, cb_plus, _ = np.shape(params["audio_embeds"])
    dd = np.shape(params["dep_in"])[2]
    bb_layers = np.shape(params["backbone"]["layers"]["wq"])[0]
    bb_ff = np.shape(params["backbone"]["layers"]["w_gate"])[2]
    dep_layers = np.shape(params["dep"]["layers"]["wq"])[0]
    dep_ff = np.shape(params["dep"]["layers"]["w_gate"])[2]
    dtype = jnp.float32 if d <= 64 else jnp.bfloat16
    heads = max(1, d // 64)
    dep_heads = max(1, dd // 64)
    if d <= 64:  # tiny/test scale keeps the tiny head ratio
        heads, dep_heads = 4, 4
    delays = base.delays[:n_q] if n_q <= len(base.delays) \
        else base.delays + (base.delays[-1],) * (n_q - len(base.delays))
    mimi_cfg = mimi.MimiConfig.tiny() if d <= 64 else base.mimi
    if "mimi" in params:
        m = params["mimi"]
        cb_size, cb_dim = np.shape(m["sem_codebook"])
        mdim = np.shape(m["sem_out_proj"])[1]
        mimi_cfg = mimi.MimiConfig(
            n_q=n_q, codebook_size=cb_size, codebook_dim=cb_dim, dim=mdim,
            t_layers=len(m["tlayers"]),
            t_heads=mimi_cfg.t_heads, t_ff=np.shape(m["tlayers"][0]["w1"])[1],
            t_context=mimi_cfg.t_context,
            n_filters=np.shape(m["final_conv"]["w"])[1],
            ratios=tuple(np.shape(b["up"]["w"])[0] // 2 for b in m["blocks"]),
            kernel=np.shape(m["init_conv"]["w"])[0],
            last_kernel=np.shape(m["final_conv"]["w"])[0],
        )
    common = dict(vocab_size=1, tie_embeddings=False, rms_eps=1e-8, dtype=dtype)
    return PocketTTSConfig(
        text_vocab=text_vocab, n_q=n_q, codebook_size=cb_plus - 1,
        audio_eos_id=cb_plus - 1, delays=delays,
        backbone=DecoderLMConfig(d_model=d, n_layers=bb_layers, n_heads=heads,
                                 n_kv_heads=heads, d_ff=bb_ff, max_seq_len=2048, **common),
        dep=DecoderLMConfig(d_model=dd, n_layers=dep_layers, n_heads=dep_heads,
                            n_kv_heads=dep_heads, d_ff=dep_ff, max_seq_len=16, **common),
        mimi=mimi_cfg, dtype=dtype,
    )


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


jit_generate_frames = partial(jax.jit, static_argnums=(1, 4), donate_argnums=(3,))(generate_frames)
jit_prefill_voice = partial(jax.jit, static_argnums=(1,), donate_argnums=(3,))(prefill_voice)


class PocketTTS:
    """Host wrapper: text -> float32 audio @ 24 kHz, streaming in codec-frame
    chunks (the reference's ``TTSModel.generate_*`` surface,
    ``pocket_tts_handler.py:100-130``).

    Text tokenization: with a converted sentencepiece vocab sidecar the
    input is tokenized properly; without one a byte-level fallback keeps
    random-init serving/tests running (same policy as KokoroTTS).  Voices
    are named (T_v, d_model) embedding prefixes (Kyutai ``tts-voices``
    rows via the converter); voice cloning from raw audio needs the Mimi
    *encoder*, which is out of scope for the decode path — callers get a
    clear error instead of silent wrong audio.
    """

    CHUNK_FRAMES = 8  # 640 ms of audio per fused device program

    def __init__(self, params: Params | None = None, cfg: PocketTTSConfig | None = None,
                 seed: int = 0, vocab: dict[str, int] | None = None, tokenizer=None):
        if cfg is None:
            cfg = config_from_params(params) if params is not None else PocketTTSConfig()
        self.cfg = cfg
        self.params = params if params is not None else init_params(jax.random.PRNGKey(seed), cfg)
        self.params = jax.tree.map(jnp.asarray, self.params)
        self.vocab = vocab
        self.tokenizer = tokenizer  # SentencePiece-style object with .encode()
        self.voices: dict[str, np.ndarray] = {}
        # re-vocoded Mimi left context per chunk: the decoder's receptive
        # field, so streamed chunks match the one-shot decode exactly (the
        # Mimi decoder is small — re-decoding ~250 frames of 512-d latents
        # per 640 ms chunk costs a fraction of one talker frame)
        self.context_frames = mimi.decode_deficit(self.cfg.mimi)

    def add_voice(self, name: str, prefix: np.ndarray) -> None:
        self.voices[name] = np.asarray(prefix, np.float32).reshape(1, -1, self.cfg.backbone.d_model)

    def _encode(self, text: str) -> list[int]:
        if self.tokenizer is not None:
            return [i for i in self.tokenizer.encode(text) if i < self.cfg.text_vocab]
        if self.vocab is not None:
            return [self.vocab[c] for c in text if c in self.vocab]
        lo = self.cfg.text_pad_id + 1
        return [lo + (b % (self.cfg.text_vocab - lo)) for b in text.encode("utf-8")]

    def _frame_budget(self, text: str) -> int:
        # ~0.08 s per character + 0.6 s floor, x1.35 margin (the reference's
        # token-budget idea, qwen3_tts_handler.py:608-651, at frame scale)
        seconds = (0.6 + 0.08 * len(text)) * 1.35
        return int(np.ceil(seconds * FRAME_RATE)) + self.cfg.max_delay

    def _text_array(self, text: str) -> jnp.ndarray:
        ids = self._encode(text) or [self.cfg.text_pad_id]
        return jnp.asarray(ids, jnp.int32)[None]

    def stream(self, text: str, voice: str | None = None, max_frames: int | None = None):
        """Yield (float32 audio, 24000) per generated chunk until EOS or the
        frame budget runs out."""
        cfg = self.cfg
        budget = max_frames or self._frame_budget(text)
        text_arr = self._text_array(text)
        prefix = None
        prefix_len = 0
        if voice is not None and voice in self.voices:
            prefix = jnp.asarray(self.voices[voice])
            prefix_len = prefix.shape[1]
        # cache must hold voice prefix + every backbone frame, and rope
        # tables stop at max_seq_len — clamp the budget to what fits
        budget = max(1, min(budget, cfg.backbone.max_seq_len - prefix_len - 2))
        need = budget + prefix_len + 8
        cache_len = min(1 << max(6, int(np.ceil(np.log2(need)))), cfg.backbone.max_seq_len)
        state = init_state(cfg, 1, cache_len=cache_len)
        if prefix is not None:
            state = state._replace(lm_state=jit_prefill_voice(
                self.params, cfg, prefix, state.lm_state))
        history = np.zeros((1, 0, cfg.n_q), np.int64)
        emitted = 0  # audio frames already yielded
        done_at = None
        generated = 0
        while generated < budget and done_at is None:
            n = min(self.CHUNK_FRAMES, budget - generated)
            codes, eos, state = jit_generate_frames(self.params, cfg, text_arr, state, n)
            generated += n
            codes_np = np.asarray(codes)[:, 0, :]  # (n, n_q)
            history = np.concatenate([history, codes_np[None]], axis=1)
            eos_np = np.asarray(eos)[:, 0]
            if eos_np.any():
                done_at = generated - n + int(np.argmax(eos_np))
            # un-delay: audio frame f needs codebook k from step f + delays[k]
            ready = (done_at if done_at is not None else generated) - cfg.max_delay
            if done_at is not None:
                ready = max(ready, 0)
            if ready <= emitted:
                continue
            aligned = np.stack(
                [history[0, emitted + cfg.delays[k] : ready + cfg.delays[k], k]
                 for k in range(cfg.n_q)], axis=-1)
            lo = max(0, emitted - self.context_frames)
            ctx = np.stack(
                [history[0, lo + cfg.delays[k] : emitted + cfg.delays[k], k]
                 for k in range(cfg.n_q)], axis=-1)
            chunk_codes = jnp.asarray(np.concatenate([ctx, aligned], axis=0))[None]
            wav = np.asarray(mimi.jit_decode(self.params["mimi"], cfg.mimi, chunk_codes))[0]
            audio = wav[ctx.shape[0] * cfg.mimi.hop :]
            emitted = ready
            if len(audio):
                yield audio.astype(np.float32), SAMPLE_RATE

    def synthesize(self, text: str, voice: str | None = None,
                   max_frames: int | None = None) -> np.ndarray:
        parts = [a for a, _ in self.stream(text, voice=voice, max_frames=max_frames)]
        return np.concatenate(parts) if parts else np.zeros(0, np.float32)


# ---------------------------------------------------------------------------
# converter: moshi-style LM layout -> our tree
# ---------------------------------------------------------------------------


def convert_state_dict(sd: dict, cfg: PocketTTSConfig = PocketTTSConfig()) -> Params:
    """moshi-style delayed-streams LM layout -> our tree.  Expected keys
    (mirrored by ``scripts/_pocket_torch_twin.py``):

    - ``text_emb.weight``; ``emb.{k}.weight`` (audio streams, each with the
      trailing "empty" row)
    - ``transformer.layers.{i}.{self_attn.{q,k,v,o}_proj|norm1|norm2|
      gating.linear_in/linear_out}.weight`` — backbone (rmsnorm weights
      under ``norm{1,2}.alpha`` or ``.weight``); ``out_norm.alpha|weight``
    - ``depformer_in.{k}.weight``; ``depformer_emb.{k}.weight``;
      ``depformer.layers.{i}...`` (same block layout); ``depformer_norm``;
      ``linears.{k}.weight`` (per-slot heads; slot 0 carries the EOS row)
    - the Mimi decoder converts separately (``--family mimi``).
    """

    def t(name):
        return np.asarray(sd[name], np.float32)

    def norm_w(prefix):
        for suffix in (".alpha", ".weight"):
            if prefix + suffix in sd:
                w = np.asarray(sd[prefix + suffix], np.float32)
                return w.reshape(-1)  # moshi stores alpha as (1, 1, d)
        raise KeyError(prefix)

    def lm_tree(prefix, lm_cfg: DecoderLMConfig, final_norm_key):
        layers = []
        for i in range(lm_cfg.n_layers):
            lp = f"{prefix}.layers.{i}"
            if f"{lp}.self_attn.in_proj_weight" in sd:
                wq, wk, wv = np.split(t(f"{lp}.self_attn.in_proj_weight"), 3, axis=0)
            else:
                wq = t(f"{lp}.self_attn.q_proj.weight")
                wk = t(f"{lp}.self_attn.k_proj.weight")
                wv = t(f"{lp}.self_attn.v_proj.weight")
            wo_key = (f"{lp}.self_attn.out_proj.weight"
                      if f"{lp}.self_attn.out_proj.weight" in sd
                      else f"{lp}.self_attn.o_proj.weight")
            gate_key = (f"{lp}.gating.linear_in.weight"
                        if f"{lp}.gating.linear_in.weight" in sd else None)
            if gate_key:
                # moshi gating: linear_in packs [gate; up] rows
                w_in = t(gate_key)
                w_gate, w_up = np.split(w_in, 2, axis=0)
                w_down = t(f"{lp}.gating.linear_out.weight")
            else:
                w_gate = t(f"{lp}.mlp.gate_proj.weight")
                w_up = t(f"{lp}.mlp.up_proj.weight")
                w_down = t(f"{lp}.mlp.down_proj.weight")
            layers.append({
                "attn_norm": norm_w(f"{lp}.norm1"),
                "wq": wq.T, "wk": wk.T, "wv": wv.T, "wo": t(wo_key).T,
                "mlp_norm": norm_w(f"{lp}.norm2"),
                "w_gate": w_gate.T, "w_up": w_up.T, "w_down": w_down.T,
            })
        stacked = {k: np.stack([l[k] for l in layers]) for k in layers[0]}
        return {"layers": stacked, "final_norm": norm_w(final_norm_key)}

    n_q = cfg.n_q
    p: Params = {
        "backbone": lm_tree("transformer", cfg.backbone, "out_norm"),
        "text_embed": t("text_emb.weight"),
        "audio_embeds": np.stack([t(f"emb.{k}.weight") for k in range(n_q)]),
        "dep": lm_tree("depformer", cfg.dep, "depformer_norm"),
        "dep_in": np.stack([t(f"depformer_in.{k}.weight").T for k in range(n_q)]),
        "dep_bos": t("depformer_bos") if "depformer_bos" in sd
        else np.zeros(cfg.dep.d_model, np.float32),
        "dep_embeds": np.stack([t(f"depformer_emb.{k}.weight") for k in range(n_q - 1)]),
        "dep_head0": t("linears.0.weight").T,
        "dep_heads": np.stack([t(f"linears.{k}.weight").T for k in range(1, n_q)]),
    }
    return p
