"""Cross-session batched decoding with per-slot positions.

The serving-throughput lever: N concurrent sessions decode through ONE
device program even though each sits at a different position in its own
conversation.  Extends the decoder LM's single-position decode with:

- ``pos`` as a (B,) vector — each batch row writes its KV at its own
  offset (vmapped ``dynamic_update_slice``) and masks keys to its own
  length;
- per-row rope tables gathered at each row's position;
- an ``active`` mask so idle slots (no pending token) don't advance.

Used standalone by a session scheduler (round-2 wiring); equivalence with
independent single-session decodes is pinned by
``tests/test_batched_decode.py``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from s2s_tpu.models.common import KVCache, attention, linear, rms_norm, rope_frequencies, swiglu
from s2s_tpu.models.decoder_lm import DecoderLMConfig, _logits
from s2s_tpu.models.common import apply_rope


class MultiDecodeState(NamedTuple):
    """Batched decode carry: stacked caches (L, B, kv, T, hd) + per-slot pos (B,)."""

    caches: KVCache
    pos: jax.Array  # (B,) int32


def init_multi_state(cfg: DecoderLMConfig, batch: int, max_t: int | None = None) -> MultiDecodeState:
    max_t = max_t or cfg.max_seq_len
    shape = (cfg.n_layers, batch, cfg.n_kv_heads, max_t, cfg.head_dim)
    return MultiDecodeState(
        KVCache(jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype)),
        jnp.zeros((batch,), jnp.int32),
    )


def _row_update(cache_bhtd, new_bh1d, pos_b):
    """Per-row cache write at each row's own position.
    cache: (B, H, T, D); new: (B, H, 1, D); pos: (B,)."""

    def one(cache_htd, new_h1d, p):
        return jax.lax.dynamic_update_slice(cache_htd, new_h1d, (0, p, 0))

    return jax.vmap(one)(cache_bhtd, new_bh1d, pos_b)


import os as _os

#: opt-in experiment flag: route batched decode attention through the
#: in-place pallas kernel (s2s_tpu.ops.decode_attention)
_USE_DECODE_ATTENTION_KERNEL = _os.environ.get("S2S_DECODE_ATTENTION_KERNEL", "0") == "1"


def _block_multi(x, lp, cfg: DecoderLMConfig, cache_k, cache_v, pos, cos_b, sin_b, mask):
    """One block for a (B, 1, D) step with per-row positions."""
    b = x.shape[0]
    h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
    q = linear(h, lp["wq"]).reshape(b, 1, cfg.n_heads, cfg.head_dim)
    k = linear(h, lp["wk"]).reshape(b, 1, cfg.n_kv_heads, cfg.head_dim)
    if cfg.qk_norm:
        q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = linear(h, lp["wv"]).reshape(b, 1, cfg.n_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    # per-row rope: cos_b/sin_b are (B, 1, hd/2)
    q = jax.vmap(lambda qq, c, s: apply_rope(qq[None], c, s)[0])(q, cos_b, sin_b)
    k = jax.vmap(lambda kk, c, s: apply_rope(kk[None], c, s)[0])(k, cos_b, sin_b)
    if _USE_DECODE_ATTENTION_KERNEL:
        from s2s_tpu.ops.decode_attention import decode_attention

        attn_h, cache_k, cache_v = decode_attention(q[:, :, 0, :], k, v, cache_k, cache_v, pos)
        attn = attn_h[:, :, None, :]
        x = x + linear(attn.transpose(0, 2, 1, 3).reshape(b, 1, -1), lp["wo"])
        h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
        x = x + swiglu(h, lp["w_gate"], lp["w_up"], lp["w_down"])
        return x, cache_k, cache_v
    cache_k = _row_update(cache_k, k, pos)
    cache_v = _row_update(cache_v, v, pos)
    attn = attention(q, cache_k, cache_v, mask)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, cfg.n_heads * cfg.head_dim)
    x = x + linear(attn, lp["wo"])
    h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
    x = x + swiglu(h, lp["w_gate"], lp["w_up"], lp["w_down"])
    return x, cache_k, cache_v


def hidden_step_multi(params, cfg: DecoderLMConfig, embeds, state: MultiDecodeState, active=None):
    """One batched step over precomputed EMBEDDINGS with per-row positions.
    embeds: (B, D); active: (B,) bool (idle rows keep their state).
    Returns (pre-final-norm hidden (B, D), new state) — callers apply their
    own norm/head (the TTS talker path; token logits wrap this below)."""
    b = embeds.shape[0]
    if active is None:
        active = jnp.ones((b,), bool)
    x = embeds[:, None, :].astype(cfg.dtype)
    cos_full, sin_full = rope_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_theta)
    cos_b = cos_full[state.pos][:, None, :]  # (B, 1, hd/2)
    sin_b = sin_full[state.pos][:, None, :]
    max_t = state.caches.k.shape[3]
    # per-row key mask: keys <= own position
    mask = (jnp.arange(max_t)[None, :] <= state.pos[:, None])[:, None, None, :]

    def body(carry, xs):
        h = carry
        lp, ck, cv = xs
        h, ck, cv = _block_multi(h, lp, cfg, ck, cv, state.pos, cos_b, sin_b, mask)
        return h, (ck, cv)

    x, (new_k, new_v) = jax.lax.scan(body, x, (params["layers"], state.caches.k, state.caches.v))
    # Idle rows (active=False) still wrote this step's k/v at their frozen
    # ``pos`` — that entry is garbage but invisible: nothing reads a row
    # while it is idle, and the row's next REAL step writes its true k/v at
    # the same ``pos`` before attending.  Masking the caches with a full
    # ``jnp.where`` copy instead costs ~3x the whole cache in HBM traffic
    # per step at 1.7B scale, so we deliberately skip it.
    new_pos = jnp.where(active, state.pos + 1, state.pos)
    return x[:, 0], MultiDecodeState(KVCache(new_k, new_v), new_pos)


def decode_step_multi(params, cfg: DecoderLMConfig, tokens, state: MultiDecodeState, active=None):
    """One batched step. tokens: (B,) int32; active: (B,) bool (idle rows keep
    their state and produce garbage logits the scheduler ignores).
    Returns (logits (B, V) float32, new state)."""
    embeds = params["embed"][tokens].astype(cfg.dtype)
    hidden, state = hidden_step_multi(params, cfg, embeds, state, active)
    logits = _logits(hidden[:, None, :], params, cfg)[:, 0]
    return logits, state


jit_decode_step_multi = partial(jax.jit, static_argnums=(1,), donate_argnums=(3,))(decode_step_multi)


def prefill_slot(params, cfg: DecoderLMConfig, tokens, prompt_len, state: MultiDecodeState, slot):
    """Prefill ONE session slot of the batched state.

    tokens: (1, T_bucket) right-padded prompt; slot: scalar row index.
    Runs a single-row prefill and splices its caches into row ``slot``;
    other rows are untouched.  Returns (first token (,) int32, new state).
    """
    from s2s_tpu.models import decoder_lm

    max_t = state.caches.k.shape[3]
    row = decoder_lm.init_decode_state(cfg, 1, max_t=max_t)
    logits, row = decoder_lm.prefill(params, cfg, tokens, row, prompt_len)
    new_k = jax.lax.dynamic_update_slice(state.caches.k, row.caches.k, (0, slot, 0, 0, 0))
    new_v = jax.lax.dynamic_update_slice(state.caches.v, row.caches.v, (0, slot, 0, 0, 0))
    pos = state.pos.at[slot].set(jnp.asarray(prompt_len, jnp.int32))
    token = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
    return token, MultiDecodeState(KVCache(new_k, new_v), pos)


def prefill_slot_embeds(params, cfg: DecoderLMConfig, embeds, prompt_len, state: MultiDecodeState, slot):
    """Prefill ONE slot from precomputed prompt EMBEDDINGS (1, T, D) — the
    TTS talker prompt is [speaker vec, text embeds].  Returns new state."""
    from s2s_tpu.models import decoder_lm

    max_t = state.caches.k.shape[3]
    row = decoder_lm.init_decode_state(cfg, 1, max_t=max_t)
    _, row = decoder_lm._hidden_prefill(params, cfg, embeds, row, prompt_len)
    new_k = jax.lax.dynamic_update_slice(state.caches.k, row.caches.k, (0, slot, 0, 0, 0))
    new_v = jax.lax.dynamic_update_slice(state.caches.v, row.caches.v, (0, slot, 0, 0, 0))
    pos = state.pos.at[slot].set(jnp.asarray(prompt_len, jnp.int32))
    return MultiDecodeState(KVCache(new_k, new_v), pos)


def decode_chunk_multi(
    params, cfg: DecoderLMConfig, tokens, state: MultiDecodeState, n_tokens: int,
    eos_id: int, active,
):
    """Greedily decode *n_tokens* for ALL active slots in ONE device program.

    tokens: (B,) next input token per slot; active: (B,) bool.  Emits each
    step's input token (like the single-session ``decode_chunk``); a row
    deactivates once it produces ``eos_id`` (the eos itself is emitted so
    the host sees the boundary).  Idle/finished rows repeat their token
    under an inactive mask the host ignores.

    Returns (toks (n, B), emitted_mask (n, B), next tokens (B,), state,
    active_out (B,)).
    """

    def body(carry, _):
        tok, st, act = carry
        logits, st = decode_step_multi(params, cfg, tok, st, act)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(act, nxt, tok)
        act_next = act & (tok != eos_id)
        return (nxt, st, act_next), (tok, act)

    (tok, state, active), (toks, emitted) = jax.lax.scan(
        body, (tokens, state, active), None, length=n_tokens
    )
    return toks, emitted, tok, state, active


def prefill_and_chunk_slot(
    params, cfg: DecoderLMConfig, tokens, prompt_len, state: MultiDecodeState,
    slot, n_tokens: int, eos_id: int,
):
    """FUSED prefill + first priority chunk for one slot: a new turn's
    prompt ingest and its first-sentence tokens cost ONE dispatch + ONE
    host sync instead of two (each dispatch pays a fixed host round-trip
    and queues behind any in-flight steady chunk — for the latency-
    critical first sentence both are worth eliminating).

    Returns (toks (n,), emitted (n,), next token scalar, new state).
    """
    token, state = prefill_slot(params, cfg, tokens, prompt_len, state, slot)
    return decode_chunk_slot(params, cfg, token, state, n_tokens, eos_id, slot)


def decode_chunk_gathered(
    params, cfg: DecoderLMConfig, tokens, state: MultiDecodeState, n_tokens: int,
    eos_id: int, slot_ids,
):
    """Steady-lane chunk over a COMPACT gathered batch of ``W = len(slot_ids)``
    slots: per-step cost scales with the bucketed active count, not
    ``n_slots`` (a dense masked step still reads every slot's KV rows, so
    at 16 slots with 3 active it wastes ~80% of the step's HBM traffic —
    and, worse for latency, every probe dispatch queues behind that
    full-width step).

    slot_ids: (W,) int32, padded by REPEATING a valid id — duplicate rows
    start from identical gathered state, run the same greedy compute, and
    scatter identical values, so duplicates are benign.
    tokens: (W,) gathered next-input tokens.
    Returns (toks (n, W), emitted (n, W), next tokens (W,), new state).
    """
    row = MultiDecodeState(
        KVCache(state.caches.k[:, slot_ids], state.caches.v[:, slot_ids]),
        state.pos[slot_ids],
    )
    toks, emitted, tok, row, _ = decode_chunk_multi(
        params, cfg, tokens, row, n_tokens, eos_id,
        jnp.ones(slot_ids.shape, bool),
    )
    new_k = state.caches.k.at[:, slot_ids].set(row.caches.k)
    new_v = state.caches.v.at[:, slot_ids].set(row.caches.v)
    new_pos = state.pos.at[slot_ids].set(row.pos)
    return toks, emitted, tok, MultiDecodeState(KVCache(new_k, new_v), new_pos)


def decode_chunk_slot(
    params, cfg: DecoderLMConfig, token, state: MultiDecodeState, n_tokens: int,
    eos_id: int, slot,
):
    """Priority-lane decode: *n_tokens* greedy steps for ONE slot at
    batch-1 cost, leaving the other slots untouched.

    The latency lever behind the serving scheduler's preemption: a full
    16-slot step pays 16 KV-cache reads, so a new turn's first-sentence
    tokens decoding through the batch run ~5x slower per token than a
    single session.  Here the slot's cache row is sliced out of the
    batched state, the single-row chunk runs (weights still read once per
    step — that cost is shared either way), and the updated row is spliced
    back.  The slice/splice moves one slot's KV (~a few MB at 1.7B scale)
    — noise next to a decode step.

    token: scalar int32 next input; slot: scalar row index.
    Returns (toks (n,), emitted (n,), next token scalar, new state).
    """
    row = MultiDecodeState(
        KVCache(
            jax.lax.dynamic_slice_in_dim(state.caches.k, slot, 1, axis=1),
            jax.lax.dynamic_slice_in_dim(state.caches.v, slot, 1, axis=1),
        ),
        jax.lax.dynamic_slice_in_dim(state.pos, slot, 1, axis=0),
    )
    toks, emitted, tok, row, _ = decode_chunk_multi(
        params, cfg, token[None], row, n_tokens, eos_id, jnp.ones((1,), bool)
    )
    new_k = jax.lax.dynamic_update_slice(
        state.caches.k, row.caches.k, (0, slot, 0, 0, 0))
    new_v = jax.lax.dynamic_update_slice(
        state.caches.v, row.caches.v, (0, slot, 0, 0, 0))
    pos = jax.lax.dynamic_update_slice(state.pos, row.pos, (slot,))
    return toks[:, 0], emitted[:, 0], tok[0], MultiDecodeState(KVCache(new_k, new_v), pos)


# ── tail-buffer chunk decode (the TPU serving path) ──────────────────
#
# The legacy chunk above rewrites the KV caches every step: the layer scan
# takes the stacked (L, B, KV, T, hd) caches as xs and emits updated copies
# as ys, and the per-row write is a vmapped dynamic_update_slice (a scatter,
# since rows sit at different positions).  On-chip attribution (round 4)
# measured a 16-slot SmolLM2-1.7B int8 step at ~23 ms against a ~3 ms
# HBM-roofline floor (int8 weights + one KV read) — the cache round-trips,
# not the math, dominate.  The tail design removes every per-step cache
# write:
#
# - the big caches are FROZEN chunk inputs (closure constants of the step
#   scan — read once per step by attention, never copied);
# - each step's fresh K/V goes into a small (L, B, KV, n_chunk, hd) TAIL
#   buffer at the static step index (one cheap DUS, no scatter);
# - attention concatenates [frozen cache | tail] scores in one softmax,
#   masking cache keys to < chunk-start pos and tail keys to the row's
#   active prefix;
# - at chunk end the tail is blended into the caches ONCE (per-row masked
#   write of an n_chunk-length block).
#
# Per-step HBM traffic drops to weights + ONE cache read.  Emitted-token
# semantics match the legacy chunk exactly (tests/test_batched_decode.py
# pins token-for-token equality, including mid-chunk EOS); post-EOS cache
# garbage differs but is invisible (a frozen row's next real turn rewrites
# its rows before attending, same argument as the legacy path's).


def _tail_blend(cache, tail, pos0, n_act):
    """Blend each row's tail prefix into its cache at the row's chunk-start
    position.  cache: (B, KV, T, hd); tail: (B, KV, n, hd); pos0/n_act: (B,).
    Only tail slots j < n_act[b] are real (the row's active prefix)."""
    n = tail.shape[2]

    def one(cache_row, tail_row, p, na):
        block = jax.lax.dynamic_slice(
            cache_row, (0, p, 0), (cache_row.shape[0], n, cache_row.shape[2])
        )
        keep = (jnp.arange(n) < na)[None, :, None]
        return jax.lax.dynamic_update_slice(
            cache_row, jnp.where(keep, tail_row, block), (0, p, 0)
        )

    return jax.vmap(one)(cache, tail, pos0, n_act)


def init_tail(cfg: DecoderLMConfig, batch: int, n: int):
    """Fresh per-chunk tail buffers (L, B, KV, n, hd) x2."""
    shape = (cfg.n_layers, batch, cfg.n_kv_heads, n, cfg.head_dim)
    return jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype)


def tail_hidden_step(params, cfg: DecoderLMConfig, embeds, kc, vc, pos0,
                     tail_k, tail_v, n_act, act, i):
    """One step over precomputed embeddings against FROZEN caches + a tail.

    embeds: (B, D); kc/vc: (L, B, KV, T, hd) frozen chunk inputs; pos0: (B,)
    chunk-start positions; tail_k/v: (L, B, KV, n, hd) this chunk's fresh
    K/V; n_act: (B,) active steps so far; act: (B,) bool; i: step index
    (traced scalar).  Returns (pre-final-norm hidden (B, D), tail_k, tail_v).
    The shared tail step for the LM chunk and the TTS talker chunk."""
    b = embeds.shape[0]
    n = tail_k.shape[3]
    max_t = kc.shape[3]
    cos_full, sin_full = rope_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_theta)
    # cache keys valid strictly BELOW the chunk-start position (this chunk's
    # keys live in the tail); (B, 1, 1, T)
    cache_mask = (jnp.arange(max_t)[None, :] < pos0[:, None])[:, None, None, :]
    pos = pos0 + n_act  # per-row query position (frozen after EOS)
    cos_b = cos_full[pos][:, None, :]
    sin_b = sin_full[pos][:, None, :]
    # tail keys valid over each row's active prefix INCLUDING this step's
    # write at slot i for rows still active; (B, 1, 1, n)
    tail_mask = (jnp.arange(n)[None, :]
                 < (n_act + act.astype(jnp.int32))[:, None])[:, None, None, :]
    x = embeds[:, None, :].astype(cfg.dtype)

    def body(h, xs):
        lp, ck, cv, tkl, tvl = xs
        hn = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
        q = linear(hn, lp["wq"]).reshape(b, 1, cfg.n_heads, cfg.head_dim)
        k = linear(hn, lp["wk"]).reshape(b, 1, cfg.n_kv_heads, cfg.head_dim)
        if cfg.qk_norm:
            q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
            k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = linear(hn, lp["wv"]).reshape(b, 1, cfg.n_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        q = jax.vmap(lambda qq, c, s: apply_rope(qq[None], c, s)[0])(q, cos_b, sin_b)
        k = jax.vmap(lambda kk, c, s: apply_rope(kk[None], c, s)[0])(k, cos_b, sin_b)
        # static step index: ONE slice update, no per-row scatter
        tkl = jax.lax.dynamic_update_slice_in_dim(tkl, k, i, axis=2)
        tvl = jax.lax.dynamic_update_slice_in_dim(tvl, v, i, axis=2)
        attn = _concat_attention(q, ck, cv, tkl, tvl, cache_mask, tail_mask, cfg)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, cfg.n_heads * cfg.head_dim)
        h = h + linear(attn, lp["wo"])
        hn = rms_norm(h, lp["mlp_norm"], cfg.rms_eps)
        h = h + swiglu(hn, lp["w_gate"], lp["w_up"], lp["w_down"])
        return h, (tkl, tvl)

    x, (tail_k, tail_v) = jax.lax.scan(body, x, (params["layers"], kc, vc, tail_k, tail_v))
    return x[:, 0], tail_k, tail_v


def decode_chunk_tail(
    params, cfg: DecoderLMConfig, tokens, state: MultiDecodeState, n_tokens: int,
    eos_id: int, active,
):
    """Tail-buffer greedy chunk decode; same contract and emitted-token
    semantics as :func:`decode_chunk_multi`, ~an-order-of-magnitude less
    KV-cache HBM traffic per step (see module comment above)."""
    b = tokens.shape[0]
    n = n_tokens
    kc, vc = state.caches.k, state.caches.v  # frozen chunk inputs
    pos0 = state.pos
    tail_k0, tail_v0 = init_tail(cfg, b, n)

    def step(carry, i):
        tok, tk, tv, n_act, act = carry
        x = params["embed"][tok].astype(cfg.dtype)
        hidden, tk, tv = tail_hidden_step(
            params, cfg, x, kc, vc, pos0, tk, tv, n_act, act, i
        )
        logits = _logits(hidden[:, None, :], params, cfg)[:, 0]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(act, nxt, tok)
        n_act_next = n_act + act.astype(jnp.int32)
        act_next = act & (tok != eos_id)
        return (nxt, tk, tv, n_act_next, act_next), (tok, act)

    n_act0 = jnp.zeros((b,), jnp.int32)
    (tok, tail_k, tail_v, n_act, active), (toks, emitted) = jax.lax.scan(
        step, (tokens, tail_k0, tail_v0, n_act0, active), jnp.arange(n)
    )
    state = blend_tail_into_state(state, tail_k, tail_v, n_act)
    return toks, emitted, tok, state, active


def blend_tail_into_state(state: MultiDecodeState, tail_k, tail_v, n_act) -> MultiDecodeState:
    """One blended cache write per chunk: each row's tail prefix lands at its
    chunk-start position; positions advance by the active-step count."""
    pos0 = state.pos
    new_k = jax.vmap(_tail_blend, in_axes=(0, 0, None, None))(state.caches.k, tail_k, pos0, n_act)
    new_v = jax.vmap(_tail_blend, in_axes=(0, 0, None, None))(state.caches.v, tail_v, pos0, n_act)
    return MultiDecodeState(KVCache(new_k, new_v), pos0 + n_act)


def _concat_attention(q, ck, cv, tk, tv, cache_mask, tail_mask, cfg: DecoderLMConfig):
    """SDPA over [frozen cache | tail] with one softmax.  q: (B, H, 1, hd);
    ck/cv: (B, KV, T, hd); tk/tv: (B, KV, n, hd); masks broadcast over the
    key axis.  GQA runs as a grouped einsum (query heads reshaped onto
    their shared KV head) — the caches are never repeat-materialised.
    f32 scores/softmax — identical math to ``models.common.attention``
    over the concatenated key set.  Returns (B, H, 1, hd)."""
    b, h, _, hd = q.shape
    hkv = ck.shape[1]
    g = h // hkv
    qg = q[:, :, 0, :].reshape(b, hkv, g, hd)
    scale = cfg.head_dim ** -0.5
    s_c = jnp.einsum("bkgd,bktd->bkgt", qg, ck, preferred_element_type=jnp.float32) * scale
    s_t = jnp.einsum("bkgd,bktd->bkgt", qg, tk, preferred_element_type=jnp.float32) * scale
    # masks are (B, 1, 1, T/n): broadcast straight onto (B, KV, G, T/n)
    s_c = jnp.where(cache_mask, s_c, jnp.float32(-1e30))
    s_t = jnp.where(tail_mask, s_t, jnp.float32(-1e30))
    s = jnp.concatenate([s_c, s_t], axis=-1)
    p = jax.nn.softmax(s, axis=-1)
    t_cache = ck.shape[2]
    p_c = p[..., :t_cache].astype(cv.dtype)
    p_t = p[..., t_cache:].astype(tv.dtype)
    out = (
        jnp.einsum("bkgt,bktd->bkgd", p_c, cv, preferred_element_type=jnp.float32)
        + jnp.einsum("bkgt,bktd->bkgd", p_t, tv, preferred_element_type=jnp.float32)
    )
    return out.reshape(b, h, hd)[:, :, None, :].astype(q.dtype)


def decode_chunk_gathered_tail(
    params, cfg: DecoderLMConfig, tokens, state: MultiDecodeState, n_tokens: int,
    eos_id: int, slot_ids,
):
    """:func:`decode_chunk_gathered` with the tail-buffer chunk inside —
    the serving steady lane.  Same contract; duplicate padded ids stay
    benign (identical gathered state -> identical compute -> identical
    scattered values)."""
    row = MultiDecodeState(
        KVCache(state.caches.k[:, slot_ids], state.caches.v[:, slot_ids]),
        state.pos[slot_ids],
    )
    toks, emitted, tok, row, _ = decode_chunk_tail(
        params, cfg, tokens, row, n_tokens, eos_id,
        jnp.ones(slot_ids.shape, bool),
    )
    new_k = state.caches.k.at[:, slot_ids].set(row.caches.k)
    new_v = state.caches.v.at[:, slot_ids].set(row.caches.v)
    new_pos = state.pos.at[slot_ids].set(row.pos)
    return toks, emitted, tok, MultiDecodeState(KVCache(new_k, new_v), new_pos)


def decode_chunk_slot_tail(
    params, cfg: DecoderLMConfig, token, state: MultiDecodeState, n_tokens: int,
    eos_id: int, slot,
):
    """:func:`decode_chunk_slot` with the tail-buffer chunk inside — the
    serving priority lane.  Same contract."""
    row = MultiDecodeState(
        KVCache(
            jax.lax.dynamic_slice_in_dim(state.caches.k, slot, 1, axis=1),
            jax.lax.dynamic_slice_in_dim(state.caches.v, slot, 1, axis=1),
        ),
        jax.lax.dynamic_slice_in_dim(state.pos, slot, 1, axis=0),
    )
    toks, emitted, tok, row, _ = decode_chunk_tail(
        params, cfg, token[None], row, n_tokens, eos_id, jnp.ones((1,), bool)
    )
    new_k = jax.lax.dynamic_update_slice(
        state.caches.k, row.caches.k, (0, slot, 0, 0, 0))
    new_v = jax.lax.dynamic_update_slice(
        state.caches.v, row.caches.v, (0, slot, 0, 0, 0))
    pos = jax.lax.dynamic_update_slice(state.pos, row.pos, (slot,))
    return toks[:, 0], emitted[:, 0], tok[0], MultiDecodeState(KVCache(new_k, new_v), pos)


def prefill_and_chunk_slot_tail(
    params, cfg: DecoderLMConfig, tokens, prompt_len, state: MultiDecodeState,
    slot, n_tokens: int, eos_id: int,
):
    """:func:`prefill_and_chunk_slot` with the tail-buffer chunk inside."""
    token, state = prefill_slot(params, cfg, tokens, prompt_len, state, slot)
    return decode_chunk_slot_tail(params, cfg, token, state, n_tokens, eos_id, slot)


jit_decode_chunk_tail = partial(jax.jit, static_argnums=(1, 4, 5), donate_argnums=(3,))(
    decode_chunk_tail
)
jit_decode_chunk_gathered_tail = partial(jax.jit, static_argnums=(1, 4, 5), donate_argnums=(3,))(
    decode_chunk_gathered_tail
)
jit_decode_chunk_slot_tail = partial(jax.jit, static_argnums=(1, 4, 5), donate_argnums=(3,))(
    decode_chunk_slot_tail
)
jit_prefill_and_chunk_slot_tail = partial(jax.jit, static_argnums=(1, 6, 7), donate_argnums=(4,))(
    prefill_and_chunk_slot_tail
)


# ── fused-attention chunk decode (the TPU serving path) ─────────────
#
# The scan-over-stacked-layers structure above makes XLA slice each
# layer's cache out of the stack and restack the updated copy every step
# — 2 full cache passes beyond the attention read.  The fused path keeps
# per-layer caches as SEPARATE arrays carried through the step scan
# (layers python-unrolled: 24 bodies is a normal forward pass) and runs
# attention+update through the in-place pallas kernel
# (:mod:`s2s_tpu.ops.decode_attention`) when available, so each cache is
# read once and written one slot per step.  CPU/test fallback uses the
# same per-layer structure with the vmapped-DUS + jnp attention math —
# numerics identical (tests/test_batched_decode.py pins fused == legacy).


class FusedDecodeState(NamedTuple):
    """Per-layer cache tuples + per-slot positions."""

    kcaches: tuple
    vcaches: tuple
    pos: jax.Array  # (B,) int32


def init_fused_state(cfg: DecoderLMConfig, batch: int, max_t: int | None = None) -> FusedDecodeState:
    max_t = max_t or cfg.max_seq_len
    shape = (batch, cfg.n_kv_heads, max_t, cfg.head_dim)
    return FusedDecodeState(
        tuple(jnp.zeros(shape, cfg.dtype) for _ in range(cfg.n_layers)),
        tuple(jnp.zeros(shape, cfg.dtype) for _ in range(cfg.n_layers)),
        jnp.zeros((batch,), jnp.int32),
    )


def fused_state_from_multi(state: MultiDecodeState) -> FusedDecodeState:
    n_layers = state.caches.k.shape[0]
    return FusedDecodeState(
        tuple(state.caches.k[l] for l in range(n_layers)),
        tuple(state.caches.v[l] for l in range(n_layers)),
        state.pos,
    )


def _block_fused(x, lp, cfg: DecoderLMConfig, cache_k, cache_v, pos, cos_b, sin_b,
                 use_kernel: bool):
    """One unrolled block for a (B, 1, D) step with per-row positions and
    per-layer (B, KV, T, hd) caches."""
    b = x.shape[0]
    h = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
    q = linear(h, lp["wq"]).reshape(b, 1, cfg.n_heads, cfg.head_dim)
    k = linear(h, lp["wk"]).reshape(b, 1, cfg.n_kv_heads, cfg.head_dim)
    if cfg.qk_norm:
        q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = linear(h, lp["wv"]).reshape(b, 1, cfg.n_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    q = jax.vmap(lambda qq, c, s: apply_rope(qq[None], c, s)[0])(q, cos_b, sin_b)
    k = jax.vmap(lambda kk, c, s: apply_rope(kk[None], c, s)[0])(k, cos_b, sin_b)
    if use_kernel:
        from s2s_tpu.ops.decode_attention import decode_attention

        attn_h, cache_k, cache_v = decode_attention(q[:, :, 0, :], k, v, cache_k, cache_v, pos)
        attn = attn_h[:, :, None, :]
    else:
        cache_k = _row_update(cache_k, k, pos)
        cache_v = _row_update(cache_v, v, pos)
        max_t = cache_k.shape[2]
        mask = (jnp.arange(max_t)[None, :] <= pos[:, None])[:, None, None, :]
        attn = attention(q, cache_k, cache_v, mask)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, cfg.n_heads * cfg.head_dim)
    x = x + linear(attn, lp["wo"])
    h = rms_norm(x, lp["mlp_norm"], cfg.rms_eps)
    x = x + swiglu(h, lp["w_gate"], lp["w_up"], lp["w_down"])
    return x, cache_k, cache_v


def decode_chunk_fused(
    params, cfg: DecoderLMConfig, tokens, state: FusedDecodeState, n_tokens: int,
    eos_id: int, active, use_kernel: bool = False,
):
    """Greedy chunk decode over the fused per-layer-cache layout; same
    contract as :func:`decode_chunk_multi`."""
    cos_full, sin_full = rope_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_theta)
    layer_params = [
        jax.tree.map(lambda a: a[l], params["layers"]) for l in range(cfg.n_layers)
    ]

    def step(carry, _):
        tok, kcs, vcs, pos, act = carry
        x = params["embed"][tok][:, None, :].astype(cfg.dtype)
        cos_b = cos_full[pos][:, None, :]
        sin_b = sin_full[pos][:, None, :]
        new_kcs, new_vcs = [], []
        for lp, ck, cv in zip(layer_params, kcs, vcs):
            x, ck, cv = _block_fused(x, lp, cfg, ck, cv, pos, cos_b, sin_b, use_kernel)
            new_kcs.append(ck)
            new_vcs.append(cv)
        hidden = rms_norm(x, params["final_norm"], cfg.rms_eps)
        logits = _logits(hidden, params, cfg)[:, 0]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(act, nxt, tok)
        act_next = act & (tok != eos_id)
        pos_next = jnp.where(act, pos + 1, pos)
        return (nxt, tuple(new_kcs), tuple(new_vcs), pos_next, act_next), (tok, act)

    (tok, kcs, vcs, pos, active), (toks, emitted) = jax.lax.scan(
        step, (tokens, state.kcaches, state.vcaches, state.pos, active),
        None, length=n_tokens,
    )
    return toks, emitted, tok, FusedDecodeState(kcs, vcs, pos), active


jit_decode_chunk_fused = partial(
    jax.jit, static_argnums=(1, 4, 5, 7), donate_argnums=(3,)
)(decode_chunk_fused)


jit_prefill_slot = partial(jax.jit, static_argnums=(1,), donate_argnums=(4,))(prefill_slot)
jit_prefill_slot_embeds = partial(jax.jit, static_argnums=(1,), donate_argnums=(4,))(
    prefill_slot_embeds
)
jit_decode_chunk_multi = partial(jax.jit, static_argnums=(1, 4, 5), donate_argnums=(3,))(
    decode_chunk_multi
)
jit_decode_chunk_slot = partial(jax.jit, static_argnums=(1, 4, 5), donate_argnums=(3,))(
    decode_chunk_slot
)
jit_decode_chunk_gathered = partial(jax.jit, static_argnums=(1, 4, 5), donate_argnums=(3,))(
    decode_chunk_gathered
)
jit_prefill_and_chunk_slot = partial(jax.jit, static_argnums=(1, 6, 7), donate_argnums=(4,))(
    prefill_and_chunk_slot
)
