"""Batched multi-session decode == independent per-session decodes,
with per-slot positions and idle-slot masking."""

import jax
import jax.numpy as jnp
import numpy as np

from s2s_tpu.models import decoder_lm
from s2s_tpu.models.decoder_lm import DecoderLMConfig
from s2s_tpu.parallel.batched_decode import (
    MultiDecodeState,
    decode_step_multi,
    init_multi_state,
)


def single_session_reference(params, cfg, seq, n_steps):
    """Decode seq token-by-token in its own state; return stepwise logits."""
    state = decoder_lm.init_decode_state(cfg, 1, max_t=32)
    outs = []
    for t in range(n_steps):
        logits, state = decoder_lm.decode_step(params, cfg, seq[:, t], state)
        outs.append(np.asarray(logits[0]))
    return outs


def test_batched_matches_independent_sessions():
    cfg = DecoderLMConfig.tiny()
    params = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)
    seq_a = jax.random.randint(jax.random.PRNGKey(1), (1, 6), 0, cfg.vocab_size)
    seq_b = jax.random.randint(jax.random.PRNGKey(2), (1, 6), 0, cfg.vocab_size)
    ref_a = single_session_reference(params, cfg, seq_a, 6)
    ref_b = single_session_reference(params, cfg, seq_b, 6)

    state = init_multi_state(cfg, 2, max_t=32)
    for t in range(6):
        tokens = jnp.asarray([int(seq_a[0, t]), int(seq_b[0, t])], jnp.int32)
        logits, state = decode_step_multi(params, cfg, tokens, state)
        np.testing.assert_allclose(np.asarray(logits[0]), ref_a[t], atol=3e-4)
        np.testing.assert_allclose(np.asarray(logits[1]), ref_b[t], atol=3e-4)
    assert state.pos.tolist() == [6, 6]


def test_batched_with_staggered_positions_and_idle_slots():
    """Session B joins three steps later and idles once — batched results must
    still match its independent decode."""
    cfg = DecoderLMConfig.tiny()
    params = decoder_lm.init_params(jax.random.PRNGKey(3), cfg)
    seq_a = jax.random.randint(jax.random.PRNGKey(4), (1, 8), 0, cfg.vocab_size)
    seq_b = jax.random.randint(jax.random.PRNGKey(5), (1, 4), 0, cfg.vocab_size)
    ref_a = single_session_reference(params, cfg, seq_a, 8)
    ref_b = single_session_reference(params, cfg, seq_b, 4)

    state = init_multi_state(cfg, 2, max_t=32)
    b_step = 0
    for t in range(8):
        b_active = 3 <= t < 7  # B decodes during steps 3..6 only
        tokens = jnp.asarray(
            [int(seq_a[0, t]), int(seq_b[0, b_step]) if b_active else 0], jnp.int32
        )
        active = jnp.asarray([True, b_active])
        logits, state = decode_step_multi(params, cfg, tokens, state, active)
        np.testing.assert_allclose(np.asarray(logits[0]), ref_a[t], atol=3e-4)
        if b_active:
            np.testing.assert_allclose(np.asarray(logits[1]), ref_b[b_step], atol=3e-4)
            b_step += 1
    assert state.pos.tolist() == [8, 4]


def test_jit_decode_step_multi_with_donation():
    from s2s_tpu.parallel.batched_decode import jit_decode_step_multi

    cfg = DecoderLMConfig.tiny()
    params = decoder_lm.init_params(jax.random.PRNGKey(6), cfg)
    state = init_multi_state(cfg, 3, max_t=32)
    tokens = jnp.zeros((3,), jnp.int32)
    active = jnp.asarray([True, False, True])
    for _ in range(3):
        logits, state = jit_decode_step_multi(params, cfg, tokens, state, active)
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    assert state.pos.tolist() == [3, 0, 3]  # idle slot never advanced


def test_fused_chunk_matches_legacy_multi_chunk():
    """The fused per-layer-cache chunk decode (CPU fallback math) must emit
    exactly the tokens of the stacked-scan path, including eos deactivation
    and per-row positions."""
    from s2s_tpu.parallel import batched_decode as bd

    cfg = DecoderLMConfig.tiny()
    params = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray([1, 2, 3], jnp.int32)
    active = jnp.ones((3,), bool)

    m_state = bd.init_multi_state(cfg, 3, max_t=32)
    m_toks, m_emitted, m_tok, m_state, m_active = bd.decode_chunk_multi(
        params, cfg, tokens, m_state, 8, 0, active)

    f_state = bd.init_fused_state(cfg, 3, max_t=32)
    f_toks, f_emitted, f_tok, f_state, f_active = bd.decode_chunk_fused(
        params, cfg, tokens, f_state, 8, 0, active)

    assert np.array_equal(np.asarray(m_toks), np.asarray(f_toks))
    assert np.array_equal(np.asarray(m_emitted), np.asarray(f_emitted))
    assert np.array_equal(np.asarray(m_tok), np.asarray(f_tok))
    assert np.array_equal(np.asarray(m_active), np.asarray(f_active))
    assert np.array_equal(np.asarray(m_state.pos), np.asarray(f_state.pos))
    # caches agree layer by layer
    for l in range(cfg.n_layers):
        np.testing.assert_allclose(
            np.asarray(m_state.caches.k[l]), np.asarray(f_state.kcaches[l]), atol=1e-5)


def test_fused_state_from_multi_roundtrip():
    from s2s_tpu.parallel import batched_decode as bd

    cfg = DecoderLMConfig.tiny()
    params = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)
    state = bd.init_multi_state(cfg, 2, max_t=32)
    # prefill one slot so the converted state carries real content
    prompt = jnp.ones((1, 4), jnp.int32)
    tok, state = bd.prefill_slot(params, cfg, prompt, jnp.asarray(4, jnp.int32),
                                 state, jnp.asarray(0, jnp.int32))
    fused = bd.fused_state_from_multi(state)
    assert fused.pos.tolist() == state.pos.tolist()
    np.testing.assert_allclose(
        np.asarray(fused.kcaches[0]), np.asarray(state.caches.k[0]), atol=0)


def test_fused_kernel_path_matches_fallback_interpret():
    """decode_attention (interpret) inside the fused block == the vmapped
    DUS + jnp attention fallback."""
    from s2s_tpu.ops.decode_attention import decode_attention
    from s2s_tpu.parallel import batched_decode as bd

    cfg = DecoderLMConfig.tiny()
    b, kv, t, hd = 2, cfg.n_kv_heads, 16, cfg.head_dim
    h = cfg.n_heads
    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (b, h, 1, hd), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(6), (b, kv, 1, hd), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(7), (b, kv, 1, hd), jnp.float32)
    ck = jax.random.normal(jax.random.PRNGKey(8), (b, kv, t, hd), jnp.float32)
    cv = jax.random.normal(jax.random.PRNGKey(9), (b, kv, t, hd), jnp.float32)
    pos = jnp.asarray([2, 9], jnp.int32)

    from s2s_tpu.models.common import attention

    ck2 = bd._row_update(ck, k, pos)
    cv2 = bd._row_update(cv, v, pos)
    mask = (jnp.arange(t)[None, :] <= pos[:, None])[:, None, None, :]
    ref = attention(q, ck2, cv2, mask)[:, :, 0, :]

    out, k_out, v_out = decode_attention(q[:, :, 0, :], k, v, ck, cv, pos, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_out), np.asarray(ck2), atol=0)


# ── tail-buffer chunk decode (round-4 serving path) ──────────────────


def _legacy_vs_tail_setup(key=7, n_slots=3, max_t=32):
    from s2s_tpu.parallel import batched_decode as bd

    cfg = DecoderLMConfig.tiny()
    params = decoder_lm.init_params(jax.random.PRNGKey(key), cfg)
    state = init_multi_state(cfg, n_slots, max_t=max_t)
    # stagger the rows to different positions via per-slot prefills
    for slot, plen in enumerate((5, 1, 3)[:n_slots]):
        toks = jax.random.randint(jax.random.PRNGKey(10 + slot), (1, 8), 0, cfg.vocab_size)
        _tok, state = bd.prefill_slot(
            params, cfg, toks, jnp.asarray(plen, jnp.int32), state,
            jnp.asarray(slot, jnp.int32),
        )
    return cfg, params, state


def _clone(state):
    return MultiDecodeState(
        jax.tree.map(jnp.copy, state.caches), jnp.copy(state.pos)
    )


def _assert_valid_prefix_equal(sa, sb):
    """Caches equal at every row's valid positions (< pos); post-EOS garbage
    beyond pos is unspecified by design."""
    assert sa.pos.tolist() == sb.pos.tolist()
    for row, p in enumerate(np.asarray(sa.pos)):
        np.testing.assert_allclose(
            np.asarray(sa.caches.k[:, row, :, :p], np.float32),
            np.asarray(sb.caches.k[:, row, :, :p], np.float32), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(sa.caches.v[:, row, :, :p], np.float32),
            np.asarray(sb.caches.v[:, row, :, :p], np.float32), atol=1e-5)


def test_tail_chunk_matches_legacy_chunk():
    from s2s_tpu.parallel import batched_decode as bd

    cfg, params, state = _legacy_vs_tail_setup()
    tokens = jnp.asarray([3, 7, 11], jnp.int32)
    active = jnp.asarray([True, True, False])
    a = bd.decode_chunk_multi(params, cfg, tokens, _clone(state), 6, -1, active)
    b = bd.decode_chunk_tail(params, cfg, tokens, _clone(state), 6, -1, active)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))  # toks
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))  # emitted
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))  # next tok
    np.testing.assert_array_equal(np.asarray(a[4]), np.asarray(b[4]))  # active
    _assert_valid_prefix_equal(a[3], b[3])


def test_tail_chunk_matches_legacy_with_midchunk_eos():
    from s2s_tpu.parallel import batched_decode as bd

    cfg, params, state = _legacy_vs_tail_setup(key=8)
    tokens = jnp.asarray([3, 7, 11], jnp.int32)
    active = jnp.ones((3,), bool)
    ref = bd.decode_chunk_multi(params, cfg, tokens, _clone(state), 6, -1, active)
    # use row 1's step-2 emitted token as eos so it deactivates mid-chunk
    eos = int(np.asarray(ref[0])[2, 1])
    a = bd.decode_chunk_multi(params, cfg, tokens, _clone(state), 6, eos, active)
    b = bd.decode_chunk_tail(params, cfg, tokens, _clone(state), 6, eos, active)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    np.testing.assert_array_equal(np.asarray(a[4]), np.asarray(b[4]))
    _assert_valid_prefix_equal(a[3], b[3])
    # continue decoding from both carries: behavior must stay identical
    a2 = bd.decode_chunk_multi(params, cfg, a[2], a[3], 3, -1, a[4])
    b2 = bd.decode_chunk_tail(params, cfg, b[2], b[3], 3, -1, b[4])
    np.testing.assert_array_equal(np.asarray(a2[0]), np.asarray(b2[0]))


def test_tail_gathered_and_slot_match_legacy():
    from s2s_tpu.parallel import batched_decode as bd

    cfg, params, state = _legacy_vs_tail_setup(key=9)
    ids = jnp.asarray([2, 0, 0], jnp.int32)  # padded by repeating a valid id
    tokens = jnp.asarray([4, 9, 9], jnp.int32)
    a = bd.decode_chunk_gathered(params, cfg, tokens, _clone(state), 5, -1, ids)
    b = bd.decode_chunk_gathered_tail(params, cfg, tokens, _clone(state), 5, -1, ids)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    _assert_valid_prefix_equal(a[3], b[3])

    sa = bd.decode_chunk_slot(params, cfg, jnp.asarray(5, jnp.int32), _clone(state),
                              4, -1, jnp.asarray(1, jnp.int32))
    sb = bd.decode_chunk_slot_tail(params, cfg, jnp.asarray(5, jnp.int32), _clone(state),
                                   4, -1, jnp.asarray(1, jnp.int32))
    np.testing.assert_array_equal(np.asarray(sa[0]), np.asarray(sb[0]))
    np.testing.assert_array_equal(np.asarray(sa[2]), np.asarray(sb[2]))
    _assert_valid_prefix_equal(sa[3], sb[3])


def test_tail_prefill_and_chunk_matches_legacy():
    from s2s_tpu.parallel import batched_decode as bd

    cfg, params, state = _legacy_vs_tail_setup(key=11)
    prompt = jax.random.randint(jax.random.PRNGKey(42), (1, 8), 0, cfg.vocab_size)
    a = bd.prefill_and_chunk_slot(params, cfg, prompt, jnp.asarray(6, jnp.int32),
                                  _clone(state), jnp.asarray(1, jnp.int32), 5, -1)
    b = bd.prefill_and_chunk_slot_tail(params, cfg, prompt, jnp.asarray(6, jnp.int32),
                                       _clone(state), jnp.asarray(1, jnp.int32), 5, -1)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    _assert_valid_prefix_equal(a[3], b[3])
