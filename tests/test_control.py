"""CancelScope + control message semantics (mirrors reference cancellation rules)."""

from s2s_tpu.pipeline.control import SESSION_END, CancelScope, ControlKind, PipelineControl, is_control


def test_initial_state():
    cs = CancelScope()
    assert cs.generation == 0
    assert not cs.discarding
    assert not cs.is_stale(0)
    assert not cs.is_stale(None)


def test_cancel_bumps_generation_and_discards():
    cs = CancelScope()
    gen = cs.generation
    cs.cancel()
    assert cs.generation == gen + 1
    assert cs.discarding
    assert cs.is_stale(gen)
    assert not cs.is_stale(cs.generation)


def test_response_done_clears_discard_for_matching_generation():
    cs = CancelScope()
    cancelled = cs.generation
    cs.cancel()
    cs.response_done(cancelled)
    assert not cs.discarding


def test_response_done_ignores_unrelated_generation():
    cs = CancelScope()
    cs.cancel()  # cancelled gen 0, now at 1
    cs.cancel()  # cancelled gen 1, now at 2
    cs.response_done(0)  # neither cancelled (1) nor current (2)
    assert cs.discarding
    cs.response_done(1)
    assert not cs.discarding


def test_response_done_current_generation_clears():
    cs = CancelScope()
    cs.cancel()
    cs.response_done(cs.generation)
    assert not cs.discarding


def test_new_response_clears_discard():
    cs = CancelScope()
    cs.cancel()
    cs.new_response()
    assert not cs.discarding


def test_generation_wraps_at_32_bits():
    cs = CancelScope()
    cs._gen = 0xFFFFFFFF
    cs.cancel()
    assert cs.generation == 0


def test_control_message_helpers():
    assert is_control(SESSION_END)
    assert is_control(SESSION_END, ControlKind.SESSION_END)
    assert not is_control(b"END")
    assert not is_control("anything")
    tagged = PipelineControl(ControlKind.SESSION_END, session_id="sess_1")
    assert is_control(tagged, ControlKind.SESSION_END)
    assert tagged.session_id == "sess_1"
