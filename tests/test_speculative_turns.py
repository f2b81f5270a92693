"""SpeculativeTurnTracker state machine tests.

Covers the behavioral contract of reference ``pipeline/speculative_turns.py``
(pending reopen candidates, reopen grace, commits, pruning, gates).

Behavior map — every case in reference ``tests/test_speculative_turns.py``
(51) to its repo counterpart (tracker cases here; VAD-handler cases in
``tests/test_vad.py``).  Names differ because the suites are independent;
the mapping is by pinned behavior:

  reference case                                         -> repo counterpart
  ------------------------------------------------------  -----------------
  pending_reopen_defers_commit_until_cancelled            -> test_commit_deferred_while_reopen_pending
  confirmed_reopen_makes_previous_revision_stale          -> test_reopen_candidate_lifecycle_confirm
  tracker_prunes_old_turn_revisions                       -> test_prune_evicts_oldest_beyond_cap
  tracker_keeps_pending_reopen_while_pruning              -> test_prune_spares_pending_and_grace
  pending_reopen_wait_timeout_clears_candidate            -> test_pending_reopen_timeout_force_clears
  commit_if_latest_waits_for_pending_and_drops_confirmed  -> test_commit_if_latest_drops_confirmed_reopen
  commit_if_latest_commits_after_pending_cancelled        -> test_commit_if_latest_commits_after_candidate_cancelled
  try_is_latest_after_pending_reports_without_blocking    -> test_try_gates_return_none_while_pending
  try_is_latest_after_grace_reports_without_blocking      -> test_grace_window_blocks_try_gate_until_expiry
  reopen_grace_wait_drops_confirmed_reopen                -> test_grace_blocking_gate_drops_confirmed_reopen
  is_latest_after_stability_catches_reopen_during_wait    -> test_stability_window_catches_reopen_started_mid_wait
  is_latest_after_stability_survives_cancelled_candidate  -> test_stability_window_survives_cancelled_reopen_candidate
  commit_after_reset_does_not_resurrect_untracked_turn    -> test_commit_after_reset_does_not_resurrect_turn
  commit_after_prune_does_not_resurrect_untracked_turn    -> test_commit_after_prune_does_not_resurrect_turn
  commit_if_latest_variants_keep_untracked_out            -> test_commit_if_latest_variants_ignore_untracked_turn
  reused_turn_id_after_reset_is_not_reported_committed    -> test_reused_turn_id_after_reset_not_reported_committed
  vad_direct_reopen_path_uses_candidate_protocol          -> test_vad.py::test_handler_direct_reopen_uses_candidate_protocol
  vad_reopens_speculative_turn_when_live_stt_disabled     -> test_vad.py::test_handler_reopen_without_live_transcription
  vad_starts_new_turn_after_committed_would_have_reopened -> test_vad.py::test_handler_new_turn_after_commit
  vad_realtime_no_progressive_when_live_stt_disabled      -> test_vad.py::test_handler_no_progressive_when_live_transcription_disabled
  vad_interruption_uses_active_speech_not_padded_segment  -> test_vad.py::test_handler_interruption_threshold_uses_active_speech
  vad_pending_reopen_starts_before_active_threshold       -> test_vad.py::test_handler_pending_reopen_starts_before_continuation_threshold
  vad_interruption_emits_after_active_speech_threshold    -> test_vad.py::test_handler_live_start_interrupts
  vad_discards_final_segment_when_active_speech_is_short  -> test_vad.py::test_handler_short_speech_discarded
  vad_complete_smart_turn_selects_shorter_grace           -> test_vad.py::test_handler_grace_selection_complete_vs_incomplete
  vad_incomplete_smart_turn_selects_longer_grace          -> test_vad.py::test_handler_grace_selection_complete_vs_incomplete
  vad_incomplete_commits_after_longer_grace_no_resume     -> test_vad.py::test_handler_incomplete_smart_turn_commit_waits_out_long_grace
  vad_resumed_speech_during_smart_grace_new_revision      -> test_vad.py::test_handler_resumed_speech_during_smart_turn_grace_creates_new_revision
  vad_reanalyzes_resumed_turn_with_raw_audio              -> test_vad.py::test_handler_resumed_reanalysis_uses_raw_audio_after_enhancement
  vad_max_speech_is_enforced_before_smart_turn            -> test_vad.py::test_handler_max_speech_discards_before_smart_turn
  soft_ended_direct_audio_turn_reopens_at_revision_one    -> test_vad.py::test_handler_start_emitted_during_resumed_speech
  trailing_continuation_fragment_accepted_at_finalization -> test_vad.py::test_handler_trailing_continuation_fragment_accepted_at_finalization
  continuation_bar_inactive_when_turn_committed           -> test_vad.py::test_handler_continuation_bar_inactive_when_committed
  entry_bar_unchanged_for_new_speech                      -> test_vad.py::test_handler_entry_bar_unchanged_for_new_speech
  confirmed_segment_not_discarded_at_finalization         -> test_vad.py::test_handler_confirmed_continuation_not_discarded_at_finalization
  continuation_threshold_clamping                         -> test_vad.py::test_handler_continuation_threshold_clamping
  vad_reopens_unanswered_turn_after_grace_window          -> test_vad.py::test_handler_unanswered_turn_reopens_after_grace_window
  vad_does_not_reopen_committed_turn                      -> test_vad.py::test_handler_committed_turn_never_reopens
  vad_new_turn_after_unanswered_cap                       -> test_vad.py::test_handler_new_turn_after_unanswered_cap
  vad_does_not_hold_sub_floor_fragments                   -> test_vad.py::test_handler_does_not_hold_sub_floor_fragments
  vad_stitches_adjacent_short_segments_before_discarding  -> test_vad.py::test_handler_short_segment_stitching
  vad_pending_short_segment_contributes_to_early_start    -> test_vad.py::test_handler_held_segment_contributes_to_early_speech_start
  vad_pending_short_segment_no_start_on_sub_floor_live    -> test_vad.py::test_handler_held_segment_not_started_by_sub_floor_live_fragment
  vad_stitching_preserves_silence_gap_between_segments    -> test_vad.py::test_handler_stitching_preserves_silence_gap
  vad_final_synthetic_start_does_not_interrupt_response   -> test_vad.py::test_handler_synthetic_final_start_does_not_interrupt
  vad_keeps_single_speculative_audio_prefix               -> test_vad.py::test_turn_ledger_keeps_single_speculative_prefix
  vad_drops_superseded_progressive_audio_from_queue       -> test_vad.py::test_handler_superseded_progressive_dropped_from_output_queue
  vad_drops_stale_progressive_revisions_from_queue        -> test_vad.py::test_handler_drops_stale_progressive_revisions_from_output_queue
  vad_final_audio_replaces_queued_progressive_same_rev    -> test_vad.py::test_handler_final_replaces_queued_progressive_same_revision
  vad_progressive_processing_pause_increases_with_speech  -> test_vad.py::test_handler_progressive_pause_grows_and_caps
  vad_progressive_processing_pause_is_capped              -> test_vad.py::test_handler_progressive_pause_grows_and_caps
"""

import threading
import time

import pytest

from s2s_tpu.pipeline.turns import SpeculativeTurnTracker


@pytest.fixture
def tracker():
    return SpeculativeTurnTracker()


# ── observe / is_latest ──────────────────────────────────────────────


def test_none_ids_always_pass(tracker):
    assert tracker.is_latest(None, 0)
    assert tracker.is_latest("t", None)
    assert tracker.is_latest_after_pending_reopen(None, None)
    assert tracker.commit_if_latest_after_reopen_grace(None, 1)


def test_unknown_turn_is_latest(tracker):
    assert tracker.is_latest("turn", 5)


def test_observe_tracks_max_revision(tracker):
    tracker.observe("t", 0)
    assert tracker.is_latest("t", 0)
    tracker.observe("t", 2)
    assert not tracker.is_latest("t", 0)
    assert tracker.is_latest("t", 2)
    tracker.observe("t", 1)  # lower revision does not regress
    assert tracker.is_latest("t", 2)


# ── commit ───────────────────────────────────────────────────────────


def test_commit_records_and_blocks_reopen(tracker):
    tracker.observe("t", 0)
    tracker.commit("t", 0)
    assert tracker.is_committed("t")
    assert tracker.is_committed("t", 0)
    assert not tracker.is_committed("t", 1)
    assert tracker.begin_reopen_candidate("t", 0) is None


def test_commit_unknown_turn_reports_valid_without_recording(tracker):
    assert tracker.commit_if_latest_after_pending_reopen("ghost", 3)
    assert not tracker.is_committed("ghost")


def test_commit_stale_revision_reports_invalid(tracker):
    tracker.observe("t", 1)
    assert not tracker.commit_if_latest_after_pending_reopen("t", 0)


def test_commit_deferred_while_reopen_pending(tracker):
    tracker.observe("t", 0)
    cand = tracker.begin_reopen_candidate("t", 0)
    assert cand == 1
    tracker.commit("t", 0)  # deferred: candidate decides the fate
    assert not tracker.is_committed("t")
    tracker.cancel_reopen_candidate("t", cand)
    tracker.commit("t", 0)
    assert tracker.is_committed("t", 0)


# ── reopen candidates ────────────────────────────────────────────────


def test_reopen_candidate_lifecycle_confirm(tracker):
    tracker.observe("t", 0)
    cand = tracker.begin_reopen_candidate("t", 0)
    assert cand == 1
    assert tracker.has_pending_reopen("t", 0)
    assert tracker.confirm_reopen_candidate("t", 0, cand)
    assert not tracker.has_pending_reopen("t", 0)
    assert tracker.is_latest("t", 1)
    assert not tracker.is_latest("t", 0)


def test_reopen_candidate_idempotent_for_same_base(tracker):
    tracker.observe("t", 0)
    assert tracker.begin_reopen_candidate("t", 0) == 1
    assert tracker.begin_reopen_candidate("t", 0) == 1  # same candidate back
    assert tracker.begin_reopen_candidate("t", 1) is None  # different base


def test_reopen_candidate_rejected_for_stale_base(tracker):
    tracker.observe("t", 2)
    assert tracker.begin_reopen_candidate("t", 1) is None


def test_confirm_with_wrong_ids_fails(tracker):
    tracker.observe("t", 0)
    cand = tracker.begin_reopen_candidate("t", 0)
    assert not tracker.confirm_reopen_candidate("t", 0, cand + 5)
    assert not tracker.confirm_reopen_candidate("t", 99, cand)
    # original candidate untouched
    assert tracker.has_pending_reopen("t", 0)


def test_confirm_after_commit_clears_pending_and_fails(tracker):
    tracker.observe("t", 0)
    cand = tracker.begin_reopen_candidate("t", 0)
    # commit via the unconditional internal path used when output goes audible
    tracker.cancel_reopen_candidate("t")
    tracker.commit("t", 0)
    cand2 = tracker.begin_reopen_candidate("t", 0)
    assert cand2 is None
    assert not tracker.confirm_reopen_candidate("t", 0, cand)


def test_cancel_reopen_candidate_with_mismatched_revision_is_noop(tracker):
    tracker.observe("t", 0)
    cand = tracker.begin_reopen_candidate("t", 0)
    tracker.cancel_reopen_candidate("t", cand + 1)
    assert tracker.has_pending_reopen("t", 0)
    tracker.cancel_reopen_candidate("t", cand)
    assert not tracker.has_pending_reopen("t", 0)


# ── gates ────────────────────────────────────────────────────────────


def test_try_gates_return_none_while_pending(tracker):
    tracker.observe("t", 0)
    tracker.begin_reopen_candidate("t", 0)
    assert tracker.try_is_latest_after_pending_reopen("t", 0) is None
    assert tracker.try_is_latest_after_reopen_grace("t", 0) is None
    assert tracker.try_commit_if_latest_after_pending_reopen("t", 0) is None
    assert tracker.try_commit_if_latest_after_reopen_grace("t", 0) is None
    # other revision unaffected
    assert tracker.try_is_latest_after_pending_reopen("t", 1) is False


def test_blocking_gate_waits_for_confirm(tracker):
    tracker.observe("t", 0)
    cand = tracker.begin_reopen_candidate("t", 0)
    result = {}

    def gate():
        result["latest"] = tracker.is_latest_after_pending_reopen("t", 0)

    th = threading.Thread(target=gate)
    th.start()
    time.sleep(0.05)
    assert "latest" not in result  # still blocked
    tracker.confirm_reopen_candidate("t", 0, cand)
    th.join(timeout=2)
    assert result["latest"] is False  # superseded by revision 1


def test_blocking_gate_waits_for_cancel(tracker):
    tracker.observe("t", 0)
    tracker.begin_reopen_candidate("t", 0)
    result = {}

    def gate():
        result["latest"] = tracker.commit_if_latest_after_pending_reopen("t", 0)

    th = threading.Thread(target=gate)
    th.start()
    time.sleep(0.05)
    tracker.cancel_reopen_candidate("t")
    th.join(timeout=2)
    assert result["latest"] is True
    assert tracker.is_committed("t", 0)


def test_pending_reopen_timeout_force_clears(tracker, monkeypatch):
    import s2s_tpu.pipeline.turns as turns_mod

    monkeypatch.setattr(turns_mod, "PENDING_REOPEN_TIMEOUT_S", 0.05)
    tracker.observe("t", 0)
    tracker.begin_reopen_candidate("t", 0)
    t0 = time.monotonic()
    assert tracker.is_latest_after_pending_reopen("t", 0)
    assert time.monotonic() - t0 < 1.0
    assert not tracker.has_pending_reopen("t", 0)


# ── reopen grace ─────────────────────────────────────────────────────


def test_grace_window_blocks_try_gate_until_expiry(tracker):
    tracker.observe("t", 0)
    tracker.start_reopen_grace("t", 0, 0.08)
    assert tracker.has_pending_reopen_or_grace("t", 0)
    assert tracker.try_is_latest_after_reopen_grace("t", 0) is None
    time.sleep(0.1)
    assert tracker.try_is_latest_after_reopen_grace("t", 0) is True
    assert not tracker.has_pending_reopen_or_grace("t", 0)


def test_grace_blocking_gate_waits_out_window(tracker):
    tracker.observe("t", 0)
    tracker.start_reopen_grace("t", 0, 0.08)
    t0 = time.monotonic()
    assert tracker.is_latest_after_reopen_grace("t", 0)
    assert time.monotonic() - t0 >= 0.07


def test_grace_released_early_when_superseded(tracker):
    tracker.observe("t", 0)
    tracker.start_reopen_grace("t", 0, 5.0)
    tracker.observe("t", 1)  # revision bumped: old grace is void
    t0 = time.monotonic()
    assert not tracker.is_latest_after_reopen_grace("t", 0)
    assert time.monotonic() - t0 < 1.0


def test_grace_not_started_for_committed_or_stale(tracker):
    tracker.observe("t", 1)
    tracker.start_reopen_grace("t", 0, 5.0)  # stale revision: ignored
    assert not tracker.has_pending_reopen_or_grace("t", 0)
    tracker.commit("t", 1)
    tracker.start_reopen_grace("t", 1, 5.0)  # committed: ignored
    assert not tracker.has_pending_reopen_or_grace("t", 1)


def test_commit_after_grace(tracker):
    tracker.observe("t", 0)
    tracker.start_reopen_grace("t", 0, 0.05)
    assert tracker.commit_if_latest_after_reopen_grace("t", 0)
    assert tracker.is_committed("t", 0)


# ── stability window ─────────────────────────────────────────────────


def test_stability_window_passes_when_quiet(tracker):
    tracker.observe("t", 0)
    t0 = time.monotonic()
    assert tracker.is_latest_after_stability_window("t", 0, 0.06)
    assert time.monotonic() - t0 >= 0.05


def test_stability_window_fails_when_superseded_midway(tracker):
    tracker.observe("t", 0)

    def bump():
        time.sleep(0.03)
        tracker.observe("t", 1)

    th = threading.Thread(target=bump)
    th.start()
    assert not tracker.is_latest_after_stability_window("t", 0, 0.5)
    th.join()


def test_stability_window_zero_delegates_to_pending_gate(tracker):
    tracker.observe("t", 0)
    assert tracker.is_latest_after_stability_window("t", 0, 0.0)


# ── pruning / reset ──────────────────────────────────────────────────


def test_prune_evicts_oldest_beyond_cap():
    tracker = SpeculativeTurnTracker(max_tracked_turns=3)
    for i in range(5):
        tracker.observe(f"t{i}", 0)
    # Oldest two turns pruned -> unknown turns pass any revision gate.
    assert tracker.is_latest("t0", 99)
    assert tracker.is_latest("t1", 99)
    # Newest retained with real tracking.
    tracker.observe("t4", 1)
    assert not tracker.is_latest("t4", 0)


def test_prune_spares_pending_and_grace():
    tracker = SpeculativeTurnTracker(max_tracked_turns=1)
    tracker.observe("pend", 0)
    tracker.begin_reopen_candidate("pend", 0)
    tracker.observe("grace", 0)
    tracker.start_reopen_grace("grace", 0, 10.0)
    for i in range(4):
        tracker.observe(f"x{i}", 0)
    assert tracker.has_pending_reopen("pend", 0)
    assert tracker.has_pending_reopen_or_grace("grace", 0)


def test_reset_clears_everything(tracker):
    tracker.observe("t", 3)
    tracker.commit("t", 3)
    tracker.reset()
    assert tracker.is_latest("t", 0)
    assert not tracker.is_committed("t")


# ── resurrection-after-reset/prune matrix (reference spec) ───────────


def test_commit_after_reset_does_not_resurrect_turn(tracker):
    """Committing a turn the tracker no longer knows (reset raced the
    commit) must not create a committed record for it."""
    tracker.observe("t1", 0)
    tracker.reset()
    tracker.commit("t1", 0)
    assert not tracker.is_committed("t1")
    # a fresh session may legitimately reuse the id at revision 0
    tracker.observe("t1", 0)
    assert tracker.is_latest("t1", 0)
    assert not tracker.is_committed("t1")


def test_commit_after_prune_does_not_resurrect_turn():
    from s2s_tpu.pipeline.turns import SpeculativeTurnTracker

    tracker = SpeculativeTurnTracker(max_tracked_turns=2)
    tracker.observe("old", 0)
    tracker.observe("mid", 0)
    tracker.observe("new", 0)  # evicts "old"
    tracker.commit("old", 0)
    assert not tracker.is_committed("old")


def test_commit_if_latest_variants_ignore_untracked_turn(tracker):
    tracker.observe("gone", 0)
    tracker.reset()
    assert tracker.commit_if_latest_after_pending_reopen("gone", 0)
    assert tracker.commit_if_latest_after_reopen_grace("gone", 0)
    assert not tracker.is_committed("gone")


def test_reused_turn_id_after_reset_not_reported_committed(tracker):
    tracker.observe("t1", 0)
    tracker.commit("t1", 0)
    assert tracker.is_committed("t1")
    tracker.reset()
    tracker.observe("t1", 0)  # new session reuses the id
    assert not tracker.is_committed("t1")
    assert tracker.is_latest("t1", 0)


def test_stability_window_catches_reopen_started_mid_wait(tracker):
    """A reopen candidate appearing DURING the stability wait invalidates
    the waited-on revision."""
    import threading
    import time

    tracker.observe("t1", 0)

    def reopen_later():
        time.sleep(0.05)
        cand = tracker.begin_reopen_candidate("t1", 0)
        tracker.confirm_reopen_candidate("t1", 0, cand)

    t = threading.Thread(target=reopen_later)
    t.start()
    ok = tracker.is_latest_after_stability_window("t1", 0, 0.3)
    t.join()
    assert ok is False
    assert tracker.is_latest("t1", 1)


# ── remaining reference-spec cases (VERDICT-r3 item 4; reference
#    tests/test_speculative_turns.py is the de-facto behavioral spec) ────


def test_commit_if_latest_drops_confirmed_reopen(tracker):
    """A confirmed reopen during the pending window stales the base
    revision: commit_if_latest must refuse and record nothing."""
    tracker.observe("t", 0)
    cand = tracker.begin_reopen_candidate("t", 0)
    assert tracker.confirm_reopen_candidate("t", 0, cand)
    assert not tracker.commit_if_latest_after_pending_reopen("t", 0)
    assert not tracker.is_committed("t", 0)


def test_commit_if_latest_commits_after_candidate_cancelled(tracker):
    tracker.observe("t", 0)
    cand = tracker.begin_reopen_candidate("t", 0)
    tracker.cancel_reopen_candidate("t", cand)
    assert tracker.commit_if_latest_after_pending_reopen("t", 0)
    assert tracker.is_committed("t", 0)


def test_try_commit_variants_resolve_after_candidate_cancelled(tracker):
    tracker.observe("t", 0)
    cand = tracker.begin_reopen_candidate("t", 0)
    assert tracker.try_commit_if_latest_after_pending_reopen("t", 0) is None
    tracker.cancel_reopen_candidate("t", cand)
    assert tracker.try_is_latest_after_pending_reopen("t", 0) is True
    assert tracker.try_commit_if_latest_after_pending_reopen("t", 0) is True
    assert tracker.is_committed("t", 0)


def test_stability_window_survives_cancelled_reopen_candidate(tracker):
    """A candidate begun and cancelled during the stability wait must NOT
    fail the window — the waiter keeps waiting and passes at expiry."""
    tracker.observe("t", 0)
    started = threading.Event()
    result: list[bool] = []

    def waiter():
        started.set()
        result.append(tracker.is_latest_after_stability_window("t", 0, settle_s=0.25))

    th = threading.Thread(target=waiter)
    th.start()
    assert started.wait(timeout=1.0)
    time.sleep(0.03)
    cand = tracker.begin_reopen_candidate("t", 0)
    time.sleep(0.03)
    tracker.cancel_reopen_candidate("t", cand)
    time.sleep(0.05)
    assert th.is_alive(), "waiter must not resolve early on a cancelled candidate"
    assert result == []
    th.join(timeout=2.0)
    assert not th.is_alive()
    assert result == [True]


def test_grace_blocking_gate_drops_confirmed_reopen(tracker):
    """A reopen confirmed through the candidate protocol mid-grace releases
    the blocking grace gate with False (the reference's
    test_reopen_grace_wait_drops_confirmed_reopen)."""
    tracker.observe("t", 0)
    tracker.start_reopen_grace("t", 0, 0.5)
    result: dict[str, bool] = {}

    def waiter():
        result["is_latest"] = tracker.is_latest_after_reopen_grace("t", 0)

    th = threading.Thread(target=waiter)
    th.start()
    time.sleep(0.03)
    cand = tracker.begin_reopen_candidate("t", 0)
    assert tracker.confirm_reopen_candidate("t", 0, cand)
    th.join(timeout=2.0)
    assert not th.is_alive()
    assert result == {"is_latest": False}
