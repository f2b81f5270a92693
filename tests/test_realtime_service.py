"""RealtimeService protocol tests: session lifecycle, audio ingress, the
STT->LLM bridge, response lifecycle + response.done reconstruction,
speculative revision handling, deferred items, failures.

BEHAVIOR MAP — reference realtime-service corpus, case by case
===============================================================
The reference pins its protocol with 158 cases in
``tests/openai_realtime/test_realtime_service.py`` (+16 live-SDK cases in
``test_openai_client.py``).  Every case is accounted for below: mapped to
the repo test (``file::test``) that pins the same behavior against this
repo's own design, or marked N/A with a rationale.  Files: RS=this file,
D..D6=test_protocol_depth..test_protocol_depth6.py, RC=test_runtime_config,
CH=test_chat/_matrix/_spec, SDK=test_openai_sdk_e2e, E2E=test_e2e_depth,
R=test_router(_matrix).

TestConnectionLifecycle (ref :84)
  register_creates_session_id                 -> D2::register_creates_distinct_sessions
  register_applies_server_default_instructions-> D2::register_applies_default_instructions
  unregister_removes_state                    -> D2::unregister_removes_state_and_rolls_usage
  build_session_created                       -> RS::session_created_carries_config
  build_session_updated                       -> RS::session_update_merges + R::ws_end_to_end_voice_turn
                                                 (session.updated emitted on the wire)
TestParseClientEvent (:161)
  parse_valid_{audio_append,session_update,conversation_item_create,
               response_create,response_cancel}
                                              -> D2::parse_client_event_accepts_known_types
  parse_unknown_event_type                    -> D2::parse_client_event_rejects_unknown_and_untyped
                                                 + D::unknown_client_event_type_returns_none
  parse_invalid_payload                       -> D2::parse_client_event_rejects_unknown_and_untyped
TestHandleAudioAppend (:208)
  audio_append_decodes_and_chunks             -> RS::audio_append_chunks_and_remainder
  audio_append_invalid_base64                 -> D::audio_append_invalid_base64_yields_no_chunks
  audio_append_undersized_tail                -> D::audio_append_undersized_tail_kept_as_remainder
TestHandleSessionUpdate (:234)
  session_update_voice                        -> D::session_update_voice_and_tools_persist
  session_update_instructions                 -> RS::session_update_merges
  session_update_tools_and_tool_choice        -> D::session_update_voice_and_tools_persist
  session_update_rejects_transcription_session-> RS::transcription_session_rejected
  session_update_nested_audio_format          -> D5::session_update_nested_output_format_changes_client_rate
                                                 + D2::session_update_input_rate_resamples_ingress
  session_update_merges_partial_updates       -> RS::session_update_merges
TestHandleConversationItemCreate (:304)
  text_input_emits_conversation_item_created  -> RS::conversation_item_create_and_deferral
  text_input_previous_item_id_chain           -> D2::item_created_chains_previous_item_id
  function_call_output_forwarded              -> D::deferred_function_call_output_applies_after_response
                                                 + D5::function_call_item_id_matches_arguments_done_and_output
  function_call_output_rejected_for_unknown_call_id
                                              -> D5::function_call_output_unknown_call_id_rejected
  input_image_forwarded                       -> D5::input_image_item_forwarded_to_chat
  mixed_text_and_image_forwarded              -> D5::mixed_text_and_image_item_keeps_both_parts
TestDeferConversationItemsDuringResponse (:417)
  applied_immediately_when_no_active_response -> RS::conversation_item_create_and_deferral
  item_deferred_while_in_response             -> RS::conversation_item_create_and_deferral
  deferred_items_flushed_in_order_on_finish   -> D2::deferred_items_flush_in_arrival_order
  function_call_output_deferred_then_pairs_after_response
                                              -> D::deferred_function_call_output_applies_after_response
TestHandleAudioCommit (:503)
  commit_after_audio                          -> D5::commit_after_audio_succeeds_then_empties
  commit_empty_buffer                         -> RS::audio_commit_empty_errors
TestHandleResponseCreate (:521)
  response_create_ok                          -> RS::response_create_explicit
  response_create_while_active                -> RS::response_create_explicit + D::double_response_create_rejected
  response_create_stores_overrides            -> D6::response_create_stores_overrides_on_request
  response_create_preserves_latest_user_turn_timing
                                              -> D5::response_create_preserves_latest_user_turn_timing
  response_create_rejects_complex_tool_choice -> RS::response_create_rejects_object_tool_choice
  response_create_accepts_valid_str_tool_choices
                                              -> D5::response_create_accepts_string_tool_choices
  response_create_with_image_input_items      -> D6::response_create_with_image_input_items
  response_create_rejects_invalid_function_call_output_in_input
                                              -> D5::response_create_rejects_bad_function_call_output_in_input
  double_response_create_rejected             -> D::double_response_create_rejected
  response_create_out_of_band_does_not_append_input_to_default_chat
                                              -> D::out_of_band_response_does_not_touch_chat
  response_create_in_band_appends_input_to_default_chat
                                              -> D::in_band_input_items_append_to_chat
                                                 + RS::response_create_with_inband_input_items
  response_create_out_of_band_carries_null_turn
                                              -> RS::response_create_out_of_band_null_conversation
                                                 (asserts req.turn_id is None)
  response_create_out_of_band_reports_null_conversation_id
                                              -> RS::response_create_out_of_band_null_conversation
  response_create_in_band_reports_conversation_id
                                              -> D5::response_create_in_band_reports_conversation_id
TestHandleResponseCancel (:723)
  cancel_active_response                      -> RS::response_cancel_sets_listening
  cancel_no_active_response                   -> D::cancel_without_active_response_is_safe
TestEncodeAudioChunk (:745)
  begin_audio_output_reserves_assistant_item_for_media_transports
                                              -> D5::begin_audio_output_reserves_identity_for_media_transports
  first_chunk_emits_response_created_and_delta-> D::first_audio_chunk_emits_created_then_delta_then_increments
  subsequent_chunks_increment_content_index   -> D::first_audio_chunk_emits_created_then_delta_then_increments
  response_created_includes_metadata          -> D::response_create_metadata_round_trips
TestFinishAudioResponse (:795)
  finish_emits_audio_done_and_response_done   -> RS::finish_response_terminal_event_order
  finish_text_only_skips_audio_done           -> D5::text_only_finish_skips_audio_done
  finish_with_cancel_status                   -> D::cancelled_response_emits_cancelled_status
  finish_resets_state                         -> D2::finish_resets_response_state
TestResponseDoneOutputItems (:843)
  output_includes_function_call_item          -> RS::tool_call_events_and_response_done_output
  function_call_only_response_skips_audio_done-> D5::function_call_only_response_skips_audio_done
  output_includes_assistant_audio_message     -> RS::response_done_output_ordering_with_tools_and_text
  output_includes_assistant_text_message      -> RS::response_done_output_ordering_with_tools_and_text
  output_empty_when_response_has_no_content   -> D::response_done_empty_output_when_no_content
  function_call_item_id_matches_its_arguments_done_event
                                              -> D5::function_call_item_id_matches_arguments_done_and_output
  every_output_item_has_a_distinct_id         -> D::response_done_output_items_have_distinct_ids
                                                 + D3::every_output_item_has_a_distinct_id
  output_indexes_match_final_items_across_pipeline_chunks
                                              -> D3::output_indexes_match_final_items_across_chunks
  output_order_is_preserved_when_tool_precedes_text
                                              -> D::tool_before_text_order_preserved_in_output
                                                 + D3::tool_preceding_text_keeps_emission_order
  audio_delta_reuses_known_assistant_output_identity
                                              -> D5::audio_first_identity_survives_tool_and_text_chunks
  audio_first_reserves_assistant_identity_across_tool_and_text_chunks
                                              -> D5::audio_first_identity_survives_tool_and_text_chunks
  cancelled_audio_keeps_reserved_assistant_output_item
                                              -> D5::cancelled_audio_keeps_reserved_assistant_output_item
  assistant_id_survives_non_interrupting_user_speech
                                              -> D2::assistant_identity_survives_non_interrupting_speech
  cancelled_response_preserves_completed_function_call
                                              -> D2::cancelled_response_preserves_completed_function_call
  cancelled_response_marks_unfinished_function_call_incomplete
                                              -> D2::cancelled_response_marks_unfinished_function_call_incomplete
TestDispatchPipelineEvent (:1198)
  speech_started_emits_event                  -> RS::speech_started_and_stopped_events
  speech_started_cancels_active_response      -> RS::speech_started_during_response_cancels_first
  speech_started_no_response_emits_only_started
                                              -> D::speech_started_without_response_emits_only_started
  speech_started_does_not_cancel_when_interrupt_disabled
                                              -> RS::interrupts_disabled_keeps_response
  speech_started_internal_non_interrupt_does_not_cancel
                                              -> D2::internal_speech_started_does_not_cancel_response
  consecutive_speech_cycles_get_distinct_item_ids
                                              -> D2::consecutive_speech_cycles_distinct_item_ids
                                                 + D3::consecutive_cycles_get_distinct_item_ids
  speech_stopped_emits_event                  -> RS::speech_started_and_stopped_events
  speech_stopped_same_item_id_as_started      -> D::speech_stopped_carries_item_identity_of_started
  speech_stopped_stores_duration              -> D2::speech_stopped_duration_stored_only_when_nonzero
  speech_stopped_zero_duration_not_stored     -> D2::speech_stopped_duration_stored_only_when_nonzero
                                                 + D3::duration_stored_and_phantom_zero_preserved
  assistant_text_emits_transcript_delta       -> RS::assistant_text_creates_response_and_transcript_delta
  audio_transcript_deltas_match_single_terminal_done
                                              -> D3::deltas_join_with_single_space_and_single_terminal_done
  audio_transcript_normalizes_chunk_whitespace_in_deltas_and_done
                                              -> D3::whitespace_chunks_are_normalized_out
  cancelled_audio_transcript_emits_single_terminal_done
                                              -> D3::non_completed_response_emits_terminal_done_with_incomplete_item
  non_completed_audio_transcript_emits_single_terminal_done
                                              -> D3::non_completed_response_emits_terminal_done_with_incomplete_item
  assistant_text_with_tools                   -> RS::tool_call_events_and_response_done_output
  assistant_text_tools_only                   -> D6::assistant_text_tools_only_emits_fc_done_at_index_zero
  assistant_text_text_only_emits_text_events  -> RS::text_only_response_streams_text_deltas
  text_only_done_concatenates_streamed_parts  -> D::text_only_done_concatenates_streamed_parts
  text_only_no_text_done_on_cancel            -> D::text_only_cancel_emits_no_text_done
  assistant_text_text_only_keeps_tool_events  -> D6::text_only_response_keeps_tool_events_at_index_one
  assistant_text_waits_for_pending_reopen_and_drops_confirmed_stale_turn
                                              -> D2::assistant_text_held_through_reopen_grace_then_dropped_if_superseded
  assistant_text_waits_for_pending_reopen_and_emits_cancelled_reopen
                                              -> D6::blocking_assistant_text_unblocks_on_cancelled_reopen
  token_usage_waits_for_pending_reopen_and_drops_confirmed_stale_turn
                                              -> D::token_usage_for_stale_revision_not_counted
                                                 + D6::blocking_token_usage_unblocks_on_cancelled_reopen
  try_dispatch_assistant_text_defers_pending_reopen
                                              -> D::try_dispatch_defers_assistant_text_during_pending_reopen
  try_dispatch_assistant_text_defers_reopen_grace
                                              -> D4::assistant_text_defers_while_reopen_pending
                                                 + R::send_loop_defers_assistant_text_during_reopen_grace
  try_dispatch_token_usage_defers_pending_reopen
                                              -> D2::token_usage_gated_by_turn_latestness
  partial_transcription_emits_delta           -> RS::partial_transcription_delta_event
  transcription_completed_emits_event         -> RS::transcription_completed_writes_chat_and_queues_llm
  audio_input_completed_marks_response_pending_and_preserves_duration
                                              -> D2::audio_input_completed_requests_generation_with_audio
  empty_transcription_completed_emits_event_without_response
                                              -> D3::empty_transcription_completed_emits_event_without_response
                                                 + RS::empty_transcript_no_llm_trigger
  revised_transcription_replaces_speculative_user_message
                                              -> RS::speculative_revision_replaces_user_message
  empty_revised_transcription_removes_speculative_user_message
                                              -> RS::empty_revision_transcript_removes_user_message
                                                 + D5::empty_revised_transcription_removes_speculative_user_message
  empty_first_revision_tracks_audio_for_later_nonempty_reopen
                                              -> D4::empty_first_revision_tracks_audio_for_later_nonempty_reopen
  stale_transcription_revision_is_ignored     -> D4::stale_transcription_revision_is_ignored
  stale_assistant_text_dropped_after_unanswered_reopen
                                              -> D5::stale_assistant_text_dropped_after_unanswered_reopen
  response_failed_emits_error_and_failed_done -> RS::response_failed_closes_as_failed
  response_failed_while_pending_emits_error_and_failed_done
                                              -> D6::response_failed_while_pending_announces_then_fails
  response_failed_without_active_response_is_noop
                                              -> RS::response_failed_noop_when_idle
  unknown_type_returns_empty                  -> D6::unknown_pipeline_event_type_returns_empty
TestMakeError (:2088)
  make_error                                  -> D2::make_error_shape_and_error_accounting
TestIdAndStateManagement (:2102)
  last_item_id_tracks_all_items               -> D6::last_item_id_tracks_speech_assistant_and_manual_items
  content_index_resets_on_new_item            -> D3::partial_deltas_increment_content_index_then_reset
TestInterruptResponseEnabled (:2154)
  default_true_when_no_turn_detection         -> RC::TestInterruptResponse (all four repo cases)
  true_when_server_vad_interrupt_true         -> RC::test_reenabled_by_later_update
  false_when_server_vad_interrupt_false       -> RC::test_false_when_explicitly_disabled
                                                 + RS::interrupts_disabled_keeps_response
  default_true_when_server_vad_interrupt_none -> RC::test_true_when_interrupt_unset
  reads_dict_turn_detection / dict_defaults_to_true
                                              -> N/A as distinct cases: the repo config is
                                                 dict-native (no openai-SDK typed variants), so
                                                 the dict cases ARE the four RC cases above
TestUsageMetricsTracking (:2205)
  token_usage_accumulates_in_conn_state       -> RS::token_usage_accumulates_and_rolls_up
  token_usage_accumulates_multiple            -> D4::usage_event_emits_no_client_events_and_accumulates
  token_usage_emits_no_events                 -> D4::usage_event_emits_no_client_events_and_accumulates
  response_done_reflects_token_usage          -> D::response_done_reflects_token_usage
                                                 + D4::response_done_reflects_accumulated_usage
  response_created_has_zero_tokens            -> D::response_created_reports_zero_tokens
  end_response_rolls_into_global              -> RS::token_usage_accumulates_and_rolls_up
  multiple_responses_accumulate_global        -> D6::multiple_responses_accumulate_global_counters
  unregister_rolls_partial_tokens_into_global -> D4::unregister_rolls_partial_tokens_into_global
  unregister_without_active_response_no_leak  -> D2::unregister_removes_state_and_rolls_usage
  finish_response_resets_per_response_tokens  -> D6::finish_response_resets_per_response_usage
  transcription_completed_accumulates_duration-> D::transcriptions_accumulate_audio_duration
  multiple_transcriptions_accumulate_duration -> D::transcriptions_accumulate_audio_duration
  end_response_rolls_duration_into_global     -> D6::duration_rolls_into_global_on_end_response_and_unregister
  unregister_rolls_duration_into_global       -> D6::duration_rolls_into_global_on_end_response_and_unregister
  responses_completed_increments              -> D::completed_and_cancelled_counters_roll_to_global
  responses_cancelled_increments              -> D::completed_and_cancelled_counters_roll_to_global
  multiple_responses_accumulate_status_counters
                                              -> D::completed_and_cancelled_counters_roll_to_global
                                                 + D6::multiple_responses_accumulate_global_counters
  tool_calls_increments                       -> D::tool_call_counter_rolls_to_global
  tool_calls_rolls_into_global                -> D::tool_call_counter_rolls_to_global
  connections_increments                      -> D2::connections_counter_increments
  turns_increments                            -> D2::turns_counter_increments_per_new_turn_not_reopen
  turns_rolls_into_global                     -> D2::turns_counter_increments_per_new_turn_not_reopen
  errors_by_type_increments                   -> D2::make_error_shape_and_error_accounting
  total_errors_in_get_usage                   -> D2::make_error_shape_and_error_accounting
  get_usage                                   -> D2::get_usage_totals_tokens
TestChatImageLifecycle (:2493)
  strip_images_removes_image_parts            -> CH(test_chat)::strip_images_respects_only_ids
                                                 + CH(matrix)::strip_images_all_users_and_noop_on_text
  strip_images_noop_on_text_only              -> CH(matrix)::strip_images_all_users_and_noop_on_text
  strip_then_new_image_cycle                  -> D6::chat_strip_then_new_image_cycle
TestChatToolCallTracking (:2559)
  add_item_registers_pending_tool_call        -> CH(test_chat)::fc_waits_in_pending_until_fco
  append_tool_output_clears_pending           -> CH(matrix)::tool_output_marks_fc_completed_by_default
  append_tool_output_reinjects_evicted_call   -> CH(test_chat)::fc_fco_pairing_reinjects_pending
  append_tool_output_rejects_unknown_call_id  -> CH(matrix)::tool_output_unknown_call_raises
                                                 + CH(spec)::unknown_fco_error_names_the_call_id
  copy_preserves_pending_tool_calls           -> CH(spec)::copy_pending_tool_calls_independent
  reset_clears_pending_tool_calls             -> CH(matrix)::reset_clears_state_preserves_size
  eviction_removes_complete_turn              -> CH(test_chat)::trim_if_needed_evicts_oldest_complete_turn
                                                 + CH(matrix)::eviction_removes_through_next_user_boundary
  eviction_preserves_size_user_turns          -> CH(matrix)::non_user_items_never_trigger_eviction
  pending_tool_calls_cleaned_after_reinjection-> CH(test_chat)::eviction_preserves_pending_fc_for_late_fco
                                                 + CH(spec)::reinjection_sets_status_from_fco

test_openai_client.py (live SDK over a real WS server, 16 cases)
  connect_receives_session_created            -> SDK::connect_receives_session_created
  session_update_applies_config               -> SDK::session_update_applies_config
  full_voice_turn                             -> SDK::full_voice_turn
  direct_audio_reopen_cancels_revision_zero_over_loopback
                                              -> test_whole_chain_speculation.py (reopen/adoption
                                                 over the live pipeline) + D4 reopen cases
  speech_interrupts_active_response           -> SDK::speech_interrupts_active_response
  stale_assistant_text_flushed_on_interruption-> R::send_loop_discards_stale_generation_audio
                                                 + R::send_loop_barge_in_flushes_output
  phantom_speech_does_not_block_pipeline      -> SDK::phantom_speech_does_not_block_pipeline
  interruption_resets_pipeline_state          -> E2E::response_cancel_mid_generation
                                                 + E2E::server_recovers_for_the_next_turn_after_a_failure
  tool_call_events                            -> SDK::tool_call_events
  multiple_tool_calls_output_index            -> D3::output_indexes_match_final_items_across_chunks
                                                 (unit-level; indexes pinned per-call)
  send_conversation_item_create               -> SDK::text_input_turn
  text_input_previous_item_id_chain           -> D2::item_created_chains_previous_item_id
                                                 + D6::last_item_id_tracks_speech_assistant_and_manual_items
  unknown_event_returns_error                 -> SDK::unknown_event_returns_error
  duplicate_response_create_error             -> D::double_response_create_rejected (unit)
  cancel_active_response                      -> SDK::cancel_active_response
  two_turns_same_conversation                 -> SDK::two_turns_same_conversation
"""

import base64
from queue import Queue
from threading import Event

import numpy as np
import pytest

from s2s_tpu.pipeline.events import (
    AssistantTextEvent,
    PartialTranscriptionEvent,
    ResponseFailedEvent,
    SpeechStartedEvent,
    SpeechStoppedEvent,
    TokenUsageEvent,
    TranscriptionCompletedEvent,
)
from s2s_tpu.pipeline.messages import GenerateResponseRequest
from s2s_tpu.pipeline.turns import SpeculativeTurnTracker
from s2s_tpu.realtime.service import RealtimeService
from s2s_tpu.realtime.types import FunctionToolCall


@pytest.fixture
def svc():
    service = RealtimeService(
        text_prompt_queue=Queue(),
        should_listen=Event(),
        chat_size=10,
        speculative_turns=SpeculativeTurnTracker(),
        default_instructions="You are helpful.",
    )
    conn = service.register()
    return service, conn


def types(events):
    return [e["type"] for e in events]


# ── session ──────────────────────────────────────────────────────────


def test_session_created_carries_config(svc):
    service, conn = svc
    evt = service.build_session_created(conn)
    assert evt["type"] == "session.created"
    assert evt["session"]["id"] == conn
    assert evt["session"]["instructions"] == "You are helpful."


def test_session_update_merges(svc):
    service, conn = svc
    err = service.handle_session_update(conn, {"type": "realtime", "instructions": "Be brief."})
    assert err is None
    assert service._state(conn).runtime_config.session.instructions == "Be brief."
    # unrelated fields preserved through a partial nested update
    service.handle_session_update(conn, {"audio": {"output": {"voice": "serena"}}})
    st = service._state(conn)
    assert st.runtime_config.session.audio.output.voice == "serena"
    assert st.runtime_config.session.instructions == "Be brief."


def test_transcription_session_rejected(svc):
    service, conn = svc
    err = service.handle_session_update(conn, {"type": "transcription"})
    assert err is not None and err["type"] == "error"


# ── audio ingress ────────────────────────────────────────────────────


def test_audio_append_chunks_and_remainder(svc):
    service, conn = svc
    pcm = np.zeros(700, np.int16).tobytes()
    chunks = service.handle_audio_append(conn, base64.b64encode(pcm).decode())
    assert len(chunks) == 1 and len(chunks[0]) == 1024
    assert len(service._state(conn).mic.remainder) == (700 - 512) * 2
    # next append completes the chunk
    chunks = service.handle_audio_append(conn, base64.b64encode(np.zeros(324, np.int16).tobytes()).decode())
    assert len(chunks) == 1


def test_audio_commit_empty_errors(svc):
    service, conn = svc
    err = service.handle_audio_commit(conn)
    assert err["error"]["type"] == "input_audio_buffer_commit_empty"
    service.handle_audio_append(conn, base64.b64encode(np.zeros(512, np.int16).tobytes()).decode())
    assert service.handle_audio_commit(conn) is None


# ── voice turn: speech events + STT bridge ───────────────────────────


def test_speech_started_and_stopped_events(svc):
    service, conn = svc
    events = service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
    assert types(events) == ["input_audio_buffer.speech_started"]
    item_id = events[0]["item_id"]
    events = service.dispatch_pipeline_event(
        conn, SpeechStoppedEvent(duration_s=1.5, turn_id="t1", turn_revision=0)
    )
    assert types(events) == ["input_audio_buffer.speech_stopped"]
    assert events[0]["item_id"] == item_id


def test_transcription_completed_writes_chat_and_queues_llm(svc):
    service, conn = svc
    service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
    events = service.dispatch_pipeline_event(
        conn,
        TranscriptionCompletedEvent(transcript="hello world", turn_id="t1", turn_revision=0),
    )
    assert "conversation.item.input_audio_transcription.completed" in types(events)
    st = service._state(conn)
    chat = st.runtime_config.chat
    assert chat.user_turn_count == 1
    assert st.rsp.pending
    req = service.text_prompt_queue.get_nowait()
    assert isinstance(req, GenerateResponseRequest) and req.turn_id == "t1"


def test_speculative_revision_replaces_user_message(svc):
    service, conn = svc
    service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
    service.dispatch_pipeline_event(
        conn, TranscriptionCompletedEvent(transcript="hello", turn_id="t1", turn_revision=0)
    )
    # the VAD bumps the tracker (reopen confirm) before STT re-transcribes
    service.speculative_turns.observe("t1", 1)
    service.dispatch_pipeline_event(
        conn, TranscriptionCompletedEvent(transcript="hello there friend", turn_id="t1", turn_revision=1)
    )
    chat = service._state(conn).runtime_config.chat
    assert chat.user_turn_count == 1  # replaced in place, not appended
    assert chat.buffer[0].content[0].text == "hello there friend"


def test_empty_revision_transcript_removes_user_message(svc):
    service, conn = svc
    service.dispatch_pipeline_event(
        conn, TranscriptionCompletedEvent(transcript="zzz", turn_id="t1", turn_revision=0)
    )
    service.speculative_turns.observe("t1", 1)
    service.dispatch_pipeline_event(
        conn, TranscriptionCompletedEvent(transcript="", turn_id="t1", turn_revision=1)
    )
    assert service._state(conn).runtime_config.chat.user_turn_count == 0


def test_partial_transcription_delta_event(svc):
    service, conn = svc
    events = service.dispatch_pipeline_event(
        conn, PartialTranscriptionEvent(delta="hel", turn_id="t1", turn_revision=0)
    )
    assert types(events) == ["conversation.item.input_audio_transcription.delta"]
    assert events[0]["delta"] == "hel"


def test_stale_turn_events_ignored(svc):
    service, conn = svc
    service.speculative_turns.observe("t1", 2)
    events = service.dispatch_pipeline_event(
        conn, TranscriptionCompletedEvent(transcript="old", turn_id="t1", turn_revision=0)
    )
    assert events == []
    assert service.text_prompt_queue.empty()


# ── assistant output / response lifecycle ────────────────────────────


def drive_voice_response(service, conn, text="Hi there."):
    service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
    service.dispatch_pipeline_event(
        conn, TranscriptionCompletedEvent(transcript="hello", turn_id="t1", turn_revision=0)
    )
    service.text_prompt_queue.get_nowait()
    events = service.dispatch_pipeline_event(
        conn, AssistantTextEvent(text=text, turn_id="t1", turn_revision=0)
    )
    return events


def test_assistant_text_creates_response_and_transcript_delta(svc):
    service, conn = svc
    events = drive_voice_response(service, conn)
    assert types(events) == ["response.output_audio_transcript.delta"]
    st = service._state(conn)
    assert st.rsp.active and st.rsp.id


def test_finish_response_terminal_event_order(svc):
    service, conn = svc
    drive_voice_response(service, conn, "First bit.")
    service.dispatch_pipeline_event(
        conn, AssistantTextEvent(text="Second bit.", turn_id="t1", turn_revision=0)
    )
    events = service.finish_response(conn)
    assert types(events) == [
        "response.output_audio.done",
        "response.output_audio_transcript.done",
        "response.done",
    ]
    assert events[1]["transcript"] == "First bit. Second bit."
    done = events[2]["response"]
    assert done["status"] == "completed"
    output = done["output"]
    assert output[0]["role"] == "assistant"
    assert output[0]["content"][0] == {"type": "output_audio", "transcript": "First bit. Second bit."}
    assert not service._state(conn).rsp.active


def test_audio_encode_implicit_response_created(svc):
    service, conn = svc
    drive_voice_response(service, conn)
    # reset current_response_id to simulate implicit path
    service._state(conn).rsp.id = None
    events = service.encode_audio_chunk(conn, b"\x00\x00" * 512)
    assert types(events) == ["response.created", "response.output_audio.delta"]
    assert base64.b64decode(events[1]["delta"]) == b"\x00\x00" * 512


def test_tool_call_events_and_response_done_output(svc):
    service, conn = svc
    service.dispatch_pipeline_event(
        conn,
        AssistantTextEvent(
            text="Checking.",
            tools=[FunctionToolCall(call_id="call_1", name="get_time", arguments="{}")],
            turn_id=None,
            turn_revision=None,
        ),
    )
    events = service.finish_response(conn)
    done = [e for e in events if e["type"] == "response.done"][0]
    out_types = [o["type"] for o in done["response"]["output"]]
    assert "function_call" in out_types and "message" in out_types


def test_response_create_explicit(svc):
    service, conn = svc
    evt = service.handle_response_create(conn, None)
    assert evt["type"] == "response.created"
    assert evt["response"]["status"] == "in_progress"
    req = service.text_prompt_queue.get_nowait()
    assert isinstance(req, GenerateResponseRequest)
    # second create while active errors
    err = service.handle_response_create(conn, None)
    assert err["type"] == "error"


def test_response_create_out_of_band_null_conversation(svc):
    service, conn = svc
    evt = service.handle_response_create(conn, {"conversation": "none", "input": []})
    assert evt["response"]["conversation_id"] is None
    req = service.text_prompt_queue.get_nowait()
    assert req.turn_id is None  # out-of-band carries no turn identity


def test_response_create_rejects_object_tool_choice(svc):
    service, conn = svc
    err = service.handle_response_create(conn, {"tool_choice": {"type": "function", "name": "f"}})
    assert err["type"] == "error"


def test_response_cancel_sets_listening(svc):
    service, conn = svc
    service.handle_response_create(conn, None)
    events = service.handle_response_cancel(conn)
    done = [e for e in events if e["type"] == "response.done"][0]
    assert done["response"]["status"] == "cancelled"
    assert service.should_listen.is_set()


def test_text_only_response_streams_text_deltas(svc):
    service, conn = svc
    service.handle_response_create(conn, {"output_modalities": ["text"]})
    events = service.dispatch_pipeline_event(
        conn, AssistantTextEvent(text="# Markdown\n", turn_id=None, turn_revision=None)
    )
    assert types(events) == ["response.output_text.delta"]
    finish = service.finish_response(conn)
    assert types(finish) == ["response.output_text.done", "response.done"]
    assert finish[0]["text"] == "# Markdown\n"


# ── conversation items ───────────────────────────────────────────────


def test_conversation_item_create_and_deferral(svc):
    service, conn = svc
    events = service.handle_conversation_item_create(
        conn, {"type": "message", "role": "user", "content": [{"type": "input_text", "text": "hi"}]}
    )
    assert types(events) == ["conversation.item.created"]
    # during a response: deferred
    service.handle_response_create(conn, None)
    deferred = service.handle_conversation_item_create(
        conn, {"type": "message", "role": "user", "content": [{"type": "input_text", "text": "later"}]}
    )
    assert deferred == []
    assert len(service._state(conn).deferred_items) == 1
    finish = service.finish_response(conn)
    assert "conversation.item.created" in types(finish)  # flushed at close
    assert service._state(conn).runtime_config.chat.user_turn_count == 2


def test_invalid_conversation_item_error(svc):
    service, conn = svc
    events = service.handle_conversation_item_create(
        conn, {"type": "function_call", "name": "f", "arguments": "{}"}  # missing call_id
    )
    assert events[0]["type"] == "error"


# ── failures / usage ─────────────────────────────────────────────────


def test_response_failed_closes_as_failed(svc):
    service, conn = svc
    service.handle_response_create(conn, None)
    events = service.dispatch_pipeline_event(
        conn, ResponseFailedEvent(message="backend exploded", turn_id=None, turn_revision=None)
    )
    assert "error" in types(events)
    done = [e for e in events if e["type"] == "response.done"][0]
    assert done["response"]["status"] == "failed"


def test_response_failed_noop_when_idle(svc):
    service, conn = svc
    assert service.dispatch_pipeline_event(conn, ResponseFailedEvent(message="x")) == []


def test_token_usage_accumulates_and_rolls_up(svc):
    service, conn = svc
    service.dispatch_pipeline_event(conn, TokenUsageEvent(input_tokens=10, output_tokens=5))
    st = service._state(conn)
    assert st.usage.input_tokens == 10
    service.handle_response_create(conn, None)
    service.finish_response(conn)
    usage = service.get_usage()
    assert usage["input_tokens"] == 10 and usage["total_tokens"] == 15
    assert usage["responses_completed"] == 1


def test_unregister_rolls_connection_usage(svc):
    service, conn = svc
    service.dispatch_pipeline_event(conn, TokenUsageEvent(input_tokens=3, output_tokens=4))
    service.unregister(conn)
    assert service.get_usage()["total_tokens"] == 7
    assert conn not in service.connection_ids


# ── barge-in ─────────────────────────────────────────────────────────


def test_speech_started_during_response_cancels_first(svc):
    service, conn = svc
    drive_voice_response(service, conn)
    events = service.dispatch_pipeline_event(
        conn, SpeechStartedEvent(turn_id="t2", turn_revision=0, interrupt_response=True)
    )
    ts = types(events)
    # terminal events precede speech_started on the wire
    assert ts[-1] == "input_audio_buffer.speech_started"
    done = [e for e in events if e["type"] == "response.done"][0]
    assert done["response"]["status"] == "cancelled"
    assert done["response"]["status_details"]["reason"] == "turn_detected"


def test_reopen_reuses_input_item(svc):
    service, conn = svc
    e1 = service.dispatch_pipeline_event(conn, SpeechStartedEvent(turn_id="t1", turn_revision=0))
    item1 = e1[-1]["item_id"]
    service.dispatch_pipeline_event(conn, SpeechStoppedEvent(turn_id="t1", turn_revision=0))
    e2 = service.dispatch_pipeline_event(
        conn, SpeechStartedEvent(turn_id="t1", turn_revision=1, reopened=True)
    )
    assert e2[-1]["item_id"] == item1  # same protocol item across the reopen


def test_empty_transcript_no_llm_trigger(svc):
    service, conn = svc
    events = service.dispatch_pipeline_event(
        conn, TranscriptionCompletedEvent(transcript="", turn_id="t9", turn_revision=0)
    )
    assert "conversation.item.input_audio_transcription.completed" in types(events)
    assert service.text_prompt_queue.empty()  # empty finals never trigger the LLM
    assert service._state(conn).runtime_config.chat.user_turn_count == 0


def test_response_done_output_ordering_with_tools_and_text(svc):
    service, conn = svc
    service.dispatch_pipeline_event(
        conn,
        AssistantTextEvent(
            tools=[FunctionToolCall(call_id="call_a", name="f1", arguments="{}")], text=""
        ),
    )
    service.dispatch_pipeline_event(conn, AssistantTextEvent(text="Spoken words."))
    service.dispatch_pipeline_event(
        conn,
        AssistantTextEvent(
            tools=[FunctionToolCall(call_id="call_b", name="f2", arguments="{}")], text=""
        ),
    )
    done = [e for e in service.finish_response(conn) if e["type"] == "response.done"][0]
    output = done["response"]["output"]
    kinds = [(o["type"], o.get("name") or o.get("role")) for o in output]
    # streaming order preserved: f1, assistant message, f2
    assert kinds == [("function_call", "f1"), ("message", "assistant"), ("function_call", "f2")]


def test_response_create_with_inband_input_items(svc):
    service, conn = svc
    evt = service.handle_response_create(
        conn,
        {
            "input": [
                {"type": "message", "role": "user",
                 "content": [{"type": "input_text", "text": "from input"}]}
            ]
        },
    )
    assert evt["type"] == "response.created"
    chat = service._state(conn).runtime_config.chat
    assert chat.user_turn_count == 1  # in-band input lands in history
    assert chat.buffer[0].content[0].text == "from input"


def test_interrupts_disabled_keeps_response(svc):
    service, conn = svc
    service.handle_session_update(
        conn,
        {"audio": {"input": {"turn_detection": {"type": "server_vad", "interrupt_response": False}}}},
    )
    assert not service._state(conn).runtime_config.interrupt_response_enabled
    service.handle_response_create(conn, None)
    events = service.dispatch_pipeline_event(
        conn, SpeechStartedEvent(turn_id="t2", turn_revision=0, interrupt_response=True)
    )
    # no cancellation: the active response survives the speech start
    assert "response.done" not in types(events)
    assert service._state(conn).rsp.active


# ── speculative prefill bridge (partial transcript -> LLM engine) ────


def _spec_svc():
    service = RealtimeService(
        text_prompt_queue=Queue(),
        should_listen=Event(),
        chat_size=10,
        speculative_turns=SpeculativeTurnTracker(),
        speculative_prefill=True,
    )
    return service, service.register()


def test_partial_emits_speculative_request_when_enabled():
    from s2s_tpu.pipeline.messages import SpeculativeGenerateRequest

    service, conn = _spec_svc()
    events = service.dispatch_pipeline_event(
        conn, PartialTranscriptionEvent(delta="hello wor", turn_id="t1", turn_revision=0)
    )
    assert [e["type"] for e in events] == ["conversation.item.input_audio_transcription.delta"]
    req = service.text_prompt_queue.get_nowait()
    assert isinstance(req, SpeculativeGenerateRequest)
    assert req.text == "hello wor" and req.turn_id == "t1" and req.turn_revision == 0
    assert req.runtime_config is service._state(conn).runtime_config


def test_partial_not_speculated_by_default(svc):
    service, conn = svc  # default fixture: speculative_prefill off
    service.dispatch_pipeline_event(
        conn, PartialTranscriptionEvent(delta="hello", turn_id="t1", turn_revision=0)
    )
    assert service.text_prompt_queue.empty()


def test_partial_not_speculated_during_active_response():
    service, conn = _spec_svc()
    service.begin_audio_response(conn)  # response active: engine is busy
    service.dispatch_pipeline_event(
        conn, PartialTranscriptionEvent(delta="barge in", turn_id="t2", turn_revision=0)
    )
    assert service.text_prompt_queue.empty()
