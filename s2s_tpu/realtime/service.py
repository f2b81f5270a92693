"""Realtime protocol service: client/pipeline event translation.

Parity with reference ``api/openai_realtime/service.py``: per-connection
``ConnState`` (protocol ids, response lifecycle flags, audio remainder,
speculative bookkeeping, deferred items), the pipeline-event dispatch table
with blocking + non-blocking (``try_``) staleness gates for the async send
loop, the **STT -> LLM bridge** (chat add/replace/remove by speculative
revision, then ``GenerateResponseRequest``), the direct-audio bridge, and
usage metrics rolled per-response -> per-connection -> global.
"""

from __future__ import annotations

import logging
from queue import Queue
from threading import Event as ThreadingEvent
from typing import Any, Callable, Optional

from pydantic import BaseModel, ConfigDict, Field

from s2s_tpu.llm.chat import Chat, make_user_message
from s2s_tpu.pipeline.events import (
    AssistantTextEvent,
    AudioInputCompletedEvent,
    PartialTranscriptionEvent,
    PipelineEvent,
    ResponseFailedEvent,
    SpeechStartedEvent,
    SpeechStoppedEvent,
    TokenUsageEvent,
    TranscriptionCompletedEvent,
)
from s2s_tpu.pipeline.messages import GenerateResponseRequest
from s2s_tpu.pipeline.turns import SpeculativeTurnTracker
from s2s_tpu.realtime.config import RuntimeConfig
from s2s_tpu.realtime.handlers import (
    AudioHandler,
    ConversationHandler,
    ResponseHandler,
    ServerEvent,
    SessionHandler,
)
from s2s_tpu.realtime.types import (
    ConversationItem,
    FunctionCallItem,
    ResponseCreateParams,
    SessionConfig,
    generate_id,
    parse_item,
)

logger = logging.getLogger(__name__)

PIPELINE_SAMPLE_RATE = 16_000
CHUNK_SAMPLES = 512
CHUNK_SIZE_BYTES = CHUNK_SAMPLES * 2

CLIENT_EVENT_TYPES = {
    "input_audio_buffer.append",
    "input_audio_buffer.commit",
    "output_audio_buffer.clear",
    "session.update",
    "conversation.item.create",
    "response.create",
    "response.cancel",
}


class UsageMetrics(BaseModel):
    """Per-response usage counters with rollup + reset."""

    input_tokens: int = 0
    output_tokens: int = 0
    audio_duration_s: float = 0.0
    responses_completed: int = 0
    responses_cancelled: int = 0
    tool_calls: int = 0
    turns: int = 0

    def merge(self, other: "UsageMetrics") -> None:
        for name in UsageMetrics.model_fields:
            setattr(self, name, getattr(self, name) + getattr(other, name))

    def reset(self) -> None:
        for name, info in UsageMetrics.model_fields.items():
            setattr(self, name, info.default)


class GlobalUsageMetrics(UsageMetrics):
    connections: int = 0
    errors_by_type: dict[str, int] = Field(default_factory=dict)

    def record_error(self, error_type: str) -> None:
        self.errors_by_type[error_type] = self.errors_by_type.get(error_type, 0) + 1

    @property
    def total_errors(self) -> int:
        return sum(self.errors_by_type.values())


class ConnState(BaseModel):
    """Per-connection protocol state."""

    model_config = ConfigDict(arbitrary_types_allowed=True)

    session_id: str = Field(default_factory=lambda: generate_id("session"))
    conversation_id: str = Field(default_factory=lambda: generate_id("conv"))
    runtime_config: RuntimeConfig = Field(default_factory=RuntimeConfig)
    in_response: bool = False
    response_pending: bool = False
    audio_buffer_has_data: bool = False
    audio_remainder: bytes = b""
    current_response_id: Optional[str] = None
    current_item_id: Optional[str] = None
    content_index: int = 0
    input_content_index: int = 0
    input_audio_duration_s: float = 0.0
    last_item_id: Optional[str] = None
    current_response_params: ResponseCreateParams | None = None
    pending_output_text_parts: list[str] = Field(default_factory=list)
    pending_assistant_item_id: Optional[str] = None
    pending_assistant_output_index: Optional[int] = None
    pending_function_calls: list[FunctionCallItem] = Field(default_factory=list)
    response_usage: UsageMetrics = Field(default_factory=UsageMetrics)
    speculative_turn_id: Optional[str] = None
    speculative_turn_revision: Optional[int] = None
    speculative_user_turn_id: Optional[str] = None
    speculative_user_turn_revision: Optional[int] = None
    speculative_user_speech_stopped_at_s: Optional[float] = None
    speculative_user_item_id: Optional[str] = None
    speculative_input_item_id: Optional[str] = None
    speculative_audio_duration_s: float = 0.0
    # conversation.item.create arrivals buffered during a response (applying
    # mid-generation races the LLM write-back thread); flushed at close.
    deferred_items: list[ConversationItem] = Field(default_factory=list)


class RealtimeService:
    """One per PipelineUnit; serves whichever connection claims the unit."""

    def __init__(
        self,
        text_prompt_queue: "Queue[Any] | None" = None,
        should_listen: ThreadingEvent | None = None,
        chat_size: int = 10,
        speculative_turns: SpeculativeTurnTracker | None = None,
        default_instructions: str | None = None,
    ) -> None:
        self.text_prompt_queue = text_prompt_queue
        self.should_listen = should_listen
        self._chat_size = chat_size
        self.speculative_turns = speculative_turns
        self._default_instructions = default_instructions
        self._conns: dict[str, ConnState] = {}
        self.total_usage = GlobalUsageMetrics()

        self.audio = AudioHandler(self)
        self.session = SessionHandler(self)
        self.response = ResponseHandler(self)
        self.conversation = ConversationHandler(self)

        self._pipeline_dispatch: dict[type, Callable[..., list[ServerEvent]]] = {
            SpeechStartedEvent: self.audio.on_speech_started,
            SpeechStoppedEvent: self.audio.on_speech_stopped,
            TokenUsageEvent: self._on_token_usage,
            PartialTranscriptionEvent: self.conversation.on_partial_transcription,
            TranscriptionCompletedEvent: self._on_transcription_completed,
            AudioInputCompletedEvent: self._on_audio_input_completed,
            ResponseFailedEvent: self._on_response_failed,
        }

    # ── connection lifecycle ─────────────────────────────────────────

    def register(self) -> str:
        if self.speculative_turns:
            self.speculative_turns.reset()
        state = ConnState(
            runtime_config=RuntimeConfig(
                chat=Chat(self._chat_size),
                session=SessionConfig(type="realtime", instructions=self._default_instructions),
            )
        )
        self._conns[state.session_id] = state
        self.total_usage.connections += 1
        return state.session_id

    def unregister(self, conn_id: str) -> None:
        st = self._conns.pop(conn_id, None)
        if st is not None:
            # Void in-flight compaction so a daemon worker can't mutate a
            # closed session's chat (or bill LLM calls for it).
            st.runtime_config.chat.close()
            self.total_usage.merge(st.response_usage)
            logger.info("Session %s unregistered", conn_id)

    def _state(self, conn_id: str) -> ConnState:
        return self._conns[conn_id]

    @property
    def connection_ids(self) -> list[str]:
        return list(self._conns)

    # ── client events ────────────────────────────────────────────────

    def parse_client_event(self, raw: dict[str, Any]) -> Optional[dict[str, Any]]:
        event_type = raw.get("type")
        if not isinstance(event_type, str):
            logger.warning("Client event missing 'type'")
            return None
        if event_type not in CLIENT_EVENT_TYPES:
            logger.warning("Unknown client event type: %s", event_type)
            return None
        return raw

    def build_session_created(self, conn_id: str) -> ServerEvent:
        return self.session.build_session_created(conn_id)

    def build_session_updated(self, conn_id: str) -> ServerEvent:
        return self.session.build_session_updated(conn_id)

    def handle_session_update(self, conn_id: str, session: dict[str, Any] | None) -> Optional[ServerEvent]:
        return self.session.handle_session_update(conn_id, session)

    def handle_audio_append(self, conn_id: str, audio_b64: str) -> list[bytes]:
        return self.audio.handle_audio_append(conn_id, audio_b64)

    def append_pcm(self, conn_id: str, pcm_bytes: bytes, src_rate: int) -> list[bytes]:
        return self.audio.append_pcm(conn_id, pcm_bytes, src_rate)

    def handle_audio_commit(self, conn_id: str) -> Optional[ServerEvent]:
        return self.audio.handle_audio_commit(conn_id)

    def begin_audio_response(self, conn_id: str):
        return self.audio.begin_audio_response(conn_id)

    def begin_audio_output(self, conn_id: str):
        return self.audio.begin_audio_output(conn_id)

    def encode_audio_chunk(self, conn_id: str, audio: bytes) -> list[ServerEvent]:
        return self.audio.encode_audio_chunk(conn_id, audio)

    def handle_response_create(self, conn_id: str, response: dict[str, Any] | None) -> ServerEvent | None:
        return self.response.handle_response_create(conn_id, response)

    def handle_response_cancel(self, conn_id: str) -> list[ServerEvent]:
        return self.response.handle_response_cancel(conn_id)

    def finish_response(self, conn_id: str, status: str = "completed", reason: str | None = None):
        return self.response.finish_response(conn_id, status, reason)

    def handle_conversation_item_create(self, conn_id: str, item_raw: dict[str, Any]) -> list[ServerEvent]:
        item = parse_item(item_raw)
        return self.conversation.handle_conversation_item_create(conn_id, item)

    # ── pipeline event dispatch ──────────────────────────────────────

    def dispatch_pipeline_event(self, conn_id: str, event: PipelineEvent) -> list[ServerEvent]:
        events = self._dispatch(conn_id, event, wait_for_pending_reopen=True)
        return [] if events is None else events

    def try_dispatch_pipeline_event(self, conn_id: str, event: PipelineEvent) -> list[ServerEvent] | None:
        """Non-blocking for the send loop: ``None`` => retry after the pending
        reopen resolves."""
        return self._dispatch(conn_id, event, wait_for_pending_reopen=False)

    def should_defer_pipeline_event(self, event: PipelineEvent) -> bool:
        if self.speculative_turns is None or not isinstance(event, (AssistantTextEvent, TokenUsageEvent)):
            return False
        return self.speculative_turns.has_pending_reopen_or_grace(
            getattr(event, "turn_id", None), getattr(event, "turn_revision", None)
        )

    def _dispatch(
        self, conn_id: str, event: PipelineEvent, *, wait_for_pending_reopen: bool
    ) -> list[ServerEvent] | None:
        stale = self._is_stale(event, wait_for_pending_reopen=wait_for_pending_reopen)
        if stale is None:
            return None
        if stale:
            logger.info(
                "Ignoring stale %s for turn=%s rev=%s",
                event.type, getattr(event, "turn_id", None), getattr(event, "turn_revision", None),
            )
            return []
        if self.speculative_turns is not None:
            self.speculative_turns.observe(
                getattr(event, "turn_id", None), getattr(event, "turn_revision", None)
            )
        if isinstance(event, AssistantTextEvent):
            return self.response.on_assistant_text(
                conn_id, event, wait_for_pending_reopen=wait_for_pending_reopen
            )
        handler = self._pipeline_dispatch.get(type(event))
        if handler is None:
            logger.debug("Unhandled pipeline event type: %s", type(event).__name__)
            return []
        return handler(conn_id, event)

    def _is_stale(self, event: PipelineEvent, *, wait_for_pending_reopen: bool) -> bool | None:
        if self.speculative_turns is None:
            return False
        if not isinstance(
            event,
            (
                PartialTranscriptionEvent,
                TranscriptionCompletedEvent,
                AudioInputCompletedEvent,
                AssistantTextEvent,
                TokenUsageEvent,
            ),
        ):
            return False
        turn_id = getattr(event, "turn_id", None)
        revision = getattr(event, "turn_revision", None)
        if isinstance(event, (AssistantTextEvent, TokenUsageEvent)):
            if wait_for_pending_reopen:
                latest: bool | None = self.speculative_turns.is_latest_after_reopen_grace(turn_id, revision)
            else:
                latest = self.speculative_turns.try_is_latest_after_reopen_grace(turn_id, revision)
            if latest is None:
                return None
            return not latest
        return not self.speculative_turns.is_latest(turn_id, revision)

    # ── STT -> LLM bridge ────────────────────────────────────────────

    def _on_transcription_completed(self, conn_id: str, event: TranscriptionCompletedEvent) -> list[ServerEvent]:
        """Final transcription: protocol event, chat write (revision-aware
        replace/remove), LLM request."""
        st = self._state(conn_id)
        same_turn = event.turn_id is not None and event.turn_id == st.speculative_user_turn_id
        if same_turn:
            st.response_usage.audio_duration_s -= st.speculative_audio_duration_s
        else:
            st.speculative_audio_duration_s = 0.0

        events = self.conversation.on_transcription_completed(conn_id, event)
        if event.turn_id is not None:
            st.speculative_audio_duration_s = st.input_audio_duration_s

        cfg = st.runtime_config
        transcript = event.transcript
        if transcript:
            if same_turn and st.speculative_user_item_id:
                if not cfg.chat.replace_user_message_text(st.speculative_user_item_id, transcript):
                    item = cfg.chat.add_item(make_user_message(transcript))
                    st.speculative_user_item_id = item.id
            else:
                item = cfg.chat.add_item(make_user_message(transcript))
                st.speculative_user_item_id = item.id
        elif same_turn and st.speculative_user_item_id:
            cfg.chat.remove_user_message(st.speculative_user_item_id)
            st.speculative_user_item_id = None
        elif event.turn_id is not None and event.turn_id != st.speculative_user_turn_id:
            st.speculative_user_item_id = None

        if event.turn_id is not None:
            st.speculative_user_turn_id = event.turn_id
            st.speculative_user_turn_revision = event.turn_revision
            st.speculative_user_speech_stopped_at_s = event.speech_stopped_at_s

        if self.text_prompt_queue and transcript:
            st.response_pending = True
            self.text_prompt_queue.put(
                GenerateResponseRequest(
                    runtime_config=cfg,
                    language_code=event.language_code,
                    turn_id=event.turn_id,
                    turn_revision=event.turn_revision,
                    speech_stopped_at_s=event.speech_stopped_at_s,
                )
            )
        return events

    def _on_audio_input_completed(self, conn_id: str, event: AudioInputCompletedEvent) -> list[ServerEvent]:
        st = self._state(conn_id)
        same_turn = event.turn_id is not None and event.turn_id == st.speculative_user_turn_id
        if same_turn:
            st.response_usage.audio_duration_s -= st.speculative_audio_duration_s
        else:
            st.speculative_audio_duration_s = 0.0
        st.input_audio_duration_s = event.audio_duration_s
        st.response_usage.audio_duration_s += event.audio_duration_s
        if event.turn_id is not None:
            st.speculative_audio_duration_s = event.audio_duration_s
            st.speculative_user_turn_id = event.turn_id
            st.speculative_user_turn_revision = event.turn_revision
            st.speculative_user_speech_stopped_at_s = event.speech_stopped_at_s
        if self.text_prompt_queue:
            st.response_pending = True
            self.text_prompt_queue.put(
                GenerateResponseRequest(
                    runtime_config=st.runtime_config,
                    audio=event.audio,
                    audio_sample_rate=event.audio_sample_rate,
                    turn_id=event.turn_id,
                    turn_revision=event.turn_revision,
                    speech_stopped_at_s=event.speech_stopped_at_s,
                )
            )
        return []

    # ── metrics / errors ─────────────────────────────────────────────

    def _on_token_usage(self, conn_id: str, event: TokenUsageEvent) -> list[ServerEvent]:
        if self.speculative_turns and not self.speculative_turns.is_latest(
            event.turn_id, event.turn_revision
        ):
            return []
        st = self._state(conn_id)
        st.response_usage.input_tokens += event.input_tokens
        st.response_usage.output_tokens += event.output_tokens
        return []

    def _on_response_failed(self, conn_id: str, event: ResponseFailedEvent) -> list[ServerEvent]:
        """Close the response as failed: error event (carrying the message —
        response.done.status_details has no message field) + terminal events.
        Idempotent; pending implicit responses are announced first."""
        logger.info("Response failed: %s", event.message)
        st = self._state(conn_id)
        if not (st.in_response or st.response_pending):
            return []
        events: list[ServerEvent] = []
        if st.response_pending:
            _, _, created = self.audio.begin_audio_response(conn_id)
            events.extend(created)
        events.append(self.make_error(event.message, "response_failed"))
        events.extend(self.response.finish_response(conn_id, status="failed"))
        return events

    def get_usage(self) -> dict[str, Any]:
        data = self.total_usage.model_dump()
        data["total_tokens"] = data["input_tokens"] + data["output_tokens"]
        data["total_errors"] = self.total_usage.total_errors
        return data

    def make_error(self, message: str, _type: str) -> ServerEvent:
        self.total_usage.record_error(_type)
        return build_error_event(message, _type)


def build_error_event(message: str, error_type: str) -> ServerEvent:
    """Error event without charging any unit's metrics (pool rejection path)."""
    return {
        "type": "error",
        "event_id": generate_id("event"),
        "error": {"type": error_type, "message": message},
    }
