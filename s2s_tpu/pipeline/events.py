"""Side-channel pipeline events (the ``text_output_queue`` of the reference).

Produced by VAD / transcription notifier / LM output processor; consumed by
the realtime send loop which maps them onto OpenAI Realtime wire events
(reference ``pipeline/events.py``).
"""

from __future__ import annotations

from typing import Literal, Optional

import numpy as np
from pydantic import BaseModel, ConfigDict, Field

from s2s_tpu.realtime.types import FunctionToolCall


class PipelineEvent(BaseModel):
    type: str


class SpeechStartedEvent(PipelineEvent):
    type: Literal["speech_started"] = "speech_started"
    audio_start_ms: int = 0
    turn_id: str | None = None
    turn_revision: int | None = None
    reopened: bool = False
    interrupt_response: bool = Field(default=True, exclude=True)


class SpeechStoppedEvent(PipelineEvent):
    type: Literal["speech_stopped"] = "speech_stopped"
    duration_s: float = 0.0
    audio_end_ms: int = 0
    turn_id: str | None = None
    turn_revision: int | None = None


class PartialTranscriptionEvent(PipelineEvent):
    type: Literal["partial_transcription"] = "partial_transcription"
    delta: str
    turn_id: str | None = None
    turn_revision: int | None = None


class TranscriptionCompletedEvent(PipelineEvent):
    type: Literal["transcription_completed"] = "transcription_completed"
    transcript: str
    language_code: Optional[str] = None
    turn_id: str | None = None
    turn_revision: int | None = None
    speech_stopped_at_s: float | None = Field(default=None, exclude=True)


class AudioInputCompletedEvent(PipelineEvent):
    """Final VAD audio for direct-audio (no-STT) sessions."""

    model_config = ConfigDict(arbitrary_types_allowed=True)

    type: Literal["audio_input_completed"] = "audio_input_completed"
    audio: np.ndarray = Field(exclude=True)
    audio_sample_rate: int = 16000
    audio_duration_s: float = 0.0
    turn_id: str | None = None
    turn_revision: int | None = None
    speech_stopped_at_s: float | None = Field(default=None, exclude=True)


class AssistantTextEvent(PipelineEvent):
    type: Literal["assistant_text"] = "assistant_text"
    text: str
    tools: list[FunctionToolCall] = Field(default_factory=list)
    turn_id: str | None = None
    turn_revision: int | None = None
    # Generation that produced this text: the send loop discards stale
    # assistant text by the same rule as audio.
    cancel_generation: int | None = None


class TokenUsageEvent(PipelineEvent):
    type: Literal["token_usage"] = "token_usage"
    input_tokens: int = 0
    output_tokens: int = 0
    turn_id: str | None = None
    turn_revision: int | None = None


class ResponseFailedEvent(PipelineEvent):
    """Generation could not produce a response; service closes it as failed."""

    type: Literal["response_failed"] = "response_failed"
    message: str = ""
    turn_id: str | None = None
    turn_revision: int | None = None
