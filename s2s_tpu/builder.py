"""Pipeline builder (reference ``s2s_pipeline.py:348-603``).

Builds N isolated ``PipelineUnit``s (own queues, CancelScope, tracker,
RealtimeService, handler chain) behind one server.  Models are shared
through the registry's ``ModelCache`` — N units, ONE weight set in HBM.
"""

from __future__ import annotations

import logging
import threading
from queue import Queue
from typing import Any

from s2s_tpu.arguments import ParsedArguments
from s2s_tpu.llm.output_processor import LMOutputProcessor
from s2s_tpu.pipeline.control import CancelScope
from s2s_tpu.pipeline.log_context import install_pipeline_log_filter
from s2s_tpu.pipeline.turns import SpeculativeTurnTracker
from s2s_tpu.realtime.pipeline_unit import PipelineUnit
from s2s_tpu.realtime.server import RealtimeServer
from s2s_tpu.realtime.service import RealtimeService
from s2s_tpu.registry import GLOBAL_MODEL_CACHE, HandlerContext, get_backend
from s2s_tpu.runtime.device_scheduler import GLOBAL_SCHEDULER
from s2s_tpu.runtime.thread_manager import ThreadManager
from s2s_tpu.stt.notifier import TranscriptionNotifier
from s2s_tpu.vad.handler import VADHandler

logger = logging.getLogger(__name__)


def build_pipeline_unit(
    index: int, args: ParsedArguments, stop_event: threading.Event, vad_model=None
) -> PipelineUnit:
    """One unit: 8 queues, 2 events, control plane, service, handler chain."""
    input_queue: Queue = Queue()
    spoken_prompt_queue: Queue = Queue()
    stt_output_queue: Queue = Queue()
    text_prompt_queue: Queue = Queue()
    lm_response_queue: Queue = Queue()
    lm_processed_queue: Queue = Queue()
    output_queue: Queue = Queue()
    text_output_queue: Queue = Queue()

    should_listen = threading.Event()
    should_listen.set()
    response_playing = threading.Event()
    cancel_scope = CancelScope()
    tracker = SpeculativeTurnTracker()

    stt_spec = get_backend("stt", args.module.stt)
    llm_spec = get_backend("llm", args.module.llm_backend)
    tts_spec = get_backend("tts", args.module.tts)

    def ctx(queue_in: Queue, queue_out: Queue) -> HandlerContext:
        return HandlerContext(
            stop_event=stop_event,
            queue_in=queue_in,
            queue_out=queue_out,
            text_output_queue=text_output_queue,
            should_listen=should_listen,
            cancel_scope=cancel_scope,
            speculative_turns=tracker,
            device_scheduler=GLOBAL_SCHEDULER,
            model_cache=GLOBAL_MODEL_CACHE,
            n_units=args.module.num_pipelines,
            model_parallel=args.module.model_parallel,
        )

    if vad_model is None and args.vad.backend == "energy":
        from s2s_tpu.vad.energy import EnergyVAD

        vad_model = EnergyVAD()

    vad = VADHandler(
        stop_event, input_queue, spoken_prompt_queue,
        setup_kwargs=dict(
            model=vad_model,
            should_listen=should_listen,
            speculative_turns=tracker,
            thresh=args.vad.thresh,
            min_silence_ms=args.vad.min_silence_ms,
            min_speech_ms=args.vad.min_speech_ms,
            min_speech_continuation_ms=args.vad.min_speech_continuation_ms,
            max_speech_ms=args.vad.max_speech_ms,
            speech_pad_ms=args.vad.speech_pad_ms,
            enable_realtime_transcription=args.module.enable_live_transcription,
            realtime_processing_pause=args.vad.realtime_processing_pause,
            text_output_queue=text_output_queue,
            speculative_reopen_ms=args.vad.speculative_reopen_ms,
            unanswered_reopen_ms=args.vad.unanswered_reopen_ms,
            short_segment_merge_ms=args.vad.short_segment_merge_ms,
            smart_turn=args.vad.smart_turn,
            smart_turn_threshold=args.vad.smart_turn_threshold,
            smart_turn_checkpoint=args.vad.smart_turn_checkpoint,
            smart_turn_max_wait_ms=args.vad.smart_turn_max_wait_ms,
            smart_turn_incomplete_delay_ms=args.vad.smart_turn_incomplete_delay_ms,
            enhancer=_build_enhancer(args),
        ),
    )

    handlers: list[Any] = [vad]
    bypass_notifier = stt_spec.capabilities.bypasses_transcription_notifier
    if bypass_notifier:
        # direct-audio: VAD final -> AudioInputNotifier -> (service bridges to LLM)
        stt = stt_spec.create_handler(args.stt_config, ctx(spoken_prompt_queue, stt_output_queue))
        handlers.append(stt)
    else:
        stt = stt_spec.create_handler(args.stt_config, ctx(spoken_prompt_queue, stt_output_queue))
        notifier = TranscriptionNotifier(
            stop_event, stt_output_queue, text_prompt_queue,
            setup_kwargs=dict(text_output_queue=text_output_queue, should_listen=should_listen),
        )
        handlers.extend([stt, notifier])

    llm = llm_spec.create_handler(args.llm_config, ctx(text_prompt_queue, lm_response_queue))
    processor = LMOutputProcessor(
        stop_event, lm_response_queue, lm_processed_queue,
        setup_kwargs=dict(text_output_queue=text_output_queue, speculative_turns=tracker),
    )
    tts = tts_spec.create_handler(args.tts_config, ctx(lm_processed_queue, output_queue))
    handlers.extend([llm, processor, tts])

    for handler in handlers:
        handler.pipeline_index = index

    # speculative first-sentence generation engages when the LLM handler
    # actually runs it: local-JAX backend on the batched engine
    spec_prefill = bool(
        getattr(llm, "speculative_prefill", False) and getattr(llm, "shared_lm", None) is not None
    )
    service = RealtimeService(
        text_prompt_queue=text_prompt_queue,
        should_listen=should_listen,
        chat_size=args.server.chat_size,
        speculative_turns=tracker,
        default_instructions=args.server.default_instructions,
        speculative_prefill=spec_prefill,
    )

    return PipelineUnit(
        index=index,
        service=service,
        cancel_scope=cancel_scope,
        should_listen=should_listen,
        response_playing=response_playing,
        input_queue=input_queue,
        output_queue=output_queue,
        text_output_queue=text_output_queue,
        text_prompt_queue=text_prompt_queue,
        handlers=handlers,
    )


def build_pipeline(args: ParsedArguments, stop_event: threading.Event) -> tuple[ThreadManager, RealtimeServer]:
    install_pipeline_log_filter()
    n = args.module.num_pipelines
    vad_models = [None] * n
    if n > 1 and args.vad.backend == "silero":
        # N sessions, ONE Silero: all units' 32 ms ticks batch into a single
        # device dispatch (vs the reference's N model copies).  The energy
        # backend stays per-unit: it is host-side arithmetic with per-session
        # noise-floor state, nothing to batch on device.
        from s2s_tpu.runtime.batcher import BatchedSileroVAD

        service = GLOBAL_MODEL_CACHE.get(("silero_batched", n), lambda: BatchedSileroVAD(max_slots=n))
        vad_models = [service.view(i) for i in range(n)]
    pool = [build_pipeline_unit(i, args, stop_event, vad_model=vad_models[i]) for i in range(n)]
    ice = args.server.webrtc_ice_servers
    server = RealtimeServer(
        stop_event, pool, host=args.server.host, port=args.server.port,
        llm_proxy=_build_llm_proxy(args),
        webrtc_port=args.server.webrtc_port,
        webrtc_ice_servers=[u.strip() for u in ice.split(",")] if ice else None,
    )
    all_handlers: list[Any] = [h for unit in pool for h in unit.handlers]
    if args.module.profile_dir:
        from s2s_tpu.runtime.profiler import ProfilerHandler

        all_handlers.append(ProfilerHandler(stop_event, args.module.profile_dir))
    all_handlers.append(server)
    if getattr(args.module, "warmup_engines", False):
        # compile every batched-engine program variant before serving (a
        # cold compile when the first sessions arrive stalls them for tens
        # of seconds); safe here: driver threads start on first use
        from s2s_tpu.registry import GLOBAL_MODEL_CACHE as _cache

        for value in list(_cache._models.values()):
            engines = value if isinstance(value, tuple) else (value,)
            for engine in engines:
                warm = getattr(engine, "warmup", None)
                if callable(warm):
                    logger.info("Warming batched engine %s", type(engine).__name__)
                    warm()
    manager = ThreadManager(all_handlers)
    return manager, server


def _build_enhancer(args: ParsedArguments):
    """Optional DeepFilterNet-method noise suppression on VAD-final audio
    (reference ``vad_handler.py:44-50,799-821``): built only when a
    converted checkpoint is given; shared across units via the cache."""
    path = getattr(args.vad, "enhancer_checkpoint", None)
    if not path:
        return None
    from s2s_tpu.models.deepfilter import DeepFilterEnhancer
    from s2s_tpu.registry import GLOBAL_MODEL_CACHE, _load_checkpoint

    return GLOBAL_MODEL_CACHE.get(
        ("deepfilter", path), lambda: DeepFilterEnhancer(params=_load_checkpoint(path))
    )


def _build_llm_proxy(args: ParsedArguments):
    if not args.module.enable_llm_proxy:
        return None
    from s2s_tpu.realtime.llm_proxy import LLMProxy

    spec = get_backend("llm", args.module.llm_backend)
    if not spec.capabilities.supports_llm_proxy:
        logger.warning("LLM proxy requested but backend %s does not support it", spec.name)
        return None
    return LLMProxy(
        base_url=args.llm_config.base_url,
        api_key=args.llm_config.api_key,
        model_name=args.llm_config.model_name,
        shape="responses" if args.module.llm_backend == "responses-api" else "chat",
    )
