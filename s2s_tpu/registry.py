"""Declarative backend registry (reference ``backend_registry.py``).

``BackendSpec`` describes each swappable stage backend: its config
dataclass, a handler factory, and capability flags the builder validates
against.  ``ModelCache`` is the TPU twist: handler factories obtain shared
jitted models from a process-wide cache so N pipeline units reuse ONE weight
set in HBM (the reference loads N model copies — ``s2s_pipeline.py:551-562``).
"""

from __future__ import annotations

import logging
import threading
from dataclasses import dataclass, field
from queue import Queue
from typing import Any, Callable, Type

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class BackendCapabilities:
    bypasses_transcription_notifier: bool = False
    supports_audio_input: bool = False
    supports_llm_proxy: bool = False


@dataclass(frozen=True)
class HandlerContext:
    """Everything a handler factory may wire in."""

    stop_event: Any
    queue_in: Queue
    queue_out: Queue
    text_output_queue: Queue
    should_listen: Any
    cancel_scope: Any
    speculative_turns: Any
    device_scheduler: Any
    model_cache: "ModelCache"
    #: how many pipeline units share this process (cross-session batched
    #: services — VAD ticks, STT windows — engage only when > 1)
    n_units: int = 1
    #: tensor-parallel width for on-device engines (--model_parallel):
    #: > 1 shards LM / TTS-talker weights over a (1, N) mesh before the
    #: batched engines are built (see _tp_shard_lm)
    model_parallel: int = 1


@dataclass(frozen=True)
class BackendSpec:
    name: str
    kind: str  # "stt" | "llm" | "tts"
    config_type: Type
    create_handler: Callable[[Any, HandlerContext], Any]
    capabilities: BackendCapabilities = field(default_factory=BackendCapabilities)


class ModelCache:
    """Process-wide jitted-model cache keyed by (factory, config-key)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._models: dict[tuple, Any] = {}

    def get(self, key: tuple, factory: Callable[[], Any]) -> Any:
        with self._lock:
            if key not in self._models:
                logger.info("Loading shared model %s", key)
                self._models[key] = factory()
            return self._models[key]

    def clear(self) -> None:
        """Drop every cached model/engine, shutting down engines that have a
        shutdown() (tests; a serve process keeps the cache for its lifetime)."""
        with self._lock:
            values, self._models = list(self._models.values()), {}
        for value in values:
            engines = value if isinstance(value, tuple) else (value,)
            for engine in engines:
                stop = getattr(engine, "shutdown", None) or getattr(engine, "close", None)
                if callable(stop):
                    try:
                        stop()
                    except Exception:  # noqa: BLE001
                        logger.exception("engine shutdown during cache clear failed")


GLOBAL_MODEL_CACHE = ModelCache()


# ── factories ────────────────────────────────────────────────────────


def _make_whisper_stt(config, ctx: HandlerContext):
    from s2s_tpu.stt.whisper_handler import WhisperSTTHandler

    tokenizer = None
    if config.tokenizer:
        from s2s_tpu.stt.tokenizer import ByteLevelTokenizer

        tokenizer = ByteLevelTokenizer.from_file(config.tokenizer)
    return WhisperSTTHandler(
        ctx.stop_event, ctx.queue_in, ctx.queue_out,
        setup_kwargs=dict(
            speculative_turns=ctx.speculative_turns,
            device_scheduler=ctx.device_scheduler,
            cancel_scope=ctx.cancel_scope,
            model_size=config.model_size,
            language=config.language,
            tokenizer=tokenizer,
            params=_load_checkpoint(config.checkpoint),
        ),
    )


def _make_parakeet_stt(config, ctx: HandlerContext):
    from s2s_tpu.stt.language_id import detect_language
    from s2s_tpu.stt.parakeet_handler import ParakeetSTTHandler, config_for

    tokenizer = None
    if config.tokenizer:
        from s2s_tpu.stt.tokenizer import SentencePieceTokenizer

        tokenizer = SentencePieceTokenizer.from_file(config.tokenizer)
    params = None
    service = None
    if ctx.n_units > 1:
        # N units share ONE weight set + ONE cross-session batched service:
        # concurrent sessions' windows coalesce into a single dispatch
        # (reference: N isolated model copies, ``s2s_pipeline.py:551-562``)
        def build():
            import jax

            from s2s_tpu.models import parakeet
            from s2s_tpu.runtime.batcher import BatchedParakeetSTT

            cfg = config_for(config.model_size)
            p = _load_checkpoint(config.checkpoint)
            if p is None:
                logger.warning("parakeet STT: random-init shared weights (no checkpoint)")
                p = parakeet.init_params(jax.random.PRNGKey(0), cfg)
            return BatchedParakeetSTT(p, cfg, max_batch=ctx.n_units)

        service = ctx.model_cache.get(
            ("parakeet-batched", config.model_size, config.checkpoint), build
        )
    else:
        params = _load_checkpoint(config.checkpoint)
    return ParakeetSTTHandler(
        ctx.stop_event, ctx.queue_in, ctx.queue_out,
        setup_kwargs=dict(
            speculative_turns=ctx.speculative_turns,
            device_scheduler=ctx.device_scheduler,
            cancel_scope=ctx.cancel_scope,
            model_size=config.model_size,
            language=config.language,
            tokenizer=tokenizer,
            params=params,
            language_detector=detect_language,
            batch_service=service,
        ),
    )


def _make_paraformer_stt(config, ctx: HandlerContext):
    from s2s_tpu.stt.paraformer_handler import ParaformerSTTHandler

    return ParaformerSTTHandler(
        ctx.stop_event, ctx.queue_in, ctx.queue_out,
        setup_kwargs=dict(
            speculative_turns=ctx.speculative_turns,
            device_scheduler=ctx.device_scheduler,
            cancel_scope=ctx.cancel_scope,
            model_size=config.model_size,
            language=config.language,
            params=_load_checkpoint(config.checkpoint),
        ),
    )


def _make_none_stt(config, ctx: HandlerContext):
    from s2s_tpu.llm.audio_input_notifier import AudioInputNotifier

    return AudioInputNotifier(
        ctx.stop_event, ctx.queue_in, ctx.queue_out,
        setup_kwargs=dict(
            text_output_queue=ctx.text_output_queue,
            speculative_turns=ctx.speculative_turns,
        ),
    )


def _make_remote_llm(shape: str):
    def make(config, ctx: HandlerContext):
        from s2s_tpu.llm.openai_backend import ChatCompletionsHandler, ResponsesAPIHandler

        cls = ResponsesAPIHandler if shape == "responses" else ChatCompletionsHandler
        return cls(
            ctx.stop_event, ctx.queue_in, ctx.queue_out,
            setup_kwargs=dict(
                cancel_scope=ctx.cancel_scope,
                speculative_turns=ctx.speculative_turns,
                model_name=config.model_name,
                base_url=config.base_url,
                api_key=config.api_key,
                stream=config.stream,
                stream_batch_sentences=config.stream_batch_sentences,
                compact_history=config.compact_history,
                enable_lang_prompt=config.enable_lang_prompt,
                disable_thinking=config.disable_thinking,
                reasoning_effort=config.reasoning_effort,
                timeout_s=config.timeout_s,
                audio_content_type=config.audio_content_type,
                audio_max_tokens=config.audio_max_tokens,
                audio_history_turns=config.audio_history_turns,
                gen_kwargs=config.gen_kwargs,
            ),
        )

    return make


def _load_llm_tokenizer(path):
    if not path:
        return None
    from s2s_tpu.llm.bpe_tokenizer import BPETokenizer

    return BPETokenizer(path)


def _tp_shard_lm(params, cfg, model_parallel: int, drop_head: bool = False):
    """TP-shard a decoder-LM param tree over a (1, model_parallel) mesh.

    The product path for ``--model_parallel N``: megatron PartitionSpecs
    from ``decoder_lm.param_shardings`` placed via ``parallel/mesh.py``,
    BEFORE any quantization (quantizing sharded arrays keeps their
    shardings through XLA propagation).  Numeric parity of the sharded
    batched decode/talker programs vs single-device is pinned by
    ``tests/test_sharded_inference.py`` and the driver's
    ``dryrun_multichip``.  ``drop_head=True`` for the Qwen3-TTS talker,
    whose output head is the separate ``codec_head``."""
    import jax

    from s2s_tpu.models import decoder_lm
    from s2s_tpu.parallel.mesh import make_mesh, shard_params

    devs = jax.devices()
    if len(devs) < model_parallel:
        raise RuntimeError(
            f"--model_parallel {model_parallel} needs {model_parallel} devices; "
            f"{len(devs)} visible ({devs[0].platform}). Provision a "
            f"{model_parallel}-chip slice, or drop --model_parallel."
        )
    mesh = make_mesh(devs[:model_parallel], data=1, model=model_parallel)
    specs = decoder_lm.param_shardings(cfg)
    if drop_head:
        specs.pop("lm_head", None)
    logger.info("TP-sharding LM weights over a (1, %d) mesh", model_parallel)
    return shard_params(params, specs, mesh)


def _make_local_llm(config, ctx: HandlerContext):
    from s2s_tpu.llm.local_backend import LocalJAXLLMHandler, lm_config

    tokenizer = _load_llm_tokenizer(config.tokenizer)
    params = None
    shared_lm = None
    if getattr(config, "batched_slots", 0) and config.batched_slots > 1:
        # ONE weight set + ONE batched decode engine for every unit/session
        # (replaces the reference's N model copies, SURVEY §2.10)
        def build():
            import jax

            from s2s_tpu.models import decoder_lm
            from s2s_tpu.parallel.session_scheduler import BatchedLMScheduler

            cfg = lm_config(config.model_size)
            p = _load_checkpoint(config.checkpoint)
            if p is None:
                logger.warning("local-jax LLM: random-init shared weights (no checkpoint)")
                p = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)
            if ctx.model_parallel > 1:
                # --model_parallel: shard BEFORE quantize (quantizing sharded
                # arrays keeps their shardings; spec tree matches raw params)
                p = _tp_shard_lm(p, cfg, ctx.model_parallel)
            quant = getattr(config, "quantize", None)
            if quant in ("int8", "int4", "int8-dyn"):
                from s2s_tpu.ops.quant import quantize_tree

                p = quantize_tree(p, bits=4 if quant == "int4" else 8,
                                  act_quant=quant == "int8-dyn")
            eos = tokenizer.eos_id if tokenizer is not None else 0
            from s2s_tpu.parallel.session_scheduler import GLOBAL_PRIORITY_GATE

            engine = BatchedLMScheduler(
                p, cfg, n_slots=config.batched_slots,
                max_t=(getattr(config, "batched_max_t", 0)
                       or min(cfg.max_seq_len, 2048)),
                eos_id=eos,
                chunk_tokens=getattr(config, "chunk_tokens", 6),
                priority_tokens=getattr(config, "priority_tokens", 12),
                gate=GLOBAL_PRIORITY_GATE,
            )
            # bridge per-session INTERACTIVE dispatch (final STT) into the
            # engines' preemption gate: steady full-batch chunks hold back
            # while the latency chain's STT decode is in flight
            from s2s_tpu.runtime.device_scheduler import GLOBAL_SCHEDULER

            GLOBAL_SCHEDULER.priority_gate = GLOBAL_PRIORITY_GATE
            return p, engine

        params, shared_lm = ctx.model_cache.get(
            ("local-lm", config.model_size, config.checkpoint, config.batched_slots,
             getattr(config, "priority_tokens", 12),
             getattr(config, "batched_max_t", 0), getattr(config, "chunk_tokens", 6),
             ctx.model_parallel), build
        )
    else:
        params = _load_checkpoint(config.checkpoint)
        quant = getattr(config, "quantize", None)
        if params is not None and quant in ("int8", "int4", "int8-dyn"):
            from s2s_tpu.ops.quant import quantize_tree

            params = quantize_tree(params, bits=4 if quant == "int4" else 8,
                                   act_quant=quant == "int8-dyn")
    return LocalJAXLLMHandler(
        ctx.stop_event, ctx.queue_in, ctx.queue_out,
        setup_kwargs=dict(
            cancel_scope=ctx.cancel_scope,
            speculative_turns=ctx.speculative_turns,
            device_scheduler=ctx.device_scheduler,
            model_size=config.model_size,
            params=params,
            tokenizer=tokenizer,
            shared_lm=shared_lm,
            speculative_prefill=getattr(config, "speculative_prefill", False),
            speculative_tts=getattr(config, "speculative_tts", False),
            max_new_tokens=config.max_new_tokens,
            stream_batch_sentences=config.stream_batch_sentences,
            compact_history=config.compact_history,
            enable_lang_prompt=config.enable_lang_prompt,
            gen_kwargs=config.gen_kwargs,
        ),
    )


def _make_local_vlm(config, ctx: HandlerContext):
    from s2s_tpu.llm.vlm_backend import VisionLocalJAXLLMHandler

    return VisionLocalJAXLLMHandler(
        ctx.stop_event, ctx.queue_in, ctx.queue_out,
        setup_kwargs=dict(
            cancel_scope=ctx.cancel_scope,
            speculative_turns=ctx.speculative_turns,
            device_scheduler=ctx.device_scheduler,
            model_size=config.model_size,
            params=_load_checkpoint(config.checkpoint),
            max_new_tokens=config.max_new_tokens,
            stream_batch_sentences=config.stream_batch_sentences,
            compact_history=config.compact_history,
            enable_lang_prompt=config.enable_lang_prompt,
            gen_kwargs=config.gen_kwargs,
        ),
    )


def _make_qwen3_tts(config, ctx: HandlerContext):
    from s2s_tpu.models.qwen3_tts import Qwen3TTS, Qwen3TTSConfig, load_speaker_file
    from s2s_tpu.tts.qwen3_handler import Qwen3TTSHandler

    cfg = {
        "1.7b": Qwen3TTSConfig.qwen3_tts_12hz_1_7b,
        "tiny": Qwen3TTSConfig.tiny,
    }[config.model_size]()
    # pass the mode string through: "int8" (serving default — fastest),
    # "int8+cp4" (int4 code predictor), or "int4" — the int4 modes halve
    # resident HBM at a measured per-step speed cost (ops/int4_matmul.py)
    int8 = getattr(config, "quantize", None) or False
    tokenizer_path = getattr(config, "tokenizer", None)

    def _load_tokenizer():
        if not tokenizer_path:
            return None
        from s2s_tpu.llm.bpe_tokenizer import BPETokenizer

        return BPETokenizer(tokenizer_path)

    model = ctx.model_cache.get(
        ("qwen3_tts", config.model_size, config.checkpoint, config.streaming_chunk_size,
         int8, tokenizer_path),
        lambda: Qwen3TTS(
            params=_load_checkpoint(config.checkpoint), cfg=cfg,
            chunk_frames=config.streaming_chunk_size, int8=int8,
            tokenizer=_load_tokenizer(),
        ),
    )
    shared_tts = None
    if getattr(config, "batched_slots", 0) and config.batched_slots > 1:
        from s2s_tpu.parallel.session_scheduler import BatchedTTSScheduler

        def _global_gate():
            from s2s_tpu.parallel.session_scheduler import GLOBAL_PRIORITY_GATE
            from s2s_tpu.runtime.device_scheduler import GLOBAL_SCHEDULER

            # same INTERACTIVE->gate bridge as the batched LM engine
            GLOBAL_SCHEDULER.priority_gate = GLOBAL_PRIORITY_GATE
            return GLOBAL_PRIORITY_GATE

        def _engine_params():
            if ctx.model_parallel <= 1:
                return model.params
            # --model_parallel: TP-shard the talker (the decode hot loop;
            # its head is the separate codec_head, hence drop_head) — the
            # code predictor / vocoder stay replicated (small, and the
            # fused chunk program reads them once per chunk)
            p = dict(model.params)
            p["talker"] = _tp_shard_lm(
                model.params["talker"], cfg.lm, ctx.model_parallel, drop_head=True
            )
            return p

        shared_tts = ctx.model_cache.get(
            ("qwen3_tts_batched", config.model_size, config.checkpoint,
             config.batched_slots, getattr(config, "batched_max_t", 0),
             getattr(config, "context_frames", 25), ctx.model_parallel),
            lambda: BatchedTTSScheduler(
                _engine_params(), cfg, n_slots=config.batched_slots,
                max_t=(getattr(config, "batched_max_t", 0)
                       or min(cfg.lm.max_seq_len, 2048)),
                context_frames=getattr(config, "context_frames", 25),
                chunk_frames=config.streaming_chunk_size,
                gate=_global_gate(),
            ),
        )
    speaker_vec = load_speaker_file(config.ref_spk) if config.ref_spk else None
    ref_audio = None
    if config.ref_audio:
        import wave

        import numpy as np

        with wave.open(config.ref_audio) as w:
            ref_audio = (
                np.frombuffer(w.readframes(w.getnframes()), np.int16).astype(np.float32) / 32768.0
            )
    return Qwen3TTSHandler(
        ctx.stop_event, ctx.queue_in, ctx.queue_out,
        setup_kwargs=dict(
            cancel_scope=ctx.cancel_scope,
            speculative_turns=ctx.speculative_turns,
            device_scheduler=ctx.device_scheduler,
            should_listen=ctx.should_listen,
            model=model,
            voice=config.voice,
            voice_instruct=config.voice_instruct,
            ref_audio=ref_audio,
            speaker_vec=speaker_vec,
            shared_tts=shared_tts,
            speculative_synthesis=getattr(config, "speculative_synthesis", True),
            streaming_chunk_size=config.streaming_chunk_size,
            max_new_tokens=config.max_new_tokens,
            blocksize=config.blocksize,
        ),
    )


def _make_kokoro_tts(config, ctx: HandlerContext):
    from s2s_tpu.models.kokoro import KokoroTTS
    from s2s_tpu.tts.kokoro_handler import KokoroTTSHandler

    def build():
        vocab = _load_vocab_sidecar(config.checkpoint)
        g2p = None
        if vocab is not None and not getattr(config, "phoneme_input", False):
            from s2s_tpu.tts.g2p import resolve_phonemizer

            g2p = resolve_phonemizer(getattr(config, "lang", "en-us"))
        model = KokoroTTS(params=_load_checkpoint(config.checkpoint),
                          vocab=vocab, g2p=g2p)
        if config.voicepack:
            pack = _load_checkpoint(config.voicepack)
            model.add_voice(config.voice or "default", pack["pack"])
        return model

    model = ctx.model_cache.get(
        ("kokoro", config.checkpoint, config.voicepack,
         getattr(config, "lang", "en-us"), getattr(config, "phoneme_input", False)),
        build,
    )
    return KokoroTTSHandler(
        ctx.stop_event, ctx.queue_in, ctx.queue_out,
        setup_kwargs=dict(
            cancel_scope=ctx.cancel_scope,
            speculative_turns=ctx.speculative_turns,
            device_scheduler=ctx.device_scheduler,
            should_listen=ctx.should_listen,
            model=model,
            voice=config.voice,
            speed=config.speed,
            blocksize=config.blocksize,
            speculative_synthesis=getattr(config, "speculative_synthesis", True),
        ),
    )


def _make_mms_tts(config, ctx: HandlerContext):
    from s2s_tpu.models.vits import VitsTTS
    from s2s_tpu.tts.mms_handler import MMSTTSHandler

    model = ctx.model_cache.get(
        ("mms_vits", config.checkpoint),
        lambda: VitsTTS(params=_load_checkpoint(config.checkpoint),
                        vocab=_load_vocab_sidecar(config.checkpoint)),
    )
    return MMSTTSHandler(
        ctx.stop_event, ctx.queue_in, ctx.queue_out,
        setup_kwargs=dict(
            cancel_scope=ctx.cancel_scope,
            speculative_turns=ctx.speculative_turns,
            device_scheduler=ctx.device_scheduler,
            should_listen=ctx.should_listen,
            model=model,
            language=config.language,
            speed=config.speed,
            blocksize=config.blocksize,
            speculative_synthesis=getattr(config, "speculative_synthesis", True),
        ),
    )


def _make_pocket_tts(config, ctx: HandlerContext):
    from s2s_tpu.models.pocket_tts import PocketTTS
    from s2s_tpu.tts.pocket_handler import PocketTTSHandler

    def build():
        tokenizer = None
        if getattr(config, "tokenizer", None):
            from s2s_tpu.stt.tokenizer import SentencePieceTokenizer

            tokenizer = SentencePieceTokenizer.from_file(config.tokenizer)
        model = PocketTTS(params=_load_checkpoint(config.checkpoint), tokenizer=tokenizer)
        # named voice prefixes: --tts_ref_spk <converted pocket-voice .npz>
        # (one file -> voice name = file stem)
        if getattr(config, "ref_spk", None):
            import os

            tree = _load_checkpoint(config.ref_spk)
            voice = tree.get("voice") if isinstance(tree, dict) else tree
            model.add_voice(os.path.splitext(os.path.basename(config.ref_spk))[0], voice)
        return model

    model = ctx.model_cache.get(("pocket-tts", config.checkpoint, getattr(config, "ref_spk", None)), build)
    ref = None
    if config.ref_audio:
        import wave

        import numpy as np

        with wave.open(config.ref_audio) as w:
            ref = np.frombuffer(w.readframes(w.getnframes()), np.int16).astype(np.float32) / 32768.0
    voice = getattr(config, "voice", None) or (sorted(model.voices)[0] if model.voices else None)
    return PocketTTSHandler(
        ctx.stop_event, ctx.queue_in, ctx.queue_out,
        setup_kwargs=dict(
            cancel_scope=ctx.cancel_scope,
            speculative_turns=ctx.speculative_turns,
            device_scheduler=ctx.device_scheduler,
            should_listen=ctx.should_listen,
            model=model,
            voice=voice,
            voice_ref_audio=ref,
            speed=config.speed,
            blocksize=config.blocksize,
            speculative_synthesis=getattr(config, "speculative_synthesis", True),
        ),
    )


def _make_chattts(config, ctx: HandlerContext):
    from s2s_tpu.models.chattts import ChatTTSModel
    from s2s_tpu.tts.chattts_handler import ChatTTSHandler

    model = ctx.model_cache.get(
        ("chattts", config.checkpoint),
        lambda: ChatTTSModel(params=_load_checkpoint(config.checkpoint)),
    )
    return ChatTTSHandler(
        ctx.stop_event, ctx.queue_in, ctx.queue_out,
        setup_kwargs=dict(
            cancel_scope=ctx.cancel_scope,
            speculative_turns=ctx.speculative_turns,
            device_scheduler=ctx.device_scheduler,
            should_listen=ctx.should_listen,
            model=model,
            stream=config.stream,
            seed=config.seed,
            blocksize=config.blocksize,
            speculative_synthesis=getattr(config, "speculative_synthesis", True),
        ),
    )


def _load_vocab_sidecar(path: str | None):
    """MMS per-language char vocab written by the converter next to the npz."""
    if not path:
        return None
    import json
    import os

    sidecar = path + ".vocab.json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            return json.load(f)
    return None


def _load_checkpoint(path: str | None):
    """Load converted weights from an .npz/.msgpack file (None -> random init)."""
    if not path:
        return None
    import numpy as np

    if path.endswith(".npz"):
        flat = dict(np.load(path, allow_pickle=False))
        return unflatten_params(flat)
    raise ValueError(f"Unsupported checkpoint format: {path}")


def unflatten_params(flat: dict) -> dict:
    """'a/b/0/c' -> nested dict/list pytree."""
    root: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for i, part in enumerate(parts[:-1]):
            nxt = parts[i + 1]
            default: Any = [] if nxt.isdigit() else {}
            if isinstance(node, list):
                idx = int(part)
                while len(node) <= idx:
                    node.append(None)
                if node[idx] is None:
                    node[idx] = default
                node = node[idx]
            else:
                node = node.setdefault(part, default)
        last = parts[-1]
        if isinstance(node, list):
            idx = int(last)
            while len(node) <= idx:
                node.append(None)
            node[idx] = value
        else:
            node[last] = value
    return root


# ── registries ───────────────────────────────────────────────────────

from s2s_tpu.arguments import (  # noqa: E402
    ChatTTSArgs,
    KokoroTTSArgs,
    LocalLLMArgs,
    MMSTTSArgs,
    ParaformerArgs,
    PocketTTSArgs,
    ParakeetSTTArgs,
    Qwen3TTSArgs,
    RemoteLLMArgs,
    WhisperSTTArgs,
)

STT_BACKENDS: dict[str, BackendSpec] = {
    "whisper": BackendSpec("whisper", "stt", WhisperSTTArgs, _make_whisper_stt),
    "parakeet-tdt": BackendSpec("parakeet-tdt", "stt", ParakeetSTTArgs, _make_parakeet_stt),
    "paraformer": BackendSpec("paraformer", "stt", ParaformerArgs, _make_paraformer_stt),
    "none": BackendSpec(
        "none", "stt", WhisperSTTArgs, _make_none_stt,
        BackendCapabilities(bypasses_transcription_notifier=True),
    ),
}

LLM_BACKENDS: dict[str, BackendSpec] = {
    "responses-api": BackendSpec(
        "responses-api", "llm", RemoteLLMArgs, _make_remote_llm("responses"),
        BackendCapabilities(supports_audio_input=True, supports_llm_proxy=True),
    ),
    "chat-completions": BackendSpec(
        "chat-completions", "llm", RemoteLLMArgs, _make_remote_llm("chat"),
        BackendCapabilities(supports_audio_input=True, supports_llm_proxy=True),
    ),
    "local-jax": BackendSpec("local-jax", "llm", LocalLLMArgs, _make_local_llm),
    "local-vlm": BackendSpec("local-vlm", "llm", LocalLLMArgs, _make_local_vlm),
}

TTS_BACKENDS: dict[str, BackendSpec] = {
    "qwen3": BackendSpec("qwen3", "tts", Qwen3TTSArgs, _make_qwen3_tts),
    "kokoro": BackendSpec("kokoro", "tts", KokoroTTSArgs, _make_kokoro_tts),
    "facebookMMS": BackendSpec("facebookMMS", "tts", MMSTTSArgs, _make_mms_tts),
    "pocket": BackendSpec("pocket", "tts", PocketTTSArgs, _make_pocket_tts),
    "chatTTS": BackendSpec("chatTTS", "tts", ChatTTSArgs, _make_chattts),
}


#: Reference-CLI compatibility aliases.  The reference registers 7 STT and
#: 4 LLM names (reference backend_registry.py:287-477); its CT2/MLX/Metal
#: runtime variants have no TPU meaning — SURVEY §7.4 prescribes ONE JAX
#: implementation per model family — so those names alias to the JAX spec
#: (with an info log) instead of erroring.
BACKEND_ALIASES: dict[str, dict[str, str]] = {
    "stt": {
        "faster-whisper": "whisper",
        "whisper-mlx": "whisper",
        "mlx-audio-whisper": "whisper",
    },
    "llm": {
        "transformers": "local-jax",
        "mlx-lm": "local-jax",
    },
    "tts": {},
}


def resolve_backend_alias(kind: str, name: str) -> str:
    """Map a reference backend name onto the JAX spec that serves its family."""
    canon = BACKEND_ALIASES.get(kind, {}).get(name)
    if canon is None:
        return name
    logger.info(
        "%s backend %r is served by %r on TPU (one JAX implementation per "
        "model family; the %r runtime has no TPU equivalent)",
        kind.upper(), name, canon, name,
    )
    return canon


def get_backend(kind: str, name: str) -> BackendSpec:
    name = resolve_backend_alias(kind, name)
    registry = {"stt": STT_BACKENDS, "llm": LLM_BACKENDS, "tts": TTS_BACKENDS}[kind]
    if name not in registry:
        raise ValueError(f"Unknown {kind} backend {name!r}; available: {sorted(registry)}")
    return registry[name]
