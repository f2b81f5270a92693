"""Integration extras: barge-in over the wire, checkpoint round trip,
LLM proxy passthrough, soak-client harness smoke."""

import json
import subprocess
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from queue import Queue

import numpy as np
import pytest


# ── barge-in over the wire ───────────────────────────────────────────


def test_barge_in_over_websocket(tmp_path):
    """A speech_started during active playback cancels the response on the
    wire and stale audio is discarded."""
    import websockets.sync.client as ws_client

    from s2s_tpu.pipeline.control import CancelScope
    from s2s_tpu.pipeline.events import AssistantTextEvent, SpeechStartedEvent
    from s2s_tpu.pipeline.messages import AUDIO_RESPONSE_DONE, AudioOutput
    from s2s_tpu.pipeline.turns import SpeculativeTurnTracker
    from s2s_tpu.realtime.pipeline_unit import PipelineUnit
    from s2s_tpu.realtime.server import RealtimeServer
    from s2s_tpu.realtime.service import RealtimeService

    should_listen = threading.Event()
    should_listen.set()
    text_prompt = Queue()
    unit = PipelineUnit(
        index=0,
        service=RealtimeService(
            text_prompt_queue=text_prompt, should_listen=should_listen,
            speculative_turns=SpeculativeTurnTracker(),
        ),
        cancel_scope=CancelScope(),
        should_listen=should_listen,
        response_playing=threading.Event(),
        input_queue=Queue(),
        output_queue=Queue(),
        text_output_queue=Queue(),
        text_prompt_queue=text_prompt,
    )
    stop = threading.Event()
    server = RealtimeServer(stop, [unit], host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.run, daemon=True)
    thread.start()
    assert server.started.wait(5)
    try:
        with ws_client.connect(f"ws://127.0.0.1:{server.bound_port}/v1/realtime") as ws:
            json.loads(ws.recv(timeout=5))  # session.created
            gen = unit.cancel_scope.generation
            # response in flight: text + some audio
            unit.text_output_queue.put(AssistantTextEvent(text="Speaking now.", cancel_generation=gen))
            unit.output_queue.put(AudioOutput(audio=np.ones(512, np.int16), cancel_generation=gen))
            time.sleep(0.3)
            # user barges in; more stale audio arrives afterwards
            unit.text_output_queue.put(
                SpeechStartedEvent(turn_id="t2", turn_revision=0, interrupt_response=True)
            )
            unit.output_queue.put(AudioOutput(audio=np.ones(512, np.int16) * 5, cancel_generation=gen))
            unit.output_queue.put(AudioOutput(audio=AUDIO_RESPONSE_DONE, cancel_generation=gen))

            seen = []
            deadline = time.time() + 10
            while time.time() < deadline:
                evt = json.loads(ws.recv(timeout=5))
                seen.append(evt)
                if evt["type"] == "input_audio_buffer.speech_started":
                    break
            types = [e["type"] for e in seen]
            done = [e for e in seen if e["type"] == "response.done"]
            assert done and done[0]["response"]["status"] == "cancelled"
            assert done[0]["response"]["status_details"]["reason"] == "turn_detected"
            # cancelled-response terminal events precede speech_started
            assert types.index("response.done") < types.index("input_audio_buffer.speech_started")
            # stale audio after the cancel never reached the wire
            assert not [
                e for e in seen[types.index("response.done") :] if e["type"] == "response.output_audio.delta"
            ]
            # pipeline-side: discard guard cleared by the stale DONE sentinel
            deadline = time.time() + 5
            while unit.cancel_scope.discarding and time.time() < deadline:
                time.sleep(0.05)
            assert not unit.cancel_scope.discarding
            assert unit.should_listen.is_set()
    finally:
        stop.set()
        thread.join(timeout=5)


# ── checkpoint round trip ────────────────────────────────────────────


def test_checkpoint_npz_round_trip(tmp_path):
    import jax
    import jax.numpy as jnp

    from s2s_tpu.models import decoder_lm
    from s2s_tpu.registry import unflatten_params

    cfg = decoder_lm.DecoderLMConfig.tiny()
    params = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)

    # flatten with /-joined paths (the save format _load_checkpoint reads)
    flat = {}

    def walk(node, prefix=""):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}{k}/")
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}{i}/")
        else:
            flat[prefix[:-1]] = np.asarray(node)

    walk(params)
    path = tmp_path / "ckpt.npz"
    np.savez_compressed(path, **flat)

    from s2s_tpu.registry import _load_checkpoint

    loaded = _load_checkpoint(str(path))
    tokens = jnp.arange(8, dtype=jnp.int32)[None]
    ref = decoder_lm.forward(params, cfg, tokens)
    got = decoder_lm.forward(jax.tree_util.tree_map(jnp.asarray, loaded), cfg, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


# ── LLM proxy ────────────────────────────────────────────────────────


def test_llm_proxy_passthrough():
    from s2s_tpu.realtime.llm_proxy import LLMProxy

    class Upstream(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length))
            assert body["model"] == "forced-model"  # proxy forces the model
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(
                json.dumps(
                    {
                        "choices": [{"message": {"content": "pong"}}],
                        "usage": {"prompt_tokens": 2, "completion_tokens": 1},
                    }
                ).encode()
            )

    upstream = ThreadingHTTPServer(("127.0.0.1", 0), Upstream)
    threading.Thread(target=upstream.serve_forever, daemon=True).start()

    proxy = LLMProxy(
        base_url=f"http://127.0.0.1:{upstream.server_port}/v1",
        api_key="k",
        model_name="forced-model",
        shape="chat",
        port=0,
    )
    # pick a free port by binding at 0 via start()
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        free_port = s.getsockname()[1]
    proxy.port = free_port
    proxy.start("127.0.0.1", 0)
    try:
        import urllib.request

        req = urllib.request.Request(
            f"http://127.0.0.1:{free_port}/v1/chat/completions",
            data=json.dumps({"model": "ignored", "messages": [], "stream": False}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        resp = json.loads(urllib.request.urlopen(req, timeout=5).read())
        assert resp["choices"][0]["message"]["content"] == "pong"
        assert proxy.usage.requests == 1
        assert proxy.usage.input_tokens == 2 and proxy.usage.output_tokens == 1

        # unsupported path answers 501
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{free_port}/v1/responses", data=b"{}", method="POST"
        )
        try:
            urllib.request.urlopen(req2, timeout=5)
            raise AssertionError("expected 501")
        except Exception as exc:
            assert "501" in str(exc)
    finally:
        proxy.stop()
        upstream.shutdown()


# ── soak client smoke ────────────────────────────────────────────────


def test_soak_client_utterances_are_distinct():
    sys.path.insert(0, "scripts")
    try:
        from synthetic_conversation_client import make_utterance
    finally:
        sys.path.pop(0)
    a = make_utterance(0, 0)
    b = make_utterance(1, 0)
    c = make_utterance(0, 1)
    assert not np.array_equal(a, b) and not np.array_equal(a, c)
    assert a.dtype == np.int16 and len(a) > 16000


# ── converted-checkpoint flag end to end ─────────────────────────────


def test_tts_checkpoint_flag_loads_converted_weights_and_speaks(tmp_path):
    """The full convert -> save -> --tts_checkpoint -> registry loader ->
    handler -> audible audio seam: a tiny ChatTTS checkpoint converted from
    the torch-twin fixture drives real synthesis through the CLI flag."""
    import threading
    from queue import Queue

    import jax
    import jax.numpy as jnp

    from s2s_tpu.arguments import parse_arguments
    from s2s_tpu.models import chattts
    from s2s_tpu.pipeline.messages import TTSInput
    from s2s_tpu.registry import HandlerContext, ModelCache, get_backend
    from scripts.convert_checkpoint import flatten

    fx = np.load("tests/data/chattts_parity.npz")
    sd = {k[4:]: fx[k] for k in fx.files if k.startswith("sd__")}
    params = chattts.convert_state_dict(sd, chattts.ChatTTSConfig.tiny())
    # boost the vocoder head so random-fixture audio survives the silence trim
    params["vocos"]["head"]["w"] = jax.tree.map(lambda x: x, params["vocos"]["head"]["w"]) * 50.0
    ckpt = tmp_path / "chattts_tiny.npz"
    np.savez(ckpt, **flatten(jax.tree.map(np.asarray, params)))

    args = parse_arguments(["serve", "--tts", "chatTTS", "--tts_checkpoint", str(ckpt)])
    assert args.tts_config.checkpoint == str(ckpt)

    ctx = HandlerContext(
        stop_event=threading.Event(), queue_in=Queue(), queue_out=Queue(),
        text_output_queue=Queue(), should_listen=threading.Event(),
        cancel_scope=None, speculative_turns=None, device_scheduler=None,
        model_cache=ModelCache(),
    )
    handler = get_backend("tts", "chatTTS").create_handler(args.tts_config, ctx)
    # loaded weights, not random init: spot-check one converted tensor
    loaded = handler.model.params["vocos"]["head"]["w"]
    assert np.allclose(np.asarray(loaded), np.asarray(params["vocos"]["head"]["w"]))
    outs = list(handler.process(TTSInput(text="Hi there.", turn_id="t1", turn_revision=0)))
    blocks = [o for o in outs if isinstance(o, np.ndarray)]
    assert blocks and sum(b.size for b in blocks) > 0
    assert all(b.dtype == np.int16 for b in blocks)


# ── speculative prefill through the real builder wiring ──────────────


def test_speculative_prefill_wired_through_builder(monkeypatch):
    """build_pipeline_unit with the batched local-JAX LLM + batched Qwen3-TTS
    must wire the WHOLE speculation chain: a partial transcript starts the
    LLM speculation, its watcher announces the first sentence batch, the TTS
    handler pre-synthesizes it, and the final's generation AND synthesis both
    adopt (neither engine's blocking path ever runs)."""
    import threading

    from s2s_tpu.arguments import parse_arguments
    from s2s_tpu.builder import build_pipeline_unit
    from s2s_tpu.pipeline.events import (
        PartialTranscriptionEvent,
        TranscriptionCompletedEvent,
    )
    from s2s_tpu.pipeline.messages import (
        EndOfResponse,
        LLMResponseChunk,
        SpeculativeTTSText,
        TTSInput,
    )
    from s2s_tpu.registry import GLOBAL_MODEL_CACHE

    GLOBAL_MODEL_CACHE.clear()
    args = parse_arguments([
        "serve", "--stt", "whisper", "--stt_model_size", "tiny",
        "--llm_backend", "local-jax", "--llm_model_size", "tiny",
        "--llm_batched_slots", "2", "--llm_max_new_tokens", "8",
        "--tts", "qwen3", "--tts_model_size", "tiny", "--tts_batched_slots", "2",
        "--tts_streaming_chunk_size", "4", "--tts_max_new_tokens", "8",
    ])
    stop = threading.Event()
    unit = build_pipeline_unit(0, args, stop)
    try:
        service = unit.service
        assert service.speculative_prefill is True
        llm = next(h for h in unit.handlers if type(h).__name__ == "LocalJAXLLMHandler")
        proc = next(h for h in unit.handlers if type(h).__name__ == "LMOutputProcessor")
        tts = next(h for h in unit.handlers if type(h).__name__ == "Qwen3TTSHandler")
        assert llm.speculative_prefill and llm.shared_lm is not None
        assert llm.speculative_tts and tts.speculative_synthesis

        conn = service.register()
        service.dispatch_pipeline_event(
            conn, PartialTranscriptionEvent(delta="hi", turn_id="t1", turn_revision=0)
        )
        spec_req = service.text_prompt_queue.get(timeout=5)
        list(llm.process(spec_req))
        assert llm._spec is not None
        # the watcher announces the first sentence batch toward TTS...
        announced = llm.queue_out.get(timeout=10)
        assert isinstance(announced, SpeculativeTTSText) and announced.turn_id == "t1"
        # ...through the processor, and the TTS handler pre-synthesizes it
        assert list(proc.process(announced)) == [announced]
        assert list(tts.process(announced)) == []
        assert tts._spec_synth is not None

        # neither engine's blocking path may run on adoption
        monkeypatch.setattr(
            llm.shared_lm, "generate",
            lambda *a, **k: (_ for _ in ()).throw(AssertionError("lm generate() ran")),
        )
        monkeypatch.setattr(
            tts.shared_tts, "stream",
            lambda *a, **k: (_ for _ in ()).throw(AssertionError("tts stream() ran")),
        )
        service.dispatch_pipeline_event(
            conn, TranscriptionCompletedEvent(transcript="hi", turn_id="t1", turn_revision=0)
        )
        real_req = service.text_prompt_queue.get(timeout=5)
        outs = list(llm.process(real_req))
        assert any(isinstance(o, LLMResponseChunk) and o.text for o in outs)
        assert isinstance(outs[-1], EndOfResponse) and outs[-1].error is None
        assert llm._spec is None

        # the first routed TTSInput adopts the pre-synthesized audio
        audio_blocks = []
        for out in outs:
            for routed in proc.process(out):
                if isinstance(routed, TTSInput):
                    audio_blocks.extend(
                        b for b in tts.process(routed) if isinstance(b, np.ndarray)
                    )
        assert audio_blocks and all(len(b) == 512 for b in audio_blocks)
        assert tts._spec_synth is None
    finally:
        stop.set()
        GLOBAL_MODEL_CACHE.clear()
