"""LLM layer: sentence splitting, base handler lifecycle, tool-call parsing,
output processor, local JAX backend, remote API backends over fake transports."""

import json
import threading
import time
from queue import Queue

import httpx
import numpy as np
import pytest

from s2s_tpu.llm.base_handler import BaseLLMHandler
from s2s_tpu.llm.chat import Chat, make_user_message
from s2s_tpu.llm.local_backend import LocalJAXLLMHandler
from s2s_tpu.llm.output_processor import LMOutputProcessor
from s2s_tpu.llm.tool_call import (
    build_tool_system_prompt,
    extract_function_calls_from_text,
    parse_function_call,
    signature_from_schema,
)
from s2s_tpu.pipeline.control import CancelScope
from s2s_tpu.pipeline.messages import (
    EndOfResponse,
    GenerateResponseRequest,
    LLMResponseChunk,
    TokenUsage,
    TTSInput,
)
from s2s_tpu.pipeline.turns import SpeculativeTurnTracker
from s2s_tpu.realtime.config import RuntimeConfig
from s2s_tpu.realtime.types import FunctionTool, ResponseCreateParams
from s2s_tpu.utils.sentences import split_sentences


# ── sentence splitter ────────────────────────────────────────────────


def test_split_sentences_basic():
    assert split_sentences("Hello there. How are you? Great!") == [
        "Hello there.", "How are you?", "Great!",
    ]


def test_split_sentences_abbreviations_and_decimals():
    assert split_sentences("Dr. Smith weighs 3.14 kg. Next sentence.") == [
        "Dr. Smith weighs 3.14 kg.", "Next sentence.",
    ]


def test_split_sentences_trailing_fragment():
    assert split_sentences("Done. And then we") == ["Done.", "And then we"]


def test_split_sentences_cjk():
    assert split_sentences("你好。今天怎么样？好的") == ["你好。", "今天怎么样？", "好的"]


# ── tool call module ─────────────────────────────────────────────────

WEATHER_TOOL = FunctionTool(
    name="get_weather",
    description="Get weather for a city",
    parameters={
        "type": "object",
        "properties": {
            "city": {"type": "string", "description": "City name"},
            "units": {"type": "string", "enum": ["c", "f"], "default": "c"},
        },
        "required": ["city"],
    },
)


def test_signature_from_schema():
    sig = signature_from_schema(WEATHER_TOOL.parameters)
    assert "city" in sig.parameters and sig.parameters["units"].default == "c"


def test_tool_prompt_contains_signature():
    prompt = build_tool_system_prompt([WEATHER_TOOL])
    assert "def get_weather" in prompt and "<code>" in prompt


def test_parse_function_call_roundtrip():
    calls = parse_function_call("get_weather(city='Paris', units='f')")
    assert calls[0].function_name == "get_weather"
    assert calls[0].parameters == {"city": "Paris", "units": "f"}
    tc = calls[0].to_function_tool_call([WEATHER_TOOL])
    assert json.loads(tc.arguments) == {"city": "Paris", "units": "f"}
    assert tc.call_id.startswith("call_")


def test_parse_function_call_validation():
    calls = parse_function_call("get_weather(city='x', bogus=1)")
    tc = calls[0].to_function_tool_call([WEATHER_TOOL])
    assert json.loads(tc.arguments) == {"city": "x"}  # undeclared dropped
    with pytest.raises(ValueError):
        parse_function_call("get_weather(units='c')")[0].to_function_tool_call([WEATHER_TOOL])
    with pytest.raises(ValueError):
        parse_function_call("unknown_fn(x=1)")[0].to_function_tool_call([WEATHER_TOOL])


def test_parse_malformed_falls_back_to_regex():
    calls = parse_function_call("blah get_weather(city='a') and broken(((")
    names = [c.function_name for c in calls]
    assert "get_weather" in names


def test_extract_function_calls_from_text():
    text = "Sure, checking. <code>get_weather(city='Oslo')</code> done"
    outside, calls = extract_function_calls_from_text(text, r"<code>.*?</code>")
    assert "Oslo" not in outside and calls[0].function_name == "get_weather"


# ── base handler via a scripted backend ──────────────────────────────


class ScriptedLLM(BaseLLMHandler):
    def setup(self, pieces, cancel_scope=None, speculative_turns=None, stream_batch_sentences=3):
        self.pieces = pieces
        self.cancel_scope = cancel_scope
        self.speculative_turns = speculative_turns
        self.stream_batch_sentences = stream_batch_sentences

    def _generate_stream(self, chat, ctx, runtime_config, response):
        ctx.input_tokens = 7
        yield from self.pieces


def run_llm(pieces, response=None, turn=("t1", 0), tracker=None, cancel_scope=None, batch=3, rc=None):
    handler = ScriptedLLM(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(
            pieces=pieces, cancel_scope=cancel_scope, speculative_turns=tracker,
            stream_batch_sentences=batch,
        ),
    )
    rc = rc or RuntimeConfig()
    req = GenerateResponseRequest(
        runtime_config=rc, response=response, turn_id=turn[0], turn_revision=turn[1]
    )
    return list(handler.process(req)), rc


def test_sentence_batching_default_three():
    pieces = ["One. ", "Two. ", "Three. ", "Four. ", "Five."]
    outs, _ = run_llm(pieces)
    chunks = [o for o in outs if isinstance(o, LLMResponseChunk)]
    assert chunks[0].text == "One. Two. Three."
    assert chunks[1].text == "Four. Five."
    assert isinstance(outs[-1], EndOfResponse)
    usage = [o for o in outs if isinstance(o, TokenUsage)]
    assert usage and usage[0].input_tokens == 7


def test_history_write_back():
    outs, rc = run_llm(["Answer one. Answer two. Answer three. Tail."])
    assistant = [x for x in rc.chat.buffer if getattr(x, "role", None) == "assistant"]
    assert len(assistant) == 1
    assert "Answer one." in assistant[0].content[0].text


def test_out_of_band_no_write_back():
    resp = ResponseCreateParams(conversation="none", input=[])
    outs, rc = run_llm(["Secret answer."], response=resp)
    assert rc.chat.buffer == []  # throwaway context, nothing committed
    chunks = [o for o in outs if isinstance(o, LLMResponseChunk)]
    assert chunks and chunks[0].text == "Secret answer."


def test_cancellation_mid_stream():
    scope = CancelScope()

    def pieces():
        yield "First sentence. Second sentence. Third one. "
        scope.cancel()
        yield "Fourth. Fifth. Sixth. Seventh."

    outs, rc = run_llm(pieces(), cancel_scope=scope)
    # no write-back after cancellation
    assert all(getattr(x, "role", None) != "assistant" for x in rc.chat.buffer)
    assert isinstance(outs[-1], EndOfResponse)


def test_stale_request_short_circuits():
    tracker = SpeculativeTurnTracker()
    tracker.observe("t1", 5)
    outs, _ = run_llm(["never"], tracker=tracker, turn=("t1", 0))
    assert len(outs) == 1 and isinstance(outs[0], EndOfResponse)


def test_error_yields_failed_end_of_response():
    def exploding():
        yield "ok. "
        raise RuntimeError("backend died")

    outs, _ = run_llm(exploding())
    eor = outs[-1]
    assert isinstance(eor, EndOfResponse) and "backend died" in (eor.error or "")


def test_text_only_streams_raw():
    resp = ResponseCreateParams(output_modalities=["text"])
    outs, _ = run_llm(["# Title\n- bullet one\n- bullet two"], response=resp)
    chunks = [o for o in outs if isinstance(o, LLMResponseChunk)]
    assert chunks[0].text.startswith("# Title")  # markdown preserved, not sentence-split


def test_prompted_tool_call_extraction():
    rc = RuntimeConfig()
    rc.session.instructions = "Be helpful"
    rc.session.tools = [WEATHER_TOOL]
    pieces = ["Let me check. ", "<code>get_weather(city='Rome')</code>", " Done now."]
    outs, rc = run_llm(pieces, rc=rc)
    chunks = [o for o in outs if isinstance(o, LLMResponseChunk)]
    tool_chunks = [c for c in chunks if c.tools]
    assert tool_chunks and tool_chunks[0].tools[0].name == "get_weather"
    # tool call written back to history as pending FC
    assert rc.chat._pending_tool_calls


# ── output processor ─────────────────────────────────────────────────


def make_processor(tracker=None):
    qtext = Queue()
    proc = LMOutputProcessor(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(text_output_queue=qtext, speculative_turns=tracker),
    )
    return proc, qtext


def test_processor_forwards_text_to_tts_and_side_channel():
    proc, qtext = make_processor()
    chunk = LLMResponseChunk(text="Hello.", turn_id="t", turn_revision=0, cancel_generation=1)
    outs = list(proc.process(chunk))
    assert isinstance(outs[0], TTSInput) and outs[0].text == "Hello."
    evt = qtext.get_nowait()
    assert evt.type == "assistant_text" and evt.cancel_generation == 1


def test_processor_text_only_response_not_forwarded():
    proc, qtext = make_processor()
    chunk = LLMResponseChunk(
        text="Hello.", response=ResponseCreateParams(output_modalities=["text"])
    )
    assert list(proc.process(chunk)) == []
    assert qtext.get_nowait().type == "assistant_text"


def test_processor_error_emits_response_failed():
    proc, qtext = make_processor()
    outs = list(proc.process(EndOfResponse(error="boom", turn_id="t", turn_revision=0)))
    assert isinstance(outs[0], EndOfResponse) and outs[0].error is None
    assert qtext.get_nowait().type == "response_failed"


def test_processor_usage_event():
    proc, qtext = make_processor()
    assert list(proc.process(TokenUsage(input_tokens=3, output_tokens=9))) == []
    evt = qtext.get_nowait()
    assert evt.type == "token_usage" and evt.output_tokens == 9


# ── local JAX backend ────────────────────────────────────────────────


def test_local_jax_generates_pieces():
    handler = LocalJAXLLMHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(model_size="tiny", max_new_tokens=8),
    )
    rc = RuntimeConfig()
    rc.chat.add_item(make_user_message("hi"))
    outs = list(handler.process(GenerateResponseRequest(runtime_config=rc)))
    assert isinstance(outs[-1], EndOfResponse) and outs[-1].error is None


def _local_reply_tokens(handler, rc, response=None) -> int:
    req = GenerateResponseRequest(runtime_config=rc, response=response)
    outs = list(handler.process(req))
    text = "".join(o.text for o in outs if hasattr(o, "text") and o.text)
    return len(handler.tokenizer.encode(text))


def test_local_jax_honors_session_max_output_tokens():
    """``session.max_output_tokens`` caps the local decode (remote-backend
    parity, ``openai_backend.py::_resolve_max_tokens``); the response-level
    value wins over the session's, and both clamp to --llm_max_new_tokens."""
    from s2s_tpu.realtime.types import ResponseCreateParams

    handler = LocalJAXLLMHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(model_size="tiny", max_new_tokens=32),
    )
    rc = RuntimeConfig()
    rc.chat.add_item(make_user_message("hi"))
    rc.session.max_output_tokens = 4
    assert _local_reply_tokens(handler, rc) <= 4
    # response-level override beats the session's
    resp = ResponseCreateParams(max_output_tokens=2)
    assert _local_reply_tokens(handler, rc, response=resp) <= 2
    # "inf" falls back to the CLI default (clamp, not literal infinity)
    rc.session.max_output_tokens = "inf"
    assert handler._resolve_max_new(rc, None) == 32
    rc.session.max_output_tokens = 10_000
    assert handler._resolve_max_new(rc, None) == 32  # clamped to CLI cap


# ── remote backends over fake transports ─────────────────────────────


def sse(events):
    return "".join(f"data: {json.dumps(e)}\n\n" for e in events) + "data: [DONE]\n\n"


def make_remote(handler_cls, handler_func, **kw):
    from s2s_tpu.llm.openai_backend import RemoteLLMHandler

    transport = httpx.MockTransport(handler_func)
    client = httpx.Client(base_url="http://llm.test/v1", transport=transport)
    return handler_cls(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(client=client, base_url="http://llm.test/v1", **kw),
    )


def test_chat_completions_streaming():
    from s2s_tpu.llm.openai_backend import ChatCompletionsHandler

    def respond(request):
        assert request.url.path.endswith("/chat/completions")
        body = json.loads(request.read())
        assert body["stream"] and body["stream_options"] == {"include_usage": True}
        events = [
            {"choices": [{"delta": {"content": "Hi there. "}}]},
            {"choices": [{"delta": {"content": "Second sentence. Third. Fourth."}}]},
            {"choices": [{"delta": {}, "finish_reason": "stop"}], "usage": {"prompt_tokens": 11, "completion_tokens": 5}},
        ]
        return httpx.Response(200, text=sse(events), headers={"content-type": "text/event-stream"})

    handler = make_remote(ChatCompletionsHandler, respond)
    rc = RuntimeConfig()
    rc.chat.add_item(make_user_message("hello"))
    outs = list(handler.process(GenerateResponseRequest(runtime_config=rc)))
    chunks = [o for o in outs if isinstance(o, LLMResponseChunk)]
    assert chunks[0].text == "Hi there. Second sentence. Third."
    usage = [o for o in outs if isinstance(o, TokenUsage)][0]
    assert usage.input_tokens == 11 and usage.output_tokens == 5
    assert isinstance(outs[-1], EndOfResponse)


def test_chat_completions_tool_call_accumulation():
    from s2s_tpu.llm.openai_backend import ChatCompletionsHandler

    def respond(request):
        events = [
            {"choices": [{"delta": {"tool_calls": [{"index": 0, "function": {"name": "get_w"}}]}}]},
            {"choices": [{"delta": {"tool_calls": [{"index": 0, "function": {"name": "eather", "arguments": '{"city"'}}]}}]},
            {"choices": [{"delta": {"tool_calls": [{"index": 0, "function": {"arguments": ': "Oslo"}'}}]}, "finish_reason": "tool_calls"}]},
        ]
        return httpx.Response(200, text=sse(events), headers={"content-type": "text/event-stream"})

    handler = make_remote(ChatCompletionsHandler, respond)
    rc = RuntimeConfig()
    rc.chat.add_item(make_user_message("weather?"))
    outs = list(handler.process(GenerateResponseRequest(runtime_config=rc)))
    eor = outs[-1]
    assert isinstance(eor, EndOfResponse)
    # eager history record: FC pending in the original chat
    assert any(fc.name == "get_weather" for fc in rc.chat._pending_tool_calls.values())


def test_responses_api_streaming():
    from s2s_tpu.llm.openai_backend import ResponsesAPIHandler

    def respond(request):
        assert request.url.path.endswith("/responses")
        body = json.loads(request.read())
        assert body["store"] is False
        events = [
            {"type": "response.output_text.delta", "delta": "Sure thing. "},
            {"type": "response.output_text.delta", "delta": "All done."},
            {"type": "response.completed", "response": {"usage": {"input_tokens": 3, "output_tokens": 4}}},
        ]
        return httpx.Response(200, text=sse(events), headers={"content-type": "text/event-stream"})

    handler = make_remote(ResponsesAPIHandler, respond)
    rc = RuntimeConfig()
    rc.chat.add_item(make_user_message("go"))
    outs = list(handler.process(GenerateResponseRequest(runtime_config=rc)))
    chunks = [o for o in outs if isinstance(o, LLMResponseChunk)]
    assert "Sure thing." in chunks[0].text
    assert [o for o in outs if isinstance(o, TokenUsage)][0].output_tokens == 4


def test_remote_read_timeout_apology():
    from s2s_tpu.llm.openai_backend import READ_TIMEOUT_APOLOGY, ChatCompletionsHandler

    def respond(request):
        raise httpx.ReadTimeout("slow upstream")

    handler = make_remote(ChatCompletionsHandler, respond)
    rc = RuntimeConfig()
    rc.chat.add_item(make_user_message("hi"))
    outs = list(handler.process(GenerateResponseRequest(runtime_config=rc)))
    chunks = [o for o in outs if isinstance(o, LLMResponseChunk)]
    assert chunks and READ_TIMEOUT_APOLOGY.split(".")[0] in chunks[0].text
    assert isinstance(outs[-1], EndOfResponse) and outs[-1].error is None


def test_audio_turn_rollback_on_failure():
    from s2s_tpu.llm.openai_backend import ChatCompletionsHandler

    def respond(request):
        return httpx.Response(500, text="upstream broken")

    handler = make_remote(ChatCompletionsHandler, respond)
    rc = RuntimeConfig()
    req = GenerateResponseRequest(
        runtime_config=rc, audio=np.zeros(1600, np.float32), audio_sample_rate=16000
    )
    outs = list(handler.process(req))
    eor = outs[-1]
    assert isinstance(eor, EndOfResponse) and eor.error
    assert rc.chat.buffer == []  # transactional rollback removed the audio turn


def test_audio_turn_success_compacts_history():
    from s2s_tpu.llm.openai_backend import ChatCompletionsHandler

    def respond(request):
        body = json.loads(request.read())
        assert body["messages"][-1]["content"][0]["type"] == "input_audio"
        events = [
            {"choices": [{"delta": {"content": "Heard you."}}]},
            {"choices": [{"delta": {}, "finish_reason": "stop"}]},
        ]
        return httpx.Response(200, text=sse(events), headers={"content-type": "text/event-stream"})

    handler = make_remote(ChatCompletionsHandler, respond)
    rc = RuntimeConfig()
    req = GenerateResponseRequest(
        runtime_config=rc, audio=np.zeros(1600, np.float32), audio_sample_rate=16000
    )
    outs = list(handler.process(req))
    assert isinstance(outs[-1], EndOfResponse) and outs[-1].error is None
    roles = [getattr(x, "role", None) for x in rc.chat.buffer]
    assert roles == ["user", "assistant"]


# ── BPE tokenizer (real encode/decode from tokenizer.json) ───────────


@pytest.fixture(scope="module")
def bpe_json(tmp_path_factory):
    """A real byte-level BPE trained with the tokenizers runtime."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=True)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400,
        special_tokens=["<|endoftext|>", "<|im_start|>", "<|im_end|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "hello world, hello voice agents! 1234 tokens",
        "speech to speech on TPUs is fast",
        "¿cómo estás? très bien 你好",
    ] * 8
    tok.train_from_iterator(corpus, trainer)
    path = tmp_path_factory.mktemp("bpe") / "tokenizer.json"
    tok.save(str(path))
    return str(path)


SAMPLES = [
    "hello world",
    "The quick brown fox: 1234!",
    "  leading spaces and\nnewlines\t",
    "contractions don't stop it's fine we'll see",
    "unicode ¿cómo? 你好 émojis",
    "<|im_start|>user\nhi<|im_end|>",
    "",
]


def test_bpe_tokenizer_roundtrip(bpe_json):
    from s2s_tpu.llm.bpe_tokenizer import BPETokenizer

    tok = BPETokenizer(bpe_json)
    for text in SAMPLES:
        ids = tok.encode(text)
        assert tok.decode(ids, skip_special=False) == text, text


def test_bpe_pure_python_matches_tokenizers_runtime(bpe_json):
    """The dependency-free fallback must produce the same ids as the Rust
    runtime for GPT2-pattern byte-level BPEs."""
    import json as _json

    from s2s_tpu.llm.bpe_tokenizer import BPETokenizer, PurePythonBPE

    tok = BPETokenizer(bpe_json)
    assert tok._fast is not None  # runtime present in this image
    pure = PurePythonBPE(_json.loads(open(bpe_json).read()))
    for text in SAMPLES:
        assert pure.encode(text) == tok.encode(text), text
        assert pure.decode(tok.encode(text), skip_special=False) == text


def test_bpe_eos_and_specials(bpe_json):
    from s2s_tpu.llm.bpe_tokenizer import BPETokenizer

    tok = BPETokenizer(bpe_json)
    assert tok.decode(tok.encode("<|im_end|>")) == ""  # specials skipped
    assert tok.eos_id == tok.encode("<|im_end|>")[0]
    assert tok.vocab_size >= 300


def test_local_llm_generates_with_bpe_tokenizer(bpe_json):
    """Converted-weights path: the local JAX LLM decodes through the real
    BPE tokenizer (tiny random weights; coherence needs a real checkpoint)."""
    import jax

    from s2s_tpu.llm.bpe_tokenizer import BPETokenizer
    from s2s_tpu.models import decoder_lm

    tok = BPETokenizer(bpe_json)
    cfg = decoder_lm.DecoderLMConfig.tiny(vocab=512)
    params = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)
    handler = LocalJAXLLMHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(model_size="tiny", params=params, tokenizer=tok, max_new_tokens=8),
    )
    rc = RuntimeConfig()
    rc.chat.add_item(make_user_message("Hi"))
    outs = list(handler.process(GenerateResponseRequest(runtime_config=rc)))
    assert isinstance(outs[-1], EndOfResponse) and outs[-1].error is None


def test_processor_stale_end_of_response_not_forwarded():
    from s2s_tpu.llm.output_processor import LMOutputProcessor
    from s2s_tpu.pipeline.messages import EndOfResponse

    tracker = SpeculativeTurnTracker()
    tracker.observe("t1", 1)
    proc = LMOutputProcessor(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(text_output_queue=Queue(), speculative_turns=tracker),
    )
    outs = list(proc.process(EndOfResponse(turn_id="t1", turn_revision=0)))
    assert outs == []
    outs = list(proc.process(EndOfResponse(turn_id="t1", turn_revision=1)))
    assert any(isinstance(o, EndOfResponse) for o in outs)


def test_processor_cancel_generation_rides_through_to_tts():
    from s2s_tpu.llm.output_processor import LMOutputProcessor
    from s2s_tpu.pipeline.messages import LLMResponseChunk, TTSInput

    proc = LMOutputProcessor(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(text_output_queue=Queue()),
    )
    outs = list(proc.process(LLMResponseChunk(
        text="Hello.", turn_id="t1", turn_revision=0, cancel_generation=7)))
    tts = [o for o in outs if isinstance(o, TTSInput)]
    assert tts and tts[0].cancel_generation == 7


def test_processor_held_chunk_released_after_cancelled_reopen():
    from s2s_tpu.llm.output_processor import LMOutputProcessor
    from s2s_tpu.pipeline.messages import LLMResponseChunk, TTSInput

    tracker = SpeculativeTurnTracker()
    tracker.observe("t1", 0)
    candidate = tracker.begin_reopen_candidate("t1", 0)
    proc = LMOutputProcessor(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(text_output_queue=Queue(), speculative_turns=tracker),
    )
    results = []

    def run():
        results.extend(proc.process(LLMResponseChunk(
            text="Held.", turn_id="t1", turn_revision=0)))

    t = threading.Thread(target=run)
    t.start()
    time.sleep(0.15)
    assert results == []  # held while the reopen is pending
    tracker.cancel_reopen_candidate("t1", candidate)
    t.join(timeout=5)
    assert any(isinstance(o, TTSInput) for o in results)


def test_processor_confirmed_reopen_drops_held_chunk():
    from s2s_tpu.llm.output_processor import LMOutputProcessor
    from s2s_tpu.pipeline.messages import LLMResponseChunk, TTSInput

    tracker = SpeculativeTurnTracker()
    tracker.observe("t1", 0)
    candidate = tracker.begin_reopen_candidate("t1", 0)
    proc = LMOutputProcessor(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(text_output_queue=Queue(), speculative_turns=tracker),
    )
    results = []

    def run():
        results.extend(proc.process(LLMResponseChunk(
            text="Superseded.", turn_id="t1", turn_revision=0)))

    t = threading.Thread(target=run)
    t.start()
    time.sleep(0.1)
    tracker.confirm_reopen_candidate("t1", 0, candidate)
    t.join(timeout=5)
    assert not any(isinstance(o, TTSInput) for o in results)


# ── speculative first-sentence generation (local JAX + batched engine) ─


def _spec_pair(max_new_tokens=8, speculative=True):
    """Handler + engine sharing one tiny weight set."""
    import jax

    from s2s_tpu.llm.local_backend import lm_config
    from s2s_tpu.models import decoder_lm
    from s2s_tpu.parallel.session_scheduler import BatchedLMScheduler

    cfg = lm_config("tiny")
    params = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)
    engine = BatchedLMScheduler(params, cfg, n_slots=2, eos_id=0, chunk_tokens=4)
    handler = LocalJAXLLMHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(
            model_size="tiny", params=params, shared_lm=engine,
            speculative_prefill=speculative, max_new_tokens=max_new_tokens,
        ),
    )
    return handler, engine, params


def _reply_text(outs):
    return "".join(o.text for o in outs if isinstance(o, LLMResponseChunk))


def test_speculative_adoption_on_exact_match():
    """Partial == final: the real request adopts the already-decoding slot
    (the engine's generate() is never called) and the reply is identical to
    the non-speculative run."""
    from s2s_tpu.pipeline.messages import SpeculativeGenerateRequest

    handler, engine, params = _spec_pair()
    plain, engine2, _ = _spec_pair(speculative=False)
    try:
        rc_plain = RuntimeConfig()
        rc_plain.chat.add_item(make_user_message("hi"))
        want = _reply_text(list(plain.process(GenerateResponseRequest(runtime_config=rc_plain))))

        rc = RuntimeConfig()
        assert list(handler.process(
            SpeculativeGenerateRequest(runtime_config=rc, text="hi", turn_id="t", turn_revision=0)
        )) == []
        assert handler._spec is not None
        time.sleep(0.5)  # speculation decodes while "STT" finishes

        def boom(*a, **k):
            raise AssertionError("generate() must not run on adoption")

        engine.generate = boom
        rc.chat.add_item(make_user_message("hi"))  # the service bridge's write
        outs = list(handler.process(GenerateResponseRequest(
            runtime_config=rc, turn_id="t", turn_revision=0
        )))
        assert isinstance(outs[-1], EndOfResponse) and outs[-1].error is None
        assert _reply_text(outs) == want
        assert handler._spec is None
    finally:
        engine.shutdown()
        engine2.shutdown()


def test_speculative_mismatch_falls_back():
    """Final text differs from the partial: speculation is cancelled, the
    normal path runs, output equals the plain run, no slot leaks."""
    from s2s_tpu.pipeline.messages import SpeculativeGenerateRequest

    handler, engine, params = _spec_pair()
    plain, engine2, _ = _spec_pair(speculative=False)
    try:
        rc_plain = RuntimeConfig()
        rc_plain.chat.add_item(make_user_message("hello there"))
        want = _reply_text(list(plain.process(GenerateResponseRequest(runtime_config=rc_plain))))

        rc = RuntimeConfig()
        list(handler.process(SpeculativeGenerateRequest(runtime_config=rc, text="hi")))
        rc.chat.add_item(make_user_message("hello there"))
        outs = list(handler.process(GenerateResponseRequest(runtime_config=rc)))
        assert _reply_text(outs) == want
        deadline = time.monotonic() + 10
        while sorted(engine._free) != [0, 1] and time.monotonic() < deadline:
            time.sleep(0.02)
        assert sorted(engine._free) == [0, 1]  # speculative slot retired
    finally:
        engine.shutdown()
        engine2.shutdown()


def test_speculation_skipped_for_answered_turn():
    """A speculative request queued behind the real one (same turn) must not
    start a garbage generation after the turn was answered."""
    from s2s_tpu.pipeline.messages import SpeculativeGenerateRequest

    handler, engine, _ = _spec_pair()
    try:
        rc = RuntimeConfig()
        rc.chat.add_item(make_user_message("hi"))
        list(handler.process(GenerateResponseRequest(runtime_config=rc, turn_id="t", turn_revision=1)))
        list(handler.process(SpeculativeGenerateRequest(
            runtime_config=rc, text="hi", turn_id="t", turn_revision=1
        )))
        assert handler._spec is None
    finally:
        engine.shutdown()


def test_session_end_cancels_speculation():
    from s2s_tpu.pipeline.messages import SpeculativeGenerateRequest

    handler, engine, _ = _spec_pair()
    try:
        rc = RuntimeConfig()
        list(handler.process(SpeculativeGenerateRequest(runtime_config=rc, text="hi")))
        assert handler._spec is not None
        handler.on_session_end()
        assert handler._spec is None
        deadline = time.monotonic() + 10
        while sorted(engine._free) != [0, 1] and time.monotonic() < deadline:
            time.sleep(0.02)
        assert sorted(engine._free) == [0, 1]
    finally:
        engine.shutdown()


def test_speculative_adoption_promotes_to_priority_lane():
    """Adoption promotes the speculative slot mid-flight: any not-yet-decoded
    remainder moves from the steady lane into the priority lane (the serving
    default measured 0.63 s of loaded-latency LLM phase without this)."""
    from s2s_tpu.pipeline.messages import SpeculativeGenerateRequest

    handler, engine, params = _spec_pair(max_new_tokens=24)
    promoted = []
    real_start = engine.start

    def spy_start(*a, **k):
        h = real_start(*a, **k)
        if h is not None:
            real_promote = h.promote
            h.promote = lambda *pa, **pk: (promoted.append(True), real_promote(*pa, **pk))
        return h

    engine.start = spy_start
    try:
        rc = RuntimeConfig()
        list(handler.process(
            SpeculativeGenerateRequest(runtime_config=rc, text="hi", turn_id="t", turn_revision=0)
        ))
        assert handler._spec is not None
        rc.chat.add_item(make_user_message("hi"))
        outs = list(handler.process(GenerateResponseRequest(
            runtime_config=rc, turn_id="t", turn_revision=0
        )))
        assert isinstance(outs[-1], EndOfResponse) and outs[-1].error is None
        assert promoted, "adoption must promote the speculative slot"
    finally:
        engine.shutdown()


def test_over_capacity_prompt_keeps_budget_via_tail_fit():
    """A rendered prompt longer than the engine's per-slot KV capacity must
    still produce a full reply: the backend fits the prompt to
    ``prompt_capacity(max_new)`` keeping the tail (the user turn is last in
    the template).  Without the fit, the scheduler's admission clamp
    (correct for cache integrity) zeroes the budget and the turn silently
    yields no text — the soak-server failure mode this pins."""
    import jax

    from s2s_tpu.llm.local_backend import lm_config
    from s2s_tpu.models import decoder_lm
    from s2s_tpu.parallel.session_scheduler import BatchedLMScheduler

    cfg = lm_config("tiny")
    params = decoder_lm.init_params(jax.random.PRNGKey(0), cfg)
    engine = BatchedLMScheduler(params, cfg, n_slots=2, eos_id=0,
                                chunk_tokens=4, priority_tokens=4, max_t=32)
    handler = LocalJAXLLMHandler(
        threading.Event(), Queue(), Queue(),
        setup_kwargs=dict(
            model_size="tiny", params=params, shared_lm=engine,
            speculative_prefill=False, max_new_tokens=8,
        ),
    )
    try:
        cap = engine.prompt_capacity(8)
        rc = RuntimeConfig()
        rc.chat.add_item(make_user_message("words " * (4 * cap)))  # >> capacity
        outs = list(handler.process(GenerateResponseRequest(runtime_config=rc)))
        assert isinstance(outs[-1], EndOfResponse) and outs[-1].error is None
        assert _reply_text(outs), "over-capacity prompt must still generate"
        # sanity: the prompt really was over capacity before the fit
        ids = handler.tokenizer.encode("words " * (4 * cap))
        assert len(ids) > cap
    finally:
        engine.shutdown()
