"""Chat spec depth: reference ``tests/test_chat.py`` behaviors without repo
counterparts in ``test_chat.py`` / ``test_chat_matrix.py`` — compaction
FC/FCO range rules, close-suppression, wrong-return-type guard, snapshot
media stripping, copy/reset invariants, call_id auto-generation, status
propagation fine points, and chat-template rendering through a real
sandboxed Jinja template.

Reference: /root/reference/tests/test_chat.py (behavior source only).
"""

import threading

import pytest

from s2s_tpu.llm.chat import (
    Chat,
    ChatItemError,
    CompactionResult,
    build_active_chat,
    make_assistant_message,
    make_system_message,
    make_user_audio_message,
    make_user_message,
)
from s2s_tpu.realtime.types import (
    FunctionCallItem,
    FunctionCallOutputItem,
    InputAudioContent,
    InputImageContent,
    InputTextContent,
    MessageItem,
    OutputAudioContent,
    OutputTextContent,
    ResponseCreateParams,
)

# ── helpers ──────────────────────────────────────────────────────────


def _user(text):
    return make_user_message(text)


def _assistant(text):
    return make_assistant_message(text)


def _fc(call_id="c1", name="my_func", arguments="{}"):
    if not call_id.startswith("call_"):
        call_id = f"call_{call_id}"
    return FunctionCallItem(id=f"fc_{call_id}", call_id=call_id, name=name, arguments=arguments)


def _fco(call_id="c1", output='{"ok": true}', status=None):
    if not call_id.startswith("call_"):
        call_id = f"call_{call_id}"
    return FunctionCallOutputItem(call_id=call_id, output=output, status=status)


def _user_parts(*parts):
    content = []
    for kind, value in parts:
        if kind == "text":
            content.append(InputTextContent(text=value))
        elif kind == "image":
            content.append(InputImageContent(image_url=value))
        elif kind == "audio":  # transcript-only: NOT a supported input part
            content.append(InputAudioContent(transcript=value))
    return MessageItem(role="user", content=content)


def _wait_compaction(chat, timeout=2.0):
    thread = chat._compact_thread
    if thread is not None:
        thread.join(timeout)
        assert not thread.is_alive(), "compaction thread did not finish in time"


def _stub_compactor(user_text="USER_SUMMARY", assistant_text="ASSISTANT_SUMMARY", *,
                    gate=None, started=None, captured=None):
    def stub(snapshot):
        if started is not None:
            started.set()
        if captured is not None:
            captured.append(snapshot)
        if gate is not None:
            gate.wait(timeout=2.0)
        return CompactionResult(user_summary=user_text, assistant_summary=assistant_text)

    return stub


def _fill_turns(chat, n=3):
    for i in range(n):
        chat.add_item(_user(f"u{i}"))
        chat.add_item(_assistant(f"a{i}"))
    chat.add_item(_user(f"u{n}"))


# ── compaction FC/FCO range rules ────────────────────────────────────


def test_compaction_leaves_pending_fc_in_pending_map():
    """A pending FC (no FCO yet) survives compaction in the pending map and
    re-injects adjacent to its FCO when it finally arrives."""
    chat = Chat(size=2)
    chat.add_item(_user("u0"))
    chat.add_item(_assistant("a0"))
    chat.add_item(_fc("c1"))
    for i in range(1, 3):
        chat.add_item(_user(f"u{i}"))
        chat.add_item(_assistant(f"a{i}"))
    chat.add_item(_user("u3"))
    chat.trim_if_needed(_stub_compactor())
    _wait_compaction(chat)

    assert not any(isinstance(x, FunctionCallItem) for x in chat.buffer)
    assert "call_c1" in chat._pending_tool_calls

    chat.add_item(_fco("c1"))
    fc_idx = [i for i, x in enumerate(chat.buffer) if isinstance(x, FunctionCallItem)]
    fco_idx = [i for i, x in enumerate(chat.buffer) if isinstance(x, FunctionCallOutputItem)]
    assert len(fc_idx) == 1 and len(fco_idx) == 1 and fco_idx[0] == fc_idx[0] + 1
    assert "call_c1" not in chat._pending_tool_calls


def test_compaction_drops_paired_fc_fco_in_range():
    chat = Chat(size=2)
    chat.add_item(_user("u0"))
    chat.add_item(_fc("c1"))
    chat.add_item(_fco("c1"))
    chat.add_item(_assistant("a0"))
    for i in range(1, 3):
        chat.add_item(_user(f"u{i}"))
        chat.add_item(_assistant(f"a{i}"))
    chat.add_item(_user("u3"))
    chat.trim_if_needed(_stub_compactor())
    _wait_compaction(chat)

    assert not any(isinstance(x, FunctionCallItem) for x in chat.buffer)
    assert not any(isinstance(x, FunctionCallOutputItem) for x in chat.buffer)


def test_compaction_keeps_fc_when_fco_arrives_mid_flight():
    """An FCO landing between snapshot and splice re-injects its FC *after*
    the snapshot range, so the splice must keep the pair adjacent."""
    chat = Chat(size=2)
    gate, started = threading.Event(), threading.Event()
    chat.add_item(_user("u0"))
    chat.add_item(_fc("c1"))
    chat.add_item(_assistant("a0"))
    for i in range(1, 3):
        chat.add_item(_user(f"u{i}"))
        chat.add_item(_assistant(f"a{i}"))
    chat.add_item(_user("u3"))
    chat.trim_if_needed(_stub_compactor(gate=gate, started=started))
    assert started.wait(timeout=2.0)

    chat.add_item(_fco("c1"))
    gate.set()
    _wait_compaction(chat)

    fc_idx = [i for i, x in enumerate(chat.buffer) if isinstance(x, FunctionCallItem)]
    fco_idx = [i for i, x in enumerate(chat.buffer) if isinstance(x, FunctionCallOutputItem)]
    assert len(fc_idx) == 1 and len(fco_idx) == 1 and fco_idx[0] == fc_idx[0] + 1
    assert chat.buffer[fc_idx[0]].call_id == "call_c1"


def test_close_suppresses_splice():
    chat = Chat(size=2)
    gate, started = threading.Event(), threading.Event()
    _fill_turns(chat)
    chat.trim_if_needed(_stub_compactor(gate=gate, started=started))
    assert started.wait(timeout=2.0)

    before = list(chat.buffer)
    chat.close()
    gate.set()
    _wait_compaction(chat)
    assert chat.buffer == before


def test_compactor_wrong_return_type_leaves_chat_unchanged():
    chat = Chat(size=2)
    _fill_turns(chat)
    chat.trim_if_needed(lambda snapshot: ("u", "a"))  # not a CompactionResult
    _wait_compaction(chat)
    user_texts = [
        x.content[0].text for x in chat.buffer if isinstance(x, MessageItem) and x.role == "user"
    ]
    assert user_texts == ["u0", "u1", "u2", "u3"]


def test_compaction_snapshot_strips_images():
    chat = Chat(size=2)
    captured: list = []
    chat.add_item(_user_parts(("text", "look"), ("image", "http://img.png")))
    chat.add_item(_assistant("a0"))
    for i in range(1, 3):
        chat.add_item(_user(f"u{i}"))
        chat.add_item(_assistant(f"a{i}"))
    chat.add_item(_user("u3"))
    chat.trim_if_needed(_stub_compactor(captured=captured))
    _wait_compaction(chat)

    assert len(captured) == 1
    for msg in captured[0]:
        if isinstance(msg, dict) and msg.get("role") == "user":
            assert all(c.get("type") != "input_image" for c in msg.get("content", []))


# ── copy / reset invariants ──────────────────────────────────────────


def test_copy_preserves_init_size_and_turn_count():
    chat = Chat(size=7)
    sys_msg = make_system_message("Keep it short.")
    chat.init_chat(sys_msg)
    chat.add_item(_user("u1"))
    chat.add_item(_user("u2"))
    clone = chat.copy()
    assert clone.system_message is sys_msg
    assert clone.size == 7
    assert clone._user_turns == 2


def test_copy_pending_tool_calls_independent():
    chat = Chat(size=5)
    chat.add_item(_fc("c1"))
    clone = chat.copy()
    assert "call_c1" in clone._pending_tool_calls
    clone._pending_tool_calls.pop("call_c1")
    assert "call_c1" in chat._pending_tool_calls


def test_reset_preserves_size():
    chat = Chat(size=3)
    chat.reset()
    assert chat.size == 3


# ── add_item fine points ─────────────────────────────────────────────


def test_function_call_none_call_id_auto_generates():
    chat = Chat(size=5)
    fc = FunctionCallItem(call_id=None, name="f", arguments="{}")
    chat.add_item(fc)
    assert fc.call_id is not None and fc.call_id.startswith("call_")


def test_function_call_bad_call_id_prefix_raises():
    chat = Chat(size=5)
    with pytest.raises(ChatItemError, match="call_"):
        chat.add_item(FunctionCallItem(call_id="", name="f", arguments="{}"))


def test_unknown_fco_error_names_the_call_id():
    chat = Chat(size=5)
    with pytest.raises(ChatItemError, match="unknown_id"):
        chat.append_tool_output("unknown_id", _fco("unknown_id"))


def test_user_audio_transcript_only_part_is_filtered():
    """An input_audio part with only a transcript (no base64 audio) is not a
    supported modality; a message reduced to nothing must raise."""
    chat = Chat(size=5)
    with pytest.raises(ChatItemError, match="no supported content"):
        chat.add_item(_user_parts(("audio", "transcript only")))


def test_user_audio_with_base64_is_kept():
    chat = Chat(size=5)
    chat.add_item(make_user_audio_message("abc123"))
    part = chat.buffer[0].content[0]
    assert part.type == "input_audio" and part.audio == "abc123"


def test_reinjection_sets_status_from_fco():
    chat = Chat(size=1)
    chat.add_item(_user("u1"))
    chat.add_item(_fc("cx"))
    chat.add_item(_user("u2"))
    chat.trim_if_needed()
    assert "call_cx" in chat._pending_tool_calls

    chat.append_tool_output("call_cx", _fco("cx", status="incomplete"))
    fc = next(e for e in chat.buffer if isinstance(e, FunctionCallItem))
    assert fc.status == "incomplete"


def test_in_buffer_fc_in_progress_status_propagates():
    chat = Chat(size=5)
    fc = _fc("c1")
    chat.add_item(fc)
    chat.append_tool_output("call_c1", _fco("c1", status="in_progress"))
    assert fc.status == "in_progress"


# ── responses serialization fine points ──────────────────────────────


def test_responses_fco_without_status_omits_key():
    chat = Chat(size=5)
    chat.add_item(_fc("c1"))
    fco = _fco("c1")
    chat.add_item(fco)
    entry = chat.to_responses_input()[-1]
    assert entry["type"] == "function_call_output"
    assert entry["id"] == fco.id
    assert "status" not in entry


def test_responses_fc_carries_id_and_completed_status_after_fco():
    chat = Chat(size=5)
    fc = _fc("c1", "search", '{"q": "test"}')
    chat.add_item(fc)
    chat.add_item(_fco("c1", '{"result": 1}', status="completed"))
    entry = chat.to_responses_input()[0]
    assert entry["type"] == "function_call"
    assert entry["call_id"] == "call_c1"
    assert entry["name"] == "search"
    assert entry["arguments"] == '{"q": "test"}'
    assert entry["id"] == fc.id
    assert entry["status"] == "completed"


# ── chat-template serialization fine points ──────────────────────────


def test_chat_messages_user_multi_text_parts_joined():
    chat = Chat(size=5)
    chat.add_item(_user_parts(("text", "hello"), ("text", "world")))
    assert chat.to_chat_messages()[0]["content"] == "hello world"


def test_chat_messages_assistant_parts_joined():
    chat = Chat(size=5)
    chat.add_item(
        MessageItem(
            role="assistant",
            content=[OutputTextContent(text="part1"), OutputTextContent(text="part2")],
        )
    )
    assert chat.to_chat_messages()[0] == {"role": "assistant", "content": "part1 part2"}


def test_assistant_audio_only_message_skipped():
    chat = Chat(size=5)
    chat.add_item(MessageItem(role="assistant", content=[OutputAudioContent(transcript="only audio")]))
    assert chat.buffer == []


def test_every_assistant_entry_exposes_content():
    chat = Chat(size=10)
    chat.add_item(_user("Do it"))
    chat.add_item(_fc("c1", "action", '{"a": 1}'))
    chat.add_item(_fco("c1", "done"))
    chat.add_item(_assistant("All set."))
    assistant_entries = [m for m in chat.to_chat_messages() if m["role"] == "assistant"]
    assert len(assistant_entries) == 2
    assert all("content" in m for m in assistant_entries)


def test_function_call_renders_in_template_reading_content():
    """Chat templates read ``content`` on every assistant message, tool-call
    turns included — a missing key raises in a sandboxed template."""
    sandbox = pytest.importorskip("jinja2.sandbox")
    chat = Chat(size=5)
    chat.add_item(_user("What's the weather?"))
    chat.add_item(_fc("c1", "get_weather", '{"city": "Paris"}'))
    chat.add_item(_fco("c1", "18C, clear"))
    template = sandbox.ImmutableSandboxedEnvironment().from_string(
        "{% for m in messages %}{{ m.role + ':' + m.content + '\n' }}{% endfor %}"
    )
    rendered = template.render(messages=chat.to_chat_messages())
    assert "assistant:\n" in rendered


def test_chat_messages_full_mixed_conversation():
    chat = Chat(size=10)
    chat.init_chat(make_system_message("System prompt"))
    chat.add_item(_user("Do it"))
    chat.add_item(_fc("c1", "action", '{"a": 1}'))
    chat.add_item(_fco("c1", "done"))
    chat.add_item(_assistant("All set."))
    result = chat.to_chat_messages()
    assert len(result) == 5
    assert result[0] == {"role": "system", "content": "System prompt"}
    assert result[1] == {"role": "user", "content": "Do it"}
    assert result[2]["role"] == "assistant" and "tool_calls" in result[2]
    assert result[3]["role"] == "tool" and result[3]["name"] == "action"
    assert result[4] == {"role": "assistant", "content": "All set."}


def test_chat_messages_fc_empty_string_args_falls_back():
    chat = Chat(size=5)
    chat.add_item(_fc("c1", "f", ""))
    chat.add_item(_fco("c1", "ok"))
    assert chat.to_chat_messages()[0]["tool_calls"][0]["function"]["arguments"] == {}


# ── build_active_chat identity fine points ───────────────────────────


def _default_chat():
    chat = Chat(size=4)
    chat.init_chat(make_system_message("default system"))
    chat.add_item(_user("default question"))
    return chat


def test_absent_input_copy_shares_init_message_identity():
    original = _default_chat()
    active = build_active_chat(original, ResponseCreateParams(conversation="none", input=None))
    assert active is not original
    assert active.system_message is original.system_message
    texts = [p.text for item in active.buffer for p in item.content]
    assert texts == ["default question"]


def test_seeded_fresh_chat_has_no_default_history_or_system():
    original = _default_chat()
    active = build_active_chat(
        original,
        ResponseCreateParams(
            conversation="none",
            input=[make_user_message("fresh question").model_dump(exclude_none=True)],
        ),
    )
    texts = [p.text for item in active.buffer for p in item.content]
    assert texts == ["fresh question"]
    assert active.system_message is None


def test_orphan_fco_input_item_raises():
    original = _default_chat()
    orphan = FunctionCallOutputItem(call_id="call_missing", output="{}").model_dump(exclude_none=True)
    with pytest.raises(ChatItemError):
        build_active_chat(original, ResponseCreateParams(conversation="none", input=[orphan]))
