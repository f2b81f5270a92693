"""Chat store tests: eviction, FC/FCO pairing, speculative edits, rollback,
serializers, audio placeholdering, compaction (stubbed compactor)."""

import threading
import time

import pytest

from s2s_tpu.llm.chat import (
    AUDIO_INPUT_HISTORY_PLACEHOLDER,
    Chat,
    ChatItemError,
    CompactionResult,
    add_supported_item,
    build_active_chat,
    make_assistant_message,
    make_system_message,
    make_user_audio_message,
    make_user_message,
)
from s2s_tpu.realtime.types import (
    FunctionCallItem,
    FunctionCallOutputItem,
    InputImageContent,
    InputTextContent,
    MessageItem,
    ResponseCreateParams,
)


def add_turn(chat, user_text, assistant_text):
    chat.add_item(make_user_message(user_text))
    chat.add_item(make_assistant_message(assistant_text))


# ── basic intake ─────────────────────────────────────────────────────


def test_add_user_and_assistant():
    chat = Chat(5)
    add_turn(chat, "hi", "hello")
    assert chat.user_turn_count == 1
    assert len(chat.buffer) == 2
    assert chat.buffer[0].id.startswith("msg_")


def test_system_item_routes_to_system_slot():
    chat = Chat(5)
    chat.add_item(make_system_message("be brief"))
    assert chat.system_message is not None
    assert chat.buffer == []


def test_empty_user_message_rejected():
    chat = Chat(5)
    with pytest.raises(ChatItemError):
        chat.add_item(MessageItem(role="user", content=[InputTextContent(text="")]))


def test_empty_assistant_message_silently_skipped():
    chat = Chat(5)
    chat.add_item(make_assistant_message(""))
    assert chat.buffer == []


def test_bad_id_prefix_rejected():
    chat = Chat(5)
    msg = make_user_message("x")
    msg.id = "wrong_123"
    with pytest.raises(ChatItemError):
        chat.add_item(msg)


# ── function call pairing ────────────────────────────────────────────


def make_fc(call_id="call_1", name="f"):
    return FunctionCallItem(call_id=call_id, name=name, arguments="{}")


def test_fc_waits_in_pending_until_fco():
    chat = Chat(5)
    chat.add_item(make_fc())
    assert chat.buffer == []  # FC parks in the pending map until its FCO arrives


def test_fco_without_fc_raises():
    chat = Chat(5)
    with pytest.raises(ChatItemError):
        chat.add_item(FunctionCallOutputItem(call_id="call_zzz", output="{}"))


def test_fc_fco_pairing_reinjects_pending():
    chat = Chat(5)
    chat.add_item(make_fc("call_7"))
    chat.add_item(FunctionCallOutputItem(call_id="call_7", output='{"ok":1}'))
    types = [item.type for item in chat.buffer]
    assert types == ["function_call", "function_call_output"]
    assert chat.buffer[0].status == "completed"


def test_eviction_preserves_pending_fc_for_late_fco():
    chat = Chat(1)
    chat.add_item(make_fc("call_9"))
    # Overflow the hard cap so turns evict around the pending FC.
    for i in range(4):
        add_turn(chat, f"u{i}", f"a{i}")
    chat.add_item(FunctionCallOutputItem(call_id="call_9", output="{}"))
    call_items = [x for x in chat.buffer if x.type == "function_call"]
    assert len(call_items) == 1 and call_items[0].call_id == "call_9"


# ── eviction / trim ──────────────────────────────────────────────────


def test_trim_if_needed_evicts_oldest_complete_turn():
    chat = Chat(2)
    for i in range(4):
        add_turn(chat, f"u{i}", f"a{i}")
    chat.trim_if_needed()
    assert chat.user_turn_count == 2
    first_user = next(x for x in chat.buffer if x.role == "user")
    assert first_user.content[0].text == "u2"


def test_hard_cap_enforced_inline():
    chat = Chat(1)
    for i in range(5):
        add_turn(chat, f"u{i}", f"a{i}")
    assert chat.user_turn_count <= 2  # 2 * size


# ── speculative edits ────────────────────────────────────────────────


def test_replace_user_message_text():
    chat = Chat(5)
    item = chat.add_item(make_user_message("partial"))
    assert chat.replace_user_message_text(item.id, "full transcript")
    assert chat.buffer[0].content[0].text == "full transcript"
    assert not chat.replace_user_message_text("msg_nope", "x")


def test_remove_user_message():
    chat = Chat(5)
    item = chat.add_item(make_user_message("oops"))
    assert chat.remove_user_message(item.id)
    assert chat.user_turn_count == 0
    assert not chat.remove_user_message(item.id)


def test_rollback_generation_removes_only_provisional_items():
    chat = Chat(5)
    user = chat.add_item(make_user_message("question"))
    asst = chat.add_item(make_assistant_message("partial answer"))
    chat.add_item(make_fc("call_r"))
    chat.add_item(FunctionCallOutputItem(call_id="call_r", output="{}"))
    bystander = chat.add_item(make_user_message("next turn already"))
    chat.rollback_generation(user.id, item_ids={asst.id}, call_ids={"call_r"})
    assert [x.id for x in chat.buffer] == [bystander.id]
    assert chat.user_turn_count == 1


# ── media management ─────────────────────────────────────────────────


def test_compact_audio_history_replaces_older_audio():
    chat = Chat(10)
    for i in range(3):
        chat.add_item(make_user_audio_message("QUJD"))
        chat.add_item(make_assistant_message(f"a{i}"))
    chat.compact_audio_history(1)
    audio_turns = [
        x
        for x in chat.buffer
        if x.type == "message" and x.role == "user" and any(p.type == "input_audio" for p in x.content)
    ]
    assert len(audio_turns) == 1
    placeholders = [
        p.text
        for x in chat.buffer
        if getattr(x, "role", None) == "user"
        for p in x.content
        if p.type == "input_text"
    ]
    assert placeholders.count(AUDIO_INPUT_HISTORY_PLACEHOLDER) == 2


def test_strip_images_respects_only_ids():
    chat = Chat(10)
    m1 = chat.add_item(
        MessageItem(role="user", content=[InputTextContent(text="look"), InputImageContent(image_url="data:x")])
    )
    m2 = chat.add_item(
        MessageItem(role="user", content=[InputTextContent(text="and"), InputImageContent(image_url="data:y")])
    )
    assert chat.image_message_ids() == {m1.id, m2.id}
    chat.strip_images(only_ids={m1.id})
    assert chat.image_message_ids() == {m2.id}
    chat.strip_images()
    assert chat.image_message_ids() == set()


# ── serializers ──────────────────────────────────────────────────────


def test_to_responses_input_shapes():
    chat = Chat(10)
    chat.init_chat(make_system_message("sys prompt"))
    add_turn(chat, "hi", "hello")
    chat.add_item(make_fc("call_s", name="now"))
    chat.add_item(FunctionCallOutputItem(call_id="call_s", output='"3pm"'))
    out = chat.to_responses_input()
    assert out[0]["role"] == "system"
    assert out[1] == {"type": "message", "role": "user", "content": [{"type": "input_text", "text": "hi"}]}
    assert out[2]["role"] == "assistant"
    assert out[2]["status"] == "completed"
    assert out[3]["type"] == "function_call"
    assert out[3]["call_id"] == "call_s"
    assert out[4]["type"] == "function_call_output"


def test_to_responses_input_audio_becomes_placeholder():
    chat = Chat(10)
    chat.add_item(make_user_audio_message("QUJD"))
    out = chat.to_responses_input()
    assert out[0]["content"] == [{"type": "input_text", "text": AUDIO_INPUT_HISTORY_PLACEHOLDER}]


def test_to_chat_messages_tool_calls():
    chat = Chat(10)
    chat.init_chat(make_system_message("s"))
    add_turn(chat, "q", "a")
    chat.add_item(FunctionCallItem(call_id="call_t", name="get", arguments='{"x": 1}'))
    chat.add_item(FunctionCallOutputItem(call_id="call_t", output="42"))
    msgs = chat.to_chat_messages()
    assert msgs[0] == {"role": "system", "content": "s"}
    assert msgs[1] == {"role": "user", "content": "q"}
    tool_call_msg = msgs[3]
    assert tool_call_msg["role"] == "assistant"
    assert tool_call_msg["content"] == ""
    assert tool_call_msg["tool_calls"][0]["function"] == {"name": "get", "arguments": {"x": 1}}
    assert msgs[4] == {"role": "tool", "tool_call_id": "call_t", "name": "get", "content": "42"}


# ── copy / reset / active chat ───────────────────────────────────────


def test_copy_is_snapshot():
    chat = Chat(5)
    add_turn(chat, "u", "a")
    clone = chat.copy()
    chat.add_item(make_user_message("later"))
    assert clone.user_turn_count == 1
    assert chat.user_turn_count == 2


def test_build_active_chat_semantics():
    chat = Chat(5)
    add_turn(chat, "u", "a")
    # None -> copy of conversation
    copy = build_active_chat(chat, None)
    assert copy.user_turn_count == 1
    # [] -> fresh empty
    fresh = build_active_chat(chat, ResponseCreateParams(input=[]))
    assert fresh.user_turn_count == 0 and fresh.buffer == []
    # [...] -> seeded
    seeded = build_active_chat(
        chat,
        ResponseCreateParams(
            input=[{"type": "message", "role": "user", "content": [{"type": "input_text", "text": "oob"}]}]
        ),
    )
    assert seeded.user_turn_count == 1
    assert seeded.buffer[0].content[0].text == "oob"


def test_add_supported_item_requires_client_call_id():
    chat = Chat(5)
    with pytest.raises(ChatItemError):
        add_supported_item(chat, FunctionCallItem(call_id=None, name="f", arguments="{}"))


# ── compaction ───────────────────────────────────────────────────────


def _wait_for(predicate, timeout=3.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if predicate():
            return True
        time.sleep(0.01)
    return False


def test_background_compaction_splices_summary_pair():
    chat = Chat(2)
    for i in range(4):
        add_turn(chat, f"u{i}", f"a{i}")
    calls = []

    def compactor(snapshot):
        calls.append(snapshot)
        return CompactionResult(user_summary="[sum-u]", assistant_summary="[sum-a]")

    chat.trim_if_needed(compactor)
    assert _wait_for(lambda: chat.buffer and chat.buffer[0].content[0].text == "[sum-u]")
    assert chat.buffer[1].content[0].text == "[sum-a]"
    # newest turn preserved behind the summary
    tail_texts = [x.content[0].text for x in chat.buffer[2:]]
    assert "u3" in tail_texts and "a3" in tail_texts
    assert len(calls) == 1
    # snapshot excluded the newest (possibly in-flight) turn
    snapshot_texts = str(calls[0])
    assert "u3" not in snapshot_texts


def test_compaction_single_flight():
    chat = Chat(2)
    for i in range(4):
        add_turn(chat, f"u{i}", f"a{i}")
    started = threading.Event()
    release = threading.Event()
    count = [0]

    def slow_compactor(snapshot):
        count[0] += 1
        started.set()
        release.wait(3)
        return CompactionResult(user_summary="s", assistant_summary="t")

    chat.trim_if_needed(slow_compactor)
    assert started.wait(2)
    chat.trim_if_needed(slow_compactor)  # bypassed while in flight
    release.set()
    assert _wait_for(lambda: not chat._compacting)
    assert count[0] == 1


def test_compaction_failure_leaves_chat_unchanged():
    chat = Chat(2)
    for i in range(4):
        add_turn(chat, f"u{i}", f"a{i}")
    before = [x.id for x in chat.buffer]

    def bad_compactor(snapshot):
        raise RuntimeError("llm down")

    chat.trim_if_needed(bad_compactor)
    assert _wait_for(lambda: not chat._compacting)
    assert [x.id for x in chat.buffer] == before


def test_reset_voids_inflight_compaction():
    chat = Chat(2)
    for i in range(4):
        add_turn(chat, f"u{i}", f"a{i}")
    release = threading.Event()

    def compactor(snapshot):
        release.wait(3)
        return CompactionResult(user_summary="STALE", assistant_summary="STALE")

    chat.trim_if_needed(compactor)
    chat.reset()
    release.set()
    time.sleep(0.1)
    assert chat.buffer == []
