"""Chat store behavior matrix — the reference's ``tests/test_chat.py``
(1355 LoC) is the de-facto spec for conversation-buffer semantics; this file
pins the behaviors ``tests/test_chat.py`` samples: intake validation and id
prefixing, eviction boundaries, tool-output pairing/status, both
serializers' exact shapes, copy/reset lifecycle, and media management."""

import pytest

from s2s_tpu.llm.chat import (
    AUDIO_INPUT_HISTORY_PLACEHOLDER,
    Chat,
    ChatItemError,
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
    OutputTextContent,
)


def user_with(parts, id=None):
    return MessageItem(type="message", role="user", content=parts, id=id)


def assistant_with(parts, id=None, status=None):
    return MessageItem(type="message", role="assistant", content=parts, id=id, status=status)


# ── default state & factories ────────────────────────────────────────


def test_default_state_is_empty():
    chat = Chat(7)
    assert chat.size == 7
    assert chat.buffer == []
    assert chat.system_message is None
    assert chat.user_turn_count == 0
    assert chat.to_responses_input() == []
    assert chat.to_chat_messages() == []


def test_factory_messages_have_expected_shape():
    u = make_user_message("hi")
    assert u.role == "user" and u.content[0].type == "input_text" and u.content[0].text == "hi"
    a = make_assistant_message("yo")
    assert a.role == "assistant" and a.content[0].type == "output_text"
    s = make_system_message("sys")
    assert s.role == "system"
    ua = make_user_audio_message("QUJD")
    assert ua.content[0].type == "input_audio" and ua.content[0].audio == "QUJD"


# ── intake: ids, routing, filtering ──────────────────────────────────


def test_ids_auto_generated_with_type_prefixes():
    chat = Chat(5)
    u = chat.add_item(make_user_message("hi"))
    assert u.id.startswith("msg")
    fc = chat.add_item(FunctionCallItem(type="function_call", name="f", arguments="{}"))
    assert fc.id.startswith("fc") and fc.call_id.startswith("call")
    sys_item = chat.add_item(MessageItem(type="message", role="system",
                                         content=[InputTextContent(text="s")]))
    assert sys_item.id.startswith("sys")


def test_provided_ids_are_preserved():
    chat = Chat(5)
    u = user_with([InputTextContent(text="hi")], id="msg_custom")
    assert chat.add_item(u).id == "msg_custom"


def test_system_routed_to_slot_never_buffer():
    chat = Chat(5)
    chat.add_item(MessageItem(type="message", role="system",
                              content=[InputTextContent(text="first")]))
    chat.add_item(MessageItem(type="message", role="system",
                              content=[InputTextContent(text="second")]))
    assert chat.buffer == []
    assert chat.system_message.content[0].text == "second"  # overwrite


def test_user_unsupported_parts_filtered_supported_kept():
    chat = Chat(5)
    item = user_with([
        OutputTextContent(type="output_text", text="not user content"),
        InputTextContent(text="kept"),
        InputImageContent(image_url="data:image/png;base64,AAA"),
        InputAudioContent(audio="QUJD"),
    ])
    added = chat.add_item(item)
    types = [p.type for p in added.content]
    assert types == ["input_text", "input_image", "input_audio"]


def test_user_empty_after_filter_raises():
    chat = Chat(5)
    with pytest.raises(ChatItemError):
        chat.add_item(user_with([OutputTextContent(type="output_text", text="x")]))
    with pytest.raises(ChatItemError):
        chat.add_item(user_with([InputTextContent(text="")]))
    assert chat.user_turn_count == 0


def test_assistant_non_text_filtered_and_empty_skipped():
    chat = Chat(5)
    # empty text -> silently skipped, buffer unchanged
    chat.add_item(assistant_with([OutputTextContent(type="output_text", text="")]))
    assert chat.buffer == []
    mixed = assistant_with([
        InputTextContent(text="wrong type"),
        OutputTextContent(type="output_text", text="kept"),
    ])
    added = chat.add_item(mixed)
    assert [p.type for p in added.content] == ["output_text"]
    assert len(chat.buffer) == 1


def test_unsupported_item_type_raises():
    chat = Chat(5)

    class Strange:
        type = "weird"
        id = None

    with pytest.raises(ChatItemError):
        chat.add_item(Strange())


# ── eviction boundaries ──────────────────────────────────────────────


def test_eviction_removes_through_next_user_boundary():
    chat = Chat(1)
    chat.add_item(make_user_message("u1"))
    chat.add_item(make_assistant_message("a1"))
    fc = chat.add_item(FunctionCallItem(type="function_call", name="f", arguments="{}"))
    chat.append_tool_output(fc.call_id, FunctionCallOutputItem(
        type="function_call_output", call_id=fc.call_id, output="ok"))
    chat.add_item(make_user_message("u2"))
    chat.trim_if_needed()
    # the whole first turn (user + assistant + fc + fco) is gone
    assert chat.user_turn_count == 1
    assert [getattr(i, "role", i.type) for i in chat.buffer] == ["user"]
    assert chat.buffer[0].content[0].text == "u2"


def test_non_user_items_never_trigger_eviction():
    chat = Chat(1)
    chat.add_item(make_user_message("u1"))
    for i in range(10):
        chat.add_item(make_assistant_message(f"a{i}"))
    chat.trim_if_needed()
    assert chat.user_turn_count == 1
    assert len(chat.buffer) == 11


def test_size_zero_trim_evicts_every_turn():
    chat = Chat(0)
    chat.add_item(make_user_message("u1"))
    chat.add_item(make_assistant_message("a1"))
    chat.add_item(make_user_message("u2"))
    chat.trim_if_needed()
    assert chat.buffer == [] and chat.user_turn_count == 0


def test_multiple_evictions_in_one_trim():
    chat = Chat(1)
    for i in range(4):
        chat.add_item(make_user_message(f"u{i}"))
        chat.add_item(make_assistant_message(f"a{i}"))
    chat.trim_if_needed()
    assert chat.user_turn_count == 1
    assert chat.buffer[0].content[0].text == "u3"


# ── tool-output pairing ──────────────────────────────────────────────


def fc_item(call_id="call_1"):
    return FunctionCallItem(type="function_call", name="get", arguments='{"a": 1}',
                            call_id=call_id)


def fco_item(call_id="call_1", status=None, output="42"):
    return FunctionCallOutputItem(type="function_call_output", call_id=call_id,
                                  output=output, status=status)


def test_tool_output_marks_fc_completed_by_default():
    chat = Chat(5)
    chat.add_item(make_user_message("u"))
    chat.add_item(fc_item())
    chat.add_item(fco_item())  # pairs via pending path -> both land in buffer
    fcs = [i for i in chat.buffer if isinstance(i, FunctionCallItem)]
    assert fcs and fcs[0].status == "completed"


def test_tool_output_status_propagates_to_fc():
    chat = Chat(5)
    chat.add_item(fc_item())
    chat.add_item(fco_item(status="incomplete"))
    fcs = [i for i in chat.buffer if isinstance(i, FunctionCallItem)]
    assert fcs[0].status == "incomplete"


def test_tool_output_for_in_buffer_fc_appends_after():
    chat = Chat(5)
    chat.add_item(fc_item("call_x"))
    chat.add_item(fco_item("call_x"))
    # second output for the SAME call id pairs with the now-in-buffer fc
    chat.append_tool_output("call_x", fco_item("call_x", output="again"))
    outs = [i for i in chat.buffer if isinstance(i, FunctionCallOutputItem)]
    assert [o.output for o in outs] == ["42", "again"]


def test_tool_output_unknown_call_raises():
    chat = Chat(5)
    with pytest.raises(ChatItemError):
        chat.append_tool_output("call_nope", fco_item("call_nope"))


# ── responses serializer shapes ──────────────────────────────────────


def test_responses_system_empty_text_falls_back():
    chat = Chat(5)
    chat.init_chat(MessageItem(type="message", role="system",
                               content=[InputTextContent(text="")]))
    out = chat.to_responses_input()
    assert out[0]["role"] == "system"
    assert out[0]["content"][0]["text"] == "A helpful AI assistant."


def test_responses_user_image_gets_default_detail():
    chat = Chat(5)
    chat.add_item(user_with([InputImageContent(image_url="data:image/png;base64,AAA")]))
    out = chat.to_responses_input()
    img = out[0]["content"][0]
    assert img["type"] == "input_image" and img["detail"] == "auto"


def test_responses_audio_collapses_to_single_placeholder():
    chat = Chat(5)
    chat.add_item(user_with([
        InputAudioContent(audio="QUJD"),
        InputAudioContent(audio="REVG"),
        InputTextContent(text="and text"),
    ]))
    out = chat.to_responses_input()
    content = out[0]["content"]
    assert out[0]["role"] == "user"
    assert sum(1 for c in content if c.get("text") == AUDIO_INPUT_HISTORY_PLACEHOLDER) == 1


def test_responses_assistant_defaults_and_annotations():
    chat = Chat(5)
    chat.add_item(make_assistant_message("hello"))
    out = chat.to_responses_input()
    msg = out[0]
    assert msg["status"] == "completed"
    assert msg["content"][0]["annotations"] == []


def test_responses_fc_fco_optional_fields():
    chat = Chat(5)
    chat.add_item(fc_item("call_9"))
    chat.add_item(fco_item("call_9", status="completed"))
    out = chat.to_responses_input()
    fc = next(o for o in out if o["type"] == "function_call")
    fco = next(o for o in out if o["type"] == "function_call_output")
    assert fc["call_id"] == "call_9" and fc["name"] == "get"
    assert fco["output"] == "42" and fco["status"] == "completed"


def test_responses_full_mixed_conversation_order():
    chat = Chat(10)
    chat.init_chat(make_system_message("be brief"))
    chat.add_item(make_user_message("q1"))
    chat.add_item(fc_item("call_a"))
    chat.add_item(fco_item("call_a"))
    chat.add_item(make_assistant_message("a1"))
    out = chat.to_responses_input()
    kinds = [(o.get("role") or o["type"]) for o in out]
    assert kinds == ["system", "user", "function_call", "function_call_output", "assistant"]


# ── chat-messages serializer shapes ──────────────────────────────────


def test_chat_messages_text_only_flattens_to_string():
    chat = Chat(5)
    chat.add_item(user_with([InputTextContent(text="one"), InputTextContent(text="two")]))
    msgs = chat.to_chat_messages()
    assert msgs[0]["content"] == "one two"


def test_chat_messages_media_keeps_structured_list():
    chat = Chat(5)
    chat.add_item(user_with([
        InputTextContent(text="look"),
        InputImageContent(image_url="data:image/png;base64,AAA"),
    ]))
    msgs = chat.to_chat_messages()
    assert isinstance(msgs[0]["content"], list)
    assert msgs[0]["content"][1]["type"] == "input_image"


def test_chat_messages_fc_args_parsed_invalid_falls_back():
    chat = Chat(5)
    chat.add_item(fc_item("call_ok"))
    bad = FunctionCallItem(type="function_call", name="bad", arguments="{nope",
                           call_id="call_bad")
    chat.add_item(bad)
    chat.add_item(fco_item("call_ok"))
    chat.append_tool_output("call_bad", fco_item("call_bad"))
    msgs = chat.to_chat_messages()
    tool_msgs = [m for m in msgs if "tool_calls" in m]
    by_id = {m["tool_calls"][0]["id"]: m for m in tool_msgs}
    assert by_id["call_ok"]["tool_calls"][0]["function"]["arguments"] == {"a": 1}
    assert by_id["call_bad"]["tool_calls"][0]["function"]["arguments"] == {}
    # every assistant/tool_calls entry exposes a content key for templates
    assert all("content" in m for m in tool_msgs)


def test_chat_messages_fco_resolves_name_or_empty():
    chat = Chat(5)
    chat.add_item(fc_item("call_n"))
    chat.add_item(fco_item("call_n"))
    msgs = chat.to_chat_messages()
    tool = next(m for m in msgs if m.get("role") == "tool")
    assert tool["name"] == "get" and tool["tool_call_id"] == "call_n"


# ── copy / reset lifecycle ───────────────────────────────────────────


def test_copy_buffer_and_pending_independent():
    chat = Chat(5)
    chat.init_chat(make_system_message("sys"))
    chat.add_item(make_user_message("u"))
    chat.add_item(fc_item("call_p"))  # stays pending
    clone = chat.copy()
    clone.add_item(make_user_message("clone only"))
    clone.add_item(fco_item("call_p"))
    assert len(chat.buffer) == 1 and len(clone.buffer) >= 2
    assert chat._pending_tool_calls  # original pending untouched
    assert clone.size == chat.size
    assert clone.system_message is chat.system_message
    assert chat.user_turn_count == 1 and clone.user_turn_count == 2


def test_reset_clears_state_preserves_size():
    chat = Chat(3)
    chat.init_chat(make_system_message("sys"))
    chat.add_item(make_user_message("u"))
    chat.add_item(fc_item())
    chat.reset()
    assert chat.buffer == [] and chat.system_message is None
    assert chat.user_turn_count == 0 and chat._pending_tool_calls == {}
    assert chat.size == 3


# ── media management edges ───────────────────────────────────────────


def test_strip_images_all_users_and_noop_on_text():
    chat = Chat(5)
    chat.add_item(user_with([InputTextContent(text="t1"),
                             InputImageContent(image_url="u1")]))
    chat.add_item(make_assistant_message("a"))
    chat.add_item(user_with([InputImageContent(image_url="u2"),
                             InputTextContent(text="t2")]))
    ids = chat.image_message_ids()
    assert len(ids) == 2
    chat.strip_images()
    assert chat.image_message_ids() == set()
    texts = [p.text for i in chat.buffer if getattr(i, "role", "") == "user"
             for p in i.content]
    assert texts == ["t1", "t2"]


def test_compact_audio_history_budget_and_single_placeholder():
    chat = Chat(5)
    old = user_with([InputAudioContent(audio="QUJD"), InputAudioContent(audio="REVG")])
    chat.add_item(old)
    chat.add_item(make_assistant_message("a"))
    new = user_with([InputAudioContent(audio="R0hJ")])
    chat.add_item(new)
    chat.compact_audio_history(max_audio_turns=1)
    # newest keeps audio; oldest collapses BOTH parts into one placeholder
    assert any(p.type == "input_audio" for p in new.content)
    assert [p.type for p in old.content] == ["input_text"]
    assert old.content[0].text == AUDIO_INPUT_HISTORY_PLACEHOLDER


def test_replace_and_remove_unknown_ids_return_false():
    chat = Chat(5)
    chat.add_item(make_user_message("u"))
    assert chat.replace_user_message_text("msg_nope", "x") is False
    assert chat.remove_user_message("msg_nope") is False
    assert chat.user_turn_count == 1


# ── compaction edge matrix (reference test_chat.py compaction section) ─


def add_turn(chat, user_text, assistant_text):
    chat.add_item(make_user_message(user_text))
    chat.add_item(make_assistant_message(assistant_text))


def _wait(cond, timeout=5.0):
    import time

    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return True
        time.sleep(0.01)
    return False


class TestCompactionEdges:
    def test_no_compaction_when_below_threshold(self):
        calls = []

        def compactor(snapshot):
            calls.append(snapshot)
            return None

        chat = Chat(10)
        add_turn(chat, "u0", "a0")
        chat.trim_if_needed(compactor)
        import time

        time.sleep(0.1)
        assert calls == []

    def test_compactor_none_falls_back_to_eviction(self):
        chat = Chat(2)
        for i in range(5):
            add_turn(chat, f"u{i}", f"a{i}")
        chat.trim_if_needed(None)
        texts = [getattr(i.content[0], "text", "") for i in chat.buffer
                 if getattr(i, "role", None) == "user"]
        assert "u0" not in texts  # oldest evicted
        assert f"u4" in texts

    def test_appends_during_compaction_are_preserved(self):
        import threading

        release = threading.Event()

        def slow_compactor(snapshot):
            release.wait(5)
            from s2s_tpu.llm.compaction import CompactionResult

            return CompactionResult(user_summary="[u]", assistant_summary="[a]")

        chat = Chat(2)
        for i in range(4):
            add_turn(chat, f"u{i}", f"a{i}")
        chat.trim_if_needed(slow_compactor)
        # a turn lands WHILE the summary is being computed
        add_turn(chat, "during-u", "during-a")
        release.set()
        assert _wait(lambda: chat.buffer and
                     getattr(chat.buffer[0].content[0], "text", "") == "[u]")
        texts = [getattr(i.content[0], "text", "") for i in chat.buffer]
        assert "during-u" in texts and "during-a" in texts

    def test_compactor_exception_leaves_buffer_unchanged(self):
        def bad_compactor(snapshot):
            raise RuntimeError("llm down")

        chat = Chat(2)
        for i in range(4):
            add_turn(chat, f"u{i}", f"a{i}")
        before = [getattr(i.content[0], "text", "") for i in chat.buffer]
        chat.trim_if_needed(bad_compactor)
        import time

        time.sleep(0.3)
        after = [getattr(i.content[0], "text", "") for i in chat.buffer]
        assert after == before

    def test_system_message_unchanged_after_compaction(self):
        from s2s_tpu.llm.chat import make_system_message
        from s2s_tpu.llm.compaction import CompactionResult

        chat = Chat(2)
        chat.add_item(make_system_message("persona prompt"))
        for i in range(4):
            add_turn(chat, f"u{i}", f"a{i}")
        chat.trim_if_needed(
            lambda s: CompactionResult(user_summary="[u]", assistant_summary="[a]"))
        assert _wait(lambda: chat.buffer and
                     getattr(chat.buffer[0].content[0], "text", "") == "[u]")
        assert chat.system_message is not None
        assert chat.system_message.content[0].text == "persona prompt"
