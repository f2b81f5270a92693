"""Tool-call corpus — the reference's ``tests/tool_call/`` suites (61
tests) pin the prompted-tool machinery; this file covers that matrix on
our parser/signature builder: literal shapes, nested structures, strings
with parens, multi-call blocks, code-block extraction, argument
validation, and the JSON-Schema -> signature conversion table."""

import inspect
import json

import pytest

from s2s_tpu.llm.tool_call import (
    build_tool_system_prompt,
    extract_function_calls_from_text,
    parse_function_call,
    signature_from_schema,
    tool_code_prompt,
)
from s2s_tpu.realtime.types import FunctionTool

BLOCK = r"<code>.*?</code>"


def params_of(text):
    calls = parse_function_call(text)
    assert len(calls) == 1, calls
    return calls[0].parameters


# ── parser: literal shapes ───────────────────────────────────────────


@pytest.mark.parametrize("text,expected", [
    ("f(a=1)", {"a": 1}),
    ("f(a=1.5)", {"a": 1.5}),
    ("f(a=True, b=False)", {"a": True, "b": False}),
    ("f(a=None)", {"a": None}),
    ("f(a=-3)", {"a": -3}),
    ("f(a='x', b=\"y\")", {"a": "x", "b": "y"}),
    ("f(xs=[1, 2, 3])", {"xs": [1, 2, 3]}),
    ("f(d={'k': 'v', 'n': 2})", {"d": {"k": "v", "n": 2}}),
])
def test_named_literals(text, expected):
    assert params_of(text) == expected


def test_list_of_strings():
    assert params_of("swipe(directions=['up', 'down'])") == {"directions": ["up", "down"]}


def test_tuple_argument_becomes_list_or_tuple():
    got = params_of("f(p=(1, 2))")["p"]
    assert list(got) == [1, 2]


def test_string_containing_closing_paren():
    assert params_of("say(text='hello ) world')") == {"text": "hello ) world"}


def test_dict_value_containing_paren():
    assert params_of("f(d={'expr': '(a+b)'})") == {"d": {"expr": "(a+b)"}}


def test_nested_structures():
    got = params_of("f(cfg={'xs': [1, {'y': (2, 3)}]})")["cfg"]
    assert got["xs"][0] == 1 and got["xs"][1]["y"][0] == 2


def test_positional_arguments_are_captured():
    calls = parse_function_call("f(1, 'two', k=3)")
    c = calls[0]
    assert c.function_name == "f"
    assert 3 in c.parameters.values()


def test_two_calls_on_separate_lines():
    calls = parse_function_call("f(a=1)\ng(b=2)")
    assert [c.function_name for c in calls] == ["f", "g"]
    assert calls[0].parameters == {"a": 1} and calls[1].parameters == {"b": 2}


def test_bare_identifier_argument_degrades_gracefully():
    # an unquoted identifier isn't a literal; the call must still be found
    calls = parse_function_call("f(mode=fast)")
    assert calls and calls[0].function_name == "f"


# ── code-block extraction ────────────────────────────────────────────


def test_no_code_block_returns_text_unchanged():
    outside, calls = extract_function_calls_from_text("just words", BLOCK)
    assert outside == "just words" and calls == []


def test_calls_outside_block_are_ignored():
    text = "g(a=1) then <code>f(b=2)</code>"
    outside, calls = extract_function_calls_from_text(text, BLOCK)
    assert [c.function_name for c in calls] == ["f"]
    assert "g(a=1)" in outside


def test_multiline_code_block():
    text = "<code>\nf(a=1)\ng(b=2)\n</code>"
    _, calls = extract_function_calls_from_text(text, BLOCK)
    assert [c.function_name for c in calls] == ["f", "g"]


def test_multiple_code_blocks_all_extracted():
    text = "<code>f(a=1)</code> mid <code>g(b=2)</code>"
    outside, calls = extract_function_calls_from_text(text, BLOCK)
    assert [c.function_name for c in calls] == ["f", "g"]
    assert "mid" in outside and "f(a=1)" not in outside


def test_block_without_functions_yields_no_calls():
    outside, calls = extract_function_calls_from_text("<code>x = 1</code>", BLOCK)
    assert calls == []


def test_malformed_block_recovers_sibling_call():
    text = "<code>broken((( f(a=1)</code>"
    _, calls = extract_function_calls_from_text(text, BLOCK)
    assert any(c.function_name == "f" for c in calls)


# ── argument validation against the tool schema ──────────────────────


TOOL = FunctionTool(
    name="lookup",
    description="Look something up",
    parameters={
        "type": "object",
        "properties": {
            "query": {"type": "string"},
            "limit": {"type": "integer", "default": 5},
        },
        "required": ["query"],
    },
)


def test_undeclared_args_stripped():
    tc = parse_function_call("lookup(query='x', verbose=True)")[0].to_function_tool_call([TOOL])
    assert json.loads(tc.arguments) == {"query": "x"}


def test_missing_required_raises_after_strip():
    with pytest.raises(ValueError):
        parse_function_call("lookup(limit=2)")[0].to_function_tool_call([TOOL])


def test_no_required_allows_full_strip():
    tool = FunctionTool(name="ping", parameters={"type": "object", "properties": {}})
    tc = parse_function_call("ping(junk=1)")[0].to_function_tool_call([tool])
    assert json.loads(tc.arguments) == {}


def test_unknown_function_rejected():
    with pytest.raises(ValueError):
        parse_function_call("nuke(x=1)")[0].to_function_tool_call([TOOL])


# ── schema -> signature table ────────────────────────────────────────


def ann_of(spec):
    sig = signature_from_schema({"type": "object", "properties": {"p": spec},
                                 "required": ["p"]})
    return sig.parameters["p"].annotation


def test_primitive_annotations():
    assert ann_of({"type": "string"}) is str
    assert ann_of({"type": "number"}) is float
    assert ann_of({"type": "integer"}) is int
    assert ann_of({"type": "boolean"}) is bool
    assert ann_of({"type": "object"}) in (dict, "dict")


def test_array_annotation():
    ann = ann_of({"type": "array", "items": {"type": "string"}})
    assert "list" in str(ann).lower()


def test_enum_annotation_mentions_values():
    ann = ann_of({"type": "string", "enum": ["a", "b"]})
    assert "a" in str(ann) and "b" in str(ann)


def test_unknown_or_missing_type_degrades_to_any():
    for spec in ({"type": "quux"}, {}, None):
        sig = signature_from_schema({"type": "object", "properties": {"p": spec or {}}})
        assert "p" in sig.parameters


def test_empty_and_none_schema():
    assert list(signature_from_schema({}).parameters) == []
    assert list(signature_from_schema(None).parameters) == []


def test_required_params_have_no_default():
    sig = signature_from_schema(TOOL.parameters)
    assert sig.parameters["query"].default is inspect.Parameter.empty
    assert sig.parameters["limit"].default == 5


def test_optional_without_schema_default_gets_none():
    sig = signature_from_schema({
        "type": "object", "properties": {"opt": {"type": "string"}},
    })
    assert sig.parameters["opt"].default is None


def test_required_ordered_before_optional():
    sig = signature_from_schema({
        "type": "object",
        "properties": {"b_opt": {"type": "string"}, "a_req": {"type": "string"}},
        "required": ["a_req"],
    })
    names = list(sig.parameters)
    assert names.index("a_req") < names.index("b_opt")


# ── prompt rendering ─────────────────────────────────────────────────


def test_code_prompt_shape():
    block = tool_code_prompt(TOOL)
    assert block.startswith("def lookup(")
    assert "Look something up" in block


def test_tool_prompt_without_params():
    tool = FunctionTool(name="noop", description="Do nothing",
                        parameters={"type": "object", "properties": {}})
    block = tool_code_prompt(tool)
    assert "def noop()" in block


def test_system_prompt_lists_every_tool():
    prompt = build_tool_system_prompt([TOOL, FunctionTool(name="other", parameters=None)])
    assert "def lookup" in prompt and "other" in prompt
