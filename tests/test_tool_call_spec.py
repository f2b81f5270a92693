"""Tool-call spec depth: the reference behaviors from
``tests/tool_call/test_signature_from_schema.py`` and
``tests/tool_call/test_function_parser.py`` without repo counterparts in
``test_tool_call_matrix.py`` — schema-annotation corner cases (const,
nullable lists, anyOf/oneOf/allOf, nested enum arrays), exact rendered
signature strings, the single-call parser corpus, positional/named mixes,
and the ``__arg_N__`` prefix non-collision rule.

Reference: /root/reference/tests/tool_call/ (behavior source only).
"""

import json
from typing import Any, Literal, Optional, Union

import pytest

from s2s_tpu.llm.tool_call import (
    ParsedCall,
    _annotation,
    extract_function_calls_from_text,
    parse_function_call,
    signature_from_schema,
    tool_code_prompt,
)
from s2s_tpu.realtime.types import FunctionTool

CODE_BLOCK_REGEX = r"<code>.*?</code>"


# ── annotation corner cases ──────────────────────────────────────────


class TestAnnotationSpec:
    def test_null(self):
        assert _annotation({"type": "null"}) is type(None)

    def test_number_object_boolean(self):
        assert _annotation({"type": "number"}) is float
        assert _annotation({"type": "object"}) is dict
        assert _annotation({"type": "boolean"}) is bool

    def test_enum_empty_degrades_to_any(self):
        assert _annotation({"enum": []}) is Any

    def test_const_becomes_literal(self):
        assert _annotation({"const": "turbo"}) == Literal["turbo"]

    def test_nullable_type_list_is_optional(self):
        assert _annotation({"type": ["string", "null"]}) == Optional[str]

    def test_any_of_union(self):
        assert _annotation({"anyOf": [{"type": "string"}, {"type": "integer"}]}) == Union[str, int]

    def test_one_of_union(self):
        assert _annotation({"oneOf": [{"type": "boolean"}, {"type": "number"}]}) == Union[bool, float]

    def test_one_of_single_collapses(self):
        assert _annotation({"oneOf": [{"type": "string"}]}) is str

    def test_all_of_merges_subschemas(self):
        assert _annotation({"allOf": [{"type": "string"}, {"enum": ["x", "y"]}]}) == Literal["x", "y"]

    def test_array_with_nested_enum_items(self):
        spec = {"type": "array", "items": {"type": "string", "enum": ["a", "b"]}}
        assert _annotation(spec) == list[Literal["a", "b"]]

    def test_type_list_dedupes(self):
        assert _annotation({"type": ["string", "string"]}) is str


# ── exact rendered signatures ────────────────────────────────────────


class TestSignatureSpec:
    def test_no_properties(self):
        assert str(signature_from_schema({"type": "object"})) == "()"

    def test_schema_default_on_required(self):
        schema = {
            "type": "object",
            "properties": {"count": {"type": "integer", "default": 5}},
            "required": ["count"],
        }
        assert str(signature_from_schema(schema)) == "(count: int = 5)"

    def test_schema_default_on_optional(self):
        schema = {"type": "object", "properties": {"limit": {"type": "integer", "default": 10}}}
        assert str(signature_from_schema(schema)) == "(limit: int = 10)"

    def test_enum_required_exact(self):
        schema = {
            "type": "object",
            "properties": {"direction": {"type": "string", "enum": ["left", "right"]}},
            "required": ["direction"],
        }
        assert str(signature_from_schema(schema)) == "(direction: Literal['left', 'right'])"

    def test_mixed_required_optional_no_star(self):
        schema = {
            "type": "object",
            "properties": {
                "query": {"type": "string"},
                "limit": {"type": "integer", "default": 10},
                "verbose": {"type": "boolean"},
            },
            "required": ["query"],
        }
        sig = str(signature_from_schema(schema))
        assert "*" not in sig
        assert sig == "(query: str, limit: int = 10, verbose: bool = None)"

    def test_all_required(self):
        schema = {
            "type": "object",
            "properties": {"a": {"type": "string"}, "b": {"type": "integer"}},
            "required": ["a", "b"],
        }
        assert str(signature_from_schema(schema)) == "(a: str, b: int)"

    def test_all_optional(self):
        schema = {"type": "object", "properties": {"x": {"type": "number"}, "y": {"type": "number"}}}
        assert str(signature_from_schema(schema)) == "(x: float = None, y: float = None)"


# ── code prompt rendering ────────────────────────────────────────────


def _tool(name, description, parameters):
    return FunctionTool(type="function", name=name, description=description, parameters=parameters)


class TestCodePromptSpec:
    def test_basic_code_prompt_includes_args_doc(self):
        tool = _tool(
            "greet",
            "Greet the user.",
            {
                "type": "object",
                "properties": {"name": {"type": "string", "description": "User name."}},
                "required": ["name"],
            },
        )
        rendered = tool_code_prompt(tool, include_args_doc=True)
        assert "def greet(name: str):" in rendered
        assert "Greet the user." in rendered
        assert "name: User name." in rendered

    def test_no_params(self):
        tool = _tool("ping", "Ping the server.", {"type": "object", "properties": {}})
        assert "def ping():" in tool_code_prompt(tool)

    def test_enum_and_optional_no_star(self):
        tool = _tool(
            "move",
            "Move robot.",
            {
                "type": "object",
                "properties": {
                    "direction": {"type": "string", "enum": ["left", "right"], "description": "Direction."},
                    "speed": {"type": "number", "description": "Speed."},
                },
                "required": ["direction"],
            },
        )
        rendered = tool_code_prompt(tool)
        assert "Literal['left', 'right']" in rendered
        assert "speed: float = None" in rendered
        assert "*" not in rendered.split("\n")[0]


# ── parser corpus ────────────────────────────────────────────────────


class TestParserCorpus:
    @pytest.mark.parametrize(
        "call_str, expected_name, expected_params",
        [
            ("mobile.home()", "mobile.home", {}),
            ("mobile.back()", "mobile.back", {}),
            ("mobile.open_app(app_name='drupe')", "mobile.open_app", {"app_name": "drupe"}),
            ("mobile.long_press(x=0.799, y=0.911)", "mobile.long_press", {"x": 0.799, "y": 0.911}),
            ("mobile.terminate(status='success')", "mobile.terminate", {"status": "success"}),
            ("answer('text')", "answer", {"__arg_0__": "text"}),
            ("pyautogui.hscroll(page=-0.1)", "pyautogui.hscroll", {"page": -0.1}),
            ("pyautogui.scroll(0.13)", "pyautogui.scroll", {"__arg_0__": 0.13}),
            ("pyautogui.hotkey(keys=['ctrl', 'c'])", "pyautogui.hotkey", {"keys": ["ctrl", "c"]}),
            ("pyautogui.press(keys=['enter'])", "pyautogui.press", {"keys": ["enter"]}),
            ("pyautogui.moveTo(x=0.04, y=0.405)", "pyautogui.moveTo", {"x": 0.04, "y": 0.405}),
            ("pyautogui.write(message='bread buns')", "pyautogui.write", {"message": "bread buns"}),
        ],
    )
    def test_single_call(self, call_str, expected_name, expected_params):
        results = parse_function_call(call_str)
        assert len(results) == 1
        assert results[0].function_name == expected_name
        assert results[0].parameters == expected_params

    def test_swipe_with_list_params(self):
        results = parse_function_call("mobile.swipe(from_coord=[0.581, 0.898], to_coord=[0.601, 0.518])")
        assert results[0].parameters == {"from_coord": [0.581, 0.898], "to_coord": [0.601, 0.518]}

    def test_mixed_positional_and_named(self):
        r = parse_function_call("function('hello', 123, x=0.5)")[0]
        assert r.parameters == {"__arg_0__": "hello", "__arg_1__": 123, "x": 0.5}

    def test_positional_with_named_trailing(self):
        r = parse_function_call("function(arg1, arg2, named_param='value')")[0]
        assert r.parameters["named_param"] == "value"

    def test_many_positional(self):
        r = parse_function_call("function(1, 2, 3, 4, 5)")[0]
        assert all(r.parameters[f"__arg_{i}__"] == i + 1 for i in range(5))

    def test_strings_with_kwargs(self):
        r = parse_function_call("function('a', 'b', 'c', x=1, y=2)")[0]
        assert r.parameters == {"__arg_0__": "a", "__arg_1__": "b", "__arg_2__": "c", "x": 1, "y": 2}


# ── block extraction edges ───────────────────────────────────────────


class TestExtractSpec:
    def test_outside_text_excludes_code_blocks(self):
        outside, _ = extract_function_calls_from_text(
            "Hello\n<code>hidden()</code>\nWorld", block_regex=CODE_BLOCK_REGEX
        )
        assert "<code>" not in outside
        assert "hidden" not in outside
        assert "Hello" in outside and "World" in outside

    def test_nested_parens_inside_code_block(self):
        _, calls = extract_function_calls_from_text(
            "<code>tool(msg='hello ) world')</code>", block_regex=CODE_BLOCK_REGEX
        )
        assert len(calls) == 1
        assert calls[0].parameters == {"msg": "hello ) world"}

    def test_plain_text_block_yields_no_calls(self):
        _, calls = extract_function_calls_from_text(
            "<code>just plain text</code>", block_regex=CODE_BLOCK_REGEX
        )
        assert calls == []


# ── __arg_N__ prefix non-collision ───────────────────────────────────


def test_no_collision_with_real_arg_prefix():
    """A genuine parameter named ``arg_0`` must NOT be stripped as positional."""
    call = ParsedCall(function_name="calc", parameters={"arg_0": 10, "x": 5}, original_string="calc(arg_0=10, x=5)")
    tool = _tool(
        "calc",
        "",
        {
            "type": "object",
            "properties": {"arg_0": {"type": "integer"}, "x": {"type": "integer"}},
            "required": ["arg_0"],
        },
    )
    result = call.to_function_tool_call([tool])
    assert json.loads(result.arguments) == {"arg_0": 10, "x": 5}
