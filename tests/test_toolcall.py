"""OpenAI tools / function-calling over grammar-constrained decoding.

No equivalent exists anywhere in the reference; semantics follow the
OpenAI chat protocol (llama.cpp "generic" fallback style).
"""

import json

import pytest

from bitnet_tpu.grammar import Grammar, GrammarMatcher
from bitnet_tpu.toolcall import (
    ToolCallError,
    normalize_tool_messages,
    parse_tool_calls,
    tool_choice_grammar,
    tools_system_text,
    validate_tools,
)

WEATHER = {
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "Current weather for a city",
        "parameters": {
            "type": "object",
            "properties": {"city": {"type": "string"},
                           "units": {"enum": ["C", "F"]}},
            "required": ["city"],
        },
    },
}
ADD = {
    "type": "function",
    "function": {
        "name": "add",
        "parameters": {
            "type": "object",
            "properties": {"a": {"type": "number"},
                           "b": {"type": "number"}},
            "required": ["a", "b"],
            "additionalProperties": False,
        },
    },
}


def accepts(src: str, text: str) -> bool:
    m = GrammarMatcher(Grammar.from_gbnf(src))
    return m.feed_text(text) and m.can_complete


class TestValidate:
    def test_ok(self):
        fns = validate_tools([WEATHER, ADD], "required")
        assert [f["name"] for f in fns] == ["get_weather", "add"]

    def test_errors(self):
        with pytest.raises(ToolCallError):
            validate_tools([])
        with pytest.raises(ToolCallError):
            validate_tools([{"type": "retrieval"}])
        with pytest.raises(ToolCallError):
            validate_tools([WEATHER, WEATHER])        # duplicate name
        with pytest.raises(ToolCallError):
            validate_tools([WEATHER], "sometimes")
        with pytest.raises(ToolCallError):
            validate_tools([WEATHER], {"type": "function",
                                       "function": {"name": "nope"}})

    def test_system_text_mentions_all(self):
        txt = tools_system_text(validate_tools([WEATHER, ADD]))
        assert "get_weather" in txt and "add" in txt
        assert "Current weather" in txt and '"city"' in txt


class TestGrammar:
    def test_required_accepts_any_tool(self):
        fns = validate_tools([WEATHER, ADD])
        src = tool_choice_grammar(fns, "required")
        ok = '{"name": "get_weather", "arguments": {"city": "Oslo"}}'
        ok2 = '{"name": "add", "arguments": {"a": 1, "b": -2.5}}'
        assert accepts(src, ok) and accepts(src, ok2)
        assert not accepts(
            src, '{"name": "rm_rf", "arguments": {}}')
        assert not accepts(
            src, '{"name": "add", "arguments": {"a": 1}}')  # missing b
        assert not accepts(src, 'plain text')

    def test_named_choice_is_exclusive(self):
        fns = validate_tools([WEATHER, ADD])
        src = tool_choice_grammar(
            fns, {"type": "function", "function": {"name": "add"}})
        assert accepts(src, '{"name": "add", "arguments": {"a": 0, "b": 1}}')
        assert not accepts(
            src, '{"name": "get_weather", "arguments": {"city": "x"}}')

    def test_auto_has_no_grammar(self):
        fns = validate_tools([WEATHER])
        assert tool_choice_grammar(fns, None) is None
        assert tool_choice_grammar(fns, "auto") is None


class TestMessages:
    def test_system_merge_and_tool_role(self):
        fns = validate_tools([ADD])
        msgs = normalize_tool_messages([
            {"role": "system", "content": "Be terse."},
            {"role": "user", "content": "add 1 and 2"},
            {"role": "assistant", "tool_calls": [{
                "type": "function",
                "function": {"name": "add",
                             "arguments": '{"a": 1, "b": 2}'}}]},
            {"role": "tool", "name": "add", "content": "3"},
        ], fns)
        assert msgs[0].role == "system"
        assert "Be terse." in msgs[0].content
        assert "add" in msgs[0].content          # tools text merged
        assert msgs[2].role == "assistant"
        assert json.loads(msgs[2].content) == {"name": "add",
                                               "arguments": {"a": 1, "b": 2}}
        assert msgs[3].role == "user" and "[add result]" in msgs[3].content

    def test_system_inserted_when_absent(self):
        fns = validate_tools([ADD])
        msgs = normalize_tool_messages(
            [{"role": "user", "content": "hi"}], fns)
        assert msgs[0].role == "system" and "add" in msgs[0].content
        assert msgs[1].role == "user"


class TestParse:
    def test_roundtrip(self):
        fns = validate_tools([WEATHER])
        calls = parse_tool_calls(
            ' {"name": "get_weather", "arguments": {"city": "Oslo"}} ', fns)
        assert calls is not None and len(calls) == 1
        c = calls[0]
        assert c["type"] == "function"
        assert c["function"]["name"] == "get_weather"
        assert json.loads(c["function"]["arguments"]) == {"city": "Oslo"}

    def test_non_calls(self):
        fns = validate_tools([WEATHER])
        assert parse_tool_calls("It is sunny.", fns) is None
        assert parse_tool_calls('{"name": "other", "arguments": {}}',
                                fns) is None
        assert parse_tool_calls('{"name": "get_weather"}', fns) is None
        assert parse_tool_calls("{broken", fns) is None


class TestServerValidation:
    def test_validate_body_tools(self):
        from bitnet_tpu.serve.server import _validate_body

        base = {"messages": [{"role": "user", "content": "x"}]}
        assert _validate_body(dict(base, tools=[WEATHER],
                                   tool_choice="required")) is None
        assert _validate_body(dict(base, tools=[{"type": "x"}])) is not None
        assert _validate_body(
            dict(base, tool_choice="required")) is not None  # no tools
        assert _validate_body(dict(base, tool_choice="auto")) is None


@pytest.fixture(scope="module")
def long_ctx_gguf(tmp_path_factory):
    # the tools system prompt is ~600 byte-level tokens; the default
    # mini fixture's model context (128) can't hold it
    from bitnet_tpu.gguf.fixtures import MiniModelSpec, generate_mini_gguf

    path = tmp_path_factory.mktemp("models") / "mini_f32_long.gguf"
    return generate_mini_gguf(
        str(path), MiniModelSpec(quant="f32", max_seq_len=1024))


@pytest.mark.slow
class TestCompatToolCall:
    def test_forced_call_end_to_end(self, long_ctx_gguf):
        from bitnet_tpu.compat import Llama

        llm = Llama(long_ctx_gguf.path, n_ctx=1024, seed=9, verbose=False)
        out = llm.create_chat_completion(
            [{"role": "user", "content": "add"}],
            max_tokens=220, temperature=0.0,
            tools=[ADD],
            tool_choice={"type": "function", "function": {"name": "add"}})
        choice = out["choices"][0]
        assert choice["finish_reason"] == "tool_calls"
        assert choice["message"]["content"] is None
        (call,) = choice["message"]["tool_calls"]
        assert call["function"]["name"] == "add"
        args = json.loads(call["function"]["arguments"])
        assert set(args) == {"a", "b"}

    def test_auto_plain_text(self, long_ctx_gguf):
        from bitnet_tpu.compat import Llama

        llm = Llama(long_ctx_gguf.path, n_ctx=1024, seed=9, verbose=False)
        out = llm.create_chat_completion(
            [{"role": "user", "content": "hello"}],
            max_tokens=8, temperature=0.0, tools=[ADD], tool_choice="auto")
        choice = out["choices"][0]
        # mini model babbles → not a valid call → plain content
        assert choice["message"]["content"] is not None
        assert choice["finish_reason"] in ("stop", "length")
