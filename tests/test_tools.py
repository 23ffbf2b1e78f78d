"""OpenAI tool-calling helpers: system-block injection, <tool_call> parsing,
chatml rendering of tool turns (reference flow:
glm-4.7-flash-mlx/examples/tool_use.py)."""

import json

from ominix_mlx_tpu.utils.tokenizer import chatml
from ominix_mlx_tpu.utils.tools import (finalize_tool_response, inject_tools,
                                        parse_tool_calls, tools_system_block)

TOOLS = [{"type": "function", "function": {
    "name": "get_time",
    "description": "Get the current time",
    "parameters": {"type": "object", "properties": {
        "tz": {"type": "string"}}, "required": []}}}]


def test_inject_tools_prepends_system():
    msgs = inject_tools([{"role": "user", "content": "hi"}], TOOLS)
    assert msgs[0]["role"] == "system"
    assert "<tools>" in msgs[0]["content"]
    assert "get_time" in msgs[0]["content"]
    assert msgs[1] == {"role": "user", "content": "hi"}


def test_inject_tools_appends_to_existing_system():
    orig = [{"role": "system", "content": "be brief"},
            {"role": "user", "content": "hi"}]
    msgs = inject_tools(orig, TOOLS)
    assert msgs[0]["content"].startswith("be brief")
    assert "<tools>" in msgs[0]["content"]
    assert orig[0]["content"] == "be brief"      # input not mutated


def test_tools_block_has_json_signature():
    block = tools_system_block(TOOLS)
    line = next(ln for ln in block.splitlines() if ln.startswith("{"))
    assert json.loads(line)["function"]["name"] == "get_time"


def test_parse_single_call_with_prose():
    text = ('Let me check.\n<tool_call>\n'
            '{"name": "get_time", "arguments": {"tz": "UTC"}}\n'
            '</tool_call>')
    content, calls = parse_tool_calls(text)
    assert content == "Let me check."
    assert len(calls) == 1
    assert calls[0]["type"] == "function"
    assert calls[0]["function"]["name"] == "get_time"
    assert json.loads(calls[0]["function"]["arguments"]) == {"tz": "UTC"}
    assert calls[0]["id"].startswith("call_")


def test_parse_multiple_calls():
    text = ('<tool_call>{"name": "a", "arguments": {}}</tool_call>\n'
            '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>')
    content, calls = parse_tool_calls(text)
    assert content == ""
    assert [c["function"]["name"] for c in calls] == ["a", "b"]


def test_malformed_call_stays_in_content():
    text = "<tool_call>not json</tool_call> trailing"
    content, calls = parse_tool_calls(text)
    assert calls == []
    assert "not json" in content


def test_finalize_is_passthrough_without_tools():
    resp = {"choices": [{"message": {
        "role": "assistant",
        "content": '<tool_call>{"name": "a", "arguments": {}}</tool_call>'},
        "finish_reason": "stop"}]}
    out = finalize_tool_response(resp, None)
    assert "tool_calls" not in out["choices"][0]["message"]
    assert out["choices"][0]["finish_reason"] == "stop"


def test_finalize_surfaces_tool_calls():
    resp = {"choices": [{"message": {
        "role": "assistant",
        "content": '<tool_call>{"name": "a", "arguments": {}}</tool_call>'},
        "finish_reason": "stop"}]}
    out = finalize_tool_response(resp, TOOLS)
    msg = out["choices"][0]["message"]
    assert msg["content"] is None
    assert msg["tool_calls"][0]["function"]["name"] == "a"
    assert out["choices"][0]["finish_reason"] == "tool_calls"


def test_chatml_renders_tool_turns():
    msgs = [
        {"role": "user", "content": "time?"},
        {"role": "assistant", "content": None, "tool_calls": [
            {"id": "call_1", "type": "function", "function": {
                "name": "get_time", "arguments": '{"tz": "UTC"}'}}]},
        {"role": "tool", "content": "12:00"},
    ]
    text = chatml(msgs)
    assert '<tool_call>\n{"name": "get_time", "arguments": {"tz": "UTC"}}' \
        in text
    assert "<tool_response>\n12:00\n</tool_response>" in text
    assert text.endswith("<|im_start|>assistant\n")
