"""Serving-layer tests: in-process HTTP server + client against a tiny
chatbot (pattern: reference neural_chat/tests/ci/server/ — FastAPI test
clients / local ports; here a real socket on port 0)."""

import json
from http.client import HTTPConnection

import pytest

import jax

from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    llama_init_params,
)
from intel_extension_for_transformers_tpu.models.tokenization import ByteTokenizer
from intel_extension_for_transformers_tpu.neural_chat.plugins import reset_plugins
from intel_extension_for_transformers_tpu.neural_chat.server import (
    NeuralChatServerExecutor,
    TextChatClientExecutor,
)


@pytest.fixture(scope="module")
def server():
    reset_plugins()
    config = LlamaConfig.tiny()
    params = llama_init_params(jax.random.PRNGKey(0), config)
    executor = NeuralChatServerExecutor()
    ok = executor.init(
        {
            "host": "127.0.0.1",
            "port": 0,  # ephemeral
            "model_name_or_path": "tiny-llama-test",
            "loading_config": {"preloaded": (params, config, ByteTokenizer())},
            "generation_config": {
                "max_new_tokens": 6,
                "do_sample": False,
                "repetition_penalty": 1.0,
            },
        }
    )
    assert ok
    executor.run(block=False)
    yield executor
    executor.stop()
    reset_plugins()


@pytest.fixture
def client(server):
    return TextChatClientExecutor("127.0.0.1", server.port)


def test_health(client):
    assert client.health()


def test_models(client):
    assert client.models() == ["tiny-llama-test"]


def test_chat_completion(client):
    out = client.chat("hello", max_tokens=4, temperature=0.0)
    assert isinstance(out, str)


def test_chat_completion_full_shape(server):
    conn = HTTPConnection("127.0.0.1", server.port)
    conn.request(
        "POST",
        "/v1/chat/completions",
        json.dumps(
            {"messages": [{"role": "user", "content": "hi"}], "max_tokens": 3}
        ),
        {"Content-Type": "application/json"},
    )
    resp = json.loads(conn.getresponse().read())
    conn.close()
    assert resp["object"] == "chat.completion"
    assert resp["choices"][0]["message"]["role"] == "assistant"
    assert resp["usage"]["total_tokens"] > 0
    assert resp["id"].startswith("chatcmpl-")


def test_chat_stream(client):
    deltas = list(client.chat_stream("hello", max_tokens=4))
    assert isinstance("".join(deltas), str)


def test_completions_endpoint(server):
    conn = HTTPConnection("127.0.0.1", server.port)
    conn.request(
        "POST",
        "/v1/completions",
        json.dumps({"prompt": "once upon", "max_tokens": 3}),
        {"Content-Type": "application/json"},
    )
    resp = json.loads(conn.getresponse().read())
    conn.close()
    assert resp["object"] == "text_completion"
    assert isinstance(resp["choices"][0]["text"], str)


def test_multi_turn_messages(client):
    body = {
        "messages": [
            {"role": "user", "content": "remember the number 7"},
            {"role": "assistant", "content": "ok"},
            {"role": "user", "content": "what number?"},
        ],
        "max_tokens": 3,
    }
    out = client._post("/v1/chat/completions", body)
    assert out["choices"][0]["finish_reason"] == "stop"


def test_bad_route_and_bad_json(server):
    conn = HTTPConnection("127.0.0.1", server.port)
    conn.request("GET", "/nope")
    r = conn.getresponse()
    assert r.status == 404
    r.read()
    conn.request("POST", "/v1/chat/completions", "{not json", {})
    r = conn.getresponse()
    assert r.status == 400
    r.read()
    conn.close()


def test_empty_messages_rejected(server):
    conn = HTTPConnection("127.0.0.1", server.port)
    conn.request(
        "POST",
        "/v1/chat/completions",
        json.dumps({"messages": []}),
        {"Content-Type": "application/json"},
    )
    r = conn.getresponse()
    assert r.status == 400
    body = json.loads(r.read())
    assert "error" in body
    conn.close()


def test_cli_parser():
    from intel_extension_for_transformers_tpu.neural_chat.cli import make_parser

    p = make_parser()
    args = p.parse_args(["predict", "--query", "hi", "--max_new_tokens", "4"])
    assert args.command == "predict"
    args = p.parse_args(["serve", "--port", "9999"])
    assert args.port == 9999


def test_chat_ui_page(server):
    conn = HTTPConnection("127.0.0.1", server.port)
    conn.request("GET", "/")
    r = conn.getresponse()
    assert r.status == 200
    assert "text/html" in r.headers["Content-Type"]
    body = r.read().decode()
    assert "/v1/chat/completions" in body and "NeuralChat" in body
    conn.close()


def test_side_by_side_page(server):
    conn = HTTPConnection("127.0.0.1", server.port, timeout=60)
    conn.request("GET", "/compare")
    resp = conn.getresponse()
    body = resp.read().decode()
    conn.close()
    assert resp.status == 200
    assert "side-by-side" in body and "/v1/chat/completions" in body


def test_askdoc_page(server):
    """RAG frontend page is served and wired to the askdoc API surface
    (reference: the askdoc gradio demos under workflows/chatbot)."""
    conn = HTTPConnection("127.0.0.1", server.port, timeout=60)
    conn.request("GET", "/askdoc")
    resp = conn.getresponse()
    body = resp.read().decode()
    conn.close()
    assert resp.status == 200
    for endpoint in ("/v1/askdoc/create", "/v1/askdoc/append",
                     "/v1/askdoc/chat", "/v1/askdoc/kbs"):
        assert endpoint in body
    assert "Citations" in body


def test_apply_stop_streaming_semantics():
    """OpenAI stop sequences: truncate before the first stop, catch stops
    split across delta boundaries, pass through when absent."""
    from intel_extension_for_transformers_tpu.neural_chat.server.neuralchat_server import (
        _apply_stop,
        _normalize_stops,
    )

    assert _normalize_stops(None) == []
    assert _normalize_stops("X") == ["X"]
    assert _normalize_stops(["a", "", "b"]) == ["a", "b"]

    out = "".join(_apply_stop(iter(["hello ST", "OP world"]), ["STOP"]))
    assert out == "hello "
    out = "".join(_apply_stop(iter(["abc", "def"]), ["ZZZ"]))
    assert out == "abcdef"
    out = "".join(_apply_stop(iter(["one|two"]), ["|"]))
    assert out == "one"
    fired = []
    out = "".join(
        _apply_stop(iter(["xSTOPy"]), ["STOP"], lambda: fired.append(1))
    )
    assert out == "x" and fired == [1]
