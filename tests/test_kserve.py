"""KServe v2 predict-protocol frontend (the Triton serving analogue).

Reference surface: neural_chat/serving/triton/text_generation/model.py:1
(Triton python-backend INPUT0 BYTES → OUTPUT0 BYTES with dynamic batching).
Here the server speaks Triton's wire protocol (KServe v2) itself and batched
inputs decode concurrently in the engine slot pool.
"""

import json
from urllib.error import HTTPError
from urllib.request import Request, urlopen

import numpy as np
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
)


@pytest.fixture(scope="module")
def server():
    reset_plugins()
    config = LlamaConfig.tiny(vocab_size=256, hidden_size=64,
                              intermediate_size=128)
    params = llama_init_params(jax.random.PRNGKey(0), config)
    ex = NeuralChatServerExecutor()
    ok = ex.init({
        "host": "127.0.0.1", "port": 0,
        "model_name_or_path": "tiny-llama-kserve",
        "loading_config": {"preloaded": (params, config, ByteTokenizer())},
        "generation_config": {"max_new_tokens": 8, "do_sample": False,
                              "repetition_penalty": 1.0},
        "serving_config": {"continuous_batching": True, "max_slots": 4,
                           "max_len": 128},
    })
    assert ok
    ex.run(block=False)
    yield ex
    ex.stop()
    reset_plugins()


def _get(port, path):
    return json.loads(urlopen(f"http://127.0.0.1:{port}{path}",
                              timeout=120).read())


def _post(port, path, body):
    return json.loads(urlopen(
        Request(f"http://127.0.0.1:{port}{path}", json.dumps(body).encode(),
                {"Content-Type": "application/json"}), timeout=300,
    ).read())


def test_kserve_metadata_and_health(server):
    port = server.port
    meta = _get(port, "/v2")
    assert meta["name"] == "neuralchat" and meta["version"] == "2"
    assert _get(port, "/v2/health/live")["live"] is True
    assert _get(port, "/v2/health/ready")["ready"] is True
    m = _get(port, "/v2/models/tiny-llama-kserve")
    assert m["inputs"][0] == {"name": "INPUT0", "datatype": "BYTES",
                              "shape": [-1]}
    assert _get(port, "/v2/models/tiny-llama-kserve/ready")["ready"] is True
    with pytest.raises(HTTPError):
        _get(port, "/v2/models/nope")


def test_kserve_batched_infer(server):
    """A 3-prompt batch returns 3 completions in order; the engine pool
    decodes them concurrently (dynamic-batching analogue)."""
    port = server.port
    steps0 = server.app.engine._steps
    out = _post(port, "/v2/models/tiny-llama-kserve/infer", {
        "id": "req-7",
        "inputs": [{"name": "INPUT0", "datatype": "BYTES", "shape": [3],
                    "data": ["alpha", "beta", "gamma"]}],
        "parameters": {"max_tokens": 6, "temperature": 0},
    })
    assert out["model_name"] == "tiny-llama-kserve"
    assert out["id"] == "req-7"
    o = out["outputs"][0]
    assert o["name"] == "OUTPUT0" and o["shape"] == [3]
    assert len(o["data"]) == 3
    # concurrent, not serialized: far fewer steps than 3 sequential decodes
    assert server.app.engine._steps - steps0 < 3 * 6

    # determinism at temperature 0: same input → same output
    out2 = _post(port, "/v2/models/tiny-llama-kserve/infer", {
        "inputs": [{"name": "INPUT0", "datatype": "BYTES", "shape": [1],
                    "data": ["alpha"]}],
        "parameters": {"max_tokens": 6, "temperature": 0},
    })
    assert out2["outputs"][0]["data"][0] == o["data"][0]


def test_kserve_rejects_malformed(server):
    port = server.port
    with pytest.raises(HTTPError) as e:
        _post(port, "/v2/models/tiny-llama-kserve/infer",
              {"inputs": [{"name": "WRONG", "datatype": "FP32",
                           "shape": [1], "data": [1.0]}]})
    assert e.value.code == 400
