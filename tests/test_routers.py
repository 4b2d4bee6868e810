"""askdoc (RAG-as-API) + finetune REST router tests (VERDICT.md round-1
missing #3: reference maps 11 routers, restful/api.py:39-51; these are the
two that matter for the RAG north star)."""

import json
import numpy as np
import time
from http.client import HTTPConnection

import pytest

import jax

from intel_extension_for_transformers_tpu.models.bert import (
    BertConfig,
    bert_init_params,
)
from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    llama_init_params,
)
from intel_extension_for_transformers_tpu.models.tokenization import ByteTokenizer
from intel_extension_for_transformers_tpu.neural_chat.plugins import reset_plugins
from intel_extension_for_transformers_tpu.neural_chat.server import (
    NeuralChatServerExecutor,
)
from intel_extension_for_transformers_tpu.retrieval.embedder import TextEmbedder


@pytest.fixture(scope="module")
def ft_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("ft_root"))


@pytest.fixture(scope="module")
def server(tmp_path_factory, ft_root):
    reset_plugins()
    config = LlamaConfig.tiny(vocab_size=260)
    params = llama_init_params(jax.random.PRNGKey(0), config)
    bcfg = BertConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=128,
    )
    embedder = TextEmbedder(
        bert_init_params(jax.random.PRNGKey(1), bcfg), bcfg, max_length=128
    )
    executor = NeuralChatServerExecutor()
    ok = executor.init(
        {
            "host": "127.0.0.1",
            "port": 0,
            "model_name_or_path": "tiny-router-test",
            "tasks_list": [
                "textchat", "completion", "models", "health",
                "retrieval", "finetune", "embeddings",
            ],
            "loading_config": {"preloaded": (params, config, ByteTokenizer())},
            "generation_config": {
                "max_new_tokens": 4,
                "do_sample": False,
                "repetition_penalty": 1.0,
            },
            "askdoc_config": {"embedder": embedder, "top_k": 2},
            "finetune_config": {"output_root": ft_root},
        }
    )
    assert ok
    executor.run(block=False)
    yield executor
    executor.stop()
    reset_plugins()


def _req(server, method, path, body=None, timeout=120):
    conn = HTTPConnection("127.0.0.1", server.port, timeout=timeout)
    headers = {"Content-Type": "application/json"} if body is not None else {}
    conn.request(method, path, json.dumps(body) if body is not None else None, headers)
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    return resp.status, data


DOCS = [
    {"content": "TPUs use a systolic array to multiply matrices.",
     "metadata": {"source": "hw.md"}},
    {"content": "Quantization stores weights in four bits with group scales.",
     "metadata": {"source": "quant.md"}},
    {"content": "The capital of France is Paris.", "metadata": {"source": "geo.md"}},
]


def test_askdoc_create_chat_append(server):
    status, out = _req(server, "POST", "/v1/askdoc/create", {"documents": DOCS})
    assert status == 200 and out["count"] == 3
    kb = out["knowledge_base_id"]

    status, out = _req(server, "GET", "/v1/askdoc/kbs")
    assert status == 200 and any(k["id"] == kb for k in out["knowledge_bases"])

    status, out = _req(
        server, "POST", "/v1/askdoc/chat",
        {"query": "What do TPUs use?", "knowledge_base_id": kb, "generate": False},
    )
    assert status == 200
    assert len(out["context"]) == 2  # top_k from askdoc_config
    assert all("content" in c for c in out["context"])

    status, out = _req(
        server, "POST", "/v1/askdoc/append",
        {"knowledge_base_id": kb,
         "documents": [{"content": "Pallas writes TPU kernels in Python."}]},
    )
    assert status == 200 and out["count"] == 4

    # generation through the chatbot (tiny model: any text is fine)
    status, out = _req(
        server, "POST", "/v1/askdoc/chat",
        {"query": "kernels?", "knowledge_base_id": kb},
    )
    assert status == 200 and "response" in out


def test_askdoc_errors(server):
    status, out = _req(server, "POST", "/v1/askdoc/create", {})
    assert status == 400
    status, out = _req(
        server, "POST", "/v1/askdoc/chat",
        {"query": "x", "knowledge_base_id": "nope"},
    )
    assert status == 404


def test_finetune_job_lifecycle(server, ft_root):
    texts = ["hello tpu world " * 20] * 4
    status, out = _req(
        server, "POST", "/v1/finetune",
        {"train_texts": texts, "max_steps": 2, "max_seq_length": 64,
         "batch_size": 2, "output_dir": "ft_router_test"},
    )
    assert status == 200
    job = out["job_id"]
    deadline = time.time() + 240
    while time.time() < deadline:
        status, out = _req(server, "GET", f"/v1/finetune/jobs/{job}")
        assert status == 200
        if out["status"] in ("completed", "failed"):
            break
        time.sleep(1.0)
    assert out["status"] == "completed", out
    # client-named output dirs are confined to the operator's output_root
    assert out["adapter_dir"] == f"{ft_root}/ft_router_test"


def test_router_path_confinement(server):
    """Untrusted request bodies cannot name arbitrary host paths
    (ADVICE r2: arbitrary read via askdoc input_path / write via finetune
    output_dir)."""
    # askdoc: no data_root configured → per-request input_path disabled
    status, out = _req(server, "POST", "/v1/askdoc/create",
                       {"input_path": "/etc/passwd"})
    assert status == 403
    # finetune: escaping output_root rejected even though one is configured
    status, out = _req(
        server, "POST", "/v1/finetune",
        {"train_texts": ["x"], "output_dir": "../../escape"})
    assert status == 403
    # finetune: train_file disabled without data_root
    status, out = _req(
        server, "POST", "/v1/finetune", {"train_file": "/etc/passwd"})
    assert status == 403

    status, out = _req(server, "GET", "/v1/finetune/jobs")
    assert status == 200 and len(out["jobs"]) >= 1


def test_embeddings_endpoint(server):
    """OpenAI /v1/embeddings wire format over the resident encoder."""
    status, out = _req(
        server, "POST", "/v1/embeddings",
        {"input": ["tpu systolic arrays", "matrix multiplication"]},
        timeout=300,
    )
    assert status == 200, out
    assert out["object"] == "list" and len(out["data"]) == 2
    v0 = np.asarray(out["data"][0]["embedding"], np.float32)
    assert v0.ndim == 1 and np.isfinite(v0).all()
    assert abs(np.linalg.norm(v0) - 1.0) < 1e-2  # normalized embeddings
    assert out["usage"]["total_tokens"] > 0

    status, out1 = _req(server, "POST", "/v1/embeddings", {"input": "hello"})
    assert status == 200 and len(out1["data"]) == 1
    status, _ = _req(server, "POST", "/v1/embeddings", {})
    assert status == 400
    status, _ = _req(server, "POST", "/v1/embeddings", {"input": []})
    assert status == 400


def test_client_embeddings_and_stats(server):
    from intel_extension_for_transformers_tpu.neural_chat.server.neuralchat_client import (
        TextChatClientExecutor,
    )

    c = TextChatClientExecutor("127.0.0.1", server.port)
    vecs = c.embeddings(["alpha", "beta"])
    assert len(vecs) == 2 and len(vecs[0]) > 8
    assert "model" in c.stats()


def test_finetune_rejects_empty(server):
    status, out = _req(server, "POST", "/v1/finetune", {})
    assert status == 400


@pytest.fixture(scope="module")
def media_server():
    reset_plugins()
    import jax as _jax

    from intel_extension_for_transformers_tpu.models.tts import (
        TTSConfig,
        tts_init_params,
    )
    from intel_extension_for_transformers_tpu.models.whisper import (
        WhisperConfig,
        whisper_init_params,
    )

    config = LlamaConfig.tiny(vocab_size=260)
    params = llama_init_params(_jax.random.PRNGKey(0), config)
    wcfg = WhisperConfig.test()
    wparams = whisper_init_params(_jax.random.PRNGKey(1), wcfg)
    tcfg = TTSConfig.test()
    tparams = tts_init_params(_jax.random.PRNGKey(2), tcfg)

    executor = NeuralChatServerExecutor()
    ok = executor.init(
        {
            "host": "127.0.0.1",
            "port": 0,
            "model_name_or_path": "tiny-media",
            "tasks_list": ["textchat", "health", "voicechat", "text2image",
                           "plugin_audio", "codegen", "tgi"],
            "loading_config": {"preloaded": (params, config, ByteTokenizer())},
            "generation_config": {"max_new_tokens": 4, "do_sample": False,
                                  "repetition_penalty": 1.0},
            "plugins": {
                "asr": {"preloaded": (wparams, wcfg, ByteTokenizer()),
                        "prompt_ids": [65], "max_new_tokens": 4},
                "tts": {"preloaded": (tparams, tcfg), "vocoder_iters": 2},
                "image2image": {"config": "tiny", "num_inference_steps": 2},
            },
        }
    )
    assert ok
    executor.run(block=False)
    yield executor
    executor.stop()
    reset_plugins()


def test_voicechat_router(media_server):
    import base64

    audio = np.sin(np.linspace(0, 440 * 2 * np.pi, 4000)).astype(np.float32)
    status, out = _req(
        media_server, "POST", "/v1/voicechat",
        {"audio_b64": base64.b64encode(audio.tobytes()).decode(), "tts": True},
        timeout=300,
    )
    assert status == 200, out
    assert "asr_text" in out and "response" in out
    assert "audio_b64" in out and out["sample_rate"] == 16000
    wav = np.frombuffer(base64.b64decode(out["audio_b64"]), np.float32)
    assert len(wav) > 0 and np.isfinite(wav).all()


def test_text2image_router(media_server):
    import base64

    status, out = _req(
        media_server, "POST", "/v1/text2image",
        {"prompt": "a tiny tpu", "steps": 2}, timeout=300,
    )
    assert status == 200, out
    img = np.frombuffer(base64.b64decode(out["image_b64"]), np.float32)
    assert list(np.array(out["shape"])) == [32, 32, 3]
    assert img.size == 32 * 32 * 3 and np.isfinite(img).all()


def test_media_router_errors(media_server):
    status, out = _req(media_server, "POST", "/v1/voicechat", {})
    assert status == 400
    status, out = _req(media_server, "POST", "/v1/text2image", {})
    assert status == 400


def test_plugin_audio_router(media_server):
    """ASR + TTS as standalone plugin endpoints (reference:
    restful/plugin_audio_api.py)."""
    import base64

    audio = np.sin(np.linspace(0, 440 * 2 * np.pi, 4000)).astype(np.float32)
    status, out = _req(
        media_server, "POST", "/v1/plugin/audio/asr",
        {"audio_b64": base64.b64encode(audio.tobytes()).decode()}, timeout=300,
    )
    assert status == 200, out
    assert "asr_result" in out

    status, out = _req(
        media_server, "POST", "/v1/plugin/audio/tts",
        {"text": "hello tpu"}, timeout=300,
    )
    assert status == 200, out
    wav = np.frombuffer(base64.b64decode(out["audio_b64"]), np.float32)
    assert len(wav) > 0 and np.isfinite(wav).all()
    assert out["sample_rate"] == 16000

    status, _ = _req(media_server, "POST", "/v1/plugin/audio/tts", {})
    assert status == 400


def test_codegen_router(media_server):
    """code_generation + code_chat (reference: restful/codegen_api.py)."""
    status, out = _req(
        media_server, "POST", "/v1/code_generation",
        {"prompt": "def add(a, b):", "max_tokens": 4}, timeout=300,
    )
    assert status == 200, out
    assert isinstance(out["response"], str)
    assert out["usage"]["total_tokens"] > 0

    status, out = _req(
        media_server, "POST", "/v1/code_chat",
        {"prompt": "write a sort", "max_tokens": 4}, timeout=300,
    )
    assert status == 200, out
    status, _ = _req(media_server, "POST", "/v1/code_generation", {})
    assert status == 400


def test_tgi_router(media_server):
    """TGI-compatible /generate and /generate_stream (reference:
    restful/tgi_api.py wire format)."""
    status, out = _req(
        media_server, "POST", "/generate",
        {"inputs": "hello", "parameters": {"max_new_tokens": 4,
                                           "do_sample": False}},
        timeout=300,
    )
    assert status == 200, out
    assert isinstance(out["generated_text"], str)

    # stream: SSE events, last one carries generated_text
    conn = HTTPConnection("127.0.0.1", media_server.port, timeout=300)
    conn.request(
        "POST", "/generate_stream",
        json.dumps({"inputs": "hello", "parameters": {"max_new_tokens": 4}}),
        {"Content-Type": "application/json"},
    )
    resp = conn.getresponse()
    assert resp.status == 200
    raw = resp.read().decode()
    conn.close()
    events = [json.loads(line[6:]) for line in raw.splitlines()
              if line.startswith("data: ")]
    assert len(events) >= 1
    assert "generated_text" in events[-1]
    tokens = "".join(e["token"]["text"] for e in events)
    assert tokens == events[-1]["generated_text"]

    status, _ = _req(media_server, "POST", "/generate", {})
    assert status == 400
