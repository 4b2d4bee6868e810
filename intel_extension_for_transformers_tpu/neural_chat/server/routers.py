"""Task routers beyond the OpenAI chat surface: askdoc (RAG-as-API) and
finetune (training-as-API).

Re-creation of the reference's per-task REST routers
(reference: neural_chat/server/restful/api.py:39-51 maps 11 routers; the two
that matter for a RAG-north-star framework are `retrieval/askdoc` —
restful/retrieval_api.py create/append/chat — and `finetune` —
restful/finetune_api.py). `MediaRouter` serves voicechat (ASR → chat →
optional TTS) and text2image over the real asr/tts/image2image plugins;
faceanimation/photoai stay out of scope.

Design: plain handler classes returning (status, payload) that ChatApp.route
dispatches — same contract as the OpenAI handlers, no framework dependency.

- AskDocRouter owns named knowledge bases (each a `RetrievalAgent` sharing
  one embedder): POST /v1/askdoc/create | /append | /chat, GET /v1/askdoc/kbs.
- FinetuneRouter launches LoRA jobs on the resident model in a background
  thread and reports status: POST /v1/finetune, GET /v1/finetune/jobs[/id].
"""

from __future__ import annotations

import logging
import os
import threading
import uuid
from typing import Callable, Dict, Optional

logger = logging.getLogger(__name__)


def _resolve_under(root: Optional[str], path: str, what: str) -> str:
    """Confine a client-supplied filesystem path to an operator-configured
    root. Raises PermissionError when no root is configured (per-request
    paths are then disabled entirely) or when the resolved path escapes it
    — the server binds real sockets, so request bodies are untrusted."""
    if root is None:
        raise PermissionError(
            f"per-request {what} is disabled: the operator has not "
            f"configured a data root for it (set it in the server config)"
        )
    root_real = os.path.realpath(root)
    candidate = path if os.path.isabs(path) else os.path.join(root_real, path)
    resolved = os.path.realpath(candidate)
    if resolved != root_real and not resolved.startswith(root_real + os.sep):
        raise PermissionError(f"{what} {path!r} escapes the configured root")
    return resolved


class AskDocRouter:
    """Knowledge-base lifecycle + retrieval-augmented chat over HTTP."""

    def __init__(self, embedder_factory: Callable, chatbot=None,
                 data_root: Optional[str] = None, **agent_kw):
        self._embedder_factory = embedder_factory
        self._embedder = None
        self._chatbot = chatbot
        self._data_root = data_root
        self._agent_kw = agent_kw
        self._kbs: Dict[str, object] = {}
        self._lock = threading.Lock()

    def _get_embedder(self):
        if self._embedder is None:
            self._embedder = self._embedder_factory()
        return self._embedder

    def _new_agent(self):
        from intel_extension_for_transformers_tpu.retrieval.agent import (
            RetrievalAgent,
        )

        return RetrievalAgent(self._get_embedder(), **self._agent_kw)

    @staticmethod
    def _docs_from_body(body: dict):
        docs = body.get("documents")
        if docs:
            return [
                {"content": d["content"], "metadata": d.get("metadata", {})}
                if isinstance(d, dict)
                else {"content": str(d), "metadata": {}}
                for d in docs
            ]
        return None

    def create(self, body: dict):
        """POST /v1/askdoc/create {documents | input_path} → knowledge_base_id
        (reference: retrieval_api create KB)."""
        kb_id = body.get("knowledge_base_id") or f"kb_{uuid.uuid4().hex[:12]}"
        try:
            agent = self._new_agent()
            docs = self._docs_from_body(body)
            if docs:
                agent.add_documents(docs)
            elif body.get("input_path"):
                agent.append_localdb(
                    _resolve_under(self._data_root, body["input_path"],
                                   "input_path"))
            else:
                return 400, {"error": "need documents or input_path"}
        except PermissionError as e:
            return 403, {"error": str(e)}
        except Exception as e:  # noqa: BLE001 — surface as API error
            return 400, {"error": str(e)}
        with self._lock:
            self._kbs[kb_id] = agent
        return 200, {"knowledge_base_id": kb_id, "count": len(agent.docs)}

    def append(self, body: dict):
        kb_id = body.get("knowledge_base_id")
        agent = self._kbs.get(kb_id)
        if agent is None:
            return 404, {"error": f"unknown knowledge_base_id {kb_id!r}"}
        docs = self._docs_from_body(body)
        try:
            if docs:
                agent.add_documents(docs)
            elif body.get("input_path"):
                agent.append_localdb(
                    _resolve_under(self._data_root, body["input_path"],
                                   "input_path"))
            else:
                return 400, {"error": "need documents or input_path"}
        except PermissionError as e:
            return 403, {"error": str(e)}
        except Exception as e:  # noqa: BLE001
            return 400, {"error": str(e)}
        return 200, {"knowledge_base_id": kb_id, "count": len(agent.docs)}

    def list_kbs(self):
        with self._lock:
            return 200, {
                "knowledge_bases": [
                    {"id": k, "count": len(a.docs)} for k, a in self._kbs.items()
                ]
            }

    def chat(self, body: dict):
        """POST /v1/askdoc/chat {query, knowledge_base_id, top_k?, generate?}
        → {context: [...], response?} (reference: retrieval_api chat)."""
        kb_id = body.get("knowledge_base_id")
        agent = self._kbs.get(kb_id)
        if agent is None:
            return 404, {"error": f"unknown knowledge_base_id {kb_id!r}"}
        query = body.get("query") or ""
        if not query:
            return 400, {"error": "query must be non-empty"}
        k = int(body.get("top_k") or agent.top_k)
        hits = agent.get_context(query, k=k)
        out = {
            "knowledge_base_id": kb_id,
            "context": [
                {"content": h["content"], "metadata": h.get("metadata", {})}
                for h in hits
            ],
        }
        if body.get("generate", True) and self._chatbot is not None:
            prompt = agent.pre_llm_inference_actions(query)
            out["response"] = self._chatbot.predict(prompt)
        return 200, out


class FinetuneRouter:
    """LoRA finetuning jobs over HTTP on the server's resident model.

    Client-supplied paths are confined to operator-configured roots:
    `train_file` must live under `data_root`, `output_dir` under
    `output_root` (finetune_config in the server YAML). With no root
    configured, the corresponding per-request path is rejected (403);
    jobs without an explicit output_dir write to a server-chosen
    directory under output_root (or ./finetuned_api when unset)."""

    def __init__(self, chatbot, data_root: Optional[str] = None,
                 output_root: Optional[str] = None):
        self._chatbot = chatbot
        self._data_root = data_root
        self._output_root = output_root
        self._jobs: Dict[str, dict] = {}
        self._lock = threading.Lock()

    def submit(self, body: dict):
        """POST /v1/finetune {train_texts | train_file, lora_rank?, max_steps?,
        learning_rate?, output_dir?} → {job_id}
        (reference: restful/finetune_api.py launch)."""
        params = getattr(self._chatbot, "params", None)
        model_config = getattr(self._chatbot, "model_config", None)
        tokenizer = getattr(self._chatbot, "tokenizer", None)
        if params is None or model_config is None:
            return 400, {"error": "server model does not expose (params, config)"}
        texts = body.get("train_texts")
        train_file = body.get("train_file")
        if not texts and not train_file:
            return 400, {"error": "need train_texts or train_file"}
        job_id = f"ft_{uuid.uuid4().hex[:12]}"
        try:
            if train_file:
                train_file = _resolve_under(self._data_root, train_file,
                                            "train_file")
            if body.get("output_dir"):
                output_dir = _resolve_under(self._output_root,
                                            body["output_dir"], "output_dir")
            else:
                output_dir = os.path.join(
                    self._output_root or "./finetuned_api", job_id)
        except PermissionError as e:
            return 403, {"error": str(e)}

        from intel_extension_for_transformers_tpu.neural_chat.config import (
            FinetuningConfig,
        )

        cfg = FinetuningConfig(
            train_file=train_file,
            lora_rank=int(body.get("lora_rank", 8)),
            lora_alpha=int(body.get("lora_alpha", 16)),
            learning_rate=float(body.get("learning_rate", 1e-4)),
            max_steps=int(body.get("max_steps", 10)),
            num_train_epochs=int(body.get("num_train_epochs", 1)),
            per_device_train_batch_size=int(body.get("batch_size", 2)),
            max_seq_length=int(body.get("max_seq_length", 128)),
            output_dir=output_dir,
        )
        job = {"status": "running", "config": cfg.output_dir, "job_id": job_id}
        with self._lock:
            self._jobs[job_id] = job

        def run():
            try:
                from intel_extension_for_transformers_tpu.trainer.finetuning import (
                    Finetuning,
                )

                ft = Finetuning(cfg)
                lora, _ = ft.finetune(
                    params=params,
                    model_config=model_config,
                    tokenizer=tokenizer,
                    texts=texts,
                )
                job["status"] = "completed"
                job["adapter_dir"] = cfg.output_dir
                del lora
            except Exception as e:  # noqa: BLE001 — report, keep serving
                logger.exception("finetune job %s failed", job_id)
                job["status"] = "failed"
                job["error"] = str(e)

        threading.Thread(target=run, daemon=True).start()
        return 200, {"job_id": job_id, "status": "running"}

    def status(self, job_id: Optional[str]):
        """GET /v1/finetune/jobs[/{id}]"""
        if job_id:
            job = self._jobs.get(job_id)
            if job is None:
                return 404, {"error": f"unknown job {job_id!r}"}
            return 200, job
        with self._lock:
            return 200, {"jobs": list(self._jobs.values())}


class MediaRouter:
    """voicechat + text2image task routers (reference: restful/api.py:39-51
    'voicechat', 'text2image'; voicechat_api.py / text2image_api.py).

    Wire format: raw float32 arrays as base64 (no PIL/soundfile deps) —
    audio is 16 kHz mono PCM in [-1, 1]; images are (H, W, 3) in [-1, 1]."""

    def __init__(self, chatbot):
        self._chatbot = chatbot

    @staticmethod
    def _b64_to_array(b64: str, dtype="float32"):
        import base64

        import numpy as np

        return np.frombuffer(base64.b64decode(b64), dtype=dtype)

    @staticmethod
    def _array_to_b64(arr) -> str:
        import base64

        import numpy as np

        return base64.b64encode(np.ascontiguousarray(arr, np.float32).tobytes()).decode()

    def voicechat(self, body: dict):
        """POST /v1/voicechat {audio_b64, tts?} → {asr_text, response,
        audio_b64?, sample_rate?}."""
        from intel_extension_for_transformers_tpu.neural_chat.plugins import (
            get_plugin_instance,
        )

        asr = get_plugin_instance("asr")
        if asr is None:
            return 503, {"error": "asr plugin not enabled"}
        if not body.get("audio_b64"):
            return 400, {"error": "need audio_b64 (base64 float32 PCM @16k)"}
        audio = self._b64_to_array(body["audio_b64"])
        text = asr.audio2text(audio)
        out = {"asr_text": text}
        if body.get("generate", True):
            out["response"] = self._chatbot.predict(text or " ")
        if body.get("tts"):
            tts = get_plugin_instance("tts")
            if tts is None:
                return 503, {"error": "tts plugin not enabled"}
            wav, sr = tts.text2speech(out.get("response", text))
            out["audio_b64"] = self._array_to_b64(wav)
            out["sample_rate"] = sr
        return 200, out

    def asr(self, body: dict):
        """POST /v1/plugin/audio/asr {audio_b64} → {asr_result}
        (reference: restful/plugin_audio_api.py)."""
        from intel_extension_for_transformers_tpu.neural_chat.plugins import (
            get_plugin_instance,
        )

        asr = get_plugin_instance("asr")
        if asr is None:
            return 503, {"error": "asr plugin not enabled"}
        if not body.get("audio_b64"):
            return 400, {"error": "need audio_b64 (base64 float32 PCM @16k)"}
        audio = self._b64_to_array(body["audio_b64"])
        return 200, {"asr_result": asr.audio2text(audio)}

    def tts(self, body: dict):
        """POST /v1/plugin/audio/tts {text} → {audio_b64, sample_rate}
        (reference: restful/plugin_audio_api.py)."""
        from intel_extension_for_transformers_tpu.neural_chat.plugins import (
            get_plugin_instance,
        )

        tts = get_plugin_instance("tts")
        if tts is None:
            return 503, {"error": "tts plugin not enabled"}
        text = body.get("text") or ""
        if not text:
            return 400, {"error": "text must be non-empty"}
        wav, sr = tts.text2speech(text)
        return 200, {
            "audio_b64": self._array_to_b64(wav),
            "sample_rate": sr,
        }

    def text2image(self, body: dict):
        """POST /v1/text2image {prompt, steps?, guidance?} → {image_b64,
        shape}."""
        from intel_extension_for_transformers_tpu.neural_chat.plugins import (
            get_plugin_instance,
        )

        sd = get_plugin_instance("image2image")
        if sd is None:
            return 503, {"error": "image2image plugin not enabled"}
        prompt = body.get("prompt") or ""
        if not prompt:
            return 400, {"error": "prompt must be non-empty"}
        kw = {}
        if body.get("steps"):
            kw["num_inference_steps"] = int(body["steps"])
        if body.get("guidance"):
            kw["guidance_scale"] = float(body["guidance"])
        if body.get("seed") is not None:
            kw["seed"] = int(body["seed"])
        img = sd.text2image(prompt, **kw)[0]
        return 200, {
            "image_b64": self._array_to_b64(img),
            "shape": list(img.shape),
            "dtype": "float32",
        }
