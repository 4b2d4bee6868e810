"""Beam-search tests: HF parity on a converted tiny model, score soundness
(reference surface: generate(num_beams=N) through the reference's HF
generation kwargs, model_utils.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from intel_extension_for_transformers_tpu.models.generation import (
    SamplingConfig,
    generate,
    generate_beam,
)
from intel_extension_for_transformers_tpu.models.llama import (
    LlamaConfig,
    llama_apply,
    llama_init_params,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _seq_logprob(params, config, prompt, cont):
    """Model log-prob of `cont` given `prompt` (f32, exactly as search sees)."""
    ids = jnp.asarray(np.concatenate([prompt, cont])[None], jnp.int32)
    logits, _ = llama_apply(params, config, ids)
    lp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
    T = len(prompt)
    tot = 0.0
    for j, tok in enumerate(cont):
        tot += float(lp[T - 1 + j, int(tok)])
    return tot


@pytest.fixture(scope="module")
def tiny_hf():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=128,
        bos_token_id=None, eos_token_id=None, pad_token_id=0,
    )
    torch.manual_seed(3)
    hf = transformers.LlamaForCausalLM(cfg)
    hf.eval()
    from intel_extension_for_transformers_tpu.models.hf_convert import (
        llama_params_from_hf,
    )

    params, config = llama_params_from_hf(hf)
    return hf, params, config


def test_beam_matches_hf_no_eos(tiny_hf):
    """Without EOS the search must return HF's num_beams result exactly
    (same model via the parity converter, same scoring convention)."""
    hf, params, config = tiny_hf
    prompt = np.array([5, 17, 99], np.int64)
    with torch.no_grad():
        out = hf.generate(
            torch.tensor(prompt[None]), max_new_tokens=8, num_beams=4,
            do_sample=False, length_penalty=1.0, early_stopping=False,
        )
    ref = out[0, len(prompt):].numpy()
    got, score = generate_beam(
        params, config, prompt.astype(np.int32),
        num_beams=4, max_new_tokens=8,
    )
    np.testing.assert_array_equal(got, ref)
    # reported score == model log-prob of the returned sequence (lp=1.0)
    np.testing.assert_allclose(
        score, _seq_logprob(params, config, prompt, got) / len(got),
        rtol=1e-3, atol=1e-3,
    )


def test_beam_beats_or_matches_greedy(tiny_hf):
    """Beam-4's length-penalized sequence log-prob must be ≥ greedy's."""
    _, params, config = tiny_hf
    prompt = np.array([7, 1, 42], np.int32)
    n = 10
    greedy = generate(params, config, prompt, SamplingConfig(max_new_tokens=n))[0]
    beam, score = generate_beam(
        params, config, prompt, num_beams=4, max_new_tokens=n
    )
    g = _seq_logprob(params, config, prompt, np.asarray(greedy)) / n
    b = _seq_logprob(params, config, prompt, beam) / len(beam)
    assert b >= g - 1e-4, (b, g)
    np.testing.assert_allclose(score, b, rtol=1e-3, atol=1e-3)


def test_beam_eos_early_finish(tiny_hf):
    """With an EOS chosen on the greedy path, the beam result ends at EOS
    and matches HF's early-stopped beam output."""
    hf, params, config = tiny_hf
    prompt = np.array([9, 8, 7], np.int64)
    greedy = generate(params, config, prompt.astype(np.int32),
                      SamplingConfig(max_new_tokens=8))[0]
    eos = int(greedy[4])
    with torch.no_grad():
        out = hf.generate(
            torch.tensor(prompt[None]), max_new_tokens=8, num_beams=4,
            do_sample=False, eos_token_id=eos, pad_token_id=0,
            length_penalty=1.0, early_stopping=False,
        )
    ref = out[0, len(prompt):].numpy()
    ref = ref[: np.argmax(ref == eos) + 1] if (ref == eos).any() else ref
    got, _ = generate_beam(
        params, config, prompt.astype(np.int32),
        num_beams=4, max_new_tokens=8, eos_token_id=eos,
    )
    np.testing.assert_array_equal(got, ref)
