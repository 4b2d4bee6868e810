"""Whisper ASR real-time factor — the voicechat plugin's serving speed.

The reference ships Whisper ASR inside neural_chat's audio plugin
(reference: neural_chat/pipeline/plugins/audio/asr.py — torch
WhisperForConditionalGeneration) but publishes no latency numbers; the
metric that matters for voice serving is the REAL-TIME FACTOR
(seconds of audio transcribed per second of wall clock).

Whisper-BASE geometry (d=512, 6+6 layers, 8 heads — ~72M params,
random-init: identical compute to trained weights), 30 s of audio
(mel (80, 3000) → 1500 encoder frames), 100 decoded tokens, the whole
transcription ONE compiled program (`whisper_generate_compiled`).

    python benchmarks/bench_whisper.py [--batch 8] [--tokens 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIO_SECONDS = 30.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--tokens", type=int, default=100)
    p.add_argument("--reps", type=int, default=4,
                   help="timed repetitions (amortizes relay dispatch)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from intel_extension_for_transformers_tpu.models.whisper import (
        WhisperConfig,
        whisper_generate_compiled,
        whisper_init_params,
    )

    cfg = WhisperConfig(
        vocab_size=51865, num_mel_bins=80, d_model=512, encoder_layers=6,
        decoder_layers=6, num_heads=8, ffn_dim=2048,
        max_source_positions=1500, max_target_positions=448,
    )  # whisper-base geometry
    t0 = time.time()
    params = whisper_init_params(jax.random.PRNGKey(0), cfg)
    B = args.batch
    mel = jax.random.normal(jax.random.PRNGKey(1), (B, 80, 3000),
                            jnp.float32)
    prompt = jnp.tile(jnp.asarray([[50258, 50259, 50359]], jnp.int32),
                      (B, 1))
    print(f"built whisper-base in {time.time()-t0:.0f}s", file=sys.stderr)

    def run():
        out = whisper_generate_compiled(
            params, cfg, mel, prompt, 3, max_new_tokens=args.tokens
        )
        return int(out[0, 0])  # scalar readback = the only reliable sync

    t0 = time.time()
    run()
    print(f"compile+first run: {time.time()-t0:.0f}s", file=sys.stderr)
    t0 = time.time()
    for _ in range(args.reps):
        run()
    dt = (time.time() - t0) / args.reps

    rtf = AUDIO_SECONDS * B / dt
    print(json.dumps({
        "metric": "whisper_base_asr_realtime_factor",
        "value": round(rtf, 1),
        "unit": "x_realtime",
        "vs_baseline": None,
        "batch_s": round(dt * 1e3, 1),
        "batch": B, "tokens": args.tokens,
        "audio_seconds_per_batch": AUDIO_SECONDS * B,
    }))


if __name__ == "__main__":
    main()
