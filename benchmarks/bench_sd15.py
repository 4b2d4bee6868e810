"""SD1.5 img2img benchmark vs the reference headline (2.74 s / 20 steps bf16
512², SPR 8480+ — docs/release_data.md:88).

Times the full 20-step CFG denoise loop (40 UNet evals) at 512² latents
(64×64×4) in bf16, whole loop in ONE jitted program. Params are random-init
ON DEVICE (no weights in this environment; compute is identical to trained
weights). Prints one JSON line.

Run: python benchmarks/bench_sd15.py [--steps 20] [--height 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--guidance", type=float, default=7.5)
    args = p.parse_args(argv)

    import os

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from intel_extension_for_transformers_tpu.diffusion import (
        ClipTextConfig,
        DDIMScheduler,
        UNetConfig,
        unet_init_params,
    )
    from intel_extension_for_transformers_tpu.diffusion.pipeline import _denoise_loop

    cfg = UNetConfig.sd15()
    tcfg = ClipTextConfig.sd15()
    h = args.height // 8

    # init on device in bf16 (relay-friendly: nothing big crosses the host)
    params = unet_init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    sched = DDIMScheduler()
    ts = sched.timesteps(args.steps)
    latents = jax.random.normal(jax.random.PRNGKey(1), (1, h, h, 4), jnp.float32)
    ctx = jax.random.normal(
        jax.random.PRNGKey(2), (1, tcfg.max_length, tcfg.hidden_size), jnp.bfloat16
    )
    unc = jax.random.normal(
        jax.random.PRNGKey(3), (1, tcfg.max_length, tcfg.hidden_size), jnp.bfloat16
    )

    def run(seed):
        lat = latents + 1e-6 * seed
        return _denoise_loop(
            params, cfg, lat, ctx, unc, ts,
            num_steps=args.steps, guidance_scale=args.guidance,
            dtype=jnp.bfloat16,
        )

    out = run(0)
    float(out[0, 0, 0, 0])  # force completion through the relay
    t0 = time.perf_counter()
    out = run(1)
    float(out[0, 0, 0, 0])
    dt = time.perf_counter() - t0

    baseline = 2.74  # SPR 8480+ bf16 20 steps (docs/release_data.md:88)
    print(
        json.dumps(
            {
                "metric": f"sd15_img2img_bf16_{args.height}px_{args.steps}steps",
                "value": round(dt, 3),
                "unit": "s",
                "vs_baseline": round(baseline / dt, 3),
            }
        )
    )
    return dt


if __name__ == "__main__":
    sys.exit(0 if main() else 0)
