"""Round-4 chip A/B: generator train-path conv-batching variants.

VERDICT r3 weak #1 / next #2: the GAN step's measured bound is the
generator fwd+bwd core (~57 of 97.7 ms bf16 at 8.6% MFU). The two named
structural levers, measured here per-variant on the real chip:

  film  — fuse_film=True in TRAINING (the sine+lft FiLM output convs
          collapse 4 -> 1 per resolution via _film_pair; previously only
          enabled for inference after a one-off "~5% slower backward").
  stack — stack_downsample=True (the two identical-shape downsample
          chains run as one vmapped program: half the kernels, shared
          gather).

Usage: python tools/ab_generator_r04.py [--dtype bf16] [--variants all]
Prints one JSON line per variant.
"""

import argparse
import dataclasses
import json
import os as _os
import sys

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build_task, make_batch, time_train

VARIANTS = {
    "base": dict(fuse_film=False, stack_downsample=False),
    "film": dict(fuse_film=True, stack_downsample=False),
    "stack": dict(fuse_film=False, stack_downsample=True),
    "film+stack": dict(fuse_film=True, stack_downsample=True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--variants", default="all")
    ap.add_argument("--k1", type=int, default=10)
    ap.add_argument("--k2", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    names = list(VARIANTS) if args.variants == "all" else args.variants.split(",")
    dt = jnp.bfloat16 if args.dtype == "bf16" else None
    B, sr, hop = 32, 24000, 160
    Tf = sr // hop
    batch = make_batch(jax.random.PRNGKey(1), B, Tf, hop)

    for name in names:
        flags = VARIANTS[name]
        task = build_task(sr, compute_dtype=dt)
        task = dataclasses.replace(
            task, generator=dataclasses.replace(task.generator, **flags)
        )
        state = task.init_state(jax.random.PRNGKey(0))
        t, tb, _ = time_train(task.gan_step, state, batch,
                              k1=args.k1, k2=args.k2, reps=args.reps)
        print(json.dumps({
            "variant": name, "dtype": args.dtype,
            "gan_step_ms": round(t * 1e3, 3),
            "audio_s_per_s": round(B / t, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
