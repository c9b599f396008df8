"""Chip A/B: XLA-VJP path vs Pallas-conv path, train + synthesis."""
import argparse, os as _os, sys
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax, jax.numpy as jnp
p = argparse.ArgumentParser()
p.add_argument("--mode", default="0")        # FASTSVC_PALLAS_CONV mode
p.add_argument("--what", default="train")    # train | synth
p.add_argument("--dtype", default="bf16")
args = p.parse_args()
from svcc23_fastsvc_tpu.ops.conv import set_pallas_conv_mode
set_pallas_conv_mode(args.mode)
from bench import build_task, make_batch, time_train, time_synth
dt = jnp.bfloat16 if args.dtype == "bf16" else None
B, sr, hop = 32, 24000, 160
Tf = sr // hop
if args.what == "train":
    task = build_task(sr, compute_dtype=dt)
    state = task.init_state(jax.random.PRNGKey(0))
    batch = make_batch(jax.random.PRNGKey(1), B, Tf, hop)
    t, tb, _ = time_train(task.gan_step, state, batch, k1=10, k2=40, reps=3)
    print(f"AB mode={args.mode} {args.dtype} gan_step: "
          f"{t*1e3:.2f} ms/step ({B / t:.0f} audio-s/s)", flush=True)
else:
    import dataclasses
    from svcc23_fastsvc_tpu.ops import fold_weight_norm
    task = build_task(sr)
    state = task.init_state(jax.random.PRNGKey(0))
    generator = dataclasses.replace(task.generator, fuse_film=True)
    g_inf = fold_weight_norm(state.g_params)
    sb = 64
    sbatch = make_batch(jax.random.PRNGKey(2), sb, Tf, hop)
    sine = jax.jit(task.signal_generator)(sbatch["f0"], jax.random.PRNGKey(3))
    syn_args = (g_inf, sbatch["ppg"], sine, sbatch["lft"], sbatch["spk_emb"])
    if args.dtype == "bf16":
        syn_args = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            syn_args)
    t = time_synth(generator.apply, syn_args, k1=10, k2=40, reps=3)
    print(f"AB mode={args.mode} {args.dtype} synthesis: "
          f"{(sb * Tf * hop / sr) / t:.0f} audio-s/s", flush=True)
