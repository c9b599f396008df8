"""Benchmark: FastSVC GAN training + synthesis throughput on one chip.

Prints a cumulative JSON line after EVERY completed section — the final
line is the full result:
  {"metric": ..., "value": N, "unit": "audio-s/s/chip", "vs_baseline": N, ...}

Incremental emission is a round-5 hard requirement (VERDICT r4 weak #1):
round 4's run timed out and, because the old script printed one line at
the very end, the driver captured ZERO numbers. Now each section appends
its fields and reprints the whole cumulative dict (with "partial": true
until the last section lands), so a timeout preserves every completed
measurement; per-section wall seconds are reported under "section_s".

Baseline anchor (BASELINE.md): the reference trains 600k steps x 32 s of
audio per step in ~2 days on one RTX 3090 ≈ 110 audio-seconds/s sustained
(both GAN phases). vs_baseline = ours / 110.

Measurement methodology (round-2 rework; see VERDICT.md weak #1):
  * Timing is derived from TWO scan lengths K1 < K2 run as single device
    programs: per-step time = (t(K2) - t(K1)) / (K2 - K1). Fixed dispatch /
    RPC-tunnel latency cancels in the difference, and each measurement is
    forced to completion by jax.device_get of a param leaf — actual result
    bytes crossing back to the host — NOT jax.block_until_ready, which on
    the experimental 'axon' tunnel was observed to return before device
    completion (the round-1 numbers timed RPC round-trips, ~22x over the
    chip's bf16 peak).
  * Physics check: FLOPs/step come from the compiled program's XLA cost
    analysis; the script reports MFU = implied FLOP/s / device bf16 peak
    and RAISES if implied FLOP/s exceeds peak — an impossible number never
    gets printed.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# bf16 peak matmul throughput per chip, FLOP/s. Sources: public TPU specs
# (v4: 275 TF; v5e aka "v5 lite": 197 TF; v5p: 459 TF; v6e Trillium: 918 TF).
_PEAK_BF16 = {
    "TPU v2": 45e12,
    "TPU v3": 123e12,
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,  # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def device_peak_bf16():
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", str(d))
    # longest-prefix match so "TPU v5 lite" wins over "TPU v5"
    best = None
    for k, v in _PEAK_BF16.items():
        if kind.startswith(k) and (best is None or len(k) > len(best[0])):
            best = (k, v)
    if best is not None:
        return best[1], kind
    return None, kind  # unknown (e.g. CPU) — skip the physics assert


def build_task(sr: int = 24000, compute_dtype=None):
    """BASELINE.json metric is at 24 kHz: the paper's [5,4,4,2] generator
    (hop 160 at 24 kHz). sr=16000 gives the conf/fastsvc.yaml [2,4,4,5]
    recipe config instead."""
    from svcc23_fastsvc_tpu.losses import MultiResolutionSTFTLoss
    from svcc23_fastsvc_tpu.models.fastsvc import (
        FastSVCGenerator,
        MelGANMultiScaleDiscriminator,
    )
    from svcc23_fastsvc_tpu.ops.signal_gen import SignalGenerator
    from svcc23_fastsvc_tpu.train import FastSVCTrainTask, make_optimizer

    scales = (5, 4, 4, 2) if sr == 24000 else (2, 4, 4, 5)
    generator = FastSVCGenerator(upsampling_scales=scales)
    discriminator = MelGANMultiScaleDiscriminator(  # conf/fastsvc.yaml:35-52
        scales=3, channels=16, max_downsample_channels=512,
        downsample_scales=(4, 4, 4),
    )
    return FastSVCTrainTask(
        generator=generator,
        discriminator=discriminator,
        g_tx=make_optimizer(lr=1e-3, grad_norm=10.0),
        d_tx=make_optimizer(lr=1e-3, grad_norm=1.0),
        signal_generator=SignalGenerator(sample_rate=sr, hop_size=160),
        compute_dtype=compute_dtype,
    )


def make_batch(key, B, Tf, hop, in_channels=144, emb=512):
    ks = jax.random.split(key, 4)
    return {
        "ppg": jax.random.normal(ks[0], (B, Tf, in_channels)),
        "f0": jnp.full((B, Tf, 1), 220.0),
        "lft": jax.random.normal(ks[1], (B, Tf * hop, 1)) * 0.1,
        "spk_emb": jax.random.normal(ks[2], (B, emb)),
        "audio": jax.random.normal(ks[3], (B, Tf * hop, 1)) * 0.1,
    }


def force_done(tree):
    """Force completion by pulling real result bytes to the host.

    jax.block_until_ready was observed not to synchronize with device
    completion on the experimental axon tunnel (VERDICT.md weak #1), so a
    wall-clock stop based on it measures dispatch, not execution. device_get
    of an output leaf cannot return before the computation that produced the
    bytes has finished.
    """
    leaf = jax.tree.leaves(tree)[0]
    return np.asarray(jax.device_get(leaf)).ravel()[0]


def make_train_scan(step_fn, K):
    """K training steps over one (re-used) batch as a single device program.

    The carried train state makes every iteration depend on the previous
    one, so XLA cannot hoist the body out of the loop.
    """

    def fn(state, batch):
        def body(s, _):
            s2, _m = step_fn(s, batch)
            return s2, None

        state, _ = jax.lax.scan(body, state, None, length=K)
        return state

    return jax.jit(fn)


def time_train(step_fn, state, batch, *, k1=10, k2=60, reps=3):
    """Per-step seconds via the two-scan-length difference estimator."""
    scan1 = make_train_scan(step_fn, k1)
    scan2 = make_train_scan(step_fn, k2)
    # compile + warm up both programs
    state = scan1(state, batch)
    force_done(state.g_params)
    state = scan2(state, batch)
    force_done(state.g_params)

    def timed(scan_fn, s):
        t0 = time.perf_counter()
        s = scan_fn(s, batch)
        force_done(s.g_params)
        return time.perf_counter() - t0, s

    t1s, t2s = [], []
    for _ in range(reps):
        t, state = timed(scan1, state)
        t1s.append(t)
        t, state = timed(scan2, state)
        t2s.append(t)
    t1, t2 = min(t1s), min(t2s)
    per_step = (t2 - t1) / (k2 - k1)
    # guard against clock noise making the difference negative: fall back to
    # the conservative whole-program bound (includes dispatch overhead)
    if per_step <= 0:
        per_step = t2 / k2
    return per_step, t2 / k2, state


def make_synth_scan(apply_fn, K):
    """K forward passes; the carry perturbs the second argument by ~1e-12 x
    the previous output's mean so iterations are sequentially dependent (no
    loop-invariant hoisting), while the numerics stay unchanged."""

    def fn(params, x, *rest):
        def body(c, _):
            # cast the perturbation to x's dtype so a bf16 input is not
            # promoted back to f32 (which would silently un-bf16 the net)
            out = apply_fn(params, x + (c * 1e-12).astype(x.dtype), *rest)
            return jnp.mean(out).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return c

    return jax.jit(fn)


def time_synth(apply_fn, args, *, k1=10, k2=60, reps=3):
    scan1 = make_synth_scan(apply_fn, k1)
    scan2 = make_synth_scan(apply_fn, k2)
    force_done(scan1(*args))
    force_done(scan2(*args))

    def timed(fn):
        t0 = time.perf_counter()
        force_done(fn(*args))
        return time.perf_counter() - t0

    t1 = min(timed(scan1) for _ in range(reps))
    t2 = min(timed(scan2) for _ in range(reps))
    per_call = (t2 - t1) / (k2 - k1)
    if per_call <= 0:
        per_call = t2 / k2
    return per_call


def flops_of(jitted, *args):
    """FLOPs of the compiled program from XLA cost analysis (None if the
    backend doesn't report them)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = ca.get("flops") if ca else None
        return float(f) if f else None
    except Exception:
        return None


def check_physics(name, flops_per_step, per_step_s, peak):
    """MFU + hard failure on impossible numbers."""
    if flops_per_step is None:
        return None
    implied = flops_per_step / per_step_s
    if peak is not None and implied > 1.05 * peak:
        raise RuntimeError(
            f"{name}: implied {implied/1e12:.1f} TFLOP/s exceeds device bf16 "
            f"peak {peak/1e12:.1f} TFLOP/s — timing is not synchronizing "
            f"with device completion; refusing to report a fake number"
        )
    return implied / peak if peak else None


def _init_backend_with_retry(max_wait_s: int = 900, interval_s: int = 60,
                             probe_timeout_s: int = 240):
    """The experimental axon tunnel flaps; a transient outage at bench time
    shouldn't zero the round. A down tunnel makes jax.devices() either
    raise OR hang in device enumeration (both observed), so probe it in a
    daemon thread with a deadline. Failed/hung init is cached inside jax,
    so retry by re-exec'ing this process (bounded via an env counter);
    execv also discards the hung probe thread."""
    import os
    import sys
    import threading

    out = {}

    def probe():
        try:
            out["devs"] = jax.devices()
        except Exception as e:  # RuntimeError: unable to initialize backend
            out["err"] = e

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(probe_timeout_s)
    if "devs" in out:
        return out["devs"]
    err = out.get("err", f"device enumeration hung > {probe_timeout_s}s")
    n = int(os.environ.get("_BENCH_INIT_RETRY", "0"))
    if (n + 1) * interval_s > max_wait_s:
        raise RuntimeError(f"backend init failed after {n} retries: {err}")
    print(
        f"backend init failed ({err}); retry {n + 1} in {interval_s}s",
        file=sys.stderr,
        flush=True,
    )
    time.sleep(interval_s)
    os.environ["_BENCH_INIT_RETRY"] = str(n + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    import sys

    _init_backend_with_retry()
    # persistent compile cache: the second bench run (and any preemption
    # restart) should pay near-zero compile (VERDICT r3 weak #4)
    from svcc23_fastsvc_tpu.bin.common import enable_compile_cache

    cache_dir = enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default=None,
                    help="optional jax.profiler trace output dir")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k1", type=int, default=10)
    ap.add_argument("--k2", type=int, default=60)
    ap.add_argument("--sections", default="all",
                    help="comma-separated subset of section names to run")
    ap.add_argument("--budget-s", type=float,
                    default=float(__import__("os").environ.get(
                        "FASTSVC_BENCH_BUDGET_S", "2400")),
                    help="soft wall-clock budget: a section that would "
                         "START after this many seconds is skipped and "
                         "recorded as skipped_budget (the driver's hard "
                         "timeout must never be the thing that ends the "
                         "run)")
    args = ap.parse_args()
    t_start = time.perf_counter()

    # Reference training shape: batch 32 x 1 s (conf/fastsvc.yaml:71-72),
    # evaluated at 24 kHz per the BASELINE metric (150 frames x hop 160).
    B, sr, hop = args.batch, 24000, 160
    Tf = sr // hop
    audio_s_per_batch = B * Tf * hop / sr

    peak, device_kind = device_peak_bf16()

    # Decide the conv lowering EAGERLY, before any step function traces:
    # round 2's numbers were silently XLA-fallback because the auto-mode
    # Pallas self-check first fired inside the jit trace and died on
    # tracers (VERDICT r2 weak #1). The active lowering is recorded in the
    # output JSON so every number is attributable.
    from svcc23_fastsvc_tpu.ops.conv import decide_conv_lowering

    conv_lowering = decide_conv_lowering()
    print(f"conv lowering: {conv_lowering}", file=sys.stderr)

    result = {
        "metric": "fastsvc_gan_train_audio_seconds_per_s_per_chip_24khz",
        "value": None,
        "unit": "audio-s/s/chip",
        "vs_baseline": None,
        "conv_lowering": conv_lowering,
        "batch": B,
        "compile_cache": cache_dir is not None,
        "device": device_kind,
        "peak_bf16_tflops": round(peak / 1e12, 1) if peak else None,
        "timing": "two-scan-length difference, device_get-forced sync",
        "partial": True,
        "sections_done": [],
        "section_s": {},
    }
    ctx = {}  # objects shared across sections (task/state/batch)

    def section_fastsvc_train_f32():
        task = build_task(sr)
        state = task.init_state(jax.random.PRNGKey(0))
        batch = make_batch(jax.random.PRNGKey(1), B, Tf, hop)
        ctx.update(task=task, state=state, batch=batch)
        # FLOPs + compile of one full GAN step (the sustained regime:
        # 500k of 600k steps). With a warm persistent compile cache this
        # compile_s should collapse to ~0 (restart-rescue evidence).
        t0 = time.perf_counter()
        gan_flops = flops_of(jax.jit(task.gan_step), state, batch)
        gan_compile = time.perf_counter() - t0
        step_t, step_t_bound, state2 = time_train(
            task.gan_step, state, batch,
            k1=args.k1, k2=args.k2, reps=args.reps,
        )
        ctx["state"] = state2
        tput = audio_s_per_batch / step_t
        mfu = check_physics("gan_step_f32", gan_flops, step_t, peak)
        return {
            "value": round(tput, 1),
            "vs_baseline": round(tput / 110.0, 2),
            "gan_step_ms": round(step_t * 1e3, 3),
            "gan_step_ms_incl_dispatch": round(step_t_bound * 1e3, 3),
            "gan_step_tflop": (
                round(gan_flops / 1e12, 3) if gan_flops else None
            ),
            "mfu": round(mfu, 4) if mfu is not None else None,
            "compile_s": round(gan_compile, 1),
        }

    def section_fastsvc_train_bf16():
        # bf16 mixed precision (conv/matmul compute in bf16, losses f32)
        task16 = build_task(sr, compute_dtype=jnp.bfloat16)
        state16 = task16.init_state(jax.random.PRNGKey(0))
        batch = ctx.get("batch")
        if batch is None:
            batch = make_batch(jax.random.PRNGKey(1), B, Tf, hop)
        flops16 = flops_of(jax.jit(task16.gan_step), state16, batch)
        step16_t, _, _ = time_train(task16.gan_step, state16, batch,
                                    k1=args.k1, k2=args.k2, reps=args.reps)
        tput = audio_s_per_batch / step16_t
        mfu = check_physics("gan_step_bf16", flops16, step16_t, peak)
        return {
            "bf16_audio_s_per_s": round(tput, 1),
            "bf16_gan_step_ms": round(step16_t * 1e3, 3),
            "bf16_mfu": round(mfu, 4) if mfu is not None else None,
        }

    def _synth_setup():
        import dataclasses

        from svcc23_fastsvc_tpu.ops import fold_weight_norm

        task = ctx.get("task") or build_task(sr)
        state = ctx.get("state") or task.init_state(jax.random.PRNGKey(0))
        generator = dataclasses.replace(task.generator, fuse_film=True)
        g_inf = fold_weight_norm(state.g_params)
        sb = 64
        sbatch = make_batch(jax.random.PRNGKey(2), sb, Tf, hop)
        # jit the excitation build: eager ops on the tunnel backend each
        # pay a minutes-long remote compile
        sine = jax.jit(task.signal_generator)(
            sbatch["f0"], jax.random.PRNGKey(3)
        )
        syn_args = (g_inf, sbatch["ppg"], sine, sbatch["lft"],
                    sbatch["spk_emb"])
        ctx.update(generator=generator, syn_args=syn_args, syn_sb=sb)
        return generator, syn_args, sb

    def section_fastsvc_synth_f32():
        # folded-weight generator forward, large batch, inference-only
        # FiLM fusion (as decode runs it)
        generator, syn_args, sb = _synth_setup()
        syn_flops = flops_of(jax.jit(generator.apply), *syn_args)
        syn_t = time_synth(generator.apply, syn_args,
                           k1=args.k1, k2=args.k2, reps=args.reps)
        tput = (sb * Tf * hop / sr) / syn_t
        mfu = check_physics("synthesis_f32", syn_flops, syn_t, peak)
        return {
            "synthesis_audio_s_per_s_per_chip": round(tput, 1),
            "synthesis_mfu": round(mfu, 4) if mfu is not None else None,
        }

    def section_fastsvc_synth_bf16():
        # decode --infer-dtype bf16 (the recipe default via
        # compute_dtype: bfloat16): params + inputs bf16, f32 output
        if "syn_args" in ctx:
            generator, syn_args, sb = (
                ctx["generator"], ctx["syn_args"], ctx["syn_sb"]
            )
        else:
            generator, syn_args, sb = _synth_setup()
        syn16_args = jax.tree.map(
            lambda x: (
                x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x
            ),
            syn_args,
        )
        apply16 = (
            lambda *a: generator.apply(*a).astype(jnp.float32)  # noqa: E731
        )
        syn16_flops = flops_of(jax.jit(apply16), *syn16_args)
        syn16_t = time_synth(apply16, syn16_args,
                             k1=args.k1, k2=args.k2, reps=args.reps)
        tput = (sb * Tf * hop / sr) / syn16_t
        mfu = check_physics("synthesis_bf16", syn16_flops, syn16_t, peak)
        return {
            "bf16_synthesis_audio_s_per_s_per_chip": round(tput, 1),
            "bf16_synthesis_mfu": round(mfu, 4) if mfu is not None else None,
        }

    def section_b02_vocoder_bf16():
        # B02 vocoder (HN-uSFGAN) synthesis throughput — the other
        # recipe's RTF surface (reference synthesize_b02.py:149-175).
        # Default config (20 harmonic + 5 noise + 30 filter blocks),
        # bf16, batch 8 x 1 s.
        from svcc23_fastsvc_tpu.dsp.f0 import dilated_factor
        from svcc23_fastsvc_tpu.models.hnusfgan import (
            HNUSFGANGenerator,
            _chain_max,
            _pd_mode_on,
        )
        from svcc23_fastsvc_tpu.ops import fold_weight_norm
        from svcc23_fastsvc_tpu.ops.signal_gen import SignalGenerator as SG

        # decide the fused-block lowering eagerly (same discipline as the
        # conv gate: the probe must not first fire inside the jit trace)
        pd_lowering = ("pallas-fused" if _pd_mode_on(jnp.bfloat16) else "xla")
        pd_chain = (
            _chain_max(jnp.bfloat16) if pd_lowering == "pallas-fused" else 1
        )
        if pd_chain > 1:
            pd_lowering = f"pallas-fused-chain{pd_chain}"
        print(f"b02 pd-block lowering: {pd_lowering}", file=sys.stderr)

        voc_hop = 160
        voc = HNUSFGANGenerator(upsample_scales=(5, 4, 4, 2),
                                pd_frame_hop=voc_hop)
        vb, vTf = 8, sr // voc_hop
        voc_p = jax.tree.map(
            lambda x: (
                x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x
            ),
            fold_weight_norm(voc.init(jax.random.PRNGKey(4))),
        )
        f0v = np.full((vb, vTf, 1), 220.0, np.float32)
        voc_sg = SG(sample_rate=sr, hop_size=voc_hop,
                    signal_types=("sine", "noise"))
        sine2 = jax.jit(voc_sg)(jnp.asarray(f0v), jax.random.PRNGKey(5))
        acw = voc.aux_context_window
        aux = jax.random.normal(
            jax.random.PRNGKey(6), (vb, vTf + 2 * acw, voc.aux_channels)
        ).astype(jnp.bfloat16)
        df = jnp.asarray(np.stack([
            dilated_factor(f0v[i, :, 0].copy(), sr, 4) for i in range(vb)
        ]), jnp.float32)
        # dilated_factor returns frame-rate values upsampled to samples
        # inside the dataset; replicate that contract here if needed
        if df.shape[1] != vTf * voc_hop:
            df = jnp.repeat(df, vTf * voc_hop // df.shape[1], axis=1)

        def voc_fwd(params, x, c, d):
            y, _ = voc.apply(params, x, c, d)
            return y.astype(jnp.float32)

        voc_args = (voc_p, sine2.astype(jnp.bfloat16), aux, df)
        # FLOPs from the XLA lowering: cost analysis cannot see inside
        # the fused Pallas custom calls, and the math is
        # lowering-invariant. Save/restore the gate state directly so the
        # probe isn't re-run.
        import svcc23_fastsvc_tpu.models.hnusfgan as _hn

        _saved = _hn._PALLAS_PD_MODE
        _hn._PALLAS_PD_MODE = "0"
        voc_flops = flops_of(jax.jit(voc_fwd), *voc_args)
        _hn._PALLAS_PD_MODE = _saved
        voc_t = time_synth(voc_fwd, voc_args, k1=max(2, args.k1 // 5),
                           k2=max(6, args.k2 // 5), reps=args.reps)
        tput = (vb * vTf * voc_hop / sr) / voc_t
        mfu = check_physics("b02_vocoder_bf16", voc_flops, voc_t, peak)
        return {
            "b02_vocoder_bf16_audio_s_per_s_per_chip": round(tput, 1),
            "b02_vocoder_mfu": round(mfu, 4) if mfu is not None else None,
            "b02_pd_block_lowering": pd_lowering,
        }

    def _b02_setup():
        # B02 acoustic model (Tacotron2) — the reference's other training
        # budget (50k steps, batch 16, taco2_hubertsoft.yaml:54,96).
        # Representative shape: 16 x 600 frames (~4 s utterances).
        from svcc23_fastsvc_tpu.models.tacotron2 import (
            MultiSubFreqDiscriminator,
            Tacotron2,
        )
        from svcc23_fastsvc_tpu.train import make_optimizer as _mk_opt
        from svcc23_fastsvc_tpu.train.b02 import B02TrainTask

        if "b02_task" in ctx:
            return ctx["b02_task"], ctx["b02_state"], ctx["t_batch"]
        taco = Tacotron2()  # defaults == taco2_hubertsoft.yaml params
        b02_task = B02TrainTask(
            generator=taco,
            discriminator=MultiSubFreqDiscriminator(),
            g_tx=_mk_opt(lr=1e-4, eps=1e-6, grad_norm=1.0,
                         scheduler_step_size=4000),
            d_tx=_mk_opt(lr=2e-4, eps=1e-6, grad_norm=10.0),
            lambda_adv=2.5,
        )
        tb, tT = 16, 600
        tkeys = jax.random.split(jax.random.PRNGKey(7), 4)
        t_batch = {
            "ppg": jax.random.normal(tkeys[0], (tb, tT, 256)),
            "lft": jax.random.normal(tkeys[1], (tb, tT, 1)) * 0.1,
            "lf0": jnp.full((tb, tT, 1), 5.3),
            "spk_emb": jax.random.normal(tkeys[2], (tb, 512)),
            "targets": jax.random.normal(tkeys[3], (tb, tT, 63)),
            "lengths": jnp.full((tb,), tT, jnp.int32),
        }
        b02_state = b02_task.init_state(jax.random.PRNGKey(8))
        ctx.update(b02_task=b02_task, b02_state=b02_state, t_batch=t_batch,
                   taco=taco)
        return b02_task, b02_state, t_batch

    def section_b02_taco2_train_f32():
        b02_task, b02_state, t_batch = _b02_setup()
        taco_flops = flops_of(jax.jit(b02_task.gan_step), b02_state, t_batch)
        taco_audio_s = 16 * 600 * 160 / sr
        taco_t, _, _ = time_train(
            b02_task.gan_step, b02_state, t_batch,
            k1=max(2, args.k1 // 5), k2=max(6, args.k2 // 5), reps=args.reps,
        )
        tput = taco_audio_s / taco_t
        mfu = check_physics("b02_taco2_train", taco_flops, taco_t, peak)
        return {
            "b02_taco2_train_audio_s_per_s_per_chip": round(tput, 1),
            "b02_taco2_train_mfu": (
                round(mfu, 4) if mfu is not None else None
            ),
        }

    def section_b02_taco2_train_bf16():
        # bf16 mixed-precision taco2 train (compute_dtype plumbing in
        # train/b02.py; scan carry + matmuls bf16, losses/params f32)
        import dataclasses as _dc

        b02_task, _, t_batch = _b02_setup()
        task16 = _dc.replace(b02_task, compute_dtype=jnp.bfloat16)
        state16 = task16.init_state(jax.random.PRNGKey(8))
        flops16 = flops_of(jax.jit(task16.gan_step), state16, t_batch)
        taco_audio_s = 16 * 600 * 160 / sr
        t16, _, _ = time_train(
            task16.gan_step, state16, t_batch,
            k1=max(2, args.k1 // 5), k2=max(6, args.k2 // 5), reps=args.reps,
        )
        tput = taco_audio_s / t16
        mfu = check_physics("b02_taco2_train_bf16", flops16, t16, peak)
        return {
            "b02_taco2_train_bf16_audio_s_per_s_per_chip": round(tput, 1),
            "b02_taco2_train_bf16_mfu": (
                round(mfu, 4) if mfu is not None else None
            ),
        }

    def section_b02_taco2_decode():
        _, b02_state, t_batch = _b02_setup()
        taco = ctx["taco"]

        def taco_decode(params, ppg, lft, lf0, emb):
            pred, _, _ = taco.apply(
                params, ppg,
                jnp.full((ppg.shape[0],), ppg.shape[1], jnp.int32),
                lft, lf0, emb, None, train=False,
            )
            return pred

        dec_args = (b02_state.g_params, t_batch["ppg"], t_batch["lft"],
                    t_batch["lf0"], t_batch["spk_emb"])
        dec_flops = flops_of(jax.jit(taco_decode), *dec_args)
        taco_audio_s = 16 * 600 * 160 / sr
        dec_t = time_synth(taco_decode, dec_args, k1=max(2, args.k1 // 5),
                           k2=max(6, args.k2 // 5), reps=args.reps)
        tput = taco_audio_s / dec_t
        mfu = check_physics("b02_taco2_decode", dec_flops, dec_t, peak)
        return {
            "b02_taco2_decode_audio_s_per_s_per_chip": round(tput, 1),
            "b02_taco2_decode_mfu": (
                round(mfu, 4) if mfu is not None else None
            ),
        }

    # Ordered by importance: the headline train metrics first, then the
    # decode surfaces, then the B02 sections — on a timeout the tail holds
    # the numbers that matter most.
    sections = [
        ("fastsvc_train_f32", section_fastsvc_train_f32),
        ("fastsvc_train_bf16", section_fastsvc_train_bf16),
        ("fastsvc_synth_f32", section_fastsvc_synth_f32),
        ("fastsvc_synth_bf16", section_fastsvc_synth_bf16),
        ("b02_vocoder_bf16", section_b02_vocoder_bf16),
        ("b02_taco2_train_f32", section_b02_taco2_train_f32),
        ("b02_taco2_train_bf16", section_b02_taco2_train_bf16),
        ("b02_taco2_decode", section_b02_taco2_decode),
    ]
    wanted = (None if args.sections == "all"
              else {s.strip() for s in args.sections.split(",")})

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)

    errors = {}
    for name, fn in sections:
        if wanted is not None and name not in wanted:
            continue
        elapsed = time.perf_counter() - t_start
        if elapsed > args.budget_s:
            result.setdefault("skipped_budget", []).append(name)
            print(f"section {name} skipped: {elapsed:.0f}s elapsed > "
                  f"budget {args.budget_s:.0f}s", file=sys.stderr)
            continue
        t0 = time.perf_counter()
        try:
            fields = fn()
        except Exception as e:  # record, keep measuring the rest
            errors[name] = f"{type(e).__name__}: {e}"
            result["section_errors"] = errors
            print(f"section {name} FAILED: {errors[name]}", file=sys.stderr)
        else:
            result.update(fields)
            result["sections_done"].append(name)
        result["section_s"][name] = round(time.perf_counter() - t0, 1)
        # cumulative emission: the LAST complete JSON line always carries
        # every number measured so far
        print(json.dumps(result), flush=True)

    if args.trace_dir:
        jax.profiler.stop_trace()

    result["partial"] = False
    print(json.dumps(result), flush=True)
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
