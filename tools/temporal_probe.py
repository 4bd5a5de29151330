#!/usr/bin/env python3
"""Chain-slope timing of the fused temporal Pallas kernel at 1080p.

The history feeds back frame-to-frame, forming the timing dependency chain
(same methodology as bench.py `_chain_time`).  Compares the Pallas band
kernel against the XLA path with one JSON line per impl.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rdt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from raymarchdenoisercuda_tpu.config import SVGFParams
from raymarchdenoisercuda_tpu.gbuffer import GBuffer, History


def scene(H, W, seed=0):
    rng = np.random.default_rng(seed)
    f32 = np.float32
    render = jnp.asarray(rng.random((3, H, W), dtype=f32))
    albedo = jnp.asarray(0.5 + 0.5 * rng.random((3, H, W), dtype=f32))
    n = rng.standard_normal((3, H, W)).astype(f32)
    n[2] += 3.0
    n /= np.sqrt((n ** 2).sum(0, keepdims=True))
    depth = jnp.asarray((0.3 + 0.5 * rng.random((H, W))).astype(f32))
    # coherent camera pan: ~constant small motion (the real input statistics)
    motion = jnp.stack([jnp.full((H, W), -1.3, jnp.float32),
                        jnp.full((H, W), 2.1, jnp.float32)])
    g = GBuffer(render=render, albedo=albedo, normal=jnp.asarray(n),
                depth=depth, motion=motion)
    return g


def chain_time(make_fn, x, n_lo=3, n_hi=18, reps=3):
    f_lo, f_hi = make_fn(n_lo), make_fn(n_hi)
    float(f_lo(x)); float(f_hi(x))
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f_lo(x)); t1 = time.perf_counter()
        t2 = time.perf_counter(); float(f_hi(x)); t3 = time.perf_counter()
        slopes.append(((t3 - t2) - (t1 - t0)) / (n_hi - n_lo))
    return min(slopes)


def probe_gather(H, W, motion_mode, reps=3):
    """The differentiable tent-gather kernel pair under a chosen motion
    distribution (round-5 verdict #2 gate: fwd+bwd at 1080p per-pixel random
    ±3 motion).  Measures, in ONE process: gather fwd, gather fwd + FULL
    adjoint (motion grads), gather fwd + dh-only adjoint (the training
    configuration), and the epilogue-path step (temporal_accumulate_pallas_ad
    fwd+bwd)."""
    from raymarchdenoisercuda_tpu.ops.pallas.temporal_tpu import (
        _reproject_gather, temporal_accumulate_pallas_ad)

    params = SVGFParams()
    rng = np.random.default_rng(0)
    f32 = np.float32
    hist_stack = jnp.asarray(rng.random((10, H, W), dtype=f32))
    if motion_mode == "random":
        motion = jnp.asarray(
            (2.0 * rng.random((2, H, W)) - 1.0).astype(f32) * 3.0)
    else:
        motion = jnp.stack([jnp.full((H, W), -1.3, jnp.float32),
                            jnp.full((H, W), 2.1, jnp.float32)])
    g = scene(H, W)
    g = g.replace(motion=motion)
    hist = History(color=hist_stack[0:3], moments=hist_stack[3:5],
                   length=1.0 + hist_stack[5], prev_depth=g.depth,
                   prev_normal=g.normal)

    def make_fwd(n):
        @jax.jit
        def f(h):
            def body(i, h):
                out = _reproject_gather(h, motion, params, False, True)
                return out.at[5].add(1e-6)  # keep the chain honest
            return jnp.sum(jax.lax.fori_loop(0, n, body, h))
        return f

    def make_fwdbwd(motion_grad):
        def mk(n):
            @jax.jit
            def f(h):
                def loss(hh):
                    out = _reproject_gather(hh, motion, params, False,
                                            motion_grad, 6)
                    # epilogue-shaped cotangent: zero on the validity planes
                    return jnp.sum(out[:6] ** 2)

                def body(i, hh):
                    return jax.grad(loss)(hh)
                return jnp.sum(jax.lax.fori_loop(0, n, body, h))
            return f
        return mk

    def make_step(n):
        @jax.jit
        def f(c0):
            def body(i, carry):
                c, hc, acc = carry

                def loss(cc, hcc):
                    integ, var, nh = temporal_accumulate_pallas_ad(
                        g.replace(render=cc), hist.replace(color=hcc),
                        params=params, motion_grad=False)
                    return (jnp.sum(integ ** 2) + jnp.sum(var)
                            + jnp.sum(nh.color) + jnp.sum(nh.moments)), nh

                # differentiate wrt the history color too (the training
                # path: gradients reach the previous frame's filter), and
                # CARRY the history so XLA cannot hoist the gather out of
                # the chain (the first probe version had a constant history
                # and measured a loop-invariant gather — meaningless)
                (v, nh), (gc, ghc) = jax.value_and_grad(
                    loss, argnums=(0, 1), has_aux=True)(c, hc)
                return gc, nh.color + ghc * 1e-6, acc + v

            c, hc, acc = jax.lax.fori_loop(
                0, n, body, (c0, hist.color, jnp.float32(0.0)))
            return jnp.sum(c) + jnp.sum(hc) + acc
        return f

    out = {"metric": f"temporal gather {H}p ({motion_mode} motion)"}
    for name, mk, x in [
            ("fwd_ms", make_fwd, hist_stack),
            ("fwdbwd_full_ms", make_fwdbwd(True), hist_stack),
            ("fwdbwd_dh_ms", make_fwdbwd(False), hist_stack),
            ("step_fwdbwd_nomg_ms", make_step, g.render)]:
        dt = chain_time(mk, x, n_lo=2, n_hi=8)
        out[name] = round(dt * 1e3, 3)
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1080x1920")
    ap.add_argument("--impl", default="pallas",
                    choices=["pallas", "xla", "gather"])
    ap.add_argument("--motion", default="random",
                    choices=["random", "pan"],
                    help="gather mode: per-pixel random ±3 (adversarial) or "
                         "a coherent camera pan")
    args = ap.parse_args()
    H, W = map(int, args.size.split("x"))
    if args.impl == "gather":
        probe_gather(H, W, args.motion)
        return
    g = scene(H, W)
    params = SVGFParams()

    if args.impl == "pallas":
        from raymarchdenoisercuda_tpu.ops.pallas.temporal_tpu import (
            temporal_accumulate_pallas as fn)
    else:
        from raymarchdenoisercuda_tpu.ops.temporal import (
            temporal_accumulate as fn)

    def make_chain(n):
        @jax.jit
        def f(c0):
            hist = History.zeros(H, W)
            hist = hist.replace(color=hist.color + c0)

            def body(i, hist):
                _, _, hist = fn(g, hist, params=params)
                return hist
            hist = jax.lax.fori_loop(0, n, body, hist)
            return jnp.sum(hist.color)
        return f

    dt = chain_time(make_chain, jnp.float32(0.0))
    print(json.dumps({
        "metric": f"temporal step {H}p ({args.impl})",
        "ms": round(dt * 1e3, 3),
        "Mpix_s": round(H * W / dt / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
