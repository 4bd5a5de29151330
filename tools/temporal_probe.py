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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1080x1920")
    ap.add_argument("--impl", default="pallas", choices=["pallas", "xla"])
    args = ap.parse_args()
    H, W = map(int, args.size.split("x"))
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
