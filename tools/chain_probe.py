#!/usr/bin/env python3
"""Chained-sweep timing probe: fwd and fwd+bwd at 1080p vs tile_rows.

Usage: python tools/chain_probe.py [--tiles 0 48 56 72 88] (0 = auto)
"""

import argparse
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
from raymarchdenoisercuda_tpu.ops.pallas.atrous_tpu import svgf_spatial_pallas


def scene(H, W, seed=0):
    rng = np.random.default_rng(seed)
    color = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    variance = jnp.asarray((0.02 * rng.random((H, W))).astype(np.float32))
    n = rng.standard_normal((3, H, W)).astype(np.float32)
    n[2] += 3.0
    n /= np.sqrt((n ** 2).sum(0, keepdims=True))
    depth = jnp.asarray((0.3 + 0.5 * rng.random((H, W))).astype(np.float32))
    return color, variance, jnp.asarray(n), depth


def chain_time(make_fn, x, n_lo=3, n_hi=18, reps=3):
    f_lo, f_hi = make_fn(n_lo), make_fn(n_hi)
    float(f_lo(x)); float(f_hi(x))
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(f_lo(x))
        t1 = time.perf_counter(); float(f_hi(x))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n_hi - n_lo))
    return sorted(slopes)[len(slopes) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, nargs="*", default=[0])
    ap.add_argument("--what", nargs="*", default=["fwd", "fwdbwd"])
    ap.add_argument("--wmath", default="fast", choices=["exact", "fast"])
    ap.add_argument("--H", type=int, default=1080)
    ap.add_argument("--W", type=int, default=1920)
    args = ap.parse_args()

    H, W = args.H, args.W
    params = SVGFParams(iterations=5)
    color, variance, normal, depth = scene(H, W)

    for tr in args.tiles:
        tile = tr or None
        if "fwd" in args.what:
            def mk(n, tile=tile):
                @jax.jit
                def f(c):
                    def body(i, c):
                        oc, ov = svgf_spatial_pallas(
                            c, variance, normal, depth, params=params,
                            tile_rows=tile, weight_math=args.wmath)
                        return oc
                    return jnp.sum(jax.lax.fori_loop(0, n, body, c))
                return f
            try:
                dt = chain_time(mk, color)
                print(f"tile={tr}: fwd  {dt*1e3:7.3f} ms "
                      f"({H*W/dt/1e6:7.1f} Mpix/s)", flush=True)
            except Exception as e:
                print(f"tile={tr}: fwd FAILED {str(e)[:120]}", flush=True)
        if "fwdbwd" in args.what:
            def mkb(n, tile=tile):
                @jax.jit
                def f(c):
                    def loss(c):
                        oc, ov = svgf_spatial_pallas(
                            c, variance, normal, depth, params=params,
                            tile_rows=tile, weight_math=args.wmath)
                        return jnp.sum(oc ** 2) + jnp.sum(ov)

                    def body(i, cv):
                        _, g = jax.value_and_grad(loss)(cv)
                        return g
                    return jnp.sum(jax.lax.fori_loop(0, n, body, c))
                return f
            try:
                dt = chain_time(mkb, color)
                print(f"tile={tr}: f+b  {dt*1e3:7.3f} ms "
                      f"({H*W/dt/1e6:7.1f} Mpix/s)", flush=True)
            except Exception as e:
                print(f"tile={tr}: f+b FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
