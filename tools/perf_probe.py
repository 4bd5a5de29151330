#!/usr/bin/env python3
"""Per-level atrous kernel timing probe (chain-slope method, TPU).

Usage: python tools/perf_probe.py [--levels 0 1 2 3 4] [--what fwd bwd]
Prints ms/level for the Pallas fwd and bwd kernels at 1080p.
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
from raymarchdenoisercuda_tpu.ops.atrous import variance_blur3x3, _EPS
from raymarchdenoisercuda_tpu.ops.common import finite_diff_gradients
from raymarchdenoisercuda_tpu.ops.pallas import atrous_tpu as at


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
    ap.add_argument("--levels", type=int, nargs="*", default=[0, 1, 2, 3, 4])
    ap.add_argument("--what", nargs="*", default=["fwd", "bwd"])
    ap.add_argument("--H", type=int, default=1080)
    ap.add_argument("--W", type=int, default=1920)
    args = ap.parse_args()

    H, W = args.H, args.W
    params = SVGFParams()
    color, variance, normal, depth = scene(H, W)
    zgrad = finite_diff_gradients(depth)
    sden = params.sigma_color * jnp.sqrt(
        jnp.maximum(variance_blur3x3(variance), 0.0)) + _EPS
    norm = jnp.ones((H, W), jnp.float32)
    gv = jnp.full((H, W), 0.1, jnp.float32)

    total = 0.0
    for lvl in args.levels:
        if "fwd" in args.what:
            def mk(n, lvl=lvl):
                @jax.jit
                def f(c):
                    def body(i, c):
                        c2, v2, _ = at.atrous_level_fwd_pallas(
                            c, variance, normal, depth, zgrad, sden,
                            level=lvl, params=params)
                        return c2
                    return jnp.sum(jax.lax.fori_loop(0, n, body, c))
                return f
            dt = chain_time(mk, color)
            total += dt
            print(f"fwd level {lvl}: {dt*1e3:8.3f} ms  "
                  f"({H*W/dt/1e6:7.1f} Mpix/s)", flush=True)
        if "bwd" in args.what:
            def mkb(n, lvl=lvl):
                @jax.jit
                def f(g):
                    def body(i, g):
                        dcol, dvar = at.atrous_level_bwd_pallas(
                            color, normal, depth, zgrad, sden, norm, g, gv,
                            level=lvl, params=params)
                        return dcol
                    return jnp.sum(jax.lax.fori_loop(0, n, body, g))
                return f
            dt = chain_time(mkb, color)
            total += dt
            print(f"bwd level {lvl}: {dt*1e3:8.3f} ms  "
                  f"({H*W/dt/1e6:7.1f} Mpix/s)", flush=True)
    print(f"total: {total*1e3:.3f} ms -> {H*W/total/1e6:.1f} Mpix/s "
          f"(levels {args.levels}, {args.what})")


# --- TH sweep (run as: python tools/perf_probe.py --sweep-th) ---
def sweep_th():
    import jax.numpy as jnp
    from raymarchdenoisercuda_tpu.config import SVGFParams
    from raymarchdenoisercuda_tpu.ops.atrous import variance_blur3x3, _EPS
    from raymarchdenoisercuda_tpu.ops.common import finite_diff_gradients
    from raymarchdenoisercuda_tpu.ops.pallas import atrous_tpu as at

    H, W = 1080, 1920
    params = SVGFParams()
    color, variance, normal, depth = scene(H, W)
    zgrad = finite_diff_gradients(depth)
    sden = params.sigma_color * jnp.sqrt(
        jnp.maximum(variance_blur3x3(variance), 0.0)) + _EPS
    norm = jnp.ones((H, W), jnp.float32)
    gv = jnp.full((H, W), 0.1, jnp.float32)
    for lvl in (0, 2, 4):
        for th in (None, 40, 56, 72, 88, 104, 120):
            try:
                def mk(n, lvl=lvl, th=th):
                    @jax.jit
                    def f(c):
                        def body(i, c):
                            c2, _v, _n = at.atrous_level_fwd_pallas(
                                c, variance, normal, depth, zgrad, sden,
                                level=lvl, params=params, tile_rows=th)
                            return c2
                        return jnp.sum(jax.lax.fori_loop(0, n, body, c))
                    return f
                dt = chain_time(mk, color)
                print(f"fwd level {lvl} TH={th}: {dt*1e3:7.3f} ms", flush=True)
            except Exception as e:
                print(f"fwd level {lvl} TH={th}: FAILED {str(e)[:80]}",
                      flush=True)
        for th in (None, 40, 56, 72, 88, 104, 120):
            try:
                def mkb(n, lvl=lvl, th=th):
                    @jax.jit
                    def f(g):
                        def body(i, g):
                            dcol, _dv = at.atrous_level_bwd_pallas(
                                color, normal, depth, zgrad, sden, norm, g,
                                gv, level=lvl, params=params, tile_rows=th)
                            return dcol
                        return jnp.sum(jax.lax.fori_loop(0, n, body, g))
                    return f
                dt = chain_time(mkb, color)
                print(f"bwd level {lvl} TH={th}: {dt*1e3:7.3f} ms", flush=True)
            except Exception as e:
                print(f"bwd level {lvl} TH={th}: FAILED {str(e)[:80]}",
                      flush=True)


if __name__ == "__main__":
    if "--sweep-th" in sys.argv:
        sweep_th()
    else:
        main()
