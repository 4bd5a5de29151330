#!/usr/bin/env python3
"""Probe VPU arithmetic throughput by dtype (f32 vs bf16) on the live chip.

Decides whether the hybrid-precision forward kernel (f32 staging/rolls,
bf16 tap math) is worth building: if bf16 FMA chains don't run ~2x f32 on
this TPU generation, the conversion overhead can't pay for itself.

Method: a Pallas kernel runs ``K`` dependent FMA chains over an (R, 1920)
block, grid-iterated ``G`` times; chain-slope timing between two K values
isolates the per-FMA cost from fixed overhead.
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/rdt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(K, dtype):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        a = x
        b = x * jnp.asarray(0.5, dtype)
        half = jnp.asarray(0.4995, dtype)
        # data-dependent cross-coupled FMAs: not constant-foldable (a linear
        # chain with scalar constants collapses to ONE fma at compile time)
        for _ in range(K // 2):
            a = a * b + half
            b = b - a * half
        o_ref[...] = a + b
    return kernel


def bench(K, dtype, R=512, W=1920, G=64, reps=3):
    x = jnp.asarray(np.random.default_rng(0).random((R, W)), dtype)

    @jax.jit
    def f(x):
        return pl.pallas_call(
            make_kernel(K, dtype),
            grid=(G,),
            in_specs=[pl.BlockSpec((R, W), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((R, W), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((R, W), dtype),
        )(x)

    f(x).block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--klo", type=int, default=64)
    ap.add_argument("--khi", type=int, default=256)
    args = ap.parse_args()
    R, W, G = 512, 1920, 64
    n_elem = R * W * G
    for dtype, name in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        try:
            tlo = bench(args.klo, dtype, R, W, G)
            thi = bench(args.khi, dtype, R, W, G)
        except Exception as e:  # noqa: BLE001 - probe tool, report and move on
            print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        dt = (thi - tlo) / (args.khi - args.klo)
        print(f"{name}: {dt * 1e9:.3f} ns/FMA-pass  "
              f"({n_elem / dt / 1e12:.2f} Tfma/s)")


if __name__ == "__main__":
    main()
