#!/usr/bin/env python3
"""Capture a jax.profiler trace of the chained SVGF fwd+bwd at 1080p and
print per-fusion (per-kernel) durations from the trace's events.

Run AFTER the kernels are in the compile cache (e.g. after bench.py) —
this only executes cached executables.

Usage: python tools/trace_chain.py [--outdir /tmp/rdt_trace]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rdt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from raymarchdenoisercuda_tpu.config import SVGFParams
from raymarchdenoisercuda_tpu.ops.pallas.atrous_tpu import svgf_spatial_pallas


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/rdt_trace")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--bwd", default="stored",
                    choices=["stored", "stored_f32", "recompute"])
    ap.add_argument("--wmath", default="fast", choices=["exact", "fast"])
    args = ap.parse_args()

    H, W = 1080, 1920
    params = SVGFParams(iterations=5)
    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    variance = jnp.asarray((0.02 * rng.random((H, W))).astype(np.float32))
    n = rng.standard_normal((3, H, W)).astype(np.float32)
    n[2] += 3.0
    n /= np.sqrt((n ** 2).sum(0, keepdims=True))
    normal = jnp.asarray(n)
    depth = jnp.asarray((0.3 + 0.5 * rng.random((H, W))).astype(np.float32))

    @jax.jit
    def f(c):
        def loss(c):
            oc, ov = svgf_spatial_pallas(c, variance, normal, depth,
                                         params=params, bwd_impl=args.bwd,
                                         weight_math=args.wmath)
            return jnp.sum(oc ** 2) + jnp.sum(ov)

        def body(i, cv):
            _, g = jax.value_and_grad(loss)(cv)
            return g
        return jnp.sum(jax.lax.fori_loop(0, args.iters, body, c))

    float(f(color))  # compile (cached) + warm
    with jax.profiler.trace(args.outdir):
        float(f(color))

    # parse the trace proto-agnostically via the .trace.json.gz if present
    files = sorted(glob.glob(os.path.join(
        args.outdir, "plugins/profile/*/*trace.json.gz")), key=os.path.getmtime)
    if not files:
        print("no trace.json.gz found under", args.outdir)
        return
    with gzip.open(files[-1], "rt") as fh:
        trace = json.load(fh)
    durs = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0)  # microseconds
        args_d = ev.get("args") or {}
        # keep device-side events only (XLA ops have 'run_id'/'hlo' style args)
        durs[name] += dur
        counts[name] += 1
    rows = sorted(durs.items(), key=lambda kv: -kv[1])
    total = sum(d for _, d in rows)
    print(f"top events (sum {total/1e3:.1f} ms over {args.iters} iters):")
    for name, d in rows[:40]:
        print(f"  {d/1e3/args.iters:9.3f} ms/iter  x{counts[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
