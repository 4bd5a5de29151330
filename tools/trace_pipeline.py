#!/usr/bin/env python3
"""Capture a jax.profiler trace of the full frame pipeline (raymarch ->
temporal -> SVGF) at 1080p and print per-kernel durations.

Run AFTER bench.py --config pipeline_1080p so executables are cached.
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

from raymarchdenoisercuda_tpu.config import CameraParams, RaymarchParams, SVGFParams
from raymarchdenoisercuda_tpu.gbuffer import History
from raymarchdenoisercuda_tpu.models.svgf import svgf_denoise_frame
from raymarchdenoisercuda_tpu.ops.raymarch import (
    cornell_scene, cornell_camera, render_gbuffer)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/rdt_trace_pipe")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--radius", type=int, default=1, choices=[1, 2])
    ap.add_argument("--wmath", default="fast", choices=["exact", "fast"])
    args = ap.parse_args()

    H, W = 1080, 1920
    cam_cfg = CameraParams(width=W, height=H)
    rm = RaymarchParams()
    svgf = SVGFParams(iterations=5, radius=args.radius)
    scene = cornell_scene()
    cam = cornell_camera()

    @jax.jit
    def f(key):
        hist = History.zeros(H, W)

        def body(i, carry):
            hist, key, acc = carry
            key, sub = jax.random.split(key)
            g = render_gbuffer(scene, cam, cam, sub, cam_cfg=cam_cfg,
                               params=rm, spp=1, impl="pallas",
                               normal_impl="pallas")
            out, hist = svgf_denoise_frame(g, hist, params=svgf,
                                           impl="pallas",
                                           weight_math=args.wmath)
            # consume the denoised frame (same anti-DCE rule as bench.py)
            return (hist, key, acc + jnp.sum(out.denoised))

        hist, _, acc = jax.lax.fori_loop(
            0, args.iters, body,
            (hist, jax.random.PRNGKey(0), jnp.float32(0.0)))
        return jnp.sum(hist.color) + acc

    float(f(jax.random.PRNGKey(0)))  # compile + warm
    with jax.profiler.trace(args.outdir):
        float(f(jax.random.PRNGKey(0)))

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
        durs[ev.get("name", "")] += ev.get("dur", 0)
        counts[ev.get("name", "")] += 1
    rows = sorted(durs.items(), key=lambda kv: -kv[1])
    total = sum(d for _, d in rows)
    print(f"top events (sum {total/1e3:.1f} ms over {args.iters} frames):")
    for name, d in rows[:45]:
        print(f"  {d/1e3/args.iters:9.3f} ms/frame  x{counts[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
