#!/usr/bin/env python3
"""Cheaper-filter variant probe (VERDICT r3 next-step #2): measure the
work-reduction candidates for the north-star config — SVGF fwd+bwd, 5-ish
à-trous iterations, 1080p — in ONE process so the chain-slope numbers share
a chip epoch (ROADMAP measurement discipline).

Variants are quality-gated separately by tools/denoise_quality.py against a
converged render; this tool only measures throughput.

Prints one JSON line per variant.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (bench.py sets up the compilation cache)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--variants", default="r2i5x,r2i5f,r1i5f,r1i6f",
                    help="comma list: r<radius>i<iters><x|f> (exact|fast)")
    args = ap.parse_args()

    for spec in args.variants.split(","):
        spec = spec.strip()
        r = int(spec[1])
        iters = int(spec[3])
        wmath = "exact" if spec[4] == "x" else "fast"
        value, dt = bench.bench_svgf_fwd_bwd(
            iterations=iters, weight_math=wmath, radius=r)
        print(json.dumps({
            "variant": spec, "radius": r, "iterations": iters,
            "weight_math": wmath, "mpix_s": round(value, 2),
            "ms": round(dt * 1e3, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
