#!/usr/bin/env python3
"""Quality evaluation of the bf16 kernel mode vs the f32 oracle.

VERDICT round-1 #1 requires the bf16 staging lever to come with a quality
evaluation.  This renders a raymarched Cornell G-buffer (the denoiser's real
input distribution), runs SVGF in (a) the jnp f32 oracle, (b) Pallas f32,
(c) Pallas bf16, and reports PSNR between each pair plus gradient agreement,
as one JSON line.  Run on TPU (default) or CPU (--interpret).

Acceptance criteria recorded in ROADMAP.md: Pallas-f32 vs oracle >= 70 dB
(numerically equivalent); bf16 vs oracle >= 45 dB (visually lossless for a
denoiser stage); gradient cosine similarity >= 0.99.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/rdt_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def psnr(a, b, peak=1.0):
    import numpy as np
    mse = float(((a - b) ** 2).mean())
    return 99.0 if mse == 0 else 10.0 * np.log10(peak * peak / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret mode (no TPU)")
    args = ap.parse_args()

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from raymarchdenoisercuda_tpu.config import CameraParams, RaymarchParams, SVGFParams
    from raymarchdenoisercuda_tpu.models.svgf import demodulate
    from raymarchdenoisercuda_tpu.ops.atrous import svgf_spatial_ref
    from raymarchdenoisercuda_tpu.ops.pallas.atrous_tpu import svgf_spatial_pallas
    from raymarchdenoisercuda_tpu.ops.raymarch import (
        cornell_scene, cornell_camera, render_gbuffer)
    from raymarchdenoisercuda_tpu.ops.temporal import spatial_moments

    H = W = args.size
    cfg = CameraParams(width=W, height=H)
    g = render_gbuffer(cornell_scene(), cornell_camera(), None,
                       jax.random.PRNGKey(7), cam_cfg=cfg,
                       params=RaymarchParams())
    irr = demodulate(g.render, g.albedo)
    from raymarchdenoisercuda_tpu.gbuffer import luminance
    m1, m2 = spatial_moments(luminance(irr))
    var = jnp.maximum(m2 - m1 * m1, 0.0)
    params = SVGFParams()

    def run(fn, **kw):
        c, v = fn(irr, var, g.normal, g.depth, params=params, **kw)
        return np.asarray(c)

    oracle = run(svgf_spatial_ref, detach_weights=True)
    pf32 = run(svgf_spatial_pallas, interpret=args.interpret)
    pfast = run(svgf_spatial_pallas, interpret=args.interpret,
                weight_math="fast")
    pbf16 = run(svgf_spatial_pallas, interpret=args.interpret,
                precision="bf16")

    # gradient agreement (detached-weights adjoint), f32 vs bf16 kernels
    def loss(c, precision):
        oc, ov = svgf_spatial_pallas(c, var, g.normal, g.depth, params=params,
                                     interpret=args.interpret,
                                     precision=precision)
        return jnp.sum(oc ** 2) + jnp.sum(ov)

    g32 = np.asarray(jax.grad(lambda c: loss(c, "f32"))(irr)).ravel()
    g16 = np.asarray(jax.grad(lambda c: loss(c, "bf16"))(irr)).ravel()
    cos = float(np.dot(g32, g16)
                / max(np.linalg.norm(g32) * np.linalg.norm(g16), 1e-30))

    peak = float(np.max(oracle))
    out = {
        "size": args.size,
        "psnr_pallas_f32_vs_oracle_db": round(psnr(pf32, oracle, peak), 2),
        "psnr_fastw_vs_oracle_db": round(psnr(pfast, oracle, peak), 2),
        "psnr_bf16_vs_oracle_db": round(psnr(pbf16, oracle, peak), 2),
        "psnr_bf16_vs_pallas_f32_db": round(psnr(pbf16, pf32, peak), 2),
        "grad_cosine_bf16_vs_f32": round(cos, 6),
        "grad_relnorm_bf16_vs_f32": round(
            float(np.linalg.norm(g16 - g32) / max(np.linalg.norm(g32), 1e-30)), 6),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
