"""Single-chip sharded-overhead probe: svgf_spatial_sharded on a 1x1 mesh
(canvas-chained vs per-level tile kernels) against the unsharded canvas
chain, chain-slope timed IN ONE PROCESS (the chip behind the tunnel is
time-sliced; cross-process numbers are not comparable).

Round-3 context: the per-level tile path measured 8.06 ms fwd vs 5.13 ms
unsharded at 1080p (+57%, ROADMAP) — the canvas-chained tile sweep is the
documented fix (guidance canvases exchanged once, h-wide margin refreshes
between levels, no per-level pad/crop).

Usage: python tools/sharded_probe.py [--size 1080p|512] [--grad]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _chain_time
from raymarchdenoisercuda_tpu.config import SVGFParams
from raymarchdenoisercuda_tpu.ops.pallas.atrous_tpu import svgf_spatial_pallas
from raymarchdenoisercuda_tpu.parallel.sharded import svgf_spatial_sharded


def _scene(rng, H, W):
    color = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    variance = jnp.asarray((0.02 * rng.random((H, W))).astype(np.float32))
    n = rng.standard_normal((3, H, W)).astype(np.float32)
    n[2] += 3.0
    n /= np.sqrt((n ** 2).sum(0, keepdims=True))
    depth = jnp.asarray((0.3 + 0.5 * rng.random((H, W))).astype(np.float32))
    return color, variance, jnp.asarray(n), depth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1080p")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    H, W = (1080, 1920) if args.size == "1080p" else (512, 512)
    params = SVGFParams(iterations=args.iters)
    rng = np.random.default_rng(0)
    color, variance, normal, depth = _scene(rng, H, W)

    from jax.sharding import Mesh
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1),
                ("data", "y", "x"))

    def make_unsharded(n):
        @jax.jit
        def run(c):
            def body(_, carry):
                cc, acc = carry
                oc, ov = svgf_spatial_pallas(cc, variance, normal, depth,
                                             params=params)
                return oc, acc + jnp.sum(oc) + jnp.sum(ov)
            _, acc = jax.lax.fori_loop(0, n, body, (c, jnp.float32(0)))
            return acc
        return run

    def make_sharded(impl):
        def mk(n):
            @jax.jit
            def run(c):
                def body(_, carry):
                    cc, acc = carry
                    oc, ov = svgf_spatial_sharded(
                        cc, variance, normal, depth, mesh=mesh,
                        params=params, impl=impl)
                    return oc, acc + jnp.sum(oc) + jnp.sum(ov)
                _, acc = jax.lax.fori_loop(0, n, body, (c, jnp.float32(0)))
                return acc
            return run
        return mk

    mpix = H * W / 1e6
    results = {}
    for name, mk in [("unsharded", make_unsharded),
                     ("sharded_chained", make_sharded("pallas")),
                     ("sharded_levels", make_sharded("pallas_levels"))]:
        dt = _chain_time(mk, color, n_lo=2, n_hi=10)
        results[name] = dt
        print(f"{name:18s} {dt * 1e3:7.2f} ms  {mpix / dt:8.1f} Mpix/s",
              flush=True)
    ovh_chained = results["sharded_chained"] / results["unsharded"] - 1
    ovh_levels = results["sharded_levels"] / results["unsharded"] - 1
    print(f"overhead: chained {ovh_chained * 100:+.1f}%  "
          f"per-level {ovh_levels * 100:+.1f}%")


if __name__ == "__main__":
    main()
