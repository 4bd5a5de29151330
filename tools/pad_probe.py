#!/usr/bin/env python3
"""Quantify the per-level `_pad_rows_halo` HBM copy overhead.

Times (chain-slope) the fwd level kernel two ways at 1080p:
  a) full wrapper  — pads inside the chain body (what svgf_spatial_pallas pays)
  b) kernel-only   — inputs pre-padded outside the loop, body is pallas_call
The difference is what a canvas-chained sweep (pad once, chain padded)
would recover per level.
"""

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    H, W = 1080, 1920
    params = SVGFParams()
    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    variance = jnp.asarray((0.02 * rng.random((H, W))).astype(np.float32))
    n = rng.standard_normal((3, H, W)).astype(np.float32)
    n[2] += 3.0
    n /= np.sqrt((n ** 2).sum(0, keepdims=True))
    normal = jnp.asarray(n)
    depth = jnp.asarray((0.3 + 0.5 * rng.random((H, W))).astype(np.float32))
    zgrad = finite_diff_gradients(depth)
    sden = params.sigma_color * jnp.sqrt(
        jnp.maximum(variance_blur3x3(variance), 0.0)) + _EPS

    for lvl in (0, 2, 4):
        # (a) full wrapper
        def mk_full(nn, lvl=lvl):
            @jax.jit
            def f(c):
                def body(i, c):
                    c2, _v, _n = at.atrous_level_fwd_pallas(
                        c, variance, normal, depth, zgrad, sden,
                        level=lvl, params=params)
                    return c2
                return jnp.sum(jax.lax.fori_loop(0, nn, body, c))
            return f
        dt_full = chain_time(mk_full, color)

        # (b) kernel-only on pre-padded inputs
        dtype = jnp.float32
        Wp = at._round_up(W, 128)
        spacing = 1 << lvl
        halo_pad = at._round_up(params.radius * spacing, 8)
        TH = at._pick_tile_rows(H, Wp, halo_pad, n_haloed_planes=16,
                                n_center_planes=8, n_temp_planes=75)
        H_pad = at._round_up(H, TH)
        grid = H_pad // TH
        BLK = TH + 2 * halo_pad
        isd2 = at._LOG2E / jnp.maximum(sden, _EPS)
        kernel = at._make_level_kernel(H, W, TH, halo_pad, spacing, params,
                                       "fwd", n_hbm=4, Wp=Wp)
        pads = (
            at._pad_rows_halo(color, H_pad, halo_pad, Wp),
            at._pad_rows_halo(normal, H_pad, halo_pad, Wp),
            at._pad_rows_halo(depth, H_pad, halo_pad, Wp),
            at._pad_rows_halo(variance, H_pad, halo_pad, Wp),
            at._pad_rows(zgrad, H_pad, Wp),
            at._pad_rows(isd2, H_pad, Wp),
        )
        pads = jax.tree.map(lambda x: x.block_until_ready(), pads)

        call = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[at._hbm_spec()] * 4 + [
                at._center_spec(2, TH, Wp), at._center_spec(None, TH, Wp)],
            out_specs=(at._center_spec(3, TH, Wp),
                       at._center_spec(None, TH, Wp),
                       at._center_spec(None, TH, Wp)),
            out_shape=(jax.ShapeDtypeStruct((3, H_pad, Wp), jnp.float32),
                       jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32),
                       jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32)),
            scratch_shapes=at._scratch_tiles((3, 3, None, None), BLK, Wp,
                                             dtype)
            + [pltpu.SemaphoreType.DMA((2, 4))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 2 ** 20),
        )

        def mk_kernel(nn, pads=pads, call=call, halo_pad=halo_pad):
            cp, np_, dp, vp, zgp, isdp = pads

            @jax.jit
            def f(cp):
                def body(i, cp):
                    c2, _v, _n = call(cp, np_, dp, vp, zgp, isdp)
                    # feed back: re-halo the padded output (a cheap pad —
                    # H_pad->H_pad+2*halo rows) to keep the chain honest
                    return jnp.pad(c2, ((0, 0), (halo_pad, halo_pad), (0, 0)))
                return jnp.sum(jax.lax.fori_loop(0, nn, body, cp))
            return f
        dt_k = chain_time(mk_kernel, pads[0])
        print(f"level {lvl}: full {dt_full*1e3:7.3f} ms | kernel-only(+1 pad) "
              f"{dt_k*1e3:7.3f} ms | delta {(dt_full-dt_k)*1e3:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
