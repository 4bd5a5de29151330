"""Pallas TPU kernels for the GAUSSIAN and CROSS filter types.

Completes the kernel coverage of the reference's ``FilterType`` enum
(``include/filter.cuh:12``): AVERAGE and WAVELET already have band kernels
(``box_tpu.py``, ``atrous_tpu.py``); this adds

* :func:`gaussian_filter_pallas` — separable spatial gaussian, one band
  kernel doing the row pass and the column pass in VMEM (the jnp version
  round-trips HBM between passes);
* :func:`cross_bilateral_pallas` — the cross-bilateral filter guided by
  albedo/normal/depth, sharing the à-trous kernels' staging pattern
  (async double-buffered HBM→VMEM row bands, lane-roll taps, Newton-refined
  reciprocals, base-2 fast exp).

Both match their jnp oracles in ``ops/filters.py`` (tests/test_filters.py
interpret parity; tests/test_tpu_hw.py compiled).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import FilterParams
from .atrous_tpu import (_EPS, _LN2, _col_roll, _exp2_fast, _pad_rows_halo,
                         _recip, _rows, _round_up)


def _gauss_taps(radius: int, sigma: float):
    t = [math.exp(-0.5 * (i / max(sigma, 1e-6)) ** 2)
         for i in range(-radius, radius + 1)]
    s = sum(t)
    return tuple(v / s for v in t)


def _make_gaussian_kernel(H, W, TH, halo, r, taps, Wp, depth_iters):
    """Separable gaussian: rows then cols per iteration, all in VMEM.

    Border renormalization: the numerator uses zero-filled out-of-image
    taps, and the denominators are the 1-D tap-weight sums — which factor
    per axis exactly as in the jnp oracle."""
    C = halo
    BLK = TH + 2 * halo

    def kernel(x_hbm, out_ref, x_s, sems):
        b = pl.program_id(0)
        nb = pl.num_programs(0)

        def copy(slot, band):
            row0 = pl.multiple_of(band * TH, 8)
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(row0, BLK), :], x_s.at[slot],
                sems.at[slot])

        slot = jax.lax.rem(b, 2)
        nslot = jax.lax.rem(b + 1, 2)

        @pl.when(b == 0)
        def _():
            copy(0, 0).start()

        @pl.when(b + 1 < nb)
        def _():
            copy(nslot, b + 1).start()

        copy(slot, b).wait()

        x = x_s[slot]  # (3, BLK, Wp) — iterations > 1 fall back to the
        # wrapper loop (each needs fresh halo), so depth_iters == 1 here
        gy = b * TH + jax.lax.broadcasted_iota(jnp.int32, (TH, Wp), 0)
        gx = jax.lax.broadcasted_iota(jnp.int32, (TH, Wp), 1)

        # rows pass over the full width (halo cols handled by col pass)
        num_r = jnp.zeros((3, TH, Wp), jnp.float32)
        den_r = jnp.zeros((TH, Wp), jnp.float32)
        for d in range(-r, r + 1):
            t = taps[d + r]
            m = ((gy + d >= 0) & (gy + d < H)).astype(jnp.float32)
            num_r = num_r + t * m[None] * _rows(x, C + d, TH)
            den_r = den_r + t * m
        rowv = num_r * _recip(den_r)[None]

        num_c = jnp.zeros((3, TH, Wp), jnp.float32)
        den_c = jnp.zeros((TH, Wp), jnp.float32)
        for d in range(-r, r + 1):
            t = taps[d + r]
            m = ((gx + d >= 0) & (gx + d < W)).astype(jnp.float32)
            num_c = num_c + t * m[None] * _col_roll(rowv, d)
            den_c = den_c + t * m
        out_ref[:] = num_c * _recip(den_c)[None]

    return kernel


@functools.partial(jax.jit, static_argnames=("radius", "sigma", "depth",
                                              "interpret"))
def gaussian_filter_pallas(x, radius: int = 2, sigma: float = 2.0,
                           depth: int = 1, interpret: bool = False):
    """Separable border-renormalized gaussian on (3, H, W); iterated
    ``depth`` times (drop-in for ``ops.filters.gaussian_filter``)."""
    H, W = x.shape[-2:]
    Wp = _round_up(W, 128)
    halo = _round_up(radius, 8)
    TH = min(256, _round_up(H, 8))
    H_pad = _round_up(H, TH)
    grid = H_pad // TH
    taps = _gauss_taps(radius, sigma)
    kernel = _make_gaussian_kernel(H, W, TH, halo, radius, taps, Wp, 1)

    out = x
    for _ in range(depth):
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((3, TH, Wp), lambda b: (0, b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, H_pad, Wp), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, 3, TH + 2 * halo, Wp), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 2 ** 20),
            interpret=interpret,
        )(_pad_rows_halo(out, H_pad, halo, Wp))[:, :H, :W]
    return out


def _make_cross_kernel(H, W, TH, halo, params: FilterParams, Wp):
    r = params.radius
    gt = _gauss_taps(r, params.sigma_space)
    C = halo
    BLK = TH + 2 * halo
    # log2e-scaled weight constants (base-2 exp)
    inv_2sa2 = 1.0 / (2.0 * params.sigma_albedo ** 2 + _EPS) / _LN2
    inv_sz = 1.0 / (params.sigma_depth + _EPS) / _LN2

    def kernel(c_hbm, a_hbm, n_hbm, z_hbm, out_ref,
               c_s, a_s, n_s, z_s, sems):
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        hbm = (c_hbm, a_hbm, n_hbm, z_hbm)
        scratch = (c_s, a_s, n_s, z_s)

        def make_copies(slot, band):
            row0 = pl.multiple_of(band * TH, 8)
            cps = []
            for i, (src, dst) in enumerate(zip(hbm, scratch)):
                if src.ndim == 3:
                    cps.append(pltpu.make_async_copy(
                        src.at[:, pl.ds(row0, BLK), :], dst.at[slot],
                        sems.at[slot, i]))
                else:
                    cps.append(pltpu.make_async_copy(
                        src.at[pl.ds(row0, BLK), :], dst.at[slot],
                        sems.at[slot, i]))
            return cps

        slot = jax.lax.rem(b, 2)
        nslot = jax.lax.rem(b + 1, 2)

        @pl.when(b == 0)
        def _():
            for cp in make_copies(0, 0):
                cp.start()

        @pl.when(b + 1 < nb)
        def _():
            for cp in make_copies(nslot, b + 1):
                cp.start()

        for cp in make_copies(slot, b):
            cp.wait()

        c_t, a_t, n_t, z_t = (s[slot] for s in scratch)
        a_c = _rows(a_t, C, TH)
        n_c = _rows(n_t, C, TH)
        z_c = _rows(z_t, C, TH)

        gy = b * TH + jax.lax.broadcasted_iota(jnp.int32, (TH, Wp), 0)
        gx = jax.lax.broadcasted_iota(jnp.int32, (TH, Wp), 1)
        row_m = {dy: ((gy + dy >= 0) & (gy + dy < H)).astype(jnp.float32)
                 for dy in range(-r, r + 1)}
        col_m = {dx: ((gx + dx >= 0) & (gx + dx < W)).astype(jnp.float32)
                 for dx in range(-r, r + 1)}

        num = jnp.zeros((3, TH, Wp), jnp.float32)
        den = jnp.zeros((TH, Wp), jnp.float32)

        def pow_sigma_n(x):
            p = params.sigma_normal
            ip = int(p)
            if ip == p and ip > 0 and (ip & (ip - 1)) == 0 and ip <= 1024:
                y = x
                while ip > 1:
                    y = y * y
                    ip >>= 1
                return y
            return jnp.power(jnp.maximum(x, 1e-20), p)

        # dx-major: one column roll per plane per dx, and only the current
        # dx's rolled stacks are live (a dy-major cache of all (plane, dx)
        # rolls is ~100 MB of concurrent VMEM temporaries at 1080p — it OOMs
        # Mosaic's scratch allocator)
        for dx in range(-r, r + 1):
            c_r = _col_roll(c_t, dx)
            a_r = _col_roll(a_t, dx)
            n_r = _col_roll(n_t, dx)
            z_r = _col_roll(z_t, dx)
            for dy in range(-r, r + 1):
                g = gt[dy + r] * gt[dx + r]
                fm = row_m[dy] * col_m[dx]
                a_q = _rows(a_r, C + dy, TH)
                n_q = _rows(n_r, C + dy, TH)
                z_q = _rows(z_r, C + dy, TH)
                c_q = _rows(c_r, C + dy, TH)

                d0 = a_c[0] - a_q[0]
                d1 = a_c[1] - a_q[1]
                d2 = a_c[2] - a_q[2]
                da2 = d0 * d0 + d1 * d1 + d2 * d2
                ndot = jnp.maximum(n_c[0] * n_q[0] + n_c[1] * n_q[1]
                                   + n_c[2] * n_q[2], 0.0)
                arg = -(da2 * inv_2sa2 + jnp.abs(z_c - z_q) * inv_sz)
                w = (g * fm) * _exp2_fast(arg) * pow_sigma_n(ndot)
                num = num + w[None] * c_q
                den = den + w

        out_ref[:] = num * _recip(jnp.maximum(den, _EPS))[None]

    return kernel


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def cross_bilateral_pallas(color, albedo, normal, depth,
                           *, params: FilterParams, interpret: bool = False):
    """Cross-bilateral filter band kernel (drop-in for
    ``ops.filters.cross_bilateral_filter``)."""
    H, W = depth.shape
    Wp = _round_up(W, 128)
    halo = _round_up(params.radius, 8)
    # 10 haloed planes x 2 DMA slots + 4 rolled stacks + in/out blocks:
    # TH=128 keeps the worst case (~60 MB at 1920 lanes) inside VMEM
    TH = min(128, _round_up(H, 8))
    H_pad = _round_up(H, TH)
    grid = H_pad // TH
    BLK = TH + 2 * halo

    kernel = _make_cross_kernel(H, W, TH, halo, params, Wp)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 4,
        out_specs=pl.BlockSpec((3, TH, Wp), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, H_pad, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 3, BLK, Wp), jnp.float32),
            pltpu.VMEM((2, 3, BLK, Wp), jnp.float32),
            pltpu.VMEM((2, 3, BLK, Wp), jnp.float32),
            pltpu.VMEM((2, BLK, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(
        _pad_rows_halo(color, H_pad, halo, Wp),
        _pad_rows_halo(albedo, H_pad, halo, Wp),
        _pad_rows_halo(normal, H_pad, halo, Wp),
        _pad_rows_halo(depth, H_pad, halo, Wp),
    )
    return out[:, :H, :W]
