"""Pallas TPU kernel for the iterated box (average) filter.

Direct TPU counterpart of the reference's two implemented CUDA kernels:

* ``filterKernelBaseline`` (src/filter.cu:13-58) — naive global-memory taps;
* ``filterKernelTiled`` (src/filter.cu:60-158) — shared-memory tile + halo.

On TPU there is no "naive" variant worth writing: data always moves
HBM -> VMEM explicitly, so a single kernel plays the tiled role (async DMA of
a halo-extended row band = ``cacheTile``).  The reference's never-consumed
``cacheBuffer`` flag (filter.cuh:22) — "keep the ping-pong levels in shared
memory" — *is* realized here: all ``depth`` levels run inside one kernel
invocation on the VMEM-resident band, with the halo widened to
``radius * depth`` so deeper levels stay valid (the notebook's halo-growth
model, tile.ipynb cells 197-200, with spacing 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .atrous_tpu import (
    _round_up, _rows, _col_roll, _center_spec, _hbm_spec, _pad_rows_halo,
    _pick_tile_rows,
)


@functools.partial(jax.jit, static_argnames=("radius", "depth", "interpret"))
def box_filter_pallas(
    x: jax.Array, radius: int = 2, depth: int = 1, interpret: bool = False
) -> jax.Array:
    """Iterated (2r+1)^2 uniform average on planar (C, H, W) float32.

    Matches ``ops.boxfilter.box_filter`` (border taps dropped, renormalized).
    All ``depth`` levels execute on the VMEM band in one kernel pass.
    """
    C_, H, W = x.shape
    Wp = _round_up(W, 128)  # DMA minor-dim lane alignment
    halo = radius * depth  # total halo consumed by `depth` in-band levels
    halo_pad = _round_up(halo, 8)
    n_taps = (2 * radius + 1) ** 2
    TH = _pick_tile_rows(H, Wp, halo_pad, n_haloed_planes=C_ * 2,
                         n_center_planes=C_, n_temp_planes=2 * n_taps)
    H_pad = _round_up(H, TH)
    grid = H_pad // TH
    BLK = TH + 2 * halo_pad

    def kernel(in_hbm, out_ref, tile, sem):
        b = pl.program_id(0)
        row0 = pl.multiple_of(b * TH, 8)
        cp = pltpu.make_async_copy(in_hbm.at[:, pl.ds(row0, BLK), :], tile, sem)
        cp.start()
        cp.wait()

        # global coords of the *band* rows (including halo rows)
        gy = (b * TH - halo_pad
              + jax.lax.broadcasted_iota(jnp.int32, (BLK, Wp), 0))
        gx = jax.lax.broadcasted_iota(jnp.int32, (BLK, Wp), 1)
        cur = tile[:]

        for _level in range(depth):
            acc = jnp.zeros((C_, BLK, Wp), jnp.float32)
            cnt = jnp.zeros((BLK, Wp), jnp.float32)
            for dy in range(-radius, radius + 1):
                for dx in range(-radius, radius + 1):
                    # vertical shift wraps within the band; wrapped rows and
                    # out-of-image taps are masked off
                    t = pltpu.roll(cur, -dy % BLK, axis=1) if dy else cur
                    t = _col_roll(t, dx)
                    m = ((gy + dy >= 0) & (gy + dy < H)
                         & (gx + dx >= 0) & (gx + dx < W)
                         & (gy + dy >= b * TH - halo_pad)
                         & (gy + dy < b * TH - halo_pad + BLK))
                    acc = acc + jnp.where(m[None], t, 0.0)
                    cnt = cnt + m.astype(jnp.float32)
            cur = acc / jnp.maximum(cnt, 1.0)

        out_ref[:] = _rows(cur, halo_pad, TH)

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[_hbm_spec()],
        out_specs=_center_spec(C_, TH, Wp),
        out_shape=jax.ShapeDtypeStruct((C_, H_pad, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C_, BLK, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(_pad_rows_halo(x.astype(jnp.float32), H_pad, halo_pad, Wp))
    return out[:, :H, :W]
