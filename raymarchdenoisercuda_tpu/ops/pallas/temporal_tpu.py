"""Pallas TPU kernel for SVGF temporal reprojection + accumulation.

Realizes the reference's declared temporal pipeline ("Temporal accumulation
to reduce flickering", reference README.md:8; the stream hook at
gbuffer.h:32) as one fused band kernel, replacing four XLA passes
(bounded-motion reprojection, history clamp, moment accumulation, spatial
variance fallback) from ``ops/temporal.py``.

The XLA reprojection is motion-oblivious: it evaluates all
``(2M+2)²`` = 196 statically-shifted tent taps even though each pixel's
bilinear sample touches only the 2×2 integer offsets bracketing its motion
vector.  This kernel computes, per row band, the *actual* integer offset
ranges ``[floor(min m), ceil(max m)]`` present in the band (camera motion
is smooth, so bands typically span 1-4 offsets per axis; a static camera
needs exactly one) and loops only over those with ``tpu.dynamic_rotate``
shifts — identical tent math, so results match ``temporal_accumulate``
exactly; only the wasted zero-weight taps are skipped.  Worst-case (motion
spanning the full ±M range within one band) it degrades gracefully to the
oracle's tap count.

History planes are staged HBM→VMEM with a ``max_motion+1`` halo per band
(double-buffered async DMA, like the à-trous kernels); the history clamp
(separable 3×3 min/max) and the spatial-moment fallback (separable 7×7
window) read the current render through an 8-row halo.

Differentiability: this is the inference-path kernel; the differentiable
path stays ``ops/temporal.py`` (pure jnp).  The models select per
``impl=`` exactly as for the spatial kernels.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import SVGFParams
from ...gbuffer import GBuffer, History

_LUMA = (0.2126, 0.7152, 0.0722)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _rows(x, o, size):
    idx = [slice(None)] * x.ndim
    idx[-2] = slice(o, o + size)
    return x[tuple(idx)]


def _make_kernel(H, W, TH, Wp, CH, CR, params: SVGFParams,
                 with_origin: bool = False):
    """CH: staged halo rows of the history stack; CR: of the render.

    ``with_origin``: sharded-tile mode — an SMEM (2,) int32 ref carries the
    tile's global (row0, col0) and all border/validity masks test GLOBAL
    image coordinates against ``(H, W)`` = the global bounds (the tile's
    exchanged halo ring is in-image neighbor data)."""
    M = params.max_motion
    BLKH = TH + 2 * CH
    BLKR = TH + 2 * CR

    def kernel(*refs):
        if with_origin:
            org_ref = refs[0]
            refs = refs[1:]
        (hist_hbm, rend_hbm, motion_ref, depth_ref, normal_ref,
         integ_ref, var_ref, mom_ref, len_ref,
         hist_s, rend_s, sems) = refs
        b = pl.program_id(0)
        nb = pl.num_programs(0)

        def make_copies(slot, band):
            row0 = pl.multiple_of(band * TH, 8)
            return [
                pltpu.make_async_copy(hist_hbm.at[:, pl.ds(row0, BLKH), :],
                                      hist_s.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(rend_hbm.at[:, pl.ds(row0, BLKR), :],
                                      rend_s.at[slot], sems.at[slot, 1]),
            ]

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

        hist_t = hist_s[slot]   # (10, BLKH, Wp)
        rend_t = rend_s[slot]   # (3, BLKR, Wp)
        motion = motion_ref[:]  # (2, TH, Wp)
        depth = depth_ref[:]
        normal = normal_ref[:]

        gy = b * TH + jax.lax.broadcasted_iota(jnp.int32, (TH, Wp), 0)
        gx = jax.lax.broadcasted_iota(jnp.int32, (TH, Wp), 1)
        if with_origin:
            gy = gy + org_ref[0]
            gx = gx + org_ref[1]
        gyf = gy.astype(jnp.float32)
        gxf = gx.astype(jnp.float32)

        m0, m1 = motion[0], motion[1]
        in_bounds = ((gyf + m0 >= 0) & (gyf + m0 <= H - 1)
                     & (gxf + m1 >= 0) & (gxf + m1 <= W - 1)
                     & (jnp.abs(m0) <= M) & (jnp.abs(m1) <= M))

        # per-band integer offset ranges actually bracketed by the motion
        m0c = jnp.clip(m0, -float(M), float(M))
        m1c = jnp.clip(m1, -float(M), float(M))
        dylo = jnp.floor(jnp.min(m0c)).astype(jnp.int32)
        # upper bounds use ceil, not floor+1 (round 5): when the band's max
        # motion is INTEGER the floor+1 offset's tent weight is identically
        # zero for every pixel — a wasted full-band roll + FMA round.  ceil
        # is tight and exact for value-only kernels (static camera: 4 taps
        # -> 1); the full adjoint keeps floor+1 because the tent DERIVATIVE
        # is +-0.5 at the |x|=1 ties (JAX kink convention, _tent_prime).
        dyhi = jnp.ceil(jnp.max(m0c)).astype(jnp.int32)
        dxlo = jnp.floor(jnp.min(m1c)).astype(jnp.int32)
        dxhi = jnp.ceil(jnp.max(m1c)).astype(jnp.int32)

        def dy_body(carry):
            dy, acc = carry
            ty = jnp.maximum(0.0, 1.0 - jnp.abs(m0 - dy.astype(jnp.float32)))
            # history rows y+dy -> rotate band so center rows align
            band_y = pltpu.roll(hist_t, jnp.mod(-dy, BLKH), axis=1)
            ctr = _rows(band_y, CH, TH)        # (10, TH, Wp)

            def dx_body(carry2):
                dx, acc2 = carry2
                tx = jnp.maximum(
                    0.0, 1.0 - jnp.abs(m1 - dx.astype(jnp.float32)))
                shifted = pltpu.roll(ctr, jnp.mod(-dx, ctr.shape[-1]),
                                     axis=2)
                acc2 = acc2 + (ty * tx)[None] * shifted
                return dx + 1, acc2

            _, acc = jax.lax.while_loop(
                lambda c2: c2[0] <= dxhi, dx_body, (dxlo, acc))
            return dy + 1, acc

        acc0 = jnp.zeros((10, TH, Wp), jnp.float32)
        _, gathered = jax.lax.while_loop(
            lambda c: c[0] <= dyhi, dy_body, (dylo, acc0))

        prev_color = gathered[0:3]
        prev_moments = gathered[3:5]
        prev_len = gathered[5]
        prev_depth = gathered[6]
        prev_normal = gathered[7:10]

        depth_ok = jnp.abs(prev_depth - depth) <= 0.1 * jnp.maximum(
            jnp.abs(depth), 1e-3)
        ndot = (prev_normal[0] * normal[0] + prev_normal[1] * normal[1]
                + prev_normal[2] * normal[2])
        valid = in_bounds & depth_ok & (ndot > 0.8) & (prev_len > 0)

        color = _rows(rend_t, CR, TH)          # (3, TH, Wp) current frame

        if params.history_clamp:
            # separable 3x3 min/max with global-border drop via +-inf
            rmin = jnp.full((3, TH, Wp), jnp.inf)
            rmax = jnp.full((3, TH, Wp), -jnp.inf)
            for dy in (-1, 0, 1):
                mrow = ((gy + dy >= 0) & (gy + dy < H))[None]
                s = _rows(rend_t, CR + dy, TH)
                rmin = jnp.minimum(rmin, jnp.where(mrow, s, jnp.inf))
                rmax = jnp.maximum(rmax, jnp.where(mrow, s, -jnp.inf))
            cmin = jnp.full((3, TH, Wp), jnp.inf)
            cmax = jnp.full((3, TH, Wp), -jnp.inf)
            for dx in (-1, 0, 1):
                mcol = ((gx + dx >= 0) & (gx + dx < W))[None]
                rl = pltpu.roll(rmin, (-dx) % Wp, axis=2)
                rh = pltpu.roll(rmax, (-dx) % Wp, axis=2)
                cmin = jnp.minimum(cmin, jnp.where(mcol, rl, jnp.inf))
                cmax = jnp.maximum(cmax, jnp.where(mcol, rh, -jnp.inf))
            prev_color = jnp.clip(prev_color, cmin, cmax)

        n_prev = jnp.where(valid, prev_len, 0.0)
        n_new = n_prev + 1.0
        alpha = jnp.maximum(params.temporal_alpha, 1.0 / n_new)
        alpha_m = jnp.maximum(params.temporal_moments_alpha, 1.0 / n_new)

        integrated = jnp.where(
            valid[None], (1 - alpha)[None] * prev_color + alpha[None] * color,
            color)

        lum = (_LUMA[0] * color[0] + _LUMA[1] * color[1]
               + _LUMA[2] * color[2])
        cur_m1, cur_m2 = lum, lum * lum
        moments = jnp.stack([
            jnp.where(valid, (1 - alpha_m) * prev_moments[0]
                      + alpha_m * cur_m1, cur_m1),
            jnp.where(valid, (1 - alpha_m) * prev_moments[1]
                      + alpha_m * cur_m2, cur_m2),
        ])

        var_temporal = jnp.maximum(moments[1] - moments[0] ** 2, 0.0)
        if params.variance_boost_frames > 0:
            # spatial moment fallback: separable 7x7 window of the band's
            # lum (skipped at trace time when boost_frames == 0 — the
            # fallback could never be selected, n_new >= 1)
            r3 = 3
            lum_band = (_LUMA[0] * rend_t[0] + _LUMA[1] * rend_t[1]
                        + _LUMA[2] * rend_t[2])  # (BLKR, Wp); 0 off-image
            lum2_band = lum_band * lum_band

            def winsum(xb):
                rows = _rows(xb, CR - r3, TH)
                for d in range(-r3 + 1, r3 + 1):
                    rows = rows + _rows(xb, CR + d, TH)
                out = rows
                for d in range(-r3, r3 + 1):
                    if d == 0:
                        continue
                    out = out + pltpu.roll(rows, (-d) % Wp, axis=1)
                return out

            cy = (jnp.minimum(gyf, float(r3))
                  + jnp.minimum(H - 1 - gyf, float(r3)) + 1.0)
            cxn = (jnp.minimum(gxf, float(r3))
                   + jnp.minimum(W - 1 - gxf, float(r3)) + 1.0)
            inv_cnt = 1.0 / (cy * cxn)
            sm1 = winsum(lum_band) * inv_cnt
            sm2 = winsum(lum2_band) * inv_cnt
            var_spatial = jnp.maximum(sm2 - sm1 * sm1, 0.0)
            variance = jnp.where(n_new < params.variance_boost_frames,
                                 var_spatial, var_temporal)
        else:
            variance = var_temporal

        integ_ref[:] = integrated
        var_ref[:] = variance
        mom_ref[:] = moments
        # zero the history length outside the global image: out-of-image
        # pixels would otherwise write n_new = 1.0, which leaks into canvas
        # margins when a single-shard mesh axis skips the margin refresh
        # (round-5 sharded-glue fix) — every other plane is already zero
        # there (valid=false -> integrated = color = 0, moments of lum 0)
        len_ref[:] = jnp.where((gy < H) & (gx < W), n_new, 0.0)

    return kernel


def _pad_rows_halo(x, H_pad, halo, Wp):
    H, W = x.shape[-2:]
    pad = [(0, 0)] * (x.ndim - 2) + [(halo, H_pad - H + halo), (0, Wp - W)]
    return jnp.pad(x, pad)


def _pad2(x, H_pad, Wp):
    H, W = x.shape[-2:]
    pad = [(0, 0)] * (x.ndim - 2) + [(0, H_pad - H), (0, Wp - W)]
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("params", "interpret", "bounds"))
def temporal_accumulate_pallas(
    gbuf: GBuffer,
    history: History,
    *,
    params: SVGFParams = SVGFParams(),
    interpret: bool = False,
    origin=None, bounds=None,
) -> Tuple[jax.Array, jax.Array, History]:
    """Fused temporal step on TPU; drop-in for
    ``ops.temporal.temporal_accumulate`` (requires bounded motion).

    ``origin``/``bounds``: sharded-tile mode (see
    :func:`temporal_accumulate_tile`) — border masks test global
    coordinates; the planes passed in are tile-with-halo images."""
    if params.max_motion is None:
        raise ValueError("temporal_accumulate_pallas requires "
                         "SVGFParams.max_motion (bounded reprojection)")
    H, W = gbuf.shape
    Wp = _round_up(W, 128)
    if Wp - W < params.max_motion + 2:
        Wp += 128  # lane pad doubles as the zero-fill region for column taps
    CH = _round_up(params.max_motion + 1, 8)
    CR = 8
    # Budget TH so the double-buffered 10-plane haloed history stack, the
    # (10, TH, Wp) gather accumulator + its rotate temporaries, and the
    # in/out blocks stay inside the 120 MB VMEM window (the un-budgeted
    # TH=128 overflowed by ~3 MB at Wp=2048: ~65 haloed + ~30 center
    # plane-rows live per band row, measured from the Mosaic OOM report)
    TH = 8
    for cand in (128, 96, 64, 48, 32, 16):
        est = 4 * Wp * ((cand + 2 * CH) * 65 + cand * 30)
        if est < 100 * 2 ** 20:
            TH = cand
            break
    TH = min(TH, _round_up(H, 8))
    H_pad = _round_up(H, TH)
    grid = H_pad // TH
    color = gbuf.render
    motion = (gbuf.motion if gbuf.motion is not None
              else jnp.zeros((2, H, W), color.dtype))

    hist_stack = jnp.concatenate([
        history.color, history.moments, history.length[None],
        history.prev_depth[None], history.prev_normal,
    ])  # (10, H, W)

    with_origin = origin is not None
    Hm, Wm = bounds if with_origin else (H, W)
    kernel = _make_kernel(Hm, Wm, TH, Wp, CH, CR, params,
                          with_origin=with_origin)
    org_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] if with_origin
                 else [])
    org_args = ((jnp.stack([origin[0], origin[1]]).astype(jnp.int32),)
                if with_origin else ())

    def cspec(n):
        if n is None:
            return pl.BlockSpec((TH, Wp), lambda b: (b, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((n, TH, Wp), lambda b: (0, b, 0),
                            memory_space=pltpu.VMEM)

    integ, var, mom, length = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=org_specs
        + [pl.BlockSpec(memory_space=pltpu.HBM),
           pl.BlockSpec(memory_space=pltpu.HBM),
           cspec(2), cspec(None), cspec(3)],
        out_specs=(cspec(3), cspec(None), cspec(2), cspec(None)),
        out_shape=(
            jax.ShapeDtypeStruct((3, H_pad, Wp), jnp.float32),
            jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32),
            jax.ShapeDtypeStruct((2, H_pad, Wp), jnp.float32),
            jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 10, TH + 2 * CH, Wp), jnp.float32),
            pltpu.VMEM((2, 3, TH + 2 * CR, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(
        *org_args,
        _pad_rows_halo(hist_stack, H_pad, CH, Wp),
        _pad_rows_halo(color, H_pad, CR, Wp),
        _pad2(motion, H_pad, Wp),
        _pad2(gbuf.depth, H_pad, Wp),
        _pad2(gbuf.normal, H_pad, Wp),
    )

    integ = integ[:, :H, :W]
    new_history = History(
        color=integ,
        moments=mom[:, :H, :W],
        length=length[:H, :W],
        prev_depth=gbuf.depth,
        prev_normal=gbuf.normal,
    )
    return integ, var[:H, :W], new_history


def temporal_accumulate_tile(
    gbuf_p: GBuffer, history_p: History, origin, bounds,
    *, params: SVGFParams, interpret: bool = False,
):
    """Fused temporal step on a halo-exchanged device tile (call inside
    shard_map) — the band kernel replacing ``temporal_accumulate_local``'s
    jnp gather math, mirroring :func:`atrous_tpu.atrous_level_tile`.

    All planes of ``gbuf_p``/``history_p`` are tiles padded by
    ``hh = max_motion + 1`` on both spatial axes (``exchange_halo2d``; hh
    covers the bounded reprojection's bilinear ceil tap, the 3x3 history
    clamp and the 7x7 spatial-moment window).  ``origin`` is the *center*
    tile's global (row0, col0); ``bounds`` the global image shape.  The
    tile-with-halo runs as a small image whose masks test global
    coordinates; the hh ring is cropped from the outputs.

    Inference-only (no VJP), like ``temporal_accumulate_pallas``; training
    paths use the jnp tile math.  Returns (integrated, variance, History)
    with CENTER-tile shapes; the returned history's prev planes are the
    center crop of ``gbuf_p``'s depth/normal.
    """
    hh = params.max_motion + 1
    ry, cx = origin
    org = (ry - hh, cx - hh)
    integ_p, var_p, hist_out = temporal_accumulate_pallas(
        gbuf_p, history_p, params=params, interpret=interpret,
        origin=org, bounds=bounds)

    def crop(x):
        return x[..., hh:x.shape[-2] - hh, hh:x.shape[-1] - hh]

    new_history = History(
        color=crop(hist_out.color),
        moments=crop(hist_out.moments),
        length=crop(hist_out.length),
        prev_depth=crop(gbuf_p.depth),
        prev_normal=crop(gbuf_p.normal),
    )
    return crop(integ_p), crop(var_p), new_history


# ---------------------------------------------------------------------------
# Differentiable reprojection: tent-tap gather with a hand-written adjoint
# (round-2 verdict item: the last jnp-only stage on the training path).
# The temporal step factors as  gather -> elementwise epilogue ; the gather
# is the heavy bounded-motion tent stencil (kernels below, both directions),
# the epilogue is shared VERBATIM with the jnp oracle
# (ops.temporal._temporal_epilogue), so XLA autodiffs it identically.
# ---------------------------------------------------------------------------

def _tent_prime(x):
    """d/dx max(0, 1-|x|) matching JAX autodiff exactly: -sign with
    sign(0)=+1 inside the support, half-weight at the |x|=1 ties."""
    a = jnp.abs(x)
    sgn = jnp.where(x >= 0, 1.0, -1.0)
    w = jnp.where(a < 1.0, 1.0, jnp.where(a == 1.0, 0.5, 0.0))
    return -sgn * w


def _gather_geometry(H, W, params):
    M = params.max_motion
    Wp = _round_up(W, 128)
    if Wp - W < M + 2:
        Wp += 128  # lane pad doubles as the zero-fill region for column taps
    CH = _round_up(M + 1, 8)
    TH = min(64, _round_up(H, 8))
    H_pad = _round_up(H, TH)
    return M, Wp, CH, TH, H_pad


def _make_gather_kernel(TH, Wp, CH, BLKH, M):
    """Forward tent gather: dynamic while-loops over BOTH bracketed offset
    ranges.  Round-5 measured a static-row-offset variant (free static row
    slices + pl.when guards, like the adjoint kernels below) IN-PROCESS
    against this one: random ±3 motion 7.80 -> 7.63 ms (−2%, the forward is
    tap-FMA-bound) but coherent pan 3.01 -> 3.83 ms (+27% — the unrolled
    guards/RMW tax the production case), so the dynamic structure stays.
    The adjoints DID win from the restructure — see
    ``_make_gather_bwd_hist_kernel``."""
    def kernel(hist_hbm, motion_ref, out_ref, hist_s, sems):
        b = pl.program_id(0)
        nb = pl.num_programs(0)

        def make_copy(slot, band):
            row0 = pl.multiple_of(band * TH, 8)
            return pltpu.make_async_copy(
                hist_hbm.at[:, pl.ds(row0, BLKH), :], hist_s.at[slot],
                sems.at[slot])

        slot = jax.lax.rem(b, 2)
        nslot = jax.lax.rem(b + 1, 2)

        @pl.when(b == 0)
        def _():
            make_copy(0, 0).start()

        @pl.when(b + 1 < nb)
        def _():
            make_copy(nslot, b + 1).start()

        make_copy(slot, b).wait()
        hist_t = hist_s[slot]          # (10, BLKH, Wp)
        m0, m1 = motion_ref[0], motion_ref[1]

        m0c = jnp.clip(m0, -float(M), float(M))
        m1c = jnp.clip(m1, -float(M), float(M))
        dylo = jnp.floor(jnp.min(m0c)).astype(jnp.int32)
        # upper bounds use ceil, not floor+1 (round 5): when the band's max
        # motion is INTEGER the floor+1 offset's tent weight is identically
        # zero for every pixel — a wasted full-band roll + FMA round.  ceil
        # is tight and exact for value-only kernels (static camera: 4 taps
        # -> 1); the full adjoint keeps floor+1 because the tent DERIVATIVE
        # is +-0.5 at the |x|=1 ties (JAX kink convention, _tent_prime).
        dyhi = jnp.ceil(jnp.max(m0c)).astype(jnp.int32)
        dxlo = jnp.floor(jnp.min(m1c)).astype(jnp.int32)
        dxhi = jnp.ceil(jnp.max(m1c)).astype(jnp.int32)

        def dy_body(carry):
            dy, acc = carry
            ty = jnp.maximum(0.0, 1.0 - jnp.abs(m0 - dy.astype(jnp.float32)))
            band_y = pltpu.roll(hist_t, jnp.mod(-dy, BLKH), axis=1)
            ctr = _rows(band_y, CH, TH)

            def dx_body(carry2):
                dx, acc2 = carry2
                tx = jnp.maximum(
                    0.0, 1.0 - jnp.abs(m1 - dx.astype(jnp.float32)))
                shifted = pltpu.roll(ctr, jnp.mod(-dx, Wp), axis=2)
                return dx + 1, acc2 + (ty * tx)[None] * shifted

            _, acc = jax.lax.while_loop(
                lambda c2: c2[0] <= dxhi, dx_body, (dxlo, acc))
            return dy + 1, acc

        acc0 = jnp.zeros((10, TH, Wp), jnp.float32)
        _, gathered = jax.lax.while_loop(
            lambda c: c[0] <= dyhi, dy_body, (dylo, acc0))
        out_ref[:] = gathered

    return kernel


def _make_gather_bwd_hist_kernel(TH, Wp, CH, BLKH, M, NP=10):
    """d_hist-only adjoint (``motion_grad=False``): the transposed tent
    scatter alone.  Skips the history staging and the tent-derivative dot
    entirely — material-table training (the config-4 target) has a provably
    dead motion gradient (motion depends on geometry, not materials), but
    XLA cannot dead-code-eliminate half a Pallas kernel, so the full adjoint
    was paying ~10 extra staged planes + per-tap rolls for nothing.

    ``NP``: number of leading cotangent planes with gradient (round-5 #2:
    the temporal epilogue's validity planes feed boolean tests only, so
    their cotangent is identically zero and the callers pass NP=6 — a 40%
    cut of the per-tap roll/FMA traffic; see ``grad_planes``)."""
    def kernel(g_hbm, mot_hbm, dh_ref, g_s, mot_s, sems):
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        hbm = (g_hbm, mot_hbm)
        scratch = (g_s, mot_s)

        def make_copies(slot, band):
            row0 = pl.multiple_of(band * TH, 8)
            return [pltpu.make_async_copy(
                src.at[:, pl.ds(row0, BLKH), :], dst.at[slot],
                sems.at[slot, i]) for i, (src, dst) in enumerate(
                    zip(hbm, scratch))]

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

        g_t = g_s[slot]             # (NP, BLKH, Wp) haloed cotangent
        mot_t = mot_s[slot]         # (2, BLKH, Wp) haloed motion
        m0h, m1h = mot_t[0], mot_t[1]

        m0c = jnp.clip(m0h, -float(M), float(M))
        m1c = jnp.clip(m1h, -float(M), float(M))
        dylo = jnp.floor(jnp.min(m0c)).astype(jnp.int32)
        # upper bounds use ceil, not floor+1 (round 5): when the band's max
        # motion is INTEGER the floor+1 offset's tent weight is identically
        # zero for every pixel — a wasted full-band roll + FMA round.  ceil
        # is tight and exact for value-only kernels (static camera: 4 taps
        # -> 1); the full adjoint keeps floor+1 because the tent DERIVATIVE
        # is +-0.5 at the |x|=1 ties (JAX kink convention, _tent_prime).
        dyhi = jnp.ceil(jnp.max(m0c)).astype(jnp.int32)
        dxlo = jnp.floor(jnp.min(m1c)).astype(jnp.int32)
        dxhi = jnp.ceil(jnp.max(m1c)).astype(jnp.int32)

        # Scatter reformulated as a GATHER for the center output rows
        # (round-5 static-dy restructure): dh[r] = Σ_d w[r-dy, ·-dx]·g[...],
        # so offset dy's sources sit at the STATIC row slice [CH-dy, ·+TH)
        # of the staged band — no dynamic sublane rotates at all (they were
        # ~9× a lane rotate, see _make_gather_kernel); |dy| <= M+1 <= CH so
        # the slice never wraps, keeping the old kernel's values bit-exact.
        dh_ref[:] = jnp.zeros((NP, TH, Wp), jnp.float32)
        for dy in range(-M, M + 2):
            @pl.when((dy >= dylo) & (dy <= dyhi))
            def _(dy=dy):
                m0_s = _rows(m0h, CH - dy, TH)
                m1_s = _rows(m1h, CH - dy, TH)
                g_sl = _rows(g_t, CH - dy, TH)
                ty_s = jnp.maximum(0.0, 1.0 - jnp.abs(m0_s - float(dy)))
                wg = ty_s[None] * g_sl

                def dx_body(carry2):
                    dx, dh2 = carry2
                    dxf = dx.astype(jnp.float32)
                    tx_s = jnp.maximum(0.0, 1.0 - jnp.abs(m1_s - dxf))
                    P = pltpu.roll(tx_s[None] * wg, jnp.mod(dx, Wp), axis=2)
                    return dx + 1, dh2 + P

                _, dh = jax.lax.while_loop(
                    lambda c2: c2[0] <= dxhi, dx_body, (dxlo, dh_ref[...]))
                dh_ref[:] = dh

    return kernel


def _make_gather_bwd_kernel(TH, Wp, CH, BLKH, M, NP=10):
    """Adjoint of the tent gather: d_hist is the transposed tent scatter
    (each source's weighted cotangent rolled FORWARD by its offset); d_motion
    dots the cotangent against tent-derivative-weighted history taps."""
    def kernel(hist_hbm, g_hbm, mot_hbm, dh_ref, dm_ref,
               hist_s, g_s, mot_s, sems):
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        hbm = (hist_hbm, g_hbm, mot_hbm)
        scratch = (hist_s, g_s, mot_s)

        def make_copies(slot, band):
            row0 = pl.multiple_of(band * TH, 8)
            return [pltpu.make_async_copy(
                src.at[:, pl.ds(row0, BLKH), :], dst.at[slot],
                sems.at[slot, i]) for i, (src, dst) in enumerate(
                    zip(hbm, scratch))]

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

        hist_t = hist_s[slot]       # (NP, BLKH, Wp) haloed history
        g_t = g_s[slot]             # (NP, BLKH, Wp) haloed cotangent
        mot_t = mot_s[slot]         # (2, BLKH, Wp) haloed motion
        m0h, m1h = mot_t[0], mot_t[1]
        m0 = _rows(m0h, CH, TH)     # center-row motion
        m1 = _rows(m1h, CH, TH)
        g_c = _rows(g_t, CH, TH)    # center-row cotangent

        # offset range from the HALOED motion (superset of every source
        # row's bracketing offsets; extra taps have exactly zero tent weight)
        m0c = jnp.clip(m0h, -float(M), float(M))
        m1c = jnp.clip(m1h, -float(M), float(M))
        dylo = jnp.floor(jnp.min(m0c)).astype(jnp.int32)
        dyhi = jnp.floor(jnp.max(m0c)).astype(jnp.int32) + 1
        dxlo = jnp.floor(jnp.min(m1c)).astype(jnp.int32)
        dxhi = jnp.floor(jnp.max(m1c)).astype(jnp.int32) + 1

        # Static-dy restructure (see _make_gather_kernel /
        # _make_gather_bwd_hist_kernel): per row offset, d_motion reads the
        # history at the static slice [CH+dy, ·+TH) and d_hist gathers the
        # weighted cotangent at [CH-dy, ·+TH) — no dynamic sublane rotates,
        # only the range-adaptive dynamic lane rotates per column offset.
        dh_ref[:] = jnp.zeros((NP, TH, Wp), jnp.float32)
        dm_ref[:] = jnp.zeros((2, TH, Wp), jnp.float32)
        for dy in range(-M, M + 2):
            @pl.when((dy >= dylo) & (dy <= dyhi))
            def _(dy=dy):
                dyf = float(dy)
                ty = jnp.maximum(0.0, 1.0 - jnp.abs(m0 - dyf))
                typ = _tent_prime(m0 - dyf)
                hist_ctr = _rows(hist_t, CH + dy, TH)
                # d_hist source slices (gather form)
                m0_s = _rows(m0h, CH - dy, TH)
                m1_s = _rows(m1h, CH - dy, TH)
                g_sl = _rows(g_t, CH - dy, TH)
                ty_s = jnp.maximum(0.0, 1.0 - jnp.abs(m0_s - dyf))
                wg = ty_s[None] * g_sl

                def dx_body(carry2):
                    dx, dh2, dm2 = carry2
                    dxf = dx.astype(jnp.float32)
                    tx = jnp.maximum(0.0, 1.0 - jnp.abs(m1 - dxf))
                    txp = _tent_prime(m1 - dxf)
                    # d_motion: cotangent . tent'-weighted history taps
                    hist_sh = pltpu.roll(hist_ctr, jnp.mod(-dx, Wp), axis=2)
                    gdot = jnp.zeros((TH, Wp), jnp.float32)
                    for c in range(NP):
                        gdot = gdot + g_c[c] * hist_sh[c]
                    dm2 = jnp.stack([dm2[0] + (typ * tx) * gdot,
                                     dm2[1] + (ty * txp) * gdot])
                    # d_hist: source-weighted cotangent, lane roll forward
                    tx_s = jnp.maximum(0.0, 1.0 - jnp.abs(m1_s - dxf))
                    P = pltpu.roll(tx_s[None] * wg, jnp.mod(dx, Wp), axis=2)
                    return dx + 1, dh2 + P, dm2

                _, dh, dm = jax.lax.while_loop(
                    lambda c2: c2[0] <= dxhi, dx_body,
                    (dxlo, dh_ref[...], dm_ref[...]))
                dh_ref[:] = dh
                dm_ref[:] = dm

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _reproject_gather(hist_stack, motion, params: SVGFParams,
                      interpret: bool = False, motion_grad: bool = True,
                      grad_planes: int = 10):
    """Bounded-motion tent reprojection of the (10, H, W) history stack —
    mathematically identical to ``ops.temporal.bilinear_shift_sample_many``
    (the oracle's static 196-tap formulation), evaluated per row band over
    the offsets the band's motion actually brackets.  Differentiable: the
    adjoint is a Pallas kernel too (transposed tent scatter + tent-derivative
    motion gradient).

    ``motion_grad=False`` runs the dh-only adjoint (d_motion = 0): exact
    whenever the loss gradient w.r.t. motion is dead downstream — e.g.
    material-table optimization, where motion depends on geometry only —
    and roughly halves the adjoint kernel's staging + roll traffic.

    ``grad_planes``: the adjoint computes d_hist (and the d_motion dot) for
    the leading ``grad_planes`` planes only and returns exact zeros beyond —
    valid whenever the consumer's cotangent is identically zero there.  The
    temporal epilogue qualifies: prev_depth/prev_normal (planes 6-9) feed
    pure boolean validity tests (``depth_ok``/``ndot>0.8``), so the wrappers
    pass 6, cutting the adjoint's staging/roll/FMA traffic by ~40% (round-5
    verdict #2).  Default 10 = the full adjoint, exact for any cotangent."""
    return _gather_call(hist_stack, motion, params, interpret)


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def _gather_call(hist_stack, motion, params, interpret=False):
    H, W = hist_stack.shape[-2:]
    M, Wp, CH, TH, H_pad = _gather_geometry(H, W, params)
    BLKH = TH + 2 * CH
    grid = H_pad // TH
    kernel = _make_gather_kernel(TH, Wp, CH, BLKH, M)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec((2, TH, Wp), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((10, TH, Wp), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((10, H_pad, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 10, BLKH, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(_pad_rows_halo(hist_stack, H_pad, CH, Wp),
      _pad2(motion, H_pad, Wp))
    return out[:, :H, :W]


def _pad_planes(dh, total):
    """Zero d_hist planes beyond ``grad_planes`` (provably zero-cotangent)."""
    np_ = dh.shape[0]
    if np_ == total:
        return dh
    return jnp.pad(dh, [(0, total - np_)] + [(0, 0)] * (dh.ndim - 1))


@functools.partial(jax.jit, static_argnames=("params", "interpret",
                                              "grad_planes"))
def _gather_bwd_call(hist_stack, motion, g, params, interpret=False,
                     grad_planes=10):
    H, W = hist_stack.shape[-2:]
    NP = grad_planes
    M, Wp, CH, TH, H_pad = _gather_geometry(H, W, params)
    # the adjoint stages three haloed stacks (hist, cotangent, motion) and
    # carries a haloed accumulator — half the band keeps it inside VMEM
    TH = min(32, TH)
    H_pad = _round_up(H, TH)
    BLKH = TH + 2 * CH
    grid = H_pad // TH
    kernel = _make_gather_bwd_kernel(TH, Wp, CH, BLKH, M, NP)
    dh, dm = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        out_specs=(pl.BlockSpec((NP, TH, Wp), lambda b: (0, b, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((2, TH, Wp), lambda b: (0, b, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((NP, H_pad, Wp), jnp.float32),
                   jax.ShapeDtypeStruct((2, H_pad, Wp), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((2, NP, BLKH, Wp), jnp.float32),
            pltpu.VMEM((2, NP, BLKH, Wp), jnp.float32),
            pltpu.VMEM((2, 2, BLKH, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(_pad_rows_halo(hist_stack[:NP], H_pad, CH, Wp),
      _pad_rows_halo(g[:NP], H_pad, CH, Wp),
      _pad_rows_halo(motion, H_pad, CH, Wp))
    return _pad_planes(dh[:, :H, :W], hist_stack.shape[0]), dm[:, :H, :W]


@functools.partial(jax.jit, static_argnames=("params", "interpret",
                                              "grad_planes", "n_planes"))
def _gather_bwd_hist_call(motion, g, params, interpret=False,
                          grad_planes=10, n_planes=10):
    """d_hist-only adjoint (see ``_make_gather_bwd_hist_kernel``)."""
    H, W = g.shape[-2:]
    NP = grad_planes
    M, Wp, CH, TH, H_pad = _gather_geometry(H, W, params)
    TH = min(32, TH)
    H_pad = _round_up(H, TH)
    BLKH = TH + 2 * CH
    grid = H_pad // TH
    kernel = _make_gather_bwd_hist_kernel(TH, Wp, CH, BLKH, M, NP)
    dh = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
        out_specs=pl.BlockSpec((NP, TH, Wp), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NP, H_pad, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, NP, BLKH, Wp), jnp.float32),
            pltpu.VMEM((2, 2, BLKH, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(_pad_rows_halo(g[:NP], H_pad, CH, Wp),
      _pad_rows_halo(motion, H_pad, CH, Wp))
    return _pad_planes(dh[:, :H, :W], n_planes)


# ---------------------------------------------------------------------------
# canvas-form gather: the sharded paths keep the temporal history as a
# margin-canvas tile across frames (VERDICT r3 next-step #3) — per frame only
# the mh-wide margins are refreshed over ICI, and the gather kernels consume
# the canvas DIRECTLY (no tile-as-image pad, no halo-ring compute, no crop).
# ---------------------------------------------------------------------------


def hist_canvas_geometry(th: int, tw: int, params: SVGFParams):
    """Geometry of a per-device temporal history canvas:
    rows = [CH margin | th(+pad) center | CH margin], lanes =
    [CLm margin | tw | pad].  Returns
    (mh, CH, CLm, Wpc, TH, th_pad, TH_b) where TH | th_pad (fwd bands) and
    TH_b | (th_pad + 2·CH) (the margin-writing adjoint's out region).
    ``CLm >= 3`` so the fused inference kernel's 7×7 moment window and 3×3
    clamp fit the render canvas's lane margins too."""
    mh = params.max_motion + 1
    CH = _round_up(mh, 8)
    CLm = max(mh, 3)
    Wpc = _round_up(tw + 2 * CLm, 128)
    TH = min(64, _round_up(th, 8))
    th_pad = _round_up(th, TH)
    TH_b = next(t for t in (32, 16, 8) if (th_pad + 2 * CH) % t == 0)
    return mh, CH, CLm, Wpc, TH, th_pad, TH_b


def temporal_accumulate_canvas_pallas(
    gbuf_ctr: GBuffer, histC, rendC, origin, bounds,
    *, params: SVGFParams, interpret: bool = False,
):
    """Fused inference temporal step consuming the history CANVAS directly
    (sharded frame path, VERDICT r3 next-step #3): no tile-as-image pad, no
    halo-ring compute, no output crop copies.

    ``gbuf_ctr``: center-tile G-buffer whose motion/depth/normal are read
    center-blocked (embedded at lane CLm by this wrapper — no exchange);
    ``histC`` the (10, CH+th_pad+CH, Wpc) history canvas with >= mh-wide
    refreshed margins; ``rendC`` the current render embedded in a
    (3, CR+th_pad+CR, Wpc) canvas whose margins hold >= 3 exchanged
    rows/lanes (7×7 moment window + 3×3 clamp reach).  Returns
    (integrated, variance, moments, length) as (…, th_pad, Wpc) center
    arrays (lane crops fuse into consumers)."""
    th, tw = gbuf_ctr.depth.shape
    mh, CH, CLm, Wpc, TH, th_pad, TH_b = hist_canvas_geometry(th, tw, params)
    CR = 8
    assert rendC.shape == (3, 2 * CR + th_pad, Wpc), rendC.shape
    grid = th_pad // TH
    ry, cx = origin
    Hm, Wm = bounds
    kernel = _make_kernel(Hm, Wm, TH, Wpc, CH, CR, params, with_origin=True)

    def embed_cb(x):
        pad = [(0, 0)] * (x.ndim - 2) + [(0, th_pad - th),
                                         (CLm, Wpc - tw - CLm)]
        return jnp.pad(x, pad)

    def cspec(n):
        if n is None:
            return pl.BlockSpec((TH, Wpc), lambda b: (b, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((n, TH, Wpc), lambda b: (0, b, 0),
                            memory_space=pltpu.VMEM)

    motion = (gbuf_ctr.motion if gbuf_ctr.motion is not None
              else jnp.zeros((2, th, tw), jnp.float32))
    org = jnp.stack([jnp.asarray(ry, jnp.int32),
                     jnp.asarray(cx, jnp.int32) - CLm])
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  cspec(2), cspec(None), cspec(3)],
        out_specs=(cspec(3), cspec(None), cspec(2), cspec(None)),
        out_shape=(
            jax.ShapeDtypeStruct((3, th_pad, Wpc), jnp.float32),
            jax.ShapeDtypeStruct((th_pad, Wpc), jnp.float32),
            jax.ShapeDtypeStruct((2, th_pad, Wpc), jnp.float32),
            jax.ShapeDtypeStruct((th_pad, Wpc), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 10, TH + 2 * CH, Wpc), jnp.float32),
            pltpu.VMEM((2, 3, TH + 2 * CR, Wpc), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(org, histC, rendC, embed_cb(motion), embed_cb(gbuf_ctr.depth),
      embed_cb(gbuf_ctr.normal))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _reproject_gather_canvas(histC, motionB, params: SVGFParams,
                             geom, interpret: bool = False,
                             motion_grad: bool = True,
                             grad_planes: int = 10):
    """Gather from a history canvas (10, CH+th_pad+CH, Wpc) with margins
    holding >= mh rows/lanes of refreshed neighbor data.  ``motionB`` is the
    motion embedded with DOUBLE (2·CH) margins — exchanged mh-wide real data,
    zeros beyond — so the margin-writing adjoint's staging offsets stay
    non-negative.  Returns the gathered stack at center rows, full canvas
    lanes: (10, th_pad, Wpc).

    The adjoint writes d_histC as a FULL canvas (gradients for the exchanged
    margins land in the margin rows/lanes, routed to the owning neighbors by
    the caller's refresh/exchange transposes)."""
    return _gather_canvas_call(histC, motionB, params, geom, interpret)


@functools.partial(jax.jit, static_argnames=("params", "geom", "interpret"))
def _gather_canvas_call(histC, motionB, params, geom, interpret=False):
    mh, CH, CLm, Wpc, TH, th_pad, TH_b = geom
    M = params.max_motion
    BLKH = TH + 2 * CH
    grid = th_pad // TH
    kernel = _make_gather_kernel(TH, Wpc, CH, BLKH, M)
    mot_cb = motionB[:, 2 * CH:2 * CH + th_pad, :]
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec((2, TH, Wpc), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((10, TH, Wpc), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((10, th_pad, Wpc), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 10, BLKH, Wpc), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(histC, mot_cb)


@functools.partial(jax.jit, static_argnames=("params", "geom", "interpret",
                                              "motion_grad", "grad_planes"))
def _gather_canvas_bwd_call(histC, motionB, g, params, geom, interpret=False,
                            motion_grad=True, grad_planes=10):
    """Adjoint over the canvas: out rows cover the FULL d_histC canvas
    (th_pad + 2·CH rows = margin-writing), staging reads the double-margin
    cotangent/motion arrays at non-negative offsets."""
    mh, CH, CLm, Wpc, TH, th_pad, TH_b = geom
    M = params.max_motion
    NP = grad_planes
    BLKH = TH_b + 2 * CH
    H_out = th_pad + 2 * CH     # == the d_histC canvas height
    grid = H_out // TH_b
    gB = jnp.pad(g[:NP], [(0, 0), (2 * CH, 2 * CH), (0, 0)])
    if motion_grad:
        kernel = _make_gather_bwd_kernel(TH_b, Wpc, CH, BLKH, M, NP)
        dh, dmB = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
            out_specs=(pl.BlockSpec((NP, TH_b, Wpc), lambda b: (0, b, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((2, TH_b, Wpc), lambda b: (0, b, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((NP, H_out, Wpc), jnp.float32),
                       jax.ShapeDtypeStruct((2, H_out, Wpc), jnp.float32)),
            scratch_shapes=[
                pltpu.VMEM((2, NP, BLKH, Wpc), jnp.float32),
                pltpu.VMEM((2, NP, BLKH, Wpc), jnp.float32),
                pltpu.VMEM((2, 2, BLKH, Wpc), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 2 ** 20),
            interpret=interpret,
        )(jnp.pad(histC[:NP], [(0, 0), (CH, CH), (0, 0)]), gB, motionB)
        dm = jnp.pad(dmB, [(0, 0), (CH, CH), (0, 0)])
        return _pad_planes(dh, histC.shape[0]), dm
    kernel = _make_gather_bwd_hist_kernel(TH_b, Wpc, CH, BLKH, M, NP)
    dh = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
        out_specs=pl.BlockSpec((NP, TH_b, Wpc), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NP, H_out, Wpc), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, NP, BLKH, Wpc), jnp.float32),
            pltpu.VMEM((2, 2, BLKH, Wpc), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(gB, motionB)
    return _pad_planes(dh, histC.shape[0]), jnp.zeros_like(motionB)


def _reproject_canvas_fwd(histC, motionB, params, geom, interpret,
                          motion_grad, grad_planes):
    return _gather_canvas_call(histC, motionB, params, geom, interpret), (
        histC, motionB)


def _reproject_canvas_bwd(params, geom, interpret, motion_grad, grad_planes,
                          res, g):
    histC, motionB = res
    return _gather_canvas_bwd_call(histC, motionB, g, params, geom,
                                   interpret, motion_grad, grad_planes)


_reproject_gather_canvas.defvjp(_reproject_canvas_fwd, _reproject_canvas_bwd)


def _reproject_fwd(hist_stack, motion, params, interpret, motion_grad,
                   grad_planes):
    return _gather_call(hist_stack, motion, params, interpret), (
        hist_stack, motion)


def _reproject_bwd(params, interpret, motion_grad, grad_planes, res, g):
    hist_stack, motion = res
    if not motion_grad:
        dh = _gather_bwd_hist_call(motion, g, params, interpret,
                                   grad_planes, hist_stack.shape[0])
        return dh, jnp.zeros_like(motion)
    return _gather_bwd_call(hist_stack, motion, g, params, interpret,
                            grad_planes)


_reproject_gather.defvjp(_reproject_fwd, _reproject_bwd)


@functools.partial(jax.jit, static_argnames=("params", "interpret",
                                              "motion_grad"))
def temporal_accumulate_pallas_ad(
    gbuf: GBuffer,
    history: History,
    *,
    params: SVGFParams = SVGFParams(),
    interpret: bool = False,
    motion_grad: bool = True,
) -> Tuple[jax.Array, jax.Array, History]:
    """Differentiable temporal step on TPU: Pallas tent gather (custom VJP,
    both directions kernels) + the oracle's epilogue verbatim — forward
    results and gradients match ``ops.temporal.temporal_accumulate`` (the
    round-2 verdict's "last jnp-only stage on the training path")."""
    if params.max_motion is None:
        raise ValueError("temporal_accumulate_pallas_ad requires "
                         "SVGFParams.max_motion (bounded reprojection)")
    from ..temporal import _temporal_epilogue

    H, W = gbuf.shape
    color = gbuf.render
    motion = (gbuf.motion if gbuf.motion is not None
              else jnp.zeros((2, H, W), color.dtype))
    hist_stack = jnp.concatenate([
        history.color, history.moments, history.length[None],
        history.prev_depth[None], history.prev_normal,
    ])
    # grad_planes=6: the epilogue's validity planes (prev_depth/prev_normal)
    # feed boolean tests only — their cotangent is identically zero, so the
    # adjoint skips them exactly (round-5 verdict #2)
    gathered = _reproject_gather(hist_stack, motion, params, interpret,
                                 motion_grad, 6)

    m0, m1 = motion[0], motion[1]
    iy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(color.dtype)
    ix = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(color.dtype)
    ys, xs = iy + m0, ix + m1
    M = params.max_motion
    in_bounds = ((ys >= 0) & (ys <= H - 1) & (xs >= 0) & (xs <= W - 1)
                 & (jnp.abs(m0) <= M) & (jnp.abs(m1) <= M))

    planes = (gathered[0:3], gathered[3:5], gathered[5], gathered[6],
              gathered[7:10])
    return _temporal_epilogue(gbuf, planes, in_bounds, params)
