"""Spatially sharded SVGF + raymarch pipeline (shard_map over a device mesh).

BASELINE.md config 5: image tiles sharded over ('y', 'x') mesh axes with ICI
halo exchange per à-trous level, end-to-end forward + backward.  Everything
here runs *inside* ``jax.shard_map``; the public entry points wrap it.

Correctness contract: identical results (up to fp reassociation) to the
single-device oracle (ops/atrous.py) for any mesh shape, enforced by global
coordinate masks — an out-of-tile tap that is inside a neighbor contributes
via the exchanged halo, an out-of-image tap contributes zero weight exactly
like the reference's ``inRange`` guard (src/filter.cu:37-38).

Differentiable: ``ppermute``'s transpose is ``ppermute`` with the inverse
permutation and the gather transposes to scatter-add, so ``jax.grad`` of a
shard_mapped pipeline yields the correctly halo-exchanged adjoint for free;
gradients of replicated leaves (materials) are psum'd by shard_map itself.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import CameraParams, RaymarchParams, SVGFParams
from ..gbuffer import GBuffer, History, luminance
from ..ops.atrous import _spline_taps, _EPS
from .halo import exchange_halo2d, tile_origin

REPL = P()
PLANE = P("y", "x")
PLANES = P(None, "y", "x")


def _rows_cols(x, oy, ox, th, tw, h):
    """Slice a (…, th, tw) window at center offset (oy, ox) from a tile
    padded by h on both spatial axes (static offsets)."""
    return x[..., h + oy:h + oy + th, h + ox:h + ox + tw]


def _global_iota(ry, cx, th, tw):
    gy = ry + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
    gx = cx + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
    return gy, gx


def atrous_level_local(
    color_p, var_p, normal_p, depth_p, sden_p,   # halo-padded tiles (pad h)
    zgrad,                                        # (2, th, tw) center only
    ry, cx, Hg, Wg,                               # tile origin + global shape
    *, level: int, params: SVGFParams,
) -> Tuple[jax.Array, jax.Array]:
    """One à-trous level on a halo-padded local tile (oracle math, global
    masks).  ``h = radius * 2^level`` padding is assumed on both axes."""
    spacing = 1 << level
    r = params.radius
    h = r * spacing
    taps1d = _spline_taps(r)
    th, tw = zgrad.shape[-2:]
    gy, gx = _global_iota(ry, cx, th, tw)

    col_c = _rows_cols(color_p, 0, 0, th, tw, h)
    lum_p_full = 0.2126 * color_p[0] + 0.7152 * color_p[1] + 0.0722 * color_p[2]
    lum_c = _rows_cols(lum_p_full, 0, 0, th, tw, h)
    n_c = _rows_cols(normal_p, 0, 0, th, tw, h)
    z_c = _rows_cols(depth_p, 0, 0, th, tw, h)
    sden_c = _rows_cols(sden_p, 0, 0, th, tw, h)

    num_c = jnp.zeros_like(col_c)
    num_v = jnp.zeros_like(z_c)
    den = jnp.zeros_like(z_c)

    luma_only = (params.luma_only_from is not None
                 and level >= params.luma_only_from)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            oy, ox = dy * spacing, dx * spacing
            hw = taps1d[dy + r] * taps1d[dx + r]
            m = ((gy + oy >= 0) & (gy + oy < Hg)
                 & (gx + ox >= 0) & (gx + ox < Wg)).astype(z_c.dtype)

            l_q = _rows_cols(lum_p_full, oy, ox, th, tw, h)
            c_q = _rows_cols(color_p, oy, ox, th, tw, h)
            v_q = _rows_cols(var_p, oy, ox, th, tw, h)

            wl = -jnp.abs(lum_c - l_q) / sden_c
            if luma_only:
                # cheaper-filter deep-level mode (SVGFParams.luma_only_from):
                # mirror of ops.atrous.atrous_level_ref's luma branch
                w = hw * m * jnp.exp(wl)
            else:
                z_q = _rows_cols(depth_p, oy, ox, th, tw, h)
                n_q = _rows_cols(normal_p, oy, ox, th, tw, h)
                dz_den = params.sigma_depth * jnp.abs(
                    zgrad[0] * oy + zgrad[1] * ox) + _EPS
                wz = -jnp.abs(z_c - z_q) / dz_den
                ndot = jnp.maximum(jnp.sum(n_c * n_q, axis=0), 0.0)
                wn = jnp.power(jnp.maximum(ndot, 1e-20), params.sigma_normal)
                w = hw * m * jnp.exp(wz + wl) * wn
            # detached weights: matches the oracle's detach_weights=True and
            # the Pallas custom-VJP semantics (linear-combination adjoint)
            w = lax.stop_gradient(w)

            num_c = num_c + w[None] * c_q
            num_v = num_v + (w * w) * v_q
            den = den + w

    den = jnp.maximum(den, _EPS)
    return num_c / den[None], num_v / (den * den)


def _variance_blur3x3_local(var, ry, cx, Hg, Wg):
    """3x3 gaussian blur with halo exchange + global-border renormalization
    (sharded analogue of ops.atrous.variance_blur3x3)."""
    vp = exchange_halo2d(var, 1)
    th, tw = var.shape
    gy, gx = _global_iota(ry, cx, th, tw)
    k1 = (0.25, 0.5, 0.25)
    num = jnp.zeros_like(var)
    dencnt = jnp.zeros_like(var)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            k = k1[dy + 1] * k1[dx + 1]
            m = ((gy + dy >= 0) & (gy + dy < Hg)
                 & (gx + dx >= 0) & (gx + dx < Wg)).astype(var.dtype)
            num = num + k * m * _rows_cols(vp, dy, dx, th, tw, 1)
            dencnt = dencnt + k * m
    # pixels entirely outside the global image (pad-and-mask tiles) have a
    # zero tap count; clamp so they yield 0, not NaN (bit-exact for in-image
    # pixels, whose own center tap guarantees dencnt >= 0.25)
    return num / jnp.maximum(dencnt, 1e-20)


def _zgrad_local(depth, ry, cx, Hg, Wg):
    """Central-difference depth gradient with halo exchange + one-sided
    borders (sharded analogue of ops.common.finite_diff_gradients)."""
    dp = exchange_halo2d(depth, 1)
    th, tw = depth.shape
    gy, gx = _global_iota(ry, cx, th, tw)
    up = _rows_cols(dp, -1, 0, th, tw, 1)
    dn = _rows_cols(dp, 1, 0, th, tw, 1)
    lf = _rows_cols(dp, 0, -1, th, tw, 1)
    rt = _rows_cols(dp, 0, 1, th, tw, 1)
    fwd_y, bwd_y = dn - depth, depth - up
    fwd_x, bwd_x = rt - depth, depth - lf
    dzdy = jnp.where(gy == 0, fwd_y,
                     jnp.where(gy == Hg - 1, bwd_y, 0.5 * (fwd_y + bwd_y)))
    dzdx = jnp.where(gx == 0, fwd_x,
                     jnp.where(gx == Wg - 1, bwd_x, 0.5 * (fwd_x + bwd_x)))
    return jnp.stack([dzdy, dzdx])


def svgf_spatial_local(
    color, variance, normal, depth,
    Hg: int, Wg: int,
    *, params: SVGFParams, return_feedback: bool = False,
    impl: str = "oracle", interpret: bool = False,
    weight_math: str = "exact", bwd_impl: str = "auto",
):
    """Multi-level à-trous on local tiles (call inside shard_map).

    ``impl="pallas"`` runs the TPU band kernels: canvas-chained
    (``svgf_spatial_chained_local`` — one M-margin canvas build, h-wide ICI
    margin refreshes between levels, zero per-level pad/crop copies)
    whenever the deepest halo fits the tile, else the per-level tile kernels
    (``atrous_level_tile``, multi-hop halo exchange).  ``impl=
    "pallas_levels"`` forces the per-level path (A/B measurement).  Same
    global-coordinate masking contract everywhere, so results match the
    oracle path.
    """
    th, tw = depth.shape
    if params.pyramid_from is not None:
        raise NotImplementedError(
            "pyramid_from is an unsharded jnp-oracle experiment only")
    if bwd_impl == "auto":
        # the luma-only headline mode needs the weight-agnostic stored
        # adjoint; the classic modes keep the recompute default
        bwd_impl = ("stored" if params.luma_only_from is not None
                    else "recompute")
    if impl == "pallas":
        hmax = params.radius << max(params.iterations - 1, 0)
        if hmax <= min(th, tw):
            return svgf_spatial_chained_local(
                color, variance, normal, depth, Hg, Wg, params=params,
                return_feedback=return_feedback, interpret=interpret,
                weight_math=weight_math, bwd_impl=bwd_impl)
        impl = "pallas_levels"
    if params.luma_only_from is not None and impl == "pallas_levels":
        # the per-level tile kernels (the multi-hop halo>tile fallback) have
        # no luma-only fwd/bwd pair; the headline mode runs on the chained
        # stored path (round-5 verdict #1) and the oracle path
        raise NotImplementedError(
            "luma_only_from on the sharded path requires the canvas-chained "
            "kernels (deepest halo <= tile; here halo "
            f"{params.radius << max(params.iterations - 1, 0)} > tile "
            f"({th}, {tw})) or impl='oracle'")
    ry, cx = tile_origin((th, tw))
    zgrad = _zgrad_local(depth, ry, cx, Hg, Wg)
    c, v = color, variance
    feedback = color
    for lvl in range(params.iterations):
        h = params.radius * (1 << lvl)
        sden = params.sigma_color * jnp.sqrt(jnp.maximum(
            _variance_blur3x3_local(lax.stop_gradient(v), ry, cx, Hg, Wg), 0.0
        )) + _EPS
        if impl == "pallas_levels":
            from ..ops.pallas.atrous_tpu import atrous_level_tile

            ring = [(0, 0)] * (zgrad.ndim - 2) + [(h, h), (h, h)]
            c, v = atrous_level_tile(
                exchange_halo2d(c, h), exchange_halo2d(v, h),
                exchange_halo2d(normal, h), exchange_halo2d(depth, h),
                jnp.pad(zgrad, ring), jnp.pad(sden, [(h, h), (h, h)]),
                (ry, cx), lvl, params, (Hg, Wg), interpret,
            )
        else:
            c, v = atrous_level_local(
                exchange_halo2d(c, h), exchange_halo2d(v, h),
                exchange_halo2d(normal, h), exchange_halo2d(depth, h),
                exchange_halo2d(sden, h),
                zgrad, ry, cx, Hg, Wg, level=lvl, params=params,
            )
        if lvl + 1 == params.feedback_level:
            feedback = c
    if return_feedback:
        return c, v, feedback
    return c, v


# ---------------------------------------------------------------------------
# temporal accumulation on tiles (bounded-motion reprojection)
# ---------------------------------------------------------------------------

def _bilinear_gather_padded(plane_p, ys, xs, mh):
    """Bilinear sample a halo-padded (..., th+2mh, tw+2mh) tile at local
    coords (ys, xs) relative to the unpadded tile (clamped to the padded
    extent; validity handled by the caller)."""
    Hp, Wp = plane_p.shape[-2], plane_p.shape[-1]
    ys = ys + mh
    xs = xs + mh
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy, fx = ys - y0, xs - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, Hp - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, Wp - 1)
    y1i = jnp.clip(y0i + 1, 0, Hp - 1)
    x1i = jnp.clip(x0i + 1, 0, Wp - 1)
    flat = plane_p.reshape(plane_p.shape[:-2] + (Hp * Wp,))

    def at(yi, xi):
        return jnp.take(flat, yi * Wp + xi, axis=-1)

    top = at(y0i, x0i) * (1 - fx) + at(y0i, x1i) * fx
    bot = at(y1i, x0i) * (1 - fx) + at(y1i, x1i) * fx
    return top * (1 - fy) + bot * fy


def _neighborhood_minmax_local(color, ry, cx, Hg, Wg):
    """Separable per-pixel 3x3 min/max on halo-padded tiles (rows then cols;
    out-of-image taps dropped by ±inf substitution — the validity mask
    factors into per-row × per-col global-coordinate tests)."""
    cp = exchange_halo2d(color, 1)
    th, tw = color.shape[-2:]
    gy, gx = _global_iota(ry, cx, th, tw)

    rmin = jnp.full_like(cp[..., :th, :], jnp.inf)
    rmax = jnp.full_like(cp[..., :th, :], -jnp.inf)
    for dy in (-1, 0, 1):
        mrow = ((gy[:, :1] + dy >= 0) & (gy[:, :1] + dy < Hg))[None]
        s = cp[..., 1 + dy:1 + dy + th, :]
        rmin = jnp.minimum(rmin, jnp.where(mrow, s, jnp.inf))
        rmax = jnp.maximum(rmax, jnp.where(mrow, s, -jnp.inf))
    cmin = jnp.full_like(color, jnp.inf)
    cmax = jnp.full_like(color, -jnp.inf)
    for dx in (-1, 0, 1):
        mcol = ((gx[:1] + dx >= 0) & (gx[:1] + dx < Wg))[None]
        cmin = jnp.minimum(cmin, jnp.where(mcol, rmin[..., 1 + dx:1 + dx + tw],
                                           jnp.inf))
        cmax = jnp.maximum(cmax, jnp.where(mcol, rmax[..., 1 + dx:1 + dx + tw],
                                           -jnp.inf))
    return cmin, cmax


def _spatial_moments_local(lum, ry, cx, Hg, Wg, radius=3):
    """Separable 7x7 moment window on halo-padded tiles: out-of-image taps
    are zeros (halo exchange zero-fills), so the numerators are plain sums;
    the valid-tap count is the outer product of 1-D global-coordinate
    counts (mirror of ops.temporal.spatial_moments)."""
    lp = exchange_halo2d(lum, radius)
    th, tw = lum.shape
    gy, gx = _global_iota(ry, cx, th, tw)

    def winsum(xp):
        rows = jnp.zeros((th, xp.shape[-1]), lum.dtype)
        for d in range(-radius, radius + 1):
            rows = rows + xp[radius + d:radius + d + th, :]
        out = jnp.zeros((th, tw), lum.dtype)
        for d in range(-radius, radius + 1):
            out = out + rows[:, radius + d:radius + d + tw]
        return out

    gyf = gy.astype(lum.dtype)
    gxf = gx.astype(lum.dtype)
    # clamp to >= 1: out-of-image pixels (pad-and-mask tiles) would otherwise
    # produce zero or negative counts (in-image pixels always count their own
    # tap, so the clamp is bit-exact for them)
    cy = jnp.maximum(jnp.minimum(gyf, float(radius))
                     + jnp.minimum(Hg - 1 - gyf, float(radius)) + 1.0, 1.0)
    cxn = jnp.maximum(jnp.minimum(gxf, float(radius))
                      + jnp.minimum(Wg - 1 - gxf, float(radius)) + 1.0, 1.0)
    inv_cnt = 1.0 / (cy * cxn)
    return winsum(lp) * inv_cnt, winsum(lp * lp) * inv_cnt


def temporal_accumulate_local(
    gbuf: GBuffer, history: History, Hg: int, Wg: int,
    *, params: SVGFParams, impl: str = "oracle", interpret: bool = False,
    motion_grad: bool = True,
):
    """Tile-local temporal step (mirror of ops.temporal.temporal_accumulate).

    ``impl="pallas"`` routes through the fused temporal band kernel on
    halo-exchanged tiles (``temporal_accumulate_tile``) — inference-only
    (no VJP).  ``impl="pallas_ad"`` runs the *differentiable* Pallas tent
    gather (``_reproject_gather``, custom VJP in both directions) on the
    halo-exchanged tile-as-image and keeps the jnp epilogue — the sharded
    training path's kernel route: ``exchange_halo2d`` is ``ppermute``-based,
    so shard_map transposes the halo exchange and the gather adjoint's halo
    gradients ride ICI back to the owning devices for free.

    The disocclusion policy is shared with the single-device path:
    ``params.max_motion`` is the single source of truth, accepted inclusively
    (``|motion| <= max_motion``) in both.  Reprojection reads history through
    an exchanged halo of ``max_motion + 1`` pixels (the +1 covers the bilinear
    ceil tap); larger motion is treated as a disocclusion (history rejected),
    bounding ICI traffic per frame.  Parity at boundary motions is tested in
    tests/test_sharded.py.
    """
    if params.max_motion is None:
        raise ValueError(
            "sharded temporal accumulation requires bounded motion "
            "(SVGFParams.max_motion is None); unbounded gather-based "
            "reprojection cannot be halo-exchanged")
    th, tw = gbuf.depth.shape
    ry, cx = tile_origin((th, tw))
    color = gbuf.render
    motion = gbuf.motion if gbuf.motion is not None else jnp.zeros((2, th, tw), color.dtype)
    mm = params.max_motion
    mh = mm + 1  # halo width: max accepted motion + bilinear ceil tap

    if impl == "pallas":
        from ..ops.pallas.temporal_tpu import temporal_accumulate_tile

        # NOTE measured negative (round 3): packing all 19 planes into ONE
        # stacked exchange costs an extra full 19-plane concat copy and is
        # ~1.3 ms SLOWER at 1080p than per-plane exchanges (19.3 vs 18.0
        # ms/frame) — XLA already fuses the per-plane pad copies into their
        # consumers.  Keep per-plane exchanges.
        def ex(x):
            return exchange_halo2d(x, mh)

        gbuf_p = gbuf.replace(
            render=ex(color), albedo=None, motion=ex(motion),
            normal=ex(gbuf.normal), depth=ex(gbuf.depth), denoised=None)
        hist_p = History(
            color=ex(history.color), moments=ex(history.moments),
            length=ex(history.length), prev_depth=ex(history.prev_depth),
            prev_normal=ex(history.prev_normal))
        return temporal_accumulate_tile(
            gbuf_p, hist_p, (ry, cx), (Hg, Wg), params=params,
            interpret=interpret)

    iy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(color.dtype)
    ix = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(color.dtype)
    ys = iy + motion[0]   # local coords of the history sample
    xs = ix + motion[1]
    gys = ys + ry
    gxs = xs + cx

    in_bounds = ((gys >= 0) & (gys <= Hg - 1) & (gxs >= 0) & (gxs <= Wg - 1)
                 & (jnp.abs(motion[0]) <= mm) & (jnp.abs(motion[1]) <= mm))

    if impl == "pallas_ad":
        # Differentiable kernel gather on the halo-exchanged tile-as-image:
        # every accepted-motion center pixel's tent taps land inside the
        # mh-wide halo (mh = max_motion + 1 covers the bilinear ceil tap), so
        # center results equal the oracle's; halo-row outputs are cropped.
        from ..ops.pallas.temporal_tpu import _reproject_gather

        hist_stack = jnp.concatenate([
            history.color, history.moments, history.length[None],
            history.prev_depth[None], history.prev_normal])
        g = _reproject_gather(
            exchange_halo2d(hist_stack, mh), exchange_halo2d(motion, mh),
            params, interpret, motion_grad,
            6)[:, mh:mh + th, mh:mh + tw]  # epilogue validity planes: zero
        # cotangent (grad_planes=6, see _reproject_gather)
        prev_color, prev_moments = g[0:3], g[3:5]
        prev_len, prev_depth, prev_normal = g[5], g[6], g[7:10]
    else:
        hc = exchange_halo2d(history.color, mh)
        hm = exchange_halo2d(history.moments, mh)
        hl = exchange_halo2d(history.length, mh)
        hd = exchange_halo2d(history.prev_depth, mh)
        hn = exchange_halo2d(history.prev_normal, mh)

        prev_color = _bilinear_gather_padded(hc, ys, xs, mh)
        prev_moments = _bilinear_gather_padded(hm, ys, xs, mh)
        prev_len = _bilinear_gather_padded(hl, ys, xs, mh)
        prev_depth = _bilinear_gather_padded(hd, ys, xs, mh)
        prev_normal = _bilinear_gather_padded(hn, ys, xs, mh)

    integrated, variance, moments, n_new = _temporal_epilogue_sharded(
        gbuf, (prev_color, prev_moments, prev_len, prev_depth, prev_normal),
        in_bounds, ry, cx, Hg, Wg, params)
    new_history = History(
        color=integrated, moments=moments, length=n_new,
        prev_depth=gbuf.depth, prev_normal=gbuf.normal)
    return integrated, variance, new_history


def _temporal_epilogue_sharded(gbuf, planes, in_bounds, ry, cx, Hg, Wg,
                               params):
    """Shared tile-local temporal epilogue (mirror of the oracle's
    ``_temporal_epilogue``, with the 3x3 clamp and 7x7 moments on
    halo-exchanged tiles + global masks)."""
    prev_color, prev_moments, prev_len, prev_depth, prev_normal = planes
    color = gbuf.render
    depth_ok = jnp.abs(prev_depth - gbuf.depth) <= 0.1 * jnp.maximum(
        jnp.abs(gbuf.depth), 1e-3)
    ndot = jnp.sum(prev_normal * gbuf.normal, axis=0)
    valid = in_bounds & depth_ok & (ndot > 0.8) & (prev_len > 0)

    if params.history_clamp:
        cmin, cmax = _neighborhood_minmax_local(color, ry, cx, Hg, Wg)
        prev_color = jnp.clip(prev_color, cmin, cmax)

    n_prev = jnp.where(valid, prev_len, 0.0)
    n_new = n_prev + 1.0
    alpha = jnp.maximum(params.temporal_alpha, 1.0 / n_new)
    alpha_m = jnp.maximum(params.temporal_moments_alpha, 1.0 / n_new)

    integrated = jnp.where(
        valid[None], (1 - alpha)[None] * prev_color + alpha[None] * color, color)

    lum = luminance(color)
    cur_moments = jnp.stack([lum, lum * lum])
    moments = jnp.where(
        valid[None],
        (1 - alpha_m)[None] * prev_moments + alpha_m[None] * cur_moments,
        cur_moments)

    var_temporal = jnp.maximum(moments[1] - moments[0] ** 2, 0.0)
    sm1, sm2 = _spatial_moments_local(lum, ry, cx, Hg, Wg)
    var_spatial = jnp.maximum(sm2 - sm1 * sm1, 0.0)
    variance = jnp.where(n_new < params.variance_boost_frames, var_spatial,
                         var_temporal)
    return integrated, variance, moments, n_new


def hist_canvas_shape(th: int, tw: int, params: SVGFParams):
    """Per-device temporal history canvas shape (see
    ``temporal_tpu.hist_canvas_geometry``)."""
    from ..ops.pallas.temporal_tpu import hist_canvas_geometry

    mh, CH, CLm, Wpc, TH, th_pad, TH_b = hist_canvas_geometry(th, tw, params)
    return (10, CH + th_pad + CH, Wpc)


def init_history_canvas(mesh: Mesh, Hg: int, Wg: int, params: SVGFParams,
                        data: int = 1):
    """Zero-history canvas carry for the canvas-form sharded temporal paths
    (GLOBAL array; shard with P(None, 'y', 'x') or P('data', None, 'y', 'x')
    when ``data > 1``)."""
    ny = mesh.shape["y"]
    nx = mesh.shape["x"]
    if Hg % ny or Wg % nx:
        # floor division would silently build a wrong-size canvas that only
        # fails with a shape error deep inside the kernels (ADVICE r4)
        raise ValueError(
            f"canvas-form temporal history requires a mesh-divisible global "
            f"shape: ({Hg}, {Wg}) does not tile over the ({ny}, {nx}) "
            f"('y','x') mesh — pad the image or use a History carry "
            f"(temporal_impl='pallas_ad'/'oracle')")
    _, rows, cols = hist_canvas_shape(Hg // ny, Wg // nx, params)
    shape = (10, ny * rows, nx * cols)
    if data > 1:
        shape = (data,) + shape
    return jnp.zeros(shape, jnp.float32)


def history_from_canvas(histC, th: int, tw: int, params: SVGFParams):
    """Standard center-tile History pytree from a per-device canvas (call
    inside shard_map, or on a single tile)."""
    from ..ops.pallas.temporal_tpu import hist_canvas_geometry

    mh, CH, CLm, Wpc, TH, th_pad, TH_b = hist_canvas_geometry(th, tw, params)
    c = histC[:, CH:CH + th, CLm:CLm + tw]
    return History(color=c[0:3], moments=c[3:5], length=c[5],
                   prev_depth=c[6], prev_normal=c[7:10])


def temporal_accumulate_canvas_local(
    gbuf: GBuffer, histC, Hg: int, Wg: int,
    *, params: SVGFParams, interpret: bool = False,
    motion_grad: bool = True,
):
    """Differentiable tile-local temporal step with the history carried as a
    margin-canvas ACROSS FRAMES (VERDICT r3 next-step #3): instead of
    re-exchanging ~10 full history planes per frame, only the mh-wide canvas
    margins are refreshed over ICI, and the gather kernels consume/emit the
    canvas directly (no tile-as-image pad, no halo-ring compute).  The
    adjoint writes margin gradients into the canvas margins; the refresh
    transposes route them to the owning neighbors.

    ``histC``: (10, CH+th_pad+CH, Wpc) canvas (``init_history_canvas``) with
    plane order [color(3), moments(2), length, prev_depth, prev_normal(3)].
    Returns (integrated, variance, new_histC); the new canvas's margins are
    stale (refreshed at the next frame's consume)."""
    from ..ops.pallas.temporal_tpu import (hist_canvas_geometry,
                                           _reproject_gather_canvas)

    if params.max_motion is None:
        raise ValueError("canvas temporal accumulation requires bounded "
                         "motion (SVGFParams.max_motion)")
    th, tw = gbuf.depth.shape
    geom = hist_canvas_geometry(th, tw, params)
    mh, CH, CLm, Wpc, THf, th_pad, TH_b = geom
    ry, cx = tile_origin((th, tw))
    color = gbuf.render
    motion = (gbuf.motion if gbuf.motion is not None
              else jnp.zeros((2, th, tw), color.dtype))
    mm = params.max_motion

    # 1. refresh the mh-wide margins from the neighbors' centers (strips)
    histC = _refresh_margins_rl(histC, CH, CLm, th, tw, mh)

    # 2. motion with doubled (2·CH) margins: exchanged mh-wide real data so
    # the adjoint's source weights see neighbor motion, zeros beyond
    mot_ex = exchange_halo2d(motion, mh)
    motionB = jnp.pad(mot_ex, [(0, 0),
                               (2 * CH - mh, 2 * CH - mh + th_pad - th),
                               (CLm - mh, Wpc - tw - CLm - mh)])

    # 3. canvas gather (custom VJP both directions; grad_planes=6 — the
    # epilogue's validity planes have identically-zero cotangent)
    gathered = _reproject_gather_canvas(histC, motionB, params, geom,
                                        interpret, motion_grad, 6)
    ctr = gathered[:, :th, CLm:CLm + tw]
    planes = (ctr[0:3], ctr[3:5], ctr[5], ctr[6], ctr[7:10])

    iy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(color.dtype)
    ix = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(color.dtype)
    gys = iy + motion[0] + ry
    gxs = ix + motion[1] + cx
    in_bounds = ((gys >= 0) & (gys <= Hg - 1) & (gxs >= 0) & (gxs <= Wg - 1)
                 & (jnp.abs(motion[0]) <= mm) & (jnp.abs(motion[1]) <= mm))

    integrated, variance, moments, n_new = _temporal_epilogue_sharded(
        gbuf, planes, in_bounds, ry, cx, Hg, Wg, params)

    new_stack = jnp.concatenate([
        integrated, moments, n_new[None], gbuf.depth[None], gbuf.normal])
    new_histC = jnp.pad(new_stack, [(0, 0), (CH, CH + th_pad - th),
                                    (CLm, Wpc - tw - CLm)])
    return integrated, variance, new_histC


def temporal_accumulate_canvas_fused_local(
    gbuf: GBuffer, histC, Hg: int, Wg: int,
    *, params: SVGFParams, interpret: bool = False,
):
    """Inference twin of :func:`temporal_accumulate_canvas_local`: the fused
    temporal band kernel consumes the history canvas directly.  Per frame
    the ICI traffic is the mh-wide canvas margin strips plus a 3-wide render
    exchange (7×7 moments + 3×3 clamp reach) — motion/depth/normal are read
    center-blocked with no exchange at all (the old tile path exchanged all
    19 planes at mh and cropped 4 outputs).  Inference-only (no VJP)."""
    from ..ops.pallas.temporal_tpu import (hist_canvas_geometry,
                                           temporal_accumulate_canvas_pallas)

    if params.max_motion is None:
        raise ValueError("canvas temporal accumulation requires bounded "
                         "motion (SVGFParams.max_motion)")
    th, tw = gbuf.depth.shape
    geom = hist_canvas_geometry(th, tw, params)
    mh, CH, CLm, Wpc, THf, th_pad, TH_b = geom
    CR = 8
    ry, cx = tile_origin((th, tw))

    histC = _refresh_margins_rl(histC, CH, CLm, th, tw, mh)
    rend_ex = exchange_halo2d(gbuf.render, 3)
    rendC = jnp.pad(rend_ex, [(0, 0), (CR - 3, CR - 3 + th_pad - th),
                              (CLm - 3, Wpc - tw - CLm - 3)])

    integ, var, mom, length = temporal_accumulate_canvas_pallas(
        gbuf, histC, rendC, (ry, cx), (Hg, Wg), params=params,
        interpret=interpret)

    def embed_cb(x):
        pad = [(0, 0)] * (x.ndim - 2) + [(0, th_pad - th),
                                         (CLm, Wpc - tw - CLm)]
        return jnp.pad(x, pad)

    new_histC = jnp.pad(
        jnp.concatenate([integ, mom, length[None],
                         embed_cb(gbuf.depth[None]), embed_cb(gbuf.normal)]),
        [(0, 0), (CH, CH), (0, 0)])
    integ_ctr = integ[:, :th, CLm:CLm + tw]
    var_ctr = var[:th, CLm:CLm + tw]
    return integ_ctr, var_ctr, new_histC


# ---------------------------------------------------------------------------
# canvas-chained tile sweep: the unsharded chain's zero-pad/crop levels on
# per-device tile canvases, margins refreshed over ICI between levels
# ---------------------------------------------------------------------------
#
# The per-level tile path (``svgf_spatial_local(impl="pallas")``) re-exchanges
# every guidance plane and pads/crops color+variance at every level — measured
# +57% over the unsharded canvas chain on one chip (ROADMAP round-3 findings).
# Here each device keeps M-margin canvases (M = deepest-level halo): guidance
# planes are exchanged ONCE at margin width M, and between levels only the
# h-wide color/variance margin bands are refreshed via ppermute — no pad/crop
# copies.  All exchanges are plain jnp/ppermute ops *outside* the per-level
# custom VJP, so jax.grad transposes the margin refreshes automatically; the
# custom VJP only maps canvas cotangents through the level kernel's adjoint.


def _refresh_margins_rl(x, Mr: int, Ml: int, th: int, tw: int, w: int,
                        axes: Tuple[str, str] = ("y", "x")):
    """Overwrite the w-wide inner margin ring of a tile canvas with the
    neighbors' center edge bands (rows spanning all lanes first, then cols
    spanning all rows — the col pass reads the row pass's refreshed margins,
    so corners pick up the diagonal neighbor exactly like exchange_halo2d).
    Missing neighbors (global border) contribute zeros; the kernels' global
    masks drop those taps anyway.  ``Mr``/``Ml``: the canvas's row/lane
    margin widths (center at rows [Mr, Mr+th), lanes [Ml, Ml+tw))."""
    if w == 0:
        return x
    from .halo import _axis_shift_perm

    def upd(v, band, start, axis):
        return lax.dynamic_update_slice_in_dim(v, band, start, axis=axis)

    # Single-shard axes are skipped entirely (round-5 sharded-glue fix): the
    # permuted bands would be all zeros (empty ppermute perm = global border
    # on both sides), and the canvas margins already HOLD zeros — the fwd
    # kernels zero their output margin rows, out-of-image lanes compute to
    # 0/EPS = 0, and the canvas builders pad with zeros — so the refresh is
    # a no-op there.  On the 1×1-mesh probe this was ~0.5 ms/step of
    # whole-canvas dynamic_update_slice copies plus their transposes.
    rdim, cdim = x.ndim - 2, x.ndim - 1
    if lax.axis_size(axes[0]) > 1:
        from_n = lax.ppermute(
            lax.slice_in_dim(x, Mr + th - w, Mr + th, axis=rdim),
            axes[0], _axis_shift_perm(axes[0], 1))
        from_s = lax.ppermute(lax.slice_in_dim(x, Mr, Mr + w, axis=rdim),
                              axes[0], _axis_shift_perm(axes[0], -1))
        x = upd(upd(x, from_n, Mr - w, rdim), from_s, Mr + th, rdim)
    if lax.axis_size(axes[1]) > 1:
        from_w = lax.ppermute(
            lax.slice_in_dim(x, Ml + tw - w, Ml + tw, axis=cdim),
            axes[1], _axis_shift_perm(axes[1], 1))
        from_e = lax.ppermute(lax.slice_in_dim(x, Ml, Ml + w, axis=cdim),
                              axes[1], _axis_shift_perm(axes[1], -1))
        x = upd(upd(x, from_w, Ml - w, cdim), from_e, Ml + tw, cdim)
    return x


def _refresh_margins(x, M: int, th: int, tw: int, w: int,
                     axes: Tuple[str, str] = ("y", "x")):
    """Symmetric-margin refresh (see :func:`_refresh_margins_rl`)."""
    return _refresh_margins_rl(x, M, M, th, tw, w, axes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def atrous_canvas_level_tile(cC, vC, normalC, depthC, zgrad_cb, isd2_cb,
                             sden_t, origin, level: int, params: SVGFParams,
                             geo: Tuple[int, int, int, int, int],
                             bounds: Tuple[int, int], interpret: bool = False,
                             fast_weights: bool = False,
                             bwd_impl: str = "recompute"):
    """One à-trous level, tile canvas in / tile canvas out (call inside
    shard_map).  ``geo = (M, th, tw, TH, TH_b)`` with ``M`` the canvas
    margin; ``origin`` the tile's global (row0, col0).  Margins must hold
    >= h-wide valid neighbor data (``_refresh_margins``).  Detached-weight
    semantics.

    ``bwd_impl="recompute"``: the adjoint runs the per-level recompute
    kernel over the h-haloed crop and embeds the haloed input gradients
    back into canvas coordinates.  ``bwd_impl="stored"`` (the sharded
    training fast path, VERDICT r3 next-step #1): the forward emits bf16
    stored-weight canvases (σ-denominator fused in-kernel; pass
    ``isd2_cb=None``/``sden_t=None``) and the adjoint is the FMA-only
    margin-writing stored kernel — it writes the ±(M/2)-row/lane gradient
    margins directly into the output canvases, so there is no per-level
    crop/pad recompute at all; requires the double-width canvas margin
    ``M = 2·_chain_margin(params)`` so staging offsets stay non-negative.
    Either way the sweep's margin-refresh transposes route the margin
    gradients over ICI to the owning neighbors."""
    out, _res = _canvas_level_fwd(cC, vC, normalC, depthC, zgrad_cb, isd2_cb,
                                  sden_t, origin, level, params, geo, bounds,
                                  interpret, fast_weights, bwd_impl)
    return out


def _canvas_level_fwd(cC, vC, normalC, depthC, zgrad_cb, isd2_cb, sden_t,
                      origin, level, params, geo, bounds, interpret,
                      fast_weights, bwd_impl):
    from ..ops.pallas.atrous_tpu import atrous_level_fwd_canvas

    M, th, tw, TH, TH_b = geo
    ry, cx = origin
    luma_only = (params.luma_only_from is not None
                 and level >= params.luma_only_from)
    outs = atrous_level_fwd_canvas(
        cC, vC, normalC, depthC, zgrad_cb, isd2_cb,
        level=level, params=params, TH=TH, margin=M, bounds=bounds,
        interpret=interpret, origin=(ry, cx - M), fast_weights=fast_weights,
        save_w_dtype=jnp.bfloat16 if bwd_impl == "stored" else None,
        luma_only=luma_only)
    cC2, vC2, nC = outs[:3]
    if bwd_impl == "stored":
        res = (outs[3], nC, origin)
    elif bwd_impl == "none":
        res = (origin,)   # inference-only: no residuals
    else:
        res = (cC, normalC, depthC, zgrad_cb, sden_t, nC, origin)
    return (cC2, vC2), res


def _canvas_level_bwd(level, params, geo, bounds, interpret, fast_weights,
                      bwd_impl, res, g):
    if bwd_impl == "none":
        raise RuntimeError("sharded spatial bwd_impl='none' is "
                           "inference-only; use 'stored' for training")
    gcC, gvC = g
    M, th, tw, TH, TH_b = geo
    zero = jnp.zeros_like

    if bwd_impl == "stored":
        from ..ops.pallas.atrous_tpu import atrous_level_bwd_stored_canvas

        wC, nC, origin = res
        # margin-writing stored adjoint: gradients for the exchanged halo
        # rows/lanes land in the canvas margins (out_halo = M/2 — the chain
        # margin; M is the doubled canvas margin)
        dcC, dvC = atrous_level_bwd_stored_canvas(
            wC, nC, gcC, gvC, level=level, params=params, TH=TH_b,
            margin=M, bounds=bounds, interpret=interpret, out_halo=M // 2)
        d_org = jax.tree.map(
            lambda x: np.zeros(jnp.shape(x), jax.dtypes.float0), origin)
        CH, Wp = gvC.shape
        dzg = jnp.zeros((2, CH - 2 * M, Wp), gvC.dtype)
        return (dcC, dvC, zero(gcC), zero(gvC), dzg, None, None, d_org)

    from ..ops.pallas.atrous_tpu import atrous_level_bwd_pallas

    # the recompute adjoint re-derives FULL edge-stopping weights; luma-only
    # levels must take the weight-agnostic stored branch above
    assert (params.luma_only_from is None
            or level < params.luma_only_from), "luma_only needs bwd 'stored'"
    cC, normalC, depthC, zgrad_cb, sden_t, nC, origin = res
    h = params.radius << level
    ry, cx = origin
    rs, re = M - h, M + th + h
    cs, ce = M - h, M + tw + h
    color_p = cC[:, rs:re, cs:ce]
    normal_p = normalC[:, rs:re, cs:ce]
    depth_p = depthC[rs:re, cs:ce]
    n_p = nC[rs:re, cs:ce]
    zgrad_t = zgrad_cb[:, :th, M:M + tw]
    ring2 = [(0, 0), (h, h), (h, h)]
    zgrad_p = jnp.pad(zgrad_t, ring2)
    sden_p = jnp.pad(sden_t, [(h, h), (h, h)])
    gc_p = jnp.pad(gcC[:, M:M + th, M:M + tw], ring2)
    gv_p = jnp.pad(gvC[M:M + th, M:M + tw], [(h, h), (h, h)])
    dcol, dvar = atrous_level_bwd_pallas(
        color_p, normal_p, depth_p, zgrad_p, sden_p, n_p, gc_p, gv_p,
        level=level, params=params, interpret=interpret,
        origin=(ry - h, cx - h), bounds=bounds)
    dcC = lax.dynamic_update_slice(jnp.zeros_like(cC), dcol, (0, rs, cs))
    dvC = lax.dynamic_update_slice(jnp.zeros_like(gvC), dvar, (rs, cs))
    d_org = jax.tree.map(
        lambda x: np.zeros(jnp.shape(x), jax.dtypes.float0), origin)
    return (dcC, dvC, zero(normalC), zero(depthC), zero(zgrad_cb),
            zero(zgrad_cb[0]), zero(sden_t), d_org)


atrous_canvas_level_tile.defvjp(_canvas_level_fwd, _canvas_level_bwd)


def svgf_spatial_chained_local(
    color, variance, normal, depth,
    Hg: int, Wg: int,
    *, params: SVGFParams, return_feedback: bool = False,
    interpret: bool = False, tile_rows: int = None,
    weight_math: str = "exact", bwd_impl: str = "recompute",
):
    """Canvas-chained multi-level à-trous on local tiles (call inside
    shard_map): same results as ``svgf_spatial_local(impl="pallas")`` with
    the per-level pad/crop/re-exchange copies replaced by one M-margin
    canvas build + h-wide ICI margin refreshes between levels.

    ``weight_math="fast"`` (inference-grade, ~1.4e-4 weight rel err) applies
    to the forward only; the recompute adjoint re-derives exact weights, so
    gradients under "fast" carry the same small weight mismatch.

    ``bwd_impl="stored"`` (VERDICT r3 next-step #1, the sharded training
    fast path): the forward emits bf16 stored-weight canvases with the
    σ-denominator fused in-kernel, and the adjoint is the FMA-only
    margin-writing stored kernel — no per-level crop/pad recompute.  The
    canvases carry a doubled (2M) margin so the adjoint's staging offsets
    stay non-negative while it writes the ±M gradient margins the refresh
    transposes route over ICI.  Gradients carry the forward's bf16 weight
    quantization (≤0.1% relative, as in the unsharded chain)."""
    from ..ops.pallas.atrous_tpu import (_chain_margin, _chain_tiles,
                                         _round_up, _LOG2E)

    stored = bwd_impl == "stored"
    infer = bwd_impl == "none"
    if params.luma_only_from is not None and not (stored or infer):
        # the stored adjoint is weight-agnostic so the luma-only mode needs
        # no backward changes; the recompute adjoint re-derives FULL weights
        # and would not match a luma-only forward (round-5 verdict #1)
        raise ValueError(
            "luma_only_from on the sharded chained path requires "
            "bwd_impl='stored' (or the inference-only 'none')")
    th, tw = depth.shape
    ry, cx = tile_origin((th, tw))
    M = _chain_margin(params)
    Mc = 2 * M if stored else M          # canvas margin
    Wp = _round_up(tw + 2 * Mc, 128)
    TH, TH_b, th_pad = _chain_tiles(
        th, Wp, params, tile_rows,
        "recompute" if infer else bwd_impl,
        bwd_extra=M if stored else 0)
    geo = (Mc, th, tw, TH, TH_b)
    bounds = (Hg, Wg)
    origin = (ry, cx)
    ext = Mc - M  # extra zero margin beyond the exchanged halo

    def canv(x):
        xp = exchange_halo2d(x, M)
        pad = [(0, 0)] * (x.ndim - 2) + [(ext, th_pad - th + ext),
                                         (ext, Wp - tw - 2 * M - ext)]
        return jnp.pad(xp, pad)

    def embed_cb(x):
        pad = [(0, 0)] * (x.ndim - 2) + [(0, th_pad - th), (Mc, Wp - tw - Mc)]
        return jnp.pad(x, pad)

    cC, vC = canv(color), canv(variance)
    normalC, depthC = canv(normal), canv(depth)
    zgrad = _zgrad_local(depth, ry, cx, Hg, Wg)
    zgrad_cb = embed_cb(zgrad)

    feedback = color
    for lvl in range(params.iterations):
        h = params.radius << lvl
        if lvl > 0:
            cC = _refresh_margins(cC, Mc, th, tw, h)
            vC = _refresh_margins(vC, Mc, th, tw, h)
        if stored or infer:
            # σ-denominator fused into the fwd kernel (global-coordinate
            # masks via origin) — no XLA blur pass, no extra exchange
            sden = isd2_cb = None
        else:
            v_ctr = lax.stop_gradient(vC[Mc:Mc + th, Mc:Mc + tw])
            sden = params.sigma_color * jnp.sqrt(jnp.maximum(
                _variance_blur3x3_local(v_ctr, ry, cx, Hg, Wg), 0.0)) + _EPS
            isd2_cb = embed_cb(_LOG2E / jnp.maximum(sden, _EPS))
        cC, vC = atrous_canvas_level_tile(
            cC, vC, normalC, depthC, zgrad_cb, isd2_cb, sden, origin,
            lvl, params, geo, bounds, interpret, weight_math == "fast",
            bwd_impl)
        if lvl + 1 == params.feedback_level:
            feedback = cC[:, Mc:Mc + th, Mc:Mc + tw]
    c = cC[:, Mc:Mc + th, Mc:Mc + tw]
    v = vC[Mc:Mc + th, Mc:Mc + tw]
    if return_feedback:
        return c, v, feedback
    return c, v


@functools.partial(jax.jit, static_argnames=("mesh", "params",
                                              "return_feedback", "impl",
                                              "interpret", "bwd_impl"))
def svgf_spatial_sharded(
    color, variance, normal, depth,
    *, mesh: Mesh, params: SVGFParams = SVGFParams(),
    return_feedback: bool = False, impl: str = "oracle",
    interpret: bool = False, bwd_impl: str = "auto",
):
    """Sharded multi-level à-trous sweep over mesh axes ('y', 'x').

    Non-divisible global shapes are handled by pad-and-mask (VERDICT r3
    weak #3): the image is zero-padded up to mesh-divisible tiles, the
    kernels' global-coordinate masks (which always test the TRUE bounds)
    drop every tap beyond the real border exactly like the reference's
    ``inRange`` guard, and the padding is cropped off the outputs — so
    results are identical to the divisible case.
    """
    Hg, Wg = depth.shape
    ny = mesh.shape["y"]
    nx = mesh.shape["x"]
    Hp = -(-Hg // ny) * ny
    Wpad = -(-Wg // nx) * nx

    def pad(x):
        if Hp == Hg and Wpad == Wg:
            return x
        p = [(0, 0)] * (x.ndim - 2) + [(0, Hp - Hg), (0, Wpad - Wg)]
        return jnp.pad(x, p)

    fn = functools.partial(svgf_spatial_local, Hg=Hg, Wg=Wg, params=params,
                           return_feedback=return_feedback, impl=impl,
                           interpret=interpret, bwd_impl=bwd_impl)
    out_specs = (PLANES, PLANE, PLANES) if return_feedback else (PLANES, PLANE)
    outs = shard_map(
        fn, mesh=mesh,
        in_specs=(PLANES, PLANE, PLANES, PLANE),
        out_specs=out_specs,
        check_vma=False,
    )(pad(color), pad(variance), pad(normal), pad(depth))
    if Hp == Hg and Wpad == Wg:
        return outs
    return tuple(o[..., :Hg, :Wg] for o in outs)


# ---------------------------------------------------------------------------
# full pipeline: render -> temporal -> spatial, sharded end to end
# ---------------------------------------------------------------------------

def pipeline_local(
    scene, camera, prev_camera, history: History, key,
    Hg: int, Wg: int,
    *, cam_cfg: CameraParams, rm_params: RaymarchParams,
    svgf_params: SVGFParams, spp: int = 1, demod: bool = True,
    impl: str = "oracle", temporal_impl: str = "auto",
    interpret: bool = False, weight_math: str = "exact",
    normal_impl: str = "xla", spatial_bwd_impl: str = "auto",
    motion_grad: bool = True,
):
    """Per-device frame pipeline (call inside shard_map).

    The raymarch is embarrassingly parallel (each device renders its own
    pixel window); temporal + spatial use ICI halo exchange.
    ``impl="pallas"`` routes the raymarch and the à-trous levels through
    the TPU kernels (banded march + tile band kernels).
    ``temporal_impl``: "auto" follows ``impl`` (the fused temporal band
    kernel on the inference path); training steps pass "pallas_ad" (the
    differentiable tent-gather kernel) or "oracle" explicitly — the fused
    inference kernel has no VJP (models/svgf.py convention).
    """
    if temporal_impl == "auto":
        temporal_impl = impl
    if spatial_bwd_impl == "auto":
        if impl == "pallas" and temporal_impl in ("pallas", "pallas_canvas"):
            # fused (no-VJP) temporal step => the frame is gradient-free:
            # run the weight-canvas-free inference forward (round 5)
            spatial_bwd_impl = "none"
        elif (impl == "pallas"
              and svgf_params.luma_only_from is not None):
            # luma-only levels need the weight-agnostic stored adjoint
            spatial_bwd_impl = "stored"
        else:
            spatial_bwd_impl = "recompute"
    from ..ops.raymarch import render_gbuffer_window
    from ..models.svgf import demodulate, remodulate

    ny = lax.axis_size("y")
    nx = lax.axis_size("x")
    th, tw = Hg // ny, Wg // nx
    ry, cx = tile_origin((th, tw))
    dev = lax.axis_index("y") * nx + lax.axis_index("x")
    key = jax.random.fold_in(key, dev)

    gbuf = render_gbuffer_window(
        scene, camera, prev_camera, key, ry, cx, th, tw,
        cam_cfg=cam_cfg, params=rm_params, spp=spp,
        impl="pallas" if impl == "pallas" else "jnp", interpret=interpret,
        normal_impl=normal_impl if impl == "pallas" else "xla",
    )

    work = gbuf.replace(render=demodulate(gbuf.render, gbuf.albedo)) if demod else gbuf
    canvas = temporal_impl in ("pallas_ad_canvas", "pallas_canvas")
    if temporal_impl == "pallas_canvas":
        # history is the (10, CH+th_pad+CH, Wpc) canvas carry; fused
        # inference kernel (no VJP)
        integrated, variance, new_history = (
            temporal_accumulate_canvas_fused_local(
                work, history, Hg, Wg, params=svgf_params,
                interpret=interpret))
    elif canvas:
        # history is the (10, CH+th_pad+CH, Wpc) canvas carry
        integrated, variance, new_history = temporal_accumulate_canvas_local(
            work, history, Hg, Wg, params=svgf_params, interpret=interpret,
            motion_grad=motion_grad)
    else:
        integrated, variance, new_history = temporal_accumulate_local(
            work, history, Hg, Wg, params=svgf_params, impl=temporal_impl,
            interpret=interpret, motion_grad=motion_grad)
    filtered, _v, feedback = svgf_spatial_local(
        integrated, variance, gbuf.normal, gbuf.depth, Hg, Wg,
        params=svgf_params, return_feedback=True, impl=impl,
        interpret=interpret, weight_math=weight_math,
        bwd_impl=spatial_bwd_impl)
    if canvas:
        # SVGF's feedback plane replaces the history color: DUS into the
        # canvas's center color planes (margins stay stale until the next
        # frame's refresh)
        from ..ops.pallas.temporal_tpu import hist_canvas_geometry

        mh, CH, CLm = hist_canvas_geometry(th, tw, svgf_params)[:3]
        new_history = lax.dynamic_update_slice(
            new_history, feedback, (0, CH, CLm))
    else:
        new_history = new_history.replace(color=feedback)
    denoised = remodulate(filtered, gbuf.albedo) if demod else filtered
    return gbuf.replace(denoised=denoised), new_history


def _check_history_carry(history, temporal_impl: str):
    """Targeted error for the History-pytree vs margin-canvas carry mismatch
    (ADVICE r4): the canvas temporal paths carry history as a (10, CH+th_pad+
    CH, Wpc) array, so a ``History`` pytree would otherwise die as an opaque
    shard_map in_specs structure mismatch."""
    canvas = temporal_impl in ("pallas_canvas", "pallas_ad_canvas")
    if canvas and isinstance(history, History):
        raise TypeError(
            f"temporal_impl={temporal_impl!r} carries the temporal history "
            f"as a margin CANVAS array, but a History pytree was passed — "
            f"build the carry with init_history_canvas(mesh, Hg, Wg, params)")
    if not canvas and not isinstance(history, History):
        raise TypeError(
            f"temporal_impl={temporal_impl!r} expects a History pytree "
            f"carry, got {type(history).__name__} — use History.zeros(H, W) "
            f"(init_history_canvas is for the canvas-form kernel paths)")


def make_sharded_pipeline(
    mesh: Mesh, Hg: int, Wg: int,
    *, cam_cfg: CameraParams, rm_params: RaymarchParams,
    svgf_params: SVGFParams, spp: int = 1,
    impl: str = "oracle", temporal_impl: str = "auto",
    interpret: bool = False, weight_math: str = "exact",
    normal_impl: str = "auto",
):
    """Build a jitted sharded (render + denoise) frame function.

    Scene/cameras/key are replicated; G-buffer planes and history are
    sharded P('y','x') on their trailing two axes.

    ``temporal_impl="auto"`` on the kernel path selects the canvas-form
    fused temporal step (``"pallas_canvas"``): the history carry is the
    margin canvas from :func:`init_history_canvas`, and per-frame ICI
    traffic drops to the mh-wide margin strips + a 3-wide render exchange.
    Pass ``"pallas"`` for the full-exchange tile path (A/B measurement).
    """
    if temporal_impl == "auto":
        temporal_impl = "pallas_canvas" if impl == "pallas" else impl
    gb_specs = GBuffer(render=PLANES, albedo=PLANES, normal=PLANES,
                       depth=PLANE, motion=PLANES, denoised=PLANES)
    if temporal_impl in ("pallas_canvas", "pallas_ad_canvas"):
        hist_specs = P(None, "y", "x")
    else:
        hist_specs = History(color=PLANES, moments=PLANES, length=PLANE,
                             prev_depth=PLANE, prev_normal=PLANES)

    fn = functools.partial(
        pipeline_local, Hg=Hg, Wg=Wg, cam_cfg=cam_cfg,
        rm_params=rm_params, svgf_params=svgf_params, spp=spp,
        impl=impl, temporal_impl=temporal_impl, interpret=interpret,
        weight_math=weight_math,
        normal_impl=("pallas" if (normal_impl == "auto" and impl == "pallas")
                     else normal_impl if normal_impl != "auto" else "xla"))

    sharded = shard_map(
        fn, mesh=mesh,
        in_specs=(REPL, REPL, REPL, hist_specs, REPL),
        out_specs=(gb_specs, hist_specs),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def run(scene, camera, prev_camera, history, key):
        _check_history_carry(history, temporal_impl)
        return jitted(scene, camera, prev_camera, history, key)

    return run


def make_sharded_train_step(
    mesh: Mesh, base_scene, camera, target, optimizer,
    *, cam_cfg: CameraParams, rm_params: RaymarchParams,
    svgf_params: SVGFParams, impl: str = "oracle",
    temporal_impl: str = "auto", interpret: bool = False,
    spatial_bwd_impl: str = "auto",
):
    """Sharded version of models.pipeline.make_train_step: loss + grads of
    the material table with the image pipeline sharded over ('y','x') and —
    when the mesh has a non-trivial 'data' axis — Monte-Carlo samples
    data-parallel across it.

    The albedo table is replicated; shard_map transposes the replicated->
    sharded broadcast into a psum of per-device gradient contributions over
    ALL mesh axes — the gradient all-reduce over ICI (SURVEY.md §5 backend
    row).  With data parallelism, each 'data' slice renders the frame with
    an independent noise key and keeps its own temporal history (leading
    batch axis sharded P('data')); the loss is the pmean of the slice
    losses, so the material gradient averages over ``data_size`` independent
    MC estimates per step.

    ``temporal_impl="auto"`` picks the canvas-form differentiable temporal
    kernel (``"pallas_ad_canvas"``) whenever the spatial path runs kernels —
    the history carry is then the margin-canvas from
    :func:`init_history_canvas` (only mh-wide margins exchanged per frame)
    — else the jnp oracle with a standard History carry; both are
    end-to-end differentiable inside shard_map.  ``"pallas_ad"`` keeps the
    full-exchange kernel path with a standard History (A/B measurement).

    ``spatial_bwd_impl="auto"`` selects the margin-writing stored-weight
    canvas adjoint (``"stored"``) on the kernel path — the VERDICT r3 #1
    fix for the measured +54% single-chip sharded training overhead — and
    the oracle's autodiff otherwise; ``"recompute"`` keeps the per-level
    crop/pad recompute adjoint (A/B measurement).
    """
    if temporal_impl == "auto":
        temporal_impl = "pallas_ad_canvas" if impl == "pallas" else "oracle"
    if spatial_bwd_impl == "auto":
        spatial_bwd_impl = "stored" if impl == "pallas" else "recompute"
    nd = dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 1)
    if temporal_impl == "pallas_ad_canvas":
        hist_specs = (P("data", None, "y", "x") if nd > 1
                      else P(None, "y", "x"))
    elif nd > 1:
        hist_specs = History(
            color=P("data", None, "y", "x"),
            moments=P("data", None, "y", "x"),
            length=P("data", "y", "x"),
            prev_depth=P("data", "y", "x"),
            prev_normal=P("data", None, "y", "x"))
    else:
        hist_specs = History(color=PLANES, moments=PLANES, length=PLANE,
                             prev_depth=PLANE, prev_normal=PLANES)

    def local_loss(albedo, history, key, target_tile):
        scene = base_scene.replace(
            materials=base_scene.materials.replace(albedo=albedo))
        if nd > 1:
            history = jax.tree.map(lambda x: x[0], history)
            key = jax.random.fold_in(key, lax.axis_index("data"))
        out, new_hist = pipeline_local(
            scene, camera, None, history, key,
            target.shape[-2], target.shape[-1],
            cam_cfg=cam_cfg, rm_params=rm_params, svgf_params=svgf_params,
            impl=impl, temporal_impl=temporal_impl, interpret=interpret,
            spatial_bwd_impl=spatial_bwd_impl,
            # material-only optimization: motion gradient provably dead ->
            # dh-only temporal adjoint (exact, ~half the adjoint cost)
            motion_grad=False,
            # the fused march+normal kernel is differentiable (round 4) on
            # the UN-seeded path only (ADVICE r4): training also saves the
            # XLA sdf_normal forward pass unless the config cone-seeds
            normal_impl=("pallas" if impl == "pallas"
                         and not rm_params.coarse_seed else "xla"))
        # mean over the full image = psum of tile sums / global pixel count
        sse = jnp.sum((out.denoised - target_tile) ** 2)
        loss = lax.psum(lax.psum(sse, "y"), "x") / (3 * target.shape[-2] * target.shape[-1])
        if nd > 1:
            loss = lax.pmean(loss, "data")
            new_hist = jax.tree.map(lambda x: x[None], new_hist)
        return loss, new_hist

    sharded_loss = shard_map(
        local_loss, mesh=mesh,
        in_specs=(REPL, hist_specs, REPL, PLANES),
        out_specs=(REPL, hist_specs),
        check_vma=False,
    )

    @jax.jit
    def _train_step(albedo, opt_state, history, key):
        key, sub = jax.random.split(key)
        (loss, new_hist), grads = jax.value_and_grad(
            sharded_loss, has_aux=True)(albedo, history, sub, target)
        updates, opt_state = optimizer.update(grads, opt_state, albedo)
        import optax
        albedo = jnp.clip(optax.apply_updates(albedo, updates), 0.0, 1.0)
        return albedo, opt_state, new_hist, key, loss

    def train_step(albedo, opt_state, history, key):
        _check_history_carry(history, temporal_impl)
        return _train_step(albedo, opt_state, history, key)

    return train_step
