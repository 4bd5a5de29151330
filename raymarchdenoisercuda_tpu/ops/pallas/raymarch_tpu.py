"""Pallas TPU kernels for the SDF raymarcher (march + shadow rays).

The reference repo is *named* for a raymarcher it never implemented
(reference README.md:1-3; only the Cornell G-buffer PNGs it would have
produced exist, ``render/cornell/1/``).  ``ops/raymarch.py`` supplies the
differentiable jnp renderer; this module supplies the TPU kernels for its
two hot loops:

* :func:`raymarch_pallas` — the primary sphere-trace.  The jnp version runs
  ``max_steps`` lock-step iterations over the whole frame (every pixel pays
  for the slowest pixel of the *image*); here the frame is processed in row
  bands, each running a ``while_loop`` that exits as soon as **its own**
  pixels have all converged or escaped — wall pixels converge in ~10 steps,
  so most bands stop long before ``max_steps``.  The update rule is
  identical to the jnp oracle (inactive pixels never move), so results are
  bit-comparable: early exit changes *when* work stops, not what is
  computed.
* :func:`shadow_factor_pallas` — the area-light shadow march, same banding
  and early exit.

Gradients: :func:`raymarch_pallas` shares the implicit-function adjoint of
``ops.raymarch.raymarch`` (dt*/dθ = -f_θ/(∇f·rd) at the hit point — one XLA
SDF evaluation, no kernel needed).  The shadow factor is piecewise-constant
(a.e. zero gradient) and wrapped in stop_gradient like the oracle's.

Scene scalars travel as one flattened SMEM vector (the TPU analogue of the
reference's ``__constant__`` parameter memory, src/filter.cu:10); primitive
counts are static, so all SDF loops unroll with static SMEM indices.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import RaymarchParams


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def flatten_scene(scene) -> jax.Array:
    """Pack the Scene's primitive parameters into one flat f32 vector.

    Layout: [spheres (Ns,4) | boxes (Nb,6) | planes (Np,4) | sphere_mat (Ns)
    | box_mat (Nb) | plane_mat (Np)] — mats as f32 for a single dtype.
    """
    return jnp.concatenate([
        scene.sphere_params.reshape(-1).astype(jnp.float32),
        scene.box_params.reshape(-1).astype(jnp.float32),
        scene.plane_params.reshape(-1).astype(jnp.float32),
        scene.sphere_mat.astype(jnp.float32),
        scene.box_mat.astype(jnp.float32),
        scene.plane_mat.astype(jnp.float32),
    ])


def _make_sdf(sc, n_sph: int, n_box: int, n_pl: int, want_mat: bool):
    """Build a component-wise SDF evaluator over SMEM scalars ``sc``.

    Returns ``sdf(px, py, pz) -> d`` or ``-> (d, mat)``; the primitive loops
    unroll statically (the reference's extended_math helpers inlined)."""
    OB = n_sph * 4
    OP = OB + n_box * 6
    OM = OP + n_pl * 4

    def sdf(px, py, pz):
        d = None
        mat = None

        def take(di, mi):
            nonlocal d, mat
            if d is None:
                d = di
                if want_mat:
                    mat = jnp.full_like(di, mi)
            else:
                if want_mat:
                    mat = jnp.where(di < d, mi, mat)
                d = jnp.minimum(di, d)

        for i in range(n_sph):
            cx, cy, cz, r = (sc[4 * i], sc[4 * i + 1], sc[4 * i + 2],
                             sc[4 * i + 3])
            dx, dy, dz = px - cx, py - cy, pz - cz
            di = jnp.sqrt(dx * dx + dy * dy + dz * dz) - r
            take(di, sc[OM + i])
        for i in range(n_box):
            o = OB + 6 * i
            qx = jnp.abs(px - sc[o]) - sc[o + 3]
            qy = jnp.abs(py - sc[o + 1]) - sc[o + 4]
            qz = jnp.abs(pz - sc[o + 2]) - sc[o + 5]
            ox_ = jnp.maximum(qx, 0.0)
            oy_ = jnp.maximum(qy, 0.0)
            oz_ = jnp.maximum(qz, 0.0)
            outside = jnp.sqrt(ox_ * ox_ + oy_ * oy_ + oz_ * oz_)
            inside = jnp.minimum(jnp.maximum(qx, jnp.maximum(qy, qz)), 0.0)
            take(outside + inside, sc[OM + n_sph + i])
        for i in range(n_pl):
            o = OP + 4 * i
            di = sc[o] * px + sc[o + 1] * py + sc[o + 2] * pz + sc[o + 3]
            take(di, sc[OM + n_sph + n_box + i])

        return (d, mat) if want_mat else d

    return sdf


def _make_march_kernel(H, W, TH, TW, params: RaymarchParams,
                       n_sph, n_box, n_pl, seeded: bool = False,
                       emit_normals: bool = False):
    def kernel(sc_ref, *rest):
        if seeded:
            # per-band scalar seed rides in SMEM: one f32 per grid tile, no
            # full-res seed plane, no upsample, no extra DMA per tile
            seeds_ref = rest[0]
            rest = rest[1:]
        if emit_normals:
            (rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
             t_ref, hit_ref, mat_ref, nx_ref, ny_ref, nz_ref) = rest
        else:
            (rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
             t_ref, hit_ref, mat_ref) = rest
        sdf = _make_sdf(sc_ref, n_sph, n_box, n_pl, want_mat=True)
        sdf_d = _make_sdf(sc_ref, n_sph, n_box, n_pl, want_mat=False)
        by = pl.program_id(0)
        bx = pl.program_id(1)

        rox, roy, roz = rox_ref[:], roy_ref[:], roz_ref[:]
        rdx, rdy, rdz = rdx_ref[:], rdy_ref[:], rdz_ref[:]

        # pad pixels (beyond the true image) start escaped: keeps the
        # tile's early-exit predicate from waiting on garbage rays
        gy = by * TH + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
        gx = bx * TW + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1)
        is_pad = (gy >= H) | (gx >= W)
        start = seeds_ref[by, bx] if seeded else 0.0
        t0 = jnp.where(is_pad, params.max_dist, start)
        om = params.relax_omega

        if om <= 1.0:
            def cond(carry):
                i, _t, n_active = carry
                return (i < params.max_steps) & (n_active > 0.0)

            def body(carry):
                i, t, _n = carry
                d = sdf_d(rox + t * rdx, roy + t * rdy, roz + t * rdz)
                active = (d > params.hit_eps) & (t < params.max_dist)
                t = t + jnp.where(active, d, 0.0)
                return i + 1, t, jnp.sum(active.astype(jnp.float32))

            _i, t, _n = jax.lax.while_loop(
                cond, body, (jnp.int32(0), t0, jnp.float32(1.0)))
        else:
            # over-relaxed march with rollback — identical update rule to
            # ops.raymarch._raymarch_loop's relaxed branch
            def cond(carry):
                i, _t, _dp, _sp, n_active = carry
                return (i < params.max_steps) & (n_active > 0.0)

            def body(carry):
                i, t, d_prev, step_prev, _n = carry
                d = sdf_d(rox + t * rdx, roy + t * rdy, roz + t * rdz)
                fail = ((d + d_prev) < step_prev) & (step_prev > d_prev)
                active = (d > params.hit_eps) & (t < params.max_dist) & ~fail
                delta = jnp.where(fail, d_prev - step_prev,
                                  jnp.where(active, om * d, 0.0))
                new_step = jnp.where(fail, d_prev,
                                     jnp.where(active, om * d, step_prev))
                new_dp = jnp.where(active, d, d_prev)
                going = active | fail
                return (i + 1, t + delta, new_dp, new_step,
                        jnp.sum(going.astype(jnp.float32)))

            z = jnp.zeros((TH, TW), jnp.float32)
            _i, t, _dp, _sp, _n = jax.lax.while_loop(
                cond, body, (jnp.int32(0), t0, z, z, jnp.float32(1.0)))

        d_final, mat = sdf(rox + t * rdx, roy + t * rdy, roz + t * rdz)
        hit = (d_final <= params.hit_eps * 4.0) & (t < params.max_dist)
        t_ref[:] = t
        hit_ref[:] = hit.astype(jnp.float32)
        mat_ref[:] = mat

        if emit_normals:
            # central-difference SDF gradient at the hit point, normalized
            # and flipped toward the viewer — the in-kernel twin of
            # ops.raymarch.sdf_normal + the render path's flip (6 extra
            # SDF evals here vs a separate 1.85 ms XLA pass at 1080p)
            eps = params.normal_eps
            px, py, pz = rox + t * rdx, roy + t * rdy, roz + t * rdz
            nx = sdf_d(px + eps, py, pz) - sdf_d(px - eps, py, pz)
            ny = sdf_d(px, py + eps, pz) - sdf_d(px, py - eps, pz)
            nz = sdf_d(px, py, pz + eps) - sdf_d(px, py, pz - eps)
            norm = jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-8)
            inv = 1.0 / norm
            nx, ny, nz = nx * inv, ny * inv, nz * inv
            flip = (nx * rdx + ny * rdy + nz * rdz) > 0
            sgn = jnp.where(flip, -1.0, 1.0)
            nx_ref[:] = nx * sgn
            ny_ref[:] = ny * sgn
            nz_ref[:] = nz * sgn

    return kernel


def _make_cone_kernel(H, W, TH, TW, params: RaymarchParams,
                      n_sph, n_box, n_pl):
    """Coarse cone march: sphere-trace against the fattened distance
    d - (hit_eps + base + t*delta).  Maintains the invariant
    sdf(x(s)) >= hit_eps + base + s*delta along every marched segment, so
    the stop t is a skip-free seed for every ray within (base, delta) of
    this one (see RaymarchParams.coarse_seed)."""
    eps = params.hit_eps
    n_sc = n_sph * 5 + n_box * 7 + n_pl * 5   # flatten_scene length

    def kernel(sc_ref, rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
               t_ref):
        sdf_d = _make_sdf(sc_ref, n_sph, n_box, n_pl, want_mat=False)
        by = pl.program_id(0)
        bx = pl.program_id(1)
        rox, roy, roz = rox_ref[:], roy_ref[:], roz_ref[:]
        rdx, rdy, rdz = rdx_ref[:], rdy_ref[:], rdz_ref[:]
        # conservative cone geometry rides in SMEM after the scene scalars
        # (explicit static offsets: Mosaic SMEM refs don't wrap negatives)
        delta = sc_ref[n_sc]
        clear0 = eps + sc_ref[n_sc + 1]
        inv_g = 1.0 / (1.0 + delta)   # cone growth during the step

        gy = by * TH + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
        gx = bx * TW + jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1)
        is_pad = (gy >= H) | (gx >= W)
        t0 = jnp.where(is_pad, params.max_dist, 0.0)

        def cond(carry):
            i, _t, n_active = carry
            return (i < params.max_steps) & (n_active > 0.0)

        def body(carry):
            i, t, _n = carry
            d = sdf_d(rox + t * rdx, roy + t * rdy, roz + t * rdz)
            margin = d - clear0 - t * delta
            active = (margin > 0.0) & (t < params.max_dist)
            t = t + jnp.where(active, margin * inv_g, 0.0)
            return i + 1, t, jnp.sum(active.astype(jnp.float32))

        _i, t, _n = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t0, jnp.float32(1.0)))
        t_ref[:] = t

    return kernel


# Pre-march block edge: one cone per BxB pixel block.  Measured on v5e at
# 1080p Cornell: B=4 and B=8 tie (~1.3 ms vs ~1.5 ms unseeded, interleaved
# in one process; best-epoch pairs 0.93 vs 1.68); B=2's pre-pass costs more
# than it saves.  B=4 keeps the tighter cone (smaller delta -> seeds stop
# closer to the surface), so it is the default.
_SEED_BLOCK = 4


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def _cone_seed_coarse(scene, ro, rd, params: RaymarchParams, interpret=False):
    """Coarse conservative seed grid for the full-res march.

    Averages each BxB pixel block's ray into one cone (apex ro_avg, axis
    rd_avg) and cone-marches the coarse grid; the cone half-width delta and
    apex spread base are *global scalar* maxima of the per-block deviations
    (|rd_i - rd_avg|, |ro_i - ro_avg|) — scalars ride in SMEM with the scene
    constants, so the kernel stages only the six coarse ray planes.
    Deviations are computed in the natural (3, H, W) layout against the
    nearest-upsampled block means (the blocked layout defeats XLA fusion).

    Returns the PADDED coarse stop-distance grid (pad cells = max_dist,
    i.e. escaped) plus its tile-grid shape — callers reduce or upsample."""
    B = _SEED_BLOCK
    H, W = ro.shape[-2:]
    Hc, Wc = -(-H // B), -(-W // B)
    # edge-replicate so border blocks average real rays only
    rop = jnp.pad(ro, ((0, 0), (0, B * Hc - H), (0, B * Wc - W)), mode="edge")
    rdp = jnp.pad(rd, ((0, 0), (0, B * Hc - H), (0, B * Wc - W)), mode="edge")
    ro_avg = rop.reshape(3, Hc, B, Wc, B).mean(axis=(2, 4))
    rd_sum = rdp.reshape(3, Hc, B, Wc, B).sum(axis=(2, 4))
    rd_avg = rd_sum / jnp.maximum(
        jnp.sqrt(jnp.sum(rd_sum * rd_sum, axis=0, keepdims=True)), 1e-8)

    def up(x):
        return jnp.repeat(jnp.repeat(x, B, axis=-2), B, axis=-1)

    def dev(full, center_coarse):
        d2 = jnp.sum((full - up(center_coarse)) ** 2, axis=0)
        return jnp.sqrt(jnp.max(d2))     # global scalar max

    delta = dev(rdp, rd_avg)
    base = dev(rop, ro_avg)

    TW = min(_TW, _round_up(Wc, 128))
    Wp = _round_up(Wc, TW)
    TH = min(_TH, _round_up(Hc, 8))
    H_pad = _round_up(Hc, TH)
    grid = (H_pad // TH, Wp // TW)
    kernel = _make_cone_kernel(Hc, Wc, TH, TW, params,
                               scene.sphere_params.shape[0],
                               scene.box_params.shape[0],
                               scene.plane_params.shape[0])
    roa = _pad2(ro_avg, H_pad, Wp)
    rda = _pad2(rd_avg, H_pad, Wp)
    sc = jnp.concatenate([flatten_scene(scene), delta[None], base[None]])
    t_c = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + _tile_specs(TH, TW, 6),
        out_specs=_tile_specs(TH, TW, 1)[0],
        out_shape=jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32),
        interpret=interpret,
    )(sc, roa[0], roa[1], roa[2], rda[0], rda[1], rda[2])
    return t_c


def _rays_at_pixels(camera, cfg, rows, cols):
    """Normalized rays through (possibly fractional) GLOBAL pixel indices
    ``rows`` (n,) x ``cols`` (m,) -> (3, n, m)."""
    from ..raymarch import camera_basis, _normalize

    fwd, right, up, half_w, half_h = camera_basis(camera, cfg)
    ys = (0.5 - (rows + 0.5) / cfg.height) * 2 * half_h
    xs = ((cols + 0.5) / cfg.width - 0.5) * 2 * half_w
    dirs = (fwd[:, None, None] + up[:, None, None] * ys[None, :, None]
            + right[:, None, None] * xs[None, None, :])
    return _normalize(dirs)


@functools.partial(jax.jit, static_argnames=("cfg", "th", "tw", "params",
                                              "interpret"))
def _cone_seed_coarse_analytic(scene, camera, cfg, row0, col0, th: int,
                               tw: int, params: RaymarchParams,
                               interpret=False):
    """Analytic coarse cone grid for a pinhole-camera pixel window: block
    CENTER rays are generated directly from the camera at coarse resolution
    (no full-res ray planes, no blocked reshape reductions — the ~1.1 ms of
    XLA glue that made the plane-based seed a wash in-pipeline, ROADMAP).

    base = 0 exactly (one pinhole origin); the cone half-width delta is the
    global max deviation of the blocks' corner-PIXEL rays from their center
    ray — ray direction deviation grows monotonically with screen offset,
    so the 4 corner pixels attain each block's max (validated against the
    plane-based deviation in tests)."""
    B = _SEED_BLOCK
    Hc, Wc = -(-th // B), -(-tw // B)
    c = (B - 1) / 2.0
    rows = jnp.asarray(row0, jnp.float32) + jnp.arange(
        Hc, dtype=jnp.float32) * B + c
    cols = jnp.asarray(col0, jnp.float32) + jnp.arange(
        Wc, dtype=jnp.float32) * B + c
    rd_c = _rays_at_pixels(camera, cfg, rows, cols)
    delta = jnp.float32(0.0)
    for dy in (-c, c):
        for dx in (-c, c):
            rr = _rays_at_pixels(camera, cfg, rows + dy, cols + dx)
            dev2 = jnp.sum((rr - rd_c) ** 2, axis=0)
            delta = jnp.maximum(delta, jnp.sqrt(jnp.max(dev2)))
    base = jnp.float32(0.0)
    ro_c = jnp.broadcast_to(camera.position[:, None, None], rd_c.shape)

    TW = min(_TW, _round_up(Wc, 128))
    Wp = _round_up(Wc, TW)
    TH = min(_TH, _round_up(Hc, 8))
    H_pad = _round_up(Hc, TH)
    grid = (H_pad // TH, Wp // TW)
    kernel = _make_cone_kernel(Hc, Wc, TH, TW, params,
                               scene.sphere_params.shape[0],
                               scene.box_params.shape[0],
                               scene.plane_params.shape[0])
    roa = _pad2(ro_c, H_pad, Wp)
    rda = _pad2(rd_c, H_pad, Wp)
    sc = jnp.concatenate([flatten_scene(scene), delta[None], base[None]])
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + _tile_specs(TH, TW, 6),
        out_specs=_tile_specs(TH, TW, 1)[0],
        out_shape=jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32),
        interpret=interpret,
    )(sc, roa[0], roa[1], roa[2], rda[0], rda[1], rda[2])


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def _cone_seed(scene, ro, rd, params: RaymarchParams, interpret=False):
    """Full-res per-pixel seed plane (nearest-upsampled coarse cone stops).
    Used by the conservativeness tests; the production march consumes the
    cheaper per-band reduction instead (see ``_march_call``)."""
    B = _SEED_BLOCK
    H, W = ro.shape[-2:]
    Hc, Wc = -(-H // B), -(-W // B)
    t_c = _cone_seed_coarse(scene, ro, rd, params, interpret)[:Hc, :Wc]
    return jnp.repeat(jnp.repeat(t_c, B, axis=0), B, axis=1)[:H, :W]


def _make_shadow_kernel(H, W, TH, TW, params: RaymarchParams,
                        n_sph, n_box, n_pl):
    min_step = 0.01

    def kernel(sc_ref, ox_ref, oy_ref, oz_ref, ldx_ref, ldy_ref, ldz_ref,
               dl_ref, vis_ref):
        sdf_d = _make_sdf(sc_ref, n_sph, n_box, n_pl, want_mat=False)
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        ldx, ldy, ldz = ldx_ref[:], ldy_ref[:], ldz_ref[:]
        dist_l = dl_ref[:]  # zero in pad regions -> immediately inactive

        om = params.relax_omega
        if om <= 1.0:
            def cond(carry):
                i, _t, n_active = carry
                return (i < params.shadow_steps) & (n_active > 0.0)

            def body(carry):
                i, t, _n = carry
                d = sdf_d(ox + t * ldx, oy + t * ldy, oz + t * ldz)
                active = (d > params.hit_eps) & (t < dist_l - 0.02)
                t = t + jnp.where(active, jnp.maximum(d, min_step), 0.0)
                return i + 1, t, jnp.sum(active.astype(jnp.float32))

            _i, t, _n = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), jnp.zeros((TH, TW), jnp.float32),
                 jnp.float32(1.0)))
        else:
            # relaxed shadow march — identical rule to
            # ops.raymarch._shadow_factor's relaxed branch
            def cond(carry):
                i, _t, _dp, _sp, n_active = carry
                return (i < params.shadow_steps) & (n_active > 0.0)

            def body(carry):
                i, t, d_prev, step_prev, _n = carry
                d = sdf_d(ox + t * ldx, oy + t * ldy, oz + t * ldz)
                cons = jnp.maximum(d_prev, min_step)
                fail = ((d + d_prev) < step_prev) & (step_prev > cons)
                active = (d > params.hit_eps) & (t < dist_l - 0.02) & ~fail
                step = jnp.maximum(om * d, min_step)
                delta = jnp.where(fail, cons - step_prev,
                                  jnp.where(active, step, 0.0))
                new_step = jnp.where(fail, cons,
                                     jnp.where(active, step, step_prev))
                new_dp = jnp.where(active, d, d_prev)
                going = active | fail
                return (i + 1, t + delta, new_dp, new_step,
                        jnp.sum(going.astype(jnp.float32)))

            z = jnp.zeros((TH, TW), jnp.float32)
            _i, t, _dp, _sp, _n = jax.lax.while_loop(
                cond, body, (jnp.int32(0), z, z, z, jnp.float32(1.0)))

        vis_ref[:] = (t >= dist_l - 0.03).astype(jnp.float32)

    return kernel


def _make_shadow_shade_kernel(H, W, TH, TW, params: RaymarchParams,
                              n_sph, n_box, n_pl, has_prev: bool,
                              cam_w: int, cam_h: int):
    """Shadow march + full shading epilogue in one pass (VERDICT r3
    next-step #5): the kernel derives the shadow ray from (p, n, lp),
    runs the early-exit visibility march, then computes the direct-light
    geometry term, the shaded render, and (``has_prev``) the prev-camera
    motion reprojection — the ~1.2 ms of per-frame XLA glue
    (shading/motion) folded away.  Light constants and the previous
    camera's basis ride in SMEM after the scene scalars."""
    min_step = 0.01
    n_sc = n_sph * 5 + n_box * 7 + n_pl * 5   # flatten_scene length
    # SMEM extras layout after the scene scalars:
    # ln(3) rad(3) area | ppos(3) pfwd(3) pright(3) pup(3) phw phh row0 col0
    O = n_sc

    def kernel(sc_ref, px_ref, py_ref, pz_ref, nx_ref, ny_ref, nz_ref,
               lx_ref, ly_ref, lz_ref, alb_ref, em_ref, hit_ref,
               rend_ref, vis_ref, *mot_refs):
        sdf_d = _make_sdf(sc_ref, n_sph, n_box, n_pl, want_mat=False)
        px, py, pz = px_ref[:], py_ref[:], pz_ref[:]
        nx, ny, nz = nx_ref[:], ny_ref[:], nz_ref[:]
        lx, ly, lz = lx_ref[:], ly_ref[:], lz_ref[:]
        hit_f = hit_ref[:]

        # shadow-ray geometry (mirrors _shadow_factor: origin offset 0.02·n)
        ox = px + 0.02 * nx
        oy = py + 0.02 * ny
        oz = pz + 0.02 * nz
        tlx, tly, tlz = lx - ox, ly - oy, lz - oz
        dist_l = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
        inv_dl = 1.0 / jnp.maximum(dist_l, 1e-8)
        ldx, ldy, ldz = tlx * inv_dl, tly * inv_dl, tlz * inv_dl
        # pad pixels have zero p/lp -> dist_l tiny -> immediately inactive
        dist_l = jnp.where(hit_f > 0.5, dist_l, 0.0)

        om = params.relax_omega
        if om <= 1.0:
            def cond(carry):
                i, _t, n_active = carry
                return (i < params.shadow_steps) & (n_active > 0.0)

            def body(carry):
                i, t, _n = carry
                d = sdf_d(ox + t * ldx, oy + t * ldy, oz + t * ldz)
                active = (d > params.hit_eps) & (t < dist_l - 0.02)
                t = t + jnp.where(active, jnp.maximum(d, min_step), 0.0)
                return i + 1, t, jnp.sum(active.astype(jnp.float32))

            _i, t, _n = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), jnp.zeros((TH, TW), jnp.float32),
                 jnp.float32(1.0)))
        else:
            def cond(carry):
                i, _t, _dp, _sp, n_active = carry
                return (i < params.shadow_steps) & (n_active > 0.0)

            def body(carry):
                i, t, d_prev, step_prev, _n = carry
                d = sdf_d(ox + t * ldx, oy + t * ldy, oz + t * ldz)
                cons = jnp.maximum(d_prev, min_step)
                fail = ((d + d_prev) < step_prev) & (step_prev > cons)
                active = (d > params.hit_eps) & (t < dist_l - 0.02) & ~fail
                step = jnp.maximum(om * d, min_step)
                delta = jnp.where(fail, cons - step_prev,
                                  jnp.where(active, step, 0.0))
                new_step = jnp.where(fail, cons,
                                     jnp.where(active, step, step_prev))
                new_dp = jnp.where(active, d, d_prev)
                going = active | fail
                return (i + 1, t + delta, new_dp, new_step,
                        jnp.sum(going.astype(jnp.float32)))

            z = jnp.zeros((TH, TW), jnp.float32)
            _i, t, _dp, _sp, _n = jax.lax.while_loop(
                cond, body, (jnp.int32(0), z, z, z, jnp.float32(1.0)))

        vis = (t >= dist_l - 0.03).astype(jnp.float32)

        # shading geometry from p itself (the XLA path's one_sample math)
        sx, sy, sz = lx - px, ly - py, lz - pz
        dist2 = sx * sx + sy * sy + sz * sz
        inv_d = 1.0 / jnp.maximum(jnp.sqrt(dist2), 1e-8)
        sdx, sdy, sdz = sx * inv_d, sy * inv_d, sz * inv_d
        cos_s = jnp.maximum(nx * sdx + ny * sdy + nz * sdz, 0.0)
        cos_l = jnp.abs(sc_ref[O] * sdx + sc_ref[O + 1] * sdy
                        + sc_ref[O + 2] * sdz)
        area = sc_ref[O + 6]
        geom = cos_s * cos_l * area / jnp.maximum(dist2, 1e-4)
        shade = vis * geom
        inv_pi = 1.0 / 3.141592653589793
        alb = alb_ref[:]     # (3, TH, TW) hit-masked albedo
        em = em_ref[:]
        rend = jnp.stack([
            alb[c] * (sc_ref[O + 3 + c] * shade * inv_pi + 0.08) + em[c]
            for c in range(3)])
        rend_ref[:] = rend
        vis_ref[:] = vis

        if has_prev:
            mot_ref = mot_refs[0]
            rx = px - sc_ref[O + 7]
            ry = py - sc_ref[O + 8]
            rz = pz - sc_ref[O + 9]
            zc = sc_ref[O + 10] * rx + sc_ref[O + 11] * ry + sc_ref[O + 12] * rz
            # true division, NOT reciprocal-multiply: the reprojection must
            # round bit-identically to the XLA path — a ±1-ulp motion noise
            # at an exact-zero motion flips the temporal in_bounds test at
            # image borders (static camera), which is a visible 0.25 history
            # divergence, not a tolerance issue
            zs = jnp.maximum(zc, 1e-6)
            xc = (sc_ref[O + 13] * rx + sc_ref[O + 14] * ry
                  + sc_ref[O + 15] * rz) / zs
            yc = (sc_ref[O + 16] * rx + sc_ref[O + 17] * ry
                  + sc_ref[O + 18] * rz) / zs
            phw = sc_ref[O + 19]
            phh = sc_ref[O + 20]
            ppx = (xc / phw * 0.5 + 0.5) * cam_w - 0.5
            ppy = (0.5 - yc / phh * 0.5) * cam_h - 0.5
            by = pl.program_id(0)
            bx = pl.program_id(1)
            iy = (sc_ref[O + 21]
                  + (by * TH + jax.lax.broadcasted_iota(
                      jnp.int32, (TH, TW), 0)).astype(jnp.float32))
            ix = (sc_ref[O + 22]
                  + (bx * TW + jax.lax.broadcasted_iota(
                      jnp.int32, (TH, TW), 1)).astype(jnp.float32))
            mot_ref[:] = jnp.stack([(ppy - iy) * hit_f, (ppx - ix) * hit_f])

    return kernel


def _pad2(x, H_pad, Wp):
    H, W = x.shape[-2:]
    if H == H_pad and W == Wp:
        return x
    pad = [(0, 0)] * (x.ndim - 2) + [(0, H_pad - H), (0, Wp - W)]
    return jnp.pad(x, pad)


# 2D tile shape: early-exit granularity.  A step-count cost model says
# narrow tiles should win (full-width bands pay ~51 steps/pixel-equivalent
# at 1080p vs ~21 for 16×128; per-pixel ideal 13.3) but MEASURED on v5e the
# wall time is tile-shape-invariant (±1%): smaller tiles take fewer
# while-loop iterations yet each iteration runs at proportionally lower
# VPU utilization (fixed scalar-cond + reduce overhead per iteration).
# Early exit itself works — max_steps 16/32/64/128 times sublinearly at
# 1.71/2.37/2.98/3.59 ms.  TW is a lane multiple; TH a sublane multiple.
_TH = 32
_TW = 256


def _tile_specs(TH, TW, n):
    return [pl.BlockSpec((TH, TW), lambda by, bx: (by, bx),
                         memory_space=pltpu.VMEM) for _ in range(n)]


def raymarch_pallas(scene, ro, rd, params: RaymarchParams,
                    interpret: bool = False):
    """Sphere-trace via the banded Pallas kernel; same contract as
    ``ops.raymarch.raymarch`` (returns ``(t, hit)``), same implicit-function
    gradient.  Additionally returns the material id plane via
    :func:`raymarch_pallas_with_mat` for the fused render path."""
    t, hit, _mat = raymarch_pallas_with_mat(scene, ro, rd, params,
                                            interpret=interpret)
    return t, hit


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def raymarch_pallas_with_mat(scene, ro, rd, params: RaymarchParams,
                             interpret: bool = False):
    return _march_call(scene, ro, rd, params, interpret)


@functools.partial(jax.jit, static_argnames=("params", "interpret",
                                              "emit_normals", "cam_cfg"))
def _march_call(scene, ro, rd, params, interpret=False, emit_normals=False,
                camera=None, cam_cfg=None, win_origin=None):
    H, W = ro.shape[-2:]
    TW = min(_TW, _round_up(W, 128))
    Wp = _round_up(W, TW)
    TH = min(_TH, _round_up(H, 8))
    H_pad = _round_up(H, TH)
    grid = (H_pad // TH, Wp // TW)
    n_sph = scene.sphere_params.shape[0]
    n_box = scene.box_params.shape[0]
    n_pl = scene.plane_params.shape[0]

    seeded = bool(params.coarse_seed)
    kernel = _make_march_kernel(H, W, TH, TW, params, n_sph, n_box, n_pl,
                                seeded=seeded, emit_normals=emit_normals)
    sc = flatten_scene(scene)
    rop = _pad2(ro, H_pad, Wp)
    rdp = _pad2(rd, H_pad, Wp)
    extra_specs, extra = [], ()
    if seeded:
        # per-band scalar seeds: min of the cone stops over each fine tile
        # (any lower seed stays skip-free).  The whole seed side-channel is
        # one tiny SMEM grid — no full-res plane, no upsample, no pad.
        B = _SEED_BLOCK
        if camera is not None:
            # analytic coarse rays straight from the camera (ro/rd MUST be
            # this camera window's rays): kills the full-res deviation math
            t_c = _cone_seed_coarse_analytic(
                scene, camera, cam_cfg, win_origin[0], win_origin[1],
                H, W, params, interpret)
        else:
            t_c = _cone_seed_coarse(scene, ro, rd, params, interpret)
        gy, gx = grid
        cy, cx = TH // B, TW // B
        t_c = t_c[:gy * cy, :gx * cx]   # cone pad cells are max_dist
        band_seeds = t_c.reshape(gy, cy, gx, cx).min(axis=(1, 3))
        extra = (band_seeds,)
        extra_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    n_out = 6 if emit_normals else 3
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + extra_specs
        + _tile_specs(TH, TW, 6),
        out_specs=tuple(_tile_specs(TH, TW, n_out)),
        out_shape=tuple(jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32)
                        for _ in range(n_out)),
        interpret=interpret,
    )(sc, *extra, rop[0], rop[1], rop[2], rdp[0], rdp[1], rdp[2])
    t, hit, mat = outs[:3]
    base = (t[:H, :W], hit[:H, :W] > 0.5, mat[:H, :W].astype(jnp.int32))
    if emit_normals:
        return base + (jnp.stack([o[:H, :W] for o in outs[3:6]]),)
    return base


def raymarch_pallas_gbuf(scene, ro, rd, params: RaymarchParams,
                         interpret: bool = False, camera=None, cam_cfg=None,
                         win_origin=None):
    """March + viewer-flipped central-difference normals in ONE kernel pass:
    returns ``(t, hit, mat, normal)`` with ``normal`` (3, H, W) — the
    in-kernel twin of ``sdf_normal`` + the render path's flip (which cost a
    separate 1.85 ms XLA pass at 1080p).

    DIFFERENTIABLE (round 4, VERDICT r3 next-step #4): the un-seeded path
    carries a custom VJP — the forward runs the fused kernel only; the
    backward recomputes the normal chain in XLA (``sdf_normal`` + flip,
    exactly the math the kernel epilogue mirrors), routes its hit-point
    cotangent into the implicit-function march adjoint, and sums the scene
    contributions.  So training saves the kernel-side 1.85 ms XLA normal
    pass in the forward and pays the same backward it always did.

    ``camera``/``cam_cfg``/``win_origin``: when given (and
    ``params.coarse_seed``), the cone pre-march seed is generated
    analytically from the camera at coarse resolution instead of from the
    full-res ray planes — the caller asserts ``ro``/``rd`` are exactly that
    camera window's rays.  The seeded variant stays inference-only (the
    seed side-channel is not differentiated; a grad attempt fails loudly)."""
    if not params.coarse_seed:
        # camera only feeds the cone seed; without seeding this is the
        # differentiable fused path
        return _gbuf_fused(scene, ro, rd, params, interpret)
    return _march_call(scene, ro, rd, params, interpret, emit_normals=True,
                       camera=camera, cam_cfg=cam_cfg, win_origin=win_origin)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gbuf_fused(scene, ro, rd, params: RaymarchParams,
                interpret: bool = False):
    return _march_call(scene, ro, rd, params, interpret, emit_normals=True)


def _gbuf_fused_fwd(scene, ro, rd, params, interpret):
    out = _march_call(scene, ro, rd, params, interpret, emit_normals=True)
    t, hit, _mat, _n = out
    return out, (scene, ro, rd, t, hit)


def _gbuf_fused_bwd(params, interpret, res, cot):
    """Adjoint of (t, normal) w.r.t. (scene, ro, rd): mirrors XLA autodiff
    of the unfused path ``t = raymarch(...); p = ro + t·rd;
    n = flip(sdf_normal(scene, p))`` — the normal chain (6 SDF evals) is
    recomputed here in XLA, its ∂p cotangent is folded into the march's
    implicit-function adjoint via ∂t = Σ ∂p·rd."""
    from ..raymarch import _raymarch_bwd, sdf_normal
    scene, ro, rd, t, hit = res
    g_t, _g_hit, _g_mat, g_n = cot

    p = ro + t[None] * rd

    def normal_fn(sc, pp):
        n = sdf_normal(sc, pp, params.normal_eps)
        return jnp.where(jnp.sum(n * rd, axis=0, keepdims=True) > 0, -n, n)

    _, vjp_n = jax.vjp(normal_fn, scene, p)
    d_scene_n, d_p = vjp_n(g_n)

    g_t_total = g_t + jnp.sum(d_p * rd, axis=0)
    d_scene_t, d_ro, d_rd = _raymarch_bwd(
        params, (scene, ro, rd, t, hit), (g_t_total, None))

    def add_cot(a, b):
        # integer scene leaves (material ids) carry float0 cotangents
        if jax.dtypes.result_type(a) == jax.dtypes.float0:
            return a
        return a + b

    d_scene = jax.tree.map(add_cot, d_scene_t, d_scene_n)
    return d_scene, d_ro + d_p, d_rd + t[None] * d_p


_gbuf_fused.defvjp(_gbuf_fused_fwd, _gbuf_fused_bwd)


def _march_fwd(scene, ro, rd, params, interpret):
    out = _march_call(scene, ro, rd, params, interpret)
    t, hit, _mat = out
    return out, (scene, ro, rd, t, hit)


def _march_bwd(params, interpret, res, cot):
    # identical adjoint to ops.raymarch._raymarch_bwd (implicit function
    # theorem at the hit point) — one XLA SDF evaluation, no kernel
    from ..raymarch import _raymarch_bwd
    scene, ro, rd, t, hit = res
    g_t, _g_hit, _g_mat = cot
    return _raymarch_bwd(params, (scene, ro, rd, t, hit), (g_t, None))


raymarch_pallas_with_mat.defvjp(_march_fwd, _march_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def shadow_shade_pallas(scene, p, n, light_p, albedo, emission, hit_f,
                        prev_basis, params: RaymarchParams,
                        cam_wh: Tuple[int, int], interpret: bool = False):
    """Fused shadow march + shading (+ motion) — one kernel pass replacing
    the per-frame XLA glue (VERDICT r3 next-step #5).  Returns
    ``(render, vis, motion)`` (``motion=None`` without ``prev_basis``).

    ``prev_basis``: ``(ppos, pfwd, pright, pup, phw, phh, row0, col0)`` —
    the previous camera's basis (traced arrays/scalars) and the window's
    global pixel origin for the reprojection iotas; pass ``None`` for the
    first frame.  ``albedo``/``emission`` are the hit-masked (3, H, W)
    material planes; ``hit_f`` the (H, W) hit mask as float.

    Differentiable: the custom VJP recomputes the shading/motion chain in
    XLA during the backward (visibility is piecewise-constant and treated
    as a constant exactly like the oracle's stop_gradient), so training
    saves the fused forward and keeps oracle-identical gradients.  Miss
    pixels skip the visibility march entirely (their shade is albedo-masked
    to zero either way); the standalone :func:`shadow_factor_pallas`
    remains the oracle-parity kernel that marches every pixel."""
    out, _ = _shade_fwd(scene, p, n, light_p, albedo, emission, hit_f,
                        prev_basis, params, cam_wh, interpret)
    return out


@functools.partial(jax.jit, static_argnames=("params", "cam_wh", "interpret",
                                              "has_prev"))
def _shade_call(scene, p, n, light_p, albedo, emission, hit_f, basis_vec,
                params, cam_wh, interpret=False, has_prev=False):
    H, W = p.shape[-2:]
    TW = min(_TW, _round_up(W, 128))
    Wp = _round_up(W, TW)
    TH = min(_TH, _round_up(H, 8))
    H_pad = _round_up(H, TH)
    grid = (H_pad // TH, Wp // TW)
    n_sph = scene.sphere_params.shape[0]
    n_box = scene.box_params.shape[0]
    n_pl = scene.plane_params.shape[0]
    kernel = _make_shadow_shade_kernel(H, W, TH, TW, params, n_sph, n_box,
                                       n_pl, has_prev, cam_wh[0], cam_wh[1])
    sc = jnp.concatenate([flatten_scene(scene), basis_vec])
    pp = _pad2(p, H_pad, Wp)
    np_ = _pad2(n, H_pad, Wp)
    lp = _pad2(light_p, H_pad, Wp)
    ap = _pad2(albedo, H_pad, Wp)
    ep = _pad2(emission, H_pad, Wp)
    hp = _pad2(hit_f, H_pad, Wp)
    n_out = 3 if has_prev else 2

    def tile3(cn):
        return pl.BlockSpec((cn, TH, TW), lambda by, bx: (0, by, bx),
                            memory_space=pltpu.VMEM)

    out_specs = [tile3(3), _tile_specs(TH, TW, 1)[0]]
    out_shape = [jax.ShapeDtypeStruct((3, H_pad, Wp), jnp.float32),
                 jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32)]
    if has_prev:
        out_specs.append(tile3(2))
        out_shape.append(jax.ShapeDtypeStruct((2, H_pad, Wp), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + _tile_specs(TH, TW, 9) + [tile3(3), tile3(3)]
        + _tile_specs(TH, TW, 1),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(sc, pp[0], pp[1], pp[2], np_[0], np_[1], np_[2],
      lp[0], lp[1], lp[2], ap, ep, hp)
    render = outs[0][:, :H, :W]
    vis = outs[1][:H, :W]
    motion = outs[2][:, :H, :W] if has_prev else None
    return render, vis, motion


def _shade_xla(scene, p, n, light_p, albedo, emission, hit_f, vis,
               prev_basis, cam_wh):
    """XLA twin of the kernel epilogue (used by the VJP's backward):
    identical math, ``vis`` a constant."""
    to_l = light_p - p
    dist2 = jnp.sum(to_l * to_l, axis=0)
    ld = to_l / jnp.maximum(jnp.sqrt(dist2), 1e-8)[None]
    cos_s = jnp.maximum(jnp.sum(n * ld, axis=0), 0.0)
    from ..raymarch import _normalize
    light_n = _normalize(jnp.cross(scene.light_u, scene.light_v))
    cos_l = jnp.abs(light_n[0] * ld[0] + light_n[1] * ld[1]
                    + light_n[2] * ld[2])
    area = 4.0 * jnp.linalg.norm(jnp.cross(scene.light_u, scene.light_v))
    geom = cos_s * cos_l * area / jnp.maximum(dist2, 1e-4)
    irr = scene.light_radiance[:, None, None] * (vis * geom)[None]
    render = albedo * (irr / jnp.pi + 0.08) + emission
    if prev_basis is None:
        return render, None
    ppos, pfwd, pright, pup, phw, phh, row0, col0 = prev_basis
    rel = p - ppos[:, None, None]

    def dot3(v, w):
        return v[0] * w[0] + v[1] * w[1] + v[2] * w[2]

    z = dot3(pfwd[:, None, None], rel)
    x = dot3(pright[:, None, None], rel) / jnp.maximum(z, 1e-6)
    y = dot3(pup[:, None, None], rel) / jnp.maximum(z, 1e-6)
    px = (x / phw * 0.5 + 0.5) * cam_wh[0] - 0.5
    py = (0.5 - y / phh * 0.5) * cam_wh[1] - 0.5
    th, tw = hit_f.shape
    iy = (row0 + jnp.arange(th, dtype=p.dtype))[:, None]
    ix = (col0 + jnp.arange(tw, dtype=p.dtype))[None, :]
    motion = jnp.stack([py - iy, px - ix]) * hit_f[None]
    return render, motion


def _shade_fwd(scene, p, n, light_p, albedo, emission, hit_f, prev_basis,
               params, cam_wh, interpret):
    has_prev = prev_basis is not None
    if has_prev:
        ppos, pfwd, pright, pup, phw, phh, row0, col0 = prev_basis
        basis_vec = jnp.concatenate([
            _light_consts(scene), ppos, pfwd, pright, pup,
            jnp.stack([phw, phh,
                       jnp.asarray(row0, jnp.float32),
                       jnp.asarray(col0, jnp.float32)])]).astype(jnp.float32)
    else:
        basis_vec = _light_consts(scene)
    out = _shade_call(scene, p, n, light_p, albedo, emission, hit_f,
                      basis_vec, params, cam_wh, interpret, has_prev)
    render, vis, motion = out
    res = (scene, p, n, light_p, albedo, emission, hit_f, vis, prev_basis)
    return (render, vis, motion), res


def _light_consts(scene):
    from ..raymarch import _normalize
    light_n = _normalize(jnp.cross(scene.light_u, scene.light_v))
    area = 4.0 * jnp.linalg.norm(jnp.cross(scene.light_u, scene.light_v))
    return jnp.concatenate([
        light_n, scene.light_radiance, area[None]]).astype(jnp.float32)


def _shade_bwd(params, cam_wh, interpret, res, cot):
    (scene, p, n, light_p, albedo, emission, hit_f, vis, prev_basis) = res
    g_render, _g_vis, g_motion = cot

    def f(scene, p, n, light_p, albedo, emission, hit_f):
        render, motion = _shade_xla(scene, p, n, light_p, albedo, emission,
                                    hit_f, vis, prev_basis, cam_wh)
        if motion is None:
            return (render,)
        return (render, motion)

    _, vjp_fn = jax.vjp(f, scene, p, n, light_p, albedo, emission, hit_f)
    cots = (g_render,) if prev_basis is None else (g_render, g_motion)
    grads = vjp_fn(cots)
    # camera-basis cotangents are zero by convention: the camera is never an
    # optimization target (gradients w.r.t. the hit point p, which the
    # motion reprojection reads, ARE routed — see vjp over f above)
    import numpy as _np
    d_pb = jax.tree.map(
        lambda x: (_np.zeros(jnp.shape(x), jax.dtypes.float0)
                   if jnp.issubdtype(jnp.result_type(x), jnp.integer)
                   else jnp.zeros(jnp.shape(x), jnp.result_type(x))),
        prev_basis)
    return grads + (d_pb,)


shadow_shade_pallas.defvjp(_shade_fwd, _shade_bwd)


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def shadow_factor_pallas(scene, p, n, light_p, params: RaymarchParams,
                         interpret: bool = False):
    """Shadow-ray visibility via the banded Pallas kernel (parity with
    ``ops.raymarch._shadow_factor``, including the normal-offset origin and
    step floor); piecewise-constant -> wrapped in stop_gradient."""
    H, W = p.shape[-2:]
    TW = min(_TW, _round_up(W, 128))
    Wp = _round_up(W, TW)
    TH = min(_TH, _round_up(H, 8))
    H_pad = _round_up(H, TH)
    grid = (H_pad // TH, Wp // TW)
    n_sph = scene.sphere_params.shape[0]
    n_box = scene.box_params.shape[0]
    n_pl = scene.plane_params.shape[0]

    # visibility has a.e.-zero gradient (step function); detach ALL inputs —
    # pallas_call has no autodiff rule, so perturbed inputs must never reach
    # it during linearization
    scene = jax.lax.stop_gradient(scene)
    p = jax.lax.stop_gradient(p)
    n = jax.lax.stop_gradient(n)
    light_p = jax.lax.stop_gradient(light_p)

    origin = p + 0.02 * n
    to_l = light_p - origin
    dist_l = jnp.sqrt(jnp.sum(to_l * to_l, axis=0))
    ld = to_l / jnp.maximum(dist_l, 1e-8)[None]

    kernel = _make_shadow_kernel(H, W, TH, TW, params, n_sph, n_box, n_pl)
    op = _pad2(origin, H_pad, Wp)
    ldp = _pad2(ld, H_pad, Wp)
    vis = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + _tile_specs(TH, TW, 7),
        out_specs=_tile_specs(TH, TW, 1)[0],
        out_shape=jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32),
        interpret=interpret,
    )(flatten_scene(scene),
      op[0], op[1], op[2], ldp[0], ldp[1], ldp[2],
      _pad2(dist_l, H_pad, Wp))
    return vis[:H, :W]
