"""Pallas TPU kernels for the edge-aware à-trous wavelet filter (SVGF).

TPU-native redesign of the reference's CUDA stencil kernels
(``src/filter.cu:60-158``): the CUDA block's cooperative shared-memory tile +
halo load (``cacheTile``, filter.cu:66-84) becomes an async HBM->VMEM DMA of
a halo-extended row band (``pltpu.make_async_copy``); ``__syncthreads()``
barriers disappear (the sequential grid is the schedule); the unused
``__constant__ waveletSpline`` (filter.cu:10) becomes compile-time folded
B3-spline weights; and the edge-stopping math the reference only declared
(sigma params, filter.cuh:16-19) is implemented in full.

Why manual DMA: halo-overlapping windows can't be expressed with Blocked
``BlockSpec``s (offsets are block-quantized), and ``pl.Element`` windows are
staged whole-array on current Mosaic (VMEM OOM at 1080p).  So haloed inputs
are declared ``memory_space=ANY`` (stay in HBM, zero-padded top/bottom by the
wrapper) and each grid step copies rows ``[b*TH, b*TH + TH + 2*halo)`` into
VMEM scratch — exactly the reference's tiled-kernel strategy, one level up
the memory hierarchy.

Layout: planar float32, rows on sublanes / width on lanes.  Horizontal taps
stay inside the full-width band via lane rolls + validity masks — the TPU
analogue of the reference's ``inRange`` guard (filter.cu:37-38).

The backward pass (detached-weights adjoint) is its own Pallas kernel: the
adjoint of ``out_p = sum_d w_p(d) c_{p+d} / N_p`` is
``dc_x = sum_d w_{x-d}(d) / N_{x-d} * g_{x-d}`` — a stencil with transposed
taps whose weights are *recomputed* at the shifted center (cheaper than
storing 25 weight planes), plus the saved normalization ``N`` (SURVEY.md §7
hard part (a)).  Semantics match ``ops/atrous.py`` with
``detach_weights=True``; parity is tested in tests/test_atrous_pallas.py
(interpret) and tests/test_tpu_hw.py (compiled on hardware).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import SVGFParams
from ..atrous import _spline_taps, variance_blur3x3, _EPS
from ..common import finite_diff_gradients

# Rec.709 luma coefficients (must match gbuffer.luminance).
_LUMA = (0.2126, 0.7152, 0.0722)

# Fast polynomial exp inside kernels (the 25 per-tap exps dominate the VPU
# cost; native exp is a long multi-op sequence).  Relative error ~1e-7 —
# far inside the oracle-parity tolerances.  Set False to fall back.
_FAST_EXP = True

_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _exp2_fast(y: jax.Array) -> jax.Array:
    """2^y for y <= 0 via 2^i * exp(f·ln2), f in [-0.5, 0.5].

    Base-2 variant of the fast exp: callers fold the ``log2(e)`` factor into
    their precomputed reciprocal scales, saving the per-tap ``x*log2e``
    multiply.  Range reduction by round-to-nearest exponent + degree-6 Taylor
    on the reduced argument (|z| <= 0.347 -> truncation error ~1.3e-7
    relative); 2^i is assembled with an exponent-field bitcast.  Inputs below
    ~-126 underflow to ~0 exactly like native exp.
    """
    if not _FAST_EXP:
        return jnp.exp2(y)
    yi = jnp.floor(y + 0.5)
    z = (y - yi) * _LN2
    # Horner deg-6 Taylor of exp(z)
    p = 1.0 + z * (1.0 + z * (0.5 + z * (1.0 / 6.0 + z * (
        1.0 / 24.0 + z * (1.0 / 120.0 + z * (1.0 / 720.0))))))
    i = jnp.clip(yi.astype(jnp.int32), -126, 127)
    two_i = pltpu.bitcast(((i + 127) << 23), jnp.float32)
    return p * two_i


def _exp_fast(x: jax.Array) -> jax.Array:
    """exp(x) for x <= 0 (see :func:`_exp2_fast`)."""
    if not _FAST_EXP:
        return jnp.exp(x)
    return _exp2_fast(x * _LOG2E)


# near-minimax (relative-error LS) deg-3 coefficients for exp(z) on
# [-ln2/2, ln2/2]: max rel err 1.37e-4 (tools: fit in commit history)
_EXP3_C = (0.999951338657045, 1.0001527445243588,
           0.5042261676140843, 0.16524081962961631)


def _exp2_fast3(y: jax.Array) -> jax.Array:
    """2^y for y <= 0, ~1.4e-4 relative: deg-3 near-minimax on the reduced
    argument (7 fewer VPU ops than :func:`_exp2_fast`'s deg-6 — the exp is
    ~40% of the 25-tap weight math).  ``weight_math="fast"`` only."""
    yi = jnp.floor(y + 0.5)
    z = (y - yi) * _LN2
    c0, c1, c2, c3 = _EXP3_C
    p = c0 + z * (c1 + z * (c2 + z * c3))
    # y <= 0 so yi <= 0 < 127: only the underflow side needs clamping
    i = jnp.maximum(yi.astype(jnp.int32), -126)
    two_i = pltpu.bitcast(((i + 127) << 23), jnp.float32)
    return p * two_i


def _recip(x: jax.Array) -> jax.Array:
    """Full-precision reciprocal via the VPU approx-recip + one Newton step
    (~4 ops vs the ~7-op divide sequence); relative error ~1 ulp."""
    r = pl.reciprocal(x, approx=True)
    return r * (2.0 - x * r)


def _exp2_fast_bf16(y: jax.Array) -> jax.Array:
    """2^y in bfloat16 (y <= 0): same range-reduction scheme as
    :func:`_exp2_fast` but with a degree-3 Taylor (truncation ~6e-4, inside
    bf16's 2^-8 eps) and the exponent assembled in the bf16 bit layout
    (same 8-bit exponent field as f32, mantissa shift 7).  The argument is
    clamped at -1e4 before the int conversion: masked taps can carry huge
    negative arguments and bf16→int32 saturation is not portable."""
    y = jnp.maximum(y, jnp.bfloat16(-1e4))
    yi = jnp.floor(y + jnp.bfloat16(0.5))
    z = (y - yi) * jnp.bfloat16(_LN2)
    p = 1.0 + z * (1.0 + z * (0.5 + z * jnp.bfloat16(1.0 / 6.0)))
    i = jnp.clip(yi.astype(jnp.int32), -126, 127)
    two_i = pltpu.bitcast(((i + 127) << 7).astype(jnp.int16), jnp.bfloat16)
    return p * two_i


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tile_rows(H: int, W: int, halo_pad: int, n_haloed_planes: int,
                    n_center_planes: int = 0, n_temp_planes: int = 0,
                    vmem_budget: int = 72 * 2 ** 20, elem_bytes: int = 4,
                    align: int = 8) -> int:
    """Choose TILE_H to fit v5e VMEM (128 MB): DMA-staged haloed scratch
    (single-buffered), double-buffered center-blocked inputs/outputs, and the
    kernel body's live temporaries (Mosaic schedules the statically-unrolled
    tap loop with most per-tap intermediates concurrently live, measured at
    ~3 plane-equivalents per tap — see tests/test_tpu_hw.py history)."""
    row_bytes = W * elem_bytes
    denom = (n_haloed_planes + 2 * n_center_planes + n_temp_planes) * row_bytes
    fixed = n_haloed_planes * 2 * halo_pad * row_bytes
    max_tile = (vmem_budget - fixed) // max(denom, 1)
    tile = max(align, min((max_tile // align) * align, 512))
    if H <= tile:
        return _round_up(H, align)
    # avoid pathological padding waste: shrink so the last band isn't mostly pad
    n_bands = -(-H // tile)
    return max(align, (_round_up(-(-H // n_bands), align)))


def _rows(x: jax.Array, o: int, size: int) -> jax.Array:
    """Static slice of ``size`` rows starting at offset ``o`` (axis -2)."""
    idx = [slice(None)] * x.ndim
    idx[-2] = slice(o, o + size)
    return x[tuple(idx)]


def _col_roll(x: jax.Array, ox: int) -> jax.Array:
    """result[..., j] = x[..., j + ox] (wrap; callers mask wrapped lanes)."""
    if ox == 0:
        return x
    return pltpu.roll(x, -ox % x.shape[-1], axis=x.ndim - 1)


def _make_level_kernel(H: int, W: int, TH: int, halo_pad: int, spacing: int,
                       params: SVGFParams, mode: str, n_hbm: int,
                       Wp: int = None, save_w: bool = False,
                       dtype=jnp.float32, with_origin: bool = False,
                       row_base: int = 0, out_margin: int = None,
                       w_dtype=jnp.float32, fast_weights: bool = False,
                       fuse_isd: bool = False, luma_only: bool = False):
    """Build the fwd or bwd kernel body for one à-trous level.

    Kernel refs: ``n_hbm`` haloed HBM inputs, then (fwd) zgrad + inv-sigma
    VMEM center blocks, then outputs, then ``n_hbm`` VMEM scratch tiles + one
    DMA semaphore array.

    Division avoidance: all per-tap divides are replaced by Newton-refined
    VPU reciprocals (:func:`_recip`), the ``log2(e)`` exp-argument factor is
    folded into the reciprocal *scales* so :func:`_exp2_fast` needs no
    per-tap multiply, and the depth-weight denominators — which by the
    ``|∇z·d|`` symmetry take only 13 distinct values over the 25 taps — are
    cached across taps.  The backward kernel reads precomputed ``u = g/N``
    and ``u2 = g_v/N²`` planes (XLA-side) instead of dividing per tap.

    bfloat16 mode (``dtype=jnp.bfloat16``): staged planes, rolls/slices and
    tap math run in bf16 (half the VPU movement bytes, packed ALU), with f32
    accumulators and a reformulated normal weight — ``ndot^σn`` is numerically
    unusable in bf16 (σn·eps ≈ 0.5 relative error near ndot=1), so the
    mathematically equivalent-for-unit-vectors form
    ``exp(σn·ln(1−s/2))``, ``s = |n_c−n_q|²``, is folded into the main exp2
    argument via a 2-term log series.  Quality is characterized by
    tools/quality_eval.py; parity tolerances are documented there.
    """
    r = params.radius
    taps1d = _spline_taps(r)
    C = halo_pad  # row offset of the band's first center row inside the tile
    BLK = TH + 2 * halo_pad
    Wp = W if Wp is None else Wp  # padded (layout) width; W = true image width
    sz2 = params.sigma_depth * _LN2   # folds log2e into the recip scale
    eps2 = _EPS * _LN2
    bf = dtype == jnp.bfloat16
    # exp-form normal-weight coefficients (bf16 mode):
    # ndot^σn = exp(σn ln(1−s/2)) ≈ exp2(−σn log2e (s/2 + s²/8))
    c_s1 = params.sigma_normal * _LOG2E * 0.5
    c_s2 = params.sigma_normal * _LOG2E * 0.125

    # canvas mode (out_margin set): outputs live whole in HBM with an
    # ``out_margin``-row zero margin top+bottom; the kernel writes its center
    # band via manual DMA and zeroes the margins from band 0, so the output
    # can be consumed *directly* as the next level's haloed input (row_base =
    # margin − next halo).  This removes every inter-level pad/crop copy of
    # the sweep (the round-2 pad-fold lever, VERDICT next-step #1).
    canvas_w = save_w and out_margin is not None
    if out_margin is None:
        n_out_arr = 0
    elif mode == "fwd":
        n_out_arr = 4 if canvas_w else 3
    else:  # "bwd" / "stored"
        n_out_arr = 2

    def kernel(*refs):
        if with_origin:
            org_ref = refs[0]  # (2,) int32 SMEM: tile origin (row, col)
            refs = refs[1:]
        hbm = refs[:n_hbm]
        wout_ref = None
        if mode == "fwd":
            if fuse_isd:
                # σ-denominator derived in-kernel from the staged variance
                # tile: no isd2 center-block input
                zgrad_ref, cout_ref, vout_ref, nout_ref = (
                    refs[n_hbm:n_hbm + 4])
                isd2_ref = None
                n_out = 4
            else:
                zgrad_ref, isd2_ref, cout_ref, vout_ref, nout_ref = (
                    refs[n_hbm:n_hbm + 5])
                n_out = 5
            out_refs = (cout_ref, vout_ref, nout_ref)
            if save_w:
                wout_ref = refs[n_hbm + n_out]
                n_out += 1
                if canvas_w:
                    out_refs = out_refs + (wout_ref,)
        else:
            dcol_ref, dvar_ref = refs[n_hbm:n_hbm + 2]
            n_out = 2
            out_refs = (dcol_ref, dvar_ref)
        if out_margin is None:
            scratch = refs[n_hbm + n_out:-1]
            sems = refs[-1]  # (2, n_hbm) DMA semaphores
        else:
            # scratch layout: staging tiles, stage sems, out tiles, zeros
            # (+ w-dtype zeros when the weight canvas is emitted), write sems,
            # margin sems
            msem = refs[-1]
            wsem = refs[-2]
            nz = 2 if canvas_w else 1
            zeros_refs = refs[-2 - nz:-2]
            zeros_ref = zeros_refs[0]
            out_tiles = refs[-2 - nz - n_out_arr:-2 - nz]
            sems = refs[-3 - nz - n_out_arr]
            scratch = refs[n_hbm + n_out:-3 - nz - n_out_arr]

        b = pl.program_id(0)
        nb = pl.num_programs(0)

        # Double-buffered staging: each scratch plane has a leading slot dim.
        # Step b computes on slot b%2 (whose DMA was started at step b-1 —
        # or right here for b==0) while prefetching band b+1 into the other
        # slot, overlapping the HBM reads with the tap loop's compute.
        def make_copies(slot, band):
            row0 = pl.multiple_of(band * TH + row_base, 8)
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

        def out_row_slice(ref, row0, size):
            if ref.ndim == 3:
                return ref.at[:, pl.ds(row0, size), :]
            return ref.at[pl.ds(row0, size), :]

        def make_out_copies(slot, band):
            row0 = pl.multiple_of(out_margin + band * TH, 8)
            return [
                pltpu.make_async_copy(t.at[slot],
                                      out_row_slice(ref, row0, TH),
                                      wsem.at[slot, j])
                for j, (t, ref) in enumerate(zip(out_tiles, out_refs))
            ]

        def make_margin_copies():
            bot = pl.multiple_of(out_margin + nb * TH, 8)
            cps = []
            for j, ref in enumerate(out_refs):
                z = zeros_refs[1] if (canvas_w and j == 3) else zeros_ref
                zsrc = (z.at[:ref.shape[0]] if ref.ndim == 3 else z.at[0])
                cps.append(pltpu.make_async_copy(
                    zsrc, out_row_slice(ref, 0, out_margin), msem.at[j, 0]))
                cps.append(pltpu.make_async_copy(
                    zsrc, out_row_slice(ref, bot, out_margin), msem.at[j, 1]))
            return cps

        slot = jax.lax.rem(b, 2)
        nslot = jax.lax.rem(b + 1, 2)

        @pl.when(b == 0)
        def _():
            for cp in make_copies(0, 0):
                cp.start()

        if out_margin is not None:
            @pl.when(b == 0)
            def _():
                for z in zeros_refs:
                    z[...] = jnp.zeros_like(z)
                for cp in make_margin_copies():
                    cp.start()

            # slot's previous write (band b-2) must land before we overwrite
            # its out tiles
            @pl.when(b >= 2)
            def _():
                for cp in make_out_copies(slot, b - 2):
                    cp.wait()

        @pl.when(b + 1 < nb)
        def _():
            for cp in make_copies(nslot, b + 1):
                cp.start()

        for cp in make_copies(slot, b):
            cp.wait()

        gy = b * TH + jax.lax.broadcasted_iota(jnp.int32, (TH, Wp), 0)
        gx = jax.lax.broadcasted_iota(jnp.int32, (TH, Wp), 1)
        if with_origin:
            # sharded tiles: masks test GLOBAL image coordinates (the tile's
            # exchanged halo is in-image data of the neighbor; only taps
            # beyond the global border are dropped)
            gy = gy + org_ref[0]
            gx = gx + org_ref[1]

        tiles = [s[slot] for s in scratch]
        if mode == "stored":
            # FMA-only adjoint against the forward's stored weight planes:
            # no edge-stopping math, no masks (stored weights are zero at
            # image borders by the forward's mask factor, and the canvas
            # margins are zeroed).  ``u``/``u2`` are derived on the haloed
            # band in VMEM (taps read them at shifted centers).
            w_t, norm_t, gc_t, gv_t = tiles
            inv_n = _recip(jnp.maximum(norm_t, _EPS))
            u_t = gc_t * inv_n[None]
            u2_t = gv_t * (inv_n * inv_n)
            acc_c = jnp.zeros((3, TH, Wp), jnp.float32)
            acc_v = jnp.zeros((TH, Wp), jnp.float32)
            _rolled = {}

            def shifted_s(x, oy, ox):
                key = (id(x), ox)
                if key not in _rolled:
                    _rolled[key] = _col_roll(x, ox)
                return _rows(_rolled[key], C + oy, TH)

            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    k = (dy + r) * (2 * r + 1) + (dx + r)
                    # center p = x - d: shift by -d (16-bit lane rotates are
                    # unimplemented on current Mosaic — convert first)
                    oy, ox = -dy * spacing, -dx * spacing
                    wsh = _rows(_col_roll(
                        w_t[k].astype(jnp.float32), ox), C + oy, TH)
                    acc_c = acc_c + wsh[None] * shifted_s(u_t, oy, ox)
                    acc_v = acc_v + (wsh * wsh) * shifted_s(u2_t, oy, ox)

            results = (acc_c, acc_v)
            for t, val in zip(out_tiles, results):
                t[slot] = val
            for cp in make_out_copies(slot, b):
                cp.start()

            @pl.when(b == nb - 1)
            def _():
                for cp in make_out_copies(slot, b):
                    cp.wait()
                for cp in make_margin_copies():
                    cp.wait()

            @pl.when(jnp.logical_and(b == nb - 1, nb > 1))
            def _():
                for cp in make_out_copies(nslot, b - 1):
                    cp.wait()

            return

        if mode == "fwd":
            if luma_only:
                # cheaper-filter deep-level mode: depth/normal planes are
                # neither staged nor read (SVGFParams.luma_only_from)
                color_t, var_t = tiles
                normal_t = depth_t = None
            else:
                color_t, normal_t, depth_t, var_t = tiles
                zg = zgrad_ref[:]        # (2, TH, W) center rows
            if not fuse_isd:
                isd2_c = isd2_ref[:]  # log2e / sigma_denom, center rows
            # Luminance over the whole haloed band once (per-tap l_q becomes
            # a free slice instead of a 5-op recompute).
            lum_t = (_LUMA[0] * color_t[0] + _LUMA[1] * color_t[1]
                     + _LUMA[2] * color_t[2])
            col_c = _rows(color_t, C, TH)                  # (3, TH, W)
        else:
            # lum / u / u2 / inv-sigma are precomputed XLA-side (staging the
            # 3 color planes just to derive lum, and dividing g by N per tap,
            # were round-1 costs — VERDICT weak #1 movement-bound finding).
            (lum_t, normal_t, depth_t, isd2_t, zgrad_t, u_t, u2_t) = tiles

        lum_c = _rows(lum_t, C, TH)
        if normal_t is not None:
            n_c = _rows(normal_t, C, TH)
            z_c = _rows(depth_t, C, TH)

        # Validity masks factor into 5 row masks x 5 col masks (the tap mask
        # is their product) instead of 4 int compares per tap.  Out-of-image
        # tap *values* are left unmasked: HBM padding is zeros and lane-roll
        # wraps are finite, and the weight's mask factor zeroes their
        # contribution exactly as the oracle's dropped taps do.
        sgn = 1 if mode == "fwd" else -1
        row_m = {dy: ((gy + sgn * dy * spacing >= 0)
                      & (gy + sgn * dy * spacing < H)).astype(dtype)
                 for dy in range(-r, r + 1)}
        col_m = {dx: ((gx + sgn * dx * spacing >= 0)
                      & (gx + sgn * dx * spacing < W)).astype(dtype)
                 for dx in range(-r, r + 1)}
        if mode == "bwd":
            # masks the *output* pixel x itself: beyond-global-border rows
            # (wrapper pad rows, or a sharded tile's halo hanging off the
            # image edge) must not accumulate gradient
            in_img = ((gy >= 0) & (gy < H)).astype(dtype)
            row_m = {dy: m * in_img for dy, m in row_m.items()}
        # Fold the separable spline taps into the masks: hfm becomes ONE
        # per-tap vector mul instead of two (h·(row·col)).  Bit-exact for the
        # B3 taps (dyadic rationals × {0,1} masks — every product is exactly
        # representable, in bf16 too).
        row_mh = {dy: taps1d[dy + r] * m for dy, m in row_m.items()}
        col_mh = {dx: taps1d[dx + r] * m for dx, m in col_m.items()}

        acc_c = jnp.zeros((3, TH, Wp), jnp.float32)
        acc_v = jnp.zeros((TH, Wp), jnp.float32)
        den = jnp.zeros((TH, Wp), jnp.float32)

        # dx-major movement: lane-roll each staged plane ONCE per dx over the
        # whole band (5 rolls/plane), then per-tap reads are row slices of the
        # pre-rolled band.  The naive per-tap slice+roll costs ~2 copies per
        # plane per tap (450 plane-ops); this is ~(5 + 25) per plane (~270 ->
        # ~180 band-row-equivalents) and lets Mosaic CSE the row slices.
        _rolled = {}

        def shifted(x, oy, ox):
            """x shifted so result sits at center rows (unmasked)."""
            key = (id(x), ox)
            if key not in _rolled:
                _rolled[key] = _col_roll(x, ox)
            return _rows(_rolled[key], C + oy, TH)

        def pow_sigma_n(x):
            """x**sigma_normal; power-of-two exponents via squaring chains
            (7 mults for 128) instead of the exp/log ~40-op sequence."""
            p = params.sigma_normal
            ip = int(p)
            if ip == p and ip > 0 and (ip & (ip - 1)) == 0 and ip <= 1024:
                y = x
                while ip > 1:
                    y = y * y
                    ip >>= 1
                return y
            return jnp.power(jnp.maximum(x, 1e-20), p)

        # fwd depth-weight reciprocal scales: |∇z·(oy,ox)| = |∇z·(-oy,-ox)|,
        # so the 25 per-tap center-grid denominators collapse to 13 distinct
        # values — cache the (log2e-scaled) refined reciprocals across taps.
        _rz_cache = {}

        def rz_fwd(oy, ox):
            key = (oy, ox) if (oy, ox) >= (0, 0) else (-oy, -ox)
            if key not in _rz_cache:
                rz = _recip(
                    sz2 * jnp.abs(zg[0] * key[0] + zg[1] * key[1]) + eps2)
                _rz_cache[key] = rz.astype(dtype) if bf else rz
            return _rz_cache[key]

        if mode == "fwd" and fuse_isd:
            # In-kernel σ-denominator (replaces the per-level XLA blur/recip
            # pass, ~0.06 ms/level of inter-kernel glue at 1080p): 3×3
            # renormalized blur of the staged variance tile — same taps and
            # masks as ops.atrous.variance_blur3x3 (k = (¼,½,¼) outer
            # product, border taps dropped and renormalized).  Reads go
            # through the tap loop's `shifted` machinery (at level 0 the ±1
            # column rolls are shared with the tap loop's own).
            k1b = (0.25, 0.5, 0.25)
            rm1 = {dy: ((gy + dy >= 0) & (gy + dy < H)).astype(jnp.float32)
                   for dy in (-1, 1)}
            cm1 = {dx: ((gx + dx >= 0) & (gx + dx < W)).astype(jnp.float32)
                   for dx in (-1, 1)}
            rm1[0] = cm1[0] = None
            numb = jnp.zeros((TH, Wp), jnp.float32)
            rdenb = jnp.float32(0.5)
            cdenb = jnp.float32(0.5)
            for dy in (-1, 0, 1):
                if rm1[dy] is not None:
                    rdenb = rdenb + k1b[dy + 1] * rm1[dy]
                for dx in (-1, 0, 1):
                    kb = k1b[dy + 1] * k1b[dx + 1]
                    if dy == 0 and cm1[dx] is not None:
                        cdenb = cdenb + k1b[dx + 1] * cm1[dx]
                    mb = None
                    if rm1[dy] is not None:
                        mb = rm1[dy]
                    if cm1[dx] is not None:
                        mb = cm1[dx] if mb is None else mb * cm1[dx]
                    v_b = shifted(var_t, dy, dx)
                    numb = numb + (kb * v_b if mb is None else kb * (mb * v_b))
            blur = numb * _recip(rdenb * cdenb)
            sden = (params.sigma_color * jnp.sqrt(jnp.maximum(blur, 0.0))
                    + _EPS)
            isd2_c = _LOG2E * _recip(jnp.maximum(sden, _EPS))

        def rz_bwd(dz2):
            """Per-tap depth-weight reciprocal: in bf16 mode the VPU approx
            alone (rel err ~1e-4) is already below bf16 eps — no Newton."""
            if bf:
                return pl.reciprocal(
                    dz2.astype(jnp.float32), approx=True).astype(dtype)
            return _recip(dz2)

        def edge_weight(wz2, wl2, n_a, n_b, hfm):
            """h · mask · exp2(wz2 + wl2) · (n_a·n_b)^σn, dtype-specialized."""
            if not bf:
                if fast_weights:
                    # exp-form normal weight (exact for unit normals up to
                    # the 2-term log series, see bf16-mode docstring) folds
                    # the ndot/pow chain into the one exp2; with the deg-3
                    # exp this cuts the per-tap weight math ~35%.
                    d0 = n_a[0] - n_b[0]
                    d1 = n_a[1] - n_b[1]
                    d2 = n_a[2] - n_b[2]
                    s = d0 * d0 + d1 * d1 + d2 * d2
                    arg = wz2 + wl2 - (c_s1 * s + c_s2 * (s * s))
                    return hfm * _exp2_fast3(arg)
                ndot = jnp.maximum(n_a[0] * n_b[0] + n_a[1] * n_b[1]
                                   + n_a[2] * n_b[2], 0.0)
                return hfm * _exp2_fast(wz2 + wl2) * pow_sigma_n(ndot)
            d0 = n_a[0] - n_b[0]
            d1 = n_a[1] - n_b[1]
            d2 = n_a[2] - n_b[2]
            s = d0 * d0 + d1 * d1 + d2 * d2
            arg = wz2 + wl2 - (jnp.bfloat16(c_s1) * s
                               + jnp.bfloat16(c_s2) * (s * s))
            return hfm * _exp2_fast_bf16(arg)

        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                oy, ox = sgn * dy * spacing, sgn * dx * spacing
                hfm = row_mh[dy] * col_mh[dx]

                if mode == "fwd":
                    c_q = shifted(color_t, oy, ox)
                    v_q = shifted(var_t, oy, ox)
                    l_q = shifted(lum_t, oy, ox)
                    wl2 = -jnp.abs(lum_c - l_q) * isd2_c
                    if luma_only:
                        ex = _exp2_fast3(wl2) if fast_weights else (
                            _exp2_fast(wl2))
                        w = hfm * ex
                    else:
                        n_q = shifted(normal_t, oy, ox)
                        z_q = shifted(depth_t, oy, ox)
                        wz2 = -jnp.abs(z_c - z_q) * rz_fwd(oy, ox)
                        w = edge_weight(wz2, wl2, n_c, n_q, hfm)
                    if save_w:
                        # residual for the stored-weight backward kernel
                        k = (dy + r) * (2 * r + 1) + (dx + r)
                        if canvas_w:
                            out_tiles[3][slot, k] = w.astype(w_dtype)
                        else:
                            wout_ref[k] = w.astype(jnp.float32)

                    acc_c = acc_c + w[None] * c_q
                    acc_v = acc_v + (w * w) * v_q
                    den = den + w
                else:
                    # centers p = x - d; p's tap d lands on our rows x.
                    # oy/ox already carry the bwd sign flip (sgn).
                    n_p = shifted(normal_t, oy, ox)
                    z_p = shifted(depth_t, oy, ox)
                    isd2_p = shifted(isd2_t, oy, ox)
                    zg_p = shifted(zgrad_t, oy, ox)
                    u_p = shifted(u_t, oy, ox)
                    u2_p = shifted(u2_t, oy, ox)
                    l_p = shifted(lum_t, oy, ox)

                    # weight of center p for tap d = -(oy, ox); the zgrad is
                    # p's own, so the denominator varies per tap (no cache)
                    rz = rz_bwd(sz2 * jnp.abs(zg_p[0] * float(-oy)
                                              + zg_p[1] * float(-ox)) + eps2)
                    wz2 = -jnp.abs(z_p - z_c) * rz
                    wl2 = -jnp.abs(l_p - lum_c) * isd2_p
                    w = edge_weight(wz2, wl2, n_p, n_c, hfm)

                    acc_c = acc_c + w[None] * u_p
                    acc_v = acc_v + (w * w) * u2_p

        if mode == "fwd":
            den = jnp.maximum(den, _EPS)
            inv_den = _recip(den)
            results = (acc_c * inv_den[None], acc_v * (inv_den * inv_den),
                       den)
        else:
            results = (acc_c, acc_v)

        if out_margin is None:
            for ref, val in zip(out_refs, results):
                ref[:] = val
        else:
            for t, val in zip(out_tiles, results):
                t[slot] = val
            for cp in make_out_copies(slot, b):
                cp.start()

            @pl.when(b == nb - 1)
            def _():
                for cp in make_out_copies(slot, b):
                    cp.wait()
                for cp in make_margin_copies():
                    cp.wait()

            @pl.when(jnp.logical_and(b == nb - 1, nb > 1))
            def _():
                for cp in make_out_copies(nslot, b - 1):
                    cp.wait()

    return kernel


def _make_bwd_stored_kernel(TH: int, halo_pad: int, spacing: int,
                            params: SVGFParams, Wp: int):
    """Backward with weights saved by the forward pass (no recompute).

    ``dc_x = Σ_d w_{x-d}(d)/N_{x-d} · g_{x-d}`` becomes, with ``u = g/N`` and
    ``u2 = g_v/N²`` precomputed on the band, 25 shifted FMAs against the
    stored weight planes — no edge-stopping math, no masks (stored weights
    are zero outside the image by construction, zero-padded elsewhere).
    """
    r = params.radius
    C = halo_pad
    BLK = TH + 2 * halo_pad
    n_taps = (2 * r + 1) ** 2

    def kernel(w_hbm, norm_hbm, gc_hbm, gv_hbm, dcol_ref, dvar_ref,
               w_s, norm_s, gc_s, gv_s, sems):
        b = pl.program_id(0)
        nb = pl.num_programs(0)

        def make_copies(slot, band):
            row0 = pl.multiple_of(band * TH, 8)
            return [
                pltpu.make_async_copy(w_hbm.at[:, pl.ds(row0, BLK), :],
                                      w_s.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(norm_hbm.at[pl.ds(row0, BLK), :],
                                      norm_s.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(gc_hbm.at[:, pl.ds(row0, BLK), :],
                                      gc_s.at[slot], sems.at[slot, 2]),
                pltpu.make_async_copy(gv_hbm.at[:, pl.ds(row0, BLK), :],
                                      gv_s.at[slot], sems.at[slot, 3]),
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

        w_t = w_s[slot]          # (n_taps, BLK, Wp)
        inv_n = 1.0 / jnp.maximum(norm_s[slot], _EPS)
        u = gc_s[slot] * inv_n[None]        # (3, BLK, Wp)
        u2 = gv_s[slot][0] * (inv_n * inv_n)  # (BLK, Wp)

        acc_c = jnp.zeros((3, TH, Wp), jnp.float32)
        acc_v = jnp.zeros((TH, Wp), jnp.float32)

        _rolled = {}

        def shifted(x, oy, ox):
            key = (id(x), ox)
            if key not in _rolled:
                _rolled[key] = _col_roll(x, ox)
            return _rows(_rolled[key], C + oy, TH)

        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                k = (dy + r) * (2 * r + 1) + (dx + r)
                # center p = x - d: shift by -d
                oy, ox = -dy * spacing, -dx * spacing
                wsh = shifted(w_t[k], oy, ox)
                acc_c = acc_c + wsh[None] * shifted(u, oy, ox)
                acc_v = acc_v + (wsh * wsh) * shifted(u2, oy, ox)

        dcol_ref[:] = acc_c
        dvar_ref[:] = acc_v

    return kernel


def _hbm_spec():
    # inputs stay in HBM; the kernel DMAs its haloed window into VMEM scratch
    return pl.BlockSpec(memory_space=pltpu.HBM)


def _center_spec(n_planes, TH, W):
    if n_planes is None:
        return pl.BlockSpec((TH, W), lambda b: (b, 0), memory_space=pltpu.VMEM)
    return pl.BlockSpec((n_planes, TH, W), lambda b: (0, b, 0),
                        memory_space=pltpu.VMEM)


def _scratch_tiles(plane_dims, BLK, W, dtype=jnp.float32):
    # leading dim = 2 double-buffer slots
    return [
        pltpu.VMEM((2, BLK, W) if d is None else (2, d, BLK, W), dtype)
        for d in plane_dims
    ]


def _pad_rows(x: jax.Array, H_pad: int, W_pad: int) -> jax.Array:
    H, W = x.shape[-2:]
    if H == H_pad and W == W_pad:
        return x
    pad = [(0, 0)] * (x.ndim - 2) + [(0, H_pad - H), (0, W_pad - W)]
    return jnp.pad(x, pad)


def _pad_rows_halo(x: jax.Array, H_pad: int, halo_pad: int, W_pad: int) -> jax.Array:
    """Zero-pad rows to (halo_pad + H_pad + halo_pad) for haloed DMA reads and
    the trailing dim to W_pad (DMA slices need 128-lane-aligned minor dims)."""
    H, W = x.shape[-2:]
    pad = [(0, 0)] * (x.ndim - 2) + [(halo_pad, H_pad - H + halo_pad),
                                     (0, W_pad - W)]
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("level", "params", "interpret",
                                              "save_weights", "precision",
                                              "bounds", "tile_rows"))
def atrous_level_fwd_pallas(
    color, variance, normal, depth, zgrad, sigma_denom,
    *, level: int, params: SVGFParams, interpret: bool = False,
    save_weights: bool = False, precision: str = "f32",
    origin=None, bounds=None, tile_rows: int = None,
):
    """One forward à-trous level on TPU. Returns (color', variance', norm)
    plus, with ``save_weights``, the (n_taps, H, W) weight planes the
    stored-weight backward kernel consumes.

    ``sigma_denom`` only ever contributes at tap *centers*, so it enters as a
    center-blocked VMEM input (no halo staging) pre-inverted and pre-scaled
    by log2(e) XLA-side (fused into the pad copies)."""
    H, W = depth.shape
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    align = 16 if precision == "bf16" else 8  # sublane packing granularity
    ebytes = 2 if precision == "bf16" else 4
    Wp = _round_up(W, 128)  # DMA minor-dim lane alignment
    spacing = 1 << level
    halo_pad = _round_up(params.radius * spacing, align)
    # haloed scratch: 8 planes; double-buffered center blocks: zgrad+isd+outs
    n_taps = (2 * params.radius + 1) ** 2
    n_center = 8 + (n_taps if save_weights else 0)
    TH = tile_rows or _pick_tile_rows(
        H, Wp, halo_pad, n_haloed_planes=16,
        n_center_planes=n_center, n_temp_planes=3 * n_taps,
        elem_bytes=ebytes, align=align)
    H_pad = _round_up(H, TH)
    grid = H_pad // TH
    BLK = TH + 2 * halo_pad
    plane_dims = (3, 3, None, None)  # color, normal, depth, var

    out_specs = [_center_spec(3, TH, Wp), _center_spec(None, TH, Wp),
                 _center_spec(None, TH, Wp)]
    out_shape = [jax.ShapeDtypeStruct((3, H_pad, Wp), jnp.float32),
                 jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32),
                 jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32)]
    if save_weights:
        out_specs.append(_center_spec(n_taps, TH, Wp))
        out_shape.append(jax.ShapeDtypeStruct((n_taps, H_pad, Wp), jnp.float32))

    isd2 = _LOG2E / jnp.maximum(sigma_denom, _EPS)
    with_origin = origin is not None
    if with_origin:
        Hm, Wm = bounds
    else:
        Hm, Wm = H, W
    kernel = _make_level_kernel(Hm, Wm, TH, halo_pad, spacing, params, "fwd",
                                n_hbm=4, Wp=Wp, save_w=save_weights,
                                dtype=dtype, with_origin=with_origin)
    org_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] if with_origin
                 else [])
    org_args = ((jnp.stack([origin[0], origin[1]]).astype(jnp.int32),)
                if with_origin else ())
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=org_specs
        + [_hbm_spec()] * 4 + [_center_spec(2, TH, Wp),
                               _center_spec(None, TH, Wp)],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=_scratch_tiles(plane_dims, BLK, Wp, dtype)
        + [pltpu.SemaphoreType.DMA((2, 4))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(
        *org_args,
        _pad_rows_halo(color.astype(dtype), H_pad, halo_pad, Wp),
        _pad_rows_halo(normal.astype(dtype), H_pad, halo_pad, Wp),
        _pad_rows_halo(depth.astype(dtype), H_pad, halo_pad, Wp),
        _pad_rows_halo(variance.astype(dtype), H_pad, halo_pad, Wp),
        _pad_rows(zgrad, H_pad, Wp),
        _pad_rows(isd2.astype(dtype), H_pad, Wp),
    )
    cout, vout, nout = outs[:3]
    if save_weights:
        return (cout[:, :H, :W], vout[:H, :W], nout[:H, :W],
                outs[3][:, :H, :W])
    return cout[:, :H, :W], vout[:H, :W], nout[:H, :W]


@functools.partial(jax.jit, static_argnames=("level", "params", "interpret",
                                              "precision", "bounds",
                                              "tile_rows"))
def atrous_level_bwd_pallas(
    color, normal, depth, zgrad, sigma_denom, norm, g_color, g_var,
    *, level: int, params: SVGFParams, interpret: bool = False,
    precision: str = "f32", origin=None, bounds=None, tile_rows: int = None,
) -> Tuple[jax.Array, jax.Array]:
    """Adjoint (detached weights): returns (d_color, d_variance).

    XLA-side precomputes (fused into the halo-pad copies): luminance (the
    only thing the 3 color planes were staged for), ``u = g/N`` and
    ``u2 = g_v/N²`` (kills the per-tap divide-by-norm), and the log2e-scaled
    inverse sigma (kills the per-tap luminance-weight divide)."""
    H, W = depth.shape
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    align = 16 if precision == "bf16" else 8
    ebytes = 2 if precision == "bf16" else 4
    Wp = _round_up(W, 128)
    spacing = 1 << level
    halo_pad = _round_up(params.radius * spacing, align)
    n_taps = (2 * params.radius + 1) ** 2
    TH = tile_rows or _pick_tile_rows(
        H, Wp, halo_pad, n_haloed_planes=24, n_center_planes=4,
        n_temp_planes=4 * n_taps, elem_bytes=ebytes, align=align)
    H_pad = _round_up(H, TH)
    grid = H_pad // TH
    BLK = TH + 2 * halo_pad
    # lum, normal, depth, isd2, zgrad, u, u2
    plane_dims = (None, 3, None, None, 2, 3, None)

    lum = (_LUMA[0] * color[0] + _LUMA[1] * color[1] + _LUMA[2] * color[2])
    isd2 = _LOG2E / jnp.maximum(sigma_denom, _EPS)
    inv_n = 1.0 / jnp.maximum(norm, _EPS)
    u = g_color * inv_n[None]
    u2 = g_var * (inv_n * inv_n)

    with_origin = origin is not None
    if with_origin:
        Hm, Wm = bounds
    else:
        Hm, Wm = H, W
    kernel = _make_level_kernel(Hm, Wm, TH, halo_pad, spacing, params, "bwd",
                                n_hbm=7, Wp=Wp, dtype=dtype,
                                with_origin=with_origin)
    org_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] if with_origin
                 else [])
    org_args = ((jnp.stack([origin[0], origin[1]]).astype(jnp.int32),)
                if with_origin else ())
    dcol, dvar = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=org_specs + [_hbm_spec()] * 7,
        out_specs=(
            _center_spec(3, TH, Wp),
            _center_spec(None, TH, Wp),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, H_pad, Wp), jnp.float32),
            jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32),
        ),
        scratch_shapes=_scratch_tiles(plane_dims, BLK, Wp, dtype)
        + [pltpu.SemaphoreType.DMA((2, 7))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(
        *org_args,
        _pad_rows_halo(lum.astype(dtype), H_pad, halo_pad, Wp),
        _pad_rows_halo(normal.astype(dtype), H_pad, halo_pad, Wp),
        _pad_rows_halo(depth.astype(dtype), H_pad, halo_pad, Wp),
        _pad_rows_halo(isd2.astype(dtype), H_pad, halo_pad, Wp),
        _pad_rows_halo(zgrad.astype(dtype), H_pad, halo_pad, Wp),
        _pad_rows_halo(u.astype(dtype), H_pad, halo_pad, Wp),
        _pad_rows_halo(u2.astype(dtype), H_pad, halo_pad, Wp),
    )
    return dcol[:, :H, :W], dvar[:H, :W]


# ---------------------------------------------------------------------------
# custom-VJP wrapper: the public differentiable op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def atrous_level(color, variance, normal, depth, zgrad, sigma_denom,
                 level: int, params: SVGFParams, interpret: bool = False,
                 precision: str = "f32", weight_grads: bool = False):
    c, v, _ = atrous_level_fwd_pallas(
        color, variance, normal, depth, zgrad, sigma_denom,
        level=level, params=params, interpret=interpret, precision=precision,
    )
    return c, v


@functools.partial(jax.jit, static_argnames=("level", "params", "interpret"))
def atrous_level_bwd_stored_pallas(
    weights, norm, g_color, g_var,
    *, level: int, params: SVGFParams, interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Adjoint using the forward pass's stored weight planes."""
    H, W = norm.shape
    Wp = _round_up(W, 128)
    spacing = 1 << level
    halo_pad = _round_up(params.radius * spacing, 8)
    n_taps = (2 * params.radius + 1) ** 2
    # haloed: weights(n_taps) + norm + g_color(3) + g_var(1), double-buffered
    TH = _pick_tile_rows(H, Wp, halo_pad,
                         n_haloed_planes=2 * (n_taps + 5), n_center_planes=4,
                         n_temp_planes=2 * n_taps)
    H_pad = _round_up(H, TH)
    grid = H_pad // TH
    BLK = TH + 2 * halo_pad

    kernel = _make_bwd_stored_kernel(TH, halo_pad, spacing, params, Wp)
    dcol, dvar = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[_hbm_spec()] * 4,
        out_specs=(
            _center_spec(3, TH, Wp),
            _center_spec(None, TH, Wp),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, H_pad, Wp), jnp.float32),
            jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, n_taps, BLK, Wp), jnp.float32),
            pltpu.VMEM((2, BLK, Wp), jnp.float32),
            pltpu.VMEM((2, 3, BLK, Wp), jnp.float32),
            pltpu.VMEM((2, 1, BLK, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(
        _pad_rows_halo(weights, H_pad, halo_pad, Wp),
        _pad_rows_halo(jnp.maximum(norm, _EPS), H_pad, halo_pad, Wp),
        _pad_rows_halo(g_color, H_pad, halo_pad, Wp),
        _pad_rows_halo(g_var[None], H_pad, halo_pad, Wp),
    )
    return dcol[:, :H, :W], dvar[:H, :W]


def _atrous_fwd(color, variance, normal, depth, zgrad, sigma_denom,
                level, params, interpret, precision, weight_grads):
    # Recompute-weights backward: measured FASTER than the stored-weight
    # variant (151.7 vs 125.3 Mpix/s fwd+bwd at 1080p) — the kernels are
    # movement-bound, and staging 25 stored weight planes costs more HBM/VMEM
    # traffic than re-deriving the weights from the 8 guidance planes.
    # atrous_level_bwd_stored_pallas remains available for experiments.
    c, v, n = atrous_level_fwd_pallas(
        color, variance, normal, depth, zgrad, sigma_denom,
        level=level, params=params, interpret=interpret, precision=precision,
    )
    if weight_grads:
        res = (color, variance, normal, depth, zgrad, sigma_denom, c, v, n)
    else:
        res = (color, normal, depth, zgrad, sigma_denom, n)
    return (c, v), res


def _atrous_bwd(level, params, interpret, precision, weight_grads, res, g):
    gc, gv = g
    if weight_grads:
        color, variance, normal, depth, zgrad, sigma_denom, oc, ov, n = res
        return atrous_level_wgrad_bwd_pallas(
            color, variance, normal, depth, zgrad, sigma_denom,
            oc, ov, n, gc, gv,
            level=level, params=params, interpret=interpret,
        )
    color, normal, depth, zgrad, sigma_denom, n = res
    dcol, dvar = atrous_level_bwd_pallas(
        color, normal, depth, zgrad, sigma_denom, n, gc, gv,
        level=level, params=params, interpret=interpret, precision=precision,
    )
    zero = jnp.zeros_like
    return dcol, dvar, zero(normal), zero(depth), zero(zgrad), zero(sigma_denom)


atrous_level.defvjp(_atrous_fwd, _atrous_bwd)


@functools.partial(jax.jit, static_argnames=("params", "return_feedback",
                                              "interpret", "precision",
                                              "weight_grads", "chained",
                                              "tile_rows", "bwd_impl",
                                              "weight_math"))
def svgf_spatial_pallas(
    color, variance, normal, depth,
    *, params: SVGFParams = SVGFParams(), return_feedback: bool = False,
    interpret: bool = False, precision: str = "f32",
    weight_grads: bool = False, chained: bool = True, tile_rows: int = None,
    bwd_impl: str = "stored", weight_math: str = "exact",
):
    """Full multi-level à-trous sweep on TPU (drop-in for ``svgf_spatial_ref``
    with ``detach_weights=True``).

    The default f32 detached path runs canvas-chained (``chained=True``):
    levels communicate through halo-margin canvases with zero inter-level
    pad/crop copies; results are bit-identical to the per-level path
    (``chained=False``), which remains for the bf16 and weight-grads modes
    and for A/B timing.

    ``precision="bf16"`` runs the kernels' staged planes and tap math in
    bfloat16 with f32 accumulators — ~half the VPU byte movement for a
    quality loss characterized in tools/quality_eval.py.

    ``weight_grads=True`` selects the full non-detached adjoint
    (``detach_weights=False`` semantics): gradients flow through the
    edge-stopping weights into the guidance planes, and the per-level
    sigma denominator keeps its dependence on the filtered variance so
    XLA backpropagates the blur/sqrt chain into d_variance.

    ``bwd_impl`` picks the chained path's detached adjoint strategy:
    ``"stored"`` (default) has the forward emit its 25 weight planes in
    bfloat16 and runs the FMA-only stored-weight backward (DMA-bound;
    measured 269.7 vs 212.0 Mpix/s fwd+bwd at 1080p vs recomputation —
    gradients carry the bf16 weight quantization, ≤0.1% relative);
    ``"stored_f32"`` stores them in f32 (recip-ulp-level match to
    ``"recompute"``, twice the weight traffic); ``"recompute"`` re-derives
    the weights in the backward kernel (the round-1 strategy — exact
    transposed-stencil adjoint of the forward's weights, no storage).

    ``weight_math="fast"`` (chained path, stored bwd only) computes each
    tap weight as ONE deg-3 exp2 — the normal weight folds into the exp
    argument via the exp-form identity (see bf16 mode) — for a ~1.4e-4
    relative weight error vs ``"exact"``'s ~1e-7.  Output error stays
    ~60 dB below signal; tests/test_atrous_pallas.py bounds it.

    ``bwd_impl="none"`` (round 5): INFERENCE-ONLY forward — the fused
    in-kernel σ-denominator of the stored path WITHOUT the stored-weight
    canvas writes (the frame pipeline was paying ~25 bf16 plane-writes per
    level for an adjoint it never runs).  Identical forward results;
    differentiating it raises.
    """
    if bwd_impl not in ("stored", "stored_f32", "recompute", "none"):
        raise ValueError(f"unknown bwd_impl: {bwd_impl!r}")
    if weight_math not in ("exact", "fast"):
        raise ValueError(f"unknown weight_math: {weight_math!r}")
    if weight_math == "fast" and bwd_impl == "recompute":
        # the recompute adjoint re-derives weights with the exact math; its
        # transposed stencil would not match a fast-weights forward
        raise ValueError("weight_math='fast' requires a stored bwd_impl")
    if params.pyramid_from is not None:
        raise NotImplementedError(
            "pyramid_from (half-res deep levels) is a jnp-oracle experiment "
            "only — it FAILED the two-scene quality gate (−0.48/−0.60 dB, "
            "ROADMAP round 5) and was closed; unset it for the kernel path")
    if params.luma_only_from is not None and (
            bwd_impl == "recompute" or not chained or weight_grads
            or precision != "f32"):
        # the stored adjoint is weight-agnostic, so the luma-only mode needs
        # no backward changes — but only on the chained stored path (or the
        # gradient-free inference mode)
        raise ValueError("luma_only_from requires the chained f32 "
                         "detached path with a stored or 'none' bwd_impl")
    on_chained = (chained and not weight_grads and precision == "f32"
                  and params.iterations > 0)
    if weight_math == "fast" and not on_chained:
        raise ValueError("weight_math='fast' is implemented on the chained "
                         "f32 detached path only")
    if (chained and not weight_grads and precision == "f32"
            and params.iterations > 0):
        c, v, feedback = _svgf_chained(
            color, variance, normal, depth,
            (params, interpret, tile_rows, bwd_impl, weight_math))
        if return_feedback:
            return c, v, feedback
        return c, v

    zgrad = finite_diff_gradients(depth)
    c, v = color, variance
    feedback = color
    for lvl in range(params.iterations):
        v_for_sigma = v if weight_grads else jax.lax.stop_gradient(v)
        sigma_denom = params.sigma_color * jnp.sqrt(
            jnp.maximum(variance_blur3x3(v_for_sigma), 0.0)
        ) + _EPS
        c, v = atrous_level(c, v, normal, depth, zgrad, sigma_denom,
                            lvl, params, interpret, precision, weight_grads)
        if lvl + 1 == params.feedback_level:
            feedback = c
    if return_feedback:
        return c, v, feedback
    return c, v


# ---------------------------------------------------------------------------
# weight-gradient backward (detach_weights=False): gradients through the
# edge-stopping weights themselves (SURVEY.md §7 hard part (a), second term)
# ---------------------------------------------------------------------------
#
# With A_p(d) := ∂L/∂w_p(d) expanded from the normalized filter
#     out_c = Σ w c_q / N,  out_v = Σ w² v_q / N²,
#     A_p(d) = gc_p·(c_q − out_c_p)/N_p + gv_p·(2 w v_q/N_p² − 2 out_v_p/N_p),
# every input θ receives Σ A·∂w/∂θ in two spatial shapes: a CENTER term
# (θ at p, summed over p's own taps — forward-shaped stencil) and a NEIGHBOR
# term (θ at q = p+d, transformed to a gather at x with p = x−d — the same
# transposed shape as the detached adjoint).  The log-derivatives of
#     w = h·m·exp(−|Δz|·RZ − |Δl|·SD)·(n_p·n_q)^σ,
#     RZ = 1/(σ_z|∇z_p·d| + ε),  SD = 1/sden_p
# give the per-θ factors implemented below.  Data-linear terms (the detached
# transposed stencil for c and v) ride along in the neighbor kernel, so the
# wgrad mode REPLACES atrous_level_bwd_pallas rather than adding to it.


def _wgrad_tap_math(params, z_a, z_b, l_a, l_b, n_a, n_b, isd_a, zg_a,
                    oy, ox, hfm):
    """Weight + log-derivative factors for center a, neighbor b, tap (oy,ox).

    Returns (w, dz_sign_term, dl_sign_term, ndot) where the *_sign_term are
    ∂E/∂(z_a,l_a) = −sign(Δ)·scale (negate for the b side), plus RZ for the
    zgrad chain.  Natural exp units (no log2e folding) for clarity."""
    sz = params.sigma_depth
    az = jnp.abs(zg_a[0] * oy + zg_a[1] * ox)
    rz = _recip(sz * az + _EPS)
    dz = z_a - z_b
    dl = l_a - l_b
    e = -jnp.abs(dz) * rz - jnp.abs(dl) * isd_a
    ndot = jnp.maximum(n_a[0] * n_b[0] + n_a[1] * n_b[1] + n_a[2] * n_b[2],
                       0.0)
    p = params.sigma_normal
    ip = int(p)
    if ip == p and ip > 0 and (ip & (ip - 1)) == 0 and ip <= 1024:
        pw = ndot
        while ip > 1:
            pw = pw * pw
            ip >>= 1
    else:
        pw = jnp.power(jnp.maximum(ndot, 1e-20), p)
    w = hfm * _exp_fast(e) * pw
    return w, dz, dl, rz, ndot


def _make_wgrad_center_kernel(H, W, TH, halo_pad, spacing, params, Wp):
    """Center terms: for each pixel x, Σ over its own taps e of
    A_x(e)·∂w_x(e)/∂θ_x for θ ∈ {normal, depth, zgrad, sden, lum}."""
    r = params.radius
    taps1d = _spline_taps(r)
    C = halo_pad
    BLK = TH + 2 * halo_pad
    n_hbm = 4  # c, v, n, z staged with halo

    def kernel(c_hbm, v_hbm, n_hbm_ref, z_hbm,
               gc_ref, gv_ref, outc_ref, outv_ref, nrm_ref, isd_ref, zg_ref,
               dn_ref, dz_ref, dzg_ref, dsd_ref, dl_ref,
               c_s, v_s, n_s, z_s, sems):
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        hbm = (c_hbm, v_hbm, n_hbm_ref, z_hbm)
        scratch = (c_s, v_s, n_s, z_s)

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

        c_t, v_t, n_t, z_t = (s[slot] for s in scratch)
        lum_t = (_LUMA[0] * c_t[0] + _LUMA[1] * c_t[1] + _LUMA[2] * c_t[2])

        gc = gc_ref[:]
        gv = gv_ref[:]
        outc = outc_ref[:]
        outv = outv_ref[:]
        inv_n = _recip(jnp.maximum(nrm_ref[:], _EPS))
        isd = isd_ref[:]          # 1/sden (natural units)
        zg = zg_ref[:]

        c_c = _rows(c_t, C, TH)
        l_c = _rows(lum_t, C, TH)
        n_c = _rows(n_t, C, TH)
        z_c = _rows(z_t, C, TH)

        gy = b * TH + jax.lax.broadcasted_iota(jnp.int32, (TH, Wp), 0)
        gx = jax.lax.broadcasted_iota(jnp.int32, (TH, Wp), 1)
        row_m = {dy: ((gy + dy * spacing >= 0)
                      & (gy + dy * spacing < H)).astype(jnp.float32)
                 for dy in range(-r, r + 1)}
        col_m = {dx: ((gx + dx * spacing >= 0)
                      & (gx + dx * spacing < W)).astype(jnp.float32)
                 for dx in range(-r, r + 1)}
        # pre-fold the separable 1-D spline weights into the masks (one
        # multiply per tap instead of two; same fold as the fused kernel)
        row_mh = {dy: taps1d[dy + r] * m for dy, m in row_m.items()}
        col_mh = {dx: taps1d[dx + r] * m for dx, m in col_m.items()}

        dn = jnp.zeros((3, TH, Wp), jnp.float32)
        dz_a = jnp.zeros((TH, Wp), jnp.float32)
        dzg = jnp.zeros((2, TH, Wp), jnp.float32)
        dsd = jnp.zeros((TH, Wp), jnp.float32)
        dl = jnp.zeros((TH, Wp), jnp.float32)

        _rolled = {}

        def shifted(x, oy, ox):
            key = (id(x), ox)
            if key not in _rolled:
                _rolled[key] = _col_roll(x, ox)
            return _rows(_rolled[key], C + oy, TH)

        sz = params.sigma_depth
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                oy, ox = dy * spacing, dx * spacing
                hfm = row_mh[dy] * col_mh[dx]
                c_q = shifted(c_t, oy, ox)
                v_q = shifted(v_t, oy, ox)
                n_q = shifted(n_t, oy, ox)
                z_q = shifted(z_t, oy, ox)
                l_q = shifted(lum_t, oy, ox)

                w, dz, dlt, rz, ndot = _wgrad_tap_math(
                    params, z_c, z_q, l_c, l_q, n_c, n_q, isd, zg,
                    oy, ox, hfm)

                a = ((gc[0] * (c_q[0] - outc[0]) + gc[1] * (c_q[1] - outc[1])
                      + gc[2] * (c_q[2] - outc[2]))
                     + gv * (2.0 * w * v_q * inv_n - 2.0 * outv)) * inv_n
                bfac = a * w

                dz_a = dz_a - bfac * jnp.sign(dz) * rz
                dl = dl - bfac * jnp.sign(dlt) * isd
                dsd = dsd + bfac * jnp.abs(dlt) * (isd * isd)
                zdot = zg[0] * oy + zg[1] * ox
                gz_f = bfac * jnp.abs(dz) * (rz * rz) * sz * jnp.sign(zdot)
                dzg = dzg + jnp.stack([gz_f * oy, gz_f * ox])
                nf = bfac * params.sigma_normal * _recip(
                    jnp.maximum(ndot, 1e-20))
                dn = dn + nf[None] * n_q

        dn_ref[:] = dn
        dz_ref[:] = dz_a
        dzg_ref[:] = dzg
        dsd_ref[:] = dsd
        dl_ref[:] = dl

    return kernel


def _make_wgrad_neighbor_kernel(H, W, TH, halo_pad, spacing, params, Wp):
    """Neighbor terms at x (p = x−d): transposed data stencil (detached
    adjoint) + Σ A_p(d)·∂w_p(d)/∂θ_x for θ ∈ {normal, depth, lum}."""
    r = params.radius
    taps1d = _spline_taps(r)
    C = halo_pad
    BLK = TH + 2 * halo_pad
    # staged: lum, n(3), z, zg(2), isd, gc(3), gv, outc(3), outv, invn
    plane_list = ("lum", "n", "z", "zg", "isd", "gc", "gv", "outc", "outv",
                  "invn")

    def kernel(lum_hbm, n_hbm, z_hbm, zg_hbm, isd_hbm, gc_hbm, gv_hbm,
               outc_hbm, outv_hbm, invn_hbm,
               c_ref, v_ref, n_c_ref, z_c_ref,
               dc_ref, dv_ref, dn_ref, dz_ref, dl_ref,
               lum_s, n_s, z_s, zg_s, isd_s, gc_s, gv_s, outc_s, outv_s,
               invn_s, sems):
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        hbm = (lum_hbm, n_hbm, z_hbm, zg_hbm, isd_hbm, gc_hbm, gv_hbm,
               outc_hbm, outv_hbm, invn_hbm)
        scratch = (lum_s, n_s, z_s, zg_s, isd_s, gc_s, gv_s, outc_s, outv_s,
                   invn_s)

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

        (lum_t, n_t, z_t, zg_t, isd_t, gc_t, gv_t, outc_t, outv_t,
         invn_t) = (s[slot] for s in scratch)

        c_x = c_ref[:]       # (3, TH, Wp) current-level color at x
        v_x = v_ref[:]
        n_x = n_c_ref[:]
        z_x = z_c_ref[:]
        l_x = (_LUMA[0] * c_x[0] + _LUMA[1] * c_x[1] + _LUMA[2] * c_x[2])

        gy = b * TH + jax.lax.broadcasted_iota(jnp.int32, (TH, Wp), 0)
        gx = jax.lax.broadcasted_iota(jnp.int32, (TH, Wp), 1)
        in_img = (gy < H).astype(jnp.float32)
        # masks for center p = x − d being in-image
        row_m = {dy: ((gy - dy * spacing >= 0)
                      & (gy - dy * spacing < H)).astype(jnp.float32) * in_img
                 for dy in range(-r, r + 1)}
        col_m = {dx: ((gx - dx * spacing >= 0)
                      & (gx - dx * spacing < W)).astype(jnp.float32)
                 for dx in range(-r, r + 1)}
        row_mh = {dy: taps1d[dy + r] * m for dy, m in row_m.items()}
        col_mh = {dx: taps1d[dx + r] * m for dx, m in col_m.items()}

        dc = jnp.zeros((3, TH, Wp), jnp.float32)
        dv = jnp.zeros((TH, Wp), jnp.float32)
        dn = jnp.zeros((3, TH, Wp), jnp.float32)
        dz_a = jnp.zeros((TH, Wp), jnp.float32)
        dl = jnp.zeros((TH, Wp), jnp.float32)

        _rolled = {}

        def shifted(x, oy, ox):
            key = (id(x), ox)
            if key not in _rolled:
                _rolled[key] = _col_roll(x, ox)
            return _rows(_rolled[key], C + oy, TH)

        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                # p = x − d
                oy, ox = -dy * spacing, -dx * spacing
                hfm = row_mh[dy] * col_mh[dx]
                l_p = shifted(lum_t, oy, ox)
                n_p = shifted(n_t, oy, ox)
                z_p = shifted(z_t, oy, ox)
                zg_p = shifted(zg_t, oy, ox)
                isd_p = shifted(isd_t, oy, ox)
                gc_p = shifted(gc_t, oy, ox)
                gv_p = shifted(gv_t, oy, ox)
                outc_p = shifted(outc_t, oy, ox)
                outv_p = shifted(outv_t, oy, ox)
                invn_p = shifted(invn_t, oy, ox)

                w, dz, dlt, rz, ndot = _wgrad_tap_math(
                    params, z_p, z_x, l_p, l_x, n_p, n_x, isd_p, zg_p,
                    dy * spacing, dx * spacing, hfm)

                # transposed data stencil (the detached adjoint)
                w_over_n = w * invn_p
                dc = dc + w_over_n[None] * gc_p
                dv = dv + (w_over_n * w_over_n) * gv_p

                a = ((gc_p[0] * (c_x[0] - outc_p[0])
                      + gc_p[1] * (c_x[1] - outc_p[1])
                      + gc_p[2] * (c_x[2] - outc_p[2]))
                     + gv_p * (2.0 * w * v_x * invn_p - 2.0 * outv_p)
                     ) * invn_p
                bfac = a * w

                # θ at x is the *b side* of the tap: signs flip
                dz_a = dz_a + bfac * jnp.sign(dz) * rz
                dl = dl + bfac * jnp.sign(dlt) * isd_p
                nf = bfac * params.sigma_normal * _recip(
                    jnp.maximum(ndot, 1e-20))
                dn = dn + nf[None] * n_p

        dc_ref[:] = dc
        dv_ref[:] = dv
        dn_ref[:] = dn
        dz_ref[:] = dz_a
        dl_ref[:] = dl

    return kernel


@functools.partial(jax.jit, static_argnames=("level", "params", "interpret"))
def atrous_level_wgrad_bwd_pallas(
    color, variance, normal, depth, zgrad, sigma_denom,
    out_c, out_v, norm, g_color, g_var,
    *, level: int, params: SVGFParams, interpret: bool = False,
):
    """Full (non-detached) adjoint of one à-trous level.

    Returns (d_color, d_variance, d_normal, d_depth, d_zgrad, d_sigma_denom)
    matching jnp autodiff of ``atrous_level_ref(detach_weights=False)`` up to
    the EPS clamp on the normalization (measure-zero).  Runs as two band
    kernels: center terms + neighbor terms (see module comment).
    """
    H, W = depth.shape
    Wp = _round_up(W, 128)
    spacing = 1 << level
    halo_pad = _round_up(params.radius * spacing, 8)
    n_taps = (2 * params.radius + 1) ** 2
    TH = _pick_tile_rows(H, Wp, halo_pad, n_haloed_planes=28,
                         n_center_planes=22, n_temp_planes=6 * n_taps)
    H_pad = _round_up(H, TH)
    grid = H_pad // TH
    BLK = TH + 2 * halo_pad

    lum = (_LUMA[0] * color[0] + _LUMA[1] * color[1] + _LUMA[2] * color[2])
    isd = 1.0 / jnp.maximum(sigma_denom, _EPS)
    inv_n = 1.0 / jnp.maximum(norm, _EPS)

    ck = _make_wgrad_center_kernel(H, W, TH, halo_pad, spacing, params, Wp)
    dn1, dz1, dzg, dsd, dl1 = pl.pallas_call(
        ck,
        grid=(grid,),
        in_specs=[_hbm_spec()] * 4 + [
            _center_spec(3, TH, Wp), _center_spec(None, TH, Wp),
            _center_spec(3, TH, Wp), _center_spec(None, TH, Wp),
            _center_spec(None, TH, Wp), _center_spec(None, TH, Wp),
            _center_spec(2, TH, Wp)],
        out_specs=(
            _center_spec(3, TH, Wp), _center_spec(None, TH, Wp),
            _center_spec(2, TH, Wp), _center_spec(None, TH, Wp),
            _center_spec(None, TH, Wp)),
        out_shape=(
            jax.ShapeDtypeStruct((3, H_pad, Wp), jnp.float32),
            jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32),
            jax.ShapeDtypeStruct((2, H_pad, Wp), jnp.float32),
            jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32),
            jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32)),
        scratch_shapes=_scratch_tiles((3, None, 3, None), BLK, Wp)
        + [pltpu.SemaphoreType.DMA((2, 4))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(
        _pad_rows_halo(color, H_pad, halo_pad, Wp),
        _pad_rows_halo(variance, H_pad, halo_pad, Wp),
        _pad_rows_halo(normal, H_pad, halo_pad, Wp),
        _pad_rows_halo(depth, H_pad, halo_pad, Wp),
        _pad_rows(g_color, H_pad, Wp),
        _pad_rows(g_var, H_pad, Wp),
        _pad_rows(out_c, H_pad, Wp),
        _pad_rows(out_v, H_pad, Wp),
        _pad_rows(norm, H_pad, Wp),
        _pad_rows(isd, H_pad, Wp),
        _pad_rows(zgrad, H_pad, Wp),
    )

    nk = _make_wgrad_neighbor_kernel(H, W, TH, halo_pad, spacing, params, Wp)
    dc, dv, dn2, dz2, dl2 = pl.pallas_call(
        nk,
        grid=(grid,),
        in_specs=[_hbm_spec()] * 10 + [
            _center_spec(3, TH, Wp), _center_spec(None, TH, Wp),
            _center_spec(3, TH, Wp), _center_spec(None, TH, Wp)],
        out_specs=(
            _center_spec(3, TH, Wp), _center_spec(None, TH, Wp),
            _center_spec(3, TH, Wp), _center_spec(None, TH, Wp),
            _center_spec(None, TH, Wp)),
        out_shape=(
            jax.ShapeDtypeStruct((3, H_pad, Wp), jnp.float32),
            jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32),
            jax.ShapeDtypeStruct((3, H_pad, Wp), jnp.float32),
            jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32),
            jax.ShapeDtypeStruct((H_pad, Wp), jnp.float32)),
        scratch_shapes=_scratch_tiles(
            (None, 3, None, 2, None, 3, None, 3, None, None), BLK, Wp)
        + [pltpu.SemaphoreType.DMA((2, 10))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(
        _pad_rows_halo(lum, H_pad, halo_pad, Wp),
        _pad_rows_halo(normal, H_pad, halo_pad, Wp),
        _pad_rows_halo(depth, H_pad, halo_pad, Wp),
        _pad_rows_halo(zgrad, H_pad, halo_pad, Wp),
        _pad_rows_halo(isd, H_pad, halo_pad, Wp),
        _pad_rows_halo(g_color, H_pad, halo_pad, Wp),
        _pad_rows_halo(g_var, H_pad, halo_pad, Wp),
        _pad_rows_halo(out_c, H_pad, halo_pad, Wp),
        _pad_rows_halo(out_v, H_pad, halo_pad, Wp),
        _pad_rows_halo(inv_n, H_pad, halo_pad, Wp),
        _pad_rows(color, H_pad, Wp),
        _pad_rows(variance, H_pad, Wp),
        _pad_rows(normal, H_pad, Wp),
        _pad_rows(depth, H_pad, Wp),
    )

    luma = jnp.asarray(_LUMA, jnp.float32)
    d_lum = (dl1 + dl2)[:H, :W]
    d_color = dc[:, :H, :W] + luma[:, None, None] * d_lum[None]
    d_variance = dv[:H, :W]
    d_normal = (dn1 + dn2)[:, :H, :W]
    d_depth = (dz1 + dz2)[:H, :W]
    d_zgrad = dzg[:, :H, :W]
    d_sden = dsd[:H, :W]
    return d_color, d_variance, d_normal, d_depth, d_zgrad, d_sden


# ---------------------------------------------------------------------------
# sharded-tile entry: the Pallas kernels inside shard_map
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def atrous_level_tile(color_p, variance_p, normal_p, depth_p, zgrad_p,
                      sigma_denom_p, origin,
                      level: int, params: SVGFParams,
                      bounds: Tuple[int, int], interpret: bool = False):
    """One à-trous level on a halo-exchanged device tile (call inside
    shard_map) — the Pallas kernels replacing ``svgf_spatial_local``'s jnp
    oracle math (VERDICT round-1 next-step #5).

    Inputs are tiles padded by ``h = radius * 2^level`` on both spatial axes
    (from ``parallel.halo.exchange_halo2d``); ``origin`` is the tile's
    global (row0, col0) — a traced per-device scalar pair — and ``bounds``
    the global image shape.  The tile-with-halo is processed as a small
    image whose border masks test *global* coordinates (halo pixels are
    in-image neighbor data; only taps beyond the global border drop), and
    the h-wide halo ring of computed output is cropped.  The adjoint runs
    the transposed kernel over the same tile shape and returns gradients
    for the *haloed* inputs — shard_map's ppermute transpose then routes
    halo gradients back to the owning devices.
    """
    out, _res = _atrous_tile_fwd(color_p, variance_p, normal_p, depth_p,
                                 zgrad_p, sigma_denom_p, origin,
                                 level, params, bounds, interpret)
    return out


def _atrous_tile_fwd(color_p, variance_p, normal_p, depth_p, zgrad_p,
                     sigma_denom_p, origin, level, params, bounds, interpret):
    h = params.radius << level
    ry, cx = origin
    org = (ry - h, cx - h)  # tile-as-image origin includes the halo ring
    c, v, n = atrous_level_fwd_pallas(
        color_p, variance_p, normal_p, depth_p, zgrad_p, sigma_denom_p,
        level=level, params=params, interpret=interpret,
        origin=org, bounds=bounds,
    )
    out = (c[:, h:c.shape[-2] - h, h:c.shape[-1] - h],
           v[h:v.shape[-2] - h, h:v.shape[-1] - h])
    res = (color_p, normal_p, depth_p, zgrad_p, sigma_denom_p, n, origin)
    return out, res


def _atrous_tile_bwd(level, params, bounds, interpret, res, g):
    color_p, normal_p, depth_p, zgrad_p, sigma_denom_p, n, origin = res
    gc, gv = g
    h = params.radius << level
    ry, cx = origin
    org = (ry - h, cx - h)
    pad = [(0, 0)] * (gc.ndim - 2) + [(h, h), (h, h)]
    gc_p = jnp.pad(gc, pad)
    gv_p = jnp.pad(gv, [(h, h), (h, h)])
    dcol, dvar = atrous_level_bwd_pallas(
        color_p, normal_p, depth_p, zgrad_p, sigma_denom_p, n, gc_p, gv_p,
        level=level, params=params, interpret=interpret,
        origin=org, bounds=bounds,
    )
    zero = jnp.zeros_like
    d_org = jax.tree.map(
        lambda x: np.zeros(jnp.shape(x), jax.dtypes.float0), origin)
    return (dcol, dvar, zero(normal_p), zero(depth_p), zero(zgrad_p),
            zero(sigma_denom_p), d_org)


atrous_level_tile.defvjp(_atrous_tile_fwd, _atrous_tile_bwd)


# ---------------------------------------------------------------------------
# canvas-chained sweep: pad once, chain all levels through halo-margin
# canvases (no inter-level pad/crop copies)
# ---------------------------------------------------------------------------
#
# A "canvas" is a plane stored as (2M + H_pad, Wp): M zero margin rows top and
# bottom around H_pad center rows (image rows [0, H) plus finite compute
# overhang up to H_pad), lanes padded to Wp.  M covers the deepest level's
# halo, so every level's kernel stages its haloed band straight from the
# previous level's output canvas (row_base = M − halo) and writes its own
# output canvas via manual DMA (margins zeroed from band 0).  At 1080p this
# removes ~10 full-plane HBM round-trips per level that the per-level wrappers
# spend in `_pad_rows_halo`/crop (measured in tools/pad_probe.py).  Results
# are bit-identical to the per-level path: the canvases hold exactly the
# zero-padded arrays the wrappers used to rebuild each level.


def _canvas_pad(x: jax.Array, M: int, H_pad: int, Wp: int) -> jax.Array:
    H, W = x.shape[-2:]
    pad = [(0, 0)] * (x.ndim - 2) + [(M, H_pad - H + M), (0, Wp - W)]
    return jnp.pad(x, pad)


def _canvas_crop(x: jax.Array, M: int, H: int, W: int) -> jax.Array:
    idx = [slice(None)] * (x.ndim - 2) + [slice(M, M + H), slice(0, W)]
    return x[tuple(idx)]


def _chain_margin(params: SVGFParams) -> int:
    return _round_up(params.radius << max(params.iterations - 1, 0), 8)


def _chain_tiles(H: int, Wp: int, params: SVGFParams,
                 tile_rows: int = None,
                 bwd_impl: str = "recompute",
                 bwd_extra: int = 0) -> Tuple[int, int, int]:
    """(TH_fwd, TH_bwd, H_pad): one uniform fwd tile height across levels
    (sized for the deepest level's halo + the canvas out tiles), a bwd tile
    height dividing the same H_pad, and the shared center height.

    th_b must divide H_pad = round_up(H, th_f), so the two are chosen
    *jointly*: the VMEM caps alone can land on an H_pad with no good bwd
    divisor (1080 -> th_f 64 -> H_pad 1088 = 2^6·17 -> th_b 32, which
    doubles the deep levels' staged halo overdraw).  Score = total staged
    DMA rows over all levels fwd+bwd plus a small per-band constant (mask
    and iota setup are per-band VPU costs).

    ``bwd_extra``: the backward sweep's out region is H_pad + 2·bwd_extra
    rows (the sharded margin-writing adjoint, which emits ±M gradient rows
    for the ICI refresh transposes) — th_b must divide that instead."""
    M = _chain_margin(params)
    n_taps = (2 * params.radius + 1) ** 2
    w_planes = 0 if bwd_impl == "recompute" else (
        n_taps if bwd_impl == "stored_f32" else -(-n_taps // 2))
    cap_f = tile_rows or _pick_tile_rows(
        H, Wp, M, n_haloed_planes=16, n_center_planes=13 + w_planes,
        n_temp_planes=3 * n_taps)
    if bwd_impl == "recompute":
        cap_b = tile_rows or _pick_tile_rows(
            H, Wp, M, n_haloed_planes=24, n_center_planes=8,
            n_temp_planes=4 * n_taps)
    else:
        cap_b = tile_rows or _pick_tile_rows(
            H, Wp, M, n_haloed_planes=2 * (w_planes + 5), n_center_planes=4,
            n_temp_planes=2 * n_taps)
    halos = [_round_up(params.radius << l, 8)
             for l in range(max(params.iterations, 1))]
    best = None
    for tf in range(cap_f, 7, -8):
        H_pad = _round_up(H, tf)
        H_bwd = H_pad + 2 * bwd_extra
        tb = None
        for t in range(min(cap_b, H_bwd), 7, -8):
            if H_bwd % t == 0:
                tb = t
                break
        if tb is None:
            continue
        gf, gb = H_pad // tf, H_bwd // tb
        cost = sum(gf * (tf + 2 * h + 8) + gb * (tb + 2 * h + 8)
                   for h in halos)
        if best is None or cost < best[0]:
            best = (cost, tf, tb, H_pad)
    _, th_f, th_b, H_pad = best
    return th_f, th_b, H_pad


@functools.partial(jax.jit, static_argnames=(
    "level", "params", "TH", "margin", "bounds", "interpret", "save_w_dtype",
    "fast_weights", "luma_only"))
def atrous_level_fwd_canvas(colorC, varC, normalC, depthC, zgrad_cb, isd2_cb,
                            *, level: int, params: SVGFParams, TH: int,
                            margin: int, bounds: Tuple[int, int],
                            interpret: bool = False, save_w_dtype=None,
                            fast_weights: bool = False, origin=None,
                            luma_only: bool = False):
    """One forward level, canvas in / canvas out.  Returns (colorC', varC',
    normC) canvases — plus, with ``save_w_dtype`` set, the (n_taps, CH, Wp)
    stored-weight canvas the stored backward consumes (bf16 storage halves
    its HBM traffic; the weights are in [0, 1] so the 2^-8 relative
    quantization is benign — tests/test_atrous_pallas.py bounds it).
    ``zgrad_cb``/``isd2_cb`` are center-blocked (…, H_pad, Wp) as in the
    per-level wrapper; ``isd2_cb=None`` derives the σ-denominator in-kernel
    from the variance canvas (the chained stored-backward default — removes
    the per-level XLA blur pass).

    ``origin`` (sharded tile canvases): a traced (row0, col0) pair giving
    the GLOBAL image coordinate of the canvas's first *center* row and
    first *lane* — border masks then test global coordinates, so canvas
    margins holding exchanged neighbor data contribute like in-image
    pixels and only taps beyond the global border drop."""
    H, W = bounds
    CH, Wp = depthC.shape[-2:]
    H_pad = CH - 2 * margin
    spacing = 1 << level
    halo_pad = _round_up(params.radius * spacing, 8)
    grid = H_pad // TH
    BLK = TH + 2 * halo_pad
    save_w = save_w_dtype is not None
    fuse_isd = isd2_cb is None
    n_taps = (2 * params.radius + 1) ** 2
    with_origin = origin is not None
    n_hbm = 2 if luma_only else 4
    kernel = _make_level_kernel(H, W, TH, halo_pad, spacing, params, "fwd",
                                n_hbm=n_hbm, Wp=Wp,
                                row_base=margin - halo_pad,
                                out_margin=margin, save_w=save_w,
                                w_dtype=save_w_dtype,
                                fast_weights=fast_weights,
                                fuse_isd=fuse_isd, with_origin=with_origin,
                                luma_only=luma_only)
    sds = jax.ShapeDtypeStruct
    n_out = 4 if save_w else 3
    out_shape = [sds((3, CH, Wp), jnp.float32),
                 sds((CH, Wp), jnp.float32),
                 sds((CH, Wp), jnp.float32)]
    w_tiles, w_zeros = [], []
    if save_w:
        out_shape.append(sds((n_taps, CH, Wp), save_w_dtype))
        w_tiles = [pltpu.VMEM((2, n_taps, TH, Wp), save_w_dtype)]
        w_zeros = [pltpu.VMEM((n_taps, margin, Wp), save_w_dtype)]
    in_specs = [_hbm_spec()] * n_hbm + [_center_spec(2, TH, Wp)]
    if luma_only:
        args = (colorC, varC, zgrad_cb)
        plane_dims = (3, None)
    else:
        args = (colorC, normalC, depthC, varC, zgrad_cb)
        plane_dims = (3, 3, None, None)
    if not fuse_isd:
        in_specs.append(_center_spec(None, TH, Wp))
        args = args + (isd2_cb,)
    if with_origin:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = (jnp.stack([origin[0], origin[1]]).astype(jnp.int32),) + args
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=(_hbm_spec(),) * n_out,
        out_shape=tuple(out_shape),
        scratch_shapes=_scratch_tiles(plane_dims, BLK, Wp)
        + [pltpu.SemaphoreType.DMA((2, n_hbm))]
        + [pltpu.VMEM((2, 3, TH, Wp), jnp.float32),
           pltpu.VMEM((2, TH, Wp), jnp.float32),
           pltpu.VMEM((2, TH, Wp), jnp.float32)]
        + w_tiles
        + [pltpu.VMEM((3, margin, Wp), jnp.float32)]
        + w_zeros
        + [pltpu.SemaphoreType.DMA((2, n_out)),
           pltpu.SemaphoreType.DMA((n_out, 2))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=(
    "level", "params", "TH", "margin", "bounds", "interpret"))
def atrous_level_bwd_canvas(lumC, normalC, depthC, isd2C, zgradC, uC, u2C,
                            *, level: int, params: SVGFParams, TH: int,
                            margin: int, bounds: Tuple[int, int],
                            interpret: bool = False):
    """Detached adjoint, canvas in / canvas out.  Returns (dcolC, dvarC)."""
    H, W = bounds
    CH, Wp = depthC.shape[-2:]
    H_pad = CH - 2 * margin
    spacing = 1 << level
    halo_pad = _round_up(params.radius * spacing, 8)
    grid = H_pad // TH
    BLK = TH + 2 * halo_pad
    kernel = _make_level_kernel(H, W, TH, halo_pad, spacing, params, "bwd",
                                n_hbm=7, Wp=Wp, row_base=margin - halo_pad,
                                out_margin=margin)
    sds = jax.ShapeDtypeStruct
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[_hbm_spec()] * 7,
        out_specs=(_hbm_spec(), _hbm_spec()),
        out_shape=(sds((3, CH, Wp), jnp.float32),
                   sds((CH, Wp), jnp.float32)),
        scratch_shapes=_scratch_tiles((None, 3, None, None, 2, 3, None),
                                      BLK, Wp)
        + [pltpu.SemaphoreType.DMA((2, 7))]
        + [pltpu.VMEM((2, 3, TH, Wp), jnp.float32),
           pltpu.VMEM((2, TH, Wp), jnp.float32),
           pltpu.VMEM((3, margin, Wp), jnp.float32)]
        + [pltpu.SemaphoreType.DMA((2, 2)), pltpu.SemaphoreType.DMA((2, 2))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(lumC, normalC, depthC, isd2C, zgradC, uC, u2C)


@functools.partial(jax.jit, static_argnames=(
    "level", "params", "TH", "margin", "bounds", "interpret", "out_halo"))
def atrous_level_bwd_stored_canvas(wC, normC, gcC, gvC,
                                   *, level: int, params: SVGFParams, TH: int,
                                   margin: int, bounds: Tuple[int, int],
                                   interpret: bool = False,
                                   out_halo: int = 0):
    """Stored-weight detached adjoint, canvas in / canvas out.

    Consumes the forward's (n_taps, CH, Wp) weight canvas instead of
    re-deriving the edge-stopping math: 25 shifted FMAs (DMA-bound) versus
    the recompute kernel's ~50-op/tap VPU chain (ALU-bound).  ``u = g/N``
    and ``u2 = g_v/N²`` are derived in-kernel on the haloed band, removing
    the per-level XLA elementwise passes.  Returns (dcolC, dvarC).

    ``out_halo`` expands the written out region by that many rows on both
    sides of the center band (the sharded margin-writing adjoint: gradients
    for exchanged halo rows land in the canvas margins, where the ICI
    refresh transposes route them to the owning neighbors).  Stored weights
    are zero outside the center region, so the extra rows receive exactly
    the contributions of real in-tile centers within tap reach — requires
    ``margin >= out_halo + halo_pad`` so staging offsets stay non-negative,
    and ``TH | (H_pad + 2·out_halo)``."""
    H, W = bounds
    CH, Wp = normC.shape[-2:]
    H_pad = CH - 2 * margin + 2 * out_halo
    spacing = 1 << level
    halo_pad = _round_up(params.radius * spacing, 8)
    assert margin >= out_halo + halo_pad, (margin, out_halo, halo_pad)
    grid = H_pad // TH
    BLK = TH + 2 * halo_pad
    n_taps = (2 * params.radius + 1) ** 2
    w_dtype = wC.dtype
    kernel = _make_level_kernel(H, W, TH, halo_pad, spacing, params, "stored",
                                n_hbm=4, Wp=Wp,
                                row_base=margin - out_halo - halo_pad,
                                out_margin=margin - out_halo, w_dtype=w_dtype)
    sds = jax.ShapeDtypeStruct
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[_hbm_spec()] * 4,
        out_specs=(_hbm_spec(), _hbm_spec()),
        out_shape=(sds((3, CH, Wp), jnp.float32),
                   sds((CH, Wp), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((2, n_taps, BLK, Wp), w_dtype),
                        pltpu.VMEM((2, BLK, Wp), jnp.float32),
                        pltpu.VMEM((2, 3, BLK, Wp), jnp.float32),
                        pltpu.VMEM((2, BLK, Wp), jnp.float32)]
        + [pltpu.SemaphoreType.DMA((2, 4))]
        + [pltpu.VMEM((2, 3, TH, Wp), jnp.float32),
           pltpu.VMEM((2, TH, Wp), jnp.float32),
           pltpu.VMEM((3, margin - out_halo, Wp), jnp.float32)]
        + [pltpu.SemaphoreType.DMA((2, 2)), pltpu.SemaphoreType.DMA((2, 2))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 2 ** 20),
        interpret=interpret,
    )(wC, normC, gcC, gvC)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _svgf_chained(color, variance, normal, depth, spec):
    """spec = (params, interpret, tile_rows).  Returns (c, v, feedback);
    detached-weights semantics (gradients reach color and variance only)."""
    out, _ = _svgf_chained_fwd(color, variance, normal, depth, spec)
    return out


def _svgf_chained_fwd(color, variance, normal, depth, spec):
    params, interpret, tile_rows, bwd_impl, weight_math = spec
    H, W = depth.shape
    Wp = _round_up(W, 128)
    M = _chain_margin(params)
    th_f, th_b, H_pad = _chain_tiles(
        H, Wp, params, tile_rows,
        "recompute" if bwd_impl == "none" else bwd_impl)
    bounds = (H, W)
    save_w_dtype = (jnp.float32 if bwd_impl == "stored_f32"
                    else jnp.bfloat16 if bwd_impl == "stored" else None)
    # "none" (inference) keeps the stored path's fused σ-denominator but
    # skips the weight-canvas writes entirely
    fuse_sden = bwd_impl != "recompute"

    colorC = _canvas_pad(color, M, H_pad, Wp)
    varC = _canvas_pad(variance, M, H_pad, Wp)
    normalC = _canvas_pad(normal, M, H_pad, Wp)
    depthC = _canvas_pad(depth, M, H_pad, Wp)
    zgradC = _canvas_pad(finite_diff_gradients(depth), M, H_pad, Wp)
    zgrad_cb = zgradC[:, M:M + H_pad, :]

    cC, vC = colorC, varC
    feedbackC = colorC
    lvl_res = []
    for lvl in range(params.iterations):
        if fuse_sden:
            # stored/inference forward derives the σ-denominator in-kernel
            # (isd2_cb=None) — no XLA blur pass
            isd2_cb = None
        else:
            # recompute backward re-derives weights from this exact isd2C;
            # keep it XLA-side so fwd and bwd round identically
            v_ctr = _canvas_crop(vC, M, H, W)
            sden = params.sigma_color * jnp.sqrt(
                jnp.maximum(variance_blur3x3(v_ctr), 0.0)) + _EPS
            isd2C = _canvas_pad(_LOG2E / jnp.maximum(sden, _EPS), M, H_pad, Wp)
            isd2_cb = isd2C[M:M + H_pad, :]
        outs = atrous_level_fwd_canvas(
            cC, vC, normalC, depthC, zgrad_cb, isd2_cb,
            level=lvl, params=params, TH=th_f, margin=M, bounds=bounds,
            interpret=interpret, save_w_dtype=save_w_dtype,
            fast_weights=weight_math == "fast",
            luma_only=(params.luma_only_from is not None
                       and lvl >= params.luma_only_from))
        cC_next, vC_next, nC = outs[:3]
        if save_w_dtype is not None:
            lvl_res.append((outs[3], nC))
        elif not fuse_sden:
            lvl_res.append((cC, isd2C, nC))
        cC, vC = cC_next, vC_next
        if lvl + 1 == params.feedback_level:
            feedbackC = cC

    out = (_canvas_crop(cC, M, H, W), _canvas_crop(vC, M, H, W),
           _canvas_crop(feedbackC, M, H, W))
    if save_w_dtype is not None or bwd_impl == "none":
        # stored backward needs no guidance canvases — only per-level
        # (weights, norm); inference mode keeps nothing at all
        res = (tuple(lvl_res), None, None, None)
    else:
        res = (tuple(lvl_res), normalC, depthC, zgradC)
    return out, res


def _svgf_chained_bwd(spec, res, g):
    params, interpret, tile_rows, bwd_impl, _weight_math = spec
    if bwd_impl == "none":
        raise RuntimeError(
            "svgf_spatial_pallas(bwd_impl='none') is inference-only (no "
            "stored weights, no recompute residuals); use 'stored' for "
            "training")
    lvl_res, normalC, depthC, zgradC = res
    gc, gv, gfeed = g
    H, W = gv.shape
    Wp = _round_up(W, 128)
    M = _chain_margin(params)
    _, th_b, H_pad = _chain_tiles(H, Wp, params, tile_rows, bwd_impl)
    bounds = (H, W)

    gcC = _canvas_pad(gc, M, H_pad, Wp)
    gvC = _canvas_pad(gv, M, H_pad, Wp)
    gfeedC = _canvas_pad(gfeed, M, H_pad, Wp)
    feed_used = 1 <= params.feedback_level <= params.iterations

    for lvl in reversed(range(params.iterations)):
        if feed_used and lvl + 1 == params.feedback_level:
            gcC = gcC + gfeedC
        if bwd_impl != "recompute":
            wC, nC = lvl_res[lvl]
            gcC, gvC = atrous_level_bwd_stored_canvas(
                wC, nC, gcC, gvC, level=lvl, params=params, TH=th_b,
                margin=M, bounds=bounds, interpret=interpret)
            continue
        cC, isd2C, nC = lvl_res[lvl]
        # explicit FMA chain (NOT einsum/dot): must round exactly like the
        # per-level path's luminance so the recomputed weights are bit-equal
        lumC = (_LUMA[0] * cC[0] + _LUMA[1] * cC[1] + _LUMA[2] * cC[2])
        invnC = 1.0 / jnp.maximum(nC, _EPS)
        uC = gcC * invnC[None]
        u2C = gvC * (invnC * invnC)
        gcC, gvC = atrous_level_bwd_canvas(
            lumC, normalC, depthC, isd2C, zgradC, uC, u2C,
            level=lvl, params=params, TH=th_b, margin=M, bounds=bounds,
            interpret=interpret)

    d_color = _canvas_crop(gcC, M, H, W)
    if not feed_used:
        d_color = d_color + gfeed
    d_variance = _canvas_crop(gvC, M, H, W)
    return (d_color, d_variance,
            jnp.zeros((3, H, W), jnp.float32),
            jnp.zeros((H, W), jnp.float32))


_svgf_chained.defvjp(_svgf_chained_fwd, _svgf_chained_bwd)
