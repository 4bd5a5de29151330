"""SVGF denoiser model: demodulate -> temporal -> variance -> à-trous -> remodulate.

The complete realization of the reference's README feature list
(reference README.md:6-9: real-time denoising, temporal accumulation,
variance-guided filtering) that its code never reached (SURVEY.md verdict).

Albedo demodulation: SVGF filters *irradiance* ``render / max(albedo, eps)``
and multiplies albedo back after filtering, so texture detail is not blurred.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import SVGFParams
from ..gbuffer import GBuffer, History
from ..ops.atrous import svgf_spatial_ref
from ..ops.temporal import temporal_accumulate

_ALBEDO_EPS = 1e-3
# Surfaces darker than this are treated as emissive/unlit and passed through
# un-demodulated: dividing by a near-zero albedo turns the light source's
# pixels into huge irradiance outliers that then bleed into neighbors.
_EMISSIVE_THRESH = 0.02


def demodulate(color: jax.Array, albedo: jax.Array) -> jax.Array:
    lit = jnp.max(albedo, axis=0, keepdims=True) > _EMISSIVE_THRESH
    return jnp.where(lit, color / jnp.maximum(albedo, _ALBEDO_EPS), color)


def remodulate(irradiance: jax.Array, albedo: jax.Array) -> jax.Array:
    lit = jnp.max(albedo, axis=0, keepdims=True) > _EMISSIVE_THRESH
    return jnp.where(lit, irradiance * jnp.maximum(albedo, _ALBEDO_EPS), irradiance)


@functools.partial(
    jax.jit, static_argnames=("params", "detach_weights", "demodulate_albedo",
                              "impl", "precision", "weight_math", "temporal",
                              "motion_grad", "spatial_bwd")
)
def svgf_denoise_frame(
    gbuf: GBuffer,
    history: History,
    *,
    params: SVGFParams = SVGFParams(),
    detach_weights: bool = True,
    demodulate_albedo: bool = True,
    impl: str = "reference",
    precision: str = "f32",
    weight_math: str = "exact",
    temporal: str = "auto",
    motion_grad: bool = True,
    spatial_bwd: str = "auto",
) -> Tuple[GBuffer, History]:
    """Denoise one frame with full SVGF; returns (gbuffer+denoised, new history).

    ``impl``: "reference" = jnp oracle; "pallas" = TPU Pallas kernels
    (ops/pallas/atrous_tpu.py).

    ``temporal`` picks the temporal-step implementation on the pallas path:
    "auto" = the fused inference band kernel (no VJP); "ad" = the
    differentiable kernel pair (Pallas tent gather + hand-written adjoint,
    epilogue shared with the oracle — use for training); "oracle" = jnp.

    ``spatial_bwd="auto"``: when the resolved temporal step is the fused
    inference kernel (which has no VJP — the frame is not differentiable
    anyway), the spatial sweep runs ``bwd_impl="none"`` — the fused-σ
    forward WITHOUT stored-weight canvas writes (round 5: the pipeline was
    paying ~25 bf16 plane writes per level for an adjoint it never runs).
    Training paths (``temporal="ad"``/"oracle") keep the stored adjoint.
    """
    if demodulate_albedo:
        irr = demodulate(gbuf.render, gbuf.albedo)
        work = gbuf.replace(render=irr)
    else:
        work = gbuf

    use_kernel = impl == "pallas" and params.max_motion is not None
    if use_kernel and temporal in ("auto", "fused"):
        # fused band kernel (bit-exact vs the jnp path; inference-only — for
        # gradients through the temporal blend use temporal="ad")
        from ..ops.pallas.temporal_tpu import temporal_accumulate_pallas

        integrated, variance, new_history = temporal_accumulate_pallas(
            work, history, params=params)
    elif use_kernel and temporal == "ad":
        from ..ops.pallas.temporal_tpu import temporal_accumulate_pallas_ad

        # motion_grad=False: the dh-only adjoint, exact when the loss
        # gradient w.r.t. motion is dead downstream (material-only training)
        integrated, variance, new_history = temporal_accumulate_pallas_ad(
            work, history, params=params, motion_grad=motion_grad)
    else:
        integrated, variance, new_history = temporal_accumulate(
            work, history, params=params)

    if impl == "pallas":
        from ..ops.pallas.atrous_tpu import svgf_spatial_pallas

        if spatial_bwd == "auto":
            # fused inference temporal => the whole frame is gradient-free
            spatial_bwd = ("none" if use_kernel
                           and temporal in ("auto", "fused") else "stored")
        filtered, _, feedback = svgf_spatial_pallas(
            integrated, variance, gbuf.normal, gbuf.depth,
            params=params, return_feedback=True, precision=precision,
            weight_math=weight_math, bwd_impl=spatial_bwd,
        )
    else:
        filtered, _, feedback = svgf_spatial_ref(
            integrated, variance, gbuf.normal, gbuf.depth,
            params=params, detach_weights=detach_weights, return_feedback=True,
        )

    # SVGF feeds the 1st-iteration filtered color into next frame's history
    new_history = new_history.replace(color=feedback)

    denoised = remodulate(filtered, gbuf.albedo) if demodulate_albedo else filtered
    return gbuf.replace(denoised=denoised), new_history


def svgf_denoise_sequence(
    frames,
    *,
    params: SVGFParams = SVGFParams(),
    history: Optional[History] = None,
    **kw,
):
    """Denoise an iterable of GBuffer frames, threading history through.

    Yields denoised GBuffers (the reference's intended frame-directory flow,
    SURVEY.md §3(e)).
    """
    for gbuf in frames:
        if history is None:
            history = History.zeros(*gbuf.shape)
        out, history = svgf_denoise_frame(gbuf, history, params=params, **kw)
        yield out
