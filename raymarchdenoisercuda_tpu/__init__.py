"""raymarchdenoisercuda_tpu — TPU-native differentiable raymarcher + SVGF denoiser.

A from-scratch JAX/Pallas framework with the capabilities of the CUDA
reference ``VictorHerbert/RaymarchDenoiserCuda`` (see SURVEY.md), redesigned
TPU-first: planar float G-buffers, Pallas stencil kernels with VMEM tiling,
``shard_map`` + ICI halo exchange for multi-chip scale-out, and hand-written
VJPs so pixel gradients flow back to scene/material parameters.
"""

from .config import (
    FilterType,
    FilterParams,
    SVGFParams,
    CameraParams,
    RaymarchParams,
    WAVELET_SPLINE_5,
)
from .gbuffer import GBuffer, History, luminance, zeros_gbuffer

__version__ = "0.1.0"

__all__ = [
    "FilterType",
    "FilterParams",
    "SVGFParams",
    "CameraParams",
    "RaymarchParams",
    "WAVELET_SPLINE_5",
    "GBuffer",
    "History",
    "luminance",
    "zeros_gbuffer",
    "__version__",
]
