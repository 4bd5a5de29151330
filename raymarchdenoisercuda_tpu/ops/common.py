"""Shared stencil helpers for image-space filters (pure jnp).

These are the XLA-level building blocks the jnp oracle filters are made of.
Out-of-range taps are dropped, matching the reference's ``inRange`` guard +
``continue`` (``src/filter.cu:37-38``, ``include/extended_math.h:62-64``):
shifted-out samples contribute zero value *and* zero weight, and the
normalization divides by the sum of surviving weights only.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def shift2d(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Return ``y[..., i, j] = x[..., i+dy, j+dx]`` with zeros where out of range.

    Static offsets only (jit-friendly): implemented as pad+slice so XLA sees a
    fused static-window op, not a gather.
    """
    if dy == 0 and dx == 0:
        return x
    H, W = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2)
    pad += [(max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0))]
    xp = jnp.pad(x, pad)
    ys = max(dy, 0)
    xs = max(dx, 0)
    return jax.lax.slice(
        xp,
        [0] * (x.ndim - 2) + [ys, xs],
        list(x.shape[:-2]) + [ys + H, xs + W],
    )


def valid_mask(H: int, W: int, dy: int, dx: int, dtype=jnp.float32) -> jax.Array:
    """Mask of pixels whose (dy, dx)-shifted neighbor is inside the image.

    Built from 1-D iota comparisons (outer product), NOT a materialized
    (H, W) constant: the 25-49 per-tap masks of the big filters would
    otherwise embed hundreds of MB of literals into the compiled module.
    """
    iy = jnp.arange(H)[:, None]
    ix = jnp.arange(W)[None, :]
    rm = (iy + dy >= 0) & (iy + dy < H)
    cm = (ix + dx >= 0) & (ix + dx < W)
    return (rm & cm).astype(dtype)


def tap_offsets(radius: int, spacing: int = 1) -> Tuple[Tuple[int, int], ...]:
    """(dy, dx) offsets of a (2r+1)^2 footprint with à-trous dilation.

    ``spacing`` is the à-trous hole size 2^level (notebooks/tile.ipynb
    ``space(n)`` model; SURVEY.md §2 C13).
    """
    r = radius
    return tuple((dy * spacing, dx * spacing) for dy in range(-r, r + 1) for dx in range(-r, r + 1))


def finite_diff_gradients(z: jax.Array) -> jax.Array:
    """Central-difference screen-space gradient of a (H, W) plane -> (2, H, W).

    Used for SVGF's depth edge-stopping denominator |∇z·(p-q)|; one-sided at
    the borders.
    """
    H, W = z.shape
    fwd_y = shift2d(z, 1, 0) - z
    bwd_y = z - shift2d(z, -1, 0)
    fwd_x = shift2d(z, 0, 1) - z
    bwd_x = z - shift2d(z, 0, -1)
    iy = jnp.arange(H)[:, None]
    ix = jnp.arange(W)[None, :]
    dzdy = jnp.where(iy == 0, fwd_y, jnp.where(iy == H - 1, bwd_y, 0.5 * (fwd_y + bwd_y)))
    dzdx = jnp.where(ix == 0, fwd_x, jnp.where(ix == W - 1, bwd_x, 0.5 * (fwd_x + bwd_x)))
    return jnp.stack([dzdy, dzdx])
