"""Dataset loader for the ``render/<scene>/<frame>/<plane>.png`` layout.

Realizes the reference's intended-but-undefined ``CudaGBuffer::openImages``
flow (``include/gbuffer.h:32``, SURVEY.md §3(e)): load the four G-buffer
planes of a frame into device-resident planar float arrays.  The directory
layout matches the reference's Cornell fixtures (``render/cornell/1/``:
render/albedo/normal/depth PNGs).
"""

from __future__ import annotations

import os
import re
from typing import Iterator, List, Optional

import jax.numpy as jnp
import numpy as np

from ..gbuffer import GBuffer
from .image import load_plane, ImageIOError

PLANES = ("render", "albedo", "normal", "depth")


def frame_dir(root: str, scene: str, frame: int | str) -> str:
    return os.path.join(root, scene, str(frame))


def list_frames(root: str, scene: str) -> List[int]:
    """Sorted numeric frame ids available for a scene."""
    d = os.path.join(root, scene)
    if not os.path.isdir(d):
        raise ImageIOError(f"no such scene directory: {d}")
    out = []
    for name in os.listdir(d):
        if re.fullmatch(r"\d+", name) and os.path.isdir(os.path.join(d, name)):
            out.append(int(name))
    return sorted(out)


def load_frame(root: str, scene: str, frame: int | str, device: bool = True) -> GBuffer:
    """Load one frame's G-buffer planes.

    Normal PNGs store unit vectors mapped to [0,1]; we unmap to [-1,1] and
    renormalize.  Depth PNGs are single-channel [0,1].
    """
    d = frame_dir(root, scene, frame)
    render = load_plane(os.path.join(d, "render.png"), channels=3)
    albedo = load_plane(os.path.join(d, "albedo.png"), channels=3)
    normal_png = load_plane(os.path.join(d, "normal.png"), channels=3)
    depth = load_plane(os.path.join(d, "depth.png"), channels=1)[0]

    normal = normal_png * 2.0 - 1.0
    norm = np.sqrt(np.sum(normal * normal, axis=0, keepdims=True))
    normal = normal / np.maximum(norm, 1e-6)

    to = jnp.asarray if device else np.asarray
    return GBuffer(
        render=to(render),
        albedo=to(albedo),
        normal=to(normal.astype(np.float32)),
        depth=to(depth),
        motion=None,
        denoised=None,
    )


def iter_sequence(root: str, scene: str, frames: Optional[List[int]] = None) -> Iterator[GBuffer]:
    """Iterate a frame sequence for temporal accumulation (README.md:8 intent)."""
    for f in frames if frames is not None else list_frames(root, scene):
        yield load_frame(root, scene, f)


def save_frame(root: str, scene: str, frame: int | str, gbuf: GBuffer) -> None:
    """Write planes of a G-buffer back to the dataset layout (denoised included)."""
    from .image import save_plane

    d = frame_dir(root, scene, frame)
    os.makedirs(d, exist_ok=True)
    save_plane(os.path.join(d, "render.png"), np.asarray(gbuf.render))
    save_plane(os.path.join(d, "albedo.png"), np.asarray(gbuf.albedo))
    save_plane(os.path.join(d, "normal.png"), np.asarray(gbuf.normal) * 0.5 + 0.5)
    save_plane(os.path.join(d, "depth.png"), np.asarray(gbuf.depth)[None])
    if gbuf.denoised is not None:
        save_plane(os.path.join(d, "denoised.png"), np.asarray(gbuf.denoised))
