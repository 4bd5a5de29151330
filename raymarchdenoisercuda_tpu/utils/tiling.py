"""Analytical à-trous tiling / memory model.

Code-ified version of the reference's design notebook (``notebooks/tile.ipynb``
cells 197-205, SURVEY.md §2 C13): dilation spacing, halo radius, tile extent
and per-level on-chip memory budget — retargeted from CUDA shared memory to
Pallas VMEM row bands (ops/pallas/atrous_tpu.py) and to ICI halo-exchange
volume for the sharded path (parallel/halo.py).
"""

from __future__ import annotations

import dataclasses
from typing import List


def spacing(level: int) -> int:
    """À-trous hole size at ``level`` (SVGF convention: 2^level).

    The notebook uses ``space(n) = 2^(n-1)`` with n starting at 1; levels here
    are 0-based so ``spacing(l) == notebook.space(l+1)``.
    """
    return 1 << level


def halo_radius(radius: int, level: int) -> int:
    """Pixels of halo a level-``level`` pass needs beyond a tile edge."""
    return radius * spacing(level)


def tile_extent(radius: int, level: int, block: int) -> int:
    """Full extent of a block's input window (notebook ``tileRad``)."""
    return 2 * halo_radius(radius, level) + block


@dataclasses.dataclass(frozen=True)
class LevelBudget:
    level: int
    spacing: int
    halo: int
    band_rows: int          # staged VMEM rows for a TILE_H-row band
    vmem_bytes: int         # staged bytes for n_planes float32 planes
    ici_bytes: int          # halo-exchange volume per device (sharded path)


def vmem_budget(width: int, tile_rows: int, radius: int, levels: int,
                n_planes: int = 9, dtype_bytes: int = 4) -> List[LevelBudget]:
    """Per-level staging budget for the row-band Pallas kernel."""
    out = []
    for lvl in range(levels):
        h = halo_radius(radius, lvl)
        band = tile_rows + 2 * h
        out.append(LevelBudget(
            level=lvl,
            spacing=spacing(lvl),
            halo=h,
            band_rows=band,
            vmem_bytes=n_planes * band * width * dtype_bytes,
            ici_bytes=0,
        ))
    return out


def ici_budget(tile_h: int, tile_w: int, radius: int, levels: int,
               n_planes: int = 9, dtype_bytes: int = 4) -> List[LevelBudget]:
    """Per-level ICI halo-exchange volume for a (tile_h, tile_w) device tile."""
    out = []
    for lvl in range(levels):
        h = halo_radius(radius, lvl)
        # rows both sides + cols both sides incl. corners
        cells = 2 * h * tile_w + 2 * h * (tile_h + 2 * h)
        out.append(LevelBudget(
            level=lvl,
            spacing=spacing(lvl),
            halo=h,
            band_rows=tile_h + 2 * h,
            vmem_bytes=0,
            ici_bytes=n_planes * cells * dtype_bytes,
        ))
    return out


def print_model(width: int = 1920, tile_rows: int = 112, radius: int = 2,
                levels: int = 5) -> None:
    """Human-readable dump (the notebook's printed tables)."""
    print(f"à-trous model: W={width}, TILE_H={tile_rows}, r={radius}")
    for b in vmem_budget(width, tile_rows, radius, levels):
        print(f"  level {b.level}: spacing {b.spacing:2d}, halo {b.halo:2d}, "
              f"band {b.band_rows:3d} rows, VMEM {b.vmem_bytes / 2**20:.2f} MiB")
