"""Vector -> raster gridding: blockmedian + tension-spline + masking
(reference L1, data_prep.py:353-441).

``get_region`` rounds point bounds outward to increments (gmt info -I);
``blockmedian`` reduces points to per-block medians with GMT's node-centered
block semantics; ``xyz_to_grid`` solves the GMT-surface system exactly
(ops.gmt_surface), masks far-from-data cells, and resamples gridline ->
pixel registration, returning a Raster. A JAX relaxation backend
(ops.spline) remains for very large grids where the sparse LU would thrash.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
import pandas as pd

from deepbedmap_tpu.data.raster import Raster
from deepbedmap_tpu.ops import gmt_surface
from deepbedmap_tpu.ops.spline import (
    distance_mask,
    gridline_to_pixel,
    solve_tension_spline,
)

# above this many gridline nodes the exact sparse solve falls back to the
# device-side relaxation solver (assembly + LU get slow on one host core)
_EXACT_NODE_LIMIT = 300_000


def get_region(
    xyz_data: pd.DataFrame, round_increment: int = 250, mode: str = "round"
) -> Tuple[float, float, float, float]:
    """Bounding region rounded outward to the increment
    (reference get_region via `gmt info -I`, data_prep.py:353-378).
    Returns (xmin, xmax, ymin, ymax) — GMT's -R order.

    ``mode``:
      'round'   — plain outward rounding to the increment (default; the data
                  contract — every point is inside, grid edges on increments).
      'surface' — additionally reproduce `gmt info -Is` (what the reference
                  calls): after rounding, pad the *shorter* axis so both axes
                  span the SAME number of increments — floor(deficit/2) cells
                  on the min side, the rest on the max side. Derived from the
                  reference doctest (data_prep.py:365-370): x [580.8, 8324.4],
                  y [205.8, 9507.1] -> '-250/9500/0/9750', i.e. y plainly
                  rounded (39 intervals) and x padded 32 -> 39 intervals with
                  3 cells left / 4 cells right. Only empty border cells are
                  added (masked to NaN downstream); data content is identical.
    """
    inc = float(round_increment)
    xmin = np.floor(xyz_data.x.min() / inc) * inc
    xmax = np.ceil(xyz_data.x.max() / inc) * inc
    ymin = np.floor(xyz_data.y.min() / inc) * inc
    ymax = np.ceil(xyz_data.y.max() / inc) * inc
    if mode == "surface":
        nx = int(round((xmax - xmin) / inc))
        ny = int(round((ymax - ymin) / inc))
        if nx < ny:
            pad = ny - nx
            xmin -= (pad // 2) * inc
            xmax += (pad - pad // 2) * inc
        elif ny < nx:
            pad = nx - ny
            ymin -= (pad // 2) * inc
            ymax += (pad - pad // 2) * inc
    return (float(xmin), float(xmax), float(ymin), float(ymax))


def blockmedian(
    xyz_data: pd.DataFrame,
    region: Tuple[float, float, float, float],
    spacing: float = 250.0,
) -> pd.DataFrame:
    """Per-block medians of x, y and z (reference gmt.blockmedian,
    data_prep.py:407).

    GMT's block tools default to GRIDLINE registration: blocks are CENTERED
    on the grid nodes (edge blocks half-sized), not aligned with pixel
    cells. Output position is the independent median of the x's and y's in
    the block, matching blockmedian's default (not -Q)."""
    xmin, xmax, ymin, ymax = region
    df = xyz_data[
        (xyz_data.x >= xmin)
        & (xyz_data.x <= xmax)
        & (xyz_data.y >= ymin)
        & (xyz_data.y <= ymax)
    ]
    nx = int(round((xmax - xmin) / spacing)) + 1
    ny = int(round((ymax - ymin) / spacing)) + 1
    col = np.clip(np.floor((df.x - xmin) / spacing + 0.5).astype(int), 0, nx - 1)
    row = np.clip(np.floor((df.y - ymin) / spacing + 0.5).astype(int), 0, ny - 1)
    cell = row * nx + col
    med = (
        df.assign(_cell=np.asarray(cell))
        .groupby("_cell")[["x", "y", "z"]]
        .median()
        .reset_index(drop=True)
    )
    return med


def xyz_to_grid(
    xyz_data: pd.DataFrame,
    region: Tuple[float, float, float, float],
    spacing: float = 250.0,
    tension: float = 0.35,
    mask_cell_radius: int = 3,
    iterations: int = 500,
    backend: str = "auto",
    offset_correction: bool = True,
) -> Raster:
    """Grid xyz points to a pixel-registered Raster
    (reference xyz_to_grid, data_prep.py:382-441):
    blockmedian -> surface solve on gridline nodes -> mask cells
    > mask_cell_radius from data -> gridline->pixel resample.

    ``backend``:
      'exact' — assemble and solve the converged GMT-surface linear system
                (ops.gmt_surface): Briggs off-node constraints, tensioned
                free-edge BCs, LS-plane detrend. Calibrated against the
                reference's published GMT golden (~20 m max on the doctest
                cloud, from 224 m pre-round-5; see tests/test_gridder.py).
      'relax' — the TPU relaxation solver (ops.spline), approximate but fast
                for very large grids; honours ``iterations`` and
                ``offset_correction`` (first-order gradient correction of
                node-snapped constraints).
      'auto'  — 'exact' unless the node count exceeds {limit:,}.
    """.format(limit=_EXACT_NODE_LIMIT)
    xmin, xmax, ymin, ymax = region
    nx = int(round((xmax - xmin) / spacing)) + 1
    ny = int(round((ymax - ymin) / spacing)) + 1
    med = blockmedian(xyz_data, region, spacing)

    if backend == "auto":
        backend = "exact" if nx * ny <= _EXACT_NODE_LIMIT else "relax"

    if backend == "exact":
        # south-up gridline solve, then flip to north-up raster rows
        z_south = gmt_surface.surface(
            med.x.values, med.y.values, med.z.values,
            region, spacing, tension=tension,
        )
        z = np.asarray(z_south[::-1], np.float64)
        col = np.clip(np.floor((med.x - xmin) / spacing + 0.5).astype(int), 0, nx - 1)
        row = np.clip(np.floor((ymax - med.y) / spacing + 0.5).astype(int), 0, ny - 1)
        has_data = np.zeros((ny, nx), bool)
        has_data[row, col] = True
        far = distance_mask(has_data, mask_cell_radius)
        z = np.where(far, np.nan, z)
        z_pix = gmt_surface.grid_to_pixel(z)
        return Raster(
            data=z_pix.astype(np.float32),
            left=float(xmin),
            top=float(ymax),
            res=float(spacing),
            nodata=None,
        )

    # --- relaxation backend (large grids) -----------------------------------
    col = np.clip(np.round((med.x - xmin) / spacing).astype(int), 0, nx - 1)
    row = np.clip(np.round((ymax - med.y) / spacing).astype(int), 0, ny - 1)

    def constrain(z_values):
        data = np.zeros((ny, nx), np.float32)
        count = np.zeros((ny, nx), np.float32)
        np.add.at(data, (row, col), z_values.astype(np.float32))
        np.add.at(count, (row, col), 1.0)
        has = count > 0
        data[has] /= count[has]
        return data, has

    data, has_data = constrain(np.asarray(med.z))

    def solve(d):
        return np.asarray(
            solve_tension_spline(
                jnp.asarray(d),
                jnp.asarray(has_data),
                tension=tension,
                iterations=iterations,
            )
        )

    if offset_correction:
        z0 = solve(data)
        gy, gx = np.gradient(z0, spacing)
        node_x = xmin + col * spacing
        node_y = ymax - row * spacing
        dx = np.asarray(med.x) - node_x
        dy = np.asarray(med.y) - node_y
        z_corr = (
            np.asarray(med.z)
            - gx[row, col] * dx
            - (-gy[row, col]) * dy  # row axis runs top-down: d/dy = -d/drow
        )
        data, has_data = constrain(z_corr)

    z = solve(data)
    far = distance_mask(has_data, mask_cell_radius)
    z = np.where(far, np.nan, z)
    z_pix = np.asarray(gridline_to_pixel(jnp.asarray(z)))

    return Raster(
        data=z_pix.astype(np.float32),
        left=float(xmin),
        top=float(ymax),
        res=float(spacing),
        nodata=None,
    )
