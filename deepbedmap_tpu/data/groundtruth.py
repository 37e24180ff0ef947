"""Groundtruth assembly + inference input building (reference L5 heads).

- ``get_image_with_bounds``: merge one or more NetCDF grids into a Raster and
  validate the deep-learning geometry (shape divisible by 4)
  (deepbedmap.py:63-111).
- ``get_model_inputs``: cut the X/W1/W2/W3 conditioning stack for a bounding
  box from the source rasters with the reference's padding/gapfill conventions
  (deepbedmap.py:132-213): BEDMAP2 gapfilled -5000, velocity/accumulation 0,
  REMA un-gapfilled, all with 1 km context padding; velocity resampled to
  500 m.
- ``gapfill_from_coarse``: fill voids in a fine raster with a bilinearly
  upsampled coarse raster (the reference's one-off REMA 100 m <- 200 m fill,
  data_prep.py:838-877).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

from deepbedmap_tpu.data.raster import Raster, read_netcdf
from deepbedmap_tpu.data.tiler import selective_tile

Bounds = Tuple[float, float, float, float]  # (xmin, ymin, xmax, ymax)


def get_image_with_bounds(
    filepaths: Sequence[str], strict_multiple_of: int = 4
) -> Raster:
    """Load one or more NetCDF grids; for several, mosaic over their union
    extent (NaN where uncovered). Warns when the shape isn't divisible by the
    super-resolution factor (deepbedmap.py:102-107)."""
    rasters = [read_netcdf(p) for p in filepaths]
    if len(rasters) == 1:
        merged = rasters[0]
    else:
        res = rasters[0].res
        assert all(abs(r.res - res) < 1e-6 for r in rasters), "mixed resolutions"
        xmin = min(r.bounds[0] for r in rasters)
        ymin = min(r.bounds[1] for r in rasters)
        xmax = max(r.bounds[2] for r in rasters)
        ymax = max(r.bounds[3] for r in rasters)
        width = int(round((xmax - xmin) / res))
        height = int(round((ymax - ymin) / res))
        canvas = np.full((height, width), np.nan, np.float32)
        for r in rasters:
            row0 = int(round((ymax - r.top) / res))
            col0 = int(round((r.left - xmin) / res))
            canvas[row0 : row0 + r.height, col0 : col0 + r.width] = r.masked()
        merged = Raster(canvas, left=xmin, top=ymax, res=res)

    shape = merged.data.shape
    if any(s % strict_multiple_of for s in shape):
        print(
            f"WARN: Image shape {shape} should be divisible by "
            f"{strict_multiple_of} for DeepBedMap"
        )
    return merged


def get_model_inputs(
    window_bound: Bounds,
    bed_lowres: Raster,  # BEDMAP2 bed @1000m
    surface: Raster,  # REMA ice surface @100m
    velocity_x: Raster,  # MEaSUREs VX (native ~450m)
    velocity_y: Raster,
    accumulation: Raster,  # snow accumulation @1000m
    padding: float = 1000.0,
) -> Dict[str, np.ndarray]:
    """Build the reference's (X, W1, W2, W3) conditioning stack (NCHW float32)
    for a bounding box (deepbedmap.py:164-200)."""
    X = selective_tile(bed_lowres, [window_bound], padding=padding, gapfiller=-5000.0)
    W1 = selective_tile(surface, [window_bound], padding=padding)
    VX = selective_tile(
        velocity_x, [window_bound], padding=padding, resolution=500.0, gapfiller=0.0
    )
    VY = selective_tile(
        velocity_y, [window_bound], padding=padding, resolution=500.0, gapfiller=0.0
    )
    W2 = np.concatenate([VX, VY], axis=1)
    W3 = selective_tile(
        accumulation, [window_bound], padding=padding, gapfiller=0.0
    )
    return {"X": X, "W1": W1, "W2": W2, "W3": W3}


def gapfill_from_coarse(fine: Raster, coarse: Raster) -> Raster:
    """Fill NaN voids in ``fine`` with bilinear samples of ``coarse``
    (reference REMA 100 m <- 200 m_filled, data_prep.py:838-877)."""
    import jax.numpy as jnp

    from deepbedmap_tpu.ops.interp import sample_grid_bilinear

    data = fine.masked().copy()
    voids = np.argwhere(np.isnan(data))
    if len(voids):
        ys = fine.top - fine.res * (voids[:, 0] + 0.5)
        xs = fine.left + fine.res * (voids[:, 1] + 0.5)
        fill = np.asarray(
            sample_grid_bilinear(
                jnp.asarray(coarse.masked()),
                jnp.asarray(xs),
                jnp.asarray(ys),
                coarse.left,
                coarse.top,
                coarse.res,
            )
        )
        data[voids[:, 0], voids[:, 1]] = fill
    return Raster(
        data, left=fine.left, top=fine.top, res=fine.res, crs=fine.crs,
        nodata=fine.nodata,
    )
