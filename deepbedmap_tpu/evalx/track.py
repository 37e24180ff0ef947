"""grdtrack-style grid sampling at scattered points + RMSE.

Reference: ``gmt.grdtrack`` samples each candidate DEM at groundtruth xyz
points, an error column is formed, and RMSE summarises it
(deepbedmap.py:530-573; per-epoch test metric srgan_train.py:1460-1464).
GMT's default interpolation is bicubic; the reference relies on defaults, and
this sampler provides bilinear (default, exactly matching ops.interp) — the
difference on 250 m grids vs. survey noise is negligible, and bilinear keeps
the op a 4-tap gather. Points outside the grid return NaN and are excluded
from RMSE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from deepbedmap_tpu.data.raster import Raster
from deepbedmap_tpu.ops.interp import sample_grid_bilinear
from deepbedmap_tpu.ops.metrics import rmse


def grdtrack(
    raster_data: jax.Array,  # (H, W)
    xs: jax.Array,
    ys: jax.Array,
    left: float,
    top: float,
    res: float,
) -> jax.Array:
    """Sample a grid at projected points; NaN outside. jit-able."""
    return sample_grid_bilinear(raster_data, xs, ys, left, top, res)


def elevation_residuals(
    raster: Raster, x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> np.ndarray:
    """Residuals grid-minus-track at each survey point (NaN outside grid)."""
    sampled = grdtrack(
        jnp.asarray(raster.masked()),
        jnp.asarray(x),
        jnp.asarray(y),
        raster.left,
        raster.top,
        raster.res,
    )
    return np.asarray(sampled) - np.asarray(z)


def track_rmse(
    raster: Raster, x: np.ndarray, y: np.ndarray, z: np.ndarray
) -> float:
    """RMSE of grid vs. xyz track elevations, NaN-aware (the reference's
    headline quality metric, srgan_train.py:1422-1466)."""
    sampled = grdtrack(
        jnp.asarray(raster.masked()),
        jnp.asarray(x),
        jnp.asarray(y),
        raster.left,
        raster.top,
        raster.res,
    )
    return float(rmse(sampled, jnp.asarray(z, jnp.float32)))
