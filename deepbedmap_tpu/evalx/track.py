"""grdtrack-style grid sampling at scattered points + RMSE.

Reference: ``gmt.grdtrack`` samples each candidate DEM at groundtruth xyz
points, an error column is formed, and RMSE summarises it
(deepbedmap.py:530-573; per-epoch test metric srgan_train.py:1460-1464).
GMT's default interpolation is bicubic (Keys cubic convolution, a=-0.5); the
reference relies on that default, so ``method="bicubic"`` is the default here
too, with ``"bilinear"``/``"nearest"`` available (GMT ``-nl``/``-nn``).
Points outside the grid return NaN and are excluded from RMSE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from deepbedmap_tpu.data.raster import Raster
from deepbedmap_tpu.ops.interp import (
    sample_grid_bicubic,
    sample_grid_bilinear,
    sample_grid_nearest,
)
from deepbedmap_tpu.ops.metrics import rmse

_SAMPLERS = {
    "bicubic": sample_grid_bicubic,
    "bilinear": sample_grid_bilinear,
    "nearest": sample_grid_nearest,
}


def grdtrack(
    raster_data: jax.Array,  # (H, W)
    xs: jax.Array,
    ys: jax.Array,
    left: float,
    top: float,
    res: float,
    method: str = "bicubic",
) -> jax.Array:
    """Sample a grid at projected points; NaN outside. jit-able.

    ``method``: 'bicubic' (GMT grdtrack default), 'bilinear' or 'nearest'.
    """
    return _SAMPLERS[method](raster_data, xs, ys, left, top, res)


def elevation_residuals(
    raster: Raster,
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    method: str = "bicubic",
) -> np.ndarray:
    """Residuals grid-minus-track at each survey point (NaN outside grid)."""
    sampled = grdtrack(
        jnp.asarray(raster.masked()),
        jnp.asarray(x),
        jnp.asarray(y),
        raster.left,
        raster.top,
        raster.res,
        method=method,
    )
    return np.asarray(sampled) - np.asarray(z)


def track_rmse(
    raster: Raster,
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    method: str = "bicubic",
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
        method=method,
    )
    return float(rmse(sampled, jnp.asarray(z, jnp.float32)))
