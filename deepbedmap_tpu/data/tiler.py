"""Windowed tile extraction — the reference's ``selective_tile``
(data_prep.py:622-741) re-expressed as vectorised bilinear window reads.

The reference builds one dask-delayed xarray.interp per window and stacks; here
all windows of a raster are gathered in a single vmapped bilinear sample (JAX —
runs on CPU for data prep, on device when tiling inference inputs), with the
exact coordinate conventions of the original:

- window bounds optionally extended by ``padding`` map units per side;
- target cell centers ``linspace(top - res/2, bottom + res/2)`` (y down) and
  ``linspace(left + res/2, right - res/2)`` (data_prep.py:695-696);
- NaN/nodata handling: masked values propagate, then ``gapfiller`` replaces
  them (or a warning is emitted, data_prep.py:719-738).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepbedmap_tpu.data.raster import Raster
from deepbedmap_tpu.ops.interp import sample_grid_bilinear, sample_grid_nearest


def selective_tile(
    raster: Raster,
    window_bounds: Sequence[Tuple[float, float, float, float]],
    padding: float = 0.0,
    resolution: Optional[float] = None,
    gapfiller: Optional[float] = None,
    interpolate: bool = True,
) -> np.ndarray:
    """Extract (N, 1, H, W) float32 tiles — reference-contract NCHW layout.

    ``window_bounds`` are (xmin, ymin, xmax, ymax); all must share one shape
    (the reference sizes every window from the first, data_prep.py:679-680).
    """
    assert len(window_bounds), "no windows"
    res = float(raster.res if resolution is None else resolution)
    half = res / 2.0

    x0, y0, x1, y1 = window_bounds[0]
    ny = int(round(((y1 + padding) - (y0 - padding)) / res))
    nx = int(round(((x1 + padding) - (x0 - padding)) / res))

    bounds = np.asarray(window_bounds, np.float64)
    lefts = bounds[:, 0] - padding
    bottoms = bounds[:, 1] - padding
    rights = bounds[:, 2] + padding
    tops = bounds[:, 3] + padding

    # per-window target cell centers, shape (N, ny) / (N, nx)
    ys = np.linspace(tops - half, bottoms + half, num=ny, axis=-1)
    xs = np.linspace(lefts + half, rights - half, num=nx, axis=-1)

    data = jnp.asarray(raster.masked())
    sampler = sample_grid_bilinear if interpolate else sample_grid_nearest

    def one_window(wx, wy):
        gx, gy = jnp.meshgrid(wx, wy)  # (ny, nx)
        return sampler(
            data, gx, gy, raster.left, raster.top, raster.res, jnp.nan
        )

    tiles = jax.vmap(one_window)(jnp.asarray(xs), jnp.asarray(ys))
    tiles = np.array(tiles, np.float32)[:, None, :, :]  # writable (N, 1, ny, nx)

    mask = np.isnan(tiles)
    if mask.any():
        if gapfiller is not None:
            tiles[mask] = gapfiller
        else:
            import warnings

            bad = np.argwhere(mask.any(axis=(1, 2, 3))).ravel()
            warnings.warn(
                f"tiles {bad.tolist()} have missing data, pass a gapfiller "
                "value",
                stacklevel=2,
            )
    return tiles


def save_array_to_grid(
    array: np.ndarray,  # (1, H, W) CHW, like the reference contract
    window_bound: Tuple[float, float, float, float],
    outfilepath: str,
    nodataval: float = -2000.0,
    dtype=None,
    save_netcdf: bool = False,
    crs: Optional[str] = None,
    compress: bool = True,
) -> None:
    """Save a (1, H, W) array as GeoTIFF (+ optional NetCDF) — the reference's
    save_array_to_grid (data_prep.py:779-834), GDAL replaced by the native
    codec in ``data.geotiff``."""
    from deepbedmap_tpu.data import geotiff
    from deepbedmap_tpu.data.raster import EPSG_3031, write_netcdf

    assert array.ndim == 3 and array.shape[0] == 1, array.shape
    xmin, ymin, xmax, ymax = window_bound
    h, w = array.shape[1:]
    raster = Raster(
        data=np.asarray(array[0], np.float32),
        left=float(xmin),
        top=float(ymax),
        res=(xmax - xmin) / w,
        crs=crs or EPSG_3031,
        nodata=nodataval,
    )
    out = array[0] if dtype is None else np.asarray(array[0], dtype)
    geotiff.write_geotiff(
        f"{outfilepath}.tif",
        out,
        left=raster.left,
        top=raster.top,
        res=raster.res,
        nodata=nodataval,
        compress=compress,
    )
    if save_netcdf:
        write_netcdf(raster, f"{outfilepath}.nc")
