"""Comparison baselines (reference deepbedmap.py:323-366,
paper_figures.py:593-620): classical interpolation upsamples of the low-res
bed to compare against the neural super-resolution — bicubic 4x BEDMAP2
('cubicbedmap'), bilinear downsample of synthetic high-res, bicubic 2x
BedMachine. All via jax.image.resize on device."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from deepbedmap_tpu.data.raster import Raster


def _resize(data: np.ndarray, factor: float, method: str) -> np.ndarray:
    arr = jnp.asarray(data, jnp.float32)
    out_shape = (
        int(round(arr.shape[0] * factor)),
        int(round(arr.shape[1] * factor)),
    )
    return np.asarray(jax.image.resize(arr, out_shape, method=method))


def bicubic_upsample(raster: Raster, factor: int = 4) -> Raster:
    """skimage.transform.rescale(order=3) equivalent — the 'cubicbedmap'
    baseline (deepbedmap.py:327-339)."""
    return Raster(
        _resize(raster.masked(), factor, "cubic"),
        left=raster.left,
        top=raster.top,
        res=raster.res / factor,
        crs=raster.crs,
    )


def bilinear_resample(raster: Raster, factor: float) -> Raster:
    """Bilinear up/down-sample — the 'synthetic HRES' baseline
    (deepbedmap.py:344-356 uses 1/2.5)."""
    return Raster(
        _resize(raster.masked(), factor, "linear"),
        left=raster.left,
        top=raster.top,
        res=raster.res / factor,
        crs=raster.crs,
    )
