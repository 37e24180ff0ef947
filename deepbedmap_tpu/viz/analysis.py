"""Terrain analysis ops.

- ``standard_deviation_2d``: rolling-window std-dev roughness grid
  (reference paper_figures.py:847-865, xarray.rolling(5,5).std()).
- ``hillshade``: Lambertian shaded relief for map figures (the reference gets
  this from GMT grdimage -I).
Both jit-able on NHW(C)-free 2-D arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def standard_deviation_2d(grid: jax.Array, window: int = 5) -> jax.Array:
    """Rolling std-dev over a centered (window x window) neighbourhood.

    Matches xarray ``rolling(y=5, x=5, center=True).std()`` semantics: the
    border where the window is incomplete is NaN; NaNs propagate.
    """
    half = window // 2
    x = jnp.asarray(grid, jnp.float32)
    ones = jnp.ones_like(x)

    def box(a):
        kern = jnp.ones((window, window, 1, 1), jnp.float32)
        return jax.lax.conv_general_dilated(
            a[None, :, :, None],
            kern,
            (1, 1),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0, :, :, 0]

    n = box(ones)
    s1 = box(x)
    s2 = box(x * x)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    std = jnp.sqrt(var * n / jnp.maximum(n - 1.0, 1.0))  # ddof=1 like xarray
    return jnp.pad(std, half, constant_values=jnp.nan)


def hillshade(
    grid: jax.Array,
    res: float = 250.0,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    vert_exag: float = 1.0,
) -> jax.Array:
    """Lambertian hillshade in [0, 1]."""
    z = jnp.asarray(grid, jnp.float32) * vert_exag
    dy, dx = jnp.gradient(z, res)
    slope = jnp.pi / 2.0 - jnp.arctan(jnp.hypot(dx, dy))
    aspect = jnp.arctan2(-dx, dy)
    az = jnp.deg2rad(360.0 - azimuth_deg + 90.0)
    alt = jnp.deg2rad(altitude_deg)
    shaded = jnp.sin(alt) * jnp.sin(slope) + jnp.cos(alt) * jnp.cos(slope) * jnp.cos(
        az - aspect
    )
    return jnp.clip(shaded, 0.0, 1.0)
