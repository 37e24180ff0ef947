"""Quality metrics (reference srgan_train.py:906-928, deepbedmap.py:570-573)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(y_pred: jax.Array, y_true: jax.Array, data_range: float = 2.0 ** 32) -> jax.Array:
    """Batch Peak Signal-to-Noise Ratio.

    Keeps the reference's unusual ``data_range=2**32`` default
    (srgan_train.py:907) so logged numbers are directly comparable;
    golden value: psnr(ones, 2*ones) == 192.65919722494797.
    """
    mse = jnp.mean(jnp.square(y_pred - y_true))
    return 20.0 * jnp.log10(data_range / jnp.sqrt(mse))


def rmse(y_pred: jax.Array, y_true: jax.Array) -> jax.Array:
    """Root-mean-square error, NaN-aware (NaNs in y_true are excluded).

    The reference computes track RMSE host-side over grdtrack samples
    (deepbedmap.py:570-573); NaN-awareness covers points falling outside grids.
    """
    err = y_pred - y_true
    valid = ~jnp.isnan(err)
    err = jnp.where(valid, err, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sqrt(jnp.sum(err * err) / count)
