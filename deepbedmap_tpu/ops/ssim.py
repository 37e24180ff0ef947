"""Structural Similarity (SSIM) as a differentiable JAX op.

Replaces the reference's ssim-chainer git dependency (srgan_train.py:932-956,
Pipfile:28). Computed with a uniform (box) window via average pooling — all the
moment maps are reduce_windows that XLA fuses; no explicit convolution weights.

Golden behaviour checks (reference doctests):
- ssim(ones(2,1,9,9), 2*ones(2,1,9,9)) == 0.800004      (srgan_train.py:944-948)
- generator-loss composite 4.35108415 depends on ssim over 12x12 inputs with
  window 9 stride 1                                      (srgan_train.py:859-868)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deepbedmap_tpu.ops.resize import avg_pool

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def ssim(
    y_pred: jax.Array,
    y_true: jax.Array,
    window_size: int = 9,
    stride: int = 1,
) -> jax.Array:
    """Mean SSIM between two NHWC image batches, uniform window, VALID windows.

    Returns a scalar: the mean SSIM index over all window positions and batch
    entries, exactly the quantity the reference feeds into
    ``1 - ssim`` as the structural loss (srgan_train.py:887).
    """
    if y_pred.shape != y_true.shape:
        raise ValueError(
            f"Input images must have the same dimensions, "
            f"got {y_pred.shape} vs {y_true.shape}"
        )

    mu_x = avg_pool(y_pred, window_size, stride)
    mu_y = avg_pool(y_true, window_size, stride)
    mu_xx = avg_pool(y_pred * y_pred, window_size, stride)
    mu_yy = avg_pool(y_true * y_true, window_size, stride)
    mu_xy = avg_pool(y_pred * y_true, window_size, stride)

    var_x = mu_xx - mu_x * mu_x
    var_y = mu_yy - mu_y * mu_y
    cov_xy = mu_xy - mu_x * mu_y

    numerator = (2.0 * mu_x * mu_y + _C1) * (2.0 * cov_xy + _C2)
    denominator = (mu_x * mu_x + mu_y * mu_y + _C1) * (var_x + var_y + _C2)
    return jnp.mean(numerator / denominator)
