"""Resampling / layout ops, NHWC.

TPU notes:
- ``nearest_upsample`` replaces the reference's ``F.resize_images(mode="nearest")``
  (srgan_train.py:556-567). Implemented as reshape+broadcast, which XLA fuses into
  the following convolution's input — no materialised intermediate.
- ``space_to_depth`` lets us rewrite the reference input block's exotic
  convolutions (k30s10 on REMA, k6s2 on velocity; srgan_train.py:231-246) as
  3x3-stride-1 valid convolutions over a channel-expanded input. A kernel-30
  stride-10 conv is *exactly* a 3x3 conv over 10x10 space-to-depth blocks, and the
  3x3 form tiles onto the MXU far better than a 900-tap kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_upsample(x: jax.Array, factor: int = 2) -> jax.Array:
    """Nearest-neighbour upsample of an NHWC tensor by an integer factor."""
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)


def space_to_depth(x: jax.Array, block: int) -> jax.Array:
    """Rearrange NHWC (N, H, W, C) -> (N, H/b, W/b, b*b*C).

    The output channel ordering is (bh, bw, c) row-major, matching the weight
    reshape in ``models.blocks.strided_conv_as_s2d`` so that
    conv(x, k=3b, s=b) == conv(space_to_depth(x, b), k=3, s=1) exactly.
    """
    n, h, w, c = x.shape
    assert h % block == 0 and w % block == 0, (h, w, block)
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # N, H/b, W/b, bh, bw, C
    return x.reshape(n, h // block, w // block, block * block * c)


def avg_pool(x: jax.Array, window: int, stride: int | None = None) -> jax.Array:
    """Average pooling over NHWC spatial dims, VALID padding.

    Matches ``F.average_pooling_2d`` as used by the topographic loss
    (srgan_train.py:883) where 36x36 predictions pool 4x4 -> 9x9.

    Implemented as a depthwise convolution with a constant kernel rather than
    ``lax.reduce_window``: it lowers onto the conv/MXU path on TPU and avoids a
    pathologically slow XLA-CPU reduce_window compile observed in this image.
    """
    if stride is None:
        stride = window
    channels = x.shape[-1]
    kernel = jnp.ones((window, window, 1, channels), x.dtype)
    summed = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=channels,
    )
    return summed / jnp.asarray(window * window, x.dtype)
