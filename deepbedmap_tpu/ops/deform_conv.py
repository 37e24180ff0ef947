"""Deformable convolution v1 for TPU.

The reference's two final generator layers are Chainer
``L.DeformableConvolution2D`` (srgan_train.py:506-523) backed by custom CUDA
kernels. XLA has no deformable-conv primitive (SURVEY.md section 2.3), so we build
one from TPU-friendly pieces:

1. a *regular* 3x3 convolution produces a (N, H, W, 2*K) offset field
   (``models.blocks.DeformableConv`` owns that conv; this module is the sampler);
2. a bilinear gather samples the input at the K deformed taps per output pixel;
3. one large matmul ``(N*H*W, K*C) @ (K*C, C_out)`` applies the kernel weights —
   this is where the FLOPs are, and it lands squarely on the MXU.

Offset layout: ``offsets[..., :K]`` are row (y) displacements and
``offsets[..., K:]`` are column (x) displacements, each ordered row-major over
the kernel grid ((0,0), (0,1), ..., (kh-1,kw-1)). Out-of-bounds taps contribute
zero, matching zero ('valid'-style) padding semantics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(
    x_pad: jax.Array,  # (N, HP, WP, C) zero-padded input
    rows: jax.Array,  # (N, H, W, K) fractional row coords into x_pad
    cols: jax.Array,  # (N, H, W, K) fractional col coords into x_pad
) -> jax.Array:
    """Sample x_pad at fractional (rows, cols); returns (N, H, W, K, C).

    Out-of-range samples are zero. Implemented as 4 flat gathers + lerp so XLA
    emits dynamic-gather HLO (vectorised on TPU) rather than scalar loops.
    """
    n, hp, wp, c = x_pad.shape

    r0 = jnp.floor(rows)
    c0 = jnp.floor(cols)
    fr = rows - r0
    fc = cols - c0
    r0 = r0.astype(jnp.int32)
    c0 = c0.astype(jnp.int32)

    x_flat = x_pad.reshape(n, hp * wp, c)

    def corner(ri, ci):
        # validity BEFORE clipping, so off-grid taps contribute exactly zero
        valid = (ri >= 0) & (ri < hp) & (ci >= 0) & (ci < wp)
        ri_c = jnp.clip(ri, 0, hp - 1)
        ci_c = jnp.clip(ci, 0, wp - 1)
        flat = ri_c * wp + ci_c  # (N, H, W, K)
        gathered = jax.vmap(lambda xf, ix: jnp.take(xf, ix, axis=0))(
            x_flat, flat.reshape(n, -1)
        )  # (N, H*W*K, C)
        gathered = gathered.reshape(ri.shape + (c,))
        return gathered * valid[..., None].astype(x_pad.dtype)

    w00 = ((1.0 - fr) * (1.0 - fc))[..., None]
    w01 = ((1.0 - fr) * fc)[..., None]
    w10 = (fr * (1.0 - fc))[..., None]
    w11 = (fr * fc)[..., None]

    return (
        corner(r0, c0) * w00
        + corner(r0, c0 + 1) * w01
        + corner(r0 + 1, c0) * w10
        + corner(r0 + 1, c0 + 1) * w11
    )


def deform_conv2d(
    x: jax.Array,  # (N, H, W, C_in)
    offsets: jax.Array,  # (N, H, W, 2*K) with K = kh*kw; [:K]=dy, [K:]=dx
    weight: jax.Array,  # (kh, kw, C_in, C_out)
    bias: Optional[jax.Array] = None,  # (C_out,)
    padding: int = 1,
) -> jax.Array:
    """Deformable convolution v1, stride 1, square zero padding.

    Equivalent in semantics to Chainer's deformable_convolution_2d_sampler with
    stride 1 / pad ``padding`` (reference usage is always k=3, s=1, p=1:
    srgan_train.py:506-523).
    """
    n, h, w, c_in = x.shape
    kh, kw, wc_in, c_out = weight.shape
    k = kh * kw
    assert wc_in == c_in, (wc_in, c_in)
    assert offsets.shape == (n, h, w, 2 * k), (offsets.shape, (n, h, w, 2 * k))

    x_pad = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))

    # Base sampling grid in padded coordinates: output pixel (i, j) tap (u, v)
    # sits at (i + u, j + v) when padding == (k-1)/2 offsets are zero.
    ii = jax.lax.broadcasted_iota(jnp.float32, (h, w, k), 0)
    jj = jax.lax.broadcasted_iota(jnp.float32, (h, w, k), 1)
    kk = jax.lax.broadcasted_iota(jnp.float32, (h, w, k), 2)
    uu = jnp.floor(kk / kw)
    vv = kk - uu * kw

    dy = offsets[..., :k].astype(jnp.float32)
    dx = offsets[..., k:].astype(jnp.float32)
    rows = ii[None] + uu[None] + dy
    cols = jj[None] + vv[None] + dx

    sampled = _bilinear_gather(x_pad, rows, cols)  # (N, H, W, K, C_in)

    # Single MXU matmul: (N*H*W, K*C_in) @ (K*C_in, C_out)
    lhs = sampled.reshape(n * h * w, k * c_in)
    rhs = weight.reshape(k * c_in, c_out)
    out = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
    out = out.reshape(n, h, w, c_out).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out
