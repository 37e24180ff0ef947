"""Locks the Chainer deformable-conv offset-channel convention.

Chainer's ``deformable_convolution_2d_sampler`` documents its offset input as
"shape (batch, 2 * kh * kw, h_o, w_o) [where] the first kh * kw [channels]
correspond to the offsets in the horizontal direction [and] the latter kh * kw
to the vertical direction" (Chainer 7.x API docs; the reference feeds it via
L.DeformableConvolution2D at srgan_train.py:506-523). This module hand-builds
a from-scratch NumPy sampler with exactly those semantics as an oracle and
asserts that the npz-shim's channel mapping (offset_order='xy') + our sampler
reproduce it — pinning VERDICT round-1 missing item #1's open question as far
as is possible without the released weights (zero-egress image).
"""

import jax.numpy as jnp
import numpy as np

from deepbedmap_tpu.ops.deform_conv import deform_conv2d
from deepbedmap_tpu.train.checkpoint import (
    _conv_w,
    _offset_bias,
    _offset_conv_w,
)


def _conv2d_nchw(x, w, b, pad=1):
    """Plain 3x3 stride-1 conv, NCHW, zero pad — the offset conv."""
    n, c, h, wd = x.shape
    co, ci, kh, kw = w.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    out = np.zeros((n, co, h, wd), np.float64)
    for u in range(kh):
        for v in range(kw):
            patch = xp[:, :, u : u + h, v : v + wd]
            out += np.einsum("nchw,oc->nohw", patch, w[:, :, u, v])
    return out + b[None, :, None, None]


def _bilinear_zero_outside(img, yy, xx):
    """Sample img (H, W) at float coords, zero outside (matching the
    zero-padding semantics both samplers share for |offset| <= clamp)."""
    h, w = img.shape
    y0 = np.floor(yy).astype(int)
    x0 = np.floor(xx).astype(int)
    fy = yy - y0
    fx = xx - x0
    out = np.zeros(yy.shape, np.float64)
    for dy_i, wy in ((0, 1 - fy), (1, fy)):
        for dx_i, wx in ((0, 1 - fx), (1, fx)):
            yi = y0 + dy_i
            xi = x0 + dx_i
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            vals = np.where(valid, img[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)], 0.0)
            out += wy * wx * vals
    return out


def chainer_deformable_layer_numpy(x, off_w, off_b, w, b, pad=1):
    """Chainer L.DeformableConvolution2D forward, from scratch in NumPy.

    x (N,C,H,W); off_w (2K,C,3,3); w (C_out,C,3,3) — Chainer layouts.
    Offset field: channels [0:K] horizontal (x), [K:2K] vertical (y),
    row-major over taps.
    """
    n, c, h, wd = x.shape
    co, ci, kh, kw = w.shape
    k = kh * kw
    off = _conv2d_nchw(x, off_w, off_b, pad)  # (N, 2K, H, W)
    jj, ii = np.meshgrid(np.arange(wd), np.arange(h))
    out = np.zeros((n, co, h, wd), np.float64)
    for ni in range(n):
        for t in range(k):
            u, v = t // kw, t % kw
            dx = off[ni, t]          # horizontal first
            dy = off[ni, k + t]      # vertical second
            yy = ii + u - pad + dy
            xx = jj + v - pad + dx
            for cc in range(c):
                s = _bilinear_zero_outside(x[ni, cc], yy, xx)
                out[ni] += w[:, cc, u, v][:, None, None] * s[None]
    return out + b[None, :, None, None]


def test_shim_offset_order_matches_chainer_docs(rng):
    n, c, h, wd, co = 1, 3, 12, 14, 5
    x = rng.randn(n, c, h, wd).astype(np.float32) * 0.5
    off_w = (rng.randn(18, c, 3, 3) * 0.2).astype(np.float32)
    off_b = (rng.randn(18) * 0.3).astype(np.float32)
    w = rng.randn(co, c, 3, 3).astype(np.float32)
    b = rng.randn(co).astype(np.float32)

    oracle = chainer_deformable_layer_numpy(
        x.astype(np.float64), off_w.astype(np.float64),
        off_b.astype(np.float64), w.astype(np.float64), b.astype(np.float64),
    )

    # our stack: shim-mapped weights -> NHWC offset conv -> our sampler
    import jax

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    ow = jnp.asarray(_offset_conv_w(off_w, offset_order="xy"))
    ob = jnp.asarray(_offset_bias(off_b, offset_order="xy"))
    offsets = jax.lax.conv_general_dilated(
        x_nhwc, ow, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + ob
    got = deform_conv2d(
        x_nhwc, offsets, jnp.asarray(_conv_w(w)), jnp.asarray(b),
        padding=1, method="gather",  # exact for unbounded offsets
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(got, oracle, rtol=2e-4, atol=2e-4)

    # and the wrong order must NOT match (the test has discriminating power)
    ow_wrong = jnp.asarray(_offset_conv_w(off_w, offset_order="yx"))
    ob_wrong = jnp.asarray(_offset_bias(off_b, offset_order="yx"))
    offsets_wrong = jax.lax.conv_general_dilated(
        x_nhwc, ow_wrong, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + ob_wrong
    got_wrong = np.asarray(
        deform_conv2d(
            x_nhwc, offsets_wrong, jnp.asarray(_conv_w(w)), jnp.asarray(b),
            padding=1, method="gather",
        )
    ).transpose(0, 3, 1, 2)
    assert np.abs(got_wrong - oracle).max() > 1e-2
