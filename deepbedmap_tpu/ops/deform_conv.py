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

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _bilinear_gather(
    x_pad: jax.Array,  # (N, HP, WP, C) zero-padded input
    rows: jax.Array,  # (N, H, W) fractional row coords into x_pad
    cols: jax.Array,  # (N, H, W) fractional col coords into x_pad
) -> jax.Array:
    """Sample x_pad at fractional (rows, cols); returns (N, H, W, C).

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


def _deform_conv_gather(
    x: jax.Array,
    offsets: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array],
    padding: int,
) -> jax.Array:
    """Exact sampler via XLA gathers — any offset magnitude, but gathers run
    far from bandwidth-bound on TPU (measured ~30x); prefer 'shifts' there."""
    n, h, w, c_in = x.shape
    kh, kw, wc_in, c_out = weight.shape
    k = kh * kw
    assert wc_in == c_in, (wc_in, c_in)
    assert offsets.shape == (n, h, w, 2 * k), (offsets.shape, (n, h, w, 2 * k))

    x_pad = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))

    # Base sampling grid in padded coordinates: output pixel (i, j) tap (u, v)
    # sits at (i + u, j + v) when padding == (k-1)/2 and offsets are zero.
    ii = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[None]
    jj = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[None]

    # Accumulate tap by tap: peak memory one (N, H, W, C_in) sample instead of
    # a (N, H, W, K, C_in) tensor — at continent-tile resolution (1144^2 x 64ch)
    # the fused form would need ~30 GB of HBM. Each tap is still one MXU matmul
    # (N*H*W, C_in) @ (C_in, C_out); the Python loop is a static k unroll.
    acc = jnp.zeros((n * h * w, c_out), jnp.float32)
    rhs = weight.reshape(k, c_in, c_out)
    for t in range(k):
        u, v = t // kw, t % kw
        rows = ii + u + offsets[..., t].astype(jnp.float32)
        cols = jj + v + offsets[..., k + t].astype(jnp.float32)
        sampled = _bilinear_gather(x_pad, rows, cols)  # (N, H, W, C_in)
        acc = acc + jnp.dot(
            sampled.reshape(n * h * w, c_in),
            rhs[t],
            preferred_element_type=jnp.float32,
        )

    out = acc.reshape(n, h, w, c_out).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def _deform_conv_shifts(
    x: jax.Array,
    offsets: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array],
    padding: int,
    clamp: int,
) -> jax.Array:
    """Gather-free sampler: offsets are clamped to [-clamp, clamp] and the
    bilinear sample decomposes over the (2*clamp+2)^2 integer shifts as
    statically-sliced reads weighted by per-position masks:

        y_k(p) = sum_{sy,sx} wy[sy](p) * wx[sx](p) * x(p + k + (sy, sx))
        wy[s]  = (1-fy) * [floor(dy) == s] + fy * [floor(dy) == s-1]

    Everything is dense VPU math + 9 MXU matmuls — no gathers at all, which on
    TPU is ~30x faster than the gather formulation at continent-tile sizes.
    Exact vs. the gather path whenever all offsets lie within the clamp window.
    """
    n, h, w, c_in = x.shape
    kh, kw, _, c_out = weight.shape
    k = kh * kw

    big = padding + clamp + 1  # covers tap shift + max integer shift + corner
    x_big = jnp.pad(x, ((0, 0), (big, big), (big, big), (0, 0)))

    rhs = weight.reshape(k, c_in, c_out)
    acc = jnp.zeros((n * h * w, c_out), jnp.float32)
    shifts = range(-clamp, clamp + 2)
    for t in range(k):
        u, v = t // kw, t % kw
        dy = jnp.clip(offsets[..., t].astype(jnp.float32), -clamp, clamp)
        dx = jnp.clip(offsets[..., k + t].astype(jnp.float32), -clamp, clamp)
        iy = jnp.floor(dy)
        ix = jnp.floor(dx)
        fy = dy - iy
        fx = dx - ix
        wy = {
            s: (1.0 - fy) * (iy == s) + fy * (iy == s - 1) for s in shifts
        }
        wx = {
            s: (1.0 - fx) * (ix == s) + fx * (ix == s - 1) for s in shifts
        }
        y_t = jnp.zeros((n, h, w, c_in), jnp.float32)
        for sy in shifts:
            row0 = big + u - padding + sy
            for sx in shifts:
                col0 = big + v - padding + sx
                patch = jax.lax.slice(
                    x_big,
                    (0, row0, col0, 0),
                    (n, row0 + h, col0 + w, c_in),
                )
                y_t = y_t + (wy[sy] * wx[sx])[..., None] * patch
        acc = acc + jnp.dot(
            y_t.reshape(n * h * w, c_in),
            rhs[t],
            preferred_element_type=jnp.float32,
        )

    out = acc.reshape(n, h, w, c_out).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def _deform_conv_shifts_zproj(
    x: jax.Array,
    offsets: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array],
    padding: int,
    clamp: int,
) -> jax.Array:
    """Masked-shift sampler with the channel contraction re-associated:
    because bilinear sampling is linear in the channels, project the input
    through the tap weights FIRST (``z_t = x @ W_t``, one cheap matmul), then
    run the (2*clamp+2)^2 masked shifts on the (N, H, W, C_out) projections.

    Term-evaluation cost scales with C_out instead of C_in — for the
    reference generator's final layer (64 -> 1, srgan_train.py:517-523) that
    is a ~60x traffic cut. Same decomposition as ``_deform_conv_shifts``, so
    outputs agree to fp32 round-off (~1e-6 relative).
    """
    n, h, w, c_in = x.shape
    kh, kw, _, c_out = weight.shape
    k = kh * kw

    # (K, N, H, W, C_out) tap projections — K matmuls on the MXU
    z = jnp.einsum(
        "nhwc,kcd->knhwd",
        x,
        weight.reshape(k, c_in, c_out),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    big = padding + clamp + 1
    z_big = jnp.pad(z, ((0, 0), (0, 0), (big, big), (big, big), (0, 0)))

    acc = jnp.zeros((n, h, w, c_out), jnp.float32)
    shifts = range(-clamp, clamp + 2)
    for t in range(k):
        u, v = t // kw, t % kw
        dy = jnp.clip(offsets[..., t].astype(jnp.float32), -clamp, clamp)
        dx = jnp.clip(offsets[..., k + t].astype(jnp.float32), -clamp, clamp)
        iy = jnp.floor(dy)
        ix = jnp.floor(dx)
        fy = dy - iy
        fx = dx - ix
        wy = {s: (1.0 - fy) * (iy == s) + fy * (iy == s - 1) for s in shifts}
        wx = {s: (1.0 - fx) * (ix == s) + fx * (ix == s - 1) for s in shifts}
        for sy in shifts:
            row0 = big + u - padding + sy
            for sx in shifts:
                col0 = big + v - padding + sx
                patch = jax.lax.slice(
                    z_big,
                    (t, 0, row0, col0, 0),
                    (t + 1, n, row0 + h, col0 + w, c_out),
                )[0]
                acc = acc + (wy[sy] * wx[sx])[..., None] * patch

    out = acc.astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_path(cfg, x, offsets, weight, bias):
    from deepbedmap_tpu.ops.pallas_kernels import (
        deform_conv2d_pallas,
        deform_conv2d_pallas_zproj1,
    )

    padding, clamp, in_hcw, out_hcw = cfg
    if weight.shape[3] == 1:
        return deform_conv2d_pallas_zproj1(
            x, offsets, weight, bias, padding, clamp,
            in_hcw=in_hcw, out_hcw=out_hcw,
        )
    return deform_conv2d_pallas(
        x, offsets, weight, bias, padding, clamp,
        in_hcw=in_hcw, out_hcw=out_hcw,
    )


def _pallas_fwd(cfg, x, offsets, weight, bias):
    return _pallas_path(cfg, x, offsets, weight, bias), (x, offsets, weight, bias)


def _pallas_bwd(cfg, residuals, g):
    # Backward through the numerically-identical XLA shifts formulation —
    # training tiles are small (36x36), so the XLA path's cost is irrelevant.
    # The shifts formulation is NHWC; channels-before-width layouts are
    # transposed at this boundary (and the x/offsets cotangents back).
    padding, clamp, in_hcw, out_hcw = cfg
    x, offsets, weight, bias = residuals
    if in_hcw:
        x = jnp.swapaxes(x, 2, 3)
        offsets = jnp.swapaxes(offsets, 2, 3)
    if out_hcw:
        g = jnp.swapaxes(g, 2, 3)
    _, vjp = jax.vjp(
        lambda xx, oo, ww, bb: _deform_conv_shifts(xx, oo, ww, bb, padding, clamp),
        x,
        offsets,
        weight,
        bias,
    )
    gx, go, gw, gb = vjp(g)
    if in_hcw:
        gx = jnp.swapaxes(gx, 2, 3)
        go = jnp.swapaxes(go, 2, 3)
    return gx, go, gw, gb


_pallas_path.defvjp(_pallas_fwd, _pallas_bwd)


def deform_conv2d(
    x: jax.Array,  # (N, H, W, C_in) — or (N, H, C_in, W) with in_hcw
    offsets: jax.Array,  # (N, H, W, 2*K) with K = kh*kw; [:K]=dy, [K:]=dx
    weight: jax.Array,  # (kh, kw, C_in, C_out)
    bias: Optional[jax.Array] = None,  # (C_out,)
    padding: int = 1,
    method: str = "auto",
    clamp: int = 2,
    in_hcw: bool = False,
    out_hcw: bool = False,
) -> jax.Array:
    """Deformable convolution v1, stride 1, square zero padding.

    Equivalent in semantics to Chainer's deformable_convolution_2d_sampler with
    stride 1 / pad ``padding`` (reference usage is always k=3, s=1, p=1:
    srgan_train.py:506-523).

    method:
      'auto' (default) — for large (inference-scale) images: 'zproj' when the
          layer contracts channels (c_out*4 <= c_in, e.g. the final 64->1
          layer) else 'pallas' on TPU; 'shifts' for small training tiles /
          CPU, where the kernel's block padding outweighs its fusion win.
      'zproj' — project channels through the tap weights first, then sample
          the (N,H,W,C_out) projections with masked shifts; term cost scales
          with C_out instead of C_in. Pure XLA, natively differentiable.
      'pallas' — VMEM-blocked TPU kernel: the sx shift-sum is a banded
          (128,128) matrix built from the offset masks, so each (tap, sy)
          term is one MXU matmul (ops.pallas_kernels; interpreted off-TPU;
          differentiable via a custom VJP that reuses the 'shifts' backward).
          ~5x the XLA path at continent-tile sizes; offsets clamped to
          [-clamp, clamp] px (learned offsets here stay well inside ±2).
      'shifts' — gather-free masked-shift decomposition in pure XLA
          (portable; every shifted term round-trips HBM).
      'gather' — exact for unbounded offsets; slow on TPU, fine on CPU.

    ``in_hcw`` / ``out_hcw``: channels-before-width layouts (N, H, C, W) on
    input / output. The pallas path consumes/produces them natively (its row
    tiler becomes pad + gather with no transposes — the layout the producing
    conv can emit for ~free, models.blocks.ConvHCW); the XLA fallbacks
    transpose at entry/exit for correctness.
    """
    if method == "auto":
        on_tpu = jax.default_backend() == "tpu"
        spatial = x.shape[1] * (x.shape[3] if in_hcw else x.shape[2])
        large = spatial >= 256 * 256
        contracting = weight.shape[3] * 4 <= weight.shape[2]
        if on_tpu and large:
            method = "pallas"  # dispatches to zproj1 kernel when c_out == 1
        elif large and contracting:
            method = "zproj"
        else:
            method = "shifts"
    if method == "pallas":
        b = jnp.zeros((weight.shape[-1],), x.dtype) if bias is None else bias
        return _pallas_path((padding, clamp, in_hcw, out_hcw), x, offsets, weight, b)
    if in_hcw:
        x = jnp.swapaxes(x, 2, 3)
        offsets = jnp.swapaxes(offsets, 2, 3)
    if method == "zproj":
        out = _deform_conv_shifts_zproj(x, offsets, weight, bias, padding, clamp)
    elif method == "gather":
        out = _deform_conv_gather(x, offsets, weight, bias, padding)
    elif method == "shifts":
        out = _deform_conv_shifts(x, offsets, weight, bias, padding, clamp)
    else:
        raise ValueError(f"unknown deform_conv2d method {method!r}")
    return jnp.swapaxes(out, 2, 3) if out_hcw else out
