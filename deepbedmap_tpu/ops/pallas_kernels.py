"""Pallas TPU kernels.

``deform_conv2d_pallas`` — deformable convolution v1 forward. The XLA
masked-shifts formulation (ops.deform_conv) is algorithmically right but XLA
materialises every shifted term through HBM (~100 GB of traffic at
continent-tile sizes). Here the image is split into VMEM-sized spatial tiles
and all (2*clamp+2)^2 masked shift terms are evaluated on-chip, finishing on
the MXU.

Kernel design notes (each constraint found empirically against this image's
remote Mosaic compiler):
- halo'd tiles are pre-extracted by XLA (vmapped dynamic_slice stack) and the
  kernel runs a plain BlockSpec grid — in-kernel `make_async_copy` halo DMA
  from an ANY-space ref hangs the remote compile;
- the kernel works in channels-first (C, H, W) tile layout so the per-position
  (h, w) masks live in the same (sublane, lane) orientation as the image and
  broadcast across channels on the cheap batch axis;
- the kernel tap is a *grid* dimension with the output block revisited
  (accumulator pattern), so the body stays small enough to compile: one
  36-term mask build + a per-channel fori_loop + one MXU matmul;
- no loop body ever holds a full-tile SSA accumulator (that stalls the
  compiler's allocator for minutes) — per-iteration values are (bh, bw) or
  rows, written into VMEM scratch.

Numerics match ops.deform_conv._deform_conv_shifts exactly (same
decomposition, fp32 accumulation).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _deform_tap_kernel(
    x_ref,  # (1, C, bh+2B, bw+2B) VMEM — halo'd channels-first tile
    dy_ref,  # (1, 1, bh, bw) VMEM — this tap's y-offsets
    dx_ref,  # (1, 1, bh, bw) VMEM — this tap's x-offsets
    w_ref,  # (K, C_out, C) VMEM — weights, tap-major, transposed
    b_ref,  # (1, C_out) VMEM
    out_ref,  # (1, C_out, bh, bw) VMEM — revisited across the tap grid dim
    y_scratch,  # (C, bh, bw) VMEM — sampled activations for this tap
    mask_scratch,  # (span*span, bh, bw) VMEM — bilinear mask weights
    *,
    bh: int,
    bw: int,
    big: int,
    padding: int,
    clamp: int,
    kh: int,
    kw: int,
):
    tap = pl.program_id(1)
    k = kh * kw
    c_in = x_ref.shape[1]
    c_out = out_ref.shape[1]
    span = 2 * clamp + 2

    u = tap // kw  # dynamic tap row/col within the 3x3 kernel
    v = tap % kw

    dy = jnp.clip(dy_ref[0, 0].astype(jnp.float32), -clamp, clamp)
    dx = jnp.clip(dx_ref[0, 0].astype(jnp.float32), -clamp, clamp)
    iy = jnp.floor(dy)
    ix = jnp.floor(dx)
    fy = dy - iy
    fx = dx - ix

    def mask_body(s, _):
        sy = (s // span - clamp).astype(jnp.float32)
        sx = (s % span - clamp).astype(jnp.float32)
        wy = (1.0 - fy) * (iy == sy) + fy * (iy == sy - 1.0)
        wx = (1.0 - fx) * (ix == sx) + fx * (ix == sx - 1.0)
        mask_scratch[s] = wy * wx
        return 0

    jax.lax.fori_loop(0, span * span, mask_body, 0)

    def chan_body(c, _):
        y = jnp.zeros((bh, bw), jnp.float32)
        for s in range(span * span):
            sy = s // span - clamp
            sx = s % span - clamp
            patch = x_ref[
                0,
                c,
                pl.ds(big - padding + u + sy, bh),
                pl.ds(big - padding + v + sx, bw),
            ]
            y = y + mask_scratch[s] * patch
        y_scratch[c] = y
        return 0

    jax.lax.fori_loop(0, c_in, chan_body, 0)

    # (C_out, C) @ (C, bh*bw) on the MXU; bw == 128 keeps the collapse free
    contrib = jax.lax.dot_general(
        w_ref[tap],
        y_scratch[...].reshape(c_in, bh * bw),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(c_out, bh, bw)

    @pl.when(tap == 0)
    def _():
        out_ref[0] = (
            jnp.broadcast_to(b_ref[0][:, None, None], (c_out, bh, bw)) + contrib
        ).astype(out_ref.dtype)

    @pl.when(tap != 0)
    def _():
        out_ref[0] = out_ref[0] + contrib.astype(out_ref.dtype)


def deform_conv2d_pallas(
    x: jax.Array,  # (N, H, W, C_in) NHWC
    offsets: jax.Array,  # (N, H, W, 2*K)
    weight: jax.Array,  # (kh, kw, C_in, C_out)
    bias: Optional[jax.Array] = None,
    padding: int = 1,
    clamp: int = 2,
    block: tuple = (64, 128),
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Forward-only Pallas deformable conv (see module docstring).

    H/W are padded up to block multiples internally; output is cropped back.
    ``interpret`` defaults to True off-TPU so tests run on the CPU mesh.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c_in = x.shape
    kh, kw, _, c_out = weight.shape
    k = kh * kw
    bh, bw = block

    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw
    big = padding + clamp + 1
    gy, gx = hp // bh, wp // bw
    num_tiles = n * gy * gx
    span = 2 * clamp + 2

    # channels-first padded image, then halo'd tile stack (T, C, bh+2B, bw+2B)
    x_cf = jnp.transpose(x, (0, 3, 1, 2))
    x_big = jnp.pad(
        x_cf, ((0, 0), (0, 0), (big, big + hp - h), (big, big + wp - w))
    )
    starts = jnp.asarray(
        [
            (ni, ty * bh, tx * bw)
            for ni in range(n)
            for ty in range(gy)
            for tx in range(gx)
        ],
        jnp.int32,
    )

    def grab(s):
        return jax.lax.dynamic_slice(
            x_big,
            (s[0], 0, s[1], s[2]),
            (1, c_in, bh + 2 * big, bw + 2 * big),
        )[0]

    x_tiles = jax.vmap(grab)(starts)

    # offsets -> (T, K, bh, bw) dy and dx stacks
    off_p = jnp.pad(offsets, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    off_t = (
        off_p.reshape(n, gy, bh, gx, bw, 2 * k)
        .transpose(0, 1, 3, 5, 2, 4)
        .reshape(num_tiles, 2 * k, bh, bw)
    )
    dy_t = off_t[:, :k]
    dx_t = off_t[:, k:]

    w_t = jnp.transpose(weight.reshape(k, c_in, c_out), (0, 2, 1))  # (K, C_out, C)
    b = jnp.zeros((1, c_out), x.dtype) if bias is None else bias.reshape(1, c_out)

    kernel = functools.partial(
        _deform_tap_kernel,
        bh=bh,
        bw=bw,
        big=big,
        padding=padding,
        clamp=clamp,
        kh=kh,
        kw=kw,
    )

    out = pl.pallas_call(
        kernel,
        grid=(num_tiles, k),
        in_specs=[
            pl.BlockSpec(
                (1, c_in, bh + 2 * big, bw + 2 * big),
                lambda t, tap: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bh, bw), lambda t, tap: (t, tap, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bh, bw), lambda t, tap: (t, tap, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, c_out, c_in), lambda t, tap: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, c_out), lambda t, tap: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c_out, bh, bw), lambda t, tap: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, c_out, bh, bw), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((c_in, bh, bw), jnp.float32),
            pltpu.VMEM((span * span, bh, bw), jnp.float32),
        ],
        interpret=interpret,
    )(x_tiles, dy_t, dx_t, w_t, b)

    # reassemble (N, H, W, C_out)
    out = (
        out.reshape(n, gy, gx, c_out, bh, bw)
        .transpose(0, 1, 4, 2, 5, 3)
        .reshape(n, hp, wp, c_out)
    )
    return out[:, :h, :w, :]
