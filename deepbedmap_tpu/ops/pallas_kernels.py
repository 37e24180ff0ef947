"""Pallas TPU kernels.

``deform_conv2d_pallas`` — deformable convolution v1 forward. The XLA
masked-shifts formulation (ops.deform_conv) is algorithmically right but XLA
materialises every shifted term through HBM (~100 GB of traffic at
continent-tile sizes). Here the image is split into VMEM-sized spatial tiles;
each tile (with its clamp+padding halo) is loaded into VMEM once and all
(2*clamp+2)^2 masked shift terms per kernel tap are evaluated in-register,
finishing with one MXU matmul per tap. HBM traffic drops to ~1.3x-read-x +
read-offsets + write-out.

Implementation note: the halo'd tiles are pre-extracted by XLA (a vmapped
dynamic_slice producing a (T, bh+2B, bw+2B, C) stack) and the kernel runs a
plain BlockSpec grid over T. An earlier variant DMA'd halo windows from HBM
inside the kernel (`make_async_copy` on an ANY-space ref); that form hangs this
environment's remote Mosaic compile, and the pre-extraction costs only ~30%
extra read traffic at 64-px tiles.

Numerics match ops.deform_conv._deform_conv_shifts exactly (same decomposition,
fp32 accumulation).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _deform_tile_kernel(
    x_ref,  # (1, bh+2B, bw+2B, C) VMEM — halo'd input tile
    off_ref,  # (1, bh, bw, 2K) VMEM
    w_ref,  # (K, C, C_out) VMEM
    b_ref,  # (1, C_out) VMEM
    out_ref,  # (1, bh, bw, C_out) VMEM
    y_scratch,  # (bh, bw, C) VMEM — per-tap sampled activations
    *,
    bh: int,
    bw: int,
    big: int,
    padding: int,
    clamp: int,
    kh: int,
    kw: int,
):
    """Mosaic-compile-friendly structure (found empirically — see module
    docstring): the sampled activation is built row-by-row inside a fori_loop
    whose body holds only (bw, C)-sized values, never a full (bh, bw, C) SSA
    accumulator (that form stalls the compiler's allocator for minutes). Taps
    stay statically unrolled so the per-(h,w) mask vectors come from *static*
    lane selects of the NHWC offset block, landing in sublane orientation,
    which broadcasts across the channel lanes for free."""
    k = kh * kw
    c_in = x_ref.shape[-1]
    c_out = out_ref.shape[-1]
    span = 2 * clamp + 2  # integer shifts per axis: [-clamp, clamp+1]

    out_ref[0] = jnp.broadcast_to(b_ref[0], (bh, bw, c_out)).astype(out_ref.dtype)

    for t in range(k):
        u, v = t // kw, t % kw

        def row_body(r, _, u=u, v=v, t=t):
            dy = jnp.clip(off_ref[0, r, :, t].astype(jnp.float32), -clamp, clamp)
            dx = jnp.clip(
                off_ref[0, r, :, k + t].astype(jnp.float32), -clamp, clamp
            )
            iy = jnp.floor(dy)
            ix = jnp.floor(dx)
            fy = dy - iy
            fx = dx - ix

            y_row = jnp.zeros((bw, c_in), jnp.float32)
            for s in range(span * span):
                sy = s // span - clamp
                sx = s % span - clamp
                wy = (1.0 - fy) * (iy == sy) + fy * (iy == sy - 1)
                wx = (1.0 - fx) * (ix == sx) + fx * (ix == sx - 1)
                patch = x_ref[
                    0,
                    big + u - padding + sy + r,
                    big + v - padding + sx : big + v - padding + sx + bw,
                    :,
                ]
                y_row = y_row + (wy * wx)[:, None] * patch
            y_scratch[r] = y_row
            return 0

        jax.lax.fori_loop(0, bh, row_body, 0)

        out_ref[0] = out_ref[0] + jax.lax.dot_general(
            y_scratch[...],
            w_ref[t],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def deform_conv2d_pallas(
    x: jax.Array,  # (N, H, W, C_in)
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

    x_big = jnp.pad(
        x, ((0, 0), (big, big + hp - h), (big, big + wp - w), (0, 0))
    )
    off_p = jnp.pad(offsets, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))

    # halo'd tile stack (N*T, bh+2B, bw+2B, C) via vmapped dynamic_slice
    starts = [
        (ni, ty * bh, tx * bw)
        for ni in range(n)
        for ty in range(gy)
        for tx in range(gx)
    ]
    starts = jnp.asarray(starts, jnp.int32)

    def grab(s):
        return jax.lax.dynamic_slice(
            x_big, (s[0], s[1], s[2], 0), (1, bh + 2 * big, bw + 2 * big, c_in)
        )[0]

    x_tiles = jax.vmap(grab)(starts)

    # offsets: non-overlapping retile (pure reshape/transpose)
    off_tiles = (
        off_p.reshape(n, gy, bh, gx, bw, 2 * k)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n * gy * gx, bh, bw, 2 * k)
    )

    w_flat = weight.reshape(k, c_in, c_out)
    b = jnp.zeros((1, c_out), x.dtype) if bias is None else bias.reshape(1, c_out)

    kernel = functools.partial(
        _deform_tile_kernel,
        bh=bh,
        bw=bw,
        big=big,
        padding=padding,
        clamp=clamp,
        kh=kh,
        kw=kw,
    )

    num_tiles = n * gy * gx
    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, bh + 2 * big, bw + 2 * big, c_in),
                lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bh, bw, 2 * k), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k, c_in, c_out), lambda t: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, c_out), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, bw, c_out), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, bh, bw, c_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((bh, bw, c_in), jnp.float32)],
        interpret=interpret,
    )(x_tiles, off_tiles, w_flat, b)

    # reassemble (N, H, W, C_out)
    out = (
        out.reshape(n, gy, gx, bh, bw, c_out)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, hp, wp, c_out)
    )
    return out[:, :h, :w, :]
