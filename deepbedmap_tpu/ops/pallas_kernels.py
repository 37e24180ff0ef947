"""Pallas TPU kernels.

``deform_conv2d_pallas`` — deformable convolution v1 forward. The XLA
masked-shifts formulation (ops.deform_conv) is algorithmically right but XLA
materialises every shifted term through HBM (~100 GB of traffic at
continent-tile sizes). This kernel blocks the image into VMEM once per tile —
input read exactly once with a (clamp+2)-halo DMA — and evaluates all
(2*clamp+2)^2 masked shift terms per kernel tap in registers, finishing with
one MXU matmul per tap. HBM traffic drops to read-x + read-offsets + write-out.

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


def _deform_kernel(
    off_ref,  # (1, bh, bw, 2K) VMEM
    w_ref,  # (K, C, C_out) VMEM
    b_ref,  # (1, C_out) VMEM
    x_hbm,  # (N, H+2B, W+2B, C) in ANY/HBM
    out_ref,  # (1, bh, bw, C_out) VMEM
    x_vmem,  # scratch (bh+2B, bw+2B, C)
    sem,  # DMA semaphore
    *,
    bh: int,
    bw: int,
    big: int,
    padding: int,
    clamp: int,
    kh: int,
    kw: int,
):
    n = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    # One halo'd DMA per tile: the only read of x.
    cp = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(i * bh, bh + 2 * big), pl.ds(j * bw, bw + 2 * big), :],
        x_vmem,
        sem,
    )
    cp.start()
    cp.wait()

    k = kh * kw
    c_in = x_vmem.shape[-1]
    c_out = out_ref.shape[-1]
    shifts = range(-clamp, clamp + 2)

    acc = jnp.zeros((bh * bw, c_out), jnp.float32)
    for t in range(k):
        u, v = t // kw, t % kw
        dy = jnp.clip(off_ref[0, :, :, t].astype(jnp.float32), -clamp, clamp)
        dx = jnp.clip(off_ref[0, :, :, k + t].astype(jnp.float32), -clamp, clamp)
        iy = jnp.floor(dy)
        ix = jnp.floor(dx)
        fy = dy - iy
        fx = dx - ix

        y_t = jnp.zeros((bh, bw, c_in), jnp.float32)
        for sy in shifts:
            wy = (1.0 - fy) * (iy == sy) + fy * (iy == sy - 1)
            row0 = big + u - padding + sy
            for sx in shifts:
                wx = (1.0 - fx) * (ix == sx) + fx * (ix == sx - 1)
                col0 = big + v - padding + sx
                patch = x_vmem[row0 : row0 + bh, col0 : col0 + bw, :]
                y_t = y_t + (wy * wx)[:, :, None] * patch

        acc = acc + jnp.dot(
            y_t.reshape(bh * bw, c_in),
            w_ref[t],
            preferred_element_type=jnp.float32,
        )

    out_ref[0] = (acc + b_ref[0]).reshape(bh, bw, c_out).astype(out_ref.dtype)


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

    x_big = jnp.pad(
        x, ((0, 0), (big, big + hp - h), (big, big + wp - w), (0, 0))
    )
    off_p = jnp.pad(offsets, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    w_flat = weight.reshape(k, c_in, c_out)
    b = jnp.zeros((1, c_out), x.dtype) if bias is None else bias.reshape(1, c_out)

    kernel = functools.partial(
        _deform_kernel,
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
        grid=(n, hp // bh, wp // bw),
        in_specs=[
            pl.BlockSpec(
                (1, bh, bw, 2 * k),
                lambda ni, i, j: (ni, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, c_in, c_out), lambda ni, i, j: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, c_out), lambda ni, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays off-chip; manual DMA
        ],
        out_specs=pl.BlockSpec(
            (1, bh, bw, c_out), lambda ni, i, j: (ni, i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 2 * big, bw + 2 * big, c_in), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(off_p, w_flat, b, x_big)

    return out[:, :h, :w, :]
