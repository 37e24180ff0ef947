"""Pallas TPU kernels.

``deform_conv2d_pallas`` — deformable convolution v1 forward. The XLA
masked-shifts formulation (ops.deform_conv) is algorithmically right but XLA
materialises every shifted term through HBM (~100 GB of traffic at
continent-tile sizes). Here the image is split into VMEM-resident spatial
tiles and all (2*clamp+2)^2 masked shift terms are evaluated on-chip,
finishing on the MXU.

Mosaic constraint map (every choice below was forced by an observed failure
of this image's remote TPU compiler):
- in-kernel halo DMA from ANY-space refs hangs the compile -> tiles are
  pre-extracted by XLA (vmapped dynamic_slice) and the kernel runs a plain
  BlockSpec grid;
- dynamic *sublane* slice starts must be provably 8-aligned and dynamic lane
  slicing is worse -> all tensors are laid out with leading *batch* dims for
  every dynamically-indexed axis: x tiles (rows, 1, C, 128), offsets
  (rows, 2K, 1, 128), weights (K, C_out, C); row/tap indices are batch
  indices, which are unconstrained;
- column shifts become dynamic *lane rotations* (pltpu.roll) of a 128-lane
  row slab sized so bw=120 output columns + 2*4 halo lanes never wrap;
- large SSA accumulators stall the compiler -> loop bodies only ever hold
  (C, 128)-sized values, and per-row results stream straight to out_ref.

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

# lane geometry: 120 output columns + 4 halo lanes each side = 128 lanes
_BW = 120
_LANE_HALO = 4  # >= padding + clamp + 1 shift reach per side (k=3,p=1,clamp=2)
_LANES = _BW + 2 * _LANE_HALO


def _deform_rows_kernel(
    x_ref,  # (bh + 2*rh, 1, C, 128) VMEM — halo'd row slabs (batch-major rows)
    off_ref,  # (bh, 2K, 1, 128) VMEM — per-row, per-tap offset lane vectors
    w_ref,  # (K, C_out, C) VMEM
    b_ref,  # (1, C_out, 1) VMEM
    out_ref,  # (bh, 1, C_out, 128) VMEM
    *,
    bh: int,
    row_halo: int,
    padding: int,
    clamp: int,
    kh: int,
    kw: int,
):
    k = kh * kw
    c_in = x_ref.shape[3]
    c_out = out_ref.shape[3]
    span = 2 * clamp + 2

    # lane-index grids for building the banded shift matrix S
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_LANES,), 0)
    valid = (lane < _BW).astype(jnp.float32)

    def row_body(r, _):
        def tap_body(t, acc):
            u = t // kw
            v = t % kw
            dy = jnp.clip(
                off_ref[0, r, t, 0, :].astype(jnp.float32), -clamp, clamp
            )
            dx = jnp.clip(
                off_ref[0, r, k + t, 0, :].astype(jnp.float32), -clamp, clamp
            )
            iy = jnp.floor(dy)
            ix = jnp.floor(dx)
            fy = dy - iy
            fx = dx - ix

            # Banded shift-sum matrix: S[l, j] = wx_{l-j-base}(j), so the
            # whole sx sum collapses into one MXU matmul slab @ S per sy.
            base = _LANE_HALO + (v - padding)
            band = l_idx - j_idx - base  # == sx where the band is active
            s_mat = jnp.zeros((_LANES, _LANES), jnp.float32)
            for sx in range(-clamp, clamp + 2):
                wx = ((1.0 - fx) * (ix == sx) + fx * (ix == sx - 1)) * valid
                s_mat = s_mat + (band == sx) * wx[None, :]

            y_t = jnp.zeros((c_in, _LANES), jnp.float32)
            for sy in range(-clamp, clamp + 2):
                wy = (1.0 - fy) * (iy == sy) + fy * (iy == sy - 1)
                slab = x_ref[0, r + row_halo + (u - padding) + sy, 0]  # (C, 128)
                y_t = y_t + wy[None, :] * jnp.dot(
                    slab, s_mat, preferred_element_type=jnp.float32
                )

            return acc + jnp.dot(
                w_ref[t], y_t, preferred_element_type=jnp.float32
            )

        acc = jax.lax.fori_loop(
            0, k, tap_body, jnp.zeros((c_out, _LANES), jnp.float32)
        )
        out_ref[0, r, 0] = (acc + b_ref[0]).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bh, row_body, 0)


def deform_conv2d_pallas(
    x: jax.Array,  # (N, H, W, C_in) NHWC
    offsets: jax.Array,  # (N, H, W, 2*K)
    weight: jax.Array,  # (kh, kw, C_in, C_out)
    bias: Optional[jax.Array] = None,
    padding: int = 1,
    clamp: int = 2,
    block_rows: int = 64,
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
    bh = block_rows
    assert padding + clamp + 1 <= _LANE_HALO, "shift reach exceeds lane halo"
    row_halo = _LANE_HALO

    hp = -(-h // bh) * bh
    wp = -(-w // _BW) * _BW
    gy, gx = hp // bh, wp // _BW
    num_tiles = n * gy * gx

    # channels-first padded image: (N, C, H + 2rh, W + 2lh)
    x_cf = jnp.transpose(x, (0, 3, 1, 2))
    x_big = jnp.pad(
        x_cf,
        (
            (0, 0),
            (0, 0),
            (row_halo, row_halo + hp - h),
            (_LANE_HALO, _LANE_HALO + wp - w),
        ),
    )

    starts = jnp.asarray(
        [
            (ni, ty * bh, tx * _BW)
            for ni in range(n)
            for ty in range(gy)
            for tx in range(gx)
        ],
        jnp.int32,
    )

    def grab(s):
        # (C, bh + 2rh, 128) -> batch-major rows (bh + 2rh, 1, C, 128)
        sl = jax.lax.dynamic_slice(
            x_big,
            (s[0], 0, s[1], s[2]),
            (1, c_in, bh + 2 * row_halo, _LANES),
        )[0]
        return jnp.transpose(sl, (1, 0, 2))[:, None]

    x_tiles = jax.vmap(grab)(starts)  # (T, bh+2rh, 1, C, 128)

    # offsets -> (T, bh, 2K, 1, 128): per-row, per-channel lane vectors with
    # the lane dim holding the tile's output columns (halo lanes zero)
    off_p = jnp.pad(offsets, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    off_t = (
        off_p.reshape(n, gy, bh, gx, _BW, 2 * k)
        .transpose(0, 1, 3, 2, 5, 4)  # n, gy, gx, bh, 2K, bw
        .reshape(num_tiles, bh, 2 * k, 1, _BW)
    )
    off_t = jnp.pad(off_t, ((0, 0), (0, 0), (0, 0), (0, 0), (0, 2 * _LANE_HALO)))

    w_t = jnp.transpose(weight.reshape(k, c_in, c_out), (0, 2, 1))  # (K, C_out, C)
    b = (
        jnp.zeros((1, c_out, 1), x.dtype)
        if bias is None
        else bias.reshape(1, c_out, 1)
    )

    kernel = functools.partial(
        _deform_rows_kernel,
        bh=bh,
        row_halo=row_halo,
        padding=padding,
        clamp=clamp,
        kh=kh,
        kw=kw,
    )

    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, bh + 2 * row_halo, 1, c_in, _LANES),
                lambda t: (t, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bh, 2 * k, 1, _LANES),
                lambda t: (t, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, c_out, c_in), lambda t: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, c_out, 1), lambda t: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, 1, c_out, _LANES),
            lambda t: (t, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles, bh, 1, c_out, _LANES), x.dtype
        ),
        interpret=interpret,
    )(x_tiles, off_t, w_t, b)

    # (T, bh, 1, C_out, 128) -> (N, H, W, C_out); keep lanes [0, _BW)
    out = out[:, :, 0, :, :_BW]  # (T, bh, C_out, bw)
    out = (
        out.reshape(n, gy, gx, bh, c_out, _BW)
        .transpose(0, 1, 3, 2, 5, 4)
        .reshape(n, hp, wp, c_out)
    )
    return out[:, :h, :w, :]
