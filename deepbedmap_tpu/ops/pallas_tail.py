"""Fused generator tail: both deformable output layers in ONE tiled domain.

The reference generator ends with two Chainer deformable convolutions
(srgan_train.py:506-523): offset-conv -> deform(64->64) -> LeakyReLU ->
offset-conv -> deform(64->1). The standalone Pallas path (ops.deform_conv)
round-trips through image space between the layers — untile the 64-channel
output, run the second offset conv and the zproj tap projection as
image-space XLA ops, then re-tile for the second sampler. The in-model
ablation (benchmarks/RESULTS.md, 2026-08-18) measured that glue at ~25 ms
of the 116 ms continent-tile forward, and showed it is layout-invariant:
XLA materialises the same physical shuffle whether it is written as a 6-D
reshape/transpose, a swapaxes feeding a gather, or a producer-emitted
(N, H, C, W) conv. The only way to remove it is to never leave the tiled
domain — which is what this module does:

1. tile x ONCE into halo'd row-major tiles (T, bh + 2*RH, C, 128);
2. run the deform64 sampler with frame-aligned offsets, emitting an
   E-halo'd output tile (rows bh + 2E, all 128 lanes) with the LeakyReLU
   fused into the output write;
3. mask the emitted halo to the true image extent (matching the unfused
   path's zero 'SAME' padding semantics at image borders);
4. the second offset conv runs as a VALID XLA conv directly on the tile
   batch (halo'd tiles make VALID == image-space SAME, bit-exactly);
5. the zproj tap projection is an einsum on the tile batch; the taps'
   static column shifts become lane rolls on tiles (wrap lanes land
   outside the consumed region);
6. the zproj1 sampler consumes the tiles and only its 1-channel output is
   untiled — 64x less untile traffic than the standalone path.

Geometry: output tile 112 lanes (vs the standalone kernels' 120) with an
8-lane halo each side, because deform64 must emit E=4 extra rows/lanes of
valid output (the second sampler's reach is padding + clamp + 1 = 4) and
its own sampling reach needs E+4 more lanes of x. The redundant compute
this buys (~+10% lanes, ~+12% rows at bh=64) is what the removed
marshalling is traded against — measured, not assumed (the in-model
ablation: ``ONLY=full,tail_fused python benchmarks/bench_ablate.py``).

Numerics: identical decomposition to the unfused pallas path; parity vs
the pure-XLA reference composition is pinned in tests/test_pallas_tail.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepbedmap_tpu.ops.deform_conv import (
    _deform_conv_shifts,
    _deform_conv_shifts_zproj,
)
from deepbedmap_tpu.ops.pallas_kernels import (
    _LANES,
    _deform_stacked_kernel,
    _deform_zproj1_kernel,
)

_BW = 112  # output columns per tile (the standalone kernels use 120)
_LH = 8  # lane halo each side: E + (padding + clamp + 1) = 8 at clamp=2
_RH = 8  # row halo on x tiles
_E = 4  # emitted halo on the intermediate (a5 / z / off2) tiles


def _plan(n: int, h: int, w: int, bh: int):
    hp = -(-h // bh) * bh
    wp = -(-w // _BW) * _BW
    gy, gx = hp // bh, wp // _BW
    starts = jnp.asarray(
        [
            (ni, ty * bh, tx * _BW)
            for ni in range(n)
            for ty in range(gy)
            for tx in range(gx)
        ],
        jnp.int32,
    )
    return hp, wp, gy, gx, n * gy * gx, starts


def _tile(x_hcw, starts, bh, rh, h, w, hp, wp):
    """(N, H, C, W) -> halo'd row tiles (T, bh + 2*rh, C, 128), pad + gather
    only (the fused frame: lane 0 of every tile sits _LH lanes left of its
    first output column)."""
    c = x_hcw.shape[2]
    x_hcw = jnp.pad(
        x_hcw,
        ((0, 0), (rh, rh + hp - h), (0, 0), (_LH, (wp + _LH) - w)),
    )

    def grab(s):
        return jax.lax.dynamic_slice(
            x_hcw, (s[0], s[1], 0, s[2]), (1, bh + 2 * rh, c, _LANES)
        )[0]

    return jax.vmap(grab)(starts)


def _conv_hcw(x, kernel, bias, padding: str, in_nhwc: bool = False, cdt=None):
    """3x3 conv emitting channels-before-width (N, H, C, W) natively.

    ``cdt``: compute dtype for the conv (inputs/kernel/bias cast in, result
    cast back to fp32) — mirrors flax ``nn.Conv(dtype=...)`` so the fused
    tail's offset convs match the unfused ``DeformableConv`` precision under
    ``compute_dtype='bfloat16'``."""
    cdt = jnp.float32 if cdt is None else cdt
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC" if in_nhwc else "NHCW", "HWIO", "NHCW")
    )
    out = jax.lax.conv_general_dilated(
        x.astype(cdt), kernel.astype(cdt), (1, 1), padding,
        dimension_numbers=dn,
    ) + bias.astype(cdt)[None, None, :, None]
    return out.astype(jnp.float32)


def _tail_reference(
    x, o1k, o1b, w1, b1, o2k, o2b, w2, b2, padding, clamp, compute_dtype=None
):
    """Unfused pure-XLA composition (offset conv -> shifts sampler -> lrelu
    -> offset conv -> zproj sampler). The numerical oracle for the fused
    kernel AND the backward path of its custom VJP (training tiles are
    small, so the XLA path's cost is irrelevant there). ``compute_dtype``
    runs the two offset convs at that precision — exactly what the unfused
    ``models.blocks.DeformableConv`` does via ``nn.Conv(dtype=...)`` — while
    samplers and kernel matmuls stay fp32 in both paths."""
    cdt = jnp.float32 if compute_dtype in (None, "float32") else jnp.dtype(
        compute_dtype
    )

    def off_conv(a, kk, bb):
        dn = jax.lax.conv_dimension_numbers(
            a.shape, kk.shape, ("NHWC", "HWIO", "NHWC")
        )
        out = jax.lax.conv_general_dilated(
            a.astype(cdt), kk.astype(cdt), (1, 1), "SAME",
            dimension_numbers=dn,
        ) + bb.astype(cdt)
        return out.astype(jnp.float32)

    off1 = off_conv(x, o1k, o1b)
    x = x.astype(jnp.float32)
    a5 = _deform_conv_shifts(x, off1, w1, b1, padding, clamp)
    a5 = jnp.where(a5 >= 0, a5, 0.2 * a5)
    off2 = off_conv(a5, o2k, o2b)
    return _deform_conv_shifts_zproj(a5, off2, w2, b2, padding, clamp)


def _fused_tail_pallas(
    x, o1k, o1b, w1, b1, o2k, o2b, w2, b2, padding, clamp, block_rows,
    interpret, pack_taps=False, compute_dtype=None,
):
    n, h, w, c = x.shape
    k = 9
    bh = block_rows
    c_out = w1.shape[3]
    cdt = jnp.float32 if compute_dtype in (None, "float32") else jnp.dtype(
        compute_dtype
    )
    hp, wp, gy, gx, num_tiles, starts = _plan(n, h, w, bh)

    # first offset conv in image space (bit-equal to the unfused layer,
    # including its compute dtype), emitted channels-before-width so tiling
    # is pad + gather; samplers and kernel matmuls run fp32 like the
    # unfused DeformableConv
    off1 = _conv_hcw(x, o1k, o1b, "SAME", in_nhwc=True, cdt=cdt)  # (N,H,2K,W)
    x = x.astype(jnp.float32)

    x_hcw = jnp.swapaxes(x, 2, 3)
    x_t = _tile(x_hcw, starts, bh, _RH, h, w, hp, wp)
    # (T, bh + 16, C, 128): tile row 0 is image row start - _RH; a5-frame
    # row m reads x tile rows [m+1, m+9)
    off1_t = _tile(off1, starts, bh, _E, h, w, hp, wp)[:, :, :, None, :]
    # (T, bh + 2E, 2K, 1, 128) — SAME frame as x (lane_base 0)

    w1_t = jnp.transpose(w1.reshape(k, c, c_out), (2, 0, 1)).reshape(
        c_out, k * c
    )

    kernel_a = functools.partial(
        _deform_stacked_kernel,
        bh=bh + 2 * _E,
        row_halo=_RH - _E,
        padding=padding,
        clamp=clamp,
        kh=3,
        kw=3,
        lane_base=0,
        mask_lanes=False,
        apply_lrelu=True,
        pack_taps=pack_taps,
    )
    a5_t = pl.pallas_call(
        kernel_a,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, bh + 2 * _RH, 1, c, _LANES),
                lambda t: (t, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bh + 2 * _E, 2 * k, 1, _LANES),
                lambda t: (t, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (c_out, k * c), lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, c_out, 1), lambda t: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bh + 2 * _E, 1, c_out, _LANES),
            lambda t: (t, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles, bh + 2 * _E, 1, c_out, _LANES), x.dtype
        ),
        interpret=interpret,
    )(x_t[:, :, None], off1_t, w1_t, b1.reshape(1, c_out, 1))[:, :, 0]
    # (T, bh + 2E, C_out, 128)

    # mask the emitted halo to the true image extent: the unfused path's
    # consumers see zero 'SAME' padding outside the image, while the fused
    # kernel emits lrelu(bias)-coloured values there
    row_img = starts[:, 1][:, None] + jnp.arange(bh + 2 * _E)[None, :] - _E
    col_img = starts[:, 2][:, None] + jnp.arange(_LANES)[None, :] - _LH
    mask = (
        ((row_img >= 0) & (row_img < h))[:, :, None, None]
        & ((col_img >= 0) & (col_img < w))[:, None, None, :]
    )
    a5_t = a5_t * mask.astype(a5_t.dtype)

    # second offset conv directly on the tile batch: VALID on halo'd tiles
    # == image-space SAME, bit-exactly; pad 1 row/lane back to the frame
    off2_t = _conv_hcw(a5_t, o2k, o2b, "VALID", cdt=cdt)
    off2_t = jnp.pad(off2_t, ((0, 0), (1, 1), (0, 0), (1, 1)))[:, :, :, None, :]

    # zproj tap projections on the tile batch + static tap column shifts as
    # lane rolls (wrap lanes sit outside the sampler's consumed region)
    z_t = jnp.einsum(
        "trcw,kc->trkw",
        a5_t,
        w2.reshape(k, c),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    z_t = jnp.stack(
        [
            jnp.roll(z_t[:, :, t], -(t % 3 - padding), axis=-1)
            if t % 3 != padding
            else z_t[:, :, t]
            for t in range(k)
        ],
        axis=2,
    ).astype(x.dtype)

    kernel_b = functools.partial(
        _deform_zproj1_kernel,
        bh=bh,
        row_halo=_E,
        padding=padding,
        clamp=clamp,
        kh=3,
        kw=3,
        lane_base=0,
        off_row_base=_E,
    )
    out = pl.pallas_call(
        kernel_b,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, bh + 2 * _E, k, _LANES),
                lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bh + 2 * _E, 2 * k, 1, _LANES),
                lambda t: (t, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, 1), lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, 1, _LANES),
            lambda t: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, bh, 1, _LANES), x.dtype),
        interpret=interpret,
    )(z_t, off2_t, b2.reshape(1, 1, 1))

    # (T, bh, 1, 128) -> (N, H, W, 1): only 1 channel ever leaves the tiles
    out = (
        out[:, :, :, _LH : _LH + _BW]
        .reshape(n, gy, gx, bh, 1, _BW)
        .transpose(0, 1, 3, 2, 5, 4)
        .reshape(n, gy * bh, gx * _BW, 1)
    )
    return out[:, :h, :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_path(cfg, x, o1k, o1b, w1, b1, o2k, o2b, w2, b2):
    padding, clamp, block_rows, interpret, pack_taps, compute_dtype = cfg
    return _fused_tail_pallas(
        x, o1k, o1b, w1, b1, o2k, o2b, w2, b2, padding, clamp, block_rows,
        interpret, pack_taps, compute_dtype,
    )


def _fused_fwd(cfg, *args):
    return _fused_path(cfg, *args), args


def _fused_bwd(cfg, residuals, g):
    padding, clamp = cfg[0], cfg[1]
    compute_dtype = cfg[5]
    _, vjp = jax.vjp(
        lambda *a: _tail_reference(*a, padding, clamp, compute_dtype),
        *residuals,
    )
    return vjp(g)


_fused_path.defvjp(_fused_fwd, _fused_bwd)


def fused_deform_tail(
    x: jax.Array,  # (N, H, W, C) NHWC, the last upsample conv's activation
    o1k: jax.Array,  # (3, 3, C, 18) first offset conv
    o1b: jax.Array,  # (18,)
    w1: jax.Array,  # (3, 3, C, C) deform64 kernel
    b1: jax.Array,  # (C,)
    o2k: jax.Array,  # (3, 3, C, 18) second offset conv
    o2b: jax.Array,  # (18,)
    w2: jax.Array,  # (3, 3, C, 1) final deform kernel
    b2: jax.Array,  # (1,)
    padding: int = 1,
    clamp: int = 2,
    block_rows: int = 64,
    method: str = "auto",
    interpret: Optional[bool] = None,
    pack_taps: bool = False,
    compute_dtype: Optional[str] = None,
) -> jax.Array:
    """Both generator deform output layers fused in one tiled domain (module
    docstring). ``method='auto'`` uses the fused pallas path on TPU at
    inference-scale images and the pure-XLA reference composition otherwise
    (small training tiles, CPU); differentiable everywhere (custom VJP
    through the reference composition). ``pack_taps`` selects the v4
    tap-packed deform64 body (one slab + lane-concatenated dot per kernel
    row — see ops.pallas_kernels._deform_stacked_kernel). ``compute_dtype``
    ('bfloat16') runs the two offset convs at that precision, matching the
    unfused ``DeformableConv(dtype=...)``; samplers/kernel matmuls stay
    fp32 in every path."""
    assert padding + clamp + 1 + _E <= _LH, "fused-frame halo too small"
    assert block_rows % 8 == 0, "zproj1 body processes 8 rows per VPU op"
    assert w2.shape[3] == 1, "fused tail requires a single output channel"
    if method == "auto":
        on_tpu = jax.default_backend() == "tpu"
        large = x.shape[1] * x.shape[2] >= 256 * 256
        method = "pallas" if (on_tpu and large) else "reference"
    if method == "reference":
        return _tail_reference(
            x, o1k, o1b, w1, b1, o2k, o2b, w2, b2, padding, clamp,
            compute_dtype,
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if compute_dtype == "float32":
        compute_dtype = None
    return _fused_path(
        (padding, clamp, block_rows, interpret, pack_taps, compute_dtype),
        x, o1k, o1b, w1, b1, o2k, o2b, w2, b2,
    )
