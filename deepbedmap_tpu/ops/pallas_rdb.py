"""Fused residual-dense-block (RDB) Pallas kernel — the trunk speed lever.

The generator trunk (12 RRDBs x 3 RDBs, reference srgan_train.py:275-404) is
67 ms of the 140 ms continent-tile forward under XLA, ~4x off the MXU
roofline. The cause is structural: every dense-block conv emits only
growth=32 channels, so XLA's conv kernels run N=32-wide matmuls against a
128-lane MXU — a 25% utilisation ceiling no fusion fixes.

This kernel restructures the dense block around *source-major* matmuls:
the moment an activation exists, its contributions to ALL later convs are
computed in one wide matmul (dense connectivity means conv_j's input is the
concat of every earlier activation, so W_j splits by source):

    x   -> [c1|c2|c3|c4|c5] blocks : N = 192
    a1  -> [c2|c3|c4|c5]           : N = 160
    a2  -> [c3|c4|c5]              : N = 128
    a3  -> [c4|c5]                 : N = 96
    a4  -> [c5]                    : N = 64

Layout: the (H, W, C) image is flattened to (H*Wp, C) with one zero pad
column each side (Wp = W + 2), so all nine 3x3 taps become row offsets
{dy*Wp + dx}. Column taps (dx = ±1) are folded into the K dimension by
lane-concatenating sublane-rolls of the source (S3 = [roll(+1)|s|roll(-1)],
K = 3*C_s); row taps (dy = ±1) are Wp-aligned sublane slices of the dot
result, accumulated shifted. Everything for a row band lives in VMEM; HBM
sees x once in and the block output once out.

SAME-conv zero padding is enforced by masking each activation to zero on
pad columns / out-of-image rows, which also absorbs the rolls' circular
wrap (contaminated entries land only on masked margin rows — see the
margin arithmetic in `_rdb_kernel`).

Numerics: fp32 accumulation, identical decomposition to the XLA path up to
dot-order rounding (parity-tested in tests/test_pallas_rdb.py).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# margin rows consumed per side by the five chained 3x3 convs
_MARGIN = 5


def _pack_weights(
    kernels: Sequence[jax.Array], features: int, growth: int, pack_dys: bool = False
):
    """Per-source, per-dy weight matrices from the five HWIO conv kernels.

    Source channel ranges in the dense concat: x 0:F, a1 F:F+G, ... For
    source s the matrix W_s[dy] is (3*C_s, N_s): rows are [dx=-1|dx=0|dx=+1]
    blocks of C_s channels, columns the concatenation of every later conv's
    outputs.

    pack_dys=True (the default) lane-concatenates the three dy matrices into
    one (3*C_s, 3*N_s) matrix [dy=0 | dy=-1 | dy=+1] so the kernel issues
    ONE 3x-wide matmul per source instead of three: N_s = 192/160/96/64
    wastes 25-50% of the 128-lane MXU per pass, 3*N_s = 576/480/288/192
    wastes 0-25%. Measured on the 36-RDB trunk @286^2: 43.6 -> 39.4 ms
    (one v5e, device-side repetition)."""
    starts = [0, features, features + growth, features + 2 * growth,
              features + 3 * growth]
    widths = [features, growth, growth, growth, growth]
    packed = []
    for s in range(5):
        c0, cw = starts[s], widths[s]
        per_dy = []
        for dy in range(3):
            blocks = []
            for dx in range(3):
                cols = []
                for j in range(s, 5):  # convs that consume source s
                    k = kernels[j]  # (3, 3, C_in_j, C_out_j)
                    cols.append(k[dy, dx, c0 : c0 + cw, :])
                blocks.append(jnp.concatenate(cols, axis=-1))  # (C_s, N_s)
            per_dy.append(jnp.concatenate(blocks, axis=0))  # (3*C_s, N_s)
        if pack_dys:
            # [mid | down (dy=-1) | up (dy=+1)] in lanes, one dot per source
            packed.append(
                jnp.concatenate([per_dy[1], per_dy[0], per_dy[2]], axis=1)
            )  # (3*C_s, 3*N_s)
        else:
            packed.append(jnp.stack(per_dy))  # (3, 3*C_s, N_s)
    return packed


def _band_compute(
    x,  # (E, F) VMEM value — band rows, flattened (rows*Wp, F), with margins
    wx_ref,  # (3, 3F, F+4G)
    w1_ref,  # (3, 3G, F+3G)
    w2_ref,  # (3, 3G, F+2G)
    w3_ref,  # (3, 3G, F+G)
    w4_ref,  # (3, 3G, F)
    b_ref,  # (1, F+4G) — [b1|b2|b3|b4|b5]
    accx_ref,  # (E, F+4G) scratch
    acc1_ref,  # (E, F+3G) scratch
    acc2_ref,  # (E, F+2G) scratch
    acc3_ref,  # (E, F+G) scratch
    row0,  # global image row of window row 0 (may be a traced scalar)
    *,
    band: int,  # B: output image rows per band
    wp: int,  # padded row pitch (W + 2), multiple of 8
    height: int,  # true image rows H
    width: int,  # true image cols W
    features: int,
    growth: int,
    scaling: float,
    pack_dys: bool = False,
    mxu_bf16: bool = False,
    mask_out: bool = False,  # zero pad cols / out-of-image rows in the result
):
    """The dense-block math on one VMEM-resident band window. Returns the
    (band*wp, F) output rows. ``mask_out=True`` zeroes pad columns and
    out-of-image rows so the result can live in a resident flat buffer whose
    next consumer reads it as pre-padded input (``rdb_pallas_flat``)."""
    F, G = features, growth
    E = x.shape[0]
    # mxu_bf16: dot MULTIPLICANDS in bf16, accumulation fp32 — exactly
    # XLA's default precision for fp32 convs on TPU. Weights arrive
    # pre-cast (w refs are bf16); activations cast at the dot edge, while
    # biases, LeakyReLU, masking and the residual stay fp32.
    mdt = jnp.bfloat16 if mxu_bf16 else jnp.float32

    # validity mask: zero on pad columns and out-of-image rows (this IS the
    # SAME-conv zero padding for every intermediate activation, and it
    # absorbs the circular wrap of the sublane rolls below)
    flat = jax.lax.broadcasted_iota(jnp.int32, (E, 1), 0)
    row_g = row0 + flat // wp
    col = flat % wp
    mask = (
        (row_g >= 0) & (row_g < height) & (col >= 1) & (col <= width)
    ).astype(jnp.float32)

    def s3(a):  # (E, C) -> (E, 3C): [a[m-1] | a[m] | a[m+1]] in lanes
        # pltpu.roll requires non-negative shifts; roll by E-1 == roll by -1
        return jnp.concatenate(
            [pltpu.roll(a, 1, 0), a, pltpu.roll(a, E - 1, 0)], axis=1
        )

    def accumulate(acc_ref, src3, w_ref_):
        """acc[m] (+)= sum_dy src3[m + dy*wp] @ W[dy] over the full band
        extent; dy=0 assigns (no scratch zeroing), dy=+-1 add over their
        valid Wp-aligned ranges (rows missing a term are masked margins).

        Measured dead ends (2026-08-17, one v5e): (a) assembling the three
        dy terms as one SSA expression + single write ties at runtime
        (43.3 vs 43.6 ms/trunk) but compiles 8x slower (11 min vs 1.5);
        (b) restricting each source's dots to its consumers' margin-shrunk
        extent (~10% fewer FLOPs on paper) crashes the Mosaic compiler at
        every band size tried; (c) band >= 48 exceeds VMEM (compiler
        subprocess OOM). band=32 is the sweet spot.

        pack_dys: one (E, 3N) dot against the lane-concatenated
        [mid|down|up] matrix, then the same shifted adds from lane slices
        at N and 2N (N is a multiple of 32; Mosaic lowers the unaligned
        slices to lane shuffles — whether that beats the 3x-wider MXU
        passes is what the bench decides)."""
        src3 = src3.astype(mdt)
        if pack_dys:
            nn = w_ref_.shape[1] // 3
            p = jnp.dot(src3, w_ref_[...], preferred_element_type=jnp.float32)
            acc_ref[...] = p[:, :nn]
            acc_ref[wp:, :] += p[: E - wp, nn : 2 * nn]
            acc_ref[: E - wp, :] += p[wp:, 2 * nn :]
            return
        acc_ref[...] = jnp.dot(
            src3, w_ref_[1], preferred_element_type=jnp.float32
        )
        p = jnp.dot(src3, w_ref_[0], preferred_element_type=jnp.float32)
        acc_ref[wp:, :] += p[: E - wp]
        p = jnp.dot(src3, w_ref_[2], preferred_element_type=jnp.float32)
        acc_ref[: E - wp, :] += p[wp:]

    accumulate(accx_ref, s3(x), wx_ref)

    # jnp.where (not multiply): margin rows outside a source's written
    # extent are uninitialised scratch; every consumed such row is masked,
    # and where() suppresses even NaN garbage there
    z1 = accx_ref[:, 0:G] + b_ref[0, 0:G]
    a1 = jnp.where(mask > 0, jnp.where(z1 >= 0, z1, 0.2 * z1), 0.0)
    accumulate(acc1_ref, s3(a1), w1_ref)

    z2 = accx_ref[:, G : 2 * G] + acc1_ref[:, 0:G] + b_ref[0, G : 2 * G]
    a2 = jnp.where(mask > 0, jnp.where(z2 >= 0, z2, 0.2 * z2), 0.0)
    accumulate(acc2_ref, s3(a2), w2_ref)

    z3 = (
        accx_ref[:, 2 * G : 3 * G]
        + acc1_ref[:, G : 2 * G]
        + acc2_ref[:, 0:G]
        + b_ref[0, 2 * G : 3 * G]
    )
    a3 = jnp.where(mask > 0, jnp.where(z3 >= 0, z3, 0.2 * z3), 0.0)
    accumulate(acc3_ref, s3(a3), w3_ref)

    z4 = (
        accx_ref[:, 3 * G : 4 * G]
        + acc1_ref[:, 2 * G : 3 * G]
        + acc2_ref[:, G : 2 * G]
        + acc3_ref[:, 0:G]
        + b_ref[0, 3 * G : 4 * G]
    )
    a4 = jnp.where(mask > 0, jnp.where(z4 >= 0, z4, 0.2 * z4), 0.0)

    # conv5 (no activation): gather every source's c5 block + a4's dots,
    # assembled directly on the output rows
    s3a4 = s3(a4).astype(mdt)
    lo = _MARGIN * wp
    hi = lo + band * wp
    a5 = (
        accx_ref[lo:hi, 4 * G :]
        + acc1_ref[lo:hi, 3 * G :]
        + acc2_ref[lo:hi, 2 * G :]
        + acc3_ref[lo:hi, G:]
        + b_ref[0, 4 * G : 4 * G + F]
    )
    if pack_dys:
        # one (band+2)*wp x 3F dot, shifted lane-sliced adds as above
        p = jnp.dot(
            s3a4[lo - wp : hi + wp], w4_ref[...],
            preferred_element_type=jnp.float32,
        )
        bw = band * wp
        a5 = a5 + p[wp : wp + bw, :F] + p[:bw, F : 2 * F] + p[2 * wp :, 2 * F :]
    else:
        a5 = a5 + jnp.dot(
            s3a4[lo:hi], w4_ref[1], preferred_element_type=jnp.float32
        )
        a5 = a5 + jnp.dot(
            s3a4[lo - wp : hi - wp], w4_ref[0], preferred_element_type=jnp.float32
        )
        a5 = a5 + jnp.dot(
            s3a4[lo + wp : hi + wp], w4_ref[2], preferred_element_type=jnp.float32
        )

    out = x[lo:hi] + scaling * a5
    if mask_out:
        out = jnp.where(mask[lo:hi] > 0, out, 0.0)
    return out


def _rdb_kernel(
    x_ref,  # (1, E, F) VMEM — band rows with margins (pre-gathered blocks)
    wx_ref,
    w1_ref,
    w2_ref,
    w3_ref,
    w4_ref,
    b_ref,
    out_ref,  # (1, B*Wp, F)
    accx_ref,
    acc1_ref,
    acc2_ref,
    acc3_ref,
    *,
    band: int,
    wp: int,
    height: int,
    width: int,
    features: int,
    growth: int,
    scaling: float,
    pack_dys: bool = False,
    mxu_bf16: bool = False,
):
    pid = pl.program_id(0)
    out_ref[0] = _band_compute(
        x_ref[0],
        wx_ref, w1_ref, w2_ref, w3_ref, w4_ref, b_ref,
        accx_ref, acc1_ref, acc2_ref, acc3_ref,
        pid * band - _MARGIN,
        band=band, wp=wp, height=height, width=width,
        features=features, growth=growth, scaling=scaling,
        pack_dys=pack_dys, mxu_bf16=mxu_bf16,
    )


def rdb_reference(x, kernels, biases, scaling):
    """The plain XLA dense block (identical math; the fused kernel's oracle
    and its backward pass)."""
    acts = [x]
    for j in range(5):
        z = jax.lax.conv_general_dilated(
            jnp.concatenate(acts, -1), kernels[j], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + biases[j]
        if j < 4:
            acts.append(jnp.where(z >= 0, z, 0.2 * z))
    return x + scaling * z


def should_fuse(shape) -> bool:
    """Dispatch rule: the fused kernel wins on large (inference-scale) TPU
    images; training tiles and CPU stay on XLA (mirrors ops.deform_conv's
    auto policy)."""
    n, h, w, _ = shape
    if jax.default_backend() != "tpu":
        return False
    if (w + 2) % 8 != 0:
        return False
    return h * w >= 256 * 256


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def rdb_fused(x, kernels, biases, scaling, band=32, mxu_bf16=False):
    return rdb_pallas(x, kernels, biases, scaling, band=band, mxu_bf16=mxu_bf16)


def _rdb_fused_fwd(x, kernels, biases, scaling, band, mxu_bf16):
    return rdb_pallas(
        x, kernels, biases, scaling, band=band, mxu_bf16=mxu_bf16
    ), (x, tuple(kernels), tuple(biases))


def _rdb_fused_bwd(scaling, band, mxu_bf16, res, g):
    # backward = autodiff of the identical XLA composition (training runs the
    # XLA path anyway — small tiles — but grads must exist under jit)
    x, kernels, biases, = res
    _, vjp = jax.vjp(
        lambda x_, k_, b_: rdb_reference(x_, k_, b_, scaling),
        x, list(kernels), list(biases),
    )
    return vjp(g)


rdb_fused.defvjp(_rdb_fused_fwd, _rdb_fused_bwd)


def rdb_pallas(
    x: jax.Array,  # (N, H, W, F) fp32
    kernels: Sequence[jax.Array],  # five (3, 3, C_in_j, C_out_j) HWIO
    biases: Sequence[jax.Array],  # five (C_out_j,)
    scaling: float,
    band: int = 32,
    interpret: bool = False,
    pack_dys: bool = True,
    mxu_bf16: bool = False,
) -> jax.Array:
    """Fused dense block: out = x + scaling * conv5(dense(x)). Requires
    (W + 2) % 8 == 0 (the flattened row pitch must be sublane-aligned so the
    dy row taps are aligned slices); callers dispatch to the XLA path
    otherwise (ops via models.blocks)."""
    n, h, w, f = x.shape
    g = kernels[0].shape[-1]
    wp = w + 2
    assert wp % 8 == 0, f"W+2 must be a multiple of 8, got {w}"
    assert kernels[4].shape[-1] == f
    # off-TPU (tests, CPU debugging) the kernel runs interpreted, like the
    # deform-conv kernels (ops.pallas_kernels)
    interpret = interpret or jax.default_backend() != "tpu"

    n_bands = -(-h // band)
    hp = n_bands * band
    e = (band + 2 * _MARGIN) * wp

    packed = _pack_weights(kernels, f, g, pack_dys=pack_dys)
    if mxu_bf16:
        packed = [p_.astype(jnp.bfloat16) for p_ in packed]
    b_all = jnp.concatenate(biases)[None, :]

    def one(img):  # (H, W, F) -> (H, W, F)
        flat = jnp.pad(
            img, ((_MARGIN, hp - h + _MARGIN), (1, 1), (0, 0))
        ).reshape(-1, f)

        def grab(i):
            return jax.lax.dynamic_slice(
                flat, (i * band * wp, 0), (e, f)
            )

        bands = jax.vmap(grab)(jnp.arange(n_bands))  # (n_bands, E, F)

        kernel = functools.partial(
            _rdb_kernel,
            band=band,
            wp=wp,
            height=h,
            width=w,
            features=f,
            growth=g,
            scaling=scaling,
            pack_dys=pack_dys,
            mxu_bf16=mxu_bf16,
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_bands, band * wp, f), jnp.float32),
            grid=(n_bands,),
            in_specs=[pl.BlockSpec((1, e, f), lambda i: (i, 0, 0))]
            + [
                pl.BlockSpec(p_.shape, lambda i, nd=p_.ndim: (0,) * nd)
                for p_ in packed
            ]
            + [pl.BlockSpec(b_all.shape, lambda i: (0, 0))],
            out_specs=pl.BlockSpec((1, band * wp, f), lambda i: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((e, f + 4 * g), jnp.float32),
                pltpu.VMEM((e, f + 3 * g), jnp.float32),
                pltpu.VMEM((e, f + 2 * g), jnp.float32),
                pltpu.VMEM((e, f + g), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(bands, *packed, b_all)

        return out.reshape(hp, wp, f)[:h, 1 : w + 1]

    return jax.vmap(one)(x)


# ---------------------------------------------------------------------------
# Flat-resident trunk path: the row-band layout stays in HBM across the whole
# RDB chain (36 launches per forward), so the per-launch pad -> overlapping
# band gather -> unpad glue — measured at ~20 ms of the 96 ms continent-tile
# forward (benchmarks/RESULTS.md round-4 attribution: in-model trunk 47.3 ms
# vs the standalone kernel's 27.1) — is paid ONCE per forward instead of 36
# times. Each kernel launch reads its overlapping band windows straight out
# of the flat HBM buffer with double-buffered DMAs and writes the band rows
# back (pad columns / out-of-image rows masked to zero), so the output IS a
# valid pre-padded input for the next launch. Residual adds between blocks
# (RRDB skips) are plain elementwise XLA ops on the flat buffers.
# ---------------------------------------------------------------------------


_LANES = 128  # Mosaic HBM memref_slice lane-alignment requirement: manual
# in-kernel DMAs (``.at[img, pl.ds(...), :]`` on ANY-space refs) must slice
# whole 128-lane tiles along the minormost dim, so the resident flat buffer
# keeps its channel dim zero-padded to a multiple of 128 and the kernel
# lane-slices the logical F channels in VMEM (probe-verified on v5e: a
# 64-lane HBM slice is rejected with "Slice shape along dimension 2 must be
# aligned to tiling (128)"; the padded DMA + VMEM slice compiles and runs).


def flatten_rdb(x: jax.Array, band: int = 32) -> jax.Array:
    """(N, H, W, F) -> (N, (hp + 2*_MARGIN) * (W + 2), Fp) flat row-band
    layout with one zero pad column per side, _MARGIN zero rows above and
    below (hp = H rounded up to a multiple of ``band``) and the channel dim
    zero-padded to Fp = F rounded up to a multiple of 128 lanes (see
    ``_LANES``). The inverse is ``unflatten_rdb`` (pass ``features=F``);
    ``rdb_pallas_flat`` maps flat -> flat."""
    n, h, w, f = x.shape
    wp = w + 2
    assert wp % 8 == 0, f"W+2 must be a multiple of 8, got {w}"
    n_bands = -(-h // band)
    hp = n_bands * band
    fp = -(-f // _LANES) * _LANES
    return jnp.pad(
        x, ((0, 0), (_MARGIN, hp - h + _MARGIN), (1, 1), (0, fp - f))
    ).reshape(n, -1, fp)


def unflatten_rdb(
    flat: jax.Array, h: int, w: int, band: int = 32,
    features: int | None = None,
) -> jax.Array:
    """Inverse of ``flatten_rdb``: (N, R, Fp) -> (N, H, W, features).
    ``features`` is the logical channel count before lane padding (defaults
    to all Fp lanes, which is only the round trip when F was already a
    multiple of 128)."""
    n, _, fp = flat.shape
    f = fp if features is None else features
    wp = w + 2
    n_bands = -(-h // band)
    hp = n_bands * band
    img = flat.reshape(n, hp + 2 * _MARGIN, wp, fp)
    return img[:, _MARGIN : _MARGIN + h, 1 : w + 1, :f]


def _rdb_flat_kernel(
    flat_ref,  # (N, R, Fp) ANY/HBM — resident flat layout, margins zero
    wx_ref,
    w1_ref,
    w2_ref,
    w3_ref,
    w4_ref,
    b_ref,
    out_ref,  # (N, R, Fp) ANY/HBM
    xwin_ref,  # (2, E, Fp) VMEM — double-buffered input band windows
    outs_ref,  # (2, band*wp, Fp) VMEM — double-buffered output bands
    zeros_ref,  # (_MARGIN*wp, Fp) VMEM — margin zeroing source
    accx_ref,
    acc1_ref,
    acc2_ref,
    acc3_ref,
    in_sem,  # DMA (2,)
    out_sem,  # DMA (2,)
    z_sem,  # DMA (2,)
    *,
    n_bands: int,
    band: int,
    wp: int,
    height: int,
    width: int,
    features: int,
    growth: int,
    scaling: float,
    pack_dys: bool = False,
    mxu_bf16: bool = False,
):
    img = pl.program_id(0)
    e = (band + 2 * _MARGIN) * wp
    mw = _MARGIN * wp
    hp = n_bands * band

    def in_dma(slot, i):
        return pltpu.make_async_copy(
            flat_ref.at[img, pl.ds(i * band * wp, e), :],
            xwin_ref.at[slot],
            in_sem.at[slot],
        )

    def out_dma(slot, i):
        return pltpu.make_async_copy(
            outs_ref.at[slot],
            out_ref.at[img, pl.ds(mw + i * band * wp, band * wp), :],
            out_sem.at[slot],
        )

    # the freshly allocated out buffer needs its zero margins re-established
    # every launch (the next launch in the chain reads them as x)
    zeros_ref[...] = jnp.zeros_like(zeros_ref)
    zt = pltpu.make_async_copy(
        zeros_ref, out_ref.at[img, pl.ds(0, mw), :], z_sem.at[0]
    )
    zb = pltpu.make_async_copy(
        zeros_ref, out_ref.at[img, pl.ds(mw + hp * wp, mw), :], z_sem.at[1]
    )
    zt.start()
    zb.start()

    in_dma(0, 0).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_bands)
        def _():
            in_dma(1 - slot, i + 1).start()

        in_dma(slot, i).wait()

        # the slot's previous out-DMA must land before we overwrite it
        @pl.when(i >= 2)
        def _():
            out_dma(slot, i - 2).wait()

        # the flat buffer carries Fp >= features lanes (HBM DMA alignment,
        # see _LANES); compute on the logical channels and re-pad with zeros
        band_out = _band_compute(
            xwin_ref[slot][:, :features],
            wx_ref, w1_ref, w2_ref, w3_ref, w4_ref, b_ref,
            accx_ref, acc1_ref, acc2_ref, acc3_ref,
            i * band - _MARGIN,
            band=band, wp=wp, height=height, width=width,
            features=features, growth=growth, scaling=scaling,
            pack_dys=pack_dys, mxu_bf16=mxu_bf16, mask_out=True,
        )
        lanes = outs_ref.shape[-1]
        if lanes > features:
            band_out = jnp.concatenate(
                [band_out,
                 jnp.zeros((band * wp, lanes - features), band_out.dtype)],
                axis=1,
            )
        outs_ref[slot] = band_out
        out_dma(slot, i).start()
        return 0

    jax.lax.fori_loop(0, n_bands, body, 0)

    # drain the in-flight output and margin DMAs before the launch retires
    if n_bands >= 2:
        out_dma((n_bands - 2) % 2, n_bands - 2).wait()
    out_dma((n_bands - 1) % 2, n_bands - 1).wait()
    zt.wait()
    zb.wait()


def rdb_pallas_flat(
    flat: jax.Array,  # (N, R, Fp) fp32 flat layout (see flatten_rdb)
    kernels: Sequence[jax.Array],
    biases: Sequence[jax.Array],
    scaling: float,
    *,
    h: int,
    w: int,
    band: int = 32,
    interpret: bool = False,
    pack_dys: bool = True,
    mxu_bf16: bool = False,
) -> jax.Array:
    """Fused dense block on the resident flat layout: flat -> flat, margins,
    pad columns and pad lanes zero in and out. Same math as ``rdb_pallas``
    (shared ``_band_compute`` body); only the IO differs — band windows are
    DMA'd from HBM inside the kernel instead of being gathered by XLA per
    launch. The logical channel count comes from the weights; the buffer's
    lane dim is 128-padded (``_LANES``) so the HBM slices tile-align."""
    n, r, fp = flat.shape
    f = kernels[0].shape[2]  # logical channels, before lane padding
    assert fp == -(-f // _LANES) * _LANES, (fp, f)
    g = kernels[0].shape[-1]
    wp = w + 2
    assert wp % 8 == 0, f"W+2 must be a multiple of 8, got {w}"
    n_bands = -(-h // band)
    assert r == (n_bands * band + 2 * _MARGIN) * wp, (r, h, w, band)
    e = (band + 2 * _MARGIN) * wp
    interpret = interpret or jax.default_backend() != "tpu"

    packed = _pack_weights(kernels, f, g, pack_dys=pack_dys)
    if mxu_bf16:
        packed = [p_.astype(jnp.bfloat16) for p_ in packed]
    b_all = jnp.concatenate(biases)[None, :]

    kernel = functools.partial(
        _rdb_flat_kernel,
        n_bands=n_bands,
        band=band,
        wp=wp,
        height=h,
        width=w,
        features=f,
        growth=g,
        scaling=scaling,
        pack_dys=pack_dys,
        mxu_bf16=mxu_bf16,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, r, fp), jnp.float32),
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [
            pl.BlockSpec(p_.shape, lambda i, nd=p_.ndim: (0,) * nd)
            for p_ in packed
        ]
        + [pl.BlockSpec(b_all.shape, lambda i: (0, 0))],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, e, fp), jnp.float32),
            pltpu.VMEM((2, band * wp, fp), jnp.float32),
            pltpu.VMEM((_MARGIN * wp, fp), jnp.float32),
            pltpu.VMEM((e, f + 4 * g), jnp.float32),
            pltpu.VMEM((e, f + 3 * g), jnp.float32),
            pltpu.VMEM((e, f + 2 * g), jnp.float32),
            pltpu.VMEM((e, f + g), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flat, *packed, b_all)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def rdb_fused_flat(flat, kernels, biases, scaling, h, w, band=32, mxu_bf16=False):
    return rdb_pallas_flat(
        flat, kernels, biases, scaling, h=h, w=w, band=band, mxu_bf16=mxu_bf16
    )


def _flat_reference(flat, kernels, biases, scaling, h, w, band):
    """flat -> flat through the XLA dense block (the flat path's oracle and
    its backward): margins and pad lanes are discarded on the way in and
    re-zeroed on the way out, matching the kernel's masked-write semantics."""
    x = unflatten_rdb(flat, h, w, band, features=kernels[0].shape[2])
    return flatten_rdb(rdb_reference(x, kernels, biases, scaling), band)


def _rdb_flat_fwd(flat, kernels, biases, scaling, h, w, band, mxu_bf16):
    return rdb_pallas_flat(
        flat, kernels, biases, scaling, h=h, w=w, band=band, mxu_bf16=mxu_bf16
    ), (flat, tuple(kernels), tuple(biases))


def _rdb_flat_bwd(scaling, h, w, band, mxu_bf16, res, g):
    flat, kernels, biases = res
    _, vjp = jax.vjp(
        lambda f_, k_, b_: _flat_reference(f_, k_, b_, scaling, h, w, band),
        flat, list(kernels), list(biases),
    )
    return vjp(g)


rdb_fused_flat.defvjp(_rdb_flat_fwd, _rdb_flat_bwd)


def _rrdb_flat_kernel(
    flat_ref,  # (N, R, Fp) ANY/HBM — RRDB input, margins zero
    wx_ref,  # (3, ...) stacked per-RDB packed weights, VMEM
    w1_ref,
    w2_ref,
    w3_ref,
    w4_ref,
    b_ref,  # (3, 1, F+4G)
    out_ref,  # (N, R, Fp) ANY/HBM — RRDB output
    t1_ref,  # (1, R, Fp) ANY/HBM scratch (RDB1 output)
    t2_ref,  # (1, R, Fp) ANY/HBM scratch (RDB2 output)
    xwin_ref,  # (2, E, Fp) VMEM
    outs_ref,  # (2, band*wp, Fp) VMEM
    xres_ref,  # (2, band*wp, Fp) VMEM — RRDB-skip band rows of flat_ref
    zeros_ref,  # (_MARGIN*wp, Fp) VMEM
    accx_ref,
    acc1_ref,
    acc2_ref,
    acc3_ref,
    in_sem,  # DMA (2,)
    out_sem,  # DMA (2,)
    z_sem,  # DMA (2,)
    xr_sem,  # DMA (2,)
    *,
    n_bands: int,
    band: int,
    wp: int,
    height: int,
    width: int,
    features: int,
    growth: int,
    scaling: float,
    pack_dys: bool = False,
    mxu_bf16: bool = False,
):
    """One whole RRDB (3 chained dense blocks + scaled outer skip) in a
    single launch: three sequential full-image passes over HBM ping-pong
    buffers (flat -> t1 -> t2 -> out), each pass the same double-buffered
    band loop as ``_rdb_flat_kernel``. Identical HBM traffic and identical
    MACs to three separate launches — what it removes is two XLA
    custom-call boundaries (and their launch sync) per RRDB, 36 -> 12 for
    the 12-RRDB trunk. The outer skip rides the third pass: band rows of
    ``flat_ref`` stream in through ``xres_ref`` and the masked RDB3 output
    is folded as  out = x + scaling * rdb3."""
    img = pl.program_id(0)
    e = (band + 2 * _MARGIN) * wp
    mw = _MARGIN * wp
    hp = n_bands * band

    def src_at(p, sl):
        if p == 0:
            return flat_ref.at[img, sl, :]
        return (t1_ref if p == 1 else t2_ref).at[0, sl, :]

    def dst_at(p, sl):
        if p == 2:
            return out_ref.at[img, sl, :]
        return (t1_ref if p == 0 else t2_ref).at[0, sl, :]

    zeros_ref[...] = jnp.zeros_like(zeros_ref)

    for p in range(3):  # statically unrolled: one band loop per dense block
        def in_dma(slot, i, p=p):
            return pltpu.make_async_copy(
                src_at(p, pl.ds(i * band * wp, e)),
                xwin_ref.at[slot],
                in_sem.at[slot],
            )

        def out_dma(slot, i, p=p):
            return pltpu.make_async_copy(
                outs_ref.at[slot],
                dst_at(p, pl.ds(mw + i * band * wp, band * wp)),
                out_sem.at[slot],
            )

        def xr_dma(slot, i):
            return pltpu.make_async_copy(
                flat_ref.at[img, pl.ds(mw + i * band * wp, band * wp), :],
                xres_ref.at[slot],
                xr_sem.at[slot],
            )

        # freshly allocated dst needs zero margins before the NEXT pass (or
        # the next launch, for out_ref) reads them as part of its windows
        zt = pltpu.make_async_copy(
            zeros_ref, dst_at(p, pl.ds(0, mw)), z_sem.at[0]
        )
        zb = pltpu.make_async_copy(
            zeros_ref, dst_at(p, pl.ds(mw + hp * wp, mw)), z_sem.at[1]
        )
        zt.start()
        zb.start()

        in_dma(0, 0).start()
        if p == 2:
            xr_dma(0, 0).start()

        def body(i, _, p=p):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_bands)
            def _():
                in_dma(1 - slot, i + 1).start()
                if p == 2:
                    xr_dma(1 - slot, i + 1).start()

            in_dma(slot, i).wait()

            @pl.when(i >= 2)
            def _():
                out_dma(slot, i - 2).wait()

            band_out = _band_compute(
                xwin_ref[slot][:, :features],
                # .at[p] ref views (not value loads): in-kernel reads stay
                # lazy exactly like the per-RDB kernel's whole-ref access;
                # eager `ref[p]` loads force offset relayouts Mosaic
                # rejects ("Invalid input layout") on the bias row slices
                wx_ref.at[p], w1_ref.at[p], w2_ref.at[p], w3_ref.at[p],
                w4_ref.at[p], b_ref.at[p],
                accx_ref, acc1_ref, acc2_ref, acc3_ref,
                i * band - _MARGIN,
                band=band, wp=wp, height=height, width=width,
                features=features, growth=growth, scaling=scaling,
                pack_dys=pack_dys, mxu_bf16=mxu_bf16, mask_out=True,
            )
            if p == 2:
                # RRDB outer skip: x band rows are zero on pad cols /
                # out-of-image rows, band_out is masked — the sum keeps the
                # resident-layout zero invariant
                xr_dma(slot, i).wait()
                band_out = (
                    xres_ref[slot][:, :features] + scaling * band_out
                )
            lanes = outs_ref.shape[-1]
            if lanes > features:
                band_out = jnp.concatenate(
                    [band_out,
                     jnp.zeros((band * wp, lanes - features), band_out.dtype)],
                    axis=1,
                )
            outs_ref[slot] = band_out
            out_dma(slot, i).start()
            return 0

        jax.lax.fori_loop(0, n_bands, body, 0)

        # drain before the next pass reads this pass's dst
        if n_bands >= 2:
            out_dma((n_bands - 2) % 2, n_bands - 2).wait()
        out_dma((n_bands - 1) % 2, n_bands - 1).wait()
        zt.wait()
        zb.wait()


def rrdb_pallas_flat(
    flat: jax.Array,  # (N, R, Fp) fp32 flat layout (see flatten_rdb)
    kernels,  # sequence of 3 per-RDB kernel lists (5 HWIO arrays each)
    biases,  # sequence of 3 per-RDB bias lists
    scaling: float,
    *,
    h: int,
    w: int,
    band: int = 32,
    interpret: bool = False,
    pack_dys: bool = True,
    mxu_bf16: bool = False,
) -> jax.Array:
    """Whole residual-in-residual dense block on the resident flat layout
    (see ``_rrdb_flat_kernel``). Same math as three ``rdb_pallas_flat``
    launches plus the scaled outer skip; 1/3 the custom-call boundaries."""
    n, r, fp = flat.shape
    f = kernels[0][0].shape[2]
    assert fp == -(-f // _LANES) * _LANES, (fp, f)
    g = kernels[0][0].shape[-1]
    wp = w + 2
    assert wp % 8 == 0, f"W+2 must be a multiple of 8, got {w}"
    n_bands = -(-h // band)
    assert r == (n_bands * band + 2 * _MARGIN) * wp, (r, h, w, band)
    e = (band + 2 * _MARGIN) * wp
    interpret = interpret or jax.default_backend() != "tpu"

    per_rdb = [_pack_weights(k, f, g, pack_dys=pack_dys) for k in kernels]
    stacked = [
        jnp.stack([per_rdb[p][s] for p in range(3)]) for s in range(5)
    ]
    if mxu_bf16:
        stacked = [p_.astype(jnp.bfloat16) for p_ in stacked]
    # lane-pad the stacked bias to a 128-multiple: the per-pass `.at[p]`
    # ref view must slice full (tile-aligned) lane extents on TPU
    b_cat = [jnp.concatenate(bs)[None, :] for bs in biases]
    b_lanes = -(-b_cat[0].shape[-1] // _LANES) * _LANES
    b_all = jnp.stack([
        jnp.pad(bc, ((0, 0), (0, b_lanes - bc.shape[-1]))) for bc in b_cat
    ])

    kernel = functools.partial(
        _rrdb_flat_kernel,
        n_bands=n_bands,
        band=band,
        wp=wp,
        height=h,
        width=w,
        features=f,
        growth=g,
        scaling=scaling,
        pack_dys=pack_dys,
        mxu_bf16=mxu_bf16,
    )
    out, _t1, _t2 = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n, r, fp), jnp.float32),
            jax.ShapeDtypeStruct((1, r, fp), jnp.float32),
            jax.ShapeDtypeStruct((1, r, fp), jnp.float32),
        ],
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [
            pl.BlockSpec(p_.shape, lambda i, nd=p_.ndim: (0,) * nd)
            for p_ in stacked
        ]
        + [pl.BlockSpec(b_all.shape, lambda i: (0, 0, 0))],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, e, fp), jnp.float32),
            pltpu.VMEM((2, band * wp, fp), jnp.float32),
            pltpu.VMEM((2, band * wp, fp), jnp.float32),
            pltpu.VMEM((_MARGIN * wp, fp), jnp.float32),
            pltpu.VMEM((e, f + 4 * g), jnp.float32),
            pltpu.VMEM((e, f + 3 * g), jnp.float32),
            pltpu.VMEM((e, f + 2 * g), jnp.float32),
            pltpu.VMEM((e, f + g), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flat, *stacked, b_all)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def rrdb_fused_flat(flat, kernels, biases, scaling, h, w, band=32, mxu_bf16=False):
    return rrdb_pallas_flat(
        flat, kernels, biases, scaling, h=h, w=w, band=band, mxu_bf16=mxu_bf16
    )


def _rrdb_flat_reference(flat, kernels, biases, scaling, h, w, band):
    """flat -> flat through the XLA composition of the whole RRDB (oracle
    and backward for the fused launch)."""
    x = unflatten_rdb(flat, h, w, band, features=kernels[0][0].shape[2])
    a = x
    for p in range(3):
        a = rdb_reference(a, kernels[p], biases[p], scaling)
    return flatten_rdb(x + scaling * a, band)


def _rrdb_flat_fwd(flat, kernels, biases, scaling, h, w, band, mxu_bf16):
    return rrdb_pallas_flat(
        flat, kernels, biases, scaling, h=h, w=w, band=band, mxu_bf16=mxu_bf16
    ), (flat, tuple(tuple(k) for k in kernels), tuple(tuple(b) for b in biases))


def _rrdb_flat_bwd(scaling, h, w, band, mxu_bf16, res, g):
    flat, kernels, biases = res
    _, vjp = jax.vjp(
        lambda f_, k_, b_: _rrdb_flat_reference(f_, k_, b_, scaling, h, w, band),
        flat, [list(k) for k in kernels], [list(b) for b in biases],
    )
    return vjp(g)


rrdb_fused_flat.defvjp(_rrdb_flat_fwd, _rrdb_flat_bwd)


def _rrdb_sweep_kernel(
    flat_ref,  # (N, R, Fp) ANY/HBM — resident flat layout, margins zero
    wx_ref,  # (3, ...) stacked per-RDB packed weights, VMEM
    w1_ref,
    w2_ref,
    w3_ref,
    w4_ref,
    b_ref,  # (3, 1, ceil(F+4G -> 128)) lane-padded stacked biases, VMEM
    out_ref,  # (N, R, Fp) ANY/HBM — RRDB output
    xwin_ref,  # (2, E, Fp) VMEM — double-buffered pass-0 input windows
    outs_ref,  # (2, band*wp, Fp) VMEM — double-buffered output bands
    xres_ref,  # (1, band*wp, Fp) VMEM — RRDB-skip band rows of flat_ref
    zeros_ref,  # (_MARGIN*wp, Fp) VMEM
    t1_ring,  # (3, band*wp, F) VMEM — RDB1 output ring (never touches HBM)
    t2_ring,  # (3, band*wp, F) VMEM — RDB2 output ring
    accx_ref,
    acc1_ref,
    acc2_ref,
    acc3_ref,
    in_sem,  # DMA (2,)
    out_sem,  # DMA (2,)
    z_sem,  # DMA (2,)
    xr_sem,  # DMA (2,)
    *,
    n_bands: int,
    band: int,
    wp: int,
    height: int,
    width: int,
    features: int,
    growth: int,
    scaling: float,
    pack_dys: bool = False,
    mxu_bf16: bool = False,
):
    """One whole RRDB in a single launch as a SOFTWARE-PIPELINED SWEEP: the
    three chained dense blocks advance together, one band apart, with the
    two intermediate images (RDB1/RDB2 outputs) held in 3-slot VMEM ring
    buffers instead of HBM ping-pong buffers. Per RRDB this is 3 HBM image
    transits (read x, read x again for the outer skip, write out) vs the
    3-pass fused kernel's 7 — identical MACs, same masked-band invariants.

    Schedule (iteration i of n_bands+2): stage A computes RDB1 band i from
    the DMA'd flat window; stage B computes RDB2 band i-1 from t1 bands
    i-2..i (ring); stage C computes RDB3 band i-2 from t2 bands i-3..i-1,
    folds the scaled outer skip and DMAs the band out. Ring slots are
    (band index mod 3); a slot is always consumed before its overwrite."""
    img = pl.program_id(0)
    e = (band + 2 * _MARGIN) * wp
    mw = _MARGIN * wp
    bw = band * wp
    hp = n_bands * band
    F = features

    def in_dma(slot, i):
        return pltpu.make_async_copy(
            flat_ref.at[img, pl.ds(i * bw, e), :],
            xwin_ref.at[slot],
            in_sem.at[slot],
        )

    def xr_dma(k):
        return pltpu.make_async_copy(
            flat_ref.at[img, pl.ds(mw + k * bw, bw), :],
            xres_ref.at[0],
            xr_sem.at[0],
        )

    def out_dma(slot, k):
        return pltpu.make_async_copy(
            outs_ref.at[slot],
            out_ref.at[img, pl.ds(mw + k * bw, bw)],
            out_sem.at[slot],
        )

    zeros_ref[...] = jnp.zeros_like(zeros_ref)
    zt = pltpu.make_async_copy(zeros_ref, out_ref.at[img, pl.ds(0, mw)], z_sem.at[0])
    zb = pltpu.make_async_copy(
        zeros_ref, out_ref.at[img, pl.ds(mw + hp * wp, mw)], z_sem.at[1]
    )
    zt.start()
    zb.start()
    in_dma(0, 0).start()

    def assemble(ring, j):
        """Window value for rows j*band - margin .. (j+1)*band + margin
        assembled from three ring slots, zero outside [0, n_bands) bands.
        Built as a VALUE (no assembly scratch — VMEM is the binding
        constraint at the flagship shape); out-of-range slot reads are
        well-defined ring garbage masked by the where()."""
        sm = jax.lax.rem
        top = jnp.where(j >= 1, ring[sm(j - 1 + 3, 3), bw - mw :, :], 0.0)
        bot = jnp.where(j + 1 < n_bands, ring[sm(j + 1, 3), :mw, :], 0.0)
        return jnp.concatenate([top, ring[sm(j, 3)], bot], axis=0)

    def stage(x_window, p, row0):
        return _band_compute(
            x_window,
            wx_ref.at[p], w1_ref.at[p], w2_ref.at[p], w3_ref.at[p],
            w4_ref.at[p], b_ref.at[p],
            accx_ref, acc1_ref, acc2_ref, acc3_ref,
            row0,
            band=band, wp=wp, height=height, width=width,
            features=features, growth=growth, scaling=scaling,
            pack_dys=pack_dys, mxu_bf16=mxu_bf16, mask_out=True,
        )

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        # prefetch the next flat window
        @pl.when(i + 1 < n_bands)
        def _():
            in_dma(1 - slot, i + 1).start()

        # stage A: RDB1 band i
        @pl.when(i < n_bands)
        def _():
            in_dma(slot, i).wait()
            t1_ring[jax.lax.rem(i, 3)] = stage(
                xwin_ref[slot][:, :F], 0, i * band - _MARGIN
            )

        # stage B: RDB2 band i-1 from the t1 ring
        @pl.when((i >= 1) & (i - 1 < n_bands))
        def _():
            j = i - 1
            t2_ring[jax.lax.rem(j, 3)] = stage(
                assemble(t1_ring, j), 1, j * band - _MARGIN
            )

        # stage C: RDB3 band i-2 + scaled outer skip -> out
        @pl.when(i >= 2)
        def _():
            k = i - 2
            oslot = jax.lax.rem(k, 2)

            @pl.when(k >= 2)
            def _():
                out_dma(jax.lax.rem(k - 2, 2), k - 2).wait()

            band_out = stage(assemble(t2_ring, k), 2, k * band - _MARGIN)
            xr_dma(k).wait()
            band_out = xres_ref[0][:, :F] + scaling * band_out
            lanes = outs_ref.shape[-1]
            if lanes > F:
                band_out = jnp.concatenate(
                    [band_out, jnp.zeros((bw, lanes - F), band_out.dtype)],
                    axis=1,
                )
            outs_ref[oslot] = band_out
            out_dma(oslot, k).start()

        # single-slot skip prefetch: start band i-1's skip rows only after
        # stage C has consumed band i-2's (one iteration of overlap)
        @pl.when((i >= 1) & (i <= n_bands))
        def _():
            xr_dma(i - 1).start()

        return 0

    jax.lax.fori_loop(0, n_bands + 2, body, 0)

    if n_bands >= 2:
        out_dma(jax.lax.rem(n_bands - 2, 2), n_bands - 2).wait()
    out_dma(jax.lax.rem(n_bands - 1, 2), n_bands - 1).wait()
    zt.wait()
    zb.wait()


def rrdb_sweep_pallas_flat(
    flat: jax.Array,  # (N, R, Fp) fp32 flat layout (see flatten_rdb)
    kernels,  # sequence of 3 per-RDB kernel lists (5 HWIO arrays each)
    biases,  # sequence of 3 per-RDB bias lists
    scaling: float,
    *,
    h: int,
    w: int,
    band: int = 32,
    interpret: bool = False,
    pack_dys: bool = True,
    mxu_bf16: bool = False,
    mode: str = "cond",
) -> jax.Array:
    """Whole RRDB as a single software-pipelined sweep: intermediates live
    in VMEM rings, HBM sees the input twice (window + skip) and the output
    once. ``mode``:
      'cond' (default) — every stage under pl.when in one loop
        (``_rrdb_sweep_kernel``). Compiles and runs at the flagship shape;
        bit-exact vs the 3-pass fused launch but measured +15 ms/RRDB
        slower (predication pathology) — functional variant, not the
        perf path.
      'static' — static prologue/epilogue, UNCONDITIONAL 3-stage steady
        body + scratch window assembler (``_rrdb_sweep2_kernel``), the
        band internally re-divided to the largest hp divisor <= 24.
        Correct in interpret mode / small shapes, but the unrolled
        prologue/epilogue band-computes do not share Mosaic stack slots:
        at the flagship shape the scoped VMEM allocation is 146 M / 128 M
        (r5f log) — compile-blocked until the stack sharing improves or
        the steady body shrinks. Kept as the round-6 starting point."""
    n, r, fp = flat.shape
    f = kernels[0][0].shape[2]
    assert fp == -(-f // _LANES) * _LANES, (fp, f)
    g = kernels[0][0].shape[-1]
    wp = w + 2
    n_bands = -(-h // band)
    hp = n_bands * band
    assert r == hp * wp + 2 * _MARGIN * wp, (r, n_bands, band, wp)
    if mode == "static":
        # re-divide hp into the largest VMEM-fitting band (same layout)
        band = max(
            (d for d in range(min(band, 24), _MARGIN - 1, -1) if hp % d == 0),
            default=band,
        )
        n_bands = hp // band
    e = (band + 2 * _MARGIN) * wp
    # the ring window spans at most one band each side of the current one
    assert band >= _MARGIN, (band, _MARGIN)
    interpret = interpret or jax.default_backend() != "tpu"

    stacked = [
        jnp.stack(parts)
        for parts in zip(*[
            _pack_weights(ks, f, g, pack_dys=pack_dys) for ks in kernels
        ])
    ]
    if mxu_bf16:
        stacked = [p_.astype(jnp.bfloat16) for p_ in stacked]
    b_cat = [jnp.concatenate(bs)[None, :] for bs in biases]
    b_lanes = -(-b_cat[0].shape[-1] // _LANES) * _LANES
    b_all = jnp.stack([
        jnp.pad(bc, ((0, 0), (0, b_lanes - bc.shape[-1]))) for bc in b_cat
    ])

    kernel = functools.partial(
        _rrdb_sweep2_kernel if mode == "static" else _rrdb_sweep_kernel,
        n_bands=n_bands,
        band=band,
        wp=wp,
        height=h,
        width=w,
        features=f,
        growth=g,
        scaling=scaling,
        pack_dys=pack_dys,
        mxu_bf16=mxu_bf16,
    )
    asm_scratch = (
        [pltpu.VMEM((e, f), jnp.float32)] if mode == "static" else []
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, r, fp), jnp.float32),
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [
            pl.BlockSpec(p_.shape, lambda i, nd=p_.ndim: (0,) * nd)
            for p_ in stacked
        ]
        + [pl.BlockSpec(b_all.shape, lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, e, fp), jnp.float32),
            pltpu.VMEM((2, band * wp, fp), jnp.float32),
            pltpu.VMEM(
                (2 if mode == "static" else 1, band * wp, fp), jnp.float32
            ),
            pltpu.VMEM((_MARGIN * wp, fp), jnp.float32),
            pltpu.VMEM((3, band * wp, f), jnp.float32),
            pltpu.VMEM((3, band * wp, f), jnp.float32),
        ]
        + asm_scratch
        + [
            pltpu.VMEM((e, f + 4 * g), jnp.float32),
            pltpu.VMEM((e, f + 3 * g), jnp.float32),
            pltpu.VMEM((e, f + 2 * g), jnp.float32),
            pltpu.VMEM((e, f + g), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            # skip-row DMA: double-buffered in static mode, single in cond
            pltpu.SemaphoreType.DMA((2,) if mode == "static" else (1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flat, *stacked, b_all)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def rrdb_sweep_flat(flat, kernels, biases, scaling, h, w, band=32, mxu_bf16=False):
    return rrdb_sweep_pallas_flat(
        flat, kernels, biases, scaling, h=h, w=w, band=band, mxu_bf16=mxu_bf16
    )


def _rrdb_sweep_fwd(flat, kernels, biases, scaling, h, w, band, mxu_bf16):
    return rrdb_sweep_pallas_flat(
        flat, kernels, biases, scaling, h=h, w=w, band=band, mxu_bf16=mxu_bf16
    ), (flat, tuple(tuple(k) for k in kernels), tuple(tuple(b) for b in biases))


rrdb_sweep_flat.defvjp(_rrdb_sweep_fwd, _rrdb_flat_bwd)


def _rrdb_sweep2_kernel(
    flat_ref,  # (N, R, Fp) ANY/HBM — resident flat layout, margins zero
    wx_ref,  # (3, ...) stacked per-RDB packed weights, VMEM
    w1_ref,
    w2_ref,
    w3_ref,
    w4_ref,
    b_ref,  # (3, 1, lane-padded) stacked biases, VMEM
    out_ref,  # (N, R, Fp) ANY/HBM
    xwin_ref,  # (2, E, Fp) VMEM
    outs_ref,  # (2, band*wp, Fp) VMEM
    xres_ref,  # (2, band*wp, Fp) VMEM
    zeros_ref,  # (_MARGIN*wp, Fp) VMEM
    t1_ring,  # (3, band*wp, F) VMEM
    t2_ring,  # (3, band*wp, F) VMEM
    asm_ref,  # (E, F) VMEM — scratch window assembler
    accx_ref,
    acc1_ref,
    acc2_ref,
    acc3_ref,
    in_sem,  # DMA (2,)
    out_sem,  # DMA (2,)
    z_sem,  # DMA (2,)
    xr_sem,  # DMA (2,)
    *,
    n_bands: int,
    band: int,
    wp: int,
    height: int,
    width: int,
    features: int,
    growth: int,
    scaling: float,
    pack_dys: bool = False,
    mxu_bf16: bool = False,
):
    """Single-sweep RRDB, take 2: STATIC prologue/epilogue so the steady-state
    fori body runs all three stages UNCONDITIONALLY (the cond-guarded v1
    measured +15 ms/RRDB vs the 3-pass fused launch — predication/pipelining
    pathology), with a scratch-based window assembler instead of
    value-concatenation. Same schedule (stages one band apart, VMEM rings),
    same DMA contract; requires n_bands >= 1 and band >= _MARGIN."""
    img = pl.program_id(0)
    e = (band + 2 * _MARGIN) * wp
    mw = _MARGIN * wp
    bw = band * wp
    hp = n_bands * band
    F = features

    def in_dma(i):
        return pltpu.make_async_copy(
            flat_ref.at[img, pl.ds(i * bw, e), :],
            xwin_ref.at[jax.lax.rem(i, 2)],
            in_sem.at[jax.lax.rem(i, 2)],
        )

    def xr_dma(k):
        return pltpu.make_async_copy(
            flat_ref.at[img, pl.ds(mw + k * bw, bw), :],
            xres_ref.at[jax.lax.rem(k, 2)],
            xr_sem.at[jax.lax.rem(k, 2)],
        )

    def out_dma(k):
        return pltpu.make_async_copy(
            outs_ref.at[jax.lax.rem(k, 2)],
            out_ref.at[img, pl.ds(mw + k * bw, bw)],
            out_sem.at[jax.lax.rem(k, 2)],
        )

    zeros_ref[...] = jnp.zeros_like(zeros_ref)
    zt = pltpu.make_async_copy(zeros_ref, out_ref.at[img, pl.ds(0, mw)], z_sem.at[0])
    zb = pltpu.make_async_copy(
        zeros_ref, out_ref.at[img, pl.ds(mw + hp * wp, mw)], z_sem.at[1]
    )
    zt.start()
    zb.start()
    in_dma(0).start()
    xr_dma(0).start()

    def stage(x_window, p, row0):
        return _band_compute(
            x_window,
            wx_ref.at[p], w1_ref.at[p], w2_ref.at[p], w3_ref.at[p],
            w4_ref.at[p], b_ref.at[p],
            accx_ref, acc1_ref, acc2_ref, acc3_ref,
            row0,
            band=band, wp=wp, height=height, width=width,
            features=features, growth=growth, scaling=scaling,
            pack_dys=pack_dys, mxu_bf16=mxu_bf16, mask_out=True,
        )

    def assemble(ring, j):
        """asm <- ring window for band j; j==0 / j==n_bands-1 margins zeroed.
        Runs unconditionally; the edge zeroing uses pl.when over COPIES only
        (cheap predication, no compute inside)."""
        sm = jax.lax.rem

        @pl.when(j >= 1)
        def _():
            asm_ref[0:mw] = ring[sm(j - 1 + 3, 3), bw - mw :, :]

        @pl.when(j == 0)
        def _():
            asm_ref[0:mw] = jnp.zeros((mw, F), asm_ref.dtype)

        asm_ref[mw : mw + bw] = ring[sm(j, 3)]

        @pl.when(j + 1 < n_bands)
        def _():
            asm_ref[mw + bw :] = ring[sm(j + 1, 3), :mw, :]

        @pl.when(j + 1 >= n_bands)
        def _():
            asm_ref[mw + bw :] = jnp.zeros((mw, F), asm_ref.dtype)

    def run_a(i):
        # prefetch the next window before waiting on this one
        @pl.when(i + 1 < n_bands)
        def _():
            in_dma(i + 1).start()

        in_dma(i).wait()
        t1_ring[jax.lax.rem(i, 3)] = stage(
            xwin_ref[jax.lax.rem(i, 2)][:, :F], 0, i * band - _MARGIN
        )

    def run_b(j):
        assemble(t1_ring, j)
        t2_ring[jax.lax.rem(j, 3)] = stage(asm_ref[...], 1, j * band - _MARGIN)

    def run_c(k):
        @pl.when(k + 1 < n_bands)
        def _():
            xr_dma(k + 1).start()

        @pl.when(k >= 2)
        def _():
            out_dma(k - 2).wait()

        assemble(t2_ring, k)
        band_out = stage(asm_ref[...], 2, k * band - _MARGIN)
        xr_dma(k).wait()
        band_out = xres_ref[jax.lax.rem(k, 2)][:, :F] + scaling * band_out
        lanes = outs_ref.shape[-1]
        if lanes > F:
            band_out = jnp.concatenate(
                [band_out, jnp.zeros((bw, lanes - F), band_out.dtype)], axis=1
            )
        outs_ref[jax.lax.rem(k, 2)] = band_out
        out_dma(k).start()

    if n_bands == 1:
        run_a(0)
        run_b(0)
        run_c(0)
    else:
        run_a(0)          # prologue
        run_a(1)
        run_b(0)

        def body(k, _):   # steady state: all three stages, no guards
            run_a(k + 2)
            run_b(k + 1)
            run_c(k)
            return 0

        jax.lax.fori_loop(0, n_bands - 2, body, 0)

        run_b(n_bands - 1)  # epilogue
        run_c(n_bands - 2)
        run_c(n_bands - 1)

    if n_bands >= 2:
        out_dma(n_bands - 2).wait()
    out_dma(n_bands - 1).wait()
    zt.wait()
    zb.wait()
