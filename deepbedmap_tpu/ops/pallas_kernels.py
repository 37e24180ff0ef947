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


def _tile_plan(n: int, h: int, w: int, bh: int):
    """Block geometry + per-tile (batch, row, col) start table."""
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


def _tile_rows_hcw(
    x_hcw: jax.Array,
    starts: jax.Array,
    bh: int,
    rh: int,
    h: int,
    w: int,
    hp: int,
    wp: int,
    lane_left: int = _LANE_HALO,
    prepadded: bool = False,
):
    """Channels-BEFORE-width (N, H, C, W) image -> halo'd row-major tiles
    (T, bh + 2*rh, C, 128) by pad + overlapping gather ONLY — an (H, C, W)
    slice already IS (rows, C, lanes), so no transposes are emitted anywhere
    (the producer's own NHWC -> NHCW swap is a minor-axis move XLA folds
    into the producing op; the 6-D reshape/transpose this replaces measured
    ~12 ms per layer at 1144^2, benchmarks/tpu_session_logs/
    bench_pieces_r3.log). ``lane_left``: left lane padding — _LANE_HALO for
    halo'd image reads, 0 for offset fields whose lane frame starts at the
    tile's first output column (their trailing 8 lanes then hold the next
    tile's columns rather than zeros; every kernel body either masks lanes
    >= _BW (wx 'valid') or confines them to discarded output lanes)."""
    c = x_hcw.shape[2]
    if not prepadded:
        x_hcw = jnp.pad(
            x_hcw,
            (
                (0, 0),
                (rh, rh + hp - h),
                (0, 0),
                (lane_left, (wp + 2 * _LANE_HALO - lane_left) - w),
            ),
        )

    def grab(s):
        return jax.lax.dynamic_slice(
            x_hcw, (s[0], s[1], 0, s[2]), (1, bh + 2 * rh, c, _LANES)
        )[0]

    return jax.vmap(grab)(starts)


def _tile_offsets(
    off_hcw: jax.Array,
    starts: jax.Array,
    bh: int,
    hp: int,
    wp: int,
):
    """(N, H, 2K, W) offset field -> (T, bh, 2K, 1, 128) per-row lane
    vectors (lane dim = the tile's output columns) via the gather-only row
    tiler."""
    n, h, _, w = off_hcw.shape
    off_t = _tile_rows_hcw(
        off_hcw, starts, bh, 0, h, w, hp, wp, lane_left=0
    )
    return off_t[:, :, :, None, :]


def _untile_out_hcw(
    out: jax.Array, n: int, h: int, w: int, gy: int, gx: int, bh: int, c_out: int
):
    """(T, bh, C_out, bw) kernel output tiles -> (N, H, C_out, W) — the
    channels-before-width layout the next deform layer's tiler consumes
    without any transposes. The permutation here moves only the gx axis
    inward (no minor-pair swap), unlike the NHWC untiler."""
    out = (
        out.reshape(n, gy, gx, bh, c_out, _BW)
        .transpose(0, 1, 3, 4, 2, 5)
        .reshape(n, gy * bh, c_out, gx * _BW)
    )
    return out[:, :h, :, :w]


def _untile_out(
    out: jax.Array, n: int, h: int, w: int, gy: int, gx: int, bh: int, c_out: int
):
    """(T, bh, C_out, bw) kernel output tiles -> (N, H, W, C_out)."""
    out = (
        out.reshape(n, gy, gx, bh, c_out, _BW)
        .transpose(0, 1, 3, 2, 5, 4)
        .reshape(n, gy * bh, gx * _BW, c_out)
    )
    return out[:, :h, :w, :]


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
    mxu_bf16: bool = False,
):
    k = kh * kw
    c_in = x_ref.shape[3]
    c_out = out_ref.shape[3]
    span = 2 * clamp + 2
    mxu_t = jnp.bfloat16 if mxu_bf16 else jnp.float32

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

            s_use = s_mat.astype(mxu_t)
            y_t = jnp.zeros((c_in, _LANES), jnp.float32)
            for sy in range(-clamp, clamp + 2):
                wy = (1.0 - fy) * (iy == sy) + fy * (iy == sy - 1)
                slab = x_ref[0, r + row_halo + (u - padding) + sy, 0]  # (C, 128)
                y_t = y_t + wy[None, :] * jnp.dot(
                    slab.astype(mxu_t), s_use, preferred_element_type=jnp.float32
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
    x: jax.Array,  # (N, H, W, C_in) NHWC — or (N, H, C_in, W) with in_hcw
    offsets: jax.Array,  # (N, H, W, 2*K) — or (N, H, 2*K, W) with in_hcw
    weight: jax.Array,  # (kh, kw, C_in, C_out)
    bias: Optional[jax.Array] = None,
    padding: int = 1,
    clamp: int = 2,
    block_rows: int = 64,
    interpret: Optional[bool] = None,
    mxu_bf16: bool = False,
    kernel_body: str = "auto",
    in_hcw: bool = False,
    out_hcw: bool = False,
) -> jax.Array:
    """Forward-only Pallas deformable conv (see module docstring).

    H/W are padded up to block multiples internally; output is cropped back.
    ``interpret`` defaults to True off-TPU so tests run on the CPU mesh.
    ``in_hcw`` / ``out_hcw``: channels-before-width (N, H, C, W) layouts on
    input / output — with them the tiler is pad + gather only (no
    transposes), and the producing conv emits the layout for ~free
    (models.blocks.ConvHCW; a standalone transpose of the same tensors
    measured ~10 ms/layer at 1144^2).
    ``mxu_bf16`` runs the banded body's shift matmuls with bf16 multiplicands
    (fp32 accumulation; banded-only — asserted, since measurement showed no
    effect: Mosaic fp32 dots already run bf16-multiplicand on this hardware).
    ``kernel_body``: 'stacked' (sy-slabs and tap contractions batched into
    large matmuls — fastest at every clamp, measured 20.8 ms clamp=2 /
    18.7 ms clamp=1 at 1144^2 x 64 vs banded 50 ms and rolls 25 ms),
    'stacked_packed' (v4: one shared slab + one lane-concatenated sampling
    dot per kernel row — 3x fewer MXU instructions at equal passes),
    'stacked_pipelined' (v5: the packed body with the sampling-matrix build
    carried one row ahead so VPU build and MXU dots can overlap — measured
    a ~15% LOSS, kept as the recorded dead end),
    'banded' (v1 S-matrix matmuls), 'rolls' (static lane rotations), or
    'auto' (= 'stacked').
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if in_hcw:
        n, h, c_in, w = x.shape
    else:
        n, h, w, c_in = x.shape
    kh, kw, _, c_out = weight.shape
    k = kh * kw
    bh = block_rows
    assert padding + clamp + 1 <= _LANE_HALO, "shift reach exceeds lane halo"
    row_halo = _LANE_HALO

    hp, wp, gy, gx, num_tiles, starts = _tile_plan(n, h, w, bh)

    # (N, H, C, W) image -> batch-major row tiles (T, rows, 1, C, 128) by
    # pad + gather only (no transposes)
    x_hcw = x if in_hcw else jnp.swapaxes(x, 2, 3)
    x_tiles = _tile_rows_hcw(x_hcw, starts, bh, row_halo, h, w, hp, wp)[:, :, None]

    # offsets -> (T, bh, 2K, 1, 128): per-row, per-channel lane vectors with
    # the lane dim holding the tile's output columns
    off_hcw = offsets if in_hcw else jnp.swapaxes(offsets, 2, 3)
    off_t = _tile_offsets(off_hcw, starts, bh, hp, wp)

    if kernel_body == "auto":
        # stacked wins at every clamp (clamp=2: 20.8 vs banded 50; clamp=1:
        # 18.7 vs rolls 25.3, measured 1144^2 x 64 on one v5e)
        kernel_body = "stacked"
    assert not mxu_bf16 or kernel_body == "banded", (
        "mxu_bf16 applies to the 'banded' body only"
    )
    if kernel_body in ("stacked", "stacked_packed", "stacked_pipelined"):
        # tap-stacked contraction matrix: column block t holds weight[u,v,:,:]
        w_t = jnp.transpose(weight.reshape(k, c_in, c_out), (2, 0, 1)).reshape(
            c_out, k * c_in
        )
        w_spec = pl.BlockSpec(
            (c_out, k * c_in), lambda t: (0, 0), memory_space=pltpu.VMEM
        )
    else:
        w_t = jnp.transpose(weight.reshape(k, c_in, c_out), (0, 2, 1))  # (K, C_out, C)
        w_spec = pl.BlockSpec(
            (k, c_out, c_in), lambda t: (0, 0, 0), memory_space=pltpu.VMEM
        )
    b = (
        jnp.zeros((1, c_out, 1), x.dtype)
        if bias is None
        else bias.reshape(1, c_out, 1)
    )

    body = {
        "banded": _deform_rows_kernel,
        "rolls": _deform_rolls_kernel,
        "stacked": _deform_stacked_kernel,
        "stacked_packed": _deform_stacked_kernel,
        "stacked_pipelined": _deform_stacked_pipelined_kernel,
    }[kernel_body]
    extra = {"mxu_bf16": mxu_bf16} if kernel_body == "banded" else {}
    if kernel_body == "stacked_packed":
        extra = {"pack_taps": True}
    kernel = functools.partial(
        body,
        bh=bh,
        row_halo=row_halo,
        padding=padding,
        clamp=clamp,
        kh=kh,
        kw=kw,
        **extra,
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
            w_spec,
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

    # (T, bh, 1, C_out, 128) -> (N, H, W, C_out) or (N, H, C_out, W)
    untile = _untile_out_hcw if out_hcw else _untile_out
    return untile(out[:, :, 0, :, :_BW], n, h, w, gy, gx, bh, c_out)


def _deform_stacked_kernel(
    x_ref,  # (1, bh + 2*rh, 1, C, 128) VMEM — halo'd row slabs
    off_ref,  # (1, bh, 2K, 1, 128) VMEM
    w_ref,  # (C_out, K*C) VMEM — tap-stacked contraction matrix
    b_ref,  # (1, C_out, 1) VMEM
    out_ref,  # (1, bh, 1, C_out, 128) VMEM
    *,
    bh: int,
    row_halo: int,
    padding: int,
    clamp: int,
    kh: int,
    kw: int,
    pack_taps: bool = False,
    lane_base: Optional[int] = None,
    mask_lanes: bool = True,
    apply_lrelu: bool = False,
):
    """Banded-matmul body v3: identical decomposition to
    ``_deform_rows_kernel`` with the MXU work batched into large matmuls.

    ``lane_base`` (default ``_LANE_HALO``): lane offset between the offset
    frame and the x frame — the standalone wrapper tiles offsets with
    lane_left=0 (frame starts at the first output column) while x carries a
    ``_LANE_HALO`` left halo; the fused-tail path (ops.pallas_tail) tiles
    both in ONE shared frame, so lane_base=0. ``mask_lanes``: zero wx for
    lanes >= _BW (standalone trailing-lane hygiene); the fused path keeps
    all 128 lanes live (its consumable region is interior) and masks
    validity outside the kernel. ``apply_lrelu``: fuse the generator's
    LeakyReLU(0.2) into the output write (srgan_train.py:552-555).

    Per output row the v1 body issues 54 thin (C,128)x(128,128) dots (9 taps x
    6 sy) plus 9 (C_out,C)x(C,128) tap contractions; at 1144^2 x 64ch the
    kernel is instruction-issue-bound at ~12% MXU. Here the 6 sy-slabs of a
    tap are stacked into ONE (6*C,128)@(128,128) dot (the full 8-row halo
    window is loaded once per row and re-sliced per tap group), the wy
    bilinear row weights are applied to the stacked product, and all 9 tap
    outputs are concatenated for a single (C_out,K*C)@(K*C,128) contraction —
    6x fewer MXU instructions at equal FLOPs. The static band masks
    (band == sx per tap column v) are hoisted out of the row loop.

    ``pack_taps`` (v4): the three taps sharing a kernel row u reuse ONE
    (span*C, 128) slab (the x window persists across the tap loop instead of
    being re-sliced per tap) and their three sampling matrices are
    lane-concatenated into a single (6*C,128)@(128,3*128) dot — the same
    pass count in 3x fewer MXU instructions and 3x fewer slab
    materialisations (the dy-packing lever that won 10% on the RDB kernel,
    ops/pallas_rdb.py)."""
    k = kh * kw
    c_in = x_ref.shape[3]
    c_out = out_ref.shape[3]
    span = 2 * clamp + 2  # sy/sx shift count
    if lane_base is None:
        lane_base = _LANE_HALO

    l_idx = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_LANES,), 0)
    valid = (
        (lane < _BW).astype(jnp.float32)
        if mask_lanes
        else jnp.ones((_LANES,), jnp.float32)
    )

    # static (band == sx) masks per tap-column v: band = l - j - base(v)
    band_masks = {}
    for v in range(kw):
        base = lane_base + (v - padding)
        band = l_idx - j_idx - base
        band_masks[v] = [
            (band == sx).astype(jnp.float32) for sx in range(-clamp, clamp + 2)
        ]

    def tap_weights(r, t, v):
        """Per-tap sampling matrix (lane mixing) + bilinear row weights."""
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

        s_mat = jnp.zeros((_LANES, _LANES), jnp.float32)
        for si, sx in enumerate(range(-clamp, clamp + 2)):
            wx = ((1.0 - fx) * (ix == sx) + fx * (ix == sx - 1)) * valid
            s_mat = s_mat + band_masks[v][si] * wx[None, :]

        wy = jnp.stack(
            [
                (1.0 - fy) * (iy == sy) + fy * (iy == sy - 1)
                for sy in range(-clamp, clamp + 2)
            ]
        )  # (span, 128)
        return s_mat, wy

    def row_body(r, _):
        # all 8 sample rows this output row can touch: u-p+sy in [-3, 4]
        stack = x_ref[0, pl.ds(r + row_halo - clamp - padding, span + kh - 1), 0]
        # (span+kh-1, C, 128)

        tap_outs = []
        if pack_taps:
            for u in range(kh):
                # ONE slab per kernel row, shared by its kw taps
                slab = stack[u : u + span].reshape(span * c_in, _LANES)
                mats, wys = zip(
                    *(tap_weights(r, u * kw + v, v) for v in range(kw))
                )
                prod = jnp.dot(
                    slab,
                    jnp.concatenate(mats, axis=1),  # (128, kw*128)
                    preferred_element_type=jnp.float32,
                )  # (span*C, kw*128)
                # slice the 2-D dot result at lane multiples BEFORE the 3-D
                # reshape: reducing a slice of a 4-D reshape trips Mosaic
                # ("unsupported output implicit dimension" on the
                # vector.multi_reduction); this form matches the layout the
                # unpacked body lowers with
                tap_outs.extend(
                    jnp.sum(
                        prod[:, v * _LANES : (v + 1) * _LANES].reshape(
                            span, c_in, _LANES
                        )
                        * wys[v][:, None, :],
                        axis=0,
                    )
                    for v in range(kw)
                )  # kw x (C, 128), tap order u*kw + v
        else:
            for t in range(k):
                u, v = t // kw, t % kw
                s_mat, wy = tap_weights(r, t, v)
                # one (span*C, 128) @ (128, 128) dot covers every sy shift
                slabs = stack[u : u + span].reshape(span * c_in, _LANES)
                prod = jnp.dot(
                    slabs, s_mat, preferred_element_type=jnp.float32
                ).reshape(span, c_in, _LANES)
                tap_outs.append(jnp.sum(prod * wy[:, None, :], axis=0))

        y_all = jnp.concatenate(tap_outs, axis=0)  # (K*C, 128)
        acc = jnp.dot(w_ref[...], y_all, preferred_element_type=jnp.float32)
        acc = acc + b_ref[0]
        if apply_lrelu:
            # == leaky_relu(acc, 0.2) exactly: 0.2*a <= a iff a >= 0
            acc = jnp.maximum(acc, 0.2 * acc)
        out_ref[0, r, 0] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bh, row_body, 0)


def _deform_stacked_pipelined_kernel(
    x_ref,  # (1, bh + 2*rh, 1, C, 128) VMEM — halo'd row slabs
    off_ref,  # (1, bh, 2K, 1, 128) VMEM
    w_ref,  # (C_out, K*C) VMEM — tap-stacked contraction matrix
    b_ref,  # (1, C_out, 1) VMEM
    out_ref,  # (1, bh, 1, C_out, 128) VMEM
    *,
    bh: int,
    row_halo: int,
    padding: int,
    clamp: int,
    kh: int,
    kw: int,
):
    """v5: the tap-packed stacked body with the sampling-matrix build
    software-pipelined one output row ahead.

    The v4 measurement (equal time in 3x fewer MXU instructions,
    benchmarks/RESULTS.md) showed the stacked body is bound by the per-row
    VPU (sampling-matrix build from the offsets) -> MXU (slab dots) -> VPU
    (wy reduce) dependency chain, which Mosaic does not pipeline across
    ``fori_loop`` iterations. Here iteration r consumes the sampling
    matrices computed during iteration r-1 (loop-carried) and builds row
    r+1's matrices right after issuing row r's dots — the build has no data
    dependence on the in-flight MXU work, so the scheduler can overlap the
    two units instead of stalling each on the other. Same decomposition and
    numerics as ``_deform_stacked_kernel(pack_taps=True)``.
    """
    k = kh * kw
    c_in = x_ref.shape[3]
    c_out = out_ref.shape[3]
    span = 2 * clamp + 2

    l_idx = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_LANES,), 0)
    valid = (lane < _BW).astype(jnp.float32)

    band_masks = {}
    for v in range(kw):
        base = _LANE_HALO + (v - padding)
        band = l_idx - j_idx - base
        band_masks[v] = [
            (band == sx).astype(jnp.float32) for sx in range(-clamp, clamp + 2)
        ]

    def tap_weights(r, t, v):
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

        s_mat = jnp.zeros((_LANES, _LANES), jnp.float32)
        for si, sx in enumerate(range(-clamp, clamp + 2)):
            wx = ((1.0 - fx) * (ix == sx) + fx * (ix == sx - 1)) * valid
            s_mat = s_mat + band_masks[v][si] * wx[None, :]

        wy = jnp.stack(
            [
                (1.0 - fy) * (iy == sy) + fy * (iy == sy - 1)
                for sy in range(-clamp, clamp + 2)
            ]
        )  # (span, 128)
        return s_mat, wy

    def mats_for_row(r):
        """Lane-concatenated sampling matrices (one per kernel row u) and
        the (K, span, 128) bilinear row-weight stack for output row ``r``."""
        mats = []
        wys = []
        for u in range(kh):
            ms, ws = zip(*(tap_weights(r, u * kw + v, v) for v in range(kw)))
            mats.append(jnp.concatenate(ms, axis=1))  # (128, kw*128)
            wys.extend(ws)
        return tuple(mats) + (jnp.stack(wys),)

    def row_body(r, carry):
        mats, wys = carry[:kh], carry[kh]
        stack = x_ref[0, pl.ds(r + row_halo - clamp - padding, span + kh - 1), 0]

        # 1) issue row r's MXU dots against the carried matrices
        prods = []
        for u in range(kh):
            slab = stack[u : u + span].reshape(span * c_in, _LANES)
            prods.append(
                jnp.dot(slab, mats[u], preferred_element_type=jnp.float32)
            )  # (span*C, kw*128)

        # 2) build row r+1's matrices — VPU work with no dependence on (1),
        #    free to overlap the in-flight dots (clamped read: the value
        #    computed at the final row is discarded with the loop carry)
        nxt = mats_for_row(jnp.minimum(r + 1, bh - 1))

        # 3) wy-reduce row r's products and contract through the tap weights
        tap_outs = []
        for u in range(kh):
            tap_outs.extend(
                jnp.sum(
                    prods[u][:, v * _LANES : (v + 1) * _LANES].reshape(
                        span, c_in, _LANES
                    )
                    * wys[u * kw + v][:, None, :],
                    axis=0,
                )
                for v in range(kw)
            )
        y_all = jnp.concatenate(tap_outs, axis=0)  # (K*C, 128)
        acc = jnp.dot(w_ref[...], y_all, preferred_element_type=jnp.float32)
        out_ref[0, r, 0] = (acc + b_ref[0]).astype(out_ref.dtype)
        return nxt

    jax.lax.fori_loop(0, bh, row_body, mats_for_row(0))


def _deform_rolls_kernel(
    x_ref,  # (1, bh + 2*rh, 1, C, 128) VMEM
    off_ref,  # (1, bh, 2K, 1, 128) VMEM
    w_ref,  # (K, C_out, C) VMEM
    b_ref,  # (1, C_out, 1) VMEM
    out_ref,  # (1, bh, 1, C_out, 128) VMEM
    *,
    bh: int,
    row_halo: int,
    padding: int,
    clamp: int,
    kh: int,
    kw: int,
):
    """Roll-based kernel body: the (2*clamp+2)^2 masked-shift terms are
    evaluated as static lane rotations + FMAs on the (span*C, 128) slab stack
    (pure VPU), with one tap matmul per (row, tap) left on the MXU. Beats the
    banded-matmul body when the term count is small (clamp <= 1): both are
    ~VPU/issue-bound, but the rolls body's per-term cost scales with the
    span while the banded body always pays full (128,128) matmuls.
    """
    k = kh * kw
    c_in = x_ref.shape[3]
    c_out = out_ref.shape[3]
    span = 2 * clamp + 2

    def row_body(r, _):
        acc = jnp.zeros((c_out, _LANES), jnp.float32)
        for t in range(k):
            u, v = t // kw, t % kw
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
            base = row_halo + (v - padding)
            a = r + row_halo + (u - padding) - clamp
            stack = x_ref[0, pl.ds(a, span), 0].reshape(span * c_in, _LANES)
            h = jnp.zeros((span * c_in, _LANES), jnp.float32)
            for sx in range(-clamp, clamp + 2):
                wx = (1.0 - fx) * (ix == sx) + fx * (ix == sx - 1)
                h = h + wx[None, :] * jnp.roll(stack, -(base + sx), axis=1)
            hh = h.reshape(span, c_in, _LANES)
            wy = jnp.stack(
                [
                    (1.0 - fy) * (iy == sy) + fy * (iy == sy - 1)
                    for sy in range(-clamp, clamp + 2)
                ]
            )  # (span, 128)
            y_t = jnp.sum(hh * wy[:, None, :], axis=0)
            acc = acc + jnp.dot(
                w_ref[t], y_t, preferred_element_type=jnp.float32
            )
        out_ref[0, r, 0] = (acc + b_ref[0]).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bh, row_body, 0)


def _deform_zproj1_kernel(
    z_ref,  # (1, bh + 2*rh, K, 128) VMEM — per-tap projections, lane-preshifted
    off_ref,  # (1, bh, 2K, 1, 128) VMEM
    b_ref,  # (1, 1, 1) VMEM
    out_ref,  # (1, bh, 1, 128) VMEM
    *,
    bh: int,
    row_halo: int,
    padding: int,
    clamp: int,
    kh: int,
    kw: int,
    lane_base: Optional[int] = None,
    off_row_base: int = 0,
):
    """Sampling-only kernel for the C_out == 1 zproj path: the tap projections
    ``z_t = x @ W_t`` arrive precomputed (XLA matmul) with each tap's static
    column offset already rolled in; this body evaluates the masked-shift
    bilinear terms for 8 output rows per VPU op (rows on the sublane axis).

    ``lane_base`` (default ``row_halo``): lane offset between the offset
    frame and the z frame (0 when the fused tail tiles both in one shared
    frame). ``off_row_base``: row offset into off_ref for output row 0 (the
    fused tail's offset field carries the same row halo as z).
    """
    k = kh * kw
    if lane_base is None:
        lane_base = row_halo

    def row8_body(r8, _):
        r = r8 * 8
        dy = jnp.clip(
            off_ref[0, pl.ds(r + off_row_base, 8), pl.ds(0, k), 0].astype(
                jnp.float32
            ),
            -clamp,
            clamp,
        )  # (8, K, 128)
        dx = jnp.clip(
            off_ref[0, pl.ds(r + off_row_base, 8), pl.ds(k, k), 0].astype(
                jnp.float32
            ),
            -clamp,
            clamp,
        )
        iy = jnp.floor(dy)
        ix = jnp.floor(dx)
        fy = dy - iy
        fx = dx - ix
        wxs = [
            (1.0 - fx) * (ix == sx) + fx * (ix == sx - 1)
            for sx in range(-clamp, clamp + 2)
        ]

        total = jnp.zeros((8, _LANES), jnp.float32)
        for sy in range(-clamp, clamp + 2):
            wy = (1.0 - fy) * (iy == sy) + fy * (iy == sy - 1)  # (8, K, 128)
            for g in range(kh):  # tap row-group u == g
                slab = z_ref[
                    0,
                    pl.ds(r + row_halo + (g - padding) + sy, 8),
                    pl.ds(g * kw, kw),
                ]  # (8, kw, 128) — row i holds the sample row for output r+i
                acc = jnp.zeros((8, kw, _LANES), jnp.float32)
                for xi in range(2 * clamp + 2):
                    w = (
                        wy[:, g * kw : (g + 1) * kw]
                        * wxs[xi][:, g * kw : (g + 1) * kw]
                    )
                    # static zero shift must bypass the roll: Mosaic lowers
                    # roll as slice+concat and rejects the zero-size slice
                    # (hit by the fused tail's lane_base=0 frame at xi=clamp)
                    sh = lane_base + xi - clamp
                    rolled = slab if sh == 0 else jnp.roll(slab, -sh, axis=2)
                    acc = acc + w * rolled
                total = total + acc.sum(axis=1)

        # scalar read, upcast first: Mosaic supports neither a (1,1)->(8,128)
        # sub-32-bit vector broadcast nor a sub-32-bit scalar extract
        bias = b_ref[...].astype(jnp.float32)[0, 0, 0]
        out_ref[0, pl.ds(r, 8), 0] = (total + bias).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bh // 8, row8_body, 0)


def deform_conv2d_pallas_zproj1(
    x: jax.Array,  # (N, H, W, C_in) NHWC — or (N, H, C_in, W) with in_hcw
    offsets: jax.Array,  # (N, H, W, 2*K) — or (N, H, 2*K, W) with in_hcw
    weight: jax.Array,  # (kh, kw, C_in, 1)
    bias: Optional[jax.Array] = None,
    padding: int = 1,
    clamp: int = 2,
    block_rows: int = 64,
    interpret: Optional[bool] = None,
    in_hcw: bool = False,
    out_hcw: bool = False,
) -> jax.Array:
    """Single-output-channel deformable conv (the reference generator's final
    layer, srgan_train.py:517-523): project the input through the tap weights
    in XLA first (linearity of bilinear sampling), then sample the 9 scalar
    fields in a thin row-vectorized Pallas kernel. ~10x the banded v1 kernel
    at this shape. Layout flags as in ``deform_conv2d_pallas``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if in_hcw:
        n, h, c_in, w = x.shape
    else:
        n, h, w, c_in = x.shape
    kh, kw, _, c_out = weight.shape
    assert c_out == 1, "zproj1 kernel is specific to C_out == 1"
    k = kh * kw
    assert padding + clamp + 1 <= _LANE_HALO, "shift reach exceeds lane halo"
    assert block_rows % 8 == 0, (
        "zproj1 processes 8 output rows per VPU op; block_rows must be a "
        f"multiple of 8 (got {block_rows})"
    )
    row_halo = _LANE_HALO
    bh = block_rows

    hp, wp, gy, gx, num_tiles, starts = _tile_plan(n, h, w, bh)

    # (N, H, K, W) tap projections at full fp32 matmul precision —
    # channels-before-width so tiling is pad + gather only (no transposes)
    z = jnp.einsum(
        "nhcw,kc->nhkw" if in_hcw else "nhwc,kc->nhkw",
        x,
        weight.reshape(k, c_in),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # pad to the halo'd frame FIRST, then fold each tap's static column
    # offset in as a lane roll: the rolled frame must hold shifted in-image
    # data one column beyond each image edge (rolled[c] = z_t[c + v - p] for
    # every lane the kernel's shift reach can touch), which a roll of the
    # unpadded image cannot represent
    z_big = jnp.pad(
        z,
        (
            (0, 0),
            (row_halo, row_halo + hp - h),
            (0, 0),
            (_LANE_HALO, _LANE_HALO + wp - w),
        ),
    )
    z_big = jnp.stack(
        [
            jnp.roll(z_big[:, :, t], -(t % kw - padding), axis=-1)
            if t % kw != padding
            else z_big[:, :, t]
            for t in range(k)
        ],
        axis=2,
    )
    z_tiles = _tile_rows_hcw(
        z_big, starts, bh, row_halo, h, w, hp, wp, prepadded=True
    )

    off_hcw = offsets if in_hcw else jnp.swapaxes(offsets, 2, 3)
    off_t = _tile_offsets(off_hcw, starts, bh, hp, wp)

    b = (
        jnp.zeros((1, 1, 1), x.dtype)
        if bias is None
        else bias.reshape(1, 1, 1)
    )

    kernel = functools.partial(
        _deform_zproj1_kernel,
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
                (1, bh + 2 * row_halo, k, _LANES),
                lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bh, 2 * k, 1, _LANES),
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
    )(z_tiles, off_t, b)

    # (T, bh, 1, bw) -> (N, H, W, 1) or (N, H, 1, W)
    untile = _untile_out_hcw if out_hcw else _untile_out
    return untile(out[:, :, 0, None, :_BW], n, h, w, gy, gx, bh, 1)


def _deform_zform_kernel(
    x_ref,  # (1, bh + 2*rh, 1, C, 128) VMEM — halo'd row slabs
    off_ref,  # (1, bh, 2K, 1, 128) VMEM
    w_ref,  # (K*C_out, C) VMEM — tap-major projection matrix
    b_ref,  # (1, C_out, 1) VMEM
    out_ref,  # (1, bh, 1, C_out, 128) VMEM
    z_ref,  # (bh + 2*rh, K*C_out, 128) VMEM scratch — per-tap projections
    *,
    bh: int,
    row_halo: int,
    padding: int,
    clamp: int,
    kh: int,
    kw: int,
):
    """v2 ("zform") deformable-conv kernel body.

    Because sampling is linear in the channels, project the input through the
    tap weights FIRST (one MXU matmul per window row: ``Z_t = W_t^T x``,
    lane-pre-shifted by the tap's static column offset), then evaluate the
    (2*clamp+2)^2 masked-shift bilinear terms on the (K*C_out, 128) projection
    stack — all K taps ride along the sublane axis of every VPU op, so the
    per-term cost no longer multiplies by K. Measured at 1144^2 x 64ch on one
    v5e: 76 ms — SLOWER than banded v1 (50 ms) and the stacked v3 (20.3 ms),
    so it is never auto-dispatched; kept as the in-kernel-projection
    reference implementation. At c_out=1 the standalone zproj1 kernel
    (9.4 ms) wins instead (the reference generator's final layer,
    srgan_train.py:517-523).
    """
    k = kh * kw
    c_out = out_ref.shape[3]
    rows_win = bh + 2 * row_halo

    # One tap row-group (u == g, kw taps) at a time: scratch holds only that
    # group's projections, and groups accumulate into out_ref.
    for g in range(kh):

        def project_row(wr, _, g=g):
            xrow = x_ref[0, wr, 0]  # (C, 128)
            z = jnp.dot(
                w_ref[pl.ds(g * kw * c_out, kw * c_out)],
                xrow,
                preferred_element_type=jnp.float32,
            )
            # pre-shift each tap's block by its static column offset
            parts = []
            for vi in range(kw):
                blk = z[vi * c_out : (vi + 1) * c_out]
                if vi != padding:
                    blk = jnp.roll(blk, -(vi - padding), axis=1)
                parts.append(blk)
            z_ref[wr] = jnp.concatenate(parts, axis=0)
            return 0

        jax.lax.fori_loop(0, rows_win, project_row, 0)

        if c_out == 1 and bh % 8 == 0:
            # Row-vectorized path: with a single output channel the per-row
            # slabs are (kw, 128) — too thin to fill the VPU — so process 8
            # output rows per op with rows riding the sublane axis.
            def row8_body(r8, _, g=g):
                r = r8 * 8
                dy = jnp.clip(
                    off_ref[0, pl.ds(r, 8), pl.ds(g * kw, kw), 0].astype(
                        jnp.float32
                    ),
                    -clamp,
                    clamp,
                )  # (8, kw, 128)
                dx = jnp.clip(
                    off_ref[0, pl.ds(r, 8), pl.ds(k + g * kw, kw), 0].astype(
                        jnp.float32
                    ),
                    -clamp,
                    clamp,
                )
                iy = jnp.floor(dy)
                ix = jnp.floor(dx)
                fy = dy - iy
                fx = dx - ix
                wxs = [
                    (1.0 - fx) * (ix == sx) + fx * (ix == sx - 1)
                    for sx in range(-clamp, clamp + 2)
                ]

                acc = jnp.zeros((8, kw, _LANES), jnp.float32)
                for sy in range(-clamp, clamp + 2):
                    wy = (1.0 - fy) * (iy == sy) + fy * (iy == sy - 1)
                    slab = z_ref[
                        pl.ds(r + row_halo + (g - padding) + sy, 8)
                    ]  # (8, kw, 128) — row i holds sample row for output r+i
                    for xi in range(2 * clamp + 2):
                        w = wy * wxs[xi]
                        rolled = jnp.roll(
                            slab, -(row_halo + xi - clamp), axis=2
                        )
                        acc = acc + w * rolled

                total = acc.sum(axis=1)  # (8, 128)
                if g == 0:
                    total = total + b_ref[0]
                else:
                    total = total + out_ref[0, pl.ds(r, 8), 0, 0]
                out_ref[0, pl.ds(r, 8), 0, 0] = total.astype(out_ref.dtype)
                return 0

            jax.lax.fori_loop(0, bh // 8, row8_body, 0)
            continue

        def row_body(r, _, g=g):
            dy = jnp.clip(
                off_ref[0, r, pl.ds(g * kw, kw), 0].astype(jnp.float32),
                -clamp,
                clamp,
            )  # (kw, 128)
            dx = jnp.clip(
                off_ref[0, r, pl.ds(k + g * kw, kw), 0].astype(jnp.float32),
                -clamp,
                clamp,
            )
            iy = jnp.floor(dy)
            ix = jnp.floor(dx)
            fy = dy - iy
            fx = dx - ix
            wxs = [
                (1.0 - fx) * (ix == sx) + fx * (ix == sx - 1)
                for sx in range(-clamp, clamp + 2)
            ]

            acc = jnp.zeros((kw, c_out, _LANES), jnp.float32)
            for sy in range(-clamp, clamp + 2):
                wy = (1.0 - fy) * (iy == sy) + fy * (iy == sy - 1)  # (kw, 128)
                slab = z_ref[r + row_halo + (g - padding) + sy].reshape(
                    kw, c_out, _LANES
                )
                for xi in range(2 * clamp + 2):
                    w = wy * wxs[xi]  # (kw, 128)
                    rolled = jnp.roll(slab, -(row_halo + xi - clamp), axis=2)
                    acc = acc + w[:, None, :] * rolled

            total = acc.sum(axis=0)
            if g == 0:
                total = total + b_ref[0]
            else:
                total = total + out_ref[0, r, 0]
            out_ref[0, r, 0] = total.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, bh, row_body, 0)


def deform_conv2d_pallas_zform(
    x: jax.Array,  # (N, H, W, C_in) NHWC
    offsets: jax.Array,  # (N, H, W, 2*K)
    weight: jax.Array,  # (kh, kw, C_in, C_out)
    bias: Optional[jax.Array] = None,
    padding: int = 1,
    clamp: int = 2,
    block_rows: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Deformable conv v1 forward via the zform kernel (see kernel docstring).

    Numerics: identical decomposition to ``_deform_conv_shifts`` with the
    channel contraction re-associated (projection before sampling), so outputs
    agree to fp32 round-off (~1e-6 relative), not bit-exactly.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, c_in = x.shape
    kh, kw, _, c_out = weight.shape
    k = kh * kw
    assert padding + clamp + 1 <= _LANE_HALO, "shift reach exceeds lane halo"
    row_halo = _LANE_HALO
    if block_rows is None:
        # keep the (bh + 2*rh, kw*C_out, 128) fp32 scratch under ~4 MB
        budget = 4 * 2**20 // (kw * c_out * _LANES * 4)
        block_rows = max(8, min(64, (budget - 2 * row_halo) // 8 * 8))
    bh = block_rows

    hp, wp, gy, gx, num_tiles, starts = _tile_plan(n, h, w, bh)

    x_hcw = jnp.swapaxes(x, 2, 3)
    x_tiles = _tile_rows_hcw(x_hcw, starts, bh, row_halo, h, w, hp, wp)[:, :, None]

    off_t = _tile_offsets(jnp.swapaxes(offsets, 2, 3), starts, bh, hp, wp)

    # tap-major projection matrix: rows t*c_out + co hold weight[u, v, :, co]
    w_t = jnp.transpose(weight.reshape(k, c_in, c_out), (0, 2, 1)).reshape(
        k * c_out, c_in
    )
    b = (
        jnp.zeros((1, c_out, 1), x.dtype)
        if bias is None
        else bias.reshape(1, c_out, 1)
    )

    kernel = functools.partial(
        _deform_zform_kernel,
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
                (k * c_out, c_in), lambda t: (0, 0), memory_space=pltpu.VMEM
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
        scratch_shapes=[
            pltpu.VMEM((bh + 2 * row_halo, kw * c_out, _LANES), jnp.float32)
        ],
        interpret=interpret,
    )(x_tiles, off_t, w_t, b)

    return _untile_out(out[:, :, 0, :, :_BW], n, h, w, gy, gx, bh, c_out)
