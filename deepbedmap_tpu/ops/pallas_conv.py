"""Standalone fused 3x3 SAME conv Pallas kernel — the generator-tail lever.

After round 4 fused the deform tail, the biggest remaining gap between the
104 ms continent-tile forward and its roofline is the plain 64-channel 3x3
convs around the trunk (reference layers srgan_train.py:470-505: the
pre/post-residual convs and the two post-upsample convs). Measured under
XLA at these shapes (benchmarks/tpu_session_logs/bench_tail_r3d.log):
conv64@1144^2 8.9 ms, @572^2 3.8 ms, @286^2 2.7 ms — 2-11 TFLOP/s effective
against the ~36 TFLOP/s the fused-RDB kernel proves reachable for this op
class on one v5e. The cause mirrors the trunk's: XLA's conv at batch 1 /
64 channels leaves most of the 128-lane MXU idle and re-tiles the image
around each conv instead of keeping a row band resident.

This kernel reuses the fused-RDB layout (ops/pallas_rdb.py): the (H, W, C)
image flattens to (H*Wp, C) rows with the row pitch Wp padded to a multiple
of 8 (>= W+2, one zero column left + the rest right), so the nine 3x3 taps
become flat-index offsets {dy*Wp + dx}. The dx taps fold into the K
dimension by lane-concatenating sublane rolls (S3 = [roll(+1)|x|roll(-1)],
K = 3C), the dy taps into the N dimension by lane-concatenating the three
dy weight matrices (N = 3*C_out) — ONE MXU dot per row band, then two
shifted sublane adds. Bias, the optional residual skip-add, and the
optional LeakyReLU epilogue fuse in VMEM, so HBM sees each stage's input
once in and its activated output once out.

Zero-padding correctness needs no in-kernel mask (unlike the RDB kernel,
whose *intermediate* activations must be re-zeroed): the wrapper zero-pads
the input image, every pad column/margin row is zero, and the only
roll-wrap-contaminated dot row (flat index 0 of a band) lands on a pad
column that the final unpad drops (see the margin audit in the kernel
body).

Numerics: fp32 accumulation; identical decomposition to the XLA conv up to
dot-order rounding (parity-tested in tests/test_pallas_conv.py).
``mxu_bf16`` casts only the dot multiplicands to bf16 — the precision XLA's
default already applies to fp32 convs on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MARGIN = 1  # rows consumed per side by one 3x3 conv


def _pack_conv_weights(kernel: jax.Array) -> jax.Array:
    """(3, 3, C, N) HWIO -> (3C, 3N): rows are [dx=-1 | dx=0 | dx=+1] blocks
    of C channels, columns [dy=0 (mid) | dy=-1 (above) | dy=+1 (below)]
    blocks of N — the same [mid|down|up] order as the RDB kernel's
    pack_dys."""
    per_dy = [
        jnp.concatenate([kernel[dy, dx] for dx in range(3)], axis=0)
        for dy in range(3)
    ]  # each (3C, N)
    return jnp.concatenate([per_dy[1], per_dy[0], per_dy[2]], axis=1)


def _conv3x3_kernel(
    x_ref,  # (1, E, C) VMEM — band rows flattened (rows*Wp, C), 1-row margins
    w_ref,  # (3C, 3N) packed weights
    b_ref,  # (1, N)
    *refs,  # [res_ref (1, B*Wp, N)] if residual, then out_ref (1, B*Wp, N)
    band: int,
    wp: int,
    leaky: bool,
    residual: bool,
    mxu_bf16: bool,
):
    res_ref, out_ref = (refs[0], refs[1]) if residual else (None, refs[0])
    n = b_ref.shape[1]
    x = x_ref[0]
    e = x.shape[0]
    mdt = jnp.bfloat16 if mxu_bf16 else jnp.float32
    # S3 = [x[m-1] | x[m] | x[m+1]] in lanes (pltpu.roll needs shifts >= 0).
    # Roll wrap puts x[E-1] into s3[0] and x[0] into s3[E-1]; of the dot rows
    # consumed below only p[0] is contaminated and it lands on out flat
    # position 0 — band row 0, pad column 0 — which the wrapper's unpad
    # drops. p[E-1] is consumed by no slice (2*wp + i <= E-1 needs
    # i = band*wp + wp - 1 >= band*wp).
    s3 = jnp.concatenate(
        [pltpu.roll(x, 1, 0), x, pltpu.roll(x, e - 1, 0)], axis=1
    ).astype(mdt)
    p = jnp.dot(s3, w_ref[...], preferred_element_type=jnp.float32)  # (E, 3N)
    bw = band * wp
    z = (
        p[wp : wp + bw, :n]  # dy = 0
        + p[:bw, n : 2 * n]  # dy = -1 (row above)
        + p[2 * wp :, 2 * n :]  # dy = +1 (row below)
        + b_ref[0]
    )
    if residual:
        z = z + res_ref[0]
    if leaky:
        z = jnp.where(z >= 0, z, 0.2 * z)
    out_ref[0] = z


def conv3x3_pallas(
    x: jax.Array,  # (N, H, W, C) fp32
    kernel: jax.Array,  # (3, 3, C, N) HWIO
    bias: jax.Array,  # (N,)
    *,
    leaky: bool = False,
    residual: jax.Array | None = None,  # (N, H, W, N_out) skip added pre-leaky
    band: int | None = None,
    mxu_bf16: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """out = [leaky](conv3x3_same(x) + bias [+ residual]). Any W works — the
    row pitch pads up to the next multiple of 8 and the mask-free zero-pad
    argument above keeps extra pad columns inert."""
    n, h, w, c = x.shape
    n_out = kernel.shape[-1]
    wp = -(-(w + 2) // 8) * 8
    interpret = interpret or jax.default_backend() != "tpu"
    if band is None:
        # keep the band's VMEM residency (x + S3 + dot result + out) under
        # ~45 MB: per flat row 4*(C + 3C + 3N_out) bytes
        per_row = 4 * (4 * c + 3 * n_out)
        band = 32 if (34 * wp * per_row) < 45 * 2**20 else 16
    n_bands = -(-h // band)
    hp = n_bands * band
    e = (band + 2 * _MARGIN) * wp
    bw = band * wp

    packed = _pack_conv_weights(kernel)
    if mxu_bf16:
        packed = packed.astype(jnp.bfloat16)
    b2 = bias[None, :]

    def one(img, res):  # (H, W, C)[, (H, W, N_out)] -> (H, W, N_out)
        flat = jnp.pad(
            img, ((_MARGIN, hp - h + _MARGIN), (1, wp - w - 1), (0, 0))
        ).reshape(-1, c)

        def grab(i):
            return jax.lax.dynamic_slice(flat, (i * bw, 0), (e, c))

        bands = jax.vmap(grab)(jnp.arange(n_bands))  # (n_bands, E, C)

        operands = [bands, packed, b2]
        in_specs = [
            pl.BlockSpec((1, e, c), lambda i: (i, 0, 0)),
            pl.BlockSpec(packed.shape, lambda i: (0, 0)),
            pl.BlockSpec(b2.shape, lambda i: (0, 0)),
        ]
        if res is not None:
            res_flat = jnp.pad(
                res, ((0, hp - h), (1, wp - w - 1), (0, 0))
            ).reshape(n_bands, bw, n_out)
            operands.append(res_flat)
            in_specs.append(pl.BlockSpec((1, bw, n_out), lambda i: (i, 0, 0)))

        body = functools.partial(
            _conv3x3_kernel,
            band=band,
            wp=wp,
            leaky=leaky,
            residual=res is not None,
            mxu_bf16=mxu_bf16,
        )
        out = pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((n_bands, bw, n_out), jnp.float32),
            grid=(n_bands,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bw, n_out), lambda i: (i, 0, 0)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*operands)
        return out.reshape(hp, wp, n_out)[:h, 1 : w + 1]

    if residual is None:
        return jax.vmap(lambda img: one(img, None))(x)
    return jax.vmap(one)(x, residual)


def conv3x3_reference(x, kernel, bias, *, leaky=False, residual=None):
    """Plain XLA composition (identical math; parity oracle and backward)."""
    z = (
        jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + bias
    )
    if residual is not None:
        z = z + residual
    if leaky:
        z = jnp.where(z >= 0, z, 0.2 * z)
    return z


def should_fuse_conv(shape) -> bool:
    """Dispatch rule, mirroring ops.pallas_rdb.should_fuse: inference-scale
    images on TPU; training tiles and CPU stay on XLA. No pitch constraint —
    the pitch pads to a multiple of 8 internally."""
    n, h, w, _ = shape
    return jax.default_backend() == "tpu" and h * w >= 256 * 256


# Two custom_vjp entry points (with/without the residual operand) so None
# never flows through a differentiable position; backward = autodiff of the
# identical XLA composition (training runs the XLA path anyway — small
# tiles — but grads must exist under jit).


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3_fused(x, kernel, bias, leaky=False, mxu_bf16=False):
    return conv3x3_pallas(x, kernel, bias, leaky=leaky, mxu_bf16=mxu_bf16)


def _conv3x3_fwd(x, kernel, bias, leaky, mxu_bf16):
    out = conv3x3_pallas(x, kernel, bias, leaky=leaky, mxu_bf16=mxu_bf16)
    return out, (x, kernel, bias)


def _conv3x3_bwd(leaky, mxu_bf16, res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(
        lambda x_, k_, b_: conv3x3_reference(x_, k_, b_, leaky=leaky),
        x, kernel, bias,
    )
    return vjp(g)


conv3x3_fused.defvjp(_conv3x3_fwd, _conv3x3_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv3x3_res_fused(x, kernel, bias, residual, leaky=False, mxu_bf16=False):
    return conv3x3_pallas(
        x, kernel, bias, leaky=leaky, residual=residual, mxu_bf16=mxu_bf16
    )


def _conv3x3_res_fwd(x, kernel, bias, residual, leaky, mxu_bf16):
    out = conv3x3_pallas(
        x, kernel, bias, leaky=leaky, residual=residual, mxu_bf16=mxu_bf16
    )
    return out, (x, kernel, bias, residual)


def _conv3x3_res_bwd(leaky, mxu_bf16, res, g):
    x, kernel, bias, residual = res
    _, vjp = jax.vjp(
        lambda x_, k_, b_, r_: conv3x3_reference(
            x_, k_, b_, leaky=leaky, residual=r_
        ),
        x, kernel, bias, residual,
    )
    return vjp(g)


conv3x3_res_fused.defvjp(_conv3x3_res_fwd, _conv3x3_res_bwd)
