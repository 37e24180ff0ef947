"""Generator building blocks (flax.linen, NHWC).

Maps the reference's Chainer chains (srgan_train.py:201-404) onto TPU-idiomatic
forms:

- The input block's 30x30-stride-10 and 6x6-stride-2 *valid* convolutions are
  re-expressed as space-to-depth + 3x3-stride-1 valid convolutions — exactly the
  same linear map (block-Toeplitz factorisation), but the 3x3 form is MXU-shaped.
  Parameter counts and output values are identical; an imported Chainer weight
  (C_out, C_in, 30, 30) reshapes losslessly into our (3, 3, 100*C_in, C_out).
- Dense blocks keep explicit concatenation; XLA fuses the concats into the
  following conv's im2col, so no extra HBM traffic materialises.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepbedmap_tpu.ops.deform_conv import deform_conv2d
from deepbedmap_tpu.ops.resize import space_to_depth


def he_normal_chainer(scale: float = 0.1) -> Callable:
    """Chainer HeNormal(scale, fan_option='fan_in') equivalent:
    std = scale * sqrt(2 / fan_in)  (srgan_train.py:220).
    """
    return nn.initializers.variance_scaling(
        scale=2.0 * scale * scale, mode="fan_in", distribution="normal"
    )


def leaky_relu(x: jax.Array, slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, slope * x)


class StridedInputConv(nn.Module):
    """Valid conv with kernel 3b x 3b and stride b, computed as
    space_to_depth(b) + 3x3 valid conv. For b == 1 it is a plain 3x3 valid conv.

    Mirrors the reference input-branch convolutions (srgan_train.py:223-254):
    kernels are 3 km x 3 km with a 1 km stride in map units, so b equals the
    ratio of 1 km to the raster's resolution (X/W3: b=1, W2: b=2, W1: b=10).
    """

    features: int
    block: int
    init_scale: float = 0.1
    dtype: Any = None  # conv compute dtype (None = fp32)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.block > 1:
            x = space_to_depth(x, self.block)
        return nn.Conv(
            features=self.features,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding="VALID",
            dtype=self.dtype,
            kernel_init=he_normal_chainer(self.init_scale),
        )(x)


class InputBlock(nn.Module):
    """Four-branch input block -> concat (reference DeepbedmapInputBlock,
    srgan_train.py:201-266). NHWC shapes:
    x (N,11,11,1), w1 (N,110,110,1), w2 (N,22,22,2), w3 (N,11,11,1)
    -> (N,9,9,4*out_channels)."""

    out_channels: int = 32
    init_scale: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, w1, w2, w3):
        args = (self.init_scale, self.dtype)
        xb = StridedInputConv(self.out_channels, 1, *args, name="conv_on_X")(x)
        w1b = StridedInputConv(self.out_channels, 10, *args, name="conv_on_W1")(w1)
        w2b = StridedInputConv(self.out_channels, 2, *args, name="conv_on_W2")(w2)
        w3b = StridedInputConv(self.out_channels, 1, *args, name="conv_on_W3")(w3)
        return jnp.concatenate([xb, w1b, w2b, w3b], axis=-1)


class _Conv3x3Params(nn.Module):
    """Parameter holder matching nn.Conv's tree ({kernel, bias}) and init RNG
    stream, so the dense block can dispatch between the XLA composition and
    the fused Pallas kernel without changing the checkpoint format."""

    features: int
    in_features: int
    init_scale: float

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            he_normal_chainer(self.init_scale),
            (3, 3, self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class ResidualDenseBlock(nn.Module):
    """5-conv dense block with residual scaling (reference srgan_train.py:275-360).

    conv1..4 emit ``growth`` channels each, densely concatenated; conv5 projects
    back to ``features``; output = x + residual_scaling * conv5(...).

    On TPU at inference-scale images the block runs as ONE fused Pallas
    kernel (ops.pallas_rdb): source-major wide matmuls lift the MXU's
    N=32-lane ceiling and every intermediate stays in VMEM. Training tiles /
    CPU use the identical XLA composition (parity-tested; the fused path's
    backward is autodiff of the XLA form).
    """

    features: int = 64
    growth: int = 32
    residual_scaling: float = 0.1
    init_scale: float = 0.1
    dtype: Any = None
    fused: str = "auto"  # 'auto' | 'never' | 'always'
    # bf16 dot multiplicands inside the fused kernel (fp32 accumulation —
    # XLA's default conv precision for fp32 data); config.rdb_mxu_bf16
    mxu_bf16: bool = False
    # flat-resident trunk mode (ops.pallas_rdb.rdb_fused_flat): when set to
    # the (H, W) of the unflattened image, ``x`` is the (N, R, F) flat
    # row-band layout and the block maps flat -> flat with zero XLA
    # marshalling. The caller owns flatten/unflatten and the dispatch policy.
    resident_hw: tuple | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from deepbedmap_tpu.ops.pallas_rdb import (
            rdb_fused,
            rdb_fused_flat,
            should_fuse,
        )

        f, g = self.features, self.growth
        c_ins = (f, f + g, f + 2 * g, f + 3 * g, f + 4 * g)
        c_outs = (g, g, g, g, f)
        kernels, biases = [], []
        for i, (ci, co) in enumerate(zip(c_ins, c_outs), start=1):
            k, b = _Conv3x3Params(
                co, ci, self.init_scale, name=f"conv_layer{i}"
            )()
            kernels.append(k)
            biases.append(b)

        if self.resident_hw is not None:
            h, w = self.resident_hw
            return rdb_fused_flat(
                x.astype(jnp.float32), kernels, biases,
                self.residual_scaling, h, w, 32, self.mxu_bf16,
            )

        # 'always' bypasses the backend/size policy but the row-pitch
        # constraint is structural: the flattened layout needs (W+2) % 8 == 0
        # — a silent fallback there would make forced-kernel benchmarks and
        # parity checks vacuous, so refuse loudly instead
        if self.fused == "always" and (x.shape[2] + 2) % 8 != 0:
            raise ValueError(
                f"fused='always' requires (W+2) % 8 == 0 (got W={x.shape[2]}); "
                "pad the input or use fused='auto'"
            )
        use_fused = self.fused == "always" or (
            self.fused == "auto"
            and self.dtype is None
            and should_fuse(x.shape)
        )
        if use_fused:
            return rdb_fused(
                x.astype(jnp.float32), kernels, biases,
                self.residual_scaling, 32, self.mxu_bf16,
            )

        def conv(a, k, b):
            if self.dtype is not None:
                a, k, b = a.astype(self.dtype), k.astype(self.dtype), b.astype(self.dtype)
            return jax.lax.conv_general_dilated(
                a, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b

        a0 = x
        a1 = leaky_relu(conv(a0, kernels[0], biases[0]))
        a2 = leaky_relu(conv(jnp.concatenate([a0, a1], -1), kernels[1], biases[1]))
        a3 = leaky_relu(
            conv(jnp.concatenate([a0, a1, a2], -1), kernels[2], biases[2])
        )
        a4 = leaky_relu(
            conv(jnp.concatenate([a0, a1, a2, a3], -1), kernels[3], biases[3])
        )
        a5 = conv(
            jnp.concatenate([a0, a1, a2, a3, a4], -1), kernels[4], biases[4]
        )
        return a0 + self.residual_scaling * a5


class _RDBParams(nn.Module):
    """Parameter-only twin of ResidualDenseBlock: creates the identical
    conv_layer1..5 param tree (same names, same init RNG streams) and hands
    the tensors out, so the whole-RRDB fused launch can own the compute
    while checkpoints stay bit-compatible."""

    features: int
    growth: int
    init_scale: float

    @nn.compact
    def __call__(self):
        f, g = self.features, self.growth
        c_ins = (f, f + g, f + 2 * g, f + 3 * g, f + 4 * g)
        c_outs = (g, g, g, g, f)
        kernels, biases = [], []
        for i, (ci, co) in enumerate(zip(c_ins, c_outs), start=1):
            k, b = _Conv3x3Params(
                co, ci, self.init_scale, name=f"conv_layer{i}"
            )()
            kernels.append(k)
            biases.append(b)
        return kernels, biases


class ResInResDenseBlock(nn.Module):
    """3 chained dense blocks + scaled outer skip (reference srgan_train.py:364-404)."""

    features: int = 64
    growth: int = 32
    residual_scaling: float = 0.1
    init_scale: float = 0.1
    dtype: Any = None
    fused: str = "auto"
    mxu_bf16: bool = False
    resident_hw: tuple | None = None  # flat-resident mode (see ResidualDenseBlock)
    # whole-RRDB fused launch (ops.pallas_rdb.rrdb_fused_flat): the 3 dense
    # blocks + outer skip run as ONE kernel of three sequential passes over
    # HBM ping-pong buffers — same MACs/traffic, 1/3 the launch boundaries.
    # Only meaningful with resident_hw set.
    rrdb_fused: bool = False
    # single-sweep variant (VMEM-ring intermediates; see rrdb_sweep_flat);
    # takes precedence over rrdb_fused
    rrdb_sweep: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if (self.rrdb_fused or self.rrdb_sweep) and self.resident_hw is not None:
            from deepbedmap_tpu.ops.pallas_rdb import (
                rrdb_fused_flat,
                rrdb_sweep_flat,
            )

            kernels, biases = [], []
            for i in (1, 2, 3):
                k, b = _RDBParams(
                    self.features, self.growth, self.init_scale,
                    name=f"residual_dense_block{i}",
                )()
                kernels.append(k)
                biases.append(b)
            h, w = self.resident_hw
            fn = rrdb_sweep_flat if self.rrdb_sweep else rrdb_fused_flat
            return fn(
                x.astype(jnp.float32), kernels, biases,
                self.residual_scaling, h, w, 32, self.mxu_bf16,
            )

        a = x
        for i in (1, 2, 3):
            a = ResidualDenseBlock(
                self.features,
                self.growth,
                self.residual_scaling,
                self.init_scale,
                self.dtype,
                fused=self.fused,
                mxu_bf16=self.mxu_bf16,
                resident_hw=self.resident_hw,
                name=f"residual_dense_block{i}",
            )(a)
        # in resident mode this skip is elementwise on flat buffers whose
        # margins are zero on both sides, so the invariant is preserved
        return x + self.residual_scaling * a


class FusedConv3x3(nn.Module):
    """3x3 SAME conv with optional fused LeakyReLU / residual-add epilogues.

    Dispatches to the Pallas tail-conv kernel (``ops.pallas_conv``) on TPU
    inference-scale images — one MXU dot per row band instead of XLA's
    2-11 TFLOP/s conv at batch 1 / 64 channels — and to the identical XLA
    composition otherwise (training tiles, CPU, non-fp32 compute dtypes).
    Parameter tree ('kernel', 'bias') and initialisation match ``nn.Conv``
    exactly, so checkpoints and the Chainer weight shim are unaffected.
    Reference layers it serves: srgan_train.py:470-505.
    """

    features: int
    init_scale: float = 0.1
    dtype: Any = None
    leaky: bool = False
    fused: str = "auto"  # 'auto' | 'never' | 'always'
    mxu_bf16: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, residual: jax.Array | None = None) -> jax.Array:
        from deepbedmap_tpu.ops.pallas_conv import (
            conv3x3_fused,
            conv3x3_res_fused,
            should_fuse_conv,
        )

        kernel = self.param(
            "kernel", he_normal_chainer(self.init_scale), (3, 3, x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        use_fused = self.fused == "always" or (
            self.fused == "auto" and self.dtype is None and should_fuse_conv(x.shape)
        )
        if use_fused:
            if residual is None:
                return conv3x3_fused(
                    x.astype(jnp.float32), kernel, bias, self.leaky, self.mxu_bf16
                )
            return conv3x3_res_fused(
                x.astype(jnp.float32), kernel, bias,
                residual.astype(jnp.float32), self.leaky, self.mxu_bf16,
            )
        if self.dtype is not None:
            x, kernel, bias = (
                x.astype(self.dtype), kernel.astype(self.dtype), bias.astype(self.dtype)
            )
        z = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        if residual is not None:
            z = z + residual
        return leaky_relu(z) if self.leaky else z


class ConvHCW(nn.Module):
    """3x3 SAME conv whose OUTPUT is laid out channels-before-width
    (N, H, C, W) — emitted natively by the XLA conv (measured +0.3 ms at
    1144^2 x 64 vs NHWC), whereas a separate transpose of the same tensor
    costs ~10 ms. Feeding the deformable-conv row tiler in this layout makes
    its marshalling a pure pad + gather. Parameter tree ('kernel', 'bias')
    and initialisation match ``nn.Conv`` exactly, so checkpoints and the
    Chainer weight shim are layout-agnostic.
    """

    features: int
    init_scale: float = 0.1
    dtype: Any = None
    in_hcw: bool = False  # input is (N, H, C, W) instead of NHWC

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[2] if self.in_hcw else x.shape[3]
        kernel = self.param(
            "kernel", he_normal_chainer(self.init_scale), (3, 3, c_in, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHCW" if self.in_hcw else "NHWC", "HWIO", "NHCW")
        )
        out = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME", dimension_numbers=dn
        )
        return out + bias[None, None, :, None]


class DeformableConv(nn.Module):
    """Deformable conv layer = offset-predicting 3x3 conv + deformable sampler.

    Mirrors Chainer L.DeformableConvolution2D(k=3, s=1, p=1) with HeNormal(0.1)
    init on both the offset conv and the deform kernel (srgan_train.py:506-523).
    Offset layout is documented in ``ops.deform_conv``.
    """

    features: int
    init_scale: float = 0.1
    dtype: Any = None
    # max |offset| in px the sampler evaluates exactly (masked-shift span);
    # learned offsets sit well inside +/-1, so clamp=1 halves the sampler's
    # term count at identical outputs on trained models. clamp=2 is the
    # conservative default.
    clamp: int = 2
    # channels-before-width plumbing (see ConvHCW): 'in' means x arrives as
    # (N, H, C, W); 'out' means this layer emits (N, H, C, W). Both offset
    # conv and sampler then skip every transpose on the inference hot path.
    in_hcw: bool = False
    out_hcw: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = 9  # 3x3 kernel taps
        if self.in_hcw:
            offsets = ConvHCW(
                2 * k, self.init_scale, self.dtype, in_hcw=True,
                name="offset_conv",
            )(x)
            c_in = x.shape[2]
        else:
            offsets = nn.Conv(
                features=2 * k,
                kernel_size=(3, 3),
                padding="SAME",
                dtype=self.dtype,
                kernel_init=he_normal_chainer(self.init_scale),
                name="offset_conv",
            )(x)
            c_in = x.shape[3]
        weight = self.param(
            "kernel",
            he_normal_chainer(self.init_scale),
            (3, 3, c_in, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # sampling + kernel matmul run fp32 regardless of compute dtype
        return deform_conv2d(
            x.astype(jnp.float32), offsets.astype(jnp.float32), weight, bias,
            padding=1, clamp=self.clamp,
            in_hcw=self.in_hcw, out_hcw=self.out_hcw,
        )
