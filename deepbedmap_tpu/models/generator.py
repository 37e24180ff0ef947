"""ESRGAN-style generator (reference GeneratorModel, srgan_train.py:421-576).

Fully convolutional and NHWC. For an (n, n) low-res bed tile (with its 1-px
context ring) the output is ((n-2)*4, (n-2)*4): the input block's valid convs
shave one low-res pixel per side, then two nearest-neighbour x2 upsamples give
the 4x super-resolution. Any window size flows through, which is what the
tiled continent-scale inference relies on (deepbedmap.py:373-378).

TPU notes: the RRDB trunk is an ``nn.scan`` — one compiled block body regardless
of depth (12 in the reference), with parameters stacked on a leading axis. This
keeps compile time flat in depth and makes the trunk a natural unit for
``jax.checkpoint`` rematerialisation during training.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from deepbedmap_tpu.config import GeneratorConfig
from deepbedmap_tpu.models.blocks import (
    ConvHCW,
    DeformableConv,
    FusedConv3x3,
    InputBlock,
    ResInResDenseBlock,
    he_normal_chainer,
    leaky_relu,
)
from deepbedmap_tpu.ops.pallas_rdb import flatten_rdb, should_fuse, unflatten_rdb
from deepbedmap_tpu.ops.pallas_tail import fused_deform_tail
from deepbedmap_tpu.ops.phase_conv import upsample2_conv3x3
from deepbedmap_tpu.ops.resize import nearest_upsample


class _ConvParams(nn.Module):
    """Declares an nn.Conv-shaped ('kernel', 'bias') param pair without the
    conv — the fused tail applies the arrays itself (ops.pallas_tail), but
    the tree must stay bit-identical to the unfused layers for checkpoint
    and Chainer-shim compatibility."""

    shape: tuple
    init_scale: float

    @nn.compact
    def __call__(self):
        k = self.param("kernel", he_normal_chainer(self.init_scale), self.shape)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return k, b


class _DeformLayerParams(nn.Module):
    """Param tree of one DeformableConv (offset_conv/{kernel,bias}, kernel,
    bias) — names, shapes and initialisers match ``models.blocks
    .DeformableConv`` exactly (per-param RNG streams derive from the path,
    so even init values are identical)."""

    c_in: int
    features: int
    init_scale: float

    @nn.compact
    def __call__(self):
        ok, ob = _ConvParams(
            (3, 3, self.c_in, 18), self.init_scale, name="offset_conv"
        )()
        w = self.param(
            "kernel",
            he_normal_chainer(self.init_scale),
            (3, 3, self.c_in, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return ok, ob, w, b


class _RRDBStep(nn.Module):
    """One scan step of the residual trunk."""

    features: int
    growth: int
    residual_scaling: float
    init_scale: float
    dtype: Any = None
    fused: str = "auto"
    mxu_bf16: bool = False
    resident_hw: tuple | None = None
    rrdb_fused: bool = False
    rrdb_sweep: bool = False

    @nn.compact
    def __call__(self, carry, _):
        out = ResInResDenseBlock(
            self.features,
            self.growth,
            self.residual_scaling,
            self.init_scale,
            self.dtype,
            fused=self.fused,
            mxu_bf16=self.mxu_bf16,
            resident_hw=self.resident_hw,
            rrdb_fused=self.rrdb_fused,
            rrdb_sweep=self.rrdb_sweep,
            name="block",
        )(carry)
        return out, None


class Generator(nn.Module):
    cfg: GeneratorConfig = GeneratorConfig()

    @nn.compact
    def __call__(self, x: jax.Array, w1: jax.Array, w2: jax.Array, w3: jax.Array):
        """NHWC inputs: x (N,h,w,1) bed, w1 (N,10h,10w,1) surface,
        w2 (N,2h,2w,2) velocity, w3 (N,h,w,1) accumulation."""
        cfg = self.cfg
        dtype = None if cfg.compute_dtype == "float32" else jnp.dtype(cfg.compute_dtype)

        def conv64(name, leaky=False):
            # param tree identical to nn.Conv; on TPU inference-scale images
            # the conv + its epilogue run as one Pallas row-band kernel
            return FusedConv3x3(
                cfg.base_channels,
                cfg.init_scale,
                dtype,
                leaky=leaky,
                fused=cfg.fused_conv,
                mxu_bf16=cfg.conv_mxu_bf16,
                name=name,
            )

        # 0: multi-branch input block, valid convs -> common latent grid
        a0 = InputBlock(
            cfg.inblock_channels, cfg.init_scale, dtype, name="input_block"
        )(x, w1, w2, w3)

        # 1: pre-residual conv
        a1 = conv64("pre_residual_conv_layer", leaky=True)(a0)

        # 2: RRDB trunk as a scan (reference repeats the block class N times,
        # srgan_train.py:475-477); optionally remat each block for training
        # memory (activation footprint becomes O(1) in depth).
        # rdb_resident: flatten ONCE to the kernel's row-band layout, run all
        # 36 RDB launches flat -> flat (in-kernel DMA, no per-launch XLA
        # gather glue), unflatten once after the scan (ops.pallas_rdb).
        resident = cfg.rdb_resident == "always" or (
            cfg.rdb_resident == "auto"
            and cfg.fused_rdb != "never"
            and dtype is None
            and should_fuse(a1.shape)
        )
        h_lat, w_lat = a1.shape[1], a1.shape[2]
        t_in = flatten_rdb(a1) if resident else a1
        step = nn.remat(_RRDBStep) if cfg.remat else _RRDBStep
        trunk = nn.scan(
            step,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_residual_blocks,
        )(
            cfg.base_channels,
            cfg.growth_channels,
            cfg.residual_scaling,
            cfg.init_scale,
            dtype,
            cfg.fused_rdb,
            cfg.rdb_mxu_bf16,
            (h_lat, w_lat) if resident else None,
            cfg.rrdb_fused and resident,
            cfg.rrdb_sweep and resident,
            name="residual_network",
        )
        t_out, _ = trunk(t_in, None)
        a2 = (
            unflatten_rdb(t_out, h_lat, w_lat, features=a1.shape[-1])
            if resident else t_out
        )

        # 3: post-residual conv + long skip (fused into the conv epilogue)
        a3 = conv64("post_residual_conv_layer")(a2, residual=a1)

        # 4: two nearest-neighbour x2 upsample + conv stages. With
        # upsample_phase_conv each stage runs as ONE 2x2 conv at SOURCE
        # resolution over summed phase kernels — same function, 16/36 the
        # MACs, no materialised 4x intermediate (ops.phase_conv; parameter
        # tree identical). With tail_hcw the SECOND stage's conv emits
        # channels-before-width (N, H, C, W) and the deform layers' row
        # tilers then need no transposes — but measured in-model this is a
        # small LOSS (config.py tail_hcw note), so the flag defaults off.
        if cfg.upsample_phase_conv:
            assert not cfg.tail_hcw, (
                "upsample_phase_conv and tail_hcw are exclusive"
            )
            c = cfg.base_channels

            def phase_up(name, src):
                k, b = _ConvParams((3, 3, c, c), cfg.init_scale, name=name)()
                if dtype is not None:
                    src, k, b = src.astype(dtype), k.astype(dtype), b.astype(dtype)
                return upsample2_conv3x3(src, k, b, leaky=True)

            a4 = phase_up("post_upsample_conv_layer_1", a3)
            a4 = phase_up("post_upsample_conv_layer_2", a4)
        else:
            a4 = conv64("post_upsample_conv_layer_1", leaky=True)(
                nearest_upsample(a3, 2)
            )
            a4 = nearest_upsample(a4, 2)
            if cfg.tail_hcw:
                a4 = leaky_relu(
                    ConvHCW(
                        cfg.base_channels, cfg.init_scale, dtype,
                        name="post_upsample_conv_layer_2",
                    )(a4)
                )
            else:
                a4 = conv64("post_upsample_conv_layer_2", leaky=True)(a4)

        # 5: two deformable convolution output layers (fp32 internally).
        # tail_fused runs both in one tiled domain (ops.pallas_tail) with an
        # identical parameter tree; reference layers: srgan_train.py:506-523.
        if cfg.tail_fused:
            assert not cfg.tail_hcw, "tail_fused and tail_hcw are exclusive"
            assert cfg.out_channels == 1, "fused tail requires out_channels=1"
            p1 = _DeformLayerParams(
                cfg.base_channels, cfg.base_channels, cfg.init_scale,
                name="final_conv_layer1",
            )()
            p2 = _DeformLayerParams(
                cfg.base_channels, cfg.out_channels, cfg.init_scale,
                name="final_conv_layer2",
            )()
            return fused_deform_tail(
                a4, *p1, *p2, clamp=cfg.deform_clamp,
                pack_taps=cfg.tail_pack_taps,
                compute_dtype=cfg.compute_dtype,
            )
        a5 = leaky_relu(
            DeformableConv(
                cfg.base_channels, cfg.init_scale, dtype,
                clamp=cfg.deform_clamp, name="final_conv_layer1",
                in_hcw=cfg.tail_hcw, out_hcw=cfg.tail_hcw,
            )(a4)
        )
        return DeformableConv(
            cfg.out_channels, cfg.init_scale, dtype,
            clamp=cfg.deform_clamp, name="final_conv_layer2",
            in_hcw=cfg.tail_hcw,
        )(a5)
