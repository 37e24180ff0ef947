"""Typed configuration for the whole framework.

The reference has no config system (SURVEY.md section 5.6): hyperparameters live in
Optuna trials, constants in notebook cells, and dataset descriptions in YAML/JSON.
Here one set of frozen dataclasses covers model / loss / train / inference; the data
manifests stay as data files (see ``deepbedmap_tpu.data.manifest``).

Reference hyperparameter sources:
- model: /root/reference/srgan_train.py:421-576 (generator), 591-699 (discriminator)
- loss weights: /root/reference/srgan_train.py:849-852
- optimized hyperparams: paper Table B1 — lr 1.7e-4, 12 RRDB, scaling 0.2, 140 epochs
- inference tiling: /root/reference/deepbedmap.py:689-736
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    """ESRGAN-style generator (reference srgan_train.py:421-576).

    The four input branches normalise heterogeneous-resolution rasters to a common
    latent grid with *valid* convolutions whose kernels are 3 km x 3 km with 1 km
    stride in projected coordinates (srgan_train.py:201-266).
    """

    num_residual_blocks: int = 12
    residual_scaling: float = 0.1
    out_channels: int = 1
    base_channels: int = 64  # trunk width
    growth_channels: int = 32  # dense-block growth
    inblock_channels: int = 32  # per-branch channels in the input block (4x32=128)
    scale: int = 4  # super-resolution upscale factor (2x nearest-neighbour, twice)
    # He-normal init std multiplier (Chainer HeNormal(scale=0.1), srgan_train.py:220)
    init_scale: float = 0.1
    # Conv compute dtype: 'float32' (reference parity AND the fast path) or
    # 'bfloat16' (params and residual/skip adds stay fp32). MEASURED (r4,
    # benchmarks/RESULTS.md precision policy): bf16 is a LOSS on the v5e
    # continent tile — 141.3 ms vs fp32's 115.0 (fused tail: 127.6 vs
    # 104.2) — because (a) XLA's default conv precision already feeds the
    # MXU single-pass bf16 multiplicands for fp32 data, so bf16 buys no
    # MXU time, and (b) the fused-RDB Pallas trunk is an fp32 kernel, so
    # bf16 falls back to the slower XLA trunk composition. It also costs
    # 6.3e-3 relative output error (~6 m at elevation scale). fp32 is the
    # production policy; the knob stays for parity experiments.
    compute_dtype: str = "float32"
    # Rematerialise each RRDB in the backward pass (jax.checkpoint on the scan
    # body): trades ~1 extra trunk forward for O(depth) less activation
    # memory — lets training batches grow well past the reference's 128.
    remat: bool = False
    # Fused dense-block Pallas kernel on TPU inference-scale images
    # (ops.pallas_rdb): 'auto' dispatches by backend/shape, 'never'/'always'
    # force the XLA composition or the fused kernel.
    fused_rdb: str = "auto"
    # bf16 dot MULTIPLICANDS inside the fused-RDB kernel, fp32 accumulation.
    # MEASURED (r4, RESULTS.md): output delta vs the fp32 kernel is EXACTLY
    # 0.0 on TPU at the dispatching shape — Mosaic's fp32 jnp.dot already
    # truncates multiplicands to bf16 single-pass, so this flag only halves
    # the operand bytes streamed to the MXU (−12.3 ms with the unfused
    # tail; 0.6–1.5 ms with the fused tail at batch 1). DEFAULT ON since
    # round 4: under the production batched dispatch (tiles_per_dispatch=2)
    # it is worth another ~0.9 s on the continent (41.0 -> 40.1 s,
    # bench_continent_r4j_tpd2_bf16.log) at zero quality cost (bit-exact,
    # bench_precision_delta.log). Inert off-TPU (the kernel only dispatches
    # at TPU inference scale).
    rdb_mxu_bf16: bool = True
    # Flat-resident trunk: flatten to the RDB kernel's padded row-band layout
    # ONCE before the RRDB scan, run all 36 fused-RDB launches flat -> flat
    # (band windows DMA'd inside the kernel, outputs masked back into the
    # resident buffer), unflatten once after. Targets the round-4 attribution
    # gap — in-model trunk 47.3 ms vs the standalone kernel's 27.1 at batch 2
    # (bench_ablate_r4m_b2attr.log): ~20 ms/forward of per-launch pad ->
    # overlapping-gather -> unpad glue XLA cannot fuse into the custom call.
    # 'auto' dispatches exactly where the fused RDB kernel would (TPU,
    # inference-scale, fp32); 'never' keeps the per-launch gather path;
    # 'always' forces it (tests / interpret mode). MEASURED (r4n session,
    # 2026-08-19): standalone trunk 45.5 -> 33.4 ms/tile, in-model
    # 95.53 -> 82.50 ms/dispatch at batch 2, continent 40.14 -> 34.75 s
    # (11.39 tiles/s on one chip), trunk parity bit-exact vs the banded
    # kernel -> production default 'auto'.
    rdb_resident: str = "auto"
    # Whole-RRDB fused launch on the resident layout: the 3 dense blocks +
    # outer skip of each RRDB run as ONE Pallas launch of three sequential
    # full-image passes over HBM ping-pong buffers (same MACs, same HBM
    # traffic — removes 2 of every 3 custom-call boundaries, 36 -> 12 per
    # forward). Targets the r4n residue: in-model trunk ~34 ms vs the
    # standalone kernel's 27 — launch sync at the 36 boundaries. Only active
    # when the resident trunk dispatches. Default decided by measurement
    # (round-5 session); see benchmarks/RESULTS.md.
    rrdb_fused: bool = False
    # whole-RRDB single-sweep launch (ops.pallas_rdb.rrdb_sweep_flat):
    # software-pipelined stages with VMEM-ring intermediates — 3 HBM image
    # transits per RRDB vs the 3-pass fused kernel's 7. Takes precedence
    # over rrdb_fused when both are set; opt-in by measurement.
    rrdb_sweep: bool = False
    # Fused 3x3-conv Pallas kernel (ops.pallas_conv) for the generator's
    # plain conv stages — pre/post-residual and both post-upsample convs —
    # with their LeakyReLU / long-skip epilogues fused into the kernel
    # epilogue. XLA runs these at 2-11 TFLOP/s effective on the v5e
    # continent tile (conv64@1144^2 8.9 ms, @572^2 3.8, @286^2 2.7 —
    # bench_tail_r3d.log) vs the ~36 TFLOP/s the RDB kernel reaches for the
    # same op class. 'auto' dispatches on TPU inference-scale images
    # (training tiles and CPU always take the XLA path), 'never' disables.
    fused_conv: str = "never"
    # bf16 dot multiplicands inside the fused conv kernel, fp32 accumulate —
    # the effective precision of the XLA convs this kernel replaces.
    conv_mxu_bf16: bool = False
    # Deformable-conv offset clamp in px (masked-shift span). Chainer's
    # sampler is unbounded; clamp=1 shrinks the sampler cost WHEN the
    # learned offsets stay inside +/-1 px. MEASURED on the rough-task
    # quality-run checkpoint (bench_precision_delta_r4k.log): they do NOT —
    # clamp=1 diverges by up to 986 m (RMSE delta 326 m), so it is a
    # per-checkpoint optimisation, NOT a safe default. Validate with
    # benchmarks/bench_precision_delta.py (clamp1 row) before switching.
    deform_clamp: int = 2
    # Channels-before-width (N, H, C, W) layout through the generator tail
    # (2nd upsample conv -> both deform layers): the deform row tiler then
    # needs no transposes (pad + gather only). Measured in-model at the
    # continent tile shape it is a 2.4 ms LOSS vs plain NHWC (115.9 vs
    # 113.4 ms, benchmarks/bench_ablate.py) — XLA materialises the same
    # physical shuffle either way, just inside the producing conv instead.
    # Kept as a tested option + recorded dead end; default off.
    tail_hcw: bool = False
    # Fuse BOTH deformable output layers into one tiled domain
    # (ops.pallas_tail): tile once, deform64 emits a halo'd tile with the
    # LeakyReLU fused in, the second offset conv / zproj projection run on
    # the tile batch, and only the final 1-channel output is untiled. Kills
    # the untile -> retile round trip between the layers (~25 ms of the
    # 116 ms continent-tile forward, benchmarks/RESULTS.md) at the price of
    # ~10% redundant halo compute. Parameter tree is identical to the
    # unfused layers, so checkpoints and the Chainer shim are unaffected.
    # Dispatches to the pure-XLA composition on CPU / small tiles. Under
    # compute_dtype='bfloat16' the fused path runs its offset convs at the
    # compute dtype too (matching the unfused DeformableConv's
    # nn.Conv(dtype=...)), so fused vs unfused stays apples-to-apples.
    # DEFAULT ON since round 4: measured in-model at the continent tile
    # shape 115.0 -> 104.2 ms, continent 48.0 -> 43.9 s/chip
    # (benchmarks/tpu_session_logs/bench_ablate_r4b_tail.log,
    # bench_continent_r4_fused.log). Training and CPU inference
    # automatically use the equivalent XLA composition (method='auto').
    tail_fused: bool = True
    # v4 tap-packed deform64 body inside the fused tail (one x slab + one
    # lane-concatenated dot per kernel row instead of one dot per tap) —
    # same numerics, 3x fewer MXU instructions; measured standalone it tied
    # v3, but in the fused-tail geometry it wins slightly (104.22 vs
    # 104.94 ms) — default on with the fused tail.
    tail_pack_taps: bool = True
    # Compute each nearest-upsample(2) -> 3x3 conv stage as ONE 2x2 conv at
    # SOURCE resolution over summed phase kernels (ops.phase_conv): exactly
    # the same function with 16/36 of the MACs, no materialised 4x fp32
    # intermediate (335 MB at the continent tile shape), and a 4F=256-wide
    # output channel dim that fills the 128-lane MXU where the literal
    # conv64 starves it. Parameter tree identical (phase kernels are derived
    # in-graph), so checkpoints/Chainer shim are unaffected; parity is to
    # fp32 round-off (taps summed in the kernel instead of the dot).
    # Default off until measured in-model on TPU (bench_ablate 'phase_up').
    upsample_phase_conv: bool = False

    @property
    def concat_channels(self) -> int:
        return 4 * self.inblock_channels


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    """VGG-style discriminator (reference srgan_train.py:591-699).

    conv0 keeps its bias; convs 1-9 are bias-free (the reference passes
    ``nobias=True`` positionally, srgan_train.py:626-634) and are followed by
    BatchNorm(eps=1e-5) + LeakyReLU(0.2). Head: flatten -> 100 -> 1, no sigmoid.
    """

    channels: Tuple[int, ...] = (64, 64, 128, 128, 128, 256, 256, 512, 512, 512)
    # kernel size / stride per conv layer 0..9
    kernels: Tuple[int, ...] = (3, 4, 3, 4, 3, 4, 3, 4, 3, 4)
    strides: Tuple[int, ...] = (1, 2, 1, 2, 1, 2, 1, 2, 1, 2)
    fc_units: int = 100
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9  # Chainer BatchNormalization decay default
    init_scale: float = 0.1


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Perceptual-loss weighting (reference srgan_train.py:849-852).

    The DEFAULTS are reference parity — including the reference's measured
    defect: its generator adversarial term is computed from DETACHED
    discriminator logits, so it carries no gradient and the generator is
    bit-identically trained by content+topographic+SSIM only
    (benchmarks/gan_health/summary.md Finding 1 — R_gan == R_noadv for all
    30 epochs). Keep the defaults when the goal is matching the reference's
    trajectory numerically.

    For production training where the GAN is supposed to DO something (the
    paper's own premise: hallucinate realistic bed roughness the low-res
    input cannot determine), use ``LossConfig.recommended()``: with a live
    adversarial term at weight ~0.5 + 100 m instance noise, the generator
    passes through a measured contested phase (D-accuracy 0.50-0.85) and
    keeps ~2x the roughness of the pointwise-only ablation at nearly
    unchanged RMSE (summary.md Findings 3-4, the 90-epoch U run; weight
    sweep: 0 -> rough 21.6 m, 0.5 -> 29.3, 2.0 -> 73.1 vs real 44.2)."""

    content_weight: float = 1e-2
    adversarial_weight: float = 2e-2
    topographic_weight: float = 2e-3
    structural_weight: float = 5.25
    ssim_window: int = 9
    # Reference quirk kept for parity: the generator's adversarial term is computed
    # against *detached* discriminator logits on fakes and literal ones for reals
    # (srgan_train.py:1229-1244), so it carries no gradient. Setting
    # differentiable_adversarial=True switches to true RaGAN generator loss.
    differentiable_adversarial: bool = False
    # Instance noise (Sonderby et al. 2017): Gaussian noise of this std added
    # to BOTH the real and fake patches the DISCRIMINATOR trains on, making
    # the real/fake distributions overlap so D cannot trivially win (the
    # reference's runs sit at D-accuracy ~1.0, an inert adversarial term —
    # see benchmarks/train_gan_health.py). 0 = off (reference parity). The
    # noise key derives from instance_noise_seed and state.step, so the
    # fused step stays a pure (state, batch) function.
    d_instance_noise: float = 0.0
    instance_noise_seed: int = 0
    # Annealed instance noise (the standard schedule): sigma decays as
    # d_instance_noise * 0.5 ** (step / half_life_steps), tracking the
    # generator's shrinking residual from above. Flat sigma either drowns
    # early training or is outgrown by D later (measured: flat sigma=50 m on
    # the quality-run task drops D-accuracy only at epoch 0 — conv layers
    # average white noise ~sqrt(taps) faster than the generator's spatially
    # correlated artifacts, so D recovers to ~1.0 by epoch 5). 0 = no decay.
    instance_noise_half_life_steps: float = 0.0

    @classmethod
    def recommended(cls, **overrides) -> "LossConfig":
        """The evidence-backed healthy-GAN recipe (class docstring): live
        adversarial gradient, weight 0.5, 100 m instance noise — the
        measured Finding-4 configuration that buys roughness realism.
        Reference parity is the plain ``LossConfig()`` defaults."""
        base = dict(
            differentiable_adversarial=True,
            adversarial_weight=0.5,
            d_instance_noise=100.0,
        )
        base.update(overrides)
        return cls(**base)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1.7e-4  # paper Table B1 optimum
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_eps: float = 1e-8  # srgan_train.py:1043 (code wins over paper's 0.1)
    batch_size: int = 128
    epochs: int = 140
    train_fraction: float = 0.95  # 95/5 split, srgan_train.py:135
    split_seed: int = 42
    seed: int = 42
    # Precision policy: params fp32, conv compute bf16 on TPU when enabled.
    compute_dtype: str = "float32"
    data_axis: str = "data"  # mesh axis name for batch sharding
    # --- training-quality extensions (off by default = reference parity) ---
    # 'constant' (reference: fixed Adam alpha) or 'cosine' decay to
    # lr * lr_final_scale over lr_total_steps with linear warmup.
    lr_schedule: str = "constant"
    lr_total_steps: int = 0
    lr_warmup_steps: int = 0
    lr_final_scale: float = 0.0
    # exponential moving average of generator params (0 = off); inference
    # from the EMA weights is the standard GAN variance-reduction trick the
    # reference never applied.
    ema_decay: float = 0.0
    # Two-time-scale update rule (Heusel et al. 2017, inverted): the
    # discriminator's Adam runs at learning_rate * d_lr_scale. 1.0 =
    # reference parity (one shared alpha, srgan_train.py:1043-1048); <1
    # slows D so it cannot saturate on tasks where real/fake separate
    # trivially (see benchmarks/train_gan_health.py).
    d_lr_scale: float = 1.0


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Halo'd tile-predict-stitch (reference deepbedmap.py:689-736).

    Output tiles of ``tile_out`` px are predicted from low-res crops extended by
    ``halo_lr + 1`` low-res pixels on each side; ``(halo_lr + 1) * scale`` output
    pixels are discarded at each edge when stitching, exactly reproducing the
    reference's crop arithmetic (deepbedmap.py:707-736).
    """

    tile_out: int = 1000  # output pixels per tile side (250 m px -> 250 km tiles)
    halo_lr: int = 18  # extra low-res input pixels at borders ("xtrapad")
    scale: int = 4
    tile_axis: str = "data"  # mesh axis to shard the tile grid over


@dataclasses.dataclass(frozen=True)
class TilingConfig:
    """Training-tile proposal (reference data_prep.py:501-572)."""

    tile_px: int = 36  # 36 px * 250 m = 9 km square tiles
    step_px: int = 3  # slide by 3 px = 750 m
    resolution: float = 250.0
    padding: float = 1000.0  # metres of context added to conditioning tiles
    gapfill_bed: float = -5000.0
    gapfill_vel: float = 0.0
    gapfill_accum: float = 0.0


DEFAULT_GENERATOR = GeneratorConfig()
DEFAULT_DISCRIMINATOR = DiscriminatorConfig()
DEFAULT_LOSS = LossConfig()
DEFAULT_TRAIN = TrainConfig()
DEFAULT_INFERENCE = InferenceConfig()
DEFAULT_TILING = TilingConfig()


def replace(cfg, **kwargs):
    """Functional update helper for any config dataclass."""
    return dataclasses.replace(cfg, **kwargs)
