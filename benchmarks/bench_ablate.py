"""In-model component attribution by ablation (the robust way).

Per-stage scan harnesses measure components in isolation where XLA hoists,
fuses or DCEs differently than in the real model (several round-3 probes
were invalidated this way: a sum() consumer lets XLA drop transposes and
requested conv layouts entirely). Here every number is a DIFFERENCE of two
full-model forward timings at the continent tile shape, so whatever XLA
does, it does inside a real generator:

  full            — the production model (GeneratorConfig())
  no_deform       — both deformable layers swapped for plain 3x3 convs
                    (offset conv kept so only the sampler+marshalling differ)
  trunk_12        — 12 RRDBs instead of cfg default (scales trunk term)
  tail_nhwc       — tail_hcw=False (plain NHWC reference tail layout)

Run detached (never timeout-kill a TPU compile):
  setsid nohup python benchmarks/bench_ablate.py > /tmp/bench_ablate.log 2>&1 &
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from deepbedmap_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()  # compiled executables persist across runs

if os.environ.get("CPU") == "1":  # harness smoke test
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

FWD_REPS = int(os.environ.get("REPS", "3"))
LAT = int(os.environ.get("LAT", "286"))
# tiles per dispatch: BATCH>1 stacks independent tiles on the batch dim and
# reports PER-TILE ms — measures whether batch-1's MXU under-utilisation in
# the XLA conv stages (2-11 TFLOP/s, bench_tail_r3d.log) amortises away
BATCH = int(os.environ.get("BATCH", "1"))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def bench_forward(model, params, xs):
    """Device-side unrolled repetition (scan-around-pallas is the known
    compile pathology); input perturbed per rep to defeat CSE."""

    @jax.jit
    def run(x_):
        acc = jnp.float32(0.0)
        for i in range(FWD_REPS):
            acc = acc + jnp.sum(
                model.apply({"params": params}, x_ * (1.0 + 1e-6 * i), *xs[1:])
            )
        return acc

    @jax.jit
    def base(x_):
        acc = jnp.float32(0.0)
        for i in range(FWD_REPS):
            acc = acc + jnp.sum(x_[:1, :1, :1, :1] * (1.0 + 1e-6 * i))
        return acc

    for f in (run, base):
        float(f(xs[0]))
    t0 = time.perf_counter()
    float(run(xs[0]))
    t_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(base(xs[0]))
    t_base = time.perf_counter() - t0
    return (t_run - t_base) / (FWD_REPS * BATCH) * 1e3


def _ablated_generator(cfg):
    """Generator with both deformable output layers swapped for plain 3x3
    convs — everything else (input block, trunk, upsample convs) identical,
    so full - this = the in-model cost of the two deformable layers
    (offset convs + samplers + their marshalling)."""
    from flax import linen as nn

    from deepbedmap_tpu.config import GeneratorConfig
    from deepbedmap_tpu.models.blocks import (
        InputBlock,
        he_normal_chainer,
        leaky_relu,
    )
    from deepbedmap_tpu.models.generator import _RRDBStep
    from deepbedmap_tpu.ops.resize import nearest_upsample

    class Ablated(nn.Module):
        cfg: GeneratorConfig

        @nn.compact
        def __call__(self, x, w1, w2, w3):
            cfg = self.cfg

            def conv(name, feats):
                return nn.Conv(
                    features=feats, kernel_size=(3, 3), padding="SAME",
                    kernel_init=he_normal_chainer(cfg.init_scale), name=name,
                )

            a0 = InputBlock(
                cfg.inblock_channels, cfg.init_scale, None, name="input_block"
            )(x, w1, w2, w3)
            a1 = leaky_relu(conv("pre_residual_conv_layer", cfg.base_channels)(a0))
            trunk = nn.scan(
                _RRDBStep,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.num_residual_blocks,
            )(
                cfg.base_channels, cfg.growth_channels, cfg.residual_scaling,
                cfg.init_scale, None, cfg.fused_rdb, name="residual_network",
            )
            a2, _ = trunk(a1, None)
            a3 = conv("post_residual_conv_layer", cfg.base_channels)(a2) + a1
            a4 = a3
            for i in (1, 2):
                a4 = nearest_upsample(a4, 2)
                a4 = leaky_relu(
                    conv(f"post_upsample_conv_layer_{i}", cfg.base_channels)(a4)
                )
            a5 = leaky_relu(conv("final_conv_layer1", cfg.base_channels)(a4))
            return conv("final_conv_layer2", cfg.out_channels)(a5)

    return Ablated(cfg)


def main():
    from deepbedmap_tpu.config import GeneratorConfig
    from deepbedmap_tpu.models import build_generator
    from deepbedmap_tpu.models.api import example_inputs_nhwc

    log(f"devices: {jax.devices()}  LAT={LAT} reps={FWD_REPS} batch={BATCH}")
    rs = np.random.RandomState(0)
    xs = (
        jnp.asarray(rs.rand(BATCH, LAT + 2, LAT + 2, 1), jnp.float32),
        jnp.asarray(
            rs.rand(BATCH, 10 * (LAT + 2), 10 * (LAT + 2), 1), jnp.float32
        ),
        jnp.asarray(rs.rand(BATCH, 2 * (LAT + 2), 2 * (LAT + 2), 2), jnp.float32),
        jnp.asarray(rs.rand(BATCH, LAT + 2, LAT + 2, 1), jnp.float32),
    )

    # every variant sets its tail flags EXPLICITLY (the production default
    # flipped to fused+packed in round 4, so bare GeneratorConfig() moves)
    variants = {
        "full": GeneratorConfig(),  # production default (fused+packed tail)
        "tail_unfused": GeneratorConfig(
            tail_fused=False, tail_pack_taps=False
        ),
        "tail_nhwc": GeneratorConfig(
            tail_hcw=False, tail_fused=False, tail_pack_taps=False
        ),
        # both deform layers fused in one tiled domain (ops.pallas_tail)
        "tail_fused": GeneratorConfig(tail_fused=True, tail_pack_taps=False),
        # fused tail with the v4 tap-packed deform64 body
        "tail_fused_packed": GeneratorConfig(
            tail_fused=True, tail_pack_taps=True
        ),
        # bf16 conv compute (params fp32, samplers fp32; config.py policy)
        "bf16": GeneratorConfig(
            compute_dtype="bfloat16", tail_fused=False, tail_pack_taps=False
        ),
        "bf16_tail_fused": GeneratorConfig(
            compute_dtype="bfloat16", tail_fused=True, tail_pack_taps=False
        ),
        # bf16 dot multiplicands INSIDE the fused-RDB kernel (fp32
        # accumulate, fp32 activations everywhere — not the same thing as
        # compute_dtype=bfloat16, which disables the kernel entirely)
        "rdb_bf16mxu": GeneratorConfig(
            rdb_mxu_bf16=True, tail_fused=False, tail_pack_taps=False
        ),
        "rdb_bf16mxu_tail_fused": GeneratorConfig(
            rdb_mxu_bf16=True, tail_fused=True, tail_pack_taps=True
        ),
        # half-depth trunk: (full - trunk_6) / 6 = ms per RRDB in-model
        "trunk_6": GeneratorConfig(num_residual_blocks=6),
        # Pallas tail-conv kernel (ops.pallas_conv) on the four plain conv64
        # stages, epilogues fused; vs 'full' = the conv-kernel in-model delta
        "conv_fused": GeneratorConfig(fused_conv="auto"),
        # + bf16 dot multiplicands in the conv kernel (the effective
        # precision of the XLA convs it replaces)
        "conv_fused_bf16mxu": GeneratorConfig(
            fused_conv="auto", conv_mxu_bf16=True
        ),
        # every Pallas lever at once: fused trunk (bf16 multiplicands),
        # fused convs (bf16 multiplicands), fused packed deform tail
        "all_pallas_bf16mxu": GeneratorConfig(
            fused_conv="auto", conv_mxu_bf16=True, rdb_mxu_bf16=True
        ),
        # both upsample->conv stages as 2x2 phase convs at source resolution
        # (ops.phase_conv: same function, 16/36 the MACs, no materialised 4x
        # intermediate); vs 'full' = the phase-decomposition in-model delta
        "phase_up": GeneratorConfig(upsample_phase_conv=True),
        "phase_up_rdb_bf16mxu": GeneratorConfig(
            upsample_phase_conv=True, rdb_mxu_bf16=True
        ),
        # flat-resident trunk: one flatten before the RRDB scan, all 36 RDB
        # launches flat -> flat with in-kernel DMA windows (no per-launch XLA
        # gather glue), one unflatten after; vs 'full' = the trunk-glue delta
        # (round-4 attribution priced it ~20 ms at batch 2)
        "rdb_resident": GeneratorConfig(rdb_resident="auto"),
        # whole-RRDB fused launch (round 5): 3 sequential passes + outer
        # skip per kernel — same MACs/HBM traffic as rdb_resident, 12
        # custom-call boundaries instead of 36; vs 'rdb_resident' = the
        # residual launch-sync cost (r4n put it at ~7 ms/forward)
        "rrdb_fused": GeneratorConfig(rdb_resident="auto", rrdb_fused=True),
        # deform offset clamp 1 px (vs default 2): smaller masked-shift span
        # in both deform kernels; valid whenever the checkpoint's offsets
        # stay within +/-1 px (bench_precision_delta.py validates that)
        "clamp1": GeneratorConfig(deform_clamp=1),
        "everything": GeneratorConfig(
            upsample_phase_conv=True, rdb_mxu_bf16=True, deform_clamp=1
        ),
    }
    only = os.environ.get("ONLY")
    if only:
        keep = only.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}
    results = {}
    for name, cfg in variants.items():
        log(f"compiling {name} (~2-6 min)...")
        model, params = build_generator(cfg, lr=11)
        ms = bench_forward(model, params, xs)
        results[name] = round(ms, 2)
        log(f"{name}: {ms:.2f} ms")

    if not only or "no_deform" in (only or "").split(","):
        log("compiling no_deform (~2-6 min)...")
        model = _ablated_generator(GeneratorConfig())
        params = model.init(jax.random.PRNGKey(0), *example_inputs_nhwc(1, 11))[
            "params"
        ]
        ms = bench_forward(model, params, xs)
        results["no_deform"] = round(ms, 2)
        log(f"no_deform: {ms:.2f} ms")

    n_full = GeneratorConfig().num_residual_blocks
    if "tail_fused" in results and "full" in results:
        log(
            f"fused tail in-model delta: "
            f"{results['full'] - results['tail_fused']:+.1f} ms"
        )
    if "trunk_6" in results and "full" in results and n_full != 6:
        per_block = (results["full"] - results["trunk_6"]) / (n_full - 6)
        log(
            f"in-model trunk: {per_block * n_full:.1f} ms "
            f"({per_block:.2f} ms/RRDB x {n_full})"
        )
    if "no_deform" in results and "full" in results:
        log(f"in-model deform total: {results['full'] - results['no_deform']:.1f} ms")
    print(json.dumps(results))
    log("DONE")


if __name__ == "__main__":
    main()
