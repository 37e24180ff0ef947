"""Benchmark: super-resolution tile throughput on the continent workload.

Measures tiles/sec of the flagship 12-RRDB generator on continent-sized tile
crops (288 low-res px with halo -> 1000 output px after halo discard, exactly
the whole-Antarctica tiling of deepbedmap.py:691-736) on the available device
(real TPU under the driver; CPU when forced).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference publishes no tile throughput (SURVEY.md section 6),
so the denominator is the BASELINE.json north star itself — whole-Antarctica
(396 tiles, deepbedmap.py:691-736) in <60 s on a v5e-8, i.e. 396/60/8 = 0.825
tiles/s/chip required. vs_baseline > 8 therefore means ONE chip beats the
whole 8-chip target (measured end-to-end: 56.2 s on one v5e,
benchmarks/bench_continent.py).
"""

from __future__ import annotations

import json
import time

import jax

from deepbedmap_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()  # compiled executables persist across runs
import jax.numpy as jnp
import numpy as np

NORTH_STAR_TILES_PER_SEC_PER_CHIP = 396.0 / 60.0 / 8  # <60 s on v5e-8 (BASELINE.json)


def build_tile_inputs(crop_lr: int = 288, batch: int = 1, seed: int = 0):
    rs = np.random.RandomState(seed)
    return (
        jnp.asarray(rs.rand(batch, crop_lr, crop_lr, 1), jnp.float32),
        jnp.asarray(rs.rand(batch, 10 * crop_lr, 10 * crop_lr, 1), jnp.float32),
        jnp.asarray(rs.rand(batch, 2 * crop_lr, 2 * crop_lr, 2), jnp.float32),
        jnp.asarray(rs.rand(batch, crop_lr, crop_lr, 1), jnp.float32),
    )


def main() -> None:
    import os

    from deepbedmap_tpu.config import GeneratorConfig
    from deepbedmap_tpu.models import build_generator

    # variant sweeps for measurement sessions (defaults = the shipped config):
    # TAIL_FUSED=0/1, PACK_TAPS=0/1, DTYPE=float32/bfloat16, BATCH=n
    # (tiles stacked per dispatch, reported PER TILE — mirrors the production
    # continent path's tiles_per_dispatch)
    batch = int(os.environ.get("BATCH", "2"))
    cfg = GeneratorConfig()
    cfg = GeneratorConfig(
        tail_fused=os.environ.get("TAIL_FUSED", "1" if cfg.tail_fused else "0") == "1",
        tail_pack_taps=os.environ.get(
            "PACK_TAPS", "1" if cfg.tail_pack_taps else "0") == "1",
        compute_dtype=os.environ.get("DTYPE", cfg.compute_dtype),
        rdb_mxu_bf16=os.environ.get(
            "RDB_BF16", "1" if cfg.rdb_mxu_bf16 else "0") == "1",
        upsample_phase_conv=os.environ.get(
            "PHASE_UP", "1" if cfg.upsample_phase_conv else "0") == "1",
        rdb_resident=os.environ.get("RDB_RESIDENT", cfg.rdb_resident),
        rrdb_fused=os.environ.get(
            "RRDB_FUSED", "1" if cfg.rrdb_fused else "0") == "1",
        rrdb_sweep=os.environ.get(
            "RRDB_SWEEP", "1" if cfg.rrdb_sweep else "0") == "1",
    )
    model, params = build_generator(cfg, lr=11)

    @jax.jit
    def forward(params, x, w1, w2, w3):
        return model.apply({"params": params}, x, w1, w2, w3)

    crop_lr = 288
    inputs = build_tile_inputs(crop_lr, batch=batch)

    # Timing note: on this image's tunneled TPU backend block_until_ready()
    # does not reliably block, so each iteration is synchronised by forcing a
    # scalar reduction to host; the measured RTT of a no-op scalar fetch is
    # subtracted.
    # Device-side repetition: the tunnel's per-dispatch RTT varies by tens of
    # ms run-to-run, so each measurement runs REPS forwards inside one
    # dispatch (inputs perturbed per step to defeat CSE) and the residual
    # single-RTT is subtracted once per dispatch. Unrolled, not lax.scan:
    # wrapping the fused-RDB pallas kernel in a scan stalls this image's
    # remote Mosaic compile ~16 min (measured); unrolled x4 compiles in ~6.
    REPS = 4

    @jax.jit
    def forward_many(params, x, w1, w2, w3):
        acc = 0.0
        for i in range(REPS):
            acc = acc + jnp.sum(forward(params, x * (1.0 + 1e-6 * i), w1, w2, w3))
        return acc

    @jax.jit
    def noop(x):
        return jnp.sum(x[:1, :1, :1, :1])

    float(forward_many(params, *inputs))  # compile + warmup
    float(noop(inputs[0]))

    def timed(fn, args, iters):
        ts = []
        for _ in range(iters):
            start = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - start)
        ts.sort()
        return ts[len(ts) // 2]  # median dispatch

    iters = 9
    sync_overhead = timed(noop, (inputs[0],), iters)
    per_tile = (
        timed(forward_many, (params,) + inputs, iters) - sync_overhead
    ) / (REPS * batch)
    tiles_per_sec = 1.0 / max(per_tile, 1e-9)

    # honest MFU: analytic minimal FLOPs (utils/flops.py — Pallas kernels
    # are invisible to XLA cost analysis, and tiled halo redundancy must
    # not be credited) over the v5e 197 TFLOP/s bf16 peak
    from deepbedmap_tpu.utils.flops import generator_mfu

    mfu = generator_mfu(per_tile, cfg, lr=crop_lr)

    result = {
        "metric": "sr_tiles_per_sec_per_chip",
        "value": round(tiles_per_sec, 3),
        "unit": "288px-lr continent tiles/s/chip",
        "vs_baseline": round(tiles_per_sec / NORTH_STAR_TILES_PER_SEC_PER_CHIP, 3),
        "achieved_tflops": round(mfu["achieved_tflops"], 2),
        "mfu_vs_197tflops_bf16_peak": round(mfu["mfu"], 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
