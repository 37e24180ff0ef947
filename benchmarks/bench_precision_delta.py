"""bf16-vs-fp32 output delta in METRES on a trained generator (VERDICT r4
item 3c — the quality half of the precision policy, measured on trained
weights rather than random init).

Loads the reference-scale quality run's checkpoint
(model/logs/quality_run/checkpoint, produced by train_quality_run.py),
runs the fixed-test-area forward under fp32 and under
compute_dtype='bfloat16' (same params — the policy keeps params fp32), and
reports the elevation-space deltas plus the RMSE each achieves against the
run's own synthetic truth. Also rehearses the verify-weights contract: the
bf16 max-abs-err is what `verify-weights --atol` would see if the artifact
were verified under a bf16 policy.

Run (TPU or CPU; the 36-px test tile is small):
  python benchmarks/bench_precision_delta.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from deepbedmap_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

if os.environ.get("CPU") == "1":  # JAX_PLATFORMS is ignored on this image
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

RUN_DIR = os.path.join(
    os.path.dirname(__file__), "..", "model", "logs",
    # default to the fp32 reference-recipe run (train_quality_run.py names
    # its run dir quality_run_{TASK}_{RECIPE}[_{DTYPE}])
    os.environ.get("RUN", "quality_run_rough_reference"),
)


def main():
    from deepbedmap_tpu.config import GeneratorConfig, TrainConfig, replace
    from deepbedmap_tpu.models import Generator
    from deepbedmap_tpu.train import create_gan_state
    from deepbedmap_tpu.train.checkpoint import restore_checkpoint

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train_quality_run import RES, build_synthetic_sr_dataset

    ckpt = os.path.abspath(os.path.join(RUN_DIR, "checkpoint"))
    assert os.path.exists(ckpt), (
        f"no checkpoint at {ckpt} — run benchmarks/train_quality_run.py first"
    )

    # the fp32 BASELINE pins every precision lever off explicitly — the
    # production defaults moved during round 4 (rdb_mxu_bf16 now on), and
    # the deltas below are defined against the pure-fp32 kernel
    g_cfg = GeneratorConfig(rdb_mxu_bf16=False)
    state = restore_checkpoint(ckpt, create_gan_state(g_cfg, t_cfg=TrainConfig()))
    params = state.g_params

    # the run's own fixed test tile + truth (same construction as the run)
    _, arrays = build_synthetic_sr_dataset(
        int(os.environ.get("TILES", "3826")), seed=0
    )
    from deepbedmap_tpu.data.dataset import train_dev_split

    _, dev_idx = train_dev_split(len(arrays["X"]))
    t = int(dev_idx[0])
    xs = tuple(
        jnp.asarray(arrays[k][t : t + 1].transpose(0, 2, 3, 1))
        for k in ("X", "W1", "W2", "W3")
    )
    truth = arrays["Y"][t, 0]

    outs = {}
    variants = (
        ("fp32", g_cfg),
        ("bf16", replace(g_cfg, compute_dtype="bfloat16")),
        # bf16 dot multiplicands INSIDE the fused-RDB trunk kernel, fp32
        # accumulate + fp32 activations (see RESULTS.md rdb_mxu_bf16); only
        # distinct from fp32 where the Pallas trunk actually runs (TPU).
        ("rdb_mxu_bf16", replace(g_cfg, rdb_mxu_bf16=True)),
        # phase-decomposed upsample convs (ops.phase_conv): same function,
        # taps summed in the kernel instead of the dot — delta is pure fp32
        # round-off and should be ~cm at elevation scale
        ("phase_up", replace(g_cfg, upsample_phase_conv=True)),
        # deform offset clamp 1 vs the default 2: identical outputs IFF the
        # trained offsets stay within +/-1 px (config.py deform_clamp note —
        # this is the per-checkpoint validation it asks for)
        ("clamp1", replace(g_cfg, deform_clamp=1)),
    )
    for name, cfg in variants:
        model = Generator(cfg)
        pred = np.asarray(
            jax.jit(lambda p, a: model.apply({"params": p}, *a))(params, xs)
        )[0, :, :, 0].astype(np.float32)
        outs[name] = pred

    rmse = lambda a: float(np.sqrt(np.mean((a - truth) ** 2)))  # noqa: E731
    rec = {
        "metric": "precision_vs_fp32_trained_forward_delta",
        "rmse_fp32_m": round(rmse(outs["fp32"]), 4),
        "backend": jax.default_backend(),
    }
    for name in ("bf16", "rdb_mxu_bf16", "phase_up", "clamp1"):
        d = outs[name] - outs["fp32"]
        rec[f"{name}_max_abs_m"] = round(float(np.abs(d).max()), 4)
        rec[f"{name}_rmse_delta_m"] = round(float(np.sqrt(np.mean(d**2))), 4)
        rec[f"rmse_{name}_m"] = round(rmse(outs[name]), 4)
    print(json.dumps(rec))

    # --- part 2: continent-tile shape (the Pallas trunk only dispatches at
    # inference scale, >=256^2 on TPU — should_fuse), same trained params
    # (the model is fully convolutional). White-noise X at the training
    # elevation scale, zero conditioning rasters like the training task.
    if jax.default_backend() != "tpu":
        print(json.dumps({"metric": "trunk_kernel_delta", "skipped": "needs TPU"}))
        return
    # latent 286 is the real continent-tile geometry AND satisfies the
    # trunk kernel's (w+2) % 8 == 0 pitch rule — at other widths the fused
    # trunk silently falls back to XLA and the rdb_mxu_bf16 delta reads a
    # vacuous 0.0 (first measured exactly that way at LAT=288)
    lat = int(os.environ.get("LAT", "286"))
    rs = np.random.RandomState(1)
    big = (
        jnp.asarray((rs.rand(1, lat + 2, lat + 2, 1) - 0.5) * 1600, jnp.float32),
        jnp.zeros((1, 10 * (lat + 2), 10 * (lat + 2), 1), jnp.float32),
        jnp.zeros((1, 2 * (lat + 2), 2 * (lat + 2), 2), jnp.float32),
        jnp.zeros((1, lat + 2, lat + 2, 1), jnp.float32),
    )
    big_outs = {}
    for name, cfg in variants:
        model = Generator(cfg)
        big_outs[name] = np.asarray(
            jax.jit(lambda p, a: model.apply({"params": p}, *a))(params, big)
        )[0, :, :, 0].astype(np.float32)
    rec2 = {"metric": "trunk_kernel_delta_continent_tile", "lat": lat}
    for name in ("bf16", "rdb_mxu_bf16", "phase_up", "clamp1"):
        d = big_outs[name] - big_outs["fp32"]
        rec2[f"{name}_max_abs_m"] = round(float(np.abs(d).max()), 4)
        rec2[f"{name}_rmse_delta_m"] = round(float(np.sqrt(np.mean(d**2))), 4)
    print(json.dumps(rec2))


if __name__ == "__main__":
    main()
