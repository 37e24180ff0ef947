"""Reference-scale training benchmark: the exact training configuration of the
paper (3826 tiles, 95/5 split, batch 128, 12-RRDB generator, fused D+G step)
run for real on the attached TPU with synthetic data.

The reference trains ~150 epochs in ~30 min on a V100
(paper/tc-2020-74.tex:629-631) = ~12 s/epoch. Prints measured epoch times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json
import time

import jax

from deepbedmap_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()  # compiled executables persist across runs
import jax.numpy as jnp
import numpy as np


def main():
    from deepbedmap_tpu.config import GeneratorConfig, TrainConfig
    from deepbedmap_tpu.data.dataset import TileDataset, epoch_batches, train_dev_split
    from deepbedmap_tpu.models import Discriminator, Generator
    from deepbedmap_tpu.train import create_gan_state
    from deepbedmap_tpu.train.loop import make_epoch_fns

    g_cfg = GeneratorConfig()  # flagship 12 RRDB
    t_cfg = TrainConfig(batch_size=128)
    g_model, d_model = Generator(g_cfg), Discriminator()

    dataset = TileDataset.synthetic(3826, seed=0)  # reference tile count
    state = create_gan_state(g_cfg, t_cfg=t_cfg)
    train_idx, dev_idx = train_dev_split(len(dataset))
    train_fn, eval_fn = make_epoch_fns(g_model, d_model, dataset, t_cfg)
    rs = np.random.RandomState(42)

    # compile + warm epoch
    batches = jnp.asarray(epoch_batches(train_idx, 128, rs))
    t0 = time.perf_counter()
    state, metrics = train_fn(state, batches)
    _ = float(metrics.generator_loss[-1])
    compile_and_first = time.perf_counter() - t0

    epochs = 5
    times = []
    for _ in range(epochs):
        batches = jnp.asarray(epoch_batches(train_idx, 128, rs))
        t0 = time.perf_counter()
        state, metrics = train_fn(state, batches)
        g_loss = float(metrics.generator_loss[-1])  # forces completion
        times.append(time.perf_counter() - t0)
    assert np.isfinite(g_loss)

    per_epoch = float(np.median(times))
    # training-side MFU (VERDICT r4 item 4): analytic minimal FLOPs of the
    # fused D+G step (utils/flops.py:train_step_flops) vs the wall step time
    from deepbedmap_tpu.utils.flops import train_step_mfu

    n_steps = len(train_idx) // 128
    mfu = train_step_mfu(per_epoch / n_steps, batch=128)
    print(
        json.dumps(
            {
                "metric": "reference_scale_epoch",
                "value": round(per_epoch, 3),
                "unit": "s/epoch (3626-tile split, 28 steps of 128, D+G)",
                "compile_plus_first_epoch_s": round(compile_and_first, 1),
                "projected_140_epochs_min": round(140 * per_epoch / 60, 2),
                "reference_v100_min": 30,
                "ms_per_step": round(1e3 * per_epoch / n_steps, 2),
                "step_tflops": round(mfu["step_tflops"], 4),
                "achieved_tflops": round(mfu["achieved_tflops"], 2),
                "train_mfu_vs_197tflops_peak": round(mfu["mfu"], 4),
            }
        )
    )


if __name__ == "__main__":
    main()
