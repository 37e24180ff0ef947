"""Training-throughput lever (VERDICT r4 item 4): device-batch scaling of
the fused D+G step.

The reference trains batch 128 of 11-px lr tiles; the analytic step FLOPs
(utils/flops.py:train_step_flops) put that at ~1.1 TFLOP/step, so any step
time above ~6 ms means the MXU is underfed (tiny spatial dims x tiny batch).
This sweep measures ms/step and samples/s at batch 128/256/512 of the SAME
fused step. If bigger batches are near-free, per-chip batch — not kernel
work — is the training-throughput lever: at reference semantics (global
batch 128) a data-parallel pod drops per-chip batch to 16 and pays this
curve in reverse, so the right pod recipe is batch-128 replicas with
independent seeds (HPO trials / ensembles) or a larger global batch where
the science allows it.

Env: BATCHES=128,256,512 STEPS=20
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from deepbedmap_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    from deepbedmap_tpu.config import GeneratorConfig, TrainConfig
    from deepbedmap_tpu.data.dataset import TileDataset
    from deepbedmap_tpu.models import Discriminator, Generator
    from deepbedmap_tpu.train import create_gan_state
    from deepbedmap_tpu.train.steps import make_train_step
    from deepbedmap_tpu.utils.flops import train_step_mfu

    batches = [int(b) for b in os.environ.get("BATCHES", "128,256,512").split(",")]
    n_steps = int(os.environ.get("STEPS", "20"))

    g_cfg = GeneratorConfig()  # flagship 12 RRDB
    g_model, d_model = Generator(g_cfg), Discriminator()

    for batch in batches:
        t_cfg = TrainConfig(batch_size=batch)
        state = create_gan_state(g_cfg, t_cfg=t_cfg)
        step = jax.jit(make_train_step(g_model, d_model, t_cfg))
        data = TileDataset.synthetic(batch, seed=0)
        tiles = {k: jnp.asarray(v) for k, v in data.take(
            jnp.arange(batch)
        ).items()}

        t0 = time.perf_counter()
        state, metrics = step(state, tiles)
        _ = float(metrics.generator_loss)
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step(state, tiles)
        _ = float(metrics.generator_loss)  # forces completion
        per_step = (time.perf_counter() - t0) / n_steps

        mfu = train_step_mfu(per_step, batch=batch)
        print(
            json.dumps(
                {
                    "batch": batch,
                    "ms_per_step": round(1e3 * per_step, 2),
                    "samples_per_s": round(batch / per_step, 1),
                    "compile_s": round(compile_s, 1),
                    "step_tflops": round(mfu["step_tflops"], 4),
                    "achieved_tflops": round(mfu["achieved_tflops"], 2),
                    "train_mfu": round(mfu["mfu"], 4),
                }
            ),
            flush=True,
        )
    print("DONE")


if __name__ == "__main__":
    main()
