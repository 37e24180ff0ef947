"""Component-level TPU benchmarks (BASELINE.json configs breakdown).

Prints one JSON line per benchmark. Timing forces a per-iteration scalar
fetch (block_until_ready is unreliable through this image's TPU tunnel).

Configs covered (PROGRESS.jsonl):
1. single-tile generator forward (training shape, 11px lr)
2. data-prep tiling rate (selective_tile windows/s, host+CPU jit)
3. continent-tile generator forward (288px lr with halo -> 1000px out)
4. fused GAN train step (batch 128 reference shape)
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


def timeit_scalar(fn, args, iters=10):
    s = float(jnp.sum(fn(*args)))  # compile+warm
    start = time.perf_counter()
    for _ in range(iters):
        s = float(jnp.sum(fn(*args)))
    return (time.perf_counter() - start) / iters


def sync_overhead():
    x = jnp.ones((8, 8))
    return timeit_scalar(jax.jit(lambda a: a[:1, :1]), (x,))


def main():
    from deepbedmap_tpu.config import GeneratorConfig, TrainConfig
    from deepbedmap_tpu.data.dataset import TileDataset
    from deepbedmap_tpu.models import Discriminator, Generator, build_generator
    from deepbedmap_tpu.train import create_gan_state, make_train_step

    rs = np.random.RandomState(0)
    sync = sync_overhead()
    results = []

    model, params = build_generator(GeneratorConfig(), lr=11)
    fwd = jax.jit(lambda p, *a: model.apply({"params": p}, *a))

    # 1. single training tile
    args = (
        params,
        jnp.asarray(rs.rand(128, 11, 11, 1), jnp.float32),
        jnp.asarray(rs.rand(128, 110, 110, 1), jnp.float32),
        jnp.asarray(rs.rand(128, 22, 22, 2), jnp.float32),
        jnp.asarray(rs.rand(128, 11, 11, 1), jnp.float32),
    )
    t = timeit_scalar(fwd, args) - sync
    results.append(
        {"metric": "train_tile_forward_batch128", "value": round(t * 1e3, 2), "unit": "ms"}
    )

    # 3. continent tile
    args = (
        params,
        jnp.asarray(rs.rand(1, 288, 288, 1), jnp.float32),
        jnp.asarray(rs.rand(1, 2880, 2880, 1), jnp.float32),
        jnp.asarray(rs.rand(1, 576, 576, 2), jnp.float32),
        jnp.asarray(rs.rand(1, 288, 288, 1), jnp.float32),
    )
    t = timeit_scalar(fwd, args, iters=5) - sync
    results.append(
        {"metric": "continent_tile_forward", "value": round(t * 1e3, 1), "unit": "ms"}
    )
    results.append(
        {
            "metric": "continent_396_tiles_projected",
            "value": round(396 * t, 1),
            "unit": "s/chip",
        }
    )

    # 4. fused train step, reference batch 128
    g_cfg = GeneratorConfig()
    t_cfg = TrainConfig(batch_size=128)
    g_model, d_model = Generator(g_cfg), Discriminator()
    state = create_gan_state(g_cfg, t_cfg=t_cfg)
    step = jax.jit(make_train_step(g_model, d_model, t_cfg))
    dataset = TileDataset.synthetic(128, seed=0)
    batch = dataset.take(jnp.arange(128))

    def step_metric(state, batch):
        new_state, metrics = step(state, batch)
        return metrics.generator_loss

    # checksum over the UPDATED state so XLA cannot dead-code-eliminate the
    # parameter/optimizer updates (returning only the loss measured 35 ms —
    # a 4x underestimate vs the real epoch scan)
    def step_checksum(st, b):
        new_state, metrics = step(st, b)
        leaves = jax.tree_util.tree_leaves(new_state.g_params)
        return metrics.generator_loss + sum(jnp.sum(l[..., :1]) for l in leaves)

    f = jax.jit(step_checksum)
    s2 = state
    t = timeit_scalar(lambda b: f(s2, b), (batch,), iters=5) - sync
    results.append(
        {"metric": "fused_gan_train_step_batch128", "value": round(t * 1e3, 1), "unit": "ms"}
    )
    results.append(
        {"metric": "reference_epoch_projected", "value": round(28 * t, 2), "unit": "s (28 steps; see bench_training.py for the measured epoch)"}
    )

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
