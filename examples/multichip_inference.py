"""Multi-chip continent inference on a device mesh.

Demonstrates the production path on any mesh — here the 8-virtual-device CPU
mesh (so it runs anywhere); on a real v5e-8 drop the platform override and
the same code shards over the chips.

Run from the repo root: ``python examples/multichip_inference.py`` (~2 min).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # virtual mesh; remove on real TPU
jax.config.update("jax_num_cpu_devices", 8)

import time

import numpy as np

from deepbedmap_tpu.config import GeneratorConfig
from deepbedmap_tpu.inference import TilePlan
from deepbedmap_tpu.inference.continent import (
    predict_continent,
    predict_continent_sharded,
)
from deepbedmap_tpu.models import build_generator
from deepbedmap_tpu.parallel import make_mesh

t0 = time.time()


def log(msg):
    print(f"[{time.time()-t0:5.1f}s] {msg}", flush=True)


mesh = make_mesh(8)
log(f"mesh: {mesh.devices.shape} {mesh.axis_names} over {jax.devices()[:2]}...")

model, params = build_generator(GeneratorConfig(num_residual_blocks=1))


def forward_fn(x, w1, w2, w3):
    return model.apply({"params": params}, x, w1, w2, w3)


# a small continent stand-in: 4 bands x 8 tiles of 32 px
plan = TilePlan(out_h=4 * 32, out_w=8 * 32, tile_out=32, halo_lr=2)
rs = np.random.RandomState(0)
lh, lw = plan.lr_shape
inputs = {
    "X": rs.rand(1, lh, lw, 1).astype(np.float32),
    "W1": rs.rand(1, 10 * lh, 10 * lw, 1).astype(np.float32),
    "W2": rs.rand(1, 2 * lh, 2 * lw, 2).astype(np.float32),
    "W3": rs.rand(1, lh, lw, 1).astype(np.float32),
}
log(f"plan: {plan.grid} grid, {plan.num_tiles} tiles")

sharded = predict_continent_sharded(
    forward_fn, inputs, plan, mesh, progress=lambda b, g: log(f"band {b}/{g}")
)
log(f"sharded canvas {sharded.shape}")

single = predict_continent(forward_fn, inputs, plan)
err = float(np.abs(sharded - single).max())
log(f"single-device parity: max abs diff {err:.2e}")
assert err < 1e-4
log("OK — per-chip memory one band; tiles of each band in parallel over the mesh")
