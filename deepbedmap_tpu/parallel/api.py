"""Sharded training and inference entry points.

Training: the fused D+G step (train.steps) jitted with the batch dict sharded
on its leading axis and state replicated. GSPMD turns the batch-mean reductions
(losses, BatchNorm statistics) into ICI collectives, so the math — including
cross-device synchronised BN, which the single-device reference trivially has —
is *global-batch* exact, and parameter updates are replicated-consistent.

Inference: the tile grid is flattened, padded to a multiple of the mesh size,
and sharded on the tile axis; every device scans its own tiles against the
replicated (region-scale) input rasters. ``stitch_tiles`` reassembles the
canvas with pure reshapes/transposes, which GSPMD handles on sharded inputs.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from deepbedmap_tpu.config import LossConfig, TrainConfig
from deepbedmap_tpu.inference.engine import (
    TilePlan,
    make_tile_forward,
    make_tile_group_forward,
    pad_inputs,
)
from deepbedmap_tpu.models.discriminator import Discriminator
from deepbedmap_tpu.models.generator import Generator
from deepbedmap_tpu.parallel.mesh import batch_sharding, replicated
from deepbedmap_tpu.train.steps import make_train_step


def make_sharded_train_step(
    mesh: Mesh,
    g_model: Generator,
    d_model: Discriminator,
    t_cfg: TrainConfig = TrainConfig(),
    loss_cfg: LossConfig = LossConfig(),
):
    """jit the fused train step with batch sharded / state replicated."""
    step = make_train_step(g_model, d_model, t_cfg, loss_cfg)
    data = batch_sharding(mesh, t_cfg.data_axis)
    repl = replicated(mesh)
    batch_shardings = {k: data for k in ("X", "W1", "W2", "W3", "Y")}
    return jax.jit(
        step,
        in_shardings=(repl, batch_shardings),
        out_shardings=(repl, repl),
        donate_argnums=0,
    )


def sharded_predict_tiles(
    forward_fn: Callable[..., jax.Array],
    inputs: Dict[str, jax.Array],
    plan: TilePlan,
    mesh: Mesh,
    axis_name: str = "data",
    pad_mode: str = "edge",
    prepadded: bool = False,
    tiles_per_dispatch: int = 1,
) -> jax.Array:
    """Predict all tiles of the plan, tile axis sharded over the mesh.

    Returns (num_tiles, tile_out, tile_out) sharded on axis 0 (padded tiles
    beyond the real grid are dropped before returning).

    ``prepadded``: the inputs already carry the plan's pad_lr halo on every
    side (e.g. a continent row band whose vertical halo is REAL neighbour
    rows, inference.continent) — skip the edge padding here.

    ``tiles_per_dispatch``: tiles batched per forward within each device's
    scan (~6% per-tile MXU win at continent shapes, benchmarks/RESULTS.md).
    The device-local tile count rounds UP to a multiple of it (duplicated
    trailing tiles, recomputed and dropped) — only worth it when each device
    holds several tiles (e.g. a 22-tile band on 1-4 devices), NOT when the
    mesh already splits the band to 2-3 tiles per chip.
    """
    if tiles_per_dispatch < 1:
        raise ValueError(f"tiles_per_dispatch must be >= 1, got {tiles_per_dispatch}")
    n_dev = mesh.devices.size
    gy, gx = plan.grid
    num = plan.num_tiles
    num_padded = -(-num // n_dev) * n_dev

    tile_forward = make_tile_forward(forward_fn, plan)
    B = tiles_per_dispatch
    group_forward = make_tile_group_forward(forward_fn, plan) if B > 1 else None

    def predict(padded_inputs, tile_ids):
        if B == 1:  # keep the measured batch-1 graph unchanged

            def body(_, t):
                ty, tx = t // gx, t % gx
                tile = tile_forward(padded_inputs, ty, tx)
                return None, tile[0, :, :, 0]

            _, tiles = jax.lax.scan(body, None, tile_ids)
            return tiles

        n_local = tile_ids.shape[0]
        n_groups = -(-n_local // B)
        pad = n_groups * B - n_local
        ids = tile_ids
        if pad:  # duplicate the last id; recomputed, dropped by the slice
            ids = jnp.concatenate([ids, jnp.tile(ids[-1:], pad)])
        ids = ids.reshape(n_groups, B)

        def body_group(_, tg):
            return None, group_forward(padded_inputs, tg // gx, tg % gx)

        _, tiles = jax.lax.scan(body_group, None, ids)  # (n_groups, B, T, T)
        return tiles.reshape(n_groups * B, plan.tile_out, plan.tile_out)[:n_local]

    # shard_map (not plain GSPMD jit): a lax.scan is sequential, so the tile
    # loop must be split *before* tracing — each device scans only its shard.
    sharded = jax.jit(
        jax.shard_map(
            predict,
            mesh=mesh,
            in_specs=(P(), P(axis_name)),
            out_specs=P(axis_name),
            # pallas_call inside shard_map can't declare varying-mesh-axes
            # metadata on its out_shape; disable the vma check
            check_vma=False,
        )
    )
    tile_ids = jnp.arange(num_padded) % num  # wrap padding tiles (recomputed, dropped)
    padded_inputs = (
        inputs if prepadded else pad_inputs(inputs, plan, pad_mode)
    )
    tiles = sharded(padded_inputs, tile_ids)
    return tiles[:num]


def stitch_tiles(tiles: jax.Array, plan: TilePlan) -> jax.Array:
    """(num_tiles, T, T) row-major tiles -> (out_h, out_w) canvas."""
    gy, gx = plan.grid
    t = plan.tile_out
    return (
        tiles.reshape(gy, gx, t, t).transpose(0, 2, 1, 3).reshape(plan.out_h, plan.out_w)
    )
