"""Tensor (channel) parallelism for the conv GAN — SURVEY.md 2.2's stretch
goal ("optional channel-sharding of RRDB convs").

The model is small (8.9 M params), so TP is never *required*; it exists to
(a) scale activation memory for very large inference windows and (b) compose
with data parallelism on a 2-D mesh. The design is pure GSPMD: conv kernels
are sharded on their output-channel axis (and biases on their only axis)
over a ``model`` mesh axis, inputs stay replicated over that axis, and XLA
propagates the channel sharding through the network, inserting all-gathers
only where a layer genuinely mixes every channel (the dense-concat reads and
the final single-channel head). Correctness is sharding-independent — the
same math, different placement — pinned by tests against the single-device
forward.

Usage:
    mesh = make_mesh_2d(n_data, n_model)           # ('data', 'model') axes
    p_sharded = shard_params_tp(mesh, params)      # device_put by rules
    fwd = make_tp_forward(mesh, model, p_sharded)  # jitted, batch on 'data'

Training composes the same way: ``tp_state_shardings`` maps a full GANState
(params + Adam moments mirror the param tree) to NamedShardings, giving
DP x TP fully-sharded training in one jit (exercised by dryrun_multichip).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(
    n_data: int, n_model: int, axis_names=("data", "model")
) -> Mesh:
    """2-D ('data', 'model') mesh over the first n_data*n_model devices.

    On real slices, keep ``model`` on the minor (fastest-ICI) axis — channel
    collectives are latency-sensitive; batch collectives amortise.
    """
    devices = jax.devices()
    need = n_data * n_model
    assert need <= len(devices), (need, len(devices))
    grid = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(grid, axis_names)


def _param_spec(path: tuple, leaf) -> P:
    """Channel-sharding rule for one parameter.

    - conv kernels (..., I, O): shard O (the channel dim every layer owns);
    - biases / BN scales (O,): shard O;
    - dense/FC kernels (I, O): shard O;
    - scalars and anything 1-element: replicated.
    """
    if leaf.ndim >= 2:
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    if leaf.ndim == 1 and leaf.shape[0] > 1:
        return P("model")
    return P()


def tp_param_shardings(mesh: Mesh, params: Any) -> Any:
    """Pytree of NamedShardings for a param tree under channel sharding.

    Axes not divisible by the mesh's ``model`` size stay replicated (GSPMD
    requires even tiling; e.g. the final 64->1 head's O=1)."""
    n_model = mesh.shape["model"]

    def spec(path, leaf):
        p = _param_spec(path, leaf)
        # drop the sharding where the dim doesn't divide evenly
        dims = [
            None
            if (ax == "model" and leaf.shape[i] % n_model != 0)
            else ax
            for i, ax in enumerate(p)
        ]
        return NamedSharding(mesh, P(*dims))

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_tp(mesh: Mesh, params: Any) -> Any:
    """device_put the param tree according to the channel-sharding rules."""
    shardings = tp_param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def make_tp_forward(mesh: Mesh, model, params_sharded):
    """jit the model forward with params channel-sharded and the batch
    sharded over 'data' (replicated when the mesh has no data axis > 1)."""
    batch = NamedSharding(mesh, P("data"))
    out = NamedSharding(mesh, P("data"))

    def fwd(p, *args):
        return model.apply({"params": p}, *args)

    p_shardings = tp_param_shardings(mesh, params_sharded)
    return jax.jit(
        fwd,
        in_shardings=(p_shardings, batch, batch, batch, batch),
        out_shardings=out,
    )


def tp_state_shardings(mesh: Mesh, state) -> Any:
    """NamedShardings for a full GANState under channel sharding.

    Every leaf in the state is either a parameter, a param-shaped Adam moment
    (mu/nu mirror the param trees), a per-channel BN statistic, or a scalar
    (step, Adam counts) — so one leaf-wise rule covers the whole tree:
    >=1-D leaves get the channel sharding (with the divisibility guard),
    scalars stay replicated. Feeding this as jit in_/out_shardings gives
    DP x TP fully-sharded training in a single jit."""
    return tp_param_shardings(mesh, state)
