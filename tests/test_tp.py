"""Tensor (channel) parallelism tests — SURVEY.md 2.2's stretch goal.

Sharding must never change the math: the TP forward and the DP x TP fused
train step are pinned against their single-device counterparts on the
8-virtual-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepbedmap_tpu.config import DiscriminatorConfig, GeneratorConfig, TrainConfig
from deepbedmap_tpu.data.dataset import TileDataset
from deepbedmap_tpu.models import Discriminator, Generator, build_generator
from deepbedmap_tpu.parallel import (
    make_mesh_2d,
    make_tp_forward,
    shard_params_tp,
    tp_param_shardings,
    tp_state_shardings,
)
from deepbedmap_tpu.train import create_gan_state, make_train_step

TINY_G = GeneratorConfig(num_residual_blocks=1)


def _args(rng, n=2):
    return (
        jnp.asarray(rng.rand(n, 11, 11, 1), jnp.float32),
        jnp.asarray(rng.rand(n, 110, 110, 1), jnp.float32),
        jnp.asarray(rng.rand(n, 22, 22, 2), jnp.float32),
        jnp.asarray(rng.rand(n, 11, 11, 1), jnp.float32),
    )


def test_tp_param_shardings_rules():
    model, params = build_generator(TINY_G, lr=11)
    mesh = make_mesh_2d(2, 4)
    sh = tp_param_shardings(mesh, params)
    k = sh["pre_residual_conv_layer"]["kernel"].spec
    assert tuple(k) == (None, None, None, "model")  # O-dim sharded
    b = sh["pre_residual_conv_layer"]["bias"].spec
    assert tuple(b) == ("model",)
    # the 64->1 head's O=1 doesn't divide 4 -> replicated O
    head = sh["final_conv_layer2"]["kernel"].spec
    assert tuple(head) == (None, None, None, None)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_tp_forward_matches_single_device(shape):
    rng = np.random.RandomState(0)
    model, params = build_generator(TINY_G, lr=11)
    args = _args(rng, n=max(2, shape[0]))

    want = np.asarray(model.apply({"params": params}, *args))

    mesh = make_mesh_2d(*shape)
    p_sharded = shard_params_tp(mesh, params)
    fwd = make_tp_forward(mesh, model, p_sharded)
    got = np.asarray(fwd(p_sharded, *args))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_dp_tp_train_step_matches_single_device():
    """One fused D+G step on a ('data': 2, 'model': 4) mesh — batch sharded
    over data, every param/moment channel-sharded over model — must produce
    the same losses and parameters as the single-device step."""
    t_cfg = TrainConfig(batch_size=8, learning_rate=1e-3)
    g_model = Generator(TINY_G)
    d_model = Discriminator(DiscriminatorConfig())
    dataset = TileDataset.synthetic(8, seed=1)
    batch = dataset.take(jnp.arange(8))

    state_a = create_gan_state(TINY_G, t_cfg=t_cfg)
    state_b = jax.tree_util.tree_map(jnp.copy, state_a)

    single = jax.jit(make_train_step(g_model, d_model, t_cfg))
    new_a, metrics_a = single(state_a, batch)

    mesh = make_mesh_2d(2, 4)
    from jax.sharding import NamedSharding, PartitionSpec as P

    state_sh = tp_state_shardings(mesh, state_b)
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    step = jax.jit(
        make_train_step(g_model, d_model, t_cfg),
        in_shardings=(state_sh, {k: data for k in batch}),
        out_shardings=(state_sh, None),
    )
    state_b = jax.device_put(state_b, state_sh)
    sharded_batch = {k: jax.device_put(v, data) for k, v in batch.items()}
    new_b, metrics_b = step(state_b, sharded_batch)

    np.testing.assert_allclose(
        float(metrics_a.generator_loss), float(metrics_b.generator_loss), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics_a.discriminator_loss),
        float(metrics_b.discriminator_loss),
        rtol=1e-5,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_a.g_params),
        jax.tree_util.tree_leaves(new_b.g_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
