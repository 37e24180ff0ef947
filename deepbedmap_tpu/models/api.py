"""Model construction + reference-layout (NCHW) convenience API.

The framework is NHWC-native; these wrappers accept/return the reference's
(N, C, H, W) arrays (the contract of srgan_train.py:437-447 and the saved
X/W1/W2/W3/Y npy files) by transposing at the jit boundary — XLA folds the
transposes into the first/last convolutions.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from deepbedmap_tpu.config import DiscriminatorConfig, GeneratorConfig
from deepbedmap_tpu.models.discriminator import Discriminator
from deepbedmap_tpu.models.generator import Generator


def count_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def example_inputs_nhwc(batch: int = 1, lr: int = 11) -> Tuple[jax.Array, ...]:
    """Training-shaped example inputs: lr=11 low-res px (9 km tile + 1 km pad)."""
    key = jax.random.PRNGKey(0)
    kx, k1, k2, k3 = jax.random.split(key, 4)
    x = jax.random.uniform(kx, (batch, lr, lr, 1), jnp.float32)
    w1 = jax.random.uniform(k1, (batch, 10 * lr, 10 * lr, 1), jnp.float32)
    w2 = jax.random.uniform(k2, (batch, 2 * lr, 2 * lr, 2), jnp.float32)
    w3 = jax.random.uniform(k3, (batch, lr, lr, 1), jnp.float32)
    return x, w1, w2, w3


def build_generator(
    cfg: GeneratorConfig = GeneratorConfig(), seed: int = 42, lr: int = 11
) -> Tuple[Generator, Dict[str, Any]]:
    """Instantiate the generator and initialise parameters."""
    model = Generator(cfg)
    variables = model.init(jax.random.PRNGKey(seed), *example_inputs_nhwc(1, lr))
    return model, variables["params"]


def build_discriminator(
    cfg: DiscriminatorConfig = DiscriminatorConfig(), seed: int = 42, hr: int = 36
) -> Tuple[Discriminator, Dict[str, Any]]:
    """Instantiate the discriminator; returns (model, variables) where variables
    holds both 'params' and 'batch_stats' collections."""
    model = Discriminator(cfg)
    y = jnp.zeros((1, hr, hr, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), y, train=True)
    return model, variables


def nchw_to_nhwc(a: jax.Array) -> jax.Array:
    return jnp.transpose(a, (0, 2, 3, 1))


def nhwc_to_nchw(a: jax.Array) -> jax.Array:
    return jnp.transpose(a, (0, 3, 1, 2))


@functools.partial(jax.jit, static_argnums=0)
def generator_forward_nchw(model: Generator, params, x, w1, w2, w3) -> jax.Array:
    """Reference-contract forward: NCHW in, NCHW out
    ((N,1,h,h)... -> (N,1,(h-2)*4,(h-2)*4))."""
    out = model.apply(
        {"params": params},
        nchw_to_nhwc(x),
        nchw_to_nhwc(w1),
        nchw_to_nhwc(w2),
        nchw_to_nhwc(w3),
    )
    return nhwc_to_nchw(out)
