"""Adversarial + perceptual losses (reference srgan_train.py:841-1009).

All functions are pure and jit-able. Shapes: image batches are NHWC; logits are
(N, 1). Targets are floats (the reference uses int labels fed to Chainer's
sigmoid_cross_entropy; the math is identical).

Golden values reproduced by tests:
- ragan_loss doctest: 1.56670504       (srgan_train.py:985-991)
- generator_loss doctest: 4.35108415   (srgan_train.py:859-868)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deepbedmap_tpu.config import LossConfig
from deepbedmap_tpu.ops.resize import avg_pool
from deepbedmap_tpu.ops.ssim import ssim


def sigmoid_cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Numerically-stable mean sigmoid cross-entropy.

    Same stable form as Chainer's implementation quoted in the reference
    (srgan_train.py:976-980): -(x*(t - [x>=0]) - log1p(exp(-|x|))), averaged.
    """
    logits = jnp.asarray(logits, jnp.float32)
    targets = jnp.asarray(targets, jnp.float32)
    per_elem = -(
        logits * (targets - (logits >= 0.0).astype(jnp.float32))
        - jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return jnp.mean(per_elem)


def ragan_loss(
    real_logits: jax.Array,
    fake_logits: jax.Array,
    real_target: float = 1.0,
    fake_target: float = 0.0,
) -> jax.Array:
    """Relativistic-average GAN loss (Jolicoeur-Martineau 2018).

    Discriminator side (defaults): real logits relative to mean fake logit should
    classify as ``real_target`` (1), and vice versa — reference
    ``calculate_discriminator_loss`` (srgan_train.py:960-1009). The generator-side
    adversarial term is the same function with targets swapped
    (real_target=0, fake_target=1), as in srgan_train.py:874-879.
    """
    real_vs_fake = sigmoid_cross_entropy(
        real_logits - jnp.mean(fake_logits),
        jnp.full_like(real_logits, real_target),
    )
    fake_vs_real = sigmoid_cross_entropy(
        fake_logits - jnp.mean(real_logits),
        jnp.full_like(fake_logits, fake_target),
    )
    return real_vs_fake + fake_vs_real


def binary_accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Fraction of logits whose sign matches the 0/1 label (threshold at 0).

    Mirrors ``F.binary_accuracy`` on concatenated real+fake logits
    (srgan_train.py:1156-1158).
    """
    predictions = (logits >= 0.0).astype(jnp.float32)
    return jnp.mean((predictions == jnp.asarray(labels, jnp.float32)).astype(jnp.float32))


class GeneratorLossTerms(NamedTuple):
    total: jax.Array
    content: jax.Array
    adversarial: jax.Array
    topographic: jax.Array
    structural: jax.Array


def generator_loss(
    y_pred: jax.Array,  # NHWC predicted SR tiles
    y_true: jax.Array,  # NHWC groundtruth tiles
    fake_logits: jax.Array,  # (N, 1) discriminator logits on fakes
    real_logits: jax.Array,  # (N, 1) discriminator logits on reals (or literal 1s)
    x_topo: jax.Array,  # NHWC low-res tile cropped of its padding ring
    cfg: LossConfig = LossConfig(),
    scale: int = 4,
) -> GeneratorLossTerms:
    """Weighted perceptual loss (reference calculate_generator_loss,
    srgan_train.py:841-902): content L1 + RaGAN-with-swapped-targets + topographic
    L1 on ``scale``x``scale`` average-pooled prediction + (1 - SSIM).

    Parity note: for reference-exact behaviour the caller passes *detached*
    ``fake_logits`` and literal ones as ``real_logits`` (srgan_train.py:1229-1233);
    ``train.steps`` handles this according to ``cfg.differentiable_adversarial``.
    """
    content = jnp.mean(jnp.abs(y_pred - y_true))
    adversarial = ragan_loss(
        real_logits=real_logits,
        fake_logits=fake_logits,
        real_target=0.0,  # swapped targets for the generator side
        fake_target=1.0,
    )
    topographic = jnp.mean(jnp.abs(avg_pool(y_pred, scale) - x_topo))
    structural = 1.0 - ssim(y_pred, y_true, window_size=cfg.ssim_window)

    total = (
        cfg.content_weight * content
        + cfg.adversarial_weight * adversarial
        + cfg.topographic_weight * topographic
        + cfg.structural_weight * structural
    )
    return GeneratorLossTerms(total, content, adversarial, topographic, structural)
