"""Golden-value loss tests against the reference's doctest scalars
(srgan_train.py:859-868, 916-920, 944-948, 985-991)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deepbedmap_tpu.ops import (
    binary_accuracy,
    generator_loss,
    psnr,
    ragan_loss,
    sigmoid_cross_entropy,
    ssim,
)


def test_ragan_golden():
    # reference calculate_discriminator_loss doctest -> 1.56670504
    real = jnp.array([[1.1], [-0.5]])
    fake = jnp.array([[-0.3], [1.0]])
    loss = ragan_loss(real_logits=real, fake_logits=fake)
    # golden computed in float64 by the reference; fp32 agrees to ~2e-5
    assert np.isclose(float(loss), 1.56670504, atol=1e-4)


def test_psnr_golden():
    # reference psnr doctest -> 192.65919722494797
    value = psnr(
        y_pred=jnp.ones((2, 3, 3, 1)), y_true=jnp.full((2, 3, 3, 1), 2.0)
    )
    assert np.isclose(float(value), 192.65919722494797, atol=1e-4)


def test_ssim_golden():
    # reference ssim_loss_func doctest -> 0.800004
    value = ssim(
        y_pred=jnp.ones((2, 9, 9, 1)), y_true=jnp.full((2, 9, 9, 1), 2.0)
    )
    assert np.isclose(float(value), 0.800004, atol=1e-5)


def test_generator_loss_golden():
    # reference calculate_generator_loss doctest -> 4.35108415
    terms = generator_loss(
        y_pred=jnp.ones((2, 12, 12, 1)),
        y_true=jnp.full((2, 12, 12, 1), 10.0),
        fake_logits=jnp.array([[-1.2], [0.5]]),
        real_logits=jnp.array([[0.5], [-0.8]]),
        x_topo=jnp.full((2, 3, 3, 1), 9.0),
    )
    assert np.isclose(float(terms.total), 4.35108415, atol=1e-4)


def test_sigmoid_cross_entropy_matches_naive():
    rng = np.random.RandomState(0)
    x = rng.randn(64, 1).astype(np.float32) * 5
    t = (rng.rand(64, 1) > 0.5).astype(np.float32)
    naive = -np.mean(
        t * np.log(1.0 / (1.0 + np.exp(-x)))
        + (1 - t) * np.log(1.0 - 1.0 / (1.0 + np.exp(-x)))
    )
    ours = float(sigmoid_cross_entropy(jnp.asarray(x), jnp.asarray(t)))
    # fp32 exp/log in the naive form carries ~1e-5 relative noise
    assert np.isclose(ours, naive, rtol=1e-4)


def test_binary_accuracy():
    logits = jnp.array([[2.0], [-1.0], [0.5], [-0.1]])
    labels = jnp.array([[1.0], [0.0], [0.0], [0.0]])
    assert float(binary_accuracy(logits, labels)) == pytest.approx(0.75)


def test_ssim_shape_mismatch_raises():
    with pytest.raises(ValueError):
        ssim(jnp.ones((1, 9, 9, 1)), jnp.ones((1, 10, 10, 1)))
