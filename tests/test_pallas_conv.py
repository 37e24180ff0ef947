"""Fused tail-conv Pallas kernel (ops/pallas_conv.py): parity with the XLA
3x3 SAME conv (interpret mode off-TPU) across pitch geometries, the
leaky/residual epilogues, gradients through the custom VJPs, and the
dispatch rule."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepbedmap_tpu.ops.pallas_conv import (
    conv3x3_fused,
    conv3x3_pallas,
    conv3x3_reference,
    conv3x3_res_fused,
    should_fuse_conv,
)


def _params(c_in, c_out, seed=0, scale=0.05):
    rs = np.random.RandomState(seed)
    kernel = jnp.asarray(rs.randn(3, 3, c_in, c_out).astype(np.float32) * scale)
    bias = jnp.asarray(rs.randn(c_out).astype(np.float32) * 0.1)
    return kernel, bias


@pytest.mark.parametrize(
    "shape,band",
    [
        ((1, 13, 14, 16), 4),   # W+2 = 16: exact pitch, H not divisible
        ((2, 16, 6, 8), 8),     # batch > 1, wp = 8 exactly one tile
        ((1, 5, 30, 16), 16),   # band > H (single overhanging band)
        ((1, 12, 11, 16), 4),   # W+2 = 13 -> pitch pads to 16 (extra cols)
        ((1, 9, 20, 8), 4),     # W+2 = 22 -> pitch 24
    ],
)
@pytest.mark.parametrize("leaky", [False, True])
def test_conv3x3_matches_xla(shape, band, leaky):
    rs = np.random.RandomState(1)
    kernel, bias = _params(shape[-1], 16)
    x = jnp.asarray(rs.randn(*shape).astype(np.float32))
    ref = conv3x3_reference(x, kernel, bias, leaky=leaky)
    got = conv3x3_pallas(x, kernel, bias, leaky=leaky, band=band)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_conv3x3_residual_epilogue():
    """residual adds BEFORE the (optional) leaky — the generator's
    post-residual skip (a3 = conv(a2) + a1) with leaky=False, and a
    leaky=True combination to pin the epilogue order."""
    rs = np.random.RandomState(2)
    kernel, bias = _params(16, 16, seed=3)
    x = jnp.asarray(rs.randn(1, 10, 14, 16).astype(np.float32))
    res = jnp.asarray(rs.randn(1, 10, 14, 16).astype(np.float32))
    for leaky in (False, True):
        ref = conv3x3_reference(x, kernel, bias, leaky=leaky, residual=res)
        got = conv3x3_pallas(x, kernel, bias, leaky=leaky, residual=res, band=4)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


def test_conv3x3_mxu_bf16_multiplicand_parity():
    """mxu_bf16 rounds only the dot multiplicands: tracks the fp32 oracle at
    bf16 tolerance and genuinely differs from the fp32 kernel."""
    rs = np.random.RandomState(4)
    kernel, bias = _params(16, 16, seed=5)
    x = jnp.asarray(rs.randn(1, 12, 14, 16).astype(np.float32) * 10.0)
    f32 = conv3x3_pallas(x, kernel, bias, band=4)
    b16 = conv3x3_pallas(x, kernel, bias, band=4, mxu_bf16=True)
    ref = conv3x3_reference(x, kernel, bias)
    # atol covers near-zero outputs where bf16 rounding dominates relatively
    np.testing.assert_allclose(np.asarray(b16), np.asarray(ref), rtol=3e-2, atol=6e-2)
    assert float(jnp.abs(b16 - f32).max()) > 0.0


def test_conv3x3_grads_match_xla():
    """The custom VJPs (plain and residual) agree with autodiff of the XLA
    composition for every operand."""
    rs = np.random.RandomState(6)
    kernel, bias = _params(8, 8, seed=7)
    x = jnp.asarray(rs.randn(1, 8, 14, 8).astype(np.float32))
    res = jnp.asarray(rs.randn(1, 8, 14, 8).astype(np.float32))

    def loss_fused(x_, k_, b_):
        return jnp.sum(conv3x3_fused(x_, k_, b_, True) ** 2)

    def loss_ref(x_, k_, b_):
        return jnp.sum(conv3x3_reference(x_, k_, b_, leaky=True) ** 2)

    for got, want in zip(
        jax.grad(loss_fused, argnums=(0, 1, 2))(x, kernel, bias),
        jax.grad(loss_ref, argnums=(0, 1, 2))(x, kernel, bias),
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )

    def loss_res_fused(x_, k_, b_, r_):
        return jnp.sum(conv3x3_res_fused(x_, k_, b_, r_) ** 2)

    def loss_res_ref(x_, k_, b_, r_):
        return jnp.sum(conv3x3_reference(x_, k_, b_, residual=r_) ** 2)

    for got, want in zip(
        jax.grad(loss_res_fused, argnums=(0, 1, 2, 3))(x, kernel, bias, res),
        jax.grad(loss_res_ref, argnums=(0, 1, 2, 3))(x, kernel, bias, res),
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )


def test_dispatch_rule():
    """CPU / small images stay on XLA; the rule has no pitch constraint."""
    assert not should_fuse_conv((1, 64, 64, 64))  # small
    if jax.default_backend() != "tpu":
        assert not should_fuse_conv((1, 1144, 1144, 64))
