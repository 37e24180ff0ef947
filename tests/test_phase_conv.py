"""Phase-decomposed upsample->conv (ops.phase_conv): must equal the literal
nearest_upsample(2) -> 3x3 SAME conv composition to fp32 round-off, at any
shape, and leave the generator's parameter tree and outputs unchanged."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepbedmap_tpu.config import GeneratorConfig
from deepbedmap_tpu.models import build_generator
from deepbedmap_tpu.ops.phase_conv import upsample2_conv3x3
from deepbedmap_tpu.ops.resize import nearest_upsample


def _literal(x, kernel, bias, leaky):
    z = jax.lax.conv_general_dilated(
        nearest_upsample(x, 2), kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    return jnp.where(z >= 0, z, 0.2 * z) if leaky else z


@pytest.mark.parametrize("h,w", [(8, 8), (5, 7), (1, 9), (16, 3)])
@pytest.mark.parametrize("leaky", [False, True])
def test_matches_literal_composition(h, w, leaky):
    rs = np.random.RandomState(h * 100 + w + leaky)
    c, f = 5, 6
    x = jnp.asarray(rs.randn(2, h, w, c), jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, c, f), jnp.float32)
    b = jnp.asarray(rs.randn(f), jnp.float32)
    got = upsample2_conv3x3(x, k, b, leaky=leaky)
    want = _literal(x, k, b, leaky)
    assert got.shape == want.shape == (2, 2 * h, 2 * w, f)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_gradients_match_literal():
    """Taps summed in the kernel instead of the dot must backprop the same
    kernel/input gradients (the path trains)."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 6, 6, 3), jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, 3, 4), jnp.float32)
    b = jnp.asarray(rs.randn(4), jnp.float32)
    g_phase = jax.grad(
        lambda k, x: jnp.sum(upsample2_conv3x3(x, k, b, leaky=True) ** 2),
        argnums=(0, 1),
    )(k, x)
    g_lit = jax.grad(
        lambda k, x: jnp.sum(_literal(x, k, b, True) ** 2), argnums=(0, 1)
    )(k, x)
    for gp, gl in zip(g_phase, g_lit):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gl), rtol=1e-4, atol=1e-4)


def test_generator_parity_and_param_tree():
    """upsample_phase_conv=True: identical parameter tree (same names,
    shapes, AND init values — the phase kernels are derived in-graph) and
    outputs equal to the literal generator to round-off."""
    base = GeneratorConfig(num_residual_blocks=1)
    phase = GeneratorConfig(num_residual_blocks=1, upsample_phase_conv=True)
    m0, p0 = build_generator(base)
    m1, p1 = build_generator(phase)
    flat0 = jax.tree_util.tree_leaves_with_path(p0)
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    assert [k for k, _ in flat0] == [k for k, _ in flat1]
    for (k, a), (_, b) in zip(flat0, flat1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(k))

    rs = np.random.RandomState(1)
    lr = 11
    args = (
        jnp.asarray(rs.rand(1, lr, lr, 1), jnp.float32),
        jnp.asarray(rs.rand(1, 10 * lr, 10 * lr, 1), jnp.float32),
        jnp.asarray(rs.rand(1, 2 * lr, 2 * lr, 2), jnp.float32),
        jnp.asarray(rs.rand(1, lr, lr, 1), jnp.float32),
    )
    y0 = m0.apply({"params": p0}, *args)
    y1 = m1.apply({"params": p1}, *args)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), rtol=1e-4, atol=1e-5
    )
