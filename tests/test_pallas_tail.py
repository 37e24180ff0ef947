"""Parity tests for the fused generator tail (ops.pallas_tail).

The fused path must reproduce the unfused composition — offset conv ->
deform64 sampler -> LeakyReLU -> offset conv -> zproj sampler (reference
srgan_train.py:506-523) — to fp32 round-off, including at image borders
(where the fused kernels emit halo values the unfused path never
materialises) and across tile seams in both axes. Runs the pallas kernels
in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepbedmap_tpu.config import GeneratorConfig
from deepbedmap_tpu.ops.pallas_tail import _tail_reference, fused_deform_tail


def _params(key, c, scale=0.2):
    ks = jax.random.split(key, 9)
    shapes = [
        (3, 3, c, 18), (18,),  # offset conv 1
        (3, 3, c, c), (c,),    # deform64 kernel
        (3, 3, c, 18), (18,),  # offset conv 2
        (3, 3, c, 1), (1,),    # final deform kernel
    ]
    return [
        jax.random.normal(k, s, jnp.float32) * scale
        for k, s in zip(ks, shapes)
    ]


@pytest.mark.parametrize("pack_taps", [False, True])
@pytest.mark.parametrize(
    "n,h,w,c,bh,clamp",
    [
        (1, 32, 48, 16, 16, 2),   # single tile column, rows not a block multiple? (32 = 2 blocks)
        (2, 40, 150, 8, 8, 2),    # two lane tiles, ragged width, batch 2
        (1, 20, 130, 16, 8, 1),   # clamp=1, ragged rows and width
    ],
)
def test_fused_tail_matches_reference(n, h, w, c, bh, clamp, pack_taps):
    key = jax.random.PRNGKey(42)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, h, w, c), jnp.float32)
    p = _params(key, c)

    ref = _tail_reference(x, *p, 1, clamp)
    fused = fused_deform_tail(
        x, *p, clamp=clamp, block_rows=bh, method="pallas", interpret=True,
        pack_taps=pack_taps,
    )
    assert fused.shape == (n, h, w, 1)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=3e-4)


def test_fused_tail_bf16_offset_convs_match_reference():
    # under compute_dtype='bfloat16' BOTH paths run their offset convs in
    # bf16 (the unfused DeformableConv uses nn.Conv(dtype=...)); parity must
    # hold at bf16 tolerances, and the bf16 result must genuinely differ
    # from fp32 (proving the dtype plumbing reaches the convs)
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 24, 140, 8), jnp.float32)
    p = _params(jax.random.PRNGKey(8), 8)
    ref16 = _tail_reference(x, *p, 1, 2, "bfloat16")
    fused16 = fused_deform_tail(
        x, *p, block_rows=8, method="pallas",
        interpret=True, compute_dtype="bfloat16",
    )
    assert fused16.dtype == jnp.float32
    # same x to both paths; the only divergence is fp32-kernel round-off on
    # top of the (shared) bf16 offset fields (measured 2e-3 at this scale)
    np.testing.assert_allclose(
        np.asarray(fused16), np.asarray(ref16), atol=5e-3, rtol=1e-2
    )
    ref32 = _tail_reference(x, *p, 1, 2)
    assert np.abs(np.asarray(ref16) - np.asarray(ref32)).max() > 1e-5


def test_fused_tail_large_offsets_clamped_identically():
    # offsets far outside the clamp window: both paths clamp to +/-2. A
    # clamping mismatch would sample different pixels -> O(1) relative
    # errors; the loose rtol only absorbs fp32 cancellation (scale-3.0
    # params drive O(100-700) activations through two re-associated layers).
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 24, 40, 8), jnp.float32)
    p = _params(jax.random.PRNGKey(4), 8, scale=3.0)
    ref = _tail_reference(x, *p, 1, 2)
    fused = fused_deform_tail(
        x, *p, block_rows=8, method="pallas", interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=1e-2, atol=2e-2
    )


def test_fused_tail_gradients_flow():
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 20, 8), jnp.float32)
    p = _params(jax.random.PRNGKey(6), 8)

    def loss_fused(x, *p):
        return jnp.sum(
            fused_deform_tail(
                x, *p, block_rows=8, method="pallas", interpret=True
            )
            ** 2
        )

    def loss_ref(x, *p):
        return jnp.sum(_tail_reference(x, *p, 1, 2) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 3))(x, *p)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 3))(x, *p)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_generator_tail_fused_param_tree_and_output_parity():
    from deepbedmap_tpu.models.generator import Generator

    cfg = GeneratorConfig(num_residual_blocks=1)
    cfg_f = GeneratorConfig(num_residual_blocks=1, tail_fused=True)
    n, s = 1, 12
    x = jnp.ones((n, s, s, 1)) * 0.1
    w1 = jnp.ones((n, 10 * s, 10 * s, 1)) * 0.2
    w2 = jnp.ones((n, 2 * s, 2 * s, 2)) * 0.3
    w3 = jnp.ones((n, s, s, 1)) * 0.4

    key = jax.random.PRNGKey(0)
    p_a = Generator(cfg).init(key, x, w1, w2, w3)
    p_b = Generator(cfg_f).init(key, x, w1, w2, w3)

    # identical tree (names, shapes) AND identical init values: checkpoints
    # and the Chainer shim are layout-agnostic across the flag
    assert jax.tree_util.tree_structure(p_a) == jax.tree_util.tree_structure(p_b)
    for a, b in zip(jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    y_a = Generator(cfg).apply(p_a, x, w1, w2, w3)
    y_b = Generator(cfg_f).apply(p_b, x, w1, w2, w3)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_a), atol=1e-4)


def test_generator_tail_fused_bf16_parity():
    # fused vs unfused under compute_dtype='bfloat16': both run offset convs
    # at bf16, so the ablation pair stays apples-to-apples (ADVICE r3)
    from deepbedmap_tpu.models.generator import Generator

    cfg = GeneratorConfig(num_residual_blocks=1, compute_dtype="bfloat16")
    cfg_f = GeneratorConfig(
        num_residual_blocks=1, compute_dtype="bfloat16", tail_fused=True
    )
    n, s = 1, 12
    xs = (
        jnp.ones((n, s, s, 1)) * 0.1,
        jnp.ones((n, 10 * s, 10 * s, 1)) * 0.2,
        jnp.ones((n, 2 * s, 2 * s, 2)) * 0.3,
        jnp.ones((n, s, s, 1)) * 0.4,
    )
    key = jax.random.PRNGKey(0)
    p_a = Generator(cfg).init(key, *xs)
    y_a = Generator(cfg).apply(p_a, *xs)
    y_b = Generator(cfg_f).apply(p_a, *xs)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_a), atol=1e-4)
