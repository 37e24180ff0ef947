"""Pallas kernel tests (run in interpret mode on the CPU mesh; the real-TPU
path is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepbedmap_tpu.ops.deform_conv import deform_conv2d
from deepbedmap_tpu.ops.pallas_kernels import deform_conv2d_pallas


@pytest.fixture
def case(rng):
    n, h, w, c_in, c_out = 1, 9, 13, 8, 16
    x = rng.randn(n, h, w, c_in).astype(np.float32)
    offsets = (rng.rand(n, h, w, 18) * 4.0 - 2.0).astype(np.float32)
    weight = rng.randn(3, 3, c_in, c_out).astype(np.float32)
    bias = rng.randn(c_out).astype(np.float32)
    return map(jnp.asarray, (x, offsets, weight, bias))


@pytest.mark.parametrize(
    "body",
    ["stacked", "stacked_packed", "stacked_pipelined", "banded", "rolls"],
)
def test_pallas_matches_shifts(case, body):
    """Every kernel body is the same sampling math in a different dot
    decomposition ('stacked_packed' shares one slab + one lane-concatenated
    sampling matmul across the taps of a kernel row) — all must match the
    masked-shifts oracle."""
    x, offsets, weight, bias = case
    via_shifts = deform_conv2d(x, offsets, weight, bias, method="shifts", clamp=2)
    via_pallas = deform_conv2d_pallas(
        x, offsets, weight, bias, clamp=2, block_rows=8, interpret=True,
        kernel_body=body,
    )
    np.testing.assert_allclose(
        np.asarray(via_pallas), np.asarray(via_shifts), rtol=1e-5, atol=1e-5
    )


def test_pallas_method_is_differentiable(case):
    x, offsets, weight, bias = case

    def loss(w, o):
        out = deform_conv2d(x, o, w, bias, method="pallas", clamp=2)
        return jnp.sum(out**2)

    def loss_shifts(w, o):
        out = deform_conv2d(x, o, w, bias, method="shifts", clamp=2)
        return jnp.sum(out**2)

    gw, go = jax.grad(loss, argnums=(0, 1))(weight, offsets)
    gw_ref, go_ref = jax.grad(loss_shifts, argnums=(0, 1))(weight, offsets)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(go), np.asarray(go_ref), rtol=2e-4, atol=2e-4)


def test_zproj_xla_matches_shifts(case):
    x, offsets, weight, bias = case
    via_shifts = deform_conv2d(x, offsets, weight, bias, method="shifts", clamp=2)
    via_zproj = deform_conv2d(x, offsets, weight, bias, method="zproj", clamp=2)
    np.testing.assert_allclose(
        np.asarray(via_zproj), np.asarray(via_shifts), rtol=1e-5, atol=1e-5
    )


def test_zform_kernel_matches_shifts(case):
    from deepbedmap_tpu.ops.pallas_kernels import deform_conv2d_pallas_zform

    x, offsets, weight, bias = case
    via_shifts = deform_conv2d(x, offsets, weight, bias, method="shifts", clamp=2)
    got = deform_conv2d_pallas_zform(
        x, offsets, weight, bias, clamp=2, block_rows=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(via_shifts), rtol=1e-5, atol=1e-5
    )


def test_zproj1_kernel_matches_shifts(rng):
    from deepbedmap_tpu.ops.pallas_kernels import deform_conv2d_pallas_zproj1

    n, h, w, c_in = 2, 17, 130, 8
    x = jnp.asarray(rng.randn(n, h, w, c_in).astype(np.float32))
    offsets = jnp.asarray((rng.rand(n, h, w, 18) * 6.0 - 3.0).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, c_in, 1).astype(np.float32))
    bias = jnp.asarray(rng.randn(1).astype(np.float32))
    via_shifts = deform_conv2d(x, offsets, weight, bias, method="shifts", clamp=2)
    got = deform_conv2d_pallas_zproj1(
        x, offsets, weight, bias, clamp=2, block_rows=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(via_shifts), rtol=1e-5, atol=1e-5
    )


def test_pallas_cout1_dispatch_is_differentiable(rng):
    # the generator's final layer shape: pallas method must route to the
    # zproj1 kernel and stay differentiable through the custom VJP
    n, h, w, c_in = 1, 9, 13, 8
    x = jnp.asarray(rng.randn(n, h, w, c_in).astype(np.float32))
    offsets = jnp.asarray((rng.rand(n, h, w, 18) * 4.0 - 2.0).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, c_in, 1).astype(np.float32))
    bias = jnp.asarray(rng.randn(1).astype(np.float32))

    def loss(method):
        def f(w, o):
            return jnp.sum(deform_conv2d(x, o, w, bias, method=method, clamp=2) ** 2)
        return jax.grad(f, argnums=(0, 1))(weight, offsets)

    gw, go = loss("pallas")
    gw_ref, go_ref = loss("shifts")
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(go), np.asarray(go_ref), rtol=2e-4, atol=2e-4)
