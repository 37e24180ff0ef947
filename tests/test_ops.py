"""Unit tests for core ops: resize/space-to-depth equivalences, pooling,
deformable convolution vs. a slow NumPy reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepbedmap_tpu.ops import avg_pool, deform_conv2d, nearest_upsample, space_to_depth


def test_nearest_upsample():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    up = nearest_upsample(x, 2)
    assert up.shape == (1, 4, 4, 1)
    expected = np.array(
        [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]], dtype=np.float32
    )
    np.testing.assert_array_equal(np.asarray(up)[0, :, :, 0], expected)


def test_avg_pool_topo_shape():
    x = jnp.ones((2, 36, 36, 1))
    out = avg_pool(x, 4)
    assert out.shape == (2, 9, 9, 1)
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_strided_conv_equals_space_to_depth_conv(rng):
    """conv(k=3b, s=b, VALID) == conv3x3(space_to_depth(x, b), VALID) — the
    factorisation used to make the reference's k30s10 REMA conv MXU-friendly."""
    b = 5
    c_in, c_out = 2, 4
    x = jnp.asarray(rng.rand(1, 7 * b, 7 * b, c_in), jnp.float32)
    w_big = jnp.asarray(rng.rand(3 * b, 3 * b, c_in, c_out), jnp.float32)

    direct = jax.lax.conv_general_dilated(
        x,
        w_big,
        window_strides=(b, b),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    # reshape the big kernel to the space-to-depth form:
    # (3b, 3b, C, O) -> (3, bh, 3, bw, C, O) -> (3, 3, bh*bw*C, O)
    w_s2d = (
        np.asarray(w_big)
        .reshape(3, b, 3, b, c_in, c_out)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(3, 3, b * b * c_in, c_out)
    )
    via_s2d = jax.lax.conv_general_dilated(
        space_to_depth(x, b),
        jnp.asarray(w_s2d),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via_s2d), rtol=2e-5, atol=1e-4)


def _deform_conv_reference(x, offsets, weight, bias, padding=1):
    """Slow, obviously-correct NumPy deformable conv v1 (stride 1)."""
    n, h, w, c_in = x.shape
    kh, kw, _, c_out = weight.shape
    k = kh * kw
    xp = np.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    hp, wp = xp.shape[1:3]

    def sample(b, r, c):
        # bilinear with zero outside
        r0, c0 = int(np.floor(r)), int(np.floor(c))
        acc = np.zeros(c_in, np.float64)
        for dr, wr in ((r0, 1 - (r - r0)), (r0 + 1, r - r0)):
            for dc, wc in ((c0, 1 - (c - c0)), (c0 + 1, c - c0)):
                if 0 <= dr < hp and 0 <= dc < wp:
                    acc += wr * wc * xp[b, dr, dc]
        return acc

    out = np.zeros((n, h, w, c_out), np.float64)
    for b in range(n):
        for i in range(h):
            for j in range(w):
                taps = np.zeros((k, c_in), np.float64)
                for u in range(kh):
                    for v in range(kw):
                        t = u * kw + v
                        r = i + u + offsets[b, i, j, t]
                        c = j + v + offsets[b, i, j, k + t]
                        taps[t] = sample(b, r, c)
                out[b, i, j] = taps.reshape(-1) @ weight.reshape(-1, c_out) + bias
    return out.astype(np.float32)


def test_deform_conv_gather_matches_reference(rng):
    n, h, w, c_in, c_out = 2, 5, 6, 3, 4
    x = rng.randn(n, h, w, c_in).astype(np.float32)
    offsets = (rng.randn(n, h, w, 18) * 1.5).astype(np.float32)
    weight = rng.randn(3, 3, c_in, c_out).astype(np.float32)
    bias = rng.randn(c_out).astype(np.float32)

    ours = deform_conv2d(
        jnp.asarray(x),
        jnp.asarray(offsets),
        jnp.asarray(weight),
        jnp.asarray(bias),
        method="gather",
    )
    ref = _deform_conv_reference(x, offsets, weight, bias)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_deform_conv_shifts_matches_gather(rng):
    """The TPU fast path (masked shifts) is exact vs. the gather path whenever
    offsets lie inside the clamp window."""
    n, h, w, c_in, c_out = 2, 7, 6, 3, 4
    x = rng.randn(n, h, w, c_in).astype(np.float32)
    # offsets spanning the full clamp window incl. negatives and boundaries
    offsets = (rng.rand(n, h, w, 18) * 4.0 - 2.0).astype(np.float32)
    offsets[0, 0, 0, :] = 2.0  # exact boundary
    offsets[0, 1, 1, :] = -2.0
    weight = rng.randn(3, 3, c_in, c_out).astype(np.float32)
    bias = rng.randn(c_out).astype(np.float32)

    args = (jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight), jnp.asarray(bias))
    via_gather = deform_conv2d(*args, method="gather")
    via_shifts = deform_conv2d(*args, method="shifts", clamp=2)
    np.testing.assert_allclose(
        np.asarray(via_shifts), np.asarray(via_gather), rtol=1e-4, atol=1e-4
    )


def test_deform_conv_shifts_clamps_large_offsets(rng):
    """Out-of-window offsets are clamped, equivalent to gather on pre-clamped
    offsets."""
    n, h, w, c_in, c_out = 1, 5, 5, 2, 3
    x = rng.randn(n, h, w, c_in).astype(np.float32)
    offsets = (rng.randn(n, h, w, 18) * 10.0).astype(np.float32)
    weight = rng.randn(3, 3, c_in, c_out).astype(np.float32)

    via_shifts = deform_conv2d(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight), method="shifts",
        clamp=2,
    )
    clamped = np.clip(offsets, -2.0, 2.0)
    via_gather = deform_conv2d(
        jnp.asarray(x), jnp.asarray(clamped), jnp.asarray(weight), method="gather"
    )
    np.testing.assert_allclose(
        np.asarray(via_shifts), np.asarray(via_gather), rtol=1e-4, atol=1e-4
    )


def test_deform_conv_zero_offsets_is_plain_conv(rng):
    n, h, w, c_in, c_out = 1, 8, 8, 4, 5
    x = rng.randn(n, h, w, c_in).astype(np.float32)
    weight = rng.randn(3, 3, c_in, c_out).astype(np.float32)
    bias = np.zeros(c_out, np.float32)
    offsets = np.zeros((n, h, w, 18), np.float32)

    ours = deform_conv2d(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight), jnp.asarray(bias)
    )
    plain = jax.lax.conv_general_dilated(
        jnp.asarray(x),
        jnp.asarray(weight),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(plain), rtol=1e-4, atol=1e-4)


def test_deform_conv_is_differentiable(rng):
    x = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)
    offsets = jnp.asarray(rng.randn(1, 4, 4, 18) * 0.3, jnp.float32)
    weight = jnp.asarray(rng.randn(3, 3, 2, 1), jnp.float32)

    def loss(w, off):
        return jnp.sum(deform_conv2d(x, off, w) ** 2)

    gw, goff = jax.grad(loss, argnums=(0, 1))(weight, offsets)
    assert np.isfinite(np.asarray(gw)).all()
    assert np.isfinite(np.asarray(goff)).all()
    assert float(jnp.abs(goff).sum()) > 0.0  # offsets receive gradient


def test_bicubic_sampler_interpolates_nodes_and_quadratics(rng):
    """Keys a=-0.5 cubic convolution (GMT grdtrack's default): must return
    node values exactly at cell centers and reproduce quadratic surfaces
    exactly in the interior (the kernel's polynomial-precision guarantee)."""
    from deepbedmap_tpu.ops.interp import sample_grid_bicubic, window_coords

    x0, y1, res = 100.0, 500.0, 10.0
    h, w = 12, 14
    xs, ys = window_coords((x0, y1 - h * res, x0 + w * res, y1), res)
    xg, yg = jnp.meshgrid(xs, ys)

    def quad(x, y):
        return 0.3 * x * x / 1e4 + 0.1 * x * y / 1e4 - 0.2 * y * y / 1e4 + 3.0

    data = quad(xg, yg)

    # exact at nodes
    got = sample_grid_bicubic(data, xg.ravel(), yg.ravel(), x0, y1, res)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(data.ravel()), rtol=1e-5, atol=1e-5
    )

    # exact on quadratics at interior off-node points (2 cells from each edge
    # so the 4x4 stencil never clamps)
    px = jnp.asarray(rng.uniform(x0 + 2.5 * res, x0 + (w - 2.5) * res, 200), jnp.float32)
    py = jnp.asarray(rng.uniform(y1 - (h - 2.5) * res, y1 - 2.5 * res, 200), jnp.float32)
    got = sample_grid_bicubic(data, px, py, x0, y1, res)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(quad(px, py)), rtol=1e-4, atol=1e-5
    )

    # NaN outside the cell-center hull, same rule as bilinear
    out = sample_grid_bicubic(data, jnp.asarray([x0 - 5.0]), jnp.asarray([y1 - 50.0]), x0, y1, res)
    assert np.isnan(np.asarray(out)).all()


def test_grdtrack_bicubic_differs_from_bilinear_off_node(rng):
    from deepbedmap_tpu.evalx.track import grdtrack

    data = jnp.asarray(rng.randn(16, 16), jnp.float32)
    px = jnp.asarray([5.0 * 3.7], jnp.float32)
    py = jnp.asarray([-5.0 * 4.3], jnp.float32)
    bc = grdtrack(data, px, py, 0.0, 0.0, 5.0, method="bicubic")
    bl = grdtrack(data, px, py, 0.0, 0.0, 5.0, method="bilinear")
    assert np.isfinite(np.asarray(bc)).all()
    assert abs(float(bc[0]) - float(bl[0])) > 1e-6
