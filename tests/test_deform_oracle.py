"""Independent third-party oracle for the deformable convolution — the
single riskiest semantic for imported reference weights (VERDICT round-4
item 5, reference srgan_train.py:506-523).

Previously the torch parity test reused this framework's own numpy sampler,
so a shared convention error could hide. Here the oracle is built on
``torch.nn.functional.grid_sample`` — an independent bilinear sampler from a
different codebase — with the Chainer DeformableConvolution2D convention
mapped explicitly:

  * offsets (NHWC here): 2*K channels for K = kh*kw row-major taps, the
    first K are dy (row) offsets, the last K are dx (column) offsets;
  * tap t = (u, v) of output pixel (i, j) samples the ``padding``-padded
    input at (i + u + dy_t, j + v + dx_t) — bilinear, zero outside;
  * output = sum_t sample_t @ W[t] + b.

If torchvision is present, ``torchvision.ops.deform_conv2d`` is compared as
well (its offset layout interleaves (dy, dx) PER TAP: channel 2t is dy_t,
2t+1 is dx_t — documented here so a real-weights verification can be run in
minutes on any machine that has torchvision; see also
tests/fixtures/deform_golden.npz pinned by test_golden_fixture).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from deepbedmap_tpu.ops import deform_conv2d

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "deform_golden.npz")


def _grid_sample_deform(x_nhwc, off_nhwc, weight, bias, padding=1):
    """Deformable conv v1 via torch grid_sample (independent sampler).

    x: (N,H,W,C) float32; off: (N,H,W,2K) [dy first, dx last]; weight:
    (kh,kw,Cin,Cout); bias: (Cout,). Returns (N,H,W,Cout) numpy.
    """
    n, h, w, c_in = x_nhwc.shape
    kh, kw, _, c_out = weight.shape
    k = kh * kw
    x_t = torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))
    xp = F.pad(x_t, (padding, padding, padding, padding))
    hp, wp = xp.shape[2:]
    off = torch.from_numpy(np.ascontiguousarray(off_nhwc))  # (N,H,W,2K)

    ii = torch.arange(h, dtype=torch.float32).view(1, h, 1)
    jj = torch.arange(w, dtype=torch.float32).view(1, 1, w)
    taps = []
    for u in range(kh):
        for v in range(kw):
            t = u * kw + v
            r = ii + u + off[..., t]          # (N,H,W) padded row coord
            c = jj + v + off[..., k + t]      # padded col coord
            # align_corners=True: norm = 2*coord/(size-1) - 1
            gy = 2.0 * r / (hp - 1) - 1.0
            gx = 2.0 * c / (wp - 1) - 1.0
            grid = torch.stack([gx, gy], dim=-1)  # grid_sample wants (x, y)
            s = F.grid_sample(
                xp, grid, mode="bilinear", padding_mode="zeros",
                align_corners=True,
            )  # (N,C,H,W)
            taps.append(s)
    stacked = torch.stack(taps, dim=1)  # (N,K,C,H,W)
    w_t = torch.from_numpy(
        np.ascontiguousarray(weight.reshape(k, c_in, c_out))
    )
    out = torch.einsum("nkchw,kco->nhwo", stacked, w_t)
    out = out + torch.from_numpy(bias)
    return out.numpy()


@pytest.fixture
def rng():
    return np.random.RandomState(1234)


def test_ours_matches_grid_sample_oracle(rng):
    n, h, w, c_in, c_out = 2, 7, 6, 3, 4
    x = rng.randn(n, h, w, c_in).astype(np.float32)
    offsets = (rng.randn(n, h, w, 18) * 1.7).astype(np.float32)
    weight = rng.randn(3, 3, c_in, c_out).astype(np.float32)
    bias = rng.randn(c_out).astype(np.float32)

    ours = np.asarray(
        deform_conv2d(
            jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight),
            jnp.asarray(bias), method="gather",
        )
    )
    oracle = _grid_sample_deform(x, offsets, weight, bias)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)


def test_grid_sample_oracle_agrees_with_numpy_reference(rng):
    """Triangulation: the two oracles (grid_sample and the hand-rolled numpy
    sampler used by older tests) must agree with each other, so a bug in
    either reference implementation cannot silently re-align with the op."""
    from tests.test_ops import _deform_conv_reference

    n, h, w, c_in, c_out = 1, 5, 5, 2, 3
    x = rng.randn(n, h, w, c_in).astype(np.float32)
    offsets = (rng.randn(n, h, w, 18) * 2.1).astype(np.float32)
    weight = rng.randn(3, 3, c_in, c_out).astype(np.float32)
    bias = rng.randn(c_out).astype(np.float32)

    a = _grid_sample_deform(x, offsets, weight, bias)
    b = _deform_conv_reference(x, offsets, weight, bias)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(
    not pytest.importorskip("importlib").util.find_spec("torchvision"),
    reason="torchvision not installed in this image",
)
def test_torchvision_deform_conv2d_agrees(rng):
    """Third independent implementation (torchvision C++ kernels). Offset
    layout mapping (Chainer/ours -> torchvision): ours has [dy_0..dy_K-1,
    dx_0..dx_K-1]; torchvision wants [dy_0, dx_0, dy_1, dx_1, ...]."""
    from torchvision.ops import deform_conv2d as tv_deform

    n, h, w, c_in, c_out = 2, 6, 6, 3, 4
    x = rng.randn(n, h, w, c_in).astype(np.float32)
    offsets = (rng.randn(n, h, w, 18) * 1.5).astype(np.float32)
    weight = rng.randn(3, 3, c_in, c_out).astype(np.float32)
    bias = rng.randn(c_out).astype(np.float32)

    ours = np.asarray(
        deform_conv2d(
            jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight),
            jnp.asarray(bias), method="gather",
        )
    )
    k = 9
    off_nchw = torch.from_numpy(offsets.transpose(0, 3, 1, 2))
    interleaved = torch.empty_like(off_nchw)
    interleaved[:, 0::2] = off_nchw[:, :k]   # dy per tap
    interleaved[:, 1::2] = off_nchw[:, k:]   # dx per tap
    out = tv_deform(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        interleaved,
        torch.from_numpy(weight.transpose(3, 2, 0, 1)),  # (Cout,Cin,kh,kw)
        torch.from_numpy(bias),
        padding=1,
    )
    np.testing.assert_allclose(
        ours, out.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )


def test_golden_fixture():
    """Pinned input/output fixture (committed npz): lets a real reference
    weights artifact be verified in minutes on any machine — run the same
    inputs through Chainer/torchvision there and compare to `expected`
    (see docs/runbook.md 'verify-weights')."""
    data = np.load(FIXTURE)
    out = np.asarray(
        deform_conv2d(
            jnp.asarray(data["x"]), jnp.asarray(data["offsets"]),
            jnp.asarray(data["weight"]), jnp.asarray(data["bias"]),
            method="gather",
        )
    )
    np.testing.assert_allclose(out, data["expected"], rtol=1e-5, atol=1e-5)
