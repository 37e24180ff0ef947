"""Cross-stack parity: an independent PyTorch implementation of the reference
generator spec (srgan_train.py:201-576, Chainer semantics: NCHW, valid-pad
input block, dense blocks, NN-upsample, deformable convs) is fed our exported
Chainer-layout weights and must agree with the flax/NHWC forward.

This catches whole-stack convention errors (kernel flips, stride anchoring,
half-pixel offsets, s2d factorisation, scan stacking) that any single-stack
test would share on both sides."""

import numpy as np
import pytest

import jax.numpy as jnp

from deepbedmap_tpu.config import GeneratorConfig
from deepbedmap_tpu.models import build_generator
from deepbedmap_tpu.train.checkpoint import export_generator_npz

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

CFG = GeneratorConfig(num_residual_blocks=2)


def _t(a):
    return torch.from_numpy(np.ascontiguousarray(a))


def _conv(x, g, prefix, stride=1, padding=0):
    return F.conv2d(
        x, _t(g[f"{prefix}/W"]), _t(g[f"{prefix}/b"]), stride=stride,
        padding=padding,
    )


def _lrelu(x):
    return F.leaky_relu(x, 0.2)


def _rdb(x, g, prefix, scaling):
    a0 = x
    a1 = _lrelu(_conv(a0, g, f"{prefix}/conv_layer1", padding=1))
    a2 = _lrelu(_conv(torch.cat([a0, a1], 1), g, f"{prefix}/conv_layer2", padding=1))
    a3 = _lrelu(
        _conv(torch.cat([a0, a1, a2], 1), g, f"{prefix}/conv_layer3", padding=1)
    )
    a4 = _lrelu(
        _conv(torch.cat([a0, a1, a2, a3], 1), g, f"{prefix}/conv_layer4", padding=1)
    )
    a5 = _conv(torch.cat([a0, a1, a2, a3, a4], 1), g, f"{prefix}/conv_layer5", padding=1)
    return a0 + scaling * a5


def _deform(x, g, prefix):
    """Deformable conv v1 with the framework's offset convention
    (ops.deform_conv: first K channels dy, last K dx, row-major taps) applied
    to the torch tensor via the slow numpy sampler."""
    from tests.test_ops import _deform_conv_reference

    offsets = _conv(x, g, f"{prefix}/offset_conv", padding=1)
    # exported npz uses offset_order='xy' (x-halves first); convert to ours
    k = offsets.shape[1] // 2
    offsets = torch.cat([offsets[:, k:], offsets[:, :k]], 1)

    x_nhwc = x.permute(0, 2, 3, 1).numpy()
    off_nhwc = offsets.permute(0, 2, 3, 1).numpy()
    w = g[f"{prefix}/deform_conv/W"].transpose(2, 3, 1, 0)  # -> (kh,kw,Cin,Cout)
    out = _deform_conv_reference(
        x_nhwc, off_nhwc, w, g[f"{prefix}/deform_conv/b"]
    )
    return torch.from_numpy(out).permute(0, 3, 1, 2)


def torch_generator_forward(g, x, w1, w2, w3, num_blocks, scaling):
    """The reference GeneratorModel.forward in torch (NCHW)."""
    xb = _conv(x, g, "input_block/conv_on_X")
    w1b = _conv(w1, g, "input_block/conv_on_W1", stride=10)
    w2b = _conv(w2, g, "input_block/conv_on_W2", stride=2)
    w3b = _conv(w3, g, "input_block/conv_on_W3")
    a0 = torch.cat([xb, w1b, w2b, w3b], 1)

    a1 = _lrelu(_conv(a0, g, "pre_residual_conv_layer", padding=1))

    a2 = a1
    for b in range(num_blocks):
        inner = a2
        for j in (1, 2, 3):
            inner = _rdb(
                inner, g, f"residual_network/{b}/residual_dense_block{j}", scaling
            )
        a2 = a2 + scaling * inner

    a3 = a1 + _conv(a2, g, "post_residual_conv_layer", padding=1)

    a4 = a3
    for i in (1, 2):
        a4 = F.interpolate(a4, scale_factor=2, mode="nearest")
        a4 = _lrelu(_conv(a4, g, f"post_upsample_conv_layer_{i}", padding=1))

    a5 = _lrelu(_deform(a4, g, "final_conv_layer1"))
    return _deform(a5, g, "final_conv_layer2")


def test_torch_discriminator_matches_flax():
    """Independent torch implementation of the reference discriminator spec
    (srgan_train.py:591-699: conv0 biased, conv1-9 bias-free + BN eps 1e-5,
    LeakyReLU 0.2, flatten -> 100 -> 1) vs our flax model in eval mode."""
    from deepbedmap_tpu.models import build_discriminator

    model, variables = build_discriminator()
    p = variables["params"]
    bs = variables["batch_stats"]

    channels = [64, 64, 128, 128, 128, 256, 256, 512, 512, 512]
    kernels = [3, 4, 3, 4, 3, 4, 3, 4, 3, 4]
    strides = [1, 2, 1, 2, 1, 2, 1, 2, 1, 2]

    rs = np.random.RandomState(7)
    x = rs.rand(2, 1, 36, 36).astype(np.float32)

    with torch.no_grad():
        a = _t(x)
        for i in range(10):
            layer = p[f"conv_layer{i}"]
            w = _t(np.asarray(layer["kernel"]).transpose(3, 2, 0, 1))
            b = _t(np.asarray(layer["bias"])) if i == 0 else None
            a = F.conv2d(a, w, b, stride=strides[i], padding=1)
            if i > 0:
                bn_p = p[f"batch_norm{i}"]
                bn_s = bs[f"batch_norm{i}"]
                a = F.batch_norm(
                    a,
                    _t(np.asarray(bn_s["mean"])),
                    _t(np.asarray(bn_s["var"])),
                    _t(np.asarray(bn_p["scale"])),
                    _t(np.asarray(bn_p["bias"])),
                    training=False,
                    eps=1e-5,
                )
            a = F.leaky_relu(a, 0.2)
        a = a.reshape(a.shape[0], -1)
        a = F.leaky_relu(
            F.linear(a, _t(np.asarray(p["linear_1"]["kernel"]).T),
                     _t(np.asarray(p["linear_1"]["bias"]))), 0.2,
        )
        logits_torch = F.linear(
            a, _t(np.asarray(p["linear_2"]["kernel"]).T),
            _t(np.asarray(p["linear_2"]["bias"])),
        ).numpy()

    logits_flax = np.asarray(
        model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    )
    np.testing.assert_allclose(logits_torch, logits_flax, rtol=1e-4, atol=1e-5)


def test_torch_reimplementation_matches_flax(tmp_path):
    model, params = build_generator(CFG)
    path = str(tmp_path / "gen.npz")
    export_generator_npz(params, path)
    g = {k: np.asarray(v) for k, v in np.load(path).items()}

    rs = np.random.RandomState(42)
    x = rs.rand(1, 1, 11, 11).astype(np.float32)
    w1 = rs.rand(1, 1, 110, 110).astype(np.float32)
    w2 = rs.rand(1, 2, 22, 22).astype(np.float32)
    w3 = rs.rand(1, 1, 11, 11).astype(np.float32)

    with torch.no_grad():
        ours_torch = torch_generator_forward(
            g, _t(x), _t(w1), _t(w2), _t(w3), CFG.num_residual_blocks,
            CFG.residual_scaling,
        ).numpy()

    ours_flax = np.asarray(
        model.apply(
            {"params": params},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(w1.transpose(0, 2, 3, 1)),
            jnp.asarray(w2.transpose(0, 2, 3, 1)),
            jnp.asarray(w3.transpose(0, 2, 3, 1)),
        )
    ).transpose(0, 3, 1, 2)

    assert ours_torch.shape == ours_flax.shape == (1, 1, 36, 36)
    np.testing.assert_allclose(ours_torch, ours_flax, rtol=1e-4, atol=1e-5)
