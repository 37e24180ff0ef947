"""VGG-style discriminator (reference DiscriminatorModel, srgan_train.py:591-699).

10 conv layers (conv0 with bias, conv1-9 bias-free — the reference passes
``nobias=True`` positionally at srgan_train.py:626-634), BatchNorm(eps=1e-5)
after convs 1-9, LeakyReLU(0.2) throughout, then flatten -> 100 -> 1 with no
sigmoid (folded into the loss). For 36x36 inputs the five stride-2 convs reduce
to 1x1x512 before the head, giving 10,370,761 parameters.
"""

from __future__ import annotations

import jax
from flax import linen as nn

from deepbedmap_tpu.config import DiscriminatorConfig
from deepbedmap_tpu.models.blocks import he_normal_chainer, leaky_relu


class Discriminator(nn.Module):
    cfg: DiscriminatorConfig = DiscriminatorConfig()

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        """x: (N, H, W, 1) NHWC. Returns (N, 1) logits."""
        cfg = self.cfg
        a = x
        for i, (feat, ksize, stride) in enumerate(
            zip(cfg.channels, cfg.kernels, cfg.strides)
        ):
            # Chainer pads both sides by 1 for k3s1 and k4s2; for k4s2 that is
            # asymmetric-equivalent in XLA terms: out = floor((in+2-4)/2)+1.
            a = nn.Conv(
                features=feat,
                kernel_size=(ksize, ksize),
                strides=(stride, stride),
                padding=((1, 1), (1, 1)),
                use_bias=(i == 0),  # only conv0 has a bias
                kernel_init=he_normal_chainer(cfg.init_scale),
                name=f"conv_layer{i}",
            )(a)
            if i > 0:
                a = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=cfg.bn_momentum,
                    epsilon=cfg.bn_eps,
                    name=f"batch_norm{i}",
                )(a)
            a = leaky_relu(a)

        a = a.reshape((a.shape[0], -1))  # flatten, keep batch
        a = leaky_relu(
            nn.Dense(
                cfg.fc_units, kernel_init=he_normal_chainer(cfg.init_scale), name="linear_1"
            )(a)
        )
        return nn.Dense(
            1, kernel_init=he_normal_chainer(cfg.init_scale), name="linear_2"
        )(a)
