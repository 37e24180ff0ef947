"""Train-state pytrees.

The reference holds two Chainer links and two Adam optimizers
(compile_srgan_model, srgan_train.py:1014-1055). Here all of it is one pytree —
generator params, discriminator params + batch stats, and both optax Adam
states — so a single donated argument flows through the jitted train step.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax

from deepbedmap_tpu.config import (
    DiscriminatorConfig,
    GeneratorConfig,
    TrainConfig,
)
from deepbedmap_tpu.models.api import build_discriminator, build_generator


@flax.struct.dataclass
class GANState:
    step: jax.Array
    g_params: Any
    g_opt: Any
    d_params: Any
    d_batch_stats: Any
    d_opt: Any
    # EMA of g_params (None unless TrainConfig.ema_decay > 0) — the standard
    # GAN variance-reduction average the reference never applied; inference
    # uses it via `state.g_ema or state.g_params`.
    g_ema: Any = None


def make_lr(cfg: TrainConfig):
    """Learning-rate schedule: the reference's constant alpha, or cosine
    decay to ``lr * lr_final_scale`` over ``lr_total_steps`` with
    ``lr_warmup_steps`` of linear warmup."""
    if cfg.lr_schedule == "constant":
        return cfg.learning_rate
    if cfg.lr_schedule == "cosine":
        assert cfg.lr_total_steps > 0, "cosine schedule needs lr_total_steps"
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if cfg.lr_warmup_steps else cfg.learning_rate,
            peak_value=cfg.learning_rate,
            warmup_steps=cfg.lr_warmup_steps,
            decay_steps=cfg.lr_total_steps,
            end_value=cfg.learning_rate * cfg.lr_final_scale,
        )
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")


def make_optimizer(
    cfg: TrainConfig, lr_scale: float = 1.0
) -> optax.GradientTransformation:
    """Adam exactly as the reference configures it (alpha=lr, eps=1e-8,
    default betas; srgan_train.py:1043-1048), with the optional schedule.
    ``lr_scale`` multiplies the (possibly scheduled) learning rate — used
    for the discriminator's TTUR knob (TrainConfig.d_lr_scale)."""
    lr = make_lr(cfg)
    if lr_scale != 1.0:
        lr = (lambda s, base=lr: base(s) * lr_scale) if callable(lr) else lr * lr_scale
    return optax.adam(
        learning_rate=lr,
        b1=cfg.adam_beta1,
        b2=cfg.adam_beta2,
        eps=cfg.adam_eps,
    )


def create_gan_state(
    g_cfg: GeneratorConfig = GeneratorConfig(),
    d_cfg: DiscriminatorConfig = DiscriminatorConfig(),
    t_cfg: TrainConfig = TrainConfig(),
    seed: int | None = None,
) -> GANState:
    seed = t_cfg.seed if seed is None else seed
    _, g_params = build_generator(g_cfg, seed=seed)
    _, d_vars = build_discriminator(d_cfg, seed=seed + 1)
    tx = make_optimizer(t_cfg)
    return GANState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        g_params=g_params,
        g_opt=tx.init(g_params),
        d_params=d_vars["params"],
        d_batch_stats=d_vars["batch_stats"],
        d_opt=tx.init(d_vars["params"]),
        g_ema=(
            jax.tree_util.tree_map(jax.numpy.copy, g_params)
            if t_cfg.ema_decay > 0
            else None
        ),
    )
