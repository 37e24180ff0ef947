"""Fused GAN train/eval steps.

The reference runs the D update then the G update as separate Python calls per
minibatch (trainer, srgan_train.py:1286-1308). Here both are one jitted function
— one dispatch per step, state donated, ready to wrap in jit-with-shardings for
data parallelism (the batch axis is the only sharded axis; parameter updates
become identical on every device after the automatic gradient psum).

Parity-relevant semantics preserved from the reference:
- D step: G forward with no gradient; D applied to real then fake in train mode,
  so BatchNorm batch stats update twice sequentially (srgan_train.py:1131-1146).
- G step: D applied in eval mode (running-average BN, srgan_train.py:1228-1229);
  the adversarial term uses *detached* fake logits and literal ones for real
  labels (srgan_train.py:1229-1233) and therefore carries no gradient — kept
  behind LossConfig.differentiable_adversarial=False (default) with the
  corrected differentiable RaGAN available when True.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from deepbedmap_tpu.config import LossConfig, TrainConfig
from deepbedmap_tpu.models.discriminator import Discriminator
from deepbedmap_tpu.models.generator import Generator
from deepbedmap_tpu.ops.losses import (
    binary_accuracy,
    generator_loss,
    ragan_loss,
)
from deepbedmap_tpu.ops.metrics import psnr
from deepbedmap_tpu.ops.ssim import ssim
from deepbedmap_tpu.train.state import GANState, make_optimizer


@flax.struct.dataclass
class StepMetrics:
    """The ten metric series the reference logs (srgan_train.py:1296-1327)."""

    discriminator_loss: jax.Array
    discriminator_accu: jax.Array
    generator_loss: jax.Array
    generator_psnr: jax.Array
    generator_ssim: jax.Array


Batch = Dict[str, jax.Array]  # keys: X, W1, W2, W3, Y — all NHWC


def make_d_loss_fn(d_model: Discriminator):
    """Discriminator loss closure (exposed for tests/diagnostics)."""

    def d_loss_fn(d_params, d_batch_stats, fake, real):
        # two sequential train-mode D forwards, real first (reference order)
        real_logits, mut = d_model.apply(
            {"params": d_params, "batch_stats": d_batch_stats},
            real,
            train=True,
            mutable=["batch_stats"],
        )
        fake_logits, mut = d_model.apply(
            {"params": d_params, "batch_stats": mut["batch_stats"]},
            fake,
            train=True,
            mutable=["batch_stats"],
        )
        loss = ragan_loss(real_logits, fake_logits)
        accu = binary_accuracy(
            jnp.concatenate([real_logits, fake_logits]),
            jnp.concatenate(
                [jnp.ones_like(real_logits), jnp.zeros_like(fake_logits)]
            ),
        )
        return loss, (mut["batch_stats"], accu)

    return d_loss_fn


def make_g_loss_fn(
    g_model: Generator, d_model: Discriminator, loss_cfg: LossConfig = LossConfig()
):
    """Generator loss closure (exposed for tests/diagnostics)."""

    def g_loss_fn(g_params, d_params, d_batch_stats, batch):
        fake = g_model.apply(
            {"params": g_params}, batch["X"], batch["W1"], batch["W2"], batch["W3"]
        )
        # D in eval mode: running-average BN, stats not updated
        fake_logits = d_model.apply(
            {"params": d_params, "batch_stats": d_batch_stats}, fake, train=False
        )
        if not loss_cfg.differentiable_adversarial:
            fake_logits = jax.lax.stop_gradient(fake_logits)
            real_logits = jnp.ones_like(fake_logits)
        else:
            real_logits = d_model.apply(
                {"params": d_params, "batch_stats": d_batch_stats},
                batch["Y"],
                train=False,
            )
        terms = generator_loss(
            y_pred=fake,
            y_true=batch["Y"],
            fake_logits=fake_logits,
            real_logits=real_logits,
            x_topo=batch["X"][:, 1:-1, 1:-1, :],
            cfg=loss_cfg,
        )
        g_psnr = psnr(jax.lax.stop_gradient(fake), batch["Y"])
        g_ssim = ssim(jax.lax.stop_gradient(fake), batch["Y"], loss_cfg.ssim_window)
        return terms.total, (g_psnr, g_ssim)

    return g_loss_fn


def make_train_step(
    g_model: Generator,
    d_model: Discriminator,
    t_cfg: TrainConfig = TrainConfig(),
    loss_cfg: LossConfig = LossConfig(),
) -> Callable[[GANState, Batch], Tuple[GANState, StepMetrics]]:
    """Build the fused jitted D+G train step."""
    tx = make_optimizer(t_cfg)
    tx_d = make_optimizer(t_cfg, lr_scale=t_cfg.d_lr_scale)
    d_loss_fn = make_d_loss_fn(d_model)
    g_loss_fn = make_g_loss_fn(g_model, d_model, loss_cfg)

    def train_step(state: GANState, batch: Batch) -> Tuple[GANState, StepMetrics]:
        # ---- discriminator update (G frozen) ----
        fake = jax.lax.stop_gradient(
            g_model.apply(
                {"params": state.g_params},
                batch["X"],
                batch["W1"],
                batch["W2"],
                batch["W3"],
            )
        )
        real = batch["Y"]
        if loss_cfg.d_instance_noise > 0:
            # instance noise on the D update only: overlap real/fake supports
            # so D stays informative instead of saturating (LossConfig)
            key = jax.random.fold_in(
                jax.random.PRNGKey(loss_cfg.instance_noise_seed), state.step
            )
            k_fake, k_real = jax.random.split(key)
            sigma = loss_cfg.d_instance_noise
            if loss_cfg.instance_noise_half_life_steps > 0:
                # traced function of state.step: decays inside the jitted
                # graph, no recompile per sigma value
                sigma = sigma * 0.5 ** (
                    state.step.astype(jnp.float32)
                    / loss_cfg.instance_noise_half_life_steps
                )
            fake = fake + sigma * jax.random.normal(k_fake, fake.shape)
            real = real + sigma * jax.random.normal(k_real, real.shape)
        (d_loss, (new_bs, d_accu)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d_params, state.d_batch_stats, fake, real)
        d_updates, d_opt = tx_d.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- generator update (D frozen, post-update D params as in reference) ----
        (g_loss, (g_psnr, g_ssim)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params, d_params, new_bs, batch)
        g_updates, g_opt = tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        if t_cfg.ema_decay > 0:
            d_ema = t_cfg.ema_decay
            g_ema = jax.tree_util.tree_map(
                lambda e, p: d_ema * e + (1.0 - d_ema) * p,
                state.g_ema,
                g_params,
            )
        else:
            g_ema = state.g_ema

        new_state = GANState(
            step=state.step + 1,
            g_params=g_params,
            g_opt=g_opt,
            d_params=d_params,
            d_batch_stats=new_bs,
            d_opt=d_opt,
            g_ema=g_ema,
        )
        metrics = StepMetrics(d_loss, d_accu, g_loss, g_psnr, g_ssim)
        return new_state, metrics

    return train_step


def make_eval_step(
    g_model: Generator,
    d_model: Discriminator,
    loss_cfg: LossConfig = LossConfig(),
) -> Callable[[GANState, Batch], StepMetrics]:
    """Evaluation pass: same metrics, no updates, all-eval-mode BN
    (reference train=False paths, srgan_train.py:1311-1327)."""

    def eval_step(state: GANState, batch: Batch) -> StepMetrics:
        fake = g_model.apply(
            {"params": state.g_params},
            batch["X"],
            batch["W1"],
            batch["W2"],
            batch["W3"],
        )
        d_vars = {"params": state.d_params, "batch_stats": state.d_batch_stats}
        real_logits = d_model.apply(d_vars, batch["Y"], train=False)
        fake_logits = d_model.apply(d_vars, fake, train=False)
        d_loss = ragan_loss(real_logits, fake_logits)
        d_accu = binary_accuracy(
            jnp.concatenate([real_logits, fake_logits]),
            jnp.concatenate(
                [jnp.ones_like(real_logits), jnp.zeros_like(fake_logits)]
            ),
        )
        terms = generator_loss(
            y_pred=fake,
            y_true=batch["Y"],
            fake_logits=fake_logits,
            real_logits=jnp.ones_like(fake_logits),
            x_topo=batch["X"][:, 1:-1, 1:-1, :],
            cfg=loss_cfg,
        )
        return StepMetrics(
            d_loss,
            d_accu,
            terms.total,
            psnr(fake, batch["Y"]),
            ssim(fake, batch["Y"], loss_cfg.ssim_window),
        )

    return eval_step
