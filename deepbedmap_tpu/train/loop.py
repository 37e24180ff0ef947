"""Epoch loop: the reference's ``trainer`` (srgan_train.py:1267-1329) as a scan.

One jitted call per epoch: ``lax.scan`` over an index matrix gathers minibatches
from the device-resident dataset and threads the donated GAN state through the
fused train step. Metrics come back stacked per step; the host reduces them to
the same per-epoch means the reference logs to Comet (srgan_train.py:1592-1599).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepbedmap_tpu.config import LossConfig, TrainConfig
from deepbedmap_tpu.data.dataset import TileDataset, epoch_batches, train_dev_split
from deepbedmap_tpu.models.discriminator import Discriminator
from deepbedmap_tpu.models.generator import Generator
from deepbedmap_tpu.train.state import GANState
from deepbedmap_tpu.train.steps import StepMetrics, make_eval_step, make_train_step


def _metrics_to_host(metrics: StepMetrics, prefix: str) -> Dict[str, float]:
    return {
        f"{prefix}{name}": float(np.mean(np.asarray(value)))
        for name, value in vars(metrics).items()
    }


def make_epoch_fns(
    g_model: Generator,
    d_model: Discriminator,
    dataset: TileDataset,
    t_cfg: TrainConfig = TrainConfig(),
    loss_cfg: LossConfig = LossConfig(),
):
    """Build jitted (train_epoch, eval_epoch) closed over the device dataset."""
    train_step = make_train_step(g_model, d_model, t_cfg, loss_cfg)
    eval_step = make_eval_step(g_model, d_model, loss_cfg)

    @functools.partial(jax.jit, donate_argnums=0)
    def train_epoch(state: GANState, batch_indices: jax.Array):
        def body(carry, idx):
            new_state, metrics = train_step(carry, dataset.take(idx))
            return new_state, metrics

        return jax.lax.scan(body, state, batch_indices)

    @jax.jit
    def eval_epoch(state: GANState, batch_indices: jax.Array) -> StepMetrics:
        def body(_, idx):
            return None, eval_step(state, dataset.take(idx))

        _, metrics = jax.lax.scan(body, None, batch_indices)
        return metrics

    return train_epoch, eval_epoch


def train_epoch(
    state: GANState,
    dataset: TileDataset,
    g_model: Generator,
    d_model: Discriminator,
    indices: np.ndarray,
    rs: np.random.RandomState,
    t_cfg: TrainConfig = TrainConfig(),
    loss_cfg: LossConfig = LossConfig(),
) -> Tuple[GANState, Dict[str, float]]:
    """Single-epoch convenience wrapper (rebuilds jit closures; prefer
    ``make_epoch_fns`` + ``fit`` for real runs)."""
    train_fn, _ = make_epoch_fns(g_model, d_model, dataset, t_cfg, loss_cfg)
    batches = jnp.asarray(epoch_batches(indices, t_cfg.batch_size, rs))
    state, metrics = train_fn(state, batches)
    return state, _metrics_to_host(metrics, "")


def fit(
    state: GANState,
    dataset: TileDataset,
    g_model: Generator,
    d_model: Discriminator,
    t_cfg: TrainConfig = TrainConfig(),
    loss_cfg: LossConfig = LossConfig(),
    epochs: Optional[int] = None,
    callback: Optional[Callable[[int, Dict[str, float]], bool]] = None,
) -> Tuple[GANState, list]:
    """Full training run (reference objective() inner loop,
    srgan_train.py:1608-1706).

    ``callback(epoch, metrics) -> stop`` supports the reference's pruning
    behaviour: return True to stop early (NaN loss / diverged PSNR / Hyperband,
    srgan_train.py:1698-1706).
    """
    epochs = t_cfg.epochs if epochs is None else epochs
    train_idx, dev_idx = train_dev_split(
        len(dataset), t_cfg.train_fraction, t_cfg.split_seed
    )
    train_fn, eval_fn = make_epoch_fns(g_model, d_model, dataset, t_cfg, loss_cfg)
    rs = np.random.RandomState(t_cfg.seed)

    # Dev batches are fixed across epochs (the reference re-iterates the same
    # dev set, srgan_train.py:1311-1327). Fall back to one full-dev batch when
    # the split is smaller than batch_size.
    dev_bs = min(t_cfg.batch_size, len(dev_idx))
    dev_batches = jnp.asarray(
        epoch_batches(dev_idx, dev_bs, np.random.RandomState(t_cfg.split_seed))
    )

    history = []
    for epoch in range(epochs):
        batches = jnp.asarray(epoch_batches(train_idx, t_cfg.batch_size, rs))
        state, train_metrics = train_fn(state, batches)
        dev_metrics = eval_fn(state, dev_batches)
        record = {
            "epoch": epoch,
            **_metrics_to_host(train_metrics, ""),
            **_metrics_to_host(dev_metrics, "val_"),
        }
        history.append(record)
        if callback is not None and callback(epoch, record):
            break
    return state, history
