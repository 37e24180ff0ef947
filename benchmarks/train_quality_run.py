"""Train-to-quality at reference scale (VERDICT round-1 item 7).

The reference's headline training run: 3826 tiles, 95/5 split, batch 128,
12-RRDB generator, ~140 epochs (srgan_train.py:1608-1706). Here the dataset is
a deterministic synthetic SR task (Y is a known function of X, zero egress =
no real surveys), so test RMSE in metres is meaningful and must *fall*:

- per-epoch RMSE on a held-out fixed region via evalx.make_fixed_evaluator
  (the reference's get_deepbedmap_test_result loop);
- metrics stream to a LocalTracker (experiment key = 'quality-run');
- full-state Orbax checkpoint every epoch + on improvement;
- the run is RESUMABLE: rerunning the script restores the newest checkpoint,
  re-verifies the restored params reproduce the recorded RMSE at the cut
  (resume-equivalence check), and continues — run it repeatedly until it
  prints DONE. A time budget (DBMT_TIME_BUDGET seconds, default 520) makes
  each invocation exit cleanly mid-run, which exercises resume for real.

Writes model/logs/quality_run/: tracker records, rmse_curve.png, RESULTS line.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json
import time

import jax

from deepbedmap_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()  # compiled executables persist across runs

# resumed invocations should not repay the multi-minute train-step compile
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("DEEPBEDMAP_JAX_CACHE", "/tmp/deepbedmap_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

if os.environ.get("CPU") == "1":  # harness smoke test (JAX_PLATFORMS is ignored)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

TOTAL_EPOCHS = int(os.environ.get("EPOCHS", "140"))
# Variants (VERDICT r3 items 3/5):
#   TASK=deterministic (default) — Y exactly learnable from X; validates
#     trainer mechanics + RMSE floor. TASK=rough — Y carries spatially
#     correlated stochastic roughness X cannot predict (the paper's actual
#     premise); per-epoch roughness columns are recorded.
#   RECIPE=reference (default, LossConfig() incl. the reference's detached
#     no-op adversarial term) | healthy (LossConfig.recommended(): live
#     adversarial 0.5 + 100 m instance noise — gan_health Findings 3-4).
#   DTYPE=float32 (default) | bfloat16 (conv compute dtype; precision
#     policy measurement, config.py).
TASK = os.environ.get("TASK", "deterministic")
RECIPE = os.environ.get("RECIPE", "reference")
DTYPE = os.environ.get("DTYPE", "float32")
_suffix = "" if (TASK, RECIPE, DTYPE) == (
    "deterministic", "reference", "float32") else (
    f"_{TASK}_{RECIPE}" + ("_bf16" if DTYPE == "bfloat16" else "")
)
OUT_DIR = os.path.join(
    os.path.dirname(__file__), "..", "model", "logs", f"quality_run{_suffix}"
)
RES = 250.0
N_TILES = int(os.environ.get("TILES", "3826"))  # override small for smoke tests


def build_synthetic_sr_dataset(n: int, seed: int = 0):
    """Y (36x36, metres) is a deterministic bilinear 4x upsample of the inner
    9x9 of X (the generator's crop relation); conditioning rasters are zero so
    the mapping is exactly learnable from X. Elevation scale ~[-800, 800] m."""
    from deepbedmap_tpu.data.dataset import TileDataset

    rs = np.random.RandomState(seed)
    X = (rs.rand(n, 1, 11, 11).astype(np.float32) - 0.5) * 1600.0
    Y = np.asarray(
        jax.vmap(
            lambda x: jax.image.resize(x[0, 1:-1, 1:-1], (36, 36), "linear")[None]
        )(jnp.asarray(X))
    )
    arrays = {
        "X": X,
        "W1": np.zeros((n, 1, 110, 110), np.float32),
        "W2": np.zeros((n, 2, 22, 22), np.float32),
        "W3": np.zeros((n, 1, 11, 11), np.float32),
        "Y": Y,
    }
    return TileDataset.from_nchw(arrays), arrays


def main():
    from deepbedmap_tpu.config import (
        DiscriminatorConfig,
        GeneratorConfig,
        LossConfig,
        TrainConfig,
    )
    from deepbedmap_tpu.data.dataset import epoch_batches, train_dev_split
    from deepbedmap_tpu.evalx.fixed import make_fixed_evaluator
    from deepbedmap_tpu.models import Discriminator, Generator
    from deepbedmap_tpu.train import create_gan_state
    from deepbedmap_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from deepbedmap_tpu.train.loop import _metrics_to_host, make_epoch_fns
    from deepbedmap_tpu.utils.tracking import LocalTracker

    budget = float(os.environ.get("DBMT_TIME_BUDGET", "520"))
    t_start = time.time()
    os.makedirs(OUT_DIR, exist_ok=True)
    ckpt_path = os.path.abspath(os.path.join(OUT_DIR, "checkpoint"))
    meta_path = os.path.join(OUT_DIR, "progress.json")

    # flagship 12-RRDB, residual_scaling 0.1 (+ the variant knobs above;
    # RRDB/BATCH are only for CPU smoke tests of the harness itself)
    g_cfg = GeneratorConfig(
        num_residual_blocks=int(os.environ.get("RRDB", "12")),
        compute_dtype=DTYPE,
    )
    t_cfg = TrainConfig(
        batch_size=int(os.environ.get("BATCH", "128")), learning_rate=1.6e-4
    )
    loss_cfg = LossConfig.recommended() if RECIPE == "healthy" else LossConfig()
    g_model, d_model = Generator(g_cfg), Discriminator(DiscriminatorConfig())

    if TASK == "rough":
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from train_gan_health import build_roughness_sr_dataset

        dataset, arrays = build_roughness_sr_dataset(N_TILES, seed=0)
    else:
        dataset, arrays = build_synthetic_sr_dataset(N_TILES, seed=0)
    train_idx, dev_idx = train_dev_split(len(dataset))

    # fixed test region: one held-out dev tile as the 'Pine Island' stand-in,
    # with 500 track points sampled from its true bed
    test_tile = int(dev_idx[0])
    truth = arrays["Y"][test_tile, 0]  # (36, 36) metres
    bounds = (0.0, 0.0, 36 * RES, 36 * RES)
    rs_track = np.random.RandomState(7)
    tx = rs_track.uniform(2 * RES, 34 * RES, 500).astype(np.float32)
    ty = rs_track.uniform(2 * RES, 34 * RES, 500).astype(np.float32)
    from deepbedmap_tpu.ops.interp import sample_grid_bicubic

    tz = np.asarray(
        sample_grid_bicubic(
            jnp.asarray(truth), jnp.asarray(tx), jnp.asarray(ty),
            bounds[0], bounds[3], RES,
        )
    )
    inputs_nchw = {k: arrays[k][test_tile : test_tile + 1] for k in
                   ("X", "W1", "W2", "W3")}
    evaluate = make_fixed_evaluator(
        g_model, inputs_nchw, (tx, ty, tz), bounds, resolution=RES
    )

    train_fn, eval_fn = make_epoch_fns(
        g_model, d_model, dataset, t_cfg, loss_cfg=loss_cfg
    )
    tracker = LocalTracker(OUT_DIR, experiment_key=f"quality-run{_suffix}")

    # roughness probe (rough task): median 5x5 rolling-std of the DETRENDED
    # generated/real dev tiles — the paper's roughness statistic
    # (viz/analysis.py); rough_gen -> rough_real is what a live adversarial
    # term buys (gan_health summary.md Findings 3-4)
    roughness_probe = None
    if TASK == "rough":
        from deepbedmap_tpu.viz.analysis import standard_deviation_2d

        probe_n = 128

        @jax.jit
        def roughness_probe(g_params, probe):
            pred = g_model.apply(
                {"params": g_params}, probe["X"], probe["W1"], probe["W2"],
                probe["W3"],
            )
            smooth = jax.vmap(
                lambda x: jax.image.resize(x[1:-1, 1:-1, 0], (36, 36), "linear")
            )(probe["X"])
            med = lambda a: jnp.nanmedian(  # noqa: E731
                jax.vmap(standard_deviation_2d)(a)
            )
            return (
                med(pred[..., 0] - smooth), med(probe["Y"][..., 0] - smooth)
            )

        probe_batch = dataset.take(jnp.asarray(dev_idx[:probe_n]))

    state = create_gan_state(g_cfg, t_cfg=t_cfg)
    steps_per_epoch = len(train_idx) // t_cfg.batch_size
    start_epoch = 0
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
        state = restore_checkpoint(ckpt_path, state)
        # kill-safe resume: the epoch count comes from the checkpoint itself
        # (state.step), so a hard kill between checkpoint and meta writes
        # cannot desynchronise the run
        start_epoch = int(state.step) // steps_per_epoch
        rmse_now = float(evaluate(state.g_params))
        if meta["next_epoch"] == start_epoch:
            # resume-equivalence: restored params must reproduce the RMSE
            # recorded when the checkpoint was written
            drift = abs(rmse_now - meta["rmse_at_checkpoint"])
            print(
                f"resumed at epoch {start_epoch}: recorded rmse "
                f"{meta['rmse_at_checkpoint']:.4f}, recomputed {rmse_now:.4f}, "
                f"drift {drift:.2e}",
                flush=True,
            )
            assert drift < 1e-3, "restored state does not reproduce recorded RMSE"
        else:
            print(
                f"resumed at epoch {start_epoch} (meta said "
                f"{meta['next_epoch']}; checkpoint wins), rmse {rmse_now:.4f}",
                flush=True,
            )
    else:
        tracker.log_params(
            {
                "num_residual_blocks": g_cfg.num_residual_blocks,
                "residual_scaling": g_cfg.residual_scaling,
                "learning_rate": t_cfg.learning_rate,
                "batch_size": t_cfg.batch_size,
                "num_epochs": TOTAL_EPOCHS,
                "tiles": len(dataset),
            }
        )

    # carry the true best across resumed invocations
    best = (
        float(json.load(open(meta_path)).get("best_rmse", float("inf")))
        if os.path.exists(meta_path)
        else float("inf")
    )
    t_clock = None  # budget clock starts after the first (compile-laden) epoch
    for epoch in range(start_epoch, TOTAL_EPOCHS):
        # per-epoch seeded shuffle so a resumed run sees the same batch order
        rs = np.random.RandomState(42 + epoch)
        batches = jnp.asarray(epoch_batches(train_idx, t_cfg.batch_size, rs))
        t0 = time.time()
        state, metrics = train_fn(state, batches)
        rmse_test = float(evaluate(state.g_params))
        dt = time.time() - t0
        if t_clock is None:
            t_clock = time.time()
        record = {
            **_metrics_to_host(metrics, ""),
            "rmse_test": rmse_test,
            "epoch_seconds": dt,
        }
        if roughness_probe is not None:
            rg, rr = roughness_probe(state.g_params, probe_batch)
            record["rough_gen"], record["rough_real"] = float(rg), float(rr)
        tracker.log_metrics(record, step=epoch)
        print(
            f"epoch {epoch:3d}: g_loss {record['generator_loss']:8.4f} "
            f"rmse_test {rmse_test:8.3f} m  ({dt:.1f}s)"
            + (
                f"  rough {record['rough_gen']:.1f}/{record['rough_real']:.1f}"
                if "rough_gen" in record else ""
            ),
            flush=True,
        )
        best = min(best, rmse_test)

        # full-state Orbax save costs ~5 s — checkpoint every 5th epoch (and
        # the last), not every epoch; a kill loses at most 5 epochs
        if epoch % 5 == 4 or epoch == TOTAL_EPOCHS - 1:
            save_checkpoint(state, ckpt_path)
            json.dump(
                {"next_epoch": epoch + 1, "rmse_at_checkpoint": rmse_test,
                 "best_rmse": best},
                open(meta_path, "w"),
            )
        if time.time() - t_clock > budget:
            print(f"time budget reached at epoch {epoch}; rerun to resume",
                  flush=True)
            return

    # --- curve + summary ---
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # resumed invocations may replay epochs since the last checkpoint —
    # keep the last record per epoch
    by_step = {m["step"]: m for m in tracker.metrics()}
    hist = [by_step[s] for s in sorted(by_step)]
    steps = [m["step"] for m in hist]
    rmses = [m["metrics"]["rmse_test"] for m in hist]
    fig, ax = plt.subplots(figsize=(9, 5))
    ax.plot(steps, rmses, lw=1.2, label="test RMSE")
    ax.set_xlabel("Epoch")
    ax.set_ylabel("Fixed-region test RMSE (m)")
    ax.set_yscale("log")
    if "rough_gen" in hist[-1]["metrics"]:
        ax2 = ax.twinx()
        ax2.plot(
            steps, [m["metrics"]["rough_gen"] for m in hist],
            lw=1.0, color="C2", label="rough_gen",
        )
        ax2.axhline(
            hist[-1]["metrics"]["rough_real"], color="C3", ls="--", lw=0.8,
            label="rough_real",
        )
        ax2.set_ylabel("median 5x5 rolling-std of detrended tiles (m)")
        ax2.legend(loc="upper right")
    ax.set_title(
        f"Reference-scale quality run ({TASK}/{RECIPE}/{DTYPE}): "
        f"3826 tiles, batch 128, 12 RRDB, {TOTAL_EPOCHS} epochs"
    )
    fig.tight_layout()
    fig.savefig(os.path.join(OUT_DIR, "rmse_curve.png"), dpi=120)

    summary = {
        "metric": f"quality_run{_suffix}_{TOTAL_EPOCHS}_epochs",
        "task": TASK,
        "recipe": RECIPE,
        "compute_dtype": DTYPE,
        "first_rmse_m": round(rmses[0], 3),
        "best_rmse_m": round(min(rmses), 3),
        "final_rmse_m": round(rmses[-1], 3),
        "median_epoch_s": round(float(np.median(
            [m["metrics"]["epoch_seconds"] for m in hist[1:]])), 2),
    }
    if "rough_gen" in hist[-1]["metrics"]:
        summary["final_rough_gen_m"] = round(
            hist[-1]["metrics"]["rough_gen"], 2
        )
        summary["final_rough_real_m"] = round(
            hist[-1]["metrics"]["rough_real"], 2
        )
    print(json.dumps(summary))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
