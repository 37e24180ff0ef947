"""Non-degenerate GAN training demo (round-2 verdict weak #4).

The reference-scale quality run trains on a learnable synthetic SR task where
the discriminator trivially wins (D-accuracy pinned at 1.0 from epoch ~2,
model/logs/quality_run/): the adversarial term is inert, so the run validates
trainer mechanics but not GAN dynamics. This run makes the real/fake
distributions OVERLAP via instance noise on the discriminator's inputs
(LossConfig.d_instance_noise; Sonderby et al. 2017) and ablates the
training-quality knobs the reference never explored:

    A  reference config (no noise)           — degenerate control (D-accu ~1.0)
    B  + instance noise sigma=50 m           — healthy D-accuracy band
    C  B + EMA of generator weights (0.999)  — RMSE evaluated raw AND with EMA
    D  B + differentiable adversarial loss

Task + scale match the quality run exactly (build_synthetic_sr_dataset: 3826
tiles, elevation ~[-800, 800] m, batch 128, 12-RRDB, one v5e) so sigma is in
metres and comparable to the generator's residual (~70 m @ epoch 10, ~27 m @
epoch 30 per the quality-run curve) — the overlap is engineered to kick in
mid-run, pulling D off its 1.0 saturation. An earlier attempt used the
*unlearnable* pure-noise TileDataset.synthetic and sigma=0.10: G's residual
never shrank below sigma, D recovered to 0.998, and RMSE meant nothing —
wrong task for this demo (kept here as a negative result).

Writes benchmarks/gan_health/records.jsonl (one line per epoch per config)
and benchmarks/gan_health/summary.md.

Run detached (TPU compile of 4 step variants ~6 min each through the tunnel):
  setsid nohup python benchmarks/train_gan_health.py > /tmp/gan_health.log 2>&1 &
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "gan_health")
EPOCHS = int(os.environ.get("EPOCHS", "30"))
TILES = 3826
# Overridable for follow-up passes: SIGMA=25 APPEND=1 python ...
SIGMA = float(os.environ.get("SIGMA", "50.0"))
APPEND = os.environ.get("APPEND", "") == "1"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_config(name, dataset, loss_cfg, t_cfg, records):
    from deepbedmap_tpu.config import DiscriminatorConfig, GeneratorConfig
    from deepbedmap_tpu.data.dataset import epoch_batches, train_dev_split
    from deepbedmap_tpu.models import Discriminator, Generator
    from deepbedmap_tpu.train.loop import _metrics_to_host, make_epoch_fns
    from deepbedmap_tpu.train.state import create_gan_state

    g_cfg = GeneratorConfig()
    g_model = Generator(g_cfg)
    d_model = Discriminator(DiscriminatorConfig())
    state = create_gan_state(g_cfg, t_cfg=t_cfg)
    train_idx, dev_idx = train_dev_split(
        len(dataset), t_cfg.train_fraction, t_cfg.split_seed
    )
    train_fn, eval_fn = make_epoch_fns(
        g_model, d_model, dataset, t_cfg, loss_cfg=loss_cfg
    )
    rs = np.random.RandomState(t_cfg.seed)
    dev_batches = jnp.asarray(
        epoch_batches(dev_idx, min(t_cfg.batch_size, len(dev_idx)),
                      np.random.RandomState(t_cfg.split_seed))
    )

    def to_rmse(psnr_val):
        # PSNR (data_range 2^32, reference convention) -> RMSE in metres
        return float(2.0 ** 32 * 10 ** (-psnr_val / 20))

    log(f"[{name}] compiling + training {EPOCHS} epochs...")
    t0 = time.perf_counter()
    for epoch in range(EPOCHS):
        batches = jnp.asarray(epoch_batches(train_idx, t_cfg.batch_size, rs))
        state, train_metrics = train_fn(state, batches)
        dev_metrics = eval_fn(state, dev_batches)
        rec = {
            "config": name,
            "epoch": epoch,
            **_metrics_to_host(train_metrics, ""),
            **_metrics_to_host(dev_metrics, "val_"),
        }
        rec["val_rmse"] = to_rmse(rec["val_generator_psnr"])
        if state.g_ema is not None:
            # the EMA knob only matters if the *averaged* weights are what you
            # serve — evaluate them alongside the raw ones
            ema_metrics = eval_fn(state.replace(g_params=state.g_ema), dev_batches)
            rec["val_rmse_ema"] = to_rmse(
                _metrics_to_host(ema_metrics, "")["generator_psnr"]
            )
        records.append(rec)
        with open(os.path.join(OUT_DIR, "records.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
        if epoch % 5 == 0 or epoch == EPOCHS - 1:
            log(f"[{name}] epoch {epoch}: d_accu {rec['discriminator_accu']:.3f} "
                f"val_rmse {rec['val_rmse']:.1f}"
                + (f" ema {rec['val_rmse_ema']:.1f}" if "val_rmse_ema" in rec else ""))
    log(f"[{name}] done in {time.perf_counter() - t0:.0f} s")
    return records


def main():
    from benchmarks.train_quality_run import build_synthetic_sr_dataset
    from deepbedmap_tpu.config import LossConfig, TrainConfig

    os.makedirs(OUT_DIR, exist_ok=True)
    if not APPEND:
        open(os.path.join(OUT_DIR, "records.jsonl"), "w").close()
    log(f"devices: {jax.devices()}")
    dataset, _ = build_synthetic_sr_dataset(TILES, seed=0)

    base_t = TrainConfig(batch_size=128)
    ema_t = TrainConfig(batch_size=128, ema_decay=0.999)
    steps_per_epoch = int(TILES * base_t.train_fraction) // base_t.batch_size

    spec = os.environ.get("GAN_CONFIGS", "")
    if spec:
        # e.g. GAN_CONFIGS='[{"name":"S300hl17","sigma":300,"hl_epochs":17,
        #                     "ema":false,"diffadv":false,"d_lr":0.1}]'
        #      EPOCHS=10 APPEND=1
        configs = []
        for c in json.loads(spec):
            hl = c.get("hl_epochs", 0) * steps_per_epoch
            t = ema_t if c.get("ema") else base_t
            if c.get("d_lr", 1.0) != 1.0:
                # inverted TTUR: slow the discriminator's Adam
                t = dataclasses.replace(t, d_lr_scale=c["d_lr"])
            configs.append((
                c["name"],
                LossConfig(
                    d_instance_noise=c.get("sigma", 0.0),
                    instance_noise_half_life_steps=hl,
                    differentiable_adversarial=c.get("diffadv", False),
                ),
                t,
            ))
    else:
        tag = f"{SIGMA:g}m"
        configs = [
            (f"B_noise{tag}", LossConfig(d_instance_noise=SIGMA), base_t),
            (f"C_noise{tag}_ema", LossConfig(d_instance_noise=SIGMA), ema_t),
            (f"D_noise{tag}_diffadv",
             LossConfig(d_instance_noise=SIGMA, differentiable_adversarial=True),
             base_t),
        ]
        if not APPEND:
            configs.insert(0, ("A_reference", LossConfig(), base_t))
    records = []
    for name, loss_cfg, t_cfg in configs:
        run_config(name, dataset, loss_cfg, t_cfg, records)

    # summary table
    lines = [
        "# GAN training health (instance noise + knob ablation)",
        "",
        f"Quality-run task and scale ({TILES} tiles, elevation ~[-800, 800] m,"
        f" batch 128, 12-RRDB, {EPOCHS} epochs, one v5e). D-accuracy band over"
        " the last 10 epochs + final dev RMSE in metres (C also evaluated with"
        " the EMA weights).",
        "",
        "| Config | D-accu (last-10 min..max) | mean | final val RMSE (m) |",
        "|---|---|---|---|",
    ]
    for name, _, _ in configs:
        rs_ = [r for r in records if r["config"] == name]
        acc = [r["discriminator_accu"] for r in rs_[-10:]]
        rmse = f"{rs_[-1]['val_rmse']:.1f}"
        if "val_rmse_ema" in rs_[-1]:
            rmse += f" (ema {rs_[-1]['val_rmse_ema']:.1f})"
        lines.append(
            f"| {name} | {min(acc):.3f}..{max(acc):.3f} | "
            f"{np.mean(acc):.3f} | {rmse} |"
        )
    mode = "a" if APPEND else "w"
    with open(os.path.join(OUT_DIR, "summary.md"), mode) as f:
        f.write("\n".join(lines) + "\n")
    log("\n".join(lines))
    log("DONE")


if __name__ == "__main__":
    main()
