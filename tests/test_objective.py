"""End-to-end HPO objective test on a tiny synthetic dataset."""

import numpy as np
import pytest

from deepbedmap_tpu.data.dataset import TileDataset
from deepbedmap_tpu.hpo import TrialPruned, create_study
from deepbedmap_tpu.train.objective import objective


def tiny_space(trial):
    return dict(
        batch_size_exponent=trial.suggest_int("batch_size_exponent", 1, 1),
        learning_rate=trial.suggest_float("learning_rate", 1e-4, 2e-4, step=0.5e-4),
        num_residual_blocks=trial.suggest_int("num_residual_blocks", 1, 1),
        residual_scaling=trial.suggest_float("residual_scaling", 0.1, 0.3, step=0.1),
        num_epochs=trial.suggest_int("num_epochs", 2, 2),
    )


def test_objective_runs_and_checkpoints(tmp_path):
    dataset = TileDataset.synthetic(8, seed=0)
    study = create_study(direction="minimize", sampler_seed=0, pruner="none")
    records = []

    value = objective(
        study.ask(),
        dataset,
        checkpoint_dir=str(tmp_path),
        rmse_save_threshold=float("inf"),
        log=lambda epoch, rec: records.append((epoch, rec)),
        suggest=tiny_space,
    )
    assert np.isfinite(value)
    assert len(records) == 2
    assert "rmse_test" in records[0][1]
    assert (tmp_path / "trial_0").exists()


def test_objective_tracker_roundtrip(tmp_path):
    """HPO -> tracker -> DeepBedMap.from_experiment closes the reference's
    Comet loop (srgan_train.py:1575-1688 + deepbedmap.py:381-410): params +
    per-epoch metrics logged, best weights uploaded as the reference-named
    npz, model graph set, and the trained generator rebuilt by key."""
    import jax.numpy as jnp

    from deepbedmap_tpu.api import DeepBedMap
    from deepbedmap_tpu.utils.tracking import LocalTracker

    from deepbedmap_tpu.evalx.fixed import make_fixed_evaluator

    dataset = TileDataset.synthetic(8, seed=0)
    study = create_study(direction="minimize", sampler_seed=0, pruner="none")
    root = str(tmp_path / "experiments")
    tracker = LocalTracker(root)

    # a wired fixed-test-area evaluator (built per trial from ITS generator):
    # the objective then logs real metres AND one predicted test-area image
    # per epoch, like the reference's Comet runs (srgan_train.py:1640-1654)
    rs = np.random.RandomState(0)
    inputs_nchw = {
        "X": rs.rand(1, 1, 11, 11).astype(np.float32),
        "W1": rs.rand(1, 1, 110, 110).astype(np.float32),
        "W2": rs.rand(1, 2, 22, 22).astype(np.float32),
        "W3": rs.rand(1, 1, 11, 11).astype(np.float32),
    }
    bounds = (0.0, 0.0, 36 * 250.0, 36 * 250.0)
    track = (
        rs.uniform(1000, 8000, 40).astype(np.float32),
        rs.uniform(1000, 8000, 40).astype(np.float32),
        rs.randn(40).astype(np.float32),
    )

    value = objective(
        study.ask(),
        dataset,
        suggest=tiny_space,
        tracker=tracker,
        rmse_save_threshold=float("inf"),
        rmse_upload_threshold=float("inf"),
        make_evaluator=lambda g_model: make_fixed_evaluator(
            g_model, inputs_nchw, track, bounds
        ),
    )
    tracker.end()

    # one predicted test-area image per epoch
    assets = tracker.asset_list()
    for epoch in (0, 1):
        assert f"epoch_{epoch:03d}_predicted_test_image.png" in assets
    rec0 = tracker.metrics()[0]["metrics"]
    assert rec0["rmse_is_proxy"] is False  # real metres, not the loss proxy

    # the experiment carries everything from_experiment needs
    assert tracker.params()["num_residual_blocks"] == 1
    assert "residual_scaling" in tracker.params()
    assert len(tracker.metrics()) == 2  # one record per epoch
    assert "rmse_test" in tracker.metrics()[0]["metrics"]
    assert "srgan_generator_model_weights.npz" in tracker.asset_list()
    import os

    assert os.path.exists(os.path.join(tracker.dir, "graph.txt"))

    dbm = DeepBedMap.from_experiment(
        root,
        "latest",
        download_path=str(tmp_path / "fetched" / "weights.npz"),
    )
    assert dbm.cfg.num_residual_blocks == 1
    assert abs(dbm.cfg.residual_scaling - tracker.params()["residual_scaling"]) < 1e-9
    x = jnp.zeros((1, 4, 4, 1))
    out = dbm.forward_fn()(
        x, jnp.zeros((1, 40, 40, 1)), jnp.zeros((1, 8, 8, 2)), jnp.zeros((1, 4, 4, 1))
    )
    assert out.shape == (1, 8, 8, 1)  # (4-2)*4: valid conv then 4x upsample
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(value)


@pytest.mark.slow
def test_study_over_objective():
    dataset = TileDataset.synthetic(8, seed=0)
    study = create_study(direction="minimize", sampler_seed=0, pruner="none")
    study.optimize(
        lambda t: objective(t, dataset, suggest=tiny_space), n_trials=2
    )
    assert len(study.trials) == 2
    assert np.isfinite(study.best_value)
