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


@pytest.mark.slow
def test_study_over_objective():
    dataset = TileDataset.synthetic(8, seed=0)
    study = create_study(direction="minimize", sampler_seed=0, pruner="none")
    study.optimize(
        lambda t: objective(t, dataset, suggest=tiny_space), n_trials=2
    )
    assert len(study.trials) == 2
    assert np.isfinite(study.best_value)
