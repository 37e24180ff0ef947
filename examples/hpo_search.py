"""Hyperparameter search example: the reference's Optuna workflow
(srgan_train.py:1725-1757) on this framework's self-contained HPO engine.

Run: `python examples/hpo_search.py` (CPU; tiny synthetic dataset).
Multiple processes pointed at the same sqlite storage cooperate, which is
exactly the reference's share-nothing per-GPU trial parallelism.
"""
import jax

jax.config.update("jax_platforms", "cpu")

from deepbedmap_tpu.data.dataset import TileDataset
from deepbedmap_tpu.hpo import create_study
from deepbedmap_tpu.train.objective import objective


def tiny_space(trial):
    return dict(
        batch_size_exponent=trial.suggest_int("batch_size_exponent", 2, 2),
        learning_rate=trial.suggest_float("learning_rate", 1e-4, 2e-4, step=0.1e-4),
        num_residual_blocks=trial.suggest_int("num_residual_blocks", 1, 1),
        residual_scaling=trial.suggest_float("residual_scaling", 0.1, 0.3, step=0.05),
        num_epochs=trial.suggest_int("num_epochs", 2, 3),
    )


def main():
    dataset = TileDataset.synthetic(16, seed=0)
    study = create_study(
        direction="minimize",
        storage="sqlite:///model/logs/hpo_example.db",
        sampler_seed=42,
        # the reference's pruner config (srgan_train.py:1740-1744)
        pruner="hyperband",
        min_resource=15,
        max_resource=150,
        reduction_factor=3,
    )
    study.optimize(
        lambda t: objective(t, dataset, suggest=tiny_space), n_trials=3
    )
    print(study.trials_dataframe())
    print("best:", study.best_value, study.best_params)


if __name__ == "__main__":
    main()
