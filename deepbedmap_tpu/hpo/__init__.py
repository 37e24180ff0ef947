"""Self-contained hyperparameter optimisation (reference L7).

The reference drives training with Optuna: TPE sampler + Hyperband pruner +
sqlite storage, one async study process per device
(srgan_train.py:1479-1757). Optuna is not in this image, so the framework
ships its own engine with the same API surface the objective needs:

    study = create_study(direction="minimize", storage="sqlite:///...db")
    study.optimize(objective, n_trials=90)
    # objective(trial): trial.suggest_float/int/discrete, trial.report,
    #                   trial.should_prune -> raise TrialPruned

Sampling is TPE-lite (independent per-parameter Parzen estimators, good/bad
split like Optuna's default univariate TPE) after a random startup phase.
Pruning implements the published ASHA rule exactly — SuccessiveHalvingPruner
('halving') and HyperbandPruner ('hyperband': crc32 bracket assignment,
budgets ceil(n_brackets/(s+1)), per-bracket early-stopping rates), matching
the reference's HyperbandPruner(min_resource=15, max_resource=150,
reduction_factor=3) (srgan_train.py:1740-1744); decisions are pinned against
hand-computed oracles in tests/test_hpo_pruner.py. A MedianPruner ('median')
is also provided.
"""

from deepbedmap_tpu.hpo.engine import (  # noqa: F401
    Study,
    Trial,
    TrialPruned,
    TrialState,
    create_study,
)
