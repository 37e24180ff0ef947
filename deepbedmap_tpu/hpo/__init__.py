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
split like Optuna's default univariate TPE) after a random startup phase;
pruning is successive-halving rungs (Hyperband's inner loop) against the
running quantile of completed trials at the same step.
"""

from deepbedmap_tpu.hpo.engine import (  # noqa: F401
    Study,
    Trial,
    TrialPruned,
    TrialState,
    create_study,
)
