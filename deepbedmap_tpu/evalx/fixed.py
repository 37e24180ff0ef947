"""Fixed-test-region evaluator (reference get_fixed_test_inputs /
get_deepbedmap_test_result, srgan_train.py:1393-1466).

The reference caches one test region's conditioning stack (Pine Island /
20xx_Antarctica_DC8_THW) and, per training epoch, runs the generator over it
and reports RMSE against survey xyz tracks. Here the evaluator is a closure:
inputs are fetched once, moved to device once, the forward is jitted once, and
each call costs one device execution + a track-sampling reduction.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np


def make_fixed_evaluator(
    g_model,
    inputs_nchw: Dict[str, np.ndarray],  # X/W1/W2/W3 stack (get_model_inputs)
    track_xyz: Tuple[np.ndarray, np.ndarray, np.ndarray],  # survey x, y, z
    bounds: Tuple[float, float, float, float],  # (xmin, ymin, xmax, ymax)
    resolution: float = 250.0,
) -> Callable[[Dict], float]:
    """Build ``evaluate(g_params) -> rmse_m`` for train.objective.

    ``inputs_nchw`` follow the reference contract (1 km padding on the
    conditioning rasters); the generator output therefore covers ``bounds``
    exactly at ``resolution``.
    """
    import jax
    import jax.numpy as jnp

    from deepbedmap_tpu.ops.interp import sample_grid_bicubic
    from deepbedmap_tpu.ops.metrics import rmse

    x = jnp.asarray(np.asarray(inputs_nchw["X"]).transpose(0, 2, 3, 1))
    w1 = jnp.asarray(np.asarray(inputs_nchw["W1"]).transpose(0, 2, 3, 1))
    w2 = jnp.asarray(np.asarray(inputs_nchw["W2"]).transpose(0, 2, 3, 1))
    w3 = jnp.asarray(np.asarray(inputs_nchw["W3"]).transpose(0, 2, 3, 1))

    tx = jnp.asarray(track_xyz[0], jnp.float32)
    ty = jnp.asarray(track_xyz[1], jnp.float32)
    tz = jnp.asarray(track_xyz[2], jnp.float32)
    xmin, ymin, xmax, ymax = bounds

    @jax.jit
    def predict(g_params):
        return g_model.apply({"params": g_params}, x, w1, w2, w3)[0, :, :, 0]

    @jax.jit
    def evaluate(g_params):
        # bicubic: GMT grdtrack's default, what the reference's per-epoch RMSE
        # uses (srgan_train.py:1460-1464)
        sampled = sample_grid_bicubic(
            predict(g_params), tx, ty, xmin, ymax, resolution
        )
        return rmse(sampled, tz)

    def evaluate_host(g_params) -> float:
        return float(evaluate(g_params))

    # the predicted test grid itself — objective() renders and logs it per
    # epoch when a tracker is wired (the reference uploads a predicted
    # test-area image to Comet every epoch, srgan_train.py:1640-1654)
    evaluate_host.predict = lambda g_params: np.asarray(predict(g_params))
    evaluate_host.bounds = bounds
    evaluate_host.resolution = resolution
    return evaluate_host
