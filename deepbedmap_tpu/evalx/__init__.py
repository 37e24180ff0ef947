"""Evaluation: point-track sampling + error metrics (reference L6).

The reference samples predicted grids at survey xyz points with GMT's
``grdtrack`` and reports RMSE (deepbedmap.py:530-573, srgan_train.py:1422-1466).
Here ``grdtrack`` is a jit-able bilinear sampler over the framework's Raster
convention, so whole-track evaluation runs on device.
"""

from deepbedmap_tpu.evalx.track import grdtrack, track_rmse, elevation_residuals  # noqa: F401
