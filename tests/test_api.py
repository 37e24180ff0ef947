"""Top-level DeepBedMap API tests."""

import numpy as np
import pytest

from deepbedmap_tpu import DeepBedMap, GeneratorConfig
from deepbedmap_tpu.data.raster import Raster

TINY = GeneratorConfig(num_residual_blocks=1)


def _rasters():
    rs = np.random.RandomState(0)

    def r(h, w, res):
        return Raster(
            rs.rand(h, w).astype(np.float32), left=-5000.0, top=35000.0, res=res
        )

    return {
        "bed_lowres": r(40, 40, 1000.0),
        "surface": r(400, 400, 100.0),
        "velocity_x": r(90, 90, 450.0),
        "velocity_y": r(90, 90, 450.0),
        "accumulation": r(40, 40, 1000.0),
    }


def test_predict_region_api():
    dbm = DeepBedMap(cfg=TINY)
    window = (1000.0, 1000.0, 10000.0, 10000.0)  # 9 km
    dem = dbm.predict(window, _rasters())
    assert dem.data.shape == (36, 36)
    assert dem.bounds == window[:1] + window[1:2] + window[2:3] + window[3:4]
    assert np.isfinite(dem.data).all()
    # track RMSE of the DEM against its own bilinear samples is ~0
    rs = np.random.RandomState(1)
    tx = rs.uniform(2000, 9000, 30)
    ty = rs.uniform(2000, 9000, 30)
    import jax.numpy as jnp

    from deepbedmap_tpu.evalx.track import grdtrack

    tz = np.asarray(
        grdtrack(
            jnp.asarray(dem.data), jnp.asarray(tx), jnp.asarray(ty),
            dem.left, dem.top, dem.res,
        )
    )
    assert dbm.track_rmse(dem, tx, ty, tz) < 1e-5


def test_predict_continent_api(tmp_path):
    from deepbedmap_tpu.data import geotiff

    dbm = DeepBedMap(cfg=TINY)
    rs = np.random.RandomState(0)
    # 16 km x 8 km at 250 m -> 64x32 output; 8x8-px lr canvas... use tile 32
    bounds = (0.0, 0.0, 16000.0, 8000.0)
    lh, lw = 8, 16
    inputs = {
        "X": rs.rand(1, 1, lh, lw).astype(np.float32),
        "W1": rs.rand(1, 1, 10 * lh, 10 * lw).astype(np.float32),
        "W2": rs.rand(1, 2, 2 * lh, 2 * lw).astype(np.float32),
        "W3": rs.rand(1, 1, lh, lw).astype(np.float32),
    }
    out = str(tmp_path / "dem")
    dem = dbm.predict_continent(
        inputs, bounds, outfilepath=out, tile_out=32, halo_lr=2
    )
    assert dem.data.shape == (32, 64)
    back, meta = geotiff.read_geotiff(out + ".tif")
    assert back.shape == (32, 64)
    assert meta["res"] == 250.0


def test_checkpoint_constructor(tmp_path):
    from deepbedmap_tpu.train import create_gan_state
    from deepbedmap_tpu.train.checkpoint import save_checkpoint

    state = create_gan_state(TINY)
    path = str(tmp_path / "ckpt")
    save_checkpoint(state, path)
    dbm = DeepBedMap.from_checkpoint(path, TINY)
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(dbm.params),
        jax.tree_util.tree_leaves(state.g_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_constructor(tmp_path):
    from deepbedmap_tpu.models import build_generator
    from deepbedmap_tpu.train.checkpoint import export_generator_npz

    _, params = build_generator(TINY)
    path = str(tmp_path / "gen.npz")
    export_generator_npz(params, path)
    dbm = DeepBedMap.from_chainer_npz(path, TINY)
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(dbm.params), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
