"""Tests for aux components: groundtruth assembly, model-input stack,
gapfilling, baselines, viz analysis, metric logging."""

import numpy as np
import pytest

import jax.numpy as jnp

from deepbedmap_tpu.data.groundtruth import (
    gapfill_from_coarse,
    get_image_with_bounds,
    get_model_inputs,
)
from deepbedmap_tpu.data.raster import Raster, write_netcdf
from deepbedmap_tpu.evalx.baselines import bicubic_upsample, bilinear_resample
from deepbedmap_tpu.utils.logging import MetricLogger
from deepbedmap_tpu.viz.analysis import hillshade, standard_deviation_2d


def _raster(h, w, res, left=0.0, top=None, value=None, seed=0):
    top = h * res if top is None else top
    rs = np.random.RandomState(seed)
    data = (
        np.full((h, w), value, np.float32)
        if value is not None
        else rs.rand(h, w).astype(np.float32)
    )
    return Raster(data, left=left, top=top, res=res)


def test_get_image_with_bounds_single(tmp_path):
    r = _raster(8, 12, 250.0)
    p = str(tmp_path / "a.nc")
    write_netcdf(r, p)
    out = get_image_with_bounds([p])
    np.testing.assert_array_equal(out.data, r.data)
    assert out.bounds == r.bounds


def test_get_image_with_bounds_mosaic(tmp_path):
    r1 = _raster(8, 8, 250.0, left=0.0, value=1.0)
    r2 = _raster(8, 8, 250.0, left=2000.0, value=2.0)
    p1, p2 = str(tmp_path / "a.nc"), str(tmp_path / "b.nc")
    write_netcdf(r1, p1)
    write_netcdf(r2, p2)
    out = get_image_with_bounds([p1, p2])
    assert out.data.shape == (8, 16)
    assert (out.data[:, :8] == 1.0).all() and (out.data[:, 8:] == 2.0).all()


def test_get_model_inputs_contract():
    # 9km window -> X(1,1,11,11) W1(1,1,110,110) W2(1,2,22,22) W3(1,1,11,11)
    bed = _raster(40, 40, 1000.0, left=-5000.0, top=35000.0)
    surface = _raster(400, 400, 100.0, left=-5000.0, top=35000.0)
    vx = _raster(90, 90, 450.0, left=-5000.0, top=35000.0)
    vy = _raster(90, 90, 450.0, left=-5000.0, top=35000.0)
    accum = _raster(40, 40, 1000.0, left=-5000.0, top=35000.0)
    window = (1000.0, 1000.0, 10000.0, 10000.0)
    inputs = get_model_inputs(window, bed, surface, vx, vy, accum)
    assert inputs["X"].shape == (1, 1, 11, 11)
    assert inputs["W1"].shape == (1, 1, 110, 110)
    assert inputs["W2"].shape == (1, 2, 22, 22)
    assert inputs["W3"].shape == (1, 1, 11, 11)
    for v in inputs.values():
        assert np.isfinite(v).all()


def test_gapfill_from_coarse():
    fine = _raster(20, 20, 100.0, value=5.0)
    fine.data[3:6, 3:6] = np.nan
    coarse = _raster(10, 10, 200.0, value=7.0)
    filled = gapfill_from_coarse(fine, coarse)
    assert np.isfinite(filled.data).all()
    assert (filled.data[3:6, 3:6] == 7.0).all()
    assert (filled.data[0, 0] == 5.0).all()


def test_bicubic_baseline_geometry():
    r = _raster(10, 12, 1000.0)
    up = bicubic_upsample(r, 4)
    assert up.data.shape == (40, 48)
    assert up.res == 250.0
    assert up.bounds == r.bounds
    down = bilinear_resample(r, 0.5)
    assert down.data.shape == (5, 6)


def test_standard_deviation_2d():
    rs = np.random.RandomState(0)
    grid = rs.rand(20, 20).astype(np.float32)
    rough = np.asarray(standard_deviation_2d(jnp.asarray(grid), window=5))
    assert rough.shape == (20, 20)
    assert np.isnan(rough[0, 0]) and np.isnan(rough[-1, -1])  # border NaN
    # interior matches a direct ddof-1 std of the 5x5 neighbourhood
    sub = grid[3:8, 3:8]
    np.testing.assert_allclose(rough[5, 5], sub.std(ddof=1), rtol=1e-5)


def test_hillshade_range():
    z = np.outer(np.arange(16.0), np.ones(16)) * 100
    hs = np.asarray(hillshade(jnp.asarray(z), res=250.0))
    assert hs.shape == (16, 16)
    assert (hs >= 0).all() and (hs <= 1).all()


def test_metric_logger(tmp_path):
    import json

    logger = MetricLogger(str(tmp_path), "run")
    logger.log_params({"lr": 1.7e-4})
    logger.log_metrics({"loss": 1.5, "psnr": 100.0}, step=0)
    logger.log_metrics({"loss": 1.2, "psnr": 110.0}, step=1)
    lines = [json.loads(l) for l in open(tmp_path / "run.jsonl")]
    assert lines[0]["type"] == "params"
    assert lines[2]["step"] == 1 and lines[2]["loss"] == 1.2
    csv_text = open(tmp_path / "run.csv").read()
    assert "loss" in csv_text and "1.2" in csv_text


def test_fixed_evaluator():
    """Fixed-test-region evaluator: RMSE of the generator over a cached
    region vs xyz tracks (reference srgan_train.py:1393-1466)."""
    from deepbedmap_tpu.config import GeneratorConfig
    from deepbedmap_tpu.evalx.fixed import make_fixed_evaluator
    from deepbedmap_tpu.models import build_generator

    model, params = build_generator(GeneratorConfig(num_residual_blocks=1))
    rs = np.random.RandomState(0)
    inputs = {
        "X": rs.rand(1, 1, 11, 11).astype(np.float32),
        "W1": rs.rand(1, 1, 110, 110).astype(np.float32),
        "W2": rs.rand(1, 2, 22, 22).astype(np.float32),
        "W3": rs.rand(1, 1, 11, 11).astype(np.float32),
    }
    bounds = (0.0, 0.0, 9000.0, 9000.0)  # 36 px at 250 m
    tx = rs.uniform(500, 8500, 50)
    ty = rs.uniform(500, 8500, 50)
    tz = rs.randn(50).astype(np.float32)
    evaluate = make_fixed_evaluator(model, inputs, (tx, ty, tz), bounds)
    r1 = evaluate(params)
    r2 = evaluate(params)
    assert np.isfinite(r1) and r1 == r2


def test_enable_persistent_cache(tmp_path, monkeypatch):
    """The cache helper creates the directory, points jax at it, and honors
    the =off opt-out; a compiled jit lands an entry on disk."""
    import os

    import jax
    import jax.numpy as jnp

    from deepbedmap_tpu.utils.compilation_cache import enable_persistent_cache

    monkeypatch.setenv("DEEPBEDMAP_JAX_CACHE", "off")
    assert enable_persistent_cache() == ""

    # the persistent-cache singleton binds to the first directory used in
    # the process (the conftest's); rebind it to this test's tmp dir
    from jax._src import compilation_cache as _cc

    _cc.reset_cache()
    cache = tmp_path / "jax_cache"
    got = enable_persistent_cache(str(cache), min_compile_secs=0.0)
    assert got == str(cache) and cache.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(cache)

    @jax.jit
    def f(a):
        return jnp.tanh(a @ a.T).sum()

    try:
        float(f(jnp.ones((64, 64), jnp.float32)))
        assert list(cache.iterdir()), "no cache entry written"
    finally:
        # restore the suite-wide cache dir set by conftest
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("DEEPBEDMAP_JAX_CACHE_RESTORE", "/tmp/deepbedmap_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _cc.reset_cache()
