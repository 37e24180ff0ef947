"""CLI smoke tests: each subcommand drives its library path in-process on
tiny synthetic data and prints the one-line JSON contract."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from deepbedmap_tpu.cli import main


def run_cli(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_cli_verify_data(capsys, tmp_path):
    rc, res = run_cli(capsys, ["verify-data", "--root", str(tmp_path)])
    assert rc == 0
    assert res["command"] == "verify-data"
    assert res["manifest_files"] >= 30  # the bundled 33-file manifest
    assert res["present"] == 0  # zero-egress sandbox: nothing on disk


def test_cli_grid(capsys, tmp_path):
    rs = np.random.RandomState(0)
    n = 3000
    csv = tmp_path / "survey.csv"
    pd.DataFrame(
        {
            "x": rs.uniform(0, 5000, n),
            "y": rs.uniform(0, 5000, n),
            "z": rs.uniform(-500, -400, n),
        }
    ).to_csv(csv, index=False)
    cfg = tmp_path / "survey.json"
    cfg.write_text(
        json.dumps(
            {
                "pipeline": [
                    {
                        "type": "readers.text",
                        "filename": "survey.csv",
                        "separator": ",",
                        "header": "x,y,z",
                        "usecols": "x,y,z",
                        "skip": 0,
                    }
                ]
            }
        )
    )
    out = str(tmp_path / "grid.nc")
    rc, res = run_cli(capsys, ["grid", str(cfg), "-o", out, "--spacing", "250"])
    assert rc == 0
    assert res["points"] == n
    assert os.path.exists(out)

    from deepbedmap_tpu.data.raster import read_netcdf

    raster = read_netcdf(out)
    assert raster.res == 250.0
    assert np.isfinite(raster.data).any()


@pytest.mark.slow
def test_cli_train_and_evaluate(capsys, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    rc, res = run_cli(
        capsys,
        [
            "train",
            "--synthetic-tiles", "12",
            "--epochs", "2",
            "--blocks", "1",
            "--batch-size", "4",
            "--out", ckpt,
        ],
    )
    assert rc == 0
    assert res["tiles"] == 12
    assert os.path.exists(ckpt)

    # evaluate: DEM sampled against its own noisy track
    from deepbedmap_tpu.data.raster import Raster, write_netcdf

    rs = np.random.RandomState(1)
    dem = Raster(rs.rand(40, 40).astype(np.float32) * 100, 0.0, 10_000.0, 250.0)
    dem_path = str(tmp_path / "dem.nc")
    write_netcdf(dem, dem_path)
    tx = rs.uniform(1000, 9000, 200)
    ty = rs.uniform(1000, 9000, 200)
    from deepbedmap_tpu.evalx import grdtrack
    import jax.numpy as jnp

    tz = np.asarray(
        grdtrack(jnp.asarray(dem.data), jnp.asarray(tx), jnp.asarray(ty), 0.0, 10_000.0, 250.0)
    )
    track = str(tmp_path / "track.csv")
    pd.DataFrame({"x": tx, "y": ty, "z": tz}).to_csv(track, index=False)
    rc, res = run_cli(capsys, ["evaluate", "--dem", dem_path, "--track", track])
    assert rc == 0
    assert res["rmse_m"] < 1e-3  # exact self-samples


def test_cli_continent_streamed(capsys, tmp_path):
    """continent subcommand: tiny region, streamed GeoTIFF product."""
    rs = np.random.RandomState(0)
    lh, lw = 16, 24  # 64x96 output at tile 32
    inputs_dir = tmp_path / "inputs"
    inputs_dir.mkdir()
    np.save(inputs_dir / "X.npy", rs.rand(1, 1, lh, lw).astype(np.float32))
    np.save(inputs_dir / "W1.npy", rs.rand(1, 1, 10 * lh, 10 * lw).astype(np.float32))
    np.save(inputs_dir / "W2.npy", rs.rand(1, 2, 2 * lh, 2 * lw).astype(np.float32))
    np.save(inputs_dir / "W3.npy", rs.rand(1, 1, lh, lw).astype(np.float32))
    out = str(tmp_path / "dem")
    rc, res = run_cli(
        capsys,
        [
            "continent",
            "--inputs", str(inputs_dir),
            "--bounds", "0,0,24000,16000",
            "-o", out,
            "--blocks", "1",
            "--tile-out", "32",
            "--halo-lr", "2",
            "--stream",
        ],
    )
    assert rc == 0 and res["streamed"]
    from deepbedmap_tpu.data.geotiff import read_geotiff

    arr, meta = read_geotiff(out + ".tif")
    assert arr.shape == (64, 96)
    assert meta["res"] == 250.0 and meta["crs_epsg"] == 3031


def test_cli_continent_multihost_single_process(capsys, tmp_path):
    """--multihost with P == 1 degenerates to the single-host path through
    the full CLI surface (initialize is a no-op single-process; the pod
    behaviour itself is covered by tests/test_multihost.py)."""
    rs = np.random.RandomState(3)
    lh, lw = 16, 24
    inputs_dir = tmp_path / "inputs"
    inputs_dir.mkdir()
    np.save(inputs_dir / "X.npy", rs.rand(1, 1, lh, lw).astype(np.float32))
    np.save(inputs_dir / "W1.npy", rs.rand(1, 1, 10 * lh, 10 * lw).astype(np.float32))
    np.save(inputs_dir / "W2.npy", rs.rand(1, 2, 2 * lh, 2 * lw).astype(np.float32))
    np.save(inputs_dir / "W3.npy", rs.rand(1, 1, lh, lw).astype(np.float32))
    out = str(tmp_path / "dem_mh")
    rc, res = run_cli(
        capsys,
        [
            "continent",
            "--inputs", str(inputs_dir),
            "--bounds", "0,0,24000,16000",
            "-o", out,
            "--blocks", "1",
            "--tile-out", "32",
            "--halo-lr", "2",
            "--stream",
            "--multihost",
        ],
    )
    assert rc == 0 and res["streamed"] and res["processes"] == 1
    from deepbedmap_tpu.data.geotiff import read_geotiff

    arr, meta = read_geotiff(out + ".tif")
    assert arr.shape == (64, 96) and meta["crs_epsg"] == 3031


@pytest.mark.slow
def test_cli_hpo_tiny(capsys, tmp_path):
    """hpo subcommand end-to-end: 2 trials over the tiny space with sqlite
    storage and the reference hyperband pruner config."""
    db = f"sqlite:///{tmp_path}/hpo.db"
    rc, res = run_cli(
        capsys,
        ["hpo", "--trials", "2", "--tiny", "--synthetic-tiles", "8",
         "--storage", db, "--seed", "1"],
    )
    assert rc == 0
    assert res["trials"] == 2
    assert np.isfinite(res["best_value"])
    assert (tmp_path / "hpo.db").exists()


def test_cli_verify_weights_rehearsal(capsys, tmp_path):
    """Full dress rehearsal of the real-weight parity harness on a synthetic
    artifact: a model's weights exported to the reference Chainer npz layout
    play the role of the released artifact, the INDEPENDENT torch oracle
    (tests/test_torch_parity.py) produces the 'reference output grid', and
    the one-command CLI must import the npz, reproduce that grid, and pass.
    The day a real artifact is mounted, the same command proves parity
    (ref srgan_train.py:506-523, deepbedmap.py:381-447)."""
    torch = pytest.importorskip("torch")
    from tests.test_torch_parity import _t, torch_generator_forward

    from deepbedmap_tpu.config import GeneratorConfig
    from deepbedmap_tpu.models import build_generator
    from deepbedmap_tpu.train.checkpoint import export_generator_npz

    cfg = GeneratorConfig(num_residual_blocks=2)
    model, params = build_generator(cfg)
    npz = str(tmp_path / "srgan_generator_model_weights.npz")
    export_generator_npz(params, npz)

    rs = np.random.RandomState(7)
    arrays = str(tmp_path / "arrays")
    os.makedirs(arrays)
    inputs = {
        "X": rs.rand(1, 1, 11, 11).astype(np.float32),
        "W1": rs.rand(1, 1, 110, 110).astype(np.float32),
        "W2": rs.rand(1, 2, 22, 22).astype(np.float32),
        "W3": rs.rand(1, 1, 11, 11).astype(np.float32),
    }
    for k, v in inputs.items():
        np.save(f"{arrays}/{k}.npy", v)

    g = {k: np.asarray(v) for k, v in np.load(npz).items()}
    with torch.no_grad():
        expected = torch_generator_forward(
            g, *(_t(inputs[k]) for k in ("X", "W1", "W2", "W3")),
            cfg.num_residual_blocks, cfg.residual_scaling,
        ).numpy()[0, 0]
    np.save(str(tmp_path / "expected.npy"), expected)

    rc, res = run_cli(
        capsys,
        ["verify-weights", "--npz", npz, "--inputs", arrays,
         "--expected", str(tmp_path / "expected.npy"),
         "--blocks", "2", "--atol", "1e-5"],
    )
    assert rc == 0 and res["pass"] is True
    assert res["max_abs_err"] < 1e-5
    assert res["pixels_compared"] == 36 * 36

    # a corrupted artifact must FAIL loudly, not pass vacuously (the final
    # deform-conv bias adds straight into the output, so +1e-3 must show;
    # an untrained generator's outputs are ~1e-7, hence the tiny atol above)
    bad = {k: v.copy() for k, v in g.items()}
    bad["final_conv_layer2/deform_conv/b"] = (
        bad["final_conv_layer2/deform_conv/b"] + 1e-3
    )
    badpath = str(tmp_path / "bad.npz")
    np.savez(badpath, **bad)
    rc2, res2 = run_cli(
        capsys,
        ["verify-weights", "--npz", badpath, "--inputs", arrays,
         "--expected", str(tmp_path / "expected.npy"),
         "--blocks", "2", "--atol", "1e-5"],
    )
    assert rc2 == 1 and res2["pass"] is False

    # an all-NaN expected grid compares zero pixels — that must be a FAIL,
    # not a vacuous pass (wrong crop / nodata handling)
    np.save(str(tmp_path / "allnan.npy"), np.full_like(expected, np.nan))
    rc3, res3 = run_cli(
        capsys,
        ["verify-weights", "--npz", npz, "--inputs", arrays,
         "--expected", str(tmp_path / "allnan.npy"),
         "--blocks", "2", "--atol", "1e-5"],
    )
    assert rc3 == 1 and res3["pass"] is False
    assert res3["pixels_compared"] == 0 and "finite" in res3["error"]
