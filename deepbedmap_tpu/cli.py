"""Command-line interface — the reference's notebook entry points as commands.

The reference is driven by running its notebooks top-to-bottom (data_prep
-> srgan_train -> deepbedmap -> paper_figures). Here each stage is a
subcommand over the library APIs:

    python -m deepbedmap_tpu verify-data [--datalist FILE]
    python -m deepbedmap_tpu grid SURVEY.json -o out.nc [--data-dir DIR]
    python -m deepbedmap_tpu train --tiles DIR --epochs N --out CKPT
    python -m deepbedmap_tpu hpo --tiles DIR --trials N --storage sqlite:///db
    python -m deepbedmap_tpu predict --checkpoint CKPT --bounds xmin,ymin,xmax,ymax ...
    python -m deepbedmap_tpu evaluate --dem FILE --track FILE.csv
    python -m deepbedmap_tpu figures -o OUTDIR

Every command prints a one-line JSON result to stdout (machine-readable,
mirrors bench.py's contract); human logs go to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _emit(obj) -> None:
    print(json.dumps(obj), flush=True)


def cmd_verify_data(args) -> int:
    import os

    from deepbedmap_tpu.data.manifest import (
        DEFAULT_MANIFEST,
        download_to_path,
        parse_datalist,
        verify_datalist,
    )

    datalist = args.datalist or DEFAULT_MANIFEST
    records = parse_datalist(datalist)
    _log(f"{len(records)} files in manifest")
    if args.download:
        for rec in records:
            if "filename" not in rec or "url" not in rec:
                continue
            path = os.path.join(args.root, rec.get("folder", ""), rec["filename"])
            download_to_path(path, rec["url"])
    # strict=False: report mismatches instead of raising; absent files are
    # simply not in the result (zero-egress sandboxes verify what they have)
    results = verify_datalist(datalist, root=args.root, strict=False)
    bad = sorted(k for k, ok in results.items() if not ok)
    _emit(
        {
            "command": "verify-data",
            "manifest_files": len(records),
            "present": len(results),
            "ok": sum(1 for ok in results.values() if ok),
            "bad": bad,
        }
    )
    return 1 if bad else 0


def cmd_package_data(args) -> int:
    """Content-addressed dataset packaging (reference quilt build/push/
    install/load, data_prep.py:938-970, srgan_train.py:87-125)."""
    from deepbedmap_tpu.data import packaging

    if args.action == "push":
        if args.files:
            # arbitrary-member package (the reference also packaged its
            # prediction rasters, data_prep.py:950-967)
            import os as _os

            files = {_os.path.basename(f): f for f in args.files}
            pkg_hash = packaging.push(args.name, files, args.registry)
        else:
            pkg_hash = packaging.push_training_arrays(
                args.model_dir, args.registry, name=args.name
            )
        _emit({"command": "package-data", "action": "push", "hash": pkg_hash})
    elif args.action == "install":
        manifest = packaging.install(
            args.registry, args.name, args.dest, pkg_hash=args.hash,
            force=args.force,
        )
        _emit(
            {
                "command": "package-data",
                "action": "install",
                "hash": manifest["hash"],
                "members": sorted(manifest["members"]),
            }
        )
    elif args.action == "list":
        vs = packaging.versions(args.registry, args.name)
        _emit(
            {
                "command": "package-data",
                "action": "list",
                "versions": [
                    {"hash": m["hash"], "created": m.get("created", "")}
                    for m in vs
                ],
            }
        )
    return 0


def cmd_catalog(args) -> int:
    """Autogenerate per-folder README.md files from the dataset manifest
    (reference data_prep.py:168-205)."""
    from deepbedmap_tpu.data.manifest import (
        DEFAULT_MANIFEST,
        write_catalog_markdown,
        write_folder_readmes,
    )

    datalist = args.datalist or DEFAULT_MANIFEST
    written = write_folder_readmes(args.root, yaml_file=datalist)
    if args.catalog:
        write_catalog_markdown(datalist, out_path=args.catalog)
        written.append(args.catalog)
    _emit({"command": "catalog", "written": written})
    return 0


def cmd_grid(args) -> int:
    from deepbedmap_tpu.data.gridder import get_region, xyz_to_grid
    from deepbedmap_tpu.data.pipeline import ascii_to_xyz
    from deepbedmap_tpu.data.raster import write_netcdf

    xyz = ascii_to_xyz(args.survey, data_dir=args.data_dir)
    _log(f"{len(xyz)} points from {args.survey}")
    region = get_region(xyz, args.spacing, mode=args.region_mode)
    raster = xyz_to_grid(xyz, region, spacing=args.spacing)
    write_netcdf(raster, args.out)
    _emit(
        {
            "command": "grid",
            "points": int(len(xyz)),
            "region": list(region),
            "shape": list(raster.data.shape),
            "out": args.out,
        }
    )
    return 0


def cmd_build(args) -> int:
    """Gridded surveys + conditioning rasters -> X/W1/W2/W3/Y training arrays
    (reference data_prep.py:745-930: window proposal over each high-res grid,
    selective tiling of every input, .npy stack with content-hash pin)."""
    import glob as _glob
    import os

    from deepbedmap_tpu.data.builder import build_training_arrays
    from deepbedmap_tpu.data.raster import read_netcdf
    from deepbedmap_tpu.data.windows import get_window_bounds

    survey_paths = sorted(_glob.glob(os.path.join(args.surveys, "*.nc")))
    assert survey_paths, f"no gridded surveys (*.nc) under {args.surveys}"
    highres = {
        os.path.splitext(os.path.basename(p))[0]: read_netcdf(p)
        for p in survey_paths
    }
    window_bounds = {
        name: get_window_bounds(r, step=args.window_step)
        for name, r in highres.items()
    }
    dataset = build_training_arrays(
        highres,
        window_bounds,
        lowres=read_netcdf(args.lowres),
        surface=read_netcdf(args.surface),
        velocity=(read_netcdf(args.velocity_x), read_netcdf(args.velocity_y)),
        accumulation=read_netcdf(args.accumulation),
        lowres_gapfiller=args.gapfiller,
        out_dir=args.out,
    )
    _emit(
        {
            "command": "build",
            "surveys": sorted(highres),
            "windows": {k: len(v) for k, v in window_bounds.items()},
            "tiles": len(dataset),
            "out": args.out,
        }
    )
    return 0


def cmd_train(args) -> int:
    import numpy as np

    from deepbedmap_tpu.config import GeneratorConfig, TrainConfig
    from deepbedmap_tpu.data.dataset import TileDataset
    from deepbedmap_tpu.models import Discriminator, Generator
    from deepbedmap_tpu.train import create_gan_state, fit
    from deepbedmap_tpu.train.checkpoint import save_checkpoint

    if args.tiles:
        arrays = {
            k: np.load(f"{args.tiles}/{k}_data.npy")
            for k in ("X", "W1", "W2", "W3", "Y")
        }
        dataset = TileDataset.from_nchw(arrays)
    else:
        dataset = TileDataset.synthetic(args.synthetic_tiles, seed=0)
    g_cfg = GeneratorConfig(num_residual_blocks=args.blocks)
    t_cfg = TrainConfig(
        batch_size=min(args.batch_size, max(1, int(len(dataset) * 0.9))),
        learning_rate=args.learning_rate,
    )
    state = create_gan_state(g_cfg, t_cfg=t_cfg)
    callback = None
    if getattr(args, "live_png", None):
        from deepbedmap_tpu.viz.live import LiveCurves

        callback = LiveCurves(out_png=args.live_png, terminal=args.live_term)
    state, history = fit(
        state,
        dataset,
        Generator(g_cfg),
        Discriminator(),
        t_cfg=t_cfg,
        epochs=args.epochs,
        callback=callback,
    )
    if args.out:
        save_checkpoint(state, args.out)
    _emit(
        {
            "command": "train",
            "tiles": len(dataset),
            "epochs": args.epochs,
            "first_g_loss": round(history[0]["generator_loss"], 4),
            "final_g_loss": round(history[-1]["generator_loss"], 4),
            "checkpoint": args.out,
        }
    )
    return 0


def cmd_hpo(args) -> int:
    """HPO over real tile arrays with a real fixed-test-area RMSE objective —
    the reference's actual workflow (srgan_train.py:1725-1757: Optuna study
    over the built dataset, per-epoch Pine-Island RMSE, top-10 report)."""
    import numpy as np

    from deepbedmap_tpu.data.dataset import TileDataset
    from deepbedmap_tpu.hpo import create_study
    from deepbedmap_tpu.train.objective import objective

    if args.tiles:
        arrays = {
            k: np.load(f"{args.tiles}/{k}_data.npy")
            for k in ("X", "W1", "W2", "W3", "Y")
        }
        dataset = TileDataset.from_nchw(arrays)
    else:
        dataset = TileDataset.synthetic(args.synthetic_tiles, seed=0)

    # fixed-test-area evaluator (reference get_deepbedmap_test_result): the
    # optimised value is then real metres, not the dev-loss proxy. Built per
    # trial (residual_scaling changes the forward pass).
    make_evaluator = None
    if args.eval_inputs:
        import pandas as pd

        from deepbedmap_tpu.evalx.fixed import make_fixed_evaluator

        assert args.eval_track and args.eval_bounds, (
            "--eval-inputs requires --eval-track and --eval-bounds"
        )
        eval_inputs = {
            k: np.load(f"{args.eval_inputs}/{k}.npy")
            for k in ("X", "W1", "W2", "W3")
        }
        track = pd.read_csv(args.eval_track)
        bounds = tuple(float(v) for v in args.eval_bounds.split(","))
        make_evaluator = lambda g_model: make_fixed_evaluator(  # noqa: E731
            g_model, eval_inputs,
            (track.x.values, track.y.values, track.z.values),
            bounds, resolution=args.eval_resolution,
        )

    study = create_study(
        direction="minimize",
        storage=args.storage,
        sampler_seed=args.seed,
        pruner="hyperband",
        min_resource=15,
        max_resource=150,
        reduction_factor=3,
    )

    def tiny_space(trial):
        return dict(
            batch_size_exponent=trial.suggest_int("batch_size_exponent", 2, 3),
            learning_rate=trial.suggest_float("learning_rate", 1e-4, 2e-4, step=0.1e-4),
            num_residual_blocks=trial.suggest_int("num_residual_blocks", 1, 1),
            residual_scaling=trial.suggest_float("residual_scaling", 0.1, 0.3, step=0.05),
            num_epochs=trial.suggest_int("num_epochs", 1, 2),
        )

    kwargs = {}
    if args.tiny:
        kwargs["suggest"] = tiny_space
    if make_evaluator is not None:
        kwargs["make_evaluator"] = make_evaluator
    if args.checkpoint_dir:
        kwargs["checkpoint_dir"] = args.checkpoint_dir
    study.optimize(lambda t: objective(t, dataset, **kwargs), n_trials=args.trials)

    # top-N trials report (reference: top-10 dataframe, srgan_train.py:1751-1757)
    df = study.trials_dataframe()
    completed = df[df.state == "COMPLETE"].sort_values("value")
    top = completed.head(args.top_n)
    _log(top.to_string(index=False))
    top_records = top.to_dict(orient="records")
    if args.report:
        with open(args.report, "w") as f:
            json.dump({"top_trials": top_records,
                       "n_trials": len(study.trials)}, f, indent=2)
    _emit(
        {
            "command": "hpo",
            "trials": len(study.trials),
            "best_value": round(study.best_value, 4),
            # with a wired evaluator the value is metres; otherwise the
            # dev-set generator loss stands in (train/objective.py)
            "value_metric": (
                "rmse_test_m" if make_evaluator is not None
                else "val_generator_loss_proxy"
            ),
            "best_params": study.best_params,
            "top_trials": top_records,
        }
    )
    return 0


def cmd_predict(args) -> int:
    from deepbedmap_tpu.api import DeepBedMap
    from deepbedmap_tpu.config import GeneratorConfig
    from deepbedmap_tpu.data.raster import read_netcdf, write_netcdf

    cfg = GeneratorConfig(num_residual_blocks=args.blocks)
    if args.checkpoint:
        dbm = DeepBedMap.from_checkpoint(args.checkpoint, cfg)
    elif args.npz:
        dbm = DeepBedMap.from_chainer_npz(args.npz, cfg)
    else:
        _log("untrained generator (no --checkpoint/--npz)")
        dbm = DeepBedMap(cfg=cfg)

    rasters = {
        "bed_lowres": read_netcdf(args.bed),
        "surface": read_netcdf(args.surface),
        "velocity_x": read_netcdf(args.velocity_x),
        "velocity_y": read_netcdf(args.velocity_y),
        "accumulation": read_netcdf(args.accumulation),
    }
    bounds = tuple(float(v) for v in args.bounds.split(","))
    dem = dbm.predict(bounds, rasters)
    write_netcdf(dem, args.out)
    _emit(
        {
            "command": "predict",
            "bounds": list(bounds),
            "shape": list(dem.data.shape),
            "out": args.out,
        }
    )
    return 0


def _read_raster_any(path: str, bounds=None):
    """Read a DEM as Raster from NetCDF or GeoTIFF (the continent product is
    an int16 GeoTIFF, deepbedmap.py:749-756; nodata becomes NaN).

    ``bounds``: optional (xmin, ymin, xmax, ymax) window — only the
    intersecting blocks/hyperslab are read (windowed IO in both codecs),
    clipped outward to pixel edges."""
    import numpy as np

    if path.endswith((".tif", ".tiff")):
        from deepbedmap_tpu.data import geotiff
        from deepbedmap_tpu.data.raster import Raster

        if bounds is None:
            data, meta = geotiff.read_geotiff(path)
        else:
            info = geotiff.read_geotiff_meta(path)
            res, left, top = info["res"], info["left"], info["top"]
            xmin, ymin, xmax, ymax = bounds
            data, meta = geotiff.read_geotiff_window(
                path,
                (int(np.floor((top - ymax) / res)),
                 int(np.ceil((top - ymin) / res))),
                (int(np.floor((xmin - left) / res)),
                 int(np.ceil((xmax - left) / res))),
            )
        data = data.astype(np.float32)
        if meta.get("nodata") is not None:
            data = np.where(data == meta["nodata"], np.nan, data)
        return Raster(data, left=meta["left"], top=meta["top"], res=meta["res"])
    from deepbedmap_tpu.data.raster import read_netcdf

    return read_netcdf(path, bounds=bounds)


def cmd_evaluate(args) -> int:
    import pandas as pd

    from deepbedmap_tpu.evalx import track_rmse

    track = pd.read_csv(args.track)
    # windowed read: only the track's bounding box (plus a bicubic-stencil
    # margin) is decoded from the DEM product
    dem = _read_raster_any(
        args.dem,
        bounds=(
            float(track.x.min()) - 2000.0, float(track.y.min()) - 2000.0,
            float(track.x.max()) + 2000.0, float(track.y.max()) + 2000.0,
        ),
    )
    rmse = track_rmse(
        dem, track.x.values, track.y.values, track.z.values, method=args.method
    )
    _emit(
        {
            "command": "evaluate",
            "points": int(len(track)),
            "rmse_m": round(float(rmse), 4),
            "method": args.method,
        }
    )
    return 0


def cmd_figures(args) -> int:
    import os
    import subprocess

    import deepbedmap_tpu

    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(deepbedmap_tpu.__file__))),
        "examples",
        "figure_set.py",
    )
    if not os.path.exists(script):
        _emit(
            {
                "command": "figures",
                "error": "examples/figure_set.py not found (repo checkout "
                "required; the examples are not shipped in wheels)",
            }
        )
        return 1
    rc = subprocess.call([sys.executable, script, args.out])
    _emit({"command": "figures", "out": args.out, "rc": rc})
    return rc


def cmd_continent(args) -> int:
    import numpy as np

    from deepbedmap_tpu.api import DeepBedMap
    from deepbedmap_tpu.config import GeneratorConfig

    if args.multihost:
        # pod mode: one process per host; coordinator/process args
        # auto-detect on Cloud TPU when omitted
        from deepbedmap_tpu.parallel.distributed import initialize

        initialize(
            args.coordinator or None,
            args.num_processes or None,
            args.process_id if args.process_id >= 0 else None,
        )

    cfg = GeneratorConfig(num_residual_blocks=args.blocks)
    if args.checkpoint:
        dbm = DeepBedMap.from_checkpoint(args.checkpoint, cfg)
    elif args.npz:
        dbm = DeepBedMap.from_chainer_npz(args.npz, cfg)
    else:
        _log("untrained generator (no --checkpoint/--npz)")
        dbm = DeepBedMap(cfg=cfg)

    inputs = {
        k: np.load(f"{args.inputs}/{k}.npy") for k in ("X", "W1", "W2", "W3")
    }
    bounds = tuple(float(v) for v in args.bounds.split(","))
    mesh = None
    if args.mesh_devices:
        import jax
        from jax.sharding import Mesh

        if args.multihost:  # tiles shard over the process-LOCAL chips
            mesh = Mesh(
                np.asarray(jax.local_devices()[: args.mesh_devices]), ("data",)
            )
        else:
            from deepbedmap_tpu.parallel import make_mesh

            mesh = make_mesh(args.mesh_devices)
    dbm.predict_continent(
        inputs,
        bounds,
        outfilepath=args.out,
        tile_out=args.tile_out,
        halo_lr=args.halo_lr,
        mesh=mesh,
        stream_product=args.stream,
        tile_loop=args.tile_loop,
        prefetch=args.prefetch,
        tiles_per_dispatch=args.tiles_per_dispatch,
        overviews=args.overviews,
        predictor=args.predictor,
        multihost=args.multihost,
    )
    import jax as _jax

    if not args.multihost or _jax.process_index() == 0:
        _emit(
            {
                "command": "continent",
                "bounds": list(bounds),
                "out": args.out + ".tif",
                "sharded": mesh is not None,
                "streamed": bool(args.stream),
                "processes": _jax.process_count() if args.multihost else 1,
            }
        )
    return 0


def cmd_verify_weights(args) -> int:
    """Real-weight numerical parity harness (VERDICT r2 missing #1): given a
    reference-released Chainer npz (srgan_train.py:506-523, the Zenodo/Comet
    artifact) and a reference-produced output grid, run
    from_chainer_npz -> forward -> compare in ONE command. Inputs are the
    X/W1/W2/W3 .npy stacks (NCHW, the deepbedmap.py:381-447 test-region
    crops). The moment an artifact is mounted:

        python -m deepbedmap_tpu verify-weights --npz weights.npz \\
            --inputs arrays/ --expected reference_grid.nc --atol 0.5

    If the comparison fails, isolate the riskiest semantic first: run the
    committed deformable-conv golden fixture
    (tests/fixtures/deform_golden.npz) through Chainer/torchvision on any
    machine and compare against its ``expected`` member — the offset-layout
    mappings are documented in tests/test_deform_oracle.py.
    """
    import numpy as np

    from deepbedmap_tpu.api import DeepBedMap
    from deepbedmap_tpu.config import GeneratorConfig

    cfg = GeneratorConfig(
        num_residual_blocks=args.blocks, residual_scaling=args.scaling
    )
    dbm = DeepBedMap.from_chainer_npz(
        args.npz, cfg, offset_order=args.offset_order
    )
    inputs = {
        k: np.load(f"{args.inputs}/{k}.npy") for k in ("X", "W1", "W2", "W3")
    }
    import jax.numpy as jnp

    pred = np.asarray(
        dbm.forward_fn()(
            *(jnp.asarray(inputs[k].transpose(0, 2, 3, 1))
              for k in ("X", "W1", "W2", "W3"))
        )
    )[0, :, :, 0]

    if args.expected.endswith(".nc"):
        from deepbedmap_tpu.data.raster import read_netcdf

        expected = read_netcdf(args.expected).data
    elif args.expected.endswith((".tif", ".tiff")):
        from deepbedmap_tpu.data.geotiff import read_geotiff

        expected, _ = read_geotiff(args.expected)
    else:
        expected = np.load(args.expected)
    expected = np.asarray(expected, np.float32)
    if expected.shape != pred.shape:
        _emit(
            {
                "command": "verify-weights",
                "pass": False,
                "error": f"shape mismatch: predicted {list(pred.shape)} vs "
                f"expected {list(expected.shape)}",
            }
        )
        return 1

    finite = np.isfinite(expected)
    if not finite.any():
        # an all-nodata/NaN expected grid compares nothing — that is a
        # failed verification, not a vacuous pass
        _emit(
            {
                "command": "verify-weights",
                "pass": False,
                "error": "expected grid has zero finite pixels over the "
                "predicted region (wrong crop or nodata handling?)",
                "pixels_compared": 0,
            }
        )
        return 1
    diff = np.abs(pred[finite] - expected[finite])
    max_abs = float(diff.max())
    rmse = float(np.sqrt(np.mean(diff**2)))
    ok = max_abs <= args.atol
    _emit(
        {
            "command": "verify-weights",
            "pass": bool(ok),
            "max_abs_err": max_abs,
            "rmse": rmse,
            "atol": args.atol,
            "pixels_compared": int(finite.sum()),
        }
    )
    return 0 if ok else 1


def cmd_serve(args) -> int:
    from deepbedmap_tpu.api import DeepBedMap
    from deepbedmap_tpu.config import GeneratorConfig
    from deepbedmap_tpu.serve import serve_forever

    cfg = GeneratorConfig(num_residual_blocks=args.blocks)
    if args.checkpoint:
        dbm = DeepBedMap.from_checkpoint(args.checkpoint, cfg)
    elif args.npz:
        dbm = DeepBedMap.from_chainer_npz(args.npz, cfg)
    else:
        _log("serving an untrained generator (no --checkpoint/--npz)")
        dbm = DeepBedMap(cfg=cfg)
    serve_forever(
        dbm,
        host=args.host,
        port=args.port,
        data_root=args.data_root,
        token=args.token,
        bucket_px=args.bucket_px,
    )
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="deepbedmap_tpu", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = p.add_subparsers(dest="command", required=True)

    v = sub.add_parser("verify-data", help="check manifest files against sha256")
    v.add_argument("--datalist", default=None, help="datasets.yml (default: bundled)")
    v.add_argument("--root", default=".", help="directory holding the files")
    v.add_argument("--download", action="store_true", help="fetch missing files first")
    v.set_defaults(fn=cmd_verify_data)

    pk = sub.add_parser(
        "package-data",
        help="content-addressed dataset packages (quilt build/push/install)",
    )
    pk.add_argument("action", choices=("push", "install", "list"))
    pk.add_argument("--registry", required=True, help="registry directory")
    pk.add_argument("--name", default="deepbedmap/model/train")
    pk.add_argument("--model-dir", default="model", help="push: dir of *_data.npy")
    pk.add_argument(
        "--files", nargs="*", default=None,
        help="push: explicit member files instead of the training-array dir",
    )
    pk.add_argument("--dest", default="model", help="install: output dir")
    pk.add_argument("--hash", default=None, help="install: pin a version")
    pk.add_argument("--force", action="store_true")
    pk.set_defaults(fn=cmd_package_data)

    cat = sub.add_parser(
        "catalog", help="autogenerate per-folder data README.md files"
    )
    cat.add_argument("--root", default=".", help="data root (lowres/ highres/ ...)")
    cat.add_argument("--datalist", default=None)
    cat.add_argument("--catalog", default=None, help="also write a full catalog table")
    cat.set_defaults(fn=cmd_catalog)

    g = sub.add_parser("grid", help="survey config -> gridded NetCDF")
    g.add_argument("survey", help="per-survey pipeline JSON (highres/*.json format)")
    g.add_argument("-o", "--out", required=True)
    g.add_argument("--data-dir", default=None)
    g.add_argument("--spacing", type=float, default=250.0)
    g.add_argument("--region-mode", choices=("round", "surface"), default="round")
    g.set_defaults(fn=cmd_grid)

    b = sub.add_parser(
        "build", help="gridded surveys + conditioning rasters -> training arrays"
    )
    b.add_argument(
        "--surveys", required=True, help="dir of gridded survey NetCDFs (*.nc)"
    )
    b.add_argument("--lowres", required=True, help="BEDMAP2-style bed NetCDF")
    b.add_argument("--surface", required=True, help="REMA-style surface NetCDF")
    b.add_argument("--velocity-x", required=True)
    b.add_argument("--velocity-y", required=True)
    b.add_argument("--accumulation", required=True)
    b.add_argument("-o", "--out", required=True, help="output dir for *_data.npy")
    b.add_argument("--window-step", type=int, default=3)
    b.add_argument(
        "--gapfiller", type=float, default=None,
        help="nodata fill for the lowres bed (reference inference uses -5000)",
    )
    b.set_defaults(fn=cmd_build)

    t = sub.add_parser("train", help="train the GAN on tile arrays")
    t.add_argument("--tiles", default=None, help="dir with X/W1/W2/W3/Y_data.npy")
    t.add_argument("--synthetic-tiles", type=int, default=16)
    t.add_argument("--epochs", type=int, default=2)
    t.add_argument("--blocks", type=int, default=12)
    t.add_argument("--batch-size", type=int, default=128)
    t.add_argument("--learning-rate", type=float, default=1.6e-4)
    t.add_argument("--out", default=None, help="checkpoint path")
    t.add_argument(
        "--live-png", default=None,
        help="redraw training curves to this PNG every epoch (livelossplot role)",
    )
    t.add_argument(
        "--live-term", action="store_true",
        help="also print terminal sparklines per epoch",
    )
    t.set_defaults(fn=cmd_train)

    h = sub.add_parser("hpo", help="hyperparameter search (reference pruner config)")
    h.add_argument("--trials", type=int, default=3)
    h.add_argument("--storage", default=None, help="sqlite:///path.db")
    h.add_argument("--seed", type=int, default=42)
    h.add_argument(
        "--tiles", default=None,
        help="dir with X/W1/W2/W3/Y_data.npy (the `build` output); default "
        "falls back to synthetic tiles",
    )
    h.add_argument("--synthetic-tiles", type=int, default=16)
    h.add_argument("--tiny", action="store_true", help="tiny search space (smoke)")
    h.add_argument(
        "--eval-inputs", default=None,
        help="dir with X/W1/W2/W3.npy (NCHW) covering the fixed test area — "
        "wires the real RMSE objective (reference Pine Island evaluator)",
    )
    h.add_argument("--eval-track", default=None, help="csv with x,y,z columns")
    h.add_argument("--eval-bounds", default=None, help="xmin,ymin,xmax,ymax")
    h.add_argument("--eval-resolution", type=float, default=250.0)
    h.add_argument("--checkpoint-dir", default=None,
                   help="save per-trial best checkpoints here")
    h.add_argument("--top-n", type=int, default=10,
                   help="trials in the report (reference prints top 10)")
    h.add_argument("--report", default=None, help="write the top-N report JSON here")
    h.set_defaults(fn=cmd_hpo)

    pr = sub.add_parser("predict", help="super-resolve one region")
    pr.add_argument("--checkpoint", default=None)
    pr.add_argument("--npz", default=None, help="reference-format weights")
    pr.add_argument("--blocks", type=int, default=12)
    pr.add_argument("--bounds", required=True, help="xmin,ymin,xmax,ymax (EPSG:3031 m)")
    pr.add_argument("--bed", required=True, help="lowres bed NetCDF")
    pr.add_argument("--surface", required=True)
    pr.add_argument("--velocity-x", required=True)
    pr.add_argument("--velocity-y", required=True)
    pr.add_argument("--accumulation", required=True)
    pr.add_argument("-o", "--out", required=True)
    pr.set_defaults(fn=cmd_predict)

    e = sub.add_parser("evaluate", help="track RMSE of a DEM vs survey xyz csv")
    e.add_argument("--dem", required=True)
    e.add_argument("--track", required=True, help="csv with x,y,z columns")
    e.add_argument("--method", default="bicubic", choices=("bicubic", "bilinear", "nearest"))
    e.set_defaults(fn=cmd_evaluate)

    f = sub.add_parser("figures", help="regenerate the paper figure set")
    f.add_argument("-o", "--out", default="figures")
    f.set_defaults(fn=cmd_figures)

    c = sub.add_parser(
        "continent", help="whole-region band-streamed DEM -> GeoTIFF product"
    )
    c.add_argument("--inputs", required=True, help="dir with X/W1/W2/W3.npy (NCHW)")
    c.add_argument("--bounds", required=True, help="xmin,ymin,xmax,ymax (EPSG:3031 m)")
    c.add_argument("-o", "--out", required=True, help="output path (without .tif)")
    c.add_argument("--checkpoint", default=None)
    c.add_argument("--npz", default=None)
    c.add_argument("--blocks", type=int, default=12)
    c.add_argument("--tile-out", type=int, default=1000)
    c.add_argument("--halo-lr", type=int, default=18)
    c.add_argument("--mesh-devices", type=int, default=0, help="shard tiles over N devices")
    c.add_argument("--stream", action="store_true", help="pipe strips into the GeoTIFF (encode overlaps compute)")
    c.add_argument(
        "--tile-loop", choices=("scan", "host"), default="scan",
        help="band tile iteration: 'host' = one jitted tile fn, ~25x faster "
        "first compile with the fused Pallas trunk (single-device paths)",
    )
    c.add_argument(
        "--prefetch", type=int, default=1,
        help="bands dispatched ahead of the blocking fetch (next band's "
        "transfer overlaps compute; 0 = serial)",
    )
    c.add_argument(
        "--multihost", action="store_true",
        help="pod mode: distribute row bands across jax processes "
        "(inference.multihost); run one process per host, product written "
        "by process 0. --mesh-devices then counts LOCAL chips per host",
    )
    c.add_argument("--coordinator", default="", help="coordinator host:port (pod)")
    c.add_argument("--num-processes", type=int, default=0, help="pod process count")
    c.add_argument("--process-id", type=int, default=-1, help="this process's id")
    c.add_argument(
        "--tiles-per-dispatch", type=int, default=2,
        help="tiles batched per forward on the single-device paths (2 "
        "recovers ~6%% of per-tile time; device memory scales with it)",
    )
    c.add_argument(
        "--predictor", action="store_true",
        help="with --stream: TIFF horizontal differencing before the LZW "
        "(data-dependent: smaller on smooth beds, larger near white-noise "
        "roughness)",
    )
    c.add_argument(
        "--overviews", type=int, default=0,
        help="with --stream: append N 2x overview pyramid levels as chained "
        "TIFF pages (nodata-aware average, built incrementally)",
    )
    c.set_defaults(fn=cmd_continent)

    vw = sub.add_parser(
        "verify-weights",
        help="prove numerical parity of a reference Chainer npz artifact "
        "against a reference-produced output grid (one command)",
    )
    vw.add_argument("--npz", required=True, help="Chainer-format generator npz")
    vw.add_argument(
        "--inputs", required=True,
        help="dir with X/W1/W2/W3.npy (NCHW) covering the expected grid",
    )
    vw.add_argument(
        "--expected", required=True,
        help="reference-produced grid (.nc, .tif, or .npy)",
    )
    vw.add_argument("--blocks", type=int, default=12)
    vw.add_argument("--scaling", type=float, default=0.1)
    vw.add_argument("--offset-order", default="xy", choices=("xy", "yx"))
    vw.add_argument(
        "--atol", type=float, default=0.5,
        help="max abs error tolerated (0.5 m covers int16 product rounding)",
    )
    vw.set_defaults(fn=cmd_verify_weights)

    s = sub.add_parser("serve", help="HTTP inference service (see serve.py)")
    s.add_argument("--checkpoint", default=None)
    s.add_argument("--npz", default=None)
    s.add_argument("--blocks", type=int, default=12)
    s.add_argument(
        "--host", default="127.0.0.1",
        help="bind address (non-loopback should also set --token)",
    )
    s.add_argument("--port", type=int, default=8500)
    s.add_argument(
        "--data-root", default=None,
        help="directory request paths are confined to (default: cwd)",
    )
    s.add_argument(
        "--token", default=None,
        help="require 'Authorization: Bearer TOKEN' on predict/evaluate",
    )
    s.add_argument(
        "--bucket-px", type=int, default=0,
        help="round predict windows up to power-of-two buckets of this many "
        "output px (multiple of 4; bounds the number of distinct compiles)",
    )
    s.set_defaults(fn=cmd_serve)

    return p


def main(argv=None) -> int:
    # every CLI entry point gets the persistent XLA compilation cache (the
    # continent predictor's first compile is minutes; later runs ~free) —
    # opt out with DEEPBEDMAP_JAX_CACHE=off
    from deepbedmap_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
