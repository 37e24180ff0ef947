"""Content-addressed dataset packaging + folder-README autogen + live
curves — the reference's quilt / README / livelossplot roles
(data_prep.py:168-205, 938-970; srgan_train.py:87-125, 1625-1632)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from deepbedmap_tpu.data import packaging
from deepbedmap_tpu.data.dataset import REFERENCE_SHAPES_NCHW, TileDataset


def _model_dir(tmp_path, n=3, seed=0):
    d = tmp_path / "model"
    d.mkdir()
    rs = np.random.RandomState(seed)
    for k, shp in REFERENCE_SHAPES_NCHW.items():
        np.save(d / f"{k}_data.npy", rs.rand(n, *shp).astype(np.float32))
    (d / "CONTENT_HASH").write_text("deadbeef\n")
    return str(d)


def test_push_install_roundtrip(tmp_path):
    model = _model_dir(tmp_path)
    registry = str(tmp_path / "registry")
    h = packaging.push_training_arrays(model, registry)
    assert len(h) == 64

    dest = str(tmp_path / "restored")
    manifest = packaging.install(registry, "deepbedmap/model/train", dest, pkg_hash=h)
    assert manifest["meta"]["content_hash"] == "deadbeef"
    for k in REFERENCE_SHAPES_NCHW:
        a = np.load(os.path.join(model, f"{k}_data.npy"))
        b = np.load(os.path.join(dest, f"{k}_data.npy"))
        np.testing.assert_array_equal(a, b)


def test_load_by_hash_pins_the_version(tmp_path):
    registry = str(tmp_path / "registry")
    h1 = packaging.push_training_arrays(_model_dir(tmp_path, seed=1), registry)
    # second version with different content under a different tmp dir
    d2 = tmp_path / "v2"
    d2.mkdir()
    h2 = packaging.push_training_arrays(
        _model_dir(d2, seed=2), registry
    )
    assert h1 != h2
    # latest resolves to v2; explicit hash restores v1 exactly
    assert packaging.resolve(registry, "deepbedmap/model/train")["hash"] == h2
    ds1 = TileDataset.from_package(registry, pkg_hash=h1)
    ds2 = TileDataset.from_package(registry)
    assert len(ds1) == len(ds2) == 3
    assert not np.array_equal(
        np.asarray(ds1.arrays["Y"]), np.asarray(ds2.arrays["Y"])
    )
    vs = packaging.versions(registry, "deepbedmap/model/train")
    assert {m["hash"] for m in vs} == {h1, h2}


def test_corrupted_blob_fails_loudly(tmp_path):
    registry = str(tmp_path / "registry")
    h = packaging.push_training_arrays(_model_dir(tmp_path), registry)
    manifest = packaging.resolve(registry, "deepbedmap/model/train", h)
    blob = os.path.join(
        registry, "blobs", manifest["members"]["Y_data.npy"]["sha256"]
    )
    with open(blob, "r+b") as f:
        f.seek(10)
        f.write(b"\xff\xff")
    with pytest.raises(ValueError, match="corrupt"):
        packaging.load_arrays(registry, "deepbedmap/model/train", h)
    with pytest.raises(ValueError, match="corrupt"):
        packaging.install(
            registry, "deepbedmap/model/train", str(tmp_path / "x"), pkg_hash=h
        )


def test_blob_dedup_across_versions(tmp_path):
    registry = str(tmp_path / "registry")
    model = _model_dir(tmp_path)
    h1 = packaging.push_training_arrays(model, registry)
    h2 = packaging.push_training_arrays(model, registry)  # identical content
    assert h1 == h2
    blobs = os.listdir(os.path.join(registry, "blobs"))
    assert len(blobs) == 5  # X/W1/W2/W3/Y — stored once


def test_cli_package_roundtrip(tmp_path):
    model = _model_dir(tmp_path)
    registry = str(tmp_path / "registry")
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")

    def run(*argv):
        out = subprocess.run(
            [sys.executable, "-m", "deepbedmap_tpu", *argv],
            capture_output=True, text=True, env=env, check=True,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])

    pushed = run(
        "package-data", "push", "--registry", registry, "--model-dir", model
    )
    listed = run("package-data", "list", "--registry", registry)
    got = run(
        "package-data", "install", "--registry", registry,
        "--dest", str(tmp_path / "dest"), "--hash", pushed["hash"],
    )
    assert listed["versions"][0]["hash"] == pushed["hash"]
    assert got["hash"] == pushed["hash"]
    assert os.path.exists(tmp_path / "dest" / "X_data.npy")


def test_folder_readmes(tmp_path):
    from deepbedmap_tpu.data.manifest import write_folder_readmes

    written = write_folder_readmes(str(tmp_path))
    folders = {os.path.basename(os.path.dirname(p)) for p in written}
    assert {"lowres", "highres", "misc"} <= folders
    text = open(os.path.join(str(tmp_path), "lowres", "README.md")).read()
    assert "Low Resolution Antarctic datasets" in text
    assert "bedmap2_bed.tif" in text
    assert "automatically generated" in text
    # multi-file groups collapse to a count (the 11-survey highres folder)
    hi = open(os.path.join(str(tmp_path), "highres", "README.md")).read()
    assert "files" in hi and "| 1000m |" not in hi.split("\n")[0]


def test_live_curves(tmp_path):
    from deepbedmap_tpu.viz.live import LiveCurves, sparkline

    out = str(tmp_path / "curves.png")
    cb = LiveCurves(out_png=out, every=2)
    stop = False
    for epoch in range(1, 7):
        stop = cb(
            epoch,
            {
                "g_loss": 10.0 / epoch,
                "d_loss": 1.0 + 0.1 * epoch,
                "psnr": 20 + epoch,
                "note": "not-a-number",
            },
        )
    assert stop is False
    assert os.path.exists(out) and os.path.getsize(out) > 1000
    assert not os.path.exists(out + ".tmp.png")  # atomic replace
    lines = cb.render_terminal()
    assert any("g_loss" in ln for ln in lines)
    assert len(sparkline([1, 2, 3, 2, 1])) == 5
