"""Manifest + pipeline-reader tests (synthetic files; schema mirrors the
reference's highres/*.json configs and data manifest)."""

import hashlib
import json
import os

import numpy as np
import pytest

from deepbedmap_tpu.data.manifest import (
    DEFAULT_MANIFEST,
    check_sha256,
    parse_datalist,
    verify_datalist,
)
from deepbedmap_tpu.data.pipeline import ascii_to_xyz
from deepbedmap_tpu.data.proj import lonlat_to_xy


def test_bundled_manifest_parses():
    records = parse_datalist(DEFAULT_MANIFEST)
    assert len(records) == 33  # the reference's 33 source files
    names = {r["filename"] for r in records}
    assert "bedmap2_bed.tif" in names
    assert "REMA_100m_dem.tif" in names
    for r in records:
        assert r["sha256"] and r["url"], r


def test_check_sha256(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"deepbedmap")
    assert check_sha256(str(p)) == hashlib.sha256(b"deepbedmap").hexdigest()


def test_verify_datalist(tmp_path):
    import yaml

    payload = b"some raster bytes"
    (tmp_path / "lowres").mkdir()
    (tmp_path / "lowres" / "a.tif").write_bytes(payload)
    manifest = {
        "files": [
            {
                "name": "a.tif",
                "folder": "lowres",
                "url": "http://example/a.tif",
                "sha256": hashlib.sha256(payload).hexdigest(),
            },
            {"name": "missing.tif", "folder": "lowres", "url": "u", "sha256": "0" * 64},
        ]
    }
    mpath = tmp_path / "m.yml"
    mpath.write_text(yaml.safe_dump(manifest))
    results = verify_datalist(str(mpath), root=str(tmp_path))
    assert results == {str(tmp_path / "lowres" / "a.tif"): True}


def test_ascii_to_xyz_with_converters_and_reprojection(tmp_path):
    # mirror the 20xx_Antarctica_DC8.json shape: converters + reprojection
    csv = tmp_path / "2011_Antarctica_X.csv"
    rows = [
        "Y,X,ELEVATION,BOTTOM",
        "-77.5,166.6,100.0,900.0",
        "-78.0,167.0,50.0,800.0",
        "-78.5,,10.0,700.0",  # NaN row dropped
    ]
    csv.write_text("\n".join(rows) + "\n")
    cfg = {
        "pipeline": [
            {
                "type": "readers.text",
                "filename": "20??_Antarctica_X.csv",
                "separator": ",",
                "skip": 1,
                "header": "Y,X,TIME,THICK,ELEVATION,FRAME,SURFACE,BOTTOM,QUALITY"[
                    :33
                ],
                "usecols": "X,Y,ELEVATION,BOTTOM",
                "converters": {"Z": "ELEVATION-BOTTOM"},
                "dropcols": "ELEVATION,BOTTOM",
            },
            {
                "type": "filters.reprojection",
                "in_srs": "EPSG:4326",
                "out_srs": "EPSG:3031",
            },
        ]
    }
    # header must cover the 4 used columns in file order
    cfg["pipeline"][0]["header"] = "Y,X,ELEVATION,BOTTOM"
    jpath = tmp_path / "survey.json"
    jpath.write_text(json.dumps(cfg))

    df = ascii_to_xyz(str(jpath))
    assert list(df.columns) == ["x", "y", "z"]
    # reference semantics: header=skip consumes the first data row too, and
    # the NaN row is dropped
    assert len(df) == 1
    x, y = lonlat_to_xy(167.0, -78.0)
    np.testing.assert_allclose(df["x"].iloc[0], x)
    np.testing.assert_allclose(df["y"].iloc[0], y)
    np.testing.assert_allclose(df["z"].iloc[0], 50.0 - 800.0)


def test_ascii_to_xyz_plain(tmp_path):
    txt = tmp_path / "2010tr.txt"
    txt.write_text("x\ty\tz\nheaderskip\tz\tz\n1.0\t2.0\t-3.0\n4.0\t5.0\t-6.0\n")
    cfg = {
        "pipeline": [
            {
                "type": "readers.text",
                "filename": "2010tr.txt",
                "separator": "\t",
                "skip": 1,
                "header": "x\ty\tz_bed",
                "usecols": "x\ty\tz_bed",
            }
        ]
    }
    jpath = tmp_path / "p.json"
    jpath.write_text(json.dumps(cfg))
    df = ascii_to_xyz(str(jpath))
    assert list(df.columns) == ["x", "y", "z"]
    assert len(df) == 2
    assert df["z"].tolist() == [-3.0, -6.0]


def test_download_archive_member(tmp_path):
    """Archive-member extraction via a file:// URL (the reference pulls
    survey CSVs out of zip/tgz archives, data_prep.py:83-102)."""
    import zipfile

    src = tmp_path / "bundle.zip"
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("nested/dir/survey.csv", "x,y,z\n1,2,3\n")
        zf.writestr("other.txt", "ignore")
    from deepbedmap_tpu.data.manifest import download_to_path

    dest = tmp_path / "out" / "survey.csv"
    download_to_path(str(dest), f"file://{src}".replace("bundle.zip", "bundle.zip"))
    # url ends with .zip but member defaults to basename of path
    assert dest.read_text() == "x,y,z\n1,2,3\n"


def test_dataset_hash_pinning(tmp_path):
    import numpy as np

    from deepbedmap_tpu.data.dataset import TileDataset

    ds = TileDataset.synthetic(4, seed=0)
    h = ds.save_npy_dir(str(tmp_path / "train"))
    back = TileDataset.load_npy_dir(str(tmp_path / "train"), expected_hash=h)
    assert len(back) == 4
    import pytest

    with pytest.raises(ValueError):
        TileDataset.load_npy_dir(str(tmp_path / "train"), expected_hash="0" * 64)
