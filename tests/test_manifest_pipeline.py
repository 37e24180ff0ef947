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


def test_bundled_survey_configs():
    """All 11 reference survey configs ship with the package and parse
    (reference iterates highres/*.json at data_prep.py:340-345)."""
    from deepbedmap_tpu.data.pipeline import (
        list_survey_configs,
        survey_config_path,
    )

    configs = list_survey_configs()
    assert len(configs) == 11
    names = {os.path.splitext(os.path.basename(p))[0] for p in configs}
    assert {
        "2007tx", "2010tr", "istarxx", "201x_Antarctica_Basler",
        "20xx_Antarctica_DC8", "20xx_Antarctica_DC8_THW",
        "20xx_Antarctica_TO", "Data_20141121_05",
        "WISE_ISODYN_RadarByFlight", "bed_WGS84_grid",
        "bed_depth_below_WGS84_datum",
    } == names
    for p in configs:
        doc = json.load(open(p))
        stages = {s["type"] for s in doc["pipeline"]}
        assert "readers.text" in stages
    assert survey_config_path("2010tr").endswith("2010tr.json")


def test_survey_configs_run_on_synthetic_miniatures(tmp_path):
    """One synthetic miniature per survey config format: every packaged
    config must drive ascii_to_xyz end-to-end via data_dir."""
    from deepbedmap_tpu.data.pipeline import list_survey_configs

    # data files matching every config's glob, one format each
    def write(name, text):
        (tmp_path / name).write_text(text)

    # NB: the reader passes header=skip to pandas (reference parity,
    # data_prep.py:298-303) which consumes one extra leading data row when
    # column names are supplied — miniatures carry a sacrificial first row.
    tab8 = "x\ty\tz_surf\ttime\th\th_fc\tz\tz_fc\n"
    write("2007ta.txt", tab8 + "0\t0\t0\t0\t0\t0\t0\t0\n"
          "100.0\t-200.0\t1\t2\t3\t4\t5\t-321.5\n")
    write("2010tr.txt", "x\ty\tz_surf\ttime\th\th_fc\tz_bed\tz_bed_fc\tz-surf\n"
          "0\t0\t0\t0\t0\t0\t0\t0\t0\n"
          "10.0\t-20.0\t1\t2\t3\t4\t5\t-30.25\t6\n")
    write("istar01.txt", "x\ty\tz_surf\ttime\th\th_fc\tz_bed\tz_bed_fc\n"
          "0\t0\t0\t0\t0\t0\t0\t0\n"
          "1.0\t2.0\t1\t2\t3\t4\t5\t-3.5\n")
    cresis_hdr = "Y,X,TIME,THICK,ELEVATION,FRAME,SURFACE,BOTTOM,QUALITY\n"
    cresis_row = ("-77.0,167.0,0,100,1000.0,1,10,900.0,1\n"
                  "-77.5,167.2,0,100,1200.0,1,10,900.0,1\n")
    for f in ("2011_Antarctica_Basler.csv", "2011_Antarctica_DC8.csv",
              "2011_Antarctica_TO_wing.csv", "Data_20141121_05.csv"):
        write(f, cresis_hdr + cresis_row)
    write("bed_WGS84_grid.txt", "junk\n" * 19 +
          "x\ty\tz\tcolumn\trow\n0\t0\t0\t0\t0\n5.0\t6.0\t-7.0\t1\t2\n")
    write("bed_depth_below_WGS84_datum.csv", "x,y,z\n0,0,0\n1.0,2.0,-3.0\n")
    # WISE: whitespace-separated with 11 header rows and '*' as NaN, zipped
    import zipfile

    wise_cols = ("FlightID Line_name X Y x y Height_WGS1984 Date Time "
                 "Segy_name traceNum PriNum surfPickLoc bedPickLoc Z "
                 "Bedrock_and_BEDMAP2 Mask picked_bedElev surfElev tIce")
    wise_body = "\n".join(["header junk"] * 10 + [wise_cols] + [
        "f0 l0 159.0 -77.0 1 2 3 4 5 s 6 7 8 9 -400.0 10 11 12 13 14",
        "f1 l1 160.0 -78.0 1 2 3 4 5 s 6 7 8 9 -500.0 10 11 12 13 14",
        "f1 l1 161.0 -78.5 1 2 3 4 5 s 6 7 8 9 * 10 11 12 13 14",  # NaN row
    ]) + "\n"
    with zipfile.ZipFile(tmp_path / "WISE_ISODYN_RadarByFlight_ASCII.zip", "w") as z:
        z.writestr("wise.txt", wise_body)

    for cfg in list_survey_configs():
        df = ascii_to_xyz(cfg, data_dir=str(tmp_path))
        assert list(df.columns) == ["x", "y", "z"]
        assert len(df) >= 1, cfg
        assert df.notna().all().all(), cfg

    # spot-check the CReSIS converter math (Z = ELEVATION - BOTTOM) and
    # reprojection to EPSG:3031 metres
    df = ascii_to_xyz(
        os.path.join(os.path.dirname(list_survey_configs()[0]),
                     "20xx_Antarctica_DC8.json"),
        data_dir=str(tmp_path),
    )
    assert abs(float(df["z"].iloc[0]) - 300.0) < 1e-6  # 1200 - 900
    assert 1e5 < abs(float(df["x"].iloc[0])) < 5e6  # projected metres
