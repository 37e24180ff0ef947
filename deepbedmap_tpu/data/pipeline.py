"""PDAL-style pipeline reader: survey ascii/csv -> clean x,y,z table.

Reference ``ascii_to_xyz`` (data_prep.py:259-336) interprets per-survey JSON
configs (highres/*.json) with a ``readers.text`` stage (skip/separator/header/
usecols/na_values + optional ``converters`` column math and ``dropcols``) and
an optional ``filters.reprojection`` stage (EPSG:4326 -> EPSG:3031). This
module reads the same JSON format; reprojection uses the framework's own
polar-stereographic transform (``data.proj``) instead of pyproj.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict

import pandas as pd

from deepbedmap_tpu.data.proj import lonlat_to_xy

# The 11 reference surveys ship as packaged pipeline configs
# (deepbedmap_tpu/data/surveys/*.json, mirroring /root/reference/highres/*.json
# which data_prep.py:340-345 iterates over).
SURVEYS_DIR = os.path.join(os.path.dirname(__file__), "surveys")


def list_survey_configs() -> list[str]:
    """Paths of the packaged per-survey pipeline configs, sorted by name."""
    import glob as _glob

    return sorted(_glob.glob(os.path.join(SURVEYS_DIR, "*.json")))


def survey_config_path(name: str) -> str:
    """Path of one packaged survey config, e.g. ``'2010tr'``."""
    path = os.path.join(SURVEYS_DIR, name + ".json")
    assert os.path.exists(path), f"unknown survey {name!r}; see list_survey_configs()"
    return path


def ascii_to_xyz(pipeline_file: str, data_dir: str | None = None) -> pd.DataFrame:
    """Run a pipeline JSON; returns a DataFrame with columns x, y, z.

    ``data_dir`` overrides where the reader's ``filename`` glob is anchored
    (defaults to the config's own directory, matching the reference layout
    where configs sit next to the survey files).
    """
    assert os.path.exists(pipeline_file), pipeline_file
    assert pipeline_file.endswith(".json")

    with open(pipeline_file) as f:
        doc = json.load(f)
    stages: Dict[str, Dict] = {s["type"]: s for s in doc["pipeline"]}
    reader = stages["readers.text"]

    sep = reader["separator"]
    skip = int(reader["skip"])
    names = reader["header"].split(sep)
    usecols = reader["usecols"].split(sep)
    na_values = reader.get("na_values")

    base = data_dir if data_dir is not None else os.path.dirname(pipeline_file)
    pattern = os.path.join(base, reader["filename"])
    files = sorted(glob.glob(pattern))
    assert files, f"no files match {pattern}"

    df = pd.concat(
        pd.read_csv(
            f, sep=sep, header=skip, names=names, usecols=usecols,
            na_values=na_values,
        )
        for f in files
    )
    df.dropna(axis="index", inplace=True)
    df.reset_index(drop=True, inplace=True)

    # optional column math + drops (e.g. WGS84 ellipsoid datum shifts)
    if "converters" in reader:
        converters = dict(reader["converters"])
        newcol, expr = converters.popitem()
        df[newcol] = df.eval(expr)
        dropcols = reader["dropcols"].split(sep)
        df.drop(columns=dropcols, inplace=True)

    assert len(df.columns) == 3, df.columns
    df = df.reindex(sorted(df.columns), axis="columns")
    df.columns = ["x", "y", "z"]

    # optional reprojection (the reference configs use EPSG:4326 -> 3031)
    if "filters.reprojection" in stages:
        reproj = stages["filters.reprojection"]
        assert "4326" in str(reproj.get("in_srs", "4326"))
        assert "3031" in str(reproj.get("out_srs", "3031"))
        x2, y2 = lonlat_to_xy(df["x"].to_numpy(), df["y"].to_numpy())
        df["x"] = x2
        df["y"] = y2

    return df
