"""Synthetic miniatures of the 11 reference survey formats.

Each packaged pipeline config (deepbedmap_tpu/data/surveys/*.json, mirroring
the reference highres/*.json that data_prep.py:340-345 iterates) describes a
third-party ascii format: separator, header rows to skip, column names,
usecols, optional na_values / converter math / dropped columns / zip
packaging / EPSG:4326->3031 reprojection, and a glob filename pattern.

``make_survey_miniature`` writes data file(s) that exercise ALL of those
features for a given config — junk header lines, junk columns, multi-file
globs, single-member zips, '*' NaN markers — over a smooth synthetic bed
surface, and returns the exact x/y/z table the pipeline must recover, so
tests can drive every bundled config through
ascii_to_xyz -> get_region -> xyz_to_grid on real (synthetic) bytes.
"""

from __future__ import annotations

import fnmatch
import json
import os
import zipfile

import numpy as np
import pandas as pd

from deepbedmap_tpu.data.proj import lonlat_to_xy


def bed_elevation(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Smooth synthetic bed (metres) over projected coords."""
    return (
        -500.0
        + 120.0 * np.sin(x / 800.0)
        + 80.0 * np.cos(y / 700.0)
        + 1e-4 * (x - y)
    )


def _concrete_names(pattern: str) -> list:
    """Concrete filenames matching a glob pattern; two files when the
    pattern has a '*' (to exercise multi-file concat)."""
    first = pattern.replace("?", "1").replace("*", "")
    names = [first]
    if "*" in pattern:
        names.append(pattern.replace("?", "1").replace("*", "_b"))
    for n in names:
        assert fnmatch.fnmatch(n, pattern), (n, pattern)
    return names


def make_survey_miniature(
    config_path: str,
    out_dir: str,
    n_points: int = 1200,
    seed: int = 0,
    span_m: float = 2500.0,
    origin: "tuple | None" = None,
):
    """Write miniature survey file(s) for ``config_path`` into ``out_dir``.

    Returns the expected (x, y, z) DataFrame — projected EPSG:3031 metres —
    that ``ascii_to_xyz(config_path, data_dir=out_dir)`` must produce.

    ``origin``: lower-left corner of the survey's span_m x span_m patch in
    projected EPSG:3031 metres. Defaults keep the historical placement
    (origin (0, 0) for projected-coordinate surveys; the West Antarctica
    lon/lat patch for reprojection surveys). The scale rehearsal
    (tests/test_dataprep_scale.py) positions all 11 surveys on a mosaic so
    one set of continental conditioning rasters covers them.
    """
    with open(config_path) as f:
        doc = json.load(f)
    stages = {s["type"]: s for s in doc["pipeline"]}
    reader = stages["readers.text"]
    sep = reader["separator"]
    skip = int(reader["skip"])
    names = reader["header"].split(sep)
    usecols = reader["usecols"].split(sep)
    na_marker = reader.get("na_values")
    reproj = "filters.reprojection" in stages

    rs = np.random.RandomState(seed)
    if reproj:
        from deepbedmap_tpu.data.proj import xy_to_lonlat

        if origin is None:
            # historical placement: the West Antarctica lon/lat patch center
            ox, oy = lonlat_to_xy(np.array([-99.9]), np.array([-75.99]))
            origin = (float(ox[0]) - span_m / 2, float(oy[0]) - span_m / 2)
        px = rs.uniform(origin[0], origin[0] + span_m, n_points)
        py = rs.uniform(origin[1], origin[1] + span_m, n_points)
        # write lon/lat to file; the pipeline reprojects back (sub-nm
        # roundtrip, tests/test_data.py proj goldens)
        lon, lat = xy_to_lonlat(px, py)
        px, py = lonlat_to_xy(lon, lat)  # exact pipeline output coords
        file_x, file_y = lon, lat
    else:
        if origin is None:
            origin = (0.0, 0.0)
        px = rs.uniform(origin[0], origin[0] + span_m, n_points)
        py = rs.uniform(origin[1], origin[1] + span_m, n_points)
        file_x, file_y = px, py
    z = bed_elevation(np.asarray(px), np.asarray(py))

    converters = reader.get("converters")
    if converters:
        # e.g. {'Z': 'ELEVATION-BOTTOM'}: z comes from column math over two
        # usecols that are dropped afterwards
        newcol, expr = dict(converters).popitem()
        lhs, op, rhs = expr.partition("-")
        assert op == "-", f"only difference converters modelled: {expr}"
        thickness = rs.uniform(500.0, 1500.0, n_points)
        col_values = {lhs: z + thickness, rhs: thickness}
    else:
        col_values = {}

    # map usecols onto x / y / z semantics: the pipeline sorts the final
    # three columns alphabetically and renames to x, y, z
    plain = [c for c in usecols if c not in col_values]
    if converters:
        assert len(plain) == 2  # the coordinate pair
        cx, cy = sorted(plain)
        col_values[cx], col_values[cy] = file_x, file_y
    else:
        assert len(plain) == 3
        cx, cy, cz = sorted(plain)
        col_values[cx], col_values[cy], col_values[cz] = file_x, file_y, z

    # every header column present; junk in the ones the reader drops
    table = {}
    for i, name in enumerate(names):
        if name in col_values:
            table[name] = col_values[name]
        else:
            table[name] = np.full(n_points, float(i))
    df_file = pd.DataFrame(table, columns=names)

    write_sep = "\t" if sep == "\t" else ("," if sep == "," else " ")
    lines = []
    for r in range(skip):
        lines.append(f"# junk header line {r}")
    lines.append(write_sep.join(names if sep != "\\s+" else names))
    body = df_file.to_csv(
        sep=write_sep, index=False, header=False, lineterminator="\n"
    ).rstrip("\n")
    body_lines = body.split("\n")
    if na_marker:
        # poison two rows' z-ish column with the NaN marker; the pipeline
        # must drop them
        zcol = names.index(cz if not converters else lhs)
        for bad in (0, 1):
            parts = body_lines[bad].split(write_sep)
            parts[zcol] = str(na_marker)
            body_lines[bad] = write_sep.join(parts)
    lines.extend(body_lines)
    content = "\n".join(lines) + "\n"

    filenames = _concrete_names(reader["filename"])
    for fname in filenames:
        path = os.path.join(out_dir, fname)
        if fname.endswith(".zip"):
            member = fname[:-4] + ".txt"
            with zipfile.ZipFile(path, "w") as zf:
                zf.writestr(member, content)
        else:
            with open(path, "w") as f:
                f.write(content)

    keep = np.ones(n_points, bool)
    if na_marker:
        keep[[0, 1]] = False
    expected = pd.DataFrame(
        {"x": np.asarray(px)[keep], "y": np.asarray(py)[keep], "z": z[keep]}
    ).reset_index(drop=True)
    # multi-file globs concat the same content per file
    if len(filenames) > 1:
        expected = pd.concat(
            [expected] * len(filenames), ignore_index=True
        )
    return expected
