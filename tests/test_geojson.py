"""GeoJSON grounding-line ingestion tests (reference data_prep.py:585-615)."""

import json

import numpy as np

from deepbedmap_tpu.data.geojson import (
    PolygonSet,
    filter_within_polygons,
    load_polygons,
    write_tiles_geojson,
)
from deepbedmap_tpu.data.windows import filter_within_polygon


def _multipolygon_doc():
    # two squares; the first has a hole in its middle
    return {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {},
                "geometry": {
                    "type": "MultiPolygon",
                    "coordinates": [
                        [
                            [[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]],
                            [[40, 40], [60, 40], [60, 60], [40, 60], [40, 40]],
                        ],
                        [[[200, 0], [300, 0], [300, 100], [200, 100], [200, 0]]],
                    ],
                },
            }
        ],
    }


def test_load_multipolygon_with_holes():
    ps = load_polygons(_multipolygon_doc())
    assert ps.num_polygons == 2
    outer, holes = ps.polygons[0]
    assert outer.shape == (5, 2) and len(holes) == 1

    px = np.array([50.0, 10.0, 250.0, 150.0, 50.0])
    py = np.array([50.0, 10.0, 50.0, 50.0, 41.0])
    got = ps.contains(px, py)
    # centre of the hole: outside; interiors: inside; gap between squares: out
    assert got.tolist() == [False, True, True, False, False]


def test_buffered_membership_hole_and_gap():
    ps = load_polygons(_multipolygon_doc())
    px = np.array([50.0, 105.0, 150.0, 50.0])
    py = np.array([50.0, 50.0, 50.0, 50.0])
    # centre of 20-wide hole is within 10 of the hole edge -> buffered in;
    # 5 outside the outer edge -> in; deep in the gap -> out
    got = ps.contains_buffered(px, py, buffer=10.0)
    assert got.tolist() == [True, True, False, True]


def test_filter_within_polygons_matches_single_ring_filter():
    rng = np.random.RandomState(0)
    square = np.array([[0, 0], [1000, 0], [1000, 1000], [0, 1000]], float)
    ps = PolygonSet(((square, ()),))
    origins = rng.rand(50, 2) * 1200 - 100
    bounds = [(x, y, x + 50, y + 50) for x, y in origins]
    legacy = filter_within_polygon(bounds, square, buffer=25.0)
    multi = filter_within_polygons(bounds, ps, buffer=25.0)
    assert legacy == multi and len(multi) > 5


def test_write_tiles_geojson_roundtrip(tmp_path):
    bounds = [(-1_600_000.0, -180_000.0, -1_590_000.0, -170_000.0),
              (-1_580_000.0, -160_000.0, -1_570_000.0, -150_000.0)]
    p3031 = tmp_path / "tiles_3031.geojson"
    p4326 = tmp_path / "tiles_4326.geojson"
    write_tiles_geojson(bounds, str(p3031))
    write_tiles_geojson(bounds, str(p4326), to_lonlat=True)

    doc = json.load(open(p3031))
    assert doc["type"] == "FeatureCollection" and len(doc["features"]) == 2
    ring = doc["features"][0]["geometry"]["coordinates"][0]
    assert ring[0] == list(ring[-1]) or tuple(ring[0]) == tuple(ring[-1])
    assert "3031" in doc["crs"]["properties"]["name"]

    # the 4326 twin reprojects back onto the same projected corners
    ps = load_polygons(json.load(open(p4326)), reproject_lonlat=True)
    outer, _ = ps.polygons[0]
    np.testing.assert_allclose(outer[0], [bounds[0][0], bounds[0][1]], atol=1.0)
    np.testing.assert_allclose(outer[2], [bounds[0][2], bounds[0][3]], atol=1.0)
