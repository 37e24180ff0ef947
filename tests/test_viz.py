"""Smoke tests for the paper-figure factory (viz.paper) + base figures.

The reference regenerates its paper figures from the prediction artifacts
(paper_figures.py); these tests build a tiny synthetic DEM family and check
every fig_* function renders headless and puts the right artists on the axes.
"""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

from deepbedmap_tpu.data.raster import Raster
from deepbedmap_tpu.viz import (
    closeup_fig,
    fig_3d_comparison,
    fig_architecture,
    fig_input_thumbnails,
    fig_dem_overview,
    fig_roughness_grids,
    fig_transect,
    plot_3d_view,
    plot_comparison,
    plot_dem,
    plot_error_histogram,
)


@pytest.fixture
def dem(rng):
    h, w = 48, 56
    yy, xx = np.mgrid[0:h, 0:w]
    data = (
        -800.0
        + 120.0 * np.sin(xx / 7.0)
        + 90.0 * np.cos(yy / 5.0)
        + rng.randn(h, w) * 15.0
    ).astype(np.float32)
    return Raster(data=data, left=-1_600_000.0, top=-100_000.0, res=250.0)


@pytest.fixture(autouse=True)
def _close_figs():
    yield
    plt.close("all")


def test_plot_3d_view_renders(dem):
    ax = plot_3d_view(dem, title="a) Test", zlabel="Bed elevation (m)", zmin=-1400.0)
    assert ax.name == "3d"
    assert ax.get_title() == "a) Test"
    assert ax.get_zlim()[0] == -1400.0
    # GMT azimuth 202.5 from North -> matplotlib azimuth 90 - 202.5
    assert np.isclose(ax.azim, 90.0 - 202.5)


def test_fig_3d_comparison_panels(dem):
    fig = fig_3d_comparison(
        {"DeepBedMap": dem, "BEDMAP2": dem, "Difference": dem, "BedMachine": dem},
        zmins={"Difference": -400.0},
        cmaps={"Difference": "RdBu"},
    )
    axes3d = [a for a in fig.axes if getattr(a, "name", "") == "3d"]
    assert len(axes3d) == 4
    titles = sorted(a.get_title() for a in axes3d)
    assert titles[0].startswith("a) ")


def test_fig_dem_overview_regions_and_tiles(dem):
    from deepbedmap_tpu.data.geojson import load_polygons

    ring = [
        [-1_595_000.0, -108_000.0],
        [-1_590_000.0, -108_000.0],
        [-1_590_000.0, -104_000.0],
        [-1_595_000.0, -104_000.0],
        [-1_595_000.0, -108_000.0],
    ]
    gl = load_polygons(
        {
            "type": "FeatureCollection",
            "features": [
                {
                    "type": "Feature",
                    "geometry": {"type": "Polygon", "coordinates": [ring]},
                    "properties": {},
                }
            ],
        }
    )
    tiles = np.asarray([[-1_598_000.0, -110_000.0, -1_596_000.0, -108_000.0]])
    fig = fig_dem_overview(
        dem,
        grounding_line=gl,
        study_regions={"Pine Island Glacier": (-1_599_000, -111_000, -1_589_000, -103_000)},
        training_tiles=tiles,
    )
    ax = fig.axes[0]
    labels = [p.get_label() for p in ax.patches]
    assert "Pine Island Glacier" in labels
    assert "Training regions" in labels
    assert len(ax.lines) >= 1  # grounding-line ring

    # key figure variant draws no rectangles
    fig2 = fig_dem_overview(dem, key_figure=True)
    assert len(fig2.axes[0].patches) == 0


def test_closeup_fig_annotations(dem):
    ax = closeup_fig(
        dem,
        letter="a",
        name="Test Glacier",
        midx=-1_595_000.0,
        midy=-105_000.0,
        annotations=[(-1_595_000.0, -105_000.0, "feature")],
        size=3_000.0,
    )
    assert ax.get_title() == "a) Test Glacier"
    assert any(t.get_text() == "feature" for t in ax.texts)
    assert len(ax.images) == 2  # DEM + hillshade overlay


def test_fig_roughness_grids(dem):
    xs = np.linspace(-1_598_000.0, -1_590_000.0, 25)
    ys = np.full_like(xs, -105_000.0)
    fig = fig_roughness_grids(
        {"DeepBedMap": dem, "Groundtruth": dem, "BedMachine": dem},
        transect_xy=(xs, ys),
    )
    visible = [a for a in fig.axes if a.get_visible() and a.get_title()]
    assert len(visible) == 4  # 1 elevation + 3 roughness panels
    assert visible[0].get_title().startswith("a) ")


def test_fig_transect_profiles(dem):
    xs = np.linspace(-1_598_000.0, -1_590_000.0, 40)
    ys = np.full_like(xs, -105_000.0)
    fig = fig_transect({"DeepBedMap": dem, "BEDMAP2": dem}, xs, ys)
    ax_e, ax_r = fig.axes[:2]
    assert len(ax_e.lines) == 2 and len(ax_r.lines) == 2
    # elevation samples must be finite away from edges
    y = ax_e.lines[0].get_ydata()
    assert np.isfinite(y[5:-5]).all()


def test_fig_architecture_smoke():
    fig = fig_architecture(num_residual_blocks=12, residual_scaling=0.1)
    ax = fig.axes[0]
    assert "8,907,749" in ax.get_title()
    assert len(ax.patches) > 10  # boxes + arrows


def test_base_figures_still_render(dem, rng):
    plot_dem(dem, title="dem")
    plot_comparison({"a": dem, "b": dem})
    plot_error_histogram({"m": rng.randn(500)})


def test_fig_input_thumbnails(dem, rng):
    """Reference fig1a-e thumbnails: one panel per conditioning raster, the
    velocity raster collapsed to magnitude, elevation panels hillshaded."""
    def vel():
        return Raster(
            data=rng.randn(24, 28).astype(np.float32),
            left=-1_600_000.0,
            top=-100_000.0,
            res=500.0,
        )

    fig = fig_input_thumbnails(
        {"BEDMAP2": dem, "MEaSUREs": (vel(), vel()), "Accumulation": dem}
    )
    assert len(fig.axes) == 3
    # the hillshade overlay doubles the image count on the bedmap2 panel
    assert len(fig.axes[0].images) == 2
    assert len(fig.axes[1].images) == 1
    assert fig.axes[0].get_title() == "BEDMAP2"
