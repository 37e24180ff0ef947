"""Training-array builder tests (reference data_prep.py:745-930)."""

import numpy as np
import pytest

from deepbedmap_tpu.data.builder import build_training_arrays
from deepbedmap_tpu.data.raster import Raster
from deepbedmap_tpu.data.windows import get_window_bounds


def _field(x, y):
    return (-400 + 200 * np.sin(x / 7000.0) * np.cos(y / 9000.0)).astype(np.float32)


@pytest.fixture
def scene():
    # two "survey" high-res grids inside a common lowres frame
    x0, y1 = -1_600_000.0, -140_000.0  # left, top
    W = H = 160  # 250 m px
    yy, xx = np.mgrid[0:H, 0:W]
    cx = x0 + (xx + 0.5) * 250.0
    cy = y1 - (yy + 0.5) * 250.0
    truth = _field(cx, cy)

    hr_a = Raster(truth[:96, :96].copy(), left=x0, top=y1, res=250.0)
    hr_b = Raster(
        truth[96:, 96:].copy(),
        left=x0 + 96 * 250.0,
        top=y1 - 96 * 250.0,
        res=250.0,
    )

    def down(a, f):
        return a.reshape(a.shape[0] // f, f, -1, f).mean((1, 3))

    pad = 8  # extra lowres frame so 1 km padding never runs off the edge
    Wl = Hl = H // 4 + 2 * pad
    yyl, xxl = np.mgrid[0:Hl, 0:Wl]
    lx0 = x0 - pad * 1000.0
    ly1 = y1 + pad * 1000.0
    cxl = lx0 + (xxl + 0.5) * 1000.0
    cyl = ly1 - (yyl + 0.5) * 1000.0
    low = Raster(_field(cxl, cyl), left=lx0, top=ly1, res=1000.0)
    accum = Raster(_field(cxl, cyl) * 0.01 + 100.0, left=lx0, top=ly1, res=1000.0)

    Ws = Hs = H + 2 * 4 * pad  # 250 m "surface" raster covering padded frame
    yys, xxs = np.mgrid[0:Hs, 0:Ws]
    cxs = lx0 + (xxs + 0.5) * 250.0
    cys = ly1 - (yys + 0.5) * 250.0
    surf = Raster(_field(cxs, cys) + 2000.0, left=lx0, top=ly1, res=250.0)
    vx = Raster(_field(cxs, cys) * 0.1, left=lx0, top=ly1, res=250.0)
    vy = Raster(_field(cxs, cys) * -0.1, left=lx0, top=ly1, res=250.0)
    return dict(
        hr={"survey_a": hr_a, "survey_b": hr_b},
        lowres=low,
        surface=surf,
        velocity=(vx, vy),
        accumulation=accum,
    )


def test_build_training_arrays_contract(scene, tmp_path):
    wb = {
        name: get_window_bounds(r, height=36, width=36, step=24)
        for name, r in scene["hr"].items()
    }
    counts = {k: len(v) for k, v in wb.items()}
    assert all(c > 0 for c in counts.values()), counts

    ds = build_training_arrays(
        scene["hr"],
        wb,
        lowres=scene["lowres"],
        surface=scene["surface"],
        velocity=scene["velocity"],
        accumulation=scene["accumulation"],
        out_dir=str(tmp_path),
    )
    n = len(ds)
    assert n == sum(counts.values())
    # reference array contract (data_prep.py: X 11px pad 1km, W1 110px@100m —
    # here the synthetic surface is 250 m so W1 is (36+8)px@250m=44px)
    batch = ds.take(np.arange(n))
    assert batch["Y"].shape == (n, 36, 36, 1)
    assert batch["X"].shape == (n, 11, 11, 1)
    assert batch["W2"].shape[3] == 2  # velocity channel concat
    assert batch["W3"].shape == (n, 11, 11, 1)
    for k, v in batch.items():
        assert np.isfinite(np.asarray(v)).all(), k

    # npy save + content hash pin written
    for key in ("X", "W1", "W2", "W3", "Y"):
        assert (tmp_path / f"{key}_data.npy").exists()
    assert (tmp_path / "CONTENT_HASH").read_text().strip()

    # Y tiles reproduce the survey grids exactly (interpolate=False path)
    y0 = np.load(tmp_path / "Y_data.npy")[0, 0]
    hr = scene["hr"]["survey_a"]
    np.testing.assert_allclose(y0, hr.data[:36, :36], atol=1e-5)


def test_build_drops_nan_tiles(scene):
    wb = {
        name: get_window_bounds(r, height=36, width=36, step=24)
        for name, r in scene["hr"].items()
    }
    # poke a hole in one survey grid -> that tile must be dropped
    scene["hr"]["survey_a"].data[10, 10] = np.nan
    total = sum(len(v) for v in wb.values())
    ds = build_training_arrays(
        scene["hr"],
        wb,
        lowres=scene["lowres"],
        surface=scene["surface"],
        velocity=scene["velocity"],
        accumulation=scene["accumulation"],
    )
    assert len(ds) == total - 1
