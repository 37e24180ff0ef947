"""Pod-scale band distribution (inference.multihost): a REAL 2-process
jax.distributed CPU "pod" (Gloo over localhost, 2 virtual devices per
process) runs the full multihost contract in tests/_multihost_worker.py —
band ownership, canvas parity vs the single-host engine, the process-0
streamed GeoTIFF, and the single-host guards. SURVEY.md section 5.8's
distributed-backend row, extended from dryrun-only to multi-controller.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_pod_runs_full_contract(tmp_path):
    port = _free_port()
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(WORKER))}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=900)
        outs.append(out.decode())
        assert p.returncode == 0, (pid, err.decode()[-3000:])
    assert "WORKER_0_OK" in outs[0]
    assert "WORKER_1_OK" in outs[1]
    assert (tmp_path / "mh_dem.tif").exists()


def test_api_multihost_single_process(tmp_path):
    """DeepBedMap.predict_continent(multihost=True) at P == 1: same Raster
    as the single-host path, and the streamed product round-trips."""
    from deepbedmap_tpu.api import DeepBedMap
    from deepbedmap_tpu.config import GeneratorConfig
    from deepbedmap_tpu.data.geotiff import read_geotiff

    rs = np.random.RandomState(4)
    lh, lw = 16, 24
    inputs = {
        "X": rs.rand(1, 1, lh, lw).astype(np.float32),
        "W1": rs.rand(1, 1, 10 * lh, 10 * lw).astype(np.float32),
        "W2": rs.rand(1, 2, 2 * lh, 2 * lw).astype(np.float32),
        "W3": rs.rand(1, 1, lh, lw).astype(np.float32),
    }
    bounds = (0.0, 0.0, 24_000.0, 16_000.0)
    dbm = DeepBedMap(cfg=GeneratorConfig(num_residual_blocks=1))
    single = dbm.predict_continent(inputs, bounds, tile_out=32, halo_lr=2)
    pod = dbm.predict_continent(
        inputs, bounds, tile_out=32, halo_lr=2, multihost=True
    )
    np.testing.assert_allclose(pod.data, single.data, rtol=1e-5, atol=1e-6)

    out = str(tmp_path / "api_mh")
    ret = dbm.predict_continent(
        inputs, bounds, outfilepath=out, tile_out=32, halo_lr=2,
        multihost=True, stream_product=True,
    )
    assert ret is None
    arr, meta = read_geotiff(out + ".tif")
    assert arr.shape == (64, 96) and meta["crs_epsg"] == 3031


def test_single_process_degenerates_to_local(rng=np.random.RandomState(2)):
    """P == 1 (no distributed init): multihost == the plain band engine,
    canvas returned, every band 'owned' by process 0 — the same code path
    the pod runs, minus the allgather."""
    import jax

    from deepbedmap_tpu.config import GeneratorConfig
    from deepbedmap_tpu.inference import TilePlan
    from deepbedmap_tpu.inference.continent import predict_continent
    from deepbedmap_tpu.inference.multihost import predict_continent_multihost
    from deepbedmap_tpu.models import build_generator

    assert jax.process_count() == 1
    model, params = build_generator(GeneratorConfig(num_residual_blocks=1))

    def forward(x, w1, w2, w3):
        return model.apply({"params": params}, x, w1, w2, w3)

    plan = TilePlan(out_h=96, out_w=64, tile_out=32, halo_lr=3)
    lh, lw = plan.lr_shape
    inputs = {
        "X": rng.rand(1, lh, lw, 1).astype(np.float32),
        "W1": rng.rand(1, 10 * lh, 10 * lw, 1).astype(np.float32),
        "W2": rng.rand(1, 2 * lh, 2 * lw, 2).astype(np.float32),
        "W3": rng.rand(1, lh, lw, 1).astype(np.float32),
    }
    got = predict_continent_multihost(
        forward, inputs, plan, clip_conditioning=False
    )
    want = predict_continent(forward, inputs, plan, clip_conditioning=False)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
