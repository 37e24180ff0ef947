"""Worker for tests/test_multihost.py: one simulated pod HOST.

Launched as ``python _multihost_worker.py <pid> <port> <out_dir>`` with a
sibling process forming a 2-process jax.distributed CPU "pod" (2 local
virtual devices each, Gloo collectives over localhost). Exercises every
multihost contract in one process lifetime (compiles are the cost):

- band ownership: a callable band_source is asked ONLY for this process's
  bands (b % P == pid), including the dummy round past the grid edge;
- canvas parity: process 0's assembled canvas equals the single-host
  ``predict_continent`` on the same inputs (vertical halos are real rows);
- mesh path: tiles sharded over the process-LOCAL 2-device mesh;
- no-mesh path: the single-device band predictor under band distribution;
- streamed product: process 0 writes the one GeoTIFF, peers return None;
- guard: the single-host sharded paths refuse to run multi-process.

Not collected by pytest (leading underscore).
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
_cache = os.environ.get("DEEPBEDMAP_JAX_CACHE", "/tmp/deepbedmap_jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

N_PROCS = 2


def main() -> None:
    pid, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=N_PROCS, process_id=pid
    )
    assert jax.process_count() == N_PROCS
    assert len(jax.local_devices()) == 2 and jax.device_count() == 4

    import numpy as np
    from jax.sharding import Mesh

    from deepbedmap_tpu.config import GeneratorConfig
    from deepbedmap_tpu.data import geotiff
    from deepbedmap_tpu.inference import TilePlan
    from deepbedmap_tpu.inference.continent import (
        _band_inputs,
        predict_continent,
        predict_continent_sharded,
    )
    from deepbedmap_tpu.inference.multihost import (
        predict_continent_multihost,
        predict_continent_multihost_to_geotiff,
    )
    from deepbedmap_tpu.models import build_generator

    model, params = build_generator(GeneratorConfig(num_residual_blocks=1))

    def forward(x, w1, w2, w3):
        return model.apply({"params": params}, x, w1, w2, w3)

    # 3 bands: round 0 = bands {0, 1}, round 1 = band 2 + a dummy on pid 1
    plan = TilePlan(out_h=96, out_w=64, tile_out=32, halo_lr=3)
    rs = np.random.RandomState(0)
    lh, lw = plan.lr_shape
    inputs = {
        "X": rs.rand(1, lh, lw, 1).astype(np.float32),
        "W1": rs.rand(1, 10 * lh, 10 * lw, 1).astype(np.float32),
        "W2": rs.rand(1, 2 * lh, 2 * lw, 2).astype(np.float32),
        "W3": rs.rand(1, lh, lw, 1).astype(np.float32),
    }
    gy = plan.grid[0]
    assert gy == 3

    local_mesh = Mesh(np.asarray(jax.local_devices()), ("data",))

    requested: list = []

    def loader(band: int):
        requested.append(band)
        return _band_inputs(inputs, plan, band)

    # --- mesh path, process-local loader
    canvas = predict_continent_multihost(
        forward, loader, plan, mesh=local_mesh, clip_conditioning=False
    )
    assert requested == [b for b in range(gy) if b % N_PROCS == pid], requested

    single = predict_continent(forward, inputs, plan, clip_conditioning=False)
    if pid == 0:
        np.testing.assert_allclose(canvas, single, rtol=1e-4, atol=1e-5)
    else:
        assert canvas is None

    # --- no-mesh path (single-device band predictor), host-global dict
    seen = []
    canvas2 = predict_continent_multihost(
        forward, inputs, plan, clip_conditioning=False,
        progress=lambda i, n: seen.append((i, n)),
    )
    if pid == 0:
        np.testing.assert_allclose(canvas2, single, rtol=1e-4, atol=1e-5)
        assert seen == [(i + 1, gy) for i in range(gy)]  # in order, p0 only
    else:
        assert canvas2 is None and seen == []

    # --- streamed GeoTIFF on process 0
    bounds = (0.0, 0.0, plan.out_w * 250.0, plan.out_h * 250.0)
    out = predict_continent_multihost_to_geotiff(
        forward, inputs, plan, bounds, os.path.join(out_dir, "mh_dem"),
        mesh=local_mesh, clip_conditioning=False, overviews=1,
    )
    if pid == 0:
        back, meta = geotiff.read_geotiff(out)
        want = np.where(np.isfinite(single), single, -2000.0).astype(np.int16)
        np.testing.assert_array_equal(back, want)
        assert meta["nodata"] == -2000.0 and meta["res"] == 250.0
    else:
        assert out is None

    # --- the single-host paths must refuse to run on a "pod"
    try:
        predict_continent_sharded(forward, inputs, plan, local_mesh)
    except NotImplementedError as e:
        assert "multihost" in str(e)
    else:
        raise AssertionError("single-host sharded path ran multi-process")

    # --- a non-local mesh is rejected (bands are the cross-process axis)
    try:
        predict_continent_multihost(
            forward, inputs, plan,
            mesh=Mesh(np.asarray(jax.devices()), ("data",)),
        )
    except ValueError as e:
        assert "local" in str(e)
    else:
        raise AssertionError("global mesh accepted for the local-tile axis")

    print(f"WORKER_{pid}_OK", flush=True)


if __name__ == "__main__":
    main()
