"""Deformable-conv kernel shootout on the real TPU (the inference hot op).

Compares the stacked body (v3, round-2 winner: 20.3 ms at 1144^2 x 64,
clamp=2) against the tap-packed body (v4: one shared slab + one
lane-concatenated sampling matmul per kernel row — same MXU pass count in
3x fewer instructions and 3x fewer slab materialisations).

Timing: device-side repetition — the layer is shape-preserving (64 -> 64),
so ITERS applications chain through a lax.scan carry inside ONE dispatch
(per-dispatch host timing through this tunnel carries +-30 ms RTT noise).

Run detached (never timeout-kill a TPU compile):
  setsid nohup python benchmarks/bench_deform.py > /tmp/bench_deform.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from deepbedmap_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()  # compiled executables persist across runs

if os.environ.get("CPU") == "1":  # harness smoke test
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax import lax

from deepbedmap_tpu.ops.pallas_kernels import deform_conv2d_pallas

ITERS = int(os.environ.get("ITERS", "10"))
RES = int(os.environ.get("RES", "1144"))
C = int(os.environ.get("C", "64"))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def bench(stage, x, iters=ITERS):
    @jax.jit
    def run(x0):
        def body(c, _):
            return stage(c), None

        out, _ = lax.scan(body, x0, None, length=iters)
        return out

    run(x)
    float(jnp.sum(run(x)))
    t0 = time.perf_counter()
    s = float(jnp.sum(run(x)))
    t1 = time.perf_counter()
    assert np.isfinite(s), s
    return (t1 - t0) / iters * 1e3


def main():
    log(f"devices: {jax.devices()}  {RES}^2 x {C}ch, iters {ITERS}")
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(1, RES, RES, C).astype(np.float32) * 0.1)
    offsets = jnp.asarray((rs.rand(1, RES, RES, 18) * 4 - 2).astype(np.float32))
    weight = jnp.asarray(rs.randn(3, 3, C, C).astype(np.float32) * 0.02)
    bias = jnp.asarray(np.zeros(C, np.float32))

    results = {}
    for clamp in (2, 1):
        outs = {}
        for body in ("stacked", "stacked_packed", "stacked_pipelined"):
            log(f"compiling {body} clamp={clamp} (~1-2 min)...")
            ms = bench(
                lambda a, b=body, cl=clamp: deform_conv2d_pallas(
                    a, offsets, weight, bias, clamp=cl, kernel_body=b
                ),
                x,
            )
            results[f"{body}_clamp{clamp}"] = round(ms, 2)
            log(f"{body} clamp={clamp}: {ms:.2f} ms")
            outs[body] = deform_conv2d_pallas(
                x, offsets, weight, bias, clamp=clamp, kernel_body=body
            )
        for other in ("stacked_packed", "stacked_pipelined"):
            err = float(
                jnp.abs(outs["stacked"] - outs[other]).max()
                / jnp.abs(outs["stacked"]).max()
            )
            log(f"clamp={clamp} {other}-vs-stacked rel err {err:.2e}")
            assert err < 1e-4, err

    print(json.dumps(results))
    log("DONE")


if __name__ == "__main__":
    main()
