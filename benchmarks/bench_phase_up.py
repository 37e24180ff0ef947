"""Micro-bench: the upsample->conv stages, literal vs phase-decomposed
(ops.phase_conv), at the continent tile shapes. Localises where the
in-model phase_up delta comes from (the 2x2 conv itself vs the final
interleave transpose), since the in-model ablation (bench_ablate
ONLY=phase_up) only gives the net.

Pieces (dispatch-repeated like bench_ablate, RTT-subtracted; stage 2 is the
dominant one: 572^2 source -> 1144^2 output, 64 channels):
- lit1/lit2:  nearest_upsample(2) + conv3x3 SAME + bias + leaky, per stage
- ph1/ph2:    upsample2_conv3x3, per stage (the full equivalent function)
- ph2_conv:   stage 2's 2x2/4F phase conv + bias + leaky WITHOUT the final
              interleave (returns the (N, 573, 573, 256) grid) — ph2 minus
              ph2_conv is the interleave's cost.

Run on TPU: python benchmarks/bench_phase_up.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from deepbedmap_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp
import numpy as np

from deepbedmap_tpu.ops.phase_conv import phase_kernels_2x, upsample2_conv3x3
from deepbedmap_tpu.ops.resize import nearest_upsample

REPS = int(os.environ.get("REPS", "8"))
LAT = int(os.environ.get("LAT", "286"))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    rs = np.random.RandomState(0)
    x1 = jnp.asarray(rs.rand(1, LAT, LAT, 64), jnp.float32)
    x2 = jnp.asarray(rs.rand(1, 2 * LAT, 2 * LAT, 64), jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, 64, 64) * 0.05, jnp.float32)
    b = jnp.asarray(rs.randn(64) * 0.01, jnp.float32)

    def lrelu(z):
        return jnp.where(z >= 0, z, 0.2 * z)

    def literal(a):
        return lrelu(
            jax.lax.conv_general_dilated(
                nearest_upsample(a, 2), k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + b
        )

    def phase(a):
        return upsample2_conv3x3(a, k, b, leaky=True)

    def phase_conv_only(a):
        pk = phase_kernels_2x(k)
        z = jax.lax.conv_general_dilated(
            jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0))), pk, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return lrelu(z + jnp.tile(b, 4))

    cases = (
        ("lit1", literal, x1),
        ("lit2", literal, x2),
        ("ph1", phase, x1),
        ("ph2", phase, x2),
        ("ph2_conv", phase_conv_only, x2),
    )
    log(f"devices: {jax.devices()}  LAT={LAT} reps={REPS}")
    results = {}
    for name, fn, arg in cases:

        @jax.jit
        def many(a, fn=fn):
            acc = 0.0
            for i in range(REPS):
                acc = acc + jnp.sum(fn(a * (1.0 + 1e-6 * i)))
            return acc

        @jax.jit
        def noop(a):
            return jnp.sum(a[:1, :1, :1, :1])

        log(f"compiling {name}...")
        float(many(arg))
        float(noop(arg))
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            float(many(arg))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        t0 = time.perf_counter()
        float(noop(arg))
        rtt = time.perf_counter() - t0
        ms = (ts[len(ts) // 2] - rtt) / REPS * 1e3
        results[name] = round(ms, 2)
        log(f"{name}: {ms:.2f} ms")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
