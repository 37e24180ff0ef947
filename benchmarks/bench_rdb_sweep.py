"""Standalone single-sweep RRDB measurement: the static-pipeline sweep vs
the 3-pass fused launch at the flagship shape. Timings through the tunnel
have an unreliable RTT baseline (see r5e: a corrupted baseline produced
negative absolutes), so the decisive number is the INTRA-PROCESS DIFFERENCE
between the two trunks, which is RTT-independent.

Env: BATCH (2), LAT (286), MXU_BF16 (1), ITERS (20), MODE (static)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from deepbedmap_tpu.ops.pallas_rdb import (
    flatten_rdb,
    rrdb_pallas_flat,
    rrdb_sweep_pallas_flat,
    unflatten_rdb,
)

BATCH = int(os.environ.get("BATCH", "2"))
LAT = int(os.environ.get("LAT", "286"))
MXU_BF16 = os.environ.get("MXU_BF16", "1") == "1"
ITERS = int(os.environ.get("ITERS", "20"))
MODE = os.environ.get("MODE", "static")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def sync(x):
    return float(jnp.sum(x))


def bench(fn, *args, iters=ITERS):
    fn(*args)
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(args[0][:1, :1])
    rtt = (time.perf_counter() - t0) / iters
    return (dt - rtt) * 1e3


rng = np.random.RandomState(0)
F, G = 64, 32
kernels = [
    jnp.asarray(rng.randn(3, 3, F + i * G, G if i < 4 else F) * 0.05, jnp.float32)
    for i in range(5)
]
biases = [jnp.asarray(rng.randn(k.shape[-1]) * 0.01, jnp.float32) for k in kernels]
x = jnp.asarray(rng.randn(BATCH, LAT, LAT, F) * 0.5, jnp.float32)
k3 = [kernels] * 3
b3 = [biases] * 3

log(f"devices: {jax.devices()}  batch={BATCH} lat={LAT} mxu_bf16={MXU_BF16} mode={MODE}")
flat = jax.jit(lambda a: flatten_rdb(a, 32))(x)


def trunk(step):
    def g(a):
        f = flatten_rdb(a, 32)

        def body(c, _):
            return step(c), None

        out, _ = lax.scan(body, f, None, length=12)
        return unflatten_rdb(out, LAT, LAT, 32, features=F)

    return g


step_f = lambda c: rrdb_pallas_flat(c, k3, b3, 0.2, h=LAT, w=LAT, mxu_bf16=MXU_BF16)
step_s = lambda c: rrdb_sweep_pallas_flat(
    c, k3, b3, 0.2, h=LAT, w=LAT, mxu_bf16=MXU_BF16, mode=MODE
)

log(f"compiling one sweep RRDB (mode={MODE}) for numerics...")
one_sweep = jax.jit(step_s)
got = one_sweep(flat)
log("compiling one fused RRDB (3-pass) for numerics...")
one_fused = jax.jit(step_f)
ref = one_fused(flat)
d = float(jnp.abs(got - ref).max())
rel = d / float(jnp.abs(ref).max())
log(f"numerics: sweep-vs-fused max abs {d:.3e} (rel {rel:.3e})")
assert rel < (1e-2 if MXU_BF16 else 1e-5), (d, rel)

log("compiling fused 12-RRDB trunk (slow Mosaic-in-scan case)...")
trunk_f = jax.jit(trunk(step_f))
tf12 = bench(trunk_f, x, iters=8)
log(f"fused trunk: {tf12:.1f} ms ({tf12 / BATCH:.1f} ms/tile)")
log(f"compiling sweep 12-RRDB trunk (mode={MODE})...")
trunk_s = jax.jit(trunk(step_s))
ts12 = bench(trunk_s, x, iters=8)
log(
    f"sweep trunk: {ts12:.1f} ms ({ts12 / BATCH:.1f} ms/tile) — "
    f"INTRA-PROCESS DIFF sweep-minus-fused {ts12 - tf12:+.1f} ms/dispatch "
    f"({(ts12 - tf12) / 12 / BATCH:+.2f} ms/RRDB/tile)"
)
# parity on the SAME jitted objects (no re-jit: that recompiles from scratch
# through the uncached tunnel)
of = trunk_f(x)
osw = trunk_s(x)
d2 = float(jnp.abs(of - osw).max())
log(f"trunk parity fused-vs-sweep: max abs {d2:.3e} (rel {d2 / float(jnp.abs(of).max()):.3e})")
log("DONE")
